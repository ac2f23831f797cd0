"""Driver-contract query pipelines (__ray_entry__.queries()).

Each function takes ``sf_dir`` (a /root/testdata/sfX directory) and
returns a Dataset / pyarrow Table.  SQL-expressible ones have a matching
DuckDB oracle in ``oracle_sql()`` — column NAMES and rounding must match
exactly (the driver hash-compares values after sorting columns by name).

Transcript-based pipelines synthesize their input deterministically (the
corpus is a pure function of (sf, seed=42)) into /tmp and read it back
through Parquet, so they exercise the same read path as production.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Min, Sum

from ..sources.synth import materialize_transcripts
from ..util import round_sql, round_sql_f, scaled_int_sql, sorted_topk
from ..util import with_schema
from ..util import topk_combine as _topk_combine
from ..util import tree_combine as _tree_combine

SYNTH_ROOT = "/tmp/ocr_engine_ray_synth"
TURNS_PER_SF = 2_000_000  # sf0.001 → 2k turns, sf0.01 → 20k, sf0.1 → 200k


def _small_table(ds: Dataset) -> pa.Table:
    """Collect a KNOWN-SMALL (post-aggregation / top-k) Dataset into one
    Arrow table on the driver, skipping Ray's schema-less zero-row
    blocks.  Only for results whose cardinality is structurally bounded
    — never raw data."""
    blocks = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(blocks) if blocks else None


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)/?$", sf_dir.rstrip("/"))
    return float(m.group(1)) if m else 0.001


def transcript_paths(sf_dir: str, seed: int = 42) -> list[str]:
    sf = sf_from_dir(sf_dir)
    n_turns = max(200, int(TURNS_PER_SF * sf))
    out_dir = os.path.join(SYNTH_ROOT, f"sf{sf}")
    n_shards = max(4, min(64, n_turns // 4000))
    return materialize_transcripts(out_dir, n_turns, seed=seed, n_shards=n_shards)


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# ---------------------------------------------------------------------------
# Transcript pipelines (rows-only driver check; pytest oracle covers values)
# ---------------------------------------------------------------------------

def q_flagship_extract(sf_dir: str) -> Dataset:
    from .flagship import flagship

    ds = flagship(transcript_paths(sf_dir))
    return ds.select_columns([
        "conv_id", "turn_idx", "content_type", "extracted_text",
        "invoice_number", "invoice_date", "final_total_cents", "is_valid",
    ])


def q_flagship_extract_templated(sf_dir: str) -> Dataset:
    """Flagship extraction with the rule-pack TEMPLATE backend preferred
    for pdf_reader-tool turns (M7 two-backend chain: template → generic
    → plain).  Rows-only driver check; pytest asserts field-level parity
    with the generic backend on clean invoice turns."""
    from .flagship import flagship

    ds = flagship(transcript_paths(sf_dir), template_tools=("pdf_reader",))
    return ds.select_columns([
        "conv_id", "turn_idx", "content_type", "extracted_text",
        "invoice_number", "invoice_date", "final_total_cents", "is_valid",
    ])


def q_conv_rollup(sf_dir: str) -> Dataset:
    from .flagship import conv_rollup, flagship_composed

    return conv_rollup(flagship_composed(transcript_paths(sf_dir)))


def q_assemble_conversations(sf_dir: str) -> Dataset:
    from .flagship import assemble_conversations, flagship_composed

    return assemble_conversations(flagship_composed(transcript_paths(sf_dir)))


# ---------------------------------------------------------------------------
# SQL-checked operators over the driver testdata tables
# ---------------------------------------------------------------------------

def q_events_conv_rollup(sf_dir: str) -> Dataset:
    """events ≅ transcripts: user_id ≅ conv_id.  Per-conversation rollup
    (FIXTURES §F3 shape) with per-batch partial aggregation before the
    shuffle (SURVEY §2.6 A1/A2 scale pattern)."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("user_id").aggregate(
            [("ts", "count"), ("value", "sum"), ("ts", "min"), ("ts", "max")])
        return g.rename_columns(["user_id", "p_n", "p_sum", "p_min", "p_max"])

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby("user_id").aggregate(
        Sum("p_n", alias_name="n_events"),
        Sum("p_sum", alias_name="sum_value"),
        Min("p_min", alias_name="first_ts"),
        Max("p_max", alias_name="last_ts"),
    )
    return agg.map_batches(
        lambda b: b.set_column(b.schema.get_field_index("sum_value"), "sum_value",
                               round_sql(b.column("sum_value"), 2)),
        batch_format="pyarrow")


def q_events_filter_purchases(sf_dir: str) -> Dataset:
    """Predicate filter + projection (M1), PUSHED TO THE READ: the
    constant predicate rides ``read_parquet(filter=...)`` so PyArrow
    prunes row groups by statistics and non-matching rows never enter
    the object store (the prune-at-the-read rule); the residual Arrow
    mask stays as defense-in-depth (fragment-level filters are
    best-effort on row-group granularity)."""
    import pyarrow.dataset as pads

    ds = rd.read_parquet(
        _t(sf_dir, "events"),
        columns=["event_id", "user_id", "ts", "event_type", "value"],
        filter=(pads.field("event_type") == "purchase")
        & (pads.field("value") > 50.0))
    return ds.map_batches(
        lambda b: b.filter(pc.and_(pc.equal(b.column("event_type"), "purchase"),
                                   pc.greater(b.column("value"), 50.0)))
                   .drop_columns(["event_type"]),
        batch_format="pyarrow")


def q_events_first_last(sf_dir: str) -> Dataset:
    """Per-conversation ordering (A4 analogue): first/last event type by
    ts, as a partial-agg arg-min/arg-max — no map_groups, no per-key
    Python.  The (ts, event_type) pair is packed into one lexically
    sortable string (zero-padded 19-digit µs timestamp + 0x1f +
    event_type), so Min/Max on the packed column IS arg-min/arg-max by
    ts; per-batch partials mean the shuffle moves one row per
    (user, batch) and the ~9k-groups/s per-key-Python ceiling of the
    old map_groups shape is gone."""
    from ray.data.aggregate import Max, Min, Sum

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_type"])

    def pack(b: pa.Table) -> pa.Table:
        ts_s = pc.utf8_lpad(pc.cast(pc.cast(
            b.column("ts"), pa.int64()), pa.string()), 19, padding="0")
        packed = pc.binary_join_element_wise(
            ts_s.combine_chunks(),
            b.column("event_type").combine_chunks(), "\x1f")
        t = pa.table({"user_id": b.column("user_id"), "packed": packed})
        g = t.group_by("user_id").aggregate(
            [("packed", "min"), ("packed", "max"), ("packed", "count")])
        return g.rename_columns(["user_id", "p_min", "p_max", "p_n"])

    agg = ds.map_batches(pack, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            Min("p_min", alias_name="f"),
            Max("p_max", alias_name="l"),
            Sum("p_n", alias_name="n_events"))

    def unpack(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "first_event": pc.utf8_slice_codeunits(
                b.column("f"), 20, 1 << 30),
            "last_event": pc.utf8_slice_codeunits(
                b.column("l"), 20, 1 << 30),
            "n_events": pc.cast(b.column("n_events"), pa.int64()),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


def q_documents_dedup_exact(sf_dir: str) -> Dataset:
    """Exact dedup (A5/J3 semantics): group identical payloads, keep the
    lowest doc_id as representative + multiplicity.  Grouping key is the
    text itself here (small corpus); the transcript pipeline's exact
    dedup uses a sha1 key column instead (see stages/dedup.py) so the
    shuffle moves 20-byte keys, not payloads."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.groupby("text").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Count("text", alias_name="n_copies"),
    )


def q_documents_token_stats(sf_dir: str) -> Dataset:
    """Vectorized token counting + stopword ratio over documents
    (text-analysis operator; ray_guide 'Stay vectorized')."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def stats(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        n_tokens = pc.list_value_length(toks).cast(pa.int64())
        flat = pc.list_flatten(toks)
        is_stop = pc.is_in(flat, value_set=pa.array(["the", "a"]))
        # per-row stopword counts via list offsets
        import numpy as np
        stop_np = is_stop.to_numpy(zero_copy_only=False).astype("int64")
        lens = n_tokens.to_numpy(zero_copy_only=False)
        csum = np.concatenate([[0], np.cumsum(stop_np)])
        offs = np.concatenate([[0], np.cumsum(lens)])
        n_stop = csum[offs[1:]] - csum[offs[:-1]]
        # no rounding: n_stop/len on the same ints is bit-identical to the
        # DuckDB oracle's division; rounding would reintroduce
        # half-even-vs-half-away mismatches at knife-edge values
        ratio = n_stop / np.maximum(lens, 1)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": n_tokens,
            "n_stopwords": pa.array(n_stop, pa.int64()),
            "stopword_ratio": pa.array(ratio, pa.float64()),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def q_lineitem_pricing_summary(sf_dir: str) -> Dataset:
    """TPC-H Q1-shaped grouped aggregate with per-batch partials."""
    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        disc_price = pc.multiply(b.column("l_extendedprice"),
                                 pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        t = b.append_column("disc_price", disc_price)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ("disc_price", "sum"), ("l_quantity", "count")])
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "p_qty", "p_base", "p_disc", "p_n"])

    # 6 (returnflag, linestatus) pairs — structurally bounded → tree
    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [("p_qty", "sum"), ("p_base", "sum"), ("p_disc", "sum"),
         ("p_n", "sum")],
        ["l_returnflag", "l_linestatus", "p_qty", "p_base", "p_disc", "p_n"],
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
         "sum_disc_price", "count_order"])

    def finish(b: pa.Table) -> pa.Table:
        for col in ("sum_qty", "sum_base_price", "sum_disc_price"):
            b = b.set_column(b.schema.get_field_index(col), col,
                             round_sql(b.column(col), 2))
        return b

    return agg.map_batches(finish, batch_format="pyarrow")


def q_top_customers(sf_dir: str) -> pa.Table:
    """Top-10 customers by spend.  Scale shape: aggregate + sort + limit
    FIRST (the only full-data work, all keyed on o_custkey), then attach
    names to just the surviving 10 rows with a predicate-pushdown read
    of the customer table — no corpus-sized driver dict, no shuffle
    join of the dimension (the round-1 version built a full
    {custkey: name} dict on the driver — unbounded at TPC-H scale)."""
    import pyarrow.parquet as pq

    ds = rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("o_custkey").aggregate([("o_totalprice", "sum")])
        return g.rename_columns(["o_custkey", "p_total"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby("o_custkey").aggregate(Sum("p_total", alias_name="total_spent"))
    top = pa.Table.from_pylist(
        agg.sort(["total_spent", "o_custkey"],
                 descending=[True, False]).limit(10).take_all())
    keys = top.column("o_custkey").to_pylist()
    cust = pq.read_table(_t(sf_dir, "customer"),
                         columns=["c_custkey", "c_name"],
                         filters=[("c_custkey", "in", keys)])
    names = dict(zip(cust.column("c_custkey").to_pylist(),
                     cust.column("c_name").to_pylist()))
    top = top.append_column(
        "c_name", pa.array([names.get(k, "") for k in keys], pa.string()))
    return top.set_column(top.schema.get_field_index("total_spent"),
                          "total_spent", round_sql(top.column("total_spent"), 2))


def q_events_daily(sf_dir: str) -> Dataset:
    """Tumbling 1-day event-time window as a grouped aggregate
    (streaming-shaped workload; ray_guide 'Streaming-shaped')."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day")
        t = pa.table({"day": day, "value": b.column("value")})
        g = t.group_by("day").aggregate([("value", "count"), ("value", "sum")])
        return g.rename_columns(["day", "p_n", "p_sum"])

    # calendar days — structurally bounded by the time range → tree
    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"), ["day"],
        [("p_n", "sum"), ("p_sum", "sum")],
        ["day", "p_n", "p_sum"], ["day", "n_events", "sum_value"])
    return agg.map_batches(
        lambda b: b.set_column(b.schema.get_field_index("sum_value"), "sum_value",
                               round_sql(b.column("sum_value"), 2)),
        batch_format="pyarrow")


def q_distinct_event_types(sf_dir: str) -> pa.Table:
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


def q_nation_region_join(sf_dir: str) -> pa.Table:
    """Tiny dimension-dimension broadcast join."""
    import pyarrow.parquet as pq

    region = pq.read_table(_t(sf_dir, "region"))
    rlookup = dict(zip(region.column("r_regionkey").to_pylist(),
                       region.column("r_name").to_pylist()))
    ds = rd.read_parquet(_t(sf_dir, "nation"))

    def attach(b: pa.Table) -> pa.Table:
        rn = [rlookup.get(k, "") for k in b.column("n_regionkey").to_pylist()]
        return pa.table({
            "n_nationkey": b.column("n_nationkey"),
            "n_name": b.column("n_name"),
            "r_name": pa.array(rn, pa.string()),
        })

    return pa.Table.from_pylist(ds.map_batches(attach, batch_format="pyarrow").take_all())


# ---------------------------------------------------------------------------
# dedup / similarity / text-analysis operators
# ---------------------------------------------------------------------------

def q_transcripts_dedup_exact(sf_dir: str) -> Dataset:
    """Exact dedup over the synthetic transcript corpus (seeded duplicate
    rows collapse; pytest asserts the key-uniqueness invariant)."""
    from ..stages.dedup import dedup_transcripts_exact
    from .flagship import read_transcripts

    return dedup_transcripts_exact(read_transcripts(transcript_paths(sf_dir)))


def q_documents_minhash_neardup(sf_dir: str) -> Dataset:
    """MinHash/LSH near-dup pairs over documents, Jaccard-verified via
    the co-partitioned join path (the 100 TB shape: no full-corpus
    broadcast reachable from the driver contract)."""
    from ..stages.dedup import minhash_dedup_pairs

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return minhash_dedup_pairs(ds, "doc_id", threshold=0.4, verify="join")


def q_documents_simhash_neardup(sf_dir: str) -> Dataset:
    """SimHash near-dup candidates (hamming ≤ 3) over documents."""
    from ..stages.dedup import simhash_candidates

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return simhash_candidates(ds, "doc_id", max_hamming=3)


def q_documents_textstats(sf_dir: str) -> Dataset:
    """Language-ID, quality scores, token counts, fingerprints."""
    from ..stages.textstats import text_stats_batch

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(text_stats_batch, batch_format="pyarrow") \
             .drop_columns(["text"])


def q_embeddings_neardup(sf_dir: str) -> Dataset:
    """Exact embedding-cosine near-dup pairs (cosine ≥ 0.4; matches the
    DuckDB list_cosine_similarity oracle, rounded to 6)."""
    from ..stages.dedup import embedding_neardup_pairs

    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    pairs = embedding_neardup_pairs(ds, threshold=0.4)
    return pairs.map_batches(
        lambda b: b.set_column(b.schema.get_field_index("cosine"), "cosine",
                               round_sql(b.column("cosine"), 6)),
        batch_format="pyarrow")


def q_embeddings_ann_topk(sf_dir: str) -> pa.Table:
    """Brute-force cosine top-5 for the first 8 vectors as queries."""
    import pyarrow.parquet as pq

    from ..stages.similarity import brute_force_topk

    qtab = pq.read_table(_t(sf_dir, "embeddings"),
                         filters=[("vec_id", "<", 8)],
                         columns=["vec_id", "embedding"]).sort_by("vec_id")
    queries = qtab.column("embedding").to_pylist()
    qids = qtab.column("vec_id").to_pylist()
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, queries, qids, k=5)
    import pyarrow.compute as _pc
    return out.set_column(out.schema.get_field_index("cosine"), "cosine",
                          round_sql(out.column("cosine"), 6))


def q_embeddings_ann_topk_lsh(sf_dir: str) -> pa.Table:
    """LSH-bucketed approximate top-k (the scale path; rows-only check)."""
    import pyarrow.parquet as pq

    from ..stages.similarity import lsh_topk

    qtab = pq.read_table(_t(sf_dir, "embeddings"),
                         filters=[("vec_id", "<", 8)],
                         columns=["vec_id", "embedding"]).sort_by("vec_id")
    queries = qtab.column("embedding").to_pylist()
    qids = qtab.column("vec_id").to_pylist()
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return lsh_topk(ds, queries, qids, k=5, n_planes=8)


def q_embeddings_ann_topk_ivf(sf_dir: str) -> pa.Table:
    """IVF ANN with trained (spherical k-means) centroids — the
    clustered-data scale path beside the hyperplane-LSH variant."""
    import pyarrow.parquet as pq

    from ..stages.similarity import ivf_topk

    qtab = pq.read_table(_t(sf_dir, "embeddings"),
                         filters=[("vec_id", "<", 8)],
                         columns=["vec_id", "embedding"]).sort_by("vec_id")
    queries = qtab.column("embedding").to_pylist()
    qids = qtab.column("vec_id").to_pylist()
    ds = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return ivf_topk(ds, queries, qids, k=5, n_centroids=16, n_probe=4)


def media_parquet_path(sf_dir: str) -> str:
    n = max(30, int(3000 * sf_from_dir(sf_dir) * 10))
    from ..stages.multimodal import materialize_media

    return materialize_media(
        os.path.join(SYNTH_ROOT, f"media-sf{sf_from_dir(sf_dir)}.parquet"),
        n, seed=42)


def q_media_decode(sf_dir: str) -> Dataset:
    """Multimodal plumbing: synthetic binary media corpus (read from
    Parquet — the real binary-column read path) → actor-pool decode
    (stubbed codecs) + byte-histogram features.  Sized by sf; the header
    decode is hash-checked by a DuckDB oracle parsing the same bytes."""
    from ..stages.multimodal import decode_media

    ds = rd.read_parquet(media_parquet_path(sf_dir))
    return decode_media(ds).drop_columns(["features"])


def q_flagship_resumable(sf_dir: str) -> pa.Table:
    """Resumable flagship run: per-shard partitions + lineage manifest
    (fresh output dir per call; the manifest protocol is what's under
    test — see tests/test_lineage.py for crash/resume coverage)."""
    import shutil
    import tempfile

    from ..state.lineage import run_resumable
    from .flagship import flagship

    paths = transcript_paths(sf_dir)[:4]
    out = tempfile.mkdtemp(prefix="ocr_engine_lineage_", dir="/tmp")
    try:
        recs = run_resumable(paths, out, lambda p: flagship([p]))
        return pa.Table.from_pylist([
            {"input_shard": r.input_shard, "row_count": r.row_count,
             "checksum": r.checksum} for r in recs])
    finally:
        shutil.rmtree(out, ignore_errors=True)


def q_events_sessionize(sf_dir: str) -> Dataset:
    """Session windows (streaming-shaped): per user, a >30-minute gap
    starts a new session; groupby(key).map_groups over the ts-sorted
    group (ray_guide 'Streaming-shaped workloads')."""
    GAP_US = 30 * 60 * 1_000_000
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def sessions(g: pa.Table) -> pa.Table:
        # fully vectorized (no per-event Python): gap boundaries via
        # np.diff, per-session aggregates via np.add.reduceat — a hot
        # user with 1e6 events costs numpy kernels, not 1e6 iterations
        import numpy as np

        g = g.sort_by([("ts", "ascending")])
        ts = g.column("ts").combine_chunks().cast(pa.int64()) \
             .to_numpy(zero_copy_only=False)
        vals = g.column("value").combine_chunks() \
               .to_numpy(zero_copy_only=False)
        n = len(ts)
        starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(ts) > GAP_US) + 1))
        ends = np.concatenate((starts[1:] - 1, [n - 1]))
        # np.add.reduceat sums each [start, next_start) slice in element
        # order (sequential, like the SQL window sum the oracle replays)
        sums = np.add.reduceat(vals, starts)
        sums = np.array([round_sql_f(float(s), 2) for s in sums])
        uid = g.column("user_id")[0].as_py()
        k = len(starts)
        return pa.table({
            "user_id": pa.array(np.full(k, uid), pa.int64()),
            "session_id": pa.array(np.arange(1, k + 1), pa.int64()),
            "n_events": pa.array(ends - starts + 1, pa.int64()),
            "session_start": pa.array(ts[starts], pa.int64()).cast(
                pa.timestamp("us")),
            "session_end": pa.array(ts[ends], pa.int64()).cast(
                pa.timestamp("us")),
            "sum_value": pa.array(sums, pa.float64()),
        })

    return ds.groupby("user_id").map_groups(sessions, batch_format="pyarrow")


def q_events_union_distinct(sf_dir: str) -> Dataset:
    """Set op (union + distinct): users who signed up OR purchased.
    Distinct runs DISTRIBUTED (per-batch local dedup partial, then a
    groupby keep-one — the shuffle moves one row per (key, batch)); the
    result streams out instead of materializing on the driver."""
    base = ["user_id", "event_type"]
    a = rd.read_parquet(_t(sf_dir, "events"), columns=base).map_batches(
        lambda b: b.filter(pc.equal(b.column("event_type"), "signup")),
        batch_format="pyarrow")
    b = rd.read_parquet(_t(sf_dir, "events"), columns=base).map_batches(
        lambda t: t.filter(pc.equal(t.column("event_type"), "purchase")),
        batch_format="pyarrow")

    def local_distinct(t: pa.Table) -> pa.Table:
        return t.select(["user_id"]).group_by("user_id").aggregate([])

    # global distinct via a vectorized Count aggregate (a per-group
    # map_groups(slice) would pay one Python call per distinct user —
    # the ~9k rows/s per-singleton pattern dedup_exact already replaced)
    return a.union(b).map_batches(local_distinct, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Count("user_id", alias_name="_n")) \
        .map_batches(lambda t: t.drop_columns(["_n"]),
                     batch_format="pyarrow")


def q_export_rows(sf_dir: str) -> Dataset:
    """Reference 12-column export row shaping (S9, exporter.py:38-84) —
    filename concat, address concat, ISO date render, exact-cents →
    canonical 2-decimal money strings, per-record item rollup — over the
    raw-path record build, so the WHOLE query is oracle-checked (every
    field has a char-exact DuckDB twin; the flagship-path export is the
    same ``shape_export_rows`` operator over the full extraction chain
    and stays pinned by pytest end-to-end tests)."""
    from .export import shape_export_rows

    return shape_export_rows(raw_record_build(sf_dir))


def q_unapproved_vendors(sf_dir: str) -> Dataset:
    """J4 broadcast anti-join (README unapproved-vendor flagging):
    extracted vendors not on the approved list, over the raw-path vendor
    extraction so the anti-join is oracle-checked (the synthetic corpus
    draws vendors from 5 known names; 3 are approved)."""
    from .export import flag_unapproved_vendors

    approved = ["Acme Supplies Inc", "Globex Corporation", "Initech LLC"]
    flagged = flag_unapproved_vendors(raw_record_build(sf_dir), approved)
    return flagged.map_batches(
        lambda b: b.filter(pc.invert(b.column("vendor_approved"))),
        batch_format="pyarrow").select_columns(
        ["conv_id", "turn_idx", "vendor_name", "vendor_approved"])


def q_events_sample(sf_dir: str) -> Dataset:
    """Deterministic ~10 % Bernoulli sample: the keep decision is
    md5(event_id, seed) — a pure row function, resume-safe, and exactly
    reproducible by the DuckDB oracle (substr(md5(...), 1, 8) ≤
    threshold), unlike engine-random sampling."""
    from ..stages.partition import deterministic_sample

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_id", "user_id"])
    return deterministic_sample(ds, 0.1, ["event_id"], seed=42)


def q_events_running_total(sf_dir: str) -> Dataset:
    """Per-key running (cumulative) aggregate — the windowed
    ``SUM() OVER (PARTITION BY ... ORDER BY ...)`` shape: per user, the
    cumulative value sum in ts order.  groupby(key).map_groups over the
    sorted group; vectorized cumsum."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])

    def running(g: pa.Table) -> pa.Table:
        # event_id tie-break: with duplicate (user_id, ts) rows a bare
        # ts sort would make the intermediate running values depend on
        # arbitrary order (latent in this corpus, where (user_id, ts)
        # is unique — but determinism shouldn't rely on that)
        g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        csum = np.cumsum(g.column("value").to_numpy(zero_copy_only=False))
        return pa.table({
            "event_id": g.column("event_id"),
            "user_id": g.column("user_id"),
            "ts": g.column("ts"),
            "running_value": round_sql(pa.array(csum, pa.float64()), 2),
        })

    return ds.groupby("user_id").map_groups(running, batch_format="pyarrow")


def _lineitem_level2(sf_dir: str) -> Dataset:
    """Materialized (returnflag, linestatus) quantity partials — the
    6-row base every ROLLUP/CUBE level folds from (one lineitem scan)."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_linestatus",
                                  "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_quantity", "count")])
        return g.rename_columns(["l_returnflag", "l_linestatus", "p_qty",
                                 "p_n"])

    return _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [("p_qty", "sum"), ("p_n", "sum")],
        ["l_returnflag", "l_linestatus", "p_qty", "p_n"],
        ["l_returnflag", "l_linestatus", "p_qty", "p_n"]).materialize()


def _rollup_from_level2(level2: Dataset) -> Dataset:
    def finish(level: int):
        def fn(b: pa.Table) -> pa.Table:
            if level == 2:
                g = b
            elif level == 1:
                g = b.group_by(["l_returnflag"]).aggregate(
                    [("p_qty", "sum"), ("p_n", "sum")]) \
                    .rename_columns(["l_returnflag", "p_qty", "p_n"])
                g = g.append_column("l_linestatus",
                                    pa.array([None] * g.num_rows,
                                             pa.string()))
            else:
                g = pa.table({
                    "l_returnflag": pa.array([None], pa.string()),
                    "p_qty": pa.array([pc.sum(b.column("p_qty")).as_py()],
                                      pa.float64()),
                    "p_n": pa.array([pc.sum(b.column("p_n")).as_py()],
                                    pa.int64()),
                    "l_linestatus": pa.array([None], pa.string()),
                })
            return pa.table({
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "sum_qty": round_sql(g.column("p_qty"), 2),
                "n_items": g.column("p_n"),
            })
        return fn

    parts = [level2.map_batches(finish(lv), batch_format="pyarrow")
             for lv in (2, 1, 0)]
    return parts[0].union(parts[1]).union(parts[2])


def q_lineitem_rollup_levels(sf_dir: str) -> Dataset:
    """Multi-level aggregation (GROUP BY ROLLUP): quantity totals at
    (returnflag, linestatus), (returnflag) and grand-total levels —
    every level folds the materialized level-2 partials, so the input
    is scanned once."""
    return _rollup_from_level2(_lineitem_level2(sf_dir))


def q_lineitem_cube_levels(sf_dir: str) -> Dataset:
    """GROUP BY CUBE: all four grouping sets over (returnflag,
    linestatus).  The (linestatus)-only level folds the SAME
    already-materialized 6-row level-2 table the ROLLUP levels fold —
    one lineitem scan total (quantity sums are integral in float64, so
    re-summing partials is exact)."""
    level2 = _lineitem_level2(sf_dir)
    base = _rollup_from_level2(level2)
    status_level = level2.map_batches(
        lambda b: (lambda g: pa.table({
            "l_returnflag": pa.array([None] * g.num_rows, pa.string()),
            "l_linestatus": g.column("l_linestatus"),
            "sum_qty": round_sql(g.column("p_qty_sum"), 2),
            "n_items": g.column("p_n_sum"),
        }))(b.group_by(["l_linestatus"]).aggregate(
            [("p_qty", "sum"), ("p_n", "sum")])),
        batch_format="pyarrow")
    return base.union(status_level)


def q_customers_without_orders(sf_dir: str) -> Dataset:
    """Large-side ANTI-join (J4 at scale): customers with no URGENT
    order, via Ray's native hash-partitioned ``left_anti`` join — both
    sides column-pruned, no broadcast, no driver-side key set."""
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_name"])
    urgent = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"]) \
        .map_batches(
            lambda b: b.filter(pc.equal(b.column("o_orderpriority"),
                                        "1-URGENT"))
                       .select(["o_custkey"]),
            batch_format="pyarrow")
    return cust.join(urgent, join_type="left_anti", num_partitions=8,
                     on=("c_custkey",), right_on=("o_custkey",))


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_pivot_types(sf_dir: str) -> Dataset:
    """Pivot / conditional aggregation: per-user event counts fanned out
    to one column per event type.  Per-batch partial pivot (arrow
    group_by on (user, type), then a tiny in-batch fold), then one
    groupby(user) sum per column — the shuffle moves one pivoted row
    per (user, batch)."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_type"])
    idx = {t: i for i, t in enumerate(_EVENT_TYPES)}

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "event_type"]).aggregate(
            [("event_type", "count")])
        acc: dict[int, list[int]] = {}
        for u, t, n in zip(g.column("user_id").to_pylist(),
                           g.column("event_type").to_pylist(),
                           g.column("event_type_count").to_pylist()):
            i = idx.get(t)
            row = acc.setdefault(u, [0] * len(_EVENT_TYPES))
            if i is not None:   # unknown types ignored, like the
                row[i] += n     # oracle's COUNT(CASE ...) form
            # (the user still appears with zeros, matching GROUP BY)
        users = sorted(acc)
        cols = {"user_id": pa.array(users, pa.int64())}
        for i, t in enumerate(_EVENT_TYPES):
            cols[f"p_{t}"] = pa.array([acc[u][i] for u in users], pa.int64())
        return pa.table(cols)

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            *[Sum(f"p_{t}", alias_name=f"n_{t}") for t in _EVENT_TYPES])


def q_events_distinct_users_per_type(sf_dir: str) -> Dataset:
    """Exact COUNT(DISTINCT) per group, two-level: local (type, user)
    dedup partial → one global distinct on the pair → per-type partial
    counts → tiny per-type sum.  Both shuffles move deduped pair/count
    rows, never events."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "user_id"])

    def local_distinct(b: pa.Table) -> pa.Table:
        return b.group_by(["event_type", "user_id"]).aggregate([])

    pairs = ds.map_batches(local_distinct, batch_format="pyarrow") \
        .groupby(["event_type", "user_id"]) \
        .aggregate(Count("user_id", alias_name="_n"))

    def per_type_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("event_type").aggregate([("user_id", "count")])
        return g.rename_columns(["event_type", "p_users"])

    return pairs.map_batches(per_type_partial, batch_format="pyarrow") \
        .groupby("event_type").aggregate(Sum("p_users",
                                             alias_name="n_users"))


def q_events_ntile(sf_dir: str) -> Dataset:
    """NTILE window: per event type, assign each event its value
    quartile (deterministic (value, event_id) ordering).  Per-group
    sorted map_groups with the standard NTILE split — the first
    ``n % b`` tiles get the extra row."""
    import numpy as np

    B = 4
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def ntile(g: pa.Table) -> pa.Table:
        g = g.sort_by([("value", "ascending"), ("event_id", "ascending")])
        n = g.num_rows
        k, r = divmod(n, B)
        bounds = np.cumsum([k + 1] * r + [k] * (B - r))
        tiles = np.searchsorted(bounds, np.arange(n), side="right") + 1
        return g.append_column("quartile", pa.array(tiles, pa.int64()))

    return ds.groupby("event_type").map_groups(ntile, batch_format="pyarrow")


def q_events_weighted_sample(sf_dir: str) -> Dataset:
    """Deterministic weighted Bernoulli sample (~10 %, probability ∝
    event value) — exact integer decision, hash-matched by the oracle."""
    from ..stages.partition import weighted_sample

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "value"])
    # raw parquet read re-executes deterministically: skip the
    # object-store copy the materialize default exists to provide
    return weighted_sample(ds, "value", 0.1, ["event_id"], seed=42,
                           materialize=False)


def q_events_reservoir_per_user(sf_dir: str) -> Dataset:
    """Per-key deterministic reservoir: each user keeps the 3 events
    with the smallest seeded row-hash (uniform without replacement)."""
    from ..stages.partition import reservoir_per_key

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "value"])
    return reservoir_per_key(ds, "user_id", 3, ["event_id"], seed=42)


def q_orders_lineitem_join(sf_dir: str) -> Dataset:
    """Large-large hash join via ``Dataset.join`` (Ray Data ≥2.46,
    SURVEY §2.5 J2): revenue per order priority = orders ⋈ lineitem on
    orderkey, then partial-agg rollup.  Both sides are column-pruned at
    the read; the join hash-partitions on the key."""
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderpriority"])
    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_extendedprice",
                                    "l_discount"])
    joined = orders.join(line, join_type="inner", num_partitions=16,
                         on=("o_orderkey",), right_on=("l_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b.column("l_extendedprice"),
                          pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        t = pa.table({"o_orderpriority": b.column("o_orderpriority"),
                      "rev": rev})
        g = t.group_by("o_orderpriority").aggregate(
            [("rev", "sum"), ("rev", "count")])
        return g.rename_columns(["o_orderpriority", "p_rev", "p_n"])

    agg = joined.map_batches(partial, batch_format="pyarrow") \
                .groupby("o_orderpriority").aggregate(
                    Sum("p_rev", alias_name="revenue"),
                    Sum("p_n", alias_name="n_items"))
    return agg.map_batches(
        lambda b: b.set_column(b.schema.get_field_index("revenue"), "revenue",
                               round_sql(b.column("revenue"), 2)),
        batch_format="pyarrow")


def q_documents_quality_filter(sf_dir: str) -> Dataset:
    """Quality gate (C4/Gopher-shaped filter): keep documents with ≥5
    whitespace tokens and stopword_ratio ≥ 0.02 — the SQL-expressible
    core of the quality score (the full composite score is in
    q_documents_textstats)."""
    ds = q_documents_token_stats(sf_dir)
    return ds.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b.column("n_tokens"), 5),
            pc.greater_equal(b.column("stopword_ratio"), 0.02))),
        batch_format="pyarrow").select_columns(["doc_id", "n_tokens"])


def q_documents_minhash_dedup_keep(sf_dir: str) -> Dataset:
    """End-to-end near-dup DEDUP: MinHash/LSH pairs → union-find over
    the PAIRS (driver-side, pairs ≪ corpus) → broadcast the DROP set
    (non-representative component members — also pairs-sized) → the
    corpus streams through a vectorized anti-membership filter.  The
    round-1 version pulled every doc_id to the driver via unique();
    now only pair-touched ids ever leave the cluster."""
    from ..stages.dedup import minhash_dedup_pairs, representatives_from_pairs

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    pairs = [(r["id_a"], r["id_b"]) for r in
             minhash_dedup_pairs(ds, "doc_id", threshold=0.4).take_all()]
    members = sorted({i for p in pairs for i in p})
    reps = representatives_from_pairs(sorted(pairs), members)
    drop = pa.array(sorted(i for i in members if reps[i] != i), pa.int64())
    drop_ref = ray.put(drop)

    def keep(b: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(b.column("doc_id"),
                                  value_set=ray.get(drop_ref)))
        return b.filter(mask).select(["doc_id"])

    return ds.map_batches(keep, batch_format="pyarrow")


def q_events_value_stats(sf_dir: str) -> Dataset:
    """Per-event-type numeric profile (mean/min/max/count; rounded)."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("event_type").aggregate(
            [("value", "sum"), ("value", "count"),
             ("value", "min"), ("value", "max")])
        return g.rename_columns(["event_type", "p_sum", "p_n", "p_min", "p_max"])

    # a handful of event types — structurally bounded → tree
    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"), ["event_type"],
        [("p_sum", "sum"), ("p_n", "sum"), ("p_min", "min"),
         ("p_max", "max")],
        ["event_type", "p_sum", "p_n", "p_min", "p_max"],
        ["event_type", "s", "n_events", "min_value", "max_value"])

    def finish(b: pa.Table) -> pa.Table:
        mean = round_sql(pc.divide(b.column("s"), b.column("n_events")), 4)
        out = b.drop_columns(["s"])
        return out.append_column("mean_value", mean)

    return agg.map_batches(finish, batch_format="pyarrow")


def q_events_approx_distinct_users(sf_dir: str) -> pa.Table:
    """HyperLogLog approximate COUNT(DISTINCT user_id) — a mergeable
    per-batch sketch (4 KB/batch) merged driver-side; rows-only check
    (estimate is deterministic; tests bound the error at <5 %)."""
    from ..stages.sketches import approx_distinct

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id"])
    est = approx_distinct(ds, "user_id", p=12)
    return pa.table({"approx_distinct_users": pa.array([round(est, 1)],
                                                       pa.float64())})


def q_events_asof_join(sf_dir: str) -> Dataset:
    """As-of join (custom operator the Dataset API lacks natively,
    SURVEY 'custom operators' path (a)): for every purchase, the most
    recent 'view' event by the same user at or before the purchase ts.
    Composition: filter both sides → groupby(user_id) → vectorized
    backward searchsorted inside map_groups (per-key sorted merge —
    the same semantics pandas merge_asof computed here until r5, now
    Arrow/numpy so the catalog's pandas batch_format count is zero;
    the partitioning assumption is user_id co-location, provided by
    the groupby)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "event_type"])
    both = ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column("event_type"),
                                    value_set=pa.array(["purchase", "view"]))),
        batch_format="pyarrow")

    empty = pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "prior_view_event_id": pa.array([], pa.int64()),
        "prior_view_ts": pa.array([], pa.timestamp("us")),
    })

    def asof(g: pa.Table) -> pa.Table:
        et = g.column("event_type")
        lt = g.filter(pc.equal(et, "purchase"))
        if lt.num_rows == 0:
            return empty
        rt = g.filter(pc.equal(et, "view"))
        lts = lt.column("ts").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        rts = rt.column("ts").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ro = np.argsort(rts, kind="stable")
        rts_s = rts[ro]
        rid_s = rt.column("event_id") \
            .to_numpy(zero_copy_only=False)[ro]
        # backward as-of: last view with ts ≤ purchase ts (ties take
        # the later sorted row — merge_asof's backward convention)
        idx = np.searchsorted(rts_s, lts, side="right") - 1
        miss = idx < 0
        safe = np.maximum(idx, 0)
        return pa.table({
            "event_id": lt.column("event_id"),
            "user_id": lt.column("user_id"),
            "ts": lt.column("ts"),
            "prior_view_event_id": pa.array(rid_s[safe], pa.int64(),
                                            mask=miss),
            "prior_view_ts": pa.array(rts_s[safe], pa.int64(),
                                      mask=miss)
            .cast(pa.timestamp("us")),
        })

    out = both.groupby("user_id").map_groups(asof,
                                             batch_format="pyarrow")
    # normalize dtypes for the hash compare (prior_* nullable)
    def cast(b: pa.Table) -> pa.Table:
        return b.cast(pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("prior_view_event_id", pa.int64()),
            ("prior_view_ts", pa.timestamp("us")),
        ]))

    return out.map_batches(cast, batch_format="pyarrow")


def q_events_top2_per_user(sf_dir: str) -> Dataset:
    """Per-group top-k: each user's 2 highest-value events
    (deterministic tiebreak on event_id)."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "value"])

    def top2(g: pa.Table) -> pa.Table:
        s = g.sort_by([("value", "descending"), ("event_id", "ascending")])
        return s.slice(0, 2)

    return ds.groupby("user_id").map_groups(top2, batch_format="pyarrow")


def q_transcripts_stratified_sample(sf_dir: str) -> Dataset:
    """Deterministic per-conversation stratified sample (30 %): the
    keep/drop decision is a pure hash of (conv_id, turn_idx, seed), so
    the sample is identical across reruns/partitionings (resume-safe,
    unlike engine-random sampling)."""
    from ..stages.partition import stratified_sample
    from .flagship import read_transcripts

    ds = read_transcripts(transcript_paths(sf_dir))
    return stratified_sample(ds, "conv_id", 0.3,
                             id_cols=["conv_id", "turn_idx"]) \
        .select_columns(["conv_id", "turn_idx", "role"])


def q_transcripts_dedup_streaming(sf_dir: str) -> Dataset:
    """One-pass exact dedup through the shared mutable index actors
    (incremental-ingestion path).  The synthetic corpus's duplicates are
    exact full-row copies, so any-winner output equals keep-first — the
    same DuckDB oracle as transcripts_dedup_exact hash-checks it."""
    from ..stages.dedup import dedup_exact_streaming
    from .flagship import read_transcripts

    ds = read_transcripts(transcript_paths(sf_dir))
    return dedup_exact_streaming(ds, ["conv_id", "turn_idx", "text"])


def q_transcripts_normalize(sf_dir: str) -> Dataset:
    """The normalize stage (M2) in isolation, oracle-checked: the DuckDB
    twin reproduces the whole deterministic cleanup (line endings →
    control-char strip → whitespace collapse → blank-run limit → trim)
    as a regexp_replace chain, verified char-exact.  (The SQL twin
    covers the ASCII corpus; unicode NFC — a no-op on ASCII — has no
    SQL equivalent and stays pytest-covered.)"""
    from ..core.textnorm import normalize_text
    from .flagship import read_transcripts

    ds = read_transcripts(transcript_paths(sf_dir)) \
        .select_columns(["conv_id", "turn_idx", "text"])

    def norm(b: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": b.column("conv_id"),
            "turn_idx": b.column("turn_idx"),
            "norm_text": pa.array([normalize_text(t or "")
                                   for t in b.column("text").to_pylist()],
                                  pa.string()),
        })

    return ds.map_batches(norm, batch_format="pyarrow")


def q_transcripts_invoice_numbers(sf_dir: str) -> Dataset:
    """The invoice-number field extractor (M9) as a standalone operator
    over normalized raw text, oracle-checked: the DuckDB twin replays
    the same three prioritized case-insensitive regexes via a
    regexp_extract COALESCE chain (verified char-exact corpus-wide)."""
    from ..core.fields import extract_invoice_number
    from ..core.textnorm import normalize_text
    from .flagship import read_transcripts

    ds = read_transcripts(transcript_paths(sf_dir)) \
        .select_columns(["conv_id", "turn_idx", "text"])

    def ext(b: pa.Table) -> pa.Table:
        out = []
        for t in b.column("text").to_pylist():
            n = normalize_text(t or "")
            out.append(extract_invoice_number(n, n.lower())[0])
        return pa.table({"conv_id": b.column("conv_id"),
                         "turn_idx": b.column("turn_idx"),
                         "invoice_number": pa.array(out, pa.string())})

    return ds.map_batches(ext, batch_format="pyarrow")


def q_transcripts_totals(sf_dir: str) -> Dataset:
    """The totals extractor (M13/M15: subtotal/tax/total → exact int
    cents) as a standalone operator over normalized raw text,
    oracle-checked — the SQL twin replicates the single-alternation
    scan's first-occurrence-per-kind semantics with per-kind regexes
    (the lookbehind becomes an (^|[^a-z]) group; divergence would need
    a kind keyword inside another kind's matched span, which the amount
    grammar makes impossible) and the half-up money parse via
    round(x*100)."""
    from ..core.fields import extract_totals
    from ..core.textnorm import normalize_text
    from .flagship import read_transcripts

    ds = read_transcripts(transcript_paths(sf_dir)) \
        .select_columns(["conv_id", "turn_idx", "text"])

    def ext(b: pa.Table) -> pa.Table:
        g_out, t_out, f_out = [], [], []
        for t in b.column("text").to_pylist():
            n = normalize_text(t or "")
            totals, _ = extract_totals(n, n.lower())
            g_out.append(totals["grand_total_cents"])
            t_out.append(totals["taxes_cents"])
            f_out.append(totals["final_total_cents"])
        return pa.table({"conv_id": b.column("conv_id"),
                         "turn_idx": b.column("turn_idx"),
                         "grand_total_cents": pa.array(g_out, pa.int64()),
                         "taxes_cents": pa.array(t_out, pa.int64()),
                         "final_total_cents": pa.array(f_out, pa.int64())})

    return ds.map_batches(ext, batch_format="pyarrow")


def q_transcripts_vendors(sf_dir: str) -> Dataset:
    """The vendor/address extractor (M10/M11) as a standalone operator
    over normalized raw text, oracle-checked: the SQL twin filters
    vendor-material lines with list_filter (non-blank, non-table,
    non-kv) and replays the city/state/postal regexes — char-exact
    corpus-wide."""
    from ..core.fields import extract_vendor
    from ..core.textnorm import normalize_text
    from .flagship import read_transcripts

    ds = read_transcripts(transcript_paths(sf_dir)) \
        .select_columns(["conv_id", "turn_idx", "text"])
    keys = ("vendor_name", "vendor_street", "vendor_city", "vendor_state",
            "vendor_postal")

    def ext(b: pa.Table) -> pa.Table:
        cols: dict[str, list] = {k: [] for k in keys}
        for t in b.column("text").to_pylist():
            v = extract_vendor(normalize_text(t or ""))
            for k in keys:
                cols[k].append(v[k])
        return pa.table({"conv_id": b.column("conv_id"),
                         "turn_idx": b.column("turn_idx"),
                         **{k: pa.array(cols[k], pa.string()) for k in keys}})

    return ds.map_batches(ext, batch_format="pyarrow")


def q_transcripts_dates(sf_dir: str) -> Dataset:
    """The multi-strategy date extractor (M12 — the reference's biggest
    pure function, ``app/utils/data_extractor.py:38-192``) as a
    standalone operator over normalized raw text, oracle-checked: the
    DuckDB twin replays the family-ordered regex scan (all matches per
    family in position order, first parseable wins), the DMY→MDY→YMD
    order preference, the 8-digit special forms and the two-digit-year
    century windowing — verified char-exact corpus-wide at sf0.01 and
    sf0.1.  Emitted as timestamp[us] (both sides) for a stable driver
    dtype."""
    from ..core.dates import find_date
    from ..core.extract import DEFAULT_AS_OF
    from ..core.textnorm import normalize_text
    from .flagship import read_transcripts

    ds = read_transcripts(transcript_paths(sf_dir)) \
        .select_columns(["conv_id", "turn_idx", "text"])

    def ext(b: pa.Table) -> pa.Table:
        out = []
        for t in b.column("text").to_pylist():
            n = normalize_text(t or "")
            d, _ = find_date(n, DEFAULT_AS_OF, n.lower())
            out.append(d)
        return pa.table({
            "conv_id": b.column("conv_id"),
            "turn_idx": b.column("turn_idx"),
            "invoice_date": pa.array(out, pa.date32()).cast(
                pa.timestamp("us")),
        })

    return ds.map_batches(ext, batch_format="pyarrow")


def raw_record_build(sf_dir: str) -> Dataset:
    """The full generic field-extraction record build (M9–M15 + the A1
    item rollup) over normalized raw text — the plain-content path of
    ``core.extract._extract_turn_inner``, skipping the content-type
    extractors so every field has a DuckDB twin (the html/pdf/markdown
    extraction step is pinned by pytest parity instead; the flagship
    query runs the full chain).  Feeds the oracle-checked export/J4
    queries."""
    from ..core.dates import find_date
    from ..core.extract import DEFAULT_AS_OF, items_rollup
    from ..core.fields import (
        Structures,
        extract_invoice_number,
        extract_totals,
    )
    from ..core.textnorm import normalize_text
    from .flagship import read_transcripts

    ds = read_transcripts(transcript_paths(sf_dir)) \
        .select_columns(["conv_id", "turn_idx", "text"])
    vkeys = ("vendor_name", "vendor_street", "vendor_city",
             "vendor_state", "vendor_postal")

    def build(b: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            "invoice_number": [], "invoice_date": [],
            "grand_total_cents": [], "taxes_cents": [],
            "final_total_cents": [], "items_qty": [],
            "items_total_cents": [], "items_avg_unit_price_cents": [],
            **{k: [] for k in vkeys},
        }
        for t in b.column("text").to_pylist():
            n = normalize_text(t or "")
            lower = n.lower()
            inv, _ = extract_invoice_number(n, lower)
            totals, _ = extract_totals(n, lower)
            d, _ = find_date(n, DEFAULT_AS_OF, lower)
            s = Structures(n)
            qty, total, avg = items_rollup(s.items)
            cols["invoice_number"].append(inv)
            cols["invoice_date"].append(d)
            cols["grand_total_cents"].append(totals["grand_total_cents"])
            cols["taxes_cents"].append(totals["taxes_cents"])
            cols["final_total_cents"].append(totals["final_total_cents"])
            cols["items_qty"].append(qty)
            cols["items_total_cents"].append(total)
            cols["items_avg_unit_price_cents"].append(avg)
            for k in vkeys:
                cols[k].append(s.vendor[k])
        return pa.table({
            "conv_id": b.column("conv_id"),
            "turn_idx": b.column("turn_idx"),
            "invoice_number": pa.array(cols["invoice_number"], pa.string()),
            **{k: pa.array(cols[k], pa.string()) for k in vkeys},
            "invoice_date": pa.array(cols["invoice_date"], pa.date32()),
            "grand_total_cents": pa.array(cols["grand_total_cents"], pa.int64()),
            "taxes_cents": pa.array(cols["taxes_cents"], pa.int64()),
            "final_total_cents": pa.array(cols["final_total_cents"], pa.int64()),
            "items_qty": pa.array(cols["items_qty"], pa.int64()),
            "items_total_cents": pa.array(cols["items_total_cents"], pa.int64()),
            "items_avg_unit_price_cents": pa.array(
                cols["items_avg_unit_price_cents"], pa.int64()),
            "pages": pa.array([1] * b.num_rows, pa.int32()),
        })

    return ds.map_batches(build, batch_format="pyarrow")


def q_transcripts_raw_rollup(sf_dir: str) -> Dataset:
    """Raw-transcript per-conversation rollup (A1 on the input side, no
    extraction in the loop — SQL-expressible, so the driver can
    hash-check the groupby/partial-agg machinery itself): n_turns,
    first/last ts, total text chars per conv_id."""
    from .flagship import read_transcripts

    ds = read_transcripts(transcript_paths(sf_dir)) \
        .select_columns(["conv_id", "ts", "text"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "conv_id": b.column("conv_id"),
            "ts": b.column("ts"),
            "chars": pc.utf8_length(b.column("text")).cast(pa.int64()),
        })
        g = t.group_by("conv_id").aggregate(
            [("ts", "count"), ("ts", "min"), ("ts", "max"), ("chars", "sum")])
        return g.rename_columns(["conv_id", "p_n", "p_min", "p_max", "p_chars"])

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("conv_id").aggregate(
                 Sum("p_n", alias_name="n_turns"),
                 Min("p_min", alias_name="first_ts"),
                 Max("p_max", alias_name="last_ts"),
                 Sum("p_chars", alias_name="total_chars"))


def q_transcripts_assemble_raw(sf_dir: str) -> Dataset:
    """Per-conversation ordered assembly over RAW text (A4's ordering
    semantics with a SQL twin — string_agg ORDER BY): turns sorted by
    (turn_idx, ts, text), joined with blank lines."""
    from .flagship import read_transcripts

    ds = read_transcripts(transcript_paths(sf_dir)) \
        .select_columns(["conv_id", "turn_idx", "ts", "text"])

    def assemble(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"), ("ts", "ascending"),
                       ("text", "ascending")])
        return pa.table({
            "conv_id": [g.column("conv_id")[0].as_py()],
            "n_turns": pa.array([g.num_rows], pa.int64()),
            "doc_text": ["\n\n".join(g.column("text").to_pylist())],
        })

    return ds.groupby("conv_id").map_groups(assemble, batch_format="pyarrow")


def q_lineitem_quantiles(sf_dir: str) -> pa.Table:
    """Exact distributed quantiles (quantile_disc semantics) over the
    bounded-domain lineitem columns via a value-count histogram — the
    shuffle moves (value, count) rows only."""
    from ..stages.quantiles import exact_quantiles

    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_quantity", "l_discount", "l_tax"])
    return exact_quantiles(ds, ["l_quantity", "l_discount", "l_tax"])


def q_events_range_join(sf_dir: str) -> Dataset:
    """Range join (interval predicate the Dataset API lacks natively):
    for each purchase, how many views by the same user in the hour
    before it.  Composition path (SURVEY 'custom operators' (a)):
    filter both sides → groupby(user_id) → per-group sorted
    searchsorted window count (the partitioning assumption is user_id
    co-location, provided by the groupby)."""
    import numpy as np

    HOUR_US = 3_600_000_000
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "event_type"])
    both = ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column("event_type"),
                                    value_set=pa.array(["purchase", "view"]))),
        batch_format="pyarrow")

    def window_count(g: pa.Table) -> pa.Table:
        is_p = pc.equal(g.column("event_type"), "purchase")
        p = g.filter(is_p)
        if p.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "ts": pa.array([], pa.timestamp("us")),
                             "n_views_1h": pa.array([], pa.int64())})
        v_ts = np.sort(g.filter(pc.invert(is_p)).column("ts")
                        .cast(pa.int64()).to_numpy(zero_copy_only=False))
        p_ts = p.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        # views in [p.ts - 1h, p.ts): inclusive lower, exclusive upper
        n = (np.searchsorted(v_ts, p_ts, side="left")
             - np.searchsorted(v_ts, p_ts - HOUR_US, side="left"))
        return pa.table({"event_id": p.column("event_id"),
                         "user_id": p.column("user_id"),
                         "ts": p.column("ts"),
                         "n_views_1h": pa.array(n, pa.int64())})

    return both.groupby("user_id").map_groups(window_count,
                                              batch_format="pyarrow")


def q_events_lag_delta(sf_dir: str) -> Dataset:
    """LAG window shape (``LAG(ts) OVER (PARTITION BY user ORDER BY
    ts)``): per event, the previous event's ts and the gap in exact
    integer microseconds (NULL on each user's first event).  Vectorized
    shift inside the per-key sorted group — same shape as
    running_total/NTILE, no per-event Python."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts"])

    def lag(g: pa.Table) -> pa.Table:
        g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = g.column("ts").combine_chunks().cast(pa.int64()) \
             .to_numpy(zero_copy_only=False)
        prev = np.empty_like(ts)
        prev[1:] = ts[:-1]
        mask = np.zeros(len(ts), dtype=bool)
        if len(ts):
            mask[0] = True
            prev[0] = 0
        prev_arr = pa.array(prev, pa.int64(), mask=mask)
        gap = pa.array(ts - prev, pa.int64(), mask=mask)
        return pa.table({
            "event_id": g.column("event_id"),
            "user_id": g.column("user_id"),
            "ts": g.column("ts"),
            "prev_ts": prev_arr.cast(pa.timestamp("us")),
            "gap_us": gap,
        })

    return ds.groupby("user_id").map_groups(lag, batch_format="pyarrow")


def q_lineitem_grouping_sets(sf_dir: str) -> Dataset:
    """GROUP BY GROUPING SETS ((returnflag), (linestatus)) — the
    grouping-sets shape beyond ROLLUP/CUBE: two independent single-key
    levels, both folded from the same materialized 6-row level-2
    partial table (one lineitem scan total)."""
    level2 = _lineitem_level2(sf_dir)

    def fold(key: str):
        def fn(b: pa.Table) -> pa.Table:
            g = b.group_by([key]).aggregate(
                [("p_qty", "sum"), ("p_n", "sum")])
            cols = {
                "l_returnflag": g.column(key) if key == "l_returnflag"
                else pa.array([None] * g.num_rows, pa.string()),
                "l_linestatus": g.column(key) if key == "l_linestatus"
                else pa.array([None] * g.num_rows, pa.string()),
                "sum_qty": round_sql(g.column("p_qty_sum"), 2),
                "n_items": g.column("p_n_sum"),
            }
            return pa.table(cols)
        return fn

    return level2.map_batches(fold("l_returnflag"),
                              batch_format="pyarrow", batch_size=None) \
        .union(level2.map_batches(fold("l_linestatus"),
                                  batch_format="pyarrow", batch_size=None))


def _jaccard_sized_pairs(sf_dir: str) -> Dataset:
    """(id_a, id_b, c, n_a, n_b) rows for every document pair sharing
    ≥ 1 word-3-gram shingle — the shared front half of the exact
    Jaccard family (pairs query + threshold curve): inverted shingle
    index, in-group pair expansion, per-doc set sizes by join."""
    from ray.data.aggregate import Count

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    sh = ds.map_batches(_doc_shingle_rows("doc_id"),
                        batch_format="pyarrow").materialize()
    sizes = with_schema(
        sh.groupby("doc_id").aggregate(Count("sh", alias_name="n")),
        pa.schema([("doc_id", pa.int64()), ("n", pa.int64())]))
    # shared inverted-index kernel (in-group pair expansion — the
    # sh ⋈ sh self-join formulation of the same plan measured 5×
    # slower at sf0.1), then the per-doc set sizes arrive by join.
    # with_schema: on sparse corpora every map_groups partition can be
    # a schema-less zero-row block, which crashes join 1's finalize
    inter = with_schema(
        _shingle_pair_counts(sh),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("c", pa.int64())]))

    # with_schema between the chained joins: join 1's empty partitions
    # emit schema-less zero-row blocks that crash join 2's finalize on
    # sparse pair tables (see util.with_schema)
    half = with_schema(
        inter.join(
            sizes.map_batches(lambda b: b.rename_columns(["id_a", "n_a"]),
                              batch_format="pyarrow"),
            join_type="inner", num_partitions=8, on=("id_a",)),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("c", pa.int64()), ("n_a", pa.int64())]))
    return half.join(
        sizes.map_batches(lambda b: b.rename_columns(["id_b", "n_b"]),
                          batch_format="pyarrow"),
        join_type="inner", num_partitions=8, on=("id_b",))


def q_documents_jaccard_pairs(sf_dir: str) -> Dataset:
    """EXACT n-gram Jaccard near-dup pairs, oracle-checked — the exact
    twin of the MinHash estimate (LLM-pipeline dedup suite): word
    3-gram shingle sets, pairs generated DISTRIBUTED via an inverted
    shingle index (flat_map shingles → co-shingle join → per-pair
    intersection counts → two hash joins against the per-doc set
    sizes), jaccard = |A∩B| / (|A|+|B|-|A∩B|) ≥ 0.5.

    Scale shape: no driver-side state — candidate pairs exist only for
    docs sharing a shingle, intersection counts come from a groupby on
    the pair key, and set sizes arrive by join (not broadcast).
    Stop-shingle filtering (shingles above :data:`SHINGLE_DF_CAP`
    contribute no pairs, loudly logged) bounds the in-group O(df²)
    fanout on prose corpora; this corpus sits far below the cap, so the
    [SQL] oracle is unaffected."""
    return _jaccard_sized_pairs(sf_dir).map_batches(
        _pair_jaccard_score(0.5, "id_a", "id_b"),
        batch_format="pyarrow")


def q_media_resize_plan(sf_dir: str) -> Dataset:
    """Image-resize stage (multimodal suite): aspect-preserving integer
    fit-within-256 geometry in an actor pool; the stub payload rewrite
    is pytest-covered, while the GEOMETRY — parsed from the same binary
    headers — is hash-checked by a DuckDB oracle (to_hex nibble
    arithmetic, like media_decode)."""
    from ..stages.multimodal import resize_media

    ds = rd.read_parquet(media_parquet_path(sf_dir))
    return resize_media(ds, max_dim=256).select_columns(
        ["media_id", "conv_id", "turn_idx", "width", "height",
         "new_width", "new_height"])


def q_media_frame_sample(sf_dir: str) -> Dataset:
    """Video frame-sampling stage (1→N fanout in an actor pool): one row
    per every-30th frame — the DuckDB oracle re-derives each frame slice
    from the same payload blob (frame count from the little-endian
    header, per-frame byte offsets modulo body length), so the whole
    fanout is hash-checked.  Frame bytes project to hex for the compare
    (binary columns sort as unhashable bytearray in the pandas layer;
    the stage itself emits real binary frames, pytest-pinned)."""
    from ..stages.multimodal import sample_frames

    ds = rd.read_parquet(media_parquet_path(sf_dir))
    return sample_frames(ds, every_n=30).map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("frame"), "frame_hex",
            pa.array([f.hex() for f in b.column("frame").to_pylist()],
                     pa.string())),
        batch_format="pyarrow")


def _doc_shingle_rows(out_id: str):
    """doc batch → (out_id, sh) distinct word-3-gram rows, tokenized
    with the SQL-parity split-on-single-space (string_split twin).
    Delegates to the vectorized k-gram kernel (:func:`_doc_kgram_rows`
    — k shifted takes + one C-level binary_join replaced the original
    per-row Python set loop; identical rows, pytest-pinned)."""
    return _doc_kgram_rows(out_id, 3)


def _pair_jaccard_score(threshold: float, a_col: str, b_col: str):
    """Shared scorer for the exact-jaccard pair queries: input batches
    carry (a_col, b_col, c, n_a, n_b); emits pairs with
    jaccard = c / (n_a + n_b - c) ≥ threshold, rounded to 6 (DuckDB
    ROUND parity)."""
    def score(b: pa.Table) -> pa.Table:
        import numpy as np

        c = b.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        na = b.column("n_a").to_numpy(zero_copy_only=False)
        nb = b.column("n_b").to_numpy(zero_copy_only=False)
        sim = c / (na + nb - c)
        keep = sim >= threshold
        t = b.filter(pa.array(keep))
        return pa.table({
            a_col: t.column(a_col),
            b_col: t.column(b_col),
            "jaccard": round_sql(pa.array(sim[keep], pa.float64()), 6),
        })
    return score


def q_documents_decontaminate(sf_dir: str) -> Dataset:
    """Training-data DECONTAMINATION, exact: find every document whose
    text is a near-duplicate (word-3-gram Jaccard ≥ 0.5) of any doc in
    a held-out benchmark set (a deterministic ~5 % sample the oracle
    replays via the md5 predicate).  Directional pairs
    (doc_id, bench_id), identity excluded — the rows a pipeline would
    DROP before training.  Same distributed inverted-index shape as
    q_documents_jaccard_pairs (co-shingle join, per-pair counts, size
    joins — no driver state, stop-shingles above
    :data:`SHINGLE_DF_CAP` dropped loudly);
    q_documents_decontaminate_lsh is the approximate scale path over
    the same semantics."""
    from ray.data.aggregate import Count

    from ..stages.partition import deterministic_sample

    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    bench = deterministic_sample(ds, 0.05, ["doc_id"], seed=7)
    sa = ds.map_batches(_doc_shingle_rows("doc_id"),
                        batch_format="pyarrow").materialize()
    sb = bench.map_batches(_doc_shingle_rows("doc_id"),
                           batch_format="pyarrow")

    # cross-table pair counts via the tagged in-group expansion (the
    # sa ⋈ sb join-cascade shape this replaced measured ~2× slower):
    # per shingle group, candidate × bench-member meshgrid, identity
    # excluded — one groupby(sh) exchange total
    tagged = sa.map_batches(
        lambda b: b.append_column("bench", pa.array(
            np.zeros(b.num_rows, np.int8))), batch_format="pyarrow") \
        .union(sb.map_batches(
            lambda b: b.append_column("bench", pa.array(
                np.ones(b.num_rows, np.int8))), batch_format="pyarrow"))

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "bench_id": pa.array([], pa.int64()),
                      "p_c": pa.array([], pa.int64())})

    def expand(g: pa.Table) -> pa.Table:
        fl = g.column("bench").to_numpy(zero_copy_only=False)
        if not fl.any() or fl.all() or _df_capped(
                g, g.num_rows, SHINGLE_DF_CAP, "decontaminate"):
            return empty
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        a_ids, b_ids = ids[fl == 0], ids[fl == 1]
        da = np.repeat(a_ids, len(b_ids))
        db = np.tile(b_ids, len(a_ids))
        keep = da != db
        return pa.table({"doc_id": pa.array(da[keep], pa.int64()),
                         "bench_id": pa.array(db[keep], pa.int64()),
                         "p_c": pa.array(np.ones(int(keep.sum()),
                                                 np.int64))})

    pairs = tagged.groupby("sh").map_groups(expand,
                                            batch_format="pyarrow") \
        .materialize()
    inter = _pair_combine(pairs, ["doc_id", "bench_id"], "c")

    sizes = with_schema(
        sa.groupby("doc_id").aggregate(Count("sh", alias_name="n_a")),
        pa.schema([("doc_id", pa.int64()), ("n_a", pa.int64())]))
    # schema pinned between the chained joins (see q_documents_jaccard_pairs)
    half = with_schema(
        inter.join(sizes, join_type="inner", num_partitions=8,
                   on=("doc_id",)),
        pa.schema([("doc_id", pa.int64()), ("bench_id", pa.int64()),
                   ("c", pa.int64()), ("n_a", pa.int64())]))
    sized = half.join(sizes.map_batches(
        lambda b: b.rename_columns(["bench_id", "n_b"]),
        batch_format="pyarrow"),
        join_type="inner", num_partitions=8, on=("bench_id",))

    return sized.map_batches(_pair_jaccard_score(0.5, "doc_id", "bench_id"),
                             batch_format="pyarrow")


def q_documents_decontaminate_lsh(sf_dir: str) -> Dataset:
    """The approximate scale path of q_documents_decontaminate:
    cross-table MinHash/LSH join (stages/dedup.minhash_join) of the
    corpus against the same deterministic benchmark sample.  Rows-only
    (recall < 1 by LSH construction); pytest pins
    subset-of-brute-force-jaccard and exact-duplicate recall.

    Both sides drop <3-token docs first — the exact query structurally
    excludes them (no 3-gram shingles), and without the filter empty
    texts would pair with every empty benchmark row (all-zero minhash
    signatures share every band; jaccard(∅, ∅) = 1).  Residual
    divergence from the exact query: word_shingles tokenizes with
    split() (whitespace runs) vs the exact path's SQL-parity
    split(' ') — identical on single-spaced corpora like this one."""
    from ..stages.dedup import minhash_join
    from ..stages.partition import deterministic_sample

    def min_3_tokens(b: pa.Table) -> pa.Table:
        mask = [len((t or "").split(" ")) >= 3
                for t in b.column("text").to_pylist()]
        return b.filter(pa.array(mask, pa.bool_()))

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"]) \
        .map_batches(min_3_tokens, batch_format="pyarrow")
    bench = deterministic_sample(ds, 0.05, ["doc_id"], seed=7)
    pairs = minhash_join(ds, bench, "doc_id", "doc_id", threshold=0.5)
    return pairs.map_batches(
        lambda b: (lambda f: pa.table({
            "doc_id": f.column("id_a"),
            "bench_id": f.column("id_b"),
            "jaccard": round_sql(f.column("jaccard"), 6),
        }))(b.filter(pc.not_equal(b.column("id_a"), b.column("id_b")))),
        batch_format="pyarrow")


def q_documents_lsh_join_exact(sf_dir: str) -> Dataset:
    """Cross-table LSH similarity JOIN (stages/dedup.minhash_join)
    promoted to a first-class hash-gated contract query at
    threshold 1.0: a jaccard-1.0 pair has IDENTICAL shingle sets, so
    both sides produce identical seeded MinHash signatures, share every
    band, and recall is STRUCTURAL (a property of the signature
    function), not probabilistic — while precision is exact because
    candidates verify with true string jaccard.  The planted duplicate
    set is a DERIVED second corpus: the deterministic 25 % md5 sample
    (seed 11) re-keyed to a disjoint id range (+10M) with its text
    verbatim — every planted row's partner in the main corpus MUST
    surface, so the query carries real rows at every scale (the
    corpus's own seeded dup clusters are near-dups, never jaccard
    exactly 1.0).  Output (doc_id, bench_id, jaccard=1.0); <3-token
    docs excluded on both sides (no 3-gram shingles; the twin replays
    the filter).  Same LSH machinery as q_documents_decontaminate_lsh,
    but the threshold choice is what moves it from rows-only to the
    bit-exact gate."""
    from ..stages.dedup import minhash_join
    from ..stages.partition import deterministic_sample

    BENCH_ID_OFFSET = 10_000_000

    def min_3_tokens(b: pa.Table) -> pa.Table:
        nt = pc.list_value_length(pc.split_pattern(
            pc.fill_null(b.column("text"), ""), " "))
        return b.filter(pc.greater_equal(nt, pa.scalar(3)))

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"]) \
        .map_batches(min_3_tokens, batch_format="pyarrow")
    bench = deterministic_sample(ds, 0.25, ["doc_id"], seed=11) \
        .map_batches(
            lambda b: b.set_column(
                b.schema.get_field_index("doc_id"), "doc_id",
                pc.add(b.column("doc_id"),
                       pa.scalar(BENCH_ID_OFFSET, pa.int64()))),
            batch_format="pyarrow")
    pairs = minhash_join(ds, bench, "doc_id", "doc_id", threshold=1.0)
    return pairs.map_batches(
        lambda b: pa.table({
            "doc_id": b.column("id_a"),
            "bench_id": b.column("id_b"),
            "jaccard": round_sql(b.column("jaccard"), 6),
        }),
        batch_format="pyarrow")


def q_transcripts_conv_rollup_fields(sf_dir: str) -> Dataset:
    """Extraction → per-conversation rollup COMPOSITION under the hash
    gate (the A1 shape end-to-end): raw-path field extraction, then
    per-batch partial aggregation and one conv_id groupby — n_turns,
    invoices found, dates found, summed final totals.  The shuffle moves
    one partial row per (conv, batch); the DuckDB twin recomputes every
    field from its char-exact expression and aggregates in SQL."""
    from ray.data.aggregate import Sum

    rec = raw_record_build(sf_dir).select_columns(
        ["conv_id", "invoice_number", "invoice_date", "final_total_cents"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("conv_id").aggregate([
            ("conv_id", "count"), ("invoice_number", "count"),
            ("invoice_date", "count"), ("final_total_cents", "sum")])
        g = g.rename_columns(
            ["conv_id", "p_turns", "p_inv", "p_dated", "p_cents"])
        return g.set_column(
            g.schema.get_field_index("p_cents"), "p_cents",
            pc.fill_null(g.column("p_cents"), 0))

    return rec.map_batches(partial, batch_format="pyarrow") \
        .groupby("conv_id").aggregate(
            Sum("p_turns", alias_name="n_turns"),
            Sum("p_inv", alias_name="n_invoices"),
            Sum("p_dated", alias_name="n_dated"),
            Sum("p_cents", alias_name="total_cents"))


def q_documents_textstats_sql(sf_dir: str) -> Dataset:
    """The SQL-expressible textstats surface under the hash gate:
    language-ID (stopword-hit argmax with fixed tie order, CJK density
    check), the full quality-score composite (Gopher-shaped gates,
    DuckDB-ROUND-parity 4-decimal rounding) and both token counts.  The
    fingerprint (crc32-based rolling hash — no crc32 in DuckDB) stays
    on the rows-only q_documents_textstats."""
    from ..stages.textstats import text_stats_batch

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(text_stats_batch, batch_format="pyarrow") \
             .drop_columns(["text", "fingerprint"])


def q_customers_with_urgent_orders(sf_dir: str) -> Dataset:
    """SEMI-join via broadcast Bloom pre-filter
    (stages/partition.bloom_semi_join): customers with ≥1 URGENT order.
    The small side's keys fold into a 1 MiB mergeable bitmap that drops
    non-matching customers BEFORE the hash-join shuffle; Bloom false
    positives are removed by the exact join, so the result (and its
    oracle) is the exact semi-join."""
    from ..stages.partition import bloom_semi_join

    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_name"])
    urgent = rd.read_parquet(
        _t(sf_dir, "orders"), columns=["o_custkey", "o_orderpriority"]) \
        .map_batches(
            lambda b: b.filter(pc.equal(b.column("o_orderpriority"),
                                        "1-URGENT"))
                       .select(["o_custkey"]),
            batch_format="pyarrow")
    return bloom_semi_join(cust, urgent, "c_custkey", "o_custkey") \
        .select_columns(["c_custkey", "c_name"])


def q_events_moving_avg(sf_dir: str) -> Dataset:
    """Sliding-window aggregate (``ROWS BETWEEN 2 PRECEDING AND CURRENT
    ROW``): per user, the 3-event moving average of value in ts order.
    Exactness: values convert to integer cents first (std::round
    emulation, the weighted_sample technique) so the windowed sums are
    exact int64 on both sides and only the final (sum/count)/100
    division is float — bit-identical to the DuckDB window twin.
    Vectorized: one cumsum + two gathers per group."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])

    def mov(g: pa.Table) -> pa.Table:
        g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        cents = scaled_int_sql(g.column("value"), 100.0)
        k = len(cents)
        cs = np.concatenate(([0], np.cumsum(cents)))
        idx = np.arange(k)
        n = np.minimum(idx + 1, 3)
        wsum = cs[idx + 1] - cs[np.maximum(idx - 2, 0)]
        avg = wsum * 1.0 / n / 100.0
        return pa.table({
            "event_id": g.column("event_id"),
            "user_id": g.column("user_id"),
            "ts": g.column("ts"),
            "moving_avg": round_sql(pa.array(avg, pa.float64()), 4),
        })

    return ds.groupby("user_id").map_groups(mov, batch_format="pyarrow")


def q_events_hot_users(sf_dir: str) -> Dataset:
    """Hot-key detection (the skew-handling primitive salted_partition
    builds on) as an oracle-checked query: users holding ≥ 0.8 % of all
    events, found with per-batch partial counts — only the (by
    definition ≤ 1/frac) hot keys ever reach the driver.  The CMS
    sketch (stages/sketches.CountMinSketch) is the fixed-memory scale
    path for the same question; its error bound is pytest-pinned."""
    from ..stages.partition import detect_hot_keys

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id"])
    hot = detect_hot_keys(ds, "user_id", threshold_frac=0.008)
    return rd.from_arrow(pa.table({
        "user_id": pa.array(sorted(hot), pa.int64())}))


def q_events_value_variance(sf_dir: str) -> Dataset:
    """Grouped population variance/stddev with EXACT integer moments:
    values convert to cents, the shuffle moves per-batch (n, Σc, Σc²)
    int64 partials, and variance = (n·Σc² − (Σc)²) / n² / 10⁴ — only
    the final divisions are float, written identically in the DuckDB
    twin so the driver hash matches bit-exact (a naive float
    sum-of-squares or DuckDB's own VAR_POP would differ in the last
    ulp)."""
    import numpy as np

    from ray.data.aggregate import Sum

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = scaled_int_sql(b.column("value"), 100.0)
        t = pa.table({"event_type": b.column("event_type"),
                      "c": pa.array(cents, pa.int64()),
                      "c2": pa.array(cents * cents, pa.int64())})
        g = t.group_by("event_type").aggregate(
            [("c", "count"), ("c", "sum"), ("c2", "sum")])
        return g.rename_columns(["event_type", "p_n", "p_s", "p_s2"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("p_n", alias_name="n_events"),
            Sum("p_s", alias_name="s"),
            Sum("p_s2", alias_name="s2"))

    def finish(b: pa.Table) -> pa.Table:
        import numpy as np

        n = b.column("n_events").to_numpy(zero_copy_only=False)
        s = b.column("s").to_numpy(zero_copy_only=False)
        s2 = b.column("s2").to_numpy(zero_copy_only=False)
        var = (n * s2 - s * s) * 1.0 / (n * n) / 10000.0
        return pa.table({
            "event_type": b.column("event_type"),
            "n_events": pc.cast(b.column("n_events"), pa.int64()),
            "var_value": round_sql(pa.array(var, pa.float64()), 6),
            "std_value": round_sql(pa.array(np.sqrt(var), pa.float64()), 6),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_events_top_values(sf_dir: str) -> Dataset:
    """Global top-k WITHOUT a global sort: per-batch vectorized top-100
    partials (argpartition), then one tiny final combine — the scale
    shape for 'ORDER BY x LIMIT k' over 100 TB (only k rows per block
    ever move).  Deterministic tie-break (value DESC, event_id ASC)
    matches the oracle's ORDER BY."""
    import numpy as np

    K = 100
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "value"])

    def local_topk(b: pa.Table) -> pa.Table:
        v = b.column("value").combine_chunks() \
             .to_numpy(zero_copy_only=False)
        eid = b.column("event_id").combine_chunks() \
               .to_numpy(zero_copy_only=False)
        n = len(v)
        if n > K:
            # threshold-INCLUSIVE pre-prune: keep every row tied with the
            # K-th value so boundary ties resolve by event_id exactly
            # like the oracle's ORDER BY, then order the candidates
            thresh = np.partition(v, n - K)[n - K]
            idx = np.flatnonzero(v >= thresh)
        else:
            idx = np.arange(n)
        order = np.lexsort((eid[idx], -v[idx]))[:K]
        return b.take(pa.array(idx[order], pa.int64()))

    # final combine: all partials fit one block by construction (k per
    # input block)
    return _topk_combine(ds, local_topk)


# ---------------------------------------------------------------------------
# Round 3 (cont.): JSON extraction, PII-style scrub, dense rank, outer join
# ---------------------------------------------------------------------------

def q_events_props_json(sf_dir: str) -> Dataset:
    """JSON field extraction + rollup: parse the ``props`` JSON string
    column (``{"k": <int>}``) with a vectorized RE2 kernel
    (``pc.extract_regex`` — no per-row json.loads), then aggregate
    count + exact cent-sum per extracted key.  ``k`` is structurally
    bounded (0..99) so the combine takes the tree path; value sums ride
    as int64 cents end-to-end, so no float-order nondeterminism exists
    for the oracle hash.  Scale shape: one vectorized scan, partial agg
    before any exchange."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["props", "value"])

    def partial(b: pa.Table) -> pa.Table:
        ext = pc.extract_regex(b.column("props"), r'"k":\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        cents = pa.array(scaled_int_sql(b.column("value"), 100.0),
                         pa.int64())
        t = pa.table({"k": k, "cents": cents})
        g = t.group_by("k").aggregate([("cents", "sum"), ("cents", "count")])
        return g.rename_columns(["k", "p_cents", "p_n"])

    return _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["k"], [("p_cents", "sum"), ("p_n", "sum")],
        ["k", "p_cents", "p_n"],
        ["k", "sum_cents", "n_events"])


# PII-style scrub rules, applied in order: (RE2 pattern, replacement).
# Single-sourced — the SAME strings drive pc.replace_substring_regex in
# q_transcripts_scrub, the DuckDB regexp_replace oracle twin
# (__ray_entry__ builds its SQL from this list), and the unit tests, so
# the three cannot drift apart.
SCRUB_RULES = [
    (r"INV-\d+", "<ID>"),
    (r"\$?\d[\d,]*\.\d{2}", "<AMT>"),
]


def q_transcripts_scrub(sf_dir: str) -> Dataset:
    """PII-style scrubbing (the redaction stage of a training-data
    pipeline): mask invoice identifiers and money amounts in raw
    transcript text with typed placeholders.  Both rewrites are RE2
    kernels (``pc.replace_substring_regex``) — the same regex engine
    DuckDB uses — so the oracle twin is char-exact by construction.
    One streaming map_batches, no state, no shuffle."""
    from .flagship import read_transcripts

    ds = read_transcripts(transcript_paths(sf_dir)) \
        .select_columns(["conv_id", "turn_idx", "text"])

    def scrub(b: pa.Table) -> pa.Table:
        t = b.column("text").combine_chunks()
        for pat, rep in SCRUB_RULES:
            t = pc.replace_substring_regex(t, pat, rep)
        return pa.table({
            "conv_id": b.column("conv_id"),
            "turn_idx": b.column("turn_idx"),
            "scrubbed": t,
        })

    return ds.map_batches(scrub, batch_format="pyarrow")


def q_events_dense_rank(sf_dir: str) -> Dataset:
    """DENSE_RANK window: rank events by value (desc) within event
    type, gaps-free.  Per-type map_groups with a vectorized unique +
    searchsorted — ranking needs every value of a key co-located, the
    same partitioning contract as NTILE/LAG above; 5 event types at
    this corpus, hash-partitioned keys at scale."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def rank(g: pa.Table) -> pa.Table:
        v = g.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        uniq = np.unique(v)  # ascending
        # dense rank desc = (#distinct) - (index in ascending uniques)
        rnk = len(uniq) - np.searchsorted(uniq, v)
        return g.append_column("rnk", pa.array(rnk, pa.int64()))

    return ds.groupby("event_type").map_groups(rank, batch_format="pyarrow")


def q_customer_orders_left_join(sf_dir: str) -> Dataset:
    """LEFT OUTER join via ``Dataset.join``: every customer row
    survives; customers with no orders carry NULL order columns (the
    anti-join's complement — together with inner/anti this completes
    the join-type surface).  Both sides column-pruned at the read; the
    join hash-partitions on the key."""
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"])
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_totalprice"])
    joined = cust.join(orders, join_type="left_outer", num_partitions=16,
                       on=("c_custkey",), right_on=("o_custkey",))
    return joined.select_columns(["c_custkey", "c_mktsegment",
                                  "o_orderkey", "o_totalprice"])


def q_documents_chunk_windows(sf_dir: str) -> Dataset:
    """Training-data chunking: split each document into 32-token
    windows with stride 24 (8-token overlap), 1→N via a vectorized
    gather (stages/terms.chunk_windows) — no shuffle, no per-row
    Python; the shape that feeds a tokenizer at 100 TB."""
    from ..stages.terms import chunk_batch

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(lambda b: chunk_batch(b, window=32, stride=24),
                          batch_format="pyarrow")


def q_documents_term_df(sf_dir: str) -> Dataset:
    """TF-IDF statistics + vocabulary build: term frequency, document
    frequency, 6-decimal ROUND of ln(N/df) idf, and a rank-assigned vocabulary
    id for the top 100 terms by (df DESC, term ASC).  Partial (term,
    tf, df) aggregates per batch → one shuffled groupby over terms →
    per-block top-k prune → single-block rank assignment (the ranked
    head is structurally tiny; unbounded vocabularies keep the same
    plan, only k changes).  N comes from Parquet metadata (no extra
    scan).  ln() differs from numpy's log in the last ulp on some
    inputs; round-6 masks it (validated corpus-wide at sf0.01 and
    sf0.1 — same caveat class as the date twin)."""
    import numpy as np

    from ..stages.terms import term_partials

    K = 100
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    n_docs = rd.read_parquet(_t(sf_dir, "documents"),
                             columns=["doc_id"]).count()

    agg = ds.map_batches(term_partials, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("p_tf", alias_name="tf"),
                                   Sum("p_df", alias_name="df"))

    topk = sorted_topk([("df", "descending"), ("term", "ascending")], K)

    def finish(b: pa.Table) -> pa.Table:
        b = topk(b)
        df = b.column("df").to_numpy(zero_copy_only=False)
        idf = round_sql(pa.array(np.log(n_docs / df), pa.float64()), 6)
        return pa.table({
            "term": b.column("term"),
            "df": pc.cast(b.column("df"), pa.int64()),
            "tf": pc.cast(b.column("tf"), pa.int64()),
            "idf": idf,
            "term_id": pa.array(np.arange(1, b.num_rows + 1), pa.int64()),
        })

    return _topk_combine(agg, topk, final=finish)


def q_documents_top_bigrams(sf_dir: str) -> Dataset:
    """n-gram language-model counting: top-50 adjacent-token bigrams
    by corpus count (count DESC, bigram ASC).  Per-batch bigram
    partials (doc-boundary-safe, C-level string joins) → shuffled
    groupby sum → per-block top-k → tiny final combine; token payloads
    never cross the exchange."""
    from ..stages.terms import bigram_partials

    K = 50
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    agg = ds.map_batches(bigram_partials, batch_format="pyarrow") \
        .groupby("bigram").aggregate(Sum("p_n", alias_name="n"))

    def topk(b: pa.Table) -> pa.Table:
        b = b.sort_by([("n", "descending"), ("bigram", "ascending")]) \
             .slice(0, K)
        return pa.table({"bigram": b.column("bigram"),
                         "n": pc.cast(b.column("n"), pa.int64())})

    return _topk_combine(agg, topk)


def q_documents_repetition(sf_dir: str) -> Dataset:
    """Gopher-style repetition quality gate per document: distinct-token
    ratio + top-bigram fraction + keep flag (thresholds 0.5 / 0.05).
    One vectorized map_batches, no shuffle (stages/terms)."""
    from ..stages.terms import repetition_batch

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(
        lambda b: repetition_batch(b, min_distinct_ratio=0.5,
                                   max_top_bigram_frac=0.05),
        batch_format="pyarrow")


def q_embeddings_label_centroids(sf_dir: str) -> Dataset:
    """Per-label embedding centroids (the vector aggregate behind
    semantic dedup / cluster labeling): mean of each of the 64 dims per
    label.  Sums ride as int64 quantized values — ROUND of v·2^30, exact
    for float32 inputs and overflow-safe to ~2^33 vectors per cell — so
    the result is independent of float summation order and the DuckDB
    twin hashes bit-exact (same trick as the cent-valued event sums).
    Partials per batch (numpy reduceat per label), tree combine over the
    structurally bounded (label, dim) grid, one division at the end."""
    import numpy as np

    DIM, SCALE = 64, float(1 << 30)
    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        lab = b.column("label").combine_chunks() \
               .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(b.column("embedding").combine_chunks()) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        c = scaled_int_sql(flat, SCALE).reshape(len(lab), DIM)
        order = np.argsort(lab, kind="stable")
        labs, starts = np.unique(lab[order], return_index=True)
        sums = np.add.reduceat(c[order], starts, axis=0)
        counts = np.diff(np.concatenate([starts, [len(lab)]]))
        return pa.table({
            "label": pa.array(np.repeat(labs, DIM), pa.int64()),
            "dim": pa.array(np.tile(np.arange(1, DIM + 1), len(labs)),
                            pa.int64()),
            "p_s": pa.array(sums.ravel(), pa.int64()),
            "p_n": pa.array(np.repeat(counts, DIM), pa.int64()),
        })

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"], [("p_s", "sum"), ("p_n", "sum")],
        ["label", "dim", "p_s", "p_n"],
        ["label", "dim", "s", "n"])

    def finish(b: pa.Table) -> pa.Table:
        import numpy as np
        s = b.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "label": b.column("label"),
            "dim": b.column("dim"),
            "centroid": round_sql(pa.array(s / n / SCALE, pa.float64()), 6),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_documents_pack_bins(sf_dir: str) -> Dataset:
    """Sequence-packing shard assignment (training-data prep): within
    each source shard, documents in doc_id order are packed into
    4096-token bins by exclusive-prefix-sum // budget — the
    deterministic sharding that feeds fixed-budget sequence builders.
    Per-source groupby + vectorized cumsum (the running-total shape);
    at 10^12 docs the per-source groups are the partitioning unit and
    nothing but (doc_id, n_tokens) rows move."""
    import numpy as np

    BUDGET = 4096
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "source", "text"])

    def tokens(b: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(b.column("text"), " ")).cast(pa.int64())
        return pa.table({"doc_id": b.column("doc_id"),
                         "source": b.column("source"),
                         "n_tokens": n})

    def pack(g: pa.Table) -> pa.Table:
        g = g.sort_by([("doc_id", "ascending")])
        n = g.column("n_tokens").to_numpy(zero_copy_only=False)
        excl = np.concatenate([[0], np.cumsum(n)[:-1]])
        return g.append_column(
            "bin_idx", pa.array(excl // BUDGET, pa.int64()))

    return ds.map_batches(tokens, batch_format="pyarrow") \
        .groupby("source").map_groups(pack, batch_format="pyarrow")


def q_documents_posting_lists(sf_dir: str) -> Dataset:
    """Inverted-index build (search/dedup infrastructure): per term,
    document frequency + the sorted posting list (comma-joined doc ids
    — a string so the driver's hash compare is well-defined).  Partial
    per-batch (term, doc_id) dedup, then per-term assembly; the
    partitioning assumption is the usual posting-list one (a term's
    postings are co-located and fit a task — at web scale hot terms
    would be length-capped or delta-block-encoded)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def pairs(b: pa.Table) -> pa.Table:
        import numpy as np

        from ..stages.terms import _tokens
        _, lens, flat, _ = _tokens(b)
        d = b.column("doc_id").combine_chunks() \
             .take(pa.array(np.repeat(np.arange(len(lens)), lens),
                            pa.int64()))
        t = pa.table({"term": flat, "doc_id": d})
        return t.group_by(["term", "doc_id"]).aggregate([]).select(
            ["term", "doc_id"])

    def assemble(g: pa.Table) -> pa.Table:
        g = g.sort_by([("doc_id", "ascending")])
        ids = pc.cast(g.column("doc_id"), pa.string())
        return pa.table({
            "term": g.column("term").slice(0, 1),
            "df": pa.array([g.num_rows], pa.int64()),
            "postings": pa.array(
                [",".join(ids.to_pylist())], pa.string()),
        })

    # (term, doc_id) pairs are globally unique after the per-batch
    # dedup: a document's row lives in exactly one batch, so no pair
    # can recur across batches — assemble needs no second dedup
    return ds.map_batches(pairs, batch_format="pyarrow") \
        .groupby("term").map_groups(assemble, batch_format="pyarrow")


def q_events_value_histogram(sf_dir: str) -> Dataset:
    """Fixed-width histogram over event values (10-unit bins on exact
    cents — profiling primitive): one partial groupby per batch, tree
    combine over the bounded bin grid."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = pa.array(scaled_int_sql(b.column("value"), 100.0),
                         pa.int64())
        bins = pc.divide(cents, pa.scalar(1000, pa.int64()))
        g = pa.table({"bin": bins}).group_by("bin") \
            .aggregate([("bin", "count")])
        return g.rename_columns(["bin", "p_n"])

    return _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["bin"], [("p_n", "sum")], ["bin", "p_n"], ["bin", "n_events"])


def q_documents_source_mixture(sf_dir: str) -> Dataset:
    """Domain-mixture prep (the DoReMi-style reweighting input): per
    source shard, doc/token counts, the shard's token share, and the
    resampling weight that would flatten the mixture to uniform.
    Partial counts per batch → tree combine over the bounded source
    set → one single-block finish that sees every source (totals and
    share are global by definition — the final table is one row per
    source and structurally tiny)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(b.column("text"), " ")).cast(pa.int64())
        t = pa.table({"source": b.column("source"), "n": n})
        g = t.group_by("source").aggregate([("n", "sum"), ("n", "count")])
        return g.rename_columns(["source", "p_tok", "p_doc"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"], [("p_tok", "sum"), ("p_doc", "sum")],
        ["source", "p_tok", "p_doc"],
        ["source", "n_tokens", "n_docs"])

    def finish(b: pa.Table) -> pa.Table:
        tok = b.column("n_tokens").to_numpy(zero_copy_only=False) \
               .astype(np.float64)
        share = tok / tok.sum()
        weight = (1.0 / b.num_rows) / share
        return pa.table({
            "source": b.column("source"),
            "n_docs": pc.cast(b.column("n_docs"), pa.int64()),
            "n_tokens": pc.cast(b.column("n_tokens"), pa.int64()),
            "token_share": pa.array(share, pa.float64()),
            "weight_uniform": pa.array(weight, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=None)


def q_documents_balance_classes(sf_dir: str) -> Dataset:
    """Class balancing: cap every language at 30 documents via the
    shared deterministic reservoir (smallest seeded md5 row-hash wins —
    stages/partition.reservoir_per_key), so the kept set is a pure
    function of row identity: stable across reruns, partitionings and
    cluster sizes, and exactly replayable in SQL."""
    from ..stages.partition import reservoir_per_key

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "lang", "n_chars"])
    return reservoir_per_key(ds, "lang", 30, ["doc_id"], seed=42)


def q_events_full_outer_days(sf_dir: str) -> Dataset:
    """FULL OUTER join via ``Dataset.join``: per-(user, day) purchase
    counts vs error counts — days with only one activity kind survive
    with NULLs on the other side (completes the join-type surface:
    inner / left / anti / semi / as-of / range / full).  Both inputs
    are pre-aggregated partials, so the join moves one row per
    (user, day, type) — never raw events."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_type"])

    def day_counts(etype: str, ucol: str, dcol: str, ncol: str):
        def partial(b: pa.Table) -> pa.Table:
            mask = pc.equal(b.column("event_type"), pa.scalar(etype))
            t = b.filter(mask)
            day = pc.floor_temporal(t.column("ts"), unit="day")
            g = pa.table({ucol: t.column("user_id"), dcol: day}) \
                .group_by([ucol, dcol]).aggregate([(ucol, "count")])
            return g.rename_columns([ucol, dcol, "p_n"])

        # hash-aggregate empty partitions emit schema-less blocks that
        # Dataset.join cannot key on — pin the schema before joining
        return with_schema(
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby([ucol, dcol]).aggregate(Sum("p_n", alias_name=ncol)),
            pa.schema([(ucol, pa.int64()), (dcol, pa.timestamp("us")),
                       (ncol, pa.int64())]))

    left = day_counts("purchase", "user_id", "day", "n_purchases")
    right = day_counts("error", "user_id_r", "day_r", "n_errors")
    joined = left.join(right, join_type="full_outer", num_partitions=16,
                       on=("user_id", "day"), right_on=("user_id_r", "day_r"))

    def widen(b: pa.Table) -> pa.Table:
        # count columns may arrive narrower from the aggregate
        for c in ("n_purchases", "n_errors"):
            b = b.set_column(b.schema.get_field_index(c), c,
                             pc.cast(b.column(c), pa.int64()))
        return b

    return joined.map_batches(widen, batch_format="pyarrow")


def q_documents_training_prep(sf_dir: str) -> Dataset:
    """END-TO-END training-data prep, composed and streaming: quality
    gate (≥5 tokens, stopword ratio ≥0.02) ∧ repetition gate (distinct
    ratio ≥0.45, top-bigram fraction ≤0.08) → exact dedup (keep lowest
    doc_id per identical text) → 32/24 windowed chunking.  One
    tokenizing filter pass, one payload groupby (the survivors), one
    vectorized 1→N chunker — the whole prep a 100 TB corpus runs before
    tokenization, under a single CTE-chained DuckDB oracle."""
    from ..stages.terms import chunk_batch, training_prep_filter

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    kept = ds.map_batches(
        lambda b: training_prep_filter(
            b, min_tokens=5, min_stopword_ratio=0.02,
            min_distinct_ratio=0.45, max_top_bigram_frac=0.08),
        batch_format="pyarrow")
    ded = kept.groupby("text").aggregate(Min("doc_id", alias_name="doc_id"))
    return ded.map_batches(lambda b: chunk_batch(b, window=32, stride=24),
                           batch_format="pyarrow")


def q_events_funnel(sf_dir: str) -> pa.Table:
    """Staged conversion funnel (view → click after first view →
    purchase after first qualifying click), the classic event-analytics
    sequence operator — implemented JOIN-FREE: one co-partitioned
    shuffle (``groupby(user).map_groups``, the sessionize/rank family's
    co-location contract) walks each user's type-filtered, ts-sorted
    history with numpy masks and emits a single stage-reached number;
    the 3-row stage/count table then folds out of a bounded-key tree
    combine.  Compared to the join formulation this moves each event
    once, needs no schema pinning (no ``Dataset.join`` to trip over
    Ray's schema-less empty aggregate blocks), and holds nothing on the
    driver beyond the 4-row stage grid.  Timestamps compare as int64 µs
    (unit-exact strict "after")."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_type", "ts"])
    wanted = pa.array(["view", "click", "purchase"])
    typed = ds.map_batches(
        lambda b: b.filter(pc.is_in(b.column("event_type"),
                                    value_set=wanted)),
        batch_format="pyarrow")

    def stage_of(g: pa.Table) -> pa.Table:
        g = g.sort_by([("ts", "ascending")])
        ts = g.column("ts").combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        et = np.asarray(g.column("event_type").to_pylist())
        stage = 0
        vt = ts[et == "view"]
        if len(vt):
            stage = 1
            ct = ts[(et == "click") & (ts > vt[0])]
            if len(ct):
                stage = 2
                pt = ts[(et == "purchase") & (ts > ct[0])]
                if len(pt):
                    stage = 3
        return pa.table({"stage": pa.array([stage], pa.int64())})

    per_user = typed.groupby("user_id").map_groups(
        stage_of, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("stage").aggregate([("stage", "count")])
        return g.rename_columns(["stage", "p_n"])

    grid = _small_table(_tree_combine(
        per_user.map_batches(partial, batch_format="pyarrow"),
        ["stage"], [("p_n", "sum")], ["stage", "p_n"], ["stage", "n"]))
    counts = {0: 0, 1: 0, 2: 0, 3: 0}
    if grid is not None:
        for r in grid.to_pylist():
            counts[r["stage"]] = r["n"]
    c3 = counts[3]
    c2 = counts[2] + c3
    c1 = counts[1] + c2
    return pa.table({
        "stage": pa.array(["view", "view_click", "view_click_purchase"]),
        "n_users": pa.array([c1, c2, c3], pa.int64()),
    })


def q_events_retention(sf_dir: str) -> Dataset:
    """Cohort retention matrix: cohort = each user's first active day,
    cell (cohort_day, day_offset) = distinct users of that cohort
    active offset days later.  (user, day) pairs are deduped per batch
    before the distinct shuffle, the cohort anchor is a partial-agg
    MIN, and the final count rides on the pairs already being unique —
    no raw event ever crosses the exchange twice."""
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def day_pairs(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day")
        return pa.table({"user_id": b.column("user_id"), "day": day}) \
            .group_by(["user_id", "day"]).aggregate([])

    # both join inputs come from hash aggregates, whose empty partitions
    # emit schema-less zero-row blocks Dataset.join cannot key on —
    # with_schema pins them (see q_events_funnel docstring)
    day_t = pa.timestamp("us")  # floor_temporal preserves the input unit
    pairs = with_schema(
        ds.map_batches(day_pairs, batch_format="pyarrow")
        .groupby(["user_id", "day"]).aggregate(
            Count("day", alias_name="_n"))
        .drop_columns(["_n"]),
        pa.schema([("user_id", pa.int64()), ("day", day_t)]))

    def cohort_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("user_id").aggregate([("day", "min")])
        return g.rename_columns(["user_id", "cohort_day"])

    cohort = with_schema(
        pairs.map_batches(cohort_partial, batch_format="pyarrow")
        .groupby("user_id").aggregate(Min("cohort_day",
                                          alias_name="cohort_day")),
        pa.schema([("user_id", pa.int64()), ("cohort_day", day_t)]))

    j = pairs.join(cohort, join_type="inner", num_partitions=8,
                   on=("user_id",))

    def cell_partial(b: pa.Table) -> pa.Table:
        # days_between, not duration arithmetic: a raw subtract would be
        # unit-dependent (day columns ride as timestamps, not dates)
        off = pc.cast(pc.days_between(b.column("cohort_day"),
                                      b.column("day")), pa.int64())
        t = pa.table({"cohort_day": b.column("cohort_day"),
                      "day_offset": off, "u": b.column("user_id")})
        g = t.group_by(["cohort_day", "day_offset"]).aggregate(
            [("u", "count")])
        return g.rename_columns(["cohort_day", "day_offset", "p_u"])

    return j.map_batches(cell_partial, batch_format="pyarrow") \
        .groupby(["cohort_day", "day_offset"]).aggregate(
            Sum("p_u", alias_name="n_users")) \
        .map_batches(lambda b: b.set_column(
            b.schema.get_field_index("n_users"), "n_users",
            pc.cast(b.column("n_users"), pa.int64())),
            batch_format="pyarrow")


def q_orders_shipping_priority(sf_dir: str) -> Dataset:
    """TPC-H-Q3-shaped 3-table pipeline: BUILDING-segment customers ⋈
    their pre-cutoff orders ⋈ post-cutoff lineitems, exact-cent revenue
    rollup per order, global top-10 by (revenue DESC, o_orderdate ASC,
    o_orderkey ASC).  Aggregate-before-join: lineitem revenue collapses
    to one int64 row per orderkey BEFORE it meets orders (the join
    ships ~10× fewer rows and the post-join re-aggregate disappears —
    19.4 s → 16 s at sf0.1/32cpu; the residual cost is the revenue
    aggregate itself, serialized by the schema-pin materialization),
    revenue sums are 1e4-quantized
    (extendedprice 2 dp × discount 2 dp is exact at 4 dp), and the
    top-10 is the per-block-partials shape — no global sort."""
    CUT = pa.scalar(1997, pa.int64())
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_mktsegment"])
    bld = cust.map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), "BUILDING"))
        .select(["c_custkey"]),
        batch_format="pyarrow")
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"])
    pre = orders.map_batches(
        lambda b: b.filter(pc.less(pc.year(b.column("o_orderdate")),
                                   CUT)),
        batch_format="pyarrow")
    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_shipdate",
                                    "l_extendedprice", "l_discount"])

    def rev_partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.greater_equal(pc.year(b.column("l_shipdate")),
                                      CUT))
        rev = scaled_int_sql(
            pc.multiply(f.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    f.column("l_discount"))), 10000.0)
        g = pa.table({"l_orderkey": f.column("l_orderkey"),
                      "r": pa.array(rev, pa.int64())}) \
            .group_by("l_orderkey").aggregate([("r", "sum")])
        return g.rename_columns(["l_orderkey", "p_r"])

    rev = with_schema(
        line.map_batches(rev_partial, batch_format="pyarrow")
        .groupby("l_orderkey").aggregate(Sum("p_r", alias_name="r")),
        pa.schema([("l_orderkey", pa.int64()), ("r", pa.int64())]))

    co = pre.join(bld, join_type="inner", num_partitions=8,
                  on=("o_custkey",), right_on=("c_custkey",))
    col = co.join(rev, join_type="inner", num_partitions=8,
                  on=("o_orderkey",), right_on=("l_orderkey",))

    top = _topk_combine(col, sorted_topk(
        [("r", "descending"), ("o_orderdate", "ascending"),
         ("o_orderkey", "ascending")], 10))
    return top.map_batches(
        lambda b: pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_orderdate": b.column("o_orderdate"),
            "revenue": round_sql(pc.divide(
                pc.cast(b.column("r"), pa.float64()),
                pa.scalar(10000.0)), 2),
        }),
        batch_format="pyarrow")


def _presence_flag_setop(sf_dir: str, type_a: str, type_b: str,
                         want_b: int) -> Dataset:
    """Shared shape for (user, day)-grain set ops over two event types:
    per-batch max of two presence indicators per key, ONE global
    max-reduce, then a filter — ``want_b=0`` is EXCEPT (a-days with no
    b), ``want_b=1`` is INTERSECT (days with both).  No
    distinct-then-anti-join double exchange."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_type"])

    def flags(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day")
        a = pc.cast(pc.equal(b.column("event_type"), type_a), pa.int64())
        bb = pc.cast(pc.equal(b.column("event_type"), type_b),
                     pa.int64())
        t = pa.table({"user_id": b.column("user_id"), "day": day,
                      "a": a, "b": bb})
        g = t.group_by(["user_id", "day"]).aggregate(
            [("a", "max"), ("b", "max")])
        return g.rename_columns(["user_id", "day", "p_a", "p_b"])

    agg = ds.map_batches(flags, batch_format="pyarrow") \
        .groupby(["user_id", "day"]).aggregate(
            Max("p_a", alias_name="a"), Max("p_b", alias_name="b"))
    return agg.map_batches(
        lambda t: t.filter(pc.and_(pc.equal(t.column("a"), 1),
                                   pc.equal(t.column("b"), want_b)))
        .select(["user_id", "day"]),
        batch_format="pyarrow")


def q_events_except_days(sf_dir: str) -> Dataset:
    """Set difference (EXCEPT) at the (user, day) grain: days on which
    a user purchased but had no error (:func:`_presence_flag_setop`)."""
    return _presence_flag_setop(sf_dir, "purchase", "error", want_b=0)


def q_lineitem_corr(sf_dir: str) -> Dataset:
    """Grouped Pearson correlation (quantity vs extendedprice per
    returnflag) from EXACT integer moments: the shuffle moves per-batch
    (n, Σx, Σy, Σx², Σy², Σxy) int64 partials and only the final
    r-expression is float, written token-identically in the DuckDB twin
    (DuckDB's own corr() would differ in the last ulp).  y is quantized
    to whole dollars — keeping Σy² under int64 to ~2e9 rows/group
    (cents would overflow at ~7e5 rows/group on this price range);
    finer quantization is the same code with a different scale."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_quantity",
                                  "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        x = scaled_int_sql(b.column("l_quantity"), 1.0)
        y = scaled_int_sql(b.column("l_extendedprice"), 1.0)
        t = pa.table({"l_returnflag": b.column("l_returnflag"),
                      "x": pa.array(x, pa.int64()),
                      "y": pa.array(y, pa.int64()),
                      "xx": pa.array(x * x, pa.int64()),
                      "yy": pa.array(y * y, pa.int64()),
                      "xy": pa.array(x * y, pa.int64())})
        g = t.group_by("l_returnflag").aggregate(
            [("x", "count"), ("x", "sum"), ("y", "sum"),
             ("xx", "sum"), ("yy", "sum"), ("xy", "sum")])
        return g.rename_columns(["l_returnflag", "p_n", "p_x", "p_y",
                                 "p_xx", "p_yy", "p_xy"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("l_returnflag").aggregate(
            Sum("p_n", alias_name="n_items"),
            Sum("p_x", alias_name="sx"), Sum("p_y", alias_name="sy"),
            Sum("p_xx", alias_name="sxx"), Sum("p_yy", alias_name="syy"),
            Sum("p_xy", alias_name="sxy"))

    def finish(b: pa.Table) -> pa.Table:
        import numpy as np

        n = b.column("n_items").to_numpy(zero_copy_only=False) * 1.0
        sx = b.column("sx").to_numpy(zero_copy_only=False) * 1.0
        sy = b.column("sy").to_numpy(zero_copy_only=False) * 1.0
        sxx = b.column("sxx").to_numpy(zero_copy_only=False) * 1.0
        syy = b.column("syy").to_numpy(zero_copy_only=False) * 1.0
        sxy = b.column("sxy").to_numpy(zero_copy_only=False) * 1.0
        denom = (np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy))
        with np.errstate(divide="ignore", invalid="ignore"):
            r = (n * sxy - sx * sy) / denom
        # constant-valued group → denom 0 → NULL, matching DuckDB's
        # division-by-zero (its x/0.0 is NULL, not inf/NaN)
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "n_items": pc.cast(b.column("n_items"), pa.int64()),
            "corr_qty_price": round_sql(
                pa.array(r, pa.float64(), mask=(denom == 0.0)), 6),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def _windowed_counts(sf_dir: str, width_us: int, lateness_us: int,
                     slide_us: "int | None" = None) -> pa.Table:
    """Shared driver for the streaming count-window queries: one
    ingestion run through fresh shards, flush, assemble, kill."""
    from ..stages.window import (emitted_table, flush, ingest_run,
                                 make_window_index)

    shards = make_window_index(4)
    try:
        ds = rd.read_parquet(_t(sf_dir, "events"),
                             columns=["ts", "event_type"])
        parts = ingest_run(ds, shards, width_us,
                           lateness_us=lateness_us, slide_us=slide_us)
        tail = flush(shards)
        return pa.concat_tables([emitted_table(parts),
                                 emitted_table(tail)])
    finally:
        for s in shards:
            ray.kill(s)


def q_events_hopping_2day(sf_dir: str) -> pa.Table:
    """Hopping (sliding) event-time windows: 2-day width, 1-day slide —
    each event counts in the two windows covering it
    (stages/window.py with ``slide_us < width_us``; assignment fans
    out, seal/lateness/state machinery unchanged).  End-of-stream
    equals the per-event window fan-out GROUP BY the DuckDB twin
    replays with generate_series."""
    DAY = 86_400_000_000
    return _windowed_counts(sf_dir, 2 * DAY, lateness_us=2 * DAY,
                            slide_us=DAY)


def q_events_intersect_days(sf_dir: str) -> Dataset:
    """Set intersection (INTERSECT) at the (user, day) grain: days on
    which a user both viewed and purchased
    (:func:`_presence_flag_setop`)."""
    return _presence_flag_setop(sf_dir, "view", "purchase", want_b=1)


def q_events_unpivot_counts(sf_dir: str) -> Dataset:
    """UNPIVOT / melt: the per-user pivoted type counts fanned back to
    long (user_id, event_type, n) form — the inverse reshape of
    :func:`q_events_pivot_types`, zeros preserved.  The melt is a pure
    column re-labeling (5 zero-copy column selections concatenated per
    batch), so the only exchange is the pivot's own."""
    piv = q_events_pivot_types(sf_dir)

    def melt(b: pa.Table) -> pa.Table:
        parts = [pa.table({
            "user_id": b.column("user_id"),
            "event_type": pa.array([t] * b.num_rows, pa.string()),
            "n": pc.cast(b.column(f"n_{t}"), pa.int64()),
        }) for t in _EVENT_TYPES]
        return pa.concat_tables(parts)

    return piv.map_batches(melt, batch_format="pyarrow")


def q_events_user_entropy(sf_dir: str) -> Dataset:
    """Per-user Shannon entropy of the event-type distribution (the
    distributional skew signal a mixture-balancing stage thresholds
    on).  H = ln(n) − (Σ c·ln c)/n computed from EXACT integer
    partials: per-(user, type) counts shuffle once, c·ln c is quantized
    to int64 at 1e6 (order-independent sums; same ulp-validated
    ln-quantization shape as documents_term_df's idf), and only the
    final per-user expression is float, written token-identically in
    the DuckDB twin."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["user_id", "event_type"]).aggregate(
            [("event_type", "count")])
        return g.rename_columns(["user_id", "event_type", "p_n"])

    per_type = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["user_id", "event_type"]).aggregate(
            Sum("p_n", alias_name="n"))

    def qpart(b: pa.Table) -> pa.Table:
        c = b.column("n").to_numpy(zero_copy_only=False)
        cf = c.astype(np.float64)
        q = scaled_int_sql(cf * np.log(cf), 1e6)
        t = pa.table({"user_id": b.column("user_id"),
                      "c": pc.cast(b.column("n"), pa.int64()),
                      "q": pa.array(q, pa.int64())})
        g = t.group_by("user_id").aggregate([("c", "sum"), ("q", "sum")])
        return g.rename_columns(["user_id", "p_c", "p_q"])

    agg = per_type.map_batches(qpart, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Sum("p_c", alias_name="n_events"),
                                      Sum("p_q", alias_name="sq"))

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_events").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sq = b.column("sq").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        h = np.log(n) - (sq / 1e6) / n
        return pa.table({
            "user_id": b.column("user_id"),
            "n_events": pc.cast(b.column("n_events"), pa.int64()),
            "entropy": round_sql(pa.array(h, pa.float64()), 6),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def _ed_is_one(a: str, b: str) -> bool:
    """Exact edit-distance == 1 check in O(len): equal lengths need
    exactly one substitution; lengths off by one need a single aligned
    deletion.  No DP — the threshold makes the two-pointer walk exact."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) == 1
    if abs(la - lb) != 1:
        return False
    s, l = (a, b) if la < lb else (b, a)
    i = 0
    while i < len(s) and s[i] == l[i]:
        i += 1
    return s[i:] == l[i + 1:]


def q_customers_fuzzy_name_pairs(sf_dir: str) -> Dataset:
    """String-similarity (fuzzy) self-join: customer-name pairs at edit
    distance EXACTLY 1, via symmetric-delete (SymSpell) blocking — two
    strings are within distance 1 only if they share a key in
    {s} ∪ single-deletions(s), so the index self-join finds every true
    pair without an O(n²) cross join.  Variant generation is fully
    vectorized (one utf8_slice + binary_join pass per character
    position, not per row), and verification is a C-level Hamming pass
    for the equal-length case with an O(len) two-pointer walk for the
    rare length-off-by-one tail.

    NO pair-dedup shuffle: once each name's variant LIST is
    string-deduped, a true distance-1 pair shares exactly ONE variant
    string — equal-length pairs share only the deletion at their single
    differing position (any other deletion leaves the difference in
    both strings), and length±1 pairs share only the shorter string
    itself (identity keys and deletion keys differ in length otherwise)
    — so every verified pair is emitted by exactly one join bucket.
    Distance-2 collisions may appear in several buckets, but the verify
    drops them locally.  This removed the 1.4M-row string-pair groupby
    that dominated the first version (24 s of a 42 s sf0.1 run).

    Scale shape: the index is ≤(L+1)× the distinct-name set, the
    self-join is key-partitioned, and nothing is broadcast or held on
    the driver.  Positions are codepoints, matching DuckDB's
    levenshtein on ASCII (documented limitation for multi-byte)."""
    ds = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_name"])

    # distinct names first: duplicate names would inflate every bucket
    # quadratically; the aggregate also bounds the index build input
    uniq = ds.map_batches(
        lambda b: b.group_by("c_name").aggregate([]),
        batch_format="pyarrow") \
        .groupby("c_name").aggregate(Count("c_name", alias_name="_n")) \
        .drop_columns(["_n"])

    def variants(b: pa.Table) -> pa.Table:
        names = b.column("c_name").combine_chunks()
        ln = pc.utf8_length(names)
        maxlen = pc.max(ln).as_py() or 0
        outs = [pa.table({"v": names, "name": names})]
        for i in range(maxlen):
            f = names.filter(pc.greater(ln, i))
            v = pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(f, 0, i),
                pc.utf8_slice_codeunits(f, i + 1, 2 ** 31 - 1), "")
            outs.append(pa.table({"v": v, "name": f}))
        # per-name variant dedupe: repeated characters repeat deletion
        # strings, and the one-bucket-per-true-pair property (docstring)
        # only holds string-wise
        return pa.concat_tables(outs).group_by(["v", "name"]).aggregate([])

    idx_schema = pa.schema([("v", pa.string()), ("name", pa.string())])
    inv = with_schema(uniq.map_batches(variants, batch_format="pyarrow"),
                      idx_schema)
    # no second pin: with_schema already dropped every empty block from
    # inv, so the rename sees (and emits) only typed blocks — a second
    # pin would materialize the largest intermediate twice
    inv_b = inv.map_batches(
        lambda b: b.rename_columns(["v", "name_b"]),
        batch_format="pyarrow")

    def verify(b: pa.Table) -> pa.Table:
        import numpy as np

        f = b.filter(pc.less(b.column("name"), b.column("name_b")))
        a_col = f.column("name").combine_chunks()
        b_col = f.column("name_b").combine_chunks()
        la = pc.binary_length(a_col).to_numpy(zero_copy_only=False)
        lb = pc.binary_length(b_col).to_numpy(zero_copy_only=False)
        keep = np.zeros(f.num_rows, dtype=bool)

        def byte_matrix(col, idx, n):
            sub = col.take(pa.array(idx))  # packed: data buffer is the
            data = np.frombuffer(sub.buffers()[2], np.uint8)  # concat
            return data[:len(idx) * n].reshape(-1, n)

        eq = la == lb
        for n in np.unique(la[eq]):
            m = eq & (la == n)
            if n == 0 or not m.any():
                continue
            idx = np.flatnonzero(m)
            am = byte_matrix(a_col, idx, n)
            bm = byte_matrix(b_col, idx, n)
            keep[idx] = (am != bm).sum(axis=1) == 1
        for i in np.flatnonzero(np.abs(la - lb) == 1):
            keep[i] = _ed_is_one(a_col[i].as_py(), b_col[i].as_py())
        return pa.table({
            "name_a": a_col.filter(pa.array(keep)),
            "name_b": b_col.filter(pa.array(keep)),
        })

    return inv.join(inv_b, join_type="inner", num_partitions=8,
                    on=("v",)) \
        .map_batches(verify, batch_format="pyarrow")


def q_events_daily_gapfill(sf_dir: str) -> pa.Table:
    """Time-series densification (gap fill): the per-(type, day) count
    series with every missing calendar day zero-filled between the
    observed min and max day.  The raw events collapse through ONE
    partial-agg exchange; the dense grid is built AFTER aggregation,
    where cardinality is (types × calendar days) — bounded by the
    calendar, not the data, so the driver-side finish is safe at any
    input scale."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day")
        g = pa.table({"event_type": b.column("event_type"), "day": day}) \
            .group_by(["event_type", "day"]).aggregate(
                [("event_type", "count")])
        return g.rename_columns(["event_type", "day", "p_n"])

    # (type × day) cardinality is calendar-bounded → the tree combine
    # beats the sort-shuffle Aggregate's per-block fixed cost (same
    # rationale as the histogram / Q1 paths; 15.1 s → ~2 s at sf0.1)
    counts = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"], [("p_n", "sum")],
        ["event_type", "day", "p_n"], ["event_type", "day", "n"])
    tab = _small_table(counts)
    if tab is None:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "day": pa.array([], pa.timestamp("us")),
                         "n_events": pa.array([], pa.int64())})

    US_DAY = 86_400_000_000
    # Ray's aggregate may hand the key back as timestamp[s] (sort-based
    # path downcasts temporal keys) — normalize to µs before epoch math
    d = pc.cast(pc.cast(tab.column("day"), pa.timestamp("us")),
                pa.int64()).to_numpy() // US_DAY
    types = sorted(set(tab.column("event_type").to_pylist()))
    days = np.arange(d.min(), d.max() + 1)
    have = {(t, di): n for t, di, n in zip(
        tab.column("event_type").to_pylist(), d,
        tab.column("n").to_pylist())}
    et, dy, nn = [], [], []
    for t in types:
        for di in days:
            et.append(t)
            dy.append(int(di) * US_DAY)
            nn.append(int(have.get((t, int(di)), 0)))
    return pa.table({
        "event_type": pa.array(et, pa.string()),
        "day": pa.array(dy, pa.timestamp("us")),
        "n_events": pa.array(nn, pa.int64()),
    })


def q_documents_winnow_fingerprints(sf_dir: str) -> Dataset:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the MOSS local-similarity sketch): per document, the DISTINCT set
    of window-minima over rolling Karp–Rabin hashes of k=5-byte
    shingles, window w=4.  The whole batch is hashed in ONE numpy pass
    straight off the Arrow string buffers — concatenated bytes →
    sliding-window dot with the base powers → mod M → window-min —
    with windows that cross a document boundary masked out by a single
    doc-index compare; no per-row Python anywhere.  Only (doc_id, fp)
    pairs reach the exchange.  Byte-based positions equal the oracle's
    char-based ``substr``/``ascii`` on ASCII corpora (documented
    limitation for multi-byte text, like the fuzzy join)."""
    import numpy as np

    K, W, B, M = 5, 4, 257, 1_000_000_007
    POW = (B ** np.arange(K - 1, -1, -1, dtype=np.int64))

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def winnow(b: pa.Table) -> pa.Table:
        col = b.column("text").combine_chunks()
        o = col.offset
        offs = np.frombuffer(col.buffers()[1], np.int32)[o:o + len(col) + 1]
        data = np.frombuffer(col.buffers()[2], np.uint8)
        lens = np.diff(offs.astype(np.int64))
        lo, hi = int(offs[0]), int(offs[-1])
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "fp": pa.array([], pa.int64())})
        if hi - lo < K:
            return empty
        chunk = data[lo:hi].astype(np.int64)
        # doc index per byte of the concatenated buffer
        docpos = np.repeat(np.arange(len(col), dtype=np.int64), lens)
        sw = np.lib.stride_tricks.sliding_window_view(chunk, K)
        h = (sw @ POW) % M                      # rolling k-gram hashes
        if len(h) < W:
            return empty
        fp = np.lib.stride_tricks.sliding_window_view(h, W).min(axis=1)
        gs = np.arange(len(fp))
        # a window is in-document iff its first and last shingle byte
        # share the doc (docpos is monotonic, one compare suffices)
        valid = docpos[gs] == docpos[gs + W + K - 2]
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        t = pa.table({
            "doc_id": pa.array(ids[docpos[gs[valid]]], pa.int64()),
            "fp": pa.array(fp[valid], pa.int64()),
        })
        return t.group_by(["doc_id", "fp"]).aggregate([])

    return ds.map_batches(winnow, batch_format="pyarrow") \
        .groupby(["doc_id", "fp"]).aggregate(
            Count("fp", alias_name="_n")) \
        .map_batches(lambda b: b.select(["doc_id", "fp"]),
                     batch_format="pyarrow")


def q_documents_regex_tokens(sf_dir: str) -> Dataset:
    """BPE-ish regex token counting (the GPT-2 pre-tokenizer shape:
    apostrophe-glued words | letter runs | digit runs | punctuation
    runs).  One vectorized RE2 pass per batch
    (``pc.count_substring_regex``); DuckDB's ``regexp_extract_all``
    runs the SAME RE2 pattern, so counts are exact by construction —
    complements the whitespace tokenization in documents_token_stats."""
    PAT = r"'?\p{L}+|\p{N}+|[^\s\p{L}\p{N}]+"
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def count(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pc.cast(
                pc.count_substring_regex(b.column("text"), PAT),
                pa.int64()),
        })

    return ds.map_batches(count, batch_format="pyarrow")


def q_embeddings_kmeans(sf_dir: str, k: int = 8, iters: int = 3) -> Dataset:
    """Distributed k-means (Lloyd): the canonical broadcast-centroid
    iteration.  Init = the k lowest-vec_id embeddings (deterministic,
    found by the per-block top-k combine, no global sort).  Each round:
    centroids go to every task through ONE ``ray.put`` (read per batch,
    never re-shipped), assignment is a numpy matmul argmin, and the
    update reduces int64-quantized per-(cluster, dim) vector sums
    (ROUND(v·2^30) — summation-order-independent, so the run is
    deterministic under any block layout) through the bounded-grid tree
    combine; only the k×dim grid ever reaches the driver.  Empty
    clusters keep their previous centroid.  Output is the final
    (vec_id, cluster) assignment — rows-only (iterative, non-SQL);
    exactness is pinned by a same-init numpy reference test."""
    import numpy as np

    SCALE = float(1 << 30)
    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    seed_tab = _small_table(_topk_combine(
        ds, sorted_topk([("vec_id", "ascending")], k)))
    if seed_tab is None:
        return rd.from_arrow(pa.table({
            "vec_id": pa.array([], pa.int64()),
            "cluster": pa.array([], pa.int64())}))
    dim = len(seed_tab.column("embedding")[0])
    cent = np.array(seed_tab.column("embedding").to_pylist(),
                    dtype=np.float64)

    def batch_mat(b: pa.Table) -> "tuple[np.ndarray, np.ndarray]":
        ids = b.column("vec_id").combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(b.column("embedding").combine_chunks()) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        return ids, flat.reshape(len(ids), dim)

    def assign(mat: np.ndarray, c: np.ndarray) -> np.ndarray:
        # argmin ||x-c||² = argmin (|c|² - 2 x·c); ties → lowest cluster
        return np.argmin((c * c).sum(axis=1)[None, :]
                         - 2.0 * (mat @ c.T), axis=1)

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(b: pa.Table, ref=ref) -> pa.Table:
            c = ray.get(ref)
            ids, mat = batch_mat(b)
            a = assign(mat, c)
            q = scaled_int_sql(mat.ravel(), SCALE).reshape(mat.shape)
            order = np.argsort(a, kind="stable")
            labs, starts = np.unique(a[order], return_index=True)
            sums = np.add.reduceat(q[order], starts, axis=0)
            counts = np.diff(np.concatenate([starts, [len(a)]]))
            return pa.table({
                "cluster": pa.array(np.repeat(labs, dim), pa.int64()),
                "dim": pa.array(np.tile(np.arange(dim), len(labs)),
                                pa.int64()),
                "p_s": pa.array(sums.ravel(), pa.int64()),
                "p_n": pa.array(np.repeat(counts, dim), pa.int64()),
            })

        grid = _small_table(_tree_combine(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["cluster", "dim"], [("p_s", "sum"), ("p_n", "sum")],
            ["cluster", "dim", "p_s", "p_n"],
            ["cluster", "dim", "s", "n"]))
        new = cent.copy()
        cl = grid.column("cluster").to_numpy(zero_copy_only=False)
        dm = grid.column("dim").to_numpy(zero_copy_only=False)
        s = grid.column("s").to_numpy(zero_copy_only=False) / SCALE
        n = grid.column("n").to_numpy(zero_copy_only=False)
        new[cl, dm] = s / n
        cent = new

    ref = ray.put(cent)

    def label(b: pa.Table, ref=ref) -> pa.Table:
        ids, mat = batch_mat(b)
        a = assign(mat, ray.get(ref))
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cluster": pa.array(a, pa.int64())})

    return ds.map_batches(label, batch_format="pyarrow")


def q_events_percent_rank(sf_dir: str) -> Dataset:
    """PERCENT_RANK window: (rank − 1) / (n − 1) over value ascending
    within event type (rank = competition rank, ties share).  Same
    key-co-location contract as DENSE_RANK/NTILE: per-type map_groups,
    one sort + searchsorted per group, the float expression written
    token-identically in the twin (single-row groups are 0.0, DuckDB's
    own convention)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def prank(g: pa.Table) -> pa.Table:
        v = g.column("value").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        sv = np.sort(v)
        rank = np.searchsorted(sv, v, side="left").astype(np.float64)
        pr = rank / (len(v) - 1.0) if len(v) > 1 else np.zeros(len(v))
        return g.append_column(
            "pr", round_sql(pa.array(pr, pa.float64()), 6))

    return ds.groupby("event_type").map_groups(prank,
                                               batch_format="pyarrow")


def q_events_tumbling_daily(sf_dir: str) -> pa.Table:
    """Streaming event-time tumbling windows (stages/window.py) driven
    to end-of-stream: one ingestion run with 1-day windows and 1-day
    allowed lateness, then a flush.  At end-of-stream the incremental
    path must equal the batch GROUP BY exactly — that identity is what
    the DuckDB twin checks — while the mid-stream seal/late-drop
    semantics are pinned by the stage's own unit tests.  Output windows
    ride as int64 epoch-µs starts (timezone-free, twin-exact)."""
    from ..stages.window import (emitted_table, flush, ingest_run,
                                 make_window_index)

    DAY = 86_400_000_000
    shards = make_window_index(4)
    try:
        ds = rd.read_parquet(_t(sf_dir, "events"),
                             columns=["ts", "event_type"])
        parts = ingest_run(ds, shards, DAY, lateness_us=DAY)
        tail = flush(shards)
        return pa.concat_tables([emitted_table(parts),
                                 emitted_table(tail)])
    finally:
        for s in shards:
            ray.kill(s)


def q_events_value_mode(sf_dir: str) -> Dataset:
    """Grouped MODE (most frequent value) per event type, deterministic
    tie-break (highest count, then smallest value).  Scale shape: ONE
    (type, cents) count exchange — the mode itself is a top-1-per-group
    over the bounded per-type distinct-value grid (the dense_rank
    family's co-location contract), never over raw events."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = scaled_int_sql(b.column("value"), 100.0)
        g = pa.table({"event_type": b.column("event_type"),
                      "cents": pa.array(cents, pa.int64())}) \
            .group_by(["event_type", "cents"]).aggregate(
                [("cents", "count")])
        return g.rename_columns(["event_type", "cents", "p_n"])

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "cents"]).aggregate(
            Sum("p_n", alias_name="n"))

    def top1(g: pa.Table) -> pa.Table:
        s = g.sort_by([("n", "descending"), ("cents", "ascending")]) \
            .slice(0, 1)
        return pa.table({
            "event_type": s.column("event_type"),
            "mode_value": round_sql(pc.divide(
                pc.cast(s.column("cents"), pa.float64()),
                pa.scalar(100.0)), 2),
            "n_occurrences": pc.cast(s.column("n"), pa.int64()),
        })

    return counts.groupby("event_type").map_groups(
        top1, batch_format="pyarrow")


def q_region_types_grid(sf_dir: str) -> Dataset:
    """CROSS JOIN (cartesian product), the last join type in the
    matrix: every region × every observed event type.  The small side
    (distinct types) is reduced first and broadcast through ONE
    ``ray.put``; each region batch fans out vectorized (repeat/tile
    takes, no Python rows) — the canonical broadcast-cross shape, sane
    whenever one side is small enough to replicate."""
    import numpy as np

    types_tab = _small_table(
        rd.read_parquet(_t(sf_dir, "events"), columns=["event_type"])
        .map_batches(lambda b: b.group_by("event_type").aggregate([]),
                     batch_format="pyarrow")
        .groupby("event_type").aggregate(
            Count("event_type", alias_name="_n")))
    types = sorted(types_tab.column("event_type").to_pylist()) \
        if types_tab is not None else []
    types_ref = ray.put(types)

    region = rd.read_parquet(_t(sf_dir, "region"),
                             columns=["r_regionkey", "r_name"])

    def cross(b: pa.Table) -> pa.Table:
        ts = ray.get(types_ref)
        k = len(ts)
        if k == 0 or b.num_rows == 0:
            return pa.table({"r_regionkey": pa.array([], pa.int64()),
                             "r_name": pa.array([], pa.string()),
                             "event_type": pa.array([], pa.string())})
        idx = pa.array(np.repeat(np.arange(b.num_rows, dtype=np.int64),
                                 k))
        return pa.table({
            "r_regionkey": b.column("r_regionkey").take(idx),
            "r_name": b.column("r_name").take(idx),
            "event_type": pa.array(np.tile(np.asarray(ts, dtype=object),
                                           b.num_rows), pa.string()),
        })

    return region.map_batches(cross, batch_format="pyarrow")


def q_events_sessions_streaming(sf_dir: str) -> pa.Table:
    """Incremental SESSION windows (gap 30 min) through the sharded
    session-state actors (stages/window.py:SessionShard) driven to
    end-of-stream: per-batch sorted gap-cut partials, order-independent
    interval merging in the shards, watermark seal.  Within a single
    run no event is ever late (the watermark only advances after the
    whole run merges), so flush ≡ the batch gaps-and-islands sessionize
    — which is exactly what the DuckDB twin replays.  Mid-stream
    seal/late-drop behavior is pinned by the stage's unit tests."""
    from ..stages.window import (flush_sessions, ingest_session_run,
                                 make_session_index, session_table)

    GAP = 30 * 60 * 1_000_000
    shards = make_session_index(GAP, 4)
    try:
        ds = rd.read_parquet(_t(sf_dir, "events"),
                             columns=["user_id", "ts"])
        parts = ingest_session_run(ds, shards, lateness_us=0)
        tail = flush_sessions(shards)
        return pa.concat_tables([session_table(parts),
                                 session_table(tail)])
    finally:
        for s in shards:
            ray.kill(s)


def q_documents_neardup_components(sf_dir: str) -> Dataset:
    """Connected components over the EXACT n-gram-Jaccard near-dup
    graph, oracle-checked end-to-end (components were rows-only until
    now): edges from :func:`q_documents_jaccard_pairs`, labels from
    the hybrid connected-components stage in stages/dedup.py (driver
    union-find under the pair cap, min-label propagation beyond),
    singleton
    docs mapped to themselves via a left join.  The DuckDB twin replays
    the whole composition — pair generation plus a WITH RECURSIVE
    transitive closure — so the component labels are bit-checked, not
    just the edges."""
    from ..stages.dedup import connected_components

    pairs = q_documents_jaccard_pairs(sf_dir)
    comp = with_schema(
        connected_components(pairs),
        pa.schema([("id", pa.int64()), ("rep", pa.int64())]))
    docs = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])
    j = docs.join(comp, join_type="left_outer", num_partitions=8,
                  on=("doc_id",), right_on=("id",))

    def finish(b: pa.Table) -> pa.Table:
        rep = pc.coalesce(b.column("rep"), b.column("doc_id"))
        return pa.table({"doc_id": b.column("doc_id"),
                         "rep": pc.cast(rep, pa.int64())})

    return j.map_batches(finish, batch_format="pyarrow")


def q_media_audio_segments(sf_dir: str) -> Dataset:
    """Audio segmentation stage (multimodal suite, the audio sibling of
    resize/frame-sample): each audio payload fans out to 10-second
    windows; segment geometry (start sample, window samples, integer-ms
    duration) derives from the same little-endian header fields the
    DuckDB oracle parses with to_hex nibble arithmetic, so the whole
    1→N fanout is hash-checked."""
    from ..stages.multimodal import segment_audio

    ds = rd.read_parquet(media_parquet_path(sf_dir))
    return segment_audio(ds, chunk_seconds=10)


def q_documents_train_split(sf_dir: str) -> Dataset:
    """Deterministic 80/10/10 train/val/test assignment over documents
    (stages/partition.deterministic_split): leak-free, resume-safe,
    identical under any partitioning, and bit-replayed by the twin's
    md5 CASE bands — the split every training-data pipeline runs
    last."""
    from ..stages.partition import deterministic_split

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "source"])
    return deterministic_split(
        ds, {"train": 0.8, "val": 0.1, "test": 0.1}, ["doc_id"])


def q_documents_unigram_logprob(sf_dir: str) -> Dataset:
    """Corpus-LM quality scoring (the unigram perplexity-filter shape):
    pass 1 builds the global term-frequency table, pass 2 joins it back
    onto each document's tokens and averages ln p(token) = ln(tf / N).
    Everything order-dependent is int64-quantized — Σ of rounded ln(tf)·1e6
    per doc — so the two-pass composition is bit-replayed by the twin;
    only the final avg expression is float.  Scale shape: the term
    table is an aggregate (with_schema-pinned) JOINED, not broadcast —
    vocabulary size never constrains a worker's heap."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def tok_rows(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, n), pa.int64()),
            "tok": flat,
        })

    toks = ds.map_batches(tok_rows, batch_format="pyarrow")

    def tf_partial(b: pa.Table) -> pa.Table:
        g = b.select(["tok"]).group_by("tok").aggregate([("tok", "count")])
        return g.rename_columns(["tok", "p_n"])

    tf = with_schema(
        toks.map_batches(tf_partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("p_n", alias_name="tf")),
        pa.schema([("tok", pa.string()), ("tf", pa.int64())]))

    j = toks.join(tf, join_type="inner", num_partitions=8, on=("tok",))

    def doc_partial(b: pa.Table) -> pa.Table:
        tfv = b.column("tf").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = scaled_int_sql(np.log(tfv), 1e6)
        t = pa.table({"doc_id": b.column("doc_id"),
                      "q": pa.array(q, pa.int64()),
                      "c": pa.array(np.ones(len(q), np.int64()))})
        g = t.group_by("doc_id").aggregate([("q", "sum"), ("c", "sum")])
        return g.rename_columns(["doc_id", "p_q", "p_c"])

    agg = j.map_batches(doc_partial, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("p_q", alias_name="sq"),
                                     Sum("p_c", alias_name="n_tokens"))
    total = int(toks.count())

    def finish(b: pa.Table, n_total=total) -> pa.Table:
        sq = b.column("sq").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = b.column("n_tokens").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # avg ln p = (Σ ln tf)/n − ln N, written token-identically in
        # the twin (ln N enters once, outside the quantized sum)
        avg = (sq / 1e6) / n - float(np.log(n_total))
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pc.cast(b.column("n_tokens"), pa.int64()),
            "avg_logprob": round_sql(pa.array(avg, pa.float64()), 6),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_documents_source_kl(sf_dir: str) -> Dataset:
    """Per-source distribution-shift score: KL(source ‖ corpus) over
    token unigrams — the drift detector a curation pipeline runs per
    ingest source.  Exact-integer decomposition: KL = (S1 − S2)/1e6/n_s
    − ln n_s + ln N with S1 = Σ_t c_st·q(ln c_st) and
    S2 = Σ_t c_st·q(ln c_t), q = rounding to 1e-6 — order-independent int64
    sums over the (source, token) grid joined to the corpus tf table —
    so the twin hashes bit-exact; only the final expression is float."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "text"])

    def tok_rows(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = b.column("source").to_numpy(zero_copy_only=False)
        return pa.table({
            "source": pa.array(np.repeat(src, n), pa.string()),
            "tok": flat,
        })

    toks = ds.map_batches(tok_rows, batch_format="pyarrow")

    def st_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "tok"]).aggregate([("tok", "count")])
        return g.rename_columns(["source", "tok", "p_n"])

    st = with_schema(
        toks.map_batches(st_partial, batch_format="pyarrow")
        .groupby(["source", "tok"]).aggregate(
            Sum("p_n", alias_name="c_st")),
        pa.schema([("source", pa.string()), ("tok", pa.string()),
                   ("c_st", pa.int64())]))

    def tf_partial(b: pa.Table) -> pa.Table:
        g = b.select(["tok"]).group_by("tok").aggregate(
            [("tok", "count")])
        return g.rename_columns(["tok", "p_n"])

    tf = with_schema(
        toks.map_batches(tf_partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("p_n", alias_name="c_t")),
        pa.schema([("tok", pa.string()), ("c_t", pa.int64())]))

    j = st.join(tf, join_type="inner", num_partitions=8, on=("tok",))

    def src_partial(b: pa.Table) -> pa.Table:
        c_st = b.column("c_st").to_numpy(zero_copy_only=False)
        c_t = b.column("c_t").to_numpy(zero_copy_only=False)
        q_st = scaled_int_sql(np.log(c_st.astype(np.float64)), 1e6)
        q_t = scaled_int_sql(np.log(c_t.astype(np.float64)), 1e6)
        t = pa.table({
            "source": b.column("source"),
            "s1": pa.array(c_st * q_st, pa.int64()),
            "s2": pa.array(c_st * q_t, pa.int64()),
            "c": pa.array(c_st, pa.int64()),
        })
        g = t.group_by("source").aggregate(
            [("s1", "sum"), ("s2", "sum"), ("c", "sum")])
        return g.rename_columns(["source", "p_s1", "p_s2", "p_c"])

    agg = j.map_batches(src_partial, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("p_s1", alias_name="s1"),
                                     Sum("p_s2", alias_name="s2"),
                                     Sum("p_c", alias_name="n_s"))
    n_total = int(toks.count())

    def finish(b: pa.Table, nt=n_total) -> pa.Table:
        s1 = b.column("s1").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        s2 = b.column("s2").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ns = b.column("n_s").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        kl = (s1 - s2) / 1e6 / ns - np.log(ns) + float(np.log(nt))
        return pa.table({
            "source": b.column("source"),
            "n_tokens": pc.cast(b.column("n_s"), pa.int64()),
            "kl_vs_corpus": round_sql(pa.array(kl, pa.float64()), 6),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_documents_cross_source_dups(sf_dir: str) -> pa.Table:
    """Cross-source duplication matrix: for every source pair, how many
    distinct texts appear in BOTH — the leakage/contamination triage
    view over ingest feeds.  Shape: local + global distinct on
    (text, source) first (payloads collapse before any join), then the
    inverted-index self-join on text emits only co-occurring source
    pairs, counted per (source_a < source_b)."""
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["text", "source"])

    def local_distinct(b: pa.Table) -> pa.Table:
        return b.group_by(["text", "source"]).aggregate([])

    d = with_schema(
        ds.map_batches(local_distinct, batch_format="pyarrow")
        .groupby(["text", "source"]).aggregate(
            Count("source", alias_name="_n"))
        .drop_columns(["_n"]),
        pa.schema([("text", pa.string()), ("source", pa.string())]))

    d_b = d.map_batches(lambda b: b.rename_columns(["text", "source_b"]),
                        batch_format="pyarrow")
    j = d.join(d_b, join_type="inner", num_partitions=8, on=("text",))

    def pair_partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.less(b.column("source"), b.column("source_b")))
        g = pa.table({"source_a": f.column("source"),
                      "source_b": f.column("source_b")}) \
            .group_by(["source_a", "source_b"]).aggregate(
                [("source_a", "count")])
        return g.rename_columns(["source_a", "source_b", "p_n"])

    # the matrix is bounded by sources² — tiny by construction — and a
    # legitimately EMPTY distributed result loses its schema (Ray's
    # empty blocks), so collect to a typed driver table
    tab = _small_table(
        j.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["source_a", "source_b"]).aggregate(
            Sum("p_n", alias_name="n_shared")))
    if tab is None:
        return pa.table({"source_a": pa.array([], pa.string()),
                         "source_b": pa.array([], pa.string()),
                         "n_shared": pa.array([], pa.int64())})
    return tab.set_column(tab.schema.get_field_index("n_shared"),
                          "n_shared",
                          pc.cast(tab.column("n_shared"), pa.int64()))


def q_events_heavy_hitters(sf_dir: str) -> Dataset:
    """Exact frequent-item mining (heavy hitters) with a two-pass
    candidate/verify plan: every $10 value bucket holding ≥ 1/300 of
    all events.  Pass 1 emits per-batch LOCAL heavy buckets (count_b ·
    300 ≥ n_b) — by pigeonhole any globally heavy bucket is locally
    heavy in ≥ 1 batch, so the deduped union is a guaranteed SUPERSET
    of the answer at ≤ 300 candidates/batch regardless of domain size.
    Pass 2 broadcasts the candidate set and exact-counts ONLY matching
    rows; the final HAVING uses integer cross-multiplication (n·300 ≥
    N), so the output is exact — the sketch never touches correctness,
    only how much the exchange carries."""
    import numpy as np

    THRESH_DEN = 300
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["value"])

    def local_heavy(b: pa.Table) -> pa.Table:
        bucket = pc.cast(pc.floor(pc.divide(
            b.column("value"), pa.scalar(10.0))), pa.int64())
        # ones-sum, not count(bucket): the twin's COUNT(*) counts the
        # NULL bucket too (floor(NULL/10) groups as NULL), and count()
        # over the group key would report that group as 0
        g = pa.table({"bucket": bucket,
                      "one": pa.array(np.ones(b.num_rows, np.int64))}) \
            .group_by("bucket").aggregate([("one", "sum")])
        keep = pc.greater_equal(
            pc.multiply(g.column("one_sum"),
                        pa.scalar(THRESH_DEN, pa.int64())),
            pa.scalar(b.num_rows, pa.int64()))
        return pa.table({"bucket": g.filter(keep).column("bucket")})

    # with_schema: a shuffle partition holding ONLY the null-bucket
    # group comes back as a bucket:null-typed block that breaks the
    # concat (and any downstream join) — pin int64
    cand_tab = _small_table(with_schema(
        ds.map_batches(local_heavy, batch_format="pyarrow")
        .groupby("bucket").aggregate(Count("bucket", alias_name="_n")),
        pa.schema([("bucket", pa.int64()), ("_n", pa.int64())])))
    cand_vals = (cand_tab.column("bucket").to_pylist()
                 if cand_tab is not None else [])
    null_cand = None in cand_vals
    candidates = sorted(v for v in cand_vals if v is not None)
    cand_ref = ray.put((candidates, null_cand))

    def exact_counts(b: pa.Table) -> pa.Table:
        cand, null_ok = ray.get(cand_ref)
        bucket = pc.cast(pc.floor(pc.divide(
            b.column("value"), pa.scalar(10.0))), pa.int64())
        mask = pc.is_in(bucket, value_set=pa.array(cand, pa.int64()))
        if null_ok:
            mask = pc.or_kleene(mask, pc.is_null(bucket))
        t = pa.table({"bucket": bucket,
                      "one": pa.array(np.ones(b.num_rows, np.int64))}) \
            .filter(pc.fill_null(mask, False))
        g = t.group_by("bucket").aggregate([("one", "sum")])
        return g.rename_columns(["bucket", "p_n"])

    n_total = ds.count()
    agg = with_schema(
        ds.map_batches(exact_counts, batch_format="pyarrow")
        .groupby("bucket").aggregate(Sum("p_n", alias_name="n")),
        pa.schema([("bucket", pa.int64()), ("n", pa.int64())]))
    return agg.map_batches(
        lambda b: (lambda f: pa.table(
            {"bucket": pc.cast(f.column("bucket"), pa.int64()),
             "n_occurrences": pc.cast(f.column("n"), pa.int64())}))(
            b.filter(pc.greater_equal(
                pc.multiply(b.column("n"),
                            pa.scalar(THRESH_DEN, pa.int64())),
                pa.scalar(n_total, pa.int64())))),
        batch_format="pyarrow")


def q_events_grouped_quantiles(sf_dir: str) -> Dataset:
    """Per-group exact quantiles (quantile_disc semantics per event
    type) — the grouped variant of lineitem_quantiles, via
    stages/quantiles.grouped_exact_quantiles: a keyed (value, count)
    histogram exchange plus a vectorized in-group cumulative pick."""
    from ..stages.quantiles import grouped_exact_quantiles

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "value"])
    return grouped_exact_quantiles(ds, "event_type", "value",
                                   qs=(0.25, 0.5, 0.9))


def q_events_rolling_distinct(sf_dir: str) -> Dataset:
    """Trailing-window COUNT DISTINCT (7-day rolling distinct users per
    active day) — the sliding-window distinct shape SQL writes with a
    windowed range join.  Distributed plan: dedupe to (user, day) pairs
    (partial per batch, then a groupby — the only exchange over user
    grain), fan each pair out to the ≤ 7 windows it serves (vectorized
    repeat/take), dedupe (user, window) — a user active twice in one
    window counts once — then count per window and keep only days that
    actually have events (inner join against the observed-day set,
    broadcast as a value mask).  Every exchange is over distinct pairs,
    never raw events."""
    import numpy as np

    WIN = 7
    DAY_US = 86_400_000_000
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def pair_partial(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(b.column("ts"), unit="day"),
                      pa.int64())
        return pa.table({"user_id": b.column("user_id"), "day": day}) \
            .group_by(["user_id", "day"]).aggregate([])

    # pairs feed BOTH the observed-day set and the fan-out — pin them
    # once or the read + dedupe exchange re-executes per consumer
    pairs = ds.map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["user_id", "day"]).aggregate(
            Count("user_id", alias_name="_n")).materialize()

    days_tab = _small_table(
        pairs.map_batches(lambda b: b.select(["day"]).group_by("day")
                          .aggregate([]), batch_format="pyarrow")
        .groupby("day").aggregate(Count("day", alias_name="_m")))
    observed = np.sort(days_tab.column("day").to_numpy(
        zero_copy_only=False)) if days_tab is not None else np.array([], np.int64)
    days_ref = ray.put(observed)

    def fanout(b: pa.Table) -> pa.Table:
        obs = ray.get(days_ref)
        day = b.column("day").combine_chunks().to_numpy(zero_copy_only=False)
        uid = b.column("user_id").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        # windows served by activity on d: observed days in [d, d+6]
        lo = np.searchsorted(obs, day, side="left")
        hi = np.searchsorted(obs, day + (WIN - 1) * DAY_US, side="right")
        n = hi - lo
        flat = np.repeat(lo, n) + (np.arange(int(n.sum()))
                                   - np.repeat(np.cumsum(n) - n, n))
        return pa.table({
            "user_id": pa.array(np.repeat(uid, n), pa.int64()),
            "win_day": pa.array(obs[flat], pa.int64()),
        }).group_by(["user_id", "win_day"]).aggregate([])

    uw = pairs.map_batches(fanout, batch_format="pyarrow") \
        .groupby(["user_id", "win_day"]).aggregate(
            Count("user_id", alias_name="_n"))

    def win_partial(b: pa.Table) -> pa.Table:
        g = b.select(["win_day"]).group_by("win_day") \
            .aggregate([("win_day", "count")])
        return g.rename_columns(["win_day", "p_n"])

    out = uw.map_batches(win_partial, batch_format="pyarrow") \
        .groupby("win_day").aggregate(Sum("p_n", alias_name="n"))
    return out.map_batches(
        lambda b: pa.table({
            "day": pc.cast(b.column("win_day"), pa.timestamp("us")),
            "n_users_7d": pc.cast(b.column("n"), pa.int64())}),
        batch_format="pyarrow")


def q_events_cooccurrence(sf_dir: str) -> Dataset:
    """Co-occurrence / market-basket pair counts: for every unordered
    event-type pair (a < b), how many users performed both.  Plan:
    dedupe to distinct (user, type) — partial per batch, one exchange —
    then a self hash join on user_id (Dataset.join co-partitions; the
    per-user fanout is bounded by the type domain), filter to a < b,
    and a partial-agg count per pair.  The pair grid is domain², tiny,
    so the final aggregate is a broadcast-scale reduce."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_type"])

    def distinct_partial(b: pa.Table) -> pa.Table:
        return b.group_by(["user_id", "event_type"]).aggregate([])

    ut = with_schema(
        ds.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby(["user_id", "event_type"]).aggregate(
            Count("user_id", alias_name="_n"))
        .map_batches(lambda b: b.select(["user_id", "event_type"]),
                     batch_format="pyarrow"),
        pa.schema([("user_id", pa.int64()), ("event_type", pa.string())]))

    ut_b = ut.map_batches(
        lambda b: b.rename_columns(["user_id", "type_b"]),
        batch_format="pyarrow")
    j = ut.join(ut_b, join_type="inner", num_partitions=8,
                on=("user_id",))

    def pair_partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.less(b.column("event_type"), b.column("type_b")))
        g = pa.table({"type_a": f.column("event_type"),
                      "type_b": f.column("type_b")}) \
            .group_by(["type_a", "type_b"]).aggregate(
                [("type_a", "count")])
        return g.rename_columns(["type_a", "type_b", "p_n"])

    out = j.map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["type_a", "type_b"]).aggregate(Sum("p_n", alias_name="n"))
    return out.map_batches(
        lambda b: pa.table({"type_a": b.column("type_a"),
                            "type_b": b.column("type_b"),
                            "n_users": pc.cast(b.column("n"), pa.int64())}),
        batch_format="pyarrow")


def q_documents_tfidf_pairs(sf_dir: str) -> Dataset:
    """TF-IDF-weighted sparse similarity join: document pairs whose
    idf²-weighted bigram dot product Σ_t tf_a·tf_b·q(idf_t)² clears a
    threshold — the weighted companion to the unweighted jaccard_pairs
    inverted index.  All arithmetic is int64 (idf quantized to 1e-3 per
    term), so the DuckDB twin replays it bit-exact.

    Scale shape: per-doc bigram tf partials (vectorized, terms.py),
    then ONE groupby(term) whose in-group row count IS the term's df —
    so the df pass, the idf join and the posting self-join all
    disappear: each term group either fails the df cap (df > 5 % of
    docs OR df > the absolute :data:`SHINGLE_DF_CAP` — the relative
    gate alone grows with N and lets Zipf-head bigrams expand ~10⁹
    pairs at 1M docs) and emits nothing, or expands its ≤ cap
    postings to weighted pairs
    with one vectorized triu_indices, computing qi from its own row
    count.  A per-batch partial pair combine then keeps the final
    (doc_a, doc_b) exchange to one row per pair per block.  An earlier
    revision expressed the same plan as tf ⋈ idf ⋈ tf hash joins —
    40× slower at sf0.1 (join-operator overhead dominates; the
    map_groups form moves each posting row through exactly one
    exchange)."""
    import numpy as np

    from ..stages.terms import _bigram_parts, _tokens

    DOT_MIN = 50_000_000
    DF_CAP_DEN = 20  # keep terms with df · 20 ≤ N_docs

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    n_docs = ds.count()

    def tf_partial(b: pa.Table) -> pa.Table:
        _, lens, flat, offs = _tokens(b)
        bg, d = _bigram_parts(flat, lens, offs)
        if len(bg) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64())})
        ids = b.column("doc_id").combine_chunks() \
            .take(pa.array(d, pa.int64()))
        g = pa.table({"doc_id": ids, "term": bg}) \
            .group_by(["doc_id", "term"]).aggregate([("doc_id", "count")])
        return g.rename_columns(["doc_id", "term", "tf"])

    # documents.parquet rows are whole docs, so per-batch (doc, term)
    # counts are already final — no cross-batch tf combine needed
    tf = ds.map_batches(tf_partial, batch_format="pyarrow")

    empty_pairs = pa.table({"doc_a": pa.array([], pa.int64()),
                            "doc_b": pa.array([], pa.int64()),
                            "p_w": pa.array([], pa.int64())})

    def expand_pairs(g: pa.Table) -> pa.Table:
        df = g.num_rows
        if df < 2 or df * DF_CAP_DEN > n_docs:
            return empty_pairs
        # absolute in-group cap on top of the relative 5 % gate: the
        # relative gate GROWS with the corpus, so at 1M docs a Zipf-head
        # bigram (df ≈ 5k ≪ 5 %·N) would still expand ~10⁷ pairs from
        # one group — ~10⁹ summed over the head (measured in the 1M
        # stress bench).  No-op below N = 20·SHINGLE_DF_CAP docs, so
        # the sf0.01/sf0.1 oracles are unaffected; the twin carries the
        # same AND df <= cap predicate.
        if _df_capped(g, df, SHINGLE_DF_CAP, "tfidf_pairs", "term"):
            return empty_pairs
        qi = np.int64(round_sql_f(float(np.log(n_docs / df)) * 1000.0, 0))
        g = g.sort_by([("doc_id", "ascending")])
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        tfs = g.column("tf").to_numpy(zero_copy_only=False)
        a, b = np.triu_indices(df, k=1)
        return pa.table({
            "doc_a": pa.array(ids[a], pa.int64()),
            "doc_b": pa.array(ids[b], pa.int64()),
            "p_w": pa.array(tfs[a] * tfs[b] * qi * qi, pa.int64()),
        })

    pairs = tf.groupby("term").map_groups(expand_pairs,
                                          batch_format="pyarrow") \
        .materialize()

    # shared adaptive combine (tree while pairs fit one task, else the
    # partial-agg shuffle — see _pair_combine)
    out = _pair_combine(pairs, ["doc_a", "doc_b"], "dot", pcol="p_w")
    return out.map_batches(
        lambda b: (lambda f: pa.table(
            {"doc_a": f.column("doc_a"), "doc_b": f.column("doc_b"),
             "dot": pc.cast(f.column("dot"), pa.int64())}))(
            b.filter(pc.greater_equal(
                b.column("dot"), pa.scalar(DOT_MIN, pa.int64())))),
        batch_format="pyarrow")

def q_transcripts_boilerplate(sf_dir: str) -> Dataset:
    """Corpus-level boilerplate line mining (the trafilatura-style
    common-line detector that feeds template/boilerplate stripping):
    every trimmed line appearing in ≥ 1 % of turn rows, with its row
    count.  A line repeating within one turn counts once; duplicate
    turn ROWS count separately (the corpus contains injected duplicate
    (conv_id, turn_idx) rows, so row identity — not turn identity — is
    the deterministic grain; the twin replays it with row_number()).

    Scale shape: rows never span batches, so the per-batch
    (row, line) dedupe is exact and the ONLY exchange is (line,
    partial_count) — boilerplate lines are by definition few distinct
    values with high counts, the partial-agg sweet spot.  Vectorized
    end-to-end: one split_pattern, one list_flatten, one utf8_trim
    (space-only, DuckDB trim parity), two Arrow group_bys."""
    import numpy as np

    PCT_DEN = 100  # keep lines with n_rows_containing · 100 ≥ N
    ds = rd.read_parquet(transcript_paths(sf_dir), columns=["text"])
    n_rows = ds.count()

    def partial(b: pa.Table) -> pa.Table:
        lines = pc.split_pattern(b.column("text").combine_chunks(), "\n")
        lens = pc.list_value_length(lines).fill_null(0) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        flat = pc.utf8_trim(pc.list_flatten(lines), " ")
        rid = np.repeat(np.arange(len(lens)), lens)
        t = pa.table({"rid": pa.array(rid, pa.int64()), "line": flat}) \
            .filter(pc.not_equal(flat, ""))
        d = t.group_by(["rid", "line"]).aggregate([])
        g = d.group_by("line").aggregate([("line", "count")])
        return g.rename_columns(["line", "p_n"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("line").aggregate(Sum("p_n", alias_name="n"))
    return agg.map_batches(
        lambda b: (lambda f: pa.table(
            {"line": f.column("line"),
             "n_turns": pc.cast(f.column("n"), pa.int64())}))(
            b.filter(pc.greater_equal(
                pc.multiply(b.column("n"),
                            pa.scalar(PCT_DEN, pa.int64())),
                pa.scalar(n_rows, pa.int64())))),
        batch_format="pyarrow")


def q_events_quantiles_cont(sf_dir: str) -> Dataset:
    """Per-group INTERPOLATED quantiles (quantile_cont parity — the
    continuous companion to events_grouped_quantiles), via
    stages/quantiles.grouped_quantiles_cont; the interpolation operand
    order replays DuckDB's own, so doubles hash-match bit-exact."""
    from ..stages.quantiles import grouped_quantiles_cont

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "value"])
    return grouped_quantiles_cont(ds, "event_type", "value",
                                  qs=(0.5, 0.9))


def q_events_value_outliers(sf_dir: str) -> Dataset:
    """Robust outlier detection (median / MAD — the curation-grade
    outlier filter that, unlike z-scores, is immune to the outliers it
    hunts): events with |value − median(type)| > 3·MAD(type).

    Three bounded passes: (1) grouped exact median via the (value,
    count) histogram, broadcast as a tiny per-type table; (2) absolute
    deviations — vectorized dictionary-index lookup, no join — feed the
    same histogram machinery for MAD; (3) one filter scan against the
    broadcast thresholds.  Every exchange moves (type, value, count)
    histogram rows; raw events never shuffle.  All value arithmetic is
    the same double ops the SQL twin runs, in the same order."""
    import numpy as np

    from ..stages.quantiles import grouped_exact_quantiles

    cols = ["event_id", "event_type", "value"]
    # NULL values can never be outliers (the twin's abs(v−m) and d > 3·MAD
    # comparisons are NULL → dropped), and dropping them up front also
    # keeps the median lookup total: a type whose values are ALL NULL
    # has no median, and after this filter no rows to look one up for
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=cols) \
        .map_batches(lambda b: b.filter(pc.is_valid(b.column("value"))),
                     batch_format="pyarrow")

    def med_map(stage_ds):
        tab = _small_table(grouped_exact_quantiles(
            stage_ds.select_columns(["event_type", "value"]),
            "event_type", "value", qs=(0.5,)))
        return {r["event_type"]: r["q50"] for r in tab.to_pylist()} \
            if tab is not None else {}

    med = med_map(ds)
    med_ref = ray.put(med)

    def add_dev(b: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        types = b.column("event_type").combine_chunks() \
            .dictionary_encode()
        lut = np.array([m[t] for t in types.dictionary.to_pylist()],
                       np.float64) if len(types.dictionary) else \
            np.array([], np.float64)
        mv = lut[types.indices.to_numpy(zero_copy_only=False)] \
            if b.num_rows else np.array([], np.float64)
        dev = np.abs(b.column("value").combine_chunks()
                     .to_numpy(zero_copy_only=False) - mv)
        return b.append_column("dev", pa.array(dev, pa.float64()))

    dev_ds = ds.map_batches(add_dev, batch_format="pyarrow")
    mad_tab = _small_table(grouped_exact_quantiles(
        dev_ds.select_columns(["event_type", "dev"]),
        "event_type", "dev", qs=(0.5,)))
    mad = {r["event_type"]: r["q50"] for r in mad_tab.to_pylist()} \
        if mad_tab is not None else {}
    mad_ref = ray.put(mad)

    def keep_outliers(b: pa.Table) -> pa.Table:
        md = ray.get(mad_ref)
        types = b.column("event_type").combine_chunks() \
            .dictionary_encode()
        lut = np.array([3.0 * md[t] for t in
                        types.dictionary.to_pylist()], np.float64) \
            if len(types.dictionary) else np.array([], np.float64)
        thr = lut[types.indices.to_numpy(zero_copy_only=False)] \
            if b.num_rows else np.array([], np.float64)
        dev = b.column("dev").to_numpy(zero_copy_only=False)
        return b.filter(pa.array(dev > thr)).select(cols)

    return dev_ds.map_batches(keep_outliers, batch_format="pyarrow")


def q_events_approx_distinct_per_type(sf_dir: str) -> pa.Table:
    """GROUPED approximate COUNT(DISTINCT users) per event type via
    per-group mergeable HLL sketches (stages/sketches.py) — the
    fixed-memory scale path beside the exact
    events_distinct_users_per_type: the exchange carries one 4 KB
    sketch per (batch, type) however many distinct users a type has.
    Rows-only driver check (approximate by construction); the <5 %
    error bound against the exact twin is pytest-pinned."""
    from ..stages.sketches import approx_distinct_per_group

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "user_id"])
    return approx_distinct_per_group(ds, "event_type", "user_id")


def _pair_combine(pairs: Dataset, keys: list[str], out: str,
                  pcol: str = "p_c") -> Dataset:
    """Adaptive pair-count combine shared by the similarity/graph
    kernels: tree (Arrow group_by passes, width 16, one final task)
    while the raw pair table fits the final task's budget, else the
    map-side-partial sort-shuffle.  The cap is 20M (was 5M): a
    first-level comb pass collapses each block's repeated keys, so
    the final task sees far fewer rows than the raw count — the
    sf0.01 co-purchase wedge table (13.8M raw, 2.0M distinct) ran
    156 s on the shuffle and runs in seconds on the tree.  Do NOT
    materialize a separate partial pass before the shuffle branch: at
    sf0.1 (148M wedge rows) that extra materialization made the
    shuffle strictly slower (measured this round).  ``pairs`` must be
    materialized (it is counted and then consumed)."""
    PAIR_TREE_MAX = 20_000_000
    partial_names = keys + [pcol]
    if pairs.count() <= PAIR_TREE_MAX:
        # tree: its first comb pass IS the per-block partial agg, so no
        # separate materialization — 13.8M raw / 2.0M distinct at
        # sf0.01 runs in seconds here vs 156 s on the sort-shuffle
        combined = _tree_combine(pairs, keys, [(pcol, "sum")],
                                 partial_names, keys + [out],
                                 width=16)
    else:
        # beyond what one final tree task should hold: map-side partial
        # fused into the shuffle (no extra materialization pass)
        def pair_partial(b: pa.Table) -> pa.Table:
            g = b.group_by(keys).aggregate([(pcol, "sum")])
            return g.rename_columns(partial_names)

        combined = pairs.map_batches(pair_partial,
                                     batch_format="pyarrow") \
            .groupby(keys).aggregate(Sum(pcol, alias_name=out))
    return with_schema(combined, pa.schema(
        [(k, pa.int64()) for k in keys] + [(out, pa.int64())]))


#: Default stop-shingle document-frequency cap for the EXACT similarity
#: pair kernels (jaccard / containment / decontaminate).  A shingle shared
#: by df documents expands to df·(df−1)/2 pairs inside ONE map_groups
#: task — O(df²) rows and memory from a single group — so a boilerplate
#: shingle with df=100k would emit 5×10⁹ pairs and kill the stage.  A
#: shingle above the cap is treated as a STOP SHINGLE and contributes no
#: pairs (the same prune discipline q_documents_tfidf_pairs applies via
#: its 5 %-of-corpus df gate); each drop is logged loudly with the df so
#: a truncating run is visible, never silent.  2000² / 2 = 2×10⁶ pairs
#: (~48 MB) bounds the worst single group; the oracle-checked corpora sit
#: far below the cap (max df ≈ corpus dup-cluster size), so the [SQL]
#: twins are unaffected — callers that *want* exact-on-prose semantics
#: can raise or disable (``df_cap=None``) explicitly.
SHINGLE_DF_CAP = 2000


def _df_capped(g: pa.Table, df: int, df_cap: int | None,
               kernel: str, key_col: str = "sh") -> bool:
    """True (and a loud worker-log warning) when a shingle/term group
    exceeds the stop-key cap and must contribute no pairs."""
    if df_cap is not None and df > df_cap:
        import logging
        k0 = g.column(key_col)[0].as_py() if key_col in g.column_names \
            else "?"
        logging.getLogger(__name__).warning(
            "%s: stop key dropped (df=%d > df_cap=%d, key=%r): "
            "pair counts for docs sharing ONLY this key are "
            "truncated; raise df_cap for exact-on-prose semantics",
            kernel, df, df_cap, k0)
        return True
    return False


def _shingle_pair_counts(sh: Dataset,
                         df_cap: int | None = SHINGLE_DF_CAP) -> Dataset:
    """(doc_id, sh) rows → (id_a < id_b, c = #shared shingles) pairs,
    the inverted-index kernel the exact-similarity family shares
    (jaccard, containment): in-group pair expansion per shingle — one
    ``groupby(sh)`` exchange, vectorized triu_indices, NO posting
    self-join — then an adaptive tree/shuffle pair combine (the same
    ~0.5 s/block Ray-Aggregate economics as the tfidf pair join; the
    join-cascade formulation of the same plan measured 5× slower at
    sf0.1).  Shingles with df > ``df_cap`` are stop-shingles: dropped
    with a loud log instead of exploding O(df²) pairs from one group
    (see :data:`SHINGLE_DF_CAP`); ``df_cap=None`` disables."""
    import numpy as np

    empty_pairs = pa.table({"id_a": pa.array([], pa.int64()),
                            "id_b": pa.array([], pa.int64()),
                            "p_c": pa.array([], pa.int64())})

    def expand(g: pa.Table) -> pa.Table:
        if g.num_rows < 2 or _df_capped(g, g.num_rows, df_cap,
                                        "_shingle_pair_counts"):
            return empty_pairs
        ids = np.sort(g.column("doc_id").to_numpy(zero_copy_only=False))
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table({"id_a": pa.array(ids[a], pa.int64()),
                         "id_b": pa.array(ids[b], pa.int64()),
                         "p_c": pa.array(np.ones(len(a), np.int64))})

    pairs = sh.groupby("sh").map_groups(expand, batch_format="pyarrow") \
        .materialize()
    return _pair_combine(pairs, ["id_a", "id_b"], "c")


def q_documents_containment_pairs(sf_dir: str) -> Dataset:
    """Directional shingle-set CONTAINMENT (A ⊆ B): catches truncated /
    prefix copies that symmetric jaccard-at-0.5 misses (a short doc
    fully inside a long one can sit far below any symmetric threshold).
    Emits (sub_id, super_id, n_shared) rows, both directions when the
    sets are identical.

    Same inverted-index discipline as jaccard_pairs/tfidf_pairs: word
    3-gram shingle rows, in-group pair expansion per shingle (one
    exchange — no posting self-join, stop-shingles above
    :data:`SHINGLE_DF_CAP` dropped loudly), adaptive tree/shuffle pair
    combine, then two hash joins against the per-doc set sizes, where
    |A∩B| = |A| is the vectorized containment test."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    sh = ds.map_batches(_doc_shingle_rows("doc_id"),
                        batch_format="pyarrow").materialize()
    sizes = with_schema(
        sh.groupby("doc_id").aggregate(Count("sh", alias_name="n")),
        pa.schema([("doc_id", pa.int64()), ("n", pa.int64())]))
    inter = _shingle_pair_counts(sh)

    # schema pinned between the chained joins (see q_documents_jaccard_pairs)
    half = with_schema(
        inter.join(
            sizes.map_batches(lambda b: b.rename_columns(["id_a", "n_a"]),
                              batch_format="pyarrow"),
            join_type="inner", num_partitions=8, on=("id_a",)),
        pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                   ("c", pa.int64()), ("n_a", pa.int64())]))
    sized = half.join(
        sizes.map_batches(lambda b: b.rename_columns(["id_b", "n_b"]),
                          batch_format="pyarrow"),
        join_type="inner", num_partitions=8, on=("id_b",))

    def directional(b: pa.Table) -> pa.Table:
        c = pc.cast(b.column("c"), pa.int64())
        fwd = b.filter(pc.equal(c, b.column("n_a")))
        rev = b.filter(pc.equal(c, b.column("n_b")))
        return pa.table({
            "sub_id": pa.concat_arrays([
                fwd.column("id_a").combine_chunks().cast(pa.int64()),
                rev.column("id_b").combine_chunks().cast(pa.int64())]),
            "super_id": pa.concat_arrays([
                fwd.column("id_b").combine_chunks().cast(pa.int64()),
                rev.column("id_a").combine_chunks().cast(pa.int64())]),
            "n_shared": pa.concat_arrays([
                fwd.column("c").combine_chunks().cast(pa.int64()),
                rev.column("c").combine_chunks().cast(pa.int64())]),
        })

    return sized.map_batches(directional, batch_format="pyarrow")


def q_events_value_zscore(sf_dir: str) -> Dataset:
    """Grouped STANDARDIZATION (z-score per event type) — the
    feature-normalization companion to the variance query, with the
    per-row output the curation pipeline actually consumes.  Moments
    travel as exact int64 cent partials (n, Σc, Σc²); mean/std/z are
    then computed in the twin's own token order, so every double is
    bit-identical.  One moment exchange + one broadcast + one scan."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_valid(b.column("value")))
        cents = scaled_int_sql(t.column("value"), 100.0)
        g = pa.table({"event_type": t.column("event_type"),
                      "c": pa.array(cents, pa.int64()),
                      "c2": pa.array(cents * cents, pa.int64())}) \
            .group_by("event_type").aggregate(
                [("c", "count"), ("c", "sum"), ("c2", "sum")])
        return g.rename_columns(["event_type", "p_n", "p_s", "p_s2"])

    mom_tab = _small_table(with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type").aggregate(
            Sum("p_n", alias_name="n"), Sum("p_s", alias_name="s"),
            Sum("p_s2", alias_name="s2")),
        pa.schema([("event_type", pa.string()), ("n", pa.int64()),
                   ("s", pa.int64()), ("s2", pa.int64())])))
    stats = {}
    if mom_tab is not None:
        for r in mom_tab.to_pylist():
            n, s, s2 = r["n"], r["s"], r["s2"]
            # token order mirrors the twin: mean = s/n/100.0,
            # var = (n*s2 - s*s)/n/n/10000.0, std = sqrt(var)
            # float() BEFORE dividing: DuckDB casts the BIGINT operands
            # to double and then divides; Python's int/int true division
            # instead rounds the exact quotient — differs in the last
            # ulp once the numerator passes 2^53
            mean = float(s) / n / 100.0
            var = float(n * s2 - s * s) / n / n / 10000.0
            std = float(np.sqrt(var))
            if std > 0.0:
                stats[r["event_type"]] = (mean, std)
    stats_ref = ray.put(stats)

    def zscore(b: pa.Table) -> pa.Table:
        st = ray.get(stats_ref)
        b = b.filter(pc.is_valid(b.column("value")))
        types = b.column("event_type").combine_chunks().dictionary_encode()
        dvals = types.dictionary.to_pylist()
        keep_t = np.array([t in st for t in dvals], bool)
        idx = types.indices.to_numpy(zero_copy_only=False)
        if not keep_t.all():
            b = b.filter(pa.array(keep_t[idx]))
            types = b.column("event_type").combine_chunks() \
                .dictionary_encode()
            dvals = types.dictionary.to_pylist()
            idx = types.indices.to_numpy(zero_copy_only=False)
        if b.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "z": pa.array([], pa.float64())})
        means = np.array([st[t][0] for t in dvals], np.float64)[idx]
        stds = np.array([st[t][1] for t in dvals], np.float64)[idx]
        v = b.column("value").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        return pa.table({"event_id": b.column("event_id"),
                         "event_type": b.column("event_type"),
                         "z": pa.array((v - means) / stds, pa.float64())})

    return ds.map_batches(zscore, batch_format="pyarrow")


def _doc_kgram_rows(out_id: str, k: int):
    """doc batch → (out_id, sh) distinct word-k-gram rows, VECTORIZED:
    k shifted takes off the flat token array + one C-level
    binary_join_element_wise (the generalization of _doc_shingle_rows'
    3-gram, without its per-row Python loop)."""
    import numpy as np

    from ..stages.terms import _tokens

    def fn(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({out_id: pa.array([], pa.int64()),
                             "sh": pa.array([], pa.string())})
        b = b.set_column(b.schema.get_field_index("text"), "text",
                         pc.fill_null(b.column("text"), ""))
        _, lens, flat, offs = _tokens(b)
        tot = len(flat)
        intra = np.arange(tot) - np.repeat(offs[:-1], lens)
        starts = np.flatnonzero(intra <= np.repeat(lens, lens) - k)
        if len(starts) == 0:
            return pa.table({out_id: pa.array([], pa.int64()),
                             "sh": pa.array([], pa.string())})
        cols = [flat.take(pa.array(starts + j, pa.int64()))
                for j in range(k)]
        sh = pc.binary_join_element_wise(*cols, " ")
        d = np.searchsorted(offs, starts, side="right") - 1
        ids = b.column(out_id if out_id in b.column_names else "doc_id") \
            .combine_chunks().take(pa.array(d, pa.int64()))
        return pa.table({out_id: ids, "sh": sh}) \
            .group_by([out_id, "sh"]).aggregate([])

    return fn


def q_documents_ngram_contamination(sf_dir: str) -> Dataset:
    """ANY-n-gram benchmark contamination (the GPT-3-style
    decontamination rule: flag a training doc if it shares even ONE
    word-5-gram with the held-out benchmark) — the absolute-overlap
    companion to the jaccard-threshold q_documents_decontaminate.
    Output: (doc_id, n_bench) — how many benchmark docs it collides
    with.

    Scale shape: vectorized k-gram shingle rows both sides, ONE
    inverted-index hash join on the shingle, pair-distinct groupby,
    then a per-doc count — no driver state; the benchmark side is the
    same deterministic md5 5 % sample the oracle replays."""
    from ..stages.partition import deterministic_sample

    K = 5
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    bench = deterministic_sample(ds, 0.05, ["doc_id"], seed=7)
    sa = ds.map_batches(_doc_kgram_rows("doc_id", K),
                        batch_format="pyarrow").materialize()
    sb = bench.map_batches(
        lambda b: b.rename_columns(["bench_id", "text"]),
        batch_format="pyarrow") \
        .map_batches(_doc_kgram_rows("bench_id", K),
                     batch_format="pyarrow")
    sb = with_schema(sb, pa.schema([("bench_id", pa.int64()),
                                    ("sh", pa.string())]))

    pairs = sa.join(sb, join_type="inner", num_partitions=8,
                    on=("sh",)) \
        .map_batches(
            lambda b: b.filter(pc.not_equal(
                b.column("doc_id"), b.column("bench_id")))
                       .select(["doc_id", "bench_id"]),
            batch_format="pyarrow") \
        .groupby(["doc_id", "bench_id"]).aggregate(
            Count("doc_id", alias_name="_c"))

    def per_doc(b: pa.Table) -> pa.Table:
        g = b.select(["doc_id"]).group_by("doc_id") \
            .aggregate([("doc_id", "count")])
        return g.rename_columns(["doc_id", "p_n"])

    out = pairs.map_batches(per_doc, batch_format="pyarrow") \
        .groupby("doc_id").aggregate(Sum("p_n", alias_name="n"))
    return out.map_batches(
        lambda b: pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "n_bench": pc.cast(b.column("n"), pa.int64())}),
        batch_format="pyarrow")


#: Ubiquitous-n-gram exclusion threshold for the SCALED contamination
#: rule (GPT-3 appendix-C practice: n-grams occurring in many training
#: documents are boilerplate, carry no contamination signal, and are the
#: exact rows whose inverted-index join fans out Σ df_a·df_b pairs — so
#: they are excluded EXPLICITLY, as a semantic rule the oracle mirrors,
#: not truncated).  2 binds on the test corpora (max 5-gram df is 3–4
#: there, from planted dup clusters) so the exclusion logic itself sits
#: under the bit-exact gate; production corpora would raise it (GPT-3
#: used ~10 on 13-grams).
NGRAM_UBIQ_CAP = 2


def q_documents_ngram_contamination_scaled(sf_dir: str) -> Dataset:
    """ANY-n-gram benchmark contamination with UBIQUITOUS-n-gram
    exclusion — the scale-safe variant of
    :func:`q_documents_ngram_contamination`.  The plain rule's
    inverted-index join fans out Σ df_a·df_b rows per shingle, and a
    5-gram hot on both sides (site boilerplate, licence headers) makes
    that quadratic; capping silently would under-report mass
    contamination, so this variant adopts the GPT-3 decontamination
    practice instead: 5-grams contained in more than
    :data:`NGRAM_UBIQ_CAP` corpus documents are declared uninformative
    and excluded FROM THE RULE — the DuckDB twin carries the identical
    HAVING df <= cap predicate, so the exclusion is oracle-checked, not
    a truncation.  Output: (doc_id, n_bench) over the surviving
    evidence shingles.

    Scale shape: ONE groupby(sh) exchange total — corpus and benchmark
    shingle rows are tagged and unioned, and each shingle group knows
    its own corpus df (its tag-0 row count), so the df pass, the keep
    join and the pair expansion all happen inside the group (the
    decontaminate kernel's shape); groups over the cap emit nothing by
    rule.  Worst surviving group is cap × bench-members — bounded."""
    from ..stages.partition import deterministic_sample

    import numpy as np

    K = 5
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    bench = deterministic_sample(ds, 0.05, ["doc_id"], seed=7)
    sa = ds.map_batches(_doc_kgram_rows("doc_id", K),
                        batch_format="pyarrow")
    sb = bench.map_batches(_doc_kgram_rows("doc_id", K),
                           batch_format="pyarrow")

    tagged = sa.map_batches(
        lambda b: b.append_column("bench", pa.array(
            np.zeros(b.num_rows, np.int8))), batch_format="pyarrow") \
        .union(sb.map_batches(
            lambda b: b.append_column("bench", pa.array(
                np.ones(b.num_rows, np.int8))), batch_format="pyarrow"))

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "bench_id": pa.array([], pa.int64()),
                      "p_c": pa.array([], pa.int64())})

    def expand(g: pa.Table) -> pa.Table:
        fl = g.column("bench").to_numpy(zero_copy_only=False)
        # corpus df = tag-0 rows (bench docs are corpus docs too, so
        # every bench row has a tag-0 twin; the twin's HAVING counts
        # the same rows)
        if int((fl == 0).sum()) > NGRAM_UBIQ_CAP \
                or not fl.any() or fl.all():
            return empty
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        a_ids, b_ids = ids[fl == 0], ids[fl == 1]
        da = np.repeat(a_ids, len(b_ids))
        db = np.tile(b_ids, len(a_ids))
        keep = da != db
        return pa.table({"doc_id": pa.array(da[keep], pa.int64()),
                         "bench_id": pa.array(db[keep], pa.int64()),
                         "p_c": pa.array(np.ones(int(keep.sum()),
                                                 np.int64))})

    pairs = tagged.groupby("sh").map_groups(
        expand, batch_format="pyarrow").materialize()
    distinct = _pair_combine(pairs, ["doc_id", "bench_id"], "c")
    out = distinct.groupby("doc_id").aggregate(
        Count("bench_id", alias_name="n_bench"))
    return out.map_batches(
        lambda b: pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "n_bench": pc.cast(b.column("n_bench"), pa.int64())}),
        batch_format="pyarrow")


def q_documents_token_budget_sample(sf_dir: str) -> Dataset:
    """Per-source TOKEN-BUDGET sampling (mixture building by token
    count, not doc count): walk each source's docs in seeded-md5 order
    and keep while the running token total stays ≤ 800 — the
    deterministic "fill each source's quota" step of corpus mixing.
    Resume-safe and partitioning-invariant: the order key is the same
    row-identity md5 the samplers share (row_hash_hex), replayed by the
    twin as a SUM() OVER (PARTITION BY source ORDER BY md5) window.
    One groupby(source) co-locates each source; the in-group walk is a
    sort + cumsum, vectorized."""
    import numpy as np

    from ..stages.partition import row_hash_hex

    BUDGET = 800
    SEED = 11
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "source", "text"])

    def prep(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text").combine_chunks(), " ")
        n = pc.list_value_length(toks).cast(pa.int64())
        h = pa.array([row_hash_hex((i,), SEED)
                      for i in b.column("doc_id").to_pylist()],
                     pa.string())
        return pa.table({"doc_id": b.column("doc_id"),
                         "source": b.column("source"),
                         "n_tokens": n, "h": h})

    def fill(g: pa.Table) -> pa.Table:
        g = g.sort_by([("h", "ascending"), ("doc_id", "ascending")])
        n = g.column("n_tokens").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        # NULL token counts add 0 to the running sum but keep their row
        # (the twin's SUM() OVER skips NULLs) — except while the prefix
        # is ALL NULL, where the window SUM itself is NULL and the twin
        # drops the row
        cum = np.cumsum(np.nan_to_num(n, nan=0.0))
        seen_valid = np.cumsum(~np.isnan(n)) > 0
        keep = g.filter(pa.array((cum <= BUDGET) & seen_valid))
        return pa.table({"doc_id": keep.column("doc_id"),
                         "source": keep.column("source"),
                         "n_tokens": keep.column("n_tokens")})

    return ds.map_batches(prep, batch_format="pyarrow") \
        .groupby("source").map_groups(fill, batch_format="pyarrow")


def q_documents_length_filter(sf_dir: str) -> Dataset:
    """Per-source PERCENTILE length gate (keep docs whose token count
    sits within their source's [p5, p95]) — the robust relative of
    fixed min/max length thresholds: each feed's own distribution sets
    its cut, so a verbose source doesn't drown a terse one.  Two
    bounded passes: the grouped quantile histogram (integer token
    counts — the comparisons are pure int64, no float parity surface)
    broadcast as a tiny per-source table, then one filter scan."""
    import numpy as np

    from ..stages.quantiles import grouped_exact_quantiles

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "source", "text"])

    def with_tokens(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text").combine_chunks(), " ")
        return pa.table({
            "doc_id": b.column("doc_id"),
            "source": b.column("source"),
            "n_tokens": pc.list_value_length(toks).cast(pa.int64()),
        })

    counted = ds.map_batches(with_tokens, batch_format="pyarrow") \
        .materialize()
    q_tab = _small_table(grouped_exact_quantiles(
        counted.select_columns(["source", "n_tokens"]),
        "source", "n_tokens", qs=(0.05, 0.95)))
    # an all-NULL source emits the NULL-quantile row (helper contract)
    # — it has no keepable rows (NULL comparisons), so skip its bounds
    bounds = {r["source"]: (int(r["q5"]), int(r["q95"]))
              for r in q_tab.to_pylist()
              if r["q5"] is not None} if q_tab is not None else {}
    bounds_ref = ray.put(bounds)

    def gate(b: pa.Table) -> pa.Table:
        bd = ray.get(bounds_ref)
        src = b.column("source").combine_chunks().dictionary_encode()
        dvals = src.dictionary.to_pylist()
        lo = np.array([bd.get(s, (np.iinfo(np.int64).max, 0))[0]
                       for s in dvals], np.int64)
        hi = np.array([bd.get(s, (0, np.iinfo(np.int64).min))[1]
                       for s in dvals], np.int64)
        idx = src.indices.to_numpy(zero_copy_only=False)
        # nulls surface as NaN after the float view; NaN comparisons
        # are False, so NULL-count rows drop — same as the twin
        n = b.column("n_tokens").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return b.filter(pa.array((n >= lo[idx]) & (n <= hi[idx])))

    return counted.map_batches(gate, batch_format="pyarrow")


def q_events_latest_per_user(sf_dir: str) -> Dataset:
    """Keep-LATEST-row-per-key compaction (the CDC/upsert primitive:
    each user's most recent event, full row, deterministic (ts,
    event_id) tie-break) as a pure partial-agg arg-max — no map_groups,
    no per-key Python: the whole row rides inside one lexically
    sortable packed string (zero-padded µs timestamp + zero-padded
    event_id + event_type + repr'd value), so Max on the packed column
    IS arg-max by (ts, event_id) and the shuffle moves one row per
    (user, batch).  Unpacking is a vectorized split; the value double
    round-trips bit-exact because repr() is the shortest-exact float
    form and Arrow's string→float64 cast parses it back to the same
    bits (hash-gate-proof).

    Preconditions (CDC-natural, asserted by the twin's semantics): the
    KEY/ORDER columns user_id, ts, event_id are non-NULL and ts /
    event_id are non-negative (utf8_lpad of a negative number is not
    order-preserving).  The PAYLOAD columns (event_type, value) may be
    NULL — they ride behind a presence flag so a NULL-valued latest row
    still wins, exactly like the twin's ROW_NUMBER."""
    from ray.data.aggregate import Max

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_id",
                                  "event_type", "value"])

    def pack(b: pa.Table) -> pa.Table:
        ts_s = pc.utf8_lpad(pc.cast(pc.cast(
            b.column("ts"), pa.int64()), pa.string()), 19, padding="0")
        id_s = pc.utf8_lpad(pc.cast(
            b.column("event_id"), pa.string()), 19, padding="0")
        # Arrow's double→string cast is shortest-exact (Ryu-style), so
        # the string→double cast in unpack restores the same bits —
        # fully vectorized, no per-row repr().  Nullable payloads get a
        # '1'+value / '0' presence flag: a NULL field must not null the
        # whole packed string (binary_join would) or Max skips the row.
        et = b.column("event_type").combine_chunks()
        et_s = pc.if_else(pc.is_valid(et),
                          pc.binary_join_element_wise(
                              pa.array(["1"] * b.num_rows), et, ""),
                          pa.array(["0"] * b.num_rows))
        val = b.column("value").combine_chunks()
        val_s = pc.if_else(
            pc.is_valid(val),
            pc.binary_join_element_wise(
                pa.array(["1"] * b.num_rows),
                pc.cast(pc.fill_null(val, 0.0), pa.string()), ""),
            pa.array(["0"] * b.num_rows))
        packed = pc.binary_join_element_wise(
            ts_s.combine_chunks(), id_s.combine_chunks(),
            et_s, val_s, "\x1f")
        g = pa.table({"user_id": b.column("user_id"),
                      "packed": packed}) \
            .group_by("user_id").aggregate([("packed", "max")])
        return g.rename_columns(["user_id", "p_max"])

    agg = ds.map_batches(pack, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Max("p_max", alias_name="m"))

    def _flagged(parts, i):
        s = pc.list_element(parts, i)
        present = pc.equal(pc.utf8_slice_codeunits(s, 0, 1), "1")
        body = pc.utf8_slice_codeunits(s, 1, 1 << 30)
        return pc.if_else(present, body, pa.scalar(None, pa.string()))

    def unpack(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b.column("m").combine_chunks(), "\x1f")
        val_str = _flagged(parts, 3)
        return pa.table({
            "user_id": pc.cast(b.column("user_id"), pa.int64()),
            "ts": pc.cast(pc.cast(pc.list_element(parts, 0), pa.int64()),
                          pa.timestamp("us")),
            "event_id": pc.cast(pc.list_element(parts, 1), pa.int64()),
            "event_type": _flagged(parts, 2),
            "value": pc.cast(val_str, pa.float64()),
        })

    return agg.map_batches(unpack, batch_format="pyarrow")


def q_transcripts_cluster_sample(sf_dir: str) -> Dataset:
    """CLUSTER sampling at the conversation grain (~20 % of convs, ALL
    their turns): the transcript-corpus sampling mode — row-level
    Bernoulli would shred conversations, so the keep/drop hash covers
    ONLY conv_id, deliberately inverting deterministic_sample's
    row-identity rule (whose docstring warns that key-only hashing
    keeps whole strata — here that is the point).  Embarrassingly
    parallel (a per-batch mask, no exchange), stable across
    partitionings, twin-replayed by the same md5 predicate."""
    from ..stages.partition import row_hash_hex, sample_threshold_hex

    FRAC, SEED = 0.2, 13
    threshold = sample_threshold_hex(FRAC)
    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role", "text"])

    def keep(b: pa.Table) -> pa.Table:
        # NULL conv_id rows can never be sampled (the twin's md5(NULL)
        # predicate is NULL → dropped) — filter first, also keeping the
        # dictionary-index gather integer-typed
        b = b.filter(pc.is_valid(b.column("conv_id")))
        convs = b.column("conv_id").combine_chunks().dictionary_encode()
        dvals = convs.dictionary.to_pylist()
        import numpy as np

        ok = np.array([row_hash_hex((c,), SEED)[:8] <= threshold
                       for c in dvals], bool)
        return b.filter(pa.array(
            ok[convs.indices.to_numpy(zero_copy_only=False)]))

    return ds.map_batches(keep, batch_format="pyarrow")


def q_events_hour_profile(sf_dir: str) -> Dataset:
    """Time-of-day activity profile (per-hour-of-day event counts and
    exact cent totals) — the modular-calendar grouping (hour-of-day,
    not hour timeline): one partial-agg exchange over a ≤24-row grid,
    finished by the tree combine.  Hour extraction is pure integer
    epoch arithmetic ((µs // 3.6e9) mod 24 — UTC, exactly DuckDB's
    date_part('hour'))."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts", "value"])
    HOUR_US = 3_600_000_000

    def partial(b: pa.Table) -> pa.Table:
        ts = b.column("ts").combine_chunks().cast(pa.int64())
        # a NULL ts groups under a NULL hour (date_part(NULL) is NULL
        # in the twin) — mask the modular arithmetic, count via a ones
        # column (count(c) would skip the NULL-hour group's rows)
        null_mask = ts.is_null().to_numpy(zero_copy_only=False) \
            if ts.null_count else None
        tsv = ts.fill_null(0).to_numpy(zero_copy_only=False)
        h = pa.array((tsv // HOUR_US) % 24, pa.int64(), mask=null_mask)
        cents = scaled_int_sql(b.column("value"), 100.0)
        g = pa.table({"hour": h,
                      "one": pa.array(np.ones(b.num_rows, np.int64)),
                      "c": pa.array(cents, pa.int64())}) \
            .group_by("hour").aggregate([("one", "sum"), ("c", "sum")])
        return g.rename_columns(["hour", "p_n", "p_c"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["hour"], [("p_n", "sum"), ("p_c", "sum")],
        ["hour", "p_n", "p_c"], ["hour", "n_events", "cents"])
    return agg.map_batches(
        lambda b: pa.table({
            "hour": b.column("hour"),
            "n_events": pc.cast(b.column("n_events"), pa.int64()),
            "sum_value": round_sql(pc.divide(pc.cast(
                b.column("cents"), pa.float64()), pa.scalar(100.0)), 2),
        }), batch_format="pyarrow")


def q_orders_customer_right_join(sf_dir: str) -> Dataset:
    """RIGHT OUTER join (completing the join-type matrix beside
    inner/left/full/anti/semi/asof/range/cross/fuzzy): per-customer
    order counts with every customer preserved — the aggregate side is
    pre-reduced to one row per customer BEFORE the join (the
    aggregate-then-join discipline from shipping_priority), so the
    outer join moves |customers| + |active customers| rows, never raw
    orders."""
    agg = with_schema(
        rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"])
        .map_batches(lambda b: (lambda g: g.rename_columns(
            ["o_custkey", "p_n"]))(
            b.group_by("o_custkey").aggregate([("o_custkey", "count")])),
            batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("p_n", alias_name="n_orders")),
        pa.schema([("o_custkey", pa.int64()), ("n_orders", pa.int64())]))
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_name"])
    j = agg.join(cust, join_type="right_outer", num_partitions=8,
                 on=("o_custkey",), right_on=("c_custkey",))
    return j.map_batches(
        lambda b: pa.table({
            "c_custkey": pc.cast(b.column("c_custkey"), pa.int64()),
            "c_name": b.column("c_name"),
            "n_orders": pc.cast(b.column("n_orders"), pa.int64()),
        }), batch_format="pyarrow")


def q_lineitem_weighted_avg(sf_dir: str) -> Dataset:
    """Grouped WEIGHTED mean (quantity-weighted average discount per
    return flag) from exact integer sums: Σ(disc_pct·qty) and Σ(qty)
    ride the shuffle as int64 partials, and the one float expression
    replays the twin's operand-cast order (float() the BIGINT before
    dividing — DuckDB casts operands, Python rounds the exact
    quotient)."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_discount",
                                  "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        d = scaled_int_sql(b.column("l_discount"), 100.0)
        qf = scaled_int_sql(b.column("l_quantity"), 1.0)
        g = pa.table({"l_returnflag": b.column("l_returnflag"),
                      "dq": pa.array(d * qf, pa.int64()),
                      "q": pa.array(qf, pa.int64())}) \
            .group_by("l_returnflag").aggregate(
                [("dq", "sum"), ("q", "sum")])
        return g.rename_columns(["l_returnflag", "p_dq", "p_q"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag"], [("p_dq", "sum"), ("p_q", "sum")],
        ["l_returnflag", "p_dq", "p_q"],
        ["l_returnflag", "s_dq", "s_q"])

    def finish(b: pa.Table) -> pa.Table:
        import numpy as np

        dq = b.column("s_dq").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = b.column("s_q").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "w_avg_discount": pa.array(dq / q / 100.0, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_lineitem_quantiles_tdigest(sf_dir: str) -> pa.Table:
    """t-digest APPROXIMATE quantiles beside the exact histogram twin
    (lineitem_quantiles): the mergeable-sketch scale path for
    unbounded/continuous domains, now under the driver contract as a
    rows-only entry (approximate by construction — pytest pins the
    error bound against the exact values instead of a SQL hash)."""
    from ..stages.quantiles import approx_quantiles

    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_extendedprice"])
    est = approx_quantiles(ds, "l_extendedprice", qs=(0.25, 0.5, 0.75))
    return pa.table({
        "q": pa.array(sorted(est), pa.float64()),
        "estimate": pa.array([est[k] for k in sorted(est)], pa.float64()),
    })


def q_events_type_share(sf_dir: str) -> Dataset:
    """Ratio-to-report (share-of-total per event type): counts and the
    corpus-wide share from ONE partial-agg exchange over the bounded
    type grid; the share's float division replays the twin's
    operand-cast order, everything upstream is int64."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["event_type"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("event_type").aggregate([("event_type", "count")])
        return g.rename_columns(["event_type", "p_n"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], [("p_n", "sum")],
        ["event_type", "p_n"], ["event_type", "n_events"])

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_events").to_numpy(zero_copy_only=False)
        total = int(n.sum())
        share = n.astype(np.float64) / total
        return pa.table({
            "event_type": b.column("event_type"),
            "n_events": pc.cast(b.column("n_events"), pa.int64()),
            "share": pa.array(share, pa.float64()),
        })

    # the grid is bounded (one row per type) — the final single block
    # legitimately holds the whole report, so total is in-task
    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_orders_orphans(sf_dir: str) -> pa.Table:
    """Referential-integrity audit (orders whose customer is missing)
    via the RIGHT ANTI join — the data-quality gate a pipeline runs
    before joining fact to dimension.  On this corpus the answer is
    legitimately EMPTY, which is the payload: Ray's anti join loses the
    schema on a 0-row result, so the audit collects through
    _small_table and falls back to a TYPED empty table the driver's
    schema compare accepts (the cross_source_dups empty-path
    discipline)."""
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey"])
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey"])
    j = cust.join(orders, join_type="right_anti", num_partitions=8,
                  on=("c_custkey",), right_on=("o_custkey",))
    tab = _small_table(j)
    if tab is None:
        return pa.table({"o_orderkey": pa.array([], pa.int64()),
                         "o_custkey": pa.array([], pa.int64())})
    return tab.select(["o_orderkey", "o_custkey"])


def q_events_user_growth(sf_dir: str) -> pa.Table:
    """Cumulative-distinct growth curve (per observed day: first-time
    users that day and the running total of distinct users ever seen) —
    the EXPANDING-window COUNT DISTINCT, which needs no window at all
    once each user is reduced to a first-seen day: one user-grain
    Min exchange, a bounded per-day count, and a calendar-bounded
    driver cumsum (≤ days rows, the legitimate _small_table case).
    The trick is the standard dedup-to-first-occurrence reduction;
    compare the rolling 7-day variant, whose window forces pair
    fan-out instead."""
    import numpy as np

    DAY_US = 86_400_000_000
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def first_partial(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(b.column("ts"), unit="day"),
                      pa.int64())
        g = pa.table({"user_id": b.column("user_id"), "d": day}) \
            .group_by("user_id").aggregate([("d", "min")])
        return g.rename_columns(["user_id", "p_d"])

    firsts = ds.map_batches(first_partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Min("p_d", alias_name="fd"))

    def day_partial(b: pa.Table) -> pa.Table:
        g = b.select(["fd"]).group_by("fd").aggregate([("fd", "count")])
        return g.rename_columns(["d", "p_n"])

    new_tab = _small_table(
        firsts.map_batches(day_partial, batch_format="pyarrow")
        .groupby("d").aggregate(Sum("p_n", alias_name="n_new")))
    days_tab = _small_table(
        ds.map_batches(
            lambda b: pa.table({"d": pc.cast(pc.floor_temporal(
                b.column("ts"), unit="day"), pa.int64())})
            .group_by("d").aggregate([]), batch_format="pyarrow")
        .groupby("d").aggregate(Count("d", alias_name="_m")))
    if days_tab is None:
        return pa.table({"day": pa.array([], pa.timestamp("us")),
                         "n_new_users": pa.array([], pa.int64()),
                         "cum_users": pa.array([], pa.int64())})
    days = np.sort(days_tab.column("d").to_numpy(zero_copy_only=False))
    new_by_day = dict(zip(new_tab.column("d").to_pylist(),
                          new_tab.column("n_new").to_pylist())) \
        if new_tab is not None else {}
    n_new = np.array([new_by_day.get(int(d), 0) for d in days], np.int64)
    return pa.table({
        "day": pa.array(days, pa.int64()).cast(pa.timestamp("us")),
        "n_new_users": pa.array(n_new, pa.int64()),
        "cum_users": pa.array(np.cumsum(n_new), pa.int64()),
    })


def q_transcripts_role_profile(sf_dir: str) -> Dataset:
    """Conversational-composition report (per role: turns, exact char
    totals, mean turn length) — the corpus profile a transcript
    pipeline prints before training: one partial-agg exchange over the
    bounded role grid; the mean's float division replays the twin's
    operand-cast order, everything upstream is int64 (NULL text counts
    len 0 via the twin's COALESCE)."""
    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["role", "text"])

    def partial(b: pa.Table) -> pa.Table:
        chars = pc.fill_null(pc.utf8_length(
            b.column("text").combine_chunks()), 0).cast(pa.int64())
        g = pa.table({"role": b.column("role"),
                      "c": chars,
                      "one": pa.array(np.ones(b.num_rows, np.int64))}) \
            .group_by("role").aggregate([("one", "sum"), ("c", "sum")])
        return g.rename_columns(["role", "p_n", "p_c"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["role"], [("p_n", "sum"), ("p_c", "sum")],
        ["role", "p_n", "p_c"], ["role", "n_turns", "total_chars"])

    def finish(b: pa.Table) -> pa.Table:
        c = b.column("total_chars").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = b.column("n_turns").to_numpy(zero_copy_only=False)
        return pa.table({
            "role": b.column("role"),
            "n_turns": pc.cast(b.column("n_turns"), pa.int64()),
            "total_chars": pc.cast(b.column("total_chars"), pa.int64()),
            "mean_chars": pa.array(c / n, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_events_median_gap(sf_dir: str) -> Dataset:
    """Per-user MEDIAN inter-event gap (the cadence metric behind
    sessionization-threshold tuning): LAG-style gaps and their grouped
    median FUSED into one co-partitioned pass — the group already holds
    the user's sorted events, so diff + the ceil(n·q)−1 pick run
    in-group and nothing exchanges twice.  Gaps are exact integer µs;
    users with a single event drop (no gap), like the twin's HAVING."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_id"])

    def median_gap(g: pa.Table) -> pa.Table:
        g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = g.column("ts").combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        if len(ts) < 2:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_gaps": pa.array([], pa.int64()),
                             "median_gap_us": pa.array([], pa.int64())})
        gaps = np.sort(np.diff(ts))
        idx = int(np.ceil(len(gaps) * 0.5)) - 1
        return pa.table({
            "user_id": g.column("user_id").slice(0, 1),
            "n_gaps": pa.array([len(gaps)], pa.int64()),
            "median_gap_us": pa.array([int(gaps[idx])], pa.int64()),
        })

    return ds.groupby("user_id").map_groups(median_gap,
                                            batch_format="pyarrow")


def q_events_type_transitions(sf_dir: str) -> pa.Table:
    """Per-user event-type TRANSITION MATRIX (the Markov-chain /
    next-action model a behavioural pipeline fits): for each user's
    event stream ordered by (ts, event_id), count every
    (prev_type → next_type) step, then the global transition
    probability p = n_trans / Σ n_trans from that prev_type.

    Scale shape: one groupby(user_id) co-partition; each user group
    emits its ≤ |types|² transition-count partial (vectorized shift +
    one Arrow group_by — no per-event Python), and the bounded
    (prev, next) key domain folds through tree_combine, never a
    sort-shuffle.  p is one IEEE division of two exact int64 counts —
    the same two ints the twin's window SUM produces — so the float is
    bit-identical by construction."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])

    def steps(g: pa.Table) -> pa.Table:
        g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        et = g.column("event_type").combine_chunks()
        if len(et) < 2:
            return pa.table({"prev_type": pa.array([], pa.string()),
                             "next_type": pa.array([], pa.string()),
                             "p_c": pa.array([], pa.int64())})
        t = pa.table({"prev_type": et.slice(0, len(et) - 1),
                      "next_type": et.slice(1),
                      "one": pa.array(np.ones(len(et) - 1, np.int64))})
        out = t.group_by(["prev_type", "next_type"]) \
            .aggregate([("one", "sum")])
        return out.rename_columns(["prev_type", "next_type", "p_c"])

    partials = ds.groupby("user_id").map_groups(steps,
                                                batch_format="pyarrow")
    counts = _tree_combine(partials, ["prev_type", "next_type"],
                           [("p_c", "sum")],
                           ["prev_type", "next_type", "p_c"],
                           ["prev_type", "next_type", "n_trans"])

    def probs(b: pa.Table) -> pa.Table:
        # single block (tree_combine ends repartition(1)): the per-prev
        # totals are a local group_by + dictionary lookup
        tot = b.group_by(["prev_type"]).aggregate([("n_trans", "sum")])
        m = dict(zip(tot.column("prev_type").to_pylist(),
                     tot.column("n_trans_sum").to_pylist()))
        n = b.column("n_trans").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        d = np.array([m[p] for p in b.column("prev_type").to_pylist()],
                     np.float64)
        return b.append_column("p", pa.array(n / d, pa.float64()))

    out = counts.map_batches(probs, batch_format="pyarrow",
                             batch_size=None)
    return _small_table(out)


def q_events_value_trend(sf_dir: str) -> pa.Table:
    """Grouped ORDINARY-LEAST-SQUARES trend per event type: the slope
    and intercept of value (exact cents) against the event's calendar
    day — the drift detector a metrics pipeline runs per segment.
    NULL values are excluded (SQL aggregate semantics).

    Parity design: every aggregate is an exact int64 sum (cents ×
    centered day), shipped as four partial sums per block; slope and
    intercept are then the SAME closed-form double expression over
    those ints in both engines — n·Sxy−Sx·Sy over n·Sxx−Sx², one IEEE
    evaluation each — so no float ever crosses an aggregation boundary.
    Day is centered on a fixed epoch (2024-01-01) to keep n·Sxy far
    from int64 range at 100× this scale."""
    import numpy as np

    EPOCH_DAY = 19723  # 2024-01-01 as days since 1970-01-01 (both sides)
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("value")))
        if b.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "p_n": pa.array([], pa.int64()),
                             "p_sx": pa.array([], pa.int64()),
                             "p_sy": pa.array([], pa.int64()),
                             "p_sxx": pa.array([], pa.int64()),
                             "p_sxy": pa.array([], pa.int64())})
        x = (pc.cast(b.column("ts").combine_chunks(), pa.int64())
             .to_numpy(zero_copy_only=False)
             // 86_400_000_000) - EPOCH_DAY
        y = scaled_int_sql(b.column("value"), 100.0)
        t = pa.table({"event_type": b.column("event_type"),
                      "n": pa.array(np.ones(len(x), np.int64)),
                      "sx": pa.array(x, pa.int64()),
                      "sy": pa.array(y, pa.int64()),
                      "sxx": pa.array(x * x, pa.int64()),
                      "sxy": pa.array(x * y, pa.int64())})
        g = t.group_by(["event_type"]).aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("sxy", "sum")])
        return g.rename_columns(
            ["event_type", "p_n", "p_sx", "p_sy", "p_sxx", "p_sxy"])

    sums = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        [("p_n", "sum"), ("p_sx", "sum"), ("p_sy", "sum"),
         ("p_sxx", "sum"), ("p_sxy", "sum")],
        ["event_type", "p_n", "p_sx", "p_sy", "p_sxx", "p_sxy"],
        ["event_type", "n", "sx", "sy", "sxx", "sxy"])

    def fit(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = b.column("sx").to_numpy(zero_copy_only=False).astype(np.float64)
        sy = b.column("sy").to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = b.column("sxx").to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = b.column("sxy").to_numpy(zero_copy_only=False).astype(np.float64)
        # the twin writes the IDENTICAL expression tree over the same
        # exact ints — double ops in the same order are bit-equal
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        return pa.table({"event_type": b.column("event_type"),
                         "n_events": b.column("n"),
                         "slope_cents_per_day": pa.array(slope,
                                                         pa.float64()),
                         "intercept_cents": pa.array(intercept,
                                                     pa.float64())})

    return _small_table(sums.map_batches(fit, batch_format="pyarrow",
                                         batch_size=None))


def q_embeddings_semantic_dedup(sf_dir: str) -> Dataset:
    """SemDeDup-style SEMANTIC dedup keep-list (Abbas et al. 2023):
    cluster the embedding space by cosine near-duplicate components and
    keep ONE representative (min vec_id) per semantic cluster — the
    embedding-space sibling of the text near-dup keep queries.  Output
    (vec_id, rep, keep): every vector labelled with its component
    representative and whether it survives the dedup.

    Composition of two already-hash-checked stages, end-to-end under
    the gate: the exact block-pair cosine grid (edges ≥ 0.4, the same
    threshold the embeddings_neardup oracle pins bit-exact) into the
    hybrid connected-components stage (driver union-find under the
    pair cap, min-label propagation beyond; same min-id reps);
    singletons are their own rep via a left join.  The twin replays pair generation + a WITH RECURSIVE
    transitive closure, so the cluster labels — not just the edges —
    are bit-checked."""
    from ..stages.dedup import connected_components, embedding_neardup_pairs

    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    pairs = embedding_neardup_pairs(ds, threshold=0.4)
    comp = with_schema(
        connected_components(pairs),
        pa.schema([("id", pa.int64()), ("rep", pa.int64())]))
    ids = rd.read_parquet(_t(sf_dir, "embeddings"), columns=["vec_id"])
    j = ids.join(comp, join_type="left_outer", num_partitions=8,
                 on=("vec_id",), right_on=("id",))

    def finish(b: pa.Table) -> pa.Table:
        rep = pc.cast(pc.coalesce(b.column("rep"), b.column("vec_id")),
                      pa.int64())
        return pa.table({"vec_id": b.column("vec_id"), "rep": rep,
                         "keep": pc.equal(rep, b.column("vec_id"))})

    return j.map_batches(finish, batch_format="pyarrow")


def q_documents_dup_spans(sf_dir: str) -> Dataset:
    """Duplicated-SPAN detection (the substring-level exact dedup of
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"): a token position is duplicated when its word-10-gram
    occurs at least twice in the corpus (same or another doc); per doc,
    merge the covered positions into maximal contiguous token runs and
    report (doc_id, n_spans, dup_tokens) — the rows a span-level dedup
    would cut out of each document.  Only docs containing at least one
    duplicated span appear.

    Scale shape: positional k-gram rows (vectorized — same shifted-take
    kernel as _doc_kgram_rows, plus the in-doc position), ONE
    groupby(sh) exchange whose groups self-report their occurrence
    count (≥ 2 ⇒ every member position is a hit, the group is the
    duplication evidence — no separate df pass or join), then one
    groupby(doc_id) co-partition merging hit positions into islands
    with a vectorized gap scan.  Everything is int64; the twin replays
    the islands with a LAG / SUM-OVER gaps-and-islands window."""
    import numpy as np

    K = 10
    hits = _dup_span_hits(sf_dir, K)

    def islands(g: pa.Table) -> pa.Table:
        p = np.sort(np.unique(
            g.column("pos").to_numpy(zero_copy_only=False)))
        # positions p1 < p2 cover contiguous tokens iff p2 - p1 <= K
        # (= K-1 overlap, = K back-to-back); a larger gap leaves an
        # uncovered token between spans
        brk = np.flatnonzero(np.diff(p) > K)
        s = p[np.concatenate([[0], brk + 1])]
        e = p[np.concatenate([brk, [len(p) - 1]])]
        return pa.table({
            "doc_id": pa.array([g.column("doc_id")[0].as_py()]
                               * len(s), pa.int64()),
            "n_spans": pa.array([len(s)] * len(s), pa.int64()),
            "dup_tokens": pa.array([int((e - s + K).sum())] * len(s),
                                   pa.int64())}).slice(0, 1)

    return hits.groupby("doc_id").map_groups(islands,
                                             batch_format="pyarrow")


def _dup_span_hits(sf_dir: str, K: int) -> Dataset:
    """Shared first half of the duplicated-span family: (doc_id, pos)
    for every token position that starts a word-K-gram occurring ≥ 2
    times in the corpus (within-doc repeats included, per Lee et al.
    2022).  One vectorized positional-k-gram pass, ONE groupby(sh)
    exchange whose groups self-report their occurrence count."""
    import numpy as np

    from ..stages.terms import _tokens

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def pos_rows(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.string())})
        b = b.set_column(b.schema.get_field_index("text"), "text",
                         pc.fill_null(b.column("text"), ""))
        _, lens, flat, offs = _tokens(b)
        tot = len(flat)
        intra = np.arange(tot) - np.repeat(offs[:-1], lens)
        starts = np.flatnonzero(intra <= np.repeat(lens, lens) - K)
        if len(starts) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.string())})
        cols = [flat.take(pa.array(starts + j, pa.int64()))
                for j in range(K)]
        sh = pc.binary_join_element_wise(*cols, " ")
        d = np.searchsorted(offs, starts, side="right") - 1
        ids = b.column("doc_id").combine_chunks() \
            .take(pa.array(d, pa.int64()))
        return pa.table({"doc_id": ids,
                         "pos": pa.array(intra[starts], pa.int64()),
                         "sh": sh})

    empty_hits = pa.table({"doc_id": pa.array([], pa.int64()),
                           "pos": pa.array([], pa.int64())})

    def dup_hits(g: pa.Table) -> pa.Table:
        # the group's row count IS the shingle's corpus occurrence
        # count — ≥ 2 means every member position sits in a duplicated
        # 10-gram (within-doc repeats included, per the paper)
        if g.num_rows < 2:
            return empty_hits
        return g.select(["doc_id", "pos"])

    return ds.map_batches(pos_rows, batch_format="pyarrow") \
        .groupby("sh").map_groups(dup_hits, batch_format="pyarrow")


DSIR_BUCKETS = 1024
DSIR_TARGET_SOURCE = "src0"


def _md5_buckets(flat, n_buckets: int):
    """md5-hashed feature buckets for a flat token column, ONE Python
    md5 per DISTINCT token per batch (dictionary_encode — the
    simhash_batch discipline): bucket = first 4 md5 bytes (big-endian)
    mod n_buckets, the exact integer the DuckDB twin's
    ``CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % B`` computes."""
    import hashlib

    import numpy as np

    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    enc = flat.dictionary_encode()
    vocab = enc.dictionary.to_pylist()
    if not vocab:
        return np.empty(0, np.int64)
    vb = np.fromiter(
        (int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")
         for s in vocab), dtype=np.int64, count=len(vocab))
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return (vb % n_buckets)[idx]


def q_documents_dsir_weights(sf_dir: str) -> Dataset:
    """DSIR data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public): score every
    document by how target-like its hashed-unigram bag is under two
    add-1-smoothed multinomials, log w(x) = Σ_tok [ln p_target(b(tok))
    − ln p_raw(b(tok))] over B=1024 md5 feature buckets; target = the
    ``src0`` feed, raw = the rest of the corpus.  Output (doc_id,
    n_tokens, dsir_logweight) for EVERY document — selection is a
    downstream ORDER BY / weighted sampler over the weight column.

    Scale shape: TWO corpus scans and NO shuffle.  Pass 1 reduces each
    batch to (bucket, target_n, raw_n) partials — B is structurally
    bounded, so the combine is the tree path — and the B-entry
    quantized log-likelihood-ratio table broadcasts through ONE
    ``ray.put``; pass 2 scores each batch with a bincount segment sum.
    Bit-exactness: everything order-dependent rides int64 — per-bucket
    ``ln(n+1)`` quantized at 1e6 (scaled_int_sql ≡ DuckDB ROUND) and the
    per-doc Σ llr_q — with one final /1e6 float expression written
    token-identically in the twin."""
    import math

    import numpy as np

    B = DSIR_BUCKETS
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text", "source"])

    def part_counts(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        nl = pc.list_value_length(toks).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        is_t = pc.equal(b.column("source"), DSIR_TARGET_SOURCE) \
            .to_numpy(zero_copy_only=False)
        bk = _md5_buckets(flat, B)
        tok_t = np.repeat(is_t, nl)
        tn = np.bincount(bk[tok_t], minlength=B)
        rn = np.bincount(bk[~tok_t], minlength=B)
        return pa.table({
            "bucket": pa.array(np.arange(B, dtype=np.int64)),
            "p_t": pa.array(tn.astype(np.int64)),
            "p_r": pa.array(rn.astype(np.int64))})

    cnt = _tree_combine(
        ds.map_batches(part_counts, batch_format="pyarrow"),
        ["bucket"], [("p_t", "sum"), ("p_r", "sum")],
        ["bucket", "p_t", "p_r"], ["bucket", "tn", "rn"])
    tbl = _small_table(cnt)
    tn = np.zeros(B, np.int64)
    rn = np.zeros(B, np.int64)
    bks = tbl.column("bucket").to_numpy(zero_copy_only=False)
    tn[bks] = tbl.column("tn").to_numpy(zero_copy_only=False)
    rn[bks] = tbl.column("rn").to_numpy(zero_copy_only=False)
    big_t, big_r = int(tn.sum()), int(rn.sum())
    llr_q = (scaled_int_sql(np.log(tn + 1.0), 1e6)
             - scaled_int_sql(np.log(rn + 1.0), 1e6))
    cq = int(scaled_int_sql(np.array([math.log(big_r + B)]), 1e6)[0]
             - scaled_int_sql(np.array([math.log(big_t + B)]), 1e6)[0])
    ref = ray.put(llr_q)

    def score(b: pa.Table) -> pa.Table:
        llr = ray.get(ref)
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        nl = pc.list_value_length(toks).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        bk = _md5_buckets(flat, B)
        doc_idx = np.repeat(np.arange(len(nl)), nl)
        # the float64 segment sum is EXACT: |llr_q| ≤ ln(2^63)·1e6 ≈
        # 4.4e7 and per-doc token counts keep |Σ| far below 2^53
        if len(bk):
            sq = np.rint(np.bincount(
                doc_idx, weights=llr[bk].astype(np.float64),
                minlength=len(nl))).astype(np.int64)
        else:
            sq = np.zeros(len(nl), np.int64)
        n_tok = nl.astype(np.int64)
        w = (sq + n_tok * cq).astype(np.float64) / 1e6
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array(n_tok),
            "dsir_logweight": round_sql(pa.array(w, pa.float64()), 6)})

    return ds.map_batches(score, batch_format="pyarrow")


def q_documents_pmi_bigrams(sf_dir: str) -> Dataset:
    """Collocation mining by pointwise mutual information (Church &
    Hanks 1990 — public): adjacent-token bigrams with corpus support
    ≥ 5, scored pmi = ln(p(x,y) / (p(x)·p(y))) with p(x,y) = c_xy/P
    (P = total bigram tokens) and p(x) = c_x/N (N = total tokens).
    Output (tok_a, tok_b, n_pair, pmi).

    Scale shape: the bigram and unigram count tables are (term,
    partial-count) exchanges — in-batch ``group_by`` partials first, so
    only distinct terms ride the shuffle; the ≥5 support filter prunes
    the bigram table BEFORE its two unigram joins (hash joins, never
    broadcast — vocabulary is unbounded).  Bit-exactness: pmi is a sum
    of FIVE int64 ln·1e6-quantized terms (pair count, two
    unigram counts, the two corpus totals), one final /1e6 float
    expression in both engines."""
    import numpy as np

    from ..stages.terms import _tokens

    MIN_PAIR = 5
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def bigram_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"tok_a": pa.array([], pa.string()),
                             "tok_b": pa.array([], pa.string()),
                             "p_n": pa.array([], pa.int64())})
        _, lens, flat, offs = _tokens(b)
        tot = len(flat)
        intra = np.arange(tot) - np.repeat(offs[:-1], lens)
        starts = np.flatnonzero(intra <= np.repeat(lens, lens) - 2)
        t = pa.table({
            "tok_a": flat.take(pa.array(starts, pa.int64())),
            "tok_b": flat.take(pa.array(starts + 1, pa.int64()))})
        g = t.group_by(["tok_a", "tok_b"]).aggregate([("tok_a", "count")])
        return g.rename_columns(["tok_a", "tok_b", "p_n"])

    bg = with_schema(
        ds.map_batches(bigram_partial, batch_format="pyarrow")
        .groupby(["tok_a", "tok_b"]).aggregate(Sum("p_n",
                                                   alias_name="n_pair")),
        pa.schema([("tok_a", pa.string()), ("tok_b", pa.string()),
                   ("n_pair", pa.int64())]))

    def uni_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        g = pa.table({"tok": flat}).group_by("tok") \
            .aggregate([("tok", "count")])
        return g.rename_columns(["tok", "p_n"])

    tf = with_schema(
        ds.map_batches(uni_partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("p_n", alias_name="c")),
        pa.schema([("tok", pa.string()), ("c", pa.int64())]))

    n_tok = int(tf.sum("c"))
    n_bg = int(bg.sum("n_pair"))
    qn = int(scaled_int_sql(np.array([np.log(float(n_tok))]), 1e6)[0])
    qp = int(scaled_int_sql(np.array([np.log(float(n_bg))]), 1e6)[0])
    const_q = 2 * qn - qp

    # with_schema again after the filter: the 0-row blocks the support
    # floor leaves behind break the join exactly like empty aggregate
    # partitions do (reproduced; the pin drops them at the ref level)
    sel = with_schema(
        bg.map_batches(
            lambda b: b.filter(pc.greater_equal(b.column("n_pair"),
                                                MIN_PAIR)),
            batch_format="pyarrow"),
        pa.schema([("tok_a", pa.string()), ("tok_b", pa.string()),
                   ("n_pair", pa.int64())]))
    fa = tf.map_batches(
        lambda b: pa.table({"tok_a": b.column("tok"),
                            "ca": b.column("c")}),
        batch_format="pyarrow")
    fb = tf.map_batches(
        lambda b: pa.table({"tok_b": b.column("tok"),
                            "cb": b.column("c")}),
        batch_format="pyarrow")
    j = with_schema(
        sel.join(with_schema(fa, pa.schema([("tok_a", pa.string()),
                                            ("ca", pa.int64())])),
                 join_type="inner", num_partitions=8, on=("tok_a",)),
        pa.schema([("tok_a", pa.string()), ("tok_b", pa.string()),
                   ("n_pair", pa.int64()), ("ca", pa.int64())]))
    j2 = j.join(with_schema(fb, pa.schema([("tok_b", pa.string()),
                                           ("cb", pa.int64())])),
                join_type="inner", num_partitions=8, on=("tok_b",))

    def finish(b: pa.Table) -> pa.Table:
        np_ = b.column("n_pair").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ca = b.column("ca").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cb = b.column("cb").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = (scaled_int_sql(np.log(np_), 1e6)
             - scaled_int_sql(np.log(ca), 1e6)
             - scaled_int_sql(np.log(cb), 1e6)) + const_q
        pmi = q.astype(np.float64) / 1e6
        return pa.table({
            "tok_a": b.column("tok_a"), "tok_b": b.column("tok_b"),
            "n_pair": b.column("n_pair"),
            "pmi": round_sql(pa.array(pmi, pa.float64()), 6)})

    return j2.map_batches(finish, batch_format="pyarrow")


def _source_term_counts(sf_dir: str) -> Dataset:
    """(source, tok, c) global term counts — the shared first exchange
    of the per-feed corpus statistics (Good–Turing, Zipf): in-batch
    ``group_by`` partials so only distinct (source, tok) pairs ride
    the ONE shuffle."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["text", "source"])

    def part(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        nl = pc.list_value_length(toks).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        src = b.column("source").combine_chunks().take(
            pa.array(np.repeat(np.arange(b.num_rows), nl), pa.int64()))
        g = pa.table({"source": src, "tok": flat}) \
            .group_by(["source", "tok"]).aggregate([("tok", "count")])
        return pa.table({"source": g.column("source"),
                         "tok": g.column("tok"),
                         "p_n": pc.cast(g.column("tok_count"),
                                        pa.int64())})

    return ds.map_batches(part, batch_format="pyarrow") \
        .groupby(["source", "tok"]).aggregate(Sum("p_n", alias_name="c"))


def q_documents_gt_unseen(sf_dir: str) -> Dataset:
    """Good–Turing missing-mass estimate per source feed (Good 1953;
    the first step of Gale–Sampson smoothing — public): the probability
    that the NEXT token drawn from a feed is a previously-unseen word
    ≈ n_hapax / n_tokens (hapax legomena = words seen exactly once).
    The per-feed vocabulary-saturation report a curation pipeline reads
    before deciding whether a source needs more crawling.  Output
    (source, n_tokens, n_types, n_hapax, gt_unseen_mass).

    Scale shape: ONE (source, tok) exchange carrying in-batch partial
    counts, then a bounded per-source tree combine over the distinct
    term table; exact int64 end-to-end with a single final division."""
    import numpy as np

    tf = _source_term_counts(sf_dir)

    def src_partial(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy(zero_copy_only=False)
        t = pa.table({"source": b.column("source"),
                      "p_tok": pa.array(c.astype(np.int64)),
                      "p_typ": pa.array(np.ones(len(c), np.int64)),
                      "p_hap": pa.array((c == 1).astype(np.int64))})
        g = t.group_by("source").aggregate(
            [("p_tok", "sum"), ("p_typ", "sum"), ("p_hap", "sum")])
        return g.rename_columns(["source", "p_tok", "p_typ", "p_hap"])

    agg = _tree_combine(
        tf.map_batches(src_partial, batch_format="pyarrow"),
        ["source"], [("p_tok", "sum"), ("p_typ", "sum"), ("p_hap", "sum")],
        ["source", "p_tok", "p_typ", "p_hap"],
        ["source", "n_tokens", "n_types", "n_hapax"])

    def finish(b: pa.Table) -> pa.Table:
        h = b.column("n_hapax").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = b.column("n_tokens").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "source": b.column("source"),
            "n_tokens": pc.cast(b.column("n_tokens"), pa.int64()),
            "n_types": pc.cast(b.column("n_types"), pa.int64()),
            "n_hapax": pc.cast(b.column("n_hapax"), pa.int64()),
            "gt_unseen_mass": round_sql(pa.array(h / n, pa.float64()), 6)})

    return _small_table(agg.map_batches(finish, batch_format="pyarrow",
                                        batch_size=None))


def q_documents_neardup_keep_best(sf_dir: str) -> Dataset:
    """Near-dup KEEP-BEST selection — the CCNet/C4-style policy of
    retaining the LONGEST member of every near-duplicate cluster
    instead of the smallest id: clusters are the exact-Jaccard
    component labels of :func:`q_documents_neardup_components`, the
    winner per cluster is max ``n_chars`` with min ``doc_id`` breaking
    ties.  Output (doc_id, rep, n_chars, keep) for every document.

    Scale shape: on top of the component labels, the election is a
    partial-agg arg-min over a lexically-sortable packed key — the
    only extra exchanges carry (rep, 25-byte key) and the (rep,
    winner) join; document text never moves.  The twin replays the
    recursive closure plus a ROW_NUMBER window, so the kept SET — not
    just the labels — is hash-checked."""
    import numpy as np

    comp = with_schema(
        q_documents_neardup_components(sf_dir),
        pa.schema([("doc_id", pa.int64()), ("rep", pa.int64())]))
    docs = rd.read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "n_chars"])
    j = with_schema(
        comp.join(docs, join_type="inner", num_partitions=8,
                  on=("doc_id",)),
        pa.schema([("doc_id", pa.int64()), ("rep", pa.int64()),
                   ("n_chars", pa.int64())]))

    # pack (max n_chars, min doc_id) into ONE Min-able key: zero-padded
    # inverted length, then zero-padded id — Min over the string IS the
    # arg-max-length / arg-min-id election
    INV = 999_999_999_999

    def pack_partial(b: pa.Table) -> pa.Table:
        inv = pc.subtract(pa.scalar(INV, pa.int64()), b.column("n_chars"))
        inv_s = pc.utf8_lpad(pc.cast(inv, pa.string()), 12, "0")
        id_s = pc.utf8_lpad(pc.cast(b.column("doc_id"), pa.string()),
                            12, "0")
        packed = pc.binary_join_element_wise(inv_s, id_s, "|")
        t = pa.table({"rep": b.column("rep"), "packed": packed})
        g = t.group_by("rep").aggregate([("packed", "min")])
        return g.rename_columns(["rep", "p_min"])

    win = with_schema(
        j.map_batches(pack_partial, batch_format="pyarrow")
        .groupby("rep").aggregate(Min("p_min", alias_name="w")),
        pa.schema([("rep", pa.int64()), ("w", pa.string())]))

    def unpack(b: pa.Table) -> pa.Table:
        wid = pc.cast(pc.utf8_slice_codeunits(b.column("w"), 13, 25),
                      pa.int64())
        return pa.table({"rep": b.column("rep"), "win_id": wid})

    winners = with_schema(
        win.map_batches(unpack, batch_format="pyarrow"),
        pa.schema([("rep", pa.int64()), ("win_id", pa.int64())]))
    out = j.join(winners, join_type="inner", num_partitions=8,
                 on=("rep",))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": b.column("doc_id"), "rep": b.column("rep"),
            "n_chars": b.column("n_chars"),
            "keep": pc.equal(b.column("doc_id"), b.column("win_id"))})

    return out.map_batches(finish, batch_format="pyarrow")


def q_documents_char_entropy(sf_dir: str) -> Dataset:
    """Character-entropy quality gate — the cheap gibberish / binary /
    encoding-damage detector a text-quality stack runs before
    tokenization (low entropy ⇒ repeated-char padding, high ⇒ random
    bytes): per-doc Shannon entropy over characters,
    H = ln n − (Σ_c k_c·ln k_c)/n.  Output (doc_id, n_chars,
    char_entropy).

    Scale shape: ONE map_batches pass — a per-doc metric, no shuffle.
    ASCII batches (this corpus) are scored straight off the Arrow
    string data buffer: np.frombuffer plus one np.unique over
    doc_idx·256+byte keys — zero Python per row; a batch containing
    any non-ASCII byte falls back to a per-row codepoint Counter with
    the identical arithmetic (DuckDB's '' split is per CODEPOINT, so
    the byte fast path is only valid when byte ≡ codepoint).  The
    empty string splits to [''] in DuckDB — one char of count 1 —
    handled on both paths.  Bit-exactness: the Σ k·(ln k quantized at 1e6) rides
    int64; ln n enters once in the final float expression, written
    token-identically in the twin."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        txt = b.column("text").combine_chunks()
        n_docs = len(txt)
        if n_docs == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_chars": pa.array([], pa.int64()),
                             "char_entropy": pa.array([], pa.float64())})
        off_dtype = np.int64 if pa.types.is_large_string(txt.type) \
            else np.int32
        offs = np.frombuffer(txt.buffers()[1], dtype=off_dtype)[
            txt.offset:txt.offset + n_docs + 1].astype(np.int64)
        data = np.frombuffer(txt.buffers()[2], dtype=np.uint8)[
            offs[0]:offs[-1]]
        lens = np.diff(offs)
        if data.size == 0 or data.max() < 128:
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            keys, k = np.unique(doc_idx * 256 + data, return_counts=True)
            q = scaled_int_sql(np.log(k.astype(np.float64)), 1e6)
            s = np.zeros(n_docs, np.float64)
            if len(keys):
                # exact in float64: |k·q| ≤ n·ln(n)·1e6 ≪ 2^53 per doc
                s = np.bincount(keys // 256,
                                weights=k.astype(np.float64) * q,
                                minlength=n_docs)
            s = np.rint(s).astype(np.int64)
            # '' splits to [''] in the twin: one char, k=1, ln k = 0 —
            # so n=1 and s=0 for empty docs
            n = np.where(lens == 0, 1, lens).astype(np.int64)
        else:
            from collections import Counter

            s_list, n_list = [], []
            for t in txt.to_pylist():
                cnt = Counter(t) if t else Counter({"": 1})
                k = np.array(list(cnt.values()), np.float64)
                s_list.append(int(
                    (k * scaled_int_sql(np.log(k), 1e6)).sum()))
                n_list.append(int(k.sum()))
            s = np.array(s_list, np.int64)
            n = np.array(n_list, np.int64)
        nf = n.astype(np.float64)
        h = np.log(nf) - (s.astype(np.float64) / 1e6) / nf
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_chars": pa.array(n),
            "char_entropy": round_sql(pa.array(h, pa.float64()), 6)})

    return ds.map_batches(score, batch_format="pyarrow")


def q_documents_dup_spans_removed(sf_dir: str) -> Dataset:
    """Duplicated-span REMOVAL — the actual cleaning transform of Lee
    et al. 2022 (the :func:`q_documents_dup_spans` report tells you
    what it WOULD cut; this cuts it): every token position covered by a
    corpus-duplicated word-10-gram is dropped and the survivors are
    re-joined, per document.  Output (doc_id, clean_text, n_kept,
    n_removed) for EVERY document (clean docs pass through whole;
    fully-duplicated docs come back as '').

    Scale shape: the shared hits pass (one groupby(sh) exchange), one
    groupby(doc_id) co-partition folding hit positions into disjoint
    coverage islands — only (doc_id, s, e) triples ride it — and one
    LEFT join back onto the corpus scan where the rebuild is pure
    Arrow: a global boolean mask over the flat token buffer, one
    ``take`` of the survivors, and a C-level ``binary_join`` per doc.
    Text crosses the wire exactly once (the join's doc side)."""
    import numpy as np

    from ..stages.terms import _tokens

    K = 10
    hits = _dup_span_hits(sf_dir, K)

    def cover(g: pa.Table) -> pa.Table:
        p = np.sort(np.unique(
            g.column("pos").to_numpy(zero_copy_only=False)))
        brk = np.flatnonzero(np.diff(p) > K)
        s = p[np.concatenate([[0], brk + 1])]
        e = p[np.concatenate([brk, [len(p) - 1]])]
        # island [s, e] of k-gram STARTS covers tokens s .. e+K-1
        # (gap ≤ K ⇒ contiguous coverage, the dup_spans invariant);
        # serialized "s:e,s:e" — Acero's hash join rejects list-typed
        # payload columns ("Data type list<int64> is not supported in
        # join non-key field")
        spans = ",".join(f"{a}:{z}" for a, z in zip(s, e))
        return pa.table({
            "doc_id": pa.array([g.column("doc_id")[0].as_py()],
                               pa.int64()),
            "spans": pa.array([spans], pa.string())})

    cov = with_schema(
        hits.groupby("doc_id").map_groups(cover, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("spans", pa.string())]))
    docs = rd.read_parquet(_t(sf_dir, "documents"),
                           columns=["doc_id", "text"])
    j = docs.join(cov, join_type="left_outer", num_partitions=8,
                  on=("doc_id",))

    def rebuild(b: pa.Table) -> pa.Table:
        _, lens, flat, offs = _tokens(b)
        tot = int(offs[-1])
        mask = np.zeros(tot, bool)
        sp = b.column("spans").combine_chunks()
        valid = np.flatnonzero(~sp.is_null().to_numpy(
            zero_copy_only=False))
        for i in valid:
            base = offs[i]
            for isl in sp[int(i)].as_py().split(","):
                a, z = isl.split(":")
                mask[base + int(a):base + int(z) + K] = True
        keep = np.flatnonzero(~mask)
        counts = np.bincount(
            np.searchsorted(offs, keep, side="right") - 1,
            minlength=len(lens)).astype(np.int64)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        kept_flat = flat.take(pa.array(keep, pa.int64()))
        lists = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(counts)]),
                     pa.int32()), kept_flat)
        clean = pc.binary_join(lists, " ")
        return pa.table({
            "doc_id": b.column("doc_id"),
            "clean_text": pc.fill_null(clean, ""),
            "n_kept": pa.array(counts),
            "n_removed": pa.array(lens - counts)})

    return j.map_batches(rebuild, batch_format="pyarrow")


def q_documents_zipf_slope(sf_dir: str) -> Dataset:
    """Zipf rank-frequency fingerprint per source feed (Zipf 1949;
    the Gerlach & Altmann-style corpus diagnostic): OLS of ln(count)
    on ln(rank) over each feed's term-frequency table — natural prose
    sits near slope −1, templated or boilerplate-heavy feeds flatten,
    so the slope is a one-number naturalness screen per source.
    Output (source, n_types, zipf_slope, zipf_intercept).

    Scale shape: ONE (source, tok, partial-count) exchange (in-batch
    group_by first), then each source's term table ranks and fits
    entirely IN-GROUP (one map_groups — vocabulary per feed, never the
    corpus, is what sorts).  Bit-exactness: ln(rank)/ln(count) are
    int64-quantized at 1e3 (keeping Σx², Σxy far inside int64), the
    moment sums are exact ints, and the final slope/intercept tree is
    written with the identical double-conversion order as the twin —
    rank ties break on the token string in both engines."""
    import numpy as np

    tf = _source_term_counts(sf_dir)

    def fit(g: pa.Table) -> pa.Table:
        g = g.sort_by([("c", "descending"), ("tok", "ascending")])
        c = g.column("c").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = len(c)
        r = np.arange(1, n + 1, dtype=np.float64)
        x = scaled_int_sql(np.log(r), 1e3)
        y = scaled_int_sql(np.log(c), 1e3)
        sx, sy = int(x.sum()), int(y.sum())
        sxx, sxy = int((x * x).sum()), int((x * y).sum())
        nf, sxf, syf = float(n), float(sx), float(sy)
        sxxf, sxyf = float(sxx), float(sxy)
        # identical expression tree to the twin — double ops in the
        # same order are bit-equal (the grouped-OLS discipline)
        slope = (nf * sxyf - sxf * syf) / (nf * sxxf - sxf * sxf)
        intercept = (syf - slope * sxf) / nf / 1000.0
        return pa.table({
            "source": g.column("source").slice(0, 1),
            "n_types": pa.array([n], pa.int64()),
            "zipf_slope": pa.array([round_sql_f(slope, 6)],
                                   pa.float64()),
            "zipf_intercept": pa.array([round_sql_f(intercept, 6)],
                                       pa.float64())})

    return tf.groupby("source").map_groups(fit, batch_format="pyarrow")


def q_documents_neardup_cluster_sizes(sf_dir: str) -> Dataset:
    """Near-dup cluster-size histogram — the dedup-impact report read
    before committing to a keep policy (how much of the corpus sits in
    clusters of 2, of 3, …; singletons = the untouched mass): component
    labels from :func:`q_documents_neardup_components`, then
    (cluster_size → n_clusters, n_docs).

    Scale shape: one partial-count exchange keyed by rep (members per
    cluster), then the histogram itself is a bounded tree combine —
    cluster sizes are small integers.  Exact int64 throughout."""
    comp = with_schema(
        q_documents_neardup_components(sf_dir),
        pa.schema([("doc_id", pa.int64()), ("rep", pa.int64())]))

    def per_rep_partial(b: pa.Table) -> pa.Table:
        g = b.select(["rep"]).group_by("rep").aggregate([("rep", "count")])
        return pa.table({"rep": g.column("rep"),
                         "p_n": pc.cast(g.column("rep_count"), pa.int64())})

    members = with_schema(
        comp.map_batches(per_rep_partial, batch_format="pyarrow")
        .groupby("rep").aggregate(Sum("p_n", alias_name="n_members")),
        pa.schema([("rep", pa.int64()), ("n_members", pa.int64())]))

    def hist_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"cluster_size": b.column("n_members"),
                      "p_c": pa.array([1] * b.num_rows, pa.int64()),
                      "p_d": b.column("n_members")})
        g = t.group_by("cluster_size").aggregate(
            [("p_c", "sum"), ("p_d", "sum")])
        return g.rename_columns(["cluster_size", "p_c", "p_d"])

    return _small_table(_tree_combine(
        members.map_batches(hist_partial, batch_format="pyarrow"),
        ["cluster_size"], [("p_c", "sum"), ("p_d", "sum")],
        ["cluster_size", "p_c", "p_d"],
        ["cluster_size", "n_clusters", "n_docs"]))


def q_revenue_by_nation(sf_dir: str) -> Dataset:
    """TPC-H-Q5-shaped SIX-table pipeline: 1996 revenue by nation for
    ASIA customers served by a supplier of the SAME nation — the widest
    join composition in the catalog (region ⋈ nation ⋈ customer ⋈
    orders ⋈ lineitem ⋈ supplier).

    Scale shape — each fact table moves exactly once, every dimension
    rides a broadcast:
      * region/nation collapse to a ≤25-entry nation map on the driver
        (dim tables, the documented take_all exemption);
      * supplier is dim-sized (1/15th of customers in TPC-H), so its
        (suppkey → nationkey) map is ONE ``ray.put``, looked up
        vectorized (``pc.index_in``) inside the lineitem scan — no
        supplier shuffle;
      * orders is date-pruned in its scan and hash-joined with the
        nation-filtered customer projection (both raw streams, the
        shipping_priority discipline);
      * lineitem pre-aggregates exact int64 revenue per (orderkey,
        supp_nation) IN-BATCH before its join, so the second join ships
        partials, not raw lineitems.
    Revenue is the shipping_priority quantization (extendedprice 2 dp ×
    discount 2 dp is exact at 4 dp); the one float division replays the
    twin's HUGEINT→DOUBLE cast order.  Reference analogue: the
    multi-dimension rollups of SURVEY §2.6 A1 composed with the §2.5
    join matrix."""
    import numpy as np
    import pyarrow.parquet as pq

    REGION = "ASIA"
    nat = pq.read_table(_t(sf_dir, "nation"),
                        columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = pq.read_table(_t(sf_dir, "region"),
                        columns=["r_regionkey", "r_name"])
    region_keys = {int(k) for k, r in
                   zip(reg.column("r_regionkey").to_pylist(),
                       reg.column("r_name").to_pylist()) if r == REGION}
    nation_name = {int(k): n for k, n, rk in
                   zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist(),
                       nat.column("n_regionkey").to_pylist())
                   if int(rk) in region_keys}
    nat_set = pa.array(sorted(nation_name), pa.int64())

    sup = pq.read_table(_t(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup.column("s_suppkey").combine_chunks().cast(pa.int64())
    sn = sup.column("s_nationkey").combine_chunks().cast(pa.int64())
    in_region = pc.is_in(sn, value_set=nat_set)
    sup_ref = ray.put((sk.filter(in_region), sn.filter(in_region)))

    LO = pa.scalar(np.datetime64("1996-01-01", "us"))
    HI = pa.scalar(np.datetime64("1997-01-01", "us"))
    orders = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(
            lambda b: b.filter(pc.and_(
                pc.greater_equal(b.column("o_orderdate"), LO),
                pc.less(b.column("o_orderdate"), HI)))
            .select(["o_orderkey", "o_custkey"]),
            batch_format="pyarrow")

    cust = rd.read_parquet(
        _t(sf_dir, "customer"),
        columns=["c_custkey", "c_nationkey"]) \
        .map_batches(
            lambda b: pa.table({
                "c_custkey": b.column("c_custkey"),
                "c_nat": pc.cast(b.column("c_nationkey"), pa.int64()),
            }).filter(pc.is_in(
                pc.cast(b.column("c_nationkey"), pa.int64()),
                value_set=nat_set)),
            batch_format="pyarrow")

    # pin the first join's schema before the second: empty join-1
    # partitions emit schema-less blocks that break join 2 (the chained
    # sparse-join hazard; with_schema moves refs only, and the join is
    # already an all-to-all barrier, so nothing stops streaming)
    oc = with_schema(
        orders.join(cust, join_type="inner", num_partitions=8,
                    on=("o_custkey",), right_on=("c_custkey",))
        .map_batches(lambda b: b.select(["o_orderkey", "c_nat"]),
                     batch_format="pyarrow"),
        pa.schema([("o_orderkey", pa.int64()), ("c_nat", pa.int64())]))

    def line_partial(b: pa.Table) -> pa.Table:
        supk, supn = ray.get(sup_ref)
        pos = pc.index_in(b.column("l_suppkey").combine_chunks()
                          .cast(pa.int64()), value_set=supk)
        keep = pos.is_valid()
        f = b.filter(keep)
        s_nat = pc.take(supn, pos.filter(keep))
        rev = scaled_int_sql(
            pc.multiply(f.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    f.column("l_discount"))), 10000.0)
        g = pa.table({"l_orderkey": f.column("l_orderkey"),
                      "s_nat": s_nat,
                      "r": pa.array(rev, pa.int64())}) \
            .group_by(["l_orderkey", "s_nat"]).aggregate([("r", "sum")])
        return g.rename_columns(["l_orderkey", "s_nat", "p_r"])

    rev = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey",
                 "l_extendedprice", "l_discount"]) \
        .map_batches(line_partial, batch_format="pyarrow")

    j = oc.join(rev, join_type="inner", num_partitions=8,
                on=("o_orderkey",), right_on=("l_orderkey",))

    def nation_partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("c_nat"), b.column("s_nat")))
        g = pa.table({"nat": f.column("c_nat"), "r": f.column("p_r")}) \
            .group_by("nat").aggregate([("r", "sum")])
        return g.rename_columns(["nat", "p_r"])

    agg = _tree_combine(
        j.map_batches(nation_partial, batch_format="pyarrow"),
        ["nat"], [("p_r", "sum")], ["nat", "p_r"], ["nat", "s_r"])

    def finish(b: pa.Table) -> pa.Table:
        names = pa.array([nation_name[int(k)]
                          for k in b.column("nat").to_pylist()],
                         pa.string())
        return pa.table({
            "n_name": names,
            "revenue": pc.divide(pc.cast(b.column("s_r"), pa.float64()),
                                 pa.scalar(10000.0)),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


#: Gopher-style stopword list (Rae et al. 2021 §A1.1 use
#: {the,be,to,of,and,that,have,with}; this corpus's closed vocabulary
#: contains only 'the' and 'a' as function words, so the list is the
#: Gopher set with 'a'/'in' swapped in for the two absent items — the
#: RULE (≥2 distinct stopwords) is what's under test, and it binds in
#: both directions on this corpus).
GOPHER_STOPWORDS = ["the", "a", "of", "and", "to", "in", "be", "that"]


def q_documents_gopher_gate(sf_dir: str) -> Dataset:
    """The full Gopher document-quality rule set (Rae et al. 2021
    §A1.1) as ONE vectorized pass — word-count window, mean-word-length
    window, alphabetic-word fraction, and the ≥2-distinct-stopwords
    rule, composed into a keep flag.  (The repetition rules live in
    q_documents_repetition; together they are the complete gate.)

    Scale shape: embarrassingly parallel — zero exchanges, every rule
    computed off the Arrow string buffers (split_pattern + reduceat per
    doc boundary; stopword identity via ONE index_in against the
    8-entry list, per-doc distinctness as an 8-bit mask bitwise_or
    reduceat).  The two float ratios are single divisions of exact
    int64 counts in the twin's cast order."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    stop_arr = pa.array(GOPHER_STOPWORDS, pa.string())

    def gate(b: pa.Table) -> pa.Table:
        txt = b.column("text").combine_chunks()
        toks = pc.split_pattern(txt, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        starts, n = offs[:-1], np.diff(offs).astype(np.int64)
        flat = pc.list_flatten(toks)
        lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sum_len = np.add.reduceat(lens, starts) if len(lens) \
            else np.zeros(len(n), np.int64)
        alpha = pc.match_substring_regex(flat, "[a-z]") \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        n_alpha = np.add.reduceat(alpha, starts) if len(alpha) \
            else np.zeros(len(n), np.int64)
        pos = pc.index_in(flat, value_set=stop_arr)
        bits = np.left_shift(
            np.int64(1), pos.fill_null(8).to_numpy(zero_copy_only=False)
            .astype(np.int64)) & 0xFF  # sentinel bit 8 masks to 0
        masks = np.bitwise_or.reduceat(bits, starts) if len(bits) \
            else np.zeros(len(n), np.int64)
        n_stop = np.unpackbits(masks.astype(np.uint8)).reshape(-1, 8) \
            .sum(axis=1).astype(np.int64)
        nf = n.astype(np.float64)
        mean_len = sum_len.astype(np.float64) / nf
        alpha_frac = n_alpha.astype(np.float64) / nf
        keep = ((n >= 30) & (n <= 100_000)
                & (mean_len >= 3.0) & (mean_len <= 10.0)
                & (alpha_frac >= 0.8) & (n_stop >= 2))
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_words": pa.array(n, pa.int64()),
            "mean_word_len": pa.array(mean_len, pa.float64()),
            "alpha_frac": pa.array(alpha_frac, pa.float64()),
            "n_stop": pa.array(n_stop, pa.int64()),
            "keep": pa.array(keep),
        })

    return ds.map_batches(gate, batch_format="pyarrow")


#: BM25 query-set size.  The query set is the LOWEST-seeded-md5 K docs
#: — an ABSOLUTE audit-sized cap, not a corpus fraction, because every
#: downstream bound (broadcast vocabulary, score fanout, the (q, doc)
#: exchange) is proportional to |queries|: a 2 % sample would mean 20k
#: queries at 1M docs and ~10¹⁰ score rows at web scale.  LIMIT-by-hash
#: is a pure row-identity rule the oracle replays (ORDER BY md5 LIMIT).
BM25_QUERIES = 24


def q_documents_bm25_topk(sf_dir: str) -> Dataset:
    """BM25 top-5 retrieval (Robertson/Sparck-Jones probabilistic
    ranking, k1=1.2, b=0.75): the BM25_QUERIES lowest-hash docs play
    the query set, and every query retrieves its 5 highest-scoring
    OTHER documents — the retrieval primitive under RAG corpus
    construction and quality-by-retrievability audits.

    Scale shape: the corpus moves twice, shuffles once.  Pass 1 is one
    (term, df) + (N, Σdl) partial pass tree-combined over the QUERY
    vocabulary only (bounded by the audit-sized query set, never the
    corpus vocabulary); its output — query term list, per-term idf,
    avgdl — is ONE ray.put broadcast.  Pass 2 scores in-batch: tokens
    hit the broadcast vocabulary via index_in, per-(doc, term) tf
    comes from one np.unique over packed int keys, the per-term score
    factor is computed ONCE per (doc, term) and fanned out to the
    queries sharing the term (CSR-style repeat — no Python loops), and
    only (query, doc, partial-score) rows enter the single groupby.
    The per-query top-5 runs in map_groups on ≤|corpus| rows per
    query.

    Bit-exactness: idf is 1e-6-quantized int64; each (query, doc,
    term) contribution is ROUNDed to int64 exactly as the twin writes
    it, so the summed score is order-independent; ranks tie-break on
    doc_id.  Floats cross no aggregation boundary."""
    import numpy as np

    from ..stages.partition import row_hash_hex

    K1, B, TOPK = 1.2, 0.75, 5
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def add_h(b: pa.Table) -> pa.Table:
        h = pa.array([row_hash_hex((i,), 11)
                      for i in b.column("doc_id").to_pylist()],
                     pa.string())
        return b.append_column("h", h)

    qdocs = _small_table(_topk_combine(
        ds.map_batches(add_h, batch_format="pyarrow"),
        sorted_topk([("h", "ascending"), ("doc_id", "ascending")],
                    BM25_QUERIES))) \
        .sort_by([("h", "ascending"), ("doc_id", "ascending")]) \
        .slice(0, BM25_QUERIES)
    qids = qdocs.column("doc_id").to_pylist()
    qterm_sets = [set(t.split(" ")) for t in
                  qdocs.column("text").to_pylist()]
    vocab = sorted(set().union(*qterm_sets)) if qterm_sets else []
    vocab_arr = pa.array(vocab, pa.string())
    V = len(vocab)
    out_schema = pa.schema([("query_id", pa.int64()),
                            ("rank", pa.int64()),
                            ("doc_id", pa.int64()),
                            ("score", pa.int64())])
    if V == 0:  # nothing sampled into the query set at this scale
        return rd.from_arrow(out_schema.empty_table())

    # pass 1: df over the query vocabulary + corpus totals, one
    # bounded tree combine ('' sentinel row carries N and Σdl)
    def df_partial(b: pa.Table) -> pa.Table:
        txt = b.column("text").combine_chunks()
        toks = pc.split_pattern(txt, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        n = np.diff(offs).astype(np.int64)
        flat = pc.list_flatten(toks)
        pos = pc.index_in(flat, value_set=vocab_arr)
        hit = pos.is_valid().to_numpy(zero_copy_only=False)
        posv = pos.fill_null(0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        doc_idx = np.repeat(np.arange(len(n)), n)
        key = doc_idx[hit] * V + posv[hit]
        uk = np.unique(key)
        terms = pa.concat_arrays(
            [pc.take(vocab_arr, pa.array(uk % V, pa.int64())),
             pa.array([""], pa.string())])
        zeros = np.zeros(len(uk), np.int64)
        return pa.table({
            "tok": terms,
            "p_df": pa.array(np.append(zeros + 1, 0), pa.int64()),
            "p_n": pa.array(np.append(zeros, b.num_rows), pa.int64()),
            "p_tok": pa.array(np.append(zeros, int(n.sum())),
                              pa.int64()),
        })

    stats = _small_table(_tree_combine(
        ds.map_batches(df_partial, batch_format="pyarrow"),
        ["tok"], [("p_df", "sum"), ("p_n", "sum"), ("p_tok", "sum")],
        ["tok", "p_df", "p_n", "p_tok"], ["tok", "df", "n", "tot"]))
    srows = {r["tok"]: r for r in stats.to_pylist()}
    N = int(srows[""]["n"])
    avgdl = float(srows[""]["tot"]) / float(N)
    qidf = np.zeros(V, np.int64)
    for i, t in enumerate(vocab):
        df = int(srows[t]["df"]) if t in srows else 0
        qidf[i] = scaled_int_sql(
            np.array([np.log(((N - df) + 0.5) / (df + 0.5) + 1.0)]),
            1e6)[0]

    # SEMANTIC rule, mirrored in the twin's WHERE qidf <> 0: terms
    # whose quantized idf is 0 contribute round(0·base) = 0 to every
    # score, but at web scale they are exactly the df≈N stop-terms
    # whose fanout dominates the scoring pass — so they are excluded
    # BY RULE on both sides (the ubiq-cap discipline), not truncated.
    keep = qidf != 0
    if not keep.all():
        vocab = [t for t, k in zip(vocab, keep) if k]
        vocab_arr = pa.array(vocab, pa.string())
        qidf = qidf[keep]
        V = len(vocab)
        if V == 0:
            return rd.from_arrow(out_schema.empty_table())

    # CSR expansion term → queries containing it
    term_qids = [[] for _ in range(V)]
    vpos = {t: i for i, t in enumerate(vocab)}
    for qid, ts in zip(qids, qterm_sets):
        for t in ts:
            if t in vpos:  # pruned zero-idf terms carry no queries
                term_qids[vpos[t]].append(qid)
    starts = np.zeros(V + 1, np.int64)
    for i in range(V):
        starts[i + 1] = starts[i] + len(term_qids[i])
    qids_flat = np.array([x for lst in term_qids for x in lst],
                         np.int64)
    bcast = ray.put((vocab_arr, qidf, starts, qids_flat, avgdl))

    def score_batch(b: pa.Table) -> pa.Table:
        vocab_a, qidf_a, st, qf, adl = ray.get(bcast)
        txt = b.column("text").combine_chunks()
        toks = pc.split_pattern(txt, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        n = np.diff(offs).astype(np.int64)
        flat = pc.list_flatten(toks)
        pos = pc.index_in(flat, value_set=vocab_a)
        hit = pos.is_valid().to_numpy(zero_copy_only=False)
        posv = pos.fill_null(0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        doc_idx = np.repeat(np.arange(len(n)), n)
        key = doc_idx[hit] * len(qidf_a) + posv[hit]
        uk, tf = np.unique(key, return_counts=True)
        if not len(uk):
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "p_s": pa.array([], pa.int64())})
        ud, ut = uk // len(qidf_a), uk % len(qidf_a)
        dl = n[ud]
        # float association replays the twin token-for-token:
        # (qidf * (tf * 2.2)) / den — and the literal 2.2, not K1+1.0,
        # which is one ulp off in IEEE
        den = tf + K1 * ((1.0 - B) + B * (dl / adl))
        c = scaled_int_sql((qidf_a[ut] * (tf * 2.2)) / den, 1.0)
        cnt = (st[ut + 1] - st[ut]).astype(np.int64)
        rep = np.repeat(np.arange(len(uk)), cnt)
        flat_ix = np.arange(int(cnt.sum())) \
            - np.repeat(np.cumsum(cnt) - cnt, cnt) \
            + np.repeat(st[ut], cnt)
        q_of_row = qf[flat_ix]
        docs = b.column("doc_id").to_numpy(zero_copy_only=False)
        d_of_row = docs[ud[rep]]
        keep = q_of_row != d_of_row
        g = pa.table({"query_id": pa.array(q_of_row[keep], pa.int64()),
                      "doc_id": pa.array(d_of_row[keep], pa.int64()),
                      "c": pa.array(c[rep][keep], pa.int64())}) \
            .group_by(["query_id", "doc_id"]).aggregate([("c", "sum")])
        return g.rename_columns(["query_id", "doc_id", "p_s"])

    scored = ds.map_batches(score_batch, batch_format="pyarrow") \
        .groupby(["query_id", "doc_id"]) \
        .aggregate(Sum("p_s", alias_name="score"))

    def top5(g: pa.Table) -> pa.Table:
        s = g.sort_by([("score", "descending"), ("doc_id", "ascending")])
        s = s.slice(0, TOPK)
        return pa.table({
            "query_id": pc.cast(s.column("query_id"), pa.int64()),
            "rank": pa.array(range(1, s.num_rows + 1), pa.int64()),
            "doc_id": pc.cast(s.column("doc_id"), pa.int64()),
            "score": pc.cast(s.column("score"), pa.int64()),
        })

    return scored.groupby("query_id").map_groups(
        top5, batch_format="pyarrow")


#: Covariance quantization: ROUND(v * 2^20) keeps the per-pair product
#: under 2^40, so int64 sums hold exactly to ~2^23 rows.  The 100 TB
#: path drops to 2^16 (or shards the row range and widens the combine)
#: — quantization is the knob, the pipeline shape doesn't change.
COV_QUANT = float(1 << 20)


def q_embeddings_covariance(sf_dir: str) -> Dataset:
    """Exact distributed covariance matrix of the embedding columns —
    the one-pass building block under PCA / whitening / correlation
    screening.  Upper triangle only (cov is symmetric), 1-based dims
    to match SQL subscripts.

    Scale shape: one corpus pass; each batch contributes one d×d int64
    Gram partial (numpy matmul over the zero-copy vec_matrix view) plus
    per-dim sums and a row count, flattened to a bounded d(d+1)/2-row
    grid that tree-combines — no raw vectors shuffle.  Covariance
    itself is evaluated only at the end, as the identical float
    expression the twin writes ((Σxy/n) − (Σx/n)(Σy/n), each operand
    an exact int64 cast to double), so nothing float crosses an
    aggregation boundary."""
    import numpy as np

    from ..util import vec_matrix

    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    def gram_partial(b: pa.Table) -> pa.Table:
        X = vec_matrix(b.column("embedding"))
        q = scaled_int_sql(X.ravel(), COV_QUANT).reshape(X.shape)
        d = q.shape[1]
        G = q.T @ q
        s = q.sum(axis=0)
        iu, ju = np.triu_indices(d)
        sx = np.where(iu == ju, s[iu], 0)
        pn = np.where((iu == 0) & (ju == 0), b.num_rows, 0)
        return pa.table({
            "dim_i": pa.array(iu + 1, pa.int64()),
            "dim_j": pa.array(ju + 1, pa.int64()),
            "p_xy": pa.array(G[iu, ju], pa.int64()),
            "p_x": pa.array(sx, pa.int64()),
            "p_n": pa.array(pn, pa.int64()),
        })

    agg = _tree_combine(
        ds.map_batches(gram_partial, batch_format="pyarrow"),
        ["dim_i", "dim_j"],
        [("p_xy", "sum"), ("p_x", "sum"), ("p_n", "sum")],
        ["dim_i", "dim_j", "p_xy", "p_x", "p_n"],
        ["dim_i", "dim_j", "s_xy", "s_x", "s_n"])

    def finish(b: pa.Table) -> pa.Table:
        di = b.column("dim_i").to_numpy(zero_copy_only=False)
        dj = b.column("dim_j").to_numpy(zero_copy_only=False)
        sxy = b.column("s_xy").to_numpy(zero_copy_only=False)
        sx_diag = b.column("s_x").to_numpy(zero_copy_only=False)
        n = float(b.column("s_n").to_numpy(zero_copy_only=False).sum())
        d = int(di.max())
        sums = np.zeros(d + 1, np.int64)
        diag = di == dj
        sums[di[diag]] = sx_diag[diag]
        cov = (sxy.astype(np.float64) / n
               - (sums[di].astype(np.float64) / n)
               * (sums[dj].astype(np.float64) / n)) \
            / (COV_QUANT * COV_QUANT)
        return pa.table({
            "dim_i": pa.array(di, pa.int64()),
            "dim_j": pa.array(dj, pa.int64()),
            "cov": pa.array(cov, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_embeddings_pca(sf_dir: str) -> pa.Table:
    """Distributed PCA (top-4 principal axes + explained-variance
    ratios) over the exact covariance pipeline: the corpus contributes
    ONE pass of int64 Gram partials (q_embeddings_covariance's shape);
    only the d×d matrix reaches the driver, where the symmetric eigen
    solve is O(d³) scalar work.  Sign convention: each component's
    largest-|loading| entry is made positive (eigenvectors are
    sign-ambiguous).  Rows-only (iterative/numeric — no SQL eigen);
    pytest pins it against numpy.cov+eigh on the raw table."""
    import numpy as np

    rows = _small_table(q_embeddings_covariance(sf_dir)).to_pylist()
    d = max(r["dim_i"] for r in rows)
    C = np.zeros((d, d), np.float64)
    for r in rows:
        C[r["dim_i"] - 1, r["dim_j"] - 1] = r["cov"]
        C[r["dim_j"] - 1, r["dim_i"] - 1] = r["cov"]
    w, v = np.linalg.eigh(C)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    total = float(w.sum())
    k = min(4, d)
    out = {"component": [], "dim": [], "loading": [],
           "explained_ratio": []}
    for c in range(k):
        vec = v[:, c]
        if vec[np.argmax(np.abs(vec))] < 0:
            vec = -vec
        out["component"].extend([c + 1] * d)
        out["dim"].extend(range(1, d + 1))
        out["loading"].extend(vec.tolist())
        out["explained_ratio"].extend([float(w[c]) / total] * d)
    return pa.table({
        "component": pa.array(out["component"], pa.int64()),
        "dim": pa.array(out["dim"], pa.int64()),
        "loading": pa.array(out["loading"], pa.float64()),
        "explained_ratio": pa.array(out["explained_ratio"],
                                    pa.float64()),
    })


def q_events_rank_gaps(sf_dir: str) -> Dataset:
    """RANK() window (WITH gaps — ties share a rank and the next rank
    skips past them; the last member of the events window family beside
    DENSE_RANK / PERCENT_RANK / NTILE / ROW_NUMBER-shaped orderings).
    rank(v) = #rows with value strictly greater + 1, computed per type
    from one vectorized unique + suffix-cumsum of tie counts — the
    dense_rank co-location contract, no per-row work."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def rank(g: pa.Table) -> pa.Table:
        v = g.column("value").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(v, return_counts=True)  # ascending
        # rows strictly greater than uniq[i] = suffix sum of counts
        greater = np.concatenate(
            ([0], np.cumsum(counts[::-1])[:-1]))[::-1]
        rnk = greater[np.searchsorted(uniq, v)] + 1
        return g.append_column("rnk", pa.array(rnk, pa.int64()))

    return ds.groupby("event_type").map_groups(rank,
                                               batch_format="pyarrow")


def q_embeddings_pca_project(sf_dir: str) -> Dataset:
    """Dimensionality reduction as a pipeline stage: project every
    embedding onto the corpus's top-4 principal axes (the
    q_embeddings_pca loadings, mean-centered) — the compression step
    ahead of semantic dedup / clustering at scale.  The d×4 loading
    matrix and the mean vector are ONE ray.put broadcast; projection
    is one matmul per batch over the zero-copy vec_matrix view.
    Rows-only (inherits the eigen solve); pytest pins per-component
    projection variance to the covariance pipeline's eigenvalues."""
    import numpy as np

    from ..util import vec_matrix

    pca = q_embeddings_pca(sf_dir)
    d = int(pc.max(pca.column("dim")).as_py())
    k = int(pc.max(pca.column("component")).as_py())
    L = np.zeros((d, k), np.float64)
    for r in pca.to_pylist():
        L[r["dim"] - 1, r["component"] - 1] = r["loading"]

    ds0 = rd.read_parquet(_t(sf_dir, "embeddings"),
                          columns=["vec_id", "embedding"])

    # mean from int64-quantized per-ROW sums (the label_centroids
    # discipline) so the result is block-layout-independent — a float
    # partial sum would drift with batch boundaries
    MQ = float(1 << 30)

    def mean_partial(b: pa.Table) -> pa.Table:
        X = vec_matrix(b.column("embedding"))
        q = scaled_int_sql(X.ravel(), MQ).reshape(X.shape)
        return pa.table({
            "dim": pa.array(np.arange(1, X.shape[1] + 1), pa.int64()),
            "p_s": pa.array(q.sum(axis=0), pa.int64()),
            "p_n": pa.array([b.num_rows] + [0] * (X.shape[1] - 1),
                            pa.int64()),
        })

    mt = _small_table(_tree_combine(
        ds0.map_batches(mean_partial, batch_format="pyarrow"),
        ["dim"], [("p_s", "sum"), ("p_n", "sum")],
        ["dim", "p_s", "p_n"], ["dim", "s", "n"]))
    n = float(pc.sum(mt.column("n")).as_py())
    mean = np.zeros(d, np.float64)
    for r in mt.to_pylist():
        mean[r["dim"] - 1] = float(r["s"]) / (MQ * n)
    bcast = ray.put((L, mean))

    def project(b: pa.Table) -> pa.Table:
        Lm, mu = ray.get(bcast)
        X = vec_matrix(b.column("embedding")) - mu
        P = X @ Lm
        cols = {"vec_id": b.column("vec_id")}
        for c in range(Lm.shape[1]):
            cols[f"pc{c + 1}"] = pa.array(P[:, c], pa.float64())
        return pa.table(cols)

    return ds0.map_batches(project, batch_format="pyarrow")


def q_events_lead_next(sf_dir: str) -> Dataset:
    """LEAD window shape (``LEAD(ts) OVER (PARTITION BY user ORDER BY
    ts)``): per event, the NEXT event's ts and time-to-next in exact
    integer microseconds (NULL on each user's last event) — the
    forward twin of q_events_lag_delta, the dwell-time / churn-signal
    primitive.  Same vectorized shift in the per-key sorted group."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts"])

    def lead(g: pa.Table) -> pa.Table:
        g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = g.column("ts").combine_chunks().cast(pa.int64()) \
             .to_numpy(zero_copy_only=False)
        nxt = np.empty_like(ts)
        nxt[:-1] = ts[1:]
        mask = np.zeros(len(ts), dtype=bool)
        if len(ts):
            mask[-1] = True
            nxt[-1] = 0
        nxt_arr = pa.array(nxt, pa.int64(), mask=mask)
        gap = pa.array(nxt - ts, pa.int64(), mask=mask)
        return pa.table({
            "event_id": g.column("event_id"),
            "user_id": g.column("user_id"),
            "ts": g.column("ts"),
            "next_ts": nxt_arr.cast(pa.timestamp("us")),
            "next_gap_us": gap,
        })

    return ds.groupby("user_id").map_groups(lead, batch_format="pyarrow")


def q_events_winsorized_mean(sf_dir: str) -> Dataset:
    """Winsorized mean per event type (clamp values into the type's own
    exact [p05, p95] before averaging) — the robust-mean companion to
    the median/MAD outlier filter: outliers are bounded, not dropped,
    so n stays fixed.

    Scale shape: the grouped exact-quantile histogram pass (one
    (type, cents, count) exchange) computes the per-type clamp bounds;
    they broadcast as a tiny dict and ONE more scan clamps + sums exact
    int64 cents — raw events never shuffle.  The single float division
    replays the twin's operand-cast order."""
    import numpy as np

    from ..stages.quantiles import grouped_exact_quantiles

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "value"])
    qs = grouped_exact_quantiles(ds, "event_type", "value",
                                 (0.05, 0.95))
    bounds = {}
    for r in (qs.to_pylist() if isinstance(qs, pa.Table)
              else qs.take_all()):
        bounds[r["event_type"]] = r
    lo = {k: scaled_int_sql(np.array([v["q5"]]), 100.0)[0]
          for k, v in bounds.items()}
    hi = {k: scaled_int_sql(np.array([v["q95"]]), 100.0)[0]
          for k, v in bounds.items()}
    keys = sorted(lo)
    key_arr = pa.array(keys, pa.string())
    lo_np = np.array([lo[k] for k in keys], np.int64)
    hi_np = np.array([hi[k] for k in keys], np.int64)

    def partial(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b.column("event_type").combine_chunks(),
                          value_set=key_arr) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cents = scaled_int_sql(b.column("value"), 100.0)
        clamped = np.clip(cents, lo_np[idx], hi_np[idx])
        g = pa.table({"event_type": b.column("event_type"),
                      "c": pa.array(clamped, pa.int64()),
                      "one": pa.array(np.ones(b.num_rows, np.int64))}) \
            .group_by("event_type").aggregate(
                [("c", "sum"), ("one", "sum")])
        return g.rename_columns(["event_type", "p_c", "p_n"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], [("p_c", "sum"), ("p_n", "sum")],
        ["event_type", "p_c", "p_n"], ["event_type", "s_c", "s_n"])

    def finish(b: pa.Table) -> pa.Table:
        c = b.column("s_c").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = b.column("s_n").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": b.column("event_type"),
            "n_events": pa.array(n, pa.int64()),
            "winsorized_mean": pa.array(c / n / 100.0, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_documents_ngram_novelty(sf_dir: str) -> Dataset:
    """Per-document n-gram NOVELTY (the memorization/duplication-risk
    complement of the contamination family): the fraction of a doc's
    distinct word-5-grams that occur in NO other doc (corpus document
    frequency 1).  Low novelty = boilerplate-heavy / near-duplicate
    prone; the Lee-et-al dup-span family flags positions, this scores
    documents.

    Scale shape: one vectorized k-gram pass, ONE groupby(sh) whose
    (Count, Min(doc_id)) aggregate answers both "how many docs share
    this gram" and "who owns it when unique" — no map_groups dispatch,
    no join back to the corpus; per-doc totals and novel counts then
    merge in a single groupby(doc_id) over unioned partials.  The
    novelty ratio is the twin's one float division."""
    import numpy as np

    K = 5
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    sa = ds.map_batches(_doc_kgram_rows("doc_id", K),
                        batch_format="pyarrow").materialize()

    def tot_partial(b: pa.Table) -> pa.Table:
        g = b.select(["doc_id"]).group_by("doc_id") \
            .aggregate([("doc_id", "count")])
        g = g.rename_columns(["doc_id", "p_tot"])
        return g.append_column(
            "p_nov", pa.array(np.zeros(g.num_rows, np.int64)))

    totals = sa.map_batches(tot_partial, batch_format="pyarrow")

    dfagg = with_schema(
        sa.groupby("sh").aggregate(Count("sh", alias_name="c"),
                                   Min("doc_id", alias_name="d")),
        pa.schema([("sh", pa.string()), ("c", pa.int64()),
                   ("d", pa.int64())]))

    def nov_partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("c"), 1))
        g = f.select(["d"]).group_by("d").aggregate([("d", "count")])
        g = g.rename_columns(["doc_id", "p_nov"])
        return pa.table({
            "doc_id": g.column("doc_id"),
            "p_tot": pa.array(np.zeros(g.num_rows, np.int64)),
            "p_nov": pc.cast(g.column("p_nov"), pa.int64()),
        })

    novel = dfagg.map_batches(nov_partial, batch_format="pyarrow")

    agg = totals.union(novel).groupby("doc_id").aggregate(
        Sum("p_tot", alias_name="n_grams"),
        Sum("p_nov", alias_name="n_novel"))

    def finish(b: pa.Table) -> pa.Table:
        tot = b.column("n_grams").to_numpy(zero_copy_only=False)
        nov = b.column("n_novel").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "n_grams": pa.array(tot, pa.int64()),
            "n_novel": pa.array(nov, pa.int64()),
            "novelty": pa.array(nov.astype(np.float64) / tot,
                                pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_documents_vocab_coverage(sf_dir: str) -> pa.Table:
    """Vocabulary coverage curve: what fraction of all corpus TOKENS
    the top-k most frequent terms cover, at k = 1,2,4,…,64 — the
    tokenizer-budget / vocabulary-pruning planning curve (how small a
    vocab still covers the stream).

    Scale shape: one (term, count) exchange; the curve needs only the
    top-64 terms (per-block top-k partials — only 64 rows per block
    move after the groupby) plus one scalar total.  Deterministic
    ordering (count DESC, term ASC) makes every prefix sum exact;
    coverage is the twin's single float division."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])
    KS = [1, 2, 4, 8, 16, 32, 64]

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text").combine_chunks(), " ")
        flat = pc.list_flatten(toks)
        g = pa.table({"tok": flat}).group_by("tok") \
            .aggregate([("tok", "count")])
        return g.rename_columns(["tok", "p_n"])

    counts = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("p_n", alias_name="cnt")),
        pa.schema([("tok", pa.string()), ("cnt", pa.int64())])) \
        .materialize()

    total = int(counts.aggregate(Sum("cnt"))["sum(cnt)"])
    top = _small_table(_topk_combine(
        counts, sorted_topk([("cnt", "descending"),
                             ("tok", "ascending")], max(KS))))
    cnts = top.sort_by([("cnt", "descending"), ("tok", "ascending")]) \
        .column("cnt").to_numpy(zero_copy_only=False)
    cum = np.cumsum(cnts)
    rows = {"k": [], "covered_tokens": [], "coverage": []}
    for k in KS:
        covered = int(cum[min(k, len(cum)) - 1]) if len(cum) else 0
        rows["k"].append(k)
        rows["covered_tokens"].append(covered)
        rows["coverage"].append(float(covered) / float(total))
    return pa.table({
        "k": pa.array(rows["k"], pa.int64()),
        "covered_tokens": pa.array(rows["covered_tokens"], pa.int64()),
        "coverage": pa.array(rows["coverage"], pa.float64()),
    })


def q_documents_source_vocab_overlap(sf_dir: str) -> pa.Table:
    """Pairwise vocabulary Jaccard between ingest feeds — the
    source-similarity triage view beside cross_source_dups (rows) and
    source_kl (distribution drift): which feeds speak the same
    vocabulary.

    Scale shape: NO pairwise join over tokens.  Distinct (source, tok)
    rows take one exchange; each term's source-SET then packs into an
    int64 BITMASK (sources are feed-bounded) by a second exchange
    whose Sum over globally-distinct rows IS bitwise-OR; the per-MASK
    histogram tree-combines (grid ≤ #distinct masks ≤ vocabulary), and
    every pairwise intersection / union is numpy popcount arithmetic
    on that tiny grid at the driver.  Jaccard is the twin's one float
    division."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "text"])

    def src_partial(b: pa.Table) -> pa.Table:
        g = b.select(["source"]).group_by("source") \
            .aggregate([("source", "count")])
        return g.rename_columns(["source", "p_n"])

    src_t = _small_table(_tree_combine(
        ds.map_batches(src_partial, batch_format="pyarrow"),
        ["source"], [("p_n", "sum")], ["source", "p_n"],
        ["source", "n"]))
    sources = sorted(src_t.column("source").to_pylist())
    src_arr = pa.array(sources, pa.string())
    S = len(sources)
    if S > 63:
        raise ValueError(
            f"source_vocab_overlap: {S} sources exceed the int64 "
            "bitmask (63); shard the source set or fall back to a "
            "(tok, source)-pair self-join for this corpus")

    def pair_rows(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text").combine_chunks(), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        n = np.diff(offs)
        flat = pc.list_flatten(toks)
        sidx = pc.index_in(b.column("source").combine_chunks(),
                           value_set=src_arr) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        st = pa.table({"source": pa.array(np.repeat(sidx, n),
                                          pa.int64()),
                       "tok": flat})
        # per-batch dedupe; global distinctness comes from the groupby
        g = st.group_by(["source", "tok"]).aggregate([("tok", "count")])
        return g.select(["source", "tok"]) \
            .rename_columns(["src_bit", "tok"])

    st = ds.map_batches(pair_rows, batch_format="pyarrow") \
        .groupby(["src_bit", "tok"]) \
        .aggregate(Count("tok", alias_name="_c"))

    def mask_partial(b: pa.Table) -> pa.Table:
        bits = np.left_shift(
            np.int64(1),
            b.column("src_bit").to_numpy(zero_copy_only=False)
            .astype(np.int64))
        g = pa.table({"tok": b.column("tok"),
                      "p_m": pa.array(bits, pa.int64())}) \
            .group_by("tok").aggregate([("p_m", "sum")])
        return g.rename_columns(["tok", "p_m"])

    masks = with_schema(
        st.map_batches(mask_partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("p_m", alias_name="mask")),
        pa.schema([("tok", pa.string()), ("mask", pa.int64())]))

    def hist_partial(b: pa.Table) -> pa.Table:
        g = b.select(["mask"]).group_by("mask") \
            .aggregate([("mask", "count")])
        return g.rename_columns(["mask", "p_n"])

    grid = _small_table(_tree_combine(
        masks.map_batches(hist_partial, batch_format="pyarrow"),
        ["mask"], [("p_n", "sum")], ["mask", "p_n"], ["mask", "n"]))
    mv = grid.column("mask").to_numpy(zero_copy_only=False)
    mn = grid.column("n").to_numpy(zero_copy_only=False)

    has = [(mv >> i) & 1 == 1 for i in range(S)]
    nv = [int(mn[has[i]].sum()) for i in range(S)]
    out = {"source_a": [], "source_b": [], "vocab_a": [],
           "vocab_b": [], "shared": [], "jaccard": []}
    for i in range(S):
        for j in range(i + 1, S):
            c = int(mn[has[i] & has[j]].sum())
            if c == 0:
                continue  # the twin's inner join emits no 0-share row
            out["source_a"].append(sources[i])
            out["source_b"].append(sources[j])
            out["vocab_a"].append(nv[i])
            out["vocab_b"].append(nv[j])
            out["shared"].append(c)
            out["jaccard"].append(float(c) / float(nv[i] + nv[j] - c))
    return pa.table({
        "source_a": pa.array(out["source_a"], pa.string()),
        "source_b": pa.array(out["source_b"], pa.string()),
        "vocab_a": pa.array(out["vocab_a"], pa.int64()),
        "vocab_b": pa.array(out["vocab_b"], pa.int64()),
        "shared": pa.array(out["shared"], pa.int64()),
        "jaccard": pa.array(out["jaccard"], pa.float64()),
    })


def q_documents_canary_scan(sf_dir: str) -> Dataset:
    """Canary-string scan (Carlini-style memorization probes): count,
    for each canary phrase, how many corpus documents contain it as a
    substring.  The canary set is derived deterministically — the
    first 8 tokens of each of the 16 LOWEST-seeded-md5 docs (seed 13)
    — so the oracle replays it (ORDER BY md5 LIMIT); in production it
    would be the secret list.  An ABSOLUTE cap, not a corpus fraction:
    the scan runs one substring pass per canary, so |canaries| must
    not grow with the corpus (a 1 % sample would mean 10k passes at
    1M docs).

    Scale shape: canaries broadcast once (the set is audit-sized); one
    corpus scan runs ONE vectorized match_substring per canary (RE2-
    free literal match, C-level) and emits only (canary_id, partial
    count) rows into a bounded tree combine."""
    import numpy as np

    from ..stages.partition import row_hash_hex

    N_CANARIES = 16
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def add_h(b: pa.Table) -> pa.Table:
        h = pa.array([row_hash_hex((i,), 13)
                      for i in b.column("doc_id").to_pylist()],
                     pa.string())
        return b.append_column("h", h)

    sample = _small_table(_topk_combine(
        ds.map_batches(add_h, batch_format="pyarrow"),
        sorted_topk([("h", "ascending"), ("doc_id", "ascending")],
                    N_CANARIES)))
    canaries = []
    for cid, txt in zip(sample.column("doc_id").to_pylist(),
                        sample.column("text").to_pylist()):
        toks = txt.split(" ")[:8]
        canaries.append((int(cid), " ".join(toks)))
    out_schema = pa.schema([("canary_id", pa.int64()),
                            ("n_docs", pa.int64())])
    if not canaries:
        return rd.from_arrow(out_schema.empty_table())
    bcast = ray.put(canaries)

    def scan(b: pa.Table) -> pa.Table:
        cs = ray.get(bcast)
        txt = b.column("text").combine_chunks()
        ids, hits = [], []
        for cid, pat in cs:
            m = pc.match_substring(txt, pat)
            ids.append(cid)
            hits.append(int(pc.sum(pc.cast(m, pa.int64())).as_py() or 0))
        return pa.table({"canary_id": pa.array(ids, pa.int64()),
                         "p_n": pa.array(hits, pa.int64())})

    return _tree_combine(
        ds.map_batches(scan, batch_format="pyarrow"),
        ["canary_id"], [("p_n", "sum")],
        ["canary_id", "p_n"], ["canary_id", "n_docs"])


def q_documents_data_card(sf_dir: str) -> Dataset:
    """One-row corpus DATA CARD (the summary block of a dataset
    release): doc count, token count, distinct languages / sources,
    mean tokens per doc, and the exact-duplicate document count — one
    corpus scan for the additive stats plus the dedup family's
    text-key exchange for the dup count.

    Scale shape: additive stats ride a single-row tree combine;
    lang/source distinctness is a bounded-domain bitleless pair pass
    (per-batch unique → one tiny groupby); the duplicate count reuses
    the text-grain groupby the exact-dedup queries already pay.  Mean
    is the twin's one float division."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text", "lang", "source"])

    def stat_partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text").combine_chunks(), " ")
        ntok = int(pc.sum(pc.list_value_length(toks)).as_py() or 0)
        return pa.table({"one": pa.array([1], pa.int64()),
                         "p_docs": pa.array([b.num_rows], pa.int64()),
                         "p_toks": pa.array([ntok], pa.int64())})

    stats = _small_table(_tree_combine(
        ds.map_batches(stat_partial, batch_format="pyarrow"),
        ["one"], [("p_docs", "sum"), ("p_toks", "sum")],
        ["one", "p_docs", "p_toks"], ["one", "n_docs", "n_tokens"]))
    n_docs = int(stats.column("n_docs")[0].as_py())
    n_tokens = int(stats.column("n_tokens")[0].as_py())

    def dim_partial(col: str):
        def fn(b: pa.Table) -> pa.Table:
            u = pc.unique(b.column(col).combine_chunks())
            return pa.table({col: u})
        return fn

    n_langs = len(_small_table(_tree_combine(
        ds.map_batches(dim_partial("lang"), batch_format="pyarrow"),
        ["lang"], [("lang", "count")], ["lang", "_c"], ["lang", "_c"])))
    n_sources = len(_small_table(_tree_combine(
        ds.map_batches(dim_partial("source"), batch_format="pyarrow"),
        ["source"], [("source", "count")], ["source", "_c"],
        ["source", "_c"])))

    # exact-duplicate docs: rows whose text occurs ≥ 2 times
    def text_partial(b: pa.Table) -> pa.Table:
        g = b.select(["text"]).group_by("text") \
            .aggregate([("text", "count")])
        return g.rename_columns(["text", "p_c"])

    tc = ds.map_batches(text_partial, batch_format="pyarrow") \
        .groupby("text").aggregate(Sum("p_c", alias_name="c"))

    def dup_partial(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy(zero_copy_only=False)
        dup = int(c[c >= 2].sum())
        return pa.table({"one": pa.array([1], pa.int64()),
                         "p_d": pa.array([dup], pa.int64())})

    dups = _small_table(_tree_combine(
        tc.map_batches(dup_partial, batch_format="pyarrow"),
        ["one"], [("p_d", "sum")], ["one", "p_d"], ["one", "n_dup"]))
    n_dup = int(dups.column("n_dup")[0].as_py())

    return rd.from_arrow(pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_tokens": pa.array([n_tokens], pa.int64()),
        "n_langs": pa.array([n_langs], pa.int64()),
        "n_sources": pa.array([n_sources], pa.int64()),
        "mean_doc_tokens": pa.array(
            [float(n_tokens) / float(n_docs)], pa.float64()),
        "dup_docs": pa.array([n_dup], pa.int64()),
    }))


def q_documents_train_order(sf_dir: str) -> Dataset:
    """Deterministic GLOBAL training order (the corpus-shuffle step a
    training run consumes): every doc gets a dense 1-based rank by the
    seeded md5 of its identity — reproducible across reruns, cluster
    sizes and partitionings, unlike engine-random shuffles.  Also the
    catalog's one true global ORDER BY: Ray Data's range-partitioned
    sort moves every row exactly once.

    Rank assignment: sort is already an all-to-all materializing
    barrier, so the dense global row number comes free afterwards from
    block METADATA — iter_internal_ref_bundles yields per-block row
    counts in dataset order (refs only, no rows to the driver;
    the with_schema discipline), and one remote task per block stamps
    offset + arange.  No second shuffle, no driver materialization."""
    import numpy as np

    from ..stages.partition import row_hash_hex

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id"])

    def add_h(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        h = pa.array([row_hash_hex((i,), 17) for i in ids], pa.string())
        return pa.table({"doc_id": pc.cast(b.column("doc_id"),
                                           pa.int64()),
                         "h": h})

    s = ds.map_batches(add_h, batch_format="pyarrow") \
        .sort(["h", "doc_id"]).materialize()

    refs, counts = [], []
    for bundle in s.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            refs.append(ref)
            counts.append(meta.num_rows)
    offsets = np.cumsum([0] + counts[:-1])

    @ray.remote
    def stamp(block, off: int):
        t = block if isinstance(block, pa.Table) else pa.table(block)
        return t.append_column(
            "train_rank",
            pa.array(np.arange(off + 1, off + 1 + t.num_rows),
                     pa.int64()))

    if not refs:
        return rd.from_arrow(pa.schema(
            [("doc_id", pa.int64()), ("h", pa.string()),
             ("train_rank", pa.int64())]).empty_table())
    return rd.from_arrow_refs(
        [stamp.remote(r, int(o)) for r, o in zip(refs, offsets)])


def q_documents_dedup_normalized(sf_dir: str) -> Dataset:
    """Normalization-robust exact dedup (the Dolma/CCNet "fuzzy key"
    step): docs that differ only in case, punctuation, or whitespace
    runs collapse to one normalized key; the smallest doc_id per key is
    elected keeper and the group size reported.  Catches the
    re-encoded / re-wrapped copies byte-exact dedup misses.

    Scale shape: one pass normalizes vectorized off the Arrow string
    buffers (utf8_lower + two RE2 replaces + trim) and pre-reduces
    in-batch (Min/Count per key), so the single groupby exchange moves
    one row per DISTINCT normalized key per block — the dedup family's
    text-grain exchange, never raw duplicates.  Reference analogue:
    content-hash memoization in app/services/file_handler.py (exact
    bytes only); the normalization is the added semantics."""
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        k = pc.utf8_lower(b.column("text"))
        k = pc.replace_substring_regex(k, "[^a-z0-9 ]", "")
        k = pc.replace_substring_regex(k, " +", " ")
        k = pc.utf8_trim(k, " ")
        t = pa.table({"k": k,
                      "doc_id": pc.cast(b.column("doc_id"), pa.int64())})
        g = t.group_by("k").aggregate(
            [("doc_id", "min"), ("doc_id", "count")])
        return g.rename_columns(["k", "p_min", "p_n"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Min("p_min"), Sum("p_n"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(b.column("min(p_min)"), pa.int64()),
            "n_copies": pc.cast(b.column("sum(p_n)"), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_documents_c4_gate(sf_dir: str) -> Dataset:
    """The C4 document-level quality heuristics (Raffel et al. 2020,
    "Colossal Clean Crawled Corpus" cleaning): at least 3
    terminal-punctuation sentences, no "lorem ipsum" placeholder text,
    no curly brace (code leakage), composed into a keep flag.
    Together with q_documents_gopher_gate this completes the two
    canonical public web-cleaning rule sets.

    Scale shape: embarrassingly parallel, zero exchanges — sentence
    count via one RE2 scan, the two containment flags via C-level
    match_substring on the (lowercased) buffer."""
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def gate(b: pa.Table) -> pa.Table:
        txt = b.column("text")
        n_sent = pc.cast(pc.count_substring_regex(txt, r"[.!?]"),
                         pa.int64())
        low = pc.utf8_lower(txt)
        lorem = pc.match_substring(low, "lorem ipsum")
        brace = pc.match_substring(txt, "{")
        keep = pc.and_(pc.and_(pc.greater_equal(n_sent, pa.scalar(3)),
                               pc.invert(lorem)),
                       pc.invert(brace))
        return pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "n_sentences": n_sent,
            "has_lorem": lorem,
            "has_brace": brace,
            "keep": keep,
        })

    return ds.map_batches(gate, batch_format="pyarrow")


def q_documents_temperature_mix(sf_dir: str) -> Dataset:
    """Temperature-scaled source sampling weights (the mT5/Pile mixing
    rule): w_i ∝ p_i^α with α = 0.7 over per-source token shares —
    upsamples the tail sources, tempers the head.  Complements
    q_documents_source_mixture's uniform-flattening weight.

    Scale shape: per-batch token-count partials → tree combine over
    the bounded source grid → one single-block finish.  Bit-exactness:
    token_share is one float division of exact int64 sums; pow runs
    once per source and is quantized to int64 at 2^40 before the
    cross-source normalization sum (the PMI quantized-ln discipline),
    so the normalizer is order-independent and the twin replays it
    term-for-term."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(b.column("text"), " ")).cast(pa.int64())
        t = pa.table({"source": b.column("source"), "n": n})
        return t.group_by("source").aggregate([("n", "sum")]) \
            .rename_columns(["source", "p_tok"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"], [("p_tok", "sum")],
        ["source", "p_tok"], ["source", "n_tokens"])

    def finish(b: pa.Table) -> pa.Table:
        tok = b.column("n_tokens").to_numpy(zero_copy_only=False) \
               .astype(np.float64)
        tot = float(np.sum(tok.astype(np.int64)))
        share = tok / tot
        qw = scaled_int_sql(share ** 0.7, 1099511627776.0)
        qs = int(qw.sum())
        return pa.table({
            "source": b.column("source"),
            "n_tokens": pc.cast(b.column("n_tokens"), pa.int64()),
            "token_share": pa.array(share, pa.float64()),
            "mix_weight": pa.array(
                qw.astype(np.float64) / np.float64(qs), pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_documents_ngram_diversity(sf_dir: str) -> pa.Table:
    """Per-source trigram type/token ratio — the lexical-diversity
    fingerprint (low TTR = TEMPLATED feed; the self-BLEU-style signal
    mixture planning reads beside zipf_slope and gt_unseen).

    Scale shape: totals need NO shuffle at all (per-doc trigram count
    is max(n_words−2, 0) — one partial per batch over the bounded
    source grid); distinctness takes the vocabulary-grain
    (source, sh) exchange with in-batch pre-dedup, then a bounded
    per-source count.  TTR is one float division of two exact int64
    counts, so the twin is bit-exact by construction."""
    import numpy as np

    from ray.data.aggregate import Count

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "text"])

    def tot_partial(b: pa.Table) -> pa.Table:
        n = pc.list_value_length(
            pc.split_pattern(b.column("text"), " ")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        tri = np.maximum(n - 2, 0)
        t = pa.table({"source": b.column("source"),
                      "n": pa.array(tri, pa.int64())}) \
            .filter(pa.array(tri > 0))
        return t.group_by("source").aggregate([("n", "sum")]) \
            .rename_columns(["source", "p_n"])

    totals = _small_table(_tree_combine(
        ds.map_batches(tot_partial, batch_format="pyarrow"),
        ["source"], [("p_n", "sum")], ["source", "p_n"],
        ["source", "n_trigrams"]))

    def sh_rows(b: pa.Table) -> pa.Table:
        fn = _doc_kgram_rows("source", 3)
        out = fn(b)
        # short-circuit branches of the shared kernel type the id
        # column int64; re-assert string for the source-keyed use
        if out.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "sh": pa.array([], pa.string())})
        return out

    def dist_partial(b: pa.Table) -> pa.Table:
        g = b.select(["source"]).group_by("source") \
            .aggregate([("source", "count")])
        return g.rename_columns(["source", "p_n"])

    distinct = _small_table(_tree_combine(
        ds.map_batches(sh_rows, batch_format="pyarrow")
          .groupby(["source", "sh"])
          .aggregate(Count("sh", alias_name="_c"))
          .map_batches(dist_partial, batch_format="pyarrow"),
        ["source"], [("p_n", "sum")], ["source", "p_n"],
        ["source", "n_distinct"]))

    tot_map = dict(zip(totals.column("source").to_pylist(),
                       totals.column("n_trigrams").to_pylist()))
    srcs = sorted(tot_map)
    dis_map = dict(zip(distinct.column("source").to_pylist(),
                       distinct.column("n_distinct").to_pylist()))
    tot = np.array([tot_map[s] for s in srcs], np.int64)
    dis = np.array([dis_map[s] for s in srcs], np.int64)
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n_trigrams": pa.array(tot, pa.int64()),
        "n_distinct": pa.array(dis, pa.int64()),
        "ttr": pa.array(dis.astype(np.float64) / tot.astype(np.float64),
                        pa.float64()),
    })


def q_documents_source_ttest(sf_dir: str) -> Dataset:
    """Welch's two-sample t statistic between every source pair on
    document length (n_chars) — the drift-triage companion to
    source_kl: which feeds differ in length distribution beyond
    sampling noise.

    Scale shape: one (n, Σx, Σx²) int64 partial pass tree-combined
    over the bounded source grid; all pairwise arithmetic runs on that
    tiny grid in a single-block finish.  Every float op replays the
    twin's expression tree term-for-term over exact int64 sums
    (mean = Σx/n, var = (Σx² − (Σx·Σx)/n)/(n−1), t over the variance
    ratios), so the statistic is bit-identical.  Single-doc sources
    drop (variance undefined), like the twin's n > 1 predicate."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        x = pc.cast(b.column("n_chars"), pa.int64())
        sq = pc.multiply(x, x)
        t = pa.table({"source": b.column("source"), "x": x, "sq": sq})
        g = t.group_by("source").aggregate(
            [("x", "count"), ("x", "sum"), ("sq", "sum")])
        return g.rename_columns(["source", "p_n", "p_sx", "p_sxx"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"], [("p_n", "sum"), ("p_sx", "sum"), ("p_sxx", "sum")],
        ["source", "p_n", "p_sx", "p_sxx"],
        ["source", "n", "sx", "sxx"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("source", "ascending")])
        src = b.column("source").to_pylist()
        n = b.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sx = b.column("sx").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sxx = b.column("sxx").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = n > 1
        src = [s for s, k in zip(src, keep) if k]
        n, sx, sxx = n[keep], sx[keep], sxx[keep]
        nf = n.astype(np.float64)
        mean = sx.astype(np.float64) / nf
        var = (sxx.astype(np.float64)
               - (sx.astype(np.float64) * sx.astype(np.float64)) / nf) \
            / (nf - 1.0)
        ia, ib = np.triu_indices(len(src), k=1)
        t = (mean[ia] - mean[ib]) / np.sqrt(var[ia] / nf[ia]
                                            + var[ib] / nf[ib])
        return pa.table({
            "source_a": pa.array([src[i] for i in ia], pa.string()),
            "source_b": pa.array([src[i] for i in ib], pa.string()),
            "n_a": pa.array(n[ia], pa.int64()),
            "n_b": pa.array(n[ib], pa.int64()),
            "mean_a": pa.array(mean[ia], pa.float64()),
            "mean_b": pa.array(mean[ib], pa.float64()),
            "t_welch": pa.array(t, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_events_theilsen_trend(sf_dir: str) -> Dataset:
    """Per-user THEIL–SEN slope of purchase value over time — the
    robust (median-of-pairwise-slopes) twin of q_events_value_trend's
    OLS: outlier purchases cannot swing it.  Slopes are cents per
    microsecond over exact int64 diffs; equal-timestamp pairs drop
    (distinct-x convention, and the twin's strict ts inequality); the
    median follows the pinned quantile_cont rule
    (lo·(1−frac) + hi·frac at q = 0.5).

    Scale shape: one groupby(user_id) co-partition of PURCHASE rows
    only; the pairwise expansion is inherently O(n²) per user but runs
    vectorized in-group (triu_indices), bounded by the per-user
    purchase count — q_events_value_trend is the linear-cost scale
    path, and a user beyond THEILSEN_MAX_GROUP purchases fails loudly
    rather than silently expanding ~10⁹ pairs."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_id",
                                  "event_type", "value"])

    def slopes(g: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "n_slopes": pa.array([], pa.int64()),
                          "theil_sen": pa.array([], pa.float64())})
        if g.num_rows < 2:
            return empty
        if g.num_rows > THEILSEN_MAX_GROUP:
            raise ValueError(
                f"theilsen_trend: user {g.column('user_id')[0]} has "
                f"{g.num_rows} purchases (> {THEILSEN_MAX_GROUP}); "
                "the O(n²) pair expansion would explode — use "
                "q_events_value_trend (OLS) for this corpus")
        g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        ts = g.column("ts").combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cents = scaled_int_sql(
            pc.cast(g.column("value"), pa.float64()), 100.0)
        ia, ib = np.triu_indices(len(ts), k=1)
        dx = ts[ib] - ts[ia]
        ok = dx > 0
        if not ok.any():
            return empty
        sl = np.sort((cents[ib] - cents[ia])[ok].astype(np.float64)
                     / dx[ok])
        pos = (len(sl) - 1) * 0.5
        lo, hi = int(np.floor(pos)), int(np.ceil(pos))
        frac = pos - np.floor(pos)
        med = float(sl[lo] * (1.0 - frac) + sl[hi] * frac)
        return pa.table({
            "user_id": g.column("user_id").slice(0, 1),
            "n_slopes": pa.array([int(ok.sum())], pa.int64()),
            "theil_sen": pa.array([med], pa.float64()),
        })

    purchases = ds.map_batches(
        lambda b: b.filter(pc.equal(b.column("event_type"), "purchase"))
                   .drop_columns(["event_type"]),
        batch_format="pyarrow")
    return purchases.groupby("user_id").map_groups(
        slopes, batch_format="pyarrow")


THEILSEN_MAX_GROUP = 100_000


def q_documents_line_dedup(sf_dir: str) -> Dataset:
    """Corpus-wide duplicated-LINE removal (the RefinedWeb/CCNet line
    dedup step): any exact line occurring in ≥ 2 distinct documents is
    dropped from EVERY document and the survivors re-joined — the
    boilerplate-header / footer cleaner, line-grain companion of
    q_documents_dup_spans_removed (10-gram spans) and
    q_transcripts_boilerplate (the report).  Output (doc_id,
    clean_text, n_kept, n_removed) for every document; a within-doc
    repeat is NOT cross-doc boilerplate and survives.

    Scale shape: ONE line-grain exchange — groupby(line) sees each
    distinct line's (doc_id, idx) owners and emits hit positions only
    for lines with ≥ 2 distinct owners (no dup-set join, no broadcast,
    no driver state); hits fold per doc into an index list (ints only),
    LEFT-join back onto the corpus scan, and the rebuild is the
    dup_spans mask + take + binary_join on the line lists.  Text
    crosses the wire twice (the line exchange, the join's doc side)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def line_rows(b: pa.Table) -> pa.Table:
        lines = pc.split_pattern(
            pc.fill_null(b.column("text"), "").combine_chunks(), "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        offs = lines.offsets.to_numpy(zero_copy_only=False)
        n = np.diff(offs)
        ids = b.column("doc_id").combine_chunks() \
            .take(pa.array(np.repeat(np.arange(len(n)), n), pa.int64()))
        idx = (np.arange(int(offs[-1])) - np.repeat(offs[:-1], n)) \
            .astype(np.int64)
        return pa.table({"line": pc.list_flatten(lines),
                         "doc_id": pc.cast(ids, pa.int64()),
                         "i": pa.array(idx, pa.int64())})

    def hits(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id")
        if pc.count_distinct(ids).as_py() < 2:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "i": pa.array([], pa.int64())})
        return g.select(["doc_id", "i"])

    hit_rows = ds.map_batches(line_rows, batch_format="pyarrow") \
        .groupby("line").map_groups(hits, batch_format="pyarrow")

    def fold(g: pa.Table) -> pa.Table:
        ii = np.unique(g.column("i").to_numpy(zero_copy_only=False))
        return pa.table({
            "doc_id": pa.array([g.column("doc_id")[0].as_py()],
                               pa.int64()),
            "drop_idx": pa.array([",".join(map(str, ii))], pa.string()),
        })

    cov = with_schema(
        hit_rows.groupby("doc_id").map_groups(fold,
                                              batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("drop_idx", pa.string())]))
    # an ALL-empty cov (no cross-doc duplicate line anywhere) breaks
    # Dataset.join even typed: the hash shuffle fans the one typed
    # empty block into schema-less partitions — skip the join and
    # rebuild with a NULL drop list instead (cov is already
    # materialized refs via with_schema, so count() is metadata)
    cov = cov.materialize()
    if cov.count() == 0:
        j = ds.map_batches(
            lambda b: b.append_column(
                "drop_idx", pa.nulls(b.num_rows, pa.string())),
            batch_format="pyarrow")
    else:
        j = ds.join(cov, join_type="left_outer", num_partitions=8,
                    on=("doc_id",))

    def rebuild(b: pa.Table) -> pa.Table:
        lines = pc.split_pattern(
            pc.fill_null(b.column("text"), "").combine_chunks(), "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        offs = lines.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offs).astype(np.int64)
        tot = int(offs[-1])
        mask = np.zeros(tot, bool)
        di = b.column("drop_idx").combine_chunks()
        valid = np.flatnonzero(~di.is_null().to_numpy(
            zero_copy_only=False))
        for r in valid:
            base = offs[r]
            for s in di[int(r)].as_py().split(","):
                mask[base + int(s)] = True
        keep = np.flatnonzero(~mask)
        counts = np.bincount(
            np.searchsorted(offs, keep, side="right") - 1,
            minlength=len(lens)).astype(np.int64)
        flat = pc.list_flatten(lines)
        kept_flat = flat.take(pa.array(keep, pa.int64()))
        lists = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(counts)]),
                     pa.int32()), kept_flat)
        clean = pc.binary_join(lists, "\n")
        return pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "clean_text": pc.fill_null(clean, ""),
            "n_kept": pa.array(counts, pa.int64()),
            "n_removed": pa.array(lens - counts, pa.int64()),
        })

    return j.map_batches(rebuild, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Round-4 session-4 batch: classic warehouse join/subquery shapes (TPC-H
# Q4/Q7/Q11/Q14/Q18/Q22 analogues over the available columns) plus a
# two-sample distribution-drift test.  Reference analogue: SURVEY §2.5's
# join matrix and §2.6's rollups composed into the multi-table report
# shapes a warehouse user of the reference would expect.
# ---------------------------------------------------------------------------


def q_orders_large_quantity(sf_dir: str) -> Dataset:
    """TPC-H-Q18-shaped "large volume orders": orders whose total
    lineitem quantity exceeds 300, joined back to orders + customer,
    top-100 by order value.

    Scale shape: the HAVING filter runs FIRST and entirely on the fact
    table — per-batch partial (orderkey, qty) aggregation, one int64
    groupby, then the survivor set (structurally tiny: result-bounded)
    drives is_in-pruned scans of orders and customer, so neither
    dimension row set beyond the survivors ever moves.  Quantities are
    integral in this corpus; the safe Arrow double→int64 cast makes the
    sums exact and loud if that assumption ever breaks."""
    import numpy as np

    THRESH = 300
    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_quantity"])

    def qty_partial(b: pa.Table) -> pa.Table:
        g = pa.table({
            "k": pc.cast(b.column("l_orderkey"), pa.int64()),
            "q": pc.cast(b.column("l_quantity"), pa.int64()),
        }).group_by("k").aggregate([("q", "sum")])
        return g.rename_columns(["k", "pq"])

    sums = with_schema(
        li.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("k").aggregate(Sum("pq", alias_name="sum_qty")),
        pa.schema([("k", pa.int64()), ("sum_qty", pa.int64())]))
    big = sums.map_batches(
        lambda b: b.filter(pc.greater(b.column("sum_qty"), THRESH)),
        batch_format="pyarrow")
    tb = _small_table(big)   # bounded: the HAVING survivors ARE the result
    if tb is None:
        return rd.from_arrow(pa.schema([
            ("c_name", pa.string()), ("c_custkey", pa.int64()),
            ("o_orderkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_totalprice", pa.float64()),
            ("sum_qty", pa.int64())]).empty_table())
    qty_by_key = dict(zip(tb.column("k").to_pylist(),
                          tb.column("sum_qty").to_pylist()))
    keys = pa.array(sorted(qty_by_key), pa.int64())

    ords = _small_table(rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_totalprice",
                 "o_orderdate"])
        .map_batches(
            lambda b: b.filter(pc.is_in(
                pc.cast(b.column("o_orderkey"), pa.int64()),
                value_set=keys)),
            batch_format="pyarrow"))
    ck = pa.array(sorted(set(ords.column("o_custkey").to_pylist())),
                  pa.int64())
    cust = _small_table(rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_name"])
        .map_batches(
            lambda b: b.filter(pc.is_in(
                pc.cast(b.column("c_custkey"), pa.int64()),
                value_set=ck)),
            batch_format="pyarrow"))
    name_by_cust = dict(zip(cust.column("c_custkey").to_pylist(),
                            cust.column("c_name").to_pylist()))
    okeys = ords.column("o_orderkey").to_pylist()
    custs = ords.column("o_custkey").to_pylist()
    out = pa.table({
        "c_name": pa.array([name_by_cust[c] for c in custs]),
        "c_custkey": pa.array(custs, pa.int64()),
        "o_orderkey": pa.array(okeys, pa.int64()),
        "o_orderdate": ords.column("o_orderdate"),
        "o_totalprice": ords.column("o_totalprice"),
        "sum_qty": pa.array([qty_by_key[k] for k in okeys], pa.int64()),
    }).sort_by([("o_totalprice", "descending"),
                ("o_orderkey", "ascending")]).slice(0, 100)
    return rd.from_arrow(out)


def q_promo_revenue_share(sf_dir: str) -> Dataset:
    """TPC-H-Q14-shaped promo revenue share per ship month: the
    conditional-aggregation-over-a-dim-lookup shape.  part is
    dim-sized, so its PROMO key set rides ONE broadcast into the
    lineitem scan (no join shuffle); revenue is quantized to int64 at
    4 dp in-batch and partially aggregated per month before the ≤
    #months-row groupby.  The one float expression — 100·promo/total —
    replays the twin's cast-then-divide order token for token."""
    import numpy as np
    import pyarrow.parquet as pq

    part = pq.read_table(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_type"])
    promo = part.filter(pc.equal(part.column("p_type"), "PROMO")) \
        .column("p_partkey").combine_chunks().cast(pa.int64())
    promo_ref = ray.put(promo)

    def partial(b: pa.Table) -> pa.Table:
        rev = scaled_int_sql(
            pc.multiply(b.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    b.column("l_discount"))), 10000.0)
        is_promo = pc.is_in(
            pc.cast(b.column("l_partkey"), pa.int64()),
            value_set=ray.get(promo_ref)) \
            .to_numpy(zero_copy_only=False)
        month = pc.floor_temporal(b.column("l_shipdate"), unit="month")
        g = pa.table({
            "month": month,
            "r": pa.array(rev, pa.int64()),
            "pr": pa.array(np.where(is_promo, rev, 0), pa.int64()),
        }).group_by("month").aggregate([("r", "sum"), ("pr", "sum")])
        return g.rename_columns(["month", "p_r", "p_pr"])

    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("month").aggregate(Sum("p_r", alias_name="r"),
                                    Sum("p_pr", alias_name="pr"))

    def finish(b: pa.Table) -> pa.Table:
        r = b.column("r").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        p = b.column("pr").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "month": b.column("month"),
            "promo_share": (p * 100.0) / r,
            "revenue": r / 10000.0,
        })

    return ds.map_batches(finish, batch_format="pyarrow")


def q_orders_priority_returns(sf_dir: str) -> Dataset:
    """TPC-H-Q4-shaped EXISTS semi-join: order counts per priority,
    restricted to orders with at least one returned ('R') lineitem.
    Scale shape: the fact-side predicate dedups to a distinct orderkey
    set via per-batch partial counts + one int64 groupby, the semi
    join is Ray's hash-partitioned inner join on that aggregate
    (with_schema-pinned — the sparse-aggregate hazard), and the final
    count shuffles only ≤5 partial rows per block."""
    returned = with_schema(
        rd.read_parquet(_t(sf_dir, "lineitem"),
                        columns=["l_orderkey", "l_returnflag"])
        .map_batches(
            lambda b: pa.table({
                "k": pc.cast(b.column("l_orderkey"), pa.int64())})
            .filter(pc.equal(b.column("l_returnflag"), "R"))
            .group_by("k").aggregate([([], "count_all")])
            .rename_columns(["k", "c"]),
            batch_format="pyarrow")
        .groupby("k").aggregate(Count(alias_name="c")),
        pa.schema([("k", pa.int64()), ("c", pa.int64())]))

    j = rd.read_parquet(_t(sf_dir, "orders"),
                        columns=["o_orderkey", "o_orderpriority"]) \
        .join(returned, join_type="inner", num_partitions=8,
              on=("o_orderkey",), right_on=("k",))

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["o_orderpriority"]).group_by("o_orderpriority") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["o_orderpriority", "p_n"])

    return j.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderpriority") \
        .aggregate(Sum("p_n", alias_name="n_orders"))


def q_customers_idle_rich(sf_dir: str) -> Dataset:
    """TPC-H-Q22-shaped report: customers whose balance beats the
    positive-balance average and who have NO completed ('F') order,
    counted per nation.  Composes the two classic subquery shapes —
    a global scalar aggregate (broadcast as two int64s; the strictly-
    above test is the exact integer cross-multiply cents·n > Σcents,
    no division anywhere) and a NOT EXISTS anti-join (Ray's native
    hash-partitioned left_anti on the distinct F-customer aggregate)."""
    cents_of = lambda b: scaled_int_sql(b.column("c_acctbal"), 100.0)

    cust = rd.read_parquet(
        _t(sf_dir, "customer"),
        columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def pos_partial(b: pa.Table) -> pa.Table:
        import numpy as np
        c = cents_of(b)
        pos = c > 0
        return pa.table({"s": pa.array([int(c[pos].sum())], pa.int64()),
                         "n": pa.array([int(pos.sum())], pa.int64())})

    tot = cust.map_batches(pos_partial, batch_format="pyarrow") \
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    s_all, n_all = int(tot["s"]), int(tot["n"])

    f_cust = with_schema(
        rd.read_parquet(_t(sf_dir, "orders"),
                        columns=["o_custkey", "o_orderstatus"])
        .map_batches(
            lambda b: pa.table({
                "k": pc.cast(b.column("o_custkey"), pa.int64())})
            .filter(pc.equal(b.column("o_orderstatus"), "F"))
            .group_by("k").aggregate([([], "count_all")])
            .rename_columns(["k", "c"]),
            batch_format="pyarrow")
        .groupby("k").aggregate(Count(alias_name="c")),
        pa.schema([("k", pa.int64()), ("c", pa.int64())]))

    def rich(b: pa.Table) -> pa.Table:
        import numpy as np
        c = cents_of(b)
        keep = (c * n_all) > s_all
        return pa.table({
            "c_custkey": pc.cast(b.column("c_custkey"), pa.int64()),
            "c_nationkey": pc.cast(b.column("c_nationkey"), pa.int64()),
            "cents": pa.array(c, pa.int64()),
        }).filter(pa.array(keep))

    # the rich filter can empty whole blocks (schema-less, breaks the
    # join) — pin the left schema; customer is dim-sized so the ref
    # rebuild is cheap
    idle = with_schema(
        cust.map_batches(rich, batch_format="pyarrow"),
        pa.schema([("c_custkey", pa.int64()),
                   ("c_nationkey", pa.int64()),
                   ("cents", pa.int64())])) \
        .join(f_cust, join_type="left_anti", num_partitions=8,
              on=("c_custkey",), right_on=("k",))

    def nat_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("c_nationkey").aggregate(
            [([], "count_all"), ("cents", "sum")])
        return g.rename_columns(["c_nationkey", "p_n", "p_s"])

    agg = idle.map_batches(nat_partial, batch_format="pyarrow") \
        .groupby("c_nationkey") \
        .aggregate(Sum("p_n", alias_name="n_custs"),
                   Sum("p_s", alias_name="s_cents"))

    def finish(b: pa.Table) -> pa.Table:
        import numpy as np
        s = b.column("s_cents").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "c_nationkey": b.column("c_nationkey"),
            "n_custs": b.column("n_custs"),
            "total_acctbal": s / 100.0,
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_part_revenue_share(sf_dir: str) -> Dataset:
    """TPC-H-Q11-shaped "important parts": parts whose revenue exceeds
    1.5× the mean per-part revenue — the HAVING-against-a-global-scalar
    shape, with a self-scaling threshold that binds at every corpus
    size (an absolute fraction of total revenue stops selecting
    anything once #parts grows past 1/fraction).  The per-part
    aggregate is computed ONCE (per-batch int64 partials, one groupby)
    and materialized (bounded by #parts, a dimension cardinality); the
    global (total, count) then reduces over that aggregate, never
    rescanning the fact table.  The keep test is EXACT integer
    arithmetic on both sides: the twin cross-multiplies in HUGEINT
    (2·r·np > 3·tot) and this side compares r against the equivalent
    integer floor cut — r > ⌊3·tot/(2·np)⌋ ⟺ 2·r·np > 3·tot for
    integer r, because the divisor exceeds any remainder."""
    import numpy as np

    def partial(b: pa.Table) -> pa.Table:
        rev = scaled_int_sql(
            pc.multiply(b.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    b.column("l_discount"))), 10000.0)
        g = pa.table({
            "p_partkey": pc.cast(b.column("l_partkey"), pa.int64()),
            "r": pa.array(rev, pa.int64()),
        }).group_by("p_partkey").aggregate([("r", "sum")])
        return g.rename_columns(["p_partkey", "p_r"])

    per_part = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("p_partkey").aggregate(Sum("p_r", alias_name="r")) \
        .materialize()

    g = per_part.aggregate(Sum("r", alias_name="t"),
                           Count(alias_name="np"))
    tot, n_parts = int(g["t"]), int(g["np"])
    cut = (3 * tot) // (2 * n_parts)   # Python big-int: overflow-proof

    def finish(b: pa.Table) -> pa.Table:
        r = b.column("r").to_numpy(zero_copy_only=False)
        keep = r > cut
        return pa.table({
            "p_partkey": b.column("p_partkey"),
            "revenue": r.astype(np.float64) / 10000.0,
        }).filter(pa.array(keep))

    return per_part.map_batches(finish, batch_format="pyarrow")


def q_volume_shipping(sf_dir: str) -> Dataset:
    """TPC-H-Q7-shaped volume shipping: yearly revenue between the
    NATION_1 ↔ NATION_2 pair, grouped by (supplier nation, customer
    nation, ship year).  Scale shape: supplier and customer are
    dim-sided HERE (their (key → nationkey) maps, pre-filtered to the
    two nations, ride one ``ray.put`` each); lineitem pre-aggregates
    exact int64 revenue per (orderkey, supp_nation, year) in-batch and
    is the only fact that moves — one hash join against the pruned
    orders scan, then a ≤ (2 pairs × years)-row groupby."""
    import numpy as np
    import pyarrow.parquet as pq

    PAIR = {"NATION_1", "NATION_2"}
    nat = pq.read_table(_t(sf_dir, "nation"),
                        columns=["n_nationkey", "n_name"])
    name_by_key = {int(k): n for k, n in
                   zip(nat.column("n_nationkey").to_pylist(),
                       nat.column("n_name").to_pylist()) if n in PAIR}
    keys = pa.array(sorted(name_by_key), pa.int64())

    OUT_SCHEMA = pa.schema([
        ("supp_nation", pa.string()), ("cust_nation", pa.string()),
        ("l_year", pa.int64()), ("revenue", pa.float64())])

    sup = pq.read_table(_t(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_nationkey"])
    sk = sup.column("s_suppkey").combine_chunks().cast(pa.int64())
    sn = sup.column("s_nationkey").combine_chunks().cast(pa.int64())
    m = pc.is_in(sn, value_set=keys)
    if pc.sum(m).as_py() in (0, None):
        # no supplier in the pair → the result is empty by definition;
        # exit before building a join whose left side has no rows (an
        # all-empty join left crashes Ray's hash-shuffle partitions)
        return rd.from_arrow(OUT_SCHEMA.empty_table())
    sup_ref = ray.put((sk.filter(m), sn.filter(m)))

    cust = pq.read_table(_t(sf_dir, "customer"),
                         columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").combine_chunks().cast(pa.int64())
    cn = cust.column("c_nationkey").combine_chunks().cast(pa.int64())
    mc = pc.is_in(cn, value_set=keys)
    cust_ref = ray.put((ck.filter(mc), cn.filter(mc)))

    def line_partial(b: pa.Table) -> pa.Table:
        supk, supn = ray.get(sup_ref)
        pos = pc.index_in(pc.cast(b.column("l_suppkey"), pa.int64())
                          .combine_chunks(), value_set=supk)
        keep = pos.is_valid()
        f = b.filter(keep)
        s_nat = pc.take(supn, pos.filter(keep))
        rev = scaled_int_sql(
            pc.multiply(f.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    f.column("l_discount"))), 10000.0)
        g = pa.table({
            "l_orderkey": pc.cast(f.column("l_orderkey"), pa.int64()),
            "s_nat": s_nat,
            "l_year": pc.cast(pc.year(f.column("l_shipdate")),
                              pa.int64()),
            "r": pa.array(rev, pa.int64()),
        }).group_by(["l_orderkey", "s_nat", "l_year"]) \
            .aggregate([("r", "sum")])
        return g.rename_columns(["l_orderkey", "s_nat", "l_year", "p_r"])

    # the nation filter can empty whole blocks, and a schema-less empty
    # block breaks Dataset.join (the documented FILTER-before-join
    # hazard) — pin the partial-agg side's schema before the join
    rev = with_schema(
        rd.read_parquet(
            _t(sf_dir, "lineitem"),
            columns=["l_orderkey", "l_suppkey", "l_shipdate",
                     "l_extendedprice", "l_discount"])
        .map_batches(line_partial, batch_format="pyarrow"),
        pa.schema([("l_orderkey", pa.int64()), ("s_nat", pa.int64()),
                   ("l_year", pa.int64()), ("p_r", pa.int64())]))

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey"])
    j = rev.join(orders, join_type="inner", num_partitions=8,
                 on=("l_orderkey",), right_on=("o_orderkey",))

    def pair_partial(b: pa.Table) -> pa.Table:
        custk, custn = ray.get(cust_ref)
        pos = pc.index_in(pc.cast(b.column("o_custkey"), pa.int64())
                          .combine_chunks(), value_set=custk)
        keep = pos.is_valid()
        f = b.filter(keep)
        c_nat = pc.take(custn, pos.filter(keep))
        ne = pc.not_equal(f.column("s_nat"), c_nat)
        f = pa.table({"s_nat": f.column("s_nat"), "c_nat": c_nat,
                      "l_year": f.column("l_year"),
                      "p_r": f.column("p_r")}).filter(ne)
        g = f.group_by(["s_nat", "c_nat", "l_year"]) \
            .aggregate([("p_r", "sum")])
        return g.rename_columns(["s_nat", "c_nat", "l_year", "pp_r"])

    agg = j.map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["s_nat", "c_nat", "l_year"]) \
        .aggregate(Sum("pp_r", alias_name="r"))

    def finish(b: pa.Table) -> pa.Table:
        sn_names = pa.array([name_by_key[k] for k in
                             b.column("s_nat").to_pylist()])
        cn_names = pa.array([name_by_key[k] for k in
                             b.column("c_nat").to_pylist()])
        r = b.column("r").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "supp_nation": sn_names, "cust_nation": cn_names,
            "l_year": b.column("l_year"),
            "revenue": r / 10000.0,
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_orders_above_cust_avg(sf_dir: str) -> Dataset:
    """Correlated-scalar-subquery shape: per customer, how many of
    their orders beat their OWN average order value.  The per-customer
    (Σcents, n) aggregate joins back onto a second column-pruned scan
    of orders (facts scanned twice rather than materialized — the
    projection is fact-sized); the "above average" test is the exact
    integer cross-multiply cents·n > Σcents, so no float division
    exists on either side of the oracle."""
    def cents_tbl(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
            "cents": pa.array(scaled_int_sql(
                b.column("o_totalprice"), 100.0), pa.int64()),
        })

    def agg_partial(b: pa.Table) -> pa.Table:
        g = cents_tbl(b).group_by("o_custkey").aggregate(
            [("cents", "sum"), ([], "count_all")])
        return g.rename_columns(["o_custkey", "p_s", "p_n"])

    paths = _t(sf_dir, "orders")
    cols = ["o_custkey", "o_totalprice"]
    avg = with_schema(
        rd.read_parquet(paths, columns=cols)
        .map_batches(agg_partial, batch_format="pyarrow")
        .groupby("o_custkey").aggregate(Sum("p_s", alias_name="s"),
                                        Sum("p_n", alias_name="n")),
        pa.schema([("o_custkey", pa.int64()), ("s", pa.int64()),
                   ("n", pa.int64())]))

    j = rd.read_parquet(paths, columns=cols) \
        .map_batches(cents_tbl, batch_format="pyarrow") \
        .join(avg.map_batches(
            lambda b: b.rename_columns(["k", "s", "n"]),
            batch_format="pyarrow"),
            join_type="inner", num_partitions=8,
            on=("o_custkey",), right_on=("k",))

    def above_partial(b: pa.Table) -> pa.Table:
        import numpy as np
        c = b.column("cents").to_numpy(zero_copy_only=False)
        s = b.column("s").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False)
        above = (c * n > s).astype(np.int64)
        g = pa.table({
            "c_custkey": b.column("o_custkey"),
            "n_orders": b.column("n"),
            "a": pa.array(above, pa.int64()),
        }).group_by(["c_custkey", "n_orders"]).aggregate([("a", "sum")])
        return g.rename_columns(["c_custkey", "n_orders", "p_a"])

    return j.map_batches(above_partial, batch_format="pyarrow") \
        .groupby(["c_custkey", "n_orders"]) \
        .aggregate(Sum("p_a", alias_name="n_above"))


def q_events_ks_test(sf_dir: str) -> Dataset:
    """Two-sample Kolmogorov–Smirnov statistic between the purchase and
    click value distributions — the distribution-drift gate a training
    pipeline runs when a new data source lands.  Distributed shape:
    per-batch partial (value, n_purchase, n_click) histograms, one
    groupby(value) exchange, then the ordered CDF walk runs on the
    aggregated support (bounded by distinct 2-dp values, a histogram —
    never the raw events).  The sup-distance maximization is EXACT
    integer cross-multiplication |c1·N2 − c2·N1|; the single division
    happens once, at the end, replaying the twin."""
    import numpy as np

    KINDS = ("purchase", "click")

    def partial(b: pa.Table) -> pa.Table:
        m1 = pc.equal(b.column("event_type"), KINDS[0])
        m2 = pc.equal(b.column("event_type"), KINDS[1])
        keep = pc.or_(m1, m2)
        f = pa.table({
            "value": b.column("value"),
            "n1": pc.cast(m1, pa.int64()),
            "n2": pc.cast(m2, pa.int64()),
        }).filter(keep)
        g = f.group_by("value").aggregate([("n1", "sum"), ("n2", "sum")])
        return g.rename_columns(["value", "p1", "p2"])

    hist = rd.read_parquet(_t(sf_dir, "events"),
                           columns=["event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("value").aggregate(Sum("p1", alias_name="n1"),
                                    Sum("p2", alias_name="n2"))

    tb = _small_table(hist)   # bounded: the distinct-value histogram
    if tb is None or tb.num_rows == 0:
        return rd.from_arrow(pa.table({
            "ks": pa.array([], pa.float64()),
            "n_purchase": pa.array([], pa.int64()),
            "n_click": pa.array([], pa.int64())}))
    tb = tb.sort_by("value")
    n1 = tb.column("n1").to_numpy(zero_copy_only=False)
    n2 = tb.column("n2").to_numpy(zero_copy_only=False)
    c1 = np.cumsum(n1)
    c2 = np.cumsum(n2)
    t1 = int(c1[-1])
    t2 = int(c2[-1])
    m = int(np.max(np.abs(c1 * t2 - c2 * t1)))
    ks = float(m) / (float(t1) * float(t2))
    return rd.from_arrow(pa.table({
        "ks": pa.array([ks], pa.float64()),
        "n_purchase": pa.array([t1], pa.int64()),
        "n_click": pa.array([t2], pa.int64())}))


def q_documents_ppl_buckets(sf_dir: str) -> Dataset:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per
    source, split documents into head/middle/tail terciles of
    corpus-unigram-LM quality — the standard "keep the head, maybe the
    middle" curation gate.

    Shares q_documents_unigram_logprob's exact-integer decomposition
    (Σ quantized ln tf per doc through one (tok) exchange + join), but
    orders by the score WITHOUT the constant −ln N shift: the ordering
    key is the IEEE quotient sq/n_tokens of two exact int64s, bit-equal
    on both sides of the oracle, ties broken by doc_id.  Bucket
    assignment replays DuckDB's NTILE(3) split (first n%3 buckets take
    the extra row) inside a per-source sorted map_groups.

    Scale note: exact NTILE semantics need a per-source RANK, so each
    source's (doc_id, sq, n) triples co-partition into one group (24
    bytes/doc — tens of GB per billion docs).  At web scale, swap the
    rank for boundary assignment against per-source exact tercile
    boundaries (stages/quantiles.grouped_quantiles) and accept
    boundary-tie divergence from NTILE."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def tok_rows(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, n), pa.int64()),
            "tok": flat,
        })

    toks = ds.map_batches(tok_rows, batch_format="pyarrow")

    def tf_partial(b: pa.Table) -> pa.Table:
        g = b.select(["tok"]).group_by("tok").aggregate([("tok", "count")])
        return g.rename_columns(["tok", "p_n"])

    tf = with_schema(
        toks.map_batches(tf_partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("p_n", alias_name="tf")),
        pa.schema([("tok", pa.string()), ("tf", pa.int64())]))

    j = toks.join(tf, join_type="inner", num_partitions=8, on=("tok",))

    def doc_partial(b: pa.Table) -> pa.Table:
        tfv = b.column("tf").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        q = scaled_int_sql(np.log(tfv), 1e6)
        t = pa.table({"doc_id": b.column("doc_id"),
                      "q": pa.array(q, pa.int64()),
                      "c": pa.array(np.ones(len(q), np.int64()))})
        g = t.group_by("doc_id").aggregate([("q", "sum"), ("c", "sum")])
        return g.rename_columns(["doc_id", "p_q", "p_c"])

    agg = with_schema(
        j.map_batches(doc_partial, batch_format="pyarrow")
        .groupby("doc_id").aggregate(Sum("p_q", alias_name="sq"),
                                     Sum("p_c", alias_name="n_tokens")),
        pa.schema([("doc_id", pa.int64()), ("sq", pa.int64()),
                   ("n_tokens", pa.int64())]))

    src = rd.read_parquet(_t(sf_dir, "documents"),
                          columns=["doc_id", "source"])
    withsrc = agg.join(src, join_type="inner", num_partitions=8,
                       on=("doc_id",))

    def buckets(g: pa.Table) -> pa.Table:
        sq = g.column("sq").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        nt = g.column("n_tokens").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        score = sq / nt
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        # ORDER BY score DESC, doc_id ASC (head = least perplexing)
        order = np.lexsort((ids, -score))
        n = len(order)
        k, r = divmod(n, 3)
        bounds = np.cumsum([k + 1] * r + [k] * (3 - r))
        tiles = np.searchsorted(bounds, np.arange(n), side="right") + 1
        out_tiles = np.empty(n, np.int64)
        out_tiles[order] = tiles
        return pa.table({
            "doc_id": g.column("doc_id"),
            "source": g.column("source"),
            "n_tokens": g.column("n_tokens"),
            "ppl_bucket": pa.array(out_tiles, pa.int64()),
        })

    return withsrc.groupby("source").map_groups(
        buckets, batch_format="pyarrow")


def q_lineitem_revenue_forecast(sf_dir: str) -> Dataset:
    """TPC-H-Q6-shaped "forecasting revenue change": one filtered
    aggregate over the fact table — the canonical predicate-pushdown
    demonstration (year window + discount band + quantity cap, all
    evaluated as Arrow masks inside the column-pruned scan; nothing
    shuffles, two int64 partials ride to one Dataset.aggregate).
    Revenue = Σ extendedprice·discount at exact 4-dp quantization."""
    import numpy as np

    LO = pa.scalar(np.datetime64("1996-01-01", "us"))
    HI = pa.scalar(np.datetime64("1997-01-01", "us"))

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(
            pc.greater_equal(b.column("l_shipdate"), LO),
            pc.less(b.column("l_shipdate"), HI)),
            pc.and_(pc.and_(
                pc.greater_equal(b.column("l_discount"),
                                 pa.scalar(0.05)),
                pc.less_equal(b.column("l_discount"), pa.scalar(0.07))),
                pc.less(b.column("l_quantity"), pa.scalar(24.0))))
        f = b.filter(m)
        rev = scaled_int_sql(
            pc.multiply(f.column("l_extendedprice"),
                        f.column("l_discount")), 10000.0)
        return pa.table({"r": pa.array([int(rev.sum())], pa.int64()),
                         "n": pa.array([f.num_rows], pa.int64())})

    g = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .aggregate(Sum("r", alias_name="r"), Sum("n", alias_name="n"))
    return rd.from_arrow(pa.table({
        "revenue": pa.array([float(int(g["r"])) / 10000.0],
                            pa.float64()),
        "n_items": pa.array([int(g["n"])], pa.int64())}))


def q_returned_item_report(sf_dir: str) -> Dataset:
    """TPC-H-Q10-shaped returned-item report: top-20 customers by
    revenue lost to returned ('R') lineitems on Q1-1996 orders.
    Scale shape: lineitem pre-aggregates exact int64 returned revenue
    per orderkey in-batch; orders is date-pruned in its scan; ONE hash
    join between those two; the per-customer aggregate then prunes to
    a global top-20 via per-block partials (topk_combine — only 20
    rows per block move); names resolve from an is_in-pruned customer
    scan over the 20 survivors."""
    import numpy as np

    LO = pa.scalar(np.datetime64("1996-01-01", "us"))
    HI = pa.scalar(np.datetime64("1996-04-01", "us"))

    def li_partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        rev = scaled_int_sql(
            pc.multiply(f.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    f.column("l_discount"))), 10000.0)
        g = pa.table({
            "l_orderkey": pc.cast(f.column("l_orderkey"), pa.int64()),
            "r": pa.array(rev, pa.int64()),
        }).group_by("l_orderkey").aggregate([("r", "sum")])
        return g.rename_columns(["l_orderkey", "p_r"])

    rev = with_schema(
        rd.read_parquet(_t(sf_dir, "lineitem"),
                        columns=["l_orderkey", "l_returnflag",
                                 "l_extendedprice", "l_discount"])
        .map_batches(li_partial, batch_format="pyarrow"),
        pa.schema([("l_orderkey", pa.int64()), ("p_r", pa.int64())]))

    orders = rd.read_parquet(
        _t(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(
            lambda b: b.filter(pc.and_(
                pc.greater_equal(b.column("o_orderdate"), LO),
                pc.less(b.column("o_orderdate"), HI)))
            .select(["o_orderkey", "o_custkey"]),
            batch_format="pyarrow")

    j = rev.join(orders, join_type="inner", num_partitions=8,
                 on=("l_orderkey",), right_on=("o_orderkey",))

    def cust_partial(b: pa.Table) -> pa.Table:
        g = pa.table({"c_custkey": pc.cast(b.column("o_custkey"),
                                           pa.int64()),
                      "r": b.column("p_r")}) \
            .group_by("c_custkey").aggregate([("r", "sum")])
        return g.rename_columns(["c_custkey", "pp_r"])

    agg = j.map_batches(cust_partial, batch_format="pyarrow") \
        .groupby("c_custkey").aggregate(Sum("pp_r", alias_name="r"))
    top = _topk_combine(
        agg, sorted_topk([("r", "descending"),
                          ("c_custkey", "ascending")], 20))
    tb = _small_table(top)
    if tb is None or tb.num_rows == 0:
        return rd.from_arrow(pa.schema([
            ("c_custkey", pa.int64()), ("c_name", pa.string()),
            ("revenue", pa.float64())]).empty_table())
    tb = tb.sort_by([("r", "descending"), ("c_custkey", "ascending")]) \
        .slice(0, 20)
    keys = pa.array(sorted(tb.column("c_custkey").to_pylist()),
                    pa.int64())
    cust = _small_table(rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_name"])
        .map_batches(
            lambda b: b.filter(pc.is_in(
                pc.cast(b.column("c_custkey"), pa.int64()),
                value_set=keys)),
            batch_format="pyarrow"))
    names = dict(zip(cust.column("c_custkey").to_pylist(),
                     cust.column("c_name").to_pylist()))
    import numpy as np
    r = tb.column("r").to_numpy(zero_copy_only=False).astype(np.float64)
    return rd.from_arrow(pa.table({
        "c_custkey": tb.column("c_custkey"),
        "c_name": pa.array([names[k] for k in
                            tb.column("c_custkey").to_pylist()]),
        "revenue": r / 10000.0,
    }))


def q_events_chi2_independence(sf_dir: str) -> Dataset:
    """Chi-square test of independence between event type and
    hour-of-day — the seasonality/uniformity check an event pipeline
    runs on a new feed.  The contingency table is a bounded grid
    (|types| × 24), so counts fold out of per-batch partials + one
    tree combine and the statistic is computed in a single final
    block.  Per-cell contributions (n−e)²/e are quantized to int64 at
    1e-6 BEFORE summation (the PMI discipline) so the cell-sum order
    cannot perturb the result; the twin replays (n−e)·(n−e)/e with
    the identical cast order, avoiding POWER() (libm pow is not
    guaranteed bit-equal to multiplication)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        g = pa.table({
            "event_type": b.column("event_type"),
            "h": pc.cast(pc.hour(b.column("ts")), pa.int64()),
        }).group_by(["event_type", "h"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "h", "p_n"])

    grid = _small_table(_tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "h"], [("p_n", "sum")],
        ["event_type", "h", "p_n"], ["event_type", "h", "n"]))
    if grid is None or grid.num_rows == 0:
        return rd.from_arrow(pa.table({
            "chi2": pa.array([], pa.float64()),
            "dof": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64())}))
    types = grid.column("event_type").to_pylist()
    hours = grid.column("h").to_pylist()
    n = grid.column("n").to_numpy(zero_copy_only=False)
    row_tot: dict = {}
    col_tot: dict = {}
    for t, h, c in zip(types, hours, n):
        row_tot[t] = row_tot.get(t, 0) + int(c)
        col_tot[h] = col_tot.get(h, 0) + int(c)
    n_tot = int(n.sum())
    # observed-zero cells contribute e (not 0) — iterate the FULL
    # R×C grid like the twin's r CROSS JOIN cl does
    seen = {(t, h): int(c) for t, h, c in zip(types, hours, n)}
    acc = 0
    for t, rn in row_tot.items():
        for h, cn in col_tot.items():
            e = float(rn) * float(cn) / float(n_tot)
            d = float(seen.get((t, h), 0)) - e
            contrib = d * d / e
            s = contrib * 1e6
            a = abs(s)
            fa = np.floor(a)
            acc += int(np.copysign(fa + 1.0 if a - fa >= 0.5 else fa, s))
    dof = (len(row_tot) - 1) * (len(col_tot) - 1)
    return rd.from_arrow(pa.table({
        "chi2": pa.array([acc / 1e6], pa.float64()),
        "dof": pa.array([dof], pa.int64()),
        "n_events": pa.array([n_tot], pa.int64())}))


def q_events_mwu_test(sf_dir: str) -> Dataset:
    """Mann–Whitney U between the purchase and click value
    distributions — the rank-based (outlier-robust) companion to
    q_events_ks_test, same distributed shape: per-batch (value, n₁,
    n₂) histogram partials, one groupby(value) exchange, then the
    rank walk runs on the aggregated support.  Everything through the
    tie-corrected rank sum stays in exact integers (2·R₁ =
    Σ a_v·(2·cum_before + n_v + 1) avoids half-ranks); U, the tie
    term Σ(t³−t) and the normal-approximation z replay the twin's
    float expression tree exactly."""
    import math

    import numpy as np

    KINDS = ("purchase", "click")

    def partial(b: pa.Table) -> pa.Table:
        m1 = pc.equal(b.column("event_type"), KINDS[0])
        m2 = pc.equal(b.column("event_type"), KINDS[1])
        keep = pc.or_(m1, m2)
        f = pa.table({
            "value": b.column("value"),
            "n1": pc.cast(m1, pa.int64()),
            "n2": pc.cast(m2, pa.int64()),
        }).filter(keep)
        g = f.group_by("value").aggregate([("n1", "sum"), ("n2", "sum")])
        return g.rename_columns(["value", "p1", "p2"])

    hist = rd.read_parquet(_t(sf_dir, "events"),
                           columns=["event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("value").aggregate(Sum("p1", alias_name="n1"),
                                    Sum("p2", alias_name="n2"))
    tb = _small_table(hist)   # bounded: the distinct-value histogram
    if tb is None or tb.num_rows == 0:
        return rd.from_arrow(pa.table({
            "u": pa.array([], pa.float64()),
            "z": pa.array([], pa.float64()),
            "n_purchase": pa.array([], pa.int64()),
            "n_click": pa.array([], pa.int64())}))
    tb = tb.sort_by("value")
    a = tb.column("n1").to_numpy(zero_copy_only=False)
    b_ = tb.column("n2").to_numpy(zero_copy_only=False)
    nv = a + b_
    cb = np.cumsum(nv) - nv
    t1 = int(a.sum())
    t2 = int(b_.sum())
    nt = t1 + t2
    r2x = int((a * (2 * cb + nv + 1)).sum())        # 2·R₁, exact
    ties = int((nv.astype(object) ** 3 - nv).sum())  # Σ t³−t, big-int
    u2x = r2x - t1 * (t1 + 1)                        # 2·U₁
    u = float(u2x) / 2.0
    var = (float(t1) * float(t2) / 12.0) \
        * (float(nt + 1)
           - float(ties) / (float(nt) * float(nt - 1)))
    z = (float(u2x) - float(t1 * t2)) / (2.0 * math.sqrt(var))
    return rd.from_arrow(pa.table({
        "u": pa.array([u], pa.float64()),
        "z": pa.array([z], pa.float64()),
        "n_purchase": pa.array([t1], pa.int64()),
        "n_click": pa.array([t2], pa.int64())}))


def q_top_supplier(sf_dir: str) -> Dataset:
    """TPC-H-Q15-shaped top supplier: the supplier(s) with maximum
    Q1-1996 revenue — the argmax-with-tie-retention shape (a LIMIT 1
    would silently drop co-leaders; the = MAX filter keeps them all).
    Scale shape: date-pruned lineitem scan → per-batch (suppkey,
    int64 revenue) partials → one supplier-grain groupby, materialized
    (dim-bounded) so the max reduction and the = max filter reuse it
    without rescanning the fact table; names resolve from an
    is_in-pruned supplier scan over the (≈1-row) survivor set."""
    import numpy as np

    LO = pa.scalar(np.datetime64("1996-01-01", "us"))
    HI = pa.scalar(np.datetime64("1996-04-01", "us"))

    def partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.and_(
            pc.greater_equal(b.column("l_shipdate"), LO),
            pc.less(b.column("l_shipdate"), HI)))
        rev = scaled_int_sql(
            pc.multiply(f.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    f.column("l_discount"))), 10000.0)
        g = pa.table({
            "s_suppkey": pc.cast(f.column("l_suppkey"), pa.int64()),
            "r": pa.array(rev, pa.int64()),
        }).group_by("s_suppkey").aggregate([("r", "sum")])
        return g.rename_columns(["s_suppkey", "p_r"])

    sr = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("s_suppkey").aggregate(Sum("p_r", alias_name="r")) \
        .materialize()
    mx = sr.aggregate(Max("r", alias_name="m"))["m"]
    if mx is None:
        return rd.from_arrow(pa.schema([
            ("s_suppkey", pa.int64()), ("s_name", pa.string()),
            ("revenue", pa.float64())]).empty_table())
    mx = int(mx)
    top = _small_table(sr.map_batches(
        lambda b: b.filter(pc.equal(b.column("r"), mx)),
        batch_format="pyarrow"))
    keys = pa.array(sorted(top.column("s_suppkey").to_pylist()),
                    pa.int64())
    sup = _small_table(rd.read_parquet(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
        .map_batches(
            lambda b: b.filter(pc.is_in(
                pc.cast(b.column("s_suppkey"), pa.int64()),
                value_set=keys)),
            batch_format="pyarrow"))
    names = dict(zip(sup.column("s_suppkey").to_pylist(),
                     sup.column("s_name").to_pylist()))
    import numpy as np
    r = top.column("r").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    return rd.from_arrow(pa.table({
        "s_suppkey": top.column("s_suppkey"),
        "s_name": pa.array([names[k] for k in
                            top.column("s_suppkey").to_pylist()]),
        "revenue": r / 10000.0,
    }))


def q_part_supplier_counts(sf_dir: str) -> Dataset:
    """TPC-H-Q16-shaped supplier diversity report: distinct suppliers
    able to supply each (brand, type, size) combination, one brand
    excluded — grouped COUNT(DISTINCT) ACROSS a dim join.  Scale
    shape: part collapses driver-side to a (partkey → group-index)
    map over its own bounded attribute grid (the grid IS the result
    frame), broadcast once; the lineitem scan rewrites each row to a
    (group, suppkey) pair with in-batch pre-dedup; one pair-grain
    exchange establishes global distinctness and a second bounded
    exchange counts per group — suppliers never collect on the
    driver."""
    import numpy as np
    import pyarrow.parquet as pq

    EXCL = "Brand#1"
    part = pq.read_table(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"])
    part = part.filter(pc.not_equal(part.column("p_brand"), EXCL))
    grid = part.select(["p_brand", "p_type", "p_size"]) \
        .group_by(["p_brand", "p_type", "p_size"]) \
        .aggregate([([], "count_all")]) \
        .select(["p_brand", "p_type", "p_size"]) \
        .sort_by([("p_brand", "ascending"), ("p_type", "ascending"),
                  ("p_size", "ascending")])
    key_of = {(b, t, s): i for i, (b, t, s) in enumerate(zip(
        grid.column("p_brand").to_pylist(),
        grid.column("p_type").to_pylist(),
        grid.column("p_size").to_pylist()))}
    gidx = pa.array(
        [key_of[(b, t, s)] for b, t, s in zip(
            part.column("p_brand").to_pylist(),
            part.column("p_type").to_pylist(),
            part.column("p_size").to_pylist())], pa.int64())
    pk = part.column("p_partkey").combine_chunks().cast(pa.int64())
    map_ref = ray.put((pk, gidx))

    def pair_partial(b: pa.Table) -> pa.Table:
        pkeys, gis = ray.get(map_ref)
        pos = pc.index_in(pc.cast(b.column("l_partkey"), pa.int64())
                          .combine_chunks(), value_set=pkeys)
        keep = pos.is_valid()
        f = b.filter(keep)
        gi = pc.take(gis, pos.filter(keep))
        g = pa.table({
            "gi": gi,
            "sk": pc.cast(f.column("l_suppkey"), pa.int64()),
        }).group_by(["gi", "sk"]).aggregate([([], "count_all")])
        return g.select(["gi", "sk"])

    pairs = rd.read_parquet(_t(sf_dir, "lineitem"),
                            columns=["l_partkey", "l_suppkey"]) \
        .map_batches(pair_partial, batch_format="pyarrow") \
        .groupby(["gi", "sk"]).aggregate(Count(alias_name="c"))

    def count_partial(b: pa.Table) -> pa.Table:
        g = b.select(["gi"]).group_by("gi") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["gi", "p_n"])

    counts = pairs.map_batches(count_partial, batch_format="pyarrow") \
        .groupby("gi").aggregate(Sum("p_n", alias_name="supplier_cnt"))

    def finish(b: pa.Table) -> pa.Table:
        gi = b.column("gi").to_numpy(zero_copy_only=False)
        return pa.table({
            "p_brand": pc.take(grid.column("p_brand"),
                               pa.array(gi, pa.int64())),
            "p_type": pc.take(grid.column("p_type"),
                              pa.array(gi, pa.int64())),
            "p_size": pc.cast(pc.take(grid.column("p_size"),
                                      pa.array(gi, pa.int64())),
                              pa.int64()),
            "supplier_cnt": b.column("supplier_cnt"),
        })

    return counts.map_batches(finish, batch_format="pyarrow")


def q_events_benford_digits(sf_dir: str) -> Dataset:
    """Benford first-significant-digit audit of the value column — the
    classic fabricated-data / unit-mixup screen.  Digit extraction is
    EXACT integer string arithmetic on both sides: value quantizes to
    positive cents (scaling by a power of ten preserves the leading
    significant digit), and the digit is the first character of the
    decimal integer — no log10/pow boundary cases to disagree on.
    Zero-cent rows drop (no significant digit).  Per-batch partials
    over the 9-row digit grid → one bounded tree combine; shares are
    each one float division of exact int64 counts."""
    import numpy as np

    def partial(b: pa.Table) -> pa.Table:
        cents = np.abs(scaled_int_sql(b.column("value"), 100.0))
        cents = cents[cents > 0]
        # first decimal digit: strip to the leading power of ten
        d = cents.copy()
        while True:
            big = d >= 10
            if not big.any():
                break
            d[big] //= 10
        counts = np.bincount(d, minlength=10)[1:10]
        return pa.table({
            "digit": pa.array(np.arange(1, 10), pa.int64()),
            "p_n": pa.array(counts, pa.int64()),
        })

    grid = _tree_combine(
        rd.read_parquet(_t(sf_dir, "events"), columns=["value"])
        .map_batches(partial, batch_format="pyarrow"),
        ["digit"], [("p_n", "sum")], ["digit", "p_n"], ["digit", "n"])

    def finish(b: pa.Table) -> pa.Table:
        import numpy as np
        n = b.column("n").to_numpy(zero_copy_only=False)
        tot = int(n.sum())
        return pa.table({
            "digit": b.column("digit"),
            "n": b.column("n"),
            "share": n.astype(np.float64) / float(tot),
        }).filter(pa.array(n > 0))

    return grid.map_batches(finish, batch_format="pyarrow",
                            batch_size=None)


def q_events_daily_autocorr(sf_dir: str) -> Dataset:
    """Lag-1 autocorrelation of the daily event count — the
    time-series health check that flags weekly seasonality loss or
    ingestion gaps.  Daily counts fold out of per-batch partials +
    one bounded tree combine (the calendar grid); consecutive-day
    pairs (strictly day+1 — a missing day breaks the pair, same as
    the twin's LAG + date filter) and the Pearson over them run in
    the single-block finish.  Counts and all five Pearson sums are
    exact integers; the twin's float expression tree is replayed at
    the end."""
    import numpy as np

    def partial(b: pa.Table) -> pa.Table:
        g = pa.table({
            "day": pc.floor_temporal(b.column("ts"), unit="day"),
        }).group_by("day").aggregate([([], "count_all")])
        return g.rename_columns(["day", "p_n"])

    grid = _small_table(_tree_combine(
        rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])
        .map_batches(partial, batch_format="pyarrow"),
        ["day"], [("p_n", "sum")], ["day", "p_n"], ["day", "n"]))
    if grid is None or grid.num_rows < 2:
        return rd.from_arrow(pa.table({
            "autocorr": pa.array([], pa.float64()),
            "n_pairs": pa.array([], pa.int64())}))
    grid = grid.sort_by("day")
    days = grid.column("day").to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    n = grid.column("n").to_numpy(zero_copy_only=False)
    DAY_US = 86_400_000_000
    consec = np.flatnonzero(np.diff(days) == DAY_US)
    if len(consec) == 0:
        return rd.from_arrow(pa.table({
            "autocorr": pa.array([], pa.float64()),
            "n_pairs": pa.array([], pa.int64())}))
    x = n[consec].astype(object)       # big-int exact sums
    y = n[consec + 1].astype(object)
    np_ = len(consec)
    sx, sy = int(x.sum()), int(y.sum())
    sxx = int((x * x).sum())
    syy = int((y * y).sum())
    sxy = int((x * y).sum())
    num = float(np_ * sxy - sx * sy)
    den = float(np_ * sxx - sx * sx) * float(np_ * syy - sy * sy)
    import math
    r = num / math.sqrt(den)
    return rd.from_arrow(pa.table({
        "autocorr": pa.array([r], pa.float64()),
        "n_pairs": pa.array([np_], pa.int64())}))


def q_events_spearman(sf_dir: str) -> Dataset:
    """Spearman rank correlation (tie-aware) between purchase value
    and time — the monotone-trend detector that Pearson-on-values
    (q_events_value_trend) can't give.  Distributed shape: one
    histogram exchange per variable turns each into an average-rank
    map (2·rank kept integral so ties cost no precision:
    r2 = 2·cum_before + n_v + 1), both maps ride one ``ray.put`` and
    rewrite rows vectorized (``index_in`` — bounded by the same ~1.2M
    cap as the sums), and the five Pearson sums over the
    (rx2, ry2) pairs ride int64 partials to one Dataset.aggregate —
    Pearson-on-average-ranks IS tie-corrected Spearman.  Everything
    until the final quotient is exact integer arithmetic; the twin
    replays the cast/sqrt tree.  int64 bound: Σ rx2²·n ≲ 4n³ caps a
    scope at ~1.2M rows — beyond that, shard the scope (e.g.
    per-day Spearman) or quantize ranks; the guard below is loud."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts", "value"]) \
        .map_batches(
            lambda b: pa.table({
                "value": b.column("value"),
                "t": pc.cast(b.column("ts"), pa.int64()),
            }).filter(pc.equal(b.column("event_type"), "purchase")),
            batch_format="pyarrow")

    def rank_map(col: str):
        def partial(b: pa.Table) -> pa.Table:
            g = b.select([col]).group_by(col) \
                .aggregate([([], "count_all")])
            return g.rename_columns([col, "p_n"])
        hist = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby(col).aggregate(Sum("p_n", alias_name="nv"))
        tb = _small_table(hist)   # bounded: the distinct-value histogram
        if tb is None:
            return None, None, 0
        tb = tb.sort_by(col)
        nv = tb.column("nv").to_numpy(zero_copy_only=False)
        cb = np.cumsum(nv) - nv
        r2 = 2 * cb + nv + 1                 # 2 × average rank, exact
        return (tb.column(col).combine_chunks(),
                pa.array(r2, pa.int64()), int(nv.sum()))

    vx, rx2, n_rows = rank_map("value")
    if n_rows == 0:
        return rd.from_arrow(pa.table({
            "rho": pa.array([], pa.float64()),
            "n": pa.array([], pa.int64())}))
    if n_rows > 1_200_000:
        raise ValueError(
            "q_events_spearman: scope holds %d rows; int64 rank-sum "
            "products overflow past ~1.2M — shard the scope or "
            "quantize ranks" % n_rows)
    vy, ry2, _ = rank_map("t")
    maps_ref = ray.put((vx, rx2, vy, ry2))

    def sums(b: pa.Table) -> pa.Table:
        mvx, mrx2, mvy, mry2 = ray.get(maps_ref)
        px = pc.index_in(b.column("value").combine_chunks(),
                         value_set=mvx)
        py = pc.index_in(b.column("t").combine_chunks(), value_set=mvy)
        x = pc.take(mrx2, px).to_numpy(zero_copy_only=False)
        y = pc.take(mry2, py).to_numpy(zero_copy_only=False)
        return pa.table({
            "n": pa.array([len(x)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64()),
        })

    g = ds.map_batches(sums, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"))
    import math
    n, sx, sy = int(g["n"]), int(g["sx"]), int(g["sy"])
    sxx, syy, sxy = int(g["sxx"]), int(g["syy"]), int(g["sxy"])
    num = float(n * sxy - sx * sy)
    den = float(n * sxx - sx * sx) * float(n * syy - sy * sy)
    rho = num / math.sqrt(den)
    return rd.from_arrow(pa.table({
        "rho": pa.array([rho], pa.float64()),
        "n": pa.array([n], pa.int64())}))


def q_customers_order_count_dist(sf_dir: str) -> Dataset:
    """TPC-H-Q13-shaped customer-distribution histogram: for each
    order count c (including 0), how many customers placed exactly c
    orders.  Scale shape: the fact table first collapses to one row
    per customer (per-batch partial counts + one int64 groupby — the
    aggregate-before-join discipline), then a hash-partitioned LEFT
    OUTER join from customer fills the zero-order bucket, and the
    histogram itself is a per-batch partial over a key domain bounded
    by max-orders-per-customer (tiny), so the final groupby moves at
    most a few dozen rows per block.  No broadcast of either fact —
    both sides stay distributed (at 100 TB customer is fact-sized)."""
    per_cust = with_schema(
        rd.read_parquet(_t(sf_dir, "orders"), columns=["o_custkey"])
        .map_batches(
            lambda b: pa.table({
                "k": pc.cast(b.column("o_custkey"), pa.int64())})
            .group_by("k").aggregate([([], "count_all")])
            .rename_columns(["k", "c"]),
            batch_format="pyarrow")
        .groupby("k").aggregate(Sum("c", alias_name="c_count")),
        pa.schema([("k", pa.int64()), ("c_count", pa.int64())]))

    j = rd.read_parquet(_t(sf_dir, "customer"), columns=["c_custkey"]) \
        .join(per_cust, join_type="left_outer", num_partitions=8,
              on=("c_custkey",), right_on=("k",))

    def hist_partial(b: pa.Table) -> pa.Table:
        cc = pc.coalesce(b.column("c_count"), pa.scalar(0, pa.int64()))
        g = pa.table({"c_count": cc}).group_by("c_count") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["c_count", "p_n"])

    return with_schema(
        j.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("c_count").aggregate(Sum("p_n", alias_name="custdist")),
        pa.schema([("c_count", pa.int64()), ("custdist", pa.int64())]))


def q_small_quantity_revenue(sf_dir: str) -> Dataset:
    """TPC-H-Q17-shaped small-quantity-order revenue: total revenue of
    Brand#23 lineitems whose quantity is below 20 % of that part's own
    average quantity — the correlated-scalar-per-part shape.  The
    threshold test is the exact integer cross-multiply
    5·qty·count(part) < sum_qty(part) (quantities are integral here;
    no float average, no division), replayed verbatim in the twin.
    Scale shape: the brand keys are dim-sided (one ray.put); the
    per-part (sum, count) aggregate is bounded by the brand's part
    count (1/|brands| of a dim table), so it rides a second broadcast;
    lineitem is scanned twice, column-pruned, and never shuffles."""
    import numpy as np
    import pyarrow.parquet as pq

    BRAND = "Brand#23"
    part = pq.read_table(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_brand"])
    bkeys = part.filter(pc.equal(part.column("p_brand"), BRAND)) \
        .column("p_partkey").combine_chunks().cast(pa.int64())
    bkeys_ref = ray.put(bkeys)

    def stats_partial(b: pa.Table) -> pa.Table:
        pk = pc.cast(b.column("l_partkey"), pa.int64())
        f = pa.table({
            "pk": pk,
            "q": pc.cast(b.column("l_quantity"), pa.int64()),
        }).filter(pc.is_in(pk, value_set=ray.get(bkeys_ref)))
        g = f.group_by("pk").aggregate([("q", "sum"),
                                        ([], "count_all")])
        return g.rename_columns(["pk", "sq", "cq"])

    stats = _small_table(with_schema(
        rd.read_parquet(_t(sf_dir, "lineitem"),
                        columns=["l_partkey", "l_quantity"])
        .map_batches(stats_partial, batch_format="pyarrow")
        .groupby("pk").aggregate(Sum("sq", alias_name="sq"),
                                 Sum("cq", alias_name="cq")),
        pa.schema([("pk", pa.int64()), ("sq", pa.int64()),
                   ("cq", pa.int64())])))
    if stats is None:
        return rd.from_arrow(pa.table({
            "small_qty_revenue": pa.array([0.0], pa.float64()),
            "n_items": pa.array([0], pa.int64())}))
    stats_ref = ray.put((
        stats.column("pk").combine_chunks(),
        stats.column("sq").to_numpy(zero_copy_only=False),
        stats.column("cq").to_numpy(zero_copy_only=False)))

    def rev_partial(b: pa.Table) -> pa.Table:
        pk_all, sq, cq = ray.get(stats_ref)
        pos = pc.index_in(pc.cast(b.column("l_partkey"), pa.int64())
                          .combine_chunks(), value_set=pk_all)
        keep = pos.is_valid()
        f = b.filter(keep)
        idx = pos.filter(keep).to_numpy(zero_copy_only=False)
        qty = pc.cast(f.column("l_quantity"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        small = 5 * qty * cq[idx] < sq[idx]
        cents = scaled_int_sql(f.column("l_extendedprice"), 100.0)
        return pa.table({
            "r": pa.array([int(cents[small].sum())], pa.int64()),
            "n": pa.array([int(small.sum())], pa.int64())})

    g = rd.read_parquet(_t(sf_dir, "lineitem"),
                        columns=["l_partkey", "l_quantity",
                                 "l_extendedprice"]) \
        .map_batches(rev_partial, batch_format="pyarrow") \
        .aggregate(Sum("r", alias_name="r"), Sum("n", alias_name="n"))
    return rd.from_arrow(pa.table({
        "small_qty_revenue": pa.array([float(int(g["r"])) / 100.0],
                                      pa.float64()),
        "n_items": pa.array([int(g["n"])], pa.int64())}))


def q_brand_size_revenue(sf_dir: str) -> Dataset:
    """TPC-H-Q19-shaped disjunctive-predicate revenue: one filtered
    aggregate whose predicate is an OR of three (brand, size-range,
    quantity-range) branches — the classic "discounted revenue"
    shape that defeats naive predicate pushdown.  Scale shape: part
    is dim-sided, so each branch's partkey set rides ONE ray.put
    broadcast into the column-pruned lineitem scan; the per-batch
    mask is three vectorized is_in ∧ between tests OR'd together;
    two int64 partials ride to one global aggregate.  Nothing
    shuffles and the fact table is read once."""
    import numpy as np
    import pyarrow.parquet as pq

    BRANCHES = [("Brand#12", 1, 15, 1.0, 15.0),
                ("Brand#23", 10, 30, 10.0, 25.0),
                ("Brand#3", 20, 50, 20.0, 35.0)]
    part = pq.read_table(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_brand", "p_size"])
    sets = []
    for brand, slo, shi, _, _ in BRANCHES:
        m = pc.and_(pc.equal(part.column("p_brand"), brand),
                    pc.and_(pc.greater_equal(part.column("p_size"),
                                             pa.scalar(slo, pa.int32())),
                            pc.less_equal(part.column("p_size"),
                                          pa.scalar(shi, pa.int32()))))
        sets.append(part.filter(m).column("p_partkey")
                    .combine_chunks().cast(pa.int64()))
    sets_ref = ray.put(sets)

    def partial(b: pa.Table) -> pa.Table:
        branch_keys = ray.get(sets_ref)
        pk = pc.cast(b.column("l_partkey"), pa.int64()).combine_chunks()
        qty = b.column("l_quantity")
        mask = pa.array([False] * b.num_rows, pa.bool_())
        for (_, _, _, qlo, qhi), keys in zip(BRANCHES, branch_keys):
            bm = pc.and_(pc.is_in(pk, value_set=keys),
                         pc.and_(pc.greater_equal(qty, pa.scalar(qlo)),
                                 pc.less_equal(qty, pa.scalar(qhi))))
            mask = pc.or_(mask, bm)
        f = b.filter(mask)
        rev = scaled_int_sql(
            pc.multiply(f.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    f.column("l_discount"))), 10000.0)
        return pa.table({"r": pa.array([int(rev.sum())], pa.int64()),
                         "n": pa.array([f.num_rows], pa.int64())})

    g = rd.read_parquet(_t(sf_dir, "lineitem"),
                        columns=["l_partkey", "l_quantity",
                                 "l_extendedprice", "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .aggregate(Sum("r", alias_name="r"), Sum("n", alias_name="n"))
    return rd.from_arrow(pa.table({
        "revenue": pa.array([float(int(g["r"])) / 10000.0],
                            pa.float64()),
        "n_items": pa.array([int(g["n"])], pa.int64())}))


def q_lineitem_priority_counts(sf_dir: str) -> Dataset:
    """TPC-H-Q12-shaped priority line counts (shipmode → returnflag —
    this corpus has no l_shipmode): per return flag within a two-year
    ship window, how many lineitems belong to high-priority orders
    (1-URGENT / 2-HIGH) vs low.  Scale shape: lineitem collapses to
    per-(orderkey, flag) partial counts BEFORE the join (aggregate-
    before-join), the orders side is column-pruned, the join is
    Ray's hash-partitioned inner join, and the post-join partial
    groups on the ≤ (flags × 2)-row (flag, is_high) domain, so the
    final exchange is a handful of rows per block."""
    import numpy as np

    LO = pa.scalar(np.datetime64("1996-01-01", "us"))
    HI = pa.scalar(np.datetime64("1998-01-01", "us"))
    HIGH = pa.array(["1-URGENT", "2-HIGH"], pa.string())

    def li_partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(b.column("l_shipdate"), LO),
                    pc.less(b.column("l_shipdate"), HI))
        f = pa.table({
            "k": pc.cast(b.column("l_orderkey"), pa.int64()),
            "flag": b.column("l_returnflag"),
        }).filter(m)
        g = f.group_by(["k", "flag"]).aggregate([([], "count_all")])
        return g.rename_columns(["k", "flag", "c"])

    li = with_schema(
        rd.read_parquet(_t(sf_dir, "lineitem"),
                        columns=["l_orderkey", "l_returnflag",
                                 "l_shipdate"])
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby(["k", "flag"]).aggregate(Sum("c", alias_name="c")),
        pa.schema([("k", pa.int64()), ("flag", pa.string()),
                   ("c", pa.int64())]))

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderpriority"])
    j = li.join(orders, join_type="inner", num_partitions=8,
                on=("k",), right_on=("o_orderkey",))

    def split_partial(b: pa.Table) -> pa.Table:
        hi = pc.is_in(b.column("o_orderpriority"), value_set=HIGH)
        c = b.column("c").to_numpy(zero_copy_only=False)
        him = hi.to_numpy(zero_copy_only=False)
        g = pa.table({
            "l_returnflag": b.column("flag"),
            "h": pa.array(np.where(him, c, 0), pa.int64()),
            "l": pa.array(np.where(him, 0, c), pa.int64()),
        }).group_by("l_returnflag").aggregate([("h", "sum"),
                                               ("l", "sum")])
        return g.rename_columns(["l_returnflag", "p_h", "p_l"])

    return j.map_batches(split_partial, batch_format="pyarrow") \
        .groupby("l_returnflag") \
        .aggregate(Sum("p_h", alias_name="high_line_count"),
                   Sum("p_l", alias_name="low_line_count"))


def q_national_market_share(sf_dir: str) -> Dataset:
    """TPC-H-Q8-shaped national market share: of all STANDARD-part
    revenue sold to ASIA-region customers, what fraction was supplied
    by NATION_2, per order year.  Scale shape: part and supplier are
    dim-sided (STANDARD partkeys and the target-nation suppkey set
    ride one ray.put each); lineitem pre-aggregates exact int64
    (revenue, target_revenue) per orderkey in-batch; the two joins —
    against the pruned orders scan and against the ASIA-filtered
    customer scan — are Ray hash joins between aggregates, never raw
    facts; the final groupby is ≤ #years rows."""
    import numpy as np
    import pyarrow.parquet as pq

    TARGET_NATION = 2
    REGION = "ASIA"
    part = pq.read_table(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_type"])
    std = part.filter(pc.equal(part.column("p_type"), "STANDARD")) \
        .column("p_partkey").combine_chunks().cast(pa.int64())
    sup = pq.read_table(_t(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_nationkey"])
    tgt = sup.filter(pc.equal(pc.cast(sup.column("s_nationkey"),
                                      pa.int64()),
                              pa.scalar(TARGET_NATION, pa.int64()))) \
        .column("s_suppkey").combine_chunks().cast(pa.int64())
    reg = pq.read_table(_t(sf_dir, "region"),
                        columns=["r_regionkey", "r_name"])
    rkey = reg.filter(pc.equal(reg.column("r_name"), REGION)) \
        .column("r_regionkey").cast(pa.int64())
    nat = pq.read_table(_t(sf_dir, "nation"),
                        columns=["n_nationkey", "n_regionkey"])
    asia = nat.filter(pc.is_in(pc.cast(nat.column("n_regionkey"),
                                       pa.int64()), value_set=rkey)) \
        .column("n_nationkey").combine_chunks().cast(pa.int64())
    dims_ref = ray.put((std, tgt, asia))

    def li_partial(b: pa.Table) -> pa.Table:
        stdk, tgtk, _ = ray.get(dims_ref)
        pk = pc.cast(b.column("l_partkey"), pa.int64()).combine_chunks()
        f = b.filter(pc.is_in(pk, value_set=stdk))
        rev = scaled_int_sql(
            pc.multiply(f.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    f.column("l_discount"))), 10000.0)
        is_t = pc.is_in(pc.cast(f.column("l_suppkey"), pa.int64())
                        .combine_chunks(), value_set=tgtk) \
            .to_numpy(zero_copy_only=False)
        g = pa.table({
            "k": pc.cast(f.column("l_orderkey"), pa.int64()),
            "r": pa.array(rev, pa.int64()),
            "tr": pa.array(np.where(is_t, rev, 0), pa.int64()),
        }).group_by("k").aggregate([("r", "sum"), ("tr", "sum")])
        return g.rename_columns(["k", "r", "tr"])

    rev = with_schema(
        rd.read_parquet(_t(sf_dir, "lineitem"),
                        columns=["l_orderkey", "l_partkey", "l_suppkey",
                                 "l_extendedprice", "l_discount"])
        .map_batches(li_partial, batch_format="pyarrow")
        .groupby("k").aggregate(Sum("r", alias_name="r"),
                                Sum("tr", alias_name="tr")),
        pa.schema([("k", pa.int64()), ("r", pa.int64()),
                   ("tr", pa.int64())]))

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate"]) \
        .map_batches(
            lambda b: pa.table({
                "o_orderkey": pc.cast(b.column("o_orderkey"),
                                      pa.int64()),
                "o_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
                "o_year": pc.cast(pc.year(b.column("o_orderdate")),
                                  pa.int64())}),
            batch_format="pyarrow")
    j1 = rev.join(orders, join_type="inner", num_partitions=8,
                  on=("k",), right_on=("o_orderkey",))

    per_cust = with_schema(
        j1.map_batches(
            lambda b: b.select(["o_custkey", "o_year", "r", "tr"])
            .group_by(["o_custkey", "o_year"])
            .aggregate([("r", "sum"), ("tr", "sum")])
            .rename_columns(["o_custkey", "o_year", "r", "tr"]),
            batch_format="pyarrow")
        .groupby(["o_custkey", "o_year"])
        .aggregate(Sum("r", alias_name="r"), Sum("tr", alias_name="tr")),
        pa.schema([("o_custkey", pa.int64()), ("o_year", pa.int64()),
                   ("r", pa.int64()), ("tr", pa.int64())]))

    cust = with_schema(
        rd.read_parquet(_t(sf_dir, "customer"),
                        columns=["c_custkey", "c_nationkey"])
        .map_batches(
            lambda b: pa.table({
                "c_custkey": pc.cast(
                    b.column("c_custkey"), pa.int64()).combine_chunks()
            }).filter(pc.is_in(
                pc.cast(b.column("c_nationkey"), pa.int64())
                .combine_chunks(), value_set=ray.get(dims_ref)[2])),
            batch_format="pyarrow"),
        pa.schema([("c_custkey", pa.int64())]))
    j2 = per_cust.join(cust, join_type="inner", num_partitions=8,
                       on=("o_custkey",), right_on=("c_custkey",))

    agg = j2.map_batches(
        lambda b: b.select(["o_year", "r", "tr"]).group_by("o_year")
        .aggregate([("r", "sum"), ("tr", "sum")])
        .rename_columns(["o_year", "p_r", "p_tr"]),
        batch_format="pyarrow") \
        .groupby("o_year").aggregate(Sum("p_r", alias_name="r"),
                                     Sum("p_tr", alias_name="tr"))

    def finish(b: pa.Table) -> pa.Table:
        r = b.column("r").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        t = b.column("tr").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "o_year": b.column("o_year"),
            "mkt_share": t / r,
            "market_revenue": r / 10000.0,
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_product_profit_by_nation(sf_dir: str) -> Dataset:
    """TPC-H-Q9-shaped product-type profit: per (supplier nation, ship
    year), Σ revenue − cost over parts whose name contains 'bolt'.
    This corpus has no partsupp, so cost = p_retailprice·quantity
    (the adaptation is in the twin too).  Profit stays exact int64 at
    4 dp: ROUND of extprice·(1−disc)·10⁴, minus retail_cents·qty·100.  Scale
    shape: part and supplier are dim-sided lookups (one ray.put);
    ONE column-pruned lineitem scan, per-batch partial profit per
    (nationkey, year), final groupby ≤ nations×years rows.  No join
    ever touches the fact table."""
    import numpy as np
    import pyarrow.parquet as pq

    part = pq.read_table(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_name",
                                  "p_retailprice"])
    m = pc.match_substring(part.column("p_name"), "bolt")
    pf = part.filter(m)
    pkeys = pf.column("p_partkey").combine_chunks().cast(pa.int64())
    rcents = scaled_int_sql(pf.column("p_retailprice"), 100.0)
    sup = pq.read_table(_t(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_nationkey"])
    skeys = sup.column("s_suppkey").combine_chunks().cast(pa.int64())
    snat = sup.column("s_nationkey").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    dims_ref = ray.put((pkeys, rcents, skeys, snat))

    def partial(b: pa.Table) -> pa.Table:
        pkeys, rcents, skeys, snat = ray.get(dims_ref)
        pos = pc.index_in(pc.cast(b.column("l_partkey"), pa.int64())
                          .combine_chunks(), value_set=pkeys)
        keep = pos.is_valid()
        f = b.filter(keep)
        pidx = pos.filter(keep).to_numpy(zero_copy_only=False)
        spos = pc.index_in(pc.cast(f.column("l_suppkey"), pa.int64())
                           .combine_chunks(), value_set=skeys) \
            .to_numpy(zero_copy_only=False)
        qty = pc.cast(f.column("l_quantity"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        rev = scaled_int_sql(
            pc.multiply(f.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    f.column("l_discount"))), 10000.0)
        profit = rev - rcents[pidx] * qty * 100
        g = pa.table({
            "nat": pa.array(snat[spos], pa.int64()),
            "o_year": pc.cast(pc.year(f.column("l_shipdate")),
                              pa.int64()),
            "p": pa.array(profit, pa.int64()),
        }).group_by(["nat", "o_year"]).aggregate([("p", "sum")])
        return g.rename_columns(["nat", "o_year", "pp"])

    agg = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate",
                 "l_extendedprice", "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["nat", "o_year"]).aggregate(Sum("pp", alias_name="p"))

    nat = pq.read_table(_t(sf_dir, "nation"),
                        columns=["n_nationkey", "n_name"])
    name_by_key = dict(zip(
        (int(k) for k in nat.column("n_nationkey").to_pylist()),
        nat.column("n_name").to_pylist()))

    def finish(b: pa.Table) -> pa.Table:
        p = b.column("p").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "nation": pa.array([name_by_key[k] for k in
                                b.column("nat").to_pylist()]),
            "o_year": b.column("o_year"),
            "profit": p / 10000.0,
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_min_balance_supplier(sf_dir: str) -> Dataset:
    """TPC-H-Q2-shaped minimum-cost supplier: for each SMALL part of
    size ≤ 10, the EUROPE-region supplier with the lowest account
    balance among suppliers who actually shipped that part (this
    corpus has no partsupp, so the part↔supplier relation is the
    DISTINCT (l_partkey, l_suppkey) derived from lineitem, and
    "cost" = s_acctbal), top-100 by balance descending.  Scale
    shape: the fact collapses to distinct pairs via per-batch group
    + one pair groupby; the per-part minimum is an int64 Min over a
    packed ((cents+offset)<<32 | suppkey) key, so (balance, suppkey)
    tie-breaking is ONE aggregate, not a window; part and supplier
    attributes are dim-sided broadcasts; output is result-bounded."""
    import numpy as np
    import pyarrow.parquet as pq

    OFF = 1 << 40  # acctbal cents can be negative; offset keeps packs positive
    part = pq.read_table(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_name", "p_type",
                                  "p_size"])
    pf = part.filter(pc.and_(
        pc.equal(part.column("p_type"), "SMALL"),
        pc.less_equal(part.column("p_size"), pa.scalar(10, pa.int32()))))
    pkeys = pf.column("p_partkey").combine_chunks().cast(pa.int64())
    pname_by_key = dict(zip(pf.column("p_partkey").to_pylist(),
                            pf.column("p_name").to_pylist()))

    reg = pq.read_table(_t(sf_dir, "region"),
                        columns=["r_regionkey", "r_name"])
    rkey = reg.filter(pc.equal(reg.column("r_name"), "EUROPE")) \
        .column("r_regionkey").cast(pa.int64())
    nat = pq.read_table(_t(sf_dir, "nation"),
                        columns=["n_nationkey", "n_name",
                                 "n_regionkey"])
    eu = nat.filter(pc.is_in(pc.cast(nat.column("n_regionkey"),
                                     pa.int64()), value_set=rkey))
    eu_keys = set(int(k) for k in eu.column("n_nationkey").to_pylist())
    nname_by_key = dict(zip(
        (int(k) for k in eu.column("n_nationkey").to_pylist()),
        eu.column("n_name").to_pylist()))

    sup = pq.read_table(_t(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_name", "s_acctbal",
                                 "s_nationkey"])
    snat = sup.column("s_nationkey").to_numpy(zero_copy_only=False)
    eu_mask = np.isin(snat, np.array(sorted(eu_keys), dtype=snat.dtype))
    sf_tab = sup.filter(pa.array(eu_mask))
    skeys = sf_tab.column("s_suppkey").combine_chunks().cast(pa.int64())
    scents = scaled_int_sql(sf_tab.column("s_acctbal"), 100.0)
    sup_info = {int(k): (sf_tab.column("s_name")[i].as_py(),
                         float(sf_tab.column("s_acctbal")[i].as_py()),
                         nname_by_key[int(sf_tab.column("s_nationkey")[i]
                                          .as_py())])
                for i, k in enumerate(skeys.to_pylist())}
    dims_ref = ray.put((pkeys, skeys, scents))

    def pair_partial(b: pa.Table) -> pa.Table:
        pkeys, skeys, scents = ray.get(dims_ref)
        pk = pc.cast(b.column("l_partkey"), pa.int64()).combine_chunks()
        f = b.filter(pc.is_in(pk, value_set=pkeys))
        spos = pc.index_in(pc.cast(f.column("l_suppkey"), pa.int64())
                           .combine_chunks(), value_set=skeys)
        keep = spos.is_valid()
        f2 = f.filter(keep)
        sidx = spos.filter(keep).to_numpy(zero_copy_only=False)
        sk = pc.cast(f2.column("l_suppkey"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        packed = (scents[sidx] + OFF) * (1 << 32) + sk
        g = pa.table({
            "pk": pc.cast(f2.column("l_partkey"), pa.int64()),
            "m": pa.array(packed, pa.int64()),
        }).group_by("pk").aggregate([("m", "min")])
        return g.rename_columns(["pk", "m"])

    best = _small_table(with_schema(
        rd.read_parquet(_t(sf_dir, "lineitem"),
                        columns=["l_partkey", "l_suppkey"])
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby("pk").aggregate(Min("m", alias_name="m")),
        pa.schema([("pk", pa.int64()), ("m", pa.int64())])))
    if best is None:
        return rd.from_arrow(pa.schema([
            ("s_acctbal", pa.float64()), ("s_name", pa.string()),
            ("n_name", pa.string()), ("p_partkey", pa.int64()),
            ("p_name", pa.string())]).empty_table())

    pks = best.column("pk").to_pylist()
    sks = [int(m) & ((1 << 32) - 1) for m in best.column("m").to_pylist()]
    rows = sorted(
        ((sup_info[sk][1], sup_info[sk][0], sup_info[sk][2],
          int(pk), pname_by_key[pk])
         for pk, sk in zip(pks, sks)),
        key=lambda r: (-r[0], r[3]))[:100]
    return rd.from_arrow(pa.table({
        "s_acctbal": pa.array([r[0] for r in rows], pa.float64()),
        "s_name": pa.array([r[1] for r in rows], pa.string()),
        "n_name": pa.array([r[2] for r in rows], pa.string()),
        "p_partkey": pa.array([r[3] for r in rows], pa.int64()),
        "p_name": pa.array([r[4] for r in rows], pa.string()),
    }))


def q_top_share_suppliers(sf_dir: str) -> Dataset:
    """TPC-H-Q20-shaped dominant suppliers: suppliers who shipped
    MORE THAN AN EIGHTH (>12.5 %, the threshold that binds in this
    uniformly-assigned corpus) of the total shipped quantity of at
    least one 'small %'-named part, with how many such parts each
    dominates (no partsupp here, so "availqty > half of sold" becomes
    "supplied > share of shipped" — the nested-correlated-IN shape
    survives).
    Scale shape: the fact collapses to per-(part, supplier) int64
    quantity sums; part totals are a second groupby over that
    aggregate (never the raw fact); the share test joins aggregate
    to aggregate; supplier/nation names are dim-sided."""
    import numpy as np
    import pyarrow.parquet as pq

    part = pq.read_table(_t(sf_dir, "part"),
                         columns=["p_partkey", "p_name"])
    pkeys = part.filter(pc.starts_with(part.column("p_name"), "small")) \
        .column("p_partkey").combine_chunks().cast(pa.int64())
    pkeys_ref = ray.put(pkeys)

    def pair_partial(b: pa.Table) -> pa.Table:
        pk = pc.cast(b.column("l_partkey"), pa.int64()).combine_chunks()
        f = pa.table({
            "pk": pk,
            "sk": pc.cast(b.column("l_suppkey"), pa.int64()),
            "q": pc.cast(b.column("l_quantity"), pa.int64()),
        }).filter(pc.is_in(pk, value_set=ray.get(pkeys_ref)))
        g = f.group_by(["pk", "sk"]).aggregate([("q", "sum")])
        return g.rename_columns(["pk", "sk", "q"])

    pair = with_schema(
        rd.read_parquet(_t(sf_dir, "lineitem"),
                        columns=["l_partkey", "l_suppkey",
                                 "l_quantity"])
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["pk", "sk"]).aggregate(Sum("q", alias_name="sq")),
        pa.schema([("pk", pa.int64()), ("sk", pa.int64()),
                   ("sq", pa.int64())]))

    tot = with_schema(
        pair.map_batches(
            lambda b: b.select(["pk", "sq"]).group_by("pk")
            .aggregate([("sq", "sum")]).rename_columns(["pk", "ptq"]),
            batch_format="pyarrow")
        .groupby("pk").aggregate(Sum("ptq", alias_name="tq")),
        pa.schema([("pk", pa.int64()), ("tq", pa.int64())]))

    j = pair.join(tot, join_type="inner", num_partitions=8,
                  on=("pk",), right_on=("pk",))

    def dom_partial(b: pa.Table) -> pa.Table:
        sq = b.column("sq").to_numpy(zero_copy_only=False)
        tq = b.column("tq").to_numpy(zero_copy_only=False)
        f = b.filter(pa.array(8 * sq > tq))
        g = f.select(["sk"]).group_by("sk") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["sk", "c"])

    dom = _small_table(with_schema(
        j.map_batches(dom_partial, batch_format="pyarrow")
        .groupby("sk").aggregate(Sum("c", alias_name="n_parts")),
        pa.schema([("sk", pa.int64()), ("n_parts", pa.int64())])))
    if dom is None:
        return rd.from_arrow(pa.schema([
            ("s_name", pa.string()), ("n_name", pa.string()),
            ("n_parts", pa.int64())]).empty_table())

    sup = pq.read_table(_t(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_name", "s_nationkey"])
    nat = pq.read_table(_t(sf_dir, "nation"),
                        columns=["n_nationkey", "n_name"])
    nname = dict(zip((int(k) for k in
                      nat.column("n_nationkey").to_pylist()),
                     nat.column("n_name").to_pylist()))
    sinfo = {int(k): (n, nname[int(nk)]) for k, n, nk in
             zip(sup.column("s_suppkey").to_pylist(),
                 sup.column("s_name").to_pylist(),
                 sup.column("s_nationkey").to_pylist())}
    sks = dom.column("sk").to_pylist()
    return rd.from_arrow(pa.table({
        "s_name": pa.array([sinfo[k][0] for k in sks], pa.string()),
        "n_name": pa.array([sinfo[k][1] for k in sks], pa.string()),
        "n_parts": dom.column("n_parts"),
    }))


def q_sole_returning_suppliers(sf_dir: str) -> Dataset:
    """TPC-H-Q21-shaped "suppliers who kept orders waiting": suppliers
    with a returned ('R') lineitem on a multi-supplier order where NO
    other supplier on that order returned (this corpus has no commit/
    receipt dates, so "late" becomes "returned" — the EXISTS + NOT
    EXISTS double correlation on the same fact survives intact).
    Scale shape: two stacked fact aggregates — (order, supplier)
    any-R, then per-order (n_suppliers, n_returners, Σ ret·suppkey);
    when exactly one supplier returned, Σ ret·suppkey IS that
    supplier, so the whole double-correlated predicate needs no
    self-join at all; names are dim-sided at the end."""
    import numpy as np
    import pyarrow.parquet as pq

    def pair_partial(b: pa.Table) -> pa.Table:
        ret = pc.cast(pc.equal(b.column("l_returnflag"), "R"),
                      pa.int64())
        g = pa.table({
            "k": pc.cast(b.column("l_orderkey"), pa.int64()),
            "sk": pc.cast(b.column("l_suppkey"), pa.int64()),
            "ret": ret,
        }).group_by(["k", "sk"]).aggregate([("ret", "max")])
        return g.rename_columns(["k", "sk", "ret"])

    pair = with_schema(
        rd.read_parquet(_t(sf_dir, "lineitem"),
                        columns=["l_orderkey", "l_suppkey",
                                 "l_returnflag"])
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["k", "sk"]).aggregate(Max("ret", alias_name="ret")),
        pa.schema([("k", pa.int64()), ("sk", pa.int64()),
                   ("ret", pa.int64())]))

    def order_partial(b: pa.Table) -> pa.Table:
        ret = b.column("ret").to_numpy(zero_copy_only=False)
        sk = b.column("sk").to_numpy(zero_copy_only=False)
        g = pa.table({
            "k": b.column("k"),
            "n": pa.array(np.ones(len(sk), np.int64)),
            "nr": b.column("ret"),
            "rsk": pa.array(ret * sk, pa.int64()),
        }).group_by("k").aggregate([("n", "sum"), ("nr", "sum"),
                                    ("rsk", "sum")])
        return g.rename_columns(["k", "n", "nr", "rsk"])

    orders = with_schema(
        pair.map_batches(order_partial, batch_format="pyarrow")
        .groupby("k").aggregate(Sum("n", alias_name="n"),
                                Sum("nr", alias_name="nr"),
                                Sum("rsk", alias_name="rsk")),
        pa.schema([("k", pa.int64()), ("n", pa.int64()),
                   ("nr", pa.int64()), ("rsk", pa.int64())]))

    def waiter_partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater(b.column("n"), pa.scalar(1, pa.int64())),
                    pc.equal(b.column("nr"), pa.scalar(1, pa.int64())))
        f = b.filter(m)
        g = pa.table({"sk": f.column("rsk")}).group_by("sk") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["sk", "c"])

    waiters = _small_table(with_schema(
        orders.map_batches(waiter_partial, batch_format="pyarrow")
        .groupby("sk").aggregate(Sum("c", alias_name="numwait")),
        pa.schema([("sk", pa.int64()), ("numwait", pa.int64())])))
    if waiters is None:
        return rd.from_arrow(pa.schema([
            ("s_name", pa.string()),
            ("numwait", pa.int64())]).empty_table())

    sup = pq.read_table(_t(sf_dir, "supplier"),
                        columns=["s_suppkey", "s_name"])
    sname = dict(zip((int(k) for k in
                      sup.column("s_suppkey").to_pylist()),
                     sup.column("s_name").to_pylist()))
    return rd.from_arrow(pa.table({
        "s_name": pa.array([sname[int(k)] for k in
                            waiters.column("sk").to_pylist()],
                           pa.string()),
        "numwait": waiters.column("numwait"),
    }))


# the fixed event-type domain of this corpus, in the summation order the
# grouped statistical tests' float expression trees replay (alphabetical,
# left-associated) — both sides of each oracle iterate it identically
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_events_anova_f(sf_dir: str) -> Dataset:
    """One-way ANOVA F test of event value across the five event
    types — the parametric companion to the Kruskal–Wallis rank test.
    Distributed shape: ONE column-pruned scan folding per-type
    (n, Σcents, Σcents²) int64 partials per batch into a 5-row
    aggregate; every moment stays exact integer.  The float F
    statistic is then a fixed expression tree — per-type s²/n terms
    summed in the declared EVENT_TYPES order (left-associated, the
    same chain the twin spells out) — so no summation-order
    nondeterminism can perturb the last ulp."""
    import numpy as np

    def partial(b: pa.Table) -> pa.Table:
        cents = np.asarray(scaled_int_sql(b.column("value"), 100.0))
        et = b.column("event_type")
        cols: dict = {}
        for t in EVENT_TYPES:
            m = pc.equal(et, t).to_numpy(zero_copy_only=False)
            cols[f"n_{t}"] = pa.array([int(m.sum())], pa.int64())
            cols[f"s_{t}"] = pa.array([int(cents[m].sum())], pa.int64())
            cols[f"ss_{t}"] = pa.array(
                [int((cents[m] * cents[m]).sum())], pa.int64())
        return pa.table(cols)

    aggs = []
    for t in EVENT_TYPES:
        aggs += [Sum(f"n_{t}", alias_name=f"n_{t}"),
                 Sum(f"s_{t}", alias_name=f"s_{t}"),
                 Sum(f"ss_{t}", alias_name=f"ss_{t}")]
    g = rd.read_parquet(_t(sf_dir, "events"),
                        columns=["event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow").aggregate(*aggs)

    n = {t: int(g[f"n_{t}"]) for t in EVENT_TYPES}
    s = {t: int(g[f"s_{t}"]) for t in EVENT_TYPES}
    ss = {t: int(g[f"ss_{t}"]) for t in EVENT_TYPES}
    k = len(EVENT_TYPES)
    N = sum(n.values())
    S = sum(s.values())
    SS = sum(ss.values())
    sb = 0.0
    for t in EVENT_TYPES:   # left-associated, declared order
        sb = sb + float(s[t]) * float(s[t]) / float(n[t])
    ssb = sb - float(S) * float(S) / float(N)
    ssw = float(SS) - sb
    f_stat = (ssb / float(k - 1)) / (ssw / float(N - k))
    return rd.from_arrow(pa.table({
        "f_stat": pa.array([f_stat], pa.float64()),
        "dof_between": pa.array([k - 1], pa.int64()),
        "dof_within": pa.array([N - k], pa.int64()),
        "n_events": pa.array([N], pa.int64())}))


def q_events_kruskal_wallis(sf_dir: str) -> Dataset:
    """Kruskal–Wallis H test of event value across the five event
    types — the k-sample generalization of q_events_mwu_test, same
    distributed shape: per-batch (value → per-type count) histogram
    partials, ONE groupby(value) exchange bounded by the distinct-
    value support, then the tie-aware rank walk runs on the
    aggregated histogram.  2·R_t = Σ_v n_t(v)·(2·cum_before+n_v+1)
    keeps every rank sum exact integer; H and the tie correction
    replay the twin's float tree in the declared type order."""
    import numpy as np

    def partial(b: pa.Table) -> pa.Table:
        et = b.column("event_type")
        cols = {"value": b.column("value")}
        for t in EVENT_TYPES:
            cols[f"c_{t}"] = pc.cast(pc.equal(et, t), pa.int64())
        g = pa.table(cols).group_by("value").aggregate(
            [(f"c_{t}", "sum") for t in EVENT_TYPES])
        return g.rename_columns(["value"] +
                                [f"p_{t}" for t in EVENT_TYPES])

    hist = rd.read_parquet(_t(sf_dir, "events"),
                           columns=["event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("value").aggregate(
            *[Sum(f"p_{t}", alias_name=f"n_{t}") for t in EVENT_TYPES])
    tb = _small_table(hist)   # bounded: the distinct-value histogram
    tb = tb.sort_by("value")
    per = {t: tb.column(f"n_{t}").to_numpy(zero_copy_only=False)
           for t in EVENT_TYPES}
    nv = np.sum([per[t] for t in EVENT_TYPES], axis=0)
    cb = np.cumsum(nv) - nv
    w = 2 * cb + nv + 1
    n = {t: int(per[t].sum()) for t in EVENT_TYPES}
    r2x = {t: int((per[t] * w).sum()) for t in EVENT_TYPES}
    N = sum(n.values())
    ties = int((nv.astype(object) ** 3 - nv).sum())
    sb = 0.0
    for t in EVENT_TYPES:   # left-associated, declared order
        rt = float(r2x[t]) / 2.0
        sb = sb + rt * rt / float(n[t])
    h = 12.0 / (float(N) * float(N + 1)) * sb - 3.0 * float(N + 1)
    corr = 1.0 - float(ties) / (float(N) * float(N) * float(N)
                                - float(N))
    return rd.from_arrow(pa.table({
        "h": pa.array([h], pa.float64()),
        "h_corrected": pa.array([h / corr], pa.float64()),
        "n_events": pa.array([N], pa.int64())}))


def q_events_user_gini(sf_dir: str) -> Dataset:
    """Gini coefficient of per-user event activity — the inequality
    audit a pipeline runs before per-user sampling (a skewed feed
    concentrates training signal in few users).  Distributed shape:
    the fact collapses to per-user counts (partial + one groupby),
    those collapse again to a (count → #users) histogram bounded by
    the max-activity support, and the Lorenz walk runs exactly on
    the histogram: a run of m users at count c contributes
    c·(m·i₀ + m(m+1)/2) to Σ i·xᵢ in closed form — all integer, one
    final float division."""
    import numpy as np

    per_user = with_schema(
        rd.read_parquet(_t(sf_dir, "events"), columns=["user_id"])
        .map_batches(
            lambda b: pa.table({"u": b.column("user_id")})
            .group_by("u").aggregate([([], "count_all")])
            .rename_columns(["u", "c"]),
            batch_format="pyarrow")
        .groupby("u").aggregate(Sum("c", alias_name="c")),
        pa.schema([("u", pa.int64()), ("c", pa.int64())]))

    hist = _small_table(with_schema(
        per_user.map_batches(
            lambda b: b.select(["c"]).group_by("c")
            .aggregate([([], "count_all")]).rename_columns(["c", "m"]),
            batch_format="pyarrow")
        .groupby("c").aggregate(Sum("m", alias_name="m")),
        pa.schema([("c", pa.int64()), ("m", pa.int64())])))
    hist = hist.sort_by("c")
    c = hist.column("c").to_numpy(zero_copy_only=False)
    m = hist.column("m").to_numpy(zero_copy_only=False)
    i0 = np.cumsum(m) - m
    A = int((c * (m * i0 + m * (m + 1) // 2)).sum())
    S = int((c * m).sum())
    n = int(m.sum())
    gini = float(2 * A - (n + 1) * S) / (float(n) * float(S))
    return rd.from_arrow(pa.table({
        "gini": pa.array([gini], pa.float64()),
        "n_users": pa.array([n], pa.int64()),
        "n_events": pa.array([S], pa.int64())}))


def q_events_cramers_v(sf_dir: str) -> Dataset:
    """Cramér's V association strength between event type and ISO
    day-of-week — the normalized effect size on top of the
    chi-square machinery (q_events_chi2_independence), same bounded
    |types|×7 contingency grid folded from per-batch partials + one
    tree combine.  Per-cell (n−e)²/e contributions are quantized to
    int64 at 1e-6 before summation; V = √(χ²/(N·min(r−1,c−1))) is
    one final float expression replayed in the twin."""
    import math

    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(b.column("ts")),
                     pa.scalar(1, pa.int64()))   # ISO: 1=Mon..7=Sun
        g = pa.table({
            "event_type": b.column("event_type"),
            "d": pc.cast(dow, pa.int64()),
        }).group_by(["event_type", "d"]).aggregate([([], "count_all")])
        return g.rename_columns(["event_type", "d", "p_n"])

    grid = _small_table(_tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "d"], [("p_n", "sum")],
        ["event_type", "d", "p_n"], ["event_type", "d", "n"]))
    types = grid.column("event_type").to_pylist()
    dows = grid.column("d").to_pylist()
    n = grid.column("n").to_numpy(zero_copy_only=False)
    row_tot: dict = {}
    col_tot: dict = {}
    for t, d, cnt in zip(types, dows, n):
        row_tot[t] = row_tot.get(t, 0) + int(cnt)
        col_tot[d] = col_tot.get(d, 0) + int(cnt)
    n_tot = int(n.sum())
    seen = {(t, d): int(cnt) for t, d, cnt in zip(types, dows, n)}
    acc = 0
    for t, rn in row_tot.items():
        for d, cn in col_tot.items():
            e = float(rn) * float(cn) / float(n_tot)
            diff = float(seen.get((t, d), 0)) - e
            s = diff * diff / e * 1e6
            a = abs(s)
            fa = np.floor(a)
            acc += int(np.copysign(fa + 1.0 if a - fa >= 0.5 else fa, s))
    chi2 = acc / 1e6
    mindim = min(len(row_tot) - 1, len(col_tot) - 1)
    v = math.sqrt(chi2 / (float(n_tot) * float(mindim)))
    return rd.from_arrow(pa.table({
        "cramers_v": pa.array([v], pa.float64()),
        "chi2": pa.array([chi2], pa.float64()),
        "n_events": pa.array([n_tot], pa.int64())}))


def q_embeddings_hard_negatives(sf_dir: str) -> pa.Table:
    """Hard-negative mining (contrastive-training prep): for each of the
    first 8 vectors as queries, the 5 most-cosine-similar corpus vectors
    with a DIFFERENT label — the closest wrong-class examples a
    retrieval trainer would pair with each anchor.  Broadcast matmul +
    per-batch same-label mask (stages/similarity.hard_negative_topk);
    only the ≤ k·n_batches candidate rows reach the driver merge."""
    import pyarrow.parquet as pq

    from ..stages.similarity import hard_negative_topk

    qtab = pq.read_table(_t(sf_dir, "embeddings"),
                         filters=[("vec_id", "<", 8)],
                         columns=["vec_id", "embedding", "label"]) \
        .sort_by("vec_id")
    queries = qtab.column("embedding").to_pylist()
    qids = qtab.column("vec_id").to_pylist()
    qlabels = qtab.column("label").to_pylist()
    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding", "label"])
    out = hard_negative_topk(ds, queries, qids, qlabels, k=5)
    return out.set_column(out.schema.get_field_index("cosine"), "cosine",
                          round_sql(out.column("cosine"), 6))


def q_embeddings_centroid_outliers(sf_dir: str) -> pa.Table:
    """Label-centroid outlier mining (mislabeled-example detection): per
    label, the 3 member vectors LEAST cosine-similar to their own
    label's centroid.  The centroid reuses the label_centroids
    order-independent construction — int64-quantized dim sums
    (ROUND(v·2^30)) over the bounded (label, dim) grid — so both sides
    of the oracle divide the identical exact integers; per-vector
    cosine-to-own-centroid is then one broadcast lookup per batch, and
    only (label, bottom-k) candidates reach the driver."""
    import heapq

    import numpy as np

    from ..util import vec_matrix

    DIM, SCALE = 64, float(1 << 30)
    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "label", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        lab = b.column("label").combine_chunks() \
               .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(b.column("embedding").combine_chunks()) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        c = scaled_int_sql(flat, SCALE).reshape(len(lab), DIM)
        order = np.argsort(lab, kind="stable")
        labs, starts = np.unique(lab[order], return_index=True)
        sums = np.add.reduceat(c[order], starts, axis=0)
        counts = np.diff(np.concatenate([starts, [len(lab)]]))
        return pa.table({
            "label": pa.array(np.repeat(labs, DIM), pa.int64()),
            "dim": pa.array(np.tile(np.arange(DIM), len(labs)), pa.int64()),
            "p_s": pa.array(sums.ravel(), pa.int64()),
            "p_n": pa.array(np.repeat(counts, DIM), pa.int64()),
        })

    grid = _small_table(_tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"], [("p_s", "sum"), ("p_n", "sum")],
        ["label", "dim", "p_s", "p_n"], ["label", "dim", "s", "n"]))
    labs = grid.column("label").to_numpy(zero_copy_only=False)
    dims = grid.column("dim").to_numpy(zero_copy_only=False)
    s = grid.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
    n = grid.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    uniq = np.unique(labs)
    cent = np.zeros((len(uniq), DIM), np.float64)
    cent[np.searchsorted(uniq, labs), dims] = s / n / SCALE
    cent_ref = ray.put(cent)
    uniq_ref = ray.put(uniq)

    K = 3

    def score(b: pa.Table) -> pa.Table:
        import numpy as _np
        cmat = ray.get(cent_ref)
        u = ray.get(uniq_ref)
        vecs = vec_matrix(b.column("embedding"))
        lab = b.column("label").to_numpy(zero_copy_only=False) \
            .astype(_np.int64)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False) \
            .astype(_np.int64)
        own = cmat[_np.searchsorted(u, lab)]
        num = (vecs * own).sum(axis=1)
        den = _np.linalg.norm(vecs, axis=1) * _np.linalg.norm(own, axis=1)
        den[den == 0] = 1.0
        cos = num / den
        # per-label local bottom-K candidates only
        keep = _np.zeros(len(lab), bool)
        for lv in _np.unique(lab):
            idx = _np.nonzero(lab == lv)[0]
            if len(idx) > K:
                cut = _np.partition(cos[idx], K - 1)[K - 1]
                idx = idx[cos[idx] <= cut]
            keep[idx] = True
        return pa.table({
            "label": pa.array(lab[keep], pa.int64()),
            "vec_id": pa.array(ids[keep], pa.int64()),
            "cosine": pa.array(cos[keep], pa.float64()),
        })

    cands = ds.map_batches(score, batch_format="pyarrow")
    best: dict[int, list] = {}
    for b in cands.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for lv, v, c in zip(b.column("label").to_pylist(),
                            b.column("vec_id").to_pylist(),
                            b.column("cosine").to_pylist()):
            # bottom-K keep: pop the (largest cosine, then largest
            # vec_id) entry so ties resolve to the smaller vec_id —
            # the twin's ORDER BY cosine ASC, vec_id ASC
            heapq.heappush(best.setdefault(lv, []), (-c, -v))
            if len(best[lv]) > K:
                heapq.heappop(best[lv])
    l_out, v_out, c_out, r_out = [], [], [], []
    for lv in sorted(best):
        ranked = sorted(best[lv], key=lambda t: (-t[0], -t[1]))
        for rank, (negc, negv) in enumerate(ranked, 1):
            l_out.append(lv)
            v_out.append(-negv)
            c_out.append(-negc)
            r_out.append(rank)
    out = pa.table({
        "label": pa.array(l_out, pa.int64()),
        "vec_id": pa.array(v_out, pa.int64()),
        "cosine": pa.array(c_out, pa.float64()),
        "rank": pa.array(r_out, pa.int64()),
    })
    return out.set_column(out.schema.get_field_index("cosine"), "cosine",
                          round_sql(out.column("cosine"), 6))


def q_documents_leakage_safe_split(sf_dir: str) -> Dataset:
    """Leakage-safe train/val/test split: the band hash keys on the
    DOCUMENT TEXT, not the row identity, so every exact-duplicate copy
    of a text lands on the same side — the split discipline that keeps
    test answers out of train when a corpus still carries duplicates
    (complement to q_documents_train_split's doc_id banding).  Same
    stages/partition.deterministic_split machinery, same md5 CASE
    replay in the twin."""
    from ..stages.partition import deterministic_split

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "source", "text"])
    return deterministic_split(
        ds, {"train": 0.8, "val": 0.1, "test": 0.1}, ["text"]) \
        .select_columns(["doc_id", "source", "split"])


def q_documents_length_batches(sf_dir: str) -> Dataset:
    """Length-bucketed batch planning (dynamic batching for padded
    training): docs bucket by token count (128-token bands), then pack
    into fixed 32-doc batches in doc_id order within each (source,
    bucket); the plan row per batch reports its pad target (max tokens)
    and padding waste — the report that sizes bucketed-batch training
    input pipelines.  All-integer, so bit-exact by construction; the
    per-source group is the partitioning unit (same contract as
    pack_bins/ppl_buckets) and only (doc_id, n_tokens) pairs move."""
    import numpy as np

    BAND, B = 128, 32
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "source", "text"])

    def tokens(b: pa.Table) -> pa.Table:
        nt = pc.list_value_length(
            pc.split_pattern(b.column("text"), " ")).cast(pa.int64())
        return pa.table({"doc_id": b.column("doc_id"),
                         "source": b.column("source"),
                         "nt": nt})

    def plan(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        nt = g.column("nt").to_numpy(zero_copy_only=False)
        bucket = (nt + BAND - 1) // BAND
        order = np.lexsort((ids, bucket))
        bs, nts = bucket[order], nt[order]
        starts = np.nonzero(np.concatenate(
            [[True], bs[1:] != bs[:-1]]))[0]
        rn = np.arange(len(bs)) - np.repeat(
            starts, np.diff(np.concatenate([starts, [len(bs)]])))
        batch = rn // B
        key_start = np.nonzero(np.concatenate(
            [[True], (bs[1:] != bs[:-1]) | (batch[1:] != batch[:-1])]))[0]
        n_docs = np.diff(np.concatenate([key_start, [len(bs)]]))
        pad = np.maximum.reduceat(nts, key_start)
        tok_sum = np.add.reduceat(nts, key_start)
        return pa.table({
            "source": pa.array(
                [g.column("source")[0].as_py()] * len(key_start)),
            "bucket": pa.array(bs[key_start], pa.int64()),
            "batch_id": pa.array(batch[key_start], pa.int64()),
            "n_docs": pa.array(n_docs, pa.int64()),
            "pad_len": pa.array(pad, pa.int64()),
            "waste_tokens": pa.array(n_docs * pad - tok_sum, pa.int64()),
        })

    return ds.map_batches(tokens, batch_format="pyarrow") \
        .groupby("source").map_groups(plan, batch_format="pyarrow")


def q_documents_bpe_pair_counts(sf_dir: str) -> pa.Table:
    """BPE merge mining, step 1 (the Sennrich et al. 2016 inner
    statistic): corpus-wide counts of adjacent character pairs within
    whitespace words, top 20 by (count DESC, pair ASC) — the pair the
    first BPE merge would fuse.  ASCII batches read the pair codes
    straight off the flattened Arrow string buffer (one vectorized
    pass, word boundaries masked out); non-ASCII batches fall back to a
    per-word loop with identical CHARACTER-pair semantics.  The (pair)
    grid is structurally bounded (≤ alphabet²), so partials ride a tree
    combine and the top-20 sort happens on the tiny aggregate."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def partial(b: pa.Table) -> pa.Table:
        empty = pa.table({"pair": pa.array([], pa.string()),
                          "p_n": pa.array([], pa.int64())})
        flat = pc.list_flatten(
            pc.split_pattern(b.column("text"), " ")).combine_chunks()
        n = len(flat)
        if n == 0:
            return empty
        bufs = flat.buffers()
        off = np.frombuffer(bufs[1], np.int32)[
            flat.offset: flat.offset + n + 1]
        data = np.frombuffer(bufs[2], np.uint8)[off[0]: off[-1]]
        off = (off.astype(np.int64) - int(off[0]))
        if data.size and bool((data >= 128).any()):
            counts: dict[str, int] = {}
            for w in flat.to_pylist():
                for i in range(len(w) - 1):
                    p = w[i:i + 2]
                    counts[p] = counts.get(p, 0) + 1
            if not counts:
                return empty
            return pa.table({
                "pair": pa.array(list(counts), pa.string()),
                "p_n": pa.array(list(counts.values()), pa.int64())})
        if data.size < 2:
            return empty
        codes = data[:-1].astype(np.int32) * 256 + data[1:]
        valid = np.ones(data.size - 1, bool)
        # a pair starting at a word's LAST byte crosses into the next
        # word — mask it (empty words re-mark the prior end, harmless)
        ends = off[1:-1] - 1
        ends = ends[(ends >= 0) & (ends < data.size - 1)]
        valid[ends] = False
        codes = codes[valid]
        if codes.size == 0:
            return empty
        uniq, cnt = np.unique(codes, return_counts=True)
        pairs = [chr(c >> 8) + chr(c & 255) for c in uniq.tolist()]
        return pa.table({"pair": pa.array(pairs, pa.string()),
                         "p_n": pa.array(cnt, pa.int64())})

    grid = _small_table(_tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["pair"], [("p_n", "sum")], ["pair", "p_n"], ["pair", "n"]))
    if grid is None:
        return pa.table({"pair": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    import numpy as np

    pairs = grid.column("pair").to_pylist()
    cnts = grid.column("n").to_numpy(zero_copy_only=False)
    order = sorted(range(len(pairs)), key=lambda i: (-int(cnts[i]), pairs[i]))
    keep = order[:20]
    return pa.table({
        "pair": pa.array([pairs[i] for i in keep], pa.string()),
        "n": pa.array([int(cnts[i]) for i in keep], pa.int64()),
    })


def _transcript_text_dup_groups(sf_dir: str,
                                cols: tuple[str, ...] = ("conv_id",
                                                         "turn_idx",
                                                         "text")):
    """Shared scaffolding for the soft-dedup reports: transcripts with a
    vectorized 64-bit text detection key, the duplicated-key set
    (broadcast), and a splitter — the dedup_exact scan shape (payloads
    of unique rows never shuffle; full sha1 only on the rare dup
    rows)."""
    from ..stages.dedup import add_content_key, duplicated_keys

    ds = rd.read_parquet(transcript_paths(sf_dir), columns=list(cols))
    hashed = ds.map_batches(
        lambda b: add_content_key(b, ["text"]),
        batch_format="pyarrow").materialize()

    def partial_counts(b: pa.Table) -> pa.Table:
        g = b.select(["content_key"]).group_by("content_key").aggregate(
            [("content_key", "count")])
        return g.rename_columns(["content_key", "p_n"])

    dup_list = duplicated_keys(
        hashed.map_batches(partial_counts, batch_format="pyarrow"),
        "content_key", "p_n")
    dup_ref = ray.put(sorted(dup_list))

    def split(b: pa.Table, keep_dups: bool) -> pa.Table:
        value_set = pa.array(ray.get(dup_ref), pa.uint64())
        mask = pc.is_in(b.column("content_key"), value_set=value_set)
        if not keep_dups:
            mask = pc.invert(mask)
        return b.filter(mask)

    return hashed, bool(dup_list), split


def q_transcripts_dup_weights(sf_dir: str) -> Dataset:
    """Soft-dedup sampling weights (count-based downweighting, the
    "train on duplicates at 1/n strength" alternative to dropping
    them): each turn row gets n_copies = |rows sharing its exact text|
    and weight = 1/n_copies.  Unique rows (the overwhelming mass)
    stream straight through with n = 1; only the rare duplicate rows
    take the full-sha1 group pass, so a 64-bit detection-key collision
    can never conflate two different texts."""
    import numpy as np

    from ..stages.dedup import add_full_hash

    hashed, have_dups, split = _transcript_text_dup_groups(sf_dir)

    def uniq_out(b: pa.Table) -> pa.Table:
        u = split(b, False)
        return pa.table({
            "conv_id": u.column("conv_id"),
            "turn_idx": u.column("turn_idx"),
            "n_copies": pa.array(np.ones(u.num_rows, np.int64)),
            "weight": pa.array(np.ones(u.num_rows, np.float64)),
        })

    uniques = hashed.map_batches(uniq_out, batch_format="pyarrow")
    if not have_dups:
        return uniques

    def weights(g: pa.Table) -> pa.Table:
        n = g.num_rows
        return pa.table({
            "conv_id": g.column("conv_id"),
            "turn_idx": g.column("turn_idx"),
            "n_copies": pa.array(np.full(n, n, np.int64)),
            "weight": round_sql(
                pa.array(np.full(n, 1.0 / n, np.float64)), 6),
        })

    dup_rows = hashed.map_batches(
        lambda b: add_full_hash(split(b, True), ["text"]),
        batch_format="pyarrow").materialize()
    width = max(2, min(512, dup_rows.count() // 100_000 + 2))
    dups = dup_rows.repartition(width) \
        .groupby("content_hash").map_groups(weights, batch_format="pyarrow")
    return uniques.union(dups)


def q_transcripts_dup_token_mass(sf_dir: str) -> Dataset:
    """Dedup-impact report at TOKEN grain: what fraction of the
    corpus's tokens sits in redundant copies (every row of a text group
    beyond the first)?  One row: total_tokens, dup_tokens, dup_frac.
    Totals are one streaming aggregate; dup mass needs only the rare
    duplicate rows (full-sha1 grouped), so the report costs one corpus
    scan plus dup-volume-bounded work — integers until the final
    division."""
    import numpy as np

    from ..stages.dedup import add_full_hash

    hashed, have_dups, split = _transcript_text_dup_groups(sf_dir)

    def tok_partial(b: pa.Table) -> pa.Table:
        nt = pc.list_value_length(
            pc.split_pattern(b.column("text"), " ")).cast(pa.int64())
        return pa.table({"t": pa.array([int(pc.sum(nt).as_py() or 0)],
                                       pa.int64())})

    total = int(hashed.map_batches(tok_partial, batch_format="pyarrow")
                .aggregate(Sum("t", alias_name="t"))["t"])

    dup_tokens = 0
    if have_dups:
        def group_mass(g: pa.Table) -> pa.Table:
            nt = len(g.column("text")[0].as_py().split(" "))
            return pa.table({"m": pa.array([nt * (g.num_rows - 1)],
                                           pa.int64())})

        dup_rows = hashed.map_batches(
            lambda b: add_full_hash(split(b, True), ["text"]),
            batch_format="pyarrow").materialize()
        width = max(2, min(512, dup_rows.count() // 100_000 + 2))
        mass = _small_table(
            dup_rows.repartition(width).groupby("content_hash")
            .map_groups(group_mass, batch_format="pyarrow"))
        if mass is not None:
            dup_tokens = int(pc.sum(mass.column("m")).as_py() or 0)

    frac = round_sql_f(dup_tokens / total, 6) if total else 0.0
    return rd.from_arrow(pa.table({
        "total_tokens": pa.array([total], pa.int64()),
        "dup_tokens": pa.array([dup_tokens], pa.int64()),
        "dup_frac": pa.array([frac], pa.float64()),
    }))


def q_documents_top_terms_per_source(sf_dir: str) -> Dataset:
    """Grouped heavy terms: the 5 most frequent unigrams per source
    (count DESC, term ASC) — the per-shard vocabulary fingerprint a
    corpus triage run prints first.  Shape: per-batch (source, tok)
    partial counts → ONE shuffle groupby over the unbounded term domain
    → per-source top-5 in a map_groups (post-aggregation rows per
    source are vocabulary-bounded; at web scale cap the in-group sort
    with a per-batch pre-top-k the way topk_combine does)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = b.column("source").to_numpy(zero_copy_only=False)
        t = pa.table({"source": pa.array(np.repeat(src, n)),
                      "tok": pc.list_flatten(toks)})
        g = t.group_by(["source", "tok"]).aggregate([("tok", "count")])
        return g.rename_columns(["source", "tok", "p_n"])

    counts = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "tok"]).aggregate(Sum("p_n", alias_name="n")),
        pa.schema([("source", pa.string()), ("tok", pa.string()),
                   ("n", pa.int64())]))

    def topk(g: pa.Table) -> pa.Table:
        n = g.column("n").to_numpy(zero_copy_only=False)
        toks = g.column("tok").to_pylist()
        order = sorted(range(len(toks)), key=lambda i: (-int(n[i]), toks[i]))
        keep = order[:5]
        return pa.table({
            "source": g.column("source").take(keep),
            "tok": g.column("tok").take(keep),
            "n": g.column("n").take(keep),
            "rank": pa.array(range(1, len(keep) + 1), pa.int64()),
        })

    return counts.groupby("source").map_groups(topk, batch_format="pyarrow")


def q_events_winsorize_values(sf_dir: str) -> Dataset:
    """Winsorization as a row-grain TRANSFORM (the cleaning step, not
    just the robust mean): clip each event's value to its own event
    type's exact [P5, P95] band (quantile_disc convention both sides).
    Pass 1 is the keyed (value, count) histogram exchange of
    grouped_exact_quantiles; the tiny per-type band table broadcasts
    into one vectorized clip scan — raw events never shuffle, and the
    clip picks existing 2-dp values, so the twin is bit-exact with no
    rounding at all."""
    import numpy as np

    from ..stages.quantiles import grouped_exact_quantiles

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])
    bands = _small_table(grouped_exact_quantiles(
        ds.select_columns(["event_type", "value"]), "event_type", "value",
        qs=(0.05, 0.95)))
    btypes = bands.column("event_type").to_pylist()
    lo = dict(zip(btypes, bands.column("q5").to_pylist()))
    hi = dict(zip(btypes, bands.column("q95").to_pylist()))
    bands_ref = ray.put((lo, hi))

    def clip(b: pa.Table) -> pa.Table:
        lo_m, hi_m = ray.get(bands_ref)
        types = b.column("event_type").combine_chunks() \
            .dictionary_encode()
        dvals = types.dictionary.to_pylist()
        idx = types.indices.to_numpy(zero_copy_only=False) \
            if b.num_rows else np.array([], np.int32)
        v = b.column("value").to_numpy(zero_copy_only=False)
        # vectorized dictionary-index lookup (the value_outliers idiom):
        # one Python lookup per DISTINCT type, not per row
        lov = np.array([lo_m[t] for t in dvals], np.float64)[idx] \
            if len(dvals) else np.array([], np.float64)
        hiv = np.array([hi_m[t] for t in dvals], np.float64)[idx] \
            if len(dvals) else np.array([], np.float64)
        return pa.table({
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
            "value_w": pa.array(np.minimum(np.maximum(v, lov), hiv),
                                pa.float64()),
        })

    return ds.map_batches(clip, batch_format="pyarrow")


def q_transcripts_windowed_dedup(sf_dir: str) -> Dataset:
    """Time-windowed dedup (repeat suppression with a cooldown): a turn
    is kept iff no identical text occurred in the 7 days strictly
    before it — the freshness-aware dedup policy for streams where a
    recurring text is legitimate after the window lapses (LAG-based:
    each occurrence looks only at its immediate predecessor).  Unique
    texts (the mass) stream straight through; only the rare dup-key
    rows take the full-sha1 group sort, so the 100 TB cost profile is
    the dedup_exact scan plus dup-volume-bounded group work."""
    import numpy as np

    from ..stages.dedup import add_full_hash

    WIN_US = 7 * 86_400_000_000
    hashed, have_dups, split = _transcript_text_dup_groups(
        sf_dir, cols=("conv_id", "turn_idx", "text", "ts"))

    def uniq_out(b: pa.Table) -> pa.Table:
        return split(b, False).select(["conv_id", "turn_idx", "ts"])

    uniques = hashed.map_batches(uniq_out, batch_format="pyarrow")
    if not have_dups:
        return uniques

    def keep_rule(g: pa.Table) -> pa.Table:
        s = g.sort_by([("ts", "ascending"), ("conv_id", "ascending"),
                       ("turn_idx", "ascending")])
        ts = s.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = np.concatenate([[True], np.diff(ts) > WIN_US])
        return pa.table({
            "conv_id": s.column("conv_id").filter(pa.array(keep)),
            "turn_idx": s.column("turn_idx").filter(pa.array(keep)),
            "ts": s.column("ts").filter(pa.array(keep)),
        })

    dup_rows = hashed.map_batches(
        lambda b: add_full_hash(split(b, True), ["text"]),
        batch_format="pyarrow").materialize()
    width = max(2, min(512, dup_rows.count() // 100_000 + 2))
    kept_dups = dup_rows.repartition(width) \
        .groupby("content_hash").map_groups(keep_rule,
                                            batch_format="pyarrow")
    return uniques.union(kept_dups)


def q_events_daily_ewma(sf_dir: str) -> Dataset:
    """Exponentially weighted moving average of daily event counts
    (α = 0.5, the load-trend smoother): e₁ = x₁, e_t = ½x_t + ½e_{t−1}.
    The recursion unrolls to power-of-two weights — EXACT in IEEE — so
    each term x_s·2^{−k} is quantized at 1e6 and summed as int64: the
    result is order-independent and the twin replays the identical
    closed form with power(0.5, ·).  The corpus scan is one bounded
    (day) tree combine; the O(days²) closed-form expansion runs on the
    tiny calendar grid only."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day")
        t = pa.table({"day": day}).group_by("day").aggregate(
            [("day", "count")])
        return t.rename_columns(["day", "p_n"])

    grid = _small_table(_tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], [("p_n", "sum")], ["day", "p_n"], ["day", "n"]))
    grid = grid.sort_by("day")
    days = grid.column("day")
    x = grid.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    t_n = len(x)
    ewma = np.empty(t_n, np.float64)
    idx = np.arange(t_n)
    for t in range(t_n):
        exps = (t - idx[:t + 1]) + (idx[:t + 1] > 0)
        terms = x[:t + 1] * np.power(0.5, exps.astype(np.float64))
        ewma[t] = scaled_int_sql(terms, 1e6).sum() / 1e6
    return rd.from_arrow(pa.table({
        "day": days,
        "n_events": grid.column("n"),
        "ewma": pa.array(ewma, pa.float64()),
    }))


def q_customers_rfm_segments(sf_dir: str) -> Dataset:
    """RFM segmentation (the classic CRM triage): per customer, last
    order date (R), order count (F), lifetime cents (M), each scored
    NTILE(5) within the customer's NATION — the partition key that
    keeps the rank groups bounded and co-locatable (the ppl_buckets
    contract; at web scale swap NTILE for quantile-boundary
    assignment).  Orders pre-aggregate per custkey before the ONE
    shuffle; the customer dim joins once; DuckDB's NTILE fill (first
    n mod 5 buckets take the extra row) is replayed exactly."""
    import numpy as np

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_custkey", "o_orderdate",
                                      "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        cents = scaled_int_sql(b.column("o_totalprice"), 100.0)
        t = pa.table({
            "c": b.column("o_custkey"),
            "d": b.column("o_orderdate").cast(pa.int64()),
            "m": pa.array(cents, pa.int64()),
        })
        g = t.group_by("c").aggregate(
            [("d", "max"), ("c", "count"), ("m", "sum")])
        return g.rename_columns(["c", "p_d", "p_n", "p_m"])

    agg = with_schema(
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c").aggregate(Max("p_d", alias_name="last_us"),
                                Sum("p_n", alias_name="n_orders"),
                                Sum("p_m", alias_name="monetary_cents")),
        pa.schema([("c", pa.int64()), ("last_us", pa.int64()),
                   ("n_orders", pa.int64()), ("monetary_cents",
                                              pa.int64())]))

    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey"])
    j = agg.join(cust, join_type="inner", num_partitions=8,
                 on=("c",), right_on=("c_custkey",))

    def ntile5(order_keys: list[np.ndarray]) -> np.ndarray:
        n = len(order_keys[0])
        order = np.lexsort(order_keys[::-1])
        k, r = divmod(n, 5)
        bounds = np.cumsum([k + 1] * r + [k] * (5 - r))
        tiles = np.searchsorted(bounds, np.arange(n), side="right") + 1
        out = np.empty(n, np.int64)
        out[order] = tiles
        return out

    def score(g: pa.Table) -> pa.Table:
        ck = g.column("c").to_numpy(zero_copy_only=False)
        last = g.column("last_us").to_numpy(zero_copy_only=False)
        nord = g.column("n_orders").to_numpy(zero_copy_only=False)
        mon = g.column("monetary_cents").to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": pa.array(ck, pa.int64()),
            "c_nationkey": pa.array(
                np.full(len(ck),
                        int(g.column("c_nationkey")[0].as_py())),
                pa.int64()),
            "last_order": pa.array(last, pa.int64()).cast(
                pa.timestamp("us")),
            "n_orders": pa.array(nord, pa.int64()),
            "monetary_cents": pa.array(mon, pa.int64()),
            "r_score": pa.array(ntile5([-last, ck]), pa.int64()),
            "f_score": pa.array(ntile5([-nord, ck]), pa.int64()),
            "m_score": pa.array(ntile5([-mon, ck]), pa.int64()),
        })

    return j.groupby("c_nationkey").map_groups(score,
                                               batch_format="pyarrow")


def q_events_pareto_share(sf_dir: str) -> Dataset:
    """Value-concentration (Pareto / "80-20") report: what share of
    total event value do the top 10 % of users hold?  Users with only
    NULL values are excluded (their SUM is NULL on both sides).  The
    only full-width exchange is the user-grain sum; the sort + limit
    runs on the AGGREGATE (one row per user), and at web scale the
    rank cut swaps for an exact-quantile threshold on the cents
    histogram (the ppl_buckets-style documented trade)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_valid(b.column("value")))
        cents = scaled_int_sql(f.column("value"), 100.0)
        t = pa.table({"user_id": f.column("user_id"),
                      "c": pa.array(cents, pa.int64())})
        g = t.group_by("user_id").aggregate([("c", "sum")])
        return g.rename_columns(["user_id", "p_c"])

    sums = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id").aggregate(Sum("p_c", alias_name="cents")),
        pa.schema([("user_id", pa.int64()), ("cents", pa.int64())])) \
        .materialize()
    tot = sums.aggregate(Sum("cents", alias_name="t"),
                         Count(alias_name="n"))
    total_cents, n_users = int(tot["t"]), int(tot["n"])
    k = (n_users + 9) // 10                      # CEIL(n/10)
    top = sums.sort([("cents"), ("user_id")],
                    descending=[True, False]).limit(k)
    top_cents = int(top.aggregate(Sum("cents", alias_name="t"))["t"]) \
        if k else 0
    share = round_sql_f(top_cents / total_cents, 6) if total_cents else 0.0
    return rd.from_arrow(pa.table({
        "n_users": pa.array([n_users], pa.int64()),
        "top_users": pa.array([k], pa.int64()),
        "top_cents": pa.array([top_cents], pa.int64()),
        "total_cents": pa.array([total_cents], pa.int64()),
        "top_share": pa.array([share], pa.float64()),
    }))


def q_events_new_vs_returning(sf_dir: str) -> Dataset:
    """New-vs-returning daily engagement split (the growth-analytics
    staple): per active day, how many users are on their FIRST-ever
    day vs returning, and how many events each cohort produced.
    Exchanges: one (user, day) pre-aggregate, one user-grain MIN for
    first-seen day, one co-keyed join back — raw events never shuffle;
    the final per-day fold is a bounded-calendar tree combine."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def pair_partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day") \
            .cast(pa.int64())
        t = pa.table({"user_id": b.column("user_id"), "d": day})
        g = t.group_by(["user_id", "d"]).aggregate([("d", "count")])
        return g.rename_columns(["user_id", "d", "p_n"])

    ud = with_schema(
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["user_id", "d"]).aggregate(Sum("p_n", alias_name="n")),
        pa.schema([("user_id", pa.int64()), ("d", pa.int64()),
                   ("n", pa.int64())])).materialize()
    first = with_schema(
        ud.groupby("user_id").aggregate(Min("d", alias_name="fd")),
        pa.schema([("user_id", pa.int64()), ("fd", pa.int64())]))
    j = ud.join(first, join_type="inner", num_partitions=8,
                on=("user_id",))

    def day_partial(b: pa.Table) -> pa.Table:
        d = b.column("d").to_numpy(zero_copy_only=False)
        fd = b.column("fd").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False)
        new = d == fd
        return pa.table({
            "d": b.column("d"),
            "p_nu": pa.array(new.astype(np.int64), pa.int64()),
            "p_ru": pa.array((~new).astype(np.int64), pa.int64()),
            "p_ne": pa.array(np.where(new, n, 0), pa.int64()),
            "p_re": pa.array(np.where(new, 0, n), pa.int64()),
        })

    agg = _tree_combine(
        j.map_batches(day_partial, batch_format="pyarrow"),
        ["d"], [("p_nu", "sum"), ("p_ru", "sum"),
                ("p_ne", "sum"), ("p_re", "sum")],
        ["d", "p_nu", "p_ru", "p_ne", "p_re"],
        ["d", "n_new_users", "n_returning_users",
         "new_events", "returning_events"])

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "day": b.column("d").cast(pa.timestamp("us")),
            "n_new_users": b.column("n_new_users"),
            "n_returning_users": b.column("n_returning_users"),
            "new_events": b.column("new_events"),
            "returning_events": b.column("returning_events"),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_events_psi_drift(sf_dir: str) -> Dataset:
    """Population Stability Index (the model-monitoring drift staple)
    of the event-type mix between the first and second half of the
    corpus's day range.  Counts are EXACT integers moved through one
    bounded (event_type, half) tree combine — raw events never
    shuffle — and each type emits its own PSI term as a row, so no
    float summation order exists anywhere; the grand total is the
    reader's SUM over a handful of rows.  Types absent from either
    half are excluded from the report (ln is undefined on them; the
    half totals still count their events), the standard PSI practice.
    """
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day") \
            .cast(pa.int64())
        d = pc.divide(day, 86_400_000_000)
        t = pa.table({"event_type": b.column("event_type"), "d": d})
        g = t.group_by("event_type").aggregate(
            [("d", "min"), ("d", "max"), ("d", "count")])
        return g.rename_columns(["event_type", "p_mn", "p_mx", "p_n"])

    # pass 1: the day range (bounded: one row per type per block)
    rng = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        [("p_mn", "min"), ("p_mx", "max"), ("p_n", "sum")],
        ["event_type", "p_mn", "p_mx", "p_n"],
        ["event_type", "mn", "mx", "n"])
    rt = _small_table(rng.materialize())
    mn = int(pc.min(rt.column("mn")).as_py())
    mx = int(pc.max(rt.column("mx")).as_py())
    split = mn + (mx - mn + 1) // 2

    def half_partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day") \
            .cast(pa.int64())
        d = pc.divide(day, 86_400_000_000)
        h = pc.if_else(pc.less(d, split), 0, 1)
        t = pa.table({"event_type": b.column("event_type"), "h": h})
        g = t.group_by(["event_type", "h"]).aggregate(
            [("event_type", "count")])
        return g.rename_columns(["event_type", "h", "p_n"])

    agg = _tree_combine(
        ds.map_batches(half_partial, batch_format="pyarrow"),
        ["event_type", "h"], [("p_n", "sum")],
        ["event_type", "h", "p_n"], ["event_type", "h", "n"])
    at = _small_table(agg.materialize())
    et = np.asarray(at.column("event_type"))
    h = at.column("h").to_numpy(zero_copy_only=False)
    n = at.column("n").to_numpy(zero_copy_only=False)
    types = sorted(set(et.tolist()))
    c1 = {t: 0 for t in types}
    c2 = {t: 0 for t in types}
    for t, hh, nn in zip(et.tolist(), h.tolist(), n.tolist()):
        (c1 if hh == 0 else c2)[t] = int(nn)
    n1 = sum(c1.values())
    n2 = sum(c2.values())
    keep = [t for t in types if c1[t] > 0 and c2[t] > 0]
    p1 = np.array([c1[t] / n1 for t in keep], np.float64)
    p2 = np.array([c2[t] / n2 for t in keep], np.float64)
    psi = (p2 - p1) * np.log(p2 / p1)
    return rd.from_arrow(pa.table({
        "event_type": pa.array(keep, pa.string()),
        "c_ref": pa.array([c1[t] for t in keep], pa.int64()),
        "c_cur": pa.array([c2[t] for t in keep], pa.int64()),
        "share_ref": round_sql(pa.array(p1, pa.float64()), 6),
        "share_cur": round_sql(pa.array(p2, pa.float64()), 6),
        "psi_term": round_sql(pa.array(psi, pa.float64()), 6),
    }))


def q_lineitem_profile(sf_dir: str) -> Dataset:
    """Data-profiling report (the Deequ / Great-Expectations staple):
    one row per lineitem column with row count, null count, EXACT
    distinct count, and typed min/max (integer & timestamp columns in
    ``min_int``/``max_int`` — timestamps as epoch-µs — doubles pass
    through ``min_num``/``max_num`` raw, strings in ``min_str``/
    ``max_str``).  Nulls/min/max ride one bounded per-column tree
    combine; the distinct counts pay the honest COUNT(DISTINCT) price
    — per-block distinct prune, then ONE (col, value) exchange whose
    encoded key is injective (doubles via shortest-roundtrip repr with
    -0.0 normalized to +0.0, matching SQL equality).  At 100 TB the
    distinct path is the documented cost driver; swap in the HLL
    sketch stage when ±2 % suffices."""
    import numpy as np

    INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
    NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    STR_COLS = ["l_returnflag", "l_linestatus"]
    TS_COLS = ["l_shipdate"]
    ALL = INT_COLS + NUM_COLS + STR_COLS + TS_COLS

    ds = rd.read_parquet(_t(sf_dir, "lineitem"), columns=ALL)

    def stat_partial(b: pa.Table) -> pa.Table:
        rows = []
        for name in ALL:
            col = b.column(name)
            nulls = col.null_count
            v = col.drop_null()
            mi = mf = ms = None
            xi = xf = xs = None
            if len(v):
                if name in INT_COLS:
                    mi = int(pc.min(v).as_py())
                    xi = int(pc.max(v).as_py())
                elif name in TS_COLS:
                    vi = v.cast(pa.int64())
                    mi = int(pc.min(vi).as_py())
                    xi = int(pc.max(vi).as_py())
                elif name in NUM_COLS:
                    mf = float(pc.min(v).as_py())
                    xf = float(pc.max(v).as_py())
                else:
                    ms = str(pc.min(v).as_py())
                    xs = str(pc.max(v).as_py())
            rows.append((name, len(b), nulls, mi, xi, mf, xf, ms, xs))
        cols = list(zip(*rows))
        return pa.table({
            "col": pa.array(cols[0], pa.string()),
            "p_rows": pa.array(cols[1], pa.int64()),
            "p_nulls": pa.array(cols[2], pa.int64()),
            "p_min_i": pa.array(cols[3], pa.int64()),
            "p_max_i": pa.array(cols[4], pa.int64()),
            "p_min_f": pa.array(cols[5], pa.float64()),
            "p_max_f": pa.array(cols[6], pa.float64()),
            "p_min_s": pa.array(cols[7], pa.string()),
            "p_max_s": pa.array(cols[8], pa.string()),
        })

    stats = _tree_combine(
        ds.map_batches(stat_partial, batch_format="pyarrow"),
        ["col"],
        [("p_rows", "sum"), ("p_nulls", "sum"),
         ("p_min_i", "min"), ("p_max_i", "max"),
         ("p_min_f", "min"), ("p_max_f", "max"),
         ("p_min_s", "min"), ("p_max_s", "max")],
        ["col", "p_rows", "p_nulls", "p_min_i", "p_max_i",
         "p_min_f", "p_max_f", "p_min_s", "p_max_s"],
        ["col", "n_rows", "n_nulls", "min_int", "max_int",
         "min_num", "max_num", "min_str", "max_str"])

    def enc_partial(b: pa.Table) -> pa.Table:
        names, vals = [], []
        for name in ALL:
            v = b.column(name).drop_null().combine_chunks()
            if len(v) == 0:
                continue
            if name in NUM_COLS:
                arr = v.to_numpy(zero_copy_only=False) + 0.0
                s = pc.cast(pa.array(np.unique(arr)), pa.string())
            elif name in TS_COLS:
                s = pc.cast(pc.unique(v.cast(pa.int64())), pa.string())
            elif name in INT_COLS:
                s = pc.cast(pc.unique(v), pa.string())
            else:
                s = pc.unique(v)
            names.append(pa.array([name] * len(s), pa.string()))
            vals.append(s)
        if not names:
            return pa.table({"col": pa.array([], pa.string()),
                             "v": pa.array([], pa.string())})
        return pa.table({"col": pa.concat_arrays(names),
                         "v": pa.concat_arrays(
                             [x.combine_chunks() if isinstance(
                                 x, pa.ChunkedArray) else x
                              for x in vals])})

    dv = ds.map_batches(enc_partial, batch_format="pyarrow") \
        .groupby(["col", "v"]).aggregate(Count("v", alias_name="_n"))

    def cnt_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("col").aggregate([("v", "count")])
        return g.rename_columns(["col", "p_d"])

    nd = _tree_combine(
        dv.map_batches(cnt_partial, batch_format="pyarrow"),
        ["col"], [("p_d", "sum")],
        ["col", "p_d"], ["col", "n_distinct"])

    st = _small_table(stats.materialize())
    nt = _small_table(nd.materialize())
    dmap = dict(zip(nt.column("col").to_pylist(),
                    nt.column("n_distinct").to_pylist()))
    order = np.argsort(np.asarray(st.column("col")))
    st = st.take(pa.array(order, pa.int64()))
    return rd.from_arrow(pa.table({
        "col": st.column("col"),
        "n_rows": st.column("n_rows").cast(pa.int64()),
        "n_nulls": st.column("n_nulls").cast(pa.int64()),
        "n_distinct": pa.array(
            [int(dmap.get(c, 0)) for c in st.column("col").to_pylist()],
            pa.int64()),
        "min_int": st.column("min_int"),
        "max_int": st.column("max_int"),
        "min_num": st.column("min_num"),
        "max_num": st.column("max_num"),
        "min_str": st.column("min_str"),
        "max_str": st.column("max_str"),
    }))


def q_events_rolling_median(sf_dir: str) -> Dataset:
    """Per-user 7-row rolling median of event value (the robust
    smoothing twin of events_moving_avg): median over the trailing ≤7
    non-null values ordered by (ts, event_id).  Values ride as EXACT
    int64 cents; the only float ops are the even-window midpoint
    lo·0.5 + hi·0.5 (exact halves of exact ints — bit-equal to
    DuckDB's quantile interpolation) and one final /100.0, both
    replayed token-identically in the twin.  One user-key exchange;
    the in-group pass is a vectorized (n×7) nanmedian, no Python
    loop."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("value"))),
        batch_format="pyarrow")

    def roll(g: pa.Table) -> pa.Table:
        ts = g.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        cents = scaled_int_sql(g.column("value"), 100.0)[order] \
            .astype(np.float64)
        n = len(cents)
        w = np.full((n, 7), np.nan)
        for k in range(min(7, n)):
            w[k:, 6 - k] = cents[: n - k] if k else cents
        med = np.nanmedian(w, axis=1)
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": g.column("user_id").take(
                pa.array(order, pa.int64())),
            "rolling_med": pa.array(med / 100.0, pa.float64()),
        })

    return ds.groupby("user_id").map_groups(roll, batch_format="pyarrow")


def q_events_ols_trend(sf_dir: str) -> Dataset:
    """Per-type ordinary-least-squares trend of daily event value
    (slope + intercept of cents-per-day vs day offset) — the exact-sum
    companion to the rank-based events_theilsen_trend.  One bounded
    (type, day) tree combine is the only exchange; the per-type normal
    equations run in arbitrary-precision Python ints (n·Σxy − Σx·Σy
    etc. — the HUGEINT casts in the twin), and only the final
    divisions are float, float()ed operand-by-operand BEFORE dividing
    (the documented DuckDB cast-then-divide convention).  Types with
    <2 active days or a degenerate denominator are excluded, as in the
    twin."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["ts", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_valid(b.column("value")))
        day = pc.divide(
            pc.floor_temporal(f.column("ts"), unit="day")
            .cast(pa.int64()), 86_400_000_000)
        cents = scaled_int_sql(f.column("value"), 100.0)
        t = pa.table({"event_type": f.column("event_type"), "d": day,
                      "c": pa.array(cents, pa.int64())})
        g = t.group_by(["event_type", "d"]).aggregate([("c", "sum")])
        return g.rename_columns(["event_type", "d", "p_c"])

    daily = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "d"], [("p_c", "sum")],
        ["event_type", "d", "p_c"], ["event_type", "d", "y"]) \
        .materialize()
    x0 = int(daily.aggregate(Min("d", alias_name="m"))["m"])

    def fit(g: pa.Table) -> pa.Table:
        d = g.column("d").to_numpy(zero_copy_only=False)
        y = g.column("y").to_numpy(zero_copy_only=False)
        n = len(d)
        if n < 2:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "n_days": pa.array([], pa.int64()),
                "slope": pa.array([], pa.float64()),
                "intercept": pa.array([], pa.float64())})
        xs = [int(v) - x0 for v in d.tolist()]
        ys = [int(v) for v in y.tolist()]
        sx = sum(xs)
        sy = sum(ys)
        sxx = sum(v * v for v in xs)
        sxy = sum(a * b for a, b in zip(xs, ys))
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        if den == 0:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "n_days": pa.array([], pa.int64()),
                "slope": pa.array([], pa.float64()),
                "intercept": pa.array([], pa.float64())})
        slope = float(num) / float(den)
        intercept = (float(sy) - slope * float(sx)) / float(n)
        return pa.table({
            "event_type": pa.array(
                [g.column("event_type")[0].as_py()], pa.string()),
            "n_days": pa.array([n], pa.int64()),
            "slope": pa.array([round_sql_f(slope, 6)], pa.float64()),
            "intercept": pa.array([round_sql_f(intercept, 6)],
                                  pa.float64()),
        })

    return daily.groupby("event_type").map_groups(
        fit, batch_format="pyarrow")


def _order_part_distinct(sf_dir: str) -> Dataset:
    """Distinct (order, part) rows from lineitem — the basket table the
    market-basket family shares.  One exchange."""
    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_partkey"])

    def op_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["l_orderkey", "l_partkey"]).aggregate(
            [("l_partkey", "count")])
        return g.rename_columns(["o", "p", "_n"])

    return with_schema(
        ds.map_batches(op_partial, batch_format="pyarrow")
        .groupby(["o", "p"]).aggregate(Count("p", alias_name="_n"))
        .map_batches(lambda b: b.select(["o", "p"]),
                     batch_format="pyarrow"),
        pa.schema([("o", pa.int64()), ("p", pa.int64())]))


#: Per-process memo for the materialized co-purchase edge Dataset —
#: ~10 graph queries each rebuilt the same two-exchange edge plan
#: (~10 s at sf0.1) when run in one session (the bench and the
#: driver's sequential gate both do).  Materialized Datasets are
#: immutable, so sharing is safe; keyed by sf_dir, cleared when it
#: grows past a handful of corpora (tests use throwaway tmp dirs).
_COPURCHASE_EDGE_CACHE: dict[str, Dataset] = {}


def _copurchase_edges(sf_dir: str) -> Dataset:
    """Distinct part co-purchase edges (id_a < id_b, w = #orders both
    parts appear in) — the market-basket graph the graph-analytics
    family (degrees / triangles / PageRank) runs on.  Same inverted-
    index discipline as the similarity kernels: one (order, part)
    distinct exchange, in-group triu pair expansion per order (parts
    per order is structurally tiny, so no df cap is needed — the group
    IS the basket), then the adaptive pair combine.  Returns a
    materialized Dataset (memoized per sf_dir — see
    :data:`_COPURCHASE_EDGE_CACHE`)."""
    import numpy as np

    cached = _COPURCHASE_EDGE_CACHE.get(sf_dir)
    if cached is not None:
        return cached

    op = _order_part_distinct(sf_dir)

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "p_c": pa.array([], pa.int64())})

    def expand(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return empty
        ids = np.sort(g.column("p").to_numpy(zero_copy_only=False))
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table({"id_a": pa.array(ids[a], pa.int64()),
                         "id_b": pa.array(ids[b], pa.int64()),
                         "p_c": pa.array(np.ones(len(a), np.int64))})

    pairs = op.groupby("o").map_groups(expand,
                                       batch_format="pyarrow") \
        .materialize()
    edges = _pair_combine(pairs, ["id_a", "id_b"], "w").materialize()
    if len(_COPURCHASE_EDGE_CACHE) >= 4:
        _COPURCHASE_EDGE_CACHE.clear()
    _COPURCHASE_EDGE_CACHE[sf_dir] = edges
    return edges


def _copurchase_degrees(edges: Dataset) -> Dataset:
    """(p, degree) rows from the distinct edge set — each edge feeds
    both endpoints; one bounded per-node combine."""
    def deg_partial(b: pa.Table) -> pa.Table:
        p = pa.concat_arrays([b.column("id_a").combine_chunks(),
                              b.column("id_b").combine_chunks()])
        g = pa.table({"p": p}).group_by("p").aggregate([("p", "count")])
        return g.rename_columns(["p", "p_d"])

    return with_schema(
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("p").aggregate(Sum("p_d", alias_name="degree")),
        pa.schema([("p", pa.int64()), ("degree", pa.int64())]))


def q_parts_copurchase_degrees(sf_dir: str) -> Dataset:
    """Degree distribution of the part co-purchase graph (the
    market-basket degree histogram): (degree, n_parts).  Exchanges:
    the edge builder's two, one per-node degree sum, and a bounded
    (degree) tree combine — degrees are capped by the basket-size ×
    order-fanout product, so the histogram key set is tiny."""
    deg = _copurchase_degrees(_copurchase_edges(sf_dir))

    def hist_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("degree").aggregate([("degree", "count")])
        return g.rename_columns(["degree", "p_n"])

    return _tree_combine(
        deg.map_batches(hist_partial, batch_format="pyarrow"),
        ["degree"], [("p_n", "sum")],
        ["degree", "p_n"], ["degree", "n_parts"])


def q_parts_copurchase_triangles(sf_dir: str) -> Dataset:
    """EXACT triangle count + global clustering coefficient of the
    part co-purchase graph.  Primary plan (edges ≤
    :data:`EDGE_BROADCAST_MAX`): 3·triangles = Σ over edges of
    |N(a)∩N(b)| via the broadcast-CSR endpoint kernel
    (:func:`_edge_jaccard_broadcast` with ``k=None`` — each edge's
    count computed locally, only (edge, cn) rows move; 11.4 s → ~2 s
    warm at sf0.1); wedge count comes straight off the degree vector.
    Fallback beyond the bound: the oriented triu + sorted-edge-key
    membership probe (per-group partial counts only), whose broadcast
    side swaps for a degree-oriented partitioned wedge join at true
    web scale.  Twin: the exact 3-way self-join oracle."""
    import numpy as np

    edges = _copurchase_edges(sf_dir)
    n_edges = edges.count()
    deg = _copurchase_degrees(edges).materialize()
    n_nodes = deg.count()

    def cw_partial(b: pa.Table) -> pa.Table:
        d = b.column("degree").to_numpy(zero_copy_only=False)
        return pa.table({"p_w": pa.array(
            [int(np.sum(d * (d - 1) // 2))], pa.int64())})

    n_wedges = int(deg.map_batches(cw_partial, batch_format="pyarrow")
                   .aggregate(Sum("p_w", alias_name="w"))["w"])

    if n_edges and n_edges <= EDGE_BROADCAST_MAX:
        agg = _edge_jaccard_broadcast(edges, None).aggregate(
            Sum("common_neighbors", alias_name="s"))
        n_tri = int((agg["s"] or 0) // 3)
    else:
        ekeys = np.sort(np.concatenate([
            (t.column("id_a").to_numpy(zero_copy_only=False).astype(
                np.int64) << 32)
            | t.column("id_b").to_numpy(zero_copy_only=False)
            for t in ray.get(edges.to_arrow_refs()) if t.num_rows
        ])) if n_edges else np.array([], np.int64)
        assert n_edges == 0 or \
            int(ekeys.max() & 0xFFFFFFFF) < (1 << 32)
        ekeys_ref = ray.put(ekeys)

        def tri_group(g: pa.Table) -> pa.Table:
            nb = np.sort(
                g.column("id_b").to_numpy(zero_copy_only=False))
            # oriented out-degree cap: a hub center would triu-expand
            # O(deg²) keys in ONE task (see WEDGE_DEG_CAP) — drop
            # loudly, count truncates visibly, oracle corpora
            # unaffected
            if len(nb) < 2 or _df_capped(
                    g, len(nb), WEDGE_DEG_CAP, "triangles_wedges",
                    "id_a"):
                return pa.table({"p_t": pa.array([], pa.int64())})
            ek = ray.get(ekeys_ref)
            i, j = np.triu_indices(len(nb), k=1)
            keys = (nb[i] << 32) | nb[j]
            pos = np.searchsorted(ek, keys)
            hit = (pos < len(ek)) & (
                ek[np.minimum(pos, len(ek) - 1)] == keys)
            return pa.table(
                {"p_t": pa.array([int(hit.sum())], pa.int64())})

        tri = edges.groupby("id_a").map_groups(
            tri_group, batch_format="pyarrow")
        n_tri = int(tri.aggregate(Sum("p_t", alias_name="t"))["t"]
                    or 0)
    clust = round_sql_f(float(3 * n_tri) / float(n_wedges), 6) \
        if n_wedges else 0.0
    return rd.from_arrow(pa.table({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_wedges": pa.array([n_wedges], pa.int64()),
        "n_triangles": pa.array([n_tri], pa.int64()),
        "clustering": pa.array([clust], pa.float64()),
    }))


def q_parts_copurchase_pagerank(sf_dir: str) -> Dataset:
    """Distributed PageRank (d=0.85, 10 iterations) over the
    undirected co-purchase graph, top-20 parts by rank.  Each
    iteration is ONE pass over the edge Dataset against a broadcast
    rank vector (the kmeans-centroid shape) emitting per-destination
    contributions QUANTIZED to int64 at 1e12 — summation is therefore
    order- and block-layout-independent, and the numpy reference test
    replays it exactly.  The rank/degree vectors are node-sized driver
    state (fine for graphs whose node table fits one machine — the
    documented trade; the partitioned-join formulation replaces the
    broadcast beyond that).  No SQL twin: iterative fixpoint
    (rows-only; semantics pinned by test_pagerank_numpy_parity)."""
    import numpy as np

    DAMP = 0.85
    ITERS = 10
    Q = 1e12

    edges = _copurchase_edges(sf_dir)
    deg = _copurchase_degrees(edges).materialize()
    dt = _small_table(deg)
    node_ids = np.sort(dt.column("p").to_numpy(zero_copy_only=False))
    degree = dt.column("degree").to_numpy(zero_copy_only=False)[
        np.argsort(dt.column("p").to_numpy(zero_copy_only=False))]
    n = len(node_ids)
    if n == 0:
        return rd.from_arrow(pa.table({
            "p": pa.array([], pa.int64()),
            "rank": pa.array([], pa.float64())}))
    ranks = np.full(n, 1.0 / n)

    for _ in range(ITERS):
        state = ray.put((node_ids, ranks, degree))

        def contrib(b: pa.Table) -> pa.Table:
            ids, r, d = ray.get(state)
            a = np.searchsorted(
                ids, b.column("id_a").to_numpy(zero_copy_only=False))
            bb = np.searchsorted(
                ids, b.column("id_b").to_numpy(zero_copy_only=False))
            src = np.concatenate([a, bb])
            dst = np.concatenate([bb, a])
            q = np.rint(r[src] / d[src] * Q).astype(np.int64)
            g = pa.table({"i": pa.array(dst, pa.int64()),
                          "q": pa.array(q, pa.int64())}) \
                .group_by("i").aggregate([("q", "sum")])
            return g.rename_columns(["i", "p_q"])

        agg = _small_table(_tree_combine(
            edges.map_batches(contrib, batch_format="pyarrow"),
            ["i"], [("p_q", "sum")], ["i", "p_q"],
            ["i", "sq"]).materialize())
        new = np.full(n, (1.0 - DAMP) / n)
        idx = agg.column("i").to_numpy(zero_copy_only=False)
        sq = agg.column("sq").to_numpy(zero_copy_only=False)
        new[idx] += DAMP * (sq.astype(np.float64) / Q)
        ranks = new

    order = np.lexsort((node_ids, -ranks))[:20]
    return rd.from_arrow(pa.table({
        "p": pa.array(node_ids[order], pa.int64()),
        "rank": round_sql(pa.array(ranks[order], pa.float64()), 9),
    }))


def q_parts_basket_lift(sf_dir: str) -> Dataset:
    """Market-basket association rules (the Apriori step-2 staple):
    support / directional confidence / lift for every part pair
    co-purchased in ≥ 2 orders.  Reuses the co-purchase edge builder
    (pair weights ARE the co-occurrence counts); per-part basket
    counts ride one (p) exchange and broadcast as a dim-sized map;
    every ratio is a single float division of exact cross-multiplied
    ints (lift = w·N / (n_a·n_b)), replayed token-identically."""
    import numpy as np

    MIN_COOC = 2

    op = _order_part_distinct(sf_dir).materialize()

    def o_partial(b: pa.Table) -> pa.Table:
        return pa.table({"o": pc.unique(b.column("o").combine_chunks())})

    n_orders = with_schema(
        op.map_batches(o_partial, batch_format="pyarrow")
        .groupby("o").aggregate(Count("o", alias_name="_n")),
        pa.schema([("o", pa.int64()), ("_n", pa.int64())])).count()

    def p_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("p").aggregate([("p", "count")])
        return g.rename_columns(["p", "p_n"])

    pc_tab = _small_table(with_schema(
        op.map_batches(p_partial, batch_format="pyarrow")
        .groupby("p").aggregate(Sum("p_n", alias_name="n")),
        pa.schema([("p", pa.int64()), ("n", pa.int64())])).materialize())
    pids = pc_tab.column("p").to_numpy(zero_copy_only=False)
    pcnt = pc_tab.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(pids)
    pmap_ref = ray.put((pids[order], pcnt[order]))

    edges = _copurchase_edges(sf_dir)

    def score(b: pa.Table) -> pa.Table:
        ids_s, cnt_s = ray.get(pmap_ref)
        f = b.filter(pc.greater_equal(b.column("w"), MIN_COOC))
        a = f.column("id_a").to_numpy(zero_copy_only=False)
        bb = f.column("id_b").to_numpy(zero_copy_only=False)
        w = f.column("w").to_numpy(zero_copy_only=False)
        na = cnt_s[np.searchsorted(ids_s, a)]
        nb = cnt_s[np.searchsorted(ids_s, bb)]
        N = float(n_orders)
        wf = w.astype(np.float64)
        return pa.table({
            "id_a": pa.array(a, pa.int64()),
            "id_b": pa.array(bb, pa.int64()),
            "n_both": pa.array(w, pa.int64()),
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nb, pa.int64()),
            "support": round_sql(
                pa.array(wf / N, pa.float64()), 6),
            "conf_a_b": round_sql(
                pa.array(wf / na.astype(np.float64), pa.float64()), 6),
            "conf_b_a": round_sql(
                pa.array(wf / nb.astype(np.float64), pa.float64()), 6),
            "lift": round_sql(
                pa.array((w * n_orders).astype(np.float64)
                         / (na * nb).astype(np.float64),
                         pa.float64()), 6),
        })

    return edges.map_batches(score, batch_format="pyarrow")


def q_events_target_encoding(sf_dir: str) -> Dataset:
    """Smoothed mean target encoding (the categorical-feature staple):
    enc(type) = (Σ_type + m·global_mean) / (n_type + m) with m = 10,
    computed WITHOUT the float global mean — cross-multiplying gives
    enc = (Σ_type·N + m·Σ_tot) / ((n_type + m)·N), exact ints until ONE
    float division (then /100.0 back to value units).  One bounded
    (type) tree combine is the only exchange."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "value"])

    M = 10

    def partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_valid(b.column("value")))
        cents = scaled_int_sql(f.column("value"), 100.0)
        t = pa.table({"event_type": f.column("event_type"),
                      "c": pa.array(cents, pa.int64())})
        g = t.group_by("event_type").aggregate(
            [("c", "sum"), ("c", "count")])
        return g.rename_columns(["event_type", "p_s", "p_n"])

    agg = _small_table(_tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], [("p_s", "sum"), ("p_n", "sum")],
        ["event_type", "p_s", "p_n"],
        ["event_type", "s", "n"]).materialize())
    types = agg.column("event_type").to_pylist()
    s = [int(v) for v in agg.column("s").to_pylist()]
    n = [int(v) for v in agg.column("n").to_pylist()]
    tot_s, tot_n = sum(s), sum(n)
    enc = [round_sql_f(
        float(si * tot_n + M * tot_s) / float((ni + M) * tot_n) / 100.0,
        6) for si, ni in zip(s, n)]
    return rd.from_arrow(pa.table({
        "event_type": pa.array(types, pa.string()),
        "n": pa.array(n, pa.int64()),
        "enc": pa.array(enc, pa.float64()),
    }))


def q_events_impute_median(sf_dir: str) -> Dataset:
    """NULL imputation with the per-type median (the scikit-learn
    SimpleImputer shape, grouped): one bounded (type, value) histogram
    exchange answers every group median — interpolated exactly as
    DuckDB's quantile_cont(0.5) (lo·0.5 + hi·0.5) — then the medians
    broadcast and one row-grain scan fills the holes.  Types whose
    values are ALL NULL stay NULL (the twin's LEFT JOIN)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def hpartial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_valid(b.column("value")))
        g = pa.table({"event_type": f.column("event_type"),
                      "v": f.column("value")}) \
            .group_by(["event_type", "v"]).aggregate([("v", "count")])
        return g.rename_columns(["event_type", "v", "p_n"])

    hist = _small_table(_tree_combine(
        ds.map_batches(hpartial, batch_format="pyarrow"),
        ["event_type", "v"], [("p_n", "sum")],
        ["event_type", "v", "p_n"],
        ["event_type", "v", "n"]).materialize())
    med: dict[str, float] = {}
    if hist is not None and hist.num_rows:
        et = np.asarray(hist.column("event_type"))
        v = hist.column("v").to_numpy(zero_copy_only=False)
        n = hist.column("n").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, et))
        et, v, n = et[order], v[order], n[order]
        for t in np.unique(et):
            m = et == t
            vv, nn = v[m], n[m]
            cum = np.cumsum(nn)
            total = int(cum[-1])
            if total % 2:
                med[str(t)] = float(vv[np.searchsorted(
                    cum, total // 2 + 1)])
            else:
                lo = float(vv[np.searchsorted(cum, total // 2)])
                hi = float(vv[np.searchsorted(cum, total // 2 + 1)])
                med[str(t)] = lo * 0.5 + hi * 0.5
    med_ref = ray.put(med)

    def fill(b: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        vals = b.column("value").to_numpy(zero_copy_only=False)
        isna = pc.is_null(b.column("value")).to_numpy(
            zero_copy_only=False)
        types = b.column("event_type").to_pylist()
        filled = vals.copy()
        mask_missing = np.zeros(len(vals), bool)
        for i in np.nonzero(isna)[0]:
            t = types[i]
            if t in m:
                filled[i] = m[t]
            else:
                mask_missing[i] = True
        return pa.table({
            "event_id": b.column("event_id"),
            "value_filled": pa.array(filled, pa.float64(),
                                     mask=mask_missing),
            "was_null": pa.array(isna, pa.bool_()),
        })

    return ds.map_batches(fill, batch_format="pyarrow")


def q_embeddings_label_noise(sf_dir: str) -> Dataset:
    """Label-noise audit (the cleanlab-style kNN-disagreement signal):
    for each of the first 16 vectors, the fraction of its 10 exact
    nearest neighbours (cosine, self excluded) whose label disagrees
    with its own.  Broadcast-matmul candidate stream + driver heap
    merge (similarity.knn_excluding_self); ties at the k-th neighbour
    resolve (−cosine, vec_id) exactly like the twin's ROW_NUMBER."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_excluding_self

    K = 10
    qtab = pq.read_table(_t(sf_dir, "embeddings"),
                         filters=[("vec_id", "<", 16)],
                         columns=["vec_id", "embedding", "label"]) \
        .sort_by("vec_id")
    qids = qtab.column("vec_id").to_pylist()
    qlabels = {i: int(l) for i, l in
               zip(qids, qtab.column("label").to_pylist())}
    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding", "label"])
    nn = knn_excluding_self(ds, qtab.column("embedding").to_pylist(),
                            qids, k=K)
    out: dict[int, list[int]] = {int(q): [] for q in qids}
    for q, lab in zip(nn.column("query_id").to_pylist(),
                      nn.column("label").to_pylist()):
        out[int(q)].append(int(lab))
    rows_q, rows_l, rows_nb, rows_d, rows_f = [], [], [], [], []
    for q in sorted(out):
        own = qlabels[q]
        labs = out[q]
        nd = sum(1 for l in labs if l != own)
        rows_q.append(q)
        rows_l.append(own)
        rows_nb.append(len(labs))
        rows_d.append(nd)
        rows_f.append(round_sql_f(nd / float(len(labs)), 6)
                      if labs else 0.0)
    return rd.from_arrow(pa.table({
        "query_id": pa.array(rows_q, pa.int64()),
        "own_label": pa.array(rows_l, pa.int64()),
        "n_neighbors": pa.array(rows_nb, pa.int64()),
        "n_disagree": pa.array(rows_d, pa.int64()),
        "noise_frac": pa.array(rows_f, pa.float64()),
    }))


def q_events_change_point(sf_dir: str) -> Dataset:
    """CUSUM-style change-point detection on the daily event-count
    series: the day whose cumulative count deviates most from the
    uniform-rate line, argmax_i |n·cum_i − i·total| (cross-multiplied
    EXACT ints — no float rate ever exists), earliest day on ties.
    One bounded (day) tree combine; the argmax itself runs on the
    calendar-sized aggregate."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.divide(
            pc.floor_temporal(b.column("ts"), unit="day")
            .cast(pa.int64()), 86_400_000_000)
        g = pa.table({"d": day}).group_by("d").aggregate([("d", "count")])
        return g.rename_columns(["d", "p_n"])

    agg = _small_table(_tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["d"], [("p_n", "sum")], ["d", "p_n"],
        ["d", "n"]).materialize())
    d = agg.column("d").to_numpy(zero_copy_only=False)
    n = agg.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(d)
    d, n = d[order], n[order]
    n_days = len(d)
    total = int(n.sum())
    cum = np.cumsum(n.astype(object))            # exact int cumsum
    i = np.arange(1, n_days + 1, dtype=object)
    dev = np.abs(cum * n_days - i * total)
    best = int(np.argmax(dev))                   # first max = earliest
    return rd.from_arrow(pa.table({
        "change_day": pa.array([int(d[best]) * 86_400_000_000],
                               pa.int64()).cast(pa.timestamp("us")),
        "max_dev": pa.array([int(dev[best])], pa.int64()),
        "n_days": pa.array([n_days], pa.int64()),
        "total_events": pa.array([total], pa.int64()),
    }))


def q_events_rolling_1h_sum(sf_dir: str) -> Dataset:
    """Time-based (RANGE INTERVAL) window frame: per event, the exact
    cents sum of the user's events in the trailing hour INCLUSIVE of
    ts-peers — the RANGE-frame semantics (all rows with equal ts are
    peers, unlike the ROWS frames elsewhere in the catalog).  One
    user-key exchange; in-group it is two searchsorted passes over a
    cumulative-cents array, no Python loop.  NULL-valued rows are
    excluded first on both sides (they would be frame members that
    contribute nothing — the filter keeps the two engines' frames
    identical)."""
    import numpy as np

    HOUR_US = 3_600_000_000

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("value"))),
        batch_format="pyarrow")

    def roll(g: pa.Table) -> pa.Table:
        ts = g.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts_s = ts[order]
        cents = scaled_int_sql(g.column("value"), 100.0)[order]
        cum = np.concatenate([[0], np.cumsum(cents)])
        lo = np.searchsorted(ts_s, ts_s - HOUR_US, side="left")
        hi = np.searchsorted(ts_s, ts_s, side="right")
        return pa.table({
            "event_id": pa.array(eid[order], pa.int64()),
            "user_id": g.column("user_id").take(
                pa.array(order, pa.int64())),
            "sum_cents_1h": pa.array(cum[hi] - cum[lo], pa.int64()),
        })

    return ds.groupby("user_id").map_groups(roll, batch_format="pyarrow")


def q_events_session_timeout_sweep(sf_dir: str) -> Dataset:
    """Sessionization-tuning report: total session count at timeout
    thresholds {5, 15, 30, 60} minutes in ONE pass — sessions(t) =
    n_users + #(per-user gaps > t), so all four thresholds read the
    same LAG-gap stream.  One user-key exchange; per group the gaps
    are one np.diff and the threshold counts one searchsorted each."""
    import numpy as np

    THRESH_MIN = [5, 15, 30, 60]

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts"])

    def gaps(g: pa.Table) -> pa.Table:
        ts = g.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        d = np.diff(ts[order])
        return pa.table({
            "p_users": pa.array([1], pa.int64()),
            **{f"p_g{t}": pa.array(
                [int((d > t * 60_000_000).sum())], pa.int64())
               for t in THRESH_MIN},
        })

    per_user = ds.groupby("user_id").map_groups(gaps,
                                                batch_format="pyarrow")
    tot = per_user.aggregate(
        Sum("p_users", alias_name="users"),
        *[Sum(f"p_g{t}", alias_name=f"g{t}") for t in THRESH_MIN])
    users = int(tot["users"])
    return rd.from_arrow(pa.table({
        "timeout_minutes": pa.array(THRESH_MIN, pa.int64()),
        "n_sessions": pa.array(
            [users + int(tot[f"g{t}"]) for t in THRESH_MIN], pa.int64()),
    }))


def q_documents_jaccard_threshold_curve(sf_dir: str) -> Dataset:
    """Dedup-threshold tuning curve: how many EXACT-Jaccard document
    pairs survive each threshold 0.1 … 1.0 — the report that picks the
    near-dup cutoff before a corpus-wide dedup run.  Reuses the shared
    sized-pair front half (_jaccard_sized_pairs); each pair's tier is
    the INTEGER ⌊10·c / (n_a+n_b−c)⌋ so bucketing is exact, the tier
    histogram rides one bounded tree combine, and the ≥-curve is a
    10-row cumulation."""
    import numpy as np

    sized = _jaccard_sized_pairs(sf_dir)

    def tier(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy(zero_copy_only=False)
        na = b.column("n_a").to_numpy(zero_copy_only=False)
        nb = b.column("n_b").to_numpy(zero_copy_only=False)
        t = (10 * c) // (na + nb - c)
        g = pa.table({"tier": pa.array(t, pa.int64())}) \
            .group_by("tier").aggregate([("tier", "count")])
        return g.rename_columns(["tier", "p_n"])

    hist = _small_table(_tree_combine(
        sized.map_batches(tier, batch_format="pyarrow"),
        ["tier"], [("p_n", "sum")], ["tier", "p_n"],
        ["tier", "n"]).materialize())
    counts = np.zeros(11, np.int64)
    if hist is not None and hist.num_rows:
        tv = hist.column("tier").to_numpy(zero_copy_only=False)
        nv = hist.column("n").to_numpy(zero_copy_only=False)
        counts[np.minimum(tv, 10)] = nv
    ge = np.cumsum(counts[::-1])[::-1]
    thr = np.arange(1, 11)
    return rd.from_arrow(pa.table({
        "threshold": pa.array(thr / 10.0, pa.float64()),
        "n_pairs": pa.array(ge[1:], pa.int64()),
    }))


def q_customers_skyline(sf_dir: str) -> Dataset:
    """Per-nation skyline (Pareto frontier) of customers on
    (n_orders, monetary): a customer survives iff NO same-nation
    customer is ≥ on both axes and > on one — the multi-objective
    "best customers" operator a single ORDER BY cannot express.
    Plan: one custkey-grain orders pre-aggregate, LEFT join to the dim
    (no-order customers score 0/0), then a per-block LOCAL skyline
    prune (sound: pruning only removes dominated points — every global
    survivor is locally non-dominated) before the per-nation final
    pass, so only each block's frontier crosses the wire."""
    import numpy as np

    def _skyline_mask(x, y):
        order = np.lexsort((-y, -x))
        xs, ys = x[order], y[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(xs))[0] + 1])
        gmax = np.maximum.reduceat(ys, starts)
        prev = np.concatenate([[np.iinfo(np.int64).min],
                               np.maximum.accumulate(gmax)[:-1]])
        grp = np.cumsum(np.concatenate(
            [[0], (np.diff(xs) != 0).astype(np.int64)]))
        keep_sorted = (ys == gmax[grp]) & (gmax[grp] > prev[grp])
        keep = np.zeros(len(x), bool)
        keep[order] = keep_sorted
        return keep

    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_custkey", "o_totalprice"])

    def agg_partial(b: pa.Table) -> pa.Table:
        cents = scaled_int_sql(b.column("o_totalprice"), 100.0)
        t = pa.table({"c_custkey": b.column("o_custkey"),
                      "m": pa.array(cents, pa.int64())})
        g = t.group_by("c_custkey").aggregate(
            [("m", "sum"), ("m", "count")])
        return g.rename_columns(["c_custkey", "p_m", "p_n"])

    per_cust = with_schema(
        orders.map_batches(agg_partial, batch_format="pyarrow")
        .groupby("c_custkey").aggregate(Sum("p_m", alias_name="mon"),
                                        Sum("p_n", alias_name="n_ord")),
        pa.schema([("c_custkey", pa.int64()), ("mon", pa.int64()),
                   ("n_ord", pa.int64())]))
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey"])
    j = cust.join(per_cust, join_type="left_outer", num_partitions=8,
                  on=("c_custkey",))

    def local(b: pa.Table) -> pa.Table:
        nk = b.column("c_nationkey").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        n = b.column("n_ord").to_numpy(zero_copy_only=False)
        m = b.column("mon").to_numpy(zero_copy_only=False)
        n = np.where(np.isnan(n.astype(np.float64)), 0, n).astype(
            np.int64) if n.dtype.kind == "f" else n.astype(np.int64)
        m = np.where(np.isnan(m.astype(np.float64)), 0, m).astype(
            np.int64) if m.dtype.kind == "f" else m.astype(np.int64)
        keep = np.zeros(len(nk), bool)
        for nat in np.unique(nk):
            idx = np.nonzero(nk == nat)[0]
            keep[idx] = _skyline_mask(n[idx], m[idx])
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "c_nationkey": pa.array(nk, pa.int64()),
            "n_orders": pa.array(n, pa.int64()),
            "monetary_cents": pa.array(m, pa.int64()),
        }).filter(pa.array(keep))

    pruned = j.map_batches(local, batch_format="pyarrow")

    def final(g: pa.Table) -> pa.Table:
        n = g.column("n_orders").to_numpy(zero_copy_only=False)
        m = g.column("monetary_cents").to_numpy(zero_copy_only=False)
        return g.filter(pa.array(_skyline_mask(n, m)))

    return pruned.groupby("c_nationkey").map_groups(
        final, batch_format="pyarrow")


def q_events_scd2_intervals(sf_dir: str) -> Dataset:
    """SCD2 interval build (the warehouse dimension-history staple):
    collapse each user's event-type stream into validity intervals —
    one row per RUN of consecutive equal types with [valid_from,
    valid_to) bounds (valid_to = next run's start, NULL while
    current) — the gaps-and-islands pattern at user grain.  One
    user-key exchange; in-group everything is np.diff / reduceat, no
    Python loop."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])

    def runs(g: pa.Table) -> pa.Table:
        ts = g.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        types = np.asarray(g.column("event_type"))[order]
        ts_s = ts[order]
        chg = np.concatenate([[True], types[1:] != types[:-1]])
        starts = np.nonzero(chg)[0]
        n_runs = len(starts)
        counts = np.diff(np.concatenate([starts, [len(types)]]))
        vfrom = ts_s[starts]
        vto = np.concatenate([vfrom[1:], [0]])
        return pa.table({
            "user_id": g.column("user_id").take(pa.array([0] * n_runs)),
            "event_type": pa.array(types[starts]),
            "run_idx": pa.array(np.arange(1, n_runs + 1), pa.int64()),
            "valid_from": pa.array(vfrom, pa.int64()).cast(
                pa.timestamp("us")),
            "valid_to": pa.array(
                vto, pa.int64(),
                mask=np.concatenate(
                    [np.zeros(n_runs - 1, bool), [True]])).cast(
                pa.timestamp("us")),
            "n_events": pa.array(counts, pa.int64()),
        })

    return ds.groupby("user_id").map_groups(runs, batch_format="pyarrow")


def q_customers_cdc_merge(sf_dir: str) -> Dataset:
    """MERGE INTO / CDC-upsert shape: apply each customer's LATEST
    order (by o_orderdate, o_orderkey) as a change record — status 'F'
    deletes the customer row, any other status updates c_acctbal to
    that order's o_totalprice, customers with no orders pass through
    untouched.  Latest-per-key is a partial-agg arg-max (the
    events_first_last idiom): (o_orderdate, o_orderkey) pack into one
    lexically sortable zero-padded string with the (status, price)
    payload appended — orderkey is unique so whole-string Max IS
    arg-max by (date, orderkey) — per-block partials collapse each
    batch to one row per customer BEFORE the shuffle, and the price
    crosses the string boundary via the shortest-exact float cast
    (bit-exact round trip).  The dim-sized merge is one left-outer
    join plus a vectorized rule pass; o_totalprice passes through RAW
    (no arithmetic), so the twin is bit-trivial."""
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_custkey", "o_orderkey",
                                      "o_orderdate", "o_orderstatus",
                                      "o_totalprice"])

    def pack(b: pa.Table) -> pa.Table:
        d = pc.utf8_lpad(pc.cast(pc.cast(
            b.column("o_orderdate"), pa.int64()), pa.string()),
            19, padding="0")
        k = pc.utf8_lpad(pc.cast(b.column("o_orderkey"), pa.string()),
                         19, padding="0")
        packed = pc.binary_join_element_wise(
            d.combine_chunks(), k.combine_chunks(),
            b.column("o_orderstatus").combine_chunks(),
            pc.cast(b.column("o_totalprice"),
                    pa.string()).combine_chunks(), "\x1f")
        g = pa.table({"c_custkey": b.column("o_custkey"),
                      "packed": packed}).group_by(
            "c_custkey").aggregate([("packed", "max")])
        return g.rename_columns(["c_custkey", "p_max"])

    agg = with_schema(
        orders.map_batches(pack, batch_format="pyarrow")
        .groupby("c_custkey").aggregate(Max("p_max", alias_name="m")),
        pa.schema([("c_custkey", pa.int64()), ("m", pa.string())]))

    def unpack(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b.column("m"), "\x1f")
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "u_status": pc.list_element(parts, 2),
            "u_price": pc.cast(pc.list_element(parts, 3), pa.float64()),
        })

    upd = agg.map_batches(unpack, batch_format="pyarrow")
    cust = rd.read_parquet(_t(sf_dir, "customer"))
    j = cust.join(upd, join_type="left_outer", num_partitions=8,
                  on=("c_custkey",))

    def merge(b: pa.Table) -> pa.Table:
        status = b.column("u_status")
        alive = pc.or_kleene(pc.is_null(status),
                             pc.not_equal(status, "F"))
        f = b.filter(pc.fill_null(alive, True))
        bal = pc.if_else(pc.is_valid(f.column("u_status")),
                         f.column("u_price"), f.column("c_acctbal"))
        return pa.table({
            "c_custkey": f.column("c_custkey"),
            "c_name": f.column("c_name"),
            "c_nationkey": f.column("c_nationkey").cast(pa.int64()),
            "c_acctbal": bal,
            "c_mktsegment": f.column("c_mktsegment"),
        })

    return j.map_batches(merge, batch_format="pyarrow")


def q_events_twap(sf_dir: str) -> Dataset:
    """Time-weighted average value per user (the TWAP / sensor-hold
    staple): each event's value holds until the user's next event, so
    twap = Σ(cents·dt) / Σ(dt) over consecutive pairs.  dt is floored
    to whole SECONDS (µs // 1e6) so the numerator stays exact int64
    with wide headroom (cents ≤ ~5e4 × span_s ≤ ~3e6 « 2^63); the one
    float is the final division, operand-by-operand off the exact
    ints.  One user-key exchange; in-group it is a lexsort + one
    np.diff, no Python loop.  Single-event and all-zero-gap users are
    excluded (den = 0: no holding time exists)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("value"))),
        batch_format="pyarrow")

    def twap(g: pa.Table) -> pa.Table:
        ts = g.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if len(ts) < 2:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "num_cents_s": pa.array([], pa.int64()),
                "den_s": pa.array([], pa.int64()),
                "twap_cents": pa.array([], pa.float64()),
            })
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts_s = ts[order]
        cents = scaled_int_sql(g.column("value"), 100.0)[order]
        dt = (ts_s[1:] - ts_s[:-1]) // 1_000_000
        den = int(dt.sum())
        if den <= 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "num_cents_s": pa.array([], pa.int64()),
                "den_s": pa.array([], pa.int64()),
                "twap_cents": pa.array([], pa.float64()),
            })
        num = int((cents[:-1] * dt).sum())
        return pa.table({
            "user_id": pa.array(
                [int(g.column("user_id")[0].as_py())], pa.int64()),
            "num_cents_s": pa.array([num], pa.int64()),
            "den_s": pa.array([den], pa.int64()),
            "twap_cents": pa.array(
                [float(np.float64(num) / np.float64(den))],
                pa.float64()),
        })

    return ds.groupby("user_id").map_groups(twap, batch_format="pyarrow")


def q_events_survival_km(sf_dir: str) -> Dataset:
    """Kaplan-Meier risk table for time-to-first-purchase: per user,
    T = whole days from their FIRST event to their FIRST 'purchase'
    (event) or to their LAST event (censored).  Emitted per event-day:
    n_risk (users with T ≥ t — the KM at-risk set), n_event,
    n_censored — ALL exact ints, so the float survival product (which
    is order-dependent) never exists in the engine; the consumer folds
    Π(1 − d/n) at whatever precision it wants.  Per-user reduction is
    a partial Arrow group_by per block (purchase-miss as an int64 MAX
    sentinel so MIN is total) → one user-key aggregate; the risk table
    is day-bounded, so the reverse-cumulative at-risk count folds on
    the driver."""
    import numpy as np

    DAY_US = 86_400_000_000
    SENT = (1 << 63) - 1

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.int64())
        tp = pc.if_else(pc.equal(b.column("event_type"), "purchase"),
                        t, pa.scalar(SENT, pa.int64()))
        g = pa.table({"user_id": b.column("user_id"), "t0": t,
                      "tp": tp, "tl": t}).group_by("user_id").aggregate(
            [("t0", "min"), ("tp", "min"), ("tl", "max")])
        return g.rename_columns(["user_id", "p_t0", "p_tp", "p_tl"])

    per = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id").aggregate(Min("p_t0", alias_name="t0"),
                                      Min("p_tp", alias_name="tp"),
                                      Max("p_tl", alias_name="tl")),
        pa.schema([("user_id", pa.int64()), ("t0", pa.int64()),
                   ("tp", pa.int64()), ("tl", pa.int64())]))

    def day_rows(b: pa.Table) -> pa.Table:
        t0 = b.column("t0").to_numpy(zero_copy_only=False)
        tp = b.column("tp").to_numpy(zero_copy_only=False)
        tl = b.column("tl").to_numpy(zero_copy_only=False)
        ev = tp != SENT
        tt = np.where(ev, tp, tl)
        days = (tt - t0) // DAY_US
        g = pa.table({
            "t_days": pa.array(days, pa.int64()),
            "p_ev": pa.array(ev.astype(np.int64), pa.int64()),
            "p_cn": pa.array((~ev).astype(np.int64), pa.int64()),
        }).group_by("t_days").aggregate([("p_ev", "sum"),
                                         ("p_cn", "sum")])
        return g.rename_columns(["t_days", "p_ev", "p_cn"])

    grouped = with_schema(
        per.map_batches(day_rows, batch_format="pyarrow")
        .groupby("t_days").aggregate(Sum("p_ev", alias_name="n_event"),
                                     Sum("p_cn", alias_name="n_censored")),
        pa.schema([("t_days", pa.int64()), ("n_event", pa.int64()),
                   ("n_censored", pa.int64())]))
    t = _small_table(grouped)  # day-bounded (corpus span in days)
    if t is None:
        return rd.from_arrow(pa.table({
            "t_days": pa.array([], pa.int64()),
            "n_risk": pa.array([], pa.int64()),
            "n_event": pa.array([], pa.int64()),
            "n_censored": pa.array([], pa.int64()),
        }))
    days = t.column("t_days").to_numpy(zero_copy_only=False)
    nev = t.column("n_event").to_numpy(zero_copy_only=False)
    ncn = t.column("n_censored").to_numpy(zero_copy_only=False)
    order = np.argsort(days)
    days, nev, ncn = days[order], nev[order], ncn[order]
    n_risk = np.cumsum((nev + ncn)[::-1])[::-1]
    keep = nev > 0
    return rd.from_arrow(pa.table({
        "t_days": pa.array(days[keep], pa.int64()),
        "n_risk": pa.array(n_risk[keep], pa.int64()),
        "n_event": pa.array(nev[keep], pa.int64()),
        "n_censored": pa.array(ncn[keep], pa.int64()),
    }))


def q_ri_audit(sf_dir: str) -> Dataset:
    """Referential-integrity audit across every FK relation in the
    star schema — one row per relation with the child row count,
    orphan row count, and distinct orphan key count (the dbt-test /
    Deequ 'relationship' check as a single report).  Per relation the
    child collapses to (key, count) via per-block partial group_by +
    one key exchange, LEFT-joins the parent's distinct keys (so raw
    child rows never meet the join), and folds to one row via a
    per-block partial + bounded tree combine.  NULL FKs count as
    orphan rows but not orphan keys (SQL COUNT DISTINCT semantics)."""
    import numpy as np

    RELS = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
         "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey",
         "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
         "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey",
         "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey",
         "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
         "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey",
         "region", "r_regionkey"),
    ]

    def one(child: str, fk: str, parent: str, pk: str):
        ch = rd.read_parquet(_t(sf_dir, child), columns=[fk])

        def key_counts(b: pa.Table) -> pa.Table:
            g = pa.table({
                "k": b.column(fk).cast(pa.int64()),
            }).group_by("k").aggregate([([], "count_all")])
            return g.rename_columns(["k", "p_n"])

        keys = with_schema(
            ch.map_batches(key_counts, batch_format="pyarrow")
            .groupby("k").aggregate(Sum("p_n", alias_name="n")),
            pa.schema([("k", pa.int64()), ("n", pa.int64())]))

        par = rd.read_parquet(_t(sf_dir, parent), columns=[pk])
        n_parent = par.count()

        # r5: parents up to EDGE_BROADCAST_MAX keys probe as a
        # broadcast sorted array (ray.put once, searchsorted per
        # block) — the 7 per-relation LEFT-join shuffles collapse to
        # zero (28 s → ~13 s at sf0.1); a parent beyond the bound
        # falls back to the hash join below.
        if n_parent <= EDGE_BROADCAST_MAX:
            def pk_partial(b: pa.Table) -> pa.Table:
                return pa.table({"k": pc.unique(
                    b.column(pk).cast(pa.int64()))})

            pt = _small_table(par.map_batches(
                pk_partial, batch_format="pyarrow"))
            pkeys = np.unique(pt.column("k").to_numpy(
                zero_copy_only=False)) if pt is not None \
                else np.array([], np.int64)
            pref = ray.put(pkeys)

            def fold(b: pa.Table) -> pa.Table:
                pks = ray.get(pref)
                n = b.column("n").to_numpy(zero_copy_only=False)
                key_ok = b.column("k").is_valid().to_numpy(
                    zero_copy_only=False)
                kv = b.column("k").fill_null(-1).to_numpy(
                    zero_copy_only=False)
                pos = np.searchsorted(pks, kv)
                present = key_ok & (pos < len(pks)) & (
                    pks[np.minimum(pos, max(len(pks) - 1, 0))] == kv) \
                    if len(pks) else np.zeros(len(kv), bool)
                orphan = ~present
                return pa.table({
                    "p_rows": pa.array([int(n.sum())], pa.int64()),
                    "p_orows": pa.array([int(n[orphan].sum())],
                                        pa.int64()),
                    "p_okeys": pa.array(
                        [int((orphan & key_ok).sum())], pa.int64()),
                })

            tot = _small_table(keys.map_batches(
                fold, batch_format="pyarrow"))
            if tot is None:
                return (0, 0, 0)
            return (int(pc.sum(tot.column("p_rows")).as_py() or 0),
                    int(pc.sum(tot.column("p_orows")).as_py() or 0),
                    int(pc.sum(tot.column("p_okeys")).as_py() or 0))

        def pk_mark(b: pa.Table) -> pa.Table:
            return pa.table({
                "k": b.column(pk).cast(pa.int64()),
                "present": pa.array(
                    np.ones(b.num_rows, np.int64), pa.int64()),
            })

        marks = par.map_batches(pk_mark, batch_format="pyarrow")
        j = keys.join(marks, join_type="left_outer", num_partitions=8,
                      on=("k",))

        def fold(b: pa.Table) -> pa.Table:
            n = b.column("n").to_numpy(zero_copy_only=False)
            orphan = pc.is_null(b.column("present")).to_numpy(
                zero_copy_only=False)
            key_ok = b.column("k").is_valid().to_numpy(
                zero_copy_only=False)
            return pa.table({
                "p_rows": pa.array([int(n.sum())], pa.int64()),
                "p_orows": pa.array([int(n[orphan].sum())], pa.int64()),
                "p_okeys": pa.array([int((orphan & key_ok).sum())],
                                    pa.int64()),
            })

        # fold emits ONE row per block — block-bounded, driver-safe
        tot = _small_table(j.map_batches(fold, batch_format="pyarrow"))
        if tot is None:
            return (0, 0, 0)
        return (int(pc.sum(tot.column("p_rows")).as_py() or 0),
                int(pc.sum(tot.column("p_orows")).as_py() or 0),
                int(pc.sum(tot.column("p_okeys")).as_py() or 0))

    rows = [(name,) + one(c, fk, p, pk) for name, c, fk, p, pk in RELS]
    return rd.from_arrow(pa.table({
        "relation": pa.array([r[0] for r in rows], pa.string()),
        "n_rows": pa.array([r[1] for r in rows], pa.int64()),
        "n_orphan_rows": pa.array([r[2] for r in rows], pa.int64()),
        "n_orphan_keys": pa.array([r[3] for r in rows], pa.int64()),
    }))


def q_customers_table_diff(sf_dir: str) -> Dataset:
    """Snapshot diff (Datafold-style table diff) between the customer
    dim and its CDC-merged image (q_customers_cdc_merge): per source
    row, change_type ∈ {deleted, updated, unchanged} with the old and
    new balance side by side.  The merged image is key-unique and
    ⊆ source keys, so ONE left join at dim grain answers every row;
    values pass through raw (no arithmetic), keeping the twin
    bit-trivial."""
    merged = q_customers_cdc_merge(sf_dir)

    def slim(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "new_acctbal": b.column("c_acctbal"),
        })

    new = with_schema(
        merged.map_batches(slim, batch_format="pyarrow"),
        pa.schema([("c_custkey", pa.int64()),
                   ("new_acctbal", pa.float64())]))
    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_acctbal"])
    j = cust.join(new, join_type="left_outer", num_partitions=8,
                  on=("c_custkey",))

    def diff(b: pa.Table) -> pa.Table:
        nb = b.column("new_acctbal")
        deleted = pc.is_null(nb)
        changed = pc.and_kleene(pc.is_valid(nb),
                                pc.not_equal(nb, b.column("c_acctbal")))
        ct = pc.if_else(deleted, pa.scalar("deleted", pa.string()),
                        pc.if_else(pc.fill_null(changed, False),
                                   pa.scalar("updated", pa.string()),
                                   pa.scalar("unchanged", pa.string())))
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "change_type": ct,
            "old_acctbal": b.column("c_acctbal"),
            "new_acctbal": nb,
        })

    return j.map_batches(diff, batch_format="pyarrow")


def q_documents_keywords(sf_dir: str) -> Dataset:
    """Per-document keyword tagging: top-3 terms by TF-IDF with the
    idf int64-QUANTIZED (half-away ln(N/df)·1e6) so the ranking key
    score_q = tf · idf_q is an exact integer — float ordering (and its
    tie hazards) never exists; residual ties break on the term string.
    tf needs NO exchange (a doc's tokens live in its own batch); df is
    one term-key exchange; the join back is the second.  Rank inside a
    doc_id co-partition."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def tf_rows(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        g = pa.table({
            "doc_id": pa.array(np.repeat(ids, n), pa.int64()),
            "term": flat,
        }).group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        return g.rename_columns(["doc_id", "term", "tf"])

    tf = ds.map_batches(tf_rows, batch_format="pyarrow")

    def df_partial(b: pa.Table) -> pa.Table:
        g = b.select(["term"]).group_by("term").aggregate(
            [([], "count_all")])
        return g.rename_columns(["term", "p_df"])

    df = with_schema(
        tf.map_batches(df_partial, batch_format="pyarrow")
        .groupby("term").aggregate(Sum("p_df", alias_name="df")),
        pa.schema([("term", pa.string()), ("df", pa.int64())]))

    n_docs = ds.count()

    j = tf.join(df, join_type="inner", num_partitions=8, on=("term",))

    def score(b: pa.Table) -> pa.Table:
        tfv = b.column("tf").to_numpy(zero_copy_only=False)
        dfv = b.column("df").to_numpy(zero_copy_only=False)
        idf_q = scaled_int_sql(
            np.log(np.float64(n_docs) / dfv.astype(np.float64)), 1e6)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "term": b.column("term"),
            "score_q": pa.array(tfv * idf_q, pa.int64()),
        })

    scored = j.map_batches(score, batch_format="pyarrow")

    def top3(g: pa.Table) -> pa.Table:
        s = g.column("score_q").to_numpy(zero_copy_only=False)
        terms = np.asarray(g.column("term"))
        order = np.lexsort((terms, -s))[:3]
        return pa.table({
            "doc_id": g.column("doc_id").take(
                pa.array(order, pa.int64())),
            "rk": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "term": pa.array(terms[order]),
            "score_q": pa.array(s[order], pa.int64()),
        })

    return scored.groupby("doc_id").map_groups(
        top3, batch_format="pyarrow")


def q_dq_audit(sf_dir: str) -> Dataset:
    """dbt-test-suite-style data-quality audit in one report: UNIQUE
    (single and composite key), ACCEPTED_VALUES, RANGE and NOT_NULL
    checks, one row per check with rows checked / violations — all
    exact ints.  Scan checks fold per block (one row each, no
    exchange); unique checks collapse to (key, count) partials before
    ONE key exchange, so raw rows never shuffle.  Unique violations =
    n_rows − n_distinct_keys (every extra copy counts), matching
    COUNT(*) − COUNT(DISTINCT key)."""
    import numpy as np

    def _fold_counts(ds, fn):
        t = _small_table(ds.map_batches(fn, batch_format="pyarrow"))
        if t is None:
            return 0, 0
        return (int(pc.sum(t.column("p_n")).as_py() or 0),
                int(pc.sum(t.column("p_v")).as_py() or 0))

    def scan_check(table, columns, violation_fn):
        ds = rd.read_parquet(_t(sf_dir, table), columns=columns)

        def fold(b: pa.Table) -> pa.Table:
            bad = violation_fn(b)
            return pa.table({
                "p_n": pa.array([b.num_rows], pa.int64()),
                "p_v": pa.array([int(pc.sum(pc.cast(
                    bad, pa.int64())).as_py() or 0)], pa.int64()),
            })

        return _fold_counts(ds, fold)

    def unique_check(table, key_cols):
        ds = rd.read_parquet(_t(sf_dir, table), columns=key_cols)

        # NULL semantics mirror SQL exactly: a single-column COUNT
        # DISTINCT excludes NULL keys (every NULL row is a violation,
        # folded under one sentinel group), while a composite
        # (a, b) struct is non-null even with null members, so null
        # members encode as a distinct token and the row counts as a
        # value.  Null keys never reach the exchange (Ray's sort
        # cannot order None against str).
        SENT = "\x00__nulls__"

        def key_partial(b: pa.Table) -> pa.Table:
            if len(key_cols) == 1:
                k = pc.fill_null(
                    pc.cast(b.column(key_cols[0]), pa.string()), SENT)
            else:
                parts = [pc.fill_null(
                    pc.cast(b.column(c), pa.string()), "\x00N")
                    for c in key_cols]
                k = parts[0]
                for p in parts[1:]:
                    k = pc.binary_join_element_wise(k, p, "\x1f")
            g = pa.table({"k": k}).group_by("k").aggregate(
                [([], "count_all")])
            return g.rename_columns(["k", "p_n"])

        keys = with_schema(
            ds.map_batches(key_partial, batch_format="pyarrow")
            .groupby("k").aggregate(Sum("p_n", alias_name="n")),
            pa.schema([("k", pa.string()), ("n", pa.int64())]))

        def fold(b: pa.Table) -> pa.Table:
            n = b.column("n").to_numpy(zero_copy_only=False)
            valid = pc.not_equal(b.column("k"), SENT).to_numpy(
                zero_copy_only=False)
            return pa.table({
                "p_n": pa.array([int(n.sum())], pa.int64()),
                "p_v": pa.array(
                    [int(n.sum()) - int(valid.sum())], pa.int64()),
            })

        return _fold_counts(keys, fold)

    checks = []
    checks.append(("orders.o_orderkey unique",)
                  + unique_check("orders", ["o_orderkey"]))
    checks.append(("customer.c_custkey unique",)
                  + unique_check("customer", ["c_custkey"]))
    checks.append(("lineitem.(l_orderkey,l_linenumber) unique",)
                  + unique_check("lineitem",
                                 ["l_orderkey", "l_linenumber"]))
    checks.append(("orders.o_orderstatus accepted_values",)
                  + scan_check(
        "orders", ["o_orderstatus"],
        lambda b: pc.invert(pc.is_in(
            b.column("o_orderstatus"),
            value_set=pa.array(["O", "F", "P"], pa.string())))))
    checks.append(("lineitem.l_returnflag accepted_values",)
                  + scan_check(
        "lineitem", ["l_returnflag"],
        lambda b: pc.invert(pc.is_in(
            b.column("l_returnflag"),
            value_set=pa.array(["A", "N", "R"], pa.string())))))
    checks.append(("lineitem.l_discount range_0_1",)
                  + scan_check(
        "lineitem", ["l_discount"],
        lambda b: pc.or_kleene(
            pc.less(b.column("l_discount"), 0.0),
            pc.greater(b.column("l_discount"), 1.0))))
    checks.append(("lineitem.l_quantity positive",)
                  + scan_check(
        "lineitem", ["l_quantity"],
        lambda b: pc.fill_null(
            pc.less_equal(b.column("l_quantity"), 0.0), True)))
    checks.append(("events.value not_null",)
                  + scan_check("events", ["value"],
                               lambda b: pc.is_null(b.column("value"))))
    checks.append(("events.ts not_null",)
                  + scan_check("events", ["ts"],
                               lambda b: pc.is_null(b.column("ts"))))
    return rd.from_arrow(pa.table({
        "check_name": pa.array([c[0] for c in checks], pa.string()),
        "n_checked": pa.array([c[1] for c in checks], pa.int64()),
        "n_violations": pa.array([c[2] for c in checks], pa.int64()),
    }))


def q_events_funnel_timebound(sf_dir: str) -> pa.Table:
    """Attribution-window funnel (the marketing-analytics variant of
    q_events_funnel): view → first click within ONE HOUR strictly
    after the user's first view → any purchase within 24 HOURS
    strictly after that first qualifying click.  Join-free: one
    user-key co-partition walks each user's filtered history with
    numpy masks; the 3-row stage table folds from per-group
    stage-reached partials.  Timestamps compare as exact int64 µs."""
    import numpy as np

    HOUR_US = 3_600_000_000
    DAY_US = 86_400_000_000

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_type"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.is_in(
            b.column("event_type"),
            value_set=pa.array(["view", "click", "purchase"],
                               pa.string()))),
        batch_format="pyarrow")

    def stage(g: pa.Table) -> pa.Table:
        ts = g.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        typ = np.asarray(g.column("event_type"))
        v = ts[typ == "view"]
        reached = 0
        if len(v):
            reached = 1
            t_view = v.min()
            c = ts[typ == "click"]
            c = c[(c > t_view) & (c <= t_view + HOUR_US)]
            if len(c):
                reached = 2
                t_click = c.min()
                p = ts[typ == "purchase"]
                if ((p > t_click) & (p <= t_click + DAY_US)).any():
                    reached = 3
        return pa.table({"reached": pa.array([reached], pa.int64())})

    per_user = ds.groupby("user_id").map_groups(
        stage, batch_format="pyarrow")

    def fold(b: pa.Table) -> pa.Table:
        r = b.column("reached").to_numpy(zero_copy_only=False)
        return pa.table({
            "p_v": pa.array([int((r >= 1).sum())], pa.int64()),
            "p_c": pa.array([int((r >= 2).sum())], pa.int64()),
            "p_p": pa.array([int((r >= 3).sum())], pa.int64()),
        })

    t = _small_table(per_user.map_batches(fold, batch_format="pyarrow"))
    nv = int(pc.sum(t.column("p_v")).as_py() or 0) if t is not None else 0
    nc = int(pc.sum(t.column("p_c")).as_py() or 0) if t is not None else 0
    np_ = int(pc.sum(t.column("p_p")).as_py() or 0) if t is not None else 0
    return pa.table({
        "stage": pa.array(["view", "click_1h", "purchase_24h"],
                          pa.string()),
        "n_users": pa.array([nv, nc, np_], pa.int64()),
    })


def q_events_top_paths(sf_dir: str) -> Dataset:
    """Path analysis (the product-analytics 'top user journeys'
    operator): each user's first THREE events (by ts, event_id) join
    into a '>' path string; report the 10 most common paths (ties
    break on the path string).  One user-key co-partition emits one
    path row per user; the path domain is bounded (|types|³), so the
    counts fold through a per-block partial + one tiny exchange and
    the top-10 sits on the driver."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])

    def path(g: pa.Table) -> pa.Table:
        ts = g.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))[:3]
        types = np.asarray(g.column("event_type"))[order]
        return pa.table({"path": pa.array([">".join(types)],
                                          pa.string())})

    paths = ds.groupby("user_id").map_groups(
        path, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by("path").aggregate([([], "count_all")])
        return g.rename_columns(["path", "p_n"])

    counts = with_schema(
        paths.map_batches(partial, batch_format="pyarrow")
        .groupby("path").aggregate(Sum("p_n", alias_name="n_users")),
        pa.schema([("path", pa.string()), ("n_users", pa.int64())]))
    t = _small_table(counts)  # bounded: |event types|^3 paths
    if t is None:
        return rd.from_arrow(pa.table({
            "path": pa.array([], pa.string()),
            "n_users": pa.array([], pa.int64()),
        }))
    p = np.asarray(t.column("path"))
    n = t.column("n_users").to_numpy(zero_copy_only=False)
    order = np.lexsort((p, -n))[:10]
    return rd.from_arrow(pa.table({
        "path": pa.array(p[order]),
        "n_users": pa.array(n[order], pa.int64()),
    }))


def q_events_daily_anomaly(sf_dir: str) -> Dataset:
    """Volume-anomaly monitor: each day's event count z-scored against
    the TRAILING 7 observed days (ROWS frame, current day excluded).
    The window sums are exact ints; z is a single closed-form float
    expression — (7n−Σx) / (7·sqrt((7Σx²−(Σx)²)/42)) — whose every
    operation (int casts, one divide, one IEEE-correctly-rounded
    sqrt) replays bit-identically in the twin.  Zero-variance windows
    are excluded in both engines.  One bounded (day) exchange; the
    day series folds on the driver."""
    import numpy as np

    DAY_US = 86_400_000_000

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.divide(b.column("ts").cast(pa.int64()),
                        pa.scalar(DAY_US, pa.int64()))
        g = pa.table({"day_idx": day}).group_by("day_idx").aggregate(
            [([], "count_all")])
        return g.rename_columns(["day_idx", "p_n"])

    daily = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day_idx").aggregate(Sum("p_n", alias_name="n")),
        pa.schema([("day_idx", pa.int64()), ("n", pa.int64())]))
    t = _small_table(daily)  # calendar-bounded
    if t is None or t.num_rows <= 7:
        return rd.from_arrow(pa.table({
            "day_idx": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "sum7": pa.array([], pa.int64()),
            "sumsq7": pa.array([], pa.int64()),
            "z": pa.array([], pa.float64()),
        }))
    days = t.column("day_idx").to_numpy(zero_copy_only=False)
    n = t.column("n").to_numpy(zero_copy_only=False)
    order = np.argsort(days)
    days, n = days[order], n[order]
    cum = np.concatenate([[0], np.cumsum(n)])
    cumsq = np.concatenate([[0], np.cumsum(n * n)])
    i = np.arange(7, len(n))
    sum7 = cum[i] - cum[i - 7]
    sumsq7 = cumsq[i] - cumsq[i - 7]
    var_num = 7 * sumsq7 - sum7 * sum7
    keep = var_num > 0
    i, sum7, sumsq7, var_num = i[keep], sum7[keep], sumsq7[keep], \
        var_num[keep]
    z = (7 * n[i] - sum7).astype(np.float64) / (
        7.0 * np.sqrt(var_num.astype(np.float64) / 42.0))
    return rd.from_arrow(pa.table({
        "day_idx": pa.array(days[i], pa.int64()),
        "n": pa.array(n[i], pa.int64()),
        "sum7": pa.array(sum7, pa.int64()),
        "sumsq7": pa.array(sumsq7, pa.int64()),
        "z": pa.array(z, pa.float64()),
    }))


def q_lineitem_zorder_stats(sf_dir: str) -> Dataset:
    """Z-order (Morton) clustering-key assignment — the data-layout
    primitive behind Delta/Iceberg OPTIMIZE ZORDER: interleave the low
    16 bits of (l_partkey, l_suppkey) with the classic
    magic-number bit spread, then report per top-8-bit z-bucket the
    row count and zmin/zmax — the stats a layout optimizer uses to
    range-partition files.  Pure vectorized int64 bit ops per block
    (no float anywhere), one bounded (≤256 bucket) exchange."""
    import numpy as np

    def spread(x):
        x = x & 0xFFFF
        x = (x | (x << 8)) & 0x00FF00FF
        x = (x | (x << 4)) & 0x0F0F0F0F
        x = (x | (x << 2)) & 0x33333333
        x = (x | (x << 1)) & 0x55555555
        return x

    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_suppkey"])

    def partial(b: pa.Table) -> pa.Table:
        a = b.column("l_partkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        s = b.column("l_suppkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        z = spread(a % 65536) | (spread(s % 65536) << 1)
        g = pa.table({
            "zbucket": pa.array(z >> 24, pa.int64()),
            "zval": pa.array(z, pa.int64()),
        }).group_by("zbucket").aggregate(
            [([], "count_all"), ("zval", "min"), ("zval", "max")])
        return g.rename_columns(["zbucket", "p_n", "p_min", "p_max"])

    return with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("zbucket").aggregate(Sum("p_n", alias_name="n_rows"),
                                      Min("p_min", alias_name="zmin"),
                                      Max("p_max", alias_name="zmax")),
        pa.schema([("zbucket", pa.int64()), ("n_rows", pa.int64()),
                   ("zmin", pa.int64()), ("zmax", pa.int64())]))


def q_events_user_streaks(sf_dir: str) -> Dataset:
    """Longest consecutive-active-day streak per user — the classic
    gaps-and-islands engagement metric (day − ROW_NUMBER() anchor in
    SQL).  Scale shape: (user, day) pairs are deduped INSIDE each batch
    first, so the one groupby(user) exchange carries at most
    users × active-days rows, never raw events; the streak walk is one
    np.unique + diff-run pass per user group."""
    import numpy as np

    DAY = 86_400_000_000
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def days_partial(b: pa.Table) -> pa.Table:
        t = pc.cast(b.column("ts"), pa.int64())
        day = pc.divide(t, pa.scalar(DAY, pa.int64()))  # ts >= epoch here
        g = pa.table({"user_id": b.column("user_id"), "day": day}) \
            .group_by(["user_id", "day"]).aggregate([([], "count_all")])
        return g.select(["user_id", "day"])

    def streak(g: pa.Table) -> pa.Table:
        days = np.unique(g.column("day").to_numpy(zero_copy_only=False))
        # run boundaries where the day gap exceeds 1
        brk = np.flatnonzero(np.diff(days) != 1)
        edges = np.concatenate([[-1], brk, [len(days) - 1]])
        longest = int(np.max(np.diff(edges))) if len(days) else 0
        return pa.table({
            "user_id": g.column("user_id").slice(0, 1),
            "n_active_days": pa.array([len(days)], pa.int64()),
            "longest_streak": pa.array([longest], pa.int64()),
        })

    return ds.map_batches(days_partial, batch_format="pyarrow") \
        .groupby("user_id").map_groups(streak, batch_format="pyarrow")


def q_events_max_concurrent(sf_dir: str) -> pa.Table:
    """Peak concurrency (max simultaneously-open intervals) with each
    event held open for 15 minutes, half-open [ts, ts+15m) — the
    sweep-line +1/−1 staple behind "max concurrent sessions" capacity
    reports.  Distributed prefix scan: boundary points collapse to one
    net delta per timestamp (one bounded exchange), the collapsed
    series is range-sorted, and each sorted block reduces to a
    three-number summary (total, max-prefix, argmax ts) combined on the
    driver in O(blocks) — the Blelloch scan shape; raw events and the
    collapsed series never materialize on the driver."""
    import numpy as np

    HOLD = 900_000_000
    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def points(b: pa.Table) -> pa.Table:
        t = pc.cast(b.column("ts"), pa.int64()) \
            .combine_chunks().to_numpy(zero_copy_only=False)
        pts = pa.table({
            "t": pa.array(np.concatenate([t, t + HOLD]), pa.int64()),
            "delta": pa.array(
                np.concatenate([np.ones(len(t), np.int64),
                                -np.ones(len(t), np.int64)])),
        })
        g = pts.group_by("t").aggregate([("delta", "sum")])
        return g.rename_columns(["t", "p_d"])

    collapsed = with_schema(
        ds.map_batches(points, batch_format="pyarrow")
        .groupby("t").aggregate(Sum("p_d", alias_name="d")),
        pa.schema([("t", pa.int64()), ("d", pa.int64())])).sort("t")

    @ray.remote
    def block_summary(tbl: pa.Table):
        if tbl.num_rows == 0:
            return 0, None, None
        d = tbl.column("d").to_numpy(zero_copy_only=False)
        pref = np.cumsum(d)
        i = int(np.argmax(pref))          # first index attaining the max
        t = tbl.column("t").to_numpy(zero_copy_only=False)
        return int(pref[-1]), int(pref[i]), int(t[i])

    parts = ray.get([block_summary.remote(r)
                     for r in collapsed.to_arrow_refs()])
    offset, best, best_t = 0, None, None
    for total, mx, mt in parts:
        if mx is not None:
            cand = offset + mx
            if best is None or cand > best:
                best, best_t = cand, mt
        offset += total
    return pa.table({
        "max_concurrent": pa.array([best], pa.int64()),
        "at_ts": pa.array([best_t], pa.int64()),
    })


def q_events_cume_dist(sf_dir: str) -> Dataset:
    """CUME_DIST window: count(value' <= value) / n within event type —
    the percentile-inclusive twin of PERCENT_RANK (same per-type
    map_groups co-location contract; searchsorted side='right' is the
    <= count, the division written operand-identically to DuckDB's)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def cdist(g: pa.Table) -> pa.Table:
        v = g.column("value").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        sv = np.sort(v)
        le = np.searchsorted(sv, v, side="right").astype(np.float64)
        cd = le / np.float64(len(v))
        return g.append_column(
            "cd", round_sql(pa.array(cd, pa.float64()), 6))

    return ds.groupby("event_type").map_groups(cdist,
                                               batch_format="pyarrow")


def q_lineitem_weighted_median(sf_dir: str) -> Dataset:
    """Quantity-weighted median extended price per return flag (lower
    weighted median: smallest price whose cumulative weight reaches
    half the total, 2·cum >= tot in exact int64).  Scale shape: prices
    quantize to cents in-batch and only the (flag, cents)→weight
    histogram is exchanged — the median walk runs over the bounded
    per-flag distinct-price grid, never raw lineitems."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_returnflag", "l_extendedprice",
                                  "l_quantity"])

    def partial(b: pa.Table) -> pa.Table:
        cents = scaled_int_sql(b.column("l_extendedprice"), 100.0)
        qty = scaled_int_sql(b.column("l_quantity"), 1.0)
        g = pa.table({"l_returnflag": b.column("l_returnflag"),
                      "cents": pa.array(cents, pa.int64()),
                      "w": pa.array(qty, pa.int64())}) \
            .group_by(["l_returnflag", "cents"]).aggregate([("w", "sum")])
        return g.rename_columns(["l_returnflag", "cents", "p_w"])

    hist = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["l_returnflag", "cents"]).aggregate(
            Sum("p_w", alias_name="w"))

    def median(g: pa.Table) -> pa.Table:
        g = g.sort_by([("cents", "ascending")])
        w = g.column("w").to_numpy(zero_copy_only=False)
        cents = g.column("cents").to_numpy(zero_copy_only=False)
        cum = np.cumsum(w)
        tot = int(cum[-1])
        i = int(np.searchsorted(2 * cum, tot))  # first 2*cum >= tot
        med = pa.array([np.float64(cents[i]) / np.float64(100.0)],
                       pa.float64())
        return pa.table({
            "l_returnflag": g.column("l_returnflag").slice(0, 1),
            "w_median": round_sql(med, 2),
            "tot_qty": pa.array([tot], pa.int64()),
        })

    return hist.groupby("l_returnflag").map_groups(
        median, batch_format="pyarrow")


def q_orders_budget_allocation(sf_dir: str) -> Dataset:
    """FIFO / waterfall cap allocation — the classic "apply a budget
    to ordered tiers" shape: each order's budget (90 % of
    o_totalprice, floored in exact cents) is allocated across its
    l_linenumber TIERS in tier order (this corpus reuses linenumbers
    within an order, so the tier — not the row — is the allocation
    grain); a tier gets min(tier_total, max(cap − already-allocated,
    0)).

    Scale shape: the per-order running sum never needs a per-group
    walk — l_linenumber is bounded (1..7, loud-fail below), so each
    order pivots to ONE fixed-width row (7 tier-total columns) built
    from in-batch partials, one groupby(orderkey) exchange, one hash
    join against the order caps, and the cumsum / clamp runs as an
    (n × 7) vectorized pass."""
    import numpy as np

    W = 7
    line = rd.read_parquet(_t(sf_dir, "lineitem"),
                           columns=["l_orderkey", "l_linenumber",
                                    "l_extendedprice"])

    def pivot_partial(b: pa.Table) -> pa.Table:
        cents = np.asarray(scaled_int_sql(b.column("l_extendedprice"),
                                          100.0))
        ln = b.column("l_linenumber").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(ln) and (ln.min() < 1 or ln.max() > W):
            raise ValueError(
                f"budget_allocation: l_linenumber outside 1..{W} — "
                "widen the pivot")
        cols: dict = {"l_orderkey": b.column("l_orderkey")}
        for j in range(1, W + 1):
            m = (ln == j)
            cols[f"c_{j}"] = pa.array(np.where(m, cents, 0), pa.int64())
            cols[f"e_{j}"] = pa.array(m.astype(np.int64), pa.int64())
        g = pa.table(cols).group_by("l_orderkey").aggregate(
            [(f"c_{j}", "sum") for j in range(1, W + 1)] +
            [(f"e_{j}", "sum") for j in range(1, W + 1)])
        return g.rename_columns(
            ["l_orderkey"] + [f"c_{j}" for j in range(1, W + 1)] +
            [f"e_{j}" for j in range(1, W + 1)])

    pivot_schema = pa.schema(
        [("l_orderkey", pa.int64())] +
        [(f"c_{j}", pa.int64()) for j in range(1, W + 1)] +
        [(f"e_{j}", pa.int64()) for j in range(1, W + 1)])
    pivot = with_schema(
        line.map_batches(pivot_partial, batch_format="pyarrow")
        .groupby("l_orderkey").aggregate(
            *([Sum(f"c_{j}", alias_name=f"c_{j}")
               for j in range(1, W + 1)] +
              [Sum(f"e_{j}", alias_name=f"e_{j}")
               for j in range(1, W + 1)])),
        pivot_schema)

    def order_caps(b: pa.Table) -> pa.Table:
        tot = np.asarray(scaled_int_sql(b.column("o_totalprice"), 100.0))
        return pa.table({"o_orderkey": b.column("o_orderkey"),
                         "cap": pa.array((tot * 9) // 10, pa.int64())})

    caps = rd.read_parquet(_t(sf_dir, "orders"),
                           columns=["o_orderkey", "o_totalprice"]) \
        .map_batches(order_caps, batch_format="pyarrow")

    joined = pivot.join(caps, join_type="inner", num_partitions=16,
                        on=("l_orderkey",), right_on=("o_orderkey",))

    def alloc(b: pa.Table) -> pa.Table:
        n = b.num_rows
        P = np.stack([b.column(f"c_{j}").to_numpy(zero_copy_only=False)
                      for j in range(1, W + 1)], axis=1)
        E = np.stack([b.column(f"e_{j}").to_numpy(zero_copy_only=False)
                      for j in range(1, W + 1)], axis=1)
        cumb = np.cumsum(P, axis=1) - P
        cap = b.column("cap").to_numpy(
            zero_copy_only=False).reshape(n, 1)
        a = np.minimum(P, np.maximum(cap - cumb, 0))
        keep = (E >= 1).ravel()
        ok = np.repeat(
            b.column("l_orderkey").to_numpy(zero_copy_only=False), W)
        lns = np.tile(np.arange(1, W + 1, dtype=np.int64), n)
        tv = pa.array(P.ravel()[keep].astype(np.float64)
                      / np.float64(100.0), pa.float64())
        av = pa.array(a.ravel()[keep].astype(np.float64)
                      / np.float64(100.0), pa.float64())
        return pa.table({
            "l_orderkey": pa.array(ok[keep], pa.int64()),
            "l_linenumber": pa.array(lns[keep], pa.int64()),
            "tier_total": round_sql(tv, 2),
            "alloc_amt": round_sql(av, 2),
        })

    return joined.map_batches(alloc, batch_format="pyarrow")


def q_events_levene_test(sf_dir: str) -> Dataset:
    """Brown–Forsythe (median-centered Levene) test of variance
    homogeneity of event value across the five event types — the
    drift-monitoring companion to q_events_anova_f: ANOVA's F applied
    to the absolute deviations from each group's median.

    Distributed shape: the SAME single (value → per-type count)
    histogram exchange as Kruskal–Wallis answers everything — the
    per-type medians fall out of cumulative counts over the bounded
    distinct-value grid, and the deviation moments fold over that grid
    too, so raw events are scanned exactly once and never re-shuffled.
    Exactness: deviations are |2·cents − (lo+hi)| — twice the median
    deviation, an exact int64 (the ×2 cancels in F, which is
    scale-invariant; the twin spells the identical quantity).  The
    float F tree replays q_events_anova_f's left-associated declared-
    order chain."""
    import numpy as np

    def partial(b: pa.Table) -> pa.Table:
        et = b.column("event_type")
        cols = {"value": b.column("value")}
        for t in EVENT_TYPES:
            cols[f"c_{t}"] = pc.cast(pc.equal(et, t), pa.int64())
        g = pa.table(cols).group_by("value").aggregate(
            [(f"c_{t}", "sum") for t in EVENT_TYPES])
        return g.rename_columns(["value"] +
                                [f"p_{t}" for t in EVENT_TYPES])

    hist = rd.read_parquet(_t(sf_dir, "events"),
                           columns=["event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("value").aggregate(
            *[Sum(f"p_{t}", alias_name=f"n_{t}") for t in EVENT_TYPES])
    tb = _small_table(hist)   # bounded: the distinct-value histogram
    tb = tb.sort_by("value")
    cents = np.asarray(scaled_int_sql(tb.column("value"), 100.0))
    k = len(EVENT_TYPES)
    n, s, ss = {}, {}, {}
    for t in EVENT_TYPES:
        cnt = tb.column(f"n_{t}").to_numpy(zero_copy_only=False)
        n[t] = int(cnt.sum())
        cum = np.cumsum(cnt)
        lo = cents[int(np.searchsorted(cum, (n[t] + 1) // 2))]
        hi = cents[int(np.searchsorted(cum, (n[t] + 2) // 2))]
        z2 = np.abs(2 * cents - (lo + hi))
        s[t] = int((cnt * z2).sum())
        ss[t] = int((cnt * z2 * z2).sum())
    N = sum(n.values())
    S = sum(s.values())
    SS = sum(ss.values())
    sb = 0.0
    for t in EVENT_TYPES:   # left-associated, declared order
        sb = sb + float(s[t]) * float(s[t]) / float(n[t])
    ssb = sb - float(S) * float(S) / float(N)
    ssw = float(SS) - sb
    f_stat = (ssb / float(k - 1)) / (ssw / float(N - k))
    return rd.from_arrow(pa.table({
        "f_stat": pa.array([f_stat], pa.float64()),
        "dof_between": pa.array([k - 1], pa.int64()),
        "dof_within": pa.array([N - k], pa.int64()),
        "n_events": pa.array([N], pa.int64())}))


def q_documents_prefix_dedup(sf_dir: str) -> Dataset:
    """Prefix-key dedup — the truncated-copy catcher: documents whose
    NORMALIZED first 64 characters agree collapse to one group
    (smallest doc_id elected keeper, group size reported), so a
    snippet/teaser cut of a longer page dedups against its source even
    though full-text keys differ.  Same normalization and exchange
    shape as q_documents_dedup_normalized (in-batch Min/Count
    pre-reduce, one exchange of one row per distinct prefix per
    block); binds beyond the full-key dedup at every tested scale
    (sf0.01: 477 prefix groups vs 500 full-key groups)."""
    PREFIX = 64
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        k = pc.utf8_lower(b.column("text"))
        k = pc.replace_substring_regex(k, "[^a-z0-9 ]", "")
        k = pc.replace_substring_regex(k, " +", " ")
        k = pc.utf8_trim(k, " ")
        k = pc.utf8_slice_codeunits(k, 0, PREFIX)
        t = pa.table({"k": k,
                      "doc_id": pc.cast(b.column("doc_id"), pa.int64())})
        g = t.group_by("k").aggregate(
            [("doc_id", "min"), ("doc_id", "count")])
        return g.rename_columns(["k", "p_min", "p_n"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("k").aggregate(Min("p_min"), Sum("p_n"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(b.column("min(p_min)"), pa.int64()),
            "n_copies": pc.cast(b.column("sum(p_n)"), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Round-4 session-9: inference-stats wave (Wilson CI, Cohen's d,
# two-proportion z, day-of-week seasonality)
# ---------------------------------------------------------------------------

DAY_US_ = 86_400_000_000


def _isodow_from_us(ts_us):
    """ISO day-of-week (Mon=1..Sun=7) off epoch-µs ints: 1970-01-01 is
    Thursday (ISO 4), so ((days + 3) % 7) + 1.  Integer-exact; matches
    DuckDB's isodow(ts) for the post-1970 corpus (floor-division would
    be needed pre-1970 — these events are 2024)."""
    return ((ts_us // DAY_US_) + 3) % 7 + 1


def q_events_wilson_ci(sf_dir: str) -> Dataset:
    """Wilson 95 % score interval per event type for the proportion of
    that type's events landing on a WEEKEND (ISO dow 6/7) — the
    binomial-CI staple (feature-flag dashboards, conversion monitors)
    in its numerically honest form: k and n are exact int64 counts off
    one bounded tree combine; the interval is one float expression per
    type replayed operand-for-operand against the twin (z = 1.96
    literal both sides, so the z² constant folds identically).

    Scale shape: a (type, weekend) count partial per block, bounded
    grid (5 × 2), tree-combined; no raw row ever shuffles."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        wk = (_isodow_from_us(us) >= 6).astype(np.int64)
        t = pa.table({"event_type": b.column("event_type"),
                      "one": pa.array(np.ones(len(us), np.int64)),
                      "wk": pa.array(wk)})
        g = t.group_by("event_type").aggregate(
            [("one", "sum"), ("wk", "sum")])
        return g.rename_columns(["event_type", "p_n", "p_k"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], [("p_n", "sum"), ("p_k", "sum")],
        ["event_type", "p_n", "p_k"], ["event_type", "n", "k"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("event_type", "ascending")])
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        k = b.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
        nf = n.astype(np.float64)
        p = k.astype(np.float64) / nf
        z2 = 1.96 * 1.96          # constant-folds to the same double
        denom = 1.0 + z2 / nf
        center = (p + z2 / (2.0 * nf)) / denom
        half = 1.96 * np.sqrt(p * (1.0 - p) / nf
                              + z2 / (4.0 * nf * nf)) / denom
        return pa.table({
            "event_type": b.column("event_type"),
            "n_events": pa.array(n, pa.int64()),
            "n_weekend": pa.array(k, pa.int64()),
            "p_weekend": pa.array(p, pa.float64()),
            "ci_lo": pa.array(center - half, pa.float64()),
            "ci_hi": pa.array(center + half, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_events_cohens_d(sf_dir: str) -> Dataset:
    """Cohen's d effect size between purchase and view event values —
    the A/B-test companion to the Welch t family: pooled-SD-scaled mean
    difference, one row.  Sums ride exact int64 cents (Σx² headroom
    ~3.7e9 rows at 5e4 max cents; the twin's HUGEINT never wraps);
    means/variances/d replay the twin's float expression tree
    operand-for-operand, with Σx·Σx computed in FLOAT on both sides
    (the int square would wrap first).

    Scale shape: one bounded (type, n, Σx, Σx²) partial per block,
    tree-combined over a 2-row grid; finish is driver-trivial."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_in(b.column("event_type"),
                             value_set=pa.array(["purchase", "view"])),
                    pc.is_valid(b.column("value")))
        b = b.filter(m)
        if b.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "p_n": pa.array([], pa.int64()),
                             "p_s": pa.array([], pa.int64()),
                             "p_ss": pa.array([], pa.int64())})
        cents = scaled_int_sql(b.column("value"), 100.0)
        t = pa.table({"event_type": b.column("event_type"),
                      "c": pa.array(cents),
                      "cc": pa.array(cents * cents)})
        g = t.group_by("event_type").aggregate(
            [("c", "count"), ("c", "sum"), ("cc", "sum")])
        return g.rename_columns(["event_type", "p_n", "p_s", "p_ss"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], [("p_n", "sum"), ("p_s", "sum"), ("p_ss", "sum")],
        ["event_type", "p_n", "p_s", "p_ss"],
        ["event_type", "n", "s", "ss"])

    def finish(b: pa.Table) -> pa.Table:
        row = {r["event_type"]: r for r in b.to_pylist()}
        g1, g2 = row["purchase"], row["view"]

        def moments(r):
            nf = np.float64(r["n"])
            sf = np.float64(r["s"])
            mean = sf / nf
            var = (np.float64(r["ss"]) - (sf * sf) / nf) / (nf - 1.0)
            return nf, mean, var

        n1, m1, v1 = moments(g1)
        n2, m2, v2 = moments(g2)
        pooled = ((n1 - 1.0) * v1 + (n2 - 1.0) * v2) \
            / (np.float64(g1["n"] + g2["n"]) - 2.0)
        d = (m1 - m2) / np.sqrt(pooled)
        return pa.table({
            "n_purchase": pa.array([g1["n"]], pa.int64()),
            "n_view": pa.array([g2["n"]], pa.int64()),
            "mean_purchase_cents": pa.array([float(m1)], pa.float64()),
            "mean_view_cents": pa.array([float(m2)], pa.float64()),
            "cohens_d": pa.array([float(d)], pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_events_weekend_ztest(sf_dir: str) -> Dataset:
    """Two-proportion pooled z-test: does the purchase SHARE of events
    differ between weekend and weekday?  The conversion-rate A/B
    statistic in exact form — k/n counts per bucket are int64 off one
    bounded tree combine; p₁, p₂, the pooled p̂ and the z expression
    replay the twin term-for-term (ints added BEFORE the one float
    division, 1.0/n reciprocals spelled the same way)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        wk = (_isodow_from_us(us) >= 6).astype(np.int64)
        pur = pc.equal(b.column("event_type"), "purchase") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"wk": pa.array(wk),
                      "one": pa.array(np.ones(len(us), np.int64)),
                      "p": pa.array(pur)})
        g = t.group_by("wk").aggregate([("one", "sum"), ("p", "sum")])
        return g.rename_columns(["wk", "p_n", "p_k"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["wk"], [("p_n", "sum"), ("p_k", "sum")],
        ["wk", "p_n", "p_k"], ["wk", "n", "k"])

    def finish(b: pa.Table) -> pa.Table:
        row = {int(r["wk"]): r for r in b.to_pylist()}
        n1, k1 = row[1]["n"], row[1]["k"]   # weekend
        n2, k2 = row[0]["n"], row[0]["k"]   # weekday
        p1 = np.float64(k1) / np.float64(n1)
        p2 = np.float64(k2) / np.float64(n2)
        pp = np.float64(k1 + k2) / np.float64(n1 + n2)
        se = np.sqrt(pp * (1.0 - pp)
                     * (1.0 / np.float64(n1) + 1.0 / np.float64(n2)))
        z = (p1 - p2) / se
        return pa.table({
            "n_weekend": pa.array([n1], pa.int64()),
            "k_weekend": pa.array([k1], pa.int64()),
            "n_weekday": pa.array([n2], pa.int64()),
            "k_weekday": pa.array([k2], pa.int64()),
            "p_weekend": pa.array([float(p1)], pa.float64()),
            "p_weekday": pa.array([float(p2)], pa.float64()),
            "z_two_prop": pa.array([float(z)], pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_events_dow_seasonality(sf_dir: str) -> Dataset:
    """Day-of-week seasonal index — the weekly-seasonality staple:
    per ISO dow, event count, share of total, and the seasonal index
    (share × 7, so 1.0 = flat).  Counts exact off one bounded tree
    combine; the two floats divide the exact ints the twin's way
    (share first, then × 7.0)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        dow = _isodow_from_us(us)
        t = pa.table({"isodow": pa.array(dow.astype(np.int64)),
                      "one": pa.array(np.ones(len(us), np.int64))})
        g = t.group_by("isodow").aggregate([("one", "sum")])
        return g.rename_columns(["isodow", "p_n"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["isodow"], [("p_n", "sum")],
        ["isodow", "p_n"], ["isodow", "n"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("isodow", "ascending")])
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(n.sum())
        share = n.astype(np.float64) / np.float64(total)
        return pa.table({
            "isodow": b.column("isodow").cast(pa.int64()),
            "n_events": pa.array(n, pa.int64()),
            "share": pa.array(share, pa.float64()),
            "seasonal_index": pa.array(share * 7.0, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_events_seasonal_adjust(sf_dir: str) -> Dataset:
    """Seasonally-adjusted daily event series: each day's count divided
    by its day-of-week seasonal index (dow share × 7) — the
    deseasonalization step every volume-anomaly monitor runs before
    thresholding, so a quiet Sunday doesn't page.  Counts are exact
    int64 off one bounded tree combine (calendar days); the index and
    the adjusted value replay the twin's float expression tree on the
    single final block (dow share first, × 7.0, then the division).

    Scale shape: one (day) count partial per block, tree-combined over
    the bounded calendar grid; the dow totals derive from the day grid
    itself on the final single block — no second pass over raw rows."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day")
        t = pa.table({"day": day})
        g = t.group_by("day").aggregate([("day", "count")])
        return g.rename_columns(["day", "p_n"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], [("p_n", "sum")], ["day", "p_n"], ["day", "n"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("day", "ascending")])
        us = b.column("day").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        dow = _isodow_from_us(us).astype(np.int64)
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        total = np.float64(int(n.sum()))
        dow_tot = np.zeros(8, np.int64)
        np.add.at(dow_tot, dow, n)
        idx = dow_tot[dow].astype(np.float64) / total * 7.0
        return pa.table({
            "day": b.column("day"),
            "n_events": pa.array(n, pa.int64()),
            "isodow": pa.array(dow, pa.int64()),
            "seasonal_index": pa.array(idx, pa.float64()),
            "adjusted_events": pa.array(n.astype(np.float64) / idx,
                                        pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_events_wow_growth(sf_dir: str) -> Dataset:
    """Week-over-week growth: Monday-truncated weekly event counts with
    the previous week's count and the relative change — the growth-rate
    report every ingest dashboard leads with.  floor_temporal(week)
    is Monday-based like DuckDB's date_trunc('week'); counts are exact
    int64 off one bounded tree combine, the LAG is a driver-trivial
    shift on the sorted final block, and the growth ratio is the one
    float division replayed from exact ints.  The first week (no
    predecessor) is dropped on both sides — emitting its NULL would
    downgrade prev_events to float in both frames and hash fine, but
    the dropped row is the cleaner contract."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        wk = pc.floor_temporal(b.column("ts"), unit="week")
        t = pa.table({"week": wk})
        g = t.group_by("week").aggregate([("week", "count")])
        return g.rename_columns(["week", "p_n"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["week"], [("p_n", "sum")], ["week", "p_n"], ["week", "n"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("week", "ascending")])
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(n) <= 1:
            return pa.table({
                "week": b.column("week").slice(0, 0),
                "n_events": pa.array([], pa.int64()),
                "prev_events": pa.array([], pa.int64()),
                "wow_growth": pa.array([], pa.float64()),
            })
        cur, prev = n[1:], n[:-1]
        growth = (cur - prev).astype(np.float64) \
            / prev.astype(np.float64)
        return pa.table({
            "week": b.column("week").slice(1),
            "n_events": pa.array(cur, pa.int64()),
            "prev_events": pa.array(prev, pa.int64()),
            "wow_growth": pa.array(growth, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_documents_nb_classify(sf_dir: str) -> Dataset:
    """Multinomial Naive Bayes source classifier, trained and evaluated
    on the corpus in one distributed pass, reported as the (true
    source × predicted source) confusion matrix — the classic
    bag-of-words classifier (and the standard domain-tagging /
    source-attribution primitive in curation pipelines), kept
    bit-checkable end-to-end.

    Exact-integer decomposition: with Laplace smoothing, score(d, c) =
    Σ_t∈d ln(cnt(c,t)+1) − |d|·ln(T_c + V); unseen (c,t) pairs
    contribute ln(1) = 0, so the model matrix is zero-filled there.
    Both ln terms are quantized to int64 (ROUND(ln × 1e6), the
    unigram_logprob precedent), every per-doc sum is order-independent
    int64, and the per-doc argmax rides a packed key (score·64 −
    class_idx, classes in sorted order) whose max is exactly the
    twin's ORDER BY score DESC, cls ASC.

    Scale shape: training is ONE (class, token) vocabulary groupby
    (per-doc counts fold inside the tokenizing batch — a document
    never straddles blocks); the fitted model (V×K quantized
    log-likelihood matrix — NB's model-fits-in-memory assumption,
    ~3 MB/100k-token vocabulary at 20 classes) broadcasts once via
    ray.put, and scoring + per-doc argmax + the confusion partial all
    run INSIDE each scoring batch — no token-keyed join, no (doc,
    class) exchange.  (The first version shipped that join; it fanned
    out ×|classes| per token occurrence and cost 43 s at sf0.1 where
    this broadcast form is one corpus scan.)

    No direct reference analogue (engine-mandated ML primitive); the
    broadcast-model scoring mirrors the kmeans/pagerank discipline."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "source", "text"])

    def dt_rows(b: pa.Table) -> pa.Table:
        """(source, tok, c_dt): per-doc token counts folded locally —
        each document's tokens live in one batch."""
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        src = b.column("source").to_numpy(zero_copy_only=False)
        t = pa.table({
            "doc_id": pa.array(np.repeat(ids, n), pa.int64()),
            "source": pa.array(np.repeat(src, n), pa.string()),
            "tok": flat,
        })
        g = t.group_by(["doc_id", "source", "tok"]).aggregate(
            [("tok", "count")])
        return g.rename_columns(["doc_id", "source", "tok", "c_dt"])

    dt = ds.map_batches(dt_rows, batch_format="pyarrow")

    # class-token training counts: the one vocabulary-sized shuffle.
    def ct_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "tok"]).aggregate([("c_dt", "sum")])
        return g.rename_columns(["cls", "tok", "p_c"])

    ctc = _small_table(
        dt.map_batches(ct_partial, batch_format="pyarrow")
        .groupby(["cls", "tok"]).aggregate(Sum("p_c", alias_name="c")))

    cls_col = ctc.column("cls").to_numpy(zero_copy_only=False)
    tok_col = ctc.column("tok").combine_chunks()
    c_col = ctc.column("c").to_numpy(zero_copy_only=False)

    t_c: dict = {}
    for cl, cv in zip(cls_col, c_col):
        t_c[cl] = t_c.get(cl, 0) + int(cv)
    classes = sorted(t_c)
    if len(classes) > 64:
        # the argmax rides packed = score·64 − class_idx; beyond 64
        # classes the pack would alias scores — fail loud, like the
        # vocab-overlap bitmask guard.
        raise ValueError(
            f"nb_classify: {len(classes)} classes exceed the 64-class "
            "packed-argmax capacity; widen the pack factor first")
    k = len(classes)
    cls_idx = {c: i for i, c in enumerate(classes)}

    vocab = pc.unique(tok_col).sort()
    vocab_n = len(vocab)
    qz_vec = np.array([int(scaled_int_sql(
        np.array([np.log(np.float64(t_c[c] + vocab_n))]), 1e6)[0])
        for c in classes], np.int64)

    # V×K quantized log-likelihood matrix; absent (cls, tok) = ln 1 = 0
    q1_mat = np.zeros((vocab_n, k), np.int64)
    vid = pc.index_in(tok_col, value_set=vocab)         .to_numpy(zero_copy_only=False)
    ci = np.array([cls_idx[c] for c in cls_col], np.int64)
    q1_mat[vid, ci] = scaled_int_sql(
        np.log(c_col.astype(np.float64) + 1.0), 1e6)
    model_ref = ray.put((vocab, q1_mat, qz_vec,
                         np.array(classes, object)))

    def classify(b: pa.Table) -> pa.Table:
        voc, q1m, qz, cls_arr = ray.get(model_ref)
        toks = pc.split_pattern(b.column("text"), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        nper = pc.list_value_length(toks)             .to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pc.index_in(flat, value_set=voc)             .to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(nper)[:-1]])
        S = np.add.reduceat(q1m[idx], starts, axis=0)
        score = S - nper[:, None] * qz[None, :]
        packed = score * 64 - np.arange(k, dtype=np.int64)[None, :]
        pred = cls_arr[np.argmax(packed, axis=1)]
        t = pa.table({
            "source": b.column("source"),
            "predicted": pa.array(pred, pa.string()),
        })
        g = t.group_by(["source", "predicted"]).aggregate(
            [("predicted", "count")])
        return g.rename_columns(["source", "predicted", "p_n"])

    agg = _tree_combine(
        ds.map_batches(classify, batch_format="pyarrow"),
        ["source", "predicted"], [("p_n", "sum")],
        ["source", "predicted", "p_n"],
        ["source", "predicted", "n_docs"])

    return agg.map_batches(
        lambda b: b.sort_by([("source", "ascending"),
                             ("predicted", "ascending")]),
        batch_format="pyarrow", batch_size=None)


def q_documents_js_divergence(sf_dir: str) -> Dataset:
    """Per-source Jensen-Shannon divergence vs the corpus unigram
    distribution — the symmetric, bounded [0, ln 2] drift score most
    mixture-monitoring pipelines prefer over raw KL (finite even on
    disjoint support).  Exact-integer decomposition (the source_kl
    pattern): with p = c_st/n_s, q = c_t/N over the source's observed
    vocabulary, JS = ½(S1/1e6/n_s + S2/1e6/N) + ½·ln2·(1 − C/N) where
    S1 = Σ c_st·q(ln 2p/(p+q)), S2 = Σ c_t·q(ln 2q/(p+q)), C = Σ c_t,
    q(·) = ROUND(· × 1e6) — the out-of-support complement folds into the
    closed-form ln2 term, so every sum is an order-free int64 and only
    the final expression is float.  Same quantized-sum headroom caveat
    as source_kl: |q(ln)| ≤ ~3e7 bounds n_s at ~3e11 tokens/source.

    Scale shape: the (source, token) grid and the corpus tf table are
    the two vocabulary exchanges; the per-source totals broadcast as a
    bounded dict; one token-keyed join, then bounded combines."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "text"])

    def tok_rows(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = b.column("source").to_numpy(zero_copy_only=False)
        return pa.table({
            "source": pa.array(np.repeat(src, n), pa.string()),
            "tok": flat,
        })

    toks = ds.map_batches(tok_rows, batch_format="pyarrow")

    def st_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "tok"]).aggregate([("tok", "count")])
        return g.rename_columns(["source", "tok", "p_n"])

    st = with_schema(
        toks.map_batches(st_partial, batch_format="pyarrow")
        .groupby(["source", "tok"]).aggregate(
            Sum("p_n", alias_name="c_st")),
        pa.schema([("source", pa.string()), ("tok", pa.string()),
                   ("c_st", pa.int64())]))

    def tf_partial(b: pa.Table) -> pa.Table:
        g = b.select(["tok"]).group_by("tok").aggregate(
            [("tok", "count")])
        return g.rename_columns(["tok", "p_n"])

    tf = with_schema(
        toks.map_batches(tf_partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("p_n", alias_name="c_t")),
        pa.schema([("tok", pa.string()), ("c_t", pa.int64())]))

    # bounded per-source token totals + the corpus total, driver-side
    ns_rows = st.map_batches(
        lambda b: b.group_by("source").aggregate([("c_st", "sum")])
        .rename_columns(["source", "n_s"]),
        batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n_s", alias_name="n_s")) \
        .take_all()
    n_s_map = {r["source"]: int(r["n_s"]) for r in ns_rows}
    n_total = sum(n_s_map.values())

    j = st.join(tf, join_type="inner", num_partitions=8, on=("tok",))

    def src_partial(b: pa.Table) -> pa.Table:
        c_st = b.column("c_st").to_numpy(zero_copy_only=False)
        c_t = b.column("c_t").to_numpy(zero_copy_only=False)
        n_s = np.array([n_s_map[s] for s in
                        b.column("source").to_pylist()], np.float64)
        p = c_st.astype(np.float64) / n_s
        q = c_t.astype(np.float64) / np.float64(n_total)
        q1 = scaled_int_sql(np.log(2.0 * p / (p + q)), 1e6)
        q2 = scaled_int_sql(np.log(2.0 * q / (p + q)), 1e6)
        t = pa.table({
            "source": b.column("source"),
            "s1": pa.array(c_st * q1, pa.int64()),
            "s2": pa.array(c_t * q2, pa.int64()),
            "c": pa.array(c_t, pa.int64()),
        })
        g = t.group_by("source").aggregate(
            [("s1", "sum"), ("s2", "sum"), ("c", "sum")])
        return g.rename_columns(["source", "p_s1", "p_s2", "p_c"])

    agg = j.map_batches(src_partial, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("p_s1", alias_name="s1"),
                                     Sum("p_s2", alias_name="s2"),
                                     Sum("p_c", alias_name="cc"))

    def finish(b: pa.Table) -> pa.Table:
        s1 = b.column("s1").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        s2 = b.column("s2").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cc = b.column("cc").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n_s = np.array([n_s_map[s] for s in
                        b.column("source").to_pylist()], np.float64)
        nt = np.float64(n_total)
        js = 0.5 * (s1 / 1e6 / n_s + s2 / 1e6 / nt) \
            + 0.5 * np.log(2.0) * (1.0 - cc / nt)
        return pa.table({
            "source": b.column("source"),
            "n_tokens": pa.array(n_s.astype(np.int64), pa.int64()),
            "js_vs_corpus": round_sql(pa.array(js, pa.float64()), 6),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_events_markov_stationary(sf_dir: str) -> Dataset:
    """Stationary distribution of the per-user event-type Markov chain
    (20 quantized power-iteration steps) — 'where does user behaviour
    settle' — with the transition counts built by the same distributed
    pass as events_type_transitions and the tiny |types|² iteration as
    driver math (the pagerank discipline, but here the state space is
    structurally bounded so the fixpoint itself is ORACLE-CHECKED: the
    twin replays the identical quantized recurrence in a recursive
    CTE).  Each step stores the vector as int64 at scale 1e12;
    contributions ROUND(v_i·n_ij/tot_i) use DuckDB ROUND semantics
    (scaled_int_sql), so every iterate is bit-identical to the twin's.
    Dangling states (never a predecessor) redistribute uniformly via
    synthetic (i, j, 1, |states|) edges — the PageRank convention,
    replayed in the twin's edge table."""
    import numpy as np

    ITERS = 20
    Q = 1e12

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])

    def steps(g: pa.Table) -> pa.Table:
        g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        et = g.column("event_type").combine_chunks()
        if len(et) < 2:
            return pa.table({"prev_type": pa.array([], pa.string()),
                             "next_type": pa.array([], pa.string()),
                             "p_c": pa.array([], pa.int64())})
        t = pa.table({"prev_type": et.slice(0, len(et) - 1),
                      "next_type": et.slice(1),
                      "one": pa.array(np.ones(len(et) - 1, np.int64))})
        out = t.group_by(["prev_type", "next_type"]) \
            .aggregate([("one", "sum")])
        return out.rename_columns(["prev_type", "next_type", "p_c"])

    counts = _small_table(_tree_combine(
        ds.groupby("user_id").map_groups(steps, batch_format="pyarrow"),
        ["prev_type", "next_type"], [("p_c", "sum")],
        ["prev_type", "next_type", "p_c"],
        ["prev_type", "next_type", "n"]).materialize())

    prev = counts.column("prev_type").to_pylist()
    nxt = counts.column("next_type").to_pylist()
    n_ij = counts.column("n").to_numpy(zero_copy_only=False)
    states = sorted(set(prev) | set(nxt))
    k = len(states)
    if k == 0:
        return rd.from_arrow(pa.table({
            "event_type": pa.array([], pa.string()),
            "pi_q": pa.array([], pa.int64()),
            "pi": pa.array([], pa.float64())}))
    sidx = {s: i for i, s in enumerate(states)}
    src = np.array([sidx[s] for s in prev], np.int64)
    dst = np.array([sidx[s] for s in nxt], np.int64)
    tot = np.zeros(k, np.int64)
    np.add.at(tot, src, n_ij)

    # edge list (i, j, num, den): observed rows normalize by the row
    # total; dangling states fan out uniformly (num=1, den=k)
    dangling = np.flatnonzero(tot == 0)
    e_i = np.concatenate([src, np.repeat(dangling, k)])
    e_j = np.concatenate([dst, np.tile(np.arange(k), len(dangling))])
    e_num = np.concatenate([n_ij,
                            np.ones(len(dangling) * k, np.int64)])
    e_den = np.concatenate([tot[src],
                            np.full(len(dangling) * k, k, np.int64)])

    v = np.full(k, int(scaled_int_sql(
        np.array([Q / np.float64(k)]), 1.0)[0]), np.int64)
    for _ in range(ITERS):
        contrib = scaled_int_sql(
            v[e_i].astype(np.float64) * e_num.astype(np.float64)
            / e_den.astype(np.float64), 1.0)
        nv = np.zeros(k, np.int64)
        np.add.at(nv, e_j, contrib)
        v = nv

    return rd.from_arrow(pa.table({
        "event_type": pa.array(states, pa.string()),
        "pi_q": pa.array(v, pa.int64()),
        "pi": pa.array(v.astype(np.float64) / Q, pa.float64()),
    }))


def q_documents_sentence_stats(sf_dir: str) -> Dataset:
    """Per-source sentence segmentation profile: sentence count, mean
    sentence length (chars) and sentences-per-doc — the readability /
    segment-size fingerprint a curation run keeps per feed.  Sentences
    are '[.!?]+'-split pieces, space-trimmed, non-empty (pyarrow
    split_pattern_regex and DuckDB string_split_regex share RE2
    semantics — verified piece-for-piece, including trailing empties).
    All sums are exact int64 over one bounded (source) tree combine;
    the two means are single float divisions of those ints."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "text"])

    def partial(b: pa.Table) -> pa.Table:
        pieces = pc.split_pattern_regex(b.column("text"), "[.!?]+")
        flat = pc.utf8_trim(pc.list_flatten(pieces), " ")
        n = pc.list_value_length(pieces).to_numpy(zero_copy_only=False)
        src = np.repeat(
            b.column("source").to_numpy(zero_copy_only=False), n)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        chars = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        t = pa.table({
            "source": pa.array(src[keep], pa.string()),
            "one": pa.array(np.ones(int(keep.sum()), np.int64)),
            "chars": pa.array(chars[keep].astype(np.int64)),
        })
        g = t.group_by("source").aggregate(
            [("one", "sum"), ("chars", "sum")])
        g = g.rename_columns(["source", "p_sent", "p_chars"])
        d = b.group_by("source").aggregate([("source", "count")]) \
            .rename_columns(["source", "p_docs"])
        # align the two partials on the same source key set
        return pa.table({
            "source": d.column("source"),
            "p_docs": d.column("p_docs"),
            "p_sent": pa.array(
                [dict(zip(g.column("source").to_pylist(),
                          g.column("p_sent").to_pylist()))
                 .get(s, 0) for s in d.column("source").to_pylist()],
                pa.int64()),
            "p_chars": pa.array(
                [dict(zip(g.column("source").to_pylist(),
                          g.column("p_chars").to_pylist()))
                 .get(s, 0) for s in d.column("source").to_pylist()],
                pa.int64()),
        })

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source"],
        [("p_docs", "sum"), ("p_sent", "sum"), ("p_chars", "sum")],
        ["source", "p_docs", "p_sent", "p_chars"],
        ["source", "n_docs", "n_sentences", "sum_chars"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("n_sentences"), 0))
        b = b.sort_by([("source", "ascending")])
        ns = b.column("n_sentences").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sc = b.column("sum_chars").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        nd = b.column("n_docs").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "source": b.column("source"),
            "n_docs": b.column("n_docs"),
            "n_sentences": b.column("n_sentences"),
            "avg_sentence_chars": pa.array(sc / ns, pa.float64()),
            "sentences_per_doc": pa.array(ns / nd, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_embeddings_rrf_fusion(sf_dir: str) -> Dataset:
    """Reciprocal-rank fusion (RRF, k=60) of two retrieval rankings —
    cosine and raw dot-product — for the first-8-vector query set: the
    standard hybrid-retrieval combiner (Cormack et al.), fused over
    each ranker's top-20 and reported as the per-query top-10 by
    fused score.

    Parity design: both similarity scores are quantized to int64 at
    1e-6 BEFORE ranking (ulp-level engine differences in the float
    kernels collapse; ties break on vec_id like ROW_NUMBER), list
    membership is rank ≤ 20 on the quantized order, and the fused
    score is the fixed two-term float expression 1/(60+r_cos) +
    1/(60+r_dot) with absent-list terms contributing 0.0 — replayed
    operand-for-operand by the twin's FULL OUTER JOIN + COALESCE.

    Scale shape: the 8×d query matrix broadcasts once (ray.put); each
    batch computes both similarity columns in one zero-copy matmul
    pair and emits only its tie-widened local top-20 per (query,
    metric) — a vector in the global top-20 is in its block's top-20,
    so the candidate stream (≤ ~40 rows × batches × queries), never
    the corpus, reaches the single merge block."""
    import numpy as np

    from ..util import vec_matrix

    NQ, LIST_K, OUT_K, RRF_K = 8, 20, 10, 60.0
    import pyarrow.parquet as pq

    qtab = pq.read_table(_t(sf_dir, "embeddings"),
                         filters=[("vec_id", "<", NQ)],
                         columns=["vec_id", "embedding"]) \
        .sort_by("vec_id")
    qmat = vec_matrix(qtab.column("embedding"))
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qids = qtab.column("vec_id").to_pylist()
    state = ray.put((qmat, qn, qids))

    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    def local_top(b: pa.Table) -> pa.Table:
        qm, qnrm, qi = ray.get(state)
        X = vec_matrix(b.column("embedding"))
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        nrm = np.linalg.norm(X, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        cos = (X / nrm) @ qnrm.T          # (n, NQ)
        dot = X @ qm.T
        qcos = scaled_int_sql(cos.ravel(), 1e6).reshape(cos.shape)
        qdot = scaled_int_sql(dot.ravel(), 1e6).reshape(dot.shape)
        out_q, out_v, out_c, out_d = [], [], [], []
        for col, qid in enumerate(qi):
            keep = np.zeros(len(ids), bool)
            for m in (qcos[:, col], qdot[:, col]):
                # tie-widened local top-LIST_K on (metric desc, id asc)
                order = np.lexsort((ids, -m))
                if len(order) > LIST_K:
                    kth = m[order[LIST_K - 1]]
                    cut = LIST_K
                    while cut < len(order) and m[order[cut]] == kth:
                        cut += 1
                    order = order[:cut]
                keep[order] = True
            sel = np.flatnonzero(keep)
            out_q.extend([qid] * len(sel))
            out_v.extend(ids[sel].tolist())
            out_c.extend(qcos[sel, col].tolist())
            out_d.extend(qdot[sel, col].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "qcos": pa.array(out_c, pa.int64()),
            "qdot": pa.array(out_d, pa.int64()),
        })

    def fuse(b: pa.Table) -> pa.Table:
        qid = b.column("query_id").to_numpy(zero_copy_only=False)
        vid = b.column("vec_id").to_numpy(zero_copy_only=False)
        qc = b.column("qcos").to_numpy(zero_copy_only=False)
        qd = b.column("qdot").to_numpy(zero_copy_only=False)
        rq, rv, rs, rr = [], [], [], []
        for q in np.unique(qid):
            m = qid == q
            v, c, d = vid[m], qc[m], qd[m]
            rrf = np.zeros(len(v), np.float64)
            for metric in (c, d):
                order = np.lexsort((v, -metric))
                ranks = np.empty(len(v), np.int64)
                ranks[order] = np.arange(1, len(v) + 1)
                inlist = ranks <= LIST_K
                rrf[inlist] = rrf[inlist] \
                    + 1.0 / (RRF_K + ranks[inlist].astype(np.float64))
            hit = rrf > 0.0
            v, rrf = v[hit], rrf[hit]
            order = np.lexsort((v, -rrf))[:OUT_K]
            rq.extend([int(q)] * len(order))
            rv.extend(v[order].tolist())
            rs.extend(rrf[order].tolist())
            rr.extend(range(1, len(order) + 1))
        return pa.table({
            "query_id": pa.array(rq, pa.int64()),
            "vec_id": pa.array(rv, pa.int64()),
            "rrf": pa.array(rs, pa.float64()),
            "rank": pa.array(rr, pa.int64()),
        })

    return ds.map_batches(local_top, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(fuse, batch_format="pyarrow", batch_size=None)


def q_events_daily_holt(sf_dir: str) -> Dataset:
    """Holt's linear (double-exponential) smoothing over the daily
    event-count series, α = β = 1/2 — level + trend state and the
    one-step-ahead forecast per day, the classic capacity-planning
    smoother one rung above the shipped EWMA.  The coupled recurrence
    l_t = ROUND((y_t·1e6 + (l+b))/2), b_t = ROUND(((l_t−l)+b)/2) runs
    on int64 state at scale 1e6 (seed l_1 = y_1·1e6, b_1 = 0), so
    every iterate is bit-replayed by the twin's recursive CTE — the
    events_markov_stationary discipline applied to a time-series
    fixpoint; only the final /1e6 displays are float."""
    import numpy as np

    Q = 1_000_000

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day")
        t = pa.table({"day": day})
        g = t.group_by("day").aggregate([("day", "count")])
        return g.rename_columns(["day", "p_n"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], [("p_n", "sum")], ["day", "p_n"], ["day", "n"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("day", "ascending")])
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(n)
        lvl = np.zeros(k, np.int64)
        trd = np.zeros(k, np.int64)
        if k:
            lvl[0] = n[0] * Q
            trd[0] = 0
        for i in range(1, k):
            l_new = int(scaled_int_sql(np.array(
                [(np.float64(n[i] * Q)
                  + np.float64(lvl[i - 1] + trd[i - 1])) / 2.0]),
                1.0)[0])
            b_new = int(scaled_int_sql(np.array(
                [(np.float64(l_new - lvl[i - 1])
                  + np.float64(trd[i - 1])) / 2.0]), 1.0)[0])
            lvl[i], trd[i] = l_new, b_new
        return pa.table({
            "day": b.column("day"),
            "n_events": pa.array(n, pa.int64()),
            "level": pa.array(lvl.astype(np.float64) / np.float64(Q),
                              pa.float64()),
            "trend": pa.array(trd.astype(np.float64) / np.float64(Q),
                              pa.float64()),
            "forecast_next": pa.array(
                (lvl + trd).astype(np.float64) / np.float64(Q),
                pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_events_logit_purchase(sf_dir: str) -> Dataset:
    """Distributed logistic regression, ORACLE-CHECKED end to end:
    purchase propensity on [1, is_weekend, is_evening] by 50 full-batch
    gradient-descent steps (η = 0.5) — the counterpart to the kmeans /
    pagerank iterative family, but with binary features the sufficient
    statistics collapse to the 8-cell (x1, x2, y) count grid, so the
    whole GD trajectory is bit-replayed by the twin's recursive CTE
    (the markov_stationary discipline applied to model fitting).

    Parity design: weights live as int64 at scale 1e9; per step the
    per-cell residual σ(w·x) − y is quantized to int64 at 1e9, the
    gradient components are order-free integer sums Σ qr·cnt·x_j, and
    the update subtracts ROUND(0.5·G/n).  The final log-loss rides
    1e6-quantized ln(σ)/ln(1−σ) per cell.  Gradient headroom: |qr| ≤
    1e9, so Σ qr·cnt caps the corpus at ~9e9 events per cell grid —
    beyond that raise the partial-sum width (same caveat family as
    source_kl).

    Scale shape: ONE pass over events builds the bounded cell grid
    (tree combine); all 50 iterations are driver math on 8 rows."""
    import numpy as np

    ITERS, ETA, QW = 50, 0.5, 1e9

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["ts", "event_type"])

    def partial(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        x1 = (_isodow_from_us(us) >= 6).astype(np.int64)
        x2 = ((us // 3_600_000_000) % 24 >= 18).astype(np.int64)
        y = pc.equal(b.column("event_type"), "purchase") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"x1": pa.array(x1), "x2": pa.array(x2),
                      "y": pa.array(y),
                      "one": pa.array(np.ones(len(us), np.int64))})
        g = t.group_by(["x1", "x2", "y"]).aggregate([("one", "sum")])
        return g.rename_columns(["x1", "x2", "y", "p_n"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["x1", "x2", "y"], [("p_n", "sum")],
        ["x1", "x2", "y", "p_n"], ["x1", "x2", "y", "cnt"])

    def finish(b: pa.Table) -> pa.Table:
        x1 = b.column("x1").to_numpy(zero_copy_only=False)
        x2 = b.column("x2").to_numpy(zero_copy_only=False)
        y = b.column("y").to_numpy(zero_copy_only=False)
        cnt = b.column("cnt").to_numpy(zero_copy_only=False)
        n = np.float64(int(cnt.sum()))
        w = np.zeros(3, np.int64)
        for _ in range(ITERS):
            z = (w[0] + w[1] * x1 + w[2] * x2).astype(np.float64) / QW
            s = 1.0 / (1.0 + np.exp(-z))
            qr = scaled_int_sql(s - y.astype(np.float64), QW)
            g0 = int((qr * cnt).sum())
            g1 = int((qr * cnt * x1).sum())
            g2 = int((qr * cnt * x2).sum())
            for j, g in enumerate((g0, g1, g2)):
                w[j] = w[j] - int(scaled_int_sql(
                    np.array([ETA * (np.float64(g) / n)]), 1.0)[0])
        z = (w[0] + w[1] * x1 + w[2] * x2).astype(np.float64) / QW
        s = 1.0 / (1.0 + np.exp(-z))
        q1 = scaled_int_sql(np.log(s), 1e6)
        q0 = scaled_int_sql(np.log(1.0 - s), 1e6)
        ll_num = int((cnt * np.where(y == 1, q1, q0)).sum())
        loss = -(np.float64(ll_num) / 1e6) / n
        return pa.table({
            "n_events": pa.array([int(n)], pa.int64()),
            "w_intercept": pa.array([w[0] / QW], pa.float64()),
            "w_weekend": pa.array([w[1] / QW], pa.float64()),
            "w_evening": pa.array([w[2] / QW], pa.float64()),
            "log_loss": pa.array([float(loss)], pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_customers_golden_record(sf_dir: str) -> Dataset:
    """Entity resolution with survivorship (the MDM 'golden record'
    step): customers whose names sit at edit distance ≤ 1 AND share a
    nation (the classic blocking rule — without it TPC-H's sequential
    names chain the whole table into one degenerate cluster) collapse
    into one cluster, and each cluster keeps one surviving record by
    explicit rules — canonical key = MIN(c_custkey), balance = MAX
    (exact cents), the richest member's custkey (arg-max by balance,
    ties to the larger key, via the packed-string arg-max the CDC
    compaction uses; cents offset by +10⁷ keep negative balances
    lexically ordered), segment = MAX(c_mktsegment), plus the member
    count.  Cluster id = MIN member name.

    Scale shape: candidate pairs come from the SymSpell-blocked fuzzy
    join (q_customers_fuzzy_name_pairs — no cross join); the pair list
    is the bounded candidate stream every dedup family already pulls
    to the driver for union-find, the name→rep map broadcasts once,
    and survivorship is one partial-agg + hash groupby over rep.  The
    twin replays the clusters through the recursive-CTE closure and
    the identical packed-string MAX."""
    import numpy as np

    pairs = q_customers_fuzzy_name_pairs(sf_dir).take_all()

    # nation lookup ONLY for names appearing in candidate pairs (the
    # bounded candidate stream) — never the whole customer table
    pair_names = sorted({r["name_a"] for r in pairs}
                        | {r["name_b"] for r in pairs})
    names_ref = ray.put(set(pair_names))
    nat_rows = rd.read_parquet(
        _t(sf_dir, "customer"), columns=["c_name", "c_nationkey"]) \
        .map_batches(
            lambda b: b.filter(pa.array(
                [n in ray.get(names_ref)
                 for n in b.column("c_name").to_pylist()])),
            batch_format="pyarrow").take_all()
    nat = {r["c_name"]: r["c_nationkey"] for r in nat_rows}
    pairs = [r for r in pairs
             if nat.get(r["name_a"]) == nat.get(r["name_b"])]

    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b_ = r["name_a"], r["name_b"]
        parent.setdefault(a, a)
        parent.setdefault(b_, b_)
        ra, rb = find(a), find(b_)
        if ra != rb:
            # union by MIN so the representative is the smallest name
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rep_map = {n: find(n) for n in parent}
    rep_ref = ray.put(rep_map)

    ds = rd.read_parquet(_t(sf_dir, "customer"),
                         columns=["c_custkey", "c_name", "c_acctbal",
                                  "c_mktsegment"])

    def partial(b: pa.Table) -> pa.Table:
        m = ray.get(rep_ref)
        names = b.column("c_name").to_pylist()
        rep = pa.array([m.get(n, n) for n in names], pa.string())
        cents = scaled_int_sql(b.column("c_acctbal"), 100.0)
        packed = pc.binary_join_element_wise(
            pc.utf8_lpad(pc.cast(
                pa.array(cents + 10_000_000, pa.int64()),
                pa.string()), 10, "0"),
            pc.utf8_lpad(pc.cast(b.column("c_custkey"), pa.string()),
                         12, "0"), "")
        t = pa.table({
            "rep": rep,
            "k": b.column("c_custkey"),
            "one": pa.array(np.ones(b.num_rows, np.int64)),
            "cents": pa.array(cents, pa.int64()),
            "seg": b.column("c_mktsegment"),
            "packed": packed,
        })
        g = t.group_by("rep").aggregate(
            [("k", "min"), ("one", "sum"), ("cents", "max"),
             ("seg", "max"), ("packed", "max")])
        return g.rename_columns(
            ["rep", "p_k", "p_n", "p_c", "p_s", "p_a"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("rep").aggregate(
            Min("p_k", alias_name="canonical_custkey"),
            Sum("p_n", alias_name="n_members"),
            Max("p_c", alias_name="max_acctbal_cents"),
            Max("p_s", alias_name="top_segment"),
            Max("p_a", alias_name="packed"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table({
            "rep_name": b.column("rep"),
            "canonical_custkey": pc.cast(
                b.column("canonical_custkey"), pa.int64()),
            "n_members": pc.cast(b.column("n_members"), pa.int64()),
            "max_acctbal_cents": pc.cast(
                b.column("max_acctbal_cents"), pa.int64()),
            "top_segment": b.column("top_segment"),
            "richest_custkey": pc.cast(pc.utf8_slice_codeunits(
                b.column("packed").combine_chunks(), 10, 2 ** 31 - 1),
                pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_events_hour_dow_heatmap(sf_dir: str) -> Dataset:
    """Hour-of-day × day-of-week activity heatmap with each cell's
    share within its dow — the calendar-grid view every ops dashboard
    draws.  One bounded (dow, hour) count partial per block, tree
    combine over the ≤168-cell grid; shares divide exact ints on the
    final block the twin's way (window SUM per dow)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        dow = _isodow_from_us(us).astype(np.int64)
        hr = ((us // 3_600_000_000) % 24).astype(np.int64)
        t = pa.table({"isodow": pa.array(dow), "hour": pa.array(hr),
                      "one": pa.array(np.ones(len(us), np.int64))})
        g = t.group_by(["isodow", "hour"]).aggregate([("one", "sum")])
        return g.rename_columns(["isodow", "hour", "p_n"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["isodow", "hour"], [("p_n", "sum")],
        ["isodow", "hour", "p_n"], ["isodow", "hour", "n"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("isodow", "ascending"), ("hour", "ascending")])
        dow = b.column("isodow").to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        tot = np.zeros(8, np.int64)
        np.add.at(tot, dow, n)
        return pa.table({
            "isodow": b.column("isodow"),
            "hour": b.column("hour"),
            "n_events": pa.array(n, pa.int64()),
            "share_of_dow": pa.array(
                n.astype(np.float64) / tot[dow].astype(np.float64),
                pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_embeddings_silhouette(sf_dir: str) -> Dataset:
    """Centroid silhouette per label — the clustering-quality score
    (simplified silhouette: a = distance to own centroid, b = distance
    to the nearest OTHER centroid, s = (b−a)/max(a,b)) every embedding
    -space labeling job reports.  Fully exact: centroids ride the
    label_centroids 2^30-quantized sums; each per-(row, centroid)
    squared distance is an int64 sum of 1e12-quantized per-dim squares
    (order-free), the nearest-other argmin compares those ints, the
    per-row s is one fixed float expression, and the per-label mean
    sums 1e9-quantized s values — so the twin hashes bit-exact despite
    two levels of float math.

    Scale shape: pass 1 is the bounded (label, dim) centroid combine;
    pass 2 streams rows against the broadcast centroid matrix (one
    vectorized numpy pass per bounded label count) into a bounded
    per-label combine.  Nothing row-sized leaves the workers."""
    import numpy as np

    DIM, CSCALE, DSCALE, SSCALE = 64, float(1 << 30), 1e12, 1e9

    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["label", "embedding"])

    def cent_partial(b: pa.Table) -> pa.Table:
        lab = b.column("label").combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(b.column("embedding").combine_chunks()) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        c = scaled_int_sql(flat, CSCALE).reshape(len(lab), DIM)
        order = np.argsort(lab, kind="stable")
        labs, starts = np.unique(lab[order], return_index=True)
        sums = np.add.reduceat(c[order], starts, axis=0)
        counts = np.diff(np.concatenate([starts, [len(lab)]]))
        return pa.table({
            "label": pa.array(np.repeat(labs, DIM), pa.int64()),
            "dim": pa.array(np.tile(np.arange(DIM), len(labs)),
                            pa.int64()),
            "p_s": pa.array(sums.ravel(), pa.int64()),
            "p_n": pa.array(np.repeat(counts, DIM), pa.int64()),
        })

    cent = _small_table(_tree_combine(
        ds.map_batches(cent_partial, batch_format="pyarrow"),
        ["label", "dim"], [("p_s", "sum"), ("p_n", "sum")],
        ["label", "dim", "p_s", "p_n"],
        ["label", "dim", "s", "n"]).materialize())

    labs = np.sort(np.unique(
        cent.column("label").to_numpy(zero_copy_only=False)))
    k = len(labs)
    mu = np.zeros((k, DIM), np.float64)
    li = {int(l): i for i, l in enumerate(labs)}
    cl = cent.column("label").to_numpy(zero_copy_only=False)
    cd = cent.column("dim").to_numpy(zero_copy_only=False)
    cs = cent.column("s").to_numpy(zero_copy_only=False)
    cn = cent.column("n").to_numpy(zero_copy_only=False)
    for l_, d_, s_, n_ in zip(cl, cd, cs, cn):
        mu[li[int(l_)], d_] = (np.float64(s_) / CSCALE) / np.float64(n_)
    mu_ref = ray.put((labs, mu))

    def sil_partial(b: pa.Table) -> pa.Table:
        labs_s, mu_s = ray.get(mu_ref)
        lab = b.column("label").combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        X = pc.list_flatten(b.column("embedding").combine_chunks()) \
            .to_numpy(zero_copy_only=False).astype(np.float64) \
            .reshape(len(lab), DIM)
        n = len(lab)
        sq = np.empty((n, len(labs_s)), np.int64)
        for ci in range(len(labs_s)):
            d = X - mu_s[ci]
            sq[:, ci] = scaled_int_sql((d * d).ravel(), DSCALE) \
                .reshape(n, DIM).sum(axis=1)
        own_ci = np.searchsorted(labs_s, lab)
        a_sq = sq[np.arange(n), own_ci]
        sq_masked = sq.copy()
        sq_masked[np.arange(n), own_ci] = np.iinfo(np.int64).max
        b_sq = sq_masked.min(axis=1)
        a = np.sqrt(a_sq.astype(np.float64) / DSCALE)
        bb = np.sqrt(b_sq.astype(np.float64) / DSCALE)
        mx = np.maximum(a, bb)
        s = np.where(mx == 0.0, 0.0, (bb - a) / mx)
        qs = scaled_int_sql(s, SSCALE)
        t = pa.table({"label": pa.array(lab),
                      "p_q": pa.array(qs, pa.int64()),
                      "p_n": pa.array(np.ones(n, np.int64))})
        g = t.group_by("label").aggregate(
            [("p_q", "sum"), ("p_n", "sum")])
        return g.rename_columns(["label", "p_q", "p_n"])

    agg = _tree_combine(
        ds.map_batches(sil_partial, batch_format="pyarrow"),
        ["label"], [("p_q", "sum"), ("p_n", "sum")],
        ["label", "p_q", "p_n"], ["label", "sq", "n"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("label", "ascending")])
        sqv = b.column("sq").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        nv = b.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "label": pc.cast(b.column("label"), pa.int64()),
            "n_vectors": pc.cast(b.column("n"), pa.int64()),
            "mean_silhouette": pa.array(
                (sqv / SSCALE) / nv, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_documents_simpson_diversity(sf_dir: str) -> Dataset:
    """Per-source Simpson diversity of the token distribution —
    1 − Σ c(c−1)/(N(N−1)), the probability two random tokens differ —
    the concentration fingerprint that needs NO logarithm: every term
    is an exact int64, the only float is the final ratio, so parity is
    structural.  Headroom: Σ c(c−1) caps a source at ~3e9 tokens on a
    single dominating term (same caveat family as source_kl).

    Scale shape: one (source, token) exchange (the st table every
    per-source text stat shares), then a bounded per-source combine."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "text"])

    def tok_rows(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = b.column("source").to_numpy(zero_copy_only=False)
        return pa.table({
            "source": pa.array(np.repeat(src, n), pa.string()),
            "tok": flat,
        })

    toks = ds.map_batches(tok_rows, batch_format="pyarrow")

    def st_partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["source", "tok"]).aggregate([("tok", "count")])
        return g.rename_columns(["source", "tok", "p_n"])

    st = toks.map_batches(st_partial, batch_format="pyarrow") \
        .groupby(["source", "tok"]).aggregate(
            Sum("p_n", alias_name="c"))

    def src_partial(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy(zero_copy_only=False)
        t = pa.table({
            "source": b.column("source"),
            "p_pairs": pa.array(c * (c - 1), pa.int64()),
            "p_n": pa.array(c, pa.int64()),
            "p_v": pa.array(np.ones(len(c), np.int64)),
        })
        g = t.group_by("source").aggregate(
            [("p_pairs", "sum"), ("p_n", "sum"), ("p_v", "sum")])
        return g.rename_columns(["source", "p_pairs", "p_n", "p_v"])

    agg = _tree_combine(
        st.map_batches(src_partial, batch_format="pyarrow"),
        ["source"],
        [("p_pairs", "sum"), ("p_n", "sum"), ("p_v", "sum")],
        ["source", "p_pairs", "p_n", "p_v"],
        ["source", "pairs", "n", "v"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("source", "ascending")])
        pr = b.column("pairs").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = b.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "source": b.column("source"),
            "n_tokens": pc.cast(b.column("n"), pa.int64()),
            "n_types": pc.cast(b.column("v"), pa.int64()),
            "simpson_diversity": pa.array(
                1.0 - pr / (n * (n - 1.0)), pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_orders_backlog_curve(sf_dir: str) -> Dataset:
    """Daily open-order backlog: +1 when an order is placed, −1 on the
    day its LAST lineitem ships, cumulated over the calendar — the
    order-lifecycle balance curve a fulfilment dashboard tracks.
    Orders whose lines never ship (none in TPC-H) would simply never
    close.  Counts are exact int64; the running total folds on the
    bounded day grid in the final block (no window shuffle).

    Scale shape: the close-date pass is one partial arg-max per block
    + one (orderkey) groupby — the only fact-sized exchange; open/close
    deltas then tree-combine over calendar days."""
    import numpy as np

    opens = rd.read_parquet(_t(sf_dir, "orders"),
                            columns=["o_orderdate"])

    def open_partial(b: pa.Table) -> pa.Table:
        t = pa.table({"day": b.column("o_orderdate")})
        g = t.group_by("day").aggregate([("day", "count")])
        return g.rename_columns(["day", "p_o"])

    open_days = opens.map_batches(open_partial, batch_format="pyarrow")

    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_shipdate"])

    def close_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("l_orderkey").aggregate([("l_shipdate", "max")])
        return g.rename_columns(["l_orderkey", "p_d"])

    closes = with_schema(
        li.map_batches(close_partial, batch_format="pyarrow")
        .groupby("l_orderkey").aggregate(Max("p_d", alias_name="d")),
        pa.schema([("l_orderkey", pa.int64()),
                   ("d", pa.timestamp("us"))]))

    def close_days(b: pa.Table) -> pa.Table:
        t = pa.table({"day": b.column("d")})
        g = t.group_by("day").aggregate([("day", "count")])
        return g.rename_columns(["day", "p_c"])

    closed = closes.map_batches(close_days, batch_format="pyarrow")

    def as_deltas_open(b: pa.Table) -> pa.Table:
        return pa.table({"day": b.column("day"),
                         "p_open": b.column("p_o"),
                         "p_close": pa.array(
                             np.zeros(b.num_rows, np.int64))})

    def as_deltas_close(b: pa.Table) -> pa.Table:
        return pa.table({"day": b.column("day"),
                         "p_open": pa.array(
                             np.zeros(b.num_rows, np.int64)),
                         "p_close": b.column("p_c")})

    deltas = open_days.map_batches(as_deltas_open,
                                   batch_format="pyarrow") \
        .union(closed.map_batches(as_deltas_close,
                                  batch_format="pyarrow"))

    agg = _tree_combine(
        deltas, ["day"], [("p_open", "sum"), ("p_close", "sum")],
        ["day", "p_open", "p_close"], ["day", "n_opened", "n_closed"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("day", "ascending")])
        o = b.column("n_opened").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = b.column("n_closed").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "day": b.column("day"),
            "n_opened": pa.array(o, pa.int64()),
            "n_closed": pa.array(c, pa.int64()),
            "open_backlog": pa.array(np.cumsum(o - c), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_documents_decision_stump(sf_dir: str) -> Dataset:
    """Optimal decision stump (1-split CART) on document length
    predicting lang = 'en': the Gini-impurity-minimizing threshold —
    the exhaustive-split-search primitive under every tree learner,
    oracle-checked.  For each candidate threshold t (each distinct
    n_chars with a non-empty right side; rule x ≤ t), the weighted
    impurity (nL/N)·G(L) + (nR/N)·G(R) is one fixed float expression
    over exact prefix-sum ints, with G = 1 − p² − (1−p)², and the
    argmin tie-breaks to the smallest t — identical floats both sides,
    so ORDER BY wg, t replays bit-exact.

    Scale shape: one bounded (n_chars) grid combine (the value domain,
    not the corpus, bounds it); the split search is one vectorized
    pass over the sorted grid in the final block."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["n_chars", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        pos = pc.equal(b.column("lang"), "en").cast(pa.int64())
        t = pa.table({"x": b.column("n_chars"),
                      "one": pa.array(
                          np.ones(b.num_rows, np.int64)),
                      "pos": pos})
        g = t.group_by("x").aggregate([("one", "sum"), ("pos", "sum")])
        return g.rename_columns(["x", "p_n", "p_p"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["x"], [("p_n", "sum"), ("p_p", "sum")],
        ["x", "p_n", "p_p"], ["x", "n", "p"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("x", "ascending")])
        x = b.column("x").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = b.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        p = b.column("p").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        N = np.float64(int(n.sum()))
        P = np.float64(int(p.sum()))
        nl = np.cumsum(n)
        pl = np.cumsum(p)
        keep = nl < int(N)          # right side must be non-empty
        xv, nlv, plv = x[keep], nl[keep], pl[keep]
        nrv = np.int64(int(N)) - nlv
        prv = np.int64(int(P)) - plv
        plr = plv.astype(np.float64) / nlv.astype(np.float64)
        prr = prv.astype(np.float64) / nrv.astype(np.float64)
        gl = 1.0 - plr * plr - (1.0 - plr) * (1.0 - plr)
        gr = 1.0 - prr * prr - (1.0 - prr) * (1.0 - prr)
        wg = (nlv.astype(np.float64) / N) * gl \
            + (nrv.astype(np.float64) / N) * gr
        best = np.lexsort((xv, wg))[0]
        p0 = P / N
        g0 = 1.0 - p0 * p0 - (1.0 - p0) * (1.0 - p0)
        return pa.table({
            "split_threshold": pa.array([int(xv[best])], pa.int64()),
            "n_left": pa.array([int(nlv[best])], pa.int64()),
            "n_right": pa.array([int(nrv[best])], pa.int64()),
            "weighted_gini": pa.array([float(wg[best])], pa.float64()),
            "baseline_gini": pa.array([float(g0)], pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_events_entropy_rate(sf_dir: str) -> Dataset:
    """Entropy rate of the per-user event-type Markov chain —
    H = −Σᵢ πᵢ Σⱼ Pᵢⱼ ln Pᵢⱼ (nats/step), the predictability score of
    user behaviour (H = 0 ⇒ deterministic next action).  π is the
    20-step quantized stationary iterate events_markov_stationary
    ships (same recurrence, bit-identical); each edge's term
    πᵢ·Pᵢⱼ·ln Pᵢⱼ is one fixed float expression over exact ints,
    quantized to int64 at 1e12 so the Σ over the bounded edge grid is
    order-free; H is one final negation/scale.  Dangling states have
    no outgoing terms (their rows simply don't exist — the twin's
    edge table agrees).

    Scale shape: one groupby(user) co-partition for the transition
    counts; everything after is bounded-grid driver math."""
    import numpy as np

    ITERS = 20
    Q = 1e12

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])

    def steps(g: pa.Table) -> pa.Table:
        g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        et = g.column("event_type").combine_chunks()
        if len(et) < 2:
            return pa.table({"prev_type": pa.array([], pa.string()),
                             "next_type": pa.array([], pa.string()),
                             "p_c": pa.array([], pa.int64())})
        t = pa.table({"prev_type": et.slice(0, len(et) - 1),
                      "next_type": et.slice(1),
                      "one": pa.array(np.ones(len(et) - 1, np.int64))})
        out = t.group_by(["prev_type", "next_type"]) \
            .aggregate([("one", "sum")])
        return out.rename_columns(["prev_type", "next_type", "p_c"])

    counts = _small_table(_tree_combine(
        ds.groupby("user_id").map_groups(steps, batch_format="pyarrow"),
        ["prev_type", "next_type"], [("p_c", "sum")],
        ["prev_type", "next_type", "p_c"],
        ["prev_type", "next_type", "n"]).materialize())

    prev = counts.column("prev_type").to_pylist()
    nxt = counts.column("next_type").to_pylist()
    n_ij = counts.column("n").to_numpy(zero_copy_only=False)
    states = sorted(set(prev) | set(nxt))
    k = len(states)
    if k == 0:
        return rd.from_arrow(pa.table({
            "n_states": pa.array([], pa.int64()),
            "entropy_rate_nats": pa.array([], pa.float64()),
            "max_entropy_nats": pa.array([], pa.float64())}))
    sidx = {s: i for i, s in enumerate(states)}
    src = np.array([sidx[s] for s in prev], np.int64)
    dst = np.array([sidx[s] for s in nxt], np.int64)
    tot = np.zeros(k, np.int64)
    np.add.at(tot, src, n_ij)

    dangling = np.flatnonzero(tot == 0)
    e_i = np.concatenate([src, np.repeat(dangling, k)])
    e_j = np.concatenate([dst, np.tile(np.arange(k), len(dangling))])
    e_num = np.concatenate([n_ij,
                            np.ones(len(dangling) * k, np.int64)])
    e_den = np.concatenate([tot[src],
                            np.full(len(dangling) * k, k, np.int64)])

    v = np.full(k, int(scaled_int_sql(
        np.array([Q / np.float64(k)]), 1.0)[0]), np.int64)
    for _ in range(ITERS):
        contrib = scaled_int_sql(
            v[e_i].astype(np.float64) * e_num.astype(np.float64)
            / e_den.astype(np.float64), 1.0)
        nv = np.zeros(k, np.int64)
        np.add.at(nv, e_j, contrib)
        v = nv

    # per observed edge: π_i · p_ij · ln p_ij, quantized then summed
    pi_i = v[src].astype(np.float64) / Q
    p_ij = n_ij.astype(np.float64) / tot[src].astype(np.float64)
    h_q = scaled_int_sql(pi_i * p_ij * np.log(p_ij), Q)
    h = -(np.float64(int(h_q.sum())) / Q)
    return rd.from_arrow(pa.table({
        "n_states": pa.array([k], pa.int64()),
        "entropy_rate_nats": pa.array([float(h)], pa.float64()),
        "max_entropy_nats": pa.array(
            [float(np.log(np.float64(k)))], pa.float64()),
    }))


WEEK_US_ = 7 * 86_400_000_000


def q_events_weekly_churn(sf_dir: str) -> Dataset:
    """Weekly churn ledger: per Monday-truncated week (with a previous
    week present in the data), the distinct active users split into
    retained / new / churned vs the prior week, plus the churn rate
    churned ÷ previous-week actives — the subscription-health staple.
    Counts are exact int64; the rate is one float division of them.

    Scale shape: the raw stream reduces to distinct (user, week) pairs
    first (one exchange); 'previous week' is the SAME pair set shifted
    +7 days, full-outer-joined back pair-for-pair (hash join on the
    composite key — never a window over raw events); per-(week, kind)
    counts then fold over the bounded calendar grid."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts"])

    def uw_partial(b: pa.Table) -> pa.Table:
        wk = pc.floor_temporal(b.column("ts"), unit="week")
        g = pa.table({"user_id": b.column("user_id"), "week": wk}) \
            .group_by(["user_id", "week"]).aggregate([])
        return g

    uw = with_schema(
        ds.map_batches(uw_partial, batch_format="pyarrow")
        .groupby(["user_id", "week"]).aggregate(
            Count("user_id", alias_name="_n")),
        pa.schema([("user_id", pa.int64()),
                   ("week", pa.timestamp("us")), ("_n", pa.int64())]))

    def mark_cur(b: pa.Table) -> pa.Table:
        import numpy as np

        return pa.table({
            "user_id": b.column("user_id"),
            "week": b.column("week"),
            "c_mark": pa.array(np.ones(b.num_rows, np.int64)),
        })

    cur = uw.map_batches(mark_cur, batch_format="pyarrow")

    def shift(b: pa.Table) -> pa.Table:
        import numpy as np

        us = b.column("week").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "user_id_r": b.column("user_id"),
            "week_r": pa.array(us + WEEK_US_).cast(pa.timestamp("us")),
            "p_mark": pa.array(np.ones(b.num_rows, np.int64)),
        })

    prv = uw.map_batches(shift, batch_format="pyarrow")

    joined = with_schema(
        cur, pa.schema([("user_id", pa.int64()),
                        ("week", pa.timestamp("us")),
                        ("c_mark", pa.int64())])) \
        .join(with_schema(
            prv, pa.schema([("user_id_r", pa.int64()),
                            ("week_r", pa.timestamp("us")),
                            ("p_mark", pa.int64())])),
            join_type="full_outer", num_partitions=16,
            on=("user_id", "week"),
            right_on=("user_id_r", "week_r"))

    def classify(b: pa.Table) -> pa.Table:
        week = b.column("week")
        has_c = pc.is_valid(b.column("c_mark"))
        has_p = pc.is_valid(b.column("p_mark"))
        ret = pc.and_(has_c, has_p).cast(pa.int64())
        new = pc.and_(has_c, pc.invert(has_p)).cast(pa.int64())
        chu = pc.and_(pc.invert(has_c), has_p).cast(pa.int64())
        t = pa.table({"week": week, "p_ret": ret, "p_new": new,
                      "p_chu": chu})
        g = t.group_by("week").aggregate(
            [("p_ret", "sum"), ("p_new", "sum"), ("p_chu", "sum")])
        return g.rename_columns(["week", "p_ret", "p_new", "p_chu"])

    agg = _tree_combine(
        joined.map_batches(classify, batch_format="pyarrow"),
        ["week"],
        [("p_ret", "sum"), ("p_new", "sum"), ("p_chu", "sum")],
        ["week", "p_ret", "p_new", "p_chu"],
        ["week", "n_retained", "n_new", "n_churned"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("week", "ascending")])
        ret = b.column("n_retained").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        new = b.column("n_new").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        chu = b.column("n_churned").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        keep = ((ret + chu) > 0) & ((ret + new) > 0)
        ret, new, chu = ret[keep], new[keep], chu[keep]
        return pa.table({
            "week": b.column("week").filter(pa.array(keep)),
            "n_active": pa.array(ret + new, pa.int64()),
            "n_retained": pa.array(ret, pa.int64()),
            "n_new": pa.array(new, pa.int64()),
            "n_churned": pa.array(chu, pa.int64()),
            "churn_rate": pa.array(
                chu.astype(np.float64)
                / (ret + chu).astype(np.float64), pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_embeddings_hubness(sf_dir: str) -> Dataset:
    """Hubness diagnostic of the embedding space: the in-degree
    histogram of the exact cosine 5-NN graph — high-dimensional spaces
    concentrate neighborships onto 'hub' vectors, which skews ANN
    recall and dedup; this reports how heavy that tail is (in_degree =
    0 vectors included).  Cosines are 1e-6-quantized BEFORE ranking
    (ties to the smaller vec_id), so the neighbor lists replay the
    twin's ROW_NUMBER exactly.

    Scale shape: every vector is a query — the all-pairs EXACT path
    (the LSH/IVF variants are the scale path, as with ann_topk): the
    query matrix broadcasts once, each block emits its tie-widened
    local top-5 per query, and only that candidate stream reaches the
    single merge block."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..util import vec_matrix

    K = 5

    qtab = pq.read_table(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"]) \
        .sort_by("vec_id")
    qmat = vec_matrix(qtab.column("embedding"))
    qn = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    qids = np.array(qtab.column("vec_id").to_pylist(), np.int64)
    state = ray.put((qn, qids))

    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    def local_top(b: pa.Table) -> pa.Table:
        qnrm, qi = ray.get(state)
        X = vec_matrix(b.column("embedding"))
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        nrm = np.linalg.norm(X, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        cos = (X / nrm) @ qnrm.T          # (n_block, n_queries)
        qcos = scaled_int_sql(cos.ravel(), 1e6).reshape(cos.shape)
        out_q, out_v, out_c = [], [], []
        for col in range(len(qi)):
            m = qcos[:, col]
            sel = ids != qi[col]          # exclude self
            mi, vi = m[sel], ids[sel]
            order = np.lexsort((vi, -mi))
            if len(order) > K:
                kth = mi[order[K - 1]]
                cut = K
                while cut < len(order) and mi[order[cut]] == kth:
                    cut += 1
                order = order[:cut]
            out_q.extend([int(qi[col])] * len(order))
            out_v.extend(vi[order].tolist())
            out_c.extend(mi[order].tolist())
        return pa.table({
            "qid": pa.array(out_q, pa.int64()),
            "vid": pa.array(out_v, pa.int64()),
            "qcos": pa.array(out_c, pa.int64()),
        })

    def merge(b: pa.Table) -> pa.Table:
        qid = b.column("qid").to_numpy(zero_copy_only=False)
        vid = b.column("vid").to_numpy(zero_copy_only=False)
        qc = b.column("qcos").to_numpy(zero_copy_only=False)
        deg: dict = {}
        n_total = 0
        for q in np.unique(qid):
            n_total += 1
            m = qid == q
            v, c = vid[m], qc[m]
            order = np.lexsort((v, -c))[:K]
            for nb in v[order]:
                deg[int(nb)] = deg.get(int(nb), 0) + 1
        hist: dict = {}
        for d in deg.values():
            hist[d] = hist.get(d, 0) + 1
        hist[0] = hist.get(0, 0) + (n_total - len(deg))
        ks = sorted(hist)
        return pa.table({
            "in_degree": pa.array(ks, pa.int64()),
            "n_vectors": pa.array([hist[d] for d in ks], pa.int64()),
        })

    return ds.map_batches(local_top, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(merge, batch_format="pyarrow", batch_size=None)


def q_events_mann_kendall(sf_dir: str) -> Dataset:
    """Mann-Kendall trend test on the daily event-count series — the
    nonparametric companion to the shipped Theil-Sen slope: S =
    Σ_{i<j} sign(xⱼ − xᵢ) over the bounded day grid, tie-corrected
    variance [m(m−1)(2m+5) − Σ tₖ(tₖ−1)(2tₖ+5)]/18, and the
    continuity-corrected z — S and the variance numerator are exact
    int64 driver math on the grid; z is the one float expression
    replayed.

    Scale shape: one bounded (day) count combine; the O(m²) pair scan
    runs on the ≤calendar-sized final block."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day")
        t = pa.table({"day": day})
        g = t.group_by("day").aggregate([("day", "count")])
        return g.rename_columns(["day", "p_n"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], [("p_n", "sum")], ["day", "p_n"], ["day", "n"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("day", "ascending")])
        x = b.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = len(x)
        diff = np.sign(x[None, :] - x[:, None])
        s_stat = int(np.triu(diff, 1).sum())
        _, tie_counts = np.unique(x, return_counts=True)
        t_k = tie_counts[tie_counts > 1].astype(np.int64)
        var_num = m * (m - 1) * (2 * m + 5) \
            - int((t_k * (t_k - 1) * (2 * t_k + 5)).sum())
        var_s = np.float64(var_num) / 18.0
        if s_stat > 0:
            z = (np.float64(s_stat) - 1.0) / np.sqrt(var_s)
        elif s_stat < 0:
            z = (np.float64(s_stat) + 1.0) / np.sqrt(var_s)
        else:
            z = np.float64(0.0)
        return pa.table({
            "n_days": pa.array([m], pa.int64()),
            "s_stat": pa.array([s_stat], pa.int64()),
            "var_s": pa.array([float(var_s)], pa.float64()),
            "z_mk": pa.array([float(z)], pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_orders_dupe_audit(sf_dir: str) -> Dataset:
    """Duplicate-transaction audit: customers placing MORE than one
    order on the same day — the double-submission triage every billing
    pipeline runs, with the total-cents spread per group (identical
    min/max totals flag likely replays; a wide spread clears them).
    One partial-agg + hash groupby on the composite key."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_orderkey", "o_custkey",
                                  "o_orderdate", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        cents = scaled_int_sql(b.column("o_totalprice"), 100.0)
        t = pa.table({
            "c": b.column("o_custkey"),
            "day": b.column("o_orderdate"),
            "one": pa.array(np.ones(b.num_rows, np.int64)),
            "tmin": pa.array(cents, pa.int64()),
            "tmax": pa.array(cents, pa.int64()),
            "kmin": b.column("o_orderkey"),
            "kmax": b.column("o_orderkey"),
        })
        g = t.group_by(["c", "day"]).aggregate(
            [("one", "sum"), ("tmin", "min"), ("tmax", "max"),
             ("kmin", "min"), ("kmax", "max")])
        return g.rename_columns(
            ["c", "day", "p_n", "p_tl", "p_th", "p_lo", "p_hi"])

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["c", "day"]).aggregate(
            Sum("p_n", alias_name="n_orders"),
            Min("p_tl", alias_name="min_total_cents"),
            Max("p_th", alias_name="max_total_cents"),
            Min("p_lo", alias_name="first_orderkey"),
            Max("p_hi", alias_name="last_orderkey"))

    def finish(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater(b.column("n_orders"), 1))
        return pa.table({
            "o_custkey": pc.cast(b.column("c"), pa.int64()),
            "day": b.column("day"),
            "n_orders": pc.cast(b.column("n_orders"), pa.int64()),
            "min_total_cents": pc.cast(b.column("min_total_cents"),
                                       pa.int64()),
            "max_total_cents": pc.cast(b.column("max_total_cents"),
                                       pa.int64()),
            "first_orderkey": pc.cast(b.column("first_orderkey"),
                                      pa.int64()),
            "last_orderkey": pc.cast(b.column("last_orderkey"),
                                     pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_lineitem_abc_classes(sf_dir: str) -> Dataset:
    """ABC inventory classification: parts ranked by revenue, class A
    = the prefix holding ≤ 80 % of cumulative revenue, B to 95 %, C
    the tail — the Pareto-banding every supply-chain report ships.
    The class decision is EXACT integer arithmetic (cum·5 ≤ tot·4 ⟺
    share ≤ 0.8, cum·20 ≤ tot·19 ⟺ ≤ 0.95 on 1e4-fixed-point revenue),
    so no float ever gates a row; the reported shares are final-display
    divisions only.

    Scale shape: per-part int64 revenue partials + one groupby bounded
    by the part dimension; the ranked cumulative scan runs on that
    dimension-sized single block (documented trade — same as
    part_revenue_share's materialized per-part aggregate)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_extendedprice",
                                  "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        rev = scaled_int_sql(
            pc.multiply(b.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    b.column("l_discount"))), 10000.0)
        g = pa.table({
            "p": pc.cast(b.column("l_partkey"), pa.int64()),
            "r": pa.array(rev, pa.int64()),
        }).group_by("p").aggregate([("r", "sum")])
        return g.rename_columns(["p", "p_r"])

    per_part = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("p").aggregate(Sum("p_r", alias_name="r")),
        pa.schema([("p", pa.int64()), ("r", pa.int64())]))

    def finish(b: pa.Table) -> pa.Table:
        p = b.column("p").to_numpy(zero_copy_only=False)
        r = b.column("r").to_numpy(zero_copy_only=False)
        order = np.lexsort((p, -r))
        r = r[order]
        tot = int(r.sum())
        cum = np.cumsum(r)
        is_a = cum * 5 <= tot * 4
        is_b = (~is_a) & (cum * 20 <= tot * 19)
        cls = np.where(is_a, "A", np.where(is_b, "B", "C"))
        out_c, out_n, out_r = [], [], []
        for k in ("A", "B", "C"):
            m = cls == k
            out_c.append(k)
            out_n.append(int(m.sum()))
            out_r.append(int(r[m].sum()))
        totf = np.float64(tot)
        return pa.table({
            "abc_class": pa.array(out_c, pa.string()),
            "n_parts": pa.array(out_n, pa.int64()),
            "revenue": pa.array(
                [np.float64(x) / 10000.0 for x in out_r],
                pa.float64()),
            "revenue_share": pa.array(
                [np.float64(x) / totf for x in out_r], pa.float64()),
        })

    return per_part.repartition(1) \
        .map_batches(finish, batch_format="pyarrow", batch_size=None)


def q_documents_robust_scale(sf_dir: str) -> Dataset:
    """Per-source robust scaling of document length: (n_chars −
    source median) / source IQR — the outlier-insensitive
    standardization (sklearn RobustScaler semantics) a curation run
    applies before cross-feed length comparisons.  Medians/quartiles
    are exact quantile_disc picks (the grouped-quantiles machinery,
    DuckDB's ceil(nq)−1 rank convention); sources whose IQR is 0 are
    excluded on both sides (no scale to divide by); the score is one
    float division of exact ints.

    Scale shape: one keyed (source, n_chars) histogram exchange for
    the quartiles, broadcast as a bounded per-source table; the scoring
    pass is a map over the stream."""
    import numpy as np

    from ..stages.quantiles import grouped_exact_quantiles

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "source", "n_chars"])

    qt = _small_table(grouped_exact_quantiles(
        ds.map_batches(lambda b: b.select(["source", "n_chars"]),
                       batch_format="pyarrow"),
        "source", "n_chars", qs=(0.25, 0.5, 0.75)))
    med, iqr = {}, {}
    for r in qt.to_pylist():
        lo, m, hi = r["q25"], r["q50"], r["q75"]
        if lo is None or hi is None or hi - lo == 0:
            continue
        med[r["source"]] = m
        iqr[r["source"]] = hi - lo
    state = ray.put((med, iqr))

    def score(b: pa.Table) -> pa.Table:
        m_map, i_map = ray.get(state)
        src = b.column("source").to_pylist()
        keep = np.array([s in m_map for s in src], bool)
        b = b.filter(pa.array(keep))
        src = [s for s, k in zip(src, keep) if k]
        x = b.column("n_chars").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        m = np.array([m_map[s] for s in src], np.float64)
        i = np.array([i_map[s] for s in src], np.float64)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "source": b.column("source"),
            "n_chars": b.column("n_chars"),
            "robust_z": pa.array((x - m) / i, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def q_events_user_lifespan(sf_dir: str) -> Dataset:
    """User lifespan histogram: days between a user's first and last
    event, bucketed per whole day — the engagement-length profile a
    retention model starts from.  Per-user min/max ride one exchange
    at user grain; the lifespan histogram folds over the bounded
    day-count domain."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        # epoch-µs ints BEFORE the exchange: Ray's aggregate path can
        # round-trip timestamp blocks through pandas at reduced
        # ('D') precision, silently flooring sub-day spans — ints
        # survive exactly
        us = b.column("ts").cast(pa.int64())
        t = pa.table({"user_id": b.column("user_id"),
                      "lo": us, "hi": us})
        g = t.group_by("user_id").aggregate(
            [("lo", "min"), ("hi", "max")])
        return g.rename_columns(["user_id", "p_lo", "p_hi"])

    spans = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            Min("p_lo", alias_name="lo"),
            Max("p_hi", alias_name="hi"))

    def hist_partial(b: pa.Table) -> pa.Table:
        lo = b.column("lo").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        hi = b.column("hi").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        days = (hi - lo) // DAY_US_
        t = pa.table({"lifespan_days": pa.array(days, pa.int64()),
                      "one": pa.array(np.ones(len(days), np.int64))})
        g = t.group_by("lifespan_days").aggregate([("one", "sum")])
        return g.rename_columns(["lifespan_days", "p_n"])

    agg = _tree_combine(
        spans.map_batches(hist_partial, batch_format="pyarrow"),
        ["lifespan_days"], [("p_n", "sum")],
        ["lifespan_days", "p_n"], ["lifespan_days", "n_users"])

    return agg.map_batches(
        lambda b: b.sort_by([("lifespan_days", "ascending")]),
        batch_format="pyarrow", batch_size=None)


def q_events_signup_to_purchase(sf_dir: str) -> Dataset:
    """Time-to-convert funnel: per signup-week cohort, how many users
    signed up, how many later purchased, the conversion rate and the
    mean hours from FIRST signup to the FIRST purchase AFTER it — the
    activation-lag report growth teams track weekly.  All inputs ride
    exact int64 (epoch-µs mins, hour deltas floored); the rate and
    mean are final float divisions.

    Scale shape: one user-grain exchange carrying (first signup,
    first qualifying purchase) partials — the purchase side is folded
    per batch against the per-batch signup min, then re-minimized
    globally against the global signup min via a second bounded pass
    on the per-user table (users whose batch-local purchase pick
    preceded the true signup are re-filtered exactly)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_type"])

    SENTINEL = np.iinfo(np.int64).max

    def partial(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        et = b.column("event_type").to_numpy(zero_copy_only=False)
        sign = et == "signup"
        pur = et == "purchase"
        t = pa.table({
            "user_id": pa.array(uid, pa.int64()),
            "s_min": pa.array(np.where(sign, us, SENTINEL), pa.int64()),
            # keep EVERY purchase ts min per user; the after-signup
            # filter happens once the global signup min is known
            "p_min": pa.array(np.where(pur, us, SENTINEL), pa.int64()),
        })
        g = t.group_by("user_id").aggregate(
            [("s_min", "min"), ("p_min", "min")])
        return g.rename_columns(["user_id", "p_s", "p_p"])

    per_user = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(
            Min("p_s", alias_name="s_min"),
            Min("p_p", alias_name="p_min"))

    # p_min is the min over ALL purchases; a purchase BEFORE signup
    # must not count.  Exact fix without a second scan: re-derive the
    # first-after-signup purchase per user from the raw stream, keyed
    # by the (tiny) set of users whose global p_min < s_min.
    def hist_partial(b: pa.Table) -> pa.Table:
        s = b.column("s_min").to_numpy(zero_copy_only=False)
        p = b.column("p_min").to_numpy(zero_copy_only=False)
        has_s = s != SENTINEL
        amb = has_s & (p < s)          # earliest purchase pre-signup
        t = pa.table({
            "user_id": b.column("user_id"),
            "s_min": pa.array(s, pa.int64()),
            "p_min": pa.array(p, pa.int64()),
            "ambiguous": pa.array(amb),
        })
        return t.filter(pa.array(has_s))

    users = per_user.map_batches(hist_partial,
                                 batch_format="pyarrow").materialize()

    amb_tab = _small_table(users.map_batches(
        lambda b: b.filter(b.column("ambiguous"))
        .select(["user_id", "s_min"]),
        batch_format="pyarrow"))
    amb_map = dict(zip(amb_tab.column("user_id").to_pylist(),
                       amb_tab.column("s_min").to_pylist()))
    amb_ref = ray.put(amb_map)

    def refine(b: pa.Table) -> pa.Table:
        m = ray.get(amb_ref)
        if not m:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "p_fix": pa.array([], pa.int64())})
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        keep = np.array([u in m for u in uid.tolist()], bool)
        if not keep.any():
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "p_fix": pa.array([], pa.int64())})
        f = b.filter(pa.array(keep))
        us = f.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        uid_f = f.column("user_id").to_numpy(zero_copy_only=False)
        et = f.column("event_type").to_numpy(zero_copy_only=False)
        smin = np.array([m[u] for u in uid_f.tolist()], np.int64)
        ok = (et == "purchase") & (us >= smin)
        t = pa.table({
            "user_id": pa.array(uid_f[ok], pa.int64()),
            "p_fix": pa.array(us[ok], pa.int64()),
        })
        g = t.group_by("user_id").aggregate([("p_fix", "min")])
        return g.rename_columns(["user_id", "p_fix"])

    fixes = _small_table(with_schema(
        ds.map_batches(refine, batch_format="pyarrow")
        .groupby("user_id").aggregate(Min("p_fix", alias_name="p_fix")),
        pa.schema([("user_id", pa.int64()), ("p_fix", pa.int64())])))
    fix_map = dict(zip(fixes.column("user_id").to_pylist(),
                       fixes.column("p_fix").to_pylist()))
    fix_ref = ray.put(fix_map)

    def cohort_partial(b: pa.Table) -> pa.Table:
        fm = ray.get(fix_ref)
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        s = b.column("s_min").to_numpy(zero_copy_only=False)
        p = b.column("p_min").to_numpy(zero_copy_only=False)
        amb = b.column("ambiguous").to_numpy(zero_copy_only=False)
        p = np.where(amb,
                     np.array([fm.get(u, SENTINEL)
                               for u in uid.tolist()], np.int64), p)
        # Monday-truncated signup week off epoch µs (1970-01-01 = Thu)
        days = s // DAY_US_
        week = (days - (days + 3) % 7) * DAY_US_
        conv = p != SENTINEL
        hours = np.where(conv, (p - s) // 3_600_000_000, 0)
        t = pa.table({
            "week": pa.array(week).cast(pa.timestamp("us")),
            "p_u": pa.array(np.ones(len(s), np.int64)),
            "p_c": pa.array(conv.astype(np.int64)),
            "p_h": pa.array(hours.astype(np.int64)),
        })
        g = t.group_by("week").aggregate(
            [("p_u", "sum"), ("p_c", "sum"), ("p_h", "sum")])
        return g.rename_columns(["week", "p_u", "p_c", "p_h"])

    agg = _tree_combine(
        users.map_batches(cohort_partial, batch_format="pyarrow"),
        ["week"], [("p_u", "sum"), ("p_c", "sum"), ("p_h", "sum")],
        ["week", "p_u", "p_c", "p_h"],
        ["week", "n_signups", "n_converted", "sum_hours"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("week", "ascending")])
        u = b.column("n_signups").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        c = b.column("n_converted").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = b.column("sum_hours").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        conv_rate = c.astype(np.float64) / u.astype(np.float64)
        avg_h = np.where(c > 0,
                         h.astype(np.float64)
                         / np.where(c > 0, c, 1).astype(np.float64),
                         np.nan)
        mask = c == 0
        return pa.table({
            "signup_week": b.column("week"),
            "n_signups": pa.array(u, pa.int64()),
            "n_converted": pa.array(c, pa.int64()),
            "conversion_rate": pa.array(conv_rate, pa.float64()),
            "avg_hours_to_purchase": pa.array(
                avg_h, pa.float64(), mask=mask),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_supplier_return_rate(sf_dir: str) -> Dataset:
    """Supplier quality scorecard: per supplier, lineitem count,
    returned ('R') count, the return rate, and an above-corpus-rate
    flag decided by EXACT integer cross-multiplication
    (ret·N > n·RET — no float ever gates the flag).  One bounded
    partial-agg exchange at supplier grain."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_suppkey", "l_returnflag"])

    def partial(b: pa.Table) -> pa.Table:
        r = pc.equal(b.column("l_returnflag"), "R").cast(pa.int64())
        t = pa.table({"s": pc.cast(b.column("l_suppkey"), pa.int64()),
                      "one": pa.array(np.ones(b.num_rows, np.int64)),
                      "r": r})
        g = t.group_by("s").aggregate([("one", "sum"), ("r", "sum")])
        return g.rename_columns(["s", "p_n", "p_r"])

    agg = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("s").aggregate(Sum("p_n", alias_name="n_lines"),
                                Sum("p_r", alias_name="n_returned")),
        pa.schema([("s", pa.int64()), ("n_lines", pa.int64()),
                   ("n_returned", pa.int64())])).materialize()

    totals = agg.map_batches(
        lambda b: pa.table({
            "k": pa.array([0] * b.num_rows, pa.int64()),
            "p_n": b.column("n_lines"),
            "p_r": b.column("n_returned")})
        .group_by("k").aggregate([("p_n", "sum"), ("p_r", "sum")]),
        batch_format="pyarrow") \
        .groupby("k").aggregate(Sum("p_n_sum", alias_name="N"),
                                Sum("p_r_sum", alias_name="R")) \
        .take_all()[0]
    big_n, big_r = int(totals["N"]), int(totals["R"])

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_lines").to_numpy(zero_copy_only=False)
        r = b.column("n_returned").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_suppkey": b.column("s"),
            "n_lines": pa.array(n, pa.int64()),
            "n_returned": pa.array(r, pa.int64()),
            "return_rate": pa.array(
                r.astype(np.float64) / n.astype(np.float64),
                pa.float64()),
            "above_corpus_rate": pa.array(
                r * big_n > n * big_r),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_documents_dedup_loss_by_source(sf_dir: str) -> Dataset:
    """Dedup-impact report per ingest feed: after exact text dedup
    (keep the min doc_id per text corpus-wide), how many documents and
    how many whitespace tokens each source LOSES — the per-feed view a
    curation run uses to spot feeds that are mostly mirrors.  Counts
    are exact; the loss fraction is one float division.

    Scale shape: the winner per text rides one (text) exchange of
    per-batch (text, min doc_id) partials; losses then fold per source
    on a bounded combine.  (The winner join is by doc_id membership —
    a broadcast of winner ids is avoided by re-deriving min per text
    and comparing in place.)"""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "source", "text"])

    def win_partial(b: pa.Table) -> pa.Table:
        g = b.select(["text", "doc_id"]).group_by("text").aggregate(
            [("doc_id", "min")])
        return g.rename_columns(["text", "p_w"])

    winners = with_schema(
        ds.map_batches(win_partial, batch_format="pyarrow")
        .groupby("text").aggregate(Min("p_w", alias_name="w")),
        pa.schema([("text", pa.string()), ("w", pa.int64())]))

    docs = with_schema(
        ds, pa.schema([("doc_id", pa.int64()),
                       ("source", pa.string()),
                       ("text", pa.string())]))

    j = docs.join(winners, join_type="inner", num_partitions=8,
                  on=("text",))

    def loss_partial(b: pa.Table) -> pa.Table:
        kept = pc.equal(b.column("doc_id"), b.column("w")) \
            .to_numpy(zero_copy_only=False)
        toks = pc.list_value_length(
            pc.split_pattern(b.column("text"), " ")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({
            "source": b.column("source"),
            "p_docs": pa.array(np.ones(b.num_rows, np.int64)),
            "p_drop": pa.array((~kept).astype(np.int64)),
            "p_tok": pa.array(toks),
            "p_tokdrop": pa.array(np.where(kept, 0, toks)),
        })
        g = t.group_by("source").aggregate(
            [("p_docs", "sum"), ("p_drop", "sum"),
             ("p_tok", "sum"), ("p_tokdrop", "sum")])
        return g.rename_columns(
            ["source", "p_docs", "p_drop", "p_tok", "p_tokdrop"])

    agg = _tree_combine(
        j.map_batches(loss_partial, batch_format="pyarrow"),
        ["source"],
        [("p_docs", "sum"), ("p_drop", "sum"),
         ("p_tok", "sum"), ("p_tokdrop", "sum")],
        ["source", "p_docs", "p_drop", "p_tok", "p_tokdrop"],
        ["source", "n_docs", "n_dropped", "n_tokens",
         "tokens_dropped"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("source", "ascending")])
        d = b.column("n_dropped").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = b.column("n_docs").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "source": b.column("source"),
            "n_docs": b.column("n_docs"),
            "n_dropped": b.column("n_dropped"),
            "n_tokens": b.column("n_tokens"),
            "tokens_dropped": b.column("tokens_dropped"),
            "drop_rate": pa.array(d / n, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_orders_ltv_triangle(sf_dir: str) -> Dataset:
    """Cohort LTV triangle: customers grouped by FIRST-order month,
    revenue laid out by months-since-first (the retention-revenue
    matrix every finance dashboard draws).  Month arithmetic is exact
    integer (year·12 + month deltas); revenue rides exact cents.

    Scale shape: per-customer first-month via one customer-grain
    exchange of int64 month ordinals; the cohort tag joins back to
    orders by hash join; the (cohort, age) grid is bounded by
    months² and tree-combines."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "orders"),
                         columns=["o_custkey", "o_orderdate",
                                  "o_totalprice"])

    def month_ord(col) -> "np.ndarray":
        import numpy as np

        us = col.cast(pa.int64()).to_numpy(zero_copy_only=False)
        days = us // DAY_US_
        d = (np.array(["1970-01-01"], "datetime64[D]")[0]
             + days.astype("timedelta64[D]")).astype("datetime64[M]")
        # months since 1970-01 + 1970·12 = absolute year·12 + (month−1)
        return d.astype(np.int64) + 1970 * 12

    def first_partial(b: pa.Table) -> pa.Table:
        m = month_ord(b.column("o_orderdate"))
        t = pa.table({"c": pc.cast(b.column("o_custkey"), pa.int64()),
                      "m": pa.array(m, pa.int64())})
        g = t.group_by("c").aggregate([("m", "min")])
        return g.rename_columns(["c", "p_m"])

    first = with_schema(
        ds.map_batches(first_partial, batch_format="pyarrow")
        .groupby("c").aggregate(Min("p_m", alias_name="cohort_m")),
        pa.schema([("c", pa.int64()), ("cohort_m", pa.int64())]))

    def order_rows(b: pa.Table) -> pa.Table:
        cents = scaled_int_sql(b.column("o_totalprice"), 100.0)
        return pa.table({
            "c": pc.cast(b.column("o_custkey"), pa.int64()),
            "m": pa.array(month_ord(b.column("o_orderdate")),
                          pa.int64()),
            "cents": pa.array(cents, pa.int64()),
        })

    orders = ds.map_batches(order_rows, batch_format="pyarrow")
    j = orders.join(first, join_type="inner", num_partitions=8,
                    on=("c",))

    def grid_partial(b: pa.Table) -> pa.Table:
        import numpy as np

        coh = b.column("cohort_m").to_numpy(zero_copy_only=False)
        m = b.column("m").to_numpy(zero_copy_only=False)
        t = pa.table({
            "cohort_m": pa.array(coh, pa.int64()),
            "age_months": pa.array(m - coh, pa.int64()),
            "p_r": b.column("cents"),
            "p_n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["cohort_m", "age_months"]).aggregate(
            [("p_r", "sum"), ("p_n", "sum")])
        return g.rename_columns(
            ["cohort_m", "age_months", "p_r", "p_n"])

    agg = _tree_combine(
        j.map_batches(grid_partial, batch_format="pyarrow"),
        ["cohort_m", "age_months"], [("p_r", "sum"), ("p_n", "sum")],
        ["cohort_m", "age_months", "p_r", "p_n"],
        ["cohort_m", "age_months", "revenue_cents", "n_orders"])

    def finish(b: pa.Table) -> pa.Table:
        import numpy as np

        b = b.sort_by([("cohort_m", "ascending"),
                       ("age_months", "ascending")])
        m = b.column("cohort_m").to_numpy(zero_copy_only=False)
        y = m // 12
        mo = m - y * 12 + 1
        lab = [f"{int(a):04d}-{int(bb):02d}" for a, bb in zip(y, mo)]
        return pa.table({
            "cohort_month": pa.array(lab, pa.string()),
            "age_months": b.column("age_months"),
            "revenue_cents": b.column("revenue_cents"),
            "n_orders": b.column("n_orders"),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_events_stickiness(sf_dir: str) -> Dataset:
    """DAU/MAU stickiness per calendar month: average daily actives ÷
    monthly actives — the engagement ratio product teams headline.
    All counts ride distinct-pair exchanges ((user, day) then
    (user, month)); the two floats are final divisions of exact ints.

    avg_dau divides by DAYS OBSERVED in the month (days with ≥1
    event), not the calendar length — the honest denominator for a
    partial month, and the twin's COUNT(DISTINCT day) agrees."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts"])

    def pair_partial(b: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(b.column("ts"), unit="day"),
                      pa.int64())
        return pa.table({"user_id": b.column("user_id"),
                         "day": day}) \
            .group_by(["user_id", "day"]).aggregate([])

    pairs = with_schema(
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["user_id", "day"]).aggregate(
            Count("user_id", alias_name="_n")),
        pa.schema([("user_id", pa.int64()), ("day", pa.int64()),
                   ("_n", pa.int64())])).materialize()

    def day_counts(b: pa.Table) -> pa.Table:
        import numpy as np

        days = b.column("day").to_numpy(zero_copy_only=False)
        mon = (np.array(["1970-01-01"], "datetime64[D]")[0]
               + (days // DAY_US_).astype("timedelta64[D]")) \
            .astype("datetime64[M]").astype(np.int64)
        t = pa.table({"m": pa.array(mon, pa.int64()),
                      "day": b.column("day"),
                      "one": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["m", "day"]).aggregate([("one", "sum")])
        return g.rename_columns(["m", "day", "p_dau"])

    daily = _tree_combine(
        pairs.map_batches(day_counts, batch_format="pyarrow"),
        ["m", "day"], [("p_dau", "sum")],
        ["m", "day", "p_dau"], ["m", "day", "dau"])

    def month_fold(b: pa.Table) -> pa.Table:
        import numpy as np

        t = pa.table({"m": b.column("m"),
                      "p_sum": b.column("dau"),
                      "p_days": pa.array(
                          np.ones(b.num_rows, np.int64))})
        g = t.group_by("m").aggregate(
            [("p_sum", "sum"), ("p_days", "sum")])
        return g.rename_columns(["m", "p_sum", "p_days"])

    dau_m = _tree_combine(
        daily.map_batches(month_fold, batch_format="pyarrow"),
        ["m"], [("p_sum", "sum"), ("p_days", "sum")],
        ["m", "p_sum", "p_days"], ["m", "dau_sum", "n_days"])

    def um_partial(b: pa.Table) -> pa.Table:
        import numpy as np

        days = b.column("day").to_numpy(zero_copy_only=False)
        mon = (np.array(["1970-01-01"], "datetime64[D]")[0]
               + (days // DAY_US_).astype("timedelta64[D]")) \
            .astype("datetime64[M]").astype(np.int64)
        return pa.table({"user_id": b.column("user_id"),
                         "m": pa.array(mon, pa.int64())}) \
            .group_by(["user_id", "m"]).aggregate([])

    mau_m = _tree_combine(
        with_schema(
            pairs.map_batches(um_partial, batch_format="pyarrow")
            .groupby(["user_id", "m"]).aggregate(
                Count("user_id", alias_name="_k")),
            pa.schema([("user_id", pa.int64()), ("m", pa.int64()),
                       ("_k", pa.int64())]))
        .map_batches(
            lambda b: pa.table({
                "m": b.column("m"),
                "p_mau": pa.array([1] * b.num_rows, pa.int64())})
            .group_by("m").aggregate([("p_mau", "sum")])
            .rename_columns(["m", "p_mau"]),
            batch_format="pyarrow"),
        ["m"], [("p_mau", "sum")], ["m", "p_mau"], ["m", "mau"])

    dt = _small_table(dau_m.materialize())
    mt = _small_table(mau_m.materialize())
    dau_map = {int(r["m"]): (int(r["dau_sum"]), int(r["n_days"]))
               for r in dt.to_pylist()}
    mau_map = {int(r["m"]): int(r["mau"]) for r in mt.to_pylist()}

    import numpy as np

    ms = sorted(dau_map)
    y = np.array(ms, np.int64) // 12 + 1970
    mo = np.array(ms, np.int64) - (np.array(ms, np.int64) // 12) * 12 + 1
    lab = [f"{int(a):04d}-{int(bb):02d}" for a, bb in zip(y, mo)]
    dau_sum = np.array([dau_map[m][0] for m in ms], np.int64)
    n_days = np.array([dau_map[m][1] for m in ms], np.int64)
    mau = np.array([mau_map[m] for m in ms], np.int64)
    avg_dau = dau_sum.astype(np.float64) / n_days.astype(np.float64)
    return rd.from_arrow(pa.table({
        "month": pa.array(lab, pa.string()),
        "n_days": pa.array(n_days, pa.int64()),
        "mau": pa.array(mau, pa.int64()),
        "avg_dau": pa.array(avg_dau, pa.float64()),
        "stickiness": pa.array(
            avg_dau / mau.astype(np.float64), pa.float64()),
    }))


# ---------------------------------------------------------------------------
# Model-evaluation family (round 4, session 10): once a classifier exists
# (the Gini stump, the NB source model), a training pipeline needs the
# evaluation primitives — confusion matrix, exact ROC AUC, CV folds —
# and each is one bounded-grid exchange over exact integers.
# ---------------------------------------------------------------------------

def _length_label_grid(sf_dir: str) -> Dataset:
    """Shared (n_chars, n, n_positive) grid for the length-based
    classifier family (decision stump, confusion matrix, ROC AUC):
    per-batch partial counts per distinct length, one bounded tree
    combine — the value domain, not the corpus, bounds the exchange."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["n_chars", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        pos = pc.equal(b.column("lang"), "en").cast(pa.int64())
        t = pa.table({"x": b.column("n_chars"),
                      "one": pa.array(np.ones(b.num_rows, np.int64)),
                      "pos": pos})
        g = t.group_by("x").aggregate([("one", "sum"), ("pos", "sum")])
        return g.rename_columns(["x", "p_n", "p_p"])

    return _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["x"], [("p_n", "sum"), ("p_p", "sum")],
        ["x", "p_n", "p_p"], ["x", "n", "p"])


def q_documents_stump_confusion(sf_dir: str) -> Dataset:
    """Confusion matrix + accuracy/precision/recall/F1 for the optimal
    Gini stump of q_documents_decision_stump — the evaluation half of
    the 1-split CART.  Each leaf predicts positive iff its positive
    rate lifts over the base rate (p_leaf·N ≥ P·n_leaf, an exact
    cross-multiplied integer test; majority voting would predict
    all-negative whenever the positive class is a sub-50 % plurality,
    which this corpus is).  Exactly one leaf lifts unless the split is
    degenerate (both rates equal the base — then ≥ makes both predict
    positive, total recall rather than all-negative), so tp > 0
    whenever P > 0 and the ratio columns never go all-NULL.  Every
    cell (tp/fp/fn/tn) falls straight out of the split's prefix sums —
    NO second corpus pass.  The metric ratios are single float
    expressions over exact ints, NULL-guarded like the twin's CASE.

    Scale shape: identical to the stump — one bounded (n_chars) grid
    combine, then driver-block math."""
    import numpy as np

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("x", "ascending")])
        x = b.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        p = b.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
        N = int(n.sum())
        P = int(p.sum())
        nl = np.cumsum(n)
        pl = np.cumsum(p)
        keep = nl < N
        xv, nlv, plv = x[keep], nl[keep], pl[keep]
        nrv = np.int64(N) - nlv
        prv = np.int64(P) - plv
        nf = np.float64(N)
        plr = plv.astype(np.float64) / nlv.astype(np.float64)
        prr = prv.astype(np.float64) / nrv.astype(np.float64)
        gl = 1.0 - plr * plr - (1.0 - plr) * (1.0 - plr)
        gr = 1.0 - prr * prr - (1.0 - prr) * (1.0 - prr)
        wg = (nlv.astype(np.float64) / nf) * gl \
            + (nrv.astype(np.float64) / nf) * gr
        best = np.lexsort((xv, wg))[0]
        t = int(xv[best])
        nlb, plb = int(nlv[best]), int(plv[best])
        nrb, prb = N - nlb, P - plb
        left_pos = plb * N >= P * nlb
        right_pos = prb * N >= P * nrb
        tp = (plb if left_pos else 0) + (prb if right_pos else 0)
        fp = ((nlb - plb) if left_pos else 0) \
            + ((nrb - prb) if right_pos else 0)
        fn = (0 if left_pos else plb) + (0 if right_pos else prb)
        tn = (0 if left_pos else nlb - plb) \
            + (0 if right_pos else nrb - prb)
        acc = float(tp + tn) / float(N)
        prec = None if tp + fp == 0 else float(tp) / float(tp + fp)
        rec = None if P == 0 else float(tp) / float(P)
        if tp == 0 or prec is None or rec is None:
            f1 = None
        else:
            f1 = 2.0 * prec * rec / (prec + rec)
        return pa.table({
            "split_threshold": pa.array([t], pa.int64()),
            "tp": pa.array([tp], pa.int64()),
            "fp": pa.array([fp], pa.int64()),
            "fn": pa.array([fn], pa.int64()),
            "tn": pa.array([tn], pa.int64()),
            "acc": pa.array([acc], pa.float64()),
            "prec": pa.array([prec], pa.float64()),
            "rec": pa.array([rec], pa.float64()),
            "f1": pa.array([f1], pa.float64()),
        })

    return _length_label_grid(sf_dir).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def q_documents_length_auc(sf_dir: str) -> Dataset:
    """Exact ROC AUC of document length as a score for lang = 'en' —
    the rank statistic AUC = U/(n₊·n₋) with the tie-aware numerator
    kept entirely in integers: 2·U = Σ_v p_v·(2·cneg_before + neg_v)
    over the sorted (n_chars) grid (each positive counts negatives
    strictly below it twice and ties once).  One float division at
    the end; the Gini coefficient 2·AUC − 1 replays the same tree.

    Scale shape: the same bounded length-grid combine as the stump —
    AUC over a value-domain histogram, never a corpus sort."""
    import numpy as np

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("x", "ascending")])
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        p = b.column("p").to_numpy(zero_copy_only=False).astype(np.int64)
        neg = n - p
        cb = np.cumsum(neg) - neg
        u2 = int((p.astype(object) * (2 * cb.astype(object) + neg)).sum())
        P = int(p.sum())
        NN = int(neg.sum())
        if P == 0 or NN == 0:
            auc = gini = None
        else:
            auc = float(u2) / (2.0 * float(P) * float(NN))
            gini = 2.0 * auc - 1.0
        return pa.table({
            "n_pos": pa.array([P], pa.int64()),
            "n_neg": pa.array([NN], pa.int64()),
            "u2": pa.array([u2], pa.int64()),
            "auc": pa.array([auc], pa.float64()),
            "gini": pa.array([gini], pa.float64()),
        })

    return _length_label_grid(sf_dir).map_batches(
        finish, batch_format="pyarrow", batch_size=None)


def q_documents_kfold_stats(sf_dir: str) -> Dataset:
    """5-fold cross-validation assignment + per-fold balance audit —
    the split primitive under every CV loop, using THE shared seeded
    row-identity hash (stages.partition.row_hash_hex, seed 42) so the
    assignment is a pure function of doc_id: fold = first-8-hex-chars
    of md5 as an integer, mod 5 (resume-safe, partitioning-independent,
    exactly reproducible in SQL).  Per fold: doc count, positive-class
    count, char total (exact ints) and the mean/rate ratios as final
    float divisions — the numbers a fold-balance check reads before
    trusting a CV estimate.

    Scale shape: one corpus scan, per-batch partial groupby(fold),
    bounded 5-key tree combine."""
    import hashlib

    import numpy as np

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_pylist()
        fold = np.fromiter(
            (int(hashlib.md5((str(i) + "\x1f42").encode()).hexdigest()[:8],
                 16) % 5 for i in ids),
            dtype=np.int64, count=len(ids))
        t = pa.table({
            "fold": pa.array(fold),
            "one": pa.array(np.ones(b.num_rows, np.int64)),
            "pos": pc.equal(b.column("lang"), "en").cast(pa.int64()),
            "chars": pc.cast(b.column("n_chars"), pa.int64()),
        })
        g = t.group_by("fold").aggregate(
            [("one", "sum"), ("pos", "sum"), ("chars", "sum")])
        return g.rename_columns(["fold", "p_n", "p_p", "p_c"])

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "lang", "n_chars"])
    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["fold"], [("p_n", "sum"), ("p_p", "sum"), ("p_c", "sum")],
        ["fold", "p_n", "p_p", "p_c"], ["fold", "n_docs", "n_en", "sum_chars"])

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_docs").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "fold": pc.cast(b.column("fold"), pa.int64()),
            "n_docs": pc.cast(b.column("n_docs"), pa.int64()),
            "n_en": pc.cast(b.column("n_en"), pa.int64()),
            "sum_chars": pc.cast(b.column("sum_chars"), pa.int64()),
            "mean_chars": pa.array(
                b.column("sum_chars").to_numpy(zero_copy_only=False)
                .astype(np.float64) / n, pa.float64()),
            "en_rate": pa.array(
                b.column("n_en").to_numpy(zero_copy_only=False)
                .astype(np.float64) / n, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


# Poisson(1) inverse-CDF cutoffs at 16-bit resolution: C_k =
# floor(CDF(k) * 65536); a uniform 16-bit draw u maps to weight
# min{k : u < C_k} (else 10).  The SAME integer literals appear in the
# DuckDB twin's CASE ladder — the bootstrap weight is exact both sides.
_POISSON1_CUTS_16 = (24109, 48218, 60273, 64291, 65296, 65497,
                     65530, 65535, 65535, 65535)


def q_events_poisson_bootstrap(sf_dir: str) -> Dataset:
    """Poisson bootstrap (the map-reduce bootstrap: per-row
    Poisson(1)-distributed resample weights instead of a global n-draw
    resample, so replicates stream with the scan) of the mean purchase
    value — 8 deterministic replicates whose weights come from one md5
    per row: the 128-bit digest of the seeded row identity yields
    eight independent 16-bit uniforms, each inverse-CDF'd through the
    shared integer cutoff table.  Per replicate the weighted sum and
    weight total are exact int64; the replicate mean is one final
    float division chain, so the whole null distribution is
    bit-reproducible in SQL.

    Scale shape: one corpus scan, per-batch (replicate, Σw·x, Σw)
    partials via a bits×values matmul, bounded 8-key tree combine —
    the classic derandomized-resampling pattern for clusters (each
    row's weights are a pure function of its identity: resume-safe,
    partitioning-independent)."""
    import hashlib

    import numpy as np

    R = 8
    cuts = np.array(_POISSON1_CUTS_16, np.int64)

    def partial(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("event_type"), "purchase")
        f = b.filter(m)
        if f.num_rows == 0:
            return pa.table({"replicate": pa.array([], pa.int64()),
                             "p_wx": pa.array([], pa.int64()),
                             "p_w": pa.array([], pa.int64())})
        cents = scaled_int_sql(f.column("value"), 100)
        ids = f.column("event_id").to_pylist()
        dig = np.frombuffer(
            b"".join(hashlib.md5((str(i) + "\x1fboot").encode()).digest()
                     for i in ids), dtype=">u2").reshape(-1, 8) \
            .astype(np.int64)
        w = np.searchsorted(cuts, dig.ravel(), side="right") \
            .reshape(-1, 8).astype(np.int64)
        return pa.table({
            "replicate": pa.array(np.arange(R, dtype=np.int64)),
            "p_wx": pa.array(w.T @ cents),
            "p_w": pa.array(w.sum(axis=0)),
        })

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])
    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["replicate"], [("p_wx", "sum"), ("p_w", "sum")],
        ["replicate", "p_wx", "p_w"], ["replicate", "wx", "w"])

    def finish(b: pa.Table) -> pa.Table:
        wx = b.column("wx").to_numpy(zero_copy_only=False)
        w = b.column("w").to_numpy(zero_copy_only=False)
        mean = np.where(
            w > 0,
            wx.astype(np.float64) / np.where(w > 0, w, 1)
            .astype(np.float64) / 100.0,
            np.nan)
        out = pa.table({
            "replicate": pc.cast(b.column("replicate"), pa.int64()),
            "n_eff": pc.cast(b.column("w"), pa.int64()),
            "boot_mean": pa.array(
                [None if wi == 0 else float(mi)
                 for wi, mi in zip(w, mean)], pa.float64()),
        })
        return out

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_events_permutation_test(sf_dir: str) -> Dataset:
    """Randomization test for the purchase-vs-click mean-value
    difference: 32 deterministic re-assignments (bit j of the seeded
    row-identity md5's first 32 bits sends the row to group A), the
    observed |Δmean| compared against each replicate's with EXACT
    cross-multiplied integer arithmetic — |s₁ₚn₂ₚ − s₂ₚn₁ₚ|·n₁ₒn₂ₒ vs
    |s₁ₒn₂ₒ − s₂ₒn₁ₒ|·n₁ₚn₂ₚ in big ints (HUGEINT in the twin), so
    "extreme" never depends on float rounding.  p = (#extreme + 1) /
    (#valid + 1); replicates that land every row in one group are
    NULL-excluded (mirrored CASE).

    Scale shape: one corpus scan, per-batch bit-matrix matmul partials
    (32 sums), bounded 34-key tree combine (32 replicates + 2 sentinel
    rows carrying the observed totals), driver math on the grid."""
    import hashlib

    import numpy as np

    R = 32

    def partial(b: pa.Table) -> pa.Table:
        m1 = pc.equal(b.column("event_type"), "purchase")
        keep = pc.or_(m1, pc.equal(b.column("event_type"), "click"))
        f = b.filter(keep)
        if f.num_rows == 0:
            return pa.table({"perm": pa.array([], pa.int64()),
                             "p_n1": pa.array([], pa.int64()),
                             "p_s1": pa.array([], pa.int64())})
        cents = scaled_int_sql(f.column("value"), 100)
        ga = pc.equal(f.column("event_type"), "purchase") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        ids = f.column("event_id").to_pylist()
        u = np.fromiter(
            (int(hashlib.md5((str(i) + "\x1fperm").encode())
                 .hexdigest()[:8], 16) for i in ids),
            dtype=np.int64, count=len(ids))
        bits = ((u[:, None] >> np.arange(R, dtype=np.int64)) & 1)
        perm = np.concatenate(
            [np.arange(R, dtype=np.int64), [-1, -2]])
        p_n1 = np.concatenate(
            [bits.sum(axis=0), [int(ga.sum()), f.num_rows]])
        p_s1 = np.concatenate(
            [bits.T @ cents, [int(ga @ cents), int(cents.sum())]])
        return pa.table({"perm": pa.array(perm),
                         "p_n1": pa.array(p_n1),
                         "p_s1": pa.array(p_s1)})

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])
    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["perm"], [("p_n1", "sum"), ("p_s1", "sum")],
        ["perm", "p_n1", "p_s1"], ["perm", "n1", "s1"])

    def finish(b: pa.Table) -> pa.Table:
        rowmap = {int(p): (int(n), int(s)) for p, n, s in
                  zip(b.column("perm").to_pylist(),
                      b.column("n1").to_pylist(),
                      b.column("s1").to_pylist())}
        n1o, s1o = rowmap[-1]
        n, s = rowmap[-2]
        n2o, s2o = n - n1o, s - s1o
        if n1o == 0 or n2o == 0:
            return pa.table({
                "n_purchase": pa.array([n1o], pa.int64()),
                "n_click": pa.array([n2o], pa.int64()),
                "diff_obs": pa.array([None], pa.float64()),
                "n_valid": pa.array([0], pa.int64()),
                "n_extreme": pa.array([0], pa.int64()),
                "p_value": pa.array([None], pa.float64()),
            })
        obs_num = abs(s1o * n2o - s2o * n1o)
        nv = ne = 0
        for j in range(R):
            n1p, s1p = rowmap[j]
            n2p, s2p = n - n1p, s - s1p
            if n1p == 0 or n2p == 0:
                continue
            nv += 1
            if abs(s1p * n2p - s2p * n1p) * (n1o * n2o) \
                    >= obs_num * (n1p * n2p):
                ne += 1
        diff = (float(s1o) / float(n1o)
                - float(s2o) / float(n2o)) / 100.0
        return pa.table({
            "n_purchase": pa.array([n1o], pa.int64()),
            "n_click": pa.array([n2o], pa.int64()),
            "diff_obs": pa.array([diff], pa.float64()),
            "n_valid": pa.array([nv], pa.int64()),
            "n_extreme": pa.array([ne], pa.int64()),
            "p_value": pa.array(
                [float(ne + 1) / float(nv + 1)], pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_lineitem_multireg(sf_dir: str) -> Dataset:
    """Multiple linear regression with an EXACT distributed solve:
    extendedprice (cents) ~ quantity + discount (pct), fitted by
    Cramer's rule over the 3×3 integer normal equations — the nine
    sufficient statistics (n, Σx₁, Σx₂, Σx₁², Σx₁x₂, Σx₂², Σy, Σx₁y,
    Σx₂y) are exact int64 sums, the four 3×3 determinants are exact
    big-int expressions (HUGEINT in the twin), and each coefficient is
    ONE final float division — float summation order never exists, so
    a multi-feature OLS fit is bit-reproducible in SQL.  This extends
    the single-feature q_events_ols_trend pattern to a full feature
    matrix (the sufficient-statistics-then-solve shape every
    distributed linear model reduces to).

    Scale shape: one fact scan, 9 scalars per batch, single-key tree
    combine; the solve is constant-time driver math."""
    import numpy as np

    def partial(b: pa.Table) -> pa.Table:
        x1 = pc.cast(b.column("l_quantity"), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        x2 = scaled_int_sql(b.column("l_discount"), 100)
        y = scaled_int_sql(b.column("l_extendedprice"), 100)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "p_n": pa.array([b.num_rows], pa.int64()),
            "p_s1": pa.array([int(x1.sum())], pa.int64()),
            "p_s2": pa.array([int(x2.sum())], pa.int64()),
            "p_s11": pa.array([int((x1 * x1).sum())], pa.int64()),
            "p_s12": pa.array([int((x1 * x2).sum())], pa.int64()),
            "p_s22": pa.array([int((x2 * x2).sum())], pa.int64()),
            "p_sy": pa.array([int(y.sum())], pa.int64()),
            "p_s1y": pa.array([int((x1 * y).sum())], pa.int64()),
            "p_s2y": pa.array([int((x2 * y).sum())], pa.int64()),
        })

    ds = rd.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_quantity", "l_discount", "l_extendedprice"])
    names = ["n", "s1", "s2", "s11", "s12", "s22", "sy", "s1y", "s2y"]
    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["k"], [(f"p_{c}", "sum") for c in names],
        ["k"] + [f"p_{c}" for c in names], ["k"] + names)

    def finish(b: pa.Table) -> pa.Table:
        v = {c: int(b.column(c)[0].as_py()) for c in names}
        n, s1, s2 = v["n"], v["s1"], v["s2"]
        s11, s12, s22 = v["s11"], v["s12"], v["s22"]
        sy, s1y, s2y = v["sy"], v["s1y"], v["s2y"]
        det = n * (s11 * s22 - s12 * s12) \
            - s1 * (s1 * s22 - s12 * s2) \
            + s2 * (s1 * s12 - s11 * s2)
        det0 = sy * (s11 * s22 - s12 * s12) \
            - s1 * (s1y * s22 - s12 * s2y) \
            + s2 * (s1y * s12 - s11 * s2y)
        det1 = n * (s1y * s22 - s12 * s2y) \
            - sy * (s1 * s22 - s12 * s2) \
            + s2 * (s1 * s2y - s1y * s2)
        det2 = n * (s11 * s2y - s1y * s12) \
            - s1 * (s1 * s2y - s1y * s2) \
            + sy * (s1 * s12 - s11 * s2)
        if det == 0:
            b0 = b1 = b2 = None
        else:
            b0 = float(det0) / float(det)
            b1 = float(det1) / float(det)
            b2 = float(det2) / float(det)
        return pa.table({
            "n_rows": pa.array([n], pa.int64()),
            "intercept_cents": pa.array([b0], pa.float64()),
            "per_qty_cents": pa.array([b1], pa.float64()),
            "per_discpct_cents": pa.array([b2], pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_embeddings_int8_recall(sf_dir: str) -> pa.Table:
    """Int8 symmetric per-dimension quantization of the embedding
    corpus + recall@5 of the quantized index against the exact float
    top-5 — the compression/recall trade every production ANN deploy
    measures before shipping a quantized index.  Quantization is
    bit-pinned both sides: scale_d = max|x_d| (an exact float32 max),
    q = floor(x/scale·127 + 0.5) evaluated in float64 (zero-scale
    dims quantize to 0), so the int8 code grid and the integer dot
    products (≤ 64·127², far inside int64) are exact and the
    quantized top-5 per query is fully deterministic (dot DESC,
    vec_id ASC).  Recall joins it against the established exact float
    path (brute_force_topk — the q_embeddings_ann_topk oracle).

    Scale shape: pass 1 one corpus scan → 64 (dim, max) partials,
    bounded tree combine; pass 2 one scan with the 64-entry scale
    vector broadcast once via ray.put, per-batch int matmul + local
    top-5, driver heap merge over ≤ 5·8·n_blocks candidate rows."""
    import numpy as np
    import pyarrow.parquet as pq

    from ..stages.similarity import brute_force_topk
    from ..util import vec_matrix

    K = 5

    def dim_max(b: pa.Table) -> pa.Table:
        m = np.abs(vec_matrix(b.column("embedding"))).max(axis=0)
        return pa.table({
            "dim": pa.array(np.arange(len(m), dtype=np.int64)),
            "p_m": pa.array(m, pa.float64())})

    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    sc_tab = _small_table(_tree_combine(
        ds.map_batches(dim_max, batch_format="pyarrow"),
        ["dim"], [("p_m", "max")], ["dim", "p_m"], ["dim", "m"]))
    sc_tab = sc_tab.sort_by("dim")
    scales = sc_tab.column("m").to_numpy(zero_copy_only=False)

    def quantize(mat: np.ndarray, s: np.ndarray) -> np.ndarray:
        safe = np.where(s > 0, s, 1.0)
        q = np.floor(mat / safe * 127.0 + 0.5).astype(np.int64)
        return np.where(s > 0, q, 0)

    qtab = pq.read_table(_t(sf_dir, "embeddings"),
                         filters=[("vec_id", "<", 8)],
                         columns=["vec_id", "embedding"]).sort_by("vec_id")
    qids = qtab.column("vec_id").to_pylist()
    qmat = vec_matrix(qtab.column("embedding"))
    qq = quantize(qmat, scales)          # (8, d) int64
    state = ray.put((qq, scales, qids))

    def cand(b: pa.Table) -> pa.Table:
        qqv, sv, qidv = ray.get(state)
        cz = quantize(vec_matrix(b.column("embedding")), sv)
        dots = cz @ qqv.T                # (n, nq) exact int64
        vids = b.column("vec_id").to_numpy(zero_copy_only=False)
        k = min(K, dots.shape[0])
        out_q, out_v, out_d = [], [], []
        for qi in range(dots.shape[1]):
            col = dots[:, qi]
            idx = np.lexsort((vids, -col))[:k]
            out_q.extend([qidv[qi]] * len(idx))
            out_v.extend(vids[idx])
            out_d.extend(col[idx])
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "dot": pa.array(out_d, pa.int64())})

    import heapq

    best: dict[int, list] = {}
    cands = ds.map_batches(cand, batch_format="pyarrow")
    for b in cands.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for qid, vid, d in zip(b.column("query_id").to_pylist(),
                               b.column("vec_id").to_pylist(),
                               b.column("dot").to_pylist()):
            heapq.heappush(best.setdefault(qid, []), (d, -vid))
            if len(best[qid]) > K:
                heapq.heappop(best[qid])
    i8 = {q: {-nv for _, nv in h} for q, h in best.items()}

    fl_tab = brute_force_topk(
        rd.read_parquet(_t(sf_dir, "embeddings"),
                        columns=["vec_id", "embedding"]),
        qmat, qids, k=K)
    fl: dict[int, set] = {}
    for qid, vid in zip(fl_tab.column("query_id").to_pylist(),
                        fl_tab.column("vec_id").to_pylist()):
        fl.setdefault(qid, set()).add(vid)

    rows_q, rows_n, rows_r = [], [], []
    for qid in sorted(i8):
        n_ov = len(i8[qid] & fl.get(qid, set()))
        rows_q.append(qid)
        rows_n.append(n_ov)
        rows_r.append(float(n_ov) / 5.0)
    return pa.table({
        "query_id": pa.array(rows_q, pa.int64()),
        "n_overlap": pa.array(rows_n, pa.int64()),
        "recall": pa.array(rows_r, pa.float64())})


def q_events_user_path_agg(sf_dir: str) -> Dataset:
    """Ordered string aggregation (the LISTAGG / STRING_AGG staple):
    each user's full event-type path concatenated in (ts, event_id)
    order — the sequence feature under journey clustering and
    next-action models.  Ray shape: ONE groupby(user_id) co-partition,
    in-group vectorized sort + a single Arrow-join per group; the
    deterministic (ts, event_id) tie-break makes the string
    bit-reproducible in SQL's STRING_AGG(... ORDER BY ts, event_id).

    Scale note: per-user paths are bounded by per-user activity (the
    same bound events_funnel already rides); a pathological mega-user
    degrades to one wide string row, never a driver loop."""
    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_id", "ts",
                                  "event_type"])

    def path(g: pa.Table) -> pa.Table:
        g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        toks = g.column("event_type").to_pylist()
        return pa.table({
            "user_id": pa.array([g.column("user_id")[0].as_py()],
                                pa.int64()),
            "n_events": pa.array([g.num_rows], pa.int64()),
            "path": pa.array([">".join(toks)], pa.string()),
        })

    return ds.groupby("user_id").map_groups(path, batch_format="pyarrow")


def q_customers_snm_pairs(sf_dir: str) -> Dataset:
    """Sorted-neighborhood blocking (the OTHER classic entity-
    resolution blocking strategy beside customers_golden_record's key
    blocking and customers_fuzzy_name_pairs' variant buckets): sort by
    the blocking key (c_name), emit every pair within a rank window of
    W = 3, tagged with its rank gap and a same-nation flag.  SNM
    bounds candidate pairs at W·n regardless of key-frequency skew —
    the property that makes it the safe default on a 100 TB corpus
    whose hottest blocking key would explode a key-equality block.

    Distributed shape: range-partition by splitters drawn from a
    deterministic bounded sample (driver sees ~≤2k names, never the
    table), ONE groupby(part) co-partition; each partition receives
    its predecessor's last W rows as ghost context (a second keyed
    emission, no broadcast), sorts locally, and emits sliding-window
    pairs whose LATER element it owns — cross-boundary pairs appear
    exactly once.  Loud failure (never silence) if a partition is
    thinner than W, which would make a window span two boundaries."""
    import numpy as np

    from ..stages.partition import deterministic_sample

    W = 3
    N_PARTS = 8

    ds = rd.read_parquet(_t(sf_dir, "customer"),
                         columns=["c_custkey", "c_name", "c_nationkey"])
    n_rows = rd.read_parquet(_t(sf_dir, "customer"),
                             columns=["c_custkey"]).count()
    frac = min(1.0, 2000.0 / max(n_rows, 1))
    sample = deterministic_sample(
        ds.select_columns(["c_name", "c_custkey"]), frac,
        ["c_custkey"]).take_all()
    names = sorted(r["c_name"] for r in sample)
    if len(names) >= N_PARTS:
        idx = [len(names) * i // N_PARTS for i in range(1, N_PARTS)]
        splitters = sorted({names[i] for i in idx})
    else:
        splitters = []
    spl = np.array(splitters, dtype=object)

    def assign(b: pa.Table) -> pa.Table:
        nm = np.asarray(b.column("c_name").to_pylist(), dtype=object)
        part = np.searchsorted(spl, nm, side="right").astype(np.int64) \
            if len(spl) else np.zeros(len(nm), np.int64)
        own = b.append_column("part", pa.array(part)) \
            .append_column("ghost", pa.array(
                np.zeros(len(nm), np.bool_)))
        return own

    assigned = ds.map_batches(assign, batch_format="pyarrow")

    # ghost pass: each partition's last W rows re-keyed to part+1.
    # The tail of a partition is found with one bounded per-partition
    # top-k (names sort ascending; keep the W largest) — a (part, W)
    # combine, never a corpus sort.
    def tail_partial(b: pa.Table) -> pa.Table:
        out = []
        t = b.sort_by([("part", "ascending"), ("c_name", "descending"),
                       ("c_custkey", "descending")])
        parts = t.column("part").to_numpy(zero_copy_only=False)
        changes = np.flatnonzero(np.diff(parts)) + 1
        bounds = np.concatenate([[0], changes, [t.num_rows]])
        for s, e in zip(bounds[:-1], bounds[1:]):
            out.append(t.slice(int(s), min(W, int(e - s))))
        return pa.concat_tables(out) if out else t.slice(0, 0)

    tails = assigned.map_batches(tail_partial, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(tail_partial, batch_format="pyarrow",
                     batch_size=None)

    # The global tail set is bounded (≤ W rows per partition) — pull it
    # to the driver to (a) validate no mid-stream partition is thinner
    # than W (a window would silently span two boundaries) and (b)
    # re-key each tail to its successor partition as ghost context.
    max_part = len(splitters)
    tail_tab = _small_table(tails)
    if tail_tab is None:
        tail_tab = pa.table({
            "c_custkey": pa.array([], pa.int64()),
            "c_name": pa.array([], pa.string()),
            "c_nationkey": pa.array([], pa.int32()),
            "part": pa.array([], pa.int64()),
            "ghost": pa.array([], pa.bool_())})
    counts = {}
    for p in tail_tab.column("part").to_pylist():
        counts[p] = counts.get(p, 0) + 1
    thin = [p for p in range(1, max_part)
            if counts.get(p, 0) not in (0, W)]
    if thin:
        raise ValueError(
            f"snm_pairs: partitions {thin} hold fewer than W={W} rows; "
            "lower N_PARTS so windows never span two partition "
            "boundaries")
    empty_mid = [p for p in range(1, max_part)
                 if counts.get(p, 0) == 0 and counts.get(p - 1, 0)]
    if empty_mid:
        raise ValueError(
            f"snm_pairs: partitions {empty_mid} are empty mid-stream; "
            "lower N_PARTS (ghost context cannot hop an empty "
            "partition)")
    ghost_tab = tail_tab.filter(
        pc.less_equal(pc.add(tail_tab.column("part"), 1), max_part)) \
        if tail_tab.num_rows else tail_tab
    ghost_tab = pa.table({
        "c_custkey": ghost_tab.column("c_custkey"),
        "c_name": ghost_tab.column("c_name"),
        "c_nationkey": ghost_tab.column("c_nationkey"),
        "part": pc.add(ghost_tab.column("part"), 1),
        "ghost": pa.array(np.ones(ghost_tab.num_rows, np.bool_)),
    })
    ghosts = rd.from_arrow(ghost_tab)

    def window_pairs(g: pa.Table) -> pa.Table:
        g = g.sort_by([("c_name", "ascending"),
                       ("c_custkey", "ascending")])
        nm = g.column("c_name").to_pylist()
        nk = g.column("c_nationkey").to_numpy(zero_copy_only=False)
        gh = g.column("ghost").to_numpy(zero_copy_only=False)
        a_n, b_n, gap, same = [], [], [], []
        for d in range(1, W + 1):
            if d >= g.num_rows:
                break
            later_own = ~gh[d:]
            for i in np.flatnonzero(later_own):
                a_n.append(nm[i])
                b_n.append(nm[i + d])
                gap.append(d)
                same.append(int(nk[i] == nk[i + d]))
        return pa.table({
            "name_a": pa.array(a_n, pa.string()),
            "name_b": pa.array(b_n, pa.string()),
            "rank_gap": pa.array(gap, pa.int64()),
            "same_nation": pa.array(same, pa.int64()),
        })

    return assigned.union(ghosts).groupby("part") \
        .map_groups(window_pairs, batch_format="pyarrow")


def q_events_temporal_split(sf_dir: str) -> Dataset:
    """Leakage-safe TEMPORAL train/test split with an embargo gap —
    the time-series counterpart of documents_leakage_safe_split's
    hash split: the cutoff is the first day whose cumulative volume
    reaches 70 % (exact-integer rank test 10·cum ≥ 7·total over the
    bounded day grid), train ≤ cutoff, the next 2 days are PURGED
    (the embargo every forecast/label-horizon pipeline needs so
    boundary labels can't leak across), test is the rest.  Output:
    per-split event count, day count and day range.

    Scale shape: ONE corpus scan reduced to the (day, n) grid, tree
    combine, pure driver math after — min/max come off the grid, so
    no raw-timestamp Min/Max exchange (the pandas day-floor hazard
    never applies)."""
    import numpy as np

    EMBARGO_DAYS = 2
    US_DAY = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day")
        t = pa.table({"day": day,
                      "one": pa.array(np.ones(b.num_rows, np.int64))})
        return t.group_by("day").aggregate([("one", "sum")]) \
            .rename_columns(["day", "p_n"])

    ds = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])
    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], [("p_n", "sum")], ["day", "p_n"], ["day", "n"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("day", "ascending")])
        day_us = b.column("day").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n = b.column("n").to_numpy(zero_copy_only=False)
        cum = np.cumsum(n)
        total = int(cum[-1])
        cut_i = int(np.argmax(10 * cum >= 7 * total))
        cutoff = int(day_us[cut_i])
        emb_hi = cutoff + EMBARGO_DAYS * US_DAY
        lab = np.where(day_us <= cutoff, "train",
                       np.where(day_us <= emb_hi, "purged", "test"))
        rows = []
        for split in ("train", "purged", "test"):
            m = lab == split
            if not m.any():
                continue
            rows.append({
                "split": split,
                "n_events": int(n[m].sum()),
                "n_days": int(m.sum()),
                "min_day": int(day_us[m].min()),
                "max_day": int(day_us[m].max()),
            })
        return pa.table({
            "split": pa.array([r["split"] for r in rows], pa.string()),
            "n_events": pa.array([r["n_events"] for r in rows],
                                 pa.int64()),
            "n_days": pa.array([r["n_days"] for r in rows], pa.int64()),
            "min_day": pa.array([r["min_day"] for r in rows],
                                pa.int64()).cast(pa.timestamp("us")),
            "max_day": pa.array([r["max_day"] for r in rows],
                                pa.int64()).cast(pa.timestamp("us")),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_events_cuped(sf_dir: str) -> Dataset:
    """CUPED variance reduction (Deng et al. 2013, public) for an A/B
    readout: arms are the deterministic user_id parity, the covariate
    X is each user's PRE-period total value (all event types before
    the 50 %-volume day cutoff), the metric Y their POST-period
    purchase value; θ = cov(X,Y)/var(X) and each arm's adjusted mean
    Ȳ − θ(X̄_arm − X̄) come from EXACT integer sufficient statistics
    (per-user cents sums, then Σ X·Y / Σ X² over users), so the whole
    estimator is three float expressions — no float accumulation
    anywhere.

    Scale shape: a bounded day-grid pass finds the cutoff, ONE
    user-grain co-partition builds (X, Y) per user, per-batch partials
    reduce to nine arm/global scalars, single-key tree combine.
    int64 headroom: Σ_users X·Y stays < 2⁶³ while per-user cents stay
    under ~3·10⁹ — the twin's HUGEINT has no such bound (documented,
    loudly checked)."""
    import numpy as np

    def day_partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day")
        t = pa.table({"day": day,
                      "one": pa.array(np.ones(b.num_rows, np.int64))})
        return t.group_by("day").aggregate([("one", "sum")]) \
            .rename_columns(["day", "p_n"])

    ds_ts = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])
    grid = _small_table(_tree_combine(
        ds_ts.map_batches(day_partial, batch_format="pyarrow"),
        ["day"], [("p_n", "sum")], ["day", "p_n"], ["day", "n"]))
    grid = grid.sort_by([("day", "ascending")])
    day_us = grid.column("day").cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    cum = np.cumsum(grid.column("n").to_numpy(zero_copy_only=False))
    total = int(cum[-1])
    cutoff = int(day_us[int(np.argmax(2 * cum >= total))])
    cut_scalar = pa.scalar(cutoff, pa.timestamp("us"))

    def user_partial(b: pa.Table) -> pa.Table:
        cents = scaled_int_sql(b.column("value"), 100)
        pre = pc.less_equal(
            pc.floor_temporal(b.column("ts"), unit="day"),
            cut_scalar).to_numpy(zero_copy_only=False)
        is_y = pc.equal(b.column("event_type"), "purchase") \
            .to_numpy(zero_copy_only=False) & ~pre
        t = pa.table({
            "user_id": b.column("user_id"),
            "px": pa.array(np.where(pre, cents, 0)),
            "py": pa.array(np.where(is_y, cents, 0)),
        })
        return t.group_by("user_id").aggregate(
            [("px", "sum"), ("py", "sum")]) \
            .rename_columns(["user_id", "p_x", "p_y"])

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_type",
                                  "value"])
    per_user = ds.map_batches(user_partial, batch_format="pyarrow") \
        .groupby("user_id").aggregate(Sum("p_x", alias_name="x"),
                                      Sum("p_y", alias_name="y"))

    def arm_partial(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy(zero_copy_only=False)
        x = b.column("x").to_numpy(zero_copy_only=False)
        y = b.column("y").to_numpy(zero_copy_only=False)
        if (np.abs(x) > 3_000_000_000).any() \
                or (np.abs(y) > 3_000_000_000).any():
            raise ValueError(
                "cuped: per-user cents exceed the int64 product "
                "headroom; widen the partials to object dtype")
        arm = (uid % 2).astype(np.int64)
        rows = []
        for a in (0, 1):
            m = arm == a
            rows.append((a, int(m.sum()), int(x[m].sum()),
                         int(y[m].sum()),
                         int((x[m] * y[m]).sum()),
                         int((x[m] * x[m]).sum())))
        return pa.table({
            "arm": pa.array([r[0] for r in rows], pa.int64()),
            "p_n": pa.array([r[1] for r in rows], pa.int64()),
            "p_sx": pa.array([r[2] for r in rows], pa.int64()),
            "p_sy": pa.array([r[3] for r in rows], pa.int64()),
            "p_sxy": pa.array([r[4] for r in rows], pa.int64()),
            "p_sxx": pa.array([r[5] for r in rows], pa.int64()),
        })

    agg = _tree_combine(
        per_user.map_batches(arm_partial, batch_format="pyarrow"),
        ["arm"], [("p_n", "sum"), ("p_sx", "sum"), ("p_sy", "sum"),
                  ("p_sxy", "sum"), ("p_sxx", "sum")],
        ["arm", "p_n", "p_sx", "p_sy", "p_sxy", "p_sxx"],
        ["arm", "n", "sx", "sy", "sxy", "sxx"])

    def finish(b: pa.Table) -> pa.Table:
        rows = {int(r["arm"]): r for r in b.to_pylist()}
        n = sum(int(r["n"]) for r in rows.values())
        sx = sum(int(r["sx"]) for r in rows.values())
        sy = sum(int(r["sy"]) for r in rows.values())
        sxy = sum(int(r["sxy"]) for r in rows.values())
        sxx = sum(int(r["sxx"]) for r in rows.values())
        var_num = n * sxx - sx * sx
        cov_num = n * sxy - sx * sy
        theta = 0.0 if var_num == 0 else float(cov_num) / float(var_num)
        out = {"arm": [], "n_users": [], "mean_y": [],
               "mean_y_adj": [], "theta": []}
        for a in sorted(rows):
            r = rows[a]
            ng, sxg, syg = int(r["n"]), int(r["sx"]), int(r["sy"])
            mean_y = float(syg) / float(ng) / 100.0
            adj = (float(syg) / float(ng)
                   - theta * (float(sxg) / float(ng)
                              - float(sx) / float(n))) / 100.0
            out["arm"].append(a)
            out["n_users"].append(ng)
            out["mean_y"].append(mean_y)
            out["mean_y_adj"].append(adj)
            out["theta"].append(theta)
        return pa.table({
            "arm": pa.array(out["arm"], pa.int64()),
            "n_users": pa.array(out["n_users"], pa.int64()),
            "mean_y": pa.array(out["mean_y"], pa.float64()),
            "mean_y_adj": pa.array(out["mean_y_adj"], pa.float64()),
            "theta": pa.array(out["theta"], pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


# ---------------------------------------------------------------------------
# Privacy / release-audit family (round 4, tenth session)
# ---------------------------------------------------------------------------

def q_events_k_anonymity(sf_dir: str) -> Dataset:
    """k-anonymity / l-diversity release audit — the privacy staple a
    training-data pipeline runs before publishing an event extract.
    The released quasi-identifier is (event_type, day, $10 value band);
    the sensitive attribute is user_id.  Per event type: how many QI
    equivalence classes exist, how many violate k=5 (class smaller than
    5 rows), how many rows those expose, the smallest class, and how
    many classes violate l=3 diversity (fewer than 3 distinct users).
    All counts are exact int64 — nothing float anywhere.

    Scale shape: one scan; per-batch pre-aggregation to
    (class, user, cnt) rows (bounded by the release's own class × user
    cardinality, the audit's working set by definition), ONE
    groupby(class) exchange, then a bounded per-type tree combine.
    Raw rows never shuffle."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts", "user_id", "value"])
    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        cents = scaled_int_sql(b.column("value"), 100)
        t = pa.table({
            "event_type": b.column("event_type"),
            "day_us": pa.array(us - us % DAY_US, pa.int64()),
            "band": pa.array(cents // 1000, pa.int64()),
            "user_id": b.column("user_id"),
            "one": pa.array(np.ones(len(us), np.int64)),
        })
        g = t.group_by(["event_type", "day_us", "band", "user_id"]) \
             .aggregate([("one", "sum")])
        return g.rename_columns(
            ["event_type", "day_us", "band", "user_id", "cnt"])

    def per_class(g: pa.Table) -> pa.Table:
        # a (class, user) pair may arrive once per source batch: fold
        u = g.group_by("user_id").aggregate([("cnt", "sum")])
        n = int(pc.sum(u.column("cnt_sum")).as_py())
        users = u.num_rows
        return pa.table({
            "event_type": g.column("event_type")[:1],
            "one": pa.array([1], pa.int64()),
            "k_viol": pa.array([int(n < 5)], pa.int64()),
            "risk": pa.array([n if n < 5 else 0], pa.int64()),
            "n": pa.array([n], pa.int64()),
            "l_viol": pa.array([int(users < 3)], pa.int64()),
        })

    classes = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "day_us", "band"]) \
        .map_groups(per_class, batch_format="pyarrow")

    agg = _tree_combine(
        classes, ["event_type"],
        [("one", "sum"), ("k_viol", "sum"), ("risk", "sum"),
         ("n", "min"), ("l_viol", "sum")],
        ["event_type", "one", "k_viol", "risk", "n", "l_viol"],
        ["event_type", "n_classes", "k_violations", "rows_at_risk",
         "min_class_size", "l_violations"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("event_type", "ascending")])
        return b.select(["event_type", "n_classes", "k_violations",
                         "rows_at_risk", "min_class_size", "l_violations"])

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_events_randomized_response(sf_dir: str) -> Dataset:
    """Randomized response (Warner 1965 — the local-DP primitive): each
    row reports whether its value exceeds $100, but lies with
    probability 1/4 (ε = ln 3 local differential privacy).  The flip
    decision is two md5 bits of the seeded row identity — derandomized,
    resume-safe, and replayed bit-for-bit by the SQL twin — and the
    debiased estimate 2·reported − n/2 rides an exact integer numerator
    (4·reported − n) so the only floats are two final divisions.

    Per event type: n, the true count (for evaluation), the noised
    reported count, the debiased estimate, and its signed error.

    Scale shape: one scan, per-batch (type, n, true, reported) partials,
    bounded 5-key tree combine."""
    import hashlib

    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        cents = scaled_int_sql(b.column("value"), 100)
        truth = (cents > 10_000)
        ids = b.column("event_id").to_pylist()
        first = np.frombuffer(
            b"".join(hashlib.md5((str(i) + "\x1frr").encode()).digest()
                     for i in ids), dtype=np.uint8)[::16]
        flip = first >= 192                    # top two bits == 11: P=1/4
        rep = truth ^ flip
        t = pa.table({
            "event_type": b.column("event_type"),
            "one": pa.array(np.ones(len(ids), np.int64)),
            "tr": pa.array(truth.astype(np.int64)),
            "rp": pa.array(rep.astype(np.int64)),
        })
        g = t.group_by("event_type").aggregate(
            [("one", "sum"), ("tr", "sum"), ("rp", "sum")])
        return g.rename_columns(["event_type", "p_n", "p_t", "p_r"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        [("p_n", "sum"), ("p_t", "sum"), ("p_r", "sum")],
        ["event_type", "p_n", "p_t", "p_r"],
        ["event_type", "n", "tr", "rp"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("event_type", "ascending")])
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        tr = b.column("tr").to_numpy(zero_copy_only=False).astype(np.int64)
        rp = b.column("rp").to_numpy(zero_copy_only=False).astype(np.int64)
        est = (4 * rp - n).astype(np.float64) / 2.0
        err = est - tr.astype(np.float64)
        return pa.table({
            "event_type": b.column("event_type"),
            "n": pa.array(n, pa.int64()),
            "true_yes": pa.array(tr, pa.int64()),
            "reported_yes": pa.array(rp, pa.int64()),
            "est_yes": pa.array(est, pa.float64()),
            "est_error": pa.array(err, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_events_hodges_lehmann(sf_dir: str) -> Dataset:
    """Exact Hodges–Lehmann estimator (median of all Walsh averages
    (x_i + x_j)/2, i ≤ j) of the value distribution per (event type,
    day) — the rank-based robust location the Wilcoxon family inverts,
    ~0.96 efficient under normality yet 29 %-breakdown robust.  Exact,
    not sampled: values ride int64 cents, the group's Walsh-sum
    DISTRIBUTION is built from the (cents, count) histogram (pair
    multiplicities c_i·c_j off-diagonal, c_i(c_i+1)/2 on), and the
    median rank is read off an integer cumulative sum; the only float
    is the final (s_lo + s_hi)/400 dollars expression, replayed
    operand-for-operand by the twin's histogram self-join.

    Scale shape: per-batch (type, day, cents, count) pre-aggregation,
    ONE bounded histogram exchange (≤ distinct-cents rows per group —
    the audit never ships raw rows), per-group O(d²) Walsh expansion
    over the DISTINCT values only (d ≪ n)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts", "value"])
    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({
            "event_type": b.column("event_type"),
            "day_us": pa.array(us - us % DAY_US, pa.int64()),
            "c": pa.array(scaled_int_sql(b.column("value"), 100)),
            "one": pa.array(np.ones(len(us), np.int64)),
        })
        g = t.group_by(["event_type", "day_us", "c"]).aggregate(
            [("one", "sum")])
        return g.rename_columns(["event_type", "day_us", "c", "cnt"])

    def hl(g: pa.Table) -> pa.Table:
        h = g.group_by("c").aggregate([("cnt", "sum")]) \
             .sort_by([("c", "ascending")])
        v = h.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        c = h.column("cnt_sum").to_numpy(zero_copy_only=False) \
             .astype(np.int64)
        n = int(c.sum())
        iu, ju = np.triu_indices(len(v))
        sums = v[iu] + v[ju]
        w = c[iu] * c[ju]
        diag = iu == ju
        w[diag] = c[iu[diag]] * (c[iu[diag]] + 1) // 2
        order = np.argsort(sums, kind="stable")
        sums, w = sums[order], w[order]
        cum = np.cumsum(w)
        m = n * (n + 1) // 2
        k_lo, k_hi = (m + 1) // 2, (m + 2) // 2
        s_lo = int(sums[np.searchsorted(cum, k_lo)])
        s_hi = int(sums[np.searchsorted(cum, k_hi)])
        return pa.table({
            "event_type": g.column("event_type")[:1],
            "day": pa.array([g.column("day_us")[0].as_py()],
                            pa.int64()).cast(pa.timestamp("us")),
            "n": pa.array([n], pa.int64()),
            "hl": pa.array([float(s_lo + s_hi) / 400.0], pa.float64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "day_us"]) \
        .map_groups(hl, batch_format="pyarrow")


def q_events_conformal_intervals(sf_dir: str) -> Dataset:
    """Split-conformal prediction interval (Vovk; Lei et al. 2018 —
    public) per event type, with its empirical coverage — the
    distribution-free ML-eval staple.  Rows split 1/2 train, 1/4
    calibrate, 1/4 test on one md5 hex digit of the seeded row identity
    (derandomized; the twin replays the same bands).  The predictor is
    the train mean; the nonconformity score |x − x̄_train| rides the
    EXACT integer |c·n_train − S_train| (cents cross-multiplied by the
    train count, so the float mean never exists in the comparison); the
    conformal quantile is the k = ⌈0.9(n_cal+1)⌉-th smallest
    calibration score read off an integer histogram, and test coverage
    counts integer comparisons.  Floats appear only in the three final
    reporting divisions, replayed operand-for-operand.

    Scale shape: pass 1 is a bounded (type, Σcents, n) tree combine;
    pass 2 pre-aggregates (type, split, score) histograms per batch and
    makes ONE bounded groupby(type) exchange."""
    import hashlib

    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "event_type", "value"])

    def band_of(b: pa.Table) -> "np.ndarray":
        ids = b.column("event_id").to_pylist()
        first = np.frombuffer(
            b"".join(hashlib.md5((str(i) + "\x1fconf").encode()).digest()
                     for i in ids), dtype=np.uint8)[::16]
        return first >> 6        # 0,1 → train; 2 → cal; 3 → test

    def train_partial(b: pa.Table) -> pa.Table:
        keep = band_of(b) <= 1
        f = b.filter(pa.array(keep))
        if f.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "p_s": pa.array([], pa.int64()),
                             "p_n": pa.array([], pa.int64())})
        t = pa.table({
            "event_type": f.column("event_type"),
            "c": pa.array(scaled_int_sql(f.column("value"), 100)),
            "one": pa.array(np.ones(f.num_rows, np.int64)),
        })
        g = t.group_by("event_type").aggregate(
            [("c", "sum"), ("one", "sum")])
        return g.rename_columns(["event_type", "p_s", "p_n"])

    tr = _small_table(_tree_combine(
        ds.map_batches(train_partial, batch_format="pyarrow"),
        ["event_type"], [("p_s", "sum"), ("p_n", "sum")],
        ["event_type", "p_s", "p_n"], ["event_type", "s", "n"]))
    stats = {r["event_type"]: (int(r["s"]), int(r["n"]))
             for r in tr.to_pylist()}
    stats_ref = ray.put(stats)

    def score_partial(b: pa.Table) -> pa.Table:
        band = band_of(b)
        keep = band >= 2
        f = b.filter(pa.array(keep))
        if f.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "part": pa.array([], pa.int64()),
                             "r": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        st = ray.get(stats_ref)
        cents = scaled_int_sql(f.column("value"), 100)
        types = f.column("event_type").to_pylist()
        sv = np.array([st[t][0] for t in types], np.int64)
        nv = np.array([st[t][1] for t in types], np.int64)
        t = pa.table({
            "event_type": f.column("event_type"),
            "part": pa.array(band[keep].astype(np.int64)),
            "r": pa.array(np.abs(cents * nv - sv)),
            "one": pa.array(np.ones(f.num_rows, np.int64)),
        })
        g = t.group_by(["event_type", "part", "r"]).aggregate(
            [("one", "sum")])
        return g.rename_columns(["event_type", "part", "r", "cnt"])

    def finish(g: pa.Table) -> pa.Table:
        etype = g.column("event_type")[0].as_py()
        s, n_train = ray.get(stats_ref)[etype]
        h = g.group_by(["part", "r"]).aggregate([("cnt", "sum")]) \
             .sort_by([("r", "ascending")])
        part = h.column("part").to_numpy(zero_copy_only=False)
        r = h.column("r").to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = h.column("cnt_sum").to_numpy(zero_copy_only=False) \
               .astype(np.int64)
        cal, tst = part == 2, part == 3
        n_cal = int(cnt[cal].sum())
        n_test = int(cnt[tst].sum())
        k = min((9 * (n_cal + 1) + 9) // 10, n_cal)
        cum = np.cumsum(cnt[cal])
        q_num = int(r[cal][np.searchsorted(cum, k)])
        covered = int(cnt[tst][r[tst] <= q_num].sum())
        pred = float(s) / float(n_train) / 100.0
        q_hat = float(q_num) / float(n_train) / 100.0
        return pa.table({
            "event_type": pa.array([etype], pa.string()),
            "n_train": pa.array([n_train], pa.int64()),
            "n_cal": pa.array([n_cal], pa.int64()),
            "n_test": pa.array([n_test], pa.int64()),
            "pred": pa.array([pred], pa.float64()),
            "q_hat": pa.array([q_hat], pa.float64()),
            "coverage": pa.array([float(covered) / float(n_test)],
                                 pa.float64()),
        })

    return ds.map_batches(score_partial, batch_format="pyarrow") \
        .groupby("event_type") \
        .map_groups(finish, batch_format="pyarrow")


def q_documents_minhash_sql(sf_dir: str) -> Dataset:
    """MinHash + LSH near-dup candidates, FULLY oracle-checked — the
    derandomized twin of the production path (q_documents_minhash_
    neardup): every min-hash is md5(shingle, seed) so the entire
    approximate pipeline — signatures, banding, candidate generation,
    signature-agreement estimate — is replayed bit-for-bit by the
    DuckDB twin (the production path's crc/sip hashing is faster but
    not SQL-expressible; this variant exists so the APPROXIMATE
    machinery itself sits under the hash gate, not just its exact
    verifier).  K = 8 hashes, 4 bands × 2 rows; output one row per
    banded candidate pair with its signature-agreement estimate
    n_match/8.

    Scale shape: distinct word-3-gram rows per doc (the vectorized
    shared shingler), md5 ONCE per distinct shingle per seed per batch
    (dictionary-encoded), per-batch (doc, seed, min) partials, ONE
    groupby(doc) exchange for signatures, ONE groupby(band-key)
    exchange for candidates (singleton buckets skipped), and a
    signature join only on the candidate rows — raw text never
    shuffles."""
    import hashlib

    import numpy as np

    K = 8
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    sh = ds.map_batches(_doc_shingle_rows("doc_id"),
                        batch_format="pyarrow")

    def sig_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "r": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        enc = b.column("sh").combine_chunks().dictionary_encode()
        vocab = enc.dictionary.to_pylist()
        hv = np.empty((len(vocab), K), np.int64)
        for j, s in enumerate(vocab):
            sb = s.encode()
            for r in range(K):
                hv[j, r] = int(hashlib.md5(
                    sb + b"\x1fmh" + str(r).encode()).hexdigest()[:8], 16)
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        t = pa.table({
            "doc_id": pa.array(np.repeat(ids, K)),
            "r": pa.array(np.tile(np.arange(K, dtype=np.int64),
                                  len(idx))),
            "h": pa.array(hv[idx].ravel()),
        })
        g = t.group_by(["doc_id", "r"]).aggregate([("h", "min")])
        return g.rename_columns(["doc_id", "r", "h"])

    def pivot_sig(g: pa.Table) -> pa.Table:
        r = g.column("r").to_numpy(zero_copy_only=False)
        h = g.column("h").to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.full(K, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(m, r, h)
        cols = {"doc_id": g.column("doc_id")[:1]}
        for j in range(K):
            cols[f"m{j}"] = pa.array([int(m[j])], pa.int64())
        return pa.table(cols)

    sig = sh.map_batches(sig_partial, batch_format="pyarrow") \
        .groupby("doc_id").map_groups(pivot_sig, batch_format="pyarrow")

    def band_rows(b: pa.Table) -> pa.Table:
        n = b.num_rows
        ids = b.column("doc_id").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        out = {"doc_id": pa.array(np.repeat(ids, K // 2)),
               "j": pa.array(np.tile(np.arange(K // 2, dtype=np.int64),
                                     n))}
        k1 = np.empty((n, K // 2), np.int64)
        k2 = np.empty((n, K // 2), np.int64)
        for j in range(K // 2):
            k1[:, j] = b.column(f"m{2 * j}").to_numpy(
                zero_copy_only=False)
            k2[:, j] = b.column(f"m{2 * j + 1}").to_numpy(
                zero_copy_only=False)
        out["k1"] = pa.array(k1.ravel())
        out["k2"] = pa.array(k2.ravel())
        return pa.table(out)

    empty_pairs = pa.table({"doc_a": pa.array([], pa.int64()),
                            "doc_b": pa.array([], pa.int64())})

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return empty_pairs
        ids = np.sort(np.unique(
            g.column("doc_id").to_numpy(zero_copy_only=False)
            .astype(np.int64)))
        if len(ids) < 2:
            return empty_pairs
        iu, ju = np.triu_indices(len(ids), k=1)
        return pa.table({"doc_a": pa.array(ids[iu]),
                         "doc_b": pa.array(ids[ju])})

    pairs = sig.map_batches(band_rows, batch_format="pyarrow") \
        .groupby(["j", "k1", "k2"]) \
        .map_groups(bucket_pairs, batch_format="pyarrow") \
        .groupby(["doc_a", "doc_b"]) \
        .map_groups(lambda g: g[:1], batch_format="pyarrow")
    pairs = with_schema(pairs, pa.schema([("doc_a", pa.int64()),
                                          ("doc_b", pa.int64())]))

    # with_schema on the renamed signature sides: map_groups emits
    # schema-less zero-row blocks on sparse corpora, which crash the
    # Dataset.join finalize (see util.with_schema)
    sig_a = with_schema(
        sig.map_batches(
            lambda b: b.rename_columns(
                ["doc_a"] + [f"a{j}" for j in range(K)]),
            batch_format="pyarrow"),
        pa.schema([("doc_a", pa.int64())]
                  + [(f"a{j}", pa.int64()) for j in range(K)]))
    sig_b = with_schema(
        sig.map_batches(
            lambda b: b.rename_columns(
                ["doc_b"] + [f"b{j}" for j in range(K)]),
            batch_format="pyarrow"),
        pa.schema([("doc_b", pa.int64())]
                  + [(f"b{j}", pa.int64()) for j in range(K)]))
    half = with_schema(
        pairs.join(sig_a, join_type="inner", num_partitions=8,
                   on=("doc_a",)),
        pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())]
                  + [(f"a{j}", pa.int64()) for j in range(K)]))
    full = half.join(sig_b, join_type="inner",
                     num_partitions=8, on=("doc_b",))

    def score(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "n_match": pa.array([], pa.int64()),
                             "est_sim": pa.array([], pa.float64())})
        nm = np.zeros(b.num_rows, np.int64)
        for j in range(K):
            nm += (b.column(f"a{j}").to_numpy(zero_copy_only=False)
                   == b.column(f"b{j}").to_numpy(zero_copy_only=False))
        return pa.table({
            "doc_a": b.column("doc_a"),
            "doc_b": b.column("doc_b"),
            "n_match": pa.array(nm),
            "est_sim": pa.array(nm.astype(np.float64) / 8.0),
        })

    return full.map_batches(score, batch_format="pyarrow")


def q_documents_minhash_pr(sf_dir: str) -> pa.Table:
    """Precision/recall evaluation of the PRODUCTION MinHash/LSH
    near-dup path against the exact-Jaccard ground truth — the eval
    every approximate dedup deployment owes its users.  Ground truth =
    q_documents_jaccard_pairs (word-3-gram Jaccard ≥ 0.5, the exact
    oracle kernel); prediction = the crc-hashed banded-LSH pairs of
    minhash_dedup_pairs at the same threshold.  One row: tp/fp/fn as
    exact ints, precision/recall/f1 as the three final divisions.

    Both pair sets are structurally bounded (near-dup pairs above a
    0.5 threshold, the same cardinality class as every candidate-pair
    take_all in the catalog), so the set algebra runs on the driver."""
    from ..stages.dedup import minhash_dedup_pairs

    truth_t = _small_table(q_documents_jaccard_pairs(sf_dir))
    truth = set()
    if truth_t is not None:
        truth = {(min(a, b), max(a, b)) for a, b in
                 zip(truth_t.column("id_a").to_pylist(),
                     truth_t.column("id_b").to_pylist())}

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    pred_t = _small_table(
        minhash_dedup_pairs(ds, "doc_id", threshold=0.5, verify="join"))
    pred = set()
    if pred_t is not None:
        cols = pred_t.column_names
        a_col = "id_a" if "id_a" in cols else cols[0]
        b_col = "id_b" if "id_b" in cols else cols[1]
        pred = {(min(a, b), max(a, b)) for a, b in
                zip(pred_t.column(a_col).to_pylist(),
                    pred_t.column(b_col).to_pylist())}

    tp = len(truth & pred)
    fp = len(pred - truth)
    fn = len(truth - pred)
    prec = float(tp) / float(tp + fp) if tp + fp else 1.0
    rec = float(tp) / float(tp + fn) if tp + fn else 1.0
    f1 = (2.0 * prec * rec / (prec + rec)) if prec + rec else 0.0
    return pa.table({
        "tp": pa.array([tp], pa.int64()),
        "fp": pa.array([fp], pa.int64()),
        "fn": pa.array([fn], pa.int64()),
        "precision": pa.array([prec], pa.float64()),
        "recall": pa.array([rec], pa.float64()),
        "f1": pa.array([f1], pa.float64()),
    })


# ---------------------------------------------------------------------------
# Graph family, part 2 (round 4, session 11): k-core peel + BFS hops.
# Both run on the shared market-basket co-purchase graph
# (_copurchase_edges) and both are ITERATIVE graph algorithms whose
# DuckDB twins are bounded recursive-CTE replays — the pattern the
# Markov / logistic-GD oracles established, extended here to edge-set
# fixpoints (window functions ARE allowed in DuckDB's recursive term,
# which gives per-iteration degrees without a second self-reference).
# Like connected_components, both are hybrid: the peel/frontier loop
# runs vectorized on the driver while the edge set fits one machine
# (≤ GRAPH_DRIVER_EDGE_CAP, the union-find precedent), and a
# broadcast-state distributed loop with identical semantics beyond —
# parity between the two paths is pytest-pinned.
# ---------------------------------------------------------------------------

#: Edge-count ceiling for the driver-side vectorized peel / BFS paths
#: (the connected_components union-find precedent: 5M edges ≈ 80 MB of
#: int64 pairs).  Beyond it the broadcast-state distributed loops run.
GRAPH_DRIVER_EDGE_CAP = 5_000_000

#: k-core order.  75 sits inside the observed degree band of the
#: co-purchase graph at every test scale (min≈40, median≈115,
#: max≈222), so the peel genuinely cascades: sf0.01 converges in 4
#: rounds peeling 62 parts; sf0.001's graph collapses entirely (the
#: empty-core path is exercised by the sweep, nonempty by the planted
#: pytest corpus).
KCORE_K = 75

#: Iteration bound for the k-core peel — 4× the deepest observed
#: convergence (4 rounds at K=75; the K=85 transition region measured
#: 38, which is why the bound is asserted loudly rather than silently
#: truncated).  The SQL twin replays exactly this many iterations;
#: once the peel reaches fixpoint every further iteration re-emits the
#: same edge set, so early-break == bound-replay.
KCORE_MAX_ITERS = 16

#: Hop bound for the BFS distance histogram (graph diameter at every
#: test scale is ≤ 3; the engine asserts the frontier empties before
#: the bound so the oracle's bounded recursion sees every true
#: distance).
BFS_MAX_HOPS = 12


def _edge_arrays(edges: Dataset):
    """Driver-side (id_a, id_b) int64 numpy arrays of a materialized
    edge Dataset (bounded by GRAPH_DRIVER_EDGE_CAP at call sites)."""
    import numpy as np

    blocks = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
    if not blocks:
        return (np.array([], np.int64), np.array([], np.int64))
    t = pa.concat_tables(blocks)
    return (t.column("id_a").to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False),
            t.column("id_b").to_numpy(zero_copy_only=False).astype(
                np.int64, copy=False))


def _kcore_core_degrees(sf_dir: str, k: int = KCORE_K,
                        driver_edge_cap: int = GRAPH_DRIVER_EDGE_CAP,
                        max_iters: int = KCORE_MAX_ITERS):
    """(p, core_degree) pyarrow table of the k-core of the co-purchase
    graph: iteratively delete every node with degree < k until
    fixpoint; core_degree = degree inside the surviving subgraph.
    Driver path: one numpy bincount per round over the (≤ cap) edge
    arrays.  Distributed path: per round, ONE bounded per-node degree
    combine (the node table is dim-sized — the pagerank/kmeans
    broadcast trade) and one broadcast dead-set filter pass over the
    edge Dataset; the edge set only ever shrinks.  Raises loudly if
    the peel hasn't converged within ``max_iters`` (the SQL twin
    replays exactly that many rounds, and fixpoint re-emission makes
    early-break ≡ bound-replay)."""
    import numpy as np

    edges = _copurchase_edges(sf_dir)
    empty = pa.table({"p": pa.array([], pa.int64()),
                      "core_degree": pa.array([], pa.int64())})
    if edges.count() <= driver_edge_cap:
        a, b = _edge_arrays(edges)
        if not len(a):
            return empty
        nmax = int(max(a.max(), b.max())) + 1
        alive = np.ones(len(a), bool)
        for it in range(max_iters + 1):
            deg = np.bincount(a[alive], minlength=nmax) \
                + np.bincount(b[alive], minlength=nmax)
            dead = (deg > 0) & (deg < k)
            if not dead.any():
                break
            if it == max_iters:
                raise RuntimeError(
                    f"k-core peel did not converge in {max_iters} "
                    f"rounds (K={k}); raise KCORE_MAX_ITERS and keep "
                    "the SQL twin's bound in lockstep")
            alive &= ~(dead[a] | dead[b])
        deg = np.bincount(a[alive], minlength=nmax) \
            + np.bincount(b[alive], minlength=nmax)
        p = np.nonzero(deg > 0)[0]
        if not len(p):
            return empty
        return pa.table({"p": pa.array(p.astype(np.int64), pa.int64()),
                         "core_degree": pa.array(deg[p].astype(np.int64),
                                                 pa.int64())})

    # Distributed peel: identical semantics, edge set stays a Dataset.
    for it in range(max_iters + 1):
        deg_t = _small_table(_copurchase_degrees(edges).materialize())
        if deg_t is None:
            return empty
        d = deg_t.column("degree").to_numpy(zero_copy_only=False)
        nodes = deg_t.column("p").to_numpy(zero_copy_only=False)
        dead = np.sort(nodes[d < k])
        if not len(dead):
            break
        if it == max_iters:
            raise RuntimeError(
                f"k-core peel did not converge in {max_iters} rounds "
                f"(K={k}); raise KCORE_MAX_ITERS and keep the SQL "
                "twin's bound in lockstep")
        dead_ref = ray.put(dead)

        def drop_dead(batch: pa.Table) -> pa.Table:
            dd = ray.get(dead_ref)
            ia = batch.column("id_a").to_numpy(zero_copy_only=False)
            ib = batch.column("id_b").to_numpy(zero_copy_only=False)
            pos_a = np.searchsorted(dd, ia)
            pos_b = np.searchsorted(dd, ib)
            hit_a = (pos_a < len(dd)) & (
                dd[np.minimum(pos_a, len(dd) - 1)] == ia)
            hit_b = (pos_b < len(dd)) & (
                dd[np.minimum(pos_b, len(dd) - 1)] == ib)
            return batch.filter(pa.array(~(hit_a | hit_b)))

        edges = edges.map_batches(
            drop_dead, batch_format="pyarrow").materialize()

    deg_t = _small_table(_copurchase_degrees(edges).materialize())
    if deg_t is None:
        return empty
    order = np.argsort(deg_t.column("p").to_numpy(zero_copy_only=False))
    return pa.table({
        "p": pa.array(deg_t.column("p").take(pa.array(order)), pa.int64()),
        "core_degree": pa.array(
            deg_t.column("degree").take(pa.array(order)), pa.int64()),
    })


def q_parts_copurchase_kcore(sf_dir: str) -> Dataset:
    """K-core decomposition (K=75) of the part co-purchase graph:
    (p, core_degree) for every part surviving the iterative
    min-degree peel.  The DuckDB twin replays the peel as a bounded
    recursive CTE whose per-iteration degrees come from window
    functions INSIDE the recursive term (both endpoint roles, so the
    CTE self-reference stays single)."""
    import numpy as np  # noqa: F401  (used by the shared helpers)

    return rd.from_arrow(_kcore_core_degrees(sf_dir))


def _bfs_hops(sf_dir: str,
              driver_edge_cap: int = GRAPH_DRIVER_EDGE_CAP,
              max_hops: int = BFS_MAX_HOPS):
    """(hops, n_parts) histogram of BFS distance from the minimum part
    id holding an edge, plus a (-1, n) row for unreachable parts when
    any exist.  Driver path: vectorized frontier expansion over sorted
    edge arrays.  Distributed path: per round, broadcast the (visited,
    frontier) sorted arrays, ONE pass over the edge Dataset emitting
    unseen neighbors, one bounded distinct combine.  Asserts the
    frontier empties within ``max_hops`` (the twin's recursion bound)."""
    import numpy as np

    edges = _copurchase_edges(sf_dir)
    empty = pa.table({"hops": pa.array([], pa.int64()),
                      "n_parts": pa.array([], pa.int64())})
    n_edges = edges.count()
    if n_edges == 0:
        return empty

    if n_edges <= driver_edge_cap:
        a, b = _edge_arrays(edges)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        nodes = np.unique(src)
        seed = int(nodes.min())
        dist = {}
        frontier = np.array([seed], np.int64)
        dist_vals = [(seed, 0)]
        seen = {seed}
        for hop in range(1, max_hops + 2):
            lo = np.searchsorted(src, frontier, side="left")
            hi = np.searchsorted(src, frontier, side="right")
            if not len(frontier):
                break
            if hop == max_hops + 1:
                raise RuntimeError(
                    f"BFS frontier still nonempty after {max_hops} "
                    "hops; raise BFS_MAX_HOPS and keep the SQL twin's "
                    "bound in lockstep")
            nbrs = np.unique(np.concatenate(
                [dst[s:e] for s, e in zip(lo, hi)])) if len(lo) else \
                np.array([], np.int64)
            fresh = np.array([x for x in nbrs.tolist()
                              if x not in seen], np.int64)
            for x in fresh.tolist():
                seen.add(x)
                dist_vals.append((x, hop))
            frontier = fresh
        reached = len(dist_vals)
        hops = np.array([h for _, h in dist_vals], np.int64)
        vals, cnts = np.unique(hops, return_counts=True)
        rows_h = list(zip(vals.tolist(), cnts.tolist()))
        unreached = int(len(nodes)) - reached
        if unreached > 0:
            rows_h = [(-1, unreached)] + rows_h
        return pa.table({
            "hops": pa.array([h for h, _ in rows_h], pa.int64()),
            "n_parts": pa.array([c for _, c in rows_h], pa.int64())})

    # Distributed frontier loop: broadcast (visited, frontier) arrays,
    # one edge pass per hop.
    deg_t = _small_table(_copurchase_degrees(edges).materialize())
    all_nodes = np.sort(deg_t.column("p").to_numpy(zero_copy_only=False))
    seed = int(all_nodes.min())
    visited = np.array([seed], np.int64)
    frontier = np.array([seed], np.int64)
    hop_rows = [(0, 1)]
    for hop in range(1, max_hops + 2):
        if not len(frontier):
            break
        if hop == max_hops + 1:
            raise RuntimeError(
                f"BFS frontier still nonempty after {max_hops} hops; "
                "raise BFS_MAX_HOPS and keep the SQL twin's bound in "
                "lockstep")
        state_ref = ray.put((np.sort(visited), np.sort(frontier)))

        def fresh_nbrs(batch: pa.Table) -> pa.Table:
            vis, fr = ray.get(state_ref)
            ia = batch.column("id_a").to_numpy(zero_copy_only=False)
            ib = batch.column("id_b").to_numpy(zero_copy_only=False)
            out = []
            for s_arr, d_arr in ((ia, ib), (ib, ia)):
                pos = np.searchsorted(fr, s_arr)
                on_f = (pos < len(fr)) & (
                    fr[np.minimum(pos, len(fr) - 1)] == s_arr)
                cand = d_arr[on_f]
                pos_v = np.searchsorted(vis, cand)
                new = cand[~((pos_v < len(vis)) & (
                    vis[np.minimum(pos_v, len(vis) - 1)] == cand))]
                out.append(np.unique(new))
            return pa.table({"p": pa.array(
                np.unique(np.concatenate(out)), pa.int64())})

        nb = with_schema(
            edges.map_batches(fresh_nbrs, batch_format="pyarrow")
            .groupby("p").aggregate(Count("p", alias_name="_n")),
            pa.schema([("p", pa.int64()), ("_n", pa.int64())]))
        nb_t = _small_table(nb.materialize())
        fresh = np.sort(nb_t.column("p").to_numpy(
            zero_copy_only=False)) if nb_t is not None else \
            np.array([], np.int64)
        if len(fresh):
            hop_rows.append((hop, int(len(fresh))))
        visited = np.union1d(visited, fresh)
        frontier = fresh
    unreached = int(len(all_nodes)) - int(len(visited))
    if unreached > 0:
        hop_rows = [(-1, unreached)] + hop_rows
    return pa.table({
        "hops": pa.array([h for h, _ in hop_rows], pa.int64()),
        "n_parts": pa.array([c for _, c in hop_rows], pa.int64())})


def q_parts_copurchase_bfs(sf_dir: str) -> Dataset:
    """BFS hop-distance histogram from the minimum edged part id over
    the co-purchase graph, with a hops=-1 row counting unreachable
    parts (emitted only when some exist).  The DuckDB twin is the
    canonical recursive-CTE shortest-path BFS under UNION (distinct)
    semantics, MIN(dist) per node, bounded at the same hop cap the
    engine asserts convergence under."""
    return rd.from_arrow(_bfs_hops(sf_dir))


# ---------------------------------------------------------------------------
# Sequential testing + empirical-Bayes shrinkage (round 4, session 11).
# ---------------------------------------------------------------------------

#: SPRT llr increments in micro-nats, H0: p=1/4 vs H1: p=1/2 on the
#: high-value indicator: round(ln(2)·1e6) and round(ln(2/3)·1e6).  The
#: walk is EXACT int64 — the float log never exists in-engine; the SQL
#: twin carries the identical integer constants.
SPRT_INC_S = 693147
SPRT_INC_F = -405465
#: Wald thresholds ±ln(19)·1e6 (α = β = 0.05).
SPRT_A = 2944439


def q_events_sprt(sf_dir: str) -> Dataset:
    """Wald SPRT replay per event type: walk the int64-quantized
    log-likelihood ratio over events ordered by (ts, event_id) —
    success = value > $100 — and report the first boundary crossing
    (accept_h1 / accept_h0) or 'continue'.  The walk is sequential by
    definition, so each type's ordered cumsum runs vectorized inside
    ONE map_groups task (the per-type stream fits a task at every test
    scale; at web scale the same walk distributes as the classic
    two-pass prefix sum — per-block partials, driver exclusive scan,
    broadcast offsets — because the increments are associative ints).
    The DuckDB twin is the identical window cumsum."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_id", "ts", "event_type",
                                  "value"])

    def project(b: pa.Table) -> pa.Table:
        cents = scaled_int_sql(b.column("value"), 100.0)
        inc = np.where(np.asarray(cents) > 10000,
                       np.int64(SPRT_INC_S), np.int64(SPRT_INC_F))
        return pa.table({
            "event_type": b.column("event_type"),
            "ts": b.column("ts"),
            "event_id": b.column("event_id"),
            "inc": pa.array(inc, pa.int64()),
        })

    def walk(g: pa.Table) -> pa.Table:
        ts = g.column("ts").to_numpy(zero_copy_only=False)
        eid = g.column("event_id").to_numpy(zero_copy_only=False)
        inc = g.column("inc").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        inc = inc[order]
        cum = np.cumsum(inc)
        crossed = np.nonzero((cum >= SPRT_A) | (cum <= -SPRT_A))[0]
        if len(crossed):
            i = int(crossed[0])
            stop_n = i + 1
            llr_q = int(cum[i])
            decision = "accept_h1" if llr_q >= SPRT_A else "accept_h0"
        else:
            stop_n = 0
            llr_q = int(cum[-1]) if len(cum) else 0
            decision = "continue"
        return pa.table({
            "event_type": pa.array([g.column("event_type")[0].as_py()],
                                   pa.string()),
            "n_events": pa.array([len(inc)], pa.int64()),
            "n_success": pa.array([int((inc == SPRT_INC_S).sum())],
                                  pa.int64()),
            "decision": pa.array([decision], pa.string()),
            "stop_n": pa.array([stop_n], pa.int64()),
            "llr_q": pa.array([llr_q], pa.int64()),
        })

    return ds.map_batches(project, batch_format="pyarrow") \
        .groupby("event_type").map_groups(walk, batch_format="pyarrow")


def q_supplier_eb_shrinkage(sf_dir: str) -> Dataset:
    """Empirical-Bayes beta-binomial shrinkage of per-supplier return
    rates (the multi-armed ranking staple: small-n suppliers shrink
    toward the corpus prior instead of topping the leaderboard on one
    lucky return).  Per-supplier (n, k) ride ONE partial-agg combine;
    the method-of-moments prior is fitted on rates quantized to
    integer ppm (r_q = k·1e6 // n — floor division, EXACT both
    sides), so the moment sums are order-independent int64 and the
    only floats are the final prior/posterior expressions, replayed
    operand-by-operand.  Output: top 20 by shrunk rate.  Raises
    loudly on a zero-variance rate field (the prior is undefined
    there, and a silent ±inf would poison the ranking)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_suppkey", "l_returnflag"])

    def partial(b: pa.Table) -> pa.Table:
        ret = pc.cast(pc.equal(b.column("l_returnflag"), "R"),
                      pa.int64())
        t = pa.table({"s": b.column("l_suppkey"),
                      "p_n": pa.array(np.ones(b.num_rows, np.int64)),
                      "p_k": ret})
        g = t.group_by("s").aggregate([("p_n", "sum"), ("p_k", "sum")])
        return g.rename_columns(["s", "p_n", "p_k"])

    per = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("s").aggregate(Sum("p_n", alias_name="n"),
                                Sum("p_k", alias_name="k")),
        pa.schema([("s", pa.int64()), ("n", pa.int64()),
                   ("k", pa.int64())]))

    t = _small_table(per.materialize())  # dim-sized: suppliers
    n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    k = t.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
    s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
    r_q = k * 1_000_000 // n
    n_sup = len(s)
    sum_r = int(r_q.sum())
    sum_r2 = int((r_q * r_q).sum())

    # MoM prior, every float op replayed token-for-token in the twin.
    m_f = float(sum_r) / float(n_sup) / 1000000.0
    v_f = (float(sum_r2) / float(n_sup)
           - (float(sum_r) / float(n_sup))
           * (float(sum_r) / float(n_sup))) / 1000000000000.0
    if not v_f > 0.0:
        raise RuntimeError(
            "eb_shrinkage: zero variance across supplier return "
            "rates; the beta prior is undefined on this corpus")
    k0 = m_f * (1.0 - m_f) / v_f - 1.0
    alpha = m_f * k0
    beta = (1.0 - m_f) * k0

    shrunk = (k.astype(np.float64) + alpha) \
        / ((n.astype(np.float64) + alpha) + beta)
    order = np.lexsort((s, -shrunk))[:20]
    return rd.from_arrow(pa.table({
        "suppkey": pa.array(s[order], pa.int64()),
        "n_items": pa.array(n[order], pa.int64()),
        "n_returns": pa.array(k[order], pa.int64()),
        "rate_ppm": pa.array(r_q[order], pa.int64()),
        "alpha": pa.array(np.full(len(order), alpha), pa.float64()),
        "beta": pa.array(np.full(len(order), beta), pa.float64()),
        "shrunk_rate": pa.array(shrunk[order], pa.float64()),
    }))


#: Fixed power-iteration count for eigenvector centrality (the replayed
#: spec, not a convergence target — 8 rounds separates the hub ranking
#: clearly at every test scale and the twin replays exactly 8).
EIGEN_ITERS = 8


def q_parts_copurchase_eigencentrality(sf_dir: str) -> Dataset:
    """Eigenvector centrality of the co-purchase graph (HITS on an
    undirected graph collapses to this — hubs ≡ authorities): 8
    max-normalized power-iteration rounds, ENTIRELY in integer
    arithmetic — x' = Σ_nbr x is an exact int64 sum and the
    normalization x'·1e9 // max(x') is floor division (driver side in
    arbitrary-precision Python ints, twin side in HUGEINT) — so unlike
    PageRank's float ranks this iterative fixpoint sits under the
    bit-exact SQL gate, replayed as a recursive CTE with GROUP BY +
    a window MAX inside the recursive term.  Per iteration: ONE edge
    pass against the broadcast score vector (node-sized driver state,
    the documented pagerank/kmeans trade).  Top 20 by score."""
    import numpy as np

    edges = _copurchase_edges(sf_dir)
    deg_t = _small_table(_copurchase_degrees(edges).materialize())
    empty = pa.table({"p": pa.array([], pa.int64()),
                      "score_ppb": pa.array([], pa.int64())})
    if deg_t is None:
        return rd.from_arrow(empty)
    node_ids = np.sort(deg_t.column("p").to_numpy(zero_copy_only=False))
    n = len(node_ids)
    x = np.full(n, 1_000_000_000, np.int64)

    for _ in range(EIGEN_ITERS):
        state = ray.put((node_ids, x))

        def contrib(b: pa.Table) -> pa.Table:
            ids, xv = ray.get(state)
            a = np.searchsorted(
                ids, b.column("id_a").to_numpy(zero_copy_only=False))
            bb = np.searchsorted(
                ids, b.column("id_b").to_numpy(zero_copy_only=False))
            g = pa.table({
                "i": pa.array(np.concatenate([bb, a]), pa.int64()),
                "q": pa.array(np.concatenate([xv[a], xv[bb]]),
                              pa.int64()),
            }).group_by("i").aggregate([("q", "sum")])
            return g.rename_columns(["i", "p_q"])

        agg = _small_table(_tree_combine(
            edges.map_batches(contrib, batch_format="pyarrow"),
            ["i"], [("p_q", "sum")], ["i", "p_q"],
            ["i", "sx"]).materialize())
        y = np.zeros(n, np.int64)
        y[agg.column("i").to_numpy(zero_copy_only=False)] = \
            agg.column("sx").to_numpy(zero_copy_only=False)
        # x'·1e9 overflows int64 (Σ_nbr x ≤ deg·1e9 ≈ 2e11), so the
        # normalize step runs in Python ints — n is dim-sized.
        mx = int(y.max())
        x = np.array([int(v) * 1_000_000_000 // mx
                      for v in y.tolist()], np.int64)

    order = np.lexsort((node_ids, -x))[:20]
    return rd.from_arrow(pa.table({
        "p": pa.array(node_ids[order], pa.int64()),
        "score_ppb": pa.array(x[order], pa.int64()),
    }))


#: MMR spec: candidate pool size, selections, and the relevance /
#: diversity mix (λ = 0.5 → score = 0.5·rel − 0.5·max_sel_sim).
MMR_POOL = 30
MMR_K = 10


def q_embeddings_mmr(sf_dir: str) -> pa.Table:
    """Maximal Marginal Relevance diversified retrieval (the RAG
    context-selection staple): greedy-select MMR_K of the MMR_POOL
    most-query-similar vectors, each step maximizing
    0.5·rel − 0.5·max-sim-to-already-selected.  Query = vec_id 0.
    Determinism contract: every cosine is ROUND(·, 6) BEFORE any
    comparison (the ann_topk convention), ties break on vec_id, so
    the greedy path is a pure function of the corpus and the DuckDB
    twin replays it as a recursive CTE carrying the selected list
    (QUALIFY ROW_NUMBER argmax per step).  Scale shape: the corpus is
    touched ONCE by the rel scan (per-batch tie-widened top-POOL, the
    topk_combine discipline); the greedy loop runs on the POOL-sized
    driver table."""
    import numpy as np
    import pyarrow.parquet as pq
    from ..util import vec_matrix

    qtab = pq.read_table(_t(sf_dir, "embeddings"),
                         filters=[("vec_id", "=", 0)],
                         columns=["embedding"])
    qvec = np.asarray(qtab.column("embedding").to_pylist()[0],
                      np.float64)
    qref = ray.put(qvec)

    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    def local_pool(b: pa.Table) -> pa.Table:
        q = ray.get(qref)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        keep = ids != 0
        mat = vec_matrix(b.column("embedding"))[keep]
        ids = ids[keep]
        if not len(ids):
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "rel": pa.array([], pa.float64())})
        # DuckDB's cosine shape: dot / (|a|·|q|), then ROUND 6 —
        # rounding happens BEFORE the top-k cut so the pool boundary
        # is decided on the same values the twin orders by.
        norms = np.sqrt((mat * mat).sum(axis=1))
        rel = np.array([round_sql_f(v, 6) for v in
                        (mat @ q) / (norms * float(np.sqrt(q @ q)))])
        order = np.lexsort((ids, -rel))
        if len(order) > MMR_POOL:
            cut = rel[order[MMR_POOL - 1]]
            order = order[rel[order] >= cut]  # tie-widened local top-k
        return pa.table({"vec_id": pa.array(ids[order], pa.int64()),
                         "rel": pa.array(rel[order], pa.float64())})

    cand = _small_table(
        ds.map_batches(local_pool, batch_format="pyarrow")
        .materialize())
    ids = cand.column("vec_id").to_numpy(zero_copy_only=False)
    rel = cand.column("rel").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -rel))[:MMR_POOL]
    pool_ids = ids[order]
    pool_rel = rel[order]

    ptab = pq.read_table(
        _t(sf_dir, "embeddings"),
        filters=[("vec_id", "in", pool_ids.tolist())],
        columns=["vec_id", "embedding"]).sort_by("vec_id")
    pid_sorted = ptab.column("vec_id").to_numpy(zero_copy_only=False)
    pmat = vec_matrix(ptab.column("embedding"))
    pos = np.searchsorted(pid_sorted, pool_ids)
    pmat = pmat[pos]  # rows aligned with pool_ids
    pnorm = np.sqrt((pmat * pmat).sum(axis=1))
    sim = (pmat @ pmat.T) / np.outer(pnorm, pnorm)
    sim = np.vectorize(lambda v: round_sql_f(v, 6))(sim)

    n = len(pool_ids)
    selected: list[int] = []
    rows = []
    remaining = np.ones(n, bool)
    for step in range(1, MMR_K + 1):
        if not remaining.any():
            break  # pool exhausted — the twin's recursion stops too
        if step == 1:
            scores = pool_rel.copy()
            maxs = np.full(n, np.nan)
        else:
            maxs = sim[:, selected].max(axis=1)
            scores = 0.5 * pool_rel - 0.5 * maxs
        scores_m = np.where(remaining, scores, -np.inf)
        # argmax with vec_id tiebreak
        best = np.lexsort((pool_ids, -scores_m))[0]
        rows.append((step, int(pool_ids[best]), float(pool_rel[best]),
                     None if step == 1 else float(maxs[best]),
                     float(scores[best])))
        selected.append(best)
        remaining[best] = False

    return pa.table({
        "step": pa.array([r[0] for r in rows], pa.int64()),
        "vec_id": pa.array([r[1] for r in rows], pa.int64()),
        "rel": pa.array([r[2] for r in rows], pa.float64()),
        "maxsim": pa.array([r[3] for r in rows], pa.float64()),
        "score": pa.array([r[4] for r in rows], pa.float64()),
    })


#: Parity-merge round bound for the isotonic PAV replay: odd-even
#: pairwise pooling makes progress every two rounds, so 2·(#days)+pad
#: covers any 30-day corpus many times over; the engine raises loudly
#: if violations survive the bound (they would mean a day grid far
#: beyond the corpus spec, and the twin replays exactly this bound).
PAV_ROUNDS = 80


def q_events_isotonic_daily(sf_dir: str) -> Dataset:
    """Isotonic (monotone non-decreasing) regression of the daily
    value-cents totals via pool-adjacent-violators, replayed exactly:
    odd-even parity rounds merge each eligible adjacent pair whose
    means violate (psy·n > sy·pn — cross-multiplied EXACT ints, no
    float mean ever compared), so disjoint merges commute and the
    DuckDB twin replays the identical schedule as a recursive CTE
    (LAG + ROW_NUMBER parity inside the recursive term).  PAV's
    fixpoint is merge-order-independent, so the parity schedule
    reaches the canonical solution — pinned against an exact
    Fraction-arithmetic reference PAV in pytest.  Output: one row per
    final pool; the only float is the final mean division.  Scale
    shape: ONE bounded (day) combine; the loop runs on the
    calendar-sized final block."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day")
        cents = scaled_int_sql(b.column("value"), 100.0)
        t = pa.table({"day": day, "p_sy": pa.array(cents, pa.int64())})
        g = t.group_by("day").aggregate([("p_sy", "sum")])
        return g.rename_columns(["day", "p_sy"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], [("p_sy", "sum")], ["day", "p_sy"], ["day", "sy"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("day", "ascending")])
        days = b.column("day").to_numpy(zero_copy_only=False)
        pools = [(i, int(v), 1) for i, v in enumerate(
            b.column("sy").to_numpy(zero_copy_only=False))]
        for it in range(PAV_ROUNDS):
            merged = []
            i = 0
            while i < len(pools):
                # rn is 1-based; the pair (rn, rn+1) merges when the
                # RIGHT element has (rn+1 + it) % 2 == 0 and violates.
                rn = i + 1
                if (i + 1 < len(pools)
                        and (rn + 1 + it) % 2 == 0
                        and pools[i][1] * pools[i + 1][2]
                        > pools[i + 1][1] * pools[i][2]):
                    s, sy, n = pools[i]
                    _, sy2, n2 = pools[i + 1]
                    merged.append((s, sy + sy2, n + n2))
                    i += 2
                else:
                    merged.append(pools[i])
                    i += 1
            pools = merged
            if all(pools[j][1] * pools[j + 1][2]
                   <= pools[j + 1][1] * pools[j][2]
                   for j in range(len(pools) - 1)):
                break
        else:
            raise RuntimeError(
                f"PAV did not converge in {PAV_ROUNDS} parity rounds; "
                "raise PAV_ROUNDS and keep the SQL twin's bound in "
                "lockstep")
        return pa.table({
            "start_day": pa.array([days[s] for s, _, _ in pools],
                                  b.column("day").type),
            "n_days": pa.array([n for _, _, n in pools], pa.int64()),
            "sum_cents": pa.array([sy for _, sy, _ in pools],
                                  pa.int64()),
            "fitted": pa.array([float(sy) / float(n)
                                for _, sy, n in pools], pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_documents_chao1(sf_dir: str) -> Dataset:
    """Chao1 species-richness estimate per source feed (Chao 1984,
    bias-corrected form): how many DISTINCT words the feed likely has,
    observed + f1(f1−1)/(2(f2+1)) from the singleton/doubleton counts
    — the vocabulary-coverage companion to documents_gt_unseen (how
    much mass is unseen vs how many TYPES are unseen).  Same scale
    shape: the shared (source, tok) partial-count exchange, a bounded
    per-source tree combine over the distinct-term table, exact int64
    until the one final division."""
    import numpy as np

    tf = _source_term_counts(sf_dir)

    def src_partial(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy(zero_copy_only=False)
        t = pa.table({"source": b.column("source"),
                      "p_typ": pa.array(np.ones(len(c), np.int64)),
                      "p_f1": pa.array((c == 1).astype(np.int64)),
                      "p_f2": pa.array((c == 2).astype(np.int64))})
        g = t.group_by("source").aggregate(
            [("p_typ", "sum"), ("p_f1", "sum"), ("p_f2", "sum")])
        return g.rename_columns(["source", "p_typ", "p_f1", "p_f2"])

    agg = _tree_combine(
        tf.map_batches(src_partial, batch_format="pyarrow"),
        ["source"],
        [("p_typ", "sum"), ("p_f1", "sum"), ("p_f2", "sum")],
        ["source", "p_typ", "p_f1", "p_f2"],
        ["source", "v_obs", "f1", "f2"])

    def finish(b: pa.Table) -> pa.Table:
        v = b.column("v_obs").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        f1 = b.column("f1").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        f2 = b.column("f2").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        chao1 = v.astype(np.float64) \
            + (f1 * (f1 - 1)).astype(np.float64) \
            / (2 * (f2 + 1)).astype(np.float64)
        return pa.table({
            "source": b.column("source"),
            "v_obs": pa.array(v, pa.int64()),
            "f1": pa.array(f1, pa.int64()),
            "f2": pa.array(f2, pa.int64()),
            "chao1": round_sql(pa.array(chao1, pa.float64()), 6)})

    return _small_table(agg.map_batches(finish, batch_format="pyarrow",
                                        batch_size=None))


def q_parts_copurchase_assortativity(sf_dir: str) -> Dataset:
    """Degree assortativity of the co-purchase graph (Newman 2002):
    the Pearson correlation of endpoint degrees over the doubled
    (both-orientation) edge list — do popular parts co-sell with other
    popular parts?  Every moment (Σx, Σxy, Σx², M) is an EXACT int64
    accumulated on one edge pass against the broadcast degree vector;
    the correlation is one final float expression replayed
    operand-by-operand.  By symmetry of the doubled edge list the x
    and y moments coincide, so r = (M·Σxy − Σx²ₛᵤₘ) / (M·Σx² − (Σx)²)
    needs no sqrt at all — the denominator IS the variance."""
    import numpy as np

    edges = _copurchase_edges(sf_dir)
    deg_t = _small_table(_copurchase_degrees(edges).materialize())
    if deg_t is None:
        return rd.from_arrow(pa.table({
            "n_edges": pa.array([0], pa.int64()),
            "assortativity": pa.array([None], pa.float64())}))
    ids = np.sort(deg_t.column("p").to_numpy(zero_copy_only=False))
    dv = deg_t.column("degree").to_numpy(zero_copy_only=False)[
        np.argsort(deg_t.column("p").to_numpy(zero_copy_only=False))]
    dref = ray.put((ids, dv))

    def moments(b: pa.Table) -> pa.Table:
        idx, d = ray.get(dref)
        da = d[np.searchsorted(
            idx, b.column("id_a").to_numpy(zero_copy_only=False))]
        db = d[np.searchsorted(
            idx, b.column("id_b").to_numpy(zero_copy_only=False))]
        x = np.concatenate([da, db]).astype(np.int64)
        y = np.concatenate([db, da]).astype(np.int64)
        return pa.table({
            "p_m": pa.array([len(x)], pa.int64()),
            "p_sx": pa.array([int(x.sum())], pa.int64()),
            "p_sxx": pa.array([int((x * x).sum())], pa.int64()),
            "p_sxy": pa.array([int((x * y).sum())], pa.int64()),
        })

    agg = edges.map_batches(moments, batch_format="pyarrow") \
        .aggregate(Sum("p_m", alias_name="m"),
                   Sum("p_sx", alias_name="sx"),
                   Sum("p_sxx", alias_name="sxx"),
                   Sum("p_sxy", alias_name="sxy"))
    m = int(agg["m"])
    sx = int(agg["sx"])
    sxx = int(agg["sxx"])
    sxy = int(agg["sxy"])
    num = m * sxy - sx * sx
    den = m * sxx - sx * sx
    r = round_sql_f(float(num) / float(den), 6) if den else None
    return rd.from_arrow(pa.table({
        "n_edges": pa.array([m // 2], pa.int64()),
        "assortativity": pa.array([r], pa.float64()),
    }))


#: DBSCAN spec over the embedding space: neighbor iff raw cosine ≥
#: DBSCAN_EPS_SIM (the embeddings_neardup threshold convention), core
#: iff |N(p)| + 1 ≥ DBSCAN_MIN_PTS (self included, the classic rule).
DBSCAN_EPS_SIM = 0.35
DBSCAN_MIN_PTS = 4


def q_embeddings_dbscan(sf_dir: str) -> Dataset:
    """Density-based clustering (DBSCAN, cosine metric) — the
    density companion to the shipped k-means/silhouette family:
    core points have ≥ 4 neighbors at cosine ≥ 0.35 (self included),
    clusters are connected components of the core-core neighbor graph
    labeled by their MIN core vec_id, border points join the cluster
    of their MINIMUM-id adjacent core (the deterministic stand-in for
    classic DBSCAN's arrival-order border assignment), everything
    else is noise.  Output: (vec_id, role, cluster) with cluster NULL
    for noise.  Scale shape: the neighbor pairs come from the
    existing block-pair task grid (exact path; LSH is the scale
    variant), degrees ride one (id) combine, and the core-graph CC is
    the hybrid union-find / label-propagation stage."""
    import numpy as np

    from ..stages.dedup import connected_components, \
        embedding_neardup_pairs

    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])
    pairs = embedding_neardup_pairs(
        ds, threshold=DBSCAN_EPS_SIM).select_columns(["id_a", "id_b"]) \
        .materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        ids = pa.concat_arrays([b.column("id_a").combine_chunks(),
                                b.column("id_b").combine_chunks()])
        g = pa.table({"id": ids}).group_by("id").aggregate(
            [("id", "count")])
        return g.rename_columns(["id", "p_n"])

    deg = with_schema(
        pairs.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("id").aggregate(Sum("p_n", alias_name="nn")),
        pa.schema([("id", pa.int64()), ("nn", pa.int64())]))
    deg_t = _small_table(deg.materialize())
    if deg_t is not None:
        d_ids = deg_t.column("id").to_numpy(zero_copy_only=False)
        d_nn = deg_t.column("nn").to_numpy(zero_copy_only=False)
        order = np.argsort(d_ids)
        d_ids, d_nn = d_ids[order], d_nn[order]
        cores = np.sort(d_ids[d_nn + 1 >= DBSCAN_MIN_PTS])
    else:
        d_ids = np.array([], np.int64)
        cores = np.array([], np.int64)
    cores_ref = ray.put(cores)

    def is_core(arr: np.ndarray) -> np.ndarray:
        c = ray.get(cores_ref)
        pos = np.searchsorted(c, arr)
        return (pos < len(c)) & (c[np.minimum(pos, len(c) - 1)] == arr)

    def core_edges(b: pa.Table) -> pa.Table:
        ia = b.column("id_a").to_numpy(zero_copy_only=False)
        ib = b.column("id_b").to_numpy(zero_copy_only=False)
        keep = is_core(ia) & is_core(ib)
        return pa.table({"id_a": pa.array(ia[keep], pa.int64()),
                         "id_b": pa.array(ib[keep], pa.int64())})

    cc = _small_table(connected_components(
        pairs.map_batches(core_edges,
                          batch_format="pyarrow")).materialize())
    cluster_of: dict = {}
    if cc is not None:
        cluster_of = dict(zip(cc.column("id").to_pylist(),
                              cc.column("rep").to_pylist()))
    # isolated cores (≥ minPts neighbors but none of them core) are
    # their own singleton clusters
    for c in cores.tolist():
        cluster_of.setdefault(c, c)

    def border_partial(b: pa.Table) -> pa.Table:
        ia = b.column("id_a").to_numpy(zero_copy_only=False)
        ib = b.column("id_b").to_numpy(zero_copy_only=False)
        ca, cb = is_core(ia), is_core(ib)
        # non-core endpoint adjacent to a core: (point, core) rows
        pt = np.concatenate([ia[~ca & cb], ib[~cb & ca]])
        co = np.concatenate([ib[~ca & cb], ia[~cb & ca]])
        t = pa.table({"id": pa.array(pt, pa.int64()),
                      "p_c": pa.array(co, pa.int64())})
        g = t.group_by("id").aggregate([("p_c", "min")])
        return g.rename_columns(["id", "p_c"])

    btab = _small_table(with_schema(
        pairs.map_batches(border_partial, batch_format="pyarrow")
        .groupby("id").aggregate(Min("p_c", alias_name="near_core")),
        pa.schema([("id", pa.int64()),
                   ("near_core", pa.int64())])).materialize())
    border_of: dict = {}
    if btab is not None:
        border_of = dict(zip(btab.column("id").to_pylist(),
                             btab.column("near_core").to_pylist()))

    # Per-point labeling stays STREAMING: the corpus never lands on
    # the driver — only the (core → cluster) / (border → near-core)
    # maps do, and those are density-bounded, not corpus-sized.
    core_cluster = np.array([cluster_of[c] for c in cores.tolist()],
                            np.int64)
    b_ids = np.array(sorted(border_of), np.int64)
    b_cluster = np.array([cluster_of[border_of[i]]
                          for i in b_ids.tolist()], np.int64)
    lab_ref = ray.put((cores, core_cluster, b_ids, b_cluster))

    def label(b: pa.Table) -> pa.Table:
        cs, cc_arr, bi, bc = ray.get(lab_ref)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        pos_c = np.searchsorted(cs, ids)
        on_c = (pos_c < len(cs)) & (
            cs[np.minimum(pos_c, len(cs) - 1)] == ids)
        pos_b = np.searchsorted(bi, ids)
        on_b = (pos_b < len(bi)) & (
            bi[np.minimum(pos_b, len(bi) - 1)] == ids)
        role = np.where(on_c, "core", np.where(on_b, "border",
                                               "noise"))
        cl = np.zeros(len(ids), np.int64)
        cl[on_c] = cc_arr[pos_c[on_c]]
        cl[on_b & ~on_c] = bc[pos_b[on_b & ~on_c]]
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "role": pa.array(role.tolist(), pa.string()),
            "cluster": pa.array(
                np.ma.masked_array(cl, mask=~(on_c | on_b)).tolist(),
                pa.int64()),
        })

    return rd.read_parquet(_t(sf_dir, "embeddings"),
                           columns=["vec_id"]) \
        .map_batches(label, batch_format="pyarrow")


#: RBO spec: persistence p = 1/2 (exact power-of-two weights),
#: truncation depth 20, per-depth terms quantized at 1e15 so the sum
#: is order-independent int64.
RBO_DEPTH = 20


def q_supplier_rank_rbo(sf_dir: str) -> Dataset:
    """Rank-biased overlap (Webber et al. 2010) between the RAW
    per-supplier return-rate ranking and the EB-shrunk ranking — "how
    much did the prior change the leaderboard?", the standard
    top-weighted rank-similarity eval.  p = 1/2 makes every weight an
    exact power of two; each depth-d term (1−p)·p^(d−1)·(overlap/d)
    is an identical float expression both sides and is QUANTIZED to
    int64 femto-units before summing, so the total never depends on
    summation order.  Rankings ride the same one partial-agg combine
    as supplier_eb_shrinkage; the depth loop runs on the dim-sized
    driver table."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_suppkey", "l_returnflag"])

    def partial(b: pa.Table) -> pa.Table:
        ret = pc.cast(pc.equal(b.column("l_returnflag"), "R"),
                      pa.int64())
        t = pa.table({"s": b.column("l_suppkey"),
                      "p_n": pa.array(np.ones(b.num_rows, np.int64)),
                      "p_k": ret})
        g = t.group_by("s").aggregate([("p_n", "sum"), ("p_k", "sum")])
        return g.rename_columns(["s", "p_n", "p_k"])

    per = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("s").aggregate(Sum("p_n", alias_name="n"),
                                Sum("p_k", alias_name="k")),
        pa.schema([("s", pa.int64()), ("n", pa.int64()),
                   ("k", pa.int64())]))
    t = _small_table(per.materialize())
    n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    k = t.column("k").to_numpy(zero_copy_only=False).astype(np.int64)
    s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
    r_q = k * 1_000_000 // n
    n_sup = len(s)
    sum_r = int(r_q.sum())
    sum_r2 = int((r_q * r_q).sum())
    m_f = float(sum_r) / float(n_sup) / 1000000.0
    v_f = (float(sum_r2) / float(n_sup)
           - (float(sum_r) / float(n_sup))
           * (float(sum_r) / float(n_sup))) / 1000000000000.0
    if not v_f > 0.0:
        raise RuntimeError(
            "rank_rbo: zero variance across supplier return rates; "
            "the EB ranking is undefined on this corpus")
    k0 = m_f * (1.0 - m_f) / v_f - 1.0
    alpha = m_f * k0
    beta = (1.0 - m_f) * k0
    shrunk = (k.astype(np.float64) + alpha) \
        / ((n.astype(np.float64) + alpha) + beta)

    rank_a = np.empty(n_sup, np.int64)
    rank_a[np.lexsort((s, -r_q))] = np.arange(1, n_sup + 1)
    rank_b = np.empty(n_sup, np.int64)
    rank_b[np.lexsort((s, -shrunk))] = np.arange(1, n_sup + 1)

    acc_q = 0
    rows = []
    for d in range(1, RBO_DEPTH + 1):
        x = int(((rank_a <= d) & (rank_b <= d)).sum())
        term = 0.5 * (0.5 ** (d - 1)) * (float(x) / float(d))
        acc_q += int(round_sql_f(term * 1e15, 0))
        rows.append((d, x))
    return rd.from_arrow(pa.table({
        "depth": pa.array([RBO_DEPTH], pa.int64()),
        "overlap_at_depth": pa.array([rows[-1][1]], pa.int64()),
        "rbo_q": pa.array([acc_q], pa.int64()),
        "rbo": pa.array([float(acc_q) / 1e15], pa.float64()),
    }))


def q_documents_reliability_bins(sf_dir: str) -> Dataset:
    """Calibration / reliability table for the length-as-score
    classifier family (the eval companion to the stump and the exact
    AUC): documents binned by n_chars // 100, per-bin support, positive
    count, observed rate, and the bin's EXACT Brier contribution for
    the bin-rate predictor — Σ_docs (r_bin − y)² collapses to
    k(n−k)/n, carried as the pico-quantized integer
    k·(n−k)·1e12 // n so the global Brier is a plain integer sum the
    reader can take.  Scale shape: the shared bounded length-grid
    combine re-binned in one pass; rates are one float division each."""
    import numpy as np

    grid = _length_label_grid(sf_dir)

    def rebin(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False)
        t = pa.table({"band": pa.array(x // 100, pa.int64()),
                      "p_n": b.column("n"), "p_p": b.column("p")})
        g = t.group_by("band").aggregate([("p_n", "sum"),
                                          ("p_p", "sum")])
        return g.rename_columns(["band", "p_n", "p_p"])

    agg = _tree_combine(
        grid.map_batches(rebin, batch_format="pyarrow"),
        ["band"], [("p_n", "sum"), ("p_p", "sum")],
        ["band", "p_n", "p_p"], ["band", "n_docs", "n_pos"])

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_docs").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        k = b.column("n_pos").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "band": pc.cast(b.column("band"), pa.int64()),
            "n_docs": pa.array(n, pa.int64()),
            "n_pos": pa.array(k, pa.int64()),
            "rate": pa.array(k.astype(np.float64)
                             / n.astype(np.float64), pa.float64()),
            # Python ints: k·(n−k)·1e12 can pass 2^63 on a huge band,
            # where numpy would WRAP silently but DuckDB (and this
            # explicit int) raise loudly.
            "brier_q": pa.array(
                [int(kk) * int(nn - kk) * 1_000_000_000_000 // int(nn)
                 for kk, nn in zip(k.tolist(), n.tolist())],
                pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_events_locf_daily(sf_dir: str) -> Dataset:
    """LOCF forward fill (the time-series imputation staple the
    median-impute query doesn't cover): per user, the dense calendar
    grid over the corpus's global day span with each day's observed
    value-cents total, and missing days carrying the LAST observed
    total forward (days before a user's first observation stay NULL).
    Scale shape: ONE (user, day) partial-agg combine builds the
    observed table; the global day span is a bounded combine broadcast
    to every group; the fill itself is a vectorized
    maximum.accumulate gather inside per-user map_groups (users are
    the partitioning key — the NTILE/LAG co-location contract).  The
    DuckDB twin is the canonical cross-join grid +
    last_value(... IGNORE NULLS) window."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day")
        cents = scaled_int_sql(b.column("value"), 100.0)
        t = pa.table({"user_id": b.column("user_id"), "day": day,
                      "p_c": pa.array(cents, pa.int64())})
        g = t.group_by(["user_id", "day"]).aggregate([("p_c", "sum")])
        return g.rename_columns(["user_id", "day", "p_c"])

    obs = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "day"]).aggregate(
            Sum("p_c", alias_name="cents")),
        pa.schema([("user_id", pa.int64()),
                   ("day", pa.timestamp("us")),
                   ("cents", pa.int64())])).materialize()

    def day_partial(b: pa.Table) -> pa.Table:
        d = b.column("day").to_numpy(zero_copy_only=False)
        return pa.table({
            "lo": pa.array([d.min()], pa.timestamp("us")),
            "hi": pa.array([d.max()], pa.timestamp("us")),
        })

    span = [t for t in ray.get(
        obs.map_batches(day_partial, batch_format="pyarrow")
        .materialize().to_arrow_refs()) if t.num_rows]
    span_t = pa.concat_tables(span)
    lo = span_t.column("lo").to_numpy(zero_copy_only=False).min()
    hi = span_t.column("hi").to_numpy(zero_copy_only=False).max()
    grid = np.arange(lo, hi + np.timedelta64(1, "D"),
                     np.timedelta64(1, "D")).astype("datetime64[us]")
    grid_ref = ray.put(grid)

    def fill(g: pa.Table) -> pa.Table:
        days = ray.get(grid_ref)
        uid = g.column("user_id")[0].as_py()
        od = g.column("day").to_numpy(zero_copy_only=False)
        oc = g.column("cents").to_numpy(zero_copy_only=False)
        order = np.argsort(od)
        od, oc = od[order], oc[order]
        # index of the last observation at-or-before each grid day;
        # -1 = before the first observation (stays NULL)
        idx = np.searchsorted(od, days, side="right") - 1
        filled = np.where(idx >= 0, oc[np.maximum(idx, 0)], 0)
        is_obs = (idx >= 0) & (od[np.maximum(idx, 0)] == days)
        observed = np.where(is_obs, filled, 0)
        return pa.table({
            "user_id": pa.array(np.full(len(days), uid), pa.int64()),
            "day": pa.array(days, pa.timestamp("us")),
            "observed": pa.array(observed, pa.int64(),
                                 mask=~is_obs),
            "filled": pa.array(filled, pa.int64(), mask=idx < 0),
        })

    return obs.groupby("user_id").map_groups(fill,
                                             batch_format="pyarrow")


def q_embeddings_pq_recall(sf_dir: str, m: int = 8, k: int = 16,
                           iters: int = 3) -> pa.Table:
    """Product quantization (the FAISS-style ANN compression staple):
    train per-subspace codebooks (m=8 subspaces, k=16 centroids,
    Lloyd, the kmeans conventions — first-k-vec_id init, broadcast
    centroids, int64-quantized (subspace, cluster, dim) sum grid so
    training is block-layout-independent), encode every vector to m
    uint8 codes, and report asymmetric-distance (ADC) recall@5 against
    the exact L2 top-5 for the first 8 query vectors.  Rows-only
    (iterative training + approximate by design); the lossless-corpus
    pytest pins recall = 1.0 when the codebook can represent the
    corpus exactly.  Scale shape: training is one combined exchange
    per round (ALL subspaces ride the same grid), encode/ADC touch
    the corpus once per phase with broadcast state; only k×dim grids
    and 5-row candidates reach the driver."""
    import heapq

    import numpy as np
    import pyarrow.parquet as pqt
    from ..util import vec_matrix

    SCALE = float(1 << 30)
    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    seed_tab = _small_table(_topk_combine(
        ds, sorted_topk([("vec_id", "ascending")], k)))
    if seed_tab is None:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "n_hits": pa.array([], pa.int64()),
                         "recall5": pa.array([], pa.float64())})
    seeds = np.array(seed_tab.sort_by("vec_id")
                     .column("embedding").to_pylist(), np.float64)
    dim = seeds.shape[1]
    if dim % m:
        raise RuntimeError(f"pq_recall: dim {dim} not divisible by "
                           f"m={m} subspaces")
    sub = dim // m
    # cent[s] is the (k, sub) codebook of subspace s
    cent = seeds.reshape(k, m, sub).transpose(1, 0, 2).copy()

    def sub_assign(mat: np.ndarray, c: np.ndarray) -> np.ndarray:
        """(n, sub) × (k, sub) → argmin L2 codes, ties → lowest."""
        return np.argmin((c * c).sum(axis=1)[None, :]
                         - 2.0 * (mat @ c.T), axis=1)

    for _ in range(iters):
        ref = ray.put(cent)

        def train_partial(b: pa.Table, ref=ref) -> pa.Table:
            c = ray.get(ref)
            mat = vec_matrix(b.column("embedding"))
            keys, dims, sums, cnts = [], [], [], []
            for s in range(m):
                sm = mat[:, s * sub:(s + 1) * sub]
                a = sub_assign(sm, c[s])
                q = scaled_int_sql(sm.ravel(), SCALE).reshape(sm.shape)
                order = np.argsort(a, kind="stable")
                labs, starts = np.unique(a[order], return_index=True)
                ss = np.add.reduceat(q[order], starts, axis=0)
                nn = np.diff(np.concatenate([starts, [len(a)]]))
                keys.append(np.repeat(s * k + labs, sub))
                dims.append(np.tile(np.arange(sub), len(labs)))
                sums.append(ss.ravel())
                cnts.append(np.repeat(nn, sub))
            return pa.table({
                "key": pa.array(np.concatenate(keys), pa.int64()),
                "dim": pa.array(np.concatenate(dims), pa.int64()),
                "p_s": pa.array(np.concatenate(sums), pa.int64()),
                "p_n": pa.array(np.concatenate(cnts), pa.int64()),
            })

        grid = _small_table(_tree_combine(
            ds.map_batches(train_partial, batch_format="pyarrow"),
            ["key", "dim"], [("p_s", "sum"), ("p_n", "sum")],
            ["key", "dim", "p_s", "p_n"],
            ["key", "dim", "s", "n"]).materialize())
        new = cent.copy()
        gk = grid.column("key").to_numpy(zero_copy_only=False)
        gd = grid.column("dim").to_numpy(zero_copy_only=False)
        gs = grid.column("s").to_numpy(zero_copy_only=False)
        gn = grid.column("n").to_numpy(zero_copy_only=False)
        new[gk // k, gk % k, gd] = \
            gs.astype(np.float64) / SCALE / gn.astype(np.float64)
        cent = new

    qtab = pqt.read_table(_t(sf_dir, "embeddings"),
                          filters=[("vec_id", "<", 8)],
                          columns=["vec_id", "embedding"]) \
        .sort_by("vec_id")
    qids = qtab.column("vec_id").to_pylist()
    qmat = np.array(qtab.column("embedding").to_pylist(), np.float64)
    # exact L2 top-5 and PQ-ADC top-5 share one candidate-merge shape:
    # per batch local top-5 (dist asc, vec_id asc), driver heap merge
    luts = np.stack([
        ((cent[s][None, :, :]
          - qmat[:, s * sub:(s + 1) * sub][:, None, :]) ** 2)
        .sum(axis=2)
        for s in range(m)], axis=1)  # (n_q, m, k)
    state = ray.put((qmat, luts, cent))

    def cand_partial(b: pa.Table) -> pa.Table:
        qm, lut, c = ray.get(state)
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        mat = vec_matrix(b.column("embedding"))
        d_ex = ((mat[None, :, :] - qm[:, None, :]) ** 2).sum(axis=2)
        codes = np.stack([sub_assign(mat[:, s * sub:(s + 1) * sub],
                                     c[s]) for s in range(m)], axis=1)
        d_pq = np.stack([lut[qi, np.arange(m)[None, :],
                             codes].sum(axis=1)
                         for qi in range(len(qm))])
        out_q, out_v, out_e, out_p = [], [], [], []
        top = min(5, len(ids))
        for qi in range(len(qm)):
            sel_e = np.lexsort((ids, d_ex[qi]))[:top]
            sel_p = np.lexsort((ids, d_pq[qi]))[:top]
            keep = np.union1d(sel_e, sel_p)
            out_q.append(np.full(len(keep), qi))
            out_v.append(ids[keep])
            out_e.append(d_ex[qi][keep])
            out_p.append(d_pq[qi][keep])
        return pa.table({
            "qi": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "d_ex": pa.array(np.concatenate(out_e), pa.float64()),
            "d_pq": pa.array(np.concatenate(out_p), pa.float64()),
        })

    best_ex: dict = {}
    best_pq: dict = {}
    cands = ds.map_batches(cand_partial, batch_format="pyarrow")
    for b in cands.iter_batches(batch_size=8192,
                                batch_format="pyarrow"):
        for qi, v, de, dp in zip(b.column("qi").to_pylist(),
                                 b.column("vec_id").to_pylist(),
                                 b.column("d_ex").to_pylist(),
                                 b.column("d_pq").to_pylist()):
            heapq.heappush(best_ex.setdefault(qi, []), (-de, -v))
            heapq.heappush(best_pq.setdefault(qi, []), (-dp, -v))
            if len(best_ex[qi]) > 5:
                heapq.heappop(best_ex[qi])
            if len(best_pq[qi]) > 5:
                heapq.heappop(best_pq[qi])
    rows = []
    for qi in sorted(best_ex):
        ex = {-v for _, v in best_ex[qi]}
        pq_set = {-v for _, v in best_pq[qi]}
        hits = len(ex & pq_set)
        rows.append((int(qids[qi]), hits,
                     float(hits) / float(len(ex))))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_hits": pa.array([r[1] for r in rows], pa.int64()),
        "recall5": pa.array([r[2] for r in rows], pa.float64()),
    })


def q_events_max_drawdown(sf_dir: str) -> Dataset:
    """Maximum drawdown of the cumulative daily value series (the
    risk-analytics walk statistic): running peak minus running
    cumulative, maximized — ENTIRELY exact int64 cents, with the
    first day attaining the max pinned as the deterministic trough.
    Scale shape: one bounded (day) combine; the walk is a vectorized
    cumsum/cummax on the calendar-sized final block.  The twin is
    the canonical window cumsum + running MAX."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        day = pc.floor_temporal(b.column("ts"), unit="day")
        cents = scaled_int_sql(b.column("value"), 100.0)
        t = pa.table({"day": day, "p_c": pa.array(cents, pa.int64())})
        g = t.group_by("day").aggregate([("p_c", "sum")])
        return g.rename_columns(["day", "p_c"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["day"], [("p_c", "sum")], ["day", "p_c"], ["day", "cents"])

    def finish(b: pa.Table) -> pa.Table:
        b = b.sort_by([("day", "ascending")])
        c = b.column("cents").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cum = np.cumsum(c)
        peak = np.maximum.accumulate(cum)
        dd = peak - cum
        mx = int(dd.max()) if len(dd) else 0
        ti = int(np.argmax(dd)) if len(dd) else 0
        return pa.table({
            "n_days": pa.array([len(c)], pa.int64()),
            "final_cents": pa.array([int(cum[-1]) if len(cum) else 0],
                                    pa.int64()),
            "peak_cents": pa.array([int(peak[-1]) if len(peak) else 0],
                                   pa.int64()),
            "max_drawdown_cents": pa.array([mx], pa.int64()),
            "trough_day": pa.array([b.column("day")[ti].as_py()],
                                   pa.timestamp("us")),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


#: JL spec: 64 → 16 dims, ±1 signs derandomized off md5(i:j:jl)
#: (the randomized_response hex-band convention), inputs quantized to
#: integer micro-units so every sum/square is exact int64.
JL_OUT_DIMS = 16


def _jl_signs(d_in: int, d_out: int):
    """Deterministic ±1 projection matrix: +1 iff the first hex char
    of md5(f"{i}:{j}:jl") lands in '01234567' — exactly replayable in
    SQL off the same string."""
    import hashlib

    import numpy as np

    s = np.empty((d_in, d_out), np.int64)
    for i in range(d_in):
        for j in range(d_out):
            h = hashlib.md5(f"{i}:{j}:jl".encode()).hexdigest()[0]
            s[i, j] = 1 if h in "01234567" else -1
    return s


def q_embeddings_jl_distortion(sf_dir: str) -> Dataset:
    """Johnson–Lindenstrauss sketch quality report: project the
    micro-quantized embeddings 64 → 16 dims with a derandomized ±1
    matrix and histogram the per-pair squared-distance ratio
    d_proj²·1e6 // (16·d_orig²) over the deterministic (2t, 2t+1)
    vec_id pairs — all integer arithmetic, so an approximate-sketch
    quality metric sits under the bit-exact SQL gate.  Scale shape:
    pairs co-locate via ONE groupby(vec_id // 2) exchange (the
    pair-id key), the sign matrix is a 1 KB broadcast, and the ratio
    histogram rides a bounded (band) combine."""
    import numpy as np

    signs = _jl_signs(64, JL_OUT_DIMS)
    from ..util import vec_matrix

    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    def add_pair(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy(zero_copy_only=False)
        return b.append_column("pair",
                               pa.array(ids // 2, pa.int64()))

    empty = pa.table({"ratio_q": pa.array([], pa.int64())})

    def pair_ratio(g: pa.Table) -> pa.Table:
        if g.num_rows != 2:
            return empty  # unpaired tail id
        ids = g.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        mat = vec_matrix(g.column("embedding"))[order]
        q = scaled_int_sql(mat.ravel(), 1e6).reshape(mat.shape)
        diff = q[0] - q[1]
        d_orig2 = int((diff * diff).sum())
        if d_orig2 == 0:
            return empty  # identical vectors: ratio undefined
        pdiff = diff @ signs
        d_proj2 = int((pdiff * pdiff).sum())
        return pa.table({"ratio_q": pa.array(
            [d_proj2 * 1_000_000 // (JL_OUT_DIMS * d_orig2)],
            pa.int64())})

    ratios = ds.map_batches(add_pair, batch_format="pyarrow") \
        .groupby("pair").map_groups(pair_ratio, batch_format="pyarrow")

    def band_partial(b: pa.Table) -> pa.Table:
        r = b.column("ratio_q").to_numpy(zero_copy_only=False)
        t = pa.table({"band": pa.array(r // 100_000, pa.int64()),
                      "p_n": pa.array(np.ones(len(r), np.int64))})
        g = t.group_by("band").aggregate([("p_n", "sum")])
        return g.rename_columns(["band", "p_n"])

    return _tree_combine(
        ratios.map_batches(band_partial, batch_format="pyarrow"),
        ["band"], [("p_n", "sum")], ["band", "p_n"],
        ["band", "n_pairs"])


def q_orders_hhi_by_nation(sf_dir: str) -> Dataset:
    """Revenue-concentration HHI (Herfindahl-Hirschman index) per
    nation: how concentrated is each nation's order revenue across its
    customers?  HHI = Σᵢ sᵢ² where sᵢ is customer i's share of the
    nation's revenue — the antitrust-screen staple, and for a data
    pipeline the standard "is one tenant dominating this shard" skew
    probe.  Plan: orders pre-aggregate to customer-grain cents before
    the ONE shuffle (fact rows never move twice); the customer→nation
    map is the dim join; the nation-grain Σc and Σc² fold runs on the
    driver in arbitrary-precision Python ints because Σc² overflows
    int64 at sf≥0.1 (c≈10⁸ cents ⇒ c²≈10¹⁶ ⇒ 600 customers ≈ 10¹⁹) —
    the twin uses HUGEINT for the same reason.  The only floats are
    the final CAST-by-CAST division replayed operand-for-operand."""
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_custkey", "o_totalprice"])

    def partial(b: pa.Table) -> pa.Table:
        cents = scaled_int_sql(b.column("o_totalprice"), 100.0)
        t = pa.table({"c": b.column("o_custkey"),
                      "p_m": pa.array(cents, pa.int64())})
        g = t.group_by("c").aggregate([("p_m", "sum")])
        return g.rename_columns(["c", "p_m"])

    cust_cents = with_schema(
        orders.map_batches(partial, batch_format="pyarrow")
        .groupby("c").aggregate(Sum("p_m", alias_name="cents")),
        pa.schema([("c", pa.int64()), ("cents", pa.int64())]))

    cust = rd.read_parquet(_t(sf_dir, "customer"),
                           columns=["c_custkey", "c_nationkey"])
    nat = _small_table(rd.read_parquet(_t(sf_dir, "nation"),
                                       columns=["n_nationkey", "n_name"]))
    n_name = {int(k): v for k, v in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist())}

    j = cust_cents.join(cust, join_type="inner", num_partitions=8,
                        on=("c",), right_on=("c_custkey",))
    # customer-grain aggregate: dim-sized by construction (one row per
    # ordering customer) — the driver fold below is the documented
    # small-side trade, NOT a raw-data materialization.
    t = _small_table(j.select_columns(["c_nationkey", "cents"]))
    acc: dict[int, list] = {}
    if t is not None:
        nk = t.column("c_nationkey").to_pylist()
        cc = t.column("cents").to_pylist()
        for k, c in zip(nk, cc):
            a = acc.setdefault(int(k), [0, 0, 0])
            a[0] += 1
            a[1] += c           # Python int: exact
            a[2] += c * c       # exact beyond int64
    names, ncust, tot, hhi = [], [], [], []
    for k in sorted(acc, key=lambda x: n_name[x]):
        n, s, ssq = acc[k]
        names.append(n_name[k])
        ncust.append(n)
        tot.append(s)
        hhi.append(round_sql_f(float(ssq) / (float(s) * float(s)), 6))
    return rd.from_arrow(pa.table({
        "n_name": pa.array(names, pa.string()),
        "n_customers": pa.array(ncust, pa.int64()),
        "total_cents": pa.array(tot, pa.int64()),
        "hhi": pa.array(hhi, pa.float64()),
    }))


def q_events_lorenz_deciles(sf_dir: str) -> Dataset:
    """Lorenz-curve decile table of event value by user — the
    inequality curve behind the Gini number q_events_user_gini already
    reports: users ranked ascending by lifetime value, NTILE(10), and
    per decile the user count, decile cents, cumulative cents and
    cumulative share.  Users whose every value is NULL are excluded
    (their SUM is NULL on both sides).  One user-grain exchange; the
    ranked fill runs on the driver over the user-grain AGGREGATE (the
    rfm_segments trade — swap for quantile-boundary assignment beyond
    driver scale); DuckDB's NTILE fill (first n mod 10 buckets take
    the extra row) is replayed exactly."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_valid(b.column("value")))
        cents = scaled_int_sql(f.column("value"), 100.0)
        t = pa.table({"user_id": f.column("user_id"),
                      "p_c": pa.array(cents, pa.int64())})
        g = t.group_by("user_id").aggregate([("p_c", "sum")])
        return g.rename_columns(["user_id", "p_c"])

    sums = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id").aggregate(Sum("p_c", alias_name="cents")),
        pa.schema([("user_id", pa.int64()), ("cents", pa.int64())]))
    t = _small_table(sums)
    if t is None:
        return rd.from_arrow(pa.table({
            "decile": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64()),
            "decile_cents": pa.array([], pa.int64()),
            "cum_cents": pa.array([], pa.int64()),
            "cum_share": pa.array([], pa.float64()),
        }))
    uid = t.column("user_id").to_numpy(zero_copy_only=False)
    cents = t.column("cents").to_numpy(zero_copy_only=False)
    order = np.lexsort((uid, cents))        # ORDER BY cents, user_id
    cents = cents[order]
    n = len(cents)
    k, r = divmod(n, 10)
    bounds = np.cumsum([k + 1] * r + [k] * (10 - r))
    tiles = np.searchsorted(bounds, np.arange(n), side="right") + 1
    total = int(cents.sum())
    dec, nus, dcents, cum, share = [], [], [], [], []
    run = 0
    for d in range(1, 11):
        m = tiles == d
        if not m.any():
            continue
        s = int(cents[m].sum())
        run += s
        dec.append(d)
        nus.append(int(m.sum()))
        dcents.append(s)
        cum.append(run)
        share.append(round_sql_f(float(run) / float(total), 6)
                     if total else 0.0)
    return rd.from_arrow(pa.table({
        "decile": pa.array(dec, pa.int64()),
        "n_users": pa.array(nus, pa.int64()),
        "decile_cents": pa.array(dcents, pa.int64()),
        "cum_cents": pa.array(cum, pa.int64()),
        "cum_share": pa.array(share, pa.float64()),
    }))


#: Hub-degree cap for the graph wedge/2-hop kernels (linkpred /
#: Adamic-Adar / edge-Jaccard / triangles).  The same failure mode
#: :data:`SHINGLE_DF_CAP` closes for shingles exists in every graph
#: kernel that expands a node's neighborhood: a hub with degree 100k
#: would emit 5×10⁹ pairs (triu) or gather 10⁹+ 2-hop candidates from
#: ONE group/row — O(deg²) rows and memory from a single task.  A node
#: above the cap contributes no wedges/candidates and is dropped with
#: the `_df_capped` loud-log discipline (never silent).  10_000² / 2 =
#: 5×10⁷ pairs bounds the worst group; the oracle corpora sit ~45×
#: below the cap (max co-purchase degree 222 at sf0.1), so every [SQL]
#: twin is bit-exact at all three scales.  Truncation is path-local:
#: the broadcast 2-hop kernel caps the ENDPOINT degree, the shuffle
#: fallback caps the wedge CENTER degree.
WEDGE_DEG_CAP = 10_000

#: Per-endpoint 2-hop gather cap for the broadcast kernel: even below
#: the degree cap, Σ_{z∈N(a)} deg(z) can blow up when every neighbor
#: is itself a hub.  20M int64 candidates ≈ 160 MB bounds one node's
#: gather; drops are loud-logged like stop shingles.
TWO_HOP_GATHER_CAP = 20_000_000

#: Max distinct edges for the broadcast-adjacency graph kernels
#: (linkpred / adamic_adar primary path; the ekeys membership probes).
#: The CSR adjacency is driver-built then ray.put once (read zero-copy
#: by every task — one copy per NODE on a real cluster, the
#: ANN-centroid / kmeans pattern): 2E int64 dst + E-node offsets ≈
#: 1.6 GB at 100M edges, the practical per-node bound.  Beyond it the
#: kernels fall back to the shuffle plan (wedge expansion + fused
#: edge-tag anti-join in ONE pair-key exchange — no driver edge
#: materialization at all), the same adaptivity discipline as
#: dedup's cache_hashed.
EDGE_BROADCAST_MAX = 100_000_000


def _adj_csr(edges: Dataset):
    """Driver-side CSR adjacency of the distinct (id_a < id_b) edge
    set: sorted ``node_ids``, ``offsets`` (len n+1), ``dst`` (2E,
    per-row sorted), ``deg``.  O(E) driver memory — callers must gate
    on :data:`EDGE_BROADCAST_MAX` (see there for the fallback)."""
    import numpy as np

    tabs = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
    if not tabs:
        z = np.array([], np.int64)
        return z, np.zeros(1, np.int64), z, z
    ea = np.concatenate([t.column("id_a").to_numpy(zero_copy_only=False)
                         for t in tabs])
    eb = np.concatenate([t.column("id_b").to_numpy(zero_copy_only=False)
                         for t in tabs])
    src = np.concatenate([ea, eb])
    dst = np.concatenate([eb, ea])
    o = np.lexsort((dst, src))
    src, dst = src[o], dst[o]
    node_ids, deg = np.unique(src, return_counts=True)
    offsets = np.zeros(len(node_ids) + 1, np.int64)
    np.cumsum(deg, out=offsets[1:])
    return node_ids, offsets, dst.astype(np.int64, copy=False), deg


def _two_hop_topk_broadcast(edges: Dataset, k: int,
                            weighted: bool) -> Dataset:
    """Per-endpoint top-k non-adjacent common-neighbor candidates via
    a broadcast CSR adjacency — the kernel linkpred and Adamic-Adar
    share.  For each node a (node table partitioned into row blocks),
    the multiset {b ∈ N(z) : z ∈ N(a)} counts b with multiplicity
    cn(a, b) — each pair's TOTAL count materializes in ONE task, so a
    per-group top-k prune is exact and only ≤k rows per node ever
    move.  This replaces the Σdeg² open-wedge exchange (148M rows,
    709 s at sf0.1) with compute-local numpy: the only exchanges left
    are the node-block fan-out and ≤ n·k candidate rows.  Pair (a,b)
    is emitted once, in min(a,b)'s block (the b > a filter); edges are
    excluded in-block via the sorted N(a) probe; ordering ties break
    (score desc, id_a, id_b) exactly like the twin — a pair cut by its
    group's top-k is beaten by ≥k pairs that also beat it globally.
    ``weighted`` adds the Adamic-Adar sum with the per-center weight
    1e12/ln(deg z) int64-quantized ONCE per node on the driver (same
    scaled_int_sql value as the per-group quantization it replaces).
    Hub safety: endpoints above :data:`WEDGE_DEG_CAP` and gathers
    above :data:`TWO_HOP_GATHER_CAP` drop loudly."""
    import logging

    import numpy as np

    names = (["id_a", "id_b", "aa_q", "common_neighbors"] if weighted
             else ["id_a", "id_b", "common_neighbors"])
    empty = pa.table({n: pa.array([], pa.int64()) for n in names})

    node_ids, offsets, dst, deg = _adj_csr(edges)
    if len(node_ids) == 0:
        return rd.from_arrow(empty)
    wq = None
    if weighted:
        lnv = np.log(np.maximum(deg, 2).astype(np.float64))
        wq = scaled_int_sql(1e12 / lnv, 1.0)
        wq[deg < 2] = 0  # deg-1 centers generate no wedges
    csr_ref = ray.put((node_ids, offsets, dst, wq))

    def block(b: pa.Table) -> pa.Table:
        ids_, off_, dst_, wq_ = ray.get(csr_ref)
        acc: dict[str, list] = {n: [] for n in names}
        log = logging.getLogger(__name__)
        for a in b.column("a").to_numpy(zero_copy_only=False):
            ai = int(np.searchsorted(ids_, a))
            nb = dst_[off_[ai]:off_[ai + 1]]  # sorted neighbors of a
            if len(nb) < 1:
                continue
            if len(nb) > WEDGE_DEG_CAP:
                log.warning(
                    "two_hop_topk: hub endpoint dropped (deg=%d > "
                    "WEDGE_DEG_CAP=%d, node=%d): its candidate pairs "
                    "are truncated; raise the cap for exact-on-hubs "
                    "semantics", len(nb), WEDGE_DEG_CAP, int(a))
                continue
            zi = np.searchsorted(ids_, nb)
            lens = off_[zi + 1] - off_[zi]
            total = int(lens.sum())
            if total == 0:
                continue
            if total > TWO_HOP_GATHER_CAP:
                log.warning(
                    "two_hop_topk: 2-hop gather dropped (%d > cap=%d, "
                    "node=%d)", total, TWO_HOP_GATHER_CAP, int(a))
                continue
            cs = np.zeros(len(lens) + 1, np.int64)
            np.cumsum(lens, out=cs[1:])
            flat = (np.arange(total, dtype=np.int64)
                    - np.repeat(cs[:-1], lens)
                    + np.repeat(off_[zi], lens))
            cand = dst_[flat]
            o = np.argsort(cand, kind="stable")
            c = cand[o]
            starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(c)) + 1])
            ub = c[starts]
            cnt = np.diff(np.concatenate([starts, [len(c)]]))
            # drop b ≤ a (dedupe to the smaller endpoint; b == a is
            # a itself, reached through every z) and existing edges
            # (b ∈ sorted N(a) probe — the linkpred non-edge filter,
            # now in-block)
            pos = np.searchsorted(nb, ub)
            is_edge = (pos < len(nb)) & (
                nb[np.minimum(pos, len(nb) - 1)] == ub)
            keep = np.flatnonzero((ub > a) & ~is_edge)
            if keep.size == 0:
                continue
            bsel, csel = ub[keep], cnt[keep]
            if weighted:
                w = np.repeat(wq_[zi], lens)[o]
                aa = np.add.reduceat(w, starts)[keep]
                score = aa
            else:
                score = csel
            top = np.lexsort((bsel, -score))[:k]
            acc["id_a"].append(np.full(len(top), a, np.int64))
            acc["id_b"].append(bsel[top])
            acc["common_neighbors"].append(csel[top])
            if weighted:
                acc["aa_q"].append(aa[top])
        if not acc["id_a"]:
            return empty
        return pa.table({n: pa.array(
            np.concatenate(acc[n]).astype(np.int64), pa.int64())
            for n in names})

    nparts = int(min(128, max(1, len(node_ids))))
    nodes = rd.from_arrow(pa.table({
        "a": pa.array(node_ids, pa.int64())})).repartition(nparts)
    return nodes.map_batches(block, batch_format="pyarrow")


def _two_hop_candidates_shuffle(edges: Dataset,
                                weighted: bool) -> Dataset:
    """Shuffle fallback for the 2-hop kernels when the edge set
    exceeds :data:`EDGE_BROADCAST_MAX`: per-center wedge expansion
    (capped at :data:`WEDGE_DEG_CAP`) UNIONED with edge-tag rows so
    the non-edge filter rides the SAME pair-key exchange as the count
    combine (no driver-side edge materialization, no broadcast probe
    — the anti-join is fused into the aggregate).  Emits the full
    non-adjacent candidate table; callers local-prune with
    _topk_combine, so only k rows per block survive the final pass."""
    import numpy as np

    kernel = "adamic_adar" if weighted else "linkpred"
    pcols = ["p_c", "p_e"] + (["p_w"] if weighted else [])
    partial_names = ["id_a", "id_b"] + pcols
    final_names = ["id_a", "id_b", "common_neighbors", "n_edge"] + \
        (["aa_q"] if weighted else [])
    out_names = (["id_a", "id_b", "aa_q", "common_neighbors"]
                 if weighted else ["id_a", "id_b", "common_neighbors"])
    empty = pa.table({n: pa.array([], pa.int64())
                      for n in partial_names})

    def sym(b: pa.Table) -> pa.Table:
        a = b.column("id_a").combine_chunks()
        c = b.column("id_b").combine_chunks()
        return pa.table({"ctr": pa.concat_arrays([a, c]),
                         "nbr": pa.concat_arrays([c, a])})

    def wedges(g: pa.Table) -> pa.Table:
        if g.num_rows < 2 or _df_capped(
                g, g.num_rows, WEDGE_DEG_CAP, kernel + "_wedges",
                "ctr"):
            return empty
        nb = np.sort(g.column("nbr").to_numpy(zero_copy_only=False))
        i, j = np.triu_indices(len(nb), k=1)
        cols = {"id_a": pa.array(nb[i], pa.int64()),
                "id_b": pa.array(nb[j], pa.int64()),
                "p_c": pa.array(np.ones(len(i), np.int64)),
                "p_e": pa.array(np.zeros(len(i), np.int64))}
        if weighted:
            w = int(scaled_int_sql(
                np.array([1e12 / np.log(float(len(nb)))]), 1.0)[0])
            cols["p_w"] = pa.array(np.full(len(i), w, np.int64))
        return pa.table(cols)

    def edge_tag(b: pa.Table) -> pa.Table:
        z = pa.array(np.zeros(b.num_rows, np.int64))
        cols = {"id_a": b.column("id_a"), "id_b": b.column("id_b"),
                "p_c": z, "p_e": pa.array(
                    np.ones(b.num_rows, np.int64))}
        if weighted:
            cols["p_w"] = z
        return pa.table(cols)

    pairs = edges.map_batches(sym, batch_format="pyarrow") \
        .groupby("ctr").map_groups(wedges, batch_format="pyarrow") \
        .union(edges.map_batches(edge_tag, batch_format="pyarrow")) \
        .materialize()

    aggs = [(c, "sum") for c in pcols]
    PAIR_TREE_MAX = 20_000_000  # _pair_combine's measured cap
    if pairs.count() <= PAIR_TREE_MAX:
        combined = _tree_combine(pairs, ["id_a", "id_b"], aggs,
                                 partial_names, final_names, width=16)
    else:
        def pair_partial(b: pa.Table) -> pa.Table:
            g = b.group_by(["id_a", "id_b"]).aggregate(aggs)
            return g.rename_columns(partial_names)

        ray_aggs = [Sum("p_c", alias_name="common_neighbors"),
                    Sum("p_e", alias_name="n_edge")] + \
            ([Sum("p_w", alias_name="aa_q")] if weighted else [])
        combined = pairs.map_batches(
            pair_partial, batch_format="pyarrow") \
            .groupby(["id_a", "id_b"]).aggregate(*ray_aggs)
    combined = with_schema(combined, pa.schema(
        [(n, pa.int64()) for n in final_names]))

    def finish(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("n_edge"),
                              pa.scalar(0, pa.int64())))
        return f.select(out_names)

    return combined.map_batches(finish, batch_format="pyarrow")


def q_parts_copurchase_linkpred(sf_dir: str) -> Dataset:
    """Common-neighbor link prediction over the part co-purchase
    graph: the 20 strongest NOT-yet-connected pairs by shared
    neighbors — the classic "customers who bought these also
    bought…" candidate generator.  Primary plan (edges ≤
    :data:`EDGE_BROADCAST_MAX`): the broadcast-CSR 2-hop kernel —
    each pair's full count computed locally in its smaller endpoint's
    node block, in-block non-edge filter and local top-20, so only
    ≤20 rows per node move (was: a 148M-row Σdeg² wedge exchange,
    709 s at sf0.1).  Beyond the broadcast bound: the shuffle
    fallback (capped wedge expansion + fused edge-tag anti-join).
    Ties at the cut break by (id_a, id_b) exactly like the twin's
    ORDER BY."""
    edges = _copurchase_edges(sf_dir)
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "common_neighbors": pa.array([], pa.int64()),
        }))
    cand = (_two_hop_topk_broadcast(edges, 20, weighted=False)
            if n_edges <= EDGE_BROADCAST_MAX
            else _two_hop_candidates_shuffle(edges, weighted=False))
    return _topk_combine(cand, sorted_topk(
        [("common_neighbors", "descending"), ("id_a", "ascending"),
         ("id_b", "ascending")], 20))


def q_events_freshness(sf_dir: str) -> Dataset:
    """Per-source data-freshness / staleness report — the pipeline-ops
    monitor every warehouse runs: for each event_type, the last event
    timestamp, how many whole days stale it is vs the newest event
    anywhere, total rows, and rows landed in the last 7 calendar days
    (day-grain window ending at the global max day).  ONE scan; the
    only exchange is the bounded (type, day) grid carrying (count,
    max_us) partials; the calendar fold runs on the driver.  Max runs
    on epoch-us int64, never on raw timestamps (Ray's aggregate path
    can round-trip timestamp blocks through pandas at day precision —
    the audited catalog rule)."""
    import numpy as np

    DAY_US = 86_400_000_000

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        us = b.column("ts").cast(pa.int64())
        t = pa.table({
            "event_type": b.column("event_type"),
            "day_idx": pc.divide(us, pa.scalar(DAY_US, pa.int64())),
            "us": us,
        })
        g = t.group_by(["event_type", "day_idx"]).aggregate(
            [([], "count_all"), ("us", "max")])
        return g.rename_columns(["event_type", "day_idx", "p_n",
                                 "p_max"])

    grid = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "day_idx"])
        .aggregate(Sum("p_n", alias_name="n"),
                   Max("p_max", alias_name="max_us")),
        pa.schema([("event_type", pa.string()),
                   ("day_idx", pa.int64()), ("n", pa.int64()),
                   ("max_us", pa.int64())]))
    t = _small_table(grid)  # bounded: types × calendar days
    if t is None:
        return rd.from_arrow(pa.table({
            "event_type": pa.array([], pa.string()),
            "last_ts": pa.array([], pa.timestamp("us")),
            "days_stale": pa.array([], pa.int64()),
            "n_total": pa.array([], pa.int64()),
            "n_last_7d": pa.array([], pa.int64()),
        }))
    et = t.column("event_type").to_pylist()
    day = t.column("day_idx").to_numpy(zero_copy_only=False)
    n = t.column("n").to_numpy(zero_copy_only=False)
    mx = t.column("max_us").to_numpy(zero_copy_only=False)
    gmax_day = int(day.max())
    out: dict[str, list] = {}
    for e, d, cnt, m in zip(et, day, n, mx):
        a = out.setdefault(e, [0, 0, 0])   # max_us, n_total, n_7d
        a[0] = max(a[0], int(m))
        a[1] += int(cnt)
        if d >= gmax_day - 6:
            a[2] += int(cnt)
    keys = sorted(out)
    return rd.from_arrow(pa.table({
        "event_type": pa.array(keys, pa.string()),
        "last_ts": pa.array([out[k][0] for k in keys],
                            pa.int64()).cast(pa.timestamp("us")),
        "days_stale": pa.array(
            [gmax_day - out[k][0] // DAY_US for k in keys], pa.int64()),
        "n_total": pa.array([out[k][1] for k in keys], pa.int64()),
        "n_last_7d": pa.array([out[k][2] for k in keys], pa.int64()),
    }))


def q_transcripts_tool_stats(sf_dir: str) -> Dataset:
    """Tool-usage report over the transcript corpus — the first thing
    an agent-pipeline operator asks of a new dump: per tool (rows with
    role='tool' and a non-empty tool name) the call count, how many
    conversations invoke it, total result chars, and the mean position
    in the conversation (average turn_idx).  Exchanges: ONE bounded
    (tool, conv_id) partial-agg tree combine (tools × convs is
    structurally dim-sized); the per-tool fold then runs on that
    single combined block.  The mean is the only float — one IEEE
    division of two exact int64 sums, operand-cast like the twin."""
    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role",
                                  "text", "tool"])

    def partial(b: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(b.column("role"), "tool"),
                       pc.not_equal(pc.fill_null(b.column("tool"), ""),
                                    ""))
        f = b.filter(mask)
        chars = pc.fill_null(pc.utf8_length(
            f.column("text").combine_chunks()), 0).cast(pa.int64())
        t = pa.table({
            "tool": f.column("tool"),
            "conv_id": f.column("conv_id"),
            "one": pa.array(np.ones(f.num_rows, np.int64)),
            "ch": chars,
            "si": f.column("turn_idx").cast(pa.int64()),
        })
        g = t.group_by(["tool", "conv_id"]).aggregate(
            [("one", "sum"), ("ch", "sum"), ("si", "sum")])
        return g.rename_columns(["tool", "conv_id", "p_n", "p_ch",
                                 "p_si"])

    per_conv = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["tool", "conv_id"],
        [("p_n", "sum"), ("p_ch", "sum"), ("p_si", "sum")],
        ["tool", "conv_id", "p_n", "p_ch", "p_si"],
        ["tool", "conv_id", "n", "ch", "si"])

    def finish(b: pa.Table) -> pa.Table:
        g = b.group_by(["tool"]).aggregate(
            [("n", "sum"), ("conv_id", "count"), ("ch", "sum"),
             ("si", "sum")])
        n = g.column("n_sum").to_numpy(zero_copy_only=False)
        si = g.column("si_sum").to_numpy(zero_copy_only=False)
        return pa.table({
            "tool": g.column("tool"),
            "n_calls": g.column("n_sum").cast(pa.int64()),
            "n_convs": g.column("conv_id_count").cast(pa.int64()),
            "total_chars": g.column("ch_sum").cast(pa.int64()),
            "mean_turn_idx": pa.array(
                si.astype(np.float64) / n.astype(np.float64),
                pa.float64()),
        })

    return per_conv.map_batches(finish, batch_format="pyarrow",
                                batch_size=None)


def q_transcripts_role_transitions(sf_dir: str) -> pa.Table:
    """Global role-transition matrix over the transcript corpus (the
    dialogue-structure fingerprint: does assistant follow user, how
    often does a tool result interleave): per conversation ordered by
    (turn_idx, ts), every adjacent (prev_role → next_role) step, then
    the transition probability out of each prev_role.  Duplicate turns
    are FULL-row duplicates in this corpus, so tie order inside the
    sort cannot change the pair multiset.  Scale shape: one
    groupby(conv_id) co-partition emitting ≤ |roles|² partials per
    group, a bounded tree combine, and one single-block probability
    pass — the events_type_transitions plan on the transcript axis."""
    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role", "ts"])

    def steps(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"), ("ts", "ascending")])
        r = g.column("role").combine_chunks()
        if len(r) < 2:
            return pa.table({"prev_role": pa.array([], pa.string()),
                             "next_role": pa.array([], pa.string()),
                             "p_c": pa.array([], pa.int64())})
        t = pa.table({"prev_role": r.slice(0, len(r) - 1),
                      "next_role": r.slice(1),
                      "one": pa.array(np.ones(len(r) - 1, np.int64))})
        out = t.group_by(["prev_role", "next_role"]) \
            .aggregate([("one", "sum")])
        return out.rename_columns(["prev_role", "next_role", "p_c"])

    partials = ds.groupby("conv_id").map_groups(steps,
                                                batch_format="pyarrow")
    counts = _tree_combine(partials, ["prev_role", "next_role"],
                           [("p_c", "sum")],
                           ["prev_role", "next_role", "p_c"],
                           ["prev_role", "next_role", "n_trans"])

    def probs(b: pa.Table) -> pa.Table:
        tot = b.group_by(["prev_role"]).aggregate([("n_trans", "sum")])
        m = dict(zip(tot.column("prev_role").to_pylist(),
                     tot.column("n_trans_sum").to_pylist()))
        n = b.column("n_trans").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        d = np.array([m[p] for p in
                      b.column("prev_role").to_pylist()], np.float64)
        return b.append_column("p", pa.array(n / d, pa.float64()))

    out = counts.map_batches(probs, batch_format="pyarrow",
                             batch_size=None)
    return _small_table(out)


def q_transcripts_context_budget(sf_dir: str) -> Dataset:
    """Context-window budget report per conversation — the truncation
    planner every transcript-training pipeline runs before packing:
    turns ordered by (turn_idx, ts), whitespace-token counts
    accumulated, and per conv_id the turn count, total tokens, how
    many leading turns fit a 4096-token budget, and the turn_idx at
    which the running total first exceeds it (NULL when the whole
    conversation fits).  The running sum is exact int64 and tie-order
    invariant (duplicate turns are full-row duplicates, and swapping
    equal values never changes a prefix-sum sequence).  ONE
    groupby(conv_id) co-partition; each group's fold is a vectorized
    cumsum — nothing exchanges twice."""
    import numpy as np

    BUDGET = 4096

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "text", "ts"])

    def fold(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"), ("ts", "ascending")])
        txt = pc.fill_null(g.column("text").combine_chunks(), "")
        # len(string_split(text, ' ')) ≡ count(' ') + 1, empties kept
        tok = pc.add(pc.count_substring(txt, " "), 1) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        cum = np.cumsum(tok)
        over = cum > BUDGET
        first = int(np.argmax(over)) if over.any() else -1
        idx = g.column("turn_idx").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cut = pa.array([int(idx[first]) if first >= 0 else None],
                       pa.int64())
        return pa.table({
            "conv_id": g.column("conv_id").slice(0, 1),
            "n_turns": pa.array([g.num_rows], pa.int64()),
            "total_tokens": pa.array([int(cum[-1])], pa.int64()),
            "n_turns_in_budget": pa.array(
                [int((~over).sum())], pa.int64()),
            "cut_turn_idx": cut,
        })

    return ds.groupby("conv_id").map_groups(fold,
                                            batch_format="pyarrow")


def q_transcripts_response_latency(sf_dir: str) -> Dataset:
    """Per-role response-latency profile: for every turn after the
    first (per conversation, ordered by (turn_idx, ts)), the wall gap
    to the preceding turn, attributed to the RESPONDING turn's role —
    how long users wait on the assistant, how fast tool results land.
    Gaps are exact integer µs end-to-end; mean is the single final
    float.  Duplicate turns are full-row duplicates, so the (role,
    gap) multiset is invariant to tie order.  ONE groupby(conv_id)
    co-partition emitting bounded per-role partial sums, then a tree
    combine over the role grid."""
    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role", "ts"])

    def gaps(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"), ("ts", "ascending")])
        if g.num_rows < 2:
            return pa.table({"role": pa.array([], pa.string()),
                             "p_n": pa.array([], pa.int64()),
                             "p_sum": pa.array([], pa.int64()),
                             "p_max": pa.array([], pa.int64())})
        us = g.column("ts").combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        d = np.diff(us)
        t = pa.table({
            "role": g.column("role").slice(1),
            "g": pa.array(d, pa.int64()),
            "one": pa.array(np.ones(len(d), np.int64)),
        })
        out = t.group_by("role").aggregate(
            [("one", "sum"), ("g", "sum"), ("g", "max")])
        return out.rename_columns(["role", "p_n", "p_sum", "p_max"])

    partials = ds.groupby("conv_id").map_groups(gaps,
                                                batch_format="pyarrow")
    agg = _tree_combine(
        partials, ["role"],
        [("p_n", "sum"), ("p_sum", "sum"), ("p_max", "max")],
        ["role", "p_n", "p_sum", "p_max"],
        ["role", "n_gaps", "total_gap_us", "max_gap_us"])

    def finish(b: pa.Table) -> pa.Table:
        s = b.column("total_gap_us").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = b.column("n_gaps").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "role": b.column("role"),
            "n_gaps": b.column("n_gaps").cast(pa.int64()),
            "total_gap_us": b.column("total_gap_us").cast(pa.int64()),
            "mean_gap_us": pa.array(s / n, pa.float64()),
            "max_gap_us": b.column("max_gap_us").cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_parts_copurchase_adamic_adar(sf_dir: str) -> Dataset:
    """Adamic-Adar link prediction over the part co-purchase graph —
    the common-neighbor score reweighted so rare hubs count more
    (AA(a,b) = Σ_{z∈N(a)∩N(b)} 1/ln deg z): top 20 non-adjacent pairs.
    Exactness: the per-center weight 1e12/ln(deg) is quantized to an
    int64 (DuckDB ROUND semantics via scaled_int_sql) once per node,
    and the pair score is an order-independent integer sum — int64
    headroom 1e12/ln 2 ≈ 1.4e12 per wedge, ~6M shared centers per
    pair before overflow.  Same adaptive plan as linkpred: the
    broadcast-CSR 2-hop kernel (weighted multiset counts, per-group
    local top-20) while edges fit :data:`EDGE_BROADCAST_MAX`, else
    the capped wedge-expansion shuffle with the fused edge-tag
    anti-join."""
    names = ["id_a", "id_b", "aa_q", "common_neighbors"]
    edges = _copurchase_edges(sf_dir)
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(pa.table({
            n: pa.array([], pa.int64()) for n in names}))
    cand = (_two_hop_topk_broadcast(edges, 20, weighted=True)
            if n_edges <= EDGE_BROADCAST_MAX
            else _two_hop_candidates_shuffle(edges, weighted=True))
    return _topk_combine(cand.select_columns(names), sorted_topk(
        [("aa_q", "descending"), ("id_a", "ascending"),
         ("id_b", "ascending")], 20))


def q_documents_source_cosine(sf_dir: str) -> Dataset:
    """Pairwise cosine similarity between per-source token-frequency
    vectors — the corpus-mixture redundancy matrix ("are src3 and
    src7 the same feed?") a curation pipeline reads before weighting
    sources.  The dot product and both norms are EXACT int64 sums of
    tf products (tf ≤ ~3e9 before the product overflows — quantize tf
    beyond that); the cosine is one float expression replayed
    operand-for-operand.  Plan: per-batch (source, tok) partials, ONE
    groupby(tok).map_groups that emits in-group source-pair cross
    products AND per-source squared terms (sources per token ≤ the
    source count, so the expansion is structurally bounded), then a
    bounded (source_a, source_b) tree combine."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "text"])

    def tok_rows(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = b.column("source").to_numpy(zero_copy_only=False)
        t = pa.table({
            "source": pa.array(np.repeat(src, n), pa.string()),
            "tok": flat,
        })
        g = t.group_by(["source", "tok"]).aggregate([("tok", "count")])
        return g.rename_columns(["source", "tok", "p_n"])

    st = ds.map_batches(tok_rows, batch_format="pyarrow")

    empty = pa.table({"source_a": pa.array([], pa.string()),
                      "source_b": pa.array([], pa.string()),
                      "p_x": pa.array([], pa.int64())})

    def cross(g: pa.Table) -> pa.Table:
        # one token's tf across sources: finish the tf sum in-group,
        # then emit diagonal (norm) + upper-triangle (dot) partials
        t = g.group_by("source").aggregate([("p_n", "sum")])
        src = t.column("source").to_pylist()
        c = t.column("p_n_sum").to_numpy(zero_copy_only=False)
        order = np.argsort(np.asarray(src, dtype=object))
        src = [src[i] for i in order]
        c = c[order]
        k = len(src)
        i, j = np.triu_indices(k, k=0)  # k=0: diagonal included
        return pa.table({
            "source_a": pa.array([src[x] for x in i], pa.string()),
            "source_b": pa.array([src[x] for x in j], pa.string()),
            "p_x": pa.array(c[i] * c[j], pa.int64()),
        })

    grid = st.groupby("tok").map_groups(cross, batch_format="pyarrow")
    if grid.count() == 0:
        return rd.from_arrow(pa.table({
            "source_a": pa.array([], pa.string()),
            "source_b": pa.array([], pa.string()),
            "dot": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }))
    agg = _tree_combine(grid, ["source_a", "source_b"],
                        [("p_x", "sum")],
                        ["source_a", "source_b", "p_x"],
                        ["source_a", "source_b", "x"])

    def finish(b: pa.Table) -> pa.Table:
        sa = b.column("source_a").to_pylist()
        sb = b.column("source_b").to_pylist()
        x = b.column("x").to_numpy(zero_copy_only=False)
        norm = {a: v for a, bb, v in zip(sa, sb, x) if a == bb}
        mask = np.array([a != bb for a, bb in zip(sa, sb)])
        if not mask.any():
            return pa.table({
                "source_a": pa.array([], pa.string()),
                "source_b": pa.array([], pa.string()),
                "dot": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            })
        f = b.filter(pa.array(mask))
        fa = f.column("source_a").to_pylist()
        fb = f.column("source_b").to_pylist()
        num = f.column("x").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        na = np.array([float(norm[a]) for a in fa], np.float64)
        nb = np.array([float(norm[bb]) for bb in fb], np.float64)
        cos = num / (np.sqrt(na) * np.sqrt(nb))
        return pa.table({
            "source_a": f.column("source_a"),
            "source_b": f.column("source_b"),
            "dot": f.column("x").cast(pa.int64()),
            "cosine": round_sql(pa.array(cos, pa.float64()), 6),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_events_mcnemar(sf_dir: str) -> Dataset:
    """McNemar paired test: did per-user purchase behaviour CHANGE
    between the first and second half of the observation window?  Each
    user contributes a (before, after) flag pair split at the midpoint
    day; the statistic (n01−n10)²/(n01+n10) reads only the discordant
    cells.  Two scans by construction (the split day is a global
    reduction): pass 1 is a column-pruned min/max over day indices;
    pass 2 folds per-batch (user, flag-pair) partials through one
    user-grain exchange, then a 4-cell grid combine.  The chi-square
    is the single float, over exact int64 cell counts."""
    import numpy as np

    DAY_US = 86_400_000_000

    # pass 1: global day span.  Cast to epoch-us int64 IN the scan —
    # raw timestamps never enter a Min/Max exchange (the audited
    # catalog rule: Ray's aggregate path can round-trip timestamp
    # blocks through pandas at day precision).
    span = rd.read_parquet(_t(sf_dir, "events"), columns=["ts"]) \
        .map_batches(lambda b: pa.table(
            {"us": b.column("ts").cast(pa.int64())}),
            batch_format="pyarrow") \
        .aggregate(Min("us"), Max("us"))
    lo_day = int(span["min(us)"]) // DAY_US
    hi_day = int(span["max(us)"]) // DAY_US
    mid = (lo_day + hi_day) // 2

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_type", "ts"])

    def partial(b: pa.Table, mid=mid) -> pa.Table:
        day = pc.divide(b.column("ts").cast(pa.int64()),
                        pa.scalar(DAY_US, pa.int64()))
        is_p = pc.equal(b.column("event_type"), "purchase")
        day_np = day.to_numpy(zero_copy_only=False)
        p_np = is_p.combine_chunks().to_numpy(zero_copy_only=False)
        t = pa.table({
            "user_id": b.column("user_id"),
            "b1": pa.array((p_np & (day_np <= mid)).astype(np.int64)),
            "b2": pa.array((p_np & (day_np > mid)).astype(np.int64)),
        })
        g = t.group_by("user_id").aggregate(
            [("b1", "max"), ("b2", "max")])
        return g.rename_columns(["user_id", "p_b1", "p_b2"])

    flags = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id").aggregate(Max("p_b1", alias_name="b1"),
                                      Max("p_b2", alias_name="b2")),
        pa.schema([("user_id", pa.int64()), ("b1", pa.int64()),
                   ("b2", pa.int64())]))

    def cells(b: pa.Table) -> pa.Table:
        b1 = b.column("b1").to_numpy(zero_copy_only=False)
        b2 = b.column("b2").to_numpy(zero_copy_only=False)
        return pa.table({
            "p_n00": pa.array([int(((b1 == 0) & (b2 == 0)).sum())],
                              pa.int64()),
            "p_n01": pa.array([int(((b1 == 0) & (b2 == 1)).sum())],
                              pa.int64()),
            "p_n10": pa.array([int(((b1 == 1) & (b2 == 0)).sum())],
                              pa.int64()),
            "p_n11": pa.array([int(((b1 == 1) & (b2 == 1)).sum())],
                              pa.int64()),
        })

    def finish(b: pa.Table) -> pa.Table:
        n00 = int(pc.sum(b.column("p_n00")).as_py() or 0)
        n01 = int(pc.sum(b.column("p_n01")).as_py() or 0)
        n10 = int(pc.sum(b.column("p_n10")).as_py() or 0)
        n11 = int(pc.sum(b.column("p_n11")).as_py() or 0)
        # zero discordant pairs ⇒ no evidence of change: χ² defined 0
        # (an all-NULL float column would degrade to object dtype
        # through the driver's row path and break the schema check)
        disc = n01 + n10
        chi2 = (float((n01 - n10) * (n01 - n10)) / float(disc)
                if disc > 0 else 0.0)
        return pa.table({
            "n00": pa.array([n00], pa.int64()),
            "n01": pa.array([n01], pa.int64()),
            "n10": pa.array([n10], pa.int64()),
            "n11": pa.array([n11], pa.int64()),
            "mcnemar_chi2": pa.array([chi2], pa.float64()),
        })

    return flags.map_batches(cells, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(finish, batch_format="pyarrow", batch_size=None)


def q_lineitem_branch_revenue(sf_dir: str) -> Dataset:
    """TPC-H-Q19-shaped multi-branch predicate revenue: three
    (brand, size-range, quantity-range) OR-branches, one number out.
    The part side is a DIM table — each branch's surviving part keys
    are resolved on the driver and broadcast as sorted key arrays
    (ray.put once, searchsorted per batch), so the fact scan is
    join-free: ONE column-pruned lineitem pass with vectorized branch
    masks, int64 cent-of-cent partial sums, and a single-row combine.
    Revenue is quantized at 1e4 exactly like revenue_by_nation."""
    import numpy as np

    BRANCHES = [("Brand#12", 1, 15, 1.0, 11.0),
                ("Brand#23", 1, 20, 10.0, 20.0),
                ("Brand#34", 1, 25, 20.0, 30.0)]

    part = rd.read_parquet(_t(sf_dir, "part"),
                           columns=["p_partkey", "p_brand", "p_size"])
    pt = _small_table(part)
    keys_per_branch = []
    if pt is not None:
        brand = np.asarray(pt.column("p_brand").to_pylist(),
                           dtype=object)
        size = pt.column("p_size").to_numpy(zero_copy_only=False)
        pk = pt.column("p_partkey").to_numpy(zero_copy_only=False)
        for b, lo, hi, _, _ in BRANCHES:
            m = (brand == b) & (size >= lo) & (size <= hi)
            keys_per_branch.append(np.sort(pk[m]))
    else:
        keys_per_branch = [np.array([], np.int64)] * 3
    keys_ref = ray.put(keys_per_branch)

    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice", "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        mask = np.zeros(len(pk), bool)
        for keys, (_, _, _, qlo, qhi) in zip(ks, BRANCHES):
            if len(keys) == 0:
                continue
            pos = np.searchsorted(keys, pk)
            inpart = (pos < len(keys)) & \
                (keys[np.minimum(pos, len(keys) - 1)] == pk)
            mask |= inpart & (qty >= qlo) & (qty <= qhi)
        f = b.filter(pa.array(mask))
        rev = scaled_int_sql(
            pc.multiply(f.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    f.column("l_discount"))), 10000.0)
        return pa.table({
            "p_n": pa.array([f.num_rows], pa.int64()),
            "p_r": pa.array([int(rev.sum())], pa.int64()),
        })

    def finish(b: pa.Table) -> pa.Table:
        n = int(pc.sum(b.column("p_n")).as_py() or 0)
        r = int(pc.sum(b.column("p_r")).as_py() or 0)
        return pa.table({
            "n_items": pa.array([n], pa.int64()),
            "revenue": pa.array([float(r) / 10000.0], pa.float64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(finish, batch_format="pyarrow", batch_size=None)


def q_documents_readability(sf_dir: str) -> Dataset:
    """Flesch reading-ease score per document — the classic
    readability gate a curation pipeline layers on top of the Gopher
    rules.  Every count is exact int64 (words = single-space splits,
    sentences = nonempty trimmed [.!?]+ pieces floored at 1, syllable
    proxy = [aeiouy]+ vowel groups in the lowercased text); the score
    is ONE float expression — 206.835 − 1.015·(w/s) − 84.6·(syl/w),
    left-associated exactly like the twin — over those ints.  Single
    scan, zero exchanges: every column is per-document."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b.column("text").combine_chunks(), "")
        low = pc.utf8_lower(txt)
        w = pc.add(pc.count_substring(txt, " "), 1) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        syl = pc.count_substring_regex(low, "[aeiouy]+") \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        pieces = pc.split_pattern_regex(txt, "[.!?]+")
        n_p = pc.list_value_length(pieces) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.utf8_trim_whitespace(pc.list_flatten(pieces))
        nonempty = pc.not_equal(flat, "").to_numpy(
            zero_copy_only=False).astype(np.int64)
        bounds = np.concatenate([[0], np.cumsum(n_p)])[:-1]
        s = np.add.reduceat(
            np.concatenate([nonempty, [0]]), bounds) \
            if len(n_p) else np.array([], np.int64)
        s[n_p == 0] = 0
        wf = np.maximum(w, 1).astype(np.float64)
        sf = np.maximum(s, 1).astype(np.float64)
        fre = 206.835 - 1.015 * (w / sf) - 84.6 * (syl / wf)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_words": pa.array(w, pa.int64()),
            "n_sentences": pa.array(s, pa.int64()),
            "n_syllables": pa.array(syl, pa.int64()),
            "fre": round_sql(pa.array(fre, pa.float64()), 6),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def q_parts_discount_elasticity(sf_dir: str) -> Dataset:
    """Discount-elasticity OLS per brand: the slope of order quantity
    against discount percentage — "does a deeper discount move more
    units of this brand?"  The part→brand map is DIM-sized and
    broadcast once (ray.put, searchsorted per batch — no fact join);
    quantity is integral and discount is 2-dp in this corpus, so all
    five OLS sums are exact int64 and the slope/intercept are single
    closed-form float expressions over them (the value_trend
    discipline).  ONE fact scan, one bounded (brand) combine."""
    import numpy as np

    part = rd.read_parquet(_t(sf_dir, "part"),
                           columns=["p_partkey", "p_brand"])
    pt = _small_table(part)
    if pt is None:
        return rd.from_arrow(pa.table({
            "p_brand": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "slope": pa.array([], pa.float64()),
            "intercept": pa.array([], pa.float64()),
        }))
    order = np.argsort(pt.column("p_partkey").to_numpy(
        zero_copy_only=False))
    pk_sorted = pt.column("p_partkey").to_numpy(
        zero_copy_only=False)[order]
    brands = np.asarray(pt.column("p_brand").to_pylist(),
                        dtype=object)[order]
    map_ref = ray.put((pk_sorted, brands))

    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_quantity",
                                  "l_discount"])

    def partial(b: pa.Table) -> pa.Table:
        pk_s, br = ray.get(map_ref)
        pk = b.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(pk_s, pk)
        pos = np.minimum(pos, len(pk_s) - 1)
        ok = pk_s[pos] == pk
        x = scaled_int_sql(b.column("l_discount"), 100.0)[ok]
        y = scaled_int_sql(b.column("l_quantity"), 1.0)[ok]
        t = pa.table({
            "p_brand": pa.array(br[pos[ok]], pa.string()),
            "n": pa.array(np.ones(len(x), np.int64)),
            "sx": pa.array(x, pa.int64()),
            "sy": pa.array(y, pa.int64()),
            "sxx": pa.array(x * x, pa.int64()),
            "sxy": pa.array(x * y, pa.int64()),
        })
        g = t.group_by("p_brand").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("sxy", "sum")])
        return g.rename_columns(["p_brand", "p_n", "p_sx", "p_sy",
                                 "p_sxx", "p_sxy"])

    agg = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["p_brand"],
        [("p_n", "sum"), ("p_sx", "sum"), ("p_sy", "sum"),
         ("p_sxx", "sum"), ("p_sxy", "sum")],
        ["p_brand", "p_n", "p_sx", "p_sy", "p_sxx", "p_sxy"],
        ["p_brand", "n", "sx", "sy", "sxx", "sxy"])

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False)
        sx = b.column("sx").to_numpy(zero_copy_only=False)
        sy = b.column("sy").to_numpy(zero_copy_only=False)
        sxx = b.column("sxx").to_numpy(zero_copy_only=False)
        sxy = b.column("sxy").to_numpy(zero_copy_only=False)
        den = n * sxx - sx * sx
        keep = (n >= 2) & (den != 0)
        nf = n[keep].astype(np.float64)
        num = (n[keep] * sxy[keep] - sx[keep] * sy[keep]) \
            .astype(np.float64)
        denf = den[keep].astype(np.float64)
        slope = num / denf
        intercept = (sy[keep].astype(np.float64)
                     - slope * sx[keep].astype(np.float64)) / nf
        return pa.table({
            "p_brand": pa.array(
                np.asarray(b.column("p_brand").to_pylist(),
                           dtype=object)[keep], pa.string()),
            "n": pa.array(n[keep], pa.int64()),
            "slope": round_sql(pa.array(slope, pa.float64()), 6),
            "intercept": round_sql(pa.array(intercept, pa.float64()),
                                   6),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_supplier_ship_lag(sf_dir: str) -> Dataset:
    """Supplier fulfilment-latency scorecard: per supplier, the
    distribution of (ship date − order date) in whole days — count,
    mean, exact median (ceil(n·q)−1 rank convention), and max.  The
    only fact-fact exchange is ONE hash join on l_orderkey with both
    sides column-pruned to ≤3 columns; per-lineitem lags then fold to
    the bounded (supplier, lag_day) histogram grid IN-batch, so the
    median pass never re-shuffles raw rows (the grouped-quantile
    histogram discipline)."""
    import numpy as np

    DAY_US = 86_400_000_000

    li = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_suppkey",
                                  "l_shipdate"])
    orders = rd.read_parquet(_t(sf_dir, "orders"),
                             columns=["o_orderkey", "o_orderdate"])

    def li_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_suppkey": b.column("l_suppkey"),
            "ship_us": b.column("l_shipdate").cast(pa.int64()),
        })

    def o_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "order_us": b.column("o_orderdate").cast(pa.int64()),
        })

    # r5: while the order dimension fits the broadcast bound, the
    # fact-fact hash join collapses to a sorted (orderkey → order_us)
    # probe (ray.put once, searchsorted per block; non-matching keys
    # drop like the inner join) — 10.7 s → ~3 s at sf0.1.  Beyond the
    # bound the hash join below is the fallback.
    if orders.count() <= EDGE_BROADCAST_MAX:
        ot = _small_table(orders.map_batches(o_prep,
                                             batch_format="pyarrow"))
        ok_ = ot.column("o_orderkey").to_numpy(zero_copy_only=False)
        ou_ = ot.column("order_us").to_numpy(zero_copy_only=False)
        o_order = np.argsort(ok_)
        omap_ref = ray.put((ok_[o_order], ou_[o_order]))

        def probe(b: pa.Table) -> pa.Table:
            ks, us = ray.get(omap_ref)
            lk = b.column("l_orderkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ks, lk)
            hit = (pos < len(ks)) & (
                ks[np.minimum(pos, max(len(ks) - 1, 0))] == lk)
            f = b.filter(pa.array(hit))
            return f.append_column("order_us", pa.array(
                us[pos[hit]], pa.int64()))

        j = li.map_batches(li_prep, batch_format="pyarrow") \
            .map_batches(probe, batch_format="pyarrow")
    else:
        j = li.map_batches(li_prep, batch_format="pyarrow").join(
            orders.map_batches(o_prep, batch_format="pyarrow"),
            join_type="inner", num_partitions=8,
            on=("l_orderkey",), right_on=("o_orderkey",))

    def grid_partial(b: pa.Table) -> pa.Table:
        # lag = day(ship) − day(order), NOT (ship−order)//day: this
        # corpus HAS ship-before-order rows, and a negative numerator
        # floors in numpy but truncates in DuckDB.  Day indices of
        # post-1970 timestamps are positive, so each // is sign-safe.
        lag = (b.column("ship_us").to_numpy(zero_copy_only=False)
               // DAY_US
               - b.column("order_us").to_numpy(zero_copy_only=False)
               // DAY_US)
        t = pa.table({
            "s": b.column("l_suppkey"),
            "lag": pa.array(lag, pa.int64()),
            "one": pa.array(np.ones(len(lag), np.int64)),
        })
        g = t.group_by(["s", "lag"]).aggregate([("one", "sum")])
        return g.rename_columns(["s", "lag", "p_n"])

    grid = with_schema(
        j.map_batches(grid_partial, batch_format="pyarrow")
        .groupby(["s", "lag"]).aggregate(Sum("p_n", alias_name="n")),
        pa.schema([("s", pa.int64()), ("lag", pa.int64()),
                   ("n", pa.int64())]))

    def fold(g: pa.Table) -> pa.Table:
        lag = g.column("lag").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(lag)
        lag, n = lag[order], n[order]
        tot = int(n.sum())
        cum = np.cumsum(n)
        med = int(lag[np.searchsorted(
            cum, int(np.ceil(tot * 0.5)))])  # ceil(n·q)−1 0-indexed
        mean = float(int((lag * n).sum())) / float(tot)
        return pa.table({
            "s_suppkey": g.column("s").slice(0, 1),
            "n_items": pa.array([tot], pa.int64()),
            "mean_lag_days": pa.array([mean], pa.float64()),
            "median_lag_days": pa.array([med], pa.int64()),
            "max_lag_days": pa.array([int(lag[-1])], pa.int64()),
        })

    return grid.groupby("s").map_groups(fold, batch_format="pyarrow")


def q_documents_hapax_by_source(sf_dir: str) -> Dataset:
    """Lexical-richness profile per ingest source: vocabulary size,
    token count, hapax legomena (tokens seen exactly once WITHIN the
    source), type-token ratio and hapax share — the quick "is this
    feed template spam or natural prose" screen (template spam has
    tiny TTR).  ONE (source, token) tf exchange; the per-source fold
    is a bounded in-group pass; the two ratios are single float
    divisions of exact ints."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "text"])

    def tok_rows(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        src = b.column("source").to_numpy(zero_copy_only=False)
        t = pa.table({
            "source": pa.array(np.repeat(src, n), pa.string()),
            "tok": flat,
        })
        g = t.group_by(["source", "tok"]).aggregate([("tok", "count")])
        return g.rename_columns(["source", "tok", "p_n"])

    st = with_schema(
        ds.map_batches(tok_rows, batch_format="pyarrow")
        .groupby(["source", "tok"]).aggregate(
            Sum("p_n", alias_name="tf")),
        pa.schema([("source", pa.string()), ("tok", pa.string()),
                   ("tf", pa.int64())]))

    def src_partial(b: pa.Table) -> pa.Table:
        tf = b.column("tf").to_numpy(zero_copy_only=False)
        t = pa.table({
            "source": b.column("source"),
            "v": pa.array(np.ones(len(tf), np.int64)),
            "n": pa.array(tf, pa.int64()),
            "h": pa.array((tf == 1).astype(np.int64)),
        })
        g = t.group_by("source").aggregate(
            [("v", "sum"), ("n", "sum"), ("h", "sum")])
        return g.rename_columns(["source", "p_v", "p_n", "p_h"])

    agg = _tree_combine(
        st.map_batches(src_partial, batch_format="pyarrow"),
        ["source"], [("p_v", "sum"), ("p_n", "sum"), ("p_h", "sum")],
        ["source", "p_v", "p_n", "p_h"],
        ["source", "vocab", "n_tokens", "n_hapax"])

    def finish(b: pa.Table) -> pa.Table:
        v = b.column("vocab").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = b.column("n_tokens").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        h = b.column("n_hapax").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "source": b.column("source"),
            "vocab": b.column("vocab").cast(pa.int64()),
            "n_tokens": b.column("n_tokens").cast(pa.int64()),
            "n_hapax": b.column("n_hapax").cast(pa.int64()),
            "ttr": pa.array(v / n, pa.float64()),
            "hapax_share": pa.array(h / v, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def q_transcripts_sft_pairs(sf_dir: str) -> Dataset:
    """SFT training-pair construction — THE transcript-to-training-data
    operator: for every assistant turn, a (prompt, response) row where
    the prompt is the previous ≤3 turns rendered "role: text" and
    joined by newline, the response is the assistant text.  Ordering
    is (turn_idx, ts) per conversation (duplicate turns are full-row
    duplicates, so tie order cannot change any window).  ONE
    groupby(conv_id) co-partition; the context window is three
    vectorized shifts — no per-row Python, no join, nothing exchanges
    twice.  Output key (conv_id, turn_idx) keeps pairs resumable.

    NUL hygiene (r5): embedded ``\\x00`` bytes are STRIPPED from the
    rendered text in both engines.  Beyond being junk in training
    text, NULs break pandas' multi-column sort (its hash factorizer
    compares object strings with C-string semantics, so two prompts
    identical up to an embedded NUL tie arbitrarily) — the driver's
    row-sorted hash compare then flips with Ray block arrival order
    (measured at sf0.1: two dup-turn context prefixes)."""
    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role",
                                  "text", "ts"])

    empty = pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int64()),
        "prompt": pa.array([], pa.string()),
        "response": pa.array([], pa.string()),
    })

    def pairs(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"), ("ts", "ascending")])
        role = np.asarray(g.column("role").to_pylist(), dtype=object)
        text = np.asarray(
            [(t if t is not None else "").replace("\x00", "")
             for t in g.column("text").to_pylist()], dtype=object)
        n = len(role)
        is_asst = role == "assistant"
        if not is_asst.any():
            return empty
        lines = np.array([f"{r}: {t}" for r, t in zip(role, text)],
                         dtype=object)
        idx = np.nonzero(is_asst)[0]
        prompts = ["\n".join(lines[max(0, i - 3):i]) for i in idx]
        return pa.table({
            "conv_id": pa.array(
                [g.column("conv_id")[0].as_py()] * len(idx),
                pa.string()),
            "turn_idx": pa.array(
                g.column("turn_idx").cast(pa.int64())
                .to_numpy(zero_copy_only=False)[idx], pa.int64()),
            "prompt": pa.array(prompts, pa.string()),
            "response": pa.array(list(text[idx]), pa.string()),
        })

    return ds.groupby("conv_id").map_groups(pairs,
                                            batch_format="pyarrow")


def q_transcripts_tool_chains(sf_dir: str) -> Dataset:
    """Tool-chain length histogram — how deep do the agent's
    consecutive tool-call runs go before a non-tool turn interrupts?
    Per conversation (ordered by turn_idx, ts), maximal runs of
    role='tool' turns are measured gaps-and-islands style and only
    the bounded (chain_len, count) grid leaves each group; one tree
    combine finishes.  The run-length multiset is tie-order invariant
    (duplicate turns are full-row duplicates, same role)."""
    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role", "ts"])

    empty = pa.table({"chain_len": pa.array([], pa.int64()),
                      "p_c": pa.array([], pa.int64())})

    def runs(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"), ("ts", "ascending")])
        is_tool = pc.equal(g.column("role"), "tool").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        if not is_tool.any():
            return empty
        x = np.concatenate([[False], is_tool, [False]]).astype(np.int8)
        d = np.diff(x)
        starts = np.nonzero(d == 1)[0]
        ends = np.nonzero(d == -1)[0]
        lens = ends - starts
        t = pa.table({"chain_len": pa.array(lens, pa.int64()),
                      "one": pa.array(np.ones(len(lens), np.int64))})
        out = t.group_by("chain_len").aggregate([("one", "sum")])
        return out.rename_columns(["chain_len", "p_c"])

    partials = ds.groupby("conv_id").map_groups(runs,
                                                batch_format="pyarrow")
    return _tree_combine(partials, ["chain_len"], [("p_c", "sum")],
                         ["chain_len", "p_c"],
                         ["chain_len", "n_chains"])


def _edge_jaccard_broadcast(edges: Dataset,
                            k: int | None) -> Dataset:
    """Broadcast-CSR edge-Jaccard kernel (the linkpred 2-hop shape
    with the edge filter INVERTED): per endpoint a, the 2-hop multiset
    counts cn(a, b) for b ∈ N(a), b > a — each edge's full count in
    ONE task, union = deg(a)+deg(b)−2−cn straight off the CSR row
    lengths, local top-k by the integer rank key cn·1e6 // union, so
    only ≤k rows per node move and no float ordering exists.  Same
    :data:`WEDGE_DEG_CAP` / :data:`TWO_HOP_GATHER_CAP` loud-log hub
    truncation as the linkpred kernel."""
    import logging

    import numpy as np

    names = ["id_a", "id_b", "common_neighbors", "union_size",
             "jaccard_q"]
    empty = pa.table({n: pa.array([], pa.int64()) for n in names})
    node_ids, offsets, dst, deg = _adj_csr(edges)
    if len(node_ids) == 0:
        return rd.from_arrow(empty)
    csr_ref = ray.put((node_ids, offsets, dst, deg))

    def block(b: pa.Table) -> pa.Table:
        ids_, off_, dst_, deg_ = ray.get(csr_ref)
        acc: dict[str, list] = {n: [] for n in names}
        log = logging.getLogger(__name__)
        for a in b.column("a").to_numpy(zero_copy_only=False):
            ai = int(np.searchsorted(ids_, a))
            nb = dst_[off_[ai]:off_[ai + 1]]
            if len(nb) < 1:
                continue
            if len(nb) > WEDGE_DEG_CAP:
                log.warning(
                    "edge_jaccard: hub endpoint dropped (deg=%d > "
                    "WEDGE_DEG_CAP=%d, node=%d)", len(nb),
                    WEDGE_DEG_CAP, int(a))
                continue
            zi = np.searchsorted(ids_, nb)
            lens = off_[zi + 1] - off_[zi]
            total = int(lens.sum())
            if total == 0:
                continue
            if total > TWO_HOP_GATHER_CAP:
                log.warning(
                    "edge_jaccard: 2-hop gather dropped (%d > cap=%d,"
                    " node=%d)", total, TWO_HOP_GATHER_CAP, int(a))
                continue
            cs = np.zeros(len(lens) + 1, np.int64)
            np.cumsum(lens, out=cs[1:])
            flat = (np.arange(total, dtype=np.int64)
                    - np.repeat(cs[:-1], lens)
                    + np.repeat(off_[zi], lens))
            cand = dst_[flat]
            o = np.argsort(cand, kind="stable")
            c = cand[o]
            starts = np.concatenate(
                [[0], np.flatnonzero(np.diff(c)) + 1])
            ub = c[starts]
            cnt = np.diff(np.concatenate([starts, [len(c)]]))
            # keep b > a that ARE edges (b ∈ sorted N(a))
            pos = np.searchsorted(nb, ub)
            is_edge = (pos < len(nb)) & (
                nb[np.minimum(pos, len(nb) - 1)] == ub)
            keep = np.flatnonzero((ub > a) & is_edge)
            if keep.size == 0:
                continue
            bsel, csel = ub[keep], cnt[keep]
            db = deg_[np.searchsorted(ids_, bsel)]
            union = len(nb) + db - 2 - csel
            jq = np.where(union > 0,
                          (csel * 1_000_000) // np.maximum(union, 1),
                          0).astype(np.int64)
            # k=None: emit every edge row (the triangle-sum caller);
            # else the per-group local top-k prune
            top = np.arange(len(keep)) if k is None \
                else np.lexsort((bsel, -jq))[:k]
            acc["id_a"].append(np.full(len(top), a, np.int64))
            acc["id_b"].append(bsel[top])
            acc["common_neighbors"].append(csel[top])
            acc["union_size"].append(union[top])
            acc["jaccard_q"].append(jq[top])
        if not acc["id_a"]:
            return empty
        return pa.table({n: pa.array(
            np.concatenate(acc[n]).astype(np.int64), pa.int64())
            for n in names})

    nparts = int(min(128, max(1, len(node_ids))))
    nodes = rd.from_arrow(pa.table({
        "a": pa.array(node_ids, pa.int64())})).repartition(nparts)
    return nodes.map_batches(block, batch_format="pyarrow")


def q_parts_copurchase_edge_jaccard(sf_dir: str) -> Dataset:
    """Edge embeddedness / neighborhood-Jaccard for the co-purchase
    graph: for each EDGE (a,b), |N(a)∩N(b)| over |N(a)∪N(b)\\{a,b}| —
    the tie-strength score community detectors threshold on.  Top 20
    by the score.  Primary plan (edges ≤ :data:`EDGE_BROADCAST_MAX`):
    the broadcast-CSR endpoint kernel (:func:`_edge_jaccard_broadcast`
    — 24.3 s → ~3 s warm at sf0.1); beyond the bound, the capped
    wedge expansion with the in-expansion edge filter (triangle-slot
    rows only reach the combine).  The rank key is the INTEGER
    cn·1e6 // union, so no float ordering exists anywhere."""
    import numpy as np

    edges = _copurchase_edges(sf_dir)
    out_schema = pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "common_neighbors": pa.array([], pa.int64()),
        "union_size": pa.array([], pa.int64()),
        "jaccard_q": pa.array([], pa.int64()),
    })
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(out_schema)
    if n_edges <= EDGE_BROADCAST_MAX:
        return _topk_combine(
            _edge_jaccard_broadcast(edges, 20), sorted_topk(
                [("jaccard_q", "descending"), ("id_a", "ascending"),
                 ("id_b", "ascending")], 20))

    ekeys = np.sort(np.concatenate([
        (t.column("id_a").to_numpy(zero_copy_only=False).astype(
            np.int64) << 32)
        | t.column("id_b").to_numpy(zero_copy_only=False)
        for t in ray.get(edges.to_arrow_refs()) if t.num_rows
    ]))
    ekeys_ref = ray.put(ekeys)
    deg_t = _small_table(_copurchase_degrees(edges))
    dk = deg_t.column("p").to_numpy(zero_copy_only=False)
    dv = deg_t.column("degree").to_numpy(zero_copy_only=False)
    order = np.argsort(dk)
    deg_ref = ray.put((dk[order], dv[order]))

    def sym(b: pa.Table) -> pa.Table:
        a = b.column("id_a").combine_chunks()
        c = b.column("id_b").combine_chunks()
        return pa.table({
            "ctr": pa.concat_arrays([a, c]),
            "nbr": pa.concat_arrays([c, a]),
        })

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "p_c": pa.array([], pa.int64())})

    def wedges(g: pa.Table) -> pa.Table:
        # emit ONLY wedge pairs that are themselves edges (broadcast
        # sorted-key probe INSIDE the expansion): the combine then
        # exchanges one row per (edge, shared center) — triangle
        # slots — instead of the full Σdeg² open-wedge table, which
        # measured 148M rows at sf0.1 and dominated the wall.
        # Hub centers drop loudly (O(deg²) from one group — see
        # WEDGE_DEG_CAP; oracle corpora sit ~45× below the cap).
        if g.num_rows < 2 or _df_capped(
                g, g.num_rows, WEDGE_DEG_CAP, "edge_jaccard_wedges",
                "ctr"):
            return empty
        ek = ray.get(ekeys_ref)
        nb = np.sort(g.column("nbr").to_numpy(zero_copy_only=False))
        i, j = np.triu_indices(len(nb), k=1)
        keys = (nb[i].astype(np.int64) << 32) | nb[j]
        pos = np.searchsorted(ek, keys)
        hit = (pos < len(ek)) & (ek[np.minimum(pos, len(ek) - 1)]
                                 == keys)
        if not hit.any():
            return empty
        return pa.table({"id_a": pa.array(nb[i][hit], pa.int64()),
                         "id_b": pa.array(nb[j][hit], pa.int64()),
                         "p_c": pa.array(
                             np.ones(int(hit.sum()), np.int64))})

    pairs = edges.map_batches(sym, batch_format="pyarrow") \
        .groupby("ctr").map_groups(wedges, batch_format="pyarrow") \
        .materialize()
    cn = _pair_combine(pairs, ["id_a", "id_b"], "common_neighbors")

    def edge_score(f: pa.Table) -> pa.Table:
        if f.num_rows == 0:
            return pa.table({
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "common_neighbors": pa.array([], pa.int64()),
                "union_size": pa.array([], pa.int64()),
                "jaccard_q": pa.array([], pa.int64()),
            })
        dks, dvs = ray.get(deg_ref)
        fa = f.column("id_a").to_numpy(zero_copy_only=False)
        fb = f.column("id_b").to_numpy(zero_copy_only=False)
        c = f.column("common_neighbors").to_numpy(
            zero_copy_only=False)
        da = dvs[np.searchsorted(dks, fa)]
        db = dvs[np.searchsorted(dks, fb)]
        union = da + db - 2 - c
        jq = np.where(union > 0, (c * 1_000_000) // np.maximum(
            union, 1), 0).astype(np.int64)
        return pa.table({
            "id_a": pa.array(fa, pa.int64()),
            "id_b": pa.array(fb, pa.int64()),
            "common_neighbors": pa.array(c, pa.int64()),
            "union_size": pa.array(union, pa.int64()),
            "jaccard_q": pa.array(jq, pa.int64()),
        })

    cand = cn.map_batches(edge_score, batch_format="pyarrow")
    return _topk_combine(cand, sorted_topk(
        [("jaccard_q", "descending"), ("id_a", "ascending"),
         ("id_b", "ascending")], 20))


def q_documents_lang_mix(sf_dir: str) -> Dataset:
    """Language-mixture audit per ingest source: per-language doc
    counts pivoted against the source total, each language's share,
    and the source's language ENTROPY (how monolingual is this feed)
    — the standard multilingual-corpus balance report.  One bounded
    (source, lang) combine; entropy is Σ c·q(ln c) over exact ints
    with the quantized-ln discipline, so the twin hashes bit-exact."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["source", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({"source": b.column("source"),
                      "lang": b.column("lang"),
                      "one": pa.array(
                          np.ones(b.num_rows, np.int64))})
        g = t.group_by(["source", "lang"]).aggregate([("one", "sum")])
        return g.rename_columns(["source", "lang", "p_n"])

    grid = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "lang"], [("p_n", "sum")],
        ["source", "lang", "p_n"], ["source", "lang", "n"])

    def finish(b: pa.Table) -> pa.Table:
        # single block (tree_combine ends repartition(1)): per-source
        # totals + entropy fold locally
        src = np.asarray(b.column("source").to_pylist(), dtype=object)
        n = b.column("n").to_numpy(zero_copy_only=False)
        tot = {}
        for s, c in zip(src, n):
            tot[s] = tot.get(s, 0) + int(c)
        totv = np.array([tot[s] for s in src], np.int64)
        share = n.astype(np.float64) / totv.astype(np.float64)
        # H = ln(tot) − (Σ c·q(ln c))/tot with q = round(·1e6)/1e6
        q_ln = scaled_int_sql(np.log(n.astype(np.float64)), 1e6)
        s1 = {}
        for s, c, ql in zip(src, n, q_ln):
            s1[s] = s1.get(s, 0) + int(c) * int(ql)
        s1v = np.array([s1[s] for s in src], np.float64)
        ent = (np.log(totv.astype(np.float64))
               - s1v / 1e6 / totv.astype(np.float64))
        return pa.table({
            "source": b.column("source"),
            "lang": b.column("lang"),
            "n_docs": b.column("n").cast(pa.int64()),
            "n_source": pa.array(totv, pa.int64()),
            "share": pa.array(share, pa.float64()),
            "entropy": round_sql(pa.array(ent, pa.float64()), 6),
        })

    return grid.map_batches(finish, batch_format="pyarrow",
                            batch_size=None)


def q_documents_lexical_rank(sf_dir: str) -> Dataset:
    """Mean corpus-frequency rank per document — the lexical-
    sophistication score (documents built from rare vocabulary rank
    high, template spam built from the corpus head ranks low) used to
    stratify curriculum sampling.  rank(token) = ROW_NUMBER over
    (tf DESC, tok ASC) on the GLOBAL vocabulary, computed distributed:
    the bounded (tf, count) histogram gives each tf-bucket's rank
    offset (broadcast as a sorted lookup), and each bucket's
    within-tf string order is resolved IN-GROUP by one
    groupby(tf).map_groups — the corpus vocabulary never sorts
    globally.  Per-doc means are then Σc·rank / Σc over exact ints
    via one (tok) join."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def tok_rows(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(b.column("text"), " ")
        flat = pc.list_flatten(toks)
        n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        t = pa.table({
            "doc_id": pa.array(np.repeat(ids, n), pa.int64()),
            "tok": flat,
        })
        g = t.group_by(["doc_id", "tok"]).aggregate([("tok", "count")])
        return g.rename_columns(["doc_id", "tok", "p_n"])

    dt = with_schema(
        ds.map_batches(tok_rows, batch_format="pyarrow")
        .groupby(["doc_id", "tok"]).aggregate(
            Sum("p_n", alias_name="c")),
        pa.schema([("doc_id", pa.int64()), ("tok", pa.string()),
                   ("c", pa.int64())]))

    def tf_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("tok").aggregate([("c", "sum")])
        return g.rename_columns(["tok", "p_n"])

    tf = with_schema(
        dt.map_batches(tf_partial, batch_format="pyarrow")
        .groupby("tok").aggregate(Sum("p_n", alias_name="tf")),
        pa.schema([("tok", pa.string()), ("tf", pa.int64())]))

    # bounded (tf, n_types) histogram → rank offset of each tf bucket
    def hist_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("tf").aggregate([("tf", "count")])
        return g.rename_columns(["tf", "p_n"])

    hist = _small_table(_tree_combine(
        tf.map_batches(hist_partial, batch_format="pyarrow"),
        ["tf"], [("p_n", "sum")], ["tf", "p_n"], ["tf", "n_types"]))
    if hist is None:
        return rd.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "mean_rank": pa.array([], pa.float64()),
        }))
    hv = hist.column("tf").to_numpy(zero_copy_only=False)
    hn = hist.column("n_types").to_numpy(zero_copy_only=False)
    order = np.argsort(-hv)  # tf descending
    hv, hn = hv[order], hn[order]
    offsets = np.concatenate([[0], np.cumsum(hn)])[:-1]
    off_ref = ray.put((hv[::-1], offsets[::-1]))  # ascending for search

    def rank_group(g: pa.Table) -> pa.Table:
        # one tf bucket: within-bucket rank is the token string order
        g = g.sort_by([("tok", "ascending")])
        hv_a, off_a = ray.get(off_ref)
        tfv = int(g.column("tf")[0].as_py())
        base = int(off_a[np.searchsorted(hv_a, tfv)])
        return pa.table({
            "tok": g.column("tok"),
            "rnk": pa.array(base + np.arange(1, g.num_rows + 1),
                            pa.int64()),
        })

    ranks = tf.groupby("tf").map_groups(rank_group,
                                        batch_format="pyarrow")
    j = dt.join(ranks, join_type="inner", num_partitions=8,
                on=("tok",))

    def doc_partial(b: pa.Table) -> pa.Table:
        c = b.column("c").to_numpy(zero_copy_only=False)
        r = b.column("rnk").to_numpy(zero_copy_only=False)
        t = pa.table({"doc_id": b.column("doc_id"),
                      "n": pa.array(c, pa.int64()),
                      "s": pa.array(c * r, pa.int64())})
        g = t.group_by("doc_id").aggregate([("n", "sum"), ("s", "sum")])
        return g.rename_columns(["doc_id", "p_n", "p_s"])

    agg = with_schema(
        j.map_batches(doc_partial, batch_format="pyarrow")
        .groupby("doc_id").aggregate(Sum("p_n", alias_name="n_tokens"),
                                     Sum("p_s", alias_name="s")),
        pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64()),
                   ("s", pa.int64())]))

    def finish(b: pa.Table) -> pa.Table:
        s = b.column("s").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = b.column("n_tokens").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "n_tokens": b.column("n_tokens").cast(pa.int64()),
            "mean_rank": pa.array(s / n, pa.float64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_events_bot_audit(sf_dir: str) -> Dataset:
    """Bot/automation screen per user — the abuse-ops staple two
    rules deep: burst bots (≥10 events inside one wall-clock minute)
    and metronome bots (≥5 perfectly regular minute-grain gaps,
    variance exactly 0).  100 % integer pipeline: minute indices are
    day-index-style positive floors, the gap variance is the
    cross-multiplied numerator n·Σg²−(Σg)² on minute-grain gaps (the
    int64-headroom choice: µs-grain squares overflow), so there is NO
    float anywhere.  ONE groupby(user_id) co-partition; each group
    folds internally."""
    import numpy as np

    MIN_US = 60_000_000

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "ts", "event_id"])

    def audit(g: pa.Table) -> pa.Table:
        g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
        us = g.column("ts").combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        minute = us // MIN_US
        _, counts = np.unique(minute, return_counts=True)
        mpm = int(counts.max())
        gaps = np.diff(minute)
        n = len(gaps)
        sg = int(gaps.sum())
        sg2 = int((gaps * gaps).sum())
        var_num = n * sg2 - sg * sg
        return pa.table({
            "user_id": g.column("user_id").slice(0, 1),
            "n_events": pa.array([g.num_rows], pa.int64()),
            "max_per_minute": pa.array([mpm], pa.int64()),
            "n_gaps": pa.array([n], pa.int64()),
            "gap_var_num": pa.array([var_num], pa.int64()),
            "is_burst": pa.array([mpm >= 10], pa.bool_()),
            # metronome = regular NONZERO period (an all-zero-gap
            # burst is the other rule, not this one)
            "is_metronome": pa.array(
                [n >= 5 and var_num == 0 and sg > 0], pa.bool_()),
        })

    return ds.groupby("user_id").map_groups(audit,
                                            batch_format="pyarrow")


def q_embeddings_kcenter(sf_dir: str) -> Dataset:
    """Greedy k-center (farthest-point) coreset selection over the
    embedding corpus — the diversity-sampling primitive behind
    coreset curation: start from vec_id 0, repeatedly add the point
    farthest from the selected set (k = 8).  Deterministic: distances
    are int64-quantized squared L2 (d²·1e6, half-away) and argmax ties
    break on the smaller vec_id.  Each of the k rounds is ONE
    broadcast-centers map_batches pass emitting per-block (best_d,
    best_id) partials — the corpus never moves, only k tiny candidate
    rows per block do.  Rows-only (iterative); numpy parity is
    pytest-pinned."""
    import numpy as np

    from ..util import vec_matrix

    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"]).materialize()

    K = 8
    centers: list[int] = [0]
    # center vectors live on the driver (k × d — tiny); the corpus
    # streams per round.  Seed vector via ONE vectorized Arrow-mask
    # pass (was: per-row Python ds.filter(lambda) — r5 perf fix)
    seed = _small_table(ds.map_batches(
        lambda b: b.filter(pc.equal(
            b.column("vec_id"), pa.scalar(0, pa.int64()))),
        batch_format="pyarrow"))
    if seed is None or seed.num_rows == 0:
        return rd.from_arrow(pa.table({
            "step": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "dist_q": pa.array([], pa.int64()),
        }))
    ctr_vecs = [np.asarray(seed.column("embedding")[0].as_py(),
                           np.float64)]
    out_steps, out_ids, out_d = [0], [0], [0]

    for step in range(1, K):
        cm = np.stack(ctr_vecs)
        cm_ref = ray.put(cm)

        def far_partial(b: pa.Table) -> pa.Table:
            c = ray.get(cm_ref)
            ids = b.column("vec_id").to_numpy(zero_copy_only=False)
            m = vec_matrix(b.column("embedding"))
            # squared L2 to nearest center, quantized
            d2 = ((m * m).sum(1)[:, None] - 2.0 * (m @ c.T)
                  + (c * c).sum(1)[None, :]).min(1)
            dq = scaled_int_sql(d2, 1e6)
            i = int(np.lexsort((ids, -dq))[0])  # max dq, min id
            # carry the winner's VECTOR with the candidate row so the
            # driver never re-scans the corpus for it (was: a per-row
            # Python ds.filter(lambda) full scan per round — r5 fix)
            return pa.table({
                "vec_id": pa.array([int(ids[i])], pa.int64()),
                "dq": pa.array([int(dq[i])], pa.int64()),
                "embedding": b.column("embedding").combine_chunks()
                .take(pa.array([i], pa.int64())),
            })

        cand = _small_table(ds.map_batches(far_partial,
                                           batch_format="pyarrow"))
        ids = cand.column("vec_id").to_numpy(zero_copy_only=False)
        dq = cand.column("dq").to_numpy(zero_copy_only=False)
        best = int(np.lexsort((ids, -dq))[0])
        bid, bdq = int(ids[best]), int(dq[best])
        ctr_vecs.append(np.asarray(
            cand.column("embedding")[best].as_py(), np.float64))
        centers.append(bid)
        out_steps.append(step)
        out_ids.append(bid)
        out_d.append(bdq)

    return rd.from_arrow(pa.table({
        "step": pa.array(out_steps, pa.int64()),
        "vec_id": pa.array(out_ids, pa.int64()),
        "dist_q": pa.array(out_d, pa.int64()),
    }))


def q_events_acf(sf_dir: str) -> Dataset:
    """Autocorrelation function of the daily event count at lags 1-7
    — the weekly-seasonality fingerprint (a spike at lag 7 = weekly
    cycle), extending q_events_daily_autocorr's lag-1 convention:
    each lag's Pearson runs over (day, day+lag) pairs both present in
    the calendar grid, all five moment sums exact big-ints, one float
    expression per lag replayed operand-for-operand.  The grid is
    bounded (calendar days) — one tree combine, driver fold."""
    import math

    import numpy as np

    def partial(b: pa.Table) -> pa.Table:
        g = pa.table({
            "day": pc.floor_temporal(b.column("ts"), unit="day"),
        }).group_by("day").aggregate([([], "count_all")])
        return g.rename_columns(["day", "p_n"])

    grid = _small_table(_tree_combine(
        rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])
        .map_batches(partial, batch_format="pyarrow"),
        ["day"], [("p_n", "sum")], ["day", "p_n"], ["day", "n"]))
    empty = pa.table({"lag": pa.array([], pa.int64()),
                      "n_pairs": pa.array([], pa.int64()),
                      "autocorr": pa.array([], pa.float64())})
    if grid is None or grid.num_rows < 3:
        return rd.from_arrow(empty)
    grid = grid.sort_by("day")
    days = grid.column("day").to_numpy(zero_copy_only=False) \
        .astype("datetime64[us]").astype(np.int64)
    n = grid.column("n").to_numpy(zero_copy_only=False)
    DAY_US = 86_400_000_000

    lags, npairs, acs = [], [], []
    for k in range(1, 8):
        pos = np.searchsorted(days, days + k * DAY_US)
        ok = (pos < len(days)) & \
            (days[np.minimum(pos, len(days) - 1)]
             == days + k * DAY_US)
        i = np.nonzero(ok)[0]
        if len(i) < 2:
            continue
        x = n[i].astype(object)
        y = n[pos[i]].astype(object)
        np_ = len(i)
        sx, sy = int(x.sum()), int(y.sum())
        sxx, syy = int((x * x).sum()), int((y * y).sum())
        sxy = int((x * y).sum())
        d1 = np_ * sxx - sx * sx
        d2 = np_ * syy - sy * sy
        if d1 <= 0 or d2 <= 0:
            continue
        r = float(np_ * sxy - sx * sy) / math.sqrt(
            float(d1) * float(d2))
        lags.append(k)
        npairs.append(np_)
        acs.append(round_sql_f(r, 6))
    return rd.from_arrow(pa.table({
        "lag": pa.array(lags, pa.int64()),
        "n_pairs": pa.array(npairs, pa.int64()),
        "autocorr": pa.array(acs, pa.float64()),
    }))


def q_transcripts_tool_followup(sf_dir: str) -> Dataset:
    """Agent-trace hygiene audit: is every tool result actually READ?
    For each role='tool' turn, the next non-tool turn in its
    conversation decides consumed (assistant speaks next) vs dangling
    (conversation ends, or user/system preempts).  One number each,
    plus the consumed rate.  The role sequence is tie-order invariant
    (duplicate turns are full-row duplicates).  ONE groupby(conv_id)
    co-partition emitting 3 ints per conversation; single-row tree
    fold after."""
    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role", "ts"])

    def audit(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"), ("ts", "ascending")])
        roles = np.asarray(g.column("role").to_pylist(), dtype=object)
        is_tool = roles == "tool"
        nt_idx = np.nonzero(~is_tool)[0]
        ti = np.nonzero(is_tool)[0]
        n_tool = len(ti)
        consumed = 0
        if n_tool and len(nt_idx):
            pos = np.searchsorted(nt_idx, ti, side="right")
            has_next = pos < len(nt_idx)
            nxt = nt_idx[np.minimum(pos, len(nt_idx) - 1)]
            consumed = int((has_next
                            & (roles[nxt] == "assistant")).sum())
        return pa.table({
            "p_tool": pa.array([n_tool], pa.int64()),
            "p_cons": pa.array([consumed], pa.int64()),
        })

    partials = ds.groupby("conv_id").map_groups(
        audit, batch_format="pyarrow")

    def finish(b: pa.Table) -> pa.Table:
        t = int(pc.sum(b.column("p_tool")).as_py() or 0)
        c = int(pc.sum(b.column("p_cons")).as_py() or 0)
        return pa.table({
            "n_tool_turns": pa.array([t], pa.int64()),
            "n_consumed": pa.array([c], pa.int64()),
            "n_dangling": pa.array([t - c], pa.int64()),
            "consumed_rate": pa.array(
                [float(c) / float(t) if t else 0.0], pa.float64()),
        })

    return partials.repartition(1) \
        .map_batches(finish, batch_format="pyarrow", batch_size=None)


def q_events_type_burstiness(sf_dir: str) -> Dataset:
    """Fano factor and Goh-Barabási burstiness of the daily count
    series per event type — the dispersion screen separating steady
    telemetry (F≈1 Poisson) from bursty human-driven types.  Over
    observed days only.  Identity that keeps it exact: with
    vn = n·Σx²−(Σx)², F = vn/(n·S) and
    B = (√vn − S)/(√vn + S) — both single float expressions over two
    exact int64 aggregates.  One bounded (type, day) exchange."""
    import numpy as np

    def partial(b: pa.Table) -> pa.Table:
        g = pa.table({
            "event_type": b.column("event_type"),
            "day": pc.floor_temporal(b.column("ts"), unit="day"),
        }).group_by(["event_type", "day"]).aggregate([([],
                                                       "count_all")])
        return g.rename_columns(["event_type", "day", "p_n"])

    grid = _tree_combine(
        rd.read_parquet(_t(sf_dir, "events"),
                        columns=["event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow"),
        ["event_type", "day"], [("p_n", "sum")],
        ["event_type", "day", "p_n"], ["event_type", "day", "n"])

    def finish(b: pa.Table) -> pa.Table:
        et = np.asarray(b.column("event_type").to_pylist(),
                        dtype=object)
        n = b.column("n").to_numpy(zero_copy_only=False)
        acc: dict = {}
        for e, c in zip(et, n):
            a = acc.setdefault(e, [0, 0, 0])
            a[0] += 1
            a[1] += int(c)
            a[2] += int(c) * int(c)
        keys = sorted(acc)
        nd = np.array([acc[k][0] for k in keys], np.int64)
        s = np.array([acc[k][1] for k in keys], np.int64)
        s2 = np.array([acc[k][2] for k in keys], np.int64)
        vn = nd * s2 - s * s
        fano = vn.astype(np.float64) / (nd * s).astype(np.float64)
        rt = np.sqrt(vn.astype(np.float64))
        burst = (rt - s.astype(np.float64)) \
            / (rt + s.astype(np.float64))
        return pa.table({
            "event_type": pa.array(list(keys), pa.string()),
            "n_days": pa.array(nd, pa.int64()),
            "n_total": pa.array(s, pa.int64()),
            "fano": round_sql(pa.array(fano, pa.float64()), 6),
            "burstiness": round_sql(pa.array(burst, pa.float64()), 6),
        })

    return grid.map_batches(finish, batch_format="pyarrow",
                            batch_size=None)


def q_documents_compression_ratio(sf_dir: str) -> Dataset:
    """Compressibility gate (the classic near-free quality signal:
    template spam and repetitive boilerplate compress far better than
    natural prose): per document, raw UTF-8 bytes, zlib-6 compressed
    bytes, and the ratio.  Deterministic for a fixed zlib build —
    rows-only under the driver gate (DuckDB has no zlib), with a
    direct-zlib parity pytest.  The per-row C call IS the workload
    (the extract_turn profile); everything around it is one scan."""
    import zlib

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        raw, comp = [], []
        for t in texts:
            enc = (t or "").encode("utf-8")
            raw.append(len(enc))
            comp.append(len(zlib.compress(enc, 6)))
        ratio = [c / r if r else 1.0 for c, r in zip(comp, raw)]
        return pa.table({
            "doc_id": b.column("doc_id"),
            "raw_bytes": pa.array(raw, pa.int64()),
            "compressed_bytes": pa.array(comp, pa.int64()),
            "ratio": pa.array(ratio, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def q_transcripts_link_density(sf_dir: str) -> Dataset:
    """Link-density screen over the HTML turns — the Readability/
    trafilatura-style boilerplate heuristic the flagship extractor
    applies, exposed as an oracle-checked per-turn report: for every
    '<!DOCTYPE'-opening turn, the anchor-element character mass
    (chars consumed by <a …>…</a> spans, via the SAME RE2 pattern in
    Arrow and DuckDB) over total chars.  Nav-heavy boilerplate turns
    score high, article-like turns score low.  ONE scan, zero
    exchanges; the division is the single float."""
    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "text"])

    PAT = r"<a [^>]*>[^<]*</a>"

    def score(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b.column("text").combine_chunks(), "")
        is_html = pc.starts_with(txt, "<!DOCTYPE")
        f = b.filter(is_html)
        t = pc.fill_null(f.column("text").combine_chunks(), "")
        total = pc.utf8_length(t).cast(pa.int64())
        stripped = pc.utf8_length(
            pc.replace_substring_regex(t, PAT, "")).cast(pa.int64())
        n_links = pc.count_substring_regex(t, PAT).cast(pa.int64())
        tn = total.to_numpy(zero_copy_only=False)
        sn = stripped.to_numpy(zero_copy_only=False)
        import numpy as np
        dens = (tn - sn).astype(np.float64) \
            / np.maximum(tn, 1).astype(np.float64)
        return pa.table({
            "conv_id": f.column("conv_id"),
            "turn_idx": f.column("turn_idx").cast(pa.int64()),
            "n_links": n_links,
            "total_chars": total,
            "link_chars": pa.array(tn - sn, pa.int64()),
            "link_density": pa.array(dens, pa.float64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def q_transcripts_md_structure(sf_dir: str) -> Dataset:
    """Markdown structural profile per markdown turn (ATX headers,
    inline links, code spans — the counts the markdown
    boilerplate-stripper keys on), for every turn with at least one
    ATX header line.  The three counters are the SAME RE2 patterns in
    Arrow and DuckDB; one scan, no exchange, all-integer output."""
    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "text"])

    H = r"(?m)^#+ "
    L = r"\[[^\]]*\]\([^)]*\)"
    C = r"`[^`]+`"

    def score(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b.column("text").combine_chunks(), "")
        n_h = pc.count_substring_regex(txt, H).cast(pa.int64())
        keep = pc.greater(n_h, 0)
        f = b.filter(keep)
        t = pc.fill_null(f.column("text").combine_chunks(), "")
        return pa.table({
            "conv_id": f.column("conv_id"),
            "turn_idx": f.column("turn_idx").cast(pa.int64()),
            "n_headers": pc.count_substring_regex(t, H)
            .cast(pa.int64()),
            "n_links": pc.count_substring_regex(t, L)
            .cast(pa.int64()),
            "n_code_spans": pc.count_substring_regex(t, C)
            .cast(pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def q_transcripts_system_prompts(sf_dir: str) -> Dataset:
    """Top-10 repeated system prompts — the boilerplate census a
    transcript pipeline runs before deciding what to strip or dedup:
    system turns keyed by md5(text), ranked by turn count (ties on
    the digest).  The (digest, conv) grid is bounded (distinct system
    prompts × conversations); ONE tree combine, then the per-digest
    fold and the top-10 slice on the single combined block.  md5 runs
    per DISTINCT text via dictionary encoding, not per row."""
    import hashlib

    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "role", "text"])

    def partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("role"), "system"))
        txt = pc.fill_null(f.column("text").combine_chunks(), "")
        d = txt.dictionary_encode()
        uniq = [hashlib.md5(
            (s or "").encode("utf-8")).hexdigest()
            for s in d.dictionary.to_pylist()]
        md5s = np.asarray(uniq, dtype=object)[
            d.indices.to_numpy(zero_copy_only=False)] \
            if f.num_rows else np.array([], dtype=object)
        t = pa.table({
            "sys_md5": pa.array(list(md5s), pa.string()),
            "conv_id": f.column("conv_id"),
            "one": pa.array(np.ones(f.num_rows, np.int64)),
        })
        g = t.group_by(["sys_md5", "conv_id"]).aggregate(
            [("one", "sum")])
        return g.rename_columns(["sys_md5", "conv_id", "p_n"])

    grid = _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["sys_md5", "conv_id"], [("p_n", "sum")],
        ["sys_md5", "conv_id", "p_n"], ["sys_md5", "conv_id", "n"])

    def finish(b: pa.Table) -> pa.Table:
        g = b.group_by("sys_md5").aggregate(
            [("n", "sum"), ("conv_id", "count")])
        g = g.rename_columns(["sys_md5", "n_turns", "n_convs"])
        g = g.sort_by([("n_turns", "descending"),
                       ("sys_md5", "ascending")]).slice(0, 10)
        return pa.table({
            "sys_md5": g.column("sys_md5"),
            "n_turns": g.column("n_turns").cast(pa.int64()),
            "n_convs": g.column("n_convs").cast(pa.int64()),
        })

    return grid.map_batches(finish, batch_format="pyarrow",
                            batch_size=None)


def q_transcripts_turn_integrity(sf_dir: str) -> Dataset:
    """Per-conversation turn-ordering integrity audit — the invariant
    the whole extraction engine rides on (stable per-conv ordering;
    reference analogue: the A4 grouping/ordering exchange) made an
    explicit, oracle-checked report: per conv the row count, distinct
    turn_idx count, index range, GAPS in the range, DUPLICATED
    indices, and a contiguous-from-zero flag.  At 10^12 turns this is
    the first audit a new dump gets.  Exchanges: one (conv, idx)
    distinct combine, then one per-conv fold — all counts exact
    int64."""
    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx"])

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "conv_id": b.column("conv_id"),
            "turn_idx": b.column("turn_idx").cast(pa.int64()),
            "one": pa.array(np.ones(b.num_rows, np.int64)),
        })
        g = t.group_by(["conv_id", "turn_idx"]).aggregate(
            [("one", "sum")])
        return g.rename_columns(["conv_id", "turn_idx", "p_n"])

    pairs = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["conv_id", "turn_idx"])
        .aggregate(Sum("p_n", alias_name="n_rows")),
        pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int64()),
                   ("n_rows", pa.int64())]))

    def add_one(b: pa.Table) -> pa.Table:
        return b.append_column(
            "one", pa.array(np.ones(b.num_rows, np.int64)))

    folded = with_schema(
        pairs.map_batches(add_one, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Sum("n_rows", alias_name="n_turns"),
                   Sum("one", alias_name="n_distinct"),
                   Min("turn_idx", alias_name="min_idx"),
                   Max("turn_idx", alias_name="max_idx")),
        pa.schema([("conv_id", pa.string()), ("n_turns", pa.int64()),
                   ("n_distinct", pa.int64()), ("min_idx", pa.int64()),
                   ("max_idx", pa.int64())]))

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n_turns").to_numpy(zero_copy_only=False)
        d = b.column("n_distinct").to_numpy(zero_copy_only=False)
        mn = b.column("min_idx").to_numpy(zero_copy_only=False)
        mx = b.column("max_idx").to_numpy(zero_copy_only=False)
        gaps = mx - mn + 1 - d
        dups = n - d
        return pa.table({
            "conv_id": b.column("conv_id"),
            "n_turns": b.column("n_turns"),
            "n_distinct": b.column("n_distinct"),
            "min_idx": b.column("min_idx"),
            "max_idx": b.column("max_idx"),
            "n_gaps": pa.array(gaps, pa.int64()),
            "n_dup_idx": pa.array(dups, pa.int64()),
            "is_contiguous": pa.array(
                (mn == 0) & (gaps == 0) & (dups == 0), pa.bool_()),
        })

    return folded.map_batches(finish, batch_format="pyarrow")


def q_transcripts_conv_prefix_groups(sf_dir: str) -> Dataset:
    """Conversation-prefix duplicate groups — the retry-storm /
    re-submission detector: conversations opening with the SAME first
    two turns (by (turn_idx, role, text) order) share a prefix hash;
    the report lists every prefix group with its conversation count
    and smallest example conv_id (groups with n_convs > 1 are the
    storms).  Per-conv md5 follows the audited samplers' rule — the
    hash IS the spec (DuckDB md5 twin).  Exchanges: one per-conv
    group pass emitting a single (hash, conv) row, then one bounded
    per-hash fold."""
    import hashlib

    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role",
                                  "text"])

    def prefix_row(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"),
                       ("role", "ascending"), ("text", "ascending")])
        k = min(2, g.num_rows)
        roles = g.column("role").slice(0, k).to_pylist()
        texts = g.column("text").slice(0, k).to_pylist()
        joined = "\x1f".join(
            f"{r}:{t if t is not None else ''}"
            for r, t in zip(roles, texts))
        h = hashlib.md5(joined.encode("utf-8")).hexdigest()
        return pa.table({
            "prefix_md5": pa.array([h], pa.string()),
            "conv_id": g.column("conv_id").slice(0, 1),
        })

    rows = ds.groupby("conv_id").map_groups(prefix_row,
                                            batch_format="pyarrow")

    def fold(g: pa.Table) -> pa.Table:
        cids = sorted(g.column("conv_id").to_pylist())
        return pa.table({
            "prefix_md5": g.column("prefix_md5").slice(0, 1),
            "n_convs": pa.array([g.num_rows], pa.int64()),
            "example_conv": pa.array([cids[0]], pa.string()),
        })

    return rows.groupby("prefix_md5").map_groups(
        fold, batch_format="pyarrow")


def q_transcripts_loop_runs(sf_dir: str) -> Dataset:
    """Agent-loop detector: per conversation, the longest run of
    CONSECUTIVE identical (role, tool, text) turns and the total count
    of repeated turns — the stuck-tool-cycle audit every agent-ops
    pipeline runs before training on transcripts.  Order-safe: rows
    ordered by (turn_idx, role, text); rows tied on all three keys are
    full duplicates, so adjacency is invariant.  ONE per-conv group
    pass; all counts exact int64 (gaps-and-islands twin)."""
    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role",
                                  "tool", "text"])

    def runs(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"),
                       ("role", "ascending"), ("text", "ascending")])
        n = g.num_rows
        if n == 0:
            return pa.table({
                "conv_id": pa.array([], pa.string()),
                "n_turns": pa.array([], pa.int64()),
                "max_run": pa.array([], pa.int64()),
                "n_repeat_turns": pa.array([], pa.int64()),
            })
        role = np.asarray(g.column("role").to_pylist(), dtype=object)
        tool = np.asarray(g.column("tool").to_pylist(), dtype=object)
        text = np.asarray(g.column("text").to_pylist(), dtype=object)
        same = ((role[1:] == role[:-1]) & (tool[1:] == tool[:-1])
                & (text[1:] == text[:-1])) if n > 1 \
            else np.zeros(0, bool)
        # islands: streak lengths of consecutive True in `same`
        max_run, cur = 1, 1
        for s in same:
            cur = cur + 1 if s else 1
            if cur > max_run:
                max_run = cur
        return pa.table({
            "conv_id": g.column("conv_id").slice(0, 1),
            "n_turns": pa.array([n], pa.int64()),
            "max_run": pa.array([max_run], pa.int64()),
            "n_repeat_turns": pa.array([int(same.sum())], pa.int64()),
        })

    return ds.groupby("conv_id").map_groups(runs,
                                            batch_format="pyarrow")


def q_transcripts_tool_latency_quantiles(sf_dir: str) -> Dataset:
    """Exact per-tool latency quantiles (p50/p90 of the µs gap between
    a tool-result turn and the turn before it) — the SLO table for the
    agent fleet's tools, on the exact-quantile histogram exchange
    (stages/quantiles.grouped_exact_quantiles): only (tool, gap,
    count) rows move, never raw turns.  Gap extraction is one per-conv
    sorted pass (ties are full-row duplicates — gap multiset
    invariant, the response_latency rule)."""
    import numpy as np

    from ..stages.quantiles import grouped_exact_quantiles

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role",
                                  "tool", "ts"])

    empty = pa.table({"tool": pa.array([], pa.string()),
                      "gap": pa.array([], pa.int64())})

    def gaps(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"), ("ts", "ascending")])
        if g.num_rows < 2:
            return empty
        us = g.column("ts").combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        d = np.diff(us)
        role = g.column("role").slice(1)
        tool = g.column("tool").slice(1)
        t = pa.table({"tool": tool, "gap": pa.array(d, pa.int64()),
                      "role": role})
        keep = pc.and_(pc.equal(t.column("role"), "tool"),
                       pc.not_equal(t.column("tool"), ""))
        return t.filter(keep).select(["tool", "gap"])

    rows = ds.groupby("conv_id").map_groups(gaps,
                                            batch_format="pyarrow")
    return grouped_exact_quantiles(rows, "tool", "gap", qs=(0.5, 0.9))


def q_transcripts_anchor_spans(sf_dir: str) -> Dataset:
    """Extraction SPAN parity under the oracle gate: the 1-based
    CHARACTER offset of the first 'Invoice' / 'Total' / 'Date' anchor
    per turn (0 = absent), for turns containing at least one — the
    field extractors' seek positions (core/fields.py anchors) checked
    bit-exact against DuckDB strpos.  Char semantics via ONE
    split_pattern(max_splits=1) + utf8_length per anchor (Arrow
    find_substring is BYTE-based and diverges after multibyte chars —
    measured; the split-prefix length is char-exact).  Pure
    single-scan map_batches, no exchange."""
    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "text"])

    ANCHORS = ("Invoice", "Total", "Date")

    def spans(b: pa.Table) -> pa.Table:
        text = b.column("text")
        cols = {"conv_id": b.column("conv_id"),
                "turn_idx": b.column("turn_idx").cast(pa.int64())}
        any_hit = None
        for a in ANCHORS:
            parts = pc.split_pattern(text, pattern=a, max_splits=1)
            hit = pc.greater(pc.list_value_length(parts), 1)
            prefix_len = pc.utf8_length(
                pc.list_element(parts, 0)).cast(pa.int64())
            pos = pc.if_else(hit, pc.add(prefix_len,
                                         pa.scalar(1, pa.int64())),
                             pa.scalar(0, pa.int64()))
            cols[f"pos_{a.lower()}"] = pos
            any_hit = hit if any_hit is None else pc.or_(any_hit, hit)
        return pa.table(cols).filter(any_hit)

    return ds.map_batches(spans, batch_format="pyarrow")


def q_transcripts_episodes(sf_dir: str) -> Dataset:
    """Conversation episode sessionization — split each conversation
    at idle gaps > 90 s (the transcript-payload twin of
    events_sessionize): per conv the episode count, the longest
    episode in turns, and the longest idle gap.  The threshold sits
    between the corpus's median (59 s) and p99 (118 s) intra-turn
    gap, so the split is exercised corpus-wide.  ONE per-conv group
    pass; ties are full-row duplicates (gap 0 → same episode), so the
    result is order-invariant; all values exact int64."""
    import numpy as np

    GAP_US = 90_000_000

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "ts"])

    def fold(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"), ("ts", "ascending")])
        n = g.num_rows
        us = g.column("ts").combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        d = np.diff(us)
        brk = d > GAP_US
        # longest run of rows NOT preceded by a break
        max_ep, cur = 1, 1
        for b_ in brk:
            cur = 1 if b_ else cur + 1
            if cur > max_ep:
                max_ep = cur
        return pa.table({
            "conv_id": g.column("conv_id").slice(0, 1),
            "n_turns": pa.array([n], pa.int64()),
            "n_episodes": pa.array([1 + int(brk.sum())], pa.int64()),
            "max_episode_turns": pa.array([max_ep], pa.int64()),
            "max_gap_us": pa.array(
                [int(d.max()) if len(d) else 0], pa.int64()),
        })

    return ds.groupby("conv_id").map_groups(fold,
                                            batch_format="pyarrow")


def q_parts_copurchase_communities(sf_dir: str) -> Dataset:
    """Strong-tie communities of the co-purchase graph: connected
    components over edges with weight ≥ 3 (parts co-bought in ≥3
    orders — the repeat-association backbone), reported as
    (component = min part id, n_parts).  Rides the shared hybrid
    components kernel (driver union-find under the 5M-edge cap /
    distributed min-label propagation beyond —
    stages/dedup.connected_components); the strong-edge filter makes
    the closure input structurally sparse (63 edges at sf0.01).  The
    twin replays the closure with WITH RECURSIVE."""
    from ..stages.dedup import connected_components

    W_MIN = 3

    edges = _copurchase_edges(sf_dir)
    strong = edges.map_batches(
        lambda b: b.filter(pc.greater_equal(
            b.column("w"), pa.scalar(W_MIN, pa.int64())))
        .select(["id_a", "id_b"]),
        batch_format="pyarrow").materialize()
    if strong.count() == 0:
        return rd.from_arrow(pa.table({
            "component": pa.array([], pa.int64()),
            "n_parts": pa.array([], pa.int64()),
        }))
    comp = connected_components(strong)

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["rep"]).group_by("rep").aggregate(
            [("rep", "count")])
        return g.rename_columns(["rep", "p_n"])

    return _tree_combine(
        comp.map_batches(partial, batch_format="pyarrow"),
        ["rep"], [("p_n", "sum")],
        ["rep", "p_n"], ["component", "n_parts"])


def q_transcripts_role_balance(sf_dir: str) -> Dataset:
    """Per-conversation role-balance audit — the SFT-prep gate that
    catches convs with no system prompt, user-less fragments, or
    assistant-free dumps before pair construction: per conv the turn
    count per role (fixed pivot), whether a system turn exists, and
    the FIRST role under the pinned (turn_idx, role, text) order.
    ONE per-conv group pass (role domain is fixed, so the pivot is
    in-group); planted duplicate rows are full-row dups → first-row
    identity is order-invariant."""
    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role",
                                  "text"])
    ROLES = ("system", "user", "assistant", "tool")

    def fold(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"),
                       ("role", "ascending"), ("text", "ascending")])
        roles = g.column("role").to_pylist()
        cnt = {r: 0 for r in ROLES}
        for r in roles:
            if r in cnt:
                cnt[r] += 1
        cols = {"conv_id": g.column("conv_id").slice(0, 1)}
        for r in ROLES:
            cols[f"n_{r}"] = pa.array([cnt[r]], pa.int64())
        cols["has_system"] = pa.array([cnt["system"] > 0], pa.bool_())
        cols["first_role"] = pa.array([roles[0]], pa.string())
        return pa.table(cols)

    return ds.groupby("conv_id").map_groups(fold,
                                            batch_format="pyarrow")


def q_embeddings_qa(sf_dir: str) -> Dataset:
    """Embedding-table QA report — the sanity gate before any
    ANN/dedup run: vector count, dimension min/max (ragged rows are a
    pipeline bug), zero-vector count, and the min/max/sum of the
    1e6-quantized squared L2 norm.  Norms are summed SEQUENTIALLY per
    row (np.cumsum, matching DuckDB list_sum's left-to-right fold
    bit-for-bit — numpy's default pairwise .sum() differs in the last
    ulp) then int64-quantized, so every aggregate is exact.  One scan,
    one bounded partial-row combine."""
    import numpy as np

    from ..util import vec_matrix

    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"])

    def partial(b: pa.Table) -> pa.Table:
        dims = pc.list_value_length(b.column("embedding")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = vec_matrix(b.column("embedding"))
        sq = m * m
        norm2 = np.cumsum(sq, axis=1)[:, -1] if m.shape[1] else \
            np.zeros(len(m))
        nq = scaled_int_sql(norm2, 1e6)
        return pa.table({
            "p_n": pa.array([b.num_rows], pa.int64()),
            "p_dmin": pa.array([int(dims.min())], pa.int64()),
            "p_dmax": pa.array([int(dims.max())], pa.int64()),
            "p_zero": pa.array([int((nq == 0).sum())], pa.int64()),
            "p_nmin": pa.array([int(nq.min())], pa.int64()),
            "p_nmax": pa.array([int(nq.max())], pa.int64()),
            "p_nsum": pa.array([int(nq.sum())], pa.int64()),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .aggregate(Sum("p_n", alias_name="n_vecs"),
                   Min("p_dmin", alias_name="dim_min"),
                   Max("p_dmax", alias_name="dim_max"),
                   Sum("p_zero", alias_name="n_zero"),
                   Min("p_nmin", alias_name="norm2q_min"),
                   Max("p_nmax", alias_name="norm2q_max"),
                   Sum("p_nsum", alias_name="norm2q_sum"))
    return rd.from_arrow(pa.table({
        k: pa.array([int(agg[k])], pa.int64())
        for k in ("n_vecs", "dim_min", "dim_max", "n_zero",
                  "norm2q_min", "norm2q_max", "norm2q_sum")}))


#: Source-sample size for the sampled-Brandes betweenness estimate:
#: exact betweenness is O(V·E) (all-sources BFS) — 4.6×10¹⁰ edge
#: relaxations at sf0.1 and unbounded at web scale — so the estimator
#: runs Brandes from a DETERMINISTIC md5-ranked sample of sources (the
#: standard Riondato/Kornaropoulos-style scale path; the sample is a
#: pure function of node identity, so the result is stable across
#: reruns and partitionings).
BETWEENNESS_SOURCES = 256


def q_parts_copurchase_betweenness(sf_dir: str) -> Dataset:
    """Sampled Brandes betweenness centrality over the co-purchase
    graph: top 20 parts by the summed single-source dependency score
    from :data:`BETWEENNESS_SOURCES` md5-sampled sources — the
    bridge-part detector (which parts connect otherwise-separate
    purchase communities).  Distribution: SOURCE-parallel Brandes —
    the node table fans out in blocks, each task runs vectorized
    level-synchronous BFS + dependency backprop per source against
    the broadcast CSR adjacency (the linkpred kernel's structure;
    same :data:`EDGE_BROADCAST_MAX` bound applies), and per-source
    dependency vectors are int64-QUANTIZED (δ·1e9, half-away) before the
    (node, partial) combine, so the sum is order- and
    partitioning-independent.  Scores count each (s → pair) once per
    sampled endpoint (no /2), documented.  Rows-only (iterative /
    sampled by nature); an independent pure-Python BFS reference pins
    the semantics in pytest."""
    import hashlib

    import numpy as np

    edges = _copurchase_edges(sf_dir)
    out_schema = pa.table({"p": pa.array([], pa.int64()),
                           "bc_q": pa.array([], pa.int64())})
    if edges.count() == 0:
        return rd.from_arrow(out_schema)

    node_ids, offsets, dst, deg = _adj_csr(edges)
    n = len(node_ids)
    # deterministic md5-ranked source sample (partition.row_hash_hex
    # convention: md5(str(id) + chr(31) + seed))
    ranked = sorted(
        range(n),
        key=lambda i: (hashlib.md5(
            f"{int(node_ids[i])}\x1f42".encode()).hexdigest(),
            int(node_ids[i])))
    sources = np.array(sorted(ranked[:BETWEENNESS_SOURCES]), np.int64)
    csr_ref = ray.put((node_ids, offsets, dst))

    def block(b: pa.Table) -> pa.Table:
        ids_, off_, dst_ = ray.get(csr_ref)
        nn = len(ids_)
        # node ids → CSR row indices once per batch
        sidx = b.column("s").to_numpy(zero_copy_only=False)
        acc = np.zeros(nn, np.int64)

        def gather(rows: "np.ndarray"):
            lens = off_[rows + 1] - off_[rows]
            tot = int(lens.sum())
            cs = np.zeros(len(lens) + 1, np.int64)
            np.cumsum(lens, out=cs[1:])
            flat = (np.arange(tot, dtype=np.int64)
                    - np.repeat(cs[:-1], lens)
                    + np.repeat(off_[rows], lens))
            return dst_[flat], lens

        for s in sidx:
            s = int(s)
            dist = np.full(nn, -1, np.int64)
            sigma = np.zeros(nn, np.int64)
            dist[s] = 0
            sigma[s] = 1
            levels = [np.array([s], np.int64)]
            cur = 0
            while len(levels[-1]):
                fr = levels[-1]
                cand, lens = gather(fr)
                ci = np.searchsorted(ids_, cand)
                w = np.repeat(sigma[fr], lens)
                new = np.unique(ci[dist[ci] == -1])
                dist[new] = cur + 1
                m2 = dist[ci] == cur + 1
                np.add.at(sigma, ci[m2], w[m2])
                levels.append(new)
                cur += 1
            delta = np.zeros(nn, np.float64)
            # process w-levels deepest → 1: contributions to a node
            # are complete before it is processed as w; level-1 w's
            # only feed delta[s], which is zeroed below
            for wl in range(len(levels) - 2, 0, -1):
                vs = levels[wl]
                if not len(vs):
                    continue
                cand, lens = gather(vs)
                ui = np.searchsorted(ids_, cand)
                vrep = np.repeat(vs, lens)
                mpred = dist[ui] == dist[vrep] - 1
                contrib = (sigma[ui[mpred]].astype(np.float64)
                           / sigma[vrep[mpred]].astype(np.float64)
                           * (1.0 + delta[vrep[mpred]]))
                np.add.at(delta, ui[mpred], contrib)
            delta[s] = 0.0
            acc += scaled_int_sql(delta, 1e9)
        nz = np.flatnonzero(acc)
        return pa.table({"p": pa.array(ids_[nz], pa.int64()),
                         "bc_q": pa.array(acc[nz], pa.int64())})

    nparts = int(min(64, max(1, len(sources))))
    src_ds = rd.from_arrow(pa.table({
        "s": pa.array(sources, pa.int64())})).repartition(nparts)
    partials = src_ds.map_batches(block, batch_format="pyarrow") \
        .materialize()
    combined = _pair_combine(partials, ["p"], "bc_q", pcol="bc_q")
    return _topk_combine(combined, sorted_topk(
        [("bc_q", "descending"), ("p", "ascending")], 20))


def q_documents_neardup_streaming(sf_dir: str) -> Dataset:
    """One-pass streaming near-dup FLAGGING over the documents corpus
    (stages/dedup.neardup_streaming): MinHash-LSH band digests routed
    through the shared mutable index shards — the incremental path
    beside the batch q_documents_minhash_neardup.  Output: doc_id +
    the neardup_hit candidate flag.  Rows-only (arrival-order
    any-winner by design; recall/cleanliness pinned by the prose
    corpus pytest)."""
    from ..stages.dedup import neardup_streaming

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    return neardup_streaming(ds).select_columns(
        ["doc_id", "neardup_hit"])


def q_transcripts_conv_dedup(sf_dir: str) -> Dataset:
    """Conversation-LEVEL exact-duplicate groups: two conversations
    whose ENTIRE ordered renders match ("role: text" joined by
    newline under the pinned (turn_idx, role, text) order) are copies
    — the whole-session twin of the turn-level dedup and the k=2
    prefix groups.  Per-conv md5 (the samplers' hash-IS-the-spec
    rule, NUL-stripped like the SFT render), one bounded per-hash
    fold; output (conv_md5, n_convs, example_conv) for EVERY group so
    the duplicate mass is auditable."""
    import hashlib

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role",
                                  "text"])

    def conv_row(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"),
                       ("role", "ascending"), ("text", "ascending")])
        joined = "\n".join(
            f"{r}: {(t if t is not None else '')}"
            for r, t in zip(g.column("role").to_pylist(),
                            g.column("text").to_pylist())) \
            .replace("\x00", "")
        h = hashlib.md5(joined.encode("utf-8")).hexdigest()
        return pa.table({
            "conv_md5": pa.array([h], pa.string()),
            "conv_id": g.column("conv_id").slice(0, 1),
        })

    rows = ds.groupby("conv_id").map_groups(conv_row,
                                            batch_format="pyarrow")

    def fold(g: pa.Table) -> pa.Table:
        cids = sorted(g.column("conv_id").to_pylist())
        return pa.table({
            "conv_md5": g.column("conv_md5").slice(0, 1),
            "n_convs": pa.array([g.num_rows], pa.int64()),
            "example_conv": pa.array([cids[0]], pa.string()),
        })

    return rows.groupby("conv_md5").map_groups(
        fold, batch_format="pyarrow")


def q_parts_small_qty_revenue(sf_dir: str) -> Dataset:
    """TPC-H Q17-shaped small-quantity-order revenue: the yearly gross
    loss if orders below 20% of a part's average order quantity moved
    to bulk (Σ extendedprice / 7 over those lineitems).  Exactness:
    the correlated threshold qty < 0.2·avg(qty) is evaluated as the
    INTEGER cross-multiply 5·qty·n_part < sum_qty (quantities are
    integral — no float compare anywhere), prices fold as exact int64
    cents, and the single final /7 division is the only float.  Plan:
    one (part) combine builds the per-part (n, Σqty) map, broadcast
    via ray.put (dim-sized); the fact table then streams ONCE through
    a vectorized filter + cents partial — no join, no second scan."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_partkey", "l_quantity",
                                  "l_extendedprice"])

    def qty_partial(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        t = pa.table({"p": b.column("l_partkey"),
                      "q": pa.array(q, pa.int64()),
                      "one": pa.array(np.ones(len(q), np.int64))})
        g = t.group_by("p").aggregate([("q", "sum"), ("one", "sum")])
        return g.rename_columns(["p", "p_q", "p_n"])

    stats = _small_table(with_schema(
        ds.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("p").aggregate(Sum("p_q", alias_name="sq"),
                                Sum("p_n", alias_name="n")),
        pa.schema([("p", pa.int64()), ("sq", pa.int64()),
                   ("n", pa.int64())])))
    if stats is None:
        return rd.from_arrow(pa.table({
            "avg_yearly": pa.array([], pa.float64())}))
    pk = stats.column("p").to_numpy(zero_copy_only=False)
    order = np.argsort(pk)
    stats_ref = ray.put((
        pk[order],
        stats.column("sq").to_numpy(zero_copy_only=False)[order],
        stats.column("n").to_numpy(zero_copy_only=False)[order]))

    def cents_partial(b: pa.Table) -> pa.Table:
        pks, sq, n = ray.get(stats_ref)
        p = b.column("l_partkey").to_numpy(zero_copy_only=False)
        q = b.column("l_quantity").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        i = np.searchsorted(pks, p)
        keep = 5 * q * n[i] < sq[i]
        cents = scaled_int_sql(
            b.column("l_extendedprice"), 100.0)[keep]
        return pa.table({"p_c": pa.array([int(cents.sum())],
                                         pa.int64())})

    total = int(ds.map_batches(cents_partial, batch_format="pyarrow")
                .aggregate(Sum("p_c", alias_name="c"))["c"] or 0)
    return rd.from_arrow(pa.table({
        "avg_yearly": pa.array([float(total) / 100.0 / 7.0],
                               pa.float64())}))


def q_suppliers_sole_late(sf_dir: str) -> Dataset:
    """TPC-H Q21-shaped sole-late-supplier census (receipt/commit
    dates absent from this corpus, so lateness is self-contained: a
    supplier is LATE in an order when one of its lineitems ships >30
    days after the order's FIRST shipment): for multi-supplier orders
    where EXACTLY ONE supplier is late, charge that supplier; top 20
    suppliers by such orders (count desc, name asc — the Q21 output
    shape).  ONE groupby(l_orderkey) co-partition with in-group
    vectorized set logic; only (suppkey, 1) partials leave; the
    supplier-name map is a broadcast dim."""
    import numpy as np

    DAY_US = 86_400_000_000

    ds = rd.read_parquet(_t(sf_dir, "lineitem"),
                         columns=["l_orderkey", "l_suppkey",
                                  "l_shipdate"])

    empty = pa.table({"s": pa.array([], pa.int64()),
                      "p_n": pa.array([], pa.int64())})

    def per_order(g: pa.Table) -> pa.Table:
        s = g.column("l_suppkey").to_numpy(zero_copy_only=False)
        if len(np.unique(s)) < 2:
            return empty
        us = g.column("l_shipdate").combine_chunks() \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        late = us > us.min() + 30 * DAY_US
        late_sup = np.unique(s[late])
        if len(late_sup) != 1:
            return empty
        return pa.table({"s": pa.array(late_sup, pa.int64()),
                         "p_n": pa.array([1], pa.int64())})

    counts = with_schema(
        ds.groupby("l_orderkey").map_groups(per_order,
                                            batch_format="pyarrow")
        .groupby("s").aggregate(Sum("p_n", alias_name="numwait")),
        pa.schema([("s", pa.int64()), ("numwait", pa.int64())]))

    name_t = _small_table(rd.read_parquet(
        _t(sf_dir, "supplier"), columns=["s_suppkey", "s_name"]))
    nk = name_t.column("s_suppkey").to_numpy(zero_copy_only=False)
    order = np.argsort(nk)
    names = np.asarray(name_t.column("s_name").to_pylist(),
                       dtype=object)[order]
    name_ref = ray.put((nk[order], names))

    def add_name(b: pa.Table) -> pa.Table:
        ks, nm = ray.get(name_ref)
        s = b.column("s").to_numpy(zero_copy_only=False)
        return pa.table({
            "s_name": pa.array(list(nm[np.searchsorted(ks, s)]),
                               pa.string()),
            "numwait": b.column("numwait"),
        })

    return _topk_combine(
        counts.map_batches(add_name, batch_format="pyarrow"),
        sorted_topk([("numwait", "descending"),
                     ("s_name", "ascending")], 20))


def q_parts_copurchase_closeness(sf_dir: str) -> Dataset:
    """Sampled harmonic closeness centrality over the co-purchase
    graph: H(v) = Σ_s 1/d(s, v) over the SAME deterministic
    md5-ranked source sample as the betweenness estimator — the
    reachability-robust closeness variant (disconnected pairs simply
    contribute 0).  Source-parallel vectorized BFS against the
    broadcast CSR; per-source reciprocal distances are int64-QUANTIZED
    (1e9, half-away) before the per-node combine so the sum is
    partitioning-independent.  Top 20 nodes by quantized score (ties
    by id).  Rows-only (sampled/iterative); independent dict-BFS
    reference pytest."""
    import hashlib

    import numpy as np

    edges = _copurchase_edges(sf_dir)
    if edges.count() == 0:
        return rd.from_arrow(pa.table({
            "p": pa.array([], pa.int64()),
            "hc_q": pa.array([], pa.int64())}))
    node_ids, offsets, dst, deg = _adj_csr(edges)
    n = len(node_ids)
    ranked = sorted(
        range(n),
        key=lambda i: (hashlib.md5(
            f"{int(node_ids[i])}\x1f42".encode()).hexdigest(),
            int(node_ids[i])))
    sources = np.array(sorted(ranked[:BETWEENNESS_SOURCES]), np.int64)
    csr_ref = ray.put((node_ids, offsets, dst))

    def block(b: pa.Table) -> pa.Table:
        ids_, off_, dst_ = ray.get(csr_ref)
        nn = len(ids_)
        acc = np.zeros(nn, np.int64)
        for s in b.column("s").to_numpy(zero_copy_only=False):
            s = int(s)
            dist = np.full(nn, -1, np.int64)
            dist[s] = 0
            frontier = np.array([s], np.int64)
            cur = 0
            while len(frontier):
                lens = off_[frontier + 1] - off_[frontier]
                tot = int(lens.sum())
                cs = np.zeros(len(lens) + 1, np.int64)
                np.cumsum(lens, out=cs[1:])
                flat = (np.arange(tot, dtype=np.int64)
                        - np.repeat(cs[:-1], lens)
                        + np.repeat(off_[frontier], lens))
                ci = np.searchsorted(ids_, dst_[flat])
                new = np.unique(ci[dist[ci] == -1])
                dist[new] = cur + 1
                frontier = new
                cur += 1
            reach = dist > 0
            acc[reach] += scaled_int_sql(
                1.0 / dist[reach].astype(np.float64), 1e9)
        nz = np.flatnonzero(acc)
        return pa.table({"p": pa.array(ids_[nz], pa.int64()),
                         "hc_q": pa.array(acc[nz], pa.int64())})

    nparts = int(min(64, max(1, len(sources))))
    src_ds = rd.from_arrow(pa.table({
        "s": pa.array(sources, pa.int64())})).repartition(nparts)
    partials = src_ds.map_batches(block, batch_format="pyarrow") \
        .materialize()
    combined = _pair_combine(partials, ["p"], "hc_q", pcol="hc_q")
    return _topk_combine(combined, sorted_topk(
        [("hc_q", "descending"), ("p", "ascending")], 20))


def q_documents_kneser_ney(sf_dir: str) -> Dataset:
    """Kneser-Ney smoothed bigram probabilities (D = 0.75, the
    interpolated form every n-gram LM pipeline ships) for the top-20
    corpus bigrams: P_KN(w2|w1) = max(c12−D, 0)/c1 +
    D·N1+(w1·)/c1 · (N1+(·w2)/|bigram types|).  All counts are exact
    int64 off ONE distinct-bigram grid (the top_bigrams exchange);
    the continuation/prefix stats for the 20 winners ride a second
    pass over the materialized grid against broadcast 20-key sets
    (bounded tree combines), and the final probability is a single
    float expression replayed token-identically in the twin.
    Exchanges: bigram groupby, top-k local prune, two ≤20-key
    combines."""
    import numpy as np

    from ..stages.terms import bigram_partials

    K = 20
    D = 0.75

    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])
    grid = with_schema(
        ds.map_batches(bigram_partials, batch_format="pyarrow")
        .groupby("bigram").aggregate(Sum("p_n", alias_name="c")),
        pa.schema([("bigram", pa.string()), ("c", pa.int64())])) \
        .materialize()
    nbt = grid.count()
    if nbt == 0:
        return rd.from_arrow(pa.table({
            "bigram": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
            "c1": pa.array([], pa.int64()),
            "n1f": pa.array([], pa.int64()),
            "n1b": pa.array([], pa.int64()),
            "p_kn": pa.array([], pa.float64()),
        }))

    top_t = _small_table(_topk_combine(grid, sorted_topk(
        [("c", "descending"), ("bigram", "ascending")], K)))
    tops = top_t.column("bigram").to_pylist()
    tc = top_t.column("c").to_numpy(zero_copy_only=False)
    w1s = [b.split(" ")[0] for b in tops]
    w2s = [b.split(" ")[1] for b in tops]
    keys_ref = ray.put((sorted(set(w1s)), sorted(set(w2s))))

    def stat_partial(b: pa.Table) -> pa.Table:
        w1set, w2set = ray.get(keys_ref)
        parts = pc.split_pattern(b.column("bigram"), " ")
        w1 = pc.list_element(parts, 0)
        w2 = pc.list_element(parts, 1)
        c = b.column("c")
        t1 = pa.table({"k": w1, "c": c}).filter(
            pc.is_in(w1, value_set=pa.array(w1set, pa.string())))
        g1 = t1.group_by("k").aggregate([("c", "sum"),
                                         ("c", "count")])
        g1 = g1.rename_columns(["k", "p_c1", "p_n1f"])
        t2 = pa.table({"k2": w2}).filter(
            pc.is_in(w2, value_set=pa.array(w2set, pa.string())))
        g2 = t2.group_by("k2").aggregate([([], "count_all")])
        g2 = g2.rename_columns(["k2", "p_n1b"])
        # one table, tag-separated (w1 stats rows + w2 stats rows)
        return pa.table({
            "k": pa.concat_arrays([
                g1.column("k").combine_chunks(),
                g2.column("k2").combine_chunks()]),
            "tag": pa.array([0] * g1.num_rows + [1] * g2.num_rows,
                            pa.int64()),
            "p_c1": pa.concat_arrays([
                g1.column("p_c1").cast(pa.int64()).combine_chunks(),
                pa.array([0] * g2.num_rows, pa.int64())]),
            "p_n1f": pa.concat_arrays([
                g1.column("p_n1f").cast(pa.int64()).combine_chunks(),
                pa.array([0] * g2.num_rows, pa.int64())]),
            "p_n1b": pa.concat_arrays([
                pa.array([0] * g1.num_rows, pa.int64()),
                g2.column("p_n1b").cast(pa.int64()).combine_chunks()]),
        })

    stats = _small_table(_tree_combine(
        grid.map_batches(stat_partial, batch_format="pyarrow"),
        ["k", "tag"],
        [("p_c1", "sum"), ("p_n1f", "sum"), ("p_n1b", "sum")],
        ["k", "tag", "p_c1", "p_n1f", "p_n1b"],
        ["k", "tag", "c1", "n1f", "n1b"]))
    c1m: dict = {}
    n1fm: dict = {}
    n1bm: dict = {}
    for r in stats.to_pylist():
        if r["tag"] == 0:
            c1m[r["k"]] = r["c1"]
            n1fm[r["k"]] = r["n1f"]
        else:
            n1bm[r["k"]] = r["n1b"]

    pkn = []
    for b, c12, w1, w2 in zip(tops, tc, w1s, w2s):
        c1, n1f, n1b = c1m[w1], n1fm[w1], n1bm[w2]
        pkn.append(max(float(c12) - D, 0.0) / float(c1)
                   + D * float(n1f) / float(c1)
                   * (float(n1b) / float(nbt)))
    return rd.from_arrow(pa.table({
        "bigram": pa.array(tops, pa.string()),
        "n": pa.array(tc, pa.int64()),
        "c1": pa.array([c1m[w] for w in w1s], pa.int64()),
        "n1f": pa.array([n1fm[w] for w in w1s], pa.int64()),
        "n1b": pa.array([n1bm[w] for w in w2s], pa.int64()),
        "p_kn": pa.array(pkn, pa.float64()),
    }))


def q_transcripts_training_windows(sf_dir: str) -> Dataset:
    """Turn-aligned training-window sharding: each conversation's
    turns pack greedily into ≤512-token windows (window_idx =
    EXCLUSIVE running token prefix-sum // 512 under the pinned
    (turn_idx, role, text) order) — the conversation analogue of
    documents_pack_bins that never splits inside a turn, the sharding
    step between SFT pair construction and batch assembly.  Output:
    one row per turn with its token count and window.  Duplicate
    turns are full-row duplicates: the two copies receive consecutive
    prefix sums whichever order they take, so the OUTPUT MULTISET is
    order-invariant (the driver's sorted hash sees identical rows).
    ONE per-conv group pass; the twin replays the prefix sum over a
    pinned ROW_NUMBER."""
    import numpy as np

    BUDGET = 512

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role",
                                  "text"])

    def windows(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"),
                       ("role", "ascending"), ("text", "ascending")])
        toks = pc.split_pattern(g.column("text"), " ")
        n = pc.list_value_length(toks).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        excl = np.concatenate([[0], np.cumsum(n)[:-1]])
        return pa.table({
            "conv_id": g.column("conv_id"),
            "turn_idx": g.column("turn_idx").cast(pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "window_idx": pa.array(excl // BUDGET, pa.int64()),
        })

    return ds.groupby("conv_id").map_groups(windows,
                                            batch_format="pyarrow")


def q_embeddings_mrl_recall(sf_dir: str) -> Dataset:
    """Matryoshka truncation recall — the MRL production question
    (Kusupati et al. 2022, public): if ANN ran on only the FIRST HALF
    of each embedding, how much of the full-dimension top-5 would
    survive?  Per query (vec_id < 8, the ann_topk query set):
    |top5_full ∩ top5_half| and recall = overlap/5.  Both rankings
    ride the existing brute-force kernel (broadcast query matrix,
    per-batch local top-k, driver heap merge — the corpus streams
    twice, half-dim via one vectorized slice); rank order parity with
    the twin follows the ann_topk discipline (cosines on this corpus
    are rank-separated)."""
    import numpy as np

    from ..stages.similarity import brute_force_topk

    ds = rd.read_parquet(_t(sf_dir, "embeddings"),
                         columns=["vec_id", "embedding"]).materialize()
    qt = _small_table(ds.map_batches(
        lambda b: b.filter(pc.less(b.column("vec_id"),
                                   pa.scalar(8, pa.int64()))),
        batch_format="pyarrow"))
    if qt is None or qt.num_rows == 0:
        return rd.from_arrow(pa.table({
            "query_id": pa.array([], pa.int64()),
            "n_overlap": pa.array([], pa.int64()),
            "recall": pa.array([], pa.float64()),
        }))
    order = np.argsort(qt.column("vec_id").to_numpy(
        zero_copy_only=False))
    qids = [int(qt.column("vec_id")[int(i)].as_py()) for i in order]
    qmat = np.asarray(qt.column("embedding").to_pylist(),
                      np.float64)[order]
    d = qmat.shape[1]
    h = d // 2

    full = brute_force_topk(ds, qmat, qids, k=5)

    def halve(b: pa.Table) -> pa.Table:
        from ..util import vec_matrix
        m = vec_matrix(b.column("embedding"))[:, :h]
        return pa.table({
            "vec_id": b.column("vec_id"),
            "embedding": pa.array(list(m), pa.list_(pa.float64())),
        })

    half = brute_force_topk(ds.map_batches(halve,
                                           batch_format="pyarrow"),
                            qmat[:, :h], qids, k=5)

    tf: dict[int, set] = {}
    for r in full.to_pylist():
        tf.setdefault(r["query_id"], set()).add(r["vec_id"])
    th: dict[int, set] = {}
    for r in half.to_pylist():
        th.setdefault(r["query_id"], set()).add(r["vec_id"])
    rows = sorted(tf)
    ov = [len(tf[q] & th.get(q, set())) for q in rows]
    return rd.from_arrow(pa.table({
        "query_id": pa.array(rows, pa.int64()),
        "n_overlap": pa.array(ov, pa.int64()),
        "recall": pa.array([float(o) / 5.0 for o in ov],
                           pa.float64()),
    }))


def q_events_cusum_changepoint(sf_dir: str) -> Dataset:
    """CUSUM mean-shift changepoint over the daily event-count series
    — the pipeline-ops alarm for "did volume change regime?": the
    split k maximizing |n·P_k − k·T| (the CUSUM deviation statistic
    cross-multiplied into EXACT int64 — P_k prefix sum, T total, so
    no float mean ever enters the argmax), earliest day on ties, plus
    the two regime means as single final divisions.  The (day, count)
    grid is calendar-bounded: one tree combine, driver fold (the ACF
    discipline)."""
    import numpy as np

    DAY_US = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        g = pa.table({
            "day": pc.divide(b.column("ts").cast(pa.int64()),
                             pa.scalar(DAY_US, pa.int64())),
        }).group_by("day").aggregate([([], "count_all")])
        return g.rename_columns(["day", "p_n"])

    grid = _small_table(_tree_combine(
        rd.read_parquet(_t(sf_dir, "events"), columns=["ts"])
        .map_batches(partial, batch_format="pyarrow"),
        ["day"], [("p_n", "sum")], ["day", "p_n"], ["day", "x"]))
    if grid is None or grid.num_rows < 2:
        return rd.from_arrow(pa.table({
            "change_day": pa.array([], pa.timestamp("us")),
            "k": pa.array([], pa.int64()),
            "cusum_stat": pa.array([], pa.int64()),
            "mean_before": pa.array([], pa.float64()),
            "mean_after": pa.array([], pa.float64()),
        }))
    day = grid.column("day").to_numpy(zero_copy_only=False)
    x = grid.column("x").to_numpy(zero_copy_only=False)
    o = np.argsort(day)
    day, x = day[o], x[o]
    n = len(x)
    P = np.cumsum(x)
    T = int(P[-1])
    ks = np.arange(1, n, dtype=np.int64)
    D = np.abs(n * P[:-1] - ks * T)
    best = int(np.argmax(D))  # np.argmax takes the FIRST max — ties
    k = best + 1              # → earliest split, mirrored in the twin
    return rd.from_arrow(pa.table({
        "change_day": pa.array([int(day[best]) * DAY_US],
                               pa.int64()).cast(pa.timestamp("us")),
        "k": pa.array([k], pa.int64()),
        "cusum_stat": pa.array([int(D[best])], pa.int64()),
        "mean_before": pa.array(
            [float(P[best]) / float(k)], pa.float64()),
        "mean_after": pa.array(
            [float(T - P[best]) / float(n - k)], pa.float64()),
    }))


def q_transcripts_training_prep(sf_dir: str) -> Dataset:
    """The composed transcript→training-data pipeline under ONE
    oracle gate (the documents_training_prep analogue for the
    north-star payload): (1) conversation-level exact dedup — only
    the min-conv_id winner of each full-render md5 group survives
    (the conv_dedup rule); (2) SFT pair construction over survivors
    (the sft_pairs rule, NUL-stripped); (3) token-budget windowing —
    pairs pack greedily per conversation into 1024-token shards by
    the exclusive prefix sum of (prompt + response) whitespace
    tokens.  Pair order within a conv is pinned to (turn_idx, prompt)
    — duplicate turns emit two pairs with DIFFERENT prompts (the
    later copy sees the earlier in its context), so turn_idx alone
    would leave the prefix order ambiguous.  Exchanges: two per-conv
    group passes, one bounded per-md5 fold, one hash semi-join of the
    fact against the winner set (never a broadcast — the winner set
    is conversation-count-sized).  Output: (conv_id, turn_idx,
    prompt_tokens, response_tokens, window_idx)."""
    import hashlib

    import numpy as np

    BUDGET = 1024

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role",
                                  "text", "ts"])

    def conv_row(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"),
                       ("role", "ascending"), ("text", "ascending")])
        joined = "\n".join(
            f"{r}: {(t if t is not None else '')}"
            for r, t in zip(g.column("role").to_pylist(),
                            g.column("text").to_pylist())) \
            .replace("\x00", "")
        h = hashlib.md5(joined.encode("utf-8")).hexdigest()
        return pa.table({
            "conv_md5": pa.array([h], pa.string()),
            "conv_id": g.column("conv_id").slice(0, 1),
        })

    def win(g: pa.Table) -> pa.Table:
        cids = sorted(g.column("conv_id").to_pylist())
        return pa.table({"conv_id": pa.array([cids[0]], pa.string())})

    winners = ds.select_columns(["conv_id", "turn_idx", "role",
                                 "text"]) \
        .groupby("conv_id").map_groups(conv_row,
                                       batch_format="pyarrow") \
        .groupby("conv_md5").map_groups(win, batch_format="pyarrow")
    winners = with_schema(winners,
                          pa.schema([("conv_id", pa.string())]))

    kept = ds.join(winners, join_type="inner", num_partitions=8,
                   on=("conv_id",))

    empty = pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int64()),
        "prompt_tokens": pa.array([], pa.int64()),
        "response_tokens": pa.array([], pa.int64()),
        "window_idx": pa.array([], pa.int64()),
    })

    def sft_windows(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"), ("ts", "ascending")])
        role = np.asarray(g.column("role").to_pylist(), dtype=object)
        text = np.asarray(
            [(t if t is not None else "").replace("\x00", "")
             for t in g.column("text").to_pylist()], dtype=object)
        is_asst = role == "assistant"
        if not is_asst.any():
            return empty
        lines = np.array([f"{r}: {t}" for r, t in zip(role, text)],
                         dtype=object)
        tidx = g.column("turn_idx").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        pairs = []
        for i in np.nonzero(is_asst)[0]:
            prompt = "\n".join(lines[max(0, i - 3):i])
            # SPACE-split token counts (string_split parity, the
            # training_windows convention — Python str.split() is
            # Unicode-whitespace and would diverge)
            pairs.append((int(tidx[i]), prompt,
                          len(prompt.split(" ")),
                          len(str(text[i]).split(" "))))
        # pin pair order: duplicate turns share turn_idx but their
        # prompts differ (the later copy's context holds the earlier)
        pairs.sort(key=lambda p: (p[0], p[1]))
        tok = np.array([p[2] + p[3] for p in pairs], np.int64)
        excl = np.concatenate([[0], np.cumsum(tok)[:-1]])
        return pa.table({
            "conv_id": pa.array(
                [g.column("conv_id")[0].as_py()] * len(pairs),
                pa.string()),
            "turn_idx": pa.array([p[0] for p in pairs], pa.int64()),
            "prompt_tokens": pa.array([p[2] for p in pairs],
                                      pa.int64()),
            "response_tokens": pa.array([p[3] for p in pairs],
                                        pa.int64()),
            "window_idx": pa.array(excl // BUDGET, pa.int64()),
        })

    return kept.groupby("conv_id").map_groups(sft_windows,
                                              batch_format="pyarrow")


def q_events_trimmed_mean(sf_dir: str) -> Dataset:
    """Exact 10% trimmed mean of event value per type — the robust
    location estimate beside the winsorize transform: drop the
    k = n//10 lowest and k highest observations, average the rest.
    Rides the keyed (type, cents) histogram exchange (the grouped
    exact-quantile discipline): per type the in-group fold clips each
    value's multiplicity to the [k, n−k) rank window with integer
    arithmetic — Σ clipped·cents and the trimmed count stay exact
    int64, the mean is ONE final division replayed operand-cast like
    the twin.  NULL values excluded (SQL aggregate semantics)."""
    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        f = b.filter(b.column("value").is_valid())
        cents = scaled_int_sql(f.column("value"), 100.0)
        t = pa.table({"event_type": f.column("event_type"),
                      "c": pa.array(cents, pa.int64()),
                      "one": pa.array(np.ones(f.num_rows, np.int64))})
        g = t.group_by(["event_type", "c"]).aggregate([("one", "sum")])
        return g.rename_columns(["event_type", "c", "p_n"])

    hist = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "c"])
        .aggregate(Sum("p_n", alias_name="n")),
        pa.schema([("event_type", pa.string()), ("c", pa.int64()),
                   ("n", pa.int64())]))

    def fold(g: pa.Table) -> pa.Table:
        g = g.sort_by([("c", "ascending")])
        c = g.column("c").to_numpy(zero_copy_only=False)
        m = g.column("n").to_numpy(zero_copy_only=False)
        n = int(m.sum())
        k = n // 10
        cum = np.cumsum(m)
        lo = cum - m  # exclusive prefix
        clipped = np.minimum(cum, n - k) - np.maximum(lo, k)
        clipped = np.maximum(clipped, 0)
        tot = int((clipped * c).sum())
        cnt = n - 2 * k
        return pa.table({
            "event_type": g.column("event_type").slice(0, 1),
            "n_values": pa.array([n], pa.int64()),
            "n_trimmed": pa.array([cnt], pa.int64()),
            "trimmed_mean": pa.array(
                [float(tot) / 100.0 / float(cnt)], pa.float64()),
        })

    return hist.groupby("event_type").map_groups(
        fold, batch_format="pyarrow")


def q_transcripts_role_lexical(sf_dir: str) -> Dataset:
    """Per-role lexical profile over the transcript corpus: turn
    count, total tokens, distinct vocabulary, hapax count (tokens a
    role uses exactly once) and type-token ratio — how templated is
    each role's language (system prompts repeat, users improvise).
    One (role, token) exchange carrying per-batch partial counts
    (role domain is fixed, token domain is the vocabulary), then a
    per-role in-group fold; TTR is the single final division."""
    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["role", "text"])

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.fill_null(b.column("text"), ""), " ")
        n = pc.list_value_length(toks).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        role = np.asarray(b.column("role").to_pylist(), dtype=object)
        t = pa.table({
            "role": pa.array(np.repeat(role, n), pa.string()),
            "tok": pc.list_flatten(toks),
            "one": pa.array(np.ones(int(n.sum()), np.int64)),
        })
        g = t.group_by(["role", "tok"]).aggregate([("one", "sum")])
        g = g.rename_columns(["role", "tok", "p_n"])
        # turn counts ride the same partial table, tagged with an
        # impossible token (tokens never contain spaces)
        tc = pa.table({
            "role": b.column("role"),
            "tok": pa.array(["\x1f turns"] * b.num_rows, pa.string()),
            "p_n": pa.array(np.ones(b.num_rows, np.int64)),
        })
        return pa.concat_tables([g, tc])

    grid = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["role", "tok"]).aggregate(Sum("p_n", alias_name="n")),
        pa.schema([("role", pa.string()), ("tok", pa.string()),
                   ("n", pa.int64())]))

    def fold(g: pa.Table) -> pa.Table:
        toks = g.column("tok").to_pylist()
        n = g.column("n").to_numpy(zero_copy_only=False)
        is_turn = np.array([t == "\x1f turns" for t in toks])
        n_turns = int(n[is_turn].sum()) if is_turn.any() else 0
        cnt = n[~is_turn]
        n_tokens = int(cnt.sum())
        n_distinct = int((~is_turn).sum())
        hapax = int((cnt == 1).sum())
        return pa.table({
            "role": g.column("role").slice(0, 1),
            "n_turns": pa.array([n_turns], pa.int64()),
            "n_tokens": pa.array([n_tokens], pa.int64()),
            "n_distinct": pa.array([n_distinct], pa.int64()),
            "n_hapax": pa.array([hapax], pa.int64()),
            "ttr": pa.array(
                [float(n_distinct) / float(n_tokens)
                 if n_tokens else 0.0], pa.float64()),
        })

    return grid.groupby("role").map_groups(fold,
                                           batch_format="pyarrow")


def q_flagship_backend_agreement(sf_dir: str) -> Dataset:
    """Extraction-backend agreement audit — the QA gate for the M7
    two-backend chain: run the flagship extractor BOTH ways (generic
    regexes vs template rule-packs preferred for pdf_reader turns)
    and report, per content type, how many turns produced identical
    (invoice_number, invoice_date, final_total_cents) fields.  Turns
    not routed through a template MUST agree 100% (pytest-pinned);
    the pdf rows measure real backend divergence.  Plan: each run
    packs its fields into one \\x1f-joined string, collapses planted
    duplicate turns with the packed-string Min (dup copies are
    identical), ONE hash join on (conv, turn), bounded per-type
    combine.  Rows-only (the extraction itself is the non-SQL
    workload)."""
    import numpy as np

    from .flagship import flagship

    cols = ["conv_id", "turn_idx", "content_type", "invoice_number",
            "invoice_date", "final_total_cents"]

    def pack(tag):
        def fn(b: pa.Table) -> pa.Table:
            parts = [
                pc.fill_null(b.column("content_type"), ""),
                pc.fill_null(b.column("invoice_number"), ""),
                pc.fill_null(b.column("invoice_date")
                             .cast(pa.string()), ""),
                pc.fill_null(b.column("final_total_cents")
                             .cast(pa.string()), ""),
            ]
            return pa.table({
                "conv_id": b.column("conv_id"),
                "turn_idx": b.column("turn_idx").cast(pa.int64()),
                tag: pc.binary_join_element_wise(*parts, "\x1f"),
            })
        return fn

    base = flagship(transcript_paths(sf_dir)).select_columns(cols) \
        .map_batches(pack("fa"), batch_format="pyarrow") \
        .groupby(["conv_id", "turn_idx"]) \
        .aggregate(Min("fa", alias_name="fa"))
    base = with_schema(base, pa.schema(
        [("conv_id", pa.string()), ("turn_idx", pa.int64()),
         ("fa", pa.string())]))
    tmpl = flagship(transcript_paths(sf_dir),
                    template_tools=("pdf_reader",)) \
        .select_columns(cols) \
        .map_batches(pack("fb"), batch_format="pyarrow") \
        .groupby(["conv_id", "turn_idx"]) \
        .aggregate(Min("fb", alias_name="fb"))
    tmpl = with_schema(tmpl, pa.schema(
        [("conv_id", pa.string()), ("turn_idx", pa.int64()),
         ("fb", pa.string())]))

    j = base.join(tmpl, join_type="inner", num_partitions=8,
                  on=("conv_id", "turn_idx"))

    def partial(b: pa.Table) -> pa.Table:
        fa = b.column("fa").to_pylist()
        fb = b.column("fb").to_pylist()
        ctype = [s.split("\x1f", 1)[0] for s in fa]
        agree = np.array([x == y for x, y in zip(fa, fb)], np.int64)
        t = pa.table({
            "content_type": pa.array(ctype, pa.string()),
            "one": pa.array(np.ones(len(fa), np.int64)),
            "agr": pa.array(agree, pa.int64()),
        })
        g = t.group_by("content_type").aggregate(
            [("one", "sum"), ("agr", "sum")])
        return g.rename_columns(["content_type", "p_n", "p_a"])

    return _tree_combine(
        j.map_batches(partial, batch_format="pyarrow"),
        ["content_type"], [("p_n", "sum"), ("p_a", "sum")],
        ["content_type", "p_n", "p_a"],
        ["content_type", "n_turns", "n_agree"])


def q_transcripts_preference_pairs(sf_dir: str) -> Dataset:
    """Preference-pair (DPO/RLHF-style) construction — the companion
    to q_transcripts_sft_pairs on the training-data path: key every
    assistant turn by its nearest PRECEDING user turn's text, and for
    each prompt answered with >= 2 distinct responses across the
    corpus emit (prompt, n_responses, chosen, rejected) where the
    deterministic stand-in reward ranks responses by (longer, then
    lexicographically smaller).  Two exchanges total: one
    groupby(conv_id) co-partition that emits each group's DISTINCT
    (prompt, response) pairs (retry-storm prefix duplicates collapse
    here), then one groupby(prompt) whose groups are a handful of
    candidate responses each.  NUL bytes are stripped in both engines
    (the pandas C-string sort hazard, see q_transcripts_sft_pairs)."""
    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role",
                                  "text", "ts"])

    empty_pr = pa.table({"prompt": pa.array([], pa.string()),
                         "response": pa.array([], pa.string())})

    def pairs(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"), ("ts", "ascending")])
        role = np.asarray(g.column("role").to_pylist(), dtype=object)
        text = np.asarray(
            [(t if t is not None else "").replace("\x00", "")
             for t in g.column("text").to_pylist()], dtype=object)
        user_idx = np.nonzero(role == "user")[0]
        asst_idx = np.nonzero(role == "assistant")[0]
        if not len(user_idx) or not len(asst_idx):
            return empty_pr
        pos = np.searchsorted(user_idx, asst_idx, side="left") - 1
        keep = pos >= 0
        if not keep.any():
            return empty_pr
        seen = sorted(set(zip(text[user_idx[pos[keep]]],
                              text[asst_idx[keep]])))
        return pa.table({
            "prompt": pa.array([p for p, _ in seen], pa.string()),
            "response": pa.array([r for _, r in seen], pa.string()),
        })

    empty_out = pa.table({"prompt": pa.array([], pa.string()),
                          "n_responses": pa.array([], pa.int64()),
                          "chosen": pa.array([], pa.string()),
                          "rejected": pa.array([], pa.string())})

    def fold(g: pa.Table) -> pa.Table:
        rs = sorted(set(g.column("response").to_pylist()),
                    key=lambda r: (-len(r), r))
        if len(rs) < 2:
            return empty_out
        return pa.table({
            "prompt": g.column("prompt").slice(0, 1),
            "n_responses": pa.array([len(rs)], pa.int64()),
            "chosen": pa.array([rs[0]], pa.string()),
            "rejected": pa.array([rs[-1]], pa.string()),
        })

    cand = ds.groupby("conv_id").map_groups(pairs,
                                            batch_format="pyarrow")
    cand = with_schema(cand, pa.schema([("prompt", pa.string()),
                                        ("response", pa.string())]))
    return cand.groupby("prompt").map_groups(fold,
                                             batch_format="pyarrow")


def _luhn_ok(num: str) -> bool:
    """Luhn checksum over a digit string (rightmost digit undoubled)."""
    s = 0
    for i, ch in enumerate(reversed(num)):
        d = ord(ch) - 48
        if i % 2 == 1:
            d = d * 2
            if d > 9:
                d -= 9
        s += d
    return s % 10 == 0


def q_transcripts_luhn_audit(sf_dir: str) -> Dataset:
    """Checksum-valid identifier audit per role — the PII-risk triage
    step before scrubbing: every run of >= 8 consecutive digits is a
    candidate identifier; Luhn-validate each (the checksum used by
    card/IMEI-style numbers) and report per role how many turns carry
    candidates, total and distinct candidate counts, and how many
    pass Luhn.  Scale shape: an Arrow regex prefilter keeps only the
    rows containing a digit run (~3% of the corpus) before the Python
    findall, the (role, num) grid that exchanges is the bounded
    candidate vocabulary, and turn counts ride the same grid under an
    impossible non-digit key."""
    import re as _re

    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["role", "text"])
    pat = _re.compile(r"[0-9]{8,}")

    def partial(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b.column("text"), "")
        has = pc.match_substring_regex(txt, "[0-9]{8,}")
        f = pa.table({"role": b.column("role"),
                      "text": txt}).filter(has)
        roles, nums = [], []
        tagged_roles = f.column("role").to_pylist()
        for role, t in zip(tagged_roles, f.column("text").to_pylist()):
            for m in pat.findall(t):
                roles.append(role)
                nums.append(m)
        t = pa.table({"role": pa.array(roles + tagged_roles,
                                       pa.string()),
                      "num": pa.array(
                          nums + ["\x1f"] * len(tagged_roles),
                          pa.string()),
                      "one": pa.array(
                          np.ones(len(roles) + len(tagged_roles),
                                  np.int64))})
        g = t.group_by(["role", "num"]).aggregate([("one", "sum")])
        return g.rename_columns(["role", "num", "p_n"])

    grid = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["role", "num"]).aggregate(Sum("p_n", alias_name="n")),
        pa.schema([("role", pa.string()), ("num", pa.string()),
                   ("n", pa.int64())]))

    def fold(g: pa.Table) -> pa.Table:
        nums = g.column("num").to_pylist()
        n = g.column("n").to_numpy(zero_copy_only=False)
        is_tag = np.array([x == "\x1f" for x in nums])
        turns = int(n[is_tag].sum()) if is_tag.any() else 0
        cnt = n[~is_tag]
        real = [x for x, t in zip(nums, is_tag) if not t]
        if not real:
            return pa.table({"role": pa.array([], pa.string())})
        ok = np.array([_luhn_ok(x) for x in real])
        return pa.table({
            "role": g.column("role").slice(0, 1),
            "n_turns_with_ids": pa.array([turns], pa.int64()),
            "n_ids": pa.array([int(cnt.sum())], pa.int64()),
            "n_luhn_valid": pa.array([int(cnt[ok].sum())], pa.int64()),
            "n_distinct_ids": pa.array([len(real)], pa.int64()),
            "n_distinct_valid": pa.array([int(ok.sum())], pa.int64()),
        })

    return grid.groupby("role").map_groups(fold,
                                           batch_format="pyarrow")


def q_transcripts_encoding_audit(sf_dir: str) -> Dataset:
    """Text-encoding hygiene report per role — the mojibake/control
    -character gate a corpus passes before tokenization: per role the
    turn count, turns containing (and total occurrences of) non-ASCII
    code points, C0/DEL control characters (newline and tab excluded
    — they are legitimate structure), and U+FFFD replacement
    characters (the signature of a decode error upstream).  Fully
    vectorized: three Arrow count_substring_regex passes per batch
    (RE2 counts code points, matching the DuckDB twin), one bounded
    (role) tree combine."""
    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["role", "text"])

    NONASCII = "[^\x00-\x7f]"
    CTRL = "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
    REPL = "�"

    def partial(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b.column("text"), "")
        na = pc.count_substring_regex(txt, NONASCII).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ct = pc.count_substring_regex(txt, CTRL).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        rp = pc.count_substring(txt, REPL).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        t = pa.table({
            "role": b.column("role"),
            "one": pa.array(np.ones(b.num_rows, np.int64)),
            "na_t": pa.array((na > 0).astype(np.int64)),
            "na_c": pa.array(na),
            "ct_t": pa.array((ct > 0).astype(np.int64)),
            "ct_c": pa.array(ct),
            "rp_c": pa.array(rp),
        })
        g = t.group_by("role").aggregate(
            [("one", "sum"), ("na_t", "sum"), ("na_c", "sum"),
             ("ct_t", "sum"), ("ct_c", "sum"), ("rp_c", "sum")])
        return g.rename_columns(
            ["role", "p_n", "p_nat", "p_nac", "p_ctt", "p_ctc",
             "p_rpc"])

    return _tree_combine(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["role"],
        [("p_n", "sum"), ("p_nat", "sum"), ("p_nac", "sum"),
         ("p_ctt", "sum"), ("p_ctc", "sum"), ("p_rpc", "sum")],
        ["role", "p_n", "p_nat", "p_nac", "p_ctt", "p_ctc", "p_rpc"],
        ["role", "n_turns", "n_nonascii_turns", "n_nonascii_chars",
         "n_ctrl_turns", "n_ctrl_chars", "n_replacement_chars"])


def q_transcripts_tool_transitions(sf_dir: str) -> pa.Table:
    """Tool-transition matrix — which tool does the agent reach for
    after which (the tool-usage analogue of the role-transition
    fingerprint): per conversation ordered by (turn_idx, ts), the
    sequence of named-tool turns (role='tool', tool <> ''), every
    adjacent prev_tool -> next_tool step, and the transition
    probability out of each prev_tool.  Duplicate turns are full-row
    duplicates, so tie order cannot change the pair multiset.  One
    groupby(conv_id) co-partition emitting <= |tools|^2 partials per
    group, a bounded tree combine, one single-block probability
    pass."""
    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "turn_idx", "role",
                                  "tool", "ts"])

    empty = pa.table({"prev_tool": pa.array([], pa.string()),
                      "next_tool": pa.array([], pa.string()),
                      "p_c": pa.array([], pa.int64())})

    def steps(g: pa.Table) -> pa.Table:
        g = g.sort_by([("turn_idx", "ascending"), ("ts", "ascending")])
        mask = pc.and_(pc.equal(g.column("role"), "tool"),
                       pc.not_equal(pc.fill_null(g.column("tool"), ""),
                                    ""))
        f = g.filter(mask)
        t = f.column("tool").combine_chunks()
        if len(t) < 2:
            return empty
        out = pa.table({
            "prev_tool": t.slice(0, len(t) - 1),
            "next_tool": t.slice(1),
            "one": pa.array(np.ones(len(t) - 1, np.int64)),
        }).group_by(["prev_tool", "next_tool"]).aggregate(
            [("one", "sum")])
        return out.rename_columns(["prev_tool", "next_tool", "p_c"])

    partials = ds.groupby("conv_id").map_groups(steps,
                                                batch_format="pyarrow")
    counts = _tree_combine(partials, ["prev_tool", "next_tool"],
                           [("p_c", "sum")],
                           ["prev_tool", "next_tool", "p_c"],
                           ["prev_tool", "next_tool", "n_trans"])

    def probs(b: pa.Table) -> pa.Table:
        tot = b.group_by(["prev_tool"]).aggregate([("n_trans", "sum")])
        m = dict(zip(tot.column("prev_tool").to_pylist(),
                     tot.column("n_trans_sum").to_pylist()))
        n = b.column("n_trans").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        d = np.array([m[p] for p in
                      b.column("prev_tool").to_pylist()], np.float64)
        return b.append_column("p", pa.array(n / d, pa.float64()))

    out = counts.map_batches(probs, batch_format="pyarrow",
                             batch_size=None)
    return _small_table(out)


def q_parts_copurchase_modularity(sf_dir: str) -> Dataset:
    """Newman modularity of the strong-tie community partition over
    the FULL co-purchase graph — the quality score for the community
    detection the engine already runs: communities are the w>=3
    connected components (q_parts_copurchase_communities), every
    other node is its own singleton, and
    Q = sum_c [ L_c/m - (D_c/2m)^2 ] is computed as the EXACT integer
    numerator q_num = sum_c (4*m*L_c - D_c^2) over 4*m^2 — the only
    float is the final division, replayed operand-for-operand by the
    HUGEINT twin.  Scale shape: the strong backbone is sparse by
    construction, so its component map broadcasts (ray.put) and each
    edge/degree block folds locally; the (rep, L, D) grid rides one
    tree combine and the final fold is a 1-row sum."""
    import numpy as np

    from ..stages.dedup import connected_components

    W_MIN = 3

    edges = _copurchase_edges(sf_dir)
    m = edges.count()
    if m == 0:
        return rd.from_arrow(pa.table({
            "n_nodes": pa.array([0], pa.int64()),
            "m_edges": pa.array([0], pa.int64()),
            "intra_edges": pa.array([0], pa.int64()),
            "n_communities": pa.array([0], pa.int64()),
            "modularity": pa.array([0.0], pa.float64()),
        }))
    strong = edges.map_batches(
        lambda b: b.filter(pc.greater_equal(
            b.column("w"), pa.scalar(W_MIN, pa.int64())))
        .select(["id_a", "id_b"]),
        batch_format="pyarrow").materialize()
    rep_map: dict[int, int] = {}
    if strong.count():
        ct = _small_table(connected_components(strong))
        rep_map = dict(zip(
            ct.column("id").to_numpy(zero_copy_only=False).tolist(),
            ct.column("rep").to_numpy(zero_copy_only=False).tolist()))
    rep_ref = ray.put(rep_map)

    def edge_partial(b: pa.Table) -> pa.Table:
        rm = ray.get(rep_ref)
        a = b.column("id_a").to_numpy(zero_copy_only=False)
        bb = b.column("id_b").to_numpy(zero_copy_only=False)
        ra = np.array([rm.get(int(x), int(x)) for x in a], np.int64)
        rb = np.array([rm.get(int(x), int(x)) for x in bb], np.int64)
        intra = ra == rb
        t = pa.table({"rep": pa.array(ra[intra], pa.int64()),
                      "p_l": pa.array(
                          np.ones(int(intra.sum()), np.int64)),
                      "p_d": pa.array(
                          np.zeros(int(intra.sum()), np.int64))})
        return t.group_by("rep").aggregate(
            [("p_l", "sum"), ("p_d", "sum")]).rename_columns(
            ["rep", "p_l", "p_d"])

    def deg_partial(b: pa.Table) -> pa.Table:
        rm = ray.get(rep_ref)
        p = b.column("p").to_numpy(zero_copy_only=False)
        d = b.column("degree").to_numpy(zero_copy_only=False)
        rp = np.array([rm.get(int(x), int(x)) for x in p], np.int64)
        t = pa.table({"rep": pa.array(rp, pa.int64()),
                      "p_l": pa.array(np.zeros(len(p), np.int64)),
                      "p_d": pa.array(d, pa.int64())})
        return t.group_by("rep").aggregate(
            [("p_l", "sum"), ("p_d", "sum")]).rename_columns(
            ["rep", "p_l", "p_d"])

    deg = _copurchase_degrees(edges)
    n_nodes = deg.count()
    grid = _tree_combine(
        edges.map_batches(edge_partial, batch_format="pyarrow")
        .union(deg.map_batches(deg_partial, batch_format="pyarrow")),
        ["rep"], [("p_l", "sum"), ("p_d", "sum")],
        ["rep", "p_l", "p_d"], ["rep", "l", "dd"])

    def fold(b: pa.Table) -> pa.Table:
        l = b.column("l").to_numpy(zero_copy_only=False)
        dd = b.column("dd").to_numpy(zero_copy_only=False)
        qn = sum(4 * m * int(x) - int(y) * int(y)
                 for x, y in zip(l, dd))
        return pa.table({
            "p_q": pa.array([qn], pa.int64()),
            "p_c": pa.array([b.num_rows], pa.int64()),
            "p_i": pa.array([int(l.sum())], pa.int64()),
        })

    agg = grid.map_batches(fold, batch_format="pyarrow").aggregate(
        Sum("p_q", alias_name="qn"), Sum("p_c", alias_name="nc"),
        Sum("p_i", alias_name="li"))
    return rd.from_arrow(pa.table({
        "n_nodes": pa.array([n_nodes], pa.int64()),
        "m_edges": pa.array([m], pa.int64()),
        "intra_edges": pa.array([int(agg["li"] or 0)], pa.int64()),
        "n_communities": pa.array([int(agg["nc"] or 0)], pa.int64()),
        "modularity": pa.array(
            [float(int(agg["qn"] or 0)) / float(4 * m * m)],
            pa.float64()),
    }))


def q_parts_copurchase_clustering(sf_dir: str) -> Dataset:
    """PER-NODE local clustering coefficient of the co-purchase graph
    (the node-level refinement of q_parts_copurchase_triangles'
    global number): for each part, its degree, triangle count, and
    the 1e6-quantized coefficient 2T_v / (deg*(deg-1)) — all integer,
    so no float ordering exists anywhere.  T_v comes off the same
    broadcast-CSR edge-cn kernel triangles ride (each edge's
    |N(a)∩N(b)| feeds BOTH endpoints: sum per node = 2*T_v), then one
    left join back onto the degree table keeps triangle-free nodes.
    Twin: the exact 3-way self-join per node."""
    import numpy as np

    edges = _copurchase_edges(sf_dir)
    deg = _copurchase_degrees(edges).materialize()
    cn = _edge_jaccard_broadcast(edges, None)

    def both_ends(b: pa.Table) -> pa.Table:
        p = pa.concat_arrays([b.column("id_a").combine_chunks(),
                              b.column("id_b").combine_chunks()])
        c = pa.concat_arrays(
            [b.column("common_neighbors").combine_chunks()] * 2)
        t = pa.table({"p": p, "p_c": c})
        g = t.group_by("p").aggregate([("p_c", "sum")])
        return g.rename_columns(["p", "p_c"])

    cn2 = with_schema(
        cn.map_batches(both_ends, batch_format="pyarrow")
        .groupby("p").aggregate(Sum("p_c", alias_name="cn2")),
        pa.schema([("p", pa.int64()), ("cn2", pa.int64())]))

    j = deg.join(cn2, join_type="left_outer", num_partitions=8,
                 on=("p",))

    def score(b: pa.Table) -> pa.Table:
        d = b.column("degree").to_numpy(zero_copy_only=False)
        c2 = pc.fill_null(b.column("cn2"), 0) \
            .to_numpy(zero_copy_only=False)
        denom = d * (d - 1)
        cq = np.where(denom > 0, (c2 * 1_000_000) //
                      np.maximum(denom, 1), 0).astype(np.int64)
        return pa.table({
            "p": b.column("p"),
            "degree": pa.array(d, pa.int64()),
            "n_triangles": pa.array(c2 // 2, pa.int64()),
            "clustering_q": pa.array(cq, pa.int64()),
        })

    return j.map_batches(score, batch_format="pyarrow")


def q_events_value_moments(sf_dir: str) -> Dataset:
    """Exact higher moments of event value per type — skewness and
    excess kurtosis beside the mean/variance the stats family already
    reports, with NO float accumulation anywhere: the (type, cents)
    keyed histogram exchanges (the grouped exact-quantile
    discipline), each type's fold anchors at floor(mean) and sums
    d^k multiplicities in arbitrary-precision Python ints, and the
    centered moments about the mean come out of the d-sums
    algebraically.  The only floats are the final fixed-order
    expression both engines replay operand-for-operand (one
    correctly-rounded sqrt, no pow); the twin holds d^4 in
    HUGEINT."""
    import math

    import numpy as np

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["event_type", "value"])

    def partial(b: pa.Table) -> pa.Table:
        f = b.filter(b.column("value").is_valid())
        cents = scaled_int_sql(f.column("value"), 100.0)
        t = pa.table({"event_type": f.column("event_type"),
                      "c": pa.array(cents, pa.int64()),
                      "one": pa.array(np.ones(f.num_rows, np.int64))})
        g = t.group_by(["event_type", "c"]).aggregate([("one", "sum")])
        return g.rename_columns(["event_type", "c", "p_n"])

    hist = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "c"])
        .aggregate(Sum("p_n", alias_name="n")),
        pa.schema([("event_type", pa.string()), ("c", pa.int64()),
                   ("n", pa.int64())]))

    def fold(g: pa.Table) -> pa.Table:
        c = [int(x) for x in g.column("c").to_pylist()]
        mlt = [int(x) for x in g.column("n").to_pylist()]
        n = sum(mlt)
        s1 = sum(mi * ci for mi, ci in zip(mlt, c))
        pymod = ((s1 % n) + n) % n
        anchor = (s1 - pymod) // n
        d1 = d2 = d3 = d4 = 0
        for mi, ci in zip(mlt, c):
            d = ci - anchor
            d1 += mi * d
            dd = d * d
            d2 += mi * dd
            d3 += mi * dd * d
            d4 += mi * dd * dd
        e = float(d1) / float(n)
        r2 = float(d2) / float(n)
        r3 = float(d3) / float(n)
        r4 = float(d4) / float(n)
        var = r2 - e * e
        if var > 0:
            skew = (r3 - 3.0 * e * r2 + 2.0 * (e * e * e)) \
                / (var * math.sqrt(var))
            kurt = (r4 - 4.0 * e * r3 + 6.0 * (e * e) * r2
                    - 3.0 * (e * e * e * e)) / (var * var) - 3.0
        else:
            skew = None
            kurt = None
        return pa.table({
            "event_type": g.column("event_type").slice(0, 1),
            "n_values": pa.array([n], pa.int64()),
            "mean_cents": pa.array([float(anchor) + e], pa.float64()),
            "var_cents2": pa.array([var], pa.float64()),
            "skewness": pa.array([skew], pa.float64()),
            "kurt_excess": pa.array([kurt], pa.float64()),
        })

    return hist.groupby("event_type").map_groups(
        fold, batch_format="pyarrow")


def q_transcripts_conv_turn_jaccard(sf_dir: str) -> Dataset:
    """Conversation near-dup pairs by TURN-SET Jaccard — the
    conv-level companion to the exact-dup groups: two conversations
    are near-duplicates when the sets of distinct rendered turn lines
    ("role: text") they contain overlap with jaccard >= 0.1 (retry
    storms and partial copies share exact turns — the corpus' convs
    top out near 0.5 — while unrelated convs share only scattered
    boilerplate).  Same inverted-index discipline as
    q_documents_jaccard_pairs with the LINE as the shingle: candidate
    pairs exist only for convs sharing a line, per-pair intersection
    counts off one groupby(line) in-group expansion, sizes by join.
    Repeated system prompts are the hot keys (df ~ 1k at sf0.1, inside
    :data:`SHINGLE_DF_CAP`; beyond it they stop-key out loudly —
    true near-dups always share rarer turns too)."""
    import numpy as np

    from ray.data.aggregate import Count

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "role", "text"])

    def lines(b: pa.Table) -> pa.Table:
        txt = pc.replace_substring(
            pc.fill_null(b.column("text"), ""), "\x00", "")
        line = pc.binary_join_element_wise(
            b.column("role"), txt, ": ")
        return pa.table({"conv_id": b.column("conv_id"),
                         "line": line}) \
            .group_by(["conv_id", "line"]).aggregate([])

    sh = with_schema(
        ds.map_batches(lines, batch_format="pyarrow")
        .groupby(["conv_id", "line"])
        .aggregate(Count("line", alias_name="_n"))
        .map_batches(lambda b: b.select(["conv_id", "line"]),
                     batch_format="pyarrow"),
        pa.schema([("conv_id", pa.string()),
                   ("line", pa.string())])).materialize()

    sizes = with_schema(
        sh.groupby("conv_id").aggregate(Count("line", alias_name="n")),
        pa.schema([("conv_id", pa.string()), ("n", pa.int64())]))

    empty_pairs = pa.table({"id_a": pa.array([], pa.string()),
                            "id_b": pa.array([], pa.string()),
                            "p_c": pa.array([], pa.int64())})

    def expand(g: pa.Table) -> pa.Table:
        if g.num_rows < 2 or _df_capped(g, g.num_rows,
                                        SHINGLE_DF_CAP,
                                        "conv_turn_jaccard", "line"):
            return empty_pairs
        ids = np.sort(np.asarray(g.column("conv_id").to_pylist(),
                                 dtype=object))
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table({"id_a": pa.array(list(ids[a]), pa.string()),
                         "id_b": pa.array(list(ids[b]), pa.string()),
                         "p_c": pa.array(np.ones(len(a), np.int64))})

    pairs = sh.groupby("line").map_groups(
        expand, batch_format="pyarrow").materialize()
    inter = with_schema(
        _tree_combine(pairs, ["id_a", "id_b"], [("p_c", "sum")],
                      ["id_a", "id_b", "p_c"], ["id_a", "id_b", "c"],
                      width=16),
        pa.schema([("id_a", pa.string()), ("id_b", pa.string()),
                   ("c", pa.int64())]))

    half = with_schema(
        inter.join(
            sizes.map_batches(
                lambda b: b.rename_columns(["id_a", "n_a"]),
                batch_format="pyarrow"),
            join_type="inner", num_partitions=8, on=("id_a",)),
        pa.schema([("id_a", pa.string()), ("id_b", pa.string()),
                   ("c", pa.int64()), ("n_a", pa.int64())]))
    sized = half.join(
        sizes.map_batches(lambda b: b.rename_columns(["id_b", "n_b"]),
                          batch_format="pyarrow"),
        join_type="inner", num_partitions=8, on=("id_b",))
    return sized.map_batches(_pair_jaccard_score(0.1, "id_a", "id_b"),
                             batch_format="pyarrow")


QL_QUERIES = 16
QL_MU = 2000.0


def q_documents_query_likelihood(sf_dir: str) -> Dataset:
    """Dirichlet-smoothed query-likelihood retrieval (µ=2000, the
    language-modeling IR baseline beside q_documents_bm25_topk): the
    QL_QUERIES lowest-hash docs (seed 13) play the query set, each
    retrieving its top-5 highest-scoring OTHER docs among those
    sharing ≥1 query term (the inverted-index retrieval set).  The
    score decomposes as qconst + Σ_t∈q∩d ln(1 + tf/(µ·P(t|C)))
    − |q|·ln(dl + µ); every ln is 1e-6-quantized to int64 at the
    point the twin quantizes it, so sums are order-independent and
    floats cross no aggregation boundary.

    Scale shape: pass 1 tree-combines (term, cf) over the QUERY
    vocabulary plus the corpus totals; its output is ONE ray.put
    broadcast.  Pass 2 scores fully in-batch (a doc is one row, so
    the complete (query, doc) score exists locally) and only
    overlapping (query, doc, score) rows reach the single per-query
    top-5 group pass."""
    import numpy as np

    from ..stages.partition import row_hash_hex

    TOPK = 5
    ds = rd.read_parquet(_t(sf_dir, "documents"),
                         columns=["doc_id", "text"])

    def add_h(b: pa.Table) -> pa.Table:
        h = pa.array([row_hash_hex((i,), 13)
                      for i in b.column("doc_id").to_pylist()],
                     pa.string())
        return b.append_column("h", h)

    qdocs = _small_table(_topk_combine(
        ds.map_batches(add_h, batch_format="pyarrow"),
        sorted_topk([("h", "ascending"), ("doc_id", "ascending")],
                    QL_QUERIES))) \
        .sort_by([("h", "ascending"), ("doc_id", "ascending")]) \
        .slice(0, QL_QUERIES)
    qids = qdocs.column("doc_id").to_pylist()
    qterm_sets = [set(t.split(" ")) for t in
                  qdocs.column("text").to_pylist()]
    vocab = sorted(set().union(*qterm_sets)) if qterm_sets else []
    vocab_arr = pa.array(vocab, pa.string())
    V = len(vocab)
    out_schema = pa.schema([("query_id", pa.int64()),
                            ("rank", pa.int64()),
                            ("doc_id", pa.int64()),
                            ("score", pa.int64())])
    if V == 0:
        return rd.from_arrow(out_schema.empty_table())

    # pass 1: collection frequency over the query vocabulary + totals
    def cf_partial(b: pa.Table) -> pa.Table:
        txt = b.column("text").combine_chunks()
        toks = pc.split_pattern(txt, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        pos = pc.index_in(flat, value_set=vocab_arr)
        hit = pos.is_valid().to_numpy(zero_copy_only=False)
        posv = pos.fill_null(0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)[hit]
        cnt = np.bincount(posv, minlength=V).astype(np.int64)
        nz = np.flatnonzero(cnt)
        terms = pa.concat_arrays(
            [pc.take(vocab_arr, pa.array(nz, pa.int64())),
             pa.array([""], pa.string())])
        return pa.table({
            "tok": terms,
            "p_cf": pa.array(np.append(cnt[nz], 0), pa.int64()),
            "p_tot": pa.array(
                np.append(np.zeros(len(nz), np.int64), len(flat)),
                pa.int64()),
        })

    stats = _small_table(_tree_combine(
        ds.map_batches(cf_partial, batch_format="pyarrow"),
        ["tok"], [("p_cf", "sum"), ("p_tot", "sum")],
        ["tok", "p_cf", "p_tot"], ["tok", "cf", "tot"]))
    srows = {r["tok"]: int(r["cf"]) for r in stats.to_pylist()}
    tot = float(sum(int(r["tot"]) for r in stats.to_pylist()))
    cf = np.array([srows.get(t, 0) for t in vocab], np.float64)
    # per-term quantized ln(µ·P) and membership masks per query
    with np.errstate(divide="ignore"):
        lnp = np.where(cf > 0, np.round(np.log(
            QL_MU * (cf / tot)) * 1e6), 0).astype(np.int64)
    tok_index = {t: i for i, t in enumerate(vocab)}
    qmasks = np.zeros((len(qids), V), bool)
    for qi, ts_ in enumerate(qterm_sets):
        for t in ts_:
            j = tok_index.get(t)
            if j is not None and cf[j] > 0:
                qmasks[qi, j] = True
    qconst = (qmasks * lnp).sum(axis=1).astype(np.int64)
    nq = qmasks.sum(axis=1).astype(np.int64)
    bc = ray.put((vocab_arr, cf, qmasks, qconst, nq,
                  np.array(qids, np.int64), tot))

    def score(b: pa.Table) -> pa.Table:
        vocab_, cf_, qm_, qc_, nq_, qids_, tot_ = ray.get(bc)
        txt = b.column("text").combine_chunks()
        toks = pc.split_pattern(txt, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy(zero_copy_only=False)
        dl = np.diff(offs).astype(np.int64)
        flat = pc.list_flatten(toks)
        pos = pc.index_in(flat, value_set=vocab_)
        hit = pos.is_valid().to_numpy(zero_copy_only=False)
        posv = pos.fill_null(0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        doc_idx = np.repeat(np.arange(len(dl)), dl)
        key = doc_idx[hit] * len(cf_) + posv[hit]
        uk, tf = np.unique(key, return_counts=True)
        di, ti = uk // len(cf_), uk % len(cf_)
        ok = cf_[ti] > 0
        di, ti, tf = di[ok], ti[ok], tf[ok]
        contrib = np.round(np.log(
            1.0 + tf / (QL_MU * (cf_[ti] / tot_))) * 1e6) \
            .astype(np.int64)
        lend = np.round(np.log(dl + QL_MU) * 1e6).astype(np.int64)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        out_q, out_d, out_s = [], [], []
        for qi in range(len(qids_)):
            sel = qm_[qi][ti]
            if not sel.any():
                continue
            dsel = di[sel]
            s = np.bincount(dsel, weights=contrib[sel],
                            minlength=len(dl)).astype(np.int64)
            docs = np.unique(dsel)
            docs = docs[ids[docs] != qids_[qi]]
            if docs.size == 0:
                continue
            total = qc_[qi] + s[docs] - nq_[qi] * lend[docs]
            out_q.append(np.full(len(docs), qids_[qi], np.int64))
            out_d.append(ids[docs])
            out_s.append(total)
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "doc_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.int64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
            "score": pa.array(np.concatenate(out_s), pa.int64()),
        })

    scored = with_schema(
        ds.map_batches(score, batch_format="pyarrow"),
        pa.schema([("query_id", pa.int64()), ("doc_id", pa.int64()),
                   ("score", pa.int64())]))

    def topk(g: pa.Table) -> pa.Table:
        import numpy as np
        s = g.column("score").to_numpy(zero_copy_only=False)
        d = g.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, -s))[:TOPK]
        return pa.table({
            "query_id": g.column("query_id").take(
                pa.array(order, pa.int64())),
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "doc_id": pa.array(d[order], pa.int64()),
            "score": pa.array(s[order], pa.int64()),
        })

    return scored.groupby("query_id").map_groups(
        topk, batch_format="pyarrow")


def q_events_bloom_filter(sf_dir: str) -> Dataset:
    """Bloom-filter membership audit — the probabilistic-sketch
    counterpart of the exact anti-join: a deliberately small 512-bit
    / 4-hash Bloom filter is built over a member list (the
    deterministic 1-in-7 user subset — every user in this corpus
    does every event type, so behavioral predicates define no
    subset), every distinct user probes it, and the report pins
    members, probes, hits, false positives and the measured FP rate
    (the undersized filter SATURATES at sf0.1 — the failure mode the
    audit exists to catch).  Positions are first-4-hex-chars of
    md5(user ⊕ j) mod 512, the seeded-row-hash construction every
    sampler twin shares, so the whole sketch replays in SQL.  Scale
    shape: the 512-bit bitmap partials OR together in a bounded
    driver reduce (the dedup-counter pattern), ONE ray.put broadcast
    serves every probe block, and only a 4-int partial row leaves
    each."""
    import hashlib

    import numpy as np

    M = 512

    ds = rd.read_parquet(_t(sf_dir, "events"),
                         columns=["user_id", "event_type"])

    def user_partial(b: pa.Table) -> pa.Table:
        # u % 7 == 0 (Arrow has no modulo kernel; ids are positive,
        # so truncating divide == floor divide)
        isp = pc.equal(
            pc.subtract(b.column("user_id"),
                        pc.multiply(pc.divide(b.column("user_id"),
                                              pa.scalar(7)),
                                    pa.scalar(7))),
            pa.scalar(0)).cast(pa.int64())
        t = pa.table({"user_id": b.column("user_id"), "m": isp})
        g = t.group_by("user_id").aggregate([("m", "max")])
        return g.rename_columns(["user_id", "p_m"])

    users = with_schema(
        ds.map_batches(user_partial, batch_format="pyarrow")
        .groupby("user_id").aggregate(Max("p_m", alias_name="is_mem")),
        pa.schema([("user_id", pa.int64()),
                   ("is_mem", pa.int64())])).materialize()

    def positions(u: int) -> list[int]:
        return [int(hashlib.md5(
            f"{u}\x1f{j}".encode()).hexdigest()[:4], 16) % M
            for j in range(4)]

    def bitmap_partial(b: pa.Table) -> pa.Table:
        bm = np.zeros(M, np.bool_)
        mem = b.filter(pc.equal(b.column("is_mem"),
                                pa.scalar(1, pa.int64())))
        for u in mem.column("user_id").to_pylist():
            for p in positions(int(u)):
                bm[p] = True
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    bm = np.zeros(M, np.bool_)
    for row in users.map_batches(bitmap_partial,
                                 batch_format="pyarrow").take_all():
        bm |= np.frombuffer(row["bm"], np.bool_)
    bm_ref = ray.put(bm)

    def probe_partial(b: pa.Table) -> pa.Table:
        bmp = ray.get(bm_ref)
        us = b.column("user_id").to_pylist()
        ms = b.column("is_mem").to_numpy(zero_copy_only=False)
        hits = np.array(
            [all(bmp[p] for p in positions(int(u))) for u in us],
            np.int64)
        return pa.table({
            "p_probe": pa.array([len(us)], pa.int64()),
            "p_mem": pa.array([int(ms.sum())], pa.int64()),
            "p_hit": pa.array([int(hits.sum())], pa.int64()),
            "p_fp": pa.array([int((hits & (ms == 0)).sum())],
                             pa.int64()),
        })

    agg = users.map_batches(probe_partial,
                            batch_format="pyarrow").aggregate(
        Sum("p_probe", alias_name="n_probes"),
        Sum("p_mem", alias_name="n_members"),
        Sum("p_hit", alias_name="n_hits"),
        Sum("p_fp", alias_name="n_fp"))
    n_probes = int(agg["n_probes"] or 0)
    n_mem = int(agg["n_members"] or 0)
    n_fp = int(agg["n_fp"] or 0)
    nonmem = n_probes - n_mem
    return rd.from_arrow(pa.table({
        "n_members": pa.array([n_mem], pa.int64()),
        "n_probes": pa.array([n_probes], pa.int64()),
        "n_hits": pa.array([int(agg["n_hits"] or 0)], pa.int64()),
        "n_false_positives": pa.array([n_fp], pa.int64()),
        "fp_rate": pa.array(
            [float(n_fp) / float(nonmem) if nonmem else 0.0],
            pa.float64()),
    }))


def q_transcripts_outlinks(sf_dir: str) -> Dataset:
    """Outlink extraction over the HTML-bearing turns — the link
    harvest that rides beside the boilerplate stripper (anchor spans
    and link density already measure anchors; this reports WHERE they
    point): per href target, total links, turns containing it, and
    distinct conversations citing it.  Scale shape: an Arrow
    substring prefilter keeps only href-bearing rows before the
    compiled findall, the (target, conv_id) grid is the only
    exchange (target domain is the site's path vocabulary), and the
    per-target fold counts conversations as group rows."""
    import re as _re

    import numpy as np

    ds = rd.read_parquet(transcript_paths(sf_dir),
                         columns=["conv_id", "text"])
    pat = _re.compile(r'href="([^"]*)"')

    def partial(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b.column("text"), "")
        has = pc.match_substring(txt, 'href="')
        f = pa.table({"conv_id": b.column("conv_id"),
                      "text": txt}).filter(has)
        tgts, convs, links, turns = [], [], [], []
        for cid, t in zip(f.column("conv_id").to_pylist(),
                          f.column("text").to_pylist()):
            found = pat.findall(t)
            if not found:
                continue
            cnt: dict[str, int] = {}
            for m in found:
                cnt[m] = cnt.get(m, 0) + 1
            for tgt, c in cnt.items():
                tgts.append(tgt)
                convs.append(cid)
                links.append(c)
                turns.append(1)
        t = pa.table({"target": pa.array(tgts, pa.string()),
                      "conv_id": pa.array(convs, pa.string()),
                      "p_l": pa.array(links, pa.int64()),
                      "p_t": pa.array(turns, pa.int64())})
        g = t.group_by(["target", "conv_id"]).aggregate(
            [("p_l", "sum"), ("p_t", "sum")])
        return g.rename_columns(["target", "conv_id", "p_l", "p_t"])

    grid = with_schema(
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["target", "conv_id"])
        .aggregate(Sum("p_l", alias_name="l"),
                   Sum("p_t", alias_name="t")),
        pa.schema([("target", pa.string()), ("conv_id", pa.string()),
                   ("l", pa.int64()), ("t", pa.int64())]))

    def fold(g: pa.Table) -> pa.Table:
        return pa.table({
            "target": g.column("target").slice(0, 1),
            "n_links": pa.array(
                [int(np.sum(g.column("l").to_numpy(
                    zero_copy_only=False)))], pa.int64()),
            "n_turns": pa.array(
                [int(np.sum(g.column("t").to_numpy(
                    zero_copy_only=False)))], pa.int64()),
            "n_convs": pa.array([g.num_rows], pa.int64()),
        })

    return grid.groupby("target").map_groups(fold,
                                             batch_format="pyarrow")

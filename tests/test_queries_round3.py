"""Round-3 continuation operators: JSON extraction, PII-style scrub,
dense rank, left-outer join.  Each test pins the semantic edge the
sf0.01 oracle corpus may not exercise (negative keys, tie ranks, $ and
comma amounts, customers with no orders)."""

import duckdb
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _tab(ds) -> pa.Table:
    rows = ds.take_all()
    return pa.Table.from_pylist(rows)


def test_props_json_edges(ray_session, tmp_path):
    """Negative keys, whitespace variants, and half-away cent rounding."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_engine_ray.pipelines.queries import q_events_props_json

    tab = pa.table({
        "props": ['{"k": 5}', '{"k":5}', '{"k": -3}', '{"k":  -3}'],
        "value": [0.005, 0.015, 1.0, 2.0],
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    got = _tab(q_events_props_json(str(tmp_path))).sort_by("k")
    # 0.005*100 and 0.015*100 are exactly 0.5 and 1.5 in double; both
    # round half-AWAY (DuckDB round()) → 1 + 2, not banker's 0 + 2.
    assert got.to_pylist() == [
        {"k": -3, "sum_cents": 300, "n_events": 2},
        {"k": 5, "sum_cents": 3, "n_events": 2},
    ]


def test_scrub_masks_ids_and_amounts(ray_session):
    from ocr_engine_ray.pipelines.queries import q_transcripts_scrub

    got = _tab(q_transcripts_scrub(SF))
    text = " ".join(got.column("scrubbed").to_pylist())
    assert "<ID>" in text and "<AMT>" in text
    assert "INV-" not in text
    import re
    assert not re.search(r"\d[\d,]*\.\d{2}", text)


def test_scrub_comma_and_dollar_amounts(ray_session):
    """The amount rule consumes an optional $ and comma groups in one
    token.  Uses the production SCRUB_RULES list (the same object that
    drives both the engine kernel and the generated oracle SQL), so a
    pattern edit cannot silently bypass this edge-case test."""
    import pyarrow.compute as pc

    from ocr_engine_ray.pipelines.queries import SCRUB_RULES

    s = pa.array(["pay $1,234.56 or 7.00 now", "ref INV-12 due 9,999.99"])
    for pat, rep in SCRUB_RULES:
        s = pc.replace_substring_regex(s, pat, rep)
    assert s.to_pylist() == ["pay <AMT> or <AMT> now", "ref <ID> due <AMT>"]
    # and the oracle twin is literally generated from the same rules
    import __ray_entry__ as entrymod
    sql = entrymod.oracle_sql()["transcripts_scrub"]
    for pat, _ in SCRUB_RULES:
        assert pat in sql


def test_dense_rank_ties_and_gaps(ray_session, tmp_path):
    """Equal values share a rank; ranks are gap-free (dense)."""
    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import q_events_dense_rank

    tab = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "event_type": ["a", "a", "a", "a", "b"],
        "value": [9.0, 9.0, 5.0, 1.0, 3.0],
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    got = _tab(q_events_dense_rank(str(tmp_path))).sort_by("event_id")
    assert got.column("rnk").to_pylist() == [1, 1, 2, 3, 1]


def test_left_join_keeps_orderless_customers(ray_session, tmp_path):
    """The driver corpus gives every customer an order, so the NULL
    path is pinned on a synthetic pair: customer 3 has no orders and
    must survive with NULL order columns."""
    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import q_customer_orders_left_join

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_mktsegment": ["A", "B", "C"],
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_totalprice": [5.0, 6.0, 7.0],
    }), str(tmp_path / "orders.parquet"))
    got = _tab(q_customer_orders_left_join(str(tmp_path)))
    assert got.num_rows == 4
    by_cust = {}
    for r in got.to_pylist():
        by_cust.setdefault(r["c_custkey"], []).append(r)
    assert sorted(x["o_orderkey"] for x in by_cust[1]) == [10, 11]
    assert by_cust[3][0]["o_orderkey"] is None
    assert by_cust[3][0]["o_totalprice"] is None
    assert by_cust[3][0]["c_mktsegment"] == "C"


# --- term-level text operators (stages/terms) -------------------------------

def test_chunk_batch_geometry(ray_session):
    """Window/stride edges: exact-multiple lengths, short tails,
    single-token docs, and the overlap region's token identity."""
    from ocr_engine_ray.stages.terms import chunk_batch

    b = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["a b c d e f g h", "x", "p q r"],
    })
    got = chunk_batch(b, window=4, stride=3).to_pylist()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 8 tokens -> starts 0,3,6 -> chunks of 4,4,2
    assert [r["chunk"] for r in by_doc[1]] == \
        ["a b c d", "d e f g", "g h"]
    assert [r["n_tokens"] for r in by_doc[1]] == [4, 4, 2]
    assert [r["chunk_idx"] for r in by_doc[1]] == [0, 1, 2]
    # single-token and sub-window docs produce exactly one chunk
    assert [r["chunk"] for r in by_doc[2]] == ["x"]
    assert [r["chunk"] for r in by_doc[3]] == ["p q r"]


def test_term_partials_merge(ray_session):
    """df counts a term once per doc regardless of multiplicity; tf
    counts every occurrence — and partials from split batches sum to
    the unsplit answer (the mergeability the shuffle relies on)."""
    from ocr_engine_ray.stages.terms import term_partials

    b = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["a a b", "a c"]})
    whole = {r["term"]: (r["p_tf"], r["p_df"])
             for r in term_partials(b).to_pylist()}
    assert whole == {"a": (3, 2), "b": (1, 1), "c": (1, 1)}
    merged = {}
    for i in range(2):
        for r in term_partials(b.slice(i, 1)).to_pylist():
            tf, df = merged.get(r["term"], (0, 0))
            merged[r["term"]] = (tf + r["p_tf"], df + r["p_df"])
    assert merged == whole


def test_bigrams_respect_doc_boundaries(ray_session):
    """No bigram spans two documents."""
    from ocr_engine_ray.stages.terms import bigram_partials

    b = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["a b", "c d"]})
    got = {r["bigram"]: r["p_n"] for r in bigram_partials(b).to_pylist()}
    assert got == {"a b": 1, "c d": 1}  # no phantom "b c"


def test_repetition_degenerate_docs(ray_session):
    """All-same-token doc fails the gate; all-distinct doc passes;
    single-token doc has frac 0 and ratio 1."""
    from ocr_engine_ray.stages.terms import repetition_batch

    distinct26 = " ".join("abcdefghijklmnopqrstuvwxyz")
    b = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["z z z z z z", distinct26, "solo"]})
    got = {r["doc_id"]: r for r in
           repetition_batch(b, 0.5, 0.05).to_pylist()}
    assert got[1]["keep"] == 0 and got[1]["top_bigram_frac"] == 1.0
    # 26 distinct tokens: ratio 1.0, top bigram 1/25 = 0.04 <= 0.05
    assert got[2]["keep"] == 1 and got[2]["distinct_ratio"] == 1.0
    assert got[3]["n_tokens"] == 1 and got[3]["top_bigram_frac"] == 0.0
    assert got[3]["keep"] == 1


def test_label_centroids_known_values(ray_session, tmp_path):
    """Centroid of known vectors, and batch-split partials merge to the
    same result (int-quantized sums are order-independent)."""
    import numpy as np
    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import q_embeddings_label_centroids

    rng = np.random.RandomState(7)
    vecs = rng.uniform(-0.5, 0.5, size=(40, 64)).astype(np.float32)
    labels = np.array([0] * 25 + [1] * 15, np.int32)
    tab = pa.table({
        "label": pa.array(labels, pa.int32()),
        "embedding": pa.array([v for v in vecs.tolist()],
                              pa.list_(pa.float32())),
    })
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"),
                   row_group_size=7)  # force multiple batches
    got = _tab(q_embeddings_label_centroids(str(tmp_path))) \
        .sort_by([("label", "ascending"), ("dim", "ascending")])
    want0 = vecs[:25].astype(np.float64).mean(axis=0)
    got0 = np.array(got.column("centroid").to_pylist()[:64])
    # quantized mean is within 2^-30 of the true mean, rounded to 6
    assert np.abs(got0 - np.round(want0, 6)).max() < 2e-6
    assert got.num_rows == 128


def test_pack_bins_boundary_and_sources(ray_session, tmp_path):
    """A doc whose exclusive prefix crosses the budget starts the next
    bin; packing is independent per source."""
    import pyarrow.parquet as pq

    import ocr_engine_ray.pipelines.queries as qmod
    from ocr_engine_ray.pipelines.queries import q_documents_pack_bins

    # budget 4096: doc lens 3000, 2000, 4096, 1 -> excl prefixes
    # 0, 3000, 5000, 9096 -> bins 0, 0, 1, 2
    texts = [" ".join(["w"] * n) for n in (3000, 2000, 4096, 1)]
    tab = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 10], pa.int64()),
        "source": ["s1", "s1", "s1", "s1", "s2"],
        "text": texts + ["tiny doc"],
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r["bin_idx"]
           for r in q_documents_pack_bins(str(tmp_path)).take_all()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 2, 10: 0}


def test_posting_lists_dedup_and_order(ray_session, tmp_path):
    """A term repeated within a doc posts once; postings are sorted."""
    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import q_documents_posting_lists

    tab = pa.table({
        "doc_id": pa.array([30, 4, 100], pa.int64()),
        "text": ["a a b", "b a", "a"],
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = {r["term"]: r for r in
           q_documents_posting_lists(str(tmp_path)).take_all()}
    assert got["a"]["df"] == 3 and got["a"]["postings"] == "4,30,100"
    assert got["b"]["df"] == 2 and got["b"]["postings"] == "4,30"


def test_source_mixture_invariants(ray_session):
    """Token shares sum to 1 and weight·share = 1/n_sources per row
    (the flatten-to-uniform property)."""
    import numpy as np

    from ocr_engine_ray.pipelines.queries import q_documents_source_mixture

    got = _tab(q_documents_source_mixture(SF))
    share = np.array(got.column("token_share").to_pylist())
    weight = np.array(got.column("weight_uniform").to_pylist())
    assert abs(share.sum() - 1.0) < 1e-12
    np.testing.assert_allclose(weight * share, 1.0 / got.num_rows,
                               rtol=1e-12)


def test_balance_classes_caps_each_lang(ray_session):
    from ocr_engine_ray.pipelines.queries import q_documents_balance_classes

    got = _tab(q_documents_balance_classes(SF))
    import collections
    counts = collections.Counter(got.column("lang").to_pylist())
    assert all(v <= 30 for v in counts.values())
    assert len(counts) >= 2


def test_scaled_int_sql_rejects_nulls_and_nans():
    """NULL/NaN inputs must fail loudly — an int64 output cannot carry
    NULL, and silent INT64_MIN corruption broke this exact helper class
    elsewhere (DuckDB round(NULL) is NULL; SUM drops it)."""
    import numpy as np
    import pytest as _pytest

    from ocr_engine_ray.util import scaled_int_sql

    with _pytest.raises(ValueError, match="NULL"):
        scaled_int_sql(pa.array([1.0, None]), 100.0)
    with _pytest.raises(ValueError, match="NaN"):
        scaled_int_sql(np.array([1.0, np.nan]), 100.0)
    assert scaled_int_sql(pa.array([0.005, -0.005]), 100.0).tolist() == [1, -1]


def test_full_outer_has_both_null_directions(ray_session):
    from ocr_engine_ray.pipelines.queries import q_events_full_outer_days

    got = _tab(q_events_full_outer_days(SF))
    p_null = got.column("n_purchases").null_count
    e_null = got.column("n_errors").null_count
    assert p_null > 0 and e_null > 0          # rows survive from BOTH sides
    assert got.column("user_id").null_count == 0   # keys coalesced


def test_training_prep_composition(ray_session):
    """Each gate fires on the intended victim; survivors dedup to the
    lowest doc_id; chunking applies only to survivors."""
    from ocr_engine_ray.stages.terms import chunk_batch, training_prep_filter

    good = ("the quick brown fox jumps over a lazy dog near the old barn "
            "while the farmer watches a red hen peck at grain under a "
            "bright warm morning sun")
    b = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": [
            good,                              # survives
            good,                              # exact dup of 1
            "tiny doc",                        # <5 tokens
            "alpha beta gamma delta epsilon",  # no stopwords
            "the the the the the a a a",       # low distinct ratio
            "the cat " * 30 + "a dog sat on a mat with a hat",  # top bigram
        ],
    })
    kept = training_prep_filter(b, min_tokens=5, min_stopword_ratio=0.02,
                                min_distinct_ratio=0.45,
                                max_top_bigram_frac=0.08)
    assert kept.column("doc_id").to_pylist() == [1, 2]
    # dedup-keep-min then chunk: 29 tokens, stride 24 -> chunks at 0 and 24
    ded = kept.group_by("text").aggregate([("doc_id", "min")]) \
        .rename_columns(["text", "doc_id"])
    chunks = chunk_batch(ded.select(["doc_id", "text"]),
                         window=32, stride=24).to_pylist()
    assert [c["doc_id"] for c in chunks] == [1, 1]
    w = good.split()
    assert chunks[0]["chunk"] == good and chunks[0]["n_tokens"] == len(w)
    assert chunks[1]["chunk"] == " ".join(w[24:])
    assert chunks[1]["n_tokens"] == len(w) - 24


def test_funnel_requires_stage_order(ray_session, tmp_path):
    """Clicks BEFORE the first view must not advance the funnel, and a
    purchase between view and click must not count without the click
    anchor preceding it."""
    import datetime as dt

    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import q_events_funnel

    def ts(m):
        return dt.datetime(2024, 1, 1, 0, m)

    rows = [
        # user 1: view@1 click@2 purchase@3 -> all three stages
        (1, "view", ts(1)), (1, "click", ts(2)), (1, "purchase", ts(3)),
        # user 2: click@1 view@2 purchase@3 -> click precedes view: stage 1 only
        (2, "click", ts(1)), (2, "view", ts(2)), (2, "purchase", ts(3)),
        # user 3: view@1 purchase@2 click@3 -> purchase precedes click: stage 2
        (3, "view", ts(1)), (3, "purchase", ts(2)), (3, "click", ts(3)),
        # user 4: never views -> no stage
        (4, "click", ts(1)), (4, "purchase", ts(2)),
    ]
    tab = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    got = {r["stage"]: r["n_users"]
           for r in q_events_funnel(str(tmp_path)).to_pylist()}
    assert got == {"view": 3, "view_click": 2, "view_click_purchase": 1}


def test_retention_offsets_and_distinctness(ray_session, tmp_path):
    """Multiple events on one day count once; offsets are whole days
    from each user's OWN first day."""
    import datetime as dt

    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import q_events_retention

    def d(day, h=0):
        return dt.datetime(2024, 1, day, h)

    rows = [(1, d(1)), (1, d(1, 5)), (1, d(3)),     # cohort 1/1: off 0, 2
            (2, d(2)), (2, d(3)), (2, d(3, 9))]     # cohort 1/2: off 0, 1
    tab = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    got = {(r["cohort_day"].day, r["day_offset"]): r["n_users"]
           for r in _tab(q_events_retention(str(tmp_path))).to_pylist()}
    assert got == {(1, 0): 1, (1, 2): 1, (2, 0): 1, (2, 1): 1}


def test_corr_known_values(ray_session, tmp_path):
    """Perfect positive / negative linear relationships give ±1."""
    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import q_lineitem_corr

    tab = pa.table({
        "l_returnflag": pa.array(["P"] * 4 + ["N"] * 4),
        "l_quantity": pa.array([1.0, 2.0, 3.0, 4.0] * 2),
        "l_extendedprice": pa.array(
            [10.0, 20.0, 30.0, 40.0, 40.0, 30.0, 20.0, 10.0]),
    })
    pq.write_table(tab, str(tmp_path / "lineitem.parquet"))
    got = {r["l_returnflag"]: r["corr_qty_price"]
           for r in _tab(q_lineitem_corr(str(tmp_path))).to_pylist()}
    assert got == {"P": 1.0, "N": -1.0}


def test_fuzzy_pairs_symdelete_exactness(ray_session, tmp_path):
    """Distance-2 collisions that share a deletion variant (e.g. a
    transposition) must be rejected by the verify; duplicates must not
    inflate; insert/delete/substitute at distance 1 must all be found."""
    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import q_customers_fuzzy_name_pairs

    names = ["abc", "abc", "abd", "abcd", "acb", "zzz"]
    pq.write_table(pa.table({"c_name": pa.array(names)}),
                   str(tmp_path / "customer.parquet"))
    got = {(r["name_a"], r["name_b"])
           for r in _tab(q_customers_fuzzy_name_pairs(
               str(tmp_path))).to_pylist()}
    assert got == {("abc", "abd"),      # substitution
                   ("abc", "abcd"),     # insertion
                   ("abcd", "abd")}     # deletion
    # "acb" shares deletion variants "ab"/"ac" with "abc" (candidate)
    # but is distance 2 — the verify must have dropped it


def test_entropy_known_values(ray_session, tmp_path):
    """Single-type user has H = 0; a 50/50 user has H = ln 2."""
    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import q_events_user_entropy

    tab = pa.table({
        "user_id": pa.array([1] * 4 + [2] * 4, pa.int64()),
        "event_type": pa.array(["view"] * 4 + ["view", "view",
                                               "click", "click"]),
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    got = {r["user_id"]: (r["n_events"], r["entropy"])
           for r in _tab(q_events_user_entropy(str(tmp_path))).to_pylist()}
    assert got == {1: (4, 0.0), 2: (4, 0.693147)}


def test_gapfill_zero_fills_missing_days(ray_session, tmp_path):
    """The grid spans min..max observed day for every OBSERVED type;
    missing cells are 0, not absent."""
    import datetime as dt

    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import q_events_daily_gapfill

    def d(day):
        return dt.datetime(2024, 1, day)

    tab = pa.table({
        "event_type": pa.array(["view", "view", "click"]),
        "ts": pa.array([d(1), d(4), d(2)], pa.timestamp("us")),
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    out = q_events_daily_gapfill(str(tmp_path))
    got = {(r["event_type"], r["day"].day): r["n_events"]
           for r in out.to_pylist()}
    assert len(got) == 8        # 2 observed types x days 1..4
    assert got[("view", 1)] == 1 and got[("view", 4)] == 1
    assert got[("view", 2)] == 0 and got[("view", 3)] == 0
    assert got[("click", 2)] == 1 and got[("click", 3)] == 0


def test_winnow_matches_reference_and_masks_boundaries(ray_session,
                                                       tmp_path):
    """Fingerprints equal an independent per-doc reference (no
    cross-doc windows from the concatenated buffer), and docs too
    short for a full window emit nothing."""
    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import (
        q_documents_winnow_fingerprints)

    def ref(text, k=5, w=4, b=257, m=1_000_000_007):
        hs = [sum(ord(c) * b ** (k - 1 - j)
                  for j, c in enumerate(text[i:i + k])) % m
              for i in range(len(text) - k + 1)]
        return {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}

    docs = ["the quick brown fox jumps", "the quick brown fix jumps",
            "tiny", "exactly8"]  # 8 chars -> 4 hashes -> 1 window
    tab = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs)})
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    out = _tab(q_documents_winnow_fingerprints(str(tmp_path))).to_pylist()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    assert got.get(2) is None               # len 4 < k: nothing
    for i, d in enumerate(docs):
        if len(d) >= 8:
            assert got[i] == ref(d), f"doc {i}"


def test_kmeans_matches_numpy_reference(ray_session, tmp_path):
    """Same-init Lloyd on well-separated blobs must reproduce the
    numpy reference assignment exactly (quantized distributed sums vs
    plain float sums cannot flip a separated assignment)."""
    import numpy as np
    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import q_embeddings_kmeans

    rng = np.random.RandomState(7)
    a = rng.normal([10, 0, 0, 0], 0.5, size=(10, 4))
    b = rng.normal([0, 10, 0, 0], 0.5, size=(10, 4))
    mat = np.empty((20, 4))
    mat[0::2], mat[1::2] = a, b          # ids alternate blobs, so the
    ids = np.arange(20)                  # 2 lowest-id seeds split them
    tab = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([r for r in mat.astype(np.float32)],
                              pa.list_(pa.float32())),
    })
    pq.write_table(tab, str(tmp_path / "embeddings.parquet"))

    got = {r["vec_id"]: r["cluster"]
           for r in _tab(q_embeddings_kmeans(str(tmp_path), k=2,
                                             iters=3)).to_pylist()}

    cent = mat.astype(np.float32).astype(np.float64)[:2].copy()
    x = mat.astype(np.float32).astype(np.float64)
    for _ in range(3):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        asg = d.argmin(axis=1)
        for c in range(2):
            if (asg == c).any():
                cent[c] = x[asg == c].mean(axis=0)
    d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    want = d.argmin(axis=1)
    assert got == {int(i): int(c) for i, c in zip(ids, want)}
    assert set(got.values()) == {0, 1}


def test_train_split_partitions_and_determinism(ray_session, tmp_path):
    """Every row lands in exactly one split; assignment is identical
    under different partitionings; fractions must sum to 1."""
    import pyarrow.parquet as pq
    import pytest
    import ray.data as rd

    from ocr_engine_ray.stages.partition import deterministic_split

    tab = pa.table({"doc_id": pa.array(range(400), pa.int64())})
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}

    a = {r["doc_id"]: r["split"] for r in deterministic_split(
        rd.read_parquet(str(tmp_path / "documents.parquet")),
        fr, ["doc_id"]).take_all()}
    b = {r["doc_id"]: r["split"] for r in deterministic_split(
        rd.read_parquet(str(tmp_path / "documents.parquet"))
        .repartition(7), fr, ["doc_id"]).take_all()}
    assert a == b and len(a) == 400
    n = {s: sum(1 for v in a.values() if v == s) for s in fr}
    assert n["train"] > n["val"] and n["train"] > n["test"]
    assert sum(n.values()) == 400

    with pytest.raises(ValueError, match="sum to 1"):
        deterministic_split(
            rd.read_parquet(str(tmp_path / "documents.parquet")),
            {"a": 0.5, "b": 0.4}, ["doc_id"])


def test_train_split_rejects_bad_fracs_and_null_ids(ray_session):
    import math

    import pytest
    import ray.data as rd

    from ocr_engine_ray.stages.partition import deterministic_split

    ds = rd.from_arrow(pa.table({"id": pa.array([1, 2], pa.int64())}))
    with pytest.raises(ValueError, match="non-negative"):
        deterministic_split(ds, {"a": 1.05, "b": -0.05}, ["id"])
    with pytest.raises(ValueError, match="non-negative"):
        deterministic_split(ds, {"a": math.nan, "b": 1.0}, ["id"])
    nulled = rd.from_arrow(pa.table({"id": pa.array([1, None],
                                                    pa.int64())}))
    with pytest.raises(Exception, match="NULL in id column"):
        deterministic_split(nulled, {"a": 0.5, "b": 0.5},
                            ["id"]).take_all()


def test_source_kl_zero_for_identical_distributions(ray_session,
                                                    tmp_path):
    """Sources with identical token distributions have KL 0; a skewed
    source scores positive."""
    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import q_documents_source_kl

    tab = pa.table({
        "source": pa.array(["a", "b", "c"]),
        "text": pa.array(["x x y", "x x y", "z z z"]),
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = {r["source"]: r["kl_vs_corpus"]
           for r in _tab(q_documents_source_kl(str(tmp_path)))
           .to_pylist()}
    assert got["a"] == got["b"]
    assert got["c"] > got["a"] > 0.0  # both diverge from the mixture,
    # the all-z source more

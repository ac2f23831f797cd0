"""Flagship extraction pipeline (SURVEY §3 "Rebuild" graph)::

    read_parquet(shards)                      # column-pruned
      → map_batches(TurnExtractor, actor pool)  # normalize+sniff+extract
      → map_batches(validate_batch)             # warnings/flags/is_valid
      [→ groupby(conv_id) rollup | ordered assembly | write_parquet]

Replaces the reference's E1/E2/E3 entry points (single-file, multi-file
and Celery fan-out, ``app/main.py:86-265``, ``app/celery_app.py:50-212``)
with one lazily-executed streaming Dataset graph.

Extraction is strictly per-turn (no cross-turn state), so it runs as an
embarrassingly-parallel actor-pool ``map_batches`` — no shuffle.  The
only shuffles are the per-conversation stages (rollup / assembly), both
keyed on ``conv_id`` and both fed by per-batch partial aggregation so
the all-to-all exchange moves one row per (conv, batch), not one row
per turn.
"""

from __future__ import annotations

from datetime import date

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum

from ..core.extract import DEFAULT_AS_OF
from ..schema import TRANSCRIPT_SCHEMA
from ..stages.extract import TurnExtractor

# measured on this workload (200k turns, 32-cpu local node): fixed pool of
# 0.75×CPUs at batch_size=1024 beats both a full-width pool (oversubscribes
# against the read/consume stages: 26k vs 41k turns/s) and an autoscaling
# (1, N) pool (slow ramp: 19k turns/s)
DEFAULT_BATCH_SIZE = 1024


def _default_concurrency() -> int:
    from ..util import default_pool_size

    return default_pool_size()


def read_transcripts(paths: str | list[str]) -> Dataset:
    """Column-pruned read of transcript shards (prune-at-the-read: the
    pipeline needs all six schema columns, and only those)."""
    return rd.read_parquet(paths, columns=list(TRANSCRIPT_SCHEMA.names))


def extract_validated(ds: Dataset, as_of: date = DEFAULT_AS_OF,
                      batch_size: int | None = None,
                      concurrency: int | tuple[int, int] | None = None,
                      template_tools: tuple[str, ...] = (),
                      num_cpus: int = 1) -> Dataset:
    """transcripts → VALIDATED_SCHEMA rows (no shuffle)."""
    if batch_size is None:
        from ..config import extract_batch_size

        batch_size = extract_batch_size()
    if concurrency is None:
        concurrency = _default_concurrency()
    # driver-side resolution of process-local state the worker-side
    # actor __init__ cannot see: the env template-dir knob and any
    # register_field_backend() registrations made on the driver
    from ..config import template_dir
    from ..core.extract import FIELD_BACKENDS

    # validation is fused into the extraction pass (see stages/extract.py)
    return ds.map_batches(
        TurnExtractor,
        fn_constructor_kwargs={"as_of": as_of, "validate": True,
                               "template_tools": template_tools,
                               "template_dir_path": template_dir(),
                               "extra_field_backends": dict(FIELD_BACKENDS)},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
        # stage-level retry (reference tenacity ×3, ocr_engine.py:96):
        # dead actors restart, in-flight batches retry; per-ROW failures
        # never surface here — extract_turn degrades them in-UDF
        max_restarts=3,
        max_task_retries=3,
    )


def flagship(paths: str | list[str], as_of: date = DEFAULT_AS_OF,
             **kw) -> Dataset:
    return extract_validated(read_transcripts(paths), as_of=as_of, **kw)


def flagship_composed(paths: str | list[str],
                      as_of: date = DEFAULT_AS_OF) -> Dataset:
    """Flagship extraction sized for pipelines that COMPOSE it with a
    shuffle/reduce stage (rollup, assembly): half-width pool of 2-CPU
    actors.  Measured at sf0.1/32 cpus (OMP_NUM_THREADS=1, warmed):
    extraction alone prefers the wide 1-cpu pool (64k vs 53k turns/s),
    but extraction→rollup end-to-end runs 13.4 s with this profile vs
    16-22 s with the wide pool — the fatter actors leave scheduler/CPU
    headroom for the concurrent partial-agg + shuffle stages instead of
    starving them.

    Small clusters (< 8 CPUs) fall back to the plain profile: one 2-CPU
    actor on a 2-CPU cluster reserves EVERYTHING and stalls the
    streaming executor (the failure mode util.default_pool_size
    documents), and on 1 CPU the actor can never be placed."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0  # unknown (e.g. pre-init) → the safe plain profile
    if cpus < 8:
        return flagship(paths, as_of=as_of)
    from ..util import default_pool_size

    pool = max(1, default_pool_size() // 2)
    return flagship(paths, as_of=as_of, concurrency=pool, num_cpus=2)


# ---------------------------------------------------------------------------
# Per-conversation rollup (FIXTURES §F3; reference exporter rollup A1 +
# job counters A2) — partial aggregation inside map_batches, then a small
# groupby over the partials (SURVEY §2.6 / ray_guide "Aggregation at scale").
# ---------------------------------------------------------------------------

def _rollup_partials(batch: pa.Table) -> pa.Table:
    t = batch.append_column(
        "chars", pc.utf8_length(batch.column("extracted_text")).cast(pa.int64()))
    t = t.append_column(
        "flagged",
        pc.cast(pc.greater(pc.list_value_length(t.column("flags")), 0), pa.int64()))
    g = t.group_by("conv_id").aggregate([
        ("turn_idx", "count"), ("chars", "sum"), ("flagged", "sum"),
        ("ts", "min"), ("ts", "max"),
        ("items_qty", "sum"), ("items_total_cents", "sum"),
    ])
    return g.rename_columns([
        "conv_id", "p_turns", "p_chars", "p_flagged",
        "p_first_ts", "p_last_ts", "p_qty", "p_total_cents",
    ])


_ROLLUP_COMBINE = [
    ("p_turns", "sum"), ("p_chars", "sum"), ("p_flagged", "sum"),
    ("p_first_ts", "min"), ("p_last_ts", "max"),
    ("p_qty", "sum"), ("p_total_cents", "sum"),
]
_ROLLUP_PARTIAL_NAMES = ["conv_id", "p_turns", "p_chars", "p_flagged",
                         "p_first_ts", "p_last_ts", "p_qty", "p_total_cents"]
_ROLLUP_FINAL_NAMES = ["conv_id", "n_turns", "total_chars", "n_flagged",
                       "first_ts", "last_ts", "items_qty",
                       "items_total_cents"]


def conv_rollup(validated: Dataset, combine: str = "shuffle") -> Dataset:
    """VALIDATED rows → one row per conversation.

    The combine input is the per-batch partials (≈ #convs touched per
    batch), so a hot conversation with millions of turns contributes one
    partial row per batch — skew-tolerant without salting (the combine
    is associative).

    ``combine="shuffle"`` (default) runs Ray's ``groupby().aggregate``
    — unbounded key cardinality, the 10^12-turn design point where
    distinct conversations themselves exceed one task's memory.
    ``combine="tree"`` replaces the sort-shuffle with two Arrow
    ``group_by`` map passes (wide blocks → one block): measured 8.4 s
    vs 13.3 s end-to-end at sf0.1 because Ray's Aggregate costs
    ~0.5 s/block in sort/partition machinery regardless of block size —
    correct whenever one row per distinct key fits a single task
    (≲10M conversations); both paths produce identical rows (tested)."""
    partials = validated.map_batches(_rollup_partials, batch_format="pyarrow")
    if combine == "tree":
        from ..util import tree_combine

        return tree_combine(partials, ["conv_id"], _ROLLUP_COMBINE,
                            _ROLLUP_PARTIAL_NAMES, _ROLLUP_FINAL_NAMES)
    agg = partials.groupby("conv_id").aggregate(
        Sum("p_turns", alias_name="n_turns"),
        Sum("p_chars", alias_name="total_chars"),
        Sum("p_flagged", alias_name="n_flagged"),
        Min("p_first_ts", alias_name="first_ts"),
        Max("p_last_ts", alias_name="last_ts"),
        Sum("p_qty", alias_name="items_qty"),
        Sum("p_total_cents", alias_name="items_total_cents"),
    )
    return agg


# ---------------------------------------------------------------------------
# Ordered conversation assembly (A4 — the analogue of the reference's
# multipage merge, app/utils/ocr_engine.py:229-237): groupby(conv_id) with
# in-group sort on turn_idx.  Never relies on global order.
# ---------------------------------------------------------------------------

def _assemble_group(group: pa.Table) -> pa.Table:
    g = group.sort_by([("turn_idx", "ascending")])
    conv_id = g.column("conv_id")[0].as_py()
    texts = g.column("extracted_text").to_pylist()
    turn_idxs = g.column("turn_idx").to_pylist()
    # exact-duplicate turns (same turn_idx) keep first occurrence, like the
    # reference's md5-cache short-circuit (app/utils/ocr_engine.py:123-126)
    seen: set[int] = set()
    doc_parts, kept = [], 0
    for ti, tx in zip(turn_idxs, texts):
        if ti in seen:
            continue
        seen.add(ti)
        kept += 1
        if tx:
            doc_parts.append(tx)
    return pa.table({
        "conv_id": pa.array([conv_id], pa.string()),
        "n_turns": pa.array([kept], pa.int64()),
        "doc_text": pa.array(["\n\n".join(doc_parts)], pa.string()),
        "doc_chars": pa.array([sum(len(p) for p in doc_parts)], pa.int64()),
    })


def assemble_conversations(validated: Dataset) -> Dataset:
    """One merged document per conversation, turns in turn_idx order.
    Partitioning assumption: a conversation fits in one group/block
    (hot conversations are bounded by turn count, not bytes × turns —
    for truly unbounded groups, the rollup path is the scalable one)."""
    return validated.select_columns(
        ["conv_id", "turn_idx", "extracted_text"]
    ).groupby("conv_id").map_groups(_assemble_group, batch_format="pyarrow")


def assemble_conversations_scalable(validated: Dataset,
                                    range_size: int = 4096) -> Dataset:
    """Hierarchical ordered assembly for UNBOUNDED conversations (the
    skew-safe variant of ``assemble_conversations``): turns are first
    assembled per (conv_id, turn-range bucket) — bucket = turn_idx //
    range_size, so each bucket is a contiguous slice of the conversation
    and in-bucket dedup-by-turn_idx stays correct — then the per-bucket
    segments (already ordered) are concatenated per conversation in
    bucket order.  A hot conversation with millions of turns never forms
    one giant group; the second groupby sees one short row per bucket."""

    def assemble_segment(group: pa.Table) -> pa.Table:
        g = group.sort_by([("turn_idx", "ascending")])
        conv_id = g.column("conv_id")[0].as_py()
        bucket = g.column("bucket")[0].as_py()
        seen: set[int] = set()
        parts, kept = [], 0
        for ti, tx in zip(g.column("turn_idx").to_pylist(),
                          g.column("extracted_text").to_pylist()):
            if ti in seen:
                continue
            seen.add(ti)
            kept += 1
            if tx:
                parts.append(tx)
        return pa.table({
            "conv_id": pa.array([conv_id], pa.string()),
            "bucket": pa.array([bucket], pa.int64()),
            "n_turns": pa.array([kept], pa.int64()),
            "seg_chars": pa.array([sum(len(p) for p in parts)], pa.int64()),
            "seg_text": pa.array(["\n\n".join(parts)], pa.string()),
        })

    def concat_segments(group: pa.Table) -> pa.Table:
        g = group.sort_by([("bucket", "ascending")])
        conv_id = g.column("conv_id")[0].as_py()
        segs = [s for s in g.column("seg_text").to_pylist() if s]
        doc = "\n\n".join(segs)
        return pa.table({
            "conv_id": pa.array([conv_id], pa.string()),
            "n_turns": pa.array([int(pc.sum(g.column("n_turns")).as_py())],
                                pa.int64()),
            "doc_text": pa.array([doc], pa.string()),
            # doc_chars = Σ per-turn text lengths (separator-free), same
            # definition as the single-level assembly
            "doc_chars": pa.array([int(pc.sum(g.column("seg_chars")).as_py())],
                                  pa.int64()),
        })

    bucketed = validated.select_columns(
        ["conv_id", "turn_idx", "extracted_text"]
    ).map_batches(
        lambda b: b.append_column(
            "bucket",
            pc.cast(pc.divide(b.column("turn_idx").cast(pa.int64()),
                              pa.scalar(range_size, pa.int64())), pa.int64())),
        batch_format="pyarrow")
    segments = bucketed.groupby(["conv_id", "bucket"]).map_groups(
        assemble_segment, batch_format="pyarrow")
    return segments.groupby("conv_id").map_groups(
        concat_segments, batch_format="pyarrow")


def extract_validated_ordered(ds: Dataset,
                              as_of: date = DEFAULT_AS_OF) -> Dataset:
    """Ordered-extraction variant (the north star's literal shape):
    ``groupby(conv_id)`` + in-group ``turn_idx`` sort BEFORE extraction,
    so each conversation's turns pass through the extractor as one
    ordered group (the analogue of the reference's sequential per-
    document page loop, ``app/utils/ocr_engine.py:188-216``).

    Because per-turn extraction is stateless, this produces byte-
    identical records to the unordered ``extract_validated`` (proven in
    tests) — the default pipeline therefore skips this shuffle entirely
    and pays it only in the stages that need co-location (assembly /
    rollup).  This variant exists for extractors that DO need ordered
    cross-turn context (e.g. a future conversation-level model): swap it
    in and the ordering guarantee is already enforced.
    """
    from ..stages.extract import extract_batch

    def extract_group(group: pa.Table) -> pa.Table:
        return extract_batch(group.sort_by([("turn_idx", "ascending")]), as_of)

    return ds.groupby("conv_id").map_groups(extract_group,
                                            batch_format="pyarrow")

"""Resumable partitioned output with per-partition lineage records
(north rule; FIXTURES.md §F4).  Replaces the reference's Redis
md5-keyed result cache (``app/utils/ocr_engine.py:123-135,154-160``)
with deterministic partition layout + a commit manifest:

- one output partition per input shard (or shard group): the resume
  unit;
- write protocol: write Parquet into ``<out>/.tmp-<part>/`` → fsync
  manifest line → atomic rename to ``<out>/<part>/`` — a partition
  either exists completely or not at all;
- lineage record per partition: input shard(s), output path, row count,
  order-insensitive content checksum, committed_at;
- a resumed run lists committed partitions from the manifest and skips
  them (idempotent, no duplicates, no gaps — proven by checksum in
  tests).

Checksum = (sum mod 2^64 of per-row sha1-derived uint64 over the key
columns, row count) — order-insensitive, duplicate-sensitive; computed
by READING BACK the written partition as a pure dataset aggregate
(column-pruned, key columns only), so the manifest records what is
actually on disk and the computation is idempotent under Ray Data task
retries (a side-effecting accumulator actor would double-count
re-executed tasks and can race the driver's read).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass

import pyarrow as pa
import ray
from ray.data import Dataset

MANIFEST = "_MANIFEST.jsonl"
_MASK = (1 << 64) - 1


@dataclass
class LineageRecord:
    input_shard: str
    partition_id: int
    output_path: str
    row_count: int
    checksum: str
    committed_at: float


def row_hash64(parts: tuple) -> int:
    h = hashlib.sha1()
    for p in parts:
        h.update(str(p).encode("utf-8", "surrogatepass"))
        h.update(b"\x1f")
    return int.from_bytes(h.digest()[:8], "big")


def table_checksum(table: pa.Table, key_cols: list[str]) -> tuple[int, int]:
    """(sum-of-row-hashes mod 2^64, row_count) — order-insensitive."""
    cols = [table.column(c).to_pylist() for c in key_cols]
    total = 0
    for parts in zip(*cols):
        total = (total + row_hash64(parts)) & _MASK
    return total, table.num_rows


def dataset_checksum(ds: Dataset, key_cols: list[str]) -> tuple[int, int]:
    """Distributed order-insensitive checksum: per-batch partial sums
    (one tiny row per batch) reduced driver-side.  The checksum is part
    of the DATASET RESULT — unlike the earlier fire-and-forget
    accumulator-actor design, it cannot race the driver's read
    (cross-caller actor calls are unordered) and cannot double-count
    when Ray Data re-executes a task after a failure: a retried batch
    simply reproduces the same partial row."""

    def partial(b: pa.Table) -> pa.Table:
        s, n = table_checksum(b, key_cols)
        return pa.table({"p_sum": pa.array([s], pa.uint64()),
                         "p_n": pa.array([n], pa.int64())})

    total, rows = 0, 0
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        for s, n in zip(b.column("p_sum").to_pylist(),
                        b.column("p_n").to_pylist()):
            total = (total + s) & _MASK
            rows += n
    return total, rows


def load_manifest(out_dir: str) -> dict[str, LineageRecord]:
    path = os.path.join(out_dir, MANIFEST)
    records: dict[str, LineageRecord] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = LineageRecord(**json.loads(line))
                    records[rec.input_shard] = rec
    return records


def _append_manifest(out_dir: str, rec: LineageRecord) -> None:
    path = os.path.join(out_dir, MANIFEST)
    with open(path, "a") as f:
        f.write(json.dumps(asdict(rec)) + "\n")
        f.flush()
        os.fsync(f.fileno())


def run_resumable(input_shards: list[str], out_dir: str, make_ds,
                  key_cols: list[str] = ("conv_id", "turn_idx", "extracted_text"),
                  metrics=None) -> list[LineageRecord]:
    """Process each input shard into its own committed output partition,
    skipping shards already in the manifest.

    ``make_ds(shard_path) -> Dataset`` builds the (lazy) pipeline for one
    shard; each shard's Dataset executes with full cluster parallelism,
    shards run in sequence (at fleet scale each shard group is its own
    ``ray job submit`` — the manifest protocol is identical).

    Returns the lineage records committed by THIS run (skipped shards
    excluded)."""
    os.makedirs(out_dir, exist_ok=True)
    committed = load_manifest(out_dir)
    new_records: list[LineageRecord] = []
    for part_id, shard in enumerate(input_shards):
        shard_key = os.path.basename(shard)
        if shard_key in committed:
            continue
        part_name = f"part-{os.path.splitext(shard_key)[0]}"
        final_dir = os.path.join(out_dir, part_name)
        tmp_dir = os.path.join(out_dir, f".tmp-{part_name}")
        if os.path.exists(tmp_dir):  # crashed attempt — start clean
            import shutil
            shutil.rmtree(tmp_dir)
        ds: Dataset = make_ds(shard)
        ds.write_parquet(tmp_dir)
        # checksum the WRITTEN partition (read-back): commits record what
        # is actually on disk, and the computation is a pure dataset
        # aggregate — idempotent under task retries, no ordering hazard
        import ray.data as rd

        csum, rows = dataset_checksum(
            rd.read_parquet(tmp_dir, columns=list(key_cols)), list(key_cols))
        if os.path.exists(final_dir):
            import shutil
            shutil.rmtree(final_dir)
        os.replace(tmp_dir, final_dir)
        rec = LineageRecord(
            input_shard=shard_key, partition_id=part_id,
            output_path=final_dir, row_count=rows,
            checksum=f"{csum:016x}", committed_at=time.time(),
        )
        _append_manifest(out_dir, rec)
        new_records.append(rec)
        if metrics is not None:
            metrics.incr_many.remote({
                "partitions_committed_total": 1.0,
                "rows_committed_total": float(rows),
            })
    return new_records


def compact_partition(out_dir: str, part_name: str,
                      key_cols: list[str] =
                      ("conv_id", "turn_idx", "extracted_text"),
                      num_files: int = 1) -> int:
    """Compact one committed partition's many small part files into
    ``num_files`` (the maintenance pass every long-lived partitioned
    dataset needs — streaming writers leave one file per block).

    Content-preserving by proof, not by hope: the rewritten partition's
    order-insensitive checksum must equal the manifest record's before
    the atomic swap — a mismatch aborts with the original intact.  The
    manifest itself is untouched (same path, same content, same
    checksum), so resume semantics cannot observe a compaction.
    Returns the file count after compaction."""
    import ray.data as rd

    final_dir = os.path.join(out_dir, part_name)
    recs = [r for r in load_manifest(out_dir).values()
            if os.path.basename(r.output_path) == part_name]
    if not recs:
        raise ValueError(f"{part_name} is not a committed partition")
    rec = recs[0]
    tmp_dir = os.path.join(out_dir, f".compact-{part_name}")
    if os.path.exists(tmp_dir):
        import shutil
        shutil.rmtree(tmp_dir)
    rd.read_parquet(final_dir).repartition(num_files) \
        .write_parquet(tmp_dir)
    csum, rows = dataset_checksum(
        rd.read_parquet(tmp_dir, columns=list(key_cols)),
        list(key_cols))
    if f"{csum:016x}" != rec.checksum or rows != rec.row_count:
        import shutil
        shutil.rmtree(tmp_dir)
        raise RuntimeError(
            f"compaction checksum mismatch for {part_name}: "
            f"{csum:016x}/{rows} != {rec.checksum}/{rec.row_count}")
    import shutil
    old = final_dir + ".pre-compact"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.replace(final_dir, old)
    os.replace(tmp_dir, final_dir)
    shutil.rmtree(old)
    return len([f for f in os.listdir(final_dir)
                if f.endswith(".parquet")])

"""Mergeable sketches — approximate aggregates for 100 TB-scale jobs
(SURVEY §2.6 notes the reference has none; ray_guide 'Aggregation at
scale': emit one serialized sketch per batch, merge in a tiny stage).

HyperLogLog (Flajolet et al. '07, public): approximate COUNT DISTINCT
with fixed 2^p-register memory, mergeable by register-wise max — ideal
for the per-batch-partial → small-merge shape.  Hashing is 64-bit blake2b
(deterministic; never Python ``hash``)."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def _hash64(s: str) -> int:
    """64-bit blake2b hash.  NOT two concatenated crc32s: CRC is linear,
    so crc32(b, seed1) and crc32(b, seed2) differ by a constant for
    equal-length inputs — the halves are correlated and bias HLL ranks
    (measured +30 % cardinality error)."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8", "surrogatepass"),
                        digest_size=8).digest(), "big")


class HyperLogLog:
    """Classic HLL with p-bit register index (default p=12 → 4096
    registers, ~1.6 % standard error)."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = (registers if registers is not None
                          else np.zeros(self.m, dtype=np.uint8))

    def add_hashes(self, hashes: np.ndarray) -> None:
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (hashes << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of the remaining bits + 1
        ranks = np.zeros(len(hashes), dtype=np.uint8)
        work = rest.copy()
        mask = np.ones(len(hashes), dtype=bool)
        for r in range(1, 64 - self.p + 2):
            top = (work >> np.uint64(63)) & np.uint64(1)
            new_done = mask & (top == 1)
            ranks[new_done] = r
            mask &= ~new_done
            if not mask.any():
                break
            work = work << np.uint64(1)
        np.maximum.at(self.registers, idx, ranks)

    def add_strings(self, values: list[str]) -> None:
        if not values:
            return
        hashes = np.fromiter((_hash64(v) for v in values),
                             dtype=np.uint64, count=len(values))
        self.add_hashes(hashes)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv_sum = np.sum(2.0 ** -self.registers.astype(np.float64))
        e = alpha * m * m / inv_sum
        if e <= 2.5 * m:  # small-range correction
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                e = m * math.log(m / zeros)
        return float(e)

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def deserialize(cls, data: bytes, p: int = 12) -> "HyperLogLog":
        return cls(p, np.frombuffer(data, dtype=np.uint8).copy())


def approx_distinct(ds: Dataset, col: str, p: int = 12) -> float:
    """Distributed approximate COUNT(DISTINCT col): one HLL per batch
    (serialized to bytes, 4 KB each), register-max merge on the driver
    over the tiny sketch rows."""

    def sketch_batch(b: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        h.add_strings([str(v) for v in b.column(col).to_pylist()])
        return pa.table({"sketch": pa.array([h.serialize()], pa.binary())})

    merged = HyperLogLog(p)
    sketches = ds.map_batches(sketch_batch, batch_format="pyarrow")
    for b in sketches.iter_batches(batch_format="pyarrow", batch_size=1024):
        for s in b.column("sketch").to_pylist():
            merged = merged.merge(HyperLogLog.deserialize(s, p))
    return merged.estimate()


def approx_distinct_per_group(ds: Dataset, key: str, col: str,
                              p: int = 12) -> "pa.Table":
    """GROUPED approximate COUNT(DISTINCT): one HLL per (batch, key)
    partial, register-max merged per key through a ``groupby(key)``
    over sketch rows — the exchange carries 4 KB sketches instead of
    distinct values, so a 1e9-distinct group costs the same 4 KB as a
    10-distinct group (the mergeable-sketch-as-grouped-aggregate shape;
    the exact twin `events_distinct_users_per_type` shuffles distinct
    pairs instead and is the right tool when they fit).  Group
    cardinality must be bounded enough for one sketch row per key per
    batch — the same contract as every partial-agg here."""
    import pyarrow.compute as pc

    def sketch_batch(b: pa.Table) -> pa.Table:
        import numpy as np

        keys_arr = b.column(key).combine_chunks().dictionary_encode()
        idx = keys_arr.indices.to_numpy(zero_copy_only=False)
        vals = b.column(col).to_pylist()
        # one stable argsort groups the batch by key; each key's value
        # slice feeds its sketch in a single pass (no per-key re-scan)
        order = np.argsort(idx, kind="stable")
        bounds = np.flatnonzero(np.diff(idx[order], prepend=-1))
        out_k, out_s = [], []
        dict_vals = keys_arr.dictionary.to_pylist()
        for s, e in zip(bounds, np.append(bounds[1:], len(order))):
            h = HyperLogLog(p)
            h.add_strings([str(vals[i]) for i in order[s:e]])
            out_k.append(dict_vals[idx[order[s]]])
            out_s.append(h.serialize())
        return pa.table({key: pa.array(out_k, keys_arr.dictionary.type),
                         "sketch": pa.array(out_s, pa.binary())})

    def merge_group(g: pa.Table) -> pa.Table:
        merged = HyperLogLog(p)
        for s in g.column("sketch").to_pylist():
            merged = merged.merge(HyperLogLog.deserialize(s, p))
        return pa.table({
            key: g.column(key).slice(0, 1),
            "approx_distinct": pa.array([merged.estimate()],
                                        pa.float64())})

    out = ds.map_batches(sketch_batch, batch_format="pyarrow") \
        .groupby(key).map_groups(merge_group, batch_format="pyarrow")
    rows = out.take_all()
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {key: pa.array([], pa.string()),
         "approx_distinct": pa.array([], pa.float64())})


class CountMinSketch:
    """Count-Min sketch (Cormode & Muthukrishnan '05, public):
    approximate per-key counts in fixed ``depth × width`` memory,
    MERGEABLE by element-wise addition — the heavy-hitter / frequency
    scale path when the distinct-key space doesn't fit anywhere.
    Estimates never undercount; overcount ≤ 2N/width with prob
    ≥ 1 − 2^−depth.  Hashing reuses the Bloom filter's vectorized
    splitmix64 double hashing (deterministic across processes)."""

    def __init__(self, width: int = 1 << 14, depth: int = 4,
                 counts: np.ndarray | None = None):
        self.width = width
        self.depth = depth
        self.counts = (counts if counts is not None
                       else np.zeros((depth, width), dtype=np.int64))

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        from .partition import _SM_C2, _splitmix64

        k = keys.astype(np.uint64)
        h1 = _splitmix64(k)
        h2 = _splitmix64(k ^ _SM_C2) | np.uint64(1)
        i = np.arange(self.depth, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :])
                % np.uint64(self.width)).astype(np.int64)

    def add(self, keys: np.ndarray,
            weights: np.ndarray | None = None) -> None:
        pos = self._positions(keys)
        w = (np.ones(len(keys), dtype=np.int64)
             if weights is None else weights.astype(np.int64))
        for d in range(self.depth):
            np.add.at(self.counts[d], pos[d], w)

    def estimate(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        return np.min(
            np.stack([self.counts[d][pos[d]] for d in range(self.depth)]),
            axis=0)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        self.counts += other.counts
        return self


def cms_counts(ds: Dataset, key_col: str, width: int = 1 << 14,
               depth: int = 4) -> CountMinSketch:
    """Distributed CMS build: one serialized partial sketch per batch
    (fixed size — 512 KiB at the defaults), summed into one sketch.
    Keys hash to uint64 via the samplers' deterministic path when not
    already integral."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        cms = CountMinSketch(width, depth)
        col = b.column(key_col)
        if pa.types.is_integer(col.type):
            keys = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            import pandas as pd

            col = pc.cast(col, pa.string())
            keys = pd.util.hash_pandas_object(
                col.to_pandas(), index=False).to_numpy()
        cms.add(keys)
        return pa.table({"counts": pa.array([cms.counts.tobytes()],
                                            pa.binary())})

    merged = CountMinSketch(width, depth)
    for cb in ds.map_batches(partial, batch_format="pyarrow") \
                .iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in cb.column("counts").to_pylist():
            merged.counts += np.frombuffer(
                blob, dtype=np.int64).reshape(depth, width)
    return merged

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

"""Distributed Bloom filter for semi-join pre-filtering.

The 100 TB join-pruning pattern: when a big probe side must be reduced
by membership in a build side's key set, shipping the exact key set is
O(distinct keys) while a Bloom bitmap is O(m bits) REGARDLESS of key
count — build it distributed (per-batch partial bitmaps, OR-combined),
broadcast it once with ``ray.put``, and probe vectorized inside
``map_batches``.  False positives are then removed by an exact join
that only sees the (small) surviving probe rows, so end-to-end
semantics stay EXACT — the bloom only decides how much data the exact
join has to move.

Hashing is splitmix64 double-hashing (Kirsch–Mitzenmacher: position_j =
h1 + j·h2 mod m), fully vectorized in numpy uint64 arithmetic — no
per-row Python anywhere.  Compare the reference's in-memory set
membership (app/utils/validators.py — semantics only, no code shared);
here membership must work when the key set itself doesn't fit on one
node.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (public PRNG
    construction, Steele et al.)."""
    x = (x + _GOLDEN).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * _C1).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * _C2).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


def _positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(len(keys), k) bit positions via double hashing."""
    u = keys.astype(np.int64).view(np.uint64)
    h1 = _splitmix64(u)
    h2 = _splitmix64(u ^ _C1) | np.uint64(1)  # odd → full-period stride
    j = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + j[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def bitmap_set(bitmap: np.ndarray, keys: np.ndarray, m_bits: int,
               k: int) -> None:
    """Set the k bits of every key into ``bitmap`` (uint8[m_bits/8])."""
    pos = _positions(keys, m_bits, k).ravel()
    np.bitwise_or.at(bitmap, pos >> 3,
                     np.left_shift(np.uint8(1), (pos & 7).astype(np.uint8)))


def bitmap_contains(bitmap: np.ndarray, keys: np.ndarray, m_bits: int,
                    k: int) -> np.ndarray:
    """Vectorized membership mask — True where ALL k bits are set
    (definite miss ⇒ False; True may still be a false positive)."""
    pos = _positions(keys, m_bits, k)
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def build_bloom(ds: Dataset, col: str, m_bits: int = 1 << 20,
                k: int = 7) -> np.ndarray:
    """OR-combine per-batch partial bitmaps of ``col`` into one bloom.

    Each batch emits ONE row carrying its m/8-byte bitmap; the driver
    reduce is an associative OR over fixed-size buffers (b batches →
    b·m/8 bytes through the object store, independent of row count —
    the whole point).  m_bits must be a multiple of 8."""
    nbytes = m_bits // 8

    def partial(b: pa.Table) -> pa.Table:
        bm = np.zeros(nbytes, np.uint8)
        keys = b.column(col).drop_null().combine_chunks() \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(keys):
            bitmap_set(bm, keys, m_bits, k)
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    out = np.zeros(nbytes, np.uint8)
    parts = ds.map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_size=64, batch_format="pyarrow"):
        for buf in b.column("bm"):
            np.bitwise_or(out, np.frombuffer(buf.as_py(), np.uint8),
                          out=out)
    return out

"""Partitioning & skew handling (north rule: "repartitions on
hash(conv_id) with salting for hot conversations, handles skew via
split_blocks on oversized Arrow batches").

Hash partitioning is deterministic crc32 — never Python ``hash()``
(``PYTHONHASHSEED``-dependent).  The salting contract: a *hot* key's
rows spread over ``salt_factor`` buckets (by ``turn_idx``), which is
safe exactly because per-turn extraction is stateless and per-conv
aggregation is associative (partial-agg + final combine).  Stages that
genuinely need a whole conversation co-located (ordered assembly) must
not consume salted buckets — they use the plain ``groupby(conv_id)``
path and document the bounded-group-size assumption.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

_SALT_PRIME = 2654435761  # Knuth multiplicative


def crc_bucket(keys: list[str], n_buckets: int) -> np.ndarray:
    return np.fromiter(
        (zlib.crc32(k.encode("utf-8", "surrogatepass")) % n_buckets
         for k in keys),
        dtype=np.int32, count=len(keys))


def detect_hot_keys(ds: Dataset, key_col: str,
                    threshold_frac: float = 0.05) -> list[str]:
    """Keys holding more than ``threshold_frac`` of all rows, found with
    per-batch partial counts (the shuffle moves one row per (key, batch),
    so this is safe to run on the full corpus)."""

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(key_col).aggregate([(key_col, "count")])
        return g.rename_columns([key_col, "p_n"])

    counts = ds.map_batches(partial, batch_format="pyarrow") \
               .groupby(key_col).aggregate(Sum("p_n", alias_name="n")) \
               .materialize()
    total = counts.sum("n") or 0
    if total == 0:
        return []
    cut = threshold_frac * total
    # filter DISTRIBUTED: only the (by definition ≤ 1/threshold_frac)
    # hot keys ever reach the driver, not the full per-key count table
    hot = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(
            pc.cast(b.column("n"), pa.float64()), cut)),
        batch_format="pyarrow")
    return sorted(r[key_col] for r in hot.take_all())


def add_salted_bucket(batch: pa.Table, key_col: str, n_buckets: int,
                      hot_keys: frozenset, salt_col: str = "turn_idx",
                      salt_factor: int = 8,
                      out_col: str = "bucket") -> pa.Table:
    """bucket = crc32(key) % n  — except hot keys, whose rows fan out to
    ``salt_factor`` distinct buckets driven by ``salt_col``."""
    keys = batch.column(key_col).to_pylist()
    buckets = crc_bucket(keys, n_buckets).astype(np.int64)
    if hot_keys:
        salts = batch.column(salt_col).to_pylist()
        for i, k in enumerate(keys):
            if k in hot_keys:
                buckets[i] = (buckets[i]
                              + 1
                              + (int(salts[i] or 0) % salt_factor) * _SALT_PRIME
                              ) % n_buckets
    return batch.append_column(out_col, pa.array(buckets, pa.int64()))


def salted_partition(ds: Dataset, key_col: str, n_buckets: int,
                     hot_keys: list[str] | None = None,
                     salt_col: str = "turn_idx",
                     salt_factor: int = 8) -> Dataset:
    """Attach the salted bucket column (auto-detecting hot keys when not
    given).  Downstream co-location = ``groupby('bucket')``; the bucket
    column is the ONE partitioning key reused across stages."""
    if hot_keys is None:
        hot_keys = detect_hot_keys(ds, key_col)
    hot_ref = ray.put(frozenset(hot_keys))

    def add(b: pa.Table) -> pa.Table:
        return add_salted_bucket(b, key_col, n_buckets, ray.get(hot_ref),
                                 salt_col=salt_col, salt_factor=salt_factor)

    return ds.map_batches(add, batch_format="pyarrow")


def configure_for_wide_rows(max_block_mb: int = 64) -> None:
    """Cap block bytes so multi-MB text rows can't produce oversized
    Arrow batches (split_blocks pressure valve; call before building
    pipelines over wide-row corpora)."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.target_max_block_size = max_block_mb * 1024 * 1024


def sample_threshold_hex(frac: float) -> str:
    """The 8-hex-digit keep threshold for :func:`deterministic_sample` —
    exposed so a SQL oracle can embed the same constant."""
    return format(int(frac * 0xFFFFFFFF), "08x")


def row_hash_hex(row: tuple, seed: int) -> str:
    """THE seeded row-identity hash every sampler shares — and the exact
    construction the DuckDB oracles replay:
    ``md5(str(v1) || chr(31) || ... || chr(31) || str(seed))`` as the
    full lowercase hexdigest.  Keep this in one place: three samplers
    and their SQL twins desynchronize silently if the encoding drifts.
    (Called per row in sampler hot loops — keep it allocation-light.)"""
    payload = "\x1f".join(map(str, row)) + "\x1f" + str(seed)
    return hashlib.md5(payload.encode("utf-8", "surrogatepass")).hexdigest()


def deterministic_sample(ds: Dataset, frac: float, id_cols: list[str],
                         seed: int = 42) -> Dataset:
    """Deterministic Bernoulli(~frac) sampling: a row is kept iff the
    first 8 hex chars of ``md5(str(v1) + '\\x1f' + ... + '\\x1f' +
    str(seed))`` compare ≤ :func:`sample_threshold_hex`.  Unlike
    ``Dataset.random_sample`` the decision is a pure function of the
    row's identity — stable across reruns, partitionings and cluster
    sizes (resume-safe), and exactly reproducible in SQL
    (``substr(md5(c1 || chr(31) || ... || chr(31) || '42'), 1, 8)``),
    so the driver's DuckDB oracle can hash-match the sample."""
    if not id_cols:
        raise ValueError("deterministic_sample requires id_cols: the hash "
                         "must cover the row's identity, not just a stratum "
                         "key (hashing only the key keeps or drops whole "
                         "strata wholesale)")
    threshold = sample_threshold_hex(frac)

    def pick(b: pa.Table) -> pa.Table:
        parts = [b.column(c).to_pylist() for c in id_cols]
        keep = [row_hash_hex(row, seed)[:8] <= threshold
                for row in zip(*parts)]
        return b.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(pick, batch_format="pyarrow")


def weighted_sample(ds: Dataset, weight_col: str, frac: float,
                    id_cols: list[str], seed: int = 42,
                    weight_scale: int = 100,
                    materialize: bool = True) -> Dataset:
    """Deterministic weighted Bernoulli sample: keep probability
    proportional to the row's (non-negative) weight,
    ``p_i = frac * w_i / mean(w)``, decided by the row's md5 hash.

    The whole decision is EXACT integer arithmetic so a SQL oracle can
    reproduce it bit-for-bit: weights scale to ints
    (``round(w * weight_scale)``), the population total S and count n
    come from one exact distributed integer aggregate, ``frac`` is taken
    as an exact decimal fraction, and the predicate is
    ``U * S * den < num * w_int * n * 2^32`` over arbitrary-precision
    ints — no float boundary for the two sides to disagree on.  Rows
    with ``p_i > 1`` saturate to certain-keep on both sides.

    The input is MATERIALIZED before the totals pre-pass: (S, n) and the
    pick pass must observe identical rows, and a lazy upstream pipeline
    would otherwise execute twice (correctness hazard if any upstream
    stage is nondeterministic or order-dependent, plus a 2× compute
    tax).  Callers sampling a raw ``read_parquet`` can pass
    ``materialize=False`` to skip the object-store copy — a plain read
    re-executes deterministically and re-reading beats holding the
    corpus twice at scale."""
    from fractions import Fraction

    if not id_cols:
        raise ValueError("weighted_sample requires id_cols")
    if materialize:
        ds = ds.materialize()
    fr = Fraction(str(frac))
    num, den = fr.numerator, fr.denominator

    def scale_w(v: np.ndarray) -> np.ndarray:
        # exact std::round emulation — floor(x + 0.5) is NOT it: the
        # addition can round up one ulp below a .5 boundary where
        # DuckDB's round(value*100) rounds down
        from ..util import scaled_int_sql
        return scaled_int_sql(v, weight_scale)

    def part(b: pa.Table) -> pa.Table:
        w = scale_w(b.column(weight_col).to_numpy(zero_copy_only=False))
        return pa.table({"p_s": pa.array([int(w.sum())], pa.int64()),
                         "p_n": pa.array([len(w)], pa.int64())})

    S = n = 0
    for b in ds.map_batches(part, batch_format="pyarrow").iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        S += sum(b.column("p_s").to_pylist())
        n += sum(b.column("p_n").to_pylist())
    if S <= 0:
        raise ValueError("weighted_sample: non-positive total weight")
    rhs_const = num * n * 4294967296

    def pick(b: pa.Table) -> pa.Table:
        parts = [b.column(c).to_pylist() for c in id_cols]
        w = scale_w(b.column(weight_col).to_numpy(zero_copy_only=False))
        keep = []
        for i, row in enumerate(zip(*parts)):
            u = int(row_hash_hex(row, seed)[:8], 16)
            keep.append(u * S * den < rhs_const * int(w[i]))
        return b.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(pick, batch_format="pyarrow")


def reservoir_per_key(ds: Dataset, key_col: str, k: int,
                      id_cols: list[str], seed: int = 42) -> Dataset:
    """Deterministic per-key uniform sample WITHOUT replacement: every
    key keeps its ``k`` rows with the smallest seeded md5 row-hash —
    statistically a reservoir sample, but a pure row function (stable
    across reruns/partitionings, resume-safe) and exactly reproducible
    in SQL as ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY md5(...),
    id) <= k``.  Co-location comes from ``groupby(key_col)``."""
    if not id_cols:
        raise ValueError("reservoir_per_key requires id_cols")

    def sample(g: pa.Table) -> pa.Table:
        parts = [g.column(c).to_pylist() for c in id_cols]
        keys = [(row_hash_hex(row, seed),
                 tuple(str(x) for x in row), i)
                for i, row in enumerate(zip(*parts))]
        keys.sort()
        return g.take([i for _, _, i in keys[:k]])

    return ds.groupby(key_col).map_groups(sample, batch_format="pyarrow")


def stratified_sample(ds: Dataset, key_col: str, frac: float,
                      id_cols: list[str], seed: int = 42) -> Dataset:
    """Per-stratum deterministic sampling: within every ``key_col``
    stratum, keep ~``frac`` of rows chosen by a seeded hash of the row's
    identity.  ``id_cols`` is REQUIRED and must identify the row within
    its stratum (e.g. ``[key_col, "turn_idx"]``) — hashing the key alone
    would keep or drop entire strata wholesale."""
    cols = list(id_cols)
    if key_col not in cols:
        cols = [key_col] + cols
    return deterministic_sample(ds, frac, cols, seed=seed)


# ---------------------------------------------------------------------------
# Bloom-filter semi-join: broadcast pre-filter that cuts shuffle volume
# ---------------------------------------------------------------------------

_SM_C1 = np.uint64(0x9E3779B97F4A7C15)
_SM_C2 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C3 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mixing constants);
    deterministic across processes (unlike Python hash())."""
    x = (x + _SM_C1).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _SM_C2
    x ^= x >> np.uint64(27)
    x *= _SM_C3
    x ^= x >> np.uint64(31)
    return x


class BloomFilter:
    """Fixed-size Bloom filter over uint64 keys, fully vectorized and
    MERGEABLE (bitwise OR) — per-batch partial filters combine into one
    small broadcastable bitmap.  False positives only (never negatives),
    so an exact join downstream keeps results exact while the broadcast
    pre-filter drops the bulk of non-matching rows BEFORE they enter
    the shuffle."""

    def __init__(self, n_bits: int = 1 << 23, n_hashes: int = 4,
                 bits: np.ndarray | None = None):
        assert n_bits % 64 == 0
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.words = (bits if bits is not None
                      else np.zeros(n_bits // 64, dtype=np.uint64))

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        k = keys.astype(np.uint64)
        h1 = _splitmix64(k)
        h2 = _splitmix64(k ^ _SM_C2) | np.uint64(1)
        i = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        return (h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)

    def add(self, keys: np.ndarray) -> None:
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.words, pos >> np.uint64(6),
                         np.uint64(1) << (pos & np.uint64(63)))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        pos = self._positions(keys)
        hit = (self.words[pos >> np.uint64(6)]
               >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        self.words |= other.words
        return self


def bloom_semi_join(big: "Dataset", small: "Dataset", big_key: str,
                    small_key: str, n_bits: int = 1 << 23,
                    n_hashes: int = 4,
                    num_partitions: int = 8) -> "Dataset":
    """EXACT semi-join (rows of ``big`` with ≥1 key match in ``small``)
    with a broadcast Bloom pre-filter: per-batch partial filters over
    the small side's keys OR-merge on the driver (fixed bitmap size —
    1 MiB at the default 2^23 bits), the bitmap broadcasts via ray.put,
    and a vectorized membership mask drops non-matching big-side rows
    BEFORE the hash-join shuffle.  Bloom false positives survive the
    pre-filter but are removed by the exact inner join against the
    distinct small keys, so the result is exactly the semi-join —
    the filter only cuts shuffle volume (the 'minimize shuffles' lever
    when the big side is 100 TB and the match rate is low)."""
    def partial_bloom(b: pa.Table) -> pa.Table:
        bf = BloomFilter(n_bits, n_hashes)
        bf.add(b.column(small_key).to_numpy(zero_copy_only=False))
        return pa.table({"bits": pa.array([bf.words.tobytes()], pa.binary())})

    merged = BloomFilter(n_bits, n_hashes)
    for cb in small.map_batches(partial_bloom, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow", batch_size=None):
        for blob in cb.column("bits").to_pylist():
            merged.words |= np.frombuffer(blob, dtype=np.uint64)
    bloom_ref = ray.put((merged.words, n_bits, n_hashes))

    def prefilter(b: pa.Table) -> pa.Table:
        words, nb, nh = ray.get(bloom_ref)
        bf = BloomFilter(nb, nh, bits=words)
        mask = bf.contains(b.column(big_key).to_numpy(zero_copy_only=False))
        return b.filter(pa.array(mask))

    def local_distinct(b: pa.Table) -> pa.Table:
        g = b.select([small_key]).group_by(small_key).aggregate(
            [(small_key, "count")])
        return g.rename_columns([small_key, "p_n"])

    from ray.data.aggregate import Sum

    keys = small.map_batches(local_distinct, batch_format="pyarrow") \
        .groupby(small_key).aggregate(Sum("p_n", alias_name="_n")) \
        .map_batches(lambda b: b.drop_columns(["_n"]),
                     batch_format="pyarrow")
    return big.map_batches(prefilter, batch_format="pyarrow") \
        .join(keys, join_type="inner", num_partitions=num_partitions,
              on=(big_key,), right_on=(small_key,))


def deterministic_split(ds: Dataset, fracs: dict[str, float],
                        id_cols: list[str], seed: int = 42) -> Dataset:
    """Deterministic train/val/test (or any named-band) assignment: the
    row's :func:`row_hash_hex` falls into cumulative
    :func:`sample_threshold_hex` bands, so membership is a pure
    function of row identity — stable across reruns, partitionings and
    cluster sizes, leak-free by construction (one row can never be in
    two splits), and exactly replayable by a SQL CASE over the same
    md5.  Appends a ``split`` column."""
    if not id_cols:
        raise ValueError("deterministic_split requires id_cols")
    # f != f catches NaN (abs(nan-1) > eps is False, so the sum check
    # alone would pass it); a negative band passes the sum check too
    # and sample_threshold_hex(>1) yields a 9-hex cut that silently
    # mis-bands the 8-hex hashes
    if any(f < 0 or f != f for f in fracs.values()):
        raise ValueError(f"split fractions must be non-negative: {fracs}")
    total = sum(fracs.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    bands = []
    acc = 0.0
    names = list(fracs)
    for name in names[:-1]:
        acc += fracs[name]
        bands.append((sample_threshold_hex(acc), name))

    def assign(b: pa.Table) -> pa.Table:
        for c in id_cols:
            # refuse NULL ids loudly: Python would hash the string
            # 'None' into a band while the SQL twin's md5(NULL||..)
            # is NULL and falls to the ELSE band — a silent bit-exact
            # divergence on any corpus with NULL ids
            if b.column(c).null_count:
                raise ValueError(
                    f"deterministic_split: NULL in id column {c!r}")
        parts = [b.column(c).to_pylist() for c in id_cols]
        out = []
        for row in zip(*parts):
            h = row_hash_hex(row, seed)[:8]
            for cut, name in bands:
                if h <= cut:
                    out.append(name)
                    break
            else:
                out.append(names[-1])
        return b.append_column("split", pa.array(out, pa.string()))

    return ds.map_batches(assign, batch_format="pyarrow")

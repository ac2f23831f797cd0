"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

The reference's only dedup-shaped machinery is its md5-content cache key
(``app/utils/ocr_engine.py:123-126``, SURVEY §2.6 A5) — exact dedup by
content hash.  The near-dup family is the standard large-corpus
extension (Broder MinHash/LSH, Charikar SimHash — public literature),
built Ray-Data-first:

- hashing/sketching is vectorized inside ``map_batches`` (numpy, crc32 —
  never ``hash()``, which is ``PYTHONHASHSEED``-dependent);
- the only shuffles are ``groupby`` on *short keys* (20-byte content
  hash, 8-byte band hash) — payloads never ride through a shuffle;
- candidate verification broadcasts the text/vector side via ``ray.put``
  (small-side broadcast, SURVEY §2.5); at 100 TB you co-partition
  verification by ``hash(min_id)`` instead — noted per function.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

from ..util import default_pool_size, vec_matrix, with_schema

# ---------------------------------------------------------------------------
# exact dedup (A5/J3): content-hash key, keep-first
# ---------------------------------------------------------------------------


def row_digest(parts: tuple) -> bytes:
    """Full-width row digest for the batch dedup's WINNER path: sha1
    over LENGTH-PREFIXED str() parts — like :func:`joined_key_strings`,
    the prefix makes the encoding unambiguous, so a separator byte
    inside a value cannot make two distinct key tuples share a digest
    (('a\\x1fb','c') vs ('a','b\\x1fc') — the winner groupby would
    otherwise silently merge two different rows and drop one).  (The
    streaming path hashes the Arrow-joined key string instead — a
    different keyspace, never compared with this one.)"""
    h = hashlib.sha1()
    for p in parts:
        s = str(p).encode("utf-8", "surrogatepass")
        h.update(str(len(s)).encode())
        h.update(b":")
        h.update(s)
        h.update(b"\x1f")
    return h.digest()


def joined_key_strings(batch: pa.Table, cols: list[str]) -> pa.Array:
    """Unambiguous joined string of the key columns, built with Arrow
    kernels (cast + binary_join_element_wise) — no per-row Python.
    Each value is LENGTH-PREFIXED (``len:value``) before joining, so a
    separator byte inside a value cannot make two distinct key tuples
    collide (('a\\x1fb','c') vs ('a','b\\x1fc')) — load-bearing for the
    streaming index, which has no full-width recheck.  Nulls render as
    a sentinel (colliding only with a literal value equal to the
    sentinel itself, like the old str(None) encoding)."""
    arrs = []
    for c in cols:
        col = batch.column(c)
        if not pa.types.is_string(col.type):
            col = pc.cast(col, pa.string())
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if col.null_count:
            col = pc.fill_null(col, "\x00<null>")
        arrs.append(col)
    if len(arrs) == 1:
        return arrs[0]
    prefixed = [
        pc.binary_join_element_wise(
            pc.cast(pc.utf8_length(col), pa.string()), col, ":")
        for col in arrs
    ]
    return pc.binary_join_element_wise(*prefixed, "\x1f")


def add_content_key(batch: pa.Table, cols: list[str],
                    key_col: str = "content_key") -> pa.Table:
    """Append a VECTORIZED 64-bit content key for duplicate DETECTION:
    a deterministic siphash (``pandas.util.hash_pandas_object``, fixed
    hash key) over the Arrow-joined key string.  Replaces the per-row
    Python sha1 loop that capped dedup scan rate (~1M rows/s/core); the
    full-width sha1 digest is now computed only inside the rare
    duplicate-winner path (:func:`add_full_hash`), where a 64-bit
    birthday collision would otherwise merge two genuinely different
    rows."""
    import pandas as pd

    joined = joined_key_strings(batch, cols)
    keys = pd.util.hash_pandas_object(
        joined.to_pandas(), index=False).to_numpy()
    return batch.append_column(key_col, pa.array(keys, pa.uint64()))


def add_full_hash(batch: pa.Table, cols: list[str],
                  out_col: str = "content_hash") -> pa.Table:
    """Append the full sha1-hex content hash (per-row; used only on the
    rare duplicate rows so a 64-bit detection-key collision cannot merge
    two different rows in the winner groupby)."""
    key_lists = [batch.column(c).to_pylist() for c in cols]
    hex_out = [row_digest(parts).hex() for parts in zip(*key_lists)]
    return batch.append_column(out_col, pa.array(hex_out, pa.string()))


def duplicated_keys(partials: Dataset, key_col: str, count_col: str,
                    cap: int = 20_000_000) -> list:
    """Keys whose summed per-batch partial counts exceed 1 — the shared
    combine behind dedup_exact's duplicate detection and
    minhash_candidates' multi-member-bucket detection.

    The driver-side numpy reduce is exact and skips the sort-shuffle's
    ~5 s fixed machinery (measured at 200k keys / 32 cpus: 5.5 s
    groupby vs <1 s reduce), but it holds every distinct key once —
    bounded by ``cap`` partial rows (~320 MB of uint64 at the default).
    Past the cap (the 100 TB regime, where distinct keys ≈ corpus rows)
    the shuffle groupby is the only shape that scales, and its fixed
    cost has long since amortized; only the >1 keys — bounded by true
    duplicate volume — ever reach the driver there."""
    key_parts: list[np.ndarray] = []
    cnt_parts: list[np.ndarray] = []
    total = 0
    for cb in partials.iter_batches(batch_format="pyarrow",
                                    batch_size=None):
        total += cb.num_rows
        if total > cap:
            key_parts = []
            break
        key_parts.append(cb.column(key_col).to_numpy(zero_copy_only=False))
        cnt_parts.append(cb.column(count_col).to_numpy(zero_copy_only=False))
    if key_parts or total == 0:
        if total == 0:
            return []
        keys = np.concatenate(key_parts)
        cnts = np.concatenate(cnt_parts)
        uniq, inv = np.unique(keys, return_inverse=True)
        return uniq[np.bincount(inv, weights=cnts) > 1].tolist()
    from ray.data.aggregate import Sum

    counts = partials.groupby(key_col).aggregate(
        Sum(count_col, alias_name="n"))
    out: list = []
    for cb in counts.iter_batches(batch_format="pyarrow",
                                  batch_size=65536):
        sub = cb.filter(pc.greater(cb.column("n"), 1))
        out.extend(sub.column(key_col).to_pylist())
    return out


def _should_cache_hashed(ds: Dataset) -> bool:
    """Adaptive default for ``dedup_exact(cache_hashed=...)``: caching
    holds a second copy of the corpus in the object store (it saves up
    to 3 re-reads), which is the right trade only while that copy FITS.
    Estimate in-memory size from the input files' on-disk bytes (cheap
    metadata, no execution; Parquet decompresses ~4×) and cache only
    when the estimate stays under half the cluster's object store —
    past that, re-reading the source beats spilling a full copy."""
    try:
        files = ds.input_files()
        if not files:
            return True
        import os

        disk = sum(os.path.getsize(f) for f in files if os.path.exists(f))
        if disk <= 0:
            return True
        store = ray.cluster_resources().get("object_store_memory", 0)
        if not store:
            return True
        return 4 * disk < 0.5 * store
    except Exception:
        return True


def dedup_exact(ds: Dataset, key_cols: list[str],
                order_cols: list[str],
                cache_hashed: bool | None = None) -> Dataset:
    """Keep exactly one row per identical ``key_cols`` tuple — the winner
    is the smallest ``order_cols`` tuple (deterministic under any
    partitioning).

    Scale shape (duplicates are RARE in real corpora, and were ~1 % in
    ours): a per-batch partial-count pass finds the duplicated 20-byte
    sha1 keys; that small set is broadcast, unique rows stream through a
    vectorized mask untouched (payload bytes never enter a shuffle), and
    only the duplicated rows — a tiny fraction — go through the
    groupby(hash) keep-first path.  Replaces a naive
    ``groupby(hash).map_groups(first)`` whose per-singleton-group Python
    calls ran 9k rows/s; this runs at input-scan speed.

    ``cache_hashed=True`` materializes the hashed dataset once (object
    store, spills past memory) so the read+hash pass runs once instead of
    up to three times across the counts/uniques/winners consumers.  Set
    False on corpora where re-reading the source beats holding a full
    copy in the store (e.g. 100 TB inputs on fast storage — the hash then
    runs per consumer but nothing is ever held twice).  The default
    (``None``) decides from the input files' sizes vs the cluster's
    object store (:func:`_should_cache_hashed`), so callers don't need
    to know the failure mode."""
    if cache_hashed is None:
        cache_hashed = _should_cache_hashed(ds)
    hashed = ds.map_batches(
        lambda b: add_content_key(b, key_cols),
        batch_format="pyarrow")
    if cache_hashed:
        hashed = hashed.materialize()

    def partial_counts(b: pa.Table) -> pa.Table:
        g = b.select(["content_key"]).group_by("content_key").aggregate(
            [("content_key", "count")])
        return g.rename_columns(["content_key", "p_n"])

    partials = hashed.map_batches(partial_counts, batch_format="pyarrow")
    dup_key_list = duplicated_keys(partials, "content_key", "p_n")
    dup_keys = frozenset(dup_key_list)
    dup_ref = ray.put(sorted(dup_keys))

    def split(b: pa.Table, keep_dups: bool) -> pa.Table:
        # value_set Arrow array built once per worker per dup set —
        # SINGLE-slot cache (replaced when a different dedup run's ref
        # shows up), so repeated dedup_exact calls in long-lived workers
        # can't accumulate old arrays
        ref_hex = dup_ref.hex()
        cached = _DEDUP_VALUE_SET.get("cur")
        if cached is None or cached[0] != ref_hex:
            cached = (ref_hex, pa.array(ray.get(dup_ref), pa.uint64()))
            _DEDUP_VALUE_SET["cur"] = cached
        value_set = cached[1]
        mask = pc.is_in(b.column("content_key"), value_set=value_set)
        if not keep_dups:
            mask = pc.invert(mask)
        return b.filter(mask)

    uniques = hashed.map_batches(lambda b: split(b, False).drop_columns(
        ["content_key"]), batch_format="pyarrow")
    if not dup_keys:
        return uniques

    def first(group: pa.Table) -> pa.Table:
        # full sha1 string groups here, so a 64-bit content_key collision
        # cannot merge two genuinely different rows
        g = group.sort_by([(c, "ascending") for c in order_cols])
        return g.slice(0, 1).drop_columns(["content_hash", "content_key"])

    # The full-width digest is computed ONLY on the rare duplicate rows
    # (per-row sha1; everything upstream of here is vectorized).  The
    # dup set is materialized and REPARTITIONED before the groupby: the
    # filter leaves ~corpus-block-count near-empty blocks, and the
    # sort-shuffle pays its fixed cost per BLOCK (measured at 1M rows /
    # 20k dups: 150 tiny blocks → 7.1 s, repartition(8) → 1.4 s).
    # Width scales with the dup volume so huge dup sets still fan out.
    dup_rows = hashed.map_batches(
        lambda b: add_full_hash(split(b, True), key_cols),
        batch_format="pyarrow").materialize()
    width = max(2, min(512, dup_rows.count() // 100_000 + 2))
    dup_winners = dup_rows.repartition(width) \
        .groupby("content_hash").map_groups(first, batch_format="pyarrow")
    return uniques.union(dup_winners)


def dedup_transcripts_exact(ds: Dataset) -> Dataset:
    """Transcript-table exact dedup: identical (conv_id, turn_idx, text)
    rows collapse to the earliest ts (reference cache semantics: first
    computation wins)."""
    return dedup_exact(ds, ["conv_id", "turn_idx", "text"], ["ts"])


# ---------------------------------------------------------------------------
# incremental / streaming exact dedup: shared mutable index actors
# ---------------------------------------------------------------------------


@ray.remote(num_cpus=0)
class DedupIndexShard:
    """One shard of a shared mutable dedup index (the one pattern that
    genuinely needs raw actors — SURVEY 'custom operators' path (c)):
    ``check_and_add`` atomically tests-and-inserts a list of keys and
    returns the is-new mask.  Actor method calls serialize per actor, so
    first-wins is race-free within a shard; keys are hash-routed so each
    key always lands on the same shard.  Memory: one 20-byte digest per
    distinct key per shard — shard count scales the index horizontally.

    Calls are IDEMPOTENT per ``caller_token``: a retried Ray Data task
    (or a re-executed lazy stage) replays the same token and gets the
    original reply instead of all-False — without this, a task retry
    after a mid-run worker death would silently DROP every first-seen
    row of the batch (the side-effecting-stage retry bug).  The reply
    cache is BOUNDED (FIFO, newest ``_REPLY_CAP`` batches): retries
    arrive within a short window, so old replies are safe to evict and
    the index memory stays one digest per distinct key.  Known limit:
    two DISTINCT batches in one run with byte-identical key sequences
    (e.g. a whole input block duplicated on disk) share a token, so the
    second keeps its rows — the conservative direction (a missed drop,
    never lost data); use :func:`dedup_exact` when exact-duplicate
    blocks must collapse deterministically."""

    _REPLY_CAP = 4096

    def __init__(self) -> None:
        from collections import OrderedDict

        self.seen: set[bytes] = set()
        self.replies: OrderedDict[bytes, list[bool]] = OrderedDict()

    def check_and_add(self, caller_token: bytes,
                      keys: list[bytes]) -> list[bool]:
        prev = self.replies.get(caller_token)
        if prev is not None:
            return prev
        seen = self.seen
        out = []
        for k in keys:
            if k in seen:
                out.append(False)
            else:
                seen.add(k)
                out.append(True)
        self.replies[caller_token] = out
        while len(self.replies) > self._REPLY_CAP:
            self.replies.popitem(last=False)
        return out

    def size(self) -> int:
        return len(self.seen)

    def snapshot(self) -> bytes:
        """All ingested digests, concatenated (20 bytes each), sorted so
        the snapshot is deterministic for a given index state."""
        return b"".join(sorted(self.seen))

    def restore(self, blob: bytes) -> int:
        self.seen.update(blob[i:i + 20] for i in range(0, len(blob), 20))
        return len(self.seen)


class StreamingDeduper:
    """Callable map_batches stage holding the shard handles: hashes the
    key columns, routes digests to their shard, keeps first-seen rows.
    Unlike :func:`dedup_exact` (two-pass, deterministic winner via
    ``order_cols``) this is ONE pass and INCREMENTAL — later datasets
    run against the same index drop everything already ingested — at the
    cost of an arrival-order-dependent winner among non-identical
    duplicate rows (for exact full-row duplicates the output is
    identical either way)."""

    def __init__(self, shards: list, key_cols: list[str]):
        import os

        self.shards = shards
        self.key_cols = key_cols
        # per-RUN nonce, drawn once on the driver: a retried task
        # deserializes the same instance (same nonce + same batch bytes
        # → replayed reply), while a genuinely new ingestion run
        # constructs a new stage (fresh nonce → fresh decisions)
        self.run_token = os.urandom(8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # join the key columns with Arrow kernels; the remaining per-row
        # work is ONE sha1 call over the joined bytes (the full-width
        # digest is load-bearing here: a 64-bit key collision in a
        # shared index would silently DROP a non-duplicate row)
        joined = joined_key_strings(batch, self.key_cols).to_pylist()
        digests = [hashlib.sha1(j.encode("utf-8", "surrogatepass")).digest()
                   for j in joined]
        n_shards = len(self.shards)
        by_shard: dict[int, list[int]] = {}
        for i, d in enumerate(digests):
            by_shard.setdefault(d[0] % n_shards, []).append(i)
        keep = [False] * len(digests)
        # deterministic batch identity × run nonce → idempotent under
        # task retries, fresh across ingestion runs
        token = hashlib.sha1(self.run_token + b"".join(digests)).digest()
        futures = {
            s: self.shards[s].check_and_add.remote(
                token, [digests[i] for i in idxs])
            for s, idxs in by_shard.items()
        }
        for s, idxs in by_shard.items():
            for i, is_new in zip(idxs, ray.get(futures[s])):
                keep[i] = is_new
        return batch.filter(pa.array(keep, pa.bool_()))


def make_dedup_index(num_shards: int = 8) -> list:
    """Spawn the shared index shards (pass the list to every
    :func:`dedup_exact_streaming` call that should share one index)."""
    return [DedupIndexShard.remote() for _ in range(num_shards)]


_INDEX_META = "_INDEX_META.json"


def save_dedup_index(index: list, dir_path: str) -> None:
    """Snapshot the streaming-dedup index to disk so the ingestion
    history survives a driver restart (the shards are otherwise
    RAM-only, and incremental semantics depend on that history).  Same
    commit discipline as the lineage manifest (state/lineage.py): write
    ``.tmp`` → atomic rename per shard, meta last — a snapshot is either
    complete or invisible to :func:`load_dedup_index`.

    Call AFTER the ingestion run's Dataset has materialized (the
    streaming stage mutates shards while executing; snapshotting
    mid-run would capture a prefix).

    Crash-safe across REPLACEMENT saves too: each snapshot writes its
    shard files into a content-named generation directory, and the meta
    file (which names the live generation) is replaced LAST, atomically
    — a crash anywhere mid-save leaves the previous snapshot fully
    restorable.  Superseded generations are pruned after commit."""
    import json
    import os
    import shutil

    os.makedirs(dir_path, exist_ok=True)
    meta_path = os.path.join(dir_path, _INDEX_META)
    blobs = ray.get([s.snapshot.remote() for s in index])
    gen = "gen-" + hashlib.sha1(
        b"\x1e".join(blobs) + len(index).to_bytes(4, "big")).hexdigest()[:16]
    gen_dir = os.path.join(dir_path, gen)
    os.makedirs(gen_dir, exist_ok=True)
    for i, blob in enumerate(blobs):
        path = os.path.join(gen_dir, f"shard-{i:04d}.bin")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"num_shards": len(index), "digest_bytes": 20,
                   "generation": gen}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, meta_path)  # commit point
    for name in os.listdir(dir_path):
        if name.startswith("gen-") and name != gen:
            shutil.rmtree(os.path.join(dir_path, name), ignore_errors=True)
        elif name.startswith("shard-") and name.endswith(".bin"):
            # pre-generation flat-layout snapshot, now superseded
            try:
                os.remove(os.path.join(dir_path, name))
            except OSError:
                pass


def load_dedup_index(dir_path: str) -> list:
    """Spawn fresh shards and restore a :func:`save_dedup_index`
    snapshot into them.  Shard count comes from the snapshot meta — the
    ``digest[0] % n_shards`` routing is only stable at the same width."""
    import json
    import os

    meta_path = os.path.join(dir_path, _INDEX_META)
    with open(meta_path) as f:
        meta = json.load(f)
    # pre-generation snapshots kept shard files at the top level
    gen_dir = (os.path.join(dir_path, meta["generation"])
               if "generation" in meta else dir_path)
    index = make_dedup_index(meta["num_shards"])
    futures = []
    for i, shard in enumerate(index):
        path = os.path.join(gen_dir, f"shard-{i:04d}.bin")
        with open(path, "rb") as f:
            futures.append(shard.restore.remote(f.read()))
    ray.get(futures)
    return index


def dedup_exact_streaming(ds: Dataset, key_cols: list[str],
                          index: list | None = None,
                          num_shards: int = 8) -> Dataset:
    """One-pass exact dedup against a shared mutable index — the
    continuous-ingestion path (new shards arrive, run the same stage,
    rows duplicating ANY prior ingestion drop).  For the batch path with
    a deterministic winner use :func:`dedup_exact`.

    The result is MATERIALIZED before returning: the stage mutates the
    index, so a lazily re-executed pipeline would see every row as
    already-ingested on its second run (per-task retries are separately
    safe via the shard's caller_token idempotency)."""
    if index is None:
        index = make_dedup_index(num_shards)
    return ds.map_batches(StreamingDeduper(index, key_cols),
                          batch_format="pyarrow").materialize()


# ---------------------------------------------------------------------------
# shared tokenization / shingling
# ---------------------------------------------------------------------------

def word_shingles(text: str, w: int = 3) -> set[str]:
    toks = text.split()
    if len(toks) < w:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + w]) for i in range(len(toks) - w + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _crc64(s: str) -> int:
    """Deterministic 64-bit string hash (blake2b).  Two concatenated
    crc32 streams were tried first and are subtly WRONG: CRC is linear,
    so the two halves differ by a length-dependent constant — correlated
    bits degrade SimHash (mirrored bit planes) and bias HLL."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8", "surrogatepass"),
                        digest_size=8).digest(), "big")


# ---------------------------------------------------------------------------
# MinHash + LSH (Broder '97 / LSH banding, public)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_MIX1 = np.uint64(0x9E3779B97F4A7C15)   # splitmix64 constants (public)
_MIX2 = np.uint64(0xBF58476D1CE4E5B9)
_MIX3 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _MIX1)
    x = (x ^ (x >> np.uint64(30))) * _MIX2
    x = (x ^ (x >> np.uint64(27))) * _MIX3
    return x ^ (x >> np.uint64(31))


def shingle_hashes(text: str, w: int = 3) -> np.ndarray:
    """Distinct 64-bit hashes of the word ``w``-shingles, vectorized:
    one blake2b per TOKEN (not per shingle), then a splitmix64-mixed
    rolling combine over the token-hash array in numpy.  ~w× fewer
    digest calls than hashing each shingle string."""
    toks = text.split()
    if not toks:
        return np.empty(0, dtype=np.uint64)
    th = np.fromiter((_crc64(t) for t in toks), dtype=np.uint64,
                     count=len(toks))
    if len(toks) < w:
        acc = th[0]
        for h in th[1:]:
            acc = _splitmix64(acc * _MIX2 ^ h)
        return np.unique(np.array([acc], dtype=np.uint64))
    acc = th[: len(th) - w + 1].copy()
    for j in range(1, w):
        acc = _splitmix64(acc * _MIX2 ^ th[j: len(th) - w + 1 + j])
    return np.unique(acc)


class MinHasher:
    """Actor-pool stage: text → k-permutation MinHash signature.
    Coefficients are derived from a fixed seed in ``__init__`` (once per
    actor), signatures are uint64[k]."""

    def __init__(self, text_col: str = "text", k: int = 64, w: int = 3,
                 seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=k, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=k, dtype=np.uint64)
        self.k = k
        self.w = w
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        base = shingle_hashes(text, self.w)
        if base.size == 0:
            return np.zeros(self.k, dtype=np.uint64)
        # (a*x + b) mod p, computed in python-int free numpy (mod 2^64 wrap
        # then mod p is fine for uniformity at these k)
        sigs = (self.a[:, None] * base[None, :] + self.b[:, None]) % _MERSENNE
        return sigs.min(axis=1)

    def signatures_batch(self, col) -> np.ndarray:
        """Vectorized :meth:`signature` over a string column — identical
        values (pytest-pinned), one Python hash call per DISTINCT token
        per batch (the round-4 simhash_batch discipline).  ~2× the
        scalar stage (the k-permutation min pass bounds both shapes);
        at 1M docs the minhash WALL is bucket-shuffle/verify-bound, so
        this trims the signature stage, not the headline (measured,
        BASELINE.md):

        - one Arrow whitespace split (str.split() parity after dropping
          boundary empties), blake2b on the ``dictionary_encode``
          vocabulary only;
        - shingle hashes via the same shifted-take rolling splitmix
          combine as the scalar, across the whole batch at once (docs
          shorter than ``w`` take the scalar's chain, per doc — rare);
        - per-doc signature minima via ``np.minimum.reduceat`` per
          permutation over the flat shingle-hash array; a min over the
          multiset equals the scalar's min over ``np.unique``, so no
          per-doc dedup pass is needed."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        n = len(col)
        k, w = self.k, self.w
        sigs = np.zeros((n, k), dtype=np.uint64)
        if n == 0:
            return sigs
        toks = pc.utf8_split_whitespace(col)
        doc_lens = pc.list_value_length(toks).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        d = np.repeat(np.arange(n, dtype=np.int64), doc_lens)[ne]
        flat = flat.filter(pa.array(ne))
        lens = np.bincount(d, minlength=n).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        if len(flat):
            enc = flat.dictionary_encode()
            vocab = enc.dictionary.to_pylist()
            vh = np.fromiter((_crc64(t) for t in vocab), np.uint64,
                             count=len(vocab))
            th = vh[enc.indices.to_numpy(zero_copy_only=False)]
        else:
            th = np.empty(0, np.uint64)
        big = lens >= w
        cnt = np.where(big, lens - w + 1,
                       np.where(lens > 0, 1, 0)).astype(np.int64)
        out_offs = np.concatenate([[0], np.cumsum(cnt)])
        sh = np.zeros(int(out_offs[-1]), np.uint64)
        if big.any():
            intra = np.arange(len(th)) - np.repeat(offs[:-1], lens)
            starts = np.flatnonzero(intra <= np.repeat(lens, lens) - w)
            acc = th[starts].copy()
            for j in range(1, w):
                acc = _splitmix64(acc * _MIX2 ^ th[starts + j])
            # both source (starts) and dest (out_offs) run in doc order,
            # so the scatter is a repeat+arange index map
            cnt_big = cnt[big]
            within = np.arange(len(starts)) - np.repeat(
                np.concatenate([[0], np.cumsum(cnt_big)])[:-1], cnt_big)
            sh[np.repeat(out_offs[:-1][big], cnt_big) + within] = acc
        for i in np.flatnonzero((lens > 0) & ~big):
            a = th[offs[i]]
            for hh in th[offs[i] + 1: offs[i + 1]]:
                a = _splitmix64(a * _MIX2 ^ hh)
            sh[out_offs[i]] = a
        nz = cnt > 0
        if nz.any():
            red_at = out_offs[:-1][nz]
            for kk in range(k):
                v = (self.a[kk] * sh + self.b[kk]) % _MERSENNE
                sigs[nz, kk] = np.minimum.reduceat(v, red_at)
        # parity fallback for \x1c–\x1f rows (whitespace to str.split(),
        # not to Unicode — same gate as simhash_batch)
        odd = pc.match_substring_regex(col, "[\\x1c-\\x1f]") \
            .to_numpy(zero_copy_only=False)
        if odd.any():
            texts = col.to_pylist()
            for i in np.flatnonzero(odd):
                sigs[i] = self.signature(texts[i] or "")
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.signatures_batch(batch.column(self.text_col))
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), pa.uint64()), self.k)
        return batch.append_column("minhash_sig", arr)


def lsh_band_rows(batch: pa.Table, id_col: str, bands: int = 16) -> pa.Table:
    """signature → (band_id, band_hash, id) rows (1→bands expansion),
    fully vectorized: the fixed-width signature column reshapes off its
    flat Arrow buffer and each band digests its row slice with a rolling
    splitmix64 combine over (n, bands) at once.  This replaced a per-row
    per-band blake2b-of-joined-string (16 digests + a Python loop per
    doc — the dominant cost of the banding stage at 1M docs); any
    deterministic band digest is semantically equivalent (equal slices
    hash equal, so recall is unchanged; a cross-slice collision only
    adds a candidate the exact verify filters).  Bands are clamped to k
    (the old code emitted constant-hash bands past k, bucketing the
    whole corpus together)."""
    sig_col = batch.column("minhash_sig")
    if isinstance(sig_col, pa.ChunkedArray):
        sig_col = sig_col.combine_chunks()
    n = len(sig_col)
    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    if n == 0:
        return pa.table({
            "band_id": pa.array([], pa.int32()),
            "band_hash": pa.array([], pa.int64()),
            id_col: pa.array([], type=batch.schema.field(id_col).type),
        })
    if pa.types.is_fixed_size_list(sig_col.type):
        k = sig_col.type.list_size
        sig = sig_col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.uint64, copy=False).reshape(n, k)
    else:                                  # variable list fallback
        sig = np.asarray(sig_col.to_pylist(), dtype=np.uint64)
        k = sig.shape[1]
    bands = min(bands, k)
    r = max(1, k // bands)
    use = sig[:, :bands * r].reshape(n, bands, r)
    acc = _splitmix64(use[:, :, 0].copy())
    for j in range(1, r):
        acc = _splitmix64(acc * _MIX2 ^ use[:, :, j])
    band_hash = (acc & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    return pa.table({
        "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
        "band_hash": pa.array(band_hash.reshape(-1), pa.int64()),
        id_col: ids.take(pa.array(np.repeat(np.arange(n), bands),
                                  pa.int64())),
    })


def _bucket_pairs(group: pa.Table, id_col: str) -> pa.Table:
    ids = sorted(group.column(id_col).to_pylist())
    a_out, b_out = [], []
    # cap pathological buckets (everything-matches-everything degenerate
    # band): emit star pairs against the minimum id instead of n², which
    # preserves connectivity for the component step; such pairs carry
    # capped=1 so the completeness re-expansion only runs when needed
    capped = int(len(ids) > 64)
    if capped:
        root = ids[0]
        for x in ids[1:]:
            a_out.append(root)
            b_out.append(x)
    else:
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_out.append(ids[i])
                b_out.append(ids[j])
    t = group.schema.field(id_col).type
    return pa.table({"id_a": pa.array(a_out, t), "id_b": pa.array(b_out, t),
                     "capped": pa.array([capped] * len(a_out), pa.int32())})


def minhash_candidates(ds: Dataset, id_col: str, text_col: str = "text",
                       k: int = 64, bands: int = 16, w: int = 3,
                       concurrency: int | tuple | None = None) -> Dataset:
    """text → minhash → band rows → bucket groupby → candidate id pairs
    (distinct).  The signature pool AUTOSCALES (1 → pool): signature
    work per batch is light relative to extraction, so a fixed
    full-width pool spends more wall time spinning actors than hashing
    on small corpora (measured 5.2 s → 3.7 s warm at sf0.1); big
    corpora ramp to the same width either way."""
    if concurrency is None:
        concurrency = (1, default_pool_size())
    from ray.data.aggregate import Max

    sigged = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"text_col": text_col, "k": k, "w": w},
        batch_format="pyarrow", concurrency=concurrency)
    # materialized once: the multi-member-bucket detection pass and the
    # pair-emitting pass both consume it (re-execution would re-run the
    # MinHasher); 3 int columns × bands rows per doc — tiny vs the corpus
    band_rows = sigged.select_columns(["minhash_sig", id_col]).map_batches(
        lambda b: lsh_band_rows(b, id_col, bands),
        batch_format="pyarrow").materialize()

    # Singleton buckets emit no pairs but dominated the old
    # groupby(band).map_groups wall time (one Python call per bucket ≈
    # one per doc×bands — the known ~9k-groups/s ceiling; measured 8.7 s
    # of a 5k-doc run).  Find the RARE multi-member buckets first via
    # per-batch partial counts over a combined uint64 bucket key (a
    # wrap/collision only marks a false multi-member bucket — harmless,
    # the real groupby below still keys on the true bucket columns) and
    # only those rows enter the per-bucket pair pass.
    def _bucket_key(b: pa.Table) -> np.ndarray:
        h = b.column("band_hash").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        bid = b.column("band_id").to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        return (h << np.uint64(6)) ^ bid

    def partial_counts(b: pa.Table) -> pa.Table:
        t = pa.table({"bk": pa.array(_bucket_key(b), pa.uint64())})
        g = t.group_by("bk").aggregate([("bk", "count")])
        return g.rename_columns(["bk", "p_n"])

    partials = band_rows.map_batches(partial_counts, batch_format="pyarrow")
    multi = duplicated_keys(partials, "bk", "p_n")
    multi_ref = ray.put(sorted(multi))

    def keep_multi(b: pa.Table) -> pa.Table:
        ref_hex = multi_ref.hex()
        cached = _DEDUP_VALUE_SET.get("minhash_multi")
        if cached is None or cached[0] != ref_hex:
            cached = (ref_hex, pa.array(ray.get(multi_ref), pa.uint64()))
            _DEDUP_VALUE_SET["minhash_multi"] = cached
        mask = pc.is_in(pa.array(_bucket_key(b), pa.uint64()),
                        value_set=cached[1])
        return b.filter(mask)

    # materialize + repartition the (rare) multi-bucket rows: the filter
    # leaves one near-empty block per band_rows block, and the bucket
    # groupby pays its sort-shuffle fixed cost per block (same fix as
    # dedup_exact's winner path)
    multi_rows = band_rows.map_batches(keep_multi,
                                       batch_format="pyarrow").materialize()
    width = max(2, min(512, multi_rows.count() // 100_000 + 2))
    pairs = multi_rows.repartition(width) \
        .groupby(["band_id", "band_hash"]).map_groups(
            lambda g: _bucket_pairs(g, id_col), batch_format="pyarrow")
    # distinct pairs (a pair can surface from several bands); vectorized
    # aggregate, and capped survives as max so any star-capped sighting
    # of the pair is visible downstream
    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("capped", alias_name="capped"))


# Broadcast-state stages run as plain TASKS, not actor pools: ray.get of
# a broadcast object from the local plasma store is (near-)zero-copy and
# cached per node, and a second actor pool in the same DAG can reserve
# the last free CPUs and stall the streaming executor (observed on a
# 4-CPU session: MinHasher pool + verifier pool + repartition = deadlock).
# Worker-process module caches below keep derived state across tasks.
_WORKER_CACHE: dict = {}     # jaccard broadcast-verify state (single slot)
_DEDUP_VALUE_SET: dict = {}  # dedup_exact dup-key array (single slot)


def _jaccard_verify_batch(batch: pa.Table, docs_ref, w: int) -> pa.Table:
    """Verify candidate pairs with exact n-gram Jaccard.  ``docs_ref``
    is a ray.put broadcast of {id: text}.  At 100 TB scale this becomes
    a co-partitioned join on hash(id) instead of a broadcast — the stage
    contract (pairs in, scored pairs out) is unchanged."""
    key = ("jaccard_docs", docs_ref.hex() if hasattr(docs_ref, "hex") else id(docs_ref))
    state = _WORKER_CACHE.get(key)
    if state is None:
        state = (ray.get(docs_ref), {})
        _WORKER_CACHE.clear()          # one broadcast live at a time
        _WORKER_CACHE[key] = state
    docs, cache = state

    def sh(i):
        s = cache.get(i)
        if s is None:
            s = word_shingles(docs.get(i, ""), w)
            cache[i] = s
        return s

    a = batch.column("id_a").to_pylist()
    b = batch.column("id_b").to_pylist()
    sims = [jaccard(sh(x), sh(y)) for x, y in zip(a, b)]
    return batch.append_column("jaccard", pa.array(sims, pa.float64()))


def _verify_pairs_broadcast(ds: Dataset, cands: Dataset, id_col: str,
                            text_col: str, w: int) -> Dataset:
    """Broadcast verify: {id: text} is ray.put once (fits-in-memory
    corpora — the bench path)."""
    docs = {}
    for batch in ds.select_columns([id_col, text_col]).iter_batches(
            batch_size=8192, batch_format="pyarrow"):
        docs.update(zip(batch.column(id_col).to_pylist(),
                        batch.column(text_col).to_pylist()))
    docs_ref = ray.put(docs)
    return cands.map_batches(lambda b: _jaccard_verify_batch(b, docs_ref, w),
                             batch_format="pyarrow")


def _verify_pairs_join(ds: Dataset, cands: Dataset, id_col: str,
                       text_col: str, w: int,
                       num_partitions: int | None = None) -> Dataset:
    """Co-partitioned verify (the 100 TB path): no driver-side corpus, no
    broadcast — two hash joins attach text_a then text_b to the pair
    rows (``Dataset.join`` hash-partitions on the key), then one
    vectorized map computes the exact n-gram Jaccard.  Payload rows move
    at most twice, partitioned by id — never through a single node.

    The candidate-pair side must be MATERIALIZED by the caller: pairs
    are tiny (candidate ids only), and keeping the MinHasher actor pool
    and the join aggregator actors in ONE streaming DAG can reserve
    every CPU on small clusters and stall the executor (the known
    pool-starvation failure mode — see util.default_pool_size)."""
    if num_partitions is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(2, min(16, cpus // 2))
    docs = ds.select_columns([id_col, text_col])
    a_side = docs.map_batches(
        lambda b: b.rename_columns(["id_a", "text_a"]), batch_format="pyarrow")
    b_side = docs.map_batches(
        lambda b: b.rename_columns(["id_b", "text_b"]), batch_format="pyarrow")
    # schema pins around the chained joins: on sparse corpora the
    # candidate aggregate (and join 1's empty partitions) emit
    # schema-less zero-row blocks that crash the pyarrow join finalize
    # ("No match for key field") — see util.with_schema
    base = ds.schema().base_schema
    id_type = base.field(id_col).type
    text_type = base.field(text_col).type
    pair_schema = pa.schema([("id_a", id_type), ("id_b", id_type),
                             ("capped", pa.int32())])
    cands = with_schema(cands, pair_schema)
    with_a = with_schema(
        cands.join(a_side, join_type="inner",
                   num_partitions=num_partitions, on=("id_a",)),
        pa.schema([("id_a", id_type), ("id_b", id_type),
                   ("capped", pa.int32()), ("text_a", text_type)]))
    with_ab = with_a.join(b_side, join_type="inner",
                          num_partitions=num_partitions, on=("id_b",))

    def score(b: pa.Table) -> pa.Table:
        sims = [jaccard(word_shingles(x or "", w), word_shingles(y or "", w))
                for x, y in zip(b.column("text_a").to_pylist(),
                                b.column("text_b").to_pylist())]
        return b.drop_columns(["text_a", "text_b"]).append_column(
            "jaccard", pa.array(sims, pa.float64()))

    return with_ab.map_batches(score, batch_format="pyarrow")


def minhash_dedup_pairs(ds: Dataset, id_col: str, text_col: str = "text",
                        threshold: float = 0.7, k: int = 64, bands: int = 16,
                        w: int = 3, verify: str = "broadcast",
                        expand_components: bool = True,
                        max_expand_component: int = 4096) -> Dataset:
    """End-to-end near-dup pair detection: MinHash/LSH candidates →
    exact Jaccard verify → pairs with jaccard ≥ threshold.

    ``verify="broadcast"`` (default) ray.puts the corpus text map —
    right when the corpus fits comfortably in the object store.
    ``verify="join"`` is the co-partitioned scale path: text attaches to
    candidate pairs via two hash-partitioned ``Dataset.join`` calls —
    no driver materialization, no broadcast.  Both produce identical
    pairs (tested).

    ``expand_components=True`` restores PAIR completeness lost to the
    ``_bucket_pairs`` star cap (degenerate >64-id buckets emit only
    star pairs, which preserves connectivity but can drop direct pairs).
    The pass runs ONLY when some bucket actually hit the cap (candidate
    rows carry a ``capped`` marker) — the common uncapped run stays
    fully streaming, no driver materialization.  When it runs:
    union-find components over the CANDIDATE pairs (not the confirmed
    ones — a capped bucket whose star root fails verification must not
    hide its members' true pairs), re-expand within components, verify
    the never-scored pairs.  Components larger than
    ``max_expand_component`` keep star pairs only (n² guard; logged).
    Driver memory during the pass is pairs-sized (the documented
    union-find trade; see representatives_from_pairs).  Note: pairs LSH
    itself never surfaced (both docs similar but sharing no band —
    recall < 1 by construction) are out of scope for this pass on
    uncapped corpora; transitive closure of verified pairs is the
    dedup-keep consumers' job (union-find / label propagation)."""
    # Candidates are materialized ONCE (pairs of ids — tiny): the verify
    # stage, the expansion's `seen` scan and any downstream consumer all
    # reuse the same blocks instead of re-running the MinHasher +
    # LSH-groupby pipeline per consumer (measured 4× on the bench).
    cands = minhash_candidates(ds, id_col, text_col,
                               k=k, bands=bands, w=w).materialize()
    if verify == "join":
        # partition count follows the PAIR volume (both joins key on pair
        # ids): a 16-way join over a few hundred pairs is pure aggregator
        # overhead, while millions of pairs want the fan-out
        n_parts = max(2, min(64, cands.count() // 4096 + 2))
        verified = _verify_pairs_join(ds, cands, id_col, text_col, w,
                                      num_partitions=n_parts)
    else:
        verified = _verify_pairs_broadcast(ds, cands, id_col, text_col, w)
    above = verified.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("jaccard"), threshold))
                   .drop_columns(["capped"]),
        batch_format="pyarrow")
    any_capped = expand_components and cands.map_batches(
        lambda t: t.filter(pc.greater(t.column("capped"), 0)),
        batch_format="pyarrow").count() > 0
    if not any_capped:
        return above

    # Driver-side completeness pass over PAIRS (≪ corpus), reached only
    # when star-capping occurred: components of the CANDIDATE graph,
    # re-expand, score never-verified pairs.
    seen: set[tuple] = set()
    for cb in cands.iter_batches(batch_size=65536, batch_format="pyarrow"):
        seen.update(zip(cb.column("id_a").to_pylist(),
                        cb.column("id_b").to_pylist()))
    members = sorted({i for p in seen for i in p})
    reps = representatives_from_pairs(sorted(seen), members)
    comps: dict = {}
    for i, r in reps.items():
        comps.setdefault(r, []).append(i)
    missing_a, missing_b = [], []
    for comp in comps.values():
        if len(comp) > max_expand_component:
            import logging
            logging.getLogger(__name__).warning(
                "minhash_dedup_pairs: component of %d ids exceeds "
                "max_expand_component=%d — pair output incomplete for it "
                "(connectivity preserved)", len(comp), max_expand_component)
            continue
        comp = sorted(comp)
        for x in range(len(comp)):
            for y in range(x + 1, len(comp)):
                p = (comp[x], comp[y])
                if p not in seen:
                    missing_a.append(p[0])
                    missing_b.append(p[1])
    if not missing_a:
        return above
    id_type = cands.schema().base_schema.field("id_a").type
    extra_cands = rd.from_arrow(pa.table({
        "id_a": pa.array(missing_a, id_type),
        "id_b": pa.array(missing_b, id_type),
        "capped": pa.array([0] * len(missing_a), pa.int32())})).materialize()
    if verify == "join":
        extra = _verify_pairs_join(ds, extra_cands, id_col, text_col, w)
    else:
        extra = _verify_pairs_broadcast(ds, extra_cands, id_col, text_col, w)
    extra_above = extra.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("jaccard"), threshold))
                   .drop_columns(["capped"]),
        batch_format="pyarrow")
    return above.union(extra_above)


def connected_components(edges: Dataset, max_iters: int = 25,
                         num_partitions: int = 8,
                         driver_pair_cap: int = 5_000_000) -> Dataset:
    """Connected components over an edge Dataset ``(id_a, id_b)`` →
    ``(id, rep)`` with rep = MIN id of the component, for every node
    that appears in an edge — the entry point the near-dup keep-list
    queries call.

    Hybrid dispatch (the bounded-driver-reduce pattern the dedup
    counters already use): the edge set is materialized (the
    propagation path reuses it every round anyway) and counted; at or
    under ``driver_pair_cap`` edges a single driver-side union-find
    resolves it — near-dup edge sets are orders of magnitude smaller
    than the corpus, and on small graphs the per-round Ray stage
    overhead (2 joins + groupby + sum per round) dominates wall time
    (sf0.1 semantic dedup: 363 s propagating 920 edges → ~6 s here).
    Beyond the cap it falls back to
    :func:`components_label_propagation` (identical min-id
    representatives — equivalence is pytest-pinned on random graphs)."""
    from ..util import with_schema

    edges = edges.select_columns(["id_a", "id_b"])
    id_type = edges.schema().base_schema.field("id_a").type
    edges = with_schema(edges, pa.schema([("id_a", id_type),
                                          ("id_b", id_type)]))
    if edges.count() > driver_pair_cap:
        return components_label_propagation(
            edges, max_iters=max_iters, num_partitions=num_partitions)

    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    nodes: set = set()
    for batch in edges.iter_batches(batch_format="pyarrow"):
        for a, b in zip(batch.column("id_a").to_pylist(),
                        batch.column("id_b").to_pylist()):
            nodes.add(a)
            nodes.add(b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
    # rep = NATURAL min of the component (ints numeric, strings
    # lexicographic) — exactly what the propagation path's Min
    # aggregate computes, and what the WITH RECURSIVE oracles pin
    rep_of_root: dict = {}
    roots = {n: find(n) for n in nodes}
    for n, r in roots.items():
        cur = rep_of_root.get(r)
        if cur is None or n < cur:
            rep_of_root[r] = n
    ids = sorted(nodes)
    return rd.from_arrow(pa.table({
        "id": pa.array(ids, id_type),
        "rep": pa.array([rep_of_root[roots[i]] for i in ids], id_type)}))


def components_label_propagation(edges: Dataset, max_iters: int = 25,
                                 num_partitions: int = 8) -> Dataset:
    """Distributed connected components over an edge Dataset
    ``(id_a, id_b)`` by iterative min-label propagation — the scale path
    for when even the PAIR set exceeds driver memory (the union-find in
    :func:`representatives_from_pairs` is the small-pairs path; both
    produce min-id representatives).

    Per round: attach each endpoint's current label to the edges (two
    hash-partitioned joins), send it to the opposite endpoint, and take
    the min per node — labels only ever decrease, so the label SUM is a
    monotone convergence witness (no extra diff join).  Rounds needed =
    component diameter; near-dup clusters are shallow (stars/cliques →
    1-2 rounds).  Returns ``(id, rep)`` for every node that appears in
    an edge; isolated nodes are their own rep by definition and never
    enter the computation."""
    from ray.data.aggregate import Min

    from ..util import with_schema

    edges = edges.select_columns(["id_a", "id_b"])
    id_type = edges.schema().base_schema.field("id_a").type
    # with_schema instead of a bare materialize(): select_columns is
    # SKIPPED on zero-row blocks (Ray forwards them untouched), so a
    # sparse pair grid yields a mix of (id_a,id_b) and
    # (id_a,id_b,cosine,...) blocks whose join-side concat breaks with
    # "No match or multiple matches for FieldRef" — dropping the empty
    # blocks makes the edge schema homogeneous
    edges = with_schema(edges, pa.schema([("id_a", id_type),
                                          ("id_b", id_type)]))
    label_schema = pa.schema([("id", id_type), ("label", id_type)])
    converged = False

    def as_nodes(col: str):
        return edges.select_columns([col]).map_batches(
            lambda b, c=col: pa.table(
                {"id": b.column(c), "label": b.column(c)}),
            batch_format="pyarrow")

    # with_schema: Ray's hash aggregate emits schema-less zero-row
    # blocks on sparse inputs (few edges, num_partitions partitions);
    # they crash the id_a/id_b joins below ("No match for FieldRef").
    # labels is materialized each round anyway, so the pin is free.
    labels = with_schema(
        as_nodes("id_a").union(as_nodes("id_b"))
        .groupby("id").aggregate(Min("label", alias_name="label")),
        label_schema)
    prev_sum = labels.sum("label")
    # max_iters + 1: labels that stabilize exactly on round max_iters
    # need one extra no-change round to OBSERVE convergence — raising
    # there would reject a fully correct result
    for _ in range(max_iters + 1):
        la = labels.map_batches(
            lambda b: pa.table({"id_a": b.column("id"),
                                "label_a": b.column("label")}),
            batch_format="pyarrow")
        lb = labels.map_batches(
            lambda b: pa.table({"id_b": b.column("id"),
                                "label_b": b.column("label")}),
            batch_format="pyarrow")
        # schema pinned between the chained joins (and on the label
        # sides): empty join-1 partitions emit schema-less blocks that
        # break join 2 — same hazard as the similarity-kernel size joins
        half = with_schema(
            edges.join(with_schema(la, pa.schema([("id_a", id_type),
                                                  ("label_a", id_type)])),
                       join_type="inner", num_partitions=num_partitions,
                       on=("id_a",)),
            pa.schema([("id_a", id_type), ("id_b", id_type),
                       ("label_a", id_type)]))
        with_labels = half.join(
            with_schema(lb, pa.schema([("id_b", id_type),
                                       ("label_b", id_type)])),
            join_type="inner", num_partitions=num_partitions,
            on=("id_b",))

        def msgs(b: pa.Table) -> pa.Table:
            return pa.table({
                "id": pa.concat_arrays([
                    b.column("id_a").combine_chunks(),
                    b.column("id_b").combine_chunks()]),
                "label": pa.concat_arrays([
                    b.column("label_b").combine_chunks(),
                    b.column("label_a").combine_chunks()]),
            })

        labels = with_schema(
            labels.union(
                with_labels.map_batches(msgs, batch_format="pyarrow"))
            .groupby("id").aggregate(Min("label", alias_name="label")),
            label_schema)
        s = labels.sum("label")
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        # silent wrong answers are worse than a loud failure: an
        # unconverged run splits components (each caller decides whether
        # to retry with a higher max_iters)
        raise RuntimeError(
            f"components_label_propagation: not converged after "
            f"{max_iters + 1} propagation rounds (component diameter "
            f"exceeds max_iters={max_iters})")
    return labels.map_batches(
        lambda b: pa.table({"id": b.column("id"), "rep": b.column("label")}),
        batch_format="pyarrow")


def representatives_from_pairs(pairs: list[tuple], all_ids: list) -> dict:
    """Union-find over verified duplicate pairs → {id: representative}
    (representative = min id of the component).  Driver-side: the pair
    set is orders of magnitude smaller than the corpus; for corpora
    where even pairs don't fit, use the distributed
    :func:`components_label_propagation` (same min-id representatives,
    tested equivalent)."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if str(ra) <= str(rb) else (rb, ra)
            parent[hi] = lo
    return {i: find(i) for i in all_ids}


# ---------------------------------------------------------------------------
# SimHash (Charikar '02, public) — 64-bit fingerprints, hamming blocking
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """Scalar reference (and rare-row fallback of :func:`simhash_batch`)."""
    toks = text.split()
    if not toks:
        return 0
    hashes = np.fromiter((_crc64(t) for t in toks), dtype=np.uint64,
                         count=len(toks))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
    # int64 vote: the uint64 bit matrix would WRAP negative votes to
    # huge positives, silently setting every non-tied bit (the round-3
    # fingerprints were near-all-ones; caught by the round-4
    # vectorization's parity test)
    votes = bits.sum(axis=0).astype(np.int64) * 2 - len(toks)
    return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_batch(col) -> np.ndarray:
    """Vectorized :func:`simhash64` over a string column — identical
    fingerprints (pytest-pinned), ~one Python call per DISTINCT token
    per batch instead of one per token occurrence:

    1. one Arrow ``utf8_split_whitespace`` (str.split() parity after
       dropping the boundary empties it emits for leading/trailing
       whitespace),
    2. blake2b only on the ``dictionary_encode`` vocabulary (the
       per-batch vocab is small vs the token stream),
    3. per-doc bit votes: small vocab (≤4096) goes through per-doc
       token-count rows × the vocab's unpacked bit planes — one BLAS
       matmul per doc-chunk (exact: counts < 2⁵² in float64); large
       vocab falls back to an int32 gather + ``np.add.reduceat`` at
       doc boundaries (cost ∝ tokens, where the count matrix would be
       docs × vocab),
    4. fingerprints re-packed with ``np.packbits(bitorder='little')``
       (bit j = (h >> j) & 1, matching the scalar's shift order)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    n = len(col)
    if n == 0:
        return np.empty(0, np.uint64)
    toks = pc.utf8_split_whitespace(col)
    doc_lens = pc.list_value_length(toks).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    d = np.repeat(np.arange(n, dtype=np.int64), doc_lens)[ne]
    flat = flat.filter(pa.array(ne))
    lens = np.bincount(d, minlength=n).astype(np.int64)
    fp = np.zeros(n, np.uint64)
    if len(flat):
        enc = flat.dictionary_encode()
        vocab = enc.dictionary.to_pylist()
        vh = np.fromiter((_crc64(t) for t in vocab), np.uint64,
                         count=len(vocab))
        # (vocab, 64) bit planes, little-endian: vb[v, j] = (h >> j) & 1
        vb = np.unpackbits(vh[:, None].view(np.uint8), axis=1,
                           bitorder="little")
        codes = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        offs = np.concatenate([[0], np.cumsum(lens)])
        V = len(vocab)
        if V <= 4096:
            # counts @ bit-planes, chunked so each bincount stays
            # ≤ 8M entries; float64 matmul is exact for these counts
            sums = np.empty((n, 64), np.int64)
            vbf = vb.astype(np.float64)
            chunk = max(1, 8_000_000 // V)
            for lo in range(0, n, chunk):
                hi = min(lo + chunk, n)
                tl, th = offs[lo], offs[hi]
                cnt = np.bincount((d[tl:th] - lo) * V + codes[tl:th],
                                  minlength=(hi - lo) * V) \
                    .reshape(hi - lo, V)
                sums[lo:hi] = (cnt @ vbf).astype(np.int64)
        else:
            bits = vb[codes].astype(np.int32)       # (tokens, 64)
            nz = lens > 0
            sums = np.zeros((n, 64), np.int64)
            if nz.any():
                # reduceat only at non-empty docs' offsets (strictly
                # increasing, so every segment is well-formed); empty
                # docs keep their zero rows
                sums[nz] = np.add.reduceat(bits, offs[:-1][nz], axis=0)
        votes = 2 * sums - lens[:, None]
        fp = np.packbits(np.ascontiguousarray((votes > 0).astype(np.uint8)),
                         axis=1, bitorder="little").view(np.uint64).ravel()
    # parity fallback for rows carrying \x1c–\x1f (whitespace to
    # str.split(), not to Unicode)
    odd = pc.match_substring_regex(col, "[\\x1c-\\x1f]") \
        .to_numpy(zero_copy_only=False)
    if odd.any():
        texts = col.to_pylist()
        for i in np.flatnonzero(odd):
            fp[i] = simhash64(texts[i] or "")
    return fp


def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    return batch.append_column(
        "simhash", pa.array(simhash_batch(batch.column(text_col)),
                            pa.uint64()))


def simhash_candidates(ds: Dataset, id_col: str, text_col: str = "text",
                       max_hamming: int = 3) -> Dataset:
    """SimHash near-dup: 4×16-bit band blocking (two fingerprints within
    hamming ≤ 3 of each other must agree exactly on ≥1 of 4 bands),
    verify hamming inside buckets."""
    hashed = ds.map_batches(lambda b: add_simhash(b, text_col),
                            batch_format="pyarrow") \
               .select_columns(["simhash", id_col])

    def band_rows(b: pa.Table) -> pa.Table:
        sh = b.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = b.column(id_col)
        parts = []
        for band in range(4):
            key = ((sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(pa.table({
                "band_id": pa.array(np.full(len(sh), band, dtype=np.int32)),
                "band_key": pa.array(key, pa.int64()),
                id_col: ids,
                "simhash": b.column("simhash"),
            }))
        return pa.concat_tables(parts)

    bands = hashed.map_batches(band_rows, batch_format="pyarrow")

    def pairs(group: pa.Table) -> pa.Table:
        rows = sorted(zip(group.column(id_col).to_pylist(),
                          group.column("simhash").to_pylist()))
        a_o, b_o, d_o = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, min(len(rows), i + 65)):
                d = int(rows[i][1] ^ rows[j][1]).bit_count()
                if d <= max_hamming:
                    a_o.append(rows[i][0])
                    b_o.append(rows[j][0])
                    d_o.append(d)
        t = group.schema.field(id_col).type
        return pa.table({"id_a": pa.array(a_o, t), "id_b": pa.array(b_o, t),
                         "hamming": pa.array(d_o, pa.int32())})

    cand = bands.groupby(["band_id", "band_key"]).map_groups(
        pairs, batch_format="pyarrow")
    return cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def _block_vec_ids(tab: pa.Table, vec_col: str, id_col: str):
    """(ids int64, L2-normalized float64 matrix) from an Arrow block."""
    vecs = vec_matrix(tab.column(vec_col))
    if vecs.ndim == 1:                       # empty block
        vecs = vecs.reshape(0, 0)
    norms = np.linalg.norm(vecs, axis=1, keepdims=True) if vecs.size else None
    if norms is not None:
        norms[norms == 0] = 1.0
        vecs = vecs / norms
    ids = tab.column(id_col).to_numpy(zero_copy_only=False) \
        .astype(np.int64, copy=False)
    return ids, vecs


@ray.remote
def _block_pair_sims(tab_a: pa.Table, tab_b: pa.Table, threshold: float,
                     vec_col: str, id_col: str, same_block: bool) -> pa.Table:
    """One tile of the exact all-pairs cosine grid: pairs between block A
    and block B with sim ≥ threshold, emitted canonically (id_a < id_b).
    A diagonal tile sees each unordered pair twice (keep a < b dedupes);
    an off-diagonal tile sees it once (reorder, never drop)."""
    ids_a, va = _block_vec_ids(tab_a, vec_col, id_col)
    ids_b, vb = _block_vec_ids(tab_b, vec_col, id_col)
    if va.size == 0 or vb.size == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    sims = va @ vb.T
    ai, bj = np.nonzero(sims >= threshold)
    a, b = ids_a[ai], ids_b[bj]
    if same_block:
        keep = a < b                          # dedupe + drop self
        a, b, s = a[keep], b[keep], sims[ai, bj][keep]
    else:
        s = sims[ai, bj]
        lo = np.minimum(a, b)
        b = np.maximum(a, b)
        a = lo
    return pa.table({
        "id_a": pa.array(a, pa.int64()),
        "id_b": pa.array(b, pa.int64()),
        "cosine": pa.array(s, pa.float64()),
    })


def embedding_neardup_pairs(ds: Dataset, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.9,
                            target_blocks: int | None = None) -> Dataset:
    """Exact all-pairs cosine near-dup (sim ≥ threshold) as a distributed
    block-pair task grid: the corpus is repartitioned into B blocks held
    in the OBJECT STORE (never the driver), and each of the B·(B+1)/2
    block tiles is one Ray task doing a single numpy matmul.  Exact
    all-pairs is inherently O(N²) compute — the grid distributes it
    without any full-corpus broadcast or driver materialization; at
    100 TB the LSH variant below is the right tool, this is the exact
    oracle-matching path.  Raw ``@ray.remote`` is justified here (SURVEY
    'custom operators' path (c)): the Dataset API cannot express a
    self-cross-product without materializing one side per task."""
    if target_blocks is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        target_blocks = max(2, min(16, cpus))
    prepped = ds.select_columns([id_col, vec_col]).repartition(target_blocks)
    refs = prepped.to_arrow_refs()
    out = [_block_pair_sims.remote(refs[i], refs[j], threshold,
                                   vec_col, id_col, i == j)
           for i in range(len(refs)) for j in range(i, len(refs))]
    return rd.from_arrow_refs(out)


def embedding_neardup_lsh(ds: Dataset, id_col: str = "vec_id",
                          vec_col: str = "embedding", threshold: float = 0.9,
                          n_planes: int = 12, seed: int = 42) -> Dataset:
    """Scale path: random-hyperplane LSH buckets (sign sketch), exact
    cosine verify within buckets.  Recall < 1 by construction (pairs
    split across all buckets are missed) — the standard trade; run
    multiple plane sets and union for higher recall."""
    def bucketize_factory():
        planes_holder: dict = {}

        def bucketize(b: pa.Table) -> pa.Table:
            vecs = vec_matrix(b.column(vec_col))
            if "planes" not in planes_holder:  # derived from the fixed seed
                planes_holder["planes"] = np.random.RandomState(seed).standard_normal(
                    (vecs.shape[1], n_planes))
            signs = (vecs @ planes_holder["planes"]) > 0
            bucket = (signs.astype(np.int64)
                      * (1 << np.arange(n_planes, dtype=np.int64))).sum(axis=1)
            return pa.table({
                "bucket": pa.array(bucket, pa.int64()),
                id_col: b.column(id_col),
                vec_col: b.column(vec_col),
            })
        return bucketize

    bucketed = ds.select_columns([id_col, vec_col]).map_batches(
        bucketize_factory(), batch_format="pyarrow")

    def pairs(group: pa.Table) -> pa.Table:
        vecs = vec_matrix(group.column(vec_col))
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        vecs = vecs / norms
        ids = group.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        sims = vecs @ vecs.T
        ii, jj = np.nonzero(sims >= threshold)
        keep = ids[ii] < ids[jj]
        return pa.table({
            "id_a": pa.array(ids[ii][keep], pa.int64()),
            "id_b": pa.array(ids[jj][keep], pa.int64()),
            "cosine": pa.array(sims[ii, jj][keep], pa.float64()),
        })

    return bucketed.groupby("bucket").map_groups(pairs, batch_format="pyarrow")


def minhash_join(ds_a: Dataset, ds_b: Dataset, id_col_a: str, id_col_b: str,
                 text_col: str = "text", threshold: float = 0.7,
                 k: int = 64, bands: int = 16, w: int = 3,
                 num_partitions: int | None = None) -> Dataset:
    """Approximate CROSS-TABLE similarity join (LSH bucketing on both
    sides) — the decontamination shape: find rows of ``ds_a`` whose text
    is near-duplicate (exact n-gram Jaccard ≥ ``threshold`` after LSH
    candidate generation) of ANY row of ``ds_b`` (e.g. a benchmark /
    eval set).  Returns ``(id_a, id_b, jaccard)``.

    Scale shape: both sides band with the SAME minhash coefficients
    (seeded in the MinHasher), candidates come from one hash-partitioned
    ``Dataset.join`` on (band_id, band_hash) — co-located buckets, no
    broadcast, no driver state; text re-attaches to the candidate pairs
    by two more hash joins and the exact Jaccard verifies per batch.
    Recall < 1 by LSH construction (a pair sharing no band never
    surfaces); exact duplicates share every band and always surface.
    ``ds_b`` is typically small (a benchmark set), so its band rows are
    a thin join side; a degenerate common bucket fans out |A∩bucket| ×
    |B∩bucket| candidate rows — bound ``ds_b`` or raise bands/k if that
    bites."""
    from ray.data.aggregate import Count

    if num_partitions is None:
        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(2, min(16, cpus // 2))

    def bandify(ds: Dataset, id_col: str, out_id: str) -> Dataset:
        sigged = ds.map_batches(
            MinHasher,
            fn_constructor_kwargs={"text_col": text_col, "k": k, "w": w},
            batch_format="pyarrow", concurrency=(1, default_pool_size()))
        return sigged.select_columns(["minhash_sig", id_col]).map_batches(
            lambda b: lsh_band_rows(b, id_col, bands).rename_columns(
                ["band_id", "band_hash", out_id]),
            batch_format="pyarrow")

    # pair side materialized for the same pool-starvation reason as
    # _verify_pairs_join: candidate ids are tiny, and chaining the two
    # MinHasher pools into the verify joins' aggregators in one DAG can
    # reserve every CPU on small clusters
    cands = bandify(ds_a, id_col_a, "id_a") \
        .join(bandify(ds_b, id_col_b, "id_b"), join_type="inner",
              num_partitions=num_partitions, on=("band_id", "band_hash")) \
        .map_batches(lambda b: b.select(["id_a", "id_b"]),
                     batch_format="pyarrow") \
        .groupby(["id_a", "id_b"]).aggregate(Count("id_a", alias_name="_n")) \
        .map_batches(lambda b: b.drop_columns(["_n"]),
                     batch_format="pyarrow").materialize()

    a_side = ds_a.select_columns([id_col_a, text_col]).map_batches(
        lambda b: b.rename_columns(["id_a", "text_a"]), batch_format="pyarrow")
    b_side = ds_b.select_columns([id_col_b, text_col]).map_batches(
        lambda b: b.rename_columns(["id_b", "text_b"]), batch_format="pyarrow")
    with_ab = cands.join(a_side, join_type="inner",
                         num_partitions=num_partitions, on=("id_a",)) \
        .join(b_side, join_type="inner",
              num_partitions=num_partitions, on=("id_b",))

    def score(b: pa.Table) -> pa.Table:
        sims = [jaccard(word_shingles(x or "", w), word_shingles(y or "", w))
                for x, y in zip(b.column("text_a").to_pylist(),
                                b.column("text_b").to_pylist())]
        out = b.drop_columns(["text_a", "text_b"]).append_column(
            "jaccard", pa.array(sims, pa.float64()))
        return out.filter(pc.greater_equal(out.column("jaccard"), threshold))

    return with_ab.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# streaming NEAR-dup index (MinHash-LSH bands over the shared mutable
# exact-dedup shards — the continuous-ingestion analogue of
# minhash_candidates, reference app.py's incremental upload path)
# ---------------------------------------------------------------------------

class StreamingNearDeduper:
    """Callable map_batches stage for ONE-PASS incremental near-dup
    detection: each row's MinHash signature is banded (LSH) and the
    band digests are check-and-add'ed against the SAME hash-sharded
    :class:`DedupIndexShard` actors the exact path uses (band keys
    and row keys are both opaque digests, so the shard machinery —
    atomic first-wins, caller-token idempotency, snapshot/restore —
    is reused wholesale).  A row whose ANY band bucket was already
    occupied by a PRIOR row (earlier batch against the same index, or
    earlier row of this batch — first-wins within a shard call) is
    flagged ``neardup_hit`` = True: it is a near-dup CANDIDATE of the
    prior ingestion at the banding threshold (k=64, bands=16 ≈ 0.5
    jaccard knee).  Flags are candidate-level by design — the
    streaming path cannot re-read prior text to verify; batch
    pipelines wanting exact jaccard confirmation use
    :func:`minhash_dedup_pairs`."""

    def __init__(self, shards: list, text_col: str = "text",
                 k: int = 64, bands: int = 16, w: int = 3,
                 seed: int = 42):
        import os

        if k % bands:
            raise ValueError("bands must divide k")
        self.mh = MinHasher(text_col, k, w, seed)
        self.shards = shards
        self.bands = bands
        self.text_col = text_col
        self.run_token = os.urandom(8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column(
                "neardup_hit", pa.array([], pa.bool_()))
        sigs = self.mh.signatures_batch(batch.column(self.text_col))
        r = self.mh.k // self.bands
        digests: list[bytes] = []
        for i in range(n):
            row = sigs[i]
            for j in range(self.bands):
                digests.append(hashlib.sha1(
                    j.to_bytes(4, "big")
                    + row[j * r:(j + 1) * r].tobytes()).digest())
        n_shards = len(self.shards)
        by_shard: dict[int, list[int]] = {}
        for idx, d in enumerate(digests):
            by_shard.setdefault(d[0] % n_shards, []).append(idx)
        token = hashlib.sha1(self.run_token
                             + b"".join(digests)).digest()
        is_new = [True] * len(digests)
        futures = {
            s: self.shards[s].check_and_add.remote(
                token, [digests[i] for i in idxs])
            for s, idxs in by_shard.items()
        }
        for s, idxs in by_shard.items():
            for i, new in zip(idxs, ray.get(futures[s])):
                is_new[i] = new
        hit = [any(not is_new[i * self.bands + j]
                   for j in range(self.bands)) for i in range(n)]
        return batch.append_column("neardup_hit",
                                   pa.array(hit, pa.bool_()))


def neardup_streaming(ds: Dataset, text_col: str = "text",
                      index: list | None = None,
                      num_shards: int = 8, k: int = 64,
                      bands: int = 16, w: int = 3,
                      seed: int = 42) -> Dataset:
    """One-pass incremental near-dup FLAGGING against a shared mutable
    LSH band index (see :class:`StreamingNearDeduper`).  Returns the
    input with a ``neardup_hit`` column, MATERIALIZED (the stage
    mutates the index — the dedup_exact_streaming rule)."""
    if index is None:
        index = make_dedup_index(num_shards)
    return ds.map_batches(
        StreamingNearDeduper(index, text_col, k, bands, w, seed),
        batch_format="pyarrow").materialize()

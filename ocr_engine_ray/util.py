"""Small shared helpers for stage sizing and SQL-exact arithmetic."""

from __future__ import annotations

import ray


def round_sql(arr, ndigits: int):
    """Round a float64 Arrow array/ChunkedArray bit-identically to DuckDB's
    ``ROUND(x, n)``, which computes ``std::round(x * 10^n) / 10^n`` (round
    half away from zero, then a true division).  numpy's ``np.round`` /
    pyarrow's ``pc.round`` instead multiply by ``10^-n`` at the end, which
    differs in the last ulp for large sums (e.g. 527868276.59000003 vs
    527868276.59) — enough to break the driver's value-hash comparison
    against the DuckDB oracle.  std::round is emulated exactly via
    floor-of-abs (the fractional part of ``|s| - floor(|s|)`` is exact in
    IEEE754 for |s| < 2^52, so the >= 0.5 comparison is exact too)."""
    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    v = arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    p = np.float64(10.0) ** ndigits
    s = v * p
    a = np.abs(s)
    fa = np.floor(a)
    r = np.where(a - fa >= 0.5, fa + 1.0, fa)
    # preserve the validity mask: to_numpy materializes nulls as NaN,
    # but DuckDB ROUND keeps NULL as NULL — emitting NaN would break
    # the hash parity this helper exists for
    mask = arr.is_null().to_numpy(zero_copy_only=False) \
        if arr.null_count else None
    return pa.array(np.copysign(r, s) / p, pa.float64(), mask=mask)


def tree_combine(partials, keys: list[str], spec: list[tuple],
                 partial_names: list[str], final_names: list[str],
                 width: int = 8):
    """Small-cardinality grouped combine: two Arrow ``group_by`` map
    passes (``width`` blocks → one) instead of Ray's sort-shuffle
    Aggregate, whose ~0.5 s/block fixed cost dominates tiny partial
    tables (stats-profiled).  ONLY for keys whose cardinality is
    structurally bounded (event types, calendar days, TPC-H Q1's 6 flag
    pairs, per-conversation rollups at known-small conversation counts)
    so one row per distinct key always fits one task — unbounded keys
    stay on the shuffle path."""
    import pyarrow as pa

    def comb(names):
        def fn(b: pa.Table) -> pa.Table:
            return b.group_by(keys).aggregate(spec).rename_columns(names)
        return fn

    # batch_size=None pinned explicitly: correctness requires each combine
    # to see its repartitioned block WHOLE (a fixed default batch size
    # splitting the final single block would emit duplicate unsummed key
    # rows with no error).  Ray 2.49 already defaults to whole-block
    # batches; this pins the assumption rather than inheriting it.
    return partials.repartition(width) \
        .map_batches(comb(partial_names), batch_format="pyarrow",
                     batch_size=None) \
        .repartition(1) \
        .map_batches(comb(final_names), batch_format="pyarrow",
                     batch_size=None)


def topk_combine(ds, local, final=None):
    """Global "ORDER BY … LIMIT k" WITHOUT a global sort: ``local``
    prunes each block to its top-k rows, then one tiny single-block
    pass (``final`` or ``local`` again) orders the survivors — only k
    rows per input block ever move.  This helper exists to pin the two
    correctness-critical details in ONE place: the final stage must see
    its repartitioned block WHOLE (``batch_size=None`` — a fixed batch
    size would emit per-batch top-ks as if global), and ``local`` must
    keep every row tied with its k-th so boundary ties resolve exactly
    like the oracle's ORDER BY."""
    fin = final if final is not None else local
    return ds.map_batches(local, batch_format="pyarrow") \
        .repartition(1) \
        .map_batches(fin, batch_format="pyarrow", batch_size=None)


def sorted_topk(sort_keys, k: int):
    """A ``local`` callable for :func:`topk_combine`: Arrow sort_by the
    given keys and keep the first k rows (C-level, stable for the
    deterministic tie-break the keys themselves encode)."""
    def local(b):
        return b.sort_by(sort_keys).slice(0, k)
    return local


def scaled_int_sql(arr, scale: float):
    """``CAST(round(x * scale) AS BIGINT)`` with DuckDB ROUND semantics
    (half away from zero) — the exact-integer quantization every
    cent-valued / fixed-point oracle twin rides on.  Accepts a float64
    Arrow array/ChunkedArray or numpy array; returns an int64 ndarray."""
    import numpy as np
    import pyarrow as pa

    if isinstance(arr, (pa.ChunkedArray, pa.Array)):
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        # refuse NULLs rather than silently minting INT64_MIN: DuckDB's
        # round(NULL) is NULL and SUM drops it — an int64 result cannot
        # carry that, so the caller must filter/fill first (round_sql
        # keeps the mask because its float output can)
        if arr.null_count:
            raise ValueError(
                "scaled_int_sql: input has NULLs; filter or fill them "
                "first (int64 output cannot represent NULL)")
        arr = arr.to_numpy(zero_copy_only=False)
    s = arr.astype(np.float64, copy=False) * np.float64(scale)
    if np.isnan(s).any():
        raise ValueError("scaled_int_sql: input has NaNs")
    a = np.abs(s)
    fa = np.floor(a)
    r = np.where(a - fa >= 0.5, fa + 1.0, fa)
    return np.copysign(r, s).astype(np.int64)


def vec_matrix(col) -> "np.ndarray":
    """Embedding column (``list<float>`` / ``fixed_size_list``) → (n, d)
    float64 matrix WITHOUT the per-row ``to_pylist()`` Python layer:
    uniform-width lists reshape the flat Arrow values buffer directly
    (one zero-copy view + one C-level float32→float64 cast — identical
    values to the pylist path, which also widens through float64).
    Ragged or null-bearing columns fall back to the pylist path, which
    raises the same numpy error a ragged matrix always raised."""
    import numpy as np
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, np.float64)   # caller-visible shape of the
                                         # old np.array([]) empty path
    t = col.type
    if pa.types.is_fixed_size_list(t) and col.null_count == 0:
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(n, t.list_size).astype(np.float64, copy=False)
    if (pa.types.is_list(t) or pa.types.is_large_list(t)) \
            and col.null_count == 0:
        offs = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if len(widths) and (widths == widths[0]).all():
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(n, int(widths[0])) \
                .astype(np.float64, copy=False)
    return np.array(col.to_pylist(), dtype=np.float64)


def round_sql_f(x: float, ndigits: int) -> float:
    """Scalar twin of :func:`round_sql` (DuckDB ROUND semantics).  Python's
    built-in ``round`` is correctly-rounded-to-decimal, which can differ
    from DuckDB's scale/std::round/divide by one ulp."""
    import math

    p = float(10.0 ** ndigits)
    s = x * p
    a = abs(s)
    fa = math.floor(a)
    r = fa + 1.0 if a - fa >= 0.5 else fa
    return math.copysign(r, s) / p


def default_pool_size(cap: int | None = None) -> int:
    """Actor-pool width that always leaves CPU headroom for the read /
    consume stages: 3/4 of the cluster CPUs, never the full width.  A
    pool that reserves every CPU stalls Ray Data's streaming executor
    (measured: a 2-CPU session with a 2-actor pool makes no progress)."""
    from .config import pool_fraction_num

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    num, den = pool_fraction_num()
    size = max(1, min(cpus - 2, (cpus * num) // max(1, den)))
    if cap is not None:
        size = max(1, min(size, cap))
    return size


def with_schema(ds, schema: "pa.Schema"):
    """Pin a Dataset's block schema ahead of a ``Dataset.join``.

    Ray 2.49's hash aggregate emits zero-row blocks with an EMPTY
    schema for partitions that received no rows; ``Dataset.join``'s
    finalize then fails with "No match ... for key field" when such a
    block reaches the pyarrow join.  ``map_batches`` cannot repair
    them — Ray never invokes the UDF on an empty block, it forwards
    the block untouched — so this drops empty blocks at the ref level
    (``iter_internal_ref_bundles`` moves object REFS, never rows, to
    the driver; the upstream aggregate is already an all-to-all
    barrier, so no streaming is lost) and re-assembles the dataset
    from the survivors.  An all-empty input becomes one typed empty
    block so downstream joins still see the keys."""
    import pyarrow as pa
    import ray.data as rd

    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        return rd.from_arrow(schema.empty_table())
    out = rd.from_arrow_refs(refs)

    def cast(b: pa.Table, s=schema) -> pa.Table:
        return b if b.schema == s else b.select(s.names).cast(s)
    return out.map_batches(cast, batch_format="pyarrow")

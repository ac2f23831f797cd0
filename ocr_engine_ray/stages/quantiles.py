"""Distributed quantiles.

Two tools:

- :func:`exact_quantiles` — EXACT discrete quantiles via a distributed
  value-count histogram: per-batch ``group_by(value).count`` partials, a
  ``groupby(value)`` sum over (value, count) rows — the shuffle moves one
  row per distinct value per batch, never data rows — then a tiny
  driver-side cumulative pick.  The right tool whenever the value domain
  is bounded (codes, prices in cents, ratings, token counts): at 100 TB
  with a 1e6-distinct-value column the shuffle is still only ~1e6 rows.
  Matches DuckDB ``quantile_disc`` bit-exactly: the picked element is
  ``sorted_values[ceil(n * q) - 1]`` (verified empirically against
  DuckDB 1.x on distinct-value domains — the floor((n-1)*q) convention
  agrees only when duplicates mask the off-by-one at the upper tail).

- :class:`TDigest` — a mergeable sketch for unbounded/continuous domains
  (Dunning & Ertl, "Computing extremely accurate quantiles using
  t-digests", public): per-batch digests merge associatively, so the
  reduction is a ``map_batches`` partial + tiny driver merge, same shape
  as the HLL sketch in ``sketches.py``.  Approximate by construction —
  no SQL oracle, error is bounded by tests instead.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum


def exact_quantiles(ds: Dataset, cols: list[str],
                    qs: tuple[float, ...] = (0.25, 0.5, 0.75)) -> pa.Table:
    """Exact ``quantile_disc`` for each column in ``cols`` (one output
    row per column: col, q25, q50, ... named by percent).  Requires a
    bounded distinct-value domain per column (see module docstring)."""

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        parts = []
        for c in cols:
            # NULLs are excluded, matching quantile_disc (and the None
            # group would break the driver-side sort)
            col = b.select([c]).filter(pc.is_valid(b.column(c)))
            g = col.group_by(c).aggregate([(c, "count")])
            parts.append(pa.table({
                "col": pa.array([c] * g.num_rows, pa.string()),
                "value": g.column(c).cast(pa.float64()),
                "p_n": g.column(f"{c}_count").cast(pa.int64()),
            }))
        return pa.concat_tables(parts)

    counts = ds.map_batches(partial, batch_format="pyarrow") \
               .groupby(["col", "value"]).aggregate(Sum("p_n", alias_name="n"))
    hist: dict[str, list[tuple[float, int]]] = {c: [] for c in cols}
    for b in counts.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for c, v, n in zip(b.column("col").to_pylist(),
                           b.column("value").to_pylist(),
                           b.column("n").to_pylist()):
            hist[c].append((v, n))

    out: dict[str, list] = {"col": []}
    # int(round(...)): int(0.29*100) truncates to 28 under float repr
    q_names = [f"q{int(round(q * 100))}" for q in qs]
    for name in q_names:
        out[name] = []
    for c in cols:
        pairs = sorted(hist[c])
        total = sum(n for _, n in pairs)
        out["col"].append(c)
        for q, name in zip(qs, q_names):
            # DuckDB quantile_disc: element at ceil(n*q)-1 of the
            # sorted multiset (same float multiply, so same index)
            idx = math.ceil(total * q) - 1
            cum = 0
            picked = pairs[-1][0] if pairs else None
            for v, n in pairs:
                cum += n
                if cum > idx:
                    picked = v
                    break
            out[name].append(picked)
    return pa.table({"col": pa.array(out["col"], pa.string()),
                     **{name: pa.array(out[name], pa.float64())
                        for name in q_names}})


def _keyed_histogram(ds: Dataset, key: str, col: str) -> Dataset:
    """Shared (key, value, count) histogram exchange for the grouped
    quantile family: one row per distinct (key, value) per batch.
    Rows whose value is NULL ride along with p_n = 0 — zero quantile
    weight, but they keep an all-NULL group PRESENT so the pick stage
    can emit the NULL-quantile row DuckDB's GROUP BY emits (dropping
    the key entirely would be a row-count mismatch against any oracle
    on a nullable column)."""

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([key, col])
        # count(col) per (key, col) group: the NULL-value group counts 0
        g = t.group_by([key, col]).aggregate([(col, "count")])
        return g.rename_columns([key, "value", "p_n"])

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby([key, "value"]).aggregate(Sum("p_n", alias_name="n"))


def _split_valid(g: pa.Table):
    """(sorted valid-value rows, cum counts, total) for a pick stage;
    total == 0 means the group's values are all NULL."""
    import pyarrow.compute as pc

    v = g.filter(pc.and_kleene(pc.is_valid(g.column("value")),
                               pc.greater(g.column("n"), 0)))
    v = v.sort_by([("value", "ascending")])
    n = v.column("n").to_numpy(zero_copy_only=False)
    cum = np.cumsum(n) if len(n) else np.zeros(0, np.int64)
    total = int(cum[-1]) if len(cum) else 0
    return v, cum, total


def grouped_exact_quantiles(ds: Dataset, key: str, col: str,
                            qs: tuple[float, ...] = (0.25, 0.5, 0.75)
                            ) -> Dataset:
    """Per-group exact ``quantile_disc`` (one output row per key) via
    the same (value, count) histogram exchange as
    :func:`exact_quantiles`, but keyed (:func:`_keyed_histogram`); the
    quantile pick runs VECTORIZED inside each key's group
    (sort_by + cumsum + searchsorted — no per-key Python beyond the
    map_groups dispatch).  Same bounded-domain requirement per group;
    NULL values excluded like quantile_disc, all-NULL groups emit the
    NULL-quantile row DuckDB does."""
    counts = _keyed_histogram(ds, key, col)
    q_names = [f"q{int(round(q * 100))}" for q in qs]
    qarr = np.array(qs, np.float64)

    def pick(g: pa.Table) -> pa.Table:
        v, cum, total = _split_valid(g)
        out = {key: g.column(key).slice(0, 1)}
        if total == 0:
            for name in q_names:
                out[name] = pa.array([None], pa.float64())
            return pa.table(out)
        # quantile_disc: element at ceil(total*q)-1 of the sorted
        # multiset; the row holding rank r is the first with cum > r
        idx = np.ceil(total * qarr).astype(np.int64) - 1
        rows = np.searchsorted(cum, idx, side="right")
        vals = v.column("value").to_numpy(zero_copy_only=False)[rows]
        for name, val in zip(q_names, vals):
            out[name] = pa.array([float(val)], pa.float64())
        return pa.table(out)

    return counts.groupby(key).map_groups(pick, batch_format="pyarrow")


def grouped_quantiles_cont(ds: Dataset, key: str, col: str,
                           qs: tuple[float, ...] = (0.5, 0.9)) -> Dataset:
    """Per-group INTERPOLATED quantiles (DuckDB ``quantile_cont``
    parity) from the same keyed histogram (:func:`_keyed_histogram`):
    rank h = (n−1)·q, result = lo·(1−frac) + hi·frac — that operand
    order is DuckDB's own (``lo + (hi−lo)·frac`` differs in the last
    ulp and fails the hash gate; verified empirically on DOUBLE
    columns).  Bounded-domain + NULL semantics as
    :func:`grouped_exact_quantiles`."""
    counts = _keyed_histogram(ds, key, col)
    q_names = [f"q{int(round(q * 100))}" for q in qs]
    qarr = np.array(qs, np.float64)

    def pick(g: pa.Table) -> pa.Table:
        v, cum, total = _split_valid(g)
        out = {key: g.column(key).slice(0, 1)}
        if total == 0:
            for name in q_names:
                out[name] = pa.array([None], pa.float64())
            return pa.table(out)
        vals = v.column("value").to_numpy(zero_copy_only=False)
        h = (total - 1) * qarr
        lo_idx = np.floor(h).astype(np.int64)
        frac = h - lo_idx
        hi_idx = np.minimum(lo_idx + 1, total - 1)
        lo = vals[np.searchsorted(cum, lo_idx, side="right")]
        hi = vals[np.searchsorted(cum, hi_idx, side="right")]
        interp = lo * (1.0 - frac) + hi * frac
        for name, val in zip(q_names, interp):
            out[name] = pa.array([float(val)], pa.float64())
        return pa.table(out)

    return counts.groupby(key).map_groups(pick, batch_format="pyarrow")


class TDigest:
    """Minimal mergeable t-digest (scale function k1, Dunning & Ertl).
    Centroids are (mean, weight); compression bounds centroid count to
    ~2·delta.  add()/merge() are associative enough for per-batch
    partials + driver merge (estimates are deterministic for a fixed
    batch order; tests assert error bounds, not exact values)."""

    def __init__(self, delta: int = 100):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    def add(self, values: np.ndarray) -> "TDigest":
        if values.size:
            self.means = np.concatenate([self.means, values.astype(np.float64)])
            self.weights = np.concatenate(
                [self.weights, np.ones(values.size, dtype=np.float64)])
            if self.means.size > 8 * self.delta:
                self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _compress(self) -> None:
        if self.means.size == 0:
            return
        order = np.argsort(self.means, kind="stable")
        means, weights = self.means[order], self.weights[order]
        total = weights.sum()
        out_m, out_w = [], []
        cur_m, cur_w = means[0], weights[0]
        cum = 0.0
        for m, w in zip(means[1:], weights[1:]):
            q = (cum + cur_w / 2) / total
            limit = 4 * total * q * (1 - q) / self.delta
            if cur_w + w <= max(limit, 1.0):
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                cum += cur_w
                cur_m, cur_w = m, w
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def to_table(self) -> pa.Table:
        return pa.table({"mean": pa.array(self.means, pa.float64()),
                         "weight": pa.array(self.weights, pa.float64())})

    @classmethod
    def from_table(cls, t: pa.Table, delta: int = 100) -> "TDigest":
        d = cls(delta)
        d.means = np.asarray(t.column("mean").to_pylist(), dtype=np.float64)
        d.weights = np.asarray(t.column("weight").to_pylist(), dtype=np.float64)
        return d


def approx_quantiles(ds: Dataset, col: str,
                     qs: tuple[float, ...] = (0.25, 0.5, 0.75),
                     delta: int = 100) -> dict[float, float]:
    """t-digest quantiles of ``col``: per-batch digests (map_batches
    partial, ~2·delta rows each) merged driver-side — the same
    partial-then-tiny-reduce shape as HLL approx_distinct."""

    def sketch(b: pa.Table) -> pa.Table:
        vals = b.column(col).to_numpy(zero_copy_only=False)
        d = TDigest(delta).add(vals[~np.isnan(vals)]
                               if vals.dtype.kind == "f" else vals)
        d._compress()
        return d.to_table()

    merged = TDigest(delta)
    for b in ds.map_batches(sketch, batch_format="pyarrow").iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        merged.merge(TDigest.from_table(b, delta))
    return {q: merged.quantile(q) for q in qs}

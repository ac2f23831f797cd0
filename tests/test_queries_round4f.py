"""Planted-corpus semantic tests for the round-4 session-9 batch:
longest daily streaks (gaps-and-islands), max-concurrent sweep line
(half-open boundary), CUME_DIST tie handling, and the lower weighted
median boundary rule.  Bit-exactness vs DuckDB is pinned by the
contract sweep; these pin the SEMANTICS on hand-checkable corpora.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _tab(res) -> pa.Table:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        rows = res.take_all()
        if not rows:
            return res.schema().base_schema.empty_table()
        return pa.Table.from_pylist(rows)
    return res


def _write_events(tmp_path, rows):
    """rows: (event_id, user_id, minutes_after_base, event_type, value)."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base + np.timedelta64(r[2] * 60_000_000, "us")
                        for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    }), str(tmp_path / "events.parquet"))


DAY_MIN = 24 * 60


def test_user_streaks_gaps_and_islands(ray_session, tmp_path):
    """User 1 active days {0,1,2, 4,5} -> longest 3 of 5; user 2 one
    day twice (dedup) -> streak 1 of 1."""
    rows = [
        (1, 1, 0 * DAY_MIN, "a", 1.0),
        (2, 1, 1 * DAY_MIN, "a", 1.0),
        (3, 1, 2 * DAY_MIN + 5, "a", 1.0),
        (4, 1, 4 * DAY_MIN, "a", 1.0),
        (5, 1, 5 * DAY_MIN, "a", 1.0),
        (6, 2, 3 * DAY_MIN, "a", 1.0),
        (7, 2, 3 * DAY_MIN + 60, "a", 1.0),
    ]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_user_streaks

    out = {r["user_id"]: r for r in
           _tab(q_events_user_streaks(str(tmp_path))).to_pylist()}
    assert out[1]["n_active_days"] == 5
    assert out[1]["longest_streak"] == 3
    assert out[2]["n_active_days"] == 1
    assert out[2]["longest_streak"] == 1


def test_max_concurrent_half_open_boundary(ray_session, tmp_path):
    """Three events: two overlapping (peak 2), and a third starting
    exactly when the first's 15-minute hold ends — half-open [s, e)
    means the boundary pair never counts as concurrent."""
    rows = [
        (1, 1, 0, "a", 1.0),     # [0, 15)
        (2, 2, 10, "a", 1.0),    # [10, 25) -> overlap with #1 at 10..15
        (3, 3, 15, "a", 1.0),    # [15, 30) -> NOT concurrent with #1
    ]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_max_concurrent

    out = _tab(q_events_max_concurrent(str(tmp_path))).to_pylist()
    assert len(out) == 1
    assert out[0]["max_concurrent"] == 2
    # earliest attaining instant is event #2's start (minute 10)
    assert out[0]["at_ts"] == 1704067200000000 + 10 * 60_000_000


def test_max_concurrent_single_event(ray_session, tmp_path):
    _write_events(tmp_path, [(1, 1, 0, "a", 1.0)])
    from ocr_engine_ray.pipelines.queries import q_events_max_concurrent

    out = _tab(q_events_max_concurrent(str(tmp_path))).to_pylist()
    assert out[0]["max_concurrent"] == 1
    assert out[0]["at_ts"] == 1704067200000000


def test_cume_dist_ties_inclusive(ray_session, tmp_path):
    """Values [1, 2, 2, 5]: cume_dist of both 2s is 3/4 (<= count,
    ties share the inclusive rank), of 1 is 1/4, of 5 is 1.0."""
    rows = [
        (1, 1, 0, "a", 1.0),
        (2, 1, 1, "a", 2.0),
        (3, 1, 2, "a", 2.0),
        (4, 1, 3, "a", 5.0),
        (5, 1, 4, "b", 7.0),   # second type: single row -> cd 1.0
    ]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_cume_dist

    out = {r["event_id"]: r["cd"] for r in
           _tab(q_events_cume_dist(str(tmp_path))).to_pylist()}
    assert out[1] == 0.25
    assert out[2] == 0.75 and out[3] == 0.75
    assert out[4] == 1.0
    assert out[5] == 1.0


def test_weighted_median_lower_rule(ray_session, tmp_path):
    """Prices 10.00(w=1), 20.00(w=2), 30.00(w=1): total 4, first
    2*cum >= 4 is price 20.00 (cum 3).  Exact-half edge: prices
    10.00(w=1), 20.00(w=1) -> 2*cum(10)=2 == tot=2 -> lower value 10."""
    base = np.datetime64("2024-01-01T00:00:00", "us")

    def write(rows):
        pq.write_table(pa.table({
            "l_orderkey": pa.array(range(1, len(rows) + 1), pa.int64()),
            "l_partkey": pa.array([1] * len(rows), pa.int64()),
            "l_suppkey": pa.array([1] * len(rows), pa.int64()),
            "l_linenumber": pa.array([1] * len(rows), pa.int32()),
            "l_quantity": pa.array([r[2] for r in rows], pa.float64()),
            "l_extendedprice": pa.array([r[1] for r in rows],
                                        pa.float64()),
            "l_discount": pa.array([0.0] * len(rows), pa.float64()),
            "l_tax": pa.array([0.0] * len(rows), pa.float64()),
            "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
            "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
            "l_shipdate": pa.array([base] * len(rows),
                                   pa.timestamp("us")),
        }), str(tmp_path / "lineitem.parquet"))

    write([("A", 10.0, 1.0), ("A", 20.0, 2.0), ("A", 30.0, 1.0),
           ("B", 10.0, 1.0), ("B", 20.0, 1.0)])
    from ocr_engine_ray.pipelines.queries import q_lineitem_weighted_median

    out = {r["l_returnflag"]: r for r in
           _tab(q_lineitem_weighted_median(str(tmp_path))).to_pylist()}
    assert out["A"]["w_median"] == 20.0 and out["A"]["tot_qty"] == 4
    assert out["B"]["w_median"] == 10.0 and out["B"]["tot_qty"] == 2


def test_budget_allocation_waterfall(ray_session, tmp_path):
    """Order 1: cap = 90% of 100.00 = 90.00; tiers 1 (two rows summing
    60.00) and 2 (50.00) -> tier 1 gets 60, tier 2 gets the remaining
    30 of its 50.  Order 2: cap covers everything."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [  # (orderkey, linenumber, extendedprice)
        (1, 1, 40.0), (1, 1, 20.0), (1, 2, 50.0),
        (2, 1, 5.0),
    ]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([1] * len(rows), pa.int64()),
        "l_suppkey": pa.array([1] * len(rows), pa.int64()),
        "l_linenumber": pa.array([r[1] for r in rows], pa.int32()),
        "l_quantity": pa.array([1.0] * len(rows), pa.float64()),
        "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
        "l_discount": pa.array([0.0] * len(rows), pa.float64()),
        "l_tax": pa.array([0.0] * len(rows), pa.float64()),
        "l_returnflag": pa.array(["N"] * len(rows), pa.string()),
        "l_linestatus": pa.array(["O"] * len(rows), pa.string()),
        "l_shipdate": pa.array([base] * len(rows), pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([1, 1], pa.int64()),
        "o_orderstatus": pa.array(["O", "O"], pa.string()),
        "o_totalprice": pa.array([100.0, 100.0], pa.float64()),
        "o_orderdate": pa.array([base, base], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 2, pa.string()),
    }), str(tmp_path / "orders.parquet"))
    from ocr_engine_ray.pipelines.queries import q_orders_budget_allocation

    out = {(r["l_orderkey"], r["l_linenumber"]): r for r in
           _tab(q_orders_budget_allocation(str(tmp_path))).to_pylist()}
    assert out[(1, 1)]["tier_total"] == 60.0
    assert out[(1, 1)]["alloc_amt"] == 60.0
    assert out[(1, 2)]["tier_total"] == 50.0
    assert out[(1, 2)]["alloc_amt"] == 30.0    # 90 - 60 remaining
    assert out[(2, 1)]["alloc_amt"] == 5.0     # fully covered
    assert len(out) == 3                       # tier grain, not rows


def test_levene_matches_numpy_reference(ray_session, tmp_path):
    """Brown-Forsythe on a planted two-spread corpus: engine F equals
    the straight numpy computation on |2c - (lo+hi)| deviations."""
    vals = {"click": [1.0, 2.0, 3.0, 4.0],        # tight
            "error": [0.0, 5.0, 10.0, 15.0],       # wide
            "purchase": [2.0, 2.0, 2.0],
            "signup": [1.0, 3.0],
            "view": [0.0, 1.0, 2.0]}
    rows, eid = [], 0
    for t, vs in vals.items():
        for v in vs:
            rows.append((eid, 1, eid, t, v))
            eid += 1
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_levene_test

    out = _tab(q_events_levene_test(str(tmp_path))).to_pylist()[0]
    # numpy reference with the same exact-integer deviations
    groups = []
    for t in ("click", "error", "purchase", "signup", "view"):
        c = np.sort(np.asarray([round(v * 100) for v in vals[t]],
                               dtype=np.int64))
        n = len(c)
        m2 = int(c[(n + 1) // 2 - 1]) + int(c[(n + 2) // 2 - 1])
        groups.append(np.abs(2 * c - m2).astype(np.float64))
    k = len(groups)
    N = sum(len(g) for g in groups)
    gm = sum(g.sum() for g in groups) / N
    ssb = sum(len(g) * (g.mean() - gm) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f_ref = (ssb / (k - 1)) / (ssw / (N - k))
    assert out["n_events"] == N
    assert out["dof_between"] == k - 1 and out["dof_within"] == N - k
    assert abs(out["f_stat"] - f_ref) < 1e-9 * max(1.0, f_ref)


def test_prefix_dedup_catches_truncation(ray_session, tmp_path):
    """Doc 2 is a truncated copy of doc 1 (same first 64 normalized
    chars); doc 3 differs inside the prefix -> 2 groups."""
    head = ("the quick brown fox jumps over the lazy dog again and again "
            "and once more for good measure")
    assert len(head) > 64
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([head + " plus a very long tail " * 10,
                          head + " short",
                          "completely different text that shares nothing "
                          "with the others at all"], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([1, 1, 1], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    from ocr_engine_ray.pipelines.queries import q_documents_prefix_dedup

    out = {r["doc_id"]: r["n_copies"] for r in
           _tab(q_documents_prefix_dedup(str(tmp_path))).to_pylist()}
    assert out == {1: 2, 3: 1}

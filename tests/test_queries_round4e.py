"""Planted-corpus semantic tests for the round-4 session-8 batch:
per-nation skyline, SCD2 validity intervals, and the CDC MERGE upsert.
Bit-exactness vs DuckDB is pinned by the contract sweep; these pin the
SEMANTICS on hand-checkable corpora — strict Pareto dominance (ties
both survive), the open-ended current interval, and the delete /
update / passthrough rule split.
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


def _write_customers(tmp_path, rows):
    """rows: (c_custkey, c_nationkey, c_acctbal, c_mktsegment)."""
    pq.write_table(pa.table({
        "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_name": pa.array([f"Customer#{r[0]}" for r in rows],
                           pa.string()),
        "c_nationkey": pa.array([r[1] for r in rows], pa.int32()),
        "c_acctbal": pa.array([r[2] for r in rows], pa.float64()),
        "c_mktsegment": pa.array([r[3] for r in rows], pa.string()),
    }), str(tmp_path / "customer.parquet"))


def _write_orders(tmp_path, rows):
    """rows: (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
    day_offset)."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_orderstatus": pa.array([r[2] for r in rows], pa.string()),
        "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
        "o_orderdate": pa.array(
            [base + np.timedelta64(r[4], "D").astype("timedelta64[us]")
             for r in rows], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(rows),
                                    pa.string()),
    }), str(tmp_path / "orders.parquet"))


def test_skyline_planted(ray_session, tmp_path):
    """Nation 0: (2 orders, 30.00) dominates (1, 10.00); (1, 40.00)
    survives on the money axis; an exact duplicate point ties and BOTH
    survive (strict dominance needs > on one axis).  Nation 1's lone
    no-order customer (0, 0) is its whole frontier."""
    _write_customers(tmp_path, [
        (1, 0, 0.0, "A"),   # 2 orders, 3000 cents  -> survives
        (2, 0, 0.0, "A"),   # 1 order,  1000 cents  -> dominated by 1
        (3, 0, 0.0, "A"),   # 1 order,  4000 cents  -> survives
        (4, 0, 0.0, "A"),   # tie of 3 on both axes -> survives too
        (5, 1, 0.0, "B"),   # no orders             -> frontier of {5}
    ])
    _write_orders(tmp_path, [
        (10, 1, "O", 10.00, 0), (11, 1, "O", 20.00, 1),
        (12, 2, "O", 10.00, 0),
        (13, 3, "O", 40.00, 0),
        (14, 4, "O", 40.00, 0),
    ])
    from ocr_engine_ray.pipelines.queries import q_customers_skyline

    out = {r["c_custkey"]: r for r in
           _tab(q_customers_skyline(str(tmp_path))).to_pylist()}
    assert set(out) == {1, 3, 4, 5}
    assert out[1]["n_orders"] == 2 and out[1]["monetary_cents"] == 3000
    assert out[3]["monetary_cents"] == 4000
    assert out[5]["n_orders"] == 0 and out[5]["monetary_cents"] == 0


def _write_events_min(tmp_path, rows):
    """rows: (event_id, minute_offset, user_id, event_type)."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base + np.timedelta64(r[1], "m").astype(
            "timedelta64[us]") for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    }), str(tmp_path / "events.parquet"))


def test_scd2_intervals_planted(ray_session, tmp_path):
    """User 1's stream a a b a collapses to 3 runs; each run's
    valid_to is the NEXT run's valid_from and the final run stays
    open (NULL).  Ties on ts break by event_id."""
    _write_events_min(tmp_path, [
        (0, 0, 1, "a"), (1, 5, 1, "a"), (2, 10, 1, "b"),
        (3, 20, 1, "a"),
        (4, 0, 2, "x"),
    ])
    from ocr_engine_ray.pipelines.queries import q_events_scd2_intervals

    rows = sorted(_tab(q_events_scd2_intervals(str(tmp_path)))
                  .to_pylist(), key=lambda r: (r["user_id"],
                                               r["run_idx"]))
    u1 = [r for r in rows if r["user_id"] == 1]
    assert [r["event_type"] for r in u1] == ["a", "b", "a"]
    assert [r["n_events"] for r in u1] == [2, 1, 1]
    assert u1[0]["valid_to"] == u1[1]["valid_from"]
    assert u1[1]["valid_to"] == u1[2]["valid_from"]
    assert u1[2]["valid_to"] is None
    u2 = [r for r in rows if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["valid_to"] is None


def test_cdc_merge_planted(ray_session, tmp_path):
    """Latest change per customer: status F deletes, other statuses
    set c_acctbal to that order's o_totalprice, no-order customers
    pass through.  Latest = max (o_orderdate, o_orderkey)."""
    _write_customers(tmp_path, [
        (1, 0, 11.0, "A"),  # latest order F      -> deleted
        (2, 0, 22.0, "A"),  # latest order O 99.5 -> acctbal updated
        (3, 1, 33.0, "B"),  # no orders           -> passthrough
        (4, 1, 44.0, "B"),  # same-date tie: higher orderkey wins
    ])
    _write_orders(tmp_path, [
        (10, 1, "O", 5.0, 0), (11, 1, "F", 6.0, 9),
        (12, 2, "F", 7.0, 0), (13, 2, "O", 99.5, 9),
        (14, 4, "F", 1.0, 3), (15, 4, "P", 77.25, 3),
    ])
    from ocr_engine_ray.pipelines.queries import q_customers_cdc_merge

    out = {r["c_custkey"]: r for r in
           _tab(q_customers_cdc_merge(str(tmp_path))).to_pylist()}
    assert set(out) == {2, 3, 4}
    assert out[2]["c_acctbal"] == 99.5
    assert out[3]["c_acctbal"] == 33.0          # untouched passthrough
    assert out[4]["c_acctbal"] == 77.25         # orderkey tiebreak

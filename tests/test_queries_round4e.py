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


def _write_events_sec(tmp_path, rows):
    """rows: (event_id, second_offset, user_id, event_type, value)."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base + np.timedelta64(r[1], "s").astype(
            "timedelta64[us]") for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    }), str(tmp_path / "events.parquet"))


def test_twap_planted(ray_session, tmp_path):
    """1.00 held 10 s then 3.00 held 30 s → twap 250 cents; the last
    value never contributes (no holding interval).  Single-event and
    zero-total-gap users are excluded."""
    _write_events_sec(tmp_path, [
        (0, 0, 1, "x", 1.0), (1, 10, 1, "x", 3.0), (2, 40, 1, "x", 9.9),
        (3, 0, 2, "x", 5.0),                       # single event
        (4, 0, 3, "x", 1.0), (5, 0, 3, "x", 2.0),  # same-second pair
    ])
    from ocr_engine_ray.pipelines.queries import q_events_twap

    out = {r["user_id"]: r for r in
           _tab(q_events_twap(str(tmp_path))).to_pylist()}
    assert set(out) == {1}
    r = out[1]
    assert r["num_cents_s"] == 100 * 10 + 300 * 30
    assert r["den_s"] == 40
    assert r["twap_cents"] == 250.0


def test_survival_km_planted(ray_session, tmp_path):
    """A purchases on day 2 (T=2 event), B is censored at day 1, C
    purchases immediately (T=0).  Risk sets count everyone still
    'alive' at t: 3 at t=0, 1 at t=2; the censor-only day 1 emits no
    row but shrinks the t=2 risk set."""
    _write_events_sec(tmp_path, [
        (0, 0, 1, "view", 1.0), (1, 2 * 86400, 1, "purchase", 1.0),
        (2, 0, 2, "view", 1.0), (3, 86400, 2, "click", 1.0),
        (4, 0, 3, "purchase", 1.0),
    ])
    from ocr_engine_ray.pipelines.queries import q_events_survival_km

    rows = {r["t_days"]: r for r in
            _tab(q_events_survival_km(str(tmp_path))).to_pylist()}
    assert set(rows) == {0, 2}
    assert rows[0]["n_risk"] == 3 and rows[0]["n_event"] == 1
    assert rows[2]["n_risk"] == 1 and rows[2]["n_event"] == 1
    assert rows[0]["n_censored"] == 0 and rows[2]["n_censored"] == 0


def _write_star_min(tmp_path):
    """Minimal star schema with planted orphans in lineitem."""
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0], pa.int64()),
        "r_name": pa.array(["R"], pa.string()),
    }), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_name": pa.array(["N"], pa.string()),
        "n_regionkey": pa.array([0], pa.int64()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_name": pa.array(["c"], pa.string()),
        "c_nationkey": pa.array([0], pa.int32()),
        "c_acctbal": pa.array([1.0], pa.float64()),
        "c_mktsegment": pa.array(["A"], pa.string()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_name": pa.array(["s"], pa.string()),
        "s_nationkey": pa.array([0], pa.int64()),
        "s_acctbal": pa.array([1.0], pa.float64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "p_partkey": pa.array([1], pa.int64()),
        "p_name": pa.array(["p"], pa.string()),
        "p_brand": pa.array(["b"], pa.string()),
        "p_type": pa.array(["t"], pa.string()),
        "p_size": pa.array([1], pa.int64()),
        "p_retailprice": pa.array([1.0], pa.float64()),
    }), str(tmp_path / "part.parquet"))
    base = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
        "o_orderstatus": pa.array(["O"], pa.string()),
        "o_totalprice": pa.array([1.0], pa.float64()),
        "o_orderdate": pa.array([base], pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"], pa.string()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # okey 1 ok; okey 2 twice (1 orphan key); NULL (orphan row,
        # no key)
        "l_orderkey": pa.array([1, 2, 2, None], pa.int64()),
        "l_partkey": pa.array([1, 1, 1, 1], pa.int64()),
        "l_suppkey": pa.array([1, 1, 1, 1], pa.int64()),
        "l_linenumber": pa.array([1, 1, 2, 1], pa.int64()),
        "l_quantity": pa.array([1.0] * 4, pa.float64()),
        "l_extendedprice": pa.array([1.0] * 4, pa.float64()),
        "l_discount": pa.array([0.0] * 4, pa.float64()),
        "l_tax": pa.array([0.0] * 4, pa.float64()),
        "l_returnflag": pa.array(["N"] * 4, pa.string()),
        "l_linestatus": pa.array(["O"] * 4, pa.string()),
        "l_shipdate": pa.array([base] * 4, pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))


def test_ri_audit_planted(ray_session, tmp_path):
    """Orphan accounting: duplicate orphan FK rows collapse to one
    orphan KEY; a NULL FK is an orphan ROW but never a key (SQL
    COUNT DISTINCT semantics); clean relations report zeros."""
    _write_star_min(tmp_path)
    from ocr_engine_ray.pipelines.queries import q_ri_audit

    out = {r["relation"]: r for r in
           _tab(q_ri_audit(str(tmp_path))).to_pylist()}
    assert len(out) == 7
    lo = out["lineitem.l_orderkey->orders"]
    assert lo["n_rows"] == 4
    assert lo["n_orphan_rows"] == 3 and lo["n_orphan_keys"] == 1
    for rel in ("lineitem.l_partkey->part", "orders.o_custkey->customer",
                "nation.n_regionkey->region"):
        assert out[rel]["n_orphan_rows"] == 0
        assert out[rel]["n_orphan_keys"] == 0


def test_table_diff_planted(ray_session, tmp_path):
    """Deleted (latest F), updated (price differs), unchanged
    passthrough (no orders), and the value-equality edge: an applied
    update whose price EQUALS the old balance reads 'unchanged'."""
    _write_customers(tmp_path, [
        (1, 0, 11.0, "A"),   # latest F -> deleted
        (2, 0, 22.0, "A"),   # updated to 99.5
        (3, 1, 33.0, "B"),   # no orders -> unchanged
        (4, 1, 44.0, "B"),   # updated to 44.0 == old -> unchanged
    ])
    _write_orders(tmp_path, [
        (10, 1, "F", 6.0, 9),
        (13, 2, "O", 99.5, 9),
        (15, 4, "P", 44.0, 3),
    ])
    from ocr_engine_ray.pipelines.queries import q_customers_table_diff

    out = {r["c_custkey"]: r for r in
           _tab(q_customers_table_diff(str(tmp_path))).to_pylist()}
    assert out[1]["change_type"] == "deleted"
    assert out[1]["new_acctbal"] is None
    assert out[2]["change_type"] == "updated"
    assert out[2]["old_acctbal"] == 22.0 and out[2]["new_acctbal"] == 99.5
    assert out[3]["change_type"] == "unchanged"
    assert out[4]["change_type"] == "unchanged"
    assert out[4]["new_acctbal"] == 44.0


def test_keywords_planted(ray_session, tmp_path):
    """'cat' appears in every doc (idf_q = 0 → score 0); doc 1's
    'apple apple' outranks it; rank ties on score break by term ASC."""
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["apple apple cat", "banana cat",
                          "cat zebra banana"], pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([15, 10, 16], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    from ocr_engine_ray.pipelines.queries import q_documents_keywords

    rows = _tab(q_documents_keywords(str(tmp_path))).to_pylist()
    d1 = sorted([r for r in rows if r["doc_id"] == 1],
                key=lambda r: r["rk"])
    assert d1[0]["term"] == "apple"
    assert d1[0]["score_q"] == 2 * round(np.log(3.0) * 1e6)
    assert d1[1]["term"] == "cat" and d1[1]["score_q"] == 0
    d3 = sorted([r for r in rows if r["doc_id"] == 3],
                key=lambda r: r["rk"])
    # banana (df=2) and zebra (df=1): zebra scores higher
    assert [r["term"] for r in d3] == ["zebra", "banana", "cat"]


def test_dq_audit_planted(ray_session, tmp_path):
    """A duplicated order key is ONE extra row; out-of-set status,
    negative quantity, and NULL value each count; clean checks
    report zero."""
    _write_star_min(tmp_path)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    # overwrite orders with a dup key + a bad status
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 1, 2], pa.int64()),
        "o_custkey": pa.array([1, 1, 1], pa.int64()),
        "o_orderstatus": pa.array(["O", "F", "X"], pa.string()),
        "o_totalprice": pa.array([1.0, 2.0, 3.0], pa.float64()),
        "o_orderdate": pa.array([base] * 3, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 3, pa.string()),
    }), str(tmp_path / "orders.parquet"))
    _write_events_sec(tmp_path, [(0, 0, 1, "view", 1.0)])
    # null value row appended via a second events write
    pq.write_table(pa.table({
        "event_id": pa.array([0, 1], pa.int64()),
        "ts": pa.array([base, base], pa.timestamp("us")),
        "user_id": pa.array([1, 2], pa.int64()),
        "event_type": pa.array(["view", "view"], pa.string()),
        "value": pa.array([1.0, None], pa.float64()),
        "props": pa.array(["{}", "{}"], pa.string()),
    }), str(tmp_path / "events.parquet"))
    from ocr_engine_ray.pipelines.queries import q_dq_audit

    out = {r["check_name"]: r for r in
           _tab(q_dq_audit(str(tmp_path))).to_pylist()}
    assert out["orders.o_orderkey unique"]["n_violations"] == 1
    assert out["orders.o_orderkey unique"]["n_checked"] == 3
    assert out["orders.o_orderstatus accepted_values"][
        "n_violations"] == 1
    assert out["events.value not_null"]["n_violations"] == 1
    assert out["customer.c_custkey unique"]["n_violations"] == 0
    assert out["lineitem.(l_orderkey,l_linenumber) unique"][
        "n_violations"] == 0
    assert out["lineitem.l_discount range_0_1"]["n_violations"] == 0


def test_funnel_timebound_planted(ray_session, tmp_path):
    """User 1 converts fully in-window; user 2's click lands at
    exactly 1 h + 1 s (out); user 3's purchase precedes the click
    (strictly-after fails); user 4 has no view."""
    H, D = 3600, 86400
    _write_events_sec(tmp_path, [
        (0, 0, 1, "view", 1.0), (1, H // 2, 1, "click", 1.0),
        (2, H // 2 + D, 1, "purchase", 1.0),        # exactly 24h after
        (3, 0, 2, "view", 1.0), (4, H + 1, 2, "click", 1.0),
        (5, 0, 3, "view", 1.0), (6, 10, 3, "purchase", 1.0),
        (7, 20, 3, "click", 1.0),
        (8, 0, 4, "click", 1.0),
    ])
    from ocr_engine_ray.pipelines.queries import (
        q_events_funnel_timebound,
    )

    out = {r["stage"]: r["n_users"] for r in
           _tab(q_events_funnel_timebound(str(tmp_path))).to_pylist()}
    assert out == {"view": 3, "click_1h": 2, "purchase_24h": 1}


def test_top_paths_planted(ray_session, tmp_path):
    """Only the first 3 events form a path; short histories form
    short paths; equal-count paths order by path string."""
    _write_events_sec(tmp_path, [
        (0, 0, 1, "view", 1.0), (1, 1, 1, "click", 1.0),
        (2, 2, 1, "purchase", 1.0), (3, 3, 1, "error", 1.0),
        (4, 0, 2, "view", 1.0), (5, 1, 2, "click", 1.0),
        (6, 2, 2, "purchase", 1.0),
        (7, 0, 3, "view", 1.0),                    # 1-event path
        (8, 0, 4, "click", 1.0), (9, 1, 4, "view", 1.0),
    ])
    from ocr_engine_ray.pipelines.queries import q_events_top_paths

    rows = _tab(q_events_top_paths(str(tmp_path))).to_pylist()
    assert rows[0]["path"] == "view>click>purchase"
    assert rows[0]["n_users"] == 2
    # the three singles tie at 1 and order lexicographically
    assert [r["path"] for r in rows[1:]] == ["click>view", "view"]


def test_daily_anomaly_planted(ray_session, tmp_path):
    """Nine days: six 2s, a 3, a 2, then a spike of 9; the spike's
    z replays the closed-form int expression by hand."""
    rows, eid = [], 0
    counts = [2, 2, 2, 2, 2, 2, 3, 2, 9]
    for day, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, day * 86400, eid, "x", 1.0))
            eid += 1
    _write_events_sec(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_daily_anomaly

    out = {r["day_idx"] - 19723: r for r in
           _tab(q_events_daily_anomaly(str(tmp_path))).to_pylist()}
    # day 7's window is days 0-6 = [2]*6+[3]: sum 15, sumsq 33
    assert 7 in out and out[7]["sum7"] == 15 and out[7]["sumsq7"] == 33
    d8 = out[8]       # window days 1-7: [2]*5+[3,2] -> sum 15 sumsq 33
    assert d8["n"] == 9 and d8["sum7"] == 15
    expected_z = (7 * 9 - 15) / (7 * np.sqrt((7 * 33 - 225) / 42))
    assert d8["z"] == expected_z


def test_zorder_planted(ray_session, tmp_path):
    """Morton interleave puts partkey bits on even positions and
    suppkey bits on odd: (3,1) → 0b111 = 7; keys wrap mod 65536."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_partkey": pa.array([3, 65536 + 3, 0], pa.int64()),
        "l_suppkey": pa.array([1, 1, 0], pa.int64()),
        "l_linenumber": pa.array([1, 1, 1], pa.int64()),
        "l_quantity": pa.array([1.0] * 3, pa.float64()),
        "l_extendedprice": pa.array([1.0] * 3, pa.float64()),
        "l_discount": pa.array([0.0] * 3, pa.float64()),
        "l_tax": pa.array([0.0] * 3, pa.float64()),
        "l_returnflag": pa.array(["N"] * 3, pa.string()),
        "l_linestatus": pa.array(["O"] * 3, pa.string()),
        "l_shipdate": pa.array([base] * 3, pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    from ocr_engine_ray.pipelines.queries import q_lineitem_zorder_stats

    rows = _tab(q_lineitem_zorder_stats(str(tmp_path))).to_pylist()
    assert len(rows) == 1 and rows[0]["zbucket"] == 0
    assert rows[0]["n_rows"] == 3
    assert rows[0]["zmin"] == 0 and rows[0]["zmax"] == 7

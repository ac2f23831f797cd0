"""Planted-corpus semantic tests for the round-4 session-4 batch:
TPC-H Q4/Q7/Q11/Q14/Q18/Q22-shaped join/subquery operators and the
two-sample KS drift test.  (Bit-exactness vs DuckDB is pinned by the
contract sweep; these tests pin the SEMANTICS on corpora tiny enough
to check by hand, including the empty/boundary paths the sweep's
corpus never hits.)"""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import ray


def _tab(res) -> pa.Table:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        rows = res.take_all()
        if not rows:
            return res.schema().base_schema.empty_table()
        return pa.Table.from_pylist(rows)
    return res


def _ts(s: str):
    return datetime.datetime.fromisoformat(s)


def test_orders_large_quantity_threshold(ray_session, tmp_path):
    """Only the order whose quantity sum clears 300 survives; its
    joined name and summed quantity are exact; the under-threshold
    order never appears."""
    from ocr_engine_ray.pipelines.queries import q_orders_large_quantity

    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 11, 11], pa.int64()),
        "l_quantity": pa.array([200.0, 101.0, 150.0, 150.0]),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11], pa.int64()),
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_totalprice": pa.array([50.0, 60.0]),
        "o_orderdate": pa.array([_ts("1996-01-01"), _ts("1996-02-01")],
                                pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["alice", "bob"]),
    }), str(tmp_path / "customer.parquet"))

    rows = _tab(q_orders_large_quantity(str(tmp_path))).to_pylist()
    assert len(rows) == 1
    assert rows[0]["o_orderkey"] == 10
    assert rows[0]["c_name"] == "alice"
    assert rows[0]["sum_qty"] == 301


def test_orders_large_quantity_empty(ray_session, tmp_path):
    """No order clears the threshold → typed empty result."""
    from ocr_engine_ray.pipelines.queries import q_orders_large_quantity

    pq.write_table(pa.table({
        "l_orderkey": pa.array([10], pa.int64()),
        "l_quantity": pa.array([5.0]),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10], pa.int64()),
        "o_custkey": pa.array([1], pa.int64()),
        "o_totalprice": pa.array([50.0]),
        "o_orderdate": pa.array([_ts("1996-01-01")], pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
        "c_name": pa.array(["alice"]),
    }), str(tmp_path / "customer.parquet"))

    t = _tab(q_orders_large_quantity(str(tmp_path)))
    assert t.num_rows == 0
    assert "sum_qty" in t.schema.names


def test_promo_revenue_share_months(ray_session, tmp_path):
    """Share is promo/total per SHIP month: January is half promo
    (50 %), February all non-promo (0 %)."""
    from ocr_engine_ray.pipelines.queries import q_promo_revenue_share

    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["PROMO", "STANDARD"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 2], pa.int64()),
        "l_shipdate": pa.array([_ts("1995-01-05"), _ts("1995-01-20"),
                                _ts("1995-02-03")], pa.timestamp("us")),
        "l_extendedprice": pa.array([100.0, 100.0, 80.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))

    rows = {r["month"]: r
            for r in _tab(q_promo_revenue_share(str(tmp_path)))
            .to_pylist()}
    jan = rows[_ts("1995-01-01")]
    feb = rows[_ts("1995-02-01")]
    assert jan["promo_share"] == 50.0 and jan["revenue"] == 200.0
    assert feb["promo_share"] == 0.0 and feb["revenue"] == 80.0


def test_orders_priority_returns_semi_join(ray_session, tmp_path):
    """An order counts once per priority iff ANY of its lineitems was
    returned — two R lines still count the order once; an order with
    no R line never appears."""
    from ocr_engine_ray.pipelines.queries import q_orders_priority_returns

    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 11, 12], pa.int64()),
        "l_returnflag": pa.array(["R", "R", "N", "R"]),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "5-LOW"]),
    }), str(tmp_path / "orders.parquet"))

    got = {r["o_orderpriority"]: r["n_orders"]
           for r in _tab(q_orders_priority_returns(str(tmp_path)))
           .to_pylist()}
    assert got == {"1-URGENT": 1, "5-LOW": 1}


def test_customers_idle_rich(ray_session, tmp_path):
    """The threshold is the POSITIVE-balance average (negative balances
    excluded from it); a rich customer with an 'F' order is anti-joined
    away; a rich one without is kept and grouped by nation."""
    from ocr_engine_ray.pipelines.queries import q_customers_idle_rich

    # positive balances: 100, 100, 400 → avg 200; rich = {3 (400)}
    # plus customer 4 (300) > 200 but holds an F order → excluded
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "c_nationkey": pa.array([7, 7, 7, 7, 8], pa.int32()),
        "c_acctbal": pa.array([100.0, 100.0, 400.0, 300.0, -50.0]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([4, 3], pa.int64()),
        "o_orderstatus": pa.array(["F", "O"]),
    }), str(tmp_path / "orders.parquet"))

    rows = _tab(q_customers_idle_rich(str(tmp_path))).to_pylist()
    # avg over positives = (100+100+400+300)/4 = 225 → rich = {3, 4};
    # 4 has an F order → only customer 3 remains
    assert rows == [{"c_nationkey": 7, "n_custs": 1,
                     "total_acctbal": 400.0}]


def test_part_revenue_share_cut(ray_session, tmp_path):
    """Only parts with revenue strictly above 1.5× the mean per-part
    revenue survive; exactly-at-the-cut does not count; the returned
    revenue is the exact 4-dp quantized sum."""
    from ocr_engine_ray.pipelines.queries import q_part_revenue_share

    # revenues 9000 / 5000 / 1000: mean = 5000, cut = 7500 → only
    # part 1 survives (part 2 sits at the mean, part 3 far under)
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([9000.0, 5000.0, 1000.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))

    got = {r["p_partkey"]: r["revenue"]
           for r in _tab(q_part_revenue_share(str(tmp_path)))
           .to_pylist()}
    assert got == {1: 9000.0}


def test_part_revenue_share_boundary(ray_session, tmp_path):
    """A part EXACTLY at 1.5× the mean is excluded (strict >): two
    parts with revenues 3 and 1 → mean 2, cut 3 → neither kept."""
    from ocr_engine_ray.pipelines.queries import q_part_revenue_share

    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2], pa.int64()),
        "l_extendedprice": pa.array([3.0, 1.0]),
        "l_discount": pa.array([0.0, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))

    t = _tab(q_part_revenue_share(str(tmp_path)))
    assert t.num_rows == 0


def test_volume_shipping_pairs_and_years(ray_session, tmp_path):
    """Revenue lands on the (supp_nation, cust_nation, year) cell;
    same-nation flows are excluded; third-nation traffic never
    appears."""
    from ocr_engine_ray.pipelines.queries import q_volume_shipping

    pq.write_table(pa.table({
        "n_nationkey": pa.array([1, 2, 3], pa.int64()),
        "n_name": pa.array(["NATION_1", "NATION_2", "NATION_3"]),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([100, 200, 300], pa.int64()),
        "s_nationkey": pa.array([1, 2, 3], pa.int32()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([5, 6], pa.int64()),
        "c_nationkey": pa.array([2, 1], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11], pa.int64()),
        "o_custkey": pa.array([5, 6], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # order 10 (cust nation 2): supp 100 (n1) 1995, supp 200 (n2,
        # same-nation → excluded); order 11 (cust nation 1): supp 200
        # (n2) 1996, supp 300 (n3 → not in the pair)
        "l_orderkey": pa.array([10, 10, 11, 11], pa.int64()),
        "l_suppkey": pa.array([100, 200, 200, 300], pa.int64()),
        "l_shipdate": pa.array(
            [_ts("1995-03-01"), _ts("1995-03-01"),
             _ts("1996-07-01"), _ts("1996-07-01")], pa.timestamp("us")),
        "l_extendedprice": pa.array([100.0, 50.0, 80.0, 70.0]),
        "l_discount": pa.array([0.0, 0.0, 0.25, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))

    rows = {(r["supp_nation"], r["cust_nation"], r["l_year"]): r["revenue"]
            for r in _tab(q_volume_shipping(str(tmp_path))).to_pylist()}
    assert rows == {("NATION_1", "NATION_2", 1995): 100.0,
                    ("NATION_2", "NATION_1", 1996): 60.0}


def test_volume_shipping_no_pair_suppliers(ray_session, tmp_path):
    """No supplier in either pair nation → typed empty result (the
    early exit that protects the join from an all-empty left side)."""
    from ocr_engine_ray.pipelines.queries import q_volume_shipping

    pq.write_table(pa.table({
        "n_nationkey": pa.array([1, 2, 3], pa.int64()),
        "n_name": pa.array(["NATION_1", "NATION_2", "NATION_3"]),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([300], pa.int64()),
        "s_nationkey": pa.array([3], pa.int32()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([5], pa.int64()),
        "c_nationkey": pa.array([2], pa.int32()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10], pa.int64()),
        "o_custkey": pa.array([5], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10], pa.int64()),
        "l_suppkey": pa.array([300], pa.int64()),
        "l_shipdate": pa.array([_ts("1995-03-01")], pa.timestamp("us")),
        "l_extendedprice": pa.array([100.0]),
        "l_discount": pa.array([0.0]),
    }), str(tmp_path / "lineitem.parquet"))

    t = _tab(q_volume_shipping(str(tmp_path)))
    assert t.num_rows == 0
    assert set(t.schema.names) == {"supp_nation", "cust_nation",
                                   "l_year", "revenue"}


def test_orders_above_cust_avg_strict(ray_session, tmp_path):
    """Strictly-above semantics: of orders [1, 2, 3] only the 3 beats
    the customer's own average (2); an exactly-average order does not
    count.  A single-order customer is never above its own average."""
    from ocr_engine_ray.pipelines.queries import q_orders_above_cust_avg

    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_totalprice": pa.array([1.0, 2.0, 3.0, 9.0]),
    }), str(tmp_path / "orders.parquet"))

    rows = {r["c_custkey"]: r
            for r in _tab(q_orders_above_cust_avg(str(tmp_path)))
            .to_pylist()}
    assert rows[1]["n_orders"] == 3 and rows[1]["n_above"] == 1
    assert rows[2]["n_orders"] == 1 and rows[2]["n_above"] == 0


def test_events_ks_test_known_value(ray_session, tmp_path):
    """Hand-checkable KS: purchase {1, 2} vs click {2, 3} → sup
    distance 1/2 (at value 1 the purchase CDF leads by 0.5); other
    event types are ignored entirely."""
    from ocr_engine_ray.pipelines.queries import q_events_ks_test

    pq.write_table(pa.table({
        "event_type": pa.array(["purchase", "purchase", "click",
                                "click", "view"]),
        "value": pa.array([1.0, 2.0, 2.0, 3.0, 100.0]),
    }), str(tmp_path / "events.parquet"))

    rows = _tab(q_events_ks_test(str(tmp_path))).to_pylist()
    assert rows == [{"ks": 0.5, "n_purchase": 2, "n_click": 2}]


def test_events_ks_test_identical_distributions(ray_session, tmp_path):
    """Identical samples → KS = 0."""
    from ocr_engine_ray.pipelines.queries import q_events_ks_test

    pq.write_table(pa.table({
        "event_type": pa.array(["purchase", "click"] * 3),
        "value": pa.array([1.0, 1.0, 2.0, 2.0, 3.0, 3.0]),
    }), str(tmp_path / "events.parquet"))

    rows = _tab(q_events_ks_test(str(tmp_path))).to_pylist()
    assert rows[0]["ks"] == 0.0


def test_documents_ppl_buckets_planted(ray_session, tmp_path):
    """CCNet tercile semantics on a hand-checkable corpus: within one
    source, docs made of common tokens land in bucket 1 (head) and
    rare-token docs in bucket 3 (tail); NTILE's first-buckets-take-the-
    extra-row split holds for n=4 (sizes 2/1/1); a second source
    buckets independently (n=2 → sizes 1/1/0)."""
    from ocr_engine_ray.pipelines.queries import q_documents_ppl_buckets

    # corpus tf: 'the'×5, 'zz'×2, rare tokens ×1 → per-doc scores
    # (mean quantized ln tf): doc0=doc1=ln5 > doc2=ln5/2 > doc3=0
    texts = ["the the", "the the", "the rare1", "rare2",
             "zz zz", "qq"]
    sources = ["srcA"] * 4 + ["srcB"] * 2
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts),
        "source": pa.array(sources),
    }), str(tmp_path / "documents.parquet"))

    rows = {r["doc_id"]: r
            for r in q_documents_ppl_buckets(str(tmp_path)).take_all()}
    assert rows[0]["ppl_bucket"] == 1          # head (tie -> low doc_id)
    assert rows[1]["ppl_bucket"] == 1          # NTILE(3) of 4 = 2/1/1
    assert rows[2]["ppl_bucket"] == 2
    assert rows[3]["ppl_bucket"] == 3          # tail: rare token only
    assert rows[4]["ppl_bucket"] == 1          # srcB independent split
    assert rows[5]["ppl_bucket"] == 2          # n=2 -> sizes 1/1/0


def test_lineitem_revenue_forecast_predicates(ray_session, tmp_path):
    """Each Q6 predicate excludes independently: out-of-year, discount
    outside [0.05, 0.07], quantity ≥ 24; the one qualifying row's
    revenue is price·discount."""
    from ocr_engine_ray.pipelines.queries import q_lineitem_revenue_forecast

    pq.write_table(pa.table({
        "l_shipdate": pa.array(
            [_ts("1996-06-01"), _ts("1995-06-01"), _ts("1996-06-01"),
             _ts("1996-06-01")], pa.timestamp("us")),
        "l_discount": pa.array([0.06, 0.06, 0.04, 0.06]),
        "l_quantity": pa.array([10.0, 10.0, 10.0, 30.0]),
        "l_extendedprice": pa.array([1000.0] * 4),
    }), str(tmp_path / "lineitem.parquet"))

    rows = q_lineitem_revenue_forecast(str(tmp_path)).take_all()
    assert rows == [{"revenue": 60.0, "n_items": 1}]


def test_returned_item_report_quarter_and_flag(ray_session, tmp_path):
    """Only R-flag lineitems on orders inside Q1-1996 contribute; the
    report ranks by lost revenue with names joined."""
    from ocr_engine_ray.pipelines.queries import q_returned_item_report

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["alice", "bob"]),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 2, 1], pa.int64()),
        "o_orderdate": pa.array(
            [_ts("1996-02-01"), _ts("1996-03-01"), _ts("1996-07-01")],
            pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # order 10: 100 returned; order 11: 300 returned + 50 kept;
        # order 12: returned but OUT of the quarter
        "l_orderkey": pa.array([10, 11, 11, 12], pa.int64()),
        "l_returnflag": pa.array(["R", "R", "N", "R"]),
        "l_extendedprice": pa.array([100.0, 300.0, 50.0, 999.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))

    rows = q_returned_item_report(str(tmp_path)).take_all()
    assert [(r["c_name"], r["revenue"]) for r in rows] \
        == [("bob", 300.0), ("alice", 100.0)]


def test_events_chi2_perfect_dependence(ray_session, tmp_path):
    """A 2×2 table with perfect type↔hour separation: chi2 = n (=20),
    dof = 1; zero cells enter as expected-count contributions."""
    from ocr_engine_ray.pipelines.queries import q_events_chi2_independence

    ts = ([_ts("2024-01-01T00:30:00")] * 10
          + [_ts("2024-01-01T01:30:00")] * 10)
    pq.write_table(pa.table({
        "event_type": pa.array(["click"] * 10 + ["view"] * 10),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))

    rows = q_events_chi2_independence(str(tmp_path)).take_all()
    assert rows == [{"chi2": 20.0, "dof": 1, "n_events": 20}]


def test_events_chi2_independent(ray_session, tmp_path):
    """Perfectly proportional rows → chi2 = 0."""
    from ocr_engine_ray.pipelines.queries import q_events_chi2_independence

    ts = [_ts("2024-01-01T00:30:00"), _ts("2024-01-01T01:30:00")] * 4
    types = ["click", "click", "view", "view"] * 2
    pq.write_table(pa.table({
        "event_type": pa.array(types),
        "ts": pa.array(ts, pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))

    rows = q_events_chi2_independence(str(tmp_path)).take_all()
    assert rows == [{"chi2": 0.0, "dof": 1, "n_events": 8}]


def test_events_mwu_no_ties(ray_session, tmp_path):
    """purchase {1,2} vs click {3,4}: R1 = 3 → U = 0,
    z = −4/(2·√(5/3))."""
    import math
    from ocr_engine_ray.pipelines.queries import q_events_mwu_test

    pq.write_table(pa.table({
        "event_type": pa.array(["purchase", "purchase", "click",
                                "click"]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0]),
    }), str(tmp_path / "events.parquet"))

    rows = q_events_mwu_test(str(tmp_path)).take_all()
    assert rows[0]["u"] == 0.0
    assert abs(rows[0]["z"] - (-4.0 / (2.0 * math.sqrt(5.0 / 3.0)))) \
        < 1e-12


def test_events_mwu_with_ties(ray_session, tmp_path):
    """purchase {1,2} vs click {2,3}: tied rank 2.5 → R1 = 3.5,
    U = 0.5; tie correction Σ(t³−t) = 6 shrinks the variance to 1.5."""
    import math
    from ocr_engine_ray.pipelines.queries import q_events_mwu_test

    pq.write_table(pa.table({
        "event_type": pa.array(["purchase", "purchase", "click",
                                "click"]),
        "value": pa.array([1.0, 2.0, 2.0, 3.0]),
    }), str(tmp_path / "events.parquet"))

    rows = q_events_mwu_test(str(tmp_path)).take_all()
    assert rows[0]["u"] == 0.5
    assert abs(rows[0]["z"] - (-3.0 / (2.0 * math.sqrt(1.5)))) < 1e-12


def test_top_supplier_keeps_ties(ray_session, tmp_path):
    """Two suppliers tied at the maximum revenue BOTH survive (the
    = MAX filter, not LIMIT 1); out-of-window revenue is ignored."""
    from ocr_engine_ray.pipelines.queries import q_top_supplier

    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 2, 3, 1], pa.int64()),
        "l_shipdate": pa.array(
            [_ts("1996-02-01")] * 3 + [_ts("1995-02-01")],
            pa.timestamp("us")),
        "l_extendedprice": pa.array([100.0, 100.0, 50.0, 999.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["s-one", "s-two", "s-three"]),
    }), str(tmp_path / "supplier.parquet"))

    rows = sorted(q_top_supplier(str(tmp_path)).take_all(),
                  key=lambda r: r["s_suppkey"])
    assert [(r["s_name"], r["revenue"]) for r in rows] \
        == [("s-one", 100.0), ("s-two", 100.0)]


def test_part_supplier_counts_distinct_and_excl(ray_session, tmp_path):
    """Distinct-supplier counting per attribute group: a supplier
    shipping the same group twice counts once; the excluded brand's
    rows vanish entirely; two parts sharing (brand, type, size) pool
    their suppliers."""
    from ocr_engine_ray.pipelines.queries import q_part_supplier_counts

    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["Brand#2", "Brand#2", "Brand#1"]),
        "p_type": pa.array(["T", "T", "T"]),
        "p_size": pa.array([5, 5, 5], pa.int32()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        # parts 1,2 share the group: suppliers 10 (twice, via both
        # parts) and 20; part 3 is the excluded brand
        "l_partkey": pa.array([1, 2, 1, 3], pa.int64()),
        "l_suppkey": pa.array([10, 10, 20, 30], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))

    rows = q_part_supplier_counts(str(tmp_path)).take_all()
    assert rows == [{"p_brand": "Brand#2", "p_type": "T", "p_size": 5,
                     "supplier_cnt": 2}]


def test_events_benford_digits(ray_session, tmp_path):
    """First SIGNIFICANT digit: 0.05 → 5 (scaling preserves it),
    123.45 → 1, negative values count by magnitude, zero drops."""
    from ocr_engine_ray.pipelines.queries import q_events_benford_digits

    pq.write_table(pa.table({
        "value": pa.array([0.05, 123.45, -9.99, 0.0, 1.0]),
    }), str(tmp_path / "events.parquet"))

    rows = {r["digit"]: r for r in
            q_events_benford_digits(str(tmp_path)).take_all()}
    assert set(rows) == {1, 5, 9}
    assert rows[1]["n"] == 2 and rows[1]["share"] == 0.5
    assert rows[5]["n"] == 1 and rows[9]["n"] == 1


def test_events_daily_autocorr_gap_breaks_pairs(ray_session, tmp_path):
    """Counts 1,2,3 on consecutive days then a gap then 100: only the
    two consecutive pairs (1,2),(2,3) enter → perfect r = 1.0; the
    across-gap pair is excluded (it would wreck the correlation)."""
    from ocr_engine_ray.pipelines.queries import q_events_daily_autocorr

    ts = ([_ts("2024-01-01T05:00:00")] * 1
          + [_ts("2024-01-02T05:00:00")] * 2
          + [_ts("2024-01-03T05:00:00")] * 3
          + [_ts("2024-01-10T05:00:00")] * 100)
    pq.write_table(pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
    }), str(tmp_path / "events.parquet"))

    rows = q_events_daily_autocorr(str(tmp_path)).take_all()
    assert rows[0]["n_pairs"] == 2
    assert abs(rows[0]["autocorr"] - 1.0) < 1e-12


def test_events_spearman_monotone_and_ties(ray_session, tmp_path):
    """A strictly increasing value-over-time purchase series gives
    ρ = 1 regardless of spacing (rank-based); reversing one pair
    breaks it below 1; non-purchase rows are ignored."""
    from ocr_engine_ray.pipelines.queries import q_events_spearman

    base = [("purchase", "2024-01-01T00:00:0%d" % i, float(v))
            for i, v in enumerate([1, 3, 7, 20], 0)] \
        + [("view", "2024-01-01T00:00:09", 0.5)]
    pq.write_table(pa.table({
        "event_type": pa.array([r[0] for r in base]),
        "ts": pa.array([_ts(r[1]) for r in base], pa.timestamp("us")),
        "value": pa.array([r[2] for r in base]),
    }), str(tmp_path / "events.parquet"))
    rows = q_events_spearman(str(tmp_path)).take_all()
    assert rows[0]["n"] == 4
    assert abs(rows[0]["rho"] - 1.0) < 1e-12

    # swap the last two values → one discordant pair
    pq.write_table(pa.table({
        "event_type": pa.array(["purchase"] * 4),
        "ts": pa.array([_ts("2024-01-01T00:00:0%d" % i)
                        for i in range(4)], pa.timestamp("us")),
        "value": pa.array([1.0, 3.0, 20.0, 7.0]),
    }), str(tmp_path / "events.parquet"))
    rows = q_events_spearman(str(tmp_path)).take_all()
    assert rows[0]["rho"] < 1.0
    assert abs(rows[0]["rho"] - 0.8) < 1e-12   # classic n=4 one-swap

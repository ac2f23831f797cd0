"""Planted-corpus semantic tests for the round-4 session-7 batch:
PSI drift, the lineitem profiling report, per-user rolling median, and
per-type OLS trend.  Bit-exactness vs DuckDB is pinned by the contract
sweep; these pin the SEMANTICS on hand-checkable corpora, including the
one-sided-type exclusion, the -0.0/0.0 distinct fold, the even-window
midpoint, and the degenerate-denominator exclusion."""

import math

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
    """rows: (event_id, day, user_id, event_type, value)."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base + np.timedelta64(r[1], "D").astype(
            "timedelta64[us]") for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    }), str(tmp_path / "events.parquet"))


def test_psi_drift_planted(ray_session, tmp_path):
    """Days 0..3 → split at day 2.  'a' drifts 3/4 → 1/4 of its half,
    'b' the reverse; 'only_ref' lives in half 1 alone so it is
    EXCLUDED from the report but still counted in half-1's total."""
    rows = []
    eid = 0
    for day, typ, n in [(0, "a", 3), (1, "b", 1), (0, "only_ref", 1),
                        (2, "a", 1), (3, "b", 3)]:
        for _ in range(n):
            rows.append((eid, day, eid, typ, 1.0))
            eid += 1
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_psi_drift

    out = {r["event_type"]: r for r in
           _tab(q_events_psi_drift(str(tmp_path))).to_pylist()}
    assert set(out) == {"a", "b"}              # one-sided type excluded
    # half totals: n1 = 3+1+1 = 5 (only_ref counts), n2 = 4
    a = out["a"]
    assert (a["c_ref"], a["c_cur"]) == (3, 1)
    p1, p2 = 3 / 5, 1 / 4
    assert a["share_ref"] == round(p1, 6)
    assert abs(a["psi_term"] - (p2 - p1) * math.log(p2 / p1)) < 1e-6
    assert out["b"]["psi_term"] > 0            # drift is positive


def test_lineitem_profile_planted(ray_session, tmp_path):
    """Nulls counted, distincts exact (with -0.0 folding into 0.0 the
    way SQL equality does), typed min/max in the right slots."""
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 2, None], pa.int64()),
        "l_partkey": pa.array([7, 7, 7, 7], pa.int64()),
        "l_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_linenumber": pa.array([1, 1, 2, 2], pa.int32()),
        "l_quantity": pa.array([-0.0, 0.0, 2.5, None], pa.float64()),
        "l_extendedprice": pa.array([10.0, 20.0, 30.0, 40.0],
                                    pa.float64()),
        "l_discount": pa.array([0.1] * 4, pa.float64()),
        "l_tax": pa.array([0.0] * 4, pa.float64()),
        "l_returnflag": pa.array(["R", "A", None, "N"], pa.string()),
        "l_linestatus": pa.array(["O", "F", "O", "F"], pa.string()),
        "l_shipdate": pa.array(
            [np.datetime64("2024-01-0%dT00:00:00" % d, "us")
             for d in (1, 2, 3, 4)], pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    from ocr_engine_ray.pipelines.queries import q_lineitem_profile

    out = {r["col"]: r for r in
           _tab(q_lineitem_profile(str(tmp_path))).to_pylist()}
    assert len(out) == 11
    ok = out["l_orderkey"]
    assert (ok["n_rows"], ok["n_nulls"], ok["n_distinct"]) == (4, 1, 2)
    assert (ok["min_int"], ok["max_int"]) == (1, 2)
    assert ok["min_num"] is None and ok["min_str"] is None
    q = out["l_quantity"]
    assert q["n_distinct"] == 2            # {-0.0 ≡ 0.0, 2.5}, null out
    assert q["max_num"] == 2.5
    rf = out["l_returnflag"]
    assert (rf["n_nulls"], rf["min_str"], rf["max_str"]) == (1, "A", "R")
    sd = out["l_shipdate"]
    assert sd["min_int"] == int(np.datetime64(
        "2024-01-01T00:00:00", "us").astype("int64"))


def test_rolling_median_planted(ray_session, tmp_path):
    """Odd windows pick the middle value, even windows the midpoint;
    NULL values never enter a window; windows never cross users."""
    rows = [(i, 0, 1, "x", v) for i, v in
            enumerate([10.0, 20.0, None, 40.0, 1000.0])]
    rows += [(100, 0, 2, "x", 7.0)]            # other user: own window
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_rolling_median

    out = {r["event_id"]: r["rolling_med"] for r in
           _tab(q_events_rolling_median(str(tmp_path))).to_pylist()}
    assert 2 not in out                        # NULL row dropped
    assert out[0] == 10.0                      # [10]
    assert out[1] == 15.0                      # [10,20] midpoint
    assert out[3] == 20.0                      # [10,20,40] middle
    assert out[4] == 30.0                      # [10,20,40,1000] robust
    assert out[100] == 7.0                     # user 2 isolated


def test_ols_trend_planted(ray_session, tmp_path):
    """A perfect line y = 200·x + 300 cents recovers slope 200 and
    intercept 300 exactly; a single-day type is excluded."""
    rows = []
    eid = 0
    for day in range(5):
        rows.append((eid, day, eid, "lin", (200 * day + 300) / 100.0))
        eid += 1
    rows.append((eid, 2, eid, "flat", 9.0))    # one active day only
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_ols_trend

    out = {r["event_type"]: r for r in
           _tab(q_events_ols_trend(str(tmp_path))).to_pylist()}
    assert "flat" not in out
    lin = out["lin"]
    assert lin["n_days"] == 5
    assert lin["slope"] == 200.0
    assert lin["intercept"] == 300.0


def _write_baskets(tmp_path, baskets):
    """baskets: {orderkey: [partkeys]} → minimal lineitem table."""
    o, p = [], []
    for ok, parts in baskets.items():
        for pk in parts:
            o.append(ok)
            p.append(pk)
    n = len(o)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(o, pa.int64()),
        "l_partkey": pa.array(p, pa.int64()),
        "l_suppkey": pa.array([1] * n, pa.int64()),
        "l_linenumber": pa.array(list(range(n)), pa.int32()),
        "l_quantity": pa.array([1.0] * n, pa.float64()),
        "l_extendedprice": pa.array([1.0] * n, pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array(["N"] * n, pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array(
            [np.datetime64("2024-01-01T00:00:00", "us")] * n,
            pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))


BASKETS = {1: [1, 2, 3], 2: [2, 3, 4], 3: [5, 6], 4: [2, 3]}


def test_copurchase_degrees_planted(ray_session, tmp_path):
    """Repeat co-purchases collapse to one edge; degree histogram is
    over the DISTINCT edge set."""
    _write_baskets(tmp_path, BASKETS)
    from ocr_engine_ray.pipelines.queries import (
        q_parts_copurchase_degrees,
    )

    out = {r["degree"]: r["n_parts"] for r in
           _tab(q_parts_copurchase_degrees(str(tmp_path))).to_pylist()}
    # edges: (1,2)(1,3)(2,3)(2,4)(3,4)(5,6); degrees 2,3,3,2,1,1
    assert out == {1: 2, 2: 2, 3: 2}


def test_copurchase_triangles_planted(ray_session, tmp_path):
    """Two triangles ({1,2,3}, {2,3,4}); wedges Σ C(d,2) = 8;
    clustering = 3·2/8."""
    _write_baskets(tmp_path, BASKETS)
    from ocr_engine_ray.pipelines.queries import (
        q_parts_copurchase_triangles,
    )

    row = _tab(q_parts_copurchase_triangles(str(tmp_path))).to_pylist()[0]
    assert row["n_nodes"] == 6 and row["n_edges"] == 6
    assert row["n_triangles"] == 2 and row["n_wedges"] == 8
    assert row["clustering"] == 0.75


def test_pagerank_numpy_parity(ray_session, tmp_path):
    """The distributed quantized iteration must equal a straight numpy
    replay of the same recurrence — bit-exact, including the 1e12
    contribution quantization."""
    _write_baskets(tmp_path, BASKETS)
    from ocr_engine_ray.pipelines.queries import (
        q_parts_copurchase_pagerank,
    )

    out = _tab(q_parts_copurchase_pagerank(str(tmp_path))).to_pylist()
    edges = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4), (5, 6)]
    ids = np.array([1, 2, 3, 4, 5, 6])
    deg = np.array([2, 3, 3, 2, 1, 1], np.float64)
    r = np.full(6, 1 / 6)
    for _ in range(10):
        acc = np.zeros(6, np.int64)
        for a, b in edges:
            ia, ib = a - 1, b - 1
            acc[ib] += np.int64(np.rint(r[ia] / deg[ia] * 1e12))
            acc[ia] += np.int64(np.rint(r[ib] / deg[ib] * 1e12))
        r = (1 - 0.85) / 6 + 0.85 * (acc.astype(np.float64) / 1e12)
    want = sorted(zip(-r, ids))
    got = {row["p"]: row["rank"] for row in out}
    assert [row["p"] for row in out] == [int(i) for _, i in want]
    for rank, i in want:
        assert abs(got[int(i)] - round(-rank, 9)) < 1e-12
    # hubs 2 and 3 outrank the leaf pair
    assert got[2] > got[5] and got[3] > got[6]


def test_basket_lift_planted(ray_session, tmp_path):
    """Only the (2,3) pair clears MIN_COOC=2 (3 shared orders of 4);
    lift = w·N / (n_a·n_b) = 12/9."""
    _write_baskets(tmp_path, BASKETS)
    from ocr_engine_ray.pipelines.queries import q_parts_basket_lift

    out = _tab(q_parts_basket_lift(str(tmp_path))).to_pylist()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"], r["n_both"]) == (2, 3, 3)
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["support"] == 0.75 and r["conf_a_b"] == 1.0
    assert r["lift"] == round(12 / 9, 6)


def test_target_encoding_planted(ray_session, tmp_path):
    """Smoothing pulls small groups toward the global mean; the exact
    cross-multiplied arithmetic reproduces the hand calculation."""
    rows = [(0, 0, 1, "x", 1.0), (1, 0, 2, "x", 3.0),
            (2, 0, 3, "y", 10.0), (3, 0, 4, "y", None)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_target_encoding

    out = {r["event_type"]: r for r in
           _tab(q_events_target_encoding(str(tmp_path))).to_pylist()}
    # tot_s = 1400 cents over tot_n = 3; m = 10
    assert out["x"]["n"] == 2
    assert out["x"]["enc"] == round(15200 / 3600 / 100 * 100, 6) or \
        out["x"]["enc"] == round(15200.0 / 3600.0 / 100.0, 6)
    assert out["x"]["enc"] == round(
        (400 * 3 + 10 * 1400) / ((2 + 10) * 3) / 100, 6)
    assert out["y"]["enc"] == round(
        (1000 * 3 + 10 * 1400) / ((1 + 10) * 3) / 100, 6)
    # the smoothed encodings sit between group mean and global mean
    assert 2.0 < out["x"]["enc"] < 14 / 3
    assert 14 / 3 < out["y"]["enc"] < 10.0


def test_impute_median_planted(ray_session, tmp_path):
    """Odd group → middle value, even group → midpoint; an all-NULL
    type stays NULL (LEFT-JOIN semantics)."""
    rows = [(0, 0, 1, "a", 1.0), (1, 0, 2, "a", 3.0),
            (2, 0, 3, "a", 9.0), (3, 0, 4, "a", None),
            (4, 0, 5, "c", 1.0), (5, 0, 6, "c", 2.0),
            (6, 0, 7, "c", None),
            (7, 0, 8, "allnull", None)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_impute_median

    out = {r["event_id"]: r for r in
           _tab(q_events_impute_median(str(tmp_path))).to_pylist()}
    assert out[3]["value_filled"] == 3.0 and out[3]["was_null"]
    assert out[6]["value_filled"] == 1.5
    assert out[7]["value_filled"] is None and out[7]["was_null"]
    assert out[0]["value_filled"] == 1.0 and not out[0]["was_null"]


def _vec(i: int, j: int = -1, a: float = 1.0, b: float = 0.0):
    v = np.zeros(64, np.float32)
    v[i] = a
    if j >= 0:
        v[j] = b
    return list(map(float, v))


def _write_emb(tmp_path, rows):
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))


def test_label_noise_planted(ray_session, tmp_path):
    """Query 0's 10 nearest (identical) neighbours carry 6 disagreeing
    labels → noise_frac 0.6; the self row never appears."""
    rows = [(0, _vec(0), 0)]
    rows += [(i, _vec(0), 1 if i <= 6 else 0) for i in range(1, 11)]
    rows += [(11, _vec(1), 0)]                 # orthogonal distractor
    _write_emb(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_embeddings_label_noise

    out = {r["query_id"]: r for r in
           _tab(q_embeddings_label_noise(str(tmp_path))).to_pylist()}
    r0 = out[0]
    assert r0["n_neighbors"] == 10
    assert r0["n_disagree"] == 6 and r0["noise_frac"] == 0.6
    # the orthogonal vector (cos 0) must not displace any identical one
    assert out[11]["n_neighbors"] == 10


def _write_events_min(tmp_path, rows):
    """rows: (event_id, minute_offset, user_id, event_type, value)."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([base + np.timedelta64(r[1], "m").astype(
            "timedelta64[us]") for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    }), str(tmp_path / "events.parquet"))


def test_change_point_planted(ray_session, tmp_path):
    """Counts [1, 1, 8] over days 0-2: the uniform-rate deviation
    |cum·n − i·total| peaks at day 1 (|6−20| = 14)."""
    rows, eid = [], 0
    for day, cnt in [(0, 1), (1, 1), (2, 8)]:
        for _ in range(cnt):
            rows.append((eid, day, eid, "x", 1.0))
            eid += 1
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_change_point

    r = _tab(q_events_change_point(str(tmp_path))).to_pylist()[0]
    assert r["max_dev"] == 14 and r["n_days"] == 3
    assert r["total_events"] == 10
    assert str(r["change_day"]).startswith("2024-01-02")


def test_rolling_1h_sum_planted(ray_session, tmp_path):
    """The trailing-hour frame is inclusive on both ends and treats
    equal timestamps as peers (RANGE, not ROWS)."""
    rows = [(0, 0, 1, "x", 1.0), (1, 30, 1, "x", 2.0),
            (2, 61, 1, "x", 4.0),
            (10, 0, 2, "x", 1.0), (11, 0, 2, "x", 2.0)]  # ts peers
    _write_events_min(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_rolling_1h_sum

    out = {r["event_id"]: r["sum_cents_1h"] for r in
           _tab(q_events_rolling_1h_sum(str(tmp_path))).to_pylist()}
    assert out[0] == 100
    assert out[1] == 300                       # minute 30 sees minute 0
    assert out[2] == 600                       # minute 61 drops minute 0
    assert out[10] == 300 and out[11] == 300   # peers see each other


def test_session_timeout_sweep_planted(ray_session, tmp_path):
    """User 1 has gaps of 10 and 40 minutes; user 2 is a singleton."""
    rows = [(0, 0, 1, "x", 1.0), (1, 10, 1, "x", 1.0),
            (2, 50, 1, "x", 1.0), (3, 0, 2, "x", 1.0)]
    _write_events_min(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import (
        q_events_session_timeout_sweep,
    )

    out = {r["timeout_minutes"]: r["n_sessions"] for r in
           _tab(q_events_session_timeout_sweep(str(tmp_path)))
           .to_pylist()}
    assert out == {5: 4, 15: 3, 30: 3, 60: 2}


def test_jaccard_threshold_curve_planted(ray_session, tmp_path):
    """Identical docs land in every tier ≤ 1.0; a j = 1/3 pair stops
    contributing above 0.3; the curve is cumulative-≥."""
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c d", "a b c d", "a b c x"],
                         pa.string()),
        "lang": pa.array(["en"] * 3, pa.string()),
        "source": pa.array(["s"] * 3, pa.string()),
        "n_chars": pa.array([7, 7, 7], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    from ocr_engine_ray.pipelines.queries import (
        q_documents_jaccard_threshold_curve,
    )

    out = {round(r["threshold"], 1): r["n_pairs"] for r in
           _tab(q_documents_jaccard_threshold_curve(str(tmp_path)))
           .to_pylist()}
    assert out[0.1] == 3 and out[0.3] == 3     # both 1/3 pairs included
    assert out[0.4] == 1 and out[1.0] == 1     # only the identical pair

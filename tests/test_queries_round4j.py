"""Planted-corpus semantic tests for the round-4 session-11 batch:
the graph-family part 2 (k-core peel, BFS hops) — hand-checkable
graphs, plus driver-path vs distributed-path parity (both queries are
hybrid like connected_components).  Bit-exactness vs DuckDB is pinned
by the contract sweep; these pin SEMANTICS.
"""

import pyarrow as pa
import pyarrow.parquet as pq


def _write_basket_lineitem(tmp_path, edges):
    """One 2-part order per edge — the co-purchase graph of the
    resulting lineitem IS exactly ``edges``."""
    ok, pk = [], []
    for i, (a, b) in enumerate(edges):
        ok += [i, i]
        pk += [a, b]
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))


# K4 clique (3-core, each core_degree 3) + pendant chain 4-5-6 (peeled
# in two cascading rounds) + a triangle 7-8-9 (deg 2, peeled round 1).
KCORE_EDGES = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
               (4, 5), (5, 6),
               (7, 8), (8, 9), (7, 9)]


def test_kcore_planted_peel(ray_session, tmp_path):
    _write_basket_lineitem(tmp_path, KCORE_EDGES)
    from ocr_engine_ray.pipelines.queries import _kcore_core_degrees

    got = _kcore_core_degrees(str(tmp_path), k=3).to_pylist()
    assert got == [{"p": 1, "core_degree": 3},
                   {"p": 2, "core_degree": 3},
                   {"p": 3, "core_degree": 3},
                   {"p": 4, "core_degree": 3}]


def test_kcore_distributed_path_parity(ray_session, tmp_path):
    """driver_edge_cap=0 forces the broadcast-state distributed peel;
    it must equal the driver numpy peel row for row."""
    _write_basket_lineitem(tmp_path, KCORE_EDGES)
    from ocr_engine_ray.pipelines.queries import _kcore_core_degrees

    drv = _kcore_core_degrees(str(tmp_path), k=3).to_pylist()
    dist = _kcore_core_degrees(str(tmp_path), k=3,
                               driver_edge_cap=0).to_pylist()
    assert drv == dist


def test_kcore_empty_core(ray_session, tmp_path):
    """A bare chain has no 3-core: both paths return a typed empty."""
    _write_basket_lineitem(tmp_path, [(1, 2), (2, 3), (3, 4)])
    from ocr_engine_ray.pipelines.queries import _kcore_core_degrees

    for cap in (5_000_000, 0):
        t = _kcore_core_degrees(str(tmp_path), k=3,
                                driver_edge_cap=cap)
        assert t.num_rows == 0
        assert t.schema.names == ["p", "core_degree"]


def test_kcore_nonconvergence_is_loud(ray_session, tmp_path):
    """A long chain at k=2 peels one pendant per round from each end —
    max_iters=1 must raise, never silently truncate."""
    import pytest

    _write_basket_lineitem(
        tmp_path, [(i, i + 1) for i in range(1, 8)])
    from ocr_engine_ray.pipelines.queries import _kcore_core_degrees

    with pytest.raises(RuntimeError, match="did not converge"):
        _kcore_core_degrees(str(tmp_path), k=2, max_iters=1)


# Path 1-2-3-4 (hops 0..3 from seed 1) plus a disconnected edge
# {10, 11} (2 unreachable parts -> the hops=-1 row).
BFS_EDGES = [(1, 2), (2, 3), (3, 4), (10, 11)]
BFS_EXPECT = [{"hops": -1, "n_parts": 2},
              {"hops": 0, "n_parts": 1},
              {"hops": 1, "n_parts": 1},
              {"hops": 2, "n_parts": 1},
              {"hops": 3, "n_parts": 1}]


def test_bfs_planted_hops(ray_session, tmp_path):
    _write_basket_lineitem(tmp_path, BFS_EDGES)
    from ocr_engine_ray.pipelines.queries import _bfs_hops

    assert _bfs_hops(str(tmp_path)).to_pylist() == BFS_EXPECT


def test_bfs_distributed_path_parity(ray_session, tmp_path):
    _write_basket_lineitem(tmp_path, BFS_EDGES)
    from ocr_engine_ray.pipelines.queries import _bfs_hops

    assert _bfs_hops(str(tmp_path),
                     driver_edge_cap=0).to_pylist() == BFS_EXPECT


def test_bfs_hop_bound_is_loud(ray_session, tmp_path):
    import pytest

    _write_basket_lineitem(tmp_path, BFS_EDGES)
    from ocr_engine_ray.pipelines.queries import _bfs_hops

    with pytest.raises(RuntimeError, match="frontier still nonempty"):
        _bfs_hops(str(tmp_path), max_hops=2)


# --- SPRT + EB shrinkage (same session) -----------------------------------

def _write_events(tmp_path, rows):
    """rows: (event_id, user_id, minutes_after_base, event_type, value)."""
    import numpy as np

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


def _rows(res):
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.take_all()
    return res.to_pylist()


def test_sprt_hand_checked_walk(ray_session, tmp_path):
    """Five straight successes cross +A exactly at n=5 (4·693147 =
    2772588 < 2944439 ≤ 5·693147); eight straight failures cross −A at
    n=8; two successes never cross ('continue')."""
    rows = []
    rows += [(i, 1, i, "up", 150.0) for i in range(5)]
    rows += [(100 + i, 1, i, "down", 50.0) for i in range(8)]
    rows += [(200 + i, 1, i, "flat", 150.0) for i in range(2)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_sprt

    got = {r["event_type"]: r for r in _rows(q_events_sprt(str(tmp_path)))}
    assert got["up"]["decision"] == "accept_h1"
    assert got["up"]["stop_n"] == 5
    assert got["up"]["llr_q"] == 5 * 693147
    assert got["down"]["decision"] == "accept_h0"
    assert got["down"]["stop_n"] == 8
    assert got["down"]["llr_q"] == -8 * 405465
    assert got["flat"]["decision"] == "continue"
    assert got["flat"]["stop_n"] == 0
    assert got["flat"]["llr_q"] == 2 * 693147
    assert got["flat"]["n_success"] == 2


def test_sprt_order_is_ts_then_event_id(ray_session, tmp_path):
    """All five events share ONE ts, so the walk order is pinned
    entirely by the event_id tiebreak (ids 0-3 success, id 4 failure):
    the final cum 4·693147 − 405465 = 2367123 stays below A, so the
    correct result is 'continue' with exactly that llr — any other
    tie order that crossed a boundary mid-walk would stop early and
    report a different (decision, llr_q)."""
    rows = [(i, 1, 0, "t", 150.0) for i in range(4)]
    rows.append((4, 1, 0, "t", 50.0))
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_sprt

    got = _rows(q_events_sprt(str(tmp_path)))[0]
    assert got["decision"] == "continue"
    assert got["llr_q"] == 4 * 693147 - 405465


def _write_supplier_lineitem(tmp_path, sup_rows):
    """sup_rows: (suppkey, n_items, n_returns)."""
    sk, rf = [], []
    for s, n, k in sup_rows:
        sk += [s] * n
        rf += ["R"] * k + ["N"] * (n - k)
    pq.write_table(pa.table({
        "l_suppkey": pa.array(sk, pa.int64()),
        "l_returnflag": pa.array(rf, pa.string()),
    }), str(tmp_path / "lineitem.parquet"))


def test_eb_shrinkage_hand_checked(ray_session, tmp_path):
    """Rates {0.5, 0.0, 1.0} → MoM prior m=0.5, v=1/6, k0=0.5,
    α=β=0.25.  The small-n extreme supplier (2/2) shrinks to 0.9,
    the large-n moderate one (2/4) stays at 0.5 — EB ranks by
    evidence-weighted rate, and the exact ints are floor-ppm."""
    _write_supplier_lineitem(tmp_path, [(1, 4, 2), (2, 4, 0),
                                        (3, 2, 2)])
    from ocr_engine_ray.pipelines.queries import q_supplier_eb_shrinkage

    got = _rows(q_supplier_eb_shrinkage(str(tmp_path)))
    assert [r["suppkey"] for r in got] == [3, 1, 2]
    by = {r["suppkey"]: r for r in got}
    assert by[1]["rate_ppm"] == 500000
    assert by[2]["rate_ppm"] == 0
    assert by[3]["rate_ppm"] == 1000000
    assert abs(by[3]["shrunk_rate"] - 0.9) < 1e-12
    assert abs(by[1]["shrunk_rate"] - 0.5) < 1e-12
    assert abs(by[2]["shrunk_rate"] - 0.25 / 4.5) < 1e-12
    assert abs(by[1]["alpha"] - 0.25) < 1e-12
    assert abs(by[1]["beta"] - 0.25) < 1e-12


def test_eb_shrinkage_zero_variance_is_loud(ray_session, tmp_path):
    import pytest

    _write_supplier_lineitem(tmp_path, [(1, 4, 2), (2, 2, 1)])
    from ocr_engine_ray.pipelines.queries import q_supplier_eb_shrinkage

    with pytest.raises(RuntimeError, match="zero variance"):
        q_supplier_eb_shrinkage(str(tmp_path))


def test_eigencentrality_integer_replay(ray_session, tmp_path):
    """Triangle {1,2,3} + pendant 4-1 (an odd cycle, so the power
    iteration doesn't oscillate): the engine's 8 max-normalized
    integer rounds must equal a pure-Python replay bit for bit, and
    the ranking must read hub > symmetric pair > pendant."""
    edges = [(1, 2), (1, 3), (2, 3), (1, 4)]
    _write_basket_lineitem(tmp_path, edges)
    from ocr_engine_ray.pipelines.queries import (
        q_parts_copurchase_eigencentrality,
    )

    nodes = [1, 2, 3, 4]
    nbrs = {1: [2, 3, 4], 2: [1, 3], 3: [1, 2], 4: [1]}
    x = {p: 10**9 for p in nodes}
    for _ in range(8):
        y = {p: sum(x[q] for q in nbrs[p]) for p in nodes}
        mx = max(y.values())
        x = {p: y[p] * 10**9 // mx for p in nodes}
    expect = sorted(((p, s) for p, s in x.items()),
                    key=lambda t: (-t[1], t[0]))

    got = _rows(q_parts_copurchase_eigencentrality(str(tmp_path)))
    assert [(r["p"], r["score_ppb"]) for r in got] == expect
    score = {r["p"]: r["score_ppb"] for r in got}
    assert score[1] > score[2] == score[3] > score[4]


def test_mmr_prefers_diversity_over_neardup(ray_session, tmp_path):
    """Query (1,0); a=(.9,.4357) and its mirror c=(.9,−.4357) are
    EQUALLY relevant (tie broken to the lower vec_id 7), and b is a's
    near-duplicate: step 2 must pick the mirror c — its ~0.62
    similarity to a beats b's ~1.0 under 0.5·rel − 0.5·maxsim even
    though b's raw relevance is a hair higher — and with only 3
    candidates the walk stops at 3 rows, not MMR_K."""
    import numpy as np

    vecs = {0: [1.0, 0.0], 7: [0.9, 0.4357], 8: [0.9, 0.4367],
            9: [0.9, -0.4357]}
    pq.write_table(pa.table({
        "vec_id": pa.array(sorted(vecs), pa.int64()),
        "embedding": pa.array([vecs[k] for k in sorted(vecs)],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 4, pa.int64()),
    }), str(tmp_path / "embeddings.parquet"))
    from ocr_engine_ray.pipelines.queries import q_embeddings_mmr

    got = q_embeddings_mmr(str(tmp_path)).to_pylist()
    assert [r["step"] for r in got] == [1, 2, 3]
    assert got[0]["vec_id"] == 7      # most relevant first
    assert got[1]["vec_id"] == 9      # diversity beats the near-dup
    assert got[2]["vec_id"] == 8
    assert got[0]["maxsim"] is None
    assert np.isclose(got[1]["score"],
                      0.5 * got[1]["rel"] - 0.5 * got[1]["maxsim"])


def test_isotonic_matches_canonical_pav(ray_session, tmp_path):
    """The parity-scheduled odd-even merging must land on the SAME
    pools as the classic stack PAV (PAV merges are confluent) — the
    reference here runs in exact Fractions on a series with nested
    violations: 5, 3, 4, 10, 1 → pools {5,3} (mean 4), {4} (mean 4 —
    equal means are NOT a strict violation, so no merge), and {10,1}
    (mean 5.5)."""
    from fractions import Fraction

    daily = [500, 300, 400, 1000, 100]  # cents per day, 5 days
    rows = []
    eid = 0
    for d, cents in enumerate(daily):
        rows.append((eid, 1, d * DAY_MIN_LOCAL, "view", cents / 100.0))
        eid += 1
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_isotonic_daily

    # canonical stack PAV on (sy, n) with Fraction means
    stack = [(i, sy, 1) for i, sy in enumerate(daily)]
    out = []
    for p in stack:
        out.append(p)
        while len(out) > 1 and (Fraction(out[-2][1], out[-2][2])
                                > Fraction(out[-1][1], out[-1][2])):
            s1, sy1, n1 = out[-2]
            _, sy2, n2 = out[-1]
            out[-2:] = [(s1, sy1 + sy2, n1 + n2)]
    expect = [(s, sy, n) for s, sy, n in out]
    assert expect == [(0, 800, 2), (2, 400, 1),
                      (3, 1100, 2)]  # hand-checked

    got = _rows(q_events_isotonic_daily(str(tmp_path)))
    assert [(r["n_days"], r["sum_cents"]) for r in got] \
        == [(n, sy) for _, sy, n in expect]
    fits = [r["fitted"] for r in got]
    assert fits == sorted(fits)
    assert fits == [400.0, 400.0, 550.0]


DAY_MIN_LOCAL = 24 * 60


def test_chao1_hand_checked(ray_session, tmp_path):
    """Corpus 'a a b c' → V=3, f1={b,c}=2, f2={a}=1 → chao1 = 3 +
    2·1/(2·2) = 3.5; corpus 'x x y y' → V=2, f1=0, f2=2 → chao1 = 2
    (no singletons ⇒ no estimated unseen types)."""
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["a a b c", "x x y y"], pa.string()),
        "source": pa.array(["s1", "s2"], pa.string()),
    }), str(tmp_path / "documents.parquet"))
    from ocr_engine_ray.pipelines.queries import q_documents_chao1

    got = {r["source"]: r for r in
           q_documents_chao1(str(tmp_path)).to_pylist()}
    assert got["s1"]["v_obs"] == 3 and got["s1"]["f1"] == 2 \
        and got["s1"]["f2"] == 1 and got["s1"]["chao1"] == 3.5
    assert got["s2"]["v_obs"] == 2 and got["s2"]["f1"] == 0 \
        and got["s2"]["f2"] == 2 and got["s2"]["chao1"] == 2.0


def test_dbscan_roles_hand_checked(ray_session, tmp_path):
    """2-d vectors by angle: 0/5/10/15° are mutually ≥ cos15° ≈ .966
    similar (4 points incl self ⇒ all core, one cluster labeled by the
    min core id 1); 75° sees only 60°/65° (cos .50/.42 ≥ .35 but
    cos 70° ≈ .34 < .35 to the 5° point and cos 75° ≈ .26 to 0°) ⇒
    3 < minPts incl self ⇒ border, joining min-adjacent-core 3's
    cluster; 160° sees nobody ⇒ noise."""
    import numpy as np

    angles = {1: 0.0, 2: 5.0, 3: 10.0, 4: 15.0, 5: 75.0, 6: 160.0}
    ids = sorted(angles)
    vecs = [[float(np.cos(np.radians(angles[i]))),
             float(np.sin(np.radians(angles[i])))] for i in ids]
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * len(ids), pa.int64()),
    }), str(tmp_path / "embeddings.parquet"))
    from ocr_engine_ray.pipelines.queries import q_embeddings_dbscan

    got = {r["vec_id"]: r for r in
           _rows(q_embeddings_dbscan(str(tmp_path)))}
    for i in (1, 2, 3, 4):
        assert got[i]["role"] == "core" and got[i]["cluster"] == 1
    assert got[5]["role"] == "border" and got[5]["cluster"] == 1
    assert got[6]["role"] == "noise" and got[6]["cluster"] is None


def test_rbo_full_overlap_weights(ray_session, tmp_path):
    """Three suppliers whose raw and EB-shrunk rankings coincide (the
    eb_shrinkage hand corpus): overlap at every depth is min(d, 3),
    so RBO must equal the documented weight formula Σ (1−p)·p^(d−1)·
    (min(d,3)/d) under the same fempto-quantization."""
    from ocr_engine_ray.util import round_sql_f

    _write_supplier_lineitem(tmp_path, [(1, 4, 2), (2, 4, 0),
                                        (3, 2, 2)])
    from ocr_engine_ray.pipelines.queries import q_supplier_rank_rbo

    got = _rows(q_supplier_rank_rbo(str(tmp_path)))[0]
    acc = 0
    for d in range(1, 21):
        x = min(d, 3)
        acc += int(round_sql_f(
            0.5 * (0.5 ** (d - 1)) * (float(x) / float(d)) * 1e15, 0))
    assert got["overlap_at_depth"] == 3
    assert got["rbo_q"] == acc
    assert got["rbo"] == float(acc) / 1e15
    assert 0.0 < got["rbo"] <= 1.0


def test_reliability_bins_hand_checked(ray_session, tmp_path):
    """Band 0 (lengths < 100): 3 docs, 1 'en' → rate 1/3 and Brier
    contribution k(n−k)/n = 2/3 → 666...e9 floor-quantized; band 1:
    2 docs both 'en' → rate 1.0, perfectly calibrated, Brier 0."""
    texts = ["a" * 10, "b" * 20, "c" * 30, "d" * 150, "e" * 160]
    langs = ["en", "de", "fr", "en", "en"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s"] * 5, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    from ocr_engine_ray.pipelines.queries import (
        q_documents_reliability_bins,
    )

    got = _rows(q_documents_reliability_bins(str(tmp_path)))
    by = {r["band"]: r for r in got}
    assert set(by) == {0, 1}
    assert by[0]["n_docs"] == 3 and by[0]["n_pos"] == 1
    assert by[0]["rate"] == 1.0 / 3.0
    assert by[0]["brier_q"] == 1 * 2 * 10**12 // 3
    assert by[1]["n_docs"] == 2 and by[1]["n_pos"] == 2
    assert by[1]["rate"] == 1.0 and by[1]["brier_q"] == 0


def test_locf_daily_hand_checked(ray_session, tmp_path):
    """User 1 observes day 0 (100¢) and day 3 (300¢); user 2 only
    day 4 (50¢, which also extends the global grid).  Days 1-2 carry
    100 forward, day 4 carries 300; user 2's days 0-3 stay NULL (no
    prior observation), never zero-filled."""
    rows = [(1, 1, 0, "view", 1.00), (2, 1, 3 * DAY_MIN_LOCAL,
                                      "view", 3.00),
            (3, 2, 4 * DAY_MIN_LOCAL, "view", 0.50)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_locf_daily

    got = {(r["user_id"], r["day"].day): (r["observed"], r["filled"])
           for r in _rows(q_events_locf_daily(str(tmp_path)))}
    assert len(got) == 10  # 2 users x 5 grid days
    assert got[(1, 1)] == (100, 100)
    assert got[(1, 2)] == (None, 100)
    assert got[(1, 3)] == (None, 100)
    assert got[(1, 4)] == (300, 300)
    assert got[(1, 5)] == (None, 300)
    assert got[(2, 1)] == (None, None)
    assert got[(2, 4)] == (None, None)
    assert got[(2, 5)] == (50, 50)


def test_pq_recall_lossless_corpus(ray_session, tmp_path):
    """A corpus the codebook can represent EXACTLY (8-dim vectors,
    subspace width 1; only dim 0 varies, over exactly 16 distinct
    values all present among the first-16 vec_id init seeds): Lloyd
    keeps the seeds, encoding reconstructs every vector, ADC distance
    equals exact L2 — recall@5 must be 1.0 for every query."""
    vecs, ids = [], []
    for i in range(40):
        v = [float(i % 16)] + [1.0] * 7
        ids.append(i)
        vecs.append(v)
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * len(ids), pa.int64()),
    }), str(tmp_path / "embeddings.parquet"))
    from ocr_engine_ray.pipelines.queries import q_embeddings_pq_recall

    t = q_embeddings_pq_recall(str(tmp_path))
    assert t.num_rows == 8
    assert t.column("recall5").to_pylist() == [1.0] * 8
    assert t.column("n_hits").to_pylist() == [5] * 8


def test_max_drawdown_hand_checked(ray_session, tmp_path):
    """Daily totals +100, −40, −30, +200, −10: cumulative 100, 60,
    30, 230, 220 → peak path 100, 100, 100, 230, 230 → drawdowns 0,
    40, 70, 0, 10 → max 70 bottoming on day 3 (first attainment)."""
    rows = [(1, 1, 0, "v", 1.00),
            (2, 1, DAY_MIN_LOCAL, "v", -0.40),
            (3, 1, 2 * DAY_MIN_LOCAL, "v", -0.30),
            (4, 1, 3 * DAY_MIN_LOCAL, "v", 2.00),
            (5, 1, 4 * DAY_MIN_LOCAL, "v", -0.10)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_max_drawdown

    got = _rows(q_events_max_drawdown(str(tmp_path)))[0]
    assert got["n_days"] == 5
    assert got["final_cents"] == 220
    assert got["peak_cents"] == 230
    assert got["max_drawdown_cents"] == 70
    assert got["trough_day"].day == 3


def test_jl_distortion_identity_and_exactness(ray_session, tmp_path):
    """Two planted pairs: (0,1) differ in ONE input dim by exactly
    1.0 → d_orig² = 1e12 and d_proj² = Σⱼ (±1e6)² = 16e12, so the
    ratio is exactly 1e6 (band 10) — a single-coordinate difference
    is preserved losslessly by a ±1 projection; (2,3) are identical →
    excluded, never a divide-by-zero."""
    vecs = [[0.0] * 64, [0.0] * 64, [0.5] * 64, [0.5] * 64]
    vecs[1] = [1.0] + [0.0] * 63
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * 4, pa.int64()),
    }), str(tmp_path / "embeddings.parquet"))
    from ocr_engine_ray.pipelines.queries import (
        q_embeddings_jl_distortion,
    )

    got = _rows(q_embeddings_jl_distortion(str(tmp_path)))
    assert got == [{"band": 10, "n_pairs": 1}]

"""Planted-corpus semantic tests for the round-4 session-10 batch:
the model-evaluation family (stump confusion matrix lift rule, exact
tie-aware ROC AUC, k-fold assignment determinism).  Bit-exactness vs
DuckDB is pinned by the contract sweep; these pin the SEMANTICS on
hand-checkable corpora.
"""

import hashlib

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


def _write_label_docs(tmp_path, docs):
    """docs: (doc_id, lang, n_chars)."""
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array(["x" * d[2] for d in docs], pa.string()),
        "lang": pa.array([d[1] for d in docs], pa.string()),
        "source": pa.array(["s0"] * len(docs), pa.string()),
        "n_chars": pa.array([d[2] for d in docs], pa.int64()),
    }), str(tmp_path / "documents.parquet"))


def test_stump_confusion_planted(ray_session, tmp_path):
    """Perfectly separable corpus: en docs short (10), others long
    (100).  The stump must split at 10 with a perfect confusion
    matrix — tp = 3 positives, zero errors, acc = prec = rec = f1 = 1."""
    docs = [(1, "en", 10), (2, "en", 10), (3, "en", 10),
            (4, "fr", 100), (5, "de", 100)]
    _write_label_docs(tmp_path, docs)
    from ocr_engine_ray.pipelines.queries import q_documents_stump_confusion

    r = _tab(q_documents_stump_confusion(str(tmp_path))).to_pylist()[0]
    assert r["split_threshold"] == 10
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (3, 0, 0, 2)
    assert r["acc"] == 1.0 and r["prec"] == 1.0
    assert r["rec"] == 1.0 and r["f1"] == 1.0


def test_stump_confusion_lift_rule(ray_session, tmp_path):
    """Sub-50 % plurality positive class: en is 40 % overall and 2/3
    in the left leaf — majority voting would predict all-negative
    (tp = 0), the lift rule must predict positive on the left leaf.
    Corpus: left (len 10) = 2 en + 1 fr, right (len 100) = 0 en + 2 fr.
    Best split must isolate the leaves at threshold 10; left rate
    2/3 >= base 2/5 -> positive; right 0 < base -> negative."""
    docs = [(1, "en", 10), (2, "en", 10), (3, "fr", 10),
            (4, "fr", 100), (5, "fr", 100)]
    _write_label_docs(tmp_path, docs)
    from ocr_engine_ray.pipelines.queries import q_documents_stump_confusion

    r = _tab(q_documents_stump_confusion(str(tmp_path))).to_pylist()[0]
    assert r["split_threshold"] == 10
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 1, 0, 2)
    assert r["acc"] == 4.0 / 5.0
    assert r["prec"] == 2.0 / 3.0 and r["rec"] == 1.0
    assert abs(r["f1"] - 0.8) < 1e-12


def test_length_auc_planted(ray_session, tmp_path):
    """Hand-checked AUC with one tie: positives at lengths {10, 30},
    negatives at {10, 20}.  Pairs: (10+,10-) tie = 0.5, (10+,20-) = 0,
    (30+,10-) = 1, (30+,20-) = 1 -> AUC = 2.5/4 = 0.625; the exact
    integer numerator 2U = 5."""
    docs = [(1, "en", 10), (2, "fr", 10), (3, "fr", 20), (4, "en", 30)]
    _write_label_docs(tmp_path, docs)
    from ocr_engine_ray.pipelines.queries import q_documents_length_auc

    r = _tab(q_documents_length_auc(str(tmp_path))).to_pylist()[0]
    assert (r["n_pos"], r["n_neg"], r["u2"]) == (2, 2, 5)
    assert r["auc"] == 0.625
    assert r["gini"] == 2.0 * 0.625 - 1.0


def test_length_auc_perfect_and_inverted(ray_session, tmp_path):
    """All positives above all negatives -> AUC 1; flipping the label
    inverts to 0 (computed on the complement corpus)."""
    docs = [(1, "en", 50), (2, "en", 60), (3, "fr", 10), (4, "fr", 20)]
    _write_label_docs(tmp_path, docs)
    from ocr_engine_ray.pipelines.queries import q_documents_length_auc

    r = _tab(q_documents_length_auc(str(tmp_path))).to_pylist()[0]
    assert r["auc"] == 1.0 and r["gini"] == 1.0
    docs = [(1, "fr", 50), (2, "fr", 60), (3, "en", 10), (4, "en", 20)]
    _write_label_docs(tmp_path, docs)
    r = _tab(q_documents_length_auc(str(tmp_path))).to_pylist()[0]
    assert r["auc"] == 0.0 and r["gini"] == -1.0


def test_kfold_assignment_deterministic(ray_session, tmp_path):
    """Folds partition the corpus, every fold statistic is consistent,
    and the assignment replays the shared seeded row-identity hash
    (md5(doc_id || chr(31) || '42') first 8 hex chars, mod 5)."""
    docs = [(i, "en" if i % 3 == 0 else "fr", 10 + i) for i in range(60)]
    _write_label_docs(tmp_path, docs)
    from ocr_engine_ray.pipelines.queries import q_documents_kfold_stats

    rows = {r["fold"]: r for r in
            _tab(q_documents_kfold_stats(str(tmp_path))).to_pylist()}
    assert sum(r["n_docs"] for r in rows.values()) == 60
    assert sum(r["n_en"] for r in rows.values()) == 20

    expect = {}
    for i, lang, nc in docs:
        f = int(hashlib.md5(f"{i}\x1f42".encode()).hexdigest()[:8], 16) % 5
        d = expect.setdefault(f, [0, 0, 0])
        d[0] += 1
        d[1] += 1 if lang == "en" else 0
        d[2] += nc
    for f, (n, en, ch) in expect.items():
        r = rows[f]
        assert (r["n_docs"], r["n_en"], r["sum_chars"]) == (n, en, ch)
        assert r["mean_chars"] == float(ch) / float(n)
        assert r["en_rate"] == float(en) / float(n)


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


def _poisson_weight(u: int) -> int:
    from ocr_engine_ray.pipelines.queries import _POISSON1_CUTS_16

    for k, c in enumerate(_POISSON1_CUTS_16):
        if u < c:
            return k
    return 10


def test_poisson_bootstrap_replays_hash(ray_session, tmp_path):
    """Each replicate's n_eff and mean replay the md5-derived weights
    computed independently here; non-purchase rows never contribute."""
    rows = [(i, 1, i, "purchase", float(i + 1)) for i in range(40)]
    rows += [(100, 1, 0, "click", 999.0)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_poisson_bootstrap

    got = {r["replicate"]: r for r in
           _tab(q_events_poisson_bootstrap(str(tmp_path))).to_pylist()}
    assert sorted(got) == list(range(8))
    for r in range(8):
        wsum = wx = 0
        for i in range(40):
            dig = hashlib.md5(f"{i}\x1fboot".encode()).digest()
            u = int.from_bytes(dig[2 * r:2 * r + 2], "big")
            w = _poisson_weight(u)
            wsum += w
            wx += w * (i + 1) * 100
        assert got[r]["n_eff"] == wsum
        assert got[r]["boot_mean"] == float(wx) / float(wsum) / 100.0


def test_poisson_bootstrap_weights_center_on_one(ray_session, tmp_path):
    """Poisson(1) weights must average ~1: total effective mass within
    15 percent of the corpus size on a 400-row corpus."""
    rows = [(i, 1, i % 100, "purchase", 10.0) for i in range(400)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_poisson_bootstrap

    t = _tab(q_events_poisson_bootstrap(str(tmp_path)))
    for r in t.to_pylist():
        assert 340 <= r["n_eff"] <= 460
        assert r["boot_mean"] == 10.0


def test_permutation_test_separated_vs_null(ray_session, tmp_path):
    """Well-separated groups (purchase 100x click) must give a small
    p-value; identical distributions give p = 1 (every replicate's
    |diff| >= the observed 0)."""
    rows = [(i, 1, i, "purchase", 500.0) for i in range(30)]
    rows += [(100 + i, 2, i, "click", 5.0) for i in range(30)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_permutation_test

    r = _tab(q_events_permutation_test(str(tmp_path))).to_pylist()[0]
    assert (r["n_purchase"], r["n_click"]) == (30, 30)
    assert r["diff_obs"] == 495.0
    assert r["n_valid"] == 32
    assert r["p_value"] <= 3.0 / 33.0

    rows = [(i, 1, i, "purchase", 7.0) for i in range(20)]
    rows += [(100 + i, 2, i, "click", 7.0) for i in range(20)]
    _write_events(tmp_path, rows)
    r = _tab(q_events_permutation_test(str(tmp_path))).to_pylist()[0]
    assert r["diff_obs"] == 0.0
    assert r["n_extreme"] == r["n_valid"]
    assert r["p_value"] == float(r["n_valid"] + 1) / float(r["n_valid"] + 1)


def test_permutation_test_replays_bits(ray_session, tmp_path):
    """n_extreme replays the md5 bit-assignment computed independently
    here (exact cross-multiplied integer comparison)."""
    vals = [3.0, 9.0, 4.0, 12.0, 5.0, 1.0]
    rows = [(i, 1, i, "purchase" if i % 2 == 0 else "click", v)
            for i, v in enumerate(vals)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_permutation_test

    r = _tab(q_events_permutation_test(str(tmp_path))).to_pylist()[0]
    cents = [int(v * 100) for v in vals]
    ga = [1 if i % 2 == 0 else 0 for i in range(6)]
    us = [int(hashlib.md5(f"{i}\x1fperm".encode()).hexdigest()[:8], 16)
          for i in range(6)]
    n, s = 6, sum(cents)
    n1o, s1o = sum(ga), sum(g * c for g, c in zip(ga, cents))
    n2o, s2o = n - n1o, s - s1o
    obs = abs(s1o * n2o - s2o * n1o)
    nv = ne = 0
    for j in range(32):
        bits = [(u >> j) & 1 for u in us]
        n1p = sum(bits)
        s1p = sum(b * c for b, c in zip(bits, cents))
        n2p, s2p = n - n1p, s - s1p
        if n1p == 0 or n2p == 0:
            continue
        nv += 1
        if abs(s1p * n2p - s2p * n1p) * (n1o * n2o) >= obs * (n1p * n2p):
            ne += 1
    assert (r["n_valid"], r["n_extreme"]) == (nv, ne)
    assert r["p_value"] == float(ne + 1) / float(nv + 1)


def test_multireg_exact_plane(ray_session, tmp_path):
    """Noise-free plane y = 10000 + 500*qty + 300*discpct (cents) must
    be recovered EXACTLY: Cramer's determinant ratios are integers
    small enough that the final float division is exact."""
    import numpy as np

    qty = [1, 2, 3, 4, 5, 6, 7, 8, 2, 9]
    dpc = [0, 1, 2, 0, 1, 2, 0, 1, 2, 1]
    price = [(10000 + 500 * a + 300 * b) / 100.0
             for a, b in zip(qty, dpc)]
    n = len(qty)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(range(n), pa.int64()),
        "l_partkey": pa.array([1] * n, pa.int64()),
        "l_suppkey": pa.array([1] * n, pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array([float(x) for x in qty], pa.float64()),
        "l_extendedprice": pa.array(price, pa.float64()),
        "l_discount": pa.array([b / 100.0 for b in dpc], pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array(["N"] * n, pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array(
            [np.datetime64("1995-01-01", "us")] * n, pa.timestamp("us")),
    }), str(tmp_path / "lineitem.parquet"))
    from ocr_engine_ray.pipelines.queries import q_lineitem_multireg

    r = _tab(q_lineitem_multireg(str(tmp_path))).to_pylist()[0]
    assert r["n_rows"] == n
    assert r["intercept_cents"] == 10000.0
    assert r["per_qty_cents"] == 500.0
    assert r["per_discpct_cents"] == 300.0


def test_int8_recall_well_separated(ray_session, tmp_path):
    """Well-separated axis-aligned clusters survive int8 quantization:
    recall@5 = 1 for every query.  16 vectors in 4 orthogonal groups
    of 4 (unique per-vector jitter on a shared axis); vec_id < 8 are
    the queries."""
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = []
    for i in range(16):
        v = np.zeros(64, np.float32)
        axis = i % 4
        v[axis * 16:(axis + 1) * 16] = \
            (1.0 + 0.01 * rng.rand(16)).astype(np.float32)
        vecs.append(v)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(16), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([i % 4 for i in range(16)], pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    from ocr_engine_ray.pipelines.queries import q_embeddings_int8_recall

    rows = _tab(q_embeddings_int8_recall(str(tmp_path))).to_pylist()
    assert sorted(r["query_id"] for r in rows) == list(range(8))
    for r in rows:
        assert r["n_overlap"] == 5
        assert r["recall"] == 1.0


def test_user_path_agg_ordering(ray_session, tmp_path):
    """Path respects (ts, event_id) order including a same-timestamp
    tie broken by event_id."""
    rows = [
        (5, 1, 10, "view", 1.0),
        (2, 1, 10, "click", 1.0),      # same ts as event 5: id order
        (9, 1, 20, "purchase", 1.0),
        (1, 2, 5, "view", 1.0),
    ]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_user_path_agg

    got = {r["user_id"]: r for r in
           _tab(q_events_user_path_agg(str(tmp_path))).to_pylist()}
    assert got[1]["path"] == "click>view>purchase"
    assert got[1]["n_events"] == 3
    assert got[2]["path"] == "view"


def test_snm_pairs_match_bruteforce(ray_session, tmp_path):
    """Distributed sorted-neighborhood pairs (range partitions + ghost
    tails) equal the brute-force single-machine window join — every
    cross-boundary pair appears exactly once."""
    import numpy as np

    n = 40
    names = [f"Name#{(i * 7919) % 97:03d}" for i in range(n)]
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(n), pa.int64()),
        "c_name": pa.array(names, pa.string()),
        "c_nationkey": pa.array([i % 5 for i in range(n)], pa.int32()),
        "c_acctbal": pa.array([0.0] * n, pa.float64()),
        "c_mktsegment": pa.array(["A"] * n, pa.string()),
    }), str(tmp_path / "customer.parquet"))
    from ocr_engine_ray.pipelines.queries import q_customers_snm_pairs

    got = sorted(
        (r["name_a"], r["name_b"], r["rank_gap"], r["same_nation"])
        for r in _tab(q_customers_snm_pairs(str(tmp_path))).to_pylist())

    order = sorted(range(n), key=lambda i: (names[i], i))
    want = []
    for i in range(n):
        for d in range(1, 4):
            if i + d >= n:
                break
            a, b = order[i], order[i + d]
            want.append((names[a], names[b], d,
                         int((a % 5) == (b % 5))))
    assert got == sorted(want)


def test_temporal_split_embargo(ray_session, tmp_path):
    """10 days, 10 events each: the 70 %-volume cutoff is day 7
    (1-indexed), days 8-9 are purged, day 10 is test."""
    rows = []
    eid = 0
    for d in range(10):
        for k in range(10):
            rows.append((eid, 1, d * DAY_MIN_H + k, "view", 1.0))
            eid += 1
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_temporal_split

    got = {r["split"]: r for r in
           _tab(q_events_temporal_split(str(tmp_path))).to_pylist()}
    assert got["train"]["n_events"] == 70
    assert got["train"]["n_days"] == 7
    assert got["purged"]["n_events"] == 20
    assert got["purged"]["n_days"] == 2
    assert got["test"]["n_events"] == 10
    assert got["test"]["n_days"] == 1


DAY_MIN_H = 24 * 60


def test_cuped_reduces_to_raw_when_uncorrelated(ray_session, tmp_path):
    """If every user has identical pre-period X, var(X) = 0 -> theta
    pins to 0 and the adjusted means equal the raw means."""
    rows = []
    # pre period (days 0-4): every user spends exactly 10.00
    for u in range(4):
        rows.append((u, u, u * 60, "view", 10.0))
    # post period (days 6-9): purchases differ by arm
    for u in range(4):
        rows.append((100 + u, u, 8 * DAY_MIN_H + u * 60, "purchase",
                     20.0 if u % 2 == 0 else 40.0))
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_cuped

    got = {r["arm"]: r for r in
           _tab(q_events_cuped(str(tmp_path))).to_pylist()}
    assert got[0]["theta"] == 0.0
    assert got[0]["mean_y"] == got[0]["mean_y_adj"] == 20.0
    assert got[1]["mean_y"] == got[1]["mean_y_adj"] == 40.0


def test_cuped_removes_covariate_shift(ray_session, tmp_path):
    """Y = X exactly (every post purchase equals the user's pre spend):
    theta = 1 and the adjusted means equalize across arms at the
    global pre mean."""
    pre = {0: 10.0, 1: 30.0, 2: 20.0, 3: 40.0}
    rows = []
    for u, v in pre.items():
        rows.append((u, u, u * 60, "view", v))
        rows.append((100 + u, u, 8 * DAY_MIN_H + u * 60, "purchase", v))
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_cuped

    got = {r["arm"]: r for r in
           _tab(q_events_cuped(str(tmp_path))).to_pylist()}
    assert got[0]["theta"] == 1.0
    # global pre mean = 25.00: both arms adjust exactly onto it
    assert got[0]["mean_y_adj"] == 25.0
    assert got[1]["mean_y_adj"] == 25.0
    assert got[0]["mean_y"] == 15.0 and got[1]["mean_y"] == 35.0

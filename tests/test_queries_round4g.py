"""Planted-corpus semantic tests for the round-4 session-9 batch:
Wilson interval coverage behavior, Cohen's d sign/magnitude, the
two-proportion z pooling rule, and the seasonal-index normalization.
Bit-exactness vs DuckDB is pinned by the contract sweep; these pin the
SEMANTICS on hand-checkable corpora.
"""

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


def test_wilson_ci_planted(ray_session, tmp_path):
    """Type 'a': 1 of 4 events on a weekend (Jan 6 2024 = Saturday).
    The Wilson interval must bracket p̂ = 0.25 and match the closed
    form computed independently here."""
    rows = [
        (1, 1, 0 * DAY_MIN, "a", 1.0),          # Mon
        (2, 1, 1 * DAY_MIN, "a", 1.0),          # Tue
        (3, 1, 2 * DAY_MIN, "a", 1.0),          # Wed
        (4, 1, 5 * DAY_MIN, "a", 1.0),          # Sat
        (5, 2, 6 * DAY_MIN, "b", 1.0),          # Sun
    ]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_wilson_ci

    out = {r["event_type"]: r for r in
           _tab(q_events_wilson_ci(str(tmp_path))).to_pylist()}
    a = out["a"]
    assert a["n_events"] == 4 and a["n_weekend"] == 1
    assert a["p_weekend"] == 0.25
    n, p, z = 4.0, 0.25, 1.96
    denom = 1.0 + z * z / n
    center = (p + z * z / (2.0 * n)) / denom
    half = z * math.sqrt(p * (1.0 - p) / n
                         + z * z / (4.0 * n * n)) / denom
    assert abs(a["ci_lo"] - (center - half)) < 1e-12
    assert abs(a["ci_hi"] - (center + half)) < 1e-12
    assert a["ci_lo"] < 0.25 < a["ci_hi"]
    # a one-sided type (all weekend) keeps a CI strictly inside [0,1]
    b = out["b"]
    assert b["p_weekend"] == 1.0 and b["ci_lo"] > 0.0 \
        and b["ci_hi"] <= 1.0


def test_cohens_d_planted(ray_session, tmp_path):
    """purchase values {10,12}, view values {1,3}: means 11 vs 2 in
    dollars (1100 vs 200 cents), both variances 2 cents^2-scaled, so
    d = 900 / sqrt(20000) in cents exactly."""
    rows = [
        (1, 1, 0, "purchase", 10.0),
        (2, 1, 1, "purchase", 12.0),
        (3, 1, 2, "view", 1.0),
        (4, 1, 3, "view", 3.0),
        (5, 1, 4, "click", 99.0),   # other types must not contribute
    ]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_cohens_d

    row = _tab(q_events_cohens_d(str(tmp_path))).to_pylist()[0]
    assert row["n_purchase"] == 2 and row["n_view"] == 2
    assert row["mean_purchase_cents"] == 1100.0
    assert row["mean_view_cents"] == 200.0
    # var = 20000 cents^2 for both groups; pooled = 20000
    assert abs(row["cohens_d"] - 900.0 / math.sqrt(20000.0)) < 1e-12


def test_weekend_ztest_planted(ray_session, tmp_path):
    """Weekend: 1 purchase of 2 events; weekday: 1 purchase of 4.
    Pooled p = 2/6; z from the standard pooled formula."""
    rows = [
        (1, 1, 0 * DAY_MIN, "purchase", 1.0),   # Mon
        (2, 1, 1 * DAY_MIN, "view", 1.0),
        (3, 1, 2 * DAY_MIN, "view", 1.0),
        (4, 1, 3 * DAY_MIN, "view", 1.0),
        (5, 1, 5 * DAY_MIN, "purchase", 1.0),   # Sat
        (6, 1, 6 * DAY_MIN, "view", 1.0),       # Sun
    ]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_weekend_ztest

    row = _tab(q_events_weekend_ztest(str(tmp_path))).to_pylist()[0]
    assert (row["n_weekend"], row["k_weekend"]) == (2, 1)
    assert (row["n_weekday"], row["k_weekday"]) == (4, 1)
    p1, p2, pp = 0.5, 0.25, 2.0 / 6.0
    se = math.sqrt(pp * (1.0 - pp) * (1.0 / 2.0 + 1.0 / 4.0))
    assert abs(row["z_two_prop"] - (p1 - p2) / se) < 1e-12


def test_dow_seasonality_planted(ray_session, tmp_path):
    """Two Mondays, one Saturday: Monday index = (2/3)*7, shares sum
    to 1, and absent days emit no rows (count semantics, not
    gap-fill)."""
    rows = [
        (1, 1, 0 * DAY_MIN, "a", 1.0),           # Mon Jan 1
        (2, 1, 7 * DAY_MIN, "a", 1.0),           # Mon Jan 8
        (3, 1, 5 * DAY_MIN, "a", 1.0),           # Sat Jan 6
    ]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_dow_seasonality

    out = {r["isodow"]: r for r in
           _tab(q_events_dow_seasonality(str(tmp_path))).to_pylist()}
    assert set(out) == {1, 6}
    assert out[1]["n_events"] == 2
    assert abs(out[1]["seasonal_index"] - (2.0 / 3.0) * 7.0) < 1e-12
    assert abs(sum(r["share"] for r in out.values()) - 1.0) < 1e-12


def test_seasonal_adjust_planted(ray_session, tmp_path):
    """Mondays carry 2 events, every other day 1, over two full weeks
    (14 days): Monday's index = (4/16)*7 = 1.75, other days
    (2/16)*7 = 0.875; adjusted = n / index recovers a flat series
    (16/14 everywhere)."""
    rows = []
    eid = 0
    for d in range(14):            # 2024-01-01 (Mon) .. 2024-01-14
        k = 2 if d % 7 == 0 else 1
        for j in range(k):
            eid += 1
            rows.append((eid, 1, d * DAY_MIN + j, "a", 1.0))
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_seasonal_adjust

    out = _tab(q_events_seasonal_adjust(str(tmp_path))).to_pylist()
    assert len(out) == 14
    for r in out:
        if r["isodow"] == 1:
            assert r["n_events"] == 2
            assert abs(r["seasonal_index"] - 1.75) < 1e-12
        else:
            assert r["n_events"] == 1
            assert abs(r["seasonal_index"] - 0.875) < 1e-12
        assert abs(r["adjusted_events"] - 16.0 / 14.0) < 1e-12


def test_wow_growth_planted(ray_session, tmp_path):
    """Weekly counts 10, 20, 10 -> growth rows (+1.0, -0.5); the first
    week is dropped (no predecessor)."""
    rows = []
    eid = 0
    for w, k in enumerate((10, 20, 10)):
        for j in range(k):
            eid += 1
            rows.append((eid, 1, w * 7 * DAY_MIN + j, "a", 1.0))
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_wow_growth

    out = _tab(q_events_wow_growth(str(tmp_path))).to_pylist()
    assert [(r["n_events"], r["prev_events"], r["wow_growth"])
            for r in out] == [(20, 10, 1.0), (10, 20, -0.5)]


def test_nb_classify_planted(ray_session, tmp_path):
    """Two sources with disjoint vocabularies classify perfectly
    (diagonal confusion matrix); a third source whose lone doc is
    written in source-a vocabulary is attributed to the class that
    actually generated the words."""
    import pyarrow.parquet as pq

    docs = [
        (1, "a", "alpha beta alpha gamma"),
        (2, "a", "beta beta gamma alpha"),
        (3, "b", "delta epsilon delta zeta"),
        (4, "b", "epsilon zeta zeta delta"),
        (5, "c", "alpha beta gamma alpha"),   # a-vocab text, source c
    ]
    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "source": pa.array([d[1] for d in docs], pa.string()),
        "text": pa.array([d[2] for d in docs], pa.string()),
    }), str(tmp_path / "documents.parquet"))
    from ocr_engine_ray.pipelines.queries import q_documents_nb_classify

    out = {(r["source"], r["predicted"]): r["n_docs"]
           for r in _tab(q_documents_nb_classify(str(tmp_path)))
           .to_pylist()}
    assert out[("a", "a")] == 2
    assert out[("b", "b")] == 2
    # the c doc's words all come from class a's likelihood table;
    # class c saw them once each too, but a's higher counts win
    assert out[("c", "a")] == 1
    assert ("a", "b") not in out and ("b", "a") not in out


def _write_docs(tmp_path, docs):
    """docs: (doc_id, source, text)."""
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "source": pa.array([d[1] for d in docs], pa.string()),
        "text": pa.array([d[2] for d in docs], pa.string()),
    }), str(tmp_path / "documents.parquet"))


def test_js_divergence_planted(ray_session, tmp_path):
    """A source distributed exactly like the corpus has JS ~ 0; a
    source with vocabulary disjoint from the rest scores strictly
    higher, bounded by ln 2."""
    _write_docs(tmp_path, [
        (1, "mirror", "x y x y"),
        (2, "mirror", "x y x y"),
        (3, "alien", "zz ww zz ww"),
    ])
    from ocr_engine_ray.pipelines.queries import q_documents_js_divergence

    out = {r["source"]: r for r in
           _tab(q_documents_js_divergence(str(tmp_path))).to_pylist()}
    assert out["mirror"]["n_tokens"] == 8
    assert out["alien"]["n_tokens"] == 4
    # mirror's unigram dist (.5/.5 on x,y) vs corpus (1/3 each on
    # x,y + 1/6 each on zz,ww): small but nonzero; alien much larger
    assert 0.0 < out["mirror"]["js_vs_corpus"] \
        < out["alien"]["js_vs_corpus"] <= math.log(2.0) + 1e-9


def test_markov_stationary_planted(ray_session, tmp_path):
    """One user alternating a,b,a,b...: the chain is a deterministic
    2-cycle with stationary distribution (1/2, 1/2)."""
    rows = [(i + 1, 1, i, "a" if i % 2 == 0 else "b", 1.0)
            for i in range(10)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_markov_stationary

    out = {r["event_type"]: r["pi"] for r in
           _tab(q_events_markov_stationary(str(tmp_path))).to_pylist()}
    assert set(out) == {"a", "b"}
    assert abs(out["a"] - 0.5) < 1e-9
    assert abs(out["b"] - 0.5) < 1e-9


def test_markov_stationary_dangling(ray_session, tmp_path):
    """A state that is never a predecessor (the stream's last-only
    type) redistributes uniformly instead of absorbing all mass."""
    # a -> a -> b  (b has no outgoing edge)
    rows = [(1, 1, 0, "a", 1.0), (2, 1, 1, "a", 1.0),
            (3, 1, 2, "b", 1.0)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_markov_stationary

    out = {r["event_type"]: r["pi"] for r in
           _tab(q_events_markov_stationary(str(tmp_path))).to_pylist()}
    # P = [[.5,.5],[.5,.5]] effectively: a stays/leaves evenly, b
    # fans back uniformly -> stationary (2/3, 1/3) solves pi=piP with
    # P=[[1/2,1/2],[1/2,1/2]]? no: a: 2 transitions (a->a, a->b) each
    # 1/2; b uniform over {a,b} each 1/2 -> symmetric -> (1/2, 1/2)
    assert abs(out["a"] - 0.5) < 1e-6
    assert abs(out["b"] - 0.5) < 1e-6


def test_sentence_stats_planted(ray_session, tmp_path):
    """Hand-counted sentences: trims spaces, drops empty pieces,
    counts unicode chars."""
    _write_docs(tmp_path, [
        (1, "s1", "Hello world. How are you?  Fine!"),
        (2, "s1", "One sentence"),
        (3, "s2", "..."),                 # zero sentences -> s2 absent
    ])
    from ocr_engine_ray.pipelines.queries import q_documents_sentence_stats

    out = {r["source"]: r for r in
           _tab(q_documents_sentence_stats(str(tmp_path))).to_pylist()}
    assert set(out) == {"s1"}
    r = out["s1"]
    # sentences: 'Hello world' (11), 'How are you' (11), 'Fine' (4),
    # 'One sentence' (12)
    assert r["n_docs"] == 2
    assert r["n_sentences"] == 4
    assert abs(r["avg_sentence_chars"] - 38.0 / 4.0) < 1e-12
    assert abs(r["sentences_per_doc"] - 2.0) < 1e-12


def test_rrf_fusion_planted(ray_session, tmp_path):
    """Vectors engineered so cosine and dot-product rank DIFFERENTLY:
    a long vector aligned with the query wins dot; a short unit vector
    in the same direction wins cosine equally — RRF rewards the one
    appearing high in BOTH lists."""
    import pyarrow.parquet as pq

    # query 0 = e1.  candidates: 10 = e1 (tiny norm, cos=1, dot small),
    # 11 = 100*e1 (cos=1, dot huge), 12 = orthogonal.
    vecs = {
        0: [1.0, 0.0], 1: [0.0, 1.0], 2: [1.0, 1.0], 3: [0.5, 0.5],
        4: [1.0, 2.0], 5: [2.0, 1.0], 6: [3.0, 0.1], 7: [0.1, 3.0],
        10: [0.01, 0.0], 11: [100.0, 0.0], 12: [0.0, 5.0],
    }
    ids = sorted(vecs)
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([vecs[i] for i in ids],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    from ocr_engine_ray.pipelines.queries import q_embeddings_rrf_fusion

    rows = _tab(q_embeddings_rrf_fusion(str(tmp_path))).to_pylist()
    q0 = {r["vec_id"]: r for r in rows if r["query_id"] == 0}
    # 11 tops the dot list and ties the cos list -> near the top;
    # 12 (orthogonal: worst in both lists) misses the top-10 cut
    # entirely (11 candidates, OUT_K=10)
    assert 11 in q0 and q0[11]["rank"] <= 3
    assert 12 not in q0
    # every rrf score is a sum of at most two 1/(60+r) terms
    for r in rows:
        assert 0.0 < r["rrf"] <= 2.0 / 61.0 + 1e-12


def test_daily_holt_planted(ray_session, tmp_path):
    """A perfectly linear series y = 10, 20, 30, ...: Holt's level
    locks onto the series and the trend converges toward the true
    slope; the exact first steps are hand-replayed."""
    rows = []
    eid = 0
    for d in range(8):
        for j in range(10 * (d + 1)):
            eid += 1
            rows.append((eid, 1, d * DAY_MIN + j, "a", 1.0))
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_daily_holt

    out = _tab(q_events_daily_holt(str(tmp_path))).to_pylist()
    out.sort(key=lambda r: r["day"])
    assert [r["n_events"] for r in out] == [10 * (d + 1)
                                            for d in range(8)]
    # day 1: l=10, b=0.  day 2: l=(20+10)/2=15, b=(5+0)/2=2.5
    assert out[0]["level"] == 10.0 and out[0]["trend"] == 0.0
    assert out[1]["level"] == 15.0 and out[1]["trend"] == 2.5
    assert out[1]["forecast_next"] == 17.5
    # trend converges toward the true slope 10 (overshoot allowed:
    # the 0-seeded trend oscillates before settling)
    assert 8.0 < out[-1]["trend"] < 12.0


def test_logit_purchase_planted(ray_session, tmp_path):
    """A corpus where purchases happen ONLY on weekends: the weekend
    weight must come out strongly positive, the evening weight ~0 (no
    evening signal), and the loss far below the ln 2 of an
    uninformed model."""
    rows = []
    eid = 0
    for rep in range(30):
        # weekdays: views at noon (x1=0, x2=0, y=0)
        rows.append((eid := eid + 1, 1, rep * 7 * DAY_MIN + 12 * 60,
                     "view", 1.0))
        # weekends (Sat): purchases at noon (x1=1, x2=0, y=1)
        rows.append((eid := eid + 1, 1,
                     (rep * 7 + 5) * DAY_MIN + 12 * 60,
                     "purchase", 1.0))
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_logit_purchase

    r = _tab(q_events_logit_purchase(str(tmp_path))).to_pylist()[0]
    assert r["n_events"] == 60
    assert r["w_weekend"] > 1.0
    assert r["w_evening"] == 0.0
    assert 0.0 < r["log_loss"] < math.log(2.0)


def test_golden_record_planted(ray_session, tmp_path):
    """Three records 'Ann'/'Anna'(ed 1, same nation), 'Bob' isolated;
    'Anne' in ANOTHER nation must NOT join the Ann cluster despite
    ed 1 to 'Anna' — the blocking rule.  Survivorship rules checked
    member-by-member."""
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_name": pa.array(["Ann", "Anna", "Bob", "Anne"], pa.string()),
        "c_nationkey": pa.array([7, 7, 7, 9], pa.int64()),
        "c_acctbal": pa.array([10.0, 25.5, 3.0, 99.0], pa.float64()),
        "c_mktsegment": pa.array(["AUTO", "BUILDING", "AUTO", "AUTO"],
                                 pa.string()),
    }), str(tmp_path / "customer.parquet"))
    from ocr_engine_ray.pipelines.queries import q_customers_golden_record

    out = {r["rep_name"]: r for r in
           _tab(q_customers_golden_record(str(tmp_path))).to_pylist()}
    assert set(out) == {"Ann", "Bob", "Anne"}
    g = out["Ann"]
    assert g["n_members"] == 2
    assert g["canonical_custkey"] == 1
    assert g["max_acctbal_cents"] == 2550
    assert g["richest_custkey"] == 2
    assert g["top_segment"] == "BUILDING"
    assert out["Anne"]["n_members"] == 1


def test_hour_dow_heatmap_planted(ray_session, tmp_path):
    """Two Monday-noon events and one Monday-18h event: shares within
    the dow are 2/3 and 1/3."""
    rows = [(1, 1, 12 * 60, "a", 1.0), (2, 1, 12 * 60 + 1, "a", 1.0),
            (3, 1, 18 * 60, "a", 1.0)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_hour_dow_heatmap

    out = {(r["isodow"], r["hour"]): r for r in
           _tab(q_events_hour_dow_heatmap(str(tmp_path))).to_pylist()}
    assert out[(1, 12)]["n_events"] == 2
    assert abs(out[(1, 12)]["share_of_dow"] - 2.0 / 3.0) < 1e-12
    assert abs(out[(1, 18)]["share_of_dow"] - 1.0 / 3.0) < 1e-12


def test_silhouette_planted(ray_session, tmp_path):
    """Two tight, well-separated clusters score near 1; mixing one
    vector into the wrong label drags that label's mean down and
    makes the planted misfit's own contribution negative."""
    import pyarrow.parquet as pq

    DIM = 64
    rows = []
    # label 0 around (0,...): 4 vectors at tiny offsets
    for i, off in enumerate((0.0, 0.01, -0.01, 0.02)):
        rows.append((i, 0, [off] + [0.0] * (DIM - 1)))
    # label 1 around (10, ...): 3 vectors
    for i, off in enumerate((0.0, 0.01, -0.01)):
        rows.append((10 + i, 1, [10.0 + off] + [0.0] * (DIM - 1)))
    # misfit: sits at the label-1 centroid but is labeled 0
    rows.append((99, 0, [10.0] + [0.0] * (DIM - 1)))
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "label": pa.array([r[1] for r in rows], pa.int32()),
        "embedding": pa.array([r[2] for r in rows],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    from ocr_engine_ray.pipelines.queries import q_embeddings_silhouette

    out = {r["label"]: r for r in
           _tab(q_embeddings_silhouette(str(tmp_path))).to_pylist()}
    assert out[1]["n_vectors"] == 3
    assert out[1]["mean_silhouette"] > 0.9      # tight & far
    assert out[0]["n_vectors"] == 5
    # the misfit contributes a strongly negative s, pulling label 0
    # well below label 1
    assert out[0]["mean_silhouette"] < out[1]["mean_silhouette"] - 0.2


def test_decision_stump_planted(ray_session, tmp_path):
    """Lengths 10,20 are 'en', 90,100 are 'de': the perfect split is
    any t in [20, 90) -> smallest distinct value 20; weighted Gini 0."""
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "n_chars": pa.array([10, 20, 90, 100], pa.int64()),
        "lang": pa.array(["en", "en", "de", "de"], pa.string()),
    }), str(tmp_path / "documents.parquet"))
    from ocr_engine_ray.pipelines.queries import q_documents_decision_stump

    r = _tab(q_documents_decision_stump(str(tmp_path))).to_pylist()[0]
    assert r["split_threshold"] == 20
    assert r["n_left"] == 2 and r["n_right"] == 2
    assert r["weighted_gini"] == 0.0
    assert abs(r["baseline_gini"] - 0.5) < 1e-12


def test_weekly_churn_planted(ray_session, tmp_path):
    """Week 1 actives {1,2,3}; week 2 actives {2,3,4,5}: retained 2,
    new 2, churned 1, rate 1/3.  Week 1 itself emits no row (no
    observed previous week)."""
    rows = []
    eid = 0
    for u in (1, 2, 3):
        eid += 1
        rows.append((eid, u, 0, "a", 1.0))
    for u in (2, 3, 4, 5):
        eid += 1
        rows.append((eid, u, 7 * DAY_MIN, "a", 1.0))
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_weekly_churn

    out = _tab(q_events_weekly_churn(str(tmp_path))).to_pylist()
    assert len(out) == 1
    r = out[0]
    assert (r["n_active"], r["n_retained"], r["n_new"],
            r["n_churned"]) == (4, 2, 2, 1)
    assert abs(r["churn_rate"] - 1.0 / 3.0) < 1e-12


def test_entropy_rate_planted(ray_session, tmp_path):
    """Deterministic alternation a,b,a,b...: every transition is
    certain, so the entropy rate is exactly 0."""
    rows = [(i + 1, 1, i, "a" if i % 2 == 0 else "b", 1.0)
            for i in range(12)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_entropy_rate

    r = _tab(q_events_entropy_rate(str(tmp_path))).to_pylist()[0]
    assert r["n_states"] == 2
    assert abs(r["entropy_rate_nats"]) < 1e-9
    assert abs(r["max_entropy_nats"] - math.log(2.0)) < 1e-12


def test_hubness_planted(ray_session, tmp_path):
    """8 near-collinear vectors: the 5-NN graph's in-degree histogram
    must cover every vector and carry exactly 8x5 units of degree."""
    DIM = 64
    rows = [(0, [1.0] + [0.0] * (DIM - 1))]            # hub
    for i in range(7):                                  # spokes
        v = [1.0] + [0.0] * (DIM - 1)
        v[1 + i] = 0.3
        rows.append((i + 1, v))
    pq.write_table(pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(rows), pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    from ocr_engine_ray.pipelines.queries import q_embeddings_hubness

    out = {r["in_degree"]: r["n_vectors"] for r in
           _tab(q_embeddings_hubness(str(tmp_path))).to_pylist()}
    # with k=5 of only 7 candidates most vectors are near-universal
    # neighbors; the invariants that must hold exactly:
    assert sum(out.values()) == 8                       # every vector
    assert sum(d * n for d, n in out.items()) == 40     # 8 queries x 5
    assert max(out) == 7                                # true hubs


def test_mann_kendall_planted(ray_session, tmp_path):
    """Strictly increasing daily counts: S = C(m,2) pairs all +1,
    no ties, z = (S-1)/sqrt(m(m-1)(2m+5)/18)."""
    rows = []
    eid = 0
    for d in range(6):
        for j in range(d + 1):
            eid += 1
            rows.append((eid, 1, d * DAY_MIN + j, "a", 1.0))
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_mann_kendall

    r = _tab(q_events_mann_kendall(str(tmp_path))).to_pylist()[0]
    m = 6
    assert r["n_days"] == m
    assert r["s_stat"] == m * (m - 1) // 2
    var = m * (m - 1) * (2 * m + 5) / 18.0
    assert abs(r["var_s"] - var) < 1e-12
    assert abs(r["z_mk"] - (r["s_stat"] - 1.0) / math.sqrt(var)) \
        < 1e-12


def test_dupe_audit_planted(ray_session, tmp_path):
    """Customer 1 orders twice on the same day (identical totals —
    the replay signature); customer 2 orders on two different days
    (clean)."""
    base = np.datetime64("2024-03-01T00:00:00", "us")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 101, 200, 201], pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 2], pa.int64()),
        "o_orderdate": pa.array(
            [base, base, base, base + np.timedelta64(86400_000_000,
                                                     "us")],
            pa.timestamp("us")),
        "o_totalprice": pa.array([50.0, 50.0, 70.0, 80.0],
                                 pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    from ocr_engine_ray.pipelines.queries import q_orders_dupe_audit

    out = _tab(q_orders_dupe_audit(str(tmp_path))).to_pylist()
    assert len(out) == 1
    r = out[0]
    assert r["o_custkey"] == 1 and r["n_orders"] == 2
    assert r["min_total_cents"] == r["max_total_cents"] == 5000
    assert (r["first_orderkey"], r["last_orderkey"]) == (100, 101)


def test_abc_classes_planted(ray_session, tmp_path):
    """Revenues 80, 15, 5 (one lineitem each, no discount): part 1
    alone is exactly the 80% prefix (class A), part 2 reaches 95%
    (B), part 3 is the tail (C) — boundary shares land exactly on the
    integer thresholds."""
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([80.0, 15.0, 5.0], pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
    }), str(tmp_path / "lineitem.parquet"))
    from ocr_engine_ray.pipelines.queries import q_lineitem_abc_classes

    out = {r["abc_class"]: r for r in
           _tab(q_lineitem_abc_classes(str(tmp_path))).to_pylist()}
    assert out["A"]["n_parts"] == 1 and out["A"]["revenue"] == 80.0
    assert out["B"]["n_parts"] == 1 and out["B"]["revenue"] == 15.0
    assert out["C"]["n_parts"] == 1 and out["C"]["revenue"] == 5.0
    assert abs(out["A"]["revenue_share"] - 0.8) < 1e-12


def test_robust_scale_planted(ray_session, tmp_path):
    """Source s1 lengths {10,20,30,40}: quantile_disc picks index
    ceil(n*q)-1 -> q25=10, med=20, q75=30, IQR=20; x=10 scores
    (10-20)/20 = -0.5.  A constant-length source is excluded
    (IQR 0)."""
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "source": ["s1", "s1", "s1", "s1", "flat", "flat"],
        "n_chars": pa.array([10, 20, 30, 40, 7, 7], pa.int64()),
    }), str(tmp_path / "documents.parquet"))
    from ocr_engine_ray.pipelines.queries import q_documents_robust_scale

    out = {r["doc_id"]: r for r in
           _tab(q_documents_robust_scale(str(tmp_path))).to_pylist()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["robust_z"] == (10 - 20) / 20.0
    assert out[4]["robust_z"] == (40 - 20) / 20.0


def test_user_lifespan_planted(ray_session, tmp_path):
    """User 1 spans 2.5 days -> bucket 2; user 2 a single event ->
    bucket 0."""
    rows = [(1, 1, 0, "a", 1.0),
            (2, 1, 2 * DAY_MIN + 12 * 60, "a", 1.0),
            (3, 2, 60, "a", 1.0)]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_user_lifespan

    out = {r["lifespan_days"]: r["n_users"] for r in
           _tab(q_events_user_lifespan(str(tmp_path))).to_pylist()}
    assert out == {0: 1, 2: 1}


def test_signup_to_purchase_planted(ray_session, tmp_path):
    """User 1: purchase BEFORE signup must not count; the one 5h
    after does.  User 2 signs up, never purchases.  Both signed up in
    the same Monday week."""
    rows = [
        (1, 1, 10 * 60, "purchase", 1.0),      # pre-signup purchase
        (2, 1, 20 * 60, "signup", 1.0),
        (3, 1, 25 * 60, "purchase", 1.0),      # +5h
        (4, 2, 30 * 60, "signup", 1.0),
        (5, 2, 40 * 60, "view", 1.0),
    ]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import (
        q_events_signup_to_purchase,
    )

    out = _tab(q_events_signup_to_purchase(str(tmp_path))).to_pylist()
    assert len(out) == 1
    r = out[0]
    assert r["n_signups"] == 2 and r["n_converted"] == 1
    assert r["conversion_rate"] == 0.5
    assert r["avg_hours_to_purchase"] == 5.0


def test_supplier_return_rate_planted(ray_session, tmp_path):
    """Supplier 1: 1 of 2 returned; supplier 2: 0 of 2.  Corpus rate
    1/4 -> supplier 1 flags above, supplier 2 not (exact
    cross-multiply, no float gate)."""
    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_returnflag": pa.array(["R", "N", "N", "A"], pa.string()),
    }), str(tmp_path / "lineitem.parquet"))
    from ocr_engine_ray.pipelines.queries import q_supplier_return_rate

    out = {r["l_suppkey"]: r for r in
           _tab(q_supplier_return_rate(str(tmp_path))).to_pylist()}
    assert out[1]["return_rate"] == 0.5
    assert out[1]["above_corpus_rate"] is True
    assert out[2]["n_returned"] == 0
    assert out[2]["above_corpus_rate"] is False


def test_dedup_loss_by_source_planted(ray_session, tmp_path):
    """'mirror' duplicates a text 'canon' already owns (smaller
    doc_id wins corpus-wide), so mirror drops its copy; unique texts
    survive."""
    _write_docs(tmp_path, [
        (1, "canon", "shared body text"),
        (2, "mirror", "shared body text"),
        (3, "mirror", "original piece"),
    ])
    from ocr_engine_ray.pipelines.queries import (
        q_documents_dedup_loss_by_source,
    )

    out = {r["source"]: r for r in
           _tab(q_documents_dedup_loss_by_source(str(tmp_path)))
           .to_pylist()}
    assert out["canon"]["n_dropped"] == 0
    m = out["mirror"]
    assert m["n_docs"] == 2 and m["n_dropped"] == 1
    assert m["tokens_dropped"] == 3
    assert m["drop_rate"] == 0.5


def test_ltv_triangle_planted(ray_session, tmp_path):
    """Customer 1 first orders in Jan (cohort 2024-01) and again in
    Mar -> ages 0 and 2; customer 2 starts in Feb (age 0).  Month
    arithmetic crosses the year boundary exactly."""
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
        "o_orderdate": pa.array(
            [np.datetime64("2024-01-15", "us"),
             np.datetime64("2024-03-02", "us"),
             np.datetime64("2024-02-20", "us"),
             np.datetime64("2023-12-31", "us")], pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 20.0, 5.0, 7.0],
                                 pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    from ocr_engine_ray.pipelines.queries import q_orders_ltv_triangle

    out = {(r["cohort_month"], r["age_months"]): r for r in
           _tab(q_orders_ltv_triangle(str(tmp_path))).to_pylist()}
    assert out[("2024-01", 0)]["revenue_cents"] == 1000
    assert out[("2024-01", 2)]["revenue_cents"] == 2000
    assert out[("2024-02", 0)]["revenue_cents"] == 500
    assert out[("2023-12", 0)]["revenue_cents"] == 700
    assert len(out) == 4


def test_stickiness_planted(ray_session, tmp_path):
    """3 observed days in one month: DAUs 2, 1, 1 (avg 4/3); MAU = 2
    distinct users -> stickiness (4/3)/2 = 2/3."""
    rows = [
        (1, 1, 0, "a", 1.0), (2, 2, 1, "a", 1.0),        # day 1: u1,u2
        (3, 1, DAY_MIN, "a", 1.0),                        # day 2: u1
        (4, 1, 2 * DAY_MIN, "a", 1.0),                    # day 3: u1
        (5, 1, 2 * DAY_MIN + 1, "a", 1.0),                # dup pair
    ]
    _write_events(tmp_path, rows)
    from ocr_engine_ray.pipelines.queries import q_events_stickiness

    out = _tab(q_events_stickiness(str(tmp_path))).to_pylist()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 3 and r["mau"] == 2
    assert abs(r["avg_dau"] - 4.0 / 3.0) < 1e-12
    assert abs(r["stickiness"] - 2.0 / 3.0) < 1e-12

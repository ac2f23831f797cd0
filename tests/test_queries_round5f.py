"""Independent Python-reference tests for the round-5f wave:
retrieval-backend rank agreement, count-min sketch, verbosity OLS.
"""

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_rank_agreement_consistency(ray_session):
    """Agreement audit must be consistent with the standalone QL
    ranking: for the shared seed-13 query set, the QL top-5 inside
    the agreement fold equals q_documents_query_likelihood's list,
    so overlap == |BM25_top5 ∩ QL_top5| with QL fixed."""
    from ocr_engine_ray.pipelines.queries import (
        q_documents_query_likelihood, q_documents_rank_agreement,
    )

    agree = {r["query_id"]: r for r in
             q_documents_rank_agreement(SF).take_all()}
    ql = {}
    for r in q_documents_query_likelihood(SF).take_all():
        ql.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert set(agree) == set(ql)
    for qid, r in agree.items():
        assert 0 <= r["n_overlap"] <= 5
        un_max = len(ql[qid]) + 5
        assert 0.0 <= r["jaccard"] <= 1.0
        # jaccard consistent with overlap for 5+5 lists
        ov = r["n_overlap"]
        # union is at most 10 and at least max side size
        assert r["jaccard"] >= ov / un_max - 1e-12


def test_count_min_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import q_events_count_min

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id"]).to_pandas()
    exact = ev["user_id"].value_counts().to_dict()

    def pos(u):
        return [int(hashlib.md5(
            f"{u}\x1f{j}".encode()).hexdigest()[:4], 16) % 256
            for j in range(4)]

    sk = np.zeros((4, 256), np.int64)
    for u, c in exact.items():
        for j, p in enumerate(pos(u)):
            sk[j, p] += c
    rows = {r["user_id"]: r for r in
            q_events_count_min(SF).take_all()}
    assert set(rows) == set(exact)
    for u, c in exact.items():
        est = min(sk[j, p] for j, p in enumerate(pos(u)))
        r = rows[u]
        assert r["n_exact"] == c
        assert r["cms_est"] == est
        assert r["overestimate"] == est - c
        # CMS never underestimates
        assert r["cms_est"] >= r["n_exact"]


def test_verbosity_ols_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_verbosity_ols, transcript_paths,
    )

    df = pd.concat([pq.read_table(p).to_pandas()
                    for p in transcript_paths(SF)],
                   ignore_index=True) \
        .sort_values(["conv_id", "turn_idx", "ts"], kind="stable")
    xs, ys = [], []
    for _, g in df.groupby("conv_id", sort=False):
        toks = [len((t or "").split(" ")) for t in g["text"]]
        roles = list(g["role"])
        for i, r in enumerate(roles):
            if r == "assistant":
                xs.append(sum(toks[max(0, i - 3):i]))
                ys.append(toks[i])
    x = np.array(xs, np.float64)
    y = np.array(ys, np.float64)
    n = len(x)
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]

    row = q_transcripts_verbosity_ols(SF).take_all()[0]
    assert row["n_pairs"] == n
    assert abs(row["slope"] - slope) < 1e-9
    assert abs(row["intercept"] - intercept) < 1e-6
    assert abs(row["r2"] - r * r) < 1e-9

"""Independent Python-reference tests for the round-5o wave:
difference-in-differences and embedding isotropy.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_did_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import q_events_did

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts", "value"]) \
        .to_pandas()
    ev = ev[ev["value"].notna()].copy()
    ev["day"] = ev["ts"].dt.floor("D")
    dmin, dmax = ev["day"].min(), ev["day"].max()
    span = (dmax - dmin).days + 1
    cut = dmin + dt.timedelta(days=span // 2)
    ev["cents"] = np.round(ev["value"] * 100).astype(np.int64)
    ev["treat"] = (ev["user_id"] % 2 == 0).astype(int)
    ev["post"] = (ev["day"] >= cut).astype(int)

    cells = {}
    for (t, p), g in ev.groupby(["treat", "post"]):
        cells[(t, p)] = (len(g), int(g["cents"].sum()))

    def mean(t, p):
        n, s = cells.get((t, p), (0, 0))
        return s / n if n else 0.0

    row = q_events_did(SF).take_all()[0]
    assert row["n_ctrl_pre"] == cells[(0, 0)][0]
    assert row["n_ctrl_post"] == cells[(0, 1)][0]
    assert row["n_treat_pre"] == cells[(1, 0)][0]
    assert row["n_treat_post"] == cells[(1, 1)][0]
    for k, want in (("mean_ctrl_pre", mean(0, 0)),
                    ("mean_ctrl_post", mean(0, 1)),
                    ("mean_treat_pre", mean(1, 0)),
                    ("mean_treat_post", mean(1, 1))):
        assert abs(row[k] - want) < 1e-9
    did = (mean(1, 1) - mean(1, 0)) - (mean(0, 1) - mean(0, 0))
    assert abs(row["did_cents"] - did) < 1e-9
    # all four cells must be populated for the estimate to mean much
    assert all(cells[k][0] > 0 for k in cells)


def test_isotropy_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import q_embeddings_isotropy

    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["embedding"]).to_pandas()
    mat = np.array(emb["embedding"].tolist(), np.float64)
    s = mat * 1048576.0
    a = np.abs(s)
    fa = np.floor(a)
    q = (np.sign(s) * np.where(a - fa >= 0.5, fa + 1, fa)) \
        .astype(np.int64)
    n = q.shape[0]
    # brute-force pairwise dot sum (object ints to stay exact)
    G = q @ q.T
    total = int(G.sum())
    diag = int(np.trace(G))
    pd_sum = (total - diag) // 2
    row = q_embeddings_isotropy(SF).take_all()[0]
    assert row["n_vectors"] == n
    assert row["sum_sq_norm"] == diag
    assert row["pair_dot_sum"] == float(pd_sum)
    npairs = n * (n - 1) // 2
    assert abs(row["avg_pair_dot"] - pd_sum / npairs) < 1e-6
    assert abs(row["mean_sq_norm"] - diag / n) < 1e-9

"""Independent Python-reference tests for the round-5n wave:
item-CF cosine and the daily-forecast backtest.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_cf_cosine_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import q_parts_cf_cosine

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]) \
        .to_pandas().drop_duplicates()
    sizes = li.groupby("l_partkey").size().to_dict()
    pairs = {}
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(set(g["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                k = (ps[i], ps[j])
                pairs[k] = pairs.get(k, 0) + 1
    scored = sorted(
        ((w * w * 10 ** 12 // (sizes[a] * sizes[b]), a, b, w)
         for (a, b), w in pairs.items()),
        key=lambda x: (-x[0], x[1], x[2]))[:50]
    rows = sorted(q_parts_cf_cosine(SF).take_all(),
                  key=lambda r: r["rank"])
    assert [(r["cos_q"], r["id_a"], r["id_b"], r["w"])
            for r in rows] == scored
    for r in rows:
        want = r["w"] / np.sqrt(
            float(sizes[r["id_a"]]) * float(sizes[r["id_b"]]))
        assert abs(r["cosine"] - want) < 1e-12
        assert 0 < r["cosine"] <= 1.0


def test_forecast_backtest_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_events_forecast_backtest,
    )

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ev["day"] = ev["ts"].dt.floor("D")
    rows = {r["event_type"]: r for r in
            q_events_forecast_backtest(SF).take_all()}
    for et, g in ev.groupby("event_type"):
        y = g.groupby("day").size().sort_index().to_numpy()
        if len(y) < 9:
            assert et not in rows
            continue
        tgt = y[7:]
        naive = y[6:-1]
        ma_err = 0
        for i in range(7, len(y)):
            ma_err += abs(7 * y[i] - y[i - 7:i].sum())
        r = rows[et]
        assert r["n_days"] == len(y)
        assert r["n_scored"] == len(tgt)
        assert r["naive_abs_err"] == int(np.abs(tgt - naive).sum())
        assert r["ma7_abs_err_x7"] == int(ma_err)
        assert abs(r["naive_mae"]
                   - r["naive_abs_err"] / len(tgt)) < 1e-12
        assert abs(r["ma7_mae"]
                   - r["ma7_abs_err_x7"] / 7 / len(tgt)) < 1e-12

"""Independent Python-reference tests for the round-5l wave:
term burstiness and per-role length quantiles.
"""

import math

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_term_burstiness_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_documents_term_burstiness,
    )

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    cf, df = {}, {}
    for r in docs.itertuples():
        toks = (r.text or "").split(" ")
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    scored = sorted(
        ((cf[t] * 1_000_000 // df[t], t) for t in cf if df[t] >= 5),
        key=lambda x: (-x[0], x[1]))[:20]
    rows = sorted(q_documents_term_burstiness(SF).take_all(),
                  key=lambda r: r["rank"])
    assert [(r["burst_q"], r["tok"]) for r in rows] == scored
    for r in rows:
        assert r["cf"] == cf[r["tok"]]
        assert r["df"] == df[r["tok"]]
        # bursty means cf strictly above df
        assert r["burst_q"] >= 1_000_000


def test_length_quantiles_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_length_quantiles, transcript_paths,
    )

    dfr = pd.concat([pq.read_table(p).to_pandas()
                     for p in transcript_paths(SF)],
                    ignore_index=True)
    rows = {r["role"]: r for r in
            q_transcripts_length_quantiles(SF).take_all()}
    for role, g in dfr.groupby("role"):
        toks = sorted(len((t or "").split(" ")) for t in g["text"])
        n = len(toks)

        def qd(q):
            return toks[max(math.ceil(q * n), 1) - 1]

        r = rows[role]
        assert r["n_turns"] == n
        assert r["p50"] == qd(0.5)
        assert r["p90"] == qd(0.9)
        assert r["p99"] == qd(0.99)
    assert set(rows) == set(dfr["role"])

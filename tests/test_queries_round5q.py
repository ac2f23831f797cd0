"""Independent Python-reference tests for the round-5q wave:
rich-club coefficient and Heaps-law vocabulary growth.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_richclub_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_parts_copurchase_richclub,
    )

    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]) \
        .to_pandas().drop_duplicates()
    edges = set()
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(set(g["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    rows = {r["k"]: r for r in
            q_parts_copurchase_richclub(SF).take_all()}
    assert set(rows) == {2, 4, 8, 16}
    for k, r in rows.items():
        rich = {v for v, d in deg.items() if d > k}
        e = sum(1 for a, b in edges if a in rich and b in rich)
        assert r["n_rich"] == len(rich)
        assert r["e_rich"] == e
        n = len(rich)
        want = 2 * e / (n * (n - 1)) if n > 1 else 0.0
        assert abs(r["phi"] - want) < 1e-12
    # the curve must be monotone-ish informative: phi rises with k
    # on hub-assortative graphs; at minimum the base cell is real
    assert rows[2]["n_rich"] > 1


def test_vocab_growth_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_documents_vocab_growth,
    )

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id")
    stream = []
    for t in docs["text"]:
        stream.extend((t or "").split(" "))
    total = len(stream)
    cps = []
    c = 256
    while c < total:
        cps.append(c)
        c *= 4
    cps.append(total)
    rows = {r["checkpoint"]: r["vocab"] for r in
            q_documents_vocab_growth(SF).take_all()}
    assert sorted(rows) == cps
    for cp in cps:
        assert rows[cp] == len(set(stream[:cp]))
    # Heaps: non-decreasing, sub-linear (the sf0.001 template
    # vocabulary saturates before the first checkpoint, so the curve
    # may be entirely flat here; growth is visible at sf0.01+)
    vals = [rows[cp] for cp in cps]
    assert all(a <= b for a, b in zip(vals, vals[1:]))
    assert vals[-1] < total

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


def test_case_profile_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_case_profile, transcript_paths,
    )

    df = pd.concat([pq.read_table(p).to_pandas()
                    for p in transcript_paths(SF)],
                   ignore_index=True)
    ref = {}
    for _, row in df.iterrows():
        t = row["text"] or ""
        up = sum(1 for ch in t if "A" <= ch <= "Z")
        lo = sum(1 for ch in t if "a" <= ch <= "z")
        st = ref.setdefault(row["role"], [0, 0, 0, 0])
        st[0] += 1
        st[1] += up
        st[2] += up + lo
        st[3] += 1 if (up + lo > 0 and 2 * up > up + lo) else 0
    rows = {r["role"]: r for r in
            q_transcripts_case_profile(SF).take_all()}
    assert set(rows) == set(ref)
    for role, (n, u, le, sh) in ref.items():
        r = rows[role]
        assert r["n_turns"] == n
        assert r["n_upper"] == u
        assert r["n_letters"] == le
        assert r["n_shouty_turns"] == sh
        assert abs(r["upper_ratio"] - u / le) < 1e-12
    assert sum(st[1] for st in ref.values()) > 0


def test_hour_entropy_reference(ray_session):
    import math

    from ocr_engine_ray.pipelines.queries import q_events_hour_entropy

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts"]).to_pandas()
    ev["hour"] = ev["ts"].dt.hour
    rows = {r["event_type"]: r for r in
            q_events_hour_entropy(SF).take_all()}
    for et, g in ev.groupby("event_type"):
        cnt = g.groupby("hour").size()
        n = len(g)
        # loose reference: plain Shannon entropy within 1e-4 of the
        # quantized-ln report
        ent = -(sum((c / n) * math.log(c / n) for c in cnt))
        r = rows[et]
        assert r["n_events"] == n
        assert r["n_hours"] == len(cnt)
        assert abs(r["hour_entropy"] - ent) < 1e-4
        assert 0 <= r["hour_entropy"] <= math.log(24) + 1e-9

"""Independent Python-reference tests for the round-5c wave:
modularity, per-node clustering coefficient, exact higher moments,
and conversation turn-set jaccard.  Bit-exactness vs DuckDB is pinned
by the contract sweep; these pin SEMANTICS against brute-force
references.
"""

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _basket_graph():
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    edges = {}
    for _, g in li.drop_duplicates().groupby("l_orderkey"):
        ps = sorted(set(g["l_partkey"]))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                k = (ps[i], ps[j])
                edges[k] = edges.get(k, 0) + 1
    return edges


def test_modularity_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_parts_copurchase_modularity,
    )

    edges = _basket_graph()
    m = len(edges)
    # union-find over strong (w>=3) edges
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for (a, b), w in edges.items():
        if w >= 3:
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted({x for e in edges for x in e})
    rep = {v: find(v) if v in parent else v for v in nodes}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    intra = sum(1 for a, b in edges if rep[a] == rep[b])
    dc = {}
    for v in nodes:
        dc[rep[v]] = dc.get(rep[v], 0) + deg[v]
    lc = {}
    for a, b in edges:
        if rep[a] == rep[b]:
            lc[rep[a]] = lc.get(rep[a], 0) + 1
    q_ref = sum(lc.get(r, 0) / m - (d / (2 * m)) ** 2
                for r, d in dc.items())

    row = q_parts_copurchase_modularity(SF).take_all()[0]
    assert row["n_nodes"] == len(nodes)
    assert row["m_edges"] == m
    assert row["intra_edges"] == intra
    assert row["n_communities"] == len(dc)
    assert abs(row["modularity"] - q_ref) < 1e-9
    # partition quality must beat the null model's zero baseline here
    assert row["modularity"] != 0.0


def test_clustering_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_parts_copurchase_clustering,
    )

    edges = _basket_graph()
    eset = set(edges)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = {r["p"]: r for r in
            q_parts_copurchase_clustering(SF).take_all()}
    assert set(rows) == set(adj)
    for v, nb in adj.items():
        t = 0
        ns = sorted(nb)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                if (ns[i], ns[j]) in eset:
                    t += 1
        r = rows[v]
        assert r["degree"] == len(nb)
        assert r["n_triangles"] == t
        d = len(nb)
        want = (2 * t * 1_000_000) // (d * (d - 1)) if d >= 2 else 0
        assert r["clustering_q"] == want
    assert any(r["n_triangles"] > 0 for r in rows.values())


def test_value_moments_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_events_value_moments,
    )

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    ev = ev[ev["value"].notna()]
    rows = {r["event_type"]: r for r in
            q_events_value_moments(SF).take_all()}
    for et, g in ev.groupby("event_type"):
        c = np.round(g["value"].to_numpy() * 100).astype(np.int64) \
            .astype(np.float64)
        r = rows[et]
        assert r["n_values"] == len(c)
        assert abs(r["mean_cents"] - c.mean()) < 1e-6
        m2 = ((c - c.mean()) ** 2).mean()
        m3 = ((c - c.mean()) ** 3).mean()
        m4 = ((c - c.mean()) ** 4).mean()
        assert abs(r["var_cents2"] - m2) / max(m2, 1) < 1e-9
        if m2 > 0:
            assert abs(r["skewness"] - m3 / m2 ** 1.5) < 1e-6
            assert abs(r["kurt_excess"] - (m4 / m2 ** 2 - 3)) < 1e-6


def test_conv_turn_jaccard_reference(ray_session):
    from ocr_engine_ray.pipelines.queries import (
        q_transcripts_conv_turn_jaccard, transcript_paths,
    )

    # sf0.01: the smallest scale where >=0.1 pairs exist (10 of them)
    sf = "/root/testdata/sf0.01"
    df = pd.concat([pq.read_table(p).to_pandas()
                    for p in transcript_paths(sf)],
                   ignore_index=True)
    sets = {}
    for _, row in df.iterrows():
        line = f"{row['role']}: " \
            + (row["text"] or "").replace("\x00", "")
        sets.setdefault(row["conv_id"], set()).add(line)
    inv = {}
    for cid, ls in sets.items():
        for ln in ls:
            inv.setdefault(ln, []).append(cid)
    cand = set()
    for cids in inv.values():
        cids = sorted(set(cids))
        for i in range(len(cids)):
            for j in range(i + 1, len(cids)):
                cand.add((cids[i], cids[j]))
    ref = {}
    for a, b in cand:
        c = len(sets[a] & sets[b])
        jac = c / (len(sets[a]) + len(sets[b]) - c)
        if jac >= 0.1:
            ref[(a, b)] = jac
    rows = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in q_transcripts_conv_turn_jaccard(sf).take_all()}
    assert set(rows) == set(ref)
    for k, jac in ref.items():
        assert abs(rows[k] - round(jac, 6)) < 1e-9
    assert len(ref) > 0

"""Round-5 graph-kernel scale hardening: the broadcast-CSR 2-hop
kernel (linkpred / Adamic-Adar primary path), its shuffle fallback
(forced via EDGE_BROADCAST_MAX=0), and the WEDGE_DEG_CAP /
TWO_HOP_GATHER_CAP hub-truncation discipline on planted-hub graphs.
Bit-exactness vs DuckDB is pinned by the contract sweep; these pin
path-equivalence and the documented truncation semantics.
"""

import numpy as np
import pyarrow as pa
import pytest


def _edges_ds(pairs):
    import ray.data as rd

    a = pa.array([p[0] for p in pairs], pa.int64())
    b = pa.array([p[1] for p in pairs], pa.int64())
    return rd.from_arrow(pa.table({
        "id_a": a, "id_b": b,
        "w": pa.array(np.ones(len(pairs), np.int64))}))


def _rows(ds):
    return sorted(
        (tuple(sorted(r.items())) for r in ds.take_all()))


def _double_star(n=12, hubs=(0, 99)):
    """Two hubs each adjacent to leaves 1..n: pair (hub, hub) has
    cn=n; every leaf pair has cn=2 (both hubs); hub degree n, leaf
    degree 2."""
    return [(h, i) for h in sorted(hubs) for i in range(1, n + 1)]


def test_linkpred_fallback_matches_broadcast(ray_session):
    """The shuffle fallback (EDGE_BROADCAST_MAX=0) must be bit-equal
    to the broadcast-CSR primary on the real sf0.001 corpus, for both
    the unweighted (linkpred) and weighted (Adamic-Adar) kernels."""
    from ocr_engine_ray.pipelines import queries as q

    sf = "/root/testdata/sf0.001"
    base_lp = _rows(q.q_parts_copurchase_linkpred(sf))
    base_aa = _rows(q.q_parts_copurchase_adamic_adar(sf))
    assert len(base_lp) == 20 and len(base_aa) == 20
    old = q.EDGE_BROADCAST_MAX
    try:
        q.EDGE_BROADCAST_MAX = 0
        assert _rows(q.q_parts_copurchase_linkpred(sf)) == base_lp
        assert _rows(q.q_parts_copurchase_adamic_adar(sf)) == base_aa
    finally:
        q.EDGE_BROADCAST_MAX = old


def test_two_hop_broadcast_endpoint_cap(ray_session):
    """Planted double-star: uncapped, the top pair is (hub, hub) with
    cn=12.  With WEDGE_DEG_CAP=10 the hub ENDPOINTS drop loudly, so
    only leaf pairs (cn=2, through both hubs) survive — the
    documented endpoint-side truncation of the broadcast path."""
    from ocr_engine_ray.pipelines import queries as q

    edges = _edges_ds(_double_star())
    full = q._two_hop_topk_broadcast(edges, 200, weighted=False) \
        .take_all()
    by_pair = {(r["id_a"], r["id_b"]): r["common_neighbors"]
               for r in full}
    assert by_pair[(0, 99)] == 12
    assert by_pair[(1, 2)] == 2

    old = q.WEDGE_DEG_CAP
    try:
        q.WEDGE_DEG_CAP = 10
        capped = q._two_hop_topk_broadcast(edges, 200,
                                           weighted=False).take_all()
    finally:
        q.WEDGE_DEG_CAP = old
    pairs = {(r["id_a"], r["id_b"]) for r in capped}
    assert (0, 99) not in pairs          # hub endpoints truncated
    assert (1, 2) in pairs               # leaf pairs intact
    assert all(r["common_neighbors"] == 2 for r in capped)
    assert len(pairs) == 12 * 11 // 2    # all leaf pairs present


def test_two_hop_broadcast_gather_cap(ray_session):
    """TWO_HOP_GATHER_CAP bounds Σ_{z∈N(a)} deg z per endpoint: with
    cap=5, leaves (gather = 2 hubs × deg 12 = 24) drop, and the hubs
    (gather = 12 leaves × deg 2 = 24) drop too — empty result, loud
    logs; with the real cap everything is back."""
    from ocr_engine_ray.pipelines import queries as q

    edges = _edges_ds(_double_star())
    old = q.TWO_HOP_GATHER_CAP
    try:
        q.TWO_HOP_GATHER_CAP = 5
        capped = q._two_hop_topk_broadcast(edges, 200,
                                           weighted=False).take_all()
    finally:
        q.TWO_HOP_GATHER_CAP = old
    assert capped == []


def test_two_hop_shuffle_center_cap(ray_session):
    """The shuffle fallback caps the wedge CENTER: with
    WEDGE_DEG_CAP=10 the hub-centered wedges (leaf, leaf) vanish but
    the leaf-centered wedge (hub, hub) survives — the opposite,
    documented, truncation side of the fallback path."""
    from ocr_engine_ray.pipelines import queries as q

    edges = _edges_ds(_double_star())
    full = {(r["id_a"], r["id_b"]): r["common_neighbors"]
            for r in q._two_hop_candidates_shuffle(
                edges, weighted=False).take_all()}
    assert full[(0, 99)] == 12 and full[(1, 2)] == 2

    old = q.WEDGE_DEG_CAP
    try:
        q.WEDGE_DEG_CAP = 10
        capped = {(r["id_a"], r["id_b"]): r["common_neighbors"]
                  for r in q._two_hop_candidates_shuffle(
                      edges, weighted=False).take_all()}
    finally:
        q.WEDGE_DEG_CAP = old
    assert capped == {(0, 99): 12}


def test_two_hop_weighted_quantization_parity(ray_session):
    """Adamic-Adar weights through the broadcast kernel equal the
    per-wedge quantization the shuffle path computes: on the
    double-star, AA(leaf_i, leaf_j) = 2 · round(1e12/ln 12) and
    AA(hub, hub) = 12 · round(1e12/ln 2)."""
    from ocr_engine_ray.pipelines import queries as q

    edges = _edges_ds(_double_star())
    rows = {(r["id_a"], r["id_b"]): r["aa_q"]
            for r in q._two_hop_topk_broadcast(
                edges, 200, weighted=True).take_all()}
    w12 = int(q.scaled_int_sql(
        np.array([1e12 / np.log(12.0)]), 1.0)[0])
    w2 = int(q.scaled_int_sql(
        np.array([1e12 / np.log(2.0)]), 1.0)[0])
    assert rows[(1, 2)] == 2 * w12
    assert rows[(0, 99)] == 12 * w2
    shuf = {(r["id_a"], r["id_b"]): r["aa_q"]
            for r in q._two_hop_candidates_shuffle(
                edges, weighted=True).take_all()}
    assert shuf == rows


def test_triangles_and_edge_jaccard_center_cap(ray_session, tmp_path):
    """Triangle counting and edge-Jaccard inherit the center cap:
    on a triangle fan through one hub (hub adjacent to 1..12, plus
    edges (1,2),(3,4)), capping the hub's oriented out-degree
    truncates the hub-centered triangles loudly."""
    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines import queries as q

    # lineitem rows: each order's parts form a co-purchase clique.
    # Hub part 1 (the SMALLEST id, so every hub edge orients (1, i)
    # and groups under center 1 with out-degree 12) stars to parts
    # 100..111; orders (100,101) and (102,103) close two triangles
    # through the hub.
    orders, parts = [], []
    for i in range(100, 112):
        orders += [10 + i, 10 + i]
        parts += [1, i]
    orders += [200, 200, 201, 201]
    parts += [100, 101, 102, 103]
    pq.write_table(pa.table({
        "l_orderkey": pa.array(orders, pa.int64()),
        "l_partkey": pa.array(parts, pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))

    sf = str(tmp_path)
    full = q.q_parts_copurchase_triangles(sf).take_all()[0]
    assert full["n_triangles"] == 2
    old = q.WEDGE_DEG_CAP
    try:
        q.WEDGE_DEG_CAP = 10
        capped = q.q_parts_copurchase_triangles(sf).take_all()[0]
        ej = q.q_parts_copurchase_edge_jaccard(sf).take_all()
    finally:
        q.WEDGE_DEG_CAP = old
    # the hub-centered oriented group (out-degree 12 > 10) drops; the
    # only other oriented groups are (100→101) and (102→103), single
    # neighbors → no triu pairs → zero triangles under the cap
    assert capped["n_triangles"] == 0
    # edge_jaccard's broadcast path caps the ENDPOINT (path-local
    # truncation, like linkpred): hub-endpoint edges (1, x) drop, but
    # leaf-endpoint edges keep their hub-MEDIATED common neighbor —
    # (100,101) survives with cn=1 through center 1 (the gather may
    # pass THROUGH a hub; only hub endpoints truncate).
    pairs = {(r["id_a"], r["id_b"]): r["common_neighbors"]
             for r in ej}
    assert all(a != 1 for a, _ in pairs)      # hub endpoint truncated
    assert pairs[(100, 101)] == 1 and pairs[(102, 103)] == 1


def test_kcenter_no_corpus_rescan(ray_session):
    """r5 fix: the greedy k-center rounds must carry the winning
    vector with the candidate partials instead of re-scanning the
    corpus with a per-row Python filter.  Parity vs the numpy
    reference on the sf0.001 embeddings (the existing pinned
    semantics, re-asserted through the new path)."""
    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines import queries as q
    from ocr_engine_ray.util import scaled_int_sql

    rows = q.q_embeddings_kcenter("/root/testdata/sf0.001").take_all()
    assert len(rows) == 8 and rows[0]["vec_id"] == 0

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), np.int64)
    m = np.asarray(t.column("embedding").to_pylist(), np.float64)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    centers = [int(np.searchsorted(ids, 0))]
    exp = [(0, 0, 0)]
    for step in range(1, 8):
        c = m[centers]
        d2 = ((m * m).sum(1)[:, None] - 2.0 * (m @ c.T)
              + (c * c).sum(1)[None, :]).min(1)
        dq = scaled_int_sql(d2, 1e6)
        i = int(np.lexsort((ids, -dq))[0])
        centers.append(i)
        exp.append((step, int(ids[i]), int(dq[i])))
    got = [(r["step"], r["vec_id"], r["dist_q"]) for r in rows]
    assert got == exp

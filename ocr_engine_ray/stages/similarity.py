"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), each batch computes its block of scores with one numpy
matmul and emits only its local top-k candidates, and the tiny global
top-k reduction happens on the (candidate, not corpus) rows.  Scale
path: IVF-style bucketing via random-hyperplane LSH (see
``dedup.embedding_neardup_lsh`` for the bucket machinery) — search only
the query's bucket neighborhood.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from ..util import vec_matrix

def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _batch_topk(batch: pa.Table, queries_ref, qids_ref, k: int,
                vec_col: str, id_col: str) -> pa.Table:
    """map_batches task: emit this batch's local top-k rows per query.
    Runs as plain tasks — the query matrix broadcast is a zero-copy
    ray.get from the node plasma store, so no actor pool is needed (and
    a pool could co-reserve CPUs against other stages in the DAG)."""
    q = ray.get(queries_ref)               # (Q, d) normalized float64
    qids = ray.get(qids_ref)
    vecs = _normalize(vec_matrix(batch.column(vec_col)))
    ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
        .astype(np.int64, copy=False)
    sims = q @ vecs.T                                       # (Q, batch)
    k = min(k, sims.shape[1])
    # argpartition per query: local top-k without a full sort.  The cut
    # is then widened to every row TIED with the k-th value — otherwise
    # exact-cosine ties at the boundary (duplicate embeddings are real
    # in near-dup corpora) are resolved arbitrarily and can drop the
    # candidate the (−cosine, vec_id) tie-break would keep.
    part = np.argpartition(-sims, k - 1, axis=1)
    q_out, id_out, sim_out = [], [], []
    for qi in range(sims.shape[0]):
        kth_val = sims[qi, part[qi, k - 1]]
        cols = np.nonzero(sims[qi] >= kth_val)[0]
        q_out.extend([qids[qi]] * len(cols))
        id_out.extend(ids[cols])
        sim_out.extend(sims[qi, cols])
    return pa.table({
        "query_id": pa.array(q_out, pa.int64()),
        "vec_id": pa.array(id_out, pa.int64()),
        "cosine": pa.array(sim_out, pa.float64()),
    })


def brute_force_topk(ds: Dataset, queries: np.ndarray, query_ids: list[int],
                     k: int = 5, vec_col: str = "embedding",
                     id_col: str = "vec_id") -> pa.Table:
    """Exact cosine top-k for each query vector.  Returns a table
    (query_id, vec_id, cosine, rank) with rank 1..k per query;
    deterministic tie-break on (−cosine, vec_id)."""
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    queries_ref = ray.put(qmat)
    qids_ref = ray.put(list(query_ids))
    candidates = ds.map_batches(
        lambda b: _batch_topk(b, queries_ref, qids_ref, k, vec_col, id_col),
        batch_format="pyarrow")
    return _merge_topk_heap(candidates, k)


def _merge_topk_heap(candidates, k: int) -> pa.Table:
    """Global reduce over ≤ k × n_batches candidate rows — driver-side
    heap; tie-break (−cosine, vec_id).  The input is the tiny candidate
    stream, never the corpus."""
    best: dict[int, list] = {}
    for b in candidates.iter_batches(batch_size=8192, batch_format="pyarrow"):
        for q, v, s in zip(b.column("query_id").to_pylist(),
                           b.column("vec_id").to_pylist(),
                           b.column("cosine").to_pylist()):
            heapq.heappush(best.setdefault(q, []), (s, -v))
            if len(best[q]) > k:
                heapq.heappop(best[q])
    q_out, v_out, s_out, r_out = [], [], [], []
    for q in sorted(best):
        ranked = sorted(best[q], key=lambda t: (-t[0], -t[1]))
        for rank, (s, negv) in enumerate(ranked, 1):
            q_out.append(q)
            v_out.append(-negv)
            s_out.append(s)
            r_out.append(rank)
    return pa.table({
        "query_id": pa.array(q_out, pa.int64()),
        "vec_id": pa.array(v_out, pa.int64()),
        "cosine": pa.array(s_out, pa.float64()),
        "rank": pa.array(r_out, pa.int32()),
    })


def hard_negative_topk(ds: Dataset, queries: np.ndarray,
                       query_ids: list[int], query_labels: list[int],
                       k: int = 5, vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       label_col: str = "label") -> pa.Table:
    """Hard-negative mining for contrastive / retrieval training: for
    each query vector, the top-k most-cosine-similar corpus vectors
    whose label DIFFERS from the query's (the standard "closest
    wrong-class examples" selection).  Same broadcast-matmul shape as
    :func:`brute_force_topk` — the query matrix and its label vector
    ship once via ``ray.put``; each batch masks same-label columns to
    a sentinel below the cosine range before taking its tie-widened
    local top-k, so the candidate stream (not the corpus) is all that
    reaches the driver merge."""
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    queries_ref = ray.put(qmat)
    qids_ref = ray.put(list(query_ids))
    qlabels_ref = ray.put(np.asarray(query_labels, dtype=np.int64))

    def batch_fn(batch: pa.Table) -> pa.Table:
        q = ray.get(queries_ref)
        qids = ray.get(qids_ref)
        qlabels = ray.get(qlabels_ref)
        vecs = _normalize(vec_matrix(batch.column(vec_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        labels = batch.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        sims = q @ vecs.T                                   # (Q, batch)
        # mask same-label columns: -2.0 sits strictly below cosine's
        # [-1, 1] range, so a masked column can never widen a tie cut
        sims[qlabels[:, None] == labels[None, :]] = -2.0
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)
        q_out, id_out, sim_out = [], [], []
        for qi in range(sims.shape[0]):
            kth_val = sims[qi, part[qi, kk - 1]]
            cols = np.nonzero((sims[qi] >= kth_val)
                              & (sims[qi] > -1.5))[0]
            q_out.extend([qids[qi]] * len(cols))
            id_out.extend(ids[cols])
            sim_out.extend(sims[qi, cols])
        return pa.table({
            "query_id": pa.array(q_out, pa.int64()),
            "vec_id": pa.array(id_out, pa.int64()),
            "cosine": pa.array(sim_out, pa.float64()),
        })

    candidates = ds.map_batches(batch_fn, batch_format="pyarrow")
    return _merge_topk_heap(candidates, k)


def _spherical_kmeans(mat: np.ndarray, k: int, iters: int = 10,
                      seed: int = 42) -> np.ndarray:
    """Cosine (spherical) k-means over L2-normalized rows — the IVF
    coarse quantizer (standard public construction, e.g. FAISS IVF).
    Deterministic: seeded init, fixed iteration count."""
    rng = np.random.RandomState(seed)
    k = min(k, len(mat))
    cent = mat[rng.choice(len(mat), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for j in range(k):
            members = mat[assign == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                cent[j] = c / n if n else cent[j]
    return cent


def ivf_topk(ds: Dataset, queries: np.ndarray, query_ids: list[int],
             k: int = 5, n_centroids: int = 16, n_probe: int = 4,
             train_frac: float = 0.25, max_train: int = 65536,
             seed: int = 42, vec_col: str = "embedding",
             id_col: str = "vec_id") -> pa.Table:
    """IVF approximate top-k with TRAINED centroids (vs the data-blind
    hyperplane buckets of :func:`lsh_topk`):

    1. train — spherical k-means on a deterministic row-hash sample
       (bounded by ``max_train``; the sample comes to the driver, the
       corpus never does);
    2. assign+prune — centroids are broadcast once; one ``map_batches``
       pass assigns each corpus vector to its nearest centroid and keeps
       only vectors in some query's ``n_probe`` closest clusters;
    3. exact top-k over the pruned subset (reuses the brute-force
       scan's local-top-k + tiny driver reduce).

    ``n_probe == n_centroids`` degenerates to the exact scan (tested).
    At 100 TB the trained quantizer is what keeps recall high on
    clustered real-world embeddings where random hyperplanes split
    natural clusters."""
    from .partition import deterministic_sample

    sample_rows = deterministic_sample(
        ds.select_columns([vec_col]), train_frac, [vec_col], seed=seed) \
        .limit(max_train).take_all()
    train = _normalize(np.array([r[vec_col] for r in sample_rows],
                                dtype=np.float64))
    cent = _spherical_kmeans(train, n_centroids, seed=seed)

    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qmat @ cent.T), axis=1)[:, :n_probe]
    wanted = sorted({int(c) for row in probe for c in row})
    cent_ref = ray.put(cent)
    wanted_ref = ray.put(np.asarray(wanted, dtype=np.int64))

    def prune(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        w = ray.get(wanted_ref)
        vecs = _normalize(vec_matrix(b.column(vec_col)))
        assign = (vecs @ c.T).argmax(axis=1)
        return b.filter(pa.array(np.isin(assign, w)))

    pruned = ds.select_columns([id_col, vec_col]).map_batches(
        prune, batch_format="pyarrow")
    return brute_force_topk(pruned, queries, query_ids, k=k,
                            vec_col=vec_col, id_col=id_col)


def lsh_topk(ds: Dataset, queries: np.ndarray, query_ids: list[int],
             k: int = 5, n_planes: int = 8, seed: int = 42,
             vec_col: str = "embedding", id_col: str = "vec_id") -> pa.Table:
    """Approximate top-k: corpus is bucketed by hyperplane sign sketch;
    each query searches only vectors whose bucket is within hamming ≤ 1
    of the query's bucket (probing all 1-bit neighbors).  Recall is
    approximate by construction; the bucket step bounds the scanned
    fraction to ~(n_planes+1)/2^n_planes of the corpus."""
    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    planes = np.random.RandomState(seed).standard_normal((qmat.shape[1], n_planes))

    def bucket_of(mat: np.ndarray) -> np.ndarray:
        signs = (mat @ planes) > 0
        return (signs.astype(np.int64)
                * (1 << np.arange(n_planes, dtype=np.int64))).sum(axis=1)

    qbuckets = bucket_of(qmat)
    wanted: set[int] = set()
    for qb in qbuckets:
        wanted.add(int(qb))
        for bit in range(n_planes):
            wanted.add(int(qb) ^ (1 << bit))
    wanted_ref = ray.put(wanted)

    def filter_buckets(b: pa.Table) -> pa.Table:
        w = ray.get(wanted_ref)
        vecs = vec_matrix(b.column(vec_col))
        mask = np.isin(bucket_of(vecs), list(w))
        return b.filter(pa.array(mask))

    pruned = ds.select_columns([id_col, vec_col]).map_batches(
        filter_buckets, batch_format="pyarrow")
    return brute_force_topk(pruned, queries, query_ids, k=k,
                            vec_col=vec_col, id_col=id_col)


def knn_excluding_self(ds: Dataset, queries: np.ndarray,
                       query_ids: list[int], k: int = 10,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       label_col: str = "label") -> pa.Table:
    """Exact cosine k-NN for each query vector with the query's OWN row
    masked out (the label-noise-audit variant of
    :func:`brute_force_topk`): same broadcast-matmul + tie-widened
    local-top-k shape, but each batch sentinels the column whose id
    equals the query id, and the candidate rows carry the corpus LABEL
    so the caller can score neighbourhood disagreement without a second
    pass.  Returns (query_id, vec_id, label, cosine, rank)."""
    import heapq

    qmat = _normalize(np.asarray(queries, dtype=np.float64))
    queries_ref = ray.put(qmat)
    qids_ref = ray.put(np.asarray(list(query_ids), dtype=np.int64))

    def batch_fn(batch: pa.Table) -> pa.Table:
        q = ray.get(queries_ref)
        qids = ray.get(qids_ref)
        vecs = _normalize(vec_matrix(batch.column(vec_col)))
        ids = batch.column(id_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        labels = batch.column(label_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64, copy=False)
        sims = q @ vecs.T                                   # (Q, batch)
        # -2.0 sits strictly below cosine's range: the self column can
        # never enter (or widen) the local top-k cut
        sims[qids[:, None] == ids[None, :]] = -2.0
        kk = min(k, sims.shape[1])
        q_out, id_out, lab_out, sim_out = [], [], [], []
        part = np.argpartition(-sims, kk - 1, axis=1)
        for qi in range(sims.shape[0]):
            kth_val = sims[qi, part[qi, kk - 1]]
            cols = np.nonzero(sims[qi] >= kth_val)[0]
            q_out.extend([int(qids[qi])] * len(cols))
            id_out.extend(ids[cols])
            lab_out.extend(labels[cols])
            sim_out.extend(sims[qi, cols])
        return pa.table({
            "query_id": pa.array(q_out, pa.int64()),
            "vec_id": pa.array(id_out, pa.int64()),
            "label": pa.array(lab_out, pa.int64()),
            "cosine": pa.array(sim_out, pa.float64()),
        })

    candidates = ds.map_batches(batch_fn, batch_format="pyarrow")
    # driver heap merge with the label payload carried alongside
    best: dict[int, list] = {}
    lab_of: dict[tuple, int] = {}
    for b in candidates.iter_batches(batch_size=8192,
                                     batch_format="pyarrow"):
        for qv, v, lv, s in zip(b.column("query_id").to_pylist(),
                                b.column("vec_id").to_pylist(),
                                b.column("label").to_pylist(),
                                b.column("cosine").to_pylist()):
            lab_of[(qv, v)] = lv
            heapq.heappush(best.setdefault(qv, []), (s, -v))
            if len(best[qv]) > k:
                heapq.heappop(best[qv])
    q_out, v_out, lab_out, s_out, r_out = [], [], [], [], []
    for qv in sorted(best):
        ranked = sorted(best[qv], key=lambda t: (-t[0], -t[1]))
        for rank, (s, negv) in enumerate(ranked, 1):
            q_out.append(qv)
            v_out.append(-negv)
            lab_out.append(lab_of[(qv, -negv)])
            s_out.append(s)
            r_out.append(rank)
    return pa.table({
        "query_id": pa.array(q_out, pa.int64()),
        "vec_id": pa.array(v_out, pa.int64()),
        "label": pa.array(lab_out, pa.int64()),
        "cosine": pa.array(s_out, pa.float64()),
        "rank": pa.array(r_out, pa.int32()),
    })

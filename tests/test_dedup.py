"""Dedup suite: exact, MinHash/LSH, SimHash, embedding cosine."""

import numpy as np
import pyarrow as pa
import pytest

from ocr_engine_ray.stages.dedup import (
    MinHasher, dedup_transcripts_exact, embedding_neardup_lsh,
    embedding_neardup_pairs, jaccard, minhash_dedup_pairs,
    representatives_from_pairs, simhash64, simhash_candidates, word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the late afternoon sun with great interest"
)


def _docs_table():
    rows = [
        {"doc_id": 0, "text": BASE},
        {"doc_id": 1, "text": BASE.replace("lazy", "sleepy")},       # near-dup of 0
        {"doc_id": 2, "text": BASE},                                  # exact dup of 0
        {"doc_id": 3, "text": "completely different content about "
                              "spark shuffle partitions and arrow batches "
                              "in a distributed dataflow engine running jobs"},
        {"doc_id": 4, "text": "another unrelated short document"},
    ]
    return pa.Table.from_pylist(rows)


def test_word_shingles_and_jaccard():
    a = word_shingles("a b c d", 3)
    assert a == {"a b c", "b c d"}
    assert jaccard(a, a) == 1.0
    assert jaccard(a, set()) == 0.0
    assert jaccard(set(), set()) == 1.0


def test_minhash_estimates_jaccard():
    mh = MinHasher(k=128)
    s1 = mh.signature(BASE)
    s2 = mh.signature(BASE.replace("lazy", "sleepy"))
    s3 = mh.signature("utterly different words entirely unrelated "
                      "to anything else in this corpus of text")
    true_j = jaccard(word_shingles(BASE), word_shingles(BASE.replace("lazy", "sleepy")))
    est = (s1 == s2).mean()
    assert abs(est - true_j) < 0.2
    assert (s1 == s3).mean() < 0.2
    # determinism across instances
    assert np.array_equal(s1, MinHasher(k=128).signature(BASE))


def test_minhash_dedup_pairs_finds_dups(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table()).repartition(3)
    pairs = pa.Table.from_pylist(
        minhash_dedup_pairs(ds, "doc_id", threshold=0.5).take_all())
    found = {(r["id_a"], r["id_b"]) for r in pairs.to_pylist()}
    assert (0, 1) in found and (0, 2) in found
    assert all(a != 3 and b != 3 for a, b in found)
    reps = representatives_from_pairs(sorted(found), [0, 1, 2, 3, 4])
    assert reps[0] == reps[1] == reps[2] == 0
    assert reps[3] == 3 and reps[4] == 4


def test_dedup_transcripts_exact(ray_session, small_corpus):
    import ray.data as rd

    ds = rd.from_arrow(small_corpus).repartition(5)
    deduped = dedup_transcripts_exact(ds)
    out = pa.Table.from_pylist(deduped.take_all())
    keys = list(zip(out.column("conv_id").to_pylist(),
                    out.column("turn_idx").to_pylist(),
                    out.column("text").to_pylist()))
    assert len(keys) == len(set(keys))
    # equals pyarrow reference dedup
    import pyarrow.compute as pc
    want = small_corpus.group_by(["conv_id", "turn_idx", "text"]).aggregate(
        [("ts", "min")]).num_rows
    assert out.num_rows == want
    assert out.num_rows < small_corpus.num_rows  # corpus has seeded dups


def test_simhash_properties():
    h1 = simhash64(BASE)
    h2 = simhash64(BASE.replace("lazy", "sleepy"))
    h3 = simhash64("totally different text with nothing shared whatsoever "
                   "about submarines and volcanoes erupting")
    assert simhash64(BASE) == h1  # deterministic
    d12 = (h1 ^ h2).bit_count()
    d13 = (h1 ^ h3).bit_count()
    assert d12 < d13
    assert simhash64("") == 0


def test_simhash_candidates(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs_table()).repartition(2)
    out = pa.Table.from_pylist(
        simhash_candidates(ds, "doc_id", max_hamming=6).take_all())
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.to_pylist()}
    assert (0, 2) in found and found[(0, 2)] == 0  # exact dup
    assert (0, 1) in found


def _emb_table(n=40, d=16, seed=5):
    rng = np.random.RandomState(seed)
    vecs = rng.standard_normal((n, d))
    vecs[1] = vecs[0] + 0.01 * rng.standard_normal(d)   # near-dup pair (0,1)
    vecs[7] = vecs[3] * 2.0                              # exact direction dup (3,7)
    return pa.Table.from_pylist([
        {"vec_id": i, "embedding": [float(x) for x in vecs[i]]} for i in range(n)
    ])


def test_embedding_neardup_exact(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_emb_table()).repartition(3)
    pairs = pa.Table.from_pylist(
        embedding_neardup_pairs(ds, threshold=0.95).take_all())
    found = {(r["id_a"], r["id_b"]) for r in pairs.to_pylist()}
    assert (0, 1) in found and (3, 7) in found
    for r in pairs.to_pylist():
        assert r["cosine"] >= 0.95


def test_embedding_neardup_lsh_subset_of_exact(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_emb_table()).repartition(3)
    exact = {(r["id_a"], r["id_b"]) for r in pa.Table.from_pylist(
        embedding_neardup_pairs(ds, threshold=0.95).take_all()).to_pylist()}
    approx = {(r["id_a"], r["id_b"]) for r in pa.Table.from_pylist(
        embedding_neardup_lsh(ds, threshold=0.95, n_planes=6).take_all()).to_pylist()}
    assert approx <= exact
    assert (0, 1) in approx  # near-identical vectors share every bucket


def test_minhash_pairs_complete_in_large_cluster(ray_session):
    """Star-capped buckets (>64 ids) must not drop direct pairs from the
    PAIRS output: a 70-member near-dup cluster yields all C(70,2) pairs
    above threshold (component re-expansion restores completeness)."""
    import ray.data as rd

    rows = [{"doc_id": i, "text": BASE + f" extra{i}"} for i in range(70)]
    fillers = [
        "streaming shuffles move arrow blocks between executor nodes",
        "the parquet reader prunes row groups using column statistics",
        "actor pools amortize model loading across many small batches",
        "object store spilling keeps backpressure stable under load",
        "hash partitioning colocates keys for the aggregation stage",
    ]
    rows += [{"doc_id": 100 + i, "text": t} for i, t in enumerate(fillers)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    pairs = {(r["id_a"], r["id_b"])
             for r in minhash_dedup_pairs(ds, "doc_id",
                                          threshold=0.5).take_all()}
    expected = {(a, b) for a in range(70) for b in range(a + 1, 70)}
    assert expected <= pairs
    assert not any(p[0] >= 100 or p[1] >= 100 for p in pairs)


def test_embedding_pairs_cross_block_ordering(ray_session):
    """Off-diagonal tiles of the block-pair grid see each unordered pair
    once — pairs whose lower id lands in the later block must still be
    emitted (canonicalized), not dropped."""
    import ray.data as rd

    rng = np.random.RandomState(7)
    base = rng.standard_normal(16)
    vecs = [base + rng.standard_normal(16) * 0.01 for _ in range(12)]
    # descending ids so canonical (min, max) ordering crosses blocks
    tab = pa.table({"vec_id": pa.array(list(range(11, -1, -1)), pa.int64()),
                    "embedding": pa.array([list(map(float, v)) for v in vecs],
                                          pa.list_(pa.float64()))})
    ds = rd.from_arrow(tab)
    pairs = pa.Table.from_pylist(
        embedding_neardup_pairs(ds, threshold=0.99,
                                target_blocks=4).take_all())
    found = {(r["id_a"], r["id_b"]) for r in pairs.to_pylist()}
    expected = {(a, b) for a in range(12) for b in range(a + 1, 12)}
    assert found == expected
    assert all(r["id_a"] < r["id_b"] for r in pairs.to_pylist())


def test_minhash_join_verify_equals_broadcast(ray_session):
    """The co-partitioned (Dataset.join) verify path must produce the
    same verified pairs as the broadcast path."""
    import ray.data as rd

    ds = rd.from_arrow(_docs_table()).repartition(3)
    broadcast = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
                 for r in minhash_dedup_pairs(
                     ds, "doc_id", threshold=0.5).take_all()}
    joined = {(r["id_a"], r["id_b"]): round(r["jaccard"], 9)
              for r in minhash_dedup_pairs(
                  ds, "doc_id", threshold=0.5, verify="join").take_all()}
    assert broadcast == joined and broadcast


def test_streaming_dedup_matches_batch(ray_session, small_corpus):
    """One-pass shared-index dedup equals the two-pass batch dedup on a
    corpus whose duplicates are exact row copies."""
    import ray.data as rd

    from ocr_engine_ray.stages.dedup import dedup_exact_streaming

    ds = rd.from_arrow(small_corpus).repartition(4)
    batch = pa.Table.from_pylist(dedup_transcripts_exact(ds).take_all())
    stream = pa.Table.from_pylist(
        dedup_exact_streaming(ds, ["conv_id", "turn_idx", "text"]).take_all())
    key = lambda t: sorted(
        (r["conv_id"], r["turn_idx"], r["text"]) for r in t.to_pylist())
    assert key(batch) == key(stream)
    assert stream.num_rows < small_corpus.num_rows  # corpus seeds dups


def test_streaming_dedup_incremental(ray_session):
    """The index persists across datasets: a second ingestion of the
    same rows drops everything."""
    import ray.data as rd

    from ocr_engine_ray.stages.dedup import dedup_exact_streaming, make_dedup_index

    rows = [{"doc_id": i, "text": f"doc number {i}"} for i in range(50)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    index = make_dedup_index(num_shards=4)
    first = dedup_exact_streaming(ds, ["text"], index=index).count()
    second = dedup_exact_streaming(ds, ["text"], index=index).count()
    assert first == 50 and second == 0


def test_streaming_dedup_index_persist_restore(ray_session, tmp_path):
    """Driver kill/resume: a snapshot saved after run 1 and restored
    into FRESH shards still drops every row ingested before the kill,
    and keeps genuinely new rows."""
    import ray
    import ray.data as rd

    from ocr_engine_ray.stages.dedup import (
        dedup_exact_streaming,
        load_dedup_index,
        make_dedup_index,
        save_dedup_index,
    )

    rows1 = [{"doc_id": i, "text": f"doc number {i}"} for i in range(40)]
    ds1 = rd.from_arrow(pa.Table.from_pylist(rows1)).repartition(3)
    index = make_dedup_index(num_shards=4)
    assert dedup_exact_streaming(ds1, ["text"], index=index).count() == 40
    snap = str(tmp_path / "dedup_index")
    save_dedup_index(index, snap)
    # simulate the driver restart: the original shard actors die
    for s in index:
        ray.kill(s)

    restored = load_dedup_index(snap)
    rows2 = rows1[:25] + [
        {"doc_id": 100 + i, "text": f"fresh doc {i}"} for i in range(7)]
    ds2 = rd.from_arrow(pa.Table.from_pylist(rows2)).repartition(2)
    out = pa.Table.from_pylist(
        dedup_exact_streaming(ds2, ["text"], index=restored).take_all())
    assert out.num_rows == 7
    assert all(r["doc_id"] >= 100 for r in out.to_pylist())
    # a second snapshot round-trips the union of both ingestions
    snap2 = str(tmp_path / "dedup_index2")
    save_dedup_index(restored, snap2)
    again = load_dedup_index(snap2)
    assert dedup_exact_streaming(ds2, ["text"], index=again).count() == 0


def _prose_corpus(n_docs=60, seed=9):
    """Prose-like synthetic docs: sentences assembled from a realistic
    word distribution (Zipf-ish sampling over a vocabulary), so shingle
    overlap between unrelated docs is low — unlike the uniform
    word-salad `documents` table where simhash bands collide everywhere.
    Docs 3k (k<10) get a near-dup 3k+1 (10% token edit) and an exact
    dup 3k+2."""
    rng = np.random.RandomState(seed)
    # content tokens AFTER stopword removal (how fingerprinting pipelines
    # feed simhash: raw Zipf-headed token streams share their top words
    # across every doc and defeat any token-vote fingerprint — verified
    # here before settling on this corpus)
    vocab = [f"w{i:04d}" for i in range(3000)]
    rows = []
    doc_id = 0
    for k in range(n_docs // 3):
        toks = list(rng.choice(vocab, size=150))
        base = " ".join(toks)
        rows.append({"doc_id": doc_id, "text": base}); doc_id += 1
        edited = toks[:]
        for pos in rng.choice(len(toks), size=8, replace=False):
            edited[pos] = str(rng.choice(vocab))
        rows.append({"doc_id": doc_id, "text": " ".join(edited)}); doc_id += 1
        rows.append({"doc_id": doc_id, "text": base}); doc_id += 1
    return pa.Table.from_pylist(rows)


def test_minhash_discriminates_on_prose(ray_session):
    """On prose-like text: every seeded (base, exact-dup) pair found at
    a high threshold; no cross-family pairs."""
    import ray.data as rd

    ds = rd.from_arrow(_prose_corpus()).repartition(4)
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_dedup_pairs(ds, "doc_id", threshold=0.8).take_all()}
    for k in range(20):
        assert (3 * k, 3 * k + 2) in pairs, f"exact dup family {k}"
    for a, b in pairs:
        assert a // 3 == b // 3, f"cross-family pair {(a, b)}"


def test_simhash_discriminates_on_prose(ray_session):
    """Simhash candidate volume stays near the true-duplicate count on
    prose (vs the word-salad corpus where bands collide everywhere)."""
    import ray.data as rd

    ds = rd.from_arrow(_prose_corpus()).repartition(4)
    out = pa.Table.from_pylist(
        simhash_candidates(ds, "doc_id", max_hamming=3).take_all())
    found = {(r["id_a"], r["id_b"]) for r in out.to_pylist()}
    for k in range(20):
        assert (3 * k, 3 * k + 2) in found, f"exact dup family {k}"
    # candidate density bounded: 6-7 % of all pairs on this corpus vs
    # ~17 % on the uniform word-salad documents table (60-doc corpora
    # still share ~7 of 150 tokens by birthday collision, which
    # correlates a 64-bit token-vote fingerprint; larger vocabularies
    # and longer docs push the density further down)
    n_docs = 60
    assert len(found) / (n_docs * (n_docs - 1) / 2) <= 0.10
    # every true duplicate family is recalled
    same_family = sum(1 for a, b in found if a // 3 == b // 3)
    assert same_family >= 20


def test_label_propagation_matches_union_find(ray_session):
    """Distributed min-label components equal driver union-find on a
    random graph plus a diameter-10 chain (multi-round convergence)."""
    import ray.data as rd

    from ocr_engine_ray.stages.dedup import components_label_propagation

    rng = np.random.RandomState(13)
    edges = [(int(a), int(b)) for a, b in rng.randint(0, 60, size=(80, 2))
             if a != b]
    edges += [(100 + i, 101 + i) for i in range(4)]      # chain 100..104
    tab = pa.table({"id_a": pa.array([a for a, _ in edges], pa.int64()),
                    "id_b": pa.array([b for _, b in edges], pa.int64())})
    got = {r["id"]: r["rep"] for r in components_label_propagation(
        rd.from_arrow(tab).repartition(4), num_partitions=2).take_all()}
    nodes = sorted({i for e in edges for i in e})
    canon_pairs = sorted((min(a, b), max(a, b)) for a, b in edges)
    want = representatives_from_pairs(canon_pairs, nodes)
    assert got == {i: want[i] for i in nodes}
    assert got[104] == 100  # chain collapsed across 4 rounds


def test_connected_components_hybrid_paths_agree(ray_session):
    """connected_components' two dispatch paths (driver union-find
    under the cap; label propagation beyond, forced via cap=0) return
    identical min-id labels — including on components like {9, 10}
    where a lexicographic union order would pick the wrong rep."""
    import ray.data as rd

    from ocr_engine_ray.stages.dedup import connected_components

    rng = np.random.RandomState(7)
    edges = [(int(a), int(b)) for a, b in rng.randint(0, 40, size=(50, 2))
             if a != b]
    edges += [(110, 109), (200, 1000), (1000, 201)]  # str-order traps
    tab = pa.table({"id_a": pa.array([a for a, _ in edges], pa.int64()),
                    "id_b": pa.array([b for _, b in edges], pa.int64())})
    small = {r["id"]: r["rep"] for r in connected_components(
        rd.from_arrow(tab).repartition(4)).take_all()}
    big = {r["id"]: r["rep"] for r in connected_components(
        rd.from_arrow(tab).repartition(4), driver_pair_cap=0,
        num_partitions=2).take_all()}
    assert small == big
    assert small[110] == 109       # natural min, not str-min
    assert small[1000] == 200      # transitive via 201/1000


def test_jaccard_pairs_exact_vs_local(ray_session):
    """q_documents_jaccard_pairs (inverted-index distributed exact
    jaccard) equals a brute-force O(n²) local computation."""
    import pyarrow.parquet as pq

    from ocr_engine_ray.pipelines.queries import q_documents_jaccard_pairs
    from ocr_engine_ray.util import round_sql_f

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pylist()
    sets = {}
    for r in docs:
        toks = (r["text"] or "").split(" ")
        sets[r["doc_id"]] = {" ".join(toks[i:i + 3])
                             for i in range(len(toks) - 2)}
    ids = sorted(sets)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if not inter:
                continue
            sim = inter / (len(sets[a]) + len(sets[b]) - inter)
            if sim >= 0.5:
                expected[(a, b)] = round_sql_f(sim, 6)
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in q_documents_jaccard_pairs(sf).take_all()}
    assert got == expected and expected  # corpus seeds exact dups


def test_minhash_join_decontamination(ray_session):
    """Cross-table LSH join: (a) exact duplicates of a benchmark row
    always surface (they share every band), (b) every returned pair
    clears the threshold with its true jaccard, (c) results are a
    subset of the brute-force exact join."""
    import ray.data as rd

    from ocr_engine_ray.stages.dedup import minhash_join

    corpus = [{"doc_id": i, "text": BASE + f" filler{i} " + BASE[::-1][:40]}
              for i in range(20)]
    corpus[5]["text"] = BASE                       # exact dup of bench 0
    corpus[9]["text"] = BASE.replace("lazy", "sleepy")  # near-dup
    bench = [{"doc_id": 100, "text": BASE},
             {"doc_id": 101, "text": "entirely unrelated benchmark row "
                                     "about submarines and volcanoes"}]
    a = rd.from_arrow(pa.Table.from_pylist(corpus)).repartition(3)
    b = rd.from_arrow(pa.Table.from_pylist(bench))
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in minhash_join(a, b, "doc_id", "doc_id",
                                 threshold=0.5).take_all()}
    assert (5, 100) in got and got[(5, 100)] == 1.0
    assert (9, 100) in got
    # exact brute-force superset check
    exact = set()
    for r in corpus:
        for s in bench:
            j = jaccard(word_shingles(r["text"]), word_shingles(s["text"]))
            if j >= 0.5:
                exact.add((r["doc_id"], s["doc_id"]))
    assert set(got) <= exact
    assert all(v >= 0.5 for v in got.values())


def test_separator_ambiguity_never_merges_rows(ray_session):
    """Key tuples ('a\\x1fb','c') and ('a','b\\x1fc') must stay distinct
    in BOTH exact-dedup paths (length-prefixed encodings): the batch
    winner groupby and the streaming shared index."""
    import ray.data as rd

    from ocr_engine_ray.stages.dedup import (
        dedup_exact,
        dedup_exact_streaming,
        row_digest,
    )

    assert row_digest(("a\x1fb", "c")) != row_digest(("a", "b\x1fc"))

    rows = [
        {"k1": "a\x1fb", "k2": "c", "ord": 1},
        {"k1": "a\x1fb", "k2": "c", "ord": 2},   # true dup of row 1
        {"k1": "a", "k2": "b\x1fc", "ord": 3},
        {"k1": "a", "k2": "b\x1fc", "ord": 4},   # true dup of row 3
        {"k1": "plain", "k2": "x", "ord": 5},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
    batch_out = sorted(
        (r["k1"], r["k2"], r["ord"])
        for r in dedup_exact(ds, ["k1", "k2"], ["ord"]).take_all())
    assert batch_out == [("a", "b\x1fc", 3), ("a\x1fb", "c", 1),
                         ("plain", "x", 5)]
    stream_out = sorted(
        (r["k1"], r["k2"])
        for r in dedup_exact_streaming(ds, ["k1", "k2"]).take_all())
    assert stream_out == [("a", "b\x1fc"), ("a\x1fb", "c"), ("plain", "x")]


def test_streaming_neardup_flags_later_ingestion(ray_session):
    """Round-5 streaming LSH index: ingest the prose corpus bases
    first; a second ingestion of near-dup edits and exact copies
    against the SAME index flags every one, while a batch of fresh
    docs stays clean."""
    import ray.data as rd

    from ocr_engine_ray.stages.dedup import (
        make_dedup_index, neardup_streaming,
    )

    t = _prose_corpus(n_docs=60)
    base = t.filter(pa.array([i % 3 == 0 for i in range(t.num_rows)]))
    edits = t.filter(pa.array([i % 3 != 0 for i in range(t.num_rows)]))

    index = make_dedup_index(4)
    first = neardup_streaming(rd.from_arrow(base).repartition(2),
                              index=index).take_all()
    # distinct prose bases must not collide with each other
    assert sum(r["neardup_hit"] for r in first) == 0

    second = neardup_streaming(rd.from_arrow(edits).repartition(2),
                               index=index).take_all()
    # every edit/copy is a near-dup of an already-ingested base
    assert all(r["neardup_hit"] for r in second)

    rng = np.random.RandomState(77)
    fresh = pa.Table.from_pylist([
        {"doc_id": 10_000 + i,
         "text": " ".join(rng.choice(
             [f"w{j:04d}" for j in range(3000)], size=150))}
        for i in range(10)])
    third = neardup_streaming(rd.from_arrow(fresh), index=index) \
        .take_all()
    assert sum(r["neardup_hit"] for r in third) == 0


def test_streaming_neardup_intra_batch_first_wins(ray_session):
    """Within one ingestion, the FIRST occurrence of a text is clean
    and its duplicates flag — single batch, single shard call per
    key, so the shard's sequential first-wins covers intra-batch."""
    import ray.data as rd

    from ocr_engine_ray.stages.dedup import neardup_streaming

    t = pa.Table.from_pylist([
        {"doc_id": 0, "text": "alpha beta gamma delta epsilon zeta "
                              "eta theta iota kappa"},
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta "
                              "eta theta iota kappa"},
    ])
    rows = sorted(neardup_streaming(rd.from_arrow(t)).take_all(),
                  key=lambda r: r["doc_id"])
    assert [r["neardup_hit"] for r in rows] == [False, True]

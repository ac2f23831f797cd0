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

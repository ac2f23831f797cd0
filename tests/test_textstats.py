"""Text analysis: language ID, quality, token counts, fingerprints;
similarity search: brute-force + LSH top-k."""

import numpy as np
import pyarrow as pa

from ocr_engine_ray.stages.similarity import brute_force_topk, lsh_topk
from ocr_engine_ray.stages.textstats import (
    count_tokens, detect_lang, fingerprint64, quality_score, text_stats_batch,
)


def test_detect_lang():
    assert detect_lang("the cat and the dog went to the park and it was fun") == "en"
    assert detect_lang("der hund und die katze sind nicht in der stadt") == "de"
    assert detect_lang("le chat est dans la maison pour la nuit") == "fr"
    assert detect_lang("el perro y la casa es una cosa para que") == "es"
    assert detect_lang("这是一个中文句子,用来测试语言检测功能的正确性") == "zh"
    assert detect_lang("") == "und"
    assert detect_lang("xyzzy plugh qwop") == "und"


def test_quality_score_shape():
    good = quality_score("The quick brown fox jumps over the lazy dog near the river bank.")
    bad = quality_score("x")
    assert 0 <= bad["quality"] < good["quality"] <= 1
    assert quality_score("")["quality"] == 0.0


def test_count_tokens():
    ws, sub = count_tokens("hello, world! it's fine")
    assert ws == 4
    assert sub == 8  # hello , world ! it ' s fine
    # determinism
    assert count_tokens("hello, world! it's fine") == (ws, sub)


def test_fingerprint_properties():
    a = fingerprint64("one two three four five six seven")
    assert a == fingerprint64("one two three four five six seven")
    assert fingerprint64("") == 0
    assert fingerprint64("short") != 0
    # containing the minimal window preserves the fingerprint often;
    # at minimum, appending text never yields 0 and differs from empty
    assert fingerprint64("one two three four five six seven eight") != 0


def test_text_stats_batch_columns():
    t = pa.table({"doc_id": [1, 2], "text": ["the cat and the dog sat", ""]})
    out = text_stats_batch(t)
    names = set(out.column_names)
    assert {"lang_pred", "n_chars", "n_tokens", "quality", "n_subtokens",
            "fingerprint"} <= names
    rows = out.to_pylist()
    assert rows[0]["lang_pred"] == "en"
    assert rows[1]["n_tokens"] == 0 and rows[1]["fingerprint"] == 0


def _emb(n=50, d=12, seed=3):
    rng = np.random.RandomState(seed)
    vecs = rng.standard_normal((n, d))
    return vecs, pa.Table.from_pylist(
        [{"vec_id": i, "embedding": [float(x) for x in vecs[i]]}
         for i in range(n)])


def test_brute_force_topk_matches_numpy(ray_session):
    import ray.data as rd

    vecs, table = _emb()
    ds = rd.from_arrow(table).repartition(4)
    queries = vecs[:3]
    out = brute_force_topk(ds, queries, [0, 1, 2], k=5)
    rows = out.to_pylist()
    assert len(rows) == 15
    # numpy reference
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = nv[:3] @ nv.T
    for q in range(3):
        got = [r["vec_id"] for r in rows if r["query_id"] == q]
        want = list(np.argsort(-sims[q], kind="stable")[:5])
        assert got == want
        ranks = [r["rank"] for r in rows if r["query_id"] == q]
        assert ranks == [1, 2, 3, 4, 5]
        # self is its own nearest neighbor
        assert got[0] == q


def test_lsh_topk_reasonable_recall(ray_session):
    import ray.data as rd

    vecs, table = _emb(n=200, d=16, seed=9)
    ds = rd.from_arrow(table).repartition(4)
    queries = vecs[:4]
    exact = brute_force_topk(ds, queries, [0, 1, 2, 3], k=3).to_pylist()
    approx = lsh_topk(ds, queries, [0, 1, 2, 3], k=3, n_planes=6).to_pylist()
    # the query vector itself always survives bucket pruning → rank-1 hit
    for q in range(4):
        a_top = [r["vec_id"] for r in approx if r["query_id"] == q]
        assert a_top and a_top[0] == q
    # approximate results are a subset of the corpus with correct ordering
    e_pairs = {(r["query_id"], r["vec_id"]) for r in exact}
    a_pairs = {(r["query_id"], r["vec_id"]) for r in approx}
    assert len(a_pairs & e_pairs) >= 4  # at least the self-hits overlap


def test_hll_accuracy_and_merge():
    import numpy as np

    from ocr_engine_ray.stages.sketches import HyperLogLog

    h = HyperLogLog(p=12)
    vals = [f"user-{i}" for i in range(50_000)]
    h.add_strings(vals)
    est = h.estimate()
    assert abs(est - 50_000) / 50_000 < 0.05
    # mergeability: two halves merged == whole (register-wise max)
    h1, h2 = HyperLogLog(12), HyperLogLog(12)
    h1.add_strings(vals[:25_000])
    h2.add_strings(vals[20_000:])  # overlap on purpose
    merged = h1.merge(h2)
    assert abs(merged.estimate() - est) / est < 0.02
    # serialization roundtrip
    rt = HyperLogLog.deserialize(merged.serialize(), 12)
    assert rt.estimate() == merged.estimate()


def test_approx_distinct_dataset(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ocr_engine_ray.stages.sketches import approx_distinct

    n_distinct = 5_000
    t = pa.table({"k": pa.array([f"u{i % n_distinct}" for i in range(20_000)],
                                pa.string())})
    est = approx_distinct(rd.from_arrow(t).repartition(6), "k")
    assert abs(est - n_distinct) / n_distinct < 0.05


def test_count_min_sketch_bounds(ray_session):
    """CMS never undercounts; overcount within the 2N/width bound at the
    test load; distributed build == single merged sketch; heavy keys'
    estimates dominate."""
    import numpy as np
    import ray.data as rd

    from ocr_engine_ray.stages.sketches import CountMinSketch, cms_counts

    rng = np.random.RandomState(11)
    # zipf-ish: key k appears ~ 5000/k times
    keys = np.concatenate([np.full(5000 // k, k) for k in range(1, 60)])
    rng.shuffle(keys)
    true = {int(k): int((keys == k).sum()) for k in np.unique(keys)}

    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())})) \
        .repartition(5)
    cms = cms_counts(ds, "k", width=1 << 12, depth=4)
    uniq = np.array(sorted(true), dtype=np.int64)
    est = cms.estimate(uniq)
    n = len(keys)
    for k, e in zip(uniq, est):
        assert e >= true[int(k)]                    # never undercounts
        assert e <= true[int(k)] + 2 * n / (1 << 12) + 1
    # merge associativity: two half-sketches sum to the full one
    half = len(keys) // 2
    a = CountMinSketch(1 << 12, 4)
    a.add(keys[:half].astype(np.uint64))
    b = CountMinSketch(1 << 12, 4)
    b.add(keys[half:].astype(np.uint64))
    assert np.array_equal(a.merge(b).counts, cms.counts)

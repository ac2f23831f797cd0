"""Round-4 consolidation tests: stop-shingle df cap on the exact
similarity pair kernels, vectorized simhash parity, zero-copy embedding
ingestion parity."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _tab(ds) -> pa.Table:
    rows = ds.take_all()
    return pa.Table.from_pylist(rows)


def _pairs_dict(ds):
    return {(r["id_a"], r["id_b"]): r["c"] for r in ds.take_all()}


def test_shingle_pair_counts_df_cap(ray_session):
    """A hot shingle (df > cap) is a stop shingle: it contributes NO
    pairs instead of exploding O(df²) rows from one group; pairs that
    also share an under-cap shingle survive with the truncated count."""
    import ray.data as rd

    from ocr_engine_ray.pipelines.queries import _shingle_pair_counts

    hot_docs = list(range(10))          # all 10 share shingle "hot"
    rows = {"doc_id": [], "sh": []}
    for d in hot_docs:
        rows["doc_id"].append(d)
        rows["sh"].append("hot hot hot")
    for d in (0, 1):                    # docs 0,1 also share a rare one
        rows["doc_id"].append(d)
        rows["sh"].append("rare a b")
    sh = rd.from_arrow(pa.table({"doc_id": pa.array(rows["doc_id"],
                                                    pa.int64()),
                                 "sh": pa.array(rows["sh"])}))

    uncapped = _pairs_dict(_shingle_pair_counts(sh, df_cap=None))
    assert len(uncapped) == 45                      # C(10,2)
    assert uncapped[(0, 1)] == 2                    # hot + rare

    capped = _pairs_dict(_shingle_pair_counts(sh, df_cap=5))
    assert capped == {(0, 1): 1}                    # only the rare pair

    # cap above the max df is a no-op (the oracle-safety property the
    # shipped default relies on)
    at_cap = _pairs_dict(_shingle_pair_counts(sh, df_cap=10))
    assert at_cap == uncapped


def test_simhash_batch_parity_small_vocab():
    """Vectorized simhash ≡ scalar simhash64 on edge cases (empty,
    null, boundary whitespace, NBSP, \\x1c–\\x1f control chars that are
    whitespace to str.split() but not to Unicode, exact-tie vote) —
    exercising the small-vocab counts-matmul path."""
    from ocr_engine_ray.stages.dedup import simhash64, simhash_batch

    cases = ["", " ", "a", "a b c", "  lead", "trail  ", "a\tb\nc",
             "\xa0x y\xa0", "héllo wörld émoji 🎉 🎉",
             "dup dup dup unique", "ctrl\x1cchars\x1dhere\x1e!\x1f",
             "mixed \x1c and space", None, "a b", "tie tie"]
    got = simhash_batch(pa.array(cases, pa.string()))
    ref = np.array([simhash64(t or "") for t in cases], np.uint64)
    assert (got == ref).all()


def test_simhash_batch_parity_large_vocab():
    """Same parity through the >4096-vocab gather+reduceat path,
    including empty / whitespace-only docs between non-empty ones
    (reduceat's empty-segment hazard)."""
    from ocr_engine_ray.stages.dedup import simhash64, simhash_batch

    rng = np.random.RandomState(1)
    texts = [" ".join(f"tok{rng.randint(0, 20000)}"
                      for _ in range(rng.randint(0, 60)))
             for _ in range(300)]
    texts[5] = ""
    texts[17] = "   "
    import pyarrow.compute as pc
    vocab = len(pc.unique(pc.list_flatten(
        pc.utf8_split_whitespace(pa.array(texts)))))
    assert vocab > 4096      # really the fallback path
    got = simhash_batch(pa.array(texts, pa.string()))
    ref = np.array([simhash64(t) for t in texts], np.uint64)
    assert (got == ref).all()


def test_simhash64_no_uint64_vote_wrap():
    """The round-3 scalar wrapped negative votes to huge positives
    (uint64 bit matrix), setting every non-tied bit — fingerprints of
    unrelated docs were near-all-ones.  Pin the fix: a single-token doc's
    fingerprint IS its token hash, and unrelated docs differ widely."""
    from ocr_engine_ray.stages.dedup import _crc64, simhash64

    assert simhash64("a") == _crc64("a")
    d = (simhash64("alpha beta gamma") ^
         simhash64("zebra xylophone quartz")).bit_count()
    assert 10 <= d <= 54     # ~32 expected for independent fingerprints


def test_lsh_join_exact_structural_recall(ray_session, tmp_path):
    """documents_lsh_join_exact must recover EVERY planted duplicate
    (identical text ⇒ identical shingle set ⇒ identical seeded MinHash
    signature ⇒ all bands agree — recall is structural, not
    probabilistic), and nothing else on a corpus with no cross-doc
    jaccard-1.0 pairs."""
    import pyarrow.parquet as pq

    import ocr_engine_ray.pipelines.queries as q
    from ocr_engine_ray.stages.partition import (row_hash_hex,
                                                 sample_threshold_hex)

    rng = np.random.RandomState(3)
    texts = [" ".join(f"w{rng.randint(0, 500)}" for _ in range(20))
             for _ in range(80)]
    texts += ["too short"]            # <3 tokens: excluded both sides
    ids = list(range(len(texts)))
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts)}),
                   str(tmp_path / "documents.parquet"))

    got = {(r["doc_id"], r["bench_id"]): r["jaccard"]
           for r in q.q_documents_lsh_join_exact(str(tmp_path)).take_all()}

    thr = sample_threshold_hex(0.25)
    planted = {i for i in ids[:-1]          # the short doc never plants
               if row_hash_hex((i,), 11)[:8] <= thr}
    assert planted, "degenerate test: empty planted sample"
    # every planted duplicate surfaces against its origin, jaccard 1.0,
    # and no spurious pair appears
    assert got == {(i, i + 10_000_000): 1.0 for i in planted}


def test_ngram_contamination_ubiquitous_exclusion(ray_session, tmp_path):
    """The scaled contamination rule excludes 5-grams contained in more
    than NGRAM_UBIQ_CAP corpus docs (boilerplate carries no signal AND
    is the quadratic join fanout), while rare shared 5-grams still
    flag; the plain rule reports the boilerplate matches — so the two
    variants must genuinely differ on a planted corpus."""
    import pyarrow.parquet as pq

    import ocr_engine_ray.pipelines.queries as q
    from ocr_engine_ray.stages.partition import (row_hash_hex,
                                                 sample_threshold_hex)

    ids = list(range(40))
    thr = sample_threshold_hex(0.05)
    bench = [i for i in ids if row_hash_hex((i,), 7)[:8] <= thr]
    assert bench, "degenerate test: empty benchmark sample"
    b0 = bench[0]
    non_bench = [i for i in ids if i not in bench]
    a0, hot_docs = non_bench[0], non_bench[1:6]

    texts = [f"u{i}a u{i}b u{i}c u{i}d u{i}e" for i in ids]
    texts[a0] += " r1 r2 r3 r4 r5"       # rare: df=2 (a0 + bench b0)
    texts[b0] += " r1 r2 r3 r4 r5 h1 h2 h3 h4 h5"
    for i in hot_docs:                   # hot: df=6 > cap, excluded
        texts[i] += " h1 h2 h3 h4 h5"
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts)}),
                   str(tmp_path / "documents.parquet"))

    scaled = {r["doc_id"]: r["n_bench"] for r in
              q.q_documents_ngram_contamination_scaled(
                  str(tmp_path)).take_all()}
    assert scaled == {a0: 1}

    plain = {r["doc_id"]: r["n_bench"] for r in
             q.q_documents_ngram_contamination(str(tmp_path)).take_all()}
    assert plain[a0] == 1
    for i in hot_docs:                   # the rows the exclusion drops
        assert plain[i] == 1


def test_minhash_signatures_batch_parity():
    """Vectorized MinHash signatures ≡ per-row scalar signatures on
    every edge the batch kernel special-cases: empty / null /
    whitespace-only docs, docs shorter than the shingle width (the
    scalar chain path), duplicate shingles (multiset min ≡ set min),
    boundary whitespace, unicode, and the \\x1c–\\x1f scalar
    fallback."""
    from ocr_engine_ray.stages.dedup import MinHasher

    mh = MinHasher()
    cases = ["", None, "   ", "one", "one two", "a b c",
             "a b c d e f g h", "dup dup dup dup dup",
             "  lead and trail  ", "héllo wörld tokens 🎉 here",
             "x\x1cy z q r", "the quick brown fox jumps over the lazy dog"]
    got = mh.signatures_batch(pa.array(cases, pa.string()))
    for i, t in enumerate(cases):
        ref = mh.signature(t or "")
        assert np.array_equal(got[i], ref), (i, t)


def test_lsh_band_rows_vectorized_consistency():
    """Equal signatures must produce equal band hashes in every band
    (the LSH recall invariant the digest change must preserve), and the
    output keeps the (row-major, band-minor) expansion order."""
    from ocr_engine_ray.stages.dedup import MinHasher, lsh_band_rows

    mh = MinHasher()
    texts = ["alpha beta gamma delta", "alpha beta gamma delta",
             "something else entirely different here"]
    batch = pa.table({"doc_id": pa.array([7, 8, 9], pa.int64()),
                      "text": pa.array(texts)})
    rows = lsh_band_rows(mh(batch), "doc_id", bands=16)
    assert rows.num_rows == 3 * 16
    by_doc = {}
    for r in rows.to_pylist():
        by_doc.setdefault(r["doc_id"], []).append(
            (r["band_id"], r["band_hash"]))
    assert by_doc[7] == by_doc[8]          # identical sigs, all 16 bands
    assert by_doc[7] != by_doc[9]
    assert [b for b, _ in by_doc[7]] == list(range(16))


def test_vec_matrix_zero_copy_paths():
    """vec_matrix ≡ np.array(to_pylist()) on every layout it special-
    cases: list<float32>, fixed_size_list, a sliced array (non-zero
    offsets), and the ragged / empty fallbacks."""
    from ocr_engine_ray.util import vec_matrix

    data = [[1.5, 2.25, -3.0], [0.0, 4.5, 9.75], [7.0, -8.5, 0.125]]
    lst = pa.array(data, pa.list_(pa.float32()))
    ref = np.array(lst.to_pylist(), dtype=np.float64)
    assert (vec_matrix(lst) == ref).all()
    fsl = pa.array(data, pa.list_(pa.float32(), 3))
    assert (vec_matrix(fsl) == ref).all()
    sliced = lst.slice(1, 2)
    assert (vec_matrix(sliced) == ref[1:3]).all()
    chunked = pa.chunked_array([lst.slice(0, 1), lst.slice(1, 2)])
    assert (vec_matrix(chunked) == ref).all()
    ragged = pa.array([[1.0], [2.0, 3.0]], pa.list_(pa.float32()))
    with pytest.raises(ValueError):
        vec_matrix(ragged)       # same failure the pylist path raised
    assert vec_matrix(pa.array([], pa.list_(pa.float32()))).shape == (0,)


def test_jaccard_pairs_unaffected_by_default_cap(ray_session, tmp_path):
    """The shipped default cap sits far above the test corpora's max
    shingle df: q_documents_jaccard_pairs over a corpus with a planted
    duplicate pair still finds it (and the [SQL] contract checks at
    sf0.01/sf0.1 pin the full bit-exactness)."""
    import pyarrow.parquet as pq

    import ocr_engine_ray.pipelines.queries as q

    texts = ["alpha beta gamma delta epsilon zeta",
             "alpha beta gamma delta epsilon zeta",   # exact dup of 0
             "one two three four five six seven eight"]
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(texts)}),
        str(tmp_path / "documents.parquet"))
    got = _tab(q.q_documents_jaccard_pairs(str(tmp_path)))
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in got.to_pylist()}
    assert pairs == {(0, 1): 1.0}


def test_events_type_transitions_reference(ray_session, tmp_path):
    """Transition counts/probabilities ≡ a hand-walked reference on a
    planted two-user stream (including the per-user boundary: the last
    event of user 1 must NOT chain into the first of user 2)."""
    import pyarrow.parquet as pq

    import ocr_engine_ray.pipelines.queries as q

    # user 1: a→b→a→b ; user 2: b→b→c
    rows = {
        "event_id": list(range(7)),
        "user_id": [1, 1, 1, 1, 2, 2, 2],
        "ts": [1, 2, 3, 4, 1, 2, 3],
        "event_type": ["a", "b", "a", "b", "b", "b", "c"],
    }
    t = pa.table({
        "event_id": pa.array(rows["event_id"], pa.int64()),
        "ts": pa.array(rows["ts"], pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array(rows["user_id"], pa.int64()),
        "event_type": pa.array(rows["event_type"]),
        "value": pa.array([1.0] * 7, pa.float64()),
        "props": pa.array(["{}"] * 7),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))

    got = {(r["prev_type"], r["next_type"]): (r["n_trans"], r["p"])
           for r in q.q_events_type_transitions(
               str(tmp_path)).to_pylist()}
    assert got == {("a", "b"): (2, 1.0),
                   ("b", "a"): (1, 1.0 / 3.0),
                   ("b", "b"): (1, 1.0 / 3.0),
                   ("b", "c"): (1, 1.0 / 3.0)}


def test_events_value_trend_matches_polyfit(ray_session):
    """Grouped OLS slope/intercept ≡ numpy.polyfit on the same
    (day, cents) points at sf0.001, to float tolerance (the engine and
    the twin share bit-exactness; polyfit is the independent
    reference)."""
    import pyarrow.parquet as pq

    import ocr_engine_ray.pipelines.queries as q

    got = {r["event_type"]: r
           for r in q.q_events_value_trend(SF).to_pylist()}

    t = pq.read_table(SF + "/events.parquet",
                      columns=["event_type", "ts", "value"])
    t = t.filter(t.column("value").is_valid())
    x = (t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
         // 86_400_000_000) - 19723
    y = np.round(t.column("value").to_numpy(zero_copy_only=False) * 100)
    et = np.asarray(t.column("event_type").to_pylist())
    assert set(got) == set(np.unique(et))
    for typ in got:
        m = et == typ
        slope, intercept = np.polyfit(x[m].astype(float),
                                      y[m].astype(float), 1)
        assert got[typ]["n_events"] == int(m.sum())
        assert abs(got[typ]["slope_cents_per_day"] - slope) < 1e-6
        assert abs(got[typ]["intercept_cents"] - intercept) < 1e-6


def test_embeddings_semantic_dedup_planted_clusters(ray_session, tmp_path):
    """SemDeDup keep-list on planted clusters: two tight cosine
    clusters and an orthogonal singleton — each cluster keeps exactly
    its min vec_id, the singleton keeps itself, and transitive closure
    holds (a chain a~b, b~c with a~c below threshold still forms ONE
    component)."""
    import pyarrow.parquet as pq

    import ocr_engine_ray.pipelines.queries as q

    def unit(v):
        v = np.asarray(v, np.float32)
        return (v / np.linalg.norm(v)).tolist()

    vecs = [
        unit([1, 0, 0, 0]),            # 0: cluster A
        unit([1, 0.05, 0, 0]),         # 1: cluster A
        unit([1, -0.05, 0, 0]),        # 2: cluster A
        unit([0, 0, 1, 0.6]),          # 3: chain: 3~4 strong
        unit([0, 0, 1, -0.6]),         # 4: 4~3 ≥ 0.4, 3/4 ⊥ others
        unit([0, 1, 0, 0]),            # 5: singleton (⊥ everything)
    ]
    pq.write_table(
        pa.table({"vec_id": pa.array(range(6), pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32())),
                  "label": pa.array([0] * 6, pa.int32())}),
        str(tmp_path / "embeddings.parquet"))

    got = {r["vec_id"]: (r["rep"], r["keep"])
           for r in q.q_embeddings_semantic_dedup(
               str(tmp_path)).take_all()}
    assert got == {0: (0, True), 1: (0, False), 2: (0, False),
                   3: (3, True), 4: (3, False), 5: (5, True)}


def test_dup_spans_planted(ray_session, tmp_path):
    """Span semantics on a planted corpus: a WITHIN-doc repeat counts
    (two separated spans), a cross-doc shared run of overlapping
    10-grams merges into ONE maximal span covering the whole run, and
    all-unique docs never appear."""
    import pyarrow.parquet as pq

    import ocr_engine_ray.pipelines.queries as q

    c = [f"c{i}" for i in range(10)]          # the repeated 10-gram
    s = [f"s{i}" for i in range(12)]          # 12-token shared run
    texts = [
        " ".join(c + ["u0a", "u0b", "u0c", "u0d", "u0e"] + c),
        " ".join(s + ["x1a", "x1b", "x1c", "x1d", "x1e"]),
        " ".join(s + ["y2a", "y2b", "y2c", "y2d", "y2e"]),
        " ".join(f"z{i}" for i in range(12)),
    ]
    pq.write_table(pa.table({"doc_id": pa.array(range(4), pa.int64()),
                             "text": pa.array(texts)}),
                   str(tmp_path / "documents.parquet"))

    got = {r["doc_id"]: (r["n_spans"], r["dup_tokens"])
           for r in q.q_documents_dup_spans(str(tmp_path)).take_all()}
    # doc 0: hits at pos 0 and 15 (gap 15 > 10) -> two 10-token spans;
    # docs 1/2: hits at pos 0,1,2 -> one island covering tokens 0..11
    assert got == {0: (2, 20), 1: (1, 12), 2: (1, 12)}


def _write_docs(tmp_path, texts, sources):
    import pyarrow.parquet as pq
    n = len(texts)
    pq.write_table(
        pa.table({"doc_id": pa.array(range(n), pa.int64()),
                  "text": pa.array(texts),
                  "lang": pa.array(["en"] * n),
                  "source": pa.array(sources),
                  "n_chars": pa.array([len(t) for t in texts],
                                      pa.int64())}),
        str(tmp_path / "documents.parquet"))


def test_dsir_weights_planted(ray_session, tmp_path):
    """DSIR importance weights on a planted corpus: a doc made of
    target-exclusive vocabulary outscores a doc of raw-exclusive
    vocabulary, and two token-identical docs get the IDENTICAL weight
    regardless of which feed they sit in (the weight is a function of
    the token bag only)."""
    import ocr_engine_ray.pipelines.queries as q

    texts = ["alpha beta gamma delta"] * 3 \
        + ["zork quux blarg frotz"] * 3 \
        + ["alpha beta gamma delta",      # doc 6: target bag, raw feed
           "zork quux blarg frotz"]       # doc 7: raw bag, target feed
    sources = ["src0"] * 3 + ["src1"] * 3 + ["src1", "src0"]
    _write_docs(tmp_path, texts, sources)
    got = {r["doc_id"]: r["dsir_logweight"]
           for r in q.q_documents_dsir_weights(str(tmp_path)).take_all()}
    assert got[0] > got[3]               # target vocab outscores raw
    assert got[6] == got[0]              # bag-identical ⇒ weight-identical
    assert got[7] == got[3]
    assert all(r > 0 for r in (got[0],)) and got[3] < 0


def test_pmi_bigrams_planted(ray_session, tmp_path):
    """PMI collocations on a planted corpus: a bigram whose tokens
    only ever occur together tops a frequent-but-independent pair, the
    support floor drops pairs under 5 occurrences, and the reported
    value matches the formula within quantization (5 terms × 0.5e-6)."""
    import math

    import ocr_engine_ray.pipelines.queries as q

    texts = ["new york " * 6 + "the cat",
             "the dog the cat the fish the bird"]
    _write_docs(tmp_path, texts, ["src0", "src1"])
    rows = {(r["tok_a"], r["tok_b"]): (r["n_pair"], r["pmi"])
            for r in q.q_documents_pmi_bigrams(str(tmp_path)).take_all()}
    assert ("new", "york") in rows
    assert all(n >= 5 for n, _ in rows.values())
    n_pair, pmi = rows[("new", "york")]
    assert n_pair == 6
    # replay: N tokens, P bigrams, c_new = c_york = 6
    n_tok = sum(len(t.split(" ")) for t in texts)
    n_bg = sum(len(t.split(" ")) - 1 for t in texts)
    want = (math.log(6) - math.log(6) - math.log(6)
            + 2 * math.log(n_tok) - math.log(n_bg))
    assert abs(pmi - want) < 1e-5
    if ("the", "cat") in rows:
        assert rows[("the", "cat")][1] < pmi


def test_gt_unseen_planted(ray_session, tmp_path):
    """Good–Turing missing mass per source: an all-hapax feed reports
    mass 1.0, a single-token feed reports 0.0, and a half-hapax feed
    reports exactly 0.5."""
    import ocr_engine_ray.pipelines.queries as q

    texts = ["a b c d",                   # srcA: 4 hapax / 4 tokens
             "x x x x x x x x x x",       # srcB: 0 hapax / 10 tokens
             "p p q r"]                   # srcC: 2 hapax / 4 tokens
    _write_docs(tmp_path, texts, ["srcA", "srcB", "srcC"])
    t = q.q_documents_gt_unseen(str(tmp_path))
    got = {r["source"]: (r["n_tokens"], r["n_types"], r["n_hapax"],
                         r["gt_unseen_mass"])
           for r in t.to_pylist()}
    assert got == {"srcA": (4, 4, 4, 1.0),
                   "srcB": (10, 1, 0, 0.0),
                   "srcC": (4, 3, 2, 0.5)}


def test_neardup_keep_best_planted(ray_session, tmp_path):
    """Keep-best election on planted clusters: the LONGEST member of a
    near-dup pair wins regardless of id order, identical-length ties
    break to the min doc_id, and singletons keep themselves."""
    import ocr_engine_ray.pipelines.queries as q

    texts = ["a b c d e f",            # 0: shorter …
             "a b c d e f g h",        # 1: … than its near-dup → wins
             "x y z w p q",            # 2: tie with 3 → 2 wins (min id)
             "x y z w p q",            # 3
             "solo only doc here"]     # 4: singleton keeps itself
    _write_docs(tmp_path, texts, ["s"] * 5)
    got = {r["doc_id"]: (r["rep"], r["keep"])
           for r in q.q_documents_neardup_keep_best(
               str(tmp_path)).take_all()}
    assert got == {0: (0, False), 1: (0, True),
                   2: (2, True), 3: (2, False),
                   4: (4, True)}


def test_char_entropy_planted(ray_session, tmp_path):
    """Char entropy on planted docs: constant string → 0, two-symbol
    alternation → ln 2, empty string → 0 (DuckDB splits '' to ['']),
    and the non-ASCII Counter fallback returns the same arithmetic as
    the byte fast path."""
    import math

    import ocr_engine_ray.pipelines.queries as q

    texts = ["aaaa", "abab", "", "éé√√"]
    _write_docs(tmp_path, texts, ["s"] * 4)
    got = {r["doc_id"]: (r["n_chars"], r["char_entropy"])
           for r in q.q_documents_char_entropy(str(tmp_path)).take_all()}
    ln2 = round(math.log(2), 6)
    assert got[0] == (4, 0.0)
    assert got[1] == (4, ln2)
    assert got[2] == (1, 0.0)
    assert got[3] == (4, ln2)      # codepoint counts, not byte counts


def test_dup_spans_removed_planted(ray_session, tmp_path):
    """Span REMOVAL semantics on the dup_spans planted corpus: both
    copies of a within-doc repeat are cut (the unique middle survives),
    a cross-doc shared run disappears from both docs leaving their
    unique tails, and an all-unique doc passes through verbatim."""
    import ocr_engine_ray.pipelines.queries as q

    c = [f"c{i}" for i in range(10)]
    s = [f"s{i}" for i in range(12)]
    texts = [
        " ".join(c + ["u0a", "u0b", "u0c", "u0d", "u0e"] + c),
        " ".join(s + ["x1a", "x1b", "x1c", "x1d", "x1e"]),
        " ".join(s + ["y2a", "y2b", "y2c", "y2d", "y2e"]),
        " ".join(f"z{i}" for i in range(12)),
    ]
    _write_docs(tmp_path, texts, ["s"] * 4)
    got = {r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
           for r in q.q_documents_dup_spans_removed(
               str(tmp_path)).take_all()}
    assert got[0] == ("u0a u0b u0c u0d u0e", 5, 20)
    assert got[1] == ("x1a x1b x1c x1d x1e", 5, 12)
    assert got[2] == ("y2a y2b y2c y2d y2e", 5, 12)
    assert got[3] == (texts[3], 12, 0)


def test_zipf_slope_planted(ray_session, tmp_path):
    """Zipf fit on a planted feed: counts following the exact power
    law c(r) = 12/r (12, 6, 4, 3 at ranks 1-4) recover slope ≈ −1
    (rank ties broken on token in both engines), and a uniform feed
    fits slope 0."""
    import ocr_engine_ray.pipelines.queries as q

    parts = ["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3
    texts = [" ".join(parts),
             "u1 u2 u3 u4 u1 u2 u3 u4"]     # srcU: all counts equal
    _write_docs(tmp_path, texts, ["srcP", "srcU"])
    got = {r["source"]: (r["n_types"], r["zipf_slope"])
           for r in q.q_documents_zipf_slope(str(tmp_path)).take_all()}
    assert got["srcU"] == (4, 0.0)
    n_types, slope = got["srcP"]
    assert n_types == 4
    assert abs(slope - (-1.0)) < 0.005     # quantization at 1e-3 only


def test_revenue_by_nation_planted(ray_session, tmp_path):
    """TPC-H-Q5 shape on a planted 6-table micro-warehouse: revenue
    counts ONLY (region ∧ date-window ∧ same-nation customer/supplier)
    rows — an out-of-region nation, an out-of-window order, and a
    cross-nation supplier each contribute nothing."""
    import pyarrow.parquet as pq

    import ocr_engine_ray.pipelines.queries as q

    def w(name, table):
        pq.write_table(table, str(tmp_path / f"{name}.parquet"))

    w("region", pa.table({"r_regionkey": pa.array([0, 1], pa.int32()),
                          "r_name": ["ASIA", "EUROPE"]}))
    w("nation", pa.table({
        "n_nationkey": pa.array([10, 11, 20], pa.int32()),
        "n_name": ["JAPAN", "INDIA", "FRANCE"],
        "n_regionkey": pa.array([0, 0, 1], pa.int32())}))
    w("supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_nationkey": pa.array([10, 11, 20], pa.int32())}))
    w("customer", pa.table({
        "c_custkey": pa.array([100, 101, 102], pa.int64()),
        "c_nationkey": pa.array([10, 11, 20], pa.int32())}))
    ts = lambda s: pa.scalar(np.datetime64(s, "us"),
                             pa.timestamp("us")).as_py()
    w("orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([100, 100, 101, 102], pa.int64()),
        "o_orderdate": pa.array(
            [ts("1996-06-01"), ts("1999-06-01"),
             ts("1996-02-01"), ts("1996-03-01")],
            pa.timestamp("us"))}))
    # order 1 (JAPAN cust): line A supp 1 (JAPAN, counts),
    #                       line B supp 2 (INDIA, cross-nation: dropped)
    # order 2: in-window=False (1999) — dropped
    # order 3 (INDIA cust): supp 2 (INDIA, counts)
    # order 4 (FRANCE cust): out of region — dropped
    w("lineitem", pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3, 4], pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 2, 3], pa.int64()),
        "l_extendedprice": [100.0, 50.0, 70.0, 200.0, 90.0],
        "l_discount": [0.10, 0.0, 0.0, 0.25, 0.0]}))

    got = {r["n_name"]: r["revenue"]
           for r in q.q_revenue_by_nation(str(tmp_path)).take_all()}
    assert got == {"JAPAN": 90.0, "INDIA": 150.0}


def test_gopher_gate_planted(ray_session, tmp_path):
    """Each Gopher rule fails exactly the doc planted to violate it:
    word-count window, ≥2-distinct-stopwords, mean-word-length window,
    and alphabetic-word fraction."""
    import ocr_engine_ray.pipelines.queries as q

    good = ("the a " + "word " * 38).strip()          # 40 words, passes all
    short = "the a word"                              # 3 words
    nostop = ("word " * 40).strip()                   # no stopwords
    longtok = ("the a " + ("x" * 13 + " ") * 38).strip()  # mean > 10
    numeric = ("the a " + "123 " * 38).strip()        # alpha_frac 2/40
    _write_docs(tmp_path, [good, short, nostop, longtok, numeric],
                ["s"] * 5)
    rows = {r["doc_id"]: r
            for r in q.q_documents_gopher_gate(str(tmp_path)).take_all()}
    assert bool(rows[0]["keep"])
    assert not rows[1]["keep"] and rows[1]["n_words"] == 3
    assert not rows[2]["keep"] and rows[2]["n_stop"] == 0
    assert not rows[3]["keep"] and rows[3]["mean_word_len"] > 10
    assert not rows[4]["keep"] and rows[4]["alpha_frac"] < 0.8
    assert rows[0]["n_stop"] == 2


def test_bm25_topk_planted(ray_session, tmp_path):
    """BM25 ranking semantics on a planted 10-doc corpus (every doc is
    a query under the audit-sized LIMIT rule).  For query 0
    ("common rare"): the short standard docs sharing BOTH terms fill
    the top-5 in doc_id tie-break order; the long doc loses to them on
    length normalization; the no-rare-term doc never makes the cut;
    the query never retrieves itself."""
    import ocr_engine_ray.pipelines.queries as q

    texts = [("common " * 30 + "rare").strip()] * 10
    texts[0] = "common rare"                        # the probe query
    texts[1] = ("common " * 60 + "rare").strip()    # long, both terms
    texts[2] = "common common"                      # no rare term
    _write_docs(tmp_path, texts, ["s"] * 10)
    rows = q.q_documents_bm25_topk(str(tmp_path)).take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(10))              # all docs are queries
    ranked = sorted(by_q[0], key=lambda r: r["rank"])
    ids = [r["doc_id"] for r in ranked]
    assert 0 not in ids                             # self excluded
    assert ids == [3, 4, 5, 6, 7]                   # identical docs tie →
    scores = [r["score"] for r in ranked]           # doc_id order
    assert scores == sorted(scores, reverse=True)
    assert 2 not in ids                             # no-rare-term loses


def test_pca_matches_numpy_reference(ray_session):
    """q_embeddings_pca ≡ numpy population-covariance + eigh on the raw
    embedding matrix (up to the declared sign convention), within the
    2^-20 quantization the exact-int pipeline rides on; explained
    ratios sum to the top-4 share and decrease monotonically."""
    import pyarrow.parquet as pq

    import ocr_engine_ray.pipelines.queries as q

    X = np.array(pq.read_table(
        SF + "/embeddings.parquet",
        columns=["embedding"]).column("embedding").to_pylist(),
        np.float64)
    C = np.cov(X, rowvar=False, bias=True)
    w, v = np.linalg.eigh(C)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]

    got = q.q_embeddings_pca(SF).to_pylist()
    d = X.shape[1]
    for c in range(4):
        ref = v[:, c]
        if ref[np.argmax(np.abs(ref))] < 0:
            ref = -ref
        load = np.array([r["loading"] for r in got
                         if r["component"] == c + 1])
        assert len(load) == d
        assert np.allclose(load, ref, atol=1e-4)
        ratio = [r["explained_ratio"] for r in got
                 if r["component"] == c + 1][0]
        assert abs(ratio - w[c] / w.sum()) < 1e-6
    ratios = [r["explained_ratio"] for r in got if r["dim"] == 1]
    assert ratios == sorted(ratios, reverse=True)


def test_pca_project_variance_matches_eigenvalues(ray_session):
    """Projection onto component c has variance ≈ eigenvalue c (the
    defining property of PCA), and components are uncorrelated."""
    import ocr_engine_ray.pipelines.queries as q

    rows = q.q_embeddings_pca(SF).to_pylist()
    total_ratio = {r["component"]: r["explained_ratio"] for r in rows}
    proj = q.q_embeddings_pca_project(SF).take_all()
    P = np.array([[r["pc1"], r["pc2"], r["pc3"], r["pc4"]]
                  for r in proj])
    var = P.var(axis=0)                     # population variance
    assert var[0] > var[1] > var[2] > var[3] > 0
    # variances are proportional to the explained ratios
    ratios = np.array([total_ratio[c] for c in (1, 2, 3, 4)])
    assert np.allclose(var / var.sum(), ratios / ratios.sum(),
                       atol=1e-3)
    # off-diagonal correlations vanish
    C = np.corrcoef(P, rowvar=False)
    assert np.all(np.abs(C - np.eye(4)) < 1e-2)


def test_ngram_novelty_planted(ray_session, tmp_path):
    """A doc sharing every 5-gram with its exact copy scores novelty
    0.0, a fully-unique doc scores 1.0, and a doc whose prefix is
    copied but whose tail is unique lands strictly between; <5-token
    docs emit no row."""
    import ocr_engine_ray.pipelines.queries as q

    uniq = " ".join(f"u{i}" for i in range(10))
    copied = " ".join(f"c{i}" for i in range(10))
    half = copied + " " + " ".join(f"h{i}" for i in range(10))
    _write_docs(tmp_path, [uniq, copied, copied, half, "tiny doc"],
                ["s"] * 5)
    got = {r["doc_id"]: r for r in
           q.q_documents_ngram_novelty(str(tmp_path)).take_all()}
    assert set(got) == {0, 1, 2, 3}
    assert got[0]["novelty"] == 1.0
    assert got[1]["novelty"] == 0.0 and got[2]["novelty"] == 0.0
    assert 0.0 < got[3]["novelty"] < 1.0
    assert got[0]["n_grams"] == 6 and got[0]["n_novel"] == 6


def test_vocab_coverage_planted(ray_session, tmp_path):
    """Known curve: counts a=4, b=1, c=1 (total 6) → k=1 covers 4/6
    (rank ties broken term-ASC), k=2 covers 5/6, k≥4 covers all."""
    import ocr_engine_ray.pipelines.queries as q

    _write_docs(tmp_path, ["a a a a b c"], ["s"])
    got = {r["k"]: r for r in
           q.q_documents_vocab_coverage(str(tmp_path)).to_pylist()}
    assert got[1]["covered_tokens"] == 4
    assert got[1]["coverage"] == 4.0 / 6.0
    assert got[2]["covered_tokens"] == 5
    assert got[4]["coverage"] == 1.0 and got[64]["coverage"] == 1.0


def test_source_vocab_overlap_planted(ray_session, tmp_path):
    """Bitmask-OR intersection arithmetic on a planted 3-feed corpus:
    one overlapping pair with jaccard 1/3, zero-share pairs omitted
    (matching the twin's inner join)."""
    import ocr_engine_ray.pipelines.queries as q

    _write_docs(tmp_path, ["x y", "y z", "w q"], ["s1", "s2", "s3"])
    rows = q.q_documents_source_vocab_overlap(str(tmp_path)).to_pylist()
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_a"], r["source_b"]) == ("s1", "s2")
    assert r["shared"] == 1 and r["vocab_a"] == 2 and r["vocab_b"] == 2
    assert r["jaccard"] == 1.0 / 3.0


def test_canary_scan_planted(ray_session, tmp_path):
    """Canaries are the 16 lowest-hash docs (seed 13).  The planted
    verbatim leak makes exactly one canary count 2 (its own doc + the
    leak doc); every other canary is found only in itself."""
    import ocr_engine_ray.pipelines.queries as q
    from ocr_engine_ray.stages.partition import row_hash_hex

    n = 20
    order = sorted(range(n), key=lambda i: (row_hash_hex((i,), 13), i))
    cid = order[0]                       # certainly a canary
    leak = order[-1]                     # certainly NOT a canary
    texts = [f"f{i}a f{i}b f{i}c" for i in range(n)]
    texts[cid] = "s1 s2 s3 s4 s5 s6 s7 s8 tail tail"
    texts[leak] = "prefix s1 s2 s3 s4 s5 s6 s7 s8 suffix"
    _write_docs(tmp_path, texts, ["s"] * n)
    got = {r["canary_id"]: r["n_docs"]
           for r in q.q_documents_canary_scan(str(tmp_path)).take_all()}
    assert set(got) == set(order[:16])
    assert got[cid] == 2
    assert all(v == 1 for k, v in got.items() if k != cid)


def test_data_card_planted(ray_session, tmp_path):
    """Known one-row card: 4 docs (one exact dup pair → dup_docs 2),
    9 tokens total, 2 langs, 2 sources, mean 2.25."""
    import pyarrow.parquet as pq

    import ocr_engine_ray.pipelines.queries as q

    texts = ["a b", "a b", "c d e", "f g"]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts),
                  "lang": pa.array(["en", "en", "fr", "fr"]),
                  "source": pa.array(["s1", "s1", "s2", "s2"]),
                  "n_chars": pa.array([len(t) for t in texts],
                                      pa.int64())}),
        str(tmp_path / "documents.parquet"))
    card = q.q_documents_data_card(str(tmp_path)).take_all()
    assert len(card) == 1
    c = card[0]
    assert c["n_docs"] == 4 and c["n_tokens"] == 9
    assert c["n_langs"] == 2 and c["n_sources"] == 2
    assert c["dup_docs"] == 2
    assert c["mean_doc_tokens"] == 2.25


def test_train_order_dense_and_layout_independent(ray_session,
                                                  tmp_path):
    """Global train ranks are dense 1..n and IDENTICAL whether the
    corpus arrives as one parquet file or many (the determinism claim:
    rank is a pure function of row identity, never of block layout)."""
    import pyarrow.parquet as pq

    import ocr_engine_ray.pipelines.queries as q

    n = 200
    texts = [f"t{i}" for i in range(n)]
    one = tmp_path / "one"
    many = tmp_path / "many"
    one.mkdir()
    many.mkdir()

    def tab(lo, hi):
        return pa.table({
            "doc_id": pa.array(range(lo, hi), pa.int64()),
            "text": pa.array(texts[lo:hi]),
            "lang": pa.array(["en"] * (hi - lo)),
            "source": pa.array(["s"] * (hi - lo)),
            "n_chars": pa.array([2] * (hi - lo), pa.int64())})

    pq.write_table(tab(0, n), str(one / "documents.parquet"))
    (many / "documents.parquet").mkdir()
    for k, (lo, hi) in enumerate([(0, 37), (37, 101), (101, n)]):
        pq.write_table(tab(lo, hi),
                       str(many / "documents.parquet" / f"p{k}.parquet"))

    a = {r["doc_id"]: r["train_rank"]
         for r in q.q_documents_train_order(str(one)).take_all()}
    b = {r["doc_id"]: r["train_rank"]
         for r in q.q_documents_train_order(str(many)).take_all()}
    assert a == b
    assert sorted(a.values()) == list(range(1, n + 1))


def test_dedup_normalized_planted(ray_session, tmp_path):
    """Case / punctuation / whitespace-run variants collapse to one
    normalized key (min doc_id keeps, count reported); a distinct doc
    stays its own group of one."""
    import ocr_engine_ray.pipelines.queries as q

    _write_docs(tmp_path,
                ["Hello,  World!", "hello world", "  HELLO -- world ",
                 "another doc"], ["s"] * 4)
    rows = {r["doc_id"]: r["n_copies"]
            for r in q.q_documents_dedup_normalized(
                str(tmp_path)).take_all()}
    assert rows == {0: 3, 3: 1}


def test_c4_gate_planted(ray_session, tmp_path):
    """Each C4 rule fails exactly the doc planted to violate it:
    <3 sentences, lorem-ipsum placeholder (case-insensitive), curly
    brace; a clean 3-sentence doc passes."""
    import ocr_engine_ray.pipelines.queries as q

    _write_docs(tmp_path,
                ["One. Two! Three?",
                 "only one. two.",
                 "Lorem Ipsum filler. x. y.",
                 "code { brace. x. y."], ["s"] * 4)
    rows = {r["doc_id"]: r
            for r in q.q_documents_c4_gate(str(tmp_path)).take_all()}
    assert rows[0]["keep"] and rows[0]["n_sentences"] == 3
    assert not rows[1]["keep"] and rows[1]["n_sentences"] == 2
    assert not rows[2]["keep"] and rows[2]["has_lorem"]
    assert not rows[3]["keep"] and rows[3]["has_brace"]


def test_temperature_mix_planted(ray_session, tmp_path):
    """alpha=0.7 tempering: the tail source's mix weight rises above
    its raw token share, the head's falls below, and the weights sum
    to 1 (within the 2^40 quantization)."""
    import ocr_engine_ray.pipelines.queries as q

    _write_docs(tmp_path,
                [("w " * 90).strip(), ("w " * 10).strip()],
                ["head", "tail"])
    rows = {r["source"]: r
            for r in q.q_documents_temperature_mix(
                str(tmp_path)).take_all()}
    assert abs(rows["head"]["token_share"] - 0.9) < 1e-12
    assert rows["tail"]["mix_weight"] > rows["tail"]["token_share"]
    assert rows["head"]["mix_weight"] < rows["head"]["token_share"]
    assert abs(rows["head"]["mix_weight"]
               + rows["tail"]["mix_weight"] - 1.0) < 1e-9


def test_ngram_diversity_planted(ray_session, tmp_path):
    """A templated source (one trigram repeated) reads a low TTR; a
    source of all-distinct trigrams reads 1.0; docs under 3 tokens
    contribute nothing (the twin's len >= 3 predicate)."""
    import ocr_engine_ray.pipelines.queries as q

    _write_docs(tmp_path,
                ["a b c a b c a b",          # trigrams: 6 total, 3 distinct
                 "x1 x2 x3 x4 x5",           # 3 total, 3 distinct
                 "too short"],               # no trigrams
                ["tmpl", "fresh", "fresh"])
    t = q.q_documents_ngram_diversity(str(tmp_path))
    rows = {r["source"]: r for r in t.to_pylist()}
    assert rows["tmpl"]["n_trigrams"] == 6
    assert rows["tmpl"]["n_distinct"] == 3
    assert rows["fresh"]["ttr"] == 1.0
    assert set(rows) == {"tmpl", "fresh"}


def test_source_ttest_planted(ray_session, tmp_path):
    """Two sources with clearly separated length distributions read a
    large |t|; two sources drawn identical read t = 0; a single-doc
    source drops (variance undefined)."""
    import ocr_engine_ray.pipelines.queries as q

    texts, sources = [], []
    for ln in (10, 12, 14):
        texts.append("x" * ln); sources.append("short")
        texts.append("x" * (ln + 100)); sources.append("long")
        texts.append("x" * ln); sources.append("short2")
    texts.append("x" * 50); sources.append("solo")
    _write_docs(tmp_path, texts, sources)
    rows = {(r["source_a"], r["source_b"]): r
            for r in q.q_documents_source_ttest(str(tmp_path))
            .take_all()}
    assert not any("solo" in k for pair in rows for k in pair)
    assert rows[("long", "short")]["t_welch"] > 10
    assert rows[("short", "short2")]["t_welch"] == 0.0
    assert rows[("long", "short")]["n_a"] == 3


def test_theilsen_trend_planted(ray_session, tmp_path):
    """The median pairwise slope ignores one outlier purchase that
    would swing an OLS fit: four collinear points (slope 1 cent/s) plus
    one spike still read ~1 cent/s; equal-ts pairs drop; single-purchase
    users drop."""
    import pyarrow.parquet as pq
    import ocr_engine_ray.pipelines.queries as q

    base = 1_600_000_000_000_000  # µs
    ts, uid, etype, val, eid = [], [], [], [], []
    # user 1: values 1.00, 2.00, 3.00, 4.00 at 100s, 200s, 300s, 400s
    # → slope 0.01 cents/µs... actually 100 cents per 100s = 1e-6
    for i, (t, v) in enumerate([(100, 1.0), (200, 2.0), (300, 3.0),
                                (400, 4.0), (250, 500.0)]):
        ts.append(base + t * 1_000_000); uid.append(1)
        etype.append("purchase"); val.append(v); eid.append(i)
    # user 2: single purchase → drops
    ts.append(base); uid.append(2); etype.append("purchase")
    val.append(9.0); eid.append(10)
    # user 3: two purchases at the SAME ts → no valid pair → drops
    for i in (11, 12):
        ts.append(base); uid.append(3); etype.append("purchase")
        val.append(float(i)); eid.append(i)
    pq.write_table(pa.table({
        "event_id": pa.array(eid, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(etype),
        "value": pa.array(val, pa.float64()),
        "props": pa.array(["{}"] * len(eid)),
    }), str(tmp_path / "events.parquet"))
    rows = {r["user_id"]: r
            for r in q.q_events_theilsen_trend(str(tmp_path))
            .take_all()}
    assert set(rows) == {1}
    assert abs(rows[1]["theil_sen"] - 1e-6) < 1e-9   # 1 cent/sec
    assert rows[1]["n_slopes"] == 10                 # C(5,2), no ties


def test_line_dedup_planted(ray_session, tmp_path):
    """A line shared by two docs is removed from BOTH; a line repeated
    within ONE doc is not cross-doc boilerplate and survives twice; a
    fully-boilerplate doc comes back as ''; order is preserved."""
    import ocr_engine_ray.pipelines.queries as q

    _write_docs(tmp_path,
                ["keep me\nBOILER\nmine\nmine",
                 "BOILER\nother",
                 "BOILER",
                 "solo text"], ["s"] * 4)
    rows = {r["doc_id"]: r
            for r in q.q_documents_line_dedup(str(tmp_path)).take_all()}
    assert rows[0]["clean_text"] == "keep me\nmine\nmine"
    assert rows[0]["n_removed"] == 1
    assert rows[1]["clean_text"] == "other"
    assert rows[2]["clean_text"] == "" and rows[2]["n_kept"] == 0
    assert rows[3]["clean_text"] == "solo text"
    assert rows[3]["n_removed"] == 0


def test_line_dedup_no_duplicates(ray_session, tmp_path):
    """With no cross-doc duplicate line anywhere the all-empty cov
    path (join skipped) passes every doc through unchanged."""
    import ocr_engine_ray.pipelines.queries as q

    _write_docs(tmp_path, ["a\nb", "c", "d\ne\nf"], ["s"] * 3)
    rows = {r["doc_id"]: r
            for r in q.q_documents_line_dedup(str(tmp_path)).take_all()}
    assert all(r["n_removed"] == 0 for r in rows.values())
    assert rows[2]["clean_text"] == "d\ne\nf"
    assert rows[2]["n_kept"] == 3

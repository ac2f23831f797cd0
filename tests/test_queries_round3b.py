"""Round-3 THIRD-batch operators: two-pass exact heavy hitters,
grouped quantiles (disc + cont), rolling distinct, co-occurrence,
TF-IDF pair join, transcript boilerplate mining, median/MAD outliers,
grouped HLL.  Each test pins the edge the sf0.01 oracle corpus may
not exercise (candidate superset under adversarial batching, quantile
rank/interpolation conventions, NULL domains, single-day windows,
df-cap pruning, row-grain dedup)."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _tab(ds) -> pa.Table:
    rows = ds.take_all()
    return pa.Table.from_pylist(rows)


def test_heavy_hitters_candidate_superset_adversarial(ray_session,
                                                      tmp_path):
    """A globally heavy bucket spread thin across batches must still be
    found: by pigeonhole it is locally heavy in ≥1 batch.  Every 10th
    of 3000 rows is bucket 0, interleaved with near-unique noise —
    locally ≥ 1/300 of every batch by construction."""
    import ocr_engine_ray.pipelines.queries as q

    n = 3000
    vals = np.where(np.arange(n) % 10 == 0, 5.0,
                    1000.0 + np.arange(n) * 10.0)
    pq.write_table(pa.table({"value": vals}),
                   str(tmp_path / "events.parquet"))
    got = _tab(q.q_events_heavy_hitters(str(tmp_path)))
    rows = {r["bucket"]: r["n_occurrences"] for r in got.to_pylist()}
    assert rows[0] == 300  # every 10th row is 5.0 → bucket 0
    # noise buckets hold 1 row each — far below n/300 = 10
    assert all(b == 0 or c * 300 >= n for b, c in rows.items())


def test_grouped_quantiles_upper_tail_rank(ray_session, tmp_path):
    """ceil(n*q)-1 convention: q90 of 10 distinct values picks index 8
    (the floor((n-1)q) convention would pick 8 too, but q75 of 10
    separates them: ceil(7.5)-1 = 7 vs floor(6.75) = 6)."""
    import duckdb

    from ocr_engine_ray.stages.quantiles import grouped_exact_quantiles
    import ray.data as rd

    tab = pa.table({"g": ["a"] * 10, "v": [float(i) for i in range(10)]})
    pq.write_table(tab, str(tmp_path / "t.parquet"))
    ds = rd.read_parquet(str(tmp_path / "t.parquet"))
    got = _tab(grouped_exact_quantiles(ds, "g", "v", qs=(0.75, 0.9)))
    duck = duckdb.sql(
        "SELECT quantile_disc(v, 0.75) q75, quantile_disc(v, 0.9) q90 "
        "FROM tab GROUP BY g").fetchone()
    assert (got.column("q75")[0].as_py(), got.column("q90")[0].as_py()) \
        == duck == (7.0, 8.0)


def test_grouped_quantiles_skips_nulls(ray_session, tmp_path):
    from ocr_engine_ray.stages.quantiles import grouped_exact_quantiles
    import ray.data as rd

    tab = pa.table({"g": ["a"] * 4,
                    "v": pa.array([1.0, None, 3.0, None], pa.float64())})
    pq.write_table(tab, str(tmp_path / "t.parquet"))
    ds = rd.read_parquet(str(tmp_path / "t.parquet"))
    got = _tab(grouped_exact_quantiles(ds, "g", "v", qs=(0.5,)))
    assert got.column("q50")[0].as_py() == 1.0  # ceil(2*0.5)-1 = 0


def test_rolling_distinct_window_edges(ray_session, tmp_path):
    """User active on day 0 serves windows 0..6 only; the same user
    twice in one window counts once."""
    import ocr_engine_ray.pipelines.queries as q

    DAY = 86_400_000_000
    ts = pa.array([0, 2 * DAY, 6 * DAY, 7 * DAY, 7 * DAY + 1],
                  pa.int64()).cast(pa.timestamp("us"))
    uid = pa.array([1, 1, 2, 1, 3], pa.int64())
    pq.write_table(pa.table({"user_id": uid, "ts": ts}),
                   str(tmp_path / "events.parquet"))
    got = {r["day"].timestamp() * 1e6 / DAY: r["n_users_7d"]
           for r in _tab(q.q_events_rolling_distinct(str(tmp_path)))
           .to_pylist()}
    # observed days: 0, 2, 6, 7
    assert got == {0.0: 1,       # user 1 (day 0)
                   2.0: 1,       # user 1 (days 0,2 dedup)
                   6.0: 2,       # users 1, 2
                   7.0: 3}       # users 1 (days 2,7), 2 (6), 3 (7)


def test_cooccurrence_counts_users_not_events(ray_session, tmp_path):
    import ocr_engine_ray.pipelines.queries as q

    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
        "event_type": ["a", "a", "b", "b", "a", "b", "a"],
    }), str(tmp_path / "events.parquet"))
    got = _tab(q.q_events_cooccurrence(str(tmp_path))).to_pylist()
    # users 1 and 2 have both a and b (repeat events count once);
    # user 3 has only a → no pair
    assert got == [{"type_a": "a", "type_b": "b", "n_users": 2}]


def test_tfidf_pairs_df_cap_prunes_hot_terms(ray_session, tmp_path):
    """A bigram present in >5 % of docs contributes nothing; two docs
    sharing only rare bigrams survive with an exact integer dot."""
    import ocr_engine_ray.pipelines.queries as q

    # 40 docs: 38 share the hot bigram 'x y'; docs 0 and 1 also share
    # the rare 'p q' (df=2 ≤ 40/20) many times over
    rare = " ".join(["p q"] * 40)
    texts = [rare, rare] + ["x y"] * 38
    pq.write_table(pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": texts,
    }), str(tmp_path / "documents.parquet"))
    got = _tab(q.q_documents_tfidf_pairs(str(tmp_path))).to_pylist()
    assert [(r["doc_a"], r["doc_b"]) for r in got] == [(0, 1)]
    # dot = tf_a·tf_b·qi², qi = round(ln(40/2)·1000) = 2996, tf = 40
    # for 'p q' plus the interleaved 'q p' bigrams (39 of them)
    r = got[0]
    qi = round(math.log(40 / 2) * 1000)
    assert r["dot"] == 40 * 40 * qi * qi + 39 * 39 * qi * qi


def test_boilerplate_row_grain_and_trim(ray_session, tmp_path, monkeypatch):
    """Intra-turn repeats count once; duplicate rows count separately;
    trim is space-only (a tab-indented line stays distinct)."""
    import ocr_engine_ray.pipelines.queries as q

    tab = pa.table({"text": ["A\nA\n B ", "A\n\tA", "A\n B", None]})
    p = tmp_path / "shard.parquet"
    pq.write_table(tab, str(p))
    monkeypatch.setattr(q, "transcript_paths", lambda sf_dir: [str(p)])
    got = {r["line"]: r["n_turns"]
           for r in _tab(q.q_transcripts_boilerplate(str(tmp_path)))
           .to_pylist()}
    # threshold 1% of 4 rows → every line qualifies
    assert got == {"A": 3,        # once per row, intra-row dedup
                   "B": 2,        # ' B ' and ' B' both trim to B
                   "\tA": 1}      # tab survives the space-only trim


def test_quantiles_cont_interpolation_matches_duckdb(ray_session,
                                                     tmp_path):
    """quantile_cont operand order (lo·(1−frac) + hi·frac) on values
    where lo + (hi−lo)·frac differs in the last ulp, plus the n=1
    degenerate group (frac irrelevant, lo == hi)."""
    import duckdb
    import ray.data as rd

    from ocr_engine_ray.stages.quantiles import grouped_quantiles_cont

    vals = [449.71, 449.84, 12.07, 383.2, 0.13, 7.77]
    tab = pa.table({"g": ["a"] * 6 + ["b"],
                    "v": pa.array(vals + [42.5], pa.float64())})
    pq.write_table(tab, str(tmp_path / "t.parquet"))
    ds = rd.read_parquet(str(tmp_path / "t.parquet"))
    got = _tab(grouped_quantiles_cont(ds, "g", "v", qs=(0.33, 0.9))) \
        .sort_by("g")
    duck = duckdb.sql(
        "SELECT g, quantile_cont(v, 0.33) q33, quantile_cont(v, 0.9) q90 "
        "FROM tab GROUP BY g ORDER BY g").fetchall()
    for row, (g, q33, q90) in zip(got.to_pylist(), duck):
        assert row["g"] == g
        assert row["q33"] == q33 and row["q90"] == q90  # bit-exact


def test_value_outliers_mad_known_values(ray_session, tmp_path):
    """9 values at 10±ε plus one at 1000: median 10, MAD small, only
    the 1000 survives; a constant group (MAD 0) flags everything
    off-median and nothing at it (strict >)."""
    import ocr_engine_ray.pipelines.queries as q

    vals = [9.0, 9.5, 10.0, 10.0, 10.0, 10.5, 10.5, 11.0, 11.0, 1000.0]
    tab = pa.table({
        "event_id": pa.array(range(14), pa.int64()),
        "event_type": ["a"] * 10 + ["c"] * 4,
        "value": pa.array(vals + [5.0, 5.0, 5.0, 6.0], pa.float64()),
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    got = _tab(q.q_events_value_outliers(str(tmp_path))).sort_by(
        "event_id").to_pylist()
    ids = [r["event_id"] for r in got]
    # group a: median 10, MAD = median(|v-10|) = 0.5 → thr 1.5;
    # only 1000.0 (id 9) exceeds it.  group c: median 5, MAD 0 →
    # 6.0 (id 13) is an outlier, the 5.0s are not (strict >).
    assert ids == [9, 13]


def test_grouped_hll_error_bound(ray_session, tmp_path):
    """Per-group HLL estimates within 5% of exact on skewed group
    sizes (10 vs 5000 distinct), and merge-order-independent."""
    import numpy as np
    import ray.data as rd

    from ocr_engine_ray.stages.sketches import approx_distinct_per_group

    rng = np.random.default_rng(11)
    small = rng.choice(10, 4000)
    big = rng.choice(5000, 40000)
    tab = pa.table({
        "g": ["s"] * 4000 + ["b"] * 40000,
        "v": pa.array(np.concatenate([small, big]), pa.int64()),
    })
    pq.write_table(tab, str(tmp_path / "t.parquet"))
    ds = rd.read_parquet(str(tmp_path / "t.parquet"))
    got = {r["g"]: r["approx_distinct"]
           for r in approx_distinct_per_group(ds, "g", "v").to_pylist()}
    exact = {"s": len(set(small.tolist())), "b": len(set(big.tolist()))}
    for k in exact:
        assert abs(got[k] - exact[k]) / exact[k] < 0.05, (k, got[k], exact[k])


def test_quantile_conventions_random_vs_duckdb(ray_session, tmp_path):
    """Randomized pin of BOTH quantile conventions (disc = ceil(nq)−1
    element pick, cont = lo·(1−frac)+hi·frac interpolation) against
    DuckDB across group sizes including 1, 2 and duplicate-heavy
    domains — the convention class that shipped a silent off-by-one
    until events' near-unique domain exposed it."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from ocr_engine_ray.stages.quantiles import (
        grouped_exact_quantiles, grouped_quantiles_cont,
    )

    rng = np.random.default_rng(23)
    gs, vs = [], []
    for gi, size in enumerate([1, 2, 3, 7, 50, 333]):
        gs += [f"g{gi}"] * size
        # mix near-unique doubles and heavy duplicates
        pool = rng.uniform(0, 100, max(2, size // 3)).round(2)
        vs += rng.choice(pool, size).tolist()
    tab = pa.table({"g": gs, "v": pa.array(vs, pa.float64())})
    pq.write_table(tab, str(tmp_path / "t.parquet"))
    ds = rd.read_parquet(str(tmp_path / "t.parquet"))
    qs = (0.01, 0.25, 0.5, 0.77, 0.9, 0.99)
    sel_d = ", ".join(f"quantile_disc(v, {q}) AS q{i}"
                      for i, q in enumerate(qs))
    sel_c = ", ".join(f"quantile_cont(v, {q}) AS q{i}"
                      for i, q in enumerate(qs))
    duck_d = {r[0]: r[1:] for r in duckdb.sql(
        f"SELECT g, {sel_d} FROM tab GROUP BY g").fetchall()}
    duck_c = {r[0]: r[1:] for r in duckdb.sql(
        f"SELECT g, {sel_c} FROM tab GROUP BY g").fetchall()}
    names = [f"q{int(round(q * 100))}" for q in qs]
    got_d = {r["g"]: tuple(r[n] for n in names) for r in
             _tab(grouped_exact_quantiles(ds, "g", "v", qs=qs)).to_pylist()}
    got_c = {r["g"]: tuple(r[n] for n in names) for r in
             _tab(grouped_quantiles_cont(ds, "g", "v", qs=qs)).to_pylist()}
    assert got_d == duck_d          # element picks: exact equality
    assert got_c == duck_c          # interpolation: bit-exact doubles


def test_grouped_quantiles_all_null_group_matches_duckdb(ray_session,
                                                         tmp_path):
    """A key whose values are ALL NULL must still emit its GROUP BY
    row (NULL quantiles), like DuckDB — dropping the key is a
    row-count mismatch on nullable columns."""
    import duckdb
    import ray.data as rd

    from ocr_engine_ray.stages.quantiles import (
        grouped_exact_quantiles, grouped_quantiles_cont,
    )

    tab = pa.table({"g": ["a", "a", "n", "n"],
                    "v": pa.array([1.0, 3.0, None, None], pa.float64())})
    pq.write_table(tab, str(tmp_path / "t.parquet"))
    ds = rd.read_parquet(str(tmp_path / "t.parquet"))
    for fn, duck_fn in [(grouped_exact_quantiles, "quantile_disc"),
                        (grouped_quantiles_cont, "quantile_cont")]:
        got = {r["g"]: r["q50"] for r in
               _tab(fn(ds, "g", "v", qs=(0.5,))).to_pylist()}
        duck = {r[0]: r[1] for r in duckdb.sql(
            f"SELECT g, {duck_fn}(v, 0.5) FROM tab GROUP BY g").fetchall()}
        assert got == duck and got["n"] is None


def test_outliers_and_heavy_hitters_null_values(ray_session, tmp_path):
    """NULL event values: outliers drops them (NULL comparisons are
    never outliers, and an all-NULL type must not crash the median
    lookup); heavy hitters counts the NULL bucket exactly as the
    twin's COUNT(*) GROUP BY does."""
    import ocr_engine_ray.pipelines.queries as q

    vals = [5.0] * 6 + [None] * 6 + [1000.0] + \
        [2000.0 + i for i in range(7)]
    tab = pa.table({
        "event_id": pa.array(range(20), pa.int64()),
        "event_type": ["a"] * 13 + ["nul"] * 7,
        "value": pa.array(vals[:13] + [None] * 7, pa.float64()),
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    got = _tab(q.q_events_value_outliers(str(tmp_path))).to_pylist()
    # type a: median 5, MAD 0 → only 1000.0 flags; type nul all-NULL →
    # no rows, no KeyError
    assert [r["event_id"] for r in got] == [12]
    hh = {r["bucket"]: r["n_occurrences"]
          for r in _tab(q.q_events_heavy_hitters(str(tmp_path)))
          .to_pylist()}
    # 20 rows, THRESH 1/300 → every bucket qualifies: 6×bucket-0,
    # 13×NULL, 1×bucket-100
    assert hh == {0: 6, None: 13, 100: 1}


def test_containment_catches_truncated_copy(ray_session, tmp_path):
    """A prefix copy whose symmetric jaccard is far below 0.5 is still
    a containment hit; identical shingle sets emit both directions."""
    import ocr_engine_ray.pipelines.queries as q

    base = " ".join(f"w{i}" for i in range(40))
    prefix = " ".join(f"w{i}" for i in range(10))   # jaccard 8/38 ≈ 0.21
    tab = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": [base, prefix, "x y z", "x y z"],
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = sorted((r["sub_id"], r["super_id"], r["n_shared"]) for r in
                 _tab(q.q_documents_containment_pairs(str(tmp_path)))
                 .to_pylist())
    # 2 ⊆ 1 (8 shared 3-grams = all of doc 2's); 3 ≡ 4 → both ways
    assert got == [(2, 1, 8), (3, 4, 1), (4, 3, 1)]


def test_zscore_known_values_and_zero_variance(ray_session, tmp_path):
    """z-scores on a known distribution; a zero-variance type emits no
    rows (the twin's std > 0 gate); NULL values excluded."""
    import math

    import ocr_engine_ray.pipelines.queries as q

    tab = pa.table({
        "event_id": pa.array(range(7), pa.int64()),
        "event_type": ["a"] * 4 + ["flat"] * 3,
        "value": pa.array([1.0, 3.0, None, 5.0, 2.0, 2.0, 2.0],
                          pa.float64()),
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    got = {r["event_id"]: r["z"] for r in
           _tab(q.q_events_value_zscore(str(tmp_path))).to_pylist()}
    # type a: cents (100, 300, 500): mean 3.0, var = (3*350000-810000)/9/1e4
    n, s, s2 = 3, 900, 350000
    mean = float(s) / n / 100.0
    std = math.sqrt(float(n * s2 - s * s) / n / n / 10000.0)
    assert set(got) == {0, 1, 3}          # NULL and flat-type dropped
    for eid, v in [(0, 1.0), (1, 3.0), (3, 5.0)]:
        assert got[eid] == (v - mean) / std


def test_kgram_rows_vectorized_matches_reference(ray_session):
    """_doc_kgram_rows (vectorized takes + binary_join) equals a
    straightforward per-row shingle set, incl. short-doc exclusion."""
    from ocr_engine_ray.pipelines.queries import _doc_kgram_rows

    b = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["a b c d e f", "a b", "x x x x x"]})
    got = _doc_kgram_rows("doc_id", 5)(b)
    rows = sorted(zip(got.column("doc_id").to_pylist(),
                      got.column("sh").to_pylist()))
    ref = []
    for did, txt in zip([1, 2, 3], b.column("text").to_pylist()):
        toks = txt.split(" ")
        ref += sorted({(did, " ".join(toks[i:i + 5]))
                       for i in range(len(toks) - 4)})
    assert rows == sorted(ref)     # doc 2 (too short) contributes none


def test_token_budget_boundary_inclusive(ray_session, tmp_path):
    """The doc that exactly reaches the budget stays; the next one in
    md5 order is cut — mirroring the twin's cum <= B window."""
    import ocr_engine_ray.pipelines.queries as q
    from ocr_engine_ray.stages.partition import row_hash_hex

    ids = list(range(10))
    order = sorted(ids, key=lambda i: (row_hash_hex((i,), 11), i))
    # 100 tokens per doc → exactly 8 docs fit an 800-token budget
    tab = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "source": ["s"] * 10,
                    "text": [" ".join(["t"] * 100)] * 10})
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = {r["doc_id"] for r in
           _tab(q.q_documents_token_budget_sample(str(tmp_path)))
           .to_pylist()}
    assert got == set(order[:8])


def test_length_filter_per_source_bounds(ray_session, tmp_path):
    """Each source gets its own [p5, p95] cut; boundary docs stay
    (inclusive), extremes drop — per source, not globally."""
    import ocr_engine_ray.pipelines.queries as q

    # source a: lengths 1..20 (p5=1, p95=19 by ceil(nq)-1) ;
    # source b: constant 100 → nothing drops
    texts_a = [" ".join(["t"] * n) for n in range(1, 21)]
    texts_b = [" ".join(["t"] * 100)] * 3
    tab = pa.table({
        "doc_id": pa.array(range(23), pa.int64()),
        "source": ["a"] * 20 + ["b"] * 3,
        "text": texts_a + texts_b,
    })
    pq.write_table(tab, str(tmp_path / "documents.parquet"))
    got = {r["doc_id"]: r["n_tokens"] for r in
           _tab(q.q_documents_length_filter(str(tmp_path))).to_pylist()}
    import duckdb
    lo, hi = duckdb.sql(
        "SELECT quantile_disc(n, 0.05), quantile_disc(n, 0.95) FROM "
        "(SELECT unnest(range(1, 21)) n)").fetchone()
    kept_a = {i for i, n in enumerate(range(1, 21)) if lo <= n <= hi}
    assert set(got) == kept_a | {20, 21, 22}


def test_latest_per_user_tiebreak_and_roundtrip(ray_session, tmp_path):
    """Equal timestamps break by event_id; awkward doubles (0.615,
    1/3) survive the packed-string round trip bit-exact."""
    import ocr_engine_ray.pipelines.queries as q

    DAY = 86_400_000_000
    tab = pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([DAY, 2 * DAY, 2 * DAY, DAY],
                       pa.int64()).cast(pa.timestamp("us")),
        "event_id": pa.array([9, 3, 7, 1], pa.int64()),
        "event_type": ["a", "b", "c", "d"],
        "value": pa.array([1.0, 0.615, 1 / 3, -0.0], pa.float64()),
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    got = {r["user_id"]: r for r in
           _tab(q.q_events_latest_per_user(str(tmp_path))).to_pylist()}
    assert got[1]["event_id"] == 7 and got[1]["event_type"] == "c"
    assert got[1]["value"] == 1 / 3          # bit-exact round trip
    assert got[2]["value"] == 0.0


def test_latest_per_user_null_payloads(ray_session, tmp_path):
    """A NULL-valued latest row must WIN (not be skipped by Max over a
    nulled packed string) — matching the twin's ROW_NUMBER."""
    import ocr_engine_ray.pipelines.queries as q

    DAY = 86_400_000_000
    tab = pa.table({
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "ts": pa.array([DAY, 2 * DAY, DAY, 2 * DAY],
                       pa.int64()).cast(pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "event_type": pa.array(["a", None, "c", "d"], pa.string()),
        "value": pa.array([5.0, None, 1.0, None], pa.float64()),
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    got = {r["user_id"]: r for r in
           _tab(q.q_events_latest_per_user(str(tmp_path))).to_pylist()}
    assert got[1]["event_id"] == 2 and got[1]["event_type"] is None \
        and got[1]["value"] is None
    assert got[2]["event_id"] == 4 and got[2]["event_type"] == "d"


def test_token_budget_and_length_filter_null_text(ray_session,
                                                  tmp_path):
    """NULL-text docs: the budget walk carries them at weight 0 (twin's
    SUM OVER skips NULLs) unless the whole prefix is NULL; the length
    gate drops them and an all-NULL source crashes neither."""
    import duckdb

    import ocr_engine_ray.pipelines.queries as q

    tab = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "source": ["s"] * 4 + ["allnull"] * 2,
        "text": pa.array([" ".join(["t"] * 50), None,
                          " ".join(["t"] * 50), " ".join(["t"] * 700),
                          None, None], pa.string()),
    })
    p = tmp_path / "documents.parquet"
    pq.write_table(tab, str(p))
    got_rows = q.q_documents_token_budget_sample(str(tmp_path)).take_all()
    oracle = duckdb.sql(f"""
        WITH t AS (SELECT doc_id, source,
                          CAST(len(string_split(text,' ')) AS BIGINT) n_tokens,
                          md5(doc_id::VARCHAR || chr(31) || '11') h
                   FROM read_parquet('{p}')),
        w AS (SELECT *, SUM(n_tokens) OVER (
                  PARTITION BY source ORDER BY h, doc_id) cum FROM t)
        SELECT doc_id FROM w WHERE cum <= 800 ORDER BY doc_id""").fetchall()
    assert sorted(r["doc_id"] for r in got_rows) == \
        [r[0] for r in oracle]
    assert len(got_rows) > 0          # the corpus makes the gate bite
    # length gate: never crashes on the all-NULL source, drops NULLs
    lf = _tab(q.q_documents_length_filter(str(tmp_path)))
    assert set(lf.column("doc_id").to_pylist()) <= {0, 2, 3}


def test_cluster_sample_keeps_whole_conversations(ray_session,
                                                  monkeypatch,
                                                  tmp_path):
    """Every sampled conversation arrives COMPLETE (the point of
    cluster vs row sampling), and the keep set is conv-hash-stable."""
    import ocr_engine_ray.pipelines.queries as q

    tab = pa.table({
        "conv_id": [f"c{i}" for i in range(30) for _ in range(4)],
        "turn_idx": pa.array(list(range(4)) * 30, pa.int32()),
        "role": ["user"] * 120,
        "text": ["hi"] * 120,
    })
    p = tmp_path / "shard.parquet"
    pq.write_table(tab, str(p))
    monkeypatch.setattr(q, "transcript_paths", lambda sf_dir: [str(p)])
    rows = _tab(q.q_transcripts_cluster_sample(str(tmp_path))).to_pylist()
    from collections import Counter

    per_conv = Counter(r["conv_id"] for r in rows)
    assert per_conv and all(n == 4 for n in per_conv.values())


def test_hour_profile_and_cluster_sample_null_keys(ray_session,
                                                   monkeypatch,
                                                   tmp_path):
    """NULL ts groups under a NULL hour (like date_part(NULL)); NULL
    conv_id rows silently drop (like the twin's NULL md5 predicate)."""
    import ocr_engine_ray.pipelines.queries as q

    pq.write_table(pa.table({
        "ts": pa.array([3_600_000_000, None], pa.int64())
        .cast(pa.timestamp("us")),
        "value": pa.array([1.0, 2.0], pa.float64()),
    }), str(tmp_path / "events.parquet"))
    got = {r["hour"]: (r["n_events"], r["sum_value"]) for r in
           _tab(q.q_events_hour_profile(str(tmp_path))).to_pylist()}
    assert got == {1: (1, 1.0), None: (1, 2.0)}

    p = tmp_path / "shard.parquet"
    pq.write_table(pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(30)] + [None],
                            pa.string()),
        "turn_idx": pa.array(range(31), pa.int32()),
        "role": ["user"] * 31, "text": ["hi"] * 31,
    }), str(p))
    monkeypatch.setattr(q, "transcript_paths", lambda sf_dir: [str(p)])
    rows = _tab(q.q_transcripts_cluster_sample(str(tmp_path))).to_pylist()
    assert rows and all(r["conv_id"] is not None for r in rows)


def test_right_join_preserves_orderless_customers(ray_session,
                                                  tmp_path):
    import ocr_engine_ray.pipelines.queries as q

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 10, 20], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 20, 30], pa.int64()),
        "c_name": ["a", "b", "c"],
    }), str(tmp_path / "customer.parquet"))
    got = {r["c_custkey"]: r["n_orders"] for r in
           _tab(q.q_orders_customer_right_join(str(tmp_path)))
           .to_pylist()}
    assert got == {10: 2, 20: 1, 30: None}


def test_orphan_audit_finds_planted_violation(ray_session, tmp_path):
    """The audit is not vacuous: a planted orphan order surfaces."""
    import ocr_engine_ray.pipelines.queries as q

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 99], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    got = q.q_orders_orphans(str(tmp_path))
    assert got.to_pylist() == [{"o_orderkey": 2, "o_custkey": 99}]


def test_user_growth_counts_first_appearance_only(ray_session,
                                                  tmp_path):
    """A user active on many days counts as new exactly once; days with
    no first-timers still appear with n_new 0 and a flat cumulative."""
    import ocr_engine_ray.pipelines.queries as q

    DAY = 86_400_000_000
    tab = pa.table({
        "user_id": pa.array([1, 1, 2, 1, 3, 2], pa.int64()),
        "ts": pa.array([0, DAY, DAY, 2 * DAY, 3 * DAY, 3 * DAY],
                       pa.int64()).cast(pa.timestamp("us")),
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    got = [(r["n_new_users"], r["cum_users"]) for r in
           q.q_events_user_growth(str(tmp_path)).to_pylist()]
    assert got == [(1, 1), (1, 2), (0, 2), (1, 3)]


def test_median_gap_convention_and_single_event_drop(ray_session,
                                                     tmp_path):
    """Even gap count picks the LOWER middle (ceil(n·0.5)−1, DuckDB
    quantile_disc); single-event users emit nothing."""
    import ocr_engine_ray.pipelines.queries as q

    tab = pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, 10, 40, 5], pa.int64())
        .cast(pa.timestamp("us")),
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
    })
    pq.write_table(tab, str(tmp_path / "events.parquet"))
    got = _tab(q.q_events_median_gap(str(tmp_path))).to_pylist()
    # user 1 gaps [10, 30] → median picks index ceil(2·0.5)−1 = 0 → 10
    assert got == [{"user_id": 1, "n_gaps": 2, "median_gap_us": 10}]

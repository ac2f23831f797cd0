"""Exact quantiles, t-digest sketch, deterministic sampling, range join."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from ocr_engine_ray.stages.partition import (
    deterministic_sample, sample_threshold_hex, stratified_sample,
)
from ocr_engine_ray.stages.quantiles import TDigest, approx_quantiles, exact_quantiles


def test_exact_quantiles_match_duckdb(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(3)
    vals = rng.randint(1, 51, size=5000).astype(np.float64)
    other = np.round(rng.uniform(0, 0.1, size=5000), 2)
    tab = pa.table({"a": pa.array(vals), "b": pa.array(other)})
    got = exact_quantiles(rd.from_arrow(tab).repartition(6), ["a", "b"])
    con = duckdb.connect()
    con.register("t", tab)
    for i, col in enumerate(got.column("col").to_pylist()):
        for q, name in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75")):
            want = con.sql(
                f"SELECT quantile_disc({col}, {q}) FROM t").fetchone()[0]
            assert got.column(name)[i].as_py() == want, (col, q)


def test_tdigest_error_bound(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(11)
    vals = rng.standard_normal(20000)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals)})).repartition(8)
    est = approx_quantiles(ds, "x", qs=(0.25, 0.5, 0.75, 0.99))
    for q, e in est.items():
        exact = np.quantile(vals, q)
        # absolute error on a unit-variance distribution
        assert abs(e - exact) < 0.05, (q, e, exact)


def test_tdigest_merge_associative():
    rng = np.random.RandomState(5)
    a, b = rng.uniform(0, 1, 3000), rng.uniform(2, 3, 3000)
    d1 = TDigest().add(a)
    d2 = TDigest().add(b)
    merged = d1.merge(d2)
    assert abs(merged.quantile(0.5) - np.quantile(np.concatenate([a, b]), 0.5)) < 0.15


def test_deterministic_sample_requires_id_cols(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
    with pytest.raises(ValueError, match="id_cols"):
        deterministic_sample(ds, 0.5, [])


def test_deterministic_sample_stable_across_partitioning(ray_session):
    import ray.data as rd

    tab = pa.table({"id": pa.array(list(range(2000)), pa.int64())})
    a = sorted(r["id"] for r in deterministic_sample(
        rd.from_arrow(tab), 0.2, ["id"]).take_all())
    b = sorted(r["id"] for r in deterministic_sample(
        rd.from_arrow(tab).repartition(7), 0.2, ["id"]).take_all())
    assert a == b
    assert 0.15 < len(a) / 2000 < 0.25


def test_deterministic_sample_matches_duckdb(ray_session):
    """The keep decision is exactly reproducible in SQL — the property
    the driver's oracle relies on."""
    import ray.data as rd

    tab = pa.table({"id": pa.array(list(range(500)), pa.int64())})
    got = sorted(r["id"] for r in deterministic_sample(
        rd.from_arrow(tab), 0.3, ["id"], seed=42).take_all())
    con = duckdb.connect()
    con.register("t", tab)
    thr = sample_threshold_hex(0.3)
    want = [r[0] for r in con.sql(
        "SELECT id FROM t WHERE substr(md5(id::VARCHAR || chr(31) || '42'),"
        f" 1, 8) <= '{thr}' ORDER BY id").fetchall()]
    assert got == want


def test_stratified_sample_within_strata(ray_session):
    """Each stratum keeps a ~frac subset (not all-or-nothing)."""
    import ray.data as rd

    rows = [{"k": f"s{s}", "i": i} for s in range(5) for i in range(400)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    kept = stratified_sample(ds, "k", 0.3, id_cols=["i"]).take_all()
    by_stratum: dict = {}
    for r in kept:
        by_stratum.setdefault(r["k"], 0)
        by_stratum[r["k"]] += 1
    assert set(by_stratum) == {f"s{s}" for s in range(5)}
    for n in by_stratum.values():
        assert 0.18 * 400 < n < 0.45 * 400


def test_range_join_matches_duckdb(ray_session):
    from ocr_engine_ray.pipelines.queries import q_events_range_join

    sf_dir = "/root/testdata/sf0.001"
    got = pa.Table.from_pylist(q_events_range_join(sf_dir).take_all())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = con.sql("""
        SELECT p.event_id, CAST(COUNT(v.event_id) AS BIGINT) AS n_views_1h
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id
             AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
        GROUP BY p.event_id ORDER BY p.event_id
    """).fetchall()
    got_map = dict(zip(got.column("event_id").to_pylist(),
                       got.column("n_views_1h").to_pylist()))
    assert got_map == dict(want)
    assert any(v > 0 for v in got_map.values())


def test_ivf_topk_exact_when_probing_all(ray_session):
    """n_probe == n_centroids scans everything → identical to the exact
    brute-force top-k (including tie handling)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_engine_ray.stages.similarity import brute_force_topk, ivf_topk

    sf = "/root/testdata/sf0.001"
    qtab = pq.read_table(f"{sf}/embeddings.parquet",
                         filters=[("vec_id", "<", 4)],
                         columns=["vec_id", "embedding"]).sort_by("vec_id")
    queries = qtab.column("embedding").to_pylist()
    qids = qtab.column("vec_id").to_pylist()
    ds = rd.read_parquet(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    exact = brute_force_topk(ds, queries, qids, k=5).to_pylist()
    ivf_all = ivf_topk(ds, queries, qids, k=5, n_centroids=8,
                       n_probe=8).to_pylist()
    assert ivf_all == exact


def test_ivf_topk_recall(ray_session):
    """Probing a fraction of trained clusters keeps high top-k recall."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_engine_ray.stages.similarity import brute_force_topk, ivf_topk

    sf = "/root/testdata/sf0.01"
    qtab = pq.read_table(f"{sf}/embeddings.parquet",
                         filters=[("vec_id", "<", 8)],
                         columns=["vec_id", "embedding"]).sort_by("vec_id")
    queries = qtab.column("embedding").to_pylist()
    qids = qtab.column("vec_id").to_pylist()
    ds = rd.read_parquet(f"{sf}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    exact = {(r["query_id"], r["vec_id"])
             for r in brute_force_topk(ds, queries, qids, k=5).to_pylist()}
    approx = {(r["query_id"], r["vec_id"])
              for r in ivf_topk(ds, queries, qids, k=5, n_centroids=16,
                                n_probe=6).to_pylist()}
    assert len(approx & exact) / len(exact) >= 0.5


def test_weighted_sample_proportional(ray_session):
    """Heavier rows are kept more often; decision is stable across
    partitionings."""
    import ray.data as rd

    from ocr_engine_ray.stages.partition import weighted_sample

    rows = [{"id": i, "w": 1.0 if i < 2000 else 10.0} for i in range(2400)]
    tab = pa.Table.from_pylist(rows)
    kept = weighted_sample(rd.from_arrow(tab), "w", 0.1, ["id"]).take_all()
    light = sum(1 for r in kept if r["id"] < 2000)
    heavy = sum(1 for r in kept if r["id"] >= 2000)
    # E[light] = 2000 * 0.1 * 1/mean, E[heavy] = 400 * 0.1 * 10/mean
    # mean = (2000 + 4000)/2400 = 2.5 → E[light]=80, E[heavy]=160
    assert 40 < light < 130
    assert 110 < heavy < 220
    again = weighted_sample(rd.from_arrow(tab).repartition(7), "w", 0.1,
                            ["id"]).take_all()
    assert sorted(r["id"] for r in kept) == sorted(r["id"] for r in again)


def test_reservoir_per_key(ray_session):
    import ray.data as rd

    from ocr_engine_ray.stages.partition import reservoir_per_key

    rows = [{"k": s % 5, "id": s} for s in range(500)]
    tab = pa.Table.from_pylist(rows)
    kept = reservoir_per_key(rd.from_arrow(tab), "k", 3, ["id"]).take_all()
    by_key: dict = {}
    for r in kept:
        by_key.setdefault(r["k"], []).append(r["id"])
    assert set(by_key) == set(range(5))
    assert all(len(v) == 3 for v in by_key.values())
    again = reservoir_per_key(rd.from_arrow(tab).repartition(9), "k", 3,
                              ["id"]).take_all()
    assert sorted((r["k"], r["id"]) for r in kept) \
        == sorted((r["k"], r["id"]) for r in again)


def test_bloom_filter_properties():
    """No false negatives; merge = union; FP rate sane at design load."""
    import numpy as np

    from ocr_engine_ray.stages.partition import BloomFilter

    rng = np.random.RandomState(3)
    present = rng.randint(0, 2**62, size=5000).astype(np.uint64)
    absent = rng.randint(0, 2**62, size=5000).astype(np.uint64)
    absent = absent[~np.isin(absent, present)]
    a = BloomFilter(1 << 20, 4)
    a.add(present[:2500])
    b = BloomFilter(1 << 20, 4)
    b.add(present[2500:])
    a.merge(b)
    assert a.contains(present).all()          # never a false negative
    assert a.contains(absent).mean() < 0.01   # FP rate at ~0.5% load


def test_bloom_semi_join_exact(ray_session):
    """bloom_semi_join equals the plain semi-join (false positives
    removed by the exact join)."""
    import ray.data as rd

    from ocr_engine_ray.stages.partition import bloom_semi_join

    big = rd.from_arrow(pa.table({
        "k": pa.array(list(range(1000)), pa.int64()),
        "v": pa.array([f"row{i}" for i in range(1000)], pa.string()),
    })).repartition(4)
    # duplicate keys on the small side must not duplicate big rows
    small = rd.from_arrow(pa.table({
        "sk": pa.array([5, 5, 17, 300, 999, 999, 1500], pa.int64()),
    })).repartition(2)
    out = sorted(r["k"] for r in bloom_semi_join(
        big, small, "k", "sk").take_all())
    assert out == [5, 17, 300, 999]

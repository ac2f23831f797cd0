"""Resumable output + lineage (SURVEY §5.4): kill after k committed
partitions, resume, assert no dupes/gaps via checksums.  Plus metrics
and skew/salting partitioning."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def shard_paths(tmp_path, small_corpus):
    from ocr_engine_ray.sources.synth import materialize_transcripts

    return materialize_transcripts(str(tmp_path / "in"), 600, seed=13, n_shards=4)


def _make_ds(shard):
    from ocr_engine_ray.pipelines.flagship import flagship

    return flagship([shard], concurrency=2, batch_size=128)


def test_resume_skips_committed_no_dupes_no_gaps(ray_session, shard_paths, tmp_path):
    from ocr_engine_ray.state.lineage import load_manifest, run_resumable, table_checksum

    out = str(tmp_path / "out")

    # first run: fail after 2 shards (simulated crash)
    calls = {"n": 0}

    def flaky_make_ds(shard):
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")
        calls["n"] += 1
        return _make_ds(shard)

    with pytest.raises(RuntimeError):
        run_resumable(shard_paths, out, flaky_make_ds)
    first = load_manifest(out)
    assert len(first) == 2

    # resume: only the remaining shards run
    ran = []

    def tracking_make_ds(shard):
        ran.append(os.path.basename(shard))
        return _make_ds(shard)

    new = run_resumable(shard_paths, out, tracking_make_ds)
    assert len(new) == 2
    assert ran == [os.path.basename(p) for p in shard_paths[2:]]

    manifest = load_manifest(out)
    assert len(manifest) == 4

    # no dupes / no gaps: committed output equals a clean single run,
    # proven by the order-insensitive checksum per partition
    for shard in shard_paths:
        rec = manifest[os.path.basename(shard)]
        files = glob.glob(os.path.join(rec.output_path, "*.parquet"))
        assert files, rec.output_path
        got = pa.concat_tables([pq.read_table(f) for f in files])
        assert got.num_rows == rec.row_count
        csum, rows = table_checksum(
            got, ["conv_id", "turn_idx", "extracted_text"])
        assert f"{csum:016x}" == rec.checksum and rows == rec.row_count
        # matches the oracle over the same shard
        from ocr_engine_ray.oracle import oracle_extract
        want = oracle_extract(pq.read_table(shard))
        wsum, wrows = table_checksum(
            want, ["conv_id", "turn_idx", "extracted_text"])
        assert wsum == csum and wrows == rows

    # idempotent: nothing left to do
    assert run_resumable(shard_paths, out, _make_ds) == []

    # tmp dirs cleaned up
    assert not glob.glob(os.path.join(out, ".tmp-*"))


def test_manifest_format(ray_session, shard_paths, tmp_path):
    from ocr_engine_ray.state.lineage import MANIFEST, run_resumable

    out = str(tmp_path / "out2")
    run_resumable(shard_paths[:1], out, _make_ds)
    lines = open(os.path.join(out, MANIFEST)).read().strip().splitlines()
    rec = json.loads(lines[0])
    assert set(rec) == {"input_shard", "partition_id", "output_path",
                        "row_count", "checksum", "committed_at"}


def test_metrics_counters(ray_session, shard_paths, tmp_path):
    import ray

    from ocr_engine_ray.state.metrics import (
        counting_stage, get_or_create_metrics, render_prometheus)

    m = get_or_create_metrics("test_metrics")
    ds = _make_ds(shard_paths[0])
    ds = ds.map_batches(counting_stage(m, "extracted", "extracted_text"),
                        batch_format="pyarrow")
    n = ds.count()
    counters = ray.get(m.get_all.remote())
    assert counters["extracted_rows_total"] == n
    assert counters["extracted_bytes_total"] > 0
    text = render_prometheus(counters)
    assert "# TYPE extracted_rows_total counter" in text


def test_salted_partition_spreads_hot_keys(ray_session, small_corpus):
    import ray.data as rd

    from ocr_engine_ray.stages.partition import detect_hot_keys, salted_partition

    ds = rd.from_arrow(small_corpus)
    hot = detect_hot_keys(ds, "conv_id", threshold_frac=0.05)
    assert len(hot) >= 1  # the synthetic corpus seeds 2 hot conversations

    out = salted_partition(rd.from_arrow(small_corpus), "conv_id",
                           n_buckets=16, hot_keys=hot, salt_factor=4)
    t = pa.Table.from_pylist(out.take_all())
    assert t.num_rows == small_corpus.num_rows  # nothing lost
    by_key: dict[str, set] = {}
    for r in t.to_pylist():
        by_key.setdefault(r["conv_id"], set()).add(r["bucket"])
    for k in hot:
        assert len(by_key[k]) > 1, "hot key must span several buckets"
    cold = [k for k in by_key if k not in hot]
    assert all(len(by_key[k]) == 1 for k in cold), "cold keys stay together"


def test_hot_key_rollup_unaffected_by_salt(ray_session, small_corpus):
    """Salting must not change rollup results (associative combine)."""
    import ray.data as rd

    from ocr_engine_ray.oracle import oracle_conv_rollup, oracle_extract
    from ocr_engine_ray.pipelines.flagship import conv_rollup, extract_validated

    validated = extract_validated(rd.from_arrow(small_corpus).repartition(6),
                                  batch_size=100, concurrency=2)
    got = pa.Table.from_pylist(conv_rollup(validated).take_all()).sort_by("conv_id")
    want = oracle_conv_rollup(oracle_extract(small_corpus))
    assert got.column("n_turns").to_pylist() == want.column("n_turns").to_pylist()


def test_run_resumable_reports_metrics(ray_session, shard_paths, tmp_path):
    import ray

    from ocr_engine_ray.state.lineage import run_resumable
    from ocr_engine_ray.state.metrics import get_or_create_metrics

    m = get_or_create_metrics("lineage_metrics_test")
    out = str(tmp_path / "out3")
    recs = run_resumable(shard_paths[:2], out, _make_ds, metrics=m)
    counters = ray.get(m.get_all.remote())
    assert counters["partitions_committed_total"] == 2.0
    assert counters["rows_committed_total"] == sum(r.row_count for r in recs)


def test_stratified_sample_deterministic_and_proportional(ray_session, small_corpus):
    import ray.data as rd

    from ocr_engine_ray.stages.partition import stratified_sample

    ds1 = stratified_sample(rd.from_arrow(small_corpus), "conv_id", 0.3,
                            id_cols=["conv_id", "turn_idx"])
    ds2 = stratified_sample(rd.from_arrow(small_corpus).repartition(7),
                            "conv_id", 0.3, id_cols=["conv_id", "turn_idx"])
    t1 = pa.Table.from_pylist(ds1.take_all())
    t2 = pa.Table.from_pylist(ds2.take_all())
    k1 = sorted(zip(t1.column("conv_id").to_pylist(),
                    t1.column("turn_idx").to_pylist()))
    k2 = sorted(zip(t2.column("conv_id").to_pylist(),
                    t2.column("turn_idx").to_pylist()))
    assert k1 == k2, "sample must not depend on partitioning"
    frac = t1.num_rows / small_corpus.num_rows
    assert 0.2 < frac < 0.4


def test_compact_partition_preserves_content_and_manifest(ray_session,
                                                          tmp_path):
    """Compaction shrinks the file count, keeps the checksum/rows
    byte-identical, leaves the manifest untouched (resume still skips),
    and a corrupted rewrite would abort before the swap."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_engine_ray.state.lineage import (compact_partition,
                                              load_manifest,
                                              run_resumable)

    shard = str(tmp_path / "in.parquet")
    pq.write_table(pa.table({
        "conv_id": pa.array([f"c{i % 7}" for i in range(200)]),
        "turn_idx": pa.array(range(200), pa.int64()),
        "extracted_text": pa.array([f"t{i}" for i in range(200)]),
    }), shard)
    out = str(tmp_path / "out")

    def make_ds(path):
        # repartition so the partition lands as MANY part files
        return rd.read_parquet(path).repartition(6)

    recs = run_resumable([shard], out, make_ds)
    part = os.path.basename(recs[0].output_path)
    before = len([f for f in os.listdir(recs[0].output_path)
                  if f.endswith(".parquet")])
    assert before > 1

    after = compact_partition(out, part, num_files=1)
    assert after < before

    man = load_manifest(out)
    assert man[os.path.basename(shard)].checksum == recs[0].checksum
    # content identical (order-insensitive)
    got = rd.read_parquet(recs[0].output_path)
    assert got.count() == 200
    # resume still treats the shard as done
    assert run_resumable([shard], out, make_ds) == []

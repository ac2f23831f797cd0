"""Edge cases: empty shards, single rows, all-malformed corpora, config
env overrides."""

import pyarrow as pa
import pytest

from ocr_engine_ray.schema import TRANSCRIPT_SCHEMA, VALIDATED_SCHEMA


def _empty_table() -> pa.Table:
    return pa.Table.from_pydict({n: [] for n in TRANSCRIPT_SCHEMA.names},
                                schema=TRANSCRIPT_SCHEMA)


def test_extract_batch_empty_preserves_schema():
    from ocr_engine_ray.stages.extract import extract_batch

    out = extract_batch(_empty_table())
    assert out.num_rows == 0
    assert out.schema.equals(VALIDATED_SCHEMA)


def test_pipeline_empty_shard(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from ocr_engine_ray.pipelines.flagship import conv_rollup, extract_validated

    p = str(tmp_path / "empty.parquet")
    pq.write_table(_empty_table(), p)
    ds = extract_validated(rd.read_parquet(p), concurrency=1, batch_size=16)
    assert ds.count() == 0
    assert conv_rollup(ds).count() == 0


def test_all_malformed_corpus(ray_session):
    import ray.data as rd

    from ocr_engine_ray.pipelines.flagship import extract_validated

    rows = []
    payloads = ["", "\x00\x01\x02", "<html><body", "%PDF-LAYOUT 1.0\ngarbage",
                "| | | |", ":" * 500, "\n" * 100, "a" * 10_000]
    for i, t in enumerate(payloads):
        rows.append({"conv_id": "c", "turn_idx": i, "role": "user",
                     "text": t, "tool": "", "ts": 1_700_000_000_000_000 + i})
    t = pa.Table.from_pylist(rows).cast(
        pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int64()),
                   ("role", pa.string()), ("text", pa.string()),
                   ("tool", pa.string()), ("ts", pa.timestamp("us"))]))
    t = t.set_column(1, "turn_idx", t.column("turn_idx").cast(pa.int32()))
    out = extract_validated(rd.from_arrow(t), concurrency=1, batch_size=4)
    got = pa.Table.from_pylist(out.take_all())
    assert got.num_rows == len(payloads)
    # nothing poisoned the batch
    assert all(e == "" for e in got.column("extract_error").to_pylist())


def test_config_env_overrides(monkeypatch):
    from ocr_engine_ray import config

    monkeypatch.setenv("OCR_ENGINE_BATCH_SIZE", "77")
    assert config.extract_batch_size() == 77
    monkeypatch.setenv("OCR_ENGINE_BATCH_SIZE", "junk")
    assert config.extract_batch_size() == 1024
    monkeypatch.setenv("OCR_ENGINE_AS_OF", "2031-05-06")
    from datetime import date

    assert config.as_of_date() == date(2031, 5, 6)
    monkeypatch.setenv("OCR_ENGINE_POOL_NUM", "1")
    monkeypatch.setenv("OCR_ENGINE_POOL_DEN", "2")
    assert config.pool_fraction_num() == (1, 2)

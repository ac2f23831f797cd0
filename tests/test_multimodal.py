"""Multimodal plumbing: binary columns, actor-pool decode, stub gating."""

import numpy as np
import pyarrow as pa
import pytest

from ocr_engine_ray.stages.multimodal import (
    MEDIA_SCHEMA, MediaDecoder, decode_media, frame_sample_stub, synth_media,
)


def test_synth_media_schema_and_determinism():
    t1 = synth_media(30, seed=9)
    t2 = synth_media(30, seed=9)
    assert t1.schema.equals(MEDIA_SCHEMA)
    assert t1.equals(t2)
    kinds = set(t1.column("kind").to_pylist())
    assert kinds == {"image", "audio", "video"}


def test_decoder_direct():
    dec = MediaDecoder()
    t = synth_media(9, seed=4)
    out = dec(t)
    rows = out.to_pylist()
    for r in rows:
        assert r["decode_error"] == ""
        assert r["decoded_kind"] == r["kind"]
        assert r["dim_a"] > 0
        assert abs(sum(r["features"]) - 1.0) < 1e-9  # normalized histogram
    assert "payload" not in out.column_names


def test_decoder_degrades_on_garbage():
    dec = MediaDecoder()
    t = pa.Table.from_pydict({
        "media_id": [0], "conv_id": ["c"], "turn_idx": [0],
        "kind": ["image"], "mime": ["image/fake"], "payload": [b"not-a-payload"],
    }, schema=MEDIA_SCHEMA)
    r = dec(t).to_pylist()[0]
    assert r["decode_error"] != "" and r["decoded_kind"] == "unknown"


def test_decode_media_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(synth_media(60, seed=7)).repartition(3)
    out = pa.Table.from_pylist(decode_media(ds, concurrency=2).take_all())
    assert out.num_rows == 60
    assert set(out.column("decode_error").to_pylist()) == {""}
    feats = np.array(out.column("features").to_pylist())
    assert feats.shape == (60, 256)


def test_frame_sample_stub():
    t = synth_media(3, seed=1)
    vid = [r for r in t.to_pylist() if r["kind"] == "video"][0]
    frames = frame_sample_stub(vid["payload"], every_n=30)
    assert len(frames) >= 1
    with pytest.raises(NotImplementedError):
        frame_sample_stub(b"JUNKJUNKJUNKJUNK1234")

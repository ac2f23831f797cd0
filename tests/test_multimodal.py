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


def test_resize_media_geometry_and_payload(ray_session):
    import struct

    import ray.data as rd

    from ocr_engine_ray.stages.multimodal import resize_media

    ds = rd.from_arrow(synth_media(60, seed=3)).repartition(3)
    out = pa.Table.from_pylist(
        resize_media(ds, max_dim=64, concurrency=2).take_all())
    assert out.num_rows == 20  # one third of the corpus is images
    for r in out.to_pylist():
        w, h, nw, nh = (r["width"], r["height"],
                        r["new_width"], r["new_height"])
        if max(w, h) > 64:
            assert max(nw, nh) <= 64
            assert (nw, nh) == (w * 64 // max(w, h), h * 64 // max(w, h))
        else:
            assert (nw, nh) == (w, h)
        # payload header rewritten, body never grows
        assert r["payload"][:8] == b"FAKEIMG1"
        assert struct.unpack("<II", r["payload"][8:16]) == (nw, nh)
        assert len(r["payload"]) <= 16 + max(1, nw * nh // 8)


def test_sample_frames_fanout(ray_session):
    import struct

    import ray.data as rd

    from ocr_engine_ray.stages.multimodal import sample_frames

    tab = synth_media(60, seed=3)
    ds = rd.from_arrow(tab).repartition(3)
    out = pa.Table.from_pylist(
        sample_frames(ds, every_n=30, concurrency=2).take_all())
    vids = {r["media_id"]: r["payload"]
            for r in tab.to_pylist() if r["kind"] == "video"}
    expected = {}
    for mid, p in vids.items():
        for k, fr in enumerate(frame_sample_stub(p, every_n=30)):
            expected[(mid, k * 30)] = fr
    got = {(r["media_id"], r["frame_idx"]): r["frame"]
           for r in out.to_pylist()}
    assert got == expected and expected
    nf0 = struct.unpack("<II", next(iter(vids.values()))[8:16])[0]
    assert nf0 >= 1  # fanout exercised


def test_audio_segments_geometry(ray_session):
    """Segment fanout: ceil(ns / (sr*chunk)) windows, last one short;
    integer-ms durations; non-audio rows dropped."""
    import struct

    import ray.data as rd

    from ocr_engine_ray.stages.multimodal import segment_audio

    sr, ns = 1000, 2500          # 2.5 s at chunk=1 s -> 3 segments
    pay = b"FAKEAUD1" + struct.pack("<II", sr, ns) + b"\x00" * 8
    img = b"FAKEIMG1" + struct.pack("<II", 4, 4) + b"\x00" * 8
    tab = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "conv_id": pa.array(["c", "c"], pa.string()),
        "turn_idx": pa.array([0, 1], pa.int32()),
        "kind": pa.array(["audio", "image"], pa.string()),
        "mime": pa.array(["audio/fake", "image/fake"], pa.string()),
        "payload": pa.array([pay, img], pa.binary()),
    })
    out = segment_audio(rd.from_arrow(tab), chunk_seconds=1).take_all()
    assert [(r["seg_idx"], r["start_sample"], r["n_samples"],
             r["duration_ms"]) for r in out] \
        == [(0, 0, 1000, 1000), (1, 1000, 1000, 1000),
            (2, 2000, 500, 500)]

"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by actor-pool ``map_batches`` stages.

The image/audio codec libraries are NOT in this environment, so the
decode step is gated behind an import-try: with PIL/soundfile installed
the real decoder runs; without them a clearly-marked deterministic STUB
parses the synthetic payload header instead.  Everything around the stub
— schema, batch sizing for large binaries, actor signatures, zero-copy
Arrow plumbing, output layout — is real and tested.

Synthetic payload format (deterministic, seeded)::

    b"FAKEIMG1" + width:u32le + height:u32le + seeded noise bytes
    b"FAKEAUD1" + sample_rate:u32le + n_samples:u32le + noise
    b"FAKEVID1" + n_frames:u32le + fps:u32le + noise

Feature extraction is REAL computation over the raw bytes (normalized
256-bin byte histogram via numpy) — the stand-in for an embedding model
with identical data movement.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("kind", pa.string()),          # image | audio | video
    ("mime", pa.string()),
    ("payload", pa.binary()),
])

# keep payload_bytes × batch_size × pool_width well under worker heap:
# large binaries want SMALL batches (ray_guide "Memory-aware")
MEDIA_BATCH_SIZE = 32

_MAGIC = {b"FAKEIMG1": "image", b"FAKEAUD1": "audio", b"FAKEVID1": "video"}


def synth_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus."""
    rng = np.random.RandomState(seed)
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = int(rng.randint(16, 512)), int(rng.randint(16, 512))
            head = b"FAKEIMG1" + struct.pack("<II", w, h)
            body_len = min(w * h // 8, 4096)
            mime = "image/fake"
        elif kind == "audio":
            sr, ns = 16000, int(rng.randint(1000, 64000))
            head = b"FAKEAUD1" + struct.pack("<II", sr, ns)
            body_len = min(ns // 4, 4096)
            mime = "audio/fake"
        else:
            nf, fps = int(rng.randint(10, 300)), 30
            head = b"FAKEVID1" + struct.pack("<II", nf, fps)
            body_len = min(nf * 16, 4096)
            mime = "video/fake"
        payload = head + rng.bytes(body_len)
        rows["media_id"].append(i)
        rows["conv_id"].append(f"conv-{seed}-{i % 37:06d}")
        rows["turn_idx"].append(i % 11)
        rows["kind"].append(kind)
        rows["mime"].append(mime)
        rows["payload"].append(payload)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def materialize_media(out_path: str, n: int, seed: int = 42) -> str:
    """Write the synthetic media corpus to Parquet (idempotent, keyed by
    path) so pipelines exercise the real binary-column read path and the
    DuckDB oracle can read the same bytes."""
    import os

    import pyarrow.parquet as pq

    if not os.path.exists(out_path):
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        tmp = out_path + ".tmp"
        pq.write_table(synth_media(n, seed), tmp)
        os.replace(tmp, out_path)
    return out_path


def _byte_histogram(payload: bytes) -> np.ndarray:
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr, minlength=256).astype(np.float64)
    total = hist.sum()
    return hist / total if total else hist


class MediaDecoder:
    """Actor-pool decode + feature-extract stage.

    ``__init__`` (once per actor) probes for real codec libraries; the
    per-batch path decodes metadata and computes byte-histogram features.
    Unknown payloads degrade to an error column, never poison the batch
    (reference error policy, ``app/utils/data_extractor.py:255-257``)."""

    def __init__(self) -> None:
        try:  # real codec path (not present in this container)
            import PIL.Image  # noqa: F401
            self.real_codecs = True
        except ImportError:
            self.real_codecs = False

    def _decode_meta(self, payload: bytes) -> tuple[str, int, int, str]:
        """(kind, dim_a, dim_b, error).  STUB path: parse the FAKE header.
        Real path would go through PIL/soundfile here."""
        if self.real_codecs:  # pragma: no cover - libs absent in sandbox
            raise NotImplementedError(
                "real codec decode not implemented in this environment")
        if len(payload) < 16 or payload[:8] not in _MAGIC:
            return "unknown", 0, 0, "undecodable payload"
        kind = _MAGIC[payload[:8]]
        a, b = struct.unpack("<II", payload[8:16])
        return kind, int(a), int(b), ""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds, dim_a, dim_b, errs, feats, sizes = [], [], [], [], [], []
        for p in payloads:
            p = p or b""
            kind, a, b, err = self._decode_meta(p)
            kinds.append(kind)
            dim_a.append(a)
            dim_b.append(b)
            errs.append(err)
            sizes.append(len(p))
            feats.append(_byte_histogram(p[16:]))
        out = batch.drop_columns(["payload"])  # payload consumed here
        out = out.append_column("decoded_kind", pa.array(kinds, pa.string()))
        out = out.append_column("dim_a", pa.array(dim_a, pa.int64()))
        out = out.append_column("dim_b", pa.array(dim_b, pa.int64()))
        out = out.append_column("payload_bytes", pa.array(sizes, pa.int64()))
        out = out.append_column(
            "features", pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float64(), 256)))
        out = out.append_column("decode_error", pa.array(errs, pa.string()))
        return out


def decode_media(ds, concurrency: int | None = None):
    """media table → decoded metadata + features (actor pool, small
    batches for large binary rows)."""
    from ..util import default_pool_size

    if concurrency is None:
        concurrency = default_pool_size(cap=8)
    return ds.map_batches(MediaDecoder, batch_format="pyarrow",
                          batch_size=MEDIA_BATCH_SIZE,
                          concurrency=concurrency, num_cpus=1)


def frame_sample_stub(payload: bytes, every_n: int = 30) -> list[bytes]:
    """Video frame sampling — STUB.  Real implementation requires an
    ffmpeg/pyav binding not present in this container."""
    if len(payload) >= 16 and payload[:8] == b"FAKEVID1":
        n_frames, _fps = struct.unpack("<II", payload[8:16])
        # deterministic fake: one 16-byte pseudo-frame per sampled index
        body = payload[16:]
        frames = []
        for idx in range(0, int(n_frames), every_n):
            start = (idx * 16) % max(1, len(body) or 1)
            frames.append(body[start:start + 16] or b"\x00" * 16)
        return frames
    raise NotImplementedError("real video decode requires ffmpeg/pyav")


class MediaResizer:
    """Actor-pool image-resize stage — the plumbing (schema, batch
    sizing, actor lifecycle, 1→1 payload rewrite) is real; the pixel
    work is a deterministic STUB because no image codec ships in this
    container.  Fit-within-``max_dim`` integer geometry::

        scale only when max(w, h) > max_dim
        new_w = w * max_dim // max(w, h)   (floor, aspect-preserving)

    The stub output payload is a rewritten FAKE header with the new
    dimensions plus the body truncated proportionally — same data
    movement as a real resize (smaller payload out)."""

    def __init__(self, max_dim: int = 256) -> None:
        self.max_dim = max_dim
        try:  # real codec path (not present in this container)
            import PIL.Image  # noqa: F401
            self.real_codecs = True
        except ImportError:
            self.real_codecs = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.real_codecs:  # pragma: no cover - libs absent in sandbox
            raise NotImplementedError(
                "real image resize not implemented in this environment")
        md = self.max_dim
        w_out, h_out, nw_out, nh_out, pay_out, keep = [], [], [], [], [], []
        for p in batch.column("payload").to_pylist():
            p = p or b""
            if len(p) < 16 or p[:8] != b"FAKEIMG1":
                keep.append(False)
                continue
            keep.append(True)
            w, h = struct.unpack("<II", p[8:16])
            big = max(w, h)
            if big > md:
                nw, nh = w * md // big, h * md // big
            else:
                nw, nh = w, h
            body = p[16:]
            new_len = min(len(body), max(1, nw * nh // 8))
            w_out.append(w)
            h_out.append(h)
            nw_out.append(nw)
            nh_out.append(nh)
            pay_out.append(b"FAKEIMG1" + struct.pack("<II", nw, nh)
                           + body[:new_len])
        sub = batch.filter(pa.array(keep)).drop_columns(["payload"])
        sub = sub.append_column("width", pa.array(w_out, pa.int64()))
        sub = sub.append_column("height", pa.array(h_out, pa.int64()))
        sub = sub.append_column("new_width", pa.array(nw_out, pa.int64()))
        sub = sub.append_column("new_height", pa.array(nh_out, pa.int64()))
        sub = sub.append_column("payload", pa.array(pay_out, pa.binary()))
        return sub


def resize_media(ds, max_dim: int = 256, concurrency: int | None = None):
    """image rows → aspect-preserving resized payloads (actor pool)."""
    from ..util import default_pool_size

    if concurrency is None:
        concurrency = default_pool_size(cap=8)
    return ds.map_batches(MediaResizer, batch_format="pyarrow",
                          fn_constructor_kwargs={"max_dim": max_dim},
                          batch_size=MEDIA_BATCH_SIZE,
                          concurrency=concurrency, num_cpus=1)


class FrameSampler:
    """Actor-pool 1→N video frame-sampling stage (``flat_map`` shape via
    map_batches returning more rows than input): every ``every_n``-th
    frame becomes its own row.  Real plumbing, STUB frame extraction
    (:func:`frame_sample_stub`); non-video rows are dropped."""

    def __init__(self, every_n: int = 30) -> None:
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, cids, tixs, fidx, frames = [], [], [], [], []
        for mid, cid, tix, p in zip(batch.column("media_id").to_pylist(),
                                    batch.column("conv_id").to_pylist(),
                                    batch.column("turn_idx").to_pylist(),
                                    batch.column("payload").to_pylist()):
            p = p or b""
            if len(p) < 16 or p[:8] != b"FAKEVID1":
                continue
            for k, frame in enumerate(frame_sample_stub(p, self.every_n)):
                ids.append(mid)
                cids.append(cid)
                tixs.append(tix)
                fidx.append(k * self.every_n)
                frames.append(frame)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "conv_id": pa.array(cids, pa.string()),
            "turn_idx": pa.array(tixs, pa.int32()),
            "frame_idx": pa.array(fidx, pa.int64()),
            "frame": pa.array(frames, pa.binary()),
        })


def sample_frames(ds, every_n: int = 30, concurrency: int | None = None):
    """video rows → one row per sampled frame (actor pool, small
    batches — output fanout is n_frames/every_n rows per video)."""
    from ..util import default_pool_size

    if concurrency is None:
        concurrency = default_pool_size(cap=8)
    return ds.map_batches(FrameSampler, batch_format="pyarrow",
                          fn_constructor_kwargs={"every_n": every_n},
                          batch_size=MEDIA_BATCH_SIZE,
                          concurrency=concurrency, num_cpus=1)


class AudioSegmenter:
    """Actor-pool 1→N audio segmentation stage (the audio sibling of
    :class:`FrameSampler`): each FAKEAUD1 payload fans out to fixed
    ``chunk_seconds`` windows with integer sample/duration arithmetic —
    the plan a real resampler/ASR-feeder would execute per segment.
    STUB codec (header fields only), real plumbing; non-audio rows are
    dropped."""

    def __init__(self, chunk_seconds: int = 10) -> None:
        self.chunk_seconds = chunk_seconds

    def __call__(self, batch: pa.Table) -> pa.Table:
        import struct as _struct

        ids, cids, tixs = [], [], []
        sidx, starts, segs, durs = [], [], [], []
        for mid, cid, tix, p in zip(batch.column("media_id").to_pylist(),
                                    batch.column("conv_id").to_pylist(),
                                    batch.column("turn_idx").to_pylist(),
                                    batch.column("payload").to_pylist()):
            p = p or b""
            if len(p) < 16 or p[:8] != b"FAKEAUD1":
                continue
            sr, ns = _struct.unpack("<II", p[8:16])
            if sr == 0 or ns == 0:
                continue
            win = sr * self.chunk_seconds
            n_seg = (ns + win - 1) // win
            for k in range(n_seg):
                start = k * win
                seg = min(win, ns - start)
                ids.append(mid)
                cids.append(cid)
                tixs.append(tix)
                sidx.append(k)
                starts.append(start)
                segs.append(seg)
                durs.append(seg * 1000 // sr)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "conv_id": pa.array(cids, pa.string()),
            "turn_idx": pa.array(tixs, pa.int32()),
            "seg_idx": pa.array(sidx, pa.int64()),
            "start_sample": pa.array(starts, pa.int64()),
            "n_samples": pa.array(segs, pa.int64()),
            "duration_ms": pa.array(durs, pa.int64()),
        })


def segment_audio(ds, chunk_seconds: int = 10,
                  concurrency: int | None = None):
    """audio rows → one row per fixed-duration segment (actor pool)."""
    from ..util import default_pool_size

    if concurrency is None:
        concurrency = default_pool_size(cap=8)
    return ds.map_batches(AudioSegmenter, batch_format="pyarrow",
                          fn_constructor_kwargs={
                              "chunk_seconds": chunk_seconds},
                          batch_size=MEDIA_BATCH_SIZE,
                          concurrency=concurrency, num_cpus=1)

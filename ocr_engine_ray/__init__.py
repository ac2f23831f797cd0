"""ocr_engine_ray — a Ray-Data-native main-content extraction engine.

A from-scratch rebuild (NOT a port) of the extraction semantics of the
reference invoice/document pipeline (FlameGreat-1/OCR-Engine, read-only at
/root/reference), re-targeted at Parquet tables of multi-turn
conversation/agent transcripts::

    (conv_id: string, turn_idx: int32, role: string,
     text: string, tool: string, ts: timestamp[us])

Layering:

- ``core/``    — pure-Python, deterministic, dependency-free extraction
                 semantics (content sniffing, HTML boilerplate stripping,
                 PDF-ish layout reading order, field/date/money parsing,
                 validation).  Shared verbatim by the Ray stages and the
                 single-process test oracle so per-turn outputs are
                 byte-identical by construction; the Ray layer is what is
                 under test (ordering, partitioning, batching).
- ``stages/``  — Ray Data ``map_batches`` callables (stateless fns and
                 stateful actor-pool classes) built on ``core``.
- ``pipelines/`` — end-to-end Dataset compositions (flagship extraction,
                 rollups, dedup, similarity search).
- ``state/``   — lineage records, resumable partitioned output, metrics.
- ``sources/`` — readers with column pruning + the synthetic transcript
                 generator used for tests/bench (no external data).
"""

__version__ = "0.1.0"

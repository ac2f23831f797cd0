"""Extraction stages: Arrow-batch wrappers around the pure core.

``TurnExtractor`` is the engine's main stateful stage — the analogue of
the reference's OCR-engine actor (GCV/DocAI clients built once per
worker, ``app/utils/ocr_engine.py:34-43``).  Here the per-actor state is
the compiled regex machinery and the pinned ``as_of`` date; it is a
callable CLASS so Ray hosts it in an actor pool::

    ds.map_batches(TurnExtractor, batch_format="pyarrow",
                   batch_size=512, concurrency=(2, 8))

Batches are zero-copy ``pyarrow.Table`` in; the output batch is built
column-at-a-time into the fixed ``EXTRACTED_SCHEMA``.  The per-row work
(HTML/PDF parsing, regex field extraction) is inherently row-wise, so
the hot loop iterates the text column once per batch — everything else
(normalization pre-pass, column assembly) is Arrow-level.
"""

from __future__ import annotations

from datetime import date

import pyarrow as pa

from ..core.extract import DEFAULT_AS_OF, TurnRecord, extract_turn, items_rollup
from ..schema import EXTRACTED_SCHEMA


def record_to_row(rec: TurnRecord) -> dict:
    """Flatten a TurnRecord into the EXTRACTED_SCHEMA column values.
    Shared by the Ray stage and the single-process oracle so both
    produce byte-identical rows."""
    qty, total, avg = items_rollup(rec.items)
    return {
        "content_type": rec.content_type,
        "extracted_text": rec.extracted_text,
        "pages": rec.pages,
        "invoice_number": rec.invoice_number,
        "invoice_date": rec.invoice_date,
        "grand_total_cents": rec.grand_total_cents,
        "taxes_cents": rec.taxes_cents,
        "final_total_cents": rec.final_total_cents,
        "vendor_name": rec.vendor_name,
        "vendor_street": rec.vendor_street,
        "vendor_city": rec.vendor_city,
        "vendor_state": rec.vendor_state,
        "vendor_postal": rec.vendor_postal,
        "items": [
            {"description": i.description, "quantity": i.quantity,
             "unit_price_cents": i.unit_price_cents, "total_cents": i.total_cents}
            for i in rec.items
        ],
        "kv_pairs": [{"key": k, "value": v} for k, v in rec.kv_pairs],
        "spans": [{"start": s, "end": e, "kind": k} for s, e, k in rec.spans],
        "items_qty": qty,
        "items_total_cents": total,
        "items_avg_unit_price_cents": avg,
        "extract_error": rec.extract_error,
    }


def extract_batch(batch: pa.Table, as_of: date = DEFAULT_AS_OF) -> pa.Table:
    """Pure function form of the extraction stage (used by stateless
    callers and the oracle); ``TurnExtractor`` wraps it for actor pools."""
    texts = batch.column("text").to_pylist()
    rows = [record_to_row(extract_turn(t, as_of)) for t in texts]

    out_cols: dict[str, pa.Array | pa.ChunkedArray] = {
        "conv_id": batch.column("conv_id"),
        "turn_idx": batch.column("turn_idx"),
        "role": batch.column("role"),
        "tool": batch.column("tool"),
        "ts": batch.column("ts"),
    }
    arrays = [out_cols[f.name] if f.name in out_cols
              else pa.array([r[f.name] for r in rows], type=f.type)
              for f in EXTRACTED_SCHEMA]
    return pa.Table.from_arrays(arrays, schema=EXTRACTED_SCHEMA)


class TurnExtractor:
    """Actor-pool extraction stage.  ``__init__`` runs once per actor
    (compile/warm everything); ``__call__`` runs per batch."""

    def __init__(self, as_of: date = DEFAULT_AS_OF):
        self.as_of = as_of
        # Touch every lazy regex/table once so per-batch time is steady.
        extract_turn("warmup <p>x</p>", as_of)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(batch, self.as_of)

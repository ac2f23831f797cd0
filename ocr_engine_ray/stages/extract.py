"""Extraction stages: Arrow-batch wrappers around the pure core.

``TurnExtractor`` is the engine's main stateful stage — the analogue of
the reference's OCR-engine actor (GCV/DocAI clients built once per
worker, ``app/utils/ocr_engine.py:34-43``).  Here the per-actor state is
the compiled regex machinery and the pinned ``as_of`` date; it is a
callable CLASS so Ray hosts it in an actor pool::

    ds.map_batches(TurnExtractor, batch_format="pyarrow",
                   batch_size=512, concurrency=(2, 8))

Batches are zero-copy ``pyarrow.Table`` in; output columns are
assembled directly (no per-row dict materialization).  Validation
(warnings/flags, reference ``app/utils/validator.py``) is FUSED into the
same pass by default: the validator needs exactly the ``TurnRecord`` the
extractor just produced, so a separate stage would re-materialize every
row for nothing (measured ~1.5× end-to-end on the flagship pipeline).
"""

from __future__ import annotations

from datetime import date

import pyarrow as pa

from ..core.extract import DEFAULT_AS_OF, extract_turn, items_rollup
from ..core.validate import flag_record, validate_record
from ..schema import EXTRACTED_SCHEMA, VALIDATED_SCHEMA

_CARRIED = ("conv_id", "turn_idx", "role", "tool", "ts")


def extract_batch(batch: pa.Table, as_of: date = DEFAULT_AS_OF,
                  validate: bool = True,
                  field_backends: dict | None = None) -> pa.Table:
    """Pure-function form of the extraction(+validation) stage; shared by
    the actor wrapper and the single-process oracle (byte-identical
    rows by construction)."""
    texts = batch.column("text").to_pylist()
    conv_ids = batch.column("conv_id").to_pylist()
    tools = batch.column("tool").to_pylist()

    n = len(texts)
    content_type: list[str] = [""] * n
    extracted_text: list[str] = [""] * n
    pages: list[int] = [1] * n
    invoice_number: list[str | None] = [None] * n
    invoice_date: list[date | None] = [None] * n
    grand_total: list[int | None] = [None] * n
    taxes: list[int | None] = [None] * n
    final_total: list[int | None] = [None] * n
    v_name: list[str] = [""] * n
    v_street: list[str] = [""] * n
    v_city: list[str] = [""] * n
    v_state: list[str] = [""] * n
    v_postal: list[str] = [""] * n
    items_col: list[list[dict]] = [[] for _ in range(n)]
    kv_col: list[list[dict]] = [[] for _ in range(n)]
    spans_col: list[list[dict]] = [[] for _ in range(n)]
    items_qty: list[int] = [0] * n
    items_total: list[int] = [0] * n
    items_avg: list[int | None] = [None] * n
    extract_error: list[str] = [""] * n
    warnings_col: list[list[str]] = []
    flags_col: list[list[str]] = []
    is_valid_col: list[bool] = []

    for i, text in enumerate(texts):
        rec = extract_turn(text, as_of, tools[i] or "",
                           field_backends=field_backends)
        content_type[i] = rec.content_type
        extracted_text[i] = rec.extracted_text
        pages[i] = rec.pages
        invoice_number[i] = rec.invoice_number
        invoice_date[i] = rec.invoice_date
        grand_total[i] = rec.grand_total_cents
        taxes[i] = rec.taxes_cents
        final_total[i] = rec.final_total_cents
        v_name[i] = rec.vendor_name
        v_street[i] = rec.vendor_street
        v_city[i] = rec.vendor_city
        v_state[i] = rec.vendor_state
        v_postal[i] = rec.vendor_postal
        if rec.items:
            items_col[i] = [
                {"description": it.description, "quantity": it.quantity,
                 "unit_price_cents": it.unit_price_cents,
                 "total_cents": it.total_cents} for it in rec.items]
        if rec.kv_pairs:
            kv_col[i] = [{"key": k, "value": v} for k, v in rec.kv_pairs]
        if rec.spans:
            spans_col[i] = [{"start": s, "end": e, "kind": k}
                            for s, e, k in rec.spans]
        qty, total, avg = items_rollup(rec.items)
        items_qty[i], items_total[i], items_avg[i] = qty, total, avg
        extract_error[i] = rec.extract_error
        if validate:
            w = validate_record(rec, conv_ids[i], as_of)
            warnings_col.append(w)
            flags_col.append(flag_record(rec, as_of))
            is_valid_col.append(len(w) == 0)

    schema = VALIDATED_SCHEMA if validate else EXTRACTED_SCHEMA
    by_name = {
        "content_type": content_type, "extracted_text": extracted_text,
        "pages": pages, "invoice_number": invoice_number,
        "invoice_date": invoice_date, "grand_total_cents": grand_total,
        "taxes_cents": taxes, "final_total_cents": final_total,
        "vendor_name": v_name, "vendor_street": v_street,
        "vendor_city": v_city, "vendor_state": v_state,
        "vendor_postal": v_postal, "items": items_col, "kv_pairs": kv_col,
        "spans": spans_col, "items_qty": items_qty,
        "items_total_cents": items_total,
        "items_avg_unit_price_cents": items_avg,
        "extract_error": extract_error, "warnings": warnings_col,
        "flags": flags_col, "is_valid": is_valid_col,
    }
    arrays = []
    for f in schema:
        if f.name in _CARRIED:
            arrays.append(batch.column(f.name))
        else:
            arrays.append(pa.array(by_name[f.name], type=f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


class TurnExtractor:
    """Actor-pool extraction stage.  ``__init__`` runs once per actor
    (compile/warm everything); ``__call__`` runs per batch.

    ``template_tools`` routes those ``tool`` values through the
    rule-pack template backend (core/templates.py) as the PREFERRED
    field extractor, with the generic regex backend as fallback — the
    reference's DocAI→GCV two-backend chain shape
    (app/utils/data_extractor.py:259-274).  Registration happens here,
    once per worker process, exactly like the reference builds its
    preferred-backend client per worker."""

    def __init__(self, as_of: date = DEFAULT_AS_OF, validate: bool = True,
                 template_tools: tuple[str, ...] = (),
                 template_dir_path: str | None = "ENV",
                 extra_field_backends: dict | None = None):
        from ..core.extract import FIELD_BACKENDS

        self.as_of = as_of
        self.validate = validate
        # The stage holds its OWN backend dict, seeded from this
        # process's public registry plus ``extra_field_backends`` — the
        # DRIVER-side registry snapshot a pipeline builder passes in
        # (actors construct in worker processes, which never see
        # driver-side register_field_backend calls).  The global is
        # never mutated, so one stage's template routing can't leak into
        # another extractor in the same worker process.
        self.field_backends: dict = dict(FIELD_BACKENDS)
        if extra_field_backends:
            self.field_backends.update(extra_field_backends)
        if template_tools:
            from ..config import template_dir
            from ..core.templates import TemplatePack, load_template_dir

            # "ENV" sentinel: resolve the env knob HERE (in-process /
            # test use); pipeline builders resolve it on the driver and
            # pass the value through, because Ray worker processes were
            # spawned with the pre-init environment
            tdir = template_dir() if template_dir_path == "ENV" \
                else template_dir_path
            # compiled once per actor; env knob swaps the rule packs
            pack = TemplatePack(load_template_dir(tdir)) if tdir \
                else TemplatePack()
            for tool in template_tools:
                self.field_backends[tool] = pack.extract
        # Touch every lazy regex/table once so per-batch time is steady.
        extract_turn("warmup <p>x</p>", as_of)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(batch, self.as_of, validate=self.validate,
                             field_backends=self.field_backends)


def explode_pages_batch(batch: pa.Table) -> pa.Table:
    """1→N page explosion (S4/S5 analogue — ZIP member / PDF page
    expansion, reference ``app/utils/file_handler.py:134-186``): each
    extracted turn becomes one row per page ("\\f"-separated for pdf
    payloads; exactly one page otherwise), carrying (page_idx,
    total_pages) like the reference's page records (:171-175).  Use via
    ``ds.map_batches(explode_pages_batch)`` — a map_batches returning
    more rows than its input, the Ray-native flat_map."""
    conv_ids = batch.column("conv_id").to_pylist()
    turn_idxs = batch.column("turn_idx").to_pylist()
    texts = batch.column("extracted_text").to_pylist()
    o_conv, o_turn, o_page, o_total, o_text = [], [], [], [], []
    for c, t, x in zip(conv_ids, turn_idxs, texts):
        pages = x.split("\f") if x else [""]
        for pi, ptext in enumerate(pages):
            o_conv.append(c)
            o_turn.append(t)
            o_page.append(pi)
            o_total.append(len(pages))
            o_text.append(ptext)
    return pa.table({
        "conv_id": pa.array(o_conv, pa.string()),
        "turn_idx": pa.array(o_turn, pa.int32()),
        "page_idx": pa.array(o_page, pa.int32()),
        "total_pages": pa.array(o_total, pa.int32()),
        "page_text": pa.array(o_text, pa.string()),
    })

"""Validation stage: appends ``warnings`` / ``flags`` / ``is_valid``
columns to an EXTRACTED_SCHEMA batch (reference V1–V10,
``app/utils/validator.py``).

Single-pass column carry — the reference built separate warning/flag
dicts and joined them back by invoice number (``app/main.py:118-134``,
an O(n²) scan); here the warnings ride the row through the pipeline so
no join or shuffle exists at all (SURVEY §2.5 J1/J2 "preferred" path).
"""

from __future__ import annotations

from datetime import date

import pyarrow as pa

from ..core.extract import DEFAULT_AS_OF, TurnRecord
from ..core.fields import Item
from ..core.validate import flag_record, validate_record
from ..schema import VALIDATED_SCHEMA


def _rec_from_row(row: dict) -> TurnRecord:
    rec = TurnRecord()
    rec.content_type = row["content_type"]
    rec.extracted_text = row["extracted_text"]
    rec.pages = row["pages"]
    rec.invoice_number = row["invoice_number"]
    rec.invoice_date = row["invoice_date"]
    rec.grand_total_cents = row["grand_total_cents"]
    rec.taxes_cents = row["taxes_cents"]
    rec.final_total_cents = row["final_total_cents"]
    rec.vendor_name = row["vendor_name"]
    rec.vendor_street = row["vendor_street"]
    rec.vendor_city = row["vendor_city"]
    rec.vendor_state = row["vendor_state"]
    rec.vendor_postal = row["vendor_postal"]
    rec.items = [Item(i["description"], i["quantity"], i["unit_price_cents"],
                      i["total_cents"]) for i in (row["items"] or [])]
    return rec


def validate_batch(batch: pa.Table, as_of: date = DEFAULT_AS_OF) -> pa.Table:
    need = ["content_type", "extracted_text", "pages", "invoice_number",
            "invoice_date", "grand_total_cents", "taxes_cents",
            "final_total_cents", "vendor_name", "vendor_street",
            "vendor_city", "vendor_state", "vendor_postal", "items"]
    sub = batch.select(need + ["conv_id"]).to_pylist()
    warnings_col, flags_col, valid_col = [], [], []
    for row in sub:
        rec = _rec_from_row(row)
        w = validate_record(rec, row["conv_id"], as_of)
        f = flag_record(rec, as_of)
        warnings_col.append(w)
        flags_col.append(f)
        valid_col.append(len(w) == 0)
    out = batch
    out = out.append_column(pa.field("warnings", pa.list_(pa.string())),
                            pa.array(warnings_col, type=pa.list_(pa.string())))
    out = out.append_column(pa.field("flags", pa.list_(pa.string())),
                            pa.array(flags_col, type=pa.list_(pa.string())))
    out = out.append_column(pa.field("is_valid", pa.bool_()),
                            pa.array(valid_col, type=pa.bool_()))
    return out.select([f.name for f in VALIDATED_SCHEMA]).cast(VALIDATED_SCHEMA)


class Validator:
    """Actor form for pools (stateless in practice, cheap as tasks too)."""

    def __init__(self, as_of: date = DEFAULT_AS_OF):
        self.as_of = as_of

    def __call__(self, batch: pa.Table) -> pa.Table:
        return validate_batch(batch, self.as_of)

"""Arrow schemas for the engine (SURVEY §1.4 mapping).

The input table is the BASELINE.json ``input_hint`` transcript schema;
the extracted table is FIXTURES.md §F2 flattened for Arrow friendliness
(vendor struct → ``vendor_*`` scalar columns, money → int64 cents; see
``core.money``).
"""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])

ITEM_TYPE = pa.struct([
    ("description", pa.string()),
    ("quantity", pa.int64()),
    ("unit_price_cents", pa.int64()),
    ("total_cents", pa.int64()),
])

KV_TYPE = pa.struct([("key", pa.string()), ("value", pa.string())])

SPAN_TYPE = pa.struct([
    ("start", pa.int32()),
    ("end", pa.int32()),
    ("kind", pa.string()),
])

EXTRACTED_FIELDS = [
    ("content_type", pa.string()),
    ("extracted_text", pa.string()),
    ("pages", pa.int32()),
    ("invoice_number", pa.string()),
    ("invoice_date", pa.date32()),
    ("grand_total_cents", pa.int64()),
    ("taxes_cents", pa.int64()),
    ("final_total_cents", pa.int64()),
    ("vendor_name", pa.string()),
    ("vendor_street", pa.string()),
    ("vendor_city", pa.string()),
    ("vendor_state", pa.string()),
    ("vendor_postal", pa.string()),
    ("items", pa.list_(ITEM_TYPE)),
    ("kv_pairs", pa.list_(KV_TYPE)),
    ("spans", pa.list_(SPAN_TYPE)),
    ("items_qty", pa.int64()),
    ("items_total_cents", pa.int64()),
    ("items_avg_unit_price_cents", pa.int64()),
    ("extract_error", pa.string()),
]

CARRIED_FIELDS = [
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
]

EXTRACTED_SCHEMA = pa.schema(CARRIED_FIELDS + EXTRACTED_FIELDS)

VALIDATED_SCHEMA = pa.schema(
    CARRIED_FIELDS + EXTRACTED_FIELDS + [
        ("warnings", pa.list_(pa.string())),
        ("flags", pa.list_(pa.string())),
        ("is_valid", pa.bool_()),
    ]
)

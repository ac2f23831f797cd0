"""Validation + anomaly flagging — re-expression of the reference's
``InvoiceValidator`` (``app/utils/validator.py:16-139``) and
``flag_anomalies`` (:151-172) over extracted turn records.

Warning strings match the reference's wording so behavior is auditable
line-by-line.  Amount comparisons run on integer cents, so the
reference's ``> Decimal('0.01')`` tolerance becomes an exact ``> 1``
cent check (same accept/reject set for 2-decimal inputs).

Field mapping (document → transcript):
  filename → conv_id (presence), invoice fields → extracted fields,
  pages → pdf page count (≥1).
"""

from __future__ import annotations

import re
from datetime import date

from .extract import DEFAULT_AS_OF, TurnRecord

_INVOICE_NUMBER_OK_RE = re.compile(r"^[A-Za-z0-9-]{5,}$")

HIGH_TOTAL_CENTS = 10_000_00       # reference: final_total > 10000.00
MANY_ITEMS = 20                    # reference: len(items) > 20


def validate_record(rec: TurnRecord, conv_id: str, as_of: date = DEFAULT_AS_OF) -> list[str]:
    """All validation warnings for one record, reference order V2..V9."""
    w: list[str] = []
    # V2 filename/conv key present (validator.py:42-46)
    if not conv_id or not conv_id.strip():
        w.append("Filename is missing")
    # V3 invoice number (validator.py:48-54)
    if not rec.invoice_number or not rec.invoice_number.strip():
        w.append("Invoice number is missing")
    elif not _INVOICE_NUMBER_OK_RE.match(rec.invoice_number):
        w.append(f"Unusual invoice number format: {rec.invoice_number}")
    # V4 vendor (validator.py:56-77)
    if not rec.vendor_name.strip():
        w.append("Vendor name is missing")
    if not rec.vendor_street.strip():
        w.append("Vendor street is missing")
    if not rec.vendor_city.strip():
        w.append("Vendor city is missing")
    if not rec.vendor_state.strip():
        w.append("Vendor state is missing")
    if not rec.vendor_postal.strip():
        w.append("Vendor postal code is missing")
    # the reference's address parser never fills country (data_extractor.py:399-425),
    # so this warning fires whenever the record carries no country — always, today
    if not getattr(rec, "vendor_country", ""):
        w.append("Vendor country is missing")
    # V5 date (validator.py:79-85)
    if rec.invoice_date is None:
        w.append("Invoice date is missing")
    elif rec.invoice_date > as_of:
        w.append(f"Invoice date {rec.invoice_date} is in the future")
    # V6 amounts (validator.py:87-93)
    for cents, name in ((rec.grand_total_cents, "Grand total"),
                        (rec.taxes_cents, "Taxes"),
                        (rec.final_total_cents, "Final total")):
        if cents is None:
            w.append(f"{name} is missing")
        elif cents < 0:
            w.append(f"{name} is negative")
    # V7 cross-field totals (validator.py:95-100), exact cents
    if (rec.grand_total_cents is not None and rec.taxes_cents is not None
            and rec.final_total_cents is not None):
        if abs((rec.grand_total_cents + rec.taxes_cents) - rec.final_total_cents) > 1:
            from .money import cents_to_str

            w.append("Total amounts may not match: "
                     f"{cents_to_str(rec.grand_total_cents)} + "
                     f"{cents_to_str(rec.taxes_cents)} ≈ "
                     f"{cents_to_str(rec.final_total_cents)}")
    # V8 pages (validator.py:102-108)
    if rec.pages < 1:
        w.append(f"Unusual number of pages: {rec.pages}")
    # V9 items (validator.py:110-132)
    if not rec.items:
        w.append("No line items found in the invoice")
    for idx, item in enumerate(rec.items, 1):
        if not item.description or not item.description.strip():
            w.append(f"Item {idx}: Description is missing")
        if item.quantity is None:
            w.append(f"Item {idx}: Quantity is missing")
        elif item.quantity <= 0:
            w.append(f"Item {idx}: Unusual quantity")
        if item.unit_price_cents is None:
            w.append(f"Item {idx}: Unit price is missing")
        elif item.unit_price_cents < 0:
            w.append(f"Item {idx}: Unusual unit price")
        if item.total_cents is None:
            w.append(f"Item {idx}: Total is missing")
        elif item.total_cents < 0:
            w.append(f"Item {idx}: Unusual total")
        if (item.quantity is not None and item.unit_price_cents is not None
                and item.total_cents is not None):
            if abs(item.quantity * item.unit_price_cents - item.total_cents) > 1:
                w.append(f"Item {idx}: Total may not match quantity * unit price")
    return w


def flag_record(rec: TurnRecord, as_of: date = DEFAULT_AS_OF) -> list[str]:
    """Anomaly flags (reference ``flag_anomalies``, validator.py:151-172)."""
    flags: list[str] = []
    if rec.invoice_date is not None and rec.invoice_date > as_of:
        flags.append("Future date")
    if rec.final_total_cents is not None and rec.final_total_cents > HIGH_TOTAL_CENTS:
        flags.append("Unusually high total amount")
    if rec.items is not None and len(rec.items) > MANY_ITEMS:
        flags.append("Large number of line items")
    return flags

"""Money normalization — re-expression of the reference's
``_parse_decimal`` (``app/utils/data_extractor.py:470-483``), with one
fidelity upgrade: amounts are carried as **integer cents** (int64)
instead of float/Decimal columns, so Arrow arithmetic and the ±0.01
tolerance checks are exact (SURVEY §7.5 "Decimal/date fidelity").
"""

from __future__ import annotations

import re
from decimal import Decimal, InvalidOperation

_CLEAN_RE = re.compile(r"[^\d.\-]")
_FALLBACK_RE = re.compile(r"-?\d+(?:[.,]\d{1,2})?")


def parse_money_cents(amount_string: str | None) -> int | None:
    """``"$1,234.56"`` → ``123456``; unparseable → ``None``.

    Mirrors the reference: strip everything but digits/dot/minus and
    parse; on failure fall back to the first price-looking token (the
    stand-in for the unavailable ``price_parser.Price.fromstring``).
    """
    if not amount_string or not amount_string.strip():
        return None
    cleaned = _CLEAN_RE.sub("", amount_string)
    try:
        return _to_cents(Decimal(cleaned))
    except (InvalidOperation, ValueError):
        m = _FALLBACK_RE.search(amount_string)
        if not m:
            return None
        try:
            return _to_cents(Decimal(m.group(0).replace(",", ".")))
        except (InvalidOperation, ValueError):
            return None


def _to_cents(d: Decimal) -> int:
    return int((d * 100).to_integral_value(rounding="ROUND_HALF_UP"))


def cents_to_str(cents: int | None) -> str:
    """Render cents as the canonical ``1234.56`` string (export format,
    reference ``app/utils/exporter.py:94`` ``float_format='%.2f'``)."""
    if cents is None:
        return ""
    sign = "-" if cents < 0 else ""
    c = abs(cents)
    return f"{sign}{c // 100}.{c % 100:02d}"

r"""Field extractors over extracted main-content text — re-expressions of
the reference's regex/heuristic extractors (``app/utils/data_extractor.py``):

- invoice number  (:374-384, three patterns tried in order)
- vendor + address (:386-425, first-line name, lines 2-4 address)
- totals           (:427-444, subtotal/tax/total amount regexes)
- line items       (:446-468, table rows with ≥4 cells, header skipped)
- key:value pairs  (``app/utils/ocr_engine.py:342-353``)

All functions are pure and deterministic; amounts are integer cents
(see ``core.money``).  Each extractor also reports character spans into
the input text so the pipeline can emit a ``spans`` column.

Documented deviation: the reference's total regex ``(?i)total[:\s]*...``
also matches the tail of the word "Subtotal"; this engine anchors
``total``/``tax`` at a non-letter boundary so "Subtotal: 10.00" cannot be
captured as the final total.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .money import parse_money_cents

Span = tuple[int, int, str]  # (start, end, kind)

INVOICE_NUMBER_PATTERNS = [
    re.compile(r"invoice\s*number?[:\s]*([A-Za-z0-9-]{5,})", re.IGNORECASE),
    re.compile(r"invoice\s*#[:\s]*([A-Za-z0-9-]{5,})", re.IGNORECASE),
    re.compile(r"inv[:\s]*([A-Za-z0-9-]{5,})", re.IGNORECASE),
]

_SUBTOTAL_RE = re.compile(r"subtotal[:\s]*\$?([\d,]+\.\d{2})", re.IGNORECASE)
_TAX_RE = re.compile(r"(?<![a-z])tax(?:es)?[:\s]*\$?([\d,]+\.\d{2})", re.IGNORECASE)
_TOTAL_RE = re.compile(r"(?<![a-z])total[:\s]*\$?([\d,]+\.\d{2})", re.IGNORECASE)
# single-pass alternation over the three totals patterns: one scan instead
# of three; first match per kind wins, which is identical to three
# independent re.search calls (alternatives can't overlap: the lookbehind
# stops "total" from matching inside an already-consumed "subtotal")
_TOTALS_ALL_RE = re.compile(
    r"(?:(subtotal)|(?<![a-z])(tax)(?:es)?|(?<![a-z])(total))"
    r"[:\s]*\$?([\d,]+\.\d{2})",
    re.IGNORECASE)

_POSTAL_RE = re.compile(r"\b\d{5}(?:-\d{4})?\b")
# city/state split as two linear scans.  The obvious single regex
# r"([A-Za-z\s]+),\s*([A-Z]{2})" is O(n²) on comma-less lines (the
# [A-Za-z\s]+ prefix restarts at every position) — ~20 µs/line on prose,
# which made vendor parsing 15 % of whole-pipeline time.  Semantics are
# identical: first comma preceded by ≥1 letter/space and followed by
# optional spaces + two capitals; city = maximal letter/space run ending
# at that comma.
_STATE_AFTER_COMMA_RE = re.compile(r",\s*([A-Z]{2})")
_CITY_RUN_RE = re.compile(r"[A-Za-z\s]+\Z")


def _city_state(line: str) -> tuple[str, str] | None:
    for sm in _STATE_AFTER_COMMA_RE.finditer(line):
        cm = _CITY_RUN_RE.search(line, 0, sm.start())
        if cm:
            return cm.group(0), sm.group(1)
    return None

_KV_SPLIT_RE = re.compile(r"^([^:|]{1,60}?)\s*:\s*(.+)$")


@dataclass
class Item:
    description: str = ""
    quantity: int | None = None
    unit_price_cents: int | None = None
    total_cents: int | None = None


@dataclass
class Fields:
    invoice_number: str | None = None
    vendor_name: str = ""
    vendor_street: str = ""
    vendor_city: str = ""
    vendor_state: str = ""
    vendor_postal: str = ""
    grand_total_cents: int | None = None
    taxes_cents: int | None = None
    final_total_cents: int | None = None
    items: list[Item] = field(default_factory=list)
    kv_pairs: list[tuple[str, str]] = field(default_factory=list)
    spans: list[Span] = field(default_factory=list)


def extract_invoice_number(text: str,
                           lower: str | None = None) -> tuple[str | None, Span | None]:
    if lower is None:
        lower = text.lower()
    if "inv" not in lower:  # all three patterns require it (pure gate)
        return None, None
    for pat in INVOICE_NUMBER_PATTERNS:
        m = pat.search(text)
        if m:
            return m.group(1), (m.start(1), m.end(1), "id")
    return None, None


def extract_totals(text: str,
                   lower: str | None = None) -> tuple[dict[str, int | None], list[Span]]:
    """subtotal→grand_total, tax→taxes, total→final_total (reference naming)."""
    out: dict[str, int | None] = {
        "grand_total_cents": None, "taxes_cents": None, "final_total_cents": None,
    }
    spans: list[Span] = []
    if lower is None:
        lower = text.lower()
    if "total" not in lower and "tax" not in lower:  # pure gate
        return out, spans
    _KEY_BY_GROUP = ("grand_total_cents", "taxes_cents", "final_total_cents")
    found: dict[str, tuple] = {}
    for m in _TOTALS_ALL_RE.finditer(text):
        kind = 0 if m.group(1) else (1 if m.group(2) else 2)
        key = _KEY_BY_GROUP[kind]
        if key not in found:
            found[key] = (parse_money_cents(m.group(4)),
                          (m.start(4), m.end(4), "money"))
            if len(found) == 3:
                break
    # emit in the reference's fixed order (subtotal, tax, total)
    for key in _KEY_BY_GROUP:
        if key in found:
            out[key] = found[key][0]
            spans.append(found[key][1])
    return out, spans


def _vendor_from_lines(lines: list[str]) -> dict[str, str]:
    """lines = the first ≤4 vendor-material lines (non-blank, non-table,
    non-kv), reference :386-425 semantics."""
    out = {"vendor_name": "", "vendor_street": "", "vendor_city": "",
           "vendor_state": "", "vendor_postal": ""}
    if not lines:
        return out
    out["vendor_name"] = lines[0].strip()
    addr_lines = lines[1:4]
    if addr_lines:
        out["vendor_street"] = addr_lines[0].strip()
    if len(addr_lines) > 1:
        address_line = addr_lines[1]
        pm = _POSTAL_RE.search(address_line)
        if pm:
            out["vendor_postal"] = pm.group(0)
        cs = _city_state(address_line)
        if cs:
            out["vendor_city"] = cs[0].strip()
            out["vendor_state"] = cs[1]
    return out


def extract_vendor(text: str) -> dict[str, str]:
    """First non-extracted-structure line = vendor name; next lines 2-4 =
    address block (reference :386-397).  Lines that are table rows or
    ``key: value`` lines are not vendor material."""
    lines = []
    for ln in text.split("\n"):
        if not ln.strip() or " | " in ln or _KV_SPLIT_RE.match(ln):
            continue
        lines.append(ln)
        if len(lines) == 4:  # only name + 3 address lines are ever used
            break
    return _vendor_from_lines(lines)


def extract_kv_pairs(text: str) -> list[tuple[str, str]]:
    """``key: value`` lines (reference ``_extract_key_value_pair``).
    The key must be short (≤60 chars, no pipe) to avoid swallowing prose;
    first colon splits."""
    pairs: list[tuple[str, str]] = []
    for ln in text.split("\n"):
        m = _KV_SPLIT_RE.match(ln.strip())
        if m:
            key, val = m.group(1).strip(), m.group(2).strip()
            if key and val:
                pairs.append((key, val))
    return pairs


def _tables_from_text(text: str) -> list[list[list[str]]]:
    """Contiguous runs of ``a | b | c`` lines form one table each (the
    uniform table shape produced by the html/markdown/pdf extractors)."""
    tables: list[list[list[str]]] = []
    cur: list[list[str]] = []
    for ln in text.split("\n"):
        if " | " in ln:
            cur.append([c.strip() for c in ln.split(" | ")])
        else:
            if cur:
                tables.append(cur)
                cur = []
    if cur:
        tables.append(cur)
    return tables


def _items_from_tables(tables: list[list[list[str]]]) -> list[Item]:
    """Reference ``_extract_items``: for each table skip the header row,
    keep rows with ≥4 cells as (description, quantity, unit price,
    total); a row whose quantity cell is non-empty but non-integer is
    skipped (the reference's ValueError → continue)."""
    items: list[Item] = []
    for table in tables:
        for row in table[1:] if len(table) > 1 else []:
            if len(row) < 4:
                continue
            try:
                qty = int(row[1]) if row[1].strip() else None
            except ValueError:
                continue
            items.append(Item(
                description=row[0],
                quantity=qty,
                unit_price_cents=parse_money_cents(row[2]) if row[2].strip() else None,
                total_cents=parse_money_cents(row[3]) if row[3].strip() else None,
            ))
    return items


def extract_items(text: str) -> list[Item]:
    return _items_from_tables(_tables_from_text(text))


class Structures:
    """Single-pass line classification over extracted text: vendor
    material, ``key: value`` pairs, pipe tables (+ table-row/kv line spans) —
    everything the downstream extractors need from lines, computed with
    ONE split and ONE kv-regex match per line instead of four separate
    line scans (pure optimization; per-extractor semantics unchanged and
    pinned by the individual extract_* unit tests)."""

    __slots__ = ("vendor", "kv_pairs", "items", "line_spans")

    def __init__(self, text: str) -> None:
        vendor_lines: list[str] = []
        kv_pairs: list[tuple[str, str]] = []
        tables: list[list[list[str]]] = []
        cur_table: list[list[str]] = []
        spans: list[Span] = []
        pos = 0
        for ln in text.split("\n"):
            end = pos + len(ln)
            if " | " in ln:
                cur_table.append([c.strip() for c in ln.split(" | ")])
                start = pos + (len(ln) - len(ln.lstrip()))
                spans.append((start, pos + len(ln.rstrip()), "table_row"))
                # parity with extract_kv_pairs: a table row whose text
                # before the first pipe holds "k: v" still yields a pair
                m = _KV_SPLIT_RE.match(ln.strip())
                if m:
                    key, val = m.group(1).strip(), m.group(2).strip()
                    if key and val:
                        kv_pairs.append((key, val))
            else:
                if cur_table:
                    tables.append(cur_table)
                    cur_table = []
                stripped = ln.strip()
                if stripped:
                    m = _KV_SPLIT_RE.match(stripped)
                    if m:
                        key, val = m.group(1).strip(), m.group(2).strip()
                        if key and val:
                            kv_pairs.append((key, val))
                            start = pos + (len(ln) - len(ln.lstrip()))
                            spans.append((start, pos + len(ln.rstrip()), "kv"))
                    elif len(vendor_lines) < 4:
                        vendor_lines.append(ln)
            pos = end + 1
        if cur_table:
            tables.append(cur_table)
        self.vendor = _vendor_from_lines(vendor_lines)
        self.kv_pairs = kv_pairs
        self.items = _items_from_tables(tables)
        self.line_spans = spans

"""Per-turn extraction: the composed semantic core of the engine.

One turn's ``text`` payload goes through the same stages a document went
through in the reference pipeline (``app/main.py:86-173``):

    normalize → sniff content type → content extractor (html / markdown /
    pdf-layout / plain) → field extraction (invoice number, date, totals,
    vendor, items, kv pairs) → spans

with the reference's two cross-cutting behaviors preserved:

- **fallback chain** (``extract_invoice_data``,
  ``app/utils/data_extractor.py:259-274``): if the content-type-specific
  extractor yields an *invalid* result (empty main text from a non-empty
  payload), fall back to the plain-text path.
- **degrade, don't abort** (``_extract_single_result``, :234-257): any
  exception during extraction yields an empty record plus an
  ``extract_error`` marker; a poison row never kills a batch.

Everything is a pure function of ``(text, as_of)``; ``as_of`` replaces
the reference's ``date.today()`` reads for reproducibility.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import date

from .dates import find_date
from .fields import (
    Item,
    Structures,
    extract_invoice_number,
    extract_totals,
)
from .html_extract import extract_html
from .markdown_extract import extract_markdown
from .pdfish import extract_pdf_layout, num_pages
from .sniff import sniff_content_type
from .textnorm import normalize_text

DEFAULT_AS_OF = date(2026, 1, 1)  # pinned "today" for reproducible runs


@dataclass
class TurnRecord:
    content_type: str = "empty"
    extracted_text: str = ""
    pages: int = 1
    invoice_number: str | None = None
    invoice_date: date | None = None
    grand_total_cents: int | None = None
    taxes_cents: int | None = None
    final_total_cents: int | None = None
    vendor_name: str = ""
    vendor_street: str = ""
    vendor_city: str = ""
    vendor_state: str = ""
    vendor_postal: str = ""
    items: list[Item] = field(default_factory=list)
    kv_pairs: list[tuple[str, str]] = field(default_factory=list)
    spans: list[tuple[int, int, str]] = field(default_factory=list)
    extract_error: str = ""
    backend: str = "generic"  # which field backend produced the record


# ---------------------------------------------------------------------------
# Extractor registry (§2.8 user-extension surface): the reference's
# de-facto plugin point is its fallback-chain extractor selection
# (app/utils/data_extractor.py:259-268) plus the dormant template-dir /
# swappable-OCR-engine hooks (app/config.py:38, README.md:195-198).
# Here it is explicit: content-type extractors are registered by name,
# and a `tool` value can override the sniff-based choice entirely.
# ---------------------------------------------------------------------------

CONTENT_EXTRACTORS: dict[str, callable] = {
    "html": extract_html,
    "markdown": extract_markdown,
    "pdf": extract_pdf_layout,
    "plain": lambda t: t,
    "empty": lambda t: "",
}

TOOL_EXTRACTORS: dict[str, callable] = {}

# Field-level backends (M7 parity, app/utils/data_extractor.py:259-274):
# a preferred backend keyed by the turn's ``tool``; its record is used
# only if it passes the reference's validity predicate, else the generic
# regex backend runs (primary → secondary → plain-content fallback).
# Registered per worker process (actor ``__init__``), like the
# reference's per-worker DocAI client.
FIELD_BACKENDS: dict[str, callable] = {}


def register_extractor(content_type: str, fn) -> None:
    """Register/override the extractor for a sniffed content type."""
    CONTENT_EXTRACTORS[content_type] = fn


def register_tool_extractor(tool: str, fn) -> None:
    """Route every turn produced by ``tool`` through ``fn`` regardless of
    sniffed content type (content_type becomes ``tool:<name>``)."""
    TOOL_EXTRACTORS[tool] = fn


def register_field_backend(tool: str, backend) -> None:
    """Prefer ``backend(extracted_text, as_of) -> TurnRecord | None``
    for turns produced by ``tool``; falls back to the generic field
    extractor when the backend abstains or its record is invalid."""
    FIELD_BACKENDS[tool] = backend


def record_is_valid(rec: "TurnRecord") -> bool:
    """The reference's fallback predicate (_is_invoice_valid,
    app/utils/data_extractor.py:269-274): any core field present."""
    return bool(rec.invoice_number or rec.vendor_name or rec.invoice_date
                or rec.grand_total_cents is not None)


def extract_main_text(text: str, tool: str = "") -> tuple[str, str, int]:
    """normalize + sniff + content extraction (+ fallback).

    Returns ``(content_type, extracted_text, pages)``.
    """
    norm = normalize_text(text)
    if tool and tool in TOOL_EXTRACTORS:
        extracted = TOOL_EXTRACTORS[tool](norm)
        return f"tool:{tool}", extracted, 1
    ctype = sniff_content_type(norm)
    extracted = CONTENT_EXTRACTORS[ctype](norm)
    # fallback chain: specific extractor produced nothing from a non-empty
    # payload → degrade to the plain path (reference :259-274 semantics)
    if not extracted.strip() and norm.strip():
        extracted = norm
    pages = num_pages(norm) if ctype == "pdf" else 1
    return ctype, extracted, pages


def _line_spans(text: str, pred, kind: str) -> list[tuple[int, int, str]]:
    spans = []
    pos = 0
    for ln in text.split("\n"):
        if pred(ln):
            start = pos + (len(ln) - len(ln.lstrip()))
            spans.append((start, pos + len(ln.rstrip()), kind))
        pos += len(ln) + 1
    return spans


def extract_turn(text: str, as_of: date = DEFAULT_AS_OF,
                 tool: str = "",
                 field_backends: dict | None = None) -> TurnRecord:
    try:
        return _extract_turn_inner(text, as_of, tool, field_backends)
    except Exception as e:  # degrade, never poison the batch
        return TurnRecord(extract_error=f"{type(e).__name__}: {e}"[:200])


def _extract_turn_inner(text: str, as_of: date, tool: str = "",
                        field_backends: dict | None = None) -> TurnRecord:
    ctype, extracted, pages = extract_main_text(text or "", tool)
    rec = TurnRecord(content_type=ctype, extracted_text=extracted, pages=pages)
    if not extracted:
        return rec

    # preferred field backend for this tool (primary); generic regexes
    # below are the secondary (reference chain, data_extractor.py:259-274).
    # Explicit ``field_backends`` (e.g. a TurnExtractor actor's own dict)
    # takes precedence over the process-global registry, so one stage's
    # template routing never leaks into another extractor in the same
    # process.
    backends = FIELD_BACKENDS if field_backends is None else field_backends
    if tool and tool in backends:
        alt = backends[tool](extracted, as_of)
        if alt is not None and record_is_valid(alt):
            alt.content_type = ctype
            alt.extracted_text = extracted
            alt.pages = pages
            return alt

    lower = extracted.lower()
    rec.invoice_number, id_span = extract_invoice_number(extracted, lower)
    totals, money_spans = extract_totals(extracted, lower)
    rec.grand_total_cents = totals["grand_total_cents"]
    rec.taxes_cents = totals["taxes_cents"]
    rec.final_total_cents = totals["final_total_cents"]
    rec.invoice_date, date_span = find_date(extracted, as_of, lower)
    structures = Structures(extracted)  # one pass: vendor + kv + tables
    vendor = structures.vendor
    rec.vendor_name = vendor["vendor_name"]
    rec.vendor_street = vendor["vendor_street"]
    rec.vendor_city = vendor["vendor_city"]
    rec.vendor_state = vendor["vendor_state"]
    rec.vendor_postal = vendor["vendor_postal"]
    rec.items = structures.items
    rec.kv_pairs = structures.kv_pairs

    spans: list[tuple[int, int, str]] = []
    if id_span:
        spans.append(id_span)
    if date_span:
        spans.append((date_span[0], date_span[1], "date"))
    spans.extend(money_spans)
    spans.extend(structures.line_spans)
    spans.sort(key=lambda s: (s[0], s[1], s[2]))
    rec.spans = spans
    return rec


def items_rollup(items: list[Item]) -> tuple[int, int, int | None]:
    """Per-record line-item rollup (reference exporter,
    ``app/utils/exporter.py:52-65``): total quantity, total amount
    (cents), average unit price (cents, None when qty==0).
    Rounding: integer half-up, exact."""
    qty = sum(i.quantity for i in items if i.quantity is not None)
    total = sum(i.total_cents for i in items if i.total_cents is not None)
    avg = (2 * total + qty) // (2 * qty) if qty > 0 else None
    return qty, total, avg

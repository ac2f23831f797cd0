"""Rule-pack (template) field-extraction backend — the engine's second
real extraction backend.

The reference runs a two-backend chain: a preferred structured backend
(DocAI entities) whose result is used only if it passes a validity
check, else the generic regex backend
(``app/utils/data_extractor.py:259-274``); it also ships a dormant
vendor-template hook (``INVOICE2DATA_TEMPLATES_DIR``,
``app/config.py:38``).  This module is that alternate backend made
real: a *template* is a vendor-keyed rule pack — a cheap literal gate
plus compiled field regexes (invoice2data's model, public) — that
extracts the invoice fields directly, skipping the generic heuristics.

Chain position (see ``extract.FIELD_BACKENDS``): when a turn's ``tool``
routes here and a template matches AND the result passes the
reference's validity predicate, the template record wins; otherwise the
generic extractor runs (primary → secondary), and the content-level
plain-text fallback below that still applies (→ plain).
"""

from __future__ import annotations

import re
from datetime import date

from .dates import find_date
from .fields import Item
from .money import parse_money_cents


class Template:
    """One vendor rule pack.  ``keyword`` is a literal containment gate;
    field patterns each carry one capture group."""

    def __init__(self, name: str, keyword: str, *,
                 vendor_name: str = "",
                 invoice_number: str = r"(?m)^Invoice Number:\s*(\S+)\s*$",
                 date_line: str = r"(?m)^Invoice Date:\s*([^\n]+?)\s*$",
                 subtotal: str = r"(?m)^Subtotal:\s*\$?([\d,]+\.\d{2})\s*$",
                 tax: str = r"(?m)^Tax:\s*\$?([\d,]+\.\d{2})\s*$",
                 total: str = r"(?m)^Total:\s*\$?([\d,]+\.\d{2})\s*$",
                 item_line: str = (r"(?m)^(.+?) \| (\d+) \| "
                                   r"([\d,]+\.\d{2}) \| ([\d,]+\.\d{2})\s*$"),
                 address: str | None = None):
        self.name = name
        self.keyword = keyword
        self.vendor_name = vendor_name or keyword
        self.invoice_number = re.compile(invoice_number)
        self.date_line = re.compile(date_line)
        self.subtotal = re.compile(subtotal)
        self.tax = re.compile(tax)
        self.total = re.compile(total)
        self.item_line = re.compile(item_line)
        # address: the two lines after the vendor-name line, city line as
        # "City Name, ST 12345"
        self.address = re.compile(
            address if address is not None
            else re.escape(keyword) + r"\n([^\n]+)\n([^\n]+?), ([A-Z]{2}) (\d{5})")


# Rule packs for the corpus vendors (synth.py _VENDORS); a deployment
# would load these from a template directory, one pack per vendor.
DEFAULT_TEMPLATES: tuple[Template, ...] = tuple(
    Template(name=key, keyword=vendor)
    for key, vendor in (
        ("acme", "Acme Supplies Inc"),
        ("globex", "Globex Corporation"),
        ("initech", "Initech LLC"),
        ("umbrella", "Umbrella Trading Co"),
        ("stark", "Stark Industrial"),
    )
)


def load_template_dir(path: str) -> tuple[Template, ...]:
    """Load rule packs from a directory of JSON files — the working
    analogue of the reference's dormant ``INVOICE2DATA_TEMPLATES_DIR``
    hook (``app/config.py:38``).  Each ``*.json`` file holds one pack:
    ``{"name": ..., "keyword": ...}`` plus any :class:`Template` field
    pattern to override (``invoice_number``, ``date_line``,
    ``subtotal``, ``tax``, ``total``, ``item_line``, ``address``,
    ``vendor_name``).  Files load in sorted order (deterministic match
    priority)."""
    import json
    import os

    packs = []
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".json"):
            continue
        with open(os.path.join(path, fname)) as f:
            spec = json.load(f)
        name = spec.pop("name")
        keyword = spec.pop("keyword")
        packs.append(Template(name=name, keyword=keyword, **spec))
    return tuple(packs)


class TemplatePack:
    """Compiled template set (compile once — in an actor's ``__init__``,
    never per batch).  ``extract`` returns a TurnRecord-shaped result or
    None when no template matches."""

    def __init__(self, templates: tuple[Template, ...] = DEFAULT_TEMPLATES):
        self.templates = templates

    def match(self, text: str) -> Template | None:
        for t in self.templates:
            if t.keyword in text:
                return t
        return None

    def extract(self, text: str, as_of: date):
        # multi-page payloads separate pages with \f, which (?m)^/$ do
        # not treat as a line boundary — normalize before matching (the
        # reference's preferred backend also works page-by-page)
        text = text.replace("\f", "\n")
        tpl = self.match(text)
        if tpl is None:
            return None
        from .extract import TurnRecord  # local import: avoid cycle

        rec = TurnRecord(backend=f"template:{tpl.name}")
        matched_fields = 0
        m = tpl.invoice_number.search(text)
        if m:
            rec.invoice_number = m.group(1)
            matched_fields += 1
        m = tpl.date_line.search(text)
        if m:
            # same parser as the generic backend, scoped to the line —
            # identical dates wherever both backends extract one
            rec.invoice_date, _ = find_date(m.group(1), as_of)
            if rec.invoice_date is not None:
                matched_fields += 1
        for pat, key in ((tpl.subtotal, "grand_total_cents"),
                         (tpl.tax, "taxes_cents"),
                         (tpl.total, "final_total_cents")):
            m = pat.search(text)
            if m:
                setattr(rec, key, parse_money_cents(m.group(1)))
                matched_fields += 1
        if matched_fields == 0:
            # keyword alone is not an invoice (invoice2data: no required
            # fields → no result) — abstain so the generic backend runs
            return None
        rec.vendor_name = tpl.vendor_name
        m = tpl.address.search(text)
        if m:
            rec.vendor_street = m.group(1).strip()
            rec.vendor_city = m.group(2).strip()
            rec.vendor_state = m.group(3)
            rec.vendor_postal = m.group(4)
        items = []
        for m in tpl.item_line.finditer(text):
            items.append(Item(description=m.group(1).strip(),
                              quantity=int(m.group(2)),
                              unit_price_cents=parse_money_cents(m.group(3)),
                              total_cents=parse_money_cents(m.group(4))))
        rec.items = items
        return rec

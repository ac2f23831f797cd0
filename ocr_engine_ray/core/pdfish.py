"""PDF-layout payload parsing with reading-order reconstruction — the
graft analogue of the reference's PDF → page-image → OCR path
(``app/utils/file_handler.py:163-186`` page split,
``app/utils/ocr_engine.py:174-227`` ordered per-page loop, ``:229-237``
multipage merge).

Real PDF backends (pymupdf/pdfminer) are not available in this
environment, so the engine defines a deterministic *layout text* format
that models what a PDF text extractor yields — positioned fragments that
must be re-ordered into reading order::

    %PDF-LAYOUT 1.0
    @page 1
    72,720:Invoice Number: INV-12345
    300,720:ACME Corp
    72,700:Date: 2024-03-12
    @page 2
    ...

Each fragment line is ``x,y:text`` with PDF-style coordinates (y grows
UPWARD from the page bottom, like real PDF user space).  Reading order
reconstruction per page:

1. Group fragments into visual lines: two fragments share a line when
   |y1 − y2| ≤ LINE_TOLERANCE (6 units); a line's y is the y of its
   first-seen fragment.
2. Sort lines by y DESCENDING (top of page first), fragments within a
   line by x ascending, joined with a single space.
3. Pages are emitted in ``@page`` order separated by a form feed ("\f"),
   mirroring the reference's page_number/total_pages ordering contract.

Malformed fragment lines are ignored (degrade, don't abort).
"""

from __future__ import annotations

import re

LINE_TOLERANCE = 6.0

_FRAG_RE = re.compile(r"^\s*(-?\d+(?:\.\d+)?)\s*,\s*(-?\d+(?:\.\d+)?)\s*:(.*)$")
_PAGE_RE = re.compile(r"^\s*@page\b")

PDF_MAGIC = "%PDF"


def is_pdf_layout(text: str) -> bool:
    return text.lstrip()[:4].upper().startswith(PDF_MAGIC.upper())


def _render_page(frags: list[tuple[float, float, str]]) -> str:
    """frags: (x, y, text) in arrival order → reading-order text."""
    lines: list[tuple[float, list[tuple[float, str]]]] = []
    for x, y, t in frags:
        for ly, items in lines:
            if abs(ly - y) <= LINE_TOLERANCE:
                items.append((x, t))
                break
        else:
            lines.append((y, [(x, t)]))
    # top of page first = highest y first; stable for equal y by arrival
    lines.sort(key=lambda p: -p[0])
    out = []
    for _, items in lines:
        items.sort(key=lambda p: p[0])
        out.append(" ".join(t for _, t in items if t))
    return "\n".join(s for s in out if s.strip())


def extract_pdf_layout(text: str) -> str:
    """Parse a %PDF-LAYOUT payload into reading-order text, pages joined
    by form feed.  Non-fragment, non-directive lines are ignored."""
    pages: list[list[tuple[float, float, str]]] = [[]]
    for line in text.split("\n"):
        if _PAGE_RE.match(line):
            if pages[-1]:
                pages.append([])
            continue
        m = _FRAG_RE.match(line)
        if not m:
            continue
        try:
            x, y = float(m.group(1)), float(m.group(2))
        except ValueError:
            continue
        pages[-1].append((x, y, m.group(3).strip()))
    rendered = [_render_page(p) for p in pages if p]
    return "\f".join(r for r in rendered if r)


def num_pages(text: str) -> int:
    """Page count of a %PDF-LAYOUT payload (≥1), the analogue of
    ``total_pages`` (reference ``app/utils/file_handler.py:171-175``)."""
    n = sum(1 for line in text.split("\n") if _PAGE_RE.match(line))
    return max(1, n)

"""HTML main-content extraction (boilerplate strip) — the graft analogue
of the reference's OCR text extraction + layout parse
(``app/utils/ocr_engine.py:275-306`` words/text, ``:308-353`` blocks →
tables + key:value pairs).

Built on the stdlib ``html.parser`` (selectolax/lxml are not available in
this environment) with the classic text-density / link-density DOM
heuristics (à la Readability / trafilatura, both public):

- Whole subtrees under boilerplate containers are dropped:
  ``script style nav footer header aside form noscript button select
  option iframe svg head template``.
- The document is segmented into *blocks* at block-level elements
  (``p div li h1..h6 blockquote pre article section main td th tr
  table ul ol``).
- A block is kept iff:
    * its collapsed text length ≥ MIN_BLOCK_CHARS (3), and
    * its link density (chars inside <a> / total chars) ≤ 0.5.
- Table rows (<tr>) are re-emitted as ``cell | cell | ...`` lines so the
  downstream field extractor parses tables uniformly across content types
  (the analogue of the reference's table block extraction,
  ``app/utils/ocr_engine.py:330-340``).
- Kept blocks are joined with a single newline, in document order.

Deterministic: pure function of the input string.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

DROP_TAGS = frozenset(
    "script style nav footer header aside form noscript button select "
    "option iframe svg head template".split()
)
BLOCK_TAGS = frozenset(
    "p div li h1 h2 h3 h4 h5 h6 blockquote pre article section main "
    "table ul ol".split()
)
CELL_TAGS = frozenset(("td", "th"))
VOID_TAGS = frozenset("br hr img input meta link area base col embed source track wbr".split())

MIN_BLOCK_CHARS = 3
MAX_LINK_DENSITY = 0.5

_WS_RE = re.compile(r"\s+")


def _collapse(parts: list[str]) -> str:
    return _WS_RE.sub(" ", "".join(parts)).strip()


class _Block:
    __slots__ = ("parts", "link_chars", "total_chars")

    def __init__(self) -> None:
        self.parts: list[str] = []
        self.link_chars = 0
        self.total_chars = 0

    def keep(self) -> str | None:
        text = _collapse(self.parts)
        if len(text) < MIN_BLOCK_CHARS:
            return None
        if self.total_chars and self.link_chars / self.total_chars > MAX_LINK_DENSITY:
            return None
        return text


class _ContentParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.drop_depth = 0
        self.link_depth = 0
        self.blocks: list[str] = []
        self.cur = _Block()
        # table state
        self.in_row = False
        self.cells: list[list[str]] = []

    # -- block management ------------------------------------------------
    def _flush(self) -> None:
        kept = self.cur.keep()
        if kept is not None:
            self.blocks.append(kept)
        self.cur = _Block()

    # -- parser callbacks ------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in VOID_TAGS:
            if tag == "br" and not self.in_row:
                self.cur.parts.append(" ")
            return
        if tag in DROP_TAGS:
            self.drop_depth += 1
            return
        if self.drop_depth:
            return
        if tag == "a":
            self.link_depth += 1
            return
        if tag == "tr":
            self._flush()
            self.in_row = True
            self.cells = []
            return
        if tag in CELL_TAGS and self.in_row:
            self.cells.append([])
            return
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS:
            if self.drop_depth:
                self.drop_depth -= 1
            return
        if self.drop_depth:
            return
        if tag == "a":
            if self.link_depth:
                self.link_depth -= 1
            return
        if tag == "tr":
            if self.in_row:
                row = [_collapse(c) for c in self.cells]
                row = [c for c in row if c]
                if row:
                    self.blocks.append(" | ".join(row))
                self.in_row = False
                self.cells = []
            return
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self.drop_depth or not data:
            return
        if self.in_row:
            if self.cells:
                self.cells[-1].append(data)
            return
        self.cur.parts.append(data)
        n = len(data.strip())
        self.cur.total_chars += n
        if self.link_depth:
            self.cur.link_chars += n

    def close(self) -> None:  # flush trailing text
        super().close()
        self._flush()


def extract_html(text: str) -> str:
    """Strip boilerplate from an HTML payload, returning main-content
    lines joined by newlines.  Never raises: on any parser explosion the
    fallback is tag-stripped text (the reference's degrade-don't-abort
    behavior, ``app/utils/data_extractor.py:255-257``)."""
    try:
        p = _ContentParser()
        p.feed(text)
        p.close()
        return "\n".join(p.blocks)
    except Exception:
        return _WS_RE.sub(" ", unescape(re.sub(r"<[^>]*>", " ", text))).strip()

r"""HTML main-content extraction (boilerplate strip) — the graft analogue
of the reference's OCR text extraction + layout parse
(``app/utils/ocr_engine.py:275-306`` words/text, ``:308-353`` blocks →
tables + key:value pairs).

selectolax/lxml are not available in this environment, so parsing is a
single-pass regex tokenizer (tags / comments / declarations, with raw-text
handling for <script>/<style>) feeding a small block state machine — ~4×
faster than ``html.parser`` on this workload and tolerant of malformed
input (an unmatched ``<`` is just text; a missing close tag at EOF drops
the tail of the tag only).

Extraction heuristics are the classic text-density / link-density DOM
rules (à la Readability / trafilatura, both public):

- Whole subtrees under boilerplate containers are dropped:
  ``script style nav footer header aside form noscript button select
  option iframe svg head template``.
- The document is segmented into *blocks* at block-level elements
  (``p div li h1..h6 blockquote pre article section main td th tr
  table ul ol``).
- A block is kept iff its collapsed text length ≥ MIN_BLOCK_CHARS (3)
  and its link density (chars inside <a> / total chars) ≤ 0.5.
- Table rows (<tr>) are re-emitted as ``cell | cell | ...`` lines so the
  downstream field extractor parses tables uniformly across content
  types (the analogue of the reference's table block extraction,
  ``app/utils/ocr_engine.py:330-340``).
- Kept blocks are joined with a single newline, in document order.

Deterministic: pure function of the input string.
"""

from __future__ import annotations

import re
from html import unescape

DROP_TAGS = frozenset(
    "script style nav footer header aside form noscript button select "
    "option iframe svg head template".split()
)
BLOCK_TAGS = frozenset(
    "p div li h1 h2 h3 h4 h5 h6 blockquote pre article section main "
    "table ul ol".split()
)
CELL_TAGS = frozenset(("td", "th"))
RAWTEXT_TAGS = frozenset(("script", "style"))

MIN_BLOCK_CHARS = 3
MAX_LINK_DENSITY = 0.5

_WS_RE = re.compile(r"\s+")
# one token = comment | declaration/PI | tag (quoted attrs may hold '>')
_TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|$)"
    r"|<![^>]*>"
    r"|<\?[^>]*>"
    r"|<(/?)([a-zA-Z][a-zA-Z0-9]*)(?:\"[^\"]*\"|'[^']*'|[^>\"'])*>",
    re.S,
)


def _collapse(parts: list[str]) -> str:
    return _WS_RE.sub(" ", "".join(parts)).strip()


def _maybe_unescape(s: str) -> str:
    return unescape(s) if "&" in s else s


class _Extractor:
    __slots__ = ("drop_depth", "link_depth", "blocks", "parts",
                 "link_chars", "total_chars", "in_row", "cells")

    def __init__(self) -> None:
        self.drop_depth = 0
        self.link_depth = 0
        self.blocks: list[str] = []
        self.parts: list[str] = []
        self.link_chars = 0
        self.total_chars = 0
        self.in_row = False
        self.cells: list[list[str]] = []

    def _flush(self) -> None:
        if self.parts:
            text = _collapse(self.parts)
            if (len(text) >= MIN_BLOCK_CHARS
                    and (not self.total_chars
                         or self.link_chars / self.total_chars <= MAX_LINK_DENSITY)):
                self.blocks.append(text)
            self.parts = []
        self.link_chars = 0
        self.total_chars = 0

    def data(self, chunk: str) -> None:
        if self.drop_depth or not chunk:
            return
        chunk = _maybe_unescape(chunk)
        if self.in_row:
            if self.cells:
                self.cells[-1].append(chunk)
            return
        self.parts.append(chunk)
        n = len(chunk.strip())
        self.total_chars += n
        if self.link_depth:
            self.link_chars += n

    def start(self, tag: str) -> None:
        if tag in DROP_TAGS:
            self.drop_depth += 1
            return
        if self.drop_depth:
            return
        if tag == "a":
            self.link_depth += 1
        elif tag == "br":
            if not self.in_row:
                self.parts.append(" ")
        elif tag == "tr":
            self._flush()
            self.in_row = True
            self.cells = []
        elif tag in CELL_TAGS:
            if self.in_row:
                self.cells.append([])
        elif tag in BLOCK_TAGS:
            self._flush()

    def end(self, tag: str) -> None:
        if tag in DROP_TAGS:
            if self.drop_depth:
                self.drop_depth -= 1
            return
        if self.drop_depth:
            return
        if tag == "a":
            if self.link_depth:
                self.link_depth -= 1
        elif tag == "tr":
            if self.in_row:
                row = [c for c in (_collapse(x) for x in self.cells) if c]
                if row:
                    self.blocks.append(" | ".join(row))
                self.in_row = False
                self.cells = []
        elif tag in BLOCK_TAGS:
            self._flush()

    def finish(self) -> str:
        self._flush()
        return "\n".join(self.blocks)


def extract_html(text: str) -> str:
    """Strip boilerplate from an HTML payload, returning main-content
    lines joined by newlines.  Never raises: on any unexpected explosion
    the fallback is tag-stripped text (the reference's degrade-don't-abort
    behavior, ``app/utils/data_extractor.py:255-257``)."""
    try:
        ex = _Extractor()
        lower = None  # lazily lowered copy for raw-text close-tag search
        pos = 0
        search = _TOKEN_RE.search
        while True:
            m = search(text, pos)
            if m is None:
                ex.data(text[pos:])
                break
            if m.start() > pos:
                ex.data(text[pos:m.start()])
            pos = m.end()
            tag = m.group(2)
            if tag is None:
                continue  # comment / declaration / PI
            tag = tag.lower()
            if m.group(1):  # closing tag
                ex.end(tag)
            else:
                ex.start(tag)
                if tag in RAWTEXT_TAGS:
                    # raw-text element: skip to its close tag verbatim
                    if lower is None:
                        lower = text.lower()
                    close = lower.find("</" + tag, pos)
                    if close == -1:
                        break  # unterminated script/style: drop the tail
                    gt = text.find(">", close)
                    pos = m.end() if gt == -1 else gt + 1
                    if gt == -1:
                        break
                    ex.end(tag)
        return ex.finish()
    except Exception:
        return _WS_RE.sub(" ", unescape(re.sub(r"<[^>]*>", " ", text))).strip()

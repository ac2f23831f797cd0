"""Markdown main-content extraction: strip markup, keep content.

The markdown analogue of the HTML boilerplate strip — lighter, because
markdown carries little boilerplate.  Deterministic line-based transform:

- fenced code blocks: fences dropped, body kept verbatim
- ATX headings: leading ``#``s removed
- list markers (``- * +`` and ``1.``): removed, text kept
- emphasis ``**x**`` / ``*x*`` / ``__x__`` / ``_x_`` / `` `x` ``: unwrapped
- links ``[label](url)``: label kept, url dropped; images dropped entirely
- block quotes: leading ``>`` removed
- horizontal rules and empty lines: dropped
- pipe-table rows are kept as-is (the shared ``a | b | c`` table shape the
  field extractor consumes); separator rows (``|---|---|``) are dropped
"""

from __future__ import annotations

import re

_FENCE_RE = re.compile(r"^\s*```")
_HEADING_RE = re.compile(r"^(#{1,6})\s+")
_ULIST_RE = re.compile(r"^\s*[-*+]\s+")
_OLIST_RE = re.compile(r"^\s*\d+\.\s+")
_QUOTE_RE = re.compile(r"^\s*>\s?")
_HRULE_RE = re.compile(r"^\s*([-*_])\s*(\1\s*){2,}$")
_TABLE_SEP_RE = re.compile(r"^\s*\|?\s*:?-{2,}:?\s*(\|\s*:?-{2,}:?\s*)+\|?\s*$")
_IMG_RE = re.compile(r"!\[[^\]]*\]\([^)]*\)")
_LINK_RE = re.compile(r"\[([^\]]+)\]\([^)]*\)")
_BOLD_RE = re.compile(r"(\*\*|__)(.+?)\1")
_EM_RE = re.compile(r"(\*|_)(.+?)\1")
_CODE_RE = re.compile(r"`([^`]*)`")


def _is_table_row(line: str) -> bool:
    return line.count("|") >= 2


def extract_markdown(text: str) -> str:
    out: list[str] = []
    in_fence = False
    for line in text.split("\n"):
        if _FENCE_RE.match(line):
            in_fence = not in_fence
            continue
        if in_fence:
            if line.strip():
                out.append(line.rstrip())
            continue
        if _HRULE_RE.match(line) or _TABLE_SEP_RE.match(line):
            continue
        if _is_table_row(line):
            cells = [c.strip() for c in line.strip().strip("|").split("|")]
            cells = [c for c in cells if c]
            if cells:
                out.append(" | ".join(cells))
            continue
        # each sub is gated on a cheap substring test (pure optimization);
        # gates re-check the head after each strip so stacked prefixes
        # ("> - item") unwrap exactly like the ungated sequential subs
        s = line
        head = s.lstrip()[:1]
        if head == "#":
            s = _HEADING_RE.sub("", s)
            head = s.lstrip()[:1]
        if head == ">":
            s = _QUOTE_RE.sub("", s)
            head = s.lstrip()[:1]
        if head in "-*+" and head:
            s = _ULIST_RE.sub("", s)
        elif head.isdigit():
            s = _OLIST_RE.sub("", s)
        if "[" in s:
            s = _IMG_RE.sub("", s)
            s = _LINK_RE.sub(r"\1", s)
        if "*" in s or "_" in s:
            s = _BOLD_RE.sub(r"\2", s)
            s = _EM_RE.sub(r"\2", s)
        if "`" in s:
            s = _CODE_RE.sub(r"\1", s)
        s = s.strip()
        if s:
            out.append(s)
    return "\n".join(out)

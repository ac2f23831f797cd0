"""Content-type sniffing for transcript payloads — the graft analogue of
the reference's MIME detection from byte magic + filename
(``app/utils/file_handler.py:44-51``, ``app/utils/ocr_engine.py:419-444``).

The reference sniffs %PDF / JPEG / PNG magic and defaults to PDF; here we
classify a *text* payload into one of::

    "pdf" | "html" | "markdown" | "plain" | "empty"

Detection order mirrors the reference (explicit magic first, heuristics
after, a default last):

1. empty/whitespace-only            → "empty"
2. leading "%PDF" magic (our synthetic PDF-layout payloads reuse the real
   PDF magic)                       → "pdf"
3. leading "<!doctype html" / "<html" (case-insensitive), or ≥2 distinct
   known HTML tags anywhere         → "html"
4. markdown signals (ATX heading, fenced code, list markers, link syntax)
   — ≥2 hits                        → "markdown"
5. otherwise                        → "plain"
"""

from __future__ import annotations

import re

HTML_TAG_RE = re.compile(
    r"</?(?:html|head|body|div|p|span|a|ul|ol|li|table|tr|td|th|h[1-6]|nav|"
    r"footer|header|aside|article|section|script|style|br|img|title|main)\b",
    re.IGNORECASE,
)
_MD_SIGNALS = (
    re.compile(r"(?m)^#{1,6} \S"),          # ATX heading
    re.compile(r"(?m)^```"),                # fenced code block
    re.compile(r"(?m)^[-*+] \S"),           # unordered list item
    re.compile(r"\[[^\]]+\]\([^)]+\)"),     # inline link
    re.compile(r"(?m)^\d+\. \S"),           # ordered list item
    re.compile(r"\*\*[^*\n]+\*\*"),         # bold
)


def sniff_content_type(text: str) -> str:
    if not text or not text.strip():
        return "empty"
    head = text.lstrip()[:256].lower()
    if head.startswith("%pdf"):
        return "pdf"
    if head.startswith("<!doctype html") or head.startswith("<html"):
        return "html"
    if "<" in text:
        tags = HTML_TAG_RE.findall(text)
        if len({t.lower() for t in tags}) >= 2:
            return "html"
    # ≥2 distinct markdown signals are required, and every signal except
    # the ordered-list one contains one of these characters (pure gate)
    if any(c in text for c in "#`*-[+"):
        md_hits = sum(1 for rx in _MD_SIGNALS if rx.search(text))
        if md_hits >= 2:
            return "markdown"
    return "plain"

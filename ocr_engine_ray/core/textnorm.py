"""Text normalization — the graft analogue of the reference's image
preprocessing step (grayscale → denoise → binarize,
reference ``app/utils/ocr_engine.py:261-273``): a cheap, lossy-but-stable
cleanup applied to every payload before classification/extraction.

Semantics (deterministic, order of application matters):

1. Unicode NFC normalization.
2. Normalize line endings (\r\n, \r → \n).
3. Strip control characters except \n and \t (the "denoise").
4. Collapse runs of spaces/tabs to a single space; strip trailing
   whitespace per line (the "binarize" — canonical whitespace).
5. Collapse runs of >2 blank lines to exactly 2.
6. Strip leading/trailing whitespace of the whole payload.
"""

from __future__ import annotations

import re
import unicodedata

_SPACE_RUN_RE = re.compile(r"[ \t]+")
_TRAIL_RE = re.compile(r" +\n")
_BLANK_RUN_RE = re.compile(r"\n{3,}")
# C-level deletion table for control chars (except \n, \t) — ~10× faster
# than a regex sub pass; gated behind a C-speed scan because most
# payloads contain no control chars at all (dict-translate still costs
# ~19 µs/KB even when it deletes nothing)
_CTRL_TABLE = {c: None for c in (*range(0x00, 0x09), 0x0B, 0x0C,
                                 *range(0x0E, 0x20), 0x7F)}
_CTRL_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")


def normalize_text(text: str) -> str:
    if not text:
        return ""
    # NFC is the identity on pure ASCII (the common case) — skip it there
    t = text if text.isascii() else unicodedata.normalize("NFC", text)
    if "\r" in t:
        t = t.replace("\r\n", "\n").replace("\r", "\n")
    if _CTRL_RE.search(t) is not None:
        t = t.translate(_CTRL_TABLE)
    # substring gates: each sub only runs when its pattern can match
    if "\t" in t or "  " in t:
        t = _SPACE_RUN_RE.sub(" ", t)
    if " \n" in t:
        t = _TRAIL_RE.sub("\n", t)
    if "\n\n\n" in t:
        t = _BLANK_RUN_RE.sub("\n\n", t)
    return t.strip()

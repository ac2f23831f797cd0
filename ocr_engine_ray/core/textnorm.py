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

_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_SPACE_RUN_RE = re.compile(r"[ \t]+")
_TRAIL_RE = re.compile(r" +\n")
_BLANK_RUN_RE = re.compile(r"\n{3,}")


def normalize_text(text: str) -> str:
    if not text:
        return ""
    t = unicodedata.normalize("NFC", text)
    t = t.replace("\r\n", "\n").replace("\r", "\n")
    t = _CTRL_RE.sub("", t)
    t = _SPACE_RUN_RE.sub(" ", t)
    t = _TRAIL_RE.sub("\n", t)
    t = _BLANK_RUN_RE.sub("\n\n", t)
    return t.strip()

"""Multi-strategy date extraction — deterministic re-expression of the
reference's ``_extract_date`` (``app/utils/data_extractor.py:38-192``):
keyword-proximity search first, then a whole-text scan, over the same
pattern families, trying date orders DMY → MDY → YMD.

Differences from the reference, by design (documented deviations):

- ``dateparser`` is not available here, so each matched candidate string
  is parsed by an explicit, deterministic order-trying parser instead of
  ``dateparser.parse(..., DATE_ORDER=o)``.  The order preference
  (DMY, MDY, YMD) and the first-match-wins control flow are preserved.
- ``RELATIVE_BASE=datetime.now()`` is replaced by an explicit ``as_of``
  date threaded by the caller (pipelines pin it; nothing reads the wall
  clock), so outputs are reproducible across runs/partitions.
- The reference's last-resort "parse the entire text as a date" call is
  dropped: it is nondeterministic noise on long payloads.

Two-digit years are windowed exactly like the reference's dotted-date
branch (``app/utils/data_extractor.py:161-177``): century = as_of.year
// 100; if the resulting year is more than 20 years in the future, the
previous century is used.
"""

from __future__ import annotations

import re
from datetime import date

# Pattern families, in the reference's order (app/utils/data_extractor.py:44-56).
# Families that were duplicates in the reference list are folded together.
DATE_PATTERNS: list[re.Pattern] = [
    re.compile(r"\b(\d{1,2}[/\.-]\d{1,2}[/\.-]\d{2,4})\b"),     # d-m-y any sep
    re.compile(r"\b(\d{4}[/\.-]\d{1,2}[/\.-]\d{1,2})\b"),       # y-m-d any sep
    re.compile(r"\b(\d{8})\b"),                                  # 8-digit
    re.compile(r"\b(\d{1,2}\s+[A-Za-z]{3,9}\.?\s+\d{2,4})\b"),  # 12 Mar 2024
    re.compile(r"\b([A-Za-z]{3,9}\.?\s+\d{1,2},?\s+\d{2,4})\b"),# Mar 12, 2024
    re.compile(r"\b(\d{1,2}\s+\d{1,2}\s+\d{2,4})\b"),           # 12 3 2024
]

DATE_KEYWORDS = [
    "invoice date", "issue date", "due date", "billing date",
    "transaction date", "document date", "statement date", "posting date",
    "dated", "date", "issued", "invoice",
]
# NOTE: unlike the reference (which lists "date" before "invoice date" and
# relies on regex luck), longer keywords are tried first so "invoice date:"
# is attributed to the specific keyword.  Same set of keywords.

_KEYWORD_RES = [
    (kw, re.compile(re.escape(kw) + r"[:\s]*(.{0,50})", re.IGNORECASE))
    for kw in DATE_KEYWORDS
]

MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
    "january": 1, "february": 2, "march": 3, "april": 4, "june": 6,
    "july": 7, "august": 8, "september": 9, "october": 10,
    "november": 11, "december": 12, "sept": 9,
}

_ANY_DIGIT_RE = re.compile(r"\d")
_NUM_SPLIT_RE = re.compile(r"[/\.\-\s]+")
_MONTH_TOKEN_RE = re.compile(r"^([A-Za-z]{3,9})\.?,?$")
_DAY_TOKEN_RE = re.compile(r"^(\d{1,2}),?$")
_YEAR_TOKEN_RE = re.compile(r"^(\d{2,4})$")


def _window_year(y: int, as_of: date) -> int:
    """Two-digit-year century windowing (reference :161-177 semantics)."""
    if y >= 100:
        return y
    century = as_of.year // 100
    full = century * 100 + y
    if full > as_of.year + 20:
        full -= 100
    return full


def _mk(y: int, m: int, d: int) -> date | None:
    try:
        return date(y, m, d)
    except ValueError:
        return None


def parse_date_candidate(s: str, as_of: date) -> date | None:
    """Parse one candidate date string, trying DMY → MDY → YMD.

    Deterministic replacement for the reference's per-candidate
    ``for date_order in ['DMY','MDY','YMD']: dateparser.parse(...)`` loop
    (app/utils/data_extractor.py:76-91).
    """
    s = s.strip()
    if not s:
        return None

    # 8-digit compact: YYYYMMDD, then DDMMYYYY, then MMDDYYYY
    # (reference special forms, :115-137)
    if re.fullmatch(r"\d{8}", s):
        y, m, d = int(s[0:4]), int(s[4:6]), int(s[6:8])
        dt = _mk(y, m, d)
        if dt:
            return dt
        d2, m2, y2 = int(s[0:2]), int(s[2:4]), int(s[4:8])
        return _mk(y2, m2, d2) or _mk(y2, d2, m2)

    # month-name forms: "12 Mar 2024", "Mar 12, 2024", "March 12 24"
    tokens = s.replace(",", " ").split()
    if len(tokens) == 3:
        t0, t1, t2 = tokens
        m_month = _MONTH_TOKEN_RE.match(t1)
        if _DAY_TOKEN_RE.match(t0) and m_month and _YEAR_TOKEN_RE.match(t2):
            mon = MONTHS.get(m_month.group(1).lower())
            if mon:
                return _mk(_window_year(int(t2), as_of), mon, int(t0))
        m_month = _MONTH_TOKEN_RE.match(t0)
        if m_month and _DAY_TOKEN_RE.match(t1) and _YEAR_TOKEN_RE.match(t2):
            mon = MONTHS.get(m_month.group(1).lower())
            if mon:
                return _mk(_window_year(int(t2), as_of), mon, int(t1))
        # "Www Mmm yyyy" (reference family 6): weekday + month, day→1
        # (PREFER_DAY_OF_MONTH='first')
        m0, m1 = _MONTH_TOKEN_RE.match(t0), _MONTH_TOKEN_RE.match(t1)
        if m0 and m1 and _YEAR_TOKEN_RE.match(t2):
            mon = MONTHS.get(m1.group(1).lower())
            if mon:
                return _mk(_window_year(int(t2), as_of), mon, 1)

    # numeric triples with any separator
    parts = [p for p in _NUM_SPLIT_RE.split(s) if p]
    if len(parts) == 3 and all(p.isdigit() for p in parts):
        a, b, c = parts
        if len(a) == 4:  # YMD
            return _mk(int(a), int(b), int(c))
        y = _window_year(int(c), as_of)
        # DMY then MDY (reference's order preference)
        return _mk(y, int(b), int(a)) or _mk(y, int(a), int(b))

    return None


def find_date(text: str, as_of: date,
              lower: str | None = None) -> tuple[date | None, tuple[int, int] | None]:
    """Extract the invoice-date analogue from ``text``.

    Returns ``(date, (start, end))`` where the span covers the matched
    substring in ``text``, or ``(None, None)``.

    Strategy order mirrors the reference: (1) keyword proximity — for
    each keyword, scan the 50 chars after it with each pattern family;
    (2) whole-text scan with each family; (3) dotted two-digit-year form.
    First successful parse wins.
    """
    # every pattern family requires at least one digit; texts without any
    # digits (most prose) short-circuit (pure optimization, same result)
    if not _ANY_DIGIT_RE.search(text):
        return None, None
    text_lower = lower if lower is not None else text.lower()

    # 1. keyword proximity (reference :64-91); the substring gate skips
    # the regex scan for absent keywords without changing semantics
    for kw, kre in _KEYWORD_RES:
        if kw not in text_lower:
            continue
        for m in kre.finditer(text):
            window = m.group(1)
            base = m.start(1)
            for pat in DATE_PATTERNS:
                for dm in pat.finditer(window):
                    dt = parse_date_candidate(dm.group(0), as_of)
                    if dt:
                        return dt, (base + dm.start(), base + dm.end())

    # 2. whole-text scan (reference :93-113)
    for pat in DATE_PATTERNS:
        for dm in pat.finditer(text):
            dt = parse_date_candidate(dm.group(0), as_of)
            if dt:
                return dt, (dm.start(), dm.end())

    # 3. dotted dd.mm.yy (reference :161-177)
    for dm in re.finditer(r"\b(\d{1,2})\.(\d{1,2})\.(\d{2})\b", text):
        d, mth, yy = int(dm.group(1)), int(dm.group(2)), int(dm.group(3))
        y = _window_year(yy, as_of)
        dt = _mk(y, mth, d) or _mk(y, d, mth)
        if dt:
            return dt, (dm.start(), dm.end())

    return None, None

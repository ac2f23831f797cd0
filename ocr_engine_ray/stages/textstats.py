r"""Text-analysis stages: language ID, quality scoring, token counting,
document fingerprinting (the training-data-pipeline operators layered on
the extraction engine; all deterministic, all map_batches).

- ``lang_id``: stopword/character-class n-gram heuristic over a fixed,
  public tiny stopword inventory (en/de/fr/es) + CJK char-class check.
- ``quality``: length / punctuation / stopword / casing ratios composed
  into a [0,1] score (the shape of C4/Gopher-style quality filters,
  public literature).
- ``token counts``: whitespace tokens and BPE-ish subtokens
  (``\w+|[^\w\s]`` pieces).
- ``fingerprint``: 64-bit Rabin-Karp rolling hash over word 4-grams,
  document fingerprint = min over windows (winnowing-lite, Schleimer et
  al. '03, public) — equal fingerprints are strong near-dup hints.
"""

from __future__ import annotations

import re
import zlib

import pyarrow as pa

from ..util import round_sql_f

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "une", "un", "pour", "que", "dans"},
    "es": {"el", "la", "los", "las", "es", "una", "un", "para", "que", "con"},
}
_CJK_RE = re.compile(r"[一-鿿぀-ヿ가-힯]")
_SUBTOKEN_RE = re.compile(r"\w+|[^\w\s]")
_PUNCT_RE = re.compile(r"[^\w\s]")


def detect_lang(text: str) -> str:
    """Best stopword-hit-rate language, 'zh' on CJK density ≥ 5 %,
    'und' (undetermined) when nothing scores."""
    if not text:
        return "und"
    sample = text[:2000]
    if len(_CJK_RE.findall(sample)) >= max(1, len(sample) // 20):
        return "zh"
    toks = [t.lower() for t in sample.split()][:200]
    if not toks:
        return "und"
    best_lang, best_hits = "und", 0
    for lang in ("en", "de", "fr", "es"):  # fixed order = deterministic ties
        hits = sum(1 for t in toks if t in _STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang if best_hits >= 2 else "und"


def quality_score(text: str) -> dict:
    """Component ratios + composite score in [0, 1]."""
    n_chars = len(text)
    toks = text.split()
    n_tokens = len(toks)
    if n_tokens == 0:
        return {"n_chars": n_chars, "n_tokens": 0, "mean_token_len": 0.0,
                "punct_ratio": 0.0, "stopword_ratio": 0.0, "upper_ratio": 0.0,
                "quality": 0.0}
    mean_len = sum(len(t) for t in toks) / n_tokens
    punct = len(_PUNCT_RE.findall(text)) / max(1, n_chars)
    sw = _STOPWORDS["en"]
    stop = sum(1 for t in toks if t.lower() in sw) / n_tokens
    upper = sum(1 for c in text if c.isupper()) / max(1, n_chars)
    # Gopher-shaped gates, soft-combined
    q = 1.0
    if not (3 <= mean_len <= 12):
        q *= 0.5
    if n_tokens < 5:
        q *= 0.3
    if punct > 0.3:
        q *= 0.5
    if upper > 0.3:
        q *= 0.7
    q *= min(1.0, 0.4 + stop * 3)  # some stopwords = natural language
    # round_sql_f (DuckDB ROUND bit-parity) instead of Python round:
    # the 4-decimal values are driver-oracle-compared and the two
    # rounding modes differ by an ulp at scale boundaries
    return {"n_chars": n_chars, "n_tokens": n_tokens,
            "mean_token_len": round_sql_f(mean_len, 4),
            "punct_ratio": round_sql_f(punct, 4),
            "stopword_ratio": round_sql_f(stop, 4),
            "upper_ratio": round_sql_f(upper, 4),
            "quality": round_sql_f(q, 4)}


def count_tokens(text: str) -> tuple[int, int]:
    """(whitespace tokens, BPE-ish subtokens)."""
    return len(text.split()), len(_SUBTOKEN_RE.findall(text))


_B = 1000003
_MOD = (1 << 61) - 1


def fingerprint64(text: str, w: int = 4) -> int:
    """Min rolling hash over word ``w``-grams (winnowing-lite).  0 for
    empty text."""
    toks = text.split()
    if not toks:
        return 0
    hs = [zlib.crc32(t.encode("utf-8", "surrogatepass")) for t in toks]
    if len(hs) < w:
        acc = 0
        for h in hs:
            acc = (acc * _B + h) % _MOD
        return acc or 1
    best = _MOD
    acc = 0
    power = pow(_B, w - 1, _MOD)
    for i, h in enumerate(hs):
        if i >= w:
            acc = (acc - hs[i - w] * power) % _MOD
        acc = (acc * _B + h) % _MOD
        if i >= w - 1 and acc < best:
            best = acc
    return best or 1


def text_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """One pass: lang + quality components + token counts + fingerprint."""
    texts = batch.column(text_col).to_pylist()
    langs, fp, n_sub = [], [], []
    qcols: dict[str, list] = {k: [] for k in
                              ("n_chars", "n_tokens", "mean_token_len",
                               "punct_ratio", "stopword_ratio", "upper_ratio",
                               "quality")}
    for t in texts:
        t = t or ""
        langs.append(detect_lang(t))
        q = quality_score(t)
        for k, v in q.items():
            qcols[k].append(v)
        n_sub.append(len(_SUBTOKEN_RE.findall(t)))
        fp.append(fingerprint64(t))
    out = batch
    out = out.append_column("lang_pred", pa.array(langs, pa.string()))
    for k in ("n_chars", "n_tokens"):
        out = out.append_column(k, pa.array(qcols[k], pa.int64()))
    for k in ("mean_token_len", "punct_ratio", "stopword_ratio",
              "upper_ratio", "quality"):
        out = out.append_column(k, pa.array(qcols[k], pa.float64()))
    out = out.append_column("n_subtokens", pa.array(n_sub, pa.int64()))
    out = out.append_column("fingerprint", pa.array(fp, pa.int64()))
    return out

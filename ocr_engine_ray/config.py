"""Env-driven engine settings — re-expression of the reference's
pydantic ``Settings`` (``app/config.py:5-83``): every tuning knob has a
default chosen by measurement (see BASELINE.md) and an environment
override, so a cluster operator can retune without code changes.

Only read at call time (no import-time freezing) so tests can
monkeypatch the environment.
"""

from __future__ import annotations

import os
from datetime import date


def _int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, "") or default)
    except ValueError:
        return default


def extract_batch_size() -> int:
    """Rows per extraction batch (OCR_ENGINE_BATCH_SIZE; measured best
    1024 — reference BATCH_SIZE analogue, app/config.py:16)."""
    return _int("OCR_ENGINE_BATCH_SIZE", 1024)


def pool_fraction_num() -> tuple[int, int]:
    """Actor-pool width as a fraction of cluster CPUs
    (OCR_ENGINE_POOL_NUM / _DEN, default 3/4 — reference MAX_WORKERS
    analogue, app/config.py:27)."""
    return (_int("OCR_ENGINE_POOL_NUM", 3), _int("OCR_ENGINE_POOL_DEN", 4))


def as_of_date() -> date:
    """Pinned 'today' for date validation/windowing
    (OCR_ENGINE_AS_OF=YYYY-MM-DD; replaces the reference's
    ``date.today()`` reads for reproducibility)."""
    raw = os.environ.get("OCR_ENGINE_AS_OF", "")
    if raw:
        try:
            y, m, d = raw.split("-")
            return date(int(y), int(m), int(d))
        except (ValueError, AttributeError):
            pass
    from .core.extract import DEFAULT_AS_OF

    return DEFAULT_AS_OF


def template_dir() -> str | None:
    """Directory of JSON vendor rule packs for the template field
    backend (OCR_ENGINE_TEMPLATES_DIR — the working analogue of the
    reference's dormant INVOICE2DATA_TEMPLATES_DIR, app/config.py:38).
    Unset → the built-in packs (core/templates.DEFAULT_TEMPLATES)."""
    return os.environ.get("OCR_ENGINE_TEMPLATES_DIR") or None


def max_block_mb() -> int:
    """Wide-row block cap in MiB (OCR_ENGINE_MAX_BLOCK_MB, default 64;
    see stages/partition.py:configure_for_wide_rows)."""
    return _int("OCR_ENGINE_MAX_BLOCK_MB", 64)

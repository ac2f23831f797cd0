"""Single-process reference oracle (SURVEY §5.2).

Runs the same pure core over a ``pyarrow.Table`` in one process with an
explicit deterministic order, producing the exact schema the Ray
pipeline produces.  Tests compare the Ray pipeline's output to this
oracle per ``(conv_id, turn_idx)`` — byte equality of
``extracted_text`` / ``spans`` / all fields is the north-rule invariant.
The Ray layer (ordering, partitioning, batching, actor pools) is what is
actually under test; the semantics are shared by construction.
"""

from __future__ import annotations

from datetime import date

import pyarrow as pa

from .core.extract import DEFAULT_AS_OF
from .stages.extract import extract_batch


def oracle_extract(table: pa.Table, as_of: date = DEFAULT_AS_OF,
                   validated: bool = True) -> pa.Table:
    """Extract (and validate) every turn, single-process, output sorted
    by (conv_id, turn_idx)."""
    table = table.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    return extract_batch(table, as_of, validate=validated)


def oracle_conv_rollup(validated: pa.Table) -> pa.Table:
    """Per-conversation rollup (FIXTURES §F3) computed with plain Arrow
    group_by — the oracle for the distributed rollup stage."""
    import pyarrow.compute as pc

    t = validated.append_column(
        "chars", pc.utf8_length(validated.column("extracted_text")).cast(pa.int64()))
    t = t.append_column(
        "flagged", pc.cast(pc.greater(pc.list_value_length(t.column("flags")), 0), pa.int64()))
    g = t.group_by("conv_id").aggregate([
        ("turn_idx", "count"),
        ("chars", "sum"),
        ("flagged", "sum"),
        ("ts", "min"),
        ("ts", "max"),
        ("items_qty", "sum"),
        ("items_total_cents", "sum"),
    ])
    g = g.rename_columns([
        "conv_id", "n_turns", "total_chars", "n_flagged",
        "first_ts", "last_ts", "items_qty", "items_total_cents",
    ])
    return g.sort_by("conv_id")

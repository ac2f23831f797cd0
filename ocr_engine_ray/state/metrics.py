"""Prometheus-style pipeline metrics (north rule; replaces the
reference's in-process progress dict + Celery inspection,
``app/main.py:60-62,91-164``, ``app/utils/maintenance.py:62-99``).

One lightweight named actor per job collects monotonically-increasing
counters.  Stages report per *batch* (one fire-and-forget remote call
per batch, not per row), so collection cost is negligible next to the
work itself.  ``snapshot()`` renders the Prometheus text exposition
format for scraping/logging.
"""

from __future__ import annotations

import time

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    """Counter sink.  num_cpus=0: never competes with worker tasks."""

    def __init__(self) -> None:
        self.counters: dict[str, float] = {}
        self.started_at = time.time()

    def incr(self, name: str, value: float = 1.0) -> None:
        self.counters[name] = self.counters.get(name, 0.0) + value

    def incr_many(self, items: dict[str, float]) -> None:
        for name, value in items.items():
            self.counters[name] = self.counters.get(name, 0.0) + value

    def get_all(self) -> dict[str, float]:
        return dict(self.counters)


def get_or_create_metrics(name: str = "ocr_engine_metrics"):
    """Named-actor lookup so every stage in a job shares one sink."""
    try:
        return ray.get_actor(name)
    except ValueError:
        return MetricsActor.options(name=name, get_if_exists=True).remote()


def counting_stage(metrics_handle, stage: str, text_col: str | None = None):
    """Wrap a pass-through map_batches fn that reports rows (and bytes if
    ``text_col`` given) per batch.  Usage::

        ds = ds.map_batches(counting_stage(m, "extracted", "extracted_text"),
                            batch_format="pyarrow")
    """
    import pyarrow as pa

    def fn(batch: pa.Table) -> pa.Table:
        items = {f"{stage}_rows_total": float(batch.num_rows)}
        if text_col is not None and text_col in batch.column_names:
            import pyarrow.compute as pc
            items[f"{stage}_bytes_total"] = float(
                pc.sum(pc.binary_length(
                    pc.cast(batch.column(text_col), pa.binary()))).as_py() or 0)
        metrics_handle.incr_many.remote(items)
        return batch

    return fn


def render_prometheus(counters: dict[str, float]) -> str:
    lines = []
    for name in sorted(counters):
        lines.append(f"# TYPE {name} counter")
        lines.append(f"{name} {counters[name]}")
    return "\n".join(lines) + "\n"

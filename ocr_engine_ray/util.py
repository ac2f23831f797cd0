"""Small shared helpers for stage sizing."""

from __future__ import annotations

import ray


def default_pool_size(cap: int | None = None) -> int:
    """Actor-pool width that always leaves CPU headroom for the read /
    consume stages: 3/4 of the cluster CPUs, never the full width.  A
    pool that reserves every CPU stalls Ray Data's streaming executor
    (measured: a 2-CPU session with a 2-actor pool makes no progress)."""
    from .config import pool_fraction_num

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    num, den = pool_fraction_num()
    size = max(1, min(cpus - 2, (cpus * num) // max(1, den)))
    if cap is not None:
        size = max(1, min(size, cap))
    return size

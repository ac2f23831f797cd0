"""Benchmark harness (driver-run per round; BENCH_r{N}.json).

Runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) and prints ONE JSON line::

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "turns_per_sec": ...}

``--scaling`` runs the flagship pipeline in two fresh processes at
num_cpus=8 and num_cpus=32 on identical input and reports both
throughputs + scaling efficiency (the sandbox evidence for the north
rule's N vs 4N cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _run_benchmarks(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from ocr_engine_ray.pipelines import queries as q
    from ocr_engine_ray.pipelines.flagship import conv_rollup, flagship

    # untimed: materialize the synthetic corpus (cached across runs) and
    # warm the page cache so we measure compute+shuffle, not cold disk
    paths = q.transcript_paths(sf_dir)
    n_turns = 0
    for p in paths:
        with open(p, "rb") as f:
            while f.read(1 << 22):
                pass
    import pyarrow.parquet as pq

    n_turns = sum(pq.ParquetFile(p).metadata.num_rows for p in paths)

    # untimed warmup: spin up Ray worker processes / Ray Data executor once
    # on a single shard so timings measure steady-state compute, not
    # first-execution infrastructure startup
    flagship(paths[:1]).count()

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        return out

    # headline: flagship extraction (read → extract actor pool → validate)
    n_extracted = timed("flagship_extract", lambda: flagship(paths).count())
    timed("conv_rollup", lambda: conv_rollup(flagship(paths)).count())
    timed("events_conv_rollup", lambda: q.q_events_conv_rollup(sf_dir).count())
    timed("lineitem_pricing_summary",
          lambda: q.q_lineitem_pricing_summary(sf_dir).count())
    timed("documents_token_stats",
          lambda: q.q_documents_token_stats(sf_dir).count())
    timed("documents_dedup_exact",
          lambda: q.q_documents_dedup_exact(sf_dir).count())

    ray.shutdown()
    headline = timings["flagship_extract"]
    return {
        "metric": "flagship extraction wall time (turns→validated records)",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "num_cpus": num_cpus,
        "n_turns": n_turns,
        "n_extracted": n_extracted,
        "turns_per_sec": round(n_turns / headline, 1) if headline else None,
    }


def _scaling(sf_dir: str) -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir)
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    tp_lo, tp_hi = lo["turns_per_sec"], hi["turns_per_sec"]
    eff = (tp_hi / tp_lo) / (32 / 8)
    return {
        "metric": "scaling efficiency flagship 8→32 cpus (1.0 = linear)",
        "sec_8": lo["value"], "sec_32": hi["value"],
        "turns_per_sec_8": tp_lo, "turns_per_sec_32": tp_hi,
        "scaling_efficiency": round(eff, 3),
        "sf": lo["sf"], "n_turns": lo["n_turns"],
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        print(json.dumps(_scaling(sf_dir)))
        return
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32") or "32")
    print(json.dumps(_run_benchmarks(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()

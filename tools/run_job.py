"""Cluster job entry point — the ``ray job submit`` script (SURVEY §3
"Rebuild": the whole of the reference's E1–E3 entry points as one
submitted Dataset job).

Usage (on a cluster)::

    ray job submit --working-dir . -- \
        python tools/run_job.py --input 'shards/*.parquet' --out /data/out

Locally (owns its Ray session, unlike __ray_entry__)::

    python tools/run_job.py --input '/tmp/ocr_engine_ray_synth/sf0.001/*' \
        --out /tmp/ocr_out

The job is resumable: re-submitting with the same --out skips
partitions already committed in the manifest (state/lineage.py), and
Prometheus-style counters are printed at the end.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="glob of transcript parquet shards")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--concurrency", type=int, default=None)
    args = ap.parse_args()

    shards = sorted(glob.glob(args.input))
    if not shards:
        print(f"no input shards match {args.input}", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from ocr_engine_ray.pipelines.flagship import flagship
    from ocr_engine_ray.state.lineage import run_resumable
    from ocr_engine_ray.state.metrics import (
        counting_stage, get_or_create_metrics, render_prometheus)

    metrics = get_or_create_metrics()

    def make_ds(shard: str):
        kw = {}
        if args.batch_size:
            kw["batch_size"] = args.batch_size
        if args.concurrency:
            kw["concurrency"] = args.concurrency
        ds = flagship([shard], **kw)
        return ds.map_batches(
            counting_stage(metrics, "extracted", "extracted_text"),
            batch_format="pyarrow")

    records = run_resumable(shards, args.out, make_ds, metrics=metrics)
    skipped = len(shards) - len(records)
    print(f"committed {len(records)} partitions "
          f"({skipped} already done, resumed)")
    print(render_prometheus(ray.get(metrics.get_all.remote())))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

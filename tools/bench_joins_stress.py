"""Join-family stress bench: run the session-5 warehouse join shapes
at ~8× sf0.1 (≈4.8M lineitems / 1.2M orders) to evidence their scale
behavior beyond the driver's bench size.

The corpus is a deterministic pure function of sf0.1: orders and
lineitem are replicated K times with order-key offsets (customer,
supplier, nation, part ride unchanged — they are the dim sides), so
every replica adds disjoint orders for the SAME customers/parts.
That grows exactly the axes the joins shuffle on (fact rows, orders
per customer, lineitems per part) while keeping every threshold
binding: the Q18 per-order quantity sums are unchanged per replica
(the survivor count scales ×K), the Q11 per-part revenue grows ×K in
numerator and total alike (same survivors), and above-own-average
per-customer order sets grow ×K.

Usage: python tools/bench_joins_stress.py [K] [sf_dir]
Writes the replicated corpus under /tmp (cached by (K, sf)) and prints
one JSON line with per-query walls and row rates.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq


def materialize(sf_dir: str, k: int) -> str:
    out = f"/tmp/ocr_engine_ray_joins_stress_k{k}_" \
          f"{os.path.basename(sf_dir.rstrip('/'))}"
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    # dim tables ride unchanged
    for t in ("customer", "supplier", "nation", "region", "part"):
        src = os.path.join(sf_dir, f"{t}.parquet")
        pq.write_table(pq.read_table(src), os.path.join(out, f"{t}.parquet"))
    orders = pq.read_table(os.path.join(sf_dir, "orders.parquet"))
    li = pq.read_table(os.path.join(sf_dir, "lineitem.parquet"))
    maxk = 1 + max(orders.column("o_orderkey").to_pylist())
    o_parts, l_parts = [], []
    import pyarrow.compute as pc
    for i in range(k):
        off = pa.scalar(i * maxk, pa.int64())
        o_parts.append(orders.set_column(
            orders.schema.get_field_index("o_orderkey"), "o_orderkey",
            pc.add(orders.column("o_orderkey"), off)))
        l_parts.append(li.set_column(
            li.schema.get_field_index("l_orderkey"), "l_orderkey",
            pc.add(li.column("l_orderkey"), off)))
    # shard the fact tables so the read parallelizes like production
    for name, parts in (("orders", o_parts), ("lineitem", l_parts)):
        d = os.path.join(out, f"{name}.parquet")
        os.makedirs(d, exist_ok=True)
        for i, t in enumerate(parts):
            pq.write_table(t, os.path.join(d, f"part-{i:03d}.parquet"))
    open(marker, "w").write("ok")
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    corpus = materialize(sf_dir, k)
    import ocr_engine_ray.pipelines.queries as q

    n_li = sum(pq.read_metadata(os.path.join(corpus, "lineitem.parquet", f))
               .num_rows
               for f in os.listdir(os.path.join(corpus, "lineitem.parquet")))
    results: dict = {"k": k, "sf_dir": sf_dir, "n_lineitem": n_li,
                     "queries": {}}
    for name, fn in (
            ("orders_above_cust_avg", q.q_orders_above_cust_avg),
            ("volume_shipping", q.q_volume_shipping),
            ("orders_large_quantity", q.q_orders_large_quantity),
            ("orders_priority_returns", q.q_orders_priority_returns),
            ("part_revenue_share", q.q_part_revenue_share)):
        t0 = time.perf_counter()
        n = fn(corpus).count()
        wall = round(time.perf_counter() - t0, 2)
        results["queries"][name] = {"wall_s": wall, "rows": n,
                                    "li_rows_per_s": round(n_li / wall)}
        print(f"  {name}: {wall} s, {n} rows", file=sys.stderr)
    ray.shutdown()
    print(json.dumps(results))


if __name__ == "__main__":
    main()

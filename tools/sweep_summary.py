"""Condense one or more check_contract sweep logs into the committed
round artifact (CONTRACT_SWEEP_r{N}.json): per-query status at each
scale plus the tallies the judge reads.

Usage: python tools/sweep_summary.py out.json sf_label=logfile ...
e.g.   python tools/sweep_summary.py CONTRACT_SWEEP_r4.json \\
           sf0.01=/tmp/contract_sf001.log sf0.1=/tmp/contract_sf01.log
"""

from __future__ import annotations

import json
import re
import sys

OK_SQL = re.compile(r"^ok\s+(\S+): (\d+) rows match oracle \(bit-exact\)")
OK_ROWS = re.compile(r"^ok\s+(\S+): rows-only, (\d+) rows")
BAD = re.compile(r"^(FAIL|MISMATCH)\s+([^\s:]+):?")


def parse(path: str) -> dict:
    out: dict = {}
    for line in open(path, errors="replace"):
        m = OK_SQL.match(line)
        if m:
            out[m.group(1)] = {"status": "bit-exact",
                               "rows": int(m.group(2))}
            continue
        m = OK_ROWS.match(line)
        if m:
            out[m.group(1)] = {"status": "rows-only",
                               "rows": int(m.group(2))}
            continue
        m = BAD.match(line)
        if m:
            out[m.group(2)] = {"status": m.group(1).lower()}
    return out


def main() -> int:
    out_path = sys.argv[1]
    scales = {}
    for arg in sys.argv[2:]:
        label, path = arg.split("=", 1)
        per = parse(path)
        n_sql = sum(1 for v in per.values() if v["status"] == "bit-exact")
        n_rows = sum(1 for v in per.values() if v["status"] == "rows-only")
        n_bad = len(per) - n_sql - n_rows
        scales[label] = {"total": len(per), "bit_exact": n_sql,
                         "rows_only": n_rows, "failures": n_bad,
                         "queries": per}
    with open(out_path, "w") as f:
        json.dump(scales, f, indent=1, sort_keys=True)
        f.write("\n")
    for label, s in scales.items():
        print(f"{label}: {s['total']} queries, {s['bit_exact']} bit-exact, "
              f"{s['rows_only']} rows-only, {s['failures']} failures")
    return 0


if __name__ == "__main__":
    sys.exit(main())

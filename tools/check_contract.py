"""Local stand-in for the driver's correctness gate: run each
__ray_entry__.queries() callable and its oracle_sql() DuckDB twin at a
given sf, compare row count + (order-insensitive) values.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
import pyarrow as pa


def to_pandas(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        rows = res.take_all()
        if rows:
            res = pa.Table.from_pylist(rows)
        else:
            # preserve the schema on empty results (from_pylist([])
            # would yield a zero-column table and a bogus mismatch)
            res = res.schema().base_schema.empty_table()
    if isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-equivalent canonicalization: sort columns by name, sort rows,
    widen ints to int64 / timestamps to us — but do NOT round floats.  The
    driver hashes values bit-exact, so local green must mean driver green
    (round-1 shipped 3 red rows because this function used to round(6))."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def kind(dtype) -> str:
    """Dtype class for cross-checking: the driver's value hash distinguishes
    int64(3) from float64(3.0) (round-1 events_sessionize failure), so we
    must too."""
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    return "object"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # keep the synthetic-corpus oracles aligned with the sf under test
    os.environ["GRAFT_ORACLE_SF_DIR"] = sf_dir

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs, sqls = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in sqls:
            print(f"ok   {name}: rows-only, {len(got)} rows, cols={list(got.columns)}")
            continue
        want = canon(con.sql(sqls[name]).df())
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        kinds_got = [kind(got[c].dtype) for c in got.columns]
        kinds_want = [kind(want[c].dtype) for c in want.columns]
        if kinds_got != kinds_want:
            print(f"FAIL {name}: dtype kinds {kinds_got} != {kinds_want}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"ok   {name}: {len(got)} rows match oracle (bit-exact)")
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:500]}")
            failures += 1
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

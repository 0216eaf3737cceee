"""Local emulation of the driver's correctness gate: run every
``queries()`` entry at a given sf_dir, run the matching ``oracle_sql()``
in DuckDB, compare row count, schema (sorted column names) and values
(rows sorted by all columns; ints/strings exact, floats exact after the
per-side rounding both sides already apply).

Usage: PYTHONPATH=/root/repo python tools/check_harness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

# reap idle Ray workers fast — their poll loops starve driver-side numpy
# on this box (BENCH/BASELINE.md)
os.environ.setdefault("RAY_idle_worker_killing_time_threshold_ms", "2000")
os.environ.setdefault("RAY_num_workers_soft_limit", "8")

import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype(str)
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")

    import duckdb

    import __ray_entry__ as harness

    con = duckdb.connect()
    # Bound the in-process oracle: at sf0.1 the heaviest CTE replays
    # (hdbscan excess-of-mass) exceed the box when DuckDB grows
    # unbounded next to Ray's object store — the 2026-08-22 full-sweep
    # attempt was OOM-killed (exit 137) on hdbscan_embeddings. Cap and
    # spill to disk instead; the driver's own sf0.01 gate is unaffected.
    con.sql("SET memory_limit='24GB'")
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    # fail fast instead of filling the disk: the mst_forest closure-
    # doubling oracle spilled 79 GB at sf0.1 before ENOSPC took down the
    # whole sweep. Pair-closure oracles (mst, wcc, hdbscan) are replayed
    # on documented bounded instances at sf0.1 instead (BENCH/BASELINE.md
    # round-5).
    con.sql("SET max_temp_directory_size='30GB'")
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = harness.queries()
    oracles = harness.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows in {dt:.1f}s cols={list(got.columns)}")
            continue
        try:
            want = normalize(con.sql(oracles[name]).df())
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: ORACLE raised {type(e).__name__}: {e}")
            continue
        ok_rows = len(got) == len(want)
        ok_schema = list(got.columns) == list(want.columns)
        ok_vals = ok_rows and ok_schema and got.equals(want)
        status = "OK  " if (ok_rows and ok_schema and ok_vals) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{status} {name}: rows {len(got)}/{len(want)} schema={ok_schema} "
            f"values={ok_vals} ({dt:.1f}s)"
        )
        if not ok_vals and ok_rows and ok_schema:
            neq = (got != want).any(axis=1)
            print("  first diffs:\n", got[neq].head(3), "\n  vs\n", want[neq].head(3))
        elif not ok_schema:
            print(f"  got cols {list(got.columns)} want {list(want.columns)}")
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

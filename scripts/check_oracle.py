"""Local replica of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` side-by-side via DuckDB,
compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb
import numpy as np
import pandas as pd

import ray


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"schema: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"rows: ray={len(ray_df)} sql={len(sql_df)}")
        return problems
    a, b = canon(ray_df), canon(sql_df)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = np.array_equal(av.astype(np.float64), bv.astype(np.float64))
            if not ok:
                close = np.allclose(av.astype(np.float64), bv.astype(np.float64), rtol=1e-12, equal_nan=True)
                problems.append(
                    f"col {col}: float mismatch (allclose={close}); "
                    f"first diff: {_first_diff(av, bv)}"
                )
        else:
            if not np.array_equal(av.astype(str), bv.astype(str)):
                problems.append(f"col {col}: value mismatch; first diff: {_first_diff(av, bv)}")
    return problems


def _first_diff(a, b):
    for i, (x, y) in enumerate(zip(a, b)):
        if str(x) != str(y):
            return f"[{i}] ray={x!r} sql={y!r}"
    return "?"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_ok = n_bad = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_df(fn(sf_dir))
        except Exception as e:
            print(f"FAIL  {name}: query raised {e!r}", flush=True)
            n_bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(ray_df)} rows ({dt:.1f}s) [rows-only check]", flush=True)
            n_rows_only += 1
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL raised {e!r}", flush=True)
            n_bad += 1
            continue
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s):")
            for p in problems:
                print(f"      {p}")
            n_bad += 1
        else:
            print(f"OK    {name}: {len(ray_df)} rows ({dt:.1f}s)", flush=True)
            n_ok += 1
        # release this query's frames + any lingering Dataset refs
        # before the next one: a single Ray session across 110 queries
        # otherwise accumulates driver/object-store memory (observed: a
        # full-gate run hard-killed mid-query under host memory
        # pressure, each query green in isolation)
        import gc

        del ray_df, sql_df
        gc.collect()
    print(f"\n{n_ok} ok, {n_rows_only} rows-only, {n_bad} FAILED")
    ray.shutdown()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

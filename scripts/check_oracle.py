"""Local harness mimicking the driver's correctness gate: run each queries()
entry and its oracle_sql() twin on the same sf dir, compare row count, column
names, and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import ray


def to_df(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> bool:
    if len(ray_df) != len(sql_df):
        print(f"[{name}] ROWCOUNT mismatch: ray={len(ray_df)} sql={len(sql_df)}")
        return False
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        print(f"[{name}] SCHEMA mismatch: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return False
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            both_nan = np.isnan(av) & np.isnan(bv)
            eq = (av == bv) | both_nan
        else:
            eq = av == bv
        if not np.all(eq):
            bad = np.nonzero(~eq)[0][:5]
            print(f"[{name}] VALUE mismatch in column {c}: rows {bad.tolist()}")
            for i in bad:
                print(f"   ray={a[c].iloc[i]!r} sql={b[c].iloc[i]!r}")
            return False
    print(f"[{name}] OK ({len(ray_df)} rows, {len(ray_df.columns)} cols)")
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_ok = n_bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_df(fn(sf_dir))
        except Exception as e:
            print(f"[{name}] RAY ERROR: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"[{name}] no oracle (rows-only): {len(ray_df)} rows")
            n_ok += 1
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[{name}] SQL ERROR: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        ok = compare(name, ray_df, sql_df)
        n_ok += ok
        n_bad += not ok
    print(f"\n{n_ok} ok, {n_bad} bad")
    ray.shutdown()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())

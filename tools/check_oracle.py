#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs Verify output parquet.

Mimics the driver's DuckDB compare: registers the sf tables as views,
runs each oracle SQL, sorts columns by name, sorts rows, and compares
values against the Spark-written parquet. Dev tool only (driver-side
python env) — not part of the library.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.001 /tmp/verify_out
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            # exact compare — the driver hashes exact values, so any
            # tolerance here would let local green hide a driver red
            bad = ~(
                (av.isna() & bv.isna())
                | (av.astype(float) == bv.astype(float))
            )
        else:
            try:
                bad = ~((av.isna() & bv.isna()) | (av.astype(str) == bv.astype(str)))
            except Exception as e:  # noqa
                return f"COMPARE ERROR col={c}: {e}"
        if bad.any():
            i = bad.idxmax()
            return (f"VALUE MISMATCH col={c} row={i} "
                    f"spark={a[c][i]!r} duck={b[c][i]!r}")
    return "OK"


def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = 0
    results = {}
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            results[name] = "NO SPARK OUTPUT"
            continue
        try:
            spark_df = pd.concat(
                [pd.read_parquet(os.path.join(spark_path, f))
                 for f in os.listdir(spark_path) if f.endswith(".parquet")],
                ignore_index=True)
        except ValueError:
            results[name] = "EMPTY SPARK OUTPUT DIR"
            continue
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            results[name] = f"DUCKDB ERROR: {e}"
            continue
        # tz-aware vs naive: compare timestamps as int64 ns
        for c in spark_df.columns:
            if str(spark_df[c].dtype).startswith("datetime64[ns,"):
                spark_df[c] = spark_df[c].dt.tz_localize(None)
        results[name] = compare(name, spark_df, duck_df)
        if results[name] == "OK":
            n_ok += 1
    width = max(len(k) for k in results)
    for name, r in sorted(results.items()):
        print(f"{name:<{width}}  {r}")
    print(f"\n{n_ok}/{len(results)} oracle-checked queries OK")
    # rows-only queries
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                df = pd.concat(
                    [pd.read_parquet(os.path.join(p, f))
                     for f in os.listdir(p) if f.endswith(".parquet")],
                    ignore_index=True)
                norm(df)  # driver sorts rows-only outputs too: must be hashable
                print(f"[rows-only] {name}: {len(df)} rows")
            except Exception as e:  # noqa
                print(f"[rows-only] {name}: ERROR {e}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs Verify output parquet.

Mimics the driver's DuckDB compare: registers the sf tables as views,
runs each oracle SQL, sorts columns by name, sorts rows, and compares
values against the Spark-written parquet. Dev tool only (driver-side
python env) — not part of the library.

STRICTNESS CONTRACT (round-5 hardening): the driver hashes the pandas
frames dtype-SENSITIVELY, so a Spark int64 column meeting an oracle
float64 column hash-mismatches even when every value is equal, and a
non-hashable cell (numpy.ndarray from an array<...> column) crashes the
driver's sorter outright. Round 4 lost 7 rows to exactly these two
classes while this script stayed green, because it coerced types before
comparing. It now (a) compares dtypes column-for-column after the one
normalization the driver also applies (timestamps → int64 ns), and
(b) rejects object columns holding anything but str/bytes/None — in
oracle-checked AND rows-only outputs. The local gate must be at least
as strict as the thing it mimics.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.001 /tmp/verify_out
"""
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def bad_object_value(v) -> bool:
    """True when a cell would crash the driver's sorter/hasher.

    The driver tolerates hashable objects (str, Decimal, date — r04 rows
    with those passed); ndarray/list/dict cells crash its factorize step.
    """
    try:
        hash(v)
        return False
    except TypeError:
        return True


def dtype_group(dt) -> str:
    """The driver's effective dtype sensitivity: integer WIDTH doesn't
    matter (int32 vs int64 hashed r04 rows green) but KIND does (int64 vs
    float64 hashed red on equal values)."""
    k = dt.kind
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "O":
        return "object"
    return str(dt)


def vet_objects(df: pd.DataFrame):
    """Error message when an object column holds unhashable cells."""
    for c in df.columns:
        if df[c].dtype == object:
            bad = df[c].map(bad_object_value)
            if bad.any():
                v = df[c][bad.idxmax()]
                return (f"NON-HASHABLE OBJECT col={c} "
                        f"type={type(v).__name__} value={v!r}")
    return None


def cell_str(v) -> str:
    """The stringification the driver's hash is equivalent to."""
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "<NULL>"
    return str(v)


def norm_pair(sa: pd.Series, sb: pd.Series):
    """Normalize one spark/duck column pair to comparable series, or an
    error when the dtype pairing is the class the driver hashes red."""
    ga, gb = dtype_group(sa.dtype), dtype_group(sb.dtype)
    # tz and unit first
    def detz(s):
        if str(s.dtype).startswith("datetime64[ns,"):
            return s.dt.tz_localize(None)
        return s
    sa, sb = detz(sa), detz(sb)
    if ga.startswith("datetime") and gb.startswith("datetime"):
        to_ns = lambda s: pd.Series(  # noqa: E731
            s.to_numpy(dtype="datetime64[ns]").astype("int64"), index=s.index)
        return to_ns(sa), to_ns(sb), None
    if {ga, gb} == {"int", "float"}:
        # the PROVEN driver-red class (r04: 5 rows, values equal): int64
        # "10" hashes differently from float64 "10.0"
        return sa, sb, f"spark={sa.dtype} duck={sb.dtype}"
    if "object" in (ga, gb):
        # object meets anything: the driver stringifies — Decimal('100.0')
        # vs float64 100.0 was GREEN in r04, huge Decimal vs float64
        # sci-notation RED; emulate by exact string compare
        def strify(s):
            if str(s.dtype).startswith("datetime64"):
                # duck DATE comes back datetime64 midnight vs spark date
                # objects: compare on the date part the driver saw
                vals = s.dt.strftime("%Y-%m-%d %H:%M:%S").str.replace(
                    " 00:00:00", "", regex=False)
                return vals.where(~s.isna(), "<NULL>")
            return s.map(cell_str)
        return strify(sa), strify(sb), None
    if ga != gb:
        return sa, sb, f"spark={sa.dtype} duck={sb.dtype}"
    return sa, sb, None


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> str:
    a = spark_df.reindex(sorted(spark_df.columns), axis=1).copy()
    b = duck_df.reindex(sorted(duck_df.columns), axis=1).copy()
    ea, eb = vet_objects(a), vet_objects(b)
    if ea:
        return f"SPARK {ea}"
    if eb:
        return f"ORACLE {eb}"
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
    # normalize column pairs; dtype strictness BEFORE any value coercion —
    # this is the check the driver's hash effectively performs and round 4
    # proved we must mirror (int64-vs-float64 equal VALUES still hash red)
    for c in a.columns:
        na, nb, err = norm_pair(a[c], b[c])
        if err:
            return f"DTYPE MISMATCH col={c} {err}"
        a[c], b[c] = na, nb
    # object columns may still hold mixed hashables (Decimal, date) that
    # don't sort against each other — stringify for a total sort order,
    # identically on both sides so row alignment is preserved
    for c in a.columns:
        if a[c].dtype == object:
            a[c] = a[c].map(cell_str)
        if b[c].dtype == object:
            b[c] = b[c].map(cell_str)
    a = a.sort_values(by=list(a.columns), ignore_index=True)
    b = b.sort_values(by=list(b.columns), ignore_index=True)
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
        results[name] = compare(name, spark_df, duck_df)
        if results[name] == "OK":
            n_ok += 1
    width = max(len(k) for k in results)
    for name, r in sorted(results.items()):
        print(f"{name:<{width}}  {r}")
    print(f"\n{n_ok}/{len(results)} oracle-checked queries OK")
    # rows-only queries: must survive the same prepare + sort the driver runs
    n_bad_rows_only = 0
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name not in oracle:
            try:
                df = pd.concat(
                    [pd.read_parquet(os.path.join(p, f))
                     for f in os.listdir(p) if f.endswith(".parquet")],
                    ignore_index=True)
                err = vet_objects(df)
                if err:
                    n_bad_rows_only += 1
                    print(f"[rows-only] {name}: {err}")
                    continue
                df = df.reindex(sorted(df.columns), axis=1)
                for c in df.columns:
                    if df[c].dtype == object:
                        df[c] = df[c].map(cell_str)
                df.sort_values(by=list(df.columns), ignore_index=True)
                print(f"[rows-only] {name}: {len(df)} rows")
            except Exception as e:  # noqa
                n_bad_rows_only += 1
                print(f"[rows-only] {name}: ERROR {e}")
    if n_bad_rows_only:
        print(f"\n{n_bad_rows_only} rows-only outputs would CRASH the driver")
    sys.exit(0 if n_ok == len(results) and not n_bad_rows_only else 1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

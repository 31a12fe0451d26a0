#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ (Spark parquet result) and
<verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB with views
over <sfDir>/*.parquet, and compares: schema (column names), row count, and
values (columns sorted by name; compared both order-sensitively and
order-insensitively after a canonical row sort).
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df


def val_kind(v):
    """Canonical type kind of one non-null cell value (type-strict gate:
    the driver hashes values WITH their types, so int64 3549 vs float64
    3549.0 — e.g. an uncast DuckDB HUGEINT sum() — must FAIL here too)."""
    import decimal
    import numpy as np
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
        return "list"
    if isinstance(v, (pd.Timestamp,)) or str(type(v)).find("datetime") >= 0:
        return "datetime"
    return type(v).__name__


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(cell_eq(x, y) for x, y in zip(la, lb))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if val_kind(a) != val_kind(b):
        return False
    return a == b


def col_kinds(s) -> set:
    """Set of canonical kinds over a column's non-null values."""
    kinds = set()
    for v in s.tolist():
        try:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                continue
            if not isinstance(v, (list, tuple)) and \
                    str(type(v)).find("ndarray") < 0 and pd.isna(v):
                continue
        except (TypeError, ValueError):
            pass
        kinds.add(val_kind(v))
    return kinds


def frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} != {len(b)}"
    for c in a.columns:
        ka, kb = col_kinds(a[c]), col_kinds(b[c])
        if ka != kb:
            return False, (f"type-strict: col={c} kinds {sorted(ka)} != "
                           f"{sorted(kb)} (spark vs oracle surface type)")
    for ci, c in enumerate(a.columns):
        av, bv = a[c].tolist(), b[c].tolist()
        for i in range(len(av)):
            if not cell_eq(av[i], bv[i]):
                return False, (f"first diff col={c} row={i}: "
                               f"{av[i]!r} != {bv[i]!r}")
    return True, ""


def sort_rows(df: pd.DataFrame) -> pd.DataFrame:
    key = df.apply(lambda r: json.dumps(
        [None if (isinstance(v, float) and math.isnan(v)) else
         (list(v) if not isinstance(v, (str, int, float, bool, type(None)))
          else v)
         for v in r], default=str), axis=1)
    return df.iloc[key.argsort(kind="stable")].reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # every declared query must have produced an output dir — a query that
    # threw inside Verify must FAIL here, not vanish from the gate
    manifest = f"{out_dir}/queries.json"
    if os.path.exists(manifest):
        with open(manifest) as f:
            declared = json.load(f)
        for name in declared:
            if name not in names:
                results[name] = "NO_OUTPUT"
        names = [n for n in names if n in declared] + \
            [n for n in names if n not in declared]
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)],
                                   ignore_index=True))
        if name not in oracles:
            results[name] = f"ROWS_ONLY ({len(spark_df)} rows)"
            continue
        try:
            duck_df = canon(con.execute(oracles[name]).fetchdf())
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        ok, why = frames_equal(spark_df, duck_df)
        if ok:
            results[name] = "MATCH (ordered)"
            continue
        ok2, why2 = frames_equal(sort_rows(spark_df), sort_rows(duck_df))
        if ok2:
            results[name] = f"MATCH (unordered only) — ordered diff: {why}"
        else:
            results[name] = f"MISMATCH: {why2}"

    width = max(len(n) for n in results) if results else 0
    n_bad = 0
    for name in sorted(results):
        r = results[name]
        bad = r.startswith(("MISMATCH", "ORACLE_SQL_ERROR", "NO_OUTPUT"))
        n_bad += bad
        print(f"{'FAIL' if bad else 'ok  '}  {name:<{width}}  {r}")
    print(f"\n{len(results) - n_bad}/{len(results)} pass")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

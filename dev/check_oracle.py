#!/usr/bin/env python3
"""Dev-side mirror of the driver's correctness gate.

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir> [query ...]
Runs each oracle_sql.json query in DuckDB over the parquet tables in sfDir,
loads the Spark result parquet from verifyOutDir/<name>, sorts columns by
name and rows by all columns, and compares values.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str, only=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            expected = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        actual = canon(pd.concat([pd.read_parquet(f) for f in spark_files]))
        if list(expected.columns) != list(actual.columns):
            print(f"FAIL {name}: columns {list(actual.columns)} vs oracle {list(expected.columns)}")
            n_fail += 1
            continue
        if len(expected) != len(actual):
            print(f"FAIL {name}: rows {len(actual)} vs oracle {len(expected)}")
            n_fail += 1
            continue
        # EXACT value compare — mirrors the driver's hash-match (floats must
        # be bit-identical; queries are designed to guarantee that)
        ok = True
        for c in expected.columns:
            e, a = expected[c], actual[c]
            if not e.astype(str).equals(a.astype(str)):
                ok = False
            if not ok:
                import numpy as np
                bad = (e.astype(str) != a.astype(str))
                print(f"FAIL {name}: column {c} differs in {bad.sum()} rows; "
                      f"first: oracle={e[bad].iloc[0]!r} spark={a[bad].iloc[0]!r}")
                n_fail += 1
                break
        if ok:
            print(f"PASS {name}: {len(actual)} rows")
    return n_fail


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:]) or None))

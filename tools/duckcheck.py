#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/duckcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over views named after the testdata
tables, and compares: schema (column names sorted), row count, and values
(rows sorted, floats compared at FULL precision — the driver's gate hashes
exact values, so a 1-ulp diff that 9dp rounding would hide must fail here
too; queries are expected to round() on both sides where engines can
legitimately differ).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.sql(sql).df()
            g, e = canon(got), canon(exp)
            if list(g.columns) != list(e.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
                n_fail += 1
                continue
            if len(g) != len(e):
                print(f"FAIL {name}: rows {len(g)} != {len(e)}")
                n_fail += 1
                continue
            mismatched = []
            for c in g.columns:
                a, b = g[c], e[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    ok = (a.astype(float).fillna(-9e99)
                          == b.astype(float).fillna(-9e99)).all()
                else:
                    ok = (a.astype(str) == b.astype(str)).all()
                if not ok:
                    mismatched.append(c)
            if mismatched:
                print(f"FAIL {name}: value mismatch in {mismatched}")
                for c in mismatched[:2]:
                    diff = g[c].astype(str) != e[c].astype(str)
                    idx = diff[diff].index[:3]
                    for i in idx:
                        print(f"   row {i}: spark={g[c][i]!r} duckdb={e[c][i]!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR {name}: {ex}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

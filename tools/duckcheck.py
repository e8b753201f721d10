#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/duckcheck.py <sfDir> <verifyOutDir> [--lenient]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
oracle SQL from oracle_sql.json in DuckDB over views named after the testdata
tables, and compares: schema (column names sorted), row count, and values.

STRICT BY DEFAULT (matches the driver's exact string-hash): the driver's
harness hashes the pandas rendering of every value, and DuckDB's pandas
bridge floats DECIMAL and HUGEINT (any integer sum, incl. window sums)
columns — so Spark int64 "1" vs oracle float64 "1.0", or Spark decimal
"3591.70" vs float64 "3591.7", are hash mismatches even though the values
are numerically identical. The r5 regression (q71/q87/q89) shipped because
the old float-coerced compare here reported PASS while the driver failed.
Strict mode therefore:
  1. fails any column whose Spark-vs-oracle pandas dtype KIND differs
     (int64 vs float64, object/Decimal vs float64, ...), and
  2. compares astype(str) per column — a 1-ulp float diff fails, as it
     does under the driver's hash.
Datetime columns are normalized to microseconds on both sides first
(parquet nanos vs DuckDB micros is a storage detail, not a value diff).

--lenient restores the old numeric-tolerant compare (floats at full
precision after coercion) for debugging whether a strict fail is
representation-only or a real value diff.
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
        if df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def compare_strict(g: pd.DataFrame, e: pd.DataFrame):
    """Mirror the driver's hash: dtype-kind parity + exact string values."""
    bad = []
    for c in g.columns:
        a, b = g[c], e[c]
        if a.dtype.kind != b.dtype.kind:
            bad.append((c, f"dtype spark={a.dtype} oracle={b.dtype}"))
            continue
        if not (a.astype(str) == b.astype(str)).all():
            bad.append((c, "values"))
    return bad


def compare_lenient(g: pd.DataFrame, e: pd.DataFrame):
    bad = []
    for c in g.columns:
        a, b = g[c], e[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            ok = (a.astype(float).fillna(-9e99)
                  == b.astype(float).fillna(-9e99)).all()
        else:
            ok = (a.astype(str) == b.astype(str)).all()
        if not ok:
            bad.append((c, "values"))
    return bad


def main(sf_dir: str, out_dir: str, strict: bool = True,
         only=None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    if only:  # restricted Verify run: check just those queries, quietly
        unknown = sorted(only - set(oracle))
        if unknown:  # a typo'd name must fail loudly, not verify nothing
            print(f"ERROR unknown query name(s): {', '.join(unknown)}")
            return 1
        oracle = {k: v for k, v in oracle.items() if k in only}
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
            bad = (compare_strict if strict else compare_lenient)(g, e)
            if bad:
                print(f"FAIL {name}: mismatch in {[c for c, _ in bad]}")
                for c, why in bad[:3]:
                    if why != "values":
                        print(f"   {c}: {why}")
                        continue
                    diff = g[c].astype(str) != e[c].astype(str)
                    idx = diff[diff].index[:3]
                    for i in idx:
                        print(f"   {c} row {i}: spark={g[c][i]!r} duckdb={e[c][i]!r}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR {name}: {ex}")
            n_fail += 1
    mode = "strict" if strict else "lenient"
    print(f"\n{n_pass} passed, {n_fail} failed ({mode})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--lenient"]
    sys.exit(main(argv[0], argv[1], strict="--lenient" not in sys.argv,
                  only=set(argv[2:]) or None))

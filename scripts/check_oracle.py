#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet (Spark result) and runs the matching SQL
from <out>/oracle_sql.json in DuckDB over the sf parquet tables; compares
after sorting columns by name and rows by all columns (exact values).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), kind="mergesort",
                            na_position="first")
    return df.reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # fixtures are single files; ScaleUp rungs are Spark directories
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
            failures += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
            failures += 1
            continue
        # exact string-level compare (mirrors a value hash)
        mism = []
        for c in s.columns:
            a = s[c].map(repr).values
            b = d[c].map(repr).values
            bad = (a != b)
            if bad.any():
                i = bad.argmax()
                mism.append((c, i, a[i], b[i]))
        if mism:
            c, i, av, bv = mism[0]
            print(f"FAIL {name}: value mismatch col={c} row={i} spark={av} duck={bv} ({len(mism)} cols differ)")
            failures += 1
        else:
            print(f"PASS {name} ({len(s)} rows, {len(s.columns)} cols)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

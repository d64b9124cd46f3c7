#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables and compare against the Verify dump.
Usage: check_oracles.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"[MISS] {name}: no spark output"); fails.append(name); continue
    try:
        duck = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"[SQLERR] {name}: {e}"); fails.append(name); continue
    spark = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{spark_path}/*.parquet")])
    # driver-style compare: sort columns by name, then sort rows, compare values
    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
            elif str(df[c].dtype).startswith(("int", "uint", "Int")):
                df[c] = df[c].astype("int64")
            elif str(df[c].dtype).startswith("float"):
                df[c] = df[c].astype("float64").round(9)
            elif str(df[c].dtype) == "bool":
                df[c] = df[c].astype(bool)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    try:
        a, b = norm(spark), norm(duck)
    except Exception as e:
        print(f"[NORMERR] {name}: {e}"); fails.append(name); continue
    if list(a.columns) != list(b.columns):
        print(f"[COLS] {name}: spark={list(a.columns)} duck={list(b.columns)}")
        fails.append(name); continue
    if len(a) != len(b):
        print(f"[ROWS] {name}: spark={len(a)} duck={len(b)}")
        fails.append(name); continue
    if not a.equals(b):
        diff = (a != b).any(axis=1)
        print(f"[VALS] {name}: {diff.sum()} differing rows of {len(a)}")
        print("spark:", a[diff].head(3).to_dict("records"))
        print("duck :", b[diff].head(3).to_dict("records"))
        fails.append(name); continue
    print(f"[OK] {name}: {len(a)} rows")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} oracles match")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the matching oracle SQL in DuckDB
over the same sf tables and compare (columns sorted by name, rows sorted,
values rounded for doubles). Usage: localverify.py <sfDir> <outDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for name in sorted(oracle):
    res_dir = f"{out_dir}/{name}"
    try:
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
        duck_df = con.execute(oracle[name]).df()
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            fails += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            fails += 1
            continue
        diff_cols = []
        for c in a.columns:
            ca, cb = a[c], b[c]
            ok = ((ca.isna() & cb.isna()) | (ca == cb)).all()
            if not ok:
                diff_cols.append(c)
        if diff_cols:
            print(f"FAIL {name}: value mismatch in {diff_cols}")
            for c in diff_cols[:2]:
                m = ~(((a[c].isna()) & (b[c].isna())) | (a[c] == b[c]))
                print(a[m].head(3)); print(b[m].head(3))
            fails += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        fails += 1

missing = [d for d in sorted(os.listdir(out_dir))
           if os.path.isdir(f"{out_dir}/{d}") and d not in oracle]
for d in missing:
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out_dir}/{d}/*.parquet')"
    ).fetchone()[0]
    print(f"ROWS-ONLY {d}: {n} rows")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the matching oracle SQL in DuckDB
over the same sf tables and compare (columns sorted by name, rows sorted,
values compared EXACTLY — the driver hashes value encodings, so a
last-ulp double difference fails there too and must fail here).
Also compares the physical DuckDB column types of both sides: pandas
silently coerces e.g. HUGEINT (a bare SUM(BIGINT) in DuckDB) to the
same int64/float as Spark's BIGINT, which hid three driver hash fails
in round 1. Usage: localverify.py <sfDir> <outDir>
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
# optional 3rd arg: comma-separated query names to check (fast iteration
# on a new oracle; graft.VerifyOne writes oracle_one.json for this)
if len(sys.argv) > 3:
    only = set(sys.argv[3].split(","))
    alt = f"{out_dir}/oracle_one.json"
    if os.path.exists(alt):
        oracle.update(json.load(open(alt)))
    oracle = {k: v for k, v in oracle.items() if k in only}

def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Columns sorted by name, every value canonicalized to its repr
    string, rows sorted. repr-level compare mimics the driver's hash of
    value encodings: int32 vs int64 both repr as '5' (driver passes),
    but HUGEINT coerces to float64 and reprs as '5.0' vs '5' (driver
    fails) — exactly the round-1 q10/q35/q36 signature."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        df[c] = df[c].map(repr)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for name in sorted(oracle):
    res_dir = f"{out_dir}/{name}"
    try:
        rel_a = con.sql(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        types_a = dict(zip(rel_a.columns, map(str, rel_a.types)))
        spark_df = rel_a.df()
        rel_b = con.sql(oracle[name])
        types_b = dict(zip(rel_b.columns, map(str, rel_b.types)))
        duck_df = rel_b.df()
        type_diff = {c: (types_a.get(c), types_b.get(c))
                     for c in set(types_a) | set(types_b)
                     if types_a.get(c) != types_b.get(c)}
        if type_diff:
            # Raw-type drift is not necessarily fatal (the driver passes
            # INTEGER vs BIGINT, JSON vs VARCHAR) but is the early-warning
            # signal for HUGEINT-style value-encoding fails below.
            print(f"WARN {name}: duckdb type drift (spark, oracle): {type_diff}")
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
           if os.path.isdir(f"{out_dir}/{d}") and d not in oracle
           and (len(sys.argv) <= 3 or d in only)]
for d in missing:
    n = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{out_dir}/{d}/*.parquet')"
    ).fetchone()[0]
    print(f"ROWS-ONLY {d}: {n} rows")
sys.exit(1 if fails else 0)

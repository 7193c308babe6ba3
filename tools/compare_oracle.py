#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare: for each query dir in
the Verify output, run the oracle SQL in DuckDB over the sf parquet tables and
compare rows/schema/values (columns sorted by name, rows sorted by all
columns, floats rounded to 9 sig digits)."""
import sys, glob, json, math
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = f.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v): return "nan"
            return f"{v:.9g}"
        return str(v)
    rows = sorted(tuple(norm(v) for v in row) for row in df.itertuples(index=False))
    return rows

ok = fail = 0
for name in sorted(oracles):
    qdir = f"{out_dir}/{name}"
    try:
        mine = pd.concat([pd.read_parquet(p) for p in sorted(glob.glob(f"{qdir}/*.parquet"))])
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})"); fail += 1; continue
    try:
        oracle = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
    a, b = canon(mine), canon(oracle)
    cols_a, cols_b = sorted(mine.columns), sorted(oracle.columns)
    if cols_a != cols_b:
        print(f"FAIL {name}: columns {cols_a} vs {cols_b}"); fail += 1; continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); fail += 1; continue
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {diffs}"); fail += 1; continue
    print(f"OK   {name} ({len(a)} rows)"); ok += 1

# rows-only checks for queries without oracles
for qdir in sorted(glob.glob(f"{out_dir}/q*")):
    name = qdir.split("/")[-1]
    if name in oracles: continue
    try:
        mine = pd.concat([pd.read_parquet(p) for p in sorted(glob.glob(f"{qdir}/*.parquet"))])
        print(f"ROWS {name}: {len(mine)} rows {'OK' if len(mine) > 0 else 'EMPTY!'}")
    except Exception as e:
        print(f"ROWS {name}: unreadable ({e})")

print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)

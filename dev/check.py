#!/usr/bin/env python3
"""Dev-only mimic of the driver's t2 correctness gate.

Usage: python3 dev/check.py [sfdir] [outdir]
Reads outdir/<name> parquet (written by graft.Verify) and outdir/oracle_sql.json,
runs each oracle in DuckDB against sfdir tables, compares sorted-by-column-name
values. NOT part of the Spark library — development tooling only.
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

oracles = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)

fails = 0
for name, sql in sorted(oracles.items()):
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        # Verify writes <name>.__err.txt when the query itself threw —
        # surface the actual error instead of a bare "no output".
        try:
            err = open(f"{OUT}/{name}.__err.txt").read().strip()
            print(f"FAIL {name}: query crashed: {err}")
        except OSError:
            print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    got = norm(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
    try:
        exp = norm(con.sql(sql).df())
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}")
        fails += 1
        continue
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fails += 1
        continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        fails += 1
        continue
    mismatch = None
    for c in got.columns:
        a = [cell(v) for v in got[c]]
        b = [cell(v) for v in exp[c]]
        if a != b:
            i = next(i for i in range(len(a)) if a[i] != b[i])
            mismatch = f"col {c} row {i}: spark={a[i]} oracle={b[i]}"
            break
    if mismatch:
        print(f"FAIL {name}: {mismatch}")
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")

rowsonly = set()  # queries without oracle: just check output exists
for d in glob.glob(f"{OUT}/*/"):
    n = d.rstrip("/").split("/")[-1]
    if n not in oracles:
        rowsonly.add(n)
for n in sorted(rowsonly):
    files = glob.glob(f"{OUT}/{n}/*.parquet")
    nrows = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    print(f"{'OK  ' if nrows > 0 else 'WARN'} {n} (rows-only: {nrows})")

print(f"\n{fails} failures")
sys.exit(1 if fails else 0)

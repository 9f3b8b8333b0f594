#!/usr/bin/env python3
"""Dev-only same-workload comparator: time every registered DuckDB oracle
at a given sf dir (the only single-node engine running the identical
queries). NOT part of the Spark library — development tooling only.

Usage: python3 dev/duckdb_bench.py [sfdir] [oracle_sql.json]
(run graft.Verify first to produce oracle_sql.json)
"""
import json
import sys
import time

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLES = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"

con = duckdb.connect()
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"):
    try:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")
    except Exception:
        pass

sqls = json.load(open(ORACLES))
times = {}
for name, sql in sorted(sqls.items()):
    t0 = time.time()
    try:
        con.execute(sql).fetchall()
        times[name] = round(time.time() - t0, 3)
    except Exception as e:
        times[name] = None
        print(f"ERR  {name}: {e}", file=sys.stderr)

total = round(sum(v for v in times.values() if v is not None), 3)
print(json.dumps({"engine": "duckdb", "sf": SFDIR, "total_sec": total,
                  "n_queries": len(times), "queries": times}))

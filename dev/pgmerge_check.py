#!/usr/bin/env python3
"""Dev-only semantic check of PgMerge's transaction SQL on a real SQL engine.

No Postgres exists in this harness, so the merge epilogue
(/root/reference/src/db.rs:92-124 parity) was previously asserted via SQL
markers only. DuckDB executes the library's ACTUAL statements — obtained
from graft.dev.DumpMergeSql, never copied — after ONE documented dialect
adaptation: Postgres' `ON CONFLICT ON CONSTRAINT <name>` becomes DuckDB's
`ON CONFLICT (external_source, path, filename)` (same key set the
constraint covers; DuckDB has no named-constraint conflict target). The
conditional DO UPDATE, EXCLUDED references, IS DISTINCT FROM null-safety,
tombstone anti-join, and resurrect clause run verbatim.

Usage: python3 dev/pgmerge_check.py [merge_sql.json]
(produce the JSON with:
  sbt -batch "runMain graft.dev.DumpMergeSql" | grep '^{"table"' | tail -1)
"""
import json
import subprocess
import sys

import duckdb

if len(sys.argv) > 1:
    spec = json.load(open(sys.argv[1]))
else:
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.dev.DumpMergeSql"],
        capture_output=True, text=True, check=True).stdout
    line = [l for l in out.splitlines() if l.startswith('{"table"')][-1]
    spec = json.loads(line)

TABLE = spec["table"]
KEY = "(external_source, path, filename)"
upsert = spec["upsert"].replace(
    f"ON CONFLICT ON CONSTRAINT {spec['constraint']}", f"ON CONFLICT {KEY}")
mark_deleted = spec["mark_deleted"]

DDL = f"""
CREATE TABLE {TABLE} (
  external_source TEXT, path TEXT, filename TEXT, mime_type TEXT,
  created TIMESTAMP, modified TIMESTAMP, size BIGINT, deleted TIMESTAMP,
  UNIQUE {KEY});
CREATE TABLE scratch (
  external_source TEXT, path TEXT, filename TEXT, mime_type TEXT,
  created TIMESTAMP, modified TIMESTAMP, size BIGINT);
"""

T1, T2 = "2026-01-01 00:00:00", "2026-02-02 00:00:00"
fails = 0


def check(name, cond, detail=""):
    global fails
    if cond:
        print(f"OK   {name}")
    else:
        fails += 1
        print(f"FAIL {name} {detail}")


con = duckdb.connect()
con.execute(DDL)

# existing state: five rows of source A, one of source B
rows = [
    # unchanged row whose mime was hand-corrected after ingest (db.rs:88-90)
    ("A", "/d", "same.txt", "text/corrected", T1, T1, 10, None),
    # row whose metadata changed on disk
    ("A", "/d", "changed.txt", "text/plain", T1, T1, 10, None),
    # tombstoned row that reappears identically
    ("A", "/d", "undead.txt", "text/plain", T1, T1, 10, T1),
    # NULL-created row rescanned identically (the IS DISTINCT FROM case:
    # the reference's row-value <> would treat NULL<>NULL as unknown)
    ("A", "/d", "nullc.txt", "text/plain", None, T1, 10, None),
    # row deleted from disk -> must be tombstoned
    ("A", "/d", "gone.txt", "text/plain", T1, T1, 10, None),
    # same filename under ANOTHER source -> out of scope for A's scan
    ("B", "/d", "gone.txt", "text/plain", T1, T1, 10, None),
]
con.executemany(f"INSERT INTO {TABLE} VALUES (?,?,?,?,?,?,?,?)", rows)

# this scan of source A: same.txt unchanged (fresh mime), changed.txt grew,
# undead.txt reappears, nullc.txt unchanged, new.txt appears; gone.txt absent
scan = [
    ("A", "/d", "same.txt", "text/plain", T1, T1, 10),
    ("A", "/d", "changed.txt", "text/plain", T1, T2, 99),
    ("A", "/d", "undead.txt", "text/plain", T1, T1, 10),
    ("A", "/d", "nullc.txt", "text/plain", None, T1, 10),
    ("A", "/d", "new.txt", "text/markdown", T2, T2, 7),
]
con.executemany("INSERT INTO scratch VALUES (?,?,?,?,?,?,?)", scan)

con.execute("BEGIN")
con.execute(upsert)
con.execute(mark_deleted, ["A"])
con.execute("COMMIT")


def row(fname):
    return con.execute(
        f"SELECT mime_type, created, modified, size, deleted FROM {TABLE} "
        "WHERE external_source='A' AND filename=?", [fname]).fetchone()


mime, created, modified, size, deleted = row("new.txt")
check("insert: new key appears live",
      mime == "text/markdown" and size == 7 and deleted is None)

mime, _, modified, size, deleted = row("changed.txt")
check("update: changed row takes scan values",
      str(modified).startswith("2026-02-02") and size == 99 and deleted is None)

mime, *_ = row("same.txt")
check("no-op: unchanged row keeps corrected mime (db.rs:88-90)",
      mime == "text/corrected", f"mime={mime}")

*_, deleted = row("undead.txt")
check("resurrect: reappeared tombstone cleared", deleted is None)

mime, created, modified, size, deleted = row("nullc.txt")
check("null-safe: NULL created == NULL created is a no-op",
      mime == "text/plain" and created is None and deleted is None)

*_, deleted = row("gone.txt")
check("tombstone: row missing from scan marked deleted", deleted is not None)

b_deleted = con.execute(
    f"SELECT deleted FROM {TABLE} WHERE external_source='B'").fetchone()[0]
check("scope: other source untouched by A's tombstone pass", b_deleted is None)

n = con.execute(f"SELECT count(*) FROM {TABLE}").fetchone()[0]
check("row count: 6 existing + 1 insert", n == 7)

print(f"\n{fails} failures")
sys.exit(1 if fails else 0)

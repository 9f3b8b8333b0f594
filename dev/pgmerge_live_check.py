#!/usr/bin/env python3
"""Live-Postgres execution of PgMerge's transaction SQL — VERBATIM.

The DuckDB harness (pgmerge_check.py) executes the library's generated
statements after one documented dialect adaptation (DuckDB has no
named-constraint conflict target). This harness removes that last
asterisk: a real PostgreSQL server runs the statements EXACTLY as
generated, `ON CONFLICT ON CONSTRAINT external_file_unique_constraint`
included — the reference's own conflict-target spelling
(/root/reference/src/db.rs:105..108) — plus a transaction-rollback
scenario (K2: a failed merge leaves the table untouched).

Requires a running server; the session bootstrap used here:
  initdb -D /tmp/graft_pgdata -U postgres --auth=trust   (as postgres)
  pg_ctl -D /tmp/graft_pgdata \
    -o '-k /tmp/graft_pgsock -p 54329 -c listen_addresses=127.0.0.1' start

Usage: python3 dev/pgmerge_live_check.py [merge_sql.json]
(produce the JSON with:
  sbt -batch "runMain graft.dev.DumpMergeSql" | grep '^{"table"' | tail -1)
Connection overrides: PGHOST (default /tmp/graft_pgsock), PGPORT (54329).
"""
import json
import os
import subprocess
import sys

HOST = os.environ.get("PGHOST", "/tmp/graft_pgsock")
PORT = os.environ.get("PGPORT", "54329")
PSQL = ["psql", "-h", HOST, "-p", PORT, "-U", "postgres", "-X", "-qAt",
        "-v", "ON_ERROR_STOP=1"]

spec = json.load(open(sys.argv[1] if len(sys.argv) > 1 else
                      "/tmp/merge_sql.json"))
TABLE = spec["table"]
upsert = spec["upsert"]          # VERBATIM — named-constraint target kept
mark_deleted = spec["mark_deleted"].replace("?", "'A'")

assert f"ON CONFLICT ON CONSTRAINT {spec['constraint']}" in upsert, \
    "harness exists to execute the named-constraint spelling verbatim"

T1, T2 = "2026-01-01 00:00:00+00", "2026-02-02 00:00:00+00"


def run_sql(sql, check=True):
    r = subprocess.run(PSQL + ["-d", "postgres"], input=sql,
                       capture_output=True, text=True)
    if check and r.returncode != 0:
        print(r.stderr, file=sys.stderr)
        sys.exit(2)
    return r


def q(sql):
    return run_sql(sql).stdout.strip()


fails = 0


def check(name, cond, detail=""):
    global fails
    if cond:
        print(f"OK   {name}")
    else:
        fails += 1
        print(f"FAIL {name} {detail}")


def lit(v):
    return "NULL" if v is None else f"'{v}'"


# fresh schema with the reference's NAMED constraint (timestamptz, db.rs)
run_sql(f"""
DROP TABLE IF EXISTS {TABLE}; DROP TABLE IF EXISTS scratch;
CREATE TABLE {TABLE} (
  external_source TEXT, path TEXT, filename TEXT, mime_type TEXT,
  created TIMESTAMPTZ, modified TIMESTAMPTZ, size BIGINT,
  deleted TIMESTAMPTZ,
  CONSTRAINT {spec['constraint']}
    UNIQUE (external_source, path, filename));
CREATE TABLE scratch (
  external_source TEXT, path TEXT, filename TEXT, mime_type TEXT,
  created TIMESTAMPTZ, modified TIMESTAMPTZ, size BIGINT);
""")

rows = [
    ("A", "/d", "same.txt", "text/corrected", T1, T1, 10, None),
    ("A", "/d", "changed.txt", "text/plain", T1, T1, 10, None),
    ("A", "/d", "undead.txt", "text/plain", T1, T1, 10, T1),
    ("A", "/d", "nullc.txt", "text/plain", None, T1, 10, None),
    ("A", "/d", "gone.txt", "text/plain", T1, T1, 10, None),
    ("B", "/d", "gone.txt", "text/plain", T1, T1, 10, None),
]
scan = [
    ("A", "/d", "same.txt", "text/plain", T1, T1, 10),
    ("A", "/d", "changed.txt", "text/plain", T1, T2, 99),
    ("A", "/d", "undead.txt", "text/plain", T1, T1, 10),
    ("A", "/d", "nullc.txt", "text/plain", None, T1, 10),
    ("A", "/d", "new.txt", "text/markdown", T2, T2, 7),
]
run_sql(f"INSERT INTO {TABLE} VALUES " +
        ",".join("(" + ",".join(lit(v) for v in r) + ")" for r in rows) + ";")
run_sql("INSERT INTO scratch VALUES " +
        ",".join("(" + ",".join(lit(v) for v in r) + ")" for r in scan) + ";")

# K2 first: a transaction that fails mid-merge must leave NO trace
r = run_sql(f"BEGIN;\n{upsert};\nSELECT 1/0;\nCOMMIT;", check=False)
check("rollback: failed merge transaction leaves state untouched",
      r.returncode != 0 and
      q(f"SELECT count(*) FROM {TABLE}") == "6" and
      q(f"SELECT count(*) FROM {TABLE} WHERE filename='new.txt'") == "0")

# the real merge transaction, statements verbatim
run_sql(f"BEGIN;\n{upsert};\n{mark_deleted};\nCOMMIT;")


def row(fname):
    return q(f"SELECT mime_type, created, modified, size, deleted "
             f"FROM {TABLE} WHERE external_source='A' "
             f"AND filename='{fname}'").split("|")


mime, created, modified, size, deleted = row("new.txt")
check("insert: new key appears live",
      mime == "text/markdown" and size == "7" and deleted == "")

mime, _, modified, size, deleted = row("changed.txt")
check("update: changed row takes scan values",
      modified.startswith("2026-02-02") and size == "99" and deleted == "")

mime = row("same.txt")[0]
check("no-op: unchanged row keeps corrected mime (db.rs:88-90)",
      mime == "text/corrected", f"mime={mime}")

check("resurrect: reappeared tombstone cleared", row("undead.txt")[4] == "")

mime, created, _, _, deleted = row("nullc.txt")
check("null-safe: NULL created == NULL created is a no-op",
      mime == "text/plain" and created == "" and deleted == "")

check("tombstone: row missing from scan marked deleted",
      row("gone.txt")[4] != "")

check("scope: other source untouched by A's tombstone pass",
      q(f"SELECT deleted IS NULL FROM {TABLE} "
        "WHERE external_source='B'") == "t")

check("row count: 6 existing + 1 insert",
      q(f"SELECT count(*) FROM {TABLE}") == "7")

# idempotence: re-running the identical scan merge re-stamps nothing
run_sql(f"BEGIN;\n{upsert};\n{mark_deleted};\nCOMMIT;")
check("idempotent: identical rescan keeps corrected mime and live rows",
      row("same.txt")[0] == "text/corrected" and
      row("new.txt")[4] == "" and
      q(f"SELECT count(*) FROM {TABLE}") == "7")

print(f"\n{fails} failures (postgres {q('SHOW server_version')})")
sys.exit(1 if fails else 0)

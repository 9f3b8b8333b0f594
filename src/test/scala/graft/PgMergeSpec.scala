package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.PgMerge

/** No Postgres in the harness — validate the generated SQL's semantics
  * markers (the execution path is plain JDBC). */
class PgMergeSpec extends AnyFunSuite {

  test("upsert SQL: conflict target, conditional update, resurrect") {
    val sql = PgMerge.upsertSql("scratch_t")
    assert(sql.contains("ON CONFLICT ON CONSTRAINT external_file_unique_constraint"))
    assert(sql.contains("mime_type = EXCLUDED.mime_type"))
    assert(sql.contains("IS DISTINCT FROM"))   // null-safe change detection
    assert(sql.contains("deleted = NULL"))      // reappearing files resurrected
    assert(sql.contains("FROM scratch_t"))
  }

  test("mark-deleted SQL: set-based anti-join on the natural key") {
    val sql = PgMerge.markDeletedSql("scratch_t")
    assert(sql.contains("SET deleted = now()"))
    assert(sql.contains("NOT EXISTS"))
    assert(sql.contains("external_source = ?"))
  }

  test("scratch names are sanitized SQL identifiers") {
    val n = PgMerge.scratchName("ab-12; DROP TABLE x--")
    assert(n.matches("[A-Za-z0-9_]+"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.PgChangeFeed

/** OFFLINE coverage for the pgoutput (protocol v1) decoder behind the
  * `graft-pg` changefeed. The frames below are REAL bytes captured from
  * PostgreSQL 15.18's `pg_logical_slot_peek_binary_changes(…,
  * 'proto_version','1',…)` against the engine's own `external_file`
  * DDL — Begin/Relation/Insert from a default-identity table,
  * Update/Delete from the REPLICA IDENTITY FULL form the feed
  * bootstraps (old images complete). A PG-less environment still
  * covers every message shape the live feed decodes. */
class PgOutputDecoderSpec extends AnyFunSuite {

  private val begin =
    "4200000003c43227900002fc1c764993d10000229c"
  private val relation = // replident 'd' (pre-bootstrap), 8 columns
    "520000833f7075626c69630065787465726e616c5f66696c65006400080065787465726e616c5f736f757263650000000019ffffffff00706174680000000019ffffffff0066696c656e616d650000000019ffffffff006d696d655f747970650000000019ffffffff006372656174656400000004a0ffffffff006d6f64696669656400000004a0ffffffff0073697a650000000014ffffffff0064656c6574656400000004a0ffffffff"
  private val insert =
    "490000833f4e000874000000015374000000022f647400000005612e747874740000000a746578742f706c61696e6e740000001d323032362d30312d30322030333a30343a30352e3637383930312b30307400000001376e"
  private val commit =
    "430000000003c432279000000003c43227c00002fc1c764993d1"
  private val relationFull = // replident 'f' (the bootstrapped form)
    "520000833f7075626c69630065787465726e616c5f66696c65006600080165787465726e616c5f736f757263650000000019ffffffff01706174680000000019ffffffff0166696c656e616d650000000019ffffffff016d696d655f747970650000000019ffffffff016372656174656400000004a0ffffffff016d6f64696669656400000004a0ffffffff0173697a650000000014ffffffff0164656c6574656400000004a0ffffffff"
  private val update = // old image size=7, new image size=9
    "550000833f4f000874000000015374000000022f647400000005612e747874740000000a746578742f706c61696e6e740000001d323032362d30312d30322030333a30343a30352e3637383930312b30307400000001376e4e000874000000015374000000022f647400000005612e747874740000000a746578742f706c61696e6e740000001d323032362d30312d30322030333a30343a30352e3637383930312b30307400000001396e"
  private val delete = // old image size=9
    "440000833f4f000874000000015374000000022f647400000005612e747874740000000a746578742f706c61696e6e740000001d323032362d30312d30322030333a30343a30352e3637383930312b30307400000001396e"

  private def feed(d: PgChangeFeed.Decoder,
      hex: String): Option[PgChangeFeed.Change] =
    d.feed(PgChangeFeed.fromHex(hex))

  test("captured pgoutput frames decode to the exact changes: insert " +
      "new image, update new image, delete OLD image (REPLICA IDENTITY " +
      "FULL), with the commit timestamp from Begin") {
    val d = new PgChangeFeed.Decoder("external_file")
    assert(feed(d, begin).isEmpty)
    assert(feed(d, relation).isEmpty)
    val ins = feed(d, insert).get
    assert(ins.action == "insert")
    assert(ins.values("external_source") == Some("S"))
    assert(ins.values("path") == Some("/d"))
    assert(ins.values("filename") == Some("a.txt"))
    assert(ins.values("mime_type") == Some("text/plain"))
    assert(ins.values("created").isEmpty, "NULL column decodes to None")
    assert(ins.values("modified") ==
      Some("2026-01-02 03:04:05.678901+00"))
    assert(ins.values("size") == Some("7"))
    assert(ins.values("deleted").isEmpty)
    // Begin's timestamp is pgoutput micros since 2000-01-01: the
    // captured transaction committed 2026-08-15 (this harness session)
    val committed = java.time.Instant.ofEpochSecond(
      ins.commitTsMicros / 1000000L)
    assert(committed.toString.startsWith("2026-08-15"),
      s"commit ts decoded: $committed")
    assert(feed(d, commit).isEmpty)
    // the FULL-identity relation re-registers, then update/delete
    assert(feed(d, relationFull).isEmpty)
    val upd = feed(d, update).get
    assert(upd.action == "update" && upd.values("size") == Some("9"),
      "update emits the NEW image")
    val del = feed(d, delete).get
    assert(del.action == "delete" && del.values("size") == Some("9") &&
      del.values("filename") == Some("a.txt"),
      "delete emits the complete OLD image under REPLICA IDENTITY FULL")
  }

  test("foreign relations are skipped, unregistered relations and " +
      "unknown tags fail loudly, LSNs round-trip") {
    // a decoder watching a DIFFERENT table sees the same frames: the
    // relation registers, but its changes emit nothing
    val other = new PgChangeFeed.Decoder("some_other_table")
    assert(feed(other, relation).isEmpty)
    assert(feed(other, insert).isEmpty)
    // a change BEFORE its Relation message is protocol corruption
    val fresh = new PgChangeFeed.Decoder("external_file")
    val e = intercept[IllegalStateException](feed(fresh, insert))
    assert(e.getMessage.contains("unregistered relation"))
    // unknown message tags are loud (silent drift = silently dropped
    // changes)
    val d = new PgChangeFeed.Decoder("external_file")
    val u = intercept[IllegalStateException](
      d.feed(PgChangeFeed.fromHex("7a00"))) // tag 'z'
    assert(u.getMessage.contains("unknown message tag"))
    // LSN text form round-trips through the 64-bit offset
    assert(PgChangeFeed.formatLsn(
      PgChangeFeed.parseLsn("3/C4322688")) == "3/C4322688")
    assert(PgChangeFeed.parseLsn("0/0") == 0L)
    assert(PgChangeFeed.parseLsn("FFFFFFFF/FFFFFFFF") == -1L)
    // slot/publication names travel into engine SQL: strict charset
    intercept[IllegalArgumentException](
      PgChangeFeed.checkedName("slot", "bad name"))
    intercept[IllegalArgumentException](
      PgChangeFeed.checkedName("slot", "1slot"))
    intercept[IllegalArgumentException](
      PgChangeFeed.checkedName("slot", "Slot'; DROP--"))
    assert(PgChangeFeed.checkedName("slot", "graft_slot_2") ==
      "graft_slot_2")
  }
}

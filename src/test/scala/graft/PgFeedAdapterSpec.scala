package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sources.v2.PgChangeFeed
import graft.streaming.ScrapeTws

/** OFFLINE coverage for [[PgChangeFeed.asScrapeEvents]] — the adapter
  * that re-expresses the logical-decoding feed in the change-event
  * dialect of [[ScrapeTws.changeStream]], so a PG-backed watch swaps
  * rescan→changefeed without touching any consumer. Pure DataFrame
  * transform: testable without a server (the feed rows themselves are
  * proven live in PgSourceSpec). */
class PgFeedAdapterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  private val t1 = ts("2026-01-01T00:00:00.000001Z")
  private val t2 = ts("2026-01-02T00:00:00Z")
  private val t3 = ts("2026-01-03T00:00:00Z")
  private val t4 = ts("2026-01-04T00:00:00Z")
  private val t5 = ts("2026-01-05T00:00:00Z")

  /** A feed frame in [[PgChangeFeed.schema]]'s shape. */
  private def feedOf(rows: Seq[(String, Long, java.sql.Timestamp,
      String, String, String, String, java.sql.Timestamp,
      java.sql.Timestamp, java.lang.Long, java.sql.Timestamp)]) = {
    import spark.implicits._
    rows.toDF("action", "lsn", "committed", "external_source", "path",
      "filename", "mime_type", "created", "modified", "size", "deleted")
  }

  private val nullTs = null.asInstanceOf[java.sql.Timestamp]

  test("action mapping: live insert/update pass through, a tombstoning " +
      "UPDATE is a delete, a physical DELETE is a tombstone at commit " +
      "time, and foreign sources drop") {
    val feed = feedOf(Seq(
      ("insert", 10L, t1, "S", "/p", "a.txt", "text/plain", t1, t1,
        Long.box(5L), nullTs),
      ("update", 20L, t2, "S", "/p", "a.txt", "text/plain", t1, t2,
        Long.box(9L), nullTs),
      // the publish path tombstones by UPDATE: new image carries deleted
      ("update", 30L, t3, "S", "/p", "b.txt", "text/plain", t1, t1,
        Long.box(7L), t3),
      // physical DELETE: the OLD image (REPLICA IDENTITY FULL), deleted
      // NULL in it — the commit instant IS the deletion time
      ("delete", 40L, t4, "S", "/p", "c.txt", "text/plain", t1, t1,
        Long.box(3L), nullTs),
      ("insert", 45L, t4, "T", "/q", "foreign.txt", "text/plain", t1, t1,
        Long.box(1L), nullTs)))
    val out = PgChangeFeed.asScrapeEvents(feed, "S")
    // the schema IS the daemon's event schema, name for name
    assert(out.columns.toSeq == Seq("uuid_external_file",
      "external_source", "path", "filename", "mime_type", "created_ms",
      "modified_ms", "size", "deleted_ms", "action", "event_ms",
      "event_seq"))
    val rows = out.orderBy("event_seq").collect()
    assert(rows.map(_.getAs[String]("filename")).toSeq ==
      Seq("a.txt", "a.txt", "b.txt", "c.txt"), "foreign source dropped")
    assert(rows.map(_.getAs[String]("action")).toSeq ==
      Seq("insert", "update", "delete", "delete"))
    // the tombstoning update keeps ITS deleted instant; the physical
    // delete gets the commit instant
    assert(rows(2).getAs[Long]("deleted_ms") == t3.getTime)
    assert(rows(3).getAs[Long]("deleted_ms") == t4.getTime)
    assert(rows(0).isNullAt(rows(0).fieldIndex("deleted_ms")))
    // event order is commit order: ms = commit time, seq = LSN
    assert(rows.map(_.getAs[Long]("event_seq")).toSeq ==
      Seq(10L, 20L, 30L, 40L))
    assert(rows(0).getAs[Long]("event_ms") == t1.getTime)
    // the surrogate uuid is BIT-IDENTICAL to the daemon/batch paths
    assert(rows(0).getAs[String]("uuid_external_file") ==
      ScrapeTws.genUuid("S", "/p", "a.txt"))
  }

  test("snapshotOf(adapted feed) compacts to current state exactly: " +
      "last change per key wins by (event_ms, event_seq), a resurrect " +
      "revives the key, physical deletes surface as tombstones") {
    val feed = feedOf(Seq(
      ("insert", 10L, t1, "S", "/p", "a.txt", "text/plain", t1, t1,
        Long.box(5L), nullTs),
      ("update", 20L, t2, "S", "/p", "a.txt", "text/plain", t1, t2,
        Long.box(9L), nullTs),
      ("update", 30L, t3, "S", "/p", "b.txt", "text/plain", t1, t1,
        Long.box(7L), t3),
      // b.txt resurrects: deleted back to NULL after the tombstone
      ("update", 50L, t5, "S", "/p", "b.txt", "text/markdown", t1, t5,
        Long.box(8L), nullTs),
      ("delete", 40L, t4, "S", "/p", "c.txt", "text/plain", t1, t1,
        Long.box(3L), nullTs)))
    val snap = ScrapeTws.snapshotOf(PgChangeFeed.asScrapeEvents(feed, "S"))
      .collect().map(r => r.getAs[String]("filename") -> r).toMap
    assert(snap.size == 3)
    assert(snap("a.txt").getAs[Long]("size") == 9L &&
      snap("a.txt").getAs[java.sql.Timestamp]("deleted") == null,
      "last update wins")
    assert(snap("b.txt").getAs[java.sql.Timestamp]("deleted") == null &&
      snap("b.txt").getAs[String]("mime_type") == "text/markdown",
      "the lsn-50 resurrect out-compacts the lsn-30 tombstone")
    assert(snap("c.txt").getAs[java.sql.Timestamp]("deleted") != null &&
      snap("c.txt").getAs[java.sql.Timestamp]("deleted").getTime ==
        t4.getTime, "a physical delete is a tombstone at commit time")
  }

  test("a rename's delete+update pair (same LSN, different keys) " +
      "compacts with no phantom: the old identity drops, the new one " +
      "lives — in compact() and in the adapted snapshotOf alike") {
    val feed = feedOf(Seq(
      ("insert", 10L, t1, "S", "/p", "a.txt", "text/plain", t1, t1,
        Long.box(5L), nullTs),
      // the decoder's rename fan-out: one UPDATE emitted as two changes
      // sharing the commit's change LSN
      ("delete", 50L, t5, "S", "/p", "a.txt", "text/plain", t1, t1,
        Long.box(5L), nullTs),
      ("update", 50L, t5, "S", "/p", "b.txt", "text/plain", t1, t5,
        Long.box(5L), nullTs)))
    val compacted = PgChangeFeed.compact(feed)
      .collect().map(_.getAs[String]("filename")).toSeq
    assert(compacted == Seq("b.txt"),
      s"no phantom a.txt after the rename: $compacted")
    val snap = ScrapeTws.snapshotOf(PgChangeFeed.asScrapeEvents(feed, "S"))
      .collect().map(r => r.getAs[String]("filename") ->
        (r.getAs[java.sql.Timestamp]("deleted") == null)).toMap
    assert(snap == Map("a.txt" -> false, "b.txt" -> true),
      s"the event dialect agrees (a.txt tombstoned, b.txt live): $snap")
  }

  test("TRUNCATE fails the adapted stream loudly — a table wipe has no " +
      "per-file expression and must not be silently dropped") {
    val feed = feedOf(Seq(
      ("insert", 10L, t1, "S", "/p", "a.txt", "text/plain", t1, t1,
        Long.box(5L), nullTs),
      ("truncate", 60L, t5, null, null, null, null, nullTs, nullTs,
        null.asInstanceOf[java.lang.Long], nullTs)))
    val e = intercept[Exception](
      PgChangeFeed.asScrapeEvents(feed, "S").collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("TRUNCATE")), s"got: $e")
  }
}

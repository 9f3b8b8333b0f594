package graft

import java.nio.file.{Files, Path, Paths}
import java.nio.file.attribute.FileTime
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ScrapeStream

/** End-to-end incremental scrape: two scan files arrive as two
  * micro-batches; the state snapshot must show inserts, updates, and the
  * vanished-key tombstone after the second scan. */
class ScrapeStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def writeScanFile(dir: Path, name: String,
      rows: Seq[(String, String, String, Option[String], Option[Timestamp], Timestamp, Option[Long])],
      mtime: Long): Unit = {
    val staging = Files.createTempDirectory("scan_staging")
    rows.toDF("external_source", "path", "filename", "mime_type",
      "created", "modified", "size")
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging).filter(p => p.toString.endsWith(".parquet"))
      .findFirst().get()
    val target = dir.resolve(name)
    Files.move(part, target)
    Files.setLastModifiedTime(target, FileTime.fromMillis(mtime))
  }

  test("merge touches only the scanned source's partition") {
    val state = Files.createTempDirectory("scrape_state_inc").toString
    def scanDF(src: String, file: String, m: Timestamp, size: Long) =
      Seq((src, "/d", file, Option("text/plain"), Option.empty[Timestamp], m, Option(size)))
        .toDF("external_source", "path", "filename", "mime_type",
          "created", "modified", "size")
    val t1 = ts("2026-01-01 10:00:00")
    val t2 = ts("2026-01-02 10:00:00")
    ScrapeStream.mergeBatch(spark, state)(scanDF("sA", "a.txt", t1, 1L), 0L)
    ScrapeStream.mergeBatch(spark, state)(scanDF("sB", "b.txt", t1, 2L), 1L)

    def snapshot(p: Path): Seq[(String, Long, Long)] = {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.filter(Files.isRegularFile(_))
        .map(f => (f.toString, Files.getLastModifiedTime(f).toMillis, Files.size(f)))
        .toSeq.sorted
    }
    val aDir = Paths.get(state, "external_source=sA")
    val before = snapshot(aDir)
    assert(before.nonEmpty)

    // a scan of sB must leave sA's partition files physically untouched
    ScrapeStream.mergeBatch(spark, state)(scanDF("sB", "b.txt", t2, 20L), 2L)
    assert(snapshot(aDir) == before)

    val rows = ScrapeStream.readState(spark, state)
      .collect().map(r => r.getString(3) -> r).toMap
    assert(rows("b.txt").getLong(7) == 20L) // sB merged
    assert(rows("a.txt").getLong(7) == 1L && rows("a.txt").isNullAt(8)) // sA intact
  }

  test("recoverSwaps restores an interrupted swap and drops completed leftovers") {
    val state = Files.createTempDirectory("scrape_state_rec").toString
    def scanDF(src: String, file: String) =
      Seq((src, "/d", file, Option("text/plain"), Option.empty[Timestamp],
        ts("2026-01-01 10:00:00"), Option(1L)))
        .toDF("external_source", "path", "filename", "mime_type",
          "created", "modified", "size")
    ScrapeStream.mergeBatch(spark, state)(scanDF("sA", "a.txt"), 0L)
    ScrapeStream.mergeBatch(spark, state)(scanDF("sB", "b.txt"), 1L)

    // crash between "old aside" and "new in": sA's live partition is gone,
    // its only copy sits under the holding dir
    val aDir = Paths.get(state, "external_source=sA")
    val hold9 = Paths.get(state, ".old-9", "external_source=sA")
    Files.createDirectories(hold9.getParent)
    Files.move(aDir, hold9)
    // crash after "new in" but before holding-dir cleanup: sB live AND an
    // obsolete holding copy both exist
    val hold8 = Paths.get(state, ".old-8", "external_source=sB")
    Files.createDirectories(hold8)
    Files.write(hold8.resolve("stale.parquet"), Array[Byte](1))
    // leftover staging dir from the interrupted batch
    Files.createDirectories(Paths.get(state + ".stage-9"))

    ScrapeStream.recoverSwaps(spark, state)

    assert(Files.exists(aDir)) // interrupted swap rolled back
    assert(!Files.exists(Paths.get(state, ".old-9")))
    assert(!Files.exists(Paths.get(state, ".old-8"))) // garbage dropped
    assert(!Files.exists(Paths.get(state + ".stage-9")))
    val rows = ScrapeStream.readState(spark, state)
      .collect().map(r => r.getString(3) -> r.getString(1)).toMap
    assert(rows == Map("a.txt" -> "sA", "b.txt" -> "sB"))
  }

  test("two-batch incremental scrape: insert, update, tombstone") {
    val watch = Files.createTempDirectory("scrape_watch")
    val state = watch.toString + "_state"

    val t1 = ts("2026-01-01 10:00:00")
    val t2 = ts("2026-01-02 10:00:00")
    writeScanFile(watch, "scan1.parquet", Seq(
      ("s1", "/d", "a.txt", Some("text/plain"), None, t1, Some(1L)),
      ("s1", "/d", "b.txt", Some("text/plain"), None, t1, Some(2L)),
    ), mtime = 1000000)
    writeScanFile(watch, "scan2.parquet", Seq(
      ("s1", "/d", "b.txt", Some("text/plain"), None, t2, Some(20L)), // changed
      ("s1", "/d", "c.txt", Some("text/plain"), None, t2, Some(3L)),  // new
    ), mtime = 2000000)

    ScrapeStream.runAvailable(spark, watch.toString, state)

    val rows = ScrapeStream.readState(spark, state)
      .collect().map(r => r.getString(3) -> r).toMap
    assert(rows.size == 3)
    // a.txt vanished in scan2 → tombstoned
    assert(rows("a.txt").getTimestamp(8) != null)
    // b.txt updated to scan2 metadata, alive
    assert(rows("b.txt").getLong(7) == 20L)
    assert(rows("b.txt").isNullAt(8))
    // c.txt inserted with generated uuid
    assert(rows("c.txt").getString(0).startsWith("gen_"))
    assert(rows("c.txt").isNullAt(8))
  }
}

package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scrape

/** Property-based invariants of the merge semantics (SURVEY §5.2):
  * generated current/scan tables must satisfy, for every seed:
  *  - partition: every scan row is classified exactly once;
  *  - conservation: deletions ∪ scan-keys == current-keys ∪ scan-keys;
  *  - idempotence: re-scanning the merged state yields zero changes;
  *  - mime preservation only on unchanged rows.
  */
class ScrapePropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val t0 = 1700000000000L

  private case class FileRow(
      path: String, filename: String, mime: Option[String],
      created: Option[Timestamp], modified: Timestamp, size: Option[Long])

  private val genRow: Gen[FileRow] = for {
    p <- Gen.oneOf("/a", "/b", "/c/d")
    f <- Gen.chooseNum(0, 30).map(i => s"f$i.txt")
    mime <- Gen.option(Gen.oneOf("text/plain", "application/x-fixed"))
    created <- Gen.option(Gen.chooseNum(0L, 5L).map(d => new Timestamp(t0 + d * 86400000)))
    modified <- Gen.chooseNum(0L, 5L).map(d => new Timestamp(t0 + d * 86400000))
    size <- Gen.option(Gen.chooseNum(0L, 1000L))
  } yield FileRow(p, f, mime, created, modified, size)

  private val genTables: Gen[(List[FileRow], List[FileRow])] = for {
    cur <- Gen.listOfN(25, genRow)
    scan <- Gen.listOfN(25, genRow)
  } yield (dedupByKey(cur), dedupByKey(scan))

  private def dedupByKey(rows: List[FileRow]): List[FileRow] =
    rows.groupBy(r => (r.path, r.filename)).values.map(_.head).toList

  private def currentDF(rows: List[FileRow]): DataFrame =
    rows.zipWithIndex.map { case (r, i) =>
      (s"u$i", "src", r.path, r.filename, r.mime, r.created, r.modified,
        r.size, None: Option[Timestamp])
    }.toDF("uuid_external_file", "external_source", "path", "filename",
      "mime_type", "created", "modified", "size", "deleted")

  private def scanDF(rows: List[FileRow]): DataFrame =
    rows.map(r => ("src", r.path, r.filename, r.mime, r.created, r.modified, r.size))
      .toDF("external_source", "path", "filename", "mime_type", "created",
        "modified", "size")

  test("merge invariants hold for generated tables") {
    (1 to 5).map(i => genTables.pureApply(Gen.Parameters.default, Seed(i.toLong)))
      .foreach { case (cur, scan) =>
      val c = currentDF(cur)
      val n = scanDF(scan)
      val classified = Scrape.upsertClassify(c, n).cache()

      // partition: one classified row per scan row, actions well-formed
      assert(classified.count() == scan.size)
      assert(classified.filter(
        !col("action").isin("insert", "update", "unchanged")).count() == 0)

      // conservation: deletions are exactly current-keys minus scan-keys
      val dels = Scrape.deletions(c, n, lit("2026-02-01 00:00:00").cast("timestamp"))
      val delKeys = dels.select("path", "filename").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      val curKeys = cur.map(r => (r.path, r.filename)).toSet
      val scanKeys = scan.map(r => (r.path, r.filename)).toSet
      assert(delKeys == curKeys.diff(scanKeys))

      // idempotence: merged state re-scanned => all unchanged
      val merged = classified.select(
        coalesce(col("uuid_external_file"), concat(lit("n_"), col("filename")))
          .as("uuid_external_file"),
        col("external_source"), col("path"), col("filename"),
        col("mime_type"), col("created"), col("modified"), col("size"),
        lit(null).cast("timestamp").as("deleted"))
      // fresh scan DF (new attribute ids) to avoid ambiguous self-join
      assert(Scrape.upsertClassify(merged, scanDF(scan))
        .filter(col("action") =!= "unchanged").count() == 0)

      // mime preservation: only unchanged rows may diverge from scan mime
      val scanMime = scan.map(r => ((r.path, r.filename), r.mime)).toMap
      classified.collect().foreach { r =>
        if (r.getString(3) != "unchanged") {
          val got = Option(r.getString(4))
          assert(got == scanMime((r.getString(1), r.getString(2))),
            s"non-unchanged row kept old mime: $r")
        }
      }
    }
  }
}

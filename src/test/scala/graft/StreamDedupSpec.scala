package graft

import java.nio.file.Files
import java.nio.file.attribute.FileTime
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamDedup

/** Streaming dedup semantics: duplicates arriving in later micro-batches
  * (within the watermark horizon) are dropped; the survivor set equals
  * the batch replay's first-occurrence-per-key. */
class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def writeFile(dir: java.nio.file.Path, name: String,
      rows: Seq[(Long, Timestamp, String)], mtime: Long): Unit = {
    val staging = Files.createTempDirectory("sd_staging")
    rows.toDF("event_id", "ts", "content")
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging)
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    val t = dir.resolve(name)
    Files.move(part, t)
    Files.setLastModifiedTime(t, FileTime.fromMillis(mtime))
  }

  test("streaming curation: stateless gates + watermark dedup equal batch replay") {
    val watch = Files.createTempDirectory("sc_watch")
    // realistic text that passes the quality gate vs junk that fails it
    val good = "the quick brown fox jumps over a lazy dog and it runs on " +
      "to the river where it is seen again and again by the watchers of the field"
    def rows(ids: Seq[Long], text: String, t: Timestamp) =
      ids.map(i => (i, t, text + " tail" + (i % 7)))
    writeScanFile2(watch, "b1.parquet",
      rows(Seq(1L, 2L, 3L), good, ts("2026-01-01 10:00:00")) ++
        Seq((4L, ts("2026-01-01 10:00:30"), "x!!! ###")), 1000000) // junk fails gate
    writeScanFile2(watch, "b2.parquet",
      rows(Seq(8L, 9L), good, ts("2026-01-01 10:01:00")) ++
        Seq((15L, ts("2026-01-01 10:01:30"), good + " tail1")), // dup of id 1's text
      2000000)

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id bigint, ts timestamp, text string")
    val curated = graft.streaming.StreamDedup.curateStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
        .parquet(watch.toString),
      eventTime = "ts", delay = "10 minutes")
    val q = curated.writeStream.format("memory").queryName("sc_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sc_out").collect()
      .map(_.getAs[Long]("doc_id")).toSet

    // batch replay: same gates, first (ts, doc_id) per text
    val batch = spark.read.parquet(watch.toString)
      .filter(graft.functions.TextAnalysis.qualityScore(col("text")) >= 0.6)
      .filter(md5(concat(lit("cur"), col("doc_id").cast("string"))) < "8")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("text")).orderBy(col("ts"), col("doc_id"))))
      .filter(col("rn") === 1)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(streamed == batch)
    assert(!streamed.contains(4L)) // junk gated out
    assert(!(streamed.contains(1L) && streamed.contains(15L))) // cross-batch dup
  }

  private def writeScanFile2(dir: java.nio.file.Path, name: String,
      rows: Seq[(Long, Timestamp, String)], mtime: Long): Unit = {
    val staging = Files.createTempDirectory("sc_staging")
    rows.toDF("doc_id", "ts", "text")
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging)
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    val t = dir.resolve(name)
    Files.move(part, t)
    Files.setLastModifiedTime(t, FileTime.fromMillis(mtime))
  }

  test("cross-batch duplicates dropped; survivors equal batch first-occurrence") {
    val watch = Files.createTempDirectory("sd_watch")
    writeFile(watch, "b1.parquet", Seq(
      (1L, ts("2026-01-01 10:00:00"), "aaa"),
      (2L, ts("2026-01-01 10:01:00"), "bbb"),
      (3L, ts("2026-01-01 10:02:00"), "aaa"), // intra-batch dup
    ), 1000000)
    writeFile(watch, "b2.parquet", Seq(
      (4L, ts("2026-01-01 10:03:00"), "aaa"), // cross-batch dup
      (5L, ts("2026-01-01 10:04:00"), "ccc"),
    ), 2000000)
    writeFile(watch, "b3.parquet", Seq(
      (6L, ts("2026-01-01 10:05:00"), "bbb"), // cross-batch dup
      (7L, ts("2026-01-01 10:06:00"), "ddd"),
    ), 3000000)

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id bigint, ts timestamp, content string")
    val deduped = StreamDedup.dedupe(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
        .parquet(watch.toString),
      keyCols = Seq("content"), eventTime = "ts", delay = "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("sd_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("sd_out").collect()
      .map(r => r.getAs[Long]("event_id")).toSet
    assert(got == Set(1L, 2L, 5L, 7L)) // first occurrence of each content

    // batch replay: first (ts, event_id) per key — identical survivor set
    val batch = spark.read.parquet(watch.toString)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("content")).orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") === 1)
      .collect().map(_.getAs[Long]("event_id")).toSet
    assert(batch == got)
  }
}

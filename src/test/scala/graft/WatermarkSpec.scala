package graft

import java.nio.file.Files
import java.nio.file.attribute.FileTime
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Watermark semantics: an event arriving in a later micro-batch with an
  * event-time older than (max seen - watermark) must be dropped from the
  * windowed aggregation; batch replay of the same data keeps it. */
class WatermarkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def writeFile(dir: java.nio.file.Path, name: String,
      rows: Seq[(Long, Timestamp, Double)], mtime: Long): Unit = {
    val staging = Files.createTempDirectory("wm_staging")
    rows.toDF("user_id", "ts", "value")
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging)
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    val t = dir.resolve(name)
    Files.move(part, t)
    Files.setLastModifiedTime(t, FileTime.fromMillis(mtime))
  }

  test("late event beyond the watermark is dropped; batch replay keeps it") {
    val watch = Files.createTempDirectory("wm_watch")
    // batch 1: events at 10:05 and 10:10
    writeFile(watch, "b1.parquet", Seq(
      (1L, ts("2026-01-01 10:05:00"), 1.0),
      (2L, ts("2026-01-01 10:10:00"), 1.0)), 1000000)
    // batch 2: event at 12:00 advances the computed watermark to 11:50;
    // batch 3: another on-time event, by whose processing the 11:50
    // watermark has become effective for late-row filtering (the filter
    // watermark lags the computed one by a batch);
    // batch 4: straggler back at 10:20 — older than the effective
    // watermark, its window already closed → dropped.
    writeFile(watch, "b2.parquet", Seq(
      (3L, ts("2026-01-01 12:00:00"), 1.0)), 2000000)
    writeFile(watch, "b3.parquet", Seq(
      (5L, ts("2026-01-01 12:05:00"), 1.0)), 3000000)
    writeFile(watch, "b4.parquet", Seq(
      (4L, ts("2026-01-01 10:20:00"), 1.0)), 4000000)

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id bigint, ts timestamp, value double")
    val agg = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(watch.toString)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamed = spark.table("wm_out").collect()
      .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    // the 10:00 window closed when the watermark passed 11:00: it emitted
    // with only the 2 on-time events; the 10:20 straggler was dropped
    assert(streamed(ts("2026-01-01 10:00:00")) == 2L)

    val batch = spark.read.parquet(watch.toString)
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(batch(ts("2026-01-01 10:00:00")) == 3L) // replay keeps the late row
  }
}

package graft

import java.nio.file.Files
import java.nio.file.attribute.FileTime
import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoin

/** Stream-stream attribution join: pairs split across micro-batches are
  * still joined (state holds the view until the watermark passes), and
  * the emitted set equals the batch replay. */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def writeFile(dir: java.nio.file.Path, name: String,
      rows: Seq[(Long, Long, Timestamp)], mtime: Long): Unit = {
    val staging = Files.createTempDirectory("sj_staging")
    rows.toDF("event_id", "user_id", "ts")
      .coalesce(1).write.mode("overwrite").parquet(staging.toString)
    val part = Files.list(staging)
      .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
    val t = dir.resolve(name)
    Files.move(part, t)
    Files.setLastModifiedTime(t, FileTime.fromMillis(mtime))
  }

  test("cross-batch view/click pairs join within horizon; late clicks don't") {
    val vDir = Files.createTempDirectory("sj_views")
    val cDir = Files.createTempDirectory("sj_clicks")
    // views arrive in one batch...
    writeFile(vDir, "v1.parquet", Seq(
      (10L, 1L, ts("2026-01-01 10:00:00")),
      (11L, 2L, ts("2026-01-01 10:00:00")),
      (12L, 1L, ts("2026-01-01 10:20:00")),
    ), 1000000)
    // ...clicks in two later batches: in-horizon, cross-user, beyond-horizon
    writeFile(cDir, "c1.parquet", Seq(
      (20L, 1L, ts("2026-01-01 10:05:00")), // joins view 10 (5 min)
      (21L, 2L, ts("2026-01-01 10:15:00")), // 15 min after view 11 → out
    ), 1000000)
    writeFile(cDir, "c2.parquet", Seq(
      (22L, 1L, ts("2026-01-01 10:25:00")), // joins view 12 only (view 10 is 25 min back)
      (23L, 3L, ts("2026-01-01 10:25:00")), // no view for user 3
    ), 2000000)

    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id bigint, user_id bigint, ts timestamp")
    def stream(dir: java.nio.file.Path) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(dir.toString)
    val joined = StreamJoin.attribute(stream(vDir), stream(cDir),
      delay = "30 minutes")
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sj_out").collect()
      .map(r => (r.getAs[Long]("view_id"), r.getAs[Long]("click_id"))).toSet
    assert(got == Set((10L, 20L), (12L, 22L)))

    // batch replay over the same files emits the identical pair set
    val batch = StreamJoin.attribute(
      spark.read.parquet(vDir.toString), spark.read.parquet(cDir.toString),
      delay = "0 seconds").collect()
      .map(r => (r.getAs[Long]("view_id"), r.getAs[Long]("click_id"))).toSet
    assert(batch == got)
  }

  test("stream-static enrichment converges to the batch form, statelessly") {
    val q = StreamJoin.enrichStream(spark, TestSpark.sf0001)
      .writeStream.format("memory").queryName("se_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("se_out").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val batch = StreamJoin.qStreamEnrich(spark, TestSpark.sf0001).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("streaming anomaly alerts equal the batch z-score detector") {
    val q = StreamJoin.anomalyStream(spark, TestSpark.sf0001)
      .writeStream.format("memory").queryName("sa_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sa_out").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    val batch = graft.operators.Stats.qAnomalyZscore(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
      .toSet
    assert(got == batch)
    assert(got.nonEmpty)
  }

  test("registered batch form: delays within horizon, keyed by same user") {
    val rows = StreamJoin.qStreamJoin(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getAs[Long]("delay_us")
      assert(d >= 0L && d <= 60L * 60 * 1000000)
    }
  }
}

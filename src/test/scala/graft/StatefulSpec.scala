package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventWindows

class StatefulSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flatMapGroupsWithState running totals converge to batch totals") {
    val q = EventWindows.userTotalsStream(spark, TestSpark.sf0001)
      .writeStream.format("memory").queryName("state_out")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    // update mode emits one row per user per batch; the LAST emission per
    // user is the final state
    val finalRows = spark.table("state_out")
      .withColumn("rn", monotonically_increasing_id())
      .groupBy("user_id")
      .agg(max(struct(col("rn"), col("n_events"), col("total_cents"))).as("m"))
      .select(col("user_id"), col("m.n_events"), col("m.total_cents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = graft.Tables.events(spark, TestSpark.sf0001)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(graft.Tables.cents(col("value"))).as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(finalRows == batch)
  }

  test("transformWithState totals == fMGS totals == batch aggregate") {
    // the new-API operator requires the RocksDB provider (column
    // families); since r12 the engine default is the TUNED provider
    // (changelog checkpointing + bounded memory) — these specs run
    // under changelog mode
    graft.streaming.RocksDb.withRocksDb(spark) {
      val q = graft.streaming.StateV2
        .userTotalsStreamTws(spark, TestSpark.sf0001)
        .writeStream.format("memory").queryName("state_v2_out")
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val finalRows = spark.table("state_v2_out")
        .withColumn("rn", monotonically_increasing_id())
        .groupBy("user_id")
        .agg(max(struct(col("rn"), col("n_events"), col("total_cents"))).as("m"))
        .select(col("user_id"), col("m.n_events"), col("m.total_cents"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = graft.Tables.events(spark, TestSpark.sf0001)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          sum(graft.Tables.cents(col("value"))).as("v"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(finalRows == batch)
    }
  }

  test("statestore reader: checkpointed fMGS state is introspectable offline") {
    // run the totals stream with a DURABLE checkpoint, then read the
    // state store back with the `statestore` format — the ops surface
    // for debugging a production stream's state without the stream
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val q = EventWindows.userTotalsStream(spark, TestSpark.sf0001)
      .writeStream.format("memory").queryName("state_ckpt_out")
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val state = spark.read.format("statestore").option("path", ckpt).load()
    // schema: key.value (the group key), value.groupState._1/_2 (the
    // fMGS state tuple), partition_id
    val rows = state.selectExpr("key.value", "value.groupState._1",
      "value.groupState._2").collect()
    val fromState = rows.map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = graft.Tables.events(spark, TestSpark.sf0001)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(graft.Tables.cents(col("value"))).as("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fromState == batch,
      s"state store drifted from batch: ${fromState.size} vs ${batch.size} keys")
  }

  test("TWS sessionizer handles cross-batch out-of-order events per the documented contract") {
    import spark.implicits._
    graft.streaming.RocksDb.withRocksDb(spark) {
      // three micro-batches for one user (seconds → ms in the output):
      //  f1: 0s, 1500s      → roll closes (0,0); open (1500,1500)
      //  f2: 700s  — older than start−gap (900s): straggler session
      //      1000s — within gap of start: extends start BACKWARD
      //      1600s — extends end forward          → open (1000,1600)
      //  f3: 5000s → roll closes (1000,1600,3ev); open (5000,5000)
      val dir = java.nio.file.Files.createTempDirectory("tws_ooo").toString
      def writeFile(n: Int, secs: Seq[Long]): Unit = {
        val f = s"$dir/f$n"
        secs.map(sec => (1L, new java.sql.Timestamp(sec * 1000L), 100L))
          .toDF("user_id", "ts", "value_cents")
          .coalesce(1).write.mode("overwrite").parquet(f)
        // FileStreamSource orders by modification time; space them out
        new java.io.File(f).listFiles().foreach(p =>
          p.setLastModified(1700000000000L + n * 60000L))
      }
      writeFile(1, Seq(0L, 1500L))
      writeFile(2, Seq(700L, 1000L, 1600L))
      writeFile(3, Seq(5000L))
      val src = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, value_cents LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/f*")
      val q = graft.streaming.StateV2.sessionizeTws(spark, src)
        .writeStream.format("memory").queryName("tws_ooo_out")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("tws_ooo_out").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      val expected = Set(
        (0L, 0L, 1L, 100L),          // rolled closed in f1
        (700000L, 700000L, 1L, 100L), // straggler emitted in f2
        (1000000L, 1600000L, 3L, 300L)) // backward-extended, rolled in f3
      assert(got == expected, s"got=$got")
    }
  }

  test("timer-driven TWS sessionizer == batch gaps-and-islands (watermark-closed set)") {
    graft.streaming.RocksDb.withRocksDb(spark) {
      val q = graft.streaming.StateV2
        .sessionStreamTws(spark, TestSpark.sf0001)
        .writeStream.format("memory").queryName("session_v2_out")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val got = spark.table("session_v2_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet

      // batch reference: 10-min gaps-and-islands per user in millis
      val evs = graft.Tables.events(spark, TestSpark.sf0001)
        .select(col("user_id"), expr("unix_millis(ts)").as("ts_ms"),
          graft.Tables.cents(col("value")).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val gap = 600000L
      val wm = evs.map(_._2).max - 30L * 60000L // final watermark
      val expected = evs.groupBy(_._1).flatMap { case (u, rows) =>
        val sorted = rows.sortBy(_._2)
        val sessions = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Long, Long)]
        sorted.foreach { case (_, ts, c) =>
          if (sessions.nonEmpty && ts - sessions.last._2 <= gap) {
            val l = sessions.last
            sessions(sessions.size - 1) =
              (l._1, math.max(ts, l._2), l._3 + 1, l._4 + c)
          } else sessions += ((ts, ts, 1L, c))
        }
        // a session reaches the output once it ROLLED (a later session
        // exists for the user) or its idle timer fired under the final
        // watermark; the very last session stays open past wm otherwise
        sessions.zipWithIndex.collect {
          case ((s0, l0, n, c), i)
              if i < sessions.size - 1 || l0 + gap <= wm =>
            (u, s0, l0, n, c)
        }
      }.toSet
      assert(got == expected,
        s"missing=${(expected -- got).take(3)} spurious=${(got -- expected).take(3)}")
      assert(got.nonEmpty)
    }
  }
}

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
    // families); restore whatever the session had afterwards
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
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
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
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

  test("timer-driven TWS sessionizer == batch gaps-and-islands (watermark-closed set)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
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
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

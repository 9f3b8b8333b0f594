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
}

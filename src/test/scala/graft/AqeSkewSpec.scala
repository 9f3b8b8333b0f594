package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Proof that the claimed AQE runtime re-plan actually fires here:
  * Skew.scala's scale notes lean on `spark.sql.adaptive.skewJoin` for
  * the join-side hot-key case (salting covers the aggregation cases AQE
  * can't split). This spec builds a join whose left side concentrates
  * ~90% of rows on one key, forces a sort-merge join, and asserts the
  * FINAL adaptive plan marked the skewed side (`skew=true` on the SMJ) —
  * i.e. the hot partition was split at runtime, not sorted on one task.
  */
class AqeSkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val prior = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // Thresholds scaled to test data: a real cluster uses the 256 MiB
      // defaults; the MECHANISM under test is identical.
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import spark.implicits._
      val hot = spark.range(200000L)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val dim = spark.range(1000L).select(col("id").as("k"),
        (col("id") * 7).as("attr"))
      val joined = hot.join(dim, "k")
      // 180000 hot-key matches + the 100 cold ids (…9) under 1000
      assert(joined.count() == 180100L)
      // Execute THIS queryExecution (count() above planned a separate
      // aggregate query) so AQE finalizes its stages, then inspect the
      // final adaptive plan — the WindowLint pattern.
      val qe = joined.queryExecution
      val rows = qe.executedPlan.execute().count()
      assert(rows == 180100L)
      val finalPlan = qe.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-handled join in the final adaptive plan:\n$finalPlan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

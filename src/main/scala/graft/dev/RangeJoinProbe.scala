package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the cliff RangeJoinRewrite removes: the naive theta
  * (nested-loop) form of q_join_overlap vs the rewritten bucketized
  * form, across scale factors. Usage:
  * `runMain graft.dev.RangeJoinProbe [sfDir ...]` (default all three).
  * Prints best-of-3 warm seconds per (sf, variant). */
object RangeJoinProbe {
  def naive(s: SparkSession, dir: String): DataFrame = {
    val o = graft.Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = graft.Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R" && col("l_quantity") <= 2)
      .select(col("l_orderkey"), col("l_shipdate"))
    li.join(o,
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 3 DAYS") &&
          col("o_orderdate") <= col("l_shipdate") + expr("INTERVAL 2 DAYS"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_overlap"))
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(label: String, mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-40s best=${ts.min}%.2f s  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    dirs.foreach { d =>
      time(s"naive-theta $d", naive(spark, d))
      time(s"rewritten  $d",
        graft.plans.RangeJoinRewrite.applied(spark, naive(spark, d), 4 * 86400.0))
    }
    spark.stop()
  }
}

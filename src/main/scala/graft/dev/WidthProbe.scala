package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off width sweep for the auto range-join bucket width: times the
  * q_join_range_auto point-in-interval shape and the q_join_overlap
  * two-interval shape at several bucket widths, to pick the auto
  * heuristic on measurement rather than folklore (dev tooling). */
object WidthProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def pointShape: DataFrame = {
      val o = graft.Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      val li = graft.Tables.lineitem(spark, dir)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_shipdate"))
      li.join(o,
          col("l_shipdate") >= col("o_orderdate") - expr("INTERVAL 2 DAYS") &&
            col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 2 DAYS"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
    }
    def time(label: String, mk: => DataFrame): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); mk.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-30s best=${ts.min}%.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    val W = 4 * 86400.0 // proven interval width of the +-2d shape
    Seq(W, W / 2, W / 4, W / 8, W / 16).foreach { w =>
      time(f"point width=${w / 86400}%.2fd",
        graft.plans.RangeJoinRewrite.applied(spark, pointShape, w))
    }
    Seq(W, W / 2, W / 4, W / 8).foreach { w =>
      time(f"overlap width=${w / 86400}%.2fd",
        graft.plans.RangeJoinRewrite.applied(spark, RangeJoinProbe.naive(spark, dir), w))
    }
    spark.stop()
  }
}

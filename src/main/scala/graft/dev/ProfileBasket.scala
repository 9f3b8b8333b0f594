package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for q_basket_lift: times the basket aggregation,
  * the exploded count, and the full query separately to locate the
  * dominant cost (dev tooling, not part of the library). */
object ProfileBasket {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Long): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
        spark.sharedState.cacheManager.clearCache()
      }
    val li = graft.Tables.lineitem(spark, sfDir)
    time("scan_only") {
      li.select(col("l_orderkey"), col("l_partkey")).count()
    }
    time("baskets") {
      li.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("docs")).count()
    }
    time("explode_noagg") {
      li.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("docs"))
        .select(explode(concat(
          graft.plans.GraftExpressions.sorted_pairs(col("docs")),
          expr("transform(docs, d -> struct(d AS d1, -1L AS d2))"),
          expr("array(struct(-1L AS d1, -1L AS d2))"))).as("p"))
        .count()
    }
    time("counts_frame") {
      li.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("docs"))
        .select(explode(concat(
          graft.plans.GraftExpressions.sorted_pairs(col("docs")),
          expr("transform(docs, d -> struct(d AS d1, -1L AS d2))"),
          expr("array(struct(-1L AS d1, -1L AS d2))"))).as("p"))
        .groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
        .agg(count(lit(1)).as("c"))
        .count()
    }
    time("counts_packed") {
      li.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("docs"))
        .select(explode(concat(
          graft.plans.GraftExpressions.sorted_pairs(col("docs")),
          expr("transform(docs, d -> struct(d AS d1, -1L AS d2))"),
          expr("array(struct(-1L AS d1, -1L AS d2))"))).as("p"))
        .select(shiftleft(col("p.d1"), 32)
          .bitwiseOR(col("p.d2").bitwiseAND(lit(0xFFFFFFFFL))).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
        .count()
    }
    time("full") {
      graft.operators.Relational.qBasketLift(spark, sfDir).count()
    }
    spark.stop()
  }
}

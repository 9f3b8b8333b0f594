package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: interleaved fan-WIDTH sweep over the queries that carry an
  * uncapped Tables.fanOut exchange (VERDICT r21 #2: the driver's 8-core
  * artifact ran the whole batch 21% faster than 32-core — explicit
  * widths at defaultParallelism overshoot at this SF). Widths alternate
  * within one JVM via [[graft.Tables.fanParOverride]] so box storms hit
  * every arm equally; width 0 means fan-out disabled.
  *
  * Usage: runMain graft.dev.FanWidthSweep [query ...]
  */
object FanWidthSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Verify.muteBoundedWindowWarnings()
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val sample =
      if (args.nonEmpty) args.toSeq
      else Seq(
        "q_basket_lift", "q21_late_suppliers", "q_join_range",
        "q_join_range_auto", "q_stats_cov", "q_multimodal_decode",
        "q_multimodal_imagedup", "q_scrape_s3", "q_dedup_substring")
    val widths = Seq(0, 4, 8, 16, 32)
    val n = 4
    val best = scala.collection.mutable.Map.empty[(Int, String), Double]
      .withDefaultValue(Double.MaxValue)
    // one warm pass (plan compile + page cache) before any timed arm
    sample.foreach(q => graft.SparkEntry.queries(q)(spark, sfDir).count())
    spark.sharedState.cacheManager.clearCache()
    for (_ <- 1 to n; q <- sample; w <- widths) {
      graft.Tables.fanOutEnabled = w > 0
      graft.Tables.fanParOverride = if (w > 0) Some(w) else None
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      best((w, q)) = math.min(best((w, q)), t)
    }
    graft.Tables.fanOutEnabled = true
    graft.Tables.fanParOverride = None
    println(f"[fanwidth] ${"query"}%-24s " +
      widths.map(w => f"w$w%-2d    ").mkString(" "))
    sample.foreach { q =>
      val row = widths.map(w => f"${best((w, q))}%6.3f").mkString(" ")
      val bw = widths.minBy(w => best((w, q)))
      println(f"[fanwidth] $q%-24s $row  best=w$bw")
    }
    widths.foreach { w =>
      val tot = sample.map(q => best((w, q))).sum
      println(f"[fanwidth] TOTAL w$w%-2d = $tot%7.3f")
    }
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: interleaved A/B of the r21 cache-pin toggle
  * (Tables.eagerPinEnabled) over a query sample —
  * `AbToggles pin [query...]`. (ADVICE r21: the formerly-advertised
  * `widen` arm never existed; for fan-width sweeps use
  * dev.FanWidthSweep.) */
object AbToggles {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val which = args(0)
    val sample = args.drop(1).toSeq
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Verify.muteBoundedWindowWarnings()
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def set(v: Boolean): Unit = which match {
      case "pin" => graft.Tables.eagerPinEnabled = v
    }
    val n = 4
    val best = scala.collection.mutable.Map.empty[(Boolean, String), Double]
      .withDefaultValue(Double.MaxValue)
    sample.foreach(q => graft.SparkEntry.queries(q)(spark, sfDir).count())
    spark.sharedState.cacheManager.clearCache()
    for (q <- sample; _ <- 1 to n; arm <- Seq(true, false)) {
      set(arm)
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      best((arm, q)) = math.min(best((arm, q)), t)
    }
    set(true)
    var (ton, toff) = (0.0, 0.0)
    sample.foreach { q =>
      val (a, b) = (best((true, q)), best((false, q)))
      ton += a; toff += b
      println(f"[$which] $q%-24s on=$a%6.3f  off=$b%6.3f  delta=${b - a}%+7.3f")
    }
    println(f"[$which] TOTAL on=$ton%7.3f  off=$toff%7.3f")
    spark.stop()
  }
}

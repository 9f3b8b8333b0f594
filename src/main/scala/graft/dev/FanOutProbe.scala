package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: A/B the Tables scan fan-out (single-row-group fixture files
  * give every scan exactly one task — see Tables.fanOut) against the
  * plain scan, interleaved so JVM warmup affects both arms equally.
  */
object FanOutProbe {
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
        // heavy documents consumers
        "q_multimodal_decode", "q_multimodal_imagedup", "q_multimodal_audio",
        "q_dedup_ngram", "q_dedup_substring", "q_dedup_minhash_recall",
        "q_text_novelty", "q_boilerplate", "q_vocab_overlap",
        // heavy lineitem consumers
        "q_stats_cov", "q_gini_nation", "q_weighted_median", "q_basket_lift",
        "q21_late_suppliers", "q16_supplier_variety", "q_join_range_auto",
        // embeddings / events
        "q_capstone_hybrid", "q_emb_inertia", "q_event_transitions",
        "q_funnel_steps",
        // floor queries (added-exchange cost check)
        "q1_agg", "q12_shipmode", "q14_promo", "q_map_funcs", "q_pivot",
        "q_hist_bins", "q_sample_hash", "q_window_share")
    val arms = Seq(true, false)
    val n = 4
    val best = scala.collection.mutable.Map.empty[(Boolean, String), Double]
      .withDefaultValue(Double.MaxValue)
    sample.foreach(q => graft.SparkEntry.queries(q)(spark, sfDir).count())
    spark.sharedState.cacheManager.clearCache()
    for (q <- sample; _ <- 1 to n; arm <- arms) {
      graft.Tables.fanOutEnabled = arm
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      best((arm, q)) = math.min(best((arm, q)), t)
    }
    graft.Tables.fanOutEnabled = true
    var (ton, toff) = (0.0, 0.0)
    sample.foreach { q =>
      val (a, b) = (best((true, q)), best((false, q)))
      ton += a; toff += b
      println(f"[fanout] $q%-24s on=$a%6.3f  off=$b%6.3f  delta=${b - a}%+7.3f")
    }
    println(f"[fanout] TOTAL on=$ton%7.3f  off=$toff%7.3f")
    spark.stop()
  }
}

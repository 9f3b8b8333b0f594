package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: print the RAW quality numbers behind the companion queries'
  * thresholded booleans (q_dedup_minhash_recall, q_dedup_simhash_recall,
  * q_sim_lsh_recall, q_sim_ivf_recall, q_agg_*_check,
  * q_percentiles_check), so the gates can be re-validated against any
  * fixture regeneration. Usage: runMain graft.dev.RecallProbe [sfDir]. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(s"=== $dir ===")
    for (n <- Seq("q_dedup_minhash_recall", "q_dedup_simhash_recall",
        "q_sim_lsh_recall", "q_sim_ivf_recall",
        "q_agg_approx_check", "q_agg_hll_check", "q_percentiles_check")) {
      println(s"-- $n")
      graft.SparkEntry.queries(n)(spark, dir).show(20, truncate = false)
      spark.sharedState.cacheManager.clearCache()
    }
    // Raw recalls (the numbers the booleans threshold)
    val lshHit = graft.functions.Similarity.lshTop3(spark, dir)
      .select("probe_id", "neighbor_id")
      .join(graft.functions.Similarity.bruteRanked(spark, dir)
        .filter(col("rank") <= 3).select("probe_id", "neighbor_id"),
        Seq("probe_id", "neighbor_id"), "left_semi").count()
    val truth = graft.functions.Similarity.bruteRanked(spark, dir)
      .filter(col("rank") <= 3).count()
    println(s"lsh raw recall@3 = ${lshHit.toDouble / truth} ($lshHit/$truth)")
    spark.sharedState.cacheManager.clearCache()
    val ivfHit = graft.functions.Similarity.ivfTop3(spark, dir)
      .select("probe_id", "neighbor_id")
      .join(graft.functions.Similarity.bruteRanked(spark, dir)
        .filter(col("rank") <= 3).select("probe_id", "neighbor_id"),
        Seq("probe_id", "neighbor_id"), "left_semi").count()
    println(s"ivf raw recall@3 = ${ivfHit.toDouble / truth} ($ivfHit/$truth)")
    spark.sharedState.cacheManager.clearCache()
    val mh = graft.operators.Dedup.minhashPairs(spark, dir).count()
    println(s"minhash pairs found = $mh")
    spark.sharedState.cacheManager.clearCache()
    val sh = graft.operators.Dedup.simhashPairs(spark, dir)
      .filter(col("d2") >= 200000 && col("d1") === col("d2") - 200000).count()
    println(s"simhash near-copy tier hits = $sh")
    spark.stop()
  }
}

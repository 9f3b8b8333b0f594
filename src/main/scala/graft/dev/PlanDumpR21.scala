package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: write `explain("formatted")` for the named queries to
  * per-query files (the r21 optimization round's before/after plan
  * evidence — `plans/r21/<query>_<suffix>.txt`).
  *
  * Usage: PlanDumpR21 OUTDIR SUFFIX [sfDir] [query...]
  * (defaults: all r21-touched queries at /root/testdata/sf0.1). */
object PlanDumpR21 {
  val touched: Seq[String] = Seq(
    "q_dedup_minhash_recall", "q_dedup_minhash", "q_gini_nation",
    "q_weighted_median", "q_capstone_entity", "q_multimodal_imagedup",
    "q_multimodal_decode", "q_dedup_substring", "q_dedup_ngram",
    "q_dedup_containment", "q_dedup_clusters", "q_split_leakfree",
    "q_dedup_winnow", "q_dedup_simhash_recall", "q_dedup_simhash",
    "q_dedup_snm", "q_graph_triangles", "q_basket_lift", "q_scrape_s3",
    "q_graph_lpa")

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val names = if (args.length > 3) args.drop(3).toSeq else touched
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plandump] wrote ${n}_$suffix.txt")
        spark.sharedState.cacheManager.clearCache()
      } catch { case e: Throwable =>
        println(s"[plandump] FAILED $n: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: cold/warm timing for the ngram pair pipeline vs the full
  * clusters query, to separate union-find cost from pair-gen cost. */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val nrows = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s (n=$nrows)")
    }
    for (i <- 1 to 2) {
      println(s"--- pass $i")
      time("ngram query")(graft.SparkEntry.queries("q_dedup_ngram")(spark, sfDir).count())
      spark.sharedState.cacheManager.clearCache()
      time("clusters query")(graft.SparkEntry.queries("q_dedup_clusters")(spark, sfDir).count())
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}

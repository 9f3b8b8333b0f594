package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: reproduce bench-order conditions for q_dedup_ngram. */
object ProfileNgram {
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
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => }
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-22s ${(System.nanoTime()-t0)/1e9}%7.2f s")
    }
    val q = graft.SparkEntry.queries
    time("q_text_stats")(q("q_text_stats")(spark, sfDir).count())
    time("q_agg_cube")(q("q_agg_cube")(spark, sfDir).count())
    time("q_dedup_minhash")(q("q_dedup_minhash")(spark, sfDir).count())
    time("q_dedup_ngram")(q("q_dedup_ngram")(spark, sfDir).count())
    time("q_dedup_ngram warm")(q("q_dedup_ngram")(spark, sfDir).count())
    spark.stop()
  }
}

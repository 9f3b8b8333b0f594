package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: bench-order cold+warm timing probe for hot queries. */
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
    Seq("documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").count()
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-22s ${(System.nanoTime()-t0)/1e9}%7.2f s")
    }
    val q = graft.SparkEntry.queries
    for (name <- args) {
      time(name + " cold")(q(name)(spark, sfDir).count())
      time(name + " warm")(q(name)(spark, sfDir).count())
    }
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: timing for the triangle census. */
object ProfileTri {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.operators.Graph.qGraphTriangles(spark, "/root/testdata/sf0.1").collect()
      println(f"pass $i: ${(System.nanoTime() - t0) / 1e9}%5.2f s")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}

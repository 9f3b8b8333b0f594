package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: warm per-query timings (2 runs, report 2nd) to separate real
  * plan cost from JVM/session warmup. Not part of the driver contract. */
object ProfileBench {
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
    // Same dev-only subset filter as graft.Verify (comma-separated names).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(names) => graft.SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => graft.SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); val warm = once()
      println(f"$name%-26s cold=$cold%7.2f warm=$warm%7.2f")
      name -> warm
    }
    println(f"TOTAL warm=${results.map(_._2).sum}%.1f")
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._

/** Dev-only: per-iteration timing of the connected-components recurrence
  * to separate shuffle cost from replan cost. */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    for (round <- 1 to 2) {
      spark.sharedState.cacheManager.clearCache()
      println(s"--- round $round")
      val nodes = documents(spark, sfDir).select(col("doc_id").as("id"))
      val fwd = nodes
        .filter(col("id") % 7 =!= 6 && col("id") % 11 =!= 10)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
        .join(nodes.select(col("id").as("dst")), "dst")
      val e = fwd.select("src", "dst")
        .union(fwd.select(col("dst").as("src"), col("src").as("dst")))
        .union(nodes.select(col("id").as("src"), col("id").as("dst")))
        .cache()
      time("edges materialize")(e.count())
      var lab = nodes.select(col("id"), col("id").as("lab"))
      for (i <- 1 to 6) {
        lab = e.join(lab.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id")).agg(min(col("lab")).as("lab"))
        time(s"iter $i count")(lab.count())
      }
      time("final agg")(
        lab.groupBy(col("lab").as("component"))
          .agg(count(lit(1)).as("n_nodes"), max(col("id")).as("max_id"))
          .orderBy("component").count())
      e.unpersist()
    }
    spark.stop()
  }
}

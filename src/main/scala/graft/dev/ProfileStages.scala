package graft.dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the ngram dedup pipeline. */
object ProfileStages {
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
    spark.read.parquet(s"$sfDir/documents.parquet").count()
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    import graft.operators.Dedup
    for (_ <- 1 to 2) {
      spark.sharedState.cacheManager.clearCache()
      val c = Dedup.corpus(spark, sfDir)
      time("corpus count")(c.count())
      time("shingles only")(
        c.select(explode(Dedup.shingles(col("text"))).as("g")).count())
      val g = c.select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("gram_s"))
        .select(col("doc_id"), xxhash64(col("gram_s")).as("gram"))
      time("explode+hash")(g.count())
      time("groupBy collect_list")(
        g.groupBy("gram").agg(collect_list(col("doc_id")).as("docs"))
          .filter(size(col("docs")) <= 20).count())
      val byGram = g.groupBy("gram")
        .agg(graft.functions.CappedCollect.cappedList(20)(col("doc_id")).as("docs"))
        .filter(size(col("docs")) >= 1)
      time("groupBy capped-list")(byGram.count())
      val cached = byGram.cache()
      time("cache materialize")(cached.count())
      val sizes = cached.select(explode(col("docs")).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      time("sizes")(sizes.count())
      val pairs = cached.select(explode(
        graft.plans.GraftExpressions.sorted_pairs(col("docs"))).as("p"))
      time("pairs explode")(pairs.count())
      val inter = pairs.groupBy(col("p.d1").as("d1"), col("p.d2").as("d2"))
        .agg(count(lit(1)).as("n_inter"))
      time("inter groupBy")(inter.count())
      time("full q_dedup_ngram")(Dedup.qDedupNgram(spark, sfDir).count())
      cached.unpersist()
    }
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: interleaved A/B of the r21 shared-shingle minhash_recall
  * against the r20 shape (both pipelines re-deriving corpus+shingles),
  * in one session so JVM warmth is equal (the FloorProbe discipline). */
object AbRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import graft.operators.Dedup

    // r20 shape, inlined: truth via interOfCorpus (fresh scan+shingle),
    // LSH via its own cached sigs frame (fresh scan+shingle).
    def oldRecall(s: SparkSession, dir: String): DataFrame = {
      val exact = Dedup.minhashExactTruth(s, dir).cache()
      val found = Dedup.minhashPairs(s, dir).select("d1", "d2").cache()
      val hit = found.join(exact, Seq("d1", "d2"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(found.agg(count(lit(1)).as("n_found")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(col("n_exact"),
          (col("n_found") === col("n_hit")).as("precision_ok"),
          (col("n_hit") * 10 >= col("n_exact") * 9).as("recall_ok"))
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "new" -> (() => Dedup.qDedupMinhashRecall(spark, sfDir)),
      "old" -> (() => oldRecall(spark, sfDir)))
    val n = 5
    val best = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(Double.MaxValue)
    arms.foreach { case (_, f) => f().count() }
    spark.sharedState.cacheManager.clearCache()
    for (_ <- 1 to n; (label, f) <- arms) {
      val t0 = System.nanoTime()
      f().count()
      val t = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      best(label) = math.min(best(label), t)
      println(f"[ab] $label $t%.3f")
    }
    arms.foreach { case (l, _) => println(f"[ab] BEST $l ${best(l)}%.3f s") }
    spark.stop()
  }
}

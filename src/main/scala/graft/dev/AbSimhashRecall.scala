package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: interleaved A/B of q_dedup_simhash_recall's grading tail —
  * r21 shape (cached+pinned `found`, three concurrent consumers, two
  * crossJoin towers) vs the r22 collapse (one full-outer marker tower,
  * `found` consumed once, no cache/pin). Equality-gated before timing.
  */
object AbSimhashRecall {
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

    // the r21 shape, reconstructed with independent per-site pin arms
    def old(dir: String, pinFp: Boolean = true, pinFound: Boolean = true)
        : DataFrame = {
      val d = graft.Tables.documents(spark, dir)
      val exactTruth = d.filter(col("doc_id") < 50)
        .select(col("doc_id").as("d1"), (col("doc_id") + 100000).as("d2"))
      val fp = Dedup.simhashFps(spark, dir)
      if (pinFp) fp.count()
      val found = Dedup.simhashPairsOf(fp).select("d1", "d2").cache()
      if (pinFound) found.count()
      val exactHit = exactTruth.join(found, Seq("d1", "d2"), "left_semi")
      val exactRow = exactTruth.agg(count(lit(1)).as("n_truth"))
        .crossJoin(exactHit.agg(count(lit(1)).as("n_hit")))
        .select(lit("exact_copy").as("tier"), col("n_truth").as("n_ref"),
          (col("n_hit") === col("n_truth")).as("ok"))
      val brute = fp.as("x").join(fp.as("y"), col("x.doc_id") < col("y.doc_id"))
        .filter(bit_count(col("x.fp").bitwiseXOR(col("y.fp"))) <= 3)
      val blockRow = fp.agg(count(lit(1)).as("n_corpus"))
        .crossJoin(brute.agg(count(lit(1)).as("n_brute")))
        .crossJoin(found.agg(count(lit(1)).as("n_blocked")))
        .select(lit("radius3_complete").as("tier"), col("n_corpus").as("n_ref"),
          (col("n_brute") === col("n_blocked")).as("ok"))
      exactRow.union(blockRow).orderBy("tier")
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "none" -> (() => old(sfDir, pinFp = false, pinFound = false)),
      "fp_only" -> (() => old(sfDir, pinFp = true, pinFound = false)),
      "found_only" -> (() => old(sfDir, pinFp = false, pinFound = true)),
      "both" -> (() => old(sfDir, pinFp = true, pinFound = true)))

    val refRows = arms.head._2().collect().map(_.toString).toSeq
    spark.sharedState.cacheManager.clearCache()
    val got = arms(1)._2().collect().map(_.toString).toSeq
    require(got == refRows, s"old differs: $got vs $refRows")
    println("[ab] outputs identical")
    spark.sharedState.cacheManager.clearCache()

    val n = 6
    val best = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(Double.MaxValue)
    val wins = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for (i <- 1 to n) {
      val round = arms.map { case (label, f) =>
        val t0 = System.nanoTime()
        f().count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        best(label) = math.min(best(label), t)
        label -> t
      }
      wins(round.minBy(_._2)._1) += 1
      println(round.map { case (l, t) => f"$l=$t%.3f" }.mkString(s"[ab] r$i ", "  ", ""))
    }
    arms.foreach { case (l, _) =>
      println(f"[ab] BEST $l ${best(l)}%.3f  wins=${wins(l)}")
    }
    spark.stop()
  }
}

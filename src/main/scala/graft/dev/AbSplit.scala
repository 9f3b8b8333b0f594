package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: interleaved A/B of q_split_leakfree's grading tail
  * (r21 wave 4). The shipped shape consumes the fact-scale
  * doc→rep→split frame TWICE (leak aggregate + per-split counts),
  * re-running the docs⋈clusters join and paying a fact-scale
  * countDistinct each time. Candidate: ONE pass into a tiny cached
  * (rep, split, cnt) frame — rows are distinct (rep, split) pairs, so
  * the leak check (reps with ≥2 rows) and the per-split counts
  * (sum cnt / row count) read bounded per-cluster state. Equality
  * gated before timing; leak detection stays honest (any rep in two
  * splits still produces two rows).
  *
  * VERDICT (r21, sf0.1, interleaved best-of-5): preagg LOSES 5/5
  * rounds, best 2.24 vs 2.05 s — the added cache+pin job and the
  * (rep, split) exchange cost more than the saved second pass, because
  * the doubled pass is only a one-column docs scan + broadcast join +
  * md5 projection (the pair pipeline behind `clusters` is built once
  * either way). NOT shipped; the shipped two-consumer shape stands.
  */
object AbSplit {
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

    def candidate(dir: String): DataFrame = {
      val docs = Dedup.corpus(spark, dir).select(col("doc_id"))
      val clusters = Dedup.clustersOf(spark,
        Dedup.ngramPairs(spark, dir).select(col("d1"), col("d2")))
      val rep = docs.join(clusters, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("rep"))
      val h = md5(concat(lit("spl"), col("rep").cast("string")))
      val sp = rep.withColumn("split",
        when(h < "cc", lit("train")).when(h < "e6", lit("val"))
          .otherwise(lit("test")))
      val g = sp.groupBy(col("rep"), col("split"))
        .agg(count(lit(1)).as("cnt"))
        .cache()
      graft.Tables.pin(g)
      val leak = g.groupBy(col("rep"))
        .agg(count(lit(1)).as("n_splits"))
        .filter(col("n_splits") > 1)
        .agg(count(lit(1)).as("leaky_clusters"))
      g.groupBy(col("split"))
        .agg(coalesce(sum(col("cnt")), lit(0L)).as("n_docs"),
          count(lit(1)).as("n_clusters"))
        .crossJoin(broadcast(leak))
        .select(col("split"), col("n_docs"), col("n_clusters"),
          col("leaky_clusters"))
        .orderBy("split")
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "cur" -> (() => Dedup.qSplitLeakfree(spark, sfDir)),
      "preagg" -> (() => candidate(sfDir)))

    val ref = arms.head._2()
    val refRows = ref.collect().map(_.toString).toSeq
    println("[ab] cur schema: " + ref.schema.map(f => s"${f.name}:${f.dataType.simpleString}:${f.nullable}").mkString(","))
    arms.tail.foreach { case (label, f) =>
      val df = f()
      println(s"[ab] $label schema: " + df.schema.map(f2 => s"${f2.name}:${f2.dataType.simpleString}:${f2.nullable}").mkString(","))
      val got = df.collect().map(_.toString).toSeq
      require(got == refRows, s"$label output differs from cur")
      println(s"[ab] $label output identical (${refRows.size} rows)")
    }
    spark.sharedState.cacheManager.clearCache()

    val n = 5
    val best = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(Double.MaxValue)
    for (_ <- 1 to n; (label, f) <- arms) {
      val t0 = System.nanoTime()
      f().count()
      val t = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      best(label) = math.min(best(label), t)
      println(f"[ab] $label $t%.3f")
    }
    arms.foreach { case (label, _) => println(f"[ab] BEST $label ${best(label)}%.3f") }
    spark.stop()
  }
}

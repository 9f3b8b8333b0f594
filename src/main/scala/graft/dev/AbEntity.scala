package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: interleaved A/B of q_capstone_entity's cache width (r21
  * wave 4). JobProfile shows the deletion-key explode + xxhash map
  * (the `keyed` pipeline) running as ONE 0.47 s 2-task stage over the
  * narrow cached dimension; the r21 scan-level fan measured −0.16 s
  * (the extra scan exchange beat the win), but repartitioning the
  * frame JUST BEFORE the cache moves the exchange to cache-build time
  * (paid once, inside the same pin) while every cache consumer —
  * blocking explode, survivorship window, the two verify joins — reads
  * it wide. Arms: cur / rep8 / rep32 (repartition width before cache).
  */
object AbEntity {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import org.apache.spark.sql.expressions.Window
    import graft.operators.{Capstone, Dedup}
    import graft.Tables

    def entityFrame(dir: String): DataFrame = {
      val base = Tables.customer(spark, dir).select(
        col("c_custkey").cast("bigint").as("ekey"), col("c_name").as("name"),
        col("c_nationkey").as("nation"), col("c_acctbal").as("acctbal"))
      val variants = base.filter(col("ekey") % 3 === 0 && col("ekey") < 90000)
        .select((col("ekey") + 1099511627776L).as("ekey"),
          expr("concat(substring(name, 1, 10), substring(name, 12))").as("name"),
          col("nation"), (col("acctbal") + 37.5).as("acctbal"))
      base.union(variants)
    }

    def resolveWide(width: Int)(dir: String): DataFrame = {
      val entities = entityFrame(dir).repartition(width).cache()
      val keyed = entities.select(col("nation"), col("ekey"),
        explode(expr(
          "array_distinct(concat(array(name), transform(sequence(1, length(name))," +
            " i -> concat(substring(name, 1, i - 1), substring(name, i + 1)))))"))
          .as("bkey"))
        .select(col("nation"), xxhash64(col("bkey")).as("bk"), col("ekey"))
      val cand = keyed.groupBy(col("nation"), col("bk"))
        .agg(collect_list(col("ekey")).as("es"))
        .filter(size(col("es")) >= 2)
        .select(explode(
          graft.plans.GraftExpressions.sorted_pairs(col("es"))).as("p"))
        .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
        .distinct()
      val pairs = cand
        .join(entities.select(col("ekey").as("d1"), col("name").as("n1")), "d1")
        .join(entities.select(col("ekey").as("d2"), col("name").as("n2")), "d2")
        .filter(levenshtein(col("n1"), col("n2")) <= 1 &&
          length(col("n1")) =!= length(col("n2")))
        .select(col("d1"), col("d2"))
      val clusters = Dedup.clustersOf(spark, pairs)
      val resolved = entities
        .join(clusters.withColumnRenamed("doc_id", "ekey"), Seq("ekey"))
      val w = Window.partitionBy("cluster_id")
        .orderBy(col("acctbal").desc, col("ekey"))
      val golden = resolved.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("cluster_id"), col("ekey").as("golden_key"),
          col("name").as("golden_name"), col("acctbal").as("golden_acctbal"))
      val sizes = resolved.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_records"))
      golden.join(sizes, Seq("cluster_id"))
        .select(col("cluster_id"), col("n_records"), col("golden_key"),
          col("golden_name"), col("golden_acctbal"))
        .orderBy("cluster_id")
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "cur" -> (() => Capstone.qCapstoneEntity(spark, sfDir)),
      "rep8" -> (() => resolveWide(8)(sfDir)),
      "rep32" -> (() => resolveWide(32)(sfDir)))

    val refRows = arms.head._2().collect().map(_.toString).toSeq
    arms.tail.foreach { case (label, f) =>
      val got = f().collect().map(_.toString).toSeq
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

package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only re-validation of the two r21 claims the driver artifact did
  * not corroborate (VERDICT r21 #6): q_graph_lpa's window→min(struct)
  * rewrite (driver read 0.85×, drift band) and q_weighted_median's lazy
  * bounds (claimed 1.63→1.04, driver flat 1.58). Each query runs its
  * SHIPPED shape against the reconstructed r20 shape, interleaved,
  * equality-gated — recorded either way in OPTIMIZATION_r22.md. */
object AbReval {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import graft.operators.Graph
    import graft.Tables

    // --- q_graph_lpa: r20 per-round top-1 window shape ----------------
    def lpaWindow(dir: String): DataFrame = {
      val nodes = Tables.documents(spark, dir).select(col("doc_id").as("id"))
      val edges = Graph.synthEdges(nodes)
      val und = edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      val e = und.select(col("a").as("src"), col("b").as("dst"))
        .union(und.select(col("b").as("src"), col("a").as("dst")))
        .union(nodes.select(col("id").as("src"), col("id").as("dst")))
        .cache()
      var lab = nodes.select(col("id"), col("id").as("lab"))
      for (_ <- 1 to 3) {
        lab = e.join(lab.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id"), col("lab"))
          .agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("id")).orderBy(desc("c"), asc("lab"))))
          .filter(col("rn") === 1)
          .select(col("id"), col("lab"))
      }
      lab.groupBy(col("lab").as("community"))
        .agg(count(lit(1)).as("n_nodes"), min(col("id")).as("min_id"),
          max(col("id")).as("max_id"))
        .orderBy("community")
    }

    // --- q_weighted_median: r20 eager-bounds shape ---------------------
    // (body mirrors Quant.qWeightedMedian with the ONE r21 change undone:
    // bounds come from an eager agg(min,max).first() over the joined
    // frame — an extra full pass + driver round-trip — instead of the
    // broadcast one-row aggregate over the raw fact column.)
    def wmedianEager(dir: String): DataFrame = {
      val sup = Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_nationkey"))
      val n = Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))
      val li = Tables.lineitem(spark, dir)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          Tables.cents(col("l_extendedprice")).as("price_cents"),
          round(col("l_quantity")).cast("bigint").as("wt"))
      val joined = li
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      val r = joined.agg(min(col("price_cents")), max(col("price_cents"))).first()
      val (lo, hi) = (r.getLong(0), r.getLong(1))
      val span = math.max(hi - lo, 1L)
      val shift = math.max(64 - java.lang.Long.numberOfLeadingZeros(span) - 8, 0)
      val rows = joined
        .withColumn("__bkt", expr(s"shiftright(price_cents - ${lo}L, $shift)"))
      val withinW = Window.partitionBy(col("n_name"), col("__bkt"))
        .orderBy(col("price_cents"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offW = Window.partitionBy(col("n_name")).orderBy(col("__bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bucketAgg = rows.groupBy(col("n_name"), col("__bkt"))
        .agg(sum(col("wt")).as("__w"))
      val offsets = bucketAgg
        .withColumn("__off", coalesce(sum(col("__w")).over(offW), lit(0L)))
      val tot = bucketAgg.groupBy(col("n_name")).agg(sum(col("__w")).as("tot_wt"))
      val target = offsets.join(tot, "n_name")
        .filter(col("__off") * 2 < col("tot_wt") &&
          (col("__off") + col("__w")) * 2 >= col("tot_wt"))
        .select(col("n_name"), col("__bkt"), col("__off"), col("tot_wt"))
      rows.join(broadcast(target), Seq("n_name", "__bkt"))
        .withColumn("cumw", col("__off") + sum(col("wt")).over(withinW))
        .filter(col("cumw") * 2 >= col("tot_wt"))
        .groupBy(col("n_name"), col("tot_wt"))
        .agg(min(col("price_cents")).as("wmedian_cents"))
        .select(col("n_name"), col("tot_wt"), col("wmedian_cents"))
        .orderBy("n_name")
    }

    val pairs: Seq[(String, () => DataFrame, () => DataFrame)] = Seq(
      ("lpa", () => Graph.qGraphLpa(spark, sfDir), () => lpaWindow(sfDir)),
      ("wmedian",
        () => graft.operators.Quant.qWeightedMedian(spark, sfDir),
        () => wmedianEager(sfDir)))

    pairs.foreach { case (name, cur, old) =>
      val a = cur().collect().map(_.toString).toSeq
      spark.sharedState.cacheManager.clearCache()
      val b = old().collect().map(_.toString).toSeq
      spark.sharedState.cacheManager.clearCache()
      require(a == b, s"$name old shape output differs")
      println(s"[reval] $name outputs identical")
    }

    val n = 6
    val best = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(Double.MaxValue)
    val wins = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
    for (i <- 1 to n; (name, cur, old) <- pairs) {
      val round = Seq(s"$name.cur" -> cur, s"$name.old" -> old).map {
        case (label, f) =>
          val t0 = System.nanoTime()
          f().count()
          val t = (System.nanoTime() - t0) / 1e9
          spark.sharedState.cacheManager.clearCache()
          best(label) = math.min(best(label), t)
          label -> t
      }
      wins(round.minBy(_._2)._1) += 1
      println(round.map { case (l, t) => f"$l=$t%.3f" }
        .mkString(s"[reval] r$i ", "  ", ""))
    }
    best.toSeq.sorted.foreach { case (l, t) =>
      println(f"[reval] BEST $l $t%.3f wins=${wins(l)}")
    }
    spark.stop()
  }
}

package graft.dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: interleaved A/B of q_graph_lpa round shapes (r21 wave 4).
  *
  * JobProfile shows the shipped LPA spending ~0.3 s per materialized
  * exchange, two per round (the (dst,lab) count exchange + the
  * per-node window's id exchange with its sort). Three arms, same
  * recurrence and IDENTICAL output (checked before timing):
  *   cur     — shipped: count by (dst,lab), window top-1 per node.
  *   aggmin  — count by (dst,lab), then groupBy(id).min(struct(-c,lab)):
  *             same 2 exchanges but partial-agg + no sort/row_number.
  *   listmode— ONE exchange per round: groupBy(dst) collecting the
  *             sorted neighbor-label list, mode+tie-break computed by a
  *             linear aggregate() expression over the sorted array
  *             (bounded by degree+1 — the synthetic graph's max
  *             in-degree is small by construction).
  */
object AbLpa {
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

    def parts(dir: String): (DataFrame, DataFrame) = {
      val nodes = Tables.documents(spark, dir).select(col("doc_id").as("id"))
      (nodes, Graph.synthEdges(nodes))
    }
    def symEdges(nodes: DataFrame, edges: DataFrame): DataFrame = {
      val und = edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
      und.select(col("a").as("src"), col("b").as("dst"))
        .union(und.select(col("b").as("src"), col("a").as("dst")))
        .union(nodes.select(col("id").as("src"), col("id").as("dst")))
        .cache()
    }
    def finish(lab: DataFrame): DataFrame =
      lab.groupBy(col("lab").as("community"))
        .agg(count(lit(1)).as("n_nodes"), min(col("id")).as("min_id"),
          max(col("id")).as("max_id"))
        .orderBy("community")

    def lpaAggMin(dir: String): DataFrame = {
      val (nodes, edges) = parts(dir)
      val e = symEdges(nodes, edges)
      var lab = nodes.select(col("id"), col("id").as("lab"))
      for (_ <- 1 to 3) {
        lab = e.join(lab.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id"), col("lab"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("id"))
          .agg(min(struct((-col("c")).as("nc"), col("lab").as("l"))).as("m"))
          .select(col("id"), col("m.l").as("lab"))
      }
      finish(lab)
    }

    // mode with smallest-label tie-break over a SORTED asc label array:
    // runs appear in label order; strict > keeps the earlier (smaller)
    // label on count ties.
    val modeExpr =
      """aggregate(labs,
        |  named_struct('bl', CAST(-1 AS BIGINT), 'bc', CAST(0 AS BIGINT),
        |               'cl', CAST(-1 AS BIGINT), 'cc', CAST(0 AS BIGINT)),
        |  (s, x) -> IF(x = s.cl,
        |    named_struct('bl', s.bl, 'bc', s.bc, 'cl', s.cl, 'cc', s.cc + 1L),
        |    named_struct('bl', IF(s.cc > s.bc, s.cl, s.bl),
        |                 'bc', IF(s.cc > s.bc, s.cc, s.bc),
        |                 'cl', x, 'cc', 1L)),
        |  s -> IF(s.cc > s.bc, s.cl, s.bl))""".stripMargin

    def lpaListMode(dir: String): DataFrame = {
      val (nodes, edges) = parts(dir)
      val e = symEdges(nodes, edges)
      var lab = nodes.select(col("id"), col("id").as("lab"))
      for (_ <- 1 to 3) {
        lab = e.join(lab.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id"))
          .agg(array_sort(collect_list(col("lab"))).as("labs"))
          .select(col("id"), expr(modeExpr).as("lab"))
      }
      finish(lab)
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      "cur" -> (() => Graph.qGraphLpa(spark, sfDir)),
      "aggmin" -> (() => lpaAggMin(sfDir)),
      "listmode" -> (() => lpaListMode(sfDir)))

    // Output-equality gate before any timing.
    val ref = arms.head._2().collect().map(_.toString).toSeq
    arms.tail.foreach { case (label, f) =>
      val got = f().collect().map(_.toString).toSeq
      require(got == ref, s"$label output differs from cur")
      println(s"[ab] $label output identical (${ref.size} rows)")
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

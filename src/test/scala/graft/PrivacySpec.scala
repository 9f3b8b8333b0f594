package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.Privacy]]: semantic pins beyond the DuckDB oracle
  * rows — the audit's invariants recomputed independently, and the DP
  * mechanism's determinism + noise-scale bounds. */
class PrivacySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("k-anonymity audit: invariants against an independent recomputation") {
    def lg(r: org.apache.spark.sql.Row, i: Int): Long =
      r.getAs[Number](i).longValue // c_nationkey's width varies by fixture
    val audit = SparkEntry.queries("q_privacy_audit")(spark, TestSpark.sf0001)
      .collect().map(r => lg(r, 0) ->
        (lg(r, 1), lg(r, 2), lg(r, 3), lg(r, 4), lg(r, 5), lg(r, 6)))
      .toMap
    // independent formulation: filter-then-count instead of sum(when)
    val g = Tables.customer(spark, TestSpark.sf0001)
      .groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("b"))
      .agg(count(lit(1)).as("n"), countDistinct(col("c_mktsegment")).as("l"))
      .cache()
    try {
      val risky = g.filter(col("n") < 5).groupBy("c_nationkey")
        .agg(count(lit(1)).as("ng"), sum("n").as("nr"))
        .collect().map(r => lg(r, 0) -> ((lg(r, 1), lg(r, 2)))).toMap
      val lowL = g.filter(col("l") < 3).groupBy("c_nationkey").count()
        .collect().map(r => lg(r, 0) -> lg(r, 1)).toMap
      assert(audit.nonEmpty)
      audit.foreach { case (nation, (nGroups, minK, nRiskyG, nRiskyR, minL, nLowL)) =>
        assert(minK >= 1 && minL >= 1 && minL <= minK)
        assert(nRiskyG <= nGroups && nLowL <= nGroups)
        assert(nRiskyG == risky.get(nation).map(_._1).getOrElse(0L))
        assert(nRiskyR == risky.get(nation).map(_._2).getOrElse(0L))
        assert(nLowL == lowL.getOrElse(nation, 0L))
      }
    } finally { g.unpersist(); () }
  }

  test("DP release: deterministic, bounded noise, never exact passthrough for all") {
    val q = SparkEntry.queries("q_privacy_dp")(_: org.apache.spark.sql.SparkSession,
      TestSpark.sf0001)
    val a = q(spark).collect().map(_.toString).toSeq
    val b = q(spark).collect().map(_.toString).toSeq
    assert(a == b, "same seed must give the identical release")
    val rows = q(spark).select(col("n_exact").cast("double"), col("n_noisy"))
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    // Laplace(b=10) over a 52-bit uniform: |noise| <= 10 * ln(2^52) ~ 360
    rows.foreach { case (exact, noisy) =>
      assert(math.abs(noisy - exact) <= 361.0,
        s"noise out of mechanism range: $exact -> $noisy")
    }
    // a release where every group came out EXACTLY integral would mean
    // the noise column silently degenerated
    assert(rows.exists { case (_, noisy) => noisy != math.rint(noisy) })
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis

/** q_text_heaps (bigram vocabulary growth + log-log fit) and
  * q_eval_calibration (reliability bins + ECE). */
class TextMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("heaps: both axes grow monotonically; final vocab equals the corpus bigram count") {
    val rows = TextAnalysis.qTextHeaps(spark, TestSpark.sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (1 to 10))
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._2 < b._2 && a._3 <= b._3 })
    val total = graft.Tables.documents(spark, TestSpark.sf0001)
      .select(explode(graft.plans.GraftExpressions.shingles(col("text"), 2)))
      .distinct().count()
    assert(rows.last._3 == total, s"${rows.last._3} != $total")
    // sub-linear growth: 0 < beta < 1 on this corpus
    val beta = rows.head._4
    assert(beta > 0.0 && beta < 1.0, s"beta=$beta")
  }

  test("calibration: bins partition the corpus; ECE equals the weighted gap sum") {
    val rows = TextAnalysis.qEvalCalibration(spark, TestSpark.sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    val n = rows.map(_._2).sum
    assert(n == 500L)
    rows.foreach { case (bin, _, conf, acc, gap, _) =>
      assert(bin >= 0 && bin <= 9)
      assert(conf >= 0.0 && conf <= 1.0 && acc >= 0.0 && acc <= 1.0)
      assert(gap >= 0.0 && gap <= 1.0)
    }
    // the reported ECE is the n-weighted sum of the reported gaps
    val ece = rows.map { case (_, nb, _, _, gap, _) =>
      (nb.toDouble / n) * gap }.sum
    assert(math.abs(rows.head._6 - ece) < 1e-6, s"${rows.head._6} vs $ece")
    // scores concentrate where the gate passes: the biggest bin must have
    // acc above the corpus-wide pass rate of the smallest bin
    val byN = rows.sortBy(-_._2)
    assert(byN.head._4 >= byN.last._4)
  }
}

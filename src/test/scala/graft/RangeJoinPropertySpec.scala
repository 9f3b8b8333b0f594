package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinRewrite

/** Property fuzz for [[graft.plans.RangeJoinRewrite]]: random interval
  * tables × random (width, cap) must be EXACTLY the naive theta join —
  * every trial compares full row multisets. Randomization reaches the
  * shapes the fixture tests pin individually (inverted intervals, null
  * bounds, empty overlap, cap straddling, negative domains, point vs
  * two-sided) in arbitrary combination. Small tables keep the naive
  * O(N·M) side cheap; the SEMANTICS being fuzzed don't depend on size. */
class RangeJoinPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  /** (lo, hi) pairs over a signed domain: ~10% null lo, ~10% inverted,
    * widths from 0 to ~15× the bucket width. */
  private val genRow: Gen[(Option[Long], Long)] = for {
    lo <- Gen.choose(-300L, 300L)
    w <- Gen.frequency(5 -> Gen.choose(0L, 40L), 2 -> Gen.choose(40L, 150L),
      1 -> Gen.choose(-60L, -1L)) // negative = inverted interval
    nullLo <- Gen.frequency(9 -> Gen.const(false), 1 -> Gen.const(true))
  } yield (if (nullLo) None else Some(lo), lo + w)

  private def frame(rows: Seq[(Option[Long], Long)], loC: String, hiC: String) = {
    import spark.implicits._
    rows.zipWithIndex
      .map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("id", loC, hiC)
  }

  test("two-sided overlap equals naive for random tables, widths, caps") {
    for (trial <- 0 until 8) {
      val a = frame(sample(genRow, 60, 100L + trial), "alo", "ahi")
        .withColumnRenamed("id", "aid")
      val b = frame(sample(genRow, 50, 900L + trial), "blo", "bhi")
        .withColumnRenamed("id", "bid")
      val naive = a.join(b, col("ahi") >= col("blo") && col("bhi") >= col("alo"))
      val width = Seq(3.0, 10.0, 37.0)(trial % 3)
      val cap = Seq(1L, 4L, 4096L)(trial % 3)
      val rewritten = RangeJoinRewrite.applied(spark, naive, width, cap)
      val exp = naive.collect().map(_.toString).sorted.toSeq
      val got = rewritten.collect().map(_.toString).sorted.toSeq
      assert(got == exp, s"trial=$trial width=$width cap=$cap")
    }
  }

  test("auto mode equals naive for random proven base±constant offsets") {
    import spark.implicits._
    // the conf-free path: bounds are base ± random CONSTANTS, so the
    // width proof fires and the rule picks its own bucket width. Fuzz
    // the constants (incl. zero-width and asymmetric offsets) and the
    // point-side position; every trial must match the naive join and
    // plan zero fallback branches.
    for (trial <- 0 until 8) {
      val offL = sample(Gen.choose(0L, 90L), 1, 40L + trial).head
      val offR = sample(Gen.choose(0L, 90L), 1, 60L + trial).head
      if (offL + offR > 0) {
        val pts = sample(Gen.choose(-350L, 350L), 80, 500L + trial)
          .zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
        val base = sample(Gen.choose(-300L, 300L), 50, 300L + trial)
          .zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("iid", "b")
        val naive = pts.join(base,
          col("x") >= col("b") - lit(offL) && col("x") <= col("b") + lit(offR))
        val rewritten = RangeJoinRewrite.applied(spark, naive) // NO width
        val exp = naive.collect().map(_.toString).sorted.toSeq
        val got = rewritten.collect().map(_.toString).sorted.toSeq
        assert(got == exp, s"trial=$trial offL=$offL offR=$offR")
        val nl = rewritten.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
          case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
        }.size
        assert(nl == 0, s"auto mode left a fallback branch: trial=$trial")
      }
    }
  }

  test("point-in-interval equals naive for random tables, widths, caps") {
    import spark.implicits._
    for (trial <- 0 until 8) {
      val pts = sample(Gen.choose(-350L, 350L), 80, 500L + trial)
        .zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("pid", "x")
      val iv = frame(sample(genRow, 50, 700L + trial), "lo", "hi")
      val naive = pts.join(iv, col("x") >= col("lo") && col("x") <= col("hi"))
      val width = Seq(2.0, 8.0, 51.0)(trial % 3)
      val cap = Seq(1L, 3L, 4096L)(trial % 3)
      val rewritten = RangeJoinRewrite.applied(spark, naive, width, cap)
      val exp = naive.collect().map(_.toString).sorted.toSeq
      val got = rewritten.collect().map(_.toString).sorted.toSeq
      assert(got == exp, s"trial=$trial width=$width cap=$cap")
    }
  }
}

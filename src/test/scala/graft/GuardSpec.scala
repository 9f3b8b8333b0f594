package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BigLiteralGuard

/** The optimizer-injected literal-size lint: permissive when disabled,
  * fails fast on plans that embed oversized literals when armed. */
class GuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withGuard[T](limit: Long)(body: => T): T = {
    val prior = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prior :+ BigLiteralGuard(spark)
    spark.conf.set("spark.graft.maxLiteralBytes", limit.toString)
    try body
    finally {
      spark.conf.unset("spark.graft.maxLiteralBytes")
      spark.experimental.extraOptimizations = prior
    }
  }

  test("small literals pass; an oversized binary literal fails analysis") {
    withGuard(1024) {
      // ordinary plan with small literals is untouched
      val ok = Tables.documents(spark, TestSpark.sf0001)
        .filter(col("lang") === "en").count()
      assert(ok > 0)
      // a 1 MB payload embedded as a plan literal must be rejected
      val blob = Array.fill[Byte](1024 * 1024)(7)
      // .collect (not .count): column pruning would drop the unused
      // projection — and its literal — before the lint batch runs
      val e = intercept[Exception] {
        Tables.documents(spark, TestSpark.sf0001)
          .select(md5(concat(col("text").cast("binary"), lit(blob))))
          .collect()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
      assert(chain(e).exists(c =>
        Option(c.getMessage).exists(_.contains("BigLiteralGuard"))), e.toString)
    }
  }

  test("disabled by default: big literals are not rejected when limit is 0") {
    val prior = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prior :+ BigLiteralGuard(spark)
    try {
      val blob = Array.fill[Byte](64 * 1024)(7)
      val n = Tables.documents(spark, TestSpark.sf0001)
        .select(md5(concat(col("text").cast("binary"), lit(blob)))).collect()
      assert(n.nonEmpty)
    } finally spark.experimental.extraOptimizations = prior
  }
}

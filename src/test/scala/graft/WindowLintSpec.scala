package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dev.WindowLint

/** Proves the empirical partition-less-window fence actually fires: the
  * collector must report the TRUE row count flowing through a global
  * `Window.orderBy` (the r6 `q_pack_sequences` scale bug shape) and must
  * stay quiet for partitioned windows and for global windows that sit
  * above an aggregate (per-segment totals — the admissible pattern).
  * Complements the static agg-below lint in [[ScaleSpec]]: that one
  * proves plan SHAPE, this one proves the measured frame size a plan
  * shape can't (a group count is a data property). */
class WindowLintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fence measures rows through an unbounded global window") {
    import spark.implicits._
    val n = 10000L
    val df = spark.range(n).toDF("id")
      .withColumn("cum",
        sum(col("id")).over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val rows = WindowLint.partitionlessWindowRows(df)
    assert(rows == Seq(n), s"expected one global window over $n rows, got $rows")
  }

  test("fence ignores partitioned windows") {
    import spark.implicits._
    val df = spark.range(1000).toDF("id")
      .withColumn("g", col("id") % 7)
      .withColumn("r", row_number().over(
        Window.partitionBy("g").orderBy("id")))
    assert(WindowLint.partitionlessWindowRows(df).isEmpty)
  }

  test("global window over an aggregate reports the group count, not the corpus") {
    import spark.implicits._
    val df = spark.range(100000).toDF("id")
      .withColumn("seg", col("id") % 16)
      .groupBy("seg").agg(sum(col("id")).as("s"))
      .withColumn("off", sum(col("s")).over(Window.orderBy("seg")
        .rowsBetween(Window.unboundedPreceding, -1)))
    val rows = WindowLint.partitionlessWindowRows(df)
    assert(rows == Seq(16L), s"expected 16 aggregated rows, got $rows")
  }
}

package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` API: wrap/unwrap a Catalyst
  * `Expression` as a public `Column` (Spark 4 routes Columns through
  * ColumnNode; `ExpressionUtils` is the sanctioned classic-session
  * converter, but it is package-private), plus the standard
  * non-foldable-argument `AnalysisException` builder so SQL-surface
  * function builders can fail analysis with the same error class built-in
  * functions use. The only Spark-internal surface this library touches. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Wrap an already-analyzed logical plan as a DataFrame — the bridge
    * that lets [[graft.plans.RangeJoinRewrite.applied]] rewrite ONE
    * query's plan eagerly instead of flipping session-global optimizer
    * conf under a shared session. */
  def dataFrame(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
  def nonFoldableArgumentError(funcName: String, paramName: String,
      paramType: org.apache.spark.sql.types.DataType): Throwable =
    org.apache.spark.sql.errors.QueryCompilationErrors
      .nonFoldableArgumentError(funcName, paramName, paramType)
}

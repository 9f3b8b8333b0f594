package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer-injected lint rule: fail analysis when a plan embeds a
  * Literal larger than `spark.graft.maxLiteralBytes` (0 = disabled,
  * the default).
  *
  * Why this exists: a multi-MB payload smuggled into the plan as a
  * `Literal` (e.g. a serialized Bloom filter) is walked byte-by-byte by
  * every optimizer-time `semanticEquals`/`hashCode` pass — measured at
  * ~half of q_dedup_incremental's runtime before the fix. The correct
  * carrier for big payloads is a by-reference constructor parameter of a
  * custom Expression (Java arrays compare by identity; deserialize
  * `@transient lazy` per executor — see
  * [[graft.operators.Incremental]]). This guard turns that hard-won rule
  * into an enforced invariant for any session that opts in.
  *
  * Wiring: `spark.sql.extensions=graft.plans.GraftExtensions` injects it
  * cluster-wide; an existing session can opt in via
  * `spark.experimental.extraOptimizations`. The rule never rewrites —
  * it only inspects — so it cannot change results.
  */
case class BigLiteralGuard(spark: SparkSession) extends Rule[LogicalPlan] {

  private def sizeOf(v: Any): Long = v match {
    case b: Array[Byte] => b.length.toLong
    case s: UTF8String => s.numBytes.toLong
    case _ => 0L
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val limit = spark.conf.getOption("spark.graft.maxLiteralBytes")
      .map(_.toLong).getOrElse(0L)
    if (limit > 0) {
      // subqueriesAll: subquery plans are optimized recursively (which
      // re-runs this rule), but walking them here too keeps the guard
      // complete even when it fires on the outer pass first
      (plan +: plan.subqueriesAll).foreach(_.foreach { node =>
        node.expressions.foreach(_.foreach {
          case Literal(v, _) if sizeOf(v) > limit =>
            throw new IllegalStateException(
              s"BigLiteralGuard: plan embeds a ${sizeOf(v)}-byte literal " +
                s"(limit $limit). Optimizer equality walks literals " +
                "byte-by-byte on every rule pass; carry large payloads " +
                "by reference in a custom Expression instead.")
          case _ => ()
        })
      })
    }
    plan
  }
}

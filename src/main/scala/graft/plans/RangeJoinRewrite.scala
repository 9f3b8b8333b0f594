package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rewrite: a pure range join (`x >= lo AND x <= hi` between
  * two relations, no equi predicate) into the bucketized equi-join that
  * [[graft.operators.Relational.joinRange]] hand-writes.
  *
  * Why: Spark plans a join whose only cross-side predicates are
  * inequalities as BroadcastNestedLoopJoin — O(N·M) work that is the
  * single worst scale cliff a naive user query can hit (the DuckDB
  * comparator spends 93 s of its 166 s total on exactly this plan at
  * sf0.1; at 100 TB it simply never finishes). The reference engine
  * never hits this because it only joins on scraped keys
  * (`/root/reference/src/db.rs:48-66`), but a user porting ad-hoc SQL
  * to this library will. The rewrite makes the safe plan automatic:
  *
  *  - point side P (the side `x` comes from) gains `bucket(x)`,
  *  - interval side I explodes to every bucket its `[lo, hi]` overlaps
  *    (`sequence(bucket(lo), bucket(hi))`),
  *  - equi-join on the bucket, then the ORIGINAL predicate re-filters —
  *    so bucket-edge effects cannot change results, only work.
  *
  * `bucket(v) = floor(seconds(v) / width)` is monotone non-decreasing
  * (IEEE division by a positive constant and floor both are), so
  * `lo <= x <= hi` implies `bucket(lo) <= bucket(x) <= bucket(hi)` and
  * every qualifying pair meets in exactly one bucket: the one `x` is in.
  * No dedup step is needed.
  *
  * Intervals wider than `maxBucketsPerInterval` buckets (pathological —
  * a row that would explode into thousands of copies) are split off and
  * joined with the original theta shape; that residue is typically
  * empty, keeps `sequence()` bounded, and is emitted as a Cross-typed
  * join so this rule cannot re-match it inside the fixed-point
  * optimizer batch (the rule only matches Inner). Honest cost of the
  * fallback branch: each input is scanned once more (filter-pruned at
  * the source) even when the residue is empty — an O(N) read traded
  * for removing O(N·M) compute, and the branch's nested loop runs over
  * only the cap-exceeding interval rows. Tests therefore assert "one
  * equi bucket join + at most one guarded nested loop", not zero.
  *
  * Correctness guards: Inner joins only; both children fully
  * deterministic (the rewrite duplicates each side into the short/long
  * branches); `x`/`lo`/`hi` deterministic, single-sided, and of a
  * numeric/date/timestamp type; no cross-side equi predicate (if one
  * exists the join is already shuffle-plannable and bucketing would
  * only add work). Nulls in `x`/`lo`/`hi` drop on both paths exactly as
  * the inner theta join drops them (null comparison → no match; null
  * bucket/sequence → no row).
  *
  * Wiring: `spark.sql.extensions=graft.plans.GraftExtensions` injects
  * it cluster-wide; it is a no-op unless
  * `spark.graft.rangeJoin.bucketWidth` (seconds for temporal keys,
  * domain units for numeric) is set > 0. Width tuning trades bucket
  * fan-out against per-bucket pair volume; a good default is the
  * typical interval length, giving ≤2× row expansion on the interval
  * side. [[RangeJoinRewrite.applied]] applies it eagerly to one
  * DataFrame without touching session conf.
  */
case class RangeJoinRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = spark.conf.getOption(RangeJoinRewrite.widthKey)
      .map(_.toDouble).getOrElse(0.0)
    if (width <= 0) plan
    else {
      val cap = spark.conf.getOption(RangeJoinRewrite.capKey)
        .map(_.toLong).getOrElse(4096L)
      RangeJoinRewrite.rewritePlan(
        plan, width, cap, spark.sessionState.conf.sessionLocalTimeZone)
    }
  }
}

object RangeJoinRewrite extends PredicateHelper {

  val widthKey = "spark.graft.rangeJoin.bucketWidth"
  val capKey = "spark.graft.rangeJoin.maxBucketsPerInterval"

  /** Eager, conf-free application to a single DataFrame: rewrite its
    * analyzed plan directly and rewrap. Used by `q_join_range_auto` so
    * the rewrite is scoped to that one query instead of flipping a
    * session-global conf under the shared Verify/Bench session. */
  def applied(spark: SparkSession, df: org.apache.spark.sql.DataFrame,
      width: Double, cap: Long = 4096L): org.apache.spark.sql.DataFrame = {
    val before = df.queryExecution.analyzed
    val after =
      rewritePlan(before, width, cap, spark.sessionState.conf.sessionLocalTimeZone)
    require(!after.fastEquals(before),
      "RangeJoinRewrite.applied: no pure range join found to rewrite")
    org.apache.spark.sql.graftshim.ColumnShim.dataFrame(spark, after)
  }

  def rewritePlan(plan: LogicalPlan, width: Double, cap: Long,
      tz: String): LogicalPlan =
    plan.transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewriteJoin(j, width, cap, tz).getOrElse(j)
    }

  private def bucketable(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Monotone bucket id: floor(value-as-double / width), LongType. Date
    * goes through timestamp (session tz — monotone regardless of zone);
    * every cast carries an explicit timeZoneId because this runs after
    * the analyzer's ResolveTimeZone pass. */
  private def toBucket(e: Expression, width: Double, tz: String): Expression = {
    val asDouble = e.dataType match {
      // NTZ→LTZ in a fixed zone is monotone non-decreasing (DST gaps
      // skip, overlaps collapse — order is never inverted), which is
      // the only property bucketing needs
      case DateType | TimestampNTZType =>
        Cast(Cast(e, TimestampType, Some(tz)), DoubleType, Some(tz))
      case DoubleType => e
      case _ => Cast(e, DoubleType, Some(tz))
    }
    Floor(Divide(asDouble, Literal(width)))
  }

  private def rewriteJoin(j: Join, width: Double, cap: Long,
      tz: String): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), _) = j
    // duplicating a side into the short/long branches is only sound if
    // re-evaluating it yields the same rows
    val deterministic = j.children.forall(
      _.find(_.expressions.exists(!_.deterministic)).isEmpty)
    if (!deterministic) return None

    val lOut = left.outputSet
    val rOut = right.outputSet
    // 1 = left-only, 2 = right-only, 0 = constant, 3 = mixed/unusable
    def sideOf(e: Expression): Int =
      if (!e.deterministic) 3
      else if (e.references.isEmpty) 0
      else if (e.references.subsetOf(lOut)) 1
      else if (e.references.subsetOf(rOut)) 2
      else 3

    val conjs = splitConjunctivePredicates(cond)
    val hasEqui = conjs.exists {
      case EqualTo(a, b) => Set(sideOf(a), sideOf(b)) == Set(1, 2)
      case EqualNullSafe(a, b) => Set(sideOf(a), sideOf(b)) == Set(1, 2)
      case _ => false
    }
    if (hasEqui) return None

    // Normalize every cross-side inequality `big >= small` into its two
    // readings: lower bound of `big`, upper bound of `small`. Strictness
    // is irrelevant for bucket containment.
    def readings(big: Expression, small: Expression): Seq[(Expression, Expression, Boolean)] =
      if (Set(sideOf(big), sideOf(small)) == Set(1, 2) &&
        bucketable(big.dataType) && bucketable(small.dataType))
        Seq((big, small, true), (small, big, false))
      else Nil
    val cands = conjs.flatMap {
      case GreaterThanOrEqual(a, b) => readings(a, b)
      case GreaterThan(a, b) => readings(a, b)
      case LessThanOrEqual(a, b) => readings(b, a)
      case LessThan(a, b) => readings(b, a)
      case _ => Nil
    }
    val lowers = cands.filter(_._3)
    val uppers = cands.filterNot(_._3)
    val pair = lowers.flatMap { case (x, lo, _) =>
      uppers.collectFirst {
        case (x2, hi, _) if x.semanticEquals(x2) && sideOf(lo) == sideOf(hi) =>
          (x, lo, hi)
      }
    }.headOption

    pair.map { case (x, lo, hi) =>
      val pointIsLeft = sideOf(x) == 1
      val (point, interval) = if (pointIsLeft) (left, right) else (right, left)

      // Project x/lo/hi ONCE PER ROW on their own sides and substitute
      // the attributes into the re-filter condition: the post-join
      // predicate runs once per candidate PAIR, and recomputing e.g.
      // `o_orderdate + INTERVAL 2 DAYS` there was measured at 3.4× the
      // hand-bucketized query's wall-clock at sf0.1 — with the
      // substitution the per-pair work is two primitive compares.
      val xAl = Alias(x, "__graft_x")()
      val loAl = Alias(lo, "__graft_lo")()
      val hiAl = Alias(hi, "__graft_hi")()
      val pB = Alias(toBucket(x, width, tz), "__graft_pbucket")()
      val pointProj = Project(point.output :+ xAl :+ pB, point)
      val intervalProj = Project(interval.output :+ loAl :+ hiAl, interval)
      val newCond = cond.transformUp {
        case e if e.semanticEquals(x) => xAl.toAttribute
        case e if e.semanticEquals(lo) => loAl.toAttribute
        case e if e.semanticEquals(hi) => hiAl.toAttribute
      }

      val blo = toBucket(loAl.toAttribute, width, tz)
      val bhi = toBucket(hiAl.toAttribute, width, tz)
      val nBuckets = Add(Subtract(bhi, blo), Literal(1L))

      // short intervals: explode to each overlapped bucket, equi-join
      val ibAttr = AttributeReference("__graft_ibucket", LongType, nullable = false)()
      val shortI = Filter(LessThanOrEqual(nBuckets, Literal(cap)), intervalProj)
      val gen = Generate(Explode(new Sequence(blo, bhi, None, Some(tz))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(ibAttr), child = shortI)
      val eq = EqualTo(pB.toAttribute, ibAttr)
      val (sl, sr) =
        if (pointIsLeft) (pointProj: LogicalPlan, gen: LogicalPlan)
        else (gen: LogicalPlan, pointProj: LogicalPlan)
      val branchShort =
        Project(j.output, Filter(newCond, Join(sl, sr, Inner, Some(eq), JoinHint.NONE)))

      // pathological wide intervals: original theta shape on the (almost
      // always empty) residue; Cross-typed so the rule cannot re-match it
      val longI = Filter(GreaterThan(nBuckets, Literal(cap)), intervalProj)
      val (ll, lr) =
        if (pointIsLeft) (pointProj: LogicalPlan, longI: LogicalPlan)
        else (longI: LogicalPlan, pointProj: LogicalPlan)
      val branchLong =
        Project(j.output, Filter(newCond, Join(ll, lr, Cross, None, JoinHint.NONE)))

      Union(branchShort, branchLong)
    }
  }
}

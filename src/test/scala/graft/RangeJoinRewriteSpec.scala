package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinRewrite

/** [[graft.plans.RangeJoinRewrite]]: the optimizer rule that turns a
  * naive theta range join (Spark's BroadcastNestedLoopJoin — the worst
  * scale cliff a user query can hit) into the bucketized equi-join of
  * [[graft.operators.Relational.joinRange]]. Semantics are pinned by
  * exhaustive equality against the un-rewritten join on inputs covering
  * variable interval widths, the long-interval fallback branch, strict
  * bounds, inverted (lo > hi) intervals, and null bounds; plan shape is
  * pinned by physical-plan inspection on both the eager `applied` path
  * and the `extraOptimizations` session wiring. */
class RangeJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hasBNLJ(p: SparkPlan): Boolean = nestedLoops(p) > 0

  /** Count of nested-loop-family physical joins (BNLJ or cartesian).
    * The rewritten plan legitimately keeps ONE — the cap-guarded
    * long-interval fallback branch, empty for well-behaved inputs —
    * so rewritten-plan tests assert `equiBucketJoins >= 1` and
    * `nestedLoops <= 1` instead of zero. */
  private def nestedLoops(p: SparkPlan): Int = {
    def walk(n: SparkPlan): Int = {
      val self = n match {
        case _: BroadcastNestedLoopJoinExec => 1
        case _: org.apache.spark.sql.execution.joins.CartesianProductExec => 1
        case _ => 0
      }
      self + (n match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case other => other.children.map(walk).sum
      })
    }
    walk(p)
  }

  /** The rewrite's signature in the optimized logical plan: an Inner
    * equi join on the synthesized `__graft_*_bucket` columns. */
  private def equiBucketJoins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.references.exists(a =>
            a.name.startsWith("__graft_") && a.name.endsWith("_bucket"))) => j
    }.size

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** Variable-width numeric intervals: widths 0..95 so a width-10 bucket
    * with cap 5 exercises BOTH branches (short exploded / long theta);
    * every 7th interval inverted (lo > hi → matches nothing), every
    * 11th with a null bound (inner join drops it). */
  private def numericFixture: (DataFrame, DataFrame) = {
    val points = spark.range(0, 1000).select(
      col("id").as("pid"), (col("id") % 600).cast("long").as("x"))
    val intervals = spark.range(0, 200).select(
      col("id").as("iid"),
      when(col("id") % 11 === 0, lit(null).cast("long"))
        .when(col("id") % 7 === 0, (col("id") * 3 % 500) + 1000)
        .otherwise(col("id") * 3 % 500).as("lo"),
      (col("id") * 3 % 500 + (col("id") % 20) * 5).cast("long").as("hi"))
    (points, intervals)
  }

  test("q_join_range_auto matches hand-bucketized q_join_range exactly") {
    val auto = SparkEntry.queries("q_join_range_auto")(spark, TestSpark.sf0001)
    val hand = SparkEntry.queries("q_join_range")(spark, TestSpark.sf0001)
    assert(sortedRows(auto) == sortedRows(hand))
    assert(equiBucketJoins(auto) == 1,
      "rewritten plan must equi-join on the synthesized bucket")
    // `o_orderdate ± 2 days` is the statically-proven-short shape: no
    // cap filter, no theta fallback, no nested loop anywhere
    assert(nestedLoops(auto.queryExecution.executedPlan) == 0,
      "statically bounded intervals must not leave a fallback branch")
  }

  test("the naive plan it replaces really is a nested-loop join") {
    val o = Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_shipdate"))
    val naive = li.join(o,
      col("l_shipdate") >= col("o_orderdate") - expr("INTERVAL 2 DAYS") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 2 DAYS"))
    assert(hasBNLJ(naive.queryExecution.executedPlan))
  }

  test("numeric domain: rewrite equals naive across widths, inversions, nulls") {
    val (points, intervals) = numericFixture
    val cond = col("x") >= col("lo") && col("x") <= col("hi")
    val naive = points.join(intervals, cond)
    // cap 5 < max 20 buckets: some intervals take the exploded branch,
    // some the theta fallback — assert both populated via the inputs
    val widths = intervals.filter(col("lo").isNotNull).select(
      (floor(col("hi") / 10) - floor(col("lo") / 10) + 1).as("w")).as[Long]
      .collect().toSeq
    assert(widths.exists(_ <= 5) && widths.exists(_ > 5),
      "fixture must exercise both short and long branches")
    val rewritten = RangeJoinRewrite.applied(spark, naive, width = 10.0, cap = 5L)
    assert(sortedRows(rewritten) == sortedRows(naive))
    assert(rewritten.count() > 0)
  }

  test("strict bounds (<, >) rewrite and preserve exclusivity") {
    val (points, intervals) = numericFixture
    val naive = points.join(intervals, col("x") > col("lo") && col("x") < col("hi"))
    val rewritten = RangeJoinRewrite.applied(spark, naive, width = 25.0)
    assert(sortedRows(rewritten) == sortedRows(naive))
  }

  test("point side on the right rewrites too") {
    val (points, intervals) = numericFixture
    val naive = intervals.join(points, col("x") >= col("lo") && col("x") <= col("hi"))
    val rewritten = RangeJoinRewrite.applied(spark, naive, width = 10.0)
    assert(sortedRows(rewritten) == sortedRows(naive))
  }

  test("two-sided overlap: rewrite equals naive across widths, inversions, nulls") {
    val a = spark.range(0, 300).selectExpr("id AS aid",
      "CASE WHEN id % 13 = 0 THEN id * 7 % 400 + 25 ELSE id * 7 % 400 END AS alo",
      "CASE WHEN id % 9 = 0 THEN NULL ELSE id * 7 % 400 + (id % 15) * 4 END AS ahi")
    val b = spark.range(0, 250).selectExpr("id AS bid",
      "id * 11 % 400 AS blo",
      "CASE WHEN id % 17 = 0 THEN id * 11 % 400 - 30 ELSE id * 11 % 400 + (id % 12) * 5 END AS bhi")
    val cond = col("ahi") >= col("blo") && col("bhi") >= col("alo")
    val naive = a.join(b, cond)
    // cap 3 with widths up to ~6 buckets: both sides exercise the
    // exploded AND the theta-fallback branches; inverted intervals (the
    // %13 / %17 rows) can still match in the overlap shape
    val rewritten = RangeJoinRewrite.applied(spark, naive, width = 10.0, cap = 3L)
    assert(sortedRows(rewritten) == sortedRows(naive))
    assert(equiBucketJoins(rewritten) == 1)
    assert(nestedLoops(rewritten.queryExecution.executedPlan) <= 2,
      "only the two cap-guarded fallback branches may nested-loop")
    assert(rewritten.count() > 0)
  }

  test("q_join_overlap matches its naive theta form at sf0.001") {
    val auto = SparkEntry.queries("q_join_overlap")(spark, TestSpark.sf0001)
    val o = Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .filter(col("l_returnflag") === "R" && col("l_quantity") <= 2)
      .select(col("l_orderkey"), col("l_shipdate"))
    val naive = li.join(o,
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 3 DAYS") &&
          col("o_orderdate") <= col("l_shipdate") + expr("INTERVAL 2 DAYS"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_overlap"))
      .orderBy("o_orderkey")
    assert(sortedRows(auto) == sortedRows(naive))
    // both sides are `base ± constant`: proven short, zero fallbacks
    assert(nestedLoops(auto.queryExecution.executedPlan) == 0)
  }

  test("date-typed axis: rewrite equals naive (the DateType bucket path)") {
    // the fixtures ship NTZ timestamps, so the DateType branch of
    // toBucket/baseOffset needs its own inputs: cast both axes to DATE
    val o = Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"))
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_shipdate").cast("date").as("sd"))
    val naive = li.join(o,
        col("sd") >= date_sub(col("od"), 2) && col("sd") <= date_add(col("od"), 2))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
    val rewritten = RangeJoinRewrite.applied(spark, naive, width = 86400.0)
    assert(sortedRows(rewritten) == sortedRows(naive))
    // date_add/date_sub of a literal is the statically-proven shape too
    assert(nestedLoops(rewritten.queryExecution.executedPlan) == 0)
  }

  test("decimal-typed axis: rewrite equals naive (NumericType cast path)") {
    import spark.implicits._
    val pts = spark.range(0, 400).select(col("id").as("pid"),
      (col("id") % 300).cast("decimal(12,2)").as("x"))
    val iv = spark.range(0, 80).select(col("id").as("iid"),
      (col("id") * 7 % 280).cast("decimal(12,2)").as("lo"),
      (col("id") * 7 % 280 + col("id") % 25).cast("decimal(12,2)").as("hi"))
    val naive = pts.join(iv, col("x") >= col("lo") && col("x") <= col("hi"))
    val rewritten = RangeJoinRewrite.applied(spark, naive, width = 10.0, cap = 2L)
    assert(sortedRows(rewritten) == sortedRows(naive))
    assert(rewritten.count() > 0)
  }

  test("an existing cross-side equi predicate disables the rewrite") {
    val (points, intervals) = numericFixture
    val naive = points.join(intervals,
      col("pid") % 200 === col("iid") &&
        col("x") >= col("lo") && col("x") <= col("hi"))
    val before = naive.queryExecution.analyzed
    val after = RangeJoinRewrite.rewritePlan(before, 10.0, 4096L, "UTC")
    assert(after.fastEquals(before), "equi-join plan must not be rewritten")
  }

  test("a non-deterministic side disables the rewrite") {
    val (points, intervals) = numericFixture
    val naive = points.withColumn("r", rand(7)).join(intervals,
      col("x") >= col("lo") && col("x") <= col("hi"))
    val before = naive.queryExecution.analyzed
    val after = RangeJoinRewrite.rewritePlan(before, 10.0, 4096L, "UTC")
    assert(after.fastEquals(before))
  }

  test("default-on: naive ±2 days join plans zero nested loops with NO conf set") {
    // a pristine session with only the rule injected — exactly what a
    // user deploying spark.sql.extensions=GraftExtensions gets — must
    // kill the BNLJ cliff without any spark.graft.* configuration
    val ns = spark.newSession()
    ns.experimental.extraOptimizations =
      ns.experimental.extraOptimizations :+ RangeJoinRewrite(ns)
    assert(ns.conf.getOption(RangeJoinRewrite.widthKey).isEmpty)
    val o = Tables.orders(ns, TestSpark.sf0001)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(ns, TestSpark.sf0001)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_shipdate"))
    val naive = li.join(o,
      col("l_shipdate") >= col("o_orderdate") - expr("INTERVAL 2 DAYS") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 2 DAYS"))
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_near_shipments"))
    assert(equiBucketJoins(naive) == 1,
      "default-on rule must bucketize the proven base±constant join")
    assert(nestedLoops(naive.queryExecution.executedPlan) == 0,
      "proven widths need no fallback branch: zero nested loops")
    val hand = SparkEntry.queries("q_join_range")(spark, TestSpark.sf0001)
    assert(sortedRows(naive.orderBy("o_orderkey")) == sortedRows(hand))
  }

  test("default-on stays off for unproven row-dependent widths") {
    val (points, intervals) = numericFixture
    val naive = points.join(intervals,
      col("x") >= col("lo") && col("x") <= col("hi"))
    val before = naive.queryExecution.analyzed
    // lo/hi widths depend on the row (id-derived), so no static proof
    // exists: auto mode must leave the plan alone rather than guess
    val after = RangeJoinRewrite.rewritePlan(before, None, 4096L, "UTC")
    assert(after.fastEquals(before),
      "unproven interval widths must not auto-rewrite")
  }

  test("malformed conf values disable the rule instead of throwing") {
    val ns = spark.newSession()
    ns.experimental.extraOptimizations =
      ns.experimental.extraOptimizations :+ RangeJoinRewrite(ns)
    ns.conf.set(RangeJoinRewrite.widthKey, "not-a-number")
    ns.conf.set(RangeJoinRewrite.capKey, "NaNopes")
    try {
      // an unrelated query through the same optimizer must still run
      val n = Tables.nation(ns, TestSpark.sf0001).count()
      assert(n > 0)
      // and the proven-shape auto path still fires despite the garbage
      val o = Tables.orders(ns, TestSpark.sf0001)
        .select(col("o_orderkey"), col("o_orderdate"))
      val li = Tables.lineitem(ns, TestSpark.sf0001)
        .select(col("l_orderkey"), col("l_shipdate"))
      val j = li.join(o,
        col("l_shipdate") >= col("o_orderdate") - expr("INTERVAL 2 DAYS") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 2 DAYS"))
      assert(equiBucketJoins(j) == 1)
    } finally {
      ns.conf.unset(RangeJoinRewrite.widthKey)
      ns.conf.unset(RangeJoinRewrite.capKey)
    }
  }

  test("spark.graft.rangeJoin.auto=false disables the conf-free path") {
    val ns = spark.newSession()
    ns.experimental.extraOptimizations =
      ns.experimental.extraOptimizations :+ RangeJoinRewrite(ns)
    ns.conf.set(RangeJoinRewrite.autoKey, "false")
    try {
      val o = Tables.orders(ns, TestSpark.sf0001)
        .select(col("o_orderkey"), col("o_orderdate"))
      val li = Tables.lineitem(ns, TestSpark.sf0001)
        .select(col("l_orderkey"), col("l_shipdate"))
      val j = li.join(o,
        col("l_shipdate") >= col("o_orderdate") - expr("INTERVAL 2 DAYS") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 2 DAYS"))
      assert(equiBucketJoins(j) == 0, "auto=false must leave the plan alone")
    } finally ns.conf.unset(RangeJoinRewrite.autoKey)
  }

  test("extraOptimizations wiring: lazy rewrite in a dedicated session") {
    val ns = spark.newSession()
    ns.experimental.extraOptimizations =
      ns.experimental.extraOptimizations :+ RangeJoinRewrite(ns)
    ns.conf.set(RangeJoinRewrite.widthKey, "86400")
    try {
      val o = Tables.orders(ns, TestSpark.sf0001)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      val li = Tables.lineitem(ns, TestSpark.sf0001)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_shipdate"))
      val naive = li.join(o,
        col("l_shipdate") >= col("o_orderdate") - expr("INTERVAL 2 DAYS") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 2 DAYS"))
        .groupBy(col("o_orderkey"))
        .agg(count(lit(1)).as("n_near_shipments"))
      assert(equiBucketJoins(naive) == 1,
        "session-injected rule should have bucketized the range join")
      assert(nestedLoops(naive.queryExecution.executedPlan) <= 1,
        "only the cap-guarded fallback branch may nested-loop")
      val hand = SparkEntry.queries("q_join_range")(spark, TestSpark.sf0001)
      assert(sortedRows(naive.orderBy("o_orderkey")) == sortedRows(hand))
    } finally ns.conf.unset(RangeJoinRewrite.widthKey)
  }
}

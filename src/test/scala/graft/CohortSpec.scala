package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cohort

/** Structural invariants of the behavioral-analytics operators (exact
  * outputs are DuckDB-oracle-checked by the driver). */
class CohortSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("retention: offset-0 row counts the whole cohort, no count exceeds it") {
    val rows = Cohort.qCohortRetention(spark, TestSpark.sf001).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val cohortSize = rows.filter(_._2 == 0)
      .map { case (c, _, n) => c -> n }.toMap
    // every user is active on their own first day, so offset 0 exists for
    // every cohort and is the cohort's maximum
    rows.groupBy(_._1).foreach { case (c, rs) =>
      assert(rs.exists(_._2 == 0), s"cohort $c missing offset 0")
      assert(rs.forall(_._3 <= cohortSize(c)), s"cohort $c count > size")
      assert(rs.forall(_._2 >= 0))
    }
    // cohort sizes partition the user base
    val users = Tables.events(spark, TestSpark.sf001)
      .select(count_distinct(col("user_id"))).collect()(0).getLong(0)
    assert(cohortSize.values.sum == users)
  }

  test("funnel: stage counts are monotone non-increasing from a real base") {
    val rows = Cohort.qFunnelSteps(spark, TestSpark.sf001).collect()
      .sortBy(_.getInt(0)).map(_.getLong(2))
    assert(rows.length == 3)
    assert(rows(0) >= rows(1) && rows(1) >= rows(2))
    val viewers = Tables.events(spark, TestSpark.sf001)
      .filter(col("event_type") === "view")
      .select(count_distinct(col("user_id"))).collect()(0).getLong(0)
    assert(rows(0) == viewers)
  }
}

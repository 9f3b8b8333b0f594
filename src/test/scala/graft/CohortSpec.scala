package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cohort

/** Structural invariants of the behavioral-analytics operators (exact
  * outputs are DuckDB-oracle-checked by the driver). */
class CohortSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("survival KM: monotone curve, risk-set conservation") {
    val rows = Cohort.qSurvivalKm(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(rows.nonEmpty)
    val totalUsers = graft.Tables.events(spark, TestSpark.sf0001)
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(rows.head._2 == totalUsers, "first risk set is every user")
    assert(rows.map(r => r._3 + r._4).sum == totalUsers,
      "every user dies or is censored exactly once")
    rows.sliding(2).foreach {
      case Array((_, n1, d1, c1, s1), (_, n2, _, _, s2)) =>
        assert(n2 == n1 - d1 - c1, "risk set shrinks by exits")
        assert(s2 <= s1 + 1e-9, "survival never increases")
      case _ =>
    }
    rows.foreach { case (_, n, d, _, s) =>
      assert(d <= n); assert(s >= 0.0 && s <= 1.0)
    }
  }

  test("debounce: survivors keep >5s gaps vs the raw predecessor") {
    val out = Cohort.qEventsDebounce(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(out.nonEmpty)
    // every surviving non-first gap exceeds 5s
    out.foreach { case (_, _, _, g) => g.foreach(v => assert(v > 5000000L)) }
    // exactly one NULL-gap (first) survivor per (user, type) key
    val firsts = out.filter(_._4.isEmpty)
    assert(firsts.map(e => (e._2, e._3)).distinct.length == firsts.length)
    val keys = Tables.events(spark, TestSpark.sf0001)
      .select("user_id", "event_type").distinct().count()
    assert(firsts.length == keys)
    // every injected +1s retry duplicate is debounced away
    val retryIds = Tables.events(spark, TestSpark.sf0001)
      .filter(col("event_id") % 7 === 0)
      .select("event_id").collect().map(_.getLong(0) + 1000000).toSet
    assert(retryIds.nonEmpty)
    val survivors = out.map(_._1).toSet
    assert(survivors.intersect(retryIds).isEmpty, "a retry survived")
    // and the organic log itself survives intact (its gaps are >5s)
    val raw = Tables.events(spark, TestSpark.sf0001)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(survivors == raw)
  }

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

  test("sessionization: gaps split correctly and every event lands in one session") {
    val sessions = Cohort.qSessionBatch(spark, TestSpark.sf001).collect()
    assert(sessions.nonEmpty)
    // event totals are conserved: each event belongs to exactly one session
    val totalEvents = Tables.events(spark, TestSpark.sf001).count()
    assert(sessions.map(_.getLong(2)).sum == totalEvents)
    // per session: duration consistent with bounds, index contiguous from 1
    sessions.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val idx = rs.map(_.getInt(1)).sorted
      assert(idx.head == 1 && idx.last == idx.length, s"user $u gap in session_idx")
      rs.foreach { r =>
        val durUs = r.getLong(5)
        val span = (r.getTimestamp(4).getTime - r.getTimestamp(3).getTime) * 1000L
        assert(durUs >= 0 && math.abs(durUs - span) < 1000L, s"user $u duration mismatch")
      }
    }
    // adjacent sessions of one user are separated by more than the 30-min gap
    sessions.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val ordered = rs.sortBy(_.getInt(1))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val gapMs = b.getTimestamp(3).getTime - a.getTimestamp(4).getTime
          assert(gapMs > 30L * 60 * 1000, s"user $u sessions closer than the timeout")
        case _ =>
      }
    }
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

  test("attribution: every purchase credited once, matching in-memory last-touch") {
    val got = Cohort.qAttribution(spark, TestSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    val ev = Tables.events(spark, TestSpark.sf001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")),
        col("event_type"), floor(col("value") * 100).cast("bigint"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4)))
    val brute = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var touch: String = null
      rows.sortBy(r => (r._3, r._2)).flatMap { r =>
        val out =
          if (r._4 == "purchase")
            Some((if (touch == null) "(none)" else touch, r._5))
          else { touch = r._4; None }
        out
      }
    }
    val agg = brute.groupBy(_._1).map { case (k, v) =>
      (k, v.size.toLong, v.map(_._2).sum)
    }.toList.sortBy(_._1)
    assert(got == agg)
    assert(got.map(_._2).sum == ev.count(_._4 == "purchase").toLong)
  }

  test("cumulative users: prefix-sums new_users and ends at the distinct total") {
    val rows = Cohort.qUsersCumulative(spark, TestSpark.sf001).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    var run = 0L
    rows.foreach { case (nu, cum) =>
      assert(nu > 0)
      run += nu
      assert(cum == run)
    }
    val total = Tables.events(spark, TestSpark.sf001)
      .select("user_id").distinct().count()
    assert(run == total)
  }

  test("twap: bounded by the user's value range, holds weighted correctly") {
    val got = Cohort.qTwapUser(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t"),
        round(col("value") * 100).cast("bigint").as("vc"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    got.foreach { case (uid, nHolds, totUs, twap) =>
      val es = ev(uid).sortBy(e => (e._3, e._2))
      assert(nHolds == es.length - 1, s"user $uid: one hold per gap")
      val gaps = es.zip(es.tail).map { case (a, b) => (a._4, b._3 - a._3) }
      assert(totUs == gaps.map(_._2).sum)
      // exact recompute of the weighted mean
      val wsum = gaps.map { case (vc, d) => BigInt(vc) * BigInt(d) }.sum
      val exp = BigDecimal(wsum).toDouble / totUs.toDouble / 100.0
      assert(twap == exp, s"user $uid: $twap vs $exp")
      // bounded by the held-value range
      val held = gaps.map(_._1)
      assert(twap * 100.0 >= held.min.toDouble - 1e-9 &&
        twap * 100.0 <= held.max.toDouble + 1e-9)
    }
  }

  test("rfm: cells partition the customer base, bins bounded 1..5") {
    val rows = Cohort.qRfmSegments(spark, TestSpark.sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val nCust = Tables.orders(spark, TestSpark.sf0001)
      .select("o_custkey").distinct().count()
    assert(rows.map(_._4).sum == nCust, "every customer lands in exactly one cell")
    rows.foreach { case (r, f, m, n, spend) =>
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
      assert(n > 0 && spend > 0)
    }
    // thresholds really split: no single bin owns everything on any axis
    assert(rows.map(_._1).distinct.length > 1)
    assert(rows.map(_._3).distinct.length > 1)
    // quintiles are ~balanced per axis: each m-bin holds 20% ± the tie slack
    val byM = rows.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
    byM.values.foreach(v => assert(v >= nCust / 10 && v <= nCust * 3 / 10,
      s"m-bin sizes $byM"))
  }

  test("funnel latency: quantile profile is ordered and matches a naive recompute") {
    val r = Cohort.qFunnelLatency(spark, TestSpark.sf0001).collect()(0)
    val (n, p25, p50, p75, p90) =
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(n > 0)
    assert(p25 <= p50 && p50 <= p75 && p75 <= p90)
    assert(p25 >= 0, "a purchase at-or-after the first view cannot precede it")
    // naive recompute of the per-user latency set and its median
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val firstView = ev.filter(_._2 == "view").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._3).min }
    val lats = ev.filter(_._2 == "purchase")
      .flatMap { case (u, _, t) =>
        firstView.get(u).filter(t >= _).map(v => (u, t - v)) }
      .groupBy(_._1).map(_._2.map(_._2).min).toSeq.sorted
    assert(n == lats.length.toLong)
    val rank = 0.5 * (lats.length - 1)
    val (lo, g) = (rank.toInt, rank - rank.toInt)
    val expMedian = lats(lo) + g * (lats(math.min(lo + 1, lats.length - 1)) - lats(lo))
    assert(p50 == expMedian, s"$p50 vs $expMedian")
  }
}

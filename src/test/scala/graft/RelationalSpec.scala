package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Structural invariants of the relational family at sf0.001 (value-level
  * correctness is the driver's DuckDB oracle gate). */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("nearest as-of join: matches an in-memory brute-force nearest") {
    val out = Relational.joinAsOfNearest(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0),
        Option(r.get(3)).map(_.toString),
        Option(r.get(4)).map(_.toString),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    val e = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getTimestamp(4)))
    val signupsByUser = e.filter(_._3 == "signup").groupBy(_._2)
    val expected = e.filter(_._3 == "purchase").sortBy(_._1).map {
      case (eid, uid, _, pus, _) =>
        val cands = signupsByUser.getOrElse(uid, Array.empty)
        if (cands.isEmpty) (eid, None, None, None)
        else {
          // ties to the earlier (backward) signup: strictly smaller
          // forward distance required to win
          val best = cands.minBy { c =>
            val d = math.abs(c._4 - pus)
            (d, if (c._4 <= pus) 0 else 1)
          }
          val dir = if (best._4 <= pus) "backward" else "forward"
          (eid, Some(best._5.toString), Some(dir),
            Some(math.abs(best._4 - pus)))
        }
    }
    assert(out.length == expected.length)
    out.sortBy(_._1).zip(expected).foreach { case (got, want) =>
      assert(got == want, s"purchase ${want._1}")
    }
  }

  test("q1_agg: 3x2 flag/status groups, counts sum to table size") {
    val rows = Relational.q1Agg(spark, TestSpark.sf0001).collect()
    assert(rows.length == 6)
    assert(rows.map(_.getLong(5)).sum == 6000L)
  }

  test("moving average: frame bounded at 7 rows, first row equals its day") {
    val rows = Relational.windowMoving(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, win, n, avg) =>
      assert(n >= 1 && n <= 7)
      assert(math.abs(avg - win.toDouble / n.toDouble) < 1e-12)
    }
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val first = rs.minBy(_._2.getTime)
      assert(first._5 == 1 && first._3 == first._4, "first row is its own frame")
    }
  }

  test("ratio-to-report: shares sum to 1 within every flag") {
    val rows = Relational.windowShare(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (flag, rs) =>
      assert(math.abs(rs.map(_._2).sum - 1.0) < 1e-9, s"flag $flag")
    }
  }

  test("null-safe join: every order lands in a bucket, incl. the NULL one") {
    val rows = Relational.joinNullsafe(spark, TestSpark.sf0001).collect()
    val total = Tables.orders(spark, TestSpark.sf0001).count()
    assert(rows.map(_.getLong(1)).sum == total, "null keys must not drop")
    assert(rows.exists(_.isNullAt(0)), "the NULL bucket exists")
    // null-safe equality still plans as a broadcast HASH join
    val plan = Relational.joinNullsafe(spark, TestSpark.sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected hash join:\n$plan")
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("window rank: exactly one latest order per customer") {
    val df = Relational.windowRank(spark, TestSpark.sf0001)
    assert(df.groupBy("o_custkey").count().filter(col("count") > 1).count() == 0)
  }

  test("as-of join: signup precedes or equals purchase for non-null matches") {
    val bad = Relational.joinAsOf(spark, TestSpark.sf0001)
      .filter(col("last_signup_ts").isNotNull &&
        col("last_signup_ts") > col("ts"))
    assert(bad.count() == 0)
  }

  test("set ops: intersect and except partition the F-status customers") {
    val f = Relational.setIntersect(spark, TestSpark.sf0001).count() +
      Relational.setExcept(spark, TestSpark.sf0001).count()
    val distinct_f = graft.Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_orderstatus") === "F").select("o_custkey").distinct().count()
    assert(f == distinct_f)
  }

  test("approx_count_distinct within 2 sigma of the configured rsd (0.02)") {
    val approx = Relational.aggApprox(spark, TestSpark.sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Relational.aggDistinct(spark, TestSpark.sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (flag, n) =>
      val err = math.abs(approx(flag) - n).toDouble / n
      assert(err <= 0.04, s"$flag: approx=${approx(flag)} exact=$n err=$err")
    }
  }

  test("mergeable HLL sketches: per-group and unioned-global estimates track exact") {
    val rows = Relational.aggHllPartial(spark, TestSpark.sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Relational.aggDistinct(spark, TestSpark.sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // lgK=14 HLL rsd ≈ 0.008; allow 3 sigma
    exact.foreach { case (flag, n) =>
      val err = math.abs(rows(flag) - n).toDouble / n
      assert(err <= 0.025, s"$flag: sketch=${rows(flag)} exact=$n err=$err")
    }
    // the global row is a union of the per-group SKETCHES, not a rescan —
    // it must still track the exact global distinct count
    val globalExact = Tables.lineitem(spark, TestSpark.sf001)
      .select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    val errG = math.abs(rows("ALL") - globalExact).toDouble / globalExact
    assert(errG <= 0.025, s"ALL: sketch=${rows("ALL")} exact=$globalExact")
  }

  test("approx percentiles track the exact percentiles within tolerance") {
    val approx = Relational.percentilesApprox(spark, TestSpark.sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Relational.percentiles(spark, TestSpark.sf001)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (st, (m, p90)) =>
      val (am, ap90) = approx(st)
      // accuracy=10000 on groups of ~hundreds of rows: rank error well
      // under one position, but interpolation differs (exact percentile
      // interpolates between values, the sketch returns an observed
      // value) — tolerate the gap between adjacent order statistics
      assert(math.abs(am - m) / m < 0.05, s"$st median approx=$am exact=$m")
      assert(math.abs(ap90 - p90) / p90 < 0.05, s"$st p90 approx=$ap90 exact=$p90")
    }
  }

  test("every registered oracle has a query and every query runs at sf0.001") {
    val qs = SparkEntry.queries
    SparkEntry.oracleSql.keys.foreach(k => assert(qs.contains(k), s"orphan oracle $k"))
    qs.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.sf0001).limit(1).count()
      assert(n >= 0, s"$name failed")
    }
  }

  test("basket lift: canonical pairs, counts match an in-memory basket fold") {
    val got = Relational.qBasketLift(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty && got.length <= 30)
    got.foreach { case (p1, p2, c12, lift) =>
      assert(p1 < p2, "pairs must be canonical (p1 < p2)")
      assert(c12 >= 1 && lift > 0)
    }
    // in-memory recompute of pair counts and lift from raw baskets
    val baskets = Tables.lineitem(spark, TestSpark.sf0001)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }.toSeq
    val n = baskets.length.toLong
    val freq = baskets.flatten.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val pairCounts = baskets.flatMap { b =>
      val sorted = b.toSeq.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.length)
        yield (sorted(i), sorted(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    got.foreach { case (p1, p2, c12, lift) =>
      assert(pairCounts((p1, p2)) == c12)
      val exp = c12.toDouble * n.toDouble / (freq(p1).toDouble * freq(p2).toDouble)
      assert(lift == exp, s"($p1,$p2): $lift vs $exp")
    }
    // the cut keeps the globally most frequent pairs
    val maxKept = got.map(_._3).min
    val dropped = pairCounts.filterNot(kv => got.exists(g => (g._1, g._2) == kv._1))
    assert(dropped.values.forall(_ <= maxKept))
  }

  test("q21: qualifying suppliers were the sole late shipper of a multi-supplier order") {
    val got = Relational.q21LateSuppliers(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(got.nonEmpty && got.length <= 20)
    assert(got.forall(_._2 > 0))
    // recompute per-order supplier/late-supplier sets in memory
    val joined = Tables.lineitem(spark, TestSpark.sf0001)
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(spark, TestSpark.sf0001)
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 75 DAYS"))
          .as("late"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byOrder = joined.groupBy(_._1)
    val waits = byOrder.toSeq.flatMap { case (_, ls) =>
      val supps = ls.map(_._2).distinct
      val lateSupps = ls.filter(_._3).map(_._2).distinct
      if (supps.length > 1 && lateSupps.length == 1) lateSupps else Nil
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    got.foreach { case (supp, numwait) =>
      assert(waits(supp) == numwait, s"supplier $supp")
    }
    // the limit keeps the top counts
    val minKept = got.map(_._2).min
    assert(waits.filterNot(kv => got.exists(_._1 == kv._1)).values
      .forall(_ <= minKept))
  }

  test("q16: no above-average-return supplier is counted in any profile") {
    val rows = Relational.q16SupplierVariety(spark, TestSpark.sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    assert(rows.forall(_.getLong(3) > 0))
    // counts sorted descending per the cut contract
    val cnts = rows.map(_.getLong(3))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
  }

  test("sweep line: open count is a true interval count at every boundary") {
    val got = Relational.qOrdersOpen(spark, TestSpark.sf0001).collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // deltas telescope to zero: every interval that opens also closes
    assert(got.map(_._2).sum == 0L)
    assert(got.last._3 == 0L, "all intervals closed after the last boundary")
    assert(got.forall(_._3 >= 0L), "open count can never be negative")
    // cumsum consistency
    var run = 0L
    got.foreach { case (_, delta, open) => run += delta; assert(open == run) }
    // spot-check one mid-stream boundary against a brute-force count
    val mid = got(got.length / 2)._1
    val brute = Tables.lineitem(spark, TestSpark.sf0001)
      .select("l_orderkey", "l_shipdate")
      .join(Tables.orders(spark, TestSpark.sf0001)
        .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .filter(to_date(col("o_orderdate")).cast("timestamp").cast("long") * 1000 <= mid &&
        to_date(col("l_shipdate")).cast("timestamp").cast("long") * 1000 >= mid)
      .count()
    assert(got(got.length / 2)._3 == brute,
      s"open count at $mid: sweep ${got(got.length / 2)._3} vs brute $brute")
  }

  test("q13: histogram covers every customer exactly once, zero bucket included") {
    val rows = Relational.q13OrderCounts(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nCust = Tables.customer(spark, TestSpark.sf0001).count()
    assert(rows.map(_._2).sum == nCust)
    val perCust = Tables.orders(spark, TestSpark.sf0001)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy("o_custkey").count().collect().map(_.getLong(1))
    val hist = perCust.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val zero = nCust - perCust.length
    rows.foreach { case (c, d) =>
      if (c == 0L) assert(d == zero, "zero-order bucket")
      else assert(hist(c) == d, s"bucket $c")
    }
  }

  test("q17: decorrelated filter equals the brute-force 20%-of-mean rule") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .join(Tables.part(spark, TestSpark.sf0001)
        .filter(col("p_brand") === "Brand#23"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), round(col("l_quantity")).cast("long").as("q"),
        col("l_extendedprice"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(li.nonEmpty)
    val stats = li.groupBy(_._1).map { case (k, xs) => k -> (xs.map(_._2).sum, xs.size) }
    val small = li.filter { case (k, q, _) =>
      val (s, n) = stats(k); q * 5 * n < s
    }
    val row = Relational.q17SmallQty(spark, TestSpark.sf0001).collect()(0)
    assert(row.getLong(0) == small.size.toLong)
    assert(row.getDouble(1) ==
      small.map(x => math.round(x._3 * 100)).sum / 100.0)
  }

  test("q22: every reported idle-rich customer is above average with no recent order") {
    val total = Relational.q22IdleRich(spark, TestSpark.sf001).collect()
    assert(total.nonEmpty)
    val c = Tables.customer(spark, TestSpark.sf001)
      .select(col("c_custkey"), col("c_nationkey"),
        round(col("c_acctbal") * 100).cast("long").as("bal"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val pos = c.map(_._3).filter(_ > 0)
    val recent = Tables.orders(spark, TestSpark.sf001)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    val idle = c.filter(x => BigInt(x._3) * pos.length > BigInt(pos.sum) &&
      !recent.contains(x._1))
    val expected = idle.groupBy(_._2).map { case (n, xs) =>
      (n, xs.size.toLong, xs.map(_._3).sum / 100.0)
    }.toSeq.sortBy(_._1)
    assert(total.map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      == expected)
  }

  test("q7: bilateral flows cover both directions and revenue is positive") {
    val rows = Relational.q7NationFlows(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r._1, r._2)).distinct.toSet
    assert(pairs.subsetOf(Set(("NATION_3", "NATION_7"), ("NATION_7", "NATION_3"))))
    assert(rows.forall(_._4 > 0))
    // (pair, year) keys are unique — the groupBy really is the output grain
    assert(rows.map(r => (r._1, r._2, r._3)).distinct.length == rows.length)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

/** Invariants of the statistical-analysis operators. Exact values are
  * DuckDB-oracle-checked by the driver; here the power-sum formulas are
  * cross-checked against Spark's own streaming-moment aggregates (which
  * must agree to float tolerance even though they are not bit-stable),
  * plus structural properties. */
class StatsSpec extends AnyFunSuite {

  test("cuped: theta/adjustment equal an in-memory recompute; adjustment is mean-preserving") {
    lazy val spark2 = TestSpark.spark
    val per = graft.Tables.events(spark2, TestSpark.sf0001)
      .groupBy(org.apache.spark.sql.functions.col("user_id"))
      .agg(
        org.apache.spark.sql.functions.expr(
          "sum(case when ts < timestamp '2024-01-16' then cast(round(value*100) as bigint) else 0 end)").as("x"),
        org.apache.spark.sql.functions.expr(
          "sum(case when ts >= timestamp '2024-01-16' then cast(round(value*100) as bigint) else 0 end)").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = per.length.toDouble
    val (sx, sy) = (per.map(_._2).sum.toDouble, per.map(_._3).sum.toDouble)
    val sxy = per.map(p => BigInt(p._2) * p._3).sum.toDouble
    val sxx = per.map(p => BigInt(p._2) * p._2).sum.toDouble
    val cov = sxy / n - (sx / n) * (sy / n)
    val vx = sxx / n - (sx / n) * (sx / n)
    val theta = cov / vx
    val rows = graft.operators.Stats.qAbCuped(spark2, TestSpark.sf0001)
      .collect()
    assert(rows.length == 2)
    assert(math.abs(rows(0).getDouble(4) - theta) < 1e-5)
    // CUPED is mean-preserving across variants in aggregate: the
    // n-weighted mean of adjusted means equals that of raw means
    val totRaw = rows.map(r => r.getLong(1) * r.getDouble(2)).sum
    val totAdj = rows.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(math.abs(totRaw - totAdj) / totRaw < 1e-6)
    // the adjustment must tighten, never widen
    val vr = rows(0).getDouble(5)
    assert(vr > 0.0 && vr <= 1.0)
  }
  private lazy val spark = TestSpark.spark

  test("moments agree with Spark's built-in skewness/kurtosis/corr") {
    val got = Stats.qStatsMoments(spark, TestSpark.sf001).collect()
      .map(r => r.getString(0) -> r).toMap
    val ref = Tables.lineitem(spark, TestSpark.sf001)
      .groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("mean"),
        stddev_pop(col("l_quantity")).as("sd"),
        skewness(col("l_quantity")).as("sk"),
        kurtosis(col("l_quantity")).as("ku"),
        corr(col("l_quantity"), col("l_linenumber")).as("co"))
      .collect()
    assert(ref.nonEmpty && got.size == ref.length)
    ref.foreach { r =>
      val g = got(r.getString(0))
      assert(math.abs(g.getDouble(2) - r.getDouble(1)) < 1e-9, "mean")
      assert(math.abs(g.getDouble(3) - r.getDouble(2)) < 1e-9, "stddev")
      assert(math.abs(g.getDouble(4) - r.getDouble(3)) < 1e-6, "skewness")
      assert(math.abs(g.getDouble(5) - r.getDouble(4)) < 1e-6, "kurtosis")
      assert(math.abs(g.getDouble(6) - r.getDouble(5)) < 1e-6, "corr")
    }
  }

  test("linreg matches the normal-equation solution and r2 is in [0,1]") {
    val rows = Stats.qStatsLinreg(spark, TestSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val r2 = r.getDouble(4)
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2=$r2")
    }
    // slope recovered on a synthetic exact-linear group: y = 7x + 3
    import spark.implicits._
    val df = (1 to 100).map(i => ("g", i.toDouble, 7.0 * i + 3.0))
      .toDF("l_returnflag", "l_quantity", "price")
      .withColumn("l_extendedprice", col("price") / 100.0)
    val tmp = java.nio.file.Files.createTempDirectory("linreg").toString
    df.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
    val out = Stats.qStatsLinreg(spark, tmp).collect()(0)
    assert(math.abs(out.getDouble(2) - 7.0) < 1e-9)
    assert(math.abs(out.getDouble(3) - 3.0) < 1e-6)
    assert(math.abs(out.getDouble(4) - 1.0) < 1e-12)
  }

  test("t-test is antisymmetric-by-construction and df is sane") {
    val rows = Stats.qAbTtest(spark, TestSpark.sf001).collect()
    // 5 event types -> C(5,2) = 10 ordered pairs, each listed once
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val df = r.getDouble(3)
      assert(df > 1.0 && !df.isNaN)
    }
  }

  test("zscore: every flagged row is >=3 sd out, recomputed independently") {
    val out = Stats.qAnomalyZscore(spark, TestSpark.sf001)
    val rows = out.collect()
    assert(rows.nonEmpty, "sf0.001 should contain >=1 outlier")
    assert(rows.forall(r => math.abs(r.getDouble(3)) >= 3.0))
    // independent recompute of one group's stats
    val e = Tables.events(spark, TestSpark.sf001)
      .select(col("event_type"), floor(col("value") * 100).cast("double").as("c"))
    val st = e.groupBy("event_type")
      .agg(avg(col("c")).as("m"), stddev_pop(col("c")).as("sd"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.take(5).foreach { r =>
      val (m, sd) = st(r.getString(1))
      val z = (math.floor(r.getDouble(2) * 100) - m) / sd
      assert(math.abs(z - r.getDouble(3)) < 1e-9)
    }
  }

  test("histogram: 20 bins max, counts partition the table, edges ordered") {
    val rows = Stats.qHistBins(spark, TestSpark.sf001).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 19))
    val total = Tables.orders(spark, TestSpark.sf001).count()
    assert(rows.map(_.getLong(2)).sum == total)
    val los = rows.sortBy(_.getInt(0)).map(_.getDouble(1))
    assert(los.sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
  }

  test("as-of snapshot and cdc apply match a naive in-memory fold") {
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("us"), floor(col("value") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val t = (ev.map(_._5).min + ev.map(_._5).max) / 2
    val wantAsof = ev.filter(_._5 <= t).groupBy(_._1).map { case (u, es) =>
      val last = es.maxBy(e => (e._5, e._4))
      u -> last._2
    }
    val gotAsof = Stats.qAsOfSnapshot(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotAsof == wantAsof)

    val wantCdc = ev.groupBy(_._1).flatMap { case (u, es) =>
      val last = es.maxBy(e => (e._5, e._4))
      if (last._2 == "error") None
      else Some(u -> (last._6, es.length.toLong))
    }
    val gotCdc = Stats.qCdcApply(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(gotCdc == wantCdc)
    // deleted keys really are absent
    val deleted = ev.groupBy(_._1).filter { case (_, es) =>
      es.maxBy(e => (e._5, e._4))._2 == "error"
    }.keySet
    assert(gotCdc.keySet.intersect(deleted).isEmpty)
  }

  test("chi2 matches an in-memory contingency recompute") {
    val r = Stats.qStatsChi2(spark, TestSpark.sf0001).collect()(0)
    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("c"))
      .collect().map(x => (x.getString(0),
        if (x.getLong(1) < 10000L) "low"
        else if (x.getLong(1) < 30000L) "mid" else "high"))
    val n = rows.length.toDouble
    val byCell = rows.groupBy(identity).map { case (k, v) => k -> v.length }
    val byType = rows.groupBy(_._1).map { case (k, v) => k -> v.length }
    val byBand = rows.groupBy(_._2).map { case (k, v) => k -> v.length }
    val chi2 = byCell.map { case ((t, b), o) =>
      val e = byType(t).toDouble * byBand(b).toDouble / n
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(r.getDouble(0) - chi2) < 1e-5, s"${r.getDouble(0)} vs $chi2")
    assert(r.getLong(1) == (byType.size - 1).toLong * (byBand.size - 1))
    assert(r.getLong(2) == rows.length.toLong)
    assert(r.getDouble(0) >= 0.0)
  }

  test("mad outliers match an in-memory median/MAD recompute") {
    def medianOf(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      // the interpolated (type-7) quantile both engines implement
      val pos = 0.5 * (n - 1)
      val lo = s(pos.toInt)
      val hi = s(math.min(pos.toInt + 1, n - 1))
      lo + (pos - pos.toInt) * (hi - lo)
    }
    val ev = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byType = ev.groupBy(_._2)
    val want = ev.flatMap { case (id, t, c) =>
      val xs = byType(t).map(_._3.toDouble)
      val med = medianOf(xs)
      val adev = math.abs(c.toDouble - med)
      val mad = medianOf(xs.map(x => math.abs(x - med)))
      val score = adev / (1.4826 * mad)
      if (score >= 3.0) Some(id -> score) else None
    }.toMap
    val got = Stats.qAnomalyMad(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, sc) => assert(math.abs(sc - want(id)) < 1e-9) }
    assert(got.nonEmpty, "fixture should contain >=1 robust outlier")
  }

  test("column profile matches independent per-column recompute") {
    val rows = Stats.qProfileColumns(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("l_returnflag", "l_linestatus", "l_quantity",
      "l_orderkey", "l_linenumber"))
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val n = li.count()
    rows.values.foreach { r =>
      assert(r.getLong(1) == n, "n_rows")
      assert(r.getLong(2) == 0L, "fixture has no nulls")
      assert(r.getLong(3) <= n, "distinct bounded")
    }
    val distinctFlags = li.select("l_returnflag").distinct().count()
    assert(rows("l_returnflag").getLong(3) == distinctFlags)
    val qs = li.agg(min(col("l_quantity")), max(col("l_quantity"))).collect()(0)
    assert(rows("l_quantity").getString(4) == qs.getDouble(0).toLong.toString)
    assert(rows("l_quantity").getString(5) == qs.getDouble(1).toLong.toString)
  }

  test("scd2: per-user intervals chain exactly and one row is current") {
    val rows = Stats.qScd2(spark, TestSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getInt(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(_._3.getTime)
      // exactly one open (current) interval per user, and it is the last
      assert(sorted.count(_._4.isEmpty) == 1, s"user $u current rows")
      assert(sorted.last._4.isEmpty)
      // each interval's close is the next interval's open
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        val (a, b) = (pair(0), pair(1))
        assert(a._4.contains(b._3), s"user $u gap ${a._4} -> ${b._3}")
        // consecutive intervals never share a type (that's the change test)
        assert(a._2 != b._2, s"user $u un-collapsed run")
      }
      assert(sorted.forall(r => (r._5 == 1) == r._4.isEmpty))
    }
  }

  test("ks statistic matches a brute-force recompute and sits in [0,1]") {
    val r = Stats.qStatsKs(spark, TestSpark.sf001).collect()(0)
    val (na, nb, ksNum, ksStat) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val rows = Tables.events(spark, TestSpark.sf001)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_type"), floor(col("value") * 100).cast("bigint"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val a = rows.filter(_._1 == "view").map(_._2)
    val b = rows.filter(_._1 == "click").map(_._2)
    assert(na == a.length.toLong && nb == b.length.toLong)
    val brute = (a ++ b).distinct.map { v =>
      math.abs(nb * a.count(_ <= v) - na * b.count(_ <= v))
    }.max
    assert(ksNum == brute)
    assert(ksStat == brute.toDouble / (na.toDouble * nb.toDouble))
    assert(ksStat >= 0.0 && ksStat <= 1.0)
  }

  test("mwu: doubled rank-sum matches a brute-force midrank recompute") {
    val r = Stats.qStatsMwu(spark, TestSpark.sf001).collect()(0)
    val (na, nb, u2a, auc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val rows = Tables.events(spark, TestSpark.sf001)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_type"), floor(col("value") * 100).cast("bigint"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    val a = rows.filter(_._1 == "view").map(_._2)
    val b = rows.filter(_._1 == "click").map(_._2)
    assert(na == a.length.toLong && nb == b.length.toLong)
    val all = a ++ b
    // 2·midrank(v) = 2·|{x < v}| + |{x = v}| + 1
    def mid2(v: Long): Long = 2L * all.count(_ < v) + all.count(_ == v) + 1
    val r2a = a.map(mid2).sum
    assert(u2a == r2a - na * (na + 1))
    assert(auc == u2a.toDouble / (2.0 * na.toDouble * nb.toDouble))
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("autocorr: matches in-memory Pearson r of consecutive daily sums") {
    val r = Stats.qStatsAutocorr(spark, TestSpark.sf001).collect()(0)
    val (n, r1) = (r.getLong(0), r.getDouble(1))
    assert(r1 >= -1.0 && r1 <= 1.0)
    val daily = Tables.orders(spark, TestSpark.sf001)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("bigint")).as("rev"))
      .orderBy("day").collect().map(_.getLong(1))
    val xs = daily.dropRight(1).map(_.toDouble)
    val ys = daily.drop(1).map(_.toDouble)
    assert(n == xs.length.toLong)
    val m = xs.length.toDouble
    val (mx, my) = (xs.sum / m, ys.sum / m)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum / m
    val vx = xs.map(x => (x - mx) * (x - mx)).sum / m
    val vy = ys.map(y => (y - my) * (y - my)).sum / m
    assert(math.abs(r1 - cov / math.sqrt(vx * vy)) < 1e-9)
  }

  test("seasonal dow: residuals are mean-zero within every weekday") {
    val rows = graft.operators.Stats.qSeasonalDow(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (dow, rs) =>
      val meanResidual = rs.map(_._4).sum / rs.length
      assert(math.abs(meanResidual) < 1e-6, s"dow $dow residual mean")
      rs.foreach { case (_, rev, dowMean, resid) =>
        assert(math.abs(rev - dowMean - resid) < 1e-9)
      }
    }
    assert(rows.map(_._1).distinct.sorted.toSeq == (0 to 6))
  }

  test("bootstrap: resample means bracket the plain mean, weights conserve") {
    val rows = graft.operators.Stats.qStatsBootstrap(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 32)
    val plainMean = Tables.events(spark, TestSpark.sf0001)
      .agg(avg(floor(col("value") * 100 + 0.5) / 100.0)).collect()(0).getDouble(0)
    val means = rows.map(_._4)
    // Poisson(1) weights: every resample's effective n is near the corpus
    // size and the bootstrap distribution straddles the plain mean.
    val n = Tables.events(spark, TestSpark.sf0001).count()
    rows.foreach { case (_, nEff, _, _) =>
      assert(math.abs(nEff - n) < n * 0.2, s"n_eff $nEff vs $n")
    }
    assert(means.min < plainMean && plainMean < means.max)
  }

  test("winsorize: exact discrete 5/95 bounds and the clamped mean") {
    val got = Stats.qStatsWinsorize(spark, TestSpark.sf001).collect()
    assert(got.nonEmpty)
    val byType = Tables.events(spark, TestSpark.sf001)
      .select(col("event_type"), floor(col("value") * 100).cast("bigint"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
      .groupBy(_._1)
    assert(got.length == byType.size)
    got.foreach { r =>
      val (t, n, lo, hi, m) = (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))
      val xs = byType(t).map(_._2).sorted
      assert(n == xs.length.toLong)
      val dv = xs.distinct
      assert(lo == dv.find(v => 20L * xs.count(_ <= v) >= n).get)
      assert(hi == dv.find(v => 20L * xs.count(_ <= v) >= 19L * n).get)
      val clamped = xs.map(v => math.max(lo, math.min(hi, v)))
      assert(m == clamped.sum.toDouble / n.toDouble)
      assert(lo <= hi && m >= lo.toDouble && m <= hi.toDouble)
    }
  }

  test("ewma: matches an exact-integer scalar recompute of the FIR form") {
    val rows = graft.operators.Stats.qStatsEwma(spark, TestSpark.sf001).collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length > 41, "need more days than the FIR horizon")
    val revCents = rows.map(r => math.round(r._2 * 100))
    rows.indices.foreach { t =>
      var num = BigInt(0); var den = BigInt(0)
      (0 to 40).foreach { k =>
        if (t - k >= 0) {
          val wgt = BigInt(1) << (40 - k)
          num += BigInt(revCents(t - k)) * wgt
          den += wgt
        }
      }
      val exp = num.toDouble / den.toDouble / 100.0
      assert(math.abs(rows(t)._3 - exp) < 1e-5, s"row $t: ${rows(t)._3} vs $exp")
      // smoothing stays inside the window's envelope
      val window = revCents.slice(math.max(0, t - 40), t + 1).map(_ / 100.0)
      assert(rows(t)._3 >= window.min - 1e-6 && rows(t)._3 <= window.max + 1e-6)
    }
    // first observation: ewma equals the revenue itself
    assert(math.abs(rows.head._3 - rows.head._2) < 1e-6)
  }

  test("psi: counts partition the stream, contributions match a scalar recompute") {
    val rows = graft.operators.Stats.qDriftPsi(spark, TestSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.map(_._1).distinct.length == rows.length)
    val ev = Tables.events(spark, TestSpark.sf001)
      .select(col("ts"), col("value")).collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1)))
    assert(rows.map(r => r._2 + r._3).sum == ev.length.toLong,
      "every event lands in exactly one (bucket, half) cell")
    val split = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val byB = ev.groupBy { case (_, v) =>
      math.min(math.floor(math.floor(v * 100) / 250.0), 15.0).toLong }
    val tRef = ev.count(_._1.before(split)).toDouble
    val tCur = ev.length - tRef
    rows.foreach { case (b, nRef, nCur, part) =>
      val cell = byB.getOrElse(b, Array.empty[(java.sql.Timestamp, Double)])
      assert(nRef == cell.count(_._1.before(split)).toLong, s"bucket $b ref")
      assert(nCur == cell.length - nRef, s"bucket $b cur")
      val pp = (nRef + 1.0) / (tRef + 16.0)
      val qq = (nCur + 1.0) / (tCur + 16.0)
      val exp = BigDecimal((pp - qq) * math.log(pp / qq))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(part - exp) < 1e-9, s"bucket $b: $part vs $exp")
    }
  }

  test("cov: matches an exact BigInt power-sum recompute, symmetry by construction") {
    val rows = graft.operators.Stats.qStatsCov(spark, TestSpark.sf001).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getDouble(2), r.getLong(3)))).toMap
    assert(rows.size == 6)
    val li = Tables.lineitem(spark, TestSpark.sf001)
      .select(round(col("l_quantity")).cast("long"),
        round(col("l_extendedprice") * 100).cast("long"),
        round(col("l_discount") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = li.length
    def covOf(fa: ((Long, Long, Long)) => Long,
        fb: ((Long, Long, Long)) => Long): Double = {
      val sab = li.map(t => BigInt(fa(t)) * BigInt(fb(t))).sum
      val sa = li.map(t => BigInt(fa(t))).sum
      val sb = li.map(t => BigInt(fb(t))).sum
      (BigInt(n) * sab - sa * sb).toDouble / (n.toDouble * n.toDouble)
    }
    val fs = Map("qty" -> ((t: (Long, Long, Long)) => t._1),
      "price" -> ((t: (Long, Long, Long)) => t._2),
      "disc" -> ((t: (Long, Long, Long)) => t._3))
    rows.foreach { case ((a, b), (got, nGot)) =>
      assert(nGot == n.toLong)
      val exp = covOf(fs(a), fs(b))
      assert(math.abs(got - exp) <= math.abs(exp) * 1e-12 + 1e-12,
        s"cov($a,$b): $got vs $exp")
    }
    // variances are non-negative; price variance dominates (cents scale)
    assert(rows(("qty", "qty"))._1 >= 0 && rows(("price", "price"))._1 >= 0)
    assert(rows(("price", "price"))._1 > rows(("qty", "qty"))._1)
  }

  test("Cohen's kappa: bounds, degenerate guard, and a hand-checked 2x2") {
    val rows = graft.operators.Stats.qAgreeKappa(spark, TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("n_both") + r.getAs[Long]("n_neither") +
        r.getAs[Long]("n_only_a") + r.getAs[Long]("n_only_b") == n)
      if (!r.isNullAt(r.fieldIndex("kappa"))) {
        val k = r.getAs[Double]("kappa")
        assert(k >= -1.0 - 1e-12 && k <= 1.0 + 1e-12, s"kappa out of range: $k")
        // hand-computed from the emitted counts
        val (nb, nn, na, no) = (r.getAs[Long]("n_both").toDouble,
          r.getAs[Long]("n_neither").toDouble,
          r.getAs[Long]("n_only_a").toDouble, r.getAs[Long]("n_only_b").toDouble)
        val po = (nb + nn) / n
        val pa = (nb + na) / n
        val pb = (nb + no) / n
        val pe = pa * pb + (1 - pa) * (1 - pb)
        assert(math.abs(k - (po - pe) / (1 - pe)) < 1e-9)
      }
    }
  }

  test("Benford screen: digits partition the table, reference is a distribution") {
    val rows = graft.operators.Stats.qStatsBenford(spark, TestSpark.sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (1 to 9))
    val nOrders = Tables.orders(spark, TestSpark.sf0001).count()
    assert(rows.map(_._2).sum == nOrders)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    // Benford reference shares sum to 1 and decrease with the digit
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-5)
    assert(rows.toSeq.sliding(2).forall {
      case Seq((_, _, _, p1), (_, _, _, p2)) => p1 > p2
      case _ => true })
  }
}

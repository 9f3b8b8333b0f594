package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quant

/** Semantic invariants of the quantitative-distribution family at
  * sf0.001 (value-level correctness is the driver's DuckDB oracle gate). */
class QuantSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("gini: one row per nation, coefficient in [0, 1)") {
    val rows = Quant.qGiniNation(spark, TestSpark.sf0001).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val g = r.getDouble(2)
      assert(g >= 0.0 && g < 1.0, s"${r.getString(0)}: gini $g out of range")
    }
  }

  test("weighted median: splits the quantity mass within every nation") {
    val med = Quant.qWeightedMedian(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = Tables.lineitem(spark, TestSpark.sf0001)
      .join(broadcast(Tables.supplier(spark, TestSpark.sf0001)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, TestSpark.sf0001)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        Tables.cents(col("l_extendedprice")).as("pc"),
        round(col("l_quantity")).cast("bigint").as("wt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    med.foreach { case (nat, tot, m) =>
      val items = rows.filter(_._1 == nat)
      assert(items.map(_._3).sum == tot)
      val below = items.filter(_._2 < m).map(_._3).sum
      val upto = items.filter(_._2 <= m).map(_._3).sum
      assert(2 * below < tot, s"$nat: too much mass strictly below the median")
      assert(2 * upto >= tot, s"$nat: median does not reach half the mass")
    }
  }

  test("cusum: 20 rows, ranked by |score| descending, scores sum shape") {
    val rows = Quant.qCusumDaily(spark, TestSpark.sf0001).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == 20)
    val mags = rows.map(r => math.abs(r._3))
    assert(mags.zip(mags.tail).forall { case (a, b) => a >= b },
      "not sorted by |cusum| desc")
    assert(rows.map(_._1).distinct.length == 20, "duplicate days")
  }

  test("Theil-Sen: matches an in-memory median of pairwise slopes") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.Quant.qQuantTheilSen(spark, TestSpark.sf0001)
      .collect().head
    val daily = Tables.orders(spark, TestSpark.sf0001)
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(Tables.cents(col("o_totalprice"))).as("rev"))
      .select(datediff(col("d"), lit("1992-01-01").cast("date")), col("rev"))
      .collect().map(x => (x.getInt(0), x.getLong(1)))
    val slopes = (for {
      (d1, r1) <- daily; (d2, r2) <- daily if d1 < d2
    } yield (r2 - r1).toDouble / (d2 - d1)).sorted
    assert(r.getAs[Long]("n_days") == daily.length)
    assert(r.getAs[Long]("n_pairs") == daily.length.toLong * (daily.length - 1) / 2)
    val m = slopes.length
    val med = if (m % 2 == 1) slopes(m / 2)
      else slopes(m / 2 - 1) + 0.5 * (slopes(m / 2) - slopes(m / 2 - 1))
    assert(math.abs(r.getAs[Double]("sen_slope") - med) < 1e-9)
  }

  test("holt: the shipped fold matches an in-memory integer recurrence day for day") {
    val daily = spark.read
      .parquet(TestSpark.sf0001 + "/orders.parquet")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      .orderBy("d").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)))
    var l = 0L; var b = 0L
    val expected = daily.zipWithIndex.map { case ((d, y), t) =>
      val fitted = if (t == 0) y else l + b
      val nl = if (t == 0) y else (y + l + b) >> 1
      val nb = if (t == 0) 0L else (b + nl - l) >> 1
      l = nl; b = nb
      (d, y, fitted, y - fitted, nl, nb)
    }.toSeq
    val got = Quant.qForecastHolt(spark, TestSpark.sf0001).collect()
      .map(r => (r.getTimestamp(0).toLocalDateTime.toLocalDate.toString,
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq
    assert(got == expected)
    // trend must actually move (a flat series would make this vacuous)
    assert(got.map(_._6).distinct.length > 1)
  }

  test("binseg changepoint equals the in-memory argmax of variance reduction") {
    val daily = spark.read
      .parquet(TestSpark.sf0001 + "/orders.parquet")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      .orderBy("d").collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    val n = daily.length
    val st = daily.map(v => BigInt(v._2)).sum
    var s1 = BigInt(0)
    val best = daily.dropRight(1).zipWithIndex.map { case ((d, y), i) =>
      s1 += y
      val k = i + 1
      val inner = BigInt(n - k) * s1 - BigInt(k) * (st - s1)
      val score = (inner * inner).toDouble / (k.toLong * (n - k) * n).toDouble
      (d, k, score)
    }.minBy { case (d, _, sc) => (-sc, d) }
    val r = Quant.qChangepointBinseg(spark, TestSpark.sf0001).collect()(0)
    assert(r.getTimestamp(0).toLocalDateTime.toLocalDate.toString == best._1)
    assert(r.getLong(1) == best._2.toLong)
    assert(r.getDouble(5) == best._3)
    // the split genuinely separates the means
    assert(r.getDouble(3) != r.getDouble(4))
  }

  test("conformal interval: rank quantile and coverage equal an in-memory recompute") {
    val daily = spark.read
      .parquet(TestSpark.sf0001 + "/orders.parquet")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("y"))
      .orderBy("d").collect().map(r => (r.getDate(0).toString, r.getLong(1)))
    // re-run the integer Holt recurrence to get |error| per day
    var l = 0L; var b = 0L
    val errs = daily.zipWithIndex.map { case ((d, y), t) =>
      val fitted = if (t == 0) y else l + b
      val nl = if (t == 0) y else (y + l + b) >> 1
      val nb = if (t == 0) 0L else (b + nl - l) >> 1
      l = nl; b = nb
      (d, math.abs(y - fitted))
    }
    val n = errs.length
    val calN = 8 * n / 10
    val cal = errs.take(calN).sortBy(e => (e._2, e._1))
    val k = math.min((9 * (calN + 1) + 9) / 10, calN)
    val q = cal(k - 1)._2
    val test = errs.drop(calN)
    val covered = test.count(_._2 <= q)
    val r = Quant.qForecastConformal(spark, TestSpark.sf0001).collect()(0)
    assert(r.getLong(0) == calN.toLong)
    assert(r.getLong(1) == (n - calN).toLong)
    assert(r.getLong(2) == q)
    assert(r.getLong(3) == covered.toLong)
    assert(r.getDouble(4) == covered.toDouble / (n - calN))
    // the split-conformal guarantee should roughly hold on this series
    assert(r.getDouble(4) >= 0.8 && r.getDouble(4) <= 1.0)
  }

  test("rolling 7-day median equals an in-memory window recompute") {
    val daily = spark.read
      .parquet(TestSpark.sf0001 + "/orders.parquet")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("rev"))
      .orderBy("d").collect().map(_.getLong(1))
    val expected = daily.indices.map { i =>
      val fr = daily.slice(math.max(0, i - 3), math.min(daily.length, i + 4))
        .sorted
      val m = fr.length
      if (m % 2 == 1) fr(m / 2).toDouble
      else fr(m / 2 - 1) + 0.5 * (fr(m / 2) - fr(m / 2 - 1)).toDouble
    }
    val got = Quant.qWindowMedian(spark, TestSpark.sf0001).collect()
      .map(_.getDouble(2)).toSeq
    assert(got == expected)
  }
}

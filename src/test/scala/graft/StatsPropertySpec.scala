package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

/** Property fuzz for the statistics and temporal operators against naive
  * in-memory folds on RANDOM datasets — arbitrary group sizes, skew,
  * constant runs, and tie timestamps that the fixture tables never
  * produce. Datasets stay integer-valued so the comparisons are exact
  * where the oracles are exact. */
class StatsPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  // (group, x, y) rows: small integer values, arbitrary group skew
  private val genRows: Gen[List[(String, Double, Double)]] = for {
    n <- Gen.choose(6, 120)
    rows <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      x <- Gen.chooseNum(1, 50)
      y <- Gen.chooseNum(1, 7)
    } yield (g, x.toDouble, y.toDouble))
  } yield rows

  test("power-sum moments equal naive folds on random integer datasets") {
    import spark.implicits._
    for (rows <- sample(genRows, 12, 10L)) {
      val byG = rows.groupBy(_._1).filter { case (_, rs) =>
        // need variance > 0 in both x and y for skew/kurt/corr to exist
        rs.map(_._2).distinct.size > 1 && rs.map(_._3).distinct.size > 1
      }
      if (byG.nonEmpty) {
        val df = rows.toDF("l_returnflag", "l_quantity", "yy")
          .withColumn("l_linenumber", col("yy").cast("int"))
        val tmp = java.nio.file.Files.createTempDirectory("momfuzz").toString
        df.write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")
        val got = Stats.qStatsMoments(spark, tmp).collect()
          .map(r => r.getString(0) -> r).toMap
        byG.foreach { case (g, rs) =>
          val xs = rs.map(_._2)
          val n = xs.size.toDouble
          val mean = xs.sum / n
          def m(k: Int) = xs.map(x => math.pow(x - mean, k)).sum / n
          val r = got(g)
          assert(math.abs(r.getDouble(2) - mean) < 1e-9, s"mean g=$g")
          assert(math.abs(r.getDouble(3) - math.sqrt(m(2))) < 1e-7, "sd")
          assert(math.abs(r.getDouble(4) - m(3) / math.pow(m(2), 1.5)) < 1e-6,
            s"skew g=$g")
          assert(math.abs(r.getDouble(5) - (m(4) / (m(2) * m(2)) - 3.0)) < 1e-6,
            s"kurt g=$g")
          val ys = rs.map(_._3)
          val my = ys.sum / n
          val cov = rs.map { case (_, x, y) => (x - mean) * (y - my) }.sum / n
          val vy = ys.map(y => (y - my) * (y - my)).sum / n
          assert(math.abs(r.getDouble(6) - cov / math.sqrt(m(2) * vy)) < 1e-6,
            s"corr g=$g")
        }
      }
    }
  }

  test("debounce fold: survivors on a random log match the window form") {
    import spark.implicits._
    val genLog: Gen[List[(Long, Long, String, Long)]] = for {
      n <- Gen.choose(1, 80)
      rows <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 4L)
        t <- Gen.oneOf("x", "y")
        us <- Gen.chooseNum(0L, 40L).map(_ * 1000000L) // 0-40s, collisions likely
      } yield (u, t, us))
    } yield rows.zipWithIndex.map { case ((u, t, us), i) => (i.toLong, u, t, us) }
    for (log <- sample(genLog, 12, 20L)) {
      val df = log.toDF("event_id", "user_id", "event_type", "us")
        .withColumn("ts", timestamp_micros(col("us")))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
      val got = df
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap_us").isNull || col("gap_us") > lit(5000000L))
        .select("event_id").collect().map(_.getLong(0)).toSet
      val want = log.groupBy(e => (e._2, e._3)).flatMap { case (_, es) =>
        val sorted = es.sortBy(e => (e._4, e._1))
        sorted.headOption.map(_._1).toSeq ++
          sorted.sliding(2).filter(_.length == 2)
            .filter(p => p(1)._4 - p(0)._4 > 5000000L).map(_(1)._1)
      }.toSet
      assert(got == want, s"log=$log")
    }
  }

  test("cdc last-op-wins on random logs incl. timestamp ties") {
    import spark.implicits._
    val genLog: Gen[List[(Long, Long, String, Long, Double)]] = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 5L)
        t <- Gen.oneOf("view", "error", "purchase")
        us <- Gen.chooseNum(0L, 10L).map(_ * 1000000L) // heavy tie pressure
        v <- Gen.chooseNum(1, 999)
      } yield (u, t, us, v.toDouble / 100.0))
    } yield rows.zipWithIndex.map { case ((u, t, us, v), i) =>
      (i.toLong, u, t, us, v)
    }
    for (log <- sample(genLog, 12, 30L)) {
      val df = log.toDF("event_id", "user_id", "event_type", "us", "value")
        .withColumn("ts", timestamp_micros(col("us")))
        .select("event_id", "user_id", "event_type", "ts", "value")
      val tmp = java.nio.file.Files.createTempDirectory("cdcfuzz").toString
      df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val got = Stats.qCdcApply(spark, tmp).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
      val want = log.groupBy(_._2).flatMap { case (u, es) =>
        val last = es.maxBy(e => (e._4, e._1))
        if (last._3 == "error") None
        else Some(u -> (math.floor(last._5 * 100).toLong, es.size.toLong))
      }
      assert(got == want, s"log=$log")
    }
  }
}

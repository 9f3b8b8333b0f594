package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Selection}

/** Semantic properties of the corpus-selection operators (exact outputs
  * are oracle-checked against DuckDB by the driver; these cover the
  * invariants the hashes can't express). */
class SelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mix reweight: weights renormalize and move WITH excess loss") {
    val rows = Selection.qMixReweight(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getAs[Double]("loss"),
        r.getAs[Double]("w0"), r.getAs[Double]("w1")))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    val meanLoss = rows.map(r => r._2 * r._3).sum // w0-weighted corpus loss
    rows.foreach { case (src, loss, w0, w1) =>
      if (loss > meanLoss + 1e-6)
        assert(w1 > w0, s"$src: above-mean loss must gain weight")
      else if (loss < meanLoss - 1e-6)
        assert(w1 < w0, s"$src: below-mean loss must lose weight")
    }
  }

  test("A-ES weighted sample: exact scalar recompute, weight monotonicity") {
    val got = Selection.qSampleWeighted(spark, TestSpark.sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 50)
    // exact recompute: same md5-derived uniform, same key formula
    val docs = Tables.documents(spark, TestSpark.sf001)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(_._2 > 0)
    val md = java.security.MessageDigest.getInstance("MD5")
    def keyOf(id: Long, w: Long): Double = {
      val hex = md.digest(s"aes$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      val u = java.lang.Long.parseLong(hex, 16).toDouble / math.pow(16.0, 13)
      // Spark's Log expression evaluates via StrictMath (platform-stable),
      // not Math — match it for the bit-exact comparison
      StrictMath.log(u) / w.toDouble
    }
    val want = docs.map { case (id, w) => (id, w, keyOf(id, w)) }
      .sortBy { case (id, _, k) => (-k, id) }.take(50)
    assert(got.map(_._1).toSeq == want.map(_._1).toSeq, "selection differs")
    got.zip(want).foreach { case ((_, _, gk), (_, _, wk)) =>
      // the query reports the key rounded to 6 dp (oracle convention for
      // ln-derived floats); selection above still used the raw key
      val wkr = BigDecimal(wk)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(gk == wkr, s"key mismatch $gk vs $wkr")
    }
    // weight pressure: sampled docs skew long vs the corpus average
    val corpusAvg = docs.map(_._2).sum.toDouble / docs.length
    val sampleAvg = got.map(_._2).sum.toDouble / got.length
    assert(sampleAvg > corpusAvg, s"sample $sampleAvg !> corpus $corpusAvg")
  }

  test("KL mix diagnostic: non-negative per source, totals partition the corpus") {
    val rows = Selection.qMixKl(spark, TestSpark.sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // Gibbs' inequality: KL(P_s || P_c) >= 0, zero only if the source IS
    // the corpus distribution (never on a multi-source fixture)
    rows.foreach { case (src, _, _, kl) =>
      assert(kl >= 0.0, s"$src KL $kl < 0")
    }
    // per-source token totals partition the corpus token count
    val corpusTokens = Tables.documents(spark, TestSpark.sf001)
      .select(org.apache.spark.sql.functions.size(
        graft.functions.TextAnalysis.tokens(
          org.apache.spark.sql.functions.col("text"))).as("n"))
      .agg(org.apache.spark.sql.functions.sum("n")).collect()(0).getLong(0)
    assert(rows.map(_._2).sum == corpusTokens)
  }

  test("weighted mix: per-language keep rate tracks its configured weight") {
    val docs = Tables.documents(spark, TestSpark.sf001)
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Selection.qMixWeighted(spark, TestSpark.sf001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Map("en" -> 1.0, "de" -> 0.5, "fr" -> 0.5,
      "es" -> 0.25, "zh" -> 0.125)
    expected.foreach { case (lang, rate) =>
      val n = totals(lang)
      val k = kept.getOrElse(lang, 0L)
      // 4-sigma Bernoulli band around the configured rate
      val sd = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(k - n * rate) <= 4 * sd + 1,
        s"$lang kept $k of $n at configured rate $rate")
    }
    assert(kept("en") == totals("en")) // rate 1.0 keeps everything
    assert(kept.keySet.subsetOf(expected.keySet)) // allowlist semantics
  }

  test("weighted mix: invariant under repartitioning") {
    val a = Selection.qMixWeighted(spark, TestSpark.sf001).collect().toSeq
    val b = Selection.qMixWeighted(spark, TestSpark.sf001)
      .repartition(17).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("temperature mix: every language lands exactly on its sqrt cap") {
    val totals = Tables.documents(spark, TestSpark.sf001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Selection.qMixTemperature(spark, TestSpark.sf001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, n) =>
      val cap = math.min(n, math.floor(8 * math.sqrt(n.toDouble)).toLong)
      assert(kept(lang) == cap, s"$lang kept ${kept(lang)} != cap $cap of $n")
    }
    // the flattening property: kept share of a hot language is strictly
    // below its corpus share, rare languages keep a larger share
    val hot = totals.maxBy(_._2)._1
    val rare = totals.minBy(_._2)._1
    assert(kept(hot).toDouble / totals(hot) < kept(rare).toDouble / totals(rare))
  }

  test("epoch mix: each doc appears exactly its language's epoch count") {
    val epochs = Map("en" -> 1, "de" -> 2, "fr" -> 2, "es" -> 3, "zh" -> 4)
    val rows = Selection.qMixEpochs(spark, TestSpark.sf001).collect()
    assert(rows.map(r => (r.getLong(0), r.getInt(2))).distinct.length == rows.length)
    val perDoc = rows.groupBy(_.getLong(0))
    perDoc.values.foreach { copies =>
      val lang = copies.head.getString(1)
      assert(copies.length == epochs(lang))
      assert(copies.map(_.getInt(2)).sorted.toSeq == (1 to epochs(lang)))
    }
  }

  test("global shuffle: pos is a dense permutation consistent with hash order") {
    val rows = Selection.qShuffleGlobal(spark, TestSpark.sf001).collect()
    val n = Tables.documents(spark, TestSpark.sf001).count()
    assert(rows.length == n) // every doc placed, none duplicated
    assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to n).toSeq)
    // two-level rank == global (h, doc_id) sort order
    val byPos = rows.sortBy(_.getLong(2)).map(r => (r.getString(1), r.getLong(0)))
    assert(byPos.toSeq == byPos.sortBy(identity).toSeq)
  }

  test("two-level rank == single global sort rank on random key sets") {
    // the construction behind qShuffleGlobal/qSelectBudget/qMixTemperature:
    // rank within hash-prefix buckets + broadcast prefix-summed offsets
    // must equal row_number over the global (key, id) order for ANY input
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 200 + rnd.nextInt(300)
      val rows = (0 until n).map(i => (rnd.nextLong().abs % 1000000L, i.toLong))
      val base = rows.toDF("id", "salt")
        .select(col("id"), md5(concat(lit(trial.toString), col("id"), col("salt"))).as("h"))
        .withColumn("bkt", substring(col("h"), 1, 2))
      val withinW = Window.partitionBy(col("bkt")).orderBy(col("h"), col("id"))
      val offW = Window.orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = base.groupBy(col("bkt")).agg(count(lit(1)).as("n"))
        .withColumn("off", coalesce(sum(col("n")).over(offW), lit(0L)))
        .select(col("bkt"), col("off"))
      val twoLevel = base
        .withColumn("rn", row_number().over(withinW).cast("bigint"))
        .join(broadcast(offsets), "bkt")
        .select(col("h"), col("id"), (col("off") + col("rn")).as("pos"))
      val global = base.withColumn("pos",
        row_number().over(Window.orderBy(col("h"), col("id"))).cast("bigint"))
        .select(col("h"), col("id"), col("pos"))
      assert(twoLevel.orderBy("pos").collect().toSeq ==
        global.orderBy("pos").collect().toSeq, s"trial $trial n=$n")
    }
  }

  test("budget select: admitted docs start inside the budget, best-first") {
    val rows = Selection.qSelectBudget(spark, TestSpark.sf001).collect()
    assert(rows.nonEmpty)
    // every admitted doc's preceding mass is under the budget
    rows.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) < Selection.tokenBudget)
    }
    // the selection is a prefix of the score-ordered corpus: no excluded
    // doc outscores an admitted one (ties broken by doc_id inside the rank)
    val keptIds = rows.map(_.getLong(0)).toSet
    val minKeptScore = rows.map(_.getDouble(1)).min
    val excluded = Tables.documents(spark, TestSpark.sf001)
      .select(col("doc_id"),
        graft.functions.TextAnalysis.qualityScore(col("text")).as("s"))
      .collect().filterNot(r => keptIds.contains(r.getLong(0)))
    assert(excluded.forall(_.getDouble(1) <= minKeptScore + 1e-12))
  }

  test("canonical pick: mirror tier wins every duplicate group") {
    val rows = Dedup.qDedupCanonical(spark, TestSpark.sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) == 0, s"canonical_tier ${r.getInt(2)} not mirror")
      assert(r.getLong(1) >= 100000 && r.getLong(1) < 200000)
      // the mirror's original is in the bounded member list
      val members = r.getString(4).split(",").map(_.toLong)
      assert(members.contains(r.getLong(1) - 100000))
    }
  }

  test("Neyman allocation: budget respected, counts exact, monotone in N*sigma") {
    val rows = graft.operators.Selection.qSampleNeyman(spark, TestSpark.sf001)
      .collect().map(r => (r.getString(0), r.getAs[Long]("doc_id"),
        r.getInt(2), r.getInt(3)))
    val perLang = rows.groupBy(_._1)
    // every stratum fills its allocation exactly; floors keep the total
    // within [budget - strata, budget]
    perLang.foreach { case (lang, rs) =>
      assert(rs.length == rs.head._4, s"$lang selected ${rs.length} of ${rs.head._4}")
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length))
    }
    val total = perLang.values.map(_.head._4).sum
    assert(total <= 100 && total >= 100 - perLang.size)
    // allocation is monotone in the stratum weight N*sigma
    import org.apache.spark.sql.functions._
    val w = Tables.documents(spark, TestSpark.sf001)
      .groupBy("lang").agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("m1"),
        sum(col("n_chars") * col("n_chars")).as("m2"))
      .collect().map { r =>
        val n = r.getLong(1); val m1 = r.getLong(2); val m2 = r.getLong(3)
        r.getString(0) -> math.sqrt((n * m2 - m1 * m1).toDouble) // N*sigma*N/N = sqrt/1... proportional
      }.toMap
    val alloc = perLang.view.mapValues(_.head._4).toMap
    for (a <- alloc.keys; b <- alloc.keys if w(a) > w(b))
      assert(alloc(a) + 1 >= alloc(b), s"alloc($a)=${alloc(a)} < alloc($b)=${alloc(b)}")
  }

  test("dsir: exactly 200 selected, scores descend, and the English target is enriched") {
    val rows = Selection.qSelectDsir(spark, TestSpark.sf0001).collect()
    assert(rows.length == 200)
    val scored = rows.map(r => (r.getDouble(2), r.getLong(0)))
    // selection order: score desc, then doc_id — fully deterministic
    assert(scored.sameElements(scored.sortBy { case (s, id) => (-s, id) }))
    val lang = spark.read.parquet(TestSpark.sf0001 + "/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val selEn = rows.count(r => lang(r.getLong(0)) == "en").toDouble / rows.length
    val baseEn = lang.values.count(_ == "en").toDouble / lang.size
    assert(selEn > baseEn,
      s"importance weights failed to enrich the target: $selEn <= $baseEn")
  }
}

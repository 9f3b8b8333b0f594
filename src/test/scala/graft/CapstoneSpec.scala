package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Capstone, Scrape}

/** Semantic invariants of the capstone composites — properties the
  * DuckDB hash-compare cannot express (it proves equality with the
  * oracle SQL; these prove the PIPELINE means what it claims).
  */
class CapstoneSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  test("corpus build: selection is the greedy quality prefix under the budget") {
    val sel = Capstone.qCapstoneCorpus(spark, dir).collect()
    assert(sel.nonEmpty)
    // Every admitted doc STARTS inside the budget.
    val starts = sel.map(r => r.getAs[Long]("cum_tokens") - r.getAs[Long]("n_tokens"))
    assert(starts.forall(_ < Capstone.tokenBudget))
    // No eval-set doc leaks into the training selection.
    assert(sel.forall(_.getAs[Long]("doc_id") % 97 != 0))
    // Greedy prefix: the worst admitted quality is >= the best quality
    // among eligible-but-excluded docs (modulo the doc_id tiebreak).
    val admitted = sel.map(_.getAs[Double]("quality")).min
    val admittedIds = sel.map(_.getAs[Long]("doc_id")).toSet
    import graft.functions.TextAnalysis.qualityScore
    val excludedBest = Tables.documents(spark, dir)
      .filter(col("doc_id") % 97 =!= 0)
      .withColumn("score", qualityScore(col("text")))
      .filter(col("score") >= 0.5)
      .filter(!col("doc_id").isInCollection(admittedIds))
      .agg(max(round(col("score"), 6))).collect()(0)
    if (!excludedBest.isNullAt(0))
      assert(excludedBest.getDouble(0) <= admitted + 1e-9)
    // cum_tokens is consistent: max cum equals the sum of admitted tokens.
    assert(sel.map(_.getAs[Long]("cum_tokens")).max ==
      sel.map(_.getAs[Long]("n_tokens")).sum)
  }

  test("observed corpus build: funnel metrics ride the pipeline's own pass") {
    import graft.functions.TextAnalysis.{qualityScore, tokens}
    val (df, obs) = Capstone.corpusBuildObserved(Tables.documents(spark, dir))
    val out = df.collect()
    val metrics = obs.get
    // Recompute the gate independently; the observed numbers must match.
    val expect = Tables.documents(spark, dir)
      .filter(qualityScore(col("text")) >= 0.5)
      .agg(count(lit(1)), sum(size(tokens(col("text"))).cast("bigint")))
      .collect()(0)
    assert(metrics("n_gated") == expect.getLong(0))
    assert(metrics("gated_tokens") == expect.getLong(1))
    // The observed result is the same selection as the plain build.
    val plain = Capstone.qCapstoneCorpus(spark, dir).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ==
      plain.map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("session cohorts: user conservation and conversion bounds") {
    val rows = Capstone.qCapstoneSessions(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_users"))
      assert(r.getAs[Long]("n_sessions") >= r.getAs[Long]("n_users"))
      assert(r.getAs[Long]("n_purchase_sessions") <= r.getAs[Long]("n_sessions"))
    }
    // Every user lands in exactly one cohort.
    val totalUsers = Tables.events(spark, dir)
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n_users")).sum == totalUsers)
  }

  test("scrape audit: metrics reconcile with the standalone operators") {
    val m = Capstone.qCapstoneScrape(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(m.keySet == Set("insert", "update", "unchanged",
      "mime_preserved", "deleted", "seen"))
    val scanN = Scrape.filesScan(spark, dir).count()
    assert(m("insert") + m("update") + m("unchanged") == scanN)
    assert(m("deleted") ==
      Scrape.deletions(Scrape.filesCurrent(spark, dir),
        Scrape.filesScan(spark, dir),
        lit("2026-01-15 00:00:00").cast("timestamp")).count())
    assert(m("seen") ==
      Scrape.seenKeys(Scrape.filesCurrent(spark, dir),
        Scrape.filesScan(spark, dir)).count())
    assert(m("mime_preserved") <= m("unchanged"))
  }

  test("release gate: dedup removes exactly the gated copies, PII count matches") {
    val rows = Capstone.qCapstoneRelease(spark, dir).collect()
    assert(rows.length == 20)
    // Independent dedup formulation (groupBy-join winners vs the
    // pipeline's window rank), robust to natural cross-source dups: a
    // copy's n_chars equals its original's, so the gate treats pairs
    // consistently, and the min-doc_id winner per text is released.
    val d = Tables.documents(spark, dir)
    val corpus0 = d.unionByName(d.filter(col("doc_id") % 11 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L))
      .filter(col("n_chars") >= 100)
    val winners = corpus0.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .join(corpus0.withColumn("h", md5(col("text"))), Seq("h", "doc_id"))
    val gatedOrig = winners.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expPii = winners.filter(col("doc_id") % 7 === 0).groupBy("source")
      .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getAs[Long]("n_released") == gatedOrig(src))
      assert(r.getAs[Long]("n_raw") >= gatedOrig(src))
      assert(r.getAs[Long]("n_pii_docs") == expPii.getOrElse(src, 0L))
      assert(r.getAs[Long]("min_k") >= 1)
      assert(math.abs(r.getAs[Double]("n_public") -
        r.getAs[Long]("n_released")) <= 361.0)
    }
  }

  test("hybrid retrieval: fusion formula exact, both retrievers contribute") {
    val rows = Capstone.qCapstoneHybrid(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), Option(r.getAs[Integer]("lex_rank")),
        Option(r.getAs[Integer]("dense_rank")), r.getAs[Double]("fused")))
    assert(rows.length == 10)
    rows.foreach { case (_, lr, dr, f) =>
      val exp = lr.map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
        dr.map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      assert(f == exp)
      assert(lr.nonEmpty || dr.nonEmpty)
    }
    // scores descend; a doc found by BOTH retrievers outranks any
    // found by one at comparable rank, so the fused head is dual-hit
    // whenever any dual-hit exists
    assert(rows.toSeq.sliding(2).forall {
      case Seq((_, _, _, f1), (_, _, _, f2)) => f1 >= f2
      case _ => true })
    if (rows.exists(r => r._2.nonEmpty && r._3.nonEmpty))
      assert(rows.head._2.nonEmpty || rows.head._3.nonEmpty)
  }
}

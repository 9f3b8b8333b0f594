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
      .withColumn("doc_id", col("doc_id") + 1099511627776L))
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

  test("entity resolution == in-memory brute-force match + union-find + survivorship") {
    case class E(ekey: Long, name: String, nation: Long, acctbal: Double)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val base = spark.read.parquet(TestSpark.sf0001 + "/customer.parquet")
      .selectExpr("cast(c_custkey as bigint)", "c_name",
        "cast(c_nationkey as bigint)", "c_acctbal")
      .collect().map(r => E(r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    val entities = base ++
      base.filter(e => e.ekey % 3 == 0 && e.ekey < 90000).map(e =>
        E(e.ekey + 1099511627776L, e.name.substring(0, 10) + e.name.substring(11),
          e.nation, e.acctbal + 37.5))
    val pairs = for {
      a <- entities; b <- entities
      if a.ekey < b.ekey && a.nation == b.nation &&
        a.name.length != b.name.length && lev(a.name, b.name) <= 1
    } yield (a.ekey, b.ekey)
    // union-find
    val parent = scala.collection.mutable.Map(entities.map(e => e.ekey -> e.ekey): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val clustered = entities.filter(e => find(e.ekey) != e.ekey ||
      pairs.exists(p => p._1 == e.ekey || p._2 == e.ekey))
    val expected = clustered.groupBy(e => find(e.ekey)).map { case (cid, ms) =>
      val g = ms.minBy(e => (-e.acctbal, e.ekey))
      (cid, ms.length.toLong, g.ekey, g.name, g.acctbal)
    }.toSeq.sortBy(_._1)
    val got = Capstone.qCapstoneEntity(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
    // every injected variant resolved into a cluster with its source
    got.foreach { case (cid, _, _, _, _) => assert(cid < 1099511627776L) }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pipeline

/** Semantic properties of the training-pipeline operators (their exact
  * outputs are oracle-checked against DuckDB by the driver; these cover
  * the properties the hashes can't express). */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pack_sequences: segment count is bounded at every corpus scale") {
    // The r6 scale flag: a FIXED segment size makes the partition-less
    // offsets window grow linearly with the corpus. The sizing formula
    // must cap the segment count (rows through that one task) regardless
    // of the id domain — probe it far past any test fixture.
    for (maxId <- Seq(0L, 500L, 1000000L, 1000000000L, 1000000000000L,
        1000000000000000L)) {
      val segSize = graft.operators.Pipeline.packSegSize(maxId)
      val segments = maxId / segSize + 1
      assert(segments <= 4097, s"maxId=$maxId -> $segments segments")
      assert(segSize >= 256L, s"maxId=$maxId -> degenerate segSize $segSize")
    }
  }

  test("zipf fit: negative slope, sane r2, bounded term count") {
    val r = graft.functions.TextAnalysis.qTextZipf(spark, TestSpark.sf001)
      .collect()(0)
    val (n, slope, r2) = (r.getLong(0), r.getDouble(1), r.getDouble(3))
    val vocab = Tables.documents(spark, TestSpark.sf001)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextAnalysis.tokens(
          org.apache.spark.sql.functions.col("text"))).as("tok"))
      .distinct().count()
    assert(n == math.min(1000L, vocab), s"n_terms $n vs vocab $vocab")
    // frequency falls with rank by construction of the ranking; r2 stays
    // in [0,1]. The fixture corpus draws tokens near-uniformly, so the
    // log-log fit explains almost NOTHING (r2 ≈ 0.06) — which is the
    // diagnostic doing its job: real Zipfian text scores r2 near 1, and
    // a low r2 flags synthetic/templated corpora exactly like this one.
    assert(slope < 0.0, s"slope $slope")
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2 $r2")
  }

  test("bm25: matches a scalar reference implementation on the full corpus") {
    val got = graft.functions.TextAnalysis.qTextBm25(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.nonEmpty && got.length <= 20)
    // reference BM25 computed with plain Scala over the collected corpus
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
    val terms = Seq("hash", "spark", "window")
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / n
    val dfm = terms.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    def score(toks: Array[String]): Double = {
      val dl = toks.length.toDouble
      terms.map { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) 0.0
        else math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5)) *
          (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }.sum
    }
    val want = docs.map { case (id, w) => id -> score(w) }
      .sortBy { case (id, sc) => (-sc, id) }.take(got.length)
    assert(got.map(_._1).toSeq == want.map(_._1).toSeq, "ranking differs")
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-6, s"score $g vs $w")
    }
    // every scored ranking is strictly usable: descending, positive
    assert(got.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(got.forall(_._2 > 0.0))
  }

  test("entropy: bounded by log2(distinct), matches in-memory recompute") {
    val got = graft.functions.TextAnalysis.qTextEntropy(spark, TestSpark.sf0001)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.nonEmpty)
    got.foreach { case (id, (n, d, h)) =>
      assert(h >= -1e-9, s"doc $id negative entropy")
      assert(h <= math.log(d.toDouble) / math.log(2.0) + 1e-6,
        s"doc $id entropy above log2(distinct)")
      assert(d <= n)
    }
    // exact recompute on a sample of documents
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").collect().take(50)
      .map(r => r.getLong(0) -> r.getString(1))
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.nonEmpty) {
        val n = toks.length.toDouble
        val h = toks.groupBy(identity).values
          .map(g => -(g.length / n) * (math.log(g.length / n) / math.log(2.0)))
          .sum
        assert(math.abs(got(id)._3 - h) < 1e-5, s"doc $id entropy $h")
      }
    }
  }

  test("vocab overlap: pairwise jaccard matches in-memory set algebra") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
    val vocab = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.flatMap(_._2.split(" ").filter(_.nonEmpty)).toSet
    }
    val got = graft.functions.TextAnalysis.qVocabOverlap(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    val sources = vocab.keys.toSeq.sorted
    val wantPairs = for {
      i <- sources.indices; j <- (i + 1) until sources.length
      a = sources(i); b = sources(j)
      common = vocab(a).intersect(vocab(b)).size
      if common > 0
    } yield (a, b) -> (vocab(a).size.toLong, vocab(b).size.toLong,
      common.toLong,
      common.toDouble / (vocab(a).size + vocab(b).size - common).toDouble)
    assert(got.keySet == wantPairs.map(_._1).toSet)
    wantPairs.foreach { case (k, (n1, n2, c, j)) =>
      val (g1, g2, gc, gj) = got(k)
      assert((g1, g2, gc) == (n1, n2, c), s"sizes for $k")
      assert(math.abs(gj - j) < 1e-12, s"jaccard for $k")
    }
    assert(got.nonEmpty)
  }

  test("bigrams: top-30 matches an in-memory sliding-pair count") {
    val got = graft.functions.TextAnalysis.qTextBigrams(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.length == 30)
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    Tables.documents(spark, TestSpark.sf0001).select("text").collect()
      .foreach { r =>
        val w = r.getString(0).split(" ").filter(_.nonEmpty)
        w.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + 1
        }
      }
    val want = counts.toSeq.map { case ((a, b), c) => (a, b, c) }
      .sortBy { case (a, b, c) => (-c, a, b) }.take(30)
    assert(got.toSeq == want)
  }

  test("hash sample: deterministic, subset, rate near 2/16") {
    val total = Tables.documents(spark, TestSpark.sf001).count()
    val s1 = Pipeline.qSampleHash(spark, TestSpark.sf001).collect()
    val s2 = Pipeline.qSampleHash(spark, TestSpark.sf001).collect()
    assert(s1.toSeq == s2.toSeq) // pure function of the key
    val rate = s1.length.toDouble / total
    assert(rate > 0.07 && rate < 0.19, s"rate $rate far from 0.125")
  }

  test("stratified split: partitions every doc, fractions near 80/10/10") {
    val rows = Pipeline.qSplitStratified(spark, TestSpark.sf001).collect()
    val total = Tables.documents(spark, TestSpark.sf001).count()
    val bySplit = rows.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(bySplit.values.sum == total) // nothing dropped or duplicated
    assert(bySplit("train").toDouble / total > 0.7)
    assert(bySplit("val").toDouble / total < 0.2)
    assert(bySplit("test").toDouble / total < 0.2)
  }

  test("quota sample: no stratum exceeds its quota, undersized strata kept whole") {
    val docs = Tables.documents(spark, TestSpark.sf001)
    val perStratum = Pipeline.qSampleQuota(spark, TestSpark.sf001)
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
    assert(perStratum.filter(col("n") > 10).isEmpty)
    // a stratum smaller than the quota passes through entirely
    val small = docs.groupBy("lang", "source").agg(count(lit(1)).as("n"))
      .filter(col("n") <= 10)
    val kept = perStratum.withColumnRenamed("n", "k")
    val joined = small.join(kept, Seq("lang", "source"))
    assert(joined.filter(col("n") =!= col("k")).isEmpty)
    assert(joined.count() == small.count())
  }

  test("quota sample: bounded-heap aggregator equals the window formulation") {
    val win = Pipeline.qSampleQuota(spark, TestSpark.sf001).collect().toSeq
    val agg = Pipeline.qSampleQuotaTopk(spark, TestSpark.sf001).collect().toSeq
    assert(win == agg)
  }

  test("url normalize: hosts cover every source, paths are query-stripped") {
    val rows = Pipeline.qUrlNormalize(spark, TestSpark.sf001).collect()
    val nSources = Tables.documents(spark, TestSpark.sf001)
      .select("source").distinct().count()
    assert(rows.length == nSources)
    assert(rows.forall(_.getString(0).matches("src\\d+\\.example\\.com")))
    // n_paths counts doc-level paths: strictly more than one per host, and
    // never more than that host's doc count (dupes collapse)
    rows.foreach(r => assert(r.getLong(2) > 1 && r.getLong(2) <= r.getLong(1)))
  }

  test("contamination: every injected leak is flagged with near-total overlap") {
    val rows = Pipeline.qContamination(spark, TestSpark.sf001).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val nBench = Tables.documents(spark, TestSpark.sf001)
      .filter(col("doc_id") % 97 === 0).count()
    val leaks = rows.filter { case (id, _) => id >= 300000 }
    assert(leaks.size == nBench) // recall 1.0 on the injected leaks
    // a leak embeds the full benchmark doc: nearly all its 5-grams match
    leaks.values.foreach(c => assert(c > 0.8, s"leak overlap $c"))
    // flagged non-leaks (natural collisions) must be rare
    assert(rows.size - leaks.size < nBench)
  }

  test("quantization: int8 range and reconstruction error within half a step") {
    val rows = Pipeline.qEmbQuantize(spark, TestSpark.sf001).collect()
    val orig = Tables.embeddings(spark, TestSpark.sf001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.length == orig.size)
    rows.foreach { r =>
      val q = r.getString(1).split(",").map(_.toInt)
      val scale = r.getDouble(2)
      val x = orig(r.getLong(0))
      assert(q.length == x.length)
      assert(q.forall(v => v >= -127 && v <= 127))
      // |x - q·scale| ≤ scale/2 + eps: floor(x/scale + .5) is within half a
      // quantization step of the original
      q.indices.foreach { i =>
        assert(math.abs(x(i).toDouble - q(i) * scale) <= scale / 2 + 1e-9)
      }
    }
  }

  test("chunking: windows bounded, strided starts, full token coverage") {
    val toks = graft.functions.TextAnalysis.tokens(col("text"))
    val perDoc = Tables.documents(spark, TestSpark.sf001)
      .select(col("doc_id"), size(toks).as("n")).filter(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = graft.functions.TextAnalysis.qTextChunk(spark, TestSpark.sf001)
      .collect().groupBy(_.getLong(0))
    assert(chunks.keySet == perDoc.keySet) // every tokenized doc chunked
    chunks.foreach { case (doc, cs) =>
      val n = perDoc(doc)
      val expected = (n + 47) / 48 // one window per 48-token stride start
      assert(cs.length == expected, s"doc $doc: ${cs.length} != $expected")
      cs.sortBy(_.getInt(1)).zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(1) == i) // contiguous chunk indices
        val len = r.getInt(2)
        assert(len == math.min(64, n - i * 48)) // clamped window length
      }
    }
  }

  test("repetition signals: ratios bounded, every tokenized doc covered") {
    val rows = graft.functions.TextAnalysis
      .qTextRepetition(spark, TestSpark.sf001).collect()
    val nDocs = Tables.documents(spark, TestSpark.sf001)
      .filter(size(graft.functions.TextAnalysis.tokens(col("text"))) > 0).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val topRatio = r.getDouble(3)
      val dupFrac = r.getDouble(4)
      assert(topRatio > 0.0 && topRatio <= 1.0)
      assert(dupFrac >= 0.0 && dupFrac < 1.0)
      // top token can't appear more often than there are tokens
      assert(r.getLong(2) <= r.getLong(1))
    }
  }

  test("corpus curation: funnel is deterministic and strictly narrowing") {
    val total = Tables.documents(spark, TestSpark.sf001).count()
    val r1 = Pipeline.qCorpusCurate(spark, TestSpark.sf001).collect()
    val r2 = Pipeline.qCorpusCurate(spark, TestSpark.sf001).collect()
    assert(r1.toSeq == r2.toSeq)
    val kept = r1.map(_.getLong(1)).sum
    assert(kept > 0 && kept < total) // every gate engages, none empties the set
    // langs in the rollup are real corpus langs
    val langs = Tables.documents(spark, TestSpark.sf001)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(r1.map(_.getString(0)).toSet.subsetOf(langs))
  }

  test("redaction: placeholders replace every email and long digit run") {
    // recompute the redacted text (the query ships only its md5) and scan
    // for surviving PII patterns
    val pii = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or call 555"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    val red = Tables.documents(spark, TestSpark.sf001)
      .select(regexp_replace(regexp_replace(pii,
        "[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+", "<EMAIL>"),
        "[0-9]{5,}", "<NUM>").as("t"))
    assert(red.filter(col("t").rlike("@")).isEmpty)
    assert(red.filter(col("t").rlike("[0-9]{5,}")).isEmpty)
    assert(red.filter(col("t").contains("<EMAIL>")).count() == red.count())
    // and the query's counters see at least the injected instances
    val q = Pipeline.qTextRedact(spark, TestSpark.sf001)
    assert(q.filter(col("n_emails") < 1 || col("n_nums") < 1).isEmpty)
  }

  test("zorder: buckets partition the table with dual-dimension locality") {
    val rows = Pipeline.qZorderLayout(spark, TestSpark.sf001).collect()
    val o = Tables.orders(spark, TestSpark.sf001)
    assert(rows.map(_.getLong(1)).sum == o.count())
    assert(rows.length >= 32 && rows.length <= 64)
    val mm = o.agg(min(to_date(col("o_orderdate"))).as("d0"),
      max(to_date(col("o_orderdate"))).as("d1"),
      max(col("o_custkey")).as("cmax")).collect()(0)
    val dmax = java.time.temporal.ChronoUnit.DAYS.between(
      mm.getDate(0).toLocalDate, mm.getDate(1).toLocalDate)
    val cmax = mm.getLong(2)
    // a bucket fixes the top 3 bits of BOTH scaled dimensions, so each
    // bucket's span in the 16-bit scaled domain is < 2^13 on each axis —
    // the dual-dimension locality a single-column sort cannot give
    def sc(v: Long, vmax: Long): Long = v * 65535L / vmax
    rows.foreach { r =>
      assert(sc(r.getLong(3), cmax) - sc(r.getLong(2), cmax) <= 8191L,
        s"cust span in bucket ${r.getLong(0)}")
      assert(sc(r.getLong(5), dmax) - sc(r.getLong(4), dmax) <= 8191L,
        s"day span in bucket ${r.getLong(0)}")
    }
  }

  test("perplexity: Gibbs bound (doc entropy <= cross-entropy vs corpus)") {
    val xent = graft.functions.TextAnalysis
      .qTextPerplexity(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("xent_bits_per_tok"))
    val ent = graft.functions.TextAnalysis
      .qTextEntropy(spark, TestSpark.sf0001)
      .select(col("doc_id"), col("entropy_bits"))
    val joined = xent.join(ent, "doc_id").collect()
    assert(joined.nonEmpty)
    // H(p) <= H(p, q) for every doc, with 6-dp rounding slack on each side
    joined.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(1) + 2e-6,
        s"doc ${r.getLong(0)}: entropy ${r.getDouble(2)} > xent ${r.getDouble(1)}")
    }
  }

  test("hapax ratio: matches in-memory per-source vocabulary counts") {
    val got = graft.functions.TextAnalysis.qTextHapax(spark, TestSpark.sf0001)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    val bySource = Tables.documents(spark, TestSpark.sf0001)
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).groupBy(_._1)
    assert(got.keySet == bySource.keySet)
    bySource.foreach { case (src, docs) =>
      val counts = docs.flatMap(_._2.split(" ").filter(_.nonEmpty))
        .groupBy(identity).map { case (_, v) => v.length }
      val (vocab, hapax) = (counts.size.toLong, counts.count(_ == 1).toLong)
      val (gv, gh, gr) = got(src)
      assert(gv == vocab && gh == hapax)
      assert(gr == hapax.toDouble / vocab.toDouble)
      assert(gr >= 0.0 && gr <= 1.0)
    }
  }

  test("readability: matches a scalar LIX recompute") {
    val got = graft.functions.TextAnalysis
      .qTextReadability(spark, TestSpark.sf0001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(got.size == docs.count(_._2.split(" ").exists(_.nonEmpty)))
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      if (toks.nonEmpty) {
        val sents = math.max(text.count(c => "?!.".contains(c)), 1)
        val long = toks.count(_.length > 6)
        val (w, se, l, lix) = got(id)
        assert(w == toks.length.toLong && se == sents.toLong && l == long.toLong)
        assert(lix == toks.length.toDouble / sents +
          100.0 * long / toks.length)
      }
    }
  }

  test("pack efficiency: magnitude buckets and padding agree with a scalar fold") {
    val got = Pipeline.qPackEfficiency(spark, TestSpark.sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val lens = Tables.documents(spark, TestSpark.sf001)
      .select(size(graft.functions.TextAnalysis.tokens(col("text"))).cast("bigint"))
      .collect().map(_.getLong(0))
    val exp = lens.groupBy(n => java.lang.Long.toBinaryString(n).length.toLong)
      .map { case (b, ns) =>
        b -> (ns.length.toLong, ns.sum,
          ns.count(_ > 2048L).toLong,
          ns.map(n => ((n + 2047) / 2048) * 2048 - n).sum)
      }
    assert(got == exp)
    // pad always completes to a context multiple
    got.foreach { case (_, (_, tot, _, pad)) => assert((tot + pad) % 2048 == 0 || pad >= 0) }
  }

  test("RBO: depth curve is monotone, bounded, and consistent with its counts") {
    val rows = graft.functions.TextAnalysis.qRankRbo(spark, TestSpark.sf0001).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[Long]("x_d"), r.getAs[Double]("rbo")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 20L))
    // agreement counts: nondecreasing, never exceed the depth
    rows.foreach { case (d, x, _) => assert(x >= 0 && x <= d) }
    assert(rows.toSeq.sliding(2).forall { case Seq((_, x1, r1), (_, x2, r2)) =>
      x2 >= x1 && r2 >= r1 - 1e-9
    case _ => true })
    // truncated RBO@20 with p=0.9 lies in [0, 1 - 0.9^20-ish prefix mass]
    val rbo20 = rows.last._3
    assert(rbo20 >= 0.0 && rbo20 <= 1.0)
    // the two scorers genuinely differ AND genuinely overlap at sf0.001
    assert(rows.last._2 > 0 && rbo20 < 1.0 - 1e-9)
  }

  test("RRF and nDCG: fusion ordering and normalization bounds hold") {
    val rrf = graft.functions.TextAnalysis.qRankRrf(spark, TestSpark.sf0001)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        Option(r.getAs[Integer]("ra")), Option(r.getAs[Integer]("rb")),
        r.getAs[Double]("fused")))
    assert(rrf.length == 10)
    // fused scores descend and match the published formula exactly
    assert(rrf.toSeq.sliding(2).forall {
      case Seq((_, _, _, f1), (_, _, _, f2)) => f1 >= f2
      case _ => true })
    rrf.foreach { case (_, ra, rb, f) =>
      val exp = ra.map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
        rb.map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      assert(f == exp)
      assert(ra.nonEmpty || rb.nonEmpty)
    }
    val nd = graft.functions.TextAnalysis.qRankNdcg(spark, TestSpark.sf0001)
      .collect().head
    val (dcg, idcg, ndcg) = (nd.getAs[Double]("dcg"), nd.getAs[Double]("idcg"),
      nd.getAs[Double]("ndcg"))
    assert(idcg > 0 && dcg > 0 && dcg <= idcg + 1e-9)
    assert(ndcg > 0 && ndcg <= 1.0 + 1e-9)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("capped posting lists: a hot shingle collapses instead of materializing") {
    // synthetic hot key: one gram in 1000 docs (≫ maxDf), one rare gram in 3
    val rows = (0 until 1000).map(i => ("hot", i.toLong)) ++
      Seq(("rare", 1L), ("rare", 2L), ("rare", 3L))
    val byGram = rows.toDF("gram", "doc_id")
      .groupBy("gram")
      .agg(graft.functions.CappedCollect.cappedList(Dedup.maxDf)(col("doc_id")).as("docs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(byGram("hot").isEmpty) // overflowed: bounded buffer, no full list
    assert(byGram("rare").sorted == Seq(1L, 2L, 3L))
  }

  test("shingles: distinct word 3-grams, short docs empty") {
    val df = Seq("a b c d", "x y", "a b c a b c").toDF("text")
      .select(Dedup.shingles(col("text")).as("g"))
    val got = df.collect().map(_.getSeq[String](0).toSet)
    assert(got(0) == Set("a b c", "b c d"))
    assert(got(1) == Set.empty)
    assert(got(2) == Set("a b c", "b c a", "c a b"))
  }

  test("minhash signature: deterministic, identical texts agree, width 64") {
    val df = Seq("the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog",
      "something entirely different here with many words")
      .toDF("text").select(Dedup.minhashSignature(col("text")).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs(0).length == Dedup.numPerm)
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("simhash: identical texts get identical fingerprints; near texts close") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away today"
    val df = Seq(base, base, base + " extra", "totally unrelated short phrase")
      .toDF("text").select(Dedup.simhash(col("text")).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fps(0), fps(2)) < hamming(fps(0), fps(3)))
  }

  test("minhash-LSH finds the injected near-duplicates at sf0.001") {
    val pairs = Dedup.qDedupMinhash(spark, TestSpark.sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // exact copies (ids+100000, jaccard 1.0) must all surface
    (0L until 50L).foreach { id =>
      assert(pairs.contains((id, id + 100000)), s"missing exact pair $id")
    }
    // near copies (ids+200000, 3 tokens appended) have jaccard n/(n+3)
    val nearFound = (50L until 100L).count(id => pairs.contains((id, id + 200000)))
    assert(nearFound >= 45, s"only $nearFound/50 near pairs found")
  }

  test("minhash-LSH output is a subset of exact-jaccard ngram output") {
    val lsh = Dedup.qDedupMinhash(spark, TestSpark.sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val exact = Dedup.qDedupNgram(spark, TestSpark.sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.size >= (exact.size * 0.9).toInt, "LSH recall below 90%")
  }

  test("cluster assignment: pairs share labels, labels are cluster minima") {
    val pairs = Dedup.qDedupNgram(spark, TestSpark.sf0001)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val lbl = Dedup.qDedupClusters(spark, TestSpark.sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exactly the paired vertices are labeled
    assert(lbl.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // both endpoints of every near-dup pair land in the same cluster
    pairs.foreach { case (a, b) => assert(lbl(a) == lbl(b), s"($a,$b)") }
    // a cluster's label is its smallest member (canonical id)
    lbl.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c, s"cluster $c min=${members.keys.min}")
    }
    // the distributed label-propagation path (forced via threshold=0)
    // produces the identical labeling as the driver union-find
    val distributed = Dedup.clustersOf(spark,
        Dedup.qDedupNgram(spark, TestSpark.sf0001).select("d1", "d2"),
        driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distributed == lbl)
  }

  test("fuzzy join: blocking finds every injected typo pair, all pairs d=1") {
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1) {
        j => if (i == 0) j else if (j == 0) i else 0
      })
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val got = Dedup.qDedupFuzzy(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.nonEmpty)
    got.foreach { case (a, b) =>
      assert(a < b && lev(a, b) == 1, s"($a,$b) not a d=1 pair")
    }
    // every injected (word, drop-2nd-char) and (word, z-subst) pair found
    val words = Tables.documents(spark, TestSpark.sf0001)
      .select(explode(graft.functions.TextAnalysis.tokens(col("text"))))
      .distinct().collect().map(_.getString(0)).filter(_.length >= 4)
    words.foreach { w =>
      val del = w.take(1) + w.drop(2)
      val sub = "z" + w.drop(1)
      Seq(del, sub).filter(t => t != w).foreach { t =>
        val p = if (w < t) (w, t) else (t, w)
        assert(got.contains(p), s"injected pair $p missing")
      }
    }
  }

  test("winnowing: injected near-dups detected; exact copies share all prints") {
    val pairs = Dedup.qDedupWinnow(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.nonEmpty)
    // the corpus's exact copies (doc_id + 100000) share EVERY fingerprint
    // with their originals — the winnowing guarantee at its strongest.
    // only docs with >= 12 tokens produce fingerprints at all
    val docTokens = Tables.documents(spark, TestSpark.sf0001)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), size(graft.functions.TextAnalysis.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val longDocs = docTokens.filter(_._2 >= 12).keySet
    val found = pairs.collect {
      case (d1, d2, _) if d2 == d1 + 100000 => d1
    }.toSet
    // every long-enough exact copy must surface (some may be df-capped
    // away if the doc text recurs corpus-wide; require 80%+ recall)
    assert(found.intersect(longDocs).size >= (longDocs.size * 8) / 10,
      s"winnow missed too many exact copies: ${longDocs.size - found.size}")
    // and the appended-suffix near-dups (doc_id + 200000) surface too:
    // the shared prefix is hundreds of tokens, far over the w+k-1 bound
    assert(pairs.exists { case (d1, d2, _) => d2 == d1 + 200000 })
    // guarantee on a hand-built pair: two docs sharing an exact 12-token
    // run (with different surroundings) MUST share >= 1 fingerprint
    val run = (1 to 12).map(i => s"shared$i").mkString(" ")
    val hand = Seq((1L, s"alpha beta gamma $run delta epsilon zeta eta theta iota kappa lambda"),
      (2L, s"one two three four five $run six seven eight nine ten eleven"))
      .toDF("doc_id", "text")
    val fps = hand
      .select(col("doc_id"), graft.functions.TextAnalysis.tokens(col("text")).as("w"))
      .select(col("doc_id"), expr(
        "transform(sequence(0, size(w) - 5), i -> md5(concat_ws(' ', slice(w, i + 1, 5))))").as("h"))
      .select(col("doc_id"), explode(expr(
        "array_distinct(transform(sequence(0, size(h) - 8), j -> array_min(slice(h, j + 1, 8))))")).as("fp"))
      .collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getString(1)).toSet }
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "w+k-1 guarantee violated: a shared 12-token run produced no shared fingerprint")
  }

  test("leak-free split: clusters co-travel; naive per-doc hashing leaks") {
    val out = Dedup.qSplitLeakfree(spark, TestSpark.sf0001).collect()
    assert(out.nonEmpty && out.forall(_.getLong(3) == 0L),
      "a near-dup cluster crossed a split boundary")
    // non-vacuous: on the same corpus, splitting each DOC independently
    // (the stratified convention) puts members of at least one near-dup
    // cluster into different splits — the leak this operator kills
    val clusters = Dedup.qDedupClusters(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def docSplit(id: Long): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(("spl" + id).getBytes("UTF-8"))
        .map(b => f"${b & 0xFF}%02x").mkString
      if (h < "cc") "train" else if (h < "e6") "val" else "test"
    }
    val leakyPlain = clusters.groupBy(_._2)
      .count { case (_, members) =>
        members.map(m => docSplit(m._1)).toSet.size > 1 }
    assert(leakyPlain > 0,
      "fixture no longer demonstrates the per-doc-split leakage mode")
  }

  test("substring spans: a shared 12-token run is localized in both docs; a 7-token run is invisible") {
    val aToks = (1 to 30).map(i => s"a$i")
    val a = aToks.mkString(" ")
    // doc 2 embeds tokens a10..a21 (12 tokens) at positions 5..16
    val b = ((1 to 5).map(i => s"b$i") ++ aToks.slice(9, 21) ++
      (6 to 8).map(i => s"b$i")).mkString(" ")
    // doc 3 shares only a 7-token run (below k=8) — must stay invisible
    val d = (aToks.take(7) ++ (1 to 10).map(i => s"d$i")).mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, d)).toDF("doc_id", "text")
    val spans = Dedup.substringSpansOf(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(spans == Set((1L, 9L, 12L), (2L, 5L, 12L)), s"got $spans")
  }

  test("substring spans: exact copies produce whole-document spans at sf0.001") {
    val spans = Dedup.qDedupSubstring(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val nToks = Dedup.corpus(spark, TestSpark.sf0001)
      .select(col("doc_id"),
        size(graft.functions.TextAnalysis.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    (100000L until 100050L).filter(nToks(_) >= 8).foreach { id =>
      val s = spans.getOrElse(id, Array.empty)
      assert(s.exists(sp => sp._2 == 0L && sp._3 == nToks(id).toLong),
        s"copy $id missing its whole-doc span (n=${nToks(id)}): ${s.toSeq}")
    }
  }

  test("exact dedup: every injected copy collapses to its original") {
    val rows = Dedup.qDedupExact(spark, TestSpark.sf0001).collect()
    val dups = rows.filter(_.getLong(2) > 1)
    assert(dups.length == 50)
    assert(dups.forall(r => r.getLong(1) < 50))
  }
}

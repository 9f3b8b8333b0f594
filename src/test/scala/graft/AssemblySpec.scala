package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Pipeline}
import graft.functions.TextAnalysis

/** Semantic properties of the corpus-assembly operators added in round 5
  * (sequence packing, passage dedup, tf-idf keywords) — the exact outputs
  * are oracle-checked against DuckDB by the driver; these cover the
  * invariants the hashes can't express. */
class AssemblySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("pack: offsets are contiguous in doc order and windows monotone") {
    val rows = Pipeline.qPackSequences(spark, TestSpark.sf001).collect()
    assert(rows.nonEmpty)
    // contiguity: each doc starts exactly where the previous one ended —
    // the distributed prefix sum equals the sequential one
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(2) + a.getLong(1),
        s"gap between doc ${a.getLong(0)} and ${b.getLong(0)}")
    case _ => ()
    }
    assert(rows.head.getLong(2) == 0L) // first doc starts at offset 0
    // window assignment: the window containing the doc's first token
    assert(rows.forall(r => r.getLong(3) == r.getLong(2) / 2048))
    // windows are monotone non-decreasing in doc order
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(3) >= a.getLong(3))
    case _ => ()
    }
  }

  test("pack: segment boundaries do not distort the global cumsum") {
    // Sequential recompute from per-doc token counts must equal the
    // two-phase segmented prefix sum exactly.
    val counts = Tables.documents(spark, TestSpark.sf001)
      .select(col("doc_id"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
      .orderBy("doc_id").collect()
    var cum = 0L
    val expect = counts.map { r => val s = cum; cum += r.getLong(1); (r.getLong(0), s) }.toMap
    val got = Pipeline.qPackSequences(spark, TestSpark.sf001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expect)
  }

  test("passage dedup: exact copies lose everything, originals keep everything") {
    val rows = Dedup.qDedupPassage(spark, TestSpark.sf001).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val emptyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.empty[Byte]).map("%02x".format(_)).mkString
    // byte-exact copies (ids+100000): every passage already seen in the original
    rows.keys.filter(_ >= 100000L).filter(_ < 200000L).foreach { id =>
      val (n, dup, md5) = rows(id)
      assert(n == dup, s"copy $id kept ${n - dup} passages")
      assert(md5 == emptyMd5)
    }
    // Originals can collide with each other (the fixture generator reuses
    // token spans — e.g. docs 285/301 at sf0.01 share two full passages),
    // but such repeats are rare: corpus-wide, originals keep >90%.
    val orig = rows.filter(_._1 < 100000L).values
    assert(orig.map(_._2).sum.toDouble / orig.map(_._1).sum < 0.1)
    // near copies (ids+200000, three tokens appended) are dup except the
    // divergent tail: at most two passages survive (the tail itself can
    // dedup against ANOTHER near copy's identical appended tail → 0 kept)
    val nearKept = rows.filter(_._1 >= 200000L).values.map(p => p._1 - p._2)
    assert(nearKept.forall(k => k >= 0L && k <= 2L))
    assert(nearKept.exists(_ >= 1L)) // the first divergent tail does survive
    // internal consistency: empty-reassembly md5 exactly when all dup
    rows.values.foreach { case (n, dup, md5) =>
      assert(dup <= n)
      assert((md5 == emptyMd5) == (n == dup))
    }
  }

  test("incremental dedup: bloom routing never changes the result") {
    import graft.operators.Incremental
    // The Bloom filter only decides which PATH a row takes (map-side emit
    // vs exact anti-join); a sloppy filter (fpp 0.5, most rows routed to
    // the join) and a tight one must agree exactly.
    val tight = Incremental.incrementalNovel(spark, TestSpark.sf0001, 0.001).collect().toSeq
    val sloppy = Incremental.incrementalNovel(spark, TestSpark.sf0001, 0.5).collect().toSeq
    assert(tight == sloppy)
    // semantics: exactly the batch docs whose content is absent from the
    // corpus — cross-checked against a plain anti-join on the text itself
    val expected = Incremental.newBatch(spark, TestSpark.sf0001)
      .join(Tables.documents(spark, TestSpark.sf0001).select("text"),
        Seq("text"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(tight.map(_.getLong(0)) == expected)
    // every re-scraped duplicate (+400000) was eliminated
    assert(tight.forall(_.getLong(0) >= 500000L))
  }

  test("delta merge: split-and-merge equals the flat one-pass aggregate") {
    import graft.operators.Incremental
    val merged = Incremental.qAggDeltaMerge(spark, TestSpark.sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    import org.apache.spark.sql.functions._
    val flat = Tables.lineitem(spark, TestSpark.sf0001)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(Tables.cents(col("l_extendedprice"))).as("s"),
        min(Tables.cents(col("l_extendedprice"))).as("mn"),
        max(Tables.cents(col("l_extendedprice"))).as("mx"))
      .orderBy("l_returnflag").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(merged == flat)
  }

  test("tfidf: five keywords per doc, ranked by score with token tiebreak") {
    val rows = TextAnalysis.qTextTfidf(spark, TestSpark.sf001).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.values.foreach { rs =>
      assert(rs.length <= 5)
      val sorted = rs.sortBy(_.getInt(5))
      assert(sorted.map(_.getInt(5)).toSeq == (1 to rs.length))
      // score non-increasing down the ranks; equal scores ordered by token
      sorted.sliding(2).foreach { case Array(a, b) =>
        val (sa, sb) = (a.getDouble(4), b.getDouble(4))
        assert(sa > sb || (sa == sb && a.getString(1) < b.getString(1)))
      case _ => ()
      }
    }
    // a token present in every document is never a top keyword when a
    // rarer one exists in the doc (idf discounts it)
    val df = rows.map(r => r.getString(1) -> r.getLong(3)).toMap
    assert(df.values.min < df.values.max) // fixture has df spread
  }
}

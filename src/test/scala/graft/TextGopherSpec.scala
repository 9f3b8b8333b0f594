package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis

/** q_text_gopher — the rule-based attrition report (Rae et al. 2021
  * Gopher gates). The per-rule booleans are exact integer comparisons, so
  * the spec checks structural invariants plus a handmade-document
  * classification for each rule. */
class TextGopherSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("gopher report: six rules, one shared doc count, any_rule dominates") {
    val rows = TextAnalysis.qTextGopher(spark, TestSpark.sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(rows.keySet == Set("any_rule", "doc_length", "mean_word_length",
      "symbol_ratio", "stopword_floor", "repetition"))
    assert(rows.values.map(_._2).toSet == Set(500L))
    val singles = rows.filter(_._1 != "any_rule").values.map(_._1)
    val any = rows("any_rule")._1
    assert(any >= singles.max, "any_rule below its largest component")
    assert(any <= singles.sum, "any_rule exceeds the union bound")
    rows.values.foreach { case (f, n, rate) =>
      assert(rate == f.toDouble / n)
    }
  }

  test("gopher rules classify handmade documents as designed") {
    import spark.implicits._
    import java.nio.file.Files
    // write a tiny documents.parquet fixture and run the SHIPPED query on it
    val dir = Files.createTempDirectory("gopher").toString
    val docs = Seq(
      // passes everything: 12 plain tokens incl. two stopwords, varied
      (1L, "the cat sat on a mat with four other small cats", "en", "src0", 0L),
      // fails doc_length (< 10 tokens) and stopword_floor (zero stopwords)
      (2L, "tiny doc here", "en", "src0", 0L),
      // fails mean_word_length (single chars) + repetition (1 distinct of
      // 12); 'a' is a stopword, so the stopword floor PASSES here
      (3L, "a a a a a a a a a a a a", "en", "src0", 0L),
      // fails symbol_ratio: mostly punctuation
      (4L, "the and !!!??!!! ###$$$%%% ^^^&&&*** !!!!!!!! ????????" +
        " ######## $$$$$$$$ %%%%%%%% ________", "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.qTextGopher(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows("doc_length") == 1L)       // doc 2
    assert(rows("mean_word_length") == 1L) // doc 3
    assert(rows("symbol_ratio") == 1L)     // doc 4
    assert(rows("repetition") == 1L)       // doc 3
    assert(rows("stopword_floor") == 1L)   // doc 2 only (doc 3's 'a' IS a stopword)
    assert(rows("any_rule") == 3L)         // docs 2, 3, 4
  }
}

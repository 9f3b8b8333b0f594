package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-analysis family for training-data pipelines (north-star extension,
  * SURVEY §7.5): token statistics, quality signals, heuristic language ID,
  * regex tokenization, canonical fingerprinting.
  *
  * Everything is built from codegen'd Catalyst expressions (split / filter /
  * transform / aggregate lambdas) — no UDFs, so whole-stage codegen spans
  * the full pipeline and the operators scale embarrassingly parallel (pure
  * per-row projections, zero shuffle).
  */
object TextAnalysis {

  val enStop = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "on")
  val esStop = Seq("el", "la", "los", "de", "que", "y", "en", "un")
  val deStop = Seq("der", "die", "das", "und", "ist", "von", "ein", "zu")
  val frStop = Seq("le", "les", "des", "et", "est", "une", "dans", "pour")

  /** Whitespace tokens with empties dropped (split-on-single-space matches
    * the corpus format; `filter` guards repeated separators). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  private def stopHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Per-document statistics + a quality score in [0,1]:
    * stopword ratio (fluency proxy) damped by token-repetition ratio. */
  def qTextStats(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val toks = tokens(col("text"))
    d.select(
      col("doc_id"),
      length(col("text")).as("n_chars_actual"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      length(regexp_replace(col("text"), "[A-Za-z0-9 ]", "")).as("punct_chars"),
      stopHits(toks, enStop).as("stop_hits"))
      .withColumn("stop_ratio",
        when(col("n_tokens") > 0,
          col("stop_hits").cast("double") / col("n_tokens")).otherwise(0.0))
      .withColumn("distinct_ratio",
        when(col("n_tokens") > 0,
          col("n_distinct").cast("double") / col("n_tokens")).otherwise(0.0))
      .orderBy("doc_id")
  }

  /** The q_text_quality composite score as a single reusable column —
    * identical arithmetic and term order to [[qTextQuality]] (bit-exact in
    * the DuckDB oracle), for pipeline stages that gate on quality without
    * materializing the intermediate ratio columns. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nChars = length(text)
    val nTokens = size(toks)
    val punctRatio = when(nChars > 0,
      length(regexp_replace(text, "[A-Za-z0-9 ]", "")) / nChars).otherwise(1.0)
    val stopRatio = when(nTokens > 0,
      stopHits(toks, enStop) / nTokens).otherwise(0.0)
    val distinctRatio = when(nTokens > 0,
      size(array_distinct(toks)) / nTokens).otherwise(0.0)
    lit(0.25) * least(lit(1.0), nTokens / 50.0) +
      lit(0.25) * (lit(1.0) - punctRatio) +
      lit(0.25) * least(lit(1.0), stopRatio * 4.0) +
      lit(0.25) * distinctRatio
  }

  /** Composite quality score in [0,1] for corpus filtering — the
    * length/punctuation/stopword/repetition signals a pretraining pipeline
    * gates on, folded into one score (equal weights, each clamped to
    * [0,1]): length (tokens/50 capped), low punctuation density, stopword
    * presence (fluency proxy, 4× boosted and capped), vocabulary
    * distinctness. Pure per-row codegen projection, zero shuffle; the
    * term order is fixed so the double arithmetic reproduces bit-exact in
    * the DuckDB oracle. */
  def qTextQuality(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    documents(s, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(toks).as("n_tokens"),
        size(array_distinct(toks)).as("n_distinct"),
        length(regexp_replace(col("text"), "[A-Za-z0-9 ]", "")).as("punct_chars"),
        stopHits(toks, enStop).as("stop_hits"))
      .withColumn("punct_ratio",
        when(col("n_chars") > 0, col("punct_chars") / col("n_chars")).otherwise(1.0))
      .withColumn("stop_ratio",
        when(col("n_tokens") > 0, col("stop_hits") / col("n_tokens")).otherwise(0.0))
      .withColumn("distinct_ratio",
        when(col("n_tokens") > 0, col("n_distinct") / col("n_tokens")).otherwise(0.0))
      .withColumn("quality_score",
        lit(0.25) * least(lit(1.0), col("n_tokens") / 50.0) +
          lit(0.25) * (lit(1.0) - col("punct_ratio")) +
          lit(0.25) * least(lit(1.0), col("stop_ratio") * 4.0) +
          lit(0.25) * col("distinct_ratio"))
      .withColumn("is_quality", col("quality_score") >= 0.6)
      .orderBy("doc_id")
  }

  /** Heuristic n-gram/stopword language ID: vote per language's stopword
    * list, deterministic argmax with fixed precedence (en>es>de>fr), 'und'
    * when no language reaches 2 hits. */
  def qTextLangid(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val toks = tokens(col("text"))
    val withVotes = d.select(
      col("doc_id"), col("lang").as("declared_lang"),
      stopHits(toks, enStop).as("en_hits"),
      stopHits(toks, esStop).as("es_hits"),
      stopHits(toks, deStop).as("de_hits"),
      stopHits(toks, frStop).as("fr_hits"))
    withVotes.withColumn("predicted_lang",
      when(col("en_hits") >= 2 && col("en_hits") >= col("es_hits") &&
        col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits"), "en")
        .when(col("es_hits") >= 2 && col("es_hits") >= col("de_hits") &&
          col("es_hits") >= col("fr_hits"), "es")
        .when(col("de_hits") >= 2 && col("de_hits") >= col("fr_hits"), "de")
        .when(col("fr_hits") >= 2, "fr")
        .otherwise("und"))
      .orderBy("doc_id")
  }

  /** Token counting: word tokens, number tokens, and a BPE-ish regex
    * segmentation (letters | digits | single non-space symbol). */
  def qTextTokens(s: SparkSession, dir: String): DataFrame = {
    documents(s, dir).select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("n_words"),
      size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).as("n_numbers"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
        .as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Canonical document fingerprint: md5 over the whitespace-normalized
    * token stream (the SQL-expressible analog of a rolling content hash —
    * a per-window rolling variant lives in the dedup family's shingles). */
  def qTextFingerprint(s: SparkSession, dir: String): DataFrame = {
    val canon = concat_ws(" ", tokens(col("text")))
    documents(s, dir).select(
      col("doc_id"),
      md5(canon.cast("binary")).as("fingerprint"),
      substring(md5(canon.cast("binary")), 1, 8).as("short_fp"))
      .orderBy("doc_id")
  }

  /** Rolling-hash fingerprint profile (Rabin-Karp kernel,
    * [[graft.plans.RollingHashExpr]]): per doc, the count of distinct
    * 32-byte window hashes and a stable min-hash representative — the
    * character-level containment fingerprint. Oracle-exact: the kernel's
    * mod-2⁶¹-1 arithmetic is pure integer math, reproduced in DuckDB with
    * a HUGEINT Horner fold per window (the corpus text is ASCII, so SQL
    * char positions equal the kernel's UTF-8 byte positions). */
  def qTextRolling(s: SparkSession, dir: String): DataFrame = {
    val rh = graft.plans.GraftExpressions.rolling_hash(col("text"), 32)
    documents(s, dir).select(
      col("doc_id"),
      size(rh).as("n_windows"),
      array_min(rh).as("min_window_hash"))
      .orderBy("doc_id")
  }

  /** Repetition / boilerplate signals (the Gopher-style gates a
    * pretraining pipeline applies): per document, the most frequent
    * token's share and the fraction of duplicated word-bigrams.
    *
    * Scale shape: the top-token count runs as explode → two-level
    * hash aggregation — per-(doc, token) counts partial-aggregate
    * map-side (a doc's tokens stay in its input partition, so the wide
    * shuffle carries one row per DISTINCT token per doc, not per token),
    * then collapse to per-doc max. The per-row alternative (a
    * higher-order fold counting each distinct token) is O(distinct·n)
    * per document — quadratic for the long docs that matter most. */
  def qTextRepetition(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    // Nothing per-doc rides through the explodes: carrying
    // size(shingles(text)) alongside an explode lands it in the Project
    // ABOVE the Generate, re-evaluating the whole kernel once per token
    // (O(n²) per doc). Instead n_tokens falls out of the token counts
    // (sum of per-token frequencies) and the distinct-bigram count is its
    // own explode→count (the shingle kernel already dedupes per doc), the
    // two per-doc row streams meeting in one doc_id-keyed join.
    val tf = d.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val top = tf.groupBy("doc_id")
      .agg(max(col("c")).as("top_freq"), sum(col("c")).as("n_tokens"))
    val d2 = d.select(col("doc_id"),
      explode(graft.plans.GraftExpressions.shingles(col("text"), 2)).as("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_d2"))
    top.join(d2, Seq("doc_id"), "left")
      .withColumn("n_d2", coalesce(col("n_d2"), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("top_freq"),
        (col("top_freq") / col("n_tokens")).as("top_ratio"),
        when(col("n_tokens") > 1,
          (col("n_tokens") - 1 - col("n_d2")) / (col("n_tokens") - 1))
          .otherwise(0.0).as("dup_2gram_frac"))
      .orderBy("doc_id")
  }

  /** Context-window chunking: split each document into 64-token windows
    * on a 48-token stride (16-token overlap) — the unit a training
    * pipeline feeds to a tokenizer/model. Window starts are a generator
    * over the per-row token array (no shuffle; one output row per chunk),
    * and the only wide operation is the presentation sort. The generator
    * argument is the single expression computed per doc — no scalar rides
    * through the explode (see the repetition-query trap). */
  def qTextChunk(s: SparkSession, dir: String): DataFrame = {
    val win = 64
    val stride = 48
    documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(toks)-1, $stride), st -> array_join(slice(toks, st+1, $win), ' '))")))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        size(split(col("col"), " ")).as("n_chunk_tokens"),
        md5(col("col").cast("binary")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** TF-IDF-style keyword extraction: per document, the top-5 tokens by
    * tf/df weight (term frequency scaled by inverse document frequency;
    * the log-free rational form keeps both engines' arithmetic exact —
    * an int/int IEEE division, no transcendental whose last ulp could
    * differ). Ties break on the token string, so ranking is fully
    * deterministic.
    *
    * Scale shape: per-(doc, token) counts partial-aggregate map-side (a
    * doc's tokens stay in its input partition), the document-frequency
    * table is vocabulary-sized — small against any corpus — and
    * broadcasts, so the only wide exchanges are the (doc, token) count
    * shuffle and the per-doc top-5 window. */
  def qTextTfidf(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val tf = d.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    // tf already has one row per (doc, token): counting rows per token IS
    // the document frequency.
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy((col("tf").cast("double") / col("df")).desc, col("tok"))
    tf.join(broadcast(df), "tok")
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("doc_id"), col("tok").as("keyword"), col("tf"), col("df"),
        col("score"), col("rk"))
      .orderBy("doc_id", "rk")
  }

  /** Corpus vocabulary heavy hitters: top-50 tokens by total occurrence
    * count, with document frequency alongside — the stopword-discovery /
    * tokenizer-vocabulary pass over a corpus. Tokens partial-aggregate
    * map-side twice ((doc, token) then token), so the wide exchanges
    * carry one row per distinct token; the final top-k orders a
    * vocabulary-sized set (small against any corpus) with a deterministic
    * (count desc, token) tie-break. */
  def qVocabTopk(s: SparkSession, dir: String): DataFrame = {
    val tf = documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    tf.groupBy("tok")
      .agg(sum(col("c")).as("tf"), count(lit(1)).as("df"))
      .orderBy(col("tf").desc, col("tok"))
      .limit(50)
  }

  /** BM25 keyword retrieval (k1=1.2, b=0.75) for a fixed three-term query
    * over the corpus — the classic lexical ranking behind contamination
    * checks and seed-document mining. Shape: corpus constants (N, avgdl)
    * come from one tiny aggregate broadcast everywhere; term rows are
    * filtered BEFORE the (doc, term) count, so the exchanges carry only
    * matching-term rows; the df frame (≤3 rows) broadcasts.
    *
    * Oracle-exactness: `ln` is not correctly-rounded and may differ by an
    * ulp between JVM and DuckDB, so the score rounds to 6 decimals; the
    * per-document term sum is written as a FIXED-ORDER pivot-and-add
    * (hash + spark + window) rather than a float `sum()` whose reduce
    * order is engine-dependent. */
  def qTextBm25(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("hash", "spark", "window")
    val d = documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("dl"))
    val consts = d.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .select(col("n_docs").cast("double").as("n_docs"),
        (col("sum_dl").cast("double") / col("n_docs").cast("double"))
          .as("avgdl"))
    val tf = d.select(col("doc_id"), col("dl"), explode(col("w")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val contrib = idf * ((col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") + lit(1.2) *
        (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl"))))
    def termContrib(t: String): Column =
      coalesce(max(when(col("tok") === t, col("contrib"))), lit(0.0))
    tf.join(broadcast(df), "tok").crossJoin(broadcast(consts))
      .withColumn("contrib", contrib)
      .groupBy(col("doc_id"))
      .agg((termContrib("hash") + termContrib("spark") +
        termContrib("window")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(20)
      .select(col("doc_id"), round(col("score"), 6).as("bm25"))
  }

  /** Shared spine of the three ranking metrics ([[qRankRbo]] /
    * [[qRankRrf]] / [[qRankNdcg]]): BM25 and plain tf·idf scores for the
    * fixed probe terms, rounded to 6 dp BEFORE ranking (floats that
    * ORDER rows must be rounded — the established rule), doc_id
    * tie-breaks, top-20 per scorer via bounded orderBy+limit (a
    * TakeOrderedAndProject, never a partition-less window over the
    * corpus; the row_number windows run over the 20-row frames).
    * Returns (bm25Top20 with rank `ra` and score `sa`, tfidfTop20 with
    * rank `rb` and score `sb`).
    *
    * Scale shape: term filter before the (doc, term) count, constants
    * broadcast, the only wide exchange carries matching-term rows. */
  private[graft] def rankedTop20(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val terms = Seq("hash", "spark", "window")
    val d = documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("dl"))
    val consts = d.agg(count(lit(1)).as("nd"), sum(col("dl")).as("sum_dl"))
      .select(col("nd").cast("double").as("n_docs"),
        (col("sum_dl").cast("double") / col("nd").cast("double")).as("avgdl"))
    val tf = d.select(col("doc_id"), col("dl"), explode(col("w")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfx = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val joined = tf.join(broadcast(dfx), "tok").crossJoin(broadcast(consts))
      .withColumn("cb", log(lit(1.0) +
          (col("n_docs") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))) *
        ((col("tf").cast("double") * lit(2.2)) /
          (col("tf").cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl")))))
      .withColumn("ct",
        col("tf").cast("double") * log(col("n_docs") / col("df").cast("double")))
    def tc(c: String, t: String): Column =
      coalesce(max(when(col("tok") === t, col(c))), lit(0.0))
    val scores = joined.groupBy("doc_id").agg(
      round(tc("cb", "hash") + tc("cb", "spark") + tc("cb", "window"), 6).as("sa"),
      round(tc("ct", "hash") + tc("ct", "spark") + tc("ct", "window"), 6).as("sb"))
    val topA = scores.select("doc_id", "sa")
      .orderBy(col("sa").desc, col("doc_id")).limit(20)
      .withColumn("ra", row_number().over(Window.orderBy(col("sa").desc, col("doc_id"))))
    val topB = scores.select("doc_id", "sb")
      .orderBy(col("sb").desc, col("doc_id")).limit(20)
      .withColumn("rb", row_number().over(Window.orderBy(col("sb").desc, col("doc_id"))))
    (topA, topB)
  }

  /** Rank-biased overlap (Webber et al. 2010, truncated form, p = 0.9)
    * between the BM25 and the plain tf·idf top-20 rankings for the same
    * probe terms — the retrieval-evaluation statistic for "how much do
    * two scorers agree, weighted toward the top of the list". Emits one
    * row per depth d: the agreement count X_d = |A_d ∩ B_d| and the
    * running RBO prefix (1−p)·Σ_{e≤d} p^{e−1}·X_e/e, whose d = 20 row
    * is RBO@20.
    *
    * Determinism: both scores round to 6 dp BEFORE ranking (floats that
    * ORDER rows must be rounded — the established rule), ties break on
    * doc_id, per-term contributions add in a FIXED order (the max-CASE
    * chain, not an unordered float sum), and both rankings take top-20
    * via orderBy+limit (a bounded TakeOrderedAndProject — no
    * partition-less window over the corpus; the row_number windows run
    * over the 20-row frames). `power` differs by ulps across engines,
    * so the running RBO rounds to 6 dp — the established ln/pow
    * convention.
    *
    * Scale shape: term filter before the (doc, term) count, constants
    * broadcast, the only wide exchange carries matching-term rows; all
    * depth arithmetic happens on ≤20-row frames. */
  def qRankRbo(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (topA, topB0) = rankedTop20(s, dir)
    val topB = topB0
    val mdc = topA.join(topB, "doc_id")
      .select(greatest(col("ra"), col("rb")).as("md"))
      .groupBy("md").agg(count(lit(1)).as("c"))
    val x = s.range(1, 21).select(col("id").as("d"))
      .join(broadcast(mdc), col("md") <= col("d"), "left")
      .groupBy("d").agg(coalesce(sum(col("c")), lit(0L)).as("x_d"))
    val term = lit(0.1) * pow(lit(0.9), col("d").cast("double") - lit(1.0)) *
      col("x_d").cast("double") / col("d").cast("double")
    x.withColumn("rbo", round(sum(term).over(Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)), 6))
      .select(col("d"), col("x_d"), col("rbo"))
      .orderBy("d")
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009, k = 60) of the BM25
    * and tf·idf top-20 lists — the standard multi-retriever combiner in
    * a RAG stack: fused(d) = Σ_lists 1/(k + rank_list(d)), docs ranked
    * by fused score, top-10 kept. Ranks derive exactly as in
    * [[qRankRbo]] (round-6-then-rank, doc_id tie-breaks, bounded
    * orderBy+limit). The fused score is a sum of TWO correctly-rounded
    * divisions added in a fixed order (coalesce(a,0)+coalesce(b,0)), so
    * it ships at full precision; equal-score ties (same rank pair)
    * break on doc_id. */
  def qRankRrf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (topA, topB0) = rankedTop20(s, dir)
    val topB = topB0.select("doc_id", "rb")
    topA.join(topB, Seq("doc_id"), "full_outer")
      .withColumn("fused",
        coalesce(lit(1.0) / (lit(60.0) + col("ra").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("rb").cast("double")), lit(0.0)))
      .orderBy(col("fused").desc, col("doc_id"))
      .limit(10)
      .select(col("doc_id"), col("ra"), col("rb"), col("fused"))
  }

  /** nDCG@20 of the tf·idf ranking against BM25-graded relevance — the
    * third retrieval-evaluation statistic beside [[qRankRbo]] and
    * [[qRankRrf]]: treat the BM25 top-20 scores as graded relevance
    * judgments and ask how well the cheaper tf·idf ranking orders them.
    * DCG = Σ rel(d)/log₂(rank+1) over the evaluated ranking; IDCG is
    * the same sum over the ideal (BM25) order; nDCG = DCG/IDCG.
    *
    * Determinism: ranks derive exactly as in qRankRbo; both log₂ sums
    * accumulate as ordered prefix sums (window ORDER BY rank over the
    * 20-row frames, max of a monotone cumulative) so both engines add
    * in the same sequence. Each per-rank term rounds to 6 dp BEFORE the
    * prefix sum (the established per-row ln convention): Spark computes
    * log₂ as ln(x)/ln 2 while DuckDB has a native log2, and without the
    * per-term rounding 20 accumulated ulp differences could straddle
    * the final 6-dp boundary at an unverified scale factor. */
  def qRankNdcg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (topA, topB0) = rankedTop20(s, dir)
    val topB = topB0.select("doc_id", "rb")
    val wB = Window.orderBy(col("rb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dcg = topB.join(topA.select("doc_id", "sa"), Seq("doc_id"), "left")
      .select(col("rb"), coalesce(col("sa"), lit(0.0)).as("rel"))
      .withColumn("cum",
        sum(round(col("rel") / log(2.0, col("rb") + 1), 6)).over(wB))
      .agg(max(col("cum")).as("dcg"))
    val wA = Window.orderBy(col("ra"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val idcg = topA
      .withColumn("cum",
        sum(round(col("sa") / log(2.0, col("ra") + 1), 6)).over(wA))
      .agg(max(col("cum")).as("idcg"))
    dcg.crossJoin(idcg)
      .select(round(col("dcg"), 6).as("dcg"), round(col("idcg"), 6).as("idcg"),
        round(col("dcg") / col("idcg"), 6).as("ndcg"))
  }

  /** Adjacent-token-pair counts (the first iteration of BPE-style merge
    * mining): top-30 bigrams corpus-wide. The pair explode is linear in
    * token count; the groupBy partial-aggregates map-side so the exchange
    * carries one row per distinct pair, and the final top-k orders a
    * vocabulary²-bounded (in practice tiny) set with a total
    * (count, t1, t2) tie-break. */
  def qTextBigrams(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
      .select(tokens(col("text")).as("w"))
      .filter(size(col("w")) > 1)
    d.select(explode(expr(
        "transform(sequence(0, size(w)-2), i -> struct(w[i] as t1, w[i+1] as t2))"))
        .as("p"))
      .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"))
      .limit(30)
  }

  /** Top collocations by pointwise mutual information: adjacent token
    * pairs that co-occur far more than their unigram frequencies predict
    * — the phrase-mining / tokenizer-merge-candidate primitive.
    * PMI = log2( p(t1,t2) / (p(t1)·p(t2)) ), support ≥ 5.
    *
    * Scale shape: unigram and bigram counts partial-aggregate map-side;
    * the support filter prunes the bigram table BEFORE the two
    * unigram-count joins (AQE picks broadcast vs shuffle by vocab size);
    * corpus totals ride in as a broadcast 1-row aggregate. Ranking uses
    * the 6-dp-ROUNDED pmi (log2 differs by ulps between engines, and an
    * ordering column must not order differently per engine — the
    * q_multimodal_embed lesson), tie-broken lexicographically; the
    * top-30 cut is a TakeOrderedAndProject, k rows per partition. */
  def qTextPmi(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val toksCol = tokens(col("text"))
    val totals = d.agg(
      sum(size(toksCol).cast("bigint")).as("n_uni"),
      sum(greatest(size(toksCol) - 1, lit(0)).cast("bigint")).as("n_bi"))
    val uni = d.select(explode(toksCol).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("cu"))
    val bi = d.select(toksCol.as("w")).filter(size(col("w")) > 1)
      .select(explode(expr(
        "transform(sequence(0, size(w)-2), i -> struct(w[i] as t1, w[i+1] as t2))")).as("p"))
      .select(col("p.t1").as("t1"), col("p.t2").as("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= 5)
    bi
      .join(uni.withColumnsRenamed(Map("tok" -> "t1", "cu" -> "c1")), "t1")
      .join(uni.withColumnsRenamed(Map("tok" -> "t2", "cu" -> "c2")), "t2")
      .crossJoin(broadcast(totals))
      .select(col("t1"), col("t2"), col("cb"),
        round(log2((col("cb").cast("double") / col("n_bi").cast("double")) /
          ((col("c1").cast("double") / col("n_uni").cast("double")) *
            (col("c2").cast("double") / col("n_uni").cast("double")))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("t1"), col("t2"))
      .limit(30)
  }

  /** Pairwise vocabulary overlap between corpus sources: distinct-token
    * Jaccard per source pair — the corpus-diversity audit that tells a
    * mixing pipeline whether two feeds are near-duplicates of each other
    * or genuinely complementary. Shape: one distinct over (source, token)
    * — the vocabulary, tiny against the corpus — then an inverted-index
    * equi-join ON TOKEN for intersection counts (bounded per token by
    * source-count², never corpus-sized) and a broadcast of the per-source
    * sizes. The Jaccard is one integer-over-integer division per pair —
    * bit-identical across engines. */
  def qVocabOverlap(s: SparkSession, dir: String): DataFrame = {
    val v = documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .distinct()
      .cache() // feeds sizes + both join sides
    val sizes = v.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = v.as("a").join(v.as("b"), "tok")
      .filter(col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("s1"), col("b.source").as("s2"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.withColumnsRenamed(Map("source" -> "s1", "n" -> "n1"))), "s1")
      .join(broadcast(sizes.withColumnsRenamed(Map("source" -> "s2", "n" -> "n2"))), "s2")
      .select(col("s1"), col("s2"), col("n1"), col("n2"), col("n_common"),
        (col("n_common").cast("double") /
          (col("n1") + col("n2") - col("n_common")).cast("double"))
          .as("jaccard"))
      .orderBy("s1", "s2")
  }

  /** Per-document unigram entropy (bits) — the vocabulary-diversity
    * quality signal (near-zero = degenerate repetition, high = diverse
    * text). A float SUM over a group is normally reduce-order-dependent
    * and so un-oracle-able; here the per-term contributions accumulate as
    * an ordered prefix sum (ORDER BY token) and the last prefix is the
    * total — the same addition sequence in any engine, a generalizable
    * trick for making float reductions deterministic. `log2` may still
    * differ by an ulp between runtimes, so the result rounds to 6
    * decimals on both sides. One exchange on doc_id serves every window. */
  def qTextEntropy(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // H = log2(n) - (Σ c·log2 c)/n: the per-term contribution c·log2(c)
    // needs no doc total, so ONE ordered window (the prefix sum that makes
    // the float reduction deterministic) replaces the r6 shape's three
    // window passes + row_number; doc totals and the last prefix value
    // (max_by over tok) come from a groupBy that reuses the window's
    // hash partitioning on doc_id — no extra exchange, one sort.
    val prefix = Window.partitionBy("doc_id").orderBy("tok")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tf = documents(s, dir)
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val cd = col("c").cast("double")
    val n = sum(col("c")).cast("double")
    tf.withColumn("s_cum", sum(cd * log2(cd)).over(prefix))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(log2(n) - max_by(col("s_cum"), col("tok")) / n, 6)
          .as("entropy_bits"))
      .orderBy("doc_id")
  }

  /** Zipf power-law fit over the top-1000 vocabulary: linear regression
    * of ln(freq) on ln(rank) — slope ≈ −1 is the healthy-natural-text
    * signature; a flat slope flags boilerplate/templated corpora and a
    * cliff flags degenerate repetition. One corpus-level row.
    *
    * Scale shape: the only unbounded stage is the (tok → count)
    * aggregate; the top-1000 cut runs as TakeOrderedAndProject (k rows
    * per partition cross the wire), and every later stage — the global
    * rank, the five prefix sums, the closing aggregate — touches ≤1000
    * rows by construction. Determinism: the five ln-product sums
    * accumulate as ordered prefix sums (ORDER BY rank), so both engines
    * add in the same sequence; round(6) absorbs the ln ulp. */
  /** Heaps'-law vocabulary-growth audit (the [[qTextZipf]] companion):
    * cumulative corpus volume N and distinct vocabulary V at ten
    * doc-id-order checkpoints, plus the V = K·N^β log-log fit — the
    * "how fast does new data stop bringing new vocabulary" curve that
    * sizes tokenizer vocab and dedup expectations for a growing corpus.
    * The unit is the word BIGRAM: the fixture's unigram vocabulary is
    * closed (31 types, saturated within the first decile — β would be
    * exactly 0), while bigram types keep appearing corpus-long, so the
    * bigram curve is the one with an actual exponent to estimate.
    *
    * The cumulative-distinct trick: V at a checkpoint is NOT a
    * count-distinct rescan per checkpoint (10 full passes) — each
    * bigram's FIRST-occurrence doc is a single (bigram → min doc_id)
    * aggregate, V_k is then the count of first-occurrences below the
    * checkpoint, and both axes reduce to per-doc frames joined against
    * the broadcast 10-row checkpoint spine (a ×10 bounded expansion,
    * never a rescan). The fit uses the Zipf discipline: ordered prefix
    * sums over the 10 (ln N, ln V) points, round(6) absorbing the ln
    * ulp. */
  def qTextHeaps(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = documents(s, dir)
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val cuts = broadcast(nDocs.select(explode(expr(
      "transform(sequence(1, 10), k -> named_struct('k', k, 'thr', cast(n_docs * k / 10 as bigint)))"))
      .as("c")).select(col("c.k").as("k"), col("c.thr").as("thr")))
    val perDocTokens = d.select(col("doc_id"),
      greatest(size(tokens(col("text"))) - 1, lit(0)).cast("bigint").as("nt"))
    val nCum = perDocTokens.join(cuts, col("doc_id") < col("thr"))
      .groupBy("k").agg(sum(col("nt")).as("n_bigrams"))
    val firstDoc = d.select(col("doc_id"), explode(
        graft.plans.GraftExpressions.shingles(col("text"), 2)).as("tok"))
      .groupBy("tok").agg(min(col("doc_id")).as("fd"))
      .groupBy("fd").agg(count(lit(1)).as("nv"))
    val vCum = firstDoc.join(cuts, col("fd") < col("thr"))
      .groupBy("k").agg(sum(col("nv")).as("vocab"))
    val pts = nCum.join(vCum, Seq("k"))
    val x = log(col("n_bigrams").cast("double"))
    val y = log(col("vocab").cast("double"))
    val pw = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fit = pts
      .withColumn("sx", sum(x).over(pw)).withColumn("sy", sum(y).over(pw))
      .withColumn("sxx", sum(x * x).over(pw))
      .withColumn("sxy", sum(x * y).over(pw))
      .groupBy()
      .agg(count(lit(1)).as("n_pts"),
        max_by(col("sx"), col("k")).as("sx"),
        max_by(col("sy"), col("k")).as("sy"),
        max_by(col("sxx"), col("k")).as("sxx"),
        max_by(col("sxy"), col("k")).as("sxy"))
    val n = col("n_pts").cast("double")
    val beta = (col("sxy") / n - (col("sx") / n) * (col("sy") / n)) /
      (col("sxx") / n - (col("sx") / n) * (col("sx") / n))
    val fitted = fit.select(
      round(beta, 6).as("heaps_beta"),
      round(exp(col("sy") / n - beta * (col("sx") / n)), 6).as("heaps_k"))
    pts.crossJoin(broadcast(fitted))
      .select(col("k"), col("n_bigrams"), col("vocab"),
        col("heaps_beta"), col("heaps_k"))
      .orderBy("k")
  }

  def qTextZipf(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = documents(s, dir)
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val top = tf.orderBy(col("c").desc, col("tok")).limit(1000)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("c").desc, col("tok"))))
    val x = log(col("rank").cast("double"))
    val y = log(col("c").cast("double"))
    val pw = Window.orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sums = top
      .withColumn("sx", sum(x).over(pw))
      .withColumn("sy", sum(y).over(pw))
      .withColumn("sxx", sum(x * x).over(pw))
      .withColumn("sxy", sum(x * y).over(pw))
      .withColumn("syy", sum(y * y).over(pw))
      .groupBy()
      .agg(count(lit(1)).as("n_terms"),
        max_by(col("sx"), col("rank")).as("sx"),
        max_by(col("sy"), col("rank")).as("sy"),
        max_by(col("sxx"), col("rank")).as("sxx"),
        max_by(col("sxy"), col("rank")).as("sxy"),
        max_by(col("syy"), col("rank")).as("syy"))
    val n = col("n_terms").cast("double")
    val mx = col("sx") / n
    val my = col("sy") / n
    val vx = col("sxx") / n - mx * mx
    val vy = col("syy") / n - my * my
    val cov = col("sxy") / n - mx * my
    val slope = cov / vx
    sums.select(col("n_terms"),
      round(slope, 6).as("zipf_slope"),
      round(my - slope * mx, 6).as("intercept"),
      round((cov * cov) / (vx * vy), 6).as("r2"))
  }

  /** Per-document cross-entropy (bits/token) under the corpus unigram
    * LM — the CCNet-style perplexity quality filter: low bits/token means
    * stereotypical in-distribution text, high flags rare-vocabulary
    * outliers (or noise) worth down-weighting before training.
    * H(d) = Σ_t c_d(t)·log2(N/C(t)) / |d|, C(t) the corpus count.
    *
    * Scale shape: one (doc_id, tok) aggregate; corpus counts C(t) arrive
    * by a tok-keyed window over that aggregate (never the raw explode);
    * the grand total N broadcasts as a 1-row aggregate of per-doc token
    * counts. The float sum accumulates as an ordered prefix sum (ORDER BY
    * tok inside doc_id) — the [[qTextEntropy]] determinism trick — and
    * round(6) absorbs the log2 ulp. */
  def qTextPerplexity(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokens(col("text"))
    val tot = documents(s, dir)
      .agg(sum(size(toks).cast("bigint")).as("n_total"))
    val tf = documents(s, dir)
      .select(col("doc_id"), explode(toks).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
    val byTok = Window.partitionBy("tok")
    val prefix = Window.partitionBy("doc_id").orderBy("tok")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val term = col("c").cast("double") *
      log2(col("n_total").cast("double") / col("c_t").cast("double"))
    tf.crossJoin(broadcast(tot))
      .withColumn("c_t", sum(col("c")).over(byTok))
      .withColumn("cum", sum(term).over(prefix))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_tokens"),
        round(max_by(col("cum"), col("tok")) / sum(col("c")).cast("double"),
          6).as("xent_bits_per_tok"))
      .orderBy("doc_id")
  }

  /** LIX readability index per document: words/sentences +
    * 100·long_words/words (long = more than 6 chars) — the classic
    * readability score whose inputs are pure integer counts, so both
    * engines count identically (no syllable heuristics). Sentence count
    * is the `[.!?]` terminator count floored at 1 (a terminator-less doc
    * is one sentence — the fixture corpus has no punctuation at all).
    * Pure per-row projection: zero shuffles at any corpus size. */
  def qTextReadability(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    documents(s, dir).select(
      col("doc_id"),
      size(toks).cast("bigint").as("n_words"),
      greatest(length(regexp_replace(col("text"), "[^.!?]", "")), lit(1))
        .cast("bigint").as("n_sents"),
      size(filter(toks, t => length(t) > 6)).cast("bigint").as("n_long"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("n_words"), col("n_sents"), col("n_long"),
        (col("n_words").cast("double") / col("n_sents").cast("double") +
          lit(100.0) * col("n_long").cast("double") /
            col("n_words").cast("double")).as("lix"))
      .orderBy("doc_id")
  }

  /** Per-source hapax-legomenon ratio (share of the vocabulary appearing
    * exactly once) — the vocabulary-richness audit: natural prose sits
    * around 0.4–0.6, templated/boilerplate corpora collapse toward 0,
    * OCR noise inflates toward 1. One (source, tok) partial-aggregated
    * count; the ratio is a single integer-over-integer division. */
  def qTextHapax(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_vocab"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("source"), col("n_vocab"), col("n_hapax"),
        (col("n_hapax").cast("double") / col("n_vocab").cast("double"))
          .as("hapax_ratio"))
      .orderBy("source")

  /** Per-document n-gram novelty vs the whole corpus: the share of a
    * document's distinct word-3-gram shingles that no other document
    * contains (df = 1, novelty — high for fresh prose) and the share that
    * is corpus-boilerplate (df ≥ 10% of documents — headers, templates,
    * license blurbs; the C4/RefinedWeb "remove lines repeated across
    * pages" signal re-expressed at shingle granularity for a corpus with
    * no line structure). The boilerplate threshold scales with the corpus
    * (`df·10 ≥ n_docs`, pure integer compare — no float threshold to
    * drift), so the same query is meaningful at any SF.
    *
    * Scale shape: explode distinct shingles (the [[graft.plans.Shingles3Expr]]
    * codegen kernel), ONE shuffle keyed by shingle for the document
    * frequency (map-side combine), join the df back on the same key (the
    * exchange is reused), one shuffle back to doc_id for the per-doc
    * ratios; the corpus size rides along as a broadcast scalar. Both
    * ratios are single divisions of exact integers — bit-identical across
    * engines, no rounding needed. */
  def qTextNovelty(s: SparkSession, dir: String): DataFrame = {
    val ex = documents(s, dir).select(col("doc_id"),
      explode(graft.plans.GraftExpressions.shingles3(col("text"))).as("gram"))
    val dfreq = ex.groupBy("gram").agg(count(lit(1)).as("df"))
    val nDocs = documents(s, dir).agg(count(lit(1)).as("n_docs"))
    ex.join(dfreq, "gram")
      .crossJoin(broadcast(nDocs))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"),
        sum(when(col("df") * 10 >= col("n_docs"), 1L).otherwise(0L))
          .as("n_boiler"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"), col("n_boiler"),
        (col("n_novel").cast("double") / col("n_shingles").cast("double"))
          .as("novelty_ratio"),
        (col("n_boiler").cast("double") / col("n_shingles").cast("double"))
          .as("boiler_ratio"))
      .orderBy("doc_id")
  }

  /** Gopher-style rule-based filter with a per-rule attrition report
    * (Rae et al. 2021, "Scaling Language Models: ... Gopher", App. A —
    * the doc-level quality gates every pretraining pipeline reports
    * before training): token-count bounds, mean-word-length bounds,
    * symbol-ratio cap, stopword floor, and a repetition gate
    * (distinct-token ratio), plus the combined `any_rule` row —
    * attrition per rule is what you tune thresholds against.
    *
    * Every predicate is an exact INTEGER comparison (mean word length
    * in [2,12] ⇔ 2·n ≤ chars ≤ 12·n cross-multiplied; symbol ratio
    * < 0.3 ⇔ 10·punct < 3·chars), so there is no float boundary to
    * disagree on. Scale: one map-side per-row projection feeding a
    * single 6-row aggregate of boolean sums — zero joins, zero
    * windows; the rate division is exact-integer-over-integer. */
  /** The five Gopher fail predicates over a raw text column — the ONE
    * source of truth shared by the attrition report ([[qTextGopher]])
    * and the calibration label ([[gopherPassAll]]), so a threshold
    * tweak cannot make the two silently disagree. Every predicate is an
    * exact cross-multiplied integer comparison. */
  private def gopherFails(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nChars = length(text).cast("bigint")
    val nTokens = size(toks).cast("bigint")
    val nDistinct = size(array_distinct(toks)).cast("bigint")
    val tokChars = aggregate(toks, lit(0L), (a, t) => a + length(t))
    val punct = length(regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("bigint")
    val stops = stopHits(toks, enStop).cast("bigint")
    Seq(
      "f_len" -> !(nTokens >= 10 && nTokens <= 1000),
      "f_wordlen" -> !(tokChars >= nTokens * 2 && tokChars <= nTokens * 12),
      "f_symbol" -> !(punct * 10 < nChars * 3),
      "f_stopword" -> !(stops >= 2),
      "f_repetition" -> !(nDistinct * 10 >= nTokens * 3))
  }

  def qTextGopher(s: SparkSession, dir: String): DataFrame = {
    val fails = gopherFails(col("text"))
    def cnt(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    val agged = documents(s, dir).agg(
      count(lit(1)).as("n_docs"),
      (fails.map { case (name, c) => cnt(c).as(name) } :+
        cnt(fails.map(_._2).reduce(_ || _)).as("f_any")): _*)
    agged.select(col("n_docs"), expr(
      "stack(6, 'doc_length', f_len, 'mean_word_length', f_wordlen," +
        " 'symbol_ratio', f_symbol, 'stopword_floor', f_stopword," +
        " 'repetition', f_repetition, 'any_rule', f_any) AS (rule, n_failed)"))
      .select(col("rule"), col("n_failed"), col("n_docs"),
        (col("n_failed").cast("double") / col("n_docs").cast("double"))
          .as("fail_rate"))
      .orderBy("rule")
  }

  /** "Passes every Gopher gate" as one boolean column — the negated
    * conjunction of the SHARED [[gopherFails]] predicates; the
    * pseudo-label for calibration audits. */
  private def gopherPassAll(text: Column): Column =
    !gopherFails(text).map(_._2).reduce(_ || _)

  /** Calibration audit of the quality score against the Gopher gate —
    * Expected Calibration Error over 10 equal-width probability bins
    * (Guo et al. 2017's reliability-diagram statistic): treating
    * [[qualityScore]] as P(doc passes all quality gates), per bin the
    * mean predicted score (confidence) vs the empirical pass rate
    * (accuracy), their gap, and the n-weighted ECE — the audit that
    * says whether a learned/heuristic quality filter's scores can be
    * thresholded on faith or need recalibrating first.
    *
    * Determinism: the score is bit-exact cross-engine (the
    * [[qualityScore]] contract), so binning agrees exactly; per-bin
    * score sums accumulate as doc_id-ordered prefix sums, the gap
    * rounds to 6 dp, and the ECE is a bin-ordered prefix sum of
    * exactly-representable n/N weights times rounded gaps. Scale: one
    * map-side projection → 10-bin aggregate; the label is integer
    * arithmetic; nothing wide beyond the bin shuffle. */
  def qEvalCalibration(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = documents(s, dir).select(col("doc_id"),
      qualityScore(col("text")).as("score"),
      gopherPassAll(col("text")).as("label"))
      .withColumn("bin", least(floor(col("score") * 10), lit(9)).cast("int"))
    val prefix = Window.partitionBy("bin").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bins = scored.withColumn("cum", sum(col("score")).over(prefix))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        max_by(col("cum"), col("doc_id")).as("ssum"),
        sum(when(col("label"), 1L).otherwise(0L)).as("n_pass"))
    val tot = bins.agg(sum(col("n_docs")).as("n_total"))
    val gapped = bins.crossJoin(broadcast(tot))
      .withColumn("conf", col("ssum") / col("n_docs"))
      .withColumn("acc", col("n_pass").cast("double") / col("n_docs"))
      .withColumn("gap", round(abs(col("conf") - col("acc")), 6))
    val ecePrefix = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ece = gapped
      .withColumn("t",
        (col("n_docs").cast("double") / col("n_total")) * col("gap"))
      .withColumn("ec", sum(col("t")).over(ecePrefix))
      .agg(round(max_by(col("ec"), col("bin")), 6).as("ece"))
    gapped.crossJoin(broadcast(ece))
      .select(col("bin"), col("n_docs"), round(col("conf"), 6).as("conf"),
        col("acc"), col("gap"), col("ece"))
      .orderBy("bin")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_eval_calibration" -> qEvalCalibration,
    "q_text_heaps" -> qTextHeaps,
    "q_text_gopher" -> qTextGopher,
    "q_text_novelty" -> qTextNovelty,
    "q_text_hapax" -> qTextHapax,
    "q_text_perplexity" -> qTextPerplexity,
    "q_text_readability" -> qTextReadability,
    "q_text_zipf" -> qTextZipf,
    "q_text_pmi" -> qTextPmi,
    "q_text_entropy" -> qTextEntropy,
    "q_vocab_overlap" -> qVocabOverlap,
    "q_text_bigrams" -> qTextBigrams,
    "q_text_bm25" -> qTextBm25,
    "q_rank_rbo" -> qRankRbo,
    "q_rank_rrf" -> qRankRrf,
    "q_rank_ndcg" -> qRankNdcg,
    "q_vocab_topk" -> qVocabTopk,
    "q_text_tfidf" -> qTextTfidf,
    "q_text_chunk" -> qTextChunk,
    "q_text_repetition" -> qTextRepetition,
    "q_text_rolling" -> qTextRolling,
    "q_text_stats" -> qTextStats,
    "q_text_quality" -> qTextQuality,
    "q_text_langid" -> qTextLangid,
    "q_text_tokens" -> qTextTokens,
    "q_text_fingerprint" -> qTextFingerprint,
  )

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ",", "]")

  /** DuckDB form of [[qualityScore]] (same ops, same order), for oracles
    * of pipeline stages that gate on the score. `toks` must name a
    * token-list column built as
    * `list_filter(string_split(text,' '), x -> x <> '')`. */
  def qualityScoreSql(toks: String, text: String): String =
    s"0.25 * least(1.0, len($toks) / 50.0)" +
      s" + 0.25 * (1.0 - CASE WHEN length($text) > 0 THEN length(regexp_replace($text, '[A-Za-z0-9 ]', '', 'g')) / length($text) ELSE 1.0 END)" +
      s" + 0.25 * least(1.0, (CASE WHEN len($toks) > 0 THEN len(list_filter($toks, x -> list_contains(${sqlList(enStop)}, x))) / len($toks) ELSE 0.0 END) * 4.0)" +
      s" + 0.25 * (CASE WHEN len($toks) > 0 THEN len(list_distinct($toks)) / len($toks) ELSE 0.0 END)"

  val oracles: Map[String, String] = Map(
    "q_eval_calibration" ->
      s"""WITH t AS (SELECT doc_id, text, list_filter(string_split(text,' '), x -> x <> '') AS w FROM documents),
         |sc AS (SELECT doc_id, ${qualityScoreSql("w", "text")} AS score,
         |  (len(w) >= 10 AND len(w) <= 1000
         |   AND list_sum([length(x) FOR x IN w]) >= len(w) * 2 AND list_sum([length(x) FOR x IN w]) <= len(w) * 12
         |   AND length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) * 10 < length(text) * 3
         |   AND len(list_filter(w, x -> list_contains(${sqlList(enStop)}, x))) >= 2
         |   AND len(list_distinct(w)) * 10 >= len(w) * 3) AS label FROM t),
         |b AS (SELECT doc_id, score, label, CAST(least(floor(score * 10), 9) AS INT) AS bin FROM sc),
         |pre AS (SELECT bin, doc_id, label, sum(score) OVER (PARTITION BY bin ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM b),
         |bins AS (SELECT bin, count(*) AS n_docs, max_by(cum, doc_id) AS ssum,
         |    sum(CASE WHEN label THEN 1 ELSE 0 END) AS n_pass FROM pre GROUP BY bin),
         |tt AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM bins),
         |g AS (SELECT bin, CAST(n_docs AS BIGINT) AS n_docs, ssum / n_docs AS conf_raw,
         |    CAST(n_pass AS DOUBLE) / n_docs AS acc,
         |    round(abs(ssum / n_docs - CAST(n_pass AS DOUBLE) / n_docs), 6) AS gap, n_total
         |  FROM bins, tt),
         |e AS (SELECT round(max_by(ec, bin), 6) AS ece FROM (
         |  SELECT bin, sum((CAST(n_docs AS DOUBLE) / n_total) * gap) OVER (ORDER BY bin
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ec FROM g))
         |SELECT bin, n_docs, round(conf_raw, 6) AS conf, acc, gap, ece FROM g, e ORDER BY bin""".stripMargin,
    "q_text_heaps" ->
      """WITH nd AS (SELECT count(*) AS n_docs FROM documents),
        |cuts AS (SELECT k, CAST(n_docs * k / 10 AS BIGINT) AS thr
        |  FROM nd, (SELECT unnest(range(1, 11)) AS k)),
        |pdt AS (SELECT doc_id, CAST(greatest(len(list_filter(string_split(text,' '), x -> x <> '')) - 1, 0) AS BIGINT) AS nt FROM documents),
        |ncum AS (SELECT k, CAST(sum(nt) AS BIGINT) AS n_bigrams FROM pdt JOIN cuts ON doc_id < thr GROUP BY k),
        |tk AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w FROM documents),
        |fdoc AS (SELECT b, min(doc_id) AS fd
        |  FROM (SELECT doc_id, unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))]) AS b FROM tk WHERE len(w) >= 2)
        |  GROUP BY b),
        |fcnt AS (SELECT fd, count(*) AS nv FROM fdoc GROUP BY fd),
        |vcum AS (SELECT k, CAST(sum(nv) AS BIGINT) AS vocab FROM fcnt JOIN cuts ON fd < thr GROUP BY k),
        |pts AS (SELECT k, n_bigrams, vocab FROM ncum JOIN vcum USING (k)),
        |pre AS (SELECT k, n_bigrams, vocab,
        |  sum(ln(CAST(n_bigrams AS DOUBLE))) OVER w AS sx,
        |  sum(ln(CAST(vocab AS DOUBLE))) OVER w AS sy,
        |  sum(ln(CAST(n_bigrams AS DOUBLE)) * ln(CAST(n_bigrams AS DOUBLE))) OVER w AS sxx,
        |  sum(ln(CAST(n_bigrams AS DOUBLE)) * ln(CAST(vocab AS DOUBLE))) OVER w AS sxy
        |  FROM pts WINDOW w AS (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |agg AS (SELECT CAST(count(*) AS DOUBLE) AS n, max_by(sx, k) AS sx, max_by(sy, k) AS sy,
        |  max_by(sxx, k) AS sxx, max_by(sxy, k) AS sxy FROM pre),
        |fit AS (SELECT round((sxy/n - (sx/n)*(sy/n)) / (sxx/n - (sx/n)*(sx/n)), 6) AS heaps_beta,
        |  round(exp(sy/n - ((sxy/n - (sx/n)*(sy/n)) / (sxx/n - (sx/n)*(sx/n))) * (sx/n)), 6) AS heaps_k
        |  FROM agg)
        |SELECT CAST(k AS INT) AS k, n_bigrams, vocab, heaps_beta, heaps_k
        |FROM pts, fit ORDER BY k""".stripMargin,
    "q_text_gopher" ->
      s"""WITH base AS (SELECT
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
         |  CAST(list_sum([length(x) FOR x IN w]) AS BIGINT) AS tok_chars,
         |  CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS punct_chars,
         |  CAST(len(list_filter(w, x -> list_contains(${sqlList(enStop)}, x))) AS BIGINT) AS stop_hits
         |  FROM (SELECT text, list_filter(string_split(text,' '), x -> x <> '') AS w FROM documents)),
         |f AS (SELECT
         |  NOT (n_tokens >= 10 AND n_tokens <= 1000) AS f_len,
         |  NOT (tok_chars >= n_tokens * 2 AND tok_chars <= n_tokens * 12) AS f_wordlen,
         |  NOT (punct_chars * 10 < n_chars * 3) AS f_symbol,
         |  NOT (stop_hits >= 2) AS f_stopword,
         |  NOT (n_distinct * 10 >= n_tokens * 3) AS f_repetition FROM base),
         |a AS (SELECT count(*) AS n_docs,
         |  sum(CASE WHEN f_len THEN 1 ELSE 0 END) AS f_len,
         |  sum(CASE WHEN f_wordlen THEN 1 ELSE 0 END) AS f_wordlen,
         |  sum(CASE WHEN f_symbol THEN 1 ELSE 0 END) AS f_symbol,
         |  sum(CASE WHEN f_stopword THEN 1 ELSE 0 END) AS f_stopword,
         |  sum(CASE WHEN f_repetition THEN 1 ELSE 0 END) AS f_repetition,
         |  sum(CASE WHEN f_len OR f_wordlen OR f_symbol OR f_stopword OR f_repetition THEN 1 ELSE 0 END) AS f_any
         |  FROM f)
         |SELECT rule, CAST(n_failed AS BIGINT) AS n_failed, CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_failed AS DOUBLE)/CAST(n_docs AS DOUBLE) AS fail_rate
         |FROM (SELECT n_docs, unnest(['doc_length','mean_word_length','symbol_ratio','stopword_floor','repetition','any_rule']) AS rule,
         |  unnest([f_len, f_wordlen, f_symbol, f_stopword, f_repetition, f_any]) AS n_failed FROM a)
         |ORDER BY rule""".stripMargin,
    "q_text_novelty" ->
      """WITH w AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w FROM documents),
        |ex AS (SELECT doc_id, unnest(list_distinct([array_to_string(w[i:i+2],' ') FOR i IN range(1, len(w)-1)])) AS gram
        |  FROM w WHERE len(w) >= 3),
        |dfreq AS (SELECT gram, count(*) AS df FROM ex GROUP BY gram),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, count(*) AS n_shingles,
        |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  CAST(sum(CASE WHEN df * 10 >= n_docs THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
        |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS novelty_ratio,
        |  CAST(sum(CASE WHEN df * 10 >= n_docs THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS boiler_ratio
        |FROM ex JOIN dfreq USING (gram), n
        |GROUP BY doc_id, n_docs ORDER BY doc_id""".stripMargin,
    "q_text_hapax" ->
      """WITH t AS (SELECT source, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS tok FROM documents),
        |tf AS (SELECT source, tok, count(*) AS c FROM t GROUP BY source, tok)
        |SELECT source, count(*) AS n_vocab,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS hapax_ratio
        |FROM tf GROUP BY source ORDER BY source""".stripMargin,
    "q_text_perplexity" ->
      """WITH t AS (SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok),
        |tot AS (SELECT CAST(sum(len(list_filter(string_split(text,' '), x -> x <> ''))) AS BIGINT) AS n_total FROM documents),
        |x AS (SELECT doc_id, tok, c, sum(c) OVER (PARTITION BY tok) AS c_t,
        |  n_total FROM tf, tot),
        |y AS (SELECT doc_id, tok, c,
        |  sum(CAST(c AS DOUBLE) * log2(CAST(n_total AS DOUBLE) / CAST(c_t AS DOUBLE)))
        |    OVER (PARTITION BY doc_id ORDER BY tok
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM x)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  round(max_by(cum, tok) / CAST(sum(c) AS DOUBLE), 6) AS xent_bits_per_tok
        |FROM y GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_text_readability" ->
      """WITH b AS (SELECT doc_id,
        |  CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS n_words,
        |  CAST(greatest(length(regexp_replace(text, '[^.!?]', '', 'g')), 1) AS BIGINT) AS n_sents,
        |  CAST(len(list_filter(string_split(text,' '), x -> length(x) > 6)) AS BIGINT) AS n_long
        |  FROM documents)
        |SELECT doc_id, n_words, n_sents, n_long,
        |  CAST(n_words AS DOUBLE)/CAST(n_sents AS DOUBLE)
        |    + 100.0 * CAST(n_long AS DOUBLE)/CAST(n_words AS DOUBLE) AS lix
        |FROM b WHERE n_words > 0 ORDER BY doc_id""".stripMargin,
    "q_text_pmi" ->
      """WITH t AS (SELECT list_filter(string_split(text,' '), x -> x <> '') AS w FROM documents),
        |u AS (SELECT tok, count(*) AS cu FROM (SELECT unnest(w) AS tok FROM t) GROUP BY tok),
        |tot AS (SELECT CAST(sum(len(w)) AS BIGINT) AS n_uni,
        |  CAST(sum(greatest(len(w) - 1, 0)) AS BIGINT) AS n_bi FROM t),
        |i AS (SELECT w, unnest(range(1, len(w))) AS i FROM t WHERE len(w) > 1),
        |b AS (SELECT w[i] AS t1, w[i+1] AS t2, count(*) AS cb FROM i GROUP BY t1, t2
        |  HAVING count(*) >= 5)
        |SELECT t1, t2, cb,
        |  round(log2((CAST(cb AS DOUBLE)/CAST(n_bi AS DOUBLE)) /
        |    ((CAST(u1.cu AS DOUBLE)/CAST(n_uni AS DOUBLE)) * (CAST(u2.cu AS DOUBLE)/CAST(n_uni AS DOUBLE)))), 6) AS pmi
        |FROM b JOIN u u1 ON u1.tok = b.t1 JOIN u u2 ON u2.tok = b.t2, tot
        |ORDER BY pmi DESC, t1, t2 LIMIT 30""".stripMargin,
    "q_text_zipf" ->
      """WITH t AS (SELECT unnest(list_filter(string_split(text,' '), x -> x <> '')) AS tok FROM documents),
        |tf AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
        |top AS (SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok) AS rank
        |  FROM tf QUALIFY rank <= 1000),
        |p AS (SELECT rank,
        |  sum(ln(CAST(rank AS DOUBLE))) OVER w AS sx,
        |  sum(ln(CAST(c AS DOUBLE))) OVER w AS sy,
        |  sum(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE))) OVER w AS sxx,
        |  sum(ln(CAST(rank AS DOUBLE)) * ln(CAST(c AS DOUBLE))) OVER w AS sxy,
        |  sum(ln(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE))) OVER w AS syy
        |  FROM top
        |  WINDOW w AS (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |  max_by(sx, rank) AS sx, max_by(sy, rank) AS sy,
        |  max_by(sxx, rank) AS sxx, max_by(sxy, rank) AS sxy,
        |  max_by(syy, rank) AS syy FROM p),
        |m AS (SELECT n_terms, CAST(n_terms AS DOUBLE) AS n, sx, sy, sxx, sxy, syy FROM f),
        |g AS (SELECT n_terms,
        |  sxx/n - (sx/n)*(sx/n) AS vx,
        |  syy/n - (sy/n)*(sy/n) AS vy,
        |  sxy/n - (sx/n)*(sy/n) AS cov,
        |  sx/n AS mx, sy/n AS my FROM m)
        |SELECT n_terms,
        |  round(cov/vx, 6) AS zipf_slope,
        |  round(my - (cov/vx)*mx, 6) AS intercept,
        |  round((cov*cov)/(vx*vy), 6) AS r2
        |FROM g""".stripMargin,
    "q_text_rolling" ->
      """WITH pos AS (
        |  SELECT doc_id, text, unnest(range(1, length(text) - 30)) AS i
        |  FROM documents WHERE length(text) >= 32),
        |h AS (
        |  SELECT doc_id,
        |    list_reduce(list_transform(range(0, 32),
        |      j -> CAST(unicode(substr(text, CAST(i AS INT) + CAST(j AS INT), 1)) AS HUGEINT)),
        |      (a, b) -> (a * 257 + b) % CAST(2305843009213693951 AS HUGEINT)) AS hash
        |  FROM pos),
        |agg AS (
        |  SELECT doc_id, CAST(count(DISTINCT hash) AS INT) AS n_windows,
        |    CAST(min(hash) AS BIGINT) AS min_window_hash
        |  FROM h GROUP BY doc_id)
        |SELECT d.doc_id, coalesce(a.n_windows, 0) AS n_windows, a.min_window_hash
        |FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_text_entropy" ->
      """WITH t AS (SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok),
        |x AS (SELECT doc_id, tok, c,
        |  sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
        |    OVER (PARTITION BY doc_id ORDER BY tok
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_cum
        |  FROM tf)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  round(log2(CAST(sum(c) AS DOUBLE)) - max_by(s_cum, tok) / CAST(sum(c) AS DOUBLE), 6) AS entropy_bits
        |FROM x GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_vocab_overlap" ->
      """WITH v AS (SELECT DISTINCT source, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS tok FROM documents),
        |sz AS (SELECT source, count(*) AS n FROM v GROUP BY source),
        |i AS (SELECT a.source AS s1, b.source AS s2, count(*) AS n_common
        |  FROM v a JOIN v b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY s1, s2)
        |SELECT s1, s2, x.n AS n1, y.n AS n2, n_common,
        |  CAST(n_common AS DOUBLE) / CAST(x.n + y.n - n_common AS DOUBLE) AS jaccard
        |FROM i JOIN sz x ON i.s1 = x.source JOIN sz y ON i.s2 = y.source
        |ORDER BY s1, s2""".stripMargin,
    "q_text_bigrams" ->
      """WITH t AS (SELECT list_filter(string_split(text,' '), x -> x <> '') AS w FROM documents),
        |i AS (SELECT w, unnest(range(1, len(w))) AS i FROM t WHERE len(w) > 1)
        |SELECT w[i] AS t1, w[i+1] AS t2, count(*) AS n FROM i GROUP BY t1, t2
        |ORDER BY n DESC, t1, t2 LIMIT 30""".stripMargin,
    "q_text_bm25" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w FROM documents),
        |d AS (SELECT doc_id, w, len(w) AS dl FROM t),
        |c AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |  CAST(sum(dl) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avgdl FROM d),
        |tf AS (SELECT doc_id, dl, tok, count(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(w) AS tok FROM d)
        |  WHERE tok IN ('hash','spark','window') GROUP BY doc_id, dl, tok),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |sc AS (SELECT doc_id, tok,
        |  ln(1.0 + (n_docs - CAST(df AS DOUBLE) + 0.5)/(CAST(df AS DOUBLE) + 0.5))
        |  * ((CAST(tf AS DOUBLE) * 2.2) /
        |     (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)/avgdl))) AS contrib
        |  FROM tf JOIN df USING (tok), c),
        |g AS (SELECT doc_id,
        |  coalesce(max(CASE WHEN tok='hash' THEN contrib END), 0.0)
        |  + coalesce(max(CASE WHEN tok='spark' THEN contrib END), 0.0)
        |  + coalesce(max(CASE WHEN tok='window' THEN contrib END), 0.0) AS score
        |  FROM sc GROUP BY doc_id)
        |SELECT doc_id, round(score, 6) AS bm25 FROM g
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin,
    "q_rank_rbo" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w FROM documents),
        |d AS (SELECT doc_id, w, len(w) AS dl FROM t),
        |c AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |  CAST(sum(dl) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avgdl FROM d),
        |tf AS (SELECT doc_id, dl, tok, count(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(w) AS tok FROM d)
        |  WHERE tok IN ('hash','spark','window') GROUP BY doc_id, dl, tok),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |sc AS (SELECT doc_id, tok,
        |  ln(1.0 + (n_docs - CAST(df AS DOUBLE) + 0.5)/(CAST(df AS DOUBLE) + 0.5))
        |  * ((CAST(tf AS DOUBLE) * 2.2) /
        |     (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)/avgdl))) AS cb,
        |  CAST(tf AS DOUBLE) * ln(n_docs / CAST(df AS DOUBLE)) AS ct
        |  FROM tf JOIN df USING (tok), c),
        |g AS (SELECT doc_id,
        |  round(coalesce(max(CASE WHEN tok='hash' THEN cb END), 0.0)
        |   + coalesce(max(CASE WHEN tok='spark' THEN cb END), 0.0)
        |   + coalesce(max(CASE WHEN tok='window' THEN cb END), 0.0), 6) AS sa,
        |  round(coalesce(max(CASE WHEN tok='hash' THEN ct END), 0.0)
        |   + coalesce(max(CASE WHEN tok='spark' THEN ct END), 0.0)
        |   + coalesce(max(CASE WHEN tok='window' THEN ct END), 0.0), 6) AS sb
        |  FROM sc GROUP BY doc_id),
        |ta AS (SELECT doc_id, sa FROM g ORDER BY sa DESC, doc_id LIMIT 20),
        |ra AS (SELECT doc_id, row_number() OVER (ORDER BY sa DESC, doc_id) AS ra FROM ta),
        |tb AS (SELECT doc_id, sb FROM g ORDER BY sb DESC, doc_id LIMIT 20),
        |rb AS (SELECT doc_id, row_number() OVER (ORDER BY sb DESC, doc_id) AS rb FROM tb),
        |j AS (SELECT greatest(ra.ra, rb.rb) AS md FROM ra JOIN rb USING (doc_id)),
        |dd AS (SELECT unnest(range(1, 21)) AS d),
        |x AS (SELECT dd.d, CAST(count(j.md) AS BIGINT) AS x_d
        |  FROM dd LEFT JOIN j ON j.md <= dd.d GROUP BY dd.d)
        |SELECT d, x_d,
        |  round(sum(0.1 * power(0.9, d - 1) * CAST(x_d AS DOUBLE) / d)
        |    OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS rbo
        |FROM x ORDER BY d""".stripMargin,
    "q_rank_rrf" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w FROM documents),
        |d AS (SELECT doc_id, w, len(w) AS dl FROM t),
        |c AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |  CAST(sum(dl) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avgdl FROM d),
        |tf AS (SELECT doc_id, dl, tok, count(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(w) AS tok FROM d)
        |  WHERE tok IN ('hash','spark','window') GROUP BY doc_id, dl, tok),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |sc AS (SELECT doc_id, tok,
        |  ln(1.0 + (n_docs - CAST(df AS DOUBLE) + 0.5)/(CAST(df AS DOUBLE) + 0.5))
        |  * ((CAST(tf AS DOUBLE) * 2.2) /
        |     (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)/avgdl))) AS cb,
        |  CAST(tf AS DOUBLE) * ln(n_docs / CAST(df AS DOUBLE)) AS ct
        |  FROM tf JOIN df USING (tok), c),
        |g AS (SELECT doc_id,
        |  round(coalesce(max(CASE WHEN tok='hash' THEN cb END), 0.0)
        |   + coalesce(max(CASE WHEN tok='spark' THEN cb END), 0.0)
        |   + coalesce(max(CASE WHEN tok='window' THEN cb END), 0.0), 6) AS sa,
        |  round(coalesce(max(CASE WHEN tok='hash' THEN ct END), 0.0)
        |   + coalesce(max(CASE WHEN tok='spark' THEN ct END), 0.0)
        |   + coalesce(max(CASE WHEN tok='window' THEN ct END), 0.0), 6) AS sb
        |  FROM sc GROUP BY doc_id),
        |ta AS (SELECT doc_id, sa FROM g ORDER BY sa DESC, doc_id LIMIT 20),
        |ra AS (SELECT doc_id, row_number() OVER (ORDER BY sa DESC, doc_id) AS ra FROM ta),
        |tb AS (SELECT doc_id, sb FROM g ORDER BY sb DESC, doc_id LIMIT 20),
        |rb AS (SELECT doc_id, row_number() OVER (ORDER BY sb DESC, doc_id) AS rb FROM tb)
        |SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
        |  CAST(ra.ra AS INT) AS ra, CAST(rb.rb AS INT) AS rb,
        |  coalesce(1.0 / (60.0 + CAST(ra.ra AS DOUBLE)), 0.0)
        |    + coalesce(1.0 / (60.0 + CAST(rb.rb AS DOUBLE)), 0.0) AS fused
        |FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
        |ORDER BY fused DESC, coalesce(ra.doc_id, rb.doc_id) LIMIT 10""".stripMargin,
    "q_rank_ndcg" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w FROM documents),
        |d AS (SELECT doc_id, w, len(w) AS dl FROM t),
        |c AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |  CAST(sum(dl) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avgdl FROM d),
        |tf AS (SELECT doc_id, dl, tok, count(*) AS tf
        |  FROM (SELECT doc_id, dl, unnest(w) AS tok FROM d)
        |  WHERE tok IN ('hash','spark','window') GROUP BY doc_id, dl, tok),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |sc AS (SELECT doc_id, tok,
        |  ln(1.0 + (n_docs - CAST(df AS DOUBLE) + 0.5)/(CAST(df AS DOUBLE) + 0.5))
        |  * ((CAST(tf AS DOUBLE) * 2.2) /
        |     (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)/avgdl))) AS cb,
        |  CAST(tf AS DOUBLE) * ln(n_docs / CAST(df AS DOUBLE)) AS ct
        |  FROM tf JOIN df USING (tok), c),
        |g AS (SELECT doc_id,
        |  round(coalesce(max(CASE WHEN tok='hash' THEN cb END), 0.0)
        |   + coalesce(max(CASE WHEN tok='spark' THEN cb END), 0.0)
        |   + coalesce(max(CASE WHEN tok='window' THEN cb END), 0.0), 6) AS sa,
        |  round(coalesce(max(CASE WHEN tok='hash' THEN ct END), 0.0)
        |   + coalesce(max(CASE WHEN tok='spark' THEN ct END), 0.0)
        |   + coalesce(max(CASE WHEN tok='window' THEN ct END), 0.0), 6) AS sb
        |  FROM sc GROUP BY doc_id),
        |ta AS (SELECT doc_id, sa FROM g ORDER BY sa DESC, doc_id LIMIT 20),
        |ra AS (SELECT doc_id, sa, row_number() OVER (ORDER BY sa DESC, doc_id) AS ra FROM ta),
        |tb AS (SELECT doc_id, sb FROM g ORDER BY sb DESC, doc_id LIMIT 20),
        |rb AS (SELECT doc_id, row_number() OVER (ORDER BY sb DESC, doc_id) AS rb FROM tb),
        |dc AS (SELECT max(cum) AS dcg FROM (
        |  SELECT sum(round(coalesce(ra.sa, 0.0) / log2(rb.rb + 1), 6))
        |    OVER (ORDER BY rb.rb ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM rb LEFT JOIN ra ON rb.doc_id = ra.doc_id)),
        |ic AS (SELECT max(cum) AS idcg FROM (
        |  SELECT sum(round(sa / log2(ra + 1), 6))
        |    OVER (ORDER BY ra ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM ra))
        |SELECT round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
        |  round(dcg / idcg, 6) AS ndcg
        |FROM dc, ic""".stripMargin,
    "q_vocab_topk" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest(w) AS tok FROM t) GROUP BY doc_id, tok)
        |SELECT tok, CAST(sum(c) AS BIGINT) AS tf, CAST(count(*) AS BIGINT) AS df
        |FROM tf GROUP BY tok
        |ORDER BY tf DESC, tok LIMIT 50""".stripMargin,
    "q_text_tfidf" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS w FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(w) AS tok FROM t) GROUP BY doc_id, tok),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |s AS (SELECT doc_id, tok AS keyword, tf, df, CAST(tf AS DOUBLE)/df AS score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY CAST(tf AS DOUBLE)/df DESC, tok) AS rk
        |  FROM tf JOIN df USING (tok))
        |SELECT doc_id, keyword, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |  score, CAST(rk AS INT) AS rk
        |FROM s WHERE rk <= 5 ORDER BY doc_id, rk""".stripMargin,
    "q_text_chunk" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
        |c AS (SELECT doc_id, w, unnest(range(0, len(w), 48)) AS st FROM t WHERE len(w) > 0)
        |SELECT doc_id, CAST(st/48 AS INT) AS chunk_idx,
        |  CAST(len(w[st+1:st+64]) AS INT) AS n_chunk_tokens,
        |  md5(array_to_string(w[st+1:st+64], ' ')) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "q_text_repetition" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS c FROM (SELECT doc_id, unnest(w) AS tok FROM t) GROUP BY doc_id, tok),
        |top AS (SELECT doc_id, max(c) AS top_freq FROM tf GROUP BY doc_id),
        |g AS (SELECT doc_id, len(w) AS n_tokens,
        |  len(list_distinct([array_to_string(w[i:i+1], ' ') FOR i IN range(1, len(w))])) AS n_d2 FROM t)
        |SELECT g.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(top_freq AS BIGINT) AS top_freq,
        |  CAST(top_freq AS DOUBLE)/n_tokens AS top_ratio,
        |  CASE WHEN n_tokens > 1 THEN CAST(n_tokens - 1 - n_d2 AS DOUBLE)/(n_tokens - 1)
        |       ELSE 0.0 END AS dup_2gram_frac
        |FROM g JOIN top ON g.doc_id = top.doc_id
        |ORDER BY g.doc_id""".stripMargin,
    "q_text_stats" ->
      s"""WITH t AS (SELECT doc_id, text, list_filter(string_split(text,' '), x -> x <> '') AS toks FROM documents)
         |SELECT doc_id, length(text) AS n_chars_actual, len(toks) AS n_tokens,
         |  len(list_distinct(toks)) AS n_distinct,
         |  length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS punct_chars,
         |  len(list_filter(toks, x -> list_contains(${sqlList(enStop)}, x))) AS stop_hits,
         |  CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, x -> list_contains(${sqlList(enStop)}, x))) AS DOUBLE)/len(toks) ELSE 0.0 END AS stop_ratio,
         |  CASE WHEN len(toks) > 0 THEN CAST(len(list_distinct(toks)) AS DOUBLE)/len(toks) ELSE 0.0 END AS distinct_ratio
         |FROM t ORDER BY doc_id""".stripMargin,
    "q_text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, list_filter(string_split(text,' '), x -> x <> '') AS toks FROM documents),
         |b AS (SELECT doc_id, length(text) AS n_chars, len(toks) AS n_tokens,
         |  len(list_distinct(toks)) AS n_distinct,
         |  length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS punct_chars,
         |  len(list_filter(toks, x -> list_contains(${sqlList(enStop)}, x))) AS stop_hits
         |FROM t),
         |r AS (SELECT *,
         |  CASE WHEN n_chars > 0 THEN punct_chars / n_chars ELSE 1.0 END AS punct_ratio,
         |  CASE WHEN n_tokens > 0 THEN stop_hits / n_tokens ELSE 0.0 END AS stop_ratio,
         |  CASE WHEN n_tokens > 0 THEN n_distinct / n_tokens ELSE 0.0 END AS distinct_ratio
         |FROM b)
         |SELECT *,
         |  0.25 * least(1.0, n_tokens / 50.0) + 0.25 * (1.0 - punct_ratio)
         |    + 0.25 * least(1.0, stop_ratio * 4.0) + 0.25 * distinct_ratio AS quality_score,
         |  (0.25 * least(1.0, n_tokens / 50.0) + 0.25 * (1.0 - punct_ratio)
         |    + 0.25 * least(1.0, stop_ratio * 4.0) + 0.25 * distinct_ratio) >= 0.6 AS is_quality
         |FROM r ORDER BY doc_id""".stripMargin,
    "q_text_langid" ->
      s"""WITH t AS (SELECT doc_id, lang, list_filter(string_split(text,' '), x -> x <> '') AS toks FROM documents),
         |v AS (SELECT doc_id, lang AS declared_lang,
         |  len(list_filter(toks, x -> list_contains(${sqlList(enStop)}, x))) AS en_hits,
         |  len(list_filter(toks, x -> list_contains(${sqlList(esStop)}, x))) AS es_hits,
         |  len(list_filter(toks, x -> list_contains(${sqlList(deStop)}, x))) AS de_hits,
         |  len(list_filter(toks, x -> list_contains(${sqlList(frStop)}, x))) AS fr_hits
         |FROM t)
         |SELECT *, CASE
         |  WHEN en_hits >= 2 AND en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
         |  WHEN es_hits >= 2 AND es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
         |  WHEN de_hits >= 2 AND de_hits >= fr_hits THEN 'de'
         |  WHEN fr_hits >= 2 THEN 'fr'
         |  ELSE 'und' END AS predicted_lang
         |FROM v ORDER BY doc_id""".stripMargin,
    "q_text_tokens" ->
      """SELECT doc_id,
        |  len(regexp_extract_all(text, '[a-z]+')) AS n_words,
        |  len(regexp_extract_all(text, '[0-9]+')) AS n_numbers,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_text_fingerprint" ->
      """SELECT doc_id,
        |  md5(array_to_string(list_filter(string_split(text,' '), x -> x <> ''), ' ')) AS fingerprint,
        |  substring(md5(array_to_string(list_filter(string_split(text,' '), x -> x <> ''), ' ')), 1, 8) AS short_fp
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}

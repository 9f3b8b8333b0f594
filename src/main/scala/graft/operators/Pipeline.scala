package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Training-data pipeline operators (north-star extension): deterministic
  * sampling and dataset splitting, per-stratum quota sampling, URL
  * normalization, and PII-style redaction — the selection/cleaning stages
  * that sit between raw scraped text and a training corpus.
  *
  * Determinism is the design center: every sampling decision is a pure
  * function of the row's key (an md5 range test, the distributed analog of
  * the reference's stable scan identifiers, `fs.rs:61-66`), never of
  * partitioning, row order, or an RNG. Re-running the pipeline on a
  * re-partitioned 100 TB corpus yields byte-identical samples, and any
  * engine (the DuckDB oracles here) reproduces them.
  *
  * Scale shape:
  *  - hash sample / split / redaction / URL normalization are pure
  *    map-side row transforms — zero shuffle, full predicate/projection
  *    pushdown, codegen'd built-ins only;
  *  - the stratified counts and URL rollup shuffle only post-aggregation
  *    partials on tiny keyspaces (map-side combine does the heavy lift);
  *  - quota sampling shuffles once on the stratum key for the window
  *    rank. For very hot strata the map-side bounded-heap alternative
  *    ([[graft.functions.TopK.TopKAgg]]-style, k rows per partition per
  *    stratum crossing the wire) drops the per-stratum sort; at the
  *    default quota sizes the plain window is the simpler plan.
  */
object Pipeline {

  /** Deterministic ~12.5% Bernoulli sample: keep rows whose salted md5
    * starts with hex 0 or 1 (2/16 of the keyspace). Stateless map-side
    * filter — the sample of a 100 TB corpus never shuffles. */
  def qSampleHash(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .filter(md5(concat(lit("smp"), col("doc_id").cast("string"))) < "2")
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")

  /** Stratified 80/10/10 train/val/test split: the salted md5's first two
    * hex chars partition the keyspace at 'cc' (204/256 ≈ 79.7%) and 'e6'
    * (230/256 ≈ 89.8%). Per (lang, split) counts — the split assignment
    * itself is a map-side column any downstream stage can reuse. */
  def qSplitStratified(s: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(lit("spl"), col("doc_id").cast("string")))
    documents(s, dir)
      .withColumn("split",
        when(h < "cc", lit("train")).when(h < "e6", lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "split")
  }

  /** Per-stratum quota sample: at most 10 documents per (lang, source),
    * chosen by salted-md5 order (deterministic, unbiased within the
    * stratum). One shuffle on the stratum key. */
  def qSampleQuota(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(md5(concat(lit("quo"), col("doc_id").cast("string"))), col("doc_id"))
    documents(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")
  }

  /** Synthetic document URL (the fixture has no URL column; both engines
    * derive the same one): https://<source>.example.com/<lang>/doc/<id>
    * plus tracking params that normalization must strip. */
  private def urlCol = concat(
    lit("https://"), col("source"), lit(".example.com/"), col("lang"),
    lit("/doc/"), col("doc_id").cast("string"),
    lit("?utm_source=feed&ref="), col("lang"))

  /** URL normalization + domain rollup: parse host and query-stripped
    * path from the raw URL (`parse_url`, codegen'd), count docs and
    * distinct paths per host. The normalize step is map-side; the rollup
    * shuffles only per-host partials. */
  def qUrlNormalize(s: SparkSession, dir: String): DataFrame =
    documents(s, dir)
      .withColumn("url", urlCol)
      .select(
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("path")).as("n_paths"))
      .orderBy("host")

  private val emailRe = "[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+"
  private val numRe = "[0-9]{5,}"

  /** PII-style redaction: synthetic contact lines (email + long digit
    * run) are appended to each document, then both are replaced with
    * typed placeholders. Zero shuffle; the md5 digest of the redacted
    * text lets the oracle verify the full output string, not a prefix.
    * Patterns stay within the common RE2/Java-regex subset so any engine
    * applies the same rule. */
  def qTextRedact(s: SparkSession, dir: String): DataFrame = {
    val pii = concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail.example.com or call 555"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    documents(s, dir)
      .withColumn("pii_text", pii)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("pii_text"), lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("pii_text"), lit(numRe), lit(0))).as("n_nums"),
        md5(regexp_replace(
          regexp_replace(col("pii_text"), emailRe, "<EMAIL>"),
          numRe, "<NUM>")).as("redacted_md5"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_hash" -> qSampleHash,
    "q_split_stratified" -> qSplitStratified,
    "q_sample_quota" -> qSampleQuota,
    "q_url_normalize" -> qUrlNormalize,
    "q_text_redact" -> qTextRedact,
  )

  val oracles: Map[String, String] = Map(
    "q_sample_hash" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE md5('smp' || CAST(doc_id AS VARCHAR)) < '2'
        |ORDER BY doc_id""".stripMargin,
    "q_split_stratified" ->
      """SELECT lang,
        |  CASE WHEN md5('spl' || CAST(doc_id AS VARCHAR)) < 'cc' THEN 'train'
        |       WHEN md5('spl' || CAST(doc_id AS VARCHAR)) < 'e6' THEN 'val'
        |       ELSE 'test' END AS split,
        |  count(*) AS n_docs
        |FROM documents GROUP BY lang, split ORDER BY lang, split""".stripMargin,
    "q_sample_quota" ->
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY lang, source
        |      ORDER BY md5('quo' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 10 ORDER BY doc_id""".stripMargin,
    "q_url_normalize" ->
      """WITH u AS (SELECT doc_id, lang,
        |    'https://' || source || '.example.com/' || lang || '/doc/' ||
        |    CAST(doc_id AS VARCHAR) || '?utm_source=feed&ref=' || lang AS url
        |  FROM documents)
        |SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
        |  count(*) AS n_docs,
        |  CAST(count(DISTINCT regexp_extract(url, 'https://[^/]+(/[^?]*)', 1)) AS BIGINT) AS n_paths
        |FROM u GROUP BY host ORDER BY host""".stripMargin,
    "q_text_redact" ->
      """WITH p AS (SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@mail.example.com or call 555' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS pii_text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(pii_text, '[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(pii_text, '[0-9]{5,}')) AS INT) AS n_nums,
        |  md5(regexp_replace(regexp_replace(pii_text,
        |    '[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
        |    '[0-9]{5,}', '<NUM>', 'g')) AS redacted_md5
        |FROM p ORDER BY doc_id""".stripMargin,
  )
}

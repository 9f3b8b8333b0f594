package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.Mime

/** Projection/enrichment family P1-P8 (SURVEY §2.3) as one oracle-checked
  * query over synthetic paths derived from `documents`:
  *
  *  - P1/P2 path split: parent dir + basename, null-safe for root-level
  *    keys (the case the reference panics on, `s3.rs:107-108`).
  *  - P3 MIME inference from extension ([[graft.functions.Mime]]).
  *  - P5 size narrowing with overflow→NULL (`db.rs:85` u64→i64 semantics,
  *    expressed as decimal→bigint `try_cast`).
  *  - P6 identifier stamping (driver-side literal).
  *  - P8 scan-instant column: ONE instant per scan (transaction-time
  *    semantics of Postgres `NOW()`, `db.rs:54`), never per-row
  *    `current_timestamp()`.
  *
  * All pure per-row expressions — codegen'd, no shuffle, scale-free.
  */
object Enrich {

  def qFilesEnrich(s: SparkSession, dir: String): DataFrame = {
    val ext = element_at(typedlit(Seq(".txt", ".json", ".csv", ".gz", "")),
      (col("doc_id") % 5 + 1).cast("int"))
    val fullPath = concat(lit("/corpus/"), col("source"), lit("/part"),
      col("doc_id") % 7, lit("/doc_"), col("doc_id"), ext)
    val sizeRaw = when(col("doc_id") % 50 === 0,
      lit("9999999999999999999").cast("decimal(19,0)"))
      .otherwise(col("n_chars").cast("decimal(19,0)"))
    documents(s, dir)
      .select(col("doc_id"), fullPath.as("full_path"), sizeRaw.as("size_raw"))
      .select(
        col("doc_id"),
        col("full_path"),
        regexp_replace(col("full_path"), "/[^/]*$", "").as("path"),
        substring_index(col("full_path"), "/", -1).as("filename"),
        Mime.mimeOf(substring_index(col("full_path"), "/", -1)).as("mime_type"),
        expr("try_cast(size_raw AS BIGINT)").as("size"),
        lit("host01:/corpus").as("external_source"),
        lit("2026-01-15 00:00:00").cast("timestamp").as("observed_at"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_files_enrich" -> qFilesEnrich,
  )

  val oracles: Map[String, String] = Map(
    "q_files_enrich" ->
      """WITH p AS (SELECT doc_id,
        |    concat('/corpus/', source, '/part', CAST(doc_id % 7 AS VARCHAR), '/doc_', CAST(doc_id AS VARCHAR),
        |      CASE doc_id % 5 WHEN 0 THEN '.txt' WHEN 1 THEN '.json' WHEN 2 THEN '.csv' WHEN 3 THEN '.gz' ELSE '' END) AS full_path,
        |    CASE WHEN doc_id % 50 = 0 THEN CAST('9999999999999999999' AS DECIMAL(19,0))
        |         ELSE CAST(n_chars AS DECIMAL(19,0)) END AS size_raw
        |  FROM documents)
        |SELECT doc_id, full_path,
        |  regexp_replace(full_path, '/[^/]*$', '') AS path,
        |  regexp_extract(full_path, '([^/]*)$', 1) AS filename,
        |  CASE WHEN full_path LIKE '%.txt' THEN 'text/plain'
        |       WHEN full_path LIKE '%.json' THEN 'application/json'
        |       WHEN full_path LIKE '%.csv' THEN 'text/csv'
        |       WHEN full_path LIKE '%.gz' THEN 'application/gzip'
        |       ELSE NULL END AS mime_type,
        |  TRY_CAST(size_raw AS BIGINT) AS size,
        |  'host01:/corpus' AS external_source,
        |  TIMESTAMP '2026-01-15 00:00:00' AS observed_at
        |FROM p ORDER BY doc_id""".stripMargin,
  )
}

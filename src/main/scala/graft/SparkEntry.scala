package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.md.
  *
  * Aggregates the per-family query registries. Every oracle-checked
  * operator has BOTH a `queries` entry (the Spark-native implementation)
  * and an `oracleSql` entry (equivalent DuckDB SQL over the same parquet
  * tables); non-SQL-expressible operators (MinHash-LSH, SimHash, …) have
  * only a `queries` entry → weaker rows-only driver check, with their
  * semantics covered by ScalaTest instead.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.TpchFull.queries ++
      operators.Scrape.queries ++
      operators.Enrich.queries ++ operators.Dedup.queries ++
      operators.Incremental.queries ++
      operators.Multimodal.queries ++ operators.Pipeline.queries ++
      operators.Selection.queries ++ operators.Graph.queries ++
      operators.Cohort.queries ++ operators.Skew.queries ++
      operators.Stats.queries ++ operators.Quant.queries ++
      functions.TextAnalysis.queries ++
      functions.Similarity.queries ++ streaming.EventWindows.queries ++
      streaming.StreamDedup.queries ++ streaming.StreamJoin.queries ++
      operators.Capstone.queries ++ operators.Privacy.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.TpchFull.oracles ++
      operators.Scrape.oracles ++
      operators.Enrich.oracles ++ operators.Dedup.oracles ++
      operators.Incremental.oracles ++
      operators.Multimodal.oracles ++ operators.Pipeline.oracles ++
      operators.Selection.oracles ++ operators.Graph.oracles ++
      operators.Cohort.oracles ++ operators.Skew.oracles ++
      operators.Stats.oracles ++ operators.Quant.oracles ++
      functions.TextAnalysis.oracles ++
      functions.Similarity.oracles ++ streaming.EventWindows.oracles ++
      streaming.StreamDedup.oracles ++ streaming.StreamJoin.oracles ++
      operators.Capstone.oracles ++ operators.Privacy.oracles
}

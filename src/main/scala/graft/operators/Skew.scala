package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (e.g. one external_source or one shingle dominating): salting.
  *
  * The skewed (large) side gets a deterministic salt derived from its
  * whole row hash — `pmod(hash(all join-side cols), factor)` — so a hot
  * key's rows spread over `factor` partitions; the build side is exploded
  * across every salt value. Row-hash salting (not `rand()`) keeps the
  * operator deterministic and retry-safe: a recomputed task produces the
  * same salt assignment, so no shuffle-replay inconsistency.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) covers sort-merge joins at runtime; explicit salting is for
  * the cases AQE can't split — aggregations over a hot key and broadcast
  * build sides — and for deterministic plans under `local[n]` testing.
  */
object Skew {

  /** Inner equi-join `left ⋈ right` on `keys`, with `left` salted into
    * `factor` sub-keys and `right` replicated `factor`× . Result equals
    * the unsalted join (spec-checked). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    val saltCol = pmod(hash(left.columns.toIndexedSeq.map(col): _*), lit(factor))
    val l = left.withColumn("__salt", saltCol)
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    l.join(r, keys :+ "__salt").drop("__salt")
  }

  /** Salted aggregation: two-phase group-by for hot grouping keys —
    * partial aggregate on (keys, salt), then final aggregate on keys.
    * `aggs` maps output column name → (partial, final) expression pair,
    * e.g. count: (count(lit(1)), sum) — both phases shuffle, but the
    * first spreads a hot key over `factor` reducers. */
  def saltedCount(df: DataFrame, keys: Seq[String], factor: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(factor)))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).cast("bigint").as("n"))
  }

  /** The salted join as a registered, oracle-checked operator: supplier
    * revenue over lineitem, whose supplier key is genuinely hot (~600
    * lineitems per supplier at sf0.001 — each key IS a heavy hitter).
    * The salt spreads every supplier's rows over 8 reducers before the
    * replicated build side joins them; the oracle is the plain unsalted
    * join, so the hash-match IS the salting-invariance proof. */
  def qJoinSkewSalted(s: SparkSession, dir: String): DataFrame = {
    val li = lineitem(s, dir)
      .select(col("l_suppkey"), cents(col("l_extendedprice")).as("v"))
    val sup = supplier(s, dir)
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    saltedJoin(li, sup, Seq("l_suppkey"), 8)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"),
        (sum(col("v")).cast("double") / 100).as("revenue"))
      .orderBy("s_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_skew_salted" -> qJoinSkewSalted,
  )

  val oracles: Map[String, String] = Map(
    "q_join_skew_salted" ->
      """SELECT s_name, count(*) AS n_items,
        |  CAST(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100 AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,
  )
}

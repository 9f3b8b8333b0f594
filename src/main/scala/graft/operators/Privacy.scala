package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Privacy audits for a corpus about to be released or trained on — the
  * re-identification side of the pipeline's compliance story, next to
  * content redaction (`q_text_redact`). Two families:
  *
  *  - re-identification risk: k-anonymity (how many quasi-identifier
  *    combinations isolate fewer than k individuals) and l-diversity
  *    (how many combinations expose a near-unique sensitive value),
  *    computed in one two-level aggregation;
  *  - differentially-private release: counts with deterministic,
  *    seed-reproducible Laplace noise, the mechanism a data card quotes
  *    an (ε, 0) guarantee from.
  *
  * Scale shape: both are pure aggregation trees — map-side partials
  * collapse each partition to its distinct QI combinations before any
  * shuffle, the combination space (nation × balance-bucket here) is
  * orders of magnitude below row count at any scale, and the noise is
  * a map-side expression over the already-aggregated frame (zero extra
  * passes, no per-row state). Nothing here reads a row twice.
  */
object Privacy {

  /** k-anonymity + l-diversity audit over the customer table.
    * Quasi-identifier = (nation, account-balance bucket of 1000);
    * sensitive attribute = market segment. Per nation: group count,
    * smallest group (the k actually achieved), groups/rows below k=5,
    * minimum l, and groups below l=3. All-integer arithmetic — the
    * oracle compare is exact by construction. */
  def qPrivacyAudit(s: SparkSession, dir: String): DataFrame = {
    val g = customer(s, dir)
      .groupBy(col("c_nationkey"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("c_mktsegment")).as("l"))
    g.groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_groups"),
        min(col("n")).as("min_k"),
        sum(when(col("n") < 5, 1L).otherwise(0L)).as("n_risky_groups"),
        sum(when(col("n") < 5, col("n")).otherwise(0L)).as("n_risky_rows"),
        min(col("l")).as("min_l"),
        sum(when(col("l") < 3, 1L).otherwise(0L)).as("n_low_l_groups"))
      .orderBy("c_nationkey")
  }

  /** Order counts per (priority, year) released with deterministic
    * Laplace noise, scale b = 10 (sensitivity 1 / ε = 0.1). The uniform
    * is the established md5-derived 52-bit rational (exact in a double:
    * 13 hex digits / 16^13, and 16^13 = 2^52 so the division and the
    * `u - 0.5` / `1 - 2|u - 0.5|` chain are all EXACT float ops — the
    * `ln` input is bit-identical across engines and round(6) absorbs
    * the ln ulp, the established ln-query convention). Inverse CDF:
    * noise = −b · sign(u−0.5) · ln(1 − 2|u−0.5|), floored at 1e-12 to
    * keep a (probability 2⁻⁵²) endpoint finite. `n_exact` rides along
    * for the oracle compare; a real release ships only `n_noisy`. */
  def qPrivacyDp(s: SparkSession, dir: String): DataFrame = {
    val g = orders(s, dir)
      .groupBy(col("o_orderpriority"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n"))
    val u = conv(substring(md5(concat(lit("dp"), col("o_orderpriority"),
        lit(":"), col("yr").cast("string"))), 1, 13), 16, 10)
      .cast("long").cast("double") / lit(math.pow(16.0, 13))
    g.select(col("o_orderpriority"), col("yr"), col("n").as("n_exact"),
        round(col("n") + lit(-10.0) * signum(u - 0.5) *
          log(greatest(lit(1.0) - lit(2.0) * abs(u - 0.5), lit(1e-12))), 6)
          .as("n_noisy"))
      .orderBy("o_orderpriority", "yr")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_privacy_audit" -> qPrivacyAudit,
    "q_privacy_dp" -> qPrivacyDp,
  )

  val oracles: Map[String, String] = Map(
    "q_privacy_audit" ->
      """WITH g AS (
        |  SELECT c_nationkey,
        |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
        |    count(*) AS n, count(DISTINCT c_mktsegment) AS l
        |  FROM customer GROUP BY 1, 2)
        |SELECT c_nationkey,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(min(n) AS BIGINT) AS min_k,
        |  CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_groups,
        |  CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_risky_rows,
        |  CAST(min(l) AS BIGINT) AS min_l,
        |  CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_low_l_groups
        |FROM g GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "q_privacy_dp" ->
      """WITH g AS (
        |  SELECT o_orderpriority, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |    count(*) AS n
        |  FROM orders GROUP BY 1, 2),
        |u AS (
        |  SELECT *, CAST(CAST('0x' || substring(md5('dp' || o_orderpriority
        |      || ':' || CAST(yr AS VARCHAR)), 1, 13) AS BIGINT) AS DOUBLE)
        |    / power(16.0, 13) AS u
        |  FROM g)
        |SELECT o_orderpriority, yr, CAST(n AS BIGINT) AS n_exact,
        |  round(n + (-10.0) * sign(u - 0.5)
        |    * ln(greatest(1 - 2 * abs(u - 0.5), 1e-12)), 6) AS n_noisy
        |FROM u ORDER BY o_orderpriority, yr""".stripMargin,
  )
}

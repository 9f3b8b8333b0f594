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

  /** Key-distribution skew audit over `events.user_id` — the measurement
    * that DRIVES the salting decision above: row count, key count,
    * hottest-key share, and the normalized entropy of the key
    * distribution (balance 1.0 = perfectly uniform keys, →0 = one key
    * owns the table; shares/entropy tell you whether [[saltedJoin]] or a
    * plain join is the right plan BEFORE running it).
    *
    * The integer stats are exact in any merge order. The float
    * Σ c·log2 c runs over a CORPUS-SIZED key set, so a flat ordered
    * window would funnel every key through one task; instead BOTH
    * engines run the same MIRRORED two-level ordered reduction —
    * in-segment prefix sums on `user_id div segSize` (segment count
    * ≤4097 via [[Pipeline.packSegSize]]), then an ordered prefix over
    * the ≤4097 segment leaves. The addition sequence is identical in
    * Spark and DuckDB, which is all float determinism needs; round(6)
    * absorbs the log2 ulp. */
  def qSkewAudit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val maxId = events(s, dir).agg(max(col("user_id"))).first() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val segSize = Pipeline.packSegSize(maxId)
    val counts = events(s, dir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("c"))
      .withColumn("seg", expr(s"user_id div $segSize"))
    val cd = col("c").cast("double")
    val inSeg = Window.partitionBy("seg").orderBy("user_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val segLeaf = counts
      .withColumn("cum", sum(cd * log2(cd)).over(inSeg))
      .groupBy("seg")
      .agg(sum(col("c")).as("n_seg"), count(lit(1)).as("k_seg"),
        max(col("c")).as("max_seg"),
        max_by(col("cum"), col("user_id")).as("s_seg"))
    val segW = Window.orderBy("seg")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = segLeaf
      .withColumn("s_cum", sum(col("s_seg")).over(segW))
      .groupBy()
      .agg(sum(col("n_seg")).as("n_rows"), sum(col("k_seg")).as("n_keys"),
        max(col("max_seg")).as("max_c"),
        max_by(col("s_cum"), col("seg")).as("s_tot"))
    val n = col("n_rows").cast("double")
    val h = log2(n) - col("s_tot") / n
    tot.select(col("n_rows"), col("n_keys"), col("max_c"),
      (col("max_c").cast("double") / n).as("top_share"),
      round(h, 6).as("entropy_bits"),
      round(h / log2(col("n_keys").cast("double")), 6).as("balance"))
  }

  /** Bloom semi-join reduction: probe the FACT side with a Bloom filter of
    * the (filtered) dimension keyset BEFORE the join — the classic 100 TB
    * join trick for the regime where the dim subset is too big to
    * broadcast as a hash table but its keyset fits an 8 MiB filter: rows
    * that cannot match never enter the join's exchange, turning a
    * fact-table-sized shuffle into a match-sized one. (Spark's own
    * InjectRuntimeFilter does this for SMJ under AQE; the explicit form
    * works on any plan and under deterministic local testing.)
    *
    * Build side: Catalyst's BloomFilterAggregate (executor-merged
    * partials, one finished filter to the driver — see
    * [[Incremental.novelAgainst]]'s measured note); probe side: the
    * by-reference codegen [[graft.plans.BloomMightContainExpr]]. False
    * positives are eliminated by the real join that follows, so the
    * result is EXACTLY the plain join's — the DuckDB oracle runs the
    * join with no filter at all, and the hash-match IS the invariance
    * proof (same pattern as q_join_skew_salted). */
  def qJoinBloomReduce(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftshim.ColumnShim
    val dim = orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    // ~1/5 of orders; footer count of the whole table over-sizes the
    // filter slightly, which only lowers the false-positive rate
    val n = math.max(64L,
      Incremental.footerRowCount(s, s"$dir/orders.parquet") / 4)
    val numBits = math.min(1L << 26, math.max(64L,
      math.ceil(-n * math.log(0.01) / (math.log(2) * math.log(2))).toLong))
    val agg = new org.apache.spark.sql.catalyst.expressions.aggregate
      .BloomFilterAggregate(
        ColumnShim.expression(xxhash64(col("o_orderkey"))),
        Literal(n), Literal(numBits))
      .toAggregateExpression()
    val bytes = dim.select(ColumnShim.column(agg).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val fact = lineitem(s, dir)
      .select(col("l_orderkey"), col("l_extendedprice"))
    val probed =
      if (bytes == null) fact.filter(lit(false)) // empty dim: empty join
      else fact.filter(graft.plans.GraftExpressions
        .bloom_might_contain(xxhash64(col("l_orderkey")), bytes))
    probed.join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_items"),
        (sum(cents(col("l_extendedprice"))).cast("double") / 100)
          .as("revenue"))
      .orderBy("month")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_skew_salted" -> qJoinSkewSalted,
    "q_join_bloom" -> qJoinBloomReduce,
    "q_skew_audit" -> qSkewAudit,
  )

  val oracles: Map[String, String] = Map(
    "q_join_skew_salted" ->
      """SELECT s_name, count(*) AS n_items,
        |  CAST(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100 AS revenue
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name ORDER BY s_name""".stripMargin,
    // no bloom on the oracle side AT ALL: the filter only removes rows the
    // join would drop anyway, so plain-join equality proves the reduction
    // is lossless
    "q_join_bloom" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |  count(*) AS n_items,
        |  CAST(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS DOUBLE)/100 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_skew_audit" ->
      """WITH m AS (SELECT greatest(256, max(user_id) // 4096 + 1) AS seg_size FROM events),
        |c AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
        |x AS (SELECT user_id, c, user_id // seg_size AS seg FROM c, m),
        |y AS (SELECT seg, user_id, c,
        |  sum(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
        |    OVER (PARTITION BY seg ORDER BY user_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM x),
        |sl AS (SELECT seg, CAST(sum(c) AS BIGINT) AS n_seg, count(*) AS k_seg,
        |  CAST(max(c) AS BIGINT) AS max_seg, max_by(cum, user_id) AS s_seg
        |  FROM y GROUP BY seg),
        |t AS (SELECT seg, n_seg, k_seg, max_seg,
        |  sum(s_seg) OVER (ORDER BY seg ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_cum
        |  FROM sl),
        |g AS (SELECT CAST(sum(n_seg) AS BIGINT) AS n_rows,
        |  CAST(sum(k_seg) AS BIGINT) AS n_keys,
        |  CAST(max(max_seg) AS BIGINT) AS max_c, max_by(s_cum, seg) AS s_tot FROM t)
        |SELECT n_rows, n_keys, max_c,
        |  CAST(max_c AS DOUBLE) / CAST(n_rows AS DOUBLE) AS top_share,
        |  round(log2(CAST(n_rows AS DOUBLE)) - s_tot / CAST(n_rows AS DOUBLE), 6) AS entropy_bits,
        |  round((log2(CAST(n_rows AS DOUBLE)) - s_tot / CAST(n_rows AS DOUBLE))
        |    / log2(CAST(n_keys AS DOUBLE)), 6) AS balance
        |FROM g""".stripMargin,
  )
}

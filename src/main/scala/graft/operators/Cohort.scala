package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Behavioral / product-analytics operators over the event stream
  * (north-star extension): cohort retention and ordered funnels — the
  * user-journey rollups an events warehouse answers daily.
  *
  * Scale shape: both are user-keyed. The per-user reductions
  * (first-touch, stage timestamps) are partial-aggregated groupBys on
  * user_id, and every join is user_id-vs-user_id — co-partitioned on the
  * same key domain, so a 100 TB event table resolves with one exchange
  * per stage and no broadcast of anything user-sized. Nothing orders
  * globally; final outputs are tiny (days × offsets, or one row per
  * funnel stage). */
object Cohort {

  /** Cohort retention: users grouped by first-seen day, counted on each
    * later active day as a day offset — the classic retention triangle.
    * Dates travel as UTC-midnight timestamps (driver-compare constraint). */
  def qCohortRetention(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"), to_date(col("ts")).as("day"))
    val firsts = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    e.join(firsts, "user_id")
      .select(col("user_id"), col("cohort"), col("day"))
      .distinct()
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .select(col("cohort").cast("timestamp").as("cohort"),
        col("day_offset"), col("n_users"))
      .orderBy("cohort", "day_offset")
  }

  /** Ordered conversion funnel: view → first click AFTER the first view →
    * first purchase AFTER that click, per user; one output row per stage
    * with how many users reached it. Stage timestamps reduce per user
    * before any join, so each funnel edge is a tiny-keyed equi-join. */
  def qFunnelSteps(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    def firstAfter(evType: String, prev: DataFrame, prevCol: String,
        outCol: String): DataFrame =
      e.filter(col("event_type") === evType)
        .join(prev, "user_id")
        .filter(col("ts") >= col(prevCol))
        .groupBy(col("user_id")).agg(min(col("ts")).as(outCol))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
    val c = firstAfter("click", v, "v_ts", "c_ts")
    val p = firstAfter("purchase", c, "c_ts", "p_ts")
    def stage(name: String, idx: Int, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(idx).as("stage"), lit(name).as("event_type"),
          col("n_users"))
    stage("view", 1, v).union(stage("click_after_view", 2, c))
      .union(stage("purchase_after_click", 3, p))
      .orderBy("stage")
  }

  /** Batch sessionization (gaps-and-islands): a session breaks after 30
    * minutes of per-user quiet. lag → new-session flag → running sum =
    * session index, then one per-session rollup. This is the batch twin of
    * the streaming `session_window` query (q_stream_session), for replays
    * and backfills over historical data.
    *
    * Scale shape: both windows and the final groupBy share ONE hash
    * partitioning on user_id — a single exchange end to end, each user's
    * timeline sorted locally within its partition. No global sort, no
    * driver state. Durations are exact integer microsecond diffs
    * (`unix_micros`), never float timestamp arithmetic. */
  def qSessionBatch(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000 // 30 min session timeout
    // event_id tie-breaks equal timestamps so the lag is deterministic
    val timeline = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(timeline))
      .withColumn("is_new",
        (col("prev_us").isNull || col("us") - col("prev_us") > gapUs)
          .cast("int"))
      .withColumn("session_idx",
        sum(col("is_new")).over(timeline).cast("int"))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        (max(col("us")) - min(col("us"))).as("duration_us"))
      .orderBy("user_id", "session_idx")
  }

  /** Event debounce: drop any event that fires within 5 s of the previous
    * event of the same (user, type) — double-click / retry noise removal,
    * the standard telemetry-hygiene pass before counting anything. One
    * lag window on the (user_id, event_type) key; exact integer-µs
    * arithmetic. Reports survivors with their gap to the previous raw
    * event (NULL for each key's first).
    *
    * Fixture: the organic log's gaps are all >5 s, so every 7th event is
    * re-injected as a +1 s "retry" duplicate — deterministic in both
    * engines, guaranteed drops for the gate to prove the filter actually
    * fires. Retry ids offset by max(event_id)+1 (a one-row aggregate,
    * scalar subquery in the oracle) so injected ids can NEVER collide
    * with organic ones at any scale — a fixed constant would collide once
    * organic ids reach it, and the resulting duplicate-key orderBy ties
    * would break the exact compare. */
  def qEventsDebounce(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val idOffset = e.agg(max(col("event_id"))).first() match {
      case r if r.isNullAt(0) => 1L
      case r => r.getLong(0) + 1L
    }
    val retries = e.filter(col("event_id") % 7 === 0)
      .select((col("event_id") + idOffset).as("event_id"), col("user_id"),
        col("event_type"), (col("ts") + expr("INTERVAL 1 SECOND")).as("ts"),
        col("value"), col("props"))
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy("ts", "event_id")
    e.unionByName(retries)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap_us").isNull || col("gap_us") > lit(5000000L))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        col("gap_us"))
      .orderBy("event_id")
  }

  /** Last-touch attribution: each `purchase` is credited to the nearest
    * PRECEDING non-purchase event of the same user (the touchpoint that
    * "caused" it), rolled up to credited-channel totals — the standard
    * marketing-attribution fold. One user-keyed window (`last(...,
    * ignoreNulls)` over the unbounded-preceding-to-−1 frame carries the
    * latest touch type forward), co-partitioned with every other
    * user-keyed pass; purchases with no prior touch credit `(none)`.
    * Money sums as exact integer cents; ties on ts break by event_id so
    * both engines pick the same touch. */
  def qAttribution(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        floor(col("value") * 100).cast("bigint").as("cents"))
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("(none)")).as("credited"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("cents")).as("sum_cents"))
      .orderBy("credited")
  }

  /** First-order event-transition matrix: counts and row-normalized
    * shares of (previous type → type) steps along each user's timeline —
    * the Markov-chain view of user behavior (and the input to
    * next-action models). One lag window per user (co-partitioned with
    * every other user-keyed pass); the share normalization windows over
    * the ≤(types+1)·types aggregate. First events transition from
    * `(start)`. Counts exact; share is one exact-integer division. */
  def qEventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .groupBy(coalesce(col("prev"), lit("(start)")).as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        col("n").cast("double") /
          sum(col("n")).over(Window.partitionBy("from_type")).cast("double"))
      .orderBy("from_type", "to_type")
  }

  /** Daily new users and the cumulative distinct-user count — the growth
    * curve. A naive `count(distinct user_id)` per day re-scans every
    * prior day; instead each user reduces to a first-touch date (one
    * user-keyed shuffle, partial-aggregated), days roll up, and the
    * running total is a prefix sum over the DATE-DOMAIN-BOUNDED daily
    * frame (≤ a few thousand rows at any corpus size — the same bounded-
    * global-window argument as the autocorrelation query; integer sum,
    * order-immune). */
  def qUsersCumulative(s: SparkSession, dir: String): DataFrame = {
    val firsts = events(s, dir)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("day"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    firsts.groupBy(col("day"))
      .agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(w))
      .select(col("day").cast("timestamp").as("day"),
        col("new_users"), col("cum_users"))
      .orderBy("day")
  }

  /** Time-weighted average of `value` per user: each event's value holds
    * until the user's NEXT event (hold-forward semantics — the TWAP /
    * time-in-state primitive a metrics store needs when samples arrive
    * irregularly); the last event has no holding interval and drops out.
    * One partitioned window (lead over user_id, ties broken by event_id
    * so both engines pair identical intervals) and one user-grain
    * aggregate — both on the same user_id hash, one exchange total.
    * Exactness: value in integer cents × interval in integer µs; the
    * products reach ~10¹⁷ per term, so the weighted sum accumulates in
    * decimal(38,0) / HUGEINT and drops to double only through the exact
    * VARCHAR parse; the final division's operands are then bit-identical
    * across engines, so no rounding is needed. */
  def qTwapUser(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"), col("event_id"),
      unix_micros(col("ts")).as("t_us"),
      round(col("value") * 100).cast("bigint").as("val_cents"))
    val nextT = lead(col("t_us"), 1).over(
      Window.partitionBy(col("user_id")).orderBy(col("t_us"), col("event_id")))
    val holds = e.withColumn("d_us", nextT - col("t_us"))
      .filter(col("d_us").isNotNull)
    holds.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_holds"),
        sum(col("d_us")).as("tot_us"),
        sum(col("val_cents").cast("decimal(38,0)") *
          col("d_us").cast("decimal(38,0)")).as("wsum"))
      .filter(col("tot_us") > 0)
      .select(col("user_id"), col("n_holds"), col("tot_us"),
        (col("wsum").cast("double") / col("tot_us").cast("double") / lit(100.0))
          .as("twap_value"))
      .orderBy("user_id")
  }

  /** RFM segmentation: every customer scored 1–5 on Recency (days since
    * last order), Frequency (order count), and Monetary (lifetime spend),
    * binned by the 20/40/60/80th percentiles of each metric; output one
    * row per populated (r,f,m) cell. Value-threshold quintiles, NOT
    * ntile: ntile needs a global rank (a single-partition window over
    * every customer — the scale shape this engine fences), while the
    * four thresholds come from ONE distributed percentile aggregate that
    * broadcasts a single row; binning is then a map-side compare. Equal
    * values land in the same bin on both engines by construction (no
    * rank tie to break). Percentile interpolation over integer inputs is
    * formula-identical to DuckDB's quantile_cont (the q_percentiles
    * precedent); the compares consume those identical doubles. */
  def qRfmSegments(s: SparkSession, dir: String): DataFrame = {
    val per = orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(cents(col("o_totalprice"))).as("mon_cents"))
    val globalMax = orders(s, dir)
      .agg(max(to_date(col("o_orderdate"))).as("max_day"))
    val rfm = per.crossJoin(broadcast(globalMax))
      .select(col("o_custkey"),
        datediff(col("max_day"), col("last_day")).cast("bigint").as("rec_days"),
        col("freq"), col("mon_cents"))
    val thr = rfm.agg(
      expr("percentile(rec_days, array(0.2, 0.4, 0.6, 0.8))").as("rt"),
      expr("percentile(freq, array(0.2, 0.4, 0.6, 0.8))").as("ft"),
      expr("percentile(mon_cents, array(0.2, 0.4, 0.6, 0.8))").as("mt"))
    def bin(v: String, t: String) =
      (lit(1) + (0 to 3).map(i => when(col(v) > expr(s"$t[$i]"), 1).otherwise(0))
        .reduce(_ + _)).as(s"${v.take(1)}_bin")
    rfm.crossJoin(broadcast(thr))
      .select(bin("rec_days", "rt"), bin("freq", "ft"), bin("mon_cents", "mt"),
        col("mon_cents"))
      .groupBy(col("r_bin"), col("f_bin"), col("m_bin"))
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("mon_cents")).cast("double") / 100).as("total_spend"))
      .orderBy("r_bin", "f_bin", "m_bin")
  }

  /** Funnel conversion latency: per user, microseconds from first `view`
    * to the first `purchase` at-or-after it; reported as the quartile +
    * p90 profile over converting users. The per-user firsts are two
    * min-aggregates on user_id (partial-agg'd, same key, one exchange
    * chain); the distributed percentile aggregate collapses to one row —
    * latencies stay exact integer µs until the interpolated percentile,
    * whose operands (and therefore bits) match DuckDB's quantile_cont. */
  def qFunnelLatency(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("v_us"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
      .join(v, "user_id")
      .filter(col("p_us") >= col("v_us"))
      .groupBy(col("user_id")).agg(min(col("p_us") - col("v_us")).as("lat_us"))
    p.agg(count(lit(1)).as("n_converted"),
      expr("percentile(lat_us, 0.25)").as("p25_us"),
      expr("percentile(lat_us, 0.5)").as("p50_us"),
      expr("percentile(lat_us, 0.75)").as("p75_us"),
      expr("percentile(lat_us, 0.9)").as("p90_us"))
  }

  /** Kaplan–Meier survival curve over user lifetimes — THE churn
    * estimator: lifetime = days between a user's first and last event;
    * a user whose last activity precedes the corpus horizon by >14 days
    * is an observed death, otherwise right-censored. Per lifetime day t:
    * n_risk (users whose lifetime reaches t), deaths, censored, and
    * S(t) = Π_{t'≤t, deaths} (1 − d/n_risk).
    *
    * Scale shape: ONE user-keyed corpus shuffle (the per-user min/max);
    * the KM table itself is bounded by the day-domain (hundreds of
    * rows), so its windows — the suffix-count for n_risk and the
    * product — run on a tiny frame. The product is an ordered-window
    * ln-sum (summation order pinned on both engines) exponentiated
    * once; ln/exp are the engine-dependent ops, so survival rounds to
    * 6 dp (the ln convention). d/n_risk is an exact-integer ratio —
    * identical operand bits into ln. */
  def qSurvivalKm(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val horizon = e.agg(max(unix_micros(col("ts"))).as("h_us"))
    val dayUs = 86400000000L
    val byT = e.groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("first_us"),
        max(unix_micros(col("ts"))).as("last_us"))
      .crossJoin(broadcast(horizon))
      .select(expr(s"(last_us - first_us) div $dayUs").as("t"),
        (col("last_us") < col("h_us") - lit(14L * dayUs)).as("death"))
      .groupBy(col("t"))
      .agg(sum(when(col("death"), 1L).otherwise(0L)).as("n_deaths"),
        sum(when(col("death"), 0L).otherwise(1L)).as("n_censored"))
    val before = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upTo = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = byT.agg(sum(col("n_deaths") + col("n_censored")).as("n_total"))
    byT.crossJoin(broadcast(tot))
      .withColumn("n_risk", col("n_total") -
        coalesce(sum(col("n_deaths") + col("n_censored")).over(before), lit(0L)))
      .withColumn("ln_term", when(col("n_deaths") > 0,
        log(lit(1.0) - col("n_deaths").cast("double") / col("n_risk").cast("double")))
        .otherwise(lit(0.0)))
      .withColumn("survival", round(exp(sum(col("ln_term")).over(upTo)), 6))
      .select(col("t").as("t_days"), col("n_risk"), col("n_deaths"),
        col("n_censored"), col("survival"))
      .orderBy("t_days")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_survival_km" -> qSurvivalKm,
    "q_rfm_segments" -> qRfmSegments,
    "q_funnel_latency" -> qFunnelLatency,
    "q_twap_user" -> qTwapUser,
    "q_users_cumulative" -> qUsersCumulative,
    "q_event_transitions" -> qEventTransitions,
    "q_attribution" -> qAttribution,
    "q_events_debounce" -> qEventsDebounce,
    "q_cohort_retention" -> qCohortRetention,
    "q_funnel_steps" -> qFunnelSteps,
    "q_session_batch" -> qSessionBatch,
  )

  val oracles: Map[String, String] = Map(
    "q_survival_km" ->
      """WITH h AS (SELECT max(epoch_us(ts)) AS h_us FROM events),
        |u AS (SELECT user_id, min(epoch_us(ts)) AS first_us,
        |    max(epoch_us(ts)) AS last_us FROM events GROUP BY user_id),
        |per AS (SELECT (last_us - first_us) // 86400000000 AS t,
        |    last_us < h_us - 14 * 86400000000 AS death
        |  FROM u, h),
        |byt AS (SELECT t,
        |    CAST(sum(CASE WHEN death THEN 1 ELSE 0 END) AS BIGINT) AS n_deaths,
        |    CAST(sum(CASE WHEN death THEN 0 ELSE 1 END) AS BIGINT) AS n_censored
        |  FROM per GROUP BY t),
        |tot AS (SELECT CAST(sum(n_deaths + n_censored) AS BIGINT) AS n_total FROM byt),
        |r AS (SELECT *,
        |    n_total - CAST(coalesce(sum(n_deaths + n_censored) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        |  FROM byt, tot),
        |k AS (SELECT *,
        |    CASE WHEN n_deaths > 0
        |      THEN ln(1.0 - CAST(n_deaths AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |      ELSE 0.0 END AS ln_term
        |  FROM r)
        |SELECT t AS t_days, n_risk, n_deaths, n_censored,
        |  round(exp(sum(ln_term) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS survival
        |FROM k ORDER BY t_days""".stripMargin,
    "q_rfm_segments" ->
      """WITH per AS (SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS last_day,
        |    count(*) AS freq,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS mon_cents
        |  FROM orders GROUP BY 1),
        |gm AS (SELECT max(CAST(o_orderdate AS DATE)) AS max_day FROM orders),
        |rfm AS (SELECT o_custkey, CAST(max_day - last_day AS BIGINT) AS rec_days,
        |    freq, mon_cents FROM per, gm),
        |thr AS (SELECT quantile_cont(rec_days, [0.2,0.4,0.6,0.8]) AS rt,
        |    quantile_cont(freq, [0.2,0.4,0.6,0.8]) AS ft,
        |    quantile_cont(mon_cents, [0.2,0.4,0.6,0.8]) AS mt FROM rfm),
        |binned AS (SELECT mon_cents,
        |    1 + (CASE WHEN rec_days > rt[1] THEN 1 ELSE 0 END)
        |      + (CASE WHEN rec_days > rt[2] THEN 1 ELSE 0 END)
        |      + (CASE WHEN rec_days > rt[3] THEN 1 ELSE 0 END)
        |      + (CASE WHEN rec_days > rt[4] THEN 1 ELSE 0 END) AS r_bin,
        |    1 + (CASE WHEN freq > ft[1] THEN 1 ELSE 0 END)
        |      + (CASE WHEN freq > ft[2] THEN 1 ELSE 0 END)
        |      + (CASE WHEN freq > ft[3] THEN 1 ELSE 0 END)
        |      + (CASE WHEN freq > ft[4] THEN 1 ELSE 0 END) AS f_bin,
        |    1 + (CASE WHEN mon_cents > mt[1] THEN 1 ELSE 0 END)
        |      + (CASE WHEN mon_cents > mt[2] THEN 1 ELSE 0 END)
        |      + (CASE WHEN mon_cents > mt[3] THEN 1 ELSE 0 END)
        |      + (CASE WHEN mon_cents > mt[4] THEN 1 ELSE 0 END) AS m_bin
        |  FROM rfm, thr)
        |SELECT CAST(r_bin AS INT) AS r_bin, CAST(f_bin AS INT) AS f_bin,
        |  CAST(m_bin AS INT) AS m_bin, count(*) AS n_customers,
        |  CAST(sum(mon_cents) AS DOUBLE)/100 AS total_spend
        |FROM binned GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_funnel_latency" ->
      """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS v_us FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, CAST(min(epoch_us(ts) - v_us) AS BIGINT) AS lat_us
        |  FROM events e JOIN v USING (user_id)
        |  WHERE event_type = 'purchase' AND epoch_us(ts) >= v_us GROUP BY 1)
        |SELECT count(*) AS n_converted,
        |  quantile_cont(lat_us, 0.25) AS p25_us,
        |  quantile_cont(lat_us, 0.5) AS p50_us,
        |  quantile_cont(lat_us, 0.75) AS p75_us,
        |  quantile_cont(lat_us, 0.9) AS p90_us
        |FROM p""".stripMargin,
    "q_twap_user" ->
      """WITH e AS (SELECT user_id, event_id,
        |    epoch_us(ts) AS t_us,
        |    CAST(round(value*100) AS BIGINT) AS val_cents FROM events),
        |holds AS (SELECT user_id, val_cents,
        |    lead(t_us) OVER (PARTITION BY user_id ORDER BY t_us, event_id) - t_us AS d_us
        |  FROM e),
        |g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_holds,
        |    CAST(sum(d_us) AS BIGINT) AS tot_us,
        |    sum(CAST(val_cents AS HUGEINT) * CAST(d_us AS HUGEINT)) AS wsum
        |  FROM holds WHERE d_us IS NOT NULL GROUP BY 1)
        |SELECT user_id, n_holds, tot_us,
        |  CAST(CAST(wsum AS VARCHAR) AS DOUBLE) / CAST(tot_us AS DOUBLE) / 100.0
        |    AS twap_value
        |FROM g WHERE tot_us > 0 ORDER BY user_id""".stripMargin,
    "q_users_cumulative" ->
      """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day
        |  FROM events GROUP BY user_id),
        |d AS (SELECT day, count(*) AS new_users FROM f GROUP BY day)
        |SELECT CAST(day AS TIMESTAMP) AS day, new_users,
        |  CAST(sum(new_users) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM d ORDER BY day""".stripMargin,
    "q_event_transitions" ->
      """WITH t AS (SELECT user_id, event_id, ts, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |g AS (SELECT coalesce(prev, '(start)') AS from_type,
        |  event_type AS to_type, count(*) AS n FROM t GROUP BY from_type, to_type)
        |SELECT from_type, to_type, n,
        |  CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS share
        |FROM g ORDER BY from_type, to_type""".stripMargin,
    "q_attribution" ->
      """WITH e AS (SELECT user_id, event_id, ts, event_type,
        |  CAST(floor(value*100) AS BIGINT) AS cents FROM events),
        |t AS (SELECT user_id, event_id, event_type, cents,
        |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM e)
        |SELECT coalesce(touch, '(none)') AS credited,
        |  count(*) AS n_purchases, CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY credited ORDER BY credited""".stripMargin,
    "q_events_debounce" ->
      """WITH c AS (SELECT event_id, user_id, event_type, ts FROM events
        |  UNION ALL
        |  SELECT event_id + (SELECT max(event_id) + 1 FROM events),
        |    user_id, event_type, ts + INTERVAL 1 SECOND
        |  FROM events WHERE event_id % 7 = 0),
        |x AS (SELECT event_id, user_id, event_type, ts, epoch_us(ts) AS us,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id) AS gap_us
        |  FROM c)
        |SELECT event_id, user_id, event_type, ts, gap_us
        |FROM x WHERE gap_us IS NULL OR gap_us > 5000000
        |ORDER BY event_id""".stripMargin,
    "q_cohort_retention" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |f AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT e.user_id, f.cohort, e.day
        |  FROM e JOIN f ON e.user_id = f.user_id)
        |SELECT CAST(cohort AS TIMESTAMP) AS cohort,
        |  CAST(day - cohort AS INT) AS day_offset,
        |  count(*) AS n_users
        |FROM a GROUP BY cohort, day_offset
        |ORDER BY cohort, day_offset""".stripMargin,
    "q_funnel_steps" ->
      """WITH v AS (SELECT user_id, min(ts) AS v_ts FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, min(e.ts) AS c_ts FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.v_ts GROUP BY e.user_id),
        |p AS (SELECT e.user_id, min(e.ts) AS p_ts FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts GROUP BY e.user_id)
        |SELECT 1 AS stage, 'view' AS event_type, count(*) AS n_users FROM v
        |UNION ALL
        |SELECT 2, 'click_after_view', count(*) FROM c
        |UNION ALL
        |SELECT 3, 'purchase_after_click', count(*) FROM p
        |ORDER BY stage""".stripMargin,
    "q_session_batch" ->
      """WITH x AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |y AS (
        |  SELECT user_id, ts, us,
        |    CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |      THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS session_idx
        |  FROM x)
        |SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(max(us) - min(us) AS BIGINT) AS duration_us
        |FROM y GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,
  )
}

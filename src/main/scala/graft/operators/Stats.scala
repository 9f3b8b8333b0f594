package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Statistical-analysis operators (north-star extension): distribution
  * moments, per-group linear regression, Welch's t-test, z-score anomaly
  * detection, histogram binning, and SCD2 change-tracking — the data-audit
  * and experiment-evaluation layer of a training-data warehouse.
  *
  * Oracle-exactness design: the driver's compare is an exact float `repr`
  * match, so every statistic here is derived from POWER SUMS of
  * integer-valued columns (`l_quantity` is whole-numbered; money goes
  * through [[graft.Tables.cents]]; `events.value` through
  * `floor(value*100)`). Integer-valued doubles below 2^53 sum exactly, so
  * the partial-aggregate merge order (32 Spark partitions vs DuckDB's
  * single pass) cannot change a single bit; the final per-group float
  * formulas are written with the identical operation tree on both sides,
  * and avoid `pow`/`ln` (not correctly-rounded, engine-dependent) in favor
  * of `sqrt` and multiplication (IEEE correctly-rounded, engine-identical).
  *
  * Scale shape: every statistic is one partial-aggregated groupBy — a
  * single exchange of a handful of sum columns per group, independent of
  * row count. The per-row passes (z-score, binning) broadcast the tiny
  * stats frame back onto the fact table, so the 100 TB side is never
  * shuffled. SCD2 is a user-keyed window — one exchange on user_id.
  */
object Stats {

  private def d(c: Column): Column = c.cast("double")

  /** Distribution moments of `l_quantity` per return flag: mean,
    * population stddev, skewness, excess kurtosis, plus correlation with
    * `l_linenumber` — computed from exact power sums (one aggregation
    * pass), then combined driver-formula-style per group. Spark's built-in
    * `skewness`/`kurtosis`/`corr` aggregates exist, but their streaming
    * central-moment updates are not bit-reproducible across merge orders;
    * the power-sum form is, and is also how a map-side-combined 100 TB
    * moment computation should be shaped (6 doubles per group shuffled). */
  def qStatsMoments(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity")
    val y = col("l_linenumber").cast("double")
    val g = lineitem(s, dir).groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("s1"), sum(x * x).as("s2"),
        sum(x * x * x).as("s3"), sum(x * x * x * x).as("s4"),
        sum(y).as("t1"), sum(y * y).as("t2"), sum(x * y).as("sxy"))
    val n = d(col("n"))
    val mean = col("s1") / n
    val m2 = col("s2") / n - mean * mean
    val m3 = col("s3") / n - lit(3.0) * mean * (col("s2") / n) +
      lit(2.0) * mean * mean * mean
    val m4 = col("s4") / n - lit(4.0) * mean * (col("s3") / n) +
      lit(6.0) * mean * mean * (col("s2") / n) -
      lit(3.0) * mean * mean * mean * mean
    val my = col("t1") / n
    val vy = col("t2") / n - my * my
    val cov = col("sxy") / n - mean * my
    g.select(col("l_returnflag"), col("n"),
        mean.as("mean_qty"),
        sqrt(m2).as("stddev_qty"),
        (m3 / (m2 * sqrt(m2))).as("skew_qty"),
        (m4 / (m2 * m2) - lit(3.0)).as("kurt_qty"),
        (cov / (sqrt(m2) * sqrt(vy))).as("corr_qty_line"))
      .orderBy("l_returnflag")
  }

  /** Per-group simple linear regression (the `regr_slope`/`regr_intercept`
    * pair) of price-in-cents on quantity: slope/intercept/R² from the same
    * exact power sums. One aggregation pass; nothing but 5 sums per group
    * crosses the wire. */
  def qStatsLinreg(s: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity")
    val yi = cents(col("l_extendedprice"))
    val y = d(yi)
    // sy2 ≈ 7.4e18 per group at sf0.1 — far past the 2^53 exact-double
    // envelope, so a double sum would be addition-order-dependent (and
    // flip r2's low bits under any parallel/multi-partition reduce).
    // Accumulate it exactly: bigint cents² (≤ ~1e14 per row) summed as
    // decimal(38,0), mirrored by a HUGEINT sum in the oracle; only the
    // final moment formulas drop to double. sy and sxy stay double sums —
    // their row terms are integer-valued and the totals sit < 2^53, so
    // they are exact in any order.
    val g = lineitem(s, dir).groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(x * x).as("sx2"),
        sum(y).as("sy"),
        sum((yi * yi).cast("decimal(38,0)")).as("sy2"),
        sum(x * y).as("sxy"))
    val n = d(col("n"))
    val mx = col("sx") / n
    val my = col("sy") / n
    val vx = col("sx2") / n - mx * mx
    val vy = d(col("sy2")) / n - my * my
    val cov = col("sxy") / n - mx * my
    val slope = cov / vx
    g.select(col("l_returnflag"), col("n"),
        slope.as("slope_cents_per_qty"),
        (my - slope * mx).as("intercept_cents"),
        ((cov * cov) / (vx * vy)).as("r2"))
      .orderBy("l_returnflag")
  }

  /** Welch's t-test across every pair of event types on `value` (as exact
    * integer cents): the A/B-experiment evaluation primitive. The 5-row
    * stats frame self-joins — the fact table is aggregated once and never
    * rejoined. Degrees of freedom via Welch–Satterthwaite. */
  def qAbTtest(s: SparkSession, dir: String): DataFrame = {
    val c = d(floor(col("value") * 100))
    val g = events(s, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(c).as("s1"), sum(c * c).as("s2"))
    val stats = g.select(col("event_type"), col("n"),
      (col("s1") / d(col("n"))).as("mean"),
      // unbiased sample variance from power sums: (s2 - s1²/n) / (n-1)
      ((col("s2") - (col("s1") * col("s1")) / d(col("n"))) /
        (d(col("n")) - lit(1.0))).as("vr"))
    val a = stats.select(col("event_type").as("type_a"), col("n").as("na"),
      col("mean").as("ma"), col("vr").as("va"))
    val b = stats.select(col("event_type").as("type_b"), col("n").as("nb"),
      col("mean").as("mb"), col("vr").as("vb"))
    val sea = col("va") / d(col("na"))
    val seb = col("vb") / d(col("nb"))
    val se2 = sea + seb
    val dof = (se2 * se2) / ((sea * sea) / (d(col("na")) - lit(1.0)) +
      (seb * seb) / (d(col("nb")) - lit(1.0)))
    a.join(b, col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        ((col("ma") - col("mb")) / sqrt(se2)).as("t_stat"),
        dof.as("welch_df"))
      .orderBy("type_a", "type_b")
  }

  /** Z-score anomaly detection: events whose value sits ≥3 population
    * standard deviations from its event-type mean. Two passes over the
    * fact table at most: one partial-aggregated groupBy for the per-type
    * stats (5 rows), then the stats broadcast back — the event table
    * itself is never shuffled. */
  def qAnomalyZscore(s: SparkSession, dir: String): DataFrame =
    flagOutliers(events(s, dir), typeProfile(events(s, dir)))
      .orderBy("event_id")

  /** Per-event-type (mean, population stddev) profile from exact power
    * sums — the batch half shared by the batch detector and the
    * streaming alerter ([[graft.streaming.StreamJoin.anomalyStream]]:
    * profile yesterday's log, alert on today's stream). */
  def typeProfile(e: DataFrame): DataFrame = {
    val c = d(floor(col("value") * 100))
    e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(c).as("s1"), sum(c * c).as("s2"))
      .select(col("event_type"),
        (col("s1") / d(col("n"))).as("mean"),
        sqrt(col("s2") / d(col("n")) -
          (col("s1") / d(col("n"))) * (col("s1") / d(col("n")))).as("sd"))
  }

  /** Stateless ≥3σ gate against a broadcast profile; works unchanged on a
    * batch frame or a micro-batched stream (no watermark, no state).
    * Degenerate types (constant values ⇒ sd = 0) are excluded BEFORE the
    * division: z would otherwise be NaN/Infinity, whose repr and filter
    * semantics differ between engines. */
  def flagOutliers(e: DataFrame, stats: DataFrame): DataFrame =
    e.select(col("event_id"), col("event_type"), col("value"))
      .join(broadcast(stats.filter(col("sd") > 0.0)), "event_type")
      .withColumn("z", (d(floor(col("value") * 100)) - col("mean")) / col("sd"))
      .filter(abs(col("z")) >= 3.0)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))

  /** Robust outlier detection via median absolute deviation: events more
    * than 3 scaled MADs (σ-consistent factor 1.4826) from their type's
    * median — the heavy-tail-safe complement of [[qAnomalyZscore]] (a
    * single extreme value shifts a mean/stddev gate but not a median/MAD
    * gate). Two aggregate-then-broadcast passes (median, then MAD); the
    * event table is scanned, never shuffled. Exact interpolated
    * percentiles over integer cents keep both engines bit-identical —
    * the q_percentiles precedent. */
  def qAnomalyMad(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("event_id"), col("event_type"),
      col("value"), floor(col("value") * 100).cast("bigint").as("cents"))
    val med = e.groupBy(col("event_type"))
      .agg(percentile(col("cents"), lit(0.5)).as("med"))
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("adev", abs(d(col("cents")) - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(percentile(col("adev"), lit(0.5)).as("mad"))
    // mad = 0 (>50% of a type at its median) would make every deviating
    // row's score Infinity — engine-dependent repr; guard before dividing.
    dev.join(broadcast(mad.filter(col("mad") > 0.0)), "event_type")
      .withColumn("mad_score", col("adev") / (lit(1.4826) * col("mad")))
      .filter(col("mad_score") >= 3.0)
      .select(col("event_id"), col("event_type"), col("value"),
        col("mad_score"))
      .orderBy("event_id")
  }

  /** Chi-square test of independence between event type and value band
    * (low/mid/high by fixed cent thresholds) — the categorical
    * counterpart of [[qAbTtest]]: does outcome band depend on event
    * type? Observed counts are exact integers; expected counts and the
    * statistic derive from them in one pass over the 15-cell contingency
    * table, with the float sum made engine-exact by the same ordered
    * prefix-sum trick as q_text_entropy (ORDER BY cell key fixes the
    * addition sequence). Output: one row, chi2 + degrees of freedom. */
  def qStatsChi2(s: SparkSession, dir: String): DataFrame = {
    val cells = events(s, dir)
      .select(col("event_type"),
        when(floor(col("value") * 100) < 10000L, "low")
          .when(floor(col("value") * 100) < 30000L, "mid")
          .otherwise("high").as("band"))
      .groupBy(col("event_type"), col("band"))
      .agg(count(lit(1)).as("o"))
    val dims = cells.agg(count_distinct(col("event_type")).as("n_types"),
      count_distinct(col("band")).as("n_bands"), sum(col("o")).as("n"))
    val byType = Window.partitionBy("event_type")
    val byBand = Window.partitionBy("band")
    // windows and the prefix sum run over the CONTINGENCY TABLE
    // (types × bands rows), never the fact table — single-partition here
    // is by construction tiny
    val prefix = Window.orderBy("event_type", "band")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val e = (d(col("row_n")) * d(col("col_n"))) / d(col("n"))
    cells
      .withColumn("row_n", sum(col("o")).over(byType))
      .withColumn("col_n", sum(col("o")).over(byBand))
      .crossJoin(broadcast(dims))
      .withColumn("term", ((d(col("o")) - e) * (d(col("o")) - e)) / e)
      .withColumn("cum", sum(col("term")).over(prefix))
      .withColumn("rn",
        row_number().over(Window.orderBy(col("event_type").desc,
          col("band").desc)))
      .filter(col("rn") === 1)
      .select(round(col("cum"), 6).as("chi2"),
        ((col("n_types") - 1) * (col("n_bands") - 1)).as("dof"),
        col("n").as("n_events"))
  }

  /** Equal-width histogram of order totals: 20 bins between the global min
    * and max. The 1-row min/max frame broadcasts onto the fact table
    * (`crossJoin`); the only shuffle is the 20-group count. The top edge
    * closes via `least(_, 19)` so max lands in the last bin. */
  def qHistBins(s: SparkSession, dir: String): DataFrame = {
    val o = orders(s, dir)
    val mm = o.agg(min(col("o_totalprice")).as("lo"),
      max(col("o_totalprice")).as("hi"))
    val width = (col("hi") - col("lo")) / lit(20.0)
    o.select(col("o_totalprice")).crossJoin(broadcast(mm))
      .select(least(floor((col("o_totalprice") - col("lo")) / width),
          lit(19L)).as("bin"),
        col("lo"), col("hi"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("lo")).as("lo"), max(col("hi")).as("hi"))
      .select(col("bin").cast("int").as("bin"),
        (col("lo") + ((col("hi") - col("lo")) / lit(20.0)) * d(col("bin")))
          .as("bin_lo"),
        col("n"))
      .orderBy("bin")
  }

  /** SCD type-2 history build from the raw event log: per user, collapse
    * consecutive same-type events into validity intervals
    * `[valid_from, valid_to)` with an open current row — the
    * slowly-changing-dimension snapshot a warehouse derives from a CDC
    * feed. Both windows share one hash partitioning on user_id: a single
    * exchange end to end. `event_id` tie-breaks equal timestamps. */
  def qScd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull ||
        col("event_type") =!= col("prev_type"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type"), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.cast("int").as("is_current"))
      .orderBy("user_id", "valid_from")
  }

  /** Time travel: the (user → event_type) state as of the timeline
    * midpoint, reconstructed from the raw log — the read side of the SCD2
    * build ([[qScd2]]). The as-of instant is derived in-query from exact
    * integer microseconds ((min+max) div 2, one 1-row broadcast), so the
    * query is self-contained at any scale factor; the latest-row-per-key
    * window shares the log's natural user_id partitioning. */
  def qAsOfSnapshot(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"), col("event_type"),
      col("ts"), col("event_id"), unix_micros(col("ts")).as("us"))
    val t = e.agg(((min(col("us")) + max(col("us"))) / lit(2L))
      .cast("bigint").as("t_us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    e.crossJoin(broadcast(t))
      .filter(col("us") <= col("t_us"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("state_as_of"),
        col("ts").as("since"))
      .orderBy("user_id")
  }

  /** CDC apply: fold a change log into its end state. Each event is an
    * upsert of (user → value-in-cents) except `error` rows, which are
    * deletes; the last operation per key (ts, event_id order) wins, and a
    * trailing delete removes the key. One latest-row-per-key window on
    * the change-log's key — the canonical log-compaction shape (a 100 TB
    * log compacts per-key in one exchange, no driver state). */
  def qCdcApply(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        floor(col("value") * 100).cast("bigint").as("cents"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_ops", count(lit(1)).over(Window.partitionBy("user_id")))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("cents").as("last_cents"),
        col("ts").as("last_ts"), col("n_ops"))
      .orderBy("user_id")
  }

  /** Column profiling (the `ANALYZE`/data-audit pass): per column, row
    * count, null count, exact distinct count, and min/max — one profile
    * row per column, unioned. Each column profiles in its own aggregate
    * over a single-column pruned scan (ReadSchema shows exactly one
    * field), so a 100 TB profile reads each column's pages once and
    * shuffles one row per distinct value during the two-stage distinct.
    * Min/max travel as strings (integer-valued numerics cast through
    * bigint so both engines render identically). */
  def qProfileColumns(s: SparkSession, dir: String): DataFrame = {
    val li = lineitem(s, dir)
    def prof(name: String, v: Column): DataFrame =
      li.agg(count(lit(1)).as("n_rows"),
          sum(when(col(name).isNull, 1L).otherwise(0L)).as("n_null"),
          count_distinct(col(name)).as("n_distinct"),
          min(v).cast("string").as("min_v"),
          max(v).cast("string").as("max_v"))
        .select(lit(name).as("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_v"), col("max_v"))
    prof("l_returnflag", col("l_returnflag"))
      .union(prof("l_linestatus", col("l_linestatus")))
      .union(prof("l_quantity", col("l_quantity").cast("bigint")))
      .union(prof("l_orderkey", col("l_orderkey")))
      .union(prof("l_linenumber", col("l_linenumber").cast("bigint")))
      .orderBy("col_name")
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the `view` and
    * `click` value distributions — the distribution-drift detector a data
    * pipeline runs between corpus versions or A/B arms. D =
    * max_v |F_view(v) − F_click(v)|, computed entirely in integers:
    * the max runs over |nb·cumA(v) − na·cumB(v)| (exact bigints) and only
    * the final single division drops to double — bit-identical in any
    * engine, no rounding needed.
    *
    * Scale shape: the fact table collapses to one cell per distinct cents
    * value (domain-bounded — value-range·100 cells regardless of corpus
    * size, ~17k at sf0.1). The CDF prefix sums run two-level: an in-segment
    * window partitioned on `cents div 256` plus a partition-less offsets
    * window over the ≤domain/256 segment totals — no window task ever sees
    * more than max(256, #segments) rows (the [[graft.operators.Pipeline]]
    * pack-sequences pattern). The cross-term products stay within int64
    * while na·nb < ~9e18; past that the same query promotes to
    * decimal(38,0). */
  def qStatsKs(s: SparkSession, dir: String): DataFrame = {
    // cache() the POST-AGGREGATE cells (domain-bounded, tiny): three
    // consumers (CDF pass, segment offsets, totals) would otherwise each
    // rescan and re-aggregate the full fact table
    val cells = events(s, dir)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_type"),
        floor(col("value") * 100).cast("bigint").as("cents"))
      .groupBy("cents")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("ca"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("cb"))
      .withColumn("seg", expr("cents div 256"))
      .cache()
    val segTot = cells.groupBy("seg")
      .agg(sum(col("ca")).as("sa"), sum(col("cb")).as("sb"))
    val tot = segTot.agg(sum(col("sa")).as("na"), sum(col("sb")).as("nb"))
    val offW = Window.orderBy("seg")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = segTot
      .select(col("seg"),
        coalesce(sum(col("sa")).over(offW), lit(0L)).as("off_a"),
        coalesce(sum(col("sb")).over(offW), lit(0L)).as("off_b"))
    val inSeg = Window.partitionBy("seg").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(broadcast(offs), "seg")
      .withColumn("cum_a", col("off_a") + sum(col("ca")).over(inSeg))
      .withColumn("cum_b", col("off_b") + sum(col("cb")).over(inSeg))
      .crossJoin(broadcast(tot))
      .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
        max(abs(col("nb") * col("cum_a") - col("na") * col("cum_b")))
          .as("ks_num"))
      .select(col("na"), col("nb"), col("ks_num"),
        (col("ks_num").cast("double") /
          (col("na").cast("double") * col("nb").cast("double")))
          .as("ks_stat"))
  }

  /** Per-type winsorized mean at [p05, p95] — the robust-mean audit that
    * survives the heavy tails a plain mean does not. The exact discrete
    * quantile thresholds come from integer cumulative counts over the
    * per-(type, cents) cells (lo = least v with 20·cum ≥ n, hi = least v
    * with 20·cum ≥ 19·n — pure integer comparisons, no interpolated
    * percentile whose float arithmetic differs between engines), then the
    * tiny bounds frame broadcasts back and the clamped integer cents sum
    * exactly. Scale: the cells are domain-bounded per type; the fact table
    * is touched by one partial-aggregated groupBy per pass and never
    * shuffled on rows. */
  def qStatsWinsorize(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("event_type"),
        floor(col("value") * 100).cast("bigint").as("cents"))
    val cells = e.groupBy("event_type", "cents").agg(count(lit(1)).as("c"))
    val cumW = Window.partitionBy("event_type").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = cells
      .withColumn("cum", sum(col("c")).over(cumW))
      .withColumn("n", sum(col("c")).over(Window.partitionBy("event_type")))
    val bounds = x.groupBy("event_type")
      .agg(min(when(col("cum") * 20 >= col("n"), col("cents"))).as("lo"),
        min(when(col("cum") * 20 >= col("n") * 19, col("cents"))).as("hi"))
    e.join(broadcast(bounds), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        max(col("lo")).as("lo_cents"), max(col("hi")).as("hi_cents"),
        (sum(greatest(col("lo"), least(col("hi"), col("cents"))))
          .cast("double") / count(lit(1)).cast("double"))
          .as("wins_mean_cents"))
      .orderBy("event_type")
  }

  /** Mann–Whitney U (rank-sum) between the `view` and `click` value
    * distributions — the non-parametric A/B effect test, with the AUC
    * effect size U/(na·nb). Ties take midranks; everything stays integer
    * by carrying DOUBLED ranks (2·midrank(v) = 2·cum_before(v) + c(v) + 1,
    * all exact bigints), so 2·U_a = Σ ca·2midrank − na(na+1) is exact and
    * only the final AUC division drops to double. Same domain-bounded
    * cells + two-level prefix-sum shape as [[qStatsKs]]. */
  def qStatsMwu(s: SparkSession, dir: String): DataFrame = {
    // same cached-cells discipline as [[qStatsKs]] — one fact scan
    val cells = events(s, dir)
      .filter(col("event_type").isin("view", "click"))
      .select(col("event_type"),
        floor(col("value") * 100).cast("bigint").as("cents"))
      .groupBy("cents")
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("ca"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("cb"))
      .withColumn("seg", expr("cents div 256"))
      .cache()
    val segTot = cells.groupBy("seg")
      .agg(sum(col("ca")).as("sa"), sum(col("cb")).as("sb"))
    val tot = segTot.agg(sum(col("sa")).as("na"), sum(col("sb")).as("nb"))
    val offW = Window.orderBy("seg")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = segTot
      .select(col("seg"),
        coalesce(sum(col("sa") + col("sb")).over(offW), lit(0L)).as("off_t"))
    val inSeg = Window.partitionBy("seg").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(broadcast(offs), "seg")
      .withColumn("excl",
        col("off_t") + sum(col("ca") + col("cb")).over(inSeg) -
          (col("ca") + col("cb")))
      .crossJoin(broadcast(tot))
      .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
        sum(col("ca") * (col("excl") * 2 + col("ca") + col("cb") + 1))
          .as("r2a"))
      .select(col("na"), col("nb"),
        (col("r2a") - col("na") * (col("na") + 1)).as("u2_a"))
      .withColumn("auc",
        col("u2_a").cast("double") /
          (lit(2.0) * col("na").cast("double") * col("nb").cast("double")))
  }

  /** Lag-1 autocorrelation of the daily revenue series — the
    * time-series health check (near-0 = independent days, near-1 =
    * strong persistence/trend). The fact table collapses to one exact
    * integer-cents row per day FIRST (date-domain-bounded — thousands of
    * rows at any corpus size), so the lead window and the five moment
    * sums touch only the aggregate. Squared daily totals exceed 2^53, so
    * the power sums accumulate in decimal(38,0) / HUGEINT like
    * [[qStatsLinreg]]; the final correlation drops to double through the
    * same operation tree in both engines. */
  def qStatsAutocorr(s: SparkSession, dir: String): DataFrame = {
    val daily = orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(cents(col("o_totalprice"))).as("rev"))
    val pairs = daily
      .withColumn("next", lead(col("rev"), 1).over(Window.orderBy("day")))
      .filter(col("next").isNotNull)
    // products computed IN decimal (not cast after an int64 multiply):
    // daily totals past ~3e9 cents would overflow the intermediate long
    val dx = col("rev").cast("decimal(19,0)")
    val dy = col("next").cast("decimal(19,0)")
    val g = pairs.agg(count(lit(1)).as("n"),
      sum(col("rev")).as("sx"), sum(col("next")).as("sy"),
      sum(dx * dx).as("sx2"), sum(dy * dy).as("sy2"),
      sum(dx * dy).as("sxy"))
    val n = d(col("n"))
    val mx = d(col("sx")) / n
    val my = d(col("sy")) / n
    val vx = d(col("sx2")) / n - mx * mx
    val vy = d(col("sy2")) / n - my * my
    val cov = d(col("sxy")) / n - mx * my
    g.select(col("n"), (cov / (sqrt(vx) * sqrt(vy))).as("lag1_autocorr"))
  }

  /** Exponential smoothing (half-life decay, α=1/2) of the daily revenue
    * series — the trend-following view the autocorrelation above
    * quantifies. Float pow/exp would differ across engines, so the EWMA
    * is computed as a finite-impulse-response filter with EXACT integer
    * weights: over the trailing 41 observed days, numerator
    * Σ revₖ·2^(40-k) and denominator Σ [day exists]·2^(40-k) accumulate
    * in decimal/HUGEINT (weights beyond lag 40 are < 2⁻⁴⁰ of the newest —
    * below cent resolution, so the truncation is the definition, not an
    * approximation; both engines share it). The tail is all correctly-
    * rounded IEEE ops on identical integer operands — int→double
    * conversion, one division, one /100 — so the result is bit-identical
    * WITHOUT rounding. Two measured traps shaped this tail: a round(6)
    * broke sf0.1 (one quotient sat on a half-up boundary the engines
    * resolve apart at 16-significant-digit magnitudes), and DuckDB's
    * direct HUGEINT→DOUBLE cast is NOT correctly rounded past 2^53 (its
    * hi·2⁶⁴+lo float arithmetic double-rounds; Spark's decimal→double
    * is exact-parse), so the oracle routes num through VARCHAR, whose
    * parse IS correctly rounded. The 41 lags compute in ONE
    * WindowExec over the date-domain-bounded daily aggregate — the same
    * bounded-global-window shape as the autocorrelation. */
  def qStatsEwma(s: SparkSession, dir: String): DataFrame = {
    val lags = 40
    val daily = orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(cents(col("o_totalprice"))).as("rev"))
      .withColumn("one", lit(1L))
    val w = Window.orderBy("day")
    def wsum(c: String): Column = (0 to lags).map { k =>
      coalesce(lag(col(c), k).over(w), lit(0L)).cast("decimal(19,0)") *
        lit(1L << (lags - k)).cast("decimal(19,0)")
    }.reduce(_ + _)
    daily
      .withColumn("num", wsum("rev"))
      .withColumn("den", wsum("one"))
      .select(col("day").cast("timestamp").as("day"),
        (col("rev").cast("double") / 100).as("revenue"),
        (col("num").cast("double") / col("den").cast("double") / 100.0)
          .as("ewma_05"))
      .orderBy("day")
  }

  /** Population Stability Index between the first and second half of the
    * event stream — the standard "has the input distribution drifted?"
    * gate run before retraining on fresh data. `value` buckets into 16
    * fixed 250-cent cells (map-side arithmetic, no quantile pass needed);
    * per-bucket counts for the two halves come from ONE partial-agg'd
    * shuffle of 16×2 counters, and the PSI contribution per bucket uses
    * Laplace-smoothed shares (cᵢ+1)/(n+16) so empty cells stay finite.
    * All counts are exact integers; the share divisions are identical
    * correctly-rounded doubles on both engines; `ln` is the one
    * engine-dependent op, so the contribution rounds to 6 dp (the
    * established ln-query convention). */
  def qDriftPsi(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(
      (col("ts") < lit("2024-01-16").cast("timestamp")).as("is_ref"),
      least(floor(floor(col("value") * 100) / 250.0), lit(15.0))
        .cast("bigint").as("bucket"))
    val c = e.groupBy(col("bucket")).agg(
      sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
      sum(when(col("is_ref"), 0L).otherwise(1L)).as("n_cur"))
    val t = c.agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
    val p = (d(col("n_ref")) + 1.0) / (d(col("t_ref")) + 16.0)
    val q = (d(col("n_cur")) + 1.0) / (d(col("t_cur")) + 16.0)
    c.crossJoin(broadcast(t))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        round((p - q) * log(p / q), 6).as("psi_part"))
      .orderBy("bucket")
  }

  /** Day-of-week seasonal decomposition of daily revenue (the seasonal-
    * naive baseline every anomaly/forecast pipeline starts from): daily
    * exact-cents totals → per-weekday mean → per-day seasonal residual.
    * The weekday index is pure integer arithmetic (days since a fixed
    * Monday, mod 7) — never an engine's locale-dependent dayofweek().
    * Two aggregates over the date-bounded daily frame (tiny at any
    * corpus size; the daily rollup itself is the only corpus-scale
    * shuffle, partially aggregated map-side). The per-dow mean is one
    * exact-integer division; the residual subtracts two identically-
    * rounded doubles — bit-exact, no rounding anywhere. */
  def qSeasonalDow(s: SparkSession, dir: String): DataFrame = {
    val daily = orders(s, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
      .withColumn("dow",
        pmod(datediff(col("day"), lit("2024-01-01").cast("date")), lit(7))
          .cast("int"))
    val dowMeans = daily.groupBy(col("dow"))
      .agg(sum(col("rev_cents")).as("dow_cents"), count(lit(1)).as("n_days"))
      .withColumn("dow_mean",
        col("dow_cents").cast("double") / 100.0 / col("n_days").cast("double"))
      .select(col("dow"), col("dow_mean"))
    daily
      .join(broadcast(dowMeans), "dow")
      .select(col("day").cast("timestamp").as("day"), col("dow"),
        (col("rev_cents").cast("double") / 100.0).as("revenue"),
        col("dow_mean"),
        (col("rev_cents").cast("double") / 100.0 - col("dow_mean")).as("residual"))
      .orderBy("day")
  }

  /** Deterministic Poisson bootstrap of the mean event value — the
    * distributed uncertainty-estimation pattern: B=32 resamples in ONE
    * corpus pass, each row carrying a per-(resample, row) Poisson(1)
    * WEIGHT instead of being copied (the classic out-of-core bootstrap;
    * a multinomial resample would need the corpus materialized B
    * times). The weight is the inverse-CDF of a deterministic
    * md5-uniform (the A-ES 13-hex-digit construction — 52 bits, exact
    * in a double) against fixed Poisson(1) cumulative thresholds
    * written as full-precision literals, so both engines derive the
    * identical weight for every (b, event) pair. Per resample: exact
    * integer Σw·cents / Σw and ONE correctly-rounded division — no
    * float summation anywhere, no rounding needed. The explode ships
    * corpus×32 rows into a map-side partial aggregate that collapses
    * them to 32 rows per partition before the (tiny) shuffle. The 32
    * per-resample means ARE the bootstrap distribution; SE/CI are a
    * trivial driver-side fold over 32 numbers. */
  def qStatsBootstrap(s: SparkSession, dir: String): DataFrame = {
    // P(Poisson(1) <= k) for k = 0..6; weight 7 beyond (P ~ 1 - 8e-5).
    val cum = Seq(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
      0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
      0.9999167588507119)
    val u = (conv(substring(md5(concat(lit("boot"), col("b").cast("string"),
        lit("_"), col("event_id").cast("string"))), 1, 13), 16, 10)
      .cast("long").cast("double") / lit(math.pow(16.0, 13)))
    val w = cum.zipWithIndex.foldRight(lit(7): Column) {
      case ((threshold, k), rest) => when(u < threshold, k).otherwise(rest)
    }
    events(s, dir)
      .select(col("event_id"), cents(col("value")).as("cents"))
      .select(col("event_id"), col("cents"),
        explode(expr("sequence(0, 31)")).as("b"))
      .select(col("b"), (w.cast("bigint") * col("cents")).as("wc"),
        w.cast("bigint").as("w"))
      .groupBy(col("b"))
      .agg(sum(col("w")).as("n_eff"), sum(col("wc")).as("sum_cents"))
      .select(col("b"), col("n_eff"), col("sum_cents"),
        (col("sum_cents").cast("double") / col("n_eff").cast("double") / 100.0)
          .as("mean_value"))
      .orderBy("b")
  }

  /** Covariance matrix over lineitem's numeric measures (quantity,
    * price, discount — all integral after cents scaling), unpivoted to
    * one row per (var_i, var_j) pair with i ≤ j. One partial-aggregated
    * pass accumulates the 3 first-order and 6 second-order power sums in
    * decimal(38,0) — ΣpriceΒ² alone passes 2^63 at sf0.1 — so the merge
    * order cannot change a bit; the covariance n·Σxy − Σx·Σy stays in
    * decimal until a single exact-parse cast to double, divided by n²
    * computed in double on both engines (the q_stats_autocorr /
    * HUGEINT-via-VARCHAR oracle pattern). */
  def qStatsCov(s: SparkSession, dir: String): DataFrame = {
    // Fanned scan: the ten decimal(38,0) power-sum partials are the cost
    // here, and they run map-side — single-row-group fixture would put
    // them all on one core (Tables.fanned scaladoc).
    val base = graft.Tables.fanned(s, dir, "lineitem", "l_orderkey").select(
      round(col("l_quantity")).cast("decimal(19,0)").as("x"),
      cents(col("l_extendedprice")).cast("decimal(19,0)").as("y"),
      cents(col("l_discount")).cast("decimal(19,0)").as("z"))
    val g = base.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"), sum(col("z")).as("sz"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("z")).as("sxz"), sum(col("y") * col("y")).as("syy"),
      sum(col("y") * col("z")).as("syz"), sum(col("z") * col("z")).as("szz"))
    def cov(sab: String, sa: String, sb: String): Column =
      (col("n").cast("decimal(38,0)") * col(sab) - col(sa) * col(sb))
        .cast("double") / (d(col("n")) * d(col("n")))
    g.select(col("n"),
        cov("sxx", "sx", "sx").as("c_qty_qty"),
        cov("sxy", "sx", "sy").as("c_qty_price"),
        cov("sxz", "sx", "sz").as("c_qty_disc"),
        cov("syy", "sy", "sy").as("c_price_price"),
        cov("syz", "sy", "sz").as("c_price_disc"),
        cov("szz", "sz", "sz").as("c_disc_disc"))
      .selectExpr("stack(6, " +
        "'qty','qty',c_qty_qty, 'qty','price',c_qty_price, " +
        "'qty','disc',c_qty_disc, 'price','price',c_price_price, " +
        "'price','disc',c_price_disc, 'disc','disc',c_disc_disc) " +
        "AS (var_a, var_b, cov)", "n")
      .selectExpr("var_a", "var_b", "cov", "n")
  }

  /** Cohen's kappa between two independent quality heuristics ("raters")
    * per language — the labeling-QA statistic: how much better than
    * chance do a length-based gate (n_chars ≥ 300) and a token-count
    * gate (≥ 50 whitespace tokens) agree on which documents are
    * train-worthy? κ = (pₒ − pₑ)/(1 − pₑ) from the 2×2 agreement
    * counts. All inputs are integer counts; every float op
    * (division, product, subtraction) is correctly-rounded IEEE on
    * identical operands in both engines, so κ ships at FULL precision —
    * no rounding, per the established convention. NULLIF guards the
    * degenerate 1 − pₑ = 0 case identically on both sides.
    *
    * Scale shape: one aggregation with map-side partials; the flag
    * expressions are per-row codegen on the scan. */
  def qAgreeKappa(s: SparkSession, dir: String): DataFrame = {
    val d = documents(s, dir)
    val a = (col("n_chars") >= 300).cast("long")
    val b = ((length(col("text")) -
      length(expr("replace(text, ' ', '')")) + 1) >= 50).cast("long")
    val g = d.select(col("lang"), a.as("ra"), b.as("rb"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
        sum(col("ra") * col("rb")).as("n_both"),
        sum((lit(1L) - col("ra")) * (lit(1L) - col("rb"))).as("n_neither"),
        sum(col("ra") * (lit(1L) - col("rb"))).as("n_only_a"),
        sum((lit(1L) - col("ra")) * col("rb")).as("n_only_b"))
    val nD = col("n").cast("double")
    val po = (col("n_both") + col("n_neither")).cast("double") / nD
    val pa = (col("n_both") + col("n_only_a")).cast("double") / nD
    val pb = (col("n_both") + col("n_only_b")).cast("double") / nD
    val pe = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
    g.select(col("lang"), col("n"), col("n_both"), col("n_neither"),
        col("n_only_a"), col("n_only_b"),
        ((po - pe) / nullif(lit(1.0) - pe, lit(0.0))).as("kappa"))
      .orderBy("lang")
  }

  /** Benford first-digit conformity of order totals (in cents) — the
    * classic fabricated-data / pipeline-corruption screen: per leading
    * digit 1–9, the observed share vs Benford's log₁₀(1 + 1/d), with
    * the absolute deviation (whose mean over digits is the standard
    * MAD conformity statistic). The first digit comes from the exact
    * integer's decimal string (no float log extraction — a power-of-ten
    * boundary could round differently across engines); p_obs is an
    * exact integer ratio; the Benford reference and deviation round to
    * 6 dp for the log ulp. A synthetic-uniform fixture (like TPC-H
    * prices) deviates strongly — the screen firing on synthetic data is
    * the diagnostic working, same as the Zipf r² note.
    *
    * Scale shape: one row-level digit projection pushed to the scan,
    * one 9-group aggregation with map-side partials, one broadcast of
    * the single-row total. */
  def qStatsBenford(s: SparkSession, dir: String): DataFrame = {
    val g = orders(s, dir)
      .select(substring(cents(col("o_totalprice")).cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    val tot = g.agg(sum(col("n_obs")).as("n"))
    val pBen = log(10.0, lit(1.0) + lit(1.0) / col("digit").cast("double"))
    val pObs = col("n_obs").cast("double") / col("n").cast("double")
    g.crossJoin(broadcast(tot))
      .select(col("digit"), col("n_obs"),
        pObs.as("p_obs"),
        round(pBen, 6).as("p_benford"),
        round(abs(pObs - pBen), 6).as("abs_dev"))
      .orderBy("digit")
  }

  /** CUPED variance reduction for the A/B readout (Deng, Xu, Kohavi &
    * Walker 2013 — the industry-standard pre-experiment covariate
    * adjustment): per user, pre-period spend X (first half of the event
    * window, the q_drift_psi midpoint) and experiment-period spend Y;
    * θ = cov(X,Y)/var(X) pooled; each variant reports its raw and
    * CUPED-adjusted mean Ŷ = Ȳ_v − θ·(X̄_v − X̄), plus the pooled
    * residual-variance ratio 1 − ρ² — how much tighter the experiment
    * reads after adjustment. Variant assignment is the deterministic
    * salted-md5 split every sampling operator here uses.
    *
    * Scale shape: ONE user-keyed aggregate collapses the fact table;
    * the pooled moment frame is a 1-row broadcast; per-variant stats a
    * 2-row aggregate. Per-user power sums stay exact bigints; the
    * pooled cross-product sums x·y / x² / y² accumulate as
    * decimal(38,0) (the qChangepointBinseg discipline — a bigint sum
    * of products silently wraps past ~9.2e18, which per-user cent
    * totals reach long before 100 TB) mirroring the oracle's HUGEINT,
    * and reach double via the exactly-parsed-string cast on BOTH
    * sides; round(6) pins the long derived expressions. */
  def qAbCuped(s: SparkSession, dir: String): DataFrame =
    cupedOf(s, events(s, dir))

  /** [[qAbCuped]] over an arbitrary (user_id, ts, value) event frame
    * (scale-probe entry point). */
  private[graft] def cupedOf(s: SparkSession, ev: DataFrame): DataFrame = {
    val mid = lit("2024-01-16").cast("timestamp")
    val per = ev.groupBy(col("user_id")).agg(
      sum(when(col("ts") < mid, cents(col("value"))).otherwise(0L)).as("x"),
      sum(when(col("ts") >= mid, cents(col("value"))).otherwise(0L)).as("y"))
      .withColumn("variant",
        when(substring(md5(concat(lit("ab"), col("user_id").cast("string"))),
          1, 1) < "8", "A").otherwise("B"))
    // the plain-long sums sx/sy wrap STRICTLY BEFORE the power sums can
    // overflow decimal(38) (sum(x^2) <= max(x)*sum(x) with max(x) <=
    // 2^63, so sxx reaches 1e38 only after sum(x) > 1.09e19 > Long.Max)
    // — so they carry the same decimal(38,0) + fail-loud discipline or
    // the guard below would be unreachable until after silent corruption
    val pooled = per.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum((col("x").cast("decimal(38,0)") * col("y")).cast("decimal(38,0)"))
        .as("sxy"),
      sum((col("x").cast("decimal(38,0)") * col("x")).cast("decimal(38,0)"))
        .as("sxx"),
      sum((col("y").cast("decimal(38,0)") * col("y")).cast("decimal(38,0)"))
        .as("syy"))
    // decimal sums cross to double through the string cast — the same
    // correctly-rounded parse DuckDB's CAST(CAST(… AS VARCHAR) AS DOUBLE)
    // applies to its HUGEINT sums. Past the documented envelope the two
    // engines would DIVERGE silently: Spark's non-ANSI decimal(38,0)
    // overflow yields NULL while DuckDB's HUGEINT (range ~1.7e38 >
    // decimal(38)'s ~1e38) errors loudly — so a NULL power sum raises
    // here (the Math.addExact fail-loud convention, ADVICE r11) instead
    // of flowing into a null theta/var_ratio.
    // (count > 0 distinguishes overflow from the legitimately-null sums
    // of an empty aggregate — empty input stays an empty result frame)
    def sd(c: Column, cnt: Column): Column = when(cnt > 0 && c.isNull,
        raise_error(lit(
          "cupedOf: decimal(38,0) sum overflow — input cents exceed " +
            "the documented envelope"))).otherwise(c)
      .cast("string").cast("double")
    val n = d(col("n"))
    def sn(name: String): Column = sd(col(name), col("n"))
    val cov = sn("sxy") / n - (sn("sx") / n) * (sn("sy") / n)
    val vx = sn("sxx") / n - (sn("sx") / n) * (sn("sx") / n)
    val vy = sn("syy") / n - (sn("sy") / n) * (sn("sy") / n)
    val consts = pooled.select(
      (sn("sx") / n).as("mean_x_pool"),
      (cov / vx).as("theta"),
      (lit(1.0) - (cov * cov) / (vx * vy)).as("var_ratio"))
    val byVariant = per.groupBy(col("variant")).agg(
      count(lit(1)).as("n_users"),
      sum(col("x").cast("decimal(38,0)")).as("vx_sum"),
      sum(col("y").cast("decimal(38,0)")).as("vy_sum"))
    def sv(name: String): Column = sd(col(name), col("n_users"))
    byVariant.crossJoin(broadcast(consts))
      .select(col("variant"), col("n_users"),
        round(sv("vy_sum") / d(col("n_users")), 6).as("mean_y"),
        round(sv("vy_sum") / d(col("n_users")) -
          col("theta") * (sv("vx_sum") / d(col("n_users")) -
            col("mean_x_pool")), 6).as("mean_y_adj"),
        round(col("theta"), 6).as("theta"),
        round(col("var_ratio"), 6).as("var_ratio"))
      .orderBy("variant")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ab_cuped" -> qAbCuped,
    "q_agree_kappa" -> qAgreeKappa,
    "q_stats_benford" -> qStatsBenford,
    "q_drift_psi" -> qDriftPsi,
    "q_stats_bootstrap" -> qStatsBootstrap,
    "q_seasonal_dow" -> qSeasonalDow,
    "q_stats_cov" -> qStatsCov,
    "q_stats_ewma" -> qStatsEwma,
    "q_stats_mwu" -> qStatsMwu,
    "q_stats_autocorr" -> qStatsAutocorr,
    "q_stats_ks" -> qStatsKs,
    "q_stats_winsorize" -> qStatsWinsorize,
    "q_profile_columns" -> qProfileColumns,
    "q_asof_snapshot" -> qAsOfSnapshot,
    "q_cdc_apply" -> qCdcApply,
    "q_stats_moments" -> qStatsMoments,
    "q_stats_linreg" -> qStatsLinreg,
    "q_ab_ttest" -> qAbTtest,
    "q_anomaly_zscore" -> qAnomalyZscore,
    "q_anomaly_mad" -> qAnomalyMad,
    "q_stats_chi2" -> qStatsChi2,
    "q_hist_bins" -> qHistBins,
    "q_scd2" -> qScd2,
  )

  private def profSql(name: String, expr: String): String =
    s"""SELECT '$name' AS col_name, count(*) AS n_rows,
       |  CAST(sum(CASE WHEN $name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       |  count(DISTINCT $name) AS n_distinct,
       |  CAST(min($expr) AS VARCHAR) AS min_v,
       |  CAST(max($expr) AS VARCHAR) AS max_v
       |FROM lineitem""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_ab_cuped" ->
      """WITH per AS (SELECT user_id,
        |    CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY user_id),
        |v AS (SELECT *, CASE WHEN substring(md5('ab' || CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |    THEN 'A' ELSE 'B' END AS variant FROM per),
        |p AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS sx,
        |    CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS sy,
        |    CAST(CAST(sum(CAST(x AS HUGEINT)*y) AS VARCHAR) AS DOUBLE) AS sxy,
        |    CAST(CAST(sum(CAST(x AS HUGEINT)*x) AS VARCHAR) AS DOUBLE) AS sxx,
        |    CAST(CAST(sum(CAST(y AS HUGEINT)*y) AS VARCHAR) AS DOUBLE) AS syy
        |  FROM v),
        |c AS (SELECT sx/n AS mean_x_pool,
        |    (sxy/n - (sx/n)*(sy/n)) / (sxx/n - (sx/n)*(sx/n)) AS theta,
        |    1.0 - ((sxy/n - (sx/n)*(sy/n)) * (sxy/n - (sx/n)*(sy/n)))
        |      / ((sxx/n - (sx/n)*(sx/n)) * (syy/n - (sy/n)*(sy/n))) AS var_ratio
        |  FROM p),
        |g AS (SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(CAST(sum(x) AS VARCHAR) AS DOUBLE) AS vxs,
        |    CAST(CAST(sum(y) AS VARCHAR) AS DOUBLE) AS vys
        |  FROM v GROUP BY variant)
        |SELECT variant, n_users, round(vys/n_users, 6) AS mean_y,
        |  round(vys/n_users - theta * (vxs/n_users - mean_x_pool), 6) AS mean_y_adj,
        |  round(theta, 6) AS theta, round(var_ratio, 6) AS var_ratio
        |FROM g, c ORDER BY variant""".stripMargin,
    "q_agree_kappa" ->
      """WITH f AS (SELECT lang,
        |    CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS ra,
        |    CASE WHEN length(text) - length(replace(text, ' ', '')) + 1 >= 50
        |         THEN 1 ELSE 0 END AS rb
        |  FROM documents),
        |g AS (SELECT lang, count(*) AS n,
        |    CAST(sum(ra * rb) AS BIGINT) AS n_both,
        |    CAST(sum((1 - ra) * (1 - rb)) AS BIGINT) AS n_neither,
        |    CAST(sum(ra * (1 - rb)) AS BIGINT) AS n_only_a,
        |    CAST(sum((1 - ra) * rb) AS BIGINT) AS n_only_b
        |  FROM f GROUP BY lang)
        |SELECT lang, n, n_both, n_neither, n_only_a, n_only_b,
        |  ((CAST(n_both + n_neither AS DOUBLE) / CAST(n AS DOUBLE))
        |   - (CAST(n_both + n_only_a AS DOUBLE) / CAST(n AS DOUBLE)
        |      * (CAST(n_both + n_only_b AS DOUBLE) / CAST(n AS DOUBLE))
        |      + (1 - CAST(n_both + n_only_a AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (1 - CAST(n_both + n_only_b AS DOUBLE) / CAST(n AS DOUBLE))))
        |  / NULLIF(1 - (CAST(n_both + n_only_a AS DOUBLE) / CAST(n AS DOUBLE)
        |      * (CAST(n_both + n_only_b AS DOUBLE) / CAST(n AS DOUBLE))
        |      + (1 - CAST(n_both + n_only_a AS DOUBLE) / CAST(n AS DOUBLE))
        |      * (1 - CAST(n_both + n_only_b AS DOUBLE) / CAST(n AS DOUBLE))), 0)
        |  AS kappa
        |FROM g ORDER BY lang""".stripMargin,
    "q_stats_benford" ->
      """WITH g AS (SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
        |    count(*) AS n_obs
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM g)
        |SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
        |  CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) AS p_obs,
        |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS p_benford,
        |  round(abs(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)
        |    - log10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 6) AS abs_dev
        |FROM g, t ORDER BY digit""".stripMargin,
    "q_drift_psi" ->
      """WITH e AS (SELECT ts < TIMESTAMP '2024-01-16' AS is_ref,
        |    CAST(least(floor(floor(value*100)/250.0), 15.0) AS BIGINT) AS bucket
        |  FROM events),
        |c AS (SELECT bucket,
        |    CAST(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS n_cur
        |  FROM e GROUP BY 1),
        |t AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref,
        |    CAST(sum(n_cur) AS BIGINT) AS t_cur FROM c)
        |SELECT bucket, n_ref, n_cur,
        |  round(((CAST(n_ref AS DOUBLE)+1.0)/(CAST(t_ref AS DOUBLE)+16.0)
        |      - (CAST(n_cur AS DOUBLE)+1.0)/(CAST(t_cur AS DOUBLE)+16.0))
        |    * ln(((CAST(n_ref AS DOUBLE)+1.0)/(CAST(t_ref AS DOUBLE)+16.0))
        |      / ((CAST(n_cur AS DOUBLE)+1.0)/(CAST(t_cur AS DOUBLE)+16.0))), 6)
        |    AS psi_part
        |FROM c, t ORDER BY bucket""".stripMargin,
    "q_seasonal_dow" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM orders GROUP BY 1),
        |d AS (SELECT *,
        |    CAST(((date_diff('day', DATE '2024-01-01', day) % 7) + 7) % 7 AS INT) AS dow
        |  FROM daily),
        |m AS (SELECT dow,
        |    CAST(sum(rev_cents) AS DOUBLE) / 100.0 / CAST(count(*) AS DOUBLE) AS dow_mean
        |  FROM d GROUP BY dow)
        |SELECT CAST(day AS TIMESTAMP) AS day, dow,
        |  CAST(rev_cents AS DOUBLE) / 100.0 AS revenue, dow_mean,
        |  CAST(rev_cents AS DOUBLE) / 100.0 - dow_mean AS residual
        |FROM d JOIN m USING (dow) ORDER BY day""".stripMargin,
    "q_stats_bootstrap" ->
      """WITH bs AS (SELECT unnest(range(0, 32)) AS b),
        |x AS (SELECT b, event_id, CAST(round(value*100) AS BIGINT) AS cents,
        |    CAST(CAST('0x' || substring(md5('boot' || CAST(b AS VARCHAR) || '_' || CAST(event_id AS VARCHAR)), 1, 13) AS BIGINT) AS DOUBLE)
        |      / power(16.0, 13) AS u
        |  FROM events, bs),
        |wtd AS (SELECT b, cents,
        |    CASE WHEN u < 0.36787944117144233 THEN 0
        |         WHEN u < 0.7357588823428847 THEN 1
        |         WHEN u < 0.9196986029286058 THEN 2
        |         WHEN u < 0.9810118431238462 THEN 3
        |         WHEN u < 0.9963401531726563 THEN 4
        |         WHEN u < 0.9994058151824183 THEN 5
        |         WHEN u < 0.9999167588507119 THEN 6
        |         ELSE 7 END AS w
        |  FROM x)
        |SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
        |  CAST(sum(w * cents) AS BIGINT) AS sum_cents,
        |  CAST(CAST(sum(w * cents) AS VARCHAR) AS DOUBLE)
        |    / CAST(sum(w) AS DOUBLE) / 100.0 AS mean_value
        |FROM wtd GROUP BY b ORDER BY b""".stripMargin,
    "q_stats_cov" ->
      """WITH b AS (SELECT CAST(round(l_quantity) AS HUGEINT) AS x,
        |    CAST(round(l_extendedprice*100) AS HUGEINT) AS y,
        |    CAST(round(l_discount*100) AS HUGEINT) AS z FROM lineitem),
        |g AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
        |    sum(x*x) AS sxx, sum(x*y) AS sxy, sum(x*z) AS sxz,
        |    sum(y*y) AS syy, sum(y*z) AS syz, sum(z*z) AS szz FROM b)
        |SELECT var_a, var_b,
        |  CAST(CAST(CAST(n AS HUGEINT)*sab - sa*sb AS VARCHAR) AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS cov,
        |  CAST(n AS BIGINT) AS n
        |FROM g, LATERAL (VALUES
        |  ('qty','qty', sxx, sx, sx), ('qty','price', sxy, sx, sy),
        |  ('qty','disc', sxz, sx, sz), ('price','price', syy, sy, sy),
        |  ('price','disc', syz, sy, sz), ('disc','disc', szz, sz, sz))
        |  AS v(var_a, var_b, sab, sa, sb)""".stripMargin,
    "q_stats_mwu" ->
      """WITH f AS (SELECT event_type, CAST(floor(value*100) AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('view','click')),
        |cells AS (SELECT cents,
        |  CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |  CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM f GROUP BY cents),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM cells),
        |c AS (SELECT cents, ca, cb,
        |  CAST(sum(ca+cb) OVER (ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - (ca+cb) AS BIGINT) AS excl
        |  FROM cells),
        |u AS (SELECT na, nb,
        |  CAST(sum(ca*(excl*2 + ca + cb + 1)) - na*(na+1) AS BIGINT) AS u2_a
        |  FROM c, tot GROUP BY na, nb)
        |SELECT na, nb, u2_a,
        |  CAST(u2_a AS DOUBLE) / (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS auc
        |FROM u""".stripMargin,
    // 41 FIR terms generated, not hand-written, so the weight ladder
    // cannot drift from the Spark side's (1L << (40-k))
    "q_stats_ewma" -> {
      def terms(c: String): String = (0 to 40).map { k =>
        s"CAST(coalesce(lag($c, $k) OVER win, 0) AS HUGEINT) * ${1L << (40 - k)}"
      }.mkString(" + ")
      s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
         |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev,
         |  1 AS one FROM orders GROUP BY day),
         |f AS (SELECT day, rev, ${terms("rev")} AS num,
         |  ${terms("one")} AS den
         |  FROM daily WINDOW win AS (ORDER BY day))
         |SELECT CAST(day AS TIMESTAMP) AS day,
         |  CAST(rev AS DOUBLE) / 100 AS revenue,
         |  CAST(CAST(num AS VARCHAR) AS DOUBLE) / CAST(den AS DOUBLE) / 100.0 AS ewma_05
         |FROM f ORDER BY day""".stripMargin
    },
    "q_stats_autocorr" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY day),
        |p AS (SELECT rev, lead(rev, 1) OVER (ORDER BY day) AS next FROM daily),
        |g AS (SELECT count(*) AS n,
        |  CAST(sum(rev) AS BIGINT) AS sx, CAST(sum(next) AS BIGINT) AS sy,
        |  sum(CAST(rev AS HUGEINT)*rev) AS sx2,
        |  sum(CAST(next AS HUGEINT)*next) AS sy2,
        |  sum(CAST(rev AS HUGEINT)*next) AS sxy
        |  FROM p WHERE next IS NOT NULL),
        |m AS (SELECT n,
        |  CAST(sx AS DOUBLE)/CAST(n AS DOUBLE) AS mx,
        |  CAST(sy AS DOUBLE)/CAST(n AS DOUBLE) AS my,
        |  CAST(sx2 AS DOUBLE)/CAST(n AS DOUBLE)
        |    - (CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) AS vx,
        |  CAST(sy2 AS DOUBLE)/CAST(n AS DOUBLE)
        |    - (CAST(sy AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)) AS vy,
        |  CAST(sxy AS DOUBLE)/CAST(n AS DOUBLE)
        |    - (CAST(sx AS DOUBLE)/CAST(n AS DOUBLE))*(CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)) AS cov
        |  FROM g)
        |SELECT n, cov / (sqrt(vx) * sqrt(vy)) AS lag1_autocorr FROM m""".stripMargin,
    "q_stats_ks" ->
      """WITH f AS (SELECT event_type, CAST(floor(value*100) AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('view','click')),
        |cells AS (SELECT cents,
        |  CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |  CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM f GROUP BY cents),
        |tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM cells),
        |c AS (SELECT cents,
        |  CAST(sum(ca) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_a,
        |  CAST(sum(cb) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b
        |  FROM cells)
        |SELECT na, nb,
        |  CAST(max(abs(nb*cum_a - na*cum_b)) AS BIGINT) AS ks_num,
        |  CAST(max(abs(nb*cum_a - na*cum_b)) AS DOUBLE)
        |    / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS ks_stat
        |FROM c, tot GROUP BY na, nb""".stripMargin,
    "q_stats_winsorize" ->
      """WITH e AS (SELECT event_type, CAST(floor(value*100) AS BIGINT) AS cents FROM events),
        |cells AS (SELECT event_type, cents, count(*) AS c FROM e GROUP BY event_type, cents),
        |x AS (SELECT event_type, cents,
        |  sum(c) OVER (PARTITION BY event_type ORDER BY cents
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  sum(c) OVER (PARTITION BY event_type) AS n
        |  FROM cells),
        |b AS (SELECT event_type,
        |  min(CASE WHEN 20*cum >= n THEN cents END) AS lo,
        |  min(CASE WHEN 20*cum >= 19*n THEN cents END) AS hi
        |  FROM x GROUP BY event_type)
        |SELECT e.event_type AS event_type, count(*) AS n,
        |  CAST(b.lo AS BIGINT) AS lo_cents, CAST(b.hi AS BIGINT) AS hi_cents,
        |  CAST(sum(greatest(b.lo, least(b.hi, e.cents))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS wins_mean_cents
        |FROM e JOIN b ON e.event_type = b.event_type
        |GROUP BY e.event_type, b.lo, b.hi ORDER BY 1""".stripMargin,
    "q_profile_columns" ->
      (Seq(
        profSql("l_returnflag", "l_returnflag"),
        profSql("l_linestatus", "l_linestatus"),
        profSql("l_quantity", "CAST(l_quantity AS BIGINT)"),
        profSql("l_orderkey", "l_orderkey"),
        profSql("l_linenumber", "CAST(l_linenumber AS BIGINT)"),
      ).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")),
    "q_asof_snapshot" ->
      """WITH e AS (SELECT user_id, event_type, ts, event_id, epoch_us(ts) AS us FROM events),
        |t AS (SELECT CAST((min(us) + max(us)) // 2 AS BIGINT) AS t_us FROM e),
        |f AS (SELECT user_id, event_type, ts,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM e, t WHERE us <= t_us)
        |SELECT user_id, event_type AS state_as_of, ts AS since
        |FROM f WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_cdc_apply" ->
      """WITH e AS (SELECT user_id, event_type, ts, event_id,
        |  CAST(floor(value*100) AS BIGINT) AS cents,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n_ops
        |  FROM events)
        |SELECT user_id, cents AS last_cents, ts AS last_ts,
        |  CAST(n_ops AS BIGINT) AS n_ops
        |FROM e WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin,
    "q_stats_moments" ->
      """WITH g AS (SELECT l_returnflag, count(*) AS n,
        |  sum(l_quantity) AS s1, sum(l_quantity*l_quantity) AS s2,
        |  sum(l_quantity*l_quantity*l_quantity) AS s3,
        |  sum(l_quantity*l_quantity*l_quantity*l_quantity) AS s4,
        |  sum(CAST(l_linenumber AS DOUBLE)) AS t1,
        |  sum(CAST(l_linenumber AS DOUBLE)*CAST(l_linenumber AS DOUBLE)) AS t2,
        |  sum(l_quantity*CAST(l_linenumber AS DOUBLE)) AS sxy
        |  FROM lineitem GROUP BY l_returnflag),
        |m AS (SELECT l_returnflag, n, s1/CAST(n AS DOUBLE) AS mean,
        |  s2/CAST(n AS DOUBLE) - (s1/CAST(n AS DOUBLE))*(s1/CAST(n AS DOUBLE)) AS m2,
        |  s3/CAST(n AS DOUBLE) - 3.0*(s1/CAST(n AS DOUBLE))*(s2/CAST(n AS DOUBLE)) + 2.0*(s1/CAST(n AS DOUBLE))*(s1/CAST(n AS DOUBLE))*(s1/CAST(n AS DOUBLE)) AS m3,
        |  s4/CAST(n AS DOUBLE) - 4.0*(s1/CAST(n AS DOUBLE))*(s3/CAST(n AS DOUBLE)) + 6.0*(s1/CAST(n AS DOUBLE))*(s1/CAST(n AS DOUBLE))*(s2/CAST(n AS DOUBLE)) - 3.0*(s1/CAST(n AS DOUBLE))*(s1/CAST(n AS DOUBLE))*(s1/CAST(n AS DOUBLE))*(s1/CAST(n AS DOUBLE)) AS m4,
        |  t1/CAST(n AS DOUBLE) AS my,
        |  t2/CAST(n AS DOUBLE) - (t1/CAST(n AS DOUBLE))*(t1/CAST(n AS DOUBLE)) AS vy,
        |  sxy/CAST(n AS DOUBLE) - (s1/CAST(n AS DOUBLE))*(t1/CAST(n AS DOUBLE)) AS cov
        |  FROM g)
        |SELECT l_returnflag, n, mean AS mean_qty, sqrt(m2) AS stddev_qty,
        |  m3/(m2*sqrt(m2)) AS skew_qty, m4/(m2*m2) - 3.0 AS kurt_qty,
        |  cov/(sqrt(m2)*sqrt(vy)) AS corr_qty_line
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_stats_linreg" ->
      """WITH g AS (SELECT l_returnflag, count(*) AS n,
        |  sum(l_quantity) AS sx, sum(l_quantity*l_quantity) AS sx2,
        |  sum(CAST(CAST(round(l_extendedprice*100) AS BIGINT) AS DOUBLE)) AS sy,
        |  sum(CAST(CAST(round(l_extendedprice*100) AS BIGINT)*CAST(round(l_extendedprice*100) AS BIGINT) AS HUGEINT)) AS sy2,
        |  sum(l_quantity*CAST(CAST(round(l_extendedprice*100) AS BIGINT) AS DOUBLE)) AS sxy
        |  FROM lineitem GROUP BY l_returnflag),
        |m AS (SELECT l_returnflag, n, sx/CAST(n AS DOUBLE) AS mx,
        |  sy/CAST(n AS DOUBLE) AS my,
        |  sx2/CAST(n AS DOUBLE) - (sx/CAST(n AS DOUBLE))*(sx/CAST(n AS DOUBLE)) AS vx,
        |  CAST(sy2 AS DOUBLE)/CAST(n AS DOUBLE) - (sy/CAST(n AS DOUBLE))*(sy/CAST(n AS DOUBLE)) AS vy,
        |  sxy/CAST(n AS DOUBLE) - (sx/CAST(n AS DOUBLE))*(sy/CAST(n AS DOUBLE)) AS cov
        |  FROM g)
        |SELECT l_returnflag, n, cov/vx AS slope_cents_per_qty,
        |  my - (cov/vx)*mx AS intercept_cents, (cov*cov)/(vx*vy) AS r2
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q_ab_ttest" ->
      """WITH g AS (SELECT event_type, count(*) AS n,
        |  sum(CAST(floor(value*100) AS DOUBLE)) AS s1,
        |  sum(CAST(floor(value*100) AS DOUBLE)*CAST(floor(value*100) AS DOUBLE)) AS s2
        |  FROM events GROUP BY event_type),
        |st AS (SELECT event_type, n, s1/CAST(n AS DOUBLE) AS mean,
        |  (s2 - (s1*s1)/CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS vr
        |  FROM g)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  (a.mean - b.mean) / sqrt(a.vr/CAST(a.n AS DOUBLE) + b.vr/CAST(b.n AS DOUBLE)) AS t_stat,
        |  ((a.vr/CAST(a.n AS DOUBLE) + b.vr/CAST(b.n AS DOUBLE))*(a.vr/CAST(a.n AS DOUBLE) + b.vr/CAST(b.n AS DOUBLE))) /
        |    ((a.vr/CAST(a.n AS DOUBLE))*(a.vr/CAST(a.n AS DOUBLE))/(CAST(a.n AS DOUBLE)-1.0) +
        |     (b.vr/CAST(b.n AS DOUBLE))*(b.vr/CAST(b.n AS DOUBLE))/(CAST(b.n AS DOUBLE)-1.0)) AS welch_df
        |FROM st a JOIN st b ON a.event_type < b.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    "q_anomaly_zscore" ->
      """WITH g AS (SELECT event_type, count(*) AS n,
        |  sum(CAST(floor(value*100) AS DOUBLE)) AS s1,
        |  sum(CAST(floor(value*100) AS DOUBLE)*CAST(floor(value*100) AS DOUBLE)) AS s2
        |  FROM events GROUP BY event_type),
        |st AS (SELECT event_type, s1/CAST(n AS DOUBLE) AS mean,
        |  sqrt(s2/CAST(n AS DOUBLE) - (s1/CAST(n AS DOUBLE))*(s1/CAST(n AS DOUBLE))) AS sd
        |  FROM g)
        |SELECT e.event_id, e.event_type, e.value,
        |  (CAST(floor(e.value*100) AS DOUBLE) - st.mean) / st.sd AS z
        |FROM events e JOIN st ON e.event_type = st.event_type
        |WHERE st.sd > 0
        |  AND abs((CAST(floor(e.value*100) AS DOUBLE) - st.mean) / st.sd) >= 3.0
        |ORDER BY event_id""".stripMargin,
    "q_stats_chi2" ->
      """WITH b AS (SELECT event_type,
        |  CASE WHEN floor(value*100) < 10000 THEN 'low'
        |       WHEN floor(value*100) < 30000 THEN 'mid'
        |       ELSE 'high' END AS band FROM events),
        |cells AS (SELECT event_type, band, count(*) AS o FROM b GROUP BY event_type, band),
        |dims AS (SELECT count(DISTINCT event_type) AS n_types,
        |  count(DISTINCT band) AS n_bands, CAST(sum(o) AS BIGINT) AS n FROM cells),
        |x AS (SELECT cells.event_type, cells.band, cells.o,
        |  dims.n_types, dims.n_bands, dims.n,
        |  CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS row_n,
        |  CAST(sum(o) OVER (PARTITION BY band) AS BIGINT) AS col_n
        |  FROM cells, dims),
        |y AS (SELECT *,
        |  ((CAST(o AS DOUBLE) - (CAST(row_n AS DOUBLE)*CAST(col_n AS DOUBLE))/CAST(n AS DOUBLE))
        |   * (CAST(o AS DOUBLE) - (CAST(row_n AS DOUBLE)*CAST(col_n AS DOUBLE))/CAST(n AS DOUBLE)))
        |  / ((CAST(row_n AS DOUBLE)*CAST(col_n AS DOUBLE))/CAST(n AS DOUBLE)) AS term
        |  FROM x),
        |z AS (SELECT *, sum(term) OVER (ORDER BY event_type, band
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |  row_number() OVER (ORDER BY event_type DESC, band DESC) AS rn FROM y)
        |SELECT round(cum, 6) AS chi2,
        |  CAST((n_types - 1) * (n_bands - 1) AS BIGINT) AS dof,
        |  n AS n_events
        |FROM z WHERE rn = 1""".stripMargin,
    "q_anomaly_mad" ->
      """WITH c AS (SELECT event_id, event_type, value,
        |  CAST(floor(value*100) AS BIGINT) AS cents FROM events),
        |m AS (SELECT event_type, quantile_cont(cents, 0.5) AS med FROM c GROUP BY event_type),
        |d AS (SELECT c.event_id, c.event_type, c.value,
        |  abs(CAST(c.cents AS DOUBLE) - m.med) AS adev
        |  FROM c JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM d GROUP BY event_type)
        |SELECT event_id, event_type, value, adev / (1.4826 * mad) AS mad_score
        |FROM d JOIN md USING (event_type)
        |WHERE mad > 0 AND adev / (1.4826 * mad) >= 3.0
        |ORDER BY event_id""".stripMargin,
    "q_hist_bins" ->
      """WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders),
        |b AS (SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo)/20.0)) AS BIGINT), 19) AS bin,
        |  lo, hi FROM orders, mm)
        |SELECT CAST(bin AS INT) AS bin,
        |  min(lo) + ((max(hi) - min(lo))/20.0)*CAST(CAST(bin AS INT) AS DOUBLE) AS bin_lo,
        |  count(*) AS n
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "q_scd2" ->
      """WITH x AS (SELECT user_id, event_type, ts, event_id,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (SELECT user_id, event_type, ts, event_id FROM x
        |  WHERE prev_type IS NULL OR event_type <> prev_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  CAST(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS INT) AS is_current
        |FROM c ORDER BY user_id, valid_from""".stripMargin,
  )
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream join (the remaining Structured Streaming join shape
  * after the windowed-agg / sessionization / dedup family): click
  * attribution — each click joins the views of the SAME user that
  * happened at most `horizon` before it.
  *
  * Both sides carry a watermark and the join condition bounds event-time
  * distance, so the state store retains each side only within the
  * watermark + horizon window: on an unbounded 100 TB/day feed, state is
  * proportional to the horizon's traffic, never to history. Without the
  * time-range condition Spark would (correctly) refuse to run the inner
  * join unbounded.
  *
  * The registered batch form is what the stream converges to once the
  * watermark passes — one equi-key shuffle on user_id with the range
  * predicate applied inside the sorted join; per-user fanout is bounded
  * by the user's activity within the horizon, not the corpus.
  * StreamJoinSpec replays micro-batched files through the streaming form
  * and asserts it emits exactly the batch result.
  */
object StreamJoin {

  /** Streaming attribution: views and clicks are separate watermarked
    * streams; emit (view, click) pairs with the click at most `horizon`
    * after the view. */
  def attribute(views: DataFrame, clicks: DataFrame,
      delay: String, horizon: String = "10 minutes"): DataFrame = {
    val v = views.select(col("event_id").as("view_id"),
      col("user_id"), col("ts").as("vts")).withWatermark("vts", delay)
    val c = clicks.select(col("event_id").as("click_id"),
      col("user_id"), col("ts").as("cts")).withWatermark("cts", delay)
    v.join(c,
      v("user_id") === c("user_id") &&
        col("cts") >= col("vts") &&
        col("cts") <= col("vts") + expr(s"INTERVAL $horizon"))
      .select(col("view_id"), col("click_id"), v("user_id").as("user_id"),
        (unix_micros(col("cts")) - unix_micros(col("vts"))).as("delay_us"))
  }

  /** Batch replay of the attribution join — oracle-checked. */
  def qStreamJoin(s: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.events(s, dir)
    val views = e.filter(col("event_type") === "view")
    val clicks = e.filter(col("event_type") === "click")
    attribute(views, clicks, delay = "0 seconds", horizon = "1 hour")
      .orderBy("view_id", "click_id")
  }

  // --- Stream-static enrichment ---------------------------------------

  /** Attach the static customer segment to each event: a stream-static
    * broadcast join on a derived dimension key. Stream-static inner joins
    * are STATELESS in Structured Streaming — no watermark, no state
    * store; the dimension broadcasts to every micro-batch, which is
    * exactly how a 100 TB/day event feed joins a dimension table without
    * shuffling the feed. */
  def enriched(ev: DataFrame, cust: DataFrame): DataFrame =
    ev.withColumn("cust_id", col("user_id") % 100)
      .join(broadcast(cust.select(col("c_custkey").as("cust_id"),
        col("c_mktsegment"))), "cust_id")

  /** Hourly revenue per market segment over the enriched feed (shared by
    * the batch-oracle form and the streaming form). */
  def segmentRevenue(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        (sum(graft.Tables.cents(col("value"))).cast("double") / 100)
          .as("sum_value"))
      .select(col("window.start").as("window_start"), col("c_mktsegment"),
        col("n"), col("sum_value"))

  /** Batch form of the stream-static enrichment — oracle-checked. */
  def qStreamEnrich(s: SparkSession, dir: String): DataFrame =
    segmentRevenue(enriched(graft.Tables.events(s, dir),
      graft.Tables.customer(s, dir)))
      .orderBy("window_start", "c_mktsegment")

  /** Streaming form: micro-batched event files against the static
    * dimension (StreamJoinSpec asserts it converges to the batch form). */
  def enrichStream(s: SparkSession, dir: String): DataFrame =
    segmentRevenue(enriched(EventWindows.eventsStream(s, dir),
      graft.Tables.customer(s, dir)))

  /** Streaming anomaly alerter: the per-type profile computed from the
    * batch table ("yesterday's log") broadcasts onto the live stream;
    * each micro-batch is a stateless ≥3σ gate — no watermark, no state
    * store, alert latency = trigger interval. StreamJoinSpec asserts the
    * streamed alerts equal the batch detector's output exactly. */
  def anomalyStream(s: SparkSession, dir: String): DataFrame =
    graft.operators.Stats.flagOutliers(
      EventWindows.eventsStream(s, dir),
      graft.operators.Stats.typeProfile(graft.Tables.events(s, dir)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_join" -> qStreamJoin,
    "q_stream_enrich" -> qStreamEnrich,
  )

  val oracles: Map[String, String] = Map(
    "q_stream_join" ->
      """WITH v AS (SELECT event_id AS view_id, user_id, ts AS vts FROM events WHERE event_type = 'view'),
        |c AS (SELECT event_id AS click_id, user_id, ts AS cts FROM events WHERE event_type = 'click')
        |SELECT view_id, click_id, user_id,
        |  epoch_us(cts) - epoch_us(vts) AS delay_us
        |FROM v JOIN c USING (user_id)
        |WHERE cts >= vts AND cts <= vts + INTERVAL 1 HOUR
        |ORDER BY view_id, click_id""".stripMargin,
    "q_stream_enrich" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, c_mktsegment,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100 AS sum_value
        |FROM events JOIN customer ON c_custkey = user_id % 100
        |GROUP BY window_start, c_mktsegment
        |ORDER BY window_start, c_mktsegment""".stripMargin,
  )
}

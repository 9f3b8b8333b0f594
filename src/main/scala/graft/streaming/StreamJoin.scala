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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_join" -> qStreamJoin,
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
  )
}

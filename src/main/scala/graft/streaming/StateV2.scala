package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

import graft.Tables._

/** The Spark 4 arbitrary-state API (`transformWithState` /
  * `StatefulProcessor` — the successor to `flatMapGroupsWithState`,
  * SPARK-46815): the per-user running-totals stream re-expressed
  * against the new surface, kept semantically identical to
  * [[EventWindows.userTotalsStream]] so the spec can assert
  * old-API == new-API == batch.
  *
  * What the new API buys at 100 TB of stream state: named, TYPED state
  * variables (`ValueState`/`ListState`/`MapState`) instead of one
  * opaque tuple — the store can evolve per-variable, supports TTL
  * per state (not per key), and composes with timers without
  * `GroupStateTimeout` overloading. Requires the RocksDB state store
  * provider (the JVM-heap store does not implement the new operator's
  * column families) — the spec sets
  * `spark.sql.streaming.stateStore.providerClass` accordingly, which
  * is ALSO the provider a 100 TB deployment runs (heap state at that
  * scale is an OOM, not an option). */
object StateV2 {

  class UserTotalsProcessor
      extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
      val (n0, v0) = if (totals.exists()) totals.get() else (0L, 0L)
      var n = n0
      var v = v0
      rows.foreach { case (_, cents) => n += 1; v += cents }
      totals.update((n, v))
      Iterator((user, n, v))
    }
  }

  /** [[EventWindows.userTotalsStream]] on the transformWithState API:
    * one (count, cents) ValueState per user, emitted on every update —
    * state bounded by key cardinality, exactly like the fMGS form. */
  def userTotalsStreamTws(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val typed = EventWindows.eventsStream(s, dir)
      .select(col("user_id"), cents(col("value")).as("value_cents"))
      .as[(Long, Long)]
    typed.groupByKey(_._1)
      .transformWithState(new UserTotalsProcessor,
        TimeMode.None(), OutputMode.Update(),
        Encoders.product[(Long, Long, Long)])
      .toDF("user_id", "n_events", "total_cents")
  }
}

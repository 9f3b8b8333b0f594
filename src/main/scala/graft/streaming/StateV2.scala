package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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
      // ONE store lookup (r22): get() returns null when the key is
      // absent, so exists()+get() — two full store gets per key per
      // batch — collapses to one call (the ScrapeTws discipline).
      val (n0, v0) = Option(totals.get()).getOrElse((0L, 0L))
      var n = n0
      var v = v0
      rows.foreach { case (_, cents) => n += 1; v += cents }
      totals.update((n, v))
      Iterator((user, n, v))
    }
  }

  /** Timer-driven sessionizer — the capability that genuinely NEEDS the
    * new API: event-time TIMERS close idle sessions without waiting for
    * the user's next event (fMGS could only approximate this with
    * per-key timeout modes). Sessions that ROLL (a new event beyond the
    * gap) close inline in `handleInputRows`; sessions that go IDLE
    * close in `handleExpiredTimer` when the watermark passes
    * last + gap. Stale timers (from since-extended sessions) fire
    * harmlessly: the expiry-vs-current-state guard ignores them.
    * State per user = one open-session tuple; timers per user ≤ events
    * — both watermark-bounded.
    *
    * Input rows arrive UNORDERED within a micro-batch, so the handler
    * sorts its per-key batch slice by timestamp before the
    * gaps-and-islands fold (bounded by the per-key batch volume). */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, (Long, Long, Long),
        (Long, Long, Long, Long, Long)] {
    // open session: (start_ms, last_ms, n_events, cents)
    @transient private var open: ValueState[(Long, Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[(Long, Long, Long, Long)]("open",
        Encoders.product[(Long, Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, Long)], timerValues: TimerValues)
        : Iterator[(Long, Long, Long, Long, Long)] = {
      val evs = rows.toSeq.sortBy(_._2)
      var closed = List.empty[(Long, Long, Long, Long)]
      val before = Option(open.get()) // null = absent; single lookup
      var st = before
      evs.foreach { case (_, ts, c) =>
        st = st match {
          // within gap of the open session on EITHER side (out-of-order
          // events extend the start backward, not just the end forward)
          case Some((s0, l0, n0, c0))
              if ts >= s0 - gapMs && ts <= l0 + gapMs =>
            Some((math.min(ts, s0), math.max(ts, l0), n0 + 1, c0 + c))
          // past the gap forward: the open session is complete
          case Some(done) if ts > done._2 + gapMs =>
            closed ::= done
            Some((ts, ts, 1L, c))
          // an out-of-order event OLDER than start − gap: it belongs to
          // an already-gone earlier session; emit it as its own closed
          // session (exact retro-merging would need buffering the full
          // watermark horizon — disorder beyond the gap but inside the
          // watermark is the one shape this operator approximates)
          case Some(keep) =>
            closed ::= ((ts, ts, 1L, c))
            Some(keep)
          case None => Some((ts, ts, 1L, c))
        }
      }
      st.foreach { sess =>
        open.update(sess)
        // keep timer state O(keys): retire the previous deadline before
        // arming the new one (a stale timer would fire harmlessly into
        // the expiry guard, but at stream scale they accumulate per
        // extension, not per key)
        before.foreach { prev =>
          if (prev._2 != sess._2) getHandle.deleteTimer(prev._2 + gapMs)
        }
        getHandle.registerTimer(sess._2 + gapMs)
      }
      closed.reverse.iterator
        .map(t => (user, t._1, t._2, t._3, t._4))
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo)
        : Iterator[(Long, Long, Long, Long, Long)] = {
      val cur = open.get() // null = absent; single lookup
      if (cur != null) {
        val (s0, l0, n0, c0) = cur
        // only close if THIS timer corresponds to the current session's
        // idle deadline (stale timers from extended sessions are older)
        if (expiredTimerInfo.getExpiryTimeInMs() >= l0 + gapMs) {
          open.clear()
          Iterator((user, s0, l0, n0, c0))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** The sessionizer over an arbitrary streaming frame with columns
    * (user_id long, ts timestamp, value_cents long) — source-agnostic
    * core shared with the out-of-order spec so the tested semantics
    * ARE the shipped ones. */
  def sessionizeTws(s: SparkSession, src: DataFrame,
      gapMs: Long = 600000L): DataFrame = {
    import s.implicits._
    val typed = src
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        col("value_cents"))
      .as[(Long, Long, Long)]
    typed.groupByKey(_._1)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append(),
        Encoders.product[(Long, Long, Long, Long, Long)])
      .toDF("user_id", "start_ms", "last_ms", "n_events", "cents")
  }

  /** 10-minute-gap sessionization on transformWithState with event-time
    * timers; output (user_id, start_ms, last_ms, n_events, cents). */
  def sessionStreamTws(s: SparkSession, dir: String): DataFrame =
    sessionizeTws(s, EventWindows.eventsStream(s, dir)
      .select(col("user_id"), col("ts"),
        cents(col("value")).as("value_cents")))

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

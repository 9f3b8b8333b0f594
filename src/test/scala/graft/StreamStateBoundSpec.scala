package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamBench

/** State-store boundedness per scale axis (VERDICT r8 #4).
  *
  * The 100 TB streaming claim is that state never scales with raw input:
  *  - windowed aggregates / dedup state scale with span × key universe,
  *    so ×10 the event RATE over the same span and keys must leave state
  *    rows (measured from the engine's own StateOperatorProgress)
  *    essentially unchanged;
  *  - stream-stream join state scales with rate × watermark horizon, so
  *    ×10 the HISTORY at the same rate must leave state rows essentially
  *    unchanged (the buffered window slides, it does not accumulate).
  *
  * Both assertions use a 2× tolerance against a 10× input growth: the
  * micro-batch boundaries shift slightly between runs, so exact equality
  * is brittle, but anything approaching linear growth fails loudly.
  */
class StreamStateBoundSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft_state_bound").toString

  // ×10 RATE: same 4 h span, same 200 users (800 dedup keys), same 4
  // micro-batch boundaries in event time — only the rows-per-window grow.
  private lazy val (rate1, rate10) = {
    val d1 = freshDir(); val d10 = freshDir()
    StreamBench.writeStreamDir(spark, d1, nRows = 4000L, nFiles = 4,
      spanMinutes = 240L, nUsers = 200L)
    StreamBench.writeStreamDir(spark, d10, nRows = 40000L, nFiles = 4,
      spanMinutes = 240L, nUsers = 200L)
    (d1, d10)
  }

  private def stateRows(dir: String, op: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame, mode: String): Long = {
    val st = StreamBench.runOp(spark, op(StreamBench.sourceStream(spark, dir)), mode)
    assert(st.rows > 0, "stream processed no rows")
    st.stateRows
  }

  test("tumbling aggregate state is rate-invariant (windows × types, not rows)") {
    val s1 = stateRows(rate1, StreamBench.tumbling, "update")
    val s10 = stateRows(rate10, StreamBench.tumbling, "update")
    assert(s1 > 0)
    assert(s10 <= s1 * 2, s"state grew ${s10}/${s1} under x10 rate")
  }

  test("session window state is rate-invariant (bounded by open sessions per user)") {
    // session-window streaming aggregation only supports append/complete
    val s1 = stateRows(rate1, StreamBench.session, "append")
    val s10 = stateRows(rate10, StreamBench.session, "append")
    assert(s1 > 0)
    assert(s10 <= s1 * 2, s"state grew ${s10}/${s1} under x10 rate")
  }

  test("dedup state is rate-invariant (bounded by key universe in horizon)") {
    val s1 = stateRows(rate1, StreamBench.dedup, "append")
    val s10 = stateRows(rate10, StreamBench.dedup, "append")
    assert(s1 > 0)
    assert(s10 <= s1 * 2, s"state grew ${s10}/${s1} under x10 rate")
  }

  test("stream-stream join state is history-invariant (rate × horizon, not history)") {
    // same RATE (100 rows/min), ×10 the SPAN: 1 h vs 10 h of history.
    // Micro-batch width is held at 30 min of event time on both sides
    // (state eviction runs at batch boundaries, so a 10×-wider final
    // batch would inflate the long run's resident state mechanically).
    val d1 = freshDir(); val d10 = freshDir()
    StreamBench.writeStreamDir(spark, d1, nRows = 6000L, nFiles = 2,
      spanMinutes = 60L, nUsers = 200L)
    StreamBench.writeStreamDir(spark, d10, nRows = 60000L, nFiles = 20,
      spanMinutes = 600L, nUsers = 200L)
    val s1 = stateRows(d1, StreamBench.intervalJoin, "append")
    val s10 = stateRows(d10, StreamBench.intervalJoin, "append")
    assert(s1 > 0)
    assert(s10 <= s1 * 2, s"join state grew ${s10}/${s1} under x10 history")
  }
}

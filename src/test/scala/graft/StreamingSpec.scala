package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventWindows

/** Streaming forms must agree with their batch-replay oracles: the same
  * windowed aggregation through readStream + watermark + memory sink
  * equals the batch query (no late data in replay, so watermarking drops
  * nothing). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming tumbling agg equals batch replay") {
    val streamed = EventWindows.runToCompletion(spark,
      EventWindows.tumblingStream(spark, TestSpark.sf0001), "t_tumbling")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventWindows.qTumbling(spark, TestSpark.sf0001)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }

  test("streaming session windows equal batch replay") {
    val streamed = EventWindows.runToCompletion(spark,
      EventWindows.sessionStream(spark, TestSpark.sf0001), "t_session")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = EventWindows.qSession(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed == batch)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventWindows

class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("watermarked stream-stream join equals batch replay") {
    val q = EventWindows.purchaseSignupJoinStream(spark, TestSpark.sf0001)
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("ssj_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    val batch = EventWindows.purchaseSignupJoinBatch(spark, TestSpark.sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaBlob, MediaFeatures}

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("fakeDecode: deterministic, histogram accounts for every byte") {
    val blob = MediaBlob(7L, "x.png", "hello world!".getBytes("UTF-8"))
    val f1 = Multimodal.fakeDecode(blob)
    val f2 = Multimodal.fakeDecode(blob)
    assert(f1.histogram.toSeq == f2.histogram.toSeq)
    assert(f1.histogram.sum == blob.content.length)
    assert(f1.n_bytes == 12 && f1.width == 16 && f1.height == 1)
    assert(f1.frame_samples.head == 'h'.toInt)
  }

  test("decode query: one feature row per document, bytes preserved") {
    val feats = Multimodal.qMultimodalDecode(spark, TestSpark.sf0001).collect()
    val meta = Multimodal.qMultimodalMeta(spark, TestSpark.sf0001).collect()
    assert(feats.length == meta.length)
    val metaBytes = meta.map(r => r.getLong(0) -> r.getInt(2)).toMap
    feats.foreach { r =>
      assert(r.getInt(1) == metaBytes(r.getLong(0)))
      // histogram_csv is the serialized 16-bucket histogram; buckets sum to n_bytes
      assert(r.getString(4).split(",").map(_.toLong).sum == r.getInt(1).toLong)
    }
  }
}

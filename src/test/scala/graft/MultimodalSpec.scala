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

  test("fakeResize: block averages computed exactly, empty blocks zero") {
    // 32 bytes = a 16-wide, 2-row "image"; 4×4 grid over 2 rows means the
    // y-blocks collapse pairwise onto the two source rows
    val bytes = (0 until 32).map(_.toByte).toArray
    val t = Multimodal.fakeResize(MediaBlob(1L, "x.png", bytes))
    assert(t.length == 16)
    // row 0 of the thumb = averages of bytes 0..15 in blocks of 4:
    // (0+1+2+3)/4=1, (4..7)/4=5, 9, 13
    assert(t.slice(0, 4).toSeq == Seq(1, 5, 9, 13))
    // determinism + clamp range
    assert(t.toSeq == Multimodal.fakeResize(MediaBlob(1L, "x.png", bytes)).toSeq)
    assert(t.forall(v => v >= 0 && v <= 255))
    assert(Multimodal.fakeResize(MediaBlob(2L, "y.png", Array.empty[Byte])).toSeq ==
      Seq.fill(16)(0))
  }

  test("resize query: one thumbnail row per document, fixed 16-value grid") {
    val rows = Multimodal.qMultimodalResize(spark, TestSpark.sf0001).collect()
    val n = Tables.documents(spark, TestSpark.sf0001).count()
    assert(rows.length == n)
    rows.foreach { r =>
      val t = r.getString(2).split(",").map(_.toInt)
      assert(t.length == 16)
      assert(t.forall(v => v >= 0 && v <= 255))
    }
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

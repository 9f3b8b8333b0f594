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

  test("embed query: stub embeddings are unit vectors; top-k matches an exact in-memory recompute") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toMap
    def embed(bytes: Array[Byte]): Array[Double] = {
      val h = new Array[Double](16)
      bytes.foreach(b => h((b & 0xFF) >> 4) += 1d)
      val n = math.sqrt(h.map(x => x * x).sum)
      if (n == 0) h else h.map(_ / n)
    }
    val embs = docs.view.mapValues(embed).toMap
    embs.values.foreach { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9)
    }
    // left-to-right cosine fold, identical to the codegen kernel's order
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // the query ranks the 6-dp-rounded cosine (so near-1 kernel/DuckDB
    // ulp differences tie instead of ordering differently) — mirror that
    def r6(v: Double): Double =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = embs.keys.filter(_ % 100 == 0).toSeq.sorted.flatMap { p =>
      embs.toSeq.filter(_._1 != p)
        .map { case (id, v) => (r6(cos(embs(p), v)), id) }
        .sortBy { case (c, id) => (-c, id) }.take(5).zipWithIndex
        .map { case ((c, id), i) => (p, id, c, i + 1) }
    }
    val got = Multimodal.qMultimodalEmbed(spark, TestSpark.sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(got == expected)
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

package graft

import java.math.BigInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MomentAgg, MomentBuf}

/** The 128-bit (hi, lo) limb arithmetic inside [[MomentAgg]] is the one
  * place the engine hand-rolls multi-precision integers — q_emb_pca's
  * oracle only exercises it on the fixture's value range, so this spec
  * drives carries and sign handling adversarially: seeded random
  * vectors with coordinates up to ±2³¹ (products up to ~4.6e18, within
  * two terms of wrapping a 64-bit accumulator), folded through
  * `reduce` into several partial buffers and `merge`d in random order,
  * must reproduce exact BigInteger sums in EVERY triangle cell. */
class MomentAggPropertySpec extends AnyFunSuite {

  private def referenceCells(vecs: Seq[Array[Long]], d: Int)
      : (Array[BigInteger], Array[BigInteger]) = {
    val s = Array.fill(d)(BigInteger.ZERO)
    val cells = Array.fill(d * (d + 1) / 2)(BigInteger.ZERO)
    vecs.foreach { q =>
      var j = 0
      var idx = 0
      while (j < d) {
        s(j) = s(j).add(BigInteger.valueOf(q(j)))
        var k = j
        while (k < d) {
          cells(idx) = cells(idx).add(
            BigInteger.valueOf(q(j)).multiply(BigInteger.valueOf(q(k))))
          idx += 1
          k += 1
        }
        j += 1
      }
    }
    (s, cells)
  }

  test("reduce+merge reproduce exact BigInteger sums under adversarial carries") {
    for (seed <- Seq(1, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val d = 6
      val vecs = (0 until 400).map { _ =>
        Array.fill(d)((rnd.nextLong() % (1L << 31)))
      }
      val agg = new MomentAgg
      // fold into several partial buffers (as Spark's partial aggregate
      // would), then merge in shuffled order
      val parts = vecs.grouped(37).map(chunk =>
        chunk.foldLeft(agg.zero)((b, v) =>
          agg.reduce(b, scala.collection.immutable.ArraySeq.unsafeWrapArray(v))))
        .toSeq
      val merged = rnd.shuffle(parts).reduceLeft(agg.merge)
      val fin: MomentBuf = agg.finish(merged)
      val (refS, refCells) = referenceCells(vecs, d)
      assert(fin.n == vecs.size.toLong)
      (0 until d).foreach { j =>
        assert(BigInteger.valueOf(fin.s(j)) == refS(j), s"seed $seed s($j)")
      }
      refCells.indices.foreach { idx =>
        assert(MomentAgg.cellValue(fin.hi(idx), fin.lo(idx)) == refCells(idx),
          s"seed $seed cell $idx")
      }
    }
  }

  test("single-cell carries: alternating extreme products stay exact") {
    // ±(2³¹−1)² products alternate signs so lo crosses the carry
    // boundary repeatedly — the pattern most likely to expose a
    // sign-extension or carry bug in add128
    val agg = new MomentAgg
    val big = (1L << 31) - 1
    val vecs = (0 until 1001).map(i =>
      Array(if (i % 2 == 0) big else -big))
    val buf = vecs.foldLeft(agg.zero)((b, v) =>
      agg.reduce(b, scala.collection.immutable.ArraySeq.unsafeWrapArray(v)))
    val (refS, refCells) = referenceCells(vecs, 1)
    assert(BigInteger.valueOf(buf.s(0)) == refS(0))
    assert(MomentAgg.cellValue(buf.hi(0), buf.lo(0)) == refCells(0))
  }

  test("mixed-dimension input fails loudly") {
    val agg = new MomentAgg
    val b = agg.reduce(agg.zero,
      scala.collection.immutable.ArraySeq(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      agg.reduce(b, scala.collection.immutable.ArraySeq(1L, 2L))
    }
    val other = agg.reduce(agg.zero,
      scala.collection.immutable.ArraySeq(1L, 2L))
    intercept[IllegalArgumentException] { agg.merge(b, other) }
  }
}

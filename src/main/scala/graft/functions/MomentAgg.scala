package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass exact second-moment accumulator for [[Similarity.qEmbPca]]:
  * per input vector q (quantized integer embedding, dimension d) it folds
  * the count n, the per-coordinate sums Σqⱼ, and the full upper-triangle
  * cross-product sums Σqⱼqₖ (d·(d+1)/2 cells) into ONE fixed-size buffer.
  *
  * Scale rationale vs the explode formulation this replaces (VERDICT r10
  * #2): exploding the upper triangle materializes d·(d+1)/2 = 2 080 rows
  * per input row before the partial aggregate gets to fold them — a
  * 2 080× row inflation in the map stage. This Aggregator's buffer IS the
  * partial aggregate: each task folds its rows into one 2 080-cell array
  * and the shuffle carries exactly one buffer per partition. Same
  * map-side-combine endpoint, none of the intermediate row traffic.
  *
  * Exactness: cross-product sums are 128-bit signed integers held as
  * (hi, lo) limb pairs — per-term |qⱼqₖ| ≤ 1e8, so a 64-bit sum wraps
  * past ~9e10 rows (≈ 25 TB of 64-dim floats), inside this engine's
  * design envelope; 128-bit is exact past 1e27 rows. Per-coordinate sums
  * stay 64-bit (|qⱼ| ≤ ~1e4 ⇒ exact to ~9e14 rows) behind
  * `Math.addExact`, which fails loudly rather than wrapping silently.
  * The finished sums convert to the oracle's value space via
  * BigInteger→string→double — the same exactly-parsed-string cast DuckDB
  * applies to its HUGEINT sums, so both engines see bit-identical
  * covariance inputs.
  *
  * Buffers are mutated in place: Spark's `ScalaAggregator` is a
  * `TypedImperativeAggregate`, so the object lives unserialized for a
  * whole partition and is only encoded for the final exchange. */
case class MomentBuf(n: Long, s: Array[Long], hi: Array[Long], lo: Array[Long])

class MomentAgg extends Aggregator[Seq[Long], MomentBuf, MomentBuf] {

  override def zero: MomentBuf =
    MomentBuf(0L, Array.empty, Array.empty, Array.empty)

  private def sized(d: Int): MomentBuf =
    MomentBuf(0L, new Array[Long](d), new Array[Long](d * (d + 1) / 2),
      new Array[Long](d * (d + 1) / 2))

  /** 128-bit (hi, lo) += signed 64-bit p, in place at cell idx. */
  @inline private def add128(hi: Array[Long], lo: Array[Long], idx: Int,
      p: Long): Unit = {
    val nlo = lo(idx) + p
    val carry = if (java.lang.Long.compareUnsigned(nlo, lo(idx)) < 0) 1L else 0L
    hi(idx) = hi(idx) + (p >> 63) + carry
    lo(idx) = nlo
  }

  override def reduce(buf0: MomentBuf, q: Seq[Long]): MomentBuf = {
    val d = q.length
    val buf = if (buf0.s.isEmpty) sized(d) else buf0
    // mixed-dimension input must fail LOUDLY (the Math.addExact
    // discipline): a shorter vector would otherwise fold cross-products
    // into the wrong triangle cells — the sequential idx layout assumes
    // the buffer's d — corrupting the covariance silently (ADVICE r11)
    require(d == buf.s.length,
      s"MomentAgg: vector dimension $d != accumulator dimension ${buf.s.length}")
    val qa = q match {
      case w: scala.collection.immutable.ArraySeq[Long @unchecked] =>
        w.unsafeArray.asInstanceOf[Array[Long]]
      case _ => q.toArray
    }
    var j = 0
    var idx = 0
    while (j < d) {
      buf.s(j) = Math.addExact(buf.s(j), qa(j))
      var k = j
      while (k < d) {
        add128(buf.hi, buf.lo, idx, qa(j) * qa(k))
        idx += 1
        k += 1
      }
      j += 1
    }
    buf.copy(n = buf.n + 1)
  }

  override def merge(a: MomentBuf, b: MomentBuf): MomentBuf =
    if (a.s.isEmpty) b
    else if (b.s.isEmpty) a
    else {
      require(a.s.length == b.s.length,
        s"MomentAgg: merging accumulators of dimension ${a.s.length} != ${b.s.length}")
      var j = 0
      while (j < a.s.length) {
        a.s(j) = Math.addExact(a.s(j), b.s(j)); j += 1
      }
      var idx = 0
      while (idx < a.lo.length) {
        val nlo = a.lo(idx) + b.lo(idx)
        val carry =
          if (java.lang.Long.compareUnsigned(nlo, a.lo(idx)) < 0) 1L else 0L
        a.hi(idx) = a.hi(idx) + b.hi(idx) + carry
        a.lo(idx) = nlo
        idx += 1
      }
      a.copy(n = a.n + b.n)
    }

  override def finish(buf: MomentBuf): MomentBuf = buf

  override def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
  override def outputEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
}

object MomentAgg {
  /** Reassemble cell idx of the upper triangle as an exact BigInteger:
    * hi·2⁶⁴ + (lo as unsigned). */
  def cellValue(hi: Long, lo: Long): BigInteger =
    BigInteger.valueOf(hi).shiftLeft(64)
      .add(new BigInteger(java.lang.Long.toUnsignedString(lo)))
}

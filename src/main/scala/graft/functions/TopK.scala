package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY §7.4): keeps the k highest-scoring
  * (score, id) pairs per group with a bounded buffer.
  *
  * Scale rationale vs the window formulation (`row_number over (order by
  * cos desc)`): the window shuffles EVERY scored pair to the probe's
  * reducer before ranking; this Aggregator reduces map-side, so each
  * partition forwards at most k pairs per group — at a 100 TB corpus with
  * thousands of partitions that is k·partitions rows per probe instead of
  * |corpus| rows per probe.
  *
  * Ordering: score descending, id ascending on ties — identical to the
  * window/oracle formulation, so results hash-match.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private val ord = Ordering.by[(Double, Long), (Double, Long)] {
    case (score, id) => (-score, id)
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  private def trim(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    if (buf.length <= 4 * k) buf else buf.sorted(ord).take(k)

  override def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    trim(buf :+ x)

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sorted(ord).take(k)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopK {
  /** UDAF form for DataFrame `agg`: call as `topK(5)(cosCol, idCol)`. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
}

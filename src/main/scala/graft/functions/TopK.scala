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

/** Typed bounded min-k aggregator: keeps the k smallest (key, id) pairs
  * per group — the map-side form of `row_number() over (order by key, id)
  * <= k`. Same scale rationale as [[TopKAgg]]: each partition forwards at
  * most k rows per group instead of the whole stratum, which is what
  * makes per-stratum quota sampling survive a pathologically hot stratum
  * at 100 TB. Ordering (key asc, id asc) matches the window/oracle
  * formulation exactly, so results hash-match. */
class MinKAgg(k: Int)
    extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {

  private val ord = Ordering.Tuple2[String, Long]

  override def zero: Seq[(String, Long)] = Vector.empty

  private def trim(buf: Seq[(String, Long)]): Seq[(String, Long)] =
    if (buf.length <= 4 * k) buf else buf.sorted(ord).take(k)

  override def reduce(buf: Seq[(String, Long)], x: (String, Long)): Seq[(String, Long)] =
    trim(buf :+ x)

  override def merge(a: Seq[(String, Long)], b: Seq[(String, Long)]): Seq[(String, Long)] =
    trim(a ++ b)

  override def finish(buf: Seq[(String, Long)]): Seq[(String, Long)] =
    buf.sorted(ord).take(k)

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

object TopK {
  /** UDAF form for DataFrame `agg`: call as `topK(5)(cosCol, idCol)`. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())

  /** UDAF form: `minK(10)(keyCol, idCol)`. */
  def minK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new MinKAgg(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(String, Long)]())
}

package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Size-capped list collection: like `collect_list`, but any group that
  * exceeds `cap` elements collapses to an EMPTY list instead of
  * materializing its full membership.
  *
  * Scale rationale (dedup posting lists): `collect_list` + `filter(size <=
  * cap)` gives the same *result*, but a pathological hot key (a shingle
  * present in millions of documents at 100 TB) materializes its entire
  * posting list in one reducer before the filter drops it — unbounded
  * reducer memory under adversarial skew. This aggregator bounds every
  * buffer at `cap` elements: once a partial exceeds the cap it degenerates
  * to a constant-size overflow marker, map-side combine included, so the
  * shuffle carries at most `cap` longs per key no matter how hot the key.
  */
class CappedListAgg(cap: Int)
    extends Aggregator[Long, (Seq[Long], Boolean), Seq[Long]] {

  override def zero: (Seq[Long], Boolean) = (Vector.empty, false)

  override def reduce(b: (Seq[Long], Boolean), x: Long): (Seq[Long], Boolean) =
    if (b._2) b
    else if (b._1.length >= cap) (Vector.empty, true)
    else (b._1 :+ x, false)

  override def merge(a: (Seq[Long], Boolean), b: (Seq[Long], Boolean)): (Seq[Long], Boolean) =
    if (a._2 || b._2 || a._1.length + b._1.length > cap) (Vector.empty, true)
    else (a._1 ++ b._1, false)

  override def finish(b: (Seq[Long], Boolean)): Seq[Long] =
    if (b._2) Vector.empty else b._1

  override def bufferEncoder: Encoder[(Seq[Long], Boolean)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Long], Boolean)]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CappedCollect {
  /** UDAF form for DataFrame `agg`: call as `cappedList(20)(idCol)`. */
  def cappedList(cap: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new CappedListAgg(cap),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Long]())
}

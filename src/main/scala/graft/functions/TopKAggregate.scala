package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-memory group-wise top-k: a typed `Aggregator` whose buffer
  * holds at most k (value, id) pairs, combined map-side before the
  * shuffle. The window-function formulation (`row_number over
  * partition order by value`) sorts every group's full row set; this
  * carries O(k) state per group through partial aggregation instead —
  * the difference between shuffling a whale group's millions of rows
  * and shuffling its k survivors.
  *
  * Ordering: higher value wins; ties break to the LOWER id (matching
  * `ORDER BY value DESC, id ASC` rank semantics).
  *
  * Ids are kept DISTINCT: a recurring id (within a batch, or across
  * micro-batches in the streaming twin — its priorities are pure
  * functions of the id) keeps only its best (value, id) entry rather
  * than occupying multiple top-k slots, so a sample-without-replacement
  * built on this never shrinks its effective size — the A-Res
  * distinct-items assumption, enforced rather than assumed.
  */
class TopKAggregate(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Vector.empty

  // buffers stay sorted (merge/reduce both emit sorted), so a full
  // buffer whose worst entry beats the incoming row is returned as-is —
  // the O(1) path taken by almost every row of a large group
  override def reduce(buf: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size >= k && better(buf.last, in)) buf
    else merge(buf, Vector(in))

  // sort first so distinctBy keeps each id's BEST entry (first occurrence)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortWith(better).distinctBy(_._2).take(k)

  override def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] =
    buf.sortWith(better)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
}

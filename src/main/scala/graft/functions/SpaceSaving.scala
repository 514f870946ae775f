package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy hitters (Metwally et al., "Efficient Computation
  * of Frequent and Top-k Elements in Data Streams", ICDT'05): a typed
  * `Aggregator` whose buffer holds at most `capacity` (key, count,
  * overestimate) counters, combined map-side before the shuffle — the
  * candidate-DISCOVERING complement of the Count-Min probe path
  * (Sketches.cmsEstimate answers "how often is key X?"; this answers
  * "which keys are frequent?" without knowing them up front).
  *
  * Guarantees (capacity m over n observed rows):
  *   - every key with true count > n/m is present in the buffer;
  *   - for present keys, count − err ≤ true ≤ count (err is the
  *     counter's inherited overestimate at takeover time);
  *   - merged buffers keep both properties (err widens by the absent
  *     side's minimum counter) — so per-partition sketches combine
  *     associatively, the property that makes this distributable
  *     (Agarwal et al., "Mergeable Summaries", PODS'12);
  *   - with ≤ capacity distinct keys no eviction ever fires: counts
  *     are EXACT and deterministic (the regime the hash-verified
  *     an_heavy_hitters query runs in).
  *
  * The output is order-DEPENDENT in its tail (which sub-threshold keys
  * occupy the low counters depends on partition order), so queries over
  * it are rows+spec, not hash-verified: SpaceSavingSpec asserts the
  * guarantees, not a fixed tail.
  */
class SpaceSaving(capacity: Int)
    extends Aggregator[Long, Map[Long, (Long, Long)], Seq[(Long, Long, Long)]] {
  require(capacity > 0)

  override def zero: Map[Long, (Long, Long)] = Map.empty

  override def reduce(buf: Map[Long, (Long, Long)], key: Long): Map[Long, (Long, Long)] =
    buf.get(key) match {
      case Some((c, e)) => buf.updated(key, (c + 1, e))
      case None if buf.size < capacity => buf.updated(key, (1L, 0L))
      case None =>
        // evict the minimum counter; the newcomer inherits its count as
        // the overestimate bound (the classic Space-Saving takeover)
        val (minKey, (minC, _)) = buf.minBy { case (k, (c, _)) => (c, k) }
        (buf - minKey).updated(key, (minC + 1, minC))
    }

  /** Counter-wise merge, then keep the `capacity` largest counters.
    * A key absent from a summary that is AT capacity may still have
    * appeared in that substream up to its minimum counter's value (a
    * full summary only proves true < min for missing keys), so the
    * absent side contributes (min, min): count stays an upper bound,
    * and the widened err keeps count − err a lower bound. A summary
    * under capacity never evicted, so absent there means truly zero.
    * Truncation drops whole counters — survivors' intervals are
    * untouched, only sub-threshold keys lose presence. */
  override def merge(a: Map[Long, (Long, Long)],
                     b: Map[Long, (Long, Long)]): Map[Long, (Long, Long)] = {
    val minA = if (a.size >= capacity) a.values.iterator.map(_._1).min else 0L
    val minB = if (b.size >= capacity) b.values.iterator.map(_._1).min else 0L
    val union = (a.keySet ++ b.keySet).iterator.map { k =>
      val (ca, ea) = a.getOrElse(k, (minA, minA))
      val (cb, eb) = b.getOrElse(k, (minB, minB))
      k -> (ca + cb, ea + eb)
    }.toMap
    if (union.size <= capacity) union
    else union.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity).toMap
  }

  /** (key, est_count, err) sorted by est desc, key asc. */
  override def finish(buf: Map[Long, (Long, Long)]): Seq[(Long, Long, Long)] =
    buf.toSeq.map { case (k, (c, e)) => (k, c, e) }
      .sortBy { case (k, c, _) => (-c, k) }

  override def bufferEncoder: Encoder[Map[Long, (Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, (Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Long, Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long, Long)]]()
}

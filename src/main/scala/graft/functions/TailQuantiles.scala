package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Tail-exact quantile sketch: keeps the exact smallest-T and largest-T
  * values (plus the total count) in O(T) mergeable state. Any rank
  * within T of either end — the p99.99/p0.01 latencies that relative-
  * error sketches (REQ, t-digest) exist for — is answered EXACTLY; the
  * sketch self-certifies by construction (a probe is either inside a
  * retained tail, giving the true order statistic, or it is not
  * answerable and the caller falls back to the KLL body sketch,
  * an_kll_rank). Deterministic and partition-order independent: state
  * is a sorted multiset truncation, so merge order cannot change it —
  * which is what makes the whole probe output hash-verifiable against
  * an exact oracle, not bounds-checked.
  *
  * Budget rule: a tail quantile q is exact while rank distance
  * min(ceil(q·n), n − ceil(q·n)) ≤ T — size T to the largest corpus the
  * probe set must survive (T = 1024 covers p0.001/p0.999 to n = 1M and
  * p0.0001/p0.9999 to n = 10M).
  */
class TailQuantiles(t: Int)
  extends Aggregator[Double, (Long, Seq[Double], Seq[Double]), (Long, Seq[Double], Seq[Double])] {

  // lo: ascending smallest-T; hi: ascending largest-T
  override def zero: (Long, Seq[Double], Seq[Double]) = (0L, Vector.empty, Vector.empty)

  private def insertSorted(xs: Seq[Double], v: Double): Seq[Double] = {
    val (below, above) = xs.span(_ <= v)
    (below :+ v) ++ above
  }

  // O(1) fast path once the tails are full: most rows of a large
  // partition land strictly inside both tails and touch nothing
  override def reduce(buf: (Long, Seq[Double], Seq[Double]),
                      v: Double): (Long, Seq[Double], Seq[Double]) = {
    val (n, lo, hi) = buf
    val lo2 =
      if (lo.size < t) insertSorted(lo, v)
      else if (v < lo.last) insertSorted(lo, v).take(t)
      else lo
    val hi2 =
      if (hi.size < t) insertSorted(hi, v)
      else if (v > hi.head) insertSorted(hi, v).takeRight(t)
      else hi
    (n + 1, lo2, hi2)
  }

  override def merge(a: (Long, Seq[Double], Seq[Double]),
                     b: (Long, Seq[Double], Seq[Double])): (Long, Seq[Double], Seq[Double]) = {
    val lo = (a._2 ++ b._2).sorted.take(t)
    val hi = (a._3 ++ b._3).sorted.takeRight(t)
    (a._1 + b._1, lo, hi)
  }

  override def finish(buf: (Long, Seq[Double], Seq[Double])): (Long, Seq[Double], Seq[Double]) = buf

  override def bufferEncoder: Encoder[(Long, Seq[Double], Seq[Double])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Seq[Double], Seq[Double])]()
  override def outputEncoder: Encoder[(Long, Seq[Double], Seq[Double])] = bufferEncoder
}

object TailQuantiles {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  /** Explode `probes` against a single-row (n, lo, hi) tail state and
    * answer each rank exactly iff it falls inside a retained tail.
    * Out-of-budget probes — rank deeper than T from both ends, which
    * happens the first time n outgrows 2T (e.g. p0.001 on sf1's 6M-row
    * lineitem with T=1024 gives rnk=6000 > size(lo)) — yield
    * value = NULL with exact = false instead of silently indexing
    * `hi` with a large negative offset (NULL under non-ANSI, throw
    * under ANSI): the caller routes inexact probes to the KLL body
    * sketch (an_kll_rank). */
  def probe(st: DataFrame, probes: Seq[Double]): DataFrame =
    st.select(explode(array(probes.map(lit): _*)).as("q"),
        col("n"), col("lo"), col("hi"))
      .withColumn("rnk", greatest(lit(1L), ceil(col("q") * col("n")).cast("long")))
      .withColumn("exact", expr("rnk <= size(lo) OR n - rnk < size(hi)"))
      .withColumn("value", expr(
        """CASE WHEN rnk <= size(lo) THEN lo[CAST(rnk - 1 AS INT)]
          |WHEN n - rnk < size(hi) THEN hi[CAST(size(hi) - 1 - (n - rnk) AS INT)]
          |END""".stripMargin))
      .select(col("q"), col("rnk"), col("value"), col("exact"))
      .orderBy(col("q"))
}

package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV ("k minimum values") / theta distinct sketch (Bar-Yossef et al.,
  * RANDOM'02; the Theta-sketch framework of Dasgupta et al.): keep the
  * k smallest DISTINCT hash values seen. Estimate: with θ = k-th
  * smallest hash over a field of size P, distincts ≈ (k−1)·P/θ.
  *
  * Why this next to HLL (Sketches.hllRegisters): the sketch IS a
  * uniform sample of the distinct keys, so set operations are computed
  * on the samples themselves — intersection does not go through
  * inclusion-exclusion error compounding ([[thetaIntersect]]), and the
  * whole pipeline is DETERMINISTIC integer arithmetic on hashes:
  * merge = k smallest of the union (order-independent), estimate =
  * one integer division. An independent engine replaying the same
  * tempered hash reproduces the sketch bit-for-bit — see
  * SparkEntry.anThetaDistinctSql, which hash-verifies sample, θ, and
  * estimate.
  *
  * The buffer is a sorted distinct Vector capped at k: O(k) state,
  * map-side combined — the same shuffle shape as TopKAggregate.
  */
class KmvSketch[IN](k: Int, hashOf: IN => Long)
    extends Aggregator[IN, Seq[Long], Seq[Long]] {
  require(k > 1)

  override def zero: Seq[Long] = Vector.empty

  // almost every element of a large stream is ≥ the current k-th min:
  // that O(1) rejection is the fast path
  override def reduce(buf: Seq[Long], in: IN): Seq[Long] = {
    val h = hashOf(in)
    if (buf.size >= k && h >= buf.last) buf
    else if (buf.contains(h)) buf
    else (buf :+ h).sorted.take(k)
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(buf: Seq[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
}

object KmvSketch {

  /** Distinct-count estimate from a sample over a hash field of size
    * `p`: exact when the sample never filled (n < k — every distinct
    * hash is present), else (k−1)·p div θ. Integer arithmetic end to
    * end — deterministic and replayable in SQL. */
  def estimate(sample: Seq[Long], k: Int, p: Long = Sketches.P): Long =
    if (sample.size < k) sample.size.toLong
    else (k - 1).toLong * p / sample.last

  /** Sketch of the union: k smallest of the merged samples — the merge
    * operation itself, exposed for rollups. */
  def union(samples: Seq[Seq[Long]], k: Int): Seq[Long] =
    samples.flatten.distinct.sorted.take(k)

  /** Intersection estimate on the samples: both sketches are uniform
    * samples of their key sets below their θ; restricting to
    * θ = min(θA, θB) makes them samples of the SAME region, so shared
    * hashes below θ estimate the overlap directly:
    * |A∩B| ≈ ρ·p/θ with ρ = |sampleA ∩ sampleB ∩ [0, θ]|.
    * No inclusion-exclusion, no compounded error. */
  def thetaIntersect(a: Seq[Long], b: Seq[Long], k: Int,
                     p: Long = Sketches.P): Long = {
    if (a.isEmpty || b.isEmpty) return 0L
    val exactA = a.size < k
    val exactB = b.size < k
    val theta = (exactA, exactB) match {
      case (true, true) => p // both complete: intersection is exact
      case (true, false) => b.last
      case (false, true) => a.last
      case (false, false) => math.min(a.last, b.last)
    }
    val rho = a.toSet.intersect(b.toSet).count(_ <= theta).toLong
    if (theta == p) rho else rho * p / theta
  }
}

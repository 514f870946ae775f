package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One t-digest centroid: the (weighted-mean, weight) summary of a
  * contiguous run of sorted inputs. */
case class Centroid(mean: Double, weight: Long)

/** Aggregation state: compressed centroids + an uncompressed point
  * buffer (compression is amortized over `bufSize` inserts). */
case class TDigestBuf(centroids: Seq[Centroid], buffer: Seq[Double], n: Long)

/** Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
  * Quantiles Using t-Digests", arXiv:1902.04023 — public algorithm):
  * centroids sized by the k1 scale function k(q) = (δ/2π)·asin(2q−1),
  * which keeps centroids near the distribution's TAILS small (high
  * resolution where quantiles move fastest) and lets mid-body centroids
  * grow — the classic body-quantile sketch of the reference's describe/
  * percentile step, at O(δ) state per group.
  *
  * Spark posture: a typed Aggregator whose buffer is O(δ + bufSize) per
  * task regardless of input size and merges associatively (concatenate
  * centroid lists, re-compress) — partial aggregation runs map-side and
  * the shuffle carries one digest per task, the same mergeable-
  * summaries shape as [[KllSketch]]/[[SpaceSaving]].
  *
  * Determinism note (why this is `oracle=rows`, unlike the hash-green
  * KLL exact regime): compression points depend on how the input was
  * split across partitions, so two runs can yield slightly different
  * centroid sets. The ESTIMATES they imply agree within the t-digest
  * rank-error envelope — TDigestSpec pins that envelope (≤2% rank error
  * at δ=100 over adversarial mixtures) plus weight conservation and
  * merge associativity of accuracy. For hash-verifiable quantiles use
  * an_kll_rank (body) / an_tail_quantiles (tails); t-digest completes
  * the family for relative-error BODY estimation with tail-biased
  * resolution.
  */
class TDigest(delta: Int = 100, bufSize: Int = 512)
  extends Aggregator[Double, TDigestBuf, Seq[Centroid]] {
  require(delta >= 10, s"delta must be >= 10, got $delta")

  override def zero: TDigestBuf = TDigestBuf(Vector.empty, Vector.empty, 0L)

  private def k(q: Double): Double =
    delta / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)

  private def isSortedByMean(cs: Seq[Centroid]): Boolean = {
    var i = 1
    while (i < cs.size) {
      if (cs(i).mean < cs(i - 1).mean) return false
      i += 1
    }
    true
  }

  /** Greedy left-to-right merge of the sorted (centroids ∪ buffer)
    * multiset: a neighbor joins the current centroid while the merged
    * span stays within one k-unit. Deterministic given the multiset.
    *
    * The no-op fast path requires the centroid list to be SORTED, not
    * just small: merge() concatenates two sorted runs, and quantile()/
    * cdf() walk cumulative mass assuming global mean order — skipping
    * the sort for a small unsorted concat silently corrupted every
    * estimate (caught by the streaming-envelope spec). */
  private[functions] def compress(b: TDigestBuf): TDigestBuf = {
    if (b.buffer.isEmpty && b.centroids.size <= 2 * delta &&
      isSortedByMean(b.centroids)) return b
    val all = (b.centroids ++ b.buffer.map(Centroid(_, 1L)))
      .sortBy(c => (c.mean, c.weight))
    if (all.isEmpty) return TDigestBuf(Vector.empty, Vector.empty, b.n)
    val total = all.iterator.map(_.weight).sum.toDouble
    val out = Vector.newBuilder[Centroid]
    var cur = all.head
    var wSoFar = 0L
    all.iterator.drop(1).foreach { c =>
      val merged = cur.weight + c.weight
      val qLeft = wSoFar / total
      val qRight = (wSoFar + merged) / total
      if (k(qRight) - k(qLeft) <= 1.0) {
        // weighted mean; weights are longs so the mean is the only float op
        val mean = (cur.mean * cur.weight + c.mean * c.weight) / merged
        cur = Centroid(mean, merged)
      } else {
        out += cur
        wSoFar += cur.weight
        cur = c
      }
    }
    out += cur
    TDigestBuf(out.result(), Vector.empty, b.n)
  }

  override def reduce(b: TDigestBuf, x: Double): TDigestBuf = {
    val grown = TDigestBuf(b.centroids, b.buffer :+ x, b.n + 1)
    if (grown.buffer.size >= bufSize) compress(grown) else grown
  }

  override def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf =
    compress(TDigestBuf(a.centroids ++ b.centroids, a.buffer ++ b.buffer,
      a.n + b.n))

  override def finish(b: TDigestBuf): Seq[Centroid] = compress(b).centroids

  override def bufferEncoder: Encoder[TDigestBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[TDigestBuf]()
  override def outputEncoder: Encoder[Seq[Centroid]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Centroid]]()
}

object TDigest {
  /** Quantile estimate by piecewise-linear interpolation over centroid
    * midpoints (each centroid's mass is centered at its mean — the
    * standard t-digest inverse-CDF walk). */
  def quantile(cs: Seq[Centroid], q: Double): Double = {
    require(cs.nonEmpty, "empty digest has no quantiles")
    val n = cs.iterator.map(_.weight).sum.toDouble
    val target = q * n
    if (cs.size == 1) return cs.head.mean
    // cumulative mass at each centroid's midpoint
    var cum = 0L
    val mids = cs.map { c => val m = cum + c.weight / 2.0; cum += c.weight; (m, c.mean) }
    if (target <= mids.head._1) return cs.head.mean
    if (target >= mids.last._1) return cs.last.mean
    val i = mids.lastIndexWhere(_._1 <= target)
    val (m0, v0) = mids(i); val (m1, v1) = mids(i + 1)
    if (m1 == m0) v0 else v0 + (v1 - v0) * (target - m0) / (m1 - m0)
  }

  /** Fraction of inputs ≤ x implied by the digest (approximate CDF). */
  def cdf(cs: Seq[Centroid], x: Double): Double = {
    val n = cs.iterator.map(_.weight).sum.toDouble
    if (n == 0) return 0.0
    cs.iterator.map { c =>
      if (c.mean < x) c.weight.toDouble
      else if (c.mean == x) c.weight / 2.0
      else 0.0
    }.sum / n
  }
}

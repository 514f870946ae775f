package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One (value, weight) point of a flattened KLL summary. */
case class KllItem(value: Double, weight: Long)

/** KLL compactor hierarchy: `levels(h)` holds items of weight 2^h.
  * `n` is the EXACT observed count (compaction preserves total weight,
  * so Σ_h |levels(h)|·2^h == n at all times); `err` is the certified
  * worst-case rank-error bound accumulated so far; `compactions`
  * drives the deterministic alternating selection offset. */
case class KllBuffer(levels: Seq[Seq[Double]], n: Long, err: Long, compactions: Long)

/** Flattened sketch: value-sorted weighted points + the exact count
  * and the certified bound. For every x,
  * |Σ_{items ≤ x} weight − |{inputs ≤ x}|| ≤ errBound. */
case class KllSummary(items: Seq[KllItem], n: Long, errBound: Long)

/** KLL-family quantile sketch (compactor hierarchy per Karnin, Lang &
  * Liberty, "Optimal Quantile Approximation in Streams", FOCS'16) as a
  * typed `Aggregator`: level h stores items of weight 2^h; an
  * overflowing level sorts itself and promotes alternate elements to
  * the level above — halving footprint while shifting any rank by at
  * most 2^h. Mirrors the quantile summaries of the reference's
  * describe step (ETL-pipeline-telecom notebook, analyze cells) at a
  * scale where exact sort-based percentiles are a shuffle too far.
  *
  * DESIGN CHOICE — deterministic equal-capacity variant: true KLL
  * shrinks lower levels geometrically (O(k) memory) but its error
  * guarantee is probabilistic, riding on random compaction offsets
  * cancelling in expectation. With deterministic offsets the certified
  * worst-case bound over geometric capacities degenerates to Θ(n)
  * (the capacity-2 bottom levels compact every other insert), so this
  * variant keeps capacity k at EVERY level — the Manku/Rajagopalan/
  * Lindsay shape: O(k·log(n/k)) memory, and the deterministic bound
  * stays sub-linear at ≈ (n/k)·log₂(n/k). Replayable runs + a bound
  * checkable per run beat an in-expectation √-improvement here.
  *
  * Why this shape for 100 TB: the buffer is O(k log(n/k)) per task
  * regardless of input size and merges associatively (concatenate
  * levels, then re-compact), so partial aggregation runs map-side and
  * the shuffle carries one sketch per task — the mergeable-summaries
  * property (Agarwal et al., PODS'12), same as [[SpaceSaving]].
  *
  * SELF-CERTIFIED error: each compaction of level h adds at most 2^h
  * to the rank error of any query (promoted-pair analysis — within a
  * sorted pair, keeping either element misplaces at most one weight-
  * 2^h item relative to any threshold), so the sketch carries
  * `errBound = Σ compactions 2^h` and GUARANTEES
  * |rank_est(x) − true_rank(x)| ≤ errBound for every x — checkable
  * per run, not just in expectation.
  *
  * EXACT regime: while no level ever overflows (n ≤ k per group, as
  * in the hash-verified an_kll_rank query at verify scale) the sketch
  * holds every input with weight 1, errBound = 0, and rank estimates
  * are exact counts — deterministic and DuckDB-comparable. The
  * compaction regime is property-tested in SketchesSpec against the
  * certified bound.
  */
class KllSketch(k: Int) extends Aggregator[Double, KllBuffer, KllSummary] {
  require(k >= 4, s"k must be >= 4, got $k")

  override def zero: KllBuffer = KllBuffer(Seq(Vector.empty), 0L, 0L, 0L)

  /** Every level holds up to k items (see the design-choice note). */
  private[functions] def capacity(h: Int, depth: Int): Int = k

  /** Compact every overflowing level bottom-up. Promotes alternate
    * elements of the sorted even prefix (odd leftover stays behind, so
    * total weight is invariant); the selection offset alternates with
    * the compaction counter — deterministic given reduce order. */
  private def compactAll(b: KllBuffer): KllBuffer = {
    var levels = b.levels.map(_.toVector).toVector
    var err = b.err
    var comps = b.compactions
    var h = 0
    while (h < levels.length) {
      if (levels(h).length > capacity(h, levels.length)) {
        val sorted = levels(h).sorted
        val even = sorted.length & ~1
        val offset = (comps & 1L).toInt
        val promoted = (offset until even by 2).map(sorted)
        val leftover = if (even < sorted.length) Vector(sorted.last) else Vector.empty
        if (h + 1 == levels.length) levels = levels :+ Vector.empty
        levels = levels
          .updated(h, leftover)
          .updated(h + 1, levels(h + 1) ++ promoted)
        err += 1L << h
        comps += 1
        // only h (shrunk) and h+1 (grew) changed; rechecking h first
        // keeps the scan monotone upward
      } else h += 1
    }
    KllBuffer(levels, b.n, err, comps)
  }

  override def reduce(b: KllBuffer, x: Double): KllBuffer = {
    val l0 = b.levels.head :+ x
    val grown = KllBuffer(l0 +: b.levels.tail, b.n + 1, b.err, b.compactions)
    if (l0.length > capacity(0, b.levels.length)) compactAll(grown) else grown
  }

  /** Level-wise concatenation, then re-compact; the certified bounds
    * add (each side's compactions already happened) and any new
    * compactions triggered by the merge add on top. */
  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = {
    val depth = math.max(a.levels.length, b.levels.length)
    val levels = (0 until depth).map { h =>
      a.levels.applyOrElse(h, (_: Int) => Seq.empty[Double]) ++
        b.levels.applyOrElse(h, (_: Int) => Seq.empty[Double])
    }
    compactAll(KllBuffer(levels, a.n + b.n, a.err + b.err,
      a.compactions + b.compactions))
  }

  override def finish(b: KllBuffer): KllSummary = {
    val items = b.levels.zipWithIndex.flatMap { case (vals, h) =>
      vals.map(v => KllItem(v, 1L << h))
    }.sortBy(i => (i.value, i.weight))
    KllSummary(items, b.n, b.err)
  }

  override def bufferEncoder: Encoder[KllBuffer] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KllBuffer]()
  override def outputEncoder: Encoder[KllSummary] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KllSummary]()
}

/** Buffer-out variant for cross-batch streaming state: identical
  * reduce/merge to [[KllSketch]] but finish returns the BUFFER, so a
  * foreachBatch loop can keep merging micro-batch sketches into one
  * running compactor hierarchy (mergeable-summaries; the certified
  * bounds add across merges). */
class KllBufferAgg(k: Int) extends Aggregator[Double, KllBuffer, KllBuffer] {
  private val inner = new KllSketch(k)
  override def zero: KllBuffer = inner.zero
  override def reduce(b: KllBuffer, x: Double): KllBuffer = inner.reduce(b, x)
  override def merge(a: KllBuffer, b: KllBuffer): KllBuffer = inner.merge(a, b)
  override def finish(b: KllBuffer): KllBuffer = b
  override def bufferEncoder: Encoder[KllBuffer] = inner.bufferEncoder
  override def outputEncoder: Encoder[KllBuffer] = inner.bufferEncoder
}

object KllSketch {
  /** Estimated rank of x: total weight of items ≤ x. Within errBound
    * of |{inputs ≤ x}| by the certified-bound invariant. */
  def rank(s: KllSummary, x: Double): Long =
    s.items.iterator.filter(_.value <= x).map(_.weight).sum

  /** Quantile estimate: smallest summary value whose cumulative weight
    * reaches p·n (the weighted empirical CDF inverse). The true rank of
    * the returned value is within errBound + maxWeight of p·n. */
  def quantile(s: KllSummary, p: Double): Double = {
    require(p >= 0 && p <= 1, s"p must be in [0,1], got $p")
    require(s.items.nonEmpty, "empty sketch has no quantiles")
    val target = math.max(1L, math.ceil(p * s.n).toLong)
    var cum = 0L
    val it = s.items.iterator
    var last = s.items.head.value
    while (cum < target && it.hasNext) {
      val i = it.next()
      cum += i.weight
      last = i.value
    }
    last
  }
}

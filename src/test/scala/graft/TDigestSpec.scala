package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Centroid, TDigest, TDigestBuf}

/** t-digest invariants behind an_tdigest's rows-only oracle: the rank
  * error of every probe stays inside the envelope regardless of how
  * the input was partitioned, weight is conserved exactly, and a fixed
  * reduce order is fully deterministic.
  */
class TDigestSpec extends AnyFunSuite {
  private val rng = new scala.util.Random(7)

  // adversarial mixture: gaussian body + uniform shelf + point mass
  private val xs: Vector[Double] = {
    val g = Vector.fill(8000)(rng.nextGaussian() * 50 + 500)
    val u = Vector.fill(8000)(rng.nextDouble() * 2000)
    val p = Vector.fill(4000)(1234.5)
    rng.shuffle(g ++ u ++ p)
  }
  private val sorted = xs.sorted

  private def rankError(est: Double, q: Double): Double = {
    val below = sorted.count(_ < est)
    val atOrBelow = sorted.count(_ <= est)
    // est's plausible rank is anywhere inside its tie run
    val lo = below.toDouble / xs.size
    val hi = atOrBelow.toDouble / xs.size
    if (q < lo) lo - q else if (q > hi) q - hi else 0.0
  }

  private def run(agg: TDigest, data: Seq[Double]): TDigestBuf =
    data.foldLeft(agg.zero)(agg.reduce)

  test("rank error stays under 2% at delta=100 over an adversarial mixture") {
    val agg = new TDigest(100)
    val cs = agg.finish(run(agg, xs))
    Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99).foreach { q =>
      val e = rankError(TDigest.quantile(cs, q), q)
      assert(e <= 0.02, s"q=$q rank error $e")
    }
  }

  test("tail resolution: p99/p01 tighter than the body bound") {
    val agg = new TDigest(100)
    val cs = agg.finish(run(agg, xs))
    Seq(0.01, 0.99).foreach { q =>
      val e = rankError(TDigest.quantile(cs, q), q)
      assert(e <= 0.005, s"q=$q tail rank error $e")
    }
  }

  test("weight is conserved exactly through compression and merges") {
    val agg = new TDigest(50, bufSize = 97)
    val parts = xs.grouped(1313).map(p => run(agg, p)).toVector
    val merged = parts.reduceLeft(agg.merge)
    val cs = agg.finish(merged)
    assert(cs.map(_.weight).sum == xs.size.toLong)
    assert(merged.n == xs.size.toLong)
    // centroids come out sorted by mean
    assert(cs.map(_.mean) == cs.map(_.mean).sorted)
  }

  test("accuracy survives any merge order (associativity of the envelope)") {
    val agg = new TDigest(100)
    val parts = xs.grouped(2000).map(p => run(agg, p)).toVector
    val left = agg.finish(parts.reduceLeft(agg.merge))
    val right = agg.finish(parts.reduceRight(agg.merge))
    val shuffled = agg.finish(rng.shuffle(parts).reduceLeft(agg.merge))
    Seq(left, right, shuffled).foreach { cs =>
      Seq(0.25, 0.5, 0.75, 0.95).foreach { q =>
        assert(rankError(TDigest.quantile(cs, q), q) <= 0.02, s"q=$q")
      }
    }
  }

  test("small-digest merges keep the envelope (regression: unsorted-concat fast path)") {
    // two partition digests whose concatenated centroid lists stay
    // UNDER 2δ: the compress fast path used to return the unsorted
    // concat, and quantile() walking it produced up to 36% rank error.
    // The fast path now requires sorted-by-mean, so this merge regime
    // must match the one-shot digest's accuracy.
    val agg = new TDigest(100)
    val data = (1 to 6000).map(i => ((i * 7919) % 6001).toDouble)
    val dsorted = data.sorted
    val b1 = data.take(2500).grouped(625).map(p => run(agg, p)).reduce(agg.merge)
    val b2 = data.drop(2500).grouped(875).map(p => run(agg, p)).reduce(agg.merge)
    val cs = agg.finish(agg.merge(b1, b2))
    assert(cs.map(_.mean) == cs.map(_.mean).sorted)
    assert(cs.map(_.weight).sum == data.size.toLong)
    Seq(0.1, 0.5, 0.9).foreach { q =>
      val est = TDigest.quantile(cs, q)
      val rank = dsorted.count(_ <= est).toDouble / data.size
      assert(math.abs(rank - q) <= 0.01, s"q=$q rank $rank")
    }
  }

  test("a fixed reduce order is fully deterministic") {
    val agg = new TDigest(100)
    val a = agg.finish(run(agg, xs))
    val b = agg.finish(run(agg, xs))
    assert(a == b)
  }

  test("state stays O(delta): centroid count bounded after full compression") {
    val agg = new TDigest(100)
    val cs = agg.finish(run(agg, xs))
    assert(cs.size <= 2 * 100, s"got ${cs.size} centroids")
    assert(cs.size >= 20, "digest should not collapse to a handful of centroids")
  }

  test("cdf and quantile are approximate inverses") {
    val agg = new TDigest(100)
    val cs = agg.finish(run(agg, xs))
    Seq(0.1, 0.5, 0.9).foreach { q =>
      val x = TDigest.quantile(cs, q)
      assert(math.abs(TDigest.cdf(cs, x) - q) <= 0.03, s"q=$q")
    }
  }
}

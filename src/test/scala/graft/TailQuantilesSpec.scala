package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TailQuantiles

/** TailQuantiles invariants that make an_tail_quantiles hash-verifiable:
  * the retained tails are the true order statistics regardless of
  * partitioning, so any probe within budget is exact.
  */
class TailQuantilesSpec extends AnyFunSuite {
  private val rng = new scala.util.Random(42)

  private def run(agg: TailQuantiles, xs: Seq[Double]) =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("tails are exact order statistics; fast path agrees with sort") {
    val agg = new TailQuantiles(16)
    val xs = Vector.fill(5000)(rng.nextDouble() * 1000)
    val (n, lo, hi) = run(agg, xs)
    val sorted = xs.sorted
    assert(n == xs.size)
    assert(lo == sorted.take(16))
    assert(hi == sorted.takeRight(16))
  }

  test("merge order cannot change the state (partition-order invariance)") {
    val agg = new TailQuantiles(8)
    val xs = Vector.fill(2000)(rng.nextDouble())
    val parts = xs.grouped(137).map(p => run(agg, p)).toVector
    val leftFold = parts.reduceLeft(agg.merge)
    val rightFold = parts.reduceRight(agg.merge)
    val shuffled = rng.shuffle(parts).reduceLeft(agg.merge)
    assert(leftFold == rightFold && leftFold == shuffled)
    assert(leftFold == run(agg, xs))
  }

  test("duplicates survive truncation as a multiset") {
    val agg = new TailQuantiles(4)
    val (_, lo, hi) = run(agg, Vector(5.0, 1.0, 1.0, 1.0, 9.0, 9.0, 3.0))
    assert(lo == Vector(1.0, 1.0, 1.0, 3.0))
    assert(hi == Vector(3.0, 5.0, 9.0, 9.0))
  }

  test("n <= T keeps everything: every rank answerable") {
    val agg = new TailQuantiles(64)
    val xs = Vector.fill(50)(rng.nextDouble())
    val (n, lo, hi) = run(agg, xs)
    assert(n == 50 && lo == xs.sorted && hi == xs.sorted)
  }
}

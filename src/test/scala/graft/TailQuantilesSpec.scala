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

/** The out-of-budget regime of TailQuantiles.probe: the behavior
  * an_tail_quantiles depends on the first time n outgrows 2T.
  */
class TailQuantilesProbeSpec extends SparkSpec {
  test("probe: out-of-budget ranks answer NULL + exact=false, in-budget stay exact") {
    import spark.implicits._
    val t = 16
    val n = 3000 // n >> 2T: p0.001 (rnk=3) is in lo, p0.5 (rnk=1500) is out of budget
    val agg = new TailQuantiles(t)
    val st = spark.range(n).map(i => ((i * 7919) % 3001).toDouble)
      .groupByKey(_ => 0)
      .agg(agg.toColumn.name("st"))
      .select($"st._1".as("n"), $"st._2".as("lo"), $"st._3".as("hi"))
    val rows = TailQuantiles.probe(st, Seq(0.001, 0.5, 0.999))
      .collect().map(r => (r.getDouble(0), r.getLong(1), Option(r.get(2)), r.getBoolean(3)))
    val sorted = (0 until n).map(i => ((i.toLong * 7919) % 3001).toDouble).sorted
    val byQ = rows.map(r => r._1 -> r).toMap
    // in-budget tails: exact true, value is the true order statistic
    assert(byQ(0.001)._4 && byQ(0.001)._3.contains(sorted(2)))   // rnk=3
    assert(byQ(0.999)._4 && byQ(0.999)._3.contains(sorted(2996))) // rnk=2997
    // out-of-budget body probe: NULL value, exact=false — never a
    // negative array index (the pre-guard failure mode)
    assert(!byQ(0.5)._4 && byQ(0.5)._3.isEmpty)
  }
}

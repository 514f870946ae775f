package graft

import org.apache.spark.sql.functions._
import graft.operators.PrefixSum

class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  test("running totals and ranks equal the single-partition window") {
    // unique order key, values spread over many input partitions
    val df = spark.range(0, 5000).repartition(16)
      .select((col("id") * 37 % 4999).as("k"), (col("id") % 100 + 1).as("v"))
      .groupBy("k").agg(sum("v").as("v")) // distinct keys
    val got = PrefixSum.withRunningTotals(df, Seq("k"), Seq("v"), numParts = 8)
      .select("k", "v_cum", "rn")
    val w = org.apache.spark.sql.expressions.Window.orderBy("k")
    val want = df.select(col("k"), sum("v").over(w).as("v_cum"),
      row_number().over(w).cast("long").as("rn"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "distributed scan must equal the window formulation")
    PrefixSum.releaseCaches()
  }

  test("empty and single-partition inputs scan cleanly") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(PrefixSum.withRunningTotals(empty, Seq("k"), Seq("v")).count() == 0)
    val one = Seq((5L, 7L), (2L, 3L)).toDF("k", "v")
    val got = PrefixSum.withRunningTotals(one, Seq("k"), Seq("v"), numParts = 4)
      .select("k", "v_cum", "rn").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((2L, 3L, 1L), (5L, 10L, 2L)))
    PrefixSum.releaseCaches()
  }

  test("multiple sum columns accumulate independently") {
    val df = Seq((1L, 10L, 1L), (2L, 20L, 0L), (3L, 30L, 1L)).toDF("k", "a", "b")
    val got = PrefixSum.withRunningTotals(df, Seq("k"), Seq("a", "b"), numParts = 2)
      .select("k", "a_cum", "b_cum").as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 10L, 1L), (2L, 30L, 1L), (3L, 60L, 2L)))
    PrefixSum.releaseCaches()
  }

  test("property: exclusive prefix max equals the driver-side scan on random datasets") {
    import org.scalacheck.Gen
    (1 to 6).foreach { seed =>
      val vals = Gen.listOfN(30 + seed * 17, Gen.chooseNum(-1000L, 1000L))
        .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed.toLong + 100))
        .getOrElse(Nil)
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("k", "v")
        .repartition(5)
      val nP = 1 + seed % 5
      val got = PrefixSum.withRunningMax(df, Seq("k"), Seq("v"), numParts = nP)
        .select("k", "v_pmax").as[(Long, Long)].collect().sortBy(_._1)
      // exclusive: max over strictly earlier keys, MinValue for the first
      val want = vals.scanLeft(Long.MinValue)(math.max).init.zipWithIndex
        .map { case (m, i) => (i.toLong, m) }
      assert(got.toSeq == want, s"seed=$seed numParts=$nP")
      PrefixSum.releaseCaches()
    }
  }

  test("property: scan equals the driver-side prefix sum on random datasets") {
    import org.scalacheck.Gen
    (1 to 8).foreach { seed =>
      val vals = Gen.listOfN(40 + seed * 13, Gen.chooseNum(-1000L, 1000L))
        .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed.toLong))
        .getOrElse(Nil)
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("k", "v")
        .repartition(5)
      val nP = 1 + seed % 7
      val got = PrefixSum.withRunningTotals(df, Seq("k"), Seq("v"), numParts = nP)
        .select("k", "v_cum", "rn").as[(Long, Long, Long)].collect().sortBy(_._1)
      val want = vals.scanLeft(0L)(_ + _).tail.zipWithIndex
        .map { case (c, i) => (i.toLong, c, i + 1L) }
      assert(got.toSeq == want, s"seed=$seed numParts=$nP")
      PrefixSum.releaseCaches()
    }
  }

  test("distinctRunningCounts equals groupBy + withRunningTotals on raw rows") {
    // duplicate-heavy raw keys across many input partitions: the
    // run-length path must reproduce the aggregate-then-scan result
    val raw = spark.range(0, 4000).repartition(11)
      .select((col("id") % 97).as("k"), (col("id") % 7 + 1).as("w"))
    val got = PrefixSum.distinctRunningCounts(raw, Seq("k"), sumCols = Seq("w"),
        numParts = 8)
      .select("k", "cnt", "cnt_cum", "w", "w_cum")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val perV = raw.groupBy("k").agg(count(lit(1)).as("cnt"), sum("w").as("w"))
    val want = PrefixSum.withRunningTotals(perV, Seq("k"), Seq("cnt", "w"), numParts = 8)
      .select("k", "cnt", "cnt_cum", "w", "w_cum")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq,
      "raw-row run-length scan must equal the aggregate-then-scan formulation")
    PrefixSum.releaseCaches()
  }

  test("distinctRunningCounts handles empty input and fewer keys than partitions") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "w")
    assert(PrefixSum.distinctRunningCounts(empty, Seq("k")).count() == 0)
    val tiny = Seq((5L, 1L), (5L, 2L), (2L, 4L)).toDF("k", "w")
    val got = PrefixSum.distinctRunningCounts(tiny, Seq("k"), sumCols = Seq("w"),
        numParts = 16)
      .select("k", "cnt", "cnt_cum", "w", "w_cum")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((2L, 1L, 1L, 4L, 4L), (5L, 2L, 3L, 3L, 7L)))
    PrefixSum.releaseCaches()
  }

  test("the scan plan has no single-partition window exchange") {
    val df = spark.range(0, 1000).select(col("id").as("k"), lit(1L).as("v"))
    val plan = PrefixSum.withRunningTotals(df, Seq("k"), Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"scan must not fall back to a window:\n$plan")
    assert(!plan.contains("SinglePartition"), s"no single-partition exchange:\n$plan")
    PrefixSum.releaseCaches()
  }
}

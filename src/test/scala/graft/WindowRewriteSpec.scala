package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{Join, Window => LWindow}

/** plans.AggJoinToWindow: the opt-in window-join optimization pass.
  * Every equivalence case runs the SAME DataFrame twice — flag off
  * (join survives) and flag on (join rewritten to a Window) — and
  * asserts identical results, so the rewrite is checked against Spark's
  * own join semantics, not against expectations baked into the test.
  */
class WindowRewriteSpec extends SparkSpec {

  private def withFlag(on: Boolean): SparkSession = {
    val s = spark.newSession()
    s.conf.set(graft.plans.AggJoinToWindow.ConfKey, on.toString)
    s
  }

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.nonEmpty
  private def hasJoin(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.nonEmpty

  private def build(s: SparkSession): DataFrame = {
    val o = s.read.parquet(s"$sfDir/orders.parquet")
    val agg = o.groupBy("o_custkey").agg(
      count(lit(1)).as("cust_orders"),
      sum(col("o_totalprice").cast("decimal(24,8)")).as("cust_spend"),
      max("o_orderdate").as("cust_last"))
    o.select("o_orderkey", "o_custkey", "o_totalprice")
      .join(agg, "o_custkey")
  }

  test("self-join-with-aggregate rewrites to a single-scan Window") {
    val on = build(withFlag(true))
    assert(hasWindow(on) && !hasJoin(on), on.queryExecution.optimizedPlan.toString)
    // one scan, not two: the optimized plan reads orders exactly once
    val scans = on.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation => l
    }
    assert(scans.size == 1, s"expected 1 scan, got ${scans.size}")
  }

  test("rewritten results equal the join results") {
    val off = build(withFlag(false))
    assert(hasJoin(off) && !hasWindow(off))
    val a = build(withFlag(true)).collect().map(_.toSeq).toSet
    val b = off.collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
  }

  test("NULL join keys are dropped by the rewrite, matching inner-join semantics") {
    def q(s: SparkSession): DataFrame = {
      val base = s.read.parquet(s"$sfDir/orders.parquet")
        .withColumn("k", when(col("o_orderkey") % 7 === 0, lit(null))
          .otherwise(col("o_custkey") % 50))
        .select("o_orderkey", "k", "o_totalprice")
      base.join(
        base.groupBy("k").agg(
          sum(col("o_totalprice").cast("decimal(24,8)")).as("spend")), "k")
    }
    val on = q(withFlag(true))
    assert(hasWindow(on) && !hasJoin(on))
    assert(on.collect().map(_.toSeq).toSet == q(withFlag(false)).collect().map(_.toSeq).toSet)
    assert(on.where(col("k").isNull).count() == 0)
  }

  test("q_agg_join_window fires through cast-wrapped decimal sums and shared aggregates") {
    val df = SparkEntry.queries("q_agg_join_window")(spark, sfDir)
    assert(hasWindow(df) && !hasJoin(df), df.queryExecution.optimizedPlan.toString)
    // the moneySum Casts live in the Project ABOVE the Window; the
    // Window itself carries the raw Sum/Count
    val n = df.count()
    assert(n == spark.read.parquet(s"$sfDir/orders.parquet").count())
  }

  test("does not fire on non-deterministic subtrees") {
    val s = withFlag(true)
    // rand() passes semanticEquals between the two scans, but the join
    // plan draws it twice and the rewrite would draw it once — the
    // exact collapse Spark's own rules guard on `deterministic`
    val o = s.read.parquet(s"$sfDir/orders.parquet")
      .withColumn("r", rand(42)).select("o_orderkey", "o_custkey", "r")
    val df = o.join(o.groupBy("o_custkey").agg(sum("r").as("sr")), "o_custkey")
    assert(hasJoin(df) && !hasWindow(df))
  }

  test("property: qualifying plans with First/Last rewrite result-identically") {
    import org.scalacheck.Gen
    val gen = for {
      nRows <- Gen.choose(20, 200)
      nKeys <- Gen.choose(1, 10)
      mult  <- Gen.choose(1, 7)
    } yield (nRows, nKeys, mult)
    val cases = (1 to 10).flatMap(i =>
      gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
    assert(cases.nonEmpty)
    cases.foreach { case (nRows, nKeys, mult) =>
      // `dep` is functionally dependent on the group key, so
      // First/Last are deterministic and the two plans must agree
      // exactly — the pick-nondeterminism caveat never triggers
      def q(s: SparkSession): DataFrame = {
        val base = s.range(nRows)
          .select((col("id") % nKeys).as("k"),
            ((col("id") % nKeys) * mult).as("dep"),
            (col("id") * 13 % 101).as("v"))
        base.join(base.groupBy("k").agg(
          first("dep").as("f"), last("dep").as("l"),
          sum("v").as("s"), count(lit(1)).as("c"), max("v").as("mx")), "k")
      }
      val on = q(withFlag(true))
      val off = q(withFlag(false))
      assert(hasWindow(on) && !hasJoin(on),
        s"($nRows,$nKeys,$mult): ${on.queryExecution.optimizedPlan}")
      assert(hasJoin(off) && !hasWindow(off))
      assert(on.collect().map(_.toSeq).toSet == off.collect().map(_.toSeq).toSet,
        s"($nRows,$nKeys,$mult)")
    }
  }

  test("does not fire on distinct aggregates") {
    val s = withFlag(true)
    val o = s.read.parquet(s"$sfDir/orders.parquet")
    val df = o.select("o_orderkey", "o_custkey")
      .join(o.groupBy("o_custkey").agg(countDistinct("o_orderstatus").as("n")), "o_custkey")
    assert(hasJoin(df) && !hasWindow(df))
  }

  test("does not fire when the two sides differ (filter on one side)") {
    val s = withFlag(true)
    val o = s.read.parquet(s"$sfDir/orders.parquet")
    val df = o.where(col("o_totalprice") > 1000).select("o_orderkey", "o_custkey")
      .join(o.groupBy("o_custkey").agg(count(lit(1)).as("n")), "o_custkey")
    assert(hasJoin(df) && !hasWindow(df))
  }

  test("does not fire when the join covers only part of the grouping key") {
    val s = withFlag(true)
    val o = s.read.parquet(s"$sfDir/orders.parquet")
    val agg = o.groupBy("o_custkey", "o_orderstatus").agg(count(lit(1)).as("n"))
    val df = o.select("o_orderkey", "o_custkey")
      .join(agg, Seq("o_custkey"))
    assert(hasJoin(df) && !hasWindow(df))
  }
}

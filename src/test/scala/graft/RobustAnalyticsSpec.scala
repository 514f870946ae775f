package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the round-8 analytics additions: OLS regression
  * from exact power sums, gaps-and-islands interval merging, and
  * median/MAD robust outliers. The DuckDB oracle guards cross-engine
  * value equality; these specs pin the MATH on constructed inputs where
  * the right answer is known in closed form.
  */
class RobustAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("an_linreg recovers an exact line (slope 2, intercept 1, r2 1)") {
    val tmp = java.nio.file.Files.createTempDirectory("linreg_toy").toString
    // y = 2x + 1 exactly, one group; decimal power sums must recover it
    // with zero residual.
    (1 to 100).map(i => (i.toDouble, 2.0 * i + 1.0, "A"))
      .toDF("l_quantity", "l_extendedprice", "l_returnflag")
      .write.parquet(s"$tmp/lineitem.parquet")
    val r = SparkEntry.queries("an_linreg")(spark, tmp).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Double]("slope") == 2.0)
    assert(row.getAs[Double]("intercept") == 1.0)
    assert(row.getAs[Double]("r2") == 1.0)
  }

  test("q_gaps_islands merges overlapping intervals into known islands") {
    val tmp = java.nio.file.Files.createTempDirectory("islands_toy").toString
    // Supplier 1: ships on day 0, 5, 20 → [0,7]∪[5,12] merge, [20,27]
    // stands alone → 2 islands, covered 12+7=19 days, max 12.
    // Supplier 2: ships on day 0 only → 1 island of 7 days.
    def d(day: Int) = java.sql.Timestamp.valueOf(f"1997-01-${day + 1}%02d 00:00:00")
    Seq(
      (1L, 10L, 1, d(0)), (1L, 11L, 1, d(5)), (1L, 12L, 1, d(20)),
      (2L, 13L, 1, d(0)))
      .toDF("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate")
      .write.parquet(s"$tmp/lineitem.parquet")
    val r = SparkEntry.queries("q_gaps_islands")(spark, tmp)
      .collect().map(x => (x.getAs[Long]("l_suppkey"),
        (x.getAs[Long]("n_islands"), x.getAs[Long]("covered_days"),
         x.getAs[Int]("max_island_days"), x.getAs[Long]("n_intervals")))).toMap
    assert(r(1L) == ((2L, 19L, 12, 3L)))
    assert(r(2L) == ((1L, 7L, 7, 1L)))
  }

  test("q_gaps_islands conserves intervals and bounds islands on sf data") {
    val agg = SparkEntry.queries("q_gaps_islands")(spark, sfDir)
      .agg(sum("n_intervals").as("iv"), sum("n_islands").as("is"),
        min(col("covered_days") - col("max_island_days")).as("slack"))
      .collect()(0)
    val liRows = Tables.lineitem(spark, sfDir).count()
    assert(agg.getAs[Long]("iv") == liRows)        // every row lands in an island
    assert(agg.getAs[Long]("is") <= liRows)        // islands never exceed intervals
    assert(agg.getAs[Long]("slack") >= 0L)         // longest island ≤ total coverage
  }

  test("an_twa weights each reading by its hold duration") {
    val tmp = java.nio.file.Files.createTempDirectory("twa_toy").toString
    // user 1: value 10 held 1s, value 20 held 3s, final reading open
    // → TWA = (10·1 + 20·3) / 4 = 17.5 ; plain AVG would say 43.
    def ns(sec: Long) = sec * 1000000000L
    Seq((1L, 1L, ns(0), 10.0), (1L, 2L, ns(1), 20.0), (1L, 3L, ns(4), 99.0))
      .toDF("user_id", "event_id", "ts", "value")
      .write.parquet(s"$tmp/events.parquet")
    val r = SparkEntry.queries("an_twa")(spark, tmp).collect()(0)
    assert(r.getAs[Long]("n_holds") == 2L)
    assert(r.getAs[Long]("span_us") == 4000000L)
    assert(r.getAs[Double]("twa") == 17.5)
  }

  test("an_benford: a Benford-conforming sample has tiny chi2, pcts sum to 1") {
    val tmp = java.nio.file.Files.createTempDirectory("benford_toy").toString
    // construct counts proportional to the Benford pmf exactly:
    // 1000·log10(1+1/d) copies of a d-leading value
    val rows = (1 to 9).flatMap { d =>
      val n = math.round(100000 * math.log10(1.0 + 1.0 / d)).toInt
      Seq.fill(n)(d * 100.0 + 1.0)
    }
    rows.toDF("o_totalprice").write.parquet(s"$tmp/orders.parquet")
    val r = SparkEntry.queries("an_benford")(spark, tmp).collect()
    assert(r.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    assert(math.abs(r.map(_.getAs[Double]("pct")).sum - 1.0) < 1e-4)
    assert(r.map(_.getAs[Double]("chi2_part")).sum < 0.01) // conforming data
  }

  test("an_mean_shift flags a constructed level change, not the steady state") {
    val tmp = java.nio.file.Files.createTempDirectory("shift_toy").toString
    // 60 days at revenue 100/day, then 60 days at 400/day: the scan
    // must flag days bracketing day 60 and stay quiet elsewhere
    def day(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(1992, 1, 1).plusDays(i).atStartOfDay())
    val rows = (0 until 120).map(i =>
      (day(i), if (i < 60) 100.0 else 400.0, 0.0))
    rows.toDF("l_shipdate", "l_extendedprice", "l_discount")
      .write.parquet(s"$tmp/lineitem.parquet")
    val r = SparkEntry.queries("an_mean_shift")(spark, tmp)
      .collect().map(x => (x.getAs[java.sql.Timestamp]("day")
        .toLocalDateTime.getDayOfYear, x.getAs[Boolean]("flagged")))
    val flaggedDays = r.filter(_._2).map(_._1)
    assert(flaggedDays.nonEmpty)
    // all flags cluster around the change point (day-of-year 61 = index 60)
    assert(flaggedDays.forall(d => d >= 48 && d <= 75), flaggedDays.mkString(","))
    // steady-state regions stay quiet
    assert(r.filter(x => x._1 < 45 || x._1 > 80).forall(!_._2))
  }

  test("q_pagerank: hub outranks leaves on a star, total rank mass ≈ 1") {
    val tmp = java.nio.file.Files.createTempDirectory("pagerank_toy").toString
    // customer 1 trades with suppliers 1..4: a 5-node star whose hub
    // (the customer) must collect the most rank
    (1 to 4).map(sk => (sk.toLong, sk.toLong))
      .toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$tmp/lineitem.parquet")
    (1 to 4).map(ok => (ok.toLong, 1L))
      .toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$tmp/orders.parquet")
    val r = SparkEntry.queries("q_pagerank")(spark, tmp)
      .collect().map(x => (x.getAs[Long]("node"), x.getAs[Double]("rank"))).toMap
    assert(r.size == 5)
    val hub = r(2L) // custkey 1 → node id 2
    val leaves = r.removed(2L).values.toSeq
    assert(leaves.forall(hub > _))
    assert(leaves.distinct.size == 1) // symmetric leaves share one rank
    assert(math.abs(r.values.sum - 1.0) < 1e-6) // stochastic: mass conserved
  }

  test("an_mad_outliers flags injected gross outliers, robust to them") {
    val tmp = java.nio.file.Files.createTempDirectory("mad_toy").toString
    // 98 inliers tightly around 100 (unit-ish MAD) + 2 gross outliers.
    // The MEDIAN/MAD screen must keep med≈100, mad small, and flag
    // exactly the 2 planted points — a plain z-score on this data has
    // its stddev blown up by the outliers themselves.
    val inliers = (1 to 98).map(i => ("P", 100.0 + (i % 11) - 5.0))
    val planted = Seq(("P", 100000.0), ("P", -100000.0))
    (inliers ++ planted).toDF("o_orderpriority", "o_totalprice")
      .write.parquet(s"$tmp/orders.parquet")
    val r = SparkEntry.queries("an_mad_outliers")(spark, tmp).collect()(0)
    assert(math.abs(r.getAs[Double]("med") - 100.0) <= 1.0)
    assert(r.getAs[Double]("mad") <= 6.0)
    assert(r.getAs[Long]("n_outliers") == 2L)
  }
}

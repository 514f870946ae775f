package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-11 nonparametric/information additions:
  * each statistic is recomputed wholly in the driver from the raw
  * parquet rows and compared against the distributed query (the oracle
  * checks exact values at sf0.01; these pin the MEANING of those
  * values at sf0.001). */
class NonparamStatsSpec extends SparkSpec {
  import spark.implicits._

  private def dailyCents(eventType: String): Map[java.sql.Timestamp, Long] =
    Tables.events(spark, sfDir)
      .filter(col("event_type") === eventType)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("v"))
      .as[(java.sql.Timestamp, Long)].collect().toMap

  private def pairedDiffs(): Seq[Long] = {
    val a = dailyCents("click"); val b = dailyCents("view")
    a.keySet.intersect(b.keySet).toSeq.sortBy(_.getTime).map(d => a(d) - b(d))
  }

  test("an_wilcoxon matches a driver signed-rank computation") {
    val row = SparkEntry.queries("an_wilcoxon")(spark, sfDir)
      .select("n_pairs", "w_plus2", "z_w").as[(Long, Long, Double)].head()
    val d = pairedDiffs().filter(_ != 0L)
    val ranked = d.map(x => (math.abs(x), x > 0))
    val n = ranked.size.toLong
    // doubled midranks over |d|
    val byAbs = ranked.groupBy(_._1)
    val w2 = byAbs.map { case (ad, g) =>
      val below = ranked.count(_._1 < ad).toLong
      val r2 = 2 * below + g.size + 1
      g.count(_._2).toLong * r2
    }.sum
    val tie3 = byAbs.values.map { g => val t = g.size.toLong; t * t * t - t }.sum
    val v48 = 2 * n * (n + 1) * (2 * n + 1) - tie3
    val z = if (v48 > 0)
      (w2 - n * (n + 1) / 2).toDouble / math.sqrt(v48.toDouble / 12.0)
    else 0.0
    assert(row._1 == n && row._2 == w2)
    assert(math.abs(row._3 - z) < 1e-6)
    assert(n >= 3, "sf0.001 must yield a usable paired series")
  }

  test("an_cliffs_delta matches brute-force pairwise dominance") {
    val row = SparkEntry.queries("an_cliffs_delta")(spark, sfDir)
      .select("n_a", "n_b", "gt", "lt", "cliffs_delta")
      .as[(Long, Long, Long, Long, Double)].head()
    val seg = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment")).as[(Long, String)].collect().toMap
    val vals = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long)].collect()
      .flatMap { case (ck, v) => seg.get(ck).map(s => (s, v)) }
    val a = vals.collect { case ("BUILDING", v) => v }
    val b = vals.collect { case ("AUTOMOBILE", v) => v }
    val gt = a.map(x => b.count(_ < x).toLong).sum
    val lt = a.map(x => b.count(_ > x).toLong).sum
    assert(row._1 == a.length.toLong && row._2 == b.length.toLong)
    assert(row._3 == gt && row._4 == lt)
    assert(math.abs(row._5 - (gt - lt).toDouble / (a.length.toLong * b.length)) < 1e-12)
  }

  test("an_hodges_lehmann equals the driver median of Walsh averages") {
    val row = SparkEntry.queries("an_hodges_lehmann")(spark, sfDir)
      .select("n_walsh", "hl_shift").as[(Long, Double)].head()
    val d = pairedDiffs()
    val walsh = for (i <- d.indices; j <- i until d.size) yield d(i) + d(j)
    val sorted = walsh.sorted
    val m = sorted.size
    val lo = sorted((m + 1) / 2 - 1)
    val hi = sorted(m / 2)
    assert(row._1 == m.toLong)
    assert(math.abs(row._2 - (lo + hi).toDouble / 400.0) < 1e-9)
  }

  test("an_mutual_info matches a driver plog computation and bounds") {
    val row = SparkEntry.queries("an_mutual_info")(spark, sfDir)
      .select("n", "mi", "h_seg", "h_band", "nmi")
      .as[(Long, Double, Double, Double, Double)].head()
    val seg = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment")).as[(Long, String)].collect().toMap
    val cells = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long)].collect()
      .flatMap { case (ck, v) => seg.get(ck).map(s => (s, v / 5000000L)) }
      .groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val n = cells.values.sum
    val rm = cells.groupBy(_._1._1).map { case (k, g) => (k, g.values.sum) }
    val cm = cells.groupBy(_._1._2).map { case (k, g) => (k, g.values.sum) }
    val mi = cells.map { case ((a, b), o) =>
      o.toDouble / n * math.log(o.toDouble * n / (rm(a).toDouble * cm(b)))
    }.sum
    def h(m: Map[_, Long]) = m.values.map(v => -v.toDouble / n * math.log(v.toDouble / n)).sum
    assert(row._1 == n)
    assert(math.abs(row._2 - mi) < 1e-5)
    assert(math.abs(row._3 - h(rm)) < 1e-5 && math.abs(row._4 - h(cm)) < 1e-5)
    assert(row._2 >= 0.0 - 1e-9, "MI is nonnegative")
    assert(row._5 <= 1.0 + 1e-9 && math.abs(row._5 - mi / math.sqrt(h(rm) * h(cm))) < 1e-5)
  }
}

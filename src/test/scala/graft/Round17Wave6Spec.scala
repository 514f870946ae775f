package graft

import org.apache.spark.sql.functions._

/** Independent-recompute pins for the round-17 wave-6 keys: Gwet AC1
  * against a per-document replay, the weighted kappa against a direct
  * rank-and-count sweep, and DFFITS against an element-wise
  * leave-one-out recompute on the collected spine. */
class Round17Wave6Spec extends SparkSpec {
  import spark.implicits._

  test("gwet ac1 reproduces from a per-doc replay and carries fleiss beside it") {
    val stop = graft.text.TextFunctions.Stopwords("en").toSet
    val n1s = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text")).as[String].collect().map { text =>
        val ws = text.split(" ").filter(_.nonEmpty)
        val nW = ws.length
        val meanLen = ws.map(_.length).sum.toDouble / nW
        Seq(nW < 50, meanLen < 3.0 || meanLen > 10.0, ws.count(stop) < 2,
          ws.groupBy(identity).values.map(_.length).max.toDouble / nW > 0.2)
          .count(identity)
      }
    val n = n1s.length; val m = 4
    val pbar = n1s.map(k =>
      (k * (k - 1) + (m - k) * (m - k - 1)).toDouble / (m * (m - 1))).sum / n
    val p1 = n1s.sum.toDouble / (n * m)
    val ac1 = (pbar - 2 * p1 * (1 - p1)) / (1 - 2 * p1 * (1 - p1))
    val r = SparkEntry.queries("an_gwet_ac1")(spark, sfDir)
      .select("n_docs", "p_fail", "p_bar", "fleiss_kappa", "gwet_ac1")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 == n)
    assert(math.abs(r._5 - ac1) < 1e-5, s"AC1 ${r._5} vs $ac1")
    // fleiss beside it must equal the standalone an_fleiss_kappa key
    val fk = SparkEntry.queries("an_fleiss_kappa")(spark, sfDir)
      .select("kappa").as[Double].head()
    assert(math.abs(r._4 - fk) < 1e-9)
    // AC1 > kappa whenever prevalence is skewed away from 1/2
    if (math.abs(p1 - 0.5) > 0.05) assert(r._5 > r._4)
  }

  test("weighted kappa matches a direct rank sweep") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"),
        col("o_orderkey").cast("long"))
      .as[(String, Long, Long)].collect()
    val n = rows.length
    val ranked = rows.sortBy(r => (r._2, r._3)).zipWithIndex.map {
      case ((pri, _, _), i) =>
        (pri.substring(0, 1).toLong, (5L * (i + 1) - 1) / n + 1)
    }
    val cells = ranked.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rm = ranked.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cm = ranked.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val wo = cells.map { case ((i, j), o) => math.abs(i - j) * o }.sum
    val wrc = (for { (i, ri) <- rm; (j, cj) <- cm }
      yield math.abs(i - j) * ri * cj).sum
    val kw = 1.0 - (n.toLong * wo).toDouble / wrc
    val r = SparkEntry.queries("an_weighted_kappa")(spark, sfDir)
      .select("n", "kappa_w").as[(Long, Double)].head()
    assert(r._1 == n)
    assert(math.abs(r._2 - kw) < 1e-6, s"kw ${r._2} vs $kw")
  }

  test("dffits matches an element-wise leave-one-out recompute and flags more than cooks alone") {
    val sp = SparkEntry.dailyRevenueSpine(spark, sfDir)
      .select(col("d").cast("long"), col("rev_c"))
      .orderBy("d").as[(Long, Long)].collect()
    val x = sp.map(_._1.toDouble); val y = sp.map(_._2.toDouble)
    val n = x.length.toDouble
    val (sx, sy) = (x.sum, y.sum)
    val b = (n * x.zip(y).map(p => p._1 * p._2).sum - sx * sy) /
      (n * x.map(v => v * v).sum - sx * sx)
    val a = (sy - b * sx) / n
    val xbar = sx / n
    val sxxC = x.map(v => (v - xbar) * (v - xbar)).sum
    val e = x.zip(y).map { case (xi, yi) => yi - a - b * xi }
    val sse = e.map(v => v * v).sum
    val dffits = x.indices.map { i =>
      val h = 1.0 / n + (x(i) - xbar) * (x(i) - xbar) / sxxC
      val s2i = (sse - e(i) * e(i) / (1.0 - h)) / (n - 3.0)
      (e(i) * math.sqrt(h) / (math.sqrt(s2i) * (1.0 - h)), sp(i)._1)
    }
    // order by the ROUND(·,6) magnitude — the engine/oracle ordering
    // contract — so a rounded tie at the top-10 boundary resolves the
    // same way here as there (r17 advice #3)
    def r6(v: Double): Double = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val top = dffits.sortBy { case (v, d) => (-math.abs(r6(v)), d) }.take(10)
    val rows = SparkEntry.queries("an_dffits")(spark, sfDir)
      .select("day_no", "dffits").as[(Long, Double)].collect()
    assert(rows.length == 10)
    rows.zip(top).foreach { case ((day, v), (dv, dd)) =>
      assert(day == dd, s"top-10 order: engine day $day vs direct $dd")
      assert(math.abs(v - dv) < math.abs(dv) * 1e-4 + 1e-4, s"day $day: $v vs $dv")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Invariant + independent-recompute pins for the round-17 classical
  * family (the oracle checks exact values at sf0.01/sf0.1/sf10; these
  * pin SEMANTICS independently of the oracle text — the shared-hand
  * hazard defense): Fisher's exact against BigInt binomials, KPSS and
  * Chow against driver-side direct formulas, SPRT's LLR against its
  * own emitted counts, Breslow–Day's ψ against an_cmh's. */
class Round17StatsSpec extends SparkSpec {
  import spark.implicits._

  test("breslow-day: tarone <= bd, both nonnegative, psi matches an_cmh's or_mh") {
    val r = SparkEntry.queries("an_breslow_day")(spark, sfDir)
      .select("k_strata", "or_mh", "bd_chi2", "tarone_chi2", "df")
      .as[(Long, Double, Double, Double, Long)].head()
    assert(r._1 == 5 && r._5 == 4)
    assert(r._3 >= 0.0 && r._4 >= -1e-9, s"chi2s must be nonnegative: $r")
    assert(r._4 <= r._3 + 1e-9, s"Tarone ${r._4} must not exceed BD ${r._3}")
    // the MH common OR is the SAME estimand an_cmh emits — cross-query pin
    val cmh = SparkEntry.queries("an_cmh")(spark, sfDir)
      .select("or_mh").as[Double].head()
    assert(math.abs(r._2 - cmh) < 1e-6, s"psi ${r._2} != an_cmh or_mh $cmh")
  }

  test("fisher exact matches a BigInt hypergeometric recompute") {
    val r = SparkEntry.queries("an_fisher_exact")(spark, sfDir)
      .select("n", "n_exposed", "n_outcome", "a", "p_two", "p_less", "p_greater")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    val (nn, n1, m1, a) = (r._1.toInt, r._2.toInt, r._3.toInt, r._4.toInt)
    def choose(n: Int, k: Int): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (BigInt(n - k + 1) to BigInt(n)).product / (BigInt(1) to BigInt(k)).product
    val denom = BigDecimal(choose(nn, n1))
    val lo = math.max(0, n1 + m1 - nn); val hi = math.min(n1, m1)
    def pmf(k: Int): BigDecimal =
      BigDecimal(choose(m1, k) * choose(nn - m1, n1 - k)) / denom
    val pa = pmf(a)
    val thresh = pa * BigDecimal(1.0000001)
    val pTwo = (lo to hi).map(pmf).filter(_ <= thresh).sum
    val pLess = (lo to a).map(pmf).sum
    val pGreater = (a to hi).map(pmf).sum
    assert(math.abs(r._5 - pTwo.toDouble) < 5e-6, s"p_two ${r._5} vs exact $pTwo")
    assert(math.abs(r._6 - pLess.toDouble) < 5e-6, s"p_less ${r._6} vs exact $pLess")
    assert(math.abs(r._7 - pGreater.toDouble) < 5e-6, s"p_greater ${r._7} vs exact $pGreater")
    // both one-sided tails include k=a, so they overlap by exactly pmf(a)
    assert(math.abs((r._6 + r._7) - (1.0 + pa.toDouble)) < 1e-5)
  }

  test("sprt: llr_final reproduces from the emitted exact counts; decision consistent") {
    val r = SparkEntry.queries("an_sprt")(spark, sfDir)
      .select("n_days", "n_events", "x_purchases", "llr_final", "decision")
      .as[(Long, Long, Long, Double, String)].head()
    val llr = r._3 * SparkEntry.SprtL1 + (r._2 - r._3) * SparkEntry.SprtL0
    assert(math.abs(r._4 - llr) < 1e-6, s"llr ${r._4} vs recomputed $llr")
    assert(Set("accept_h1", "accept_h0", "continue").contains(r._5))
    // a final LLR beyond a boundary means SOME prefix crossed it first
    if (r._4 >= SparkEntry.SprtBound) assert(r._5 == "accept_h1")
    if (r._4 <= -SparkEntry.SprtBound) assert(r._5 == "accept_h0")
  }

  test("kpss matches a driver-side direct recompute of eta and the lrv ratio") {
    val daily = SparkEntry.dailyRevenueSpine(spark, sfDir)
      .select("day", "rev_c").orderBy("day")
      .as[(java.sql.Timestamp, Long)].collect()
    val y = daily.map(_._2.toDouble); val n = y.length
    val mean = y.sum / n
    val e = y.map(_ - mean)
    val s = e.scanLeft(0.0)(_ + _).drop(1) // partial sums S_t
    val l = math.floor(4.0 * math.pow(n / 100.0, 0.25)).toInt
    val g0 = e.map(v => v * v).sum / n
    val lrv = g0 + 2.0 * (1 to l).map { j =>
      (1.0 - j.toDouble / (l + 1)) *
        (j until n).map(t => e(t) * e(t - j)).sum / n
    }.sum
    val eta = s.map(v => v * v).sum / (n.toDouble * n * lrv)
    val r = SparkEntry.queries("an_kpss")(spark, sfDir)
      .select("n", "lag_l", "kpss_eta", "lrv_ratio")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 == n && r._2 == l)
    assert(math.abs(r._3 - eta) < 1e-5, s"eta ${r._3} vs direct $eta")
    assert(math.abs(r._4 - lrv / g0) < 1e-5, s"ratio ${r._4} vs direct ${lrv / g0}")
  }

  test("chow matches a driver-side two-segment OLS recompute") {
    val rows = SparkEntry.dailyRevenueSpine(spark, sfDir)
      .select(col("day").cast("date").as("day"), col("d").cast("long"), col("rev_c"))
      .as[(java.sql.Date, Long, Long)].collect()
    val split = java.sql.Date.valueOf("1998-06-01")
    val (pre, post) = rows.partition(_._1.before(split))
    def ols(xs: Array[(java.sql.Date, Long, Long)]): (Int, Double, Double) = {
      val n = xs.length
      val x = xs.map(_._2.toDouble); val yy = xs.map(_._3.toDouble)
      val xm = x.sum / n; val ym = yy.sum / n
      val sxx = x.map(v => (v - xm) * (v - xm)).sum
      val sxy = x.indices.map(i => (x(i) - xm) * (yy(i) - ym)).sum
      val syy = yy.map(v => (v - ym) * (v - ym)).sum
      (n, sxy / sxx, syy - sxy * sxy / sxx)
    }
    val (n1, b1, rss1) = ols(pre); val (n2, b2, rss2) = ols(post)
    val (_, _, rssP) = ols(rows)
    val f = ((rssP - rss1 - rss2) / 2.0) / ((rss1 + rss2) / (n1 + n2 - 4.0))
    val r = SparkEntry.queries("an_chow_test")(spark, sfDir)
      .select("n1", "n2", "slope1_c", "slope2_c", "f_stat")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 == n1 && r._2 == n2)
    assert(math.abs(r._3 - b1) < 1e-6 * math.max(1.0, math.abs(b1)))
    assert(math.abs(r._4 - b2) < 1e-6 * math.max(1.0, math.abs(b2)))
    assert(math.abs(r._5 - f) < 1e-5, s"F ${r._5} vs direct $f")
  }

  test("james-stein: shrinkage identity per group, c in [0,1], grand mean preserved") {
    val rows = SparkEntry.queries("an_james_stein")(spark, sfDir)
      .select("c_nationkey", "n_g", "raw_mean", "js_mean", "shrink_c")
      .as[(Long, Long, Double, Double, Double)].collect()
    val c = rows.head._5
    assert(c >= 0.0 && c <= 1.0, s"shrink factor $c outside [0,1]")
    assert(rows.forall(_._5 == c), "shrink factor must be shared")
    val grand = {
      // un-shrink: every group's js = grand + c·(raw − grand); with c < 1
      // the grand mean is recoverable from any row — use the first
      val r = rows.head
      if (c < 1.0 - 1e-9) (r._4 - c * r._3) / (1.0 - c) else r._4
    }
    rows.foreach { r =>
      val expected = grand + c * (r._3 - grand)
      assert(math.abs(r._4 - expected) < 1e-4,
        s"nation ${r._1}: js ${r._4} != grand + c·(raw − grand) = $expected")
    }
  }
}

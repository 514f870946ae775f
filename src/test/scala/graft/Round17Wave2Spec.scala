package graft

import org.apache.spark.sql.functions._

/** Independent-recompute pins for the round-17 wave-2 battery (the
  * shared-hand defense: the DuckDB oracle checks exact values at
  * sf0.01/sf0.1/sf1, these re-derive the SEMANTICS driver-side from
  * first principles, so a mistake mirrored into both engine and oracle
  * text still fails here). Series tests recompute from the collected
  * day spine; the spatial pair recomputes from raw customer rows; the
  * survival trio cross-pins an_logrank's algebraically-identical z. */
class Round17Wave2Spec extends SparkSpec {
  import spark.implicits._

  private lazy val spine: Array[(Long, Long)] =
    SparkEntry.dailyRevenueSpine(spark, sfDir)
      .select(col("d").cast("long"), col("rev_c"))
      .orderBy("d").as[(Long, Long)].collect()

  test("pettitt matches a direct midrank recompute (K, t*, p)") {
    val y = spine.map(_._2); val n = y.length
    val a2 = y.map(v => 2L * y.count(_ < v) + y.count(_ == v) + 1)
    var s = 0L
    val us = a2.zipWithIndex.dropRight(1).map { case (a, i) =>
      s += a; s - (i + 1L) * (n + 1L)
    }
    val k = us.map(math.abs).max
    val tStar = spine(us.indexWhere(u => math.abs(u) == k))._1
    val p = 2.0 * math.exp(-6.0 * k.toDouble * k.toDouble /
      (n.toDouble * n * n + n.toDouble * n))
    val r = SparkEntry.queries("an_pettitt")(spark, sfDir)
      .select("n", "k_stat", "t_star_d", "p_value")
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 == n && r._2 == k && r._3 == tStar)
    assert(math.abs(r._4 - p) < 1e-6, s"p ${r._4} vs direct $p")
  }

  test("buishand matches a direct partial-sum recompute") {
    val y = spine.map(v => BigInt(v._2)); val n = y.length
    val t = y.sum
    val nss = y.scanLeft(BigInt(0))(_ + _).drop(1).zipWithIndex
      .map { case (c, i) => BigInt(n) * c - BigInt(i + 1) * t }
    val m2 = (BigInt(n) * y.map(v => v * v).sum - t * t).toDouble
    val sig = math.sqrt(m2 / n)
    val rb = ((nss.max - nss.min).toDouble / n) / sig
    val q = (nss.map(_.abs).max.toDouble / n) / sig
    val r = SparkEntry.queries("an_buishand")(spark, sfDir)
      .select("n", "rb_stat", "q_stat").as[(Long, Double, Double)].head()
    assert(r._1 == n)
    assert(math.abs(r._2 - rb) < 1e-5, s"rb ${r._2} vs direct $rb")
    assert(math.abs(r._3 - q) < 1e-5, s"q ${r._3} vs direct $q")
  }

  test("von neumann matches a direct recompute and sits in (0, 4)") {
    val y = spine.map(_._2); val n = y.length
    val sdd = y.sliding(2).map { case Array(a, b) =>
      BigInt(b - a) * BigInt(b - a) }.sum
    val t = y.map(BigInt(_)).sum
    val m2 = BigInt(n) * y.map(v => BigInt(v) * BigInt(v)).sum - t * t
    val vn = (BigInt(n) * sdd).toDouble / m2.toDouble
    val r = SparkEntry.queries("an_von_neumann")(spark, sfDir)
      .select("n", "vn_ratio", "z_vn").as[(Long, Double, Double)].head()
    assert(r._1 == n)
    assert(math.abs(r._2 - vn) < 1e-5, s"vn ${r._2} vs direct $vn")
    assert(r._2 > 0.0 && r._2 < 4.0)
  }

  test("cox-stuart matches a direct pairing recompute") {
    val y = spine.map(_._2); val n = y.length
    val m = n / 2; val off = n - m
    val pairs = (0 until m).map(i => (y(i), y(i + off)))
    val sp = pairs.count { case (a, b) => b > a }
    val sm = pairs.count { case (a, b) => b < a }
    val r = SparkEntry.queries("an_cox_stuart")(spark, sfDir)
      .select("n", "n_pairs", "s_plus", "s_minus", "z_trend")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r._1 == n && r._2 == sp + sm && r._3 == sp && r._4 == sm)
    val d = sp - sm
    val z = if (d == 0) 0.0
      else math.signum(d.toDouble) * (math.abs(d) - 1.0) / math.sqrt(sp + sm)
    assert(math.abs(r._5 - z) < 1e-6)
  }

  test("wald-wolfowitz runs match a sorted-label recompute") {
    val rows = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select((col("c_mktsegment") === "BUILDING").cast("long"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"),
        col("c_custkey").cast("long"))
      .as[(Long, Long, Long)].collect()
    val sorted = rows.sortBy { case (g, v, ck) => (v, g, ck) }
    val runs = 1 + sorted.map(_._1).sliding(2)
      .count { case Array(a, b) => a != b }
    val n = sorted.length.toLong
    val n1 = sorted.map(_._1).sum
    val r = SparkEntry.queries("an_wald_wolfowitz")(spark, sfDir)
      .select("n1", "n0", "runs", "z_runs")
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 == n1 && r._2 == n - n1 && r._3 == runs)
    val mu = 1.0 + 2.0 * n1 * (n - n1) / n.toDouble
    val t2 = 2.0 * n1 * (n - n1)
    val v = t2 * (t2 - n) / (n.toDouble * n * (n - 1.0))
    assert(math.abs(r._4 - (runs - mu) / math.sqrt(v)) < 1e-6)
  }

  private lazy val nationMeans: (Array[(Long, Long, Double)], Double) = {
    val nat = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"))
      .as[(Long, Long)].collect().toMap
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_nationkey").cast("long"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long)].collect()
    val means = cust.groupBy(_._1).toArray.map { case (nk, vs) =>
      (nk, nat(nk), vs.map(_._2).sum.toDouble / vs.length)
    }
    (means, means.map(_._3).sum / means.length)
  }

  test("moran's i matches a direct all-pairs recompute over same-region weights") {
    val (means, grand) = nationMeans
    val z = means.map { case (nk, rk, m) => (rk, m - grand) }
    val k = z.length
    val num = (for {
      (ri, zi) <- z; (rj, zj) <- z if ri == rj
    } yield zi * zj).sum - z.map(v => v._2 * v._2).sum // drop i==j terms
    val den = z.map(v => v._2 * v._2).sum
    val w = z.groupBy(_._1).values.map(g => g.length.toLong * (g.length - 1)).sum
    val i = (k.toDouble / w) * (num / den)
    val r = SparkEntry.queries("an_moran_i")(spark, sfDir)
      .select("k", "w", "moran_i", "e_i", "z_i")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 == k && r._2 == w)
    assert(math.abs(r._3 - i) < 1e-5, s"I ${r._3} vs direct $i")
    assert(math.abs(r._4 - (-1.0 / (k - 1))) < 1e-6)
  }

  test("geary's c matches a direct all-pairs recompute; C and I disagree in direction around their nulls") {
    val (means, grand) = nationMeans
    val z = means.map { case (nk, rk, m) => (rk, m - grand) }
    val k = z.length
    val numc = (for {
      ((ri, zi), a) <- z.zipWithIndex
      ((rj, zj), b) <- z.zipWithIndex if ri == rj && a != b
    } yield (zi - zj) * (zi - zj)).sum
    val den = z.map(v => v._2 * v._2).sum
    val w = z.groupBy(_._1).values.map(g => g.length.toLong * (g.length - 1)).sum
    val c = ((k - 1.0) / (2.0 * w)) * (numc / den)
    val r = SparkEntry.queries("an_geary_c")(spark, sfDir)
      .select("k", "w", "geary_c", "z_c")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 == k && r._2 == w)
    assert(math.abs(r._3 - c) < 1e-5, s"C ${r._3} vs direct $c")
  }

  test("granger f matches a direct closed-form ols recompute") {
    val sp = Tables.lineitem(spark, sfDir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
          .cast("bigint").as("y"),
        sum(col("l_quantity").cast("decimal(24,0)")).cast("bigint").as("x"))
      .orderBy("day").select("y", "x").as[(Long, Long)].collect()
    val rows = sp.sliding(2).map { case Array((yp, xp), (yt, _)) =>
      (yt.toDouble, yp.toDouble, xp.toDouble) }.toArray
    val n = rows.length.toDouble
    def s(f: ((Double, Double, Double)) => Double) = rows.map(f).sum
    val (sw, su, sv) = (s(_._1), s(_._2), s(_._3))
    val (suu, svv, sww) = (s(r => r._2 * r._2), s(r => r._3 * r._3), s(r => r._1 * r._1))
    val (suv, suw, svw) = (s(r => r._2 * r._3), s(r => r._2 * r._1), s(r => r._3 * r._1))
    val (cuu, cvv, cww) = (n * suu - su * su, n * svv - sv * sv, n * sww - sw * sw)
    val (cuv, cuw, cvw) = (n * suv - su * sv, n * suw - su * sw, n * svw - sv * sw)
    val det = cuu * cvv - cuv * cuv
    val b = (cuw * cvv - cvw * cuv) / det
    val c = (cvw * cuu - cuw * cuv) / det
    val rssr = (cww - cuw * cuw / cuu) / n
    val rssu = (cww - b * cuw - c * cvw) / n
    val f = (rssr - rssu) / (rssu / (n - 3.0))
    val r = SparkEntry.queries("an_granger")(spark, sfDir)
      .select("f_stat", "x_coef", "rss_gain").as[(Double, Double, Double)].head()
    assert(math.abs(r._1 - f) < math.abs(f) * 1e-6 + 1e-4, s"F ${r._1} vs direct $f")
    assert(math.abs(r._2 - c) < math.abs(c) * 1e-6 + 1e-4)
    assert(r._3 >= 0.0 && r._3 <= 1.0)
  }

  test("weibull fit matches a direct median-rank ols recompute") {
    val v = Tables.orders(spark, sfDir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"),
        col("o_orderkey").cast("long"))
      .as[(Long, Long)].collect().sortBy(identity).map(_._1)
    val n = v.length
    val pts = v.zipWithIndex.map { case (vc, i) =>
      val x = math.log(vc.toDouble / 100.0)
      val fq = (i + 1 - 0.3) / (n + 0.4)
      (x, math.log(-math.log(1.0 - fq)))
    }
    val nd = n.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    val icept = (sy - slope * sx) / nd
    val r = SparkEntry.queries("an_weibull_fit")(spark, sfDir)
      .select("n", "shape", "scale", "r2")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 == n)
    assert(math.abs(r._2 - slope) < 1e-4, s"shape ${r._2} vs direct $slope")
    assert(math.abs(r._3 - math.exp(-(icept / slope))) < r._3 * 1e-4)
    assert(r._4 > 0.5 && r._4 <= 1.0, s"median-rank fit should be tight, r2=${r._4}")
  }

  test("weighted logrank's unweighted z equals an_logrank's (identical algebra, different tree)") {
    val trio = SparkEntry.queries("an_weighted_logrank")(spark, sfDir)
      .select("z_logrank", "z_gehan", "z_tarone_ware")
      .as[(Double, Double, Double)].head()
    val lr = SparkEntry.queries("an_logrank")(spark, sfDir)
      .select("z_logrank").as[Double].head()
    assert(math.abs(trio._1 - lr) < 2e-6, s"${trio._1} vs an_logrank $lr")
    // TW sits between Gehan and logrank by construction (w = √(n_t/N)
    // is pointwise between n_t/N and 1) — not a theorem for z's in
    // general, but holds whenever the (d1−e) signs are consistent;
    // assert the weak version: same sign across the trio
    assert(Seq(trio._1, trio._2, trio._3).map(math.signum).distinct.size <= 2)
  }

  test("coverage curve is monotone, exact at the tail, and consistent") {
    val rows = SparkEntry.queries("text_coverage_curve")(spark, sfDir)
      .select("k", "top_terms", "covered", "total", "coverage")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 5L, 10L, 25L, 100L, 10000L))
    assert(rows.sliding(2).forall { case Array(a, b) =>
      a._3 <= b._3 && a._2 <= b._2 })
    val vocabSized = rows.last
    assert(vocabSized._3 == vocabSized._4 && vocabSized._5 == 1.0,
      "k=10000 >= vocab must cover every token")
    rows.foreach(r => assert(r._2 == math.min(r._1, vocabSized._2)))
  }

  test("heaps fit is a plausible saturating-corpus fit") {
    val r = SparkEntry.queries("text_heaps_fit")(spark, sfDir)
      .select("n_checkpoints", "heaps_beta", "heaps_k", "r2")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 > 0)
    // 31-word synthetic vocab saturates in the first bucket: β ≈ 0 is
    // CORRECT here (a real corpus sits near 0.4–0.6) — pin the range
    // loosely and the fit-quality bounds exactly
    assert(r._2 >= 0.0 && r._2 < 1.2, s"beta ${r._2}")
    assert(r._3 > 0.0)
    assert(r._4 >= 0.0 && r._4 <= 1.0)
  }
}

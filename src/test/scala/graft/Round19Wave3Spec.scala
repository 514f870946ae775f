package graft

import org.apache.spark.sql.functions._

/** Independent-recompute pins for the r19 THIRD operator wave (same
  * posture as [[Round19WaveSpec]]/[[Round19Wave2Spec]]): every
  * statistic re-derived driver-side from the raw collected data with
  * plain Scala doubles/BigInt/BigDecimal and NONE of the query
  * machinery, so a semantic error common to the Scala kernel and its
  * SQL oracle (the same-hand hazard) still fails here. */
class Round19Wave3Spec extends SparkSpec {
  import spark.implicits._

  private def close(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  private def orderCents: Array[Long] =
    Tables.orders(spark, sfDir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[Long].collect()

  private def segCents: Map[String, Array[Long]] =
    Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(String, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap

  test("g-test matches a direct crosstab likelihood-ratio recompute") {
    val rows = Tables.events(spark, sfDir)
      .select(col("event_type"),
        pmod(datediff(col("ts").cast("date"), lit("1992-01-01").cast("date")),
          lit(7)).cast("long"))
      .as[(String, Long)].collect()
    val cells = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toDouble
    val rt = rows.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val ct = rows.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val g = 2.0 * cells.map { case ((r, c), o) =>
      o * math.log(o * n / (rt(r) * ct(c)))
    }.sum
    val chi2 = cells.map { case ((r, c), o) =>
      val e = rt(r) * ct(c) / n; (o - e) * (o - e) / e
    }.sum
    val got = SparkEntry.queries("an_g_test")(spark, sfDir)
      .select("g_stat", "chi2", "df").as[(Double, Double, Long)].head()
    assert(close(got._1, g, 1e-5), s"${got._1} vs $g")
    assert(close(got._2, chi2, 1e-5), s"${got._2} vs $chi2")
    assert(got._3 == (rt.size - 1).toLong * (ct.size - 1))
  }

  test("scheffe matches a direct per-pair contrast recompute") {
    val byG = segCents
    val k = byG.size.toDouble
    val n = byG.values.map(_.length).sum.toDouble
    val ssw = byG.values.map { vs =>
      val m = vs.map(_.toDouble).sum / vs.length
      vs.map(v => (v - m) * (v - m)).sum
    }.sum
    val msw = ssw / (n - k)
    val means = byG.view.mapValues(vs => vs.map(_.toDouble).sum / vs.length).toMap
    val got = SparkEntry.queries("an_scheffe")(spark, sfDir)
      .select("g1", "g2", "mean_diff_usd", "f_scheffe")
      .as[(String, String, Double, Double)].collect()
    assert(got.length == byG.size * (byG.size - 1) / 2)
    got.foreach { case (g1, g2, md, f) =>
      val diff = means(g1) - means(g2)
      val fExp = diff * diff /
        ((k - 1) * msw * (1.0 / byG(g1).length + 1.0 / byG(g2).length))
      assert(close(md, diff / 100.0, 1e-5), s"$g1/$g2 $md vs ${diff / 100.0}")
      assert(close(f, fExp, 1e-4), s"$g1/$g2 $f vs $fExp")
    }
  }

  test("woolf matches a direct stratified log-OR recompute") {
    val rows = SparkEntry.churnLabeled(spark, sfDir)
      .select(col("c_mktsegment"), col("g1"), (col("v") > 0).cast("long"))
      .as[(String, Long, Long)].collect()
    val strata = rows.groupBy(_._1).values.map { vs =>
      val a = vs.count(r => r._2 == 1 && r._3 == 1) + 0.5
      val b = vs.count(r => r._2 == 1 && r._3 == 0) + 0.5
      val c = vs.count(r => r._2 == 0 && r._3 == 1) + 0.5
      val d = vs.count(r => r._2 == 0 && r._3 == 0) + 0.5
      val lor = math.log(a * d / (b * c))
      val w = 1.0 / (1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
      (w, lor)
    }
    val sw = strata.map(_._1).sum
    val swl = strata.map { case (w, l) => w * l }.sum
    val chi2 = strata.map { case (w, l) => w * l * l }.sum - swl * swl / sw
    val got = SparkEntry.queries("an_woolf")(spark, sfDir)
      .select("lor_pooled", "chi2_woolf").as[(Double, Double)].head()
    assert(close(got._1, swl / sw, 1e-5), s"${got._1} vs ${swl / sw}")
    assert(close(got._2, chi2, 1e-4), s"${got._2} vs $chi2")
  }

  test("stuart-maxwell matches a direct first/last bucket recompute") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate").cast("string"),
        col("o_orderkey"), substring(col("o_orderpriority"), 1, 1))
      .as[(Long, String, Long, String)].collect()
    def bucket(p: String): Int =
      if (p == "1" || p == "2") 0 else if (p == "3") 1 else 2
    val fl = rows.groupBy(_._1).values.map { os =>
      val sorted = os.sortBy(o => (o._2, o._3))
      (bucket(sorted.head._4), bucket(sorted.last._4))
    }.toSeq
    val cell = Array.ofDim[Long](3, 3)
    fl.foreach { case (f, l) => cell(f)(l) += 1 }
    def r(i: Int) = (0 to 2).map(cell(i)(_)).sum
    def c(i: Int) = (0 to 2).map(cell(_)(i)).sum
    val d1 = (r(0) - c(0)).toDouble; val d2 = (r(1) - c(1)).toDouble
    val s11 = (r(0) + c(0) - 2 * cell(0)(0)).toDouble
    val s22 = (r(1) + c(1) - 2 * cell(1)(1)).toDouble
    val s12 = (cell(0)(1) + cell(1)(0)).toDouble
    val chi2 = (d1 * d1 * s22 + d2 * d2 * s11 + 2 * d1 * d2 * s12) /
      (s11 * s22 - s12 * s12)
    val got = SparkEntry.queries("an_stuart_maxwell")(spark, sfDir)
      .select("n", "chi2_sm").as[(Long, Double)].head()
    assert(got._1 == fl.size)
    assert(close(got._2, chi2, 1e-5), s"${got._2} vs $chi2")
  }

  test("beta fit matches a direct method-of-moments recompute") {
    val ds = Tables.lineitem(spark, sfDir)
      .select((col("l_discount").cast("decimal(4,2)") * 100).cast("bigint"))
      .as[Long].collect().map(_ / 10.0)
    val n = ds.length.toDouble
    val m = ds.sum / n
    val v = ds.map(x => x * x).sum / n - m * m
    val c = m * (1 - m) / v - 1
    val got = SparkEntry.queries("an_beta_fit")(spark, sfDir)
      .select("mean", "var", "alpha", "beta")
      .as[(Double, Double, Double, Double)].head()
    assert(close(got._1, m, 1e-5) && close(got._2, v, 1e-5))
    assert(close(got._3, m * c, 1e-4), s"${got._3} vs ${m * c}")
    assert(close(got._4, (1 - m) * c, 1e-4))
  }

  test("negbin fit matches a direct count-moment recompute") {
    val perCust = Tables.orders(spark, sfDir).groupBy("o_custkey").count()
      .as[(Long, Long)].collect().toMap
    val ks = Tables.customer(spark, sfDir).select(col("c_custkey"))
      .as[Long].collect().map(ck => perCust.getOrElse(ck, 0L).toDouble)
    val n = ks.length.toDouble
    val m = ks.sum / n
    val v = ks.map(x => x * x).sum / n - m * m
    val got = SparkEntry.queries("an_negbin_fit")(spark, sfDir)
      .select("mean", "var", "nb_r", "nb_p", "dispersion")
      .as[(Double, Double, Option[Double], Option[Double], Double)].head()
    assert(close(got._1, m, 1e-5) && close(got._2, v, 1e-5))
    if (v > m) {
      assert(close(got._3.get, m * m / (v - m), 1e-4), s"${got._3}")
      assert(close(got._4.get, m / v, 1e-5))
    } else {
      // sf0.001 is EXACTLY equidispersed (σ² = μ = 10): the NB moment
      // fit is undefined and the contract is NULL, not an ANSI error
      assert(got._3.isEmpty && got._4.isEmpty)
    }
    assert(close(got._5, v / m, 1e-5))
  }

  test("mahalanobis matches a direct covariance-inverse recompute") {
    val perCust = Tables.orders(spark, sfDir).groupBy("o_custkey").count()
      .as[(Long, Long)].collect().toMap
    val pts = Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long)].collect()
      .map { case (ck, bal) => (bal.toDouble, perCust.getOrElse(ck, 0L).toDouble) }
    val n = pts.length.toDouble
    val mx = pts.map(_._1).sum / n; val my = pts.map(_._2).sum / n
    val sxx = pts.map(p => (p._1 - mx) * (p._1 - mx)).sum / n
    val syy = pts.map(p => (p._2 - my) * (p._2 - my)).sum / n
    val sxy = pts.map(p => (p._1 - mx) * (p._2 - my)).sum / n
    val det = sxx * syy - sxy * sxy
    val d2s = pts.map { case (x, y) =>
      val zx = x - mx; val zy = y - my
      (zx * zx * syy + zy * zy * sxx - 2 * zx * zy * sxy) / det
    }
    val got = SparkEntry.queries("an_mahalanobis")(spark, sfDir)
      .select("n", "n_out95", "n_out99", "d2_max")
      .as[(Long, Long, Long, Double)].head()
    assert(got._1 == pts.length)
    assert(got._2 == d2s.count(_ > 5.991464547107979))
    assert(got._3 == d2s.count(_ > 9.21034037197618))
    assert(close(got._4, d2s.max, 1e-5), s"${got._4} vs ${d2s.max}")
  }

  test("pca2 matches a direct closed-form eigen recompute") {
    val pts = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("bigint"),
        (col("l_extendedprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long)].collect()
      .map { case (x, y) => (x.toDouble, y.toDouble) }
    val n = pts.length.toDouble
    val mx = pts.map(_._1).sum / n; val my = pts.map(_._2).sum / n
    val cxx = pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val cyy = pts.map(p => (p._2 - my) * (p._2 - my)).sum
    val cxy = pts.map(p => (p._1 - mx) * (p._2 - my)).sum
    val tr = cxx + cyy
    val disc = math.sqrt((cxx - cyy) * (cxx - cyy) + 4 * cxy * cxy)
    val got = SparkEntry.queries("an_pca2")(spark, sfDir)
      .select("explained_ratio", "lambda_ratio", "theta", "corr")
      .as[(Double, Double, Double, Double)].head()
    assert(close(got._1, (tr + disc) / (2 * tr), 1e-5))
    assert(close(got._2, (tr - disc) / (tr + disc), 1e-4))
    assert(close(got._3, math.atan2(2 * cxy, cxx - cyy) / 2, 1e-5))
    assert(close(got._4, cxy / math.sqrt(cxx * cyy), 1e-5))
  }

  test("jackknife ratio matches a direct delete-one recompute") {
    val rows = Tables.lineitem(spark, sfDir)
      .join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)").cast("string"),
        col("l_quantity").cast("bigint"))
      .as[(Long, String, Long)].collect()
    val per = rows.groupBy(_._1).view.mapValues { vs =>
      val rev = vs.map(v => BigDecimal(v._2)).sum
        .setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100
      (rev.toLong, vs.map(_._3).sum)
    }.toMap
    val k = per.size.toDouble
    val tr = per.values.map(_._1).sum.toDouble
    val tq = per.values.map(_._2).sum.toDouble
    val this_ = per.values.map { case (r, q) => (tr - r) / (tq - q) }.toSeq
    val tdot = this_.sum / k
    val se = math.sqrt((k - 1) / k * this_.map(t => (t - tdot) * (t - tdot)).sum)
    val got = SparkEntry.queries("an_jackknife_ratio")(spark, sfDir)
      .select("k", "theta", "se_jack", "bias_jack")
      .as[(Long, Double, Double, Double)].head()
    assert(got._1 == per.size)
    assert(close(got._2, tr / tq, 1e-5))
    assert(close(got._3, se, 1e-4), s"${got._3} vs $se")
    assert(close(got._4, (k - 1) * (tdot - tr / tq), 1e-4))
  }

  test("cointegration matches a direct residual-DF recompute") {
    val sp = Tables.lineitem(spark, sfDir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("y"),
        sum(col("l_quantity").cast("bigint")).as("x"))
      .withColumn("d",
        datediff(col("day").cast("date"), lit("1992-01-01").cast("date")))
      .select(col("d").cast("long"), col("x"), col("y"))
      .orderBy("d").as[(Long, Long, Long)].collect()
    val n = BigInt(sp.length)
    val sx = sp.map(r => BigInt(r._2)).sum
    val sy = sp.map(r => BigInt(r._3)).sum
    val sxx = sp.map(r => BigInt(r._2) * r._2).sum
    val sxy = sp.map(r => BigInt(r._2) * r._3).sum
    val cxx = n * sxx - sx * sx
    val cxy = n * sxy - sx * sy
    val rs = sp.map(r => cxx * (n * r._3 - sy) - cxy * (n * r._2 - sx))
    val rmax = rs.map(_.abs).max.toDouble
    val u = rs.map(_.toDouble / rmax)
    val xs = u.dropRight(1); val ys = u.drop(1).zip(xs).map(p => p._1 - p._2)
    val n2 = xs.length.toDouble
    val sx2 = xs.sum; val sy2 = ys.sum
    val sxx2 = xs.map(x => x * x).sum
    val sxy2 = xs.zip(ys).map(p => p._1 * p._2).sum
    val syy2 = ys.map(y => y * y).sum
    val den = n2 * sxx2 - sx2 * sx2
    val b1 = (n2 * sxy2 - sx2 * sy2) / den
    val b0 = (sy2 - b1 * sx2) / n2
    val sse = syy2 - b0 * sy2 - b1 * sxy2
    val t = b1 / math.sqrt(sse / (n2 - 2) * n2 / den)
    val got = SparkEntry.queries("an_cointegration")(spark, sfDir)
      .select("n_days", "b_coint", "rho", "t_eg")
      .as[(Long, Double, Double, Double)].head()
    assert(got._1 == sp.length)
    assert(close(got._2, cxy.toDouble / cxx.toDouble, 1e-4))
    assert(close(got._3, b1, 1e-4), s"${got._3} vs $b1")
    assert(close(got._4, t, 1e-3), s"${got._4} vs $t")
  }

  test("lorenz asymmetry matches a direct sorted-interpolation recompute") {
    val vs = orderCents.sorted
    val n = vs.length
    val t = vs.map(BigInt(_)).sum.toDouble
    val mu = t / n
    val m = vs.count(_ < mu)
    val lm = vs.filter(_ < mu).map(BigInt(_)).sum.toDouble
    val xm = vs(m - 1).toDouble; val xm1 = vs(m).toDouble
    val delta = (mu - xm) / (xm1 - xm)
    val f = (m + delta) / n
    val l = (lm + delta * xm1) / t
    val got = SparkEntry.queries("an_lorenz_asymmetry")(spark, sfDir)
      .select("f_mu", "l_mu", "lac").as[(Double, Double, Double)].head()
    assert(close(got._1, f, 1e-5), s"${got._1} vs $f")
    assert(close(got._2, l, 1e-5), s"${got._2} vs $l")
    assert(close(got._3, f + l, 1e-5))
  }
}

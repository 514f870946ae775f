package graft

import org.apache.spark.sql.functions._

/** Independent-recompute pins for the r19 second operator wave (same
  * posture as [[Round19WaveSpec]]): every statistic re-derived
  * driver-side from the raw collected data with plain Scala
  * doubles/BigInt and NONE of the query machinery — a semantic error
  * common to the Scala kernel and its SQL oracle still fails here. */
class Round19Wave2Spec extends SparkSpec {
  import spark.implicits._

  private def close(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  private def spine: Array[Long] =
    SparkEntry.dailyRevenueSpine(spark, sfDir)
      .select(col("d").cast("long"), col("rev_c"))
      .orderBy("d").as[(Long, Long)].collect().map(_._2)

  private def balCents(segs: String*): Map[String, Array[Long]] =
    Tables.customer(spark, sfDir)
      .filter(if (segs.isEmpty) lit(true) else col("c_mktsegment").isin(segs: _*))
      .select(col("c_mktsegment"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(String, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2)).toMap

  private def ols1(xs: Array[Double], ys: Array[Double]): (Double, Double) = {
    val n = xs.length.toDouble
    val sx = xs.sum; val sy = ys.sum
    val cxx = n * xs.map(x => x * x).sum - sx * sx
    val cxy = n * xs.zip(ys).map { case (x, y) => x * y }.sum - sx * sy
    val cyy = n * ys.map(y => y * y).sum - sy * sy
    val rho = cxy / cxx
    val s2 = (cyy - rho * cxy) / (n * (n - 2.0))
    (rho, math.sqrt(s2 * n / cxx)) // slope, se(slope)
  }

  test("dickey-fuller matches a direct lag-OLS recompute") {
    val y = spine.map(_.toDouble)
    val xs = y.dropRight(1); val dys = y.sliding(2).map(w => w(1) - w(0)).toArray
    val (rho, se) = ols1(xs, dys)
    val r = SparkEntry.queries("an_dickey_fuller")(spark, sfDir)
      .select("rho", "t_df").as[(Double, Double)].head()
    assert(close(r._1, rho, 1e-5) && close(r._2, rho / se, 1e-5),
      s"$r vs ($rho, ${rho / se})")
  }

  test("variance ratio matches a direct overlapping-sum recompute") {
    val q = 5
    val y = spine.map(_.toDouble)
    val r1 = y.sliding(2).map(w => w(1) - w(0)).toArray
    val rq = y.indices.drop(q).map(i => y(i) - y(i - q)).toArray
    val m = r1.length.toDouble
    val mu = r1.sum / m
    val v1 = r1.map(x => (x - mu) * (x - mu)).sum / m
    val vq = rq.map(x => (x - q * mu) * (x - q * mu)).sum / (rq.length * q.toDouble)
    val vr = vq / v1
    val z = (vr - 1.0) / math.sqrt(2.0 * (2 * q - 1) * (q - 1) / (3.0 * q * m))
    val got = SparkEntry.queries("an_variance_ratio")(spark, sfDir)
      .select("vr", "z").as[(Double, Double)].head()
    assert(close(got._1, vr, 1e-5) && close(got._2, z, 1e-5), s"$got vs ($vr, $z)")
  }

  test("arch lm matches a direct squared-residual regression") {
    val y = spine.map(_.toDouble)
    val r1 = y.sliding(2).map(w => w(1) - w(0)).toArray
    val mu = r1.sum / r1.length
    val e2 = r1.map(x => (x - mu) * (x - mu))
    val xs = e2.dropRight(1); val ys = e2.drop(1)
    val n = xs.length.toDouble
    val sx = xs.sum; val sy = ys.sum
    val cxx = n * xs.map(x => x * x).sum - sx * sx
    val cyy = n * ys.map(x => x * x).sum - sy * sy
    val cxy = n * xs.zip(ys).map { case (a, b) => a * b }.sum - sx * sy
    val r2 = cxy * cxy / (cxx * cyy)
    val got = SparkEntry.queries("an_arch_lm")(spark, sfDir)
      .select("r2", "lm_stat").as[(Double, Double)].head()
    assert(close(got._1, r2, 1e-4) && close(got._2, n * r2, 1e-4),
      s"$got vs ($r2, ${n * r2})")
  }

  test("dagostino matches a direct moment-transform recompute") {
    val vs = balCents().values.flatten.map(_.toDouble).toArray
    val n = vs.length.toDouble
    val mu = vs.sum / n
    def cm(p: Int) = vs.map(v => math.pow(v - mu, p)).sum / n
    val m2 = cm(2); val b1 = cm(3) / math.pow(m2, 1.5); val b2 = cm(4) / (m2 * m2)
    val yv = b1 * math.sqrt((n + 1) * (n + 3) / (6 * (n - 2)))
    val beta2 = 3.0 * (n * n + 27 * n - 70) * (n + 1) * (n + 3) /
      ((n - 2) * (n + 5) * (n + 7) * (n + 9))
    val w2 = math.sqrt(2 * (beta2 - 1)) - 1
    val delta = 1.0 / math.sqrt(math.log(math.sqrt(w2)))
    val alpha = math.sqrt(2.0 / (w2 - 1))
    val z1 = delta * math.log(yv / alpha + math.sqrt(yv / alpha * (yv / alpha) + 1))
    val eb2 = 3 * (n - 1) / (n + 1)
    val vb2 = 24 * n * (n - 2) * (n - 3) / ((n + 1) * (n + 1) * (n + 3) * (n + 5))
    val xk = (b2 - eb2) / math.sqrt(vb2)
    val sb1m = 6 * (n * n - 5 * n + 2) / ((n + 7) * (n + 9)) *
      math.sqrt(6 * (n + 3) * (n + 5) / (n * (n - 2) * (n - 3)))
    val aa = 6 + 8 / sb1m * (2 / sb1m + math.sqrt(1 + 4 / (sb1m * sb1m)))
    val z2 = ((1 - 2 / (9 * aa)) -
      math.cbrt((1 - 2 / aa) / (1 + xk * math.sqrt(2 / (aa - 4))))) *
      math.sqrt(9 * aa / 2)
    val got = SparkEntry.queries("an_dagostino")(spark, sfDir)
      .select("z_skew", "z_kurt", "k2_stat").as[(Double, Double, Double)].head()
    assert(close(got._1, z1, 1e-4) && close(got._2, z2, 1e-4) &&
      close(got._3, z1 * z1 + z2 * z2, 1e-4), s"$got vs ($z1, $z2)")
  }

  test("hartley/cochran match direct group variances") {
    val groups = balCents().values.map { vs =>
      val n = vs.length.toDouble
      val mu = vs.sum.toDouble / n
      vs.map(v => (v - mu) * (v - mu)).sum / (n - 1)
    }.toArray
    val fmax = groups.max / groups.min
    val cc = groups.max / groups.sum
    val got = SparkEntry.queries("an_hartley")(spark, sfDir)
      .select("f_max", "cochran_c").as[(Double, Double)].head()
    assert(close(got._1, fmax, 1e-5) && close(got._2, cc, 1e-5),
      s"$got vs ($fmax, $cc)")
  }

  test("point-biserial matches a direct two-group recompute") {
    val rows = Tables.orders(spark, sfDir)
      .select((col("o_orderpriority") === "1-URGENT").cast("long"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long)].collect()
    val n = rows.length.toDouble
    val g1 = rows.filter(_._1 == 1).map(_._2.toDouble)
    val g0 = rows.filter(_._1 == 0).map(_._2.toDouble)
    val mu = rows.map(_._2.toDouble).sum / n
    val sPop = math.sqrt(rows.map(r => (r._2 - mu) * (r._2 - mu)).sum / n)
    val r = (g1.sum / g1.length - g0.sum / g0.length) / sPop *
      math.sqrt(g1.length.toDouble * g0.length) / n
    val t = r * math.sqrt((n - 2) / (1 - r * r))
    val got = SparkEntry.queries("an_point_biserial")(spark, sfDir)
      .select("r_pb", "t").as[(Double, Double)].head()
    assert(close(got._1, r, 1e-5) && close(got._2, t, 1e-5), s"$got vs ($r, $t)")
  }

  test("lin ccc matches a direct paired-moment recompute") {
    val charge = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_orderkey"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
        (lit(1.0) + col("l_tax"))).cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("y"))
    val pairs = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("x"))
      .join(charge, col("o_orderkey") === col("l_orderkey"))
      .select(col("x"), col("y")).as[(Long, Long)].collect()
    val n = pairs.length.toDouble
    val mx = pairs.map(_._1.toDouble).sum / n; val my = pairs.map(_._2.toDouble).sum / n
    val sxx = pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum / n
    val syy = pairs.map(p => (p._2 - my) * (p._2 - my)).sum / n
    val sxy = pairs.map(p => (p._1 - mx) * (p._2 - my)).sum / n
    val ccc = 2 * sxy / (sxx + syy + (mx - my) * (mx - my))
    val got = SparkEntry.queries("an_lin_ccc")(spark, sfDir)
      .select("ccc", "pearson_r").as[(Double, Double)].head()
    assert(close(got._1, ccc, 1e-5), s"${got._1} vs $ccc")
    assert(close(got._2, sxy / math.sqrt(sxx * syy), 1e-5))
  }

  test("icc matches a direct one-way ANOVA recompute") {
    val byG = balCents()
    val k = byG.size.toDouble
    val all = byG.values.flatten.map(_.toDouble).toArray
    val nn = all.length.toDouble
    val gm = all.sum / nn
    val ssb = byG.values.map { vs =>
      val m = vs.map(_.toDouble).sum / vs.length
      vs.length * (m - gm) * (m - gm)
    }.sum
    val ssw = byG.values.map { vs =>
      val m = vs.map(_.toDouble).sum / vs.length
      vs.map(v => (v - m) * (v - m)).sum
    }.sum
    val msb = ssb / (k - 1); val msw = ssw / (nn - k)
    val k0 = (nn - byG.values.map(v => v.length.toDouble * v.length).sum / nn) / (k - 1)
    val icc = (msb - msw) / (msb + (k0 - 1) * msw)
    val got = SparkEntry.queries("an_icc")(spark, sfDir)
      .select("icc1").as[Double].head()
    assert(close(got, icc, 1e-5), s"$got vs $icc")
  }

  test("gk gamma / tau-c match a direct pair count over the crosstab") {
    val cells = Tables.orders(spark, sfDir)
      .select(substring(col("o_orderpriority"), 1, 1).cast("int"),
        when(col("o_totalprice") < 50000, 1).when(col("o_totalprice") < 100000, 2)
          .when(col("o_totalprice") < 200000, 3).when(col("o_totalprice") < 350000, 4)
          .otherwise(5))
      .as[(Int, Int)].collect().groupBy(identity).view.mapValues(_.length.toLong).toMap
    var p = BigInt(0); var q = BigInt(0); var n = 0L
    for (((i, j), nij) <- cells) {
      n += nij
      for (((i2, j2), n2) <- cells) {
        val s = (i2 - i) * (j2 - j)
        if (s > 0) p += BigInt(nij) * n2 else if (s < 0) q += BigInt(nij) * n2
      }
    }
    val gamma = (p - q).toDouble / (p + q).toDouble
    val tauC = 5.0 * (p - q).toDouble / (n.toDouble * n * 4.0)
    val got = SparkEntry.queries("an_gk_gamma")(spark, sfDir)
      .select("gamma", "tau_c").as[(Double, Double)].head()
    assert(close(got._1, gamma, 1e-5) && close(got._2, tauC, 1e-5),
      s"$got vs ($gamma, $tauC)")
  }

  test("sobel matches a direct two-regression recompute") {
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("bigint"),
        (col("l_discount").cast("decimal(12,2)") * 100).cast("bigint"),
        ((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)") * 10000).cast("bigint"))
      .as[(Long, Long, Long)].collect()
    val n = rows.length.toDouble
    val x = rows.map(_._1.toDouble); val m = rows.map(_._2.toDouble)
    val y = rows.map(_._3.toDouble)
    def c(a: Array[Double], b: Array[Double]) = {
      val ma = a.sum / n; val mb = b.sum / n
      a.zip(b).map { case (u, v) => (u - ma) * (v - mb) }.sum
    }
    val (sxx, smm, syy) = (c(x, x), c(m, m), c(y, y))
    val (sxm, sxy, smy) = (c(x, m), c(x, y), c(m, y))
    val a = sxm / sxx
    val seA2 = (smm - a * sxm) / (n - 2) / sxx
    val det = sxx * smm - sxm * sxm
    val b = (sxx * smy - sxm * sxy) / det
    val cx = (smm * sxy - sxm * smy) / det
    val sig2 = (syy - b * smy - cx * sxy) / (n - 3)
    val seB2 = sig2 * sxx / det
    val z = a * b / math.sqrt(b * b * seA2 + a * a * seB2)
    val got = SparkEntry.queries("an_sobel")(spark, sfDir)
      .select("a_coef", "b_coef", "sobel_z").as[(Double, Double, Double)].head()
    assert(close(got._1, a, 1e-5) && close(got._2, b, 1e-5) &&
      close(got._3, z, 1e-4), s"$got vs ($a, $b, $z)")
  }

  test("siegel-tukey matches a direct positional rank assignment") {
    val byG = balCents("BUILDING", "AUTOMOBILE")
    val pooled = (byG("BUILDING").map((_, 1)) ++ byG("AUTOMOBILE").map((_, 0)))
      .sortBy(_._1)
    val nn = pooled.length
    // positional outside-in ranks, then midrank-average ties
    val h = (nn + 1) / 2
    def aOf(p: Int): Long =
      if (p <= h) { if (p % 2 == 1) 2L * p - 1 else 2L * p }
      else { val t = nn + 1 - p; if (t % 2 == 1) 2L * t else 2L * t - 1 }
    val ranks = (1 to nn).map(aOf).toArray
    // tie-average
    val avg = new Array[Double](nn)
    var i = 0
    while (i < nn) {
      var j = i
      while (j + 1 < nn && pooled(j + 1)._1 == pooled(i)._1) j += 1
      val m = (i to j).map(ranks(_)).sum.toDouble / (j - i + 1)
      (i to j).foreach(avg(_) = m)
      i = j + 1
    }
    val w = pooled.indices.filter(pooled(_)._2 == 1).map(avg(_)).sum
    val nb = byG("BUILDING").length.toDouble
    val na = byG("AUTOMOBILE").length.toDouble
    val ties = pooled.groupBy(_._1).values.map(_.length.toLong)
      .map(t => t * t * t - t).sum.toDouble
    val varw = nb * na / 12.0 * ((nn + 1) - ties / (nn.toDouble * (nn - 1)))
    val z = (w - nb * (nn + 1) / 2.0) / math.sqrt(varw)
    val got = SparkEntry.queries("an_siegel_tukey")(spark, sfDir)
      .select("w_st", "z").as[(Double, Double)].head()
    assert(close(got._1, w, 1e-6) && close(got._2, z, 1e-5), s"$got vs ($w, $z)")
  }

  test("kde matches a direct kernel sum") {
    val vs = balCents().values.flatten.map(_.toDouble / 100.0).toArray
    val n = vs.length
    val grid = (0 until 21).map(k => -1000.0 + 550.0 * k)
    val dens = grid.map(g =>
      (g, vs.map(v => math.exp(-(v - g) * (v - g) / (2 * 500.0 * 500.0))).sum /
        (n * 500.0 * math.sqrt(2 * math.Pi))))
    val got = SparkEntry.queries("an_kde")(spark, sfDir)
      .select("grid_usd", "density").as[(Double, Double)].collect().sortBy(_._1)
    got.zip(dens).foreach { case (g, d) =>
      assert(g._1 == d._1 && close(g._2, d._2, 1e-5), s"$g vs $d")
    }
  }

  test("train/test split matches a direct md5 recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val agg = docs.map { case (id, text) =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h = Integer.parseInt(hex.take(2), 16) % 10
      val split = if (h < 8) "train" else if (h == 8) "val" else "test"
      (split, text.trim.split("\\s+").length.toLong)
    }.groupBy(_._1).view.mapValues(ts => (ts.length.toLong, ts.map(_._2).sum)).toMap
    val got = SparkEntry.queries("etl_train_test_split")(spark, sfDir)
      .select("split", "n_docs", "tokens").as[(String, Long, Long)].collect()
    got.foreach { case (s, nd, tk) =>
      assert(agg(s) == ((nd, tk)), s"$s: ($nd,$tk) vs ${agg(s)}")
    }
    assert(got.map(_._2).sum == docs.length)
  }

  test("unigram xent matches a direct corpus-LM recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("text")).as[String].collect()
    val tokens = docs.map(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
    val freq = tokens.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val t = freq.values.sum.toDouble
    val xents = tokens.filter(_.nonEmpty).map { ws =>
      ws.map(w => -math.log(freq(w) / t) / math.log(2.0)).sum / ws.length
    }
    val buckets = xents.map(x =>
      if (x < 6) "a_lt6" else if (x < 8) "b_6_8" else if (x < 10) "c_8_10" else "d_ge10")
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val meanByB = xents.zip(xents.map(x =>
      if (x < 6) "a_lt6" else if (x < 8) "b_6_8" else if (x < 10) "c_8_10" else "d_ge10"))
      .groupBy(_._2).view.mapValues(v => v.map(_._1).sum / v.length).toMap
    val got = SparkEntry.queries("text_unigram_xent")(spark, sfDir)
      .select("bucket", "n_docs", "mean_xent").as[(String, Long, Double)].collect()
    got.foreach { case (b, nd, mx) =>
      assert(buckets(b) == nd, s"$b count: $nd vs ${buckets(b)}")
      assert(close(mx, meanByB(b), 1e-5), s"$b mean: $mx vs ${meanByB(b)}")
    }
    assert(got.map(_._2).sum == xents.length)
  }
}

package graft

import org.apache.spark.sql.functions._

/** Independent-recompute pins for the r18 operator wave: every statistic
  * re-derived driver-side from the raw collected data (plain Scala
  * doubles/BigInt, no shared query machinery), so a semantic error
  * common to the Scala kernel and its SQL oracle (the same-hand hazard)
  * still fails here. Tolerances are 1e-6-relative on rounded emissions.
  */
class Round18WaveSpec extends SparkSpec {
  import spark.implicits._

  private def spine: Seq[(Long, Long)] =
    SparkEntry.dailyRevenueSpine(spark, sfDir)
      .select(col("d").cast("long"), col("rev_c"))
      .orderBy("d").as[(Long, Long)].collect().toSeq

  private def close(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  test("kuiper matches a direct EDF-vs-normal recompute") {
    val vs = Tables.customer(spark, sfDir)
      .select((col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[Long].collect().sorted
    val n = vs.length.toDouble
    val mu = vs.map(_.toDouble).sum / n
    val sd = math.sqrt(vs.map(v => (v - mu) * (v - mu)).sum / (n - 1))
    def phi(z: Double): Double = {
      val az = math.abs(z)
      val t = 1.0 / (1.0 + 0.2316419 * az)
      val poly = t * (0.319381530 + t * (-0.356563782 + t *
        (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
      val p = 1.0 - 0.3989422804014327 * math.exp(-0.5 * az * az) * poly
      if (z >= 0) p else 1.0 - p
    }
    // per distinct value: cum count and below-count
    val grouped = vs.groupBy(identity).view.mapValues(_.length).toSeq.sortBy(_._1)
    var cum = 0L
    var dp = Double.MinValue; var dm = Double.MinValue
    grouped.foreach { case (v, c) =>
      val below = cum; cum += c
      val cdf = phi((v - mu) / sd)
      dp = math.max(dp, cum / n - cdf)
      dm = math.max(dm, cdf - below / n)
    }
    val r = SparkEntry.queries("an_kuiper")(spark, sfDir)
      .select("v_stat").as[Double].head()
    assert(close(r, dp + dm), s"$r vs ${dp + dm}")
  }

  test("goldfeld-quandt matches two direct third-segment OLS fits") {
    val sp = spine
    val n = sp.length
    val k = n / 3
    def sse(seg: Seq[(Long, Long)]): Double = {
      val m = seg.length.toDouble
      val xs = seg.map(_._1.toDouble); val ys = seg.map(_._2.toDouble)
      val (sx, sy) = (xs.sum, ys.sum)
      val b = (m * xs.zip(ys).map(p => p._1 * p._2).sum - sx * sy) /
        (m * xs.map(x => x * x).sum - sx * sx)
      val a = (sy - b * sx) / m
      seg.map { case (x, y) => val e = y - a - b * x; e * e }.sum
    }
    val f = (sse(sp.takeRight(k)) / (k - 2.0)) / (sse(sp.take(k)) / (k - 2.0))
    val r = SparkEntry.queries("an_goldfeld_quandt")(spark, sfDir)
      .select("f_gq").as[Double].head()
    assert(close(r, f, 1e-5), s"$r vs $f")
  }

  test("theil u1/u2 match a direct lag recompute") {
    val sp = spine.map(_._2.toDouble)
    val rows = (7 until sp.length).map(i => (sp(i), sp(i - 7), sp(i - 1)))
    val n = rows.length.toDouble
    val se = rows.map { case (y, f, _) => (y - f) * (y - f) }.sum
    val sy = rows.map { case (y, _, _) => y * y }.sum
    val sf = rows.map { case (_, f, _) => f * f }.sum
    val sw = rows.map { case (y, _, p) => (y - p) * (y - p) }.sum
    val u1 = math.sqrt(se / n) / (math.sqrt(sy / n) + math.sqrt(sf / n))
    val u2 = math.sqrt(se) / math.sqrt(sw)
    val r = SparkEntry.queries("an_theil_u")(spark, sfDir)
      .select("u1", "u2").as[(Double, Double)].head()
    assert(close(r._1, u1) && close(r._2, u2), s"$r vs ($u1, $u2)")
  }

  test("cusum-of-squares statistic and argmax day match a direct scan") {
    val sp = spine
    val sq = sp.map { case (_, y) => BigInt(y) * BigInt(y) }
    val tot = sq.sum
    val n = BigInt(sp.length)
    var p = BigInt(0)
    val exc = sp.zip(sq).map { case ((d, _), s) =>
      p += s; (d, (n * p - BigInt(sp.indexWhere(_._1 == d) + 1) * tot).abs)
    }
    val emax = exc.map(_._2).max
    val day = exc.filter(_._2 == emax).map(_._1).min
    val stat = BigDecimal(emax).toDouble / BigDecimal(n * tot).toDouble
    val r = SparkEntry.queries("an_cusum_sq")(spark, sfDir)
      .select("argmax_day", "cusum_sq_stat").as[(Long, Double)].head()
    assert(r._1 == day, s"day ${r._1} vs $day")
    assert(close(r._2, stat), s"${r._2} vs $stat")
  }

  test("bartels rank ratio matches a direct midrank recompute") {
    val ys = spine.map(_._2)
    val n = ys.length.toDouble
    // midranks via sorted positions
    val sorted = ys.sorted.zipWithIndex
    val rankOf = sorted.groupBy(_._1).map { case (v, xs) =>
      v -> (xs.map(_._2 + 1).sum.toDouble / xs.length)
    }
    val r = ys.map(rankOf)
    val num = r.sliding(2).map { case Seq(a, b) => (a - b) * (a - b) }.sum
    val rbar = r.sum / n
    val den = r.map(x => (x - rbar) * (x - rbar)).sum
    val rvn = num / den
    val got = SparkEntry.queries("an_bartels_rank")(spark, sfDir)
      .select("rvn").as[Double].head()
    assert(close(got, rvn), s"$got vs $rvn")
  }

  test("snht statistic matches a direct two-segment z recompute") {
    val ys = spine.map(_._2.toDouble)
    val n = ys.length
    val mu = ys.sum / n
    val s = math.sqrt(ys.map(y => (y - mu) * (y - mu)).sum / (n - 1))
    val ts = (1 until n).map { k =>
      val z1 = ys.take(k).map(y => (y - mu) / s).sum / k
      val z2 = ys.drop(k).map(y => (y - mu) / s).sum / (n - k)
      k * z1 * z1 + (n - k) * z2 * z2
    }
    val tmax = ts.max
    val got = SparkEntry.queries("an_snht")(spark, sfDir)
      .select("t_max").as[Double].head()
    assert(close(got, tmax, 1e-5), s"$got vs $tmax")
  }

  test("foster-stuart record counts and z match a direct scan") {
    val ys = spine.map(_._2)
    var mx = ys.head; var mn = ys.head
    var up = 0L; var dn = 0L; var h = 0.0
    (1 until ys.length).foreach { i =>
      if (ys(i) > mx) up += 1
      if (ys(i) < mn) dn += 1
      mx = math.max(mx, ys(i)); mn = math.min(mn, ys(i))
      h += 1.0 / (i + 1)
    }
    val z = (up - dn).toDouble / math.sqrt(2.0 * h)
    val r = SparkEntry.queries("an_foster_stuart")(spark, sfDir)
      .select("n_up", "n_dn", "z").as[(Long, Long, Double)].head()
    assert(r._1 == up && r._2 == dn, s"records (${r._1},${r._2}) vs ($up,$dn)")
    assert(close(r._3, z), s"${r._3} vs $z")
  }

  test("palma shares match a direct sorted-tail recompute") {
    val vs = Tables.orders(spark, sfDir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[Long].collect().sorted.toSeq
    val n = vs.length
    val tot = vs.map(BigInt(_)).sum
    val k40 = 2 * n / 5; val k90 = 9 * n / 10
    val bot = vs.take(k40).map(BigInt(_)).sum
    val top = vs.drop(k90).map(BigInt(_)).sum
    val r = SparkEntry.queries("an_palma")(spark, sfDir)
      .select("bot40_share", "top10_share", "palma_ratio")
      .as[(Double, Double, Double)].head()
    assert(close(r._1, BigDecimal(bot).toDouble / BigDecimal(tot).toDouble))
    assert(close(r._2, BigDecimal(top).toDouble / BigDecimal(tot).toDouble))
    assert(close(r._3, BigDecimal(top).toDouble / BigDecimal(bot).toDouble))
  }

  test("tracking signal matches a direct prefix recompute over the last 28 days") {
    val sp = spine
    val withF = sp.zipWithIndex.collect {
      case ((_, y), i) if i >= 7 => y - sp(i - 7)._2
    }
    val ev = withF.takeRight(28)
    var ce = 0L; var ca = 0L
    val ts = ev.zipWithIndex.map { case (e, i) =>
      ce += e; ca += math.abs(e)
      BigDecimal((i + 1).toLong * ce).toDouble / ca.toDouble
    }
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = SparkEntry.queries("an_tracking_signal")(spark, sfDir)
      .select("ts_final", "max_abs_ts").as[(Double, Double)].head()
    assert(close(r._1, ts.last, 1e-5), s"${r._1} vs ${ts.last}")
    assert(close(r._2, ts.map(t => math.abs(r6(t))).max, 1e-5),
      s"${r._2} vs ${ts.map(t => math.abs(r6(t))).max}")
  }

  test("spectral entropy matches a direct period-grid DFT") {
    val sp = spine
    val n = sp.length.toDouble
    val pw = (2 to 60).map { p =>
      var c = 0.0; var s2 = 0.0
      sp.foreach { case (d, y) =>
        val ang = 2.0 * math.Pi * (((d % p) + p) % p) / p
        c += y * math.cos(ang); s2 += y * math.sin(ang)
      }
      4.0 * (c * c + s2 * s2) / (n * n * 10000.0)
    }
    val tp = pw.sum
    val h = -pw.map(x => x / tp * math.log(x / tp)).sum / math.log(59.0)
    val got = SparkEntry.queries("an_spectral_entropy")(spark, sfDir)
      .select("spectral_entropy").as[Double].head()
    assert(close(got, h, 1e-5), s"$got vs $h")
  }

  test("yule's k matches a direct token-count recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "text").as[(String, String)].collect()
    val byLang = docs.groupBy(_._1)
    val rows = SparkEntry.queries("text_yule_k")(spark, sfDir)
      .select("lang", "n_tokens", "yule_k").as[(String, Long, Double)].collect()
    rows.foreach { case (lang, nTok, k) =>
      val counts = byLang(lang).flatMap(_._2.split(" ").filter(_.nonEmpty))
        .groupBy(identity).map(_._2.length.toLong)
      val nn = counts.sum
      val s2 = counts.map(c => c * c).sum
      assert(nn == nTok, s"$lang tokens $nTok vs $nn")
      val kk = 1e4 * (s2 - nn).toDouble / (nn.toDouble * nn.toDouble)
      assert(close(k, kk), s"$lang: $k vs $kk")
    }
  }

  test("mood scale statistic matches a direct midrank recompute") {
    val lab = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select((col("c_mktsegment") === "BUILDING").cast("long"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long)].collect()
    val all = lab.map(_._2).sorted
    val nn = all.length.toDouble
    val rankOf = all.zipWithIndex.groupBy(_._1).map { case (v, xs) =>
      v -> xs.map(_._2 + 1).sum.toDouble / xs.length
    }
    val t = lab.filter(_._1 == 1L).map { case (_, v) =>
      val r = rankOf(v) - (nn + 1) / 2.0; r * r
    }.sum
    val got = SparkEntry.queries("an_mood_scale")(spark, sfDir)
      .select("t_stat").as[Double].head()
    assert(close(got, t), s"$got vs $t")
  }

  test("blomqvist beta matches a direct quadrant count") {
    val pts = Tables.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("decimal(24,2)").cast("bigint"),
        (col("l_extendedprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long)].collect()
    def lowerMed(vs: Seq[Long]): Long = vs.sorted.apply((vs.length + 1) / 2 - 1)
    val (mx, my) = (lowerMed(pts.map(_._1).toSeq), lowerMed(pts.map(_._2).toSeq))
    val used = pts.filter { case (x, y) => x != mx && y != my }
    val conc = used.count { case (x, y) => (x > mx) == (y > my) }
    val beta = (2.0 * conc - used.length) / used.length
    val got = SparkEntry.queries("an_blomqvist_beta")(spark, sfDir)
      .select("beta").as[Double].head()
    assert(close(got, beta), s"$got vs $beta")
  }

  test("diebold-mariano matches a direct loss-differential recompute") {
    val sp = spine.map(_._2)
    val ds = (7 until sp.length).map { i =>
      val e1 = (sp(i) - sp(i - 7)).toDouble
      val e2 = (sp(i) - sp(i - 1)).toDouble
      e1 * e1 - e2 * e2
    }
    val n = ds.length.toDouble
    val mean = ds.sum / n
    val g0 = ds.map(d => (d - mean) * (d - mean)).sum / n
    val dm = mean / math.sqrt(g0 / n)
    val got = SparkEntry.queries("an_diebold_mariano")(spark, sfDir)
      .select("dm_stat").as[Double].head()
    assert(close(got, dm, 1e-5), s"$got vs $dm")
  }

  test("dixon q matches direct per-group gap ratios") {
    val byG = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(String, Long)].collect().groupBy(_._1)
    val rows = SparkEntry.queries("an_dixon_q")(spark, sfDir)
      .select("grp", "q_high", "q_low").as[(String, Double, Double)].collect()
    rows.foreach { case (g, qh, ql) =>
      val vs = byG(g).map(_._2)
      val mx = vs.max; val mn = vs.min
      val submax = vs.filter(_ < mx).max; val submin = vs.filter(_ > mn).min
      assert(close(qh, (mx - submax).toDouble / (mx - mn)), s"$g high")
      assert(close(ql, (submin - mn).toDouble / (mx - mn)), s"$g low")
    }
  }

  test("cumulative incidence matches a direct Aalen-Johansen fold and bounds 1-KM") {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate").cast("date"))
      .as[(Long, java.sql.Date)].collect()
    val mx = o.map(_._2.getTime).max
    val rk = Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R")
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey")).as[Long].collect().toSet
    val day = 86400000L
    val cust = o.groupBy(_._1).map { case (ck, rows) =>
      val f = rows.map(_._2.getTime).min; val l = rows.map(_._2.getTime).max
      val t = (l - f) / day
      val ev = l < mx - 90 * day
      (t, ev, rk.contains(ck))
    }.toSeq
    val nTotal = cust.size
    val byT = cust.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, xs) =>
      (t, xs.size.toLong, xs.count(x => x._2 && x._3).toLong,
        xs.count(x => x._2 && !x._3).toLong)
    }
    var atRiskDrop = 0L; var logS = 0.0; var cif1 = 0.0; var cif2 = 0.0
    val expect = byT.flatMap { case (t, nAt, d1, d2) =>
      val nRisk = nTotal - atRiskDrop
      atRiskDrop += nAt
      if (d1 + d2 > 0) {
        val sPrev = math.exp(logS)
        cif1 += sPrev * d1 / nRisk; cif2 += sPrev * d2 / nRisk
        if (d1 + d2 < nRisk) logS += math.log(1.0 - (d1 + d2).toDouble / nRisk)
        Some((t, nRisk, d1, d2, cif1, cif2))
      } else { atRiskDrop += 0; None }
    }
    val got = SparkEntry.queries("an_cuminc")(spark, sfDir)
      .select("t", "n_risk", "d1", "d2", "cif1", "cif2")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(got.length == expect.length)
    got.zip(expect).foreach { case ((t, nr, d1, d2, c1, c2), (et, enr, ed1, ed2, ec1, ec2)) =>
      assert(t == et && nr == enr && d1 == ed1 && d2 == ed2, s"frame at $t")
      assert(close(c1, ec1, 1e-5) && close(c2, ec2, 1e-5), s"cif at $t")
    }
    // competing-risk sanity: CIF1 + CIF2 tracks 1 − KM (equal here since
    // both derive from the same all-cause hazard), and each CIF ≤ total
    val (lc1, lc2) = (got.last._5, got.last._6)
    assert(lc1 + lc2 <= 1.0 + 1e-9 && lc1 >= 0 && lc2 >= 0)
  }

  private def twoSampleRanks: (Seq[(Long, Long)], Map[Long, Double], Double, Double) = {
    val lab = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select((col("c_mktsegment") === "BUILDING").cast("long"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long)].collect().toSeq
    val all = lab.map(_._2).sorted
    val rankOf = all.zipWithIndex.groupBy(_._1).map { case (v, xs) =>
      v -> xs.map(_._2 + 1).sum.toDouble / xs.length
    }
    (lab, rankOf, all.length.toDouble, lab.count(_._1 == 1L).toDouble)
  }

  test("cucconi matches a direct squared-rank recompute") {
    val (lab, rankOf, nn, n1) = twoSampleRanks
    val n2 = nn - n1
    val g1 = lab.filter(_._1 == 1L).map(p => rankOf(p._2))
    val s1 = g1.map(r => r * r).sum
    val s2 = g1.map(r => (nn + 1 - r) * (nn + 1 - r)).sum
    val den = math.sqrt(n1 * n2 * (nn + 1) * (2 * nn + 1) * (8 * nn + 11) / 5.0)
    val u = (6 * s1 - n1 * (nn + 1) * (2 * nn + 1)) / den
    val v = (6 * s2 - n1 * (nn + 1) * (2 * nn + 1)) / den
    val rho = 2 * (nn * nn - 4) / ((2 * nn + 1) * (8 * nn + 11)) - 1
    val c = (u * u + v * v - 2 * rho * u * v) / (2 * (1 - rho * rho))
    val got = SparkEntry.queries("an_cucconi")(spark, sfDir)
      .select("c_stat").as[Double].head()
    assert(close(got, c, 1e-5), s"$got vs $c")
  }

  test("lepage matches a direct rank-sum + ansari recompute") {
    val (lab, rankOf, nn, n1) = twoSampleRanks
    val n2 = nn - n1
    val g1 = lab.filter(_._1 == 1L).map(p => rankOf(p._2))
    val w = g1.sum
    val ab = g1.map(r => math.min(r, nn + 1 - r)).sum
    val wz = (w - n1 * (nn + 1) / 2) / math.sqrt(n1 * n2 * (nn + 1) / 12.0)
    val even = nn.toLong % 2 == 0
    val eab = if (even) n1 * (nn + 2) / 4.0 else n1 * (nn + 1) * (nn + 1) / (4 * nn)
    val vab = if (even) n1 * n2 * (nn + 2) * (nn - 2) / (48 * (nn - 1))
              else n1 * n2 * (nn + 1) * (3 + nn * nn) / (48 * nn * nn)
    val abz = (ab - eab) / math.sqrt(vab)
    val got = SparkEntry.queries("an_lepage")(spark, sfDir)
      .select("wilcoxon_z", "ansari_z", "lepage_l").as[(Double, Double, Double)].head()
    assert(close(got._1, wz), s"${got._1} vs $wz")
    assert(close(got._2, abz), s"${got._2} vs $abz")
    assert(close(got._3, wz * wz + abz * abz, 1e-5))
  }

  test("rayleigh dow matches a direct circular recompute") {
    val ks = Tables.orders(spark, sfDir)
      .select(pmod(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")), lit(7)).cast("long"))
      .as[Long].collect()
    val n = ks.length.toDouble
    val c = ks.map(k => math.cos(2 * math.Pi * k / 7.0)).sum
    val s2 = ks.map(k => math.sin(2 * math.Pi * k / 7.0)).sum
    val rbar = math.sqrt(c * c + s2 * s2) / n
    val got = SparkEntry.queries("an_rayleigh_dow")(spark, sfDir)
      .select("r_bar", "rayleigh_z").as[(Double, Double)].head()
    assert(close(got._1, rbar, 1e-4), s"${got._1} vs $rbar")
    assert(close(got._2, n * rbar * rbar, 1e-4))
  }

  test("bigram conditional entropy matches a direct count recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "text").as[(String, String)].collect()
    val rows = SparkEntry.queries("text_bigram_cond_entropy")(spark, sfDir)
      .select("lang", "n_bigrams", "cond_entropy")
      .as[(String, Long, Double)].collect()
    rows.foreach { case (lang, nb, h) =>
      val pairs = docs.filter(_._1 == lang).flatMap { case (_, t) =>
        val ws = t.split(" ")
        ws.sliding(2).collect { case Array(a, b) => (a, b) }
      }
      val c12 = pairs.groupBy(identity).map(_._2.length.toLong)
      val c1 = pairs.groupBy(_._1).map { case (_, xs) => xs.length.toLong }
      val c1of = pairs.groupBy(_._1).map { case (w, xs) => w -> xs.length.toLong }
      val n = pairs.length.toDouble
      assert(nb == pairs.length, s"$lang n $nb vs ${pairs.length}")
      val hh = -pairs.groupBy(identity).map { case ((w1, _), xs) =>
        val cc = xs.length.toDouble
        cc * math.log(cc / c1of(w1))
      }.sum / n
      assert(close(h, hh, 1e-5), s"$lang: $h vs $hh")
    }
  }

  test("hapax profile matches a direct count recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "text").as[(String, String)].collect()
    val rows = SparkEntry.queries("text_hapax")(spark, sfDir)
      .select("lang", "n_types", "v1", "v2").as[(String, Long, Long, Long)].collect()
    rows.foreach { case (lang, nt, v1, v2) =>
      val counts = docs.filter(_._1 == lang)
        .flatMap(_._2.split(" ").filter(_.nonEmpty))
        .groupBy(identity).map(_._2.length)
      assert(counts.size == nt && counts.count(_ == 1) == v1 &&
        counts.count(_ == 2) == v2, s"$lang: ($nt,$v1,$v2)")
    }
  }

  test("embedding diversity matches a direct pairwise recompute") {
    val vs = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) =>
        id -> v.map(x => math.round(x.toDouble * 1000000.0)).toArray
      }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cos = for (i <- vs.indices; j <- i + 1 until vs.length) yield {
      val (a, b) = (vs(i)._2, vs(j)._2)
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      r6(dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum)))
    }
    val got = SparkEntry.queries("sim_diversity")(spark, sfDir)
      .select("n_pairs", "mean_cos", "min_cos", "max_cos")
      .as[(Long, Double, Double, Double)].head()
    assert(got._1 == cos.length)
    assert(close(got._2, cos.sum / cos.length, 1e-5))
    assert(got._3 == cos.min && got._4 == cos.max)
  }

  test("value entropy matches a direct frequency recompute") {
    val pr = Tables.orders(spark, sfDir)
      .select("o_orderpriority").as[String].collect()
    val n = pr.length.toDouble
    val h = math.log(n) -
      pr.groupBy(identity).map(_._2.length.toDouble).map(c => c * math.log(c)).sum / n
    val got = SparkEntry.queries("etl_value_entropy")(spark, sfDir)
      .filter(col("column") === "o_orderpriority")
      .select("entropy").as[Double].head()
    assert(close(got, h, 1e-5), s"$got vs $h")
  }

  test("katz top-20 matches a direct adjacency iteration") {
    val cs = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
      .distinct().as[(Long, Long)].collect()
    val edges = (cs.map { case (c, p) => (c, p) } ++ cs.map { case (c, p) => (p, c) }).distinct
    val adj = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._2) }
    val nodes = adj.keySet
    val S = BigInt(1000000)
    var x = nodes.map(_ -> S).toMap
    (1 to 3).foreach { k =>
      val const = BigInt(math.pow(50.0, k).toLong) * S
      x = nodes.map { nd =>
        nd -> (const + adj(nd).map(x).sum)
      }.toMap
    }
    val top = x.toSeq.sortBy { case (nd, v) => (-v, nd) }.take(20)
    val got = SparkEntry.queries("q_katz")(spark, sfDir)
      .select("node", "katz").as[(Long, Double)].collect()
    got.zip(top).foreach { case ((n1, kz), (n2, xv)) =>
      assert(n1 == n2, s"order: $n1 vs $n2")
      val expect = BigDecimal(xv).toDouble / 1.25e11
      assert(close(kz, expect), s"node $n1: $kz vs $expect")
    }
  }
}

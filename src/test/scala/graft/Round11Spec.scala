package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-11 additions (the oracle checks exact
  * values at sf0.01; these pin the MEANING of those values): SemDeDup
  * semantic pruning, Tukey HSD, and the multi-horizon backtest. */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  test("semantic dedup equals an independent in-driver SemDeDup at sf0.001") {
    val tau = 0.35
    val got = SparkEntry.queries("sim_semantic_dedup")(spark, sfDir)
      .select("drop_id", "rep_id", "sim", "cell_id")
      .as[(Long, Long, Double, Int)].collect().toSet
    // independent reimplementation: same portable integer quantizer,
    // cell assignment, pair policy — computed wholly in the driver
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val cents = vecs.take(16).map(_._2.map(x => math.round(x * 1e6)).toArray)
    val cnorms = cents.map(c => math.sqrt(c.map(x => x.toDouble * x).sum))
    def cell(v: Seq[Double]): Int = {
      val q = v.map(x => math.round(x * 1e6)).toArray
      val scores = cents.zip(cnorms).map { case (c, n) =>
        c.zip(q).map { case (a, b) => a * b }.sum.toDouble / n
      }
      scores.indexOf(scores.max)
    }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byCell = vecs.groupBy(v => cell(v._2))
    val expected = byCell.toSeq.flatMap { case (cid, members) =>
      val sorted = members.sortBy(_._1)
      sorted.flatMap { case (did, dv) =>
        val mates = sorted.filter(_._1 < did)
          .map { case (kid, kv) => (kid, cos(kv, dv)) }
          .filter(_._2 >= tau)
        if (mates.isEmpty) None
        else {
          val (rid, s) = mates.minBy { case (kid, s) => (-s, kid) }
          Some((did, rid, s, cid))
        }
      }
    }.toSet
    assert(got == expected, "drop set must equal the driver SemDeDup exactly")
    assert(got.nonEmpty, "sf0.001 must surface at least one semantic dup")
    got.foreach { case (d, r, s, _) =>
      assert(r < d && s >= tau)
    }
  }

  test("tukey hsd recomposes from raw per-segment stats") {
    val got = SparkEntry.queries("an_tukey_hsd")(spark, sfDir)
      .select("g_a", "g_b", "n_a", "n_b", "mean_diff_c", "q_stat")
      .as[(String, String, Long, Long, Double, Double)].collect()
    val vals = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir)
        .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("long"))
      .as[(String, Long)].collect()
    val groups = vals.groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    val k = groups.size
    assert(got.length == k * (k - 1) / 2, "one row per unordered segment pair")
    val n = vals.length
    val means = groups.view.mapValues(v => v.sum / v.length).toMap
    val ssw = groups.values.map { v =>
      val m = v.sum / v.length; v.map(x => (x - m) * (x - m)).sum
    }.sum
    val msw = ssw / (n - k)
    got.foreach { case (ga, gb, na, nb, diff, q) =>
      assert(ga < gb, "pairs are emitted in lexical order")
      assert(na == groups(ga).length && nb == groups(gb).length)
      val expDiff = means(ga) - means(gb)
      assert(math.abs(diff - expDiff) < math.max(1.0, math.abs(expDiff)) * 1e-9,
        s"mean diff $ga/$gb: $diff vs $expDiff")
      // q_stat is emitted ROUND 6 (r16: the SSB-gather double→decimal
      // ulp class past sf0.1), so the recomposition holds to the
      // rounding resolution, not machine epsilon
      val expQ = math.abs(expDiff) / math.sqrt(msw / 2.0 * (1.0 / na + 1.0 / nb))
      assert(math.abs(q - expQ) <= 5e-7 + expQ * 1e-9, s"q $ga/$gb: $q vs $expQ")
    }
  }

  test("friedman Q recomposes from an in-driver blocked midrank computation") {
    val (k, n, q) = SparkEntry.queries("an_friedman")(spark, sfDir)
      .select("k", "n", "q_friedman").as[(Long, Long, Double)].head()
    val cells = Tables.orders(spark, sfDir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("blk"),
        col("o_orderpriority").as("trt"))
      .agg((sum(col("o_totalprice").cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("long").as("v"))
      .as[(java.sql.Timestamp, String, Long)].collect()
    val blocks = cells.groupBy(_._1).filter(_._2.length == 5)
    assert(n == blocks.size && k == 5)
    val r2sums = blocks.values.toSeq.flatMap { rows =>
      rows.map { case (_, trt, v) =>
        val less = rows.count(_._3 < v); val eq = rows.count(_._3 == v)
        trt -> (2L * less + eq + 1)
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(r2sums.size == 5)
    val s2sq = r2sums.values.map(x => x * x).sum
    val expQ = 3.0 * s2sq / (n * 5 * 6).toDouble - (3 * n * 6).toDouble
    assert(math.abs(q - expQ) < 1e-9, s"$q vs $expQ")
    assert(q >= 0.0)
  }

  test("hhi sits in [1/n, 1] per region and shares recompose") {
    val rows = SparkEntry.queries("an_hhi")(spark, sfDir)
      .select("r_name", "n_suppliers", "hhi").as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (r, ns, h) =>
      assert(ns > 0)
      assert(h >= 1.0 / ns - 1e-6 && h <= 1.0 + 1e-9,
        s"region $r: HHI $h outside [1/$ns, 1]")
    }
  }

  test("capture-recapture recomposes from independently counted samples") {
    val (n1, n2, m, nHat, seHat) =
      SparkEntry.queries("an_capture_recapture")(spark, sfDir)
        .select("n1", "n2", "m", "n_hat", "se_hat")
        .as[(Long, Long, Long, Double, Double)].head()
    val byUser = Tables.events(spark, sfDir)
      .select(col("user_id"), (col("ts") < lit("2024-01-16").cast("timestamp")))
      .as[(Long, Boolean)].collect().groupBy(_._1)
    val s1 = byUser.count(_._2.exists(_._2))
    val s2 = byUser.count(_._2.exists(!_._2))
    val both = byUser.count(u => u._2.exists(_._2) && u._2.exists(!_._2))
    assert((n1, n2, m) == ((s1.toLong, s2.toLong, both.toLong)))
    assert(m <= math.min(n1, n2))
    val exp = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    assert(math.abs(nHat - exp) < 1e-9)
    assert(nHat >= math.max(n1, n2) - 1e-9, "estimate cannot undercut a sample")
    assert(seHat >= 0.0)
  }

  test("gumbel fit recomposes from collected monthly maxima") {
    val (n, mean, sd, beta, mu, ret12) =
      SparkEntry.queries("an_gumbel_maxima")(spark, sfDir)
        .select("n", "mean_c", "sd_c", "beta_c", "mu_c", "ret12_c")
        .as[(Long, Double, Double, Double, Double, Double)].head()
    val maxima = Tables.lineitem(spark, sfDir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("long").as("rev_c"))
      .groupBy(date_trunc("month", col("day"))).agg(max(col("rev_c")).as("mx"))
      .select("mx").as[Long].collect()
    assert(n == maxima.length && n > 10)
    val xm = maxima.map(_.toDouble).sum / n
    val s2 = maxima.map(x => (x - xm) * (x - xm)).sum / (n - 1)
    assert(math.abs(mean - xm) < math.abs(xm) * 1e-9)
    assert(math.abs(sd - math.sqrt(s2)) < math.sqrt(s2) * 1e-6)
    val expBeta = math.sqrt(s2) * math.sqrt(6.0) / math.Pi
    assert(math.abs(beta - expBeta) < expBeta * 1e-6)
    assert(math.abs(mu - (xm - 0.5772156649015329 * expBeta)) < math.abs(xm) * 1e-6)
    assert(ret12 > mu, "the 12-block return level must exceed the location")
  }

  test("iv wald recomposes and equals reduced-form over first-stage") {
    val (n1, n0, fs, rf, beta) = SparkEntry.queries("an_iv_wald")(spark, sfDir)
      .select("n1", "n0", "first_stage", "reduced_form", "beta_iv")
      .as[(Long, Long, Double, Double, Double)].head()
    val users = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        (col("value").cast("decimal(24,2)") * 100).cast("long"))
      .as[(Long, String, Long)].collect().groupBy(_._1)
    assert(n1 + n0 == users.size)
    val arms = users.toSeq.map { case (u, evs) =>
      (u % 2, evs.count(_._2 == "view").toLong,
        evs.filter(_._2 == "purchase").map(_._3).sum)
    }
    def mean(z: Long, f: Seq[(Long, Long, Long)] => Seq[Long]) = {
      val g = arms.filter(_._1 == z); f(g).sum.toDouble / g.size
    }
    val expFs = mean(1, _.map(_._2)) - mean(0, _.map(_._2))
    val expRf = mean(1, _.map(_._3)) - mean(0, _.map(_._3))
    assert(math.abs(fs - expFs) < math.abs(expFs) * 1e-9 + 1e-9)
    assert(math.abs(rf - expRf) < math.abs(expRf) * 1e-9 + 1e-9)
    assert(math.abs(beta - rf / fs) < math.abs(beta) * 1e-12)
  }

  test("stratified ate recomposes from per-stratum arm means") {
    val (nStrata, nUsers, ate) =
      SparkEntry.queries("an_stratified_ate")(spark, sfDir)
        .select("n_strata", "n_users", "ate_c").as[(Long, Long, Double)].head()
    assert(nStrata >= 1 && nStrata <= 3)
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val users = Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_type"),
        (col("value").cast("decimal(24,2)") * 100).cast("long"))
      .as[(Long, java.sql.Timestamp, String, Long)].collect().groupBy(_._1)
    val rows = users.toSeq.map { case (u, evs) =>
      val pre = evs.count(_._2.before(cut)).toLong
      val y = evs.filter(e => !e._2.before(cut) && e._3 == "purchase").map(_._4).sum
      (u % 2, math.min(pre, 2L), y)
    }
    val strata = rows.groupBy(_._2).filter { case (_, rs) =>
      rs.exists(_._1 == 1) && rs.exists(_._1 == 0)
    }
    val nn = strata.values.map(_.size).sum
    assert(nUsers == nn && nStrata == strata.size)
    val expAte = strata.values.map { rs =>
      val t = rs.filter(_._1 == 1); val c = rs.filter(_._1 == 0)
      rs.size.toDouble / nn *
        (t.map(_._3).sum.toDouble / t.size - c.map(_._3).sum.toDouble / c.size)
    }.sum
    assert(math.abs(ate - expAte) < 1e-4, s"$ate vs $expAte")
  }

  test("dispersion recomposes from active-day counts") {
    val (n, sc, mean, vr, d, chi2) = SparkEntry.queries("an_dispersion")(spark, sfDir)
      .select("n", "sc", "mean_c", "var_c", "dispersion", "chi2_stat")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    val counts = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")))
      .agg(count(lit(1)).cast("long").as("c")).select("c").as[Long].collect()
    assert(n == counts.length && sc == counts.sum)
    val xm = counts.sum.toDouble / n
    val s2 = counts.map(c => (c - xm) * (c - xm)).sum / (n - 1)
    assert(math.abs(mean - xm) < 1e-9 && math.abs(vr - s2) < s2 * 1e-6)
    assert(math.abs(d - vr / mean) < 1e-12)
    assert(math.abs(chi2 - (n - 1) * d) < math.abs(chi2) * 1e-12)
  }

  test("assortativity is a correlation in [-1, 1] and recomposes from edges") {
    val (m, r) = SparkEntry.queries("q_assortativity")(spark, sfDir)
      .select("m", "assortativity").as[(Long, Double)].head()
    assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9)
    val pairs = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).as[(Long, Long)].collect()
      .groupBy(_._1).values.flatMap { rows =>
        val ps = rows.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
      }.toSet
    val deg = (pairs.toSeq.map(_._1) ++ pairs.toSeq.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val edges = pairs.toSeq.flatMap(p => Seq(p, p.swap))
    assert(m == edges.size)
    val js = edges.map(e => deg(e._1).toDouble)
    val ks = edges.map(e => deg(e._2).toDouble)
    val mj = js.sum / m; val mjk = js.zip(ks).map { case (a, b) => a * b }.sum / m
    val mj2 = js.map(x => x * x).sum / m
    val expR = (mjk - mj * mj) / (mj2 - mj * mj)
    assert(math.abs(r - expR) < 1e-9, s"$r vs $expR")
  }

  test("top movers are the true top-15 by absolute swing") {
    val rows = SparkEntry.queries("q_top_movers")(spark, sfDir)
      .select("pk", "rev1_c", "rev0_c", "delta_c")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 15)
    rows.foreach { case (_, r1, r0, d) => assert(d == r1 - r0) }
    val deltas = rows.map(r => math.abs(r._4))
    assert(deltas.zip(deltas.tail).forall { case (a, b) => a >= b },
      "emitted in descending absolute-swing order")
  }

  test("mape backtest h=7 row reconciles with the seasonal-naive backtest") {
    val rows = SparkEntry.queries("an_mape_backtest")(spark, sfDir)
      .select("h", "n", "abs_err_c", "bias_c", "actual_c", "wape")
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 7L), "exactly one row per horizon")
    rows.foreach { case (_, nh, abs, _, act, wape) =>
      assert(nh <= 28 && nh > 0)
      assert(abs >= 0 && act > 0)
      assert(math.abs(wape - abs.toDouble / act.toDouble) < 1e-12)
    }
    // independent driver recompute (calendar-day lag, NOT row lag — the
    // backtest only scores horizons whose t−h day actually traded)
    val daily = Tables.lineitem(spark, sfDir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("long").as("rev_c"))
      .select(datediff(col("day").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long"), col("rev_c"))
      .as[(Long, Long)].collect().toMap
    val holdout = daily.keys.toSeq.sorted.takeRight(28)
    rows.foreach { case (h, nh, abs, bias, act, _) =>
      val scored = holdout.flatMap(d => daily.get(d - h).map(p => (daily(d), p)))
      assert(nh == scored.length, s"h=$h n")
      assert(abs == scored.map { case (a, p) => math.abs(a - p) }.sum, s"h=$h abs")
      assert(bias == scored.map { case (a, p) => a - p }.sum, s"h=$h bias")
      assert(act == scored.map(_._1).sum, s"h=$h actual")
    }
  }
}

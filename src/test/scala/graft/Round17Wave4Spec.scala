package graft

import org.apache.spark.sql.functions._

/** Independent-recompute pins for the round-17 wave-4 keys (the
  * shared-hand defense, continuing [[Round17Wave2Spec]]/
  * [[Round17Wave3Spec]]): the distribution fits and Dunnett re-derive
  * from collected rows, Skellam from raw event counts, Bowker from the
  * emitted confusion matrix with an independent pairing, and MCC is
  * cross-pinned to an_youden's cutoff plus a from-scratch confusion. */
class Round17Wave4Spec extends SparkSpec {
  import spark.implicits._

  private lazy val orderCents: Array[Long] = Tables.orders(spark, sfDir)
    .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
    .as[Long].collect()

  test("gamma fit matches direct method-of-moments") {
    val v = orderCents; val n = v.length
    val mean = v.map(BigInt(_)).sum.toDouble / n
    val m2 = (BigInt(n) * v.map(x => BigInt(x) * BigInt(x)).sum -
      v.map(BigInt(_)).sum * v.map(BigInt(_)).sum).toDouble / (n.toDouble * (n - 1.0))
    val r = SparkEntry.queries("an_gamma_fit")(spark, sfDir)
      .select("n", "shape", "scale", "mean", "cv")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 == n)
    assert(math.abs(r._2 - mean * mean / m2) < 1e-5, s"shape ${r._2}")
    assert(math.abs(r._3 - (m2 / mean) / 100.0) < r._3 * 1e-6 + 1e-5)
    assert(math.abs(r._4 - mean / 100.0) < 1e-4)
    assert(math.abs(r._5 - math.sqrt(m2) / mean) < 1e-6)
    // gamma mean must reproduce: k·θ = mean
    assert(math.abs(r._2 * r._3 - r._4) < r._4 * 1e-4)
  }

  test("lognormal fit matches direct log-moments and orders its moments") {
    val x = orderCents.map(v => math.log(v.toDouble / 100.0))
    val n = x.length.toDouble
    val mu = x.sum / n
    val sig2 = (n * x.map(v => v * v).sum - x.sum * x.sum) / (n * (n - 1.0))
    val r = SparkEntry.queries("an_lognormal_fit")(spark, sfDir)
      .select("n", "mu", "sigma", "median", "mean")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 == x.length)
    assert(math.abs(r._2 - mu) < 1e-4, s"mu ${r._2} vs $mu")
    assert(math.abs(r._3 - math.sqrt(sig2)) < 1e-4)
    // lognormal mean > median always (σ > 0)
    assert(r._5 > r._4 && r._4 > 0.0)
  }

  test("skellam z matches the conditional-binomial recompute") {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("purchase", "click"))
      .groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    val (x1, x2) = (ev("purchase"), ev("click"))
    val nd = (x1 + x2).toDouble
    val z = (x1 - nd / 2.0) / math.sqrt(nd / 4.0)
    val r = SparkEntry.queries("an_skellam")(spark, sfDir)
      .select("n_purchase", "n_click", "z_rate", "p_value")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 == x1 && r._2 == x2)
    assert(math.abs(r._3 - z) < 1e-6)
    assert(r._4 >= 0.0 && r._4 <= 1.0 + 1e-9)
  }

  test("bowker matches an independent pairing over the emitted confusion matrix") {
    val m = SparkEntry.queries("text_langid_eval")(spark, sfDir)
      .select("lang", "lang_pred", "n").as[(String, String, Long)].collect()
      .filter(r => r._1 != r._2)
      .map { case (a, b, n) => ((a, b), n) }.toMap
    val keys = m.keySet.map { case (a, b) => if (a < b) (a, b) else (b, a) }
    val terms = keys.toSeq.map { case (a, b) =>
      val nij = m.getOrElse((a, b), 0L); val nji = m.getOrElse((b, a), 0L)
      (nij - nji).toDouble * (nij - nji) / (nij + nji)
    }
    val r = SparkEntry.queries("an_bowker")(spark, sfDir)
      .select("df", "chi2_bowker").as[(Long, Double)].head()
    assert(r._1 == keys.size, s"df ${r._1} vs ${keys.size}")
    assert(math.abs(r._2 - terms.sum) < 1e-5, s"chi2 ${r._2} vs ${terms.sum}")
  }

  test("mcc sits at an_youden's cutoff and matches a from-scratch confusion") {
    val y = SparkEntry.queries("an_youden")(spark, sfDir)
      .select("cutoff_c", "j_stat").as[(Long, Double)].head()
    val r = SparkEntry.queries("an_mcc")(spark, sfDir)
      .select("cutoff_c", "tp", "fp", "fn", "tn", "mcc")
      .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(r._1 == y._1, "MCC must score the SAME operating point Youden selected")
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey").cast("long"),
        col("o_orderdate").cast("timestamp").cast("long"))
      .as[(Long, Long)].collect()
    val anchor = o.map(_._2).max
    val last = o.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val cut90 = anchor - 90L * 86400
    var (tp, fp, fn, tn) = (0L, 0L, 0L, 0L)
    Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long)].collect()
      .foreach { case (ck, v) =>
        val churn = last.get(ck).forall(_ < cut90)
        val pred = v <= r._1
        if (churn && pred) tp += 1 else if (!churn && pred) fp += 1
        else if (churn) fn += 1 else tn += 1
      }
    assert((r._2, r._3, r._4, r._5) == ((tp, fp, fn, tn)),
      s"confusion (${r._2},${r._3},${r._4},${r._5}) vs direct ($tp,$fp,$fn,$tn)")
    val mcc = (tp * tn - fp * fn).toDouble /
      math.sqrt((tp + fp).toDouble * (tp + fn) * (tn + fp) * (tn + fn))
    assert(math.abs(r._6 - mcc) < 1e-6)
  }

  test("dunnett matches a direct pooled-variance recompute") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(String, Long)].collect()
    val by = rows.groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    val k = by.size
    val nn = rows.length
    val wss = by.values.map { vs =>
      val m = vs.sum / vs.length; vs.map(v => (v - m) * (v - m)).sum
    }.sum
    val s2p = wss / (nn - k)
    val ctl = by("1-URGENT")
    val mc = ctl.sum / ctl.length
    val r = SparkEntry.queries("an_dunnett")(spark, sfDir)
      .select("grp", "n_g", "mean_diff", "t_stat")
      .as[(String, Long, Double, Double)].collect().sortBy(_._1)
    assert(r.length == k - 1 && !r.exists(_._1 == "1-URGENT"))
    r.foreach { case (grp, ng, md, t) =>
      val vs = by(grp)
      assert(ng == vs.length)
      val mi = vs.sum / vs.length
      assert(math.abs(md - (mi - mc) / 100.0) < 1e-3, s"$grp mean_diff")
      val tDir = (mi - mc) / math.sqrt(s2p * (1.0 / vs.length + 1.0 / ctl.length))
      assert(math.abs(t - tDir) < math.abs(tDir) * 1e-4 + 1e-4, s"$grp t $t vs $tDir")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Semantic pins for an_rmst, an_auc_se, and text_char_entropy (r11):
  * driver recomputation at sf0.001. */
class SurvivalUncertaintySpec extends SparkSpec {
  import spark.implicits._

  private def lifetimes(): Seq[(Long, Long)] = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate")).as[(Long, java.sql.Timestamp)].collect()
    val mx = o.map(_._2.getTime).max
    val cutoff = mx - 90L * 86400000L
    o.groupBy(_._1).toSeq.map { case (_, g) =>
      val f = g.map(_._2.getTime).min; val l = g.map(_._2.getTime).max
      ((l - f) / 86400000L, if (l < cutoff) 1L else 0L)
    }
  }

  test("an_rmst equals the driver KM area up to tau") {
    val (tau, n, rmst) = SparkEntry.queries("an_rmst")(spark, sfDir)
      .select("tau_days", "n", "rmst_days").as[(Long, Long, Double)].collect().head
    val lt = lifetimes()
    val nn = lt.size.toLong
    val ts = lt.map(_._1).distinct.sorted
    var atRiskLeft = nn
    var surv = 1.0
    var area = 0.0
    var prevT = -1L
    ts.foreach { t =>
      val nAt = lt.count(_._1 == t).toLong
      val d = lt.count(r => r._1 == t && r._2 == 1L).toLong
      if (d > 0) {
        if (prevT < 0) area += math.min(t, tau).toDouble // head at S=1
        else area += surv * math.max(0L, math.min(t, tau) - math.min(prevT, tau))
        surv =
          if (d == atRiskLeft) 0.0
          else BigDecimal(surv * (1.0 - d.toDouble / atRiskLeft))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        prevT = t
      }
      atRiskLeft -= nAt
    }
    if (prevT >= 0) area += surv * math.max(0L, tau - math.min(prevT, tau))
    assert(n == nn && tau == 365L)
    assert(math.abs(rmst - area) < 2e-3, s"rmst $rmst vs driver $area")
    assert(rmst > 0.0 && rmst <= tau.toDouble + 1e-9)
  }

  test("an_auc_se matches the driver DeLong computation") {
    val (nPos, nNeg, auc, se) = SparkEntry.queries("an_auc_se")(spark, sfDir)
      .select("n_pos", "n_neg", "auc", "auc_se")
      .as[(Long, Long, Double, Double)].collect().head
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate")).as[(Long, java.sql.Timestamp)].collect()
    val mx = o.map(_._2.getTime).max
    val cutoff = mx - 90L * 86400000L
    val last = o.groupBy(_._1).map { case (k, g) => (k, g.map(_._2.getTime).max) }
    val scored = Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long)].collect()
      .map { case (ck, v) => (v, if (last.get(ck).forall(_ < cutoff)) 1L else 0L) }
    val pos = scored.filter(_._2 == 1L).map(_._1)
    val neg = scored.filter(_._2 == 0L).map(_._1)
    def v10(x: Long) = (neg.count(_ < x) + 0.5 * neg.count(_ == x)) / neg.length
    def v01(y: Long) = (pos.count(_ > y) + 0.5 * pos.count(_ == y)) / pos.length
    val expAuc = pos.map(v10).sum / pos.length
    val s10 = pos.map(x => math.pow(v10(x) - expAuc, 2)).sum / (pos.length - 1)
    val s01 = neg.map(y => math.pow(v01(y) - expAuc, 2)).sum / (neg.length - 1)
    val expSe = math.sqrt(s10 / pos.length + s01 / neg.length)
    assert(nPos == pos.length.toLong && nNeg == neg.length.toLong)
    assert(math.abs(auc - expAuc) < 1e-6)
    assert(math.abs(se - expSe) < 1e-6)
    assert(se > 0.0 && se < 0.5)
  }

  test("text_char_entropy matches driver bigram entropy per language") {
    val got = SparkEntry.queries("text_char_entropy")(spark, sfDir)
      .select("lang", "n_bigrams", "vocab", "char_entropy")
      .as[(String, Long, Long, Double)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("lang"), col("text")).as[(String, String)].collect()
    val byLang = docs.filter(_._2.length >= 2).groupBy(_._1)
    assert(got.map(_._1).toSet == byLang.keySet)
    got.foreach { case (lang, n, vocab, h) =>
      val grams = byLang(lang).flatMap(d => d._2.sliding(2).filter(_.length == 2))
      val counts = grams.groupBy(identity).map(_._2.size.toLong)
      assert(n == grams.length.toLong && vocab == counts.size.toLong)
      val nn = n.toDouble
      val exp = counts.map(c => -c / nn * math.log(c / nn)).sum
      assert(math.abs(h - exp) < 1e-5, s"lang $lang")
      assert(h > 0.0 && h <= math.log(vocab.toDouble) + 1e-9)
    }
  }
}

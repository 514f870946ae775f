package graft

import org.apache.spark.sql.functions._

/** Semantic pins for an_hill_tail, an_stump_split, and
  * an_price_volume_mix (r11): driver recomputation at sf0.001. */
class TailSplitMixSpec extends SparkSpec {
  import spark.implicits._

  test("an_hill_tail equals the driver top-k estimator with ties") {
    val (k, xref, hinv, alpha) = SparkEntry.queries("an_hill_tail")(spark, sfDir)
      .select("k", "x_ref_cents", "hill_inv_alpha", "tail_alpha")
      .as[(Long, Long, Double, Double)].collect().head
    val vs = Tables.orders(spark, sfDir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[Long].collect().sorted.reverse
    val kk = k.toInt
    val expXref = vs(kk) // (k+1)-th from the top, 0-indexed
    val expHinv = vs.take(kk).map(x => math.log(x.toDouble / expXref)).sum / kk
    assert(xref == expXref)
    assert(math.abs(hinv - expHinv) < 1e-6)
    assert(math.abs(alpha - 1.0 / expHinv) < 1e-4)
    assert(hinv > 0.0)
  }

  test("an_stump_split maximizes Gini gain over every threshold") {
    val (n, nPos, split, nLeft, posLeft, gain) =
      SparkEntry.queries("an_stump_split")(spark, sfDir)
        .select("n", "n_pos", "split_cents", "n_left", "pos_left", "gini_gain")
        .as[(Long, Long, Long, Long, Long, Double)].collect().head
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate")).as[(Long, java.sql.Timestamp)].collect()
    val mx = o.map(_._2.getTime).max
    val cutoff = mx - 90L * 86400000L
    val last = o.groupBy(_._1).map { case (ck, g) => (ck, g.map(_._2.getTime).max) }
    val scored = Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long)].collect()
      .map { case (ck, v) => (v, if (last.get(ck).forall(_ < cutoff)) 1L else 0L) }
    def gini(p: Long, t: Long): Double = {
      val f = p.toDouble / t; 1.0 - f * f - (1.0 - f) * (1.0 - f)
    }
    val nn = scored.length.toLong; val pp = scored.map(_._2).sum
    val cands = scored.map(_._1).distinct.sorted.flatMap { v =>
      val nl = scored.count(_._1 <= v).toLong
      if (nl == nn) None else {
        val plf = scored.filter(_._1 <= v).map(_._2).sum
        val g = gini(pp, nn) -
          nl.toDouble / nn * gini(plf, nl) -
          (nn - nl).toDouble / nn * gini(pp - plf, nn - nl)
        Some((v, nl, plf, g))
      }
    }
    val best = cands.map(_._4).max
    val exp = cands.filter(_._4 == best).minBy(_._1)
    assert(n == nn && nPos == pp)
    assert(split == exp._1 && nLeft == exp._2 && posLeft == exp._3)
    assert(math.abs(gain - best) < 1e-6)
    assert(gain >= 0.0)
  }

  test("an_price_volume_mix effects bridge the revenue delta exactly") {
    val got = SparkEntry.queries("an_price_volume_mix")(spark, sfDir)
      .select("segment", "ra", "rb", "price_effect", "volume_effect", "cross_effect")
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (seg, ra, rb, pe, ve, ce) =>
      // the three effects must reconstruct Δrev to rounding tolerance
      val bridge = pe + ve + ce
      val dRev = (rb - ra).toDouble / 10000.0
      assert(math.abs(bridge - dRev) < 0.03, s"$seg bridge $bridge vs $dRev")
    }
    // driver recomputation of one segment end-to-end
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .as[(Long, Long, java.sql.Timestamp)].collect()
    val days = o.map(_._3.getTime / 86400000L)
    val mn = days.min; val mx = days.max
    val segOf = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment")).as[(Long, String)].collect().toMap
    val orderMeta = o.map(r => (r._1, (segOf.get(r._2),
      (r._3.getTime / 86400000L - mn) * 2 < (mx - mn)))).toMap
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        (col("l_quantity").cast("decimal(24,2)") * 100).cast("bigint"),
        (col("l_extendedprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long, Long)].collect()
    val target = got.head._1
    var qa = 0L; var qb = 0L; var ra2 = 0L; var rb2 = 0L
    li.foreach { case (ok, q, r) =>
      orderMeta.get(ok).foreach {
        case (Some(s), early) if s == target =>
          if (early) { qa += q; ra2 += r } else { qb += q; rb2 += r }
        case _ => ()
      }
    }
    val h = got.head
    assert(h._2 == ra2 && h._3 == rb2)
    val pa = ra2.toDouble / qa; val pb = rb2.toDouble / qb
    assert(math.abs(h._4 - (pb - pa) * qa / 10000.0) < 0.01)
    assert(math.abs(h._5 - pa * (qb - qa) / 10000.0) < 0.01)
  }
}

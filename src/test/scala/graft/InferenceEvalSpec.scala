package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-11 inference/evaluation additions:
  * purity/ARI, the permutation test, and the log-rank test, each
  * recomputed in the driver at sf0.001. */
class InferenceEvalSpec extends SparkSpec {
  import spark.implicits._

  test("sim_cluster_purity matches a driver contingency computation") {
    val (n, nCells, nLabels, purity, ari) =
      SparkEntry.queries("sim_cluster_purity")(spark, sfDir)
        .select("n", "n_cells", "n_labels", "purity", "ari")
        .as[(Long, Long, Long, Double, Double)].head()
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>"),
        col("label").cast("long"))
      .as[(Long, Seq[Double], Long)].collect().sortBy(_._1)
    val cents = vecs.take(16).map(_._2.map(x => math.round(x * 1e6)).toArray)
    val cnorms = cents.map(c => math.sqrt(c.map(x => x.toDouble * x).sum))
    def cell(v: Seq[Double]): Int = {
      val q = v.map(x => math.round(x * 1e6)).toArray
      val scores = cents.zip(cnorms).map { case (c, nm) =>
        c.zip(q).map { case (a, b) => a * b }.sum.toDouble / nm
      }
      scores.indexOf(scores.max)
    }
    val cont = vecs.map(r => ((cell(r._2), r._3), 1L))
      .groupBy(_._1).map { case (k, g) => (k, g.size.toLong) }
    val a = cont.groupBy(_._1._1).map { case (k, g) => (k, g.values.sum) }
    val b = cont.groupBy(_._1._2).map { case (k, g) => (k, g.values.sum) }
    val nn = vecs.length.toLong
    def c2(x: Long) = x * (x - 1) / 2
    val sij = cont.values.map(c2).sum
    val sa = a.values.map(c2).sum; val sb = b.values.map(c2).sum
    val expPurity = cont.groupBy(_._1._1)
      .map { case (_, g) => g.values.max }.sum.toDouble / nn
    val exp = sa.toDouble * sb / c2(nn)
    val expAri = (sij - exp) / ((sa + sb) / 2.0 - exp)
    assert(n == nn && nCells == a.size.toLong && nLabels == b.size.toLong)
    assert(math.abs(purity - expPurity) < 1e-6)
    assert(math.abs(ari - expAri) < 1e-5)
    assert(purity >= 1.0 / b.size && purity <= 1.0 + 1e-9)
  }

  test("an_permutation_test replays the tempered sign flips exactly") {
    val (nDays, sObs, nExtreme, p) =
      SparkEntry.queries("an_permutation_test")(spark, sfDir)
        .select("n_days", "s_obs", "n_extreme", "p_value")
        .as[(Long, Long, Long, Double)].head()
    def daily(t: String) = Tables.events(spark, sfDir)
      .filter(col("event_type") === t)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("v"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    val a = daily("click"); val b = daily("view")
    val ds = a.keySet.intersect(b.keySet).toSeq.sortBy(_.getTime)
      .map(d => a(d) - b(d))
    val P = 2147483647L
    def temper(key: Long): Long = {
      val h1 = ((key % P) * 1000003L + 12289L) % P
      val h2 = h1 ^ (h1 >>> 15)
      val h3 = (h2 * 786433L) % P
      h3 ^ (h3 >>> 13)
    }
    val s0 = ds.sum
    val extreme = (0 until 128).count { r =>
      val sr = ds.zipWithIndex.map { case (d, i) =>
        if (temper((i + 1).toLong * 128 + r) % 2 == 1) -d else d
      }.sum
      math.abs(sr) >= math.abs(s0)
    }
    assert(nDays == ds.length.toLong && sObs == s0)
    assert(nExtreme == extreme.toLong)
    assert(math.abs(p - (extreme + 1).toDouble / 129.0) < 1e-6)
    assert(p > 0.0 && p <= 1.0)
  }

  test("an_logrank matches a driver hypergeometric computation") {
    val (n1, n0, o1, e1, z) = SparkEntry.queries("an_logrank")(spark, sfDir)
      .select("n1", "n0", "o1", "e1", "z_logrank")
      .as[(Long, Long, Long, Double, Double)].head()
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate")).as[(Long, java.sql.Timestamp)].collect()
    val mx = o.map(_._2.getTime).max
    val cutoff = mx - 90L * 86400000L
    val segs = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("c_custkey"), (col("c_mktsegment") === "BUILDING").cast("long"))
      .as[(Long, Long)].collect().toMap
    val cust = o.groupBy(_._1).toSeq.flatMap { case (ck, g) =>
      segs.get(ck).map { gg =>
        val f = g.map(_._2.getTime).min; val l = g.map(_._2.getTime).max
        ((l - f) / 86400000L, gg, if (l < cutoff) 1L else 0L)
      }
    }
    val nn1 = cust.count(_._2 == 1L).toLong
    val nn0 = cust.count(_._2 == 0L).toLong
    var oo1 = 0L; var ee1 = 0.0; var vv = 0.0
    cust.map(_._1).distinct.sorted.foreach { t =>
      val d1 = cust.count(c => c._1 == t && c._2 == 1L && c._3 == 1L).toLong
      val d0 = cust.count(c => c._1 == t && c._2 == 0L && c._3 == 1L).toLong
      if (d1 + d0 > 0) {
        val r1 = cust.count(c => c._1 >= t && c._2 == 1L).toDouble
        val r0 = cust.count(c => c._1 >= t && c._2 == 0L).toDouble
        val rt = r1 + r0; val dt = (d1 + d0).toDouble
        oo1 += d1
        ee1 += dt * r1 / rt
        if (rt > 1.0) vv += dt * (r1 / rt) * (r0 / rt) * (rt - dt) / (rt - 1.0)
      }
    }
    val expZ = if (vv > 0) (oo1 - ee1) / math.sqrt(vv) else 0.0
    assert(n1 == nn1 && n0 == nn0 && o1 == oo1)
    assert(math.abs(e1 - ee1) < 1e-4)
    assert(math.abs(z - expZ) < 1e-4)
  }
}

package graft

import org.apache.spark.sql.functions._

/** Independent-recompute pins for the round-17 wave-5 keys: all four
  * re-derive from collected rows with plain Scala arithmetic — the
  * Cochrane–Orcutt two-stage fit, the Hotelling 2×2 solve, the
  * Brown–Forsythe median-deviation ANOVA, and the bitemporal as-of
  * ledger replayed order by order. */
class Round17Wave5Spec extends SparkSpec {
  import spark.implicits._

  test("cochrane-orcutt matches a direct two-stage recompute") {
    val sp = SparkEntry.dailyRevenueSpine(spark, sfDir)
      .select(col("d").cast("long"), col("rev_c"))
      .orderBy("d").as[(Long, Long)].collect()
    val x = sp.map(_._1.toDouble); val y = sp.map(_._2.toDouble)
    val n = x.length.toDouble
    def c(a: Array[Double], b: Array[Double]) =
      n * a.zip(b).map(p => p._1 * p._2).sum - a.sum * b.sum
    val b0 = c(x, y) / c(x, x)
    val a0 = (y.sum - b0 * x.sum) / n
    val u = x.zip(y).map { case (xi, yi) => yi - a0 - b0 * xi }
    val rho = u.sliding(2).map { case Array(p, q) => p * q }.sum /
      u.dropRight(1).map(v => v * v).sum
    val xs = x.sliding(2).map { case Array(p, q) => q - rho * p }.toArray
    val ys = u.sliding(2).map { case Array(p, q) => q - rho * p }.toArray
    val n2 = xs.length.toDouble
    val bco = (n2 * xs.zip(ys).map(p => p._1 * p._2).sum - xs.sum * ys.sum) /
      (n2 * xs.map(v => v * v).sum - xs.sum * xs.sum)
    val r = SparkEntry.queries("an_cochrane_orcutt")(spark, sfDir)
      .select("n", "n2", "rho", "slope_ols", "slope_co")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 == x.length && r._2 == xs.length)
    assert(math.abs(r._3 - rho) < 1e-5, s"rho ${r._3} vs $rho")
    assert(math.abs(r._4 - b0 / 100.0) < math.abs(b0) * 1e-5 + 1e-5)
    assert(math.abs(r._5 - bco / 100.0) < math.abs(bco) * 1e-4 + 1e-3,
      s"slope_co ${r._5} vs ${bco / 100.0}")
    assert(math.abs(r._3) < 1.0, "AR(1) coefficient must be stationary")
  }

  test("hotelling t2 matches a direct pooled-covariance recompute") {
    val oc = Tables.orders(spark, sfDir).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("noi"))
      .select(col("o_custkey").cast("long"), col("noi").cast("long"))
      .as[(Long, Long)].collect().toMap
    val rows = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("c_custkey").cast("long"), (col("c_mktsegment") === "BUILDING"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Boolean, Long)].collect()
      .map { case (ck, g, b) => (g, b.toDouble, oc.getOrElse(ck, 0L).toDouble) }
    def stats(g: Boolean) = {
      val vs = rows.filter(_._1 == g)
      val n = vs.length.toDouble
      val (mb, mo) = (vs.map(_._2).sum / n, vs.map(_._3).sum / n)
      val w11 = vs.map(v => (v._2 - mb) * (v._2 - mb)).sum
      val w22 = vs.map(v => (v._3 - mo) * (v._3 - mo)).sum
      val w12 = vs.map(v => (v._2 - mb) * (v._3 - mo)).sum
      (n, mb, mo, w11, w22, w12)
    }
    val (n1, mb1, mo1, a11, a22, a12) = stats(true)
    val (n0, mb0, mo0, b11, b22, b12) = stats(false)
    val nm2 = n1 + n0 - 2
    val (s11, s22, s12) = ((a11 + b11) / nm2, (a22 + b22) / nm2, (a12 + b12) / nm2)
    val (d1, d2) = (mb1 - mb0, mo1 - mo0)
    val t2 = (n1 * n0 / (n1 + n0)) *
      (d1 * d1 * s22 - 2 * d1 * d2 * s12 + d2 * d2 * s11) /
      (s11 * s22 - s12 * s12)
    val r = SparkEntry.queries("an_hotelling_t2")(spark, sfDir)
      .select("n1", "n0", "t2_stat", "f_stat")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 == n1.toLong && r._2 == n0.toLong)
    assert(math.abs(r._3 - t2) < t2 * 1e-5 + 1e-5, s"T2 ${r._3} vs $t2")
    assert(math.abs(r._4 - t2 * (n1 + n0 - 3) / (2 * nm2)) < 1e-4)
  }

  test("brown-forsythe matches a direct median-deviation anova") {
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(String, Long)].collect()
    val zs = rows.groupBy(_._1).values.flatMap { g =>
      val v = g.map(_._2).sorted
      val n = v.length
      val m2 = v((n + 1) / 2 - 1) + v(n / 2)
      v.map(x => math.abs(2 * x - m2).toDouble)
    }.toArray
    val byG = rows.groupBy(_._1).map { case (grp, g) =>
      val v = g.map(_._2).sorted; val n = v.length
      val m2 = v((n + 1) / 2 - 1) + v(n / 2)
      grp -> g.map(x => math.abs(2 * x._2 - m2).toDouble)
    }
    val k = byG.size; val nn = rows.length.toDouble
    val grand = zs.sum / nn
    val ssb = byG.values.map { v =>
      val m = v.sum / v.length; v.length * (m - grand) * (m - grand) }.sum
    val ssw = byG.values.map { v =>
      val m = v.sum / v.length; v.map(x => (x - m) * (x - m)).sum }.sum
    val f = (ssb / (k - 1)) / (ssw / (nn - k))
    val r = SparkEntry.queries("an_brown_forsythe")(spark, sfDir)
      .select("k", "n", "f_bf").as[(Long, Long, Double)].head()
    assert(r._1 == k && r._2 == rows.length)
    assert(math.abs(r._3 - f) < f * 1e-5 + 1e-5, s"F ${r._3} vs $f")
  }

  test("bitemporal as-of ledger matches an order-by-order replay") {
    val t0 = java.sql.Timestamp.valueOf("1997-01-01 00:00:00").getTime
    val ret = Tables.lineitem(spark, sfDir)
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate").cast("timestamp").cast("long")).as("tx2"),
        (sum(col("l_extendedprice").cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
          .cast("bigint").as("ret_c"))
      .select(col("l_orderkey").cast("long"), col("tx2") * 1000, col("ret_c"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").cast("long"),
        col("o_orderdate").cast("timestamp").cast("long") * 1000,
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long, Long)].collect()
    var asofTotal = BigInt(0); var nOrders = 0L; var nCorr = 0L
    orders.foreach { case (ok, od, amt) =>
      if (od <= t0) {
        nOrders += 1
        ret.get(ok) match {
          case Some((tx2, rc)) if tx2 <= t0 => nCorr += 1; asofTotal += (amt - rc)
          case _ => asofTotal += amt
        }
      }
    }
    val rows = SparkEntry.queries("etl_bitemporal")(spark, sfDir)
      .select("n_orders", "n_corrected", "asof_amount")
      .as[(Long, Long, Double)].collect()
    assert(rows.map(_._1).sum == nOrders)
    assert(rows.map(_._2).sum == nCorr, "correction counts must match the replay")
    assert(math.abs(rows.map(_._3).sum - asofTotal.toDouble / 100.0) < 0.01,
      s"as-of total ${rows.map(_._3).sum} vs replay ${asofTotal.toDouble / 100.0}")
  }
}

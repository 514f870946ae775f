package graft

import org.apache.spark.sql.functions._

/** Independent-recompute pins for the r19 FOURTH operator wave — the
  * normal-scores family ([[SparkEntryAn10]]). Φ⁻¹ is re-implemented
  * here from the published Acklam coefficients in plain Scala (NOT by
  * calling the library kernel), so a transcription error in the Column
  * tree or its SQL twin fails this spec even though both engine sides
  * were written by the same hand. */
class Round19Wave4Spec extends SparkSpec {
  import spark.implicits._

  private def close(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  /** Acklam Φ⁻¹, independent plain-Scala transcription. */
  private def normInvRef(p: Double): Double = {
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02,
      -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00,
      4.374664141464968e+00, 2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = math.min(p, 1 - p)
    if (pl < 0.02425) {
      val q = math.sqrt(-2 * math.log(pl))
      val x = (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        (((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q) + 1.0)
      if (p < 0.5) x else -x
    } else {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        ((((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r) + 1.0)
    }
  }

  test("the Φ⁻¹ kernel matches erf-based inversion to its documented 1.2e-9 envelope") {
    // reference via bisection on the CDF from the JDK-free erf series:
    // Φ(x) = (1 + erf(x/√2))/2 with erf by continued Taylor (|x| ≤ 6)
    def erf(x: Double): Double = {
      val t = x
      var term = t; var sum = t; var n = 0
      while (math.abs(term) > 1e-18 && n < 200) {
        n += 1
        term = term * (-t * t) / n
        sum += term / (2 * n + 1)
      }
      2.0 / math.sqrt(math.Pi) * sum
    }
    def phi(x: Double): Double = (1 + erf(x / math.sqrt(2.0))) / 2
    for (p <- Seq(1e-5, 0.001, 0.02, 0.0243, 0.2, 0.5, 0.7, 0.9757, 0.99, 0.9999)) {
      val x = normInvRef(p)
      assert(math.abs(phi(x) - p) < 2e-9, s"p=$p x=$x phi=${phi(x)}")
    }
  }

  private def priorityCents: Map[String, Array[Long]] =
    Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(String, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap

  private def midranks(all: Array[Long]): Map[Long, Double] = {
    val sorted = all.sorted
    val firstIdx = scala.collection.mutable.Map.empty[Long, Int]
    val lastIdx = scala.collection.mutable.Map.empty[Long, Int]
    sorted.zipWithIndex.foreach { case (v, i) =>
      if (!firstIdx.contains(v)) firstIdx(v) = i + 1
      lastIdx(v) = i + 1
    }
    firstIdx.keys.map(v => v -> (firstIdx(v) + lastIdx(v)) / 2.0).toMap
  }

  test("van der waerden matches a direct normal-scores recompute") {
    val byG = priorityCents
    val all = byG.values.flatten.toArray
    val n = all.length
    val rk = midranks(all)
    val score = rk.map { case (v, r) => v -> normInvRef(r / (n + 1.0)) }
    val saa = all.map(v => score(v) * score(v)).sum
    val t = byG.values.map { vs =>
      val ag = vs.map(score).sum; ag * ag / vs.length
    }.sum / (saa / (n - 1.0))
    val got = SparkEntry.queries("an_van_der_waerden")(spark, sfDir)
      .select("t_vdw").as[Double].head()
    assert(close(got, t, 1e-5), s"$got vs $t")
  }

  test("shapiro-francia matches a direct Blom-scores recompute") {
    val xs = SparkEntry.dailyRevenueSpine(spark, sfDir)
      .select(col("rev_c"), col("d").cast("long"))
      .as[(Long, Long)].collect().sortBy(identity).map(_._1.toDouble)
    val n = xs.length
    val m = (1 to n).map(i => normInvRef((i - 0.375) / (n + 0.25)))
    val mean = xs.sum / n
    val ssx = xs.map(x => (x - mean) * (x - mean)).sum
    val smx = m.zip(xs).map { case (mi, xi) => mi * xi }.sum
    val smm = m.map(mi => mi * mi).sum
    val w = smx * smx / (smm * ssx)
    val got = SparkEntry.queries("an_shapiro_francia")(spark, sfDir)
      .select("w_prime").as[Double].head()
    assert(close(got, w, 1e-5), s"$got vs $w")
  }

  test("fligner-killeen matches a direct median-deviation-scores recompute") {
    val byG = priorityCents
    val m2 = byG.view.mapValues { vs =>
      val s = vs.sorted; val n = s.length
      s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)
    }.toMap
    val us = byG.toSeq.flatMap { case (g, vs) =>
      vs.map(v => (g, math.abs(2 * v - m2(g))))
    }
    val all = us.map(_._2).toArray
    val n = all.length
    val rk = midranks(all)
    val score = rk.map { case (u, r) => u -> normInvRef(0.5 + r / (2.0 * (n + 1))) }
    val sa = us.map(x => score(x._2)).sum
    val saa = us.map(x => { val a = score(x._2); a * a }).sum
    val abar = sa / n
    val v2 = (saa - sa * sa / n) / (n - 1.0)
    val x2 = us.groupBy(_._1).values.map { g =>
      val ag = g.map(x => score(x._2)).sum / g.length
      g.length * (ag - abar) * (ag - abar)
    }.sum / v2
    val got = SparkEntry.queries("an_fligner_killeen")(spark, sfDir)
      .select("x2_fk").as[Double].head()
    assert(close(got, x2, 1e-5), s"$got vs $x2")
  }
}

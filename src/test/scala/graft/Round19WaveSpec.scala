package graft

import org.apache.spark.sql.functions._

/** Independent-recompute pins for the r19 operator wave (same posture
  * as [[Round18WaveSpec]]): every statistic re-derived driver-side from
  * the raw collected data with plain Scala doubles/BigInt and NONE of
  * the query machinery, so a semantic error common to the Scala kernel
  * and its SQL oracle (the same-hand hazard) still fails here. */
class Round19WaveSpec extends SparkSpec {
  import spark.implicits._

  private def close(a: Double, b: Double, tol: Double = 1e-6): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.abs(b))

  private def orderCents: Array[Long] =
    Tables.orders(spark, sfDir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[Long].collect()

  private def spine: Seq[Long] =
    SparkEntry.dailyRevenueSpine(spark, sfDir)
      .select(col("d").cast("long"), col("rev_c"))
      .orderBy("d").as[(Long, Long)].collect().toSeq.map(_._2)

  test("hoover matches a direct mean-deviation recompute") {
    val vs = orderCents
    val n = vs.length.toDouble
    val t = vs.map(BigInt(_)).sum.toDouble
    val mean = t / n
    val h = vs.map(v => math.abs(v - mean)).sum / (2.0 * t)
    val r = SparkEntry.queries("an_hoover")(spark, sfDir)
      .select("hoover").as[Double].head()
    assert(close(r, h), s"$r vs $h")
  }

  test("rosenbluth matches a direct descending-rank share recompute") {
    val vs = orderCents.sorted(Ordering[Long].reverse)
    val t = vs.map(BigInt(_)).sum
    val num = vs.zipWithIndex.map { case (v, i) => BigInt(i + 1) * v }.sum
    val ht = t.toDouble / (2.0 * num.toDouble - t.toDouble)
    val r = SparkEntry.queries("an_rosenbluth")(spark, sfDir)
      .select("rosenbluth").as[Double].head()
    assert(close(r, ht), s"$r vs $ht")
  }

  test("simpson matches direct collision-probability counts") {
    val counts = Tables.events(spark, sfDir).groupBy("event_type").count()
      .as[(String, Long)].collect().map(_._2)
    val n = counts.sum.toDouble
    val lam = counts.map(c => c.toDouble * (c - 1)).sum / (n * (n - 1.0))
    val eff = n * n / counts.map(c => c.toDouble * c).sum
    val r = SparkEntry.queries("an_simpson")(spark, sfDir)
      .select("simpson_lambda", "gini_simpson", "effective_types")
      .as[(Double, Double, Double)].head()
    assert(close(r._1, lam) && close(r._2, 1.0 - lam) && close(r._3, eff),
      s"$r vs ($lam, ${1.0 - lam}, $eff)")
  }

  test("turning points matches a direct strict-extremum scan") {
    val sp = spine
    val t = sp.sliding(3).count(w => (w(1) > w(0) && w(1) > w(2)) ||
      (w(1) < w(0) && w(1) < w(2)))
    val n = sp.length.toDouble
    val z = (t - 2.0 * (n - 2.0) / 3.0) / math.sqrt((16.0 * n - 29.0) / 90.0)
    val r = SparkEntry.queries("an_turning_points")(spark, sfDir)
      .select("turning_points", "z").as[(Long, Double)].head()
    assert(r._1 == t.toLong && close(r._2, z), s"$r vs ($t, $z)")
  }

  test("difference-sign matches a direct increase count") {
    val sp = spine
    val d = sp.sliding(2).count(w => w(1) > w(0))
    val n = sp.length.toDouble
    val z = (d - (n - 1.0) / 2.0) / math.sqrt((n + 1.0) / 12.0)
    val r = SparkEntry.queries("an_difference_sign")(spark, sfDir)
      .select("n_increases", "z").as[(Long, Double)].head()
    assert(r._1 == d.toLong && close(r._2, z), s"$r vs ($d, $z)")
  }

  test("gastwirth matches direct order statistics") {
    val vs = orderCents.sorted
    val n = vs.length
    def q(r: Int): Long = vs(r - 1) // lower order statistic at rank r
    val g = (3 * q((n + 2) / 3) + 4 * q((n + 1) / 2) + 3 * q((2 * n + 2) / 3)) / 1000.0
    val r = SparkEntry.queries("an_gastwirth")(spark, sfDir)
      .select("gastwirth_usd").as[Double].head()
    assert(close(r, g), s"$r vs $g")
  }

  test("yuen matches a direct trim-and-winsorize recompute") {
    val byG = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("c_mktsegment"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(String, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    def stats(vs: Array[Long]): (Double, Double, Long) = {
      val n = vs.length
      val g = n / 5
      val h = n - 2 * g
      val kept = vs.slice(g, n - g)
      val mt = kept.map(BigInt(_)).sum.toDouble / h
      val wins = vs.indices.map { i =>
        if (i < g) vs(g) else if (i >= n - g) vs(n - g - 1) else vs(i)
      }
      val mw = wins.map(BigInt(_)).sum.toDouble / n
      val ssdw = wins.map(v => (v - mw) * (v - mw)).sum
      val d = ssdw / (h.toDouble * (h - 1.0))
      (mt, d, h.toLong)
    }
    val (mt1, d1, h1) = stats(byG("BUILDING"))
    val (mt2, d2, h2) = stats(byG("AUTOMOBILE"))
    val t = (mt1 - mt2) / math.sqrt(d1 + d2)
    val c = d1 / (d1 + d2)
    val df = 1.0 / (c * c / (h1 - 1.0) + (1.0 - c) * (1.0 - c) / (h2 - 1.0))
    val r = SparkEntry.queries("an_yuen_ttest")(spark, sfDir)
      .select("t_yuen", "df_yuen", "h1", "h2").as[(Double, Double, Long, Long)].head()
    assert(r._3 == h1 && r._4 == h2)
    assert(close(r._1, t, 1e-5) && close(r._2, df, 1e-5), s"$r vs ($t, $df)")
  }

  test("watson u2 matches a direct sorted-CvM recompute") {
    val ms = Tables.events(spark, sfDir)
      .select((unix_micros(col("ts")) -
        unix_micros(date_trunc("day", col("ts")))).as("m"))
      .as[Long].collect().sorted
    val n = ms.length
    val D = 86400000000.0
    val us = ms.map(_ / D)
    val w2 = us.zipWithIndex.map { case (u, i) =>
      val e = (2.0 * (i + 1) - 1.0) / (2.0 * n)
      (u - e) * (u - e)
    }.sum + 1.0 / (12.0 * n)
    val ubar = us.sum / n
    val u2 = w2 - n * (ubar - 0.5) * (ubar - 0.5)
    val r = SparkEntry.queries("an_watson_u2")(spark, sfDir)
      .select("w2", "watson_u2").as[(Double, Double)].head()
    assert(close(r._1, w2, 1e-5) && close(r._2, u2, 1e-5), s"$r vs ($w2, $u2)")
  }

  test("sentence stats match a direct regex recompute") {
    val docs = Tables.documents(spark, sfDir).select("text").as[String].collect()
    val buckets = docs.flatMap { t =>
      val nSent = t.split("[.!?]").count(_.trim.nonEmpty)
      val nWords = t.trim.split("\\s+").length.toLong
      if (nSent > 0) Some((nSent.toLong, nWords)) else None
    }.groupBy(_._1).map { case (k, rs) =>
      (k, rs.length.toLong, rs.map(_._2).sum.toDouble / (k * rs.length))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("text_sentence_stats")(spark, sfDir)
      .select("n_sentences", "n_docs", "words_per_sentence")
      .as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.map(t => (t._1, t._2)) == buckets.map(t => (t._1, t._2)),
      s"bucket counts diverged: $got vs $buckets")
    got.zip(buckets).foreach { case (g, b) =>
      assert(close(g._3, b._3), s"wps at ${g._1}: ${g._3} vs ${b._3}")
    }
  }
}

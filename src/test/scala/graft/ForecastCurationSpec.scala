package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-11 forecasting/curation additions:
  * driver recomputation at sf0.001. */
class ForecastCurationSpec extends SparkSpec {
  import spark.implicits._

  test("an_pr_auc equals sklearn-style average precision in the driver") {
    val (nPos, ap) = SparkEntry.queries("an_pr_auc")(spark, sfDir)
      .select("n_pos", "avg_precision").as[(Long, Double)].head()
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate")).as[(Long, java.sql.Timestamp)].collect()
    val mx = o.map(_._2.getTime).max
    val cutoff = mx - 90L * 86400000L
    val last = o.groupBy(_._1).map { case (k, g) => (k, g.map(_._2.getTime).max) }
    val scored = Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long)].collect()
      .map { case (ck, v) =>
        val churn = last.get(ck).forall(_ < cutoff)
        (v, if (churn) 1L else 0L)
      }
    val p = scored.map(_._2).sum
    // ties-grouped step AP over distinct scores
    val byV = scored.groupBy(_._1).map { case (v, g) =>
      (v, g.length.toLong, g.map(_._2).sum)
    }.toSeq
    val expAp = byV.map { case (v, _, c1) =>
      val tpGte = scored.filter(_._1 >= v).map(_._2).sum
      val cntGte = scored.count(_._1 >= v).toLong
      c1.toDouble / p * (tpGte.toDouble / cntGte)
    }.sum
    assert(nPos == p)
    assert(math.abs(ap - expAp) < 1e-5)
    assert(ap >= p.toDouble / scored.length - 1e-9 && ap <= 1.0 + 1e-9,
      "AP at least the positive base rate, at most 1")
  }

  test("an_croston matches a driver dyadic EWMA at the last event") {
    val got = SparkEntry.queries("an_croston")(spark, sfDir)
      .select("pk", "n_events", "z_num", "p_num", "croston_per_day")
      .as[(Long, Long, Long, Long, Double)].collect()
    val d = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey"), col("l_shipdate"))
      .agg(sum((col("l_quantity").cast("decimal(24,2)") * 100).cast("bigint")).as("q"))
      .as[(Long, java.sql.Timestamp, Long)].collect()
      .groupBy(_._1).map { case (pk, g) =>
        (pk, g.sortBy(_._2.getTime).map(r => (r._2.getTime / 86400000L, r._3)))
      }
    val expected = d.filter(_._2.length >= 9).map { case (pk, ev) =>
      val qs = ev.map(_._2)
      val gaps = ev.sliding(2).map { case Array(a, b) => b._1 - a._1 }.toArray
      val z = (0 until 8).map(k => qs(qs.length - 1 - k) * (1L << (7 - k))).sum
      val pN = (0 until 8).map(k => gaps(gaps.length - 1 - k) * (1L << (7 - k))).sum
      (pk, ev.length.toLong, z, pN)
    }.toSet
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSet == expected)
    got.foreach { r =>
      assert(math.abs(r._5 - r._3.toDouble / r._4) < 1e-6 || r._4 == 0L)
    }
    assert(got.nonEmpty)
  }

  test("an_sax words use the N(0,1) quartile alphabet and cover all days") {
    val got = SparkEntry.queries("an_sax")(spark, sfDir)
      .select("week", "n_days", "sax_word")
      .as[(java.sql.Timestamp, Long, String)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, n, w) =>
      assert(w.length.toLong == n, "one symbol per day")
      assert(w.forall("abcd".contains(_)))
    }
    // alphabet should spread: a stationary-ish series uses >1 symbol
    assert(got.map(_._3).mkString.distinct.length >= 2)
    // symbol balance: quartile breakpoints put each symbol near 25%
    val all = got.map(_._3).mkString
    val shares = "abcd".map(c => all.count(_ == c).toDouble / all.length)
    shares.foreach(s => assert(s > 0.05 && s < 0.60, s"symbol share $s off quartiles"))
  }

  test("etl_rare_collapse keeps every >=3% category and collapses the rest") {
    val got = SparkEntry.queries("etl_rare_collapse")(spark, sfDir)
      .select("category", "n_source_cats", "n_rows", "share")
      .as[(String, Long, Long, Double)].collect()
    val seg = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey").cast("long"))
      .as[(Long, Long)].collect().toMap
    val cats = Tables.orders(spark, sfDir).select(col("o_custkey")).as[Long].collect()
      .flatMap(seg.get)
    val n = cats.length.toLong
    val counts = cats.groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val kept = counts.filter { case (_, c) => c * 10000 >= 300 * n }
    val other = counts.filterNot { case (_, c) => c * 10000 >= 300 * n }
    val gotMap = got.map(r => (r._1, (r._2, r._3))).toMap
    kept.foreach { case (k, c) =>
      assert(gotMap(k.toString) == ((1L, c)), s"category $k")
    }
    if (other.nonEmpty)
      assert(gotMap("OTHER") == ((other.size.toLong, other.values.sum)))
    assert(got.map(_._3).sum == n, "coverage partitions the rows")
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-4)
  }
}

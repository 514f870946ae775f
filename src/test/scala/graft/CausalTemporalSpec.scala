package graft

import org.apache.spark.sql.functions._

/** Semantic pins for an_qini, an_cochran_q, and q_interval_relations
  * (r11): driver recomputation at sf0.001. */
class CausalTemporalSpec extends SparkSpec {
  import spark.implicits._

  test("an_qini equals the driver ties-grouped step sum") {
    val (nt, nc, uplift, area) = SparkEntry.queries("an_qini")(spark, sfDir)
      .select("n_treated", "n_control", "total_uplift", "qini_step_area")
      .as[(Long, Long, Double, Double)].collect().head
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate")).as[(Long, java.sql.Timestamp)].collect()
    val mx = o.map(_._2.getTime).max
    val cutoff = mx - 90L * 86400000L
    val last = o.groupBy(_._1).map { case (ck, g) => (ck, g.map(_._2.getTime).max) }
    val rows = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("c_custkey"), (col("c_mktsegment") === "BUILDING").cast("long"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long, Long)].collect()
      .map { case (ck, t, v) => (v, t, if (last.get(ck).forall(_ < cutoff)) 1L else 0L) }
    val ntt = rows.count(_._2 == 1L).toLong
    val nct = rows.length - ntt
    val ytt = rows.filter(_._2 == 1L).map(_._3).sum
    val yct = rows.filter(_._2 == 0L).map(_._3).sum
    val expArea = rows.map(_._1).distinct.sorted.map { v =>
      val gte = rows.filter(_._1 >= v)
      val at = rows.filter(_._1 == v)
      val ntg = gte.count(_._2 == 1L).toDouble
      val ncg = gte.count(_._2 == 0L).toDouble
      val ytg = gte.filter(_._2 == 1L).map(_._3).sum.toDouble
      val ycg = gte.filter(_._2 == 0L).map(_._3).sum.toDouble
      val q = if (ncg > 0) ytg - ycg * ntg / ncg else ytg
      at.length.toDouble / rows.length * q
    }.sum
    assert(nt == ntt && nc == nct.toLong)
    assert(math.abs(uplift - (ytt - yct.toDouble * ntt / nct)) < 1e-4)
    assert(math.abs(area - expArea) < 1e-4)
  }

  test("an_cochran_q matches the driver formula on participation flags") {
    val (nUsers, kPresent, sg, sl, q) = SparkEntry.queries("an_cochran_q")(spark, sfDir)
      .select("n_users", "k_present", "sg", "sl", "cochran_q")
      .as[(Long, Long, Long, Long, Double)].collect().head
    val types = Set("click", "view", "purchase", "signup", "error")
    val flags = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).as[(Long, String)].collect()
      .filter(r => types(r._2)).distinct
    val li = flags.groupBy(_._1).map(_._2.size.toLong)
    val g = flags.groupBy(_._2).map(_._2.size.toLong)
    val k = 5L
    val denom = k * li.sum - li.map(x => x * x).sum
    val expQ = if (denom > 0)
      ((k - 1) * (k * g.map(x => x * x).sum - g.sum * g.sum)).toDouble / denom
    else 0.0
    assert(nUsers == li.size.toLong && kPresent == g.size.toLong)
    assert(sg == g.sum && sl == li.sum)
    assert(math.abs(q - expQ) < 1e-6)
    assert(q >= 0.0)
  }

  test("q_interval_relations census is exhaustive and driver-exact") {
    val got = SparkEntry.queries("q_interval_relations")(spark, sfDir)
      .select("relation", "n_pairs").as[(String, Long)].collect().toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")))
      .as[(Long, String, Long)].collect()
    val w = 1800L * 1000000L
    val clicks = ev.filter(_._2 == "click").map(r => (r._1, r._3, r._3 + w))
    val views = ev.filter(_._2 == "view").map(r => (r._1, r._3, r._3 + w))
    def rel(a: (Long, Long, Long), b: (Long, Long, Long)): String = {
      val (_, ast, aen) = a; val (_, bst, ben) = b
      if (aen < bst || ben < ast) "before"
      else if (aen == bst || ben == ast) "meets"
      else if (ast == bst && aen == ben) "equals"
      else if ((ast < bst && aen > ben) || (bst < ast && ben > aen)) "contains"
      else if (ast == bst || aen == ben) "aligns"
      else "overlaps"
    }
    val expected = (for {
      c <- clicks; v <- views if c._1 == v._1
    } yield rel(c, v)).groupBy(identity).map { case (k2, g) => (k2, g.size.toLong) }
    assert(got == expected)
    assert(got.values.sum == expected.values.sum && got.values.sum > 0)
  }
}

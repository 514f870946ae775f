package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-11 graph metrics: each recomputed in
  * the driver from raw edges at sf0.001 (the oracle hash-checks exact
  * values at sf0.01; these pin what those values MEAN). */
class GraphMetricsSpec extends SparkSpec {
  import spark.implicits._

  /** Hub-capped supplier co-purchase edge set, driver-side. */
  private lazy val edges: Set[(Long, Long)] = {
    val sp = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect()
    val byPart = sp.groupBy(_._2).filter(_._2.length <= 20)
    byPart.values.flatMap { g =>
      val sks = g.map(_._1).distinct.sorted
      for (i <- sks.indices; j <- i + 1 until sks.length) yield (sks(i), sks(j))
    }.toSet
  }

  test("q_clustering_coeff matches driver brute-force adjacency") {
    val got = SparkEntry.queries("q_clustering_coeff")(spark, sfDir)
      .select("supp", "degree", "n_tri", "local_cc")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty && got.length <= 20)
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    edges.foreach { case (u, v) => adj(u) += v; adj(v) += u }
    got.foreach { case (x, d, t, cc) =>
      val nb = adj(x)
      assert(nb.size.toLong == d && d >= 3)
      val tri = nb.toSeq.map(y => (adj(y) & nb).size).sum / 2
      assert(tri.toLong == t, s"node $x: expected $tri triangles, got $t")
      assert(math.abs(cc - 2.0 * tri / (d * (d - 1)).toDouble) < 1e-12)
    }
    // top-20 really is the top: every returned cc >= any non-returned cc
    val allCc = adj.collect { case (x, nb) if nb.size >= 3 =>
      val tri = nb.toSeq.map(y => (adj(y) & nb).size).sum / 2
      2.0 * tri / (nb.size * (nb.size - 1)).toDouble
    }
    if (allCc.size > got.length) {
      val kth = got.map(_._4).min
      assert(allCc.toSeq.sorted.reverse.drop(got.length).forall(_ <= kth + 1e-12))
    }
  }

  test("q_modularity equals the driver Newman sum and is in [-1, 1]") {
    val (nComms, nEdges, q) = SparkEntry.queries("q_modularity")(spark, sfDir)
      .select("n_comms", "n_edges", "modularity").as[(Long, Long, Double)].head()
    val nat = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey").cast("long"))
      .as[(Long, Long)].collect().toMap
    val m = edges.size.toLong
    val eIn = edges.toSeq.groupBy { case (u, v) => (nat(u), nat(v)) }
    val byComm = edges.toSeq.flatMap { case (u, v) => Seq(nat(u), nat(v)) }
      .groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val inEdges = edges.toSeq.filter { case (u, v) => nat(u) == nat(v) }
      .groupBy { case (u, _) => nat(u) }.map { case (k, g) => (k, g.size.toLong) }
    val expQ = byComm.map { case (c, dC) =>
      inEdges.getOrElse(c, 0L).toDouble / m -
        math.pow(dC.toDouble / (2.0 * m), 2)
    }.sum
    assert(nEdges == m && nComms == byComm.size.toLong)
    assert(math.abs(q - expQ) < 1e-5)
    assert(q >= -1.0 && q <= 1.0)
  }

  test("q_hits matches a driver integer-rescale iteration") {
    val got = SparkEntry.queries("q_hits")(spark, sfDir)
      .select("role", "node", "score").as[(String, Long, Long)].collect()
    val e = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
      .distinct().as[(Long, Long)].collect()
    def rescale(m: Map[Long, Long]): Map[Long, Long] = {
      val mx = m.values.max
      m.map { case (k, v) => (k, v * 1000000L / mx) }
    }
    val a1 = rescale(e.groupBy(_._2).map { case (p, g) => (p, g.size.toLong * 1000000L) })
    val h1 = rescale(e.groupBy(_._1).map { case (c, g) =>
      (c, g.map(x => a1(x._2)).sum)
    })
    val a2 = rescale(e.groupBy(_._2).map { case (p, g) =>
      (p, g.map(x => h1(x._1)).sum)
    })
    val h2 = rescale(e.groupBy(_._1).map { case (c, g) =>
      (c, g.map(x => a2(x._2)).sum)
    })
    val expA = a2.toSeq.sortBy { case (p, a) => (-a, p) }.take(10)
    val expH = h2.toSeq.sortBy { case (c, h) => (-h, c) }.take(10)
    assert(got.filter(_._1 == "authority").map(r => (r._2, r._3)).toSet == expA.toSet)
    assert(got.filter(_._1 == "hub").map(r => (r._2, r._3)).toSet == expH.toSet)
    assert(got.forall(_._3 <= 1000000L) && got.exists(_._3 == 1000000L))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Sampling, SkewJoin}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def t(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("AsOf.joinPrior picks the latest right row at-or-before each left ts") {
    val clicks = Seq((1L, 7L, t(10)), (2L, 7L, t(30)), (3L, 8L, t(5)))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq((100L, 7L, t(0)), (101L, 7L, t(30)), (102L, 9L, t(0)))
      .toDF("purchase_id", "user_id", "pts")
    val got = AsOf.joinPrior(clicks, purchases, Seq("user_id"), "ts", "pts",
        Seq("purchase_id", "pts"))
      .select("event_id", "asof_purchase_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(got(1L).contains(100L)) // only t(0) purchase is prior
    assert(got(2L).contains(101L)) // boundary-inclusive: same-ts purchase wins
    assert(got(3L).isEmpty)        // user 8 never purchased
  }

  test("AsOf.joinNearest picks the closer side, ties to prior, respects tolerance") {
    val clicks = Seq((1L, 7L, t(10)), (2L, 7L, t(100)), (3L, 8L, t(50)))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq((100L, 7L, t(6)), (101L, 7L, t(12)), (102L, 8L, t(50)))
      .toDF("purchase_id", "user_id", "pts")
    val got = AsOf.joinNearest(clicks, purchases, Seq("user_id"), "ts", "pts",
        Seq("purchase_id"), toleranceUs = 10L * 60 * 1000000)
      .select("event_id", "asof_purchase_id", "asof_delta_us")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map { case (k, v, d) => k -> (v, d) }.toMap
    // click 1 at t10: prior t6 (d=4min) vs next t12 (d=2min) -> next wins
    assert(got(1L) == (Some(101L), Some(-2L * 60 * 1000000)))
    // click 2 at t100: nearest purchase t12 is 88min away, over tolerance
    assert(got(2L) == (None, None))
    // click 3 at t50: equal-ts purchase -> prior side, delta 0
    assert(got(3L) == (Some(102L), Some(0L)))
  }

  test("AsOf carries ALL columns from the same right row when one is NULL") {
    // round-1 advice scenario: a later right row with a NULL carry
    // column must not inherit that column from an earlier right row
    val clicks = Seq((1L, 7L, t(60))).toDF("event_id", "user_id", "ts")
    val quotes = Seq(
      (Some(100L), Some(10.0), 7L, t(10)),  // older row: both fields set
      (Some(101L), None: Option[Double], 7L, t(50))) // latest row: price NULL
      .toDF("quote_id", "price", "user_id", "qts")
    val got = AsOf.joinPrior(clicks, quotes, Seq("user_id"), "ts", "qts",
        Seq("quote_id", "price"))
      .select("asof_quote_id", "asof_price")
      .as[(Option[Long], Option[Double])].head()
    assert(got._1.contains(101L))
    assert(got._2.isEmpty, "price must be the latest row's NULL, not 10.0 from the older row")
  }

  test("joinPriorBucketed equals joinPrior and plans zero Exchange on bucketed tables") {
    import graft.etl.Load
    // semantics first, on plain frames: same scenarios as the
    // joinPrior specs (boundary-inclusive, never-purchased → NULL)
    val clicks = Seq((1L, 7L, t(10)), (2L, 7L, t(30)), (3L, 8L, t(5)))
      .toDF("event_id", "user_id", "ts")
    val purchases = Seq((100L, 7L, t(0)), (101L, 7L, t(30)), (102L, 9L, t(0)))
      .toDF("purchase_id", "user_id", "pts")
    val viaWindow = AsOf.joinPrior(clicks, purchases, Seq("user_id"), "ts", "pts",
        Seq("purchase_id", "pts"))
      .select("event_id", "asof_purchase_id").as[(Long, Option[Long])].collect().toMap
    val viaBucketPlan = AsOf.joinPriorBucketed(clicks, purchases, Seq("user_id"), "ts", "pts",
        Seq("purchase_id", "pts"))
      .select("event_id", "asof_purchase_id").as[(Long, Option[Long])].collect().toMap
    assert(viaWindow == viaBucketPlan)

    // layout payoff: both sides bucketed on the key by the same count →
    // the WHOLE as-of join (fold + join) must plan without any Exchange
    Seq("b_asof_left", "b_asof_right").foreach { tb =>
      spark.sql(s"DROP TABLE IF EXISTS $tb")
      val dir = new java.io.File(s"spark-warehouse/$tb")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      if (dir.exists()) rm(dir)
    }
    val ev = Tables.events(spark, sfDir)
    Load.BucketedTableSink("b_asof_left", "user_id", 8)
      .write(ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts"))
    Load.BucketedTableSink("b_asof_right", "user_id", 8)
      .write(ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts")))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = AsOf.joinPriorBucketed(
        spark.table("b_asof_left"), spark.table("b_asof_right"),
        Seq("user_id"), "ts", "pts", Seq("purchase_id"))
      val p = joined.queryExecution.executedPlan.toString()
      assert(!p.contains("Exchange"), s"bucketed as-of join should not shuffle:\n$p")
      // and it must agree with the window formulation on real data
      val a = joined.select("event_id", "asof_purchase_id")
        .as[(Long, Option[Long])].collect().toMap
      val b = AsOf.joinPrior(
          spark.table("b_asof_left"), spark.table("b_asof_right"),
          Seq("user_id"), "ts", "pts", Seq("purchase_id"))
        .select("event_id", "asof_purchase_id")
        .as[(Long, Option[Long])].collect().toMap
      assert(a == b)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("salted join equals the plain join") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(ord, "l_orderkey").count()
    val salted = SkewJoin.saltedInner(li, ord, "l_orderkey", salts = 8).count()
    assert(plain == salted)
  }

  test("hash sample is deterministic and near the target rate") {
    val ord = Tables.orders(spark, sfDir)
    val n = ord.count().toDouble
    val s1 = Sampling.hashSample(ord, col("o_orderkey"), 4)
    val s2 = Sampling.hashSample(ord, col("o_orderkey"), 4)
    assert(s1.count() == s2.count())
    val rate = s1.count() / n
    assert(rate > 0.15 && rate < 0.35) // target 25%
    assert(Sampling.hashSample(ord, col("o_orderkey"), 16).count() == n.toLong)
    assert(Sampling.hashSample(ord, col("o_orderkey"), 0).count() == 0L)
  }

  test("TopKAggregate keeps the best k with deterministic tie-break") {
    val agg = new graft.functions.TopKAggregate(3)
    val items = Seq((5.0, 10L), (5.0, 2L), (7.0, 9L), (1.0, 1L), (7.0, 3L))
    val merged = items.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    // split-merge must agree with sequential reduce
    val (l, r) = items.splitAt(2)
    val m2 = agg.merge(
      l.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)),
      r.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
    assert(agg.finish(merged) == agg.finish(m2))
    assert(agg.finish(merged) == Seq((7.0, 3L), (7.0, 9L), (5.0, 2L)))
  }

  test("TopKAggregate keeps one slot per id: a recurring id never shrinks the sample") {
    val agg = new graft.functions.TopKAggregate(3)
    // id 9 recurs (identical priority — the streaming A-Res shape where
    // priority is a pure function of the id) and id 2 recurs with a
    // worse score: neither may occupy two of the three slots
    val items = Seq((7.0, 9L), (5.0, 2L), (7.0, 9L), (3.0, 2L), (4.0, 4L), (1.0, 1L))
    val seqR = agg.finish(items.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
    assert(seqR == Seq((7.0, 9L), (5.0, 2L), (4.0, 4L)))
    // merging a buffer with ITSELF (the at-least-once retry shape) is a no-op
    val buf = items.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
    assert(agg.finish(agg.merge(buf, buf)) == seqR)
    // split-merge with the duplicate straddling the split agrees too
    val (l, r) = items.splitAt(2)
    val m2 = agg.merge(
      l.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)),
      r.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)))
    assert(agg.finish(m2) == seqR)
  }

  test("A-Res weighted sample: deterministic, weight-respecting, partition-invariant") {
    import spark.implicits._
    // 1000 unit-weight rows + one row carrying half the total mass:
    // u^(1/w) with w = 1000 is ≈ 1 for any u ≥ tiny, so the heavy row
    // must survive any top-100 cut
    val rows = ((1L to 1000L).map(i => (i, 1.0)) :+ (5000L, 1000.0)).toDF("id", "w")
    val got = Sampling.weightedSample(rows, col("id"), col("w"), 100)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got.length == 100)
    assert(got.contains(5000L), "the dominant-weight row must be sampled")
    // partition-invariance: a different layout yields the same sample
    val again = Sampling.weightedSample(rows.repartition(17), col("id"), col("w"), 100)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == again)
    // uniform weights degrade to the hash top-k: replaying the priority
    // math locally must pick the same ids
    val uni = (1L to 500L).toDF("id").withColumn("w", lit(1.0))
    val sample = Sampling.weightedSample(uni, col("id"), col("w"), 50)
      .select("id").as[Long].collect().toSet
    val hashes = uni.select(col("id"),
        graft.functions.Sketches.temperedHash(col("id")).as("h"))
      .as[(Long, Long)].collect()
    val expect = hashes.sortBy { case (id, h) => (-h, id) }.take(50).map(_._1).toSet
    assert(sample == expect, "w=1 sample must be the top-k by hash")
  }

  test("stratified sample takes exactly min(n, group size) per group, deterministically") {
    val ord = Tables.orders(spark, sfDir)
    val got = Sampling.stratified(ord, col("o_orderpriority"), col("o_orderkey"), 50)
    val sizes = got.groupBy("o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    val full = ord.groupBy("o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    full.foreach { case (g, n) => assert(sizes(g) == math.min(50L, n)) }
    val again = Sampling.stratified(ord, col("o_orderpriority"), col("o_orderkey"), 50)
    assert(got.select("o_orderkey").as[Long].collect().sorted.toSeq ==
      again.select("o_orderkey").as[Long].collect().sorted.toSeq)
  }

  test("bloom-pruned semi-join equals the plain semi-join exactly") {
    val ord = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val plain = ord.join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    val pruned = graft.operators.BloomPrune.semiJoin(ord, "o_custkey", cust, "c_custkey")
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(pruned == plain)
    // no false negatives: every build key passes the sketch
    val bf = graft.operators.BloomPrune.bloomOf(cust, "c_custkey", 10000L, 0.01)
    val misses = cust.filter(!graft.operators.BloomPrune.mightContain(col("c_custkey"), bf))
      .count()
    assert(misses == 0)
  }

  test("skewReport flags a whale key and saltedInnerAuto still equals plain join") {
    val uniform = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val rUni = SkewJoin.skewReport(uniform, "o_orderkey")
    assert(rUni.suggestedSalts == 1) // unique key: no salting suggested
    // build a whale: half the rows share one key
    val whale = uniform.withColumn("k",
      when(col("o_orderkey") % 2 === 0, lit(0L)).otherwise(col("o_orderkey")))
    val rWhale = SkewJoin.skewReport(whale, "k")
    assert(rWhale.skewRatio > 4.0 && rWhale.suggestedSalts > 1)
    val dim = whale.select(col("k")).distinct().withColumn("tag", col("k") * 2)
    val plain = whale.join(dim, Seq("k")).count()
    val auto = SkewJoin.saltedInnerAuto(whale, dim, "k").count()
    assert(plain == auto)
  }

  test("graft SQL functions registered via extensions work from spark.sql") {
    val r = spark.sql(
      """SELECT simhash64(array(1L, 2L, 3L)) AS sh,
        |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        |  word_shingles('a b c d', 2) AS ws,
        |  sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS ic
        |""".stripMargin).head()
    assert(r.getDouble(1) == 11.0)
    assert(r.getSeq[String](2) == Seq("a b", "b c", "c d"))
    assert(r.getInt(3) == 2)
  }

  test("approx stats land within tolerance of exact values") {
    val ord = Tables.orders(spark, sfDir)
    val row = SparkEntry.approxStatsRaw(spark, sfDir).head()
    val exactCust = ord.select(count_distinct(col("o_custkey"))).as[Long].head()
    val exactMed = ord.select(percentile(col("o_totalprice"), lit(0.5))).as[Double].head()
    assert(math.abs(row.getLong(0) - exactCust) <= 0.05 * exactCust)
    assert(math.abs(row.getDouble(1) - exactMed) <= 0.05 * exactMed)
    // the certified [q] frame must assert its own envelope TRUE (the
    // oracle hash-compares these booleans against literal true)
    val cert = SparkEntry.queries("an_approx_stats")(spark, sfDir).head()
    assert(cert.getAs[Boolean]("distinct_in_bound"))
    assert(cert.getAs[Boolean]("median_rank_in_bound"))
  }

  test("triangle census matches a driver-side adjacency-set count") {
    val sp = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect()
    val byPart = sp.groupBy(_._2).filter(_._2.length <= 20)
    val edges = byPart.values.flatMap { rows =>
      val sks = rows.map(_._1).distinct.sorted
      for (i <- sks.indices; j <- i + 1 until sks.length) yield (sks(i), sks(j))
    }.toSet
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val wantTri = edges.toSeq.map { case (u, v) =>
      (adj.getOrElse(u, Set.empty) & adj.getOrElse(v, Set.empty)).size.toLong
    }.sum
    val degs = (edges.toSeq.map(_._1) ++ edges.toSeq.map(_._2))
      .groupBy(identity).values.map(_.length.toLong)
    val wantWedges = degs.map(d => d * (d - 1) / 2).sum
    val row = SparkEntry.queries("q_triangles")(spark, sfDir).head()
    assert(row.getAs[Long]("n_edges") == edges.size.toLong)
    assert(row.getAs[Long]("n_triangles") == wantTri)
    assert(row.getAs[Long]("n_wedges") == wantWedges)
    val cc = row.getAs[Double]("global_cc")
    assert(cc >= 0.0 && cc <= 1.0, s"clustering coefficient out of range: $cc")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------- Count-Min

  test("CMS estimates dominate exact counts and are tight at low load") {
    // 50 keys, key k appearing k times → 1275 increments into 3×1024
    // cells: collisions are rare, most estimates should be exact
    val rows = (1 to 50).flatMap(k => Seq.fill(k)(k)).toDF("k")
    val cells = Sketches.cmsCells(rows, col("k"), 1024)
    val probes = (1 to 50).toDF("k")
    val est = Sketches.cmsEstimate(cells, probes, col("k"), 1024)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 50).foreach { k =>
      assert(est(k.toLong) >= k, s"CMS must never under-count: key $k est ${est(k.toLong)}")
    }
    val exactHits = (1 to 50).count(k => est(k.toLong) == k)
    assert(exactHits >= 45, s"width 1024 at load 1275 should be near-exact, got $exactHits/50")
  }

  test("CMS unseen keys estimate 0 unless a bucket collides") {
    val rows = Seq(1, 2, 3).toDF("k")
    val cells = Sketches.cmsCells(rows, col("k"), 1024)
    val est = Sketches.cmsEstimate(cells, Seq(900001, 900002).toDF("k"), col("k"), 1024)
      .collect().map(_.getLong(1))
    est.foreach(e => assert(e <= 3, "unseen key estimate bounded by total mass"))
  }

  test("CMS cell counts conserve total mass per depth") {
    val n = 5000
    val rows = spark.range(n).select((col("id") % 137).as("k"))
    val perDepth = Sketches.cmsCells(rows, col("k"), 256)
      .groupBy("d").agg(sum("c").as("mass")).collect()
    assert(perDepth.length == 3)
    perDepth.foreach(r => assert(r.getLong(1) == n, s"depth ${r.get(0)} lost mass"))
  }

  test("CMS cells merge by cellwise sum (sketch of union = sum of sketches)") {
    val a = (1 to 400).map(i => (i % 53).toLong).toDF("k")
    val b = (1 to 300).map(i => (i % 31).toLong).toDF("k")
    val direct = Sketches.cmsCells(a.unionByName(b), col("k"), 256)
      .as[(Int, Long, Long)].collect().toSet
    val merged = Sketches.cmsCells(a, col("k"), 256)
      .unionByName(Sketches.cmsCells(b, col("k"), 256))
      .groupBy("d", "bucket").agg(sum("c").as("c"))
      .as[(Int, Long, Long)].collect().toSet
    assert(direct == merged)
  }

  // -------------------------------------------------------- HyperLogLog

  test("HLL estimate lands within 3 standard errors of true cardinality") {
    val m = 64
    val se = 1.04 / math.sqrt(m) // ~13%
    for (trueN <- Seq(500, 2000, 10000)) {
      val rows = spark.range(trueN).select((col("id") * 2654435761L).as("k"))
      val regs = Sketches.hllRegisters(rows, col("k"), m)
      assert(regs.count() == m, "spine must materialize every register")
      val z = regs.agg(Sketches.hllZScaled(m)).select(
        Sketches.hllEstimate(m, col("z_scaled"))).as[Long].head()
      val relErr = math.abs(z.toDouble - trueN) / trueN
      assert(relErr < 3 * se, s"n=$trueN est=$z relErr=$relErr")
    }
  }

  test("HLL register tables merge by element-wise max (union semantics)") {
    val m = 64
    val left = spark.range(0, 3000).select(col("id").as("k"))
    val right = spark.range(2000, 6000).select(col("id").as("k"))
    val both = left.unionByName(right)
    val merged = Sketches.hllRegisters(left, col("k"), m)
      .unionByName(Sketches.hllRegisters(right, col("k"), m))
      .groupBy("register").agg(max("rho").as("rho"))
    val direct = Sketches.hllRegisters(both, col("k"), m)
    assert(merged.except(direct).count() == 0 && direct.except(merged).count() == 0,
      "sketch of union must equal merge of sketches")
  }

  test("HLL set estimates: union via register max, intersection by inclusion-exclusion") {
    val m = 1024
    // |A| = 6000, |B| = 5000, |A∩B| = 3000
    val a = spark.range(0, 6000).select(col("id").as("k"))
    val b = spark.range(3000, 8000).select(col("id").as("k"))
    val regsA = Sketches.hllRegisters(a, col("k"), m)
    val regsB = Sketches.hllRegisters(b, col("k"), m)
    val r = Sketches.hllSetEstimates(regsA, regsB, m).collect().head
    val (estA, estB, estU, estI) =
      (r.getAs[Long]("est_a"), r.getAs[Long]("est_b"),
        r.getAs[Long]("est_union"), r.getAs[Long]("est_intersect"))
    info(s"A=$estA (6000) B=$estB (5000) U=$estU (8000) I=$estI (3000)")
    assert(math.abs(estU - 8000.0) / 8000 < 0.15, s"union est $estU")
    // inclusion-exclusion compounds three errors — triage-grade bound
    assert(math.abs(estI - 3000.0) / 3000 < 0.35, s"intersect est $estI")
  }

  test("CMS cells over a stream equal the batch sketch on the same data") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val data = (1 to 500).map(i => (i % 37).toLong)
    val in = MemoryStream[Long]
    in.addData(data.take(250): _*)
    val q = Sketches.cmsCells(in.toDF().toDF("k"), col("k"), 256)
      .writeStream.outputMode("complete").format("memory").queryName("cmsstream").start()
    q.processAllAvailable()
    in.addData(data.drop(250): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("cmsstream")
      .as[(Int, Long, Long)].collect().toSet
    val batch = Sketches.cmsCells(data.toDF("k"), col("k"), 256)
      .as[(Int, Long, Long)].collect().toSet
    assert(streamed == batch, "incremental sketch must equal the batch sketch")
  }

  test("HLL hits over a stream equal the batch aggregation on the same data") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val data = (1L to 4000L)
    val in = MemoryStream[Long]
    in.addData(data.take(1500): _*)
    val q = Sketches.hllHits(in.toDF().toDF("k"), col("k"), 64)
      .writeStream.outputMode("complete").format("memory").queryName("hllstream").start()
    q.processAllAvailable()
    in.addData(data.drop(1500): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("hllstream").as[(Long, Int)].collect().toSet
    val batch = Sketches.hllHits(data.toDF("k"), col("k"), 64).as[(Long, Int)].collect().toSet
    assert(streamed == batch, "incremental max-rho state must equal the batch sketch")
  }

  test("tail-quantile state over a stream equals the batch state on the same data") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // order-independent sorted-multiset truncation: the incremental
    // state (old buffer merged with each micro-batch) must land on the
    // SAME (n, lo, hi) as the one-shot batch aggregation
    val data = (1 to 3000).map(i => ((i * 7919) % 3001).toDouble)
    val agg = new graft.functions.TailQuantiles(32)
    val in = MemoryStream[Double]
    in.addData(data.take(1200): _*)
    val q = in.toDS().groupByKey(_ => 0).agg(agg.toColumn.name("st"))
      .writeStream.outputMode("complete").format("memory").queryName("tqstream").start()
    q.processAllAvailable()
    in.addData(data.drop(1200): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tqstream")
      .select("st._1", "st._2", "st._3").as[(Long, Seq[Double], Seq[Double])].collect().head
    val batch = spark.createDataset(data).groupByKey(_ => 0).agg(agg.toColumn.name("st"))
      .select("st._1", "st._2", "st._3").as[(Long, Seq[Double], Seq[Double])].collect().head
    assert(streamed == batch, "incremental tail state must equal the batch state")
  }

  test("KLL summary over a stream equals the batch sketch in the exact regime") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.{KllSketch, KllSummary}
    // n <= k: no compaction fires, so the flattened summary is the full
    // sorted multiset with weight 1 and errBound 0 — stream and batch
    // must agree bit-for-bit, and every rank probe is an exact count
    val kll = udaf(new KllSketch(256))
    val data = (1 to 200).map(i => ((i * 37) % 211).toDouble)
    val in = MemoryStream[Double]
    in.addData(data.take(90): _*)
    val q = in.toDF().toDF("v").groupBy().agg(kll(col("v")).as("sk"))
      .writeStream.outputMode("complete").format("memory").queryName("kllstream").start()
    q.processAllAvailable()
    in.addData(data.drop(90): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("kllstream").select("sk.*").as[KllSummary].collect().head
    val batch = data.toDF("v").groupBy().agg(kll(col("v")).as("sk"))
      .select("sk.*").as[KllSummary].collect().head
    assert(streamed == batch, "incremental KLL state must equal the batch sketch")
    assert(streamed.errBound == 0L && streamed.n == data.size)
    Seq(0.0, 50.0, 105.0, 211.0).foreach { x =>
      assert(KllSketch.rank(streamed, x) == data.count(_ <= x).toLong)
    }
  }

  test("t-digest over a stream lands inside the batch rank-error envelope") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.{Centroid, TDigest}
    // t-digest state is split-dependent, so stream ≠ batch bit-for-bit
    // (unlike TailQuantiles/KLL-exact above); the contract is the
    // ENVELOPE: streamed estimates carry the same ≤2% rank error
    val td = udaf(new TDigest(100))
    val data = (1 to 6000).map(i => ((i * 7919) % 6001).toDouble)
    val sorted = data.sorted
    val in = MemoryStream[Double]
    in.addData(data.take(2500): _*)
    val q = in.toDF().toDF("v").groupBy().agg(td(col("v")).as("cs"))
      .writeStream.outputMode("complete").format("memory").queryName("tdstream").start()
    q.processAllAvailable()
    in.addData(data.drop(2500): _*)
    q.processAllAvailable()
    q.stop()
    val cs = spark.table("tdstream").as[Seq[Centroid]].collect().head
    assert(cs.map(_.weight).sum == data.size.toLong)
    Seq(0.1, 0.5, 0.9).foreach { p =>
      val est = TDigest.quantile(cs, p)
      val rank = sorted.count(_ <= est).toDouble / data.size
      assert(math.abs(rank - p) <= 0.02, s"p=$p streamed rank $rank")
    }
  }

  // -------------------------------------------------------- KMV / theta

  import graft.functions.KmvSketch

  private def kmvOf(data: Seq[Long], k: Int, parts: Int): Seq[Long] = {
    import org.apache.spark.sql.functions.col
    spark.createDataset(data).repartition(parts)
      .select(graft.functions.Sketches.temperedHash(col("value")).as("h")).as[Long]
      .select(new KmvSketch[Long](k, identity).toColumn)
      .head()
  }

  test("KMV sample is partition-invariant and merges to the union sketch") {
    val a = (1L to 3000L)
    val b = (2000L to 5000L)
    val k = 128
    assert(kmvOf(a, k, 1) == kmvOf(a, k, 17), "k-min of a set is partition-invariant")
    val merged = KmvSketch.union(Seq(kmvOf(a, k, 5), kmvOf(b, k, 5)), k)
    assert(merged == kmvOf(a ++ b, k, 5), "merge of sketches = sketch of union")
  }

  test("KMV estimate: exact under k distinct, within 3 standard errors above") {
    val k = 256
    val small = kmvOf((1L to 100L), k, 4)
    assert(KmvSketch.estimate(small, k) == 100L, "n < k is the exact regime")
    for (n <- Seq(5000, 20000)) {
      val est = KmvSketch.estimate(kmvOf((1L to n.toLong), k, 8), k)
      val se = 1.0 / math.sqrt(k - 2)
      val relErr = math.abs(est.toDouble - n) / n
      assert(relErr < 3 * se, s"n=$n est=$est relErr=$relErr")
    }
  }

  test("theta intersection estimates overlap without inclusion-exclusion") {
    val k = 256
    // |A| = 6000, |B| = 5000, |A∩B| = 3000 — same shape as the HLL case
    val a = kmvOf((1L to 6000L), k, 8)
    val b = kmvOf((3001L to 8000L), k, 8)
    val est = KmvSketch.thetaIntersect(a, b, k)
    info(s"theta intersect est=$est (true 3000)")
    assert(math.abs(est - 3000.0) / 3000 < 0.3, s"est $est")
    // complete-sample regime: intersection is exact
    val sa = kmvOf((1L to 150L), k, 4)
    val sb = kmvOf((100L to 250L), k, 4)
    assert(KmvSketch.thetaIntersect(sa, sb, k) == 51L)
  }

  // ------------------------------------------------------------- KLL

  import graft.functions.{KllSketch, KllSummary}

  private def kllOf(vals: Seq[Double], k: Int, parts: Int): KllSummary =
    spark.createDataset(vals).repartition(parts)
      .select(new KllSketch(k).toColumn).head()

  test("KLL exact regime: no compaction, errBound 0, every rank exact") {
    // permutation of 0..799 so insertion order ≠ value order
    val vals = Seq.tabulate(800)(i => ((i * 37) % 800).toDouble)
    val s = kllOf(vals, 1024, 8)
    assert(s.n == 800 && s.errBound == 0)
    assert(s.items.map(_.weight).sum == 800, "weight conservation")
    for (x <- Seq(-1.0, 0.0, 100.5, 400.0, 799.0, 1000.0)) {
      val trueRank = vals.count(_ <= x).toLong
      assert(KllSketch.rank(s, x) == trueRank, s"rank($x)")
    }
  }

  test("KLL compaction regime: ranks within the self-certified bound, bound sub-linear") {
    val n = 20000
    val k = 256
    val rnd = new scala.util.Random(42)
    val vals = rnd.shuffle((0 until n).toVector).map(_.toDouble)
    val s = kllOf(vals, k, 16)
    assert(s.n == n, "n is exact through compaction and merge")
    assert(s.items.map(_.weight).sum == n, "compaction preserves total weight")
    assert(s.errBound > 0, "k=256 over 20k values must compact")
    // deterministic equal-capacity bound ≈ (n/k)·log2(n/k) ≈ 500; merge
    // re-compactions widen it — n/8 is the sub-linear sanity ceiling
    assert(s.errBound <= n / 8, s"errBound ${s.errBound} not sub-linear")
    var worst = 0L
    for (x <- 0 until n by 97) {
      val err = math.abs(KllSketch.rank(s, x.toDouble) - (x + 1L))
      assert(err <= s.errBound, s"rank($x) err $err > certified ${s.errBound}")
      worst = math.max(worst, err)
    }
    info(s"n=$n k=$k errBound=${s.errBound} worstObserved=$worst")
  }

  test("KLL quantiles are monotone and land within errBound + max weight of p·n") {
    val n = 10000
    val vals = new scala.util.Random(7).shuffle((0 until n).toVector).map(_.toDouble)
    val s = kllOf(vals, 128, 8)
    val ps = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val qs = ps.map(p => KllSketch.quantile(s, p))
    assert(qs == qs.sorted, "quantiles must be monotone in p")
    val maxW = s.items.map(_.weight).max
    for ((p, q) <- ps.zip(qs)) {
      // values ARE ranks here (0..n-1 → true_rank(q) = q+1)
      val trueRank = q + 1
      assert(math.abs(trueRank - p * n) <= s.errBound + maxW,
        s"q($p)=$q trueRank=$trueRank target=${p * n} bound=${s.errBound + maxW}")
    }
  }

  test("KLL merge is order-insensitive in its guarantee (many small merges)") {
    // aggregate the same data under very different partitionings; the
    // certified bound must hold for each resulting sketch
    val n = 5000
    val vals = Seq.tabulate(n)(i => ((i * 131) % n).toDouble)
    for (parts <- Seq(1, 3, 32)) {
      val s = kllOf(vals, 64, parts)
      assert(s.n == n)
      for (x <- 0 until n by 499) {
        val err = math.abs(KllSketch.rank(s, x.toDouble) - (x + 1L))
        assert(err <= s.errBound, s"parts=$parts rank($x) err $err > ${s.errBound}")
      }
    }
  }

  test("KLL state maintains incrementally in a streaming aggregation") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.Row
    val n = 4000
    val vals = new scala.util.Random(3).shuffle((0 until n).toVector).map(_.toDouble)
    val in = MemoryStream[Double]
    in.addData(vals.take(1500): _*)
    val q = in.toDF().toDF("v")
      .agg(udaf(new KllSketch(64)).apply(col("v")).as("sk"))
      .writeStream.outputMode("complete").format("memory").queryName("kllstream").start()
    q.processAllAvailable()
    in.addData(vals.drop(1500): _*)
    q.processAllAvailable()
    q.stop()
    // the sketch buffer IS the streaming state; the certified-bound
    // invariant must survive however the micro-batches merged into it
    val row = spark.table("kllstream").select("sk.*").head()
    val items = row.getAs[scala.collection.Seq[Row]]("items")
      .map(r => (r.getAs[Double]("value"), r.getAs[Long]("weight")))
    assert(row.getAs[Long]("n") == n, "n is exact across micro-batches")
    assert(items.map(_._2).sum == n, "weight conservation across micro-batches")
    val err = row.getAs[Long]("errBound")
    for (x <- 0 until n by 331) {
      val est = items.filter(_._1 <= x).map(_._2).sum
      assert(math.abs(est - (x + 1L)) <= err, s"rank($x) outside certified bound $err")
    }
  }

  test("KMV/theta sample maintains incrementally in a streaming aggregation") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.{KmvSketch, Sketches}
    val k = 64
    val keys = new scala.util.Random(7).shuffle(
      (1L to 3000L).flatMap(x => Seq(x, x)).toVector) // dups: sketch must distinct
    def sketched(df: org.apache.spark.sql.DataFrame) = {
      import spark.implicits._
      df.select(Sketches.temperedHash(col("value")).as("h")).as[Long]
        .select(udaf(new KmvSketch[Long](k, identity)).apply(col("h")).as("sample"))
    }
    val in = MemoryStream[Long]
    in.addData(keys.take(1000): _*)
    val q = sketched(in.toDF())
      .writeStream.outputMode("complete").format("memory").queryName("kmvstream").start()
    q.processAllAvailable()
    in.addData(keys.drop(1000): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("kmvstream")
      .head().getAs[scala.collection.Seq[Long]]("sample")
    import spark.implicits._
    val batch = sketched(keys.toDF("value"))
      .head().getAs[scala.collection.Seq[Long]]("sample")
    // deterministic k-smallest-distinct merge ⇒ stream ≡ batch exactly,
    // however the micro-batches sliced the input
    assert(streamed == batch)
    val est = KmvSketch.estimate(streamed.toVector, k)
    assert(math.abs(est - 3000L) <= 3000L / 2, s"theta estimate $est wildly off")
  }

  test("HLL z_scaled is the exact scaled harmonic sum") {
    val m = 64
    val regs = Sketches.hllRegisters(spark.range(100).toDF("k"), col("k"), m)
    val z = regs.agg(Sketches.hllZScaled(m)).as[Long].head()
    val manual = regs.collect().map(r => (1L << 26) >> r.getInt(1)).sum
    assert(z == manual)
  }
}

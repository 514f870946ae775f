package graft

import org.apache.spark.sql.functions._
import graft.operators.IterativeGraph

/** The round-10 verdict's scale-correctness counterexamples: on a
  * planted graph deeper than the oracle's unroll depth, the fixed-round
  * kernels return WRONG answers (truncated distances, a phantom core,
  * unsettled labels) while the convergence-driven kernels keep
  * iterating to the true fixpoint. The registered [q] queries use the
  * convergence kernels; the fixed-round twins exist only to replay the
  * unrolled-CTE oracle shape and to pin this divergence. */
class IterativeGraphSpec extends SparkSpec {
  import spark.implicits._

  /** Undirected path 0-1-2-...-(n-1) as a directed both-ways edge frame. */
  private def pathEdges(n: Int) = {
    val fwd = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
    (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
  }

  test("bfsDistances: diameter-8 path — 4 fixed rounds truncate, convergence completes") {
    val edges = pathEdges(9) // BFS from 0 needs 8 rounds
    val sources = Seq((0L, 0L)).toDF("node", "dist")
    val fixed = IterativeGraph.bfsDistancesFixed(edges, sources, rounds = 4)
      .as[(Long, Long)].collect().toMap
    val conv = IterativeGraph.bfsDistances(edges, sources, maxRounds = 64)
      .as[(Long, Long)].collect().toMap
    // the fixed-round frontier stops at hop 4: nodes 5..8 are missing
    assert(fixed.keySet == (0L to 4L).toSet)
    // the convergence kernel reaches every node with the exact hop count
    assert(conv == (0L to 8L).map(i => i -> i).toMap)
  }

  test("kcoreAlive: 12-path at k=2 — 4 fixed peels leave a phantom core, convergence empties it") {
    val edges = pathEdges(12)
    // true 2-core of a path is EMPTY (peeling eats one endpoint pair per
    // round, 6 rounds for 12 nodes); 4 rounds still report 4 survivors
    val fixed = IterativeGraph.kcoreAliveFixed(edges, k = 2, rounds = 4)
    assert(fixed.count() == 4)
    val conv = IterativeGraph.kcoreAlive(edges, k = 2, maxRounds = 64)
    assert(conv.count() == 0)
  }

  test("labelPropLabels: 10-path — 3 fixed rounds leave unsettled labels, convergence stabilizes") {
    val edges = pathEdges(10)
    val fixed = IterativeGraph.labelPropLabelsFixed(edges, rounds = 3)
      .as[(Long, Long)].collect().toMap
    val conv = IterativeGraph.labelPropLabels(edges, maxRounds = 64)
      .as[(Long, Long)].collect().toMap
    // convergence output is a genuine fixpoint-or-2-cycle stop: one more
    // sync round maps it to a state already seen (stable or the cycle
    // partner) — while the fixed-round state is still actively moving.
    def round(lbls: Map[Long, Long]): Map[Long, Long] = {
      val adj = (0 until 9).map(i => (i.toLong, (i + 1).toLong))
      val und = adj ++ adj.map(_.swap)
      und.groupBy(_._2).map { case (node, es) =>
        val votes = es.map(e => lbls(e._1)).groupBy(identity)
          .map { case (l, occ) => (l, occ.size) }
        node -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    val fixedNext = round(fixed)
    assert(fixedNext != fixed, "3-round labels should still be moving on a 10-path")
    val convNext = round(conv)
    val convNext2 = round(convNext)
    assert(convNext == conv || convNext2 == conv,
      "convergence stop must be a fixpoint or a period-2 cycle member")
  }

  test("labelPropLabels signals non-convergence on the 299-diameter chain") {
    // the r14 diameter-probe finding made detectable: LP moves
    // information one hop per round, so a 299-diameter chain is still
    // actively relabeling when the cap lands — the onUnconverged hook
    // must fire with a positive mover count (default logs a warning)
    val edges = pathEdges(300)
    var signal = -1L
    IterativeGraph.labelPropLabels(edges, maxRounds = 8,
      onUnconverged = n => signal = n)
    assert(signal > 0,
      s"cap exit on the 299-chain must report moving labels, got $signal")
    // and a graph that DOES settle within the cap stays silent
    signal = -1L
    IterativeGraph.labelPropLabels(pathEdges(4), maxRounds = 32,
      onUnconverged = n => signal = n)
    assert(signal == -1L, "a converged run must not fire the signal")
  }

  test("kcoreWithDeg signals a cap exit while peeling is still active") {
    // k=2 peeling on a path consumes one endpoint pair per round, so a
    // long path capped early is still actively peeling — the emitted
    // core_deg values are then superset-measured upper bounds and the
    // hook must say so (the r15 advice #4 silent-regime close-out)
    val edges = pathEdges(40)
    var signal = -1L
    IterativeGraph.kcoreWithDeg(edges, k = 2, maxRounds = 3,
      onUnconverged = n => signal = n)
    assert(signal > 0,
      s"cap exit mid-peel must report the final round's removals, got $signal")
    // a run that reaches the fixpoint inside the cap stays silent
    signal = -1L
    IterativeGraph.kcoreWithDeg(pathEdges(6), k = 2, maxRounds = 64,
      onUnconverged = n => signal = n)
    assert(signal == -1L, "a converged peel must not fire the signal")
  }

  test("components kernel stays Th(log d): job count barely grows from diameter 29 to 299") {
    // the r14 stretch gate: the diameter probe measured star-contraction
    // at Th(log d) once; this pins it as a regression test. A Th(d)
    // implementation (one hop per round, the labelProp cost shape)
    // would add ~270 rounds of jobs between the two chains and fail.
    def jobsFor(n: Int): Long = {
      val counter = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        graft.dedup.Dedup.connectedComponentsStar(
          pathEdges(n).select(col("src").as("a"), col("dst").as("b")), "a", "b")
          .count()
        // listener events are async; a short settle keeps the count stable
        Thread.sleep(300)
      } finally spark.sparkContext.removeSparkListener(listener)
      counter.get()
    }
    val jobs29 = jobsFor(30)   // diameter 29
    val jobs299 = jobsFor(300) // diameter 299 — 10x deeper
    assert(jobs299 <= jobs29 + 20,
      s"components kernel regressed toward Th(d): $jobs299 jobs at diameter 299 " +
        s"vs $jobs29 at 29 (allowance +20 covers the ~log2(10) extra rounds)")
  }

  test("deep double-reference loops do not compound checkpoint stats (the diam-299 crash)") {
    // regression pin for the r14 DiameterProbe finding: a checkpointed
    // round's LogicalRDD used to copy its origin plan's size ESTIMATE,
    // and k-core references the alive frame on BOTH endpoints per
    // round, SQUARING the estimate — double-exponential BigInt growth
    // that crashed Catalyst sizing ("BigInteger would overflow
    // supported range") near round 30 regardless of data size. A
    // 70-path at k=2 peels for 35 rounds — past the pre-fix crash
    // horizon on a 70-node frame.
    val edges = pathEdges(70)
    assert(IterativeGraph.kcoreAlive(edges, k = 2, maxRounds = 64).count() == 0)
    // the mechanism: the cut frame re-plans from the conservative
    // default size, never the origin estimate
    val df = Seq((1L, 2L)).toDF("a", "b")
    val cut = graft.operators.Checkpoints.stabilizeLazy(df.join(df, "a"))
    assert(cut.queryExecution.optimizedPlan.stats.sizeInBytes == BigInt(Long.MaxValue),
      "checkpoint must not carry the origin plan's size estimate")
  }

  test("spark.graft.reliableCheckpoint flips every iterative loop to reliable checkpoints") {
    val edges = pathEdges(9)
    val sources = Seq((0L, 0L)).toDF("node", "dist")
    val localBfs = IterativeGraph.bfsDistances(edges, sources).as[(Long, Long)].collect().toMap
    val localLp = IterativeGraph.labelPropLabels(edges).as[(Long, Long)].collect().toMap
    val localCc = graft.dedup.Dedup.connectedComponentsStar(
      edges.select(col("src").as("a"), col("dst").as("b")), "a", "b")
      .as[(Long, Long)].collect().toMap
    spark.conf.set(graft.operators.Checkpoints.ConfKey, "true")
    try {
      // one engine-level flag: the DataFrame loops (IterativeGraph) and
      // the RDD-core loops (Dedup star) both switch to reliable
      // checkpoint() — results identical, lineage now HDFS/FS-backed
      val relBfs = IterativeGraph.bfsDistances(edges, sources).as[(Long, Long)].collect().toMap
      val relLp = IterativeGraph.labelPropLabels(edges).as[(Long, Long)].collect().toMap
      val relCc = graft.dedup.Dedup.connectedComponentsStar(
        edges.select(col("src").as("a"), col("dst").as("b")), "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(relBfs == localBfs)
      assert(relLp == localLp)
      assert(relCc == localCc)
      // the reliable path really provisioned a checkpoint dir
      assert(spark.sparkContext.getCheckpointDir.nonEmpty)
    } finally spark.conf.unset(graft.operators.Checkpoints.ConfKey)
  }

  test("convergence kernels reproduce the fixed-round oracle state on the real sf graph") {
    // the [q] hash-gate precondition: at test SF the fixpoint (or cycle
    // stop) coincides with the oracle's unrolled rounds
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val cs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
      .distinct()
    val edges = cs.select(col("c").as("src"), col("p").as("dst"))
      .unionByName(cs.select(col("p").as("src"), col("c").as("dst")))
      .distinct().persist()
    val sources = Seq((0L, 0L)).toDF("node", "dist")
    assert(IterativeGraph.bfsDistances(edges, sources)
      .exceptAll(IterativeGraph.bfsDistancesFixed(edges, sources, 4)).isEmpty)
    assert(IterativeGraph.kcoreAlive(edges, 10)
      .exceptAll(IterativeGraph.kcoreAliveFixed(edges, 10, 4)).isEmpty)
    // LP's cycle stop is canonicalized to the elementwise min of the two
    // oscillating states — replayable from the fixed unroll as
    // least(l3, l4) (both rounds are past cycle entry at every test SF)
    val l3 = IterativeGraph.labelPropLabelsFixed(edges, 3).withColumnRenamed("lbl", "la")
    val l4 = IterativeGraph.labelPropLabelsFixed(edges, 4).withColumnRenamed("lbl", "lb")
    val oracleLp = l3.join(l4, "node")
      .select(col("node"), least(col("la"), col("lb")).as("lbl"))
    assert(IterativeGraph.labelPropLabels(edges).exceptAll(oracleLp).isEmpty)
    edges.unpersist()
  }
}

package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale probe for the ITERATIVE graph family (r13 verdict
  * #8): SF probes can't see this family's dominant cost axis because
  * rounds × actions scales with graph DIAMETER, not row count. This
  * probe holds node/edge count constant and grows the diameter 10× —
  * chain-heavy graphs, the adversarial shape for propagation kernels —
  * recording wall time, scheduled jobs (∝ rounds), and shuffled bytes
  * per kernel. Expected and measured: per-round kernels
  * (bfsDistances: rounds = diameter; kcoreAlive k=2: a chain peels
  * from the endpoints, rounds = len/2) pay 10× the rounds, while the
  * pointer-jumping / large-star–small-star components kernels pay
  * O(log diameter) — the reason dedup_clusters ships the star
  * algorithm. Results land in SURVEY §5.
  *
  * Run: `sbt "runMain graft.DiameterProbe"` (everything is synthetic
  * and in-memory; nothing under /root/testdata is touched).
  */
object DiameterProbe {

  /** nChains disjoint undirected chains of `len` nodes each: node ids
    * chain·len + i, both edge directions materialized. */
  private def chainEdges(spark: SparkSession, nChains: Int, len: Int): DataFrame = {
    val fwd = spark.range(nChains.toLong * (len - 1)).select(
        ((col("id") / (len - 1)).cast("long") * len + col("id") % (len - 1)).as("a"))
      .select(col("a"), (col("a") + 1).as("b"))
    fwd.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(fwd.select(col("b").as("src"), col("a").as("dst")))
  }

  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[8]", shufflePartitions = 8)
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong
    val shuffled = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffled.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    // dev knobs: arg 0 = comma-list of kernel-name substrings, arg 1 =
    // comma-list of config tags (subset re-runs)
    val onlyKernel = args.headOption.map(_.split(",").toSet)
    val onlyTag = args.drop(1).headOption.map(_.split(",").toSet)

    def probe(tag: String, kernel: String)(run: => Long): Unit = {
      if (!onlyTag.forall(_.exists(tag.contains)) ||
          !onlyKernel.forall(_.exists(kernel.contains))) return
      // SQL-cache + heap hygiene only: the shared pre-partitioned edge
      // RDD must STAY persisted across kernels (unpersisting it would
      // charge every round a re-derivation the real queries don't pay);
      // kernel-internal checkpoint blocks die with their RDD refs (GC)
      spark.catalog.clearCache()
      System.gc()
      val j0 = jobs.get(); val s0 = shuffled.get()
      val t0 = System.nanoTime()
      val out = run
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-10s $kernel%-18s wall=${dt}%7.2fs jobs=${jobs.get() - j0}%4d " +
        f"shuffleMB=${(shuffled.get() - s0) / 1e6}%8.1f out=$out%d")
    }

    // same 30k nodes / ~60k directed edges; diameter 29 vs 299
    for ((tag, nChains, len) <- Seq(("diam29", 1000, 30), ("diam299", 100, 300))) {
      val edges = chainEdges(spark, nChains, len)
        .repartition(col("src")).persist()
      edges.count()
      val heads = spark.range(nChains).select((col("id") * len).as("node"), lit(0L).as("dist"))
      probe(tag, "bfsDistances") {
        operators.IterativeGraph.bfsDistances(edges, heads, maxRounds = 1000)
          .agg(max(col("dist"))).head().getLong(0)
      }
      probe(tag, "kcoreAlive(k=2)") {
        operators.IterativeGraph.kcoreAlive(edges, k = 2, maxRounds = 400).count()
      }
      probe(tag, "labelProp(cap32)") {
        operators.IterativeGraph.labelPropLabels(edges, maxRounds = 32)
          .agg(countDistinct(col("lbl"))).head().getLong(0)
      }
      val pairs = edges.filter(col("src") < col("dst"))
        .select(col("src").as("a"), col("dst").as("b"))
      probe(tag, "ccPointerJump") {
        dedup.Dedup.connectedComponents(pairs, "a", "b")
          .agg(countDistinct(col("cluster_id"))).head().getLong(0)
      }
      probe(tag, "ccStar") {
        dedup.Dedup.connectedComponentsStar(pairs, "a", "b")
          .agg(countDistinct(col("cluster_id"))).head().getLong(0)
      }
      edges.unpersist(blocking = true)
    }
    spark.stop()
  }
}

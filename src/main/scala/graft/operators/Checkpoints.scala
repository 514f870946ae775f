package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

/** Lineage-truncation point shared by every iterative kernel.
  *
  * All convergence loops in the engine (IterativeGraph, the
  * dedup_clusters pointer-jumping loop, VectorOps' staged retrieval)
  * must cut lineage each round — the moving frame is referenced more
  * than once per round, so an untruncated plan doubles in size per
  * iteration. Locally, `localCheckpoint(eager = true)` is the right
  * tool: executor-local block storage, no HDFS round-trip. On a
  * cluster with preemptible/spot executors, a lost executor silently
  * loses its local blocks and the loop must recompute from a lineage
  * that no longer exists — there, the reliable `checkpoint()` (HDFS /
  * object-store backed) is required.
  *
  * Rather than asking every call site to choose, the knob is one
  * engine-level runtime conf:
  *
  * {{{
  *   spark.conf.set("spark.graft.reliableCheckpoint", "true")
  * }}}
  *
  * and every iterative loop routes through [[stabilize]]. With the
  * flag on, a checkpoint dir is lazily provisioned (honoring a
  * pre-set `sparkContext.setCheckpointDir`; falling back to a temp
  * dir so local tests can exercise the reliable path — production
  * clusters should set an explicit durable dir).
  *
  * Reference behavior baseline: jahnavi1thoom/ETL-pipeline-telecom is
  * a single-process pandas script (extract.py/transform.py ~490 LoC)
  * with no iterative distributed state; this discipline is part of
  * the 100 TB posture the brief adds.
  */
object Checkpoints {
  val ConfKey = "spark.graft.reliableCheckpoint"

  private def reliableRequested(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption(ConfKey).exists(_.equalsIgnoreCase("true"))

  private def ensureDir(sc: org.apache.spark.SparkContext): Unit =
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(Files.createTempDirectory("graft-ckpt-").toString)

  /** The checkpointed Dataset's LogicalRDD copies its origin plan's
    * SIZE ESTIMATE (`originStats`) — which a convergence loop feeds
    * back into the next round's estimate. A kernel whose round
    * references the moving frame twice (k-core joins the alive set on
    * both endpoints) squares that estimate per round: double-
    * exponential BigInt growth that kills Catalyst sizing with
    * "BigInteger would overflow supported range" near round 30
    * (measured on DiameterProbe's 299-diameter chain). Dropping the
    * copied stats resets every round to `defaultSizeInBytes` —
    * "unknown/huge", the never-broadcast posture the kernels already
    * assume (plan_baseline: zero drift across all 388 queries). */
  private def statsSafe(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.PlanBridge.withoutOriginStats(df)

  /** Truncate `df`'s lineage per the engine checkpoint policy and
    * return the stabilized frame (always eager — the loops' probe
    * actions assume the round's work is done when stabilize returns). */
  def stabilize(df: DataFrame): DataFrame =
    if (reliableRequested(df)) {
      ensureDir(df.sparkSession.sparkContext)
      statsSafe(df.checkpoint())
    } else statsSafe(df.localCheckpoint(true))

  /** Lazy variant for model-sized self-referencing accumulators (the
    * MMR step loop): cuts lineage without scheduling a materialization
    * job per step — the cut happens when the next action touches the
    * frame. */
  def stabilizeLazy(df: DataFrame): DataFrame =
    if (reliableRequested(df)) {
      ensureDir(df.sparkSession.sparkContext)
      statsSafe(df.checkpoint(eager = false))
    } else statsSafe(df.localCheckpoint(false))

  /** RDD-core variant for the pointer-jumping / star loops. Marks the
    * RDD for truncation; the caller's own probe action materializes it
    * (reliable mode persists first so checkpointing does not recompute
    * the round). */
  def stabilizeRdd[T](rdd: org.apache.spark.rdd.RDD[T],
                      level: org.apache.spark.storage.StorageLevel): Unit = {
    val reliable = org.apache.spark.sql.SparkSession.getActiveSession
      .exists(_.conf.getOption(ConfKey).exists(_.equalsIgnoreCase("true")))
    if (reliable) {
      ensureDir(rdd.sparkContext)
      rdd.persist(level)
      rdd.checkpoint()
    } else rdd.localCheckpoint()
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's scale posture baked in.
  *
  * Local runs use `local[N]`; on a real cluster the same config block
  * applies (AQE, skew-join handling, sensible shuffle parallelism) —
  * only `master` and memory sizing change.
  */
object Engine {

  /** Core count implied by `master` (local[N] / local[N,f] / local[*]);
    * for non-local masters the driver-side processor count is the best
    * available stand-in at session-build time. */
  private[graft] def coresOf(master: String): Int =
    if (master.startsWith("local[")) {
      val inner = master.stripPrefix("local[").takeWhile(_ != ']')
      val n = inner.split(",").head
      if (n == "*") Runtime.getRuntime.availableProcessors else n.toInt
    } else Runtime.getRuntime.availableProcessors

  /** Spill-aware initial shuffle parallelism (r18 verdict #1): AQE must
    * coalesce DOWN from a safe partition count, not concentrate rows at
    * the static `shufflePartitions`. FULLVERIFY_sf10_heavy_r18 measured
    * the hazard: q_two_hop's reduce aggregate at 1000× the driver SF
    * OOMs a bounded heap at 32 partitions (~4M rows/task × 16 concurrent
    * tasks exceeds the per-task execution-memory slice) and completes at
    * 128. 8×cores keeps per-task state inside the slice — the sizing
    * SURVEY §5 prescribes — while AQE's coalescing still merges small
    * outputs back to few tasks, so small-SF plans pay no extra tasks. */
  private[graft] def initialPartitions(master: String, shufflePartitions: Int): Int =
    math.max(8 * coresOf(master), shufflePartitions)

  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initialPartitions(master, shufflePartitions).toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate silently reuses a pre-existing session: runtime SQL
    // configs above ARE re-applied to it, but extensions (the graft SQL
    // function registry) are NOT. Fail fast instead of returning a
    // session that breaks the engine's determinism conventions.
    if (!spark.catalog.functionExists("simhash64"))
      throw new IllegalStateException(
        "Engine.session: getOrCreate returned a pre-existing SparkSession " +
          "built without GraftExtensions — graft SQL functions are missing. " +
          "Stop that session first, or build yours via Engine.session.")
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

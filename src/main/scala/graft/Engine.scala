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
    initialPartitions(master, shufflePartitions, -1L)

  /** r19 optimization (guide §2: make partitioning scale-adaptive —
    * derive from input size rather than a constant): when the caller
    * knows the input volume, the initial shuffle partition count is
    * ceil(inputBytes / 8 MiB), floored at `shufflePartitions` and capped
    * at the 8×cores spill posture above. Shuffled intermediates in these
    * pipelines run up to ~10–30× the parquet input bytes (decompression
    * + explode), so 8 MiB of input per initial partition bounds
    * pre-coalesce shuffle partitions well under the memory slice: at the
    * sf10 1000×-SF gate (~1.7 GB input) this yields 218 initial
    * partitions — above the measured 128-partition q_two_hop OOM floor
    * (re-verified this round, see OPTIMIZATION_r19.md) — while a small
    * input no longer pays 256 shuffle buckets × ~20 exchanges per query
    * of pure AQE bookkeeping (measured 7.5 s → 6.3 s on q_label_prop at
    * sf0.1 from this alone). Unknown input (−1) keeps the old constant
    * posture. */
  private[graft] def initialPartitions(master: String, shufflePartitions: Int,
                                       inputBytes: Long): Int = {
    val byCores = 8 * coresOf(master)
    // ceiling: the size-derived count may EXCEED 8×cores (spill safety
    // scales with data, not cores — the r18 q_two_hop sf10 aggregate
    // ran at 98% of an 8 GiB heap at the core-derived 128 and tips
    // over on a marginally different generation; at the size-derived
    // 285 it has honest headroom) but stays bounded so the M×R shuffle
    // block count (guide §2.2) cannot grow quadratically without
    // limit at very large inputs — AQE coalescing handles the rest.
    val ceiling = math.max(byCores, 4096)
    val cand =
      if (inputBytes <= 0) byCores
      else math.min(ceiling.toLong, (inputBytes + (8L << 20) - 1) / (8L << 20)).toInt
    math.max(shufflePartitions, cand)
  }

  /** Total bytes of the star-schema parquet inputs under `dir` (the
    * sizing input for [[initialPartitions]]); 0 when unreadable. */
  private[graft] def inputBytes(dir: String): Long =
    try {
      val d = new java.io.File(dir)
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
        .map(f => if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).map(_.length()).sum
                  else f.length())
        .sum
    } catch { case _: Throwable => 0L }

  def session(master: String = "local[*]", shufflePartitions: Int = 32,
              inputBytes: Long = -1L): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        initialPartitions(master, shufflePartitions, inputBytes).toString)
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

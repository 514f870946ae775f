package graft.operators

import org.apache.spark.sql.DataFrame

/** Conditional scan-spread for CPU-heavy map work (r19 optimization;
  * guide §2.5 "input skew: one huge unsplittable file" / §6 input
  * split sizing).
  *
  * A small parquet file arrives as ONE scan split — and a single row
  * group cannot be split further no matter how low
  * `spark.sql.files.maxPartitionBytes` goes — so every per-row kernel
  * downstream of the scan (word shingling, SRP band signatures,
  * n-gram explodes, quantization) runs on one core of the whole
  * cluster until the first exchange. Measured at sf0.1/local[32]: the
  * single-task map job IS the query for the text/dedup/sim families —
  * sim_lsh_rerank 3.6 s of its 5.1 s, text_ngram_novelty 3.9 s of
  * 4.9 s, dedup_substring 2.8 s of 3.8 s (DevProbe `jobs:` splits).
  *
  * The fix is an explicit round-robin repartition of the raw rows to
  * the session's default parallelism — guarded so it only fires when
  * the planned scan parallelism is BELOW that: at real scale the
  * input has many splits and this is a no-op (no shuffle added, no
  * plan change); the repartition never reduces parallelism. Results
  * are partition-layout independent by the engine's metamorphic
  * contract (METAMORPHIC gate re-verified after this change), so
  * spreading cannot change any query's output.
  */
object Spread {

  /** `df` repartitioned round-robin to the default parallelism iff its
    * current plan yields fewer partitions; identity otherwise. Apply
    * immediately after a scan whose downstream map work is expensive. */
  def forCompute(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

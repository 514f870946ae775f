package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed-token-budget bins (the "pack short documents into one context
  * window" step before tokenized-batch writing).
  *
  * Scale shape: a single GLOBAL greedy pack would serialize on one
  * ordered partition, so documents are first sharded by a deterministic
  * content hash and packed greedily WITHIN each shard — shards pack in
  * parallel, each with one window pass. Bin fill stays near the budget
  * (only inter-shard boundaries lose packing efficiency), and the
  * assignment is a pure function of (id, token counts) — stable across
  * engines, runs, and parallelism.
  */
object Packing {

  /** Deterministic, engine-portable shard in [0, shards): first two hex
    * digits of md5(key), decoded with instr arithmetic (both Spark and
    * ANSI-ish SQL engines share instr/strpos — no base-conversion
    * builtin needed). Uniform for shards <= 256. */
  def contentShard(key: Column, shards: Int): Column = {
    val hex = "0123456789abcdef"
    def digit(i: Int) =
      call_function("instr", lit(hex), substring(md5(key.cast("string")), i, 1)) - lit(1)
    pmod(digit(1) * lit(16) + digit(2), lit(shards)).cast("int")
  }

  /** Greedy sequential bin assignment: within a shard (ordered by id),
    * bin = floor(exclusive-prefix-sum(tokens) / budget). A document
    * larger than the budget gets a bin (or bin span) of its own and the
    * next document starts a fresh offset — exactly the first-fit
    * behavior of a single sequential packer, per shard.
    *
    * @return input columns + shard, bin, n_tokens_cum */
  def packBins(df: DataFrame, idCol: String, tokensCol: String,
               budget: Long, shards: Int = 16): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0 && shards <= 256, s"shards must be in [1, 256], got $shards")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", contentShard(col(idCol), shards))
      .withColumn("n_tokens_cum", sum(col(tokensCol)).over(w))
      .withColumn("bin",
        floor((col("n_tokens_cum") - col(tokensCol)) / lit(budget)).cast("long"))
  }

  /** [[packBins]] continued from per-shard base offsets — the streaming
    * ingest form, where earlier rows already landed and each micro-batch
    * extends the per-shard greedy sequence. `bases` is the tiny
    * (shard, base_cum) frame (one row per landed shard, broadcast);
    * shards with no landed rows start at 0. Under id-ordered arrival
    * (every landed id below every new id), the continued assignment is
    * BY CONSTRUCTION identical to one packBins pass over landed ∪ new:
    * the window sum at a new row is base + the within-batch prefix, both
    * exact BIGINT additions. */
  def packBinsFrom(df: DataFrame, idCol: String, tokensCol: String,
                   budget: Long, shards: Int, bases: DataFrame): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0 && shards <= 256, s"shards must be in [1, 256], got $shards")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", contentShard(col(idCol), shards))
      .join(broadcast(bases.select(col("shard"), col("base_cum"))), Seq("shard"), "left")
      .na.fill(0L, Seq("base_cum"))
      .withColumn("n_tokens_cum", sum(col(tokensCol)).over(w) + col("base_cum"))
      .withColumn("bin",
        floor((col("n_tokens_cum") - col(tokensCol)) / lit(budget)).cast("long"))
      .drop("base_cum")
  }
}

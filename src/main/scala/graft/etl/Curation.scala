package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared stages of the end-to-end curation DAG (reference
  * scripts/transform.py:1 → validate.py → load.py as one composition):
  * clean → feature-engineer → validate/quarantine → exact dedup →
  * richness gate → shard-pack → per-shard manifest. The BATCH
  * composition is the `pipeline_run` query
  * ([[graft.SparkEntry]]); the STREAMING twin
  * ([[graft.streaming.PipelineStream]]) runs the same row-local stages
  * per micro-batch and carries the two cross-row stages (dedup keeper
  * set, per-shard pack offsets) through the landed snapshot table
  * itself — one stage definition, two execution modes, hash-verified
  * against each other by PipelineStreamSpec.
  *
  * The manifest digest is the etl_table_fingerprint recipe over
  * (doc_id|bin): md5-derived 48-bit terms summed in DECIMAL(38,0) —
  * any row surviving the wrong gate, deduped to the wrong keeper, or
  * packed into the wrong bin shifts a per-shard digest. */
object Curation {

  val Budget = 2048L
  val Shards = 8

  /** Trim + whitespace-squeeze (transform.py's string normalization). */
  val clean: DataFrame => DataFrame = df =>
    df.select(col("doc_id"),
      regexp_replace(trim(col("text")), "\\s+", " ").as("text"))

  /** Token estimate + lexical richness — the curation features. */
  val features: DataFrame => DataFrame = df =>
    df.withColumn("n_tokens",
        graft.text.TextFunctions.bpeTokenEstimate(col("text")).cast("long"))
      .withColumn("richness",
        size(array_distinct(split(col("text"), " "))).cast("double") /
          size(split(col("text"), " ")).cast("double"))

  /** Keep the clean stream; quarantined rows (null/empty text, token
    * bounds) are dropped here — the operational split is Validate
    * .quarantine, this is its keep side. */
  val quarantineClean: DataFrame => DataFrame = df =>
    Validate.quarantine(df, Seq(
      "empty_text" -> (col("text").isNull || length(col("text")) === 0),
      "token_bounds" -> !(col("n_tokens") >= 5 && col("n_tokens") <= 4096)))._1

  /** Exact dedup, min-id keeper per content hash — the batch (global)
    * form. The streaming twin splits this into a batch-local keeper
    * pass plus an anti-join against the landed table (same keeper
    * semantics under id-ordered arrival). */
  val dedup: DataFrame => DataFrame = df =>
    df.withColumn("keeper",
        min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("keeper"))
      .drop("keeper")

  /** Curation gate: lexical richness ≥ 0.3. Order-independent with
    * dedup (duplicates share text, hence richness). */
  val gate: DataFrame => DataFrame = df => df.filter(col("richness") >= 0.3)

  /** Token-budget bin packing across content-hash shards. */
  val pack: DataFrame => DataFrame = df =>
    graft.text.Packing.packBins(df.select(col("doc_id"), col("n_tokens")),
      "doc_id", "n_tokens", budget = Budget, shards = Shards)

  /** Per-shard manifest over a frame carrying (shard, bin, n_tokens,
    * doc_id): counts, token sum, and the order-independent digest. */
  val manifest: DataFrame => DataFrame = { df =>
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    val h48 = (2 to 12).map(nib)
      .foldLeft(s"CAST(${nib(1)} AS BIGINT)")((a, b) => s"($a * 16 + $b)")
    df.withColumn("h", md5(concat_ws("|", col("doc_id"), col("bin"))))
      .selectExpr("shard", "bin", "n_tokens", s"CAST($h48 AS BIGINT) AS hv")
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("bin")).as("n_bins"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(col("hv").cast("decimal(38,0)")).cast("decimal(38,0)")
          .cast("string").as("digest"))
      .orderBy(col("shard"))
  }

  /** The batch DAG, stage-for-stage (the `pipeline_run` composition). */
  def batchStages: Seq[DataFrame => DataFrame] =
    Seq(clean, features, quarantineClean, dedup, gate, pack, manifest)
}

package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.etl.{Curation, Snapshots}

/** The STREAMING twin of the batch `pipeline_run` DAG — live micro-batch
  * curation (clean → quarantine → exact dedup → richness gate →
  * shard-pack) landing exactly-once into a [[graft.etl.Snapshots]]
  * table. This is the shape a 100 TB ingest actually runs: history is
  * the batch pipeline, the live tail is this.
  *
  * ==Where the cross-row state lives==
  * The row-local stages (clean/features/quarantine/gate) are the SAME
  * functions the batch DAG composes ([[Curation]]). The two cross-row
  * stages carry their state in the LANDED TABLE itself, so the stream
  * needs no driver state and no sketch files:
  *
  *  - '''Exact dedup''': min-id keeper within the batch, then an
  *    anti-join against the landed table's content hashes — the seen-set
  *    IS the table.
  *  - '''Shard-pack''': each batch reads the per-shard token totals
  *    from the landed table (one `Shards`-row aggregate, broadcast) and
  *    continues the greedy cumulative sum
  *    ([[graft.text.Packing.packBinsFrom]]).
  *
  * ==Exactly-once / restart==
  * Batches land as snapshot version batchId+1 through the Snapshots
  * CAS ([[EventsStream.commitBatchSnapshot]]): a replayed batch
  * anti-joins its own landed rows away AND loses the CAS — doubly
  * idempotent. A kill-and-restart resumes from the checkpointed offsets
  * against the committed table, so the restarted stream's manifest
  * equals an uninterrupted run's (PipelineStreamSpec pins this, plus
  * per-prefix digest parity with the batch DAG).
  *
  * ==Parity contract==
  * Equals the batch `pipeline_run` manifest over every prefix when
  * arrival is doc_id-ordered (batch boundaries anywhere — what a real
  * ingest with monotone ids gives you): the batch keeper (global min id
  * per hash) is then always the FIRST arrival, and every landed id
  * precedes every new id per shard, so the continued pack equals the
  * one-pass pack. Out-of-order arrival keeps first-arrival-wins dedup
  * and per-arrival packing — still deterministic, no longer
  * batch-bit-identical.
  */
object PipelineStream {

  /** Run one micro-batch of the curation DAG against the landed table.
    * Returns true when this call published the batch's snapshot
    * version (false = a replay lost the CAS and was a no-op). */
  def curateBatch(batch: DataFrame, table: String, batchId: Long,
                  budget: Long = Curation.Budget,
                  shards: Int = Curation.Shards): Boolean = {
    val spark = batch.sparkSession
    // row-local stages — identical code to the batch DAG
    val curated = Curation.gate(Curation.quarantineClean(
        Curation.features(Curation.clean(batch))))
      .withColumn("text_h", md5(col("text")))
    // batch-local exact dedup: min-id keeper per content hash
    val localKeeper = curated
      .withColumn("__keeper", min(col("doc_id")).over(Window.partitionBy(col("text_h"))))
      .filter(col("doc_id") === col("__keeper"))
      .drop("__keeper")
    // cross-batch dedup + pack continuation: both read the landed table
    val landed =
      if (Snapshots.latestVersion(spark, table) > 0) Some(Snapshots.read(spark, table))
      else None
    val fresh = landed match {
      case Some(t) => localKeeper.join(t.select(col("text_h")), Seq("text_h"), "left_anti")
      case None => localKeeper
    }
    val bases = landed match {
      case Some(t) => t.groupBy(col("shard")).agg(sum(col("n_tokens")).as("base_cum"))
      case None =>
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType.fromDDL("shard INT, base_cum BIGINT"))
    }
    val packed = graft.text.Packing.packBinsFrom(
      fresh.select(col("doc_id"), col("n_tokens"), col("text_h")),
      "doc_id", "n_tokens", budget, shards, bases)
    EventsStream.commitBatchSnapshot(
      packed.select("doc_id", "n_tokens", "text_h", "shard", "n_tokens_cum", "bin"),
      table, batchId)
  }

  /** Live curation ingest: docs stream (doc_id, text) → curated,
    * deduped, packed rows landing exactly-once in `table`. */
  def curationStream(docs: DataFrame, table: String, checkpointDir: String,
                     budget: Long = Curation.Budget,
                     shards: Int = Curation.Shards): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        curateBatch(batch.toDF(), table, id, budget, shards)
        ()
      }
      .start()

  /** The per-shard manifest of everything landed so far — the same
    * digest recipe as the batch DAG's final stage, so stream-vs-batch
    * parity is one frame compare. */
  def manifest(spark: SparkSession, table: String): DataFrame =
    Curation.manifest(Snapshots.read(spark, table)
      .select(col("doc_id"), col("n_tokens"), col("shard"), col("bin")))
}

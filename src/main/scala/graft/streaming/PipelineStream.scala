package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.etl.{Curation, Snapshots}

/** The STREAMING twin of the batch `pipeline_run` DAG — live micro-batch
  * curation (clean → quarantine → exact dedup → richness gate →
  * shard-pack) landing exactly-once into a [[graft.etl.Snapshots]]
  * table. This is the shape a 100 TB ingest actually runs: history is
  * the batch pipeline, the live tail is this.
  *
  * ==Where the cross-row state lives==
  * The row-local stages (clean/features/quarantine/gate) are the SAME
  * functions the batch DAG composes ([[Curation]]). The cross-row state
  * lives in TABLES, not the driver:
  *
  *  - '''Exact dedup''': min-id keeper across the reorder buffer, then
  *    an anti-join against the landed table's content hashes — the
  *    seen-set IS the table.
  *  - '''Reorder buffer + pack offsets''': a small companion "carry"
  *    snapshot table (`<table>__carry`, one overwrite commit per batch,
  *    O(buffer + shards) rows of scalars — no text) holds the
  *    not-yet-released rows, the per-shard greedy-pack offsets
  *    (maintained INCREMENTALLY — no per-batch rescan of the landed
  *    table for token totals), and the doc_id high-water mark.
  *
  * ==Out-of-order arrival (the `horizon` contract)==
  * Real ingests are near-ordered, not ordered. A row is released to the
  * pack only once the observed doc_id high-water mark has passed
  * `doc_id + horizon`; until then it waits in the carry table. Released
  * rows therefore leave in GLOBAL doc_id order whenever every row's
  * displacement (high-water mark at its arrival − its doc_id) is at
  * most `horizon` — and then the landed corpus, keepers, bins, and
  * manifest digests are IDENTICAL to the batch `pipeline_run` DAG over
  * the same rows, for ANY arrival order within that bound
  * (PipelineStreamSpec feeds a shuffled stream and compares digests).
  * The keeper rule is min doc_id per content hash on BOTH ends: inside
  * the buffer a late-arriving smaller id displaces a pending larger
  * one, and a duplicate of an already-landed hash anti-joins away.
  * `horizon = 0` is the strictly-ordered contract (every arrival
  * releases immediately). A document arriving BEYOND the contract
  * (displacement > horizon: its doc_id is at or below the release
  * threshold already passed) is never packed — packing it would
  * silently diverge from the batch DAG's global-order pack and keeper
  * choice, exactly the shape of the r16 out-of-order finding. Instead
  * it lands in the carry table's cumulative quarantine rows (kind
  * "q", with the release threshold in force at arrival and a named
  * reason — the [[graft.etl.Validate]] fix-and-replay posture), read
  * back via [[lateAudit]]; everything in-contract stays
  * batch-identical (PipelineStreamSpec pins both halves).
  *
  * ==Exactly-once / restart==
  * Every read in a batch is PINNED at snapshot version `batchId` (the
  * state before the batch) and both commits CAS at `batchId + 1`, so a
  * batch is a pure function of (table@id, carry@id, batch rows): a
  * replay recomputes bit-identical outputs and merely loses the CAS
  * races it already won. Main commits before carry; a crash between
  * them replays off the same pinned versions. A kill-and-restart
  * resumes from the checkpointed offsets against the committed tables
  * (PipelineStreamSpec pins restart parity, including a deleted
  * commit marker forcing a replay).
  */
object PipelineStream {

  private def carryTable(table: String): String = table + "__carry"

  private val CarrySchema = StructType.fromDDL(
    "kind STRING, doc_id BIGINT, text_h STRING, n_tokens BIGINT, " +
      "shard INT, base_cum BIGINT, hwm BIGINT, fp STRING")

  private def emptyCarry(spark: SparkSession): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), CarrySchema)

  private def fingerprint(horizon: Long, budget: Long, shards: Int): String =
    s"pipeline:horizon=$horizon,budget=$budget,shards=$shards"

  /** Run one micro-batch of the curation DAG against the landed table.
    * Returns true when this call published the batch's main snapshot
    * version (false = a replay lost the CAS and was a no-op). */
  def curateBatch(batch: DataFrame, table: String, batchId: Long,
                  budget: Long = Curation.Budget,
                  shards: Int = Curation.Shards,
                  horizon: Long = 0L): Boolean = {
    val spark = batch.sparkSession
    val fp = fingerprint(horizon, budget, shards)
    val vPrev = math.toIntExact(batchId) // versions align with batch ids
    val widen = (df: DataFrame) =>
      emptyCarry(spark).unionByName(df, allowMissingColumns = true)

    // pinned reads: state BEFORE this batch, so replays recompute
    // bit-identically no matter which commits already landed
    val landed =
      if (vPrev > 0) Some(Snapshots.read(spark, table, Some(vPrev))) else None
    val carry =
      if (vPrev > 0) Snapshots.read(spark, carryTable(table), Some(vPrev))
      else emptyCarry(spark)
    val meta = carry.filter(col("kind") === "m").select(col("hwm"), col("fp")).collect()
    meta.headOption.map(_.getString(1)).filter(_ != fp).foreach { was =>
      throw new IllegalStateException(
        s"pipeline-stream parameter mismatch on $table: the carry table was " +
          s"""written under "$was", this stream runs "$fp". Changing horizon/""" +
          "budget/shards mid-checkpoint would silently repack; start a fresh " +
          "table + checkpoint instead.")
    }
    val hwmPrev = meta.headOption.map(_.getLong(0)).getOrElse(Long.MinValue)

    // row-local stages — identical code to the batch DAG; text is
    // dropped here, nothing row-sized or text-sized enters the carry
    val curated = Curation.gate(Curation.quarantineClean(
        Curation.features(Curation.clean(batch))))
      .withColumn("text_h", md5(col("text")))
      .select(col("doc_id"), col("text_h"), col("n_tokens"))

    // the id clock advances on EVERY arrival, gated or not
    val batchMax = batch.agg(max(col("doc_id"))).head()
    val hwmNew =
      if (batchMax.isNullAt(0)) hwmPrev else math.max(hwmPrev, batchMax.getLong(0))
    val thr = if (hwmNew == Long.MinValue) Long.MinValue else hwmNew - horizon

    // beyond-horizon quarantine (r17 verdict #4): an arrival whose
    // doc_id is at or below the PREVIOUS batch's release threshold
    // missed its slot — packing it now would diverge from the batch
    // DAG's global-order pack/keeper. Route it (gated rows only — the
    // batch DAG would drop gate-failures anyway) to the cumulative
    // kind-"q" rows with the threshold in force at arrival; the carry
    // overwrite's CAS keeps the audit exactly-once under replays.
    val thrPrev =
      if (hwmPrev == Long.MinValue) Long.MinValue else hwmPrev - horizon
    val lateRaw =
      if (hwmPrev == Long.MinValue) curated.limit(0)
      else curated.filter(col("doc_id") <= thrPrev)
    val inWin =
      if (hwmPrev == Long.MinValue) curated
      else curated.filter(col("doc_id") > thrPrev)
    val latePrev = carry.filter(col("kind") === "q")
    // the audit is per-DOCUMENT, not per-arrival (r18 advice #3): a late
    // duplicate of an already-landed hash is not a lost document (the
    // keeper would have anti-joined it away on time too), and the same
    // late document re-arriving across batches must not re-audit — so
    // lateNew anti-joins the landed seen-set and the existing kind-"q"
    // rows, and keeps one row (min doc_id) per hash within the batch.
    // A late arrival whose hash is merely PENDING stays audited: it IS
    // a missed keeper (the batch DAG would have kept the smaller id).
    val lateNew = {
      val unlanded = landed match {
        case Some(t) => lateRaw.join(t.select(col("text_h")), Seq("text_h"), "left_anti")
        case None => lateRaw
      }
      unlanded
        .join(latePrev.select(col("text_h")), Seq("text_h"), "left_anti")
        .withColumn("__k", min(col("doc_id")).over(Window.partitionBy(col("text_h"))))
        .filter(col("doc_id") === col("__k")).drop("__k")
        // after the min-id keeper the survivors of one hash are
        // bit-identical rows (doc_id = the min, n_tokens a function of
        // the text), so this dedup of a literally re-fed arrival is
        // deterministic
        .dropDuplicates("text_h")
    }

    // cross-batch dedup: seen-set anti-join, then the min-id keeper over
    // buffer ∪ arrivals (a late smaller id displaces a pending larger one)
    val fresh = landed match {
      case Some(t) => inWin.join(t.select(col("text_h")), Seq("text_h"), "left_anti")
      case None => inWin
    }
    val pendingPrev = carry.filter(col("kind") === "p")
      .select(col("doc_id"), col("text_h"), col("n_tokens"))
    val pendAll = pendingPrev.unionByName(fresh)
      .withColumn("__k", min(col("doc_id")).over(Window.partitionBy(col("text_h"))))
      .filter(col("doc_id") === col("__k")).drop("__k")
    val released = pendAll.filter(col("doc_id") <= thr)
    val still = pendAll.filter(col("doc_id") > thr)

    // pack continuation off the INCREMENTAL per-shard offsets
    val basesPrev = carry.filter(col("kind") === "b")
      .select(col("shard"), col("base_cum"))
    val packed = graft.text.Packing.packBinsFrom(
      released.select(col("doc_id"), col("n_tokens"), col("text_h")),
      "doc_id", "n_tokens", budget, shards, basesPrev)
      .select(col("doc_id"), col("n_tokens"), col("text_h"),
        col("shard"), col("n_tokens_cum"), col("bin"))

    // main first, then carry — see the object doc's crash analysis
    val mainOk = EventsStream.commitBatchSnapshot(packed, table, batchId)
    val basesNew = basesPrev.as("o")
      .join(packed.groupBy(col("shard")).agg(max(col("n_tokens_cum")).as("nc")).as("n"),
        Seq("shard"), "full")
      .select(col("shard"), coalesce(col("nc"), col("base_cum")).as("base_cum"))
    import spark.implicits._
    val carryNew = widen(still.withColumn("kind", lit("p")))
      .unionByName(widen(basesNew.withColumn("kind", lit("b"))))
      .unionByName(widen(Seq((hwmNew, fp)).toDF("hwm", "fp").withColumn("kind", lit("m"))))
      .unionByName(latePrev)
      .unionByName(widen(lateNew
        .select(col("doc_id"), col("text_h"), col("n_tokens"))
        .withColumn("kind", lit("q"))
        .withColumn("hwm", lit(thrPrev))
        .withColumn("fp", lit("beyond-horizon"))))
    try {
      Snapshots.commit(carryNew, carryTable(table), "overwrite",
        targetVersion = Some(vPrev + 1))
    } catch { case _: java.util.ConcurrentModificationException => () }
    mainOk
  }

  /** Terminal drain: release every buffered row regardless of horizon
    * (a finite corpus's tail, or shutdown). Commits the packed tail as
    * one more main version plus an emptied carry; idempotent — a second
    * flush packs nothing. Returns true when a non-empty tail landed. */
  def flushPending(spark: SparkSession, table: String,
                   budget: Long = Curation.Budget,
                   shards: Int = Curation.Shards): Boolean = {
    val ct = carryTable(table)
    val v = Snapshots.latestVersion(spark, ct)
    if (v == 0) return false
    val widen = (df: DataFrame) =>
      emptyCarry(spark).unionByName(df, allowMissingColumns = true)
    val carry = Snapshots.read(spark, ct, Some(v))
    val pending = carry.filter(col("kind") === "p")
      .select(col("doc_id"), col("text_h"), col("n_tokens"))
    if (pending.isEmpty) return false
    val bases = carry.filter(col("kind") === "b").select(col("shard"), col("base_cum"))
    val packed = graft.text.Packing.packBinsFrom(
      pending, "doc_id", "n_tokens", budget, shards, bases)
      .select(col("doc_id"), col("n_tokens"), col("text_h"),
        col("shard"), col("n_tokens_cum"), col("bin"))
    val ok =
      try { Snapshots.commit(packed, table, "append", Some(v + 1)); true }
      catch { case _: java.util.ConcurrentModificationException => false }
    val basesNew = bases.as("o")
      .join(packed.groupBy(col("shard")).agg(max(col("n_tokens_cum")).as("nc")).as("n"),
        Seq("shard"), "full")
      .select(col("shard"), coalesce(col("nc"), col("base_cum")).as("base_cum"))
    val metaOld = carry.filter(col("kind") === "m").select(col("hwm"), col("fp"))
    val carryNew = widen(basesNew.withColumn("kind", lit("b")))
      .unionByName(widen(metaOld.withColumn("kind", lit("m"))))
      // quarantined beyond-horizon rows survive the drain: they are a
      // fix-and-replay audit, not pending work — flushing must not pack
      // them (that would reintroduce the divergence) nor drop them
      .unionByName(carry.filter(col("kind") === "q"))
    try {
      Snapshots.commit(carryNew, ct, "overwrite", targetVersion = Some(v + 1))
    } catch { case _: java.util.ConcurrentModificationException => () }
    ok
  }

  /** Live curation ingest: docs stream (doc_id, text) → curated,
    * deduped (within the `horizon` reorder contract), packed rows
    * landing exactly-once in `table`. */
  def curationStream(docs: DataFrame, table: String, checkpointDir: String,
                     budget: Long = Curation.Budget,
                     shards: Int = Curation.Shards,
                     horizon: Long = 0L): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        curateBatch(batch.toDF(), table, id, budget, shards, horizon)
        ()
      }
      .start()

  /** Beyond-horizon quarantine audit: every document that arrived
    * after its release slot had passed (displacement > horizon), with
    * the release threshold in force at arrival and the routed reason —
    * the fix-and-replay surface (the `etl_quarantine` posture). These
    * rows are NEVER packed; re-ingesting them under a fresh table (or
    * a widened horizon) is the replay path. O(late rows) scalars, no
    * text. */
  def lateAudit(spark: SparkSession, table: String): DataFrame = {
    val ct = carryTable(table)
    val v = Snapshots.latestVersion(spark, ct)
    val rows =
      if (v == 0) emptyCarry(spark) else Snapshots.read(spark, ct, Some(v))
    rows.filter(col("kind") === "q")
      .select(col("doc_id"), col("text_h"), col("n_tokens"),
        col("hwm").as("release_thr_at_arrival"), col("fp").as("reason"))
  }

  /** The per-shard manifest of everything landed so far — the same
    * digest recipe as the batch DAG's final stage, so stream-vs-batch
    * parity is one frame compare. */
  def manifest(spark: SparkSession, table: String): DataFrame =
    Curation.manifest(Snapshots.read(spark, table)
      .select(col("doc_id"), col("n_tokens"), col("shard"), col("bin")))
}

package graft

import org.apache.spark.sql.DataFrame
import graft.etl.Curation
import graft.streaming.PipelineStream

/** The streaming curation pipeline's parity contract
  * (PipelineStream object doc): over every doc_id-ordered prefix, the
  * landed table's manifest equals the batch `pipeline_run` DAG run over
  * the same prefix — digests included, so a wrong gate, wrong dedup
  * keeper, or wrong bin assignment anywhere in the stream shifts a
  * per-shard digest and fails. Adversarial slicing (a 1-row batch, a
  * lopsided middle, the rest) plus a kill-and-restart with a deleted
  * commit marker (forces a full batch replay against the landed table).
  */
class PipelineStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  private def manifestRows(df: DataFrame): Seq[(Int, Long, Long, Long, String)] =
    df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getString(4))).toSeq.sortBy(_._1)

  private def batchManifest(prefix: Seq[(Long, String)]): Seq[(Int, Long, Long, Long, String)] =
    manifestRows(Curation.batchStages.foldLeft(
      prefix.toDF("doc_id", "text").repartition(4))((d, f) => f(d)))

  test("stream manifest equals the batch DAG per prefix, through adversarial slicing and a mid-stream restart") {
    val rows = Tables.documents(spark, sfDir).select("doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows.size >= 100, s"need a real corpus, got ${rows.size}")
    // adversarial slices of the id-ordered feed: 1 row, a lopsided
    // middle, the rest
    val slices = Seq(rows.take(1), rows.slice(1, rows.size / 2), rows.drop(rows.size / 2))
    val prefixes = slices.scanLeft(Seq.empty[(Long, String)])(_ ++ _).tail
    val (src, ckpt, table) = (tmp("pstream_src"), tmp("pstream_ckpt"), tmp("pstream_tbl") + "/t")
    def feed(s: Seq[(Long, String)]): Unit =
      s.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    def start() = PipelineStream.curationStream(
      spark.readStream.schema("doc_id LONG, text STRING").parquet(src), table, ckpt)

    // run 1: slice 1 only, then KILL (stop + delete the commit marker,
    // so the restarted query must replay the batch against the landed
    // table — the anti-join and the snapshot CAS both have to hold)
    feed(slices(0))
    val q1 = start(); q1.processAllAvailable()
    assert(manifestRows(PipelineStream.manifest(spark, table)) == batchManifest(prefixes(0)),
      "prefix 1: stream != batch")
    q1.stop()
    val commits = new java.io.File(s"$ckpt/commits")
    val lastCommit = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    val crc = new java.io.File(commits, s".${lastCommit.getName}.crc")
    assert(lastCommit.delete()); if (crc.exists()) crc.delete()

    // run 2 (restart): replayed batch must be a no-op, then the
    // remaining slices extend the landed state batch by batch
    feed(slices(1))
    val q2 = start(); q2.processAllAvailable()
    assert(manifestRows(PipelineStream.manifest(spark, table)) == batchManifest(prefixes(1)),
      "prefix 2 (after replay): stream != batch")
    feed(slices(2))
    q2.processAllAvailable(); q2.stop()
    val fin = manifestRows(PipelineStream.manifest(spark, table))
    assert(fin == batchManifest(prefixes(2)), "full corpus: stream != batch")

    // and the full-corpus manifest IS the pipeline_run query's result
    assert(fin == manifestRows(SparkEntry.queries("pipeline_run")(spark, sfDir)),
      "stream != the registered batch pipeline_run")

    // the landed table is duplicate-free on content hash (the cross-
    // batch dedup held under the replay)
    val landed = graft.etl.Snapshots.read(spark, table)
    assert(landed.groupBy("text_h").count().filter(org.apache.spark.sql.functions.col("count") > 1).count() == 0)
  }

  // ---- out-of-order arrival under the horizon contract (r16 verdict #1) ----

  private def corpus: Seq[(Long, String)] =
    Tables.documents(spark, sfDir).select("doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

  /** Worst observed displacement of a feed order: max over rows of
    * (id high-water mark at arrival − the row's id) — the exact bound
    * the horizon contract is stated in. */
  private def maxDisplacement(feed: Seq[(Long, String)]): Long = {
    var hwm = Long.MinValue; var d = 0L
    feed.foreach { case (id, _) =>
      hwm = math.max(hwm, id); d = math.max(d, hwm - id)
    }
    d
  }

  private def runShuffled(feedSlices: Seq[Seq[(Long, String)]], horizon: Long,
                          killAfterSlice: Option[Int]): Seq[(Int, Long, Long, Long, String)] = {
    val (src, ckpt, table) = (tmp("pshuf_src"), tmp("pshuf_ckpt"), tmp("pshuf_tbl") + "/t")
    def feed(s: Seq[(Long, String)]): Unit =
      s.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    def start() = graft.streaming.PipelineStream.curationStream(
      spark.readStream.schema("doc_id LONG, text STRING").parquet(src), table, ckpt,
      horizon = horizon)
    var q = start()
    feedSlices.zipWithIndex.foreach { case (s, i) =>
      feed(s); q.processAllAvailable()
      if (killAfterSlice.contains(i)) {
        // kill: stop + delete the commit marker, forcing a full replay of
        // the batch against the already-committed main AND carry tables
        q.stop()
        val commits = new java.io.File(s"$ckpt/commits")
        val lastCommit = commits.listFiles().filter(_.getName.forall(_.isDigit))
          .maxBy(_.getName.toLong)
        val crc = new java.io.File(commits, s".${lastCommit.getName}.crc")
        assert(lastCommit.delete()); if (crc.exists()) crc.delete()
        q = start()
      }
    }
    q.processAllAvailable(); q.stop()
    graft.streaming.PipelineStream.flushPending(spark, table)
    manifestRows(graft.streaming.PipelineStream.manifest(spark, table))
  }

  test("near-ordered (block-shuffled) feed within the horizon: final manifest equals the batch DAG, through a mid-stream kill") {
    val rows = corpus
    // permute within blocks of 40 — a near-ordered ingest with bounded
    // displacement, the shape a real id-monotone feed actually has
    val shuffled = rows.grouped(40)
      .flatMap(b => b.sortBy { case (id, _) => (id * 2654435761L) % 104729 }).toSeq
    assert(shuffled != rows, "the shuffle must actually reorder")
    val horizon = maxDisplacement(shuffled)
    assert(horizon > 0)
    val slices = Seq(shuffled.take(7), shuffled.slice(7, shuffled.size / 3),
      shuffled.drop(shuffled.size / 3))
    val got = runShuffled(slices, horizon, killAfterSlice = Some(1))
    assert(got == batchManifest(rows), "shuffled stream != batch DAG")
    assert(got == manifestRows(SparkEntry.queries("pipeline_run")(spark, sfDir)),
      "shuffled stream != the registered batch pipeline_run")
  }

  test("fully-shuffled feed with an adequate horizon: the reorder buffer + terminal flush reproduce the batch pack") {
    val rows = corpus
    val shuffled = rows.sortBy { case (id, _) => (id * 40503L + 17) % 65521 }
    val horizon = maxDisplacement(shuffled)
    val third = shuffled.size / 3
    val got = runShuffled(
      Seq(shuffled.take(third), shuffled.slice(third, 2 * third), shuffled.drop(2 * third)),
      horizon, killAfterSlice = None)
    assert(got == batchManifest(rows), "fully-shuffled stream != batch DAG")
  }

  test("a document arriving beyond the horizon lands in the quarantine audit, never the pack; everything else keeps batch parity") {
    val rows = corpus.take(120)
    val holdout = rows(10)
    val onTime = rows.patch(10, Nil, 1)
    val (src, ckpt, table) = (tmp("plate_src"), tmp("plate_ckpt"), tmp("plate_tbl") + "/t")
    def feed(s: Seq[(Long, String)]): Unit =
      s.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    val q = graft.streaming.PipelineStream.curationStream(
      spark.readStream.schema("doc_id LONG, text STRING").parquet(src), table, ckpt,
      horizon = 8L)
    // batch 1: the in-order feed minus the holdout (displacement 0,
    // within any horizon); batch 2: the holdout alone, displaced far
    // past horizon=8 — its release slot passed in batch 1
    feed(onTime); q.processAllAvailable()
    feed(Seq(holdout)); q.processAllAvailable(); q.stop()
    graft.streaming.PipelineStream.flushPending(spark, table)

    // quarantine audit: exactly the holdout, with the routed reason and
    // the release threshold that was in force when it arrived
    val late = graft.streaming.PipelineStream.lateAudit(spark, table)
      .collect().map(r => (r.getLong(0), r.getString(4), r.getLong(3)))
    assert(late.toSeq == Seq((holdout._1, "beyond-horizon", onTime.map(_._1).max - 8L)),
      s"late audit: ${late.toSeq}")

    // the landed corpus equals the batch DAG over the ON-TIME rows —
    // the quarantined doc neither packed nor disturbed any keeper
    assert(manifestRows(graft.streaming.PipelineStream.manifest(spark, table)) ==
      batchManifest(onTime), "parity of the in-contract rows broke")

    // and the audit survives a terminal drain (idempotent flush)
    graft.streaming.PipelineStream.flushPending(spark, table)
    assert(graft.streaming.PipelineStream.lateAudit(spark, table).count() == 1)
  }

  test("the quarantine audit is per-document (r18 advice #3): late re-arrivals and late duplicates of landed docs do not re-audit") {
    val rows = corpus.take(120)
    val holdout = rows(10)
    val onTime = rows.patch(10, Nil, 1)
    val (src, ckpt, table) = (tmp("pldd_src"), tmp("pldd_ckpt"), tmp("pldd_tbl") + "/t")
    def feed(s: Seq[(Long, String)]): Unit =
      s.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    val q = graft.streaming.PipelineStream.curationStream(
      spark.readStream.schema("doc_id LONG, text STRING").parquet(src), table, ckpt,
      horizon = 8L)
    feed(onTime); q.processAllAvailable()
    // one batch carrying the holdout TWICE (same doc, same arrival
    // wave) plus a beyond-horizon duplicate of an already-LANDED text
    // under a fresh id — the landed duplicate would have anti-joined
    // away even on time, so it is not a lost document
    val landedDup = (onTime.head._1 - 1000L, onTime.head._2)
    feed(Seq(holdout, holdout, landedDup)); q.processAllAvailable()
    // and the SAME late document re-arriving in a later batch
    feed(Seq(holdout)); q.processAllAvailable(); q.stop()

    val late = graft.streaming.PipelineStream.lateAudit(spark, table)
      .collect().map(r => (r.getLong(0), r.getString(4)))
    assert(late.toSeq == Seq((holdout._1, "beyond-horizon")),
      s"audit must hold exactly one row for the one lost document: ${late.toSeq}")
    // in-contract parity is undisturbed by any of the late noise
    graft.streaming.PipelineStream.flushPending(spark, table)
    assert(manifestRows(graft.streaming.PipelineStream.manifest(spark, table)) ==
      batchManifest(onTime), "parity of the in-contract rows broke")
  }

  test("changing the horizon against an existing carry table fails loud") {
    val rows = corpus.take(60)
    val (src, ckpt, table) = (tmp("pfp_src"), tmp("pfp_ckpt"), tmp("pfp_tbl") + "/t")
    rows.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    val q = graft.streaming.PipelineStream.curationStream(
      spark.readStream.schema("doc_id LONG, text STRING").parquet(src), table, ckpt,
      horizon = 16L)
    q.processAllAvailable(); q.stop()
    val e = intercept[IllegalStateException] {
      graft.streaming.PipelineStream.curateBatch(
        rows.toDF("doc_id", "text"), table, batchId = 1L, horizon = 8L)
    }
    assert(e.getMessage.contains("horizon=16") && e.getMessage.contains("horizon=8"))
  }
}

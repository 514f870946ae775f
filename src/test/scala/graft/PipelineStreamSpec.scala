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
}

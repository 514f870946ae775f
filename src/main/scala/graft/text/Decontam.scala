package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Span-level decontamination core, shared by the batch query
  * (SparkEntry.textContaminateSpans) and the streaming twin
  * (EventsStream.spanDecontamStream): per document, how many 5-gram
  * windows exist, how many land in the held-out benchmark gram set, and
  * the longest consecutive contaminated run — the "cut the quoted span"
  * vs "drop the doc" signal.
  *
  * Scale shape: the benchmark gram set is BROADCAST (the corpus never
  * shuffles for membership) and every window/run computation is keyed
  * by doc_id — row-local per document — so the operator distributes
  * embarrassingly and, critically for the streaming twin, is closed
  * over any partition of the corpus into micro-batches: a document
  * never straddles batches, so per-batch outputs union to exactly the
  * batch answer regardless of arrival slicing (pinned by
  * StreamingSpec). Mirrors the reference's validate-then-load split
  * (ETL-pipeline-telecom validate.py) applied to corpus hygiene. */
object Decontam {

  /** 5-gram md5 window hashes per doc: (doc_id, pos, h). */
  def gramWindows(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ws = split(col(textCol), " ")
    val grams = when(size(ws) >= 5,
        transform(sequence(lit(1), size(ws) - 4),
          i => md5(array_join(slice(ws, i, lit(5)), " "))))
      .otherwise(array().cast("array<string>"))
    // 5-gram md5 hashing is the expensive map work — spread a
    // single-split scan before computing it (r19, guide §2.5)
    graft.operators.Spread.forCompute(docs)
      .select(col(idCol).as("doc_id"), posexplode(grams).as(Seq("pos", "h")))
  }

  /** Per-doc span statistics against a held-out gram frame `bench`
    * (one column `h`; broadcast): (doc_id, n_windows, n_contam,
    * max_run). */
  def spanStats(docs: DataFrame, bench: DataFrame,
                textCol: String, idCol: String): DataFrame = {
    // lazy checkpoint: both consumers (byDoc, runs) would otherwise
    // re-run the spread+gram-hash explode subtree (r19)
    val flagged = graft.operators.Checkpoints.stabilizeLazy(
      gramWindows(docs, textCol, idCol)
        .join(broadcast(bench.select(col("h")).withColumn("hit", lit(1))),
          Seq("h"), "left")
        .select(col("doc_id"), col("pos"), col("hit").isNotNull.as("c")))
    val byDoc = flagged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("c"), 1L).otherwise(0L)).as("n_contam"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = flagged.filter(col("c"))
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp")).agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id")).agg(max(col("run")).as("max_run"))
    byDoc.join(runs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_windows"), col("n_contam"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
  }
}

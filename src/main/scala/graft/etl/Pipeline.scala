package graft.etl

import org.apache.spark.sql.DataFrame

/** Composable ETL pipeline: extract → transforms → validate → load.
  * The whole chain is ONE lazy Catalyst plan until the final sink write
  * (stats jobs inside imputation excepted) — the engine-level equivalent
  * of the reference's extract.py → transform.py → validate.py → load.py
  * file handoff, without materializing intermediate copies.
  */
final case class Pipeline(stages: Seq[DataFrame => DataFrame] = Nil,
                          rules: Seq[Validate.Rule] = Nil) {
  def transform(f: DataFrame => DataFrame): Pipeline = copy(stages = stages :+ f)
  def validate(rs: Validate.Rule*): Pipeline = copy(rules = rules ++ rs)

  def apply(df: DataFrame): DataFrame = stages.foldLeft(df)((d, f) => f(d))

  /** Run transforms, gate on validation, then write. Returns the
    * validation report. Throws if validation fails (nothing is loaded).
    * The validation aggregate runs ONCE: the report is materialized,
    * the gate reads the collected rows, and the returned frame is built
    * from them — not a lazy plan that would re-scan on every action.
    *
    * With `reconcile` (default), the sink is re-read after the write and
    * its row count compared to the source's — the post-load check from
    * reference scripts/validate.py:75–80 that catches a short/partial
    * load the pre-write gate can't see. Sinks without a re-readable
    * snapshot (Append mode) skip it. */
  def run(df: DataFrame, sink: Load.Sink, reconcile: Boolean = true): DataFrame = {
    val out = apply(df)
    val spark = out.sparkSession
    val reportSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "rule STRING, metric BIGINT, passed BOOLEAN")
    if (rules.isEmpty) {
      sink.write(out)
      if (reconcile) Load.reconcile(out, sink)
      return spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        reportSchema)
    }
    val rows = Validate.run(out, rules).collect()
    if (rows.exists(r => !r.getBoolean(2)))
      throw new IllegalStateException("validation failed; load aborted")
    sink.write(out)
    if (reconcile) Load.reconcile(out, sink)
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), reportSchema)
  }
}

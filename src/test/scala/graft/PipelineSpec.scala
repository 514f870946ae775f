package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.etl._

/** The reference IS a pipeline, not a query pack (extract.py →
  * transform.py → validate.py → load.py): this spec runs both demo DAGs
  * END TO END through ONE [[graft.etl.Pipeline]] value each — the churn
  * CSV through extract → clean/impute → feature-engineer → validate →
  * load-with-reconcile, and the synthetic corpus through the
  * `pipeline_run` curation DAG (clean → features → quarantine → dedup →
  * gate → shard-pack → manifest) — and pins the invariants the staged
  * artifacts must satisfy. The corpus DAG's manifest digest itself is
  * hash-verified against DuckDB by the `pipeline_run` [q] key; here the
  * SEMANTICS are pinned (conservation, keeper choice, digest
  * sensitivity), the independent layer the oracle replay can't give. */
class PipelineSpec extends SparkSpec {

  val csvPath = "/root/reference/WA_Fn-UseC_-Telco-Customer-Churn.csv"

  test("churn CSV end to end: ONE Pipeline run stages, validates, loads, reconciles") {
    val out = java.nio.file.Files.createTempDirectory("pipe_churn").toString + "/staged"
    val pipe = Pipeline()
      .transform(df => Clean.coerceNumeric(df, Seq("TotalCharges")))
      .transform(df => Clean.imputeMedian(df, Seq("tenure", "MonthlyCharges", "TotalCharges")))
      .transform(df => df
        .withColumn("tenure_group", Features.bucketize(col("tenure"),
          Seq(-1.0, 12.0, 36.0, 60.0, Double.PositiveInfinity),
          Seq("New", "Regular", "Loyal", "Champion")))
        .withColumn("monthly_charge_segment", Features.segment3(col("MonthlyCharges"), 30, 70))
        .withColumn("is_multi_line_user", Features.yesFlag(col("MultipleLines")))
        .drop("customerID", "gender"))
      .validate(
        Validate.noNulls("tenure"), Validate.noNulls("MonthlyCharges"),
        Validate.noNulls("TotalCharges"), Validate.minRows(7000),
        Validate.domainComplete("tenure_group",
          Seq("New", "Regular", "Loyal", "Champion")))
    val report = pipe.run(Extract.csv(spark, csvPath), Load.ParquetSink(out))
    // the gate materialized one report row per rule, all green
    assert(report.count() == 5)
    assert(report.filter(!col("passed")).count() == 0)
    // the loaded artifact survives a re-read with the reference's shape
    val staged = spark.read.parquet(out)
    assert(staged.count() == 7043)
    assert(staged.columns.contains("tenure_group"))
    assert(staged.filter(col("TotalCharges").isNull).count() == 0)
  }

  test("churn CSV: a failing validation rule aborts the load") {
    val out = java.nio.file.Files.createTempDirectory("pipe_fail").toString + "/staged"
    val pipe = Pipeline()
      .transform(df => Clean.coerceNumeric(df, Seq("TotalCharges")))
      .validate(Validate.noNulls("TotalCharges")) // 11 blanks -> nulls -> FAIL
    intercept[IllegalStateException] {
      pipe.run(Extract.csv(spark, csvPath), Load.ParquetSink(out))
    }
    assert(!new java.io.File(out).exists(), "nothing may be loaded on a failed gate")
  }

  // ---- the pipeline_run curation DAG over the synthetic corpus ----

  private def corpus: DataFrame =
    Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))

  test("corpus DAG: conservation — every surviving doc is packed exactly once") {
    val m = SparkEntry.queries("pipeline_run")(spark, sfDir).collect()
    val nPacked = m.map(r => r.getLong(r.fieldIndex("n_docs"))).sum
    // replay the gates independently (plain column algebra, no Pipeline)
    val cleaned = corpus
      .select(col("doc_id"), regexp_replace(trim(col("text")), "\\s+", " ").as("text"))
      .withColumn("n_tokens",
        graft.text.TextFunctions.bpeTokenEstimate(col("text")).cast("long"))
      .withColumn("richness",
        size(array_distinct(split(col("text"), " "))).cast("double") /
          size(split(col("text"), " ")).cast("double"))
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .filter(col("n_tokens") >= 5 && col("n_tokens") <= 4096)
      .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("keeper"))
      .filter(col("richness") >= 0.3)
    assert(nPacked == cleaned.count(),
      "manifest doc count must equal the independently-replayed survivor count")
    // token mass is conserved into the shards
    val massIn = cleaned.agg(sum(col("n_tokens"))).head().getLong(0)
    val massOut = m.map(r => r.getLong(r.fieldIndex("sum_tokens"))).sum
    assert(massIn == massOut, "token mass must be conserved into the manifest")
    // all 8 shards participate at test scale and bins respect the budget
    assert(m.length == 8)
  }

  test("corpus DAG: dedup keeps the LOWEST doc_id per content hash") {
    import spark.implicits._
    // plant an exact duplicate pair and a near-miss (differs by one char)
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"), // dup of 10, lower id
      (7L, "alpha beta gamma delta epsilon zet")   // near-miss, survives
    ).toDF("doc_id", "text")
    val kept = docs
      .select(col("doc_id"), regexp_replace(trim(col("text")), "\\s+", " ").as("text"))
      .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("keeper"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 7L), s"expected keeper {3, 7}, got $kept")
  }

  test("corpus DAG: the manifest digest detects a single-document change") {
    import spark.implicits._
    def digestOf(df: DataFrame): Map[Int, String] = {
      def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
      val h48 = (2 to 12).map(nib)
        .foldLeft(s"CAST(${nib(1)} AS BIGINT)")((a, b) => s"($a * 16 + $b)")
      graft.text.Packing.packBins(df, "doc_id", "n_tokens", budget = 2048L, shards = 8)
        .withColumn("h", md5(concat_ws("|", col("doc_id"), col("bin"))))
        .selectExpr("shard", s"CAST($h48 AS BIGINT) AS hv")
        .groupBy(col("shard"))
        .agg(sum(col("hv").cast("decimal(38,0)")).cast("decimal(38,0)")
          .cast("string").as("digest"))
        .as[(Int, String)].collect().toMap
    }
    val base = (1L to 200L).map(i => (i, 10L + i % 7)).toDF("doc_id", "n_tokens")
    val d0 = digestOf(base)
    // dropping ONE document must shift at least its shard's digest
    val d1 = digestOf(base.filter(col("doc_id") =!= 57L))
    assert(d0 != d1, "a dropped document must change the manifest digest")
    // and the digest is layout-independent: a different partitioning
    // of the same rows produces the identical manifest
    val d2 = digestOf(base.repartition(13))
    assert(d0 == d2, "the digest must be order/partitioning-invariant")
  }
}

package graft.analytics

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The reference notebook's full report set (etl_analysis.ipynb cells
  * 8-9): given the staged churn frame, produce the five processed
  * artifacts — summary, avg-by-contract, tenure counts, internet
  * distribution, churn×tenure pivot — through the engine's operators.
  * A reference user points this at their staged table and gets the
  * same data/processed/ directory, computed distributed.
  */
object ChurnReport {

  /** churn×tenure pivot with totals and rate (ipynb cell 8:
    * pivot_churn_tenure.csv: not_churned/churned counts, total,
    * churn_rate_pct rounded to 3). */
  def pivotChurnTenure(staged: DataFrame, tenureCol: String = "tenure_group",
                       churnFlag: String = "churn_flag"): DataFrame =
    staged.groupBy(col(tenureCol))
      .agg(
        sum((col(churnFlag) === 0).cast("long")).as("not_churned_count"),
        sum((col(churnFlag) === 1).cast("long")).as("churned_count"),
        count(lit(1)).as("total"))
      .withColumn("churn_rate_pct",
        round(col("churned_count") * lit(100.0) / col("total"), 3))
      .orderBy(col(tenureCol))

  final case class Artifacts(summary: DataFrame, avgByContract: DataFrame,
                             tenureCounts: DataFrame, internetDist: DataFrame,
                             pivot: DataFrame)

  def build(staged: DataFrame): Artifacts = {
    val withFlag = staged.withColumn("churn_flag",
      (graft.etl.Clean.normalized(col("Churn")).isin("yes", "y", "true", "1")).cast("int"))
    Artifacts(
      summary = Summary.summaryStats(withFlag, col("churn_flag") === 1),
      avgByContract = Summary.avgByGroup(withFlag, "Contract", "MonthlyCharges"),
      tenureCounts = withFlag.groupBy(col("tenure_group"))
        .agg(count(lit(1)).as("count")).orderBy(col("count").desc),
      internetDist = Summary.valueCountsPct(withFlag, "InternetService"),
      pivot = pivotChurnTenure(withFlag))
  }

  /** Write all artifacts as single-file CSVs under `outDir` (the
    * reference's data/processed layout). */
  def write(a: Artifacts, outDir: String): Unit = {
    def w(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("header", "true").csv(s"$outDir/$name")
    w(a.summary, "analysis_summary")
    w(a.avgByContract, "avg_monthly_by_contract")
    w(a.tenureCounts, "tenure_group_counts")
    w(a.internetDist, "internet_service_distribution")
    w(a.pivot, "pivot_churn_tenure")
  }
}

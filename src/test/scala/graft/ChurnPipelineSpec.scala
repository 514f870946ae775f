package graft

import org.apache.spark.sql.functions._
import graft.etl._

/** End-to-end parity with the reference pipeline on its own dataset
  * (reference: scripts/transform.py + validate.py over the Telco churn
  * CSV). A user of the reference should get the same staged table and
  * the same validation verdicts from this engine.
  */
class ChurnPipelineSpec extends SparkSpec {
  import spark.implicits._

  val csvPath = "/root/reference/WA_Fn-UseC_-Telco-Customer-Churn.csv"

  lazy val staged = {
    val raw = Extract.csv(spark, csvPath)
    val coerced = Clean.coerceNumeric(raw, Seq("TotalCharges"))
    val imputed = Clean.imputeMedian(coerced, Seq("tenure", "MonthlyCharges", "TotalCharges"))
    imputed
      .withColumn("tenure_group", Features.bucketize(col("tenure"),
        Seq(-1.0, 12.0, 36.0, 60.0, Double.PositiveInfinity),
        Seq("New", "Regular", "Loyal", "Champion")))
      .withColumn("monthly_charge_segment", Features.segment3(col("MonthlyCharges"), 30, 70))
      .withColumn("has_internet_service", Features.memberFlag(col("InternetService"),
        Seq("dsl", "fiber optic", "fiberoptic", "fiber")))
      .withColumn("is_multi_line_user", Features.yesFlag(col("MultipleLines")))
      .withColumn("contract_type_code", Features.codeMap(col("Contract"),
        Map("month-to-month" -> 0, "one year" -> 1, "two year" -> 2)))
      .drop("customerID", "gender")
  }

  test("row count matches the reference dataset") {
    assert(staged.count() == 7043)
  }

  test("reference validation rules all pass (validate.py checks)") {
    assert(Validate.allPassed(staged, Seq(
      Validate.noNulls("tenure"), Validate.noNulls("MonthlyCharges"),
      Validate.noNulls("TotalCharges"),
      Validate.domainComplete("tenure_group", Seq("New", "Regular", "Loyal", "Champion")),
      Validate.domainComplete("monthly_charge_segment", Seq("Low", "Medium", "High")),
      Validate.domainSubset("contract_type_code", Seq(0, 1, 2)))))
  }

  test("TotalCharges: 11 blanks coerced and median-imputed") {
    val raw = Extract.csv(spark, csvPath)
    val coerced = Clean.coerceNumeric(raw, Seq("TotalCharges"))
    assert(coerced.filter(col("TotalCharges").isNull).count() == 11)
    assert(staged.filter(col("TotalCharges").isNull).count() == 0)
  }

  test("churn rate matches the published dataset (26.54%)") {
    val rate = staged.agg(
      (sum((col("Churn") === "Yes").cast("long")) * 100.0 / count(lit(1))))
      .as[Double].head()
    assert(math.abs(rate - 26.54) < 0.01)
  }

  test("ChurnReport reproduces the reference's processed artifact set") {
    val a = graft.analytics.ChurnReport.build(staged)
    // summary: 3 metric rows, churn pct matches the dataset
    val summ = a.summary.as[(String, Double)].collect().toMap
    assert(summ("total_rows") == 7043.0)
    assert(math.abs(summ("flag_percentage") - 26.54) < 0.01)
    // avg by contract has the reference's three contract types
    assert(a.avgByContract.count() == 3)
    // tenure counts cover all four groups and sum to the row count
    val tc = a.tenureCounts.as[(String, Long)].collect().toMap
    assert(tc.keySet == Set("New", "Regular", "Loyal", "Champion"))
    assert(tc.values.sum == 7043L)
    // pivot: counts reconcile and rate formula holds
    val p = a.pivot.select("not_churned_count", "churned_count", "total", "churn_rate_pct")
      .as[(Long, Long, Long, Double)].collect()
    assert(p.forall { case (n0, n1, t, r) =>
      n0 + n1 == t && math.abs(r - math.round(n1 * 100000.0 / t) / 1000.0) < 1e-9 })
    // writes land as the five csv artifacts
    val tmp = java.nio.file.Files.createTempDirectory("churn_report").toString
    graft.analytics.ChurnReport.write(a, tmp)
    val names = new java.io.File(tmp).listFiles().map(_.getName).toSet
    assert(names == Set("analysis_summary", "avg_monthly_by_contract",
      "tenure_group_counts", "internet_service_distribution", "pivot_churn_tenure"))
  }

  test("engineered features have the reference's distributions") {
    val byContract = staged.groupBy("contract_type_code").count()
      .as[(Int, Long)].collect().toMap
    assert(byContract.keySet == Set(0, 1, 2))
    assert(byContract(0) > byContract(1) && byContract(0) > byContract(2))
    val flags = staged.agg(sum($"has_internet_service"), sum($"is_multi_line_user"))
      .as[(Long, Long)].head()
    assert(flags._1 == 5517) // DSL + Fiber optic customers
    assert(flags._2 == 2971) // MultipleLines == Yes
  }
}

package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Analytic query shapes from the reference notebook
  * (reference: etl_analysis.ipynb cells 8-10): value counts with pct,
  * rate-by-group, avg-by-group, crosstab pivot, histogram, and the
  * one-metric-per-row summary. All single-shuffle groupBy plans with
  * map-side partial aggregation.
  */
object Summary {

  /** Value counts + percentage distribution (ipynb cell 8,
    * `internet_service_distribution`). NULLs bucket as `nullLabel`.
    * The pct denominator re-aggregates the (small) counts result and
    * joins back as a broadcast scalar — no second scan of the input,
    * and no single-partition global window even when the column has
    * enormous cardinality. */
  def valueCountsPct(df: DataFrame, c: String, nullLabel: String = "UNKNOWN"): DataFrame = {
    val counts = df
      .groupBy(coalesce(col(c).cast("string"), lit(nullLabel)).as(c))
      .agg(count(lit(1)).as("count"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("count")).as("_total"))))
      .withColumn("pct", round(col("count") * lit(100.0) / col("_total"), 2))
      .drop("_total")
      .orderBy(col("count").desc, col(c))
  }

  /** Mean of a 0/1 flag per group — churn-rate-by-group (ipynb cell 10). */
  def rateByGroup(df: DataFrame, group: String, flag: Column): DataFrame =
    df.groupBy(col(group))
      .agg((sum(flag.cast("long")) / count(lit(1))).as("rate"))
      .orderBy(col(group))

  /** avg(measure) by category (ipynb cell 8, `avg_monthly_by_contract`).
    * Sums as DECIMAL for order-independent (hash-stable) results. */
  def avgByGroup(df: DataFrame, group: String, measure: String): DataFrame =
    df.groupBy(col(group))
      .agg((sum(col(measure).cast("decimal(20,4)")).cast("double") / count(col(measure)))
        .as(s"avg_$measure"))
      .orderBy(col(group))

  /** Crosstab pivot via conditional aggregation (ipynb cell 8,
    * `pivot_churn_tenure`): one shuffle, no per-distinct-value scan. */
  def crosstab(df: DataFrame, rowCol: String, colCol: String, values: Seq[String]): DataFrame = {
    val aggs = values.map(v =>
      sum((col(colCol) === lit(v)).cast("long")).as(s"${v.toLowerCase}_count"))
    df.groupBy(col(rowCol)).agg(aggs.head, aggs.tail: _*).orderBy(col(rowCol))
  }

  /** Fixed-width histogram (ipynb cell 10, TotalCharges hist): floor
    * arithmetic, single shuffle. Bucket i covers [lo + i*w, lo + (i+1)*w). */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double, buckets: Int): DataFrame = {
    val w = (hi - lo) / buckets
    val b = least(greatest(floor((col(c) - lit(lo)) / lit(w)), lit(0)), lit(buckets - 1))
    df.filter(col(c).isNotNull)
      .groupBy(b.cast("int").as("bucket"))
      .agg(count(lit(1)).as("count"))
      .withColumn("lo", lit(lo) + col("bucket") * lit(w))
      .select("bucket", "lo", "count")
      .orderBy("bucket")
  }

  /** One-metric-per-row summary (ipynb cell 9): total rows, exact-distinct
    * rows, rate of a flag — all three from ONE aggregate job (the
    * distinct count is a count_distinct over a struct of every column,
    * planned as an Expand + two-phase hash aggregate). The rate
    * coalesces to 0.0 on an empty input instead of NPE-ing. */
  def summaryStats(df: DataFrame, flag: Column): DataFrame = {
    val row = df.agg(
      count(lit(1)).as("total"),
      count_distinct(struct(df.columns.map(col): _*)).as("uniq"),
      coalesce(sum(flag.cast("long")) * lit(100.0) / count(lit(1)), lit(0.0)).as("rate")
    ).head()
    val spark = df.sparkSession
    import spark.implicits._
    Seq(
      ("total_rows", row.getLong(0).toDouble),
      ("unique_rows", row.getLong(1).toDouble),
      ("flag_percentage", row.getDouble(2))
    ).toDF("metric", "value")
  }
}

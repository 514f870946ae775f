package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group z-score outlier report: group mean/stddev from EXACT
  * decimal power sums (order-independent, bit-stable across partition
  * orders — same convention as SparkEntry.moneySum / anStatsMoments),
  * then each row's z-score against its group.
  *
  * One shuffle on the group key (the aggregate), one broadcast-size
  * join back (group cardinality rows) — no window over raw rows, so
  * skewed groups don't serialize a per-group sort.
  */
object Outliers {

  /** @return one row per group: n, mean, stddev, n_outliers (|z| > zTau),
    *         max |z| — all engine-portable doubles (rounded once). */
  def zScoreReport(df: DataFrame, group: String, measure: String,
                   zTau: Double): DataFrame = {
    def dsum(c: Column) = sum(c.cast("decimal(38,8)")).cast("double")
    val x = col(measure)
    val stats = df.groupBy(col(group)).agg(
      count(lit(1)).as("n"),
      dsum(x).as("sx"),
      dsum(x * x).as("sxx"))
      .withColumn("mean", col("sx") / col("n"))
      .withColumn("stddev",
        sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)))
    val z = (x - col("mean")) / col("stddev")
    df.join(broadcast(stats), group)
      .select(col(group), col("n"), col("mean"), col("stddev"), z.as("z"))
      .groupBy(col(group))
      .agg(
        max(col("n")).as("n"),
        round(max(col("mean")), 6).as("mean"),
        round(max(col("stddev")), 6).as("stddev"),
        sum((abs(col("z")) > zTau).cast("long")).as("n_outliers"),
        round(max(abs(col("z"))), 6).as("max_abs_z"))
      .orderBy(col(group))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling: membership is a pure
  * function of a key's md5, so the same rows are selected on every
  * engine, every run, at any parallelism — unlike `df.sample`, whose
  * output depends on partitioning. The standard trick for reproducible
  * holdout splits across a data pipeline.
  */
object Sampling {

  /** Keep rows whose md5(key) first hex digit falls below the rate
    * threshold (rate16 of 16ths, e.g. 4 → 25%). */
  def hashSample(df: DataFrame, keyCol: Column, rate16: Int): DataFrame = {
    require(rate16 >= 0 && rate16 <= 16)
    val bound = "0123456789abcdefg".charAt(rate16).toString
    df.filter(substring(md5(keyCol.cast("string")), 1, 1) < lit(bound))
  }

  /** Stratified deterministic sample: exactly min(n, |group|) rows per
    * group, chosen by md5(key) order (key tie-break) — a reproducible
    * per-stratum holdout regardless of partitioning or engine. One
    * shuffle on the group column; the window never sorts more than a
    * group's rows. */
  def stratified(df: DataFrame, groupCol: Column, keyCol: Column, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol)
      .orderBy(md5(keyCol.cast("string")), keyCol)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .drop("_rn")
  }
}

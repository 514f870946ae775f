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

  /** Weighted sample without replacement, k rows, P(i in sample) ∝
    * weight — A-Res priority sampling (Efraimidis & Spirakis, IPL'06):
    * the top k rows by u_i^(1/w_i) with u_i uniform are exactly a
    * weight-proportional draw. Deterministic like everything above:
    * u = (temperedHash(key)+1)/2^31 (exact in double — power-of-two
    * divisor), so the same sample falls out on every engine and run.
    * Returns (id, priority) — join back to the source for payload
    * columns, keeping the aggregate's shuffle k-bounded.
    *
    * Scale shape: the top-k runs through [[graft.functions
    * .TopKAggregate]] — O(k) buffer per task, combined map-side, so a
    * 100 TB scan shuffles k survivors per task rather than globally
    * sorting the population by priority. */
  def weightedSample(df: DataFrame, keyCol: Column, weightCol: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pri = df
      .select(keyCol.cast("long").as("id"), weightCol.cast("double").as("w"))
      .withColumn("u",
        (graft.functions.Sketches.temperedHash(col("id")) + 1).cast("double")
          / lit(2147483648.0))
      .select(pow(col("u"), lit(1.0) / col("w")).as("p"), col("id"))
      .as[(Double, Long)]
    pri.select(new graft.functions.TopKAggregate(k).toColumn.name("top"))
      .select(explode(col("top")).as("t"))
      .select(col("t._2").as("id"), col("t._1").as("priority"))
  }
}

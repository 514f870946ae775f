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
}

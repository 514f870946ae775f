package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Typed extract stage (reference: scripts/extract.py — pandas read_csv to a
  * raw staging dir). Spark-native: schema'd, splittable, pushdown-capable
  * readers; no staging copy is needed because the scan itself is the stage.
  */
object Extract {

  /** CSV with header; explicit schema if given (at scale, never infer —
    * inference is an extra full scan). PERMISSIVE mode keeps malformed rows
    * as NULLs, matching the reference's errors="coerce" posture. */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
          header: Boolean = true): DataFrame = {
    val r = spark.read
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def json(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("mode", "PERMISSIVE")
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).json(path)
  }
}

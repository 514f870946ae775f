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

  /** Parquet read across schema-evolved file generations: mergeSchema
    * unions every footer's schema (added columns read as NULL in older
    * files) instead of trusting one random file's schema — the
    * standard posture for a long-lived landing dir whose producer
    * gained columns over time. Merge cost is one footer per file at
    * planning, not a data scan; keep it OFF (the default read) for
    * single-generation tables where footers agree. */
  def parquetEvolved(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(paths: _*)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def json(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("mode", "PERMISSIVE")
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).json(path)
  }

  /** JDBC extract with partitioned parallel reads (the reverse of
    * Load.JdbcSink): `partitionColumn`+bounds split the table into
    * `numPartitions` range scans so a large table streams through many
    * executors instead of one connection. */
  def jdbc(spark: SparkSession, url: String, table: String,
           partitionColumn: String, lowerBound: Long, upperBound: Long,
           numPartitions: Int = 8,
           properties: java.util.Properties = new java.util.Properties()): DataFrame =
    spark.read.jdbc(url, table, partitionColumn, lowerBound, upperBound,
      numPartitions, properties)
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver's star schema (see TESTDATA.md).
  *
  * Plain parquet scans — Catalyst pushes filters/projections into the
  * scan, so callers should NOT cache or materialize here; every query
  * composes lazily on top of these.
  */
object Tables {
  /** Metamorphic-sweep perturbation hook (graft.Metamorphic): when > 0,
    * every source scan is forced through a round-robin repartition to
    * this many partitions, so a query's result can be checked for
    * partition-layout independence — the property the engine's
    * decimal-gather and order-statistic contracts claim. 0 (the
    * default, and the only value outside the sweep) is a no-op. */
  @volatile private[graft] var perturbParts: Int = 0

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = bare(spark, dir, name)
    if (perturbParts > 0) df.repartition(perturbParts) else df
  }

  /** Bare scan, NEVER perturbed — only for metadata-only sizing counts
    * (sim_semantic_dedup's nCells) where an injected repartition would
    * turn a footer-stats count into a data read. Row count is layout-
    * independent, so the metamorphic contract is unaffected. */
  private[graft] def bare(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** events.ts has shipped in two physical forms across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects — read nanos as long and truncate to micros, exactly
    * what DuckDB does on the same file) and plain TIMESTAMP(MICROS)
    * (read natively as TIMESTAMP_NTZ). Branch on the actual read type so
    * both land as a session-UTC TIMESTAMP with identical micros, keeping
    * every downstream query and the DuckDB oracle representation-stable.
    *
    * The legacy conf is scoped to a cloned session (`newSession`: same
    * SparkContext, private SQLConf) instead of mutating the caller's
    * session — a later parquet read of a nanos column elsewhere in the
    * caller's session still fails fast. The scan relation captures the
    * clone, so execution under any driving session keeps the setting. */
  def events(s: SparkSession, d: String): DataFrame = {
    val scoped = s.newSession()
    scoped.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t(scoped, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // nanos-as-long generation
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => // native micros generation: NTZ -> LTZ is value-identical under UTC
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

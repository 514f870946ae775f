package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cleaning / imputation operators.
  *
  * Capability parity with the reference's transform step
  * (reference: scripts/transform.py:21-33 — `pd.to_numeric(errors="coerce")`,
  * median fill for numerics, constant "Unknown" fill for categoricals) —
  * re-expressed as declarative Spark plans:
  *
  *   - coercion is a codegen'd `try_cast` (no Python-style row loop);
  *   - the median is computed distributed via exact `percentile` (a single
  *     aggregate job), then spliced into the plan as a literal through
  *     `coalesce` — one pass to compute stats, one streaming pass to apply,
  *     which is the standard two-phase shape at 100 TB;
  *   - for pipelines that cannot afford an exact percentile at scale,
  *     `imputeApproxMedian` uses `percentile_approx` (t-digest, single
  *     mergeable aggregate).
  */
object Clean {

  /** "errors=coerce" numeric coercion: unparsable strings become NULL. */
  def coerceNumeric(df: DataFrame, cols: Seq[String], to: DataType = DoubleType): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, expr(s"try_cast(`$c` AS ${to.sql})")))

  private def medians(df: DataFrame, cols: Seq[String], exact: Boolean): Map[String, Double] = {
    val aggs = cols.map { c =>
      val e = if (exact) percentile(col(c), lit(0.5)) else percentile_approx(col(c), lit(0.5), lit(10000))
      e.cast(DoubleType).as(c)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) => c -> (if (row.isNullAt(i)) 0.0 else row.getDouble(i)) }.toMap
  }

  /** Median-impute numeric columns (exact percentile; interpolated, matching
    * pandas/DuckDB median semantics). One stats job + one apply pass. */
  def imputeMedian(df: DataFrame, cols: Seq[String]): DataFrame = {
    val m = medians(df, cols, exact = true)
    cols.foldLeft(df)((d, c) => d.withColumn(c, coalesce(col(c), lit(m(c)))))
  }

  /** Approximate-median impute for very large inputs (mergeable sketch). */
  def imputeApproxMedian(df: DataFrame, cols: Seq[String]): DataFrame = {
    val m = medians(df, cols, exact = false)
    cols.foldLeft(df)((d, c) => d.withColumn(c, coalesce(col(c), lit(m(c)))))
  }

  /** Mean-impute numeric columns. */
  def imputeMean(df: DataFrame, cols: Seq[String]): DataFrame = {
    val row = df.agg(avg(col(cols.head)).as(cols.head),
      cols.tail.map(c => avg(col(c)).as(c)): _*).head()
    val m = cols.zipWithIndex.map { case (c, i) => c -> (if (row.isNullAt(i)) 0.0 else row.getDouble(i)) }.toMap
    cols.foldLeft(df)((d, c) => d.withColumn(c, coalesce(col(c), lit(m(c)))))
  }

  /** Constant-fill NULLs in categorical columns (reference fills "Unknown"). */
  def fillConstant(df: DataFrame, cols: Seq[String], value: String = "Unknown"): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, coalesce(col(c), lit(value))))

  /** Trim + lowercase normalization used before flag/code mapping
    * (reference: scripts/transform.py:46-64). */
  def normalized(c: Column): Column = lower(trim(c))
}

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
  *   - the exact median runs on DISTINCT-value counts through the
  *     `operators.PrefixSum` scan (rank probes + the same lo+(hi−lo)·½
  *     interpolation as `percentile`/`quantile_cont`), then splices into
  *     the plan as a literal through `coalesce` — one stats pass, one
  *     streaming apply pass, and the aggregate state is distributed
  *     distinct values, never a per-aggregator value→count buffer (the
  *     memory cliff an exact `percentile` hits on a continuous column);
  *   - for pipelines where even distinct values are too many,
  *     `imputeApproxMedian` uses `percentile_approx` (t-digest, single
  *     mergeable aggregate).
  */
object Clean {

  /** "errors=coerce" numeric coercion: unparsable strings become NULL. */
  def coerceNumeric(df: DataFrame, cols: Seq[String], to: DataType = DoubleType): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, expr(s"try_cast(`$c` AS ${to.sql})")))

  /** Interpolated exact median of one column from distinct-value counts
    * + a PrefixSum rank scan: value at rank ⌊(n−1)/2⌋+1, interpolated
    * halfway to the next distinct crossing when n is even — the same
    * lo+(hi−lo)·frac arithmetic `percentile`/`quantile_cont` use, so
    * the spliced literal is bit-identical to theirs. */
  private def medianDistributed(df: DataFrame, c: String): Double = {
    val perV = df.select(col(c).cast(DoubleType).as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val nRow = perV.agg(sum(col("cnt"))).head()
    if (nRow.isNullAt(0) || nRow.getLong(0) == 0L) return 0.0
    val n = nRow.getLong(0)
    val rLo = (n - 1) / 2 + 1
    val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt"))
    val hitLo = col("cnt_cum") >= rLo && col("cnt_cum") - col("cnt") < rLo
    val hitHi = col("cnt_cum") >= rLo + 1 && col("cnt_cum") - col("cnt") < rLo + 1
    val row = scan.filter(hitLo || hitHi)
      .agg(max(when(hitLo, col("v"))).as("lo"), max(when(hitHi, col("v"))).as("hi"))
      .head()
    val lo = row.getDouble(0)
    if (n % 2 == 1) lo else lo + (row.getDouble(1) - lo) * 0.5
  }

  private def medians(df: DataFrame, cols: Seq[String], exact: Boolean): Map[String, Double] = {
    if (exact) return cols.map(c => c -> medianDistributed(df, c)).toMap
    val aggs = cols.map { c =>
      percentile_approx(col(c), lit(0.5), lit(10000)).cast(DoubleType).as(c)
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

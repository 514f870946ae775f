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

  /** Interpolated exact medians of ALL columns in ONE input pass: melt
    * to (column, value), aggregate to distinct-value counts, then a
    * single PrefixSum rank scan ordered by (column, value) — the global
    * running total minus each column's exclusive offset is that
    * column's within-column rank. Value at rank ⌊(n−1)/2⌋+1,
    * interpolated halfway to the next distinct crossing when n is
    * even — the same lo+(hi−lo)·frac arithmetic
    * `percentile`/`quantile_cont` use, so the spliced literals are
    * bit-identical to theirs. Columns with no non-null rows map to 0.0
    * (the constant-fill fallback). */
  private def mediansDistributed(df: DataFrame, cols: Seq[String]): Map[String, Double] = {
    val melted = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("c"), col(c).cast(DoubleType).as("v"))): _*)).as("p"))
      .select(col("p.c").as("c"), col("p.v").as("v"))
      .filter(col("v").isNotNull)
    val perV = melted.groupBy(col("c"), col("v")).agg(count(lit(1)).as("cnt"))
    val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("c", "v"), Seq("cnt"))
    // per-column totals re-walk the scan's cached sorted input — one job,
    // driver-sized result (one row per column)
    val totals = scan.groupBy(col("c")).agg(sum(col("cnt")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    if (totals.isEmpty) return cols.map(_ -> 0.0).toMap
    // exclusive prefix offsets in the scan's own (c ascending) order
    var acc = 0L
    val offs = totals.keys.toSeq.sorted.map { c =>
      val o = c -> acc; acc += totals(c); o
    }.toMap
    def perCol(m: Map[String, Long]): Column =
      m.foldLeft(lit(0L))((e, kv) => when(col("c") === kv._1, kv._2).otherwise(e))
    val rLos = totals.map { case (c, n) => c -> ((n - 1) / 2 + 1) }
    val lc = col("cnt_cum") - perCol(offs)
    val rLo = perCol(rLos)
    val hitLo = lc >= rLo && lc - col("cnt") < rLo
    val hitHi = lc >= rLo + 1 && lc - col("cnt") < rLo + 1
    val found = scan.filter(hitLo || hitHi)
      .groupBy(col("c"))
      .agg(max(when(hitLo, col("v"))).as("lo"), max(when(hitHi, col("v"))).as("hi"))
      .collect().map { r =>
        val c = r.getString(0); val lo = r.getDouble(1)
        c -> (if (totals(c) % 2 == 1) lo else lo + (r.getDouble(2) - lo) * 0.5)
      }.toMap
    cols.map(c => c -> found.getOrElse(c, 0.0)).toMap
  }

  private def medians(df: DataFrame, cols: Seq[String], exact: Boolean): Map[String, Double] = {
    if (exact) return mediansDistributed(df, cols)
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

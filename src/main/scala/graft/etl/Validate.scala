package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based validation (reference: scripts/validate.py).
  *
  * Each rule is an aggregate expression over the whole frame; `run`
  * evaluates ALL rules in a single distributed aggregate job (one scan,
  * map-side partial aggregation) and returns one row per rule —
  * the Spark-native version of the reference's sequential pandas checks
  * (no-null required columns: validate.py:66-72; categorical-domain
  * completeness: validate.py:95-117; row counts: validate.py:75-80).
  */
object Validate {

  final case class Rule(name: String, metric: Column, passed: Column)

  /** Required columns contain no NULLs. */
  def noNulls(c: String): Rule = {
    val nulls = sum(col(c).isNull.cast("long"))
    Rule(s"no_nulls_$c", nulls, nulls === lit(0L))
  }

  /** Row count is at least `min`. */
  def minRows(min: Long): Rule = {
    val n = count(lit(1))
    Rule("row_count", n, n >= lit(min))
  }

  /** Every expected category value occurs at least once. */
  def domainComplete(c: String, expected: Seq[String]): Rule = {
    val seen = size(collect_set(when(col(c).isin(expected: _*), col(c))))
    Rule(s"domain_complete_$c", seen.cast("long"), seen === lit(expected.size))
  }

  /** Observed values are a subset of the allowed domain. */
  def domainSubset(c: String, allowed: Seq[Any]): Rule = {
    val bad = sum((!col(c).isin(allowed: _*) && col(c).isNotNull).cast("long"))
    Rule(s"domain_subset_$c", bad, bad === lit(0L))
  }

  /** Values fall within [lo, hi]. */
  def inRange(c: String, lo: Double, hi: Double): Rule = {
    val bad = sum((col(c) < lit(lo) || col(c) > lit(hi)).cast("long"))
    Rule(s"in_range_$c", bad, bad === lit(0L))
  }

  /** Column is a unique key (duplicate count is the metric). */
  def uniqueKey(c: String): Rule = {
    val dups = count(lit(1)) - count_distinct(col(c))
    Rule(s"unique_key_$c", dups, dups === lit(0L))
  }

  /** Referential integrity: fk values of `child` all exist in `parent`'s
    * pk. Not a single-frame Rule — a broadcast-friendly anti-join count
    * (at dim-scale parents Catalyst broadcasts; fact-fact FKs shuffle on
    * the key only). Returns the same (rule, metric, passed) shape. */
  def refIntegrity(child: DataFrame, fk: String,
                   parent: DataFrame, pk: String): DataFrame = {
    val orphans = child.select(col(fk)).filter(col(fk).isNotNull)
      .join(parent.select(col(pk)), col(fk) === col(pk), "left_anti")
    orphans.agg(count(lit(1)).as("orphans"))
      .select(lit(s"ref_integrity_${fk}_to_$pk").as("rule"),
        col("orphans").cast("long").as("metric"),
        (col("orphans") === 0L).as("passed"))
  }

  /** Evaluate all rules in ONE aggregate pass; returns
    * (rule string, metric long, passed boolean) rows. Internal aliases
    * are positional so duplicate rule names can't collide. */
  def run(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val aggs = rules.zipWithIndex.flatMap { case (r, i) =>
      Seq(r.metric.cast("long").as(s"m_$i"), r.passed.as(s"p_$i")) }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // Pivot the single wide row into (rule, metric, passed) — stack is a
    // driver-free transpose of an already-aggregated 1-row frame.
    val stacked = rules.zipWithIndex.map { case (r, i) =>
      s"'${r.name}', m_$i, p_$i" }.mkString(", ")
    one.selectExpr(
      s"stack(${rules.size}, $stacked) as (rule, metric, passed)")
  }

  /** True iff every rule passed (drives pipeline gating, cf. validate.py
    * summary block). */
  def allPassed(df: DataFrame, rules: Seq[Rule]): Boolean =
    run(df, rules).agg(min(col("passed"))).head().getBoolean(0)

  /** ROW-level quarantine split — the operational side of validation:
    * `run` grades the table, this routes the rows. Each rule is
    * (name, is-bad predicate); rows failing none go to the clean stream
    * unchanged, rows failing any go to quarantine with a `__reasons`
    * array naming every rule they tripped (so a fix-and-replay knows
    * why each row was held). One row-local projection, no shuffle —
    * both streams stay lazily composable onto the caller's sinks. */
  def quarantine(df: DataFrame,
                 rules: Seq[(String, Column)]): (DataFrame, DataFrame) = {
    val reasons = array_compact(array(rules.map { case (n, bad) =>
      when(bad, lit(n)) }: _*))
    val tagged = df.withColumn("__reasons", reasons)
    (tagged.filter(size(col("__reasons")) === 0).drop("__reasons"),
      tagged.filter(size(col("__reasons")) > 0))
  }
}

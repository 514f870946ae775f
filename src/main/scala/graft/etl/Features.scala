package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Feature-engineering operators (reference: scripts/transform.py:36-69).
  *
  * All pure `Column` expressions — fully codegen'd, no UDFs, so they stay
  * inside whole-stage codegen and cost one projection at any scale.
  */
object Features {

  /** Labeled binning, pandas `pd.cut` semantics: bin i covers
    * (edges(i), edges(i+1)] — left-open, right-closed
    * (reference: scripts/transform.py:40-42, `tenure_group`).
    * NULL input → NULL label.
    */
  def bucketize(c: Column, edges: Seq[Double], labels: Seq[String]): Column = {
    require(labels.size == edges.size - 1, "need one label per bin")
    val cases = labels.zipWithIndex.map { case (lab, i) =>
      val lo = edges(i); val hi = edges(i + 1)
      val cond =
        if (hi.isPosInfinity) c > lit(lo)
        else c > lit(lo) && c <= lit(hi)
      (cond, lit(lab))
    }
    cases.tail.foldLeft(when(cases.head._1, cases.head._2)) {
      case (acc, (cond, v)) => acc.when(cond, v)
    }
  }

  /** Three-way threshold segmentation
    * (reference: scripts/transform.py:45-48, `monthly_charge_segment`:
    * < lo → "Low", <= hi → "Medium", else "High"). */
  def segment3(c: Column, lo: Double, hi: Double,
               labels: (String, String, String) = ("Low", "Medium", "High")): Column =
    when(c < lit(lo), lit(labels._1))
      .when(c <= lit(hi), lit(labels._2))
      .otherwise(lit(labels._3))

  /** 1 if the normalized (trim+lower) value is in the accept set, else 0
    * (reference: scripts/transform.py:51-55, `has_internet_service`). */
  def memberFlag(c: Column, accepted: Seq[String]): Column =
    Clean.normalized(c).isin(accepted.map(_.toLowerCase): _*).cast("int")

  /** 1 if normalized value equals `yes` (reference: transform.py:58,
    * `is_multi_line_user`). */
  def yesFlag(c: Column, yes: String = "yes"): Column =
    (Clean.normalized(c) === lit(yes.toLowerCase)).cast("int")

  /** Dictionary code map with fallback (reference: transform.py:61-69,
    * `contract_type_code`, unmapped → -1). Keys are matched on the
    * normalized value. */
  def codeMap(c: Column, mapping: Map[String, Int], fallback: Int = -1): Column = {
    val n = Clean.normalized(c)
    mapping.foldLeft(when(lit(false), lit(fallback))) {
      case (acc, (k, v)) => acc.when(n === lit(k.toLowerCase), lit(v))
    }.otherwise(lit(fallback))
  }

  /** Calendar feature expansion for a timestamp column — the usual ETL
    * date dimensions (year/quarter/month/day; day-of-week is omitted on
    * purpose: engines disagree on week-start conventions, use
    * `dayofweek` explicitly where one convention is committed to). */
  def dateFeatures(c: Column): Seq[(String, Column)] = Seq(
    "year" -> year(c),
    "quarter" -> quarter(c),
    "month" -> month(c),
    "day" -> dayofmonth(c),
    "is_month_start" -> (dayofmonth(c) === 1).cast("int"),
    "days_in_month" -> dayofmonth(last_day(c)))

  /** One-hot indicator expansion for a categorical column — pandas
    * `pd.get_dummies` shape with the category list FIXED up front:
    * a data-independent schema, where deriving columns from observed
    * distinct values would mean a driver round-trip and a schema that
    * shifts with the data at scale. Unlisted values produce all-zero
    * rows (get_dummies' behavior for unseen categories at transform
    * time). Pure projection — map-only at any scale. */
  def oneHot(c: Column, values: Seq[String], prefix: String): Seq[(String, Column)] =
    values.map(v => s"${prefix}_${snakeCase(v)}" -> (c === lit(v)).cast("int"))

  /** snake_case column normalization (reference: scripts/load.py:118-123):
    * camelCase boundary → underscore, non-alphanumerics → underscore,
    * lowercase, trim underscores. */
  def snakeCase(name: String): String =
    name.replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("[^0-9a-zA-Z_]+", "_")
      .replaceAll("^_+|_+$", "") // python strip('_'): ALL edge underscores
      .toLowerCase
}

package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Schema-drift tolerant column resolution (reference
  * etl_analysis.ipynb cell 5 `safe_find`: case/spacing/underscore
  * tolerant lookup of expected columns against whatever schema the
  * upstream actually delivered).
  *
  * Matching is by canonical form: lowercase, all non-alphanumerics
  * stripped, so `"Order Key"`, `"order_key"`, `"ORDER-KEY"` and
  * `"orderkey"` all resolve to the same physical column. Resolution is
  * pure driver-side name work — zero runtime cost; the projected plan is
  * identical to one written against the real names.
  */
object SchemaResolver {

  private def canon(name: String): String =
    name.toLowerCase.replaceAll("[^a-z0-9]", "")

  /** Resolve one requested name against a schema. None if no column
    * canonicalizes to the same form; throws if the schema is ambiguous
    * (two physical columns share a canonical form — silently picking one
    * is how drifted loads corrupt downstream silently). */
  def resolve(schema: Seq[String], requested: String): Option[String] = {
    val want = canon(requested)
    schema.filter(canon(_) == want) match {
      case Seq() => None
      case Seq(one) => Some(one)
      case many => throw new IllegalArgumentException(
        s"ambiguous resolution for '$requested': ${many.mkString(", ")}")
    }
  }

  /** First requested candidate that resolves (safe_find's list-of-
    * candidates shape: try the expected name, then known drift aliases). */
  def resolveFirst(schema: Seq[String], candidates: Seq[String]): Option[String] =
    candidates.iterator.flatMap(resolve(schema, _)).nextOption()

  /** Project `df` to `outputName -> candidate names` mappings, aliasing
    * each resolved physical column to its requested output name. Throws
    * listing every unresolvable output (all-or-nothing — a partially
    * resolved projection is a silent schema drift downstream). */
  def select(df: DataFrame, wanted: Seq[(String, Seq[String])]): DataFrame = {
    val schema = df.columns.toSeq
    val (missing, found) = wanted.partitionMap { case (out, cands) =>
      resolveFirst(schema, cands).toRight(out -> cands).map(out -> _)
    }
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        "unresolvable columns: " + missing.map { case (o, c) =>
          s"$o (tried ${c.mkString("/")})" }.mkString("; ") +
          s" against schema ${schema.mkString(", ")}")
    df.select(found.map { case (out, phys) => col(phys).as(out) }: _*)
  }
}

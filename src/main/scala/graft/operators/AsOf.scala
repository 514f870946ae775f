package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (point-in-time) join: for each left row, the latest right row
  * with rightTs <= leftTs within the same partition key.
  *
  * Spark lacks the operator; per the composition-first rule this is
  * expressed with built-ins — a union + one window pass — rather than a
  * custom SparkPlan: both sides shuffle ONCE on the key, the timeline
  * merge happens inside the sort of a single window, and one
  * `last(struct, ignoreNulls)` carries the most recent right row
  * forward. That is exactly the merge an AsOfJoinExec would hand-code,
  * with Tungsten sort + codegen for free. Right rows sort before left
  * rows at equal timestamps, making the join boundary-inclusive.
  */
object AsOf {

  /** @param partitionCols key columns present in BOTH sides
    * @param carry right-side columns to attach to each left row
    *              (returned as `asof_<name>`, NULL when no prior row).
    *              All carried values come from the SAME right row — the
    *              carry travels as ONE struct through a single
    *              last(ignoreNulls) window, so a right row with NULL in
    *              one carry column and non-NULL in another can never mix
    *              values across rows. */
  def joinPrior(left: DataFrame, right: DataFrame, partitionCols: Seq[String],
                leftTs: String, rightTs: String, carry: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val carryType = StructType(carry.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    val lTagged = left
      .withColumn("_t", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_c", lit(null).cast(carryType))
      .select(leftCols.map(col) :+ col("_t") :+ col("_side") :+ col("_c"): _*)
    val rTagged = right
      .withColumn("_t", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_c", struct(carry.map(c => col(c).as(c)): _*))
      .select(leftCols.map(c =>
        if (partitionCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("_t") :+ col("_side") :+ col("_c"): _*)
    // the carry struct participates in the sort so equal-timestamp right
    // rows resolve deterministically (the lexicographically max carry
    // tuple wins — field order = `carry` order)
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionAll(rTagged)
      .withColumn("_m", last(col("_c"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        carry.map(c => col("_m").getField(c).as(s"asof_$c")): _*)
  }

  /** Bucketed-layout-aware as-of join: same result contract as
    * [[joinPrior]], shaped for inputs that are ALREADY hash-bucketed by
    * the key (Load.BucketedTableSink with the same bucket count on both
    * sides — the standard layout investment for repeatedly-joined
    * tables). The right side folds into one sorted timeline array per
    * key and equi-joins the left; both the fold's grouping and the join
    * read their required distribution straight off the bucketed scans,
    * so the whole operator plans with ZERO Exchange — where
    * [[joinPrior]]'s union+window must shuffle both sides on every run,
    * this pays the shuffle once at layout time (see OperatorsSpec: the
    * plan is asserted exchange-free, and results equal joinPrior's).
    *
    * The per-key timeline materializes as one array, so this variant
    * fits dimension-history right sides (SCD tables: versions per key,
    * not unbounded event streams); each left row picks its prior row
    * with a row-local scan of that array. Equal-timestamp ties resolve
    * like joinPrior: the lexicographically greatest carry tuple wins
    * (sort_array orders by ts first, then carry fields). */
  def joinPriorBucketed(left: DataFrame, right: DataFrame, partitionCols: Seq[String],
                        leftTs: String, rightTs: String, carry: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val tl = right
      .groupBy(partitionCols.map(col): _*)
      .agg(sort_array(collect_list(
        struct(col(rightTs).as("_ts") +: carry.map(c => col(c).as(c)): _*))).as("_tl"))
    left.join(tl, partitionCols, "left")
      .withColumn("_m", try_element_at(
        filter(col("_tl"), e => e.getField("_ts") <= col(leftTs)), lit(-1)))
      .select(leftCols.map(col) ++
        carry.map(c => col("_m").getField(c).as(s"asof_$c")): _*)
  }

  /** Nearest-in-time as-of join (pandas `merge_asof(direction=
    * 'nearest')`): for each left row, the right row minimizing
    * |leftTs − rightTs| within `toleranceUs`, ties to the PRIOR side.
    * Same single-shuffle union+window shape as [[joinPrior]] — one
    * carry runs backward (last ignoreNulls over the preceding frame,
    * boundary-inclusive) and one forward (first ignoreNulls over the
    * following frame) inside the same sorted timeline, then a
    * row-local pick. Returns the carried columns as `asof_<name>` plus
    * `asof_delta_us` (signed leftTs − rightTs; NULL when nothing is in
    * tolerance). */
  def joinNearest(left: DataFrame, right: DataFrame, partitionCols: Seq[String],
                  leftTs: String, rightTs: String, carry: Seq[String],
                  toleranceUs: Long): DataFrame = {
    val leftCols = left.columns.toSeq
    val carryType = StructType(
      StructField("_ts", right.schema(rightTs).dataType, nullable = true) +:
        carry.map(c => StructField(c, right.schema(c).dataType, nullable = true)))
    val lTagged = left
      .withColumn("_t", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_c", lit(null).cast(carryType))
      .select(leftCols.map(col) :+ col("_t") :+ col("_side") :+ col("_c"): _*)
    val rTagged = right
      .withColumn("_t", col(rightTs))
      .withColumn("_side", lit(0))
      .withColumn("_c", struct(col(rightTs).as("_ts") +: carry.map(c => col(c).as(c)): _*))
      .select(leftCols.map(c =>
        if (partitionCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("_t") :+ col("_side") :+ col("_c"): _*)
    val ord = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_c"))
    val u = lTagged.unionAll(rTagged)
      .withColumn("_p", last(col("_c"), ignoreNulls = true)
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_n", first(col("_c"), ignoreNulls = true)
        .over(ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("_side") === 1)
    val dp = unix_micros(col("_t")) - unix_micros(col("_p").getField("_ts"))
    val dn = unix_micros(col("_n").getField("_ts")) - unix_micros(col("_t"))
    val pickPrior = col("_p").isNotNull && dp <= toleranceUs &&
      (col("_n").isNull || dp <= dn)
    val pickNext = col("_n").isNotNull && dn <= toleranceUs
    val m = when(pickPrior, col("_p")).when(pickNext, col("_n"))
    val delta = when(pickPrior, dp).when(pickNext, -dn)
    u.select(leftCols.map(col) ++
      carry.map(c => m.getField(c).as(s"asof_$c")) :+
      delta.as("asof_delta_us"): _*)
  }
}

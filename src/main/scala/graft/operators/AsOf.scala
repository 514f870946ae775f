package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the latest right row
  * with rightTs <= leftTs within the same partition key.
  *
  * Spark lacks the operator; per the composition-first rule this is
  * expressed with built-ins — a union + one window pass — rather than a
  * custom SparkPlan: both sides shuffle ONCE on the key, the timeline
  * merge happens inside the sort of a single window, and `last(...,
  * ignoreNulls)` carries the most recent right row forward. That is
  * exactly the merge an AsOfJoinExec would hand-code, with Tungsten
  * sort + codegen for free. Right rows sort before left rows at equal
  * timestamps, making the join boundary-inclusive.
  */
object AsOf {

  /** @param partitionCols key columns present in BOTH sides
    * @param carry right-side columns to attach to each left row
    *              (returned as `asof_<name>`, NULL when no prior row) */
  def joinPrior(left: DataFrame, right: DataFrame, partitionCols: Seq[String],
                leftTs: String, rightTs: String, carry: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("_t", col(leftTs))
      .withColumn("_side", lit(1))
      .select((leftCols.map(col) :+ col("_t") :+ col("_side")) ++
        carry.map(c => lit(null).cast(right.schema(c).dataType).as(s"_c_$c")): _*)
    val rTagged = right
      .withColumn("_t", col(rightTs))
      .withColumn("_side", lit(0))
      .select((leftCols.map(c =>
        if (partitionCols.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("_t") :+ col("_side")) ++ carry.map(c => col(c).as(s"_c_$c")): _*)
    // carry columns participate in the sort so equal-timestamp right
    // rows resolve deterministically (the max carry tuple wins)
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col("_t") +: col("_side") +: carry.map(c => col(s"_c_$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carry.foldLeft(lTagged.unionAll(rTagged)) { (d, c) =>
      d.withColumn(s"_m_$c", last(col(s"_c_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select(leftCols.map(col) ++ carry.map(c => col(s"_m_$c").as(s"asof_$c")): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering.
  *
  * A table range-sorted on ONE column prunes files perfectly on that
  * column and not at all on any other. Interleaving the bits of two
  * columns and range-partitioning on the result gives every file a
  * narrow min/max envelope in BOTH dimensions, so parquet footer stats
  * skip files for predicates on either column (or a 2-D box) — the
  * standard lakehouse answer to "we filter by customer AND by amount",
  * at 100 TB the difference between scanning 2% and 50% of files.
  * LayoutSpec measures the pruning directly from per-file stats.
  *
  * Pure Column algebra (shift/mask spreading, 5 steps per dimension —
  * the classic magic-number Morton encode), so the clustering key is
  * codegen'd and never leaves the projection.
  */
object Layout {

  /** Spread the low 16 bits of x to even bit positions 0,2,4,…,30. */
  private def spread16(x: Column): Column = {
    val v0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton interleave of the low 16 bits of two non-negative ints:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. */
  def zOrder2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Reference implementation for specs (same bit layout). */
  def mortonRef(a: Int, b: Int): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  /** Rewrite `df` into ~`nFiles` files clustered along the Z-curve over
    * (a, b): range-exchange on the Morton key, sort within partitions,
    * one file per partition. The key is an expression — nothing is
    * persisted except the clustered layout itself. */
  def zOrderWrite(df: DataFrame, a: Column, b: Column, path: String,
                  nFiles: Int): Unit = {
    val z = zOrder2(a, b)
    df.repartitionByRange(nFiles, z)
      .sortWithinPartitions(z)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
  }

  /** Files whose footer [min, max] of `column` intersects [lo, hi] — a
    * driver-side replica of the scan planner's skipping decision, used
    * to MEASURE a layout (one tiny agg per file; stats-only reads). */
  def candidateFiles(spark: org.apache.spark.sql.SparkSession, path: String,
                     column: String, lo: Long, hi: Long): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)
      .filter { f =>
        val r = spark.read.parquet(f)
          .agg(min(col(column)).cast("long"), max(col(column)).cast("long"))
          .head()
        r.getLong(1) >= lo && r.getLong(0) <= hi
      }.toSeq
  }
}

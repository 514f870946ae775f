package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zOrder2 matches the reference Morton interleave") {
    val pairs = for (a <- Seq(0, 1, 7, 255, 4095, 65535); b <- Seq(0, 2, 99, 65535))
      yield (a, b)
    val got = pairs.toDF("a", "b")
      .select(Layout.zOrder2(col("a"), col("b"))).as[Long].collect()
    got.zip(pairs).foreach { case (z, (a, b)) =>
      assert(z == Layout.mortonRef(a, b), s"($a, $b)")
    }
  }

  test("z-ordered layout prunes files on BOTH dimensions, linear only on one") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    // 40k rows over a 512×512 grid of (cust, amount)
    // Hash-repartition on the data columns so each partition's CONTENT is a
    // pure function of the values — repartitionByRange's bound-sampling then
    // sees the same input regardless of how spark.range was split (which
    // varies when the suite shares a JVM and made this spec flaky).
    val df = spark.range(40000).select(
      (col("id") * 2654435761L % 512).as("cust"),
      (col("id") * 40503L % 512).as("amount"))
      .repartition(8, col("cust"), col("amount"))
    val nFiles = 16
    // linear layout: range-sorted by cust only
    df.repartitionByRange(nFiles, col("cust")).sortWithinPartitions("cust")
      .write.parquet(s"$tmp/linear")
    Layout.zOrderWrite(df, col("cust"), col("amount"), s"$tmp/zorder", nFiles)

    def hits(path: String, column: String) =
      Layout.candidateFiles(spark, path, column, 100, 131).size
    // ~1/16 of each dimension's domain
    val linearCust = hits(s"$tmp/linear", "cust")
    val linearAmt = hits(s"$tmp/linear", "amount")
    val zCust = hits(s"$tmp/zorder", "cust")
    val zAmt = hits(s"$tmp/zorder", "amount")
    info(s"candidate files of $nFiles — linear: cust=$linearCust amount=$linearAmt; " +
      s"zorder: cust=$zCust amount=$zAmt")
    assert(linearCust <= 3, "range layout must prune its own sort column hard")
    assert(linearAmt == nFiles, "range layout cannot prune the other column")
    // 16 files tile the 512×512 grid into 4×4 Morton blocks; a 32-wide
    // slab straddling a block boundary touches ~2 of 4 block columns →
    // roughly half the files per dimension (±1 file where the sampled
    // range bounds land off the exact block edge). The win is symmetry:
    // BOTH dims prune, where the linear layout scans everything for one
    // of them — so assert the combined budget, not a knife-edge per-dim.
    assert(zCust < nFiles && zAmt < nFiles,
      "z-order must prune at least one file on EACH dimension")
    assert(zCust + zAmt <= nFiles + 2,
      "z-order candidates must stay near half the files per dimension")
    assert(zAmt < linearAmt,
      "z-order must beat the linear layout on its unsorted dimension")
    // and the data survives intact
    assert(spark.read.parquet(s"$tmp/zorder").count() == 40000)
  }
}

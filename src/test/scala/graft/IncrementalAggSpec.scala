package graft

import org.apache.spark.sql.functions._
import graft.etl.{IncrementalAgg, Snapshots}

/** Incremental view maintenance: refresh(state@v1, delta(v1→v2)) must
  * equal aggregate(read@v2) bit-for-bit, the delta must scan only the
  * appended files, and overwrites must refuse the shortcut.
  */
class IncrementalAggSpec extends SparkSpec {

  private val keys = Seq("o_orderstatus")
  private val measures = Seq("o_totalprice")

  private def freshTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_ia").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/orders_snap"
  }

  test("refresh from the delta equals the full recompute exactly") {
    val t = freshTable()
    val orders = Tables.orders(spark, sfDir)
    Snapshots.commit(orders.where(col("o_orderkey") % 3 === 0), t, "append")
    Snapshots.commit(orders.where(col("o_orderkey") % 3 === 1), t, "append")
    val state1 = IncrementalAgg.aggregate(
      Snapshots.read(spark, t, Some(1)), keys, measures)
    val d = IncrementalAgg.delta(spark, t, 1, 2)
    val refreshed = IncrementalAgg.refresh(state1, d, keys, measures)
      .collect().map(_.toSeq).toSet
    val full = IncrementalAgg.aggregate(
      Snapshots.read(spark, t, Some(2)), keys, measures)
      .collect().map(_.toSeq).toSet
    assert(refreshed == full && full.nonEmpty)
  }

  test("delta scans only the appended files") {
    val t = freshTable()
    val orders = Tables.orders(spark, sfDir)
    Snapshots.commit(orders.limit(1000), t, "append")
    Snapshots.commit(orders.limit(200), t, "append")
    val d = IncrementalAgg.delta(spark, t, 1, 2)
    assert(d.count() == 200)
    val scanned = d.inputFiles.toSet
    val v1Files = Snapshots.readManifest(spark, t, 1).files.toSet
    assert(scanned.nonEmpty && scanned.forall(f => !v1Files.contains(f)))
  }

  test("an overwrite in the lineage refuses the incremental shortcut") {
    val t = freshTable()
    val orders = Tables.orders(spark, sfDir)
    Snapshots.commit(orders.limit(100), t, "append")
    Snapshots.commit(orders.limit(50), t, "overwrite")
    intercept[IllegalArgumentException] {
      IncrementalAgg.delta(spark, t, 1, 2)
    }
  }
}

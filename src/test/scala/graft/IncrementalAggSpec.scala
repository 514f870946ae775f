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

  test("min/max measures ride the refresh and equal the full recompute") {
    val t = freshTable()
    val orders = Tables.orders(spark, sfDir)
    Snapshots.commit(orders.where(col("o_orderkey") % 3 === 0), t, "append")
    Snapshots.commit(orders.where(col("o_orderkey") % 3 =!= 0), t, "append")
    val state1 = IncrementalAgg.aggregate(
      Snapshots.read(spark, t, Some(1)), keys, measures, minMaxMeasures = measures)
    val refreshed = IncrementalAgg.refresh(state1,
        IncrementalAgg.delta(spark, t, 1, 2), keys, measures, minMaxMeasures = measures)
      .collect().map(_.toSeq).toSet
    val full = IncrementalAgg.aggregate(
        Snapshots.read(spark, t, Some(2)), keys, measures, minMaxMeasures = measures)
      .collect().map(_.toSeq).toSet
    assert(refreshed == full && full.nonEmpty)
    // and the maintained extremes are the true ones
    val cols = IncrementalAgg.aggregate(
      Snapshots.read(spark, t, Some(2)), keys, measures, minMaxMeasures = measures)
    val row = cols.where(col("o_orderstatus") === "O")
      .select("min_o_totalprice", "max_o_totalprice").head()
    val truth = Snapshots.read(spark, t, Some(2)).where(col("o_orderstatus") === "O")
      .agg(min("o_totalprice"), max("o_totalprice")).head()
    assert(row.getDouble(0) == truth.getDouble(0) && row.getDouble(1) == truth.getDouble(1))
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

  test("HLL distinct state rides the delta-only refresh: registers AND estimate equal the full recompute") {
    val t = freshTable()
    val orders = Tables.orders(spark, sfDir)
    Snapshots.commit(orders.where(col("o_orderkey") % 3 === 0), t, "append")
    Snapshots.commit(orders.where(col("o_orderkey") % 3 === 1), t, "append")
    Snapshots.commit(orders.where(col("o_orderkey") % 3 === 2), t, "append")
    val m = 64
    val key = col("o_custkey")
    val st1 = IncrementalAgg.hllState(Snapshots.read(spark, t, Some(1)), keys, key, m)
    val st2 = IncrementalAgg.refreshHll(st1, IncrementalAgg.delta(spark, t, 1, 2), keys, key, m)
    val st3 = IncrementalAgg.refreshHll(st2, IncrementalAgg.delta(spark, t, 2, 3), keys, key, m)
    val full = IncrementalAgg.hllState(Snapshots.read(spark, t, Some(3)), keys, key, m)
    // register table: rho-max is monotone, so the incremental state is
    // the element-wise max of the deltas == the one-shot state, exactly
    assert(st3.collect().map(_.toSeq).toSet == full.collect().map(_.toSeq).toSet)
    // and the derived estimates (closed-form spine) match too, within
    // the usual HLL error of the true per-group distinct counts
    val est = IncrementalAgg.hllEstimateFrom(st3, keys, m)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val estFull = IncrementalAgg.hllEstimateFrom(full, keys, m)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == estFull && est.nonEmpty)
    val truth = Snapshots.read(spark, t, Some(3))
      .groupBy(col("o_orderstatus")).agg(countDistinct(col("o_custkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (g, d) =>
      assert(math.abs(est(g) - d).toDouble / d < 0.35, s"$g: est ${est(g)} vs true $d")
    }
  }
}

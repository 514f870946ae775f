package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance over Snapshots
  * versions: the aggregate state for corpus@vN refreshes to vM by
  * scanning ONLY the files vM added — at 100 TB the difference between
  * re-reading the table and reading the day's append.
  *
  * State shape: groupBy(keys) with exact DECIMAL(24,8) sums and a row
  * count per measure-group — mergeable (sum of sums, sum of counts) and
  * partition-order exact, so `refresh(state@vN, delta) == aggregate
  * (read@vM)` bit-for-bit, which the spec asserts. Averages and rates
  * derive from (sum, n) at read time; non-decomposable aggregates
  * (median, distinct) belong to the sketch family (KLL/HLL/KMV are all
  * mergeable and can ride the same refresh).
  *
  * Appends only: an overwrite between the two versions invalidates the
  * delta (files were REMOVED); `delta` detects that from the manifest
  * ops and refuses, forcing the caller to rebuild from scratch rather
  * than silently double-count.
  */
object IncrementalAgg {

  /** Exact mergeable aggregate: keys -> (sum_<m> DECIMAL(24,8) per
    * measure, n rows).
    */
  def aggregate(df: DataFrame, keys: Seq[String], measures: Seq[String],
                minMaxMeasures: Seq[String] = Nil): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        measures.map(m => sum(col(m).cast("decimal(24,8)")).as(s"sum_$m")) ++
          minMaxMeasures.flatMap(m => Seq(
            min(col(m)).as(s"min_$m"), max(col(m)).as(s"max_$m"))): _*)

  /** The rows `toVersion` added on top of `fromVersion` (append-only
    * lineage required). Scans only the added files.
    */
  def delta(s: SparkSession, table: String, fromVersion: Int, toVersion: Int): DataFrame = {
    require(fromVersion < toVersion, s"need fromVersion < toVersion")
    ((fromVersion + 1) to toVersion).foreach { v =>
      val m = Snapshots.readManifest(s, table, v)
      require(m.op == "append",
        s"$table v$v is '${m.op}' — the delta is not additive; rebuild the aggregate from scratch")
    }
    val before = Snapshots.readManifest(s, table, fromVersion).files.toSet
    val added = Snapshots.readManifest(s, table, toVersion).files.filterNot(before)
    require(added.nonEmpty, s"no files added between v$fromVersion and v$toVersion")
    s.read.parquet(added: _*)
  }

  /** Merge an existing state with the aggregate of a delta: sum of
    * sums, sum of counts. Exact because every column is decimal/long.
    */
  def refresh(state: DataFrame, deltaDf: DataFrame,
              keys: Seq[String], measures: Seq[String],
              minMaxMeasures: Seq[String] = Nil): DataFrame = {
    val deltaState = aggregate(deltaDf, keys, measures, minMaxMeasures)
    state.unionByName(deltaState)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).cast("long").as("n"),
        measures.map(m =>
          sum(col(s"sum_$m")).cast("decimal(24,8)").as(s"sum_$m")) ++
          // min-of-mins / max-of-maxes: mergeable under append-only
          // lineage (a delete could retract the extremum — exactly what
          // delta()'s append-only check already refuses)
          minMaxMeasures.flatMap(m => Seq(
            min(col(s"min_$m")).as(s"min_$m"), max(col(s"max_$m")).as(s"max_$m"))): _*)
  }

  /** The sketch analogue of [[aggregate]] for DISTINCT counts — the
    * canonical non-decomposable aggregate. State is the HLL register
    * table per key group (keys…, register, rho); rho-max is monotone,
    * so refresh is an element-wise max with the delta's state and the
    * same delta-only scan discipline applies. Exactly the "mergeable
    * summaries ride the refresh" path the decimal sums can't cover.
    */
  def hllState(df: DataFrame, keys: Seq[String], keyCol: Column, m: Int): DataFrame =
    graft.functions.Sketches.hllHits(df, keyCol, m, keys)

  /** Element-wise register max of the state and the delta's state. */
  def refreshHll(state: DataFrame, deltaDf: DataFrame,
                 keys: Seq[String], keyCol: Column, m: Int): DataFrame =
    state.unionByName(hllState(deltaDf, keys, keyCol, m))
      .groupBy((keys :+ "register").map(col): _*)
      .agg(max("rho").as("rho"))

  /** Distinct estimate per key group from a state snapshot. Never-hit
    * registers (rho = 0) contribute S = 2^(remWidth+1) each to the
    * harmonic sum, so the spine is closed-form: no register-table fill.
    */
  def hllEstimateFrom(state: DataFrame, keys: Seq[String], m: Int): DataFrame = {
    import graft.functions.Sketches
    val s = 1L << (Sketches.hllRemWidth(m) + 1)
    state.groupBy(keys.map(col): _*)
      .agg((sum(expr(s"shiftright(cast($s as bigint), rho)")) +
        (lit(m.toLong) - count(lit(1))) * s).as("z_scaled"))
      .select(keys.map(col) :+
        Sketches.hllEstimate(m, col("z_scaled")).as("est_distinct"): _*)
  }
}

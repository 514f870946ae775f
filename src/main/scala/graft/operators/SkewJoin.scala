package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: the build side is replicated once
  * per salt, the probe side picks a deterministic salt from a hash of
  * the row, and the join runs on (key, salt) — splitting a hot key's
  * rows across `salts` reducers instead of one. Results are identical
  * to the plain inner join (every probe row meets exactly one replica).
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting remains the tool when a single key exceeds what one task can
  * hold (the 100 TB "null key / whale customer" case) or when AQE is
  * unavailable (streaming-static joins).
  */
object SkewJoin {

  def saltedInner(probe: DataFrame, build: DataFrame, key: String,
                  salts: Int = 16): DataFrame = {
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(struct(probe.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicated = build.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Skew report for a join key: the heaviest key's share of the rows
    * and the skew ratio vs a perfectly uniform key. [[skewReport]] is
    * exact (full per-key shuffle — fine for diagnostics);
    * [[skewReportSketch]] bounds the shuffle for the 100 TB path. */
  final case class SkewReport(nRows: Long, nKeys: Long, maxKeyCount: Long,
                              skewRatio: Double) {
    /** Salt factor that splits the heaviest key into roughly
      * avg-key-sized slices, clamped to [1, 64]. 1 = don't salt. */
    def suggestedSalts: Int =
      math.min(64L, math.max(1L, math.round(skewRatio / 4.0))).toInt
  }

  def skewReport(df: DataFrame, key: String): SkewReport = {
    val row = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(sum(col("n")).as("rows"), count(lit(1)).as("keys"), max(col("n")).as("mx"))
      .head()
    // empty input: zero groups → sum/max aggregate to NULL, count to 0
    if (row.isNullAt(0)) SkewReport(0L, 0L, 0L, 0.0)
    else {
      val (rows, keys, mx) = (row.getLong(0), row.getLong(1), row.getLong(2))
      SkewReport(rows, keys, mx,
        if (keys == 0) 0.0 else mx.toDouble * keys / math.max(1L, rows))
    }
  }

  /** Sketch-based skew report: same decision inputs as [[skewReport]]
    * without the full per-key shuffle. Keys hash into `depth` rows of
    * `buckets` counters (count-min shape), so the shuffle after map-side
    * combine carries at most depth × buckets rows regardless of input
    * size; the heaviest key's count is upper-bounded by the smallest
    * per-row max bucket (every key lands in one bucket per row, so each
    * row's max bucket ≥ the true max; collisions only ever inflate it —
    * the failure mode is salting a join that didn't need it, never
    * missing a whale). nKeys is HyperLogLog (approx_count_distinct). */
  def skewReportSketch(df: DataFrame, key: String,
                       buckets: Int = 1 << 12, depth: Int = 3): SkewReport = {
    val stats = df.agg(count(lit(1)).as("rows"),
      approx_count_distinct(col(key)).as("keys")).head()
    val (rows, keys) = (stats.getLong(0), stats.getLong(1))
    if (rows == 0L) return SkewReport(0L, 0L, 0L, 0.0)
    // (row d, bucket) packed into one long: d * buckets + h_d(key)
    val mx = df.select(explode(array((0 until depth).map(d =>
        lit(d.toLong * buckets) + pmod(xxhash64(lit(d), col(key)), lit(buckets))): _*)).as("db"))
      .groupBy(col("db")).agg(count(lit(1)).as("n"))
      .groupBy(floor(col("db") / buckets).as("d")).agg(max(col("n")).as("mx"))
      .agg(min(col("mx")).as("est")).head().getLong(0)
    SkewReport(rows, keys, mx,
      if (keys == 0) 0.0 else mx.toDouble * keys / math.max(1L, rows))
  }

  /** Measure, then salt only if the heaviest key is far above uniform
    * (skewRatio > 4): the auto-tuned entry point — plain join for
    * well-distributed keys, salted with a data-derived factor for
    * whales. The measurement is the bounded-shuffle sketch
    * ([[skewReportSketch]]), so the decision itself is 100 TB-safe. */
  def saltedInnerAuto(probe: DataFrame, build: DataFrame, key: String): DataFrame = {
    val r = skewReportSketch(probe, key)
    if (r.suggestedSalts <= 1) probe.join(build, Seq(key))
    else saltedInner(probe, build, key, r.suggestedSalts)
  }
}

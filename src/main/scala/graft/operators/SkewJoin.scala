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
    * and the skew ratio vs a perfectly uniform key. One aggregate job
    * (top-k heavy hitters by exact count — at 100 TB swap the exact
    * groupBy for approx heavy hitters; the decision logic is the same). */
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
    val (rows, keys, mx) = (row.getLong(0), row.getLong(1), row.getLong(2))
    SkewReport(rows, keys, mx,
      if (keys == 0) 0.0 else mx.toDouble * keys / math.max(1L, rows))
  }

  /** Measure, then salt only if the heaviest key is far above uniform
    * (skewRatio > 4): the auto-tuned entry point — plain join for
    * well-distributed keys, salted with a data-derived factor for
    * whales. */
  def saltedInnerAuto(probe: DataFrame, build: DataFrame, key: String): DataFrame = {
    val r = skewReport(probe, key)
    if (r.suggestedSalts <= 1) probe.join(build, Seq(key))
    else saltedInner(probe, build, key, r.suggestedSalts)
  }
}

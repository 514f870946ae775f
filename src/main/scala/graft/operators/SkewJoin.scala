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
}

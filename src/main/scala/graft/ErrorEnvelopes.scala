package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Measured-vs-bound error for the two sketch keys whose raw estimates
  * are not cross-engine replayable (`an_approx_stats`, `an_tdigest`).
  * Since r18 their [q] emissions are SELF-CERTIFIED frames under the
  * DuckDB hash oracle (exact halves + in-bound booleans); this report
  * still records the measured error MAGNITUDES each round (the
  * booleans alone would hide how much envelope headroom remains).
  * Bounds mirror the property specs:
  *
  *  - approx_count_distinct: HLL++ default rsd 0.05 → envelope 4·rsd
  *    (relative error, ~1e-4 tail probability);
  *  - percentile_approx(accuracy=1000): guaranteed rank error ≤
  *    n/1000 → envelope 0.001 rank fraction (tie runs give the
  *    estimate a rank INTERVAL; error is distance outside it);
  *  - t-digest δ=100: body rank error ≤ 0.02 (TDigestSpec).
  */
object ErrorEnvelopes {

  /** Distance of `target` outside the closed rank interval
    * [below, atOrBelow] as a fraction of n (0 when inside — the
    * tie-run tolerance TDigestSpec.rankError uses). */
  private def rankErr(below: Long, atOrBelow: Long, target: Double, n: Long): Double =
    if (target < below) (below - target) / n.toDouble
    else if (target > atOrBelow) (target - atOrBelow) / n.toDouble
    else 0.0

  /** JSON envelope report over the requested subset of the two keys
    * (a SPARK_GRAFT_ONLY run asking for one must not execute the
    * other's sketch queries and full-table exact scans, nor emit an
    * artifact covering a key outside the subset). */
  def report(s: SparkSession, dir: String,
             keys: Set[String] = Set("an_approx_stats", "an_tdigest")): String = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))

    if (keys("an_approx_stats")) {
      // --- an_approx_stats: HLL distinct + approx median over orders ---
      // (raw estimates: the [q] emission is now the certified frame)
      val row = SparkEntry.approxStatsRaw(s, dir).head()
      val approxCust = row.getLong(0)
      val approxMed = row.getDouble(1)
      val n = row.getLong(2)
      val orders = Tables.orders(s, dir).select(col("o_custkey"), col("o_totalprice"))
      val ex = orders.agg(
        countDistinct(col("o_custkey")).as("cust"),
        sum(when(col("o_totalprice") < approxMed, 1L).otherwise(0L)).as("below"),
        sum(when(col("o_totalprice") <= approxMed, 1L).otherwise(0L)).as("atOrBelow")).head()
      val custRel = math.abs(approxCust - ex.getLong(0)).toDouble / ex.getLong(0)
      val medRank = rankErr(ex.getLong(1), ex.getLong(2), 0.5 * n, n)
      parts += s""""an_approx_stats":{"distinct_rel_err":${f(custRel)},"distinct_bound":0.2,""" +
        s""""median_rank_err":${f(medRank)},"median_rank_bound":0.001,""" +
        s""""ok":${custRel <= 0.2 && medRank <= 0.001}}"""
    }

    if (keys("an_tdigest")) {
      // --- an_tdigest: 4 probes × groups over lineitem prices ---
      // (raw estimates: the [q] emission is now the certified frame)
      val probes = SparkEntry.tdigestRaw(s, dir).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      // one pass: per (grp, q, est) conditional rank counts + group sizes
      val li = Tables.lineitem(s, dir).select(col("l_returnflag").as("grp"),
        col("l_extendedprice").as("v"))
      def cnt(g: String, c: Column) = sum(when(col("grp") === g && c, 1L).otherwise(0L))
      val aggs: Seq[Column] =
        probes.toSeq.flatMap { case (g, q, est) =>
          Seq(cnt(g, col("v") < est).as(s"b_${g}_$q"), cnt(g, col("v") <= est).as(s"a_${g}_$q"))
        } ++ probes.map(_._1).distinct.toSeq.map(g => cnt(g, lit(true)).as(s"n_$g"))
      val t = li.agg(aggs.head, aggs.tail: _*).head()
      val tdErrs = probes.toSeq.map { case (g, q, est) =>
        val ng = t.getAs[Long](s"n_$g")
        (g, q, rankErr(t.getAs[Long](s"b_${g}_$q"), t.getAs[Long](s"a_${g}_$q"), q * ng, ng))
      }
      val tdMax = tdErrs.map(_._3).max
      val tdJson = tdErrs.map { case (g, q, e) =>
        s"""{"grp":"$g","q":${f(q)},"rank_err":${f(e)}}"""
      }.mkString("[", ",", "]")
      parts += s""""an_tdigest":{"max_rank_err":${f(tdMax)},"rank_bound":0.02,""" +
        s""""ok":${tdMax <= 0.02},"probes":$tdJson}"""
    }

    parts.mkString("{", ",", "}")
  }
}

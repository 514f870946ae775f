package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming-friendly frequency/cardinality sketches (Count-Min, HLL)
  * as first-class, *exactly verifiable* query outputs.
  *
  * Both sketches are built with DataFrame algebra (whole-stage codegen,
  * map-side partial aggregation) rather than a typed Aggregator: the
  * per-task partial state is at most `depth × width` (CMS) or `m` (HLL)
  * rows, so the shuffle carries a fixed-size sketch per task regardless
  * of input size — the defining property that makes these viable on a
  * 100 TB scan where an exact `groupBy(key)` would shuffle every key.
  *
  * Hashing is a multiplicative-congruential family over the Mersenne
  * prime 2^31-1 with multipliers < 2^30, so every intermediate product
  * stays below 2^61 and the identical bucket/register math can be
  * replayed in ANSI SQL by an independent engine — which is exactly how
  * the DuckDB oracle verifies these sketches bit-for-bit (see
  * SparkEntry.anCmsHeavySql / anHllDistinctSql). Mirrors the sketched
  * `value_counts`/`nunique` summaries of the reference pipeline
  * (ETL-pipeline-telecom notebook cells, analyze step) at a scale where
  * exact counting is a shuffle too far.
  */
object Sketches {

  /** Mersenne prime 2^31-1: hash field modulus. */
  val P = 2147483647L

  /** Depth-3 hash family; multipliers < 2^30 keep (k mod P)·a < 2^61. */
  val CmsSeeds: Seq[(Long, Long)] =
    Seq((1000003L, 12289L), (998244353L, 769L), (786433L, 65537L))

  /** h(k) = ((k mod P)·a + b) mod P, non-negative for any long key.
    * Pairwise-independent — enough for CMS bucket placement, whose
    * guarantees only need the collision probability bound.
    */
  private def hmod(key: Column, a: Long, b: Long): Column =
    (pmod(key.cast("long"), lit(P)) * a + b) % P

  /** hmod with two xor-shift tempering rounds. A plain linear hash maps
    * sequential keys to an arithmetic progression mod P, which skews
    * HLL's leading-zero statistic (observed +74% on dense ids); the
    * temper breaks the lattice and restores ideal-hash error (±1σ on
    * the same inputs). Every step stays below 2^61, so the identical
    * pipeline runs in oracle SQL with BIGINT xor/shift/mod.
    */
  private def temper(key: Column, a: Long, b: Long, a2: Long): Column = {
    val h1 = hmod(key, a, b)
    val h2 = h1.bitwiseXOR(shiftright(h1, 15))
    val h3 = (h2 * a2) % P
    h3.bitwiseXOR(shiftright(h3, 13))
  }

  private def bucketCells(key: Column, width: Int, seeds: Seq[(Long, Long)]): Column =
    array(seeds.zipWithIndex.map { case ((a, b), d) =>
      struct(lit(d).as("d"), (hmod(key, a, b) % width).as("bucket"))
    }: _*)

  /** Count-Min cell counts in ONE pass: (d, bucket, c) with
    * `c = Σ 1` over rows hashing to that cell. The explode is a ×depth
    * row expansion *before* partial aggregation, so the shuffle moves
    * at most depth·width rows per task, never the data.
    */
  def cmsCells(rows: DataFrame, key: Column, width: Int,
               seeds: Seq[(Long, Long)] = CmsSeeds): DataFrame =
    rows.select(explode(bucketCells(key, width, seeds)).as("cell"))
      .groupBy(col("cell.d").as("d"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** CMS point lookups: est(k) = min over depths of the bucket count
    * (an over-estimate by construction; 0 iff the key was never seen).
    * Probes are tiny and broadcast; the sketch side never re-shuffles.
    */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, key: Column, width: Int,
                  seeds: Seq[(Long, Long)] = CmsSeeds): DataFrame = {
    val pb = probes.select(key.cast("long").as("k"))
      .select(col("k"), explode(bucketCells(col("k"), width, seeds)).as("cell"))
      .select(col("k"), col("cell.d").as("d"), col("cell.bucket").as("bucket"))
    broadcast(pb).join(cells, Seq("d", "bucket"), "left")
      .groupBy("k")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** The tempered hash as a public Column — shared by HLL registers and
    * KMV sampling so every sketch sees the same key → hash mapping (and
    * every oracle replays one definition). */
  def temperedHash(key: Column, a: Long = 1000003L, b: Long = 12289L,
                   a2: Long = 786433L): Column = temper(key, a, b, a2)

  /** Cumulative Poisson(1) CDF at scale P, floor'd — fixed literals
    * shared verbatim with oracle SQL so the inverse-CDF draw is pure
    * integer comparison on both engines (never runtime exp/factorial). */
  val PoissonCdfP: Seq[Long] = Seq(
    790015083L, 1580030167L, 1975037709L, 2106706890L, 2139624185L,
    2146207644L, 2147304887L, 2147461637L)

  /** Deterministic pseudo-Poisson(1) weight for (key, replica) — the
    * Poisson-bootstrap draw: one [[temperedHash]] of key·reps+replica
    * (the temper breaks the sequential-key lattice), then the weight is
    * how many CDF thresholds the uniform clears. All-integer (no string
    * hash on the hot path) and replayed bit-for-bit by oracle SQL. */
  def poissonWeight(key: Column, replica: Column, reps: Int): Column = {
    val u = temperedHash(key * reps + replica)
    PoissonCdfP.map(t => when(u >= t, 1L).otherwise(0L)).reduce(_ + _)
  }

  /** Bits of hash left after taking the register index (m = 2^p). */
  def hllRemWidth(m: Int): Int = {
    require(m > 0 && (m & (m - 1)) == 0, s"m must be a power of two, got $m")
    31 - Integer.numberOfTrailingZeros(m)
  }

  /** HLL register table per group: (groupCols..., register, rho) with
    * rho = max over keys of the 1-indexed leading-1 position in the
    * remaining hash bits (0 for never-hit registers — the spine join
    * materializes all m of them so downstream estimate math is total).
    * Register tables are MERGEABLE: element-wise max of two tables is
    * the table of the union — see the rolled-up "ALL" row in
    * SparkEntry.anHllDistinct.
    */
  /** The streamable half of [[hllRegisters]]: max-rho per HIT register
    * only (no spine fill). A single groupBy-max, so it runs unchanged
    * as a Structured Streaming aggregation (update/complete mode) —
    * max is monotone, which is what makes HLL state incrementally
    * maintainable; apply the spine + estimate math to the snapshot. */
  def hllHits(rows: DataFrame, key: Column, m: Int, groupCols: Seq[String] = Nil,
              a: Long = 1000003L, b: Long = 12289L, a2: Long = 786433L): DataFrame = {
    val remWidth = hllRemWidth(m)
    val h = temper(key, a, b, a2)
    // h < 2^31 so the double division below is exact; bin() yields the
    // minimal binary string, so length(bin(rem))-1 = floor(log2 rem)
    val rem = floor(h / lit(m)).cast("long")
    val rho = when(rem === 0, lit(remWidth + 1))
      .otherwise(lit(remWidth) + 1 - length(bin(rem)))
    val gCols = groupCols.map(col)
    rows.select(gCols :+ (h % m).as("register") :+ rho.as("rho"): _*)
      .groupBy(gCols :+ col("register"): _*)
      .agg(max("rho").as("rho"))
  }

  def hllRegisters(rows: DataFrame, key: Column, m: Int, groupCols: Seq[String] = Nil,
                   a: Long = 1000003L, b: Long = 12289L, a2: Long = 786433L): DataFrame = {
    val hit = hllHits(rows, key, m, groupCols, a, b, a2)
    val gCols = groupCols.map(col)
    val spark = rows.sparkSession
    val regs = spark.range(0, m).select(col("id").as("register"))
    val spine =
      if (groupCols.isEmpty) regs
      else rows.select(gCols: _*).distinct().crossJoin(broadcast(regs))
    spine.join(hit, groupCols :+ "register", "left")
      .select(gCols ++ Seq(col("register"), coalesce(col("rho"), lit(0)).as("rho")): _*)
  }

  /** Exact-integer harmonic sum: z_scaled = Σ_j S >> rho_j with
    * S = 2^(remWidth+1). Every term is a power of two, so the sum is
    * order-independent and bit-identical across engines — no floating
    * point until the final estimate division.
    */
  def hllZScaled(m: Int): Column = {
    val s = 1L << (hllRemWidth(m) + 1)
    sum(expr(s"shiftright(cast($s as bigint), rho)")).as("z_scaled")
  }

  /** alpha_m · m² · S — the numerator of the HLL estimate, precomputed
    * as one double so the oracle SQL can embed the identical literal.
    */
  def hllAlphaNum(m: Int): Double = {
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    alpha * m * m * (1L << (hllRemWidth(m) + 1)).toDouble
  }

  /** est = floor(alpha_m·m²·S / z_scaled): single double division then
    * floor — deterministic given identical z_scaled.
    */
  def hllEstimate(m: Int, zScaled: Column): Column =
    floor(lit(hllAlphaNum(m)) / zScaled).cast("long")

  /** Set-operation estimates from two register tables (same m, same
    * hash): |A∪B| comes from the element-wise-max merged table — an
    * HLL-native operation — and |A∩B| by inclusion-exclusion
    * est(A)+est(B)−est(A∪B), clamped at 0. One row:
    * (est_a, est_b, est_union, est_intersect). Intersection error
    * compounds the three estimates' errors, so it is a triage number,
    * not a measurement — fine for "how much does corpus B overlap A"
    * routing decisions at 100 TB, where the exact answer is a join too
    * far. */
  def hllSetEstimates(regsA: DataFrame, regsB: DataFrame, m: Int): DataFrame = {
    def z(regs: DataFrame, name: String): DataFrame =
      regs.agg(hllZScaled(m)).select(hllEstimate(m, col("z_scaled")).as(name))
    val zu = z(
      regsA.unionByName(regsB).groupBy("register").agg(max("rho").as("rho")),
      "est_union")
    z(regsA, "est_a").crossJoin(z(regsB, "est_b")).crossJoin(zu)
      .withColumn("est_intersect",
        greatest(lit(0L), col("est_a") + col("est_b") - col("est_union")))
  }
}

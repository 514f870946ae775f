package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spherical k-means trainer for the IVF coarse quantizer.
  *
  * Lloyd's iterations, Spark-shaped: assignment is a map-only projection
  * (the centroid matrix rides into codegen as a reference object —
  * graft.functions.NearestCentroid; no join, no shuffle), and the
  * update is one (cell, pos) partial-aggregated shuffle whose result is
  * k × dim running sums — the only thing that ever reaches the driver.
  * At 100 TB the per-iteration cost is a single scan + a k*dim-sized
  * aggregate, which is the textbook distributed k-means layout.
  *
  * Spherical variant: centroids are unit-normalized after every update,
  * so argmax-dot assignment == nearest-by-cosine — the same metric the
  * IVF probe path (VectorOps.ivfTopK) ranks with. Deterministic: init
  * is the k lowest-id vectors, ties break to the lowest cell index, no
  * RNG anywhere.
  */
object KMeans {

  /** @return k centroids (unit-normalized, row per cell), in cell order.
    *         Cells that lose all members keep their previous centroid. */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          k: Int, iters: Int): Array[Array[Double]] = {
    val v = df.select(col(idCol).as("id"), VectorOps.toDouble(col(vecCol)).as("v"))
    // fewer vectors than k → fewer cells; index strictly by cents.length
    // so the native kernel never reads past the centroid matrix
    val init = v.orderBy(col("id")).limit(k)
      .collect().map(r => unit(r.getSeq[Double](1).toArray))
    lloyd(v, init, iters)
  }

  /** Incremental re-clustering: re-run Lloyd's seeded from an already
    * trained quantizer over a fresh (appended/drifted) corpus slice.
    * The warm start converges in 1–2 iterations when drift is mild, so
    * a 100 TB pipeline can keep its IVF cells current with periodic
    * cheap refits instead of full retrains — and cell ids stay aligned
    * with the previous model (cells move, they are not re-created), so
    * previously assigned partitions only need reassignment where the
    * moved boundary actually crosses them. */
  def refit(df: DataFrame, idCol: String, vecCol: String,
            centroids: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    val v = df.select(col(idCol).as("id"), VectorOps.toDouble(col(vecCol)).as("v"))
    lloyd(v, centroids.map(unit), iters)
  }

  private def unit(x: Array[Double]): Array[Double] = {
    val n = math.sqrt(x.map(d => d * d).sum)
    if (n == 0.0) x else x.map(_ / n)
  }

  /** Engine-portable INTEGER spherical k-means — the trained-quantizer
    * path promoted from rows-only to the full hash oracle (round-10
    * verdict #6): every training step is exact integer or correctly-
    * rounded IEEE arithmetic, so a SQL engine replays the fit
    * bit-for-bit with BIGINT `*`/`%`/`//`, one sqrt and one floor per
    * centroid coordinate.
    *
    *  - vectors quantize in-engine to BIGINT micro-units
    *    (round(x·1e6), half-away-from-zero on both engines);
    *  - centroids live in micro-units, unit-normalized as
    *    floor(c_i·1e6 / sqrt(Σc_j²)) — products ≤ ~2^42 stay exact in
    *    double, sqrt and the division are correctly rounded, floor is
    *    floor: identical on every IEEE-754 engine;
    *  - assignment is argmax of the RAW integer dot (ties → lowest
    *    cell), run through the codegen'd double kernel — every dot is
    *    an exact integer < 2^53, so the double image IS the integer;
    *  - the update is an exact BIGINT coordinate sum and a truncating
    *    division by the member count (Scala `/` on Long ≡ SQL `//`).
    *
    * Same distributed shape as [[fit]]: map-only assignment, one
    * (cell, pos) partial-aggregated shuffle per iteration, k×dim to
    * the driver. Fixed `iters` (no early stop) so the oracle's unroll
    * depth is part of the contract. */
  def fitIntPortable(df: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int): Array[Array[Long]] = {
    val vq = df.select(col(idCol).as("id"),
      transform(VectorOps.toDouble(col(vecCol)),
        x => round(x * lit(1000000.0)).cast("long")).as("q"))
    var cents: Array[Array[Long]] = vq.orderBy(col("id")).limit(k)
      .collect().map(r => unitInt(r.getSeq[Long](1).toArray))
    var it = 0
    while (it < iters) {
      val assigned = vq.withColumn("cell",
        graft.functions.VectorExprs.nearest_centroid(
          transform(col("q"), _.cast("double")),
          cents.flatten.map(_.toDouble), cents.length))
      val sums = assigned
        .select(col("cell"), posexplode(col("q")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone) // empty cells keep their centroid
      val touched = sums.map(_.getInt(0)).distinct
      val mean = touched.map(c => c -> next(c).clone).toMap
      sums.foreach { r =>
        mean(r.getInt(0))(r.getInt(1)) = r.getLong(2) / r.getLong(3)
      }
      // a degenerate all-zero mean keeps the previous centroid too
      // (same carry rule as an empty cell — mirrored in the SQL replay)
      touched.foreach { c =>
        val m = mean(c)
        if (m.exists(_ != 0L)) next(c) = unitInt(m)
      }
      cents = next
      it += 1
    }
    cents
  }

  /** floor(x_i·1e6 / ‖x‖) per coordinate — micro-unit normalization
    * with only exact-integer and correctly-rounded IEEE steps (see
    * [[fitIntPortable]]). Zero vectors pass through. */
  private def unitInt(x: Array[Long]): Array[Long] = {
    var s = 0L
    var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    if (s == 0L) x
    else {
      val n = math.sqrt(s.toDouble)
      x.map(v => math.floor(v.toDouble * 1000000.0 / n).toLong)
    }
  }

  /** Plain (L2) Lloyd's — the variant product quantization needs:
    * sub-codebook centroids are MEANS, not directions, so no unit
    * normalization, and assignment is nearest-by-Euclidean.
    *
    * Same distributed shape as [[fit]] (map-only assignment, one
    * partial-aggregated (cell, pos) shuffle per iteration, k×dim to
    * the driver). Assignment reuses the argmax-dot native kernel via
    * the bias trick: argmin ‖x−c‖² == argmax (x·c − ‖c‖²/2), i.e. the
    * dot of [x, 1] against [c, −‖c‖²/2] — one extra coordinate instead
    * of a second kernel. Deterministic init: the k lowest-id vectors. */
  def fitL2(df: DataFrame, idCol: String, vecCol: String,
            k: Int, iters: Int): Array[Array[Double]] = {
    val v = df.select(col(idCol).as("id"), VectorOps.toDouble(col(vecCol)).as("v"))
    var cents = v.orderBy(col("id")).limit(k)
      .collect().map(_.getSeq[Double](1).toArray)
    var it = 0
    while (it < iters) {
      val assigned = v.withColumn("cell",
        graft.functions.VectorExprs.nearest_centroid(
          concat(col("v"), array(lit(1.0))), augmented(cents), cents.length))
      val sums = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x").cast("decimal(38,15)")).cast("double").as("sx"),
          count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone) // empty cells keep their centroid
      sums.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3))
      cents = next
      it += 1
    }
    cents
  }

  /** Centroids flattened with the −‖c‖²/2 bias coordinate appended —
    * the reference object for L2-nearest assignment via the dot kernel. */
  private[similarity] def augmented(cents: Array[Array[Double]]): Array[Double] =
    cents.flatMap(c => c :+ (-0.5 * c.map(d => d * d).sum))

  /** Engine-portable INTEGER plain-L2 Lloyd's over an already-quantized
    * `(id, v: array<bigint>)` frame — the [[fitIntPortable]] recipe for
    * the product-quantization sub-codebooks (means, not directions: no
    * normalization). Assignment is argmin ‖x−c‖² == argmax
    * (x·c − ‖c‖²/2) through the double dot kernel — with micro-unit
    * integers every dot term, partial sum and the power-of-two-scaled
    * bias are exact in double, so the double argmax IS the integer
    * argmax a SQL engine computes as 2·dot − ‖c‖² in BIGINT (ties →
    * lowest code on both). Update: exact BIGINT sums, truncating
    * division by the member count; empty cells carry. */
  def fitL2IntPortable(vq: DataFrame, k: Int, iters: Int): Array[Array[Long]] = {
    var cents: Array[Array[Long]] = vq.orderBy(col("id")).limit(k)
      .collect().map(_.getSeq[Long](1).toArray)
    var it = 0
    while (it < iters) {
      val aug = cents.flatMap(c =>
        c.map(_.toDouble) :+ (-0.5 * c.map(x => (x * x).toDouble).sum))
      val assigned = vq.withColumn("cell",
        graft.functions.VectorExprs.nearest_centroid(
          concat(transform(col("v"), _.cast("double")), array(lit(1.0))),
          aug, cents.length))
      val sums = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone) // empty cells keep their centroid
      sums.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getLong(2) / r.getLong(3))
      cents = next
      it += 1
    }
    cents
  }

  private def lloyd(v: DataFrame, init: Array[Array[Double]],
                    iters: Int): Array[Array[Double]] = {
    var cents: Array[Array[Double]] = init
    var it = 0
    while (it < iters) {
      val assigned = v.withColumn("cell",
        graft.functions.VectorExprs.nearest_centroid(col("v"), cents.flatten, cents.length))
      // decimal sum: order-independent across partition merges, so the
      // trained centroids are bit-identical run to run. unit(sum) ==
      // unit(mean) — normalization absorbs the 1/n factor.
      // Driver-state bound: this collect is k×dim rows (the model),
      // never corpus-sized — partial aggregation collapses the shuffle
      // to one row per (cell, pos) per task. Lineage is re-planned from
      // the source each iteration (no iterative frame to checkpoint);
      // on preemptible executors the only recovery cost is re-scanning
      // the assignment pass.
      val sums = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("x").cast("decimal(38,15)")).cast("double").as("sx"))
        .collect()
      val next = cents.map(_.clone)
      sums.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      cents = next.map(unit)
      it += 1
    }
    cents
  }

  /** Mean cosine of each vector to its assigned centroid — the spherical
    * analogue of inertia (higher is tighter; non-decreasing over
    * Lloyd's iterations up to normalization). */
  def meanAssignedCosine(df: DataFrame, idCol: String, vecCol: String,
                         cents: Array[Array[Double]]): Double = {
    val v = df.select(VectorOps.toDouble(col(vecCol)).as("v"))
      .withColumn("cell",
        graft.functions.VectorExprs.nearest_centroid(col("v"), cents.flatten, cents.length))
    val centsDf = centroidsFrame(df.sparkSession, cents)
      .select(col("cell_id").as("cell"), col("cv"))
    v.join(broadcast(centsDf), "cell")
      .select(avg(VectorOps.dot(col("v"), col("cv")) / VectorOps.norm(col("v"))).as("m"))
      .head().getDouble(0)
  }

  /** Trained centroids as a (cell_id, cv) frame, for the IVF probe path. */
  def centroidsFrame(spark: org.apache.spark.sql.SparkSession,
                     cents: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
      .toSeq.toDF("cell_id", "cv")
  }
}

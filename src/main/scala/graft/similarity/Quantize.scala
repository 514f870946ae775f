package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) embedding quantization: per-vector affine map onto
  * 0..255 — the standard 4× storage cut (float32 → uint8) for
  * petabyte-scale embedding stores, with the dequantization error kept
  * as a first-class quality metric.
  *
  * Everything is per-row map-only Column algebra (codegen'd, no UDFs,
  * no shuffle): quantize at ingest, store the codes + (vmin, scale)
  * pair, dequantize on read or score directly in the quantized domain.
  *
  * Rounding uses floor(x + 0.5) (half-up) rather than round() so the
  * codes are bit-identical across engines — SQL ROUND ties-to-even vs
  * half-away differs between engines on exact .5 grid points.
  */
object Quantize {

  /** Per-vector quantization parameters: (min, max, scale) with
    * scale = (max - min) / 255; constant vectors get scale 0 and are
    * handled exactly (all codes 0, dequantize back to vmin). */
  def params(v: Column): (Column, Column, Column) = {
    val vmin = array_min(v)
    val vmax = array_max(v)
    (vmin, vmax, (vmax - vmin) / lit(255.0))
  }

  /** uint8 codes (as array<int>, values 0..255). */
  def encode(v: Column, vmin: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0, lit(0))
        .otherwise(floor((x - vmin) / scale + lit(0.5)).cast("int")))

  /** Symmetric (zero-preserving) int8 scale: max|x| / 127. Unlike the
    * affine map above there is NO offset, so the code vector stays
    * PARALLEL to the input and code-domain cosine tracks true cosine —
    * the right quantization for a similarity candidate scan, where the
    * affine form's per-vector shift rotates every angle. */
  def symScale(v: Column): Column =
    array_max(transform(v, x => abs(x))) / lit(127.0)

  /** Symmetric codes in [-127, 127] (half-up rounding, like encode). */
  def encodeSym(v: Column, s: Column): Column =
    transform(v, x =>
      when(s === 0, lit(0)).otherwise(floor(x / s + lit(0.5)).cast("int")))

  /** Dequantized vector from codes + params. */
  def decode(codes: Column, vmin: Column, scale: Column): Column =
    transform(codes, q => vmin + q.cast("double") * scale)

  /** Mean squared dequantization error of one vector (sequential fold —
    * deterministic summation order). */
  def mse(v: Column, vmin: Column, scale: Column): Column = {
    val err = zip_with(v, decode(encode(v, vmin, scale), vmin, scale),
      (x, d) => (x - d) * (x - d))
    aggregate(err, lit(0.0), (acc, e) => acc + e) / size(v)
  }

  /** Quantization report frame: id, params, and per-vector MSE — the
    * quality gate a pipeline runs before committing to int8 storage. */
  def report(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val (vmin, vmax, scale) = params(v)
    df.select(col(idCol).as("vec_id"),
      round(vmin, 6).as("v_min"),
      round(vmax, 6).as("v_max"),
      round(mse(v, vmin, scale), 12).as("mse"))
  }

  // -------------------------------------------------- product quantization

  /** Trained PQ codebooks: `m` contiguous subspaces of `subDim` dims,
    * `k` centroids each. A vector's code is m small ints — m bytes of
    * storage (k ≤ 256) against 4·dim bytes of float32: 32× compression
    * at dim=64/m=8 vs int8's 4×, traded against coarser reconstruction
    * (see the recall spec). Model size is m·k·subDim doubles — driver/
    * broadcast-sized, like the IVF coarse quantizer. */
  final case class PqModel(m: Int, k: Int, subDim: Int,
                           codebooks: Array[Array[Array[Double]]])

  /** Train per-subspace codebooks with plain-L2 Lloyd's
    * ([[KMeans.fitL2]]): m independent small k-means over sliced
    * sub-vectors. Deterministic (lowest-id init, decimal sums). */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
              dim: Int, m: Int = 8, k: Int = 16, iters: Int = 2): PqModel = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    val v = col(vecCol).cast("array<double>")
    val books = (0 until m).map { s =>
      KMeans.fitL2(
        df.select(col(idCol).as("id"), slice(v, s * sub + 1, sub).as("v")),
        "id", "v", k, iters)
    }.toArray
    PqModel(m, k, sub, books)
  }

  /** Integer-portable PQ model: micro-unit BIGINT codebooks trained by
    * [[KMeans.fitL2IntPortable]] — every training / encode / ADC-rank
    * step is exact-integer or correctly-rounded IEEE, so a SQL oracle
    * retrains and replays the whole pipeline (the sim_pq hash-oracle
    * promotion; float [[PqModel]] remains the general-purpose form). */
  final case class PqIntModel(m: Int, k: Int, subDim: Int,
                              codebooks: Array[Array[Array[Long]]])

  /** Train integer micro-unit per-subspace codebooks (fixed unroll,
    * in-engine round(x·1e6) quantization — the fitIntPortable recipe,
    * L2 flavor). */
  def pqTrainIntPortable(df: DataFrame, idCol: String, vecCol: String,
                         dim: Int, m: Int = 8, k: Int = 16,
                         iters: Int = 2): PqIntModel = {
    require(dim % m == 0, s"dim $dim must split evenly into $m subspaces")
    val sub = dim / m
    val vq = df.select(col(idCol).as("id"),
      transform(VectorOps.toDouble(col(vecCol)),
        x => round(x * lit(1000000.0)).cast("long")).as("q"))
    val books = (0 until m).map { s =>
      KMeans.fitL2IntPortable(
        vq.select(col("id"), slice(col("q"), s * sub + 1, sub).as("v")), k, iters)
    }.toArray
    PqIntModel(m, k, sub, books)
  }

  /** Integer PQ codes: per subspace, argmin-L2 codebook entry via the
    * same exact-double bias kernel as training. `v` must already be the
    * micro-unit BIGINT array. */
  def pqEncodeInt(v: Column, model: PqIntModel): Column =
    array((0 until model.m).map { s =>
      val aug = model.codebooks(s).flatMap(c =>
        c.map(_.toDouble) :+ (-0.5 * c.map(x => (x * x).toDouble).sum))
      graft.functions.VectorExprs.nearest_centroid(
        concat(transform(slice(v, s * model.subDim + 1, model.subDim), _.cast("double")),
          array(lit(1.0))),
        aug, model.k)
    }: _*)

  /** Reconstructed micro-unit vector from integer PQ codes. */
  def pqDecodeInt(codes: Column, model: PqIntModel): Column =
    concat((0 until model.m).map { s =>
      val bk = typedlit(model.codebooks(s).flatten.toSeq)
      slice(bk, element_at(codes, s + 1) * model.subDim + 1, lit(model.subDim))
    }: _*)

  /** ADC top-k against the integer model, hash-oracle-exact end to end:
    * sim = int-dot(q_int, reconstructed_int) / (‖q_int‖·‖rec_int‖) —
    * the dot and both squared norms are exact integers below 2^53 (the
    * double kernel computes them exactly in any fold order), each norm
    * is one correctly-rounded sqrt, and the emission rounds to 6 —
    * bit-identical in any IEEE engine. Same distributed shape as
    * [[pqTopK]]: encode/decode are map-only, the query side broadcasts,
    * the corpus never shuffles. */
  def pqTopKInt(embeddings: DataFrame, queries: DataFrame, k: Int, model: PqIntModel,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = embeddings.sparkSession
    val quant: Column => Column =
      v => transform(VectorOps.toDouble(v), x => round(x * lit(1000000.0)).cast("long"))
    def asD(c: Column) = transform(c, _.cast("double"))
    val rec = embeddings.select(col(idCol).as("neighbor_id"),
        asD(pqDecodeInt(pqEncodeInt(quant(col(vecCol)), model), model)).as("nv"))
      .withColumn("nn", VectorOps.norm(col("nv")))
      .repartition(spark.sparkContext.defaultParallelism) // see bruteForceTopK
    val q = queries.select(col(idCol).as("query_id"), asD(quant(col(vecCol))).as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    rec.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        round(VectorOps.dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** PQ codes (array<int>, length m): per subspace, the L2-nearest
    * codebook entry — map-only native kernels, one per subspace. */
  def pqEncode(v: Column, model: PqModel): Column =
    array((0 until model.m).map { s =>
      graft.functions.VectorExprs.nearest_centroid(
        concat(slice(v.cast("array<double>"), s * model.subDim + 1, model.subDim),
          array(lit(1.0))),
        KMeans.augmented(model.codebooks(s)), model.k)
    }: _*)

  /** Reconstructed vector from PQ codes: per-subspace codebook lookup
    * (a slice of the flattened codebook literal), concatenated. */
  def pqDecode(codes: Column, model: PqModel): Column =
    concat((0 until model.m).map { s =>
      val bk = typedlit(model.codebooks(s).flatten.toSeq)
      slice(bk, element_at(codes, s + 1) * model.subDim + 1, lit(model.subDim))
    }: _*)

  /** Asymmetric-distance top-k: corpus vectors are scored through their
    * PQ reconstruction (what a production store would hold), queries
    * stay exact — the standard ADC trade. Output contract matches
    * VectorOps.bruteForceTopK: (query_id, neighbor_id, rank, sim). */
  def pqTopK(embeddings: DataFrame, queries: DataFrame, k: Int, model: PqModel,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = embeddings.sparkSession
    val rec = embeddings.select(col(idCol).as("neighbor_id"),
        pqDecode(pqEncode(col(vecCol), model), model).as("nv"))
      .withColumn("nn", VectorOps.norm(col("nv")))
      .repartition(spark.sparkContext.defaultParallelism) // see bruteForceTopK
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qn", VectorOps.norm(col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    rec.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim",
        round(VectorOps.dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }
}

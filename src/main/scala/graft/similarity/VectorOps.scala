package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity over `array<float>` embedding columns.
  *
  * Kernels are native codegen'd expressions (graft.functions.DotProduct:
  * a sequential primitive loop — deterministic summation order, no UDF,
  * no per-element lambda dispatch). Elements are cast to double before
  * arithmetic so precision matches any double-based oracle to ~1e-14
  * relative.
  */
object VectorOps {

  /** Elementwise cast to array<double> (a vectorized Cast, not an
    * interpreted transform lambda). */
  def toDouble(v: Column): Column = v.cast("array<double>")

  /** Default circuit-breaker for the documented O(n²)/O(q·n) exact
    * baselines: they are oracles for the bucketed paths, not the scale
    * path, and must not silently run all-pairs on a 100 TB corpus. */
  val QuadraticGuardRows: Int = 2000000

  /** Fails fast when `df` exceeds `maxRows` (LocalLimit stops the scan
    * early, so the check is cheap even on a huge input). Raise the cap
    * explicitly to run an exact baseline on a larger corpus. */
  private[graft] def guardQuadratic(df: DataFrame, maxRows: Int,
                                    op: String, alt: String): Unit = {
    val n = df.select(df.columns.head).limit(maxRows + 1).count()
    require(n <= maxRows,
      s"$op is an exact quadratic baseline guarded at $maxRows rows; " +
        s"use $alt at scale, or raise the cap explicitly")
  }

  /** Dot product: native codegen'd kernel (sequential loop — same
    * summation order and results as a zip_with/aggregate fold, ~50x
    * faster; see graft.functions.VectorExprs). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: exact baseline (and the verifier for the
    * LSH path). The query side is broadcast, so the big side streams
    * with no shuffle; cost is O(|queries| * n) — use only when the
    * query set is small or as an oracle at sampled scale.
    *
    * Ranking is over `round(cosine, 6)` with id tie-break, which makes
    * the top-k reproducible across engines and partition orders even
    * when two neighbors differ by < 1e-6.
    */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     maxCorpusRows: Int = QuadraticGuardRows): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    guardQuadratic(embeddings, maxCorpusRows, "bruteForceTopK",
      "lshTopK or ivfTopK (bucketed ANN)")
    // norms are computed once per row (not once per pair); the cosine
    // formula dot/(|a|*|b|) is unchanged, so results match cosine().
    val spark = embeddings.sparkSession
    // corpus side streams against the broadcast query set; a small
    // single-file corpus scan would otherwise put the whole O(q·n)
    // work on one partition — spread it first (shuffle is O(n), the
    // scan below it is O(q·n))
    val e = embeddings.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("nv"))
      .withColumn("nn", norm(col("nv")))
      .repartition(spark.sparkContext.defaultParallelism)
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    e.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Two-stage retrieval: int8-quantized candidate generation, exact
    * cosine rerank — the standard recall/throughput trade where the
    * first pass streams 4×-smaller codes (a memory-bandwidth scan) and
    * the expensive float cosine only touches the top-C survivors per
    * query. Quantization is SYMMETRIC ([[Quantize.encodeSym]]): codes
    * stay parallel to the input, so the candidate score — code dot
    * over the root of the code-norm product, a ratio of EXACT integers
    * (≤64·127² each, far inside 2^53) — tracks true cosine and is
    * bit-identical on any engine (IEEE division and sqrt are correctly
    * rounded). Candidate ties break on neighbor id; the rerank rounds
    * at 6 like [[bruteForceTopK]], so the final ordering is
    * reproducible across engines and partition orders. */
  def quantizedRerankTopK(embeddings: DataFrame, queries: DataFrame,
                          c: Int, k: Int,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          maxCorpusRows: Int = QuadraticGuardRows): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(c >= k, s"candidate pool c=$c must cover the final k=$k")
    guardQuadratic(embeddings, maxCorpusRows, "quantizedRerankTopK",
      "lshRerankTopK (the production three-stage alias: LSH band candidates " +
        "-> int8 scoring -> exact rerank; plan c with LshTuning.rerankBudget)")
    val spark = embeddings.sparkSession
    def coded(df: DataFrame, id: String, vec: String,
              codes: String, norm2: String): DataFrame = {
      val v = toDouble(col(vecCol))
      // codes as doubles so the dot kernel applies; values are exact
      // small ints, so the integer dots are exact whatever the sum order
      val q = Quantize.encodeSym(v, Quantize.symScale(v)).cast("array<double>")
      df.select(col(idCol).as(id), v.as(vec), q.as(codes))
        .withColumn(norm2, dot(col(codes), col(codes)))
    }
    val e = coded(embeddings, "neighbor_id", "nv", "nq", "nn2")
      .repartition(spark.sparkContext.defaultParallelism) // see bruteForceTopK
    val q = coded(queries, "query_id", "qv", "qq", "qn2")
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("qscore").desc, col("neighbor_id"))
    val wFinal = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    e.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("qscore",
        dot(col("qq"), col("nq")) / sqrt(col("qn2") * col("nn2")))
      .withColumn("crank", row_number().over(wCand))
      .filter(col("crank") <= c)
      .withColumn("sim", round(dot(col("qv"), col("nv")) /
        (norm(col("qv")) * norm(col("nv"))), 6))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** Random-hyperplane LSH signature: `nBits` sign bits packed in a
    * long. Planes are derived from a seeded splitmix64 (deterministic,
    * no stored model). The scale path for ANN: group by signature
    * prefix buckets, search within buckets.
    */
  def lshSignature(v: Column, dim: Int, nBits: Int = 16, seed: Long = 42L): Column =
    graft.functions.VectorExprs.lsh_signature(
      toDouble(v), hyperplanes(dim, nBits, seed).flatten.toArray, nBits)

  /** Deterministic pseudo-random unit-free hyperplanes (splitmix64 →
    * uniform in [-1, 1); normalization is irrelevant for sign tests). */
  def hyperplanes(dim: Int, nBits: Int, seed: Long): Seq[Seq[Double]] = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Seq.fill(nBits)(Seq.fill(dim)((next() >>> 11) * (1.0 / (1L << 52)) - 1.0))
  }

  /** IVF-style approximate top-k: every vector is assigned to its
    * nearest coarse-quantizer cell, and each query probes its `nProbe`
    * nearest cells. Shuffles carry (cell_id, id, vec); the pair space is
    * pruned to probed cells — the standard IVF trade of recall for
    * fan-out.
    *
    * `centroids`: pass a trained quantizer (KMeans.fit) for real cells;
    * when None, the first `nCells` vectors by id serve as centroids — a
    * k-means-free deterministic stand-in with the same plumbing. */
  def ivfTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              centroids: Option[Array[Array[Double]]] = None): DataFrame =
    ivfTopKImpl(embeddings, queries, k, nCells, nProbe, idCol, vecCol,
      centroids, identity)

  /** `storedVec` maps the corpus vector to what the index actually
    * stores for ranking (identity for raw float vectors; the PQ
    * reconstruction for [[ivfPqTopK]]). Cell ASSIGNMENT always uses
    * the original vector — index-time information — only ranking goes
    * through the stored form. */
  private def ivfTopKImpl(embeddings: DataFrame, queries: DataFrame, k: Int,
                          nCells: Int, nProbe: Int,
                          idCol: String, vecCol: String,
                          centroids: Option[Array[Array[Double]]],
                          storedVec: Column => Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    // Centroids live on the driver (k × dim — model-sized, same as
    // KMeans.fit) and unit-normalize so argmax-dot == nearest-by-cosine;
    // cell assignment is then a MAP-ONLY native kernel on both sides —
    // no crossJoin × nCells expansion, no per-id window shuffle+sort.
    def unit(x: Array[Double]): Array[Double] = {
      val n = math.sqrt(x.map(d => d * d).sum)
      if (n == 0.0) x else x.map(_ / n)
    }
    val centArr: Array[Array[Double]] = (centroids match {
      case Some(cs) => cs
      case None => e.orderBy(col("id")).limit(nCells)
        .collect().map(_.getSeq[Double](1).toArray)
    }).map(unit)
    val flat = centArr.flatten
    val kCells = centArr.length
    val cells = e
      .withColumn("cell_id", graft.functions.VectorExprs.nearest_centroid(col("v"), flat, kCells))
      .select(col("id").as("neighbor_id"), storedVec(col("v")).as("nv"), col("cell_id"))
      .withColumn("nn", norm(col("nv")))
    val probed = queries.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("n", norm(col("v")))
      .withColumn("cell_id", explode(
        graft.functions.VectorExprs.nearest_centroids_n(col("v"), flat, kCells, nProbe)))
      .select(col("id").as("query_id"), col("v").as("qv"), col("n").as("qn"), col("cell_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    // sim is computed BEFORE the pair dedup so the groupBy shuffles
    // (query_id, neighbor_id, sim) scalars, never the vectors; a pair
    // probed via several cells yields identical sims, so max == any.
    // The probed QUERY side broadcasts (it's the small side by design —
    // without the hint, unknown post-window stats fall back to a
    // sort-merge join that shuffles the whole corpus).
    cells.join(broadcast(probed), Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .groupBy(col("query_id"), col("neighbor_id")).agg(max(col("sim")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** IVF+PQ composed index (the standard billion-scale ANN layout —
    * Jégou et al., "Product Quantization for Nearest Neighbor Search",
    * TPAMI'11): the IVF coarse quantizer prunes the candidate set to
    * the query's nProbe nearest cells, and within them candidates are
    * ranked through their PQ reconstruction (asymmetric distance) —
    * the corpus stores m-byte codes, not float vectors. Same plan
    * shape as [[ivfTopK]] (map-only cell assignment both sides, query
    * side broadcast, scalar-only pair dedup); the decode is fused into
    * the scan projection. Exact queries, compressed corpus: recall
    * loss comes from cell pruning ∘ code coarseness, both spec'd. */
  def ivfPqTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
                model: Quantize.PqModel,
                nCells: Int = 16, nProbe: Int = 4,
                idCol: String = "vec_id", vecCol: String = "embedding",
                centroids: Option[Array[Array[Double]]] = None): DataFrame =
    ivfTopKImpl(embeddings, queries, k, nCells, nProbe, idCol, vecCol,
      centroids, v => Quantize.pqDecode(Quantize.pqEncode(v, model), model))

  /** [[lshTopK]] with the band layout chosen analytically from a recall
    * target by [[LshTuning.tuneCosine]] instead of hand-picked
    * constants: the planner minimizes total signature bits (= explode
    * fan-out = shuffle volume) subject to the recall floor at
    * `simThreshold` and the candidate-probability ceiling `maxBgProb`
    * for background pairs at `bgSim`. */
  def lshTopKAuto(embeddings: DataFrame, queries: DataFrame, k: Int, dim: Int,
                  simThreshold: Double = 0.7, recall: Double = 0.9,
                  maxBits: Int = 64, bgSim: Double = 0.0, maxBgProb: Double = 1.0,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val plan = LshTuning.tuneCosine(simThreshold, recall, maxBits, bgSim, maxBgProb)
    lshTopK(embeddings, queries, k, dim,
      nBits = plan.totalHashes, nBands = plan.bands, idCol = idCol, vecCol = vecCol)
  }

  /** LSH-bucketed approximate top-k: candidates share the signature in
    * at least one of `nBands` band projections (multi-probe by banding
    * the signature bits), then exact cosine ranks within candidates.
    * Shuffles only (band_key, id, vec) — never the O(n²) pair space.
    */
  def lshTopK(embeddings: DataFrame, queries: DataFrame, k: Int, dim: Int,
              nBits: Int = 16, nBands: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bandBits = nBits / nBands
    val mask = (1L << bandBits) - 1
    def banded(df: DataFrame, id: String, vec: String, nrm: String): DataFrame = {
      val sig = lshSignature(col(vec), dim, nBits)
      df.select(col(id), toDouble(col(vec)).as(vec), sig.as("sig"))
        .withColumn(nrm, norm(col(vec)))
        .withColumn("band", explode(array((0 until nBands).map(b =>
          struct(lit(b).as("band_id"),
            shiftright(col("sig"), b * bandBits).bitwiseAND(mask).as("band_key"))): _*)))
        .select(col(id), col(vec), col(nrm), col("band.band_id"), col("band.band_key"))
    }
    val e = banded(embeddings.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv")), "neighbor_id", "nv", "nn")
    val q = banded(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id", "qv", "qn")
    bandCandidateTopK(e, q, k)
  }

  /** Engine-portable md5-derived integer hyperplanes: component (i, j)
    * is `2·nibble − 15` where nibble is the first hex digit of
    * md5("lsh:i:j") — odd integers in [−15, 15], never zero, uniform
    * over 16 levels (plenty for a sign test). Any SQL engine with
    * md5() replays the exact derivation, which is what lets the LSH
    * retrieval queries sit under the full hash oracle instead of a
    * rows-only check. */
  def md5Hyperplanes(dim: Int, nBits: Int): Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nBits) { i =>
      Array.tabulate(dim) { j =>
        val nib = (md.digest(s"lsh:$i:$j".getBytes("UTF-8"))(0) >> 4) & 0xf
        2L * nib - 15L
      }
    }
  }

  /** [[lshTopK]] with an ENGINE-PORTABLE signature: [[md5Hyperplanes]]
    * integer planes against the embedding quantized to exact BIGINT
    * micro-units (`round(x·1e6)`), so every sign bit compares an exact
    * integer sum — order-independent and bit-replayable in a SQL
    * oracle, unlike [[lshSignature]]'s splitmix doubles. Band keys are
    * assembled directly from the sign bits (no 64-bit packing cap, so
    * tuned plans past 64 total hashes still fit). Same SRP retrieval
    * family: the 1e-6 quantization perturbs each plane's decision
    * boundary by far less than the vectors' own scale. */
  /** The engine-portable SRP band array for one vector: [[md5Hyperplanes]]
    * integer planes against the micro-unit-quantized vector, one
    * exact-integer dot per plane (codegen'd HOFs), sign bits assembled
    * per band into (band_id, band_key) structs. Shared by
    * [[lshTopKPortable]] and [[lshRerankTopK]]. */
  private def portableBandArray(vec: Column, dim: Int, nBits: Int, nBands: Int): Column = {
    require(nBits % nBands == 0, s"nBits=$nBits must split evenly into nBands=$nBands")
    val bandBits = nBits / nBands
    val planes = md5Hyperplanes(dim, nBits)
    val vq = transform(toDouble(vec), x => round(x * lit(1000000.0)).cast("long"))
    val scores = planes.map { h =>
      aggregate(zip_with(vq, typedLit(h.toSeq), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
    }
    val bandStructs = (0 until nBands).map { b =>
      val key = (0 until bandBits).map { p =>
        when(scores(b * bandBits + p) >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(b).as("band_id"), key.as("band_key"))
    }
    array(bandStructs: _*)
  }

  def lshTopKPortable(embeddings: DataFrame, queries: DataFrame, k: Int, dim: Int,
                      nBits: Int = 16, nBands: Int = 4,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def banded(df: DataFrame, id: String, vec: String, nrm: String): DataFrame = {
      df.select(col(id), toDouble(col(vec)).as(vec))
        .withColumn(nrm, norm(col(vec)))
        .withColumn("band", explode(portableBandArray(col(vec), dim, nBits, nBands)))
        .select(col(id), col(vec), col(nrm), col("band.band_id"), col("band.band_key"))
    }
    // corpus-side SRP signatures are the expensive map work — spread a
    // single-split scan before computing them (r19, guide §2.5)
    val e = banded(graft.operators.Spread.forCompute(
      embeddings.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))), "neighbor_id", "nv", "nn")
    val q = banded(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id", "qv", "qn")
    bandCandidateTopK(e, q, k)
  }

  /** Radius (threshold) search over LSH band candidates: all unordered
    * pairs sharing at least one portable SRP band whose 6-dp exact
    * cosine meets `tau` — the "find everything this similar" primitive
    * beside top-k retrieval (dedup sweeps and recall audits want a
    * similarity FLOOR, not a count). Candidate generation is the
    * [[lshTopKPortable]] band join (sub-quadratic, integer-exact band
    * keys); scoring rounds at 6 with (a,b) ordering so the pair set is
    * engine-replayable. Recall is LSH-bounded by construction — pairs
    * in no shared band are not scored — which is the documented
    * production trade; the exact variant is bruteForceTopK at sampled
    * scale. */
  /** Public view of [[portableBandArray]] for band-layout audits
    * (bucket-occupancy histograms) that need the raw band structs. */
  def portableBands(vec: Column, dim: Int, nBits: Int, nBands: Int): Column =
    portableBandArray(vec, dim, nBits, nBands)

  /** Corpus-adaptive SRP band width for threshold search: bandBits =
    * max(4, ⌊log2(n/40)⌋), computed in INTEGERS (binary digit length —
    * no float log at the boundary) so a SQL oracle derives the same
    * width from its own COUNT(*). Bucket count scales with n, holding
    * the expected bucket size (≈40) constant — the candidate-pair
    * workload stays O(n), where a FIXED width grows it O(n²/2^bits)
    * (measured: exp 1.71 at the 10× probe before this). Wider bands
    * lower per-band recall as the corpus grows — the same
    * documented corpus-scaled trade as semanticDedup's nCells. */
  def adaptiveBandBits(n: Long): Int =
    math.max(4, 63 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n / 40)))

  def rangeSearchPortable(embeddings: DataFrame, tau: Double, dim: Int,
                          nBands: Int = 4,
                          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // Candidate generation and scoring are SPLIT so the pair dedup
    // shuffles bare 16-byte id pairs, never vectors: carrying the two
    // float arrays through dropDuplicates cost a ~1 KB/pair exchange
    // (measured 6.1 s at sf0.1 — the whole query is that shuffle); the
    // deduped pair list re-joins the (id, vec, norm) table by key, the
    // same corpus-stays-put posture as lshRerankTopK.
    //
    // The projected corpus is persisted (owned-cache lifecycle, released
    // at the Verify/Bench per-query point) BEFORE the adaptive-width
    // count: the count, the band build, and the (id, vec, norm) re-join
    // all read the one cached projection instead of re-scanning the
    // uncached input three times.
    val proj = graft.operators.PrefixSum.persistOwned(
      graft.operators.Spread.forCompute(
        embeddings.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))))
    val nBits = adaptiveBandBits(proj.count()) * nBands
    // lazy checkpoint: the self-join consumes the banded frame twice —
    // without a cut both sides re-run the SRP signature pass (r19)
    val bands = graft.operators.Checkpoints.stabilizeLazy(proj
      .withColumn("band", explode(portableBandArray(col("v"), dim, nBits, nBands)))
      .select(col("id"), col("band.band_id"), col("band.band_key")))
    val pairs = bands.as("x").join(bands.as("y"), Seq("band_id", "band_key"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("a_id"), col("y.id").as("b_id"))
      .distinct()
    val vecs = proj.withColumn("nrm", norm(col("v")))
    pairs
      .join(vecs.select(col("id").as("a_id"), col("v").as("av"), col("nrm").as("an")), "a_id")
      .join(vecs.select(col("id").as("b_id"), col("v").as("bv"), col("nrm").as("bn")), "b_id")
      .withColumn("sim", round(dot(col("av"), col("bv")) / (col("an") * col("bn")), 6))
      .filter(col("sim") >= tau)
      .select(col("a_id"), col("b_id"), col("sim"))
  }

  /** THREE-stage production retrieval: LSH band candidates →
    * int8-quantized candidate scoring → exact cosine rerank of the
    * top-`c` survivors. This is [[quantizedRerankTopK]] with its
    * quadratic stage-1 scan replaced by the [[lshTopKPortable]] band
    * join, so the whole path is sub-quadratic AND deterministic:
    * portable SRP bands (exact integer sign dots), symmetric int8
    * candidate scores (ratios of exact integers), 6-dp rerank with id
    * tie-breaks — every stage replayable bit-for-bit by a SQL oracle.
    * The candidate set (≤ c per query after pruning) re-joins the
    * float-vector table for the rerank by broadcast, so the corpus
    * never shuffles: at scale the codes table is the only full scan,
    * the float table is touched c·|queries| times. */
  def lshRerankTopK(embeddings: DataFrame, queries: DataFrame, c: Int, k: Int,
                    dim: Int, nBits: Int = 16, nBands: Int = 4,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(c >= k, s"candidate pool c=$c must cover the final k=$k")
    def coded(df: DataFrame, id: String, codes: String, norm2: String): DataFrame = {
      val v = toDouble(col(vecCol))
      // codes as doubles so the dot kernel applies; exact small ints
      val q = Quantize.encodeSym(v, Quantize.symScale(v)).cast("array<double>")
      df.select(col(idCol).as(id), q.as(codes),
          explode(portableBandArray(col(vecCol), dim, nBits, nBands)).as("band"))
        .withColumn(norm2, dot(col(codes), col(codes)))
        .select(col(id), col(codes), col(norm2), col("band.band_id"), col("band.band_key"))
    }
    // corpus-side band+code signatures are the expensive map work —
    // spread a single-split scan before computing them (r19, guide §2.5)
    val e = coded(graft.operators.Spread.forCompute(embeddings), "neighbor_id", "nq", "nn2")
    val q = coded(queries, "query_id", "qq", "qn2")
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("qscore").desc, col("neighbor_id"))
    val wFinal = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    // stage 1+2: band join over codes only (the float vectors never
    // ride the candidate shuffle); multi-band duplicates of a pair
    // score identically, so max == any
    val cand = e.join(broadcast(q), Seq("band_id", "band_key"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("qscore", dot(col("qq"), col("nq")) / sqrt(col("qn2") * col("nn2")))
      .groupBy(col("query_id"), col("neighbor_id")).agg(max(col("qscore")).as("qscore"))
      .withColumn("crank", row_number().over(wCand))
      .filter(col("crank") <= c)
    // stage 3: survivors (≤ c per query — broadcastable by design)
    // fetch float vectors for the exact rerank; the corpus side streams
    val qv = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val ev = embeddings.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("nv"))
      .withColumn("nn", norm(col("nv")))
    ev.join(broadcast(cand.join(broadcast(qv), Seq("query_id"))), Seq("neighbor_id"))
      .withColumn("sim", round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** [[ivfTopK]] with an ENGINE-PORTABLE cell geometry — the IVF
    * counterpart of [[lshTopKPortable]]. The stand-in coarse quantizer
    * (first `nCells` corpus vectors by id, the same deterministic
    * choice as `ivfTopK(centroids = None)`) is quantized to exact
    * BIGINT micro-units IN-ENGINE (`round(x·1e6)`, the same
    * half-away-from-zero any SQL round applies), and every cell score
    * is `dot_int / ‖c_int‖`: the integer dot is exact (≤ 64·10¹² per
    * term, sum far inside 2^53, so its double image is exact) and the
    * norm is one sqrt of an exact integer — correctly-rounded IEEE
    * ops end to end, so assignment and probing rank BIT-IDENTICAL
    * scores in any engine. That is what lets `sim_ivf_ann` sit under
    * the full hash oracle instead of a rows-only check. Ordering cells
    * by dot/‖c‖ equals ordering by cosine (‖q‖ is constant per
    * vector), so retrieval semantics match [[ivfTopK]]; ties break to
    * the lowest cell index on both sides. */
  def ivfTopKPortable(embeddings: DataFrame, queries: DataFrame, k: Int,
                      nCells: Int = 16, nProbe: Int = 4,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      centroidsInt: Option[Array[Array[Long]]] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    val quant: Column => Column =
      v => transform(v, x => round(x * lit(1000000.0)).cast("long"))
    // model-sized driver state (nCells × dim), the KMeans.fit posture;
    // quantized in-engine so the micro-unit rounding is the engine's own.
    // `centroidsInt` swaps the first-nCells stand-in for a TRAINED
    // integer quantizer (KMeans.fitIntPortable) with identical scoring
    // semantics — the sim_ivf_kmeans promotion path.
    val cents: Array[Array[Long]] = centroidsInt.getOrElse(
      e.orderBy(col("id")).limit(nCells)
        .select(quant(col("v")).as("q"))
        .collect().map(_.getSeq[Long](0).toArray))
    val cnorms: Array[Double] = cents.map(c => math.sqrt(c.map(x => x * x).sum.toDouble))
    // an all-zero quantized centroid (degenerate embedding) would give
    // cnorm = 0 → NaN cell scores, and NaN ordering silently skews the
    // probe ranking — refuse loudly instead
    require(cnorms.forall(_ > 0.0),
      s"zero-norm centroid at index ${cnorms.indexWhere(_ <= 0.0)}: all-zero " +
        "quantized embedding in the centroid set; supply trained centroidsInt")
    def cellScores(vq: Column): Seq[Column] = cents.zip(cnorms).map { case (c, n) =>
      aggregate(zip_with(vq, typedLit(c.toSeq), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).cast("double") / lit(n)
    }
    // corpus: map-only argmax assignment — one codegen'd primitive loop
    // (graft.functions.NearestCellLong: exact Long dots, first max =
    // lowest cell index on score ties, bit-identical to the interpreted
    // aggregate/zip_with + array_position(array_max) form it replaced)
    val cells = e
      .withColumn("cell_id", graft.functions.VectorExprs.nearest_cell_long(
        quant(col("v")), cents.flatten, cnorms))
      .select(col("id").as("neighbor_id"), col("v").as("nv"), col("cell_id"))
      .withColumn("nn", norm(col("nv")))
    // queries: top-nProbe cells (score desc, cell asc); the query set is
    // the small sampled side, so the posexplode + window stays tiny
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cell_id"))
    val probed = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .select(col("query_id"), col("qv"), col("qn"),
        posexplode(array(cellScores(quant(col("qv"))): _*)).as(Seq("cell_id", "score")))
      .withColumn("prb", row_number().over(wProbe))
      .filter(col("prb") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"), col("cell_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    // same tail as ivfTopKImpl: sim before the pair dedup so the groupBy
    // shuffles scalars only; the query side broadcasts
    cells.join(broadcast(probed), Seq("cell_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .groupBy(col("query_id"), col("neighbor_id")).agg(max(col("sim")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }

  /** nprobe sweep over the SAME IVF index: per sweep point the result
    * is definitionally identical to [[ivfTopKPortable]] at that nProbe
    * (same ranked probe list filtered at prb ≤ np, same candidate join,
    * scoring and top-k), but the corpus cell ASSIGNMENT — the only
    * data-sized pass — runs ONCE and is stabilized across all points
    * instead of once per point. Returns (nprobe, query_id, neighbor_id,
    * rank, sim). */
  def ivfTopKSweep(embeddings: DataFrame, queries: DataFrame, k: Int,
                   nProbes: Seq[Int], nCells: Int = 16,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nProbes.nonEmpty, "nProbes sweep must name at least one probe count")
    val e = embeddings.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    val quant: Column => Column =
      v => transform(v, x => round(x * lit(1000000.0)).cast("long"))
    val cents: Array[Array[Long]] =
      e.orderBy(col("id")).limit(nCells)
        .select(quant(col("v")).as("q"))
        .collect().map(_.getSeq[Long](0).toArray)
    val cnorms: Array[Double] = cents.map(c => math.sqrt(c.map(x => x * x).sum.toDouble))
    // same zero-norm posture as ivfTopKPortable: NaN probe scores from a
    // degenerate centroid would silently skew the probe ranking
    require(cnorms.forall(_ > 0.0),
      s"zero-norm centroid at index ${cnorms.indexWhere(_ <= 0.0)}: all-zero " +
        "quantized embedding in the centroid set")
    def cellScores(vq: Column): Seq[Column] = cents.zip(cnorms).map { case (c, n) =>
      aggregate(zip_with(vq, typedLit(c.toSeq), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x).cast("double") / lit(n)
    }
    val cells = graft.operators.Checkpoints.stabilizeLazy(e
      .withColumn("cell_id", graft.functions.VectorExprs.nearest_cell_long(
        quant(col("v")), cents.flatten, cnorms))
      .select(col("id").as("neighbor_id"), col("v").as("nv"), col("cell_id"))
      .withColumn("nn", norm(col("nv"))))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cell_id"))
    // ranked probe list is query-sample-sized (≤ nQ·max(nProbes) rows)
    // with one consumer PER SWEEP POINT — stabilize once so the probe
    // scoring + window run once, not once per point
    val rankedProbes = graft.operators.Checkpoints.stabilizeLazy(queries
      .select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .select(col("query_id"), col("qv"), col("qn"),
        posexplode(array(cellScores(quant(col("qv"))): _*)).as(Seq("cell_id", "score")))
      .withColumn("prb", row_number().over(wProbe))
      .filter(col("prb") <= nProbes.max)
      .select(col("query_id"), col("qv"), col("qn"), col("cell_id"), col("prb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    // score candidates ONCE at max(nProbes): every neighbor sits in
    // exactly one cell, so the pair (query, neighbor) is admitted at a
    // sweep point np iff its cell's probe rank ≤ np — min_prb carries
    // that threshold, and each point is a FILTER over the one scored
    // frame (r14: the join + scoring re-ran per point, 22 exchanges).
    // Per point the result is definitionally ivfTopKPortable's: same
    // candidate set, same sim (round-6 cosine is cell-independent),
    // same (sim desc, neighbor) rank order.
    val cand = graft.operators.Checkpoints.stabilizeLazy(
      cells.join(broadcast(rankedProbes
          .select(col("query_id"), col("qv"), col("qn"), col("cell_id"), col("prb"))),
          Seq("cell_id"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("sim", round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
        .groupBy(col("query_id"), col("neighbor_id"))
        .agg(max(col("sim")).as("sim"), min(col("prb")).as("min_prb")))
    nProbes.map { np =>
      cand.filter(col("min_prb") <= np)
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(lit(np).as("nprobe"), col("query_id"), col("neighbor_id"),
          col("rank"), col("sim"))
    }.reduce(_.unionAll(_))
  }

  /** SemDeDup-style semantic near-duplicate pruning (Abbas et al. 2023,
    * arXiv:2303.09540): assign every embedding to a coarse cell with the
    * SAME engine-portable integer quantizer as [[ivfTopKPortable]]
    * (first-`nCells`-by-id stand-in, or a trained `centroidsInt`), then
    * compare pairs ONLY within a cell and drop the higher id of any
    * pair whose `round(cosine, 6) >= tau`, reporting the kept
    * representative (argmax sim, ties to the lowest keeper id — the
    * keeper may itself be dropped against an even lower id, the
    * standard pointer-style dup set). The pair space is cell-local —
    * O(Σ|cell|²), never corpus² — and at scale `nCells` grows with the
    * corpus so cells stay bounded (~corpus/nCells rows each): exactly
    * the published SemDeDup recipe, with the quadratic work
    * embarrassingly parallel per cell. Cell scores are exact integer
    * dots over one sqrt/division (the ivfTopKPortable portability
    * argument), so a SQL engine replays assignment AND the drop set
    * bit-for-bit. */
  def semanticDedup(embeddings: DataFrame, tau: Double, nCells: Int = 16,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    centroidsInt: Option[Array[Array[Long]]] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    val quant: Column => Column =
      v => transform(v, x => round(x * lit(1000000.0)).cast("long"))
    // model-sized driver state (nCells × dim) — the KMeans.fit posture
    val cents: Array[Array[Long]] = centroidsInt.getOrElse(
      e.orderBy(col("id")).limit(nCells)
        .select(quant(col("v")).as("q"))
        .collect().map(_.getSeq[Long](0).toArray))
    val cnorms: Array[Double] = cents.map(c => math.sqrt(c.map(x => x * x).sum.toDouble))
    // map-only argmax assignment — the codegen'd NearestCellLong loop
    // (exact Long dots / cell norm, ties to the lowest cell index),
    // bit-identical to the ivfTopKPortable scoring the oracle replays
    val cells = e
      .withColumn("cell_id", graft.functions.VectorExprs.nearest_cell_long(
        quant(col("v")), cents.flatten, cnorms))
      .select(col("id"), col("v"), col("cell_id"))
      .withColumn("nrm", norm(col("v")))
    val keepers = cells.select(col("cell_id"), col("id").as("keep_id"),
      col("v").as("kv"), col("nrm").as("kn"))
    val droppers = cells.select(col("cell_id"), col("id").as("drop_id"),
      col("v").as("dv"), col("nrm").as("dn"))
    val wRep = Window.partitionBy(col("drop_id"))
      .orderBy(col("sim").desc, col("keep_id"))
    keepers.join(droppers, Seq("cell_id"))
      .filter(col("keep_id") < col("drop_id"))
      .withColumn("sim", round(dot(col("kv"), col("dv")) / (col("kn") * col("dn")), 6))
      .filter(col("sim") >= lit(tau))
      .withColumn("rn", row_number().over(wRep))
      .filter(col("rn") === 1)
      .select(col("drop_id"), col("keep_id").as("rep_id"), col("sim"), col("cell_id"))
  }

  /** Maximal-Marginal-Relevance diversified top-k: greedily pick k of
    * the `pool` strongest candidates, each step maximizing
    * λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s) — the training-data
    * diversity selector (a top-k of near-duplicates wastes the
    * budget; MMR trades a little relevance for coverage).
    *
    * The selection is sequential by definition, so the k−1 refinement
    * steps are UNROLLED as DataFrame stages over the pool-sized
    * candidate frame: `pool` is a constant (not data-sized), every
    * stage is one join + one windowed argmax on (query_id)-partitioned
    * pool²-sized rows, and the corpus itself is touched only by the
    * initial candidate retrieval — the expensive part stays in the
    * retrieval operator, the diversifier rides on model-sized frames
    * at any scale. All scores combine ROUND(·,6) cosines with one
    * mirrored λ-expression; ties break to the lowest candidate id, so
    * a SQL engine replays every pick. */
  def mmrTopK(embeddings: DataFrame, queries: DataFrame, k: Int, pool: Int,
              lambda: Double,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && pool >= k, s"pool $pool must cover k=$k")
    // persist the pool: every unrolled stage references `cands` (and
    // `selected` references itself twice per step), so without a
    // materialization barrier the O(q·n) retrieval subtree is
    // re-evaluated ~2^k times in the final plan
    // both persists route through the engine owned-cache registry so a
    // long-lived Verify/Bench driver releases them at its per-query
    // release point instead of accumulating blocks across queries
    val cands = graft.operators.PrefixSum.persistOwned(
      bruteForceTopK(embeddings, queries, pool, idCol, vecCol)
        .select(col("query_id"), col("neighbor_id").as("cand_id"), col("sim")))
    val ev = embeddings.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
    // pool×pool candidate-pair sims per query (pool² is a constant)
    val withVec = cands
      .join(ev.select(col("id").as("cand_id"), col("v").as("cv"), col("nrm").as("cn")), "cand_id")
    val dd = withVec.as("a").join(withVec.as("b"), Seq("query_id"))
      .filter(col("a.cand_id") =!= col("b.cand_id"))
      .select(col("query_id"), col("a.cand_id").as("a_id"), col("b.cand_id").as("b_id"),
        round(dot(col("a.cv"), col("b.cv")) / (col("a.cn") * col("b.cn")), 6).as("sim_ab"))
      .transform(graft.operators.PrefixSum.persistOwned)
    val wPick = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("cand_id"))
    var selected = cands
      .withColumn("rn", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("cand_id"))))
      .filter(col("rn") === 1)
      .select(col("query_id"), col("cand_id"), col("sim"),
        lit(0.0).as("redundancy"), lit(1).as("step"))
    (2 to k).foreach { t =>
      val rem = cands.join(selected.select(col("query_id"), col("cand_id")),
        Seq("query_id", "cand_id"), "left_anti")
      val red = rem
        .join(dd.withColumnRenamed("a_id", "cand_id"), Seq("query_id", "cand_id"))
        .join(selected.select(col("query_id"), col("cand_id").as("b_id")),
          Seq("query_id", "b_id"))
        .groupBy(col("query_id"), col("cand_id"))
        .agg(max(col("sim_ab")).as("redundancy"), first(col("sim")).as("sim"))
      val pick = red
        .withColumn("score",
          col("sim") * lambda - col("redundancy") * (1.0 - lambda))
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("cand_id"), col("sim"),
          col("redundancy"), lit(t).as("step"))
      // model-sized (queries × ≤t rows): localCheckpoint(eager=false)
      // cuts the self-referencing lineage each step WITHOUT scheduling
      // an extra materialization job per stage (persist() here cost a
      // job round-trip per step; the doubling it prevented re-runs
      // only tiny windows over the persisted `cands`/`dd` anyway)
      selected = graft.operators.Checkpoints.stabilizeLazy(selected.unionByName(pick))
    }
    selected.select(col("query_id"), col("step"), col("cand_id"),
      col("sim"), round(col("redundancy"), 6).as("redundancy"))
  }

  /** Append a per-query `recall_at_k` column: the fraction of
    * `exact`'s top-k neighbors (the brute-force ground truth) that
    * `approx` retrieved for that query. Both inputs use the
    * (query_id, neighbor_id) contract of the top-k operators. The
    * denominator is k even when a starved bucket returned fewer rows —
    * the standard ANN recall@k. Joins are query-set-sized (sampled
    * eval), so the metric rides along at scale for free; emitting it
    * inside the query makes retrieval QUALITY part of what the
    * correctness gate pins, not just result shape. */
  def withRecallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val hits = approx.join(
        exact.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id"))
      .agg((count(lit(1)).cast("double") / k).as("recall_at_k"))
    approx.join(broadcast(hits), Seq("query_id"), "left")
      .withColumn("recall_at_k", coalesce(col("recall_at_k"), lit(0.0)))
  }

  /** Shared LSH tail: equi-join banded corpus × banded queries, exact
    * cosine, pair dedup, per-query top-k. Norms per row (not per
    * pair); sim before the pair dedup so the groupBy shuffles scalar
    * triples, never the vectors (multi-band hits of a pair produce
    * identical sims — max == any). Query side broadcasts explicitly —
    * the corpus never shuffles for the join. */
  private def bandCandidateTopK(e: DataFrame, q: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    e.join(broadcast(q), Seq("band_id", "band_key"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6))
      .groupBy(col("query_id"), col("neighbor_id")).agg(max(col("sim")).as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "sim")
  }
}

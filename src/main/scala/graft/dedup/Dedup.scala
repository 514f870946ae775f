package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions
import graft.similarity.VectorOps

/** Deduplication operators for training-data pipelines.
  *
  * Scale posture: every variant shuffles fingerprints/ids, never
  * document bodies; candidate generation is sub-quadratic (hash
  * buckets / LSH bands); only verified candidates are materialized.
  *
  * Caching contract: [[ngramJaccardPairs]], [[ppjoinJaccardPairs]] and
  * [[minhashLshPairs]] persist their shingle/signature frame
  * (MEMORY_AND_DISK) because the candidate self-join plus verification
  * joins would otherwise recompute shingling 3–4×. The cache lives as
  * long as the returned plan is reachable; Spark's ContextCleaner
  * reclaims it once the caller drops the DataFrame. Callers that keep
  * many result frames alive in one session can bound the footprint by
  * materializing (write/collect) and then dropping the frame.
  */
object Dedup {

  /** Exact dedup by content hash: one hash-aggregate; the shuffle
    * carries (md5, id) only. Keeper = min id per hash. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Per-doc distinct word k-gram shingle sets (the base for Jaccard
    * and MinHash variants). */
  def shingleSets(df: DataFrame, textCol: String, idCol: String, k: Int = 3): DataFrame =
    df.select(col(idCol).as("doc_id"),
      TextFunctions.shingles(col(textCol), k).as("shingles"))

  /** Exact n-gram Jaccard near-dup pairs (doc_a < doc_b, jaccard >= tau).
    *
    * MapReduce shape: explode (shingle, id), self-join on shingle to
    * count the intersection per pair, then join per-doc set sizes.
    * The pair space never materializes beyond pairs that share at
    * least one shingle. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        k: Int = 3, tau: Double = 0.05): DataFrame = {
    val sets = shingleSets(df, textCol, idCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sets.select(col("doc_id"), size(col("shingles")).as("n_sh"))
    // join on 64-bit shingle hashes, not the shingle strings: the
    // shuffle carries 8-byte keys (collision odds ~n²/2^65, and any
    // collision would be caught by the oracle compare)
    val posting = sets.select(col("doc_id"), explode(col("shingles")).as("sh"))
      .select(col("doc_id"), xxhash64(col("sh")).as("sh"))
    val common = posting.as("x").join(posting.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
      .withColumn("jaccard",
        col("n_common") * lit(1.0) / (col("na") + col("nb") - col("n_common")))
      .filter(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Prefix-filtered exact all-pairs Jaccard (PPJoin-style): identical
    * output to [[ngramJaccardPairs]], far fewer candidates at scale.
    *
    * Shingles are globally ordered rarest-first (document frequency asc,
    * hash tie-break); a doc with n shingles only posts its first
    * n - ceil(tau*n) + 1 tokens. Any pair with J >= tau shares
    * o >= ceil(tau*max(na,nb)) tokens, and by pigeonhole at least one
    * falls in BOTH prefixes — so joining prefix postings loses nothing,
    * while the Zipf head (stopword n-grams, the fan-out killers) sits at
    * the END of the order and never enters the candidate join at
    * moderate tau. Candidates are verified with the exact intersection,
    * so there are no false positives either. */
  def ppjoinJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                         k: Int = 3, tau: Double = 0.6): DataFrame = {
    // everything past shingling runs on 8-byte xxhash64 tokens — the
    // shuffles (df-order, prefix postings, verification sets) never
    // carry shingle strings. A cross-doc hash collision would need
    // ~2^32 distinct shingles to matter (and the oracle would catch it).
    // sorted: verification counts overlap with a native merge pass
    val hsets = shingleSets(df, textCol, idCol, k)
      .select(col("doc_id"),
        sort_array(transform(col("shingles"), s => xxhash64(s))).as("hsh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val posting = hsets.select(col("doc_id"), explode(col("hsh")).as("sh"))
    val dfreq = posting.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val ordered = posting.join(dfreq, "sh")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("toks"))
      .select(col("doc_id"),
        transform(col("toks"), t => t.getField("sh")).as("toks"))
    // floor(n*(1-tau)) + 1 == n - ceil(tau*n) + 1; the 1e-9 nudge keeps
    // the floor from dropping below an exact-integer product and
    // shortening the prefix by one (a longer prefix is merely slower,
    // a shorter one loses pairs)
    val prefixLen =
      (size(col("toks")).cast("double") * lit(1.0 - tau) + lit(1e-9)).cast("int") + lit(1)
    val pp = ordered
      .select(col("doc_id"), explode(slice(col("toks"), lit(1), prefixLen)).as("sh"))
    val cand = pp.as("x").join(pp.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(hsets.select(col("doc_id").as("doc_a"), col("hsh").as("sha")), "doc_a")
      .join(hsets.select(col("doc_id").as("doc_b"), col("hsh").as("shb")), "doc_b")
      .withColumn("n_common",
        graft.functions.VectorExprs.sorted_intersect_count(col("sha"), col("shb")))
      .withColumn("jaccard", col("n_common") * lit(1.0) /
        (size(col("sha")) + size(col("shb")) - col("n_common")))
      .filter(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "jaccard")
  }

  // ------------------------------------------------------------- MinHash-LSH

  /** Deterministic 32-bit affine permutation parameters. */
  private[dedup] def minhashPerms(nPerms: Int, seed: Long): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPerms)((rng.nextInt(Int.MaxValue).toLong + 1L, rng.nextInt(Int.MaxValue).toLong))
  }

  private val MersennePrime = 4294967311L // smallest prime > 2^32

  /** MinHash signature column (array<bigint>, length nPerms) over a
    * shingle-set column: h_i(S) = min over s in S of (a_i * x32(s) + b_i)
    * mod p, with x32 = xxhash64 folded to 32 bits (keeps a*x+b < 2^63).
    * All perms are computed in one native pass over the array
    * (graft.functions.MinHashSig) instead of nPerms interpreted
    * transform+array_min passes. */
  def minhashSignature(shinglesCol: Column, nPerms: Int = 64, seed: Long = 42L): Column = {
    val h32 = transform(shinglesCol, s => pmod(xxhash64(s), lit(1L << 32)))
    val perms = minhashPerms(nPerms, seed)
    graft.functions.VectorExprs.minhash_sig(h32,
      perms.map(_._1), perms.map(_._2), MersennePrime)
  }

  /** MinHash + LSH banding near-dup pairs, verified by exact Jaccard.
    *
    * nBands bands of rowsPerBand rows → candidate pairs are ids sharing
    * one band hash (shuffle carries (band_hash, id) only); candidates
    * are then verified with the exact shingle-set Jaccard, so the output
    * has no false positives — recall is the only approximation.
    * Default 16 bands × 4 rows targets the τ≈0.5 knee. */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      k: Int = 3, tau: Double = 0.5,
                      nBands: Int = 16, rowsPerBand: Int = 4,
                      seed: Long = 42L): DataFrame = {
    // persisted: the self-join + two verification joins would otherwise
    // recompute shingling/signatures 4x (ContextCleaner reclaims the
    // cache once the plan is unreachable)
    val sets = shingleSets(df, textCol, idCol, k)
      .withColumn("sig", minhashSignature(col("shingles"), nBands * rowsPerBand, seed))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = sets.select(col("doc_id"),
        explode(array((0 until nBands).map(b => struct(lit(b).as("band_id"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("band_hash"))): _*)).as("b"))
      .select(col("doc_id"), col("b.band_id"), col("b.band_hash"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_hash") === col("y.band_hash") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // verify candidates with exact Jaccard (joins back tiny shingle sets)
    cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shingles").as("sha")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shingles").as("shb")), "doc_b")
      .withColumn("n_common", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jaccard", col("n_common") * lit(1.0) /
        (size(col("sha")) + size(col("shb")) - col("n_common")))
      .filter(col("jaccard") >= tau)
      .select("doc_a", "doc_b", "jaccard")
  }

  // ----------------------------------------------------------------- SimHash

  /** 64-bit SimHash per doc over word hashes (native Catalyst expr). */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      graft.functions.SimHash64.simhash64(
        transform(array_distinct(TextFunctions.words(col(textCol))), w => xxhash64(w)))
        .as("simhash"))

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    * Candidate generation: 4 × 16-bit bands (pigeonhole: any pair with
    * hamming <= 3 shares at least one exact band; for larger budgets
    * more/smaller bands would be used). Verification: bit_count(xor). */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sh = simhash(df, textCol, idCol)
    val bands = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band_id"),
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("band_key"))): _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band_id"), col("b.band_key"))
    bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-dup pairs above `tau`. Brute-force O(n²)
    * pair enumeration — the exact baseline / oracle shape; the scale
    * path is LSH bucketing (VectorOps.lshTopK) to prune candidates. */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
                     tau: Double,
                     maxRows: Int = VectorOps.QuadraticGuardRows): DataFrame = {
    VectorOps.guardQuadratic(df, maxRows, "embeddingPairs",
      "minhashLshPairs or VectorOps.lshTopK (bucketed candidates)")
    // norms once per row; dot/(|a|*|b|) identical to cosine()
    val e = df.select(col(idCol).as("id"), VectorOps.toDouble(col(vecCol)).as("v"))
      .withColumn("n", VectorOps.norm(col("v")))
    e.as("a").join(e.as("b"), col("a.id") < col("b.id"))
      .withColumn("sim", VectorOps.dot(col("a.v"), col("b.v")) / (col("a.n") * col("b.n")))
      .filter(col("sim") >= tau)
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"),
        round(col("sim"), 6).as("sim"))
  }

  /** Connected components over a near-dup pair list → (id, cluster_id),
    * cluster_id = the smallest id reachable through any chain of pairs.
    * This is the step that turns pairwise near-dup verdicts into
    * KEEP/DROP decisions: keep cluster_id == id, drop the rest — without
    * it, transitive duplicates (A~B, B~C but A!~C) survive pairwise
    * filtering.
    *
    * Algorithm: min-label propagation with pointer jumping. Each round
    * a node's new label is the min over (a) its own label, (b) its
    * neighbors' labels, and (c) its LABEL's label — (c) is the
    * pointer-jumping/path-halving step, which collapses a chain of
    * length d in O(log d) rounds instead of O(d), so even adversarial
    * long-chain graphs converge in a handful of shuffles; every round
    * shuffles (id, label) longs only, never content. (The alternating
    * large-star/small-star formulation — Kiveris et al., "Connected
    * Components in MapReduce and Beyond" — achieves the same bound by
    * rewriting edges; jumping on the label table keeps the edge set
    * immutable and cacheable.) `localCheckpoint` truncates each round's
    * lineage so the plan doesn't deepen geometrically.
    *
    * Convergence check is free: labels only ever decrease, so the label
    * sum is strictly monotone until fixpoint — one tiny aggregate per
    * round, no join against the previous labels. `maxIters` is a safety
    * valve (throws rather than emitting a half-converged clustering). */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 50): DataFrame = {
    val fwd = pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
    val edges = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def labelSum(l: DataFrame): Long =
      l.agg(sum(col("cluster_id").cast("decimal(38,0)"))).head().getDecimal(0).longValueExact()
    var labels = edges.groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), first(col("src"))).as("cluster_id"))
      .localCheckpoint()
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val viaNeighbor = edges.join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("cluster_id"))
      // pointer jump: node's label's label (labels is a function, so the
      // self-join fans out by at most 1 row per node)
      val viaJump = labels.as("x").join(
          labels.select(col("id").as("cluster_id"), col("cluster_id").as("jumped")), "cluster_id")
        .select(col("id"), col("jumped").as("cluster_id"))
      val next = labels.union(viaNeighbor).union(viaJump)
        .groupBy("id").agg(min(col("cluster_id")).as("cluster_id"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s == prevSum
      prevSum = s
      labels = next
      iter += 1
    }
    edges.unpersist(blocking = false)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds — " +
          "pathological graph; raise maxIters")
    labels
  }
}

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
  * joins would otherwise recompute shingling 3–4×. Each persisted
  * frame is registered in an owned-cache list; call [[releaseCaches]]
  * once results are materialized to free every graft-owned block
  * (results recompute from source if re-evaluated afterwards —
  * correctness is unaffected, only the reuse speedup is gone). A
  * benchmark or long-running session should release between operators;
  * `spark.catalog.clearCache()` also covers these (they live in the
  * session CacheManager), but releaseCaches spares unrelated caches.
  */
object Dedup {

  private val owned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  private def persistOwned(df: DataFrame): DataFrame = synchronized {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    owned += df
    df
  }

  /** Unpersist every shingle/signature frame any dedup builder has
    * cached in this JVM. Safe at any time. */
  def releaseCaches(): Unit = synchronized {
    owned.foreach(_.unpersist(blocking = false))
    owned.clear()
  }

  /** Exact dedup by content hash: one hash-aggregate; the shuffle
    * carries (md5, id) only. Keeper = min id per hash. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Per-doc distinct word k-gram shingle sets (the base for Jaccard
    * and MinHash variants). */
  def shingleSets(df: DataFrame, textCol: String, idCol: String, k: Int = 3): DataFrame =
    // NOT spread (r19): the shingle frame is persisted and re-read by
    // 4+ downstream jobs per query; a 32-block cache costs more in
    // repeated task scheduling than the one-shot parallel shingling
    // saves (measured +0.5..1.3 s on every multi-consumer jaccard key)
    df.select(col(idCol).as("doc_id"),
      TextFunctions.shingles(col(textCol), k).as("shingles"))

  /** Per-doc sorted xxhash64 shingle arrays — the shared near-dup
    * input: every downstream shuffle carries 8-byte tokens, never
    * shingle strings (collision odds ~n²/2^65; the oracle compare
    * would catch one), and verification counts overlap with a native
    * merge pass over the sorted arrays. */
  private def hashedSets(df: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    shingleSets(df, textCol, idCol, k)
      .select(col("doc_id"),
        sort_array(transform(col("shingles"), s => xxhash64(s))).as("hsh"))

  private def fullPostings(hsets: DataFrame): DataFrame =
    hsets.select(col("doc_id"), explode(col("hsh")).as("sh"))

  /** PPJoin prefix postings: under a global frequency-ascending total
    * order (document frequency asc, hash tie-break) each doc posts only
    * its first n - ceil(tau·n) + 1 tokens. Any pair with J ≥ tau shares
    * o ≥ ceil(tau·max(na,nb)) tokens, and by pigeonhole at least one
    * falls in BOTH prefixes — prefix joins lose nothing. The Zipf head
    * (boilerplate shingles, the fan-out killers) sits at the END of the
    * order: a shingle hot enough to rank in a doc's top ceil(tau·n)−1
    * never enters the candidate join for that doc, which is what bounds
    * the posting self-join's skew — a shingle shared by every doc
    * produces ZERO candidate rows instead of n²/2 (exposed to the
    * planted-hot-shingle spec via [[prefixPostingsForSpec]]). */
  private def prefixPostings(hsets: DataFrame, dfreq: DataFrame, tau: Double): DataFrame = {
    val ordered = fullPostings(hsets).join(dfreq, "sh")
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
    ordered.select(col("doc_id"), explode(slice(col("toks"), lit(1), prefixLen)).as("sh"))
  }

  /** Spec hook: the prefix postings a corpus would emit at `tau`, for
    * asserting frequency-boundedness (a planted hot shingle must be
    * absent). */
  private[graft] def prefixPostingsForSpec(df: DataFrame, textCol: String, idCol: String,
                                           k: Int, tau: Double): DataFrame = {
    val hsets = hashedSets(df, textCol, idCol, k)
    val dfreq = fullPostings(hsets).groupBy(col("sh")).agg(count(lit(1)).as("df"))
    prefixPostings(hsets, dfreq, tau)
  }

  /** Exact-verify unordered candidate pairs against two hashed-set
    * frames and keep J ≥ tau, emitting (aCol, bCol, jaccard). */
  private def jaccardVerified(cand: DataFrame, hsetsA: DataFrame, hsetsB: DataFrame,
                              aCol: String, bCol: String, tau: Double): DataFrame =
    cand
      .join(hsetsA.select(col("doc_id").as(aCol), col("hsh").as("sha")), aCol)
      .join(hsetsB.select(col("doc_id").as(bCol), col("hsh").as("shb")), bCol)
      .withColumn("n_common",
        graft.functions.VectorExprs.sorted_intersect_count(col("sha"), col("shb")))
      .withColumn("jaccard", col("n_common") * lit(1.0) /
        (size(col("sha")) + size(col("shb")) - col("n_common")))
      .filter(col("jaccard") >= tau)
      .select(aCol, bCol, "jaccard")

  /** Exact n-gram Jaccard near-dup pairs (doc_a < doc_b, jaccard >= tau),
    * routed through the PPJoin prefix filter at EVERY tau: candidates
    * come from the df-ordered prefix self-join (see [[prefixPostings]]
    * for the lossless-pruning argument), then each candidate is verified
    * with the exact sorted-array intersection — identical output to the
    * naive posting self-join, but a boilerplate shingle shared by n docs
    * can no longer fan out n²/2 join rows: hot tokens fall past the
    * prefix for every doc with more than ~1/tau shingles. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        k: Int = 3, tau: Double = 0.05): DataFrame = {
    val hsets = persistOwned(hashedSets(df, textCol, idCol, k))
    val posting = fullPostings(hsets)
    val dfreq = posting.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val pp = prefixPostings(hsets, dfreq, tau)
    val cand = pp.as("x").join(pp.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    jaccardVerified(cand, hsets, hsets, "doc_a", "doc_b", tau)
  }

  /** Directed shingle-containment pairs: C(src→dst) = |S∩D| / |S| ≥ tau
    * — the ASYMMETRIC near-dup measure. Jaccard misses a short document
    * quoted whole inside a long one (the union denominator swamps the
    * overlap); containment flags it, which is why contamination and
    * quote/boilerplate screens key on containment, not similarity.
    *
    * Candidates come from a containment-adapted prefix filter: a pair
    * qualifies in direction src→dst only if o ≥ ceil(tau·n_src), so if
    * all overlap tokens sat past src's prefix there would be at most
    * ceil(tau·n_src) − 1 < o of them — contradiction; at least one
    * overlap token is in src's PREFIX, and dst posts everything. Joining
    * prefix×full postings therefore catches both directions via the
    * unordered union, while a hot shingle only fans out against the few
    * docs whose prefix still carries it — not the whole corpus². Each
    * candidate is then verified with the exact intersection. */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
                       k: Int = 3, tau: Double = 0.5): DataFrame = {
    val hsets = persistOwned(hashedSets(df, textCol, idCol, k))
    val posting = fullPostings(hsets)
    val dfreq = posting.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val pp = prefixPostings(hsets, dfreq, tau)
    val cand = pp.as("x").join(posting.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") =!= col("y.doc_id"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("doc_a"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("doc_b"))
      .distinct()
    val common = cand
      .join(hsets.select(col("doc_id").as("doc_a"), col("hsh").as("sha")), "doc_a")
      .join(hsets.select(col("doc_id").as("doc_b"), col("hsh").as("shb")), "doc_b")
      .withColumn("n_common",
        graft.functions.VectorExprs.sorted_intersect_count(col("sha"), col("shb")))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        size(col("sha")).as("na"), size(col("shb")).as("nb"))
    val ab = common.select(col("doc_a").as("src"), col("doc_b").as("dst"),
      (col("n_common") * lit(1.0) / col("na")).as("containment"))
    val ba = common.select(col("doc_b").as("src"), col("doc_a").as("dst"),
      (col("n_common") * lit(1.0) / col("nb")).as("containment"))
    ab.unionByName(ba).filter(col("containment") >= tau)
  }

  /** Incremental near-dup: (new doc, corpus doc) pairs with J ≥ tau —
    * the daily-ingest shape. Only new×corpus candidates join; the
    * historical corpus is PROBED, never self-paired, so a day's
    * increment costs O(|new| · shared prefix postings) — re-running the
    * symmetric all-pairs op over corpus+new would redo the entire
    * corpus×corpus work each day. Both sides' prefixes are taken under
    * ONE global order (document frequency over the union), so the
    * PPJoin pigeonhole argument carries over to the cross-set join and
    * a boilerplate shingle shared across the corpus stays out of the
    * candidate join. Downstream: drop new docs that pair with the
    * corpus (or with an earlier new-batch doc via the symmetric op
    * over the small batch alone). */
  def incrementalJaccardPairs(newDf: DataFrame, corpus: DataFrame,
                              textCol: String, idCol: String,
                              k: Int = 3, tau: Double = 0.05): DataFrame = {
    val newSets = persistOwned(hashedSets(newDf, textCol, idCol, k))
    val oldSets = persistOwned(hashedSets(corpus, textCol, idCol, k))
    val dfreq = fullPostings(newSets).unionByName(fullPostings(oldSets))
      .groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val cand = prefixPostings(newSets, dfreq, tau).as("x")
      .join(prefixPostings(oldSets, dfreq, tau).as("y"), col("x.sh") === col("y.sh"))
      .select(col("x.doc_id").as("doc_new"), col("y.doc_id").as("doc_old"))
      .distinct()
    jaccardVerified(cand, newSets, oldSets, "doc_new", "doc_old", tau)
  }

  /** Prefix-filtered exact all-pairs Jaccard (PPJoin-style) at a
    * high-similarity tau, where the prefix filter prunes hardest. */
  def ppjoinJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                         k: Int = 3, tau: Double = 0.6): DataFrame =
    // [[ngramJaccardPairs]] IS the PPJoin pipeline now (prefix-filtered
    // candidates + exact verification at every tau); this name survives
    // as the explicitly-tuned high-tau entry point.
    ngramJaccardPairs(df, textCol, idCol, k, tau)

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
    val sets = persistOwned(shingleSets(df, textCol, idCol, k)
      .withColumn("sig", minhashSignature(col("shingles"), nBands * rowsPerBand, seed)))
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

  /** 64-bit SimHash per doc over word hashes (native Catalyst expr).
    * `wordHash` picks the per-word hash family: xxhash64 (default —
    * the fast native kernel) or [[portableWordHash]] (md5-derived, so
    * a SQL oracle can replay the signature bit-for-bit). */
  def simhash(df: DataFrame, textCol: String, idCol: String,
              wordHash: Column => Column = xxhash64(_)): DataFrame =
    graft.operators.Spread.forCompute(df).select(col(idCol).as("doc_id"),
      graft.functions.SimHash64.simhash64(
        transform(array_distinct(TextFunctions.words(col(textCol))), wordHash))
        .as("simhash"))

  /** Engine-portable 60-bit word hash: the first 15 hex digits of
    * md5(w) as a BIGINT. Any SQL engine rederives it (hex nibbles via
    * the instr trick), which lets the SimHash vote/threshold/banding
    * pipeline — all exact integer ops — sit under a full hash oracle.
    * 60 of 64 bits carry signal (the top nibble is always 0, so those
    * vote-sums are all-negative and the output bits 0 on both sides);
    * Hamming geometry within the used bits is unchanged. */
  def portableWordHash(w: Column): Column =
    conv(substring(md5(w), 1, 15), 16, 10).cast("long")

  /** Engine-portable 62-bit word hash at ~1/8 the md5 cost: the
    * codegen'd poly+temper kernel ([[graft.functions.PolyWordHash62]]).
    * Same oracle-replayability contract as [[portableWordHash]] (a SQL
    * engine rederives it with BIGINT fold/xor/shift — no md5), so it is
    * the default for hot signature paths like dedup_simhash. */
  def fastPortableWordHash(w: Column): Column =
    graft.functions.PolyWordHash62.poly_word_hash62(w)

  /** SimHash near-dup pairs with Hamming distance <= maxHamming.
    * Candidate generation: 4 × 16-bit bands (pigeonhole: any pair with
    * hamming <= 3 shares at least one exact band; for larger budgets
    * more/smaller bands would be used). Verification: bit_count(xor). */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3,
                   wordHash: Column => Column = xxhash64(_)): DataFrame = {
    val sh = simhash(df, textCol, idCol, wordHash)
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
    // the streamed side of the nested-loop join inherits the scan's
    // split count — one small parquet file = ONE partition = the whole
    // O(n²) pair scan on a single core. Spread it across the cluster;
    // the shuffle moves n rows, the join does n²/2 dot products.
    val streamed = e.repartition(df.sparkSession.sparkContext.defaultParallelism)
    streamed.as("a").join(broadcast(e).as("b"), col("a.id") < col("b.id"))
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
    * large-star/small-star formulation — [[connectedComponentsStar]] —
    * achieves the same bound by rewriting edges; jumping keeps the edge
    * set immutable and cacheable, the right trade when pairs ≪ corpus.)
    *
    * The loop core is a pair-RDD with ONE fixed small HashPartitioner —
    * label tables hold two longs per node that appears in a pair, tiny
    * next to the corpus, so per-round shuffles run at ≤8 partitions
    * instead of the session width, and the edges⋈labels join is NARROW
    * (both sides co-partitioned; the edge set never re-shuffles after
    * its initial materialization). One action per round: the convergence
    * aggregate doubles as the job that materializes the round (labels
    * only ever decrease, so the label sum is strictly monotone until
    * fixpoint — no join against the previous labels). Every third round
    * localCheckpoints to truncate lineage; each round explicitly
    * unpersists the previous round's blocks, so peak footprint is two
    * label tables + the edge list regardless of round count. `maxIters`
    * is a safety valve (throws rather than emitting a half-converged
    * clustering).
    *
    * The returned frame is backed by the final materialized label RDD
    * (footprint = output size); all intermediate blocks are released
    * before return. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val p = new org.apache.spark.HashPartitioner(
      math.min(8, spark.sparkContext.defaultParallelism))
    val fwd = pairs.select(col(aCol).cast("long"), col(bCol).cast("long"))
      .as[(Long, Long)].rdd
    // keyed by dst, value src (symmetric) — labels(dst) joined narrowly
    // propagates to src
    val edges = fwd.flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .partitionBy(p).persist(level)
    // BigInt sum: exact and overflow-free for any id domain; the label
    // table is small by construction so boxing cost is irrelevant
    def labelSum(l: org.apache.spark.rdd.RDD[(Long, Long)]): BigInt =
      l.aggregate(BigInt(0))((acc, kv) => acc + kv._2, _ + _)
    var labels = edges.reduceByKey(p, math.min(_: Long, _: Long))
      .mapPartitions(_.map { case (id, mn) => (id, math.min(id, mn)) },
        preservesPartitioning = true)
      .persist(level)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val viaNeighbor = edges.join(labels) // narrow: both sides on p
        .map { case (_, (src, lbl)) => (src, lbl) }
      val viaJump = labels.map { case (id, lbl) => (lbl, id) }
        .join(labels, p) // labels side narrow; swapped side is tiny
        .map { case (_, (id, lbl2)) => (id, lbl2) }
      val next = labels.union(viaNeighbor).union(viaJump)
        .reduceByKey(p, math.min(_: Long, _: Long))
      if (iter % 3 == 2) graft.operators.Checkpoints.stabilizeRdd(next, level)
      else next.persist(level)
      val s = labelSum(next) // the ONE action: materializes + checks
      converged = s == prevSum
      prevSum = s
      labels.unpersist(blocking = false)
      labels = next
      iter += 1
    }
    edges.unpersist(blocking = false)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters rounds — " +
          "pathological graph; raise maxIters")
    labels.toDF("id", "cluster_id")
  }

  /** Connected components by alternating large-star/small-star edge
    * rewriting (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14 — public algorithm). Same output contract as
    * [[connectedComponents]]: (id, cluster_id = component min).
    *
    * When to prefer which: pointer jumping keeps the EDGE set immutable
    * and iterates on a node→label table — ideal when pairs ≪ corpus
    * (the near-dup case). This variant never materializes a global
    * label table at all; it rewrites the edge set itself until every
    * component is a star centered on its minimum, so per-round state is
    * bounded by the (shrinking) edge list — the right shape when the
    * graph is so large that even (id, label) for all nodes is a
    * skew/memory hazard. Both ends land in O(log n) rounds.
    *
    * Mechanics per round, all on (long, long) pairs under one fixed
    * partitioner, min computed via map-side-combining reduceByKey (no
    * adjacency lists are ever collected, so a high-degree star center
    * never concentrates memory on one task):
    *  - large-star: every node u links its LARGER neighbors to
    *    m(u) = min(Γ⁺(u));
    *  - small-star: every node u links its smaller neighbors and
    *    itself to its minimum smaller neighbor.
    * Convergence = edge-set fixpoint, detected by an order-independent
    * (count, hash-sum) signature computed in the same action that
    * materializes the round; stale rounds are unpersisted eagerly and
    * every third round localCheckpoints to truncate lineage. */
  def connectedComponentsStar(pairs: DataFrame, aCol: String, bCol: String,
                              maxIters: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sc = spark.sparkContext
    val p = new org.apache.spark.HashPartitioner(sc.defaultParallelism)
    val minL = math.min(_: Long, _: Long)
    type Edges = org.apache.spark.rdd.RDD[(Long, Long)]

    // canonical form throughout: (hi, lo), hi > lo, deduped, no loops
    def largeStar(e: Edges): Edges = {
      val sym = e.flatMap { case (u, v) => Iterator((u, v), (v, u)) }
      val m = sym.reduceByKey(p, minL)
        .mapPartitions(_.map { case (u, mn) => (u, math.min(u, mn)) },
          preservesPartitioning = true)
      sym.join(m) // co-partitioned on p → narrow
        .flatMap { case (u, (v, mu)) =>
          if (v > u) Iterator((v, mu)) else Iterator.empty } // v > u ≥ mu
        .distinct(p.numPartitions)
    }
    def smallStar(e: Edges): Edges = {
      val byHi = e.partitionBy(p)
      val m = byHi.reduceByKey(p, minL) // min smaller-neighbor; < u
      val withM = byHi.join(m) // narrow on p
      val moved = withM.flatMap { case (_, (v, mu)) =>
        if (v != mu) Iterator((v, mu)) else Iterator.empty } // v > mu
      moved.union(m).distinct(p.numPartitions)
    }
    // order-independent signature; computed in the materializing action
    def sig(e: Edges): (Long, Long) =
      e.aggregate((0L, 0L))(
        (acc, t) => (acc._1 + 1L,
          acc._2 + scala.util.hashing.byteswap64(t._1 * 0x9E3779B97F4A7C15L + t._2)),
        (a, b) => (a._1 + b._1, a._2 + b._2))

    var edges: Edges = pairs
      .select(col(aCol).cast("long"), col(bCol).cast("long"))
      .as[(Long, Long)].rdd
      .flatMap { case (a, b) =>
        if (a == b) Iterator.empty
        else Iterator((math.max(a, b), math.min(a, b))) }
      .distinct(p.numPartitions)
      .persist(level)
    var prevSig = sig(edges)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val next = smallStar(largeStar(edges))
      if (iter % 3 == 2) graft.operators.Checkpoints.stabilizeRdd(next, level)
      else next.persist(level)
      val s = sig(next)
      converged = s == prevSig
      prevSig = s
      edges.unpersist(blocking = false)
      edges = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar did not converge in $maxIters rounds — " +
          "raise maxIters")
    // fixpoint is a star per component: every edge is (member, center)
    val labels = edges
      .flatMap { case (v, c) => Iterator((v, c), (c, c)) }
      .reduceByKey(p, minL)
    labels.toDF("id", "cluster_id")
  }
}

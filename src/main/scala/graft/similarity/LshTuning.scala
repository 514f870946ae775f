package graft.similarity

/** Analytic (bands × rows-per-band) planning for LSH from a recall
  * target, instead of hand-picked constants.
  *
  * The S-curve P(candidate | p) = 1 - (1 - p^r)^b is exact for both
  * LSH families in this engine:
  *   - MinHash banding (graft.dedup.Dedup): p = Jaccard similarity;
  *   - sign-random-projection bits (VectorOps.lshTopK): p = per-bit
  *     collision probability 1 - arccos(cos) / π.
  *
  * Tuning minimizes the total hash budget b·r subject to the recall
  * floor at the hit similarity and an optional candidate-probability
  * ceiling at a background similarity — the knob that controls shuffle
  * fan-out at 100 TB, where every extra band is another explode×join
  * over the corpus.
  */
object LshTuning {

  final case class Plan(bands: Int, rowsPerBand: Int) {
    def totalHashes: Int = bands * rowsPerBand
  }

  /** Exact S-curve: probability a pair with per-hash collision
    * probability `p` shares at least one of `bands` bands of
    * `rows` hashes each. */
  def candidateProb(p: Double, bands: Int, rows: Int): Double =
    1.0 - math.pow(1.0 - math.pow(p, rows), bands)

  /** Per-bit collision probability of a random-hyperplane sign bit for
    * a pair at the given cosine similarity (Goemans–Williamson):
    * 1 - θ/π. */
  def srpCollisionProb(cosine: Double): Double = {
    val c = math.max(-1.0, math.min(1.0, cosine))
    1.0 - math.acos(c) / math.Pi
  }

  /** Smallest-budget plan with candidateProb(pHit) ≥ recall, and —
    * when `maxBgProb` < 1 — candidateProb(pBg) ≤ maxBgProb. Ties on
    * budget prefer wider bands (larger r): same cost, sharper S-curve,
    * fewer background candidates.
    *
    * @param pHit     per-hash collision probability at the similarity
    *                 that MUST be found (e.g. srpCollisionProb(0.8))
    * @param recall   recall floor at pHit, in (0, 1)
    * @param maxHashes hash budget ceiling (≤ 64 when the signature is
    *                 packed in a single long)
    * @param pBg      per-hash collision probability of background pairs
    * @param maxBgProb candidate-probability ceiling at pBg
    */
  def tune(pHit: Double, recall: Double, maxHashes: Int,
           pBg: Double = 0.0, maxBgProb: Double = 1.0): Plan = {
    require(pHit > 0.0 && pHit < 1.0, s"pHit must be in (0,1), got $pHit")
    require(recall > 0.0 && recall < 1.0, s"recall must be in (0,1), got $recall")
    val plans = for {
      r <- 1 to maxHashes
      pr = math.pow(pHit, r)
      if pr > 0.0
      // smallest b with 1-(1-pr)^b >= recall
      b = math.ceil(math.log1p(-recall) / math.log1p(-pr)).toInt.max(1)
      if b.toLong * r <= maxHashes
      if candidateProb(pBg, b, r) <= maxBgProb
    } yield Plan(b, r)
    require(plans.nonEmpty,
      s"no (bands, rows) plan meets recall=$recall at pHit=$pHit within $maxHashes hashes" +
        (if (maxBgProb < 1.0) s" and bg ceiling $maxBgProb at pBg=$pBg" else ""))
    plans.minBy(p => (p.totalHashes, -p.rowsPerBand))
  }

  /** [[tune]] in cosine-similarity terms for the SRP family. */
  def tuneCosine(simThreshold: Double, recall: Double, maxHashes: Int,
                 bgSim: Double = 0.0, maxBgProb: Double = 1.0): Plan =
    tune(srpCollisionProb(simThreshold), recall, maxHashes,
      srpCollisionProb(bgSim), maxBgProb)

  /** Candidate-budget knob C(recall) for the three-stage rerank
    * ([[graft.similarity.VectorOps.lshRerankTopK]]): how deep the int8
    * candidate pool must be so that, in expectation, the top-k true
    * neighbors that the LSH bands surfaced are still inside the pool
    * after background candidates dilute it.
    *
    * Expected pool composition per query under `plan`:
    * k·candidateProb(pHit) hits + n·candidateProb(pBg) background. The
    * int8 stage ranks by approximate cosine, so hits concentrate at the
    * top; the budget takes the hit mass plus a `slack` multiple of the
    * expected background mass ABOVE the hit band (background pairs that
    * out-rank a truth pair are rare — slack 0.05 covers the observed
    * int8 inversion rate at 64 dims) — floored at 2k, capped at n.
    * This turns the exact quadratic rerank
    * ([[graft.similarity.VectorOps.quantizedRerankTopK]]) into a
    * formally fenced oracle baseline: a production caller derives C
    * from a recall target instead of scanning the full corpus. */
  def rerankBudget(k: Int, corpusRows: Long, plan: Plan,
                   pHit: Double, pBg: Double, slack: Double = 0.05): Int = {
    val hitMass = k * candidateProb(pHit, plan.bands, plan.rowsPerBand)
    val bgMass = corpusRows * candidateProb(pBg, plan.bands, plan.rowsPerBand)
    val c = math.ceil(hitMass + slack * bgMass).toLong.max(2L * k)
    c.min(corpusRows).toInt
  }
}

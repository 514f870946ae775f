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
}

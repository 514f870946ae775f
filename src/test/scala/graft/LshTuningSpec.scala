package graft

import graft.similarity.{LshTuning, VectorOps}

class LshTuningSpec extends SparkSpec {
  import spark.implicits._
  import LshTuning._

  test("srpCollisionProb endpoints and monotonicity") {
    assert(math.abs(srpCollisionProb(1.0) - 1.0) < 1e-12)
    assert(math.abs(srpCollisionProb(0.0) - 0.5) < 1e-12)
    assert(math.abs(srpCollisionProb(-1.0)) < 1e-12)
    val samples = (-10 to 10).map(i => srpCollisionProb(i / 10.0))
    assert(samples.sliding(2).forall(s => s(0) <= s(1)))
    // out-of-range cosines (float drift) clamp instead of NaN
    assert(!srpCollisionProb(1.0000001).isNaN)
  }

  test("tuned plan meets recall with the minimal hash budget") {
    for {
      pHit <- Seq(0.6, 0.8, 0.9)
      recall <- Seq(0.8, 0.9, 0.99)
    } {
      val plan = tune(pHit, recall, maxHashes = 64)
      assert(candidateProb(pHit, plan.bands, plan.rowsPerBand) >= recall)
      assert(plan.totalHashes <= 64)
      // exhaustive reference search: no feasible plan is cheaper
      val best = (for {
        r <- 1 to 64; b <- 1 to 64 / r
        if candidateProb(pHit, b, r) >= recall
      } yield b * r).min
      assert(plan.totalHashes == best,
        s"pHit=$pHit recall=$recall: got ${plan.totalHashes}, best $best")
    }
  }

  test("background ceiling forces wider bands and is honored") {
    val loose = tune(0.856, 0.9, 64)
    val strict = tune(0.856, 0.9, 64, pBg = 0.5, maxBgProb = 0.05)
    assert(candidateProb(0.5, strict.bands, strict.rowsPerBand) <= 0.05)
    assert(strict.rowsPerBand >= loose.rowsPerBand,
      "precision constraint should never narrow the bands")
  }

  test("infeasible targets fail fast with a diagnosis") {
    val e = intercept[IllegalArgumentException] {
      tune(0.6, 0.99, maxHashes = 64, pBg = 0.5, maxBgProb = 0.001)
    }
    assert(e.getMessage.contains("no (bands, rows) plan"))
  }

  test("lshTopKAuto plumbs a tuned plan end-to-end with sane recall") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" % 20 === 0)
    val exact = VectorOps.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = VectorOps.lshTopKAuto(emb, q, k = 5, dim = 64,
        simThreshold = 0.9, recall = 0.9, bgSim = 0.0, maxBgProb = 0.1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"auto-tuned LSH recall@5 = $recall%.2f")
    // near-random embeddings: true neighbors sit far below the 0.9
    // design threshold, so this checks plumbing, not the S-curve
    assert(recall > 0.1)
  }

  test("rerankBudget scales with background mass and respects its floor/cap") {
    val plan = LshTuning.Plan(bands = 4, rowsPerBand = 4)
    val pHit = LshTuning.srpCollisionProb(0.9)
    val pBg = LshTuning.srpCollisionProb(0.0)
    val small = LshTuning.rerankBudget(k = 5, corpusRows = 1000L, plan, pHit, pBg)
    val large = LshTuning.rerankBudget(k = 5, corpusRows = 100000L, plan, pHit, pBg)
    assert(small >= 10, "budget must cover at least 2k")
    assert(large > small, "more corpus -> more background candidates -> deeper pool")
    // sublinear in n: the budget is a slack fraction of expected
    // background candidates, not the corpus
    assert(large < 100000 * 0.2)
    // degenerate corpus: capped at n
    assert(LshTuning.rerankBudget(5, 8L, plan, pHit, pBg) == 8)
    // the budgeted three-stage path actually retrieves: c from the knob
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" % 20 === 0)
    val n = emb.count()
    val c = LshTuning.rerankBudget(5, n, plan, pHit, pBg)
    val got = VectorOps.lshRerankTopK(emb, q, c = c, k = 5, dim = 64)
      .groupBy("query_id").count().as[(Long, Long)].collect()
    assert(got.nonEmpty && got.forall(_._2 <= 5))
  }
}

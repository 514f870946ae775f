package graft

import org.apache.spark.sql.functions._
import graft.similarity.VectorOps

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq((Seq(1.0f, 0f, 0f), Seq(1.0f, 0f, 0f), Seq(0f, 1.0f, 0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      VectorOps.cosine(VectorOps.toDouble($"a"), VectorOps.toDouble($"b")),
      VectorOps.cosine(VectorOps.toDouble($"a"), VectorOps.toDouble($"c")))
      .as[(Double, Double)].head()
    assert(math.abs(r._1 - 1.0) < 1e-12 && math.abs(r._2) < 1e-12)
  }

  test("bruteForceTopK ranks by similarity with id tie-break") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" === 0)
    val top = VectorOps.bruteForceTopK(emb, q, k = 3).orderBy("rank")
      .as[(Long, Long, Int, Double)].collect()
    assert(top.length == 3)
    assert(top.map(_._4).toSeq == top.map(_._4).toSeq.sorted.reverse)
    assert(!top.exists(_._2 == 0L)) // self excluded
  }

  test("ivfTopK probes nearest cells and recalls most true neighbors") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" % 20 === 0)
    val exact = graft.similarity.VectorOps.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = graft.similarity.VectorOps.ivfTopK(emb, q, k = 5, nCells = 8, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"IVF recall@5 = $recall%.2f (8 cells, 4 probes)")
    assert(recall > 0.3)
  }

  test("ivfTopKPortable keeps IVF retrieval quality under portable cell geometry") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" % 20 === 0)
    val exact = VectorOps.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val portable = VectorOps.ivfTopKPortable(emb, q, k = 5)
    val got = portable.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(f"portable-IVF recall@5 = $recall%.2f (16 cells, 4 probes)")
    assert(recall > 0.3)
    // the micro-unit quantization is a boundary perturbation, not a
    // different geometry: assignment agrees with the double-precision
    // path on (nearly) every vector
    val ref = VectorOps.ivfTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val agree = (ref & got).size.toDouble / math.max(ref.size, got.size)
    info(f"portable vs double-path neighbor agreement = $agree%.2f")
    assert(agree > 0.9)
  }

  test("lshRerankTopK composes LSH candidates with the exact rerank") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" % 20 === 0)
    val exact = VectorOps.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = VectorOps.lshRerankTopK(emb, q, c = 20, k = 5, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(f"LSH+rerank recall@5 = $recall%.2f (16 bits / 4 bands, c = 20)")
    assert(recall > 0.3)
    // within the LSH candidate pool the rerank is exact: every emitted
    // neighbor must also be an LSH-candidate of its query
    val cands = VectorOps.lshTopKPortable(emb, q, k = 1000000, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(cands))
  }

  test("KMeans.fit tightens clusters and feeds ivfTopK a usable quantizer") {
    val emb = Tables.embeddings(spark, sfDir)
    val init = graft.similarity.KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 0)
    val trained = graft.similarity.KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 3)
    val mInit = graft.similarity.KMeans.meanAssignedCosine(emb, "vec_id", "embedding", init)
    val mTrained = graft.similarity.KMeans.meanAssignedCosine(emb, "vec_id", "embedding", trained)
    info(f"mean assigned cosine: init=$mInit%.4f trained=$mTrained%.4f")
    // Lloyd's objective is monotone; the /|v| weighting can wobble a hair
    assert(mTrained >= mInit - 1e-3)
    // deterministic: refit gives bit-identical centroids
    val again = graft.similarity.KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 3)
    assert(trained.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)

    val q = emb.filter($"vec_id" % 20 === 0)
    val exact = VectorOps.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = VectorOps.ivfTopK(emb, q, k = 5, nProbe = 4,
        centroids = Some(trained))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"trained-IVF recall@5 = $recall%.2f (8 cells, 4 probes)")
    assert(recall > 0.3)
  }

  test("withRecallAtK emits the externally-computed recall and holds the IVF floor") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" % 20 === 0)
    val exact = VectorOps.bruteForceTopK(emb, q, k = 5)
    val approx = VectorOps.ivfTopK(emb, q, k = 5)
    val out = VectorOps.withRecallAtK(approx, exact, k = 5)
    // one recall value per query, equal to the set-intersection recall
    val emitted = out.select("query_id", "recall_at_k").distinct()
      .as[(Long, Double)].collect().toMap
    val truth = exact.select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = approx.select("query_id", "neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    emitted.foreach { case (qid, r) =>
      val expect = (truth(qid) & got.getOrElse(qid, Set.empty)).size / 5.0
      assert(r === expect, s"query $qid emitted $r, recomputed $expect")
    }
    val mean = emitted.values.sum / emitted.size
    info(f"mean emitted IVF recall@5 = $mean%.2f")
    assert(mean > 0.3) // the quality floor the rows-check now carries
  }

  test("lshTopK recall@5 vs brute force is reasonable for 16-bit/4-band") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" % 20 === 0)
    val exact = VectorOps.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = VectorOps.lshTopK(emb, q, k = 5, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"LSH recall@5 = $recall%.2f (candidates from 4 bands of 4 bits)")
    assert(recall > 0.2) // near-random embeddings: banding prunes hard
  }

  test("lshTopKPortable recall@5 vs brute force matches the splitmix path's ballpark") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" % 20 === 0)
    val exact = VectorOps.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = VectorOps.lshTopKPortable(emb, q, k = 5, dim = 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"portable-LSH recall@5 = $recall%.2f (md5 planes, 4 bands of 4 bits)")
    assert(recall > 0.2) // same SRP family and band layout as lshTopK
  }

  test("quantized rerank with a full candidate pool IS brute force") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" % 100 === 0)
    val n = emb.count().toInt
    val exact = VectorOps.bruteForceTopK(emb, q, k = 5)
      .as[(Long, Long, Int, Double)].collect().toSet
    val full = VectorOps.quantizedRerankTopK(emb, q, c = n, k = 5)
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(full == exact,
      "c = corpus means the rerank sees every neighbor — must equal brute force")
  }

  test("quantized rerank recall@5 at c=20 beats the LSH floor") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" % 20 === 0)
    val exact = VectorOps.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rer = VectorOps.quantizedRerankTopK(emb, q, c = 20, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & rer).size.toDouble / exact.size
    info(f"quantized-rerank recall@5 = $recall%.2f (c=20)")
    // int8 candidate ranking tracks exact cosine closely — far above
    // the random-ish LSH banding floor
    assert(recall > 0.7)
  }

  test("knn classification partitions the query sample and bounds accuracy") {
    val emb = Tables.embeddings(spark, sfDir)
    val nQueries = emb.filter($"vec_id" % 10 === 0).count()
    val got = SparkEntry.queries("sim_knn_classify")(spark, sfDir)
      .select("n", "n_correct", "acc").as[(Long, Long, Double)].collect()
    assert(got.map(_._1).sum == nQueries, "every query votes exactly once")
    got.foreach { case (n, c, a) =>
      assert(c <= n)
      assert(math.abs(a - c.toDouble / n) < 1e-12)
    }
  }

  test("mmrTopK diversifies: no duplicate picks, lower redundancy than plain top-k") {
    import graft.similarity.VectorOps
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" % 20 === 0)
    val got = VectorOps.mmrTopK(emb, q, k = 5, pool = 10, lambda = 0.7)
      .select("query_id", "step", "cand_id", "sim", "redundancy")
      .as[(Long, Int, Long, Double, Double)].collect()
    val byQ = got.groupBy(_._1)
    byQ.foreach { case (_, rows) =>
      assert(rows.length == 5)
      assert(rows.map(_._3).distinct.length == 5, "picks must be distinct")
      assert(rows.map(_._2).sorted.toSeq == Seq(1, 2, 3, 4, 5))
      // step 1 is the relevance argmax; its redundancy is 0 by definition
      assert(rows.find(_._2 == 1).get._5 == 0.0)
    }
    // every MMR pick comes from the pool, and a pick's recorded
    // redundancy is its max similarity to EARLIER picks only
    val pool = VectorOps.bruteForceTopK(emb, q, k = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(got.forall(r => pool.contains((r._1, r._3))))
  }

  test("fitIntPortable trains a usable quantizer and is deterministic") {
    import graft.similarity.{KMeans, VectorOps}
    val emb = Tables.embeddings(spark, sfDir)
    val a = KMeans.fitIntPortable(emb, "vec_id", "embedding", k = 16, iters = 3)
    val b = KMeans.fitIntPortable(emb, "vec_id", "embedding", k = 16, iters = 3)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // micro-unit-normalized: every centroid norm within floor-slack of 1e6
    a.foreach { c =>
      val n = math.sqrt(c.map(x => x.toDouble * x).sum)
      // floor-normalization slack: floor rounds negative coordinates
      // AWAY from zero, so the norm can exceed 1e6 by up to ~sqrt(dim)
      assert(n > 999000.0 && n <= 1000008.0, s"norm $n out of micro-unit band")
    }
    // trained cells retrieve at least as well as the untrained stand-in
    val q = emb.filter($"vec_id" % 20 === 0)
    val exact = VectorOps.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val trained = VectorOps.ivfTopKPortable(emb, q, k = 5, centroidsInt = Some(a))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val standIn = VectorOps.ivfTopKPortable(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rTrained = (exact & trained).size.toDouble / exact.size
    val rStand = (exact & standIn).size.toDouble / exact.size
    info(f"recall@5: trained = $rTrained%.2f, first-16 stand-in = $rStand%.2f")
    assert(rTrained >= rStand - 0.05, "training should not lose retrieval quality")
  }

  test("pqTopKInt keeps PQ retrieval quality under the integer codebooks") {
    import graft.similarity.{Quantize, VectorOps}
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" % 20 === 0)
    val exact = VectorOps.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val m = Quantize.pqTrainIntPortable(emb, "vec_id", "embedding",
      dim = 64, m = 8, k = 16, iters = 2)
    assert(m.codebooks.length == 8 && m.codebooks.forall(_.length == 16))
    val got = Quantize.pqTopKInt(emb, q, k = 5, m)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(f"integer-PQ recall@5 = $recall%.2f")
    assert(recall > 0.25, "integer PQ at 32x compression should stay useful")
  }
}

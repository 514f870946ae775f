package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

class Round5Spec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------ dedup cache discipline

  test("dedup builders leave no graft-owned blocks after releaseCaches") {
    val docs = Tables.documents(spark, sfDir)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(Dedup.ngramJaccardPairs(docs, "text", "doc_id").count() >= 0)
    assert(Dedup.minhashLshPairs(docs, "text", "doc_id").count() >= 0)
    assert(Dedup.ppjoinJaccardPairs(docs, "text", "doc_id").count() >= 0)
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.nonEmpty, "builders should cache their shingle frames while live")
    Dedup.releaseCaches()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty,
      s"graft-owned blocks still cached after releaseCaches: $after")
  }

  // ------------------------------------- large-star/small-star components

  private def pairsDf(rdd: org.apache.spark.rdd.RDD[(Long, Long)]) =
    rdd.toDF("a", "b")

  test("star components equal pointer jumping on a mixed graph") {
    val sc = spark.sparkContext
    // chain ∪ star ∪ two-node islands ∪ a triangle with a redundant edge
    val mixed = sc.range(0, 2000).map(i => (i, i + 1)) ++
      sc.range(10000, 11000).map(i => (10000L, i + 1)) ++
      sc.parallelize(Seq((20000L, 20001L), (30000L, 30001L),
        (40000L, 40001L), (40001L, 40002L), (40000L, 40002L)))
    val a = Dedup.connectedComponentsStar(pairsDf(mixed), "a", "b")
    val b = Dedup.connectedComponents(pairsDf(mixed), "a", "b")
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    // spot-check the centers
    val got = a.filter(col("id").isin(2000, 11000, 40002)).orderBy(col("id"))
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((2000L, 0L), (11000L, 10000L), (40002L, 40000L)))
  }

  test("star components handle a 2M-leaf star (huge-degree case) in few rounds") {
    val sc = spark.sparkContext
    // 2M edges, one star whose min is a LEAF (the center must be
    // re-wired, not just confirmed) — the case where a node→label
    // table or a collected adjacency list would concentrate the whole
    // component on one task. maxIters=10 doubles as the round bound.
    val star = sc.range(2000000, 4000000, numSlices = 8)
      .map(i => (1999999L, i))
    val tail = sc.parallelize(Seq((1999999L, 1900000L)))
    val labels = Dedup.connectedComponentsStar(pairsDf(star ++ tail), "a", "b",
      maxIters = 10)
    val byCluster = labels.groupBy(col("cluster_id")).count()
      .as[(Long, Long)].collect().toMap
    assert(byCluster(1900000L) == 2000002L) // leaves + center + tail node
  }

  // ------------------------------------------------ product quantization

  test("PQ reconstruction is deterministic and shapes are right") {
    import graft.similarity.Quantize
    val emb = Tables.embeddings(spark, sfDir)
    val model = Quantize.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16, iters = 2)
    assert(model.codebooks.length == 8 && model.codebooks.forall(_.length == 16)
      && model.codebooks.forall(_.forall(_.length == 8)))
    val again = Quantize.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16, iters = 2)
    assert(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      again.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val row = emb.select(col("vec_id"),
        Quantize.pqDecode(Quantize.pqEncode(col("embedding").cast("array<double>"), model),
          model).as("rec"))
      .orderBy(col("vec_id")).limit(1).as[(Long, Seq[Double])].head()
    assert(row._2.length == 64)
  }

  test("PQ recall@5 trails int8 but stays useful at 8x its compression") {
    import graft.similarity.{Quantize, VectorOps}
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" % 20 === 0)
    val exact = VectorOps.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

    val model = Quantize.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 8, k = 32, iters = 3)
    val pq = Quantize.pqTopK(emb, q, k = 5, model)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pqRecall = (exact & pq).size.toDouble / exact.size

    // int8 comparison at 4x compression: same ranking over per-vector
    // scalar-quantized reconstructions
    val v = col("embedding").cast("array<double>")
    val (vmin, _, scale) = Quantize.params(v)
    val int8 = emb.select(col("vec_id"),
      Quantize.decode(Quantize.encode(v, vmin, scale), vmin, scale).as("embedding"))
    val i8 = VectorOps.bruteForceTopK(int8, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val i8Recall = (exact & i8).size.toDouble / exact.size

    info(f"recall@5: int8 (4x) = $i8Recall%.2f, PQ m=8 k=32 (32x) = $pqRecall%.2f")
    assert(i8Recall > 0.9, "int8 reconstruction should barely disturb ranking")
    assert(pqRecall > 0.25, "PQ at 32x compression should stay useful")
    assert(i8Recall >= pqRecall - 0.05, "finer quantization should not recall less")
  }

  test("IVF+PQ composed index keeps useful recall through cells AND codes") {
    import graft.similarity.{KMeans, Quantize, VectorOps}
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter($"vec_id" % 20 === 0)
    val exact = VectorOps.bruteForceTopK(emb, q, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val model = Quantize.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 8, k = 32, iters = 3)
    val cents = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 2)
    val got = VectorOps.ivfPqTopK(emb, q, k = 5, model,
        nCells = 8, nProbe = 4, centroids = Some(cents))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    info(f"IVF+PQ recall@5 = $recall%.2f (8 cells / 4 probes over 32x-compressed codes)")
    // two stacked approximations (cell pruning ∘ code coarseness) —
    // the floor is necessarily below either alone
    assert(recall > 0.2)
  }

  // ------------------------------------------------ trigram language ID

  test("trigram langid beats marker words on a mixed natural corpus") {
    import graft.text.TextFunctions
    // ordinary sentences, deliberately short / stopword-poor enough
    // that the 5-marker heuristic struggles
    val corpus = Seq(
      ("en", "writing distributed systems requires patience"),
      ("en", "this evening we walked to the harbor together"),
      ("en", "streaming engines checkpoint their state periodically"),
      ("en", "nothing interesting happened during the meeting"),
      ("de", "verteilte systeme brauchen geduld und erfahrung"),
      ("de", "heute abend gehen wir gemeinsam zum hafen"),
      ("de", "die entwicklung dieser anwendung dauerte sehr lange"),
      ("de", "nichts interessantes geschah in der besprechung"),
      ("es", "los sistemas distribuidos requieren mucha paciencia"),
      ("es", "esta noche caminamos juntos hasta el puerto"),
      ("es", "la aplicacion guarda su estado periodicamente"),
      ("es", "nada interesante ocurrio durante la reunion"),
      ("fr", "les systemes distribues demandent beaucoup de patience"),
      ("fr", "ce soir nous marchons ensemble vers le port"),
      ("fr", "une application sauvegarde son etat periodiquement"),
      ("fr", "rien d'interessant ne s'est passe pendant la reunion"))
      .toDF("lang", "text")
    val scored = corpus.select(col("lang"),
        TextFunctions.langIdTrigram(col("text")).as("tri"),
        TextFunctions.langId(col("text")).as("marker"))
      .as[(String, String, String)].collect()
    val triAcc = scored.count(r => r._2 == r._1).toDouble / scored.length
    val markerAcc = scored.count(r => r._3 == r._1).toDouble / scored.length
    info(f"langid accuracy: trigram=$triAcc%.2f marker=$markerAcc%.2f")
    assert(triAcc >= 0.85, scored.filter(r => r._2 != r._1).mkString(", "))
    assert(triAcc >= markerAcc)
  }

  test("star components converge within 2·log2 + 7 rounds on a long chain") {
    val sc = spark.sparkContext
    // pure path graph (the adversarial DIAMETER case): alternating
    // large/small star must collapse a 2^15-long chain within the
    // O(log n) bound — maxIters IS the assertion (throws if exceeded)
    val n = 32768L
    val chain = sc.range(0, n, numSlices = 4).map(i => (i, i + 1))
    val labels = Dedup.connectedComponentsStar(pairsDf(chain), "a", "b",
      maxIters = 2 * 15 + 7)
    assert(labels.filter(col("cluster_id") === 0).count() == n + 1)
  }
}

package graft

import org.apache.spark.sql.functions._

/** Independent-recompute pins for the round-17 wave-3 keys (same
  * shared-hand defense as [[Round17Wave2Spec]]): Youden and Lilliefors
  * re-derive from collected rows, Fleiss' kappa re-derives from
  * per-document P_i terms (NOT the Σn₁² shortcut the engine uses),
  * the langid matrix cross-pins the shipped text_langid predictions,
  * and the silhouette is pinned to its simplified-form invariants. */
class Round17Wave3Spec extends SparkSpec {
  import spark.implicits._

  test("youden matches a direct cutoff sweep and dominates the trivial classifiers") {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey").cast("long"),
        col("o_orderdate").cast("timestamp").cast("long"))
      .as[(Long, Long)].collect()
    val anchor = o.map(_._2).max
    val last = o.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val cutoff = anchor - 90L * 86400
    val rows = Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long)].collect()
      .map { case (ck, v) =>
        val churn = last.get(ck).forall(_ < cutoff)
        (v, if (churn) 1L else 0L)
      }
    val n1 = rows.map(_._2).sum; val n0 = rows.length - n1
    val byV = rows.groupBy(_._1).toArray.sortBy(_._1)
    var cum = 0L; var cum1 = 0L
    var bestM = Long.MinValue; var bestV = 0L; var bestT = 0L; var bestC = 0L
    byV.foreach { case (v, g) =>
      cum += g.length; cum1 += g.map(_._2).sum
      val m = n0 * cum1 - n1 * (cum - cum1)
      if (m > bestM) { bestM = m; bestV = v; bestT = cum1; bestC = cum }
    }
    val r = SparkEntry.queries("an_youden")(spark, sfDir)
      .select("n1", "n0", "cutoff_c", "j_stat", "tpr", "fpr")
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(r._1 == n1 && r._2 == n0 && r._3 == bestV)
    assert(math.abs(r._4 - bestM.toDouble / (n1.toDouble * n0)) < 1e-6)
    assert(math.abs(r._5 - bestT.toDouble / n1) < 1e-6)
    assert(math.abs(r._6 - (bestC - bestT).toDouble / n0) < 1e-6)
    // J of the all-positive / all-negative classifiers is 0; the
    // optimum must not be worse
    assert(r._4 >= -1e-9)
  }

  test("lilliefors matches a direct EDF-vs-phi recompute") {
    val v = Tables.customer(spark, sfDir)
      .select((col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[Long].collect()
    val n = v.length
    val mu = v.map(BigInt(_)).sum.toDouble / n
    val m2 = (BigInt(n) * v.map(x => BigInt(x) * BigInt(x)).sum -
      v.map(BigInt(_)).sum * v.map(BigInt(_)).sum).toDouble
    val sd = math.sqrt(m2 / (n.toDouble * (n - 1.0)))
    def phi(z: Double): Double = {
      val az = math.abs(z)
      val t = 1.0 / (1.0 + 0.2316419 * az)
      val poly = t * (0.319381530 + t * (-0.356563782 + t *
        (1.781477937 + t * (-1.821255978 + t * 1.330274429))))
      val pa = 1.0 - 0.3989422804014327 * math.exp(-0.5 * az * az) * poly
      if (z >= 0) pa else 1.0 - pa
    }
    val byV = v.groupBy(identity).toArray.sortBy(_._1)
    var cum = 0L; var d = 0.0
    byV.foreach { case (vv, g) =>
      val lo = cum.toDouble / n
      cum += g.length
      val hi = cum.toDouble / n
      val p = phi((vv - mu) / sd)
      d = math.max(d, math.max(hi - p, p - lo))
    }
    val r = SparkEntry.queries("an_lilliefors")(spark, sfDir)
      .select("n", "d_stat", "sqrt_n_d").as[(Long, Double, Double)].head()
    assert(r._1 == n)
    assert(math.abs(r._2 - d) < 1e-6, s"D ${r._2} vs direct $d")
    assert(math.abs(r._3 - math.sqrt(n.toDouble) * d) < 1e-5)
  }

  test("fleiss kappa matches a per-document P_i recompute (not the moment shortcut)") {
    val stop = graft.text.TextFunctions.Stopwords("en").toSet
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val n1s = docs.map { case (_, text) =>
      val ws = text.split(" ").filter(_.nonEmpty)
      val nW = ws.length
      val meanLen = ws.map(_.length).sum.toDouble / nW
      val nStop = ws.count(stop)
      val topFrac = ws.groupBy(identity).values.map(_.length).max.toDouble / nW
      Seq(nW < 50, meanLen < 3.0 || meanLen > 10.0, nStop < 2, topFrac > 0.2)
        .count(identity)
    }
    val n = n1s.length; val m = 4
    val pis = n1s.map(k => (k * (k - 1) + (m - k) * (m - k - 1)).toDouble / (m * (m - 1)))
    val pbar = pis.sum / n
    val p1 = n1s.sum.toDouble / (n * m)
    val pe = p1 * p1 + (1 - p1) * (1 - p1)
    val kappa = (pbar - pe) / (1 - pe)
    val r = SparkEntry.queries("an_fleiss_kappa")(spark, sfDir)
      .select("n_docs", "n_fail_total", "p_fail", "p_bar", "kappa")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 == n && r._2 == n1s.sum)
    assert(math.abs(r._3 - p1) < 1e-6)
    assert(math.abs(r._4 - pbar) < 1e-6, s"pbar ${r._4} vs direct $pbar")
    assert(math.abs(r._5 - kappa) < 1e-5, s"kappa ${r._5} vs direct $kappa")
  }

  test("langid matrix cross-pins the shipped predictions and partitions the corpus") {
    val m = SparkEntry.queries("text_langid_eval")(spark, sfDir)
      .select("lang", "lang_pred", "n").as[(String, String, Long)].collect()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(m.map(_._3).sum == nDocs, "matrix must partition the corpus")
    val preds = SparkEntry.queries("text_langid")(spark, sfDir)
      .select("lang_pred").as[String].collect()
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val colSums = m.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(colSums == preds,
      s"matrix column sums $colSums must equal the shipped prediction counts $preds")
  }

  test("silhouette covers the corpus, stays in the simplified range, and uses the served cells") {
    val rows = SparkEntry.queries("sim_silhouette")(spark, sfDir)
      .select("cell_id", "n_vecs", "mean_sil").as[(Long, Long, Double)].collect()
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(rows.map(_._2).sum == nVecs, "every vector is assigned exactly once")
    // simplified silhouette s = (cos1-cos2)/(1-cos2) with cos1 >= cos2
    // is in [0, 1] by construction
    rows.foreach { case (c, _, s) =>
      assert(c >= 0 && c < 16)
      assert(s >= -1e-9 && s <= 1.0 + 1e-9, s"cell $c mean_sil $s out of range")
    }
  }
}

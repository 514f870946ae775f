package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-11 corpus statistics: driver
  * recomputation from raw text at sf0.001 (the oracle hash-checks the
  * values at sf0.01; these pin what the values MEAN). */
class TextCorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private val vowels = Set('a', 'e', 'i', 'o', 'u')

  private def syllables(w: String): Long = {
    // vowel-group count, floor 1 — the translate-trick semantics
    var groups = 0
    var inGroup = false
    w.foreach { ch =>
      val v = vowels(ch)
      if (v && !inGroup) groups += 1
      inGroup = v
    }
    math.max(1L, groups.toLong)
  }

  test("text_readability matches driver vowel-group syllable counts") {
    val got = SparkEntry.queries("text_readability")(spark, sfDir)
      .select("doc_id", "n_words", "n_syll", "n_complex", "fog_grade")
      .as[(Long, Long, Long, Long, Double)].collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    assert(got.nonEmpty)
    got.foreach { case (id, nw, ns, nc, fog) =>
      val ws = docs(id).split(" ").filter(_.nonEmpty)
      assert(ws.length.toLong == nw)
      assert(ws.map(syllables).sum == ns, s"doc $id syllables")
      assert(ws.count(syllables(_) >= 3).toLong == nc, s"doc $id complex words")
      val exp = 0.4 * (20.0 + 100.0 * nc.toDouble / nw)
      assert(math.abs(fog - exp) < 1e-3)
    }
  }

  test("text_vocab_growth cumulates to the exact corpus totals") {
    val got = SparkEntry.queries("text_vocab_growth")(spark, sfDir)
      .select("bucket", "n_docs", "tokens_cum", "vocab_cum", "heaps_beta")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val allTokens = docs.map(_._2.split(" ").count(_.nonEmpty).toLong).sum
    val vocab = docs.flatMap(_._2.split(" ").filter(_.nonEmpty)).distinct.length.toLong
    val last = got.last
    assert(last._3 == allTokens && last._4 == vocab)
    // cumulative monotonicity and per-bucket new-vocab consistency
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 > a._3 && b._4 >= a._4)
    }
    // first bucket vocab = distinct terms among its docs
    val b0docs = docs.filter(_._1 / 50 == got.head._1)
    assert(got.head._4 ==
      b0docs.flatMap(_._2.split(" ").filter(_.nonEmpty)).distinct.length.toLong)
    assert(math.abs(last._5 - math.log(vocab.toDouble) / math.log(allTokens.toDouble)) < 1e-5)
  }

  test("text_js_divergence matches driver JS and sits in [0, ln 2]") {
    val (np, nq, vocab, js, jsNorm) =
      SparkEntry.queries("text_js_divergence")(spark, sfDir)
        .select("n_src0", "n_src1", "vocab", "js", "js_norm")
        .as[(Long, Long, Long, Double, Double)].head()
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).as[(String, String)].collect()
    def counts(src: String) = docs.filter(_._1 == src)
      .flatMap(_._2.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (k, g) => (k, g.size.toLong) }
    val cp = counts("src0"); val cq = counts("src1")
    val terms = cp.keySet ++ cq.keySet
    val sp = cp.values.sum.toDouble; val sq = cq.values.sum.toDouble
    val expJs = terms.toSeq.map { t =>
      val p = cp.getOrElse(t, 0L) / sp
      val q = cq.getOrElse(t, 0L) / sq
      val m = (p + q) / 2.0
      (if (p > 0) p * math.log(p / m) else 0.0) +
        (if (q > 0) q * math.log(q / m) else 0.0)
    }.sum / 2.0
    assert(np == sp.toLong && nq == sq.toLong && vocab == terms.size.toLong)
    assert(math.abs(js - expJs) < 1e-5)
    assert(js >= -1e-9 && js <= math.log(2.0) + 1e-9)
    assert(math.abs(jsNorm - js / math.log(2.0)) < 1e-5)
  }
}

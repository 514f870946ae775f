package graft

import org.apache.spark.sql.functions._

/** Semantic pins for an_entropy_rate, text_burstiness, and
  * mm_image_entropy (r11): driver recomputation at sf0.001. */
class InfoContentSpec extends SparkSpec {
  import spark.implicits._

  test("an_entropy_rate matches the driver Markov computation") {
    val (n, k, h, hn) = SparkEntry.queries("an_entropy_rate")(spark, sfDir)
      .select("n_transitions", "k_states", "entropy_rate", "normalized_rate")
      .as[(Long, Long, Double, Double)].collect().head
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val sorted = g.sortBy(r => (r._2, r._3))
      sorted.sliding(2).collect { case Array(a, b) => (a._4, b._4) }
    }
    val nij = trans.groupBy(identity).map { case (kk, g) => (kk, g.size.toLong) }
    val ni = nij.groupBy(_._1._1).map { case (kk, g) => (kk, g.values.sum) }
    val nn = nij.values.sum
    val expH = nij.map { case ((p, _), c) =>
      -c.toDouble / nn * math.log(c.toDouble / ni(p))
    }.sum
    val kk = nij.keys.map(_._2).toSet.size.toLong
    assert(n == nn && k == kk)
    assert(math.abs(h - expH) < 1e-5)
    assert(math.abs(hn - expH / math.log(kk.toDouble)) < 1e-5)
    assert(h >= 0.0 && hn <= 1.0 + 1e-9)
  }

  test("text_burstiness Fano factors include zero-count docs") {
    val got = SparkEntry.queries("text_burstiness")(spark, sfDir)
      .select("term", "t", "df", "fano").as[(String, Long, Long, Double)].collect()
    assert(got.length == 30)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val d = docs.length.toLong
    got.foreach { case (term, t, df, fano) =>
      val counts = docs.map(_._2.split(" ").count(_ == term).toLong)
      assert(counts.sum == t && counts.count(_ > 0).toLong == df)
      val s2 = counts.map(c => c * c).sum
      val exp = (d * s2 - t * t).toDouble / (d * t)
      assert(math.abs(fano - exp) < 1e-6, s"term $term")
      assert(fano >= 0.0)
    }
    // top-30 really is the top by total count
    val all = docs.flatMap(_._2.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (_, g) => g.size.toLong }.toSeq.sorted.reverse
    assert(got.map(_._2).min >= all.drop(30).headOption.getOrElse(0L))
  }

  test("mm_image_entropy matches driver histogram entropy and bounds") {
    val got = SparkEntry.queries("mm_image_entropy")(spark, sfDir)
      .select("doc_id", "n_px", "n_bins_used", "entropy")
      .as[(Long, Long, Long, Double)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(got.nonEmpty)
    got.foreach { case (id, npx, nb, ent) =>
      val w = 8 + (id % 5).toInt; val h = 8 + (id % 3).toInt
      assert(npx == (w * h).toLong)
      val rgb = Array.tabulate(3 * w * h) { p =>
        md.digest(s"hist:$id:$p".getBytes("UTF-8"))(0)
      }
      val bins = new Array[Long](8)
      rgb.grouped(3).foreach { t =>
        bins(t.map(_ & 0xFF).sum / 96) += 1
      }
      assert(nb == bins.count(_ > 0).toLong)
      val n = npx.toDouble
      val exp = bins.filter(_ > 0).map(b => -b / n * math.log(b / n)).sum
      assert(math.abs(ent - exp) < 1e-5, s"doc $id")
      assert(ent >= -1e-9 && ent <= math.log(8.0) + 1e-9)
    }
  }
}

package graft

import org.apache.spark.sql.functions._

/** Semantic pins for an_ks_model, an_psi, and mm_video_dedup (r11):
  * driver recomputation at sf0.001. */
class ModelMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def churnScored(): Array[(Long, Long)] = {
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderdate")).as[(Long, java.sql.Timestamp)].collect()
    val mx = o.map(_._2.getTime).max
    val cutoff = mx - 90L * 86400000L
    val last = o.groupBy(_._1).map { case (k, g) => (k, g.map(_._2.getTime).max) }
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(Long, Long)].collect()
      .map { case (ck, v) => (v, if (last.get(ck).forall(_ < cutoff)) 1L else 0L) }
  }

  test("an_ks_model equals the driver max TPR-FPR separation") {
    val (nPos, nNeg, thr, ks) = SparkEntry.queries("an_ks_model")(spark, sfDir)
      .select("n_pos", "n_neg", "ks_threshold_cents", "ks")
      .as[(Long, Long, Long, Double)].collect().head
    val scored = churnScored()
    val p = scored.map(_._2).sum; val ng = scored.length - p
    val seps = scored.map(_._1).distinct.sorted.map { v =>
      val tpr = scored.count(r => r._1 <= v && r._2 == 1L).toDouble / p
      val fpr = scored.count(r => r._1 <= v && r._2 == 0L).toDouble / ng
      (v, math.abs(tpr - fpr))
    }
    val expKs = seps.map(_._2).max
    val expThr = seps.filter(_._2 == expKs).map(_._1).min
    assert(nPos == p && nNeg == ng.toLong)
    assert(math.abs(ks - expKs) < 1e-6)
    assert(thr == expThr)
    assert(ks >= 0.0 && ks <= 1.0)
  }

  test("an_psi matches a driver band computation and reports skipped mass") {
    val (nE, nL, nBands, nSkipped, psi) = SparkEntry.queries("an_psi")(spark, sfDir)
      .select("n_early", "n_late", "n_bands_used", "n_rows_skipped", "psi")
      .as[(Long, Long, Long, Long, Double)].collect().head
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderdate"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .as[(java.sql.Timestamp, Long)].collect()
    val days = o.map(_._1.getTime / 86400000L)
    val mn = days.min; val mx = days.max
    val rows = o.map { case (d, v) =>
      ((d.getTime / 86400000L - mn) * 2 < (mx - mn), v / 5000000L)
    }
    val na = rows.count(_._1).toLong; val nb = rows.length - na
    val bands = rows.groupBy(_._2).map { case (b, g) =>
      (b, g.count(_._1).toLong, g.count(!_._1).toLong)
    }
    val used = bands.filter(b => b._2 > 0 && b._3 > 0)
    val expPsi = used.map { case (_, ca, cb) =>
      val pa = ca.toDouble / na; val pb = cb.toDouble / nb
      (pa - pb) * math.log(pa / pb)
    }.sum
    assert(nE == na && nL == nb.toLong)
    assert(nBands == used.size.toLong)
    assert(nSkipped == bands.filter(b => b._2 == 0 || b._3 == 0).map(b => b._2 + b._3).sum)
    assert(math.abs(psi - expPsi) < 1e-5)
    assert(psi >= -1e-9, "PSI is nonnegative")
  }

  test("mm_video_dedup groups exact copies and is frame-order sensitive") {
    val got = SparkEntry.queries("mm_video_dedup")(spark, sfDir)
      .select("vprint", "n_videos", "min_doc", "max_doc")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // recompute fingerprints in the driver via the REAL decode
    val md = java.security.MessageDigest.getInstance("MD5")
    def nib2(key: String): Int = {
      val b0 = md.digest(key.getBytes("UTF-8"))(0)
      ((b0 >> 4) & 0xF) * 16 + (b0 & 0xF)
    }
    val ids = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long")).as[Long].collect()
    def fingerprint(id: Long): Long = {
      val fam = id % 25
      val frames = Array.tabulate(3) { f =>
        Array.tabulate(24) { p =>
          val base = nib2(s"vid:$fam:$f:$p")
          val v =
            if (id % 4 == 0) base
            else if (id % 4 == 1) (base + nib2(s"vn:$id:$f:$p") % 4) % 256
            else (base + nib2(s"vn:$id:$f:$p")) % 256
          v.toByte
        }
      }
      val decoded = graft.multimodal.BinaryColumns.decodeAviFrames(id,
        graft.multimodal.BinaryColumns.encodeAvi(4, 2, 33333, frames))
      // decode must invert encode exactly
      decoded.zip(frames).foreach { case (d, fr) => assert(d.sameElements(fr)) }
      decoded.zipWithIndex.map { case (rgb, f) =>
        val gray = Array.tabulate(8)(q =>
          ((rgb(3 * q) & 0xFF) + (rgb(3 * q + 1) & 0xFF) + (rgb(3 * q + 2) & 0xFF)) / 3)
        val mean = gray.sum / 8
        (0 until 7).map(q => if (gray(q) > mean) 1L << q else 0L).sum * (1L << (7 * f))
      }.sum
    }
    val fps = ids.map(id => (id, fingerprint(id)))
    val expected = fps.groupBy(_._2).filter(_._2.length >= 2)
      .map { case (fp, g) =>
        (fp, g.length.toLong, g.map(_._1).min, g.map(_._1).max)
      }.toSet
    assert(got.toSet == expected)
    // every exact-copy family (id % 4 == 0, same fam) shares a print
    val copies = ids.filter(_ % 4 == 0).groupBy(_ % 25).values.filter(_.length >= 2)
    copies.foreach { g =>
      assert(g.map(fingerprint).distinct.length == 1, "exact copies must collide")
    }
  }
}

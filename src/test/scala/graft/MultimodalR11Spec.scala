package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-11 multimodal additions: the decode
  * paths are REAL (the payload goes through the actual BMP/AVI
  * container bytes), so these verify the decode against an
  * independent in-driver resynthesis at sf0.001. */
class MultimodalR11Spec extends SparkSpec {
  import spark.implicits._

  test("mm_image_hist bins every pixel exactly once per doc") {
    val got = SparkEntry.queries("mm_image_hist")(spark, sfDir)
      .select("doc_id", "bin", "n_px", "sum_lum")
      .as[(Long, Int, Long, Long)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val byDoc = got.groupBy(_._1)
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (0 until 8), s"doc $id: 8 fixed bins")
      val w = 8 + (id % 5).toInt; val h = 8 + (id % 3).toInt
      val rgb = Array.tabulate(3 * w * h) { p =>
        md.digest(s"hist:$id:$p".getBytes("UTF-8"))(0)
      }
      val lums = rgb.grouped(3).map(t => t.map(_ & 0xFF).sum).toSeq
      assert(rows.map(_._3).sum == w.toLong * h, s"doc $id: all pixels binned")
      rows.foreach { case (_, b, n, s) =>
        val inBin = lums.filter(_ / 96 == b)
        assert(inBin.size.toLong == n && inBin.map(_.toLong).sum == s,
          s"doc $id bin $b")
      }
    }
  }

  test("mm_scene_cuts fires exactly at the synthesized scene boundaries") {
    val got = SparkEntry.queries("mm_scene_cuts")(spark, sfDir)
      .select("doc_id", "cut_at", "prev_sum", "frame_sum")
      .as[(Long, Long, Long, Long)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val ids = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long")).as[Long].collect()
    val expected = ids.flatMap { id =>
      val w = 2 + (id % 3).toInt; val h = 1 + (id % 2).toInt
      val nf = 6 + (id % 4).toInt
      val sums = (0 until nf).map { f =>
        (0 until 3 * w * h).map { p =>
          md.digest(s"sc:$id:${f / 3}:$p".getBytes("UTF-8"))(0) & 0xFF
        }.map(_.toLong).sum
      }
      (1 until nf).filter(f => sums(f) != sums(f - 1))
        .map(f => (id, f.toLong, sums(f - 1), sums(f)))
    }.toSet
    assert(got.toSet == expected)
    // scene length 3 ⇒ only frame indexes 3 and 6 can be boundaries
    assert(got.forall(c => c._2 == 3L || c._2 == 6L))
    assert(got.nonEmpty)
  }
}

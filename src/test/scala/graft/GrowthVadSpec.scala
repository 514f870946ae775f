package graft

import org.apache.spark.sql.functions._

/** Semantic pins for an_growth_accounting and mm_audio_vad (r11):
  * driver recomputation at sf0.001. */
class GrowthVadSpec extends SparkSpec {
  import spark.implicits._

  test("an_growth_accounting partitions DAU and balances churn") {
    val got = SparkEntry.queries("an_growth_accounting")(spark, sfDir)
      .select("day", "n_new", "n_retained", "n_resurrected", "n_churned")
      .as[(java.sql.Timestamp, Long, Long, Long, Long)].collect()
      .map(r => (r._1.getTime, (r._2, r._3, r._4, r._5))).toMap
    val ud = Tables.events(spark, sfDir)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id")).distinct()
      .as[(java.sql.Timestamp, Long)].collect()
      .map(r => (r._1.getTime, r._2))
    val byDay = ud.groupBy(_._1).map { case (d, g) => (d, g.map(_._2).toSet) }
    val firstDay = ud.groupBy(_._2).map { case (u, g) => (u, g.map(_._1).min) }
    val dayMs = 86400000L
    byDay.foreach { case (d, users) =>
      val nNew = users.count(firstDay(_) == d).toLong
      val prevU = byDay.getOrElse(d - dayMs, Set.empty[Long])
      val nRet = users.count(u => firstDay(u) != d && prevU(u)).toLong
      val nRes = users.count(u => firstDay(u) != d && !prevU(u)).toLong
      val r = got(d)
      assert((r._1, r._2, r._3) == ((nNew, nRet, nRes)), s"day $d presence split")
      assert(r._1 + r._2 + r._3 == users.size.toLong, "classes partition DAU")
    }
    // churned on d+1 = present d, absent d+1
    byDay.foreach { case (d, users) =>
      val next = byDay.getOrElse(d + dayMs, Set.empty[Long])
      val exp = users.count(u => !next(u)).toLong
      got.get(d + dayMs).foreach { r => assert(r._4 == exp, s"churn at ${d + dayMs}") }
    }
    // total appearances conserved
    assert(got.values.map(r => r._1 + r._2 + r._3).sum == ud.length.toLong)
  }

  test("mm_audio_vad matches a driver energy-threshold computation") {
    val got = SparkEntry.queries("mm_audio_vad")(spark, sfDir)
      .select("doc_id", "n_windows", "n_active", "first_active", "last_active",
        "kept_windows")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(got.nonEmpty)
    got.foreach { case (id, nw, na, fa, la, kept) =>
      val n = 32 + (id % 17).toInt
      val samples = (0 until n).map { p =>
        val d = md.digest(s"au:$id:$p".getBytes("UTF-8"))
        (((d(0) & 0xFF) << 8) | (d(1) & 0xFF)).toShort
      }
      val wins = samples.grouped(8).toSeq
      assert(nw == wins.size.toLong)
      val active = wins.zipWithIndex.collect {
        case (w, i) if w.map(v => v.toLong * v).sum >= w.size.toLong * 300000000L => i
      }
      assert(na == active.size.toLong, s"doc $id active count")
      if (active.nonEmpty) {
        assert(fa == active.min.toLong && la == active.max.toLong)
        assert(kept == (active.max - active.min + 1).toLong)
      } else assert(fa == -1L && la == -1L && kept == 0L)
    }
  }
}

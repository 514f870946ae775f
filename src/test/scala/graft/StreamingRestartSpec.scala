package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** Kill-and-restart contract of the foreachBatch sketch monitors
  * (EventsStream object doc): with a checkpointDir supplied, source
  * offsets AND the mergeable sketch state recover together, so a
  * monitor stopped mid-history and restarted emits exactly what an
  * uninterrupted run over the same rows emits. Uses the FILE stream
  * source (replayable across restarts, unlike MemoryStream): run 1
  * processes file A, dies; file B lands; run 2 (same checkpoint)
  * resumes from B on the reloaded state. Each assert compares the
  * restarted run's final emission against a fresh uninterrupted run —
  * a monitor that restarts with zeroed state covers only B and fails.
  */
class StreamingRestartSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  private def writeLongs(src: String, vals: Seq[Long]): Unit =
    vals.toDF("k").coalesce(1).write.mode("append").parquet(src)

  private def longStream(src: String): DataFrame =
    spark.readStream.schema("k LONG").parquet(src)

  // deterministic skewed key soup, split into a prefix (file A) and
  // suffix (file B) whose per-key counts differ from either half alone
  private val soup: Seq[Long] =
    Seq.fill(200)(1L) ++ Seq.fill(90)(2L) ++ (3L to 30L).flatMap(k => Seq.fill(5)(k))
  private val scrambled = soup.zipWithIndex
    .sortBy { case (k, i) => (k * 2654435761L + i * 40503L) % 104729 }.map(_._1)
  private val (partA, partB) = scrambled.splitAt(scrambled.size / 2)

  test("heavyHittersStream: restart resumes the merged summary (and a replayed batch is not double-merged)") {
    import EventsStream.HeavyHitter
    def lastOf(got: collection.mutable.ArrayBuffer[(Long, Seq[HeavyHitter])]) =
      got.synchronized { got.maxBy(_._1)._2 }
    // uninterrupted run over A+B
    val (srcU, ckptU) = (tmp("hh_src_u"), tmp("hh_ckpt_u"))
    writeLongs(srcU, partA); writeLongs(srcU, partB)
    val gotU = collection.mutable.ArrayBuffer.empty[(Long, Seq[HeavyHitter])]
    val qU = EventsStream.heavyHittersStream(longStream(srcU), "k", 64,
      (id, hh) => gotU.synchronized { gotU += id -> hh }, ckptU)
    qU.processAllAvailable(); qU.stop()
    // killed run: A, stop, simulate a crash BETWEEN state-persist and
    // batch-commit by deleting the last commit marker — restart must
    // replay that batch and the persisted lastId must skip re-merging
    val (src, ckpt) = (tmp("hh_src"), tmp("hh_ckpt"))
    writeLongs(src, partA)
    val got1 = collection.mutable.ArrayBuffer.empty[(Long, Seq[HeavyHitter])]
    val q1 = EventsStream.heavyHittersStream(longStream(src), "k", 64,
      (id, hh) => got1.synchronized { got1 += id -> hh }, ckpt)
    q1.processAllAvailable(); q1.stop()
    val lastCommit = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).maxBy(_.getName.toLong)
    // the local FS is checksum-backed: drop the shadow .crc too, or the
    // replayed commit's rename trips over it
    val crc = new java.io.File(lastCommit.getParent, s".${lastCommit.getName}.crc")
    assert(lastCommit.delete(), "could not remove the commit marker")
    if (crc.exists()) assert(crc.delete(), "could not remove the commit crc")
    writeLongs(src, partB)
    val got2 = collection.mutable.ArrayBuffer.empty[(Long, Seq[HeavyHitter])]
    val q2 = EventsStream.heavyHittersStream(longStream(src), "k", 64,
      (id, hh) => got2.synchronized { got2 += id -> hh }, ckpt)
    q2.processAllAvailable(); q2.stop()
    // capacity ≥ distinct keys → exact regime: a double-merge of the
    // replayed batch or a zeroed restart both break count equality
    val exact = soup.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(lastOf(got2).map(h => h.key -> h.count).toMap == exact)
    assert(lastOf(got2) == lastOf(gotU), "restarted != uninterrupted")
  }

  test("cmsStream: restart resumes the additive cell state") {
    val probes = Seq(1L, 2L, 13L, 999983L)
    def run(two: Boolean): Map[Long, Long] = {
      val (src, ckpt) = (tmp("cms_src"), tmp("cms_ckpt"))
      val got = collection.mutable.ArrayBuffer.empty[(Long, Map[Long, Long])]
      def start() = EventsStream.cmsStream(longStream(src), "k", probes, 32,
        (id, est) => got.synchronized { got += id -> est }, ckpt)
      if (two) {
        writeLongs(src, partA)
        val q1 = start(); q1.processAllAvailable(); q1.stop()
        writeLongs(src, partB)
        val q2 = start(); q2.processAllAvailable(); q2.stop()
      } else {
        writeLongs(src, partA); writeLongs(src, partB)
        val q = start(); q.processAllAvailable(); q.stop()
      }
      got.synchronized { got.maxBy(_._1)._2 }
    }
    val (restarted, uninterrupted) = (run(two = true), run(two = false))
    assert(restarted == uninterrupted, s"$restarted != $uninterrupted")
    val truth = soup.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .withDefaultValue(0L)
    probes.foreach(p => assert(restarted(p) >= truth(p), s"CMS underestimated $p"))
  }

  test("kllQuantileStream: restart resumes the compactor state (exact regime slicing-invariance survives the restart)") {
    import graft.functions.KllSummary
    val vals: Seq[Double] = (1 to 400).map(i => (i * 7919 % 211).toDouble)
    val (valsA, valsB) = vals.splitAt(vals.size / 2)
    def writeVals(src: String, vs: Seq[Double]): Unit =
      vs.toDF("v").coalesce(1).write.mode("append").parquet(src)
    def run(two: Boolean): KllSummary = {
      val (src, ckpt) = (tmp("kll_src"), tmp("kll_ckpt"))
      val got = collection.mutable.ArrayBuffer.empty[(Long, KllSummary)]
      def start() = EventsStream.kllQuantileStream(
        spark.readStream.schema("v DOUBLE").parquet(src), "v", 1024,
        (id, s) => got.synchronized { got += id -> s }, ckpt)
      if (two) {
        writeVals(src, valsA)
        val q1 = start(); q1.processAllAvailable(); q1.stop()
        writeVals(src, valsB)
        val q2 = start(); q2.processAllAvailable(); q2.stop()
      } else {
        writeVals(src, valsA); writeVals(src, valsB)
        val q = start(); q.processAllAvailable(); q.stop()
      }
      got.synchronized { got.maxBy(_._1)._2 }
    }
    val (restarted, uninterrupted) = (run(two = true), run(two = false))
    // k ≥ n → zero compactions: the summary IS the exact order-statistic
    // table, so restarted and uninterrupted runs must agree exactly
    assert(restarted.errBound == 0 && restarted == uninterrupted)
    assert(restarted.n == vals.size)
  }

  test("hllDistinctStream: restart resumes the register state bit-for-bit") {
    def run(two: Boolean): Long = {
      val (src, ckpt) = (tmp("hll_src"), tmp("hll_ckpt"))
      val got = collection.mutable.ArrayBuffer.empty[(Long, Long)]
      def start() = EventsStream.hllDistinctStream(longStream(src), "k", 64,
        (id, est) => got.synchronized { got += id -> est }, ckpt)
      if (two) {
        writeLongs(src, partA)
        val q1 = start(); q1.processAllAvailable(); q1.stop()
        writeLongs(src, partB)
        val q2 = start(); q2.processAllAvailable(); q2.stop()
      } else {
        writeLongs(src, partA); writeLongs(src, partB)
        val q = start(); q.processAllAvailable(); q.stop()
      }
      got.synchronized { got.maxBy(_._1)._2 }
    }
    assert(run(two = true) == run(two = false))
  }

  test("weightedSampleStream: restart resumes the A-Res top-k exactly") {
    def writeWeighted(src: String, ids: Seq[Long]): Unit =
      ids.map(i => (i, 1.0 + (i % 7).toDouble)).toDF("id", "w")
        .coalesce(1).write.mode("append").parquet(src)
    val ids = (1L to 500L).map(i => i * 6151 % 997)
    val (idsA, idsB) = ids.splitAt(ids.size / 2)
    def run(two: Boolean): Seq[(Long, Double)] = {
      val (src, ckpt) = (tmp("ws_src"), tmp("ws_ckpt"))
      val got = collection.mutable.ArrayBuffer.empty[(Long, Seq[(Long, Double)])]
      def start() = EventsStream.weightedSampleStream(
        spark.readStream.schema("id LONG, w DOUBLE").parquet(src), "id", "w", 50,
        (id, s) => got.synchronized { got += id -> s }, ckpt)
      if (two) {
        writeWeighted(src, idsA)
        val q1 = start(); q1.processAllAvailable(); q1.stop()
        writeWeighted(src, idsB)
        val q2 = start(); q2.processAllAvailable(); q2.stop()
      } else {
        writeWeighted(src, idsA); writeWeighted(src, idsB)
        val q = start(); q.processAllAvailable(); q.stop()
      }
      got.synchronized { got.maxBy(_._1)._2 }
    }
    assert(run(two = true) == run(two = false))
  }

  test("conformalStream: restart resumes the day-sum accumulator") {
    import EventsStream.{ConformalDay, ConformalFit}
    val fit = ConformalFit(slope = 3.0, icept = 100.0, qhat = 250.0)
    def ts(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"1992-01-${day + 1}%02d $h%02d:00:00")
    val rows = (0 until 12).flatMap(d => (0 until 4).map(h => (ts(d, h + 1), (d * 7 + h).toDouble)))
    val (rowsA, rowsB) = rows.splitAt(rows.size / 2)
    def writeRows(src: String, rs: Seq[(java.sql.Timestamp, Double)]): Unit =
      rs.toDF("ts", "value").coalesce(1).write.mode("append").parquet(src)
    def run(two: Boolean): Seq[ConformalDay] = {
      val (src, ckpt) = (tmp("conf_src"), tmp("conf_ckpt"))
      val got = collection.mutable.ArrayBuffer.empty[(Long, Seq[ConformalDay])]
      def start() = EventsStream.conformalStream(
        spark.readStream.schema("ts TIMESTAMP, value DOUBLE").parquet(src), fit,
        (id, days) => got.synchronized { got += id -> days }, ckpt)
      if (two) {
        writeRows(src, rowsA)
        val q1 = start(); q1.processAllAvailable(); q1.stop()
        writeRows(src, rowsB)
        val q2 = start(); q2.processAllAvailable(); q2.stop()
      } else {
        writeRows(src, rowsA); writeRows(src, rowsB)
        val q = start(); q.processAllAvailable(); q.stop()
      }
      got.synchronized { got.maxBy(_._1)._2 }
    }
    val (restarted, uninterrupted) = (run(two = true), run(two = false))
    assert(restarted == uninterrupted)
    assert(restarted.size == 12) // a zeroed restart would cover only B's days
  }

  // ---- MonitorState envelope contract (version / fingerprint / torn file) ----

  private def hc = spark.sparkContext.hadoopConfiguration

  test("MonitorState: a stale-version state file fails loud with the named remediation") {
    import graft.streaming.MonitorState
    val ckpt = tmp("ms_ver")
    // craft a file with the right magic but a future version
    val dir = new java.io.File(ckpt, "graft-monitor-state"); dir.mkdirs()
    val f = new java.io.File(dir, f"state-${3L}%020d")
    val raw = new java.io.FileOutputStream(f)
    val env = new java.io.DataOutputStream(raw)
    env.writeInt(0x474d5301); env.writeInt(MonitorState.Version + 1); env.writeUTF("")
    val out = new java.io.ObjectOutputStream(raw)
    out.writeObject(Map(1L -> 2L)); out.close()
    val e = intercept[IllegalStateException] {
      MonitorState.load[Map[Long, Long]](ckpt, hc)
    }
    assert(e.getMessage.contains(s"state version ${MonitorState.Version + 1}"))
    assert(e.getMessage.contains("FRESH checkpoint dir"), e.getMessage)
  }

  test("MonitorState: a pre-envelope (r16-format) state file fails loud, not with a bare stream error") {
    import graft.streaming.MonitorState
    val ckpt = tmp("ms_preenv")
    val dir = new java.io.File(ckpt, "graft-monitor-state"); dir.mkdirs()
    val f = new java.io.File(dir, f"state-${1L}%020d")
    val out = new java.io.ObjectOutputStream(new java.io.FileOutputStream(f))
    out.writeObject(Map(1L -> 2L)); out.close() // the old layout: object first
    val e = intercept[IllegalStateException] {
      MonitorState.load[Map[Long, Long]](ckpt, hc)
    }
    assert(e.getMessage.contains("pre-envelope"), e.getMessage)
  }

  test("MonitorState: a parameter-fingerprint mismatch refuses to reload (changed sketch params, same dir)") {
    import graft.streaming.MonitorState
    val ckpt = tmp("ms_fp")
    MonitorState.save(ckpt, hc, 1L, Map(7L -> 9L), fingerprint = "hll:m=64")
    assert(MonitorState.load[Map[Long, Long]](ckpt, hc, "hll:m=64").contains(1L -> Map(7L -> 9L)))
    val e = intercept[IllegalStateException] {
      MonitorState.load[Map[Long, Long]](ckpt, hc, "hll:m=128")
    }
    assert(e.getMessage.contains("hll:m=64") && e.getMessage.contains("hll:m=128"))
  }

  test("MonitorState: a torn newest file is deleted and the previous version recovered") {
    import graft.streaming.MonitorState
    val ckpt = tmp("ms_torn")
    MonitorState.save(ckpt, hc, 1L, Map(1L -> 10L))
    MonitorState.save(ckpt, hc, 2L, Map(1L -> 10L, 2L -> 20L))
    // tear the newest file the way a non-atomic object-store rename does:
    // truncate it mid-stream
    val dir = new java.io.File(ckpt, "graft-monitor-state")
    val newest = new java.io.File(dir, f"state-${2L}%020d")
    val bytes = java.nio.file.Files.readAllBytes(newest.toPath)
    java.nio.file.Files.write(newest.toPath, bytes.take(bytes.length / 2))
    val crc = new java.io.File(dir, f".state-${2L}%020d.crc")
    if (crc.exists()) crc.delete() // local FS checksum shadow
    val got = MonitorState.load[Map[Long, Long]](ckpt, hc)
    assert(got.contains(1L -> Map(1L -> 10L)), s"fallback failed: $got")
    assert(!newest.exists(), "the torn file should have been dropped")
  }

  test("restarting a monitor with changed parameters against the same checkpoint fails loud (no silent wrong estimates)") {
    val (src, ckpt) = (tmp("fp_src"), tmp("fp_ckpt"))
    writeLongs(src, partA)
    val got = collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q1 = EventsStream.hllDistinctStream(longStream(src), "k", 64,
      (id, est) => got.synchronized { got += id -> est }, ckpt)
    q1.processAllAvailable(); q1.stop()
    // same checkpoint dir, different m: deserializing 64 registers into a
    // 128-register monitor must refuse, not ArrayIndexOutOfBounds later
    val e = intercept[IllegalStateException] {
      EventsStream.hllDistinctStream(longStream(src), "k", 128, (_, _) => (), ckpt)
    }
    assert(e.getMessage.contains("hll:m=64") && e.getMessage.contains("hll:m=128"))
  }

  test("spcStream: restart resumes the day-sum accumulator under fixed limits") {
    import EventsStream.{SpcDay, SpcLimits}
    val limits = SpcLimits(n = 20, s1 = 20000.0, s2 = 2.1e7,
      xN = 20, xSx = BigInt(20000), xSmr = BigInt(1900), xNmr = 19)
    def ts(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"1992-02-${day + 1}%02d $h%02d:00:00")
    val rows = (0 until 10).flatMap(d => (0 until 3).map(h => (ts(d, h + 1), 3.0 + d + h)))
    val (rowsA, rowsB) = rows.splitAt(rows.size / 2)
    def writeRows(src: String, rs: Seq[(java.sql.Timestamp, Double)]): Unit =
      rs.toDF("ts", "value").coalesce(1).write.mode("append").parquet(src)
    def run(two: Boolean): Seq[SpcDay] = {
      val (src, ckpt) = (tmp("spc_src"), tmp("spc_ckpt"))
      val got = collection.mutable.ArrayBuffer.empty[(Long, Seq[SpcDay])]
      def start() = EventsStream.spcStream(
        spark.readStream.schema("ts TIMESTAMP, value DOUBLE").parquet(src), limits,
        (id, days) => got.synchronized { got += id -> days }, ckpt)
      if (two) {
        writeRows(src, rowsA)
        val q1 = start(); q1.processAllAvailable(); q1.stop()
        writeRows(src, rowsB)
        val q2 = start(); q2.processAllAvailable(); q2.stop()
      } else {
        writeRows(src, rowsA); writeRows(src, rowsB)
        val q = start(); q.processAllAvailable(); q.stop()
      }
      got.synchronized { got.maxBy(_._1)._2 }
    }
    val (restarted, uninterrupted) = (run(two = true), run(two = false))
    assert(restarted == uninterrupted)
    assert(restarted.size == 10)
  }

  // shared day-series feed for the r19 change-detector monitors: a
  // clear variance/level break at day 6 so argmax is meaningful
  private val breakRows: Seq[(java.sql.Timestamp, Double)] = {
    def ts(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"1992-03-${day + 1}%02d $h%02d:00:00")
    (0 until 12).flatMap { d =>
      val base = if (d < 6) 5.0 else 42.0
      (0 until 3).map(h => (ts(d, h + 1), base + h + (d % 3) * 0.5))
    }
  }

  private def writeTsRows(src: String, rs: Seq[(java.sql.Timestamp, Double)]): Unit =
    rs.toDF("ts", "value").coalesce(1).write.mode("append").parquet(src)

  test("snhtStream: restart resumes the day-cents accumulator (restarted == uninterrupted)") {
    import EventsStream.SnhtOut
    val (rowsA, rowsB) = breakRows.splitAt(breakRows.size / 2)
    def run(two: Boolean): SnhtOut = {
      val (src, ckpt) = (tmp("snht_src"), tmp("snht_ckpt"))
      val got = collection.mutable.ArrayBuffer.empty[SnhtOut]
      def start() = EventsStream.snhtStream(
        spark.readStream.schema("ts TIMESTAMP, value DOUBLE").parquet(src),
        o => got.synchronized { got += o }, ckpt)
      if (two) {
        writeTsRows(src, rowsA)
        val q1 = start(); q1.processAllAvailable(); q1.stop()
        writeTsRows(src, rowsB)
        val q2 = start(); q2.processAllAvailable(); q2.stop()
      } else {
        writeTsRows(src, rowsA); writeTsRows(src, rowsB)
        val q = start(); q.processAllAvailable(); q.stop()
      }
      got.synchronized { got.maxBy(_.batch_id) }
    }
    val (restarted, uninterrupted) = (run(two = true), run(two = false))
    assert((restarted.n, restarted.argmax_day, restarted.t_max) ==
      ((uninterrupted.n, uninterrupted.argmax_day, uninterrupted.t_max)),
      s"restarted $restarted != uninterrupted $uninterrupted")
    assert(restarted.n == 12)
    // the break lands where it was planted: last pre-break day (SNHT
    // argmax is the k maximizing the two-segment contrast)
    assert(restarted.argmax_day == uninterrupted.argmax_day)
  }

  test("cusumSqStream: restart resumes the day-cents accumulator (restarted == uninterrupted)") {
    import EventsStream.CusumSqOut
    val (rowsA, rowsB) = breakRows.splitAt(breakRows.size / 2)
    def run(two: Boolean): CusumSqOut = {
      val (src, ckpt) = (tmp("cusq_src"), tmp("cusq_ckpt"))
      val got = collection.mutable.ArrayBuffer.empty[CusumSqOut]
      def start() = EventsStream.cusumSqStream(
        spark.readStream.schema("ts TIMESTAMP, value DOUBLE").parquet(src),
        o => got.synchronized { got += o }, ckpt)
      if (two) {
        writeTsRows(src, rowsA)
        val q1 = start(); q1.processAllAvailable(); q1.stop()
        writeTsRows(src, rowsB)
        val q2 = start(); q2.processAllAvailable(); q2.stop()
      } else {
        writeTsRows(src, rowsA); writeTsRows(src, rowsB)
        val q = start(); q.processAllAvailable(); q.stop()
      }
      got.synchronized { got.maxBy(_.batch_id) }
    }
    val (restarted, uninterrupted) = (run(two = true), run(two = false))
    assert((restarted.n, restarted.argmax_day, restarted.cusum_sq_stat) ==
      ((uninterrupted.n, uninterrupted.argmax_day, uninterrupted.cusum_sq_stat)),
      s"restarted $restarted != uninterrupted $uninterrupted")
    assert(restarted.n == 12 && restarted.cusum_sq_stat > 0.0)
  }
}

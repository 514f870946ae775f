package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** Batch parity for the scene-cut streaming twin: the same decoded
  * frame rows, sliced across micro-batches mid-video, must emit
  * exactly the batch query's cut set — the boundary pair is
  * reconstructed across the batch seam from the one-frame state. */
class SceneCutStreamSpec extends SparkSpec {
  import spark.implicits._

  test("sceneCutStream: mid-video batch slicing reproduces mm_scene_cuts") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    val expected = SparkEntry.queries("mm_scene_cuts")(spark, sfDir)
      .select("doc_id", "cut_at", "prev_sum", "frame_sum")
      .as[(Long, Long, Long, Long)].collect().toSet
    // same synthesis → REAL AVI decode → frame rows, in driver order
    val md = java.security.MessageDigest.getInstance("MD5")
    val ids = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long")).as[Long].collect().sorted
    val frames = ids.flatMap { id =>
      val w = 2 + (id % 3).toInt; val h = 1 + (id % 2).toInt
      val nf = 6 + (id % 4).toInt
      val raw = Array.tabulate(nf) { f =>
        Array.tabulate(3 * w * h) { p =>
          md.digest(s"sc:$id:${f / 3}:$p".getBytes("UTF-8"))(0)
        }
      }
      // frame totals as the upstream row-local decode would emit them
      // (aviFrameSumsBatch over encodeAvi equals the raw byte total —
      // pinned by MultimodalR11Spec; here the stream consumes the rows)
      (0 until nf).map { f =>
        val sum = raw(f).map(_ & 0xFF).map(_.toLong).sum
        EventsStream.FrameRow(id, f, sum)
      }
    }
    // slice per-video sequences across batch boundaries (ordered within
    // each video — the ingest contract — but seams land mid-video)
    val slices = frames.grouped(frames.length / 5 + 1).toSeq
    val in = MemoryStream[EventsStream.FrameRow]
    val q = EventsStream.sceneCutStream(in.toDS())
      .writeStream.outputMode("append").format("memory").queryName("cuts").start()
    slices.foreach { sl => in.addData(sl.toSeq); q.processAllAvailable() }
    q.stop()
    val got = spark.table("cuts")
      .select("doc_id", "cut_at", "prev_sum", "frame_sum")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected, "stream cut set must equal the batch detector")
    assert(got.nonEmpty)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.multimodal.BinaryColumns

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("payload + metadata struct carries bytes columnar") {
    val df = Seq((1L, "hello"), (2L, "")).toDF("doc_id", "text")
    val p = BinaryColumns.withPayload(df, "text", "doc_id").orderBy("doc_id")
    val r = p.select($"doc_id", $"meta.byte_len", $"meta.media_type").as[(Long, Int, String)].collect()
    assert(r.toSeq == Seq((1L, 5, "text/plain"), (2L, 0, "text/plain")))
  }

  test("frameSample chops payloads into strided fixed-size frames") {
    implicit val ss = spark
    val df = Seq((1L, "a" * 40)).toDF("doc_id", "text")
    val frames = BinaryColumns.frameSample(
      BinaryColumns.withPayload(df, "text", "doc_id"), frameSize = 16, stride = 2)
    val rows = frames.select("frame_no", "frame_len").as[(Int, Int)].collect().toSet
    // 40 bytes -> chunks of 16,16,8 at indexes 0,1,2; stride 2 keeps 0 and 2
    assert(rows == Set((0, 16), (2, 8)))
  }

  test("featureExtractStub emits unit vectors that feed the similarity operators") {
    implicit val ss = spark
    val df = Seq((1L, "hello world"), (2L, "hello world"), (3L, "entirely different"))
      .toDF("doc_id", "text")
    val emb = BinaryColumns.featureExtractStub(
      BinaryColumns.withPayload(df, "text", "doc_id"), dim = 16)
    val rows = emb.orderBy("doc_id").as[(Long, Seq[Float])].collect()
    assert(rows.forall(_._2.length == 16))
    assert(rows(0)._2 == rows(1)._2) // deterministic: same bytes → same vector
    val norm = math.sqrt(rows(0)._2.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // plumbing compatibility: the output schema drives the ANN baseline as-is
    val top = graft.similarity.VectorOps.bruteForceTopK(
      emb, emb.filter($"doc_id" === 1), k = 1, idCol = "doc_id", vecCol = "embedding")
    val best = top.select("neighbor_id").as[Long].head()
    assert(best == 2L) // the byte-identical doc is the nearest neighbor
  }

  test("resizeStub pads or truncates payloads and records both sizes") {
    implicit val ss = spark
    val df = Seq((1L, "abcdef"), (2L, "ab")).toDF("doc_id", "text")
    val r = BinaryColumns.resizeStub(
      BinaryColumns.withPayload(df, "text", "doc_id"), targetBytes = 4)
      .orderBy("doc_id")
      .select("doc_id", "orig_bytes", "resized_bytes")
      .as[(Long, Int, Int)].collect()
    assert(r.toSeq == Seq((1L, 6, 4), (2L, 2, 4)))
  }

  test("BMP encode/decode round-trips exact channel sums at every stride padding") {
    // w 1..5 covers row paddings 1,2,0,3,1; h varies row count
    for (w <- 1 to 5; h <- 1 to 3) {
      val rgb = Array.tabulate(3 * w * h)(i => ((i * 37 + 11) % 256).toByte)
      val bmp = BinaryColumns.encodeBmp(w, h, rgb)
      val st = BinaryColumns.decodeBmp(7L, bmp)
      assert((st.width, st.height, st.bpp, st.n_px) == (w, h, 24, w.toLong * h))
      assert(st.file_bytes == bmp.length.toLong)
      def sum(ch: Int) = rgb.indices.filter(_ % 3 == ch).map(i => (rgb(i) & 0xFF).toLong).sum
      assert((st.sum_r, st.sum_g, st.sum_b) == (sum(0), sum(1), sum(2)),
        s"channel sums diverged at ${w}x$h")
    }
  }

  test("WAV encode/decode round-trips exact sample stats and survives chunk walking") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 2, 33, 48); rate <- Seq(8000, 44100)) {
      val samples = Array.fill(n)(rnd.nextInt(65536).toShort)
      val wav = BinaryColumns.encodeWav(rate, samples)
      assert(wav.length == 44 + 2 * n)
      val st = BinaryColumns.decodeWav(9L, wav)
      val ints = samples.map(_.toInt)
      assert(st.n_samples == n && st.sample_rate == rate)
      assert(st.duration_us == n.toLong * 1000000L / rate)
      assert(st.sum_abs == ints.map(v => math.abs(v).toLong).sum)
      assert(st.max_abs == ints.map(v => math.abs(v).toLong).max)
      assert(st.sum_v == ints.map(_.toLong).sum)
      assert(st.zero_cross ==
        ints.sliding(2).count(p => p.length == 2 && p(0) * p(1) < 0))
      assert(st.file_bytes == wav.length)
    }
    // the parser walks chunks, it does not assume fixed offsets:
    // splice an unknown odd-sized chunk (padded to even) before data
    val base = BinaryColumns.encodeWav(8000, Array[Short](100, -100, 50))
    val extra = java.nio.ByteBuffer.allocate(8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(3).put(Array[Byte](1, 2, 3, 0))
    val spliced = base.take(36) ++ extra.array() ++ base.drop(36)
    java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val st2 = BinaryColumns.decodeWav(10L, spliced)
    assert(st2.n_samples == 3 && st2.zero_cross == 2 && st2.sum_v == 50L)
  }

  test("windowed WAV decode partitions the stream and reassembles to whole-file stats") {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(1, 15, 16, 17, 48, 49)) {
      val samples = Array.fill(n)(rnd.nextInt(65536).toShort)
      val wav = BinaryColumns.encodeWav(8000, samples)
      val wins = BinaryColumns.decodeWavWindows(3L, wav, win = 16)
      val ints = samples.map(_.toInt)
      // geometry: ceil(n/16) windows, ids contiguous, sizes sum to n
      assert(wins.length == (n + 15) / 16)
      assert(wins.map(_.win_id) == wins.indices.toSeq)
      assert(wins.map(_.n_in_win).sum == n)
      // reassembly: windowed sums fold back to the whole-file decode
      val whole = BinaryColumns.decodeWav(3L, wav)
      assert(wins.map(_.sum_v).sum == whole.sum_v)
      assert(wins.map(_.max_abs).max == whole.max_abs)
      assert(wins.map(_.sum_sq).sum ==
        ints.map(v => v.toLong * v).sum)
      // within-window zero crossings never exceed the whole-file count
      // (boundary-pair crossings are excluded by construction)
      assert(wins.map(_.zero_cross).sum <= whole.zero_cross)
      val boundaryCrossings = (16 until n by 16)
        .count(i => ints(i - 1) * ints(i) < 0)
      assert(wins.map(_.zero_cross).sum + boundaryCrossings == whole.zero_cross)
    }
  }

  test("AVI encode/decode round-trips exact frame stats at every stride padding") {
    val rnd = new scala.util.Random(11)
    for (w <- 1 to 5; h <- Seq(1, 3); nf <- Seq(1, 4)) {
      val frames = Array.fill(nf)(Array.fill(3 * w * h)(rnd.nextInt(256).toByte))
      val avi = BinaryColumns.encodeAvi(w, h, 40000, frames)
      val st = BinaryColumns.decodeAvi(5L, avi)
      assert(st.n_frames == nf && st.width == w && st.height == h)
      assert(st.us_per_frame == 40000L && st.file_bytes == avi.length)
      def chan(c: Int) = frames.flatMap(_.indices.filter(_ % 3 == c).map(i => 0L))
      def sum(c: Int) = frames.map(fr =>
        fr.indices.filter(_ % 3 == c).map(i => (fr(i) & 0xFF).toLong).sum).sum
      assert((st.sum_r, st.sum_g, st.sum_b) == (sum(0), sum(1), sum(2)),
        s"channel sums diverged at ${w}x$h x$nf")
      val wsum = frames.zipWithIndex.map { case (fr, f) =>
        (f + 1).toLong * fr.map(b => (b & 0xFF).toLong).sum }.sum
      assert(st.wsum == wsum, s"order-weighted sum diverged at ${w}x$h x$nf")
    }
    // frame ORDER is pinned: swapping two distinct frames must change wsum
    val fa = Array.fill(3)(10: Byte); val fb = Array.fill(3)(20: Byte)
    val s1 = BinaryColumns.decodeAvi(6L, BinaryColumns.encodeAvi(1, 1, 1, Array(fa, fb)))
    val s2 = BinaryColumns.decodeAvi(6L, BinaryColumns.encodeAvi(1, 1, 1, Array(fb, fa)))
    assert(s1.sum_r == s2.sum_r && s1.wsum != s2.wsum)
  }

  test("decodeAvi rejects non-AVI payloads") {
    intercept[IllegalArgumentException] {
      BinaryColumns.decodeAvi(1L, "RIFFxxxxWAVEnot a movie container".getBytes)
    }
  }

  test("decodeWav rejects non-WAV and unsupported payloads") {
    intercept[IllegalArgumentException] {
      BinaryColumns.decodeWav(1L, "definitely not RIFF audio content ....".getBytes)
    }
    // valid container, stereo: flip the channel-count field to 2
    val wav = BinaryColumns.encodeWav(8000, Array[Short](1, 2, 3))
    wav(22) = 2
    intercept[IllegalArgumentException] { BinaryColumns.decodeWav(2L, wav) }
  }

  test("decodeBmp rejects non-BMP and unsupported payloads") {
    implicit val ss = spark
    intercept[IllegalArgumentException] {
      BinaryColumns.decodeBmp(1L, "not a bitmap at all, just text".getBytes)
    }
    // valid header, wrong bpp: flip the bit-count field to 8
    val bmp = BinaryColumns.encodeBmp(2, 2, Array.fill(12)(3: Byte))
    bmp(28) = 8
    intercept[IllegalArgumentException] { BinaryColumns.decodeBmp(2L, bmp) }
  }

  test("decode stub runs per-partition and matches metadata") {
    implicit val ss = spark
    val df = Seq((1L, "hello"), (2L, "x")).toDF("doc_id", "text")
    val out = BinaryColumns.decodedFrame(df, "text", "doc_id").orderBy("doc_id")
    val rows = out.select("doc_id", "byte_len", "n_bytes", "head_byte", "decoder")
      .as[(Long, Long, Long, Int, String)].collect()
    assert(rows.toSeq == Seq((1L, 5L, 5L, 'h'.toInt, "stub-v1"), (2L, 1L, 1L, 'x'.toInt, "stub-v1")))
    // sha256 of the payload equals sha256 of the text bytes
    val sha = out.filter($"doc_id" === 1).select("sha256").as[String].head()
    assert(sha == java.security.MessageDigest.getInstance("SHA-256")
      .digest("hello".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }
}

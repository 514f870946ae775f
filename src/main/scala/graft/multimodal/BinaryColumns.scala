package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, and a per-partition batch "decode" stage.
  *
  * The decode itself is STUBBED (no image/audio codecs in this
  * environment — `decodeBatch` computes deterministic byte-level
  * features instead), but the Spark-side shape is the real one:
  * payload bytes + metadata struct travel columnar; decode runs via
  * `mapPartitions` so a real decoder would amortize model/codec init
  * per partition (exactly how Pandas-UDF/mapInPandas batches behave);
  * results re-join the frame on id. Partitioning and schema are what
  * a 100 TB media pipeline would use — only the codec call is fake.
  */
object BinaryColumns {

  /** Decoded-feature record produced by the stub decoder. */
  final case class DecodedMeta(doc_id: Long, n_bytes: Long, head_byte: Int, decoder: String)

  /** Attach an opaque binary payload + metadata struct for a text
    * column (stand-in for image/audio bytes in the testdata). */
  def withPayload(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("media_type"),
        octet_length(encode(col(textCol), "UTF-8")).as("byte_len"),
        sha2(encode(col(textCol), "UTF-8"), 256).as("sha256")).as("meta"))

  /** STUB decoder: where a real pipeline would decode image/audio bytes
    * (per-partition batch, codec initialized once per partition), this
    * computes deterministic byte features. The `???`-shaped seam is
    * `decodeOne`. */
  def decodeStub(payloads: DataFrame)(implicit spark: SparkSession): Dataset[DecodedMeta] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real pipeline: val codec = Codec.open()  (once per partition)
        it.map { case (id, bytes) => decodeOne(id, bytes) }
      }
  }

  /** The seam a real decoder would fill; deterministic fake features. */
  private def decodeOne(id: Long, bytes: Array[Byte]): DecodedMeta =
    DecodedMeta(id, bytes.length.toLong,
      if (bytes.isEmpty) -1 else bytes(0) & 0xFF, "stub-v1")

  /** Frame-sampling shape for video/audio payloads: chop the byte
    * stream into fixed `frameSize` chunks and keep every `stride`-th
    * one — the Spark-side plumbing (explode to a frames table keyed by
    * (doc_id, frame_no)) is real; the chunking stands in for codec
    * frame extraction. */
  def frameSample(payloads: DataFrame, frameSize: Int = 16, stride: Int = 4)
                 (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        bytes.grouped(frameSize).zipWithIndex
          .filter { case (_, i) => i % stride == 0 }
          .map { case (frame, i) => (id, i, frame.length, frame) }
      }
      .toDF("doc_id", "frame_no", "frame_len", "frame_bytes")
  }

  /** STUB feature extractor: bytes → fixed-dim float vector. A real
    * pipeline runs an image/audio encoder per partition batch here
    * (model loaded once per partition, exactly this mapPartitions
    * shape — the Scala analogue of mapInPandas); the stub derives a
    * deterministic pseudo-embedding from rolling byte hashes so the
    * OUTPUT SCHEMA (`array<float>`, unit-normalized) and partition
    * behavior are the real thing and can feed the similarity operators
    * directly. */
  def featureExtractStub(payloads: DataFrame, dim: Int = 64)
                        (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real pipeline: val model = Encoder.load()  (once per partition)
        it.map { case (id, bytes) =>
          val v = new Array[Float](dim)
          var h = 1125899906842597L // deterministic seed
          var i = 0
          while (i < bytes.length) {
            h = h * 31 + (bytes(i) & 0xFF)
            v(i % dim) += ((h >>> 16) & 0xFFFF) / 65536.0f - 0.5f
            i += 1
          }
          val n = math.sqrt(v.map(x => x.toDouble * x).sum)
          (id, if (n == 0.0) v.toSeq else v.map(x => (x / n).toFloat).toSeq)
        }
      }
      .toDF("doc_id", "embedding")
  }

  /** STUB resize: pad-or-truncate the payload to `targetBytes` (a real
    * pipeline decodes, resizes pixels, re-encodes); metadata records
    * both sizes so downstream stages can audit the transform. */
  def resizeStub(payloads: DataFrame, targetBytes: Int)
                (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val out = java.util.Arrays.copyOf(bytes, targetBytes)
        (id, out, bytes.length, targetBytes)
      }
      .toDF("doc_id", "payload", "orig_bytes", "resized_bytes")
  }

  /** Decoded-image record produced by the REAL [[decodeBmp]] parser:
    * header geometry plus exact per-channel pixel sums (integers — no
    * float wobble, so the fields sit under the full hash oracle). */
  final case class BmpStats(doc_id: Long, width: Int, height: Int, bpp: Int,
                            n_px: Long, sum_r: Long, sum_g: Long, sum_b: Long,
                            file_bytes: Long)

  /** REAL 24-bit BMP encoder: BITMAPFILEHEADER + BITMAPINFOHEADER +
    * bottom-up rows of BGR pixels, each row zero-padded to a 4-byte
    * boundary — the actual on-disk format, not a fake container.
    * `rgb` is top-down row-major R,G,B triples (3·w·h bytes). */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * width * height,
      s"need ${3 * width * height} RGB bytes, got ${rgb.length}")
    val stride = (3 * width + 3) / 4 * 4
    val dataSize = stride * height
    val fileSize = 54 + dataSize
    val out = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(fileSize)
      .putShort(0).putShort(0).putInt(54)                  // data offset
    out.putInt(40).putInt(width).putInt(height)            // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1                                     // bottom-up rows
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val p = 3 * (y * width + x)
        out.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p))    // BGR on disk
        x += 1
      }
      var pad = stride - 3 * width
      while (pad > 0) { out.put(0: Byte); pad -= 1 }
      y -= 1
    }
    out.array()
  }

  /** REAL 24-bit BMP decoder: validates the 'BM' signature, reads the
    * little-endian headers (data offset, geometry, bpp, compression),
    * walks the bottom-up padded rows and accumulates exact per-channel
    * sums in top-down RGB terms. Throws on anything it does not
    * support — a decoder that silently mis-parses would be worse than
    * the stub it replaces. */
  def decodeBmp(id: Long, bytes: Array[Byte]): BmpStats = {
    val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && in.get(0) == 'B' && in.get(1) == 'M',
      s"doc $id: not a BMP payload")
    val fileSize = in.getInt(2)
    val dataOff = in.getInt(10)
    val width = in.getInt(18)
    val height = in.getInt(22)
    val bpp = in.getShort(28).toInt
    val compression = in.getInt(30)
    require(bpp == 24 && compression == 0,
      s"doc $id: only uncompressed 24-bit BMP supported, got bpp=$bpp compression=$compression")
    require(width > 0 && height > 0, s"doc $id: unsupported geometry ${width}x$height")
    val stride = (3 * width + 3) / 4 * 4
    require(bytes.length >= dataOff + stride * height,
      s"doc $id: truncated pixel data")
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var y = 0
    while (y < height) {
      val rowOff = dataOff + (height - 1 - y) * stride    // un-flip bottom-up
      var x = 0
      while (x < width) {
        val o = rowOff + 3 * x
        sumB += bytes(o) & 0xFF                           // BGR on disk
        sumG += bytes(o + 1) & 0xFF
        sumR += bytes(o + 2) & 0xFF
        x += 1
      }
      y += 1
    }
    BmpStats(id, width, height, bpp, width.toLong * height,
      sumR, sumG, sumB, fileSize.toLong)
  }

  /** REAL decode to top-down RGB pixel bytes — the [[decodeBmp]] walk
    * returning the pixels instead of their sums (same validation, same
    * bottom-up un-flip, same BGR→RGB swap). Feeds perceptual hashing,
    * where the downstream consumer needs the raster, not statistics. */
  def decodeBmpPixels(id: Long, bytes: Array[Byte]): Array[Byte] = {
    val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && in.get(0) == 'B' && in.get(1) == 'M',
      s"doc $id: not a BMP payload")
    val dataOff = in.getInt(10)
    val width = in.getInt(18)
    val height = in.getInt(22)
    val bpp = in.getShort(28).toInt
    val compression = in.getInt(30)
    require(bpp == 24 && compression == 0,
      s"doc $id: only uncompressed 24-bit BMP supported, got bpp=$bpp compression=$compression")
    require(width > 0 && height > 0, s"doc $id: unsupported geometry ${width}x$height")
    val stride = (3 * width + 3) / 4 * 4
    // Bounds check in Long: a crafted header with huge width/height (or a
    // negative dataOff) overflows the Int product, letting the truncation
    // require pass and the pixel loop throw AIOOBE instead of this message.
    require(dataOff >= 54 &&
        bytes.length.toLong >= dataOff.toLong + stride.toLong * height.toLong,
      s"doc $id: truncated pixel data")
    require(3L * width * height <= Int.MaxValue,
      s"doc $id: raster too large ${width}x$height")
    val out = new Array[Byte](3 * width * height)
    var y = 0
    while (y < height) {
      val rowOff = dataOff + (height - 1 - y) * stride
      var x = 0
      while (x < width) {
        val o = rowOff + 3 * x; val p = 3 * (y * width + x)
        out(p) = bytes(o + 2)      // R (BGR on disk)
        out(p + 1) = bytes(o + 1)  // G
        out(p + 2) = bytes(o)      // B
        x += 1
      }
      y += 1
    }
    out
  }

  /** Per-partition batch decode of BMP payloads — the same
    * mapPartitions seam as [[decodeStub]], now running a real parser
    * (codec state would init once per partition in the iterator
    * wrapper). */
  def decodeBmpBatch(payloads: DataFrame)(implicit spark: SparkSession): Dataset[BmpStats] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decodeBmp(id, bytes) } }
  }

  /** Per-tile record from a REAL raster decode ([[decodeBmpPixels]]):
    * 2×2 tile grid, exact integer brightness sums — the thumbnail /
    * region-features shape (every field integer → full hash oracle). */
  final case class BmpTile(doc_id: Long, tile: Int, n_px: Long, sum_rgb: Long)

  /** Decode each BMP payload with the raster decoder and emit 2×2 tile
    * brightness sums: tile = (2y div h)·2 + (2x div w), brightness =
    * r+g+b per pixel (unsigned). The per-partition batch-decode shape
    * of [[decodeBmpBatch]], emitting 4 rows per document. */
  def bmpTileBatch(payloads: DataFrame)(implicit spark: SparkSession): Dataset[BmpTile] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val w = in.getInt(18); val h = in.getInt(22)
          val px = decodeBmpPixels(id, bytes)
          val nPx = new Array[Long](4)
          val sum = new Array[Long](4)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val t = (2 * y / h) * 2 + (2 * x / w)
              val o = 3 * (y * w + x)
              sum(t) += (px(o) & 0xFF) + (px(o + 1) & 0xFF) + (px(o + 2) & 0xFF)
              nPx(t) += 1
              x += 1
            }
            y += 1
          }
          (0 until 4).map(t => BmpTile(id, t, nPx(t), sum(t)))
        }
      }
  }

  /** Per-luminance-bin record from a REAL raster decode: 8 bins over
    * lum = r+g+b ∈ [0, 765], bin = lum div 96 — exact integers, full
    * hash oracle. */
  final case class BmpHistBin(doc_id: Long, bin: Int, n_px: Long, sum_lum: Long)

  /** Decode each BMP payload with the raster decoder and emit its
    * 8-bin luminance histogram (the exposure/contrast profile an image
    * curation pipeline screens on before any model-based scoring).
    * Same per-partition batch shape as [[bmpTileBatch]]; all-zero bins
    * are emitted too (fixed 8 rows per document — schema-stable). */
  def bmpHistogramBatch(payloads: DataFrame)(implicit spark: SparkSession): Dataset[BmpHistBin] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val px = decodeBmpPixels(id, bytes)
          val nPx = new Array[Long](8)
          val sum = new Array[Long](8)
          var i = 0
          while (i < px.length) {
            val lum = (px(i) & 0xFF) + (px(i + 1) & 0xFF) + (px(i + 2) & 0xFF)
            val b = lum / 96
            nPx(b) += 1
            sum(b) += lum
            i += 3
          }
          (0 until 8).map(b => BmpHistBin(id, b, nPx(b), sum(b)))
        }
      }
  }

  /** Per-frame record from the REAL [[decodeAvi]] walker: 0-based
    * frame index + exact integer r+g+b total — the unit the
    * scene-cut detector diffs. */
  final case class AviFrame(doc_id: Long, frame_idx: Int, frame_sum: Long)

  /** Decode each AVI payload and emit one row per movi 00db frame with
    * its exact pixel-brightness total, in container order — the
    * per-frame refinement of [[decodeAviBatch]]'s aggregates. */
  def aviFrameSumsBatch(payloads: DataFrame)(implicit spark: SparkSession): Dataset[AviFrame] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
          require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI ",
            s"doc $id: not an AVI payload")
          var off = 12
          var moviOff = -1; var moviEnd = -1
          while (off + 8 <= bytes.length && moviOff < 0) {
            val sz = in.getInt(off + 4)
            if (tag(off) == "LIST" && off + 12 <= bytes.length && tag(off + 8) == "movi") {
              moviOff = off + 12; moviEnd = off + 8 + sz
            }
            off += 8 + sz + (sz & 1)
          }
          require(moviOff >= 0, s"doc $id: missing movi list")
          val frames = scala.collection.mutable.ArrayBuffer.empty[AviFrame]
          var f = moviOff
          while (f + 8 <= moviEnd) {
            val sz = in.getInt(f + 4)
            if (tag(f) == "00db") {
              var total = 0L
              var i = 0
              while (i < sz) { total += bytes(f + 8 + i) & 0xFF; i += 1 }
              // stride padding bytes are zero by construction of
              // encodeAvi, so the raw-chunk total IS the pixel total
              frames += AviFrame(id, frames.length, total)
            }
            f += 8 + sz + (sz & 1)
          }
          frames
        }
      }
  }

  /** REAL per-frame pixel decode: walk the movi LIST and return each
    * 00db frame's RGB bytes row-major top-down (un-flips the bottom-up
    * DIB rows, strips stride padding, un-swaps the on-disk BGR) — the
    * frame-level twin of [[decodeBmpPixels]] for content-addressed
    * video work (perceptual hashing, per-frame features). */
  def decodeAviFrames(id: Long, bytes: Array[Byte]): Array[Array[Byte]] = {
    val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI ",
      s"doc $id: not an AVI payload")
    var off = 12
    var hdrlOff = -1; var moviOff = -1; var moviEnd = -1
    while (off + 8 <= bytes.length && (hdrlOff < 0 || moviOff < 0)) {
      val sz = in.getInt(off + 4)
      if (tag(off) == "LIST" && off + 12 <= bytes.length) tag(off + 8) match {
        case "hdrl" => hdrlOff = off + 12
        case "movi" => moviOff = off + 12; moviEnd = off + 8 + sz
        case _ => ()
      }
      off += 8 + sz + (sz & 1)
    }
    require(hdrlOff >= 0 && moviOff >= 0, s"doc $id: missing hdrl/movi list")
    val width = in.getInt(hdrlOff + 8 + 32)
    val height = in.getInt(hdrlOff + 8 + 36)
    require(width > 0 && height > 0, s"doc $id: unsupported geometry ${width}x$height")
    val stride = (3 * width + 3) / 4 * 4
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var f = moviOff
    while (f + 8 <= moviEnd) {
      val sz = in.getInt(f + 4)
      if (tag(f) == "00db") {
        require(sz == stride * height, s"doc $id: frame size $sz != ${stride * height}")
        val rgb = new Array[Byte](3 * width * height)
        var y = 0
        while (y < height) {
          val rowOff = f + 8 + (height - 1 - y) * stride
          var x = 0
          while (x < width) {
            val o = rowOff + 3 * x
            val d = 3 * (y * width + x)
            rgb(d) = bytes(o + 2); rgb(d + 1) = bytes(o + 1); rgb(d + 2) = bytes(o)
            x += 1
          }
          y += 1
        }
        frames += rgb
      }
      f += 8 + sz + (sz & 1)
    }
    frames.toArray
  }

  /** Decoded-audio record produced by the REAL [[decodeWav]] parser:
    * format fields plus exact integer sample statistics (abs/sum/max,
    * strict sign-change zero crossings) — no float wobble, so every
    * field sits under the full hash oracle. */
  final case class WavStats(doc_id: Long, n_samples: Long, sample_rate: Int,
                            duration_us: Long, sum_abs: Long, max_abs: Long,
                            sum_v: Long, zero_cross: Long, file_bytes: Long)

  /** REAL PCM WAV encoder: RIFF/WAVE container with a 16-byte `fmt `
    * chunk (PCM, mono, 16-bit little-endian) and a `data` chunk of
    * LE int16 samples — the actual on-disk format. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = 2 * samples.length
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                            // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)          // byte rate
      .putShort(2).putShort(16)                           // block align, bps
    out.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(out.putShort)
    out.array()
  }

  /** REAL WAV decoder: validates RIFF/WAVE, WALKS the chunk list
    * (tolerating unknown chunks and odd-size padding per spec) to find
    * `fmt ` and `data`, requires PCM/mono/16-bit, then accumulates
    * exact integer sample stats. duration_us is exact integer
    * microseconds (n·10⁶ / rate, truncating). Throws on anything it
    * does not support. */
  def decodeWav(id: Long, bytes: Array[Byte]): WavStats = {
    val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
      s"doc $id: not a WAV payload")
    var off = 12
    var fmtOff = -1; var dataOff = -1; var dataSize = -1
    while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val sz = in.getInt(off + 4)
      tag(off) match {
        case "fmt " => fmtOff = off + 8
        case "data" => dataOff = off + 8; dataSize = sz
        case _ => ()
      }
      off += 8 + sz + (sz & 1)                            // chunks pad to even
    }
    require(fmtOff >= 0 && dataOff >= 0, s"doc $id: missing fmt/data chunk")
    val audioFormat = in.getShort(fmtOff).toInt
    val channels = in.getShort(fmtOff + 2).toInt
    val rate = in.getInt(fmtOff + 4)
    val bps = in.getShort(fmtOff + 14).toInt
    require(audioFormat == 1 && channels == 1 && bps == 16,
      s"doc $id: only PCM mono 16-bit supported, got fmt=$audioFormat ch=$channels bps=$bps")
    require(bytes.length >= dataOff + dataSize, s"doc $id: truncated sample data")
    val n = dataSize / 2
    var sumAbs = 0L; var maxAbs = 0L; var sum = 0L; var zc = 0L
    var prev = 0; var i = 0
    while (i < n) {
      val v = in.getShort(dataOff + 2 * i).toInt
      val a = math.abs(v).toLong
      sumAbs += a; sum += v
      if (a > maxAbs) maxAbs = a
      if (i > 0 && prev * v < 0) zc += 1                  // strict sign change
      prev = v; i += 1
    }
    WavStats(id, n.toLong, rate, n.toLong * 1000000L / rate,
      sumAbs, maxAbs, sum, zc, bytes.length.toLong)
  }

  /** Per-partition batch decode of WAV payloads — the same
    * mapPartitions seam as [[decodeBmpBatch]]. */
  def decodeWavBatch(payloads: DataFrame)(implicit spark: SparkSession): Dataset[WavStats] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decodeWav(id, bytes) } }
  }

  /** One fixed-width analysis window of a decoded PCM stream: exact
    * integer energy (Σv²), peak, DC sum, and strict sign-change zero
    * crossings counted WITHIN the window (both samples inside), so
    * windows are independent and re-derivable from sample indices
    * alone. */
  final case class WavWindow(doc_id: Long, win_id: Int, n_in_win: Long,
                             sum_sq: Long, max_abs: Long, sum_v: Long,
                             zero_cross: Long)

  /** REAL WAV decode → fixed-width windowed features (the frame-level
    * feature extraction an audio training pipeline runs before VAD /
    * silence trimming): same container walk as [[decodeWav]], then the
    * sample stream splits into `win`-sample windows each accumulating
    * exact integer features. int16² ≤ 2³⁰ so a window's energy sum is
    * far inside BIGINT at any window size that fits memory. */
  def decodeWavWindows(id: Long, bytes: Array[Byte], win: Int): Seq[WavWindow] = {
    val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
      s"doc $id: not a WAV payload")
    var off = 12
    var fmtOff = -1; var dataOff = -1; var dataSize = -1
    while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
      val sz = in.getInt(off + 4)
      tag(off) match {
        case "fmt " => fmtOff = off + 8
        case "data" => dataOff = off + 8; dataSize = sz
        case _ => ()
      }
      off += 8 + sz + (sz & 1)
    }
    require(fmtOff >= 0 && dataOff >= 0, s"doc $id: missing fmt/data chunk")
    require(in.getShort(fmtOff).toInt == 1 && in.getShort(fmtOff + 2).toInt == 1 &&
      in.getShort(fmtOff + 14).toInt == 16, s"doc $id: only PCM mono 16-bit supported")
    require(bytes.length >= dataOff + dataSize, s"doc $id: truncated sample data")
    val n = dataSize / 2
    val out = scala.collection.mutable.ArrayBuffer.empty[WavWindow]
    var base = 0
    while (base < n) {
      val end = math.min(base + win, n)
      var sumSq = 0L; var maxAbs = 0L; var sumV = 0L; var zc = 0L
      var prev = 0; var i = base
      while (i < end) {
        val v = in.getShort(dataOff + 2 * i).toInt
        sumSq += v.toLong * v; sumV += v
        val a = math.abs(v).toLong; if (a > maxAbs) maxAbs = a
        if (i > base && prev * v < 0) zc += 1
        prev = v; i += 1
      }
      out += WavWindow(id, base / win, (end - base).toLong, sumSq, maxAbs, sumV, zc)
      base += win
    }
    out.toSeq
  }

  /** Per-partition batch windowed decode — flatMap over the same
    * mapPartitions seam as [[decodeWavBatch]]. */
  def decodeWavWindowsBatch(payloads: DataFrame, win: Int)(
      implicit spark: SparkSession): Dataset[WavWindow] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it => it.flatMap { case (id, bytes) => decodeWavWindows(id, bytes, win) } }
  }

  /** Decoded-video record produced by the REAL [[decodeAvi]] parser:
    * container geometry plus exact integer pixel statistics across all
    * frames. `wsum` weights each frame's pixel total by (index+1), so
    * a frame-order mis-parse breaks the hash even when per-frame
    * content is identical-up-to-permutation. */
  final case class AviStats(doc_id: Long, n_frames: Long, width: Int, height: Int,
                            us_per_frame: Long, n_px_total: Long,
                            sum_r: Long, sum_g: Long, sum_b: Long,
                            wsum: Long, file_bytes: Long)

  /** REAL minimal AVI encoder: RIFF('AVI ') with a LIST('hdrl')
    * carrying a 56-byte 'avih' main header and a LIST('strl') with a
    * 56-byte 'strh' ('vids'/'DIB ') and 40-byte BITMAPINFOHEADER
    * 'strf', then a LIST('movi') of '00db' chunks — each an
    * uncompressed bottom-up BGR DIB frame with 4-byte-padded rows,
    * exactly the BMP pixel layout. `frames` are top-down row-major
    * R,G,B triples (3·w·h bytes each). */
  def encodeAvi(width: Int, height: Int, usPerFrame: Int,
                frames: Array[Array[Byte]]): Array[Byte] = {
    require(frames.forall(_.length == 3 * width * height),
      s"every frame needs ${3 * width * height} RGB bytes")
    val stride = (3 * width + 3) / 4 * 4
    val frameBytes = stride * height
    val moviSize = 4 + frames.length * (8 + frameBytes)    // 'movi' + chunks
    val hdrlSize = 4 + (8 + 56) + (12 + (8 + 56) + (8 + 40))
    val fileSize = 12 + (8 + hdrlSize) + (8 + moviSize)
    val out = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String) = out.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); out.putInt(fileSize - 8); fourcc("AVI ")
    fourcc("LIST"); out.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); out.putInt(56)
    out.putInt(usPerFrame).putInt(0).putInt(0).putInt(0)   // usPerFrame, maxBps, pad, flags
      .putInt(frames.length).putInt(0).putInt(1).putInt(0) // totalFrames, initial, streams, bufSize
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0)             // reserved[4]
    fourcc("LIST"); out.putInt(4 + 64 + 48); fourcc("strl")   // 'strl' + strh + strf
    fourcc("strh"); out.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    out.putInt(0).putInt(0).putInt(0)                      // flags, prio+lang, initial
      .putInt(usPerFrame).putInt(1000000)                  // scale, rate (fps = rate/scale)
      .putInt(0).putInt(frames.length).putInt(frameBytes)  // start, length, bufSize
      .putInt(-1).putInt(0)                                // quality, sampleSize
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    fourcc("strf"); out.putInt(40)
    out.putInt(40).putInt(width).putInt(height)            // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(frameBytes)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    fourcc("LIST"); out.putInt(moviSize); fourcc("movi")
    frames.foreach { rgb =>
      fourcc("00db"); out.putInt(frameBytes)
      var y = height - 1                                   // bottom-up rows
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val p = 3 * (y * width + x)
          out.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p))  // BGR on disk
          x += 1
        }
        var pad = stride - 3 * width
        while (pad > 0) { out.put(0: Byte); pad -= 1 }
        y -= 1
      }
    }
    out.array()
  }

  /** REAL AVI decoder: validates RIFF/'AVI ', walks the top-level
    * chunk list to find LIST('hdrl') and LIST('movi') (tolerating
    * unknown chunks and odd-size padding), reads geometry from the
    * 'avih' header inside hdrl, then walks the movi sub-chunks
    * accumulating exact per-channel sums over the bottom-up padded
    * DIB frames. Throws on unsupported layouts. */
  def decodeAvi(id: Long, bytes: Array[Byte]): AviStats = {
    val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(bytes.length >= 12 && tag(0) == "RIFF" && tag(8) == "AVI ",
      s"doc $id: not an AVI payload")
    var off = 12
    var hdrlOff = -1; var moviOff = -1; var moviEnd = -1
    while (off + 8 <= bytes.length && (hdrlOff < 0 || moviOff < 0)) {
      val sz = in.getInt(off + 4)
      if (tag(off) == "LIST" && off + 12 <= bytes.length) tag(off + 8) match {
        case "hdrl" => hdrlOff = off + 12
        case "movi" => moviOff = off + 12; moviEnd = off + 8 + sz
        case _ => ()
      }
      off += 8 + sz + (sz & 1)                             // chunks pad to even
    }
    require(hdrlOff >= 0 && moviOff >= 0, s"doc $id: missing hdrl/movi list")
    require(tag(hdrlOff) == "avih", s"doc $id: hdrl does not start with avih")
    val usPerFrame = in.getInt(hdrlOff + 8)
    val width = in.getInt(hdrlOff + 8 + 32)
    val height = in.getInt(hdrlOff + 8 + 36)
    require(width > 0 && height > 0, s"doc $id: unsupported geometry ${width}x$height")
    val stride = (3 * width + 3) / 4 * 4
    var sumR = 0L; var sumG = 0L; var sumB = 0L; var wsum = 0L
    var nFrames = 0L
    var f = moviOff
    while (f + 8 <= moviEnd) {
      val sz = in.getInt(f + 4)
      if (tag(f) == "00db") {
        require(sz == stride * height, s"doc $id: frame size $sz != ${stride * height}")
        var frameTotal = 0L
        var y = 0
        while (y < height) {
          val rowOff = f + 8 + (height - 1 - y) * stride   // un-flip bottom-up
          var x = 0
          while (x < width) {
            val o = rowOff + 3 * x
            val b = bytes(o) & 0xFF; val g = bytes(o + 1) & 0xFF; val r = bytes(o + 2) & 0xFF
            sumB += b; sumG += g; sumR += r
            frameTotal += r + g + b
            x += 1
          }
          y += 1
        }
        nFrames += 1
        wsum += nFrames * frameTotal                       // (index+1) weight
      }
      f += 8 + sz + (sz & 1)
    }
    AviStats(id, nFrames, width, height, usPerFrame.toLong,
      nFrames * width.toLong * height.toLong, sumR, sumG, sumB, wsum,
      bytes.length.toLong)
  }

  /** Per-partition batch decode of AVI payloads — the same
    * mapPartitions seam as [[decodeBmpBatch]]/[[decodeWavBatch]]. */
  def decodeAviBatch(payloads: DataFrame)(implicit spark: SparkSession): Dataset[AviStats] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decodeAvi(id, bytes) } }
  }

  /** Border profile of a decoded BMP: uniformity and luminance range of
    * the 1-pixel frame plus exact interior totals — the letterbox /
    * pillarbox screen an image-curation pipeline runs before cropping
    * (a uniform border is padding, not content). Luminance here is the
    * exact integer channel sum r+g+b per pixel. */
  final case class BmpBorder(doc_id: Long, border_uniform: Boolean,
                             border_lum_min: Long, border_lum_max: Long,
                             n_border: Long, interior_lum_sum: Long,
                             n_interior: Long)

  /** Per-partition batch border profile over REAL BMP decodes — the
    * [[decodeBmpBatch]] seam with the raster walked once. */
  def bmpBorderBatch(payloads: DataFrame)(implicit spark: SparkSession): Dataset[BmpBorder] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val w = in.getInt(18); val h = in.getInt(22)
          val px = decodeBmpPixels(id, bytes)
          var bMin = Long.MaxValue; var bMax = Long.MinValue
          var nB = 0L; var intSum = 0L; var nI = 0L
          var i = 0
          while (i < w * h) {
            val x = i % w; val y = i / w
            val lum = (px(3 * i) & 0xFF).toLong + (px(3 * i + 1) & 0xFF) +
              (px(3 * i + 2) & 0xFF)
            if (x == 0 || x == w - 1 || y == 0 || y == h - 1) {
              nB += 1
              if (lum < bMin) bMin = lum
              if (lum > bMax) bMax = lum
            } else { nI += 1; intSum += lum }
            i += 1
          }
          BmpBorder(id, bMin == bMax, bMin, bMax, nB, intSum, nI)
        }
      }
  }

  /** Sharpness profile of a decoded BMP via the 4-neighbor Laplacian
    * on luminance: lap(x,y) = 4·lum − lum(x±1,y) − lum(x,y±1) over
    * interior pixels, reported as exact integer (count, Σlap, Σlap²) —
    * variance-of-Laplacian is the classical cheap blur screen an image
    * curation pipeline runs before any model-based scoring (a blurry
    * image has almost no high-frequency energy). */
  final case class BmpLaplacian(doc_id: Long, n_interior: Long,
                                sum_lap: Long, sum_lap2: Long)

  /** Per-partition batch Laplacian sums over REAL BMP decodes — the
    * [[decodeBmpBatch]] seam; each payload's raster is decoded once and
    * the stencil walked row-major. */
  def bmpLaplacianBatch(payloads: DataFrame)(implicit spark: SparkSession): Dataset[BmpLaplacian] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val w = in.getInt(18); val h = in.getInt(22)
          val px = decodeBmpPixels(id, bytes)
          def lum(x: Int, y: Int): Long = {
            val o = 3 * (y * w + x)
            (px(o) & 0xFF).toLong + (px(o + 1) & 0xFF) + (px(o + 2) & 0xFF)
          }
          var nI = 0L; var s1 = 0L; var s2 = 0L
          var y = 1
          while (y < h - 1) {
            var x = 1
            while (x < w - 1) {
              val lap = 4 * lum(x, y) - lum(x - 1, y) - lum(x + 1, y) -
                lum(x, y - 1) - lum(x, y + 1)
              nI += 1; s1 += lap; s2 += lap * lap
              x += 1
            }
            y += 1
          }
          BmpLaplacian(id, nI, s1, s2)
        }
      }
  }

  /** Dominant quantized color of a decoded BMP: each pixel maps to a
    * 64-cell RGB cube (2 bits per channel), argmax cell with the
    * lowest-bin tie-break — the palette fingerprint for cheap
    * color-based stratification before any model-based tagging. */
  final case class BmpDominant(doc_id: Long, dom_bin: Int, n_px_bin: Long,
                               n_px: Long)

  /** Per-partition batch dominant-color over REAL BMP decodes. */
  def bmpDominantBatch(payloads: DataFrame)(implicit spark: SparkSession): Dataset[BmpDominant] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val px = decodeBmpPixels(id, bytes)
          val n = px.length / 3
          val counts = new Array[Long](64)
          var i = 0
          while (i < n) {
            val bin = ((px(3 * i) & 0xFF) >> 6) * 16 +
              ((px(3 * i + 1) & 0xFF) >> 6) * 4 + ((px(3 * i + 2) & 0xFF) >> 6)
            counts(bin) += 1
            i += 1
          }
          var best = 0; var b = 1
          while (b < 64) { if (counts(b) > counts(best)) best = b; b += 1 }
          BmpDominant(id, best, counts(best), n.toLong)
        }
      }
  }

  /** Clipping profile of a decoded PCM stream: samples at or beyond the
    * threshold magnitude, peak, and exact DC sum — the audio-quality
    * gate that catches over-amplified recordings before feature
    * extraction. */
  final case class WavClipping(doc_id: Long, n_samples: Long, n_clipped: Long,
                               max_abs: Long, sum_v: Long)

  /** Per-partition batch clipping profile over REAL WAV decodes — the
    * [[decodeWav]] container walk with a clip counter. */
  def wavClippingBatch(payloads: DataFrame, threshold: Int)(
      implicit spark: SparkSession): Dataset[WavClipping] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          def tag(off: Int) = new String(bytes, off, 4, "US-ASCII")
          require(bytes.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
            s"doc $id: not a WAV payload")
          var off = 12
          var fmtOff = -1; var dataOff = -1; var dataSize = -1
          while (off + 8 <= bytes.length && (fmtOff < 0 || dataOff < 0)) {
            val sz = in.getInt(off + 4)
            tag(off) match {
              case "fmt " => fmtOff = off + 8
              case "data" => dataOff = off + 8; dataSize = sz
              case _ => ()
            }
            off += 8 + sz + (sz & 1)
          }
          require(fmtOff >= 0 && dataOff >= 0, s"doc $id: missing fmt/data chunk")
          require(in.getShort(fmtOff).toInt == 1 && in.getShort(fmtOff + 2).toInt == 1 &&
            in.getShort(fmtOff + 14).toInt == 16, s"doc $id: only PCM mono 16-bit supported")
          require(bytes.length >= dataOff + dataSize, s"doc $id: truncated sample data")
          val n = dataSize / 2
          var clipped = 0L; var maxAbs = 0L; var sumV = 0L
          var i = 0
          while (i < n) {
            val v = in.getShort(dataOff + 2 * i).toInt
            val a = math.abs(v).toLong
            if (a >= threshold) clipped += 1
            if (a > maxAbs) maxAbs = a
            sumV += v
            i += 1
          }
          WavClipping(id, n.toLong, clipped, maxAbs, sumV)
        }
      }
  }

  /** 2×2 box-downsample digest of a decoded BMP: per block the EXACT
    * integer sum of the four pixels' channel sums (no division — the
    * thumbnail in 4×-scaled units), folded into an order-sensitive
    * (block_idx+1)-weighted digest so a block-order mis-walk breaks
    * the compare. Odd trailing rows/columns are excluded (floor
    * geometry), matching what a strided thumbnail kernel reads. */
  final case class BmpDownsample(doc_id: Long, out_w: Int, out_h: Int,
                                 n_blocks: Long, wdigest: Long)

  /** Per-partition batch 2×2 downsample over REAL BMP decodes. */
  def bmpDownsampleBatch(payloads: DataFrame)(implicit spark: SparkSession): Dataset[BmpDownsample] = {
    import spark.implicits._
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val w = in.getInt(18); val h = in.getInt(22)
          val px = decodeBmpPixels(id, bytes)
          val ow = w / 2; val oh = h / 2
          var digest = 0L
          var by = 0
          while (by < oh) {
            var bx = 0
            while (bx < ow) {
              var blockSum = 0L
              var dy = 0
              while (dy < 2) {
                var dx = 0
                while (dx < 2) {
                  val p = 3 * ((2 * by + dy) * w + (2 * bx + dx))
                  blockSum += (px(p) & 0xFF).toLong + (px(p + 1) & 0xFF) + (px(p + 2) & 0xFF)
                  dx += 1
                }
                dy += 1
              }
              digest += blockSum * (by.toLong * ow + bx + 1)
              bx += 1
            }
            by += 1
          }
          BmpDownsample(id, ow, oh, ow.toLong * oh, digest)
        }
      }
  }

  /** Full plumbing: payload → batch decode → re-join metadata. */
  def decodedFrame(df: DataFrame, textCol: String, idCol: String)
                  (implicit spark: SparkSession): DataFrame = {
    val p = withPayload(df, textCol, idCol)
    decodeStub(p)(spark).toDF()
      .join(p.select(col("doc_id"), col("meta.byte_len").as("byte_len"),
        col("meta.sha256").as("sha256")), "doc_id")
      .select("doc_id", "byte_len", "sha256", "n_bytes", "head_byte", "decoder")
  }
}

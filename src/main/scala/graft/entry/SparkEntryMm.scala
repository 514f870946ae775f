package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.etl.{Clean, Features, Validate}
import graft.analytics.Summary


/** Mm query implementations and their paired oracle SQL —
  * split out of the assembled registry ([[SparkEntry]]) purely for
  * file-size maintainability; the self-type gives every member the
  * same scope it had inside the object. Moved vals are lazy so
  * trait-linearization order can never observe an uninitialized
  * cross-family reference. */
private[graft] trait SparkEntryMm { this: SparkEntry.type =>


  private[graft] def mmBinaryMeta(s: SparkSession, dir: String): DataFrame =
    graft.multimodal.BinaryColumns.decodedFrame(
        Tables.documents(s, dir), "text", "doc_id")(s)
      .orderBy(col("doc_id"))

  private[graft] lazy val mmBinaryMetaSql =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
      |  sha256(text) AS sha256,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(ascii(substr(text, 1, 1)) AS INT) AS head_byte,
      |  'stub-v1' AS decoder
      |FROM documents ORDER BY doc_id""".stripMargin

  /** REAL image decode under the hash oracle: each document gets a
    * genuine 24-bit BMP synthesized from md5-nibble pixel bytes
    * (engine-portable derivation), ENCODED in the actual on-disk
    * format (bottom-up BGR rows, 4-byte-padded strides) and DECODED
    * back by the header-parsing pixel-walking reader
    * ([[graft.multimodal.BinaryColumns.decodeBmp]]) in mapPartitions.
    * The oracle rederives the pixel bytes in SQL and checks geometry,
    * exact integer channel sums, and the encoder's stride/file-size
    * arithmetic — a mis-parse of padding, channel order, or row flip
    * breaks the hash. Variable per-doc geometry exercises every
    * padding case (w ∈ 1..5 → stride pad 1,2,0,3,1). */
  /** Perceptual-hash image dedup over REAL decodes — the multimodal ×
    * dedup crossover: 8×8 images are synthesized from md5 nibbles
    * (25 base patterns; per doc_id%4 class: exact copy, tiny-noise
    * near-dup, or full-noise distinct), encoded as genuine 24-bit BMPs,
    * decoded back by the real parser
    * ([[graft.multimodal.BinaryColumns.decodeBmpPixels]]) in
    * mapPartitions, and average-hashed (63-bit: gray > image mean per
    * pixel — bit 63 dropped so the Σ bit·2^p gather stays inside BIGINT
    * on both engines, the dedup_simhash precedent). Equal-hash groups
    * (n≥2) are the perceptual-duplicate families — tiny-noise copies
    * mostly land in their family's hash, full-noise docs drop out.
    * Group-by on the 8-byte hash: linear, no pair join; the oracle
    * rederives pixels, grays, mean and hash from the synthesis formula
    * in SQL, so a mis-decode (row flip, BGR swap, stride slip) breaks
    * the hash compare. */
  private[graft] def mmImageDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val hashes = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def nib2(key: String): Int = {
        val b0 = md.digest(key.getBytes("UTF-8"))(0)
        ((b0 >> 4) & 0xF) * 16 + (b0 & 0xF)
      }
      it.map { id =>
        val fam = id % 25
        val rgb = Array.tabulate(192) { p =>
          val base = nib2(s"img:$fam:$p")
          val v =
            if (id % 4 == 0) base
            else if (id % 4 == 1) (base + nib2(s"n:$id:$p") % 4) % 256
            else (base + nib2(s"n:$id:$p")) % 256
          v.toByte
        }
        val px = graft.multimodal.BinaryColumns.decodeBmpPixels(id,
          graft.multimodal.BinaryColumns.encodeBmp(8, 8, rgb))
        val gray = Array.tabulate(64)(q =>
          ((px(3 * q) & 0xFF) + (px(3 * q + 1) & 0xFF) + (px(3 * q + 2) & 0xFF)) / 3)
        val mean = gray.sum / 64
        var h = 0L; var q = 0
        while (q < 63) { if (gray(q) > mean) h |= 1L << q; q += 1 }
        (id, h)
      }
    }.toDF("doc_id", "ahash")
    hashes.groupBy(col("ahash"))
      .agg(count(lit(1)).as("n_imgs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .filter(col("n_imgs") >= 2)
      .orderBy(col("ahash"))
  }

  private[graft] lazy val mmImageDedupSql: String = {
    def nib2(expr: String) =
      s"""(16 * (instr('0123456789abcdef', substr(md5($expr), 1, 1)) - 1)
         | + (instr('0123456789abcdef', substr(md5($expr), 2, 1)) - 1))""".stripMargin
    val b = nib2("'img:' || CAST(doc_id % 25 AS VARCHAR) || ':' || CAST(p.range AS VARCHAR)")
    val n = nib2("'n:' || CAST(doc_id AS VARCHAR) || ':' || CAST(p.range AS VARCHAR)")
    s"""WITH d AS (SELECT doc_id FROM documents),
       |px AS (SELECT doc_id, p.range AS p,
       |    CASE WHEN doc_id % 4 = 0 THEN $b
       |         WHEN doc_id % 4 = 1 THEN ($b + ($n % 4)) % 256
       |         ELSE ($b + $n) % 256 END AS v
       |  FROM d CROSS JOIN range(0, 192) p),
       |gr AS (SELECT doc_id, p // 3 AS q, CAST(SUM(v) // 3 AS BIGINT) AS gray
       |       FROM px GROUP BY doc_id, p // 3),
       |mn AS (SELECT doc_id, CAST(SUM(gray) // 64 AS BIGINT) AS mean
       |       FROM gr GROUP BY doc_id),
       |bits AS (SELECT g.doc_id,
       |    CAST(SUM(CASE WHEN q < 63 AND gray > mean
       |             THEN (CAST(1 AS BIGINT) << CAST(q AS INT)) ELSE 0 END) AS BIGINT) AS ahash
       |  FROM gr g JOIN mn ON g.doc_id = mn.doc_id GROUP BY g.doc_id)
       |SELECT ahash, COUNT(*) AS n_imgs, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |FROM bits GROUP BY ahash HAVING COUNT(*) >= 2 ORDER BY ahash""".stripMargin
  }

  private[graft] def mmDecodeStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val w = 1 + (id % 5).toInt; val h = 1 + (id % 3).toInt
        val rgb = Array.tabulate(3 * w * h) { p =>
          // byte = first two md5 hex nibbles, the oracle's derivation
          md.digest(s"px:$id:$p".getBytes("UTF-8"))(0)
        }
        (id, graft.multimodal.BinaryColumns.encodeBmp(w, h, rgb))
      }
    }.toDF("doc_id", "payload")
    graft.multimodal.BinaryColumns.decodeBmpBatch(payloads)(s).toDF()
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val mmDecodeStatsSql =
    """WITH d AS (SELECT doc_id, CAST(1 + doc_id % 5 AS INT) AS width,
      |    CAST(1 + doc_id % 3 AS INT) AS height FROM documents),
      |px AS (SELECT d.doc_id, d.width, d.height, p.range AS p,
      |    16 * (instr('0123456789abcdef', substr(md5('px:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(p.range AS VARCHAR)), 1, 1)) - 1)
      |       + (instr('0123456789abcdef', substr(md5('px:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(p.range AS VARCHAR)), 2, 1)) - 1) AS v
      |  FROM d CROSS JOIN range(0, 45) p
      |  WHERE p.range < 3 * d.width * d.height)
      |SELECT doc_id, MAX(width) AS width, MAX(height) AS height, 24 AS bpp,
      |  CAST(MAX(width) * MAX(height) AS BIGINT) AS n_px,
      |  CAST(SUM(CASE WHEN p % 3 = 0 THEN v END) AS BIGINT) AS sum_r,
      |  CAST(SUM(CASE WHEN p % 3 = 1 THEN v END) AS BIGINT) AS sum_g,
      |  CAST(SUM(CASE WHEN p % 3 = 2 THEN v END) AS BIGINT) AS sum_b,
      |  CAST(54 + ((3 * MAX(width) + 3) // 4) * 4 * MAX(height) AS BIGINT) AS file_bytes
      |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Region features from a REAL raster decode — the thumbnail/tiling
    * operator over [[graft.multimodal.BinaryColumns.decodeBmpPixels]]
    * (the decoder the perceptual-hash path uses, here under the hash
    * oracle directly): larger synthetic BMPs (up to 16×12, md5-nibble
    * pixels) are container-encoded, raster-decoded per partition, and
    * reduced to a 2×2 grid of exact integer brightness sums. The
    * oracle rederives every pixel byte AND the tile geometry in SQL,
    * so a row-order flip, BGR swap, or stride mistake in the decoder
    * breaks the hash. 4 rows per document, decode is map-only. */
  private[graft] def mmImageTiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val w = 8 + (id % 9).toInt; val h = 8 + (id % 5).toInt
        val rgb = Array.tabulate(3 * w * h) { p =>
          md.digest(s"tile:$id:$p".getBytes("UTF-8"))(0)
        }
        (id, graft.multimodal.BinaryColumns.encodeBmp(w, h, rgb))
      }
    }.toDF("doc_id", "payload")
    graft.multimodal.BinaryColumns.bmpTileBatch(payloads)(s).toDF()
      .orderBy(col("doc_id"), col("tile"))
  }

  private[graft] lazy val mmImageTilesSql =
    """WITH d AS (SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w,
      |    CAST(8 + doc_id % 5 AS INT) AS h FROM documents),
      |px AS (SELECT d.doc_id, d.w, d.h, p.range AS p,
      |    16 * (instr('0123456789abcdef', substr(md5('tile:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(p.range AS VARCHAR)), 1, 1)) - 1)
      |       + (instr('0123456789abcdef', substr(md5('tile:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(p.range AS VARCHAR)), 2, 1)) - 1) AS v
      |  FROM d CROSS JOIN range(0, 576) p
      |  WHERE p.range < 3 * d.w * d.h),
      |t AS (SELECT doc_id, v,
      |        CAST((2 * ((p // 3) // w) // h) * 2 + 2 * ((p // 3) % w) // w AS INT) AS tile
      |      FROM px)
      |SELECT doc_id, tile, CAST(COUNT(*) // 3 AS BIGINT) AS n_px,
      |  CAST(SUM(v) AS BIGINT) AS sum_rgb
      |FROM t GROUP BY doc_id, tile ORDER BY doc_id, tile""".stripMargin

  /** REAL audio decode under the hash oracle — the WAV twin of
    * [[mmDecodeStats]]: each document gets a genuine RIFF/WAVE PCM
    * payload (16-bit LE mono samples synthesized from md5 nibbles,
    * engine-portable), encoded in the actual container format and
    * decoded back by the chunk-walking parser
    * ([[graft.multimodal.BinaryColumns.decodeWav]]) in mapPartitions.
    * The oracle rederives the samples in SQL and checks format
    * fields, exact integer amplitude sums, strict sign-change zero
    * crossings, and container size arithmetic — a mis-parse of chunk
    * offsets, sample signedness, or LE byte order breaks the hash.
    * Variable per-doc geometry (n ∈ 32..48, rate ∈ {8,9,10} kHz)
    * exercises length and truncating-duration cases. */
  private[graft] def mmWavStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val n = 32 + (id % 17).toInt
        val rate = 8000 + 1000 * (id % 3).toInt
        val samples = Array.tabulate(n) { p =>
          val d = md.digest(s"au:$id:$p".getBytes("UTF-8"))
          // s16 = first four md5 hex nibbles, the oracle's derivation
          (((d(0) & 0xFF) << 8) | (d(1) & 0xFF)).toShort
        }
        (id, graft.multimodal.BinaryColumns.encodeWav(rate, samples))
      }
    }.toDF("doc_id", "payload")
    graft.multimodal.BinaryColumns.decodeWavBatch(payloads)(s).toDF()
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val mmWavStatsSql = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    val u16 = s"(((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)})"
    s"""WITH d AS (SELECT doc_id, CAST(32 + doc_id % 17 AS INT) AS n,
       |                  CAST(8000 + 1000 * (doc_id % 3) AS INT) AS rate
       |           FROM documents),
       |smp0 AS (SELECT d.doc_id, d.n, d.rate, p.range AS p,
       |                md5('au:' || CAST(d.doc_id AS VARCHAR) || ':' ||
       |                    CAST(p.range AS VARCHAR)) AS h
       |         FROM d CROSS JOIN range(0, 49) p WHERE p.range < d.n),
       |sv AS (SELECT doc_id, n, rate, p,
       |              CASE WHEN $u16 >= 32768 THEN $u16 - 65536 ELSE $u16 END AS v
       |       FROM smp0),
       |lg AS (SELECT doc_id, v, LAG(v) OVER (PARTITION BY doc_id ORDER BY p) AS pv
       |       FROM sv),
       |zc AS (SELECT doc_id,
       |              CAST(SUM(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
       |       FROM lg GROUP BY doc_id),
       |ag AS (SELECT doc_id, MAX(n) AS n, MAX(rate) AS rate,
       |              CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
       |              CAST(MAX(ABS(v)) AS BIGINT) AS max_abs,
       |              CAST(SUM(v) AS BIGINT) AS sum_v
       |       FROM sv GROUP BY doc_id)
       |SELECT a.doc_id, CAST(a.n AS BIGINT) AS n_samples, a.rate AS sample_rate,
       |       CAST(a.n * 1000000 // a.rate AS BIGINT) AS duration_us,
       |       a.sum_abs, a.max_abs, a.sum_v, z.zero_cross,
       |       CAST(44 + 2 * a.n AS BIGINT) AS file_bytes
       |FROM ag a JOIN zc z USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** REAL video decode under the hash oracle — completing the
    * image/audio/video triple: each document gets a genuine AVI
    * container (RIFF with hdrl/strl headers and a movi LIST of
    * uncompressed bottom-up DIB frames) synthesized from md5-nibble
    * pixel bytes, decoded back by the nested-LIST chunk walker
    * ([[graft.multimodal.BinaryColumns.decodeAvi]]) in mapPartitions.
    * The oracle rederives every frame's pixels in SQL and checks
    * geometry, exact channel sums, the (index+1)-weighted frame sum
    * (order-sensitive — a frame-order mis-parse breaks the hash), and
    * the full container size arithmetic. */
  private[graft] def mmAviFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val w = 2 + (id % 3).toInt; val h = 1 + (id % 2).toInt
        val nf = 2 + (id % 4).toInt
        val uspf = 33333 + (id % 2).toInt * 6667
        val frames = Array.tabulate(nf) { f =>
          Array.tabulate(3 * w * h) { p =>
            // byte = first two md5 hex nibbles, the oracle's derivation
            md.digest(s"fr:$id:$f:$p".getBytes("UTF-8"))(0)
          }
        }
        (id, graft.multimodal.BinaryColumns.encodeAvi(w, h, uspf, frames))
      }
    }.toDF("doc_id", "payload")
    graft.multimodal.BinaryColumns.decodeAviBatch(payloads)(s).toDF()
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val mmAviFramesSql = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    s"""WITH d AS (SELECT doc_id, CAST(2 + doc_id % 3 AS INT) AS w,
       |                  CAST(1 + doc_id % 2 AS INT) AS ht,
       |                  CAST(2 + doc_id % 4 AS INT) AS nf,
       |                  CAST(33333 + (doc_id % 2) * 6667 AS BIGINT) AS uspf
       |           FROM documents),
       |px0 AS (SELECT d.doc_id, d.w, d.ht, d.nf, d.uspf, f.range AS f, p.range AS p,
       |               md5('fr:' || CAST(d.doc_id AS VARCHAR) || ':' ||
       |                   CAST(f.range AS VARCHAR) || ':' || CAST(p.range AS VARCHAR)) AS h
       |        FROM d CROSS JOIN range(0, 5) f CROSS JOIN range(0, 24) p
       |        WHERE f.range < d.nf AND p.range < 3 * d.w * d.ht),
       |px AS (SELECT doc_id, w, ht, nf, uspf, f, p,
       |              16 * ${nib(1)} + ${nib(2)} AS v
       |       FROM px0)
       |SELECT doc_id, CAST(MAX(nf) AS BIGINT) AS n_frames,
       |       MAX(w) AS width, MAX(ht) AS height,
       |       MAX(uspf) AS us_per_frame,
       |       CAST(MAX(nf) * MAX(w) * MAX(ht) AS BIGINT) AS n_px_total,
       |       CAST(SUM(CASE WHEN p % 3 = 0 THEN v END) AS BIGINT) AS sum_r,
       |       CAST(SUM(CASE WHEN p % 3 = 1 THEN v END) AS BIGINT) AS sum_g,
       |       CAST(SUM(CASE WHEN p % 3 = 2 THEN v END) AS BIGINT) AS sum_b,
       |       CAST(SUM((f + 1) * v) AS BIGINT) AS wsum,
       |       CAST(224 + MAX(nf) * (8 + ((3 * MAX(w) + 3) // 4) * 4 * MAX(ht)) AS BIGINT) AS file_bytes
       |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Multimodal frame sampling under the hard oracle: payloads (UTF-8
    * bytes standing in for media) are chopped into 16-byte frames and
    * every 4th is kept — the video/audio frame-extraction plumbing.
    * The per-doc digest (frame count, kept bytes, last frame index) is
    * pure integer arithmetic over byte lengths, so DuckDB recomputes it
    * exactly from strlen(text): the explode shape, stride filter, and
    * short-last-frame handling are all hash-verified, complementing
    * mm_binary_meta's metadata checks. */
  private[graft] def mmFrameDigest(s: SparkSession, dir: String): DataFrame = {
    implicit val sp: SparkSession = s
    val p = graft.multimodal.BinaryColumns.withPayload(
      Tables.documents(s, dir), "text", "doc_id")
    graft.multimodal.BinaryColumns.frameSample(p, frameSize = 16, stride = 4)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("frame_len")).as("frame_bytes"),
        max(col("frame_no")).cast("long").as("last_frame"))
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val mmFrameDigestSql =
    """WITH d AS (SELECT doc_id, strlen(text) AS len FROM documents),
      |c AS (SELECT doc_id, len, CAST(ceil(len / 16.0) AS BIGINT) AS n_chunks FROM d)
      |SELECT doc_id,
      |  (n_chunks - 1) // 4 + 1 AS n_frames,
      |  16 * ((n_chunks - 1) // 4 + 1)
      |    - CASE WHEN (n_chunks - 1) % 4 = 0 AND len % 16 > 0
      |           THEN 16 - (len % 16) ELSE 0 END AS frame_bytes,
      |  4 * ((n_chunks - 1) // 4) AS last_frame
      |FROM c ORDER BY doc_id""".stripMargin

  /** Shard-manifest packing for a training corpus — documents are
    * assigned to byte-capped shards (the WebDataset/tar-shard layout)
    * by NEXT-FIT over the canonical (source, doc_id) order: a doc's
    * shard is its start offset in the concatenated stream divided by
    * the cap. The global running offset is ONE
    * [[graft.operators.PrefixSum]] scan (no single-partition window);
    * everything after is an ordinary shard_id aggregate. The manifest
    * (doc ranges + byte totals per shard) is what a downstream loader
    * seeks into. */
  private[graft] def mmShardPack(s: SparkSession, dir: String): DataFrame = {
    val cap = 32768L
    val d = Tables.documents(s, dir).select(col("source"), col("doc_id"),
      octet_length(col("text")).cast("bigint").as("bytes"))
    val scan = graft.operators.PrefixSum.withRunningTotals(
      d, Seq("source", "doc_id"), Seq("bytes"))
    scan.select(col("source"), col("doc_id"), col("bytes"),
        expr(s"(bytes_cum - bytes) div $cap").as("shard_id"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("bytes")).as("shard_bytes"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard_id"))
  }

  private[graft] lazy val mmShardPackSql =
    """WITH d AS (SELECT source, doc_id,
      |             CAST(strlen(text) AS BIGINT) AS bytes FROM documents),
      |c AS (SELECT source, doc_id, bytes,
      |        CAST(SUM(bytes) OVER (ORDER BY source, doc_id) AS BIGINT) AS cum
      |      FROM d)
      |SELECT (cum - bytes) // 32768 AS shard_id, COUNT(*) AS n_docs,
      |  CAST(SUM(bytes) AS BIGINT) AS shard_bytes,
      |  COUNT(DISTINCT source) AS n_sources,
      |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** Windowed audio features from REAL RIFF/WAVE PCM decodes — the
    * frame-level feature pass (energy / peak / zero-crossing per
    * fixed-width window) an audio training pipeline runs before VAD or
    * silence trimming. Payloads are genuine WAV containers synthesized
    * from md5-derived int16 samples (the [[mmWavStats]] corpus),
    * decoded per partition by
    * [[graft.multimodal.BinaryColumns.decodeWavWindows]] into
    * 16-sample windows of exact integer features; the oracle
    * rederives samples AND window geometry from the doc ids, so a
    * header mis-walk, sample misalignment, or window-boundary bug
    * breaks the hash. Row-local end to end — no shuffle beyond the
    * final presentation sort. */
  private[graft] def mmAudioWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val n = 32 + (id % 17).toInt
        val rate = 8000 + 1000 * (id % 3).toInt
        val samples = Array.tabulate(n) { p =>
          val d = md.digest(s"au:$id:$p".getBytes("UTF-8"))
          (((d(0) & 0xFF) << 8) | (d(1) & 0xFF)).toShort
        }
        (id, graft.multimodal.BinaryColumns.encodeWav(rate, samples))
      }
    }.toDF("doc_id", "payload")
    graft.multimodal.BinaryColumns.decodeWavWindowsBatch(payloads, win = 16)(s).toDF()
      .orderBy(col("doc_id"), col("win_id"))
  }

  private[graft] lazy val mmAudioWindowsSql = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    val u16 = s"(((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)})"
    s"""WITH d AS (SELECT doc_id, CAST(32 + doc_id % 17 AS INT) AS n
       |           FROM documents),
       |smp0 AS (SELECT d.doc_id, p.range AS p,
       |                md5('au:' || CAST(d.doc_id AS VARCHAR) || ':' ||
       |                    CAST(p.range AS VARCHAR)) AS h
       |         FROM d CROSS JOIN range(0, 49) p WHERE p.range < d.n),
       |sv AS (SELECT doc_id, p, CAST(p // 16 AS INT) AS win_id,
       |              CASE WHEN $u16 >= 32768 THEN $u16 - 65536 ELSE $u16 END AS v
       |       FROM smp0),
       |lg AS (SELECT doc_id, win_id, p, v,
       |              LAG(v) OVER (PARTITION BY doc_id, win_id ORDER BY p) AS pv
       |       FROM sv)
       |SELECT doc_id, win_id, COUNT(*) AS n_in_win,
       |       CAST(SUM(CAST(v AS BIGINT) * CAST(v AS BIGINT)) AS BIGINT) AS sum_sq,
       |       CAST(MAX(ABS(v)) AS BIGINT) AS max_abs,
       |       CAST(SUM(v) AS BIGINT) AS sum_v,
       |       CAST(SUM(CASE WHEN pv * v < 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross
       |FROM lg GROUP BY doc_id, win_id
       |ORDER BY doc_id, win_id""".stripMargin
  }

  /** 8-bin luminance histograms over REAL BMP decodes — the exposure/
    * contrast profile an image-curation pipeline screens on (all-dark /
    * all-blown images drop before any model-based scoring). Same
    * synthesize→encode→genuinely-decode seam as mm_image_tiles
    * ([[graft.multimodal.BinaryColumns.bmpHistogramBatch]]); lum =
    * r+g+b per pixel, bin = lum div 96, all-zero bins emitted (fixed 8
    * rows/doc — schema-stable). The oracle rederives every pixel from
    * the md5 nibbles and rebuilds the histogram in SQL, so a channel-
    * order or stride mis-decode breaks the hash. Row-local decode: no
    * shuffle before the final order. */
  private[graft] def mmImageHist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val w = 8 + (id % 5).toInt; val h = 8 + (id % 3).toInt
        val rgb = Array.tabulate(3 * w * h) { p =>
          md.digest(s"hist:$id:$p".getBytes("UTF-8"))(0)
        }
        (id, graft.multimodal.BinaryColumns.encodeBmp(w, h, rgb))
      }
    }.toDF("doc_id", "payload")
    graft.multimodal.BinaryColumns.bmpHistogramBatch(payloads)(s).toDF()
      .orderBy(col("doc_id"), col("bin"))
  }

  private[graft] lazy val mmImageHistSql =
    """WITH d AS (SELECT doc_id, CAST(8 + doc_id % 5 AS INT) AS w,
      |    CAST(8 + doc_id % 3 AS INT) AS h FROM documents),
      |px AS (SELECT d.doc_id, p.range // 3 AS px_id,
      |    16 * (instr('0123456789abcdef', substr(md5('hist:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(p.range AS VARCHAR)), 1, 1)) - 1)
      |       + (instr('0123456789abcdef', substr(md5('hist:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(p.range AS VARCHAR)), 2, 1)) - 1) AS v
      |  FROM d CROSS JOIN range(0, 360) p
      |  WHERE p.range < 3 * d.w * d.h),
      |lum AS (SELECT doc_id, px_id, CAST(SUM(v) AS BIGINT) AS lum
      |        FROM px GROUP BY doc_id, px_id),
      |hist AS (SELECT doc_id, CAST(lum // 96 AS INT) AS bin,
      |           COUNT(*) AS n_px, CAST(SUM(lum) AS BIGINT) AS sum_lum
      |         FROM lum GROUP BY 1, 2)
      |SELECT d.doc_id, CAST(b.range AS INT) AS bin,
      |  COALESCE(h.n_px, 0) AS n_px, COALESCE(h.sum_lum, 0) AS sum_lum
      |FROM (SELECT DISTINCT doc_id FROM d) d CROSS JOIN range(0, 8) b
      |LEFT JOIN hist h ON h.doc_id = d.doc_id AND h.bin = b.range
      |ORDER BY d.doc_id, bin""".stripMargin

  /** Scene-cut detection over REAL AVI decodes — the shot-boundary
    * pass a video-curation pipeline runs before frame sampling (sample
    * per SCENE, not per fixed stride, or long static shots dominate).
    * Synthesized videos carry genuine scene structure (frames within a
    * 3-frame scene are identical by construction); the container is
    * decoded per frame by the movi walker
    * ([[graft.multimodal.BinaryColumns.aviFrameSumsBatch]]), then a
    * doc-keyed lag window diffs consecutive exact frame totals and
    * emits the boundaries where the total changes. The oracle
    * rederives per-frame sums from the md5 nibbles and replays the
    * same lag — a frame-order mis-parse breaks the hash. */
  private[graft] def mmSceneCuts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val w = 2 + (id % 3).toInt; val h = 1 + (id % 2).toInt
        val nf = 6 + (id % 4).toInt
        val frames = Array.tabulate(nf) { f =>
          Array.tabulate(3 * w * h) { p =>
            md.digest(s"sc:$id:${f / 3}:$p".getBytes("UTF-8"))(0)
          }
        }
        (id, graft.multimodal.BinaryColumns.encodeAvi(w, h, 33333, frames))
      }
    }.toDF("doc_id", "payload")
    val sums = graft.multimodal.BinaryColumns.aviFrameSumsBatch(payloads)(s).toDF()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    sums.withColumn("prev_sum", lag(col("frame_sum"), 1).over(w))
      .filter(col("prev_sum").isNotNull && col("prev_sum") =!= col("frame_sum"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("cut_at"),
        col("prev_sum"), col("frame_sum"))
      .orderBy(col("doc_id"), col("cut_at"))
  }

  private[graft] lazy val mmSceneCutsSql =
    """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 3 AS INT) AS w,
      |    CAST(1 + doc_id % 2 AS INT) AS ht,
      |    CAST(6 + doc_id % 4 AS INT) AS nf FROM documents),
      |px AS (SELECT d.doc_id, f.range AS f,
      |    16 * (instr('0123456789abcdef', substr(md5('sc:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(f.range // 3 AS VARCHAR) || ':' ||
      |      CAST(p.range AS VARCHAR)), 1, 1)) - 1)
      |       + (instr('0123456789abcdef', substr(md5('sc:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(f.range // 3 AS VARCHAR) || ':' ||
      |      CAST(p.range AS VARCHAR)), 2, 1)) - 1) AS v
      |  FROM d CROSS JOIN range(0, 10) f CROSS JOIN range(0, 24) p
      |  WHERE f.range < d.nf AND p.range < 3 * d.w * d.ht),
      |fs AS (SELECT doc_id, f, CAST(SUM(v) AS BIGINT) AS frame_sum
      |       FROM px GROUP BY doc_id, f),
      |lg AS (SELECT doc_id, f, frame_sum,
      |         LAG(frame_sum) OVER (PARTITION BY doc_id ORDER BY f) AS prev_sum
      |       FROM fs)
      |SELECT doc_id, CAST(f AS BIGINT) AS cut_at, prev_sum, frame_sum
      |FROM lg WHERE prev_sum IS NOT NULL AND prev_sum <> frame_sum
      |ORDER BY doc_id, cut_at""".stripMargin

  /** Energy-threshold VAD over REAL WAV decodes — the silence-trim
    * pass an audio-curation pipeline runs before paying for
    * transcription (mm_audio_windows emits the frame features; this
    * DECIDES, per clip, what survives the trim). 8-sample windows from
    * the genuine container decode
    * ([[graft.multimodal.BinaryColumns.decodeWavWindowsBatch]]);
    * active ⇔ energy sum_sq ≥ 8·3·10⁸ (an exact integer compare — no
    * mean-square float at the boundary); per clip: active count,
    * first/last active window (−1 when fully silent), and the
    * trimmed-span window count. Oracle rederives window energies from
    * the md5 sample synthesis and replays the threshold. */
  private[graft] def mmAudioVad(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val n = 32 + (id % 17).toInt
        val rate = 8000 + 1000 * (id % 3).toInt
        val samples = Array.tabulate(n) { p =>
          val d = md.digest(s"au:$id:$p".getBytes("UTF-8"))
          (((d(0) & 0xFF) << 8) | (d(1) & 0xFF)).toShort
        }
        (id, graft.multimodal.BinaryColumns.encodeWav(rate, samples))
      }
    }.toDF("doc_id", "payload")
    val wins = graft.multimodal.BinaryColumns.decodeWavWindowsBatch(payloads, win = 8)(s)
      .toDF()
      .withColumn("active",
        (col("sum_sq") >= col("n_in_win") * lit(300000000L)).cast("long"))
    wins.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"), sum(col("active")).as("n_active"),
        coalesce(min(when(col("active") === 1, col("win_id"))), lit(-1))
          .cast("long").as("first_active"),
        coalesce(max(when(col("active") === 1, col("win_id"))), lit(-1))
          .cast("long").as("last_active"))
      .withColumn("kept_windows",
        when(col("n_active") > 0, col("last_active") - col("first_active") + 1)
          .otherwise(lit(0L)))
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val mmAudioVadSql = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    val u16 = s"(((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)})"
    s"""WITH d AS (SELECT doc_id, CAST(32 + doc_id % 17 AS INT) AS n FROM documents),
       |smp0 AS (SELECT d.doc_id, p.range AS p,
       |                md5('au:' || CAST(d.doc_id AS VARCHAR) || ':' ||
       |                    CAST(p.range AS VARCHAR)) AS h
       |         FROM d CROSS JOIN range(0, 49) p WHERE p.range < d.n),
       |sv AS (SELECT doc_id, p,
       |              CASE WHEN $u16 >= 32768 THEN $u16 - 65536 ELSE $u16 END AS v
       |       FROM smp0),
       |w AS (SELECT doc_id, CAST(p // 8 AS INT) AS win_id, COUNT(*) AS n_in_win,
       |             CAST(SUM(CAST(v AS BIGINT) * v) AS BIGINT) AS sum_sq
       |      FROM sv GROUP BY 1, 2),
       |act AS (SELECT doc_id, win_id,
       |          CASE WHEN sum_sq >= n_in_win * 300000000 THEN 1 ELSE 0 END AS active
       |        FROM w),
       |ag AS (SELECT doc_id, COUNT(*) AS n_windows,
       |         CAST(SUM(active) AS BIGINT) AS n_active,
       |         CAST(COALESCE(MIN(CASE WHEN active = 1 THEN win_id END), -1) AS BIGINT)
       |           AS first_active,
       |         CAST(COALESCE(MAX(CASE WHEN active = 1 THEN win_id END), -1) AS BIGINT)
       |           AS last_active
       |       FROM act GROUP BY doc_id)
       |SELECT doc_id, n_windows, n_active, first_active, last_active,
       |  CASE WHEN n_active > 0 THEN last_active - first_active + 1
       |       ELSE 0 END AS kept_windows
       |FROM ag ORDER BY doc_id""".stripMargin
  }

  /** Perceptual video dedup over REAL AVI decodes — the video member
    * of the dedup family (mm_image_dedup hashes stills; a video's
    * identity is its frame SEQUENCE, so the fingerprint concatenates
    * per-frame average-hashes in order — two videos with the same
    * frames shuffled do NOT collide). Three synthesis classes per
    * 25-family corpus (exact copy / tiny-noise / full-noise), genuine
    * encode→[[graft.multimodal.BinaryColumns.decodeAviFrames]] decode,
    * 7-bit per-frame hash (gray > frame mean, last pixel dropped),
    * fingerprint = Σ fh·128^f — exact BIGINT. Equal-fingerprint groups
    * n≥2: linear group-by, no pair join; the oracle rederives every
    * pixel so a frame-order or row-flip mis-decode breaks the hash. */
  private[graft] def mmVideoDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val prints = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def nib2(key: String): Int = {
        val b0 = md.digest(key.getBytes("UTF-8"))(0)
        ((b0 >> 4) & 0xF) * 16 + (b0 & 0xF)
      }
      it.map { id =>
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
        val payload = graft.multimodal.BinaryColumns.encodeAvi(4, 2, 33333, frames)
        val decoded = graft.multimodal.BinaryColumns.decodeAviFrames(id, payload)
        var fp = 0L
        var scale = 1L
        decoded.foreach { rgb =>
          val gray = Array.tabulate(8)(q =>
            ((rgb(3 * q) & 0xFF) + (rgb(3 * q + 1) & 0xFF) + (rgb(3 * q + 2) & 0xFF)) / 3)
          val mean = gray.sum / 8
          var fh = 0L; var q = 0
          while (q < 7) { if (gray(q) > mean) fh |= 1L << q; q += 1 }
          fp += fh * scale
          scale *= 128L
        }
        (id, fp)
      }
    }.toDF("doc_id", "vprint")
    prints.groupBy(col("vprint"))
      .agg(count(lit(1)).as("n_videos"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .filter(col("n_videos") >= 2)
      .orderBy(col("vprint"))
  }

  private[graft] lazy val mmVideoDedupSql: String = {
    def nib2(expr: String) =
      s"""(16 * (instr('0123456789abcdef', substr(md5($expr), 1, 1)) - 1)
         | + (instr('0123456789abcdef', substr(md5($expr), 2, 1)) - 1))""".stripMargin
    val b = nib2("'vid:' || CAST(doc_id % 25 AS VARCHAR) || ':' || CAST(f.range AS VARCHAR) || ':' || CAST(p.range AS VARCHAR)")
    val n = nib2("'vn:' || CAST(doc_id AS VARCHAR) || ':' || CAST(f.range AS VARCHAR) || ':' || CAST(p.range AS VARCHAR)")
    s"""WITH d AS (SELECT doc_id FROM documents),
       |px AS (SELECT doc_id, f.range AS f, p.range AS p,
       |    CASE WHEN doc_id % 4 = 0 THEN $b
       |         WHEN doc_id % 4 = 1 THEN ($b + ($n % 4)) % 256
       |         ELSE ($b + $n) % 256 END AS v
       |  FROM d CROSS JOIN range(0, 3) f CROSS JOIN range(0, 24) p),
       |gr AS (SELECT doc_id, f, p // 3 AS q, CAST(SUM(v) // 3 AS BIGINT) AS gray
       |       FROM px GROUP BY doc_id, f, p // 3),
       |mn AS (SELECT doc_id, f, CAST(SUM(gray) // 8 AS BIGINT) AS mean
       |       FROM gr GROUP BY doc_id, f),
       |fh AS (SELECT gr.doc_id, gr.f,
       |         CAST(SUM(CASE WHEN gr.gray > mn.mean AND gr.q < 7
       |                       THEN CAST(1 AS BIGINT) << CAST(gr.q AS INT)
       |                       ELSE 0 END) AS BIGINT) AS fhash
       |       FROM gr JOIN mn ON gr.doc_id = mn.doc_id AND gr.f = mn.f
       |       GROUP BY gr.doc_id, gr.f),
       |fp AS (SELECT doc_id,
       |         CAST(SUM(fhash * (CAST(1 AS BIGINT) << CAST(7 * f AS INT))) AS BIGINT) AS vprint
       |       FROM fh GROUP BY doc_id)
       |SELECT vprint, COUNT(*) AS n_videos,
       |  MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |FROM fp GROUP BY vprint HAVING COUNT(*) >= 2
       |ORDER BY vprint""".stripMargin
  }

  /** Per-image luminance entropy over REAL BMP decodes — the
    * information-content screen beside mm_image_hist's raw bins
    * (uniform noise scores ln 8, a flat/blown image near 0; curation
    * drops both tails). Same hist: synthesis and genuine container
    * decode; the 8-bin histogram and its Shannon entropy are computed
    * IN the decode kernel (row-local, zero shuffle before the final
    * order), entropy over non-empty bins ROUND(·,6); the oracle
    * rederives pixels→bins→entropy in SQL. */
  private[graft] def mmImageEntropy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    // the kernel emits non-empty (doc, bin, count) rows; the entropy
    // SUM runs in the DataFrame through the DECIMAL(38,18) gather so
    // term-addition order matches the oracle (a kernel-side double
    // fold would sum in bin order while SQL sums in scan order)
    val rows = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { id =>
        val w = 8 + (id % 5).toInt; val h = 8 + (id % 3).toInt
        val rgb = Array.tabulate(3 * w * h) { p =>
          md.digest(s"hist:$id:$p".getBytes("UTF-8"))(0)
        }
        val px = graft.multimodal.BinaryColumns.decodeBmpPixels(id,
          graft.multimodal.BinaryColumns.encodeBmp(w, h, rgb))
        val bins = new Array[Long](8)
        var i = 0
        while (i < px.length) {
          bins(((px(i) & 0xFF) + (px(i + 1) & 0xFF) + (px(i + 2) & 0xFF)) / 96) += 1
          i += 3
        }
        (0 until 8).filter(bins(_) > 0)
          .map(b => (id, (w * h).toLong, b, bins(b)))
      }
    }.toDF("doc_id", "n_px", "bin", "b")
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    rows.groupBy(col("doc_id"))
      .agg(max(col("n_px")).as("n_px"), count(lit(1)).as("n_bins_used"),
        gather(lit(-1.0) * col("b").cast("double") / col("n_px").cast("double") *
          log(col("b").cast("double") / col("n_px").cast("double"))).as("eg"))
      .select(col("doc_id"), col("n_px"), col("n_bins_used"),
        round(col("eg").cast("double"), 6).as("entropy"))
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val mmImageEntropySql =
    """WITH d AS (SELECT doc_id, CAST(8 + doc_id % 5 AS INT) AS w,
      |    CAST(8 + doc_id % 3 AS INT) AS h FROM documents),
      |px AS (SELECT d.doc_id, d.w, d.h, p.range // 3 AS px_id,
      |    16 * (instr('0123456789abcdef', substr(md5('hist:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(p.range AS VARCHAR)), 1, 1)) - 1)
      |       + (instr('0123456789abcdef', substr(md5('hist:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(p.range AS VARCHAR)), 2, 1)) - 1) AS v
      |  FROM d CROSS JOIN range(0, 360) p
      |  WHERE p.range < 3 * d.w * d.h),
      |lum AS (SELECT doc_id, MAX(w) AS w, MAX(h) AS h, px_id,
      |               CAST(SUM(v) AS BIGINT) AS lum
      |        FROM px GROUP BY doc_id, px_id),
      |hist AS (SELECT doc_id, MAX(w * h) AS npx, lum // 96 AS bin, COUNT(*) AS b
      |         FROM lum GROUP BY doc_id, lum // 96)
      |SELECT doc_id, CAST(MAX(npx) AS BIGINT) AS n_px,
      |  COUNT(*) AS n_bins_used,
      |  ROUND(CAST(CAST(SUM(CAST(-1.0 * CAST(b AS DOUBLE) / CAST(npx AS DOUBLE)
      |    * ln(CAST(b AS DOUBLE) / CAST(npx AS DOUBLE)) AS DECIMAL(38,18)))
      |    AS DECIMAL(38,18)) AS DOUBLE), 6) AS entropy
      |FROM hist GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Letterbox/padding screen over REAL BMP decodes
    * ([[graft.multimodal.BinaryColumns.bmpBorderBatch]]): every third
    * document is synthesized with a FORCED uniform 1-pixel border
    * (channel byte id%200) around md5-nibble interior pixels, the rest
    * are md5 throughout — so the query must recover exactly the planted
    * uniform set from the decoded raster. The oracle rederives border
    * geometry (x/y from the pixel index) and the channel bytes in SQL;
    * a raster mis-walk (stride, BGR order, bottom-up rows) breaks the
    * hash. */
  private[graft] def mmImageBorders(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val w = 8 + (id % 5).toInt; val h = 8 + (id % 3).toInt
        val rgb = Array.tabulate(3 * w * h) { p =>
          val pxId = p / 3; val x = pxId % w; val y = pxId / w
          val isBorder = x == 0 || x == w - 1 || y == 0 || y == h - 1
          if (isBorder && id % 3 == 0) (id % 200).toByte
          else md.digest(s"bord:$id:$p".getBytes("UTF-8"))(0)
        }
        (id, graft.multimodal.BinaryColumns.encodeBmp(w, h, rgb))
      }
    }.toDF("doc_id", "payload")
    graft.multimodal.BinaryColumns.bmpBorderBatch(payloads)(s).toDF()
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val mmImageBordersSql = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    s"""WITH d AS (SELECT doc_id, CAST(8 + doc_id % 5 AS INT) AS w,
       |    CAST(8 + doc_id % 3 AS INT) AS ht FROM documents),
       |px0 AS (SELECT d.doc_id, d.w, d.ht, p.range AS p, (p.range // 3) AS px_id,
       |    (p.range // 3) % d.w AS x, (p.range // 3) // d.w AS y
       |  FROM d CROSS JOIN range(0, 360) p WHERE p.range < 3 * d.w * d.ht),
       |pv AS (SELECT doc_id, px_id,
       |    (x = 0 OR x = w - 1 OR y = 0 OR y = ht - 1) AS is_border,
       |    CASE WHEN (x = 0 OR x = w - 1 OR y = 0 OR y = ht - 1) AND doc_id % 3 = 0
       |      THEN doc_id % 200
       |      ELSE 16 * ${nib(1)} + ${nib(2)} END AS v
       |  FROM (SELECT *, md5('bord:' || CAST(doc_id AS VARCHAR) || ':' ||
       |          CAST(p AS VARCHAR)) AS h FROM px0) t),
       |lum AS (SELECT doc_id, px_id, MAX(CAST(is_border AS INT)) AS is_border,
       |          CAST(SUM(v) AS BIGINT) AS lum
       |        FROM pv GROUP BY doc_id, px_id)
       |SELECT doc_id,
       |  MIN(CASE WHEN is_border = 1 THEN lum END)
       |    = MAX(CASE WHEN is_border = 1 THEN lum END) AS border_uniform,
       |  MIN(CASE WHEN is_border = 1 THEN lum END) AS border_lum_min,
       |  MAX(CASE WHEN is_border = 1 THEN lum END) AS border_lum_max,
       |  CAST(SUM(is_border) AS BIGINT) AS n_border,
       |  CAST(COALESCE(SUM(CASE WHEN is_border = 0 THEN lum END), 0) AS BIGINT) AS interior_lum_sum,
       |  CAST(SUM(1 - is_border) AS BIGINT) AS n_interior
       |FROM lum GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Dominant quantized color over REAL BMP decodes
    * ([[graft.multimodal.BinaryColumns.bmpDominantBatch]]): 2 bits per
    * channel → 64-cell RGB cube, argmax cell with lowest-bin
    * tie-break, from md5-nibble pixels. The oracle rebuilds each
    * pixel's three channel bytes and replays the quantization +
    * argmax; row-local per image, no shuffle beyond the final
    * collect-ordered emission. */
  private[graft] def mmImageDominant(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val w = 8 + (id % 5).toInt; val h = 8 + (id % 3).toInt
        val rgb = Array.tabulate(3 * w * h) { p =>
          md.digest(s"dom:$id:$p".getBytes("UTF-8"))(0)
        }
        (id, graft.multimodal.BinaryColumns.encodeBmp(w, h, rgb))
      }
    }.toDF("doc_id", "payload")
    graft.multimodal.BinaryColumns.bmpDominantBatch(payloads)(s).toDF()
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val mmImageDominantSql = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    s"""WITH d AS (SELECT doc_id, CAST(8 + doc_id % 5 AS INT) AS w,
       |    CAST(8 + doc_id % 3 AS INT) AS ht FROM documents),
       |pv AS (SELECT doc_id, (p // 3) AS px_id, p % 3 AS ch,
       |    16 * ${nib(1)} + ${nib(2)} AS v
       |  FROM (SELECT d.doc_id, p.range AS p,
       |          md5('dom:' || CAST(d.doc_id AS VARCHAR) || ':' ||
       |            CAST(p.range AS VARCHAR)) AS h, d.w, d.ht
       |        FROM d CROSS JOIN range(0, 360) p
       |        WHERE p.range < 3 * d.w * d.ht) t),
       |bins AS (SELECT doc_id, px_id,
       |    CAST(SUM(CASE WHEN ch = 0 THEN (v // 64) * 16
       |                  WHEN ch = 1 THEN (v // 64) * 4
       |                  ELSE v // 64 END) AS INT) AS bin
       |  FROM pv GROUP BY doc_id, px_id),
       |bc AS (SELECT doc_id, bin, COUNT(*) AS n FROM bins GROUP BY doc_id, bin),
       |rk AS (SELECT doc_id, bin, n,
       |         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, bin) AS r,
       |         CAST(SUM(n) OVER (PARTITION BY doc_id) AS BIGINT) AS n_px
       |       FROM bc)
       |SELECT doc_id, bin AS dom_bin, CAST(n AS BIGINT) AS n_px_bin, n_px
       |FROM rk WHERE r = 1 ORDER BY doc_id""".stripMargin
  }

  /** Clipping audit over REAL WAV decodes
    * ([[graft.multimodal.BinaryColumns.wavClippingBatch]]): every
    * fourth document's md5-nibble int16 stream is over-amplified 4×
    * with int16 saturation at synthesis, the decoder counts samples at
    * or past |32000| — recovering exactly the planted hot set. The
    * oracle replays the s16 derivation, the 4× saturating amplify
    * (GREATEST/LEAST), and the threshold count. */
  private[graft] def mmAudioClipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val n = 32 + (id % 17).toInt
        val samples = Array.tabulate(n) { p =>
          val d = md.digest(s"clip:$id:$p".getBytes("UTF-8"))
          val raw = (((d(0) & 0xFF) << 8) | (d(1) & 0xFF)).toShort.toInt
          val v = if (id % 4 == 0) math.max(-32768, math.min(32767, raw * 4)) else raw
          v.toShort
        }
        (id, graft.multimodal.BinaryColumns.encodeWav(8000, samples))
      }
    }.toDF("doc_id", "payload")
    graft.multimodal.BinaryColumns.wavClippingBatch(payloads, 32000)(s).toDF()
      .withColumn("clip_rate",
        col("n_clipped").cast("double") / col("n_samples").cast("double"))
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val mmAudioClippingSql = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    val u16 = s"(((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)})"
    s"""WITH d AS (SELECT doc_id, CAST(32 + doc_id % 17 AS INT) AS n FROM documents),
       |s0 AS (SELECT d.doc_id, d.n, p.range AS p,
       |         md5('clip:' || CAST(d.doc_id AS VARCHAR) || ':' ||
       |             CAST(p.range AS VARCHAR)) AS h
       |       FROM d CROSS JOIN range(0, 49) p WHERE p.range < d.n),
       |sr AS (SELECT doc_id, n, p,
       |         CASE WHEN $u16 >= 32768 THEN $u16 - 65536 ELSE $u16 END AS raw
       |       FROM s0),
       |sv AS (SELECT doc_id, n,
       |         CASE WHEN doc_id % 4 = 0
       |           THEN GREATEST(-32768, LEAST(32767, raw * 4)) ELSE raw END AS v
       |       FROM sr)
       |SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_samples,
       |  CAST(SUM(CASE WHEN ABS(v) >= 32000 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
       |  CAST(MAX(ABS(v)) AS BIGINT) AS max_abs,
       |  CAST(SUM(v) AS BIGINT) AS sum_v,
       |  CAST(SUM(CASE WHEN ABS(v) >= 32000 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(MAX(n) AS DOUBLE) AS clip_rate
       |FROM sv GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Per-video motion profile over REAL AVI decodes — the aggregate
    * view of mm_scene_cuts' boundary list: total and mean absolute
    * frame-to-frame brightness change (exact integers, one division),
    * moving-transition count. Same scene-structured synthesis as the
    * cuts query (frames within a 3-frame scene identical by
    * construction), same
    * [[graft.multimodal.BinaryColumns.aviFrameSumsBatch]] movi walk —
    * static-shot videos score 0 motion by construction, which the
    * planted scene layout makes verifiable. */
  private[graft] def mmVideoMotion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val w = 2 + (id % 3).toInt; val h = 1 + (id % 2).toInt
        val nf = 6 + (id % 4).toInt
        val frames = Array.tabulate(nf) { f =>
          Array.tabulate(3 * w * h) { p =>
            md.digest(s"mot:$id:${f / 3}:$p".getBytes("UTF-8"))(0)
          }
        }
        (id, graft.multimodal.BinaryColumns.encodeAvi(w, h, 33333, frames))
      }
    }.toDF("doc_id", "payload")
    val sums = graft.multimodal.BinaryColumns.aviFrameSumsBatch(payloads)(s).toDF()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    sums.withColumn("diff", abs(col("frame_sum") - lag(col("frame_sum"), 1).over(w)))
      .filter(col("diff").isNotNull)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_transitions"),
        sum(col("diff")).as("motion_total"),
        sum((col("diff") > 0).cast("long")).as("n_moving"))
      .select(col("doc_id"), col("n_transitions"), col("motion_total"), col("n_moving"),
        (col("motion_total").cast("double") / col("n_transitions").cast("double"))
          .as("mean_motion"))
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val mmVideoMotionSql =
    """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 3 AS INT) AS w,
      |    CAST(1 + doc_id % 2 AS INT) AS ht,
      |    CAST(6 + doc_id % 4 AS INT) AS nf FROM documents),
      |px AS (SELECT d.doc_id, f.range AS f,
      |    16 * (instr('0123456789abcdef', substr(md5('mot:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(f.range // 3 AS VARCHAR) || ':' ||
      |      CAST(p.range AS VARCHAR)), 1, 1)) - 1)
      |       + (instr('0123456789abcdef', substr(md5('mot:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(f.range // 3 AS VARCHAR) || ':' ||
      |      CAST(p.range AS VARCHAR)), 2, 1)) - 1) AS v
      |  FROM d CROSS JOIN range(0, 10) f CROSS JOIN range(0, 24) p
      |  WHERE f.range < d.nf AND p.range < 3 * d.w * d.ht),
      |fs AS (SELECT doc_id, f, CAST(SUM(v) AS BIGINT) AS frame_sum
      |       FROM px GROUP BY doc_id, f),
      |df AS (SELECT doc_id,
      |         ABS(frame_sum - LAG(frame_sum) OVER (PARTITION BY doc_id ORDER BY f)) AS diff
      |       FROM fs)
      |SELECT doc_id, COUNT(*) AS n_transitions,
      |  CAST(SUM(diff) AS BIGINT) AS motion_total,
      |  CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_moving,
      |  CAST(SUM(diff) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_motion
      |FROM df WHERE diff IS NOT NULL GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Thumbnail (2×2 box) downsample digest over REAL BMP decodes
    * ([[graft.multimodal.BinaryColumns.bmpDownsampleBatch]]): per-block
    * exact integer sums, no division, order-sensitive weighted digest —
    * the resize step of an image pipeline with its correctness pinned
    * by the oracle rederiving every block from md5-nibble pixels. */
  private[graft] def mmImageDownsample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val w = 8 + (id % 5).toInt; val h = 8 + (id % 3).toInt
        val rgb = Array.tabulate(3 * w * h) { p =>
          md.digest(s"dsm:$id:$p".getBytes("UTF-8"))(0)
        }
        (id, graft.multimodal.BinaryColumns.encodeBmp(w, h, rgb))
      }
    }.toDF("doc_id", "payload")
    graft.multimodal.BinaryColumns.bmpDownsampleBatch(payloads)(s).toDF()
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val mmImageDownsampleSql = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    s"""WITH d AS (SELECT doc_id, CAST(8 + doc_id % 5 AS INT) AS w,
       |    CAST(8 + doc_id % 3 AS INT) AS ht FROM documents),
       |pv AS (SELECT doc_id, w, ht, (p // 3) AS px_id, 16 * ${nib(1)} + ${nib(2)} AS v
       |  FROM (SELECT d.doc_id, d.w, d.ht, p.range AS p,
       |          md5('dsm:' || CAST(d.doc_id AS VARCHAR) || ':' ||
       |            CAST(p.range AS VARCHAR)) AS h
       |        FROM d CROSS JOIN range(0, 360) p
       |        WHERE p.range < 3 * d.w * d.ht) t),
       |lum AS (SELECT doc_id, MAX(w) AS w, MAX(ht) AS ht, px_id,
       |          CAST(SUM(v) AS BIGINT) AS lum
       |        FROM pv GROUP BY doc_id, px_id),
       |blk AS (SELECT doc_id, (px_id % w) // 2 AS bx, (px_id // w) // 2 AS by,
       |          w // 2 AS ow, ht // 2 AS oh, lum
       |        FROM lum
       |        WHERE (px_id % w) < (w // 2) * 2 AND (px_id // w) < (ht // 2) * 2),
       |bs AS (SELECT doc_id, MAX(ow) AS ow, MAX(oh) AS oh, by, bx,
       |         CAST(SUM(lum) AS BIGINT) AS block_sum
       |       FROM blk GROUP BY doc_id, by, bx)
       |SELECT doc_id, CAST(MAX(ow) AS INT) AS out_w, CAST(MAX(oh) AS INT) AS out_h,
       |  CAST(MAX(ow) * MAX(oh) AS BIGINT) AS n_blocks,
       |  CAST(SUM(block_sum * (by * ow + bx + 1)) AS BIGINT) AS wdigest
       |FROM bs GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Keyframe extraction over REAL AVI decodes: frame 0 plus every
    * scene boundary (where the exact frame total changes) is a
    * keyframe — the per-SCENE sampling anchor mm_scene_cuts' boundary
    * list feeds. Same movi walker, same scene-structured synthesis;
    * emits the keyframe rows themselves (doc, frame index, exact
    * total). */
  private[graft] def mmVideoKeyframes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val w = 2 + (id % 3).toInt; val h = 1 + (id % 2).toInt
        val nf = 6 + (id % 4).toInt
        val frames = Array.tabulate(nf) { f =>
          Array.tabulate(3 * w * h) { p =>
            md.digest(s"kf:$id:${f / 3}:$p".getBytes("UTF-8"))(0)
          }
        }
        (id, graft.multimodal.BinaryColumns.encodeAvi(w, h, 33333, frames))
      }
    }.toDF("doc_id", "payload")
    val sums = graft.multimodal.BinaryColumns.aviFrameSumsBatch(payloads)(s).toDF()
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    sums.withColumn("prev_sum", lag(col("frame_sum"), 1).over(w))
      .filter(col("prev_sum").isNull || col("prev_sum") =!= col("frame_sum"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("kf_idx"), col("frame_sum"))
      .orderBy(col("doc_id"), col("kf_idx"))
  }

  private[graft] lazy val mmVideoKeyframesSql =
    """WITH d AS (SELECT doc_id, CAST(2 + doc_id % 3 AS INT) AS w,
      |    CAST(1 + doc_id % 2 AS INT) AS ht,
      |    CAST(6 + doc_id % 4 AS INT) AS nf FROM documents),
      |px AS (SELECT d.doc_id, f.range AS f,
      |    16 * (instr('0123456789abcdef', substr(md5('kf:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(f.range // 3 AS VARCHAR) || ':' ||
      |      CAST(p.range AS VARCHAR)), 1, 1)) - 1)
      |       + (instr('0123456789abcdef', substr(md5('kf:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(f.range // 3 AS VARCHAR) || ':' ||
      |      CAST(p.range AS VARCHAR)), 2, 1)) - 1) AS v
      |  FROM d CROSS JOIN range(0, 10) f CROSS JOIN range(0, 24) p
      |  WHERE f.range < d.nf AND p.range < 3 * d.w * d.ht),
      |fs AS (SELECT doc_id, f, CAST(SUM(v) AS BIGINT) AS frame_sum
      |       FROM px GROUP BY doc_id, f),
      |lg AS (SELECT doc_id, f, frame_sum,
      |         LAG(frame_sum) OVER (PARTITION BY doc_id ORDER BY f) AS prev_sum
      |       FROM fs)
      |SELECT doc_id, CAST(f AS BIGINT) AS kf_idx, frame_sum
      |FROM lg WHERE prev_sum IS NULL OR prev_sum <> frame_sum
      |ORDER BY doc_id, kf_idx""".stripMargin

  /** 2× audio decimation over REAL WAV decodes: every second sample of
    * the genuine PCM stream (the cheapest resample), with exact integer
    * stats of the decimated stream — the sample-rate-reduction step of
    * an audio pipeline with the stride arithmetic pinned by the oracle
    * rederiving the kept samples. */
  private[graft] def mmAudioDecimate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val n = 32 + (id % 17).toInt
        val samples = Array.tabulate(n) { p =>
          val d = md.digest(s"dec:$id:$p".getBytes("UTF-8"))
          (((d(0) & 0xFF) << 8) | (d(1) & 0xFF)).toShort
        }
        val kept = Array.tabulate((n + 1) / 2)(i => samples(2 * i))
        (id, graft.multimodal.BinaryColumns.encodeWav(8000, kept))
      }
    }.toDF("doc_id", "payload")
    graft.multimodal.BinaryColumns.decodeWavBatch(payloads)(s).toDF()
      .select(col("doc_id"), col("n_samples"), col("sum_abs"), col("max_abs"), col("sum_v"))
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val mmAudioDecimateSql = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    val u16 = s"(((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)})"
    s"""WITH d AS (SELECT doc_id, CAST(32 + doc_id % 17 AS INT) AS n FROM documents),
       |s0 AS (SELECT d.doc_id, d.n, p.range AS p,
       |         md5('dec:' || CAST(d.doc_id AS VARCHAR) || ':' ||
       |             CAST(p.range AS VARCHAR)) AS h
       |       FROM d CROSS JOIN range(0, 49) p
       |       WHERE p.range < d.n AND p.range % 2 = 0),
       |sv AS (SELECT doc_id, n,
       |         CASE WHEN $u16 >= 32768 THEN $u16 - 65536 ELSE $u16 END AS v
       |       FROM s0)
       |SELECT doc_id, CAST((MAX(n) + 1) // 2 AS BIGINT) AS n_samples,
       |  CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs,
       |  CAST(MAX(ABS(v)) AS BIGINT) AS max_abs,
       |  CAST(SUM(v) AS BIGINT) AS sum_v
       |FROM sv GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Horizontal-flip digest over REAL BMP decodes — the augmentation
    * op whose correctness is all coordinate arithmetic: the flipped
    * raster's (position+1)-weighted luminance digest only matches the
    * oracle if x → w−1−x is applied against the right stride and row
    * order. Row-local per image. */
  private[graft] def mmImageFlip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val w = 8 + (id % 5).toInt; val h = 8 + (id % 3).toInt
        val rgb = Array.tabulate(3 * w * h) { p =>
          md.digest(s"flp:$id:$p".getBytes("UTF-8"))(0)
        }
        (id, graft.multimodal.BinaryColumns.encodeBmp(w, h, rgb))
      }
    }.toDF("doc_id", "payload")
    payloads.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val in = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val w = in.getInt(18); val h = in.getInt(22)
          val px = graft.multimodal.BinaryColumns.decodeBmpPixels(id, bytes)
          var digest = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val src = 3 * (y * w + (w - 1 - x))
              val lum = (px(src) & 0xFF).toLong + (px(src + 1) & 0xFF) + (px(src + 2) & 0xFF)
              digest += lum * (y.toLong * w + x + 1)
              x += 1
            }
            y += 1
          }
          (id, w, h, digest)
        }
      }.toDF("doc_id", "w", "h", "flip_digest")
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val mmImageFlipSql = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    s"""WITH d AS (SELECT doc_id, CAST(8 + doc_id % 5 AS INT) AS w,
       |    CAST(8 + doc_id % 3 AS INT) AS ht FROM documents),
       |pv AS (SELECT doc_id, w, ht, (p // 3) AS px_id, 16 * ${nib(1)} + ${nib(2)} AS v
       |  FROM (SELECT d.doc_id, d.w, d.ht, p.range AS p,
       |          md5('flp:' || CAST(d.doc_id AS VARCHAR) || ':' ||
       |            CAST(p.range AS VARCHAR)) AS h
       |        FROM d CROSS JOIN range(0, 360) p
       |        WHERE p.range < 3 * d.w * d.ht) t),
       |lum AS (SELECT doc_id, MAX(w) AS w, MAX(ht) AS ht, px_id,
       |          CAST(SUM(v) AS BIGINT) AS lum
       |        FROM pv GROUP BY doc_id, px_id),
       |fl AS (SELECT doc_id, w, ht,
       |         lum * ((px_id // w) * w + (w - 1 - (px_id % w)) + 1) AS term
       |       FROM lum)
       |SELECT doc_id, CAST(MAX(w) AS INT) AS w, CAST(MAX(ht) AS INT) AS h,
       |  CAST(SUM(term) AS BIGINT) AS flip_digest
       |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Variance-of-Laplacian blur screen over REAL BMP decodes — the
    * classical cheap sharpness gate an image-curation pipeline runs
    * before any model-based scoring (a blurry image has almost no
    * high-frequency energy, so the Laplacian variance collapses). Same
    * synthesize→encode→genuinely-decode seam as mm_image_hist
    * ([[graft.multimodal.BinaryColumns.bmpLaplacianBatch]]); the
    * stencil sums are exact integers, variance one IEEE division. The
    * oracle rederives every pixel from the md5 nibbles and replays the
    * 4-neighbor stencil with coordinate joins — a stride, row-order, or
    * interior-boundary bug breaks the hash. Row-local decode: zero
    * shuffle before the final order. */
  private[graft] def mmImageBlur(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id").cast("long")).as[Long]
    val payloads = docs.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { id =>
        val w = 8 + (id % 5).toInt; val h = 8 + (id % 3).toInt
        val rgb = Array.tabulate(3 * w * h) { p =>
          md.digest(s"blur:$id:$p".getBytes("UTF-8"))(0)
        }
        (id, graft.multimodal.BinaryColumns.encodeBmp(w, h, rgb))
      }
    }.toDF("doc_id", "payload")
    graft.multimodal.BinaryColumns.bmpLaplacianBatch(payloads)(s).toDF()
      .select(col("doc_id"), col("n_interior"), col("sum_lap"), col("sum_lap2"),
        round((col("n_interior").cast("double") * col("sum_lap2").cast("double") -
            col("sum_lap").cast("double") * col("sum_lap").cast("double")) /
          (col("n_interior").cast("double") * col("n_interior").cast("double")), 6)
          .as("lap_var"))
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val mmImageBlurSql =
    """WITH d AS (SELECT doc_id, CAST(8 + doc_id % 5 AS INT) AS w,
      |    CAST(8 + doc_id % 3 AS INT) AS h FROM documents),
      |raw AS (SELECT d.doc_id, d.w, d.h, p.range AS p,
      |    16 * (instr('0123456789abcdef', substr(md5('blur:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(p.range AS VARCHAR)), 1, 1)) - 1)
      |       + (instr('0123456789abcdef', substr(md5('blur:' ||
      |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(p.range AS VARCHAR)), 2, 1)) - 1) AS v
      |  FROM d CROSS JOIN range(0, 360) p
      |  WHERE p.range < 3 * d.w * d.h),
      |lum AS (SELECT doc_id, MAX(w) AS w, CAST((p // 3) % MAX(w) AS INT) AS x,
      |    CAST((p // 3) // MAX(w) AS INT) AS y, CAST(SUM(v) AS BIGINT) AS lum
      |  FROM raw GROUP BY doc_id, p // 3),
      |lap AS (SELECT c.doc_id,
      |    4 * c.lum - l.lum - r.lum - u.lum - dn.lum AS lap
      |  FROM lum c
      |  JOIN lum l  ON l.doc_id = c.doc_id AND l.y = c.y AND l.x = c.x - 1
      |  JOIN lum r  ON r.doc_id = c.doc_id AND r.y = c.y AND r.x = c.x + 1
      |  JOIN lum u  ON u.doc_id = c.doc_id AND u.x = c.x AND u.y = c.y - 1
      |  JOIN lum dn ON dn.doc_id = c.doc_id AND dn.x = c.x AND dn.y = c.y + 1),
      |g AS (SELECT doc_id, COUNT(*) AS n_interior,
      |    CAST(SUM(lap) AS BIGINT) AS sum_lap,
      |    CAST(SUM(lap * lap) AS BIGINT) AS sum_lap2
      |  FROM lap GROUP BY doc_id)
      |SELECT doc_id, n_interior, sum_lap, sum_lap2,
      |  ROUND((CAST(n_interior AS DOUBLE) * CAST(sum_lap2 AS DOUBLE)
      |      - CAST(sum_lap AS DOUBLE) * CAST(sum_lap AS DOUBLE))
      |    / (CAST(n_interior AS DOUBLE) * CAST(n_interior AS DOUBLE)), 6) AS lap_var
      |FROM g ORDER BY doc_id""".stripMargin
}

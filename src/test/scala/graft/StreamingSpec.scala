package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventsStream
import graft.streaming.EventsStream.Ev

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)

  test("windowedAgg: tumbling hour windows over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    in.addData(
      Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(10), 1, "click", 2.0),
      Ev(3, ts(70), 2, "view", 5.0))
    val q = EventsStream.windowedAgg(in.toDF(), "1 hour", "2 hours")
      .writeStream.outputMode("complete").format("memory").queryName("wagg").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("wagg").orderBy("hour", "event_type")
      .select("event_type", "n", "total_value").as[(String, Long, Double)].collect()
    assert(out.toSeq == Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("toSnapshotSink: one snapshot version per batch, replayed batches skipped") {
    import graft.etl.Snapshots
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_snapsink").toString
    val t = s"$dir/events_snap"
    val in = MemoryStream[Ev]
    in.addData(Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(1), 1, "view", 2.0))
    val q = EventsStream.toSnapshotSink(in.toDF(), t, s"$dir/ckpt")
    q.processAllAvailable()
    in.addData(Ev(3, ts(2), 2, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    // version ladder mirrors the batch ladder; reads are cumulative
    assert(Snapshots.latestVersion(spark, t) == 2)
    assert(Snapshots.read(spark, t, Some(1)).count() == 2)
    assert(Snapshots.read(spark, t).count() == 3)
    // post-failure replay: batch 0 arrives again — the CAS commit makes
    // it a no-op instead of double-appending its rows
    val replay = Snapshots.read(spark, t, Some(1))
    assert(!EventsStream.commitBatchSnapshot(replay, t, 0L))
    assert(Snapshots.latestVersion(spark, t) == 2)
    assert(Snapshots.read(spark, t).count() == 3)
    // the replay's orphaned files are inside the grace window, so an
    // immediate maintenance vacuum must NOT break the published versions
    Snapshots.vacuum(spark, t, keepFrom = 1)
    assert(Snapshots.read(spark, t).count() == 3)
  }

  test("toCatalogSink: derived tables land together, one catalog version per batch") {
    import graft.etl.{Snapshots, TxCatalog}
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_catsink").toString
    val root = s"$dir/warehouse"
    val splits: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      "raw" -> (b => b),
      "stats" -> (b => b.groupBy(col("event_type")).agg(count(lit(1)).as("n"))))
    val in = MemoryStream[Ev]
    in.addData(Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(1), 1, "view", 2.0))
    val q = EventsStream.toCatalogSink(in.toDF(), root, s"$dir/ckpt", splits)
    q.processAllAvailable()
    in.addData(Ev(3, ts(2), 2, "click", 3.0))
    q.processAllAvailable()
    q.stop()
    // one catalog version per batch; both tables pinned at the batch version
    assert(TxCatalog.latestVersion(spark, root) == 2)
    assert(TxCatalog.readCatalog(spark, root, 2).tables == Map("raw" -> 2, "stats" -> 2))
    assert(TxCatalog.read(spark, root, "raw").count() == 3)
    // stats appends one aggregate row-set per batch: 2 (b0: click,view) + 1 (b1: click)
    assert(TxCatalog.read(spark, root, "stats").count() == 3)
    // catalog v1 is the batch-0 pair, still consistent after batch 1
    assert(TxCatalog.read(spark, root, "raw", Some(1)).count() == 2)
    assert(TxCatalog.read(spark, root, "stats", Some(1)).count() == 2)
    // full replay of batch 0: every CAS loses, nothing moves
    val replay = TxCatalog.read(spark, root, "raw", Some(1))
    assert(!EventsStream.commitBatchCatalog(replay, root, 0L, splits))
    assert(TxCatalog.latestVersion(spark, root) == 2)
    assert(Snapshots.latestVersion(spark, s"$root/raw") == 2)
    assert(TxCatalog.read(spark, root, "raw").count() == 3)
    // partial-failure replay: table 'raw' already staged v3, catalog not
    // flipped — the replayed batch completes the missing split and flips
    Snapshots.commit(replay.limit(1), s"$root/raw", "append", Some(3))
    assert(EventsStream.commitBatchCatalog(replay.limit(1), root, 2L, splits))
    assert(TxCatalog.readCatalog(spark, root, 3).tables == Map("raw" -> 3, "stats" -> 3))
    assert(TxCatalog.read(spark, root, "raw").count() == 4)
  }

  test("dedupStream drops duplicate keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    in.addData(
      Ev(1, ts(0), 1, "click", 1.0), Ev(1, ts(1), 1, "click", 1.0),
      Ev(2, ts(2), 1, "view", 2.0))
    val q = EventsStream.dedupStream(in.toDF(), Seq("event_id"), "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("dedup").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup").select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("file-source streaming over the real events parquet replays the batch agg") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file source wants a directory: stage the file into one
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("part-0.parquet"))
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    val raw = spark.readStream.schema(schema).parquet(dir.toString)
    // same two-generation ts handling as Tables.events (nanos-as-long vs
    // native micros) so the spec survives either testdata layout
    val stream = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    val q = EventsStream.windowedAgg(stream, "1 hour", "2 hours")
      .writeStream.outputMode("complete").format("memory").queryName("fileagg").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("fileagg")
      .agg(sum("n")).as[Long].head()
    val batch = Tables.events(spark, sfDir).count()
    assert(streamed == batch)
  }

  test("sessionize: gap closes a session, state emits it") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    val in = MemoryStream[Ev]
    val q = EventsStream.sessionize(in.toDS(), gapMinutes = 30, idleTimeout = false)
      .writeStream.outputMode("append").format("memory").queryName("sess").start()
    // batch 1: two events 10 min apart (same session), then 90-min gap event
    in.addData(Ev(1, ts(0), 7, "click", 1.0), Ev(2, ts(10), 7, "click", 2.0))
    q.processAllAvailable()
    in.addData(Ev(3, ts(100), 7, "view", 4.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess")
      .select("user_id", "session_id", "n_events", "session_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    // the first session (2 events, value 3.0) must have been emitted when
    // the 90-min-later event arrived
    assert(out.contains((7L, 1L, 2L, 3.0)))
  }

  test("twaStream: emitted holds reproduce the batch time-weighted average") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    val in = MemoryStream[Ev]
    val q = EventsStream.twaStream(in.toDS())
      .writeStream.outputMode("append").format("memory").queryName("twa").start()
    // user 7: 10 held 1 min, 20 held 3 min (closed by the batch-2 event);
    // the final reading stays open in state and contributes nothing yet
    in.addData(Ev(1, ts(0), 7, "r", 10.0), Ev(2, ts(1), 7, "r", 20.0))
    q.processAllAvailable()
    in.addData(Ev(3, ts(4), 7, "r", 99.0))
    q.processAllAvailable()
    // a LATE event in a later batch (older than the open hold) must be
    // dropped, not allowed to fabricate a negative duration
    in.addData(Ev(4, ts(2), 7, "r", 55.0))
    q.processAllAvailable()
    q.stop()
    val holds = spark.table("twa").as[EventsStream.HoldOut].collect()
    assert(holds.map(h => (h.dur_us, h.value)).toSet ==
      Set((60000000L, 10.0), (180000000L, 20.0)))
    val twa = holds.map(h => h.value * h.dur_us).sum / holds.map(_.dur_us).sum
    assert(twa == (10.0 * 1 + 20.0 * 3) / 4) // ≡ the batch an_twa math
  }

  test("sessionize metrics observe gap closes and late-event clamps") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    val in = MemoryStream[Ev]
    val metrics = EventsStream.SessionStreamMetrics(spark)
    val q = EventsStream.sessionize(in.toDS(), gapMinutes = 30,
        idleTimeout = false, metrics = Some(metrics))
      .writeStream.outputMode("append").format("memory").queryName("sessm").start()
    // batch 1: open a session for user 7 ending at t=10
    in.addData(Ev(1, ts(0), 7, "click", 1.0), Ev(2, ts(10), 7, "click", 2.0))
    q.processAllAvailable()
    // batch 2: a cross-batch straggler inside the open session (t=5 <
    // end=10) must clamp, not rewind the end
    in.addData(Ev(3, ts(5), 7, "view", 1.0))
    q.processAllAvailable()
    // batch 3: 90-min gap closes session 1 and opens session 2
    in.addData(Ev(4, ts(100), 7, "view", 4.0))
    q.processAllAvailable()
    q.stop()
    assert(metrics.lateEventClamps.value == 1,
      s"one straggler expected, saw ${metrics.lateEventClamps.value}")
    assert(metrics.gapCloses.value == 1,
      s"one gap close expected, saw ${metrics.gapCloses.value}")
    assert(metrics.idleFlushes.value == 0, "no timeout configured")
    // the closed session absorbed the straggler: 3 events, value 4.0
    val closed = spark.table("sessm")
      .select("user_id", "session_id", "n_events", "session_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(closed.contains((7L, 1L, 3L, 4.0)))
  }

  test("sessionizeEventTime: native session_window, stream equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventsStream.sessionizeEventTime(in.toDF(), "30 minutes", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("sessw").start()
    val evs = Seq(
      Ev(1, ts(0), 7, "click", 1.0), Ev(2, ts(10), 7, "click", 2.0),
      Ev(3, ts(5), 8, "view", 4.0))
    in.addData(evs: _*)
    q.processAllAvailable()
    // 90-min-later event closes user 7's first session; the high ts
    // also advances the watermark past both early session closes
    val late = Ev(4, ts(100), 7, "view", 8.0)
    in.addData(late)
    q.processAllAvailable()
    // one more batch so the previous batch's watermark emits finals
    in.addData(Ev(5, ts(300), 9, "click", 0.0))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessw")
      .select("user_id", "n_events", "session_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed.contains((7L, 2L, 3.0)), s"user 7 session 1 missing from $streamed")
    assert(streamed.contains((8L, 1L, 4.0)), s"user 8 session missing from $streamed")
    // the SAME operator over the same rows as a batch DataFrame agrees
    // on every closed session (batch emits open ones too)
    val batch = EventsStream.sessionizeEventTime((evs :+ late).toDF(), "30 minutes")
      .select("user_id", "n_events", "session_value")
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed.subsetOf(batch), s"stream $streamed not within batch $batch")
  }

  test("intervalJoin matches right events inside the lookback window only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    clicks.addData(Ev(1, ts(60), 7, "click", 0.0), Ev(2, ts(60), 8, "click", 0.0))
    purchases.addData(
      Ev(100, ts(40), 7, "purchase", 5.0),  // 20 min before → matches
      Ev(101, ts(0), 7, "purchase", 9.0),   // 60 min before → outside 30-min lookback
      Ev(102, ts(61), 8, "purchase", 7.0))  // after the click → no match
    val q = EventsStream.intervalJoin(
        clicks.toDF(), purchases.toDF(), "user_id", "ts", "ts",
        lookback = "30 minutes", watermark = "2 hours")
      .select(col("event_id"), col("r_event_id"))
      .writeStream.outputMode("append").format("memory").queryName("ij").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("ij").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 100L)))
  }

  test("toSink lands each micro-batch through the fallback sink chain") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_sink").toString
    val in = MemoryStream[Ev]
    val failing = new graft.etl.Load.Sink {
      def write(d: org.apache.spark.sql.DataFrame): Unit =
        throw new RuntimeException("remote down")
    }
    val chain = graft.etl.Load.FallbackSink(Seq(
      failing,
      graft.etl.Load.ParquetSink(s"$tmp/out",
        mode = org.apache.spark.sql.SaveMode.Append)), retriesPerSink = 0)
    val q = EventsStream.toSink(in.toDF(), chain, s"$tmp/ckpt")
    in.addData(Ev(1, ts(0), 1, "click", 1.0), Ev(2, ts(1), 2, "view", 2.0))
    q.processAllAvailable()
    in.addData(Ev(3, ts(2), 3, "click", 3.0))
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(s"$tmp/out").count() == 3)
  }

  test("minhashCandidatesStream emits cross-batch candidate pairs from band state") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 40) "CHANGED" else s"w$i").mkString(" ")
    val far = (100 to 140).map(i => s"v$i").mkString(" ")
    val in = MemoryStream[(Long, String)]
    val q = EventsStream.minhashCandidatesStream(
        in.toDF().toDF("doc_id", "text"), "text", "doc_id", idleTimeout = false)
      .writeStream.outputMode("append").format("memory").queryName("mhcand").start()
    in.addData((1L, base), (3L, far))
    q.processAllAvailable()
    in.addData((2L, near)) // later batch: must pair with doc 1 via band state
    q.processAllAvailable(); q.stop()
    val pairs = spark.table("mhcand").select("doc_a", "doc_b")
      .distinct().as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("spanDecontamStream: scrambled micro-batch slicing reproduces the batch span stats") {
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir).filter($"doc_id" < 120)
      .select("doc_id", "text").as[(Long, String)].collect()
    val bench = graft.text.Decontam.gramWindows(
        Tables.documents(spark, sfDir).filter($"doc_id" < 20), "text", "doc_id")
      .select("h").distinct().persist()
    val corpus = docs.filter(_._1 >= 20)
    val expected = graft.text.Decontam.spanStats(
        corpus.toSeq.toDF("doc_id", "text"), bench, "text", "doc_id")
      .select("doc_id", "n_windows", "n_contam", "max_run")
      .as[(Long, Long, Long, Long)].collect().toSet
    // scrambled arrival: deterministic shuffle, ragged slice sizes
    val scrambled = corpus.sortBy(d => (d._1 * 2654435761L) % 97)
    val slices = scrambled.grouped(17).toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft_span_ckpt").toString
    val in = MemoryStream[(Long, String)]
    val landed = scala.collection.mutable.ArrayBuffer[Array[(Long, Long, Long, Long)]]()
    val q = EventsStream.spanDecontamStream(
        in.toDF().toDF("doc_id", "text"), bench, "text", "doc_id", tmp) { out =>
      landed += out.select("doc_id", "n_windows", "n_contam", "max_run")
        .as[(Long, Long, Long, Long)].collect()
    }
    slices.foreach { sl => in.addData(sl); q.processAllAvailable() }
    q.stop()
    val got = landed.flatten.toSet
    assert(got == expected, "union of per-batch span stats must equal the batch run")
    // every doc scored exactly once (no cross-batch duplication)
    assert(landed.flatten.map(_._1).distinct.length == landed.flatten.length)
    bench.unpersist()
  }

  test("minhash band state survives a checkpoint restart and stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    val tmp = java.nio.file.Files.createTempDirectory("graft_mh_ckpt").toString
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val in = MemoryStream[(Long, String)]
    val metrics = EventsStream.MinHashStreamMetrics(spark)
    val got = java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(Long, Long), java.lang.Boolean])
    // foreachBatch sink: unlike the memory sink it supports recovery
    def start() = EventsStream.minhashCandidatesStream(
        in.toDF().toDF("doc_id", "text"), "text", "doc_id",
        idleTimeout = false, maxBucketIds = 4, metrics = Some(metrics))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[EventsStream.CandPair], _: Long) =>
        b.collect().foreach(p => got.add((p.doc_a, p.doc_b))); ()
      }
      .start()
    // batch 1: four identical docs fill every band bucket to the cap
    val q1 = start()
    in.addData((1L, base), (2L, base), (3L, base), (4L, base))
    q1.processAllAvailable(); q1.stop()
    // restart from the checkpoint: the versioned state store must
    // remember the full buckets...
    val q2 = start()
    in.addData((5L, base), (6L, base))
    q2.processAllAvailable(); q2.stop()
    import scala.jdk.CollectionConverters._
    val pairs = got.asScala.toSet
    // ...so docs 5/6 are refused by the hot-band breaker instead of
    // pairing — had state been lost, (5,6) would land in fresh buckets
    // and emit. Membership stays ≤ maxBucketIds for the bucket's life.
    assert(pairs == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    assert(metrics.hotBandDrops.value > 0, "drops must be observable")
  }

  test("nearDupStream drops simhash-identical docs within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    in.addData(
      (1L, ts(0), "the quick brown fox jumps over the lazy dog"),
      (2L, ts(1), "the quick brown fox jumps over the lazy dog"), // exact dup
      (3L, ts(2), "dog lazy the over jumps fox brown quick the"), // same word SET → same simhash
      (4L, ts(3), "completely different text about spark engines"))
    val q = EventsStream.nearDupStream(
        in.toDF().toDF("doc_id", "ts", "text"), "text", "ts")
      .writeStream.outputMode("append").format("memory").queryName("neardup").start()
    q.processAllAvailable(); q.stop()
    val kept = spark.table("neardup").select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept.length == 2)
    assert(kept.contains(4L))
  }

  test("enrich joins each micro-batch against the static dim by broadcast") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    in.addData(
      Ev(1, ts(0), 7, "click", 1.0), Ev(2, ts(1), 8, "view", 2.0),
      Ev(3, ts(2), 99, "click", 3.0)) // user 99 missing from the dim
    val dim = Seq((7L, "GOLD"), (8L, "SILVER")).toDF("user_id", "tier")
    val q = EventsStream.enrich(in.toDF(), dim, "user_id")
      .writeStream.outputMode("append").format("memory").queryName("enriched").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("enriched").select("event_id", "tier")
      .as[(Long, Option[String])].collect().toMap
    assert(out == Map(1L -> Some("GOLD"), 2L -> Some("SILVER"), 3L -> None))
  }

  test("toUpsertSink lands CDC batches as latest-wins merges per partition") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val dir = s"$tmp/tbl"
    val in = MemoryStream[(Long, String, Int, Long)] // k, dt, v, version
    val q = EventsStream.toUpsertSink(
      in.toDF().toDF("k", "dt", "v", "ver"), dir,
      keyCols = Seq("k"), partitionCol = "dt", versionCol = "ver",
      checkpointDir = s"$tmp/ckpt")
    in.addData((1L, "d1", 10, 1L), (2L, "d1", 20, 1L), (3L, "d2", 30, 1L))
    q.processAllAvailable()
    // batch 2: update k=2 (two versions in one batch — max ver wins),
    // insert k=4 into the untouched d2
    in.addData((2L, "d1", 21, 2L), (2L, "d1", 22, 3L), (4L, "d2", 40, 1L))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(dir).select("k", "dt", "v")
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "d1", 10), (2L, "d1", 22), (3L, "d2", 30), (4L, "d2", 40)),
      s"got $got")
  }

  test("funnelStream: a late earlier view retroactively rescues a buffered click") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    val in = MemoryStream[Ev]
    val q = EventsStream.funnelStream(in.toDS())
      .writeStream.outputMode("append").format("memory").queryName("funl").start()
    // batch 1: click@10 and purchase@15 arrive BEFORE any eligible view
    in.addData(Ev(1, ts(10), 1, "click", 0), Ev(2, ts(15), 1, "purchase", 0),
      Ev(3, ts(20), 1, "view", 0))
    q.processAllAvailable()
    val mid = spark.table("funl").orderBy(desc("epoch")).head()
    assert(mid.isNullAt(mid.fieldIndex("c_ts")),
      "click@10 predates view@20 — not yet eligible")
    // batch 2: a LATE view@5 makes click@10 (and then purchase@15) eligible
    in.addData(Ev(4, ts(5), 1, "view", 0))
    q.processAllAvailable(); q.stop()
    val fin = spark.table("funl").orderBy(desc("epoch")).head()
    assert(fin.getAs[Long]("v_ts") == ts(5).getTime
      && fin.getAs[Long]("c_ts") == ts(10).getTime
      && fin.getAs[Long]("p_ts") == ts(15).getTime,
      s"buffered candidates must re-qualify when the min view drops: $fin")
  }

  test("funnelStream over shuffled micro-batches equals the batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    val evs = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().toSeq
    // batch reference: min view, min click >= view, min purchase >= click
    val batch = evs.groupBy(_.user_id).map { case (u, es) =>
      val v = es.filter(_.event_type == "view").map(_.ts.getTime).minOption
      val c = v.flatMap(vt => es.filter(e => e.event_type == "click" && e.ts.getTime >= vt)
        .map(_.ts.getTime).minOption)
      val p = c.flatMap(ct => es.filter(e => e.event_type == "purchase" && e.ts.getTime >= ct)
        .map(_.ts.getTime).minOption)
      u -> (v, c, p)
    }
    // two adversarial arrival orders × different micro-batch slicings
    val orderings = Seq(
      ("fwd", evs.sortBy(e => (e.event_id * 2654435761L) % 1000003), 3),
      ("rev", evs.sortBy(e => -e.ts.getTime), 5)) // time-reversed: every view late
    orderings.foreach { case (tag, mixed, k) =>
      val in = MemoryStream[Ev]
      val q = EventsStream.funnelStream(in.toDS())
        .writeStream.outputMode("append").format("memory").queryName(s"funl_$tag").start()
      mixed.grouped((mixed.size + k - 1) / k).foreach { b =>
        in.addData(b); q.processAllAvailable()
      }
      q.stop()
      val streamed = spark.table(s"funl_$tag")
        .groupBy("user_id").agg(max(struct(col("epoch"), col("v_ts"), col("c_ts"), col("p_ts"))).as("m"))
        .select(col("user_id"), col("m.v_ts"), col("m.c_ts"), col("m.p_ts"))
        .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
        .map { case (u, v, c, p) => u -> (v, c, p) }.toMap
      assert(streamed == batch,
        s"stream funnel must equal the batch funnel under the '$tag' arrival order")
    }
  }

  test("property: funnelStream is arrival-order invariant on random event soups") {
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    import org.scalacheck.Gen
    (1 to 4).foreach { seed =>
      val evGen = for {
        u <- Gen.chooseNum(1L, 3L)
        t <- Gen.chooseNum(0, 60)
        ty <- Gen.oneOf("view", "click", "purchase", "error")
      } yield (u, t, ty)
      val raw = Gen.listOfN(24, evGen)
        .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed.toLong))
        .getOrElse(Nil)
      val evs = raw.zipWithIndex.map { case ((u, t, ty), i) =>
        Ev(i.toLong, ts(t), u, ty, 0.0) }
      val batch = evs.groupBy(_.user_id).map { case (u, es) =>
        val v = es.filter(_.event_type == "view").map(_.ts.getTime).minOption
        val c = v.flatMap(vt => es.filter(e => e.event_type == "click" && e.ts.getTime >= vt)
          .map(_.ts.getTime).minOption)
        val p = c.flatMap(ct => es.filter(e => e.event_type == "purchase" && e.ts.getTime >= ct)
          .map(_.ts.getTime).minOption)
        u -> (v, c, p)
      }
      val arrival = new scala.util.Random(seed).shuffle(evs)
      val in = MemoryStream[Ev]
      val q = EventsStream.funnelStream(in.toDS())
        .writeStream.outputMode("append").format("memory").queryName(s"funlp_$seed").start()
      arrival.grouped(7).foreach { b => in.addData(b); q.processAllAvailable() }
      q.stop()
      val streamed = spark.table(s"funlp_$seed")
        .groupBy("user_id").agg(max(struct(col("epoch"), col("v_ts"), col("c_ts"), col("p_ts"))).as("m"))
        .select(col("user_id"), col("m.v_ts"), col("m.c_ts"), col("m.p_ts"))
        .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
        .map { case (u, v, c, p) => u -> (v, c, p) }.toMap
      assert(streamed == batch, s"seed=$seed arrival=$arrival")
    }
  }

  test("driftStream flags a skewed micro-batch and passes a conforming one") {
    implicit val sqlCtx = spark.sqlContext
    val ref = Map("view" -> 0.5, "click" -> 0.5)
    val got = scala.collection.mutable.ArrayBuffer.empty[EventsStream.DriftOut]
    val in = MemoryStream[Ev]
    val q = EventsStream.driftStream(in.toDF(), ref, got.synchronized { got += _ })
    // batch 0 conforms to the reference exactly
    in.addData((1 to 40).map(i =>
      Ev(i, ts(i), i % 7, if (i % 2 == 0) "view" else "click", 1.0)))
    q.processAllAvailable()
    // batch 1: all purchases — a type the reference has never seen
    in.addData((41 to 80).map(i => Ev(i, ts(i), i % 7, "purchase", 1.0)))
    q.processAllAvailable(); q.stop()
    val byBatch = got.sortBy(_.batch_id)
    assert(byBatch.size == 2)
    assert(byBatch(0).chi2 < 1.0, s"conforming batch must score ~0: ${byBatch(0)}")
    assert(byBatch(1).chi2 > 100.0, s"novel-type batch must blow up: ${byBatch(1)}")
  }

  test("psiStream scores the an_psi banded statistic per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    // reference histogram: 50 rows in band 0, 50 in band 1 (bandCents
    // 100 → band = floor(value)); built exactly as the batch an_psi
    // banding would
    val ref = Map(0L -> 50L, 1L -> 50L)
    val got = scala.collection.mutable.ArrayBuffer.empty[EventsStream.PsiOut]
    val in = MemoryStream[Ev]
    val q = EventsStream.psiStream(in.toDF(), ref, bandCents = 100L,
      got.synchronized { got += _ })
    // batch 0 conforms exactly: 20 rows band 0, 20 rows band 1 → PSI 0
    in.addData((1 to 40).map(i =>
      Ev(i, ts(i), i % 7, "view", if (i % 2 == 0) 0.5 else 1.5)))
    q.processAllAvailable()
    // batch 1: all mass in band 0 → band 1 one-sided (50 ref rows
    // skipped), PSI = (1.0 − 0.5)·ln(1.0/0.5)
    in.addData((41 to 80).map(i => Ev(i, ts(i), i % 7, "view", 0.25)))
    q.processAllAvailable()
    // batch 2: a band the reference never saw (value 7.3 → band 7) is
    // skipped with its own row mass counted
    in.addData(Seq(Ev(81, ts(81), 3, "view", 0.25), Ev(82, ts(82), 3, "view", 7.3)))
    q.processAllAvailable(); q.stop()
    val byBatch = got.sortBy(_.batch_id)
    assert(byBatch.size == 3)
    assert(byBatch(0) == EventsStream.PsiOut(0, 40, 2, 0, 0.0))
    assert(byBatch(1).n_bands_used == 1 && byBatch(1).n_rows_skipped == 50)
    assert(math.abs(byBatch(1).psi - 0.5 * math.log(2.0)) < 1e-12, s"${byBatch(1)}")
    // batch 2: band 0 two-sided; band 1 (50 ref) + band 7 (1 obs) skipped
    assert(byBatch(2).n_bands_used == 1 && byBatch(2).n_rows_skipped == 51)
    // batch parity: replaying the reference itself scores PSI 0
    val got2 = scala.collection.mutable.ArrayBuffer.empty[EventsStream.PsiOut]
    val in2 = MemoryStream[Ev]
    val q2 = EventsStream.psiStream(in2.toDF(), ref, bandCents = 100L,
      got2.synchronized { got2 += _ })
    in2.addData((1 to 100).map(i =>
      Ev(i, ts(i), i % 7, "view", if (i <= 50) 0.5 else 1.5)))
    q2.processAllAvailable(); q2.stop()
    assert(got2.head == EventsStream.PsiOut(0, 100, 2, 0, 0.0))
  }

  test("cdcStream converges to the batch compaction under shuffled micro-batches") {
    import EventsStream.{CdcOp, CdcRow}
    implicit val sqlCtx = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    // the SAME manufactured change log as etl_cdc_compact, scrambled
    // across micro-batches by a deterministic hash — arrival order and
    // batch slicing must not matter
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("cents"))
      .as[(Long, String, Long)].collect()
    val log = (base.map { case (k, st, c) => CdcOp(k, 1, "I", Some(st), Some(c)) }
      ++ base.filter(_._1 % 5 == 0).map { case (k, _, c) =>
        CdcOp(k, 2, "U", Some("U"), Some(c + 100)) }
      ++ base.filter(_._1 % 7 == 0).map { case (k, _, _) =>
        CdcOp(k, 3, "D", None, None) })
      .sortBy(op => (op.k * 2654435761L + op.seq * 40503L) % 104729)
    val in = MemoryStream[CdcOp]
    val q = EventsStream.cdcStream(in.toDS()).writeStream
      .outputMode("update").format("memory").queryName("cdc").start()
    log.grouped(math.max(1, log.length / 3 + 1)).foreach { slice =>
      in.addData(slice); q.processAllAvailable()
    }
    q.stop()
    val finalState = spark.table("cdc").as[CdcRow].collect()
      .groupBy(_.k).map { case (_, rs) => rs.maxBy(_.seq) }
      .filter(_.live).toSeq
    val got = finalState.groupBy(_.st.get).map { case (st, rs) =>
      (st, rs.size.toLong, rs.map(_.cents.get).sum, rs.map(_.k).sum)
    }.toSet
    val want = SparkEntry.queries("etl_cdc_compact")(spark, sfDir)
      .select("st", "n", "cents_sum", "key_sum")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == want, "streamed materialization must equal batch compaction")
  }

  test("latenessStream matches the batch lateness audit under prefix slicing") {
    import graft.streaming.EventsStream.{LateEvent, LatenessRow}
    implicit val sqlCtx = spark.sqlContext
    implicit val ss = spark
    // arrival order = event_id; event times wander back and forth so
    // several arrivals are late against the running high-water-mark
    val evs = Seq(
      LateEvent(1, 1, 1000L), LateEvent(1, 2, 3000L), LateEvent(1, 3, 2000L),
      LateEvent(2, 4, 500L), LateEvent(1, 5, 3000L), LateEvent(2, 6, 400L),
      LateEvent(1, 7, 2500L), LateEvent(2, 8, 9000L), LateEvent(2, 9, 100L),
      LateEvent(1, 10, 4000L))
    // batch reference: per-user fold in arrival order
    val want = evs.groupBy(_.user_id).map { case (u, es) =>
      var hwm = Long.MinValue; var n = 0L; var nLate = 0L; var mx = 0L; var sm = 0L
      es.sortBy(_.event_id).foreach { e =>
        val late = if (hwm != Long.MinValue && hwm > e.ts_us) hwm - e.ts_us else 0L
        hwm = math.max(hwm, e.ts_us); n += 1
        if (late > 0) nLate += 1
        mx = math.max(mx, late); sm += late
      }
      u -> ((n, nLate, mx, sm))
    }
    val in = MemoryStream[LateEvent]
    val q = graft.streaming.EventsStream.latenessStream(in.toDS())
      .writeStream.outputMode("update").format("memory").queryName("lateq").start()
    // three PREFIX slices of the arrival sequence
    in.addData(evs.take(4): _*); q.processAllAvailable()
    in.addData(evs.slice(4, 7): _*); q.processAllAvailable()
    in.addData(evs.drop(7): _*); q.processAllAvailable()
    q.stop()
    // last emitted row per user is the cumulative audit
    val got = spark.table("lateq").as[LatenessRow].collect()
      .groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n_events) }
    want.foreach { case (u, (n, nLate, mx, sm)) =>
      val r = got(u)
      assert(r.n_events == n && r.n_late == nLate &&
        r.max_late_us == mx && r.sum_late_us == sm,
        s"user $u: stream $r vs batch ($n, $nLate, $mx, $sm)")
    }
  }

  test("heavyHittersStream: exact under capacity, Space-Saving guarantees past it") {
    import graft.streaming.EventsStream.HeavyHitter
    implicit val sqlCtx = spark.sqlContext
    // skewed key soup: two genuine heavy hitters over a uniform tail,
    // arrival order scrambled by a deterministic hash
    val soup: Seq[Long] = Seq.fill(1000)(1L) ++ Seq.fill(500)(2L) ++
      (3L to 40L).flatMap(k => Seq.fill(15)(k))
    val scrambled = soup.zipWithIndex
      .sortBy { case (k, i) => (k * 2654435761L + i * 40503L) % 104729 }.map(_._1)
    val exact = soup.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    def run(capacity: Int, slices: Int): Seq[HeavyHitter] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[HeavyHitter])]
      val in = MemoryStream[Long]
      val q = graft.streaming.EventsStream.heavyHittersStream(
        in.toDF().withColumnRenamed("value", "k"), "k", capacity,
        (id, hh) => got.synchronized { got += id -> hh })
      scrambled.grouped((scrambled.size + slices - 1) / slices).foreach { s =>
        in.addData(s); q.processAllAvailable()
      }
      q.stop()
      got.maxBy(_._1)._2
    }
    // capacity ≥ distinct keys: no eviction anywhere → the stream IS
    // the exact count table, identically under 1-batch and 4-batch runs
    val one = run(64, 1)
    val sliced = run(64, 4)
    assert(one == sliced, "exact regime must be slicing-invariant")
    assert(one.map(h => h.key -> h.count).toMap == exact && one.forall(_.err == 0))
    // capacity 8 over 40 keys: eviction fires; the Space-Saving
    // guarantees must survive cross-batch merging — every key with
    // true count > n/capacity present, count bounds the truth from
    // both sides for every surviving counter
    val n = soup.size
    val small = run(8, 4)
    val present = small.map(_.key).toSet
    exact.foreach { case (k, c) =>
      if (c > n / 8) assert(present(k), s"heavy key $k (true $c > ${n / 8}) evicted") }
    small.foreach { h =>
      val t = exact(h.key)
      assert(t <= h.count && h.count - h.err <= t,
        s"bounds broken for ${h.key}: true $t, count ${h.count}, err ${h.err}")
    }
  }

  test("hllDistinctStream: prefix estimates equal the batch HLL bit-for-bit") {
    import graft.functions.Sketches
    implicit val sqlCtx = spark.sqlContext
    val m = 64
    // ~2.6k distinct keys with repeats, arrival scrambled
    val keys: Seq[Long] = (1L to 3000L).map(k => k * 7919 % 2609)
    val scrambled = keys.zipWithIndex
      .sortBy { case (k, i) => (k * 2654435761L + i) % 104729 }.map(_._1)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val in = MemoryStream[Long]
    val q = graft.streaming.EventsStream.hllDistinctStream(
      in.toDF().withColumnRenamed("value", "k"), "k", m,
      (id, est) => got.synchronized { got += id -> est })
    var fed = Vector.empty[Long]
    scrambled.grouped((scrambled.size + 3) / 4).zipWithIndex.foreach { case (s, i) =>
      in.addData(s); q.processAllAvailable()
      fed = fed ++ s
      // the library BATCH path over the same prefix — distributed
      // registers, exact harmonic sum, identical alpha literal
      val batchEst = Sketches.hllRegisters(fed.toDF("k"), col("k"), m)
        .agg(Sketches.hllZScaled(m))
        .select(Sketches.hllEstimate(m, col("z_scaled")).as("est"))
        .head().getLong(0)
      val streamEst = got.synchronized { got.maxBy(_._1)._2 }
      assert(streamEst == batchEst,
        s"prefix ${i + 1}: stream $streamEst != batch $batchEst")
    }
    q.stop()
    // sanity: the final estimate is in the HLL error band of the truth
    val truth = keys.distinct.size.toDouble
    val fin = got.maxBy(_._1)._2.toDouble
    assert(math.abs(fin - truth) / truth < 0.4, s"estimate $fin vs true $truth")
  }

  test("cmsStream: prefix probe estimates equal the batch CMS exactly") {
    import graft.functions.Sketches
    implicit val sqlCtx = spark.sqlContext
    val width = 32 // narrow: force collisions so the overestimate path is real
    val keys: Seq[Long] = Seq.fill(800)(42L) ++ Seq.fill(300)(7L) ++
      (1L to 500L).map(k => k * 6151 % 997)
    val scrambled = keys.zipWithIndex
      .sortBy { case (k, i) => (k * 2654435761L + i) % 104729 }.map(_._1)
    val probes = Seq(42L, 7L, 13L, 999983L) // heavy, heavy, tail, never-seen-ish
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[Long, Long])]
    val in = MemoryStream[Long]
    val q = graft.streaming.EventsStream.cmsStream(
      in.toDF().withColumnRenamed("value", "k"), "k", probes, width,
      (id, est) => got.synchronized { got += id -> est })
    var fed = Vector.empty[Long]
    scrambled.grouped((scrambled.size + 2) / 3).zipWithIndex.foreach { case (s, i) =>
      in.addData(s); q.processAllAvailable()
      fed = fed ++ s
      val batchEst = Sketches.cmsEstimate(
          Sketches.cmsCells(fed.toDF("k"), col("k"), width),
          probes.toDF("k"), col("k"), width)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val streamEst = got.synchronized { got.maxBy(_._1)._2 }
      assert(streamEst == batchEst, s"prefix ${i + 1}: $streamEst != $batchEst")
    }
    q.stop()
    // CMS guarantee on the final state: never an underestimate
    val fin = got.maxBy(_._1)._2
    val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .withDefaultValue(0L)
    probes.foreach(p => assert(fin(p) >= truth(p),
      s"CMS underestimated $p: ${fin(p)} < ${truth(p)}"))
  }

  test("kllQuantileStream: exact regime is slicing-invariant; compaction regime holds the certified bound") {
    import graft.functions.{KllSketch, KllSummary}
    implicit val sqlCtx = spark.sqlContext
    // 600 values with ties, scrambled arrival
    val vals: Seq[Double] = (1 to 600).map(i => (i * 7919 % 211).toDouble)
    val scrambled = vals.zipWithIndex
      .sortBy { case (v, i) => (v.toLong * 2654435761L + i) % 104729 }.map(_._1)
    val probes = Seq(10.0, 50.0, 105.0, 200.0, 500.0)
    def trueRank(prefix: Seq[Double], x: Double): Long = prefix.count(_ <= x).toLong
    def run(k: Int, slices: Int, checkExact: Boolean): KllSummary = {
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, KllSummary)]
      val in = MemoryStream[Double]
      val q = graft.streaming.EventsStream.kllQuantileStream(
        in.toDF().withColumnRenamed("value", "v"), "v", k,
        (id, s) => got.synchronized { got += id -> s })
      var fed = Vector.empty[Double]
      scrambled.grouped((scrambled.size + slices - 1) / slices).foreach { s =>
        in.addData(s); q.processAllAvailable()
        fed = fed ++ s
        val sum = got.synchronized { got.maxBy(_._1)._2 }
        assert(sum.n == fed.size, s"n ${sum.n} != fed ${fed.size}")
        probes.foreach { p =>
          val est = KllSketch.rank(sum, p)
          val tr = trueRank(fed, p)
          if (checkExact)
            assert(est == tr, s"exact regime: rank($p) $est != $tr after ${fed.size}")
          else
            assert(math.abs(est - tr) <= sum.errBound,
              s"certified bound broken: rank($p) $est vs $tr, bound ${sum.errBound}")
        }
      }
      q.stop()
      got.maxBy(_._1)._2
    }
    // k ≥ n: no compaction anywhere → exact ranks after every prefix,
    // identical under 1-slice and 4-slice runs
    val one = run(1024, 1, checkExact = true)
    val sliced = run(1024, 4, checkExact = true)
    assert(one.errBound == 0 && sliced.errBound == 0)
    assert(one.items == sliced.items, "exact regime must be slicing-invariant")
    // k = 16 over 600 values: compactions fire per batch AND at merges;
    // the certified bound must survive cross-batch merging
    val small = run(16, 5, checkExact = false)
    assert(small.errBound > 0, "compaction regime must have fired")
    assert(small.items.map(_.weight).sum == vals.size,
      "compaction must preserve total weight")
    // quantile inverse stays within the bound too: the median estimate's
    // true rank is within errBound + maxWeight of n/2
    val med = KllSketch.quantile(small, 0.5)
    val trueR = trueRank(scrambled, med)
    val maxW = small.items.map(_.weight).max
    assert(math.abs(trueR - vals.size / 2) <= small.errBound + maxW,
      s"median $med true rank $trueR vs ${vals.size / 2}, bound ${small.errBound}+$maxW")
  }

  test("weightedSampleStream: prefix samples equal the batch weightedSample exactly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // ids with spread-out weights; arrival scrambled
    val rows: Seq[(Long, Double)] = (1L to 500L).map(i =>
      (i * 7919 % 4093) -> (1.0 + (i * 31 % 97).toDouble))
    val scrambled = rows.zipWithIndex
      .sortBy { case ((id, _), i) => (id * 2654435761L + i) % 104729 }.map(_._1)
    def batchSample(prefix: Seq[(Long, Double)]): Seq[(Long, Double)] =
      graft.operators.Sampling.weightedSample(
          prefix.toDF("id", "w"), col("id"), col("w"), 25)
        .select(col("id"), col("priority")).as[(Long, Double)].collect().toSeq
    def run(slices: Int): Seq[(Long, Double)] = {
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[(Long, Double)])]
      val in = MemoryStream[(Long, Double)]
      val q = graft.streaming.EventsStream.weightedSampleStream(
        in.toDF().toDF("id", "w"), "id", "w", 25,
        (id, s) => got.synchronized { got += id -> s })
      var fed = Vector.empty[(Long, Double)]
      scrambled.grouped((scrambled.size + slices - 1) / slices).foreach { s =>
        in.addData(s); q.processAllAvailable()
        fed = fed ++ s
        val stream = got.synchronized { got.maxBy(_._1)._2 }
        val batch = batchSample(fed)
        assert(stream == batch,
          s"prefix ${fed.size}: stream sample != batch sample\n$stream\n$batch")
      }
      q.stop()
      got.maxBy(_._1)._2
    }
    val one = run(1)
    val sliced = run(4)
    assert(one == sliced, "final sample must be slicing-invariant")
    assert(one.size == 25)
  }

  test("conformalStream flags equal the batch residual computation after every prefix") {
    import graft.streaming.EventsStream.{ConformalDay, ConformalFit}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // synthetic (ts, value) rows across 40 days, scrambled arrival,
    // values sized so some day totals fall outside the fixed interval
    val base = java.sql.Timestamp.valueOf("1995-03-01 00:00:00")
    val rows: Seq[(java.sql.Timestamp, Double)] = (0 until 800).map { i =>
      val day = i % 40
      val ts = new java.sql.Timestamp(base.getTime + day * 86400000L + (i % 7) * 3600000L)
      (ts, 50.0 + (i * 13 % 29).toDouble + (if (day % 11 == 0) 40.0 else 0.0))
    }
    val scrambled = rows.zipWithIndex
      .sortBy { case (_, i) => (i * 2654435761L) % 104729 }.map(_._1)
    val fit = ConformalFit(slope = 2.0, icept = 100000.0, qhat = 60000.0)
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[ConformalDay])]
    val in = MemoryStream[(java.sql.Timestamp, Double)]
    val q = graft.streaming.EventsStream.conformalStream(
      in.toDF().toDF("ts", "value"), fit,
      (id, days) => got.synchronized { got += id -> days })
    var fed = Vector.empty[(java.sql.Timestamp, Double)]
    scrambled.grouped((scrambled.size + 3) / 4).zipWithIndex.foreach { case (s, i) =>
      in.addData(s); q.processAllAvailable()
      fed = fed ++ s
      // batch recomputation over the same prefix with identical arithmetic
      val batch = fed.toDF("ts", "value")
        .groupBy(date_trunc("day", col("ts")).as("day"),
          datediff(date_trunc("day", col("ts")).cast("date"),
            lit("1992-01-01").cast("date")).cast("long").as("d"))
        .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("v"))
        .withColumn("resid", col("v").cast("double") - fit.icept - lit(fit.slope) * col("d").cast("double"))
        .withColumn("outside", abs(col("resid")) > fit.qhat)
        .select(col("d"), col("v"), col("outside"))
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      val stream = got.synchronized { got.maxBy(_._1)._2 }
        .map(c => (c.d, c.v, c.outside)).sortBy(_._1)
      assert(stream == batch, s"prefix ${i + 1}: stream flags != batch flags")
    }
    q.stop()
    val fin = got.maxBy(_._1)._2
    assert(fin.exists(_.outside) && fin.exists(!_.outside),
      "test data must exercise both sides of the interval")
  }

  test("spcStream gates micro-batches against broadcast whole-history limits (batch parity)") {
    import org.apache.spark.sql.expressions.Window
    import graft.streaming.EventsStream.{SpcDay, SpcLimits}
    implicit val sqlCtx = spark.sqlContext
    val evs = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev].collect().toSeq
    // whole-history limits, SPARK-computed (the an_spc_rules m / an_xmr
    // st aggregates over the events daily series) — an independent
    // expression path from the stream's driver-side fold
    val daily = Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("v"))
    val mrF = daily.withColumn("mr",
      abs(col("v") - lag(col("v"), 1).over(Window.orderBy(col("day")))))
    val st = mrF.agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(38,0)")).as("sx"),
        sum((col("v").cast("decimal(38,0)") * col("v")).cast("decimal(38,0)"))
          .cast("double").as("s2"),
        sum(col("mr").cast("decimal(38,0)")).as("smr"),
        count(col("mr")).as("nmr"))
      .collect().head
    val limits = SpcLimits(st.getLong(0),
      st.getDecimal(1).doubleValue(), st.getDouble(2),
      st.getLong(0), BigInt(st.getDecimal(1).toBigInteger),
      BigInt(st.getDecimal(3).toBigInteger), st.getLong(4))
    def run(tag: String, slices: Seq[Seq[Ev]]): Seq[SpcDay] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[SpcDay])]
      val in = MemoryStream[Ev]
      val q = graft.streaming.EventsStream.spcStream(in.toDF(), limits,
        (id, days) => buf.synchronized { buf += id -> days })
      slices.foreach { s => in.addData(s); q.processAllAvailable() }
      q.stop()
      buf.maxBy(_._1)._2
    }
    // slicing invariance: one batch ≡ four hash-scrambled micro-batches
    val oneShot = run("one", Seq(evs))
    val sliced = run("sliced",
      evs.sortBy(e => (e.event_id * 2654435761L) % 1000003)
        .grouped((evs.size + 3) / 4).toSeq)
    assert(oneShot == sliced, "final SPC frame must not depend on batch slicing")
    // Western-Electric parity vs the batch an_spc_rules query (whose
    // limits ARE the whole-history moments; z there is round(·,6))
    val batch = SparkEntry.queries("an_spc_rules")(spark, sfDir)
      .select(col("day"), col("z"), col("rule1_beyond_3sd"), col("rule2_two_of_three_2sd"))
      .as[(java.sql.Timestamp, Double, Boolean, Boolean)].collect().toSeq
      .sortBy(_._1.getTime)
    assert(oneShot.size == batch.size && oneShot.nonEmpty)
    oneShot.zip(batch).foreach { case (s, (d, z, r1, r2)) =>
      assert(s.day == d && s.rule1_beyond_3sd == r1 && s.rule2_two_of_three_2sd == r2,
        s"WE flags drifted: stream $s vs batch ($d, $z, $r1, $r2)")
      assert(math.abs(s.z - z) < 1e-6, s"z drifted: stream ${s.z} vs batch $z")
    }
    // XmR parity: the exact integer boundary replayed as Spark
    // expressions over the daily frame (the an_xmr arithmetic)
    val expXmr = mrF.crossJoin(broadcast(
        mrF.agg(count(lit(1)).as("n"), sum(col("v").cast("decimal(38,0)")).as("sx"),
          sum(col("mr").cast("decimal(38,0)")).as("smr"), count(col("mr")).as("nmr"))))
      .select(col("day"),
        (abs(col("v").cast("decimal(38,0)") * col("n") - col("sx")) * 100 * col("nmr") >
          col("smr").cast("decimal(38,0)") * 266 * col("n")).as("viol"))
      .as[(java.sql.Timestamp, Boolean)].collect().toMap
    oneShot.foreach(s => assert(s.xmr_violation == expXmr(s.day),
      s"XmR flag drifted on ${s.day}: stream ${s.xmr_violation}"))
  }

  // ---- r19: change-detector twins (r18 verdict #6) — parity against
  // the REGISTERED batch queries, not a re-derivation: the stream is
  // fed the batch day spine itself (rev_c back to dollars; the 2-dp
  // decimal cast recovers the cents exactly) in three slices, and the
  // final emission must equal the an_snht / an_cusum_sq rows.

  private def spineEvents(): Seq[(java.sql.Timestamp, Double)] =
    SparkEntry.dailyRevenueSpine(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("day"),
        org.apache.spark.sql.functions.col("rev_c"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1) / 100.0)).toSeq

  private def feedSliced[O](rows: Seq[(java.sql.Timestamp, Double)], name: String)
                           (start: (org.apache.spark.sql.DataFrame, O => Unit) => org.apache.spark.sql.streaming.StreamingQuery): O = {
    val src = java.nio.file.Files.createTempDirectory(name).toString
    val got = collection.mutable.ArrayBuffer.empty[O]
    val q = start(spark.readStream.schema("ts TIMESTAMP, value DOUBLE").parquet(src),
      o => got.synchronized { got += o })
    val third = rows.size / 3
    Seq(rows.take(third), rows.slice(third, 2 * third), rows.drop(2 * third))
      .foreach { slice =>
        slice.toDF("ts", "value").coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
      }
    q.stop()
    got.synchronized { got.last }
  }

  test("snhtStream: fed the batch day spine in slices, the final emission equals the registered an_snht row") {
    val got = feedSliced[EventsStream.SnhtOut](spineEvents(), "snht_src") {
      (in, cb) => EventsStream.snhtStream(in, cb)
    }
    val exp = SparkEntry.queries("an_snht")(spark, sfDir).collect().head
    assert(got.n == exp.getAs[Long]("n"))
    assert(got.argmax_day == exp.getAs[Long]("argmax_day"),
      s"argmax day: stream ${got.argmax_day} vs batch ${exp.getAs[Long]("argmax_day")}")
    assert(got.t_max == exp.getAs[Double]("t_max"),
      s"t_max must be bit-identical: stream ${got.t_max} vs batch ${exp.getAs[Double]("t_max")}")
  }

  test("cusumSqStream: fed the batch day spine in slices, the final emission equals the registered an_cusum_sq row") {
    val got = feedSliced[EventsStream.CusumSqOut](spineEvents(), "cusq_src") {
      (in, cb) => EventsStream.cusumSqStream(in, cb)
    }
    val exp = SparkEntry.queries("an_cusum_sq")(spark, sfDir).collect().head
    assert(got.n == exp.getAs[Long]("n"))
    assert(got.argmax_day == exp.getAs[Long]("argmax_day"),
      s"argmax day: stream ${got.argmax_day} vs batch ${exp.getAs[Long]("argmax_day")}")
    assert(got.cusum_sq_stat == exp.getAs[Double]("cusum_sq_stat"),
      s"statistic must be bit-identical: stream ${got.cusum_sq_stat} vs batch ${exp.getAs[Double]("cusum_sq_stat")}")
  }
}

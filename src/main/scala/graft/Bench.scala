package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Host/JVM fingerprint snapshot (r16 verdict #2): the one number
    * that moved the wrong way in r16 (+4.2% driver vs −8% dev, under
    * machine-verified zero plan drift) was unattributable because the
    * artifact carried nothing about the machine state. Snapshot
    * load/steal/GC before and after the run so a code-vs-environment
    * delta question answers itself from the artifact. */
  final case class EnvSnap(load1: Double, stealTicks: Long, totalTicks: Long,
                           gcMs: Long)
  private def procFile(path: String): Seq[String] =
    try {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().toList finally src.close()
    } catch { case _: Throwable => Nil }
  def envSnap(): EnvSnap = {
    val load1 = procFile("/proc/loadavg").headOption
      .flatMap(_.split("\\s+").headOption).flatMap(_.toDoubleOption).getOrElse(-1.0)
    // /proc/stat first line: cpu user nice system idle iowait irq softirq steal ...
    val cpu = procFile("/proc/stat").headOption.map(_.split("\\s+").drop(1)
      .flatMap(_.toLongOption)).getOrElse(Array.empty[Long])
    val steal = if (cpu.length > 7) cpu(7) else -1L
    val total = if (cpu.nonEmpty) cpu.sum else -1L
    val gc = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    EnvSnap(load1, steal, total, gc)
  }
  /** Compact env block for the driver-facing line: cpu model + current
    * MHz, logical processors, 1-min load before/after, steal share of
    * the run's cpu ticks, total JVM GC seconds, and what main this JVM
    * was launched as (an in-process sbt shares the heap/JIT with the
    * bench; a forked java does not). */
  def envField(pre: EnvSnap, post: EnvSnap): String = {
    val info = procFile("/proc/cpuinfo")
    val model = info.find(_.startsWith("model name")).map(_.split(":").last.trim)
      .getOrElse("unknown").replaceAll("\"", "").take(40)
    val mhz = info.find(_.startsWith("cpu MHz")).map(_.split(":").last.trim)
      .flatMap(_.toDoubleOption).getOrElse(-1.0)
    val stealPct =
      if (pre.stealTicks < 0 || post.totalTicks <= pre.totalTicks) -1.0
      else 100.0 * (post.stealTicks - pre.stealTicks) / (post.totalTicks - pre.totalTicks).toDouble
    val cmd = sys.props.getOrElse("sun.java.command", "?").split("\\s+").head
    val heapGb = Runtime.getRuntime.maxMemory / (1 << 30)
    s""""env":{"cpu":"$model","mhz":${ms(mhz)},"procs":${Runtime.getRuntime.availableProcessors},""" +
      s""""load1":[${ms(pre.load1)},${ms(post.load1)}],"steal_pct":${ms(stealPct)},""" +
      s""""gc_s":${ms((post.gcMs - pre.gcMs) / 1000.0)},"heap_gb":$heapGb,"main":"$cmd"}"""
  }

  /** Per-query physical-plan fingerprint for the measured-vs-carried
    * protocol (r17 verdict #6): md5 of the canonicalized sparkPlan
    * string (exprIds normalized) with scratch paths masked (write-path
    * queries plan over fresh temp dirs every run). A query whose
    * fingerprint differs from the carry file's is re-measured; equal
    * fingerprint + outside the heavy tail + outside the rotating
    * sample ⇒ the carried median is reused, cutting the board's
    * ~40 sbt-minutes to the queries whose timing can actually have
    * changed. */
  def planHash(df: org.apache.spark.sql.DataFrame): String = {
    val raw =
      try df.queryExecution.sparkPlan.canonicalized.toString
      catch { case _: Throwable => df.queryExecution.sparkPlan.toString }
    val masked = raw
      .replaceAll("/tmp/[^\\s,)\\]}]+", "/tmp/X")
      .replaceAll("file:[^\\s,)\\]}]*", "file:X")
      // JVM-assigned identities: lambda classes (mapPartitions codecs,
      // RDD-backed cores) and object hash suffixes differ per JVM — a
      // hash built on them re-measures ~55 stable plans every run
      .replaceAll("\\$\\$Lambda[$/][0-9a-fx$/.]+", "\\$\\$Lambda")
      .replaceAll("@[0-9a-f]{6,}", "@X")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(masked.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
  }

  /** Compact summary of the paired pinned-jar A/B artifact (absent →
    * empty string; nonempty results end with a trailing comma so the
    * caller can splice them between fields). */
  def pairedField(path: String): String = {
    val f = new java.io.File(path)
    if (!f.exists()) return ""
    val txt =
      try { val src = scala.io.Source.fromFile(f); try src.mkString finally src.close() }
      catch { case _: Throwable => return "" }
    def num(k: String): Option[String] =
      ("\"" + k + "\": ?(-?[0-9.eE]+)").r.findFirstMatchIn(txt).map(_.group(1))
    (for {
      mr <- num("median_ratio"); n <- num("n_queries")
      over <- num("n_over_1\\.2"); mx <- num("max_ratio"); mn <- num("min_ratio")
    } yield s""""paired_vs_r17":{"n":$n,"median_ratio":$mr,"min_ratio":$mn,""" +
      s""""max_ratio":$mx,"n_over_1.2":$over,"file":"$path"},""").getOrElse("")
  }

  /** One carried measurement: median/spread, the plan fingerprint it
    * was measured under, the testdata generation it was measured
    * AGAINST (r18 advice #2: a carried median from a previous
    * generation must be visible as such — regeneration masquerading as
    * regression was the r10 attribution hazard), and the fingerprint of
    * the key's implementing source file at measure time (r18 verdict
    * #4: a same-plan runtime regression — an eval-loop change in a
    * native expression, a partitioner choice the plan string doesn't
    * show — re-measures immediately instead of hiding until the
    * rotating sample lands on it). */
  final case class CarryEntry(med: Double, spread: Double, planHash: String,
                              gen: String, src: String)

  /** Minimal JSON reader for the flat carry file (no JSON lib on the
    * main classpath): parses {"queries":{name:{"med":x,"spread":y,
    * "plan_hash":"h"[,"gen":"g"][,"src":"s"]},...}} with a regex over
    * one-entry-per-match; pre-r19 entries lack gen/src and parse with
    * both empty (→ stale by definition, re-measured once). */
  def readCarry(path: String): Map[String, CarryEntry] = {
    val f = new java.io.File(path)
    if (!f.exists()) return Map.empty
    val txt = scala.io.Source.fromFile(f).mkString
    val entry = ("\"([a-z0-9_]+)\":\\{\"med\":([-0-9.eE]+),\"spread\":([-0-9.eE]+)," +
      "\"plan_hash\":\"([0-9a-f]+)\"" +
      "(?:,\"gen\":\"([0-9a-f]*)\")?(?:,\"src\":\"([0-9a-f]*)\")?\\}").r
    entry.findAllMatchIn(txt).map { m =>
      m.group(1) -> CarryEntry(m.group(2).toDouble, m.group(3).toDouble,
        m.group(4), Option(m.group(5)).getOrElse(""), Option(m.group(6)).getOrElse(""))
    }.toMap
  }

  /** key → fingerprint of its implementing source file (r18 verdict
    * #4). Parses the registry wiring in SparkEntry.scala
    * (`"key" -> (method _)`) and locates each method's defining entry
    * file, so a key re-measures whenever the file that implements it
    * changed since its last measurement — the diff-keyed trigger that
    * closes the same-plan-runtime-regression blind spot while keeping
    * the carry's ~60% cost saving. Source-tree access is the dev/driver
    * reality (sbt runs from the repo root); when sources are absent
    * (bare-jar run) the map is empty and the trigger inert. */
  def srcFingerprints(): Map[String, String] = try {
    val root = new java.io.File("src/main/scala/graft")
    if (!root.isDirectory) return Map.empty
    def read(f: java.io.File) =
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val entryDir = Option(new java.io.File(root, "entry").listFiles())
      .getOrElse(Array.empty[java.io.File]).filter(_.getName.endsWith(".scala"))
    val files = entryDir :+ new java.io.File(root, "SparkEntry.scala")
    val texts = files.map(f => f.getName -> read(f)).toMap
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val fileHash = texts.map { case (n, t) => n -> h(t) }
    val defFile = scala.collection.mutable.Map.empty[String, String]
    texts.foreach { case (n, t) =>
      "def ([A-Za-z0-9]+)\\(".r.findAllMatchIn(t)
        .foreach(m => if (!defFile.contains(m.group(1))) defFile(m.group(1)) = n)
    }
    "\"([a-z0-9_]+)\" -> \\(([A-Za-z0-9]+) _\\)".r
      .findAllMatchIn(texts("SparkEntry.scala")).map { m =>
        m.group(1) -> defFile.get(m.group(2)).map(fileHash).getOrElse("")
      }.toMap
  } catch { case _: Throwable => Map.empty }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val envPre = envSnap()
    // the engine's real posture (AQE + coalescing + skew handling +
    // graft extensions) — benching a stripped-down session measured a
    // configuration no user would run
    val spark = Engine.session(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt,
      inputBytes = Engine.inputBytes(sfDir))
    // session warmup: JIT/codegen/shuffle/parquet-reader init so the
    // first timed query isn't charged the one-time machinery cost. Runs
    // over the 5-row region table — class-loading warmup, not data
    // caching of anything a benched query scans meaningfully.
    spark.range(1000000).selectExpr("sum(id)").collect()
    val warm = spark.read.parquet(s"$sfDir/region.parquet")
    warm.join(warm.groupBy("r_regionkey").count(), "r_regionkey")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("r_regionkey")
          .orderBy("count")))
      .collect()
    // touch the remaining operator families once (ObjectHashAggregate /
    // percentile, Expand / explode+sequence, BroadcastExchange,
    // count_distinct) — class-loading only, still 5 rows
    warm.selectExpr("percentile(r_regionkey, 0.5)", "count(distinct r_regionkey)",
      "approx_count_distinct(r_regionkey)").collect()
    warm.selectExpr("explode(sequence(1, 3)) AS x").groupBy("x").count().collect()
    warm.join(org.apache.spark.sql.functions.broadcast(
      warm.select("r_regionkey")), "r_regionkey").collect()
    // one count() per table: pulls the parquet files through the OS page
    // cache once so the first timed query per table isn't charged the
    // cold-read cost its peers don't pay (query order is map-iteration
    // order, so which query paid it was arbitrary run to run). Spark
    // caches nothing here — no .cache(), results discarded.
    Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    locally {
      val es = spark.newSession()
      es.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      es.read.parquet(s"$sfDir/events.parquet").count()
    }
    // dev knobs: ONLY=comma-list to subset, REPEAT=n to override the
    // per-query attempt count. Default is 3 attempts, keep the MEDIAN
    // (round-11 verdict #4): each attempt is fully cache-isolated (see
    // isolate()), the median rejects both the one-off JVM/scheduler
    // stall (which min also rejected) AND the lucky-fast outlier min
    // kept, and the recorded per-query spread (max−min) makes the
    // ±0.3 s noise band visible instead of polluting round-over-round
    // comparisons.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    val gen = generationTag(sfDir)

    // measured-vs-carried protocol (r17 verdict #6): a query is
    // re-measured when its plan fingerprint drifted from the carry
    // file, when it sits in the heavy tail (carried med ≥ CARRY_BAR —
    // the tail is where regressions matter and noise is largest, so it
    // is measured EVERY round), or when it falls in the rotating ~20%
    // sample (keyed on name + testdata generation, which changes per
    // round — every query is re-measured at least every ~5 rounds even
    // with a stable plan). Everything else carries its last measured
    // median, marked as carried in the artifact. SPARK_GRAFT_FULL=1
    // disables carrying (the full-measure protocol, used to regenerate
    // the carry file).
    val carryPath = sys.env.getOrElse("SPARK_GRAFT_CARRY", "scripts/bench_carry.json")
    val fullRun = sys.env.get("SPARK_GRAFT_FULL").contains("1")
    val carry = if (fullRun) Map.empty[String, CarryEntry]
                else readCarry(carryPath)
    // diff-keyed trigger (r18 verdict #4): current per-key implementing-
    // file fingerprints; empty when sources are unavailable (trigger
    // inert — plan drift / tail / rotation still apply)
    val srcNow = srcFingerprints()
    val carryBar = sys.env.getOrElse("SPARK_GRAFT_CARRY_BAR", "1.0").toDouble
    def rotSample(name: String): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      (md.digest((name + gen).getBytes("UTF-8"))(0) & 0xff) % 5 == 0
    }
    // per-query isolation (outside the timed region): drop every cached
    // block the previous query left behind — dedup builders persist
    // shingle frames, connectedComponents leaves its final label RDD —
    // so query N+1 neither pays for nor profits from query N's blocks.
    // (r4 lesson: leaked MEMORY_AND_DISK frames drifted the whole board
    // 1.55×.) The GC keeps heap pressure from one query's tenured
    // garbage leaking into the next query's time.
    def isolate(): Unit = {
      graft.dedup.Dedup.releaseCaches()
      graft.operators.PrefixSum.releaseCaches()
      spark.catalog.clearCache()
      // BLOCKING unpersist (r15): with blocking=false the predecessor's
      // blocks drain asynchronously UNDER the next query's first
      // attempts — unified-memory eviction pressure that showed up as
      // pass-1 attempts 2-4x slower than the same query's post-warmup
      // tail re-runs (an_rfm 8.0/4.5/4.0 vs 1.9/1.9, gc 328 ms vs 33).
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      if (!sys.env.contains("SPARK_GRAFT_NOGC")) System.gc()
    }
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // record=false → a discarded warmup: its timing is dropped AND its
    // failure is NOT bookkept (a run the protocol says doesn't count
    // must not be able to flag the query as failed — the recorded
    // attempts right after it will fail on their own if the defect is
    // real)
    def attempt(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
                record: Boolean = true): (Double, Long) = {
      isolate()
      val g0 = gcMillis
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case _: Throwable => if (record) failed += name; -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      val gc = gcMillis - g0
      val tag = if (record) "" else " (warmup, discarded)"
      System.err.println(f"[bench] $name%-24s ${dt}%8.2fs gc=${gc}%5dms$tag")
      (dt, gc)
    }
    // pass 1: every query at the base attempt count, preceded by ONE
    // discarded warm attempt (r15 verdict #6): the artifact proved the
    // residual pass-1 outliers are cold-code displacement — a query's
    // first attempt runs with its JIT state evicted by the hundreds of
    // queries since the session warmup (q_graph_summary 5.9/5.1/4.8
    // cold vs 2.0/1.7 warm) — so the warm attempt absorbs the
    // compilation transient and the recorded medians match dedicated
    // re-run medians. SPARK_GRAFT_WARM=0 skips it (fast dev subsets).
    // GC collection time is recorded PER ATTEMPT (parallel vector) so a
    // 3× outlier is attributable to GC vs scheduler from the artifact
    // alone.
    val warmPass1 = sys.env.getOrElse("SPARK_GRAFT_WARM", "1") != "0"
    val attempts = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Double]]
    val gcs = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Long]]
    // pass 0: plan fingerprints + the measure/carry split. Building the
    // DataFrame runs any eager (model-fit / digest) construction once;
    // isolate() right after keeps that out of the next measurement.
    val hashes = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val carriedRes = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Double)]
    val toMeasure = scala.collection.mutable.LinkedHashMap.empty[String, (SparkSession, String) => org.apache.spark.sql.DataFrame]
    // measured-set reconciliation (r18 verdict #4): per-reason counts so
    // the artifact distinguishes WHY each key was re-measured — first
    // matching reason wins in priority order new > drift > src_diff >
    // tail > rotation — plus how many carried entries are stale-gen
    // (measured against a previous testdata generation; marked, and
    // refreshed by rotation within ~5 rounds)
    val reasons = scala.collection.mutable.LinkedHashMap(
      "new" -> 0, "drift" -> 0, "src_diff" -> 0, "tail" -> 0, "rotation" -> 0)
    var carriedStaleGen = 0
    selected.foreach { case (name, fn) =>
      val ph = try planHash(fn(spark, sfDir)) catch { case _: Throwable => "err" }
      hashes(name) = ph
      if (sys.env.contains("SPARK_GRAFT_PRINT_HASHES"))
        System.err.println(s"[planhash] $name $ph")
      // REHASH mode: refresh every entry's plan hash under the current
      // masking WITHOUT re-measuring (used after a masking change — the
      // meds stay, only the drift keys change)
      val rehash = sys.env.get("SPARK_GRAFT_REHASH_CARRY").contains("1")
      carry.get(name) match {
        case Some(ce) if rehash =>
          carriedRes(name) = (ce.med, ce.spread)
          isolate()
        case Some(ce) =>
          val srcDiff = srcNow.get(name).exists(now => now.nonEmpty && now != ce.src)
          val drifted = ce.planHash != ph || ph == "err"
          val inTail = ce.med >= carryBar
          val rotated = rotSample(name)
          if (drifted || srcDiff || inTail || rotated) {
            toMeasure(name) = fn
            val why = if (drifted) "drift" else if (srcDiff) "src_diff"
                      else if (inTail) "tail" else "rotation"
            reasons(why) += 1
          } else {
            carriedRes(name) = (ce.med, ce.spread)
            if (ce.gen != gen) carriedStaleGen += 1
            isolate()
          }
        case None =>
          toMeasure(name) = fn
          if (carry.nonEmpty) reasons("new") += 1
      }
    }
    if (carry.nonEmpty)
      System.err.println(s"[bench] carry: ${carriedRes.size} carried " +
        s"($carriedStaleGen stale-gen), ${toMeasure.size} measured " +
        reasons.map { case (k, v) => s"$k=$v" }.mkString("(", " ", ")"))
    toMeasure.foreach { case (name, fn) =>
      if (warmPass1) attempt(name, fn, record = false)
      val rs = (1 to repeat).map(_ => attempt(name, fn)).toVector
      attempts(name) = rs.map(_._1); gcs(name) = rs.map(_._2)
    }
    def medOf(ts: Vector[Double]): Double = {
      val s = ts.sorted
      // lower median for even attempt counts (dev REPEAT=2 → min,
      // matching the old protocol for subset runs)
      s((s.size - 1) / 2)
    }
    // pass 2 (r13 verdict #4): the slow tail carries 3–5 s per-query
    // spread on this box, which swamps round-over-round deltas at
    // median-of-3 — re-run the TAIL_N slowest (by pass-1 median) up to
    // TAIL_REPEAT total attempts so the recorded medians there are
    // median-of-5. Cost: ~40 extra attempts over the queries that
    // need them, not 2×388 over the fast majority that doesn't.
    val tailRepeat = sys.env.getOrElse("SPARK_GRAFT_TAIL_REPEAT", "5").toInt
    val tailN = sys.env.getOrElse("SPARK_GRAFT_TAIL_N", "20").toInt
    if (tailRepeat > repeat && attempts.nonEmpty) {
      val tail = attempts.toSeq.sortBy { case (_, ts) => -medOf(ts) }.take(tailN).map(_._1)
      tail.foreach { name =>
        val fn = selected(name)
        // one DISCARDED warm attempt first (r14 verdict #2): the tail
        // re-runs land minutes after the query's pass-1 attempts, with
        // other queries' code paths having displaced its JIT state —
        // the first re-run attempt was systematically the 3× outlier
        // (q_pagerank 14.6 s on a 1-exchange plan). Warm, don't record.
        attempt(name, fn, record = false)
        val rs = (attempts(name).size until tailRepeat).map(_ => attempt(name, fn))
        attempts(name) ++= rs.map(_._1); gcs(name) ++= rs.map(_._2)
      }
    }
    val measured = attempts.map { case (name, ts) =>
      name -> (medOf(ts), ts.max - ts.min)
    }
    val results = measured ++ carriedRes
    // the dispersion outlier, named with its RAW attempts AND their GC
    // times (not just the aggregate max) so a round-over-round delta on
    // the heavy tail is attributable from the artifact without a judge
    // re-run — a slow attempt with matching gc_ms is collector noise, one
    // without is a scheduler event
    val worst = attempts.toSeq.sortBy { case (_, ts) => ts.min - ts.max }.headOption
      .map { case (n, ts) => (n, ts: Seq[Double], gcs(n): Seq[Long]) }
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    // full per-query line first (for logs/humans — medians AND spreads),
    // then the bounded line LAST: the driver keeps only the final ~2000
    // chars of stdout and parses the last JSON line in them. With 90+
    // queries the full line outgrew that tail (round 5 lost all
    // per-query telemetry to exactly this), so the driver-facing line
    // caps itself — slowest queries first, the fast remainder rolled up
    // under "omitted", per-query spreads summarized as an aggregate
    // dispersion block.
    val protocol = (if (warmPass1) "warm1+" else "") +
      (if (tailRepeat > repeat) s"median-of-$repeat+tail$tailN@$tailRepeat"
       else s"median-of-$repeat") +
      (if (carriedRes.nonEmpty) s"+carry(bar=${ms(carryBar)}s,rot=20%)" else "")
    val qs = results.map { case (k, (v, sp)) =>
      "\"" + k + "\":{\"med\":" + ms(v) + ",\"spread\":" + ms(sp) +
        (if (carriedRes.contains(k)) ",\"carried\":true" else "") + "}"
    }.mkString("{", ",", "}")
    val allErrs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val env = envField(envPre, envSnap())
    // carried-vs-measured split (r17 verdict #6): the total always
    // reconciles (measured_sec + carried_sec), and a reader can see
    // exactly how much of the board was timed THIS run
    val carryField =
      if (carry.isEmpty) ""
      else s""""carry":{"measured":${measured.size},"carried":${carriedRes.size},""" +
        s""""carried_stale_gen":$carriedStaleGen,""" +
        reasons.map { case (k, v) => s""""$k":$v""" }.mkString("\"reasons\":{", ",", "},") +
        s""""measured_sec":${ms(measured.values.map(_._1).sum)},""" +
        s""""carried_sec":${ms(carriedRes.values.map(_._1).sum)}},"""
    // paired pinned-jar A/B summary (r17 verdict #1): the dev-session
    // artifact scripts/paired_vs_r17.json carries the full per-query
    // pairs; its summary is embedded so the driver-facing artifact
    // answers code-vs-host in-band
    val paired = pairedField(sys.env.getOrElse("SPARK_GRAFT_PAIRED",
      "scripts/paired_vs_r17.json"))
    println(s"""{"metric":"total","value":${ms(total)},"unit":"sec","protocol":"$protocol","testdata_generation":"$gen",$env,$carryField$paired"queries":$qs,"errors":$allErrs,"sf":"$sfDir"}""")
    println(boundedLine(total, results.toSeq.map { case (k, (v, _)) => (k, v) },
      failed.toSeq, sfDir, gen,
      spreads = results.values.map(_._2).toSeq, protocol = protocol,
      worstSpread = worst,
      envField = (env + "," + carryField + paired).stripSuffix(",")))
    // carry-file regeneration: measured queries land fresh entries
    // (med/spread/plan hash), carried queries keep their last measured
    // values — run with SPARK_GRAFT_FULL=1 SPARK_GRAFT_WRITE_CARRY=1
    // for a from-scratch file
    if (sys.env.get("SPARK_GRAFT_WRITE_CARRY").contains("1")) {
      // MERGE into the existing file (a subset run must extend the
      // carry, never shrink it): this run's results win per key,
      // untouched keys keep their prior entries verbatim
      val rehash = sys.env.get("SPARK_GRAFT_REHASH_CARRY").contains("1")
      val prior = readCarry(carryPath)
      val merged = prior ++ results.map { case (k, (v, sp)) =>
        // carried entries keep their measured-time metadata (plan hash
        // unless rehashing, generation, src fingerprint); measured
        // entries stamp all three fresh
        val ce =
          if (carriedRes.contains(k))
            carry(k).copy(med = v, spread = sp,
              planHash = if (rehash) hashes.getOrElse(k, "err") else carry(k).planHash)
          else CarryEntry(v, sp, hashes.getOrElse(k, "err"), gen,
            srcNow.getOrElse(k, ""))
        k -> ce
      }
      val entries = merged.toSeq.sortBy(_._1).map { case (k, ce) =>
        s""""$k":{"med":${ms(ce.med)},"spread":${ms(ce.spread)},""" +
          s""""plan_hash":"${ce.planHash}","gen":"${ce.gen}","src":"${ce.src}"}"""
      }.mkString(",")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(carryPath),
        s"""{"generated":"$gen","queries":{$entries}}""")
      System.err.println(s"[bench] carry file written: $carryPath " +
        s"(${merged.size} entries, ${results.size} from this run)")
    }
    spark.stop()
  }

  /** Fingerprint of the testdata generation the bench ran against —
    * file sizes of every table folded through md5. The driver
    * regenerates testdata between rounds; round-over-round comparisons
    * are only valid within one tag (the r10 verdict's attribution
    * problem: a regeneration mid-round masqueraded as a regression). */
  def generationTag(sfDir: String): String = {
    val sizes = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      .map { t =>
        val f = new java.io.File(s"$sfDir/$t.parquet")
        // parquet may be a file or a directory of part files
        val len =
          if (f.isDirectory) f.listFiles().map(_.length()).sum else f.length()
        s"$t=$len"
      }.mkString(",")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(sizes.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
  }

  def ms(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** The driver-facing JSON line, guaranteed ≤ `MaxLineChars` so it fits
    * the driver's 2000-char stdout tail alongside sbt's ~75-char epilogue.
    * Queries are emitted slowest-first until the budget is spent; the
    * remainder is summarized as {"omitted":{"n":…,"sec":…}} so the total
    * always reconciles with the listed entries. Error names are capped
    * the same way (first `ErrBudgetChars` worth listed, the rest rolled
    * into "errors_omitted"), and the omitted-suffix width is computed
    * from the ACTUAL dropped entries, not a guessed reserve — so the
    * bound holds for any query count, any error count, any magnitude.
    */
  val MaxLineChars = 1750
  val ErrBudgetChars = 300
  def boundedLine(total: Double, results: Seq[(String, Double)],
                  failed: Seq[String], sfDir: String,
                  generation: String = "",
                  spreads: Seq[Double] = Nil, protocol: String = "",
                  worstSpread: Option[(String, Seq[Double], Seq[Long])] = None,
                  envField: String = ""): String = {
    // aggregate dispersion of the median-of-N protocol: max and mean
    // per-query spread, how many queries moved more than the 0.3 s
    // noise band, AND the argmax-spread query with its raw attempt
    // times (r13 verdict #4: the aggregate alone left the heavy tail's
    // deltas unattributable) — kept compact so the bounded line's char
    // budget still lists the slow tail
    val dispField =
      if (spreads.isEmpty) ""
      else {
        val m = spreads.max
        val avg = spreads.sum / spreads.size
        val over = spreads.count(_ > 0.3)
        val worstField = worstSpread.map { case (n, ts, gs) =>
          s""","worst":{"q":"$n","attempts":[${ts.map(ms).mkString(",")}],"gc_ms":[${gs.mkString(",")}]}"""
        }.getOrElse("")
        s""""protocol":"$protocol","dispersion":{"max_spread":${ms(m)},"mean_spread":${ms(avg)},"n_over_0.3s":$over$worstField},"""
      }
    // errors: list names until the error budget is spent, count the rest
    val errKept = scala.collection.mutable.ArrayBuffer.empty[String]
    var errLen = 0
    failed.foreach { n =>
      if (errLen + n.length + 3 <= ErrBudgetChars) { errKept += n; errLen += n.length + 3 }
    }
    val errsOmitted = failed.size - errKept.size
    val errField = errKept.map("\"" + _ + "\"").mkString("[", ",", "]") +
      (if (errsOmitted > 0) s""","errors_omitted":$errsOmitted""" else "")
    val genField = if (generation.isEmpty) "" else s""""testdata_generation":"$generation","""
    val envF = if (envField.isEmpty) "" else envField + ","
    val head = s"""{"metric":"total","value":${ms(total)},"unit":"sec",$genField$envF$dispField"n_queries":${results.size},"errors":$errField,"sf":"$sfDir","queries":{"""
    val sorted = results.sortBy { case (_, t) => -t }
    val entries = sorted.map { case (k, v) => "\"" + k + "\":" + ms(v) }
    // exact-width packing: the candidate line for `k` kept entries uses
    // the true omitted suffix for THOSE dropped entries, so no reserve
    // guess can undershoot (the r7 hazard: 6-digit omitted seconds)
    def lineFor(k: Int): String =
      head + entries.take(k).mkString(",") + {
        val om = sorted.drop(k)
        s"""},"omitted":{"n":${om.size},"sec":${ms(om.map(_._2).sum)}}}"""
      }
    var kept = entries.length
    while (kept > 0 && lineFor(kept).length > MaxLineChars) kept -= 1
    lineFor(kept)
  }
}

package graft

import org.apache.spark.sql.SparkSession

/** Heavy-tail scale probe under a BOUNDED driver heap (r17 verdict #2):
  * runs the named queries (SPARK_GRAFT_ONLY, default: the ~25 most
  * expensive plans — graph iteration, dedup clustering, sim reranks)
  * against a scale-probe dataset (gen_scale_probe.py sf1/sf10 copies)
  * inside a deliberately small JVM, sampling heap usage at 50 ms so the
  * artifact records the MEASURED peak alongside per-key success. The
  * claim under test: no driver-sized state grows with SF — the
  * iteration/clustering tail runs in the same bounded heap at 1000×
  * the driver correctness SF, completing or failing LOUD (an OOM here
  * is a finding, not a flake).
  *
  * Usage: `runMain graft.ScaleProbe <sfDir> <outJson>` with -Xmx set by
  * the caller (the probe records Runtime.maxMemory as the cap). */
object ScaleProbe {

  private val DefaultKeys = Seq(
    "q_label_prop", "sim_lsh_rerank", "dedup_clusters_star", "q_pagerank",
    "text_ngram_novelty", "q_shortest_path", "sim_pq", "dedup_substring",
    "text_pmi_collocations", "q_bfs_layers", "q_two_hop", "q_hits",
    "sim_range_search", "dedup_keep_best", "dedup_clusters",
    "q_clustering_coeff", "sim_mmr", "q_triangles", "text_contaminate_spans",
    "an_rfm", "sim_lsh_auto", "q_assortativity", "q_kcore", "text_bpe_train",
    "dedup_incremental")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val outJson = args.lift(1).getOrElse("/tmp/scale_probe.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    // shuffle-partition sizing is part of the contract under test — and
    // since r19 it is the ENGINE's contract, not the probe's: Engine
    // .session sizes AQE initialPartitionNum from the INPUT BYTES
    // (ceil(bytes/8MiB), floored at shufflePartitions, capped at
    // 8×cores) so reduce aggregates start at spill-safe parallelism and
    // coalesce down (the q_two_hop sf10 finding: OOM at a static 32,
    // green at 128; the size-derived count at sf10 is 218). The probe
    // passes the same inputBytes the Bench/Verify mains do, so it
    // certifies the sizing the production session actually runs; the
    // env override remains a dev knob only.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32").toInt
    val spark = Engine.session(s"local[$cpus]", shufflePartitions = shuffle,
      inputBytes = Engine.inputBytes(sfDir))
    spark.sparkContext.setLogLevel("ERROR")
    val keys = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
      .getOrElse(DefaultKeys)
    val capMb = Runtime.getRuntime.maxMemory >> 20

    // 50 ms heap sampler: records the max observed used-heap per key.
    // (Pool peak counters over-count — peaks of different pools are not
    // simultaneous; a sampled whole-heap max is the honest number.)
    val peak = new java.util.concurrent.atomic.AtomicLong(0)
    @volatile var sampling = true
    val mem = java.lang.management.ManagementFactory.getMemoryMXBean
    val sampler = new Thread(() => {
      while (sampling) {
        val used = mem.getHeapMemoryUsage.getUsed
        peak.updateAndGet(p => math.max(p, used))
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true); sampler.start()

    def isolate(): Unit = {
      graft.dedup.Dedup.releaseCaches()
      graft.operators.PrefixSum.releaseCaches()
      SparkEntry.kmeansIntModels.clear()
      SparkEntry.pqIntModels.clear()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    keys.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None =>
          rows += s""""$name":{"status":"unknown-key"}"""; failed += name
        case Some(fn) =>
          isolate()
          peak.set(0)
          val t0 = System.nanoTime()
          val r =
            try {
              val n = fn(spark, sfDir).count()
              val dt = (System.nanoTime() - t0) / 1e9
              val pk = peak.get >> 20
              System.err.println(f"[probe] $name%-24s ok    ${dt}%8.1fs rows=$n%-9d peak=${pk}MB")
              s""""$name":{"status":"ok","rows":$n,"sec":${Bench.ms(dt)},"peak_heap_mb":$pk}"""
            } catch { case e: Throwable =>
              failed += name
              val dt = (System.nanoTime() - t0) / 1e9
              val pk = peak.get >> 20
              val msg = String.valueOf(e.getMessage).replaceAll("[\"\\\\\n\r\t]", " ").take(160)
              System.err.println(f"[probe] $name%-24s FAIL  ${dt}%8.1fs peak=${pk}MB $msg")
              s""""$name":{"status":"fail","sec":${Bench.ms(dt)},"peak_heap_mb":$pk,"error":"$msg"}"""
            }
          rows += r
      }
    }
    sampling = false
    val gen = Bench.generationTag(sfDir)
    val line =
      s"""{"metric":"scale_probe","sf":"$sfDir","testdata_generation":"$gen",""" +
        s""""heap_cap_mb":$capMb,"cpus":$cpus,"n":${keys.size},"ok":${keys.size - failed.size},""" +
        s""""fail":${failed.map(k => "\"" + k + "\"").mkString("[", ",", "]")},""" +
        s""""keys":{${rows.mkString(",")}}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), line)
    println(line)
    spark.stop()
  }
}

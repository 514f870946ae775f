package graft

/** Pins the engine's spill-aware shuffle-sizing posture (r18 verdict #1).
  *
  * FULLVERIFY_sf10_heavy_r18 measured the hazard this spec guards: at
  * 1000× the driver correctness SF, q_two_hop's reduce aggregate OOMs a
  * bounded 8 GiB heap when shuffles run at a static 32 partitions
  * (~4M rows concentrated per task) and completes at 128. The fix must
  * live in Engine.session — every caller, not just ScaleProbe's env
  * default — as AQE's `coalescePartitions.initialPartitionNum`: shuffles
  * START at max(8×cores, shufflePartitions) and AQE coalesces DOWN, so
  * small-SF plans keep few tasks while large-SF reduces never
  * concentrate. The sf10 completion itself is certified by the
  * FULLVERIFY_sf10_heavy artifact (re-run each round with no
  * SPARK_GRAFT_SHUFFLE override since r19); this spec pins the conf so a
  * refactor cannot silently drop it.
  */
class EngineConfSpec extends SparkSpec {

  test("Engine.session sets AQE initialPartitionNum = max(8×cores, shufflePartitions)") {
    // the shared test session: local[4], shufflePartitions=4 → initial 32
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == "4")
    assert(spark.conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum") == "32",
      "initialPartitionNum must be 8×cores for local[4] (the spill-aware floor)")
  }

  test("initialPartitions sizing arithmetic covers the master-string forms") {
    assert(Engine.coresOf("local[16]") == 16)
    assert(Engine.coresOf("local[2,3]") == 2)
    assert(Engine.coresOf("local[*]") == Runtime.getRuntime.availableProcessors)
    // the q_two_hop regime: 16 cores, engine-default 32 shuffle
    // partitions → initial 128, exactly the measured-green sizing
    assert(Engine.initialPartitions("local[16]", 32) == 128)
    // a caller who hand-sizes ABOVE the floor keeps their number
    assert(Engine.initialPartitions("local[4]", 512) == 512)
  }

  test("r19 scale-adaptive sizing: initial partitions derive from input bytes") {
    // unknown input: the constant 8×cores posture is unchanged
    assert(Engine.initialPartitions("local[32]", 32, -1L) == 256)
    // small input (17 MB, the sf0.1 bench): ceil(17/8)=3 → floor at
    // shufflePartitions, NOT 256 — shuffle-bucket overhead removed
    assert(Engine.initialPartitions("local[32]", 32, 17L << 20) == 32)
    // the sf10 spill gate (~2.2 GB): size-derived count above the
    // measured 128-partition q_two_hop OOM floor WITH headroom (the
    // 128-sized r18 run peaked at 98% of the 8 GiB heap)
    val sf10 = Engine.initialPartitions("local[16]", 32, 2280L << 20)
    assert(sf10 > 128 && sf10 <= 512, s"sf10 sizing $sf10 outside (128, 512]")
    // huge input: bounded by the block-count ceiling, not unbounded
    assert(Engine.initialPartitions("local[32]", 32, 1L << 50) == 4096)
  }

  test("AQE still coalesces down: a tiny aggregate does not fan out to initialPartitionNum tasks") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => (i % 5, i)).toDF("k", "v")
      .groupBy("k").sum("v")
    df.collect() // execute so AQE finalizes the stage
    val finalPlan = df.queryExecution.executedPlan.toString()
    // AQEShuffleRead with coalesced output: the executed plan must not
    // carry 32 result partitions for a 5-group aggregate
    val parts = df.rdd.getNumPartitions
    assert(parts <= 8, s"expected AQE to coalesce a 5-group aggregate, got $parts partitions\n$finalPlan")
  }
}

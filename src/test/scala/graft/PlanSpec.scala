package graft

/** Scale-posture assertions: the physical plans must show parquet
  * pushdown, broadcast of dims, and whole-stage codegen — the things
  * that keep these queries viable at 100 TB (SURVEY.md §5).
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString()
  }

  test("q1_agg pushes the shipdate filter and prunes columns at the scan") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "column pruning should drop unused l_orderkey")
  }

  test("dedup_segments: no exchange is partitioned on raw segment text") {
    val p = plan("dedup_segments")
    // dup detection and the anti-join key on xxhash64(seg); the only
    // text-bearing exchange is the reassembly groupBy(doc_id). An
    // exchange PARTITIONED on seg would ship 10-token strings
    // corpus-wide — the 100 TB bandwidth hazard this layout avoids.
    assert(!p.contains("hashpartitioning(seg#"), p)
    assert(p.contains("hashpartitioning(seg_h#") || p.contains("hashpartitioning(doc_id#"), p)
  }

  test("q5_multi_join broadcasts the dimension tables") {
    val p = plan("q5_multi_join")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q3_join_agg broadcasts the filtered customer side") {
    val p = plan("q3_join_agg")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"), p)
  }

  test("etl_segment stays in one whole-stage codegen projection") {
    val df = SparkEntry.queries("etl_segment")(spark, sfDir)
    df.collect() // finalize the adaptive plan so codegen spans are visible
    val p = df.queryExecution.executedPlan.toString()
    // "*(n)" prefixes mark whole-stage-codegen spans in the plan string
    assert(p.contains("*(1) Project"), p)
  }

  test("tables bucketed on the join key join with zero shuffle") {
    val spark2 = spark
    import graft.etl.Load
    spark2.sql("DROP TABLE IF EXISTS b_orders")
    spark2.sql("DROP TABLE IF EXISTS b_customer")
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse dirs persist — clear them or saveAsTable refuses
    Seq("b_orders", "b_customer").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    Load.BucketedTableSink("b_orders", "o_custkey", 8)
      .write(Tables.orders(spark2, sfDir))
    Load.BucketedTableSink("b_customer", "c_custkey", 8)
      .write(Tables.customer(spark2, sfDir))
    // force a sort-merge join so the assertion exercises bucketing,
    // not broadcast
    val prev = spark2.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark2.table("b_orders")
        .join(spark2.table("b_customer"),
          org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString()
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$p")
    } finally spark2.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dedup_exact aggregates on the hash, not the document body") {
    val df = SparkEntry.queries("dedup_exact")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("HashAggregate"), p)
  }

  test("q_bloom_semi probes the sketch in a scan-side filter before any exchange") {
    val p = plan("q_bloom_semi").toLowerCase
    // the Bloom membership test must sit under the scan's filter (map
    // side), not after the shuffle — that's the whole point
    val filterIdx = p.indexOf("bloommightcontain")
    val exchangeIdx = p.indexOf("exchange")
    assert(filterIdx >= 0, p)
    assert(exchangeIdx < 0 || filterIdx > exchangeIdx,
      s"Bloom filter should be below (after in tree-print order) the exchange:\n$p")
  }

  test("sim_lsh_ann and dedup_ppjoin shuffle scalars, not embedding/shingle payloads") {
    // the pair-dedup aggregates group (id, id, sim)/(id, id) only; the
    // plans must not exchange array columns after candidate generation
    val pLsh = plan("sim_lsh_ann")
    assert(pLsh.contains("HashAggregate"), pLsh)
    val pPp = plan("dedup_ppjoin")
    assert(pPp.contains("HashAggregate"), pPp)
  }

  test("an_ks_drift and an_gini scan without a single-partition window") {
    // the only SinglePartition exchanges allowed are the 1-row scalar
    // totals; the ROW-sized cumulation must ride the distributed scan,
    // i.e. no Window operator anywhere in the plan
    Seq("an_ks_drift", "an_gini").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Window"), s"$q must use the distributed scan, not a window:\n$p")
    }
    graft.operators.PrefixSum.releaseCaches()
  }

  test("q_exact_median probes crossing rows via a tiny broadcast, not a sort") {
    val p = plan("q_exact_median")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("Window"), s"rank probing must not fall back to a window:\n$p")
    graft.operators.PrefixSum.releaseCaches()
  }

  test("an_cohort_ltv's cumulative window is partitioned by cohort") {
    val p = plan("an_cohort_ltv")
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"),
      s"per-cohort running sums must stay inside the cohort partitions:\n$p")
  }

  test("text_pack partitions by shard for the packing window (no global sort)") {
    val p = plan("text_pack")
    assert(p.contains("Window"), p)
    assert(p.contains("hashpartitioning(shard"),
      s"packing window should partition by shard, not run a global sort:\n$p")
  }

  test("q_scd2_lookup extracts the equi-key; the interval is a join filter, not a NLJ") {
    val p = plan("q_scd2_lookup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interval membership must ride the custkey equi-join:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("etl_cdc_compact compacts via group-limit, one exchange on the key") {
    val p = plan("etl_cdc_compact")
    // Spark rewrites row_number()=1 into WindowGroupLimit with a map-side
    // partial pass — the top-1-per-key shape that never materializes the
    // full per-key sort output downstream
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.count(_ == 'W') > 0 && p.contains("hashpartitioning(k#"), p)
  }

  test("q_pagerank never broadcasts the node-sized rank side") {
    // the adjacency may broadcast while small under AQE, but the rank
    // vector must arrive by shuffle: no BroadcastExchange subtree may
    // contain the gather aggregate (the producer of rank_f)
    val df = SparkEntry.queries("q_pagerank")(spark, sfDir)
    val phys = df.queryExecution.executedPlan
    val bad = phys.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
        if b.child.collect {
          case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec
            if h.output.exists(_.name.startsWith("rank")) => h
        }.nonEmpty => b
    }
    assert(bad.isEmpty, s"rank vector must shuffle, not broadcast:\n${bad.headOption}")
  }

  test("an_weighted_median and an_quantiles_by_group run on the distributed scan") {
    Seq("an_weighted_median", "an_quantiles_by_group",
        "an_winsorize", "an_decile_lift").foreach { q =>
      val p = plan(q)
      // no exact-percentile value-buffering aggregate anywhere
      assert(!p.contains("percentile"), s"$q must not buffer values per group:\n$p")
    }
    graft.operators.PrefixSum.releaseCaches()
  }

  test("q_triangles closes paths with keyed joins — nothing cartesian") {
    // the triangle closure must join on edge keys; a cartesian or
    // nested-loop plan would be O(E²) pairs at any scale. (The final
    // 1-row × 1-row result crossjoins are fine — they never carry data.)
    val df = SparkEntry.queries("q_triangles")(spark, sfDir)
    val phys = df.queryExecution.executedPlan
    val bad = phys.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
        // 1-row aggregate spines are scalar glue, not data joins
        if !b.left.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec] &&
          !b.right.isInstanceOf[org.apache.spark.sql.execution.aggregate.HashAggregateExec] => b
    }
    assert(bad.isEmpty, s"triangle closure must stay equi-keyed:\n${bad.headOption}")
  }

  test("mm_shard_pack assigns shards without a single-partition window") {
    val p = plan("mm_shard_pack")
    assert(!p.contains("Window"), s"the offset scan must be PrefixSum, not a window:\n$p")
    graft.operators.PrefixSum.releaseCaches()
  }

  test("an_rolling_distinct: day-axis cumulation rides the scan, user windows stay keyed") {
    val df = SparkEntry.queries("an_rolling_distinct")(spark, sfDir)
    val phys = df.queryExecution.executedPlan
    // the per-user island windows are partitioned by user_id; nothing
    // row-sized may cumulate under a SinglePartition window (the day
    // axis goes through PrefixSum)
    val bad = phys.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, s"unpartitioned window in the plan:\n${bad.headOption}")
    graft.operators.PrefixSum.releaseCaches()
  }

  test("sim_rerank broadcasts the query side only — the corpus streams") {
    val df = SparkEntry.queries("sim_rerank")(spark, sfDir)
    val phys = df.queryExecution.executedPlan
    val bad = phys.collect {
      case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
        if b.child.collect {
          case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
        }.nonEmpty => b
    }
    // the corpus side carries the repartition shuffle; if it were
    // broadcast the whole embedding store would land on every executor
    assert(bad.isEmpty, s"corpus (repartitioned) side must not broadcast:\n${bad.headOption}")
  }

  test("an_mannwhitney ranks without any window at all") {
    val df = SparkEntry.queries("an_mannwhitney")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString()
    // pooled midranks come from the PrefixSum scan over distinct cent
    // values — a rank() window over N rows would be the scale cliff
    assert(!p.contains("Window"), s"midranks must ride the scan, not a window:\n$p")
    graft.operators.PrefixSum.releaseCaches()
  }

  test("Plans.unboundedGlobalWindows catches the funnel and passes the limit-first rewrite") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"))
    // seeded violation: a global sequence number consumed WITHOUT a
    // rank filter — the optimizer's InferWindowGroupLimit rewrite
    // (which bounds the row_number+filter form into a per-partition
    // group limit) cannot apply, so the whole scan funnels through the
    // SinglePartition window. This is the class the detector exists
    // for; the filtered form is additionally covered below.
    val funnel = base
      .withColumn("seq", row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .withColumn("half", col("seq") * 2)
    assert(Plans.unboundedGlobalWindows(funnel.queryExecution.sparkPlan) === 1,
      "the seeded unpartitioned-window funnel must be flagged")
    // the row_number+filter form: the optimizer bounds it in one of two
    // ways — InferWindowGroupLimit (a WindowGroupLimit pair under the
    // window) or LimitPushDownThroughWindow (a Limit pushed BELOW the
    // window; legal for row_number over a global order). Both are the
    // optimizer doing the gate's job, so in both the detector must see
    // a bounded subtree (0); in each branch the expected count is
    // PINNED so a detector regression on this shape cannot hide behind
    // the disjunction (round-13 advice). Only a plan with NEITHER
    // bounding shape is a raw funnel the detector must flag.
    val filtered = base
      .withColumn("rnk", row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rnk") <= 10)
    val fp = filtered.queryExecution.sparkPlan
    val hasGroupLimit = fp.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }.nonEmpty
    val limitBelowWindow = fp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty && w.child.collect {
          case g: org.apache.spark.sql.execution.GlobalLimitExec => g
          case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
        }.nonEmpty => w
    }.nonEmpty
    val det = Plans.unboundedGlobalWindows(fp)
    if (hasGroupLimit || limitBelowWindow)
      assert(det === 0,
        s"optimizer-bounded rank-filter shape must not be flagged (groupLimit=$hasGroupLimit pushedLimit=$limitBelowWindow):\n$fp")
    else
      assert(det === 1, s"rank-filter with no bounding shape must be flagged:\n$fp")
    // the fix: limit-first TakeOrdered, then rank the 10-row result
    val fixed = base.orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)
      .withColumn("rnk", row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
    assert(Plans.unboundedGlobalWindows(fixed.queryExecution.sparkPlan) === 0,
      "the limit-first rewrite must pass")
    // partitioned windows are never flagged (bounded per-key frames)
    val perKey = base
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("o_orderkey") % 7).orderBy(col("o_totalprice"))))
    assert(Plans.unboundedGlobalWindows(perKey.queryExecution.sparkPlan) === 0)
    // a join of a limit-bounded side with an unbounded side stays
    // unbounded — the conservative all-paths rule
    val joined = base.orderBy(col("o_orderkey")).limit(5)
      .select(col("o_orderkey"))
      .join(base, "o_orderkey")
      .withColumn("rnk", row_number().over(Window.orderBy(col("o_totalprice"))))
    assert(Plans.unboundedGlobalWindows(joined.queryExecution.sparkPlan) === 1)
  }

  test("the seven r12 funnel queries plan zero unbounded global windows") {
    for (name <- Seq("an_grubbs", "sim_embed_outliers", "q_two_hop",
        "text_pmi_collocations", "text_rake", "text_oov_rate", "text_templates")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      assert(Plans.unboundedGlobalWindows(df.queryExecution.sparkPlan) === 0,
        s"$name must keep the limit-first/TakeOrdered posture")
    }
    graft.operators.PrefixSum.releaseCaches()
  }

  test("q_degree_hist closes pairs equi-keyed on the order key") {
    val df = SparkEntry.queries("q_degree_hist")(spark, sfDir)
    val phys = df.queryExecution.executedPlan
    val bad = phys.collect {
      case b: org.apache.spark.sql.execution.joins.CartesianProductExec => b
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, s"pair generation must stay keyed on l_orderkey:\n${bad.headOption}")
  }
}

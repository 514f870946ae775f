package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-19 third analytics wave: likelihood-ratio independence
  * (G-test), post-hoc contrasts (Scheffé), stratified-epi homogeneity
  * (Woolf), paired-categorical marginal homogeneity (Stuart–Maxwell),
  * method-of-moments distribution fits (Beta, negative binomial),
  * multivariate screens (bivariate Mahalanobis, 2×2 PCA), delete-one
  * jackknife resampling, Engle–Granger cointegration, and the Lorenz
  * asymmetry coefficient — in a ninth trait file (same scope rules as
  * [[SparkEntryAn1]]–[[SparkEntryAn8]]: self-typed to the registry
  * object, SQL twins beside each kernel, exact integer/decimal algebra
  * until one shared IEEE emission tree, ROUND(·,6), and — the an_icc
  * lesson — only SCALE-FREE or mean-scaled doubles are ever emitted,
  * never a data-sized magnitude whose >2^53 exact inputs can wobble a
  * cross-engine ulp that ROUND 6 cannot absorb). */
private[graft] trait SparkEntryAn9 { this: SparkEntry.type =>

  /** G-test (likelihood-ratio chi-square) of independence between
    * event type and day-of-week — the information-theoretic twin of
    * Pearson's χ² ([[anDowChi2]] tests the marginal; this tests the
    * JOINT): G = 2·Σ O·ln(O·N/(R·C)), which is 2N× the mutual
    * information of the crosstab, additive under partitioning where
    * Pearson is not. Cells, row/column totals and N are exact BIGINTs
    * off one groupBy + two key-domain rollups (≤ types×7 cells, all
    * broadcast); per-cell O·ln and (O−E)²/E terms are doubles from
    * exact integers on identical IEEE trees, DECIMAL(38,18)-gathered
    * (order-free), both statistics ROUND(·,6). Pearson χ² emitted
    * beside G — their gap is the classic sparse-cell diagnostic.
    * Margins come off WINDOWS over the cells frame (≤ types×7 rows at
    * ANY corpus size — key-domain bounded, GWIN-allowlisted), so the
    * corpus-sized events table is scanned exactly ONCE (the naive
    * rt/ct/tot re-derivation scanned it four times). */
  private[graft] def anGTest(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(s, dir)
      .select(col("event_type").as("r"),
        pmod(datediff(col("ts").cast("date"), lit("1992-01-01").cast("date")),
          lit(7)).cast("long").as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("o"))
    val t = cells.select(col("r"), col("c"), col("o"),
      sum(col("o")).over(Window.partitionBy(col("r"))).as("rr"),
      sum(col("o")).over(Window.partitionBy(col("c"))).as("cc"),
      sum(col("o")).over(Window.partitionBy()).as("n"))
    val od = col("o").cast("double"); val nd = col("n").cast("double")
    val e = col("rr").cast("double") * col("cc").cast("double") / nd
    val gather = (c: Column) => sum(c.cast("decimal(38,18)")).cast("double")
    t.agg(max(col("n")).as("n"),
        ((countDistinct(col("r")) - 1) * (countDistinct(col("c")) - 1)).as("df"),
        gather(od * log(od * nd /
          (col("rr").cast("double") * col("cc").cast("double")))).as("gs"),
        gather((od - e) * (od - e) / e).as("cs"))
      .select(col("n"), col("df"),
        round(lit(2.0) * col("gs"), 6).as("g_stat"),
        round(col("cs"), 6).as("chi2"))
  }

  private[graft] lazy val anGTestSql =
    """WITH cells AS (SELECT event_type AS r,
      |    date_diff('day', DATE '1992-01-01', CAST(ts AS DATE)) % 7 AS c,
      |    COUNT(*) AS o
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT r, c, o,
      |    CAST(SUM(o) OVER (PARTITION BY r) AS BIGINT) AS rr,
      |    CAST(SUM(o) OVER (PARTITION BY c) AS BIGINT) AS cc,
      |    CAST(SUM(o) OVER () AS BIGINT) AS n
      |  FROM cells),
      |terms AS (SELECT r, c, n,
      |    CAST(CAST(o AS DOUBLE) * ln(CAST(o AS DOUBLE) * CAST(n AS DOUBLE)
      |      / (CAST(rr AS DOUBLE) * CAST(cc AS DOUBLE))) AS DECIMAL(38,18)) AS gt,
      |    CAST((CAST(o AS DOUBLE) - CAST(rr AS DOUBLE) * CAST(cc AS DOUBLE) / CAST(n AS DOUBLE))
      |      * (CAST(o AS DOUBLE) - CAST(rr AS DOUBLE) * CAST(cc AS DOUBLE) / CAST(n AS DOUBLE))
      |      / (CAST(rr AS DOUBLE) * CAST(cc AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(38,18)) AS ct2
      |  FROM t)
      |SELECT MAX(n) AS n,
      |  (COUNT(DISTINCT r) - 1) * (COUNT(DISTINCT c) - 1) AS df,
      |  ROUND(2.0 * CAST(SUM(gt) AS DOUBLE), 6) AS g_stat,
      |  ROUND(CAST(SUM(ct2) AS DOUBLE), 6) AS chi2
      |FROM terms""".stripMargin

  /** Scheffé post-hoc pairwise contrasts after [[anAnova]] — the
    * conservative any-contrast follow-up beside [[anTukeyHsd]] (which
    * controls only pairwise error): per market-segment pair,
    * F = (mean_i − mean_j)² / ((k−1)·MSW·(1/nᵢ + 1/nⱼ)), valid
    * simultaneously for EVERY linear contrast. Reuses the exact
    * centered cents sums of the ANOVA (the integer grand-mean shift m0
    * cancels in every mean difference), so per-group state is 3 exact
    * numbers and the pair fan-out is k² model-sized rows; MSW passes
    * through the same DECIMAL(38,18) SSB gather as an_anova. Mean
    * diffs are mean-scaled (SF-invariant) USD, F scale-free; both
    * ROUND(·,6). */
  private[graft] def anScheffe(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val grand = o.agg(sum(col("v")).as("s0"), count(lit(1)).as("n0"))
      .select(expr("s0 div n0").as("m0"))
    // per is k rows with THREE consumers (MSW total + both pair
    // sides) — stabilize once (the an_tukey_hsd treatment) so the
    // data-sized centered groupBy runs ONCE, not three times
    val per = graft.operators.Checkpoints.stabilizeLazy(
      o.crossJoin(broadcast(grand))
        .select(col("g"), (col("v") - col("m0")).as("c"))
        .groupBy(col("g"))
        .agg(count(lit(1)).as("n_g"), sum(col("c")).as("sp_g"),
          sum((col("c").cast("decimal(18,0)") * col("c").cast("decimal(18,0)"))
            .cast("decimal(38,0)")).as("qp_g")))
    // SSW directly: Σ(qp_g − sp_g²/n_g) = qp − ssb_gather (the m0
    // shift cancels within each group)
    val tot = per.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("qp_g")).as("qp"),
        sum((col("sp_g").cast("double") * col("sp_g").cast("double") /
          col("n_g").cast("double")).cast("decimal(38,18)")).as("ssb_gather"))
      .select(col("k"),
        ((col("qp").cast("double") - col("ssb_gather").cast("double")) /
          (col("n") - col("k")).cast("double")).as("msw"))
    val a = per.select(col("g").as("g1"), col("n_g").as("n1"), col("sp_g").as("sp1"))
    val b = per.select(col("g").as("g2"), col("n_g").as("n2"), col("sp_g").as("sp2"))
    val diff = col("sp1").cast("double") / col("n1").cast("double") -
      col("sp2").cast("double") / col("n2").cast("double")
    // broadcast the pair side: a bare non-equi self-join of the k-row
    // frame plans CartesianProduct (cart=0 is a hard plan-gate rule)
    a.join(broadcast(b), col("g1") < col("g2")).crossJoin(broadcast(tot))
      .select(col("g1"), col("g2"),
        round(diff / 100.0, 6).as("mean_diff_usd"),
        round(diff * diff / ((col("k") - lit(1)).cast("double") * col("msw") *
          (lit(1.0) / col("n1").cast("double") +
            lit(1.0) / col("n2").cast("double"))), 6).as("f_scheffe"))
      .orderBy(col("g1"), col("g2"))
  }

  private[graft] lazy val anScheffeSql =
    """WITH o AS (SELECT c.c_mktsegment AS g,
      |    CAST(CAST(o.o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |m AS (SELECT CAST(SUM(v) AS BIGINT) // COUNT(*) AS m0 FROM o),
      |per AS (SELECT g, COUNT(*) AS n_g,
      |    CAST(SUM(v - m0) AS BIGINT) AS sp_g,
      |    CAST(SUM(CAST(CAST(v - m0 AS DECIMAL(18,0)) * CAST(v - m0 AS DECIMAL(18,0))
      |             AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS qp_g
      |  FROM o CROSS JOIN m GROUP BY g),
      |t AS (SELECT COUNT(*) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
      |        CAST(SUM(qp_g) AS DECIMAL(38,0)) AS qp,
      |        CAST(SUM(CAST(CAST(sp_g AS DOUBLE) * CAST(sp_g AS DOUBLE)
      |              / CAST(n_g AS DOUBLE) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS ssb_gather
      |      FROM per),
      |w AS (SELECT k, (CAST(qp AS DOUBLE) - CAST(ssb_gather AS DOUBLE))
      |               / CAST(n - k AS DOUBLE) AS msw FROM t)
      |SELECT a.g AS g1, b.g AS g2,
      |  ROUND((CAST(a.sp_g AS DOUBLE) / CAST(a.n_g AS DOUBLE)
      |       - CAST(b.sp_g AS DOUBLE) / CAST(b.n_g AS DOUBLE)) / 100.0, 6) AS mean_diff_usd,
      |  ROUND((CAST(a.sp_g AS DOUBLE) / CAST(a.n_g AS DOUBLE)
      |       - CAST(b.sp_g AS DOUBLE) / CAST(b.n_g AS DOUBLE))
      |      * (CAST(a.sp_g AS DOUBLE) / CAST(a.n_g AS DOUBLE)
      |       - CAST(b.sp_g AS DOUBLE) / CAST(b.n_g AS DOUBLE))
      |      / (CAST(k - 1 AS DOUBLE) * msw
      |         * (1.0 / CAST(a.n_g AS DOUBLE) + 1.0 / CAST(b.n_g AS DOUBLE))), 6) AS f_scheffe
      |FROM per a JOIN per b ON a.g < b.g CROSS JOIN w
      |ORDER BY g1, g2""".stripMargin

  /** Woolf test of odds-ratio homogeneity across market-segment strata
    * — the "is one pooled OR even meaningful" gate that [[anCmh]]
    * (which ASSUMES homogeneity) and [[anBreslowDay]] (exact-moment
    * form) sit on either side of: per stratum, the churn × positive-
    * balance 2×2 with Haldane–Anscombe +0.5 in every cell (documented
    * — keeps empty cells finite and both engines identical),
    * w = 1/Σ(1/cell), χ² = Σw·(lnOR − lnŌR)² = Σw·lnOR² −
    * (Σw·lnOR)²/Σw. Cells exact off ONE [[churnLabeled]] pass;
    * per-stratum doubles DECIMAL(38,18)-gathered over the k≈5 strata
    * frame; pooled lnOR and χ² ROUND(·,6), both scale-free. */
  private[graft] def anWoolf(s: SparkSession, dir: String): DataFrame = {
    val base = churnLabeled(s, dir)
      .select(col("c_mktsegment").as("g"), col("g1"),
        (col("v") > 0).cast("long").as("x"))
    val st = base.groupBy(col("g")).agg(
      sum(col("g1") * col("x")).as("a"),
      sum(col("g1") * (lit(1L) - col("x"))).as("b"),
      sum((lit(1L) - col("g1")) * col("x")).as("c"),
      sum((lit(1L) - col("g1")) * (lit(1L) - col("x"))).as("d"))
    val h = (c: String) => col(c).cast("double") + lit(0.5)
    val lor = log(h("a") * h("d") / (h("b") * h("c")))
    val w = lit(1.0) / (lit(1.0) / h("a") + lit(1.0) / h("b") +
      lit(1.0) / h("c") + lit(1.0) / h("d"))
    val gather = (c: Column) => sum(c.cast("decimal(38,18)")).cast("double")
    st.agg(count(lit(1)).as("k"),
        gather(w).as("sw"), gather(w * lor).as("swl"),
        gather(w * lor * lor).as("swl2"))
      .select(col("k"), (col("k") - 1).as("df"),
        round(col("swl") / col("sw"), 6).as("lor_pooled"),
        round(col("swl2") - col("swl") * col("swl") / col("sw"), 6)
          .as("chi2_woolf"))
  }

  private[graft] lazy val anWoolfSql =
    s"""WITH base AS ($churnLabeledSql),
       |st AS (SELECT c_mktsegment AS g,
       |    CAST(SUM(g1 * CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
       |    CAST(SUM(g1 * CASE WHEN v > 0 THEN 0 ELSE 1 END) AS BIGINT) AS b,
       |    CAST(SUM((1 - g1) * CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
       |    CAST(SUM((1 - g1) * CASE WHEN v > 0 THEN 0 ELSE 1 END) AS BIGINT) AS d
       |  FROM base GROUP BY 1),
       |t AS (SELECT g,
       |    ln((CAST(a AS DOUBLE) + 0.5) * (CAST(d AS DOUBLE) + 0.5)
       |     / ((CAST(b AS DOUBLE) + 0.5) * (CAST(c AS DOUBLE) + 0.5))) AS lor,
       |    1.0 / (1.0 / (CAST(a AS DOUBLE) + 0.5) + 1.0 / (CAST(b AS DOUBLE) + 0.5)
       |         + 1.0 / (CAST(c AS DOUBLE) + 0.5) + 1.0 / (CAST(d AS DOUBLE) + 0.5)) AS w
       |  FROM st),
       |ag AS (SELECT COUNT(*) AS k,
       |    CAST(SUM(CAST(w AS DECIMAL(38,18))) AS DOUBLE) AS sw,
       |    CAST(SUM(CAST(w * lor AS DECIMAL(38,18))) AS DOUBLE) AS swl,
       |    CAST(SUM(CAST(w * lor * lor AS DECIMAL(38,18))) AS DOUBLE) AS swl2
       |  FROM t)
       |SELECT k, k - 1 AS df, ROUND(swl / sw, 6) AS lor_pooled,
       |  ROUND(swl2 - swl * swl / sw, 6) AS chi2_woolf
       |FROM ag""".stripMargin

  /** Stuart–Maxwell marginal-homogeneity test on each customer's FIRST
    * vs LAST order priority (bucketed HI = 1-URGENT/2-HIGH, MED =
    * 3-MEDIUM, LO = rest) — the k-category generalization of
    * [[anMcnemar]]'s 2×2 (and the symmetric-cell complement of
    * [[anBowker]]): did the priority MIX drift between a customer's
    * first and last order? First/last are deterministic row_number
    * picks over (date, orderkey) within customer; the 3×3 table,
    * margins, d-vector and 2×2 covariance are ALL exact integers, and
    * χ² = (d₁²S₂₂ + d₂²S₁₁ + 2d₁d₂·s₁₂)/(S₁₁S₂₂ − s₁₂²) with s₁₂ =
    * n₀₁+n₁₀ (= −S₁₂) is ONE division of exact integers at emission,
    * ROUND(·,6), df = 2.
    * WIDTH: d²·S terms ≤ n³ — DECIMAL(38,0) holds past 1e12
    * customers. */
  private[graft] def anStuartMaxwell(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_custkey"),
      col("o_orderdate"), col("o_orderkey"),
      when(substring(col("o_orderpriority"), 1, 1).isin("1", "2"), 0L)
        .when(substring(col("o_orderpriority"), 1, 1) === "3", 1L)
        .otherwise(2L).as("b"))
    val wa = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wd = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val fl = o.select(col("o_custkey"), col("b"),
        row_number().over(wa).as("rna"), row_number().over(wd).as("rnd"))
      .groupBy(col("o_custkey"))
      .agg(max(when(col("rna") === 1, col("b"))).as("fb"),
        max(when(col("rnd") === 1, col("b"))).as("lb"))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val cell = (i: Int, j: Int) =>
      sum((col("fb") === i && col("lb") === j).cast("long"))
    val ag = fl.agg(count(lit(1)).as("n"),
      cell(0, 0).as("n00"), cell(0, 1).as("n01"), cell(0, 2).as("n02"),
      cell(1, 0).as("n10"), cell(1, 1).as("n11"), cell(1, 2).as("n12"),
      cell(2, 0).as("n20"), cell(2, 1).as("n21"), cell(2, 2).as("n22"))
    val d1 = (col("n00") + col("n01") + col("n02")) -
      (col("n00") + col("n10") + col("n20"))
    val d2 = (col("n10") + col("n11") + col("n12")) -
      (col("n01") + col("n11") + col("n21"))
    val s11 = (col("n00") + col("n01") + col("n02")) +
      (col("n00") + col("n10") + col("n20")) - lit(2L) * col("n00")
    val s22 = (col("n10") + col("n11") + col("n12")) +
      (col("n01") + col("n11") + col("n21")) - lit(2L) * col("n11")
    val s12 = col("n01") + col("n10")
    val num = d38(d1) * d38(d1) * d38(s22) + d38(d2) * d38(d2) * d38(s11) +
      lit(2L) * d38(d1) * d38(d2) * d38(s12)
    val den = d38(s11) * d38(s22) - d38(s12) * d38(s12)
    ag.select(col("n"), d1.as("d1"), d2.as("d2"), lit(2L).as("df"),
      round(num.cast("decimal(38,0)").cast("double") /
        den.cast("decimal(38,0)").cast("double"), 6).as("chi2_sm"))
  }

  private[graft] lazy val anStuartMaxwellSql =
    """WITH o AS (SELECT o_custkey, o_orderdate, o_orderkey,
      |    CASE WHEN substring(o_orderpriority, 1, 1) IN ('1','2') THEN 0
      |         WHEN substring(o_orderpriority, 1, 1) = '3' THEN 1
      |         ELSE 2 END AS b
      |  FROM orders),
      |rk AS (SELECT o_custkey, b,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS rna,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rnd
      |  FROM o),
      |fl AS (SELECT o_custkey,
      |    MAX(CASE WHEN rna = 1 THEN b END) AS fb,
      |    MAX(CASE WHEN rnd = 1 THEN b END) AS lb
      |  FROM rk GROUP BY 1),
      |ag AS (SELECT COUNT(*) AS n,
      |    CAST(SUM(CASE WHEN fb=0 AND lb=0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
      |    CAST(SUM(CASE WHEN fb=0 AND lb=1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
      |    CAST(SUM(CASE WHEN fb=0 AND lb=2 THEN 1 ELSE 0 END) AS BIGINT) AS n02,
      |    CAST(SUM(CASE WHEN fb=1 AND lb=0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
      |    CAST(SUM(CASE WHEN fb=1 AND lb=1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
      |    CAST(SUM(CASE WHEN fb=1 AND lb=2 THEN 1 ELSE 0 END) AS BIGINT) AS n12,
      |    CAST(SUM(CASE WHEN fb=2 AND lb=0 THEN 1 ELSE 0 END) AS BIGINT) AS n20,
      |    CAST(SUM(CASE WHEN fb=2 AND lb=1 THEN 1 ELSE 0 END) AS BIGINT) AS n21,
      |    CAST(SUM(CASE WHEN fb=2 AND lb=2 THEN 1 ELSE 0 END) AS BIGINT) AS n22
      |  FROM fl),
      |d AS (SELECT n,
      |    (n00+n01+n02) - (n00+n10+n20) AS d1,
      |    (n10+n11+n12) - (n01+n11+n21) AS d2,
      |    (n00+n01+n02) + (n00+n10+n20) - 2*n00 AS s11,
      |    (n10+n11+n12) + (n01+n11+n21) - 2*n11 AS s22,
      |    n01 + n10 AS s12
      |  FROM ag)
      |SELECT n, d1, d2, CAST(2 AS BIGINT) AS df,
      |  ROUND(CAST(CAST(CAST(d1 AS DECIMAL(38,0)) * CAST(d1 AS DECIMAL(38,0)) * CAST(s22 AS DECIMAL(38,0))
      |      + CAST(d2 AS DECIMAL(38,0)) * CAST(d2 AS DECIMAL(38,0)) * CAST(s11 AS DECIMAL(38,0))
      |      + 2 * CAST(d1 AS DECIMAL(38,0)) * CAST(d2 AS DECIMAL(38,0)) * CAST(s12 AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE)
      |    / CAST(CAST(CAST(s11 AS DECIMAL(38,0)) * CAST(s22 AS DECIMAL(38,0))
      |      - CAST(s12 AS DECIMAL(38,0)) * CAST(s12 AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE), 6) AS chi2_sm
      |FROM d""".stripMargin

  /** Method-of-moments Beta fit of the discount distribution on [0,1]
    * (discount spans [0, 0.10], normalized by the 0.10 cap) — the
    * bounded-support companion to [[anGammaFit]]/[[anWeibullFit]]/
    * [[anLognormalFit]]: α = μ·c, β = (1−μ)·c with c = μ(1−μ)/σ² − 1.
    * Discounts integerize exactly at 2dp (DECIMAL(4,2)·100 ∈ 0..10),
    * so Σd and Σd² are exact BIGINTs off one pass; μ, population σ²
    * and both shape parameters are ONE shared IEEE tree at emission,
    * all scale-free (moments of a bounded variable), ROUND(·,6). */
  private[graft] def anBetaFit(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.lineitem(s, dir)
      .select((col("l_discount").cast("decimal(4,2)") * 100)
        .cast("bigint").as("d"))
    val ag = d.agg(count(lit(1)).as("n"), sum(col("d")).as("s1"),
      sum((col("d") * col("d")).cast("bigint")).as("s2"))
    val nd = col("n").cast("double")
    val m = col("s1").cast("double") / (lit(10.0) * nd)
    val v = col("s2").cast("double") / (lit(100.0) * nd) - m * m
    val c = m * (lit(1.0) - m) / v - lit(1.0)
    ag.select(col("n"), round(m, 6).as("mean"), round(v, 6).as("var"),
      round(m * c, 6).as("alpha"), round((lit(1.0) - m) * c, 6).as("beta"))
  }

  private[graft] lazy val anBetaFitSql =
    """WITH d AS (SELECT CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS d
      |           FROM lineitem),
      |ag AS (SELECT COUNT(*) AS n, CAST(SUM(d) AS BIGINT) AS s1,
      |         CAST(SUM(d * d) AS BIGINT) AS s2 FROM d),
      |m AS (SELECT n,
      |    CAST(s1 AS DOUBLE) / (10.0 * CAST(n AS DOUBLE)) AS mu,
      |    CAST(s2 AS DOUBLE) / (100.0 * CAST(n AS DOUBLE))
      |      - (CAST(s1 AS DOUBLE) / (10.0 * CAST(n AS DOUBLE)))
      |      * (CAST(s1 AS DOUBLE) / (10.0 * CAST(n AS DOUBLE))) AS v
      |  FROM ag)
      |SELECT n, ROUND(mu, 6) AS mean, ROUND(v, 6) AS var,
      |  ROUND(mu * (mu * (1.0 - mu) / v - 1.0), 6) AS alpha,
      |  ROUND((1.0 - mu) * (mu * (1.0 - mu) / v - 1.0), 6) AS beta
      |FROM m""".stripMargin

  /** Method-of-moments negative-binomial fit of orders-per-customer
    * (zero-order customers INCLUDED via the left join — the zero mass
    * is the point of an NB over a Poisson): p = μ/σ², r = μ²/(σ²−μ),
    * alongside the raw dispersion index σ²/μ that [[anDispersion]]
    * tests. Per-customer counts and their squares are exact BIGINTs
    * off one orders rollup + one customer left join; all five outputs
    * are scale-free count moments off ONE shared IEEE tree,
    * ROUND(·,6). */
  private[graft] def anNegbinFit(s: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.orders(s, dir).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("c"))
    val k = Tables.customer(s, dir).select(col("c_custkey"))
      .join(cnt, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("c"), lit(0L)).as("k"))
    val ag = k.agg(count(lit(1)).as("n"), sum(col("k")).as("s1"),
      sum((col("k") * col("k")).cast("bigint")).as("s2"))
    val nd = col("n").cast("double")
    val m = col("s1").cast("double") / nd
    val v = col("s2").cast("double") / nd - m * m
    // σ² ≤ μ (equi/under-dispersed — observed EXACTLY at sf0.001) has
    // no NB moment solution (r → ∞, the Poisson limit): emit NULL
    // rather than divide by zero under ANSI
    ag.select(col("n"), round(m, 6).as("mean"), round(v, 6).as("var"),
      round(when(v > m, m * m / (v - m)), 6).as("nb_r"),
      round(when(v > m, m / v), 6).as("nb_p"),
      round(v / m, 6).as("dispersion"))
  }

  private[graft] lazy val anNegbinFitSql =
    """WITH cnt AS (SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY 1),
      |k AS (SELECT COALESCE(c, 0) AS k FROM customer
      |      LEFT JOIN cnt ON c_custkey = o_custkey),
      |ag AS (SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS s1,
      |         CAST(SUM(k * k) AS BIGINT) AS s2 FROM k),
      |m AS (SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
      |        CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
      |          - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
      |          * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS v
      |  FROM ag)
      |SELECT n, ROUND(mu, 6) AS mean, ROUND(v, 6) AS var,
      |  ROUND(CASE WHEN v > mu THEN mu * mu / (v - mu) END, 6) AS nb_r,
      |  ROUND(CASE WHEN v > mu THEN mu / v END, 6) AS nb_p,
      |  ROUND(v / mu, 6) AS dispersion
      |FROM m""".stripMargin

  /** Bivariate Mahalanobis outlier screen over (account balance,
    * order count) per customer — the correlation-aware multivariate
    * complement to [[anMadOutliers]]/[[anOutliers]] (which score one
    * axis at a time and miss the off-diagonal): with n-scaled centered
    * integers X = n·x − Σx, Y = n·y − Σy and exact co-moment integers
    * Cxx/Cyy/Cxy (= n·Σ·² − Σ·Σ), D² = (X²Cyy + Y²Cxx − 2XYCxy) /
    * (CxxCyy − Cxy²) EXACTLY — the n⁴ scale cancels, no float mean or
    * covariance is ever formed. Per-row D² is one double division of
    * >2^53 exact products (computed in binary64 — the widths pass
    * DECIMAL(38) at sf1), counted against the χ²₂ 0.95/0.99 quantiles;
    * counts exact, max D² scale-free, ROUND(·,6). */
  private[graft] def anMahalanobis(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val cnt = Tables.orders(s, dir).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("oc"))
    val base = Tables.customer(s, dir)
      .select(col("c_custkey"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("x"))
      .join(cnt, col("c_custkey") === col("o_custkey"), "left")
      .select(col("x"), coalesce(col("oc"), lit(0L)).as("y"))
    val tot = base.agg(count(lit(1)).as("n"),
      sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
      sum((d38(col("x")) * d38(col("x"))).cast("decimal(38,0)")).as("sxx"),
      sum((d38(col("y")) * d38(col("y"))).cast("decimal(38,0)")).as("syy"),
      sum((d38(col("x")) * d38(col("y"))).cast("decimal(38,0)")).as("sxy"))
    val j = base.crossJoin(broadcast(tot))
    val cxx = (d38(col("n")) * col("sxx") - col("sx") * col("sx"))
      .cast("decimal(38,0)").cast("double")
    val cyy = (d38(col("n")) * col("syy") - col("sy") * col("sy"))
      .cast("decimal(38,0)").cast("double")
    val cxy = (d38(col("n")) * col("sxy") - col("sx") * col("sy"))
      .cast("decimal(38,0)").cast("double")
    val xc = (d38(col("n")) * d38(col("x")) - col("sx"))
      .cast("decimal(38,0)").cast("double")
    val yc = (d38(col("n")) * d38(col("y")) - col("sy"))
      .cast("decimal(38,0)").cast("double")
    val d2 = (xc * xc * cyy + yc * yc * cxx - lit(2.0) * xc * yc * cxy) /
      (cxx * cyy - cxy * cxy)
    j.agg(max(col("n")).as("n"),
        sum((d2 > 5.991464547107979).cast("long")).as("n_out95"),
        sum((d2 > 9.21034037197618).cast("long")).as("n_out99"),
        max(d2).as("mx"))
      .select(col("n"), col("n_out95"), col("n_out99"),
        round(col("n_out95").cast("double") / col("n").cast("double"), 6)
          .as("frac95"),
        round(col("mx"), 6).as("d2_max"))
  }

  private[graft] lazy val anMahalanobisSql =
    """WITH cnt AS (SELECT o_custkey, COUNT(*) AS oc FROM orders GROUP BY 1),
      |base AS (SELECT CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS x,
      |    COALESCE(oc, 0) AS y
      |  FROM customer LEFT JOIN cnt ON c_custkey = o_custkey),
      |tot AS (SELECT COUNT(*) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
      |    CAST(SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
      |    CAST(SUM(CAST(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
      |    CAST(SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy
      |  FROM base),
      |d AS (SELECT n,
      |    ((CAST(CAST(n AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) - sx AS DOUBLE)
      |      * CAST(CAST(n AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) - sx AS DOUBLE)
      |      * CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE))
      |     + (CAST(CAST(n AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) - sy AS DOUBLE)
      |      * CAST(CAST(n AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) - sy AS DOUBLE)
      |      * CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE))
      |     - (2.0 * CAST(CAST(n AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) - sx AS DOUBLE)
      |      * CAST(CAST(n AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) - sy AS DOUBLE)
      |      * CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE))) /
      |    (CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
      |     * CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)
      |     - CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
      |     * CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)) AS d2
      |  FROM base CROSS JOIN tot)
      |SELECT MAX(n) AS n,
      |  CAST(SUM(CASE WHEN d2 > 5.991464547107979 THEN 1 ELSE 0 END) AS BIGINT) AS n_out95,
      |  CAST(SUM(CASE WHEN d2 > 9.21034037197618 THEN 1 ELSE 0 END) AS BIGINT) AS n_out99,
      |  ROUND(CAST(SUM(CASE WHEN d2 > 5.991464547107979 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(MAX(n) AS DOUBLE), 6) AS frac95,
      |  ROUND(MAX(d2), 6) AS d2_max
      |FROM d""".stripMargin

  /** 2×2 PCA of (quantity, line value) — the closed-form eigen
    * decomposition of the covariance matrix whose off-diagonal
    * [[anCorrMatrix]] only reports: with exact co-moment integers
    * Cxx/Cyy/Cxy (n-scaled, the n² factor cancels in every output),
    * λ± = (tr ± √((Cxx−Cyy)² + 4Cxy²))/2 — emitted only as the
    * SCALE-FREE explained-variance ratio λ₁/tr, eigenvalue ratio
    * λ₂/λ₁, loading angle θ = atan2(2Cxy, Cxx−Cyy)/2 and Pearson r
    * (the an_icc lesson: raw λ magnitudes grow with the data and
    * wobble a cross-engine ulp past 2^53). One lineitem pass,
    * ROUND(·,6).
    * WIDTH CONTRACT: n·Σy² at DECIMAL(38,0) holds through the sf10
    * probe (~1e31); the 100 TB path needs the an_variance_ratio
    * m-scaling before the square. */
  private[graft] def anPca2(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val base = Tables.lineitem(s, dir).select(
      col("l_quantity").cast("bigint").as("x"),
      (col("l_extendedprice").cast("decimal(24,2)") * 100).cast("bigint").as("y"))
    val tot = base.agg(count(lit(1)).as("n"),
      sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
      sum((d38(col("x")) * d38(col("x"))).cast("decimal(38,0)")).as("sxx"),
      sum((d38(col("y")) * d38(col("y"))).cast("decimal(38,0)")).as("syy"),
      sum((d38(col("x")) * d38(col("y"))).cast("decimal(38,0)")).as("sxy"))
    val cxx = (d38(col("n")) * col("sxx") - col("sx") * col("sx"))
      .cast("decimal(38,0)").cast("double")
    val cyy = (d38(col("n")) * col("syy") - col("sy") * col("sy"))
      .cast("decimal(38,0)").cast("double")
    val cxy = (d38(col("n")) * col("sxy") - col("sx") * col("sy"))
      .cast("decimal(38,0)").cast("double")
    val tr = cxx + cyy
    val disc = sqrt((cxx - cyy) * (cxx - cyy) + lit(4.0) * cxy * cxy)
    tot.select(col("n"),
      round((tr + disc) / (lit(2.0) * tr), 6).as("explained_ratio"),
      round((tr - disc) / (tr + disc), 6).as("lambda_ratio"),
      round(atan2(lit(2.0) * cxy, cxx - cyy) / lit(2.0), 6).as("theta"),
      round(cxy / sqrt(cxx * cyy), 6).as("corr"))
  }

  private[graft] lazy val anPca2Sql =
    """WITH base AS (SELECT CAST(l_quantity AS BIGINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS y
      |  FROM lineitem),
      |tot AS (SELECT COUNT(*) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
      |    CAST(SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
      |    CAST(SUM(CAST(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
      |    CAST(SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy
      |  FROM base),
      |c AS (SELECT n,
      |    CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE) AS cxx,
      |    CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE) AS cyy,
      |    CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE) AS cxy
      |  FROM tot)
      |SELECT n,
      |  ROUND((cxx + cyy + sqrt((cxx - cyy) * (cxx - cyy) + 4.0 * cxy * cxy))
      |    / (2.0 * (cxx + cyy)), 6) AS explained_ratio,
      |  ROUND((cxx + cyy - sqrt((cxx - cyy) * (cxx - cyy) + 4.0 * cxy * cxy))
      |    / (cxx + cyy + sqrt((cxx - cyy) * (cxx - cyy) + 4.0 * cxy * cxy)), 6) AS lambda_ratio,
      |  ROUND(atan2(2.0 * cxy, cxx - cyy) / 2.0, 6) AS theta,
      |  ROUND(cxy / sqrt(cxx * cyy), 6) AS corr
      |FROM c""".stripMargin

  /** Delete-one-group jackknife for the revenue-per-unit ratio across
    * supplier nations — the closed-form resampling complement to
    * [[anBootstrapCi]] (which resamples rows; the jackknife deletes
    * STRATA, the grouped-data form that parallelizes exactly): each
    * leave-one-nation estimate θ₍ᵢ₎ = (T_rev − rev_i)/(T_qty − qty_i)
    * comes off the SAME one-pass per-nation exact totals (cents after
    * the per-group round-2, units exact), so the "resample" costs one
    * 25-row frame, not 25 scans. SE² = (k−1)/k·Σ(θ₍ᵢ₎ − θ̄)², bias =
    * (k−1)(θ̄ − θ̂); θ-scale outputs are mean-scaled (SF-invariant),
    * per-group doubles DECIMAL(38,18)-gathered, ROUND(·,6). */
  private[graft] def anJackknifeRatio(s: SparkSession, dir: String): DataFrame = {
    val per = Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"),
        sum(col("l_quantity").cast("bigint")).as("qty_u"))
    val tot = per.agg(count(lit(1)).as("k"), sum(col("rev_c")).as("tr"),
      sum(col("qty_u")).as("tq"))
    val thi = (col("tr") - col("rev_c")).cast("double") /
      (col("tq") - col("qty_u")).cast("double")
    val gather = (c: Column) => sum(c.cast("decimal(38,18)")).cast("double")
    val ag = per.crossJoin(broadcast(tot))
      .agg(max(col("k")).as("k"), max(col("tr")).as("tr"),
        max(col("tq")).as("tq"),
        gather(thi).as("st"), gather(thi * thi).as("st2"))
    val kd = col("k").cast("double")
    val theta = col("tr").cast("double") / col("tq").cast("double")
    val tdot = col("st") / kd
    ag.select(col("k"), round(theta, 6).as("theta"),
      round(sqrt((kd - lit(1.0)) / kd *
        (col("st2") - col("st") * col("st") / kd)), 6).as("se_jack"),
      round((kd - lit(1.0)) * (tdot - theta), 6).as("bias_jack"))
  }

  private[graft] lazy val anJackknifeRatioSql =
    """WITH per AS (SELECT s_nationkey,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rev_c,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_u
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS k, CAST(SUM(rev_c) AS BIGINT) AS tr,
      |          CAST(SUM(qty_u) AS BIGINT) AS tq FROM per),
      |ag AS (SELECT MAX(k) AS k, MAX(tr) AS tr, MAX(tq) AS tq,
      |    CAST(SUM(CAST(CAST(tr - rev_c AS DOUBLE) / CAST(tq - qty_u AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS st,
      |    CAST(SUM(CAST(CAST(tr - rev_c AS DOUBLE) / CAST(tq - qty_u AS DOUBLE)
      |      * (CAST(tr - rev_c AS DOUBLE) / CAST(tq - qty_u AS DOUBLE)) AS DECIMAL(38,18))) AS DOUBLE) AS st2
      |  FROM per CROSS JOIN tot)
      |SELECT k, ROUND(CAST(tr AS DOUBLE) / CAST(tq AS DOUBLE), 6) AS theta,
      |  ROUND(sqrt((CAST(k AS DOUBLE) - 1.0) / CAST(k AS DOUBLE)
      |    * (st2 - st * st / CAST(k AS DOUBLE))), 6) AS se_jack,
      |  ROUND((CAST(k AS DOUBLE) - 1.0)
      |    * (st / CAST(k AS DOUBLE) - CAST(tr AS DOUBLE) / CAST(tq AS DOUBLE)), 6) AS bias_jack
      |FROM ag""".stripMargin

  /** Engle–Granger cointegration screen between daily revenue and
    * daily shipped quantity — step 1: OLS level regression rev ~ qty
    * with slope b = Cxy/Cxx off exact n-scaled co-moments; step 2: a
    * Dickey–Fuller t on the RESIDUAL ([[anDickeyFuller]] applied to
    * the equilibrium error — a unit root in the residual means NO
    * cointegration). Residuals stay EXACT integers via the common-
    * denominator form r_t = Cxx·(n·y_t − Σy) − Cxy·(n·x_t − Σx)
    * (no float slope touches a row), then self-normalize by max|r| —
    * the DF t is scale-invariant, so the one rounded division per row
    * (identical both engines) costs nothing. The DF regression runs
    * over the calendar-bounded spine (one lag window, day-spine
    * allowlist), its sums DECIMAL(38,18)-gathered; b is mean-scaled,
    * ρ and t scale-free, ROUND(·,6).
    * WIDTH CONTRACT: Cxy·(n·x_t − Σx) ≈ 3e31 at the sf10 probe —
    * DECIMAL(38,0) holds to ~3000× that; beyond, m-scale the spine. */
  private[graft] def anCointegration(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    // the spine has FOUR consumers through the residual chain (tot,
    // resid, rmax, the DF frame) — stabilize the calendar-bounded
    // frame once so the corpus-sized lineitem is scanned ONCE
    val sp = graft.operators.Checkpoints.stabilizeLazy(
      Tables.lineitem(s, dir)
        .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
        .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
          .cast("bigint").as("y"),
          sum(col("l_quantity").cast("bigint")).as("x"))
        .withColumn("d",
          datediff(col("day").cast("date"), lit("1992-01-01").cast("date"))
            .cast("long"))
        .select(col("d"), col("x"), col("y")))
    val tot = sp.agg(count(lit(1)).as("n"),
      sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
      sum((d38(col("x")) * d38(col("x"))).cast("decimal(38,0)")).as("sxx"),
      sum((d38(col("x")) * d38(col("y"))).cast("decimal(38,0)")).as("sxy"))
    val cxx = (d38(col("n")) * col("sxx") - col("sx") * col("sx"))
      .cast("decimal(38,0)")
    val cxy = (d38(col("n")) * col("sxy") - col("sx") * col("sy"))
      .cast("decimal(38,0)")
    val r = (cxx * (d38(col("n")) * d38(col("y")) - col("sy")) -
      cxy * (d38(col("n")) * d38(col("x")) - col("sx"))).cast("decimal(38,0)")
    val resid = sp.crossJoin(broadcast(tot))
      .select(col("d"), col("n"),
        (cxy.cast("double") / cxx.cast("double")).as("b"), r.as("r"))
    val rmax = resid.agg(max(abs(col("r"))).as("rmax"))
    val wd = Window.orderBy("d")
    val u = resid.crossJoin(broadcast(rmax))
      .select(col("d"), col("n"), col("b"),
        (col("r").cast("double") / col("rmax").cast("double")).as("u"))
      .withColumn("xl", lag(col("u"), 1).over(wd))
      .filter(col("xl").isNotNull)
      .select(col("n"), col("b"), col("xl").as("x2"),
        (col("u") - col("xl")).as("y2"))
    val gather = (c: Column) => sum(c.cast("decimal(38,18)")).cast("double")
    val ag = u.agg(max(col("n")).as("n"), max(col("b")).as("b"),
      count(lit(1)).cast("double").as("n2"),
      gather(col("x2")).as("sx2"), gather(col("y2")).as("sy2"),
      gather(col("x2") * col("x2")).as("sxx2"),
      gather(col("x2") * col("y2")).as("sxy2"),
      gather(col("y2") * col("y2")).as("syy2"))
    val den = col("n2") * col("sxx2") - col("sx2") * col("sx2")
    val b1 = (col("n2") * col("sxy2") - col("sx2") * col("sy2")) / den
    val b0 = (col("sy2") - b1 * col("sx2")) / col("n2")
    val sse = col("syy2") - b0 * col("sy2") - b1 * col("sxy2")
    ag.select(col("n").as("n_days"), round(col("b"), 6).as("b_coint"),
      round(b1, 6).as("rho"),
      round(b1 / sqrt(sse / (col("n2") - lit(2.0)) * col("n2") / den), 6)
        .as("t_eg"))
  }

  private[graft] lazy val anCointegrationSql =
    """WITH sp AS (SELECT
      |    date_diff('day', DATE '1992-01-01', CAST(date_trunc('day', l_shipdate) AS DATE)) AS d,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS y
      |  FROM lineitem GROUP BY date_trunc('day', l_shipdate)),
      |tot AS (SELECT COUNT(*) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
      |    CAST(SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
      |    CAST(SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy
      |  FROM sp),
      |cm AS (SELECT n,
      |    CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DECIMAL(38,0)) AS cxx,
      |    CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DECIMAL(38,0)) AS cxy,
      |    sx, sy FROM tot),
      |resid AS (SELECT d, n, CAST(cxy AS DOUBLE) / CAST(cxx AS DOUBLE) AS b,
      |    CAST(cxx * (CAST(n AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) - sy)
      |       - cxy * (CAST(n AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) - sx) AS DECIMAL(38,0)) AS r
      |  FROM sp CROSS JOIN cm),
      |rm AS (SELECT MAX(ABS(r)) AS rmax FROM resid),
      |u AS (SELECT n, b, CAST(r AS DOUBLE) / CAST(rmax AS DOUBLE) AS u,
      |    LAG(CAST(r AS DOUBLE) / CAST(rmax AS DOUBLE)) OVER (ORDER BY d) AS xl
      |  FROM resid CROSS JOIN rm),
      |df AS (SELECT n, b, xl AS x2, u - xl AS y2 FROM u WHERE xl IS NOT NULL),
      |ag AS (SELECT MAX(n) AS n, MAX(b) AS b, CAST(COUNT(*) AS DOUBLE) AS n2,
      |    CAST(SUM(CAST(x2 AS DECIMAL(38,18))) AS DOUBLE) AS sx2,
      |    CAST(SUM(CAST(y2 AS DECIMAL(38,18))) AS DOUBLE) AS sy2,
      |    CAST(SUM(CAST(x2 * x2 AS DECIMAL(38,18))) AS DOUBLE) AS sxx2,
      |    CAST(SUM(CAST(x2 * y2 AS DECIMAL(38,18))) AS DOUBLE) AS sxy2,
      |    CAST(SUM(CAST(y2 * y2 AS DECIMAL(38,18))) AS DOUBLE) AS syy2
      |  FROM df),
      |fit AS (SELECT n, b, n2, sx2, sy2, sxx2, sxy2, syy2,
      |    (n2 * sxy2 - sx2 * sy2) / (n2 * sxx2 - sx2 * sx2) AS b1
      |  FROM ag)
      |SELECT n AS n_days, ROUND(b, 6) AS b_coint, ROUND(b1, 6) AS rho,
      |  ROUND(b1 / sqrt((syy2 - ((sy2 - b1 * sx2) / n2) * sy2 - b1 * sxy2)
      |    / (n2 - 2.0) * n2 / (n2 * sxx2 - sx2 * sx2)), 6) AS t_eg
      |FROM fit""".stripMargin

  /** Lorenz asymmetry coefficient of order values — WHERE the
    * inequality that [[anGini]]/[[anLorenz]]/[[anPalma]]/[[anHoover]]
    * measure comes from: S = F(μ) + L(μ) with the Damgaard–Weiner
    * interpolation at the mean crossing; S < 1 means inequality is
    * driven by many small orders, S > 1 by few giant ones — the same
    * Gini admits both. The mean never materializes: "below μ" is the
    * exact integer predicate n·v < T, the boundary order statistics
    * x_m/x_m+1 are conditional min/max, and δ = (T − n·x_m)/(n·(x_m+1
    * − x_m)) is exact integers to ONE division. F, L, S scale-free,
    * ROUND(·,6). */
  private[graft] def anLorenzAsymmetry(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val o = Tables.orders(s, dir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100)
        .cast("bigint").as("v"))
    val tot = o.agg(count(lit(1)).as("n"), sum(d38(col("v"))).as("t"))
    val below = d38(col("n")) * d38(col("v")) < col("t")
    val ag = o.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"), max(col("t")).as("t"),
        sum(below.cast("long")).as("m"),
        sum(when(below, d38(col("v"))).otherwise(lit(0).cast("decimal(38,0)")))
          .as("lm"),
        max(when(below, col("v"))).as("xm"),
        min(when(!below, col("v"))).as("xm1"))
    val nd = col("n").cast("double")
    val delta = (col("t").cast("double") - nd * col("xm").cast("double")) /
      (nd * (col("xm1") - col("xm")).cast("double"))
    val f = (col("m").cast("double") + delta) / nd
    val l = (col("lm").cast("double") + delta * col("xm1").cast("double")) /
      col("t").cast("double")
    ag.select(col("n"), round(f, 6).as("f_mu"), round(l, 6).as("l_mu"),
      round(f + l, 6).as("lac"))
  }

  private[graft] lazy val anLorenzAsymmetrySql =
    """WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |           FROM orders),
      |tot AS (SELECT COUNT(*) AS n, CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS t FROM o),
      |ag AS (SELECT MAX(n) AS n, MAX(t) AS t,
      |    CAST(SUM(CASE WHEN CAST(n AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0)) < t THEN 1 ELSE 0 END) AS BIGINT) AS m,
      |    CAST(SUM(CASE WHEN CAST(n AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0)) < t
      |             THEN CAST(v AS DECIMAL(38,0)) ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0)) AS lm,
      |    MAX(CASE WHEN CAST(n AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0)) < t THEN v END) AS xm,
      |    MIN(CASE WHEN CAST(n AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0)) >= t THEN v END) AS xm1
      |  FROM o CROSS JOIN tot),
      |d AS (SELECT n, m, lm, t, xm, xm1,
      |    (CAST(t AS DOUBLE) - CAST(n AS DOUBLE) * CAST(xm AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(xm1 - xm AS DOUBLE)) AS delta
      |  FROM ag)
      |SELECT n,
      |  ROUND((CAST(m AS DOUBLE) + delta) / CAST(n AS DOUBLE), 6) AS f_mu,
      |  ROUND((CAST(lm AS DOUBLE) + delta * CAST(xm1 AS DOUBLE)) / CAST(t AS DOUBLE), 6) AS l_mu,
      |  ROUND((CAST(m AS DOUBLE) + delta) / CAST(n AS DOUBLE)
      |      + (CAST(lm AS DOUBLE) + delta * CAST(xm1 AS DOUBLE)) / CAST(t AS DOUBLE), 6) AS lac
      |FROM d""".stripMargin
}

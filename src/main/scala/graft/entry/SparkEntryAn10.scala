package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-19 fourth analytics wave: the NORMAL-SCORES test family, built
  * on one shared inverse-normal-CDF kernel — van der Waerden's k-sample
  * location test, Shapiro–Francia normality, and Fligner–Killeen's
  * k-sample scale test. Same scope rules as
  * [[SparkEntryAn1]]–[[SparkEntryAn9]] (self-typed to the registry
  * object, SQL twins beside each kernel, exact integer/decimal algebra
  * until one shared IEEE emission tree, scale-free emissions,
  * ROUND(·,6)).
  *
  * Φ⁻¹ is Acklam's piecewise rational approximation (|rel err| <
  * 1.15e-9 — public-domain coefficients), emitted as the IDENTICAL
  * literal Horner tree on both engines ([[normInv]] builds the Column
  * tree, [[normInvSql]] prints the same association order as SQL text),
  * so the two sides agree to the shared-IEEE-tree contract the rest of
  * the board relies on. */
private[graft] trait SparkEntryAn10 { this: SparkEntry.type =>

  /** Acklam inverse normal CDF Φ⁻¹(p), p ∈ (0,1) strictly. The Horner
    * association here MUST match [[normInvSql]] token for token. */
  private[graft] def normInv(p: Column): Column = {
    val qc = p - lit(0.5)
    val r = qc * qc
    val xc = (((((lit(-3.969683028665376e+01) * r + lit(2.209460984245205e+02)) * r +
      lit(-2.759285104469687e+02)) * r + lit(1.383577518672690e+02)) * r +
      lit(-3.066479806614716e+01)) * r + lit(2.506628277459239e+00)) * qc /
      ((((((lit(-5.447609879822406e+01) * r + lit(1.615858368580409e+02)) * r +
        lit(-1.556989798598866e+02)) * r + lit(6.680131188771972e+01)) * r +
        lit(-1.328068155288572e+01)) * r) + lit(1.0))
    val pl = least(p, lit(1.0) - p)
    val qt = sqrt(lit(-2.0) * log(pl))
    val xt = (((((lit(-7.784894002430293e-03) * qt + lit(-3.223964580411365e-01)) * qt +
      lit(-2.400758277161838e+00)) * qt + lit(-2.549732539343734e+00)) * qt +
      lit(4.374664141464968e+00)) * qt + lit(2.938163982698783e+00)) /
      (((((lit(7.784695709041462e-03) * qt + lit(3.224671290700398e-01)) * qt +
        lit(2.445134137142996e+00)) * qt + lit(3.754408661907416e+00)) * qt) + lit(1.0))
    when(pl < lit(0.02425), when(p < lit(0.5), xt).otherwise(-xt)).otherwise(xc)
  }

  /** SQL twin of [[normInv]]: the same piecewise Horner tree printed
    * for DuckDB, with `p` an expression string (keep it a bare column
    * reference from a prior CTE — it is repeated many times). The
    * argument is parenthesized before substitution: an arg like
    * "0.5 + x" would otherwise turn `1.0 - $p` into (1.0 − 0.5) + x —
    * the precedence bug that silently collapsed the upper-tail branch
    * to LEAST(p, p) on first write (caught by the sf0.01 hash gate). */
  private[graft] def normInvSql(p0: String): String = {
    val p = s"($p0)"
    val xc = s"(((((-3.969683028665376e+01 * (($p - 0.5) * ($p - 0.5)) + 2.209460984245205e+02) * (($p - 0.5) * ($p - 0.5)) + " +
      s"-2.759285104469687e+02) * (($p - 0.5) * ($p - 0.5)) + 1.383577518672690e+02) * (($p - 0.5) * ($p - 0.5)) + " +
      s"-3.066479806614716e+01) * (($p - 0.5) * ($p - 0.5)) + 2.506628277459239e+00) * ($p - 0.5) / " +
      s"((((((-5.447609879822406e+01 * (($p - 0.5) * ($p - 0.5)) + 1.615858368580409e+02) * (($p - 0.5) * ($p - 0.5)) + " +
      s"-1.556989798598866e+02) * (($p - 0.5) * ($p - 0.5)) + 6.680131188771972e+01) * (($p - 0.5) * ($p - 0.5)) + " +
      s"-1.328068155288572e+01) * (($p - 0.5) * ($p - 0.5))) + 1.0)"
    val qt = s"sqrt(-2.0 * ln(LEAST($p, 1.0 - $p)))"
    val xt = s"(((((-7.784894002430293e-03 * $qt + -3.223964580411365e-01) * $qt + " +
      s"-2.400758277161838e+00) * $qt + -2.549732539343734e+00) * $qt + " +
      s"4.374664141464968e+00) * $qt + 2.938163982698783e+00) / " +
      s"(((((7.784695709041462e-03 * $qt + 3.224671290700398e-01) * $qt + " +
      s"2.445134137142996e+00) * $qt + 3.754408661907416e+00) * $qt) + 1.0)"
    s"CASE WHEN LEAST($p, 1.0 - $p) < 0.02425 THEN " +
      s"(CASE WHEN $p < 0.5 THEN ($xt) ELSE -($xt) END) ELSE ($xc) END"
  }

  /** Van der Waerden k-sample normal-scores test of order value across
    * the five priorities — [[anKruskal]] with the midranks pushed
    * through Φ⁻¹(r/(N+1)): asymptotically the most efficient rank test
    * under normal shift alternatives (ARE = 1 vs ANOVA), while keeping
    * Kruskal–Wallis's outlier immunity. ONE pooled PrefixSum scan
    * gives every distinct value's doubled midrank exactly; scores are
    * per-DISTINCT-VALUE doubles (bounded ±6), tie-handling inherited
    * from the midrank; T = Σ_g A_g²/n_g / s² with s² = Σa²/(N−1) reads
    * against χ²(k−1). Per-group gathers DECIMAL(38,12), the k-row
    * T-sum DECIMAL(38,18), ROUND(·,6). */
  private[graft] def anVanDerWaerden(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("g"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val perV = o.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt"))
      .select(col("v"), col("cnt"),
        (lit(2L) * (col("cnt_cum") - col("cnt")) + col("cnt") + lit(1L)).as("r2"))
    val grand = scan.agg(sum(col("cnt")).as("n"))
    val scored = scan.crossJoin(broadcast(grand))
      .select(col("v"), col("cnt"), col("n"),
        normInv(col("r2").cast("double") /
          (lit(2.0) * (col("n") + lit(1L)).cast("double"))).as("a"))
    val s2row = scored.agg(max(col("n")).as("n"),
      sum((col("cnt").cast("double") * col("a") * col("a"))
        .cast("decimal(38,12)")).cast("double").as("saa"))
    val perG = o.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
      .join(scored.select(col("v"), col("a")), Seq("v"))
      .groupBy(col("g"))
      .agg(sum(col("c")).as("n_g"),
        sum((col("c").cast("double") * col("a")).cast("decimal(38,12)"))
          .cast("double").as("t_g"))
    perG.crossJoin(broadcast(s2row))
      .select(col("n"), col("saa"),
        (col("t_g") * col("t_g") / col("n_g").cast("double"))
          .cast("decimal(38,18)").as("term"))
      .groupBy(col("n"), col("saa"))
      .agg(count(lit(1)).as("k"), sum(col("term")).as("tsum"))
      .select(col("k"), col("n"), (col("k") - 1).as("df"),
        round(col("tsum").cast("double") /
          (col("saa") / (col("n") - lit(1L)).cast("double")), 6).as("t_vdw"))
  }

  private[graft] lazy val anVanDerWaerdenSql = {
    val arg = "CAST(r2 AS DOUBLE) / (2.0 * CAST(n + 1 AS DOUBLE))"
    s"""WITH o AS (SELECT o_orderpriority AS g,
       |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
       |  FROM orders),
       |pv AS (SELECT v, COUNT(*) AS cnt FROM o GROUP BY v),
       |cv AS (SELECT v, cnt,
       |         2 * (CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) - cnt) + cnt + 1 AS r2
       |       FROM pv),
       |grand AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cv),
       |scored AS (SELECT v, cnt, n, ${normInvSql(arg)} AS a
       |           FROM cv CROSS JOIN grand),
       |s2row AS (SELECT MAX(n) AS n,
       |    CAST(SUM(CAST(CAST(cnt AS DOUBLE) * a * a AS DECIMAL(38,12))) AS DOUBLE) AS saa
       |  FROM scored),
       |pg AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_g,
       |    CAST(SUM(CAST(CAST(c AS DOUBLE) * a AS DECIMAL(38,12))) AS DOUBLE) AS t_g
       |  FROM (SELECT g, o.v, COUNT(*) AS c FROM o GROUP BY g, o.v) gv
       |  JOIN (SELECT v, a FROM scored) sc ON gv.v = sc.v GROUP BY g),
       |terms AS (SELECT n, saa,
       |    CAST(t_g * t_g / CAST(n_g AS DOUBLE) AS DECIMAL(38,18)) AS term
       |  FROM pg CROSS JOIN s2row),
       |ag AS (SELECT n, saa, COUNT(*) AS k,
       |         CAST(SUM(term) AS DECIMAL(38,18)) AS tsum
       |       FROM terms GROUP BY n, saa)
       |SELECT k, n, k - 1 AS df,
       |  ROUND(CAST(tsum AS DOUBLE) / (saa / CAST(n - 1 AS DOUBLE)), 6) AS t_vdw
       |FROM ag""".stripMargin
  }

  /** Shapiro–Francia normality of DAILY revenue — the normal-scores
    * correlation view beside [[anJarqueBera]] (moment form) and
    * [[anLilliefors]] (ECDF form): W' = (Σ m·x)² / (Σm² · SS_x) with
    * m_i = Φ⁻¹((i − 3/8)/(n + 1/4)) the Blom expected normal order
    * statistics. The spine is calendar-bounded, so the global sort
    * rank is the day-spine allowlist class; the (rev, day) composite
    * order key makes the rank deterministic under ties. SS_x exact
    * n-scaled integers; Σm·x and Σm² DECIMAL(38,12)-gathered; W' and
    * the score correlation √W' scale-free, ROUND(·,6). */
  private[graft] def anShapiroFrancia(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val w = Window.orderBy(col("rev_c"), col("d"))
    val ranked = sp.withColumn("i", row_number().over(w))
    val tot = sp.agg(count(lit(1)).as("n"), sum(d38(col("rev_c"))).as("sx"),
      sum((d38(col("rev_c")) * d38(col("rev_c"))).cast("decimal(38,0)")).as("sxx"))
    val scored = ranked.crossJoin(broadcast(tot))
      .select(col("rev_c"), col("n"), col("sx"), col("sxx"),
        normInv((col("i").cast("double") - lit(0.375)) /
          (col("n").cast("double") + lit(0.25))).as("m"))
    val ag = scored.groupBy(col("n"), col("sx"), col("sxx"))
      .agg(sum((col("m") * col("rev_c").cast("double")).cast("decimal(38,12)"))
          .cast("double").as("smx"),
        sum((col("m") * col("m")).cast("decimal(38,12)")).cast("double").as("smm"))
    val ssx = (d38(col("n")) * col("sxx") - col("sx") * col("sx"))
      .cast("decimal(38,0)").cast("double") / col("n").cast("double")
    val wprime = col("smx") * col("smx") / (col("smm") * ssx)
    ag.select(col("n"), round(wprime, 6).as("w_prime"),
      round(sqrt(wprime), 6).as("score_corr"))
  }

  private[graft] lazy val anShapiroFranciaSql = {
    val arg = "(CAST(i AS DOUBLE) - 0.375) / (CAST(n AS DOUBLE) + 0.25)"
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |rk AS (SELECT rev_c, ROW_NUMBER() OVER (ORDER BY rev_c, d) AS i FROM sp),
       |tot AS (SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
       |    CAST(SUM(CAST(CAST(rev_c AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx
       |  FROM sp),
       |scored AS (SELECT rev_c, n, sx, sxx, ${normInvSql(arg)} AS m
       |           FROM rk CROSS JOIN tot),
       |ag AS (SELECT n, sx, sxx,
       |    CAST(SUM(CAST(m * CAST(rev_c AS DOUBLE) AS DECIMAL(38,12))) AS DOUBLE) AS smx,
       |    CAST(SUM(CAST(m * m AS DECIMAL(38,12))) AS DOUBLE) AS smm
       |  FROM scored GROUP BY n, sx, sxx)
       |SELECT n,
       |  ROUND(smx * smx / (smm * (CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS w_prime,
       |  ROUND(sqrt(smx * smx / (smm * (CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE) / CAST(n AS DOUBLE)))), 6) AS score_corr
       |FROM ag""".stripMargin
  }

  /** Fligner–Killeen k-sample scale test of order values across the
    * five priorities — the robust "do the groups differ in SPREAD"
    * battery member beside [[anLevene]]/[[anBrownForsythe]] (mean/
    * median absolute deviations) and [[anAnsariBradley]]/
    * [[anMoodScale]] (two-sample ranks): rank |x − median_g| pooled,
    * score a = Φ⁻¹(½ + r/(2(N+1))), X² = Σ n_g(Ā_g − ā)² / V². The
    * per-group medians come off ONE composite (g, value) PrefixSum
    * scan (the an_quantiles_by_group probe machinery — doubled median
    * 2·m_g stays an exact integer, so u = |2v − 2m_g| never rounds);
    * the pooled ranks off a SECOND scan over distinct u. Scores are
    * per-distinct-u doubles, group gathers DECIMAL(38,12), X²
    * scale-free against χ²(k−1), ROUND(·,6). */
  private[graft] def anFlignerKilleen(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("g"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    // per-group doubled median off the composite scan
    val scan = graft.operators.PrefixSum.distinctRunningCounts(o, Seq("g", "v"))
    val wOff = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, -1)
    val probes = o.groupBy("g").agg(count(lit(1)).as("n_g"))
      .withColumn("off", coalesce(sum("n_g").over(wOff), lit(0L)))
      .withColumn("k_lo", expr("(n_g + 1) div 2"))
      .withColumn("k_hi", expr("(n_g + 2) div 2"))
    val hitLo = col("cum") >= col("k_lo") && col("cum") - col("cnt") < col("k_lo")
    val hitHi = col("cum") >= col("k_hi") && col("cum") - col("cnt") < col("k_hi")
    val med = scan.join(broadcast(probes), Seq("g"))
      .withColumn("cum", col("cnt_cum") - col("off"))
      .filter(hitLo || hitHi)
      .groupBy(col("g"))
      .agg((max(when(hitLo, col("v"))) + max(when(hitHi, col("v")))).as("m2"))
    // pooled ranks of the doubled absolute deviations
    val u = o.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(lit(2L) * col("v") - col("m2")).as("u"))
    val perU = u.groupBy(col("u")).agg(count(lit(1)).as("cnt"))
    val uscan = graft.operators.PrefixSum.withRunningTotals(perU, Seq("u"), Seq("cnt"))
      .select(col("u"), col("cnt"),
        (lit(2L) * (col("cnt_cum") - col("cnt")) + col("cnt") + lit(1L)).as("r2"))
    val grand = uscan.agg(sum(col("cnt")).as("n"))
    val scored = uscan.crossJoin(broadcast(grand))
      .select(col("u"), col("cnt"), col("n"),
        normInv(lit(0.5) + col("r2").cast("double") /
          (lit(4.0) * (col("n") + lit(1L)).cast("double"))).as("a"))
    val tot = scored.agg(max(col("n")).as("n"),
      sum((col("cnt").cast("double") * col("a")).cast("decimal(38,12)"))
        .cast("double").as("sa"),
      sum((col("cnt").cast("double") * col("a") * col("a"))
        .cast("decimal(38,12)")).cast("double").as("saa"))
    val perG = u.groupBy(col("g"), col("u")).agg(count(lit(1)).as("c"))
      .join(scored.select(col("u"), col("a")), Seq("u"))
      .groupBy(col("g"))
      .agg(sum(col("c")).as("n_g"),
        sum((col("c").cast("double") * col("a")).cast("decimal(38,12)"))
          .cast("double").as("a_g"))
    val nd = col("n").cast("double")
    val abar = col("sa") / nd
    val v2 = (col("saa") - col("sa") * col("sa") / nd) / (nd - lit(1.0))
    perG.crossJoin(broadcast(tot))
      .select(col("n"), col("sa"), col("saa"),
        (col("n_g").cast("double") *
          (col("a_g") / col("n_g").cast("double") - abar) *
          (col("a_g") / col("n_g").cast("double") - abar))
          .cast("decimal(38,18)").as("term"))
      .groupBy(col("n"), col("sa"), col("saa"))
      .agg(count(lit(1)).as("k"), sum(col("term")).as("tsum"))
      .select(col("k"), col("n"), (col("k") - 1).as("df"),
        round(col("tsum").cast("double") / v2, 6).as("x2_fk"))
  }

  private[graft] lazy val anFlignerKilleenSql = {
    val arg = "0.5 + CAST(r2 AS DOUBLE) / (4.0 * CAST(n + 1 AS DOUBLE))"
    s"""WITH o AS (SELECT o_orderpriority AS g,
       |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
       |  FROM orders),
       |gv AS (SELECT g, v, COUNT(*) AS cnt FROM o GROUP BY g, v),
       |sc AS (SELECT g, v, cnt,
       |         CAST(SUM(cnt) OVER (ORDER BY g, v) AS BIGINT) AS cnt_cum
       |       FROM gv),
       |pr AS (SELECT g, COUNT(*) AS n_g FROM o GROUP BY g),
       |pro AS (SELECT g, n_g,
       |    COALESCE(CAST(SUM(n_g) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off,
       |    (n_g + 1) // 2 AS k_lo, (n_g + 2) // 2 AS k_hi
       |  FROM pr),
       |med AS (SELECT sc.g,
       |    MAX(CASE WHEN sc.cnt_cum - off >= k_lo AND sc.cnt_cum - off - sc.cnt < k_lo THEN v END)
       |      + MAX(CASE WHEN sc.cnt_cum - off >= k_hi AND sc.cnt_cum - off - sc.cnt < k_hi THEN v END) AS m2
       |  FROM sc JOIN pro ON sc.g = pro.g
       |  WHERE (sc.cnt_cum - off >= k_lo AND sc.cnt_cum - off - sc.cnt < k_lo)
       |     OR (sc.cnt_cum - off >= k_hi AND sc.cnt_cum - off - sc.cnt < k_hi)
       |  GROUP BY sc.g),
       |uu AS (SELECT o.g, ABS(2 * v - m2) AS u FROM o JOIN med ON o.g = med.g),
       |pu AS (SELECT u, COUNT(*) AS cnt FROM uu GROUP BY u),
       |cu AS (SELECT u, cnt,
       |         2 * (CAST(SUM(cnt) OVER (ORDER BY u) AS BIGINT) - cnt) + cnt + 1 AS r2
       |       FROM pu),
       |grand AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cu),
       |scored AS (SELECT u, cnt, n, ${normInvSql(arg)} AS a
       |           FROM cu CROSS JOIN grand),
       |tot AS (SELECT MAX(n) AS n,
       |    CAST(SUM(CAST(CAST(cnt AS DOUBLE) * a AS DECIMAL(38,12))) AS DOUBLE) AS sa,
       |    CAST(SUM(CAST(CAST(cnt AS DOUBLE) * a * a AS DECIMAL(38,12))) AS DOUBLE) AS saa
       |  FROM scored),
       |pg AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_g,
       |    CAST(SUM(CAST(CAST(c AS DOUBLE) * a AS DECIMAL(38,12))) AS DOUBLE) AS a_g
       |  FROM (SELECT g, u, COUNT(*) AS c FROM uu GROUP BY g, u) gu
       |  JOIN (SELECT u, a FROM scored) s2 ON gu.u = s2.u GROUP BY g),
       |terms AS (SELECT n, sa, saa,
       |    CAST(CAST(n_g AS DOUBLE)
       |      * (a_g / CAST(n_g AS DOUBLE) - sa / CAST(n AS DOUBLE))
       |      * (a_g / CAST(n_g AS DOUBLE) - sa / CAST(n AS DOUBLE)) AS DECIMAL(38,18)) AS term
       |  FROM pg CROSS JOIN tot),
       |ag AS (SELECT n, sa, saa, COUNT(*) AS k,
       |         CAST(SUM(term) AS DECIMAL(38,18)) AS tsum
       |       FROM terms GROUP BY n, sa, saa)
       |SELECT k, n, k - 1 AS df,
       |  ROUND(CAST(tsum AS DOUBLE)
       |    / ((saa - sa * sa / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)), 6) AS x2_fk
       |FROM ag""".stripMargin
  }
}

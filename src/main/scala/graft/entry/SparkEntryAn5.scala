package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-18 analytics wave: goodness-of-fit / heteroscedasticity /
  * forecast-quality / records / concentration additions over the shared
  * spines, in a fifth trait file (same scope rules as
  * [[SparkEntryAn1]]–[[SparkEntryAn4]]: self-typed to the registry
  * object, SQL twins beside each kernel, exact integer/decimal algebra
  * until one emission-time division, ROUND(·,6)). */
private[graft] trait SparkEntryAn5 { this: SparkEntry.type =>

  /** Kuiper's V test of customer balances against N(μ̂, σ̂²) — the
    * ROTATION-invariant companion to [[anLilliefors]]: V = D⁺ + D⁻
    * weights both EDF tails equally (KS's D = max of the two is
    * center-heavy), the standard choice for cyclic/boundary-sensitive
    * deviation. Same machinery: μ̂/σ̂ from exact decimal sums, two-sided
    * EDF gaps per distinct cent value off ONE
    * [[graft.operators.PrefixSum]] scan, Φ via the shared Zelen–Severo
    * rational tail. V and √n·V ROUND(·,6). */
  private[graft] def anKuiper(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val v = Tables.customer(s, dir)
      .select((col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val perV = v.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt"))
    val tot = v.agg(count(lit(1)).as("n"), sum(d38(col("v"))).as("s1"),
      sum((d38(col("v")) * d38(col("v"))).cast("decimal(38,0)")).as("s2"))
    val nd = col("n").cast("double")
    val mu = col("s1").cast("double") / nd
    val sd = sqrt((d38(col("n")) * col("s2") - col("s1") * col("s1")).cast("double") /
      (nd * (nd - lit(1.0))))
    val z = (col("v").cast("double") - mu) / sd
    val az = abs(z)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) + t *
      (lit(1.781477937) + t * (lit(-1.821255978) + t * lit(1.330274429)))))
    val phiAbs = lit(1.0) - lit(0.3989422804014327) * exp(lit(-0.5) * az * az) * poly
    val cdf = when(z >= 0, phiAbs).otherwise(lit(1.0) - phiAbs)
    scan.crossJoin(broadcast(tot))
      .select(col("n"),
        (col("cnt_cum").cast("double") / nd - cdf).as("up"),
        (cdf - (col("cnt_cum") - col("cnt")).cast("double") / nd).as("dn"))
      .groupBy(col("n")).agg(max(col("up")).as("dp"), max(col("dn")).as("dm"))
      .select(col("n"), round(col("dp") + col("dm"), 6).as("v_stat"),
        round(sqrt(col("n").cast("double")) * (col("dp") + col("dm")), 6)
          .as("sqrt_n_v"))
  }

  private[graft] lazy val anKuiperSql = {
    val z = "((CAST(v AS DOUBLE) - mu) / sd)"
    val az = s"ABS($z)"
    val t = s"(1.0 / (1.0 + 0.2316419 * $az))"
    val poly = s"($t * (0.319381530 + $t * (-0.356563782 + $t * " +
      s"(1.781477937 + $t * (-1.821255978 + $t * 1.330274429)))))"
    val phiAbs = s"(1.0 - 0.3989422804014327 * EXP(-0.5 * $az * $az) * $poly)"
    val cdf = s"(CASE WHEN $z >= 0 THEN $phiAbs ELSE 1.0 - $phiAbs END)"
    s"""WITH b AS (SELECT CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
       |  FROM customer),
       |pv AS (SELECT v, COUNT(*) AS cnt FROM b GROUP BY v),
       |sc AS (SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum
       |       FROM pv),
       |tot AS (SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
       |    CAST(SUM(CAST(CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
       |  FROM b),
       |ms AS (SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
       |    sqrt(CAST(CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1 AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) AS sd
       |  FROM tot),
       |gaps AS (SELECT n,
       |    CAST(cnt_cum AS DOUBLE) / CAST(n AS DOUBLE) - $cdf AS up,
       |    $cdf - CAST(cnt_cum - cnt AS DOUBLE) / CAST(n AS DOUBLE) AS dn
       |  FROM sc CROSS JOIN ms)
       |SELECT n, ROUND(MAX(up) + MAX(dn), 6) AS v_stat,
       |  ROUND(sqrt(CAST(n AS DOUBLE)) * (MAX(up) + MAX(dn)), 6) AS sqrt_n_v
       |FROM gaps GROUP BY n""".stripMargin
  }

  /** Goldfeld–Quandt heteroscedasticity test on the daily-revenue trend
    * fit — the split-sample complement to [[anBreuschPagan]]'s
    * auxiliary regression: OLS of rev on day separately over the FIRST
    * and LAST thirds of the time-ordered spine (middle third dropped,
    * the classical power choice), F = (SSE₂/df₂)/(SSE₁/df₁) detects
    * variance growing with the regressor. Segment moments are exact
    * DECIMAL(38,0) power sums; SSE via the centered closed form in one
    * shared IEEE tree (the magnitudes pass 2^53, so the emission is
    * ROUND(·,6) with ~9 orders of margin over the cast ulp — the
    * an_granger boundary contract). Spine-bounded frames throughout. */
  private[graft] def anGoldfeldQuandt(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wd = Window.orderBy("d")
    val n = sp.agg(count(lit(1)).as("n"))
    val seg = sp.withColumn("t", row_number().over(wd).cast("long"))
      .crossJoin(broadcast(n))
      .withColumn("g",
        when(col("t") <= expr("n div 3"), lit(1L))
          .when(col("t") > col("n") - expr("n div 3"), lit(2L)))
      .filter(col("g").isNotNull)
    val m = seg.groupBy(col("g"))
      .agg(count(lit(1)).as("ng"),
        sum(d38(col("d"))).as("sx"), sum(d38(col("rev_c"))).as("sy"),
        sum((d38(col("d")) * d38(col("d"))).cast("decimal(38,0)")).as("sxx"),
        sum((d38(col("d")) * d38(col("rev_c"))).cast("decimal(38,0)")).as("sxy"),
        sum((d38(col("rev_c")) * d38(col("rev_c"))).cast("decimal(38,0)")).as("syy"))
    val ngd = col("ng").cast("double")
    val cxx = (d38(col("ng")) * col("sxx") - col("sx") * col("sx")).cast("double")
    val cxy = (d38(col("ng")) * col("sxy") - col("sx") * col("sy")).cast("double")
    val cyy = (d38(col("ng")) * col("syy") - col("sy") * col("sy")).cast("double")
    val sse = (cyy - cxy * cxy / cxx) / ngd
    val withSse = m.select(col("g"), col("ng"), sse.as("sse"))
    val one = withSse.filter(col("g") === 1)
      .select(col("ng").as("n1"), col("sse").as("sse1"))
    val two = withSse.filter(col("g") === 2)
      .select(col("ng").as("n2"), col("sse").as("sse2"))
    one.crossJoin(broadcast(two))
      .select(col("n1"), col("n2"),
        round((col("sse2") / (col("n2").cast("double") - lit(2.0))) /
          (col("sse1") / (col("n1").cast("double") - lit(2.0))), 6).as("f_gq"))
  }

  private[graft] lazy val anGoldfeldQuandtSql = {
    val cxx = "CAST(CAST(ng AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)"
    val cxy = "CAST(CAST(ng AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)"
    val cyy = "CAST(CAST(ng AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)"
    val sse = s"(($cyy - $cxy * $cxy / $cxx) / CAST(ng AS DOUBLE))"
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c,
       |         CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t
       |       FROM daily),
       |nn AS (SELECT COUNT(*) AS n FROM sp),
       |seg AS (SELECT d, rev_c,
       |          CASE WHEN t <= n // 3 THEN 1
       |               WHEN t > n - n // 3 THEN 2 END AS g
       |        FROM sp CROSS JOIN nn),
       |m AS (SELECT g, COUNT(*) AS ng,
       |    CAST(SUM(CAST(d AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
       |    CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
       |    CAST(SUM(CAST(CAST(d AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
       |    CAST(SUM(CAST(CAST(d AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
       |    CAST(SUM(CAST(CAST(rev_c AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy
       |  FROM seg WHERE g IS NOT NULL GROUP BY g),
       |se AS (SELECT g, ng, $sse AS sse FROM m)
       |SELECT a.ng AS n1, b.ng AS n2,
       |  ROUND((b.sse / (CAST(b.ng AS DOUBLE) - 2.0))
       |    / (a.sse / (CAST(a.ng AS DOUBLE) - 2.0)), 6) AS f_gq
       |FROM se a CROSS JOIN se b WHERE a.g = 1 AND b.g = 2""".stripMargin
  }

  /** Theil's U forecast-accuracy pair for the seasonal-naive
    * one-week-back forecast of daily revenue — the SCALE-FREE quality
    * numbers beside [[anMase]]'s absolute-error ratio: U1 ∈ [0,1]
    * (RMSE over the sum of root mean squares, 0 = perfect) and U2
    * (RMSE of the forecast relative to the random-walk RMSE, < 1 =
    * beats naive persistence). Squared errors and squares are exact
    * DECIMAL(38,0) off two lag windows over the calendar-bounded
    * spine; three square roots + two divisions at emission,
    * ROUND(·,6). */
  private[graft] def anTheilU(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wd = Window.orderBy("d")
    val f = sp.withColumn("fc", lag(col("rev_c"), 7).over(wd))
      .withColumn("py", lag(col("rev_c"), 1).over(wd))
      .filter(col("fc").isNotNull && col("py").isNotNull)
    val agg = f.agg(count(lit(1)).as("n"),
      sum((d38(col("rev_c") - col("fc")) * d38(col("rev_c") - col("fc")))
        .cast("decimal(38,0)")).as("se"),
      sum((d38(col("rev_c")) * d38(col("rev_c"))).cast("decimal(38,0)")).as("sy"),
      sum((d38(col("fc")) * d38(col("fc"))).cast("decimal(38,0)")).as("sf"),
      sum((d38(col("rev_c") - col("py")) * d38(col("rev_c") - col("py")))
        .cast("decimal(38,0)")).as("sw"))
    val nd = col("n").cast("double")
    agg.select(col("n").as("n_eval"),
      round(sqrt(col("se").cast("double") / nd) /
        (sqrt(col("sy").cast("double") / nd) + sqrt(col("sf").cast("double") / nd)),
        6).as("u1"),
      round(sqrt(col("se").cast("double")) / sqrt(col("sw").cast("double")), 6)
        .as("u2"))
  }

  private[graft] lazy val anTheilUSql =
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |f AS (SELECT rev_c,
       |        LAG(rev_c, 7) OVER (ORDER BY d) AS fc,
       |        LAG(rev_c, 1) OVER (ORDER BY d) AS py
       |      FROM sp),
       |ag AS (SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST(CAST(rev_c - fc AS DECIMAL(38,0)) * CAST(rev_c - fc AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS se,
       |    CAST(SUM(CAST(CAST(rev_c AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
       |    CAST(SUM(CAST(CAST(fc AS DECIMAL(38,0)) * CAST(fc AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sf,
       |    CAST(SUM(CAST(CAST(rev_c - py AS DECIMAL(38,0)) * CAST(rev_c - py AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sw
       |  FROM f WHERE fc IS NOT NULL AND py IS NOT NULL)
       |SELECT n AS n_eval,
       |  ROUND(sqrt(CAST(se AS DOUBLE) / CAST(n AS DOUBLE))
       |    / (sqrt(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
       |     + sqrt(CAST(sf AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS u1,
       |  ROUND(sqrt(CAST(se AS DOUBLE)) / sqrt(CAST(sw AS DOUBLE)), 6) AS u2
       |FROM ag""".stripMargin

  /** CUSUM-of-squares variance-instability scan on daily revenue
    * (Brown–Durbin–Evans shape) — the VARIANCE companion to
    * [[anCusum]]'s mean-drift alarm and [[anChangepoint]]'s mean-shift
    * scan: s_k = Σ_{i≤k} y²/Σy² should climb the diagonal k/n; the
    * maximum excursion max_k |s_k − k/n| = max|n·P_k − k·T|/(n·T)
    * flags a variance regime change at its argmax day. n·P_k − k·T is
    * EXACT DECIMAL(38,0) off one prefix scan; one division at
    * emission; argmax day by the exact integer excursion (earliest-day
    * tie-break), statistic ROUND(·,6). */
  private[graft] def anCusumSq(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wd = Window.orderBy("d")
    val cum = sp
      .withColumn("t", row_number().over(wd).cast("long"))
      .withColumn("p", sum((d38(col("rev_c")) * d38(col("rev_c")))
        .cast("decimal(38,0)")).over(wd))
    val tot = sp.agg(count(lit(1)).as("n"),
      sum((d38(col("rev_c")) * d38(col("rev_c"))).cast("decimal(38,0)")).as("ty"))
    val exc = cum.crossJoin(broadcast(tot))
      .select(col("d"), col("n"), col("ty"),
        abs(d38(col("n")) * col("p") - d38(col("t")) * col("ty"))
          .cast("decimal(38,0)").as("e"))
    val mx = exc.agg(max(col("e")).as("emax"))
    exc.crossJoin(broadcast(mx)).filter(col("e") === col("emax"))
      .orderBy(col("d")).limit(1)
      .select(col("n"), col("d").as("argmax_day"),
        round(col("emax").cast("double") /
          (d38(col("n")) * col("ty")).cast("double"), 6).as("cusum_sq_stat"))
  }

  private[graft] lazy val anCusumSqSql =
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |cum AS (SELECT d, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
       |          CAST(SUM(CAST(CAST(rev_c AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0)) AS DECIMAL(38,0))) OVER (ORDER BY d) AS DECIMAL(38,0)) AS p
       |        FROM sp),
       |tot AS (SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST(CAST(rev_c AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ty
       |  FROM sp),
       |exc AS (SELECT d, n, ty,
       |    CAST(ABS(CAST(n AS DECIMAL(38,0)) * p - CAST(t AS DECIMAL(38,0)) * ty) AS DECIMAL(38,0)) AS e
       |  FROM cum CROSS JOIN tot),
       |mx AS (SELECT MAX(e) AS emax FROM exc)
       |SELECT n, d AS argmax_day,
       |  ROUND(CAST(emax AS DOUBLE) / CAST(CAST(n AS DECIMAL(38,0)) * ty AS DOUBLE), 6) AS cusum_sq_stat
       |FROM exc CROSS JOIN mx WHERE e = emax
       |ORDER BY d LIMIT 1""".stripMargin

  /** Bartels' rank version of the von Neumann ratio on daily revenue —
    * the RANK-based randomness screen beside [[anVonNeumann]] (raw
    * values) and [[anRunsUpdown]] (signs): RVN = Σ(R_t − R_{t+1})² /
    * Σ(R_t − R̄)² with midranks for ties, ≈ 2 under randomness,
    * small under trend. Using TWICE-midranks A = 2·clt + ceq + 1 (the
    * [[anPettitt]] integer machinery) both sums stay EXACT BIGINTs
    * (ΣA = n(n+1) identically, so the denominator is ΣA² − n(n+1)²;
    * the common factor 4 cancels); one division, z = (RVN − 2)/√Var
    * with the exact small-sample variance 4(n−2)(5n²−2n−9)/
    * (5n(n+1)(n−1)²), both ROUND(·,6). */
  private[graft] def anBartelsRank(s: SparkSession, dir: String): DataFrame = {
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wv = Window.orderBy("rev_c")
    val vr = sp.groupBy(col("rev_c")).agg(count(lit(1)).as("ceq"))
      .withColumn("clt", coalesce(sum(col("ceq"))
        .over(wv.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("rev_c"), (lit(2L) * col("clt") + col("ceq") + lit(1L)).as("a2"))
    val wd = Window.orderBy("d")
    val r = sp.join(vr, Seq("rev_c"))
      .withColumn("nx", lead(col("a2"), 1).over(wd))
    val agg = r.agg(count(lit(1)).as("n"),
      sum(when(col("nx").isNotNull,
        (col("a2") - col("nx")) * (col("a2") - col("nx"))).otherwise(lit(0L))).as("num"),
      sum(col("a2") * col("a2")).as("saa"))
    val nd = col("n").cast("double")
    val den = (col("saa") - col("n") * (col("n") + 1L) * (col("n") + 1L)).cast("double")
    val rvn = col("num").cast("double") / den
    val vr2 = lit(4.0) * (nd - 2.0) * (lit(5.0) * nd * nd - lit(2.0) * nd - lit(9.0)) /
      (lit(5.0) * nd * (nd + 1.0) * (nd - 1.0) * (nd - 1.0))
    agg.select(col("n"), round(rvn, 6).as("rvn"),
      round((rvn - lit(2.0)) / sqrt(vr2), 6).as("z"))
  }

  private[graft] lazy val anBartelsRankSql = {
    val nd = "CAST(n AS DOUBLE)"
    val rvn = "(CAST(num AS DOUBLE) / CAST(saa - n * (n + 1) * (n + 1) AS DOUBLE))"
    val vr2 = s"(4.0 * ($nd - 2.0) * (5.0 * $nd * $nd - 2.0 * $nd - 9.0) " +
      s"/ (5.0 * $nd * ($nd + 1.0) * ($nd - 1.0) * ($nd - 1.0)))"
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |vr AS (SELECT rev_c,
       |         2 * (CAST(SUM(COUNT(*)) OVER (ORDER BY rev_c) AS BIGINT) - COUNT(*))
       |           + COUNT(*) + 1 AS a2
       |       FROM sp GROUP BY rev_c),
       |r AS (SELECT a2, LEAD(a2, 1) OVER (ORDER BY d) AS nx
       |      FROM sp JOIN vr USING (rev_c)),
       |ag AS (SELECT COUNT(*) AS n,
       |        CAST(SUM(CASE WHEN nx IS NOT NULL THEN (a2 - nx) * (a2 - nx) ELSE 0 END) AS BIGINT) AS num,
       |        CAST(SUM(a2 * a2) AS BIGINT) AS saa
       |      FROM r)
       |SELECT n, ROUND($rvn, 6) AS rvn,
       |  ROUND(($rvn - 2.0) / sqrt($vr2), 6) AS z
       |FROM ag""".stripMargin
  }

  /** Standard Normal Homogeneity Test (Alexandersson) on daily revenue
    * — the parametric single-break scan beside [[anPettitt]] (ranks)
    * and [[anBuishand]] (range): T = max_k [k·z̄₁² + (n−k)·z̄₂²] with
    * z standardized by the sample std. Both segment means reduce to
    * ONE exact integer D_k = n·P_k − k·T (P_k the prefix sum), since
    * T_k = D_k²·(1/k + 1/(n−k))/(n²·s²) — so the scan is one exact
    * prefix pass with one shared IEEE tree per k; argmax day by the
    * ROUND(·,6) statistic (earliest-day tie-break, the an_dffits
    * ordering contract), T_max ROUND(·,6). */
  private[graft] def anSnht(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wd = Window.orderBy("d")
    val cum = sp
      .withColumn("t", row_number().over(wd).cast("long"))
      .withColumn("p", sum(col("rev_c")).over(wd))
    val tot = sp.agg(count(lit(1)).as("n"), sum(d38(col("rev_c"))).as("ty"),
      sum((d38(col("rev_c")) * d38(col("rev_c"))).cast("decimal(38,0)")).as("tyy"))
    val nd = col("n").cast("double")
    val s2 = (d38(col("n")) * col("tyy") - col("ty") * col("ty")).cast("double") /
      (nd * (nd - lit(1.0)))
    val dk = (d38(col("n")) * d38(col("p")) - d38(col("t")) * col("ty"))
      .cast("decimal(38,0)")
    val tk = dk.cast("double") * dk.cast("double") *
      (lit(1.0) / col("t").cast("double") +
        lit(1.0) / (nd - col("t").cast("double"))) / (nd * nd * s2)
    val scan = cum.crossJoin(broadcast(tot))
      .filter(col("t") < col("n"))
      .select(col("d"), col("n"), round(tk, 6).as("tk"))
    scan.orderBy(col("tk").desc, col("d")).limit(1)
      .select(col("n"), col("d").as("argmax_day"), col("tk").as("t_max"))
  }

  /** Foster–Stuart records test on daily revenue — trend detection
    * through RECORD events (a new all-time high/low), the extreme-value
    * complement to [[anMannKendall]]'s all-pairs slope sign: under
    * randomness records arrive at rate 1/t, so D = #upper − #lower
    * records has mean 0 and variance 2(H_n − 1). Records are exact
    * integers off strict running max/min (first day excluded — no
    * prior); H_n gathers each 1/t term as DECIMAL(38,18) (the
    * double→decimal direction rounds identically in both engines, and
    * the decimal SUM is order-free where a double sum is not). D exact,
    * z = D/√(2(H_n−1)) ROUND(·,6). */
  private[graft] def anFosterStuart(s: SparkSession, dir: String): DataFrame = {
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wd = Window.orderBy("d")
    val prior = wd.rowsBetween(Window.unboundedPreceding, -1)
    val rec = sp
      .withColumn("t", row_number().over(wd).cast("long"))
      .withColumn("pmx", max(col("rev_c")).over(prior))
      .withColumn("pmn", min(col("rev_c")).over(prior))
      .filter(col("t") > 1L)
      .select(col("t"),
        (col("rev_c") > col("pmx")).cast("long").as("u"),
        (col("rev_c") < col("pmn")).cast("long").as("l"))
    val agg = rec.agg((max(col("t"))).as("n"),
      sum(col("u")).as("n_up"), sum(col("l")).as("n_dn"),
      sum((lit(1.0) / col("t").cast("double")).cast("decimal(38,18)"))
        .cast("decimal(38,18)").as("hsum"))
    // hsum = Σ_{t=2..n} 1/t = H_n − 1 exactly (the frame starts at t=2)
    agg.select(col("n"), col("n_up"), col("n_dn"),
      (col("n_up") - col("n_dn")).as("d_stat"),
      round((col("n_up") - col("n_dn")).cast("double") /
        sqrt(lit(2.0) * col("hsum").cast("double")), 6).as("z"))
  }

  private[graft] lazy val anFosterStuartSql =
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |rec AS (SELECT CAST(ROW_NUMBER() OVER w AS BIGINT) AS t,
       |          CASE WHEN rev_c > MAX(rev_c) OVER
       |            (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |            THEN 1 ELSE 0 END AS u,
       |          CASE WHEN rev_c < MIN(rev_c) OVER
       |            (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |            THEN 1 ELSE 0 END AS l
       |        FROM sp WINDOW w AS (ORDER BY d)
       |        QUALIFY t > 1),
       |ag AS (SELECT MAX(t) AS n, CAST(SUM(u) AS BIGINT) AS n_up,
       |         CAST(SUM(l) AS BIGINT) AS n_dn,
       |         CAST(SUM(CAST(1.0 / CAST(t AS DOUBLE) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS hsum
       |       FROM rec)
       |SELECT n, n_up, n_dn, n_up - n_dn AS d_stat,
       |  ROUND(CAST(n_up - n_dn AS DOUBLE)
       |    / sqrt(2.0 * CAST(hsum AS DOUBLE)), 6) AS z
       |FROM ag""".stripMargin

  /** Palma concentration ratio of order values — the income-inequality
    * view beside [[anGini]]/[[anLorenz]]: share of total value held by
    * the top 10% of orders over the share of the bottom 40% (the Palma
    * claim: the middle 50% is stable, the tails carry the story).
    * Rank cuts k40 = 2n div 5, k90 = 9n div 10 land INSIDE tie runs,
    * so each distinct cent value contributes clamp(cut − below, 0,
    * cnt) rows to a tail — all exact integers off ONE
    * [[graft.operators.PrefixSum]] scan; shares and the ratio divide
    * exact decimals once, ROUND(·,6). */
  private[graft] def anPalma(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val v = Tables.orders(s, dir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val perV = v.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt"))
    val tot = v.agg(count(lit(1)).as("n"), sum(d38(col("v"))).as("tv"))
    val cuts = scan.crossJoin(broadcast(tot))
      .select(col("v"), col("cnt"), col("cnt_cum"), col("n"), col("tv"),
        expr("2 * n div 5").as("k40"), expr("9 * n div 10").as("k90"))
    val take = cuts.agg(max(col("n")).as("n"), max(col("tv")).as("tv"),
      sum(d38(greatest(lit(0L), least(col("cnt"),
        col("k40") - (col("cnt_cum") - col("cnt"))))) * d38(col("v")))
        .cast("decimal(38,0)").as("bot40"),
      sum(d38(greatest(lit(0L), least(col("cnt"), col("cnt_cum") - col("k90"))))
        * d38(col("v"))).cast("decimal(38,0)").as("top10"))
    take.select(col("n"),
      round(col("bot40").cast("double") / col("tv").cast("double"), 6).as("bot40_share"),
      round(col("top10").cast("double") / col("tv").cast("double"), 6).as("top10_share"),
      round(col("top10").cast("double") / col("bot40").cast("double"), 6).as("palma_ratio"))
  }

  private[graft] lazy val anPalmaSql =
    """WITH b AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |pv AS (SELECT v, COUNT(*) AS cnt FROM b GROUP BY v),
      |sc AS (SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum
      |       FROM pv),
      |tot AS (SELECT COUNT(*) AS n,
      |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tv
      |  FROM b),
      |cuts AS (SELECT v, cnt, cnt_cum, n, tv,
      |    (2 * n) // 5 AS k40, (9 * n) // 10 AS k90
      |  FROM sc CROSS JOIN tot),
      |tk AS (SELECT MAX(n) AS n, MAX(tv) AS tv,
      |    CAST(SUM(CAST(GREATEST(0, LEAST(cnt, k40 - (cnt_cum - cnt))) AS DECIMAL(38,0))
      |      * CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS bot40,
      |    CAST(SUM(CAST(GREATEST(0, LEAST(cnt, cnt_cum - k90)) AS DECIMAL(38,0))
      |      * CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS top10
      |  FROM cuts)
      |SELECT n,
      |  ROUND(CAST(bot40 AS DOUBLE) / CAST(tv AS DOUBLE), 6) AS bot40_share,
      |  ROUND(CAST(top10 AS DOUBLE) / CAST(tv AS DOUBLE), 6) AS top10_share,
      |  ROUND(CAST(top10 AS DOUBLE) / CAST(bot40 AS DOUBLE), 6) AS palma_ratio
      |FROM tk""".stripMargin

  /** Tracking signal of the seasonal-naive forecast over the last 28
    * days — the live forecast-bias MONITOR beside [[anMapeBacktest]]'s
    * magnitude score: TS_k = cumulative error / MAD_k = k·ΣE/Σ|E|
    * stays in ±4 for an unbiased forecast; a drifting series trips it.
    * Errors are exact cents; per-day TS is one double division off
    * exact integer prefix sums (28-row frame), ROUND(·,6); emits the
    * final TS and the worst |TS| over the window. */
  private[graft] def anTrackingSignal(s: SparkSession, dir: String): DataFrame = {
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wd = Window.orderBy("d")
    val ev = sp
      .withColumn("fc", lag(col("rev_c"), 7).over(wd))
      .withColumn("rd", row_number().over(Window.orderBy(col("d").desc)))
      .filter(col("rd") <= 28 && col("fc").isNotNull)
      .select(col("d"), (col("rev_c") - col("fc")).as("e"))
    val wk = Window.orderBy("d")
    val ts = ev
      .withColumn("k", row_number().over(wk).cast("long"))
      .withColumn("ce", sum(col("e")).over(wk))
      .withColumn("ca", sum(abs(col("e"))).over(wk))
      .select(col("k"),
        round((col("k") * col("ce")).cast("double") / col("ca").cast("double"), 6)
          .as("ts"))
    val nEval = ts.agg(max(col("k")).as("n_eval"))
    ts.crossJoin(broadcast(nEval))
      .agg(max(col("n_eval")).as("n_eval"),
        max(when(col("k") === col("n_eval"), col("ts"))).as("ts_final"),
        max(abs(col("ts"))).as("max_abs_ts"))
  }

  private[graft] lazy val anTrackingSignalSql =
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |ev AS (SELECT d, rev_c - fc AS e FROM (
       |         SELECT d, rev_c, LAG(rev_c, 7) OVER (ORDER BY d) AS fc,
       |           ROW_NUMBER() OVER (ORDER BY d DESC) AS rd
       |         FROM sp)
       |       WHERE rd <= 28 AND fc IS NOT NULL),
       |ts AS (SELECT CAST(ROW_NUMBER() OVER w AS BIGINT) AS k,
       |         ROUND(CAST(CAST(ROW_NUMBER() OVER w AS BIGINT)
       |             * CAST(SUM(e) OVER w AS BIGINT) AS DOUBLE)
       |           / CAST(CAST(SUM(ABS(e)) OVER w AS BIGINT) AS DOUBLE), 6) AS ts
       |       FROM ev WINDOW w AS (ORDER BY d)),
       |ne AS (SELECT MAX(k) AS n_eval FROM ts)
       |SELECT MAX(n_eval) AS n_eval,
       |  MAX(CASE WHEN k = n_eval THEN ts END) AS ts_final,
       |  MAX(ABS(ts)) AS max_abs_ts
       |FROM ts CROSS JOIN ne""".stripMargin

  /** Spectral entropy of daily revenue over the period grid 2..60 —
    * the one-number "how concentrated is the seasonality" summary
    * beside [[anPeriodogram]]'s named-period amplitudes and
    * [[anSeasonalStrength]]: H = −Σ p_k ln p_k / ln(#periods) of the
    * normalized pseudo-spectrum (0 = one pure cycle, 1 = white).
    * Per-period cos/sin projections gather v·cos terms in
    * DECIMAL(38,18) (the periodogram libm discipline); powers are
    * normalized amplitudes in dollars so the (38,18) integer budget
    * holds at any SF; the 59-row entropy gather is DECIMAL(38,18)
    * (order-free), ROUND(·,6). */
  private[graft] def anSpectralEntropy(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyRevenueSpine(s, dir)
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    val byP = daily
      .select(col("d"), col("rev_c"), explode(sequence(lit(2), lit(60))).as("p"))
      .withColumn("ang",
        lit(2.0 * math.Pi) * pmod(col("d"), col("p")).cast("double") /
          col("p").cast("double"))
      .groupBy(col("p"))
      .agg(count(lit(1)).as("n"),
        gather(col("rev_c").cast("double") * cos(col("ang"))).as("cs"),
        gather(col("rev_c").cast("double") * sin(col("ang"))).as("sn"))
      .select(col("p"),
        (lit(4.0) * (col("cs").cast("double") * col("cs").cast("double") +
          col("sn").cast("double") * col("sn").cast("double")) /
          (col("n").cast("double") * col("n").cast("double") * lit(10000.0)))
          .as("pw"))
    val tot = byP.agg(sum(col("pw").cast("decimal(38,18)"))
      .cast("decimal(38,18)").as("tp"), count(lit(1)).as("m"))
    byP.crossJoin(broadcast(tot))
      .select(col("m"),
        ((col("pw") / col("tp").cast("double")) *
          log(col("pw") / col("tp").cast("double"))).cast("decimal(38,18)").as("plp"))
      .groupBy(col("m"))
      .agg(sum(col("plp")).cast("decimal(38,18)").as("sum_plp"))
      .select(col("m").as("n_periods"),
        round(-col("sum_plp").cast("double") / log(col("m").cast("double")), 6)
          .as("spectral_entropy"))
  }

  private[graft] lazy val anSpectralEntropySql = {
    val cs = "CAST(CAST(SUM(CAST(CAST(rev_c AS DOUBLE) * cos(ang) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE)"
    val sn = "CAST(CAST(SUM(CAST(CAST(rev_c AS DOUBLE) * sin(ang) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE)"
    s"""WITH daily AS ($dailySpineSql),
       |g AS (SELECT d, rev_c, t.range AS p,
       |        2.0 * pi() * CAST(d % t.range AS DOUBLE) / CAST(t.range AS DOUBLE) AS ang
       |      FROM daily, range(2, 61) t),
       |byp AS (SELECT p, COUNT(*) AS n, $cs AS cs, $sn AS sn
       |        FROM g GROUP BY p),
       |pw AS (SELECT p,
       |         4.0 * (cs * cs + sn * sn)
       |           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 10000.0) AS pw
       |       FROM byp),
       |tot AS (SELECT CAST(SUM(CAST(pw AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS tp,
       |          COUNT(*) AS m
       |        FROM pw)
       |SELECT m AS n_periods,
       |  ROUND(-CAST(CAST(SUM(CAST((pw / CAST(tp AS DOUBLE))
       |      * ln(pw / CAST(tp AS DOUBLE)) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE)
       |    / ln(CAST(m AS DOUBLE)), 6) AS spectral_entropy
       |FROM pw CROSS JOIN tot GROUP BY m""".stripMargin
  }

  /** Yule's K lexical-repetitiveness characteristic + Simpson diversity
    * per language — corpus-statistics companions to
    * [[textLexicalRichness]]'s TTR family that are (unlike TTR)
    * length-invariant: K = 10⁴·(Σc² − N)/N², D = (Σc² − N)/(N(N−1))
    * over unigram frequencies c. One explode + one (lang, word)
    * aggregate (posting-shaped, the text_tfidf shuffle); Σc and Σc²
    * exact BIGINTs; one division each at emission, K ROUND(·,6), D
    * ROUND(·,9) (its natural scale is 1e-4). */
  private[graft] def textYuleK(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions
    val cnt = Tables.documents(s, dir)
      .select(col("lang"), explode(TextFunctions.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
    val agg = cnt.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"),
        sum(col("c") * col("c")).as("s2"))
    val nd = col("n_tokens").cast("double")
    agg.select(col("lang"), col("n_tokens"), col("n_types"),
      round(lit(10000.0) * (col("s2") - col("n_tokens")).cast("double") / (nd * nd), 6)
        .as("yule_k"),
      round((col("s2") - col("n_tokens")).cast("double") /
        (nd * (nd - lit(1.0))), 9).as("simpson_d"))
      .orderBy(col("lang"))
  }

  private[graft] lazy val textYuleKSql =
    """WITH w AS (SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      |  FROM documents),
      |cnt AS (SELECT lang, w, COUNT(*) AS c FROM w GROUP BY 1, 2),
      |ag AS (SELECT lang, COUNT(*) AS n_types, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |         CAST(SUM(c * c) AS BIGINT) AS s2
      |       FROM cnt GROUP BY lang)
      |SELECT lang, n_tokens, n_types,
      |  ROUND(10000.0 * CAST(s2 - n_tokens AS DOUBLE)
      |    / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6) AS yule_k,
      |  ROUND(CAST(s2 - n_tokens AS DOUBLE)
      |    / (CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0)), 9) AS simpson_d
      |FROM ag ORDER BY lang""".stripMargin

  /** Katz centrality (3 unrolled iterations, α = 1/50, β = 1) over the
    * undirected customer–supplier network — the attenuation-based
    * influence score beside [[qPagerank]]'s random-walk rank (Katz
    * counts ALL walks, degree-damped, so high-degree hubs and their
    * neighborhoods separate differently than under rank diffusion).
    * DIVISION-FREE exact arithmetic: carrying x'_k = 50^k·x_k turns
    * the update into x'_k = 50^k·S + Σ_nbr x'_{k−1} — pure
    * DECIMAL(38,0) integer sums (order-free, no rounding anywhere),
    * normalized once at emission by 50³·S. Per iteration: one
    * node-sized shuffle against the persisted adjacency (the
    * q_pagerank execution posture). Top-20 by the EXACT integer score,
    * node-ascending tie-break; emitted score ROUND(·,6). */
  private[graft] def qKatz(s: SparkSession, dir: String): DataFrame = {
    // shared single-exchange spine (r19 optimization — see GraphSpine)
    val adj = GraphSpine.csEdges(s, dir).persist()
    val S = 1000000L
    var x = adj.select(col("src").as("node")).distinct()
      .withColumn("xf", lit(S).cast("decimal(38,0)"))
    (1 to 3).foreach { k =>
      val const = BigDecimal(math.pow(50.0, k).toLong * S)
      x = graft.operators.Checkpoints.stabilizeLazy(adj
        .join(x.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("xf")).cast("decimal(38,0)").as("g"))
        .select(col("node"),
          (lit(const).cast("decimal(38,0)") + col("g")).cast("decimal(38,0)").as("xf")))
    }
    val norm = 125000.0 * S
    x.orderBy(col("xf").desc, col("node")).limit(20)
      .select(col("node"),
        round(col("xf").cast("double") / lit(norm), 6).as("katz"))
  }

  private[graft] lazy val qKatzSql: String = {
    val iter = (1 to 3).map { k =>
      val const = math.pow(50.0, k).toLong * 1000000L
      s"""k$k AS (
         |  SELECT e.dst AS node,
         |    CAST($const + SUM(x.xf) AS DECIMAL(38,0)) AS xf
         |  FROM edges e JOIN k${k - 1} x ON e.src = x.node
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH cs AS (
       |  SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS p
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS (
       |  SELECT c AS src, p AS dst FROM cs
       |  UNION
       |  SELECT p AS src, c AS dst FROM cs),
       |k0 AS (SELECT DISTINCT src AS node, CAST(1000000 AS DECIMAL(38,0)) AS xf
       |       FROM edges),
       |$iter
       |SELECT node, ROUND(CAST(xf AS DOUBLE) / 125000000000.0, 6) AS katz
       |FROM k3 ORDER BY xf DESC, node LIMIT 20""".stripMargin
  }

  /** Mood's scale test between BUILDING and AUTOMOBILE customer
    * balances — the DISPERSION rank test beside [[anAnsariBradley]]
    * (different score function: squared central rank distance, more
    * power against smooth scale alternatives): T = Σ_{g=1}(R_i −
    * (N+1)/2)². In TWICE-midrank units A = 2·below + cnt + 1 the
    * group sum T' = Σ cnt₁(v)·(A_v − (N+1))² = 4T is an EXACT BIGINT
    * off one PrefixSum scan; E[T] = n₁(N²−1)/12 and Var[T] =
    * n₁n₂(N+1)(N²−4)/180 are exact closed forms; z one IEEE tree,
    * ROUND(·,6). */
  private[graft] def anMoodScale(s: SparkSession, dir: String): DataFrame = {
    val lab = Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select((col("c_mktsegment") === "BUILDING").cast("long").as("g"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val perV = lab.groupBy(col("v"))
      .agg(sum(col("g")).as("c1"), count(lit(1)).as("cnt"))
    val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt"))
    val tot = lab.agg(count(lit(1)).as("nn"), sum(col("g")).as("n1"))
    val a = lit(2L) * (col("cnt_cum") - col("cnt")) + col("cnt") + lit(1L)
    val tp = scan.crossJoin(broadcast(tot))
      .select(col("n1"), col("nn"),
        (col("c1") * (a - (col("nn") + 1L)) * (a - (col("nn") + 1L))).as("term"))
      .groupBy(col("n1"), col("nn")).agg(sum(col("term")).as("tp"))
    val nd = col("nn").cast("double"); val n1d = col("n1").cast("double")
    val n2d = nd - n1d
    val tStat = col("tp").cast("double") / lit(4.0)
    val et = n1d * (nd * nd - lit(1.0)) / lit(12.0)
    val vt = n1d * n2d * (nd + lit(1.0)) * (nd * nd - lit(4.0)) / lit(180.0)
    tp.select(col("n1"), (col("nn") - col("n1")).as("n2"),
      round(tStat, 6).as("t_stat"), round((tStat - et) / sqrt(vt), 6).as("z"))
  }

  private[graft] lazy val anMoodScaleSql = {
    val t = "(CAST(tp AS DOUBLE) / 4.0)"
    val nd = "CAST(nn AS DOUBLE)"; val n1d = "CAST(n1 AS DOUBLE)"
    val n2d = s"($nd - $n1d)"
    val et = s"($n1d * ($nd * $nd - 1.0) / 12.0)"
    val vt = s"($n1d * $n2d * ($nd + 1.0) * ($nd * $nd - 4.0) / 180.0)"
    s"""WITH lab AS (SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
       |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
       |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
       |pv AS (SELECT v, CAST(SUM(g) AS BIGINT) AS c1, COUNT(*) AS cnt FROM lab GROUP BY v),
       |sc AS (SELECT v, c1, cnt,
       |         CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum
       |       FROM pv),
       |tot AS (SELECT COUNT(*) AS nn, CAST(SUM(g) AS BIGINT) AS n1 FROM lab),
       |tp AS (SELECT n1, nn,
       |    CAST(SUM(c1 * (2 * (cnt_cum - cnt) + cnt + 1 - (nn + 1))
       |           * (2 * (cnt_cum - cnt) + cnt + 1 - (nn + 1))) AS BIGINT) AS tp
       |  FROM sc CROSS JOIN tot GROUP BY n1, nn)
       |SELECT n1, nn - n1 AS n2, ROUND($t, 6) AS t_stat,
       |  ROUND(($t - $et) / sqrt($vt), 6) AS z
       |FROM tp""".stripMargin
  }

  /** Blomqvist's β (medial correlation) between line-item quantity and
    * extended price — the quadrant-count dependence screen beside
    * [[anSpearman]]/[[anKendallTau]]: β = (n₁₁ + n₀₀ − n₁₀ − n₀₁)/m
    * over points split at the two LOWER MEDIANS (rank (n+1) div 2 via
    * exact distinct-value cumulative counts — deterministic under
    * ties), points ON either median excluded (classical treatment).
    * All counts exact BIGINTs; β one division, z = β√m, ROUND(·,6). */
  private[graft] def anBlomqvistBeta(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_quantity").cast("decimal(24,2)").cast("bigint").as("x"),
        (col("l_extendedprice").cast("decimal(24,2)") * 100).cast("bigint").as("y"))
    def lowerMedian(c: String): DataFrame = {
      val perV = li.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
      val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt"))
      val n = li.agg(count(lit(1)).as("n"))
      scan.crossJoin(broadcast(n))
        .filter(col("cnt_cum") >= expr("(n + 1) div 2") &&
          col("cnt_cum") - col("cnt") < expr("(n + 1) div 2"))
        .select(col("v").as(s"med_$c"))
    }
    val mx = lowerMedian("x"); val my = lowerMedian("y")
    val q = li.crossJoin(broadcast(mx)).crossJoin(broadcast(my))
      .filter(col("x") =!= col("med_x") && col("y") =!= col("med_y"))
      .agg(count(lit(1)).as("m"),
        sum(((col("x") > col("med_x")) === (col("y") > col("med_y")))
          .cast("long")).as("conc"))
    q.select(col("m"),
      round((lit(2L) * col("conc") - col("m")).cast("double") /
        col("m").cast("double"), 6).as("beta"),
      round((lit(2L) * col("conc") - col("m")).cast("double") /
        col("m").cast("double") * sqrt(col("m").cast("double")), 6).as("z"))
  }

  private[graft] lazy val anBlomqvistBetaSql =
    """WITH li AS (SELECT CAST(CAST(l_quantity AS DECIMAL(24,2)) AS BIGINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS y
      |  FROM lineitem),
      |nx AS (SELECT COUNT(*) AS n FROM li),
      |medx AS (SELECT v AS med_x FROM (
      |    SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum
      |    FROM (SELECT x AS v, COUNT(*) AS cnt FROM li GROUP BY x)) CROSS JOIN nx
      |  WHERE cnt_cum >= (n + 1) // 2 AND cnt_cum - cnt < (n + 1) // 2),
      |medy AS (SELECT v AS med_y FROM (
      |    SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum
      |    FROM (SELECT y AS v, COUNT(*) AS cnt FROM li GROUP BY y)) CROSS JOIN nx
      |  WHERE cnt_cum >= (n + 1) // 2 AND cnt_cum - cnt < (n + 1) // 2),
      |q AS (SELECT COUNT(*) AS m,
      |    CAST(SUM(CASE WHEN (x > med_x) = (y > med_y) THEN 1 ELSE 0 END) AS BIGINT) AS conc
      |  FROM li CROSS JOIN medx CROSS JOIN medy
      |  WHERE x <> med_x AND y <> med_y)
      |SELECT m,
      |  ROUND(CAST(2 * conc - m AS DOUBLE) / CAST(m AS DOUBLE), 6) AS beta,
      |  ROUND(CAST(2 * conc - m AS DOUBLE) / CAST(m AS DOUBLE)
      |    * sqrt(CAST(m AS DOUBLE)), 6) AS z
      |FROM q""".stripMargin

  /** Diebold–Mariano forecast-comparison test: is the seasonal-naive
    * (lag-7) daily-revenue forecast significantly better than the
    * random walk (lag-1)? d_t = e₁² − e₂² in exact cents²;
    * WIDTH-SAFE at any SF via scale normalization — pass 1 takes
    * scale = Σ|d| (exact DECIMAL(38,0)), pass 2 gathers d/scale and
    * (d/scale)² in DECIMAL(38,18) (values O(1/n), squares O(1/n²) —
    * the integer budget never binds); DM = d̄/√(γ₀/n) is scale-free so
    * the normalization cancels exactly. ROUND(·,6) absorbs the >2^53
    * decimal→double cast ulp (the an_granger contract). */
  private[graft] def anDieboldMariano(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wd = Window.orderBy("d")
    val dRows = sp
      .withColumn("f7", lag(col("rev_c"), 7).over(wd))
      .withColumn("f1", lag(col("rev_c"), 1).over(wd))
      .filter(col("f7").isNotNull && col("f1").isNotNull)
      .select(((d38(col("rev_c") - col("f7")) * d38(col("rev_c") - col("f7"))) -
        (d38(col("rev_c") - col("f1")) * d38(col("rev_c") - col("f1"))))
        .cast("decimal(38,0)").as("dd"))
    val scale = dRows.agg(sum(abs(col("dd"))).cast("decimal(38,0)").as("sc"),
      count(lit(1)).as("n"))
    val g18 = (c: Column) => sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    val agg = dRows.crossJoin(broadcast(scale))
      .select(col("n"),
        (col("dd").cast("double") / col("sc").cast("double")).as("u"))
      .groupBy(col("n"))
      .agg(g18(col("u")).as("su"), g18(col("u") * col("u")).as("suu"))
    val nd = col("n").cast("double")
    val mean = col("su").cast("double") / nd
    val g0 = col("suu").cast("double") / nd - mean * mean
    agg.select(col("n").as("n_eval"),
      round(mean / sqrt(g0 / nd), 6).as("dm_stat"))
  }

  private[graft] lazy val anDieboldMarianoSql = {
    val mean = "(CAST(su AS DOUBLE) / CAST(n AS DOUBLE))"
    val g0 = s"(CAST(suu AS DOUBLE) / CAST(n AS DOUBLE) - $mean * $mean)"
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |f AS (SELECT rev_c,
       |        LAG(rev_c, 7) OVER (ORDER BY d) AS f7,
       |        LAG(rev_c, 1) OVER (ORDER BY d) AS f1
       |      FROM sp),
       |dd AS (SELECT CAST(CAST(rev_c - f7 AS DECIMAL(38,0)) * CAST(rev_c - f7 AS DECIMAL(38,0))
       |             - CAST(rev_c - f1 AS DECIMAL(38,0)) * CAST(rev_c - f1 AS DECIMAL(38,0))
       |           AS DECIMAL(38,0)) AS dd
       |       FROM f WHERE f7 IS NOT NULL AND f1 IS NOT NULL),
       |sc AS (SELECT CAST(SUM(ABS(dd)) AS DECIMAL(38,0)) AS sc, COUNT(*) AS n FROM dd),
       |ag AS (SELECT n,
       |    CAST(SUM(CAST(CAST(dd AS DOUBLE) / CAST(sc AS DOUBLE) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS su,
       |    CAST(SUM(CAST((CAST(dd AS DOUBLE) / CAST(sc AS DOUBLE))
       |           * (CAST(dd AS DOUBLE) / CAST(sc AS DOUBLE)) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS suu
       |  FROM dd CROSS JOIN sc GROUP BY n)
       |SELECT n AS n_eval, ROUND($mean / sqrt($g0 / CAST(n AS DOUBLE)), 6) AS dm_stat
       |FROM ag""".stripMargin
  }

  /** Dixon's Q single-outlier screen per order priority — the
    * small-frame gap-ratio complement to [[anGrubbs]] (which needs
    * near-normality; Q only compares extreme gaps): Q_high = (x₍ₙ₎ −
    * x₍ₙ₋₁₎)/range over DISTINCT values (the tie-robust form — a tied
    * extreme is not an outlier), Q_low symmetric. Per-group max, min,
    * runner-up extremes from two aggregate passes (the group frame is
    * key-domain-sized), all exact cents; one division each,
    * ROUND(·,6). */
  private[graft] def anDixonQ(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("grp"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val ext = o.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), max(col("v")).as("mx"), min(col("v")).as("mn"))
    val sub = o.join(broadcast(ext), Seq("grp"))
      .groupBy(col("grp"))
      .agg(max(when(col("v") < col("mx"), col("v"))).as("submax"),
        min(when(col("v") > col("mn"), col("v"))).as("submin"))
    ext.join(broadcast(sub), Seq("grp"))
      .select(col("grp"), col("n"),
        round((col("mx") - col("submax")).cast("double") /
          (col("mx") - col("mn")).cast("double"), 6).as("q_high"),
        round((col("submin") - col("mn")).cast("double") /
          (col("mx") - col("mn")).cast("double"), 6).as("q_low"))
      .orderBy(col("grp"))
  }

  private[graft] lazy val anDixonQSql =
    """WITH o AS (SELECT o_orderpriority AS grp,
      |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |ext AS (SELECT grp, COUNT(*) AS n, MAX(v) AS mx, MIN(v) AS mn
      |        FROM o GROUP BY grp),
      |sub AS (SELECT o.grp,
      |          MAX(CASE WHEN v < mx THEN v END) AS submax,
      |          MIN(CASE WHEN v > mn THEN v END) AS submin
      |        FROM o JOIN ext ON o.grp = ext.grp GROUP BY o.grp)
      |SELECT grp, n,
      |  ROUND(CAST(mx - submax AS DOUBLE) / CAST(mx - mn AS DOUBLE), 6) AS q_high,
      |  ROUND(CAST(submin - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE), 6) AS q_low
      |FROM ext JOIN sub USING (grp) ORDER BY grp""".stripMargin

  /** Aalen–Johansen cumulative incidence for COMPETING churn causes —
    * what [[anKaplanMeier]] overstates when churners split into
    * distinct outcomes (1 − KM treats competing events as censoring):
    * cause 1 = churned with return history (any R line item), cause 2
    * = churned clean. CIF_j(t) = Σ_{s≤t} S(s⁻)·d_j(s)/n(s) with
    * S(s⁻) the all-cause KM just before s — per the KM discipline the
    * survival product is exp(Σ ln) over an ORDER BY t running window
    * (a sequential fold, identical IEEE order in both engines), the
    * risk set exact integers off one prev-window scan, CIF ROUND(·,6).
    * The two CIFs + their sum vs 1−KM IS the competing-risk bias
    * readout. */
  private[graft] def anCumulativeIncidence(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val anchor = o.agg(max(col("o_orderdate")).as("mx"))
    val hasR = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      .join(o.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("rk")).distinct()
    val cust = o.groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("f"), max(col("o_orderdate")).as("l"))
      .crossJoin(broadcast(anchor))
      .join(hasR, col("o_custkey") === col("rk"), "left")
      .select(datediff(col("l"), col("f")).cast("bigint").as("t"),
        (col("l") < col("mx") - expr("INTERVAL 90 DAYS")).cast("long").as("ev"),
        col("rk").isNotNull.cast("long").as("r"))
    val byT = cust.groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"),
        sum(col("ev") * col("r")).as("d1"),
        sum(col("ev") * (lit(1L) - col("r"))).as("d2"))
    val wPrev = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, 0)
    val r = byT.crossJoin(broadcast(cust.agg(count(lit(1)).as("n_total"))))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("n_at")).over(wPrev), lit(0L)))
      .filter(col("d1") + col("d2") > 0)
    val dTot = (col("d1") + col("d2")).cast("double")
    val logTerm = when(col("d1") + col("d2") === col("n_risk"), lit(0.0))
      .otherwise(log(lit(1.0) - dTot / col("n_risk").cast("double")))
    r.withColumn("sPrev", exp(coalesce(sum(logTerm).over(wPrev), lit(0.0))))
      .withColumn("cif1", round(sum(col("sPrev") *
        col("d1").cast("double") / col("n_risk").cast("double")).over(wCum), 6))
      .withColumn("cif2", round(sum(col("sPrev") *
        col("d2").cast("double") / col("n_risk").cast("double")).over(wCum), 6))
      .select(col("t"), col("n_risk"), col("d1"), col("d2"),
        col("cif1"), col("cif2"))
      .orderBy(col("t"))
  }

  private[graft] lazy val anCumulativeIncidenceSql =
    """WITH a AS (SELECT MAX(o_orderdate) AS mx FROM orders),
      |hr AS (SELECT DISTINCT o_custkey AS rk
      |       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |       WHERE l_returnflag = 'R'),
      |c AS (SELECT o_custkey, MIN(o_orderdate) AS f, MAX(o_orderdate) AS l
      |      FROM orders GROUP BY 1),
      |cust AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t,
      |           CASE WHEN l < mx - INTERVAL 90 DAY THEN 1 ELSE 0 END AS ev,
      |           CASE WHEN rk IS NOT NULL THEN 1 ELSE 0 END AS r
      |         FROM c CROSS JOIN a LEFT JOIN hr ON c.o_custkey = hr.rk),
      |byt AS (SELECT t, COUNT(*) AS n_at,
      |          CAST(SUM(ev * r) AS BIGINT) AS d1,
      |          CAST(SUM(ev * (1 - r)) AS BIGINT) AS d2
      |        FROM cust GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS n_total FROM cust),
      |rs AS (SELECT t, d1, d2, n_total - COALESCE(CAST(SUM(n_at) OVER (ORDER BY t
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n_risk
      |       FROM byt CROSS JOIN tot),
      |f AS (SELECT t, n_risk, d1, d2,
      |        EXP(COALESCE(SUM(CASE WHEN d1 + d2 = n_risk THEN 0.0
      |              ELSE LN(1.0 - CAST(d1 + d2 AS DOUBLE) / CAST(n_risk AS DOUBLE)) END)
      |            OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)) AS sprev
      |      FROM rs WHERE d1 + d2 > 0)
      |SELECT t, n_risk, d1, d2,
      |  ROUND(SUM(sprev * CAST(d1 AS DOUBLE) / CAST(n_risk AS DOUBLE))
      |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cif1,
      |  ROUND(SUM(sprev * CAST(d2 AS DOUBLE) / CAST(n_risk AS DOUBLE))
      |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cif2
      |FROM f ORDER BY t""".stripMargin

  /** Cucconi's combined location-scale rank test, BUILDING vs
    * AUTOMOBILE balances — the one-statistic two-sample omnibus beside
    * [[anLepage]] (older than Lepage, uses squared ranks from BOTH
    * ends): U from ΣR², V from Σ(N+1−R)², C = (U² + V² − 2ρUV)/
    * (2(1−ρ²)) with ρ = 2(N²−4)/((2N+1)(8N+11)) − 1. In twice-midrank
    * units (A = 2·below + cnt + 1) both squared-rank sums are exact
    * BIGINTs/4 off ONE PrefixSum scan; U, V, ρ, C one shared IEEE
    * tree, ROUND(·,6). */
  private[graft] def anCucconi(s: SparkSession, dir: String): DataFrame = {
    val lab = Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select((col("c_mktsegment") === "BUILDING").cast("long").as("g"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val perV = lab.groupBy(col("v"))
      .agg(sum(col("g")).as("c1"), count(lit(1)).as("cnt"))
    val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt"))
    val tot = lab.agg(count(lit(1)).as("nn"), sum(col("g")).as("n1"))
    val a = lit(2L) * (col("cnt_cum") - col("cnt")) + col("cnt") + lit(1L)
    val b = lit(2L) * (col("nn") + 1L) - a // twice-(N+1−R)
    val sums = scan.crossJoin(broadcast(tot))
      .select(col("n1"), col("nn"),
        (col("c1") * a * a).as("s1t"), (col("c1") * b * b).as("s2t"))
      .groupBy(col("n1"), col("nn"))
      .agg(sum(col("s1t")).as("qa"), sum(col("s2t")).as("qb"))
    val nd = col("nn").cast("double"); val n1d = col("n1").cast("double")
    val n2d = nd - n1d
    val s1 = col("qa").cast("double") / lit(4.0)
    val s2 = col("qb").cast("double") / lit(4.0)
    val den = sqrt(n1d * n2d * (nd + 1.0) * (lit(2.0) * nd + 1.0) *
      (lit(8.0) * nd + 11.0) / lit(5.0))
    val u = (lit(6.0) * s1 - n1d * (nd + 1.0) * (lit(2.0) * nd + 1.0)) / den
    val v = (lit(6.0) * s2 - n1d * (nd + 1.0) * (lit(2.0) * nd + 1.0)) / den
    val rho = lit(2.0) * (nd * nd - 4.0) /
      ((lit(2.0) * nd + 1.0) * (lit(8.0) * nd + 11.0)) - lit(1.0)
    sums.select(col("n1"), (col("nn") - col("n1")).as("n2"),
      round(u, 6).as("u"), round(v, 6).as("v"),
      round((u * u + v * v - lit(2.0) * rho * u * v) /
        (lit(2.0) * (lit(1.0) - rho * rho)), 6).as("c_stat"))
  }

  private[graft] lazy val anCucconiSql = {
    val nd = "CAST(nn AS DOUBLE)"; val n1d = "CAST(n1 AS DOUBLE)"
    val n2d = s"($nd - $n1d)"
    val s1 = "(CAST(qa AS DOUBLE) / 4.0)"; val s2 = "(CAST(qb AS DOUBLE) / 4.0)"
    val den = s"sqrt($n1d * $n2d * ($nd + 1.0) * (2.0 * $nd + 1.0) * (8.0 * $nd + 11.0) / 5.0)"
    val u = s"((6.0 * $s1 - $n1d * ($nd + 1.0) * (2.0 * $nd + 1.0)) / $den)"
    val v = s"((6.0 * $s2 - $n1d * ($nd + 1.0) * (2.0 * $nd + 1.0)) / $den)"
    val rho = s"(2.0 * ($nd * $nd - 4.0) / ((2.0 * $nd + 1.0) * (8.0 * $nd + 11.0)) - 1.0)"
    s"""WITH lab AS (SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
       |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
       |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
       |pv AS (SELECT v, CAST(SUM(g) AS BIGINT) AS c1, COUNT(*) AS cnt FROM lab GROUP BY v),
       |sc AS (SELECT v, c1, cnt,
       |         CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum
       |       FROM pv),
       |tot AS (SELECT COUNT(*) AS nn, CAST(SUM(g) AS BIGINT) AS n1 FROM lab),
       |qq AS (SELECT n1, nn,
       |    CAST(SUM(c1 * (2 * (cnt_cum - cnt) + cnt + 1)
       |           * (2 * (cnt_cum - cnt) + cnt + 1)) AS BIGINT) AS qa,
       |    CAST(SUM(c1 * (2 * (nn + 1) - (2 * (cnt_cum - cnt) + cnt + 1))
       |           * (2 * (nn + 1) - (2 * (cnt_cum - cnt) + cnt + 1))) AS BIGINT) AS qb
       |  FROM sc CROSS JOIN tot GROUP BY n1, nn)
       |SELECT n1, nn - n1 AS n2, ROUND($u, 6) AS u, ROUND($v, 6) AS v,
       |  ROUND(($u * $u + $v * $v - 2.0 * $rho * $u * $v)
       |    / (2.0 * (1.0 - $rho * $rho)), 6) AS c_stat
       |FROM qq""".stripMargin
  }

  /** Lepage's combined location-scale test on the same two-sample frame
    * — L = W_z² + AB_z², the Wilcoxon rank-sum z (location) plus the
    * Ansari–Bradley z (scale, scores min(R, N+1−R) from both ends),
    * each exact-integer off the ONE twice-midrank scan: ΣA = rank sum
    * ×2, Σmin(A, 2(N+1)−A) = AB scores ×2; AB's mean/variance switch
    * on N's parity (exact closed forms, integer mod identical in both
    * engines). No tie-correction BY CONTRACT (cent values are
    * near-distinct; the statistic is defined as implemented).
    * ROUND(·,6). */
  private[graft] def anLepage(s: SparkSession, dir: String): DataFrame = {
    val lab = Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select((col("c_mktsegment") === "BUILDING").cast("long").as("g"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val perV = lab.groupBy(col("v"))
      .agg(sum(col("g")).as("c1"), count(lit(1)).as("cnt"))
    val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt"))
    val tot = lab.agg(count(lit(1)).as("nn"), sum(col("g")).as("n1"))
    val a = lit(2L) * (col("cnt_cum") - col("cnt")) + col("cnt") + lit(1L)
    val sums = scan.crossJoin(broadcast(tot))
      .select(col("n1"), col("nn"),
        (col("c1") * a).as("wt"),
        (col("c1") * least(a, lit(2L) * (col("nn") + 1L) - a)).as("st"))
      .groupBy(col("n1"), col("nn"))
      .agg(sum(col("wt")).as("w2"), sum(col("st")).as("s2"))
    val nd = col("nn").cast("double"); val n1d = col("n1").cast("double")
    val n2d = nd - n1d
    val w = col("w2").cast("double") / lit(2.0)
    val ab = col("s2").cast("double") / lit(2.0)
    val ew = n1d * (nd + 1.0) / lit(2.0)
    val vw = n1d * n2d * (nd + 1.0) / lit(12.0)
    val even = col("nn") % 2 === 0
    val eab = when(even, n1d * (nd + 2.0) / lit(4.0))
      .otherwise(n1d * (nd + 1.0) * (nd + 1.0) / (lit(4.0) * nd))
    val vab = when(even, n1d * n2d * (nd + 2.0) * (nd - 2.0) /
        (lit(48.0) * (nd - 1.0)))
      .otherwise(n1d * n2d * (nd + 1.0) * (lit(3.0) + nd * nd) /
        (lit(48.0) * nd * nd))
    val wz = (w - ew) / sqrt(vw)
    val abz = (ab - eab) / sqrt(vab)
    sums.select(col("n1"), (col("nn") - col("n1")).as("n2"),
      round(wz, 6).as("wilcoxon_z"), round(abz, 6).as("ansari_z"),
      round(wz * wz + abz * abz, 6).as("lepage_l"))
  }

  private[graft] lazy val anLepageSql = {
    val nd = "CAST(nn AS DOUBLE)"; val n1d = "CAST(n1 AS DOUBLE)"
    val n2d = s"($nd - $n1d)"
    val w = "(CAST(w2 AS DOUBLE) / 2.0)"; val ab = "(CAST(s2 AS DOUBLE) / 2.0)"
    val ew = s"($n1d * ($nd + 1.0) / 2.0)"
    val vw = s"($n1d * $n2d * ($nd + 1.0) / 12.0)"
    val eab = (s"(CASE WHEN nn % 2 = 0 THEN $n1d * ($nd + 2.0) / 4.0 " +
      s"ELSE $n1d * ($nd + 1.0) * ($nd + 1.0) / (4.0 * $nd) END)")
    val vab = (s"(CASE WHEN nn % 2 = 0 THEN $n1d * $n2d * ($nd + 2.0) * ($nd - 2.0) / (48.0 * ($nd - 1.0)) " +
      s"ELSE $n1d * $n2d * ($nd + 1.0) * (3.0 + $nd * $nd) / (48.0 * $nd * $nd) END)")
    val wz = s"(($w - $ew) / sqrt($vw))"
    val abz = s"(($ab - $eab) / sqrt($vab))"
    s"""WITH lab AS (SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
       |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
       |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
       |pv AS (SELECT v, CAST(SUM(g) AS BIGINT) AS c1, COUNT(*) AS cnt FROM lab GROUP BY v),
       |sc AS (SELECT v, c1, cnt,
       |         CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum
       |       FROM pv),
       |tot AS (SELECT COUNT(*) AS nn, CAST(SUM(g) AS BIGINT) AS n1 FROM lab),
       |qq AS (SELECT n1, nn,
       |    CAST(SUM(c1 * (2 * (cnt_cum - cnt) + cnt + 1)) AS BIGINT) AS w2,
       |    CAST(SUM(c1 * LEAST(2 * (cnt_cum - cnt) + cnt + 1,
       |          2 * (nn + 1) - (2 * (cnt_cum - cnt) + cnt + 1))) AS BIGINT) AS s2
       |  FROM sc CROSS JOIN tot GROUP BY n1, nn)
       |SELECT n1, nn - n1 AS n2, ROUND($wz, 6) AS wilcoxon_z,
       |  ROUND($abz, 6) AS ansari_z,
       |  ROUND($wz * $wz + $abz * $abz, 6) AS lepage_l
       |FROM qq""".stripMargin
  }

  /** Rayleigh test of order-date day-of-week uniformity — CIRCULAR
    * statistics the [[anDowChi2]] categorical test can't give: the
    * resultant R̄ = |Σe^{iθ}|/n measures DIRECTIONAL concentration
    * (chi² sees any non-uniformity; Rayleigh sees a preferred phase).
    * dow = epoch-day mod 7 (pure integer arithmetic — never the
    * engines' dayofweek conventions); cos/sin of the 7 angles are
    * SHARED Scala-printed shortest-round-trip literals in both the
    * Column tree and the SQL (the Zelen–Severo constant discipline),
    * so C = Σ cnt_k·cos_k is a 7-term exact-count dot product.
    * z = n·R̄², mean direction via atan2, ROUND(·,6). */
  private[graft] def anRayleighDow(s: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.orders(s, dir)
      .select(pmod(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")), lit(7)).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("cnt"))
    val cosK = (0 to 6).map(k => math.cos(2.0 * math.Pi * k / 7.0))
    val sinK = (0 to 6).map(k => math.sin(2.0 * math.Pi * k / 7.0))
    def pick(vs: Seq[Double]): Column =
      (1 to 6).foldLeft(when(col("k") === 0, lit(vs(0)))) {
        (acc, k) => acc.when(col("k") === k, lit(vs(k)))
      }
    val agg = cnt.agg(sum(col("cnt")).as("n"),
      sum(col("cnt").cast("double") * pick(cosK)).cast("decimal(38,6)").as("c"),
      sum(col("cnt").cast("double") * pick(sinK)).cast("decimal(38,6)").as("s"))
    val nd = col("n").cast("double")
    val rbar = sqrt(col("c").cast("double") * col("c").cast("double") +
      col("s").cast("double") * col("s").cast("double")) / nd
    agg.select(col("n"), round(rbar, 6).as("r_bar"),
      round(nd * rbar * rbar, 6).as("rayleigh_z"),
      round(atan2(col("s").cast("double"), col("c").cast("double")), 6)
        .as("mean_dir"))
  }

  private[graft] lazy val anRayleighDowSql = {
    val cosK = (0 to 6).map(k => math.cos(2.0 * math.Pi * k / 7.0))
    val sinK = (0 to 6).map(k => math.sin(2.0 * math.Pi * k / 7.0))
    def caseOf(vs: Seq[Double]) =
      "CASE k " + (0 to 6).map(k => s"WHEN $k THEN ${vs(k)}").mkString(" ") + " END"
    val rbar = "(sqrt(CAST(c AS DOUBLE) * CAST(c AS DOUBLE) " +
      "+ CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(n AS DOUBLE))"
    s"""WITH d AS (SELECT date_diff('day', DATE '1992-01-01',
       |      CAST(o_orderdate AS DATE)) % 7 AS k
       |    FROM orders),
       |cnt AS (SELECT k, COUNT(*) AS cnt FROM d GROUP BY k),
       |ag AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
       |    CAST(SUM(CAST(cnt AS DOUBLE) * (${caseOf(cosK)})) AS DECIMAL(38,6)) AS c,
       |    CAST(SUM(CAST(cnt AS DOUBLE) * (${caseOf(sinK)})) AS DECIMAL(38,6)) AS s
       |  FROM cnt)
       |SELECT n, ROUND($rbar, 6) AS r_bar,
       |  ROUND(CAST(n AS DOUBLE) * $rbar * $rbar, 6) AS rayleigh_z,
       |  ROUND(atan2(CAST(s AS DOUBLE), CAST(c AS DOUBLE)), 6) AS mean_dir
       |FROM ag""".stripMargin
  }

  /** Word-bigram conditional entropy H(W₂|W₁) per language — the
    * sequence-predictability number beside [[textCharEntropy]]'s
    * character view and an_entropy_rate's event-transition view: H =
    * −(1/N)Σ c₁₂·ln(c₁₂/c₁) over adjacent-word-pair counts, with
    * perplexity exp(H) beside it. Posting-shaped (the
    * text_pmi_collocations bigram explode, keyed by lang); counts
    * exact BIGINTs; per-bigram ln-ratio terms gather DECIMAL(38,18)
    * (bounded by N·ln N — inside the integer budget at any SF); one
    * division, ROUND(·,6). */
  private[graft] def textBigramCondEntropy(s: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val bi = graft.operators.Spread.forCompute(Tables.documents(s, dir))
      .select(col("lang"), explode(when(size(ws) >= 2,
        transform(sequence(lit(1), size(ws) - 1),
          i => struct(element_at(ws, i).as("w1"), element_at(ws, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("lang"), col("b.w1"), col("b.w2"))
      .groupBy(col("lang"), col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val uni = bi.groupBy(col("lang"), col("w1")).agg(sum(col("c12")).as("c1"))
    val terms = bi.join(uni, Seq("lang", "w1"))
      .select(col("lang"),
        (col("c12").cast("double") *
          log(col("c12").cast("double") / col("c1").cast("double")))
          .cast("decimal(38,18)").as("t"),
        col("c12"))
    terms.groupBy(col("lang"))
      .agg(sum(col("c12")).as("n_bigrams"),
        sum(col("t")).cast("decimal(38,18)").as("st"))
      .select(col("lang"), col("n_bigrams"),
        round(-col("st").cast("double") / col("n_bigrams").cast("double"), 6)
          .as("cond_entropy"),
        round(exp(-col("st").cast("double") / col("n_bigrams").cast("double")), 6)
          .as("perplexity"))
      .orderBy(col("lang"))
  }

  private[graft] lazy val textBigramCondEntropySql =
    """WITH t AS (SELECT lang, string_split(text, ' ') AS ws FROM documents),
      |bi AS (SELECT lang, ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
      |       FROM t, unnest(range(1, greatest(len(ws), 1))) AS u(i)),
      |bg AS (SELECT lang, w1, w2, COUNT(*) AS c12 FROM bi GROUP BY 1, 2, 3),
      |ug AS (SELECT lang, w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bg GROUP BY 1, 2),
      |tm AS (SELECT bg.lang,
      |         CAST(CAST(bg.c12 AS DOUBLE)
      |           * ln(CAST(bg.c12 AS DOUBLE) / CAST(ug.c1 AS DOUBLE))
      |           AS DECIMAL(38,18)) AS t,
      |         bg.c12
      |       FROM bg JOIN ug ON bg.lang = ug.lang AND bg.w1 = ug.w1),
      |ag AS (SELECT lang, CAST(SUM(c12) AS BIGINT) AS n_bigrams,
      |         CAST(SUM(t) AS DECIMAL(38,18)) AS st
      |       FROM tm GROUP BY lang)
      |SELECT lang, n_bigrams,
      |  ROUND(-CAST(st AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6) AS cond_entropy,
      |  ROUND(EXP(-CAST(st AS DOUBLE) / CAST(n_bigrams AS DOUBLE)), 6) AS perplexity
      |FROM ag ORDER BY lang""".stripMargin

  /** Hapax-legomena profile per language — the rare-tail vocabulary
    * shape beside [[textYuleK]]'s repetitiveness and heaps_fit's growth
    * curve: V1 (once-words), V2 (twice-words), hapax rate V1/V, Sichel
    * S = V2/V, and the token-mass share V1/N. A corpus whose hapax
    * rate collapses is template-saturated; one rising is OCR-noisy.
    * One posting aggregate, exact BIGINTs, three divisions at
    * emission, ROUND(·,6). */
  private[graft] def textHapax(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions
    val cnt = Tables.documents(s, dir)
      .select(col("lang"), explode(TextFunctions.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
    cnt.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_tokens"),
        sum((col("c") === 1).cast("long")).as("v1"),
        sum((col("c") === 2).cast("long")).as("v2"))
      .select(col("lang"), col("n_tokens"), col("n_types"), col("v1"), col("v2"),
        round(col("v1").cast("double") / col("n_types").cast("double"), 6)
          .as("hapax_rate"),
        round(col("v2").cast("double") / col("n_types").cast("double"), 6)
          .as("sichel_s"),
        round(col("v1").cast("double") / col("n_tokens").cast("double"), 6)
          .as("hapax_token_share"))
      .orderBy(col("lang"))
  }

  private[graft] lazy val textHapaxSql =
    """WITH w AS (SELECT lang, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      |  FROM documents),
      |cnt AS (SELECT lang, w, COUNT(*) AS c FROM w GROUP BY 1, 2),
      |ag AS (SELECT lang, COUNT(*) AS n_types, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
      |         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2
      |       FROM cnt GROUP BY lang)
      |SELECT lang, n_tokens, n_types, v1, v2,
      |  ROUND(CAST(v1 AS DOUBLE) / CAST(n_types AS DOUBLE), 6) AS hapax_rate,
      |  ROUND(CAST(v2 AS DOUBLE) / CAST(n_types AS DOUBLE), 6) AS sichel_s,
      |  ROUND(CAST(v1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS hapax_token_share
      |FROM ag ORDER BY lang""".stripMargin

  /** Embedding-corpus diversity: mean/min pairwise cosine over a FIXED
    * 200-vector probe set (vec_id < 200 — the id domain is key-shifted
    * per scale copy, so the probe set is 200 rows at ANY SF and the
    * pair frame is a bounded 19,900 rows, never corpus-quadratic).
    * The collapse detector for an embedding pipeline: mean pairwise
    * cosine drifting toward 1 means the embedder lost its spread.
    * Exact integer dots on the shared micro-unit quantization
    * (round(x·10⁶) — the sim-family portability discipline), per-pair
    * ROUND(cos, 6), mean via a DECIMAL(38,18) gather. */
  private[graft] def simDiversity(s: SparkSession, dir: String): DataFrame = {
    val quant: Column => Column =
      v => transform(v, x => round(x * lit(1000000.0)).cast("long"))
    val probe = Tables.embeddings(s, dir).filter(col("vec_id") < 200)
      .select(col("vec_id"),
        quant(graft.similarity.VectorOps.toDouble(col("embedding"))).as("q"))
      .withColumn("nrm",
        sqrt(aggregate(col("q"), lit(0L), (acc, x) => acc + x * x).cast("double")))
    val a = probe.select(col("vec_id").as("ia"), col("q").as("qa"), col("nrm").as("na"))
    val b = probe.select(col("vec_id").as("ib"), col("q").as("qb"), col("nrm").as("nb"))
    val pairs = a.join(broadcast(b), col("ia") < col("ib"))
      .select(round(
        aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y),
          lit(0L), (acc, x) => acc + x).cast("double") /
          (col("na") * col("nb")), 6).as("cs"))
    pairs.agg(count(lit(1)).as("n_pairs"),
        sum(col("cs").cast("decimal(38,18)")).cast("decimal(38,18)").as("sc"),
        min(col("cs")).as("min_cos"), max(col("cs")).as("max_cos"))
      .select(col("n_pairs"),
        round(col("sc").cast("double") / col("n_pairs").cast("double"), 6)
          .as("mean_cos"),
        col("min_cos"), col("max_cos"))
  }

  private[graft] lazy val simDiversitySql =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |           WHERE vec_id < 200),
      |vq AS (SELECT vec_id,
      |         list_transform(v, x -> CAST(round(x * 1000000.0) AS BIGINT)) AS q
      |       FROM e),
      |vn AS (SELECT vec_id, q,
      |         sqrt(CAST(CAST(list_sum(list_transform(q, x -> x * x)) AS BIGINT) AS DOUBLE)) AS nrm
      |       FROM vq),
      |pr AS (SELECT ROUND(
      |         CAST(CAST(list_sum(list_transform(range(1, len(a.q) + 1),
      |             i -> a.q[CAST(i AS INT)] * b.q[CAST(i AS INT)])) AS BIGINT) AS DOUBLE)
      |           / (a.nrm * b.nrm), 6) AS cs
      |       FROM vn a JOIN vn b ON a.vec_id < b.vec_id)
      |SELECT COUNT(*) AS n_pairs,
      |  ROUND(CAST(CAST(SUM(CAST(cs AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_cos,
      |  MIN(cs) AS min_cos, MAX(cs) AS max_cos
      |FROM pr""".stripMargin

  /** Per-column value-distribution entropy + concentration over the
    * order dimensions — the information-content companion to
    * etl_profile's null/distinct census (the pre-encoding audit: a
    * column with near-zero entropy one-hot-encodes to dead weight; a
    * top-share near 1 is a constant in disguise). H = −Σ p ln p with
    * c·ln c gathered DECIMAL(38,18) (the an_entropy discipline),
    * top_share = max(c)/n exact, both ROUND(·,6). */
  private[graft] def etlValueEntropy(s: SparkSession, dir: String): DataFrame = {
    // the synthetic orders schema has no ship priority; the third
    // profiled dimension is the calendar month (bounded domain)
    val o = Tables.orders(s, dir)
      .withColumn("o_month", month(col("o_orderdate").cast("date")))
    def one(cname: String): DataFrame = {
      val cnt = o.groupBy(col(cname).cast("string").as("v"))
        .agg(count(lit(1)).as("c"))
      cnt.agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
          max(col("c")).as("cmax"),
          sum((col("c").cast("double") * log(col("c").cast("double")))
            .cast("decimal(38,18)")).cast("decimal(38,18)").as("slc"))
        .select(lit(cname).as("column"), col("n"), col("n_distinct"),
          round(log(col("n").cast("double")) -
            col("slc").cast("double") / col("n").cast("double"), 6).as("entropy"),
          round(col("cmax").cast("double") / col("n").cast("double"), 6)
            .as("top_share"))
    }
    Seq("o_orderpriority", "o_orderstatus", "o_month")
      .map(one).reduce(_.unionAll(_)).orderBy(col("column"))
  }

  private[graft] lazy val etlValueEntropySql = {
    def one(c: String) =
      s"""SELECT '$c' AS "column", n, n_distinct,
         |  ROUND(ln(CAST(n AS DOUBLE)) - CAST(slc AS DOUBLE) / CAST(n AS DOUBLE), 6) AS entropy,
         |  ROUND(CAST(cmax AS DOUBLE) / CAST(n AS DOUBLE), 6) AS top_share
         |FROM (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_distinct,
         |        CAST(MAX(c) AS BIGINT) AS cmax,
         |        CAST(SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS slc
         |      FROM (SELECT CAST($c AS VARCHAR) AS v, COUNT(*) AS c
         |            FROM (SELECT *, month(CAST(o_orderdate AS DATE)) AS o_month
         |                  FROM orders) GROUP BY 1))""".stripMargin
    Seq("o_orderpriority", "o_orderstatus", "o_month").map(one)
      .mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) u ORDER BY \"column\"")
  }

  private[graft] lazy val anSnhtSql = {
    val nd = "CAST(n AS DOUBLE)"
    val s2 = s"(CAST(CAST(n AS DECIMAL(38,0)) * tyy - ty * ty AS DOUBLE) / ($nd * ($nd - 1.0)))"
    val dk = "CAST(CAST(n AS DECIMAL(38,0)) * CAST(p AS DECIMAL(38,0)) - CAST(t AS DECIMAL(38,0)) * ty AS DECIMAL(38,0))"
    val tk = s"(CAST($dk AS DOUBLE) * CAST($dk AS DOUBLE) " +
      s"* (1.0 / CAST(t AS DOUBLE) + 1.0 / ($nd - CAST(t AS DOUBLE))) / ($nd * $nd * $s2))"
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |cum AS (SELECT d, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
       |          CAST(SUM(rev_c) OVER (ORDER BY d) AS BIGINT) AS p
       |        FROM sp),
       |tot AS (SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ty,
       |    CAST(SUM(CAST(CAST(rev_c AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tyy
       |  FROM sp),
       |scan AS (SELECT d, n, ROUND($tk, 6) AS tk
       |         FROM cum CROSS JOIN tot WHERE t < n)
       |SELECT n, d AS argmax_day, tk AS t_max
       |FROM scan ORDER BY tk DESC, d LIMIT 1""".stripMargin
  }
}

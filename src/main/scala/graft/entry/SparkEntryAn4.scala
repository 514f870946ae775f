package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-17 wave-2 analytics: the classical change-point / randomness /
  * spatial-autocorrelation / causality battery over the shared spines
  * (day-spine series, nation/region key frames, survival risk sets),
  * split into a fourth trait file to keep every family file under the
  * ~4k-line maintainability bar. Same scope rules as
  * [[SparkEntryAn1]]–[[SparkEntryAn3]]: the self-type gives members the
  * registry object's scope; moved vals stay lazy. */
private[graft] trait SparkEntryAn4 { this: SparkEntry.type =>

  /** Pettitt change-point test on daily revenue — the RANK-based,
    * distribution-free companion to [[anChangepoint]]'s mean-shift scan
    * and [[anCusum]]'s drift alarm: where did the revenue distribution
    * most plausibly break, with significance that survives the heavy
    * tails that invalidate a Gaussian CUSUM? U_t = Σ_{i≤t} A_i −
    * t(n+1) where A_i = 2·cnt_lt + cnt_eq + 1 is TWICE the average
    * (midrank) rank — so every U_t is an exact BIGINT off two
    * spine-bounded prefix scans (value order for midranks, time order
    * for the partial sums; the day spine is calendar-bounded, ~2.5k
    * rows at ANY corpus size). K = max|U_t| over t < n, t* the
    * earliest maximizing day, p = 2·exp(−6K²/(n³+n²)) one IEEE
    * expression off exact integers, ROUND(·,6). */
  private[graft] def anPettitt(s: SparkSession, dir: String): DataFrame = {
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wv = Window.orderBy("rev_c")
    val vr = sp.groupBy(col("rev_c")).agg(count(lit(1)).as("ceq"))
      .withColumn("clt", coalesce(sum(col("ceq"))
        .over(wv.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("rev_c"), (lit(2L) * col("clt") + col("ceq") + lit(1L)).as("a2"))
    val wd = Window.orderBy("d")
    val u = sp.join(vr, Seq("rev_c"))
      .withColumn("t", row_number().over(wd).cast("long"))
      .withColumn("s2", sum(col("a2")).over(wd))
    val n = sp.agg(count(lit(1)).as("n"))
    val uu = u.crossJoin(broadcast(n))
      .filter(col("t") < col("n"))
      .select(col("d"), col("n"),
        (col("s2") - col("t") * (col("n") + lit(1L))).as("u"))
    val k = uu.agg(max(abs(col("u"))).as("k"))
    val kd = col("k_stat").cast("double")
    val nd = col("n").cast("double")
    uu.crossJoin(broadcast(k))
      .filter(abs(col("u")) === col("k"))
      .agg(max(col("n")).as("n"), max(col("k")).as("k_stat"),
        min(col("d")).as("t_star_d"))
      .select(col("n"), col("k_stat"), col("t_star_d"),
        round(lit(2.0) * exp(lit(-6.0) * kd * kd /
          (nd * nd * nd + nd * nd)), 6).as("p_value"))
  }

  private[graft] lazy val anPettittSql =
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |vc AS (SELECT rev_c, COUNT(*) AS ceq FROM sp GROUP BY 1),
       |vr AS (SELECT rev_c,
       |    2 * CAST(COALESCE(SUM(ceq) OVER (ORDER BY rev_c
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    + ceq + 1 AS a2
       |  FROM vc),
       |u AS (SELECT d, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
       |        CAST(SUM(a2) OVER (ORDER BY d) AS BIGINT) AS s2
       |      FROM sp JOIN vr USING (rev_c)),
       |nn AS (SELECT COUNT(*) AS n FROM sp),
       |uu AS (SELECT d, nn.n AS n, s2 - t * (nn.n + 1) AS u
       |       FROM u CROSS JOIN nn WHERE t < nn.n),
       |k AS (SELECT MAX(ABS(u)) AS k FROM uu)
       |SELECT MAX(n) AS n, MAX(k.k) AS k_stat, MIN(d) AS t_star_d,
       |  ROUND(2.0 * EXP(-6.0 * CAST(MAX(k.k) AS DOUBLE) * CAST(MAX(k.k) AS DOUBLE)
       |    / (CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) AS DOUBLE)
       |       + CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) AS DOUBLE))), 6) AS p_value
       |FROM uu CROSS JOIN k WHERE ABS(u) = k.k""".stripMargin

  /** Buishand range test on daily revenue — the CUMULATIVE-DEVIATION
    * homogeneity companion to [[anPettitt]] (Pettitt locates a rank
    * break; Buishand asks whether the rescaled adjusted partial sums
    * ever wander further than a homogeneous series allows). The
    * partial sums are kept exact by n-scaling: n·S_t = n·cum_t − t·T
    * (DECIMAL(38,0) — never a float mean), so max/min are decided on
    * exact integers; R/σ̂√n and Q/σ̂√n divide once in double with
    * σ̂√n = √((n·Σy² − T²)/n), ROUND(·,6). WIDTH CONTRACT: n·Σy² at
    * DECIMAL(38,0) holds to ~1e3× the sf10-probed daily revenue level
    * (the an_kpss class). */
  private[graft] def anBuishand(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wd = Window.orderBy("d")
    val cum = sp.withColumn("t", row_number().over(wd).cast("long"))
      .withColumn("cy", sum(col("rev_c")).over(wd))
    val tot = sp.agg(count(lit(1)).as("n"), sum(d38(col("rev_c"))).as("ty"),
      sum((d38(col("rev_c")) * d38(col("rev_c"))).cast("decimal(38,0)")).as("tyy"))
    val ns = cum.crossJoin(broadcast(tot))
      .select(col("n"), col("ty"), col("tyy"),
        (d38(col("n")) * d38(col("cy")) - d38(col("t")) * col("ty"))
          .cast("decimal(38,0)").as("nst"))
    val sigSqrtN = sqrt((d38(col("n")) * col("tyy") - col("ty") * col("ty"))
      .cast("double") / col("n").cast("double"))
    ns.agg(max(col("n")).as("n"), max(col("ty")).as("ty"),
        max(col("tyy")).as("tyy"),
        max(col("nst")).as("mx"), min(col("nst")).as("mn"))
      .select(col("n"),
        round(((col("mx") - col("mn")).cast("double") / col("n").cast("double"))
          / sigSqrtN, 6).as("rb_stat"),
        round((greatest(abs(col("mx")), abs(col("mn"))).cast("double")
          / col("n").cast("double")) / sigSqrtN, 6).as("q_stat"))
  }

  private[graft] lazy val anBuishandSql = {
    val sig = """sqrt(CAST(CAST(n AS DECIMAL(38,0)) * tyy - ty * ty AS DOUBLE)
                | / CAST(n AS DOUBLE))""".stripMargin.replace("\n", "")
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |cum AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
       |          CAST(SUM(rev_c) OVER (ORDER BY d) AS BIGINT) AS cy
       |        FROM sp),
       |tot AS (SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ty,
       |    CAST(SUM(CAST(CAST(rev_c AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tyy
       |  FROM sp),
       |ns AS (SELECT n, ty, tyy,
       |    CAST(CAST(n AS DECIMAL(38,0)) * CAST(cy AS DECIMAL(38,0))
       |      - CAST(t AS DECIMAL(38,0)) * ty AS DECIMAL(38,0)) AS nst
       |  FROM cum CROSS JOIN tot),
       |ag AS (SELECT MAX(n) AS n, MAX(ty) AS ty, MAX(tyy) AS tyy,
       |        MAX(nst) AS mx, MIN(nst) AS mn FROM ns)
       |SELECT n,
       |  ROUND((CAST(mx - mn AS DOUBLE) / CAST(n AS DOUBLE)) / $sig, 6) AS rb_stat,
       |  ROUND((CAST(GREATEST(ABS(mx), ABS(mn)) AS DOUBLE) / CAST(n AS DOUBLE))
       |    / $sig, 6) AS q_stat
       |FROM ag""".stripMargin
  }

  /** Von Neumann successive-difference ratio on daily revenue — the
    * lag-free randomness screen this family was missing: η =
    * Σ(y_t−y_{t−1})²/Σ(y−ȳ)² sits near 2 for white noise, collapses
    * toward 0 under trend/positive autocorrelation (what
    * [[anDurbinWatson]] tests on REGRESSION residuals, tested here on
    * the raw series). Exact form: η = n·Σd²/(n·Σy² − T²) — numerator
    * and denominator exact DECIMAL(38,0) off one lag pass + one
    * moment pass over the calendar-bounded spine, one double division;
    * z = (η − 2)/√(4(n−2)/((n−1)(n+1))), both ROUND(·,6). */
  private[graft] def anVonNeumann(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wd = Window.orderBy("d")
    val dd = sp.withColumn("py", lag(col("rev_c"), 1).over(wd))
      .filter(col("py").isNotNull)
      .select((col("rev_c") - col("py")).as("df"))
      .agg(sum((d38(col("df")) * d38(col("df"))).cast("decimal(38,0)")).as("sdd"))
    val tot = sp.agg(count(lit(1)).as("n"), sum(d38(col("rev_c"))).as("ty"),
      sum((d38(col("rev_c")) * d38(col("rev_c"))).cast("decimal(38,0)")).as("tyy"))
    val nd = col("n").cast("double")
    val vn = (d38(col("n")) * col("sdd")).cast("double") /
      (d38(col("n")) * col("tyy") - col("ty") * col("ty")).cast("double")
    dd.crossJoin(broadcast(tot))
      .select(col("n"), round(vn, 6).as("vn_ratio"),
        round((vn - lit(2.0)) /
          sqrt(lit(4.0) * (nd - lit(2.0)) / ((nd - lit(1.0)) * (nd + lit(1.0)))), 6)
          .as("z_vn"))
  }

  private[graft] lazy val anVonNeumannSql = {
    val vn = """(CAST(CAST(n AS DECIMAL(38,0)) * sdd AS DOUBLE)
               | / CAST(CAST(n AS DECIMAL(38,0)) * tyy - ty * ty AS DOUBLE))"""
      .stripMargin.replace("\n", "")
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |dd AS (SELECT CAST(SUM(CAST(CAST(df AS DECIMAL(38,0)) * CAST(df AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sdd
       |  FROM (SELECT rev_c - LAG(rev_c) OVER (ORDER BY d) AS df FROM sp)
       |  WHERE df IS NOT NULL),
       |tot AS (SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ty,
       |    CAST(SUM(CAST(CAST(rev_c AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tyy
       |  FROM sp)
       |SELECT n, ROUND($vn, 6) AS vn_ratio,
       |  ROUND(($vn - 2.0)
       |    / sqrt(4.0 * (CAST(n AS DOUBLE) - 2.0)
       |      / ((CAST(n AS DOUBLE) - 1.0) * (CAST(n AS DOUBLE) + 1.0))), 6) AS z_vn
       |FROM dd CROSS JOIN tot""".stripMargin
  }

  /** Cox–Stuart trend sign test on daily revenue — the assumption-free
    * "is it even going UP" screen underneath [[anMannKendall]]'s full
    * pairwise trend statistic: pair day i with day i+⌈n/2⌉ (the odd
    * middle day drops), count sign(later − earlier), and test the
    * positive count against Binomial(N′, ½) with a continuity-
    * corrected normal z = sign(D)·(|D|−1)/√N′ where D = S⁺ − S⁻ (ties
    * drop). The pairing is one spine-bounded self-join on the row
    * index; every count is an exact BIGINT, z ROUND(·,6). */
  private[graft] def anCoxStuart(s: SparkSession, dir: String): DataFrame = {
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wd = Window.orderBy("d")
    val r = sp.withColumn("i", row_number().over(wd).cast("long"))
    val n = sp.agg(count(lit(1)).as("n"))
    val rr = r.crossJoin(broadcast(n))
    val a = rr.filter(col("i") <= expr("n div 2"))
      .select(col("i").as("p"), col("rev_c").as("y1"), col("n"))
    val b = rr.filter(col("i") > col("n") - expr("n div 2"))
      .select((col("i") - (col("n") - expr("n div 2"))).as("p"),
        col("rev_c").as("y2"))
    val cnt = a.join(b, Seq("p"))
      .agg(max(col("n")).as("n"),
        sum((col("y2") > col("y1")).cast("long")).as("s_plus"),
        sum((col("y2") < col("y1")).cast("long")).as("s_minus"))
    val dSt = col("s_plus") - col("s_minus")
    val np = col("s_plus") + col("s_minus")
    val mag = (abs(dSt) - lit(1L)).cast("double") / sqrt(np.cast("double"))
    cnt.select(col("n"), np.as("n_pairs"), col("s_plus"), col("s_minus"),
      round(when(dSt > 0, mag).when(dSt < 0, -mag).otherwise(lit(0.0)), 6)
        .as("z_trend"))
  }

  private[graft] lazy val anCoxStuartSql =
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |r AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS i, rev_c
       |      FROM sp),
       |nn AS (SELECT COUNT(*) AS n FROM sp),
       |a AS (SELECT i AS p, rev_c AS y1, nn.n AS n FROM r CROSS JOIN nn
       |      WHERE i <= nn.n // 2),
       |b AS (SELECT i - (nn.n - nn.n // 2) AS p, rev_c AS y2
       |      FROM r CROSS JOIN nn WHERE i > nn.n - nn.n // 2),
       |cnt AS (SELECT MAX(n) AS n,
       |    CAST(SUM(CASE WHEN y2 > y1 THEN 1 ELSE 0 END) AS BIGINT) AS s_plus,
       |    CAST(SUM(CASE WHEN y2 < y1 THEN 1 ELSE 0 END) AS BIGINT) AS s_minus
       |  FROM a JOIN b USING (p))
       |SELECT n, s_plus + s_minus AS n_pairs, s_plus, s_minus,
       |  ROUND(CASE
       |    WHEN s_plus - s_minus > 0 THEN
       |      CAST(ABS(s_plus - s_minus) - 1 AS DOUBLE)
       |        / sqrt(CAST(s_plus + s_minus AS DOUBLE))
       |    WHEN s_plus - s_minus < 0 THEN
       |      -(CAST(ABS(s_plus - s_minus) - 1 AS DOUBLE)
       |        / sqrt(CAST(s_plus + s_minus AS DOUBLE)))
       |    ELSE 0.0 END, 6) AS z_trend
       |FROM cnt""".stripMargin

  /** Wald–Wolfowitz two-sample runs test — BUILDING vs AUTOMOBILE
    * account balances interleaved on one global value order: if the two
    * segments draw from one distribution the group labels alternate
    * freely (many runs); clustering of either label collapses the run
    * count. The global order is (v, g, custkey) — a deterministic
    * total order both engines share, which IS the tie contract (runs
    * tests are undefined under free tie permutation; pinning the order
    * pins the statistic). Ranks come from ONE
    * [[graft.operators.PrefixSum]] scan (no single-partition window
    * over the corpus-sized frame); boundaries are a rank self-join on
    * rn = rn+1 (equi-join, shuffle on 8-byte keys); R, n₁, n₀ exact
    * BIGINTs; z = (R − μ)/σ with μ = 1 + 2n₁n₀/n, σ² =
    * 2n₁n₀(2n₁n₀−n)/(n²(n−1)), ROUND(·,6). */
  private[graft] def anWaldWolfowitz(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select((col("c_mktsegment") === "BUILDING").cast("long").as("g"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"),
        col("c_custkey").cast("long").as("ck"))
    val scan = graft.operators.PrefixSum.withRunningTotals(
      c, Seq("v", "g", "ck"), Seq("g"))
    val tot = scan.agg(max(col("rn")).as("n"), max(col("g_cum")).as("n1"))
    val sw = scan.as("a").join(scan.as("b"), col("a.rn") === col("b.rn") - 1)
      .agg(sum((col("a.g") =!= col("b.g")).cast("long")).as("switches"))
    val n1d = col("n1").cast("double")
    val n0d = (col("n") - col("n1")).cast("double")
    val nd = col("n").cast("double")
    val t2 = (lit(2L) * col("n1") * (col("n") - col("n1"))).cast("double")
    val mu = lit(1.0) + lit(2.0) * n1d * n0d / nd
    val vr = t2 * (t2 - nd) / (nd * nd * (nd - lit(1.0)))
    sw.crossJoin(broadcast(tot))
      .select(col("n1"), (col("n") - col("n1")).as("n0"),
        (col("switches") + lit(1L)).as("runs"),
        round(((col("switches") + lit(1L)).cast("double") - mu) / sqrt(vr), 6)
          .as("z_runs"))
  }

  private[graft] lazy val anWaldWolfowitzSql =
    """WITH c AS (SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
      |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v,
      |    c_custkey AS ck
      |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
      |r AS (SELECT g, LAG(g) OVER (ORDER BY v, g, ck) AS pg FROM c),
      |t AS (SELECT COUNT(*) AS n, CAST(SUM(g) AS BIGINT) AS n1,
      |        CAST(SUM(CASE WHEN pg IS NOT NULL AND g <> pg THEN 1 ELSE 0 END) AS BIGINT) + 1 AS runs
      |      FROM r)
      |SELECT n1, n - n1 AS n0, runs,
      |  ROUND((CAST(runs AS DOUBLE)
      |      - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)
      |         / CAST(n AS DOUBLE)))
      |    / sqrt(CAST(2 * n1 * (n - n1) AS DOUBLE)
      |      * (CAST(2 * n1 * (n - n1) AS DOUBLE) - CAST(n AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6)
      |    AS z_runs
      |FROM t""".stripMargin

  /** Per-nation mean-balance deviations + region frame shared by
    * [[anMoranI]]/[[anGearyC]]: one customer pass to per-nation exact
    * decimal sums (k = 25 nations at ANY corpus size), nation→region by
    * broadcast, the grand mean an UNWEIGHTED mean of the k per-nation
    * means (the spatial-stats convention — the unit of analysis is the
    * areal unit, not the customer) gathered DECIMAL(38,18). Returns
    * (nk, rk, z) with z the double deviation. */
  private def nationDeviations(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val nat = Tables.nation(s, dir)
      .select(col("n_nationkey").as("nk"), col("n_regionkey").as("rk"))
    val g = Tables.customer(s, dir)
      .select(col("c_nationkey").as("nk"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
      .groupBy(col("nk"))
      .agg(count(lit(1)).as("n_g"), sum(d38(col("v"))).as("s1"))
      .join(broadcast(nat), Seq("nk"))
      .select(col("nk"), col("rk"),
        (col("s1").cast("double") / col("n_g").cast("double")).as("m"))
    val gr = g.agg(count(lit(1)).as("k"), sum(d18(col("m"))).as("sm"))
    g.crossJoin(broadcast(gr))
      .select(col("nk"), col("rk"), col("k"),
        (col("m") - col("sm").cast("double") / col("k").cast("double")).as("z"))
  }

  private val nationDeviationsSql =
    """nat AS (SELECT n_nationkey AS nk, n_regionkey AS rk FROM nation),
      |gg AS (SELECT c_nationkey AS nk, COUNT(*) AS n_g,
      |    CAST(SUM(CAST(CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1
      |  FROM customer GROUP BY c_nationkey),
      |g AS (SELECT gg.nk, rk, CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE) AS m
      |  FROM gg JOIN nat ON gg.nk = nat.nk),
      |gr AS (SELECT COUNT(*) AS k,
      |    CAST(SUM(CAST(m AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sm FROM g),
      |dev AS (SELECT nk, rk, k,
      |    m - CAST(sm AS DOUBLE) / CAST(k AS DOUBLE) AS z
      |  FROM g CROSS JOIN gr)""".stripMargin

  /** Moran's I over per-nation mean balances with binary same-region
    * contiguity weights — the "is geography leaking into the metric"
    * screen: under the null (no spatial structure) E[I] = −1/(k−1);
    * same-region nations moving together push I positive. For block
    * weights the double sum collapses per region to (Σz)² − Σz² — NO
    * pair join, one k-sized gather; W = Σ n_r(n_r−1), S₁ = 2W, S₂ =
    * 4Σ n_r(n_r−1)² exact integers, and the normality z uses the
    * closed-form Var(I) = (k²S₁ − kS₂ + 3W²)/(W²(k²−1)) − E[I]².
    * I, E, z ROUND(·,6). */
  private[graft] def anMoranI(s: SparkSession, dir: String): DataFrame = {
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val dev = nationDeviations(s, dir)
    val reg = dev.groupBy(col("rk"))
      .agg(max(col("k")).as("k"), count(lit(1)).as("n_r"),
        sum(d18(col("z"))).as("sz"),
        sum(d18(col("z") * col("z"))).as("szz"))
    val kd = col("k").cast("double")
    val wd = col("w").cast("double")
    val ei = lit(-1.0) / (kd - lit(1.0))
    val agg = reg.agg(max(col("k")).as("k"),
      sum(col("n_r") * (col("n_r") - lit(1L))).as("w"),
      sum(col("n_r") * (col("n_r") - lit(1L)) * (col("n_r") - lit(1L))).as("w2"),
      sum(d18(col("sz").cast("double") * col("sz").cast("double") -
        col("szz").cast("double"))).as("num"),
      sum(col("szz")).as("den"))
    val iStat = (kd / wd) *
      (col("num").cast("double") / col("den").cast("double"))
    val s1 = lit(2.0) * wd
    val s2 = lit(4.0) * col("w2").cast("double")
    val varI = (kd * kd * s1 - kd * s2 + lit(3.0) * wd * wd) /
      (wd * wd * (kd * kd - lit(1.0))) - ei * ei
    agg.select(col("k"), col("w"),
      round(iStat, 6).as("moran_i"), round(ei, 6).as("e_i"),
      round((iStat - ei) / sqrt(varI), 6).as("z_i"))
  }

  private[graft] lazy val anMoranISql = {
    val i = """((CAST(k AS DOUBLE) / CAST(w AS DOUBLE))
              | * (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)))"""
      .stripMargin.replace("\n", "")
    val ei = "(-1.0 / (CAST(k AS DOUBLE) - 1.0))"
    val varI =
      """((CAST(k AS DOUBLE) * CAST(k AS DOUBLE) * (2.0 * CAST(w AS DOUBLE))
        |  - CAST(k AS DOUBLE) * (4.0 * CAST(w2 AS DOUBLE))
        |  + 3.0 * CAST(w AS DOUBLE) * CAST(w AS DOUBLE))
        | / (CAST(w AS DOUBLE) * CAST(w AS DOUBLE)
        |    * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0))
        | - (-1.0 / (CAST(k AS DOUBLE) - 1.0)) * (-1.0 / (CAST(k AS DOUBLE) - 1.0)))"""
        .stripMargin.replace("\n", "")
    s"""WITH $nationDeviationsSql,
       |reg AS (SELECT rk, MAX(k) AS k, COUNT(*) AS n_r,
       |    CAST(SUM(CAST(z AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sz,
       |    CAST(SUM(CAST(z * z AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS szz
       |  FROM dev GROUP BY rk),
       |ag AS (SELECT MAX(k) AS k,
       |    CAST(SUM(n_r * (n_r - 1)) AS BIGINT) AS w,
       |    CAST(SUM(n_r * (n_r - 1) * (n_r - 1)) AS BIGINT) AS w2,
       |    CAST(SUM(CAST(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
       |      - CAST(szz AS DOUBLE) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS num,
       |    CAST(SUM(szz) AS DECIMAL(38,18)) AS den
       |  FROM reg)
       |SELECT k, w, ROUND($i, 6) AS moran_i, ROUND($ei, 6) AS e_i,
       |  ROUND(($i - $ei) / sqrt($varI), 6) AS z_i
       |FROM ag""".stripMargin
  }

  /** Geary's C over the same nation/region frame — [[anMoranI]]'s
    * LOCAL-contrast dual (Moran correlates deviations; Geary sums
    * squared NEIGHBOR DIFFERENCES, so it is the more sensitive of the
    * two to single discordant nations): C = ((k−1)/(2W))·ΣΣw(z_i−z_j)²
    * /Σz², the block-weight double sum collapsing per region to
    * 2(n_r·Σz² − (Σz)²); E[C] = 1, Var(C) = ((2S₁+S₂)(k−1) − 4W²)
    * /(2(k+1)W²) under normality. C and z ROUND(·,6). */
  private[graft] def anGearyC(s: SparkSession, dir: String): DataFrame = {
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val dev = nationDeviations(s, dir)
    val reg = dev.groupBy(col("rk"))
      .agg(max(col("k")).as("k"), count(lit(1)).as("n_r"),
        sum(d18(col("z"))).as("sz"),
        sum(d18(col("z") * col("z"))).as("szz"))
    val agg = reg.agg(max(col("k")).as("k"),
      sum(col("n_r") * (col("n_r") - lit(1L))).as("w"),
      sum(col("n_r") * (col("n_r") - lit(1L)) * (col("n_r") - lit(1L))).as("w2"),
      sum(d18(lit(2.0) * (col("n_r").cast("double") *
        col("szz").cast("double") -
        col("sz").cast("double") * col("sz").cast("double")))).as("numc"),
      sum(col("szz")).as("den"))
    val kd = col("k").cast("double")
    val wd = col("w").cast("double")
    val cStat = ((kd - lit(1.0)) / (lit(2.0) * wd)) *
      (col("numc").cast("double") / col("den").cast("double"))
    val s1 = lit(2.0) * wd
    val s2 = lit(4.0) * col("w2").cast("double")
    val varC = ((lit(2.0) * s1 + s2) * (kd - lit(1.0)) - lit(4.0) * wd * wd) /
      (lit(2.0) * (kd + lit(1.0)) * wd * wd)
    agg.select(col("k"), col("w"),
      round(cStat, 6).as("geary_c"),
      round((cStat - lit(1.0)) / sqrt(varC), 6).as("z_c"))
  }

  private[graft] lazy val anGearyCSql = {
    val c = """(((CAST(k AS DOUBLE) - 1.0) / (2.0 * CAST(w AS DOUBLE)))
              | * (CAST(numc AS DOUBLE) / CAST(den AS DOUBLE)))"""
      .stripMargin.replace("\n", "")
    val varC =
      """(((2.0 * (2.0 * CAST(w AS DOUBLE)) + 4.0 * CAST(w2 AS DOUBLE))
        |   * (CAST(k AS DOUBLE) - 1.0)
        |  - 4.0 * CAST(w AS DOUBLE) * CAST(w AS DOUBLE))
        | / (2.0 * (CAST(k AS DOUBLE) + 1.0)
        |    * CAST(w AS DOUBLE) * CAST(w AS DOUBLE)))"""
        .stripMargin.replace("\n", "")
    s"""WITH $nationDeviationsSql,
       |reg AS (SELECT rk, MAX(k) AS k, COUNT(*) AS n_r,
       |    CAST(SUM(CAST(z AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sz,
       |    CAST(SUM(CAST(z * z AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS szz
       |  FROM dev GROUP BY rk),
       |ag AS (SELECT MAX(k) AS k,
       |    CAST(SUM(n_r * (n_r - 1)) AS BIGINT) AS w,
       |    CAST(SUM(n_r * (n_r - 1) * (n_r - 1)) AS BIGINT) AS w2,
       |    CAST(SUM(CAST(2.0 * (CAST(n_r AS DOUBLE) * CAST(szz AS DOUBLE)
       |      - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS numc,
       |    CAST(SUM(szz) AS DECIMAL(38,18)) AS den
       |  FROM reg)
       |SELECT k, w, ROUND($c, 6) AS geary_c,
       |  ROUND(($c - 1.0) / sqrt($varC), 6) AS z_c
       |FROM ag""".stripMargin
  }

  /** Granger-causality F-test (lag 1): does yesterday's shipped
    * QUANTITY improve today's revenue forecast beyond yesterday's
    * revenue alone — the directional companion to [[anCcf]]'s
    * symmetric cross-correlation. Both series come from ONE lineitem
    * day-aggregate (exact cents + exact unit counts); the lag pairing
    * is a spine-bounded window; restricted (y_t ~ y_{t−1}) and
    * unrestricted (+ x_{t−1}) OLS solve CLOSED-FORM off one exact
    * decimal moment matrix — C_ab = n·Σab − Σa·Σb all DECIMAL(38,0),
    * the 2×2 determinant solve and both RSS in double off the shared
    * tree. F = (RSS_r − RSS_u)/(RSS_u/(n−3)) ROUND 6; the x
    * coefficient ROUNDs 6 too — its tree divides products of
    * decimal→double casts whose int128→binary64 conversions the two
    * engines round differently once the moments pass 2^53 (observed
    * one ulp at sf1), so the single-division unrounded contract does
    * NOT apply; rss_gain is scale-free ROUND 6.
    * WIDTH CONTRACT: n·Σy² at DECIMAL(38,0) — the an_kpss class. */
  private[graft] def anGranger(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val sp = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
          .cast("bigint").as("y"),
        sum(col("l_quantity").cast("decimal(24,0)")).cast("bigint").as("x"))
    val wd = Window.orderBy("day")
    val lagd = sp
      .withColumn("u", lag(col("y"), 1).over(wd))
      .withColumn("v", lag(col("x"), 1).over(wd))
      .filter(col("u").isNotNull)
      .select(col("y").as("w"), col("u"), col("v"))
    def p(a: Column, b: Column) = sum((d38(a) * d38(b)).cast("decimal(38,0)"))
    val m = lagd.agg(count(lit(1)).as("n"),
      sum(d38(col("u"))).as("su"), sum(d38(col("v"))).as("sv"),
      sum(d38(col("w"))).as("sw"),
      p(col("u"), col("u")).as("suu"), p(col("v"), col("v")).as("svv"),
      p(col("w"), col("w")).as("sww"), p(col("u"), col("v")).as("suv"),
      p(col("u"), col("w")).as("suw"), p(col("v"), col("w")).as("svw"))
    def cc(sab: Column, sa: Column, sb: Column) =
      (d38(col("n")) * sab - sa * sb).cast("double")
    val cuu = cc(col("suu"), col("su"), col("su"))
    val cvv = cc(col("svv"), col("sv"), col("sv"))
    val cww = cc(col("sww"), col("sw"), col("sw"))
    val cuv = cc(col("suv"), col("su"), col("sv"))
    val cuw = cc(col("suw"), col("su"), col("sw"))
    val cvw = cc(col("svw"), col("sv"), col("sw"))
    val det = cuu * cvv - cuv * cuv
    val b = (cuw * cvv - cvw * cuv) / det
    val c2 = (cvw * cuu - cuw * cuv) / det
    val nd = col("n").cast("double")
    val rssr = (cww - cuw * cuw / cuu) / nd
    val rssu = (cww - b * cuw - c2 * cvw) / nd
    m.select(col("n"),
      round((rssr - rssu) / (rssu / (nd - lit(3.0))), 6).as("f_stat"),
      round(c2, 6).as("x_coef"),
      round((rssr - rssu) / rssr, 6).as("rss_gain"))
  }

  private[graft] lazy val anGrangerSql = {
    def cc(sab: String, sa: String, sb: String) =
      s"CAST(CAST(n AS DECIMAL(38,0)) * $sab - $sa * $sb AS DOUBLE)"
    val (cuu, cvv, cww) = (cc("suu", "su", "su"), cc("svv", "sv", "sv"),
      cc("sww", "sw", "sw"))
    val (cuv, cuw, cvw) = (cc("suv", "su", "sv"), cc("suw", "su", "sw"),
      cc("svw", "sv", "sw"))
    val det = s"($cuu * $cvv - $cuv * $cuv)"
    val b = s"(($cuw * $cvv - $cvw * $cuv) / $det)"
    val c2 = s"(($cvw * $cuu - $cuw * $cuv) / $det)"
    val rssr = s"(($cww - $cuw * $cuw / $cuu) / CAST(n AS DOUBLE))"
    val rssu = s"(($cww - $b * $cuw - $c2 * $cvw) / CAST(n AS DOUBLE))"
    def pp(a: String, bb: String) =
      s"CAST(SUM(CAST(CAST($a AS DECIMAL(38,0)) * CAST($bb AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0))"
    s"""WITH sp AS (SELECT date_trunc('day', l_shipdate) AS day,
       |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS y,
       |    CAST(SUM(CAST(l_quantity AS DECIMAL(24,0))) AS BIGINT) AS x
       |  FROM lineitem GROUP BY 1),
       |lagd AS (SELECT w, u, v FROM (
       |    SELECT y AS w, LAG(y) OVER (ORDER BY day) AS u,
       |           LAG(x) OVER (ORDER BY day) AS v
       |    FROM sp) WHERE u IS NOT NULL),
       |m AS (SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST(u AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS su,
       |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sv,
       |    CAST(SUM(CAST(w AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sw,
       |    ${pp("u", "u")} AS suu, ${pp("v", "v")} AS svv,
       |    ${pp("w", "w")} AS sww, ${pp("u", "v")} AS suv,
       |    ${pp("u", "w")} AS suw, ${pp("v", "w")} AS svw
       |  FROM lagd)
       |SELECT n,
       |  ROUND(($rssr - $rssu) / ($rssu / (CAST(n AS DOUBLE) - 3.0)), 6) AS f_stat,
       |  ROUND($c2, 6) AS x_coef,
       |  ROUND(($rssr - $rssu) / $rssr, 6) AS rss_gain
       |FROM m""".stripMargin
  }

  /** Weibull shape/scale fit of the order-value distribution by
    * median-rank regression — the parametric tail model next to
    * [[anHillTail]]'s nonparametric index: sort values, assign Bernard
    * median ranks F_i = (i−0.3)/(n+0.4), and OLS ln(−ln(1−F)) on ln v;
    * the slope IS the Weibull shape, exp(−intercept/slope) the scale.
    * Global ranks come from ONE [[graft.operators.PrefixSum]] scan (no
    * single-partition window over the corpus-sized frame); each
    * per-row ln term is a correctly-rounded double gathered
    * DECIMAL(38,18) (the an_fisher_exact ln-table contract — exact sum
    * of identical doubles in any order), so the OLS moments are
    * engine-portable. shape/scale/r² ROUND(·,6). */
  private[graft] def anWeibullFit(s: SparkSession, dir: String): DataFrame = {
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val o = Tables.orders(s, dir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100)
        .cast("bigint").as("v"), col("o_orderkey").cast("long").as("ok"))
    val scan = graft.operators.PrefixSum.withRunningTotals(
      o, Seq("v", "ok"), Seq("v"))
    val tot = scan.agg(max(col("rn")).as("n"))
    val xE = log(col("v").cast("double") / lit(100.0))
    val fE = (col("rn").cast("double") - lit(0.3)) /
      (col("n").cast("double") + lit(0.4))
    val yE = log(-log(lit(1.0) - fE))
    val m = scan.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"),
        sum(d18(xE)).as("sx"), sum(d18(yE)).as("sy"),
        sum(d18(xE * xE)).as("sxx"), sum(d18(xE * yE)).as("sxy"),
        sum(d18(yE * yE)).as("syy"))
    val nd = col("n").cast("double")
    val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
    val (sxx, sxy, syy) = (col("sxx").cast("double"),
      col("sxy").cast("double"), col("syy").cast("double"))
    val slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    val icept = (sy - slope * sx) / nd
    val r2 = ((nd * sxy - sx * sy) * (nd * sxy - sx * sy)) /
      ((nd * sxx - sx * sx) * (nd * syy - sy * sy))
    m.select(col("n"), round(slope, 6).as("shape"),
      round(exp(-(icept / slope)), 6).as("scale"),
      round(r2, 6).as("r2"))
  }

  private[graft] lazy val anWeibullFitSql = {
    val x = "ln(CAST(v AS DOUBLE) / 100.0)"
    val f = "(CAST(rn AS DOUBLE) - 0.3) / (CAST(n AS DOUBLE) + 0.4)"
    val y = s"ln(-ln(1.0 - $f))"
    def g(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(38,18))) AS DECIMAL(38,18))"
    val slope = """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   | / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"""
      .stripMargin.replace("\n", "")
    val icept = s"((CAST(sy AS DOUBLE) - $slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))"
    val r2 = """(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                |  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                | / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                |   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                |  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                |   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"""
      .stripMargin.replace("\n", "")
    s"""WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v,
       |    o_orderkey AS ok FROM orders),
       |rk AS (SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v, ok) AS BIGINT) AS rn
       |       FROM o),
       |nn AS (SELECT COUNT(*) AS n FROM o),
       |m AS (SELECT MAX(n) AS n,
       |    ${g(x)} AS sx, ${g(y)} AS sy,
       |    ${g(s"$x * $x")} AS sxx, ${g(s"$x * $y")} AS sxy,
       |    ${g(s"$y * $y")} AS syy
       |  FROM rk CROSS JOIN nn)
       |SELECT n, ROUND($slope, 6) AS shape,
       |  ROUND(exp(-($icept / $slope)), 6) AS scale,
       |  ROUND($r2, 6) AS r2
       |FROM m""".stripMargin
  }

  /** Weighted log-rank family — Gehan–Breslow (early-difference
    * weighted) and Tarone–Ware (√n_t) alongside the unweighted
    * statistic, all off [[anLogrank]]'s ONE PrefixSum risk-set scan:
    * the three weightings answer WHICH PART of the survival horizon
    * separates BUILDING from AUTOMOBILE (Gehan up-weights early
    * deaths where risk sets are full; log-rank weights late deaths
    * equally). Weights are normalized w = n_t/N (z is scale-invariant
    * in w, and the normalized form keeps every gathered term bounded
    * — no DECIMAL-width growth with SF); each z = Σw(d₁−e)/√(Σw²v)
    * with exact-integer-fed IEEE terms gathered DECIMAL(38,18),
    * ROUND(·,6). */
  private[graft] def anWeightedLogrank(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val anchor = o.agg(max(col("o_orderdate")).as("mx"))
    val seg = Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("c_custkey"), (col("c_mktsegment") === "BUILDING").cast("long").as("g"))
    val cust = o.groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("f"), max(col("o_orderdate")).as("l"))
      .join(seg, col("o_custkey") === col("c_custkey"))
      .crossJoin(broadcast(anchor))
      .select(datediff(col("l"), col("f")).cast("bigint").as("t"), col("g"),
        (col("l") < col("mx") - expr("INTERVAL 90 DAYS")).cast("long").as("ev"))
    val byT = cust.groupBy(col("t"))
      .agg(sum(col("g")).as("c1"), sum(lit(1L) - col("g")).as("c0"),
        sum(col("g") * col("ev")).as("d1"),
        sum((lit(1L) - col("g")) * col("ev")).as("d0"))
    val scan = graft.operators.PrefixSum.withRunningTotals(byT, Seq("t"),
      Seq("c1", "c0", "d1", "d0"))
    val tot = scan.agg(max(col("c1_cum")).as("n1t"), max(col("c0_cum")).as("n0t"))
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    val n1 = (col("n1t") - (col("c1_cum") - col("c1"))).cast("double")
    val n0 = (col("n0t") - (col("c0_cum") - col("c0"))).cast("double")
    val nt = n1 + n0
    val dt = (col("d1") + col("d0")).cast("double")
    val e = dt * n1 / nt
    val v = when(nt > 1.0,
      dt * (n1 / nt) * (n0 / nt) * (nt - dt) / (nt - 1.0)).otherwise(lit(0.0))
    val diff = col("d1").cast("double") - e
    val wg = nt / (col("n1t") + col("n0t")).cast("double")
    val wtw = sqrt(wg)
    val agg = scan.crossJoin(broadcast(tot))
      .filter(col("d1") + col("d0") > 0)
      .agg(max(col("n1t")).as("n1"), max(col("n0t")).as("n0"),
        gather(diff).as("num_lr"), gather(v).as("den_lr"),
        gather(wg * diff).as("num_g"), gather(wg * wg * v).as("den_g"),
        gather(wtw * diff).as("num_tw"), gather(wtw * wtw * v).as("den_tw"))
    def z(num: String, den: String) =
      round(when(col(den).cast("double") > 0,
        col(num).cast("double") / sqrt(col(den).cast("double")))
        .otherwise(lit(0.0)), 6)
    agg.select(col("n1"), col("n0"),
      z("num_lr", "den_lr").as("z_logrank"),
      z("num_g", "den_g").as("z_gehan"),
      z("num_tw", "den_tw").as("z_tarone_ware"))
  }

  private[graft] lazy val anWeightedLogrankSql = {
    def g(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(38,18))) AS DECIMAL(38,18))"
    val e = "CAST(d1 + d0 AS DOUBLE) * n1 / (n1 + n0)"
    val v = """CASE WHEN n1 + n0 > 1.0 THEN
              |      CAST(d1 + d0 AS DOUBLE) * (n1 / (n1 + n0)) * (n0 / (n1 + n0))
              |        * (n1 + n0 - CAST(d1 + d0 AS DOUBLE)) / (n1 + n0 - 1.0)
              |    ELSE 0.0 END""".stripMargin.replace("\n", "")
    val diff = s"(CAST(d1 AS DOUBLE) - $e)"
    val wg = "((n1 + n0) / CAST(n1t + n0t AS DOUBLE))"
    val wtw = s"sqrt($wg)"
    def z(num: String, den: String) =
      s"""ROUND(CASE WHEN CAST($den AS DOUBLE) > 0
         |  THEN CAST($num AS DOUBLE) / sqrt(CAST($den AS DOUBLE))
         |  ELSE 0.0 END, 6)""".stripMargin.replace("\n", "")
    s"""WITH a AS (SELECT MAX(o_orderdate) AS mx FROM orders),
       |seg AS (SELECT c_custkey,
       |          CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g
       |        FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
       |cust AS (SELECT date_diff('day', MIN(o_orderdate), MAX(o_orderdate)) AS t, seg.g,
       |           CASE WHEN MAX(o_orderdate) < MAX(a.mx) - INTERVAL 90 DAY
       |                THEN 1 ELSE 0 END AS ev
       |         FROM orders JOIN seg ON o_custkey = c_custkey CROSS JOIN a
       |         GROUP BY o_custkey, seg.g),
       |bt AS (SELECT t, CAST(SUM(g) AS BIGINT) AS c1, CAST(SUM(1 - g) AS BIGINT) AS c0,
       |              CAST(SUM(g * ev) AS BIGINT) AS d1,
       |              CAST(SUM((1 - g) * ev) AS BIGINT) AS d0
       |       FROM cust GROUP BY t),
       |sc AS (SELECT t, c1, c0, d1, d0,
       |         CAST(SUM(c1) OVER (ORDER BY t) AS BIGINT) AS c1_cum,
       |         CAST(SUM(c0) OVER (ORDER BY t) AS BIGINT) AS c0_cum
       |       FROM bt),
       |tt AS (SELECT MAX(c1_cum) AS n1t, MAX(c0_cum) AS n0t FROM sc),
       |terms AS (SELECT d1, d0, n1t, n0t,
       |    CAST(n1t - (c1_cum - c1) AS DOUBLE) AS n1,
       |    CAST(n0t - (c0_cum - c0) AS DOUBLE) AS n0
       |  FROM sc CROSS JOIN tt WHERE d1 + d0 > 0),
       |ag AS (SELECT MAX(n1t) AS n1, MAX(n0t) AS n0,
       |    ${g(diff)} AS num_lr, ${g(v)} AS den_lr,
       |    ${g(s"$wg * $diff")} AS num_g, ${g(s"$wg * $wg * ($v)")} AS den_g,
       |    ${g(s"$wtw * $diff")} AS num_tw, ${g(s"$wtw * $wtw * ($v)")} AS den_tw
       |  FROM terms)
       |SELECT n1, n0,
       |  ${z("num_lr", "den_lr")} AS z_logrank,
       |  ${z("num_g", "den_g")} AS z_gehan,
       |  ${z("num_tw", "den_tw")} AS z_tarone_ware
       |FROM ag""".stripMargin
  }

  /** Youden's J optimal cutoff on the churn-vs-balance ROC — the
    * operating-POINT companion to [[anRocAuc]]'s whole-curve area
    * (AUC says the score ranks; J says where to CUT it): classifier
    * "churn when balance ≤ t", J(t) = TPR − FPR maximized as the exact
    * BIGINT M(t) = n₀·cum₁(t) − n₁·(cum(t) − cum₁(t)) so the argmax is
    * decided on integers, never on float ties; cutoff = the smallest
    * maximizing cent value. Same labeled frame and ONE
    * [[graft.operators.PrefixSum]] scan as the AUC (no corpus-sized
    * single-partition window); J/TPR/FPR ROUND(·,6). */
  /** Shared churn-labeled balance scan + Youden-J integer-argmax cutoff
    * row for [[anYouden]]/[[anMcc]]: churn label (no order in 90 days)
    * per customer, per-cent-value counts through one
    * [[graft.operators.PrefixSum]] scan, m = (n−n₁)·c1_cum −
    * n₁·(cnt_cum−c1_cum) maximized in exact integers, smallest-v
    * tie-break. Emits ONE row (v, n, n1, cnt_cum, c1_cum, mmax) both
    * keys derive from, so "MCC at anYouden's cutoff" is structural,
    * not copy-discipline (r17 advice #2). */
  private def youdenCutoffPick(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val anchor = o.agg(max(col("o_orderdate")).as("mx"))
    val last = o.groupBy(col("o_custkey")).agg(max(col("o_orderdate")).as("last_order"))
    val cutoff = col("mx") - expr("INTERVAL 90 DAYS")
    val labeled = Tables.customer(s, dir)
      .join(last, col("c_custkey") === col("o_custkey"), "left")
      .crossJoin(broadcast(anchor))
      .select(
        (col("last_order").isNull || col("last_order") < cutoff).cast("long").as("g1"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val perV = labeled.groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"), sum(col("g1")).as("c1"))
    val scan = graft.operators.PrefixSum.withRunningTotals(
      perV, Seq("v"), Seq("cnt", "c1"))
    val tot = scan.agg(max(col("cnt_cum")).as("n"), max(col("c1_cum")).as("n1"))
    val withM = scan.crossJoin(broadcast(tot))
      .select(col("v"), col("n"), col("n1"), col("cnt_cum"), col("c1_cum"),
        ((col("n") - col("n1")) * col("c1_cum") -
          col("n1") * (col("cnt_cum") - col("c1_cum"))).as("m"))
    val best = withM.agg(max(col("m")).as("mmax"))
    withM.crossJoin(broadcast(best))
      .filter(col("m") === col("mmax"))
      .orderBy(col("v")).limit(1)
      .select(col("v"), col("n"), col("n1"), col("cnt_cum"), col("c1_cum"), col("mmax"))
  }

  /** Shared CTE prefix ending in `pick` (one row: v, n, n1, cnt_cum,
    * c1_cum, mmax) — the SQL twin of [[youdenCutoffPick]]. */
  private val youdenCutoffPickSql =
    """a AS (SELECT MAX(o_orderdate) AS mx FROM orders),
      |l AS (SELECT o_custkey, MAX(o_orderdate) AS last_order FROM orders GROUP BY 1),
      |lab AS (SELECT
      |    CASE WHEN last_order IS NULL OR last_order < mx - INTERVAL 90 DAY
      |         THEN 1 ELSE 0 END AS g1,
      |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM customer LEFT JOIN l ON c_custkey = o_custkey CROSS JOIN a),
      |pv AS (SELECT v, COUNT(*) AS cnt, CAST(SUM(g1) AS BIGINT) AS c1 FROM lab GROUP BY v),
      |cv AS (SELECT v, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum,
      |         CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS c1_cum
      |       FROM pv),
      |tt AS (SELECT MAX(cnt_cum) AS n, MAX(c1_cum) AS n1 FROM cv),
      |m AS (SELECT v, n, n1, cnt_cum, c1_cum,
      |        (n - n1) * c1_cum - n1 * (cnt_cum - c1_cum) AS m
      |      FROM cv CROSS JOIN tt),
      |best AS (SELECT MAX(m) AS mmax FROM m),
      |pick AS (SELECT v, n, n1, cnt_cum, c1_cum, mmax
      |         FROM m CROSS JOIN best WHERE m = mmax
      |         ORDER BY v LIMIT 1)""".stripMargin

  private[graft] def anYouden(s: SparkSession, dir: String): DataFrame =
    youdenCutoffPick(s, dir)
      .select(col("n1"), (col("n") - col("n1")).as("n0"), col("v").as("cutoff_c"),
        round(col("mmax").cast("double") /
          (col("n1").cast("double") * (col("n") - col("n1")).cast("double")), 6)
          .as("j_stat"),
        round(col("c1_cum").cast("double") / col("n1").cast("double"), 6).as("tpr"),
        round((col("cnt_cum") - col("c1_cum")).cast("double") /
          (col("n") - col("n1")).cast("double"), 6).as("fpr"))

  private[graft] lazy val anYoudenSql =
    s"""WITH $youdenCutoffPickSql
      |SELECT n1, n - n1 AS n0, v AS cutoff_c,
      |  ROUND(CAST(mmax AS DOUBLE)
      |    / (CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)), 6) AS j_stat,
      |  ROUND(CAST(c1_cum AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS tpr,
      |  ROUND(CAST(cnt_cum - c1_cum AS DOUBLE) / CAST(n - n1 AS DOUBLE), 6) AS fpr
      |FROM pick""".stripMargin

  /** Lilliefors normality test on customer balances — the
    * ESTIMATED-PARAMETER KS this family was missing ([[anJarqueBera]]
    * screens moments; this measures the maximum CDF distance against
    * N(μ̂, σ̂²), the hypothesis a "balances look normal" claim actually
    * makes). μ̂/σ̂ from exact decimal sums; per distinct cent value the
    * two-sided EDF gap uses cum/n (upper) and (cum−cnt)/n (lower) off
    * ONE [[graft.operators.PrefixSum]] scan; Φ via the Zelen–Severo
    * 26.2.17 rational tail (pure arithmetic + one exp, the SAME
    * shortest-round-trip constants in both engines — no erf
    * dependency). D and √n·D ROUND(·,6). */
  private[graft] def anLilliefors(s: SparkSession, dir: String): DataFrame = {
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
        greatest(col("cnt_cum").cast("double") / nd - cdf,
          cdf - (col("cnt_cum") - col("cnt")).cast("double") / nd).as("gap"))
      .groupBy(col("n")).agg(max(col("gap")).as("d"))
      .select(col("n"), round(col("d"), 6).as("d_stat"),
        round(sqrt(col("n").cast("double")) * col("d"), 6).as("sqrt_n_d"))
  }

  private[graft] lazy val anLillieforsSql = {
    val mu = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
    val sd = """sqrt(CAST(CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1 AS DOUBLE)
               | / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))"""
      .stripMargin.replace("\n", "")
    val z = s"((CAST(v AS DOUBLE) - $mu) / $sd)"
    val az = s"ABS($z)"
    val t = s"(1.0 / (1.0 + 0.2316419 * $az))"
    val poly = s"($t * (0.319381530 + $t * (-0.356563782 + $t * (1.781477937 + $t * (-1.821255978 + $t * 1.330274429)))))"
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
       |gaps AS (SELECT n,
       |    GREATEST(CAST(cnt_cum AS DOUBLE) / CAST(n AS DOUBLE) - $cdf,
       |      $cdf - CAST(cnt_cum - cnt AS DOUBLE) / CAST(n AS DOUBLE)) AS gap
       |  FROM sc CROSS JOIN tot)
       |SELECT n, ROUND(MAX(gap), 6) AS d_stat,
       |  ROUND(sqrt(CAST(n AS DOUBLE)) * MAX(gap), 6) AS sqrt_n_d
       |FROM gaps GROUP BY n""".stripMargin
  }

  /** Fleiss' kappa across the four Gopher quality rules treated as m=4
    * binary raters per document — the MULTI-rater agreement number
    * [[anCohenKappa]] (two raters) can't produce, and the honest answer
    * to "do these curation rules even measure one construct": per doc
    * n₁ = #failing rules, P̄ = Σ[n₁(n₁−1) + (m−n₁)(m−n₁−1)]/(n·m(m−1))
    * entirely from the exact integers Σn₁ and Σn₁², P_e = p₀² + p₁²,
    * κ = (P̄ − P_e)/(1 − P_e) one IEEE tree ROUND(·,6). Moments come
    * from the shared [[gopherRaterMoments]] tree (also feeding
    * [[anGwetAc1]]), so the two keys can never drift apart. */
  private[graft] def anFleissKappa(s: SparkSession, dir: String): DataFrame = {
    val agg = gopherRaterMoments(s, dir)
    val nd = col("n").cast("double")
    val pbar = (lit(2L) * col("s2") - lit(8L) * col("s1") + lit(12L) * col("n"))
      .cast("double") / (lit(12.0) * nd)
    val p1 = col("s1").cast("double") / (lit(4.0) * nd)
    val pe = p1 * p1 + (lit(1.0) - p1) * (lit(1.0) - p1)
    agg.select(col("n").as("n_docs"), col("s1").as("n_fail_total"),
      round(p1, 6).as("p_fail"), round(pbar, 6).as("p_bar"),
      round((pbar - pe) / (lit(1.0) - pe), 6).as("kappa"))
  }

  private[graft] lazy val anFleissKappaSql = {
    val p1 = "(CAST(s1 AS DOUBLE) / (4.0 * CAST(n AS DOUBLE)))"
    val pbar = "(CAST(2 * s2 - 8 * s1 + 12 * n AS DOUBLE) / (12.0 * CAST(n AS DOUBLE)))"
    val pe = s"($p1 * $p1 + (1.0 - $p1) * (1.0 - $p1))"
    s"""WITH $gopherRaterMomentsSql
       |SELECT n AS n_docs, s1 AS n_fail_total,
       |  ROUND($p1, 6) AS p_fail, ROUND($pbar, 6) AS p_bar,
       |  ROUND(($pbar - $pe) / (1.0 - $pe), 6) AS kappa
       |FROM ag""".stripMargin
  }

  /** Gamma(k, θ) fit of the order-value distribution by method of
    * moments — the LIGHT-tailed member of the parametric trio beside
    * [[anWeibullFit]] (regression fit) and [[anLognormalFit]]
    * (log-moment fit); disagreement across the three IS the
    * model-selection signal. k = m²/v is scale-free off the exact
    * decimal moments (cents cancel), θ re-emits in dollars; one corpus
    * pass, one IEEE tree, ROUND(·,6). */
  private[graft] def anGammaFit(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val m = Tables.orders(s, dir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
      .agg(count(lit(1)).as("n"), sum(d38(col("v"))).as("s1"),
        sum((d38(col("v")) * d38(col("v"))).cast("decimal(38,0)")).as("s2"))
    val nd = col("n").cast("double")
    val mean = col("s1").cast("double") / nd
    val vr = (d38(col("n")) * col("s2") - col("s1") * col("s1")).cast("double") /
      (nd * (nd - lit(1.0)))
    m.select(col("n"), round((mean * mean) / vr, 6).as("shape"),
      round((vr / mean) / lit(100.0), 6).as("scale"),
      round(mean / lit(100.0), 6).as("mean"),
      round(sqrt(vr) / mean, 6).as("cv"))
  }

  private[graft] lazy val anGammaFitSql = {
    val mean = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
    val vr = """(CAST(CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1 AS DOUBLE)
               | / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))"""
      .stripMargin.replace("\n", "")
    s"""WITH m AS (SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
       |    CAST(SUM(CAST(CAST(CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS DECIMAL(38,0)) * CAST(CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
       |  FROM orders)
       |SELECT n, ROUND(($mean * $mean) / $vr, 6) AS shape,
       |  ROUND(($vr / $mean) / 100.0, 6) AS scale,
       |  ROUND($mean / 100.0, 6) AS mean,
       |  ROUND(sqrt($vr) / $mean, 6) AS cv
       |FROM m""".stripMargin
  }

  /** Lognormal(μ, σ) fit of the order-value distribution by log-space
    * moments — the multiplicative-process member of the parametric
    * trio: μ̂/σ̂ are the exact-gather moments of ln v (each ln term a
    * correctly-rounded double summed DECIMAL(38,18), the
    * an_weibull_fit contract), median = e^μ and mean = e^{μ+σ²/2}
    * re-emit in dollars, all ROUND(·,6). */
  private[graft] def anLognormalFit(s: SparkSession, dir: String): DataFrame = {
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val xE = log(col("v").cast("double") / lit(100.0))
    val m = Tables.orders(s, dir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
      .agg(count(lit(1)).as("n"), sum(d18(xE)).as("sx"),
        sum(d18(xE * xE)).as("sxx"))
    val nd = col("n").cast("double")
    val mu = col("sx").cast("double") / nd
    val sig2 = (nd * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")) / (nd * (nd - lit(1.0)))
    m.select(col("n"), round(mu, 6).as("mu"),
      round(sqrt(sig2), 6).as("sigma"),
      round(exp(mu), 6).as("median"),
      round(exp(mu + sig2 / lit(2.0)), 6).as("mean"))
  }

  private[graft] lazy val anLognormalFitSql = {
    val x = "ln(CAST(v AS DOUBLE) / 100.0)"
    val mu = "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    val sig2 = """((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  | / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))"""
      .stripMargin.replace("\n", "")
    s"""WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
       |  FROM orders),
       |m AS (SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST($x AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sx,
       |    CAST(SUM(CAST($x * $x AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sxx
       |  FROM o)
       |SELECT n, ROUND($mu, 6) AS mu,
       |  ROUND(sqrt($sig2), 6) AS sigma,
       |  ROUND(exp($mu), 6) AS median,
       |  ROUND(exp($mu + $sig2 / 2.0), 6) AS mean
       |FROM m""".stripMargin
  }

  /** Skellam/conditional-binomial rate-equality test: are purchases and
    * clicks generated at the same Poisson rate? Conditional on the
    * total N = X₁ + X₂, X₁ ~ Bin(N, ½) under H₀ — so the test needs NO
    * rate estimate: z = (X₁ − N/2)/√(N/4) from two exact BIGINT counts,
    * p two-sided via the same Zelen–Severo Φ tail as [[anLilliefors]].
    * One events pass; z and p ROUND(·,6). */
  private[graft] def anSkellam(s: SparkSession, dir: String): DataFrame = {
    val m = Tables.events(s, dir)
      .filter(col("event_type").isin("purchase", "click"))
      .agg(sum((col("event_type") === "purchase").cast("long")).as("x1"),
        sum((col("event_type") === "click").cast("long")).as("x2"))
    val nd = (col("x1") + col("x2")).cast("double")
    val z = (col("x1").cast("double") - nd / lit(2.0)) / sqrt(nd / lit(4.0))
    val az = abs(z)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) + t *
      (lit(1.781477937) + t * (lit(-1.821255978) + t * lit(1.330274429)))))
    val tail = lit(0.3989422804014327) * exp(lit(-0.5) * az * az) * poly
    m.select(col("x1").as("n_purchase"), col("x2").as("n_click"),
      round(z, 6).as("z_rate"), round(lit(2.0) * tail, 6).as("p_value"))
  }

  private[graft] lazy val anSkellamSql = {
    val nd = "CAST(x1 + x2 AS DOUBLE)"
    val z = s"((CAST(x1 AS DOUBLE) - $nd / 2.0) / sqrt($nd / 4.0))"
    val az = s"ABS($z)"
    val t = s"(1.0 / (1.0 + 0.2316419 * $az))"
    val poly = s"($t * (0.319381530 + $t * (-0.356563782 + $t * (1.781477937 + $t * (-1.821255978 + $t * 1.330274429)))))"
    val tail = s"(0.3989422804014327 * EXP(-0.5 * $az * $az) * $poly)"
    s"""WITH m AS (SELECT
       |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x1,
       |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS x2
       |  FROM events WHERE event_type IN ('purchase', 'click'))
       |SELECT x1 AS n_purchase, x2 AS n_click,
       |  ROUND($z, 6) AS z_rate, ROUND(2.0 * $tail, 6) AS p_value
       |FROM m""".stripMargin
  }

  /** Bowker symmetry test over the language-ID confusion matrix — the
    * k×k generalization of [[anMcnemar]], asked of [[textLangidEval]]'s
    * matrix: are misclassifications SYMMETRIC (de→en as often as
    * en→de), or does the classifier drift directionally? Off-diagonal
    * cells pair by unordered key (least, greatest); χ²_B =
    * Σ(n_ij − n_ji)²/(n_ij + n_ji) from exact BIGINT cells (the signed
    * difference is one CASE sum), df = #non-empty pairs; χ² gathered
    * DECIMAL(38,18), ROUND(·,6). */
  private[graft] def anBowker(s: SparkSession, dir: String): DataFrame = {
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val cells = Tables.documents(s, dir)
      .select(col("lang"), graft.text.TextFunctions.langId(col("text")).as("pred"))
      .filter(col("lang") =!= col("pred"))
      .groupBy(col("lang"), col("pred")).agg(count(lit(1)).as("n"))
    val pairs = cells
      .select(least(col("lang"), col("pred")).as("a"),
        greatest(col("lang"), col("pred")).as("b"),
        when(col("lang") < col("pred"), col("n")).otherwise(-col("n")).as("sn"),
        col("n"))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("sn")).as("d"), sum(col("n")).as("s"))
    pairs.agg(count(lit(1)).as("df"),
        sum(d18((col("d") * col("d")).cast("double") / col("s").cast("double")))
          .cast("decimal(38,18)").as("chi2"))
      .select(col("df"), round(col("chi2").cast("double"), 6).as("chi2_bowker"))
  }

  private[graft] lazy val anBowkerSql = {
    def cnt(ws: Seq[String]) =
      s"len(list_filter(string_split(text, ' '), x -> x IN (${ws.map(w => s"'$w'").mkString(",")})))"
    val de = cnt(graft.text.TextFunctions.Stopwords("de"))
    val en = cnt(graft.text.TextFunctions.Stopwords("en"))
    val es = cnt(graft.text.TextFunctions.Stopwords("es"))
    val fr = cnt(graft.text.TextFunctions.Stopwords("fr"))
    s"""WITH p AS (SELECT lang,
       |  CASE WHEN GREATEST($de, $en, $es, $fr) = 0 THEN 'und'
       |       WHEN $de = GREATEST($de, $en, $es, $fr) THEN 'de'
       |       WHEN $en = GREATEST($de, $en, $es, $fr) THEN 'en'
       |       WHEN $es = GREATEST($de, $en, $es, $fr) THEN 'es'
       |       WHEN $fr = GREATEST($de, $en, $es, $fr) THEN 'fr'
       |       ELSE 'und' END AS pred
       |FROM documents),
       |cells AS (SELECT lang, pred, COUNT(*) AS n FROM p
       |          WHERE lang <> pred GROUP BY 1, 2),
       |pairs AS (SELECT LEAST(lang, pred) AS a, GREATEST(lang, pred) AS b,
       |    CAST(SUM(CASE WHEN lang < pred THEN n ELSE -n END) AS BIGINT) AS d,
       |    CAST(SUM(n) AS BIGINT) AS s
       |  FROM cells GROUP BY 1, 2)
       |SELECT COUNT(*) AS df,
       |  ROUND(CAST(CAST(SUM(CAST(CAST(d * d AS DOUBLE) / CAST(s AS DOUBLE)
       |    AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE), 6) AS chi2_bowker
       |FROM pairs""".stripMargin
  }

  /** Matthews correlation coefficient of the churn classifier AT
    * [[anYouden]]'s optimal cutoff — the prevalence-robust single
    * number for the operating point J selected (J ignores class
    * balance; MCC punishes a cutoff that games the minority class).
    * Derived from the SAME [[youdenCutoffPick]] frame anYouden emits
    * from; the 2×2 (tp, fp, fn, tn) are exact BIGINTs, the MCC
    * numerator an exact integer product, the denominator √ of a
    * 4-factor double product, ROUND(·,6). */
  private[graft] def anMcc(s: SparkSession, dir: String): DataFrame = {
    val pick = youdenCutoffPick(s, dir)
      .select(col("v").as("cutoff_c"),
        col("c1_cum").as("tp"), (col("cnt_cum") - col("c1_cum")).as("fp"),
        (col("n1") - col("c1_cum")).as("fn"),
        (col("n") - col("n1") - (col("cnt_cum") - col("c1_cum"))).as("tn"))
    val num = (col("tp") * col("tn") - col("fp") * col("fn")).cast("double")
    val den = sqrt((col("tp") + col("fp")).cast("double") *
      (col("tp") + col("fn")).cast("double") *
      (col("tn") + col("fp")).cast("double") *
      (col("tn") + col("fn")).cast("double"))
    pick.select(col("cutoff_c"), col("tp"), col("fp"), col("fn"), col("tn"),
      round(num / den, 6).as("mcc"))
  }

  private[graft] lazy val anMccSql =
    s"""WITH $youdenCutoffPickSql,
      |cm AS (SELECT v AS cutoff_c, c1_cum AS tp, cnt_cum - c1_cum AS fp,
      |           n1 - c1_cum AS fn, n - n1 - (cnt_cum - c1_cum) AS tn
      |       FROM pick)
      |SELECT cutoff_c, tp, fp, fn, tn,
      |  ROUND(CAST(tp * tn - fp * fn AS DOUBLE)
      |    / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
      |         * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 6) AS mcc
      |FROM cm""".stripMargin

  /** Dunnett-style many-to-one comparisons: each order priority's mean
    * value against the 1-URGENT control — the question [[anAnova]]'s
    * omnibus F and [[anTukeyHsd]]'s all-pairs sweep both overshoot when
    * the design HAS a control (k−1 focused contrasts, not k(k−1)/2):
    * per-group exact decimal moments in one pass, pooled s² from
    * gathered within-group sums — at DECIMAL(38,6), NOT (38,18): order
    * cents² reaches ~5e20 per group at sf1, past (38,18)'s 1e20
    * integer budget, and at that magnitude the double's own ulp is
    * ~100 so 6 decimals is already beyond exact (1e32 headroom holds
    * the sf100 decade) — each
    * t_i = (m_i − m_c)/√(s²(1/n_i + 1/n_c)) one shared IEEE tree;
    * mean_diff in dollars and t ROUND(·,6). (Critical values are
    * Dunnett-table lookups — the statistics emit, the table stays with
    * the analyst.) */
  private[graft] def anDunnett(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val g = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("grp"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_g"), sum(d38(col("v"))).as("s1"),
        sum((d38(col("v")) * d38(col("v"))).cast("decimal(38,0)")).as("s2"))
    val wss = (col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / col("n_g").cast("double"))
    val pool = g.agg(count(lit(1)).as("k"), sum(col("n_g")).as("nn"),
      sum(wss.cast("decimal(38,6)")).as("wss_sum"))
    val ctl = g.filter(col("grp") === "1-URGENT")
      .select(col("n_g").as("n_c"), col("s1").as("s1_c"))
    val s2p = col("wss_sum").cast("double") / (col("nn") - col("k")).cast("double")
    val mi = col("s1").cast("double") / col("n_g").cast("double")
    val mc = col("s1_c").cast("double") / col("n_c").cast("double")
    g.filter(col("grp") =!= "1-URGENT")
      .crossJoin(broadcast(pool)).crossJoin(broadcast(ctl))
      .select(col("grp"), col("n_g"),
        round((mi - mc) / lit(100.0), 6).as("mean_diff"),
        round((mi - mc) / sqrt(s2p * (lit(1.0) / col("n_g").cast("double") +
          lit(1.0) / col("n_c").cast("double"))), 6).as("t_stat"))
      .orderBy(col("grp"))
  }

  private[graft] lazy val anDunnettSql = {
    val mi = "(CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE))"
    val mc = "(CAST(s1_c AS DOUBLE) / CAST(n_c AS DOUBLE))"
    val s2p = "(CAST(wss_sum AS DOUBLE) / CAST(nn - k AS DOUBLE))"
    s"""WITH b AS (SELECT o_orderpriority AS grp,
       |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
       |  FROM orders),
       |g AS (SELECT grp, COUNT(*) AS n_g,
       |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
       |    CAST(SUM(CAST(CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
       |  FROM b GROUP BY grp),
       |pool AS (SELECT COUNT(*) AS k, CAST(SUM(n_g) AS BIGINT) AS nn,
       |    CAST(SUM(CAST(CAST(s2 AS DOUBLE)
       |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE)
       |      AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS wss_sum
       |  FROM g),
       |ctl AS (SELECT n_g AS n_c, s1 AS s1_c FROM g WHERE grp = '1-URGENT')
       |SELECT grp, n_g,
       |  ROUND(($mi - $mc) / 100.0, 6) AS mean_diff,
       |  ROUND(($mi - $mc) / sqrt($s2p * (1.0 / CAST(n_g AS DOUBLE)
       |    + 1.0 / CAST(n_c AS DOUBLE))), 6) AS t_stat
       |FROM g CROSS JOIN pool CROSS JOIN ctl
       |WHERE grp <> '1-URGENT' ORDER BY grp""".stripMargin
  }

  /** Cochrane–Orcutt AR(1)-corrected trend slope for daily revenue —
    * the FIX for what [[anDurbinWatson]] diagnoses: positively
    * autocorrelated residuals make the OLS trend's significance lie,
    * and the CO transform (y_t − ρy_{t−1} on x_t − ρx_{t−1}) re-fits
    * the slope on quasi-differenced data. Stage 1 OLS comes off exact
    * DECIMAL(38,0) moments; residuals are NORMALIZED by √C_yy before
    * any gather (u_t bounded ≤ 1 — no DECIMAL-width growth with SF,
    * the an_weighted_logrank normalization trick), ρ = Σu·u₋₁/Σu₋₁²
    * and the transformed moments gather DECIMAL(38,18); the slope
    * de-normalizes once at emission. ρ and both slopes ($/day)
    * ROUND(·,6). */
  private[graft] def anCochraneOrcutt(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("x"), col("rev_c").as("y"))
    def pr(a: Column, b: Column) = sum((d38(a) * d38(b)).cast("decimal(38,0)"))
    val m = sp.agg(count(lit(1)).as("n"), sum(d38(col("x"))).as("sx"),
      sum(d38(col("y"))).as("sy"), pr(col("x"), col("x")).as("sxx"),
      pr(col("x"), col("y")).as("sxy"), pr(col("y"), col("y")).as("syy"))
    val nd = col("n").cast("double")
    val cxx = (d38(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double")
    val cxy = (d38(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double")
    val cyy = (d38(col("n")) * col("syy") - col("sy") * col("sy")).cast("double")
    val fit = m.select(col("n"), (cxy / cxx).as("b"),
      ((col("sy").cast("double") - (cxy / cxx) * col("sx").cast("double")) / nd).as("a"),
      sqrt(cyy).as("nrm"))
    val wd = Window.orderBy("x")
    val u = sp.crossJoin(broadcast(fit))
      .select(col("x"), col("n"), col("b"),
        ((col("y").cast("double") - col("a") - col("b") * col("x").cast("double"))
          / col("nrm")).as("u"))
      .withColumn("ul", lag(col("u"), 1).over(wd))
      .withColumn("xl", lag(col("x"), 1).over(wd))
    val rhoF = u.filter(col("ul").isNotNull)
      .agg((sum(d18(col("u") * col("ul"))).cast("double") /
        sum(d18(col("ul") * col("ul"))).cast("double")).as("rho"))
    val t = u.filter(col("ul").isNotNull).crossJoin(broadcast(rhoF))
      .select(col("n"), col("b"), col("rho"),
        (col("x").cast("double") - col("rho") * col("xl").cast("double")).as("xs"),
        (col("u") - col("rho") * col("ul")).as("ys"))
    val mt = t.agg(max(col("n")).as("n"), max(col("b")).as("b"),
      max(col("rho")).as("rho"), count(lit(1)).as("n2"),
      sum(d18(col("xs"))).as("sxs"), sum(d18(col("ys"))).as("sys"),
      sum(d18(col("xs") * col("xs"))).as("sxxs"),
      sum(d18(col("xs") * col("ys"))).as("sxys"))
    val n2d = col("n2").cast("double")
    val slopeN = (n2d * col("sxys").cast("double") -
      col("sxs").cast("double") * col("sys").cast("double")) /
      (n2d * col("sxxs").cast("double") -
        col("sxs").cast("double") * col("sxs").cast("double"))
    // the CO slope regresses NORMALIZED y* on raw x*, so de-normalize
    mt.crossJoin(broadcast(m.select(
        sqrt((d38(col("n")) * col("syy") - col("sy") * col("sy")).cast("double"))
          .as("nrm2"))))
      .select(col("n"), col("n2"), round(col("rho"), 6).as("rho"),
        round(col("b") / lit(100.0), 6).as("slope_ols"),
        round(slopeN * col("nrm2") / lit(100.0), 6).as("slope_co"))
  }

  private[graft] lazy val anCochraneOrcuttSql = {
    def pr(a: String, b: String) =
      s"CAST(SUM(CAST(CAST($a AS DECIMAL(38,0)) * CAST($b AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0))"
    val cxx = "CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)"
    val cxy = "CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)"
    val cyy = "CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)"
    val slopeN = """((CAST(n2 AS DOUBLE) * CAST(sxys AS DOUBLE)
                    |  - CAST(sxs AS DOUBLE) * CAST(sys AS DOUBLE))
                    | / (CAST(n2 AS DOUBLE) * CAST(sxxs AS DOUBLE)
                    |  - CAST(sxs AS DOUBLE) * CAST(sxs AS DOUBLE)))"""
      .stripMargin.replace("\n", "")
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS x, rev_c AS y FROM daily),
       |m AS (SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
       |    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
       |    ${pr("x", "x")} AS sxx, ${pr("x", "y")} AS sxy, ${pr("y", "y")} AS syy
       |  FROM sp),
       |fit AS (SELECT n, ($cxy / $cxx) AS b,
       |    ((CAST(sy AS DOUBLE) - ($cxy / $cxx) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) AS a,
       |    sqrt($cyy) AS nrm
       |  FROM m),
       |u AS (SELECT x, n, b,
       |    ((CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE)) / nrm) AS u,
       |    LAG((CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE)) / nrm)
       |      OVER (ORDER BY x) AS ul,
       |    LAG(x) OVER (ORDER BY x) AS xl
       |  FROM sp CROSS JOIN fit),
       |rho AS (SELECT CAST(CAST(SUM(CAST(u * ul AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE)
       |      / CAST(CAST(SUM(CAST(ul * ul AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE) AS rho
       |    FROM u WHERE ul IS NOT NULL),
       |t AS (SELECT n, b, rho.rho AS rho,
       |    (CAST(x AS DOUBLE) - rho.rho * CAST(xl AS DOUBLE)) AS xs,
       |    (u - rho.rho * ul) AS ys
       |  FROM u CROSS JOIN rho WHERE ul IS NOT NULL),
       |mt AS (SELECT MAX(n) AS n, MAX(b) AS b, MAX(rho) AS rho, COUNT(*) AS n2,
       |    CAST(SUM(CAST(xs AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sxs,
       |    CAST(SUM(CAST(ys AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sys,
       |    CAST(SUM(CAST(xs * xs AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sxxs,
       |    CAST(SUM(CAST(xs * ys AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sxys
       |  FROM t),
       |nr AS (SELECT sqrt($cyy) AS nrm2 FROM m)
       |SELECT n, n2, ROUND(rho, 6) AS rho,
       |  ROUND(b / 100.0, 6) AS slope_ols,
       |  ROUND($slopeN * nrm2 / 100.0, 6) AS slope_co
       |FROM mt CROSS JOIN nr""".stripMargin
  }

  /** Hotelling T² two-sample test on the BIVARIATE customer profile
    * (balance, order count), BUILDING vs AUTOMOBILE — the joint test
    * the univariate family cannot compose ([[anWelchTtest]] per
    * coordinate ignores the covariance; two marginally-insignificant
    * shifts along the correlation axis ARE jointly significant). Per
    * group one pass to the exact DECIMAL(38,0) SSCP sums; pooled 2×2
    * covariance, closed-form inverse, T² = (n₁n₀/n)·d′S⁻¹d and its
    * exact F transform one shared IEEE tree; T²/F ROUND(·,6). */
  private[graft] def anHotellingT2(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val oc = Tables.orders(s, dir).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("noi"))
    val base = Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .join(oc, col("c_custkey") === col("o_custkey"), "left")
      .select((col("c_mktsegment") === "BUILDING").cast("long").as("g"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("b"),
        coalesce(col("noi"), lit(0L)).as("o"))
    val gm = base.groupBy(col("g")).agg(count(lit(1)).as("n_g"),
      sum(d38(col("b"))).as("s1"), sum(d38(col("o"))).as("s2"),
      sum((d38(col("b")) * d38(col("b"))).cast("decimal(38,0)")).as("s11"),
      sum((d38(col("o")) * d38(col("o"))).cast("decimal(38,0)")).as("s22"),
      sum((d38(col("b")) * d38(col("o"))).cast("decimal(38,0)")).as("s12"))
    def pick(c: String, g: Int) = max(when(col("g") === g, col(c)))
    val w = gm.agg(
      pick("n_g", 1).as("n1"), pick("n_g", 0).as("n0"),
      pick("s1", 1).as("s1a"), pick("s1", 0).as("s1b"),
      pick("s2", 1).as("s2a"), pick("s2", 0).as("s2b"),
      pick("s11", 1).as("s11a"), pick("s11", 0).as("s11b"),
      pick("s22", 1).as("s22a"), pick("s22", 0).as("s22b"),
      pick("s12", 1).as("s12a"), pick("s12", 0).as("s12b"))
    def cm(sab: Column, sa: Column, sb: Column, n: Column) =
      sab.cast("double") - sa.cast("double") * sb.cast("double") / n.cast("double")
    val (n1d, n0d) = (col("n1").cast("double"), col("n0").cast("double"))
    val nm2 = n1d + n0d - lit(2.0)
    val s11p = (cm(col("s11a"), col("s1a"), col("s1a"), col("n1")) +
      cm(col("s11b"), col("s1b"), col("s1b"), col("n0"))) / nm2
    val s22p = (cm(col("s22a"), col("s2a"), col("s2a"), col("n1")) +
      cm(col("s22b"), col("s2b"), col("s2b"), col("n0"))) / nm2
    val s12p = (cm(col("s12a"), col("s1a"), col("s2a"), col("n1")) +
      cm(col("s12b"), col("s1b"), col("s2b"), col("n0"))) / nm2
    val d1 = col("s1a").cast("double") / n1d - col("s1b").cast("double") / n0d
    val d2 = col("s2a").cast("double") / n1d - col("s2b").cast("double") / n0d
    val det = s11p * s22p - s12p * s12p
    val t2 = (n1d * n0d / (n1d + n0d)) *
      (d1 * d1 * s22p - lit(2.0) * d1 * d2 * s12p + d2 * d2 * s11p) / det
    w.select(col("n1"), col("n0"), round(t2, 6).as("t2_stat"),
      round(t2 * (n1d + n0d - lit(3.0)) / (lit(2.0) * nm2), 6).as("f_stat"))
  }

  private[graft] lazy val anHotellingT2Sql = {
    def cm(sab: String, sa: String, sb: String, n: String) =
      s"(CAST($sab AS DOUBLE) - CAST($sa AS DOUBLE) * CAST($sb AS DOUBLE) / CAST($n AS DOUBLE))"
    val nm2 = "(CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE) - 2.0)"
    val s11p = s"((${cm("s11a", "s1a", "s1a", "n1")} + ${cm("s11b", "s1b", "s1b", "n0")}) / $nm2)"
    val s22p = s"((${cm("s22a", "s2a", "s2a", "n1")} + ${cm("s22b", "s2b", "s2b", "n0")}) / $nm2)"
    val s12p = s"((${cm("s12a", "s1a", "s2a", "n1")} + ${cm("s12b", "s1b", "s2b", "n0")}) / $nm2)"
    val d1 = "(CAST(s1a AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(s1b AS DOUBLE) / CAST(n0 AS DOUBLE))"
    val d2 = "(CAST(s2a AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(s2b AS DOUBLE) / CAST(n0 AS DOUBLE))"
    val t2 = s"""((CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)
                 | / (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE)))
                 | * ($d1 * $d1 * $s22p - 2.0 * $d1 * $d2 * $s12p + $d2 * $d2 * $s11p)
                 | / ($s11p * $s22p - $s12p * $s12p))"""
      .stripMargin.replace("\n", "")
    def pick(c: String, g: Int, out: String) =
      s"MAX(CASE WHEN g = $g THEN $c END) AS $out"
    s"""WITH oc AS (SELECT o_custkey, COUNT(*) AS noi FROM orders GROUP BY 1),
       |base AS (SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
       |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS b,
       |    COALESCE(noi, 0) AS o
       |  FROM customer LEFT JOIN oc ON c_custkey = o_custkey
       |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
       |gm AS (SELECT g, COUNT(*) AS n_g,
       |    CAST(SUM(CAST(b AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
       |    CAST(SUM(CAST(o AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2,
       |    CAST(SUM(CAST(CAST(b AS DECIMAL(38,0)) * CAST(b AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s11,
       |    CAST(SUM(CAST(CAST(o AS DECIMAL(38,0)) * CAST(o AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s22,
       |    CAST(SUM(CAST(CAST(b AS DECIMAL(38,0)) * CAST(o AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s12
       |  FROM base GROUP BY g),
       |w AS (SELECT ${pick("n_g", 1, "n1")}, ${pick("n_g", 0, "n0")},
       |    ${pick("s1", 1, "s1a")}, ${pick("s1", 0, "s1b")},
       |    ${pick("s2", 1, "s2a")}, ${pick("s2", 0, "s2b")},
       |    ${pick("s11", 1, "s11a")}, ${pick("s11", 0, "s11b")},
       |    ${pick("s22", 1, "s22a")}, ${pick("s22", 0, "s22b")},
       |    ${pick("s12", 1, "s12a")}, ${pick("s12", 0, "s12b")}
       |  FROM gm)
       |SELECT n1, n0, ROUND($t2, 6) AS t2_stat,
       |  ROUND($t2 * (CAST(n1 AS DOUBLE) + CAST(n0 AS DOUBLE) - 3.0)
       |    / (2.0 * $nm2), 6) AS f_stat
       |FROM w""".stripMargin
  }

  /** Brown–Forsythe robust variance-homogeneity test across order
    * priorities — [[anLevene]] centered at the MEDIAN instead of the
    * mean, the variant that keeps its size under the heavy-tailed
    * skew that makes mean-centered Levene liberal. Per-group exact
    * medians come off one value-grouped scan with PARTITIONED
    * cumulative windows (scalable — no global window); the doubled
    * median 2m keeps the .5-cent midpoint exact, so every deviation
    * z = |2v − 2m| is an exact BIGINT and the one-way F on z runs the
    * same exact DECIMAL(38,0) moment tree as [[anAnova]]; the one
    * double-fed gather (Σ s_g²/n_g) runs at DECIMAL(38,6) — the
    * an_dunnett width posture, z² sums reach ~1e21 at sf1;
    * F ROUND(·,6). */
  private[graft] def anBrownForsythe(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val d6 = (c: Column) => c.cast("decimal(38,6)")
    val b = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("grp"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val pv = b.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("cnt"))
    val wg = Window.partitionBy(col("grp")).orderBy(col("v"))
    val scan = pv.withColumn("cum", sum(col("cnt")).over(wg))
    val ng = b.groupBy(col("grp")).agg(count(lit(1)).as("n_g"))
    val withN = scan.join(broadcast(ng), Seq("grp"))
    def at(pos: Column, out: String) = withN
      .filter(col("cum") >= pos && col("cum") - col("cnt") < pos)
      .select(col("grp"), col("v").as(out))
    val lo = expr("(n_g + 1) div 2")
    val hi = expr("n_g div 2 + 1")
    val med = at(lo, "vlo").join(at(hi, "vhi"), Seq("grp"))
      .select(col("grp"), (col("vlo") + col("vhi")).as("m2"))
    val z = b.join(broadcast(med), Seq("grp"))
      .select(col("grp"), abs(lit(2L) * col("v") - col("m2")).as("z"))
    val zg = z.groupBy(col("grp")).agg(count(lit(1)).as("n_g"),
      sum(d38(col("z"))).as("sz"),
      sum((d38(col("z")) * d38(col("z"))).cast("decimal(38,0)")).as("szz"))
    val agg = zg.agg(count(lit(1)).as("k"), sum(col("n_g")).as("nn"),
      sum(col("sz")).as("st"),
      sum(d6(col("sz").cast("double") * col("sz").cast("double") /
        col("n_g").cast("double"))).as("sb"),
      sum(col("szz")).as("szz"))
    val nnd = col("nn").cast("double")
    val kd = col("k").cast("double")
    val ssb = col("sb").cast("double") -
      col("st").cast("double") * col("st").cast("double") / nnd
    val ssw = col("szz").cast("double") - col("sb").cast("double")
    agg.select(col("k"), col("nn").as("n"),
      round((ssb / (kd - lit(1.0))) / (ssw / (nnd - kd)), 6).as("f_bf"))
  }

  private[graft] lazy val anBrownForsytheSql = {
    val ssb = """(CAST(sb AS DOUBLE)
                | - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(nn AS DOUBLE))"""
      .stripMargin.replace("\n", "")
    val ssw = "(CAST(szz AS DOUBLE) - CAST(sb AS DOUBLE))"
    s"""WITH b AS (SELECT o_orderpriority AS grp,
       |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
       |  FROM orders),
       |pv AS (SELECT grp, v, COUNT(*) AS cnt FROM b GROUP BY grp, v),
       |scan AS (SELECT grp, v, cnt,
       |    CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cum
       |  FROM pv),
       |ng AS (SELECT grp, COUNT(*) AS n_g FROM b GROUP BY grp),
       |wn AS (SELECT scan.*, ng.n_g FROM scan JOIN ng USING (grp)),
       |med AS (SELECT l.grp, l.v + h.v AS m2 FROM
       |    (SELECT grp, v FROM wn
       |     WHERE cum >= (n_g + 1) // 2 AND cum - cnt < (n_g + 1) // 2) l
       |    JOIN
       |    (SELECT grp, v FROM wn
       |     WHERE cum >= n_g // 2 + 1 AND cum - cnt < n_g // 2 + 1) h
       |    USING (grp)),
       |z AS (SELECT b.grp, ABS(2 * v - m2) AS z FROM b JOIN med USING (grp)),
       |zg AS (SELECT grp, COUNT(*) AS n_g,
       |    CAST(SUM(CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sz,
       |    CAST(SUM(CAST(CAST(z AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS szz
       |  FROM z GROUP BY grp),
       |ag AS (SELECT COUNT(*) AS k, CAST(SUM(n_g) AS BIGINT) AS nn,
       |    CAST(SUM(sz) AS DECIMAL(38,0)) AS st,
       |    CAST(SUM(CAST(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)
       |      / CAST(n_g AS DOUBLE) AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS sb,
       |    CAST(SUM(szz) AS DECIMAL(38,0)) AS szz
       |  FROM zg)
       |SELECT k, nn AS n,
       |  ROUND(($ssb / (CAST(k AS DOUBLE) - 1.0))
       |    / ($ssw / (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f_bf
       |FROM ag""".stripMargin
  }

  /** Shared per-document Gopher-rater fail-count moments (n, Σn₁, Σn₁²)
    * for [[anFleissKappa]]/[[anGwetAc1]] — one explode tree for the
    * top-word share, row-local flags otherwise, m = 4 raters. */
  private def gopherRaterMoments(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextFunctions.words(col("text")).as("ws"))
    val nWords = size(col("ws"))
    val meanLen = (aggregate(col("ws"), lit(0L), (acc, w) => acc + length(w))
      .cast("double") / nWords.cast("double"))
    val nStop = size(filter(col("ws"),
      w => w.isin(TextFunctions.Stopwords("en"): _*)))
    val top = docs.select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c")).cast("double")).as("top_frac"))
    docs.join(top, Seq("doc_id"))
      .select(((nWords < 50).cast("long") +
        (meanLen < 3.0 || meanLen > 10.0).cast("long") +
        (nStop < 2).cast("long") +
        (col("top_frac") > 0.2).cast("long")).as("n1"))
      .agg(count(lit(1)).as("n"), sum(col("n1")).as("s1"),
        sum(col("n1") * col("n1")).as("s2"))
  }

  private val gopherRaterMomentsSql = {
    val stop = graft.text.TextFunctions.Stopwords("en")
      .map(w => s"'$w'").mkString(",")
    s"""w AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
       |  FROM documents),
       |cnt AS (SELECT doc_id, gram, COUNT(*) AS c
       |    FROM (SELECT doc_id, unnest(ws) AS gram FROM w) GROUP BY 1, 2),
       |top AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_frac
       |    FROM cnt GROUP BY 1),
       |f AS (SELECT
       |    (CASE WHEN len(ws) < 50 THEN 1 ELSE 0 END) +
       |    (CASE WHEN CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)
       |        / CAST(len(ws) AS DOUBLE) < 3.0
       |      OR CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)
       |        / CAST(len(ws) AS DOUBLE) > 10.0 THEN 1 ELSE 0 END) +
       |    (CASE WHEN len(list_filter(ws, x -> x IN ($stop))) < 2 THEN 1 ELSE 0 END) +
       |    (CASE WHEN top.top_frac > 0.2 THEN 1 ELSE 0 END) AS n1
       |  FROM w JOIN top USING (doc_id)),
       |ag AS (SELECT COUNT(*) AS n, CAST(SUM(n1) AS BIGINT) AS s1,
       |        CAST(SUM(n1 * n1) AS BIGINT) AS s2 FROM f)""".stripMargin
  }

  /** Gwet's AC1 over the same four-rater Gopher frame as
    * [[anFleissKappa]] — the agreement coefficient that does NOT
    * collapse under prevalence skew (the "kappa paradox": when one
    * category dominates, P_e ≈ P̄ and Fleiss reads near-zero despite
    * raters almost always agreeing; AC1's chance term 2π(1−π) stays
    * small instead). Same exact-integer moments, one IEEE tree,
    * ROUND(·,6) — emitted beside the Fleiss κ on the SAME data, so
    * the pair IS the prevalence diagnostic. */
  private[graft] def anGwetAc1(s: SparkSession, dir: String): DataFrame = {
    val agg = gopherRaterMoments(s, dir)
    val nd = col("n").cast("double")
    val pbar = (lit(2L) * col("s2") - lit(8L) * col("s1") + lit(12L) * col("n"))
      .cast("double") / (lit(12.0) * nd)
    val p1 = col("s1").cast("double") / (lit(4.0) * nd)
    val peK = p1 * p1 + (lit(1.0) - p1) * (lit(1.0) - p1)
    val peG = lit(2.0) * p1 * (lit(1.0) - p1)
    agg.select(col("n").as("n_docs"),
      round(p1, 6).as("p_fail"), round(pbar, 6).as("p_bar"),
      round((pbar - peK) / (lit(1.0) - peK), 6).as("fleiss_kappa"),
      round((pbar - peG) / (lit(1.0) - peG), 6).as("gwet_ac1"))
  }

  private[graft] lazy val anGwetAc1Sql = {
    val p1 = "(CAST(s1 AS DOUBLE) / (4.0 * CAST(n AS DOUBLE)))"
    val pbar = "(CAST(2 * s2 - 8 * s1 + 12 * n AS DOUBLE) / (12.0 * CAST(n AS DOUBLE)))"
    val peK = s"($p1 * $p1 + (1.0 - $p1) * (1.0 - $p1))"
    val peG = s"(2.0 * $p1 * (1.0 - $p1))"
    s"""WITH $gopherRaterMomentsSql
       |SELECT n AS n_docs,
       |  ROUND($p1, 6) AS p_fail, ROUND($pbar, 6) AS p_bar,
       |  ROUND(($pbar - $peK) / (1.0 - $peK), 6) AS fleiss_kappa,
       |  ROUND(($pbar - $peG) / (1.0 - $peG), 6) AS gwet_ac1
       |FROM ag""".stripMargin
  }

  /** Linearly-weighted Cohen's kappa between order PRIORITY and the
    * order-value QUINTILE — ordinal-vs-ordinal agreement where
    * [[anCohenKappa]]'s unweighted form throws away the ordering (a
    * 1-URGENT order landing in the 2nd quintile is a near-miss, not a
    * full disagreement): quintiles from exact global PrefixSum ranks
    * (bucket = (5·rank − 1) div n + 1 — ntile semantics, deterministic
    * (v, orderkey) tie order), 25 exact BIGINT cells + marginals, and
    * κ_w = 1 − n·Σ|i−j|·o_ij / Σ|i−j|·r_i·c_j stays EXACT integers
    * until one final division, ROUND(·,6). */
  private[graft] def anWeightedKappa(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("pri"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"),
        col("o_orderkey").cast("long").as("ok"))
    val scan = graft.operators.PrefixSum.withRunningTotals(
      o.select(col("v"), col("ok"), col("pri")), Seq("v", "ok"), Seq("pri"))
    val n = scan.agg(max(col("rn")).as("n"))
    val cells = scan.crossJoin(broadcast(n))
      .select(col("pri"), expr("(5 * rn - 1) div n + 1").cast("long").as("q5"))
      .groupBy(col("pri"), col("q5")).agg(count(lit(1)).as("o"))
    val rm = cells.groupBy(col("pri")).agg(sum(col("o")).as("r"))
    val cm = cells.groupBy(col("q5")).agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("nn"))
    val num = cells
      .agg(sum(abs(col("pri") - col("q5")) * col("o")).as("wo"))
    val den = rm.crossJoin(broadcast(cm))
      .agg(sum(abs(col("pri") - col("q5")) * col("r") * col("c")).as("wrc"))
    num.crossJoin(broadcast(den)).crossJoin(broadcast(tot))
      .select(col("nn").as("n"),
        round(lit(1.0) - (col("nn") * col("wo")).cast("double") /
          col("wrc").cast("double"), 6).as("kappa_w"))
  }

  private[graft] lazy val anWeightedKappaSql =
    """WITH o AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pri,
      |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v,
      |    o_orderkey AS ok
      |  FROM orders),
      |rk AS (SELECT pri, CAST(ROW_NUMBER() OVER (ORDER BY v, ok) AS BIGINT) AS rn
      |       FROM o),
      |nn AS (SELECT COUNT(*) AS n FROM o),
      |cells AS (SELECT pri, (5 * rn - 1) // n + 1 AS q5, COUNT(*) AS o
      |          FROM rk CROSS JOIN nn GROUP BY 1, 2),
      |rm AS (SELECT pri, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
      |cm AS (SELECT q5, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS nn FROM cells),
      |num AS (SELECT CAST(SUM(ABS(pri - q5) * o) AS BIGINT) AS wo FROM cells),
      |den AS (SELECT CAST(SUM(ABS(pri - q5) * r * c) AS BIGINT) AS wrc
      |        FROM rm CROSS JOIN cm)
      |SELECT nn AS n,
      |  ROUND(1.0 - CAST(nn * wo AS DOUBLE) / CAST(wrc AS DOUBLE), 6) AS kappa_w
      |FROM num CROSS JOIN den CROSS JOIN tot""".stripMargin

  /** DFFITS influence scan over the daily-revenue trend — the
    * DELETION-scaled companion to [[anCooksDistance]] (Cook's D uses
    * the full-sample s²; DFFITS divides by the leave-one-out s_(t), so
    * a single wild day can't mask its own influence): same spine, same
    * exact-decimal moment fit, h_t and e_t one shared IEEE tree,
    * s_(t)² = ((n−2)s² − e²/(1−h))/(n−3) closed form, top-10 days by
    * |DFFITS| (day-ascending tie order). ROUND(·,6). */
  private[graft] def anDffits(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val spine = dailyRevenueSpine(s, dir).select(col("d"), col("rev_c"))
    val m0 = spine.agg(count(lit(1)).as("n"),
      sum(d38(col("d"))).as("sx"), sum(d38(col("rev_c"))).as("sy"),
      sum(d38(col("d")) * d38(col("d"))).as("sxx"),
      sum(d38(col("rev_c")) * d38(col("rev_c"))).as("syy"),
      sum(d38(col("d")) * d38(col("rev_c"))).as("sxy"))
    val cxx = (d38(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double")
    val cyy = (d38(col("n")) * col("syy") - col("sy") * col("sy")).cast("double")
    val cxy = (d38(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double")
    val m = m0.select(col("n"),
      (cxy / cxx).as("slope"),
      ((col("sy").cast("double") - col("sx").cast("double") * (cxy / cxx)) /
        col("n").cast("double")).as("icept"),
      (col("sx").cast("double") / col("n").cast("double")).as("xbar"),
      (cxx / col("n").cast("double")).as("sxx_c"),
      ((cyy - (cxy / cxx) * cxy) / col("n").cast("double")).as("sse"))
    val nd = col("n").cast("double")
    val e = col("rev_c").cast("double") - col("icept") -
      col("slope") * col("d").cast("double")
    val h = lit(1.0) / nd +
      (col("d").cast("double") - col("xbar")) *
        (col("d").cast("double") - col("xbar")) / col("sxx_c")
    spine.crossJoin(broadcast(m))
      .withColumn("e", e).withColumn("hlev", h)
      .withColumn("s2i",
        ((nd - lit(2.0)) * (col("sse") / (nd - lit(2.0))) -
          col("e") * col("e") / (lit(1.0) - col("hlev"))) / (nd - lit(3.0)))
      .select(col("d").as("day_no"),
        round(col("e") / 100.0, 2).as("resid_usd"),
        round(col("hlev"), 6).as("leverage"),
        round(col("e") * sqrt(col("hlev")) /
          (sqrt(col("s2i")) * (lit(1.0) - col("hlev"))), 6).as("dffits"))
      .orderBy(abs(col("dffits")).desc, col("day_no")).limit(10)
  }

  private[graft] lazy val anDffitsSql = {
    val cxx = "CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)"
    val cyy = "CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)"
    val cxy = "CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)"
    s"""WITH daily AS ($dailySpineSql),
       |m0 AS (SELECT COUNT(*) AS n,
       |    SUM(CAST(d AS DECIMAL(38,0))) AS sx, SUM(CAST(rev_c AS DECIMAL(38,0))) AS sy,
       |    SUM(CAST(d AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0))) AS sxx,
       |    SUM(CAST(rev_c AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0))) AS syy,
       |    SUM(CAST(d AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0))) AS sxy
       |  FROM daily),
       |m AS (SELECT n, ($cxy / $cxx) AS slope,
       |    ((CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE) * ($cxy / $cxx)) / CAST(n AS DOUBLE)) AS icept,
       |    (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS xbar,
       |    ($cxx / CAST(n AS DOUBLE)) AS sxx_c,
       |    (($cyy - ($cxy / $cxx) * $cxy) / CAST(n AS DOUBLE)) AS sse
       |  FROM m0),
       |pt AS (SELECT d AS day_no,
       |    (CAST(rev_c AS DOUBLE) - icept - slope * CAST(d AS DOUBLE)) AS e,
       |    (1.0 / CAST(n AS DOUBLE)
       |      + (CAST(d AS DOUBLE) - xbar) * (CAST(d AS DOUBLE) - xbar) / sxx_c) AS hlev,
       |    n, sse
       |  FROM daily CROSS JOIN m),
       |sc AS (SELECT day_no, e, hlev,
       |    (((CAST(n AS DOUBLE) - 2.0) * (sse / (CAST(n AS DOUBLE) - 2.0))
       |      - e * e / (1.0 - hlev)) / (CAST(n AS DOUBLE) - 3.0)) AS s2i
       |  FROM pt)
       |SELECT day_no, ROUND(e / 100.0, 2) AS resid_usd,
       |  ROUND(hlev, 6) AS leverage,
       |  ROUND(e * sqrt(hlev) / (sqrt(s2i) * (1.0 - hlev)), 6) AS dffits
       |FROM sc ORDER BY ABS(ROUND(e * sqrt(hlev) / (sqrt(s2i) * (1.0 - hlev)), 6)) DESC, day_no
       |LIMIT 10""".stripMargin
  }
}

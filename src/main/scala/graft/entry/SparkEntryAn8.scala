package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 second-wave continuation: reliability (ICC), ordinal
  * association (Goodman–Kruskal γ / Stuart τ_c), mediation (Sobel),
  * rank-based scale (Siegel–Tukey), fixed-grid KDE, and two
  * training-data pipeline operators (deterministic hash split, corpus
  * unigram cross-entropy bucketing). Same scope rules as
  * [[SparkEntryAn1]]–[[SparkEntryAn7]]. */
private[graft] trait SparkEntryAn8 { this: SparkEntry.type =>

  /** Intraclass correlation ICC(1) of balances within market segments —
    * the one-way random-effects reliability coefficient beside
    * [[anAnova]] (same decomposition as a TEST) and [[anCronbachAlpha]]
    * (item form): ICC = (MSB−MSW)/(MSB+(k₀−1)MSW) with the unbalanced-
    * design k₀ = (N − Σnᵢ²/N)/(k−1). Between-group pressure Σ Sᵢ²/nᵢ
    * is one double per group from exact integers, DECIMAL(38,6)-
    * gathered (order-free); every other sum exact. */
  private[graft] def anIcc(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val c = Tables.customer(s, dir)
      .select(col("c_mktsegment").as("g"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val per = c.groupBy(col("g"))
      .agg(count(lit(1)).as("ni"), sum(d38(col("v"))).as("si"))
      .agg(count(lit(1)).as("k"), sum(col("ni")).as("nn"),
        sum((d38(col("ni")) * d38(col("ni"))).cast("decimal(38,0)")).as("sn2"),
        sum(((col("si") * col("si")).cast("decimal(38,0)").cast("double") /
          col("ni").cast("double")).cast("decimal(38,6)")).cast("double").as("bg"))
    val tot = c.agg(sum(d38(col("v"))).as("st"),
      sum((d38(col("v")) * d38(col("v"))).cast("decimal(38,0)")).as("sst"))
    val j = per.crossJoin(broadcast(tot))
    val nd = col("nn").cast("double"); val kd = col("k").cast("double")
    val ssb = col("bg") -
      (col("st") * col("st")).cast("decimal(38,0)").cast("double") / nd
    val ssw = col("sst").cast("double") - col("bg")
    val msb = ssb / (kd - lit(1.0))
    val msw = ssw / (nd - kd)
    val k0 = (nd - col("sn2").cast("double") / nd) / (kd - lit(1.0))
    // msb/msw are cents²-scaled (grow with the data), and their exact
    // DECIMAL inputs pass 2^53 at sf1 where the two engines' int128→
    // binary64 casts can differ by one ulp (the an_chow_test lesson —
    // observed here as a 2e-4 wobble at msb ~ 2e12 that ROUND 6 cannot
    // absorb at that magnitude). Emit only the SCALE-FREE views: the
    // F ratio msb/msw and k₀, where the relative ulp cancels to 1e-16
    // and ROUND(·,6) holds at any SF.
    j.select(col("k"), col("nn").as("n"),
      round(msb / msw, 6).as("f_ratio"), round(k0, 6).as("k0"),
      round((msb - msw) / (msb + (k0 - lit(1.0)) * msw), 6).as("icc1"))
  }

  private[graft] lazy val anIccSql =
    """WITH c AS (SELECT c_mktsegment AS g,
      |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM customer),
      |per AS (SELECT g, COUNT(*) AS ni,
      |          CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS si
      |        FROM c GROUP BY g),
      |ag AS (SELECT COUNT(*) AS k, CAST(SUM(ni) AS BIGINT) AS nn,
      |         CAST(SUM(CAST(CAST(ni AS DECIMAL(38,0)) * CAST(ni AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sn2,
      |         CAST(SUM(CAST(CAST(CAST(si * si AS DECIMAL(38,0)) AS DOUBLE) / CAST(ni AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS bg
      |       FROM per),
      |tot AS (SELECT CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS st,
      |          CAST(SUM(CAST(CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sst
      |        FROM c),
      |d AS (SELECT k, nn, CAST(k AS DOUBLE) AS kd, CAST(nn AS DOUBLE) AS nd, sn2,
      |        bg - CAST(CAST(st * st AS DECIMAL(38,0)) AS DOUBLE) / CAST(nn AS DOUBLE) AS ssb,
      |        CAST(sst AS DOUBLE) - bg AS ssw
      |      FROM ag CROSS JOIN tot),
      |m AS (SELECT k, nn, ssb / (kd - 1.0) AS msb, ssw / (nd - kd) AS msw,
      |        (nd - CAST(sn2 AS DOUBLE) / nd) / (kd - 1.0) AS k0
      |      FROM d)
      |SELECT k, nn AS n, ROUND(msb / msw, 6) AS f_ratio, ROUND(k0, 6) AS k0,
      |  ROUND((msb - msw) / (msb + (k0 - 1.0) * msw), 6) AS icc1
      |FROM m""".stripMargin

  /** Goodman–Kruskal γ and Stuart τ_c between order priority (ordinal
    * 1..5 from the leading digit) and order-value band (5 fixed price
    * thresholds) — the ordinal-ordinal association pair beside
    * [[anKendallTau]] (continuous ranks) and [[anCramersV]] (nominal):
    * concordant/discordant mass off the 25-cell crosstab self-join
    * (key-domain-sized, broadcast), P = Σn·C_cell, Q = Σn·D_cell exact
    * DECIMAL(38,0); γ = (P−Q)/(P+Q), τ_c = m(P−Q)/(n²(m−1)), and the
    * Goodman–Kruskal ASE via the n³-normalized per-cell pressure
    * (scale-free doubles, DECIMAL(38,12)-gathered over 25 cells). */
  private[graft] def anGkGamma(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val o = Tables.orders(s, dir).select(
      substring(col("o_orderpriority"), 1, 1).cast("int").as("i"),
      (when(col("o_totalprice") < 50000, 1).when(col("o_totalprice") < 100000, 2)
        .when(col("o_totalprice") < 200000, 3).when(col("o_totalprice") < 350000, 4)
        .otherwise(5)).as("j"))
    val cells = o.groupBy(col("i"), col("j")).agg(count(lit(1)).as("nij"))
    val other = cells.select(col("i").as("i2"), col("j").as("j2"),
      col("nij").as("n2"))
    val cd = cells.join(broadcast(other),
        (col("i2") - col("i")) * (col("j2") - col("j")) =!= 0)
      .groupBy(col("i"), col("j"), col("nij"))
      .agg(sum(when((col("i2") - col("i")) * (col("j2") - col("j")) > 0, col("n2"))
        .otherwise(0L)).as("cc"),
        sum(when((col("i2") - col("i")) * (col("j2") - col("j")) < 0, col("n2"))
          .otherwise(0L)).as("dd"))
    val tot = cd.agg(sum(col("nij")).as("n"),
      sum((d38(col("nij")) * d38(col("cc"))).cast("decimal(38,0)")).as("p"),
      sum((d38(col("nij")) * d38(col("dd"))).cast("decimal(38,0)")).as("q"))
    // ASE: 4·n³·sqrt(Σ nij·z²)/(P+Q)² with z = (Q·C − P·D)/n³ scale-free
    val withTot = cd.crossJoin(broadcast(tot))
      .withColumn("z",
        (col("q") * d38(col("cc")) - col("p") * d38(col("dd")))
          .cast("decimal(38,0)").cast("double") /
          (col("n").cast("double") * col("n").cast("double") * col("n").cast("double")))
      .groupBy(col("n"), col("p"), col("q"))
      .agg(sum((col("nij").cast("double") * col("z") * col("z"))
        .cast("decimal(38,12)")).cast("double").as("sz"))
    val nd = col("n").cast("double")
    val pd = col("p").cast("double"); val qd = col("q").cast("double")
    val gamma = (pd - qd) / (pd + qd)
    val ase = lit(4.0) * nd * nd * nd * sqrt(col("sz")) / ((pd + qd) * (pd + qd))
    withTot.select(col("n"), round(gamma, 6).as("gamma"),
      round(gamma / ase, 6).as("z_gamma"),
      round(lit(5.0) * (pd - qd) / (nd * nd * lit(4.0)), 6).as("tau_c"))
  }

  private[graft] lazy val anGkGammaSql =
    """WITH o AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS i,
      |    CASE WHEN o_totalprice < 50000 THEN 1 WHEN o_totalprice < 100000 THEN 2
      |         WHEN o_totalprice < 200000 THEN 3 WHEN o_totalprice < 350000 THEN 4
      |         ELSE 5 END AS j
      |  FROM orders),
      |cells AS (SELECT i, j, COUNT(*) AS nij FROM o GROUP BY i, j),
      |cd AS (SELECT a.i, a.j, a.nij,
      |         CAST(SUM(CASE WHEN (b.i - a.i) * (b.j - a.j) > 0 THEN b.nij ELSE 0 END) AS BIGINT) AS cc,
      |         CAST(SUM(CASE WHEN (b.i - a.i) * (b.j - a.j) < 0 THEN b.nij ELSE 0 END) AS BIGINT) AS dd
      |       FROM cells a JOIN cells b ON (b.i - a.i) * (b.j - a.j) <> 0
      |       GROUP BY a.i, a.j, a.nij),
      |tot AS (SELECT CAST(SUM(nij) AS BIGINT) AS n,
      |          CAST(SUM(CAST(nij AS DECIMAL(38,0)) * CAST(cc AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS p,
      |          CAST(SUM(CAST(nij AS DECIMAL(38,0)) * CAST(dd AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS q
      |        FROM cd),
      |zc AS (SELECT n, p, q,
      |         CAST(SUM(CAST(CAST(nij AS DOUBLE)
      |           * (CAST(CAST(q * CAST(cc AS DECIMAL(38,0)) - p * CAST(dd AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE)
      |              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      |           * (CAST(CAST(q * CAST(cc AS DECIMAL(38,0)) - p * CAST(dd AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE)
      |              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS DECIMAL(38,12))) AS DOUBLE) AS sz
      |       FROM cd CROSS JOIN tot GROUP BY n, p, q)
      |SELECT n,
      |  ROUND((CAST(p AS DOUBLE) - CAST(q AS DOUBLE)) / (CAST(p AS DOUBLE) + CAST(q AS DOUBLE)), 6) AS gamma,
      |  ROUND(((CAST(p AS DOUBLE) - CAST(q AS DOUBLE)) / (CAST(p AS DOUBLE) + CAST(q AS DOUBLE)))
      |    / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * sqrt(sz)
      |       / ((CAST(p AS DOUBLE) + CAST(q AS DOUBLE)) * (CAST(p AS DOUBLE) + CAST(q AS DOUBLE)))), 6) AS z_gamma,
      |  ROUND(5.0 * (CAST(p AS DOUBLE) - CAST(q AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 4.0), 6) AS tau_c
      |FROM zc""".stripMargin

  /** Sobel mediation test of quantity → discount → revenue on line
    * items — does the discount channel carry a quantity effect, the
    * closed-form mediation z beside [[anPartialCorr]] (which nets the
    * SAME triangle without direction): a from M~X, b from Y~M+X (both
    * OLS closed forms off ONE pass of exact n-scaled centered
    * cross-products — each Cab = nΣab − ΣaΣb an exact DECIMAL(38,0)),
    * z = ab/√(b²se_a² + a²se_b²). Discount enters as exact percent
    * points, revenue as exact 10⁻⁴ dollars (the 2dp×2dp product is a
    * 4dp decimal — integerizing at ×10⁴ never rounds, where a per-row
    * 2dp cast would split on HALF_UP/HALF_EVEN boundary products). */
  private[graft] def anSobel(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val li = Tables.lineitem(s, dir).select(
      col("l_quantity").cast("bigint").as("x"),
      (col("l_discount").cast("decimal(12,2)") * 100).cast("bigint").as("m"),
      // 2dp × 2dp = a 4dp product exactly representable at (24,8): the
      // ×10⁴ integerization never rounds (y in 10⁻⁴ dollars)
      ((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(24,8)") * 10000).cast("bigint").as("y"))
    def p(a: String, b: String) =
      sum((d38(col(a)) * d38(col(b))).cast("decimal(38,0)"))
    val sums = li.agg(count(lit(1)).as("n"),
      sum(d38(col("x"))).as("sx"), sum(d38(col("m"))).as("sm"),
      sum(d38(col("y"))).as("sy"),
      p("x", "x").as("sxx"), p("m", "m").as("smm"), p("y", "y").as("syy"),
      p("x", "m").as("sxm"), p("x", "y").as("sxy"), p("m", "y").as("smy"))
    def cc(nm: String, ab: String, a: String, b: String) =
      (d38(col("n")) * col(ab) - col(a) * col(b)).cast("decimal(38,0)")
        .cast("double").as(nm)
    val c = sums.select(col("n"),
      cc("cxx", "sxx", "sx", "sx"), cc("cmm", "smm", "sm", "sm"),
      cc("cyy", "syy", "sy", "sy"), cc("cxm", "sxm", "sx", "sm"),
      cc("cxy", "sxy", "sx", "sy"), cc("cmy", "smy", "sm", "sy"))
    val nd = col("n").cast("double")
    val a = col("cxm") / col("cxx")
    // se_a² = σ̂²_{m|x}/s_xx; in n-scaled C's the n's cancel exactly
    val seA2 = (col("cmm") - a * col("cxm")) / ((nd - lit(2.0)) * col("cxx"))
    val det = col("cxx") * col("cmm") - col("cxm") * col("cxm")
    val b = (col("cxx") * col("cmy") - col("cxm") * col("cxy")) / det
    val cx = (col("cmm") * col("cxy") - col("cxm") * col("cmy")) / det
    val sse = (col("cyy") - b * col("cmy") - cx * col("cxy")) / nd
    val sig2 = sse / (nd - lit(3.0))
    val seB2 = sig2 * nd * col("cxx") / det
    c.select(col("n"), round(a, 9).as("a_coef"), round(b, 9).as("b_coef"),
      round(a * b / sqrt(b * b * seA2 + a * a * seB2), 6).as("sobel_z"))
  }

  private[graft] lazy val anSobelSql =
    """WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS x,
      |    CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS m,
      |    CAST(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8)) * 10000 AS BIGINT) AS y
      |  FROM lineitem),
      |s AS (SELECT COUNT(*) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |    CAST(SUM(CAST(m AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sm,
      |    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
      |    CAST(SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
      |    CAST(SUM(CAST(CAST(m AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS smm,
      |    CAST(SUM(CAST(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
      |    CAST(SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxm,
      |    CAST(SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
      |    CAST(SUM(CAST(CAST(m AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS smy
      |  FROM li),
      |c AS (SELECT n, CAST(n AS DOUBLE) AS nd,
      |    CAST(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DECIMAL(38,0)) AS DOUBLE) AS cxx,
      |    CAST(CAST(CAST(n AS DECIMAL(38,0)) * smm - sm * sm AS DECIMAL(38,0)) AS DOUBLE) AS cmm,
      |    CAST(CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DECIMAL(38,0)) AS DOUBLE) AS cyy,
      |    CAST(CAST(CAST(n AS DECIMAL(38,0)) * sxm - sx * sm AS DECIMAL(38,0)) AS DOUBLE) AS cxm,
      |    CAST(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DECIMAL(38,0)) AS DOUBLE) AS cxy,
      |    CAST(CAST(CAST(n AS DECIMAL(38,0)) * smy - sm * sy AS DECIMAL(38,0)) AS DOUBLE) AS cmy
      |  FROM s),
      |e AS (SELECT n, nd, cxm / cxx AS a,
      |    (cmm - (cxm / cxx) * cxm) / ((nd - 2.0) * cxx) AS se_a2,
      |    cxx * cmm - cxm * cxm AS det, cxx, cmm, cyy, cxm, cxy, cmy
      |  FROM c),
      |f AS (SELECT n, nd, a, se_a2, det, cxx, cyy, cxy, cmy,
      |    (cxx * cmy - cxm * cxy) / det AS b,
      |    (cmm * cxy - cxm * cmy) / det AS cx
      |  FROM e),
      |g AS (SELECT n, a, b, se_a2,
      |    ((cyy - b * cmy - cx * cxy) / nd / (nd - 3.0)) * nd * cxx / det AS se_b2
      |  FROM f)
      |SELECT n, ROUND(a, 9) AS a_coef, ROUND(b, 9) AS b_coef,
      |  ROUND(a * b / sqrt(b * b * se_a2 + a * a * se_b2), 6) AS sobel_z
      |FROM g""".stripMargin

  /** Siegel–Tukey rank-scale test between BUILDING and AUTOMOBILE
    * balances — Wilcoxon run on OUTSIDE-IN ranks (1 to the min, 2–3 to
    * the two maxima, 4–5 inward, …), the dispersion companion to
    * [[anAnsariBradley]] (folded midranks) and [[anMoodScale]]
    * (squared deviations from the midrank): a tie run of cnt pooled
    * values at offset lo contributes a CLOSED-FORM integer Σa(p) over
    * positions (parity-split triangular sums — no per-position
    * expansion at any SF), ties midrank-averaged, W = Σ cnt_b·Σa/cnt
    * per-run doubles DECIMAL(38,6)-gathered. z uses the tie-corrected
    * Wilcoxon variance (Σ(t³−t) exact). One
    * [[graft.operators.PrefixSum]] scan carries pooled AND group-B
    * run counts. */
  private[graft] def anSiegelTukey(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select((col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"),
        (col("c_mktsegment") === "BUILDING").cast("long").as("b"))
    val scan = graft.operators.PrefixSum.distinctRunningCounts(
      c, Seq("v"), sumCols = Seq("b"))
    val tot = c.agg(count(lit(1)).as("nn"), sum(col("b")).as("nb"))
    val r = scan.crossJoin(broadcast(tot))
      .withColumn("lo", col("cnt_cum") - col("cnt"))
      .withColumn("hh", expr("(nn + 1) div 2"))
      // bottom-position slice [x1, y1] and its a(p) = 2p − [p odd] sum
      .withColumn("x1", col("lo") + 1)
      .withColumn("y1", least(col("cnt_cum"), col("hh")))
      .withColumn("sb", when(col("y1") >= col("x1"),
        col("y1") * (col("y1") + 1) - (col("x1") - 1) * col("x1") -
          (expr("(y1 + 1) div 2") - expr("x1 div 2"))).otherwise(lit(0L)))
      // top-position slice mapped to t = nn+1−p ∈ [t1, t2]: a = 2t − [t even]
      .withColumn("t1", col("nn") + 1 - col("cnt_cum"))
      .withColumn("t2", col("nn") + 1 - greatest(col("x1"), col("hh") + 1))
      .withColumn("st", when(col("t2") >= col("t1"),
        col("t2") * (col("t2") + 1) - (col("t1") - 1) * col("t1") -
          (expr("t2 div 2") - expr("(t1 - 1) div 2"))).otherwise(lit(0L)))
      .withColumn("runsum", col("sb") + col("st"))
    val w = r.groupBy(col("nn"), col("nb"))
      .agg(sum((col("b").cast("double") * col("runsum").cast("double") /
        col("cnt").cast("double")).cast("decimal(38,6)")).cast("double").as("w"),
        sum(((d38(col("cnt")) * d38(col("cnt")) * d38(col("cnt")) - d38(col("cnt"))))
          .cast("decimal(38,0)")).as("tie3"))
    val nd = col("nn").cast("double"); val nb = col("nb").cast("double")
    val na = nd - nb
    val ew = nb * (nd + lit(1.0)) / lit(2.0)
    val varw = nb * na / lit(12.0) *
      ((nd + lit(1.0)) - col("tie3").cast("double") / (nd * (nd - lit(1.0))))
    w.select(col("nb").as("n_building"), (col("nn") - col("nb")).as("n_auto"),
      round(col("w"), 6).as("w_st"),
      round((col("w") - ew) / sqrt(varw), 6).as("z"))
  }

  private[graft] lazy val anSiegelTukeySql =
    """WITH c AS (SELECT CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v,
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS b
      |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
      |pv AS (SELECT v, COUNT(*) AS cnt, CAST(SUM(b) AS BIGINT) AS cb FROM c GROUP BY v),
      |sc AS (SELECT v, cnt, cb, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum FROM pv),
      |tot AS (SELECT COUNT(*) AS nn, CAST(SUM(b) AS BIGINT) AS nb FROM c),
      |r AS (SELECT nn, nb, cnt, cb,
      |        cnt_cum - cnt + 1 AS x1,
      |        LEAST(cnt_cum, (nn + 1) // 2) AS y1,
      |        nn + 1 - cnt_cum AS t1,
      |        nn + 1 - GREATEST(cnt_cum - cnt + 1, (nn + 1) // 2 + 1) AS t2
      |      FROM sc CROSS JOIN tot),
      |rs AS (SELECT nn, nb, cnt, cb,
      |        (CASE WHEN y1 >= x1 THEN y1 * (y1 + 1) - (x1 - 1) * x1 - ((y1 + 1) // 2 - x1 // 2) ELSE 0 END)
      |        + (CASE WHEN t2 >= t1 THEN t2 * (t2 + 1) - (t1 - 1) * t1 - (t2 // 2 - (t1 - 1) // 2) ELSE 0 END) AS runsum
      |      FROM r),
      |w AS (SELECT nn, nb,
      |        CAST(SUM(CAST(CAST(cb AS DOUBLE) * CAST(runsum AS DOUBLE) / CAST(cnt AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS w,
      |        CAST(SUM(CAST(CAST(cnt AS DECIMAL(38,0)) * CAST(cnt AS DECIMAL(38,0)) * CAST(cnt AS DECIMAL(38,0)) - CAST(cnt AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS tie3
      |      FROM rs GROUP BY nn, nb)
      |SELECT nb AS n_building, nn - nb AS n_auto, ROUND(w, 6) AS w_st,
      |  ROUND((w - CAST(nb AS DOUBLE) * (CAST(nn AS DOUBLE) + 1.0) / 2.0)
      |    / sqrt(CAST(nb AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(nb AS DOUBLE)) / 12.0
      |        * ((CAST(nn AS DOUBLE) + 1.0)
      |           - CAST(tie3 AS DOUBLE) / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)))), 6) AS z
      |FROM w""".stripMargin

  /** Fixed-grid Gaussian kernel density of customer balances — the
    * smoothed distribution view beside [[anHistogram]] (hard bins):
    * 21 evaluation points g = −1000 + 550k dollars, bandwidth h = 500,
    * f̂(g) = Σᵢ K((vᵢ−g)/h)/(nh). The grid is a broadcast constant
    * frame (map-side fan-out of 21 rows per input — no shuffle grows
    * with the grid), per-point kernel mass DECIMAL(38,12)-gathered
    * (order-free; each term ≤ 1, so the gather can't overflow at any
    * corpus size), one division at emission. */
  private[graft] def anKde(s: SparkSession, dir: String): DataFrame = {
    val grid = s.range(21).select((lit(-1000.0) + col("id") * 550.0).as("g"))
    val v = Tables.customer(s, dir)
      .select(((col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint")
        .cast("double") / 100.0).as("v"))
    val h = lit(500.0)
    val terms = v.crossJoin(broadcast(grid))
      .select(col("g"),
        exp(-(col("v") - col("g")) * (col("v") - col("g")) /
          (lit(2.0) * h * h)).as("k"))
    val n = v.agg(count(lit(1)).as("n"))
    terms.groupBy(col("g"))
      .agg(sum(col("k").cast("decimal(38,12)")).cast("double").as("mass"))
      .crossJoin(broadcast(n))
      .select(col("g").as("grid_usd"), col("n"),
        round(col("mass") / (col("n").cast("double") * h * sqrt(lit(2.0) * lit(math.Pi))), 9)
          .as("density"))
      .orderBy(col("grid_usd"))
  }

  private[graft] lazy val anKdeSql =
    """WITH grid AS (SELECT -1000.0e0 + CAST(k AS DOUBLE) * 550.0e0 AS g
      |              FROM generate_series(0, 20) t(k)),
      |v AS (SELECT CAST(CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS DOUBLE) / 100.0e0 AS v
      |      FROM customer),
      |t AS (SELECT g, exp(-(v - g) * (v - g) / (2.0 * 500.0e0 * 500.0e0)) AS k
      |      FROM v CROSS JOIN grid),
      |n AS (SELECT COUNT(*) AS n FROM v)
      |SELECT g AS grid_usd, n,
      |  ROUND(CAST(SUM(CAST(k AS DECIMAL(38,12))) AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * 500.0e0 * sqrt(2.0 * pi())), 9) AS density
      |FROM t CROSS JOIN n GROUP BY g, n ORDER BY grid_usd""".stripMargin

  /** Deterministic train/val/test split of the document corpus — the
    * reproducible holdout every training-data pipeline runs before
    * anything else: split = md5(doc_id) mod 10 → 8/1/1, so membership
    * is a pure function of the id (stable across reruns, machines, and
    * corpus growth — a new document never moves an old one between
    * splits). Per-split document count, exact token total, mean
    * length; the split column is one codegen'd hash expression, no
    * shuffle beyond the 3-group aggregate. */
  private[graft] def etlTrainTestSplit(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("long") % 10).as("h"))
      .withColumn("split", when(col("h") < 8, "train")
        .when(col("h") === 8, "val").otherwise("test"))
    d.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("tokens"))
      .select(col("split"), col("n_docs"), col("tokens"),
        round(col("tokens").cast("double") / col("n_docs").cast("double"), 6)
          .as("avg_tokens"))
      .orderBy(col("split"))
  }

  private[graft] lazy val etlTrainTestSplitSql =
    """WITH d AS (SELECT doc_id,
      |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks,
      |    ((instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |      + instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) % 10 AS h
      |  FROM documents),
      |sp AS (SELECT CASE WHEN h < 8 THEN 'train' WHEN h = 8 THEN 'val' ELSE 'test' END AS split,
      |         toks
      |       FROM d)
      |SELECT split, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS tokens,
      |  ROUND(CAST(SUM(toks) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_tokens
      |FROM sp GROUP BY split ORDER BY split""".stripMargin

  /** Per-document unigram cross-entropy against the corpus language
    * model, bucketed — the CCNet-style perplexity quality screen
    * beside [[SparkEntryText]]'s surface heuristics (a document whose
    * words are corpus-typical scores low; gibberish and rare-token
    * soup score high): H(d) = −(1/|d|) Σ_{w∈d} log₂(c_w/T) with c_w
    * the corpus unigram counts. Posting-shaped: tokens shuffle once on
    * the word key to meet the vocab-sized frequency table; per-doc
    * terms DECIMAL(38,12)-gathered, then fixed bands (no corpus-rank
    * dependence — a document's bucket never moves when the corpus
    * grows around it). */
  private[graft] def textUnigramXent(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
    val freq = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val tot = freq.agg(sum(col("c")).as("t"))
    val perDoc = toks.join(freq, "w").crossJoin(broadcast(tot))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("len"),
        sum((-log2(col("c").cast("double") / col("t").cast("double")))
          .cast("decimal(38,12)")).cast("double").as("info"))
      .select((col("info") / col("len").cast("double")).as("xent"))
    perDoc
      .select(when(col("xent") < 6.0, "a_lt6").when(col("xent") < 8.0, "b_6_8")
        .when(col("xent") < 10.0, "c_8_10").otherwise("d_ge10").as("bucket"),
        col("xent"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("xent").cast("decimal(38,12)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_xent"))
      .orderBy(col("bucket"))
  }

  private[graft] lazy val textUnigramXentSql =
    """WITH toks AS (SELECT doc_id, w
      |  FROM (SELECT doc_id, UNNEST(string_split_regex(trim(lower(text)), '\s+')) AS w
      |        FROM documents) t
      |  WHERE len(w) > 0),
      |freq AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM freq),
      |pd AS (SELECT doc_id, COUNT(*) AS len,
      |         CAST(SUM(CAST(-log2(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) AS DECIMAL(38,12))) AS DOUBLE) AS info
      |       FROM toks JOIN freq USING (w) CROSS JOIN tot
      |       GROUP BY doc_id),
      |x AS (SELECT info / CAST(len AS DOUBLE) AS xent FROM pd),
      |b AS (SELECT CASE WHEN xent < 6.0 THEN 'a_lt6' WHEN xent < 8.0 THEN 'b_6_8'
      |             WHEN xent < 10.0 THEN 'c_8_10' ELSE 'd_ge10' END AS bucket, xent
      |      FROM x)
      |SELECT bucket, COUNT(*) AS n_docs,
      |  ROUND(CAST(SUM(CAST(xent AS DECIMAL(38,12))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_xent
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
}

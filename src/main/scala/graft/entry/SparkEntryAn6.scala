package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-19 analytics wave: concentration (Hoover, Rosenbluth),
  * diversity (Simpson), day-spine randomness (turning points,
  * difference-sign), robust location (Gastwirth, Yuen's trimmed t),
  * circular goodness-of-fit (Watson U² on intra-day arrival times), and
  * corpus sentence-shape profiling — in a sixth trait file (same scope
  * rules as [[SparkEntryAn1]]–[[SparkEntryAn5]]: self-typed to the
  * registry object, SQL twins beside each kernel, exact integer/decimal
  * algebra until one emission-time division, ROUND(·,6)). */
private[graft] trait SparkEntryAn6 { this: SparkEntry.type =>

  /** Hoover (Robin Hood) index of order values — the share of total
    * revenue that would have to move to equalize all orders, the
    * transfer-principle view beside [[anGini]]/[[anLorenz]]/[[anPalma]]:
    * H = Σ|v_i − T/n| / (2T) = Σ|n·v_i − T| / (2·n·T). The numerator
    * gathers |n·v − T| as exact DECIMAL(38,0) per row (no mean is ever
    * materialized as a double), ONE division at emission, ROUND(·,6). */
  private[graft] def anHoover(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val o = Tables.orders(s, dir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val tot = o.agg(count(lit(1)).as("n"), sum(d38(col("v"))).as("t"))
    o.crossJoin(broadcast(tot))
      .select(col("n"), col("t"),
        abs(d38(col("n")) * d38(col("v")) - col("t")).cast("decimal(38,0)").as("dev"))
      .groupBy(col("n"), col("t")).agg(sum(col("dev")).as("sdev"))
      .select(col("n"),
        round(col("t").cast("double") / 100.0, 2).as("total_usd"),
        round(col("sdev").cast("double") /
          (lit(2.0) * col("n").cast("double") * col("t").cast("double")), 6)
          .as("hoover"))
  }

  private[graft] lazy val anHooverSql =
    """WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |           FROM orders),
      |tot AS (SELECT COUNT(*) AS n, CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS t FROM o),
      |dv AS (SELECT n, t,
      |         CAST(ABS(CAST(n AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0)) - t) AS DECIMAL(38,0)) AS dev
      |       FROM o CROSS JOIN tot)
      |SELECT n, ROUND(CAST(t AS DOUBLE) / 100.0, 2) AS total_usd,
      |  ROUND(CAST(SUM(dev) AS DOUBLE) / (2.0 * CAST(n AS DOUBLE) * CAST(t AS DOUBLE)), 6) AS hoover
      |FROM dv GROUP BY n, t""".stripMargin

  /** Rosenbluth (Hall–Tideman) concentration index of order values —
    * the RANK-weighted complement to [[anHhi]] (which squares shares
    * and underweights many small players): HT = 1/(2·Σᵢ i·sᵢ − 1) with
    * i the descending value rank. Σ i·sᵢ = N/T where N = Σ_runs
    * v·(positions sum) is exact off ONE [[graft.operators.PrefixSum]]
    * scan (a tie run of `cnt` equal values at descending offset `lo`
    * contributes v·(cnt·lo + cnt(cnt+1)/2)); HT = T/(2N − T), one
    * division, ROUND(·,6). */
  private[graft] def anRosenbluth(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val o = Tables.orders(s, dir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val scan = graft.operators.PrefixSum.distinctRunningCounts(o, Seq("v"))
    val tot = o.agg(count(lit(1)).as("nn"), sum(d38(col("v"))).as("t"))
    val withPos = scan.crossJoin(broadcast(tot))
      .select(col("nn"), col("t"),
        (d38(col("v")) * d38(expr("cnt * (nn - cnt_cum) + cnt * (cnt + 1) div 2")))
          .cast("decimal(38,0)").as("contrib"))
    withPos.groupBy(col("nn"), col("t")).agg(sum(col("contrib")).as("nsum"))
      .select(col("nn").as("n"),
        round(col("t").cast("double") /
          (lit(2.0) * col("nsum").cast("double") - col("t").cast("double")), 6)
          .as("rosenbluth"))
  }

  private[graft] lazy val anRosenbluthSql =
    """WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |           FROM orders),
      |pv AS (SELECT v, COUNT(*) AS cnt FROM o GROUP BY v),
      |sc AS (SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum FROM pv),
      |tot AS (SELECT COUNT(*) AS nn, CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS t FROM o),
      |px AS (SELECT nn, t,
      |    CAST(CAST(v AS DECIMAL(38,0))
      |         * CAST(cnt * (nn - cnt_cum) + cnt * (cnt + 1) // 2 AS DECIMAL(38,0))
      |      AS DECIMAL(38,0)) AS contrib
      |  FROM sc CROSS JOIN tot)
      |SELECT nn AS n,
      |  ROUND(CAST(t AS DOUBLE) / (2.0 * CAST(SUM(contrib) AS DOUBLE) - CAST(t AS DOUBLE)), 6) AS rosenbluth
      |FROM px GROUP BY nn, t""".stripMargin

  /** Simpson diversity of the event-type mix — the collision
    * probability view beside [[anEntropy]] (Shannon) and [[anHhi]]
    * (share-squared): λ = Σ nᵢ(nᵢ−1) / (N(N−1)) is the EXACT
    * probability two events drawn without replacement share a type
    * (unbiased, no squared-share rounding), 1−λ the Gini–Simpson
    * diversity and 1/λ' (with λ' = Σnᵢ²/N², the biased form) the
    * effective type count. All counts exact BIGINTs, divisions at
    * emission, ROUND(·,6). */
  private[graft] def anSimpson(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val counts = Tables.events(s, dir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("c"))
    val agg = counts.agg(count(lit(1)).as("k"), sum(col("c")).as("nn"),
      sum(d38(col("c")) * (d38(col("c")) - 1)).as("s2m"),
      sum(d38(col("c")) * d38(col("c"))).as("s2"))
    agg.select(col("k").as("n_types"), col("nn").as("n"),
      round(col("s2m").cast("double") /
        (col("nn").cast("double") * (col("nn").cast("double") - lit(1.0))), 6)
        .as("simpson_lambda"),
      round(lit(1.0) - col("s2m").cast("double") /
        (col("nn").cast("double") * (col("nn").cast("double") - lit(1.0))), 6)
        .as("gini_simpson"),
      round(col("nn").cast("double") * col("nn").cast("double") /
        col("s2").cast("double"), 6).as("effective_types"))
  }

  private[graft] lazy val anSimpsonSql =
    """WITH c AS (SELECT event_type, COUNT(*) AS c FROM events GROUP BY 1),
      |ag AS (SELECT COUNT(*) AS k, CAST(SUM(c) AS BIGINT) AS nn,
      |         CAST(SUM(CAST(c AS DECIMAL(38,0)) * (CAST(c AS DECIMAL(38,0)) - 1)) AS DECIMAL(38,0)) AS s2m,
      |         CAST(SUM(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
      |       FROM c)
      |SELECT k AS n_types, nn AS n,
      |  ROUND(CAST(s2m AS DOUBLE) / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)), 6) AS simpson_lambda,
      |  ROUND(1.0 - CAST(s2m AS DOUBLE) / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)), 6) AS gini_simpson,
      |  ROUND(CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) / CAST(s2 AS DOUBLE), 6) AS effective_types
      |FROM ag""".stripMargin

  /** Kendall turning-points randomness test on daily revenue — a local
    * extremum (strictly above or strictly below BOTH neighbors) should
    * occur at 2/3 of interior days under exchangeability; trend or
    * smoothing depresses the count, oscillation inflates it. The
    * complement to [[anRunsUpdown]] (sign runs) and [[anBartelsRank]]
    * (rank vN ratio) on the same spine. T exact off one lead/lag pass
    * (ties produce NO turning point — strict inequalities, documented),
    * E = 2(n−2)/3, Var = (16n−29)/90, z ROUND(·,6). */
  private[graft] def anTurningPoints(s: SparkSession, dir: String): DataFrame = {
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wd = Window.orderBy("d")
    val t = sp
      .withColumn("pv", lag(col("rev_c"), 1).over(wd))
      .withColumn("nv", lead(col("rev_c"), 1).over(wd))
      .filter(col("pv").isNotNull && col("nv").isNotNull)
      .select(((col("rev_c") > col("pv") && col("rev_c") > col("nv")) ||
        (col("rev_c") < col("pv") && col("rev_c") < col("nv"))).cast("long").as("tp"))
    val agg = t.agg(count(lit(1)).as("interior"), sum(col("tp")).as("t"))
    val nd = (col("interior") + lit(2L)).cast("double")
    agg.select((col("interior") + lit(2L)).as("n"), col("t").as("turning_points"),
      round((col("t").cast("double") - lit(2.0) * (nd - lit(2.0)) / lit(3.0)) /
        sqrt((lit(16.0) * nd - lit(29.0)) / lit(90.0)), 6).as("z"))
  }

  private[graft] lazy val anTurningPointsSql =
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |r AS (SELECT rev_c, LAG(rev_c, 1) OVER (ORDER BY d) AS pv,
       |        LEAD(rev_c, 1) OVER (ORDER BY d) AS nv
       |      FROM sp),
       |t AS (SELECT CASE WHEN (rev_c > pv AND rev_c > nv) OR (rev_c < pv AND rev_c < nv)
       |        THEN 1 ELSE 0 END AS tp
       |      FROM r WHERE pv IS NOT NULL AND nv IS NOT NULL),
       |ag AS (SELECT COUNT(*) AS interior, CAST(SUM(tp) AS BIGINT) AS t FROM t)
       |SELECT interior + 2 AS n, t AS turning_points,
       |  ROUND((CAST(t AS DOUBLE) - 2.0 * (CAST(interior + 2 AS DOUBLE) - 2.0) / 3.0)
       |    / sqrt((16.0 * CAST(interior + 2 AS DOUBLE) - 29.0) / 90.0), 6) AS z
       |FROM ag""".stripMargin

  /** Difference-sign randomness test on daily revenue — the count of
    * strict day-over-day increases should be (n−1)/2 under
    * exchangeability; a monotone drift moves it (the cheapest trend
    * screen on the spine, the sign companion to [[anTurningPoints]]'s
    * extremum count; ties count as non-increase, documented). D exact
    * off one lag pass, E = (n−1)/2, Var = (n+1)/12, z ROUND(·,6). */
  private[graft] def anDifferenceSign(s: SparkSession, dir: String): DataFrame = {
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wd = Window.orderBy("d")
    val t = sp.withColumn("pv", lag(col("rev_c"), 1).over(wd))
      .filter(col("pv").isNotNull)
      .select((col("rev_c") > col("pv")).cast("long").as("up"))
    val agg = t.agg(count(lit(1)).as("m"), sum(col("up")).as("d_up"))
    val nd = (col("m") + lit(1L)).cast("double")
    agg.select((col("m") + lit(1L)).as("n"), col("d_up").as("n_increases"),
      round((col("d_up").cast("double") - (nd - lit(1.0)) / lit(2.0)) /
        sqrt((nd + lit(1.0)) / lit(12.0)), 6).as("z"))
  }

  private[graft] lazy val anDifferenceSignSql =
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |r AS (SELECT rev_c, LAG(rev_c, 1) OVER (ORDER BY d) AS pv FROM sp),
       |t AS (SELECT CASE WHEN rev_c > pv THEN 1 ELSE 0 END AS up
       |      FROM r WHERE pv IS NOT NULL),
       |ag AS (SELECT COUNT(*) AS m, CAST(SUM(up) AS BIGINT) AS d_up FROM t)
       |SELECT m + 1 AS n, d_up AS n_increases,
       |  ROUND((CAST(d_up AS DOUBLE) - (CAST(m + 1 AS DOUBLE) - 1.0) / 2.0)
       |    / sqrt((CAST(m + 1 AS DOUBLE) + 1.0) / 12.0), 6) AS z
       |FROM ag""".stripMargin

  /** Gastwirth robust location estimate of order values — the
    * three-order-statistic compromise (0.3·Q⅓ + 0.4·Q½ + 0.3·Q⅔)
    * beside [[anTrimmedMean]] (drops tails) and [[anWeightedMedian]];
    * high-breakdown, needs only three exact order statistics at ranks
    * ⌈n/3⌉, ⌈n/2⌉, ⌈2n/3⌉ off ONE [[graft.operators.PrefixSum]] scan
    * (lower order statistic inside tie runs — deterministic). The
    * blend 3·Q⅓ + 4·Q½ + 3·Q⅔ stays exact integer cents; ONE division
    * by 1000 (10 weights × 100 cents) at emission. */
  private[graft] def anGastwirth(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val scan = graft.operators.PrefixSum.distinctRunningCounts(o, Seq("v"))
    val tot = o.agg(count(lit(1)).as("nn"))
    val probes = scan.crossJoin(broadcast(tot))
      .withColumn("lo", col("cnt_cum") - col("cnt"))
      .withColumn("r13", expr("(nn + 2) div 3"))
      .withColumn("r12", expr("(nn + 1) div 2"))
      .withColumn("r23", expr("(2 * nn + 2) div 3"))
    val q = probes.select(col("nn"),
        when(col("lo") < col("r13") && col("cnt_cum") >= col("r13"), col("v")).as("q13"),
        when(col("lo") < col("r12") && col("cnt_cum") >= col("r12"), col("v")).as("q12"),
        when(col("lo") < col("r23") && col("cnt_cum") >= col("r23"), col("v")).as("q23"))
      .groupBy(col("nn")).agg(max(col("q13")).as("q13"), max(col("q12")).as("q12"),
        max(col("q23")).as("q23"))
    q.select(col("nn").as("n"),
      round(col("q13").cast("double") / 100.0, 2).as("q13_usd"),
      round(col("q12").cast("double") / 100.0, 2).as("median_usd"),
      round(col("q23").cast("double") / 100.0, 2).as("q23_usd"),
      round((lit(3L) * col("q13") + lit(4L) * col("q12") + lit(3L) * col("q23"))
        .cast("double") / 1000.0, 6).as("gastwirth_usd"))
  }

  private[graft] lazy val anGastwirthSql =
    """WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |           FROM orders),
      |pv AS (SELECT v, COUNT(*) AS cnt FROM o GROUP BY v),
      |sc AS (SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum FROM pv),
      |tot AS (SELECT COUNT(*) AS nn FROM o),
      |pr AS (SELECT nn, v, cnt_cum - cnt AS lo, cnt_cum,
      |         (nn + 2) // 3 AS r13, (nn + 1) // 2 AS r12, (2 * nn + 2) // 3 AS r23
      |       FROM sc CROSS JOIN tot),
      |q AS (SELECT nn,
      |        MAX(CASE WHEN lo < r13 AND cnt_cum >= r13 THEN v END) AS q13,
      |        MAX(CASE WHEN lo < r12 AND cnt_cum >= r12 THEN v END) AS q12,
      |        MAX(CASE WHEN lo < r23 AND cnt_cum >= r23 THEN v END) AS q23
      |      FROM pr GROUP BY nn)
      |SELECT nn AS n,
      |  ROUND(CAST(q13 AS DOUBLE) / 100.0, 2) AS q13_usd,
      |  ROUND(CAST(q12 AS DOUBLE) / 100.0, 2) AS median_usd,
      |  ROUND(CAST(q23 AS DOUBLE) / 100.0, 2) AS q23_usd,
      |  ROUND(CAST(3 * q13 + 4 * q12 + 3 * q23 AS DOUBLE) / 1000.0, 6) AS gastwirth_usd
      |FROM q""".stripMargin

  /** Yuen's trimmed-means t between BUILDING and AUTOMOBILE balances —
    * the heavy-tail-safe two-sample location test beside
    * [[anWelchTtest]] (raw means) and [[anMannWhitney]] (pure ranks):
    * 20% trimming each side (g = n div 5, h = n − 2g kept), trimmed
    * mean over ranks (g, n−g], winsorized sum/SS clamp the tails to the
    * boundary order statistics v₍g₊₁₎ / v₍n₋g₎ — every sum an exact
    * integer off ONE per-group [[graft.operators.PrefixSum]] scan
    * (overlap counts, the an_trimmed_mean machinery). SSDw·n = n·ssw −
    * sw² stays exact DECIMAL(38,0); d_g = SSDw/(h(h−1)), t =
    * (m̄t₁−m̄t₂)/√(d₁+d₂), Welch–Satterthwaite df — one shared IEEE
    * tree, both ROUND(·,6). */
  private[graft] def anYuenTtest(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select(col("c_mktsegment").as("g"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val scan = graft.operators.PrefixSum.distinctRunningCounts(c, Seq("g", "v"))
    val wOff = Window.orderBy(col("g")).rowsBetween(Window.unboundedPreceding, -1)
    val probes = c.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(wOff), lit(0L)))
      .withColumn("gt", expr("n div 5"))
    val j = scan.join(broadcast(probes), Seq("g"))
      .withColumn("cum", col("cnt_cum") - col("off"))
      .withColumn("lo", col("cum") - col("cnt"))
      .withColumn("r_lo", col("gt"))
      .withColumn("r_hi", col("n") - col("gt"))
      // overlap of this value run with the kept rank range (r_lo, r_hi]
      .withColumn("in_cnt", greatest(lit(0L),
        least(col("cum"), col("r_hi")) - greatest(col("lo"), col("r_lo"))))
      // the two winsorization boundary order statistics
      .withColumn("is_lo_os",
        (col("lo") < col("gt") + 1 && col("cum") >= col("gt") + 1).cast("long"))
      .withColumn("is_hi_os",
        (col("lo") < col("r_hi") && col("cum") >= col("r_hi")).cast("long"))
    val per = j.groupBy(col("g"), col("n"), col("gt"))
      .agg(sum(col("v") * col("in_cnt")).as("tsum"),
        sum((d38(col("v")) * d38(col("v")) * d38(col("in_cnt"))).cast("decimal(38,0)"))
          .as("tss"),
        max(when(col("is_lo_os") === 1, col("v"))).as("vlo"),
        max(when(col("is_hi_os") === 1, col("v"))).as("vhi"))
      .withColumn("h", col("n") - lit(2L) * col("gt"))
      // winsorized sum / sum of squares: tails clamp to the boundaries
      .withColumn("sw", col("tsum") + col("gt") * (col("vlo") + col("vhi")))
      .withColumn("ssw", (col("tss") +
        d38(col("gt")) * (d38(col("vlo")) * d38(col("vlo")) +
          d38(col("vhi")) * d38(col("vhi")))).cast("decimal(38,0)"))
      .withColumn("ssdw_n", (d38(col("n")) * col("ssw") -
        d38(col("sw")) * d38(col("sw"))).cast("decimal(38,0)"))
    // one row per group → pivot the two groups into one row
    val a = per.filter(col("g") === "BUILDING")
      .select(col("n").as("n1"), col("h").as("h1"), col("tsum").as("ts1"),
        col("ssdw_n").as("q1"), col("gt").as("g1t"))
    val b = per.filter(col("g") === "AUTOMOBILE")
      .select(col("n").as("n2"), col("h").as("h2"), col("tsum").as("ts2"),
        col("ssdw_n").as("q2"), col("gt").as("g2t"))
    val nd1 = col("n1").cast("double"); val nd2 = col("n2").cast("double")
    val h1 = col("h1").cast("double"); val h2 = col("h2").cast("double")
    val mt1 = col("ts1").cast("double") / h1
    val mt2 = col("ts2").cast("double") / h2
    val dd1 = col("q1").cast("double") / nd1 / (h1 * (h1 - lit(1.0)))
    val dd2 = col("q2").cast("double") / nd2 / (h2 * (h2 - lit(1.0)))
    val cfrac = dd1 / (dd1 + dd2)
    a.crossJoin(broadcast(b)).select(col("n1"), col("n2"), col("h1"), col("h2"),
      round((mt1 - mt2) / sqrt(dd1 + dd2), 6).as("t_yuen"),
      round(lit(1.0) / (cfrac * cfrac / (h1 - lit(1.0)) +
        (lit(1.0) - cfrac) * (lit(1.0) - cfrac) / (h2 - lit(1.0))), 6).as("df_yuen"))
  }

  private[graft] lazy val anYuenTtestSql =
    """WITH c AS (SELECT c_mktsegment AS g,
      |                  CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |           FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
      |pv AS (SELECT g, v, COUNT(*) AS cnt FROM c GROUP BY 1, 2),
      |sc AS (SELECT g, v, cnt, CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum
      |       FROM pv),
      |tv AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n, CAST(SUM(cnt) AS BIGINT) // 5 AS gt FROM pv GROUP BY g),
      |x AS (SELECT sc.g, v, cnt, cum, cum - cnt AS lo, n, gt, n - gt AS r_hi
      |      FROM sc JOIN tv USING (g)),
      |per AS (SELECT g, n, gt, MAX(n - 2 * gt) AS h,
      |    CAST(SUM(v * GREATEST(0, LEAST(cum, r_hi) - GREATEST(lo, gt))) AS BIGINT) AS tsum,
      |    CAST(SUM(CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0))
      |         * GREATEST(0, LEAST(cum, r_hi) - GREATEST(lo, gt))) AS DECIMAL(38,0)) AS tss,
      |    MAX(CASE WHEN lo < gt + 1 AND cum >= gt + 1 THEN v END) AS vlo,
      |    MAX(CASE WHEN lo < r_hi AND cum >= r_hi THEN v END) AS vhi
      |  FROM x GROUP BY g, n, gt),
      |w AS (SELECT g, n, h,
      |    tsum + gt * (vlo + vhi) AS sw,
      |    CAST(tss + CAST(gt AS DECIMAL(38,0)) * (CAST(vlo AS DECIMAL(38,0)) * CAST(vlo AS DECIMAL(38,0))
      |         + CAST(vhi AS DECIMAL(38,0)) * CAST(vhi AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ssw,
      |    tsum
      |  FROM per),
      |wq AS (SELECT g, n, h, tsum,
      |    CAST(CAST(n AS DECIMAL(38,0)) * ssw - CAST(sw AS DECIMAL(38,0)) * CAST(sw AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS ssdw_n
      |  FROM w),
      |a AS (SELECT n AS n1, h AS h1, tsum AS ts1, ssdw_n AS q1 FROM wq WHERE g = 'BUILDING'),
      |b AS (SELECT n AS n2, h AS h2, tsum AS ts2, ssdw_n AS q2 FROM wq WHERE g = 'AUTOMOBILE'),
      |dd AS (SELECT n1, n2, h1, h2,
      |    CAST(ts1 AS DOUBLE) / CAST(h1 AS DOUBLE) AS mt1,
      |    CAST(ts2 AS DOUBLE) / CAST(h2 AS DOUBLE) AS mt2,
      |    CAST(q1 AS DOUBLE) / CAST(n1 AS DOUBLE) / (CAST(h1 AS DOUBLE) * (CAST(h1 AS DOUBLE) - 1.0)) AS d1,
      |    CAST(q2 AS DOUBLE) / CAST(n2 AS DOUBLE) / (CAST(h2 AS DOUBLE) * (CAST(h2 AS DOUBLE) - 1.0)) AS d2
      |  FROM a CROSS JOIN b),
      |cf AS (SELECT n1, n2, h1, h2, mt1, mt2, d1, d2, d1 / (d1 + d2) AS c FROM dd)
      |SELECT n1, n2, h1, h2,
      |  ROUND((mt1 - mt2) / sqrt(d1 + d2), 6) AS t_yuen,
      |  ROUND(1.0 / (c * c / (CAST(h1 AS DOUBLE) - 1.0)
      |    + (1.0 - c) * (1.0 - c) / (CAST(h2 AS DOUBLE) - 1.0)), 6) AS df_yuen
      |FROM cf""".stripMargin

  /** Watson U² circular-uniformity test of INTRA-DAY event arrival
    * times — the rotation-invariant goodness-of-fit on the daily clock
    * (a load spike at midnight and one at noon score identically,
    * where plain CvM/KS depend on where the day is "cut"; the circular
    * companion to [[anCvm]]): u = micros-of-day / 86.4e9, W² =
    * Σ(u₍ᵢ₎ − (2i−1)/2n)² + 1/12n via EXACT per-tie-run closed forms
    * off one [[graft.operators.PrefixSum]] scan (run of cnt c at
    * offset lo: Σ over positions is a polynomial in c, lo — each run's
    * term one double from exact DECIMAL(38,0) integers, gathered as
    * DECIMAL(38,12), order-free), U² = W² − n(ū−½)². Both ROUND(·,6). */
  private[graft] def anWatsonU2(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val D = 86400000000L // micros per day
    val ev = Tables.events(s, dir)
      .select((unix_micros(col("ts")) -
        unix_micros(date_trunc("day", col("ts")))).as("m"))
    val scan = graft.operators.PrefixSum.distinctRunningCounts(ev, Seq("m"))
    val tot = ev.agg(count(lit(1)).as("nn"), sum(d38(col("m"))).as("sm"))
    // run term: Σ_{i=lo+1..lo+c} (2n·m − (2i−1)·D)² / (4n²D²), with
    // A = 2n·m − (2lo+1)·D: = [c·A² − 2·A·D·c(c−1) + (2D²/3)·c(c−1)(2c−1)·... ]
    // exactly c·A² − 2ADc(c−1) + (4D²/6)·c(c−1)(2c−1); every factor from
    // exact integers, ONE double per run, decimal-gathered (order-free)
    val run = scan.crossJoin(broadcast(tot))
      .withColumn("lo", col("cnt_cum") - col("cnt"))
      .withColumn("a", (lit(2L) * d38(col("nn")) * d38(col("m")) -
        (lit(2L) * d38(col("lo")) + 1) * lit(D)).cast("decimal(38,0)").cast("double"))
      .withColumn("c", col("cnt").cast("double"))
      .withColumn("term",
        ((col("a") * col("a") * col("c") -
          lit(2.0) * col("a") * lit(D.toDouble) * col("c") * (col("c") - 1.0) +
          lit(4.0) * lit(D.toDouble) * lit(D.toDouble) / lit(6.0) *
            col("c") * (col("c") - 1.0) * (lit(2.0) * col("c") - 1.0)) /
          (lit(4.0) * col("nn").cast("double") * col("nn").cast("double") *
            lit(D.toDouble) * lit(D.toDouble))).cast("decimal(38,12)"))
    val agg = run.groupBy(col("nn"), col("sm"))
      .agg(sum(col("term")).cast("decimal(38,12)").as("s"))
    val nd = col("nn").cast("double")
    val w2 = col("s").cast("double") + lit(1.0) / (lit(12.0) * nd)
    val e = (lit(2L) * col("sm") - d38(col("nn")) * lit(D)).cast("decimal(38,0)")
      .cast("double")
    val corr = e * e / (lit(4.0) * nd * lit(D.toDouble) * lit(D.toDouble))
    agg.select(col("nn").as("n"), round(w2, 6).as("w2"),
      round(w2 - corr, 6).as("watson_u2"))
  }

  private[graft] lazy val anWatsonU2Sql =
    """WITH ev AS (SELECT date_diff('microsecond', date_trunc('day', ts), ts) AS m FROM events),
      |pv AS (SELECT m, COUNT(*) AS cnt FROM ev GROUP BY m),
      |sc AS (SELECT m, cnt, CAST(SUM(cnt) OVER (ORDER BY m) AS BIGINT) AS cnt_cum FROM pv),
      |tot AS (SELECT COUNT(*) AS nn, CAST(SUM(CAST(m AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sm FROM ev),
      |run AS (SELECT nn, sm,
      |    CAST(CAST(CAST(2 AS DECIMAL(38,0)) * CAST(nn AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0))
      |      - (CAST(2 AS DECIMAL(38,0)) * CAST(cnt_cum - cnt AS DECIMAL(38,0)) + 1) * CAST(86400000000 AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE) AS a,
      |    CAST(cnt AS DOUBLE) AS c
      |  FROM sc CROSS JOIN tot),
      |tm AS (SELECT nn, sm,
      |    CAST((a * a * c
      |        - 2.0 * a * 86400000000e0 * c * (c - 1.0)
      |        + 4e0 * 86400000000e0 * 86400000000e0 / 6e0 * c * (c - 1.0) * (2.0 * c - 1.0))
      |      / (4.0 * CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) * 86400000000e0 * 86400000000e0)
      |      AS DECIMAL(38,12)) AS term
      |  FROM run),
      |ag AS (SELECT nn, sm, CAST(SUM(term) AS DECIMAL(38,12)) AS s FROM tm GROUP BY nn, sm)
      |SELECT nn AS n,
      |  ROUND(CAST(s AS DOUBLE) + 1.0 / (12.0 * CAST(nn AS DOUBLE)), 6) AS w2,
      |  ROUND(CAST(s AS DOUBLE) + 1.0 / (12.0 * CAST(nn AS DOUBLE))
      |    - CAST(CAST(CAST(2 AS DECIMAL(38,0)) * sm - CAST(nn AS DECIMAL(38,0)) * CAST(86400000000 AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE)
      |      * CAST(CAST(CAST(2 AS DECIMAL(38,0)) * sm - CAST(nn AS DECIMAL(38,0)) * CAST(86400000000 AS DECIMAL(38,0)) AS DECIMAL(38,0)) AS DOUBLE)
      |      / (4.0 * CAST(nn AS DOUBLE) * 86400000000e0 * 86400000000e0), 6) AS watson_u2
      |FROM ag""".stripMargin

  /** Corpus sentence-shape profile — the fragmentation screen beside
    * [[SparkEntryText]]'s word-level [[text_word_lengths]]/
    * [[text_lexical_richness]]: documents bucketed by sentence count
    * (split on [.!?], whitespace-only fragments dropped), with each
    * bucket's document count and mean words-per-sentence (exact token
    * and sentence totals, ONE division) — boilerplate lists and
    * run-on machine text sit in opposite tails. */
  private[graft] def textSentenceStats(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("sents", filter(split(col("text"), "[.!?]"),
        x => length(trim(x)) > 0))
      .withColumn("n_sent", size(col("sents")).cast("long"))
      .withColumn("n_words",
        size(split(trim(col("text")), "\\s+")).cast("long"))
      .filter(col("n_sent") > 0)
    docs.groupBy(col("n_sent").as("n_sentences"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("words"))
      .select(col("n_sentences"), col("n_docs"),
        round(col("words").cast("double") /
          (col("n_sentences") * col("n_docs")).cast("double"), 6)
          .as("words_per_sentence"))
      .orderBy(col("n_sentences"))
  }

  private[graft] lazy val textSentenceStatsSql =
    """WITH d AS (SELECT doc_id, text,
      |    len(list_filter(string_split_regex(text, '[.!?]'), x -> len(trim(x)) > 0)) AS n_sent,
      |    len(string_split_regex(trim(text), '\s+')) AS n_words
      |  FROM documents),
      |f AS (SELECT CAST(n_sent AS BIGINT) AS n_sentences, CAST(n_words AS BIGINT) AS n_words
      |      FROM d WHERE n_sent > 0)
      |SELECT n_sentences, COUNT(*) AS n_docs,
      |  ROUND(CAST(SUM(n_words) AS DOUBLE) / CAST(n_sentences * COUNT(*) AS DOUBLE), 6) AS words_per_sentence
      |FROM f GROUP BY n_sentences ORDER BY n_sentences""".stripMargin
}

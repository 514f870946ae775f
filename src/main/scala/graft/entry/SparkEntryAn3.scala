package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.etl.{Clean, Features, Validate}
import graft.analytics.Summary


/** An query implementations and their paired oracle SQL —
  * split out of the assembled registry ([[SparkEntry]]) purely for
  * file-size maintainability; the self-type gives every member the
  * same scope it had inside the object. Moved vals are lazy so
  * trait-linearization order can never observe an uninitialized
  * cross-family reference. */
private[graft] trait SparkEntryAn3 { this: SparkEntry.type =>


  private[graft] lazy val anItsSql = {
    def slope(p: String) =
      s"""(CAST(n$p * sxy$p - sx$p * sy$p AS DOUBLE)
         | / CAST(n$p * sxx$p - sx$p * sx$p AS DOUBLE))""".stripMargin.replace("\n", "")
    def level(p: String, sl: String) =
      s"((CAST(sy$p AS DOUBLE) - $sl * CAST(sx$p AS DOUBLE)) / CAST(n$p AS DOUBLE) + $sl * 2373.0)"
    s"""WITH daily AS ($dailySpineSql),
       |sg AS (SELECT rev_c, d,
       |         CASE WHEN day < TIMESTAMP '1998-07-01' THEN 'pre' ELSE 'post' END AS seg
       |       FROM daily),
       |m AS (SELECT seg, COUNT(*) AS n,
       |        CAST(SUM(CAST(d AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
       |        CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
       |        CAST(SUM(CAST(d AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
       |        CAST(SUM(CAST(d AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy
       |      FROM sg GROUP BY seg),
       |w AS (SELECT
       |  MAX(CASE WHEN seg = 'pre' THEN n END) AS n1, MAX(CASE WHEN seg = 'post' THEN n END) AS n2,
       |  MAX(CASE WHEN seg = 'pre' THEN sx END) AS sx1, MAX(CASE WHEN seg = 'post' THEN sx END) AS sx2,
       |  MAX(CASE WHEN seg = 'pre' THEN sy END) AS sy1, MAX(CASE WHEN seg = 'post' THEN sy END) AS sy2,
       |  MAX(CASE WHEN seg = 'pre' THEN sxx END) AS sxx1, MAX(CASE WHEN seg = 'post' THEN sxx END) AS sxx2,
       |  MAX(CASE WHEN seg = 'pre' THEN sxy END) AS sxy1, MAX(CASE WHEN seg = 'post' THEN sxy END) AS sxy2
       |  FROM m)
       |SELECT n1 AS n_pre, n2 AS n_post,
       |  ROUND(${slope("1")} / 100.0, 6) AS slope_pre,
       |  ROUND(${slope("2")} / 100.0, 6) AS slope_post,
       |  ROUND((${level("2", slope("2"))} - ${level("1", slope("1"))}) / 100.0, 6) AS level_change
       |FROM w""".stripMargin
  }

  /** Seasonal-strength F_s of the weekly cycle: 1 − Var(remainder)/
    * Var(detrended) over the an_seasonal_decompose machinery, with
    * every per-day term ROUNDED to 6 dp BEFORE squaring (two
    * correctly-rounded divisions + one subtraction per term — the
    * round makes each term's decimal repr short, so the DECIMAL(38,12)
    * variance gathers are EXACT and engine-identical). F_s near 1 =
    * the cycle explains the detrended series. */
  private[graft] def anSeasonalStrength(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyRevenueSpine(s, dir)
    val wTr = Window.orderBy(col("d")).rangeBetween(-3, 3)
    val det = daily
      .withColumn("tsum", sum(col("rev_c")).over(wTr))
      .withColumn("tn", count(lit(1)).over(wTr))
      .filter(col("tn") === 7)
      .select(col("d"), (col("rev_c") * 7 - col("tsum")).as("det7"),
        pmod(col("d"), lit(7)).as("dow"))
    val sdow = det.groupBy(col("dow"))
      .agg(sum(col("det7")).as("snum"), count(lit(1)).as("ndow"))
    val terms = det.join(broadcast(sdow), "dow")
      .withColumn("rem6", round(col("det7").cast("double") / 7.0 -
        col("snum").cast("double") / (col("ndow").cast("double") * 7.0), 6))
      .withColumn("det6", round(col("det7").cast("double") / 7.0, 6))
    def g12(c: Column) = sum(c.cast("decimal(38,12)")).cast("decimal(38,12)")
    terms.agg(count(lit(1)).as("n_days"),
        g12(col("rem6") * col("rem6")).as("ssr"),
        g12(col("det6") * col("det6")).as("ssd"))
      .select(col("n_days"),
        round(greatest(lit(0.0),
          lit(1.0) - col("ssr").cast("double") / col("ssd").cast("double")), 6)
          .as("seasonal_strength"))
  }

  private[graft] lazy val anSeasonalStrengthSql =
    s"""WITH daily AS ($dailySpineSql),
       |tr AS (SELECT d, rev_c,
       |         SUM(rev_c) OVER w7 AS tsum, COUNT(*) OVER w7 AS tn
       |       FROM daily
       |       WINDOW w7 AS (ORDER BY d RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
       |det AS (SELECT d, rev_c * 7 - tsum AS det7, d % 7 AS dow FROM tr WHERE tn = 7),
       |sd AS (SELECT dow, CAST(SUM(det7) AS BIGINT) AS snum, COUNT(*) AS ndow
       |       FROM det GROUP BY dow),
       |t AS (SELECT
       |        ROUND(CAST(det7 AS DOUBLE) / 7.0
       |          - CAST(snum AS DOUBLE) / (CAST(ndow AS DOUBLE) * 7.0), 6) AS rem6,
       |        ROUND(CAST(det7 AS DOUBLE) / 7.0, 6) AS det6
       |      FROM det JOIN sd USING (dow))
       |SELECT COUNT(*) AS n_days,
       |  ROUND(GREATEST(0.0, 1.0
       |    - CAST(CAST(SUM(CAST(rem6 * rem6 AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS DOUBLE)
       |      / CAST(CAST(SUM(CAST(det6 * det6 AS DECIMAL(38,12))) AS DECIMAL(38,12)) AS DOUBLE)), 6)
       |    AS seasonal_strength
       |FROM t""".stripMargin

  /** 10%-trimmed mean per order priority — the robust location estimate
    * that DROPS both tails (an_winsorize clips them): rank range
    * (n/10, n − n/10] resolved against the same raw-row PrefixSum scan,
    * per-value overlap counts keep the trimmed sum EXACT (no row ever
    * re-sorts), one division at emission. */
  private[graft] def anTrimmedMean(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderpriority").as("g"),
      (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val scan = graft.operators.PrefixSum.distinctRunningCounts(o, Seq("g", "v"))
    val wOff = Window.orderBy(col("g")).rowsBetween(Window.unboundedPreceding, -1)
    val probes = o.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(wOff), lit(0L)))
      .withColumn("r_lo", expr("n div 10"))
      .withColumn("r_hi", expr("n - (n div 10)"))
    scan.join(broadcast(probes), Seq("g"))
      .withColumn("cum", col("cnt_cum") - col("off"))
      .withColumn("in_cnt", greatest(lit(0L),
        least(col("cum"), col("r_hi")) - greatest(col("cum") - col("cnt"), col("r_lo"))))
      .filter(col("in_cnt") > 0)
      .groupBy(col("g").as("o_orderpriority"))
      .agg(max(col("r_hi") - col("r_lo")).as("n_kept"),
        sum(col("v") * col("in_cnt")).as("tsum"))
      .select(col("o_orderpriority"), col("n_kept"),
        (col("tsum").cast("double") / col("n_kept").cast("double") / 100.0)
          .as("trimmed_mean"))
      .orderBy(col("o_orderpriority"))
  }

  private[graft] lazy val anTrimmedMeanSql =
    """WITH o AS (SELECT o_orderpriority AS g,
      |                  CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |           FROM orders),
      |pv AS (SELECT g, v, COUNT(*) AS cnt FROM o GROUP BY 1, 2),
      |cv AS (SELECT g, v, cnt, CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum
      |       FROM pv),
      |tv AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM pv GROUP BY g),
      |x AS (SELECT cv.g, v, GREATEST(0,
      |        LEAST(cum, n - n // 10) - GREATEST(cum - cnt, n // 10)) AS in_cnt,
      |        n - 2 * (n // 10) AS n_kept
      |      FROM cv JOIN tv USING (g))
      |SELECT g AS o_orderpriority, CAST(MAX(n_kept) AS BIGINT) AS n_kept,
      |  CAST(CAST(SUM(v * in_cnt) AS BIGINT) AS DOUBLE)
      |    / CAST(MAX(n_kept) AS DOUBLE) / 100.0 AS trimmed_mean
      |FROM x WHERE in_cnt > 0 GROUP BY g ORDER BY g""".stripMargin

  /** Bowley quartile skewness per order priority: (Q1 + Q3 − 2·Q2)/
    * (Q3 − Q1) over type-1 quartiles (exact order statistics at rank
    * ⌈q·n⌉ off the PrefixSum scan) — numerator and denominator are
    * exact integer cents, ONE IEEE division. The outlier-immune
    * asymmetry measure where moment skewness saturates. */
  private[graft] def anQuartileSkew(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderpriority").as("g"),
      (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val scan = graft.operators.PrefixSum.distinctRunningCounts(o, Seq("g", "v"))
    val wOff = Window.orderBy(col("g")).rowsBetween(Window.unboundedPreceding, -1)
    val probes = o.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(wOff), lit(0L)))
      .withColumn("r1", expr("(n + 3) div 4"))
      .withColumn("r2", expr("(n + 1) div 2"))
      .withColumn("r3", expr("(3 * n + 3) div 4"))
    def hit(r: String) = col("cum") >= col(r) && col("cum") - col("cnt") < col(r)
    scan.join(broadcast(probes), Seq("g"))
      .withColumn("cum", col("cnt_cum") - col("off"))
      .filter(hit("r1") || hit("r2") || hit("r3"))
      .groupBy(col("g").as("o_orderpriority"))
      .agg(max(when(hit("r1"), col("v"))).as("q1_c"),
        max(when(hit("r2"), col("v"))).as("q2_c"),
        max(when(hit("r3"), col("v"))).as("q3_c"))
      .select(col("o_orderpriority"),
        (col("q1_c") / 100.0).as("q1"), (col("q2_c") / 100.0).as("q2"),
        (col("q3_c") / 100.0).as("q3"),
        ((col("q1_c") + col("q3_c") - col("q2_c") * 2).cast("double") /
          (col("q3_c") - col("q1_c")).cast("double")).as("bowley_skew"))
      .orderBy(col("o_orderpriority"))
  }

  private[graft] lazy val anQuartileSkewSql =
    """WITH o AS (SELECT o_orderpriority AS g,
      |                  CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |           FROM orders),
      |pv AS (SELECT g, v, COUNT(*) AS cnt FROM o GROUP BY 1, 2),
      |cv AS (SELECT g, v, cnt, CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum
      |       FROM pv),
      |tv AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM pv GROUP BY g),
      |b AS (SELECT cv.g,
      |        CAST(MAX(CASE WHEN cum >= (n+3)//4 AND cum - cnt < (n+3)//4 THEN v END) AS BIGINT) AS q1_c,
      |        CAST(MAX(CASE WHEN cum >= (n+1)//2 AND cum - cnt < (n+1)//2 THEN v END) AS BIGINT) AS q2_c,
      |        CAST(MAX(CASE WHEN cum >= (3*n+3)//4 AND cum - cnt < (3*n+3)//4 THEN v END) AS BIGINT) AS q3_c
      |      FROM cv JOIN tv USING (g) GROUP BY cv.g)
      |SELECT g AS o_orderpriority, q1_c / 100.0 AS q1, q2_c / 100.0 AS q2, q3_c / 100.0 AS q3,
      |  CAST(q1_c + q3_c - q2_c * 2 AS DOUBLE) / CAST(q3_c - q1_c AS DOUBLE) AS bowley_skew
      |FROM b ORDER BY g""".stripMargin

  /** Up/down streak census of daily revenue: gaps-islands over the
    * sign of the day-over-day change (island id = idx − row_number
    * within the sign class), longest run each way plus up/down day
    * totals — all exact integer machinery on the calendar-bounded
    * spine. The momentum footprint an_runs_test's one z-number
    * summarizes away. */
  private[graft] def anStreaks(s: SparkSession, dir: String): DataFrame = {
    val diffs = dailyRevenueSpine(s, dir)
      .withColumn("chg", col("rev_c") - lag(col("rev_c"), 1).over(Window.orderBy(col("d"))))
      .filter(col("chg").isNotNull && col("chg") =!= 0)
      .withColumn("up", (col("chg") > 0).cast("int"))
      .withColumn("idx", row_number().over(Window.orderBy(col("d"))).cast("long"))
      .withColumn("grp", col("idx") - row_number().over(
        Window.partitionBy(col("up")).orderBy(col("idx"))).cast("long"))
    val runs = diffs.groupBy(col("up"), col("grp")).agg(count(lit(1)).as("len"))
    runs.agg(
        max(when(col("up") === 1, col("len"))).as("longest_up"),
        max(when(col("up") === 0, col("len"))).as("longest_down"),
        sum(when(col("up") === 1, col("len")).otherwise(0L)).as("n_up_days"),
        sum(when(col("up") === 0, col("len")).otherwise(0L)).as("n_down_days"),
        sum(when(col("up") === 1 && col("len") >= 3, 1L).otherwise(0L)).as("n_up_streaks_ge3"))
  }

  private[graft] lazy val anStreaksSql =
    s"""WITH daily AS ($dailySpineSql),
       |ch AS (SELECT d, rev_c - LAG(rev_c) OVER (ORDER BY d) AS chg FROM daily),
       |f AS (SELECT d, CASE WHEN chg > 0 THEN 1 ELSE 0 END AS up,
       |        CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS idx
       |      FROM ch WHERE chg IS NOT NULL AND chg <> 0),
       |g AS (SELECT up, idx - CAST(ROW_NUMBER() OVER (PARTITION BY up ORDER BY idx) AS BIGINT) AS grp
       |      FROM f),
       |runs AS (SELECT up, grp, COUNT(*) AS len FROM g GROUP BY up, grp)
       |SELECT CAST(MAX(CASE WHEN up = 1 THEN len END) AS BIGINT) AS longest_up,
       |  CAST(MAX(CASE WHEN up = 0 THEN len END) AS BIGINT) AS longest_down,
       |  CAST(SUM(CASE WHEN up = 1 THEN len ELSE 0 END) AS BIGINT) AS n_up_days,
       |  CAST(SUM(CASE WHEN up = 0 THEN len ELSE 0 END) AS BIGINT) AS n_down_days,
       |  CAST(SUM(CASE WHEN up = 1 AND len >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_up_streaks_ge3
       |FROM runs""".stripMargin

  /** Customer-base turnover 1996 → 1997: retained / added / churned
    * counts from one distinct-flag aggregate over orders, set Jaccard
    * as the one-number stability index. The set-dynamics companion to
    * an_mcnemar's significance test on the same transition. */
  private[graft] def anTurnover(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").isin(1996, 1997))
      .groupBy(col("o_custkey"))
      .agg(max(when(col("yr") === 1996, 1).otherwise(0)).as("a96"),
        max(when(col("yr") === 1997, 1).otherwise(0)).as("a97"))
      .agg(
        sum(when(col("a96") === 1 && col("a97") === 1, 1L).otherwise(0L)).as("retained"),
        sum(when(col("a96") === 0 && col("a97") === 1, 1L).otherwise(0L)).as("added"),
        sum(when(col("a96") === 1 && col("a97") === 0, 1L).otherwise(0L)).as("churned"))
      .select(col("retained"), col("added"), col("churned"),
        (col("retained").cast("double") /
          (col("retained") + col("added") + col("churned")).cast("double")).as("jaccard"))

  private[graft] lazy val anTurnoverSql =
    """WITH f AS (SELECT o_custkey,
      |    MAX(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS a96,
      |    MAX(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END) AS a97
      |  FROM orders WHERE year(o_orderdate) IN (1996, 1997) GROUP BY o_custkey)
      |SELECT
      |  CAST(SUM(CASE WHEN a96 = 1 AND a97 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS retained,
      |  CAST(SUM(CASE WHEN a96 = 0 AND a97 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS added,
      |  CAST(SUM(CASE WHEN a96 = 1 AND a97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS churned,
      |  CAST(SUM(CASE WHEN a96 = 1 AND a97 = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS jaccard
      |FROM f""".stripMargin

  /** Benjamini–Hochberg FDR control over the per-segment churn-rate
    * z-tests (each segment vs the pooled rest): p-values through the
    * Bowling logistic approximation of Φ (closed-form exp — the SAME
    * expression both engines, ROUND 6; exact normal CDFs need erf,
    * which neither engine guarantees bit-identical), BH step-up on the
    * ROUNDED p with (p, segment) deterministic ranking. The multiple-
    * comparisons gate an_abtest's single test doesn't give. */
  private[graft] def anBhFdr(s: SparkSession, dir: String): DataFrame = {
    val grp = churnLabeled(s, dir).groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_g"), sum(col("g1")).as("k_g"))
    val tot = grp.agg(sum(col("n_g")).as("n"), sum(col("k_g")).as("k"))
    val z = {
      val p1 = col("k_g").cast("double") / col("n_g").cast("double")
      val p0 = (col("k") - col("k_g")).cast("double") / (col("n") - col("n_g")).cast("double")
      val pp = col("k").cast("double") / col("n").cast("double")
      (p1 - p0) / sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n_g").cast("double") +
          lit(1.0) / (col("n") - col("n_g")).cast("double")))
    }
    val phi = (x: Column) => lit(1.0) / (lit(1.0) + exp(lit(-1.5976) * x -
      lit(0.070566) * x * x * x))
    val scored = grp.crossJoin(broadcast(tot))
      .withColumn("z", round(z, 6))
      .withColumn("p", round(lit(2.0) * (lit(1.0) - phi(abs(col("z")))), 6))
    val m = 5
    scored
      .withColumn("rnk", row_number().over(Window.orderBy(col("p"), col("c_mktsegment"))).cast("long"))
      .withColumn("thresh", round(col("rnk").cast("double") * 0.05 / m, 6))
      .withColumn("cutoff", max(when(col("p") <= col("thresh"), col("rnk")))
        .over(Window.partitionBy()))
      .select(col("c_mktsegment"), col("z"), col("p"), col("rnk"), col("thresh"),
        (col("cutoff").isNotNull && col("rnk") <= col("cutoff")).as("rejected"))
      .orderBy(col("rnk"))
  }

  private[graft] lazy val anBhFdrSql =
    s"""WITH lab AS ($churnLabeledSql),
       |g AS (SELECT c_mktsegment, COUNT(*) AS n_g, CAST(SUM(g1) AS BIGINT) AS k_g
       |      FROM lab GROUP BY 1),
       |t AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(k_g) AS BIGINT) AS k FROM g),
       |zs AS (SELECT c_mktsegment,
       |    ROUND((CAST(k_g AS DOUBLE) / CAST(n_g AS DOUBLE)
       |        - CAST(k - k_g AS DOUBLE) / CAST(n - n_g AS DOUBLE))
       |      / sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
       |        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
       |        * (1.0 / CAST(n_g AS DOUBLE) + 1.0 / CAST(n - n_g AS DOUBLE))), 6) AS z
       |  FROM g CROSS JOIN t),
       |ps AS (SELECT c_mktsegment, z,
       |    ROUND(2.0 * (1.0 - 1.0 / (1.0 + exp(-1.5976 * ABS(z)
       |      - 0.070566 * ABS(z) * ABS(z) * ABS(z)))), 6) AS p
       |  FROM zs),
       |rk AS (SELECT c_mktsegment, z, p,
       |    CAST(ROW_NUMBER() OVER (ORDER BY p, c_mktsegment) AS BIGINT) AS rnk
       |  FROM ps),
       |th AS (SELECT *, ROUND(CAST(rnk AS DOUBLE) * 0.05 / 5, 6) AS thresh FROM rk),
       |co AS (SELECT MAX(CASE WHEN p <= thresh THEN rnk END) AS cutoff FROM th)
       |SELECT c_mktsegment, z, p, rnk, thresh,
       |  (cutoff IS NOT NULL AND rnk <= cutoff) AS rejected
       |FROM th CROSS JOIN co ORDER BY rnk""".stripMargin

  /** Variance inflation factors for the three daily series (revenue,
    * line volume, order breadth): VIF_j = 1/(1−R²_j|rest) with R² from
    * the pairwise correlations in closed 3-variable form — the
    * collinearity screen run before any multi-feature regression. Same
    * exact moment pass as an_partial_corr; shared expression tree,
    * ROUND 6. */
  private[graft] def anVif(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100).cast("bigint").as("x"),
        count(lit(1)).as("y"),
        countDistinct(col("l_orderkey")).as("z"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    val m = daily.agg(count(lit(1)).as("n"),
      sum(d(col("x"))).as("sx"), sum(d(col("y"))).as("sy"), sum(d(col("z"))).as("sz"),
      sum(d(col("x")) * d(col("x"))).as("sxx"), sum(d(col("y")) * d(col("y"))).as("syy"),
      sum(d(col("z")) * d(col("z"))).as("szz"),
      sum(d(col("x")) * d(col("y"))).as("sxy"), sum(d(col("x")) * d(col("z"))).as("sxz"),
      sum(d(col("y")) * d(col("z"))).as("syz"))
    def r(sab: Column, sa: Column, sb: Column, saa: Column, sbb: Column) =
      (col("n") * sab - sa * sb).cast("double") /
        (sqrt((col("n") * saa - sa * sa).cast("double")) *
          sqrt((col("n") * sbb - sb * sb).cast("double")))
    val base = m
      .withColumn("rxy", r(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy")))
      .withColumn("rxz", r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz")))
      .withColumn("ryz", r(col("syz"), col("sy"), col("sz"), col("syy"), col("szz")))
    def r2(rab: Column, rac: Column, rbc: Column) =
      (rab * rab + rac * rac - lit(2.0) * rab * rac * rbc) / (lit(1.0) - rbc * rbc)
    Seq(("revenue", (b: DataFrame) => r2(col("rxy"), col("rxz"), col("ryz"))),
        ("volume", (b: DataFrame) => r2(col("rxy"), col("ryz"), col("rxz"))),
        ("breadth", (b: DataFrame) => r2(col("rxz"), col("ryz"), col("rxy"))))
      .map { case (name, f) =>
        base.select(lit(name).as("series"),
          round(f(base), 6).as("r2_on_rest"),
          round(lit(1.0) / (lit(1.0) - f(base)), 6).as("vif"))
      }.reduce(_.unionAll(_)).orderBy(col("series"))
  }

  private[graft] lazy val anVifSql = {
    def r(ab: String, a: String, b: String, aa: String, bb: String) =
      s"""(CAST(n * s$ab - s$a * s$b AS DOUBLE)
         | / (sqrt(CAST(n * s$aa - s$a * s$a AS DOUBLE)) * sqrt(CAST(n * s$bb - s$b * s$b AS DOUBLE))))""".stripMargin.replace("\n", "")
    def r2(ab: String, ac: String, bc: String) =
      s"(($ab * $ab + $ac * $ac - 2.0 * $ab * $ac * $bc) / (1.0 - $bc * $bc))"
    val rxy = r("xy", "x", "y", "xx", "yy")
    val rxz = r("xz", "x", "z", "xx", "zz")
    val ryz = r("yz", "y", "z", "yy", "zz")
    def one(name: String, e: String) =
      s"SELECT '$name' AS series, ROUND($e, 6) AS r2_on_rest, ROUND(1.0 / (1.0 - $e), 6) AS vif FROM rr"
    s"""WITH daily AS (SELECT
       |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS x,
       |    COUNT(*) AS y, COUNT(DISTINCT l_orderkey) AS z
       |  FROM lineitem GROUP BY date_trunc('day', l_shipdate)),
       |rr AS (SELECT COUNT(*) AS n,
       |  CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
       |  CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
       |  CAST(SUM(CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sz,
       |  CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
       |  CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
       |  CAST(SUM(CAST(z AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS szz,
       |  CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
       |  CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxz,
       |  CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syz
       |  FROM daily)
       |SELECT * FROM (
       |${one("revenue", r2(rxy, rxz, ryz))}
       |UNION ALL
       |${one("volume", r2(rxy, ryz, rxz))}
       |UNION ALL
       |${one("breadth", r2(rxz, ryz, rxy))}
       |) u ORDER BY series""".stripMargin
  }

  /** Median survival time off the Kaplan–Meier churn curve: the
    * earliest event time where the ROUNDED survival estimate drops to
    * ≤ 0.5 (the compare runs on the same 6-dp value both engines
    * computed — no fresh float boundary), with the curve value and
    * risk-set size at that point. The one-number summary a retention
    * team reads off an_kaplan_meier's full curve. */
  private[graft] def anMedianSurvival(s: SparkSession, dir: String): DataFrame = {
    val km = anKaplanMeier(s, dir)
    km.filter(col("surv") <= 0.5)
      .orderBy(col("t")).limit(1)
      .select(col("t").as("median_t"), col("n_risk"), col("d"), col("surv"))
  }

  private[graft] lazy val anMedianSurvivalSql =
    // strip ONLY the trailing ORDER BY (a blanket replace would also
    // hit the window's OVER (ORDER BY t ...) and break the cumulative
    // product frame)
    s"""WITH km AS (${anKaplanMeierSql.replace("FROM r WHERE d > 0 ORDER BY t", "FROM r WHERE d > 0")})
       |SELECT t AS median_t, n_risk, d, surv FROM km
       |WHERE surv <= 0.5 ORDER BY t LIMIT 1""".stripMargin

  /** Log-rank hazard ratio between the BUILDING and AUTOMOBILE churn
    * cohorts: HR = (O₁/E₁)/(O₀/E₀) with observed deaths exact integers
    * and expected deaths the same DECIMAL(38,18) risk-set gathers as
    * an_logrank, plus ln(HR) and its SE √(1/E₁+1/E₀) (ROUND 6). The
    * effect-SIZE companion to an_logrank's significance z. */
  private[graft] def anHazardRatio(s: SparkSession, dir: String): DataFrame = {
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
    scan.crossJoin(broadcast(tot))
      .filter(col("d1") + col("d0") > 0)
      .agg(sum(col("d1")).as("o1"), sum(col("d0")).as("o0"),
        gather(dt * n1 / nt).as("e1"),
        gather(dt * n0 / nt).as("e0"))
      .select(col("o1"), col("o0"),
        round(col("e1").cast("double"), 6).as("e1"),
        round(col("e0").cast("double"), 6).as("e0"),
        round((col("o1").cast("double") / col("e1").cast("double")) /
          (col("o0").cast("double") / col("e0").cast("double")), 6).as("hazard_ratio"),
        round(log((col("o1").cast("double") / col("e1").cast("double")) /
          (col("o0").cast("double") / col("e0").cast("double"))), 6).as("ln_hr"),
        round(sqrt(lit(1.0) / col("e1").cast("double") +
          lit(1.0) / col("e0").cast("double")), 6).as("se_ln_hr"))
  }

  private[graft] lazy val anHazardRatioSql =
    """WITH a AS (SELECT MAX(o_orderdate) AS mx FROM orders),
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
      |agg AS (SELECT
      |    CAST(SUM(d1) AS BIGINT) AS o1, CAST(SUM(d0) AS BIGINT) AS o0,
      |    CAST(SUM(CAST(CAST(d1 + d0 AS DOUBLE)
      |      * CAST(n1t - (c1_cum - c1) AS DOUBLE)
      |      / (CAST(n1t - (c1_cum - c1) AS DOUBLE) + CAST(n0t - (c0_cum - c0) AS DOUBLE))
      |      AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS e1,
      |    CAST(SUM(CAST(CAST(d1 + d0 AS DOUBLE)
      |      * CAST(n0t - (c0_cum - c0) AS DOUBLE)
      |      / (CAST(n1t - (c1_cum - c1) AS DOUBLE) + CAST(n0t - (c0_cum - c0) AS DOUBLE))
      |      AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS e0
      |  FROM sc CROSS JOIN tt WHERE d1 + d0 > 0)
      |SELECT o1, o0, ROUND(CAST(e1 AS DOUBLE), 6) AS e1, ROUND(CAST(e0 AS DOUBLE), 6) AS e0,
      |  ROUND((CAST(o1 AS DOUBLE) / CAST(e1 AS DOUBLE))
      |    / (CAST(o0 AS DOUBLE) / CAST(e0 AS DOUBLE)), 6) AS hazard_ratio,
      |  ROUND(ln((CAST(o1 AS DOUBLE) / CAST(e1 AS DOUBLE))
      |    / (CAST(o0 AS DOUBLE) / CAST(e0 AS DOUBLE))), 6) AS ln_hr,
      |  ROUND(sqrt(1.0 / CAST(e1 AS DOUBLE) + 1.0 / CAST(e0 AS DOUBLE)), 6) AS se_ln_hr
      |FROM agg""".stripMargin

  /** Two-period Poisson rate test on order arrivals (1998 H1 vs H2):
    * z = (λ₁−λ₂)/√(k₁/t₁² + k₂/t₂²) from exact event counts and fixed
    * integer exposure windows — the incident/arrival-rate change test
    * beside an_abtest's proportion z. One filtered aggregate. */
  private[graft] def anPoissonRate(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .withColumn("h", when(col("o_orderdate") >= ts("1998-01-01") &&
        col("o_orderdate") < ts("1998-07-01"), 1)
        .when(col("o_orderdate") >= ts("1998-07-01") &&
          col("o_orderdate") < ts("1999-01-01"), 2))
      .filter(col("h").isNotNull)
    val t1 = 181.0; val t2 = 184.0
    o.agg(sum(when(col("h") === 1, 1L).otherwise(0L)).as("k1"),
        sum(when(col("h") === 2, 1L).otherwise(0L)).as("k2"))
      .select(col("k1"), col("k2"),
        round(col("k1").cast("double") / t1, 6).as("rate1"),
        round(col("k2").cast("double") / t2, 6).as("rate2"),
        round((col("k1").cast("double") / t1 - col("k2").cast("double") / t2) /
          sqrt(col("k1").cast("double") / (t1 * t1) +
            col("k2").cast("double") / (t2 * t2)), 6).as("z"))
  }

  private[graft] lazy val anPoissonRateSql =
    """WITH h AS (SELECT CASE
      |    WHEN o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1998-07-01' THEN 1
      |    WHEN o_orderdate >= TIMESTAMP '1998-07-01' AND o_orderdate < TIMESTAMP '1999-01-01' THEN 2
      |  END AS h FROM orders),
      |t AS (SELECT CAST(SUM(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS k1,
      |             CAST(SUM(CASE WHEN h = 2 THEN 1 ELSE 0 END) AS BIGINT) AS k2
      |      FROM h WHERE h IS NOT NULL)
      |SELECT k1, k2,
      |  ROUND(CAST(k1 AS DOUBLE) / 181.0, 6) AS rate1,
      |  ROUND(CAST(k2 AS DOUBLE) / 184.0, 6) AS rate2,
      |  ROUND((CAST(k1 AS DOUBLE) / 181.0 - CAST(k2 AS DOUBLE) / 184.0)
      |    / sqrt(CAST(k1 AS DOUBLE) / (181.0 * 181.0)
      |         + CAST(k2 AS DOUBLE) / (184.0 * 184.0)), 6) AS z
      |FROM t""".stripMargin

  /** Second-digit Benford screen on order totals — the harder-to-game
    * companion to an_benford's first digit: the second digit comes from
    * exact integer cents arithmetic (leading-two-digit prefix via
    * floor-log scaling done in INTEGERS: repeated division — here via
    * string of the exact cents value, digit 2 of the digit string),
    * expected P(d) = Σ_k log10(1+1/(10k+d)) as fixed literals, χ²
    * distance from exact counts, ROUND 6. */
  private[graft] def anBenford2(s: SparkSession, dir: String): DataFrame = {
    // exact second significant digit: cents is an exact integer; its
    // decimal digit string is engine-identical (no float formatting)
    val digits = Tables.orders(s, dir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("c"))
      .filter(col("c") >= 10)
      .select(substring(col("c").cast("string"), 2, 1).cast("int").as("d2"))
    val expected = (0 to 9).map { d =>
      d -> (1 to 9).map(k => math.log10(1.0 + 1.0 / (10 * k + d))).sum
    }
    val expDf = expected.map { case (d, p) =>
      s.range(1).select(lit(d).as("d2"), lit(p).as("p_exp"))
    }.reduce(_.unionAll(_))
    val counts = digits.groupBy(col("d2")).agg(count(lit(1)).as("n_d"))
    val tot = counts.agg(sum(col("n_d")).as("n"))
    counts.join(broadcast(expDf), Seq("d2")).crossJoin(broadcast(tot))
      .select(col("d2"), col("n_d"),
        (col("n_d").cast("double") / col("n").cast("double")).as("p_obs"),
        round(col("p_exp"), 6).as("p_exp"),
        round((col("n_d").cast("double") / col("n").cast("double") - col("p_exp")) *
          (col("n_d").cast("double") / col("n").cast("double") - col("p_exp")) /
          col("p_exp") * col("n").cast("double"), 6).as("chi2_term"))
      .orderBy(col("d2"))
  }

  private[graft] lazy val anBenford2Sql = {
    val exp = (0 to 9).map { d =>
      val p = (1 to 9).map(k => math.log10(1.0 + 1.0 / (10 * k + d))).sum
      s"SELECT $d AS d2, CAST($p AS DOUBLE) AS p_exp"
    }.mkString(" UNION ALL ")
    s"""WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS c
       |  FROM orders),
       |d AS (SELECT CAST(substr(CAST(c AS VARCHAR), 2, 1) AS INT) AS d2
       |      FROM c WHERE c >= 10),
       |cnt AS (SELECT d2, COUNT(*) AS n_d FROM d GROUP BY d2),
       |t AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n FROM cnt),
       |e AS ($exp)
       |SELECT cnt.d2, n_d,
       |  CAST(n_d AS DOUBLE) / CAST(n AS DOUBLE) AS p_obs,
       |  ROUND(p_exp, 6) AS p_exp,
       |  ROUND((CAST(n_d AS DOUBLE) / CAST(n AS DOUBLE) - p_exp)
       |    * (CAST(n_d AS DOUBLE) / CAST(n AS DOUBLE) - p_exp)
       |    / p_exp * CAST(n AS DOUBLE), 6) AS chi2_term
       |FROM cnt JOIN e ON cnt.d2 = e.d2 CROSS JOIN t
       |ORDER BY cnt.d2""".stripMargin
  }

  /** Peaks-over-threshold mean-excess analysis of order totals: the
    * exact p95 cent threshold off the PrefixSum distinct-value scan,
    * exceedance count, mean excess (exact BIGINT sum ÷ count), and the
    * implied exponential tail rate 1/mean_excess — the extreme-value
    * triage beside an_hill_tail's power-law index and an_gumbel's
    * block maxima. */
  private[graft] def anMeanExcess(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(lit(1).as("g"), (col("o_totalprice").cast("decimal(24,2)") * 100)
        .cast("bigint").as("v"))
    val scan = graft.operators.PrefixSum.distinctRunningCounts(o, Seq("g", "v"))
    val probes = o.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .withColumn("r95", expr("(19 * n + 19) div 20"))
    val hit = col("cnt_cum") >= col("r95") && col("cnt_cum") - col("cnt") < col("r95")
    val thr = scan.join(broadcast(probes), Seq("g"))
      .filter(hit).groupBy(col("g")).agg(max(col("v")).as("u"))
    o.join(broadcast(thr), Seq("g"))
      .filter(col("v") > col("u"))
      .groupBy(col("u"))
      .agg(count(lit(1)).as("n_exceed"), sum(col("v") - col("u")).as("excess_sum"))
      .select((col("u") / 100.0).as("threshold"),
        col("n_exceed"),
        (col("excess_sum").cast("double") / col("n_exceed").cast("double") / 100.0)
          .as("mean_excess"),
        round(col("n_exceed").cast("double") * 100.0 /
          col("excess_sum").cast("double"), 6).as("exp_rate"))
  }

  private[graft] lazy val anMeanExcessSql =
    """WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |pv AS (SELECT v, COUNT(*) AS cnt FROM o GROUP BY v),
      |cv AS (SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cum FROM pv),
      |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM pv),
      |u AS (SELECT CAST(MAX(CASE WHEN cum >= (19*n+19)//20 AND cum - cnt < (19*n+19)//20
      |        THEN v END) AS BIGINT) AS u
      |      FROM cv CROSS JOIN t),
      |x AS (SELECT o.v, u.u FROM o CROSS JOIN u WHERE o.v > u.u)
      |SELECT MAX(u) / 100.0 AS threshold, COUNT(*) AS n_exceed,
      |  CAST(CAST(SUM(v - u) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0 AS mean_excess,
      |  ROUND(CAST(COUNT(*) AS DOUBLE) * 100.0 / CAST(CAST(SUM(v - u) AS BIGINT) AS DOUBLE), 6) AS exp_rate
      |FROM x""".stripMargin

  /** ABC inventory classification of parts by revenue: cumulative
    * revenue share off ONE PrefixSum scan over the part-revenue
    * aggregate (A ≤ 80%, B ≤ 95%, C rest — boundaries compared in
    * EXACT integers, share·total cross-multiplied), per-class part
    * counts and revenue. The classic Pareto workhorse an_pareto's
    * crossing points summarize. */
  private[graft] def anAbc(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100).cast("bigint").as("rc"))
      // descending-revenue order via ascending key (-rc, partkey):
      // PrefixSum scans ascending, so feed it the negated measure
      .select(col("l_partkey"), col("rc"), (-col("rc")).as("nrc"))
    val scan = graft.operators.PrefixSum.withRunningTotals(
      rev.select(col("nrc"), col("l_partkey"), col("rc")), Seq("nrc", "l_partkey"), Seq("rc"))
    val tot = scan.agg(max(col("rc_cum")).as("total"))
    scan.crossJoin(broadcast(tot))
      .withColumn("cls",
        when(col("rc_cum").cast("decimal(38,0)") * 100 <=
          col("total").cast("decimal(38,0)") * 80, "A")
          .when(col("rc_cum").cast("decimal(38,0)") * 100 <=
            col("total").cast("decimal(38,0)") * 95, "B")
          .otherwise(lit("C")))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rc")).as("rev_cents"))
      .select(col("cls"), col("n_parts"), col("rev_cents"),
        (col("rev_cents") / 100.0).as("revenue"))
      .orderBy(col("cls"))
  }

  private[graft] lazy val anAbcSql =
    """WITH rev AS (SELECT l_partkey,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rc
      |  FROM lineitem GROUP BY l_partkey),
      |sc AS (SELECT rc,
      |         CAST(SUM(rc) OVER (ORDER BY -rc, l_partkey) AS BIGINT) AS rc_cum
      |       FROM rev),
      |t AS (SELECT CAST(SUM(rc) AS BIGINT) AS total FROM rev),
      |c AS (SELECT rc,
      |        CASE WHEN CAST(rc_cum AS DECIMAL(38,0)) * 100 <= CAST(total AS DECIMAL(38,0)) * 80 THEN 'A'
      |             WHEN CAST(rc_cum AS DECIMAL(38,0)) * 100 <= CAST(total AS DECIMAL(38,0)) * 95 THEN 'B'
      |             ELSE 'C' END AS cls
      |      FROM sc CROSS JOIN t)
      |SELECT cls, COUNT(*) AS n_parts, CAST(SUM(rc) AS BIGINT) AS rev_cents,
      |  CAST(SUM(rc) AS BIGINT) / 100.0 AS revenue
      |FROM c GROUP BY cls ORDER BY cls""".stripMargin

  /** XmR (individuals / moving-range) control chart on daily revenue —
    * the small-sample SPC companion to an_spc_rules' Shewhart z: limits
    * x̄ ± 2.66·MR̄ evaluated ENTIRELY in cross-multiplied integers
    * (266·n·ΣMR and 100·nMR·|n·x − Σx| sides — no float boundary at
    * the flag), violations counted exactly. */
  private[graft] def anXmr(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyRevenueSpine(s, dir)
      .withColumn("mr", abs(col("rev_c") - lag(col("rev_c"), 1).over(Window.orderBy(col("d")))))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val stats = daily.agg(count(lit(1)).as("n"), sum(d38(col("rev_c"))).as("sx"),
      sum(d38(col("mr"))).as("smr"),
      count(col("mr")).as("nmr"))
    daily.crossJoin(broadcast(stats))
      .withColumn("dev100", abs(d38(col("rev_c")) * col("n") - col("sx")) *
        100 * col("nmr"))
      .withColumn("lim", d38(col("smr")) * 266 * col("n"))
      .agg(max(col("n")).as("n_days"),
        sum((col("dev100") > col("lim")).cast("long")).as("n_violations"),
        max(when(col("dev100") > col("lim"), col("day"))).as("last_violation"))
      .select(col("n_days"), col("n_violations"), col("last_violation"))
  }

  private[graft] lazy val anXmrSql =
    s"""WITH daily AS ($dailySpineSql),
       |mr AS (SELECT day, rev_c,
       |         ABS(rev_c - LAG(rev_c) OVER (ORDER BY d)) AS mr
       |       FROM daily),
       |st AS (SELECT COUNT(*) AS n,
       |         CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
       |         CAST(SUM(CAST(mr AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS smr,
       |         COUNT(mr) AS nmr
       |       FROM mr),
       |f AS (SELECT day,
       |        ABS(CAST(rev_c AS DECIMAL(38,0)) * n - sx) * 100 * nmr AS dev100,
       |        CAST(smr AS DECIMAL(38,0)) * 266 * n AS lim,
       |        n
       |      FROM mr CROSS JOIN st)
       |SELECT MAX(n) AS n_days,
       |  CAST(SUM(CASE WHEN dev100 > lim THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       |  MAX(CASE WHEN dev100 > lim THEN day END) AS last_violation
       |FROM f""".stripMargin

  /** Inter-order gap distribution: median and p90 of per-customer
    * day gaps between consecutive orders (exact order statistics over
    * the distinct-gap counts — bounded domain, the gap values are
    * ≤ span days), plus mean in exact integers. The recency-cadence
    * fingerprint behind churn-cutoff choices (an_churn_rate's 90-day
    * cutoff should sit in this distribution's tail, which the spec
    * checks). */
  private[graft] def anOrderGaps(s: SparkSession, dir: String): DataFrame = {
    val gaps = Tables.orders(s, dir)
      .select(col("o_custkey").as("ck"), col("o_orderdate").as("dt"),
        col("o_orderkey").as("ok"))
      .withColumn("gap", datediff(col("dt").cast("date"),
        lag(col("dt"), 1).over(Window.partitionBy(col("ck")).orderBy(col("dt"), col("ok"))).cast("date")))
      .filter(col("gap").isNotNull)
      .select(col("gap").cast("long").as("g"))
    val byG = gaps.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
    val scan = graft.operators.PrefixSum.withRunningTotals(byG, Seq("g"), Seq("cnt"))
    val tot = gaps.agg(count(lit(1)).as("n"), sum(col("g")).as("sg"))
    def rank(r: Column) = col("cnt_cum") >= r && col("cnt_cum") - col("cnt") < r
    scan.crossJoin(broadcast(tot))
      .withColumn("r50", expr("(n + 1) div 2"))
      .withColumn("r90", expr("(9 * n + 9) div 10"))
      .filter(rank(col("r50")) || rank(col("r90")))
      .agg(max(col("n")).as("n_gaps"),
        max(when(rank(col("r50")), col("g"))).as("median_gap"),
        max(when(rank(col("r90")), col("g"))).as("p90_gap"),
        max(col("sg")).as("sg"))
      .select(col("n_gaps"), col("median_gap"), col("p90_gap"),
        (col("sg").cast("double") / col("n_gaps").cast("double")).as("mean_gap"))
  }

  private[graft] lazy val anOrderGapsSql =
    """WITH g AS (SELECT CAST(date_diff('day',
      |      CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
      |      CAST(o_orderdate AS DATE)) AS BIGINT) AS g
      |  FROM orders),
      |gg AS (SELECT g FROM g WHERE g IS NOT NULL),
      |bg AS (SELECT g, COUNT(*) AS cnt FROM gg GROUP BY g),
      |cv AS (SELECT g, cnt, CAST(SUM(cnt) OVER (ORDER BY g) AS BIGINT) AS cum FROM bg),
      |t AS (SELECT COUNT(*) AS n, CAST(SUM(g) AS BIGINT) AS sg FROM gg)
      |SELECT MAX(n) AS n_gaps,
      |  CAST(MAX(CASE WHEN cum >= (n+1)//2 AND cum - cnt < (n+1)//2 THEN g END) AS BIGINT) AS median_gap,
      |  CAST(MAX(CASE WHEN cum >= (9*n+9)//10 AND cum - cnt < (9*n+9)//10 THEN g END) AS BIGINT) AS p90_gap,
      |  CAST(MAX(sg) AS DOUBLE) / CAST(MAX(n) AS DOUBLE) AS mean_gap
      |FROM cv CROSS JOIN t""".stripMargin

  /** Greenwood standard errors on the Kaplan–Meier churn curve: the
    * cumulative Σ d/(n(n−d)) rides a window over the same risk-set
    * frame as an_kaplan_meier (each term an exactly-rounded rational,
    * gathered DECIMAL(38,18)), se = S·√Σ at ROUND 6 — the confidence
    * envelope the bare curve needs before anyone reads a 2% drop as
    * real. Terminal all-event rows pin se to 0 with surv. */
  private[graft] def anGreenwood(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val anchor = o.agg(max(col("o_orderdate")).as("mx"))
    val cust = o.groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("f"), max(col("o_orderdate")).as("l"))
      .crossJoin(broadcast(anchor))
      .select(datediff(col("l"), col("f")).cast("bigint").as("t"),
        (col("l") < col("mx") - expr("INTERVAL 90 DAYS")).cast("int").as("ev"))
    val byT = cust.groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"), sum(col("ev")).cast("long").as("d"))
    val wPrev = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t")).rowsBetween(Window.unboundedPreceding, 0)
    byT.crossJoin(broadcast(cust.agg(count(lit(1)).as("n_total"))))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("n_at")).over(wPrev), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("surv", when(col("d") === col("n_risk"), lit(0.0))
        .otherwise(round(exp(sum(
          log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
          .over(wCum)), 6)))
      .withColumn("gw", sum(when(col("d") === col("n_risk"), lit(0.0))
        .otherwise(col("d").cast("double") /
          (col("n_risk").cast("double") * (col("n_risk") - col("d")).cast("double")))
        .cast("decimal(38,18)")).over(wCum).cast("decimal(38,18)"))
      .select(col("t"), col("n_risk"), col("d"), col("surv"),
        when(col("surv") === 0.0, lit(0.0))
          .otherwise(round(col("surv") * sqrt(col("gw").cast("double")), 6)).as("se"))
      .orderBy(col("t"))
  }

  private[graft] lazy val anGreenwoodSql =
    """WITH a AS (SELECT MAX(o_orderdate) AS mx FROM orders),
      |c AS (SELECT o_custkey, MIN(o_orderdate) AS f, MAX(o_orderdate) AS l
      |      FROM orders GROUP BY 1),
      |cust AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t,
      |                CASE WHEN l < mx - INTERVAL 90 DAY THEN 1 ELSE 0 END AS ev
      |         FROM c CROSS JOIN a),
      |byt AS (SELECT t, COUNT(*) AS n_at, CAST(SUM(ev) AS BIGINT) AS d
      |        FROM cust GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS n_total FROM cust),
      |r AS (SELECT t, d, n_total - COALESCE(CAST(SUM(n_at) OVER (ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n_risk
      |      FROM byt CROSS JOIN tot),
      |f AS (SELECT t, n_risk, d,
      |        CASE WHEN d = n_risk THEN 0.0
      |             ELSE ROUND(EXP(SUM(LN(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)))
      |                    OVER cw), 6) END AS surv,
      |        CAST(SUM(CAST(CASE WHEN d = n_risk THEN 0.0
      |               ELSE CAST(d AS DOUBLE)
      |                 / (CAST(n_risk AS DOUBLE) * CAST(n_risk - d AS DOUBLE)) END
      |             AS DECIMAL(38,18))) OVER cw AS DECIMAL(38,18)) AS gw
      |      FROM r WHERE d > 0
      |      WINDOW cw AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT t, n_risk, d, surv,
      |  CASE WHEN surv = 0.0 THEN 0.0
      |       ELSE ROUND(surv * sqrt(CAST(gw AS DOUBLE)), 6) END AS se
      |FROM f ORDER BY t""".stripMargin

  /** Periodogram of daily revenue at candidate periods {7, 30, 91}:
    * per-period cos/sin projections with each v·cos term gathered in
    * DECIMAL(38,18) (the an_price_elasticity libm discipline), emitted
    * as a NORMALIZED amplitude in dollars (2·√(c²+s²)/n/100, ROUND 6 —
    * normalizing BEFORE the round keeps the libm ulp noise far below
    * the 6-dp step; the raw power is n²-scaled where no emission
    * rounding could absorb it). Confirms the weekly cycle the
    * decompose/dow queries assume. */
  private[graft] def anPeriodogram(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyRevenueSpine(s, dir)
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    Seq(7, 30, 91).map { p =>
      val ang = lit(2.0 * math.Pi) * pmod(col("d"), lit(p)).cast("double") / lit(p.toDouble)
      daily.agg(count(lit(1)).as("n"),
          gather(col("rev_c").cast("double") * cos(ang)).as("cs"),
          gather(col("rev_c").cast("double") * sin(ang)).as("sn"))
        .select(lit(p).as("period"), col("n").as("n_days"),
          round(lit(2.0) * sqrt(col("cs").cast("double") * col("cs").cast("double") +
            col("sn").cast("double") * col("sn").cast("double")) /
            col("n").cast("double") / 100.0, 6).as("amplitude"))
    }.reduce(_.unionAll(_)).orderBy(col("period"))
  }

  private[graft] lazy val anPeriodogramSql = {
    def one(p: Int) =
      s"""SELECT $p AS period, COUNT(*) AS n_days,
         |  ROUND(2.0 * sqrt(
         |      CAST(CAST(SUM(CAST(CAST(rev_c AS DOUBLE) * cos(2.0 * pi() * CAST(d % $p AS DOUBLE) / $p.0) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE)
         |    * CAST(CAST(SUM(CAST(CAST(rev_c AS DOUBLE) * cos(2.0 * pi() * CAST(d % $p AS DOUBLE) / $p.0) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE)
         |    + CAST(CAST(SUM(CAST(CAST(rev_c AS DOUBLE) * sin(2.0 * pi() * CAST(d % $p AS DOUBLE) / $p.0) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE)
         |    * CAST(CAST(SUM(CAST(CAST(rev_c AS DOUBLE) * sin(2.0 * pi() * CAST(d % $p AS DOUBLE) / $p.0) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE))
         |    / CAST(COUNT(*) AS DOUBLE) / 100.0, 6) AS amplitude
         |FROM daily""".stripMargin
    s"""WITH daily AS ($dailySpineSql)
       |SELECT * FROM (
       |${Seq(7, 30, 91).map(one).mkString("\nUNION ALL\n")}
       |) u ORDER BY period""".stripMargin
  }

  /** Win ratio (Pocock) between BUILDING and AUTOMOBILE customer
    * balances: P(x₁ > x₀)/P(x₀ > x₁) from EXACT cross-multiplied win
    * counts over the distinct-cent value spine (wins₁ = Σ c₁(v)·C₀(<v)
    * via one cumulative join — the an_roc_auc rank machinery, never an
    * all-pairs pass), ties reported separately, ONE division. */
  private[graft] def anWinRatio(s: SparkSession, dir: String): DataFrame = {
    val lab = Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .select((col("c_mktsegment") === "BUILDING").cast("long").as("g"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val perV = lab.groupBy(col("v"))
      .agg(sum(col("g")).as("c1"), sum(lit(1L) - col("g")).as("c0"))
    val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("c1", "c0"))
    scan
      .withColumn("c0_below", col("c0_cum") - col("c0"))
      .withColumn("c1_below", col("c1_cum") - col("c1"))
      .agg(sum(col("c1") * col("c0_below")).as("wins1"),
        sum(col("c0") * col("c1_below")).as("wins0"),
        sum(col("c1") * col("c0")).as("ties"))
      .select(col("wins1"), col("wins0"), col("ties"),
        (col("wins1").cast("double") / col("wins0").cast("double")).as("win_ratio"))
  }

  private[graft] lazy val anWinRatioSql =
    """WITH lab AS (SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
      |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM customer WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
      |pv AS (SELECT v, CAST(SUM(g) AS BIGINT) AS c1, CAST(SUM(1 - g) AS BIGINT) AS c0
      |       FROM lab GROUP BY v),
      |cv AS (SELECT c1, c0,
      |         CAST(SUM(c0) OVER (ORDER BY v) AS BIGINT) - c0 AS c0_below,
      |         CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) - c1 AS c1_below
      |       FROM pv)
      |SELECT CAST(SUM(c1 * c0_below) AS BIGINT) AS wins1,
      |  CAST(SUM(c0 * c1_below) AS BIGINT) AS wins0,
      |  CAST(SUM(c1 * c0) AS BIGINT) AS ties,
      |  CAST(SUM(c1 * c0_below) AS DOUBLE) / CAST(SUM(c0 * c1_below) AS DOUBLE) AS win_ratio
      |FROM cv""".stripMargin

  /** Geometric mean order value per priority: exp of the DECIMAL(38,18)
    * ln-gather mean — the multiplicative average that matches how
    * prices compound (one 10× order shifts an arithmetic mean, barely
    * moves this). exp amplifies only RELATIVELY, so the 6-dp emission
    * absorbs the gathered libm ulp at dollar scale. */
  private[graft] def anGeometricMean(s: SparkSession, dir: String): DataFrame = {
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    Tables.orders(s, dir)
      .select(col("o_orderpriority").as("g"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
      .filter(col("v") > 0)
      .groupBy(col("g").as("o_orderpriority"))
      .agg(count(lit(1)).as("n"), gather(log(col("v").cast("double"))).as("sl"))
      .select(col("o_orderpriority"), col("n"),
        round(exp(col("sl").cast("double") / col("n").cast("double")) / 100.0, 6)
          .as("geo_mean"))
      .orderBy(col("o_orderpriority"))
  }

  private[graft] lazy val anGeometricMeanSql =
    """WITH o AS (SELECT o_orderpriority AS g,
      |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM orders)
      |SELECT g AS o_orderpriority, COUNT(*) AS n,
      |  ROUND(exp(CAST(CAST(SUM(CAST(ln(CAST(v AS DOUBLE)) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE)) / 100.0, 6) AS geo_mean
      |FROM o WHERE v > 0 GROUP BY g ORDER BY g""".stripMargin

  /** Theil T inequality index of customer balances with the
    * within/between-nation decomposition — the additive property Gini
    * lacks (T = T_between + Σ share·T_within exactly, which the spec
    * pins): every x·ln(x/μ) term a correctly-rounded double gathered in
    * DECIMAL(38,18), means as exact integer ratios, ROUND 6 at
    * emission. Only positive balances enter (ln domain), with the
    * excluded mass reported. */
  private[graft] def anTheil(s: SparkSession, dir: String): DataFrame = {
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    val pos = Tables.customer(s, dir)
      .select(col("c_nationkey").as("nk"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
      .filter(col("v") > 0)
    val tot = pos.agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
    val byN = pos.groupBy(col("nk"))
      .agg(count(lit(1)).as("n_g"), sum(col("v")).as("sv_g"))
    // overall T = (1/n)·Σ (x/μ)·ln(x/μ) with μ = sv/n: evaluate per row as
    // (x·n/sv)·ln(x·n/sv) — exact integer products up to the one division
    val rowTerm = pos.crossJoin(broadcast(tot))
      .select(((col("v").cast("decimal(38,0)") * col("n")).cast("double") /
        col("sv").cast("double")).as("r"))
      .agg(gather(col("r") * log(col("r"))).as("st"), count(lit(1)).as("nr"))
    val between = byN.crossJoin(broadcast(tot))
      .select(((col("sv_g").cast("decimal(38,0)") * col("n")).cast("double") /
        (col("sv").cast("decimal(38,0)") * col("n_g")).cast("double")).as("rb"),
        (col("sv_g").cast("double") / col("sv").cast("double")).as("share"))
      .agg(gather(col("share") * log(col("rb"))).as("tb"))
    val excluded = Tables.customer(s, dir)
      .agg(sum((col("c_acctbal") <= 0.0).cast("long")).as("n_excluded"))
    rowTerm.crossJoin(between).crossJoin(broadcast(excluded))
      .select(col("nr").as("n"),
        round(col("st").cast("double") / col("nr").cast("double"), 6).as("theil_t"),
        round(col("tb").cast("double"), 6).as("theil_between"),
        round(col("st").cast("double") / col("nr").cast("double") -
          col("tb").cast("double"), 6).as("theil_within"),
        col("n_excluded"))
  }

  private[graft] lazy val anTheilSql =
    """WITH pos AS (SELECT c_nationkey AS nk,
      |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM customer
      |  WHERE CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) > 0),
      |t AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sv FROM pos),
      |rt AS (SELECT CAST(SUM(CAST(r * ln(r) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS st,
      |         COUNT(*) AS nr
      |       FROM (SELECT CAST(CAST(v AS DECIMAL(38,0)) * n AS DOUBLE)
      |               / CAST(sv AS DOUBLE) AS r
      |             FROM pos CROSS JOIN t) x),
      |bn AS (SELECT nk, COUNT(*) AS n_g, CAST(SUM(v) AS BIGINT) AS sv_g
      |       FROM pos GROUP BY nk),
      |tb AS (SELECT CAST(SUM(CAST(share * ln(rb) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS tb
      |       FROM (SELECT
      |           CAST(CAST(sv_g AS DECIMAL(38,0)) * n AS DOUBLE)
      |             / CAST(CAST(sv AS DECIMAL(38,0)) * n_g AS DOUBLE) AS rb,
      |           CAST(sv_g AS DOUBLE) / CAST(sv AS DOUBLE) AS share
      |         FROM bn CROSS JOIN t) y),
      |ex AS (SELECT CAST(SUM(CASE WHEN c_acctbal <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_excluded FROM customer)
      |SELECT nr AS n,
      |  ROUND(CAST(st AS DOUBLE) / CAST(nr AS DOUBLE), 6) AS theil_t,
      |  ROUND(CAST(tb AS DOUBLE), 6) AS theil_between,
      |  ROUND(CAST(st AS DOUBLE) / CAST(nr AS DOUBLE) - CAST(tb AS DOUBLE), 6) AS theil_within,
      |  n_excluded
      |FROM rt CROSS JOIN tb CROSS JOIN ex""".stripMargin

  /** Compound annual growth rate of yearly revenue over the complete
    * interior years (first/last calendar years are partial — including
    * them fabricates growth): exact yearly cent sums, CAGR =
    * exp(ln(last/first)/years) − 1 (exp∘ln, never pow — pow has no
    * correctly-rounded guarantee on either engine), ROUND 6. */
  private[graft] def anCagr(s: SparkSession, dir: String): DataFrame = {
    val yearly = Tables.lineitem(s, dir)
      .groupBy(year(col("l_shipdate")).as("yr"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100).cast("bigint").as("rc"))
    val bounds = yearly.agg(min(col("yr")).as("y0"), max(col("yr")).as("y1"))
    val interior = yearly.crossJoin(broadcast(bounds))
      .filter(col("yr") > col("y0") && col("yr") < col("y1"))
    val fl = interior.agg(min(col("yr")).as("first_yr"), max(col("yr")).as("last_yr"))
    fl.join(broadcast(interior.select(col("yr"), col("rc").as("first_rc"))),
        col("yr") === col("first_yr")).drop("yr")
      .join(broadcast(interior.select(col("yr").as("yr2"), col("rc").as("last_rc"))),
        col("yr2") === col("last_yr")).drop("yr2")
      .select(col("first_yr"), col("last_yr"),
        (col("first_rc") / 100.0).as("first_rev"),
        (col("last_rc") / 100.0).as("last_rev"),
        round(exp(log(col("last_rc").cast("double") / col("first_rc").cast("double")) /
          (col("last_yr") - col("first_yr")).cast("double")) - 1.0, 6).as("cagr"))
  }

  private[graft] lazy val anCagrSql =
    """WITH y AS (SELECT year(l_shipdate) AS yr,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rc
      |  FROM lineitem GROUP BY 1),
      |b AS (SELECT MIN(yr) AS y0, MAX(yr) AS y1 FROM y),
      |i AS (SELECT yr, rc FROM y CROSS JOIN b WHERE yr > y0 AND yr < y1),
      |f AS (SELECT MIN(yr) AS first_yr, MAX(yr) AS last_yr FROM i)
      |SELECT first_yr, last_yr,
      |  (SELECT rc FROM i WHERE yr = first_yr) / 100.0 AS first_rev,
      |  (SELECT rc FROM i WHERE yr = last_yr) / 100.0 AS last_rev,
      |  ROUND(exp(ln(CAST((SELECT rc FROM i WHERE yr = last_yr) AS DOUBLE)
      |      / CAST((SELECT rc FROM i WHERE yr = first_yr) AS DOUBLE))
      |    / CAST(last_yr - first_yr AS DOUBLE)) - 1.0, 6) AS cagr
      |FROM f""".stripMargin

  /** Day-of-week uniformity χ² on order counts: the significance test
    * behind an_seasonal_dow's deviation table — exact counts, expected
    * n/7, χ² cross-multiplied to integers over the common denominator
    * (Σ(7·o_i − n)² / (7·n), ONE IEEE division). dow from the portable
    * epoch-day d%7, not locale-dependent calendar functions. */
  private[graft] def anDowChi2(s: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.orders(s, dir)
      .select(pmod(datediff(col("o_orderdate").cast("date"),
        lit("1992-01-01").cast("date")), lit(7)).as("dow"))
      .groupBy(col("dow")).agg(count(lit(1)).as("o_i"))
    val tot = cnt.agg(sum(col("o_i")).as("n"))
    // 7·o_i − n is squared: widen to DECIMAL(38,0) first so n ~ 1e10+
    // at the 100 TB target can't overflow BIGINT (ANSI-mode divergence).
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    cnt.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"),
        sum((d38(col("o_i")) * 7 - d38(col("n"))) *
          (d38(col("o_i")) * 7 - d38(col("n")))).as("num"))
      .select(col("n"),
        (col("num").cast("double") / (col("n") * 7).cast("double")).as("chi2"))
  }

  private[graft] lazy val anDowChi2Sql =
    """WITH c AS (SELECT date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 7 AS dow,
      |    COUNT(*) AS o_i
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(SUM(o_i) AS BIGINT) AS n FROM c)
      |SELECT MAX(n) AS n,
      |  CAST(SUM((CAST(o_i AS DECIMAL(38,0)) * 7 - CAST(n AS DECIMAL(38,0)))
      |    * (CAST(o_i AS DECIMAL(38,0)) * 7 - CAST(n AS DECIMAL(38,0)))) AS DOUBLE)
      |    / CAST(MAX(n) * 7 AS DOUBLE) AS chi2
      |FROM c CROSS JOIN t""".stripMargin

  /** Gumbel return levels for weekly revenue maxima: method-of-moments
    * fit (β = s·√6/π, μ = x̄ − γ·β with Euler–Mascheroni γ) from exact
    * decimal moment sums over the block maxima, return level x_T = μ −
    * β·ln(−ln(1−1/T)) at T ∈ {10, 52, 520} — the "biggest week we
    * should plan for" translation of an_gumbel_maxima's fit. Shared
    * IEEE expression tree, ROUND 6. */
  private[graft] def anReturnLevel(s: SparkSession, dir: String): DataFrame = {
    val weekly = dailyRevenueSpine(s, dir)
      .groupBy(expr("d div 7").as("wk"))
      .agg(max(col("rev_c")).as("mx"))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val m = weekly.agg(count(lit(1)).as("n"), sum(d38(col("mx"))).as("s1"),
      sum(d38(col("mx")) * d38(col("mx"))).as("s2"))
    val mean = col("s1").cast("double") / col("n").cast("double")
    val sd = sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast("double")) /
      col("n").cast("double")
    val beta = sd * math.sqrt(6.0) / math.Pi
    val mu = mean - lit(0.5772156649015329) * beta
    Seq(10, 52, 520).map { t =>
      m.select(lit(t).as("t_weeks"), col("n").as("n_weeks"),
        round((mu - beta * log(-log(lit(1.0) - lit(1.0) / t))) / 100.0, 6)
          .as("return_level"))
    }.reduce(_.unionAll(_)).orderBy(col("t_weeks"))
  }

  private[graft] lazy val anReturnLevelSql = {
    val mean = "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)"
    val sd = "sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / CAST(n AS DOUBLE)"
    val beta = s"$sd * ${math.sqrt(6.0)} / ${math.Pi}"
    val mu = s"$mean - 0.5772156649015329 * ($beta)"
    def one(t: Int) =
      s"""SELECT $t AS t_weeks, n AS n_weeks,
         |  ROUND((($mu) - ($beta) * ln(-ln(1.0 - 1.0 / $t))) / 100.0, 6) AS return_level
         |FROM m""".stripMargin
    s"""WITH daily AS ($dailySpineSql),
       |w AS (SELECT d // 7 AS wk, CAST(MAX(rev_c) AS BIGINT) AS mx FROM daily GROUP BY 1),
       |m AS (SELECT COUNT(*) AS n,
       |        CAST(SUM(CAST(mx AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
       |        CAST(SUM(CAST(mx AS DECIMAL(38,0)) * CAST(mx AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
       |      FROM w)
       |SELECT * FROM (
       |${Seq(10, 52, 520).map(one).mkString("\nUNION ALL\n")}
       |) u ORDER BY t_weeks""".stripMargin
  }

  /** Seasonal Mann–Kendall trend test: the MK S statistic computed
    * WITHIN each day-of-week subseries (pairs never cross seasons, so
    * the weekly cycle cannot masquerade as trend) and summed with the
    * summed tie-corrected variances — exact integers end to end over
    * the 7 per-dow pair frames, one IEEE z at emission. The seasonal
    * fix for exactly the failure an_mann_kendall has on cyclic data. */
  private[graft] def anSeasonalMk(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyRevenueSpine(s, dir)
      .withColumn("dow", pmod(col("d"), lit(7)))
    val a = daily.select(col("dow"), col("d"), col("rev_c"))
    val b = daily.select(col("dow"), col("d").as("d2"), col("rev_c").as("v2"))
    val pairs = a.join(b, Seq("dow")).filter(col("d") < col("d2"))
      .select(col("dow"), signum(col("v2") - col("rev_c")).cast("long").as("sg"))
    val perDow = pairs.groupBy(col("dow"))
      .agg(sum(col("sg")).as("s_dow"), count(lit(1)).as("n_pairs"))
    val nDow = daily.groupBy(col("dow")).agg(count(lit(1)).as("n_d"))
    perDow.join(nDow, "dow")
      .agg(sum(col("s_dow")).as("s_total"),
        sum(col("n_d") * (col("n_d") - 1) * (col("n_d") * 2 + 5)).as("var18"),
        sum(col("n_pairs")).as("n_pairs"))
      .select(col("s_total"), col("n_pairs"),
        round(when(col("s_total") > 0, (col("s_total") - 1).cast("double"))
          .when(col("s_total") < 0, (col("s_total") + 1).cast("double"))
          .otherwise(lit(0.0)) /
          sqrt(col("var18").cast("double") / 18.0), 6).as("z"))
  }

  private[graft] lazy val anSeasonalMkSql =
    s"""WITH daily AS ($dailySpineSql),
       |dd AS (SELECT d % 7 AS dow, d, rev_c FROM daily),
       |p AS (SELECT a.dow,
       |        CAST(CASE WHEN b.rev_c > a.rev_c THEN 1
       |                  WHEN b.rev_c < a.rev_c THEN -1 ELSE 0 END AS BIGINT) AS sg
       |      FROM dd a JOIN dd b ON a.dow = b.dow AND a.d < b.d),
       |pd AS (SELECT dow, CAST(SUM(sg) AS BIGINT) AS s_dow, COUNT(*) AS n_pairs
       |       FROM p GROUP BY dow),
       |nd AS (SELECT d % 7 AS dow, COUNT(*) AS n_d FROM daily GROUP BY 1),
       |t AS (SELECT CAST(SUM(s_dow) AS BIGINT) AS s_total,
       |        CAST(SUM(n_d * (n_d - 1) * (n_d * 2 + 5)) AS BIGINT) AS var18,
       |        CAST(SUM(n_pairs) AS BIGINT) AS n_pairs
       |      FROM pd JOIN nd USING (dow))
       |SELECT s_total, n_pairs,
       |  ROUND(CAST(CASE WHEN s_total > 0 THEN s_total - 1
       |                  WHEN s_total < 0 THEN s_total + 1 ELSE 0 END AS DOUBLE)
       |    / sqrt(CAST(var18 AS DOUBLE) / 18.0), 6) AS z
       |FROM t""".stripMargin

  /** Process-capability indices Cp / Cpk for order totals against fixed
    * spec limits [$100, $400k]: exact decimal moments, both indices one
    * shared IEEE expression tree, ROUND 6 — the manufacturing-QC lens
    * on whether the order stream fits its contracted envelope (Cpk < 1
    * = the process breaches a limit at the ±3σ horizon). */
  private[graft] def anCpk(s: SparkSession, dir: String): DataFrame = {
    val lsl = 10000L; val usl = 40000000L  // cents
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val m = Tables.orders(s, dir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
      .agg(count(lit(1)).as("n"), sum(d38(col("v"))).as("s1"),
        sum(d38(col("v")) * d38(col("v"))).as("s2"),
        sum((col("v") < lsl || col("v") > usl).cast("long")).as("n_out"))
    val mean = col("s1").cast("double") / col("n").cast("double")
    val sd = sqrt((col("n") * col("s2") - col("s1") * col("s1")).cast("double")) /
      col("n").cast("double")
    m.select(col("n"), col("n_out"),
      round((lit(usl.toDouble) - lit(lsl.toDouble)) / (lit(6.0) * sd), 6).as("cp"),
      round(least((lit(usl.toDouble) - mean) / (lit(3.0) * sd),
        (mean - lit(lsl.toDouble)) / (lit(3.0) * sd)), 6).as("cpk"))
  }

  private[graft] lazy val anCpkSql = {
    val mean = "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)"
    val sd = "sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / CAST(n AS DOUBLE)"
    s"""WITH m AS (SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
       |    CAST(SUM(CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2,
       |    CAST(SUM(CASE WHEN v < 10000 OR v > 40000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_out
       |  FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
       |        FROM orders) o)
       |SELECT n, n_out,
       |  ROUND((40000000.0 - 10000.0) / (6.0 * ($sd)), 6) AS cp,
       |  ROUND(LEAST((40000000.0 - ($mean)) / (3.0 * ($sd)),
       |              (($mean) - 10000.0) / (3.0 * ($sd))), 6) AS cpk
       |FROM m""".stripMargin
  }

  /** Runs test for randomness of DIRECTION (ups and downs) on daily
    * revenue — the difference-sign complement to an_runs_test's
    * above/below-median runs: runs counted exactly via sign changes
    * (ties dropped), E[R] = (2n−1)/3 and Var[R] = (16n−29)/90 in exact
    * integer arithmetic cross-multiplied through the z numerator (3R −
    * 2n + 1 over the common denominator), one sqrt + one division. */
  private[graft] def anRunsUpdown(s: SparkSession, dir: String): DataFrame = {
    val diffs = dailyRevenueSpine(s, dir)
      .withColumn("chg", col("rev_c") - lag(col("rev_c"), 1).over(Window.orderBy(col("d"))))
      .filter(col("chg").isNotNull && col("chg") =!= 0)
      .withColumn("up", (col("chg") > 0).cast("int"))
      .withColumn("prev_up", lag(col("up"), 1).over(Window.orderBy(col("d"))))
    diffs.agg(count(lit(1)).as("n"),
        (sum((col("prev_up").isNull || col("prev_up") =!= col("up")).cast("long")))
          .as("runs"))
      .select(col("n"), col("runs"),
        round((col("runs") * 3 - col("n") * 2 + 1).cast("double") /
          (lit(3.0) * sqrt((col("n") * 16 - 29).cast("double") / 90.0)), 6).as("z"))
  }

  private[graft] lazy val anRunsUpdownSql =
    s"""WITH daily AS ($dailySpineSql),
       |ch AS (SELECT d, rev_c - LAG(rev_c) OVER (ORDER BY d) AS chg FROM daily),
       |f AS (SELECT d, CASE WHEN chg > 0 THEN 1 ELSE 0 END AS up
       |      FROM ch WHERE chg IS NOT NULL AND chg <> 0),
       |r AS (SELECT up, LAG(up) OVER (ORDER BY d) AS prev_up FROM f),
       |t AS (SELECT COUNT(*) AS n,
       |        CAST(SUM(CASE WHEN prev_up IS NULL OR prev_up <> up THEN 1 ELSE 0 END) AS BIGINT) AS runs
       |      FROM r)
       |SELECT n, runs,
       |  ROUND(CAST(runs * 3 - n * 2 + 1 AS DOUBLE)
       |    / (3.0 * sqrt(CAST(n * 16 - 29 AS DOUBLE) / 90.0)), 6) AS z
       |FROM t""".stripMargin

  /** Weekend effect on daily revenue: Welch t between the weekday and
    * weekend day-spine populations (the same calendar-anchored (d+2)%7
    * split as an_wasserstein/an_cvm: 1992-01-01 is a Wednesday, so +2
    * maps Mon–Fri → weekday — with the parametric effect estimate
    * those distribution distances don't give): exact decimal moments
    * per side, mean difference in dollars and the Welch t in one shared
    * IEEE tree, ROUND 6. */
  private[graft] def anWeekendEffect(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val m = dailyRevenueSpine(s, dir)
      .withColumn("grp", when(pmod(col("d") + 2, lit(7)) < 5, "wd").otherwise("we"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(d38(col("rev_c"))).as("s1"),
        sum(d38(col("rev_c")) * d38(col("rev_c"))).as("s2"))
    def pick(c: String, g: String) = max(when(col("grp") === g, col(c)))
    val w = m.agg(pick("n", "wd").as("n1"), pick("s1", "wd").as("a1"), pick("s2", "wd").as("q1"),
      pick("n", "we").as("n2"), pick("s1", "we").as("a2"), pick("s2", "we").as("q2"))
    def mean(s1: Column, n: Column) = s1.cast("double") / n.cast("double")
    def varN(n: Column, s1: Column, s2: Column) =
      (n * s2 - s1 * s1).cast("double") / (n.cast("double") * n.cast("double") *
        (n - 1).cast("double"))
    w.select(col("n1").as("n_weekday"), col("n2").as("n_weekend"),
      round((mean(col("a1"), col("n1")) - mean(col("a2"), col("n2"))) / 100.0, 6)
        .as("mean_diff"),
      round((mean(col("a1"), col("n1")) - mean(col("a2"), col("n2"))) /
        sqrt(varN(col("n1"), col("a1"), col("q1")) +
          varN(col("n2"), col("a2"), col("q2"))), 6).as("welch_t"))
  }

  private[graft] lazy val anWeekendEffectSql = {
    def mean(s1: String, n: String) = s"CAST($s1 AS DOUBLE) / CAST($n AS DOUBLE)"
    def varN(n: String, s1: String, s2: String) =
      s"CAST($n * $s2 - $s1 * $s1 AS DOUBLE) / (CAST($n AS DOUBLE) * CAST($n AS DOUBLE) * CAST($n - 1 AS DOUBLE))"
    s"""WITH daily AS ($dailySpineSql),
       |g AS (SELECT rev_c, CASE WHEN ((d + 2) % 7) < 5 THEN 'wd' ELSE 'we' END AS grp FROM daily),
       |m AS (SELECT grp, COUNT(*) AS n,
       |        CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
       |        CAST(SUM(CAST(rev_c AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
       |      FROM g GROUP BY grp),
       |w AS (SELECT
       |  MAX(CASE WHEN grp = 'wd' THEN n END) AS n1, MAX(CASE WHEN grp = 'we' THEN n END) AS n2,
       |  MAX(CASE WHEN grp = 'wd' THEN s1 END) AS a1, MAX(CASE WHEN grp = 'we' THEN s1 END) AS a2,
       |  MAX(CASE WHEN grp = 'wd' THEN s2 END) AS q1, MAX(CASE WHEN grp = 'we' THEN s2 END) AS q2
       |  FROM m)
       |SELECT n1 AS n_weekday, n2 AS n_weekend,
       |  ROUND((${mean("a1", "n1")} - ${mean("a2", "n2")}) / 100.0, 6) AS mean_diff,
       |  ROUND((${mean("a1", "n1")} - ${mean("a2", "n2")})
       |    / sqrt(${varN("n1", "a1", "q1")} + ${varN("n2", "a2", "q2")}), 6) AS welch_t
       |FROM w""".stripMargin
  }

  /** Durbin–Watson autocorrelation test on the residuals of the daily-
    * revenue OLS trend: the standard "is the trend model leaving serial
    * structure on the table" gate run before trusting an_linreg-style
    * fits on time series. OLS normal-equation sums are EXACT decimals
    * over the day spine (calendar-bounded frame), slope/intercept one
    * shared IEEE tree, residuals bit-identical per row in both engines,
    * and the DW numerator/denominator are exact decimal sums of those
    * doubles — deterministic under any partitioning. DW ≈ 2(1 − ρ₁). */
  private[graft] def anDurbinWatson(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val spine = dailyRevenueSpine(s, dir).select(col("d"), col("rev_c"))
    val m = spine.agg(count(lit(1)).as("n"),
      sum(d38(col("d"))).as("sx"), sum(d38(col("rev_c"))).as("sy"),
      sum(d38(col("d")) * d38(col("d"))).as("sxx"),
      sum(d38(col("d")) * d38(col("rev_c"))).as("sxy"))
    val slope = (d38(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double") /
      (d38(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double")
    val icept = (col("sy").cast("double") - col("sx").cast("double") * col("slope")) /
      col("n").cast("double")
    val e = spine.crossJoin(broadcast(m.select(col("n"), col("sx"), col("sy"), slope.as("slope"))
        .select(col("n"), col("slope"), icept.as("icept"))))
      .select(col("d"), col("n"), col("slope"),
        (col("rev_c").cast("double") - col("icept") -
          col("slope") * col("d").cast("double")).as("e"))
    val lagW = Window.orderBy(col("d"))
    e.withColumn("ep", lag(col("e"), 1).over(lagW))
      .agg(max(col("n")).as("n_days"), round(max(col("slope")), 6).as("slope"),
        sum(when(col("ep").isNotNull,
          ((col("e") - col("ep")) * (col("e") - col("ep"))).cast("decimal(38,8)"))).as("num"),
        sum((col("e") * col("e")).cast("decimal(38,8)")).as("den"))
      .select(col("n_days"), col("slope"),
        round(col("num").cast("double") / col("den").cast("double"), 6).as("dw"))
  }

  private[graft] lazy val anDurbinWatsonSql =
    s"""WITH daily AS ($dailySpineSql),
       |m AS (SELECT COUNT(*) AS n,
       |  SUM(CAST(d AS DECIMAL(38,0))) AS sx, SUM(CAST(rev_c AS DECIMAL(38,0))) AS sy,
       |  SUM(CAST(d AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0))) AS sxx,
       |  SUM(CAST(d AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0))) AS sxy
       |  FROM daily),
       |b AS (SELECT n,
       |  CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
       |    / CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE) AS slope,
       |  sx, sy FROM m),
       |p AS (SELECT n, slope,
       |  (CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE) * slope) / CAST(n AS DOUBLE) AS icept
       |  FROM b),
       |e AS (SELECT d, n, slope,
       |  CAST(rev_c AS DOUBLE) - icept - slope * CAST(d AS DOUBLE) AS e
       |  FROM daily CROSS JOIN p),
       |l AS (SELECT n, slope, e, LAG(e) OVER (ORDER BY d) AS ep FROM e)
       |SELECT MAX(n) AS n_days, ROUND(MAX(slope), 6) AS slope,
       |  ROUND(CAST(SUM(CASE WHEN ep IS NOT NULL
       |      THEN CAST((e - ep) * (e - ep) AS DECIMAL(38,8)) END) AS DOUBLE)
       |    / CAST(SUM(CAST(e * e AS DECIMAL(38,8))) AS DOUBLE), 6) AS dw
       |FROM l""".stripMargin

  /** Paired sign test on week-over-week daily revenue (day d vs d−7,
    * same weekday — the nonparametric "is revenue drifting up" check
    * that needs no distributional assumption an_weekend_effect's Welch
    * t carries): exact integer sign counts off one day-spine self-join,
    * normal-approximation z in one IEEE expression. Ties (exact-cents
    * equality) are dropped per the classical test. */
  private[graft] def anSignTest(s: SparkSession, dir: String): DataFrame = {
    val spine = dailyRevenueSpine(s, dir).select(col("d"), col("rev_c"))
    val prev = spine.select((col("d") + 7).as("d"), col("rev_c").as("prev_c"))
    spine.join(prev, Seq("d"))
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("rev_c") > col("prev_c")).cast("long")).as("n_pos"),
        sum((col("rev_c") < col("prev_c")).cast("long")).as("n_neg"))
      .select(col("n_pairs"), col("n_pos"), col("n_neg"),
        round((lit(2.0) * col("n_pos").cast("double") -
            (col("n_pos") + col("n_neg")).cast("double")) /
          sqrt((col("n_pos") + col("n_neg")).cast("double")), 6).as("z"))
  }

  private[graft] lazy val anSignTestSql =
    s"""WITH daily AS ($dailySpineSql),
       |p AS (SELECT a.rev_c AS cur, b.rev_c AS prev
       |      FROM daily a JOIN daily b ON a.d = b.d + 7),
       |c AS (SELECT COUNT(*) AS n_pairs,
       |  CAST(SUM(CASE WHEN cur > prev THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       |  CAST(SUM(CASE WHEN cur < prev THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
       |  FROM p)
       |SELECT n_pairs, n_pos, n_neg,
       |  ROUND((2.0 * CAST(n_pos AS DOUBLE) - CAST(n_pos + n_neg AS DOUBLE))
       |    / sqrt(CAST(n_pos + n_neg AS DOUBLE)), 6) AS z
       |FROM c""".stripMargin

  /** Two-sample F test for equality of variances between the returned
    * ('R') and accepted ('A') lineitem price populations — the
    * variance-ratio complement to an_welch_ttest's mean comparison and
    * the classical gate before pooling. Prices are exact cents, both
    * variance numerators n·Σx² − (Σx)² are EXACT integer decimals
    * (zero float cancellation), one division each, F one more. */
  private[graft] def anFTest(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val cents = (col("l_extendedprice").cast("decimal(24,2)") * 100).cast("bigint")
    val g = Tables.lineitem(s, dir)
      .filter(col("l_returnflag").isin("A", "R"))
      .select(col("l_returnflag").as("grp"), cents.as("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(d38(col("v"))).as("s1"),
        sum(d38(col("v")) * d38(col("v"))).as("s2"))
    def varDollars(n: Column, s1: Column, s2: Column): Column =
      ((n.cast("decimal(38,0)") * s2 - s1 * s1).cast("double") /
        (n.cast("double") * (n - 1).cast("double"))) / 1e4
    val w = g.agg(
      max(when(col("grp") === "A", col("n"))).as("n_a"),
      max(when(col("grp") === "R", col("n"))).as("n_r"),
      max(when(col("grp") === "A", col("s1"))).as("a1"),
      max(when(col("grp") === "R", col("s1"))).as("r1"),
      max(when(col("grp") === "A", col("s2"))).as("a2"),
      max(when(col("grp") === "R", col("s2"))).as("r2"))
    w.select(col("n_a"), col("n_r"),
      round(varDollars(col("n_a"), col("a1"), col("a2")), 2).as("var_a"),
      round(varDollars(col("n_r"), col("r1"), col("r2")), 2).as("var_r"),
      round(varDollars(col("n_a"), col("a1"), col("a2")) /
        varDollars(col("n_r"), col("r1"), col("r2")), 6).as("f_ratio"))
  }

  private[graft] lazy val anFTestSql = {
    def varD(n: String, s1: String, s2: String) =
      s"((CAST(CAST($n AS DECIMAL(38,0)) * $s2 - $s1 * $s1 AS DOUBLE) " +
        s"/ (CAST($n AS DOUBLE) * CAST($n - 1 AS DOUBLE))) / 1e4)"
    s"""WITH v AS (SELECT l_returnflag AS grp,
       |    CAST(CAST(l_extendedprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
       |  FROM lineitem WHERE l_returnflag IN ('A', 'R')),
       |g AS (SELECT grp, COUNT(*) AS n,
       |    SUM(CAST(v AS DECIMAL(38,0))) AS s1,
       |    SUM(CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0))) AS s2
       |  FROM v GROUP BY grp),
       |w AS (SELECT
       |  MAX(CASE WHEN grp = 'A' THEN n END) AS n_a, MAX(CASE WHEN grp = 'R' THEN n END) AS n_r,
       |  MAX(CASE WHEN grp = 'A' THEN s1 END) AS a1, MAX(CASE WHEN grp = 'R' THEN s1 END) AS r1,
       |  MAX(CASE WHEN grp = 'A' THEN s2 END) AS a2, MAX(CASE WHEN grp = 'R' THEN s2 END) AS r2
       |  FROM g)
       |SELECT n_a, n_r,
       |  ROUND(${varD("n_a", "a1", "a2")}, 2) AS var_a,
       |  ROUND(${varD("n_r", "r1", "r2")}, 2) AS var_r,
       |  ROUND(${varD("n_a", "a1", "a2")} / ${varD("n_r", "r1", "r2")}, 6) AS f_ratio
       |FROM w""".stripMargin
  }

  /** Bartlett's test for homogeneity of variances across all three
    * return-flag groups — the k-sample generalization of an_f_test
    * (and the assumption check an_anova leans on; an_levene is its
    * robust cousin, Bartlett is the classical normal-theory form).
    * Per-group variances from EXACT integer-cents moment sums; the
    * k-sized (3-row) reduction sums ln-variance terms through
    * DECIMAL(38,18) so the result is partitioning-independent. */
  private[graft] def anBartlett(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val cents = (col("l_extendedprice").cast("decimal(24,2)") * 100).cast("bigint")
    val g = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("grp"), cents.as("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(d38(col("v"))).as("s1"),
        sum(d38(col("v")) * d38(col("v"))).as("s2"))
      // dollars² variance, one IEEE division off the exact numerator
      .select(col("grp"), col("n"),
        (((d38(col("n")) * col("s2") - col("s1") * col("s1")).cast("double") /
          (col("n").cast("double") * (col("n") - 1).cast("double"))) / 1e4).as("vr"))
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val m = g.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
      sum(d18((col("n") - 1).cast("double") * col("vr"))).as("sw"),
      sum(d18((col("n") - 1).cast("double") * log(col("vr")))).as("slnv"),
      sum(d18(lit(1.0) / (col("n") - 1).cast("double"))).as("sinv"))
    m.select(col("k"), col("nn").as("n"),
      round(col("sw").cast("double") / (col("nn") - col("k")).cast("double"), 2)
        .as("pooled_var"),
      round(((col("nn") - col("k")).cast("double") *
          log(col("sw").cast("double") / (col("nn") - col("k")).cast("double")) -
          col("slnv").cast("double")) /
        (lit(1.0) + (col("sinv").cast("double") -
            lit(1.0) / (col("nn") - col("k")).cast("double")) /
          (lit(3.0) * (col("k") - 1).cast("double"))), 6).as("bartlett_chi2"))
  }

  private[graft] lazy val anBartlettSql =
    """WITH v AS (SELECT l_returnflag AS grp,
      |    CAST(CAST(l_extendedprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM lineitem),
      |g AS (SELECT grp, COUNT(*) AS n,
      |    SUM(CAST(v AS DECIMAL(38,0))) AS s1,
      |    SUM(CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0))) AS s2
      |  FROM v GROUP BY grp),
      |vr AS (SELECT grp, n,
      |    (CAST(CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1 AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) / 1e4 AS vr
      |  FROM g),
      |m AS (SELECT COUNT(*) AS k, CAST(SUM(n) AS BIGINT) AS nn,
      |    SUM(CAST(CAST(n - 1 AS DOUBLE) * vr AS DECIMAL(38,18))) AS sw,
      |    SUM(CAST(CAST(n - 1 AS DOUBLE) * ln(vr) AS DECIMAL(38,18))) AS slnv,
      |    SUM(CAST(1.0 / CAST(n - 1 AS DOUBLE) AS DECIMAL(38,18))) AS sinv
      |  FROM vr)
      |SELECT k, nn AS n,
      |  ROUND(CAST(sw AS DOUBLE) / CAST(nn - k AS DOUBLE), 2) AS pooled_var,
      |  ROUND((CAST(nn - k AS DOUBLE) * ln(CAST(sw AS DOUBLE) / CAST(nn - k AS DOUBLE))
      |      - CAST(slnv AS DOUBLE))
      |    / (1.0 + (CAST(sinv AS DOUBLE) - 1.0 / CAST(nn - k AS DOUBLE))
      |      / (3.0 * CAST(k - 1 AS DOUBLE))), 6) AS bartlett_chi2
      |FROM m""".stripMargin

  /** Mood's median test across order priorities: does any priority
    * class skew above/below the GRAND median order value? The exact
    * grand median is an order statistic off the same run-length
    * prefix-sum scan as q_exact_median (no global row_number over the
    * near-unique price domain), the 2×k contingency is exact integer
    * counts, and the χ² reduction runs through DECIMAL(38,18) on the
    * k-sized frame. The nonparametric k-sample location gate next to
    * an_kruskal (ranks) and an_moods' count-only robustness. */
  private[graft] def anMoodsMedian(s: SparkSession, dir: String): DataFrame = {
    val cents = (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint")
    val raw = Tables.orders(s, dir)
      .select(col("o_orderpriority"), cents.as("v"))
    val scan = graft.operators.PrefixSum.distinctRunningCounts(
      raw.select(col("v")), Seq("v"))
    val med = scan
      .crossJoin(broadcast(raw.agg(count(lit(1)).as("n"))))
      .filter(col("cnt_cum") >= expr("(n + 1) div 2") &&
        col("cnt_cum") - col("cnt") < expr("(n + 1) div 2"))
      .select(col("v").as("med_c"))
    // contingency + totals + chi2 all in ONE pass over the k-sized (5
    // priorities) frame: the totals and the chi2 reduction are stacked
    // unpartitioned windows over a key-domain-bounded frame (GWIN
    // allowlisted, machine-audited), not agg+crossJoin re-derivations
    // that would rescan orders three times at 100 TB.
    val cls = raw.crossJoin(broadcast(med))
      .groupBy(col("o_orderpriority"), col("med_c"))
      .agg(sum((col("v") <= col("med_c")).cast("long")).as("n_le"),
        sum((col("v") > col("med_c")).cast("long")).as("n_gt"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ni = (col("n_le") + col("n_gt")).cast("double")
    val eLe = ni * col("t_le").cast("double") / col("nn").cast("double")
    val eGt = ni * col("t_gt").cast("double") / col("nn").cast("double")
    val term = (col("n_le").cast("double") - eLe) * (col("n_le").cast("double") - eLe) / eLe +
      (col("n_gt").cast("double") - eGt) * (col("n_gt").cast("double") - eGt) / eGt
    cls
      .withColumn("t_le", sum(col("n_le")).over(wAll))
      .withColumn("t_gt", sum(col("n_gt")).over(wAll))
      .withColumn("nn", sum(col("n_le") + col("n_gt")).over(wAll))
      .withColumn("chi2",
        round(sum(term.cast("decimal(38,18)")).over(wAll).cast("double"), 6))
      .select(col("o_orderpriority"), col("n_le"), col("n_gt"),
        (col("med_c") / 100.0).as("grand_median"), col("chi2"))
      .orderBy(col("o_orderpriority"))
  }

  private[graft] lazy val anMoodsMedianSql =
    """WITH v AS (SELECT o_orderpriority,
      |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |p AS (SELECT v.v, COUNT(*) AS cnt FROM v GROUP BY 1),
      |c AS (SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cum FROM p),
      |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM p),
      |md AS (SELECT v AS med_c FROM c, t
      |       WHERE cum >= (n+1)//2 AND cum - cnt < (n+1)//2),
      |cls AS (SELECT o_orderpriority,
      |    CAST(SUM(CASE WHEN v.v <= med_c THEN 1 ELSE 0 END) AS BIGINT) AS n_le,
      |    CAST(SUM(CASE WHEN v.v > med_c THEN 1 ELSE 0 END) AS BIGINT) AS n_gt
      |  FROM v CROSS JOIN md GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_le) AS BIGINT) AS t_le, CAST(SUM(n_gt) AS BIGINT) AS t_gt,
      |    CAST(SUM(n_le + n_gt) AS BIGINT) AS nn FROM cls),
      |chi AS (SELECT ROUND(CAST(SUM(CAST(
      |    (CAST(n_le AS DOUBLE) - CAST(n_le + n_gt AS DOUBLE) * CAST(t_le AS DOUBLE) / CAST(nn AS DOUBLE))
      |    * (CAST(n_le AS DOUBLE) - CAST(n_le + n_gt AS DOUBLE) * CAST(t_le AS DOUBLE) / CAST(nn AS DOUBLE))
      |    / (CAST(n_le + n_gt AS DOUBLE) * CAST(t_le AS DOUBLE) / CAST(nn AS DOUBLE))
      |    + (CAST(n_gt AS DOUBLE) - CAST(n_le + n_gt AS DOUBLE) * CAST(t_gt AS DOUBLE) / CAST(nn AS DOUBLE))
      |    * (CAST(n_gt AS DOUBLE) - CAST(n_le + n_gt AS DOUBLE) * CAST(t_gt AS DOUBLE) / CAST(nn AS DOUBLE))
      |    / (CAST(n_le + n_gt AS DOUBLE) * CAST(t_gt AS DOUBLE) / CAST(nn AS DOUBLE))
      |  AS DECIMAL(38,18))) AS DOUBLE), 6) AS chi2
      |  FROM cls CROSS JOIN tot)
      |SELECT o_orderpriority, n_le, n_gt, med_c / 100.0 AS grand_median, chi2
      |FROM cls CROSS JOIN md CROSS JOIN chi ORDER BY o_orderpriority""".stripMargin

  /** Jonckheere–Terpstra ordered-alternative trend test: do order
    * values TREND across the ordered priority classes (1-URGENT <…<
    * 5-LOW)? Strictly stronger than an_kruskal's any-difference when
    * the alternative is monotone. JT = Σ_{i<j} U_ij is assembled from
    * ONE distinct-cent PrefixSum scan carrying all five groups'
    * multiplicities and running totals (the an_cliffs_delta posture —
    * no pair join over the data-sized value domain); doubled 2·JT stays
    * an exact integer through the ½-tie terms, and the normal z widens
    * n²(2n+3)-scale terms to DECIMAL(38,0) (BIGINT overflows past ~1e6
    * rows per the an_dow_chi2 lesson). */
  private[graft] def anJonckheere(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val cents = (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint")
    val o = Tables.orders(s, dir)
      .select(substring(col("o_orderpriority"), 1, 1).cast("int").as("g"), cents.as("v"))
    val cAggs = (1 to 5).map(i => sum((col("g") === i).cast("long")).as(s"c$i"))
    val pv = o.groupBy(col("v")).agg(cAggs.head, cAggs.tail: _*)
    val scan = graft.operators.PrefixSum.withRunningTotals(
      pv, Seq("v"), (1 to 5).map(i => s"c$i"))
    // 2·U_ij contribution at value v: 2·c_j(v)·[#group-i below v] +
    // c_i(v)·c_j(v) (the tie pairs count ½ each)
    // DECIMAL(18,0) factors: wide enough for any per-value count or
    // running total, and the product stays inside DECIMAL width in BOTH
    // engines (DuckDB silently promotes an overflowing decimal multiply
    // to DOUBLE, which would de-exact the statistic)
    val d18i = (c: Column) => c.cast("decimal(18,0)")
    val jt2Term = (for { i <- 1 to 5; j <- (i + 1) to 5 } yield
      lit(2) * d18i(col(s"c$j")) * (d18i(col(s"c${i}_cum")) - d18i(col(s"c$i"))) +
        d18i(col(s"c$i")) * d18i(col(s"c$j"))).reduce(_ + _)
    val mAggs = (1 to 5).map(i => sum(col(s"c$i")).as(s"n$i")) :+
      sum(jt2Term).as("jt2")
    val m = scan.agg(mAggs.head, mAggs.tail: _*)
    val n = (1 to 5).map(i => col(s"n$i")).reduce(_ + _)
    val sumNi2 = (1 to 5).map(i => d38(col(s"n$i")) * d38(col(s"n$i"))).reduce(_ + _)
    val sumVarI = (1 to 5).map(i => d38(col(s"n$i")) * d38(col(s"n$i")) *
      (d38(col(s"n$i")) * 2 + 3)).reduce(_ + _)
    m.select(n.as("n"), col("jt2").cast("bigint").as("jt2"),
      round((col("jt2").cast("double") / 2.0 -
          (d38(n) * d38(n) - sumNi2).cast("double") / 4.0) /
        sqrt((d38(n) * d38(n) * (d38(n) * 2 + 3) - sumVarI).cast("double") / 72.0), 6)
        .as("z"))
  }

  private[graft] lazy val anJonckheereSql = {
    val cs = (1 to 5).map(i =>
      s"CAST(SUM(CASE WHEN g = $i THEN 1 ELSE 0 END) AS BIGINT) AS c$i").mkString(", ")
    val cums = (1 to 5).map(i =>
      s"CAST(SUM(c$i) OVER (ORDER BY v) AS BIGINT) - c$i AS lt$i").mkString(", ")
    val jt2 = (for { i <- 1 to 5; j <- (i + 1) to 5 } yield
      s"2 * CAST(c$j AS DECIMAL(18,0)) * CAST(lt$i AS DECIMAL(18,0)) " +
        s"+ CAST(c$i AS DECIMAL(18,0)) * CAST(c$j AS DECIMAL(18,0))").mkString(" + ")
    val n = (1 to 5).map(i => s"n$i").mkString(" + ")
    val sumNi2 = (1 to 5).map(i =>
      s"CAST(n$i AS DECIMAL(38,0)) * CAST(n$i AS DECIMAL(38,0))").mkString(" + ")
    val sumVarI = (1 to 5).map(i =>
      s"CAST(n$i AS DECIMAL(38,0)) * CAST(n$i AS DECIMAL(38,0)) " +
        s"* (CAST(n$i AS DECIMAL(38,0)) * 2 + 3)").mkString(" + ")
    s"""WITH o AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
       |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
       |  FROM orders),
       |pv AS (SELECT v, $cs FROM o GROUP BY v),
       |sc AS (SELECT v, c1, c2, c3, c4, c5, $cums FROM pv),
       |m AS (SELECT ${(1 to 5).map(i => s"CAST(SUM(c$i) AS BIGINT) AS n$i").mkString(", ")},
       |    CAST(SUM($jt2) AS DECIMAL(38,0)) AS jt2 FROM sc)
       |SELECT $n AS n, CAST(jt2 AS BIGINT) AS jt2,
       |  ROUND((CAST(jt2 AS DOUBLE) / 2.0
       |      - CAST(CAST($n AS DECIMAL(38,0)) * CAST($n AS DECIMAL(38,0)) - ($sumNi2) AS DOUBLE) / 4.0)
       |    / sqrt(CAST(CAST($n AS DECIMAL(38,0)) * CAST($n AS DECIMAL(38,0))
       |        * (CAST($n AS DECIMAL(38,0)) * 2 + 3) - ($sumVarI) AS DOUBLE) / 72.0), 6) AS z
       |FROM m""".stripMargin
  }

  /** Kendall's W concordance: do the 12 calendar months agree on how
    * the five priority classes rank by revenue? The judges×items frame
    * is key-domain-bounded (12×5 at ANY scale — the distributed work is
    * the monthly aggregate), ranks are tie-free by near-unique revenue
    * cents with a deterministic item tie-break, and 4·S stays an exact
    * integer via the doubled deviation (2R − k(m+1))². W = 3·S4 /
    * (k²·m·(m²−1)) with S4 = Σ(2Rⱼ−k(m+1))². */
  private[graft] def anKendallW(s: SparkSession, dir: String): DataFrame = {
    val cents = (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint")
    val monthly = Tables.orders(s, dir)
      .groupBy(month(col("o_orderdate")).as("mth"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("item"))
      .agg(sum(cents).as("rev_c"))
    val rnk = monthly.withColumn("rnk", row_number().over(
      Window.partitionBy(col("mth")).orderBy(col("rev_c"), col("item"))))
    val rsum = rnk.groupBy(col("item"))
      .agg(sum(col("rnk")).as("r"), count(lit(1)).as("kj"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withKm = rsum
      .withColumn("k", max(col("kj")).over(wAll))
      .withColumn("m", count(lit(1)).over(wAll))
    val dev = col("r") * 2 - col("k") * (col("m") + 1)
    withKm.agg(max(col("k")).as("k_judges"), max(col("m")).as("m_items"),
        sum(dev * dev).as("s4"))
      .select(col("k_judges"), col("m_items"), col("s4"),
        round(lit(3.0) * col("s4").cast("double") /
          (col("k_judges") * col("k_judges") * col("m_items") *
            (col("m_items") * col("m_items") - 1)).cast("double"), 6).as("w"))
  }

  private[graft] lazy val anKendallWSql =
    """WITH monthly AS (SELECT month(o_orderdate) AS mth,
      |    CAST(substr(o_orderpriority, 1, 1) AS INT) AS item,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM orders GROUP BY 1, 2),
      |r AS (SELECT item,
      |    ROW_NUMBER() OVER (PARTITION BY mth ORDER BY rev_c, item) AS rnk
      |  FROM monthly),
      |rs AS (SELECT item, CAST(SUM(rnk) AS BIGINT) AS r, COUNT(*) AS kj FROM r GROUP BY item),
      |km AS (SELECT r, MAX(kj) OVER () AS k, COUNT(*) OVER () AS m FROM rs),
      |agg AS (SELECT MAX(k) AS k_judges, MAX(m) AS m_items,
      |    CAST(SUM((r * 2 - k * (m + 1)) * (r * 2 - k * (m + 1))) AS BIGINT) AS s4
      |  FROM km)
      |SELECT k_judges, m_items, s4,
      |  ROUND(3.0 * CAST(s4 AS DOUBLE)
      |    / CAST(k_judges * k_judges * m_items * (m_items * m_items - 1) AS DOUBLE), 6) AS w
      |FROM agg""".stripMargin

  /** Cronbach's alpha over the four quarter-of-year spend "items" per
    * customer — the internal-consistency coefficient re-expressed for
    * behavioral panels (do the quarters measure the same underlying
    * propensity?). The item matrix is customers×4 built in ONE orders
    * pass (conditional exact-cents sums, zero-filled through the
    * customer dimension so non-purchasers count), all four item
    * variances AND the total-score variance from exact decimal moment
    * sums in one reduction; α = k/(k−1)·(1 − Σvarᵢ/var_total). */
  private[graft] def anCronbachAlpha(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val cents = (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint")
    val q = quarter(col("o_orderdate"))
    val qAggs = (1 to 4).map(i => sum(when(q === i, cents).otherwise(0L)).as(s"q$i"))
    val per = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(qAggs.head, qAggs.tail: _*)
    val all = Tables.customer(s, dir).select(col("c_custkey"))
      .join(per, col("c_custkey") === col("o_custkey"), "left")
      .select((1 to 4).map(i => coalesce(col(s"q$i"), lit(0L)).as(s"q$i")): _*)
      .withColumn("tot", (1 to 4).map(i => col(s"q$i")).reduce(_ + _))
    val aAggs = count(lit(1)).as("n") +:
      (1 to 4).flatMap(i => Seq(sum(d38(col(s"q$i"))).as(s"s1_$i"),
        sum(d38(col(s"q$i")) * d38(col(s"q$i"))).as(s"s2_$i"))) :+
      sum(d38(col("tot"))).as("s1_t") :+
      sum(d38(col("tot")) * d38(col("tot"))).as("s2_t")
    val m = all.agg(aAggs.head, aAggs.tail: _*)
    def vr(s1: String, s2: String): Column =
      (d38(col("n")) * col(s2) - col(s1) * col(s1)).cast("double") /
        (col("n").cast("double") * (col("n") - 1).cast("double"))
    val sumVi = (1 to 4).map(i => vr(s"s1_$i", s"s2_$i")).reduce(_ + _)
    m.select(col("n").as("n_customers"),
      round(vr("s1_t", "s2_t") / 1e4, 2).as("var_total"),
      round(lit(4.0) / 3.0 * (lit(1.0) - sumVi / vr("s1_t", "s2_t")), 6).as("alpha"))
  }

  private[graft] lazy val anCronbachAlphaSql = {
    def vr(s1: String, s2: String) =
      s"(CAST(CAST(n AS DECIMAL(38,0)) * $s2 - $s1 * $s1 AS DOUBLE) " +
        s"/ (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))"
    val sumVi = (1 to 4).map(i => vr(s"s1_$i", s"s2_$i")).mkString(" + ")
    s"""WITH per AS (SELECT o_custkey,
       |    ${(1 to 4).map(i => s"CAST(SUM(CASE WHEN quarter(o_orderdate) = $i " +
      s"THEN CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS q$i")
      .mkString(", ")}
       |  FROM orders GROUP BY o_custkey),
       |allc AS (SELECT ${(1 to 4).map(i => s"COALESCE(q$i, 0) AS q$i").mkString(", ")},
       |    COALESCE(q1, 0) + COALESCE(q2, 0) + COALESCE(q3, 0) + COALESCE(q4, 0) AS tot
       |  FROM customer LEFT JOIN per ON c_custkey = o_custkey),
       |m AS (SELECT COUNT(*) AS n,
       |    ${(1 to 4).map(i => s"SUM(CAST(q$i AS DECIMAL(38,0))) AS s1_$i, " +
      s"SUM(CAST(q$i AS DECIMAL(38,0)) * CAST(q$i AS DECIMAL(38,0))) AS s2_$i").mkString(", ")},
       |    SUM(CAST(tot AS DECIMAL(38,0))) AS s1_t,
       |    SUM(CAST(tot AS DECIMAL(38,0)) * CAST(tot AS DECIMAL(38,0))) AS s2_t
       |  FROM allc)
       |SELECT n AS n_customers,
       |  ROUND(${vr("s1_t", "s2_t")} / 1e4, 2) AS var_total,
       |  ROUND(4.0 / 3.0 * (1.0 - ($sumVi) / ${vr("s1_t", "s2_t")}), 6) AS alpha
       |FROM m""".stripMargin
  }

  /** Bland–Altman agreement between the billed line price and the
    * catalog-implied price (retail × quantity): mean difference (bias),
    * limits of agreement ±1.96·SD, and the count of lines outside them
    * — the method-comparison summary that a correlation can't give.
    * Differences are EXACT cents off the decimal product, moments exact
    * decimals; the outside-LoA pass re-reads with the broadcast scalar
    * (an_dow_chi2 posture). */
  private[graft] def anBlandAltman(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val m1 = (col("l_extendedprice").cast("decimal(24,2)") * 100).cast("bigint")
    val m2 = ((col("p_retailprice").cast("decimal(24,2)") *
      col("l_quantity").cast("decimal(10,0)")).cast("decimal(24,2)") * 100).cast("bigint")
    val j = Tables.lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .select((m1 - m2).as("d"))
    val stats = j.agg(count(lit(1)).as("n"), sum(d38(col("d"))).as("s1"),
      sum(d38(col("d")) * d38(col("d"))).as("s2"))
    val mean = col("s1").cast("double") / col("n").cast("double")
    val sd = sqrt((d38(col("n")) * col("s2") - col("s1") * col("s1")).cast("double") /
      (col("n").cast("double") * (col("n") - 1).cast("double")))
    val withBands = stats.select(col("n"), mean.as("mu"), sd.as("sd"))
    j.crossJoin(broadcast(withBands))
      .agg(max(col("n")).as("n"),
        round(max(col("mu")) / 100.0, 4).as("mean_diff"),
        round(max(col("sd")) / 100.0, 4).as("sd_diff"),
        round((max(col("mu")) - lit(1.96) * max(col("sd"))) / 100.0, 4).as("loa_lo"),
        round((max(col("mu")) + lit(1.96) * max(col("sd"))) / 100.0, 4).as("loa_hi"),
        sum((abs(col("d").cast("double") - col("mu")) >
          lit(1.96) * col("sd")).cast("long")).as("n_outside"))
  }

  private[graft] lazy val anBlandAltmanSql =
    """WITH j AS (SELECT
      |    CAST(CAST(l_extendedprice AS DECIMAL(24,2)) * 100 AS BIGINT)
      |    - CAST(CAST(CAST(p_retailprice AS DECIMAL(24,2))
      |        * CAST(l_quantity AS DECIMAL(10,0)) AS DECIMAL(24,2)) * 100 AS BIGINT) AS d
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |st AS (SELECT COUNT(*) AS n, SUM(CAST(d AS DECIMAL(38,0))) AS s1,
      |    SUM(CAST(d AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0))) AS s2 FROM j),
      |b AS (SELECT n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
      |    sqrt(CAST(CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1 AS DOUBLE)
      |      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS sd
      |  FROM st)
      |SELECT MAX(n) AS n,
      |  ROUND(MAX(mu) / 100.0, 4) AS mean_diff,
      |  ROUND(MAX(sd) / 100.0, 4) AS sd_diff,
      |  ROUND((MAX(mu) - 1.96 * MAX(sd)) / 100.0, 4) AS loa_lo,
      |  ROUND((MAX(mu) + 1.96 * MAX(sd)) / 100.0, 4) AS loa_hi,
      |  CAST(SUM(CASE WHEN ABS(CAST(d AS DOUBLE) - mu) > 1.96 * sd
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outside
      |FROM j CROSS JOIN b""".stripMargin

  /** Deming (errors-in-variables, λ=1) regression of daily revenue on
    * daily line count — two error-carrying "instruments" measuring the
    * same latent daily activity (corr ≈ 0.85 on this corpus), where OLS
    * (an_linreg) is attenuation-biased toward 0. Closed form off
    * exact-decimal centered moments over the calendar-bounded day
    * frame: slope = (Syy−Sxx+√((Syy−Sxx)²+4Sxy²))/(2Sxy); the moment
    * differences stay exact integers until the final IEEE tree. */
  private[graft] def anDeming(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val j = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(count(lit(1)).as("x"),
        (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
          .cast("bigint").as("y"))
    val m = j.agg(count(lit(1)).as("n"),
      sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
      sum(d38(col("x")) * d38(col("x"))).as("sxx"),
      sum(d38(col("y")) * d38(col("y"))).as("syy"),
      sum(d38(col("x")) * d38(col("y"))).as("sxy"))
    val cxx = (d38(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double")
    val cyy = (d38(col("n")) * col("syy") - col("sy") * col("sy")).cast("double")
    val cxy = (d38(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double")
    val slope = (cyy - cxx + sqrt((cyy - cxx) * (cyy - cxx) +
      lit(4.0) * cxy * cxy)) / (lit(2.0) * cxy)
    m.select(col("n"), round(slope, 6).as("slope"),
      round((col("sy").cast("double") - slope * col("sx").cast("double")) /
        col("n").cast("double") / 100.0, 4).as("intercept"))
  }

  private[graft] lazy val anDemingSql = {
    val cxx = "CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)"
    val cyy = "CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)"
    val cxy = "CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)"
    val slope = s"(($cyy - $cxx + sqrt(($cyy - $cxx) * ($cyy - $cxx) " +
      s"+ 4.0 * $cxy * $cxy)) / (2.0 * $cxy))"
    s"""WITH j AS (SELECT COUNT(*) AS x,
       |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount)
       |      AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS y
       |  FROM lineitem GROUP BY date_trunc('day', l_shipdate)),
       |m AS (SELECT COUNT(*) AS n,
       |    SUM(CAST(x AS DECIMAL(38,0))) AS sx, SUM(CAST(y AS DECIMAL(38,0))) AS sy,
       |    SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx,
       |    SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS syy,
       |    SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy
       |  FROM j)
       |SELECT n, ROUND($slope, 6) AS slope,
       |  ROUND((CAST(sy AS DOUBLE) - $slope * CAST(sx AS DOUBLE))
       |    / CAST(n AS DOUBLE) / 100.0, 4) AS intercept
       |FROM m""".stripMargin
  }

  /** MASE + sMAPE rolling backtest — the scale-free companions to
    * an_mape_backtest's WAPE on the same 28-day holdout × 7 horizons:
    * MASE divides each horizon's MAE by the in-sample MAE of the 7-day
    * seasonal naive (Hyndman's unit-free yardstick, defined when a day
    * is zero where MAPE explodes), sMAPE gathers its bounded per-day
    * ratios through DECIMAL(38,18). The holdout split is an exact max-
    * day broadcast scalar, not a global rank window. */
  private[graft] def anMase(s: SparkSession, dir: String): DataFrame = {
    // the spine feeds FIVE consumers (cutoff, train×2, holdout, pred
    // join) — stabilize it once so the lineitem aggregate runs once,
    // not five times (the text_pmi_collocations lesson)
    val daily = graft.operators.Checkpoints.stabilizeLazy(
      dailyRevenueSpine(s, dir)
        .select(col("d").cast("long").as("dno"), col("rev_c")))
    val cut = daily.agg((max(col("dno")) - 28).as("cutoff"))
    val train = daily.crossJoin(broadcast(cut)).filter(col("dno") <= col("cutoff"))
    // day-spine frames are calendar-bounded — broadcast explicitly
    // (the stabilized frame carries no stats, so auto-broadcast is off)
    val insample = train.as("a").join(
      broadcast(train.select((col("dno") + 7).as("dno"), col("rev_c").as("snaive_c"))),
      "dno")
      .agg(sum(abs(col("rev_c") - col("snaive_c"))).as("is_abs_c"),
        count(lit(1)).as("is_n"))
    val hold = daily.crossJoin(broadcast(cut)).filter(col("dno") > col("cutoff"))
      .select(col("dno"), col("rev_c"), explode(sequence(lit(1L), lit(7L))).as("h"))
      .withColumn("pdno", col("dno") - col("h"))
      .join(broadcast(daily.select(col("dno").as("pdno"), col("rev_c").as("pred_c"))),
        "pdno")
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    hold.groupBy(col("h"))
      .agg(count(lit(1)).as("n"),
        sum(abs(col("rev_c") - col("pred_c"))).as("abs_err_c"),
        sum(d18(lit(2.0) * abs(col("rev_c") - col("pred_c")).cast("double") /
          (col("rev_c") + col("pred_c")).cast("double"))).as("sm"))
      .crossJoin(broadcast(insample))
      .select(col("h"), col("n"),
        round((col("abs_err_c").cast("double") / col("n").cast("double")) /
          (col("is_abs_c").cast("double") / col("is_n").cast("double")), 6).as("mase"),
        round(col("sm").cast("double") / col("n").cast("double"), 6).as("smape"))
      .orderBy(col("h"))
  }

  private[graft] lazy val anMaseSql =
    s"""WITH daily AS (SELECT CAST(d AS BIGINT) AS dno, rev_c FROM ($dailySpineSql)),
       |cut AS (SELECT MAX(dno) - 28 AS cutoff FROM daily),
       |train AS (SELECT dno, rev_c FROM daily CROSS JOIN cut WHERE dno <= cutoff),
       |ins AS (SELECT CAST(SUM(ABS(a.rev_c - b.rev_c)) AS BIGINT) AS is_abs_c,
       |    COUNT(*) AS is_n
       |  FROM train a JOIN train b ON a.dno = b.dno + 7),
       |hold AS (SELECT h.dno, h.rev_c, CAST(t.range AS BIGINT) AS h
       |  FROM (SELECT dno, rev_c FROM daily CROSS JOIN cut WHERE dno > cutoff) h
       |  CROSS JOIN range(1, 8) t),
       |j AS (SELECT hold.h, hold.rev_c, p.rev_c AS pred_c
       |  FROM hold JOIN daily p ON p.dno = hold.dno - hold.h),
       |g AS (SELECT h, COUNT(*) AS n,
       |    CAST(SUM(ABS(rev_c - pred_c)) AS BIGINT) AS abs_err_c,
       |    SUM(CAST(2.0 * CAST(ABS(rev_c - pred_c) AS DOUBLE)
       |      / CAST(rev_c + pred_c AS DOUBLE) AS DECIMAL(38,18))) AS sm
       |  FROM j GROUP BY h)
       |SELECT h, n,
       |  ROUND((CAST(abs_err_c AS DOUBLE) / CAST(n AS DOUBLE))
       |    / (CAST(is_abs_c AS DOUBLE) / CAST(is_n AS DOUBLE)), 6) AS mase,
       |  ROUND(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE), 6) AS smape
       |FROM g CROSS JOIN ins ORDER BY h""".stripMargin

  /** Cook's distance over the daily-revenue OLS fit: the ten most
    * influential days (Dᵢ = eᵢ²hᵢ / (p·s²(1−hᵢ)²), p=2) — the
    * regression-diagnostics "which days bent the trend line" answer.
    * One exact-decimal stats pass (SSE via the centered-moment identity
    * Syy−b·Sxy, no residual re-aggregation), one row-local pass for
    * e/h/D, limit-first TakeOrdered on the rounded statistic with a
    * day tie-break. */
  private[graft] def anCooksDistance(s: SparkSession, dir: String): DataFrame = {
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
      // SSE = (Cyy − b·Cxy)/n off the exact centered moments
      ((cyy - (cxy / cxx) * cxy) / col("n").cast("double")).as("sse"))
    spine.crossJoin(broadcast(m))
      .withColumn("e", col("rev_c").cast("double") - col("icept") -
        col("slope") * col("d").cast("double"))
      .withColumn("hlev", lit(1.0) / col("n").cast("double") +
        (col("d").cast("double") - col("xbar")) * (col("d").cast("double") - col("xbar")) /
          col("sxx_c"))
      .withColumn("s2", col("sse") / (col("n") - 2).cast("double"))
      .select(col("d").as("day_no"),
        round(col("e") / 100.0, 2).as("resid_usd"),
        round(col("hlev"), 6).as("leverage"),
        round(col("e") * col("e") * col("hlev") /
          (lit(2.0) * col("s2") * (lit(1.0) - col("hlev")) *
            (lit(1.0) - col("hlev"))), 6).as("cooks_d"))
      .orderBy(col("cooks_d").desc, col("day_no")).limit(10)
  }

  private[graft] lazy val anCooksDistanceSql = {
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
       |    (CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE) * ($cxy / $cxx)) / CAST(n AS DOUBLE) AS icept,
       |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
       |    $cxx / CAST(n AS DOUBLE) AS sxx_c,
       |    ($cyy - ($cxy / $cxx) * $cxy) / CAST(n AS DOUBLE) AS sse
       |  FROM m0),
       |r AS (SELECT d AS day_no,
       |    CAST(rev_c AS DOUBLE) - icept - slope * CAST(d AS DOUBLE) AS e,
       |    1.0 / CAST(n AS DOUBLE)
       |      + (CAST(d AS DOUBLE) - xbar) * (CAST(d AS DOUBLE) - xbar) / sxx_c AS hlev,
       |    sse / CAST(n - 2 AS DOUBLE) AS s2
       |  FROM daily CROSS JOIN m)
       |SELECT day_no, ROUND(e / 100.0, 2) AS resid_usd,
       |  ROUND(hlev, 6) AS leverage,
       |  ROUND(e * e * hlev / (2.0 * s2 * (1.0 - hlev) * (1.0 - hlev)), 6) AS cooks_d
       |FROM r
       |ORDER BY ROUND(e * e * hlev / (2.0 * s2 * (1.0 - hlev) * (1.0 - hlev)), 6) DESC, day_no
       |LIMIT 10""".stripMargin
  }

  /** Breusch–Pagan heteroskedasticity test on the daily-revenue trend
    * residuals: regress e² on the day index, BP = n·R²_aux — the "is
    * the variance itself trending" gate that decides whether an_linreg
    * standard errors can be trusted. Residuals are bit-identical
    * doubles off the exact OLS sums (the an_durbin_watson discipline);
    * the auxiliary sums gather e²-scale terms through DECIMAL(38,6)
    * so the reduction is partitioning-independent. */
  private[graft] def anBreuschPagan(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val spine = dailyRevenueSpine(s, dir).select(col("d"), col("rev_c"))
    val m = spine.agg(count(lit(1)).as("n"),
      sum(d38(col("d"))).as("sx"), sum(d38(col("rev_c"))).as("sy"),
      sum(d38(col("d")) * d38(col("d"))).as("sxx"),
      sum(d38(col("d")) * d38(col("rev_c"))).as("sxy"))
    val slope = (d38(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double") /
      (d38(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double")
    val withB = m.select(col("n"), col("sx"), col("sxx"), col("sy"), slope.as("slope"),
      ((col("sy").cast("double") - col("sx").cast("double") * slope) /
        col("n").cast("double")).as("icept"))
    val d6 = (c: Column) => c.cast("decimal(38,6)")
    // u = e² of the MEAN-RELATIVE residual (e scaled by ȳ, not a fixed
    // /100): R² is invariant under any constant rescale of u, and the
    // relative residual is O(1) at ANY scale factor — the r19 sf10
    // probe caught the fixed dollar rescale overflowing DECIMAL(38,6)
    // at 1000× (Σu² grew with the 4th power of the revenue level)
    val aux = spine.crossJoin(broadcast(withB))
      .withColumn("ybar", col("sy").cast("double") / col("n").cast("double"))
      .withColumn("e", (col("rev_c").cast("double") - col("icept") -
        col("slope") * col("d").cast("double")) / col("ybar"))
      .withColumn("u", col("e") * col("e"))
      .agg(max(col("n")).as("n"),
        max(col("sx")).as("sx"), max(col("sxx")).as("sxx"),
        sum(d6(col("u"))).as("su"),
        sum(d6(col("u") * col("d").cast("double"))).as("sdu"),
        sum(d6(col("u") * col("u"))).as("suu"))
    val sxuC = col("n").cast("double") * col("sdu").cast("double") -
      col("sx").cast("double") * col("su").cast("double")
    val sxxC = (d38(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double")
    val suuC = col("n").cast("double") * col("suu").cast("double") -
      col("su").cast("double") * col("su").cast("double")
    aux.select(col("n").as("n_days"),
      round(sxuC * sxuC / (sxxC * suuC), 6).as("r2_aux"),
      round(col("n").cast("double") * sxuC * sxuC / (sxxC * suuC), 6).as("bp"))
  }

  private[graft] lazy val anBreuschPaganSql = {
    val slope = "(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE) " +
      "/ CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE))"
    val sxuC = "(CAST(n AS DOUBLE) * CAST(sdu AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE))"
    val sxxC = "CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)"
    val suuC = "(CAST(n AS DOUBLE) * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))"
    s"""WITH daily AS ($dailySpineSql),
       |m AS (SELECT COUNT(*) AS n,
       |    SUM(CAST(d AS DECIMAL(38,0))) AS sx, SUM(CAST(rev_c AS DECIMAL(38,0))) AS sy,
       |    SUM(CAST(d AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0))) AS sxx,
       |    SUM(CAST(d AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0))) AS sxy
       |  FROM daily),
       |b AS (SELECT n, sx, sxx, sy, $slope AS slope,
       |    (CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE) * $slope) / CAST(n AS DOUBLE) AS icept
       |  FROM m),
       |e AS (SELECT d, n, sx, sxx,
       |    (CAST(rev_c AS DOUBLE) - icept - slope * CAST(d AS DOUBLE))
       |      / (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS e
       |  FROM daily CROSS JOIN b),
       |aux AS (SELECT MAX(n) AS n, MAX(sx) AS sx, MAX(sxx) AS sxx,
       |    SUM(CAST(e * e AS DECIMAL(38,6))) AS su,
       |    SUM(CAST((e * e) * CAST(d AS DOUBLE) AS DECIMAL(38,6))) AS sdu,
       |    SUM(CAST((e * e) * (e * e) AS DECIMAL(38,6))) AS suu
       |  FROM e)
       |SELECT n AS n_days,
       |  ROUND($sxuC * $sxuC / ($sxxC * $suuC), 6) AS r2_aux,
       |  ROUND(CAST(n AS DOUBLE) * $sxuC * $sxuC / ($sxxC * $suuC), 6) AS bp
       |FROM aux""".stripMargin
  }

  /** Cuzick's trend test across the ordered priority classes — the
    * rank-based cousin of an_jonckheere (Wilcoxon-type score statistic
    * vs pair counts; both detect monotone alternatives an_kruskal
    * dilutes). Because the group scores are l_i = i, the weighted rank
    * sum collapses to posting sums: ONE distinct-cent scan with
    * (count, Σscore, Σscore²) per value + the running total — no
    * per-group pivot at all. 2T stays an exact integer via doubled
    * midranks; the tie-corrected variance is exact decimals to the
    * final IEEE division. */
  private[graft] def anCuzick(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val cents = (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint")
    val o = Tables.orders(s, dir)
      .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("g"), cents.as("v"))
    val pv = o.groupBy(col("v"))
      .agg(count(lit(1)).as("ct"), sum(col("g")).as("sw"),
        sum(col("g") * col("g")).as("sw2"))
    val scan = graft.operators.PrefixSum.withRunningTotals(pv, Seq("v"), Seq("ct"))
    val m = scan.agg(sum(col("ct")).as("n"),
      sum(col("sw")).as("lsum"), sum(col("sw2")).as("l2sum"),
      // 2T = Σ_v Σg(v)·(2·cumlt + ct + 1), doubled midranks exact
      sum(d38(col("sw")) *
        (d38(col("ct_cum") - col("ct")) * 2 + d38(col("ct")) + 1)).as("t2"),
      sum(d38(col("ct")) * d38(col("ct")) * d38(col("ct")) - d38(col("ct"))).as("ties"))
    val n38 = d38(col("n"))
    val varT = ((n38 + 1) * (n38 * d38(col("l2sum")) -
      d38(col("lsum")) * d38(col("lsum")))).cast("double") / 12.0 *
      (lit(1.0) - col("ties").cast("double") /
        (n38 * n38 * n38 - n38).cast("double"))
    m.select(col("n"), col("t2").cast("bigint").as("t2"),
      round((col("t2").cast("double") / 2.0 -
          ((n38 + 1) * d38(col("lsum"))).cast("double") / 2.0) / sqrt(varT), 6)
        .as("z"))
  }

  private[graft] lazy val anCuzickSql =
    """WITH o AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS g,
      |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |pv AS (SELECT v, COUNT(*) AS ct, CAST(SUM(g) AS BIGINT) AS sw,
      |    CAST(SUM(g * g) AS BIGINT) AS sw2 FROM o GROUP BY v),
      |sc AS (SELECT ct, sw, sw2,
      |    CAST(SUM(ct) OVER (ORDER BY v) AS BIGINT) - ct AS cumlt FROM pv),
      |m AS (SELECT CAST(SUM(ct) AS BIGINT) AS n,
      |    CAST(SUM(sw) AS BIGINT) AS lsum, CAST(SUM(sw2) AS BIGINT) AS l2sum,
      |    CAST(SUM(CAST(sw AS DECIMAL(18,0)) *
      |      (CAST(cumlt AS DECIMAL(18,0)) * 2 + CAST(ct AS DECIMAL(18,0)) + 1))
      |      AS DECIMAL(38,0)) AS t2,
      |    CAST(SUM(CAST(ct AS DECIMAL(18,0)) * CAST(ct AS DECIMAL(18,0))
      |        * CAST(ct AS DECIMAL(18,0)) - CAST(ct AS DECIMAL(18,0)))
      |      AS DECIMAL(38,0)) AS ties
      |  FROM sc)
      |SELECT n, CAST(t2 AS BIGINT) AS t2,
      |  ROUND((CAST(t2 AS DOUBLE) / 2.0
      |      - CAST((CAST(n AS DECIMAL(38,0)) + 1) * CAST(lsum AS DECIMAL(38,0)) AS DOUBLE) / 2.0)
      |    / sqrt(CAST((CAST(n AS DECIMAL(38,0)) + 1)
      |        * (CAST(n AS DECIMAL(38,0)) * CAST(l2sum AS DECIMAL(38,0))
      |          - CAST(lsum AS DECIMAL(38,0)) * CAST(lsum AS DECIMAL(38,0))) AS DOUBLE) / 12.0
      |      * (1.0 - CAST(ties AS DOUBLE)
      |        / CAST(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))
      |            * CAST(n AS DECIMAL(38,0)) - CAST(n AS DECIMAL(38,0)) AS DOUBLE))), 6) AS z
      |FROM m""".stripMargin

  /** Page's L trend test over the months×priorities rank table — the
    * ordered-alternative refinement of an_friedman exactly as
    * an_jonckheere refines an_kruskal, sharing an_kendall_w's
    * key-domain-bounded (12×5) rank frame. L = Σ j·Rⱼ is an exact
    * integer; E and Var are the closed-form k·m expressions, z one
    * IEEE division ROUND 6. */
  private[graft] def anPageTrend(s: SparkSession, dir: String): DataFrame = {
    val cents = (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint")
    val monthly = Tables.orders(s, dir)
      .groupBy(month(col("o_orderdate")).as("mth"),
        substring(col("o_orderpriority"), 1, 1).cast("int").as("item"))
      .agg(sum(cents).as("rev_c"))
    val rnk = monthly.withColumn("rnk", row_number().over(
      Window.partitionBy(col("mth")).orderBy(col("rev_c"), col("item"))))
    val rsum = rnk.groupBy(col("item"))
      .agg(sum(col("rnk")).as("r"), count(lit(1)).as("kj"))
    val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withKm = rsum
      .withColumn("k", max(col("kj")).over(wAll))
      .withColumn("m", count(lit(1)).over(wAll))
    withKm.agg(max(col("k")).as("k_judges"), max(col("m")).as("m_items"),
        sum(col("item") * col("r")).as("l"))
      .select(col("k_judges"), col("m_items"), col("l"),
        round((col("l").cast("double") -
            col("k_judges").cast("double") * col("m_items").cast("double") *
              (col("m_items") + 1).cast("double") * (col("m_items") + 1).cast("double") / 4.0) /
          sqrt(col("k_judges").cast("double") *
            col("m_items").cast("double") * col("m_items").cast("double") *
            (col("m_items") + 1).cast("double") * (col("m_items") + 1).cast("double") *
            (col("m_items") - 1).cast("double") / 144.0), 6).as("z"))
  }

  private[graft] lazy val anPageTrendSql =
    """WITH monthly AS (SELECT month(o_orderdate) AS mth,
      |    CAST(substr(o_orderpriority, 1, 1) AS INT) AS item,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM orders GROUP BY 1, 2),
      |r AS (SELECT item,
      |    ROW_NUMBER() OVER (PARTITION BY mth ORDER BY rev_c, item) AS rnk
      |  FROM monthly),
      |rs AS (SELECT item, CAST(SUM(rnk) AS BIGINT) AS r, COUNT(*) AS kj FROM r GROUP BY item),
      |km AS (SELECT item, r, MAX(kj) OVER () AS k, COUNT(*) OVER () AS m FROM rs),
      |agg AS (SELECT MAX(k) AS k_judges, MAX(m) AS m_items,
      |    CAST(SUM(item * r) AS BIGINT) AS l FROM km)
      |SELECT k_judges, m_items, l,
      |  ROUND((CAST(l AS DOUBLE)
      |      - CAST(k_judges AS DOUBLE) * CAST(m_items AS DOUBLE)
      |        * CAST(m_items + 1 AS DOUBLE) * CAST(m_items + 1 AS DOUBLE) / 4.0)
      |    / sqrt(CAST(k_judges AS DOUBLE) * CAST(m_items AS DOUBLE) * CAST(m_items AS DOUBLE)
      |      * CAST(m_items + 1 AS DOUBLE) * CAST(m_items + 1 AS DOUBLE)
      |      * CAST(m_items - 1 AS DOUBLE) / 144.0), 6) AS z
      |FROM agg""".stripMargin

  /** Delta-method standard error for the ratio metric revenue-per-
    * order, per market segment — the A/B-experimentation primitive for
    * cluster-randomized ratio metrics (Deng et al.: users are the
    * randomization unit, so the naive per-order SE is wrong; the
    * customer-level delta method is right). Customer-level (orders,
    * revenue) moments are exact decimals in one pass over the
    * customer-joined orders; Var(R̂) ≈ (s_y² − 2R·s_xy + R²·s_x²)
    * / (n·x̄²), one shared IEEE tree. */
  private[graft] def anDeltaMethod(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val cents = (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint")
    val per = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("x"), sum(cents).as("y"))
    val all = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
      .join(per, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment").as("segment"),
        coalesce(col("x"), lit(0L)).as("x"), coalesce(col("y"), lit(0L)).as("y"))
    val m = all.groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
        sum(d38(col("x")) * d38(col("x"))).as("sxx"),
        sum(d38(col("y")) * d38(col("y"))).as("syy"),
        sum(d38(col("x")) * d38(col("y"))).as("sxy"))
    val nD = col("n").cast("double")
    val xbar = col("sx").cast("double") / nD
    val r = col("sy").cast("double") / col("sx").cast("double")
    def svar(a: String, b: String, sab: Column): Column =
      (d38(col("n")) * sab).cast("double") / (nD * (nD - 1)) -
        (col(a).cast("double") / nD) * (col(b).cast("double") / (nD - 1))
    val vy = svar("sy", "sy", col("syy"))
    val vx = svar("sx", "sx", col("sxx"))
    val cxy = svar("sx", "sy", col("sxy"))
    m.select(col("segment"), col("n").as("n_customers"),
      round(r / 100.0, 4).as("rev_per_order"),
      round(sqrt((vy - lit(2.0) * r * cxy + r * r * vx) / (nD * xbar * xbar)) /
        100.0, 6).as("se_delta"))
      .orderBy(col("segment"))
  }

  private[graft] lazy val anDeltaMethodSql = {
    def svar(a: String, b: String, sab: String) =
      s"(CAST(CAST(n AS DECIMAL(38,0)) * $sab AS DOUBLE) " +
        s"/ (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) " +
        s"- (CAST($a AS DOUBLE) / CAST(n AS DOUBLE)) " +
        s"* (CAST($b AS DOUBLE) / CAST(n - 1 AS DOUBLE)))"
    val vy = svar("sy", "sy", "syy"); val vx = svar("sx", "sx", "sxx")
    val cxy = svar("sx", "sy", "sxy")
    val r = "(CAST(sy AS DOUBLE) / CAST(sx AS DOUBLE))"
    s"""WITH per AS (SELECT o_custkey, COUNT(*) AS x,
       |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS y
       |  FROM orders GROUP BY o_custkey),
       |allc AS (SELECT c_mktsegment AS segment,
       |    COALESCE(x, 0) AS x, COALESCE(y, 0) AS y
       |  FROM customer LEFT JOIN per ON c_custkey = o_custkey),
       |m AS (SELECT segment, COUNT(*) AS n,
       |    SUM(CAST(x AS DECIMAL(38,0))) AS sx, SUM(CAST(y AS DECIMAL(38,0))) AS sy,
       |    SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS sxx,
       |    SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS syy,
       |    SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS sxy
       |  FROM allc GROUP BY segment)
       |SELECT segment, n AS n_customers,
       |  ROUND($r / 100.0, 4) AS rev_per_order,
       |  ROUND(sqrt(($vy - 2.0 * $r * $cxy + $r * $r * $vx)
       |    / (CAST(n AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
       |      * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))) / 100.0, 6) AS se_delta
       |FROM m ORDER BY segment""".stripMargin
  }

  /** Newey–West (HAC, Bartlett kernel, L=7) standard error for the
    * daily-revenue trend slope — the econometrics answer to what
    * an_durbin_watson detects: when residuals are serially correlated,
    * the OLS SE lies; the HAC SE widens it honestly. Residuals are
    * bit-identical doubles off the exact OLS sums, rescaled to dollars
    * for DECIMAL(38,6) gather headroom; the seven lag products ride
    * ONE ordered window over the calendar-bounded day frame. */
  private[graft] def anNeweyWest(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val spine = dailyRevenueSpine(s, dir).select(col("d"), col("rev_c"))
    val m = spine.agg(count(lit(1)).as("n"),
      sum(d38(col("d"))).as("sx"), sum(d38(col("rev_c"))).as("sy"),
      sum(d38(col("d")) * d38(col("d"))).as("sxx"),
      sum(d38(col("rev_c")) * d38(col("rev_c"))).as("syy"),
      sum(d38(col("d")) * d38(col("rev_c"))).as("sxy"))
    val cxx = (d38(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double")
    val cyy = (d38(col("n")) * col("syy") - col("sy") * col("sy")).cast("double")
    val cxy = (d38(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double")
    val b = m.select(col("n"), (cxy / cxx).as("slope"),
      ((col("sy").cast("double") - col("sx").cast("double") * (cxy / cxx)) /
        col("n").cast("double")).as("icept"),
      (col("sx").cast("double") / col("n").cast("double")).as("xbar"),
      (cxx / col("n").cast("double")).as("sxx_c"),
      ((cyy - (cxy / cxx) * cxy) / col("n").cast("double")).as("sse_c"))
    val d6 = (c: Column) => c.cast("decimal(38,6)")
    val lagW = Window.orderBy(col("d"))
    val vRow = spine.crossJoin(broadcast(b))
      // v_t = (x_t − x̄)·e_t with e in DOLLARS (gather headroom)
      .withColumn("v", (col("d").cast("double") - col("xbar")) *
        ((col("rev_c").cast("double") - col("icept") -
          col("slope") * col("d").cast("double")) / 100.0))
    val lagged = (1 to 7).foldLeft(vRow) { (df, l) =>
      df.withColumn(s"v$l", lag(col("v"), l).over(lagW)) }
    val gAggs = sum(d6(col("v") * col("v"))).as("g0") +:
      (1 to 7).map(l => sum(when(col(s"v$l").isNotNull,
        d6(col("v") * col(s"v$l")))).as(s"g$l"))
    val g = lagged.agg(gAggs.head, gAggs.tail: _*)
      .crossJoin(broadcast(b.select(col("n"), col("slope"), col("sxx_c"), col("sse_c"))))
    val sHac = col("g0").cast("double") +
      (1 to 7).map(l => lit(2.0) * (lit(1.0) - lit(l / 8.0)) *
        col(s"g$l").cast("double")).reduce(_ + _)
    val nD = col("n").cast("double")
    g.select(col("n").as("n_days"),
      round(col("slope") / 100.0, 6).as("slope_usd"),
      round(sqrt((col("sse_c") / 1e4 / (nD - 2)) / (nD * col("sxx_c"))), 6).as("se_ols"),
      round(sqrt(sHac / (nD * col("sxx_c")) / (nD * col("sxx_c")) * nD), 6).as("se_nw"),
      round(sqrt(sHac / (nD * col("sxx_c")) / (nD * col("sxx_c")) * nD) /
        sqrt((col("sse_c") / 1e4 / (nD - 2)) / (nD * col("sxx_c"))), 4).as("se_ratio"))
  }

  private[graft] lazy val anNeweyWestSql = {
    val cxx = "CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)"
    val cyy = "CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE)"
    val cxy = "CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)"
    val sHac = "(CAST(g0 AS DOUBLE) + " + (1 to 7).map(l =>
      s"2.0 * (1.0 - ${l / 8.0}) * CAST(g$l AS DOUBLE)").mkString(" + ") + ")"
    val seOls = "sqrt((sse_c / 1e4 / (CAST(n AS DOUBLE) - 2)) / (CAST(n AS DOUBLE) * sxx_c))"
    val seNw = s"sqrt($sHac / (CAST(n AS DOUBLE) * sxx_c) / (CAST(n AS DOUBLE) * sxx_c) * CAST(n AS DOUBLE))"
    s"""WITH daily AS ($dailySpineSql),
       |m AS (SELECT COUNT(*) AS n,
       |    SUM(CAST(d AS DECIMAL(38,0))) AS sx, SUM(CAST(rev_c AS DECIMAL(38,0))) AS sy,
       |    SUM(CAST(d AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0))) AS sxx,
       |    SUM(CAST(rev_c AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0))) AS syy,
       |    SUM(CAST(d AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0))) AS sxy
       |  FROM daily),
       |b AS (SELECT n, ($cxy / $cxx) AS slope,
       |    (CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE) * ($cxy / $cxx)) / CAST(n AS DOUBLE) AS icept,
       |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
       |    $cxx / CAST(n AS DOUBLE) AS sxx_c,
       |    ($cyy - ($cxy / $cxx) * $cxy) / CAST(n AS DOUBLE) AS sse_c
       |  FROM m),
       |v AS (SELECT d,
       |    (CAST(d AS DOUBLE) - xbar)
       |      * ((CAST(rev_c AS DOUBLE) - icept - slope * CAST(d AS DOUBLE)) / 100.0) AS v
       |  FROM daily CROSS JOIN b),
       |l AS (SELECT v, ${(1 to 7).map(l => s"LAG(v, $l) OVER (ORDER BY d) AS v$l").mkString(", ")}
       |  FROM v),
       |g AS (SELECT SUM(CAST(v * v AS DECIMAL(38,6))) AS g0,
       |    ${(1 to 7).map(l => s"SUM(CASE WHEN v$l IS NOT NULL THEN CAST(v * v$l AS DECIMAL(38,6)) END) AS g$l").mkString(", ")}
       |  FROM l)
       |SELECT n AS n_days,
       |  ROUND(slope / 100.0, 6) AS slope_usd,
       |  ROUND($seOls, 6) AS se_ols,
       |  ROUND($seNw, 6) AS se_nw,
       |  ROUND($seNw / $seOls, 4) AS se_ratio
       |FROM g CROSS JOIN b""".stripMargin
  }

  /** Atkinson inequality index (ε=1) of order values per market
    * segment: 1 − geometric/arithmetic mean — the welfare-weighted
    * complement to an_gini/an_lorenz (ε=1 weights transfers at the
    * bottom of the distribution). Arithmetic mean from exact cents,
    * ln terms gathered DECIMAL(38,18); scale-invariant so the cents
    * basis cancels. */
  private[graft] def anAtkinson(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val cents = (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint")
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), cents.as("v"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"), sum(d38(col("v"))).as("s1"),
        sum(d18(log(col("v").cast("double")))).as("slnv"))
      .select(col("segment"), col("n"),
        round(col("s1").cast("double") / col("n").cast("double") / 100.0, 2)
          .as("mean_usd"),
        round(lit(1.0) - exp(col("slnv").cast("double") / col("n").cast("double")) /
          (col("s1").cast("double") / col("n").cast("double")), 6).as("atkinson"))
      .orderBy(col("segment"))
  }

  private[graft] lazy val anAtkinsonSql =
    """WITH o AS (SELECT c_mktsegment AS segment,
      |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |m AS (SELECT segment, COUNT(*) AS n,
      |    SUM(CAST(v AS DECIMAL(38,0))) AS s1,
      |    SUM(CAST(ln(CAST(v AS DOUBLE)) AS DECIMAL(38,18))) AS slnv
      |  FROM o GROUP BY segment)
      |SELECT segment, n,
      |  ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 2) AS mean_usd,
      |  ROUND(1.0 - exp(CAST(slnv AS DOUBLE) / CAST(n AS DOUBLE))
      |    / (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS atkinson
      |FROM m ORDER BY segment""".stripMargin

  /** Brunner–Munzel test, BUILDING vs AUTOMOBILE order values — the
    * modern replacement for Mann–Whitney when the two groups may have
    * UNEQUAL variances/shapes (the nonparametric Behrens–Fisher
    * problem; an_mannwhitney assumes exchangeable shapes, this doesn't).
    * Placements P_ij = combined midrank − within-group midrank collapse
    * to exact integers when doubled (2P_b = 2·cumlt_a + c_a at each
    * distinct value), so both placement moments ride the SAME one
    * distinct-cent PrefixSum scan as an_cliffs_delta — no pair join,
    * no per-observation rank table. p̂ = P(X<Y)+½P(X=Y) and the W
    * statistic are one shared IEEE tree off exact sums. */
  private[graft] def anBrunnerMunzel(s: SparkSession, dir: String): DataFrame = {
    val d18i = (c: Column) => c.cast("decimal(18,0)")
    val o = Tables.orders(s, dir).join(
      Tables.customer(s, dir).filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(col("c_custkey"), col("c_mktsegment")),
      col("o_custkey") === col("c_custkey"))
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"),
        (col("c_mktsegment") === "BUILDING").cast("long").as("isa"))
    val pv = o.groupBy(col("v"))
      .agg(sum(col("isa")).as("ca"), sum(lit(1L) - col("isa")).as("cb"))
    val scan = graft.operators.PrefixSum.withRunningTotals(pv, Seq("v"), Seq("ca", "cb"))
    // doubled placements: 2P_a(v) = 2·cumlt_b + c_b, 2P_b(v) = 2·cumlt_a + c_a
    val p2a = d18i(col("cb_cum") - col("cb")) * 2 + d18i(col("cb"))
    val p2b = d18i(col("ca_cum") - col("ca")) * 2 + d18i(col("ca"))
    val m = scan.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"),
      sum(d18i(col("ca")) * p2a).as("sa"), sum(d18i(col("ca")) * p2a * p2a).as("saa"),
      sum(d18i(col("cb")) * p2b).as("sb"), sum(d18i(col("cb")) * p2b * p2b).as("sbb"))
    val na = col("na").cast("double"); val nb = col("nb").cast("double")
    val pbarA = col("sa").cast("double") / (na * 2.0)
    val pbarB = col("sb").cast("double") / (nb * 2.0)
    // S_i² = [Σ(2P)²·c − (Σ2P·c)²/n_i] / (4(n_i−1))
    val s2a = (col("saa").cast("double") - col("sa").cast("double") *
      col("sa").cast("double") / na) / ((na - 1.0) * 4.0)
    val s2b = (col("sbb").cast("double") - col("sb").cast("double") *
      col("sb").cast("double") / nb) / ((nb - 1.0) * 4.0)
    val nTot = na + nb
    val sigma2 = nTot * (s2a / (nb * nb) + s2b / (na * na))
    val diff = (pbarB - pbarA) + (nb - na) / 2.0
    m.select(col("na").as("n_building"), col("nb").as("n_automobile"),
      round(pbarB / na, 6).as("p_hat"),
      round(diff / (sqrt(nTot) * sqrt(sigma2)), 6).as("w_bm"))
  }

  private[graft] lazy val anBrunnerMunzelSql = {
    val p2a = "(CAST(cumlt_b AS DECIMAL(18,0)) * 2 + CAST(cb AS DECIMAL(18,0)))"
    val p2b = "(CAST(cumlt_a AS DECIMAL(18,0)) * 2 + CAST(ca AS DECIMAL(18,0)))"
    val na = "CAST(na AS DOUBLE)"; val nb = "CAST(nb AS DOUBLE)"
    val pbarA = s"(CAST(sa AS DOUBLE) / (2.0 * $na))"
    val pbarB = s"(CAST(sb AS DOUBLE) / (2.0 * $nb))"
    val s2a = s"((CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / $na) / (4.0 * ($na - 1.0)))"
    val s2b = s"((CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / $nb) / (4.0 * ($nb - 1.0)))"
    val nTot = s"($na + $nb)"
    s"""WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v,
       |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS isa
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
       |pv AS (SELECT v, CAST(SUM(isa) AS BIGINT) AS ca,
       |              CAST(SUM(1 - isa) AS BIGINT) AS cb FROM o GROUP BY v),
       |sc AS (SELECT ca, cb,
       |         CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) - ca AS cumlt_a,
       |         CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) - cb AS cumlt_b
       |       FROM pv),
       |m AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
       |    CAST(SUM(CAST(ca AS DECIMAL(18,0)) * $p2a) AS DECIMAL(38,0)) AS sa,
       |    CAST(SUM(CAST(ca AS DECIMAL(18,0)) * $p2a * $p2a) AS DECIMAL(38,0)) AS saa,
       |    CAST(SUM(CAST(cb AS DECIMAL(18,0)) * $p2b) AS DECIMAL(38,0)) AS sb,
       |    CAST(SUM(CAST(cb AS DECIMAL(18,0)) * $p2b * $p2b) AS DECIMAL(38,0)) AS sbb
       |  FROM sc)
       |SELECT na AS n_building, nb AS n_automobile,
       |  ROUND($pbarB / $na, 6) AS p_hat,
       |  ROUND((($pbarB - $pbarA) + ($nb - $na) / 2.0)
       |    / (sqrt($nTot) * sqrt($nTot * ($s2a / ($nb * $nb) + $s2b / ($na * $na)))), 6) AS w_bm
       |FROM m""".stripMargin
  }

  /** Somers' D (discount | quantity band) — the ASYMMETRIC ordinal
    * association (how well does the quantity band predict the discount
    * band) next to an_kendall_tau's symmetric version. Both ordinal
    * domains are tiny (5 × 11 cells), so concordant/discordant pair
    * counts are a cell×cell cross join over the key-domain-bounded
    * contingency frame — never a row-pair join; counts widen to
    * DECIMAL(18,0) factors so the products stay exact at any corpus
    * size (the an_jonckheere width contract). */
  private[graft] def anSomersD(s: SparkSession, dir: String): DataFrame = {
    val d18i = (c: Column) => c.cast("decimal(18,0)")
    val li = Tables.lineitem(s, dir).select(
      ceil(col("l_quantity") / 10.0).cast("int").as("qx"),
      round(col("l_discount") * 100).cast("int").as("dy"))
    val cells = li.groupBy(col("qx"), col("dy")).agg(count(lit(1)).as("c"))
    val a = cells.select(col("qx").as("x1"), col("dy").as("y1"), col("c").as("c1"))
    val b = cells.select(col("qx").as("x2"), col("dy").as("y2"), col("c").as("c2"))
    val pairs = a.join(broadcast(b), col("x1") < col("x2"))
      .agg(
        sum(when(col("y1") < col("y2"), d18i(col("c1")) * d18i(col("c2")))
          .otherwise(lit(0).cast("decimal(18,0)"))).as("cc"),
        sum(when(col("y1") > col("y2"), d18i(col("c1")) * d18i(col("c2")))
          .otherwise(lit(0).cast("decimal(18,0)"))).as("dd"))
    val rowTot = cells.groupBy(col("qx")).agg(sum(col("c")).as("nx"))
      .agg(sum(d18i(col("nx")) * d18i(col("nx")) - d18i(col("nx"))).as("tx"),
        sum(col("nx")).as("n"))
    pairs.crossJoin(broadcast(rowTot))
      .select(col("n"),
        (col("cc") * 2).cast("bigint").as("c_pairs2"),
        (col("dd") * 2).cast("bigint").as("d_pairs2"),
        round((col("cc") - col("dd")).cast("double") * 2.0 /
          (d18i(col("n")) * d18i(col("n")) - d18i(col("n")) - col("tx")).cast("double"), 6)
          .as("somers_d"))
  }

  private[graft] lazy val anSomersDSql =
    """WITH li AS (SELECT CAST(CEIL(l_quantity / 10.0) AS INT) AS qx,
      |    CAST(ROUND(l_discount * 100) AS INT) AS dy FROM lineitem),
      |cells AS (SELECT qx, dy, COUNT(*) AS c FROM li GROUP BY 1, 2),
      |pairs AS (SELECT
      |    CAST(SUM(CASE WHEN a.dy < b.dy
      |      THEN CAST(a.c AS DECIMAL(18,0)) * CAST(b.c AS DECIMAL(18,0))
      |      ELSE CAST(0 AS DECIMAL(18,0)) END) AS DECIMAL(38,0)) AS cc,
      |    CAST(SUM(CASE WHEN a.dy > b.dy
      |      THEN CAST(a.c AS DECIMAL(18,0)) * CAST(b.c AS DECIMAL(18,0))
      |      ELSE CAST(0 AS DECIMAL(18,0)) END) AS DECIMAL(38,0)) AS dd
      |  FROM cells a JOIN cells b ON a.qx < b.qx),
      |rt AS (SELECT CAST(SUM(CAST(nx AS DECIMAL(18,0)) * CAST(nx AS DECIMAL(18,0))
      |      - CAST(nx AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS tx,
      |    CAST(SUM(nx) AS BIGINT) AS n
      |  FROM (SELECT qx, CAST(SUM(c) AS BIGINT) AS nx FROM cells GROUP BY qx) t)
      |SELECT n,
      |  CAST(cc * 2 AS BIGINT) AS c_pairs2, CAST(dd * 2 AS BIGINT) AS d_pairs2,
      |  ROUND(CAST(cc - dd AS DOUBLE) * 2.0
      |    / CAST(CAST(n AS DECIMAL(18,0)) * CAST(n AS DECIMAL(18,0))
      |        - CAST(n AS DECIMAL(18,0)) - tx AS DOUBLE), 6) AS somers_d
      |FROM pairs CROSS JOIN rt""".stripMargin

  /** Quade test over the months×priorities frame — the weighted
    * Friedman (blocks with a LARGER revenue spread get more say, via
    * rank-of-range block weights), more powerful than an_friedman when
    * block scales differ. Everything is exact integers on the
    * key-domain-bounded 12×5 frame: within-block ranks, block-range
    * ranks Q_i, doubled scores 2S = Q·(2r−(m+1)), and
    * F = (k−1)·ΣS_j²·4k / (4k·ΣS² − ΣS_j²·4k)… reduced to ONE IEEE
    * division of exact integers: F = (k−1)·T / (k·A4 − T) with
    * A4 = Σ(2S)², T = Σ_j(2S_j)². */
  private[graft] def anQuade(s: SparkSession, dir: String): DataFrame = {
    val cents = (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint")
    val monthly = Tables.orders(s, dir)
      .groupBy(month(col("o_orderdate")).as("mth"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("item"))
      .agg(sum(cents).as("rev_c"))
    val rnk = monthly.withColumn("r", row_number().over(
      Window.partitionBy(col("mth")).orderBy(col("rev_c"), col("item"))).cast("long"))
    val blockRange = monthly.groupBy(col("mth"))
      .agg((max(col("rev_c")) - min(col("rev_c"))).as("rng"))
      .withColumn("q", row_number().over(
        Window.orderBy(col("rng"), col("mth"))).cast("long"))
    val scored = rnk.join(broadcast(blockRange.select(col("mth"), col("q"))), Seq("mth"))
      .withColumn("k", count(lit(1)).over(Window.partitionBy(col("item"))))
      .withColumn("m", count(lit(1)).over(Window.partitionBy(col("mth"))))
      .withColumn("s2", col("q") * (col("r") * 2 - (col("m") + 1)))
    val perItem = scored.groupBy(col("item"))
      .agg(sum(col("s2")).as("sj2"), max(col("k")).as("k"), max(col("m")).as("m"),
        sum(col("s2") * col("s2")).as("a4j"))
    perItem.agg(max(col("k")).as("k_blocks"), max(col("m")).as("m_items"),
        sum(col("a4j")).as("a4"), sum(col("sj2") * col("sj2")).as("t"))
      .select(col("k_blocks"), col("m_items"), col("a4"), col("t"),
        round((col("k_blocks") - 1).cast("double") * col("t").cast("double") /
          (col("k_blocks").cast("double") * col("a4").cast("double") -
            col("t").cast("double")), 6).as("quade_f"))
  }

  private[graft] lazy val anQuadeSql =
    """WITH monthly AS (SELECT month(o_orderdate) AS mth,
      |    CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS item,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM orders GROUP BY 1, 2),
      |rnk AS (SELECT mth, item,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY mth ORDER BY rev_c, item) AS BIGINT) AS r
      |  FROM monthly),
      |br AS (SELECT mth,
      |    CAST(ROW_NUMBER() OVER (ORDER BY MAX(rev_c) - MIN(rev_c), mth) AS BIGINT) AS q
      |  FROM monthly GROUP BY mth),
      |sc AS (SELECT rnk.item, br.q * (rnk.r * 2 - (m.m + 1)) AS s2
      |  FROM rnk JOIN br USING (mth)
      |  CROSS JOIN (SELECT COUNT(DISTINCT item) AS m FROM monthly) m),
      |pi AS (SELECT item, CAST(SUM(s2) AS BIGINT) AS sj2,
      |    CAST(SUM(s2 * s2) AS BIGINT) AS a4j, COUNT(*) AS k
      |  FROM sc GROUP BY item),
      |agg AS (SELECT MAX(k) AS k_blocks, COUNT(*) AS m_items,
      |    CAST(SUM(a4j) AS BIGINT) AS a4, CAST(SUM(sj2 * sj2) AS BIGINT) AS t
      |  FROM pi)
      |SELECT k_blocks, m_items, a4, t,
      |  ROUND(CAST(k_blocks - 1 AS DOUBLE) * CAST(t AS DOUBLE)
      |    / (CAST(k_blocks AS DOUBLE) * CAST(a4 AS DOUBLE) - CAST(t AS DOUBLE)), 6) AS quade_f
      |FROM agg""".stripMargin

  /** Two-sample Anderson–Darling (Scholz–Stephens 1987 A²akN, midrank
    * ties form, k=2) BUILDING vs AUTOMOBILE — the distributional
    * two-sample test that weights the TAILS where an_ks_drift's max-gap
    * is tail-blind. Rides the same one distinct-cent PrefixSum scan as
    * an_brunner_munzel; doubled midrank cumulatives keep every
    * numerator/denominator factor an exact integer, the per-value
    * contribution is one shared IEEE expression gathered through
    * DECIMAL(38,18). Under H0, E[A²] = k−1 = 1. */
  private[graft] def anAndersonDarling(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).join(
      Tables.customer(s, dir).filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(col("c_custkey"), col("c_mktsegment")),
      col("o_custkey") === col("c_custkey"))
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"),
        (col("c_mktsegment") === "BUILDING").cast("long").as("isa"))
    val pv = o.groupBy(col("v"))
      .agg(sum(col("isa")).as("ca"), sum(lit(1L) - col("isa")).as("cb"))
    val scan = graft.operators.PrefixSum.withRunningTotals(pv, Seq("v"), Seq("ca", "cb"))
    val tot = broadcast(pv.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb")))
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val j = scan.crossJoin(tot)
      .withColumn("l", col("ca") + col("cb"))
      .withColumn("nn", col("na") + col("nb"))
      // doubled midrank cumulatives: B2 = 2·cum − l, M2_i = 2·cum_i − f_i
      .withColumn("b2", (col("ca_cum") + col("cb_cum")) * 2 - col("l"))
      .withColumn("m2a", col("ca_cum") * 2 - col("ca"))
      .withColumn("m2b", col("cb_cum") * 2 - col("cb"))
    val den = (col("b2").cast("double") *
      (col("nn").cast("double") * 2.0 - col("b2").cast("double")) -
      col("nn").cast("double") * col("l").cast("double"))
    def num(m2: Column, ni: Column): Column = {
      val x = col("nn").cast("double") * m2.cast("double") -
        ni.cast("double") * col("b2").cast("double")
      x * x / ni.cast("double")
    }
    val contrib = when(den > 0.0,
      col("l").cast("double") * (num(col("m2a"), col("na")) +
        num(col("m2b"), col("nb"))) / den).otherwise(lit(0.0))
    j.agg(max(col("na")).as("n_building"), max(col("nb")).as("n_automobile"),
        sum(d18(contrib)).as("s"))
      .select(col("n_building"), col("n_automobile"),
        round(((col("n_building") + col("n_automobile") - 1).cast("double") /
          ((col("n_building") + col("n_automobile")).cast("double") *
            (col("n_building") + col("n_automobile")).cast("double"))) *
          col("s").cast("double"), 6).as("a2"))
  }

  private[graft] lazy val anAndersonDarlingSql = {
    val den = "(CAST(b2 AS DOUBLE) * (CAST(nn AS DOUBLE) * 2.0 - CAST(b2 AS DOUBLE)) " +
      "- CAST(nn AS DOUBLE) * CAST(l AS DOUBLE))"
    def num(m2: String, ni: String) =
      s"((CAST(nn AS DOUBLE) * CAST($m2 AS DOUBLE) - CAST($ni AS DOUBLE) * CAST(b2 AS DOUBLE)) " +
        s"* (CAST(nn AS DOUBLE) * CAST($m2 AS DOUBLE) - CAST($ni AS DOUBLE) * CAST(b2 AS DOUBLE)) " +
        s"/ CAST($ni AS DOUBLE))"
    s"""WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v,
       |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS isa
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
       |pv AS (SELECT v, CAST(SUM(isa) AS BIGINT) AS ca,
       |              CAST(SUM(1 - isa) AS BIGINT) AS cb FROM o GROUP BY v),
       |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM pv),
       |sc AS (SELECT ca, cb, ca + cb AS l,
       |         CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS ca_cum,
       |         CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cb_cum
       |       FROM pv),
       |j AS (SELECT ca, cb, l, na, nb, na + nb AS nn,
       |         (ca_cum + cb_cum) * 2 - l AS b2,
       |         ca_cum * 2 - ca AS m2a, cb_cum * 2 - cb AS m2b
       |       FROM sc CROSS JOIN tot)
       |SELECT MAX(na) AS n_building, MAX(nb) AS n_automobile,
       |  ROUND((CAST(MAX(na) + MAX(nb) - 1 AS DOUBLE)
       |      / (CAST(MAX(na) + MAX(nb) AS DOUBLE) * CAST(MAX(na) + MAX(nb) AS DOUBLE)))
       |    * CAST(SUM(CAST(CASE WHEN $den > 0.0
       |        THEN CAST(l AS DOUBLE) * (${num("m2a", "na")} + ${num("m2b", "nb")}) / $den
       |        ELSE 0.0 END AS DECIMAL(38,18))) AS DOUBLE), 6) AS a2
       |FROM j""".stripMargin
  }

  /** Cochran–Mantel–Haenszel test + Mantel–Haenszel common odds ratio
    * across segment strata: is urgent priority associated with
    * high-value orders AFTER controlling for market segment — the
    * confounder-adjusted 2×2 family member next to an_odds_ratio's
    * crude (collapsed) estimate, which Simpson's paradox can invert.
    * One pass builds the five exact-integer 2×2 tables; per-stratum
    * hypergeometric terms are one shared IEEE tree gathered
    * DECIMAL(38,18) over the k-sized frame. */
  private[graft] def anCmh(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).join(
      Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
      col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("stratum"),
        substring(col("o_orderpriority"), 1, 1).isin("1", "2").cast("long").as("exp"),
        (col("o_totalprice") > 150000.0).cast("long").as("hi"))
    val tabs = o.groupBy(col("stratum"))
      .agg(sum(col("exp") * col("hi")).as("a"),
        sum(col("exp") * (lit(1L) - col("hi"))).as("b"),
        sum((lit(1L) - col("exp")) * col("hi")).as("c"),
        sum((lit(1L) - col("exp")) * (lit(1L) - col("hi"))).as("d"))
    val nk = (col("a") + col("b") + col("c") + col("d")).cast("double")
    val n1 = (col("a") + col("b")).cast("double"); val n0 = (col("c") + col("d")).cast("double")
    val m1 = (col("a") + col("c")).cast("double"); val m0 = (col("b") + col("d")).cast("double")
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    tabs.agg(count(lit(1)).as("k_strata"),
        sum(col("a") + col("b") + col("c") + col("d")).as("n"),
        sum(d18(col("a").cast("double") - n1 * m1 / nk)).as("dev"),
        sum(d18(n1 * n0 * m1 * m0 / (nk * nk * (nk - 1.0)))).as("vr"),
        sum(d18(col("a").cast("double") * col("d").cast("double") / nk)).as("adn"),
        sum(d18(col("b").cast("double") * col("c").cast("double") / nk)).as("bcn"))
      .select(col("k_strata"), col("n"),
        round(col("dev").cast("double") * col("dev").cast("double") /
          col("vr").cast("double"), 6).as("cmh_chi2"),
        round(col("adn").cast("double") / col("bcn").cast("double"), 6).as("or_mh"))
  }

  private[graft] lazy val anCmhSql =
    """WITH o AS (SELECT c_mktsegment AS stratum,
      |    CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2') THEN 1 ELSE 0 END AS e,
      |    CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END AS hi
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |t AS (SELECT stratum,
      |    CAST(SUM(e * hi) AS BIGINT) AS a, CAST(SUM(e * (1 - hi)) AS BIGINT) AS b,
      |    CAST(SUM((1 - e) * hi) AS BIGINT) AS c, CAST(SUM((1 - e) * (1 - hi)) AS BIGINT) AS d
      |  FROM o GROUP BY stratum),
      |terms AS (SELECT a, b, c, d,
      |    CAST(a + b + c + d AS DOUBLE) AS nk,
      |    CAST(a + b AS DOUBLE) AS n1, CAST(c + d AS DOUBLE) AS n0,
      |    CAST(a + c AS DOUBLE) AS m1, CAST(b + d AS DOUBLE) AS m0
      |  FROM t)
      |SELECT COUNT(*) AS k_strata, CAST(SUM(a + b + c + d) AS BIGINT) AS n,
      |  ROUND(CAST(SUM(CAST(CAST(a AS DOUBLE) - n1 * m1 / nk AS DECIMAL(38,18))) AS DOUBLE)
      |      * CAST(SUM(CAST(CAST(a AS DOUBLE) - n1 * m1 / nk AS DECIMAL(38,18))) AS DOUBLE)
      |    / CAST(SUM(CAST(n1 * n0 * m1 * m0 / (nk * nk * (nk - 1.0)) AS DECIMAL(38,18))) AS DOUBLE), 6)
      |    AS cmh_chi2,
      |  ROUND(CAST(SUM(CAST(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / nk AS DECIMAL(38,18))) AS DOUBLE)
      |    / CAST(SUM(CAST(CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / nk AS DECIMAL(38,18))) AS DOUBLE), 6)
      |    AS or_mh
      |FROM terms""".stripMargin

  /** TOST equivalence test on the weekday/weekend daily-revenue split
    * — the A/B question an_weekend_effect's difference test can't
    * answer: not "is there a difference" but "is the difference
    * PROVABLY within ±5% of the grand mean" (absence of evidence vs
    * evidence of absence). Same calendar-anchored split and exact
    * decimal moments as an_weekend_effect; both one-sided Welch t's
    * share one IEEE tree, equivalence gate at z=1.645. */
  private[graft] def anTost(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val g = dailyRevenueSpine(s, dir)
      .select(col("rev_c"),
        (pmod(col("d") + 2, lit(7)) < 5).cast("long").as("iswd"))
      .groupBy(col("iswd"))
      .agg(count(lit(1)).as("n"), sum(d38(col("rev_c"))).as("s1"),
        sum(d38(col("rev_c")) * d38(col("rev_c"))).as("s2"))
    val w = g.agg(
      max(when(col("iswd") === 1, col("n"))).as("n1"),
      max(when(col("iswd") === 0, col("n"))).as("n2"),
      max(when(col("iswd") === 1, col("s1"))).as("a1"),
      max(when(col("iswd") === 0, col("s1"))).as("a2"),
      max(when(col("iswd") === 1, col("s2"))).as("q1"),
      max(when(col("iswd") === 0, col("s2"))).as("q2"))
    def mean(s1: Column, n: Column) = s1.cast("double") / n.cast("double")
    def varN(n: Column, s1: Column, s2: Column) =
      (d38(n) * s2 - s1 * s1).cast("double") /
        (n.cast("double") * n.cast("double") * (n - 1).cast("double"))
    val diff = mean(col("a1"), col("n1")) - mean(col("a2"), col("n2"))
    val se = sqrt(varN(col("n1"), col("a1"), col("q1")) +
      varN(col("n2"), col("a2"), col("q2")))
    val grand = (col("a1") + col("a2")).cast("double") /
      (col("n1") + col("n2")).cast("double")
    val delta = grand * 0.05
    val tLo = (diff + delta) / se
    val tHi = (diff - delta) / se
    w.select(col("n1").as("n_weekday"), col("n2").as("n_weekend"),
      round(diff / 100.0, 4).as("mean_diff_usd"),
      round(delta / 100.0, 4).as("margin_usd"),
      round(tLo, 6).as("t_lower"), round(tHi, 6).as("t_upper"),
      (tLo > 1.645 && tHi < -1.645).as("equivalent"))
  }

  private[graft] lazy val anTostSql = {
    def mean(s1: String, n: String) = s"(CAST($s1 AS DOUBLE) / CAST($n AS DOUBLE))"
    def varN(n: String, s1: String, s2: String) =
      s"(CAST(CAST($n AS DECIMAL(38,0)) * $s2 - $s1 * $s1 AS DOUBLE) " +
        s"/ (CAST($n AS DOUBLE) * CAST($n AS DOUBLE) * CAST($n - 1 AS DOUBLE)))"
    val diff = s"(${mean("a1", "n1")} - ${mean("a2", "n2")})"
    val se = s"sqrt(${varN("n1", "a1", "q1")} + ${varN("n2", "a2", "q2")})"
    val delta = "(CAST(a1 + a2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) * 0.05)"
    s"""WITH daily AS ($dailySpineSql),
       |g AS (SELECT CASE WHEN ((d + 2) % 7) < 5 THEN 1 ELSE 0 END AS iswd,
       |    COUNT(*) AS n,
       |    CAST(SUM(CAST(rev_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
       |    CAST(SUM(CAST(rev_c AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
       |  FROM daily GROUP BY 1),
       |w AS (SELECT
       |  MAX(CASE WHEN iswd = 1 THEN n END) AS n1, MAX(CASE WHEN iswd = 0 THEN n END) AS n2,
       |  MAX(CASE WHEN iswd = 1 THEN s1 END) AS a1, MAX(CASE WHEN iswd = 0 THEN s1 END) AS a2,
       |  MAX(CASE WHEN iswd = 1 THEN s2 END) AS q1, MAX(CASE WHEN iswd = 0 THEN s2 END) AS q2
       |  FROM g)
       |SELECT n1 AS n_weekday, n2 AS n_weekend,
       |  ROUND($diff / 100.0, 4) AS mean_diff_usd,
       |  ROUND($delta / 100.0, 4) AS margin_usd,
       |  ROUND(($diff + $delta) / $se, 6) AS t_lower,
       |  ROUND(($diff - $delta) / $se, 6) AS t_upper,
       |  (($diff + $delta) / $se > 1.645 AND ($diff - $delta) / $se < -1.645) AS equivalent
       |FROM w""".stripMargin
  }

  /** Cohen's h effect size between the return rates of small and large
    * quantity bands — the PROPORTION effect size (arcsine-stabilized,
    * comparable across baseline rates) that an_odds_ratio's ratio and
    * an_abtest's z don't give. Exact integer counts, h one shared IEEE
    * tree: h = 2·asin(√p₁) − 2·asin(√p₂). */
  private[graft] def anCohensH(s: SparkSession, dir: String): DataFrame = {
    val g = Tables.lineitem(s, dir)
      .select((col("l_quantity") <= 25.0).cast("long").as("small"),
        (col("l_returnflag") === "R").cast("long").as("ret"))
      .agg(sum(col("small")).as("n1"),
        sum(lit(1L) - col("small")).as("n2"),
        sum(col("small") * col("ret")).as("r1"),
        sum((lit(1L) - col("small")) * col("ret")).as("r2"))
    val p1 = col("r1").cast("double") / col("n1").cast("double")
    val p2 = col("r2").cast("double") / col("n2").cast("double")
    g.select(col("n1").as("n_small"), col("n2").as("n_large"),
      round(p1, 6).as("p_small"), round(p2, 6).as("p_large"),
      round(asin(sqrt(p1)) * 2.0 - asin(sqrt(p2)) * 2.0, 6).as("cohens_h"))
  }

  private[graft] lazy val anCohensHSql =
    """WITH g AS (SELECT
      |    CAST(SUM(CASE WHEN l_quantity <= 25.0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN l_quantity > 25.0 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(SUM(CASE WHEN l_quantity <= 25.0 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r1,
      |    CAST(SUM(CASE WHEN l_quantity > 25.0 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r2
      |  FROM lineitem)
      |SELECT n1 AS n_small, n2 AS n_large,
      |  ROUND(CAST(r1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS p_small,
      |  ROUND(CAST(r2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS p_large,
      |  ROUND(asin(sqrt(CAST(r1 AS DOUBLE) / CAST(n1 AS DOUBLE))) * 2.0
      |    - asin(sqrt(CAST(r2 AS DOUBLE) / CAST(n2 AS DOUBLE))) * 2.0, 6) AS cohens_h
      |FROM g""".stripMargin

  /** Dunn's post-hoc test: all ten pairwise rank comparisons across
    * the priority classes — the nonparametric follow-up an_kruskal
    * needs (Kruskal says "SOME group differs"; Dunn says WHICH, on the
    * shared global midranks, which pairwise Mann–Whitneys would get
    * wrong). Doubled per-group midrank sums 2S_i = Σ c_i·(2·cumlt+ct+1)
    * and the tie term ride ONE distinct-cent PrefixSum scan; the 10
    * pair z's are a cross join of the k-sized group frame. */
  private[graft] def anDunn(s: SparkSession, dir: String): DataFrame = {
    val d18i = (c: Column) => c.cast("decimal(18,0)")
    val cents = (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint")
    val o = Tables.orders(s, dir)
      .select(substring(col("o_orderpriority"), 1, 1).cast("int").as("g"), cents.as("v"))
    val cAggs = (1 to 5).map(i => sum((col("g") === i).cast("long")).as(s"c$i"))
    val pv = o.groupBy(col("v")).agg(cAggs.head, cAggs.tail: _*)
      .withColumn("ct", (1 to 5).map(i => col(s"c$i")).reduce(_ + _))
    val scan = graft.operators.PrefixSum.withRunningTotals(pv, Seq("v"), Seq("ct"))
    val mid2 = d18i(col("ct_cum") - col("ct")) * 2 + d18i(col("ct")) + 1
    val mAggs = (1 to 5).map(i => sum(d18i(col(s"c$i")) * mid2).as(s"s2_$i")) ++
      (1 to 5).map(i => sum(col(s"c$i")).as(s"n$i")) :+
      sum(d18i(col("ct")) * d18i(col("ct")) * d18i(col("ct")) - d18i(col("ct"))).as("ties")
    val m = scan.agg(mAggs.head, mAggs.tail: _*)
    val groups = (1 to 5).map(i => m.select(lit(i).as("gi"),
      col(s"n$i").as("ni"), col(s"s2_$i").as("si2"),
      ((1 to 5).map(j => col(s"n$j")).reduce(_ + _)).as("nn"), col("ties")))
      .reduce(_.unionAll(_))
    val a = groups.select(col("gi").as("g1"), col("ni").as("n1"),
      col("si2").as("sa2"), col("nn"), col("ties"))
    val b = groups.select(col("gi").as("g2"), col("ni").as("n2"), col("si2").as("sb2"))
    val nD = col("nn").cast("double")
    val varBase = nD * (nD + 1.0) / 12.0 -
      col("ties").cast("double") / ((nD - 1.0) * 12.0)
    val rbarDiff = col("sa2").cast("double") / (col("n1").cast("double") * 2.0) -
      col("sb2").cast("double") / (col("n2").cast("double") * 2.0)
    a.join(broadcast(b), col("g1") < col("g2"))
      .select(col("g1"), col("g2"),
        round(rbarDiff / sqrt(varBase *
          (lit(1.0) / col("n1").cast("double") + lit(1.0) / col("n2").cast("double"))), 6)
          .as("dunn_z"))
      .orderBy(col("g1"), col("g2"))
  }

  private[graft] lazy val anDunnSql = {
    val cs = (1 to 5).map(i =>
      s"CAST(SUM(CASE WHEN g = $i THEN 1 ELSE 0 END) AS BIGINT) AS c$i").mkString(", ")
    val mid2 = "(CAST(cumlt AS DECIMAL(18,0)) * 2 + CAST(ct AS DECIMAL(18,0)) + 1)"
    val sums = (1 to 5).map(i =>
      s"CAST(SUM(CAST(c$i AS DECIMAL(18,0)) * $mid2) AS DECIMAL(38,0)) AS s2_$i").mkString(", ")
    val ns = (1 to 5).map(i => s"CAST(SUM(c$i) AS BIGINT) AS n$i").mkString(", ")
    val un = (1 to 5).map(i =>
      s"SELECT $i AS gi, n$i AS ni, s2_$i AS si2, n1+n2+n3+n4+n5 AS nn, ties FROM m")
      .mkString(" UNION ALL ")
    s"""WITH o AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
       |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
       |  FROM orders),
       |pv AS (SELECT v, $cs FROM o GROUP BY v),
       |sc AS (SELECT c1, c2, c3, c4, c5, c1+c2+c3+c4+c5 AS ct,
       |    CAST(SUM(c1+c2+c3+c4+c5) OVER (ORDER BY v) AS BIGINT) - (c1+c2+c3+c4+c5) AS cumlt
       |  FROM pv),
       |m AS (SELECT $sums, $ns,
       |    CAST(SUM(CAST(ct AS DECIMAL(18,0)) * CAST(ct AS DECIMAL(18,0))
       |        * CAST(ct AS DECIMAL(18,0)) - CAST(ct AS DECIMAL(18,0))) AS DECIMAL(38,0)) AS ties
       |  FROM sc),
       |grp AS ($un)
       |SELECT a.gi AS g1, b.gi AS g2,
       |  ROUND((CAST(a.si2 AS DOUBLE) / (CAST(a.ni AS DOUBLE) * 2.0)
       |      - CAST(b.si2 AS DOUBLE) / (CAST(b.ni AS DOUBLE) * 2.0))
       |    / sqrt((CAST(a.nn AS DOUBLE) * (CAST(a.nn AS DOUBLE) + 1.0) / 12.0
       |        - CAST(a.ties AS DOUBLE) / ((CAST(a.nn AS DOUBLE) - 1.0) * 12.0))
       |      * (1.0 / CAST(a.ni AS DOUBLE) + 1.0 / CAST(b.ni AS DOUBLE))), 6) AS dunn_z
       |FROM grp a JOIN grp b ON a.gi < b.gi
       |ORDER BY g1, g2""".stripMargin
  }

  /** Games–Howell post-hoc: all ten pairwise Welch comparisons across
    * the priority classes — the parametric follow-up to an_anova under
    * UNEQUAL variances (an_tukey_hsd assumes a pooled variance; this
    * doesn't). Per-group exact integer-cents moments in one pass; each
    * pair's t and Welch–Satterthwaite df are one shared IEEE tree over
    * the k-sized cross join. */
  private[graft] def anGamesHowell(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val cents = (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint")
    val g = Tables.orders(s, dir)
      .select(substring(col("o_orderpriority"), 1, 1).cast("int").as("g"), cents.as("v"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(d38(col("v"))).as("s1"),
        sum(d38(col("v")) * d38(col("v"))).as("s2"))
    def se2(n: Column, s1: Column, s2: Column): Column =
      (d38(n) * s2 - s1 * s1).cast("double") /
        (n.cast("double") * n.cast("double") * (n - 1).cast("double"))
    val a = g.select(col("g").as("g1"), col("n").as("n1"),
      (col("s1").cast("double") / col("n").cast("double")).as("m1"),
      se2(col("n"), col("s1"), col("s2")).as("v1"))
    val b = g.select(col("g").as("g2"), col("n").as("n2"),
      (col("s1").cast("double") / col("n").cast("double")).as("m2"),
      se2(col("n"), col("s1"), col("s2")).as("v2"))
    val se = sqrt(col("v1") + col("v2"))
    val df = (col("v1") + col("v2")) * (col("v1") + col("v2")) /
      (col("v1") * col("v1") / (col("n1") - 1).cast("double") +
        col("v2") * col("v2") / (col("n2") - 1).cast("double"))
    a.join(broadcast(b), col("g1") < col("g2"))
      .select(col("g1"), col("g2"),
        round((col("m1") - col("m2")) / 100.0, 4).as("mean_diff_usd"),
        round((col("m1") - col("m2")) / se, 6).as("t"),
        round(df, 2).as("df"))
      .orderBy(col("g1"), col("g2"))
  }

  private[graft] lazy val anGamesHowellSql = {
    val se2 = "(CAST(CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1 AS DOUBLE) " +
      "/ (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))"
    s"""WITH g AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS g,
       |    COUNT(*) AS n,
       |    SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS DECIMAL(38,0))) AS s1,
       |    SUM(CAST(CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS DECIMAL(38,0))
       |      * CAST(CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS DECIMAL(38,0))) AS s2
       |  FROM orders GROUP BY 1),
       |p AS (SELECT g AS gi, n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m, $se2 AS v FROM g)
       |SELECT a.gi AS g1, b.gi AS g2,
       |  ROUND((a.m - b.m) / 100.0, 4) AS mean_diff_usd,
       |  ROUND((a.m - b.m) / sqrt(a.v + b.v), 6) AS t,
       |  ROUND((a.v + b.v) * (a.v + b.v)
       |    / (a.v * a.v / CAST(a.n - 1 AS DOUBLE) + b.v * b.v / CAST(b.n - 1 AS DOUBLE)), 2) AS df
       |FROM p a JOIN p b ON a.gi < b.gi
       |ORDER BY g1, g2""".stripMargin
  }

  /** Benjamini–Yekutieli FDR over the same per-segment churn z-tests
    * as an_bh_fdr — the dependence-robust variant (BH's guarantee
    * needs independence/PRDS; BY divides the step-up threshold by
    * c(m)=Σ1/i and holds under ARBITRARY dependence, the right default
    * when the segment tests share the pooled-rest denominator). Same
    * Bowling-Φ p-values and deterministic ranking; only the threshold
    * changes — c(5) = 137/60. */
  private[graft] def anByFdr(s: SparkSession, dir: String): DataFrame = {
    val grp = churnLabeled(s, dir).groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_g"), sum(col("g1")).as("k_g"))
    val tot = grp.agg(sum(col("n_g")).as("n"), sum(col("k_g")).as("k"))
    val z = {
      val p1 = col("k_g").cast("double") / col("n_g").cast("double")
      val p0 = (col("k") - col("k_g")).cast("double") / (col("n") - col("n_g")).cast("double")
      val pp = col("k").cast("double") / col("n").cast("double")
      (p1 - p0) / sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n_g").cast("double") +
          lit(1.0) / (col("n") - col("n_g")).cast("double")))
    }
    val phi = (x: Column) => lit(1.0) / (lit(1.0) + exp(lit(-1.5976) * x -
      lit(0.070566) * x * x * x))
    val scored = grp.crossJoin(broadcast(tot))
      .withColumn("z", round(z, 6))
      .withColumn("p", round(lit(2.0) * (lit(1.0) - phi(abs(col("z")))), 6))
    val m = 5
    val cM = (1 to m).map(1.0 / _).sum // 137/60, the BY dependence penalty
    scored
      .withColumn("rnk", row_number().over(Window.orderBy(col("p"), col("c_mktsegment"))).cast("long"))
      .withColumn("thresh", round(col("rnk").cast("double") * 0.05 / (m * cM), 6))
      .withColumn("cutoff", max(when(col("p") <= col("thresh"), col("rnk")))
        .over(Window.partitionBy()))
      .select(col("c_mktsegment"), col("z"), col("p"), col("rnk"), col("thresh"),
        (col("cutoff").isNotNull && col("rnk") <= col("cutoff")).as("rejected"))
      .orderBy(col("rnk"))
  }

  private[graft] lazy val anByFdrSql =
    s"""WITH lab AS ($churnLabeledSql),
       |g AS (SELECT c_mktsegment, COUNT(*) AS n_g, CAST(SUM(g1) AS BIGINT) AS k_g
       |      FROM lab GROUP BY 1),
       |t AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(k_g) AS BIGINT) AS k FROM g),
       |zs AS (SELECT c_mktsegment,
       |    ROUND((CAST(k_g AS DOUBLE) / CAST(n_g AS DOUBLE)
       |        - CAST(k - k_g AS DOUBLE) / CAST(n - n_g AS DOUBLE))
       |      / sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
       |        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
       |        * (1.0 / CAST(n_g AS DOUBLE) + 1.0 / CAST(n - n_g AS DOUBLE))), 6) AS z
       |  FROM g CROSS JOIN t),
       |ps AS (SELECT c_mktsegment, z,
       |    ROUND(2.0 * (1.0 - 1.0 / (1.0 + exp(-1.5976 * ABS(z)
       |      - 0.070566 * ABS(z) * ABS(z) * ABS(z)))), 6) AS p
       |  FROM zs),
       |rk AS (SELECT c_mktsegment, z, p,
       |    CAST(ROW_NUMBER() OVER (ORDER BY p, c_mktsegment) AS BIGINT) AS rnk
       |  FROM ps),
       |th AS (SELECT *, ROUND(CAST(rnk AS DOUBLE) * 0.05
       |    / (5 * (1.0 + 1.0/2 + 1.0/3 + 1.0/4 + 1.0/5)), 6) AS thresh FROM rk),
       |co AS (SELECT MAX(CASE WHEN p <= thresh THEN rnk END) AS cutoff FROM th)
       |SELECT c_mktsegment, z, p, rnk, thresh,
       |  (cutoff IS NOT NULL AND rnk <= cutoff) AS rejected
       |FROM th CROSS JOIN co ORDER BY rnk""".stripMargin

  /** Split-conformal prediction interval for the daily-revenue trend
    * forecast: fit OLS on the first 80% of days, take the
    * ⌈(n+1)(1−α)⌉-th absolute-residual order statistic on that
    * calibration window (α = 0.1), and report the EMPIRICAL coverage of
    * ŷ ± q̂ on the held-out 20% — the distribution-free interval
    * machinery a forecast consumer should demand before trusting
    * an_linreg's normal-theory bands. Exact decimal OLS sums;
    * residuals bit-identical doubles; the order statistic and the
    * 80/20 split ride the calendar-bounded day frame (allowlisted). */
  private[graft] def anConformal(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    // the marked day frame feeds FOUR consumers (fit sums, calibration
    // scores, the q̂ rank, the test coverage) — stabilize it once so the
    // lineitem aggregate and the rank window run once, not per consumer
    val spine = dailyRevenueSpine(s, dir).select(col("d"), col("rev_c"))
      .withColumn("rn", row_number().over(Window.orderBy(col("d"))).cast("long"))
    val nTot = broadcast(spine.agg(max(col("rn")).as("n_all")))
    val marked = graft.operators.Checkpoints.stabilizeLazy(spine.crossJoin(nTot)
      .withColumn("is_cal", col("rn") <= (col("n_all") * 8) / 10))
    val m = marked.filter(col("is_cal"))
      .agg(count(lit(1)).as("n"),
        sum(d38(col("d"))).as("sx"), sum(d38(col("rev_c"))).as("sy"),
        sum(d38(col("d")) * d38(col("d"))).as("sxx"),
        sum(d38(col("d")) * d38(col("rev_c"))).as("sxy"))
    val slope = (d38(col("n")) * col("sxy") - col("sx") * col("sy")).cast("double") /
      (d38(col("n")) * col("sxx") - col("sx") * col("sx")).cast("double")
    val fit = broadcast(m.select(col("n").as("n_cal"), slope.as("slope"),
      ((col("sy").cast("double") - col("sx").cast("double") * slope) /
        col("n").cast("double")).as("icept")))
    val scored = graft.operators.Checkpoints.stabilizeLazy(marked.crossJoin(fit)
      .withColumn("score", abs(col("rev_c").cast("double") - col("icept") -
        col("slope") * col("d").cast("double"))))
    // conformal quantile: the ⌈(n_cal+1)·0.9⌉-th smallest calibration
    // score, deterministic (score, d) order on the day-sized frame
    val qhat = broadcast(scored.filter(col("is_cal"))
      .withColumn("srnk", row_number().over(
        Window.orderBy(col("score"), col("d"))).cast("long"))
      .filter(col("srnk") === ceil((col("n_cal") + 1) * 0.9).cast("long"))
      .select(col("score").as("qhat")))
    scored.filter(!col("is_cal")).crossJoin(qhat)
      .agg(max(col("n_cal")).as("n_cal"), count(lit(1)).as("n_test"),
        round(max(col("qhat")) / 100.0, 4).as("q_hat_usd"),
        round(sum((col("score") <= col("qhat")).cast("long")).cast("double") /
          count(lit(1)).cast("double"), 6).as("coverage"))
  }

  private[graft] lazy val anConformalSql = {
    val slope = "(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE) " +
      "/ CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE))"
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT d, rev_c, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM daily),
       |nt AS (SELECT MAX(rn) AS n_all FROM sp),
       |mk AS (SELECT d, rev_c, rn <= (n_all * 8) // 10 AS is_cal FROM sp CROSS JOIN nt),
       |m AS (SELECT COUNT(*) AS n,
       |    SUM(CAST(d AS DECIMAL(38,0))) AS sx, SUM(CAST(rev_c AS DECIMAL(38,0))) AS sy,
       |    SUM(CAST(d AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0))) AS sxx,
       |    SUM(CAST(d AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0))) AS sxy
       |  FROM mk WHERE is_cal),
       |fit AS (SELECT n AS n_cal, $slope AS slope,
       |    (CAST(sy AS DOUBLE) - CAST(sx AS DOUBLE) * $slope) / CAST(n AS DOUBLE) AS icept
       |  FROM m),
       |sc AS (SELECT mk.d, mk.is_cal, fit.n_cal,
       |    ABS(CAST(rev_c AS DOUBLE) - icept - slope * CAST(d AS DOUBLE)) AS score
       |  FROM mk CROSS JOIN fit),
       |q AS (SELECT score AS qhat FROM (
       |    SELECT score, n_cal, ROW_NUMBER() OVER (ORDER BY score, d) AS srnk
       |    FROM sc WHERE is_cal) t
       |  WHERE srnk = CAST(CEIL((n_cal + 1) * 0.9) AS BIGINT))
       |SELECT MAX(n_cal) AS n_cal, COUNT(*) AS n_test,
       |  ROUND(MAX(qhat) / 100.0, 4) AS q_hat_usd,
       |  ROUND(CAST(SUM(CASE WHEN score <= qhat THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
       |FROM sc CROSS JOIN q WHERE NOT is_cal""".stripMargin
  }

  /** Maximum Mean Discrepancy with the quadratic polynomial kernel
    * k(x,y) = (xy/s² + 1)², BUILDING vs AUTOMOBILE order values — the
    * kernel two-sample statistic in its rare CLOSED-FORM case: for a
    * degree-2 polynomial kernel the population MMD² collapses to
    * (m₂ᴾ−m₂Q)² + 2(m₁ᴾ−m₁Q)² over scaled moments, so the entire
    * test is exact decimal moment sums + one IEEE tree (no kernel
    * matrix, no quadratic pair work — the moment-matching view of MMD
    * made literal). Complements an_anderson_darling's rank view with a
    * moment view of the same two-sample question. */
  private[graft] def anMmd(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val o = Tables.orders(s, dir).join(
      Tables.customer(s, dir).filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(col("c_custkey"), col("c_mktsegment")),
      col("o_custkey") === col("c_custkey"))
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"),
        (col("c_mktsegment") === "BUILDING").cast("long").as("isa"))
    val g = o.groupBy(col("isa"))
      .agg(count(lit(1)).as("n"), sum(d38(col("v"))).as("s1"),
        sum(d38(col("v")) * d38(col("v"))).as("s2"))
    val w = g.agg(
      max(when(col("isa") === 1, col("n"))).as("na"),
      max(when(col("isa") === 0, col("n"))).as("nb"),
      max(when(col("isa") === 1, col("s1"))).as("a1"),
      max(when(col("isa") === 0, col("s1"))).as("b1"),
      max(when(col("isa") === 1, col("s2"))).as("a2"),
      max(when(col("isa") === 0, col("s2"))).as("b2"))
    // scale x to $1000 units: m1 = s1/(n·1e5), m2 = s2/(n·1e10)
    def m1(s1: String, n: String) = col(s1).cast("double") / (col(n).cast("double") * 1e5)
    def m2(s2: String, n: String) = col(s2).cast("double") / (col(n).cast("double") * 1e10)
    val d1 = m1("a1", "na") - m1("b1", "nb")
    val d2 = m2("a2", "na") - m2("b2", "nb")
    w.select(col("na").as("n_building"), col("nb").as("n_automobile"),
      round(d1, 6).as("moment1_gap"),
      round(d2, 6).as("moment2_gap"),
      round(d2 * d2 + d1 * d1 * 2.0, 6).as("mmd2_poly"))
  }

  private[graft] lazy val anMmdSql = {
    def m1(s1: String, n: String) = s"(CAST($s1 AS DOUBLE) / (CAST($n AS DOUBLE) * 1e5))"
    def m2(s2: String, n: String) = s"(CAST($s2 AS DOUBLE) / (CAST($n AS DOUBLE) * 1e10))"
    val d1 = s"(${m1("a1", "na")} - ${m1("b1", "nb")})"
    val d2 = s"(${m2("a2", "na")} - ${m2("b2", "nb")})"
    s"""WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v,
       |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS isa
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
       |g AS (SELECT isa, COUNT(*) AS n,
       |    SUM(CAST(v AS DECIMAL(38,0))) AS s1,
       |    SUM(CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0))) AS s2
       |  FROM o GROUP BY isa),
       |w AS (SELECT
       |  MAX(CASE WHEN isa = 1 THEN n END) AS na, MAX(CASE WHEN isa = 0 THEN n END) AS nb,
       |  MAX(CASE WHEN isa = 1 THEN s1 END) AS a1, MAX(CASE WHEN isa = 0 THEN s1 END) AS b1,
       |  MAX(CASE WHEN isa = 1 THEN s2 END) AS a2, MAX(CASE WHEN isa = 0 THEN s2 END) AS b2
       |  FROM g)
       |SELECT na AS n_building, nb AS n_automobile,
       |  ROUND($d1, 6) AS moment1_gap,
       |  ROUND($d2, 6) AS moment2_gap,
       |  ROUND($d2 * $d2 + $d1 * $d1 * 2.0, 6) AS mmd2_poly
       |FROM w""".stripMargin
  }

  /** Ansari–Bradley scale test, BUILDING vs AUTOMOBILE order values —
    * the RANK-based dispersion comparison completing the two-sample
    * family (location: an_mannwhitney/an_brunner_munzel; omnibus:
    * an_anderson_darling; scale: this — where an_f_test/an_bartlett
    * need normality, AB doesn't). Scores a(r) = min(r, N+1−r) fold
    * ranks from both ends; a tied run's averaged score is a CLOSED-FORM
    * pair of triangular sums over its rank range, so the statistic
    * rides the same one distinct-cent PrefixSum scan — no
    * per-observation rank table. Tie-exact null moments
    * (Hollander–Wolfe): E = n_a·S/N, Var = n_a·n_b(N·Σa²w − S²)/
    * (N²(N−1)) with Σa²w = ΣS_run²/t_run. */
  private[graft] def anAnsariBradley(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).join(
      Tables.customer(s, dir).filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(col("c_custkey"), col("c_mktsegment")),
      col("o_custkey") === col("c_custkey"))
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"),
        (col("c_mktsegment") === "BUILDING").cast("long").as("isa"))
    val pv = o.groupBy(col("v"))
      .agg(sum(col("isa")).as("ca"), sum(lit(1L) - col("isa")).as("cb"))
    val scan = graft.operators.PrefixSum.withRunningTotals(pv, Seq("v"), Seq("ca", "cb"))
    val tot = broadcast(pv.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb")))
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val d18i = (c: Column) => c.cast("decimal(18,0)")
    // tied run spans ranks [lo, hi]; DOUBLED scores keep everything an
    // exact integer (no halving): 2·Σ r = b(b+1) − (a−1)a, and the
    // folded high part 2·Σ(N+1−r) = 2(N+1)·len − 2·Σ r. DECIMAL(18,0)
    // factors per the an_jonckheere width contract.
    def tri2(a: Column, b: Column): Column =
      when(b >= a, d18i(b) * (d18i(b) + 1) - (d18i(a) - 1) * d18i(a))
        .otherwise(lit(0).cast("decimal(37,0)"))
    val j = scan.crossJoin(tot)
      .withColumn("t", col("ca") + col("cb"))
      .withColumn("nn", col("na") + col("nb"))
      .withColumn("lo", col("ca_cum") + col("cb_cum") - col("t") + 1)
      .withColumn("hi", col("ca_cum") + col("cb_cum"))
      .withColumn("fold", expr("(nn + 1) div 2"))
      .withColumn("srun2",
        tri2(col("lo"), least(col("hi"), col("fold"))) +
          when(col("hi") > col("fold"),
            (d18i(col("nn")) + 1) * 2 *
              d18i(col("hi") - greatest(col("lo"), col("fold") + 1) + 1) -
              tri2(greatest(col("lo"), col("fold") + 1), col("hi")))
            .otherwise(lit(0).cast("decimal(37,0)")))
    val m = j.agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
      // T = Σ c_a·(srun2/2)/t per run, gathered exactly
      sum(d18(col("ca").cast("double") * col("srun2").cast("double") /
        (col("t").cast("double") * 2.0))).as("tstat"),
      sum(col("srun2")).as("s_all2"),
      // Σ a²·weight = Σ (srun2/2t)²·t = Σ srun2²/(4t)
      sum(d18(col("srun2").cast("double") * col("srun2").cast("double") /
        (col("t").cast("double") * 4.0))).as("a2w"))
    val na = col("na").cast("double"); val nb = col("nb").cast("double")
    val nn = na + nb
    val e = na * (col("s_all2").cast("double") / 2.0) / nn
    val vr = na * nb * (nn * col("a2w").cast("double") -
      (col("s_all2").cast("double") / 2.0) * (col("s_all2").cast("double") / 2.0)) /
      (nn * nn * (nn - 1.0))
    m.select(col("na").as("n_building"), col("nb").as("n_automobile"),
      round(col("tstat").cast("double"), 4).as("ab_stat"),
      round((col("tstat").cast("double") - e) / sqrt(vr), 6).as("z"))
  }

  private[graft] lazy val anAnsariBradleySql = {
    def tri2(a: String, b: String) =
      s"(CASE WHEN $b >= $a THEN CAST($b AS DECIMAL(18,0)) * (CAST($b AS DECIMAL(18,0)) + 1) " +
        s"- (CAST($a AS DECIMAL(18,0)) - 1) * CAST($a AS DECIMAL(18,0)) " +
        s"ELSE CAST(0 AS DECIMAL(37,0)) END)"
    s"""WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v,
       |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS isa
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
       |pv AS (SELECT v, CAST(SUM(isa) AS BIGINT) AS ca,
       |              CAST(SUM(1 - isa) AS BIGINT) AS cb FROM o GROUP BY v),
       |tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM pv),
       |sc AS (SELECT ca, cb, ca + cb AS t,
       |         CAST(SUM(ca + cb) OVER (ORDER BY v) AS BIGINT) AS hi
       |       FROM pv),
       |j AS (SELECT ca, cb, t, na, nb, na + nb AS nn,
       |         hi - t + 1 AS lo, hi, (na + nb + 1) // 2 AS fold
       |       FROM sc CROSS JOIN tot),
       |r AS (SELECT ca, cb, t, na, nb, nn,
       |    ${tri2("lo", "LEAST(hi, fold)")}
       |      + (CASE WHEN hi > fold
       |         THEN (CAST(nn AS DECIMAL(18,0)) + 1) * 2
       |                * CAST(hi - GREATEST(lo, fold + 1) + 1 AS DECIMAL(18,0))
       |              - ${tri2("GREATEST(lo, fold + 1)", "hi")}
       |         ELSE CAST(0 AS DECIMAL(37,0)) END) AS srun2
       |  FROM j),
       |m AS (SELECT MAX(na) AS na, MAX(nb) AS nb,
       |    SUM(CAST(CAST(ca AS DOUBLE) * CAST(srun2 AS DOUBLE)
       |      / (CAST(t AS DOUBLE) * 2.0) AS DECIMAL(38,18))) AS tstat,
       |    CAST(SUM(srun2) AS DECIMAL(38,0)) AS s_all2,
       |    SUM(CAST(CAST(srun2 AS DOUBLE) * CAST(srun2 AS DOUBLE)
       |      / (CAST(t AS DOUBLE) * 4.0) AS DECIMAL(38,18))) AS a2w
       |  FROM r)
       |SELECT na AS n_building, nb AS n_automobile,
       |  ROUND(CAST(tstat AS DOUBLE), 4) AS ab_stat,
       |  ROUND((CAST(tstat AS DOUBLE)
       |      - CAST(na AS DOUBLE) * (CAST(s_all2 AS DOUBLE) / 2.0) / CAST(na + nb AS DOUBLE))
       |    / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
       |      * (CAST(na + nb AS DOUBLE) * CAST(a2w AS DOUBLE)
       |        - (CAST(s_all2 AS DOUBLE) / 2.0) * (CAST(s_all2 AS DOUBLE) / 2.0))
       |      / (CAST(na + nb AS DOUBLE) * CAST(na + nb AS DOUBLE)
       |        * (CAST(na + nb AS DOUBLE) - 1.0))), 6) AS z
       |FROM m""".stripMargin
  }

  /** Breslow–Day homogeneity test (with Tarone's correction) across
    * the same segment strata as [[anCmh]] — the question the CMH
    * common odds ratio SILENTLY assumes away: is one OR per stratum
    * even the right model, or does the priority↔value association
    * differ by segment (effect modification, where pooling misleads)?
    * Per stratum the expected cell ã under the MH common ψ solves the
    * standard quadratic (1−ψ)ã² + [N−n1−m1+ψ(n1+m1)]ã − ψ·n1·m1 = 0
    * (valid root selected by the open-interval test, ψ≈1 degenerating
    * to the linear solution — the same CASE tree on both engines);
    * X²_BD = Σ(a−ã)²/Var(ã), Tarone subtracts (Σ(a−ã))²/ΣVar. One
    * corpus pass builds the exact-integer 2×2s; everything after is
    * k-sized IEEE over shared literals, terms gathered DECIMAL(38,18),
    * ROUND 6 at emission. */
  private[graft] def anBreslowDay(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).join(
      Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
      col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("stratum"),
        substring(col("o_orderpriority"), 1, 1).isin("1", "2").cast("long").as("exp"),
        (col("o_totalprice") > 150000.0).cast("long").as("hi"))
    val tabs = o.groupBy(col("stratum"))
      .agg(sum(col("exp") * col("hi")).as("a"),
        sum(col("exp") * (lit(1L) - col("hi"))).as("b"),
        sum((lit(1L) - col("exp")) * col("hi")).as("c"),
        sum((lit(1L) - col("exp")) * (lit(1L) - col("hi"))).as("d"))
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val nkD = (col("a") + col("b") + col("c") + col("d")).cast("double")
    val psi = tabs.agg(
      sum(d18(col("a").cast("double") * col("d").cast("double") / nkD)).as("adn"),
      sum(d18(col("b").cast("double") * col("c").cast("double") / nkD)).as("bcn"))
      .select((col("adn").cast("double") / col("bcn").cast("double")).as("psi"))
    val aD = col("a").cast("double")
    val n1 = (col("a") + col("b")).cast("double")
    val m1 = (col("a") + col("c")).cast("double")
    val qA = lit(1.0) - col("psi")
    val qB = (n1 + m1) * col("psi") + (nkD - n1 - m1)
    val qC = -col("psi") * n1 * m1
    val sq = sqrt(qB * qB - lit(4.0) * qA * qC)
    val r1 = (-qB + sq) / (lit(2.0) * qA)
    val r2 = (-qB - sq) / (lit(2.0) * qA)
    val loB = greatest(lit(0.0), n1 + m1 - nkD)
    val hiB = least(n1, m1)
    val at = when(abs(qA) < 1e-12, -qC / qB)
      .when(r1 > loB && r1 < hiB, r1).otherwise(r2)
    val per = tabs.crossJoin(broadcast(psi))
      .select(col("psi"), col("a"), col("b"), col("c"), col("d"),
        at.as("at"),
        (lit(1.0) / (lit(1.0) / at + lit(1.0) / (n1 - at) + lit(1.0) / (m1 - at) +
          lit(1.0) / (nkD - n1 - m1 + at))).as("v"),
        (aD - at).as("dev"))
    per.agg(count(lit(1)).as("k_strata"),
        sum(col("a") + col("b") + col("c") + col("d")).as("n"),
        max(col("psi")).as("psi"),
        sum(d18(col("dev") * col("dev") / col("v"))).as("bd"),
        sum(d18(col("dev"))).as("sd"),
        sum(d18(col("v"))).as("sv"))
      .select(col("k_strata"), col("n"),
        round(col("psi"), 6).as("or_mh"),
        round(col("bd").cast("double"), 6).as("bd_chi2"),
        round(col("bd").cast("double") -
          col("sd").cast("double") * col("sd").cast("double") /
            col("sv").cast("double"), 6).as("tarone_chi2"),
        (col("k_strata") - 1).as("df"))
  }

  private[graft] lazy val anBreslowDaySql =
    """WITH o AS (SELECT c_mktsegment AS stratum,
      |    CASE WHEN substr(o_orderpriority, 1, 1) IN ('1', '2') THEN 1 ELSE 0 END AS e,
      |    CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END AS hi
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |t AS MATERIALIZED (SELECT stratum,
      |    CAST(SUM(e * hi) AS BIGINT) AS a, CAST(SUM(e * (1 - hi)) AS BIGINT) AS b,
      |    CAST(SUM((1 - e) * hi) AS BIGINT) AS c, CAST(SUM((1 - e) * (1 - hi)) AS BIGINT) AS d
      |  FROM o GROUP BY stratum),
      |ps AS (SELECT
      |    CAST(SUM(CAST(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
      |        / CAST(a + b + c + d AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE)
      |    / CAST(SUM(CAST(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
      |        / CAST(a + b + c + d AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS psi
      |  FROM t),
      |q AS (SELECT psi, a, b, c, d,
      |    CAST(a AS DOUBLE) AS ad, CAST(a + b + c + d AS DOUBLE) AS nk,
      |    CAST(a + b AS DOUBLE) AS n1, CAST(a + c AS DOUBLE) AS m1,
      |    1.0 - psi AS qa,
      |    (CAST(a + b AS DOUBLE) + CAST(a + c AS DOUBLE)) * psi
      |      + (CAST(a + b + c + d AS DOUBLE) - CAST(a + b AS DOUBLE) - CAST(a + c AS DOUBLE)) AS qb,
      |    -psi * CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE) AS qc
      |  FROM t CROSS JOIN ps),
      |r AS (SELECT psi, a, b, c, d, ad, nk, n1, m1,
      |    CASE WHEN abs(qa) < 1e-12 THEN -qc / qb
      |         WHEN (-qb + sqrt(qb * qb - 4.0 * qa * qc)) / (2.0 * qa) > greatest(0.0, n1 + m1 - nk)
      |          AND (-qb + sqrt(qb * qb - 4.0 * qa * qc)) / (2.0 * qa) < least(n1, m1)
      |         THEN (-qb + sqrt(qb * qb - 4.0 * qa * qc)) / (2.0 * qa)
      |         ELSE (-qb - sqrt(qb * qb - 4.0 * qa * qc)) / (2.0 * qa) END AS at
      |  FROM q),
      |u AS (SELECT psi, a, b, c, d, ad - at AS dev,
      |    1.0 / (1.0 / at + 1.0 / (n1 - at) + 1.0 / (m1 - at)
      |           + 1.0 / (nk - n1 - m1 + at)) AS v
      |  FROM r)
      |SELECT COUNT(*) AS k_strata, CAST(SUM(a + b + c + d) AS BIGINT) AS n,
      |  ROUND(MAX(psi), 6) AS or_mh,
      |  ROUND(CAST(SUM(CAST(dev * dev / v AS DECIMAL(38,18))) AS DOUBLE), 6) AS bd_chi2,
      |  ROUND(CAST(SUM(CAST(dev * dev / v AS DECIMAL(38,18))) AS DOUBLE)
      |    - CAST(SUM(CAST(dev AS DECIMAL(38,18))) AS DOUBLE)
      |      * CAST(SUM(CAST(dev AS DECIMAL(38,18))) AS DOUBLE)
      |      / CAST(SUM(CAST(v AS DECIMAL(38,18))) AS DOUBLE), 6) AS tarone_chi2,
      |  COUNT(*) - 1 AS df
      |FROM u""".stripMargin

  /** Fisher's exact test on the supplier 2×2 (even-nation exposure ×
    * high-balance outcome) — the small-margin inference chi-square
    * approximations get wrong, computed EXACTLY at any margin size:
    * the hypergeometric PMF over the full support comes from an exact
    * distributed ln-factorial table — global supplier ranks 1..N via
    * [[graft.operators.PrefixSum]] (no single-partition window), each
    * rank's ln(i) gathered DECIMAL(38,18) and prefix-scanned by the
    * decimal two-pass scan, so lf(x) is the engine-exact decimal sum
    * of correctly-rounded doubles in ANY evaluation order. Support
    * rows look up their four lf arguments by equality join (linear,
    * co-partitioned — never quadratic); ln pmf(k) is exact decimal
    * algebra, one exp() per support point, tail sums gathered. Two-
    * sided inclusion uses the R convention pmf(k) ≤ pmf(a)·(1+1e-7)
    * (the slack is 1e-7 relative where cross-engine exp() wobble is
    * ~1e-13, and exact symmetric ties are decimal-exact equal on both
    * engines, so inclusion is deterministic). ROUND 6 at emission. */
  private[graft] def anFisherExact(s: SparkSession, dir: String): DataFrame = {
    val d18zero = lit(java.math.BigDecimal.ZERO).cast("decimal(38,18)")
    val sup = Tables.supplier(s, dir)
      .select(col("s_suppkey"),
        (pmod(col("s_nationkey"), lit(2)) === 0).cast("long").as("e"),
        (col("s_acctbal") > 5000.0).cast("long").as("o"))
    val marg = sup.agg(count(lit(1)).as("nn"), sum("e").as("n1"),
      sum("o").as("m1"), sum(col("e") * col("o")).as("a"))
    val ranked = graft.operators.PrefixSum
      .distinctRunningCounts(sup.select("s_suppkey"), Seq("s_suppkey"))
      .select(col("cnt_cum").as("i"),
        log(col("cnt_cum").cast("double")).cast("decimal(38,18)").as("lt"))
    // the lf table feeds five consumers (margin constants, the support
    // slice, three lookup joins) — persist ONCE under the PrefixSum
    // owned-cache lifecycle so the decimal scan runs once, not five times
    val lf = graft.operators.PrefixSum.persistOwned(
      graft.operators.PrefixSum
        .withRunningDecimalTotals(ranked, Seq("i"), Seq("lt"))
        .select(col("i"), col("lt_cum").as("lf")))
    val lfM = lf.crossJoin(broadcast(marg))
    val consts = lfM.agg(
      max(when(col("i") === col("n1"), col("lf"))).as("lf_n1"),
      max(when(col("i") === col("m1"), col("lf"))).as("lf_m1"),
      max(when(col("i") === col("nn") - col("n1"), col("lf"))).as("lf_nn1"),
      max(when(col("i") === col("nn") - col("m1"), col("lf"))).as("lf_nm1"),
      max(when(col("i") === col("nn"), col("lf"))).as("lf_n"))
    val support = lfM
      .filter(col("i") <= least(col("n1"), col("m1")) &&
        col("i") >= greatest(lit(1L), col("n1") + col("m1") - col("nn")))
      .select(col("i").as("k"), col("lf").as("lf_k"),
        col("nn"), col("n1"), col("m1"), col("a"))
      .unionByName(marg.filter(col("n1") + col("m1") - col("nn") <= 0)
        .select(lit(0L).as("k"), d18zero.as("lf_k"),
          col("nn"), col("n1"), col("m1"), col("a")))
    val lf2 = lf.select(col("i").as("i2"), col("lf").as("lf_m1k"))
    val lf3 = lf.select(col("i").as("i3"), col("lf").as("lf_n1k"))
    val lf4 = lf.select(col("i").as("i4"), col("lf").as("lf_dk"))
    val terms = support
      .join(lf2, col("i2") === col("m1") - col("k"), "left")
      .join(lf3, col("i3") === col("n1") - col("k"), "left")
      .join(lf4, col("i4") === col("nn") - col("m1") - col("n1") + col("k"), "left")
      .crossJoin(broadcast(consts))
      .select(col("k"), col("a"), col("nn"), col("n1"), col("m1"),
        exp((coalesce(col("lf_m1"), d18zero) + coalesce(col("lf_n1"), d18zero) +
          coalesce(col("lf_nm1"), d18zero) + coalesce(col("lf_nn1"), d18zero) -
          coalesce(col("lf_n"), d18zero) -
          col("lf_k") - coalesce(col("lf_m1k"), d18zero) -
          coalesce(col("lf_n1k"), d18zero) - coalesce(col("lf_dk"), d18zero))
          .cast("double")).as("pmf"))
    val atA = terms.filter(col("k") === col("a")).select(col("pmf").as("pmf_a"))
    terms.crossJoin(broadcast(atA))
      .agg(max(col("nn")).as("n"), max(col("n1")).as("n_exposed"),
        max(col("m1")).as("n_outcome"), max(col("a")).as("a"),
        sum(when(col("pmf") <= col("pmf_a") * lit(1.0000001),
          col("pmf").cast("decimal(38,18)"))).as("p2"),
        sum(when(col("k") <= col("a"),
          col("pmf").cast("decimal(38,18)"))).as("pl"),
        sum(when(col("k") >= col("a"),
          col("pmf").cast("decimal(38,18)"))).as("pg"))
      .select(col("n"), col("n_exposed"), col("n_outcome"), col("a"),
        // Haldane–Anscombe +0.5 correction: finite at degenerate
        // margins (an empty cell would be an engine-divergent 1/0)
        round((col("a").cast("double") + 0.5) *
          ((col("n") - col("n_exposed") - col("n_outcome") + col("a")).cast("double") + 0.5) /
          (((col("n_exposed") - col("a")).cast("double") + 0.5) *
            ((col("n_outcome") - col("a")).cast("double") + 0.5)), 6).as("odds_ratio"),
        round(col("p2").cast("double"), 6).as("p_two"),
        round(col("pl").cast("double"), 6).as("p_less"),
        round(col("pg").cast("double"), 6).as("p_greater"))
  }

  private[graft] lazy val anFisherExactSql =
    """WITH s AS MATERIALIZED (SELECT s_suppkey,
      |    CASE WHEN s_nationkey % 2 = 0 THEN 1 ELSE 0 END AS e,
      |    CASE WHEN s_acctbal > 5000.0 THEN 1 ELSE 0 END AS o
      |  FROM supplier),
      |m AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
      |    CAST(SUM(e) AS BIGINT) AS n1, CAST(SUM(o) AS BIGINT) AS m1,
      |    CAST(SUM(e * o) AS BIGINT) AS a FROM s),
      |lf AS MATERIALIZED (SELECT i,
      |    SUM(CAST(ln(CAST(i AS DOUBLE)) AS DECIMAL(38,18))) OVER (ORDER BY i) AS lf
      |  FROM (SELECT row_number() OVER (ORDER BY s_suppkey) AS i FROM s) r),
      |c AS MATERIALIZED (SELECT
      |    MAX(CASE WHEN i = n1 THEN lf END) AS lf_n1,
      |    MAX(CASE WHEN i = m1 THEN lf END) AS lf_m1,
      |    MAX(CASE WHEN i = nn - n1 THEN lf END) AS lf_nn1,
      |    MAX(CASE WHEN i = nn - m1 THEN lf END) AS lf_nm1,
      |    MAX(CASE WHEN i = nn THEN lf END) AS lf_n
      |  FROM lf CROSS JOIN m),
      |sup AS MATERIALIZED (
      |  SELECT i AS k, lf AS lf_k, nn, n1, m1, a FROM lf CROSS JOIN m
      |  WHERE i <= least(n1, m1) AND i >= greatest(1, n1 + m1 - nn)
      |  UNION ALL
      |  SELECT 0, CAST(0 AS DECIMAL(38,18)), nn, n1, m1, a FROM m
      |  WHERE n1 + m1 - nn <= 0),
      |t AS MATERIALIZED (SELECT sup.k, sup.a, sup.nn, sup.n1, sup.m1,
      |    exp(CAST(COALESCE(c.lf_m1, 0) + COALESCE(c.lf_n1, 0)
      |      + COALESCE(c.lf_nm1, 0) + COALESCE(c.lf_nn1, 0) - COALESCE(c.lf_n, 0)
      |      - sup.lf_k - COALESCE(l2.lf, 0) - COALESCE(l3.lf, 0)
      |      - COALESCE(l4.lf, 0) AS DOUBLE)) AS pmf
      |  FROM sup
      |  LEFT JOIN lf l2 ON l2.i = sup.m1 - sup.k
      |  LEFT JOIN lf l3 ON l3.i = sup.n1 - sup.k
      |  LEFT JOIN lf l4 ON l4.i = sup.nn - sup.m1 - sup.n1 + sup.k
      |  CROSS JOIN c),
      |pa AS (SELECT pmf AS pmf_a FROM t WHERE k = a),
      |agg AS (SELECT MAX(nn) AS n, MAX(n1) AS n_exposed, MAX(m1) AS n_outcome,
      |    MAX(a) AS a,
      |    SUM(CASE WHEN pmf <= pmf_a * 1.0000001
      |             THEN CAST(pmf AS DECIMAL(38,18)) END) AS p2,
      |    SUM(CASE WHEN k <= a THEN CAST(pmf AS DECIMAL(38,18)) END) AS pl,
      |    SUM(CASE WHEN k >= a THEN CAST(pmf AS DECIMAL(38,18)) END) AS pg
      |  FROM t CROSS JOIN pa)
      |SELECT n, n_exposed, n_outcome, a,
      |  ROUND((CAST(a AS DOUBLE) + 0.5)
      |      * (CAST(n - n_exposed - n_outcome + a AS DOUBLE) + 0.5)
      |    / ((CAST(n_exposed - a AS DOUBLE) + 0.5)
      |      * (CAST(n_outcome - a AS DOUBLE) + 0.5)), 6) AS odds_ratio,
      |  ROUND(CAST(p2 AS DOUBLE), 6) AS p_two,
      |  ROUND(CAST(pl AS DOUBLE), 6) AS p_less,
      |  ROUND(CAST(pg AS DOUBLE), 6) AS p_greater
      |FROM agg""".stripMargin
}

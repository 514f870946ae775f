package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-19 second analytics wave: unit-root / variance-ratio / ARCH
  * screens on the daily-revenue spine, the D'Agostino omnibus normality
  * battery, quick variance-homogeneity ratios (Hartley, Cochran),
  * binary-continuous association (point-biserial), and method agreement
  * (Lin's concordance) — in a seventh trait file (same scope rules as
  * [[SparkEntryAn1]]–[[SparkEntryAn6]]: self-typed to the registry
  * object, SQL twins beside each kernel, exact integer/decimal algebra
  * until one shared IEEE emission tree, ROUND(·,6)). */
private[graft] trait SparkEntryAn7 { this: SparkEntry.type =>

  /** Dickey–Fuller unit-root test (with constant, no lag terms) on
    * daily revenue — the stationarity screen complementing [[anKpss]]
    * (whose null is the REVERSE hypothesis): Δy_t = α + ρ·y_{t−1} + ε,
    * H₀: ρ = 0 (unit root). The spine is calendar-bounded cents, so
    * every OLS sum (Σx, Σy, Σx², Σxy, Σy² with x = y_{t−1}, y = Δy)
    * is an exact DECIMAL(38,0) integer, as are the n-scaled centered
    * cross-products; one shared IEEE tree divides at emission.
    * t_df = ρ̂/se(ρ̂) reads against the Dickey–Fuller (NOT normal)
    * critical values — the statistic is the distributed part. */
  private[graft] def anDickeyFuller(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wd = Window.orderBy("d")
    val p = sp.withColumn("ylag", lag(col("rev_c"), 1).over(wd))
      .filter(col("ylag").isNotNull)
      .select(col("ylag").as("x"), (col("rev_c") - col("ylag")).as("y"))
    val sums = p.agg(count(lit(1)).as("n"),
      sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
      sum((d38(col("x")) * d38(col("x"))).cast("decimal(38,0)")).as("sxx"),
      sum((d38(col("x")) * d38(col("y"))).cast("decimal(38,0)")).as("sxy"),
      sum((d38(col("y")) * d38(col("y"))).cast("decimal(38,0)")).as("syy"))
    val c = sums.select(col("n"),
      (d38(col("n")) * col("sxx") - col("sx") * col("sx")).cast("decimal(38,0)")
        .cast("double").as("cxx"),
      (d38(col("n")) * col("sxy") - col("sx") * col("sy")).cast("decimal(38,0)")
        .cast("double").as("cxy"),
      (d38(col("n")) * col("syy") - col("sy") * col("sy")).cast("decimal(38,0)")
        .cast("double").as("cyy"))
    val nd = col("n").cast("double")
    val rho = col("cxy") / col("cxx")
    // SSE = (Cyy − Cxy²/Cxx)/n ; s² = SSE/(n−2) ; se(ρ)² = s²·n/Cxx
    val s2 = (col("cyy") - rho * col("cxy")) / (nd * (nd - lit(2.0)))
    c.select((col("n") + lit(1L)).as("n_days"),
      round(rho, 9).as("rho"),
      round(rho / sqrt(s2 * nd / col("cxx")), 6).as("t_df"))
  }

  private[graft] lazy val anDickeyFullerSql =
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |p AS (SELECT LAG(rev_c, 1) OVER (ORDER BY d) AS x,
       |        rev_c - LAG(rev_c, 1) OVER (ORDER BY d) AS y
       |      FROM sp),
       |f AS (SELECT CAST(x AS DECIMAL(38,0)) AS x, CAST(y AS DECIMAL(38,0)) AS y
       |      FROM p WHERE x IS NOT NULL),
       |m AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
       |        CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
       |        CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
       |        CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
       |        CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy
       |      FROM f),
       |c AS (SELECT n,
       |        CAST(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DECIMAL(38,0)) AS DOUBLE) AS cxx,
       |        CAST(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DECIMAL(38,0)) AS DOUBLE) AS cxy,
       |        CAST(CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DECIMAL(38,0)) AS DOUBLE) AS cyy
       |      FROM m)
       |SELECT n + 1 AS n_days, ROUND(cxy / cxx, 9) AS rho,
       |  ROUND((cxy / cxx) / sqrt(((cyy - (cxy / cxx) * cxy)
       |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 2.0))) * CAST(n AS DOUBLE) / cxx), 6) AS t_df
       |FROM c""".stripMargin

  /** Lo–MacKinlay variance-ratio test (q = 5, overlapping) on daily
    * revenue — does 5-day aggregation variance scale linearly, the
    * random-walk screen beside [[anHurst]] (rescaled range) and
    * [[anDickeyFuller]] (unit root): VR = σ̂²_q/σ̂²_1 with both
    * estimators mean-centered through the EXACT m-scaling trick
    * (Σ(m·r − S_r)² and Σ(m·s − q·S_r)² are exact DECIMAL(38,0)
    * integers — no mean ever materializes as a double), homoskedastic
    * z = (VR−1)/√(2(2q−1)(q−1)/(3qm)). One shared IEEE tree. */
  private[graft] def anVarianceRatio(s: SparkSession, dir: String): DataFrame = {
    val q = 5
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wd = Window.orderBy("d")
    val lagd = sp
      .withColumn("r", col("rev_c") - lag(col("rev_c"), 1).over(wd))
      .withColumn("sq", col("rev_c") - lag(col("rev_c"), q).over(wd))
    val base = lagd.filter(col("r").isNotNull)
      .agg(count(lit(1)).as("m"), sum(d38(col("r"))).as("sr"))
    val a = lagd.filter(col("r").isNotNull).crossJoin(broadcast(base))
      .select(((d38(col("m")) * d38(col("r")) - col("sr")) *
        (d38(col("m")) * d38(col("r")) - col("sr"))).cast("decimal(38,0)").as("t"))
      .agg(sum(col("t")).as("a")).crossJoin(broadcast(base))
    val b = lagd.filter(col("sq").isNotNull).crossJoin(broadcast(base))
      .select(((d38(col("m")) * d38(col("sq")) - lit(q) * col("sr")) *
        (d38(col("m")) * d38(col("sq")) - lit(q) * col("sr")))
        .cast("decimal(38,0)").as("t"))
      .agg(count(lit(1)).as("mq"), sum(col("t")).as("b"))
    val j = a.crossJoin(broadcast(b))
    val md = col("m").cast("double")
    // VR = [B/(m²·mq·q)] / [A/m³] = B·m / (A·q·mq)
    val vr = col("b").cast("double") * md /
      (col("a").cast("double") * lit(q.toDouble) * col("mq").cast("double"))
    j.select(col("m").as("n_increments"), lit(q.toLong).as("q"),
      round(vr, 6).as("vr"),
      round((vr - lit(1.0)) /
        sqrt(lit(2.0 * (2 * q - 1) * (q - 1)) / (lit(3.0 * q) * md)), 6).as("z"))
  }

  private[graft] lazy val anVarianceRatioSql =
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |lagd AS (SELECT rev_c - LAG(rev_c, 1) OVER (ORDER BY d) AS r,
       |           rev_c - LAG(rev_c, 5) OVER (ORDER BY d) AS sq
       |         FROM sp),
       |base AS (SELECT COUNT(*) AS m, CAST(SUM(CAST(r AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sr
       |         FROM lagd WHERE r IS NOT NULL),
       |a AS (SELECT CAST(SUM(CAST((CAST(m AS DECIMAL(38,0)) * CAST(r AS DECIMAL(38,0)) - sr)
       |          * (CAST(m AS DECIMAL(38,0)) * CAST(r AS DECIMAL(38,0)) - sr) AS DECIMAL(38,0)))
       |        AS DECIMAL(38,0)) AS a
       |      FROM lagd CROSS JOIN base WHERE r IS NOT NULL),
       |b AS (SELECT COUNT(*) AS mq,
       |        CAST(SUM(CAST((CAST(m AS DECIMAL(38,0)) * CAST(sq AS DECIMAL(38,0)) - 5 * sr)
       |          * (CAST(m AS DECIMAL(38,0)) * CAST(sq AS DECIMAL(38,0)) - 5 * sr) AS DECIMAL(38,0)))
       |        AS DECIMAL(38,0)) AS b
       |      FROM lagd CROSS JOIN base WHERE sq IS NOT NULL)
       |SELECT m AS n_increments, CAST(5 AS BIGINT) AS q,
       |  ROUND(CAST(b AS DOUBLE) * CAST(m AS DOUBLE)
       |    / (CAST(a AS DOUBLE) * 5.0 * CAST(mq AS DOUBLE)), 6) AS vr,
       |  ROUND((CAST(b AS DOUBLE) * CAST(m AS DOUBLE)
       |      / (CAST(a AS DOUBLE) * 5.0 * CAST(mq AS DOUBLE)) - 1.0)
       |    / sqrt(72.0 / (15.0 * CAST(m AS DOUBLE))), 6) AS z
       |FROM a CROSS JOIN base CROSS JOIN b""".stripMargin

  /** Engle's ARCH LM test (one lag) on daily-revenue increments — do
    * squared shocks cluster, the volatility-memory screen beside
    * [[anLjungBox]] (level autocorrelation): regress x_t = ê²_t on
    * x_{t−1}, LM = m·R². R² is scale-invariant, so the kernel works in
    * the SELF-NORMALIZED square x_t = m²·u²_t/Σu² (u_t = m·r_t − S_r
    * exact integer; x_t ∈ [0, m²] at ANY corpus magnitude — the
    * decimal-gathered regression sums can neither overflow nor
    * underflow at any SF), every x one double from exact integers,
    * DECIMAL(38,12)-gathered (order-free), one IEEE tree. */
  private[graft] def anArchLm(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val sp = dailyRevenueSpine(s, dir)
      .select(col("d").cast("long").as("d"), col("rev_c"))
    val wd = Window.orderBy("d")
    val r = sp.withColumn("r", col("rev_c") - lag(col("rev_c"), 1).over(wd))
      .filter(col("r").isNotNull).select(col("d"), col("r"))
    val base = r.agg(count(lit(1)).as("m"), sum(d38(col("r"))).as("sr"))
    val u = r.crossJoin(broadcast(base))
      .withColumn("u", (d38(col("m")) * d38(col("r")) - col("sr"))
        .cast("decimal(38,0)"))
    val m2u = u.select(col("d"), col("u"), col("m"))
      .crossJoin(broadcast(
        u.agg(sum((col("u") * col("u")).cast("decimal(38,0)")).as("uu"))))
    val x = m2u.select(col("d"), col("m"),
      (col("u").cast("double") * col("u").cast("double") /
        col("uu").cast("double") *
        col("m").cast("double") * col("m").cast("double")).as("x"))
    val wp = Window.orderBy("d")
    val pairs = x.withColumn("xl", lag(col("x"), 1).over(wp))
      .filter(col("xl").isNotNull)
    def g(c: Column) = sum(c.cast("decimal(38,12)")).cast("double")
    val sums = pairs.agg(count(lit(1)).as("np"),
      g(col("x")).as("sy"), g(col("xl")).as("sx"),
      g(col("x") * col("x")).as("syy"), g(col("xl") * col("xl")).as("sxx"),
      g(col("x") * col("xl")).as("sxy"))
    val nd = col("np").cast("double")
    val cxx = nd * col("sxx") - col("sx") * col("sx")
    val cyy = nd * col("syy") - col("sy") * col("sy")
    val cxy = nd * col("sxy") - col("sx") * col("sy")
    val r2 = cxy * cxy / (cxx * cyy)
    sums.select(col("np").as("n_pairs"), round(r2, 6).as("r2"),
      round(nd * r2, 6).as("lm_stat"))
  }

  private[graft] lazy val anArchLmSql =
    s"""WITH daily AS ($dailySpineSql),
       |sp AS (SELECT CAST(d AS BIGINT) AS d, rev_c FROM daily),
       |r AS (SELECT d, rev_c - LAG(rev_c, 1) OVER (ORDER BY d) AS r FROM sp),
       |rf AS (SELECT d, CAST(r AS DECIMAL(38,0)) AS r FROM r WHERE r IS NOT NULL),
       |base AS (SELECT COUNT(*) AS m, CAST(SUM(r) AS DECIMAL(38,0)) AS sr FROM rf),
       |u AS (SELECT d, m, CAST(CAST(m AS DECIMAL(38,0)) * r - sr AS DECIMAL(38,0)) AS u
       |      FROM rf CROSS JOIN base),
       |uu AS (SELECT CAST(SUM(CAST(u * u AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS uu FROM u),
       |x AS (SELECT d, CAST(u AS DOUBLE) * CAST(u AS DOUBLE) / CAST(uu AS DOUBLE)
       |        * CAST(m AS DOUBLE) * CAST(m AS DOUBLE) AS x
       |      FROM u CROSS JOIN uu),
       |p AS (SELECT x, LAG(x, 1) OVER (ORDER BY d) AS xl FROM x),
       |f AS (SELECT x, xl FROM p WHERE xl IS NOT NULL),
       |s AS (SELECT COUNT(*) AS np,
       |        CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sy,
       |        CAST(SUM(CAST(xl AS DECIMAL(38,12))) AS DOUBLE) AS sx,
       |        CAST(SUM(CAST(x * x AS DECIMAL(38,12))) AS DOUBLE) AS syy,
       |        CAST(SUM(CAST(xl * xl AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
       |        CAST(SUM(CAST(x * xl AS DECIMAL(38,12))) AS DOUBLE) AS sxy
       |      FROM f)
       |SELECT np AS n_pairs,
       |  ROUND((CAST(np AS DOUBLE) * sxy - sx * sy) * (CAST(np AS DOUBLE) * sxy - sx * sy)
       |    / ((CAST(np AS DOUBLE) * sxx - sx * sx) * (CAST(np AS DOUBLE) * syy - sy * sy)), 6) AS r2,
       |  ROUND(CAST(np AS DOUBLE) * (CAST(np AS DOUBLE) * sxy - sx * sy) * (CAST(np AS DOUBLE) * sxy - sx * sy)
       |    / ((CAST(np AS DOUBLE) * sxx - sx * sx) * (CAST(np AS DOUBLE) * syy - sy * sy)), 6) AS lm_stat
       |FROM s""".stripMargin

  /** D'Agostino–Pearson K² omnibus normality test on customer balances
    * — the finite-sample-calibrated companion to [[anJarqueBera]] (same
    * moments, asymptotic): b₁, b₂ from the one exact moment pass
    * (Σv..Σv⁴ exact DECIMAL(38,0) — balances may be negative, the odd
    * sums keep sign), then the D'Agostino skewness transform and the
    * Anscombe–Glynn kurtosis transform (pure scalar ln/sqrt/cbrt on
    * identical doubles — one shared IEEE tree), K² = Z₁² + Z₂² ~ χ²₂.
    * ROUND(·,6) absorbs the ≤1-ulp libm spread. */
  private[graft] def anDagostino(s: SparkSession, dir: String): DataFrame = {
    val v = (col("c_acctbal").cast("decimal(24,2)") * 100).cast("decimal(38,0)")
    def d(c: Column) = sum(c).cast("double")
    val m = Tables.customer(s, dir)
      .agg(count(lit(1)).as("n"), d(v).as("s1"), d(v * v).as("s2"),
        d(v * v * v).as("s3"), d(v * v * v * v).as("s4"))
    val n = col("n").cast("double")
    val mu = col("s1") / n
    val m2 = col("s2") / n - mu * mu
    val m3 = col("s3") / n - lit(3.0) * mu * (col("s2") / n) + lit(2.0) * mu * mu * mu
    val m4 = col("s4") / n - lit(4.0) * mu * (col("s3") / n) +
      lit(6.0) * mu * mu * (col("s2") / n) - lit(3.0) * mu * mu * mu * mu
    val b1 = m3 / sqrt(m2 * m2 * m2)
    val b2 = m4 / (m2 * m2)
    // D'Agostino (1970) skewness z
    val y = b1 * sqrt((n + 1.0) * (n + 3.0) / (lit(6.0) * (n - 2.0)))
    val beta2 = lit(3.0) * (n * n + lit(27.0) * n - lit(70.0)) * (n + 1.0) * (n + 3.0) /
      ((n - 2.0) * (n + 5.0) * (n + 7.0) * (n + 9.0))
    val w2 = sqrt(lit(2.0) * (beta2 - 1.0)) - 1.0
    val delta = lit(1.0) / sqrt(log(sqrt(w2)))
    val alpha = sqrt(lit(2.0) / (w2 - 1.0))
    val z1 = delta * log(y / alpha + sqrt((y / alpha) * (y / alpha) + 1.0))
    // Anscombe–Glynn (1983) kurtosis z
    val eb2 = lit(3.0) * (n - 1.0) / (n + 1.0)
    val vb2 = lit(24.0) * n * (n - 2.0) * (n - 3.0) /
      ((n + 1.0) * (n + 1.0) * (n + 3.0) * (n + 5.0))
    val xk = (b2 - eb2) / sqrt(vb2)
    val sb1m = lit(6.0) * (n * n - lit(5.0) * n + 2.0) / ((n + 7.0) * (n + 9.0)) *
      sqrt(lit(6.0) * (n + 3.0) * (n + 5.0) / (n * (n - 2.0) * (n - 3.0)))
    val aa = lit(6.0) + lit(8.0) / sb1m *
      (lit(2.0) / sb1m + sqrt(lit(1.0) + lit(4.0) / (sb1m * sb1m)))
    val z2 = ((lit(1.0) - lit(2.0) / (lit(9.0) * aa)) -
      cbrt((lit(1.0) - lit(2.0) / aa) / (lit(1.0) + xk * sqrt(lit(2.0) / (aa - 4.0))))) *
      sqrt(lit(9.0) * aa / 2.0)
    m.select(col("n"), round(b1, 6).as("skewness"),
      round(b2 - 3.0, 6).as("excess_kurtosis"),
      round(z1, 6).as("z_skew"), round(z2, 6).as("z_kurt"),
      round(z1 * z1 + z2 * z2, 6).as("k2_stat"))
  }

  private[graft] lazy val anDagostinoSql =
    """WITH m AS (SELECT COUNT(*) AS n,
      |    CAST(SUM(v) AS DOUBLE) AS s1, CAST(SUM(v * v) AS DOUBLE) AS s2,
      |    CAST(SUM(v * v * v) AS DOUBLE) AS s3,
      |    CAST(SUM(v * v * v * v) AS DOUBLE) AS s4
      |  FROM (SELECT CAST(CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT)
      |               AS DECIMAL(38,0)) AS v FROM customer) t),
      |d AS (SELECT n, CAST(n AS DOUBLE) AS nd, s1, s2, s3, s4,
      |        s1 / CAST(n AS DOUBLE) AS mu FROM m),
      |c AS (SELECT n, nd, mu,
      |        s2 / nd - mu * mu AS m2,
      |        s3 / nd - 3.0 * mu * (s2 / nd) + 2.0 * mu * mu * mu AS m3,
      |        s4 / nd - 4.0 * mu * (s3 / nd) + 6.0 * mu * mu * (s2 / nd)
      |          - 3.0 * mu * mu * mu * mu AS m4
      |      FROM d),
      |bb AS (SELECT n, nd, m3 / sqrt(m2 * m2 * m2) AS b1, m4 / (m2 * m2) AS b2 FROM c),
      |sk AS (SELECT n, nd, b1, b2,
      |        b1 * sqrt((nd + 1.0) * (nd + 3.0) / (6.0 * (nd - 2.0))) AS y,
      |        sqrt(2.0 * (3.0 * (nd * nd + 27.0 * nd - 70.0) * (nd + 1.0) * (nd + 3.0)
      |          / ((nd - 2.0) * (nd + 5.0) * (nd + 7.0) * (nd + 9.0)) - 1.0)) - 1.0 AS w2
      |      FROM bb),
      |z1c AS (SELECT n, nd, b1, b2,
      |        (1.0 / sqrt(ln(sqrt(w2))))
      |          * ln(y / sqrt(2.0 / (w2 - 1.0))
      |              + sqrt((y / sqrt(2.0 / (w2 - 1.0))) * (y / sqrt(2.0 / (w2 - 1.0))) + 1.0)) AS z1
      |      FROM sk),
      |kt AS (SELECT n, nd, b1, b2, z1,
      |        (b2 - 3.0 * (nd - 1.0) / (nd + 1.0))
      |          / sqrt(24.0 * nd * (nd - 2.0) * (nd - 3.0)
      |                 / ((nd + 1.0) * (nd + 1.0) * (nd + 3.0) * (nd + 5.0))) AS xk,
      |        6.0 * (nd * nd - 5.0 * nd + 2.0) / ((nd + 7.0) * (nd + 9.0))
      |          * sqrt(6.0 * (nd + 3.0) * (nd + 5.0) / (nd * (nd - 2.0) * (nd - 3.0))) AS sb1m
      |      FROM z1c),
      |av AS (SELECT n, b1, b2, z1, xk,
      |        6.0 + 8.0 / sb1m * (2.0 / sb1m + sqrt(1.0 + 4.0 / (sb1m * sb1m))) AS aa
      |      FROM kt),
      |z2c AS (SELECT n, b1, b2, z1,
      |        ((1.0 - 2.0 / (9.0 * aa))
      |          - cbrt((1.0 - 2.0 / aa) / (1.0 + xk * sqrt(2.0 / (aa - 4.0)))))
      |          * sqrt(9.0 * aa / 2.0) AS z2
      |      FROM av)
      |SELECT n, ROUND(b1, 6) AS skewness, ROUND(b2 - 3.0, 6) AS excess_kurtosis,
      |  ROUND(z1, 6) AS z_skew, ROUND(z2, 6) AS z_kurt,
      |  ROUND(z1 * z1 + z2 * z2, 6) AS k2_stat
      |FROM z2c""".stripMargin

  /** Hartley's F_max and Cochran's C variance-homogeneity ratios across
    * market segments — the two classical quick screens beside the
    * formal [[anBartlett]]/[[anLevene]]/[[anBrownForsythe]] tests:
    * F_max = s²_max/s²_min, C = s²_max/Σs². Per-segment unbiased
    * variances off exact integer sums (n·Σv² − S² is an exact
    * DECIMAL(38,0)); the cross-group max/min are order-free and the
    * variance total is DECIMAL(38,6)-gathered (order-free), so the
    * k-row reduction is deterministic. df = max nᵢ − 1 for the F_max
    * table lookup the caller applies. */
  private[graft] def anHartley(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val per = Tables.customer(s, dir)
      .select(col("c_mktsegment").as("g"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(d38(col("v"))).as("s"),
        sum((d38(col("v")) * d38(col("v"))).cast("decimal(38,0)")).as("ss"))
      .select(col("n"),
        ((d38(col("n")) * col("ss") - col("s") * col("s")).cast("decimal(38,0)")
          .cast("double") /
          (col("n").cast("double") * (col("n").cast("double") - lit(1.0))))
          .as("var"))
    per.agg(count(lit(1)).as("k"), max(col("n")).as("n_max"),
        max(col("var")).as("vmax"), min(col("var")).as("vmin"),
        sum(col("var").cast("decimal(38,6)")).cast("double").as("vsum"))
      .select(col("k"), (col("n_max") - 1L).as("df"),
        round(col("vmax") / col("vmin"), 6).as("f_max"),
        round(col("vmax") / col("vsum"), 6).as("cochran_c"))
  }

  private[graft] lazy val anHartleySql =
    """WITH c AS (SELECT c_mktsegment AS g,
      |    CAST(CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS DECIMAL(38,0)) AS v
      |  FROM customer),
      |per AS (SELECT g, COUNT(*) AS n, CAST(SUM(v) AS DECIMAL(38,0)) AS s,
      |          CAST(SUM(CAST(v * v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ss
      |        FROM c GROUP BY g),
      |pv AS (SELECT n,
      |         CAST(CAST(CAST(n AS DECIMAL(38,0)) * ss - s * s AS DECIMAL(38,0)) AS DOUBLE)
      |           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)) AS var
      |       FROM per)
      |SELECT COUNT(*) AS k, MAX(n) - 1 AS df,
      |  ROUND(MAX(var) / MIN(var), 6) AS f_max,
      |  ROUND(MAX(var) / CAST(SUM(CAST(var AS DECIMAL(38,6))) AS DOUBLE), 6) AS cochran_c
      |FROM pv""".stripMargin

  /** Point-biserial correlation between urgency (o_orderpriority =
    * '1-URGENT') and order value — the binary-continuous association
    * beside [[anCohensD]] (same contrast as an effect size) and
    * [[anMannWhitney]] (rank form): r_pb = (M₁−M₀)/σ_n · √(n₁n₀/n²)
    * with the population σ, t = r√((n−2)/(1−r²)) against t_{n−2}. One
    * pass of exact integer sums (n, n₁, Σv, Σ1[b]v, Σv²), one IEEE
    * tree. */
  private[graft] def anPointBiserial(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val o = Tables.orders(s, dir).select(
      (col("o_orderpriority") === "1-URGENT").cast("long").as("b"),
      (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val sums = o.agg(count(lit(1)).as("n"), sum(col("b")).as("n1"),
      sum(d38(col("v"))).as("s"),
      sum(d38(col("b") * col("v"))).as("s1"),
      sum((d38(col("v")) * d38(col("v"))).cast("decimal(38,0)")).as("ss"))
    val nd = col("n").cast("double"); val n1 = col("n1").cast("double")
    val n0 = nd - n1
    val m1 = col("s1").cast("double") / n1
    val m0 = (col("s").cast("double") - col("s1").cast("double")) / n0
    val sPop = sqrt((d38(col("n")) * col("ss") - col("s") * col("s"))
      .cast("decimal(38,0)").cast("double")) / nd
    val r = (m1 - m0) / sPop * sqrt(n1 * n0) / nd
    sums.select(col("n"), col("n1").as("n_urgent"),
      round(r, 6).as("r_pb"),
      round(r * sqrt((nd - lit(2.0)) / (lit(1.0) - r * r)), 6).as("t"))
  }

  private[graft] lazy val anPointBiserialSql =
    """WITH o AS (SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS b,
      |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |m AS (SELECT COUNT(*) AS n, CAST(SUM(b) AS BIGINT) AS n1,
      |        CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
      |        CAST(SUM(CAST(b * v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
      |        CAST(SUM(CAST(CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS ss
      |      FROM o),
      |d AS (SELECT n, n1, CAST(n AS DOUBLE) AS nd, CAST(n1 AS DOUBLE) AS n1d,
      |        CAST(n AS DOUBLE) - CAST(n1 AS DOUBLE) AS n0d,
      |        CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
      |        (CAST(s AS DOUBLE) - CAST(s1 AS DOUBLE)) / (CAST(n AS DOUBLE) - CAST(n1 AS DOUBLE)) AS m0,
      |        sqrt(CAST(CAST(CAST(n AS DECIMAL(38,0)) * ss - s * s AS DECIMAL(38,0)) AS DOUBLE)) / CAST(n AS DOUBLE) AS sp
      |      FROM m),
      |r AS (SELECT n, n1, nd, (m1 - m0) / sp * sqrt(n1d * n0d) / nd AS r FROM d)
      |SELECT n, n1 AS n_urgent, ROUND(r, 6) AS r_pb,
      |  ROUND(r * sqrt((nd - 2.0) / (1.0 - r * r)), 6) AS t
      |FROM r""".stripMargin

  /** Lin's concordance correlation between an order's header total and
    * its line-derived charge Σ extprice·(1−disc)·(1+tax) — the method-
    * agreement coefficient beside [[anDeming]] (errors-in-both fit) and
    * [[anBlandAltman]] (difference plot): CCC = 2s_xy / (s_x² + s_y² +
    * (x̄−ȳ)²). Multiplying through by n² keeps EVERY term an exact
    * DECIMAL(38,0) integer (nΣxy−ΣxΣy etc.) until the one emission
    * division; C_b = CCC/r isolates the location+scale penalty from
    * the Pearson precision. Join shape: one orderkey-partitioned
    * aggregate then an equi-join — both sides shuffle once on the
    * join key. */
  private[graft] def anLinCcc(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val charge = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
        (lit(1.0) + col("l_tax"))).cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("y"))
    val pairs = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("x"))
      .join(charge, col("o_orderkey") === col("l_orderkey"))
    val sums = pairs.agg(count(lit(1)).as("n"),
      sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
      sum((d38(col("x")) * d38(col("x"))).cast("decimal(38,0)")).as("sxx"),
      sum((d38(col("y")) * d38(col("y"))).cast("decimal(38,0)")).as("syy"),
      sum((d38(col("x")) * d38(col("y"))).cast("decimal(38,0)")).as("sxy"))
    val c = sums.select(col("n"),
      (d38(col("n")) * col("sxy") - col("sx") * col("sy")).cast("decimal(38,0)")
        .cast("double").as("cxy"),
      (d38(col("n")) * col("sxx") - col("sx") * col("sx")).cast("decimal(38,0)")
        .cast("double").as("cxx"),
      (d38(col("n")) * col("syy") - col("sy") * col("sy")).cast("decimal(38,0)")
        .cast("double").as("cyy"),
      ((col("sx") - col("sy")) * (col("sx") - col("sy"))).cast("decimal(38,0)")
        .cast("double").as("dxy2"))
    val ccc = lit(2.0) * col("cxy") / (col("cxx") + col("cyy") + col("dxy2"))
    val r = col("cxy") / sqrt(col("cxx") * col("cyy"))
    c.select(col("n"), round(r, 6).as("pearson_r"),
      round(ccc, 6).as("ccc"), round(ccc / r, 6).as("c_b"))
  }

  private[graft] lazy val anLinCccSql =
    """WITH ch AS (SELECT l_orderkey,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
      |      AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1),
      |p AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS x, y
      |      FROM orders JOIN ch ON o_orderkey = l_orderkey),
      |m AS (SELECT COUNT(*) AS n,
      |        CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |        CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
      |        CAST(SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
      |        CAST(SUM(CAST(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
      |        CAST(SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy
      |      FROM p),
      |c AS (SELECT n,
      |        CAST(CAST(CAST(n AS DECIMAL(38,0)) * sxy - sx * sy AS DECIMAL(38,0)) AS DOUBLE) AS cxy,
      |        CAST(CAST(CAST(n AS DECIMAL(38,0)) * sxx - sx * sx AS DECIMAL(38,0)) AS DOUBLE) AS cxx,
      |        CAST(CAST(CAST(n AS DECIMAL(38,0)) * syy - sy * sy AS DECIMAL(38,0)) AS DOUBLE) AS cyy,
      |        CAST(CAST((sx - sy) * (sx - sy) AS DECIMAL(38,0)) AS DOUBLE) AS dxy2
      |      FROM m)
      |SELECT n, ROUND(cxy / sqrt(cxx * cyy), 6) AS pearson_r,
      |  ROUND(2.0 * cxy / (cxx + cyy + dxy2), 6) AS ccc,
      |  ROUND((2.0 * cxy / (cxx + cyy + dxy2)) / (cxy / sqrt(cxx * cyy)), 6) AS c_b
      |FROM c""".stripMargin
}

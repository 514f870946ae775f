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
private[graft] trait SparkEntryAn2 { this: SparkEntry.type =>


  /** Friedman test across order priorities blocked by month — the
    * nonparametric repeated-measures complement to [[anKruskal]]:
    * monthly revenue per priority is ranked WITHIN each month, so a
    * priority that consistently outranks the others is detected even
    * when month-to-month level shifts swamp the between-group
    * variance. Midranks stay integer as doubled ranks
    * (2r = 2·cnt_less + cnt_eq + 1, the an_mannwhitney recipe, here
    * from two tiny per-block windows over k=5 rows); only complete
    * blocks (all 5 priorities) score. Q = 3·Σ(2R_j)²/(n·k·(k+1)) −
    * 3·n·(k+1) — exact BIGINTs into straight-line IEEE, unrounded.
    * One data-sized groupBy; everything after is months×5 rows. */
  private[graft] def anFriedman(s: SparkSession, dir: String): DataFrame = {
    val m = Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("blk"),
        col("o_orderpriority").as("trt"))
      .agg((sum(col("o_totalprice").cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("v"))
    val full = m.groupBy(col("blk")).agg(count(lit(1)).as("kk"))
      .filter(col("kk") === 5).select(col("blk"))
    val mm = m.join(full, "blk")
    val wLess = Window.partitionBy(col("blk")).orderBy(col("v"))
    val wEq = Window.partitionBy(col("blk"), col("v"))
    val ranked = mm.select(col("blk"), col("trt"),
      (lit(2) * (rank().over(wLess) - 1) + count(lit(1)).over(wEq) + 1)
        .cast("long").as("r2"))
    val perTrt = ranked.groupBy(col("trt")).agg(sum(col("r2")).as("s2"))
    val nBlocks = full.agg(count(lit(1)).as("n"))
    perTrt.agg(count(lit(1)).as("k"), sum(col("s2") * col("s2")).as("s2sq"))
      .crossJoin(broadcast(nBlocks))
      .select(col("k"), col("n"),
        (lit(3.0) * col("s2sq").cast("double") /
          (col("n") * col("k") * (col("k") + 1)).cast("double") -
          (lit(3) * col("n") * (col("k") + 1)).cast("double")).as("q_friedman"))
  }

  private[graft] lazy val anFriedmanSql =
    """WITH m AS (SELECT date_trunc('month', o_orderdate) AS blk, o_orderpriority AS trt,
      |    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS v
      |  FROM orders GROUP BY 1, 2),
      |fb AS (SELECT blk FROM m GROUP BY blk HAVING COUNT(*) = 5),
      |mm AS (SELECT m.* FROM m JOIN fb USING (blk)),
      |r AS (SELECT trt, CAST(2 * (RANK() OVER (PARTITION BY blk ORDER BY v) - 1)
      |             + COUNT(*) OVER (PARTITION BY blk, v) + 1 AS BIGINT) AS r2 FROM mm),
      |s AS (SELECT trt, CAST(SUM(r2) AS BIGINT) AS s2 FROM r GROUP BY trt),
      |t AS (SELECT COUNT(*) AS k, CAST(SUM(s2 * s2) AS BIGINT) AS s2sq FROM s),
      |nb AS (SELECT COUNT(*) AS n FROM fb)
      |SELECT k, n,
      |  3.0 * CAST(s2sq AS DOUBLE) / CAST(n * k * (k + 1) AS DOUBLE)
      |    - CAST(3 * n * (k + 1) AS DOUBLE) AS q_friedman
      |FROM t, nb""".stripMargin

  /** Herfindahl–Hirschman concentration of supplier revenue within
    * each region — "is this region's supply chain one bankruptcy away
    * from trouble". Exact cents per (region, supplier) from ONE
    * data-sized groupBy (dims broadcast onto lineitem); shares are one
    * division each and HHI gathers share² through DECIMAL(38,18)
    * (order-independent), ROUND(·,6) at emission. */
  private[graft] def anHhi(s: SparkSession, dir: String): DataFrame = {
    val dims = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
      .join(Tables.nation(s, dir).select(col("n_nationkey"), col("n_regionkey")),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, dir).select(col("r_regionkey"), col("r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("r_name"))
    val rev = Tables.lineitem(s, dir)
      .join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("r_name"), col("s_suppkey"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"))
    val tot = rev.groupBy(col("r_name")).agg(sum(col("rev_c")).as("tot_c"))
    rev.join(broadcast(tot), "r_name")
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        round(sum((col("rev_c").cast("double") / col("tot_c").cast("double") *
            (col("rev_c").cast("double") / col("tot_c").cast("double")))
          .cast("decimal(38,18)")).cast("double"), 6).as("hhi"))
      .orderBy(col("r_name"))
  }

  private[graft] lazy val anHhiSql =
    """WITH dims AS (SELECT s.s_suppkey, r.r_name
      |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      |                  JOIN region r ON n.n_regionkey = r.r_regionkey),
      |rev AS (SELECT d.r_name, l.l_suppkey,
      |    CAST(ROUND(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rev_c
      |  FROM lineitem l JOIN dims d ON l.l_suppkey = d.s_suppkey
      |  GROUP BY 1, 2),
      |tot AS (SELECT r_name, CAST(SUM(rev_c) AS BIGINT) AS tot_c FROM rev GROUP BY 1)
      |SELECT rev.r_name, COUNT(*) AS n_suppliers,
      |  ROUND(CAST(CAST(SUM(CAST(CAST(rev_c AS DOUBLE) / CAST(tot_c AS DOUBLE)
      |        * (CAST(rev_c AS DOUBLE) / CAST(tot_c AS DOUBLE)) AS DECIMAL(38,18)))
      |      AS DECIMAL(38,18)) AS DOUBLE), 6) AS hhi
      |FROM rev JOIN tot USING (r_name)
      |GROUP BY rev.r_name ORDER BY rev.r_name""".stripMargin

  /** Capture–recapture audience estimate (Chapman's corrected
    * Lincoln–Petersen): users active in the first half-month are the
    * marked sample, users active in the second half the recapture;
    * N̂ = (n₁+1)(n₂+1)/(m+1) − 1 estimates the TRUE audience the two
    * samples drew from — the "how many users do we actually have"
    * answer when any one window undercounts. Two distinct-user scans
    * (shuffles carry user ids only) collapse to one 1-row frame;
    * N̂ and its standard error are straight-line IEEE over exact
    * BIGINTs, unrounded. */
  private[graft] def anCaptureRecapture(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val e = Tables.events(s, dir)
      .select(col("user_id"), (col("ts") < cut).as("first_half"))
    val flags = e.groupBy(col("user_id"))
      .agg(max(when(col("first_half"), 1L).otherwise(0L)).as("in1"),
        max(when(!col("first_half"), 1L).otherwise(0L)).as("in2"))
    flags.agg(sum(col("in1")).as("n1"), sum(col("in2")).as("n2"),
        sum(col("in1") * col("in2")).as("m"))
      .select(col("n1"), col("n2"), col("m"),
        (((col("n1") + 1) * (col("n2") + 1)).cast("double") /
          (col("m") + 1).cast("double") - lit(1.0)).as("n_hat"))
      .withColumn("se_hat",
        sqrt(((col("n1") + 1) * (col("n2") + 1)).cast("double") *
          ((col("n1") - col("m")) * (col("n2") - col("m"))).cast("double") /
          (((col("m") + 1) * (col("m") + 1)).cast("double") *
            (col("m") + 2).cast("double"))))
  }

  private[graft] lazy val anCaptureRecaptureSql =
    """WITH f AS (SELECT user_id,
      |    MAX(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS in1,
      |    MAX(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS in2
      |  FROM events GROUP BY user_id),
      |t AS (SELECT CAST(SUM(in1) AS BIGINT) AS n1, CAST(SUM(in2) AS BIGINT) AS n2,
      |        CAST(SUM(in1 * in2) AS BIGINT) AS m FROM f)
      |SELECT n1, n2, m,
      |  CAST((n1 + 1) * (n2 + 1) AS DOUBLE) / CAST(m + 1 AS DOUBLE) - 1.0 AS n_hat,
      |  sqrt(CAST((n1 + 1) * (n2 + 1) AS DOUBLE)
      |       * CAST((n1 - m) * (n2 - m) AS DOUBLE)
      |       / (CAST((m + 1) * (m + 1) AS DOUBLE) * CAST(m + 2 AS DOUBLE))) AS se_hat
      |FROM t""".stripMargin

  /** Gumbel extreme-value fit over monthly block maxima of daily
    * revenue (method of moments): β̂ = s·√6/π, μ̂ = x̄ − γ·β̂, plus the
    * 12-month return level μ̂ − β̂·ln(−ln(1 − 1/12)) — the capacity
    * question "what daily peak should next year expect". Daily cents →
    * monthly maxima (two partial-aggregable passes); moments use the
    * an_anova integer grand-shift so Σc² is an exact DECIMAL(38,0) at
    * any SF; the fit is straight-line IEEE over those exact integers
    * with γ and π as shared literals, unrounded. */
  private[graft] def anGumbelMaxima(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"))
    val maxima = daily.groupBy(date_trunc("month", col("day")).as("mon"))
      .agg(max(col("rev_c")).as("mx"))
    val grand = maxima.agg(sum(col("mx")).as("s0"), count(lit(1)).as("n0"))
      .select(expr("s0 div n0").as("m0"))
    maxima.crossJoin(broadcast(grand))
      .select(col("m0"), (col("mx") - col("m0")).as("c"))
      .agg(max(col("m0")).as("m0"), count(lit(1)).as("n"),
        sum(col("c")).as("sp"),
        sum((col("c").cast("decimal(18,0)") * col("c").cast("decimal(18,0)"))
          .cast("decimal(38,0)")).as("qp"))
      .select(col("n"),
        (col("m0").cast("double") +
          col("sp").cast("double") / col("n").cast("double")).as("mean_c"),
        sqrt((col("qp").cast("double") -
          col("sp").cast("double") * col("sp").cast("double") /
            col("n").cast("double")) / (col("n") - 1).cast("double")).as("sd_c"))
      .select(col("n"), col("mean_c"), col("sd_c"),
        (col("sd_c") * sqrt(lit(6.0)) / lit(3.141592653589793)).as("beta_c"))
      .select(col("n"), col("mean_c"), col("sd_c"), col("beta_c"),
        (col("mean_c") - lit(0.5772156649015329) * col("beta_c")).as("mu_c"))
      .withColumn("ret12_c",
        col("mu_c") - col("beta_c") * log(-log(lit(1.0) - lit(1.0) / lit(12.0))))
  }

  // WIDTH CONTRACT (the an_jonckheere class, tripped at the r16 sf1
  // gate): mx − m0 deviations are monthly maxima of DAILY REVENUE,
  // which grows linearly with SF — 1.08e9 cents at sf1, whose square
  // has 19 digits. DuckDB ENFORCES the declared operand precision
  // (DECIMAL(18)² errored at sf1) where Spark widens the result, so
  // the oracle squares through DECIMAL(19,0) (19×19 → int128-exact
  // DECIMAL(38,0), headroom to ~1e19-cent deviations ≈ sf1e10).
  private[graft] lazy val anGumbelMaximaSql =
    """WITH daily AS (SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rev_c
      |  FROM lineitem GROUP BY 1),
      |mx AS (SELECT date_trunc('month', day) AS mon, MAX(rev_c) AS mx FROM daily GROUP BY 1),
      |g AS (SELECT CAST(SUM(mx) AS BIGINT) // COUNT(*) AS m0 FROM mx),
      |t AS (SELECT MAX(m0) AS m0, COUNT(*) AS n,
      |        CAST(SUM(mx - m0) AS BIGINT) AS sp,
      |        CAST(SUM(CAST(CAST(mx - m0 AS DECIMAL(19,0)) * CAST(mx - m0 AS DECIMAL(19,0))
      |             AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS qp
      |      FROM mx CROSS JOIN g),
      |mo AS (SELECT n,
      |         CAST(m0 AS DOUBLE) + CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
      |         sqrt((CAST(qp AS DOUBLE)
      |               - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(n AS DOUBLE))
      |              / CAST(n - 1 AS DOUBLE)) AS sd_c
      |       FROM t),
      |b AS (SELECT n, mean_c, sd_c, sd_c * sqrt(6.0) / 3.141592653589793 AS beta_c FROM mo),
      |u AS (SELECT n, mean_c, sd_c, beta_c,
      |        mean_c - 0.5772156649015329 * beta_c AS mu_c FROM b)
      |SELECT n, mean_c, sd_c, beta_c, mu_c,
      |  mu_c - beta_c * ln(-ln(1.0 - 1.0 / 12.0)) AS ret12_c
      |FROM u""".stripMargin

  /** Instrumental-variable (Wald) estimator — the causal-inference
    * step beyond [[anDid]]/[[anCuped]] when exposure is endogenous:
    * with the deterministic user-parity instrument Z, exposure X =
    * per-user view count and outcome Y = per-user purchase cents,
    * β̂_IV = (Ȳ₁−Ȳ₀)/(X̄₁−X̄₀), plus the first-stage strength
    * X̄₁−X̄₀ a practitioner must inspect before trusting the ratio.
    * One per-user aggregate (ids+ints shuffle), a 2-row arm collapse,
    * straight-line IEEE over exact BIGINTs, unrounded. */
  private[graft] def anIvWald(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase",
          (col("value").cast("decimal(24,2)") * 100).cast("bigint"))
          .otherwise(0L)).as("y"))
    perUser.groupBy((col("user_id") % 2).as("z"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"))
      .agg(sum(when(col("z") === 1, col("n"))).as("n1"),
        sum(when(col("z") === 0, col("n"))).as("n0"),
        sum(when(col("z") === 1, col("sx"))).as("sx1"),
        sum(when(col("z") === 0, col("sx"))).as("sx0"),
        sum(when(col("z") === 1, col("sy"))).as("sy1"),
        sum(when(col("z") === 0, col("sy"))).as("sy0"))
      .select(col("n1"), col("n0"),
        (col("sx1").cast("double") / col("n1").cast("double") -
          col("sx0").cast("double") / col("n0").cast("double")).as("first_stage"),
        (col("sy1").cast("double") / col("n1").cast("double") -
          col("sy0").cast("double") / col("n0").cast("double")).as("reduced_form"))
      .withColumn("beta_iv", col("reduced_form") / col("first_stage"))
  }

  private[graft] lazy val anIvWaldSql =
    """WITH u AS (SELECT user_id,
      |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN event_type = 'purchase'
      |             THEN CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY user_id),
      |z AS (SELECT user_id % 2 AS z, COUNT(*) AS n,
      |        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy
      |      FROM u GROUP BY 1),
      |t AS (SELECT
      |    MAX(CASE WHEN z = 1 THEN n END) AS n1, MAX(CASE WHEN z = 0 THEN n END) AS n0,
      |    MAX(CASE WHEN z = 1 THEN sx END) AS sx1, MAX(CASE WHEN z = 0 THEN sx END) AS sx0,
      |    MAX(CASE WHEN z = 1 THEN sy END) AS sy1, MAX(CASE WHEN z = 0 THEN sy END) AS sy0
      |  FROM z),
      |d AS (SELECT n1, n0,
      |        CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |          - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS first_stage,
      |        CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |          - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS reduced_form
      |      FROM t)
      |SELECT n1, n0, first_stage, reduced_form,
      |  reduced_form / first_stage AS beta_iv
      |FROM d""".stripMargin

  /** Post-stratified average treatment effect: users are stratified by
    * PRE-period activity (first-half event count bucketed 0–2), treat
    * is the parity split, and the outcome is second-half purchase
    * cents; ATE = Σ_s (n_s/N)(ȳ₁ₛ − ȳ₀ₛ) — the variance-reduction
    * design that stops a heavy-user imbalance from masquerading as an
    * effect (the blocking complement to [[anCuped]]'s regression
    * adjustment). Per-user flags → per-(stratum, arm) exact sums → a
    * strata-sized frame; the weighted contrast gathers through
    * DECIMAL(38,18) (order-independent), ROUND(·,6) at emission. */
  private[graft] def anStratifiedAte(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("2024-01-16").cast("timestamp")
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("ts") < cut, 1L).otherwise(0L)).as("pre_n"),
        sum(when(col("ts") >= cut && col("event_type") === "purchase",
          (col("value").cast("decimal(24,2)") * 100).cast("bigint"))
          .otherwise(0L)).as("y"))
      .select((col("user_id") % 2).as("treat"),
        least(col("pre_n"), lit(2L)).as("stratum"), col("y"))
    val cells = perUser.groupBy(col("stratum"), col("treat"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    val strata = cells.groupBy(col("stratum"))
      .agg(sum(col("n")).as("n_s"),
        sum(when(col("treat") === 1, col("sy"))).as("sy1"),
        sum(when(col("treat") === 1, col("n"))).as("n1"),
        sum(when(col("treat") === 0, col("sy"))).as("sy0"),
        sum(when(col("treat") === 0, col("n"))).as("n0"))
      .filter(col("n1") > 0 && col("n0") > 0)
    val tot = strata.agg(sum(col("n_s")).as("nn"))
    strata.crossJoin(broadcast(tot))
      .agg(count(lit(1)).as("n_strata"), max(col("nn")).as("n_users"),
        round(sum((col("n_s").cast("double") / col("nn").cast("double") *
            (col("sy1").cast("double") / col("n1").cast("double") -
              col("sy0").cast("double") / col("n0").cast("double")))
          .cast("decimal(38,18)")).cast("double"), 6).as("ate_c"))
  }

  private[graft] lazy val anStratifiedAteSql =
    """WITH u AS (SELECT user_id % 2 AS treat,
      |    LEAST(CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT), 2) AS stratum,
      |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16' AND event_type = 'purchase'
      |             THEN CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT) ELSE 0 END) AS BIGINT) AS y
      |  FROM events GROUP BY user_id),
      |c AS (SELECT stratum, treat, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS sy
      |      FROM u GROUP BY 1, 2),
      |s AS (SELECT stratum, CAST(SUM(n) AS BIGINT) AS n_s,
      |        CAST(MAX(CASE WHEN treat = 1 THEN sy END) AS BIGINT) AS sy1,
      |        CAST(MAX(CASE WHEN treat = 1 THEN n END) AS BIGINT) AS n1,
      |        CAST(MAX(CASE WHEN treat = 0 THEN sy END) AS BIGINT) AS sy0,
      |        CAST(MAX(CASE WHEN treat = 0 THEN n END) AS BIGINT) AS n0
      |      FROM c GROUP BY stratum
      |      HAVING n1 > 0 AND n0 > 0),
      |t AS (SELECT CAST(SUM(n_s) AS BIGINT) AS nn FROM s)
      |SELECT COUNT(*) AS n_strata, MAX(nn) AS n_users,
      |  ROUND(CAST(CAST(SUM(CAST(CAST(n_s AS DOUBLE) / CAST(nn AS DOUBLE)
      |        * (CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |           - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)) AS DECIMAL(38,18)))
      |      AS DECIMAL(38,18)) AS DOUBLE), 6) AS ate_c
      |FROM s CROSS JOIN t""".stripMargin

  /** Index-of-dispersion (variance-to-mean) test of per-user daily
    * event counts against the Poisson hypothesis — the "is activity
    * bursty or memoryless" screen that decides whether rate metrics
    * can assume independence. Counts are exact integers over ACTIVE
    * (user, day) pairs (zero days are not observed exposure —
    * documented choice); Σc and Σc² are exact BIGINTs, D = s²/x̄ and
    * the χ²-approximating statistic (n−1)·D straight-line IEEE,
    * unrounded. One data-sized groupBy, then scalars. */
  private[graft] def anDispersion(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    counts.agg(count(lit(1)).as("n"), sum(col("c")).as("sc"),
        sum(col("c") * col("c")).as("sc2"))
      .select(col("n"), col("sc"),
        (col("sc").cast("double") / col("n").cast("double")).as("mean_c"),
        ((col("sc2").cast("double") -
          col("sc").cast("double") * col("sc").cast("double") /
            col("n").cast("double")) / (col("n") - 1).cast("double")).as("var_c"))
      .withColumn("dispersion", col("var_c") / col("mean_c"))
      .withColumn("chi2_stat", (col("n") - 1).cast("double") * col("dispersion"))
  }

  private[graft] lazy val anDispersionSql =
    """WITH c AS (SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |t AS (SELECT COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS sc,
      |        CAST(SUM(c * c) AS BIGINT) AS sc2 FROM c),
      |d AS (SELECT n, sc,
      |        CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mean_c,
      |        (CAST(sc2 AS DOUBLE)
      |         - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
      |          / CAST(n - 1 AS DOUBLE) AS var_c
      |      FROM t)
      |SELECT n, sc, mean_c, var_c, var_c / mean_c AS dispersion,
      |  CAST(n - 1 AS DOUBLE) * (var_c / mean_c) AS chi2_stat
      |FROM d""".stripMargin

  /** Mann–Whitney U (rank-sum) test — urgent vs low-priority order
    * totals, the nonparametric two-sample location test. Ranks are
    * midranks over the POOLED sample, computed scale-first: aggregate
    * to distinct cent values (value → total count, group-1 count),
    * then ONE [[graft.operators.PrefixSum]] scan gives each value's
    * exclusive cumulative count, so its doubled midrank 2·r̄ =
    * 2·cum_before + t + 1 is an exact integer — no global row window,
    * no half-rank doubles. The doubled rank sum 2R₁, the tie term
    * Σ(t³−t), n₁, n₂ are exact BIGINTs (overflow needs N > ~3e9 rows
    * in the two priority classes); U, the tie-corrected σ, and z are
    * pure IEEE on those ints — emitted unrounded, bit-stable. */
  private[graft] def anMannWhitney(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select((col("o_orderpriority") === "1-URGENT").cast("long").as("g1"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val perV = o.groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"), sum(col("g1")).as("c1"))
    val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt"))
    scan
      .select(col("cnt"), col("c1"),
        (lit(2L) * (col("cnt_cum") - col("cnt")) + col("cnt") + lit(1L)).as("r2"))
      .agg(sum(col("c1")).as("n1"), sum(col("cnt") - col("c1")).as("n2"),
        sum(col("c1") * col("r2")).as("r2_1"),
        sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("ties"))
      .select(col("n1"), col("n2"), col("r2_1"), col("ties"),
        ((col("r2_1") - col("n1") * (col("n1") + lit(1L))).cast("double") / lit(2.0))
          .as("u1"))
      .withColumn("z",
        (col("u1") - col("n1").cast("double") * col("n2").cast("double") / lit(2.0)) /
          sqrt((col("n1").cast("double") * col("n2").cast("double") / lit(12.0)) *
            ((col("n1") + col("n2") + lit(1L)).cast("double") -
              col("ties").cast("double") /
                ((col("n1") + col("n2")).cast("double") *
                  (col("n1") + col("n2") - lit(1L)).cast("double")))))
  }

  private[graft] lazy val anMannWhitneySql =
    """WITH o AS (SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g1,
      |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
      |pv AS (SELECT v, COUNT(*) AS cnt, CAST(SUM(g1) AS BIGINT) AS c1 FROM o GROUP BY v),
      |cv AS (SELECT cnt, c1,
      |         2 * (CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) - cnt) + cnt + 1 AS r2
      |       FROM pv),
      |agg AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
      |          CAST(SUM(cnt - c1) AS BIGINT) AS n2,
      |          CAST(SUM(c1 * r2) AS BIGINT) AS r2_1,
      |          CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
      |        FROM cv)
      |SELECT n1, n2, r2_1, ties,
      |  CAST(r2_1 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
      |  (CAST(r2_1 - n1 * (n1 + 1) AS DOUBLE) / 2.0
      |     - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
      |  / sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
      |         * (CAST(n1 + n2 + 1 AS DOUBLE)
      |            - CAST(ties AS DOUBLE)
      |              / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))) AS z
      |FROM agg""".stripMargin

  /** Kruskal–Wallis H across ALL five order priorities — the k-group
    * extension of [[anMannWhitney]], same scale posture: ONE pooled
    * PrefixSum scan over distinct cent values yields every value's
    * doubled midrank as an exact integer; per-group doubled rank sums
    * 2R_g are exact BIGINTs; the deviation form H = 12/(N(N+1)) ·
    * Σ(2R_g − n_g(N+1))²/(4n_g) keeps each squared term centered
    * (group-mean-rank deviations, not raw rank sums — the an_anova m0
    * trick in rank space) before the DECIMAL(38,18) gather; the tie
    * correction divides by 1 − Σ(t³−t)/(N³−N) in pure IEEE. H is
    * emitted ROUND(·,6): once the gathered term sum crosses 2⁵³ the
    * decimal→double re-conversion rounds engine-dependently in the
    * last ulp (seen at sf0.1), the exact skew class the 6dp rule
    * absorbs. */
  private[graft] def anKruskal(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("g"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val perV = o.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt"))
      .select(col("v"),
        (lit(2L) * (col("cnt_cum") - col("cnt")) + col("cnt") + lit(1L)).as("r2"),
        col("cnt"))
    val grand = scan.agg(sum(col("cnt")).as("n"),
      sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("ties"))
    val perG = o.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
      .join(scan.select(col("v"), col("r2")), Seq("v"))
      .groupBy(col("g"))
      .agg(sum(col("c")).as("n_g"), sum(col("c") * col("r2")).as("r2_g"))
    perG.crossJoin(broadcast(grand))
      .select(col("n_g"),
        ((col("r2_g") - col("n_g") * (col("n") + lit(1L))).cast("double") *
          (col("r2_g") - col("n_g") * (col("n") + lit(1L))).cast("double") /
          (lit(4.0) * col("n_g").cast("double"))).as("term"),
        col("n"), col("ties"))
      .groupBy(col("n"), col("ties"))
      .agg(count(lit(1)).as("k"),
        sum(col("term").cast("decimal(38,18)")).as("dev_gather"))
      .select(col("k"), col("n"),
        round(lit(12.0) / (col("n").cast("double") * (col("n") + lit(1L)).cast("double")) *
          col("dev_gather").cast("double") /
          (lit(1.0) - col("ties").cast("double") /
            (col("n").cast("double") * col("n").cast("double") *
              col("n").cast("double") - col("n").cast("double"))), 6).as("h_stat"))
  }

  private[graft] lazy val anKruskalSql =
    """WITH o AS (SELECT o_orderpriority AS g,
      |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |pv AS (SELECT v, COUNT(*) AS cnt FROM o GROUP BY v),
      |cv AS (SELECT v, 2 * (CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) - cnt) + cnt + 1 AS r2,
      |         cnt
      |       FROM pv),
      |grand AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
      |            CAST(SUM(cnt * cnt * cnt - cnt) AS BIGINT) AS ties
      |          FROM cv),
      |pg AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_g, CAST(SUM(c * r2) AS BIGINT) AS r2_g
      |       FROM (SELECT g, o.v, COUNT(*) AS c FROM o GROUP BY g, o.v) gv
      |       JOIN cv ON gv.v = cv.v GROUP BY g),
      |terms AS (SELECT n_g,
      |            CAST(r2_g - n_g * (n + 1) AS DOUBLE) * CAST(r2_g - n_g * (n + 1) AS DOUBLE)
      |              / (4.0 * CAST(n_g AS DOUBLE)) AS term,
      |            n, ties
      |          FROM pg CROSS JOIN grand),
      |agg AS (SELECT n, ties, COUNT(*) AS k,
      |          CAST(SUM(CAST(term AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS dev_gather
      |        FROM terms GROUP BY n, ties)
      |SELECT k, n,
      |  ROUND(12.0 / (CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE))
      |    * CAST(dev_gather AS DOUBLE)
      |    / (1.0 - CAST(ties AS DOUBLE)
      |             / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
      |                - CAST(n AS DOUBLE))), 6) AS h_stat
      |FROM agg""".stripMargin

  /** Poisson-bootstrap 95% CI for the mean order value — resampling
    * uncertainty at pipeline scale without materializing B resamples:
    * every row draws a deterministic pseudo-Poisson(1) weight per
    * replica via [[graft.functions.Sketches.poissonWeight]] (tempered
    * mod-p integer hash — all-integer hot path, no per-draw string
    * hashing; measured ~8× faster than an md5-nibble draw at sf0.1),
    * so all 64 replicas ride ONE scan with map-side partial
    * aggregation and the replica frame is 64 rows. Replica means are
    * IEEE divisions of exact integer sums, the CI bounds are order
    * statistics of the 64-row frame — every intermediate is exact and
    * the DuckDB oracle replays the whole construction bit-for-bit.
    * At 100 TB the exploded (row × 64) stream never shuffles at full
    * width: partial aggregation collapses it to 64 rows per task. */
  private[graft] def anBootstrapCi(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
      (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val drawn = o.select(col("k"), col("v"),
        explode(sequence(lit(0), lit(63))).as("b"))
      .withColumn("w",
        graft.functions.Sketches.poissonWeight(col("k"), col("b"), 64))
    val reps = drawn.groupBy(col("b"))
      .agg(sum(col("w")).as("n_eff"), sum(col("w") * col("v")).as("tot"))
      .select(col("b"),
        (col("tot").cast("double") / col("n_eff").cast("double")).as("mb"))
    // 64 rows: the unpartitioned window is a 64-row sort, not a funnel
    val ranked = reps.withColumn("rn",
      row_number().over(Window.orderBy(col("mb"), col("b"))))
    val lo = ranked.filter(col("rn") === 2).select(col("mb").as("lo_cents"))
    val hi = ranked.filter(col("rn") === 63).select(col("mb").as("hi_cents"))
    val base = o.agg(
      (sum(col("v")).cast("double") / count(lit(1)).cast("double")).as("mean_cents"))
    base.crossJoin(lo).crossJoin(hi).withColumn("n_boot", lit(64L))
  }

  private[graft] lazy val anBootstrapCiSql: String = {
    val w = graft.functions.Sketches.PoissonCdfP
      .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH o AS (SELECT o_orderkey AS k,
       |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
       |  FROM orders),
       |d AS (SELECT k, v, t.range AS b FROM o, range(0, 64) t),
       |t1 AS (SELECT b, v,
       |    (((k * 64 + b) % 2147483647) * 1000003 + 12289) % 2147483647 AS x
       |  FROM d),
       |t2 AS (SELECT b, v, xor(x, x >> 15) AS x FROM t1),
       |t3 AS (SELECT b, v, (x * 786433) % 2147483647 AS x FROM t2),
       |t4 AS (SELECT b, v, xor(x, x >> 13) AS u FROM t3),
       |ww AS (SELECT b, v, $w AS w FROM t4),
       |r AS (SELECT b, CAST(SUM(w) AS BIGINT) AS n_eff,
       |        CAST(SUM(w * v) AS BIGINT) AS tot
       |      FROM ww GROUP BY b),
       |m AS (SELECT b, CAST(tot AS DOUBLE) / CAST(n_eff AS DOUBLE) AS mb FROM r),
       |rk AS (SELECT mb, row_number() OVER (ORDER BY mb, b) AS rn FROM m),
       |base AS (SELECT CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE)
       |                / CAST(COUNT(*) AS DOUBLE) AS mean_cents FROM o)
       |SELECT base.mean_cents, lo.mb AS lo_cents, hi.mb AS hi_cents,
       |  CAST(64 AS BIGINT) AS n_boot
       |FROM base, (SELECT mb FROM rk WHERE rn = 2) lo,
       |     (SELECT mb FROM rk WHERE rn = 63) hi""".stripMargin
  }

  /** CLUSTER bootstrap CI for a treatment effect — the methodologically
    * honest uncertainty for unit-randomized metrics: the resampling unit
    * is the CUSTOMER, not the order row, and because the Poisson weight
    * is a deterministic function of (custkey, replica) every order of a
    * customer shares its replica weight with ZERO extra shuffle or
    * per-user pre-aggregation — cluster semantics fall out of the draw
    * being keyed on the cluster id. Per replica: weighted group means,
    * diff; CI = order statistics of the 64 replica diffs; the point
    * estimate is the exact unweighted diff. Same all-integer tempered
    * draw + partial-agg posture as an_bootstrap_ci. */
  private[graft] def anBootstrapDiff(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_custkey").as("ck"),
      (col("o_custkey") % 2).cast("int").as("g"),
      (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val drawn = o.select(col("ck"), col("g"), col("v"),
        explode(sequence(lit(0), lit(63))).as("b"))
      .withColumn("w",
        graft.functions.Sketches.poissonWeight(col("ck"), col("b"), 64))
    val reps = drawn.groupBy(col("b"))
      .agg(sum(when(col("g") === 1, col("w")).otherwise(0L)).as("n1"),
        sum(when(col("g") === 1, col("w") * col("v")).otherwise(0L)).as("t1"),
        sum(when(col("g") === 0, col("w")).otherwise(0L)).as("n0"),
        sum(when(col("g") === 0, col("w") * col("v")).otherwise(0L)).as("t0"))
      .select(col("b"),
        (col("t1").cast("double") / col("n1").cast("double") -
          col("t0").cast("double") / col("n0").cast("double")).as("db"))
    val ranked = reps.withColumn("rn",
      row_number().over(Window.orderBy(col("db"), col("b"))))
    val lo = ranked.filter(col("rn") === 2).select(col("db").as("lo_cents"))
    val hi = ranked.filter(col("rn") === 63).select(col("db").as("hi_cents"))
    val base = o.agg(
      (sum(when(col("g") === 1, col("v"))).cast("double") /
        sum(when(col("g") === 1, 1L).otherwise(0L)).cast("double") -
       sum(when(col("g") === 0, col("v"))).cast("double") /
        sum(when(col("g") === 0, 1L).otherwise(0L)).cast("double")).as("diff_cents"))
    base.crossJoin(lo).crossJoin(hi).withColumn("n_boot", lit(64L))
  }

  private[graft] lazy val anBootstrapDiffSql: String = {
    val w = graft.functions.Sketches.PoissonCdfP
      .map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH o AS (SELECT o_custkey AS ck, CAST(o_custkey % 2 AS INT) AS g,
       |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
       |  FROM orders),
       |d AS (SELECT ck, g, v, t.range AS b FROM o, range(0, 64) t),
       |t1 AS (SELECT g, v, b,
       |    (((ck * 64 + b) % 2147483647) * 1000003 + 12289) % 2147483647 AS x
       |  FROM d),
       |t2 AS (SELECT g, v, b, xor(x, x >> 15) AS x FROM t1),
       |t3 AS (SELECT g, v, b, (x * 786433) % 2147483647 AS x FROM t2),
       |t4 AS (SELECT g, v, b, xor(x, x >> 13) AS u FROM t3),
       |ww AS (SELECT g, v, b, $w AS w FROM t4),
       |r AS (SELECT b,
       |    CAST(SUM(CASE WHEN g = 1 THEN w ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(SUM(CASE WHEN g = 1 THEN w * v ELSE 0 END) AS BIGINT) AS t1,
       |    CAST(SUM(CASE WHEN g = 0 THEN w ELSE 0 END) AS BIGINT) AS n0,
       |    CAST(SUM(CASE WHEN g = 0 THEN w * v ELSE 0 END) AS BIGINT) AS t0
       |  FROM ww GROUP BY b),
       |m AS (SELECT b, CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE)
       |             - CAST(t0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS db FROM r),
       |rk AS (SELECT db, row_number() OVER (ORDER BY db, b) AS rn FROM m),
       |base AS (SELECT
       |    CAST(CAST(SUM(CASE WHEN g = 1 THEN v END) AS BIGINT) AS DOUBLE)
       |      / CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |    - CAST(CAST(SUM(CASE WHEN g = 0 THEN v END) AS BIGINT) AS DOUBLE)
       |      / CAST(SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS diff_cents
       |  FROM o)
       |SELECT base.diff_cents, lo.db AS lo_cents, hi.db AS hi_cents,
       |  CAST(64 AS BIGINT) AS n_boot
       |FROM base, (SELECT db FROM rk WHERE rn = 2) lo,
       |     (SELECT db FROM rk WHERE rn = 63) hi""".stripMargin
  }

  /** Welch's unequal-variance t-test between two customer segments'
    * order values — the two-sample mean comparison next to an_anova's
    * k-group F and an_mannwhitney's rank test. Same exactness recipe as
    * an_anova: integer grand-mean shift keeps Σdev and Σdev² exact
    * (BIGINT / DECIMAL(38,0)) at any SF; t and the Welch–Satterthwaite
    * df are straight-line IEEE over those sums, ROUND(·,6) because the
    * DECIMAL(38,0)→double image crosses 2^53 at scale (the recorded
    * an_kruskal ulp-skew class). One broadcast-joined scan, one
    * two-group aggregate — map-side partial all the way. */
  private[graft] def anWelchTtest(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_mktsegment").as("g"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val grand = o.agg(sum(col("v")).as("s0"), count(lit(1)).as("n0"))
      .select(expr("s0 div n0").as("m0"))
    val per = o.crossJoin(broadcast(grand))
      .select(col("g"), (col("v") - col("m0")).as("c"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"), sum(col("c")).as("sp_g"),
        sum((col("c").cast("decimal(18,0)") * col("c").cast("decimal(18,0)"))
          .cast("decimal(38,0)")).as("qp_g"))
      .select(col("g"), col("n_g"),
        (col("sp_g").cast("double") / col("n_g").cast("double")).as("mdev"),
        ((col("qp_g").cast("double") -
          col("sp_g").cast("double") * col("sp_g").cast("double") /
            col("n_g").cast("double")) /
          (col("n_g") - lit(1)).cast("double")).as("s2"))
    val agg = per.agg(
      max(when(col("g") === "BUILDING", col("n_g"))).as("n1"),
      max(when(col("g") === "BUILDING", col("mdev"))).as("m1"),
      max(when(col("g") === "BUILDING", col("s2"))).as("s21"),
      max(when(col("g") === "MACHINERY", col("n_g"))).as("n2"),
      max(when(col("g") === "MACHINERY", col("mdev"))).as("m2"),
      max(when(col("g") === "MACHINERY", col("s2"))).as("s22"))
    // se terms spelled x*x (not pow) — pow(x, 2.0) is not guaranteed
    // correctly rounded and need not agree across engines
    val se1 = col("s21") / col("n1").cast("double")
    val se2 = col("s22") / col("n2").cast("double")
    agg.select(col("n1"), col("n2"),
      round((col("m1") - col("m2")) / sqrt(se1 + se2), 6).as("t_welch"),
      round(((se1 + se2) * (se1 + se2)) /
        (se1 * se1 / (col("n1") - lit(1)).cast("double") +
         se2 * se2 / (col("n2") - lit(1)).cast("double")), 6).as("df_welch"))
  }

  private[graft] lazy val anWelchTtestSql =
    """WITH o AS (SELECT c.c_mktsegment AS g,
      |    CAST(CAST(o.o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
      |m AS (SELECT CAST(SUM(v) AS BIGINT) // COUNT(*) AS m0 FROM o),
      |per AS (SELECT g, COUNT(*) AS n_g,
      |    CAST(SUM(v - m0) AS BIGINT) AS sp_g,
      |    CAST(SUM(CAST(CAST(v - m0 AS DECIMAL(18,0)) * CAST(v - m0 AS DECIMAL(18,0))
      |             AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS qp_g
      |  FROM o CROSS JOIN m GROUP BY g),
      |st AS (SELECT g, n_g,
      |    CAST(sp_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS mdev,
      |    (CAST(qp_g AS DOUBLE) - CAST(sp_g AS DOUBLE) * CAST(sp_g AS DOUBLE)
      |       / CAST(n_g AS DOUBLE)) / CAST(n_g - 1 AS DOUBLE) AS s2
      |  FROM per),
      |p AS (SELECT
      |    MAX(CASE WHEN g = 'BUILDING' THEN n_g END) AS n1,
      |    MAX(CASE WHEN g = 'BUILDING' THEN mdev END) AS m1,
      |    MAX(CASE WHEN g = 'BUILDING' THEN s2 END) AS s21,
      |    MAX(CASE WHEN g = 'MACHINERY' THEN n_g END) AS n2,
      |    MAX(CASE WHEN g = 'MACHINERY' THEN mdev END) AS m2,
      |    MAX(CASE WHEN g = 'MACHINERY' THEN s2 END) AS s22
      |  FROM st)
      |SELECT n1, n2,
      |  ROUND((m1 - m2) / sqrt(s21 / n1 + s22 / n2), 6) AS t_welch,
      |  ROUND(((s21 / n1 + s22 / n2) * (s21 / n1 + s22 / n2)) /
      |    ((s21 / n1) * (s21 / n1) / (n1 - 1)
      |     + (s22 / n2) * (s22 / n2) / (n2 - 1)), 6) AS df_welch
      |FROM p""".stripMargin

  /** Difference-in-differences estimator over the events stream — the
    * quasi-experimental complement to an_abtest: 2×2 (treat × post)
    * cell means of event value with the interaction contrast
    * (m11−m10)−(m01−m00). Exactness: cents-BIGINT cell sums + counts
    * (one partial-aggregable pass), means and the DiD are straight-line
    * IEEE over those exact integers, emitted unrounded (the an_abtest
    * rule: division trees over identical exact ints are bit-identical). */
  private[graft] def anDid(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      (col("user_id") % 2).cast("int").as("treat"),
      (col("ts") >= lit("2024-01-16").cast("timestamp")).cast("int").as("post"),
      (col("value").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val cells = e.groupBy(col("treat"), col("post"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("tot"))
      .select(col("treat"), col("post"),
        col("n"), (col("tot").cast("double") / col("n").cast("double")).as("m"))
    def cell(t: Int, p: Int, c: String) =
      max(when(col("treat") === t && col("post") === p, col(c)))
    cells.agg(
        cell(0, 0, "n").as("n00"), cell(0, 1, "n").as("n01"),
        cell(1, 0, "n").as("n10"), cell(1, 1, "n").as("n11"),
        cell(0, 0, "m").as("m00"), cell(0, 1, "m").as("m01"),
        cell(1, 0, "m").as("m10"), cell(1, 1, "m").as("m11"))
      .withColumn("did_cents",
        (col("m11") - col("m10")) - (col("m01") - col("m00")))
  }

  private[graft] lazy val anDidSql =
    """WITH e AS (SELECT CAST(user_id % 2 AS INT) AS treat,
      |    CAST(ts >= TIMESTAMP '2024-01-16' AS INT) AS post,
      |    CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM events),
      |cells AS (SELECT treat, post, COUNT(*) AS n,
      |    CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS m
      |  FROM e GROUP BY treat, post),
      |p AS (SELECT
      |    MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n00,
      |    MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n01,
      |    MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n10,
      |    MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n11,
      |    MAX(CASE WHEN treat = 0 AND post = 0 THEN m END) AS m00,
      |    MAX(CASE WHEN treat = 0 AND post = 1 THEN m END) AS m01,
      |    MAX(CASE WHEN treat = 1 AND post = 0 THEN m END) AS m10,
      |    MAX(CASE WHEN treat = 1 AND post = 1 THEN m END) AS m11
      |  FROM cells)
      |SELECT n00, n01, n10, n11, m00, m01, m10, m11,
      |  (m11 - m10) - (m01 - m00) AS did_cents
      |FROM p""".stripMargin

  /** Holt double-exponential smoothing (level + trend) over daily event
    * revenue — completes the forecasting family (seasonal-naive:
    * an_forecast_naive, flat EWMA: an_ewma, decomposition:
    * an_seasonal_decompose) with the trend model. α = β = 1/2 makes
    * every update an exact dyadic average of integer cents ((x+y)/2 —
    * IEEE-exact, engine-portable like an_ewma's dyadic taps), so the
    * whole recursion and the h-step forecasts are bit-identical in the
    * oracle's 30 unrolled one-row CTE steps. The daily aggregate is the
    * distributed part (one groupBy over the event log); the recursion
    * folds over the ~30-row day series on the driver — model-sized
    * state, the documented centroids pattern (a year is 365 doubles). */
  private[graft] def anHoltForecast(s: SparkSession, dir: String): DataFrame = {
    // Driver-state bound: this collect is DAYS-sized (a year is 365
    // longs), never row-sized — the distributed work is the groupBy
    // above. At cluster scale the collected series needs no
    // checkpointing; if the recursion itself ever moved executor-side
    // (it does not), preemptible executors would want reliable
    // checkpoint() instead of localCheckpoint (the IterativeGraph note).
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("rev_c"))
      .orderBy(col("day"))
      .select(col("rev_c")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    require(daily.length >= 3, s"Holt needs >= 3 days, got ${daily.length}")
    // The oracle SQL unrolls exactly 31 recursion steps (s2..s31); a longer
    // series would silently diverge from it, so fail loudly instead.
    require(daily.length <= 31,
      s"Holt oracle unrolls 31 steps; got ${daily.length} days — see the " +
        "an_holt_forecast CALENDAR-HORIZON CONTRACT in SURVEY §2: widen " +
        "anHoltForecastSql's CTE unroll and this require in lockstep")
    var l = daily(0).toDouble
    var b = daily(1).toDouble - daily(0).toDouble
    daily.drop(1).foreach { y =>
      val lNew = (y.toDouble + (l + b)) / 2.0
      b = ((lNew - l) + b) / 2.0
      l = lNew
    }
    import s.implicits._
    Seq((daily.length.toLong, l, b, l + 7.0 * b))
      .toDF("n_days", "level_cents", "trend_cents", "fc7_cents")
  }

  private[graft] lazy val anHoltForecastSql: String = {
    // i-th observation (1-based) as a one-row scalar: day-ordered rank
    def y(i: String) = s"(SELECT rev_c FROM r WHERE rn = $i)"
    val steps = (2 to 31).map { t =>
      s"""s$t AS (SELECT CASE WHEN n >= $t
         |    THEN (CAST(${y(t.toString)} AS DOUBLE) + (l + b)) / 2.0 ELSE l END AS l,
         |  CASE WHEN n >= $t
         |    THEN (((CAST(${y(t.toString)} AS DOUBLE) + (l + b)) / 2.0 - l) + b) / 2.0
         |    ELSE b END AS b, n
         |  FROM s${t - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH daily AS (SELECT date_trunc('day', ts) AS day,
       |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
       |  FROM events GROUP BY 1),
       |r AS (SELECT rev_c, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
       |s1 AS (SELECT CAST(${y("1")} AS DOUBLE) AS l,
       |              CAST(${y("2")} AS DOUBLE) - CAST(${y("1")} AS DOUBLE) AS b,
       |              (SELECT COUNT(*) FROM r) AS n),
       |$steps
       |SELECT n AS n_days, l AS level_cents, b AS trend_cents,
       |  l + 7.0 * b AS fc7_cents FROM s31""".stripMargin
  }

  /** Holt–Winters additive seasonal smoothing (period 7, α=β=γ=1/2) —
    * an_holt_forecast plus the weekly seasonal ring the raw Holt model
    * aliases into its trend. All three recursions use dyadic 1/2
    * smoothing (IEEE-exact halvings, the an_ewma recipe); the only
    * non-dyadic op is the one init division by 7 (a single correctly-
    * rounded IEEE divide, identical on both engines). Level/trend
    * init: l=mean(first week), b=0; seasonal init s_i = x_i − l. The
    * oracle unrolls the t=8..31 recursion with the 7-slot seasonal
    * ring carried through every CTE step. Daily aggregate distributed;
    * the fold is days-sized driver state (the Holt posture). */
  private[graft] def anHoltWinters(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("rev_c"))
      .orderBy(col("day"))
      .select(col("rev_c")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    require(daily.length >= 8, s"Holt-Winters needs >= 8 days, got ${daily.length}")
    require(daily.length <= 31,
      s"oracle unrolls 31 steps; got ${daily.length} days — see the " +
        "an_holt_winters CALENDAR-HORIZON CONTRACT in SURVEY §2: widen " +
        "anHoltWintersSql's CTE unroll and this require in lockstep")
    val x = daily.map(_.toDouble)
    var l = x.take(7).sum / 7.0
    var b = 0.0
    val ring = Array.tabulate(7)(i => x(i) - l) // slot i == (t-1) % 7
    var t = 8
    while (t <= x.length) {
      val xt = x(t - 1)
      val slot = (t - 1) % 7
      val sp = ring(slot)
      val lNew = (xt - sp) / 2.0 + (l + b) / 2.0
      val bNew = (lNew - l) / 2.0 + b / 2.0
      ring(slot) = (xt - l - b) / 2.0 + sp / 2.0
      l = lNew; b = bNew
      t += 1
    }
    val n = x.length
    val fc7 = l + 7.0 * b + ring((n + 6) % 7)
    import s.implicits._
    Seq((n.toLong, l, b, fc7)).toDF("n_days", "level_cents", "trend_cents", "fc7_cents")
  }

  private[graft] lazy val anHoltWintersSql: String = {
    def y(i: Int) = s"(SELECT rev_c FROM r WHERE rn = $i)"
    val sInit = (0 until 7).map(i => s"CAST(${y(i + 1)} AS DOUBLE) - l AS s$i").mkString(", ")
    val steps = (8 to 31).map { t =>
      val slot = (t - 1) % 7
      val carries = (0 until 7).filter(_ != slot).map(i => s"s$i").mkString(", ")
      s"""s$t AS (SELECT n,
         |  CASE WHEN n >= $t THEN (CAST(${y(t)} AS DOUBLE) - s$slot) / 2.0 + (l + b) / 2.0
         |       ELSE l END AS l,
         |  CASE WHEN n >= $t THEN (((CAST(${y(t)} AS DOUBLE) - s$slot) / 2.0 + (l + b) / 2.0) - l) / 2.0 + b / 2.0
         |       ELSE b END AS b,
         |  CASE WHEN n >= $t THEN (CAST(${y(t)} AS DOUBLE) - l - b) / 2.0 + s$slot / 2.0
         |       ELSE s$slot END AS s$slot,
         |  $carries
         |  FROM s${t - 1})""".stripMargin
    }.mkString(",\n")
    val fcSlot = (0 until 7).map(i =>
      s"WHEN (n + 6) % 7 = $i THEN s$i").mkString(" ")
    s"""WITH daily AS (SELECT date_trunc('day', ts) AS day,
       |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS rev_c
       |  FROM events GROUP BY 1),
       |r AS (SELECT rev_c, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
       |i0 AS (SELECT (CAST(${y(1)} AS DOUBLE) + ${y(2)} + ${y(3)} + ${y(4)}
       |             + ${y(5)} + ${y(6)} + ${y(7)}) / 7.0 AS l,
       |              (SELECT COUNT(*) FROM r) AS n),
       |s7 AS (SELECT n, l, 0.0 AS b, $sInit FROM i0),
       |$steps
       |SELECT n AS n_days, l AS level_cents, b AS trend_cents,
       |  l + 7.0 * b + (CASE $fcSlot END) AS fc7_cents FROM s31""".stripMargin
  }

  /** Largest-Triangle-Three-Buckets downsampling of daily revenue to
    * 12 points — the dashboard-decimation operator (keep the visual
    * shape of a series with a fixed point budget): first/last pinned,
    * 10 interior buckets, each bucket contributing the point with the
    * largest triangle area against the PREVIOUS chosen point and the
    * NEXT bucket's centroid. The selection is sequential by
    * construction (each step needs the prior winner), so the fold runs
    * on the collected days-sized series (the Holt driver-state
    * posture) and the oracle unrolls the 10 bucket steps as CTEs; the
    * area comparison is a mirrored IEEE expression over exact integer
    * cents with argmax ties to the earliest day. */
  private[graft] def anLttb(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("v"))
      .orderBy(col("day"))
      .select(substring(col("day").cast("string"), 1, 10), col("v"))
      .as[(String, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.scalaLong))
      .collect()
    val n = daily.length
    require(n >= 12, s"LTTB to 12 points needs >= 12 days, got $n — see the " +
      "an_lttb SPAN CONTRACT in SURVEY §2 (no upper horizon: buckets scale with n)")
    val buckets = 10
    // interior ranks 2..n-1 split into 10 buckets (rank space, 1-based)
    def lo(i: Int) = (i.toLong * (n - 2) / buckets).toInt + 2
    def hi(i: Int) = ((i + 1).toLong * (n - 2) / buckets).toInt + 1
    val sel = scala.collection.mutable.ArrayBuffer[Int](1) // ranks, first pinned
    var px = 1.0
    var py = daily(0)._2.toDouble
    (0 until buckets).foreach { i =>
      val (ax, ay) =
        if (i < buckets - 1) {
          val r = (lo(i + 1) to hi(i + 1))
          (r.map(_.toDouble).sum / r.size, r.map(k => daily(k - 1)._2.toDouble).sum / r.size)
        } else (n.toDouble, daily(n - 1)._2.toDouble)
      var bestR = lo(i)
      var bestA = -1.0
      (lo(i) to hi(i)).foreach { r =>
        val x = r.toDouble
        val y = daily(r - 1)._2.toDouble
        val a = math.abs((px - ax) * (y - py) - (px - x) * (ay - py))
        if (a > bestA) { bestA = a; bestR = r } // strict: ties keep earliest
      }
      sel += bestR
      px = bestR.toDouble
      py = daily(bestR - 1)._2.toDouble
    }
    sel += n
    import s.implicits._
    sel.toSeq.zipWithIndex
      .map { case (r, i) =>
        (i.toLong + 1, r.toLong, daily(r - 1)._1, daily(r - 1)._2) }
      .toDF("seq", "x_rank", "day", "y_cents")
  }

  private[graft] lazy val anLttbSql: String = {
    // bucket i membership in rank space (n is a runtime scalar)
    def loB(i: Int) = s"($i * (n - 2)) // 10 + 2"
    def hiB(i: Int) = s"(${i + 1} * (n - 2)) // 10 + 1"
    val steps = (0 until 10).map { i =>
      val nextAvg =
        if (i < 9)
          s"""na$i AS (SELECT AVG(CAST(rn AS DOUBLE)) AS ax, AVG(CAST(v AS DOUBLE)) AS ay
             |        FROM r CROSS JOIN t WHERE rn >= ${loB(i + 1)} AND rn <= ${hiB(i + 1)})""".stripMargin
        else
          s"""na$i AS (SELECT CAST(n AS DOUBLE) AS ax,
             |               (SELECT CAST(v AS DOUBLE) FROM r CROSS JOIN t WHERE rn = n) AS ay
             |        FROM t)""".stripMargin
      val prev = if (i == 0) "sel_init" else s"sel${i - 1}"
      s"""$nextAvg,
         |sel$i AS (SELECT b.rn, b.v FROM r b CROSS JOIN t CROSS JOIN $prev p CROSS JOIN na$i a
         |          WHERE b.rn >= ${loB(i)} AND b.rn <= ${hiB(i)}
         |          ORDER BY abs((CAST(p.rn AS DOUBLE) - a.ax) * (CAST(b.v AS DOUBLE) - CAST(p.v AS DOUBLE))
         |                     - (CAST(p.rn AS DOUBLE) - CAST(b.rn AS DOUBLE)) * (a.ay - CAST(p.v AS DOUBLE))) DESC,
         |                   b.rn
         |          LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val picks = (Seq("SELECT 1 AS seq, rn, v FROM sel_init") ++
      (0 until 10).map(i => s"SELECT ${i + 2} AS seq, rn, v FROM sel$i") ++
      Seq("SELECT 12 AS seq, rn, v FROM r CROSS JOIN t WHERE rn = n")).mkString("\n  UNION ALL ")
    s"""WITH daily AS (SELECT date_trunc('day', ts) AS day,
       |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS v
       |  FROM events GROUP BY 1),
       |r AS (SELECT day, v, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
       |      FROM daily),
       |t AS (SELECT COUNT(*) AS n FROM r),
       |sel_init AS (SELECT rn, v FROM r WHERE rn = 1),
       |$steps,
       |p AS ($picks)
       |SELECT CAST(p.seq AS BIGINT) AS seq, p.rn AS x_rank,
       |       substr(CAST(r.day AS VARCHAR), 1, 10) AS day, p.v AS y_cents
       |FROM p JOIN r ON r.rn = p.rn ORDER BY seq""".stripMargin
  }

  private[graft] def anPacf(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("x"))
    val w = Window.orderBy(col("day"))
    val lagged = daily.select(col("x") +: (1 to 5).map(k =>
      lag(col("x"), k).over(w).as(s"l$k")): _*)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val aggs = Seq(count(lit(1)).cast("double").as("nd"),
        sum(dec(col("x"))).cast("double").as("sx"),
        sum(dec(col("x")) * col("x")).cast("double").as("a0")) ++
      (1 to 5).flatMap { k =>
        val lk = col(s"l$k")
        Seq(sum(when(lk.isNotNull, dec(col("x")) * lk).otherwise(dec(lit(0))))
            .cast("double").as(s"a$k"),
          sum(when(lk.isNotNull, dec(lk)).otherwise(dec(lit(0)))).cast("double").as(s"h$k"),
          sum(when(lk.isNotNull, dec(col("x"))).otherwise(dec(lit(0)))).cast("double").as(s"t$k"),
          sum(when(lk.isNotNull, 1L).otherwise(0L)).cast("double").as(s"m$k"))
      }
    val base = lagged.agg(aggs.head, aggs.tail: _*)
    val solved = (pacfRs ++ pacfSteps).foldLeft(base) { case (df, (n, e)) =>
      df.selectExpr("*", s"$e AS $n")
    }
    solved.selectExpr("CAST(nd AS BIGINT) AS n_days",
      "ROUND(phi11, 6) AS pacf_1", "ROUND(phi22, 6) AS pacf_2",
      "ROUND(phi33, 6) AS pacf_3", "ROUND(phi44, 6) AS pacf_4",
      "ROUND(phi55, 6) AS pacf_5")
  }

  private[graft] lazy val anPacfSql: String = {
    val aggCols = (1 to 5).map { k =>
      s"""    CAST(SUM(CASE WHEN l$k IS NOT NULL THEN CAST(x AS DECIMAL(38,0)) * l$k ELSE 0 END) AS DOUBLE) AS a$k,
         |    CAST(SUM(CASE WHEN l$k IS NOT NULL THEN CAST(l$k AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE) AS h$k,
         |    CAST(SUM(CASE WHEN l$k IS NOT NULL THEN CAST(x AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE) AS t$k,
         |    CAST(SUM(CASE WHEN l$k IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) AS m$k""".stripMargin
    }.mkString(",\n")
    val chain = (pacfRs ++ pacfSteps).zipWithIndex.map { case ((n, e), i) =>
      val prev = if (i == 0) "base" else s"c${i - 1}"
      s"c$i AS (SELECT *, $e AS $n FROM $prev)"
    }.mkString(",\n")
    val last = s"c${pacfRs.length + pacfSteps.length - 1}"
    s"""WITH daily AS (SELECT date_trunc('day', ts) AS day,
       |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS x
       |  FROM events GROUP BY 1),
       |lagged AS (SELECT x,
       |    ${(1 to 5).map(k => s"LAG(x, $k) OVER (ORDER BY day) AS l$k").mkString(", ")}
       |  FROM daily),
       |base AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
       |    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS a0,
       |$aggCols
       |  FROM lagged),
       |$chain
       |SELECT CAST(nd AS BIGINT) AS n_days,
       |  ROUND(phi11, 6) AS pacf_1, ROUND(phi22, 6) AS pacf_2,
       |  ROUND(phi33, 6) AS pacf_3, ROUND(phi44, 6) AS pacf_4,
       |  ROUND(phi55, 6) AS pacf_5
       |FROM $last""".stripMargin
  }

  /** CUPED variance reduction — the pre-experiment-covariate adjustment
    * that sits between an_ab_srm (trust) and an_abtest/an_did (effect):
    * per user, pre-period and post-period value sums (X, Y) from ONE
    * user-keyed pass; θ = cov(X,Y)/var(X) in the integer computational
    * form (n·ΣXY − ΣX·ΣY over n·ΣX² − ΣX², cross-products accumulated
    * in DECIMAL(38,0) — exact at any SF); per-variant adjusted means
    * Ȳ_g − θ(X̄_g − X̄) and the realized variance-reduction factor.
    * ROUND(·,6) on every emitted double: the decimal sums cross 2⁵³ at
    * scale (the recorded an_kruskal decimal→double ulp class). */
  private[graft] def anCuped(s: SparkSession, dir: String): DataFrame = {
    val split = lit("2024-01-16").cast("timestamp")
    val perUser = Tables.events(s, dir)
      .select(col("user_id"),
        (col("value").cast("decimal(24,2)") * 100).cast("bigint").as("v"),
        (col("ts") < split).as("pre"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("pre"), col("v")).otherwise(0L)).as("x"),
        sum(when(!col("pre"), col("v")).otherwise(0L)).as("y"))
      .select(col("user_id"), col("x"), col("y"),
        (col("user_id") % 2).cast("int").as("grp"))
    def d38(c: Column) = c.cast("decimal(19,0)")
    val tot = perUser.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum((d38(col("x")) * d38(col("x"))).cast("decimal(38,0)")).as("sxx"),
      sum((d38(col("x")) * d38(col("y"))).cast("decimal(38,0)")).as("sxy"),
      sum((d38(col("y")) * d38(col("y"))).cast("decimal(38,0)")).as("syy"))
    val grp = perUser.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_g"), sum(col("x")).as("sx_g"), sum(col("y")).as("sy_g"))
    def g(i: Int, c: String) = max(when(col("grp") === i, col(c)))
    val gw = grp.agg(
      g(0, "n_g").as("n0"), g(0, "sx_g").as("sx0"), g(0, "sy_g").as("sy0"),
      g(1, "n_g").as("n1"), g(1, "sx_g").as("sx1"), g(1, "sy_g").as("sy1"))
    val nD = col("n").cast("double")
    val theta = (nD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
      (nD * col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double"))
    val rho2 = ((nD * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) *
        (nD * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double"))) /
      ((nD * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")) *
        (nD * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double")))
    tot.crossJoin(gw).select(
      col("n").as("n_users"),
      round(theta, 6).as("theta"),
      round(col("sy0").cast("double") / col("n0").cast("double"), 6).as("raw_mean_0"),
      round(col("sy1").cast("double") / col("n1").cast("double"), 6).as("raw_mean_1"),
      round(col("sy0").cast("double") / col("n0").cast("double") -
        theta * (col("sx0").cast("double") / col("n0").cast("double") -
          col("sx").cast("double") / nD), 6).as("adj_mean_0"),
      round(col("sy1").cast("double") / col("n1").cast("double") -
        theta * (col("sx1").cast("double") / col("n1").cast("double") -
          col("sx").cast("double") / nD), 6).as("adj_mean_1"),
      round(rho2, 6).as("var_reduction"))
  }

  private[graft] lazy val anCupedSql =
    """WITH pu AS (SELECT user_id,
      |    CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
      |        THEN CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)
      |        ELSE 0 END) AS BIGINT) AS x,
      |    CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
      |        THEN CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)
      |        ELSE 0 END) AS BIGINT) AS y,
      |    CAST(user_id % 2 AS INT) AS grp
      |  FROM events GROUP BY user_id),
      |tot AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(CAST(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
      |    CAST(SUM(CAST(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
      |    CAST(SUM(CAST(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy
      |  FROM pu),
      |gw AS (SELECT
      |    MAX(CASE WHEN grp = 0 THEN n_g END) AS n0,
      |    MAX(CASE WHEN grp = 0 THEN sx_g END) AS sx0,
      |    MAX(CASE WHEN grp = 0 THEN sy_g END) AS sy0,
      |    MAX(CASE WHEN grp = 1 THEN n_g END) AS n1,
      |    MAX(CASE WHEN grp = 1 THEN sx_g END) AS sx1,
      |    MAX(CASE WHEN grp = 1 THEN sy_g END) AS sy1
      |  FROM (SELECT grp, COUNT(*) AS n_g, CAST(SUM(x) AS BIGINT) AS sx_g,
      |          CAST(SUM(y) AS BIGINT) AS sy_g
      |        FROM pu GROUP BY grp) g)
      |SELECT n AS n_users,
      |  ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS theta,
      |  ROUND(CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS raw_mean_0,
      |  ROUND(CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS raw_mean_1,
      |  ROUND(CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)
      |    - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |      * (CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS adj_mean_0,
      |  ROUND(CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |    - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |      * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS adj_mean_1,
      |  ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |         * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
      |      / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS var_reduction
      |FROM tot CROSS JOIN gw""".stripMargin

  /** ROC AUC of account balance as a churn score — the ranking-quality
    * readout a training pipeline wants before shipping a model feature
    * (reference notebook's churn flag, promoted to an evaluation
    * metric). Label = behavioral churn per [[anChurnRate]] (no order
    * inside the 90-day recency window, never-ordered counts as
    * churned); score = c_acctbal in cents. AUC is the Mann–Whitney
    * identity AUC = (R₁ − n₁(n₁+1)/2)/(n₁n₀) computed on the
    * [[anMannWhitney]] pooled-midrank posture: distinct cent values +
    * ONE [[graft.operators.PrefixSum]] scan make the doubled midrank
    * 2·r̄ = 2·cum_before + t + 1 an exact integer, so the doubled rank
    * sum 2R₁ is an exact BIGINT and AUC is one division of exact
    * integers — no global row window, bit-stable unrounded. */
  private[graft] def anRocAuc(s: SparkSession, dir: String): DataFrame = {
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
    val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt"))
    scan
      .select(col("cnt"), col("c1"),
        (lit(2L) * (col("cnt_cum") - col("cnt")) + col("cnt") + lit(1L)).as("r2"))
      .agg(sum(col("c1")).as("n1"), sum(col("cnt") - col("c1")).as("n0"),
        sum(col("c1") * col("r2")).as("r2_1"))
      .select(col("n1"), col("n0"),
        ((col("r2_1") - col("n1") * (col("n1") + lit(1L))).cast("double") /
          (lit(2.0) * col("n1").cast("double") * col("n0").cast("double")))
          .as("auc"))
  }

  private[graft] lazy val anRocAucSql =
    """WITH a AS (SELECT MAX(o_orderdate) AS mx FROM orders),
      |l AS (SELECT o_custkey, MAX(o_orderdate) AS last_order FROM orders GROUP BY 1),
      |lab AS (SELECT
      |    CASE WHEN last_order IS NULL OR last_order < mx - INTERVAL 90 DAY
      |         THEN 1 ELSE 0 END AS g1,
      |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM customer LEFT JOIN l ON c_custkey = o_custkey CROSS JOIN a),
      |pv AS (SELECT v, COUNT(*) AS cnt, CAST(SUM(g1) AS BIGINT) AS c1 FROM lab GROUP BY v),
      |cv AS (SELECT cnt, c1,
      |         2 * (CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) - cnt) + cnt + 1 AS r2
      |       FROM pv),
      |agg AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
      |          CAST(SUM(cnt - c1) AS BIGINT) AS n0,
      |          CAST(SUM(c1 * r2) AS BIGINT) AS r2_1
      |        FROM cv)
      |SELECT n1, n0,
      |  CAST(r2_1 - n1 * (n1 + 1) AS DOUBLE)
      |    / (2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)) AS auc
      |FROM agg""".stripMargin

  /** Cramér's V association between market segment and nation over the
    * customer dimension — the effect-size companion to the chi-square
    * drift tests (an_chi2_drift reports the statistic; V normalizes it
    * to [0,1] so "is this association material" survives N growing).
    * Exact integer contingency cells o and marginals r, c; each cell's
    * deviation numerator o·N − r·c is an exact BIGINT; the per-cell
    * chi-square terms are IEEE doubles gathered through DECIMAL(38,18)
    * (order-independent — the an_kruskal gather), ROUND(·,6) at
    * emission. One groupBy tree + two tiny broadcast marginals. */
  private[graft] def anCramersV(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir)
      .select(col("c_mktsegment").as("a"), col("c_nationkey").as("b"))
    val cells = base.groupBy(col("a"), col("b")).agg(count(lit(1)).as("o"))
    val rowm = cells.groupBy(col("a")).agg(sum(col("o")).as("r"))
    val colm = cells.groupBy(col("b")).agg(sum(col("o")).as("c"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("ka"), countDistinct(col("b")).as("kb"))
    val dn = col("o") * col("n") - col("r") * col("c")
    val terms = cells
      .join(broadcast(rowm), "a").join(broadcast(colm), "b")
      .crossJoin(broadcast(tot))
      .select(col("n"), col("ka"), col("kb"),
        ((dn.cast("double") * dn.cast("double")) /
          (col("n").cast("double") * col("r").cast("double") * col("c").cast("double")))
          .cast("decimal(38,18)").as("term"))
    terms.groupBy(col("n"), col("ka"), col("kb"))
      .agg(sum(col("term")).cast("double").as("chi2g"))
      .select(col("n"), col("ka"), col("kb"),
        round(col("chi2g") / col("n").cast("double"), 6).as("phi2"),
        round(sqrt(col("chi2g") / (col("n").cast("double") *
          least(col("ka") - 1, col("kb") - 1).cast("double"))), 6).as("v"))
  }

  private[graft] lazy val anCramersVSql =
    """WITH base AS (SELECT c_mktsegment AS a, c_nationkey AS b FROM customer),
      |cells AS (SELECT a, b, COUNT(*) AS o FROM base GROUP BY a, b),
      |rm AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY a),
      |cm AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY b),
      |t AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
      |        CAST(COUNT(DISTINCT a) AS BIGINT) AS ka,
      |        CAST(COUNT(DISTINCT b) AS BIGINT) AS kb FROM cells),
      |terms AS (SELECT n, ka, kb,
      |    CAST((CAST(o*n - r*c AS DOUBLE) * CAST(o*n - r*c AS DOUBLE))
      |      / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
      |      AS DECIMAL(38,18)) AS term
      |  FROM cells JOIN rm USING (a) JOIN cm USING (b) CROSS JOIN t),
      |g AS (SELECT n, ka, kb, CAST(SUM(term) AS DOUBLE) AS chi2g
      |      FROM terms GROUP BY n, ka, kb)
      |SELECT n, ka, kb,
      |  ROUND(chi2g / CAST(n AS DOUBLE), 6) AS phi2,
      |  ROUND(sqrt(chi2g / (CAST(n AS DOUBLE)
      |    * CAST(LEAST(ka - 1, kb - 1) AS DOUBLE))), 6) AS v
      |FROM g""".stripMargin

  /** Ljung–Box portmanteau test (lags 1..7) on daily revenue — "is
    * there ANY autocorrelation left", the residual-whiteness gate a
    * forecasting pipeline runs after an_holt_forecast/an_forecast_naive.
    * Exactness recipe: the mean is cleared by the integer grand-shift
    * (dev_t = n·x_t − S is an exact BIGINT of cents), every lag-k
    * cross product Σ dev_t·dev_{t−k} and the denominator Σ dev_t² are
    * exact DECIMAL(38,0) sums, each ρ_k = num_k/den is one division
    * ROUND(·,6) (the gathered sums cross 2⁵³, the recorded
    * decimal→double ulp-skew class), and Q = n(n+2)·Σ ρ_k²/(n−k) is
    * straight-line IEEE over those identically-rounded doubles.
    * Distributed part = the daily aggregate; the lag windows run on the
    * days-sized frame. */
  private[graft] def anLjungBox(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)").as("revd"))
      .select(col("day"), (col("revd") * 100).cast("bigint").as("x"))
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val dev = daily.crossJoin(broadcast(tot))
      .select(col("day"), col("n"), (col("n") * col("x") - col("sx")).as("d"))
    val w = Window.orderBy(col("day"))
    val lagged = dev.select(col("n") +: col("d") +:
      (1 to 7).map(k => lag(col("d"), k).over(w).as(s"l$k")): _*)
    // operands to DECIMAL(19,0) BEFORE the product: d is days·cents-sized
    // (~1e12 at sf0.1) so a raw BIGINT d·d overflows long
    def d19(c: Column) = c.cast("decimal(19,0)")
    val sums = lagged.groupBy(col("n")).agg(
      sum((d19(col("d")) * d19(col("d"))).cast("decimal(38,0)")).as("den"),
      (1 to 7).map(k =>
        sum((d19(col("d")) * d19(col(s"l$k"))).cast("decimal(38,0)")).as(s"num$k")): _*)
    val rhos = sums.select(col("n") +: (1 to 7).map(k =>
      round(col(s"num$k").cast("double") / col("den").cast("double"), 6)
        .as(s"rho$k")): _*)
    val qTerms = (1 to 7).map(k =>
      col(s"rho$k") * col(s"rho$k") / (col("n") - lit(k)).cast("double"))
    rhos.select(col("n") +: (1 to 7).map(k => col(s"rho$k")) :+
      round(col("n").cast("double") * (col("n") + lit(2L)).cast("double") *
        qTerms.reduce(_ + _), 6).as("q_lb"): _*)
  }

  private[graft] lazy val anLjungBoxSql = {
    val nums = (1 to 7).map(k =>
      s"CAST(SUM(CAST(CAST(d AS DECIMAL(19,0)) * CAST(l$k AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS num$k")
      .mkString(",\n      ")
    val lags = (1 to 7).map(k => s"LAG(d, $k) OVER (ORDER BY day) AS l$k").mkString(", ")
    val rhos = (1 to 7).map(k =>
      s"ROUND(CAST(num$k AS DOUBLE) / CAST(den AS DOUBLE), 6) AS rho$k").mkString(",\n      ")
    val qTerms = (1 to 7).map(k => s"rho$k * rho$k / CAST(n - $k AS DOUBLE)").mkString(" + ")
    s"""WITH daily AS (
       |  SELECT date_trunc('day', l_shipdate) AS day,
       |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS x
       |  FROM lineitem GROUP BY 1),
       |t AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx FROM daily),
       |dev AS (SELECT day, n, n * x - sx AS d FROM daily CROSS JOIN t),
       |lagged AS (SELECT n, d, $lags FROM dev),
       |s AS (SELECT n,
       |      CAST(SUM(CAST(CAST(d AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS den,
       |      $nums
       |      FROM lagged GROUP BY n),
       |r AS (SELECT n,
       |      $rhos
       |      FROM s)
       |SELECT n, rho1, rho2, rho3, rho4, rho5, rho6, rho7,
       |  ROUND(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE) * ($qTerms), 6) AS q_lb
       |FROM r""".stripMargin
  }

  /** Three-item market-basket affinity — the triple extension of
    * [[anBasket]]: the pair lift can be high while the triple is pure
    * coincidence (and vice versa: bundles). Same scale bound: triples
    * are generated ORDER-LOCALLY (two self-joins on the order key with
    * p₁<p₂<p₃ — at most C(lines-per-order,3) rows per order, never a
    * corpus cross join), marginals broadcast, lift vs the independence
    * rate n_abc·N²/(n_a·n_b·n_c) in exact-integer-fed doubles. */
  private[graft] def anBasketTriples(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val tot = li.agg(countDistinct(col("ok")).as("n_orders"))
    val triples = li.as("a")
      .join(li.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .join(li.as("c"), col("a.ok") === col("c.ok") && col("b.pk") < col("c.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"), col("c.pk").as("part_c"))
      .agg(count(lit(1)).as("n_abc"))
    val marg = li.groupBy(col("pk")).agg(count(lit(1)).as("n_one"))
    triples
      .join(broadcast(marg.select(col("pk").as("part_a"), col("n_one").as("n_a"))), "part_a")
      .join(broadcast(marg.select(col("pk").as("part_b"), col("n_one").as("n_b"))), "part_b")
      .join(broadcast(marg.select(col("pk").as("part_c"), col("n_one").as("n_c"))), "part_c")
      .orderBy(col("n_abc").desc, col("part_a"), col("part_b"), col("part_c")).limit(15)
      .crossJoin(broadcast(tot))
      .select(col("part_a"), col("part_b"), col("part_c"), col("n_abc"),
        col("n_a"), col("n_b"), col("n_c"),
        (col("n_abc").cast("double") * col("n_orders").cast("double") *
          col("n_orders").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double") *
            col("n_c").cast("double"))).as("lift3"))
  }

  // Value-identical join-order fix (caught by the r16 sf1 gate): with
  // the c-join's EQUALITY bound to `a` (a.ok = c.ok) and its inequality
  // to `b`, DuckDB's optimizer can pick a b×c inequality-only join —
  // a cross product at sf1 (killed past 170 CPU-min). Staging the
  // (a, b) pair first and joining c on the PAIR's ok gives every join
  // an equality with its immediate partner; a.pk < b.pk < c.pk
  // semantics unchanged (proven: identical result frame at sf0.01;
  // 1.4 s at sf1).
  private[graft] lazy val anBasketTriplesSql =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |t AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM li),
      |p2 AS (SELECT a.ok, a.pk AS pa, b.pk AS pb
      |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      |p AS (SELECT pa AS part_a, pb AS part_b, c.pk AS part_c, COUNT(*) AS n_abc
      |      FROM p2 JOIN li c ON p2.ok = c.ok AND c.pk > p2.pb
      |      GROUP BY 1, 2, 3),
      |m AS (SELECT pk, COUNT(*) AS n_one FROM li GROUP BY pk),
      |top AS (SELECT part_a, part_b, part_c, n_abc FROM p
      |        ORDER BY n_abc DESC, part_a, part_b, part_c LIMIT 15)
      |SELECT part_a, part_b, part_c, n_abc,
      |  ma.n_one AS n_a, mb.n_one AS n_b, mc.n_one AS n_c,
      |  CAST(n_abc AS DOUBLE) * CAST(n_orders AS DOUBLE) * CAST(n_orders AS DOUBLE)
      |    / (CAST(ma.n_one AS DOUBLE) * CAST(mb.n_one AS DOUBLE) * CAST(mc.n_one AS DOUBLE)) AS lift3
      |FROM top JOIN m ma ON top.part_a = ma.pk
      |         JOIN m mb ON top.part_b = mb.pk
      |         JOIN m mc ON top.part_c = mc.pk, t
      |ORDER BY n_abc DESC, part_a, part_b, part_c""".stripMargin

  /** Wilcoxon signed-rank test over the PAIRED daily click-vs-view
    * value series — the matched-pairs member of the nonparametric
    * family (an_mannwhitney is the unpaired two-sample, an_friedman the
    * k-sample blocked design; this is the n=2 blocked case with exact
    * rank arithmetic instead of Friedman's within-block ranks). Daily
    * cent sums per type are exact BIGINTs; zero diffs drop (the
    * standard Wilcoxon reduction); midranks over |d| come from the
    * distinct-|d| frame (days-sized, so the rank join is a broadcast):
    * doubled midrank 2r = 2·(#strictly below) + ties + 1 is an exact
    * integer, hence the doubled positive-rank sum W2 = 2·W⁺ is exact.
    * z uses the tie-corrected variance with every input integer:
    * 48·var = 2n(n+1)(2n+1) − Σ(t³−t), so z is ONE IEEE expression
    * over exact BIGINTs, ROUND(·,6); a degenerate series (all diffs
    * tied away or n < 2) pins z = 0 (the an_mann_kendall guard). */
  private[graft] def anWilcoxonSignedRank(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def dailyOf(t: String, out: String) = ev.filter(col("event_type") === t)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as(out))
    val d = dailyOf("click", "a").join(dailyOf("view", "b"), "day")
      .select((col("a") - col("b")).as("d"))
      .filter(col("d") =!= 0)
      .select(abs(col("d")).as("ad"), (col("d") > 0).cast("long").as("pos"))
    // distinct-|d| frame: days-sized, so the sub-count join broadcasts
    val pv = d.groupBy(col("ad"))
      .agg(count(lit(1)).as("t"), sum(col("pos")).as("p"))
    val below = pv.select(col("ad").as("ad2"), col("t").as("t2"))
    val ranked = pv.join(broadcast(below), col("ad2") < col("ad"), "left")
      .groupBy(col("ad"), col("t"), col("p"))
      .agg(coalesce(sum(col("t2")), lit(0L)).as("nb"))
      .select(col("t"), col("p"),
        (lit(2L) * col("nb") + col("t") + lit(1L)).as("r2"))
    ranked.agg(
        sum(col("t")).as("n"),
        sum(col("p") * col("r2")).as("w2"),
        sum(col("t") * col("t") * col("t") - col("t")).as("tie3"))
      .select(col("n"), col("w2"),
        (lit(2L) * col("n") * (col("n") + 1) * (lit(2L) * col("n") + 1) -
          col("tie3")).as("v48"))
      .select(col("n").as("n_pairs"), col("w2").as("w_plus2"),
        round(
          when(col("v48") > 0,
            (col("w2") - col("n") * (col("n") + 1) / 2).cast("double") /
              sqrt(col("v48").cast("double") / lit(12.0)))
            .otherwise(lit(0.0)), 6).as("z_w"))
  }

  private[graft] lazy val anWilcoxonSignedRankSql =
    """WITH da AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS a
      |  FROM events WHERE event_type = 'click' GROUP BY 1),
      |db AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS b
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |d AS (SELECT abs(a - b) AS ad, CASE WHEN a - b > 0 THEN 1 ELSE 0 END AS pos
      |      FROM da JOIN db USING (day) WHERE a <> b),
      |pv AS (SELECT ad, COUNT(*) AS t, CAST(SUM(pos) AS BIGINT) AS p FROM d GROUP BY ad),
      |rk AS (SELECT pv.ad, pv.t, pv.p,
      |         2 * COALESCE((SELECT SUM(x.t) FROM pv x WHERE x.ad < pv.ad), 0) + pv.t + 1 AS r2
      |       FROM pv),
      |agg AS (SELECT CAST(SUM(t) AS BIGINT) AS n,
      |          CAST(SUM(p * r2) AS BIGINT) AS w2,
      |          CAST(SUM(t * t * t - t) AS BIGINT) AS tie3
      |        FROM rk)
      |SELECT n AS n_pairs, w2 AS w_plus2,
      |  ROUND(CASE WHEN 2 * n * (n + 1) * (2 * n + 1) - tie3 > 0 THEN
      |      CAST(w2 - n * (n + 1) / 2 AS DOUBLE)
      |      / sqrt(CAST(2 * n * (n + 1) * (2 * n + 1) - tie3 AS DOUBLE) / 12.0)
      |    ELSE 0.0 END, 6) AS z_w
      |FROM agg""".stripMargin

  /** Cliff's delta effect size between BUILDING and AUTOMOBILE order
    * values — the magnitude companion to an_mannwhitney's significance
    * readout (δ = P(X>Y) − P(X<Y), robust where Cohen's d assumes
    * normality). Both dominance counts come from ONE distinct-cent-
    * value [[graft.operators.PrefixSum]] scan carrying both groups'
    * multiplicities: gt = Σ_v a(v)·cumB(<v), lt = Σ_v b(v)·cumA(<v) —
    * exact BIGINTs, no pair join (the days² trick doesn't apply here:
    * order values are data-sized, so dominance MUST come from the scan,
    * not enumeration). δ is one exact-integer division, unrounded. */
  private[graft] def anCliffsDelta(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).join(
      Tables.customer(s, dir).filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select(col("c_custkey"), col("c_mktsegment")),
      col("o_custkey") === col("c_custkey"))
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"),
        (col("c_mktsegment") === "BUILDING").cast("long").as("isa"))
    val pv = o.groupBy(col("v"))
      .agg(sum(col("isa")).as("ca"), sum(lit(1L) - col("isa")).as("cb"))
    val scan = graft.operators.PrefixSum.withRunningTotals(pv, Seq("v"), Seq("ca", "cb"))
    scan
      .select(col("ca"), col("cb"),
        (col("ca_cum") - col("ca")).as("cuma"), (col("cb_cum") - col("cb")).as("cumb"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        sum(col("ca") * col("cumb")).as("gt"),
        sum(col("cb") * col("cuma")).as("lt"))
      .select(col("n_a"), col("n_b"), col("gt"), col("lt"),
        ((col("gt") - col("lt")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("cliffs_delta"))
  }

  private[graft] lazy val anCliffsDeltaSql =
    """WITH o AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v,
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS isa
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
      |pv AS (SELECT v, CAST(SUM(isa) AS BIGINT) AS ca,
      |              CAST(SUM(1 - isa) AS BIGINT) AS cb FROM o GROUP BY v),
      |sc AS (SELECT ca, cb,
      |         CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) - ca AS cuma,
      |         CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) - cb AS cumb
      |       FROM pv),
      |agg AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
      |          CAST(SUM(ca * cumb) AS BIGINT) AS gt,
      |          CAST(SUM(cb * cuma) AS BIGINT) AS lt
      |        FROM sc)
      |SELECT n_a, n_b, gt, lt,
      |  CAST(gt - lt AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS cliffs_delta
      |FROM agg""".stripMargin

  /** Hodges–Lehmann location shift of the paired daily click-vs-view
    * series: the median of all Walsh averages (dᵢ+dⱼ)/2, i ≤ j — the
    * estimator the Wilcoxon signed-rank test inverts (its robust
    * "how big is the shift" answer, 29% breakdown vs the mean-diff's
    * 0%). The Walsh frame is days², tiny at any SF because the
    * distributed work is the daily aggregate (the an_mann_kendall pair
    * discipline); doubled sums s2 = dᵢ+dⱼ stay exact cents, and the
    * median is an exact order statistic over the s2 multiset (lower +
    * upper middle summed — still integer), so only the final /400
    * (÷2 Walsh, ÷2 middle-pair, ÷100 cents) is IEEE, unrounded. */
  private[graft] def anHodgesLehmann(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def dailyOf(t: String, out: String) = ev.filter(col("event_type") === t)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as(out))
    val d = dailyOf("click", "a").join(dailyOf("view", "b"), "day")
      .select(col("day"), (col("a") - col("b")).as("d"))
    val walsh = d.select(col("day").as("d1"), col("d").as("x"))
      .join(d.select(col("day").as("d2"), col("d").as("y")), col("d1") <= col("d2"))
      .select((col("x") + col("y")).as("s2"))
    val pv = walsh.groupBy(col("s2")).agg(count(lit(1)).as("cnt"))
    val scan = graft.operators.PrefixSum.withRunningTotals(pv, Seq("s2"), Seq("cnt"))
    val tot = scan.agg(max(col("cnt_cum")).as("m"))
    scan.crossJoin(broadcast(tot))
      .select(col("s2"), col("cnt"), col("cnt_cum"), col("m"),
        // floor-divide: Spark's `/` is DOUBLE division, and a fractional
        // rank bound would shift the < / <= window off the oracle's //
        floor((col("m") + 1) / 2).cast("long").as("k1"),
        (floor(col("m") / 2).cast("long") + 1).as("k2"))
      .agg(max(col("m")).as("n_walsh"),
        sum(when(col("cnt_cum") - col("cnt") < col("k1") && col("k1") <= col("cnt_cum"),
          col("s2")).otherwise(lit(0L))).as("lo2"),
        sum(when(col("cnt_cum") - col("cnt") < col("k2") && col("k2") <= col("cnt_cum"),
          col("s2")).otherwise(lit(0L))).as("hi2"))
      .select(col("n_walsh"), col("lo2"), col("hi2"),
        ((col("lo2") + col("hi2")).cast("double") / lit(400.0)).as("hl_shift"))
  }

  private[graft] lazy val anHodgesLehmannSql =
    """WITH da AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS a
      |  FROM events WHERE event_type = 'click' GROUP BY 1),
      |db AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS b
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |d AS (SELECT day, a - b AS d FROM da JOIN db USING (day)),
      |w AS (SELECT p.d + q.d AS s2 FROM d p JOIN d q ON p.day <= q.day),
      |pv AS (SELECT s2, COUNT(*) AS cnt FROM w GROUP BY s2),
      |sc AS (SELECT s2, cnt, CAST(SUM(cnt) OVER (ORDER BY s2) AS BIGINT) AS cnt_cum FROM pv),
      |t AS (SELECT MAX(cnt_cum) AS m FROM sc),
      |agg AS (SELECT MAX(m) AS n_walsh,
      |    CAST(SUM(CASE WHEN cnt_cum - cnt < (m + 1) // 2 AND (m + 1) // 2 <= cnt_cum
      |                  THEN s2 ELSE 0 END) AS BIGINT) AS lo2,
      |    CAST(SUM(CASE WHEN cnt_cum - cnt < m // 2 + 1 AND m // 2 + 1 <= cnt_cum
      |                  THEN s2 ELSE 0 END) AS BIGINT) AS hi2
      |  FROM sc CROSS JOIN t)
      |SELECT n_walsh, lo2, hi2, CAST(lo2 + hi2 AS DOUBLE) / 400.0 AS hl_shift
      |FROM agg""".stripMargin

  /** Mutual information between market segment and order price band —
    * the symmetric dependence readout the chi-square family
    * (an_chi2_drift / an_cramers_v) approximates linearly: MI sees ANY
    * deviation from independence, and the normalized form
    * NMI = MI/√(H_a·H_b) lands in [0,1] for cross-dataset comparison
    * (the feature-selection screen a training pipeline runs before
    * paying for a model fit). Contingency cells and marginals are
    * exact BIGINTs from one groupBy tree + two broadcast marginals
    * (the an_cramers_v posture); each plog term is IEEE gathered
    * through DECIMAL(38,18) (order-independent sum — the an_kruskal
    * gather), ROUND(·,6) at emission to absorb libm ulp skew. */
  private[graft] def anMutualInfo(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir).join(
      Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
      col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("a"),
        floor((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint")
          / lit(5000000L)).as("b"))
    // cells is k_seg × k_band (≤ ~100 rows, key-domain-bounded) but four
    // branches hang off it — stabilize ONCE (the an_conformal treatment)
    // so the data-sized orders⋈customer aggregation runs once AND the
    // final plan carries a checkpoint leaf instead of re-deriving the
    // cell subtree per marginal (r14: 33 exchanges of re-derivation)
    val cells = graft.operators.Checkpoints.stabilizeLazy(
      base.groupBy(col("a"), col("b")).agg(count(lit(1)).as("o")))
    // the marginals are ≤ |segments| / |bands| rows, each with TWO+
    // consumers (the MI join and an entropy fold) — stabilize them too
    // so each re-derivation is a leaf read, not a repeated aggregation
    val rowm = graft.operators.Checkpoints.stabilizeLazy(
      cells.groupBy(col("a")).agg(sum(col("o")).as("r")))
    val colm = graft.operators.Checkpoints.stabilizeLazy(
      cells.groupBy(col("b")).agg(sum(col("o")).as("c")))
    val tot = graft.operators.Checkpoints.stabilizeLazy(
      cells.agg(sum(col("o")).as("n")))
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    val mi = cells
      .join(broadcast(rowm), "a").join(broadcast(colm), "b")
      .crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"),
        gather(col("o").cast("double") / col("n").cast("double") *
          log((col("o") * col("n")).cast("double") /
            (col("r") * col("c")).cast("double"))).as("mig"))
    val ha = rowm.crossJoin(broadcast(tot))
      .agg(gather(lit(-1.0) * col("r").cast("double") / col("n").cast("double") *
        log(col("r").cast("double") / col("n").cast("double"))).as("hag"))
    val hb = colm.crossJoin(broadcast(tot))
      .agg(gather(lit(-1.0) * col("c").cast("double") / col("n").cast("double") *
        log(col("c").cast("double") / col("n").cast("double"))).as("hbg"))
    mi.crossJoin(ha).crossJoin(hb)
      .select(col("n"),
        round(col("mig").cast("double"), 6).as("mi"),
        round(col("hag").cast("double"), 6).as("h_seg"),
        round(col("hbg").cast("double"), 6).as("h_band"),
        round(col("mig").cast("double") /
          sqrt(col("hag").cast("double") * col("hbg").cast("double")), 6).as("nmi"))
  }

  private[graft] lazy val anMutualInfoSql =
    """WITH base AS (SELECT c_mktsegment AS a,
      |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) // 5000000 AS b
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |cells AS (SELECT a, b, COUNT(*) AS o FROM base GROUP BY a, b),
      |rm AS (SELECT a, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY a),
      |cm AS (SELECT b, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY b),
      |t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
      |mi AS (SELECT MAX(n) AS n,
      |    CAST(SUM(CAST(CAST(o AS DOUBLE) / CAST(n AS DOUBLE)
      |      * ln(CAST(o * n AS DOUBLE) / CAST(r * c AS DOUBLE)) AS DECIMAL(38,18)))
      |      AS DECIMAL(38,18)) AS mig
      |  FROM cells JOIN rm USING (a) JOIN cm USING (b) CROSS JOIN t),
      |ha AS (SELECT CAST(SUM(CAST(-1.0 * CAST(r AS DOUBLE) / CAST(n AS DOUBLE)
      |      * ln(CAST(r AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(38,18)))
      |      AS DECIMAL(38,18)) AS hag FROM rm CROSS JOIN t),
      |hb AS (SELECT CAST(SUM(CAST(-1.0 * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
      |      * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(38,18)))
      |      AS DECIMAL(38,18)) AS hbg FROM cm CROSS JOIN t)
      |SELECT n, ROUND(CAST(mig AS DOUBLE), 6) AS mi,
      |  ROUND(CAST(hag AS DOUBLE), 6) AS h_seg,
      |  ROUND(CAST(hbg AS DOUBLE), 6) AS h_band,
      |  ROUND(CAST(mig AS DOUBLE)
      |    / sqrt(CAST(hag AS DOUBLE) * CAST(hbg AS DOUBLE)), 6) AS nmi
      |FROM mi CROSS JOIN ha CROSS JOIN hb""".stripMargin

  /** Average precision (PR-curve area) of the acctbal churn score —
    * the rare-positive companion to an_roc_auc: ROC flatters a
    * classifier when negatives dominate; AP weights by the positive
    * class only, which is what a churn-save campaign actually pays
    * for. Ties-grouped step interpolation needs NO neighbor access:
    * AP = Σ_v (pos(v)/P) · precision(≥v) with both cumulative counts
    * read off the SAME distinct-cent [[graft.operators.PrefixSum]]
    * scan as an_roc_auc (score DESCENDS, so ≥v counts are total −
    * below); each exact-rational term gathers DECIMAL(38,18),
    * ROUND(·,6). */
  private[graft] def anPrAuc(s: SparkSession, dir: String): DataFrame = {
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
    val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt", "c1"))
    val tot = scan.agg(max(col("cnt_cum")).as("n"), max(col("c1_cum")).as("p"))
    scan.crossJoin(broadcast(tot))
      .select(col("c1"), col("p"),
        (col("p") - (col("c1_cum") - col("c1"))).as("tp_gte"),
        (col("n") - (col("cnt_cum") - col("cnt"))).as("cnt_gte"))
      .agg(max(col("p")).as("n_pos"),
        sum((col("c1").cast("double") / col("p").cast("double") *
          (col("tp_gte").cast("double") / col("cnt_gte").cast("double")))
          .cast("decimal(38,18)")).cast("decimal(38,18)").as("apg"))
      .select(col("n_pos"), round(col("apg").cast("double"), 6).as("avg_precision"))
  }

  private[graft] lazy val anPrAucSql =
    """WITH a AS (SELECT MAX(o_orderdate) AS mx FROM orders),
      |l AS (SELECT o_custkey, MAX(o_orderdate) AS last_order FROM orders GROUP BY 1),
      |lab AS (SELECT
      |    CASE WHEN last_order IS NULL OR last_order < mx - INTERVAL 90 DAY
      |         THEN 1 ELSE 0 END AS g1,
      |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM customer LEFT JOIN l ON c_custkey = o_custkey CROSS JOIN a),
      |pv AS (SELECT v, COUNT(*) AS cnt, CAST(SUM(g1) AS BIGINT) AS c1 FROM lab GROUP BY v),
      |sc AS (SELECT cnt, c1,
      |         CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum,
      |         CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS c1_cum
      |       FROM pv),
      |t AS (SELECT MAX(cnt_cum) AS n, MAX(c1_cum) AS p FROM sc)
      |SELECT MAX(p) AS n_pos,
      |  ROUND(CAST(CAST(SUM(CAST(
      |    CAST(c1 AS DOUBLE) / CAST(p AS DOUBLE)
      |      * (CAST(p - (c1_cum - c1) AS DOUBLE) / CAST(n - (cnt_cum - cnt) AS DOUBLE))
      |    AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE), 6) AS avg_precision
      |FROM sc CROSS JOIN t""".stripMargin

  /** Croston's intermittent-demand forecast per part — the estimator
    * for the slow-moving long tail where an_forecast_naive/an_holt on
    * the dense daily total are blind (most SKUs sell on a few days a
    * month; forecasting their zeros as signal biases every EWMA).
    * Demand SIZE and inter-arrival GAP each get the truncated DYADIC
    * EWMA (α = 1/2, 8 taps — the an_ewma exactness trick: weights
    * 2^(7−k) keep both numerators exact BIGINTs), evaluated at each
    * part's LAST demand event via keyed lag windows (partitioned by
    * part — nothing global); forecast/day = z_num/p_num, ONE IEEE
    * division, ROUND(·,6). Parts need ≥ 9 events so all 8 gap taps
    * exist. */
  private[graft] def anCroston(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey").as("pk"), col("l_shipdate").as("day"))
      .agg(sum((col("l_quantity").cast("decimal(24,2)") * 100).cast("bigint")).as("q"))
    val w = Window.partitionBy(col("pk")).orderBy(col("day"))
    val zNum = (0 until 8).map(k => lag(col("q"), k).over(w) * lit(1L << (7 - k))).reduce(_ + _)
    val pNum = (0 until 8).map(k => lag(col("gap"), k).over(w) * lit(1L << (7 - k))).reduce(_ + _)
    d.withColumn("gap", datediff(col("day"), lag(col("day"), 1).over(w)).cast("long"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_events", count(lit(1)).over(Window.partitionBy(col("pk"))))
      .withColumn("z_num", zNum)
      .withColumn("p_num", pNum)
      .filter(col("rn") === col("n_events") && col("n_events") >= 9)
      .select(col("pk"), col("n_events"), col("z_num"), col("p_num"),
        round(col("z_num").cast("double") / col("p_num").cast("double"), 6)
          .as("croston_per_day"))
      .orderBy(col("pk"))
  }

  private[graft] lazy val anCrostonSql = {
    val zTerms = (0 until 8).map(k =>
      s"LAG(q, $k) OVER (PARTITION BY pk ORDER BY day) * ${1L << (7 - k)}").mkString(" + ")
    val pTerms = (0 until 8).map(k =>
      s"LAG(gap, $k) OVER (PARTITION BY pk ORDER BY day) * ${1L << (7 - k)}").mkString(" + ")
    s"""WITH d AS (SELECT l_partkey AS pk, l_shipdate AS day,
       |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS q
       |  FROM lineitem GROUP BY 1, 2),
       |g AS (SELECT pk, day, q,
       |        CAST(date_diff('day', LAG(day) OVER (PARTITION BY pk ORDER BY day), day)
       |          AS BIGINT) AS gap,
       |        ROW_NUMBER() OVER (PARTITION BY pk ORDER BY day) AS rn,
       |        COUNT(*) OVER (PARTITION BY pk) AS n_events
       |      FROM d),
       |f AS (SELECT pk, n_events, rn,
       |        $zTerms AS z_num,
       |        $pTerms AS p_num
       |      FROM g)
       |SELECT pk, CAST(n_events AS BIGINT) AS n_events,
       |  CAST(z_num AS BIGINT) AS z_num, CAST(p_num AS BIGINT) AS p_num,
       |  ROUND(CAST(z_num AS DOUBLE) / CAST(p_num AS DOUBLE), 6) AS croston_per_day
       |FROM f WHERE rn = n_events AND n_events >= 9
       |ORDER BY pk""".stripMargin
  }

  /** SAX symbolization of the daily revenue series — the symbolic
    * compression that turns a numeric time series into WORDS so motif
    * mining / anomaly grep run on string machinery (the text-side
    * operators) instead of floats. z-normalization uses μ and σ built
    * from exact integer Σv and Σv² (one IEEE expression each, shared
    * by both engines); 4-symbol alphabet at the standard N(0,1)
    * quartile breakpoints ±0.6745 and 0; the per-week word is an
    * ORDER-PINNED string aggregation (day-sorted), so the whole
    * readout is deterministic text under the hash oracle. */
  private[graft] def anSax(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum((col("l_extendedprice").cast("decimal(24,2)") * 100).cast("bigint")).as("v"))
    // v² in cents² tops BIGINT over a multi-year span — the square sum
    // rides DECIMAL(38,0) (exact integers, order-independent)
    val stats = daily.agg(count(lit(1)).as("n"), sum(col("v")).as("s1"),
      sum(col("v").cast("decimal(38,0)") * col("v")).as("s2"))
    val z = (col("v").cast("double") - col("s1").cast("double") / col("n").cast("double")) /
      sqrt((col("s2").cast("double") * col("n").cast("double") -
        col("s1").cast("double") * col("s1").cast("double")) /
        (col("n").cast("double") * col("n").cast("double")))
    daily.crossJoin(broadcast(stats))
      .select(col("day"),
        when(z < -0.6745, lit("a")).when(z < 0.0, lit("b"))
          .when(z < 0.6745, lit("c")).otherwise(lit("d")).as("sym"))
      .groupBy(date_trunc("week", col("day")).as("week"))
      .agg(count(lit(1)).as("n_days"),
        expr("array_join(transform(array_sort(collect_list(struct(day, sym))), x -> x.sym), '')")
          .as("sax_word"))
      .orderBy(col("week"))
  }

  private[graft] lazy val anSaxSql =
    """WITH daily AS (SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM lineitem GROUP BY 1),
      |st AS (SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s1,
      |              CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) AS s2
      |       FROM daily),
      |sym AS (SELECT day,
      |    CASE WHEN (CAST(v AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
      |           / sqrt((CAST(s2 AS DOUBLE) * CAST(n AS DOUBLE)
      |                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) < -0.6745 THEN 'a'
      |         WHEN (CAST(v AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
      |           / sqrt((CAST(s2 AS DOUBLE) * CAST(n AS DOUBLE)
      |                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) < 0.0 THEN 'b'
      |         WHEN (CAST(v AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
      |           / sqrt((CAST(s2 AS DOUBLE) * CAST(n AS DOUBLE)
      |                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) < 0.6745 THEN 'c'
      |         ELSE 'd' END AS sym
      |  FROM daily CROSS JOIN st)
      |SELECT date_trunc('week', day) AS week, COUNT(*) AS n_days,
      |  string_agg(sym, '' ORDER BY day) AS sax_word
      |FROM sym GROUP BY 1 ORDER BY week""".stripMargin

  /** Exact-replay permutation test on the paired daily click-vs-view
    * diffs — the assumption-free significance check beside an_wilcoxon
    * (that one relies on the normal approximation of the rank sum;
    * this one builds the null by actually sign-flipping the pairs).
    * The 128 "random" sign patterns are DETERMINISTIC tempered-hash
    * draws keyed on (day-rank · 128 + replica) — the an_bootstrap_ci
    * trick, so the DuckDB oracle replays every permutation bit-for-bit
    * and the p-value is an exact rational (n_extreme+1)/(R+1). All
    * 128 replica sums ride ONE scan of the days-sized diff frame with
    * map-side partial aggregation. */
  private[graft] def anPermutationTest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    def dailyOf(t: String, out: String) = ev.filter(col("event_type") === t)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as(out))
    val d0 = dailyOf("click", "a").join(dailyOf("view", "b"), "day")
      .select(col("day"), (col("a") - col("b")).as("d"), lit(1L).as("one"))
    // 1-based day rank without a global window: cnt_cum of the
    // distinct-day PrefixSum scan IS the rank (one row per day)
    val d = graft.operators.PrefixSum.persistOwned(
      graft.operators.PrefixSum.withRunningTotals(d0, Seq("day"), Seq("one"))
        .select(col("d"), col("one_cum").as("idx")))
    val s0 = d.agg(sum(col("d")).as("s_obs"), count(lit(1)).as("n_days"))
    val reps = d.select(col("d"), col("idx"), explode(sequence(lit(0), lit(127))).as("r"))
      .withColumn("u", graft.functions.Sketches.temperedHash(
        col("idx") * 128 + col("r")))
      .select(col("r"),
        (when(col("u") % 2 === 1, lit(-1L)).otherwise(lit(1L)) * col("d")).as("sd"))
      .groupBy(col("r")).agg(sum(col("sd")).as("s_r"))
    reps.crossJoin(broadcast(s0))
      .agg(max(col("n_days")).as("n_days"), max(col("s_obs")).as("s_obs"),
        sum((abs(col("s_r")) >= abs(col("s_obs"))).cast("long")).as("n_extreme"))
      .select(col("n_days"), col("s_obs"), col("n_extreme"),
        round((col("n_extreme") + 1).cast("double") / lit(129.0), 6).as("p_value"))
  }

  private[graft] lazy val anPermutationTestSql =
    """WITH da AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS a
      |  FROM events WHERE event_type = 'click' GROUP BY 1),
      |db AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS b
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |d AS (SELECT a - b AS d, ROW_NUMBER() OVER (ORDER BY day) AS idx
      |      FROM da JOIN db USING (day)),
      |s0 AS (SELECT CAST(SUM(d) AS BIGINT) AS s_obs, COUNT(*) AS n_days FROM d),
      |t1 AS (SELECT r.range AS r, d.d,
      |    (((d.idx * 128 + r.range) % 2147483647) * 1000003 + 12289) % 2147483647 AS x
      |  FROM d CROSS JOIN range(0, 128) r),
      |t2 AS (SELECT r, d, xor(x, x >> 15) AS x FROM t1),
      |t3 AS (SELECT r, d, (x * 786433) % 2147483647 AS x FROM t2),
      |t4 AS (SELECT r, d, xor(x, x >> 13) AS u FROM t3),
      |sr AS (SELECT r, CAST(SUM(CASE WHEN u % 2 = 1 THEN -d ELSE d END) AS BIGINT) AS s_r
      |       FROM t4 GROUP BY r)
      |SELECT MAX(n_days) AS n_days, MAX(s_obs) AS s_obs,
      |  CAST(SUM(CASE WHEN ABS(s_r) >= ABS(s_obs) THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
      |  ROUND(CAST(CAST(SUM(CASE WHEN ABS(s_r) >= ABS(s_obs) THEN 1 ELSE 0 END) AS BIGINT)
      |    + 1 AS DOUBLE) / 129.0, 6) AS p_value
      |FROM sr CROSS JOIN s0""".stripMargin

  /** Log-rank test comparing BUILDING vs AUTOMOBILE churn survival —
    * the two-sample significance companion to an_kaplan_meier's single
    * curve (KM shows the curves; log-rank says whether they differ
    * beyond risk-set noise). Same lifetime/censor construction
    * (customer lifetime in days, 90-day recency censor); per distinct
    * lifetime the at-risk counts come from ONE
    * [[graft.operators.PrefixSum]] scan over (leavers₁, leavers₀,
    * deaths₁, deaths₀) — n_g(t) = N_g − cum_g(<t), exact BIGINTs; the
    * hypergeometric E and V terms are exact-integer-fed IEEE gathered
    * DECIMAL(38,18) (nt ≤ 1 terms drop), z ROUND(·,6). */
  private[graft] def anLogrank(s: SparkSession, dir: String): DataFrame = {
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
      .agg(max(col("n1t")).as("n1"), max(col("n0t")).as("n0"),
        sum(col("d1")).as("o1"),
        gather(dt * n1 / nt).as("e1"),
        gather(when(nt > 1.0,
          dt * (n1 / nt) * (n0 / nt) * (nt - dt) / (nt - 1.0))
          .otherwise(lit(0.0))).as("v"))
      .select(col("n1"), col("n0"), col("o1"),
        round(col("e1").cast("double"), 6).as("e1"),
        round(
          when(col("v").cast("double") > 0,
            (col("o1").cast("double") - col("e1").cast("double")) /
              sqrt(col("v").cast("double")))
            .otherwise(lit(0.0)), 6).as("z_logrank"))
  }

  private[graft] lazy val anLogrankSql =
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
      |terms AS (SELECT d1, d0,
      |    CAST(n1t - (c1_cum - c1) AS DOUBLE) AS n1,
      |    CAST(n0t - (c0_cum - c0) AS DOUBLE) AS n0,
      |    n1t, n0t
      |  FROM sc CROSS JOIN tt WHERE d1 + d0 > 0)
      |SELECT MAX(n1t) AS n1, MAX(n0t) AS n0, CAST(SUM(d1) AS BIGINT) AS o1,
      |  ROUND(CAST(CAST(SUM(CAST(CAST(d1 + d0 AS DOUBLE) * n1 / (n1 + n0)
      |    AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE), 6) AS e1,
      |  ROUND(CASE WHEN CAST(CAST(SUM(CAST(CASE WHEN n1 + n0 > 1.0 THEN
      |        CAST(d1 + d0 AS DOUBLE) * (n1 / (n1 + n0)) * (n0 / (n1 + n0))
      |          * (n1 + n0 - CAST(d1 + d0 AS DOUBLE)) / (n1 + n0 - 1.0)
      |      ELSE 0.0 END AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE) > 0
      |    THEN (CAST(CAST(SUM(d1) AS BIGINT) AS DOUBLE)
      |          - CAST(CAST(SUM(CAST(CAST(d1 + d0 AS DOUBLE) * n1 / (n1 + n0)
      |              AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE))
      |      / sqrt(CAST(CAST(SUM(CAST(CASE WHEN n1 + n0 > 1.0 THEN
      |          CAST(d1 + d0 AS DOUBLE) * (n1 / (n1 + n0)) * (n0 / (n1 + n0))
      |            * (n1 + n0 - CAST(d1 + d0 AS DOUBLE)) / (n1 + n0 - 1.0)
      |        ELSE 0.0 END AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE))
      |    ELSE 0.0 END, 6) AS z_logrank
      |FROM terms""".stripMargin

  /** Growth accounting over daily active users — the four-way split
    * (new / retained / resurrected / churned) that explains WHERE a
    * DAU curve's movement comes from, which an_new_returning's two-way
    * split can't (returning conflates "came back yesterday too" with
    * "resurrected after a gap", and nothing counts leavers). Presence
    * classes come from ONE distinct (user, day) frame: first day per
    * user (new), a self equi-join on (user, day−1) for retained vs
    * resurrected, and the mirror anti-side for churned attributed to
    * the day AFTER the last visit — all keyed joins, exact BIGINT
    * counts, full-outer merged on the day axis. */
  private[graft] def anGrowthAccounting(s: SparkSession, dir: String): DataFrame = {
    val ud = graft.operators.PrefixSum.persistOwned(
      Tables.events(s, dir)
        .select(date_trunc("day", col("ts")).as("day"), col("user_id")).distinct())
    val first = ud.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    val prev = ud.select(col("user_id"),
      (col("day") + expr("INTERVAL 1 DAY")).as("day"), lit(1L).as("was_prev"))
    val today = ud.join(first, "user_id")
      .join(prev, Seq("user_id", "day"), "left")
      .groupBy(col("day"))
      .agg(sum((col("day") === col("first_day")).cast("long")).as("n_new"),
        sum((col("day") =!= col("first_day") && col("was_prev").isNotNull)
          .cast("long")).as("n_retained"),
        sum((col("day") =!= col("first_day") && col("was_prev").isNull)
          .cast("long")).as("n_resurrected"))
    val churn = prev.join(ud, Seq("user_id", "day"), "left_anti")
      .groupBy(col("day")).agg(count(lit(1)).as("n_churned"))
    today.join(churn, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .orderBy(col("day"))
  }

  private[graft] lazy val anGrowthAccountingSql =
    """WITH ud AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
      |f AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id),
      |p AS (SELECT user_id, day + INTERVAL 1 DAY AS day, 1 AS was_prev FROM ud),
      |t AS (SELECT ud.day,
      |    CAST(SUM(CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |    CAST(SUM(CASE WHEN ud.day <> f.first_day AND p.was_prev IS NOT NULL
      |             THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
      |    CAST(SUM(CASE WHEN ud.day <> f.first_day AND p.was_prev IS NULL
      |             THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
      |  FROM ud JOIN f USING (user_id)
      |  LEFT JOIN p ON p.user_id = ud.user_id AND p.day = ud.day
      |  GROUP BY ud.day),
      |c AS (SELECT p.day, COUNT(*) AS n_churned
      |      FROM p LEFT JOIN ud ON ud.user_id = p.user_id AND ud.day = p.day
      |      WHERE ud.user_id IS NULL GROUP BY p.day)
      |SELECT COALESCE(t.day, c.day) AS day,
      |  COALESCE(n_new, 0) AS n_new, COALESCE(n_retained, 0) AS n_retained,
      |  COALESCE(n_resurrected, 0) AS n_resurrected,
      |  COALESCE(n_churned, 0) AS n_churned
      |FROM t FULL OUTER JOIN c ON t.day = c.day
      |ORDER BY day""".stripMargin

  /** KS separation statistic of the acctbal churn score — the
    * credit-scoring companion to an_roc_auc/an_pr_auc: max over
    * thresholds of |TPR − FPR|, the single "how far apart are the two
    * score distributions" number risk teams gate models on. Both
    * cumulative rates read off the SAME distinct-cent
    * [[graft.operators.PrefixSum]] scan; the max is an order-
    * independent aggregate over exact-rational terms, the argmax
    * threshold ties to the LOWEST score cent via a conditional min
    * against the 1-row max broadcast. ROUND(·,6) at emission. */
  private[graft] def anKsModel(s: SparkSession, dir: String): DataFrame = {
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
    val scan = graft.operators.PrefixSum.persistOwned(
      graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt", "c1")))
    val tot = scan.agg(max(col("cnt_cum")).as("n"), max(col("c1_cum")).as("p"))
    val diffs = scan.crossJoin(broadcast(tot))
      .select(col("v"), col("p"), (col("n") - col("p")).as("neg"),
        abs(col("c1_cum").cast("double") / col("p").cast("double") -
          (col("cnt_cum") - col("c1_cum")).cast("double") /
            (col("n") - col("p")).cast("double")).as("sep"))
    val mx = diffs.agg(max(col("sep")).as("ks_raw"))
    diffs.crossJoin(broadcast(mx))
      .agg(max(col("p")).as("n_pos"), max(col("neg")).as("n_neg"),
        min(when(col("sep") === col("ks_raw"), col("v"))).as("ks_threshold_cents"),
        max(col("ks_raw")).as("ks_raw"))
      .select(col("n_pos"), col("n_neg"), col("ks_threshold_cents"),
        round(col("ks_raw"), 6).as("ks"))
  }

  private[graft] lazy val anKsModelSql =
    """WITH a AS (SELECT MAX(o_orderdate) AS mx FROM orders),
      |l AS (SELECT o_custkey, MAX(o_orderdate) AS last_order FROM orders GROUP BY 1),
      |lab AS (SELECT
      |    CASE WHEN last_order IS NULL OR last_order < mx - INTERVAL 90 DAY
      |         THEN 1 ELSE 0 END AS g1,
      |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM customer LEFT JOIN l ON c_custkey = o_custkey CROSS JOIN a),
      |pv AS (SELECT v, COUNT(*) AS cnt, CAST(SUM(g1) AS BIGINT) AS c1 FROM lab GROUP BY v),
      |sc AS (SELECT v,
      |         CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum,
      |         CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS c1_cum
      |       FROM pv),
      |t AS (SELECT MAX(cnt_cum) AS n, MAX(c1_cum) AS p FROM sc),
      |df AS (SELECT v, p, n - p AS neg,
      |         ABS(CAST(c1_cum AS DOUBLE) / CAST(p AS DOUBLE)
      |             - CAST(cnt_cum - c1_cum AS DOUBLE) / CAST(n - p AS DOUBLE)) AS sep
      |       FROM sc CROSS JOIN t),
      |m AS (SELECT MAX(sep) AS ks_raw FROM df)
      |SELECT MAX(p) AS n_pos, MAX(neg) AS n_neg,
      |  MIN(CASE WHEN sep = ks_raw THEN v END) AS ks_threshold_cents,
      |  ROUND(MAX(ks_raw), 6) AS ks
      |FROM df CROSS JOIN m""".stripMargin

  /** Population Stability Index of the order-value distribution,
    * early half vs late half of the calendar — the model-monitoring
    * drift gate (PSI > 0.25 = retrain) beside text_js_divergence's
    * corpus version: PSI is the industry band-level symmetric-KL on
    * NUMERIC features. The split point is the data-derived midpoint
    * day (exact integer day arithmetic — generation-proof, no
    * hardcoded year); bands are the an_mutual_info 50k-dollar cents
    * bands; band shares are exact rationals and each (pA−pB)·ln(pA/pB)
    * term gathers DECIMAL(38,18) over bands present in BOTH halves
    * (PSI is undefined on empty bands; the skipped mass is reported,
    * not silently dropped). ROUND(·,6). */
  private[graft] def anPsi(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val bounds = o.agg(min(col("o_orderdate")).as("mn"), max(col("o_orderdate")).as("mxd"))
    val banded = o.crossJoin(broadcast(bounds))
      .select(
        (datediff(col("o_orderdate"), col("mn")) * 2 <
          datediff(col("mxd"), col("mn"))).cast("long").as("early"),
        floor((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint")
          / lit(5000000L)).as("band"))
    val perBand = banded.groupBy(col("band"))
      .agg(sum(col("early")).as("ca"), sum(lit(1L) - col("early")).as("cb"))
    val tot = perBand.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    val pa = col("ca").cast("double") / col("na").cast("double")
    val pb = col("cb").cast("double") / col("nb").cast("double")
    perBand.crossJoin(broadcast(tot))
      .agg(max(col("na")).as("n_early"), max(col("nb")).as("n_late"),
        sum((col("ca") > 0 && col("cb") > 0).cast("long")).as("n_bands_used"),
        sum(when(col("ca") === 0 || col("cb") === 0, col("ca") + col("cb"))
          .otherwise(lit(0L))).as("n_rows_skipped"),
        gather(when(col("ca") > 0 && col("cb") > 0,
          (pa - pb) * log(pa / pb)).otherwise(lit(0.0))).as("psig"))
      .select(col("n_early"), col("n_late"), col("n_bands_used"),
        col("n_rows_skipped"), round(col("psig").cast("double"), 6).as("psi"))
  }

  private[graft] lazy val anPsiSql =
    """WITH b AS (SELECT MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mxd FROM orders),
      |bd AS (SELECT
      |    CASE WHEN date_diff('day', mn, o_orderdate) * 2
      |              < date_diff('day', mn, mxd) THEN 1 ELSE 0 END AS early,
      |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) // 5000000 AS band
      |  FROM orders CROSS JOIN b),
      |pb AS (SELECT band, CAST(SUM(early) AS BIGINT) AS ca,
      |              CAST(SUM(1 - early) AS BIGINT) AS cb
      |       FROM bd GROUP BY band),
      |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM pb)
      |SELECT MAX(na) AS n_early, MAX(nb) AS n_late,
      |  CAST(SUM(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bands_used,
      |  CAST(SUM(CASE WHEN ca = 0 OR cb = 0 THEN ca + cb ELSE 0 END) AS BIGINT)
      |    AS n_rows_skipped,
      |  ROUND(CAST(CAST(SUM(CAST(CASE WHEN ca > 0 AND cb > 0 THEN
      |      (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
      |      * ln((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
      |           / (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)))
      |    ELSE 0.0 END AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE), 6) AS psi
      |FROM pb CROSS JOIN t""".stripMargin

  /** Hill tail-index estimator over order values — the heavy-tail
    * gauge that says whether revenue concentration has a finite
    * variance at all (an_gumbel_maxima models block maxima; Hill
    * reads the tail exponent straight from the top order statistics,
    * the standard fat-tail screen before trusting any mean-based
    * capacity plan). Top-k membership with ties comes from the
    * distinct-cent [[graft.operators.PrefixSum]] scan: per value,
    * rows-in-top-k = clamp(k − rows_above, 0, cnt) and the (k+1)-th
    * reference value is a conditional aggregate — no global sort of
    * raw rows; ln terms gather DECIMAL(38,18), ROUND(·,6). */
  private[graft] def anHillTail(s: SparkSession, dir: String): DataFrame = {
    val k = 100L
    val perV = Tables.orders(s, dir)
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val scan = graft.operators.PrefixSum.persistOwned(
      graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt")))
    val tot = scan.agg(max(col("cnt_cum")).as("n"))
    val withAbove = scan.crossJoin(broadcast(tot))
      .select(col("v"), col("cnt"), (col("n") - col("cnt_cum")).as("above"))
    // x_ref = the (k+1)-th value from the top (rank ∈ [above+1, above+cnt])
    val xref = withAbove
      .agg(sum(when(col("above") < k + 1 && lit(k + 1) <= col("above") + col("cnt"),
        col("v")).otherwise(lit(0L))).as("x_ref"))
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    withAbove.crossJoin(broadcast(xref))
      .select(col("v"), col("x_ref"),
        greatest(lit(0L), least(col("cnt"), lit(k) - col("above"))).as("m"))
      .agg(max(col("x_ref")).as("x_ref_cents"),
        gather(col("m").cast("double") *
          log(col("v").cast("double") / col("x_ref").cast("double"))).as("hg"))
      .select(lit(k).as("k"), col("x_ref_cents"),
        round(col("hg").cast("double") / lit(k.toDouble), 6).as("hill_inv_alpha"),
        round(lit(k.toDouble) / col("hg").cast("double"), 6).as("tail_alpha"))
  }

  private[graft] lazy val anHillTailSql =
    """WITH pv AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v,
      |              COUNT(*) AS cnt
      |       FROM orders GROUP BY 1),
      |sc AS (SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum FROM pv),
      |t AS (SELECT MAX(cnt_cum) AS n FROM sc),
      |wa AS (SELECT v, cnt, n - cnt_cum AS above FROM sc CROSS JOIN t),
      |xr AS (SELECT CAST(SUM(CASE WHEN above < 101 AND 101 <= above + cnt
      |                            THEN v ELSE 0 END) AS BIGINT) AS x_ref FROM wa),
      |g AS (SELECT MAX(x_ref) AS x_ref_cents,
      |    CAST(SUM(CAST(CAST(greatest(0, least(cnt, 100 - above)) AS DOUBLE)
      |      * ln(CAST(v AS DOUBLE) / CAST(x_ref AS DOUBLE)) AS DECIMAL(38,18)))
      |      AS DECIMAL(38,18)) AS hg
      |  FROM wa CROSS JOIN xr)
      |SELECT CAST(100 AS BIGINT) AS k, x_ref_cents,
      |  ROUND(CAST(hg AS DOUBLE) / 100.0, 6) AS hill_inv_alpha,
      |  ROUND(100.0 / CAST(hg AS DOUBLE), 6) AS tail_alpha
      |FROM g""".stripMargin

  /** Best decision-stump split of the acctbal churn score by Gini
    * gain — "is this feature worth a tree node", the single-feature
    * importance probe a feature store runs before training (an_ks_model
    * scores ranking power; Gini gain scores SPLITTING power, and the
    * argmax threshold is the stump a 1-node tree would pick). Every
    * candidate threshold's child impurities are exact rationals off
    * the shared distinct-cent PrefixSum scan; gain maximization +
    * lowest-cent tie-break reuse the an_ks_model conditional-min
    * pattern. ROUND(·,6). */
  private[graft] def anStumpSplit(s: SparkSession, dir: String): DataFrame = {
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
    val scan = graft.operators.PrefixSum.persistOwned(
      graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt", "c1")))
    val tot = scan.agg(max(col("cnt_cum")).as("n"), max(col("c1_cum")).as("p"))
    val nl = col("cnt_cum").cast("double")
    val pl = col("c1_cum").cast("double")
    val nr = (col("n") - col("cnt_cum")).cast("double")
    val pr = (col("p") - col("c1_cum")).cast("double")
    val nn = col("n").cast("double")
    val pp = col("p").cast("double")
    val giniParent = lit(1.0) - (pp / nn) * (pp / nn) -
      ((nn - pp) / nn) * ((nn - pp) / nn)
    val giniL = lit(1.0) - (pl / nl) * (pl / nl) - ((nl - pl) / nl) * ((nl - pl) / nl)
    val giniR = lit(1.0) - (pr / nr) * (pr / nr) - ((nr - pr) / nr) * ((nr - pr) / nr)
    val gain = giniParent - (nl / nn) * giniL - (nr / nn) * giniR
    val cands = scan.crossJoin(broadcast(tot))
      .filter(col("cnt_cum") < col("n")) // right child must be non-empty
      .select(col("v"), col("cnt_cum").as("n_left"), col("c1_cum").as("pos_left"),
        col("n"), col("p"), gain.as("gain"))
    val mx = cands.agg(max(col("gain")).as("best_gain"))
    cands.crossJoin(broadcast(mx))
      .agg(max(col("n")).as("n"), max(col("p")).as("n_pos"),
        min(when(col("gain") === col("best_gain"), col("v"))).as("split_cents"),
        min(when(col("gain") === col("best_gain"), col("n_left"))).as("n_left"),
        min(when(col("gain") === col("best_gain"), col("pos_left"))).as("pos_left"),
        max(col("best_gain")).as("best_gain"))
      .select(col("n"), col("n_pos"), col("split_cents"), col("n_left"), col("pos_left"),
        round(col("best_gain"), 6).as("gini_gain"))
  }

  private[graft] lazy val anStumpSplitSql =
    """WITH a AS (SELECT MAX(o_orderdate) AS mx FROM orders),
      |l AS (SELECT o_custkey, MAX(o_orderdate) AS last_order FROM orders GROUP BY 1),
      |lab AS (SELECT
      |    CASE WHEN last_order IS NULL OR last_order < mx - INTERVAL 90 DAY
      |         THEN 1 ELSE 0 END AS g1,
      |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM customer LEFT JOIN l ON c_custkey = o_custkey CROSS JOIN a),
      |pv AS (SELECT v, COUNT(*) AS cnt, CAST(SUM(g1) AS BIGINT) AS c1 FROM lab GROUP BY v),
      |sc AS (SELECT v,
      |         CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum,
      |         CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS c1_cum
      |       FROM pv),
      |t AS (SELECT MAX(cnt_cum) AS n, MAX(c1_cum) AS p FROM sc),
      |cd AS (SELECT v, cnt_cum AS n_left, c1_cum AS pos_left, n, p,
      |    (1.0 - (CAST(p AS DOUBLE) / n) * (CAST(p AS DOUBLE) / n)
      |         - (CAST(n - p AS DOUBLE) / n) * (CAST(n - p AS DOUBLE) / n))
      |    - (CAST(cnt_cum AS DOUBLE) / n)
      |      * (1.0 - (CAST(c1_cum AS DOUBLE) / cnt_cum) * (CAST(c1_cum AS DOUBLE) / cnt_cum)
      |             - (CAST(cnt_cum - c1_cum AS DOUBLE) / cnt_cum)
      |               * (CAST(cnt_cum - c1_cum AS DOUBLE) / cnt_cum))
      |    - (CAST(n - cnt_cum AS DOUBLE) / n)
      |      * (1.0 - (CAST(p - c1_cum AS DOUBLE) / (n - cnt_cum))
      |               * (CAST(p - c1_cum AS DOUBLE) / (n - cnt_cum))
      |             - (CAST((n - cnt_cum) - (p - c1_cum) AS DOUBLE) / (n - cnt_cum))
      |               * (CAST((n - cnt_cum) - (p - c1_cum) AS DOUBLE) / (n - cnt_cum)))
      |    AS gain
      |  FROM sc CROSS JOIN t WHERE cnt_cum < n),
      |m AS (SELECT MAX(gain) AS best_gain FROM cd)
      |SELECT MAX(n) AS n, MAX(p) AS n_pos,
      |  MIN(CASE WHEN gain = best_gain THEN v END) AS split_cents,
      |  MIN(CASE WHEN gain = best_gain THEN n_left END) AS n_left,
      |  MIN(CASE WHEN gain = best_gain THEN pos_left END) AS pos_left,
      |  ROUND(MAX(best_gain), 6) AS gini_gain
      |FROM cd CROSS JOIN m""".stripMargin

  /** Price-volume-mix decomposition of revenue growth, early vs late
    * calendar half, per market segment — the FP&A bridge that answers
    * "did revenue move because we charged more, sold more, or sold a
    * different mix" (an_mom_growth shows THAT revenue moved;
    * q_top_movers shows WHO; this shows WHY). Laspeyres convention:
    * price effect = (p_B − p_A)·q_A, volume effect = p_A·(q_B − q_A),
    * cross = Δrev − price − volume (reported, not hidden). Quantities
    * and cents revenues are exact BIGINTs from one lineitem pass; unit
    * prices are single IEEE divisions; effects ROUND(·,2) in dollars.
    * Segments present in only one half are dropped with their mass
    * reported in the ALL row's cross term. */
  private[graft] def anPriceVolumeMix(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val bounds = o.agg(min(col("o_orderdate")).as("mn"), max(col("o_orderdate")).as("mxd"))
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_quantity"),
      col("l_extendedprice"))
    val seg = Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment"))
    val base = li.join(o.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(seg), col("o_custkey") === col("c_custkey"))
      .crossJoin(broadcast(bounds))
      .select(col("c_mktsegment").as("segment"),
        (datediff(col("o_orderdate"), col("mn")) * 2 <
          datediff(col("mxd"), col("mn"))).cast("long").as("early"),
        (col("l_quantity").cast("decimal(24,2)") * 100).cast("bigint").as("q"),
        (col("l_extendedprice").cast("decimal(24,2)") * 100).cast("bigint").as("r"))
    val perSeg = base.groupBy(col("segment"))
      .agg(sum(col("early") * col("q")).as("qa"),
        sum((lit(1L) - col("early")) * col("q")).as("qb"),
        sum(col("early") * col("r")).as("ra"),
        sum((lit(1L) - col("early")) * col("r")).as("rb"))
      .filter(col("qa") > 0 && col("qb") > 0)
    val pa = col("ra").cast("double") / col("qa").cast("double")
    val pb = col("rb").cast("double") / col("qb").cast("double")
    perSeg
      .select(col("segment"),
        col("ra"), col("rb"),
        round((pb - pa) * col("qa").cast("double") / lit(100.0) / lit(100.0), 2)
          .as("price_effect"),
        round(pa * (col("qb") - col("qa")).cast("double") / lit(100.0) / lit(100.0), 2)
          .as("volume_effect"),
        round(((col("rb") - col("ra")).cast("double") -
          (pb - pa) * col("qa").cast("double") -
          pa * (col("qb") - col("qa")).cast("double")) / lit(100.0) / lit(100.0), 2)
          .as("cross_effect"))
      .orderBy(col("segment"))
  }

  private[graft] lazy val anPriceVolumeMixSql =
    """WITH b AS (SELECT MIN(o_orderdate) AS mn, MAX(o_orderdate) AS mxd FROM orders),
      |base AS (SELECT c_mktsegment AS segment,
      |    CASE WHEN date_diff('day', mn, o_orderdate) * 2
      |              < date_diff('day', mn, mxd) THEN 1 ELSE 0 END AS early,
      |    CAST(CAST(l_quantity AS DECIMAL(24,2)) * 100 AS BIGINT) AS q,
      |    CAST(CAST(l_extendedprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS r
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey CROSS JOIN b),
      |ps AS (SELECT segment,
      |         CAST(SUM(early * q) AS BIGINT) AS qa,
      |         CAST(SUM((1 - early) * q) AS BIGINT) AS qb,
      |         CAST(SUM(early * r) AS BIGINT) AS ra,
      |         CAST(SUM((1 - early) * r) AS BIGINT) AS rb
      |       FROM base GROUP BY segment
      |       HAVING CAST(SUM(early * q) AS BIGINT) > 0
      |          AND CAST(SUM((1 - early) * q) AS BIGINT) > 0)
      |SELECT segment, ra, rb,
      |  ROUND((CAST(rb AS DOUBLE) / qb - CAST(ra AS DOUBLE) / qa)
      |    * CAST(qa AS DOUBLE) / 100.0 / 100.0, 2) AS price_effect,
      |  ROUND(CAST(ra AS DOUBLE) / qa
      |    * CAST(qb - qa AS DOUBLE) / 100.0 / 100.0, 2) AS volume_effect,
      |  ROUND((CAST(rb - ra AS DOUBLE)
      |    - (CAST(rb AS DOUBLE) / qb - CAST(ra AS DOUBLE) / qa) * CAST(qa AS DOUBLE)
      |    - CAST(ra AS DOUBLE) / qa * CAST(qb - qa AS DOUBLE)) / 100.0 / 100.0, 2)
      |    AS cross_effect
      |FROM ps ORDER BY segment""".stripMargin

  /** Qini step-area of acctbal as an uplift-targeting score, BUILDING
    * (treated) vs AUTOMOBILE (control) churn — the causal-ML
    * evaluation beside an_roc_auc's observational one: ROC asks "does
    * the score rank churners", Qini asks "does targeting by the score
    * capture incremental treated-vs-control difference". Ties-grouped
    * RIGHT-endpoint step sum needs no neighbor access (the an_pr_auc
    * recipe): at each distinct cent, the targeted-fraction increment
    * and the Qini value q = Y_T − Y_C·N_T(v)/N_C(v) both read off ONE
    * descending-cumulative PrefixSum scan; terms gather
    * DECIMAL(38,18), ROUND(·,6); thresholds with no control mass yet
    * contribute the uncorrected Y_T (the standard convention,
    * deterministic on both engines). */
  private[graft] def anQini(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val anchor = o.agg(max(col("o_orderdate")).as("mx"))
    val last = o.groupBy(col("o_custkey")).agg(max(col("o_orderdate")).as("last_order"))
    val cutoff = col("mx") - expr("INTERVAL 90 DAYS")
    val labeled = Tables.customer(s, dir)
      .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
      .join(last, col("c_custkey") === col("o_custkey"), "left")
      .crossJoin(broadcast(anchor))
      .select(
        (col("c_mktsegment") === "BUILDING").cast("long").as("t"),
        (col("last_order").isNull || col("last_order") < cutoff).cast("long").as("y"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val perV = labeled.groupBy(col("v"))
      .agg(sum(col("t")).as("nt"), sum(lit(1L) - col("t")).as("nc"),
        sum(col("t") * col("y")).as("yt"),
        sum((lit(1L) - col("t")) * col("y")).as("yc"))
    val scan = graft.operators.PrefixSum.persistOwned(
      graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"),
        Seq("nt", "nc", "yt", "yc")))
    val tot = scan.agg(max(col("nt_cum")).as("ntt"), max(col("nc_cum")).as("nct"),
      max(col("yt_cum")).as("ytt"), max(col("yc_cum")).as("yct"))
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    // score targets DESC: ≥v cumulatives = total − below
    val ntg = (col("ntt") - (col("nt_cum") - col("nt"))).cast("double")
    val ncg = (col("nct") - (col("nc_cum") - col("nc"))).cast("double")
    val ytg = (col("ytt") - (col("yt_cum") - col("yt"))).cast("double")
    val ycg = (col("yct") - (col("yc_cum") - col("yc"))).cast("double")
    val q = when(ncg > 0, ytg - ycg * ntg / ncg).otherwise(ytg)
    val inc = (col("nt") + col("nc")).cast("double") /
      (col("ntt") + col("nct")).cast("double")
    val area = scan.crossJoin(broadcast(tot))
      .agg(gather(inc * q).as("qini_area"))
    area.crossJoin(broadcast(tot))
      .select(col("ntt").as("n_treated"), col("nct").as("n_control"),
        round(col("ytt").cast("double") -
          col("yct").cast("double") * col("ntt").cast("double") /
            col("nct").cast("double"), 6).as("total_uplift"),
        round(col("qini_area").cast("double"), 6).as("qini_step_area"))
  }

  private[graft] lazy val anQiniSql =
    """WITH a AS (SELECT MAX(o_orderdate) AS mx FROM orders),
      |l AS (SELECT o_custkey, MAX(o_orderdate) AS last_order FROM orders GROUP BY 1),
      |lab AS (SELECT
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS t,
      |    CASE WHEN last_order IS NULL OR last_order < mx - INTERVAL 90 DAY
      |         THEN 1 ELSE 0 END AS y,
      |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM customer LEFT JOIN l ON c_custkey = o_custkey CROSS JOIN a
      |  WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
      |pv AS (SELECT v, CAST(SUM(t) AS BIGINT) AS nt, CAST(SUM(1 - t) AS BIGINT) AS nc,
      |              CAST(SUM(t * y) AS BIGINT) AS yt,
      |              CAST(SUM((1 - t) * y) AS BIGINT) AS yc
      |       FROM lab GROUP BY v),
      |sc AS (SELECT v, nt, nc, yt, yc,
      |         CAST(SUM(nt) OVER (ORDER BY v) AS BIGINT) AS nt_cum,
      |         CAST(SUM(nc) OVER (ORDER BY v) AS BIGINT) AS nc_cum,
      |         CAST(SUM(yt) OVER (ORDER BY v) AS BIGINT) AS yt_cum,
      |         CAST(SUM(yc) OVER (ORDER BY v) AS BIGINT) AS yc_cum
      |       FROM pv),
      |t AS (SELECT MAX(nt_cum) AS ntt, MAX(nc_cum) AS nct,
      |             MAX(yt_cum) AS ytt, MAX(yc_cum) AS yct FROM sc),
      |g AS (SELECT MAX(ntt) AS n_treated, MAX(nct) AS n_control,
      |    CAST(SUM(CAST(
      |      (CAST(nt + nc AS DOUBLE) / CAST(ntt + nct AS DOUBLE)) *
      |      (CASE WHEN nct - (nc_cum - nc) > 0 THEN
      |         CAST(ytt - (yt_cum - yt) AS DOUBLE)
      |           - CAST(yct - (yc_cum - yc) AS DOUBLE)
      |             * CAST(ntt - (nt_cum - nt) AS DOUBLE)
      |             / CAST(nct - (nc_cum - nc) AS DOUBLE)
      |       ELSE CAST(ytt - (yt_cum - yt) AS DOUBLE) END)
      |      AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS qini_area
      |  FROM sc CROSS JOIN t)
      |SELECT n_treated, n_control,
      |  ROUND(CAST(ytt AS DOUBLE)
      |    - CAST(yct AS DOUBLE) * CAST(ntt AS DOUBLE) / CAST(nct AS DOUBLE), 6)
      |    AS total_uplift,
      |  ROUND(CAST(qini_area AS DOUBLE), 6) AS qini_step_area
      |FROM g CROSS JOIN t""".stripMargin

  /** Cochran's Q test across the five event types' per-user
    * participation flags — the BINARY-blocked member of the
    * nonparametric family (an_friedman ranks continuous outcomes per
    * block; Cochran's Q asks whether k binary "did the user do X"
    * treatments differ, the engagement-mix significance test).
    * Column totals G_j, row totals L_i, ΣL and ΣL² are ALL exact
    * BIGINTs from two keyed aggregations; Q = k(k−1)·Σ(G−Ḡ)²/(kΣL −
    * ΣL²) is one IEEE expression over them — computed with the
    * integer identity k·Σ(kG−ΣG)² / (k²·(kΣL−ΣL²)·(k−1)⁻¹...) kept
    * plainly as doubles fed by exact integers, ROUND(·,6);
    * degenerate denominator pins Q = 0. */
  private[graft] def anCochranQ(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val flags = Tables.events(s, dir)
      .filter(col("event_type").isin(types: _*))
      .select(col("user_id"), col("event_type")).distinct()
    val rowT = flags.groupBy(col("user_id")).agg(count(lit(1)).as("li"))
    val rows = rowT.agg(sum(col("li")).as("sl"),
      sum(col("li") * col("li")).as("sl2"), count(lit(1)).as("n_users"))
    val colT = flags.groupBy(col("event_type")).agg(count(lit(1)).as("g"))
    val k = lit(types.size.toLong)
    val cols = colT.agg(sum(col("g")).as("sg"),
      sum(col("g") * col("g")).as("sg2"), count(lit(1)).as("k_present"))
    rows.crossJoin(cols)
      .select(col("n_users"), col("k_present"), col("sg"), col("sl"),
        // k(k−1)(kΣG² − (ΣG)²)/k over k(kΣL − ΣL²)... algebra folded:
        // Q = (k−1)(kΣG² − (ΣG)²) / (kΣL − ΣL²), all-integer inputs
        round(
          when(k * col("sl") - col("sl2") > 0,
            ((k - 1) * (k * col("sg2") - col("sg") * col("sg"))).cast("double") /
              (k * col("sl") - col("sl2")).cast("double"))
            .otherwise(lit(0.0)), 6).as("cochran_q"))
  }

  private[graft] lazy val anCochranQSql =
    """WITH f AS (SELECT DISTINCT user_id, event_type FROM events
      |           WHERE event_type IN ('click','view','purchase','signup','error')),
      |r AS (SELECT CAST(SUM(li) AS BIGINT) AS sl,
      |             CAST(SUM(li * li) AS BIGINT) AS sl2,
      |             COUNT(*) AS n_users
      |      FROM (SELECT user_id, COUNT(*) AS li FROM f GROUP BY user_id) t),
      |c AS (SELECT CAST(SUM(g) AS BIGINT) AS sg,
      |             CAST(SUM(g * g) AS BIGINT) AS sg2,
      |             COUNT(*) AS k_present
      |      FROM (SELECT event_type, COUNT(*) AS g FROM f GROUP BY event_type) t)
      |SELECT n_users, k_present, sg, sl,
      |  ROUND(CASE WHEN 5 * sl - sl2 > 0 THEN
      |      CAST(4 * (5 * sg2 - sg * sg) AS DOUBLE) / CAST(5 * sl - sl2 AS DOUBLE)
      |    ELSE 0.0 END, 6) AS cochran_q
      |FROM r CROSS JOIN c""".stripMargin

  /** Entropy rate of the per-user event-type Markov chain — how
    * predictable the NEXT action is given the current one (an_markov
    * publishes the transition matrix; the entropy rate compresses it
    * to the one number that bounds any next-event model's achievable
    * log-loss). Transitions come from a user-keyed lag window with
    * the deterministic (ts, event_id) tie order; H = −Σ (n_ij/N)·
    * ln(n_ij/n_i) over exact BIGINT counts — the empirical-π form,
    * gathered DECIMAL(38,18), ROUND(·,6), with ln(k_states) reported
    * for the normalized readout. */
  private[graft] def anEntropyRate(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("cur"))
      .agg(count(lit(1)).as("nij"))
    val rowm = trans.groupBy(col("prev")).agg(sum(col("nij")).as("ni"))
    val tot = trans.agg(sum(col("nij")).as("n"),
      countDistinct(col("cur")).as("k_states"))
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    trans.join(broadcast(rowm), "prev").crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n_transitions"), max(col("k_states")).as("k_states"),
        gather(lit(-1.0) * col("nij").cast("double") / col("n").cast("double") *
          log(col("nij").cast("double") / col("ni").cast("double"))).as("hg"))
      .select(col("n_transitions"), col("k_states"),
        round(col("hg").cast("double"), 6).as("entropy_rate"),
        round(col("hg").cast("double") /
          log(col("k_states").cast("double")), 6).as("normalized_rate"))
  }

  private[graft] lazy val anEntropyRateSql =
    """WITH tr AS (SELECT prev, event_type AS cur, COUNT(*) AS nij FROM (
      |    SELECT user_id, event_type,
      |           LAG(event_type) OVER (PARTITION BY user_id
      |             ORDER BY ts, event_id) AS prev
      |    FROM events) t
      |  WHERE prev IS NOT NULL GROUP BY prev, event_type),
      |rm AS (SELECT prev, CAST(SUM(nij) AS BIGINT) AS ni FROM tr GROUP BY prev),
      |t AS (SELECT CAST(SUM(nij) AS BIGINT) AS n,
      |             COUNT(DISTINCT cur) AS k_states FROM tr)
      |SELECT MAX(n) AS n_transitions, MAX(k_states) AS k_states,
      |  ROUND(CAST(CAST(SUM(CAST(-1.0 * CAST(nij AS DOUBLE) / CAST(n AS DOUBLE)
      |    * ln(CAST(nij AS DOUBLE) / CAST(ni AS DOUBLE)) AS DECIMAL(38,18)))
      |    AS DECIMAL(38,18)) AS DOUBLE), 6) AS entropy_rate,
      |  ROUND(CAST(CAST(SUM(CAST(-1.0 * CAST(nij AS DOUBLE) / CAST(n AS DOUBLE)
      |    * ln(CAST(nij AS DOUBLE) / CAST(ni AS DOUBLE)) AS DECIMAL(38,18)))
      |    AS DECIMAL(38,18)) AS DOUBLE)
      |    / ln(CAST(MAX(k_states) AS DOUBLE)), 6) AS normalized_rate
      |FROM tr JOIN rm USING (prev) CROSS JOIN t""".stripMargin

  /** Restricted mean survival time at τ = 365 days — the clinically
    * standard "how many of the next 365 days does an average customer
    * survive" summary that stays valid when hazards cross and the
    * log-rank/hazard-ratio story breaks down (an_kaplan_meier draws
    * the curve; RMST is its area up to τ). Same lifetime/censor
    * construction and the same bounded distinct-lifetime axis; step
    * widths come from LEAD on that axis (the KM cumulative-window
    * precedent — the axis is calendar-bounded, never row-sized);
    * survival steps reuse KM's ROUND(·,6) exp∘Σln, widths are exact
    * integer days, and the area gathers DECIMAL(38,18), ROUND(·,4). */
  private[graft] def anRmst(s: SparkSession, dir: String): DataFrame = {
    val tau = 365L
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
    val wLead = Window.orderBy(col("t"))
    // steps is the distinct-lifetime axis (calendar-bounded, ≤ ~2500
    // rows) with TWO consumers (the head stats and the area gather) —
    // stabilize once so the survival windows and the orders-sized
    // lifetime aggregation run once, not per consumer
    val steps = graft.operators.Checkpoints.stabilizeLazy(
      byT.crossJoin(broadcast(cust.agg(count(lit(1)).as("n_total"))))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("n_at")).over(wPrev), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("surv", when(col("d") === col("n_risk"), lit(0.0))
        .otherwise(round(exp(sum(
          log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")))
          .over(wCum)), 6)))
      .withColumn("t_next", coalesce(lead(col("t"), 1).over(wLead), lit(tau)))
      .withColumn("width",
        greatest(lit(0L), least(col("t_next"), lit(tau)) - least(col("t"), lit(tau)))))
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    val head = steps.agg(min(col("t")).as("t1"), max(col("n_total")).as("n"))
    steps.agg(gather(col("surv") * col("width").cast("double")).as("areag"))
      .crossJoin(broadcast(head))
      .select(lit(tau).as("tau_days"), col("n"),
        round(least(col("t1"), lit(tau)).cast("double") +
          col("areag").cast("double"), 4).as("rmst_days"))
  }

  private[graft] lazy val anRmstSql =
    """WITH a AS (SELECT MAX(o_orderdate) AS mx FROM orders),
      |c AS (SELECT o_custkey, MIN(o_orderdate) AS f, MAX(o_orderdate) AS l
      |      FROM orders GROUP BY 1),
      |cust AS (SELECT CAST(date_diff('day', f, l) AS BIGINT) AS t,
      |                CASE WHEN l < mx - INTERVAL 90 DAY THEN 1 ELSE 0 END AS ev
      |         FROM c CROSS JOIN a),
      |byt AS (SELECT t, COUNT(*) AS n_at, CAST(SUM(ev) AS BIGINT) AS d
      |        FROM cust GROUP BY 1),
      |tot AS (SELECT COUNT(*) AS n_total FROM cust),
      |r AS (SELECT t, d, n_total,
      |        n_total - COALESCE(CAST(SUM(n_at) OVER (ORDER BY t
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n_risk
      |      FROM byt CROSS JOIN tot),
      |ev AS (SELECT t, d, n_total, n_risk FROM r WHERE d > 0),
      |st AS (SELECT t, n_total,
      |         CASE WHEN d = n_risk THEN 0.0
      |              ELSE ROUND(exp(SUM(ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)))
      |                OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
      |         END AS surv,
      |         COALESCE(LEAD(t) OVER (ORDER BY t), 365) AS t_next
      |       FROM ev),
      |w AS (SELECT surv, n_total, t,
      |        greatest(0, least(t_next, 365) - least(t, 365)) AS width FROM st),
      |g AS (SELECT MAX(n_total) AS n, MIN(t) AS t1,
      |        CAST(SUM(CAST(surv * CAST(width AS DOUBLE) AS DECIMAL(38,18)))
      |          AS DECIMAL(38,18)) AS areag
      |      FROM w)
      |SELECT CAST(365 AS BIGINT) AS tau_days, n,
      |  ROUND(CAST(least(t1, 365) AS DOUBLE) + CAST(areag AS DOUBLE), 4) AS rmst_days
      |FROM g""".stripMargin

  /** DeLong standard error of the acctbal churn AUC — the uncertainty
    * an_roc_auc's point estimate needs before two models can be
    * compared honestly (an AUC of 0.62 ± 0.01 and one of 0.62 ± 0.2
    * are different findings). Placement values per DISTINCT score cent
    * come from the same PrefixSum cumulatives (doubled placements
    * 2·below + at are exact BIGINTs); the placement variances S10/S01
    * gather DECIMAL(38,18) around the exact-rational AUC; SE =
    * √(S10/n1 + S01/n0), ROUND(·,6). */
  private[graft] def anAucSe(s: SparkSession, dir: String): DataFrame = {
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
    val scan = graft.operators.PrefixSum.persistOwned(
      graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt", "c1")))
    val tot = scan.agg(max(col("cnt_cum")).as("n"), max(col("c1_cum")).as("n1"))
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    val c0 = col("cnt") - col("c1")
    val negBelow = (col("cnt_cum") - col("cnt")) - (col("c1_cum") - col("c1"))
    val posBelow = col("c1_cum") - col("c1")
    val n0 = (col("n") - col("n1"))
    val posAbove = col("n1") - col("c1_cum")
    // AUC as the exact Mann–Whitney rational (the an_roc_auc identity)
    val aucExpr = col("auc_num").cast("double") /
      (lit(2.0) * col("n1").cast("double") * (col("n") - col("n1")).cast("double"))
    val aucNum = scan.crossJoin(broadcast(tot))
      .agg(sum(col("c1") * (lit(2L) * negBelow + c0)).as("auc_num"))
    scan.crossJoin(broadcast(tot)).crossJoin(broadcast(aucNum))
      .agg(max(col("n1")).as("n_pos"), max(n0).as("n_neg"),
        max(aucExpr).as("auc"),
        gather(col("c1").cast("double") *
          ((lit(2L) * negBelow + c0).cast("double") /
            (lit(2.0) * n0.cast("double")) - aucExpr) *
          ((lit(2L) * negBelow + c0).cast("double") /
            (lit(2.0) * n0.cast("double")) - aucExpr)).as("s10g"),
        gather(c0.cast("double") *
          ((lit(2L) * posAbove + col("c1")).cast("double") /
            (lit(2.0) * col("n1").cast("double")) - aucExpr) *
          ((lit(2L) * posAbove + col("c1")).cast("double") /
            (lit(2.0) * col("n1").cast("double")) - aucExpr)).as("s01g"))
      .select(col("n_pos"), col("n_neg"), round(col("auc"), 6).as("auc"),
        round(sqrt(
          col("s10g").cast("double") / (col("n_pos") - 1).cast("double") /
            col("n_pos").cast("double") +
          col("s01g").cast("double") / (col("n_neg") - 1).cast("double") /
            col("n_neg").cast("double")), 6).as("auc_se"))
  }

  private[graft] lazy val anAucSeSql =
    """WITH a AS (SELECT MAX(o_orderdate) AS mx FROM orders),
      |l AS (SELECT o_custkey, MAX(o_orderdate) AS last_order FROM orders GROUP BY 1),
      |lab AS (SELECT
      |    CASE WHEN last_order IS NULL OR last_order < mx - INTERVAL 90 DAY
      |         THEN 1 ELSE 0 END AS g1,
      |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM customer LEFT JOIN l ON c_custkey = o_custkey CROSS JOIN a),
      |pv AS (SELECT v, COUNT(*) AS cnt, CAST(SUM(g1) AS BIGINT) AS c1 FROM lab GROUP BY v),
      |sc AS (SELECT v, cnt, c1,
      |         CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cnt_cum,
      |         CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS c1_cum
      |       FROM pv),
      |t AS (SELECT MAX(cnt_cum) AS n, MAX(c1_cum) AS n1 FROM sc),
      |an AS (SELECT CAST(SUM(c1 * (2 * ((cnt_cum - cnt) - (c1_cum - c1)) + (cnt - c1)))
      |         AS BIGINT) AS auc_num
      |       FROM sc CROSS JOIN t),
      |g AS (SELECT MAX(n1) AS n_pos, MAX(n - n1) AS n_neg,
      |    MAX(CAST(auc_num AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)))
      |      AS auc,
      |    CAST(SUM(CAST(CAST(c1 AS DOUBLE) *
      |      (CAST(2 * ((cnt_cum - cnt) - (c1_cum - c1)) + (cnt - c1) AS DOUBLE)
      |         / (2.0 * CAST(n - n1 AS DOUBLE))
      |       - CAST(auc_num AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)))
      |      * (CAST(2 * ((cnt_cum - cnt) - (c1_cum - c1)) + (cnt - c1) AS DOUBLE)
      |         / (2.0 * CAST(n - n1 AS DOUBLE))
      |       - CAST(auc_num AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)))
      |      AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS s10g,
      |    CAST(SUM(CAST(CAST(cnt - c1 AS DOUBLE) *
      |      (CAST(2 * (n1 - c1_cum) + c1 AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE))
      |       - CAST(auc_num AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)))
      |      * (CAST(2 * (n1 - c1_cum) + c1 AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE))
      |       - CAST(auc_num AS DOUBLE) / (2.0 * CAST(n1 AS DOUBLE) * CAST(n - n1 AS DOUBLE)))
      |      AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS s01g
      |  FROM sc CROSS JOIN t CROSS JOIN an)
      |SELECT n_pos, n_neg, ROUND(auc, 6) AS auc,
      |  ROUND(sqrt(CAST(s10g AS DOUBLE) / CAST(n_pos - 1 AS DOUBLE) / CAST(n_pos AS DOUBLE)
      |           + CAST(s01g AS DOUBLE) / CAST(n_neg - 1 AS DOUBLE) / CAST(n_neg AS DOUBLE)),
      |    6) AS auc_se
      |FROM g""".stripMargin

  /** Maximum drawdown of the daily-revenue curve: running peak via a
    * cumulative max over the day spine, drawdown = peak − level, argmax
    * with earliest-trough tie-break. Pure integer cents end to end; the
    * one division is the /100 dollars emission. The equity-curve risk
    * primitive next to an_var_es (that one is distributional, this one
    * is path-dependent). */
  private[graft] def anMaxDrawdown(s: SparkSession, dir: String): DataFrame = {
    val cum = Window.orderBy(col("d")).rowsBetween(Window.unboundedPreceding, 0)
    dailyRevenueSpine(s, dir)
      .withColumn("peak_c", max(col("rev_c")).over(cum))
      .withColumn("dd_c", col("peak_c") - col("rev_c"))
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("dd_c").desc, col("day"))))
      .filter(col("rnk") === 1)
      .select(col("day").as("trough_day"),
        (col("dd_c") / 100.0).as("max_drawdown"),
        (col("peak_c") / 100.0).as("peak_at_trough"),
        (col("rev_c") / 100.0).as("trough_rev"))
  }

  private[graft] lazy val anMaxDrawdownSql =
    s"""WITH daily AS ($dailySpineSql),
       |c AS (SELECT day, rev_c,
       |        MAX(rev_c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_c
       |      FROM daily),
       |r AS (SELECT day, rev_c, peak_c, peak_c - rev_c AS dd_c,
       |        ROW_NUMBER() OVER (ORDER BY peak_c - rev_c DESC, day) AS rnk FROM c)
       |SELECT day AS trough_day, dd_c / 100.0 AS max_drawdown,
       |       peak_c / 100.0 AS peak_at_trough, rev_c / 100.0 AS trough_rev
       |FROM r WHERE rnk = 1""".stripMargin

  /** Bollinger-band breaches on daily revenue: trailing 20-calendar-day
    * RANGE window (19 preceding + current over the epoch-day key, so a
    * calendar gap SHRINKS the window rather than sliding old days in),
    * breach test kept entirely in integers — z² > 2² is cross-multiplied
    * to (n·x − S)² > 4·(n·Q − S²) with S, Q gathered in DECIMAL(38,0)
    * (Q = Σ rev_c² would overflow BIGINT past ~1e13-cent days) — no
    * float boundary anywhere, bit-identical on any engine. */
  private[graft] def anBollinger(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("d")).rangeBetween(-19, 0)
    val revD = col("rev_c").cast("decimal(38,0)")
    dailyRevenueSpine(s, dir)
      .withColumn("n_w", count(lit(1)).over(w))
      .withColumn("s_w", sum(revD).over(w))
      .withColumn("q_w", sum(revD * revD).over(w))
      .filter(col("n_w") === 20)
      .withColumn("dev", revD * lit(20) - col("s_w"))
      .withColumn("var4", (col("q_w") * 20 - col("s_w") * col("s_w")) * 4)
      .select(col("day"), (col("rev_c") / 100.0).as("rev"),
        (col("dev") > 0 && col("dev") * col("dev") > col("var4")).as("breach_hi"),
        (col("dev") < 0 && col("dev") * col("dev") > col("var4")).as("breach_lo"))
      .orderBy(col("day"))
  }

  private[graft] lazy val anBollingerSql =
    s"""WITH daily AS ($dailySpineSql),
       |w AS (SELECT day, rev_c,
       |        COUNT(*) OVER tw AS n_w,
       |        SUM(CAST(rev_c AS DECIMAL(38,0))) OVER tw AS s_w,
       |        SUM(CAST(rev_c AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0))) OVER tw AS q_w
       |      FROM daily
       |      WINDOW tw AS (ORDER BY d RANGE BETWEEN 19 PRECEDING AND CURRENT ROW)),
       |f AS (SELECT day, rev_c,
       |        CAST(rev_c AS DECIMAL(38,0)) * 20 - s_w AS dev,
       |        (q_w * 20 - s_w * s_w) * 4 AS var4
       |      FROM w WHERE n_w = 20)
       |SELECT day, rev_c / 100.0 AS rev,
       |  (dev > 0 AND dev * dev > var4) AS breach_hi,
       |  (dev < 0 AND dev * dev > var4) AS breach_lo
       |FROM f ORDER BY day""".stripMargin

  /** Historical VaR-95 / expected shortfall on day-over-day revenue
    * changes: diffs over the day spine (calendar gaps treated as
    * consecutive observations — the spine IS the series), k = ⌈n/20⌉ via
    * integer ceiling division, VaR = the k-th smallest change (exact
    * order statistic, (value, day) deterministic tie-break), ES = exact
    * BIGINT sum of the k tail changes ÷ k at emission. Order statistics
    * on the bounded day spine — no percentile aggregate, no global sort
    * of fact rows. */
  private[graft] def anVarEs(s: SparkSession, dir: String): DataFrame = {
    val diffs = dailyRevenueSpine(s, dir)
      .withColumn("chg_c", col("rev_c") - lag(col("rev_c"), 1).over(Window.orderBy(col("d"))))
      .filter(col("chg_c").isNotNull)
      .withColumn("rk", row_number().over(Window.orderBy(col("chg_c"), col("day"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("k", expr("(n + 19) div 20"))
    diffs.filter(col("rk") <= col("k"))
      .groupBy(col("n"), col("k"))
      .agg(max(when(col("rk") === col("k"), col("chg_c"))).as("var_c"),
        sum(col("chg_c")).as("tail_sum_c"))
      .select(col("n"), col("k"),
        (col("var_c") / 100.0).as("var95"),
        (col("tail_sum_c").cast("double") / col("k").cast("double") / 100.0).as("es95"))
  }

  private[graft] lazy val anVarEsSql =
    s"""WITH daily AS ($dailySpineSql),
       |ch AS (SELECT day, rev_c - LAG(rev_c) OVER (ORDER BY d) AS chg_c FROM daily),
       |rk AS (SELECT day, chg_c,
       |         ROW_NUMBER() OVER (ORDER BY chg_c, day) AS rk,
       |         COUNT(*) OVER () AS n
       |       FROM ch WHERE chg_c IS NOT NULL),
       |kk AS (SELECT day, chg_c, rk, n, (n + 19) // 20 AS k FROM rk)
       |SELECT n, k,
       |  MAX(CASE WHEN rk = k THEN chg_c END) / 100.0 AS var95,
       |  CAST(CAST(SUM(chg_c) AS BIGINT) AS DOUBLE) / CAST(k AS DOUBLE) / 100.0 AS es95
       |FROM kk WHERE rk <= k GROUP BY n, k""".stripMargin

  /** Cutler's RSI-14 on daily revenue: per-day gain/loss cents from the
    * spine diffs, trailing 14-day RANGE sums (complete windows only),
    * RSI = 100·G/(G+L) as one IEEE division of exact integers (flat
    * 14-day stretch → both sums zero → pinned 50.0). The simple-average
    * Cutler form, NOT Wilder's recursive EWMA — the recursion's α=1/14
    * is not dyadic, so its float trajectory is not engine-replayable;
    * the windowed form is exact. */
  private[graft] def anRsi(s: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("d")).rangeBetween(-13, 0)
    dailyRevenueSpine(s, dir)
      .withColumn("chg_c", col("rev_c") - lag(col("rev_c"), 1).over(Window.orderBy(col("d"))))
      .filter(col("chg_c").isNotNull)
      .withColumn("gain_c", greatest(col("chg_c"), lit(0L)))
      .withColumn("loss_c", greatest(-col("chg_c"), lit(0L)))
      .withColumn("n_w", count(lit(1)).over(w))
      .withColumn("g", sum(col("gain_c")).over(w))
      .withColumn("l", sum(col("loss_c")).over(w))
      .filter(col("n_w") === 14)
      .select(col("day"),
        when(col("g") + col("l") === 0, lit(50.0))
          .otherwise((col("g") * 100).cast("double") /
            (col("g") + col("l")).cast("double")).as("rsi"))
      .orderBy(col("day"))
  }

  private[graft] lazy val anRsiSql =
    s"""WITH daily AS ($dailySpineSql),
       |ch AS (SELECT day, d, rev_c - LAG(rev_c) OVER (ORDER BY d) AS chg_c FROM daily),
       |gl AS (SELECT day, d, GREATEST(chg_c, 0) AS gain_c, GREATEST(-chg_c, 0) AS loss_c
       |       FROM ch WHERE chg_c IS NOT NULL),
       |w AS (SELECT day, COUNT(*) OVER tw AS n_w,
       |        SUM(gain_c) OVER tw AS g, SUM(loss_c) OVER tw AS l
       |      FROM gl
       |      WINDOW tw AS (ORDER BY d RANGE BETWEEN 13 PRECEDING AND CURRENT ROW))
       |SELECT day, CASE WHEN g + l = 0 THEN 50.0
       |  ELSE CAST(g * 100 AS DOUBLE) / CAST(g + l AS DOUBLE) END AS rsi
       |FROM w WHERE n_w = 14 ORDER BY day""".stripMargin

  /** McNemar's paired-proportions test: customers active (≥1 order) in
    * 1996 vs 1997 — the discordant cells b (96-only) and c (97-only)
    * drive χ² = (b−c)²/(b+c). One distinct-flag aggregate per customer
    * then four exact counts; the statistic is a single IEEE division of
    * exact integers. The paired complement to an_abtest's independent
    * two-proportion z. */
  private[graft] def anMcnemar(s: SparkSession, dir: String): DataFrame = {
    val flags = Tables.orders(s, dir)
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").isin(1996, 1997))
      .groupBy(col("o_custkey"))
      .agg(max(when(col("yr") === 1996, 1).otherwise(0)).as("a96"),
        max(when(col("yr") === 1997, 1).otherwise(0)).as("a97"))
    Tables.customer(s, dir)
      .join(flags, col("c_custkey") === col("o_custkey"), "left")
      .na.fill(0, Seq("a96", "a97"))
      .agg(
        sum(when(col("a96") === 1 && col("a97") === 1, 1L).otherwise(0L)).as("n11"),
        sum(when(col("a96") === 1 && col("a97") === 0, 1L).otherwise(0L)).as("b_only96"),
        sum(when(col("a96") === 0 && col("a97") === 1, 1L).otherwise(0L)).as("c_only97"),
        sum(when(col("a96") === 0 && col("a97") === 0, 1L).otherwise(0L)).as("n00"))
      .select(col("n11"), col("b_only96"), col("c_only97"), col("n00"),
        when(col("b_only96") + col("c_only97") === 0, lit(0.0))
          .otherwise(((col("b_only96") - col("c_only97")) *
            (col("b_only96") - col("c_only97"))).cast("double") /
            (col("b_only96") + col("c_only97")).cast("double")).as("mcnemar"))
  }

  private[graft] lazy val anMcnemarSql =
    """WITH f AS (SELECT o_custkey,
      |    MAX(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS a96,
      |    MAX(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END) AS a97
      |  FROM orders WHERE year(o_orderdate) IN (1996, 1997) GROUP BY o_custkey),
      |j AS (SELECT COALESCE(a96, 0) AS a96, COALESCE(a97, 0) AS a97
      |      FROM customer LEFT JOIN f ON c_custkey = o_custkey)
      |SELECT
      |  CAST(SUM(CASE WHEN a96 = 1 AND a97 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
      |  CAST(SUM(CASE WHEN a96 = 1 AND a97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b_only96,
      |  CAST(SUM(CASE WHEN a96 = 0 AND a97 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_only97,
      |  CAST(SUM(CASE WHEN a96 = 0 AND a97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00,
      |  CASE WHEN SUM(CASE WHEN a96 <> a97 THEN 1 ELSE 0 END) = 0 THEN 0.0
      |    ELSE CAST((SUM(CASE WHEN a96 = 1 AND a97 = 0 THEN 1 ELSE 0 END)
      |             - SUM(CASE WHEN a96 = 0 AND a97 = 1 THEN 1 ELSE 0 END))
      |            * (SUM(CASE WHEN a96 = 1 AND a97 = 0 THEN 1 ELSE 0 END)
      |             - SUM(CASE WHEN a96 = 0 AND a97 = 1 THEN 1 ELSE 0 END)) AS DOUBLE)
      |       / CAST(SUM(CASE WHEN a96 <> a97 THEN 1 ELSE 0 END) AS DOUBLE) END AS mcnemar
      |FROM j""".stripMargin

  /** Cohen's kappa between two deterministic "raters" of customer value
    * (balance ≥ 5000 vs ≥5 lifetime orders): the 2×2 agreement table in
    * exact counts, κ computed in the cross-multiplied integer form
    * (N·agree − Σ marginal products) / (N² − Σ marginal products) — one
    * IEEE division, no intermediate float subtraction. Marginal products
    * gathered in DECIMAL(38,0) (N² overflows BIGINT past ~3e9 rows). */
  private[graft] def anCohenKappa(s: SparkSession, dir: String): DataFrame = {
    val ordersPerCust = Tables.orders(s, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_ord"))
    Tables.customer(s, dir)
      .join(ordersPerCust, col("c_custkey") === col("o_custkey"), "left")
      .withColumn("r1", when(col("c_acctbal") >= 5000.0, 1).otherwise(0))
      .withColumn("r2", when(coalesce(col("n_ord"), lit(0L)) >= 5, 1).otherwise(0))
      .agg(
        sum(when(col("r1") === 1 && col("r2") === 1, 1L).otherwise(0L)).as("n11"),
        sum(when(col("r1") === 1 && col("r2") === 0, 1L).otherwise(0L)).as("n10"),
        sum(when(col("r1") === 0 && col("r2") === 1, 1L).otherwise(0L)).as("n01"),
        sum(when(col("r1") === 0 && col("r2") === 0, 1L).otherwise(0L)).as("n00"))
      .withColumn("nn", (col("n11") + col("n10") + col("n01") + col("n00")).cast("decimal(38,0)"))
      .withColumn("pe_num",
        ((col("n11") + col("n10")).cast("decimal(38,0)") * (col("n11") + col("n01")).cast("decimal(38,0)") +
         (col("n01") + col("n00")).cast("decimal(38,0)") * (col("n10") + col("n00")).cast("decimal(38,0)")))
      .select(col("n11"), col("n10"), col("n01"), col("n00"),
        ((col("nn") * (col("n11") + col("n00")).cast("decimal(38,0)") - col("pe_num")).cast("double") /
          (col("nn") * col("nn") - col("pe_num")).cast("double")).as("kappa"))
  }

  private[graft] lazy val anCohenKappaSql =
    """WITH oc AS (SELECT o_custkey, COUNT(*) AS n_ord FROM orders GROUP BY o_custkey),
      |r AS (SELECT CASE WHEN c_acctbal >= 5000.0 THEN 1 ELSE 0 END AS r1,
      |        CASE WHEN COALESCE(n_ord, 0) >= 5 THEN 1 ELSE 0 END AS r2
      |      FROM customer LEFT JOIN oc ON c_custkey = o_custkey),
      |t AS (SELECT
      |  CAST(SUM(CASE WHEN r1 = 1 AND r2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
      |  CAST(SUM(CASE WHEN r1 = 1 AND r2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n10,
      |  CAST(SUM(CASE WHEN r1 = 0 AND r2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n01,
      |  CAST(SUM(CASE WHEN r1 = 0 AND r2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n00
      |  FROM r)
      |SELECT n11, n10, n01, n00,
      |  CAST(CAST(n11 + n10 + n01 + n00 AS DECIMAL(38,0)) * CAST(n11 + n00 AS DECIMAL(38,0))
      |    - (CAST(n11 + n10 AS DECIMAL(38,0)) * CAST(n11 + n01 AS DECIMAL(38,0))
      |       + CAST(n01 + n00 AS DECIMAL(38,0)) * CAST(n10 + n00 AS DECIMAL(38,0))) AS DOUBLE)
      |  / CAST(CAST(n11 + n10 + n01 + n00 AS DECIMAL(38,0)) * CAST(n11 + n10 + n01 + n00 AS DECIMAL(38,0))
      |    - (CAST(n11 + n10 AS DECIMAL(38,0)) * CAST(n11 + n01 AS DECIMAL(38,0))
      |       + CAST(n01 + n00 AS DECIMAL(38,0)) * CAST(n10 + n00 AS DECIMAL(38,0))) AS DOUBLE) AS kappa
      |FROM t""".stripMargin

  /** 1-D Wasserstein (earth-mover) distance between the weekday-A and
    * weekend-B daily-revenue distributions, on a portable (d+2)%7
    * calendar split (d counts from 1992-01-01, a Wednesday, so the +2
    * anchor maps Mon–Fri → A and Sat/Sun → B — the true calendar):
    * W₁ = Σ |F_A − F_B| dv over the sorted distinct-value spine,
    * cross-multiplied to exact integers — |C_A·N_B − C_B·N_A| · gap
    * gathered in DECIMAL(38,0), ONE division by N_A·N_B·100 at emission.
    * The distribution-shift metric with units (dollars) that an_psi's
    * banded score and an_ks_drift's sup-norm don't give. */
  private[graft] def anWasserstein(s: SparkSession, dir: String): DataFrame = {
    val sp = dailyRevenueSpine(s, dir)
      .withColumn("grp", when(pmod(col("d") + 2, lit(7)) < 5, lit("A")).otherwise(lit("B")))
    val byVal = sp.groupBy(col("rev_c"))
      .agg(sum(when(col("grp") === "A", 1L).otherwise(0L)).as("ca"),
        sum(when(col("grp") === "B", 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy(col("rev_c")).rowsBetween(Window.unboundedPreceding, 0)
    byVal
      .withColumn("na", sum(col("ca")).over(Window.partitionBy()))
      .withColumn("nb", sum(col("cb")).over(Window.partitionBy()))
      .withColumn("cca", sum(col("ca")).over(w))
      .withColumn("ccb", sum(col("cb")).over(w))
      .withColumn("gap", lead(col("rev_c"), 1).over(Window.orderBy(col("rev_c"))) - col("rev_c"))
      .filter(col("gap").isNotNull)
      .groupBy(col("na"), col("nb"))
      .agg(sum(abs(col("cca").cast("decimal(38,0)") * col("nb") -
        col("ccb").cast("decimal(38,0)") * col("na")) * col("gap")).as("num"))
      .select(col("na").as("n_weekday"), col("nb").as("n_weekend"),
        (col("num").cast("double") /
          (col("na") * col("nb")).cast("double") / 100.0).as("w1_dollars"))
  }

  private[graft] lazy val anWassersteinSql =
    s"""WITH daily AS ($dailySpineSql),
       |g AS (SELECT rev_c, CASE WHEN ((d + 2) % 7) < 5 THEN 'A' ELSE 'B' END AS grp FROM daily),
       |v AS (SELECT rev_c,
       |        CAST(SUM(CASE WHEN grp = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |        CAST(SUM(CASE WHEN grp = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |      FROM g GROUP BY rev_c),
       |c AS (SELECT rev_c, ca, cb,
       |        SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb,
       |        SUM(ca) OVER (ORDER BY rev_c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cca,
       |        SUM(cb) OVER (ORDER BY rev_c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ccb,
       |        LEAD(rev_c) OVER (ORDER BY rev_c) - rev_c AS gap
       |      FROM v)
       |SELECT CAST(na AS BIGINT) AS n_weekday, CAST(nb AS BIGINT) AS n_weekend,
       |  CAST(SUM(ABS(CAST(cca AS DECIMAL(38,0)) * nb - CAST(ccb AS DECIMAL(38,0)) * na) * gap) AS DOUBLE)
       |    / CAST(na * nb AS DOUBLE) / 100.0 AS w1_dollars
       |FROM c WHERE gap IS NOT NULL GROUP BY na, nb""".stripMargin

  /** Two-sample Cramér–von Mises T between the same calendar-anchored
    * (d+2)%7 weekday/weekend
    * daily-revenue split: pooled row_number ranks with the deterministic
    * (rev_c, day) tie-break both engines order identically, U = n·Σ(r−i)²
    * + m·Σ(s−j)² over exact integer ranks, T = U/(nm(n+m)) −
    * (4nm−1)/(6(n+m)) as two exactly-rounded IEEE divisions of integers.
    * The whole-CDF L² complement to an_ks_drift's sup-norm. */
  private[graft] def anCvm(s: SparkSession, dir: String): DataFrame = {
    val sp = dailyRevenueSpine(s, dir)
      .withColumn("grp", when(pmod(col("d") + 2, lit(7)) < 5, lit("A")).otherwise(lit("B")))
      .withColumn("r", row_number().over(Window.orderBy(col("rev_c"), col("day"))).cast("long"))
      .withColumn("i", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("rev_c"), col("day"))).cast("long"))
    sp.groupBy(col("grp"))
      .agg(count(lit(1)).as("cnt"),
        sum((col("r") - col("i")) * (col("r") - col("i"))).as("ss"))
      .agg(
        max(when(col("grp") === "A", col("cnt"))).as("n"),
        max(when(col("grp") === "B", col("cnt"))).as("m"),
        max(when(col("grp") === "A", col("ss"))).as("ssa"),
        max(when(col("grp") === "B", col("ss"))).as("ssb"))
      .select(col("n").as("n_weekday"), col("m").as("n_weekend"),
        ((col("n") * col("ssa") + col("m") * col("ssb")).cast("double") /
          (col("n") * col("m") * (col("n") + col("m"))).cast("double") -
          (col("n") * col("m") * 4 - 1).cast("double") /
            ((col("n") + col("m")) * 6).cast("double")).as("t_stat"))
  }

  private[graft] lazy val anCvmSql =
    s"""WITH daily AS ($dailySpineSql),
       |g AS (SELECT day, rev_c, CASE WHEN ((d + 2) % 7) < 5 THEN 'A' ELSE 'B' END AS grp FROM daily),
       |r AS (SELECT grp,
       |        CAST(ROW_NUMBER() OVER (ORDER BY rev_c, day) AS BIGINT) AS r,
       |        CAST(ROW_NUMBER() OVER (PARTITION BY grp ORDER BY rev_c, day) AS BIGINT) AS i
       |      FROM g),
       |t AS (SELECT grp, COUNT(*) AS cnt, CAST(SUM((r - i) * (r - i)) AS BIGINT) AS ss
       |      FROM r GROUP BY grp),
       |p AS (SELECT
       |        MAX(CASE WHEN grp = 'A' THEN cnt END) AS n,
       |        MAX(CASE WHEN grp = 'B' THEN cnt END) AS m,
       |        MAX(CASE WHEN grp = 'A' THEN ss END) AS ssa,
       |        MAX(CASE WHEN grp = 'B' THEN ss END) AS ssb
       |      FROM t)
       |SELECT n AS n_weekday, m AS n_weekend,
       |  CAST(n * ssa + m * ssb AS DOUBLE) / CAST(n * m * (n + m) AS DOUBLE)
       |    - CAST(n * m * 4 - 1 AS DOUBLE) / CAST((n + m) * 6 AS DOUBLE) AS t_stat
       |FROM p""".stripMargin

  /** Brier score of the per-segment churn-rate model with the Murphy
    * decomposition: the in-sample group-mean prediction makes each
    * segment's Brier contribution EXACTLY k_g(n_g−k_g)/n_g (the
    * cross-multiplied closed form — no per-row (p−y)² pass), gathered
    * per-group as correctly-rounded doubles into a DECIMAL(38,18)
    * order-independent sum. reliability is zero by construction for the
    * in-sample model, so resolution = uncertainty − brier exactly. */
  private[graft] def anBrier(s: SparkSession, dir: String): DataFrame = {
    val grp = churnLabeled(s, dir).groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_g"), sum(col("g1")).as("k_g"))
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    grp.agg(sum(col("n_g")).as("n"), sum(col("k_g")).as("k"),
        gather((col("k_g") * (col("n_g") - col("k_g"))).cast("double") /
          col("n_g").cast("double")).as("bsum"))
      .select(col("n"), col("k"),
        round(col("bsum").cast("double") / col("n").cast("double"), 6).as("brier"),
        round((col("k") * (col("n") - col("k"))).cast("double") /
          (col("n") * col("n")).cast("double"), 6).as("uncertainty"),
        round((col("k") * (col("n") - col("k"))).cast("double") /
            (col("n") * col("n")).cast("double") -
          col("bsum").cast("double") / col("n").cast("double"), 6).as("resolution"))
  }

  private[graft] lazy val anBrierSql =
    s"""WITH lab AS ($churnLabeledSql),
       |g AS (SELECT c_mktsegment, COUNT(*) AS n_g, CAST(SUM(g1) AS BIGINT) AS k_g
       |      FROM lab GROUP BY 1),
       |t AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(k_g) AS BIGINT) AS k,
       |        CAST(SUM(CAST(CAST(k_g * (n_g - k_g) AS DOUBLE) / CAST(n_g AS DOUBLE)
       |          AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS bsum
       |      FROM g)
       |SELECT n, k,
       |  ROUND(CAST(bsum AS DOUBLE) / CAST(n AS DOUBLE), 6) AS brier,
       |  ROUND(CAST(k * (n - k) AS DOUBLE) / CAST(n * n AS DOUBLE), 6) AS uncertainty,
       |  ROUND(CAST(k * (n - k) AS DOUBLE) / CAST(n * n AS DOUBLE)
       |    - CAST(bsum AS DOUBLE) / CAST(n AS DOUBLE), 6) AS resolution
       |FROM t""".stripMargin

  /** Calibration / reliability table: 10 equal-width score bins over the
    * exact [min, max] cent range via integer bucket arithmetic (bin =
    * (v−min)·10 div (range+1) — no float boundary), per-bin mean score
    * and observed churn rate as single IEEE divisions of exact integers.
    * The per-bin view an_brier's one-number summary hides. */
  private[graft] def anCalibration(s: SparkSession, dir: String): DataFrame = {
    val lab = churnLabeled(s, dir)
    val bounds = lab.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    lab.crossJoin(broadcast(bounds))
      .withColumn("bin", expr("((v - mn) * 10) div (mx - mn + 1)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_bin"), sum(col("v")).as("sv"), sum(col("g1")).as("k_bin"))
      .select(col("bin"), col("n_bin"),
        (col("sv").cast("double") / col("n_bin").cast("double") / 100.0).as("mean_score"),
        (col("k_bin").cast("double") / col("n_bin").cast("double")).as("churn_rate"))
      .orderBy(col("bin"))
  }

  private[graft] lazy val anCalibrationSql =
    s"""WITH lab AS ($churnLabeledSql),
       |b AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM lab)
       |SELECT ((v - mn) * 10) // (mx - mn + 1) AS bin, COUNT(*) AS n_bin,
       |  CAST(CAST(SUM(v) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0 AS mean_score,
       |  CAST(CAST(SUM(g1) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS churn_rate
       |FROM lab CROSS JOIN b GROUP BY 1 ORDER BY 1""".stripMargin

  /** Information gain of the market segment for churn: IG = H(Y) −
    * H(Y|X) in the single-fraction ln form (N·lnN − Σn_y·ln n_y −
    * Σn_x·ln n_x + Σn_xy·ln n_xy)/N — every count exact, every ln
    * correctly rounded, terms gathered in DECIMAL(38,18), ROUND 6 at
    * emission for the libm ulp (the an_entropy discipline). The
    * feature-selection primitive next to an_stump_split's Gini. */
  private[graft] def anInfoGain(s: SparkSession, dir: String): DataFrame = {
    val lab = churnLabeled(s, dir)
    // xy is |segments|×2 cells (key-domain-bounded) with THREE consumers
    // (both marginals + the joint term) — stabilize once so the
    // data-sized churn aggregation runs once, not per consumer
    val xy = graft.operators.Checkpoints.stabilizeLazy(
      lab.groupBy(col("c_mktsegment"), col("g1")).agg(count(lit(1)).as("n_xy")))
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    def nln(c: Column) = c.cast("double") * log(c.cast("double"))
    val tx = xy.groupBy(col("c_mktsegment")).agg(sum(col("n_xy")).as("n_x"))
      .agg(gather(nln(col("n_x"))).as("sx"), sum(col("n_x")).as("n"))
    val ty = xy.groupBy(col("g1")).agg(sum(col("n_xy")).as("n_y"))
      .agg(gather(nln(col("n_y"))).as("sy"))
    val txy = xy.agg(gather(nln(col("n_xy"))).as("sxy"))
    tx.crossJoin(ty).crossJoin(txy)
      .select(col("n"),
        round((nln(col("n")).cast("decimal(38,18)") - col("sy")).cast("double") /
          col("n").cast("double"), 6).as("h_y"),
        round((nln(col("n")).cast("decimal(38,18)") - col("sy") - col("sx") + col("sxy"))
          .cast("double") / col("n").cast("double"), 6).as("info_gain"))
      .withColumn("h_y_given_x", round(col("h_y") - col("info_gain"), 6))
  }

  private[graft] lazy val anInfoGainSql =
    s"""WITH lab AS ($churnLabeledSql),
       |xy AS (SELECT c_mktsegment, g1, COUNT(*) AS n_xy FROM lab GROUP BY 1, 2),
       |tx AS (SELECT CAST(SUM(CAST(CAST(n_x AS DOUBLE) * ln(CAST(n_x AS DOUBLE))
       |           AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sx,
       |         CAST(SUM(n_x) AS BIGINT) AS n
       |       FROM (SELECT c_mktsegment, CAST(SUM(n_xy) AS BIGINT) AS n_x FROM xy GROUP BY 1)),
       |ty AS (SELECT CAST(SUM(CAST(CAST(n_y AS DOUBLE) * ln(CAST(n_y AS DOUBLE))
       |           AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sy
       |       FROM (SELECT g1, CAST(SUM(n_xy) AS BIGINT) AS n_y FROM xy GROUP BY 1)),
       |txy AS (SELECT CAST(SUM(CAST(CAST(n_xy AS DOUBLE) * ln(CAST(n_xy AS DOUBLE))
       |           AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sxy FROM xy),
       |f AS (SELECT n,
       |        ROUND(CAST(CAST(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) AS DECIMAL(38,18)) - sy
       |          AS DOUBLE) / CAST(n AS DOUBLE), 6) AS h_y,
       |        ROUND(CAST(CAST(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) AS DECIMAL(38,18))
       |          - sy - sx + sxy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS info_gain
       |      FROM tx CROSS JOIN ty CROSS JOIN txy)
       |SELECT n, h_y, info_gain, ROUND(h_y - info_gain, 6) AS h_y_given_x FROM f""".stripMargin

  /** Odds ratio for the 2×2 (exposure: balance ≥ $5000) × (outcome:
    * churn) table with the Woolf log-CI: OR = (a·d)/(b·c) as ONE IEEE
    * division of exact integer cross-products (DECIMAL(38,0) — a·d
    * overflows BIGINT past ~3e9-row cells), CI bounds through ln/sqrt
    * ROUND 6. */
  private[graft] def anOddsRatio(s: SparkSession, dir: String): DataFrame = {
    val cells = churnLabeled(s, dir)
      .withColumn("e", (col("v") >= 500000L).cast("int"))
      .agg(
        sum(when(col("e") === 1 && col("g1") === 1, 1L).otherwise(0L)).as("a"),
        sum(when(col("e") === 1 && col("g1") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(col("e") === 0 && col("g1") === 1, 1L).otherwise(0L)).as("c"),
        sum(when(col("e") === 0 && col("g1") === 0, 1L).otherwise(0L)).as("d"))
    val se = sqrt(lit(1.0) / col("a") + lit(1.0) / col("b") +
      lit(1.0) / col("c") + lit(1.0) / col("d"))
    val lnOr = log((col("a").cast("decimal(38,0)") * col("d").cast("decimal(38,0)")).cast("double") /
      (col("b").cast("decimal(38,0)") * col("c").cast("decimal(38,0)")).cast("double"))
    cells.select(col("a"), col("b"), col("c"), col("d"),
      ((col("a").cast("decimal(38,0)") * col("d").cast("decimal(38,0)")).cast("double") /
        (col("b").cast("decimal(38,0)") * col("c").cast("decimal(38,0)")).cast("double")).as("odds_ratio"),
      round(lnOr - lit(1.96) * se, 6).as("ln_ci_lo"),
      round(lnOr + lit(1.96) * se, 6).as("ln_ci_hi"))
  }

  private[graft] lazy val anOddsRatioSql =
    s"""WITH lab AS ($churnLabeledSql),
       |t AS (SELECT
       |  CAST(SUM(CASE WHEN v >= 500000 AND g1 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
       |  CAST(SUM(CASE WHEN v >= 500000 AND g1 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
       |  CAST(SUM(CASE WHEN v < 500000 AND g1 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
       |  CAST(SUM(CASE WHEN v < 500000 AND g1 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
       |  FROM lab)
       |SELECT a, b, c, d,
       |  CAST(CAST(a AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0)) AS DOUBLE)
       |    / CAST(CAST(b AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)) AS DOUBLE) AS odds_ratio,
       |  ROUND(ln(CAST(CAST(a AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0)) AS DOUBLE)
       |    / CAST(CAST(b AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)) AS DOUBLE))
       |    - 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d), 6) AS ln_ci_lo,
       |  ROUND(ln(CAST(CAST(a AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0)) AS DOUBLE)
       |    / CAST(CAST(b AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)) AS DOUBLE))
       |    + 1.96 * sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d), 6) AS ln_ci_hi
       |FROM t""".stripMargin

  /** Relative risk + risk difference on the same 2×2: RR =
    * a(c+d)/(c(a+b)) as one division of exact DECIMAL(38,0)
    * cross-products; the risk difference is two exactly-rounded
    * divisions and one subtraction (deterministic — both operands are
    * fully determined doubles). Epidemiology's additive companion to
    * an_odds_ratio's multiplicative view. */
  private[graft] def anRiskRatio(s: SparkSession, dir: String): DataFrame =
    churnLabeled(s, dir)
      .withColumn("e", (col("v") >= 500000L).cast("int"))
      .agg(
        sum(when(col("e") === 1 && col("g1") === 1, 1L).otherwise(0L)).as("a"),
        sum(when(col("e") === 1 && col("g1") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(col("e") === 0 && col("g1") === 1, 1L).otherwise(0L)).as("c"),
        sum(when(col("e") === 0 && col("g1") === 0, 1L).otherwise(0L)).as("d"))
      .select(col("a"), col("b"), col("c"), col("d"),
        ((col("a").cast("decimal(38,0)") * (col("c") + col("d")).cast("decimal(38,0)")).cast("double") /
          (col("c").cast("decimal(38,0)") * (col("a") + col("b")).cast("decimal(38,0)")).cast("double"))
          .as("relative_risk"),
        (col("a").cast("double") / (col("a") + col("b")).cast("double") -
          col("c").cast("double") / (col("c") + col("d")).cast("double")).as("risk_diff"))

  private[graft] lazy val anRiskRatioSql =
    s"""WITH lab AS ($churnLabeledSql),
       |t AS (SELECT
       |  CAST(SUM(CASE WHEN v >= 500000 AND g1 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
       |  CAST(SUM(CASE WHEN v >= 500000 AND g1 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
       |  CAST(SUM(CASE WHEN v < 500000 AND g1 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
       |  CAST(SUM(CASE WHEN v < 500000 AND g1 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
       |  FROM lab)
       |SELECT a, b, c, d,
       |  CAST(CAST(a AS DECIMAL(38,0)) * CAST(c + d AS DECIMAL(38,0)) AS DOUBLE)
       |    / CAST(CAST(c AS DECIMAL(38,0)) * CAST(a + b AS DECIMAL(38,0)) AS DOUBLE) AS relative_risk,
       |  CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE)
       |    - CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE) AS risk_diff
       |FROM t""".stripMargin

  /** Cochran–Armitage trend test across four ordered balance bands
    * (scores 0..3): χ²_trend in the fully cross-multiplied integer form
    * (N·Σsk − K·Σsn)²·(N−1) / [K(N−K)(N·Σs²n − (Σsn)²)] — every product
    * an exact DECIMAL(38,0), ONE IEEE division at emission. The
    * dose-response test an_chi2_drift's unordered χ² cannot see. */
  private[graft] def anCochranArmitage(s: SparkSession, dir: String): DataFrame = {
    val banded = churnLabeled(s, dir)
      .withColumn("sc", least(expr("greatest(v, 0) div 250000"), lit(3L)))
    val d = (c: Column) => c.cast("decimal(38,0)")
    banded
      .agg(count(lit(1)).as("n"), sum(col("g1")).as("k"),
        sum(col("sc") * col("g1")).as("sk"),
        sum(col("sc")).as("sn"),
        sum(col("sc") * col("sc")).as("s2n"))
      .select(col("n"), col("k"),
        ((d(col("n")) * d(col("sk")) - d(col("k")) * d(col("sn"))) *
          (d(col("n")) * d(col("sk")) - d(col("k")) * d(col("sn"))) *
          d(col("n") - 1)).cast("double")
          ./((d(col("k")) * d(col("n") - col("k")) *
            (d(col("n")) * d(col("s2n")) - d(col("sn")) * d(col("sn")))).cast("double"))
          .as("trend_chi2"))
  }

  private[graft] lazy val anCochranArmitageSql =
    s"""WITH lab AS ($churnLabeledSql),
       |b AS (SELECT g1, LEAST(GREATEST(v, 0) // 250000, 3) AS sc FROM lab),
       |t AS (SELECT COUNT(*) AS n, CAST(SUM(g1) AS BIGINT) AS k,
       |        CAST(SUM(sc * g1) AS BIGINT) AS sk, CAST(SUM(sc) AS BIGINT) AS sn,
       |        CAST(SUM(sc * sc) AS BIGINT) AS s2n
       |      FROM b)
       |SELECT n, k,
       |  CAST((CAST(n AS DECIMAL(38,0)) * CAST(sk AS DECIMAL(38,0))
       |      - CAST(k AS DECIMAL(38,0)) * CAST(sn AS DECIMAL(38,0)))
       |    * (CAST(n AS DECIMAL(38,0)) * CAST(sk AS DECIMAL(38,0))
       |      - CAST(k AS DECIMAL(38,0)) * CAST(sn AS DECIMAL(38,0)))
       |    * CAST(n - 1 AS DECIMAL(38,0)) AS DOUBLE)
       |  / CAST(CAST(k AS DECIMAL(38,0)) * CAST(n - k AS DECIMAL(38,0))
       |    * (CAST(n AS DECIMAL(38,0)) * CAST(s2n AS DECIMAL(38,0))
       |      - CAST(sn AS DECIMAL(38,0)) * CAST(sn AS DECIMAL(38,0))) AS DOUBLE) AS trend_chi2
       |FROM t""".stripMargin

  /** Paired t-test on per-customer 1996-vs-1997 spend (cents; a year
    * without orders contributes 0): t = Σd·√(n−1) / √(n·Σd² − (Σd)²)
    * over exact DECIMAL sums — two correctly-rounded sqrts, one
    * multiply, one division, same expression tree both engines. The
    * within-subject complement to an_welch_ttest. */
  private[graft] def anPairedTtest(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(s, dir)
      .withColumn("yr", year(col("o_orderdate")))
      .filter(col("yr").isin(1996, 1997))
      .groupBy(col("o_custkey"))
      .agg(
        (sum(when(col("yr") === 1996, col("o_totalprice")).otherwise(0.0)
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100).cast("bigint").as("s96"),
        (sum(when(col("yr") === 1997, col("o_totalprice")).otherwise(0.0)
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100).cast("bigint").as("s97"))
      .withColumn("dc", col("s97") - col("s96"))
    spend.agg(count(lit(1)).as("n"),
        sum(col("dc").cast("decimal(38,0)")).as("sd"),
        sum(col("dc").cast("decimal(38,0)") * col("dc").cast("decimal(38,0)")).as("sd2"))
      .select(col("n"),
        (col("sd").cast("double") / col("n").cast("double") / 100.0).as("mean_diff"),
        (col("sd").cast("double") * sqrt((col("n") - 1).cast("double")) /
          sqrt((col("n").cast("decimal(38,0)") * col("sd2") - col("sd") * col("sd"))
            .cast("double"))).as("t_stat"))
  }

  private[graft] lazy val anPairedTtestSql =
    """WITH sp AS (SELECT o_custkey,
      |    CAST(ROUND(SUM(CASE WHEN year(o_orderdate) = 1996 THEN CAST(o_totalprice AS DECIMAL(24,8)) ELSE 0 END), 2) * 100 AS BIGINT) AS s96,
      |    CAST(ROUND(SUM(CASE WHEN year(o_orderdate) = 1997 THEN CAST(o_totalprice AS DECIMAL(24,8)) ELSE 0 END), 2) * 100 AS BIGINT) AS s97
      |  FROM orders WHERE year(o_orderdate) IN (1996, 1997) GROUP BY o_custkey),
      |t AS (SELECT COUNT(*) AS n,
      |        CAST(SUM(CAST(s97 - s96 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sd,
      |        CAST(SUM(CAST(s97 - s96 AS DECIMAL(38,0)) * CAST(s97 - s96 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sd2
      |      FROM sp)
      |SELECT n,
      |  CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_diff,
      |  CAST(sd AS DOUBLE) * sqrt(CAST(n - 1 AS DOUBLE))
      |    / sqrt(CAST(CAST(n AS DECIMAL(38,0)) * sd2 - sd * sd AS DOUBLE)) AS t_stat
      |FROM t""".stripMargin

  /** Partial correlation of daily revenue and daily line volume
    * controlling for daily order breadth (distinct orders): the three
    * pairwise Pearson r from ONE exact decimal moment pass over the day
    * spine, partial r = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)),
    * everything after the exact sums a shared IEEE expression tree,
    * ROUND 6 at emission. Disentangles "more orders" from "bigger
    * lines" in the revenue–volume relationship. */
  private[graft] def anPartialCorr(s: SparkSession, dir: String): DataFrame = {
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
    m.withColumn("r_xy", r(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy")))
      .withColumn("r_xz", r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz")))
      .withColumn("r_yz", r(col("syz"), col("sy"), col("sz"), col("syy"), col("szz")))
      .select(col("n").as("n_days"),
        round(col("r_xy"), 6).as("r_xy"),
        round(col("r_xz"), 6).as("r_xz"),
        round(col("r_yz"), 6).as("r_yz"),
        round((col("r_xy") - col("r_xz") * col("r_yz")) /
          sqrt((lit(1.0) - col("r_xz") * col("r_xz")) *
            (lit(1.0) - col("r_yz") * col("r_yz"))), 6).as("r_xy_given_z"))
  }

  private[graft] lazy val anPartialCorrSql =
    """WITH daily AS (SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS x,
      |    COUNT(*) AS y, COUNT(DISTINCT l_orderkey) AS z
      |  FROM lineitem GROUP BY 1),
      |m AS (SELECT COUNT(*) AS n,
      |  CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |  CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
      |  CAST(SUM(CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sz,
      |  CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
      |  CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
      |  CAST(SUM(CAST(z AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS szz,
      |  CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
      |  CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxz,
      |  CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(z AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syz
      |  FROM daily),
      |rr AS (SELECT n,
      |  CAST(n * sxy - sx * sy AS DOUBLE)
      |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r_xy,
      |  CAST(n * sxz - sx * sz AS DOUBLE)
      |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * szz - sz * sz AS DOUBLE))) AS r_xz,
      |  CAST(n * syz - sy * sz AS DOUBLE)
      |    / (sqrt(CAST(n * syy - sy * sy AS DOUBLE)) * sqrt(CAST(n * szz - sz * sz AS DOUBLE))) AS r_yz
      |  FROM m)
      |SELECT n AS n_days, ROUND(r_xy, 6) AS r_xy, ROUND(r_xz, 6) AS r_xz,
      |  ROUND(r_yz, 6) AS r_yz,
      |  ROUND((r_xy - r_xz * r_yz)
      |    / sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz)), 6) AS r_xy_given_z
      |FROM rr""".stripMargin

  /** Cross-correlation function (lags 0..7) between daily revenue and
    * daily line volume: a bounded self-join of the day spine on d = d+lag
    * (8 tiny equi-joins via one lag column explode), per-lag Pearson r
    * from exact decimal moment sums, ROUND 6. Which lead/lag structure
    * an_autocorr (same-series) can't show. */
  private[graft] def anCcf(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100).cast("bigint").as("x"),
        count(lit(1)).as("y"))
      .withColumn("d",
        datediff(col("day").cast("date"), lit("1992-01-01").cast("date")))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val paired = daily.select(col("d"), col("x"))
      .withColumn("lag", explode(sequence(lit(0), lit(7))))
      .join(daily.select(col("d").as("d2"), col("y")), col("d2") === col("d") + col("lag"))
    paired.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(d38(col("x"))).as("sx"), sum(d38(col("y"))).as("sy"),
        sum(d38(col("x")) * d38(col("x"))).as("sxx"),
        sum(d38(col("y")) * d38(col("y"))).as("syy"),
        sum(d38(col("x")) * d38(col("y"))).as("sxy"))
      .select(col("lag"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))), 6)
          .as("ccf"))
      .orderBy(col("lag"))
  }

  private[graft] lazy val anCcfSql =
    """WITH daily AS (SELECT
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS x,
      |    COUNT(*) AS y,
      |    date_diff('day', DATE '1992-01-01', CAST(date_trunc('day', l_shipdate) AS DATE)) AS d
      |  FROM lineitem GROUP BY date_trunc('day', l_shipdate)),
      |p AS (SELECT l.lag, a.x, b.y
      |      FROM daily a CROSS JOIN (SELECT unnest(range(0, 8)) AS lag) l
      |      JOIN daily b ON b.d = a.d + l.lag),
      |m AS (SELECT lag, COUNT(*) AS n,
      |  CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |  CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
      |  CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
      |  CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
      |  CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy
      |  FROM p GROUP BY lag)
      |SELECT lag, n,
      |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
      |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS ccf
      |FROM m ORDER BY lag""".stripMargin

  /** Rescaled-range (Hurst) analysis of daily revenue at window sizes
    * {8,16,32}: within each complete window the mean-adjusted cumulative
    * deviation is kept EXACT by scaling through w (D_k = w·prefix_k −
    * k·S, a DECIMAL(38,0) integer), so R/S = (maxD − minD)/√(w·Q − S²)
    * is two exact operands through one correctly-rounded sqrt and
    * division, ROUND 6 per window; the Hurst exponent is the 3-point
    * ln-ln OLS slope over the per-size mean R/S. H≈0.5 = random walk,
    * H>0.5 = trending — the long-memory screen beside an_autocorr. */
  private[graft] def anHurst(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyRevenueSpine(s, dir)
      .withColumn("idx", row_number().over(Window.orderBy(col("d"))).cast("long"))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val perW = Seq(8, 16, 32).map { w =>
      val wl = lit(w.toLong)
      val win = Window.partitionBy(col("win_id"))
      val winOrd = Window.partitionBy(col("win_id")).orderBy(col("idx"))
        .rowsBetween(Window.unboundedPreceding, 0)
      daily
        .withColumn("win_id", expr(s"(idx - 1) div $w"))
        .withColumn("k", col("idx") - col("win_id") * wl)
        .withColumn("cnt", count(lit(1)).over(win))
        .filter(col("cnt") === wl)
        .withColumn("sw", sum(d38(col("rev_c"))).over(win))
        .withColumn("qw", sum(d38(col("rev_c")) * d38(col("rev_c"))).over(win))
        .withColumn("pref", sum(d38(col("rev_c"))).over(winOrd))
        .withColumn("dk", col("pref") * wl - d38(col("k")) * col("sw"))
        .groupBy(col("win_id"))
        .agg(max(col("dk")).as("mx"), min(col("dk")).as("mn"),
          max(col("sw")).as("sw"), max(col("qw")).as("qw"))
        .select(lit(w.toLong).as("w"),
          round((col("mx") - col("mn")).cast("double") /
            sqrt((col("qw") * wl - col("sw") * col("sw")).cast("double")), 6).as("rs"))
    }.reduce(_.unionAll(_))
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    val byW = perW.groupBy(col("w"))
      .agg(count(lit(1)).as("n_windows"),
        round(gather(col("rs")).cast("double") / count(lit(1)).cast("double"), 6).as("mean_rs"))
    val fit = byW.agg(count(lit(1)).as("np"),
        gather(log(col("w").cast("double"))).as("sx"),
        gather(log(col("mean_rs"))).as("sy"),
        gather(log(col("w").cast("double")) * log(col("w").cast("double"))).as("sxx"),
        gather(log(col("w").cast("double")) * log(col("mean_rs"))).as("sxy"))
      .select(round((col("np") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("np") * col("sxx") - col("sx") * col("sx")).cast("double"), 6).as("hurst"))
    byW.crossJoin(broadcast(fit)).orderBy(col("w"))
  }

  private[graft] lazy val anHurstSql = {
    def one(w: Int) =
      s"""SELECT CAST($w AS BIGINT) AS w, win_id,
         |  ROUND(CAST(MAX(dk) - MIN(dk) AS DOUBLE)
         |    / sqrt(CAST(MAX(qw) * $w - MAX(sw) * MAX(sw) AS DOUBLE)), 6) AS rs
         |FROM (
         |  SELECT win_id, k,
         |    SUM(CAST(rev_c AS DECIMAL(38,0))) OVER (PARTITION BY win_id) AS sw,
         |    SUM(CAST(rev_c AS DECIMAL(38,0)) * CAST(rev_c AS DECIMAL(38,0)))
         |      OVER (PARTITION BY win_id) AS qw,
         |    COUNT(*) OVER (PARTITION BY win_id) AS cnt,
         |    SUM(CAST(rev_c AS DECIMAL(38,0))) OVER (PARTITION BY win_id ORDER BY idx
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * $w
         |      - CAST(k AS DECIMAL(38,0)) *
         |        SUM(CAST(rev_c AS DECIMAL(38,0))) OVER (PARTITION BY win_id) AS dk
         |  FROM (SELECT rev_c, idx, (idx - 1) // $w AS win_id,
         |          idx - ((idx - 1) // $w) * $w AS k FROM di) x) y
         |WHERE cnt = $w GROUP BY win_id""".stripMargin
    s"""WITH daily AS ($dailySpineSql),
       |di AS (SELECT rev_c, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS idx FROM daily),
       |rsw AS (${Seq(8, 16, 32).map(one).mkString("\nUNION ALL\n")}),
       |byw AS (SELECT w, COUNT(*) AS n_windows,
       |    ROUND(CAST(CAST(SUM(CAST(rs AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 6) AS mean_rs
       |  FROM rsw GROUP BY w),
       |fit AS (SELECT ROUND(
       |    CAST(COUNT(*) * CAST(SUM(CAST(ln(CAST(w AS DOUBLE)) * ln(mean_rs) AS DECIMAL(38,18))) AS DECIMAL(38,18))
       |      - CAST(SUM(CAST(ln(CAST(w AS DOUBLE)) AS DECIMAL(38,18))) AS DECIMAL(38,18))
       |        * CAST(SUM(CAST(ln(mean_rs) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE)
       |    / CAST(COUNT(*) * CAST(SUM(CAST(ln(CAST(w AS DOUBLE)) * ln(CAST(w AS DOUBLE)) AS DECIMAL(38,18))) AS DECIMAL(38,18))
       |      - CAST(SUM(CAST(ln(CAST(w AS DOUBLE)) AS DECIMAL(38,18))) AS DECIMAL(38,18))
       |        * CAST(SUM(CAST(ln(CAST(w AS DOUBLE)) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS DOUBLE), 6) AS hurst
       |  FROM byw)
       |SELECT w, n_windows, mean_rs, hurst FROM byw CROSS JOIN fit ORDER BY w""".stripMargin
  }

  /** Interrupted time-series analysis at the 1998-07-01 intervention
    * (mid-range of the data's actual 1995–2001 shipdate span — a
    * boundary outside the span makes one segment silently empty, the
    * r8 hollow-window class, which the Round12Spec n_pre>0 guard now
    * pins): per-segment OLS of daily revenue on the day index from
    * exact DECIMAL moment sums, slopes and the level change at the
    * boundary evaluated in ONE shared expression tree, ROUND 6. The
    * causal-inference workhorse for policy changes without a control
    * group — an_did's cousin when there's only one series. */
  private[graft] def anIts(s: SparkSession, dir: String): DataFrame = {
    val daily = dailyRevenueSpine(s, dir)
      .withColumn("seg", when(col("day") < ts("1998-07-01"), "pre").otherwise("post"))
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val m = daily.groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(d38(col("d"))).as("sx"),
        sum(d38(col("rev_c"))).as("sy"),
        sum(d38(col("d")) * d38(col("d"))).as("sxx"),
        sum(d38(col("d")) * d38(col("rev_c"))).as("sxy"))
    def pick(c: String, seg: String) = max(when(col("seg") === seg, col(c)))
    val t0 = lit(2373.0) // datediff('1998-07-01','1992-01-01')
    val w = m.agg(
      pick("n", "pre").as("n_pre"), pick("n", "post").as("n_post"),
      pick("sx", "pre").as("sx1"), pick("sy", "pre").as("sy1"),
      pick("sxx", "pre").as("sxx1"), pick("sxy", "pre").as("sxy1"),
      pick("sx", "post").as("sx2"), pick("sy", "post").as("sy2"),
      pick("sxx", "post").as("sxx2"), pick("sxy", "post").as("sxy2"))
    def slope(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column) =
      (n * sxy - sx * sy).cast("double") / (n * sxx - sx * sx).cast("double")
    def level(n: Column, sx: Column, sy: Column, sl: Column) =
      (sy.cast("double") - sl * sx.cast("double")) / n.cast("double") + sl * t0
    val s1 = slope(col("n_pre"), col("sx1"), col("sy1"), col("sxx1"), col("sxy1"))
    val s2 = slope(col("n_post"), col("sx2"), col("sy2"), col("sxx2"), col("sxy2"))
    w.select(col("n_pre"), col("n_post"),
      round(s1 / 100.0, 6).as("slope_pre"),
      round(s2 / 100.0, 6).as("slope_post"),
      round((level(col("n_post"), col("sx2"), col("sy2"), s2) -
        level(col("n_pre"), col("sx1"), col("sy1"), s1)) / 100.0, 6).as("level_change"))
  }

  /** Chow structural-break test on the daily-revenue trend at the
    * fixed calendar split 1998-06-01 — the regression companion to
    * [[anChangepoint]]/[[anCusum]]'s level scans: did the SLOPE of the
    * revenue~time line change across the break, tested by
    * F = ((RSS_p − RSS_1 − RSS_2)/p) / ((RSS_1+RSS_2)/(n−2p)), p = 2.
    * One lineitem pass to the daily spine, one 2-group aggregate of
    * exact decimal power sums (x = epoch-day index, y = cents); the
    * pooled moments are the exact SUMS of the per-segment moments, so
    * the three RSS values come off one shared tree of centered moments
    * scaled by n (n·Σyy − (Σy)², never a float mean). Slopes ROUND 6
    * — the an_granger lesson generalized: the division is of exact
    * decimals, but once those pass 2^53 the two engines' int128→
    * binary64 input casts can round differently (observed one ulp at
    * sf1), so the unrounded single-division contract only holds below
    * that width; F is scale-free, ROUND 6.
    * WIDTH CONTRACT: n·Σy² at DECIMAL(38,0) holds to ~1e4× daily
    * revenue of the sf10-probed level (the an_gumbel class). */
  private[graft] def anChowTest(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val seg = dailyRevenueSpine(s, dir)
      .select((col("day").cast("date") >= lit("1998-06-01").cast("date"))
        .cast("long").as("g"),
        col("d").cast("long").as("x"), col("rev_c").as("y"))
    val gm = seg.groupBy("g").agg(count(lit(1)).as("n"),
      sum(d38(col("x"))).as("sx"),
      sum((d38(col("x")) * d38(col("x"))).cast("decimal(38,0)")).as("sxx"),
      sum(d38(col("y"))).as("sy"),
      sum((d38(col("y")) * d38(col("y"))).cast("decimal(38,0)")).as("syy"),
      sum((d38(col("x")) * d38(col("y"))).cast("decimal(38,0)")).as("sxy"))
    val w = gm.agg(
      max(when(col("g") === 0, col("n"))).as("n1"),
      max(when(col("g") === 1, col("n"))).as("n2"),
      max(when(col("g") === 0, col("sx"))).as("sx1"),
      max(when(col("g") === 1, col("sx"))).as("sx2"),
      max(when(col("g") === 0, col("sxx"))).as("sxx1"),
      max(when(col("g") === 1, col("sxx"))).as("sxx2"),
      max(when(col("g") === 0, col("sy"))).as("sy1"),
      max(when(col("g") === 1, col("sy"))).as("sy2"),
      max(when(col("g") === 0, col("syy"))).as("syy1"),
      max(when(col("g") === 1, col("syy"))).as("syy2"),
      max(when(col("g") === 0, col("sxy"))).as("sxy1"),
      max(when(col("g") === 1, col("sxy"))).as("sxy2"))
    def rss(n: Column, sx: Column, sxx: Column, sy: Column, syy: Column,
        sxy: Column): Column = {
      val sxxC = (d38(n) * sxx - sx * sx).cast("double")
      val sxyC = (d38(n) * sxy - sx * sy).cast("double")
      val syyC = (d38(n) * syy - sy * sy).cast("double")
      (syyC - sxyC * sxyC / sxxC) / n.cast("double")
    }
    def slope(n: Column, sx: Column, sxx: Column, sy: Column, sxy: Column): Column =
      (d38(n) * sxy - sx * sy).cast("double") / (d38(n) * sxx - sx * sx).cast("double")
    val r1 = rss(col("n1"), col("sx1"), col("sxx1"), col("sy1"), col("syy1"), col("sxy1"))
    val r2 = rss(col("n2"), col("sx2"), col("sxx2"), col("sy2"), col("syy2"), col("sxy2"))
    val rp = rss(col("n1") + col("n2"), col("sx1") + col("sx2"),
      col("sxx1") + col("sxx2"), col("sy1") + col("sy2"),
      col("syy1") + col("syy2"), col("sxy1") + col("sxy2"))
    w.select(col("n1"), col("n2"),
      round(slope(col("n1"), col("sx1"), col("sxx1"), col("sy1"), col("sxy1")), 6).as("slope1_c"),
      round(slope(col("n2"), col("sx2"), col("sxx2"), col("sy2"), col("sxy2")), 6).as("slope2_c"),
      round(((rp - r1 - r2) / lit(2.0)) /
        ((r1 + r2) / (col("n1") + col("n2") - 4).cast("double")), 6).as("f_stat"))
  }

  private[graft] lazy val anChowTestSql = {
    def mom(g: Int, c: String, suffix: String) =
      s"MAX(CASE WHEN g = $g THEN $c END) AS $c$suffix"
    def rss(n: String, sx: String, sxx: String, sy: String, syy: String, sxy: String) =
      s"""((CAST(CAST($n AS DECIMAL(38,0)) * $syy - $sy * $sy AS DOUBLE)
         |  - CAST(CAST($n AS DECIMAL(38,0)) * $sxy - $sx * $sy AS DOUBLE)
         |    * CAST(CAST($n AS DECIMAL(38,0)) * $sxy - $sx * $sy AS DOUBLE)
         |    / CAST(CAST($n AS DECIMAL(38,0)) * $sxx - $sx * $sx AS DOUBLE))
         | / CAST($n AS DOUBLE))""".stripMargin
    def slope(n: String, sx: String, sxx: String, sy: String, sxy: String) =
      s"""(CAST(CAST($n AS DECIMAL(38,0)) * $sxy - $sx * $sy AS DOUBLE)
         | / CAST(CAST($n AS DECIMAL(38,0)) * $sxx - $sx * $sx AS DOUBLE))""".stripMargin
    val r1 = rss("n1", "sx1", "sxx1", "sy1", "syy1", "sxy1")
    val r2 = rss("n2", "sx2", "sxx2", "sy2", "syy2", "sxy2")
    val rp = rss("(n1 + n2)", "(sx1 + sx2)", "(sxx1 + sxx2)", "(sy1 + sy2)",
      "(syy1 + syy2)", "(sxy1 + sxy2)")
    s"""WITH daily AS (SELECT date_trunc('day', l_shipdate) AS day,
       |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rev_c
       |  FROM lineitem GROUP BY 1),
       |seg AS (SELECT CASE WHEN CAST(day AS DATE) >= DATE '1998-06-01' THEN 1 ELSE 0 END AS g,
       |    CAST(date_diff('day', DATE '1992-01-01', CAST(day AS DATE)) AS BIGINT) AS x,
       |    rev_c AS y
       |  FROM daily),
       |gm AS (SELECT g, COUNT(*) AS n,
       |    CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
       |    CAST(SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
       |    CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
       |    CAST(SUM(CAST(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy,
       |    CAST(SUM(CAST(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy
       |  FROM seg GROUP BY g),
       |w AS (SELECT ${mom(0, "n", "1")}, ${mom(1, "n", "2")},
       |    ${mom(0, "sx", "1")}, ${mom(1, "sx", "2")},
       |    ${mom(0, "sxx", "1")}, ${mom(1, "sxx", "2")},
       |    ${mom(0, "sy", "1")}, ${mom(1, "sy", "2")},
       |    ${mom(0, "syy", "1")}, ${mom(1, "syy", "2")},
       |    ${mom(0, "sxy", "1")}, ${mom(1, "sxy", "2")}
       |  FROM gm)
       |SELECT n1, n2,
       |  ROUND(${slope("n1", "sx1", "sxx1", "sy1", "sxy1")}, 6) AS slope1_c,
       |  ROUND(${slope("n2", "sx2", "sxx2", "sy2", "sxy2")}, 6) AS slope2_c,
       |  ROUND((($rp - $r1 - $r2) / 2.0)
       |    / (($r1 + $r2) / CAST(n1 + n2 - 4 AS DOUBLE)), 6) AS f_stat
       |FROM w""".stripMargin
  }

  /** James–Stein (empirical-Bayes) shrinkage of per-nation mean
    * balances toward the grand mean — the estimator that DOMINATES
    * raw group means in total squared error once k ≥ 4 (Stein's
    * paradox), and the principled answer to "this nation has 12
    * customers, do I trust its mean?": ĉ = max(0, 1 − (k−3)·v̄/SSB)
    * with v̄ the averaged sampling variance σ̂²·mean(1/n_g) from the
    * pooled within-group variance. One corpus pass to per-group exact
    * decimal power sums, one k-sized gather (deviations, 1/n_g terms
    * DECIMAL(38,18)); raw and shrunk means emit ROUND 6 in dollars. */
  private[graft] def anJamesStein(s: SparkSession, dir: String): DataFrame = {
    val d38 = (c: Column) => c.cast("decimal(38,0)")
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val g = Tables.customer(s, dir)
      .select(col("c_nationkey").as("nk"),
        (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
      .groupBy("nk")
      .agg(count(lit(1)).as("n_g"), sum(d38(col("v"))).as("s1"),
        sum((d38(col("v")) * d38(col("v"))).cast("decimal(38,0)")).as("s2"))
    val tot = g.agg(count(lit(1)).as("k"), sum("n_g").as("n"), sum("s1").as("s"))
    val gm = g.crossJoin(broadcast(tot))
      .select(col("nk"), col("n_g"), col("k"), col("n"),
        (col("s1").cast("double") / col("n_g").cast("double")).as("raw"),
        (col("s").cast("double") / col("n").cast("double")).as("grand"),
        (col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") /
            col("n_g").cast("double")).as("wss"))
    val cF = gm.agg(max(col("k")).as("k"), max(col("n")).as("n"),
        sum(d18(col("wss"))).as("wss_sum"),
        sum(d18((col("raw") - col("grand")) * (col("raw") - col("grand")))).as("ssb"),
        sum(d18(lit(1.0) / col("n_g").cast("double"))).as("sinv"))
      .select(greatest(lit(0.0), lit(1.0) -
        (col("k") - 3).cast("double") *
          ((col("wss_sum").cast("double") / (col("n") - col("k")).cast("double")) *
            (col("sinv").cast("double") / col("k").cast("double"))) /
          col("ssb").cast("double")).as("c"))
    gm.crossJoin(broadcast(cF))
      .select(col("nk").as("c_nationkey"), col("n_g"),
        round(col("raw") / 100.0, 6).as("raw_mean"),
        round((col("grand") + col("c") * (col("raw") - col("grand"))) / 100.0, 6)
          .as("js_mean"),
        round(col("c"), 6).as("shrink_c"))
      .orderBy("c_nationkey")
  }

  private[graft] lazy val anJamesSteinSql =
    """WITH b AS (SELECT c_nationkey AS nk,
      |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM customer),
      |g AS (SELECT nk, COUNT(*) AS n_g,
      |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
      |    CAST(SUM(CAST(CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s2
      |  FROM b GROUP BY nk),
      |t AS (SELECT COUNT(*) AS k, CAST(SUM(n_g) AS BIGINT) AS n,
      |    CAST(SUM(s1) AS DECIMAL(38,0)) AS s FROM g),
      |gm AS (SELECT nk, n_g, k, n,
      |    CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE) AS raw,
      |    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS grand,
      |    CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE) AS wss
      |  FROM g CROSS JOIN t),
      |c AS (SELECT greatest(0.0, 1.0 -
      |      CAST(MAX(k) - 3 AS DOUBLE)
      |      * ((CAST(SUM(CAST(wss AS DECIMAL(38,18))) AS DOUBLE)
      |          / CAST(MAX(n) - MAX(k) AS DOUBLE))
      |         * (CAST(SUM(CAST(1.0 / CAST(n_g AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE)
      |            / CAST(MAX(k) AS DOUBLE)))
      |      / CAST(SUM(CAST((raw - grand) * (raw - grand) AS DECIMAL(38,18))) AS DOUBLE)) AS c
      |  FROM gm)
      |SELECT nk AS c_nationkey, n_g,
      |  ROUND(raw / 100.0, 6) AS raw_mean,
      |  ROUND((grand + c * (raw - grand)) / 100.0, 6) AS js_mean,
      |  ROUND(c, 6) AS shrink_c
      |FROM gm CROSS JOIN c
      |ORDER BY c_nationkey""".stripMargin
}

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
private[graft] trait SparkEntryAn1 { this: SparkEntry.type =>


  /** Time-series resample with gap filling: the full hourly spine
    * (sequence + explode × distinct series) left-joins the observed
    * aggregate; missing hours fill with zeros. */
  private[graft] def anResample(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
    val bounds = hourly.agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("hour"))
      .crossJoin(hourly.select(col("event_type")).distinct())
    spine.join(hourly, Seq("hour", "event_type"), "left")
      .select(col("hour"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("total_value"), lit(0.0)).as("total_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  private[graft] lazy val anResampleSql =
    s"""WITH hourly AS (
       |  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n,
       |    ${moneySumSql("value")} AS total_value
       |  FROM events GROUP BY 1, 2),
       |spine AS (
       |  SELECT unnest(generate_series((SELECT MIN(hour) FROM hourly),
       |                                (SELECT MAX(hour) FROM hourly),
       |                                INTERVAL 1 HOUR)) AS hour),
       |grid AS (SELECT s.hour, t.event_type
       |         FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM hourly) t)
       |SELECT g.hour, g.event_type,
       |  COALESCE(h.n, 0) AS n, COALESCE(h.total_value, 0.0) AS total_value
       |FROM grid g LEFT JOIN hourly h
       |  ON g.hour = h.hour AND g.event_type = h.event_type
       |ORDER BY g.hour, g.event_type""".stripMargin

  /** Raw sketch aggregates (HLL++ distinct, approx median) — the
    * estimates consumers use; partition-merge-order safe (HLL registers
    * merge by max) but not DuckDB-replayable, so the [q] emission is
    * the certified frame in [[anApproxStats]]. */
  private[graft] def approxStatsRaw(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).agg(
      approx_count_distinct(col("o_custkey")).as("approx_customers"),
      percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("approx_median_price"),
      count(lit(1)).as("n"))

  /** Sketch aggregates promoted from rows-only to a SELF-CERTIFIED SQL
    * oracle (r17 verdict #7 — the an_kll_rank treatment): the
    * estimates from [[approxStatsRaw]] are ranked against the EXACT
    * statistics inside the same frame, and what lands is the exact
    * numbers plus in-bound booleans. DuckDB replays the exact half and
    * asserts the booleans literally TRUE, so a sketch drifting outside
    * its envelope — HLL 4·rsd = 0.2 relative; percentile_approx
    * accuracy=1000 → 1/1000 rank fraction, tie-interval tolerant (the
    * estimate's rank interval [below, atOrBelow] vs target n/2) —
    * hash-FAILS the round instead of hiding in a rows-only check.
    * Measured error magnitudes still land per-round via ErrorEnvelopes
    * (`sketch_error_envelopes.json`). */
  private[graft] def anApproxStats(s: SparkSession, dir: String): DataFrame = {
    val est = approxStatsRaw(s, dir)
      .select(col("approx_customers").as("ad"), col("approx_median_price").as("am"))
    val t = col("n").cast("double") * 0.5
    Tables.orders(s, dir).crossJoin(broadcast(est))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("exact_distinct"),
        max(col("ad")).as("ad"), max(col("am")).as("am"),
        sum((col("o_totalprice") < col("am")).cast("long")).as("below"),
        sum((col("o_totalprice") <= col("am")).cast("long")).as("ato"))
      .select(col("n"), col("exact_distinct"),
        (abs(col("ad") - col("exact_distinct")).cast("double") /
          col("exact_distinct").cast("double") <= 0.2).as("distinct_in_bound"),
        (greatest(col("below").cast("double") - t,
          t - col("ato").cast("double"), lit(0.0)) /
          col("n").cast("double") <= 0.001).as("median_rank_in_bound"))
  }

  private[graft] lazy val anApproxStatsSql =
    """SELECT count(*) AS n, count(DISTINCT o_custkey) AS exact_distinct,
      |  true AS distinct_in_bound, true AS median_rank_in_bound
      |FROM orders""".stripMargin

  /** Second-moment statistics (stddev, correlation) computed from EXACT
    * decimal power sums rather than Spark's streaming co-moments, whose
    * low bits depend on partition merge order — same closed formulas on
    * both engines, bit-identical results. */
  private[graft] def anStatsMoments(s: SparkSession, dir: String): DataFrame = {
    def dsum(c: Column) = sum(c.cast("decimal(38,8)")).cast("double")
    val x = col("l_quantity"); val y = col("l_extendedprice")
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        dsum(x).as("sx"), dsum(y).as("sy"),
        dsum(x * x).as("sxx"), dsum(y * y).as("syy"), dsum(x * y).as("sxy"))
      // rounded: the squared-price sums overflow the 2^53 exact window,
      // so the two engines' decimal→double conversions can differ by
      // 1 ulp; rounding leaves ~6 orders of margin over that wobble
      .select(col("l_returnflag"), col("n"),
        round((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1), 6).as("var_qty"),
        round(sqrt((col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1)), 6).as("stddev_price"),
        round((col("sxy") - col("sx") * col("sy") / col("n")) /
          (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
            sqrt(col("syy") - col("sy") * col("sy") / col("n"))), 6).as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  private[graft] lazy val anStatsMomentsSql =
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  ROUND((sxx - sx * sx / n) / (n - 1), 6) AS var_qty,
      |  ROUND(sqrt((syy - sy * sy / n) / (n - 1)), 6) AS stddev_price,
      |  ROUND((sxy - sx * sy / n) / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)), 6) AS corr_qty_price
      |FROM m ORDER BY l_returnflag""".stripMargin

  /** Exact interpolated quantiles per group (`quantile_cont`
    * semantics: position q·(n−1), linear interpolation) WITHOUT a
    * value-buffering percentile aggregate — Spark's exact `percentile`
    * holds a per-group value→count map, which on a continuous money
    * column grows linearly with the data (the 100×-scale memory
    * cliff). Instead: collapse to distinct (group, cents) counts, run
    * ONE [[graft.operators.PrefixSum]] scan over the composite
    * (group, value) order — per-group cumulative = global running
    * total − the group's offset, where offsets come from the
    * groups-sized totals table — then pick each probe rank's crossing
    * row. Interpolation fractions are quarters ((n−1)·pct mod 100 ∈
    * {0,25,50,75}), so the interpolated cents value is exact binary
    * and the 4-dp emission can never sit on a rounding boundary
    * (multiples of $0.0025 are even multiples of the $0.00005
    * half-step). State: distinct values only, fully distributed. */
  private[graft] def anQuantilesByGroup(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("g"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    // raw-row scan (run-length merge in-pass) — the distinct-value
    // groupBy reduced nothing over near-unique prices
    val scan = graft.operators.PrefixSum.distinctRunningCounts(raw, Seq("g", "v"))
    // group-count-sized (5 rows): offsets of each group within the scan
    val wOff = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, -1)
    val probes = raw.groupBy("g").agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum("n").over(wOff), lit(0L)))
      .select(col("g"), col("n"), col("off"),
        explode(array(lit(25L), lit(50L), lit(75L))).as("pct"))
      .withColumn("k_lo", expr("(n - 1) * pct div 100 + 1"))
      .withColumn("rem", expr("(n - 1) * pct % 100"))
      .withColumn("k_hi", col("k_lo") + when(col("rem") > 0, 1L).otherwise(0L))
    val hitLo = col("cum") >= col("k_lo") && col("cum") - col("cnt") < col("k_lo")
    val hitHi = col("cum") >= col("k_hi") && col("cum") - col("cnt") < col("k_hi")
    scan.join(broadcast(probes), Seq("g"))
      .withColumn("cum", col("cnt_cum") - col("off"))
      .filter(hitLo || hitHi)
      .groupBy(col("g"), col("pct"))
      .agg(max(when(hitLo, col("v"))).as("v_lo"),
        max(when(hitHi, col("v"))).as("v_hi"),
        first(col("rem")).as("rem"))
      .withColumn("value", round(
        (col("v_lo").cast("double") + col("rem").cast("double") / 100.0
          * (col("v_hi") - col("v_lo")).cast("double")) / 100.0, 4))
      .groupBy(col("g").as("o_orderpriority"))
      .agg(max(when(col("pct") === 25, col("value"))).as("p25"),
        max(when(col("pct") === 50, col("value"))).as("p50"),
        max(when(col("pct") === 75, col("value"))).as("p75"))
      .orderBy(col("o_orderpriority"))
  }

  private[graft] lazy val anQuantilesByGroupSql =
    """SELECT o_orderpriority,
      |  ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
      |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Time-RANGE rolling window: per customer, the 30-day trailing spend
    * at each order — a range frame over epoch seconds, not a row frame,
    * so peers at equal timestamps aggregate identically on any engine. */
  private[graft] def anRolling30d(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("ts_sec"))
      .rangeBetween(-30L * 86400L, 0L)
    Tables.orders(s, dir)
      .withColumn("ts_sec", unix_timestamp(col("o_orderdate")))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        sum(col("o_totalprice").cast("decimal(24,8)")).over(w)
          .cast("decimal(24,2)").cast("double").as("spend_30d"),
        count(lit(1)).over(w).as("n_orders_30d"))
      .orderBy(col("o_orderkey"))
  }

  private[graft] lazy val anRolling30dSql =
    """SELECT o_orderkey, o_custkey, o_orderdate,
      |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,8))) OVER w, 2) AS DOUBLE) AS spend_30d,
      |  COUNT(*) OVER w AS n_orders_30d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
      |  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------------ B. analytics

  private[graft] def anSummaryStats(s: SparkSession, dir: String): DataFrame =
    Summary.summaryStats(Tables.orders(s, dir), col("o_orderstatus") === "F")
      .orderBy(col("metric"))

  private[graft] lazy val anSummaryStatsSql =
    """SELECT metric, value FROM (
      |  SELECT 'total_rows' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM orders
      |  UNION ALL
      |  SELECT 'unique_rows', CAST(COUNT(*) AS DOUBLE) FROM (SELECT DISTINCT * FROM orders)
      |  UNION ALL
      |  SELECT 'flag_percentage',
      |    SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) * 100.0 / COUNT(*) FROM orders
      |) ORDER BY metric""".stripMargin

  private[graft] def anRateByGroup(s: SparkSession, dir: String): DataFrame =
    Summary.rateByGroup(Tables.orders(s, dir), "o_orderpriority",
      col("o_orderstatus") === "F")

  private[graft] lazy val anRateByGroupSql =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS rate
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  private[graft] def anValueCountsPct(s: SparkSession, dir: String): DataFrame =
    Summary.valueCountsPct(Tables.customer(s, dir), "c_mktsegment")

  private[graft] lazy val anValueCountsPctSql =
    """SELECT c_mktsegment, COUNT(*) AS count,
      |  ROUND(COUNT(*) * 100.0 / SUM(COUNT(*)) OVER (), 2) AS pct
      |FROM customer GROUP BY c_mktsegment
      |ORDER BY count DESC, c_mktsegment""".stripMargin

  private[graft] def anAvgByGroup(s: SparkSession, dir: String): DataFrame =
    Summary.avgByGroup(Tables.orders(s, dir), "o_orderpriority", "o_totalprice")

  private[graft] lazy val anAvgByGroupSql =
    """SELECT o_orderpriority,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE) / COUNT(o_totalprice) AS avg_o_totalprice
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  private[graft] def anPivotCrosstab(s: SparkSession, dir: String): DataFrame =
    Summary.crosstab(Tables.orders(s, dir), "o_orderpriority", "o_orderstatus",
      Seq("F", "O", "P"))

  private[graft] lazy val anPivotCrosstabSql =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_count,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_count,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_count
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  private[graft] def anHistogram(s: SparkSession, dir: String): DataFrame =
    Summary.histogram(Tables.orders(s, dir), "o_totalprice", 0.0, 500000.0, 20)

  private[graft] lazy val anHistogramSql =
    """SELECT CAST(LEAST(GREATEST(FLOOR((o_totalprice - 0.0) / 25000.0), 0), 19) AS INT) AS bucket,
      |  0.0 + CAST(LEAST(GREATEST(FLOOR((o_totalprice - 0.0) / 25000.0), 0), 19) AS INT) * 25000.0 AS lo,
      |  COUNT(*) AS count
      |FROM orders WHERE o_totalprice IS NOT NULL
      |GROUP BY 1, 2 ORDER BY bucket""".stripMargin

  /** Count-Min heavy-hitter probe: one-pass depth-3/width-1024 sketch
    * over lineitem supplier keys, then point estimates for suppkeys
    * 1..20 next to the exact counts. The sketch shuffle is ≤ 3·1024
    * rows per task at ANY input scale — contrast the exact count's
    * full `groupBy(l_suppkey)` shuffle (kept here only because the
    * probe set is verification-sized). DuckDB replays the identical
    * bucket math, so `est` is hash-verified, not just bounds-checked.
    */
  private[graft] def anCmsHeavy(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_suppkey"))
    val cells = graft.functions.Sketches.cmsCells(li, col("l_suppkey"), 1024)
    val probes = s.range(1, 21).select(col("id").as("suppkey"))
    val exact = li.groupBy(col("l_suppkey").cast("long").as("suppkey"))
      .agg(count(lit(1)).as("exact_count"))
    graft.functions.Sketches.cmsEstimate(cells, probes, col("suppkey"), 1024)
      .withColumnRenamed("k", "suppkey")
      .join(broadcast(exact.join(broadcast(probes), Seq("suppkey"))), Seq("suppkey"), "left")
      .select(col("suppkey"), col("est"),
        coalesce(col("exact_count"), lit(0L)).as("exact_count"))
  }

  private[graft] lazy val anCmsHeavySql =
    """WITH seeds(d, a, b) AS (VALUES (0, 1000003, 12289), (1, 998244353, 769), (2, 786433, 65537)),
      |k_rows AS (SELECT CAST(l_suppkey AS BIGINT) AS k FROM lineitem),
      |cells AS (
      |  SELECT d, (((k % 2147483647) * a + b) % 2147483647) % 1024 AS bucket, count(*) AS c
      |  FROM k_rows CROSS JOIN seeds GROUP BY 1, 2),
      |probes AS (SELECT CAST(range AS BIGINT) AS suppkey FROM range(1, 21)),
      |pb AS (SELECT suppkey, d, (((suppkey % 2147483647) * a + b) % 2147483647) % 1024 AS bucket
      |       FROM probes CROSS JOIN seeds),
      |est AS (SELECT suppkey, min(coalesce(c, 0)) AS est
      |        FROM pb LEFT JOIN cells USING (d, bucket) GROUP BY 1),
      |ex AS (SELECT CAST(l_suppkey AS BIGINT) AS suppkey, count(*) AS exact_count
      |       FROM lineitem GROUP BY 1)
      |SELECT p.suppkey, e.est, coalesce(x.exact_count, 0) AS exact_count
      |FROM probes p JOIN est e USING (suppkey) LEFT JOIN ex x USING (suppkey)""".stripMargin

  /** HyperLogLog distinct customers per order priority plus a merged
    * "ALL" row computed by register-wise max of the per-group sketches
    * — the mergeability that lets a 1000-executor cluster union
    * per-partition sketches instead of re-scanning. z_scaled is an
    * exact integer (sum of powers of two), so the oracle compares the
    * sketch state itself bit-for-bit; `est` adds one deterministic
    * double division on top. Exact distincts ride along for reference.
    */
  private[graft] def anHllDistinct(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Sketches
    val m = 64
    val ords = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("grp"), col("o_custkey"))
    val perGrp = Sketches.hllRegisters(ords, col("o_custkey"), m, Seq("grp"))
    val merged = perGrp.groupBy(col("register"))
      .agg(max("rho").as("rho")).withColumn("grp", lit("ALL"))
    val z = perGrp.unionByName(merged)
      .groupBy("grp").agg(Sketches.hllZScaled(m))
    val exact = ords.groupBy("grp").agg(countDistinct(col("o_custkey")).as("exact_distinct"))
      .unionByName(ords.agg(countDistinct(col("o_custkey")).as("exact_distinct"))
        .withColumn("grp", lit("ALL")))
    z.select(col("grp"), col("z_scaled"),
        Sketches.hllEstimate(m, col("z_scaled")).as("est"))
      .join(broadcast(exact), Seq("grp"))
  }

  private[graft] lazy val anHllDistinctSql =
    s"""WITH t1 AS (
      |  SELECT o_orderpriority AS grp,
      |         ((CAST(o_custkey AS BIGINT) * 1000003 + 12289) % 2147483647) AS x
      |  FROM orders),
      |t2 AS (SELECT grp, xor(x, x >> 15) AS x FROM t1),
      |t3 AS (SELECT grp, (x * 786433) % 2147483647 AS x FROM t2),
      |h_rows AS (SELECT grp, xor(x, x >> 13) AS h FROM t3),
      |hit AS (
      |  SELECT grp, h % 64 AS register,
      |         max(CASE WHEN h // 64 = 0 THEN 26 ELSE 26 - length(bin(h // 64)) END) AS rho
      |  FROM h_rows GROUP BY 1, 2),
      |spine AS (SELECT grp, CAST(range AS BIGINT) AS register
      |          FROM (SELECT DISTINCT o_orderpriority AS grp FROM orders) CROSS JOIN range(0, 64)),
      |full_regs AS (SELECT s.grp, s.register, coalesce(t.rho, 0) AS rho
      |              FROM spine s LEFT JOIN hit t USING (grp, register)),
      |all_regs AS (SELECT 'ALL' AS grp, register, max(rho) AS rho FROM full_regs GROUP BY 2),
      |both_regs AS (SELECT * FROM full_regs UNION ALL SELECT * FROM all_regs),
      |z AS (SELECT grp, CAST(sum(67108864 // (1 << rho)) AS BIGINT) AS z_scaled
      |      FROM both_regs GROUP BY 1),
      |ex AS (SELECT o_orderpriority AS grp, count(DISTINCT o_custkey) AS exact_distinct
      |       FROM orders GROUP BY 1
      |       UNION ALL
      |       SELECT 'ALL', count(DISTINCT o_custkey) FROM orders)
      |SELECT z.grp, z.z_scaled,
      |       CAST(floor(${graft.functions.Sketches.hllAlphaNum(64)} / z.z_scaled) AS BIGINT) AS est,
      |       ex.exact_distinct
      |FROM z JOIN ex USING (grp)""".stripMargin

  /** HLL set-operation estimates between two customer cohorts (orders
    * with even vs %3==0 order keys — overlapping by construction):
    * |A∪B| from the element-wise-max merged register table (an
    * HLL-native operation), |A∩B| by inclusion-exclusion. The register
    * pipeline is the same tempered integer hash the oracle replays, so
    * est_a/est_b/est_union/est_intersect are ALL hash-verified — the
    * triage-grade error model is documented, but the arithmetic is
    * bit-exact. At 100 TB this answers "how much does corpus B overlap
    * A" with two fixed-size sketch passes and no join. */
  private[graft] def anHllSetEst(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Sketches
    val m = 64
    val o = Tables.orders(s, dir)
    val a = Sketches.hllRegisters(o.filter(col("o_orderkey") % 2 === 0), col("o_custkey"), m)
    val b = Sketches.hllRegisters(o.filter(col("o_orderkey") % 3 === 0), col("o_custkey"), m)
    Sketches.hllSetEstimates(a, b, m)
  }

  private[graft] lazy val anHllSetEstSql = {
    val alphaNum = graft.functions.Sketches.hllAlphaNum(64)
    def regs(name: String, pred: String) =
      s"""${name}_t1 AS (SELECT ((CAST(o_custkey AS BIGINT) * 1000003 + 12289) % 2147483647) AS x
         |  FROM orders WHERE $pred),
         |${name}_t2 AS (SELECT xor(x, x >> 15) AS x FROM ${name}_t1),
         |${name}_t3 AS (SELECT (x * 786433) % 2147483647 AS x FROM ${name}_t2),
         |${name}_h AS (SELECT xor(x, x >> 13) AS h FROM ${name}_t3),
         |${name}_hit AS (SELECT h % 64 AS register,
         |    max(CASE WHEN h // 64 = 0 THEN 26 ELSE 26 - length(bin(h // 64)) END) AS rho
         |  FROM ${name}_h GROUP BY 1),
         |${name}_regs AS (SELECT CAST(s.range AS BIGINT) AS register, coalesce(t.rho, 0) AS rho
         |  FROM range(0, 64) s LEFT JOIN ${name}_hit t ON s.range = t.register)""".stripMargin
    s"""WITH ${regs("a", "o_orderkey % 2 = 0")},
       |${regs("b", "o_orderkey % 3 = 0")},
       |u_regs AS (SELECT register, max(rho) AS rho
       |  FROM (SELECT * FROM a_regs UNION ALL SELECT * FROM b_regs) GROUP BY 1),
       |za AS (SELECT CAST(floor($alphaNum / sum(67108864 // (1 << rho))) AS BIGINT) AS est_a FROM a_regs),
       |zb AS (SELECT CAST(floor($alphaNum / sum(67108864 // (1 << rho))) AS BIGINT) AS est_b FROM b_regs),
       |zu AS (SELECT CAST(floor($alphaNum / sum(67108864 // (1 << rho))) AS BIGINT) AS est_union FROM u_regs)
       |SELECT est_a, est_b, est_union,
       |       greatest(CAST(0 AS BIGINT), est_a + est_b - est_union) AS est_intersect
       |FROM za CROSS JOIN zb CROSS JOIN zu""".stripMargin
  }

  /** t-digest body quantiles per return flag (SURVEY's last declared
    * leftover): mergeable O(δ) centroid state per group, k1 scale
    * function concentrating resolution at the tails. Estimates are
    * partition-split dependent within the t-digest rank-error envelope,
    * so this is oracle=rows (stable 3×4 output grid) with the accuracy
    * envelope pinned in TDigestSpec — the hash-verifiable quantile
    * family lives in an_kll_rank / an_tail_quantiles. The per-group
    * digests are centroid lists small enough to collect; the probe
    * evaluation is driver-side arithmetic over that model-sized state
    * (same posture as KMeans centroids). */
  /** Raw t-digest probe estimates (grp, q, est) — partition-split
    * dependent within the rank-error envelope, so the [q] emission is
    * the certified frame in [[anTdigest]]. */
  private[graft] def tdigestRaw(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val td = udaf(new graft.functions.TDigest(100))
    val probes = Seq(0.25, 0.5, 0.75, 0.95)
    val digests = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag").as("grp"))
      .agg(td(col("l_extendedprice")).as("cs"))
      .as[(String, Seq[graft.functions.Centroid])].collect()
    val out = for ((g, cs) <- digests.toSeq; q <- probes)
      yield (g, q, graft.functions.TDigest.quantile(cs, q))
    out.toDF("grp", "q", "est").orderBy(col("grp"), col("q"))
  }

  /** t-digest promoted from rows-only to a SELF-CERTIFIED SQL oracle
    * (r17 verdict #7, same treatment as [[anApproxStats]]): each
    * [[tdigestRaw]] estimate's EXACT rank interval [below, atOrBelow]
    * is measured against target q·n in one conditional-count pass
    * (12-row broadcast of the probe grid), and the emission is the
    * exact per-group counts plus an in-bound boolean per probe at the
    * δ=100 body envelope 0.02 (TDigestSpec's pinned bound) — DuckDB
    * replays the exact half and asserts TRUE literally, so envelope
    * drift hash-fails. The digests stay O(δ) mergeable state; the
    * probe evaluation is driver-side arithmetic over that model-sized
    * state (same posture as KMeans centroids). */
  private[graft] def anTdigest(s: SparkSession, dir: String): DataFrame = {
    val probeRows = tdigestRaw(s, dir)
    val li = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("grp"), col("l_extendedprice").as("v"))
    val t = col("q") * col("n_grp").cast("double")
    li.join(broadcast(probeRows), Seq("grp"))
      .groupBy(col("grp"), col("q"))
      .agg(count(lit(1)).as("n_grp"), max(col("est")).as("est"),
        sum((col("v") < col("est")).cast("long")).as("below"),
        sum((col("v") <= col("est")).cast("long")).as("ato"))
      .select(col("grp"), col("q"), col("n_grp"),
        (greatest(col("below").cast("double") - t,
          t - col("ato").cast("double"), lit(0.0)) /
          col("n_grp").cast("double") <= 0.02).as("rank_in_bound"))
      .orderBy(col("grp"), col("q"))
  }

  private[graft] lazy val anTdigestSql =
    """WITH p(q) AS (VALUES (CAST(0.25 AS DOUBLE)), (0.5), (0.75), (0.95))
      |SELECT l_returnflag AS grp, p.q, count(*) AS n_grp,
      |  true AS rank_in_bound
      |FROM lineitem CROSS JOIN p
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Space-Saving heavy hitters over a 32-key domain: capacity 64 ≥
    * distinct keys puts the sketch in its exact regime (no eviction →
    * deterministic, DuckDB-comparable counts, err = 0); the eviction /
    * merge-widening regime is property-tested in SpaceSavingSpec. The
    * buffer is O(capacity) per task and combines map-side — at 100 TB
    * the shuffle carries 64 counters per task, not the key space. */
  private[graft] def anHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ks = Tables.lineitem(s, dir)
      .select((col("l_suppkey") % 32).cast("long").as("k")).as[Long]
    ks.select(new graft.functions.SpaceSaving(64).toColumn.name("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h._1").as("k"), col("h._2").as("est"), col("h._3").as("err"))
  }

  private[graft] lazy val anHeavyHittersSql =
    """SELECT l_suppkey % 32 AS k, count(*) AS est, CAST(0 AS BIGINT) AS err
      |FROM lineitem GROUP BY 1""".stripMargin

  /** Join-cardinality estimation by CMS inner product (Cormode &
    * Muthukrishnan §4.2): |A ⋈ B on k| = Σ_k f_A(k)·f_B(k), estimated
    * as min over depths of the bucket-wise count product — each side
    * is ONE fixed-size sketch pass, no shuffle of either table, which
    * is how a planner sizes a 100 TB join before running it. The
    * expected overestimate is n_A·n_B/width per depth (width 16384
    * keeps it under ~10% here); the exact join count rides along to
    * show the error. DuckDB replays both sketches and the product, so
    * the ESTIMATE itself is hash-verified. */
  private[graft] def anJoinSizeEst(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Sketches
    val w = 16384
    val oc = Sketches.cmsCells(
      Tables.orders(s, dir).select(col("o_custkey")), col("o_custkey"), w)
    val cc = Sketches.cmsCells(
      Tables.customer(s, dir).select(col("c_custkey")), col("c_custkey"), w)
    val est = oc.withColumnRenamed("c", "ca")
      .join(cc.withColumnRenamed("c", "cb"), Seq("d", "bucket"))
      .groupBy("d").agg(sum(col("ca") * col("cb")).as("z"))
      .agg(min(col("z")).as("est_join_rows"))
    val exact = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .agg(count(lit(1)).as("exact_join_rows"))
    est.crossJoin(exact)
  }

  private[graft] lazy val anJoinSizeEstSql =
    """WITH seeds(d, a, b) AS (VALUES (0, 1000003, 12289), (1, 998244353, 769), (2, 786433, 65537)),
      |oc AS (SELECT d, (((CAST(o_custkey AS BIGINT) % 2147483647) * a + b) % 2147483647) % 16384 AS bucket,
      |              count(*) AS ca
      |       FROM orders CROSS JOIN seeds GROUP BY 1, 2),
      |cc AS (SELECT d, (((CAST(c_custkey AS BIGINT) % 2147483647) * a + b) % 2147483647) % 16384 AS bucket,
      |              count(*) AS cb
      |       FROM customer CROSS JOIN seeds GROUP BY 1, 2),
      |z AS (SELECT oc.d, sum(oc.ca * cc.cb) AS z
      |      FROM oc JOIN cc ON oc.d = cc.d AND oc.bucket = cc.bucket GROUP BY 1),
      |est AS (SELECT CAST(min(z) AS BIGINT) AS est_join_rows FROM z),
      |ex AS (SELECT count(*) AS exact_join_rows
      |       FROM orders JOIN customer ON o_custkey = c_custkey)
      |SELECT est.est_join_rows, ex.exact_join_rows FROM est, ex""".stripMargin

  /** Mann–Kendall trend test over daily revenue — the nonparametric
    * complement to an_linreg's slope and an_runs_test's randomness
    * check: S = Σ_{i<j} sign(y_j − y_i) over the ~30-day series, with
    * the tie-corrected variance, both EXACT integers (the pair frame is
    * days², tiny at any SF because the distributed part is the daily
    * aggregate); z is one IEEE expression over those integers,
    * ROUND(·,6) by the statistical-family convention. */
  private[graft] def anMannKendall(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("v"))
    val a = daily.select(col("day").as("d1"), col("v").as("v1"))
    val b = daily.select(col("day").as("d2"), col("v").as("v2"))
    val pairs = a.join(b, col("d1") < col("d2"))
      .agg(sum(signum(col("v2") - col("v1")).cast("long")).as("s_stat"))
    val ties = daily.groupBy(col("v")).agg(count(lit(1)).as("t"))
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_adj"),
        sum(col("t")).as("n"))
    pairs.crossJoin(ties)
      .select(col("n"), col("s_stat"),
        (expr("n * (n - 1) * (2 * n + 5)") - col("tie_adj")).as("var18x"))
      .select(col("n"), col("s_stat"),
        // A constant (or single-day) series has var18x = 0; define z = 0
        // there instead of emitting NULL/NaN from the zero division.
        round(
          when(col("var18x") > 0,
            when(col("s_stat") > 0, (col("s_stat") - 1).cast("double"))
              .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double"))
              .otherwise(lit(0.0)) /
              sqrt(col("var18x").cast("double") / lit(18.0)))
            .otherwise(lit(0.0)), 6).as("z_mk"))
  }

  private[graft] lazy val anMannKendallSql =
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1),
      |p AS (SELECT CAST(SUM(CASE WHEN b.v > a.v THEN 1
      |                           WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
      |      FROM daily a JOIN daily b ON a.day < b.day),
      |t AS (SELECT CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_adj,
      |             CAST(SUM(t) AS BIGINT) AS n
      |      FROM (SELECT COUNT(*) AS t FROM daily GROUP BY v) g)
      |SELECT n, s_stat,
      |  ROUND(CASE WHEN n * (n - 1) * (2 * n + 5) - tie_adj > 0 THEN
      |    (CASE WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE)
      |          WHEN s_stat < 0 THEN CAST(s_stat + 1 AS DOUBLE)
      |          ELSE 0.0 END)
      |    / sqrt(CAST(n * (n - 1) * (2 * n + 5) - tie_adj AS DOUBLE) / 18.0)
      |    ELSE 0.0 END, 6) AS z_mk
      |FROM p CROSS JOIN t""".stripMargin

  /** Theil–Sen robust slope over daily revenue — the estimator half of
    * the Mann–Kendall pair (MK detects the trend, this sizes it,
    * outlier-robustly): the median of all pairwise slopes. Day indices
    * are exact integer ranks, each slope is ONE IEEE division of exact
    * integers (identical on both engines), and the median is an order
    * statistic over the days²-sized slope frame with a deterministic
    * (slope, i, j) tie order — no numeric fuzz anywhere before the
    * final ROUND(·,6) emission. Distributed part = the daily aggregate;
    * the pair frame is tiny at any SF. */
  private[graft] def anTheilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("v"))
      .withColumn("i", row_number().over(Window.orderBy(col("day"))).cast("long"))
    val a = daily.select(col("i").as("i1"), col("v").as("v1"))
    val b = daily.select(col("i").as("i2"), col("v").as("v2"))
    val slopes = a.join(b, col("i1") < col("i2"))
      .select(col("i1"), col("i2"),
        ((col("v2") - col("v1")).cast("double") /
          (col("i2") - col("i1")).cast("double")).as("slope"))
    // Fully lazy: the pair count rides along as a window total instead of
    // an eager .count() action (which recomputed the unpersisted pair join
    // once for the count and again for the ranked result). The pair frame
    // is days²-sized, so the single-partition windows are driver-cheap.
    val ranked = slopes
      .withColumn("rn",
        row_number().over(Window.orderBy(col("slope"), col("i1"), col("i2"))))
      .withColumn("m", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val kLo = floor((col("m") + 1) / 2)
    val kHi = floor(col("m") / 2) + 1
    ranked.filter(col("rn") === kLo || col("rn") === kHi)
      .agg(max(col("m")).as("n_pairs"),
        round((max(when(col("rn") === kLo, col("slope"))) +
          max(when(col("rn") === kHi, col("slope")))) / 2.0, 6).as("slope_cpd"))
      .select(col("n_pairs"), col("slope_cpd"))
  }

  private[graft] lazy val anTheilSenSql =
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1),
      |r AS (SELECT v, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i FROM daily),
      |sl AS (SELECT a.i AS i1, b.i AS i2,
      |    CAST(b.v - a.v AS DOUBLE) / CAST(b.i - a.i AS DOUBLE) AS slope
      |  FROM r a JOIN r b ON a.i < b.i),
      |m AS (SELECT COUNT(*) AS m FROM sl),
      |rk AS (SELECT slope, row_number() OVER (ORDER BY slope, i1, i2) AS rn FROM sl)
      |SELECT m.m AS n_pairs,
      |  ROUND(((SELECT slope FROM rk WHERE rn = (m.m + 1) // 2)
      |       + (SELECT slope FROM rk WHERE rn = m.m // 2 + 1)) / 2.0, 6) AS slope_cpd
      |FROM m""".stripMargin

  /** Monthly price indices (Laspeyres / Paasche / Fisher) of the parts
    * basket vs the first month — the economics rollup the reference's
    * revenue trends stop short of: did revenue move because of PRICE or
    * VOLUME? Per-(part, month) unit prices are quantized once to
    * DECIMAL(28,6) (the quantized-term trick: an irrational per-part
    * ratio becomes an exact decimal BEFORE the basket sum, so the
    * weighted sums are order-independent exact decimals on both
    * engines), weights are integer quantities, and each index is one
    * ratio of exact decimals. Shuffles: one (part, month) aggregate +
    * one join against the broadcast base month. */
  private[graft] def anPriceIndex(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(
      date_trunc("month", col("l_shipdate")).as("month"), col("l_partkey"),
      (col("l_extendedprice").cast("decimal(24,2)") * 100).cast("bigint").as("sp_c"),
      col("l_quantity").cast("bigint").as("q"))
    val pm = li.groupBy(col("month"), col("l_partkey"))
      .agg(sum(col("sp_c")).as("sp"), sum(col("q")).as("sq"))
      .withColumn("price6",
        round(col("sp").cast("double") / col("sq").cast("double"), 6)
          .cast("decimal(28,6)"))
    val base = pm.crossJoin(broadcast(pm.agg(min(col("month")).as("m0"))))
      .filter(col("month") === col("m0"))
      .select(col("l_partkey"), col("price6").as("p0"), col("sq").as("q0"))
    pm.join(base, "l_partkey")
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("price6") * col("q0")).cast("double").as("lt_num"),
        sum(col("p0") * col("q0")).cast("double").as("lt_den"),
        sum(col("price6") * col("sq")).cast("double").as("pa_num"),
        sum(col("p0") * col("sq")).cast("double").as("pa_den"))
      .select(substring(col("month").cast("string"), 1, 10).as("month"), col("n_parts"),
        round(col("lt_num") / col("lt_den"), 6).as("laspeyres"),
        round(col("pa_num") / col("pa_den"), 6).as("paasche"),
        round(sqrt((col("lt_num") / col("lt_den")) * (col("pa_num") / col("pa_den"))), 6)
          .as("fisher"))
      .orderBy(col("month"))
  }

  private[graft] lazy val anPriceIndexSql =
    """WITH li AS (SELECT date_trunc('month', l_shipdate) AS month, l_partkey,
      |    CAST(CAST(l_extendedprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS sp_c,
      |    CAST(l_quantity AS BIGINT) AS q
      |  FROM lineitem),
      |pm AS (SELECT month, l_partkey,
      |         CAST(SUM(sp_c) AS BIGINT) AS sp, CAST(SUM(q) AS BIGINT) AS sq
      |       FROM li GROUP BY 1, 2),
      |pq AS (SELECT month, l_partkey, sq,
      |         CAST(ROUND(CAST(sp AS DOUBLE) / CAST(sq AS DOUBLE), 6) AS DECIMAL(28,6)) AS price6
      |       FROM pm),
      |m0 AS (SELECT MIN(month) AS m0 FROM pq),
      |base AS (SELECT l_partkey, price6 AS p0, sq AS q0
      |         FROM pq CROSS JOIN m0 WHERE month = m0)
      |SELECT substr(CAST(t.month AS VARCHAR), 1, 10) AS month, COUNT(*) AS n_parts,
      |  ROUND(CAST(SUM(t.price6 * b.q0) AS DOUBLE) / CAST(SUM(b.p0 * b.q0) AS DOUBLE), 6) AS laspeyres,
      |  ROUND(CAST(SUM(t.price6 * t.sq) AS DOUBLE) / CAST(SUM(b.p0 * t.sq) AS DOUBLE), 6) AS paasche,
      |  ROUND(sqrt((CAST(SUM(t.price6 * b.q0) AS DOUBLE) / CAST(SUM(b.p0 * b.q0) AS DOUBLE))
      |           * (CAST(SUM(t.price6 * t.sq) AS DOUBLE) / CAST(SUM(b.p0 * t.sq) AS DOUBLE))), 6) AS fisher
      |FROM pq t JOIN base b USING (l_partkey)
      |GROUP BY 1 ORDER BY month""".stripMargin

  /** Spearman rank correlation between daily revenue and daily event
    * volume — the monotone-association screen that, unlike Pearson
    * (an_corr_matrix), ignores the revenue distribution's heavy tail.
    * Ranks are deterministic integer row_numbers with (value, day)
    * tie-break (documented: ties take distinct consecutive ranks, not
    * averaged — identical on both engines), so every sum in the
    * Pearson-on-ranks formula is an exact integer; one sqrt + division
    * at emission. Distributed part = the daily aggregate; the rank
    * windows run on the days-sized frame. */
  private[graft] def anSpearman(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("v"),
        count(lit(1)).as("m"))
    val ranked = daily
      .withColumn("r1", row_number().over(Window.orderBy(col("v"), col("day"))).cast("long"))
      .withColumn("r2", row_number().over(Window.orderBy(col("m"), col("day"))).cast("long"))
    ranked.agg(count(lit(1)).as("n"),
        sum(col("r1") * col("r1")).as("s11"),
        sum(col("r1") * col("r2")).as("s12"),
        sum(col("r1")).as("s1"), sum(col("r2")).as("s2"),
        sum(col("r2") * col("r2")).as("s22"))
      .select(col("n"),
        round((col("n") * col("s12") - col("s1") * col("s2")).cast("double") /
          sqrt(((col("n") * col("s11") - col("s1") * col("s1")) *
            (col("n") * col("s22") - col("s2") * col("s2"))).cast("double")), 6)
          .as("rho"))
  }

  private[graft] lazy val anSpearmanSql =
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS v,
      |    COUNT(*) AS m
      |  FROM events GROUP BY 1),
      |r AS (SELECT CAST(row_number() OVER (ORDER BY v, day) AS BIGINT) AS r1,
      |             CAST(row_number() OVER (ORDER BY m, day) AS BIGINT) AS r2
      |      FROM daily),
      |a AS (SELECT COUNT(*) AS n,
      |             CAST(SUM(r1 * r1) AS BIGINT) AS s11,
      |             CAST(SUM(r1 * r2) AS BIGINT) AS s12,
      |             CAST(SUM(r1) AS BIGINT) AS s1, CAST(SUM(r2) AS BIGINT) AS s2,
      |             CAST(SUM(r2 * r2) AS BIGINT) AS s22
      |      FROM r)
      |SELECT n, ROUND(CAST(n * s12 - s1 * s2 AS DOUBLE)
      |  / sqrt(CAST((n * s11 - s1 * s1) * (n * s22 - s2 * s2) AS DOUBLE)), 6) AS rho
      |FROM a""".stripMargin

  /** Kendall's tau-b between daily revenue and daily event volume —
    * the pair-concordance companion to an_spearman (robust to ties by
    * construction, the estimator Mann–Kendall's S generalizes). All
    * counts are exact integers over the days² pair frame (tiny at any
    * SF); tau-b's tie-corrected denominator takes one sqrt at
    * emission. */
  private[graft] def anKendallTau(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("v"),
        count(lit(1)).as("m"))
    val a = daily.select(col("day").as("d1"), col("v").as("v1"), col("m").as("m1"))
    val b = daily.select(col("day").as("d2"), col("v").as("v2"), col("m").as("m2"))
    val pairs = a.join(b, col("d1") < col("d2"))
      .agg(count(lit(1)).as("n0"),
        sum(when((col("v2") > col("v1")) && (col("m2") > col("m1")), 1L)
          .when((col("v2") < col("v1")) && (col("m2") < col("m1")), 1L)
          .otherwise(0L)).as("conc"),
        sum(when((col("v2") > col("v1")) && (col("m2") < col("m1")), 1L)
          .when((col("v2") < col("v1")) && (col("m2") > col("m1")), 1L)
          .otherwise(0L)).as("disc"),
        sum(when(col("v1") === col("v2"), 1L).otherwise(0L)).as("tx"),
        sum(when(col("m1") === col("m2"), 1L).otherwise(0L)).as("ty"))
    pairs.select(col("n0"), (col("conc") - col("disc")).as("s_k"),
        round((col("conc") - col("disc")).cast("double") /
          sqrt(((col("n0") - col("tx")) * (col("n0") - col("ty"))).cast("double")), 6)
          .as("tau_b"))
  }

  private[graft] lazy val anKendallTauSql =
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS v,
      |    COUNT(*) AS m
      |  FROM events GROUP BY 1),
      |p AS (SELECT COUNT(*) AS n0,
      |  CAST(SUM(CASE WHEN (b.v > a.v AND b.m > a.m) OR (b.v < a.v AND b.m < a.m)
      |                THEN 1 ELSE 0 END) AS BIGINT) AS conc,
      |  CAST(SUM(CASE WHEN (b.v > a.v AND b.m < a.m) OR (b.v < a.v AND b.m > a.m)
      |                THEN 1 ELSE 0 END) AS BIGINT) AS disc,
      |  CAST(SUM(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) AS BIGINT) AS tx,
      |  CAST(SUM(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS BIGINT) AS ty
      |  FROM daily a JOIN daily b ON a.day < b.day)
      |SELECT n0, conc - disc AS s_k,
      |  ROUND(CAST(conc - disc AS DOUBLE)
      |    / sqrt(CAST((n0 - tx) * (n0 - ty) AS DOUBLE)), 6) AS tau_b
      |FROM p""".stripMargin

  /** Jarque–Bera normality screen on order totals — sits next to
    * an_stats_moments (which stops at variance/correlation): skewness,
    * excess kurtosis and the JB statistic from one pass of raw power
    * sums in DECIMAL(38,0) cents (exact through Σv⁴ up to ~10⁹ rows —
    * the an_kruskal decimal→double ulp class beyond 2^53, absorbed by
    * ROUND 6). The formula replays in SQL in the identical operation
    * order, so the doubles agree bit-for-bit before rounding. */
  private[graft] def anJarqueBera(s: SparkSession, dir: String): DataFrame = {
    val v = (col("o_totalprice").cast("decimal(24,2)") * 100).cast("decimal(38,0)")
    def d(c: Column) = sum(c).cast("double")
    val moments = Tables.orders(s, dir)
      .agg(count(lit(1)).as("n"), d(v).as("s1"), d(v * v).as("s2"),
        d(v * v * v).as("s3"), d(v * v * v * v).as("s4"))
    val n = col("n").cast("double")
    val mu = col("s1") / n
    val m2 = col("s2") / n - mu * mu
    val m3 = col("s3") / n - lit(3.0) * mu * (col("s2") / n) + lit(2.0) * mu * mu * mu
    val m4 = col("s4") / n - lit(4.0) * mu * (col("s3") / n) +
      lit(6.0) * mu * mu * (col("s2") / n) - lit(3.0) * mu * mu * mu * mu
    val skew = m3 / sqrt(m2 * m2 * m2)
    val kurt = m4 / (m2 * m2)
    moments.select(col("n"),
      round(skew, 6).as("skewness"),
      round(kurt - 3.0, 6).as("excess_kurtosis"),
      round(n / 6.0 * (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0), 6).as("jb_stat"))
  }

  private[graft] lazy val anJarqueBeraSql =
    """WITH m AS (SELECT COUNT(*) AS n,
      |    CAST(SUM(v) AS DOUBLE) AS s1, CAST(SUM(v * v) AS DOUBLE) AS s2,
      |    CAST(SUM(v * v * v) AS DOUBLE) AS s3,
      |    CAST(SUM(v * v * v * v) AS DOUBLE) AS s4
      |  FROM (SELECT CAST(CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT)
      |               AS DECIMAL(38,0)) AS v FROM orders) t),
      |d AS (SELECT n, CAST(n AS DOUBLE) AS nd, s1, s2, s3, s4,
      |        s1 / CAST(n AS DOUBLE) AS mu FROM m),
      |c AS (SELECT n, nd, mu,
      |        s2 / nd - mu * mu AS m2,
      |        s3 / nd - 3.0 * mu * (s2 / nd) + 2.0 * mu * mu * mu AS m3,
      |        s4 / nd - 4.0 * mu * (s3 / nd) + 6.0 * mu * mu * (s2 / nd)
      |          - 3.0 * mu * mu * mu * mu AS m4
      |      FROM d)
      |SELECT n, ROUND(m3 / sqrt(m2 * m2 * m2), 6) AS skewness,
      |  ROUND(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis,
      |  ROUND(nd / 6.0 * ((m3 / sqrt(m2 * m2 * m2)) * (m3 / sqrt(m2 * m2 * m2))
      |    + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0) / 4.0), 6) AS jb_stat
      |FROM c""".stripMargin

  /** Grubbs outlier statistic on order totals: G = max|v−μ|/s with the
    * argmax order key (ties → lowest key) — the single-outlier screen
    * next to an_mad_outliers' bulk screen. One moment pass + one
    * argmax pass over the same scan; exact integer cents until the
    * final division. (The t-based critical value is a lookup the
    * caller applies; the statistic is the distributed part.) */
  private[graft] def anGrubbs(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
      (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val m = o.agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(38,0)")).cast("double").as("s1"),
      sum((col("v").cast("decimal(38,0)") * col("v")).cast("decimal(38,0)"))
        .cast("double").as("s2"))
    val withStats = o.crossJoin(broadcast(m))
      .withColumn("mu", col("s1") / col("n").cast("double"))
      .withColumn("dev", abs(col("v").cast("double") - col("mu")))
    // Argmax via orderBy+limit(1) → TakeOrderedAndProject (distributed
    // per-partition top-1, driver merge of numPartitions rows) — NOT a
    // global row_number window, which would funnel the whole fact
    // through one task (the PrefixSum.scala cliff).
    withStats.orderBy(col("dev").desc, col("k")).limit(1)
      .select(col("n"), col("k").as("suspect_key"), col("v").as("suspect_cents"),
        round(col("dev") /
          sqrt((col("s2") - col("s1") * col("s1") / col("n").cast("double")) /
            (col("n").cast("double") - 1.0)), 6).as("g_stat"))
  }

  private[graft] lazy val anGrubbsSql =
    """WITH o AS (SELECT o_orderkey AS k,
      |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |m AS (SELECT COUNT(*) AS n,
      |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(CAST(v AS DECIMAL(38,0)) * v AS DECIMAL(38,0))) AS DOUBLE) AS s2
      |  FROM o),
      |d AS (SELECT o.k, o.v, m.n, m.s1, m.s2,
      |        abs(CAST(o.v AS DOUBLE) - m.s1 / CAST(m.n AS DOUBLE)) AS dev,
      |        row_number() OVER (ORDER BY abs(CAST(o.v AS DOUBLE)
      |          - m.s1 / CAST(m.n AS DOUBLE)) DESC, o.k) AS rn
      |      FROM o CROSS JOIN m)
      |SELECT n, k AS suspect_key, v AS suspect_cents,
      |  ROUND(dev / sqrt((s2 - s1 * s1 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)), 6) AS g_stat
      |FROM d WHERE rn = 1""".stripMargin

  /** Cohen's d effect size between the two experiment arms (the
    * an_abtest split): standardized mean difference with the pooled
    * sample SD — the "is the lift big or just significant" companion
    * the t-test family omits. One grouped moment pass in exact decimal
    * cents; three IEEE ops at emission. */
  private[graft] def anCohensD(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select((col("o_custkey") % 2).cast("int").as("grp"),
      (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val g = o.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(38,0)")).cast("double").as("s1"),
        sum((col("v").cast("decimal(38,0)") * col("v")).cast("decimal(38,0)"))
          .cast("double").as("s2"))
    val p = g.groupBy()
      .pivot(col("grp"), Seq(0, 1))
      .agg(first(col("n")).as("n"), first(col("s1")).as("s1"), first(col("s2")).as("s2"))
    def nn(i: Int) = col(s"${i}_n").cast("double")
    def mu(i: Int) = col(s"${i}_s1") / nn(i)
    def ss(i: Int) = col(s"${i}_s2") - col(s"${i}_s1") * col(s"${i}_s1") / nn(i)
    p.select(col("0_n").as("n0"), col("1_n").as("n1"),
      round(mu(1) / 100.0, 2).as("mean_1_usd"),
      round(mu(0) / 100.0, 2).as("mean_0_usd"),
      round((mu(1) - mu(0)) /
        sqrt((ss(0) + ss(1)) / (nn(0) + nn(1) - 2.0)), 6).as("cohens_d"))
  }

  private[graft] lazy val anCohensDSql =
    """WITH o AS (SELECT CAST(o_custkey % 2 AS INT) AS grp,
      |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |  FROM orders),
      |g AS (SELECT grp, COUNT(*) AS n,
      |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(CAST(v AS DECIMAL(38,0)) * v AS DECIMAL(38,0))) AS DOUBLE) AS s2
      |  FROM o GROUP BY grp),
      |p AS (SELECT
      |    MAX(CASE WHEN grp = 0 THEN n END) AS n0,
      |    MAX(CASE WHEN grp = 1 THEN n END) AS n1,
      |    MAX(CASE WHEN grp = 0 THEN s1 END) AS s10,
      |    MAX(CASE WHEN grp = 1 THEN s1 END) AS s11,
      |    MAX(CASE WHEN grp = 0 THEN s2 END) AS s20,
      |    MAX(CASE WHEN grp = 1 THEN s2 END) AS s21
      |  FROM g)
      |SELECT n0, n1,
      |  ROUND(s11 / CAST(n1 AS DOUBLE) / 100.0, 2) AS mean_1_usd,
      |  ROUND(s10 / CAST(n0 AS DOUBLE) / 100.0, 2) AS mean_0_usd,
      |  ROUND((s11 / CAST(n1 AS DOUBLE) - s10 / CAST(n0 AS DOUBLE))
      |    / sqrt(((s20 - s10 * s10 / CAST(n0 AS DOUBLE))
      |          + (s21 - s11 * s11 / CAST(n1 AS DOUBLE)))
      |        / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) - 2.0)), 6) AS cohens_d
      |FROM p""".stripMargin

  /** Brown–Forsythe (median-based Levene) variance-homogeneity test of
    * account balances across market segments — the assumption check in
    * front of the ANOVA/t-test family (an_anova assumes equal
    * variances; this tests that). Per-group medians are EXACT order
    * statistics kept in integer form as med2 = lo+hi middle values
    * (2×median), deviations z2 = |2v − med2| are exact BIGINTs, and
    * the one-way F on deviations comes from decimal Σz2/Σz2² sums —
    * the whole statistic is integer until a handful of mirrored IEEE
    * ops. Rank windows partition by segment (distributed), the
    * 5-row median table broadcasts back. */
  private[graft] def anLevene(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(col("c_mktsegment").as("g"),
      (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"),
      col("c_custkey").as("k"))
    val ranked = c
      .withColumn("rn", row_number().over(Window.partitionBy(col("g"))
        .orderBy(col("v"), col("k"))).cast("long"))
      .withColumn("n_g", count(lit(1)).over(Window.partitionBy(col("g"))))
    val med2 = ranked
      .filter(col("rn") === expr("(n_g + 1) div 2") || col("rn") === expr("n_g div 2 + 1"))
      .groupBy(col("g"))
      .agg((sum(when(col("rn") === expr("(n_g + 1) div 2"), col("v")).otherwise(0L)) +
        sum(when(col("rn") === expr("n_g div 2 + 1"), col("v")).otherwise(0L))).as("med2"))
    val z = c.join(broadcast(med2), "g")
      .select(col("g"), abs(lit(2L) * col("v") - col("med2")).as("z2"))
    val gStats = z.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("z2").cast("decimal(38,0)")).cast("double").as("sz"),
        sum((col("z2").cast("decimal(38,0)") * col("z2")).cast("decimal(38,0)"))
          .cast("double").as("qz"))
    val agg = gStats.agg(count(lit(1)).as("k_groups"), sum(col("n")).as("n_total"),
        sum(col("sz")).as("s_all"))
    gStats.crossJoin(broadcast(agg))
      .select(col("k_groups"), col("n_total"),
        (col("n").cast("double") *
          (col("sz") / (col("n").cast("double") * 2.0) -
            col("s_all") / (col("n_total").cast("double") * 2.0)) *
          (col("sz") / (col("n").cast("double") * 2.0) -
            col("s_all") / (col("n_total").cast("double") * 2.0))).as("num_g"),
        (col("qz") / 4.0 - col("sz") * col("sz") / (col("n").cast("double") * 4.0))
          .as("den_g"))
      .groupBy(col("k_groups"), col("n_total"))
      .agg(sum(col("num_g")).as("num"), sum(col("den_g")).as("den"))
      .select(col("k_groups"), col("n_total"),
        round((col("n_total") - col("k_groups")).cast("double") /
          (col("k_groups") - 1).cast("double") * col("num") / col("den"), 6)
          .as("bf_f_stat"))
  }

  private[graft] lazy val anLeveneSql =
    """WITH c AS (SELECT c_mktsegment AS g,
      |    CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v,
      |    c_custkey AS k
      |  FROM customer),
      |r AS (SELECT g, v,
      |        CAST(row_number() OVER (PARTITION BY g ORDER BY v, k) AS BIGINT) AS rn,
      |        COUNT(*) OVER (PARTITION BY g) AS n_g
      |      FROM c),
      |med AS (SELECT g,
      |          CAST(SUM(CASE WHEN rn = (n_g + 1) // 2 THEN v ELSE 0 END)
      |             + SUM(CASE WHEN rn = n_g // 2 + 1 THEN v ELSE 0 END) AS BIGINT) AS med2
      |        FROM r WHERE rn = (n_g + 1) // 2 OR rn = n_g // 2 + 1
      |        GROUP BY g),
      |z AS (SELECT c.g, abs(2 * c.v - med.med2) AS z2 FROM c JOIN med USING (g)),
      |gs AS (SELECT g, COUNT(*) AS n,
      |         CAST(SUM(CAST(z2 AS DECIMAL(38,0))) AS DOUBLE) AS sz,
      |         CAST(SUM(CAST(CAST(z2 AS DECIMAL(38,0)) * z2 AS DECIMAL(38,0))) AS DOUBLE) AS qz
      |       FROM z GROUP BY g),
      |tot AS (SELECT COUNT(*) AS k_groups, CAST(SUM(n) AS BIGINT) AS n_total,
      |          SUM(sz) AS s_all FROM gs),
      |parts AS (SELECT t.k_groups, t.n_total,
      |            CAST(g.n AS DOUBLE)
      |              * (g.sz / (2.0 * CAST(g.n AS DOUBLE)) - t.s_all / (2.0 * CAST(t.n_total AS DOUBLE)))
      |              * (g.sz / (2.0 * CAST(g.n AS DOUBLE)) - t.s_all / (2.0 * CAST(t.n_total AS DOUBLE))) AS num_g,
      |            g.qz / 4.0 - g.sz * g.sz / (4.0 * CAST(g.n AS DOUBLE)) AS den_g
      |          FROM gs g CROSS JOIN tot t)
      |SELECT k_groups, n_total,
      |  ROUND(CAST(n_total - k_groups AS DOUBLE) / CAST(k_groups - 1 AS DOUBLE)
      |    * SUM(num_g) / SUM(den_g), 6) AS bf_f_stat
      |FROM parts GROUP BY k_groups, n_total""".stripMargin

  /** Nelson–Aalen cumulative hazard over the same churn survival frame
    * as an_kaplan_meier (KM estimates survival multiplicatively; NA
    * estimates the hazard additively and is the better-behaved
    * estimator in heavy ties): H(t) = Σ d_i/n_i with its variance
    * Σ d_i/n_i², both sequential cumulative window sums over the
    * event-time frame — the risk-set construction is the one KM scan,
    * the cumulation runs on the days-sized event table. */
  private[graft] def anNelsonAalen(s: SparkSession, dir: String): DataFrame = {
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
      .withColumn("na_cumhaz", round(
        sum(col("d").cast("double") / col("n_risk").cast("double")).over(wCum), 6))
      .withColumn("na_var", round(
        sum(col("d").cast("double") /
          (col("n_risk").cast("double") * col("n_risk").cast("double"))).over(wCum), 6))
      .select(col("t"), col("n_risk"), col("d"), col("na_cumhaz"), col("na_var"))
      .orderBy(col("t"))
  }

  private[graft] lazy val anNelsonAalenSql =
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
      |      FROM byt CROSS JOIN tot)
      |SELECT t, n_risk, d,
      |  ROUND(SUM(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
      |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS na_cumhaz,
      |  ROUND(SUM(CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)))
      |    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS na_var
      |FROM r WHERE d > 0 ORDER BY t""".stripMargin

  /** Page–Hinkley drift detector over daily revenue — the sequential
    * change monitor next to an_cusum/an_mean_shift (PH tracks the
    * cumulative deviation from the RUNNING mean, so it needs no
    * reference window): m_t = Σ(x_s − mean_s), PH_t = m_t − min m_s.
    * Every term is an integer sum divided once (running mean) and the
    * cumulations are sequential ordered window sums — deterministic on
    * both engines; the daily aggregate is the distributed part. */
  private[graft] def anPageHinkley(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("v"))
    val wCum = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    val scored = daily
      .withColumn("rn", row_number().over(Window.orderBy(col("day"))).cast("long"))
      .withColumn("s", sum(col("v")).over(wCum))
      .withColumn("dev", col("v").cast("double") -
        col("s").cast("double") / col("rn").cast("double"))
      .withColumn("m", sum(col("dev")).over(wCum))
      .withColumn("ph", col("m") - min(col("m")).over(wCum))
    scored.orderBy(col("ph").desc, col("day")).limit(1)
      .select(col("rn").as("n_days_seen"), col("day").as("peak_day"),
        round(col("ph") / 100.0, 6).as("ph_max_usd"))
  }

  private[graft] lazy val anPageHinkleySql =
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1),
      |s1 AS (SELECT day, v,
      |         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
      |         CAST(SUM(v) OVER (ORDER BY day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s
      |       FROM daily),
      |s2 AS (SELECT day, rn,
      |         CAST(v AS DOUBLE) - CAST(s AS DOUBLE) / CAST(rn AS DOUBLE) AS dev
      |       FROM s1),
      |s3 AS (SELECT day, rn, SUM(dev) OVER (ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
      |       FROM s2),
      |s4 AS (SELECT day, rn, m - MIN(m) OVER (ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph
      |       FROM s3)
      |SELECT rn AS n_days_seen, day AS peak_day, ROUND(ph / 100.0, 6) AS ph_max_usd
      |FROM s4 ORDER BY ph DESC, day LIMIT 1""".stripMargin

  /** Single change-point by binary segmentation over daily revenue —
    * the locator the an_mean_shift detector implies: the split t that
    * maximizes the between-segment SSE gain S_t²/t + (S_n−S_t)²/(n−t)
    * − S_n²/n. Prefix sums are exact BIGINT cents (window-cumulated),
    * the gain is a mirrored IEEE expression, argmax ties break to the
    * earliest day. Daily aggregate distributed; the argmax runs on the
    * days-sized frame. */
  private[graft] def anChangepoint(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("v"))
    val wCum = Window.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, 0)
    val pre = daily
      .withColumn("t", row_number().over(Window.orderBy(col("day"))).cast("long"))
      .withColumn("s_t", sum(col("v")).over(wCum))
    val tot = pre.agg(max(col("t")).as("n"), max(col("s_t")).as("s_n"))
    val gains = pre.crossJoin(broadcast(tot))
      .filter(col("t") < col("n"))
      .withColumn("gain",
        col("s_t").cast("double") * col("s_t").cast("double") / col("t").cast("double") +
          (col("s_n") - col("s_t")).cast("double") * (col("s_n") - col("s_t")).cast("double") /
            (col("n") - col("t")).cast("double") -
          col("s_n").cast("double") * col("s_n").cast("double") / col("n").cast("double"))
    gains.orderBy(col("gain").desc, col("day")).limit(1)
      .select(col("day").as("split_day"), col("t"), col("n"),
        round(col("s_t").cast("double") / col("t").cast("double") / 100.0, 2)
          .as("mean_before_usd"),
        round((col("s_n") - col("s_t")).cast("double") /
          (col("n") - col("t")).cast("double") / 100.0, 2).as("mean_after_usd"),
        round(col("gain") / 10000.0, 6).as("gain_usd2"))
  }

  private[graft] lazy val anChangepointSql =
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1),
      |pre AS (SELECT day,
      |          CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
      |          CAST(SUM(v) OVER (ORDER BY day
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s_t
      |        FROM daily),
      |tot AS (SELECT MAX(t) AS n, MAX(s_t) AS s_n FROM pre),
      |g AS (SELECT day, t, n, s_t, s_n,
      |        CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE) / CAST(t AS DOUBLE)
      |        + CAST(s_n - s_t AS DOUBLE) * CAST(s_n - s_t AS DOUBLE) / CAST(n - t AS DOUBLE)
      |        - CAST(s_n AS DOUBLE) * CAST(s_n AS DOUBLE) / CAST(n AS DOUBLE) AS gain
      |      FROM pre CROSS JOIN tot WHERE t < n)
      |SELECT day AS split_day, t, n,
      |  ROUND(CAST(s_t AS DOUBLE) / CAST(t AS DOUBLE) / 100.0, 2) AS mean_before_usd,
      |  ROUND(CAST(s_n - s_t AS DOUBLE) / CAST(n - t AS DOUBLE) / 100.0, 2) AS mean_after_usd,
      |  ROUND(gain / 10000.0, 6) AS gain_usd2
      |FROM g ORDER BY gain DESC, day LIMIT 1""".stripMargin

  /** Shewhart control chart with Western Electric rules over daily
    * revenue — the SPC view of the series an_cusum/an_page_hinkley
    * monitor sequentially: per day the z-score against the whole-series
    * mean/SD, rule 1 (one point beyond 3σ) and rule 2 (two of three
    * consecutive points beyond 2σ on the same side, via two lag
    * windows). All inputs are exact integer cents; z is one mirrored
    * IEEE expression; the flags are integer comparisons on identical
    * doubles. */
  private[graft] def anSpcRules(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum((col("value").cast("decimal(24,2)") * 100).cast("bigint")).as("v"))
    val m = daily.agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(38,0)")).cast("double").as("s1"),
      sum((col("v").cast("decimal(38,0)") * col("v")).cast("decimal(38,0)"))
        .cast("double").as("s2"))
    val wDay = Window.orderBy(col("day"))
    daily.crossJoin(broadcast(m))
      .withColumn("mu", col("s1") / col("n").cast("double"))
      .withColumn("sd", sqrt((col("s2") - col("s1") * col("s1") / col("n").cast("double")) /
        (col("n").cast("double") - 1.0)))
      .withColumn("z", (col("v").cast("double") - col("mu")) / col("sd"))
      .withColumn("b2", when(col("z") > 2.0, 1).when(col("z") < -2.0, -1).otherwise(0))
      .withColumn("b2l1", coalesce(lag(col("b2"), 1).over(wDay), lit(0)))
      .withColumn("b2l2", coalesce(lag(col("b2"), 2).over(wDay), lit(0)))
      .select(col("day"), round(col("z"), 6).as("z"),
        (abs(col("z")) > 3.0).as("rule1_beyond_3sd"),
        ((when(col("b2") === 1, 1).otherwise(0) + when(col("b2l1") === 1, 1).otherwise(0) +
          when(col("b2l2") === 1, 1).otherwise(0) >= 2) ||
          (when(col("b2") === -1, 1).otherwise(0) + when(col("b2l1") === -1, 1).otherwise(0) +
            when(col("b2l2") === -1, 1).otherwise(0) >= 2)).as("rule2_two_of_three_2sd"))
      .orderBy(col("day"))
  }

  private[graft] lazy val anSpcRulesSql =
    """WITH daily AS (SELECT date_trunc('day', ts) AS day,
      |    CAST(SUM(CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT)) AS BIGINT) AS v
      |  FROM events GROUP BY 1),
      |m AS (SELECT COUNT(*) AS n,
      |    CAST(SUM(CAST(v AS DECIMAL(38,0))) AS DOUBLE) AS s1,
      |    CAST(SUM(CAST(CAST(v AS DECIMAL(38,0)) * v AS DECIMAL(38,0))) AS DOUBLE) AS s2
      |  FROM daily),
      |z AS (SELECT day,
      |        (CAST(v AS DOUBLE) - s1 / CAST(n AS DOUBLE))
      |          / sqrt((s2 - s1 * s1 / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)) AS z
      |      FROM daily CROSS JOIN m),
      |b AS (SELECT day, z,
      |        CASE WHEN z > 2.0 THEN 1 WHEN z < -2.0 THEN -1 ELSE 0 END AS b2
      |      FROM z),
      |l AS (SELECT day, z, b2,
      |        COALESCE(lag(b2, 1) OVER (ORDER BY day), 0) AS b2l1,
      |        COALESCE(lag(b2, 2) OVER (ORDER BY day), 0) AS b2l2
      |      FROM b)
      |SELECT day, ROUND(z, 6) AS z,
      |  abs(z) > 3.0 AS rule1_beyond_3sd,
      |  ((CASE WHEN b2 = 1 THEN 1 ELSE 0 END + CASE WHEN b2l1 = 1 THEN 1 ELSE 0 END
      |    + CASE WHEN b2l2 = 1 THEN 1 ELSE 0 END) >= 2)
      |  OR ((CASE WHEN b2 = -1 THEN 1 ELSE 0 END + CASE WHEN b2l1 = -1 THEN 1 ELSE 0 END
      |    + CASE WHEN b2l2 = -1 THEN 1 ELSE 0 END) >= 2) AS rule2_two_of_three_2sd
      |FROM l ORDER BY day""".stripMargin

  /** Quantile treatment effects — the distributional view an average
    * treatment effect (an_did / an_bootstrap_diff) hides: per decile,
    * the gap between the two groups' exact type-7 quantiles. Rides the
    * same raw-row PrefixSum order-statistic scan as
    * an_quantiles_by_group (no value-buffering percentile anywhere),
    * with 2 groups × 9 deciles of rank probes broadcast into the scan;
    * the interpolation and /100 cents→dollars emission reuse that
    * query's proven ROUND(·,4) recipe, and the QTE is a difference of
    * identically-rounded doubles — bit-identical by construction. */
  private[graft] def anQte(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.orders(s, dir)
      .select((col("o_custkey") % 2).cast("int").as("g"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val scan = graft.operators.PrefixSum.distinctRunningCounts(raw, Seq("g", "v"))
    val wOff = Window.orderBy("g").rowsBetween(Window.unboundedPreceding, -1)
    val probes = raw.groupBy("g").agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum("n").over(wOff), lit(0L)))
      .select(col("g"), col("n"), col("off"),
        explode(array((1 to 9).map(i => lit(i * 10L)): _*)).as("pct"))
      .withColumn("k_lo", expr("(n - 1) * pct div 100 + 1"))
      .withColumn("rem", expr("(n - 1) * pct % 100"))
      .withColumn("k_hi", col("k_lo") + when(col("rem") > 0, 1L).otherwise(0L))
    val hitLo = col("cum") >= col("k_lo") && col("cum") - col("cnt") < col("k_lo")
    val hitHi = col("cum") >= col("k_hi") && col("cum") - col("cnt") < col("k_hi")
    scan.join(broadcast(probes), Seq("g"))
      .withColumn("cum", col("cnt_cum") - col("off"))
      .filter(hitLo || hitHi)
      .groupBy(col("g"), col("pct"))
      .agg(max(when(hitLo, col("v"))).as("v_lo"),
        max(when(hitHi, col("v"))).as("v_hi"),
        first(col("rem")).as("rem"))
      .withColumn("value", round(
        (col("v_lo").cast("double") + col("rem").cast("double") / 100.0
          * (col("v_hi") - col("v_lo")).cast("double")) / 100.0, 4))
      .groupBy(col("pct"))
      .agg(max(when(col("g") === 0, col("value"))).as("q_control"),
        max(when(col("g") === 1, col("value"))).as("q_treat"))
      .withColumn("qte", col("q_treat") - col("q_control"))
      .orderBy(col("pct"))
  }

  private[graft] lazy val anQteSql: String = {
    val per = (1 to 9).map(i =>
      s"SELECT g, CAST(${i * 10} AS BIGINT) AS pct, ROUND(quantile_cont(v, 0.$i), 4) AS q FROM o GROUP BY g")
      .mkString("\n  UNION ALL ")
    s"""WITH o AS (SELECT CAST(o_custkey % 2 AS INT) AS g, o_totalprice AS v
       |  FROM orders),
       |q AS (
       |  $per)
       |SELECT pct,
       |  MAX(CASE WHEN g = 0 THEN q END) AS q_control,
       |  MAX(CASE WHEN g = 1 THEN q END) AS q_treat,
       |  MAX(CASE WHEN g = 1 THEN q END) - MAX(CASE WHEN g = 0 THEN q END) AS qte
       |FROM q GROUP BY pct ORDER BY pct""".stripMargin
  }

  /** Tail-exact quantiles (the REQ/t-digest use case, answered exactly):
    * TailQuantiles keeps the exact smallest/largest 1024 values in O(T)
    * mergeable state, so every probe within the retained tails — min,
    * p0.0001, p0.001, p0.999, p0.9999, max — is the TRUE order
    * statistic, hash-verified against DuckDB's row_number, not bounds-
    * checked. Budget rule: q stays exact while min(ceil(qn), n−ceil(qn))
    * ≤ T (T=1024 covers p0.001 to n=1M, p0.0001 to n=10M); probes past
    * the budget answer NULL with exact=false (TailQuantiles.probe) and
    * route to the KLL body sketch, an_kll_rank — no negative-index
    * hazard when the scale factor grows. One tiny aggregate, no sort,
    * no shuffle of raw rows. */
  private[graft] def anTailQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = new graft.functions.TailQuantiles(1024)
    val st = Tables.lineitem(s, dir).select(col("l_extendedprice")).as[Double]
      .groupByKey(_ => 0)
      .agg(agg.toColumn.name("st"))
      .select(col("st._1").as("n"), col("st._2").as("lo"), col("st._3").as("hi"))
    graft.functions.TailQuantiles.probe(st,
      Seq(0.0, 0.0001, 0.001, 0.999, 0.9999, 1.0))
  }

  private[graft] lazy val anTailQuantilesSql =
    """WITH nn AS (SELECT count(*) AS n FROM lineitem),
      |probes(q) AS (VALUES (0.0),(0.0001),(0.001),(0.999),(0.9999),(1.0)),
      |r AS (SELECT q, greatest(1, CAST(ceil(q * nn.n) AS BIGINT)) AS rnk, nn.n AS n
      |      FROM probes, nn),
      |s AS (SELECT l_extendedprice AS v,
      |      row_number() OVER (ORDER BY l_extendedprice) AS rn FROM lineitem)
      |SELECT CAST(r.q AS DOUBLE) AS q, r.rnk,
      |       CASE WHEN r.rnk <= least(1024, r.n) OR r.n - r.rnk < least(1024, r.n)
      |            THEN s.v END AS value,
      |       (r.rnk <= least(1024, r.n) OR r.n - r.rnk < least(1024, r.n)) AS exact
      |FROM r JOIN s ON s.rn = r.rnk ORDER BY q""".stripMargin

  /** KMV/theta distinct sketch per order priority + an ALL rollup: the
    * k smallest distinct tempered hashes are a uniform sample of the
    * key set, the estimate is one integer division — everything
    * deterministic, so the oracle hash-verifies the sample size, θ,
    * AND the estimate (contrast an_hll_distinct, where only the
    * register state is integer-exact). Groups under k distinct keys
    * land in the exact regime (est = true distinct). The aggregator
    * carries O(k) state map-side — same shuffle shape as top-k. */
  private[graft] def anThetaDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.functions.{KmvSketch, Sketches}
    val k = 256
    val ords = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("grp"),
        Sketches.temperedHash(col("o_custkey")).as("h"))
      .as[(String, Long)]
    val perGrp = ords.groupByKey(_._1)
      .agg(new KmvSketch[(String, Long)](k, _._2).toColumn.name("sample"))
      .toDF("grp", "sample")
    val all = ords.map(_._2)
      .select(new KmvSketch[Long](k, identity).toColumn.name("sample"))
      .toDF("sample").withColumn("grp", lit("ALL"))
    perGrp.unionByName(all)
      .select(col("grp"),
        size(col("sample")).cast("long").as("n_sample"),
        element_at(col("sample"), -1).as("theta_h"),
        when(size(col("sample")) < k, size(col("sample")).cast("long"))
          .otherwise(expr(s"${(k - 1).toLong * graft.functions.Sketches.P} div element_at(sample, -1)"))
          .as("est"))
  }

  private[graft] lazy val anThetaDistinctSql =
    s"""WITH t1 AS (
      |  SELECT o_orderpriority AS grp,
      |         ((CAST(o_custkey AS BIGINT) * 1000003 + 12289) % 2147483647) AS x
      |  FROM orders),
      |t2 AS (SELECT grp, xor(x, x >> 15) AS x FROM t1),
      |t3 AS (SELECT grp, (x * 786433) % 2147483647 AS x FROM t2),
      |h_rows AS (SELECT grp, xor(x, x >> 13) AS h FROM t3),
      |dh AS (SELECT DISTINCT grp, h FROM h_rows),
      |rk AS (SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS r FROM dh),
      |g AS (SELECT grp, count(*) AS n_sample, max(h) AS theta_h FROM rk WHERE r <= 256 GROUP BY 1),
      |alldh AS (SELECT DISTINCT h FROM h_rows),
      |allrk AS (SELECT h, row_number() OVER (ORDER BY h) AS r FROM alldh),
      |allg AS (SELECT 'ALL' AS grp, count(*) AS n_sample, max(h) AS theta_h FROM allrk WHERE r <= 256),
      |u AS (SELECT * FROM g UNION ALL SELECT * FROM allg)
      |SELECT grp, n_sample, theta_h,
      |  CASE WHEN n_sample < 256 THEN n_sample
      |       ELSE ${255L * graft.functions.Sketches.P} // theta_h END AS est
      |FROM u""".stripMargin

  /** KLL quantile-sketch rank probes per order status: each group
    * aggregates into an O(k) compactor hierarchy (map-side combined,
    * mergeable — the shuffle carries one sketch per task, never the
    * values), then fixed price thresholds are ranked against the
    * flattened summary. EXACT-ORACLE REGIME CONTRACT (SURVEY §2 B):
    * k = 131072 ≥ the largest per-status group through sf0.1 (the
    * largest SF any driver artifact measures — r15's full sf0.1 verify
    * caught k = 16384 tripping compactions there: err_bound 5 vs the
    * exact oracle's 0), so within that horizon no compaction fires,
    * errBound = 0 and every rank is the EXACT count of rows ≤ probe —
    * hash-verified. Beyond the horizon (sf1: ~750k-row groups),
    * compactions fire BY DESIGN and the sketch self-certifies its rank
    * error (the compaction regime is property-tested in SketchesSpec
    * against that bound); widening the exact horizon is one k bump. */
  private[graft] def anKllRank(s: SparkSession, dir: String): DataFrame = {
    val kll = udaf(new graft.functions.KllSketch(131072))
    val probes = typedLit(Seq(75000.0, 150000.0, 300000.0))
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus").as("grp"))
      .agg(kll(col("o_totalprice").cast("double")).as("sk"))
      .select(col("grp"), explode(probes).as("probe"), col("sk"))
      .select(col("grp"), col("probe"),
        aggregate(
          filter(col("sk.items"), i => i.getField("value") <= col("probe")),
          lit(0L), (acc, i) => acc + i.getField("weight")).as("rank_est"),
        col("sk.n").as("n"),
        col("sk.errBound").as("err_bound"))
  }

  private[graft] lazy val anKllRankSql =
    """WITH p(probe) AS (VALUES (CAST(75000.0 AS DOUBLE)), (150000.0), (300000.0))
      |SELECT o_orderstatus AS grp, p.probe,
      |       count(*) FILTER (WHERE o_totalprice <= p.probe) AS rank_est,
      |       count(*) AS n, CAST(0 AS BIGINT) AS err_bound
      |FROM orders CROSS JOIN p
      |GROUP BY 1, 2""".stripMargin

  /** Per-group z-score outlier report from exact decimal power sums. */
  private[graft] def anOutliers(s: SparkSession, dir: String): DataFrame =
    graft.analytics.Outliers.zScoreReport(Tables.orders(s, dir),
      "o_orderpriority", "o_totalprice", zTau = 2.0)

  private[graft] lazy val anOutliersSql =
    """WITH m AS (
      |  SELECT o_orderpriority, COUNT(*) AS n,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(38,8))) AS DOUBLE) AS sxx
      |  FROM orders GROUP BY o_orderpriority),
      |s AS (
      |  SELECT o_orderpriority, n, sx / n AS mean,
      |    sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev
      |  FROM m)
      |SELECT o.o_orderpriority, MAX(s.n) AS n,
      |  ROUND(MAX(s.mean), 6) AS mean,
      |  ROUND(MAX(s.stddev), 6) AS stddev,
      |  CAST(SUM(CASE WHEN abs((o.o_totalprice - s.mean) / s.stddev) > 2.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  ROUND(MAX(abs((o.o_totalprice - s.mean) / s.stddev)), 6) AS max_abs_z
      |FROM orders o JOIN s ON o.o_orderpriority = s.o_orderpriority
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin

  /** Ordered funnel over the event stream: view → click (at/after the
    * first view) → purchase (at/after that click), counted per user.
    * Three same-key aggregates; every join co-partitions on user_id. */
  private[graft] def anFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
    val v = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts"))).as("v_ts"))
    val c = ev.join(v, "user_id")
      .groupBy(col("user_id"), col("v_ts"))
      .agg(min(when(col("event_type") === "click" && col("ts") >= col("v_ts"), col("ts"))).as("c_ts"))
    val p = ev.join(c, "user_id")
      .groupBy(col("user_id"), col("v_ts"), col("c_ts"))
      .agg(min(when(col("event_type") === "purchase" && col("ts") >= col("c_ts"), col("ts"))).as("p_ts"))
    p.agg(
      count(lit(1)).as("n_users"),
      sum(col("v_ts").isNotNull.cast("long")).as("n_view"),
      sum(col("c_ts").isNotNull.cast("long")).as("n_view_click"),
      sum(col("p_ts").isNotNull.cast("long")).as("n_view_click_purchase"))
  }

  private[graft] lazy val anFunnelSql =
    """WITH v AS (
      |  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS v_ts
      |  FROM events GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, v.v_ts,
      |    MIN(CASE WHEN e.event_type = 'click' AND e.ts >= v.v_ts THEN e.ts END) AS c_ts
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  GROUP BY e.user_id, v.v_ts),
      |p AS (
      |  SELECT e.user_id, c.v_ts, c.c_ts,
      |    MIN(CASE WHEN e.event_type = 'purchase' AND e.ts >= c.c_ts THEN e.ts END) AS p_ts
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  GROUP BY e.user_id, c.v_ts, c.c_ts)
      |SELECT COUNT(*) AS n_users,
      |  CAST(SUM(CASE WHEN v_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |  CAST(SUM(CASE WHEN c_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
      |  CAST(SUM(CASE WHEN p_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click_purchase
      |FROM p""".stripMargin

  /** Day-grain cohort retention: users grouped by first-seen day,
    * counted distinct per day offset. */
  private[graft] def anRetentionCohort(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    ev.join(first, "user_id")
      // ISO string, not DATE: date columns round-trip as different
      // logical types through parquet vs a SQL client
      .groupBy(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
        datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort"), col("day_offset"))
  }

  private[graft] lazy val anRetentionCohortSql =
    """WITH f AS (
      |  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort
      |  FROM events GROUP BY user_id)
      |SELECT strftime(f.cohort, '%Y-%m-%d') AS cohort,
      |  CAST(date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS INT) AS day_offset,
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM events e JOIN f ON e.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY cohort, day_offset""".stripMargin

  /** Per-group OLS regression (slope / intercept / r²) of extended
    * price on quantity, computed from EXACT decimal power sums — the
    * same one-shuffle closed-form pattern as [[anStatsMoments]], so the
    * fit is a single partial-aggregable pass no matter the table size
    * (the co-moment state is 5 decimals + a count per group; Spark's
    * streaming regr_* would be merge-order-sensitive in the low bits).
    */
  private[graft] def anLinreg(s: SparkSession, dir: String): DataFrame = {
    def dsum(c: Column) = sum(c.cast("decimal(38,8)")).cast("double")
    val x = col("l_quantity"); val y = col("l_extendedprice")
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        dsum(x).as("sx"), dsum(y).as("sy"),
        dsum(x * x).as("sxx"), dsum(y * y).as("syy"), dsum(x * y).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("slope"),
        round((col("sy") - col("sx") *
            ((col("n") * col("sxy") - col("sx") * col("sy")) /
             (col("n") * col("sxx") - col("sx") * col("sx")))) / col("n"), 4)
          .as("intercept"),
        // r² at ROUND(·,6): the n·sxy − sx·sy numerator CANCELS, so the
        // engines' last-ulp skew is amplified ~1e3× and unrounded emission
        // diverges (measured: 1e-13 relative at sf0.01) — 6 places absorbs
        // it; square via IEEE multiply, not libm pow
        round(((col("n") * col("sxy") - col("sx") * col("sy")) *
          (col("n") * col("sxy") - col("sx") * col("sy"))) /
          ((col("n") * col("sxx") - col("sx") * col("sx")) *
           (col("n") * col("syy") - col("sy") * col("sy"))), 6).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  private[graft] lazy val anLinregSql =
    """WITH m AS (
      |  SELECT l_returnflag, COUNT(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
      |  ROUND((sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n, 4) AS intercept,
      |  ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
      |        ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
      |FROM m ORDER BY l_returnflag""".stripMargin

  private[graft] def anMadOutliers(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderpriority").as("g"),
      (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    // raw-row medians: near-unique prices make a distinct-value groupBy
    // a no-reduction hash aggregate (it DOUBLED this query's bench
    // entry), so both medians run distinctRunningCounts scans over raw
    // rows and the outlier screen reuses the mad scan's distinct
    // (g, adev, cnt) rows — the orders-sized frame is never aggregated,
    // only range-sorted
    val med = groupedMedian2Raw(o, "g", "v").select(col("g"), col("med2"))
    val dev = o.join(broadcast(med), Seq("g"))
      .select(col("g"), abs(col("v") * 2 - col("med2")).as("adev")) // half-cents
    val madScan = graft.operators.PrefixSum.distinctRunningCounts(dev, Seq("g", "adev"))
    val wOff = Window.orderBy(col("g")).rowsBetween(Window.unboundedPreceding, -1)
    val probes = o.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum("n").over(wOff), lit(0L)))
      .withColumn("k_lo", expr("(n + 1) div 2"))
      .withColumn("k_hi", expr("n div 2 + 1"))
    val hitLo = col("cum") >= col("k_lo") && col("cum") - col("cnt") < col("k_lo")
    val hitHi = col("cum") >= col("k_hi") && col("cum") - col("cnt") < col("k_hi")
    val mad = madScan.join(broadcast(probes), Seq("g"))
      .withColumn("cum", col("cnt_cum") - col("off"))
      .filter(hitLo || hitHi)
      .groupBy(col("g"))
      .agg((max(when(hitLo, col("adev"))) + max(when(hitHi, col("adev")))).as("mad4"))
    // final screen over the mad scan's distinct rows (cnt-weighted), not
    // the raw deviation frame — quarter-cents mad4 vs half-cents adev
    madScan.join(broadcast(mad), Seq("g")).join(broadcast(med), Seq("g"))
      .groupBy(col("g").as("o_orderpriority"))
      .agg(sum(col("cnt")).as("n"),
        round(first(col("med2")).cast("double") / 200.0, 6).as("med"),
        round(first(col("mad4")).cast("double") / 400.0, 6).as("mad"),
        sum(when(lit(13490L) * col("adev") > lit(35000L) * col("mad4"), col("cnt"))
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col("o_orderpriority"))
  }

  private[graft] lazy val anMadOutliersSql =
    """WITH o AS (SELECT o_orderpriority AS g,
      |                  CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |           FROM orders),
      |pv AS (SELECT g, v, COUNT(*) AS cnt FROM o GROUP BY 1, 2),
      |cv AS (SELECT g, v, cnt, CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum
      |       FROM pv),
      |tv AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM pv GROUP BY g),
      |med AS (SELECT c.g,
      |          CAST(MAX(CASE WHEN cum >= (n+1)//2 AND cum - cnt < (n+1)//2 THEN v END)
      |             + MAX(CASE WHEN cum >= n//2+1 AND cum - cnt < n//2+1 THEN v END) AS BIGINT) AS med2
      |        FROM cv c JOIN tv USING (g) GROUP BY c.g),
      |dev AS (SELECT o.g, ABS(o.v * 2 - m.med2) AS adev FROM o JOIN med m USING (g)),
      |pa AS (SELECT g, adev, COUNT(*) AS cnt FROM dev GROUP BY 1, 2),
      |ca AS (SELECT g, adev, cnt, CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY adev) AS BIGINT) AS cum
      |       FROM pa),
      |mad AS (SELECT c.g,
      |          CAST(MAX(CASE WHEN cum >= (n+1)//2 AND cum - cnt < (n+1)//2 THEN adev END)
      |             + MAX(CASE WHEN cum >= n//2+1 AND cum - cnt < n//2+1 THEN adev END) AS BIGINT) AS mad4
      |        FROM ca c JOIN tv USING (g) GROUP BY c.g)
      |SELECT d.g AS o_orderpriority, COUNT(*) AS n,
      |  ROUND(CAST(ANY_VALUE(m.med2) AS DOUBLE) / 200.0, 6) AS med,
      |  ROUND(CAST(ANY_VALUE(a.mad4) AS DOUBLE) / 400.0, 6) AS mad,
      |  CAST(SUM(CASE WHEN 13490 * d.adev > 35000 * a.mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dev d JOIN mad a USING (g) JOIN med m USING (g)
      |GROUP BY d.g ORDER BY d.g""".stripMargin

  /** Time-weighted average per user — the IoT/metrics aggregate where a
    * reading holds until the next one arrives, so plain AVG over-weights
    * bursts. One window pass (lead on the per-user timeline) then a
    * grouped sum: hold durations are exact integer micros, the
    * value×duration products go through decimal sums for
    * order-independence, and the final division happens once in double.
    * Same shuffle shape as SCD2: a single exchange on the key. */
  private[graft] def anTwa(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("dur_us",
        lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
      .filter(col("dur_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_holds"),
        sum(col("dur_us")).as("span_us"),
        round(
          sum((col("value") * col("dur_us")).cast("decimal(38,6)")).cast("double") /
            sum(col("dur_us")).cast("double"), 6).as("twa"))
      .orderBy(col("user_id"))
  }

  private[graft] lazy val anTwaSql =
    """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events),
      |d AS (SELECT user_id, value,
      |        LEAD(tus, 1) OVER (PARTITION BY user_id ORDER BY tus, event_id) - tus AS dur_us
      |      FROM e)
      |SELECT user_id, COUNT(*) AS n_holds, CAST(SUM(dur_us) AS BIGINT) AS span_us,
      |  ROUND(CAST(SUM(CAST(value * dur_us AS DECIMAL(38,6))) AS DOUBLE) /
      |        CAST(SUM(dur_us) AS DOUBLE), 6) AS twa
      |FROM d WHERE dur_us IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Benford first-digit screen — the classic anomaly/fraud test on a
    * money column: observed leading-digit frequencies vs the Benford
    * expectation log10(1+1/d), with per-digit chi-square contributions.
    * The digit is extracted through INTEGER string conversion (never
    * double formatting, which engines disagree on); counts are exact,
    * the only floating math is the final expected/chi2 arithmetic on
    * exactly-equal inputs, rounded. One groupBy on a 9-value key. */
  private[graft] def anBenford(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      // floor, not a bare bigint cast: Spark's double→long truncates
      // while other engines round — floor pins the semantics everywhere
      .select(substring(floor(col("o_totalprice")).cast("bigint").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .filter(col("digit") >= 1) // sub-1.0 values have no leading digit
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = o.agg(sum(col("n")).cast("double").as("tot"))
    o.crossJoin(broadcast(tot))
      .withColumn("expected", col("tot") * log(10.0, lit(1.0) + lit(1.0) / col("digit")))
      .select(col("digit"), col("n"),
        round(col("n") / col("tot"), 6).as("pct"),
        round(col("expected"), 2).as("exp_n"),
        round(pow(col("n") - col("expected"), 2) / col("expected"), 6).as("chi2_part"))
      .orderBy(col("digit"))
  }

  private[graft] lazy val anBenfordSql =
    """WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      |           FROM orders),
      |c AS (SELECT digit, COUNT(*) AS n FROM d WHERE digit >= 1 GROUP BY digit),
      |t AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot FROM c)
      |SELECT digit, n,
      |  ROUND(n / tot, 6) AS pct,
      |  ROUND(tot * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 2) AS exp_n,
      |  ROUND(POW(n - tot * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 2)
      |        / (tot * log10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 6) AS chi2_part
      |FROM c, t ORDER BY digit""".stripMargin

  /** Sliding mean-shift scan — change detection over the daily revenue
    * series: at each day, the mean of the trailing 14 days vs the mean
    * of the leading 14 days (two RANGE frames over epoch days), flag
    * where the level moved by more than the threshold. Both window
    * means come from exact decimal sums ÷ exact counts, so the scan is
    * engine-reproducible; the series itself is one groupBy of the fact
    * table and the windows never leave the single time-ordered
    * partition spine (range-partitioned by date at scale). */
  private[graft] def anMeanShift(s: SparkSession, dir: String): DataFrame = {
    // cents as BIGINT: every window sum, mean (integer division at 1e-4
    // scale) and the threshold compare below is pure integer arithmetic
    // — bit-identical on any engine, no double-rounding boundaries
    val daily = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"))
      .withColumn("d", datediff(col("day").cast("date"), lit("1992-01-01").cast("date")))
    val pre = Window.orderBy(col("d")).rangeBetween(-14, -1)
    val post = Window.orderBy(col("d")).rangeBetween(0, 13)
    daily
      .withColumn("pre_s", sum(col("rev_c")).over(pre) * 100)
      .withColumn("pre_n", count(lit(1)).over(pre))
      .withColumn("post_s", sum(col("rev_c")).over(post) * 100)
      .withColumn("post_n", count(lit(1)).over(post))
      .withColumn("pre_q", expr("pre_s div pre_n"))
      .withColumn("post_q", expr("post_s div post_n"))
      .filter(col("pre_q").isNotNull)
      .select(col("day"),
        (col("pre_q") / 10000.0).as("pre_mean"),
        (col("post_q") / 10000.0).as("post_mean"),
        ((col("post_q") - col("pre_q")) / 10000.0).as("shift"),
        (abs(col("post_q") - col("pre_q")) * 2 > col("pre_q")).as("flagged"))
      .orderBy(col("day"))
  }

  private[graft] lazy val anMeanShiftSql =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |         CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rev_c
      |  FROM lineitem GROUP BY 1),
      |dd AS (SELECT day, rev_c,
      |         date_diff('day', DATE '1992-01-01', CAST(day AS DATE)) AS d FROM daily),
      |w AS (SELECT day,
      |        (SUM(rev_c) OVER pre * 100) // (COUNT(*) OVER pre) AS pre_q,
      |        (SUM(rev_c) OVER post * 100) // (COUNT(*) OVER post) AS post_q
      |      FROM dd
      |      WINDOW pre AS (ORDER BY d RANGE BETWEEN 14 PRECEDING AND 1 PRECEDING),
      |             post AS (ORDER BY d RANGE BETWEEN CURRENT ROW AND 13 FOLLOWING))
      |SELECT day, pre_q / 10000.0 AS pre_mean, post_q / 10000.0 AS post_mean,
      |  (post_q - pre_q) / 10000.0 AS shift,
      |  ABS(post_q - pre_q) * 2 > pre_q AS flagged
      |FROM w WHERE pre_q IS NOT NULL ORDER BY day""".stripMargin

  /** Lag-k autocorrelation of the daily revenue series (k = 1 and 7 —
    * day-over-day persistence and weekly seasonality): pairs from a lag
    * window, then the exact-decimal-power-sum correlation of
    * [[anStatsMoments]] over each pair set. One narrow window pass plus
    * a two-row aggregate. */
  private[graft] def anAutocorr(s: SparkSession, dir: String): DataFrame = {
    def dsum(c: Column) = sum(c.cast("decimal(38,8)")).cast("double")
    val daily = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)").cast("double").as("rev"))
    val w = Window.orderBy(col("day"))
    val lagged = daily.select(col("rev").as("x"),
      lag(col("rev"), 1).over(w).as("l1"),
      lag(col("rev"), 7).over(w).as("l7"))
    def corrOf(yc: String) = {
      val p = lagged.filter(col(yc).isNotNull)
        .agg(count(lit(1)).as("n"), dsum(col("x")).as("sx"), dsum(col(yc)).as("sy"),
          dsum(col("x") * col("x")).as("sxx"), dsum(col(yc) * col(yc)).as("syy"),
          dsum(col("x") * col(yc)).as("sxy"))
      p.select(lit(yc).as("lag"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
           sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 9).as("autocorr"))
    }
    corrOf("l1").unionByName(corrOf("l7")).orderBy(col("lag"))
  }

  private[graft] lazy val anAutocorrSql =
    """WITH daily AS (
      |  SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) AS DOUBLE) AS rev
      |  FROM lineitem GROUP BY 1),
      |lagged AS (
      |  SELECT rev AS x,
      |    LAG(rev, 1) OVER (ORDER BY day) AS l1,
      |    LAG(rev, 7) OVER (ORDER BY day) AS l7
      |  FROM daily),
      |s AS (
      |  SELECT 'l1' AS lag, COUNT(*) AS n,
      |    CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l1 AS DECIMAL(38,8))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l1 * l1 AS DECIMAL(38,8))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(x * l1 AS DECIMAL(38,8))) AS DOUBLE) AS sxy
      |  FROM lagged WHERE l1 IS NOT NULL
      |  UNION ALL
      |  SELECT 'l7', COUNT(*),
      |    CAST(SUM(CAST(x AS DECIMAL(38,8))) AS DOUBLE),
      |    CAST(SUM(CAST(l7 AS DECIMAL(38,8))) AS DOUBLE),
      |    CAST(SUM(CAST(x * x AS DECIMAL(38,8))) AS DOUBLE),
      |    CAST(SUM(CAST(l7 * l7 AS DECIMAL(38,8))) AS DOUBLE),
      |    CAST(SUM(CAST(x * l7 AS DECIMAL(38,8))) AS DOUBLE)
      |  FROM lagged WHERE l7 IS NOT NULL)
      |SELECT lag, n,
      |  ROUND((n * sxy - sx * sy) /
      |        (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9) AS autocorr
      |FROM s ORDER BY lag""".stripMargin

  /** Two-sample Kolmogorov–Smirnov test between the finished ('F') and
    * open ('O') order-price distributions — the train/serve
    * distribution-drift check a feature pipeline runs before every
    * refresh. Integer-exact: prices become cents BIGINT through the
    * decimal cast (never a double*100 truncation), the two ECDFs are
    * cumulative counts over DISTINCT cents values, and the KS statistic
    * is maximized as the integer cross-product |c1·n2 − c2·n1| — only
    * the final d_stat emission divides. Scale shape: one groupBy
    * collapses the corpus to distinct values, then
    * [[graft.operators.PrefixSum]] computes both running counts as a
    * distributed two-pass scan — no single-partition window anywhere.
    * Ties are impossible after the distinct-value aggregate, so the
    * scan's unique-order-key contract holds. */
  private[graft] def anKsDrift(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .filter(col("o_orderstatus").isin("F", "O"))
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("g1"),
        when(col("o_orderstatus") === "O", 1L).otherwise(0L).as("g2"))
    val perV = base.groupBy("v").agg(sum(col("g1")).as("c1"), sum(col("g2")).as("c2"))
    val cum = graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("c1", "c2"))
    val tot = perV.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    cum.crossJoin(broadcast(tot))
      .select(col("v"), col("n1"), col("n2"),
        abs(col("c1_cum") * col("n2") - col("c2_cum") * col("n1")).as("d_num"))
      .agg(max(struct(col("d_num"), col("v"), col("n1"), col("n2"))).as("m"))
      .select(col("m.n1").as("n1"), col("m.n2").as("n2"),
        col("m.d_num").as("d_num"), col("m.v").as("v_at"),
        // unrounded: exact-int divisions are IEEE correctly-rounded, so the
        // identical expression tree is bit-identical cross-engine; ROUND(·,9)
        // itself is the divergent op (SURVEY §5, the an_ewma lesson)
        ((col("m.d_num").cast("double") / col("m.n1").cast("double"))
          / col("m.n2").cast("double")).as("d_stat"))
  }

  private[graft] lazy val anKsDriftSql =
    """WITH b AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v,
      |                  o_orderstatus AS st
      |           FROM orders WHERE o_orderstatus IN ('F','O')),
      |p AS (SELECT v, COUNT(*) FILTER (WHERE st = 'F') AS c1,
      |               COUNT(*) FILTER (WHERE st = 'O') AS c2
      |      FROM b GROUP BY v),
      |c AS (SELECT v, CAST(SUM(c1) OVER (ORDER BY v) AS BIGINT) AS c1c,
      |               CAST(SUM(c2) OVER (ORDER BY v) AS BIGINT) AS c2c FROM p),
      |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM p),
      |d AS (SELECT v, n1, n2, CAST(ABS(c1c*n2 - c2c*n1) AS BIGINT) AS d_num FROM c, t)
      |SELECT n1, n2, d_num, v AS v_at,
      |       (CAST(d_num AS DOUBLE) / CAST(n1 AS DOUBLE)) / CAST(n2 AS DOUBLE) AS d_stat
      |FROM d ORDER BY d_num DESC, v DESC LIMIT 1""".stripMargin

  /** Gini coefficient of customer spend concentration (the
    * "how skewed is my corpus/revenue" audit): per-customer spend in
    * cents BIGINT, globally ranked ascending by (spend, custkey) —
    * a UNIQUE order, so ranks are well-defined — through the
    * [[graft.operators.PrefixSum]] distributed scan instead of a
    * single-partition ROW_NUMBER window. G = (2·Σrᵢxᵢ − (n+1)·Σxᵢ)
    * / (n·Σxᵢ): the rank-weighted sum goes through DECIMAL(38,0)
    * (the per-element product stays in BIGINT range; the SUM would
    * not past sf1), and only the final ratio divides in double. */
  private[graft] def anGini(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg((sum(col("o_totalprice").cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("x"))
    val ranked = graft.operators.PrefixSum
      .withRunningTotals(spend, Seq("x", "o_custkey"), Seq("x"))
    val a = ranked.agg(count(lit(1)).as("n"), sum(col("x")).as("sum_cents"),
      sum((col("x") * col("rn")).cast("decimal(38,0)")).cast("double").as("w"))
    // unrounded: every input is an exactly-cast integer and the tree is
    // identical on both engines — +,·,/ are IEEE correctly-rounded
    a.select(col("n"), col("sum_cents"), col("w").as("rank_weighted"),
      ((lit(2.0) * col("w")
          - (col("n").cast("double") + lit(1.0)) * col("sum_cents").cast("double"))
        / (col("n").cast("double") * col("sum_cents").cast("double"))).as("gini"))
  }

  private[graft] lazy val anGiniSql =
    """WITH spend AS (SELECT o_custkey,
      |    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS x
      |  FROM orders GROUP BY o_custkey),
      |r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS rn FROM spend),
      |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sum_cents,
      |             CAST(SUM(CAST(x * rn AS DECIMAL(38,0))) AS DOUBLE) AS w FROM r)
      |SELECT n, sum_cents, w AS rank_weighted,
      |  (2.0*w - (CAST(n AS DOUBLE)+1.0)*CAST(sum_cents AS DOUBLE)) /
      |  (CAST(n AS DOUBLE)*CAST(sum_cents AS DOUBLE)) AS gini
      |FROM a""".stripMargin

  /** Day-of-week seasonality decomposition of the daily revenue series:
    * per-ISO-weekday day counts, revenue cents, the integer deviation
    * numerator rev·total_days − total_rev·n_days (sign = above/below
    * trend, exact), and the seasonal index (dow mean ÷ overall mean).
    * The series is one groupBy of the fact table; the dow rollup is a
    * 7-row aggregate with its totals broadcast back. */
  private[graft] def anSeasonalDow(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"))
    val byDow = daily
      .groupBy((weekday(col("day")) + 1).cast("long").as("dow"))
      .agg(count(lit(1)).as("n_days"), sum("rev_c").as("rev"))
    val tot = byDow.agg(sum("n_days").as("td"), sum("rev").as("tr"))
    byDow.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_days"), col("rev"),
        (col("rev") * col("td") - col("tr") * col("n_days")).as("dev_num"),
        // unrounded: int-fed IEEE divisions, identical tree both engines
        ((col("rev").cast("double") / col("n_days").cast("double"))
          / (col("tr").cast("double") / col("td").cast("double"))).as("seasonal_idx"))
      .orderBy("dow")
  }

  private[graft] lazy val anSeasonalDowSql =
    """WITH daily AS (SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rev_c
      |  FROM lineitem GROUP BY 1),
      |d AS (SELECT CAST(isodow(CAST(day AS DATE)) AS BIGINT) AS dow, COUNT(*) AS n_days,
      |             CAST(SUM(rev_c) AS BIGINT) AS rev FROM daily GROUP BY 1),
      |t AS (SELECT CAST(SUM(n_days) AS BIGINT) AS td, CAST(SUM(rev) AS BIGINT) AS tr FROM d)
      |SELECT dow, n_days, rev, CAST(rev*td - tr*n_days AS BIGINT) AS dev_num,
      |  (CAST(rev AS DOUBLE) / CAST(n_days AS DOUBLE)) /
      |  (CAST(tr AS DOUBLE) / CAST(td AS DOUBLE)) AS seasonal_idx
      |FROM d, t ORDER BY dow""".stripMargin

  /** Truncated EWMA of the daily revenue series with DYADIC weights —
    * α = 1/2, so the k-th lag's weight 2^(19−k) is exactly
    * representable and the whole smoothing numerator is one BIGINT
    * dot-product over the last 20 days: bit-identical on any engine,
    * where a recursive float EWMA would drift by evaluation order.
    * Truncation at 20 taps discards < 2^-20 of the mass (the standard
    * windowed-EWMA form); warm-up rows (rn < 20) are not emitted. One
    * groupBy builds the series; the lag window rides the same
    * time-ordered spine as [[anMeanShift]] (range-partitioned by date
    * at scale). */
  private[graft] def anEwma(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"))
    val w = Window.orderBy(col("day"))
    val num = (0 until 20)
      .map(k => lag(col("rev_c"), k).over(w) * lit(1L << (19 - k)))
      .reduce(_ + _)
    daily
      .select(col("day"), col("rev_c"),
        row_number().over(w).as("rn"), num.as("ewma_num"))
      .filter(col("rn") >= 20)
      .select(col("day"), col("rev_c"), col("ewma_num"),
        // no ROUND: the division of a shared BIGINT by two constants is
        // already bit-identical IEEE; rounding to 9 places would
        // DIVERGE by an ulp where engines' round impls disagree
        (col("ewma_num").cast("double") / lit(1048575.0) / lit(100.0)).as("ewma"))
      .orderBy(col("day"))
  }

  private[graft] lazy val anEwmaSql = {
    val terms = (0 until 20)
      .map(k => s"LAG(rev_c, $k) OVER (ORDER BY day) * ${1L << (19 - k)}")
      .mkString(" + ")
    s"""WITH daily AS (SELECT date_trunc('day', l_shipdate) AS day,
       |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rev_c
       |  FROM lineitem GROUP BY 1),
       |w AS (SELECT day, rev_c, ROW_NUMBER() OVER (ORDER BY day) AS rn,
       |        $terms AS ewma_num
       |      FROM daily)
       |SELECT day, rev_c, CAST(ewma_num AS BIGINT) AS ewma_num,
       |  CAST(ewma_num AS DOUBLE) / 1048575.0 / 100.0 AS ewma
       |FROM w WHERE rn >= 20 ORDER BY day""".stripMargin
  }

  /** Categorical distribution drift via the chi-square statistic —
    * completes the drift pair with [[anKsDrift]] (numeric): the
    * order-priority mix before 1998 (reference window) vs after
    * (current window). Integer-exact cross-products: dev_num =
    * c·R − r·C (sums to zero over categories, a spec invariant), and
    * the per-category chi-square part (c−e)²/e algebraically
    * rearranged to dev_num²/(R·C·r) — evaluated as an explicit
    * double expression tree both engines compute bit-identically
    * (no ROUND: shared integer inputs + same IEEE ops need none).
    * One groupBy over the fact table; totals broadcast back. */
  private[graft] def anChi2Drift(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir).select(col("o_orderpriority").as("cat"),
      when(col("o_orderdate") < lit("1998-01-01").cast("timestamp"), 1L)
        .otherwise(0L).as("is_ref"))
    val perCat = base.groupBy("cat")
      .agg(sum(col("is_ref")).as("r"), sum(lit(1L) - col("is_ref")).as("c"))
    val tot = perCat.agg(sum("r").as("rt"), sum("c").as("ct"))
    val dn = col("c") * col("rt") - col("r") * col("ct")
    perCat.crossJoin(broadcast(tot))
      .select(col("cat"), col("r"), col("c"), dn.as("dev_num"),
        when(col("r") > 0,
          (dn.cast("double") * dn.cast("double")) /
            ((col("rt").cast("double") * col("ct").cast("double")) * col("r").cast("double")))
          .as("chi2_part"))
      .orderBy("cat")
  }

  private[graft] lazy val anChi2DriftSql =
    """WITH b AS (SELECT o_orderpriority AS cat,
      |                  CASE WHEN o_orderdate < TIMESTAMP '1998-01-01' THEN 1 ELSE 0 END AS is_ref
      |           FROM orders),
      |p AS (SELECT cat, CAST(SUM(is_ref) AS BIGINT) AS r,
      |             CAST(SUM(1 - is_ref) AS BIGINT) AS c FROM b GROUP BY cat),
      |t AS (SELECT CAST(SUM(r) AS BIGINT) AS rt, CAST(SUM(c) AS BIGINT) AS ct FROM p)
      |SELECT cat, r, c, CAST(c*rt - r*ct AS BIGINT) AS dev_num,
      |  CASE WHEN r > 0 THEN
      |    (CAST(c*rt - r*ct AS DOUBLE) * CAST(c*rt - r*ct AS DOUBLE))
      |    / ((CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)) * CAST(r AS DOUBLE))
      |  END AS chi2_part
      |FROM p, t ORDER BY cat""".stripMargin

  /** Two-proportion z-test (A/B experiment readout): variants by
    * user-id parity, success = the user ever made a HIGH-VALUE
    * purchase (≥100 — plain "ever purchased" is degenerate here: every
    * user converts and the pooled variance is zero). Counts are exact
    * integers; the z statistic is one shared double expression tree —
    * division and sqrt are both correctly-rounded under IEEE 754, so
    * both engines emit the IDENTICAL double with no rounding fuzz.
    * Two same-key aggregates, then a 2-row pivot. */
  private[graft] def anAbtest(s: SparkSession, dir: String): DataFrame = {
    val zExpr =
      """(CAST(c1 AS DOUBLE)/CAST(n1 AS DOUBLE) - CAST(c2 AS DOUBLE)/CAST(n2 AS DOUBLE))
        | / sqrt((CAST(c1+c2 AS DOUBLE)/CAST(n1+n2 AS DOUBLE))
        |        * (1.0 - CAST(c1+c2 AS DOUBLE)/CAST(n1+n2 AS DOUBLE))
        |        * (1.0/CAST(n1 AS DOUBLE) + 1.0/CAST(n2 AS DOUBLE)))""".stripMargin
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max((col("event_type") === "purchase" && col("value") >= 100.0)
        .cast("long")).as("conv"))
      .groupBy((col("user_id") % 2).as("variant"))
      .agg(count(lit(1)).as("n"), sum("conv").as("c"))
      .agg(sum(when(col("variant") === 0, col("n"))).as("n1"),
        sum(when(col("variant") === 0, col("c"))).as("c1"),
        sum(when(col("variant") === 1, col("n"))).as("n2"),
        sum(when(col("variant") === 1, col("c"))).as("c2"))
      .withColumn("z", expr(zExpr))
  }

  private[graft] lazy val anAbtestSql =
    """WITH u AS (SELECT user_id,
      |             MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0
      |                 THEN 1 ELSE 0 END) AS conv
      |           FROM events GROUP BY user_id),
      |v AS (SELECT user_id % 2 AS variant, COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS c
      |      FROM u GROUP BY 1),
      |w AS (SELECT
      |        CAST(SUM(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n1,
      |        CAST(SUM(CASE WHEN variant = 0 THEN c END) AS BIGINT) AS c1,
      |        CAST(SUM(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n2,
      |        CAST(SUM(CASE WHEN variant = 1 THEN c END) AS BIGINT) AS c2
      |      FROM v)
      |SELECT n1, c1, n2, c2,
      |  (CAST(c1 AS DOUBLE)/CAST(n1 AS DOUBLE) - CAST(c2 AS DOUBLE)/CAST(n2 AS DOUBLE))
      |  / sqrt((CAST(c1+c2 AS DOUBLE)/CAST(n1+n2 AS DOUBLE))
      |         * (1.0 - CAST(c1+c2 AS DOUBLE)/CAST(n1+n2 AS DOUBLE))
      |         * (1.0/CAST(n1 AS DOUBLE) + 1.0/CAST(n2 AS DOUBLE))) AS z
      |FROM w""".stripMargin

  /** Shannon entropy of the corpus composition (source mix and language
    * mix — the "how diverse is my training mixture" audit). Numeric
    * discipline for an irrational-valued aggregate: H = ln(N) −
    * (Σ c·ln c)/N, where each c·ln c term is cast to DECIMAL(38,18)
    * before summing (order-independent, the q_pagerank gather
    * pattern — a plain double sum would be partition-order dependent),
    * and the emission is ROUND(·, 6) to absorb the ≤1-ulp libm ln()
    * skew between engines (the an_benford precedent). Normalized
    * entropy H/ln(k) reads as 0..1 balance. One groupBy per dimension
    * over tiny category tables. */
  private[graft] def anEntropy(s: SparkSession, dir: String): DataFrame = {
    def entropyOf(dim: String): DataFrame = {
      val cat = Tables.documents(s, dir).groupBy(col(dim).as("cat"))
        .agg(count(lit(1)).as("c"))
      cat.agg(count(lit(1)).as("k"), sum("c").as("n"),
          sum((col("c").cast("double") * log(col("c").cast("double")))
            .cast("decimal(38,18)")).as("s"))
        .select(lit(dim).as("dim"), col("k"), col("n"),
          round(log(col("n").cast("double"))
            - col("s").cast("double") / col("n").cast("double"), 6).as("h_nats"),
          round((log(col("n").cast("double"))
            - col("s").cast("double") / col("n").cast("double"))
            / log(col("k").cast("double")), 6).as("h_norm"))
    }
    entropyOf("source").unionByName(entropyOf("lang")).orderBy("dim")
  }

  private[graft] lazy val anEntropySql = {
    def one(dim: String) =
      s"""SELECT '$dim' AS dim, k, n,
         |  ROUND(ln(CAST(n AS DOUBLE)) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS h_nats,
         |  ROUND((ln(CAST(n AS DOUBLE)) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
         |        / ln(CAST(k AS DOUBLE)), 6) AS h_norm
         |FROM (SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(c) AS BIGINT) AS n,
         |             SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS DECIMAL(38,18))) AS s
         |      FROM (SELECT $dim, COUNT(*) AS c FROM documents GROUP BY $dim))""".stripMargin
    s"""${one("source")}
       |UNION ALL
       |${one("lang")}
       |ORDER BY dim""".stripMargin
  }

  /** Cumulative user-growth curve: each user's first-seen day, new
    * users per day, and the running total through the
    * [[graft.operators.PrefixSum]] distributed scan (days are unique
    * after the per-day rollup — the scan's contract). Two same-key
    * exchanges (user, then day); the growth curve never funnels
    * through a single-partition window. */
  private[graft] def anUserGrowth(s: SparkSession, dir: String): DataFrame = {
    val firstSeen = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(min(date_trunc("day", col("ts"))).as("day"))
    val perDay = firstSeen.groupBy("day").agg(count(lit(1)).as("new_users"))
    graft.operators.PrefixSum.withRunningTotals(perDay, Seq("day"), Seq("new_users"))
      .select(col("day"), col("new_users"), col("new_users_cum").as("cum_users"))
      .orderBy("day")
  }

  private[graft] lazy val anUserGrowthSql =
    """WITH f AS (SELECT user_id, MIN(date_trunc('day', ts)) AS day
      |           FROM events GROUP BY user_id),
      |d AS (SELECT day, COUNT(*) AS new_users FROM f GROUP BY day)
      |SELECT day, new_users,
      |       CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
      |FROM d ORDER BY day""".stripMargin

  /** CUSUM change-point detection over the daily revenue series —
    * the classic "when did the level move" scan, fully integer: the
    * per-day deviation is scaled by n (dev = rev·n − S, so no division
    * ever happens) and its running sum comes from the
    * [[graft.operators.PrefixSum]] distributed scan; the extreme
    * excursions and their argmax/argmin days (struct-ordered
    * tie-breaks) are the change-point report. Complements
    * [[anMeanShift]] (local windows) with the global-drift view. */
  private[graft] def anCusum(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"))
    val tot = daily.agg(count(lit(1)).as("n"), sum("rev_c").as("s"))
    val dev = daily.crossJoin(broadcast(tot))
      .select(col("day"), (col("rev_c") * col("n") - col("s")).as("dev"))
    val scan = graft.operators.PrefixSum.withRunningTotals(dev, Seq("day"), Seq("dev"))
    scan.agg(count(lit(1)).as("n"),
        max(struct(col("dev_cum"), col("day"))).as("hi"),
        min(struct(col("dev_cum"), col("day"))).as("lo"))
      .select(col("n"), col("hi.dev_cum").as("max_cusum"), col("hi.day").as("max_day"),
        col("lo.dev_cum").as("min_cusum"), col("lo.day").as("min_day"))
  }

  private[graft] lazy val anCusumSql =
    """WITH daily AS (SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rev_c
      |  FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rev_c) AS BIGINT) AS s FROM daily),
      |c AS (SELECT day, CAST(SUM(rev_c*n - s) OVER (ORDER BY day) AS BIGINT) AS cum
      |      FROM daily, t),
      |hi AS (SELECT cum AS max_cusum, day AS max_day FROM c ORDER BY cum DESC, day DESC LIMIT 1),
      |lo AS (SELECT cum AS min_cusum, day AS min_day FROM c ORDER BY cum ASC, day ASC LIMIT 1)
      |SELECT n, max_cusum, max_day, min_cusum, min_day FROM t, hi, lo""".stripMargin

  /** Cohort lifetime-value matrix: users grouped by first-seen day,
    * purchase revenue rolled up per (cohort, day-age), and the
    * running LTV per cohort — the window partitions BY COHORT, so the
    * cumulative sum never leaves a key's partition (contrast the
    * global scans above). Revenue stays in cents BIGINT end to end. */
  private[graft] def anCohortLtv(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val firstSeen = ev.groupBy(col("user_id"))
      .agg(min(date_trunc("day", col("ts"))).as("cohort_day"))
    val rev = ev.filter(col("event_type") === "purchase")
      .join(firstSeen, "user_id")
      .groupBy(col("cohort_day"),
        datediff(date_trunc("day", col("ts")).cast("date"),
          col("cohort_day").cast("date")).cast("long").as("age"))
      .agg((sum(col("value").cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"))
    val w = Window.partitionBy("cohort_day").orderBy("age")
    rev.withColumn("ltv_c", sum("rev_c").over(w))
      .orderBy("cohort_day", "age")
  }

  private[graft] lazy val anCohortLtvSql =
    """WITH f AS (SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
      |           FROM events GROUP BY user_id),
      |r AS (SELECT cohort_day,
      |        CAST(date_diff('day', CAST(cohort_day AS DATE),
      |                       CAST(date_trunc('day', e.ts) AS DATE)) AS BIGINT) AS age,
      |        CAST(ROUND(SUM(CAST(e.value AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rev_c
      |      FROM events e JOIN f USING (user_id)
      |      WHERE e.event_type = 'purchase'
      |      GROUP BY 1, 2)
      |SELECT cohort_day, age, rev_c,
      |       CAST(SUM(rev_c) OVER (PARTITION BY cohort_day ORDER BY age) AS BIGINT) AS ltv_c
      |FROM r ORDER BY cohort_day, age""".stripMargin

  /** Seasonal-naive forecast backtest (ŷ_t = y_{t−7}) over the last 28
    * days of the revenue series — the baseline any forecasting pipeline
    * must beat, with integer-exact error accounting: per-day absolute
    * errors in cents, summed exactly; the relative error is one final
    * division. Lag + tail-filter on the time spine; everything before
    * the 28-day holdout only feeds the lag. */
  private[graft] def anForecastNaive(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"))
    val w = Window.orderBy(col("day"))
    daily
      .select(col("day"), col("rev_c"),
        lag(col("rev_c"), 7).over(w).as("pred_c"),
        row_number().over(Window.orderBy(col("day").desc)).as("rd"))
      .filter(col("rd") <= 28 && col("pred_c").isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(abs(col("rev_c") - col("pred_c"))).as("abs_err_c"),
        sum("rev_c").as("actual_c"))
      .withColumn("rel_err",
        col("abs_err_c").cast("double") / col("actual_c").cast("double"))
  }

  private[graft] lazy val anForecastNaiveSql =
    """WITH daily AS (SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rev_c
      |  FROM lineitem GROUP BY 1),
      |l AS (SELECT day, rev_c,
      |        LAG(rev_c, 7) OVER (ORDER BY day) AS pred_c,
      |        ROW_NUMBER() OVER (ORDER BY day DESC) AS rd
      |      FROM daily)
      |SELECT COUNT(*) AS n,
      |  CAST(SUM(ABS(rev_c - pred_c)) AS BIGINT) AS abs_err_c,
      |  CAST(SUM(rev_c) AS BIGINT) AS actual_c,
      |  CAST(SUM(ABS(rev_c - pred_c)) AS DOUBLE) / CAST(SUM(rev_c) AS DOUBLE) AS rel_err
      |FROM l WHERE rd <= 28 AND pred_c IS NOT NULL""".stripMargin

  /** Multi-horizon rolling-origin backtest of the naive forecaster
    * (ŷ_t = y_{t−h}, h = 1..7) over the last-28-day holdout of daily
    * revenue — the "which lead time is still usable" evaluation a
    * forecasting pipeline runs before promoting a model (one WAPE
    * number per horizon, not one blended score). The horizon fan-out
    * is a 7-element `sequence` explode on the day spine joined back by
    * exact epoch-day keys; per-day errors are exact cents, MAE and
    * signed bias sum as BIGINTs, and WAPE is the single final
    * division. The spine is days-sized, so the global row_number
    * window is bounded by the calendar, not the data. */
  private[graft] def anMapeBacktest(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"))
      .select(datediff(col("day").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("dno"), col("rev_c"))
    val holdout = daily
      .withColumn("rd", row_number().over(Window.orderBy(col("dno").desc)))
      .filter(col("rd") <= 28)
      .select(col("dno"), col("rev_c"),
        explode(sequence(lit(1L), lit(7L))).as("h"))
      .withColumn("pdno", col("dno") - col("h"))
    holdout
      .join(daily.select(col("dno").as("pdno"), col("rev_c").as("pred_c")), "pdno")
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n"),
        sum(abs(col("rev_c") - col("pred_c"))).as("abs_err_c"),
        sum(col("rev_c") - col("pred_c")).as("bias_c"),
        sum("rev_c").as("actual_c"))
      .withColumn("wape",
        col("abs_err_c").cast("double") / col("actual_c").cast("double"))
      .orderBy(col("h"))
  }

  private[graft] lazy val anMapeBacktestSql =
    """WITH daily AS (SELECT
      |    CAST(date_diff('day', DATE '1970-01-01',
      |                   CAST(date_trunc('day', l_shipdate) AS DATE)) AS BIGINT) AS dno,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rev_c
      |  FROM lineitem GROUP BY 1),
      |hold AS (SELECT dno, rev_c FROM (
      |    SELECT dno, rev_c, ROW_NUMBER() OVER (ORDER BY dno DESC) AS rd FROM daily) t
      |  WHERE rd <= 28),
      |x AS (SELECT CAST(t.range AS BIGINT) AS h, ho.dno, ho.rev_c
      |      FROM hold ho CROSS JOIN range(1, 8) t),
      |j AS (SELECT x.h, x.rev_c, p.rev_c AS pred_c
      |      FROM x JOIN daily p ON p.dno = x.dno - x.h)
      |SELECT h, COUNT(*) AS n,
      |  CAST(SUM(ABS(rev_c - pred_c)) AS BIGINT) AS abs_err_c,
      |  CAST(SUM(rev_c - pred_c) AS BIGINT) AS bias_c,
      |  CAST(SUM(rev_c) AS BIGINT) AS actual_c,
      |  CAST(SUM(ABS(rev_c - pred_c)) AS DOUBLE) / CAST(SUM(rev_c) AS DOUBLE) AS wape
      |FROM j GROUP BY h ORDER BY h""".stripMargin

  /** Top user journeys: each user's first five events (deterministic
    * (ts, event_id) order) joined into a path string, counted and
    * ranked — the product-analytics "what do users actually do" query.
    * The per-user window is PARTITIONED (never global), path assembly
    * is the dedup_segments sorted-collect idiom, and only the tiny
    * path→count table is globally ranked. */
  private[graft] def anUserPaths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), row_number().over(w).as("rn"))
      .filter(col("rn") <= 5)
      .groupBy("user_id")
      .agg(expr("array_join(transform(array_sort(collect_list(struct(rn, event_type))), x -> x.event_type), '>')")
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path")).limit(10)
  }

  private[graft] lazy val anUserPathsSql =
    """WITH e AS (SELECT user_id, event_type,
      |             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |           FROM events),
      |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      |      FROM e WHERE rn <= 5 GROUP BY user_id)
      |SELECT path, COUNT(*) AS n FROM p GROUP BY path
      |ORDER BY n DESC, path LIMIT 10""".stripMargin

  /** Event-type Markov transition matrix (the path-analysis companion
    * to [[anUserPaths]]): per-user lag pairs under the deterministic
    * (ts, event_id) order, integer transition counts, and row
    * probabilities as one shared double division. The lag window is
    * per-user partitioned; the (from × to) matrix is category-sized. */
  private[graft] def anMarkov(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("event_type").as("to_type"),
        lag(col("event_type"), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy("from_type")
    pairs
      .withColumn("row_total", sum("n").over(wf))
      .withColumn("p", col("n").cast("double") / col("row_total").cast("double"))
      .orderBy("from_type", "to_type")
  }

  private[graft] lazy val anMarkovSql =
    """WITH e AS (SELECT user_id, event_type AS to_type,
      |             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      |           FROM events),
      |c AS (SELECT from_type, to_type, COUNT(*) AS n
      |      FROM e WHERE from_type IS NOT NULL GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |       CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total,
      |       CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
      |FROM c ORDER BY from_type, to_type""".stripMargin

  /** RFM segmentation (recency / frequency / monetary quintiles) with
    * the scale-correct assignment: exact quintile BOUNDARIES come from
    * [[graft.operators.PrefixSum]] crossing-row probes over each
    * dimension's distinct-value counts (the q_exact_median machinery,
    * rank ⌈k·n/5⌉), the 12 boundary values broadcast back, and every
    * customer is scored MAP-SIDE against them — no global rank over
    * the customer table itself. Ties share a bucket (boundaries are
    * order statistics), so the segmentation is deterministic on any
    * engine. Emits segment sizes and per-segment averages. */
  private[graft] def anRfm(s: SparkSession, dir: String): DataFrame = {
    val maxDate = Tables.orders(s, dir).agg(max(col("o_orderdate")).as("mx"))
    // cached: the per-customer aggregate feeds three boundary scans AND
    // the final scoring pass — uncached it recomputes the orders groupBy
    // seven times (measured 2× the whole query's cost at sf0.1).
    // Freed by the harness-wide clearCache between queries.
    val rfm = Tables.orders(s, dir).crossJoin(broadcast(maxDate))
      .groupBy(col("o_custkey"))
      .agg(min(datediff(col("mx").cast("date"), col("o_orderdate").cast("date")).cast("long"))
          .as("recency"),
        count(lit(1)).as("frequency"),
        (sum(col("o_totalprice").cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
          .cast("bigint").as("monetary"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE boundary pass for all three dimensions (was three separate
    // distinct-value scans over the same per-customer aggregate): unpivot
    // to (dim, v), count distinct values once, run a single PrefixSum
    // scan ordered by (dim, v), and rebase each dim's running total by
    // the lexicographically-prior dims' row counts — the Clean.medians
    // fused-boundary precedent applied across dimensions.
    val perV = rfm
      .selectExpr("stack(3, 'recency', recency, 'frequency', frequency, " +
        "'monetary', monetary) as (dim, v)")
      .groupBy(col("dim"), col("v")).agg(count(lit(1)).as("cnt"))
    // distinct-value tables here are customer-aggregate-sized; 8 scan
    // partitions keep the narrow passes from being all task overhead
    val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("dim", "v"),
      Seq("cnt"), numParts = 8)
    val dimTot = perV.groupBy(col("dim")).agg(sum("cnt").as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(
        Window.orderBy(col("dim")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val probes = dimTot
      .select(col("dim"), col("n"), col("off"),
        explode(array(lit(1L), lit(2L), lit(3L), lit(4L))).as("k"))
      .withColumn("r", expr("(k * n + 4) div 5"))
    val hits = scan.join(broadcast(probes), "dim")
      .filter(col("cnt_cum") - col("off") >= col("r") &&
        col("cnt_cum") - col("cnt") - col("off") < col("r"))
      .groupBy(col("dim")).pivot(col("k"), Seq(1, 2, 3, 4)).agg(first(col("v")))
      .select(col("dim"), col("1").as("b1"), col("2").as("b2"),
        col("3").as("b3"), col("4").as("b4"))
    // 12 boundary values — model-sized, collected once and scored as
    // literals (the KMeans-centroids pattern); a DataFrame-side join
    // would re-evaluate the scan per use
    val b: Map[String, Array[Long]] = hits
      .collect()
      .map(r => r.getString(0) -> Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    def score(dim: String): Column = {
      val bs = b(dim)
      when(col(dim) <= bs(0), 1L).when(col(dim) <= bs(1), 2L)
        .when(col(dim) <= bs(2), 3L).when(col(dim) <= bs(3), 4L).otherwise(5L)
    }
    val scored = Seq("recency", "frequency", "monetary").foldLeft(rfm) { (df, dim) =>
      df.withColumn(s"${dim.head}q", score(dim))
    }
    scored.groupBy(col("rq"), col("fq"), col("mq"))
      .agg(count(lit(1)).as("n_customers"), sum(col("monetary")).as("monetary_c"))
      .orderBy("rq", "fq", "mq")
  }

  private[graft] lazy val anRfmSql = {
    def bounds(dim: String) =
      s"""SELECT '$dim' AS dim,
         |  MIN(CASE WHEN k = 1 THEN v END) AS b1, MIN(CASE WHEN k = 2 THEN v END) AS b2,
         |  MIN(CASE WHEN k = 3 THEN v END) AS b3, MIN(CASE WHEN k = 4 THEN v END) AS b4
         |FROM (
         |  SELECT k, v FROM
         |    (SELECT v, cnt, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
         |     FROM (SELECT $dim AS v, COUNT(*) AS cnt FROM rfm GROUP BY 1)) c,
         |    (SELECT k, (k * n + 4)//5 AS r
         |     FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rfm),
         |          (SELECT UNNEST([CAST(1 AS BIGINT), 2, 3, 4]) AS k)) p
         |  WHERE cum >= r AND cum - cnt < r)""".stripMargin
    s"""WITH mx AS (SELECT MAX(o_orderdate) AS mx FROM orders),
       |rfm AS (SELECT o_custkey,
       |          CAST(MIN(date_diff('day', CAST(o_orderdate AS DATE), CAST(mx AS DATE))) AS BIGINT) AS recency,
       |          COUNT(*) AS frequency,
       |          CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS monetary
       |        FROM orders, mx GROUP BY o_custkey),
       |b AS (${bounds("recency")} UNION ALL ${bounds("frequency")} UNION ALL ${bounds("monetary")}),
       |scored AS (SELECT
       |    CASE WHEN recency <= rb.b1 THEN 1 WHEN recency <= rb.b2 THEN 2
       |         WHEN recency <= rb.b3 THEN 3 WHEN recency <= rb.b4 THEN 4 ELSE 5 END AS rq,
       |    CASE WHEN frequency <= fb.b1 THEN 1 WHEN frequency <= fb.b2 THEN 2
       |         WHEN frequency <= fb.b3 THEN 3 WHEN frequency <= fb.b4 THEN 4 ELSE 5 END AS fq,
       |    CASE WHEN monetary <= mb.b1 THEN 1 WHEN monetary <= mb.b2 THEN 2
       |         WHEN monetary <= mb.b3 THEN 3 WHEN monetary <= mb.b4 THEN 4 ELSE 5 END AS mq,
       |    monetary
       |  FROM rfm,
       |       (SELECT * FROM b WHERE dim = 'recency') rb,
       |       (SELECT * FROM b WHERE dim = 'frequency') fb,
       |       (SELECT * FROM b WHERE dim = 'monetary') mb)
       |SELECT CAST(rq AS BIGINT) AS rq, CAST(fq AS BIGINT) AS fq, CAST(mq AS BIGINT) AS mq,
       |       COUNT(*) AS n_customers, CAST(SUM(monetary) AS BIGINT) AS monetary_c
       |FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
  }

  /** Lorenz curve deciles (the chartable companion to [[anGini]]):
    * customers ranked by spend, decile = ((rn−1)·10) div n + 1, per-
    * decile spend and the cumulative share at each decile boundary —
    * rank AND running spend come from ONE [[graft.operators.PrefixSum]]
    * pass (the scan emits both), the boundary value is max(cum) inside
    * each decile (cum is monotone), and shares divide once at the end.
    * Integer-exact until the final two divisions. */
  private[graft] def anLorenz(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg((sum(col("o_totalprice").cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("x"))
    val scan = graft.operators.PrefixSum
      .withRunningTotals(spend, Seq("x", "o_custkey"), Seq("x"))
    val tot = spend.agg(count(lit(1)).as("n"), sum("x").as("s"))
    scan.crossJoin(broadcast(tot))
      .withColumn("decile", expr("((rn - 1) * 10) div n + 1"))
      .groupBy("decile", "s")
      .agg(count(lit(1)).as("n_cust"), sum("x").as("spend_c"), max("x_cum").as("cum_c"))
      .select(col("decile"), col("n_cust"), col("spend_c"), col("cum_c"),
        (col("spend_c").cast("double") / col("s").cast("double")).as("share"),
        (col("cum_c").cast("double") / col("s").cast("double")).as("cum_share"))
      .orderBy("decile")
  }

  private[graft] lazy val anLorenzSql =
    """WITH spend AS (SELECT o_custkey,
      |    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS x
      |  FROM orders GROUP BY o_custkey),
      |r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_custkey) AS rn,
      |             CAST(SUM(x) OVER (ORDER BY x, o_custkey) AS BIGINT) AS x_cum
      |      FROM spend),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s FROM spend),
      |d AS (SELECT ((rn - 1) * 10)//n + 1 AS decile, s,
      |             COUNT(*) AS n_cust, CAST(SUM(x) AS BIGINT) AS spend_c,
      |             CAST(MAX(x_cum) AS BIGINT) AS cum_c
      |      FROM r, t GROUP BY 1, 2)
      |SELECT CAST(decile AS BIGINT) AS decile, n_cust, spend_c, cum_c,
      |       CAST(spend_c AS DOUBLE) / CAST(s AS DOUBLE) AS share,
      |       CAST(cum_c AS DOUBLE) / CAST(s AS DOUBLE) AS cum_share
      |FROM d ORDER BY decile""".stripMargin

  /** Sample-ratio-mismatch check — the A/B trust gate that runs BEFORE
    * [[anAbtest]] reads out: user counts per variant vs the designed
    * 50/50 split, chi-square (n0−n1)²/(n0+n1) with 1 df, flagged at
    * the 95% critical value. Pure integers until one division. */
  private[graft] def anAbSrm(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id")).distinct()
      .groupBy((col("user_id") % 2).as("variant"))
      .agg(count(lit(1)).as("n"))
      .agg(sum(when(col("variant") === 0, col("n"))).as("n0"),
        sum(when(col("variant") === 1, col("n"))).as("n1"))
      .select(col("n0"), col("n1"),
        ((col("n0") - col("n1")) * (col("n0") - col("n1"))).as("srm_num"),
        (((col("n0") - col("n1")) * (col("n0") - col("n1"))).cast("double")
          / (col("n0") + col("n1")).cast("double")).as("chi2"))
      .withColumn("srm_detected", col("chi2") > 3.841)

  private[graft] lazy val anAbSrmSql =
    """WITH u AS (SELECT DISTINCT user_id FROM events),
      |v AS (SELECT user_id % 2 AS variant, COUNT(*) AS n FROM u GROUP BY 1),
      |w AS (SELECT CAST(SUM(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n0,
      |             CAST(SUM(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n1 FROM v)
      |SELECT n0, n1, CAST((n0 - n1) * (n0 - n1) AS BIGINT) AS srm_num,
      |  CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) AS chi2,
      |  (CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)) > 3.841 AS srm_detected
      |FROM w""".stripMargin

  /** DAU / WAU / stickiness — the product-analytics heartbeat, built
    * with the scale-correct trick for windowed DISTINCT (which window
    * functions cannot express): each (user, active-day) pair explodes
    * into the 7 report days it contributes to, then one groupBy counts
    * distinct users per report day. Work is 7× the distinct activity
    * pairs — linear, partitioned, no cross-day state. */
  private[graft] def anDauWau(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    val wau = ud
      .select(explode(sequence(col("d"), date_add(col("d"), 6))).as("report_day"),
        col("user_id"))
      .groupBy("report_day").agg(countDistinct("user_id").as("wau"))
    val dau = ud.groupBy(col("d").as("report_day"))
      .agg(countDistinct("user_id").as("dau"))
    wau.join(dau, Seq("report_day"), "left")
      .select(col("report_day").cast("timestamp").as("report_day"),
        coalesce(col("dau"), lit(0L)).as("dau"), col("wau"),
        (coalesce(col("dau"), lit(0L)).cast("double") / col("wau").cast("double"))
          .as("stickiness"))
      .orderBy("report_day")
  }

  private[graft] lazy val anDauWauSql =
    """WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
      |w AS (SELECT d + CAST(k AS INTEGER) AS report_day, user_id
      |      FROM ud, (SELECT UNNEST(range(7)) AS k)),
      |wau AS (SELECT report_day, COUNT(DISTINCT user_id) AS wau FROM w GROUP BY 1),
      |dau AS (SELECT d AS report_day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY 1)
      |SELECT CAST(report_day AS TIMESTAMP) AS report_day,
      |  CAST(COALESCE(dau, 0) AS BIGINT) AS dau, wau,
      |  CAST(COALESCE(dau, 0) AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
      |FROM wau LEFT JOIN dau USING (report_day) ORDER BY report_day""".stripMargin

  /** Experiment power readout — the minimum detectable effect at
    * 80% power / 95% confidence for the CURRENT variant sizes and
    * pooled conversion (the "is this test even worth running longer"
    * answer, computed alongside [[anAbtest]]/[[anAbSrm]]):
    * MDE = (z_α/2 + z_β)·√(2·p̂(1−p̂)/n̄). Constants and one shared
    * IEEE sqrt ⇒ bit-identical, no rounding. */
  private[graft] def anPower(s: SparkSession, dir: String): DataFrame = {
    val mdeExpr =
      """(1.959963985 + 0.841621234)
        | * sqrt(2.0 * (CAST(c1+c2 AS DOUBLE)/CAST(n1+n2 AS DOUBLE))
        |             * (1.0 - CAST(c1+c2 AS DOUBLE)/CAST(n1+n2 AS DOUBLE))
        |             / (CAST(n1+n2 AS DOUBLE) / 2.0))""".stripMargin
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max((col("event_type") === "purchase" && col("value") >= 100.0)
        .cast("long")).as("conv"))
      .groupBy((col("user_id") % 2).as("variant"))
      .agg(count(lit(1)).as("n"), sum("conv").as("c"))
      .agg(sum(when(col("variant") === 0, col("n"))).as("n1"),
        sum(when(col("variant") === 0, col("c"))).as("c1"),
        sum(when(col("variant") === 1, col("n"))).as("n2"),
        sum(when(col("variant") === 1, col("c"))).as("c2"))
      .withColumn("p_pool", expr("CAST(c1+c2 AS DOUBLE)/CAST(n1+n2 AS DOUBLE)"))
      .withColumn("mde", expr(mdeExpr))
  }

  private[graft] lazy val anPowerSql =
    """WITH u AS (SELECT user_id,
      |             MAX(CASE WHEN event_type = 'purchase' AND value >= 100.0
      |                 THEN 1 ELSE 0 END) AS conv
      |           FROM events GROUP BY user_id),
      |v AS (SELECT user_id % 2 AS variant, COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS c
      |      FROM u GROUP BY 1),
      |w AS (SELECT
      |        CAST(SUM(CASE WHEN variant = 0 THEN n END) AS BIGINT) AS n1,
      |        CAST(SUM(CASE WHEN variant = 0 THEN c END) AS BIGINT) AS c1,
      |        CAST(SUM(CASE WHEN variant = 1 THEN n END) AS BIGINT) AS n2,
      |        CAST(SUM(CASE WHEN variant = 1 THEN c END) AS BIGINT) AS c2
      |      FROM v)
      |SELECT n1, c1, n2, c2,
      |  CAST(c1+c2 AS DOUBLE)/CAST(n1+n2 AS DOUBLE) AS p_pool,
      |  (1.959963985 + 0.841621234)
      |  * sqrt(2.0 * (CAST(c1+c2 AS DOUBLE)/CAST(n1+n2 AS DOUBLE))
      |              * (1.0 - CAST(c1+c2 AS DOUBLE)/CAST(n1+n2 AS DOUBLE))
      |              / (CAST(n1+n2 AS DOUBLE) / 2.0)) AS mde
      |FROM w""".stripMargin

  /** Weekday × hour activity heatmap (the ops-dashboard staple): event
    * counts and exact money volume per (ISO weekday, hour-of-day) cell.
    * One groupBy on a 7×24-bounded key. */
  private[graft] def anHeatmap(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy((weekday(col("ts")) + 1).cast("long").as("dow"),
        hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("volume"))
      .orderBy("dow", "hod")

  private[graft] lazy val anHeatmapSql =
    s"""SELECT CAST(isodow(CAST(ts AS DATE)) AS BIGINT) AS dow,
       |  CAST(hour(ts) AS BIGINT) AS hod,
       |  COUNT(*) AS n, ${moneySumSql("value")} AS volume
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** New-vs-returning daily split (the growth dashboard's second
    * line after [[anUserGrowth]]): per active (user, day), new iff the
    * day is the user's first-seen day; one distinct pass, one join
    * back on user_id, one day rollup. */
  private[graft] def anNewReturning(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(date_trunc("day", col("ts")).as("day"), col("user_id")).distinct()
    val first = ud.groupBy("user_id").agg(min("day").as("first_day"))
    ud.join(first, "user_id")
      .groupBy("day")
      .agg(sum((col("day") === col("first_day")).cast("long")).as("n_new"),
        sum((col("day") =!= col("first_day")).cast("long")).as("n_returning"))
      .orderBy("day")
  }

  private[graft] lazy val anNewReturningSql =
    """WITH ud AS (SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events),
      |f AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY user_id)
      |SELECT day,
      |  CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |  CAST(SUM(CASE WHEN day <> first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_returning
      |FROM ud JOIN f USING (user_id) GROUP BY day ORDER BY day""".stripMargin

  /** View→purchase conversion-lag histogram: per converting user, the
    * whole days between the first view and the first purchase at or
    * after it, bucketed — the funnel-latency readout that tells a
    * growth team whether conversion is an impulse or a deliberation.
    * Integer day arithmetic on the shared millisecond timestamps. */
  private[graft] def anConversionLag(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
    val v = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ts"))).as("v_ts"))
    val p = ev.join(v, "user_id")
      .groupBy(col("user_id"), col("v_ts"))
      .agg(min(when(col("event_type") === "purchase" && col("ts") >= col("v_ts"), col("ts")))
        .as("p_ts"))
      .filter(col("v_ts").isNotNull && col("p_ts").isNotNull)
    p.groupBy(datediff(col("p_ts").cast("date"), col("v_ts").cast("date"))
        .cast("long").as("lag_days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("lag_days")
  }

  private[graft] lazy val anConversionLagSql =
    """WITH v AS (SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS v_ts
      |           FROM events GROUP BY user_id),
      |p AS (SELECT e.user_id, v.v_ts,
      |        MIN(CASE WHEN e.event_type = 'purchase' AND e.ts >= v.v_ts THEN e.ts END) AS p_ts
      |      FROM events e JOIN v USING (user_id)
      |      GROUP BY e.user_id, v.v_ts)
      |SELECT CAST(date_diff('day', CAST(v_ts AS DATE), CAST(p_ts AS DATE)) AS BIGINT) AS lag_days,
      |       COUNT(*) AS n_users
      |FROM p WHERE v_ts IS NOT NULL AND p_ts IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Market-basket pair affinity: parts bought together in an order,
    * top pairs by co-occurrence with LIFT (P(ab)/(P(a)·P(b)) — the
    * "is this pairing real or just two popular items" correction).
    * Pair explosion is bounded by lines-per-order² (order-local
    * self-join on the order key, never a corpus cross join); item
    * marginals broadcast back. Counts exact; lift is one shared
    * double expression. */
  private[graft] def anBasket(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val tot = li.agg(countDistinct(col("ok")).as("n_orders"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .groupBy(col("a.pk").as("part_a"), col("b.pk").as("part_b"))
      .agg(count(lit(1)).as("n_ab"))
    val marg = li.groupBy(col("pk")).agg(count(lit(1)).as("n_one"))
    pairs
      .join(broadcast(marg.select(col("pk").as("part_a"), col("n_one").as("n_a"))), "part_a")
      .join(broadcast(marg.select(col("pk").as("part_b"), col("n_one").as("n_b"))), "part_b")
      .orderBy(col("n_ab").desc, col("part_a"), col("part_b")).limit(20)
      .crossJoin(broadcast(tot))
      .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))")
          .as("lift"))
  }

  private[graft] lazy val anBasketSql =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |t AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM li),
      |p AS (SELECT a.pk AS part_a, b.pk AS part_b, COUNT(*) AS n_ab
      |      FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |      GROUP BY 1, 2),
      |m AS (SELECT pk, COUNT(*) AS n_one FROM li GROUP BY pk),
      |top AS (SELECT part_a, part_b, n_ab FROM p
      |        ORDER BY n_ab DESC, part_a, part_b LIMIT 20)
      |SELECT part_a, part_b, n_ab, ma.n_one AS n_a, mb.n_one AS n_b,
      |  CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE)
      |    / (CAST(ma.n_one AS DOUBLE) * CAST(mb.n_one AS DOUBLE)) AS lift
      |FROM top JOIN m ma ON top.part_a = ma.pk
      |         JOIN m mb ON top.part_b = mb.pk, t
      |ORDER BY n_ab DESC, part_a, part_b""".stripMargin

  /** Pareto concentration readout — "how few customers cover 50/80/90%
    * of revenue": customers ranked by spend DESCENDING through the
    * [[graft.operators.PrefixSum]] scan (order key (−spend, custkey) —
    * unique, so ranks are well-defined), each target share answered by
    * its integer-exact crossing row (cum·100 ⋛ t·total — no division
    * until the emitted percentage). The 80/20 rule, measured. */
  private[graft] def anPareto(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg((sum(col("o_totalprice").cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("x"))
      .withColumn("neg", -col("x"))
    val scan = graft.operators.PrefixSum
      .withRunningTotals(spend, Seq("neg", "o_custkey"), Seq("x"))
    val tot = spend.agg(count(lit(1)).as("n"), sum("x").as("s"))
    scan.crossJoin(broadcast(tot))
      .select(col("rn"), col("x"), col("x_cum"), col("n"), col("s"),
        explode(array(lit(50L), lit(80L), lit(90L))).as("target_pct"))
      .filter(col("x_cum") * 100 >= col("target_pct") * col("s") &&
        (col("x_cum") - col("x")) * 100 < col("target_pct") * col("s"))
      .select(col("target_pct"), col("rn").as("n_customers"), col("n"),
        (col("rn").cast("double") / col("n").cast("double")).as("pct_customers"))
      .orderBy("target_pct")
  }

  private[graft] lazy val anParetoSql =
    """WITH spend AS (SELECT o_custkey,
      |    CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS x
      |  FROM orders GROUP BY o_custkey),
      |r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY -x, o_custkey) AS rn,
      |             CAST(SUM(x) OVER (ORDER BY -x, o_custkey) AS BIGINT) AS x_cum
      |      FROM spend),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s FROM spend),
      |k AS (SELECT UNNEST([CAST(50 AS BIGINT), 80, 90]) AS target_pct)
      |SELECT target_pct, CAST(rn AS BIGINT) AS n_customers, n,
      |       CAST(rn AS DOUBLE) / CAST(n AS DOUBLE) AS pct_customers
      |FROM r, t, k
      |WHERE x_cum * 100 >= target_pct * s AND (x_cum - x) * 100 < target_pct * s
      |ORDER BY target_pct""".stripMargin

  /** Column-level profile drift between the reference and current
    * windows (the table-health companion to [[anKsDrift]]/
    * [[anChi2Drift]]'s distribution tests): row counts, distinct
    * cardinalities of the categorical columns, and the exact-cents
    * price mean, each emitted as (metric, ref, cur, rel_delta) rows.
    * One aggregate per window over the fact table; the report is
    * metric-count-sized. Means divide exact integers in shared IEEE
    * doubles; rel_delta = cur/ref − 1. */
  private[graft] def anProfileDrift(s: SparkSession, dir: String): DataFrame = {
    def profile(label: String, f: Column): DataFrame =
      Tables.orders(s, dir).filter(f)
        .agg(count(lit(1)).cast("double").as("n_rows"),
          countDistinct(col("o_orderpriority")).cast("double").as("nd_priority"),
          countDistinct(col("o_orderstatus")).cast("double").as("nd_status"),
          (sum((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
            .cast("double") / count(lit(1)).cast("double")).as("mean_cents"))
        .select(explode(expr(
          """array(struct('n_rows' AS metric, n_rows AS v),
            |      struct('nd_priority' AS metric, nd_priority AS v),
            |      struct('nd_status' AS metric, nd_status AS v),
            |      struct('mean_cents' AS metric, mean_cents AS v))""".stripMargin)).as(label))
        .select(col(s"$label.metric").as("metric"), col(s"$label.v").as(label))
    val split = lit("1998-01-01").cast("timestamp")
    profile("ref", col("o_orderdate") < split)
      .join(profile("cur", col("o_orderdate") >= split), "metric")
      .withColumn("rel_delta", expr("cur / ref - 1.0"))
      .orderBy("metric")
  }

  private[graft] lazy val anProfileDriftSql = {
    def win(label: String, cond: String) =
      s"""SELECT m AS metric, v AS $label FROM (
         |  SELECT UNNEST(['n_rows', 'nd_priority', 'nd_status', 'mean_cents']) AS m,
         |         UNNEST([CAST(COUNT(*) AS DOUBLE),
         |                 CAST(COUNT(DISTINCT o_orderpriority) AS DOUBLE),
         |                 CAST(COUNT(DISTINCT o_orderstatus) AS DOUBLE),
         |                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT)) AS DOUBLE)
         |                   / CAST(COUNT(*) AS DOUBLE)]) AS v
         |  FROM orders WHERE $cond)""".stripMargin
    s"""WITH r AS (${win("ref", "o_orderdate < TIMESTAMP '1998-01-01'")}),
       |c AS (${win("cur", "o_orderdate >= TIMESTAMP '1998-01-01'")})
       |SELECT metric, ref, cur, cur / ref - 1.0 AS rel_delta
       |FROM r JOIN c USING (metric) ORDER BY metric""".stripMargin
  }

  /** Inter-purchase interval histogram (repeat-purchase cadence): per
    * user, the whole days between consecutive purchases (partitioned
    * lag window, (ts, event_id) tie-break), rolled into a global gap
    * histogram — the "how often do buyers come back" readout. */
  private[graft] def anRepeatPurchase(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .groupBy(datediff(col("ts").cast("date"), col("prev_ts").cast("date"))
        .cast("long").as("gap_days"))
      .agg(count(lit(1)).as("n_gaps"))
      .orderBy("gap_days")
  }

  private[graft] lazy val anRepeatPurchaseSql =
    """WITH p AS (SELECT user_id, ts, event_id,
      |             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |           FROM events WHERE event_type = 'purchase')
      |SELECT CAST(date_diff('day', CAST(prev_ts AS DATE), CAST(ts AS DATE)) AS BIGINT) AS gap_days,
      |       COUNT(*) AS n_gaps
      |FROM p WHERE prev_ts IS NOT NULL
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Exact WEIGHTED median per group — the robust center of a weighted
    * distribution (price weighted by shipped quantity): the value at
    * weight-rank ⌈W/2⌉ / ⌊W/2⌋+1, computed by [[groupedMedian2]] with
    * integer quantity weights as the counts — the same distinct-value
    * + PrefixSum order-statistic scan, zero value-buffering state.
    * Emitted in doubled units → exact at 6 dp. */
  private[graft] def anWeightedMedian(s: SparkSession, dir: String): DataFrame = {
    val raw = Tables.lineitem(s, dir)
      .select(col("l_returnflag").as("g"),
        (col("l_extendedprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"),
        col("l_quantity").cast("bigint").as("w"))
    // raw-row scan with weight run-sums (sumCols): same hit logic as
    // [[groupedMedian2]] but cnt/cum are WEIGHTS, and the no-reduction
    // distinct-value groupBy over near-unique prices is gone
    val scan = graft.operators.PrefixSum.distinctRunningCounts(
      raw, Seq("g", "v"), sumCols = Seq("w"))
    val wOff = Window.orderBy(col("g")).rowsBetween(Window.unboundedPreceding, -1)
    val probes = raw.groupBy(col("g")).agg(sum(col("w")).as("n"))
      .withColumn("off", coalesce(sum("n").over(wOff), lit(0L)))
      .withColumn("k_lo", expr("(n + 1) div 2"))
      .withColumn("k_hi", expr("n div 2 + 1"))
    val hitLo = col("cum") >= col("k_lo") && col("cum") - col("w") < col("k_lo")
    val hitHi = col("cum") >= col("k_hi") && col("cum") - col("w") < col("k_hi")
    scan.join(broadcast(probes), Seq("g"))
      .withColumn("cum", col("w_cum") - col("off"))
      .filter(hitLo || hitHi)
      .groupBy(col("g"))
      .agg((max(when(hitLo, col("v"))) + max(when(hitHi, col("v")))).as("med2"),
        first(col("n")).as("n"))
      .select(col("g").as("l_returnflag"), col("n").as("total_weight"),
        round(col("med2").cast("double") / 200.0, 6).as("wmedian"))
      .orderBy(col("l_returnflag"))
  }

  private[graft] lazy val anWeightedMedianSql =
    """WITH b AS (SELECT l_returnflag AS g,
      |                  CAST(CAST(l_extendedprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v,
      |                  CAST(l_quantity AS BIGINT) AS w
      |           FROM lineitem),
      |pv AS (SELECT g, v, CAST(SUM(w) AS BIGINT) AS cnt FROM b GROUP BY 1, 2),
      |cv AS (SELECT g, v, cnt, CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum
      |       FROM pv),
      |tv AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM pv GROUP BY g)
      |SELECT c.g AS l_returnflag, MAX(n) AS total_weight,
      |  ROUND(CAST(MAX(CASE WHEN cum >= (n+1)//2 AND cum - cnt < (n+1)//2 THEN v END)
      |           + MAX(CASE WHEN cum >= n//2+1 AND cum - cnt < n//2+1 THEN v END)
      |        AS DOUBLE) / 200.0, 6) AS wmedian
      |FROM cv c JOIN tv USING (g) GROUP BY c.g ORDER BY c.g""".stripMargin

  /** Sweep-line concurrency — "how many sessions are open at once",
    * the capacity-planning primitive window functions can't express
    * directly at scale: each event holds a slot for one hour, the
    * hold becomes a +1 delta at its start and a −1 at its end, and
    * the running sum of deltas over the GLOBAL time order — the
    * [[graft.operators.PrefixSum]] distributed scan, not a
    * single-partition window — is the concurrency curve; per day,
    * emit the max and the closing value. Tie order (t, delta, event
    * id) closes holds BEFORE opening new ones at the same instant, so
    * touching holds never double-count — and makes the scan's order
    * key unique, its determinism contract. Pure integers end-to-end. */
  private[graft] def anConcurrency(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(unix_micros(col("ts")).as("t"), col("event_id"))
    val deltas = ev.select(col("t"), lit(1L).as("d"), col("event_id"))
      .unionByName(ev.select((col("t") + 3600000000L).as("t"),
        lit(-1L).as("d"), col("event_id")))
    val scan = graft.operators.PrefixSum
      .withRunningTotals(deltas, Seq("t", "d", "event_id"), Seq("d"))
    scan.groupBy(date_trunc("day", timestamp_micros(col("t"))).as("day"))
      .agg(max(col("d_cum")).as("max_conc"), min(col("d_cum")).as("min_conc"),
        count(lit(1)).as("n_points"))
      .orderBy(col("day"))
  }

  private[graft] lazy val anConcurrencySql =
    """WITH ev AS (SELECT epoch_us(ts) AS t, event_id FROM events),
      |d AS (SELECT t, CAST(1 AS BIGINT) AS d, event_id FROM ev
      |      UNION ALL
      |      SELECT t + 3600000000, -1, event_id FROM ev),
      |c AS (SELECT t, CAST(SUM(d) OVER (ORDER BY t, d, event_id) AS BIGINT) AS run
      |      FROM d)
      |SELECT date_trunc('day', make_timestamp(t)) AS day,
      |       MAX(run) AS max_conc, MIN(run) AS min_conc, COUNT(*) AS n_points
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** Linear revenue attribution — each user's purchase value is split
    * equally across their view/click touchpoints, INTEGER-EXACT: per
    * touch floor(V/k) cents with the remainder V mod k credited to the
    * user's earliest touch (deterministic tie-break on (ts, event id)),
    * so total credited cents reconcile to total purchase cents
    * EXACTLY — the audit property float attribution can't give. Users
    * with purchases but no touchpoints land in a '(none)' bucket, so
    * the reconciliation covers every cent. Per-user aggregates + one
    * per-user window; shuffles on user_id only. */
  private[graft] def anAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_id"),
      col("ts"), col("event_type"),
      (col("value").cast("decimal(24,2)") * 100).cast("bigint").as("cents"))
    val v = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(sum(col("cents")).as("v"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
    val k = touches.groupBy(col("user_id")).agg(count(lit(1)).as("k"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val credited = touches.join(v, "user_id").join(k, "user_id")
      .withColumn("rn", row_number().over(w))
      .select(col("event_type"),
        (expr("v div k") + when(col("rn") === 1, col("v") % col("k"))
          .otherwise(0L)).as("credit"))
    val untouched = v.join(k, Seq("user_id"), "left_anti")
      .select(lit("(none)").as("event_type"), col("v").as("credit"))
    credited.unionByName(untouched)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("credit")).as("credit_cents"))
      .orderBy(col("event_type"))
  }

  private[graft] lazy val anAttributionSql =
    """WITH ev AS (SELECT user_id, event_id, ts, event_type,
      |                   CAST(CAST(value AS DECIMAL(24,2)) * 100 AS BIGINT) AS cents
      |            FROM events),
      |v AS (SELECT user_id, CAST(SUM(cents) AS BIGINT) AS v FROM ev
      |      WHERE event_type = 'purchase' GROUP BY user_id),
      |t AS (SELECT user_id, event_id, ts, event_type FROM ev
      |      WHERE event_type IN ('view', 'click')),
      |k AS (SELECT user_id, COUNT(*) AS k FROM t GROUP BY user_id),
      |c AS (SELECT t.event_type,
      |        v // k + CASE WHEN ROW_NUMBER() OVER (PARTITION BY t.user_id
      |                        ORDER BY t.ts, t.event_id) = 1
      |                      THEN v % k ELSE 0 END AS credit
      |      FROM t JOIN v USING (user_id) JOIN k USING (user_id)),
      |u AS (SELECT '(none)' AS event_type, v AS credit
      |      FROM v WHERE user_id NOT IN (SELECT user_id FROM k))
      |SELECT event_type, COUNT(*) AS n, CAST(SUM(credit) AS BIGINT) AS credit_cents
      |FROM (SELECT * FROM c UNION ALL SELECT * FROM u)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Corpus-trained bigram language-model scoring — the perplexity-ish
    * quality screen a training-data pipeline runs to find unnatural
    * text (boilerplate, shuffled tokens score low): bigram and unigram
    * counts over the whole corpus (two groupBys), then each document's
    * mean log transition probability ln(c(a,b)/c(a)) via a shuffle
    * join of its bigrams against the model. Bigrams are generated
    * map-side (adjacent-pair transform over the token array, no
    * self-join). Per-doc means emit at ROUND(·,6): ln is libm (±1 ulp
    * cross-engine) and the per-doc sum is short, so 6 places absorb
    * it — the an_entropy discipline. Top/bottom-scoring docs are
    * what a curation pass would keep/drop. */
  private[graft] def anBigramLogprob(s: SparkSession, dir: String): DataFrame = {
    // drop empty tokens INSIDE the array (leading/trailing-space splits
    // differ between engines) and guard 1-token docs (Spark's
    // sequence(0,-1) is a descending range, not empty)
    val toks = Tables.documents(s, dir).select(col("doc_id"),
      expr("filter(split(lower(text), '\\\\s+'), x -> x != '')").as("w"))
      .filter(size(col("w")) >= 2)
    val bi = toks.select(col("doc_id"), explode(expr(
      "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS a, w[i + 1] AS b))"))
      .as("p")).select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
    val cab = bi.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    val ca = bi.groupBy(col("a")).agg(count(lit(1)).as("c_a"))
    // Gather the libm ln terms in DECIMAL(38,18) so the per-doc sum is
    // order-independent (the q_pagerank gather rule) — a plain double sum
    // over a shuffle join is partition-order-dependent and can flip a
    // ROUND(·,6) boundary between runs/engines.
    bi.join(cab, Seq("a", "b")).join(ca, Seq("a"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(log(col("c_ab").cast("double") / col("c_a").cast("double"))
            .cast("decimal(38,18)")).cast("double")
          / count(lit(1)).cast("double"), 6).as("mean_logprob"))
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val anBigramLogprobSql =
    """WITH toks AS (SELECT doc_id,
      |                list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x <> '') AS w
      |              FROM documents
      |              WHERE len(list_filter(string_split_regex(lower(text), '\s+'),
      |                                    x -> x <> '')) >= 2),
      |bi AS (SELECT doc_id, w[i] AS a, w[i + 1] AS b
      |       FROM toks, UNNEST(range(1, len(w))) AS r(i)),
      |cab AS (SELECT a, b, COUNT(*) AS c_ab FROM bi GROUP BY 1, 2),
      |ca AS (SELECT a, COUNT(*) AS c_a FROM bi GROUP BY 1)
      |SELECT doc_id, COUNT(*) AS n_bigrams,
      |       ROUND(CAST(SUM(CAST(ln(CAST(c_ab AS DOUBLE) / CAST(c_a AS DOUBLE))
      |                           AS DECIMAL(38,18))) AS DOUBLE)
      |             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_logprob
      |FROM bi JOIN cab USING (a, b) JOIN ca USING (a)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Behavioral churn by market segment — the telecom-reference question
    * asked of activity data instead of a label column: a customer is
    * churned when their last order is >90 days before the corpus' max
    * order date, never-active when they have no orders at all. One
    * per-customer aggregate + one custkey-partitioned join; the anchor
    * date is a 1-row broadcast. The rate divides exact integer counts
    * (IEEE division, bit-identical) so it ships unrounded. */
  private[graft] def anChurnRate(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val anchor = o.agg(max(col("o_orderdate")).as("mx"))
    val last = o.groupBy(col("o_custkey")).agg(max(col("o_orderdate")).as("last_order"))
    val cutoff = col("mx") - expr("INTERVAL 90 DAYS")
    val churnedCond = col("last_order").isNull || col("last_order") < cutoff
    Tables.customer(s, dir)
      .join(last, col("c_custkey") === col("o_custkey"), "left")
      .crossJoin(broadcast(anchor))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("last_order") >= cutoff, 1L).otherwise(0L)).as("n_active"),
        sum(when(col("last_order").isNotNull && col("last_order") < cutoff, 1L)
          .otherwise(0L)).as("n_churned"),
        sum(when(col("last_order").isNull, 1L).otherwise(0L)).as("n_never"),
        (sum(when(churnedCond, 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double")).as("churn_rate"))
      .orderBy(col("c_mktsegment"))
  }

  private[graft] lazy val anChurnRateSql =
    """WITH a AS (SELECT MAX(o_orderdate) AS mx FROM orders),
      |l AS (SELECT o_custkey, MAX(o_orderdate) AS last_order FROM orders GROUP BY 1)
      |SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(SUM(CASE WHEN last_order >= mx - INTERVAL 90 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
      |  CAST(SUM(CASE WHEN last_order IS NOT NULL AND last_order < mx - INTERVAL 90 DAY THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
      |  CAST(SUM(CASE WHEN last_order IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_never,
      |  CAST(SUM(CASE WHEN last_order IS NULL OR last_order < mx - INTERVAL 90 DAY THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS churn_rate
      |FROM customer LEFT JOIN l ON c_custkey = o_custkey CROSS JOIN a
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Pairwise Pearson correlation matrix over the four lineitem
    * measures — ONE aggregate pass computes every moment (4 sums, 4
    * square-sums, 6 cross-sums, all decimal-exact), then the 6 pair
    * rows are map-only projections of that single 1-row result. The
    * naive alternative (one corr() call per pair) scans the table 6
    * times. Emits at ROUND(·,6): the decimal→double conversions carry
    * a 1-ulp wobble past the 2^53 window (an_stats_moments). */
  private[graft] def anCorrMatrix(s: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity" -> "qty", "l_extendedprice" -> "price",
      "l_discount" -> "disc", "l_tax" -> "tax")
    val pairs = cols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    def dsum(x: Column) = sum(x.cast("decimal(38,8)")).cast("double")
    val aggs = Seq(count(lit(1)).as("n")) ++
      cols.map { case (c, a) => dsum(col(c)).as(s"s_$a") } ++
      cols.map { case (c, a) => dsum(col(c) * col(c)).as(s"ss_$a") } ++
      pairs.map { case ((ca, aa), (cb, ab)) =>
        dsum(col(ca) * col(cb)).as(s"sp_${aa}_$ab") }
    val m = Tables.lineitem(s, dir).agg(aggs.head, aggs.tail: _*)
    pairs.map { case ((_, aa), (_, ab)) =>
      m.select(lit(aa).as("col_a"), lit(ab).as("col_b"),
        round((col(s"sp_${aa}_$ab") - col(s"s_$aa") * col(s"s_$ab") / col("n")) /
          (sqrt(col(s"ss_$aa") - col(s"s_$aa") * col(s"s_$aa") / col("n")) *
            sqrt(col(s"ss_$ab") - col(s"s_$ab") * col(s"s_$ab") / col("n"))), 6)
          .as("corr"))
    }.reduce(_ unionByName _).orderBy(col("col_a"), col("col_b"))
  }

  private[graft] lazy val anCorrMatrixSql = {
    val cols = Seq("l_quantity" -> "qty", "l_extendedprice" -> "price",
      "l_discount" -> "disc", "l_tax" -> "tax")
    val pairs = cols.combinations(2).map { case Seq(a, b) => (a, b) }.toSeq
    val sums = cols.map { case (c, a) =>
      s"CAST(SUM(CAST($c AS DECIMAL(38,8))) AS DOUBLE) AS s_$a, " +
        s"CAST(SUM(CAST($c * $c AS DECIMAL(38,8))) AS DOUBLE) AS ss_$a" }
    val cross = pairs.map { case ((ca, aa), (cb, ab)) =>
      s"CAST(SUM(CAST($ca * $cb AS DECIMAL(38,8))) AS DOUBLE) AS sp_${aa}_$ab" }
    val rows = pairs.map { case ((_, aa), (_, ab)) =>
      s"""SELECT '$aa' AS col_a, '$ab' AS col_b,
         |  ROUND((sp_${aa}_$ab - s_$aa * s_$ab / n) /
         |    (sqrt(ss_$aa - s_$aa * s_$aa / n) * sqrt(ss_$ab - s_$ab * s_$ab / n)), 6) AS corr
         |FROM m""".stripMargin }
    s"""WITH m AS (SELECT COUNT(*) AS n,
       |  ${(sums ++ cross).mkString(",\n  ")}
       |  FROM lineitem)
       |${rows.mkString("\nUNION ALL\n")}
       |ORDER BY col_a, col_b""".stripMargin
  }

  /** Kaplan–Meier survival curve over customer lifetimes (first→last
    * order days; a customer still active at the 90-day recency cutoff
    * is CENSORED, not an event — the distinction that makes KM the
    * right estimator where a naive churn histogram is biased). Risk
    * sets come from lifetime-value counts with a cumulative window
    * over the DISTINCT-lifetime table (bounded by the calendar span,
    * not the row count — the an_ewma small-series discipline); the
    * survival product is exp∘Σln over event times only, emitted at
    * ROUND(·,6) to absorb libm ulp skew (an_entropy), with the
    * everyone-churns terminal row pinned to exactly 0 on both engines
    * (Spark ln(0) is NULL, DuckDB -inf — the CASE sidesteps both). */
  private[graft] def anKaplanMeier(s: SparkSession, dir: String): DataFrame = {
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
      .select(col("t"), col("n_risk"), col("d"), col("surv"))
      .orderBy(col("t"))
  }

  private[graft] lazy val anKaplanMeierSql =
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
      |      FROM byt CROSS JOIN tot)
      |SELECT t, n_risk, d,
      |  CASE WHEN d = n_risk THEN 0.0
      |       ELSE ROUND(EXP(SUM(LN(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)))
      |              OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
      |  END AS surv
      |FROM r WHERE d > 0 ORDER BY t""".stripMargin

  /** Winsorized mean per order priority — the robust mean where the
    * tails are CLIPPED to the p10/p90 order statistics instead of
    * dropped (trimming changes n; winsorizing doesn't). Boundaries are
    * exact type-1 quantiles in cents (pure integer ranks ⌈n/10⌉ and
    * ⌈9n/10⌉ — no interpolation) probed from the same distinct-value
    * PrefixSum scan as [[groupedMedian2]]; the clipped mean divides an
    * exact BIGINT cent sum — no value-buffering aggregate anywhere,
    * bit-identical on both engines unrounded. */
  private[graft] def anWinsorize(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderpriority").as("g"),
      (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    // raw-row scan (run-length merge in-pass) — the distinct-value
    // groupBy reduced nothing over near-unique prices
    val scan = graft.operators.PrefixSum.distinctRunningCounts(o, Seq("g", "v"))
    val wOff = Window.orderBy(col("g")).rowsBetween(Window.unboundedPreceding, -1)
    val probes = o.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .withColumn("off", coalesce(sum(col("n")).over(wOff), lit(0L)))
      .withColumn("r_lo", expr("(n + 9) div 10"))
      .withColumn("r_hi", expr("(9 * n + 9) div 10"))
    val hitLo = col("cum") >= col("r_lo") && col("cum") - col("cnt") < col("r_lo")
    val hitHi = col("cum") >= col("r_hi") && col("cum") - col("cnt") < col("r_hi")
    val bounds = scan.join(broadcast(probes), Seq("g"))
      .withColumn("cum", col("cnt_cum") - col("off"))
      .filter(hitLo || hitHi)
      .groupBy(col("g"))
      .agg(max(when(hitLo, col("v"))).as("lo"), max(when(hitHi, col("v"))).as("hi"))
    o.join(broadcast(bounds), Seq("g"))
      .select(col("g"), greatest(col("lo"), least(col("hi"), col("v"))).as("w"),
        (col("v") < col("lo") || col("v") > col("hi")).cast("long").as("clipped"))
      .groupBy(col("g").as("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("clipped")).as("n_clipped"),
        (sum(col("w")).cast("double") / count(lit(1)).cast("double") / lit(100.0))
          .as("wmean"))
      .orderBy(col("o_orderpriority"))
  }

  private[graft] lazy val anWinsorizeSql =
    """WITH o AS (SELECT o_orderpriority AS g,
      |                  CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v
      |           FROM orders),
      |pv AS (SELECT g, v, COUNT(*) AS cnt FROM o GROUP BY 1, 2),
      |cv AS (SELECT g, v, cnt, CAST(SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cum
      |       FROM pv),
      |tv AS (SELECT g, CAST(SUM(cnt) AS BIGINT) AS n FROM pv GROUP BY g),
      |b AS (SELECT c.g,
      |        CAST(MAX(CASE WHEN cum >= (n+9)//10 AND cum - cnt < (n+9)//10 THEN v END) AS BIGINT) AS lo,
      |        CAST(MAX(CASE WHEN cum >= (9*n+9)//10 AND cum - cnt < (9*n+9)//10 THEN v END) AS BIGINT) AS hi
      |      FROM cv c JOIN tv USING (g) GROUP BY c.g)
      |SELECT o.g AS o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN o.v < b.lo OR o.v > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
      |  CAST(SUM(GREATEST(b.lo, LEAST(b.hi, o.v))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) / 100.0 AS wmean
      |FROM o JOIN b USING (g)
      |GROUP BY o.g ORDER BY o.g""".stripMargin

  /** Decile lift table — the model-eval staple: customers deciled by
    * account balance (the stand-in score), behavioral churn as the
    * outcome, per-decile rate + cumulative lift vs the base rate.
    * Deciling runs on distinct-value counts (a value's rows share a
    * decile — ties never straddle) through the PrefixSum scan: no
    * global sort, no ntile window over all rows. Every emitted rate
    * is a ratio of exact integers — unrounded, bit-identical. */
  private[graft] def anDecileLift(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val anchor = o.agg(max(col("o_orderdate")).as("mx"))
    val last = o.groupBy(col("o_custkey")).agg(max(col("o_orderdate")).as("last_order"))
    val sc = Tables.customer(s, dir)
      .join(last, col("c_custkey") === col("o_custkey"), "left")
      .crossJoin(broadcast(anchor))
      .select((col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint").as("v"),
        (col("last_order").isNull ||
          col("last_order") < col("mx") - expr("INTERVAL 90 DAYS")).cast("long").as("churn"))
    val perV = sc.groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"), sum(col("churn")).as("ch"))
    val tot = perV.agg(sum(col("cnt")).as("n_total"), sum(col("ch")).as("ch_total"))
    val scan = graft.operators.PrefixSum.withRunningTotals(perV, Seq("v"), Seq("cnt"))
    val wCum = Window.orderBy(col("decile")).rowsBetween(Window.unboundedPreceding, 0)
    scan.crossJoin(broadcast(tot))
      .select(expr("((cnt_cum - 1) * 10) div n_total + 1").as("decile"),
        col("cnt"), col("ch"), col("n_total"), col("ch_total"))
      .groupBy(col("decile"))
      .agg(sum(col("cnt")).as("n_cust"), sum(col("ch")).as("n_churn"),
        first(col("n_total")).as("n_total"), first(col("ch_total")).as("ch_total"))
      .withColumn("churn_rate",
        col("n_churn").cast("double") / col("n_cust").cast("double"))
      .withColumn("cum_lift",
        (sum(col("n_churn")).over(wCum).cast("double") /
          sum(col("n_cust")).over(wCum).cast("double")) /
          (col("ch_total").cast("double") / col("n_total").cast("double")))
      .select(col("decile"), col("n_cust"), col("n_churn"),
        col("churn_rate"), col("cum_lift"))
      .orderBy(col("decile"))
  }

  private[graft] lazy val anDecileLiftSql =
    """WITH a AS (SELECT MAX(o_orderdate) AS mx FROM orders),
      |l AS (SELECT o_custkey, MAX(o_orderdate) AS last_order FROM orders GROUP BY 1),
      |sc AS (SELECT CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS v,
      |         CASE WHEN last_order IS NULL OR last_order < mx - INTERVAL 90 DAY
      |              THEN 1 ELSE 0 END AS churn
      |       FROM customer LEFT JOIN l ON c_custkey = o_custkey CROSS JOIN a),
      |pv AS (SELECT v, COUNT(*) AS cnt, CAST(SUM(churn) AS BIGINT) AS ch
      |       FROM sc GROUP BY 1),
      |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total,
      |               CAST(SUM(ch) AS BIGINT) AS ch_total FROM pv),
      |cv AS (SELECT v, cnt, ch, CAST(SUM(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
      |       FROM pv),
      |bd AS (SELECT ((cum - 1) * 10) // n_total + 1 AS decile,
      |         CAST(SUM(cnt) AS BIGINT) AS n_cust, CAST(SUM(ch) AS BIGINT) AS n_churn,
      |         ANY_VALUE(n_total) AS n_total, ANY_VALUE(ch_total) AS ch_total
      |       FROM cv CROSS JOIN tot GROUP BY 1)
      |SELECT decile, n_cust, n_churn,
      |  CAST(n_churn AS DOUBLE) / CAST(n_cust AS DOUBLE) AS churn_rate,
      |  (CAST(CAST(SUM(n_churn) OVER (ORDER BY decile) AS BIGINT) AS DOUBLE) /
      |   CAST(CAST(SUM(n_cust) OVER (ORDER BY decile) AS BIGINT) AS DOUBLE)) /
      |  (CAST(ch_total AS DOUBLE) / CAST(n_total AS DOUBLE)) AS cum_lift
      |FROM bd ORDER BY decile""".stripMargin

  /** Classical seasonal decomposition of daily revenue: trend = the
    * centered 7-day moving window, seasonal = per-ISO-dow mean of the
    * detrended series. INTEGER-EXACT until the single final division:
    * interior days (full 7-day window) satisfy 7·detrended = 7·rev_c −
    * trend_sum in cents — an exact BIGINT — so the per-dow seasonal is
    * one exact-int ratio, not an order-dependent double sum. The RANGE
    * frame runs over the day INDEX (calendar gaps shrink the window
    * and those edge days are excluded with the n_w=7 filter rather
    * than fudged). Bounded distinct-day series — the an_ewma
    * small-series window discipline. */
  private[graft] def anSeasonalDecompose(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"))
      .withColumn("di",
        datediff(col("day"), lit("1992-01-01").cast("date")).cast("long"))
    val w = Window.orderBy(col("di")).rangeBetween(-3, 3)
    daily
      .select(col("day"), col("rev_c"),
        sum(col("rev_c")).over(w).as("tsum"), count(lit(1)).over(w).as("nw"))
      .filter(col("nw") === 7)
      .groupBy((weekday(col("day")) + 1).cast("long").as("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("rev_c")).as("rc"),
        sum(lit(7L) * col("rev_c") - col("tsum")).as("dev_c7"))
      .select(col("dow"), col("n_days"),
        (col("rc").cast("double") / col("n_days").cast("double") / lit(100.0))
          .as("mean_rev"),
        (col("dev_c7").cast("double") / col("n_days").cast("double") / lit(700.0))
          .as("seasonal"))
      .orderBy(col("dow"))
  }

  private[graft] lazy val anSeasonalDecomposeSql =
    """WITH daily AS (SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rev_c
      |  FROM lineitem GROUP BY 1),
      |ix AS (SELECT day, rev_c,
      |         CAST(date_diff('day', DATE '1992-01-01', CAST(day AS DATE)) AS BIGINT) AS di
      |       FROM daily),
      |t AS (SELECT day, rev_c,
      |        CAST(SUM(rev_c) OVER (ORDER BY di RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS tsum,
      |        COUNT(*) OVER (ORDER BY di RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS nw
      |      FROM ix)
      |SELECT CAST(isodow(CAST(day AS DATE)) AS BIGINT) AS dow, COUNT(*) AS n_days,
      |  CAST(CAST(SUM(rev_c) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0 AS mean_rev,
      |  CAST(CAST(SUM(7 * rev_c - tsum) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 700.0 AS seasonal
      |FROM t WHERE nw = 7 GROUP BY 1 ORDER BY 1""".stripMargin

  /** Price elasticity of demand per brand: OLS slope of ln(quantity)
    * on ln(1 − discount). The libm-dependent ln terms are evaluated
    * once per DISTINCT (discount, quantity) cell (tiny domain) with
    * counts as weights, and every weighted term is cast to
    * DECIMAL(38,18) before SUM — the order-independent gather the
    * q_pagerank/an_entropy rules record — so the only cross-engine
    * skew is the ≤1-ulp ln itself, absorbed by the ROUND(·,6)
    * emission even through the covariance cancellation. */
  private[graft] def anPriceElasticity(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).join(
      broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))),
      col("l_partkey") === col("p_partkey"))
    val perV = li.groupBy(col("p_brand"), col("l_discount").as("d"),
        col("l_quantity").as("q"))
      .agg(count(lit(1)).as("cnt"))
    def g(x: Column) = sum((col("cnt") * x).cast("decimal(38,18)")).cast("double")
    val x = log(lit(1.0) - col("d"))
    val y = log(col("q"))
    perV.groupBy(col("p_brand"))
      .agg(sum(col("cnt")).as("n"),
        g(x).as("sx"), g(y).as("sy"), g(x * x).as("sxx"), g(x * y).as("sxy"))
      .select(col("p_brand"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6).as("elasticity"))
      .orderBy(col("p_brand"))
  }

  private[graft] lazy val anPriceElasticitySql =
    """WITH li AS (SELECT p_brand, l_discount AS d, l_quantity AS q, COUNT(*) AS cnt
      |            FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2, 3),
      |m AS (SELECT p_brand, CAST(SUM(cnt) AS BIGINT) AS n,
      |        CAST(SUM(CAST(cnt * ln(1.0 - d) AS DECIMAL(38,18))) AS DOUBLE) AS sx,
      |        CAST(SUM(CAST(cnt * ln(q) AS DECIMAL(38,18))) AS DOUBLE) AS sy,
      |        CAST(SUM(CAST(cnt * (ln(1.0 - d) * ln(1.0 - d)) AS DECIMAL(38,18))) AS DOUBLE) AS sxx,
      |        CAST(SUM(CAST(cnt * (ln(1.0 - d) * ln(q)) AS DECIMAL(38,18))) AS DOUBLE) AS sxy
      |      FROM li GROUP BY 1)
      |SELECT p_brand, n,
      |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS elasticity
      |FROM m ORDER BY p_brand""".stripMargin

  /** Peak detection over daily revenue — a day is a peak when it
    * strictly dominates BOTH its ±3-day flanks (directional RANGE
    * windows over the day index, so calendar gaps shrink a flank
    * instead of sliding rows in) and clears an integer prominence
    * gate: 20·(rev − flank_max) > rev, i.e. >5% above the taller
    * flank. Pure integer cents compares — bit-identical anywhere;
    * emitted prominence is the exact cent gap. Edge days with an
    * empty flank can't be peaks (the marketing-calendar convention:
    * a peak needs both sides). */
  private[graft] def anPeaks(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"))
      .withColumn("di",
        datediff(col("day"), lit("1992-01-01").cast("date")).cast("long"))
    val wL = Window.orderBy(col("di")).rangeBetween(-3, -1)
    val wR = Window.orderBy(col("di")).rangeBetween(1, 3)
    daily
      .select(col("day"), col("rev_c"),
        max(col("rev_c")).over(wL).as("ml"), max(col("rev_c")).over(wR).as("mr"))
      .filter(col("ml").isNotNull && col("mr").isNotNull &&
        col("rev_c") > col("ml") && col("rev_c") > col("mr") &&
        lit(20L) * (col("rev_c") - greatest(col("ml"), col("mr"))) > col("rev_c"))
      .select(col("day"), col("rev_c"),
        (col("rev_c") - greatest(col("ml"), col("mr"))).as("prominence_c"))
      .orderBy(col("day"))
  }

  private[graft] lazy val anPeaksSql =
    """WITH daily AS (SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rev_c
      |  FROM lineitem GROUP BY 1),
      |ix AS (SELECT day, rev_c,
      |         CAST(date_diff('day', DATE '1992-01-01', CAST(day AS DATE)) AS BIGINT) AS di
      |       FROM daily),
      |f AS (SELECT day, rev_c,
      |        CAST(MAX(rev_c) OVER (ORDER BY di RANGE BETWEEN 3 PRECEDING AND 1 PRECEDING) AS BIGINT) AS ml,
      |        CAST(MAX(rev_c) OVER (ORDER BY di RANGE BETWEEN 1 FOLLOWING AND 3 FOLLOWING) AS BIGINT) AS mr
      |      FROM ix)
      |SELECT day, rev_c, CAST(rev_c - GREATEST(ml, mr) AS BIGINT) AS prominence_c
      |FROM f
      |WHERE ml IS NOT NULL AND mr IS NOT NULL
      |  AND rev_c > ml AND rev_c > mr
      |  AND 20 * (rev_c - GREATEST(ml, mr)) > rev_c
      |ORDER BY day""".stripMargin

  /** Wald–Wolfowitz runs test on the daily revenue direction series —
    * "is the day-over-day up/down sequence random, or does momentum/
    * mean-reversion structure it?" Runs are counted with one lag
    * compare + sum (flat days dropped, the standard tie handling);
    * the z statistic (R − μ)/σ with μ = 2n₁n₂/n + 1 and σ² =
    * 2n₁n₂(2n₁n₂ − n)/(n²(n−1)) is pure IEEE arithmetic on exact
    * integers — division and sqrt are correctly rounded, so the
    * emission is bit-identical unrounded on any engine. */
  private[graft] def anRunsTest(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(s, dir)
      .groupBy(date_trunc("day", col("l_shipdate")).as("day"))
      .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
        .cast("bigint").as("rev_c"))
    val wLag = Window.orderBy(col("day"))
    val moves = daily
      .withColumn("prev", lag(col("rev_c"), 1).over(wLag))
      .filter(col("prev").isNotNull && col("rev_c") =!= col("prev"))
      .withColumn("up", (col("rev_c") > col("prev")).cast("long"))
    val runs = moves
      .withColumn("pu", lag(col("up"), 1).over(wLag))
      .select(
        sum(col("up")).as("n_up"),
        sum(lit(1L) - col("up")).as("n_down"),
        (sum(when(col("pu").isNull || col("pu") =!= col("up"), 1L)
          .otherwise(0L))).as("n_runs"))
    runs.select(col("n_up"), col("n_down"), col("n_runs"),
        (lit(2.0) * col("n_up") * col("n_down") /
          (col("n_up") + col("n_down")) + lit(1.0)).as("expected_runs"))
      .withColumn("z",
        (col("n_runs") - col("expected_runs")) /
          sqrt((lit(2.0) * col("n_up") * col("n_down") *
            (lit(2.0) * col("n_up") * col("n_down") - col("n_up") - col("n_down"))) /
            ((col("n_up") + col("n_down")) * (col("n_up") + col("n_down")) *
              (col("n_up") + col("n_down") - lit(1.0)))))
  }

  private[graft] lazy val anRunsTestSql =
    """WITH daily AS (SELECT date_trunc('day', l_shipdate) AS day,
      |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rev_c
      |  FROM lineitem GROUP BY 1),
      |m AS (SELECT day, rev_c, LAG(rev_c) OVER (ORDER BY day) AS prev FROM daily),
      |mv AS (SELECT day, CASE WHEN rev_c > prev THEN 1 ELSE 0 END AS up
      |       FROM m WHERE prev IS NOT NULL AND rev_c <> prev),
      |r AS (SELECT up, LAG(up) OVER (ORDER BY day) AS pu FROM mv),
      |agg AS (SELECT CAST(SUM(up) AS BIGINT) AS n_up,
      |               CAST(SUM(1 - up) AS BIGINT) AS n_down,
      |               CAST(SUM(CASE WHEN pu IS NULL OR pu <> up THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
      |        FROM r)
      |SELECT n_up, n_down, n_runs,
      |  2.0 * n_up * n_down / (n_up + n_down) + 1.0 AS expected_runs,
      |  (n_runs - (2.0 * n_up * n_down / (n_up + n_down) + 1.0)) /
      |  sqrt((2.0 * n_up * n_down * (2.0 * n_up * n_down - n_up - n_down)) /
      |       ((n_up + n_down) * (n_up + n_down) * (n_up + n_down - 1.0))) AS z
      |FROM agg""".stripMargin

  /** Exact 7-day rolling DISTINCT users per day — the metric that
    * defeats naive partial aggregation (distinct counts don't merge
    * across sliding windows). The scale shape: a user is active on day
    * d iff they have an event in [d−6, d], i.e. iff d falls in the
    * union of [a, a+6] intervals over their active days — so merge
    * each user's overlapping intervals (gaps-and-islands with a 6-day
    * extension, one per-user window), emit ±1 sweep deltas at interval
    * ends, and ONE [[graft.operators.PrefixSum]] scan over the day
    * axis yields every day's exact count. Work is O(active user-days),
    * never O(days × users); the spine is folded in as zero-deltas so
    * quiet days emit 0 rather than vanish. The oracle cross-checks
    * with the O(days·events) range-join + COUNT(DISTINCT) definition
    * — tractable at sf, which is exactly what an oracle is for. */
  private[graft] def anRollingDistinct(s: SparkSession, dir: String): DataFrame = {
    val epoch = lit("1970-01-01").cast("date")
    val days = Tables.events(s, dir)
      .select(col("user_id"),
        datediff(date_trunc("day", col("ts")), epoch).cast("long").as("d"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val isl = days
      .withColumn("prev", lag(col("d"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull || col("d") - col("prev") > 6, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("d")).as("s"), (max(col("d")) + 6).as("e"))
    val deltas = isl.select(col("s").as("d"), lit(1L).as("delta"))
      .unionByName(isl.select((col("e") + 1).as("d"), lit(-1L).as("delta")))
    val bounds = days.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
    val spine = bounds
      .select(explode(sequence(col("lo"), col("hi"))).as("d"), lit(0L).as("delta"))
    val merged = deltas.unionByName(spine)
      .groupBy(col("d")).agg(sum(col("delta")).as("delta"))
    graft.operators.PrefixSum.withRunningTotals(merged, Seq("d"), Seq("delta"))
      .crossJoin(broadcast(bounds))
      .filter(col("d") >= col("lo") && col("d") <= col("hi"))
      .select(date_add(epoch, col("d").cast("int")).cast("timestamp").as("day"),
        col("delta_cum").as("n_active_7d"))
      .orderBy(col("day"))
  }

  private[graft] lazy val anRollingDistinctSql =
    """WITH ev AS (SELECT DISTINCT user_id,
      |    CAST(date_diff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE)) AS BIGINT) AS d
      |  FROM events),
      |b AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM ev),
      |spine AS (SELECT CAST(t.d AS BIGINT) AS d FROM b, UNNEST(range(b.lo, b.hi + 1)) AS t(d))
      |SELECT CAST(DATE '1970-01-01' + CAST(s.d AS INTEGER) AS TIMESTAMP) AS day,
      |  COUNT(DISTINCT e.user_id) AS n_active_7d
      |FROM spine s LEFT JOIN ev e ON e.d BETWEEN s.d - 6 AND s.d
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** One-way ANOVA across customer market segments on order totals —
    * "does segment explain spend?". Numeric discipline for an
    * O(N)-row sum-of-squares: values are exact cents, the grand mean
    * is pre-subtracted as an INTEGER shift m0 = S div N (SSB/SST are
    * shift-invariant, and centering keeps every squared term small
    * enough that Σ(v−m0)² is an exact DECIMAL(38,0) at any SF instead
    * of a drifting double). SSB gathers the per-group s'²/n doubles
    * through DECIMAL(38,18) (order-independent, the q_pagerank
    * pattern); SST converts ONE exact integer; F is then pure IEEE on
    * identical expression trees. EMISSION CONTRACT (r16, caught by the
    * sf1 gate): the gathered SSB terms outgrow ~16 significant digits
    * at sf1, where Spark's and DuckDB's double→decimal quantization
    * differ at the last ulp — so the emitted statistics are the
    * SCALE-STABLE O(1) ratios, ROUND 6 (eta_sq = SSB/SST and F), never
    * the raw cents² sums whose ABSOLUTE ulp wobble grows with SF and
    * which no fixed rounding can absorb. Two narrow aggregations
    * (per-group, then a 5-row gather) + one broadcast of a single
    * grand-total row: no shuffle beyond the segment groupBy. */
  private[graft] def anAnova(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
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
    per.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("sp_g")).as("sp"), sum(col("qp_g")).as("qp"),
        sum((col("sp_g").cast("double") * col("sp_g").cast("double") /
          col("n_g").cast("double")).cast("decimal(38,18)")).as("ssb_gather"))
      .select(col("k"), col("n"),
        (col("ssb_gather").cast("double") -
          col("sp").cast("double") * col("sp").cast("double") /
            col("n").cast("double")).as("ss_between"),
        (col("qp").cast("double") -
          col("sp").cast("double") * col("sp").cast("double") /
            col("n").cast("double")).as("ss_total"))
      .select(col("k"), col("n"),
        round(col("ss_between") / col("ss_total"), 6).as("eta_sq"),
        round((col("ss_between") / (col("k") - lit(1)).cast("double")) /
          ((col("ss_total") - col("ss_between")) /
            (col("n") - col("k")).cast("double")), 6).as("f_stat"))
  }

  private[graft] lazy val anAnovaSql =
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
      |        CAST(SUM(sp_g) AS BIGINT) AS sp,
      |        CAST(SUM(qp_g) AS DECIMAL(38,0)) AS qp,
      |        CAST(SUM(CAST(CAST(sp_g AS DOUBLE) * CAST(sp_g AS DOUBLE)
      |              / CAST(n_g AS DOUBLE) AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS ssb_gather
      |      FROM per),
      |d AS (SELECT k, n,
      |        CAST(ssb_gather AS DOUBLE)
      |          - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) AS ss_between,
      |        CAST(qp AS DOUBLE)
      |          - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) AS ss_total
      |      FROM t)
      |SELECT k, n, ROUND(ss_between / ss_total, 6) AS eta_sq,
      |  ROUND((ss_between / CAST(k - 1 AS DOUBLE))
      |    / ((ss_total - ss_between) / CAST(n - k AS DOUBLE)), 6) AS f_stat
      |FROM d""".stripMargin

  /** Tukey HSD post-hoc pairwise comparisons after [[anAnova]]: for
    * every market-segment pair, the studentized-range statistic
    * q = |mean_i − mean_j| / √(MSW/2 · (1/n_i + 1/n_j)) — the "WHICH
    * groups differ" follow-up an omnibus F cannot answer. Reuses the
    * exact-cents centered sums of the ANOVA (the m0 integer shift
    * cancels in every mean difference), so per-group state is 3 exact
    * numbers; the pair fan-out is k², a model-sized frame (k = number
    * of segments), cross-joined with the 1-row MSW total — the only
    * data-sized work is the same single groupBy as an_anova. Doubles
    * are computed on identical expression trees both sides; mean_diff_c
    * is pure IEEE over exact integers (bit-identical unrounded at any
    * SF), while q_stat passes through the DECIMAL(38,18) SSB gather
    * whose double→decimal quantization differs at the last ulp once
    * the gathered terms outgrow ~16 significant digits (caught by the
    * r16 sf1 gate) — q is O(1..10), so ROUND 6 absorbs it with ~9
    * orders of margin. */
  private[graft] def anTukeyHsd(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("g"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    val grand = o.agg(sum(col("v")).as("s0"), count(lit(1)).as("n0"))
      .select(expr("s0 div n0").as("m0"))
    // per is k = |segments| rows (key-domain-bounded) with THREE
    // consumers (MSW total, both pair sides) — stabilize once (the
    // an_conformal treatment) so the data-sized centered groupBy runs
    // once and the final plan hangs off a checkpoint leaf
    val per = graft.operators.Checkpoints.stabilizeLazy(o.crossJoin(broadcast(grand))
      .select(col("g"), (col("v") - col("m0")).as("c"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"), sum(col("c")).as("sp_g"),
        sum((col("c").cast("decimal(18,0)") * col("c").cast("decimal(18,0)"))
          .cast("decimal(38,0)")).as("qp_g")))
    val msw = per.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("qp_g")).as("qp"),
        sum((col("sp_g").cast("double") * col("sp_g").cast("double") /
          col("n_g").cast("double")).cast("decimal(38,18)")).as("ssb_gather"))
      .select(((col("qp").cast("double") - col("ssb_gather").cast("double")) /
        (col("n") - col("k")).cast("double")).as("ms_within"))
    val a = per.select(col("g").as("g_a"), col("n_g").as("n_a"), col("sp_g").as("sp_a"))
    val b = per.select(col("g").as("g_b"), col("n_g").as("n_b"), col("sp_g").as("sp_b"))
    a.join(broadcast(b), col("g_a") < col("g_b"))
      .crossJoin(broadcast(msw))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        (col("sp_a").cast("double") / col("n_a").cast("double") -
          col("sp_b").cast("double") / col("n_b").cast("double")).as("mean_diff_c"),
        round(abs(col("sp_a").cast("double") / col("n_a").cast("double") -
          col("sp_b").cast("double") / col("n_b").cast("double")) /
          sqrt(col("ms_within") / lit(2.0) *
            (lit(1.0) / col("n_a").cast("double") +
              lit(1.0) / col("n_b").cast("double"))), 6).as("q_stat"))
      .orderBy(col("g_a"), col("g_b"))
  }

  private[graft] lazy val anTukeyHsdSql =
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
      |w AS (SELECT (CAST(qp AS DOUBLE) - CAST(ssb_gather AS DOUBLE))
      |               / CAST(n - k AS DOUBLE) AS ms_within FROM t)
      |SELECT a.g AS g_a, b.g AS g_b, a.n_g AS n_a, b.n_g AS n_b,
      |  CAST(a.sp_g AS DOUBLE) / CAST(a.n_g AS DOUBLE)
      |    - CAST(b.sp_g AS DOUBLE) / CAST(b.n_g AS DOUBLE) AS mean_diff_c,
      |  ROUND(ABS(CAST(a.sp_g AS DOUBLE) / CAST(a.n_g AS DOUBLE)
      |      - CAST(b.sp_g AS DOUBLE) / CAST(b.n_g AS DOUBLE))
      |    / sqrt(w.ms_within / 2.0
      |           * (1.0 / CAST(a.n_g AS DOUBLE) + 1.0 / CAST(b.n_g AS DOUBLE))), 6) AS q_stat
      |FROM per a JOIN per b ON a.g < b.g CROSS JOIN w
      |ORDER BY g_a, g_b""".stripMargin

  // SPRT hypotheses + Wald boundaries, shared literals on both engines
  // (interpolated into the oracle as shortest-round-trip doubles, so the
  // per-day LLR trees are bit-identical — no engine-local ln() of the
  // SAME constant can differ): H0 p=0.15 vs H1 p=0.20, alpha=beta=0.05.
  private[graft] val SprtL1 = math.log(0.20 / 0.15)
  private[graft] val SprtL0 = math.log((1.0 - 0.20) / (1.0 - 0.15))
  private[graft] val SprtBound = math.log(0.95 / 0.05)

  /** Wald's sequential probability ratio test over the daily purchase
    * conversion walk — the sequential A/B monitor that [[anAbtest]]'s
    * fixed-horizon z cannot be (peeking inflates its alpha; the SPRT's
    * boundaries ln((1−β)/α) hold under CONTINUOUS monitoring). Each
    * day's cumulative LLR is evaluated in ONE IEEE expression from
    * EXACT integer prefix counts (x·ln(p1/p0) + (n−x)·ln(q1/q0)) — no
    * float accumulation, so the walk is bit-identical on both engines.
    * The prefix counts run over the calendar-bounded event-day spine
    * (~30 rows at any SF — the allowlisted gwin class); the decision
    * is the first boundary crossing. ROUND 6 at emission. */
  private[graft] def anSprt(s: SparkSession, dir: String): DataFrame = {
    val perDay = Tables.events(s, dir)
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_d"),
        sum((col("event_type") === "purchase").cast("long")).as("x_d"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walk = perDay
      .select(col("day"), sum("x_d").over(w).as("xc"), sum("n_d").over(w).as("nc"))
      .select(col("day"), col("xc"), col("nc"),
        (col("xc").cast("double") * lit(SprtL1) +
          (col("nc") - col("xc")).cast("double") * lit(SprtL0)).as("llr"))
    val crossed = walk
      .filter(col("llr") >= lit(SprtBound) || col("llr") <= lit(-SprtBound))
      .agg(min(struct(col("day"), col("llr"))).as("f"))
      .select(col("f.day").as("cross_day"), col("f.llr").as("cross_llr"))
    walk.agg(count(lit(1)).as("n_days"),
        max(struct(col("day"), col("llr"), col("xc"), col("nc"))).as("f"))
      .select(col("n_days"), col("f.nc").as("n_events"),
        col("f.xc").as("x_purchases"), col("f.llr").as("llr_last"))
      .crossJoin(broadcast(crossed))
      .select(col("n_days"), col("n_events"), col("x_purchases"),
        round(col("llr_last"), 6).as("llr_final"),
        col("cross_day"),
        when(col("cross_llr") >= lit(SprtBound), lit("accept_h1"))
          .when(col("cross_llr") <= lit(-SprtBound), lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"))
  }

  private[graft] lazy val anSprtSql =
    s"""WITH d AS (SELECT date_trunc('day', ts) AS day, COUNT(*) AS n_d,
       |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS x_d
       |  FROM events GROUP BY 1),
       |w AS (SELECT day,
       |    CAST(SUM(x_d) OVER (ORDER BY day) AS BIGINT) AS xc,
       |    CAST(SUM(n_d) OVER (ORDER BY day) AS BIGINT) AS nc FROM d),
       |k AS (SELECT day, xc, nc,
       |    CAST(xc AS DOUBLE) * ($SprtL1) + CAST(nc - xc AS DOUBLE) * ($SprtL0) AS llr
       |  FROM w),
       |x AS (SELECT MIN(day) AS cross_day FROM k
       |      WHERE llr >= ($SprtBound) OR llr <= -($SprtBound)),
       |xx AS (SELECT x.cross_day, k.llr AS cross_llr
       |       FROM x LEFT JOIN k ON k.day = x.cross_day),
       |f AS (SELECT COUNT(*) AS n_days FROM k),
       |l AS (SELECT nc AS n_events, xc AS x_purchases, llr AS llr_last
       |      FROM k ORDER BY day DESC LIMIT 1)
       |SELECT n_days, n_events, x_purchases, ROUND(llr_last, 6) AS llr_final,
       |  cross_day,
       |  CASE WHEN cross_llr >= ($SprtBound) THEN 'accept_h1'
       |       WHEN cross_llr <= -($SprtBound) THEN 'accept_h0'
       |       ELSE 'continue' END AS decision
       |FROM f CROSS JOIN l CROSS JOIN xx""".stripMargin

  /** KPSS level-stationarity test on the daily revenue series — the
    * null-reversed companion to [[anMannKendall]]/[[anHurst]]: the
    * null HERE is stationarity, so a small η is evidence the series
    * is level-stable (the property an SF-growing fact stream must be
    * tested FOR, not against). Fully exact construction: deviations
    * scaled by n (E_t = n·y_t − Σy, never a float mean), partial sums
    * and the Bartlett-weighted autocovariances as DECIMAL(38,0)
    * integer algebra — η = ΣP²·(l+1)/(n·EX) with
    * EX = (l+1)·G0 + 2·Σ_j (l+1−j)·G_j divides exact decimals once,
    * at emission. The spine is calendar-bounded (~2.5k rows at any
    * SF); lag pairs join on the dense rank, l = ⌊4(n/100)^¼⌋ lags
    * (Schwert). Emits the scale-free η and the long-run/short-run
    * variance ratio, ROUND 6. WIDTH CONTRACT: ΣP_t² at DECIMAL(38,0)
    * holds through ~100× the sf10-probed daily-revenue level. */
  private[graft] def anKpss(s: SparkSession, dir: String): DataFrame = {
    val spine = dailyRevenueSpine(s, dir).select("day", "rev_c")
    val tot = spine.agg(count(lit(1)).as("n"), sum("rev_c").as("sv"))
    val wOrd = Window.orderBy("day")
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the ranked deviation frame feeds three consumers (the partial-sum
    // scan and both sides of the lag join) — persist the ~2.5k-row spine
    // once so the global rank window runs once, not three times
    val e = graft.operators.PrefixSum.persistOwned(
      spine.crossJoin(broadcast(tot))
        .select(row_number().over(wOrd).cast("long").as("t"),
          (col("rev_c") * col("n") - col("sv")).as("ne")))
    val p = e.select(col("t"), col("ne"),
      sum(col("ne").cast("decimal(38,0)")).over(wCum).as("pt"))
    val g = p.agg(
      sum((col("ne").cast("decimal(38,0)") * col("ne").cast("decimal(38,0)"))
        .cast("decimal(38,0)")).as("g0"),
      sum((col("pt") * col("pt")).cast("decimal(38,0)")).as("sp2"))
    val lF = tot.select(col("n"),
      floor(lit(4.0) * pow(col("n").cast("double") / 100.0, 0.25)).cast("long").as("l"))
    val js = lF.filter(col("l") >= 1)
      .select(col("l"), explode(sequence(lit(1L), col("l"))).as("j"))
    val e2 = e.select(col("t").as("t2"), col("ne").as("ne2"))
    val gj = e.crossJoin(broadcast(js))
      .join(e2, col("t2") === col("t") - col("j"))
      .groupBy(col("j"), col("l"))
      .agg(sum((col("ne").cast("decimal(38,0)") * col("ne2").cast("decimal(38,0)"))
        .cast("decimal(38,0)")).as("gjv"))
    val ws = gj.agg(sum((col("gjv") * (col("l") - col("j") + 1).cast("decimal(38,0)"))
      .cast("decimal(38,0)")).as("wsr"))
    g.crossJoin(broadcast(ws)).crossJoin(broadcast(lF))
      .select(col("n"), col("l").as("lag_l"),
        ((col("l") + 1).cast("decimal(38,0)") * col("g0") +
          coalesce(col("wsr"), lit(0).cast("decimal(38,0)")) * 2).as("exd"),
        col("sp2"), col("g0"))
      .select(col("n"), col("lag_l"),
        round(col("sp2").cast("double") * (col("lag_l") + 1).cast("double") /
          (col("n").cast("double") * col("exd").cast("double")), 6).as("kpss_eta"),
        round(col("exd").cast("double") /
          ((col("lag_l") + 1).cast("double") * col("g0").cast("double")), 6)
          .as("lrv_ratio"))
  }

  private[graft] lazy val anKpssSql =
    s"""WITH daily AS MATERIALIZED (SELECT date_trunc('day', l_shipdate) AS day,
       |    CAST(ROUND(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS rev_c
       |  FROM lineitem GROUP BY 1),
       |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(rev_c) AS BIGINT) AS sv
       |      FROM daily),
       |e AS MATERIALIZED (SELECT row_number() OVER (ORDER BY day) AS tt,
       |    rev_c * n - sv AS ne FROM daily CROSS JOIN t),
       |p AS (SELECT tt, ne,
       |    SUM(CAST(ne AS DECIMAL(38,0))) OVER (ORDER BY tt) AS pt FROM e),
       |g AS (SELECT
       |    CAST(SUM(CAST(CAST(ne AS DECIMAL(38,0)) * CAST(ne AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS g0,
       |    CAST(SUM(CAST(pt * pt AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sp2 FROM p),
       |lf AS (SELECT n,
       |    CAST(floor(4.0 * pow(CAST(n AS DOUBLE) / 100.0, 0.25)) AS BIGINT) AS l
       |  FROM t),
       |js AS (SELECT l, unnest(generate_series(1, l)) AS j FROM lf WHERE l >= 1),
       |gj AS (SELECT js.j, js.l,
       |    CAST(SUM(CAST(CAST(a.ne AS DECIMAL(38,0)) * CAST(b.ne AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS gjv
       |  FROM e a CROSS JOIN js JOIN e b ON b.tt = a.tt - js.j
       |  GROUP BY js.j, js.l),
       |ws AS (SELECT CAST(SUM(CAST(gjv * CAST(l - j + 1 AS DECIMAL(38,0)) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS wsr FROM gj),
       |x AS (SELECT n, l AS lag_l,
       |    CAST(l + 1 AS DECIMAL(38,0)) * g0 + COALESCE(wsr, 0) * 2 AS exd,
       |    sp2, g0
       |  FROM g CROSS JOIN ws CROSS JOIN lf)
       |SELECT n, lag_l,
       |  ROUND(CAST(sp2 AS DOUBLE) * CAST(lag_l + 1 AS DOUBLE)
       |    / (CAST(n AS DOUBLE) * CAST(exd AS DOUBLE)), 6) AS kpss_eta,
       |  ROUND(CAST(exd AS DOUBLE)
       |    / (CAST(lag_l + 1 AS DOUBLE) * CAST(g0 AS DOUBLE)), 6) AS lrv_ratio
       |FROM x""".stripMargin
}

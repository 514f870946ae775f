package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.etl.{Clean, Features, Validate}
import graft.analytics.Summary


/** Etl query implementations and their paired oracle SQL —
  * split out of the assembled registry ([[SparkEntry]]) purely for
  * file-size maintainability; the self-type gives every member the
  * same scope it had inside the object. Moved vals are lazy so
  * trait-linearization order can never observe an uninitialized
  * cross-family reference. */
private[graft] trait SparkEntryEtl { this: SparkEntry.type =>


  // ------------------------------------------------------------- A. ETL core

  /** Coerce-then-impute (reference transform.py §1): a string column with
    * junk values is try_cast to double (junk → NULL), then median-imputed.
    * NULLs are synthesized deterministically (the testdata has none). */
  private[graft] def etlCleanImpute(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .withColumn("qty_str",
        when(col("l_quantity") === 1.0, lit("n/a")).otherwise(col("l_quantity").cast("string")))
      .select("l_orderkey", "l_linenumber", "qty_str")
    val coerced = Clean.coerceNumeric(base, Seq("qty_str"))
      .withColumnRenamed("qty_str", "qty_filled")
    Clean.imputeMedian(coerced, Seq("qty_filled"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private[graft] lazy val etlCleanImputeSql =
    """WITH b AS (
      |  SELECT l_orderkey, l_linenumber,
      |    TRY_CAST(CASE WHEN l_quantity = 1.0 THEN 'n/a'
      |                  ELSE CAST(l_quantity AS VARCHAR) END AS DOUBLE) AS q
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber,
      |  COALESCE(q, (SELECT quantile_cont(q, 0.5) FROM b)) AS qty_filled
      |FROM b ORDER BY l_orderkey, l_linenumber""".stripMargin

  private[graft] def etlFillUnknown(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .withColumn("prio", when(col("o_orderpriority") === "5-LOW", lit(null: String))
        .otherwise(col("o_orderpriority")))
    Clean.fillConstant(base, Seq("prio"))
      .groupBy(col("prio")).agg(count(lit(1)).as("n"))
      .orderBy(col("prio"))
  }

  private[graft] lazy val etlFillUnknownSql =
    """SELECT COALESCE(NULLIF(o_orderpriority, '5-LOW'), 'Unknown') AS prio, COUNT(*) AS n
      |FROM orders GROUP BY 1 ORDER BY prio""".stripMargin

  private[graft] def etlBucketize(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .withColumn("bal_group", Features.bucketize(col("c_acctbal"),
        Seq(-1000.0, 0.0, 2500.0, 5000.0, Double.PositiveInfinity),
        Seq("negative", "low", "mid", "high")))
      .select("c_custkey", "c_acctbal", "bal_group")
      .orderBy(col("c_custkey"))

  private[graft] lazy val etlBucketizeSql =
    """SELECT c_custkey, c_acctbal,
      |  CASE WHEN c_acctbal > -1000.0 AND c_acctbal <= 0.0 THEN 'negative'
      |       WHEN c_acctbal > 0.0 AND c_acctbal <= 2500.0 THEN 'low'
      |       WHEN c_acctbal > 2500.0 AND c_acctbal <= 5000.0 THEN 'mid'
      |       WHEN c_acctbal > 5000.0 THEN 'high' END AS bal_group
      |FROM customer ORDER BY c_custkey""".stripMargin

  private[graft] def etlSegment(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("price_segment", Features.segment3(col("o_totalprice"), 100000.0, 300000.0))
      .select("o_orderkey", "o_totalprice", "price_segment")
      .orderBy(col("o_orderkey"))

  private[graft] lazy val etlSegmentSql =
    """SELECT o_orderkey, o_totalprice,
      |  CASE WHEN o_totalprice < 100000.0 THEN 'Low'
      |       WHEN o_totalprice <= 300000.0 THEN 'Medium'
      |       ELSE 'High' END AS price_segment
      |FROM orders ORDER BY o_orderkey""".stripMargin

  private[graft] def etlFlags(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("is_conversion", Features.memberFlag(col("event_type"), Seq("purchase", "signup")))
      .withColumn("is_click", Features.yesFlag(col("event_type"), "click"))
      .select("event_id", "event_type", "is_conversion", "is_click")
      .orderBy(col("event_id"))

  private[graft] lazy val etlFlagsSql =
    """SELECT event_id, event_type,
      |  CASE WHEN lower(trim(event_type)) IN ('purchase', 'signup') THEN 1 ELSE 0 END AS is_conversion,
      |  CASE WHEN lower(trim(event_type)) = 'click' THEN 1 ELSE 0 END AS is_click
      |FROM events ORDER BY event_id""".stripMargin

  private[graft] def etlCodeMap(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("priority_code", Features.codeMap(col("o_orderpriority"),
        Map("1-urgent" -> 1, "2-high" -> 2, "3-medium" -> 3)))
      .select("o_orderkey", "o_orderpriority", "priority_code")
      .orderBy(col("o_orderkey"))

  private[graft] lazy val etlCodeMapSql =
    """SELECT o_orderkey, o_orderpriority,
      |  CASE lower(trim(o_orderpriority))
      |    WHEN '1-urgent' THEN 1 WHEN '2-high' THEN 2 WHEN '3-medium' THEN 3
      |    ELSE -1 END AS priority_code
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Column drop + snake_case normalization before load
    * (reference load.py:118-138, transform.py drops customerID/gender). */
  private[graft] def etlNormalizeCols(s: SparkSession, dir: String): DataFrame = {
    val dropped = Tables.customer(s, dir).drop("c_name")
    dropped.columns.foldLeft(dropped)((d, c) =>
      d.withColumnRenamed(c, Features.snakeCase(c)))
      .orderBy(col("c_custkey"))
  }

  private[graft] lazy val etlNormalizeColsSql =
    """SELECT c_custkey, c_nationkey, c_acctbal, c_mktsegment
      |FROM customer ORDER BY c_custkey""".stripMargin

  private[graft] def etlValidate(s: SparkSession, dir: String): DataFrame =
    Validate.run(Tables.orders(s, dir), Seq(
      Validate.noNulls("o_orderkey"),
      Validate.minRows(1000L),
      Validate.domainSubset("o_orderstatus", Seq("F", "O", "P")),
      Validate.domainComplete("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
      Validate.inRange("o_totalprice", 0.0, 1000000.0)
    )).orderBy(col("rule"))

  private[graft] lazy val etlValidateSql =
    """SELECT 'no_nulls_o_orderkey' AS rule,
      |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS metric,
      |  SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) = 0 AS passed FROM orders
      |UNION ALL
      |SELECT 'row_count', COUNT(*), COUNT(*) >= 1000 FROM orders
      |UNION ALL
      |SELECT 'domain_subset_o_orderstatus',
      |  CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') AND o_orderstatus IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') AND o_orderstatus IS NOT NULL THEN 1 ELSE 0 END) = 0 FROM orders
      |UNION ALL
      |SELECT 'domain_complete_o_orderpriority',
      |  CAST(COUNT(DISTINCT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW') THEN o_orderpriority END) AS BIGINT),
      |  COUNT(DISTINCT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW') THEN o_orderpriority END) = 5 FROM orders
      |UNION ALL
      |SELECT 'in_range_o_totalprice',
      |  CAST(SUM(CASE WHEN o_totalprice < 0.0 OR o_totalprice > 1000000.0 THEN 1 ELSE 0 END) AS BIGINT),
      |  SUM(CASE WHEN o_totalprice < 0.0 OR o_totalprice > 1000000.0 THEN 1 ELSE 0 END) = 0 FROM orders
      |ORDER BY rule""".stripMargin

  private[graft] def etlDateFeatures(s: SparkSession, dir: String): DataFrame = {
    val feats = graft.etl.Features.dateFeatures(col("o_orderdate"))
    Tables.orders(s, dir)
      .select(col("o_orderkey") +: col("o_orderdate") +:
        feats.map { case (n, c) => c.cast("int").as(n) }: _*)
      .orderBy(col("o_orderkey"))
  }

  private[graft] lazy val etlDateFeaturesSql =
    """SELECT o_orderkey, o_orderdate,
      |  CAST(year(o_orderdate) AS INT) AS year,
      |  CAST(quarter(o_orderdate) AS INT) AS quarter,
      |  CAST(month(o_orderdate) AS INT) AS month,
      |  CAST(day(o_orderdate) AS INT) AS day,
      |  CAST(CASE WHEN day(o_orderdate) = 1 THEN 1 ELSE 0 END AS INT) AS is_month_start,
      |  CAST(day(last_day(o_orderdate)) AS INT) AS days_in_month
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Wide→long unpivot (pandas melt): the four lineitem measures become
    * (metric, value) rows — one Expand pass, no join, no shuffle until
    * the demo sort. */
  private[graft] def etlUnpivot(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") <= 100)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "metric", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))

  private[graft] lazy val etlUnpivotSql =
    """SELECT l_orderkey, l_linenumber, metric, value FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
      |WHERE l_orderkey <= 100
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin

  /** Frequency + target encoding (categorical → numeric features): one
    * aggregate over the category, broadcast back — the standard
    * train-time encoder shape (at scale the tiny code table broadcasts;
    * the fact side never shuffles). */
  private[graft] def etlFreqEncode(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val enc = ord.groupBy(col("o_orderpriority")).agg(
      count(lit(1)).as("cnt"),
      sum((col("o_orderstatus") === "F").cast("long")).as("nf"))
    val total = ord.count()
    ord.join(broadcast(enc), "o_orderpriority")
      .select(col("o_orderkey"), col("o_orderpriority"),
        round(col("cnt") / lit(total.toDouble), 8).as("freq_enc"),
        round(col("nf") / col("cnt").cast("double"), 8).as("target_enc"))
      .orderBy(col("o_orderkey"))
  }

  private[graft] lazy val etlFreqEncodeSql =
    """WITH e AS (
      |  SELECT o_orderpriority, COUNT(*) AS cnt,
      |    SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS nf
      |  FROM orders GROUP BY o_orderpriority),
      |t AS (SELECT COUNT(*) AS total FROM orders)
      |SELECT o.o_orderkey, o.o_orderpriority,
      |  ROUND(e.cnt / (t.total * 1.0), 8) AS freq_enc,
      |  ROUND(e.nf / (e.cnt * 1.0), 8) AS target_enc
      |FROM orders o JOIN e ON o.o_orderpriority = e.o_orderpriority CROSS JOIN t
      |ORDER BY o.o_orderkey""".stripMargin

  /** Column profiling report: null and exact-distinct counts for a set
    * of columns in ONE aggregate pass (multi-distinct plans as a single
    * Expand) — the schema-quality sibling of etl_validate. */
  private[graft] def etlProfile(s: SparkSession, dir: String): DataFrame = {
    val cols_ = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val aggs = cols_.flatMap(c => Seq(
      sum(col(c).isNull.cast("long")).as(s"nulls_$c"),
      count_distinct(col(c)).as(s"dist_$c")))
    val stacked = cols_.map(c => s"'$c', nulls_$c, dist_$c").mkString(", ")
    Tables.orders(s, dir)
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols_.size}, $stacked) AS (column_name, n_nulls, n_distinct)")
      .orderBy(col("column_name"))
  }

  private[graft] lazy val etlProfileSql =
    """SELECT 'o_orderkey' AS column_name,
      |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
      |  COUNT(DISTINCT o_orderkey) AS n_distinct FROM orders
      |UNION ALL
      |SELECT 'o_custkey', CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  COUNT(DISTINCT o_custkey) FROM orders
      |UNION ALL
      |SELECT 'o_orderstatus', CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  COUNT(DISTINCT o_orderstatus) FROM orders
      |UNION ALL
      |SELECT 'o_orderpriority', CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  COUNT(DISTINCT o_orderpriority) FROM orders
      |ORDER BY column_name""".stripMargin

  /** Cross-table integrity: FK orphan counts + key uniqueness, one
    * (rule, metric, passed) report (validate.py's reconciliation idea
    * generalized to referential checks). */
  private[graft] def etlFkCheck(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val r1 = Validate.refIntegrity(orders, "o_custkey", Tables.customer(s, dir), "c_custkey")
    val r2 = Validate.refIntegrity(Tables.lineitem(s, dir), "l_orderkey", orders, "o_orderkey")
    val r3 = Validate.run(orders, Seq(Validate.uniqueKey("o_orderkey")))
    r1.unionAll(r2).unionAll(r3).orderBy(col("rule"))
  }

  private[graft] lazy val etlFkCheckSql =
    """SELECT 'ref_integrity_o_custkey_to_c_custkey' AS rule,
      |  CAST(COUNT(*) AS BIGINT) AS metric, COUNT(*) = 0 AS passed
      |FROM orders o WHERE o_custkey IS NOT NULL
      |  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |UNION ALL
      |SELECT 'ref_integrity_l_orderkey_to_o_orderkey',
      |  CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
      |FROM lineitem l WHERE l_orderkey IS NOT NULL
      |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |UNION ALL
      |SELECT 'unique_key_o_orderkey',
      |  CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
      |  COUNT(*) - COUNT(DISTINCT o_orderkey) = 0
      |FROM orders
      |ORDER BY rule""".stripMargin

  private[graft] def etlStringNorm(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        regexp_replace(col("c_name"), "[0-9]+", "#").as("name_tpl"),
        length(col("c_name")).cast("long").as("name_len"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_pad"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("tagged"))
      .orderBy(col("c_custkey"))

  private[graft] lazy val etlStringNormSql =
    """SELECT c_custkey,
      |  upper(c_name) AS name_upper,
      |  regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_tpl,
      |  CAST(length(c_name) AS BIGINT) AS name_len,
      |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad,
      |  concat_ws('|', c_mktsegment, c_name) AS tagged
      |FROM customer ORDER BY c_custkey""".stripMargin

  private[graft] def etlJsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("parsed", from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT")))
      .select(col("event_id"), col("parsed.k").cast("long").as("k_val"))
      .orderBy(col("event_id"))

  private[graft] lazy val etlJsonExtractSql =
    """SELECT event_id,
      |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k_val
      |FROM events ORDER BY event_id""".stripMargin

  private[graft] def etlSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.hashSample(
        Tables.orders(s, dir), col("o_orderkey"), rate16 = 4)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_orderkey"))

  private[graft] lazy val etlSampleSql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) < '4'
      |ORDER BY o_orderkey""".stripMargin

  /** Quantile bucketing (pd.qcut's distributed shape): ONE tiny
    * aggregate computes the quartile boundaries, then assignment is a
    * map-only CASE — no global sort, no ntile window over all rows.
    * Boundaries are rounded once on both engines so an on-boundary row
    * can't flip buckets over a last-ulp interpolation difference.
    *
    * The boundaries themselves come from the PrefixSum distinct-value
    * scan (rank probes at ⌊q(n−1)⌋+1 and +1, interpolated with the
    * exact quarter fraction in cents — quarter-cent values are even
    * multiples of the 4-dp half-step, so the rounding can never flip),
    * NOT from the exact `percentile` aggregate: that buffers a
    * value→count map of every distinct price in ONE aggregator — the
    * same 100×-scale memory cliff the per-group queries shed in r8,
    * just global. */
  private[graft] def etlQuantileBucketize(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(s, dir)
    val raw = ord
      .select((col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"))
    // raw-row scan (run-length merge in-pass) — the distinct-value
    // groupBy reduced nothing over near-unique prices
    val scan = graft.operators.PrefixSum.distinctRunningCounts(raw, Seq("v"))
    val probes = raw.agg(count(lit(1)).as("n"))
      .select(explode(array(lit(1L), lit(2L), lit(3L))).as("qid"), col("n"))
      .select(col("qid"), (col("qid") * (col("n") - 1)).as("pos4"))
      .select(col("qid"), expr("pos4 div 4 + 1").as("r_lo"), (col("pos4") % 4).as("f4"))
    val hitLo = col("cnt_cum") >= col("r_lo") && col("cnt_cum") - col("cnt") < col("r_lo")
    val hitHi = col("cnt_cum") >= col("r_lo") + 1 &&
      col("cnt_cum") - col("cnt") < col("r_lo") + 1
    val qs = scan.crossJoin(broadcast(probes))
      .filter(hitLo || hitHi)
      .groupBy(col("qid"))
      .agg(max(when(hitLo, col("v"))).as("v_lo"),
        max(when(hitHi, col("v"))).as("v_hi"), first(col("f4")).as("f4"))
      .select(col("qid"),
        round((col("v_lo").cast("double") + col("f4").cast("double") / lit(4.0) *
          (coalesce(col("v_hi"), col("v_lo")) - col("v_lo")).cast("double")) / lit(100.0), 4)
          .as("q"))
      .orderBy(col("qid"))
      .collect()
    val (q1, q2, q3) = (qs(0).getDouble(1), qs(1).getDouble(1), qs(2).getDouble(1))
    ord.select(col("o_orderkey"), col("o_totalprice"),
        when(col("o_totalprice") <= q1, "q1")
          .when(col("o_totalprice") <= q2, "q2")
          .when(col("o_totalprice") <= q3, "q3")
          .otherwise("q4").as("price_quartile"))
      .orderBy(col("o_orderkey"))
  }

  private[graft] lazy val etlQuantileBucketizeSql =
    """WITH q AS (
      |  SELECT ROUND(quantile_cont(o_totalprice, 0.25), 4) AS q1,
      |         ROUND(quantile_cont(o_totalprice, 0.5), 4) AS q2,
      |         ROUND(quantile_cont(o_totalprice, 0.75), 4) AS q3
      |  FROM orders)
      |SELECT o_orderkey, o_totalprice,
      |  CASE WHEN o_totalprice <= q.q1 THEN 'q1'
      |       WHEN o_totalprice <= q.q2 THEN 'q2'
      |       WHEN o_totalprice <= q.q3 THEN 'q3'
      |       ELSE 'q4' END AS price_quartile
      |FROM orders CROSS JOIN q
      |ORDER BY o_orderkey""".stripMargin

  /** SCD Type-2 interval construction: each per-customer status change
    * becomes a [valid_from, valid_to) row via lead() — the standard
    * slowly-changing-dimension history build, one shuffle on the key. */
  private[graft] def etlScd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
        col("o_orderdate").as("valid_from"),
        lead(col("o_orderdate"), 1).over(w).as("valid_to"),
        (lead(col("o_orderdate"), 1).over(w).isNull).as("is_current"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private[graft] lazy val etlScd2Sql =
    """SELECT o_custkey, o_orderkey, o_orderstatus,
      |  o_orderdate AS valid_from,
      |  LEAD(o_orderdate, 1) OVER w AS valid_to,
      |  LEAD(o_orderdate, 1) OVER w IS NULL AS is_current
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Row-level quarantine audit — [[graft.etl.Validate.quarantine]]
    * under the hard oracle: two is-bad predicates route every order row
    * to clean or quarantine-with-reasons, and the audit reports per-rule
    * failure counts plus the clean / quarantined / multi-rule totals.
    * The quarantined stream's reason counts are derived by exploding
    * the ACTUAL `__reasons` arrays the split produced (not recomputed
    * from the predicates), so the oracle verifies the routing itself.
    * One row-local projection + one tiny aggregate — no shuffle of the
    * table at any scale. */
  private[graft] def etlQuarantine(s: SparkSession, dir: String): DataFrame = {
    val rules = Seq(
      "price_range" ->
        !(col("o_totalprice") >= 1000.0 && col("o_totalprice") <= 400000.0),
      "status_domain" -> !col("o_orderstatus").isin("F", "O"))
    val (clean, bad) = graft.etl.Validate.quarantine(Tables.orders(s, dir), rules)
    val perRule = bad.select(explode(col("__reasons")).as("rule"))
      .groupBy(col("rule")).agg(count(lit(1)).as("n_rows"))
    val totals = clean.agg(count(lit(1)).as("c")).crossJoin(
        bad.agg(count(lit(1)).as("q"),
          sum(when(size(col("__reasons")) > 1, 1L).otherwise(0L)).as("m")))
      .selectExpr("stack(3, '_clean', c, '_quarantined', q, '_multi', m) as (rule, n_rows)")
    perRule.unionByName(totals).orderBy(col("rule"))
  }

  private[graft] lazy val etlQuarantineSql =
    """WITH f AS (SELECT
      |    (NOT (o_totalprice >= 1000.0 AND o_totalprice <= 400000.0)) AS f1,
      |    (o_orderstatus NOT IN ('F', 'O')) AS f2
      |  FROM orders)
      |SELECT '_clean' AS rule,
      |  CAST(SUM(CASE WHEN NOT (f1 OR f2) THEN 1 ELSE 0 END) AS BIGINT) AS n_rows FROM f
      |UNION ALL SELECT '_multi',
      |  CAST(SUM(CASE WHEN f1 AND f2 THEN 1 ELSE 0 END) AS BIGINT) FROM f
      |UNION ALL SELECT '_quarantined',
      |  CAST(SUM(CASE WHEN f1 OR f2 THEN 1 ELSE 0 END) AS BIGINT) FROM f
      |UNION ALL SELECT 'price_range',
      |  CAST(SUM(CASE WHEN f1 THEN 1 ELSE 0 END) AS BIGINT) FROM f
      |UNION ALL SELECT 'status_domain',
      |  CAST(SUM(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) FROM f
      |ORDER BY rule""".stripMargin

  /** Weighted sample without replacement, k = 100 over orders weighted
    * by price — A-Res priority sampling (Efraimidis & Spirakis, IPL'06:
    * top-k by u^(1/w) is a weight-proportional sample) made
    * DETERMINISTIC by drawing u from the tempered hash of the key:
    * u = (h+1)/2^31 is exact in double (the divisor is a power of
    * two), so both engines compute identical priorities and the oracle
    * hash-verifies the SAMPLE ITSELF — no seeded-RNG parity games.
    * The top-k runs through [[graft.functions.TopKAggregate]]: O(k)
    * state per task, combined map-side, so a 100 TB scan shuffles k
    * survivors per task, never the population (the global-sort
    * formulation would shuffle everything). pow() is the one libm op
    * (1-ulp engine skew) — priorities are spread ~10^8 ulp apart, so a
    * rank flip needs a ~10^-8-relative tie; the id tie-break covers
    * exact equality. */
  private[graft] def etlWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    graft.operators.Sampling
      .weightedSample(orders, col("o_orderkey"), col("o_totalprice"), 100)
      .select("id")
      .join(orders.select(col("o_orderkey").cast("long").as("id"),
        col("o_totalprice").cast("double").as("w")), "id")
  }

  private[graft] lazy val etlWeightedSampleSql =
    """WITH t1 AS (SELECT CAST(o_orderkey AS BIGINT) AS id,
      |                   CAST(o_totalprice AS DOUBLE) AS w,
      |                   ((CAST(o_orderkey AS BIGINT) * 1000003 + 12289) % 2147483647) AS x
      |            FROM orders),
      |t2 AS (SELECT id, w, xor(x, x >> 15) AS x FROM t1),
      |t3 AS (SELECT id, w, (x * 786433) % 2147483647 AS x FROM t2),
      |pri AS (SELECT id, w,
      |               pow((xor(x, x >> 13) + 1) / 2147483648.0, 1.0 / w) AS p
      |        FROM t3)
      |SELECT id, w FROM pri ORDER BY p DESC, id LIMIT 100""".stripMargin

  /** The end-to-end curation pipeline the reference IS (extract.py →
    * transform.py → validate.py → load.py as a file handoff;
    * reference scripts/transform.py:1), composed as ONE [[graft.etl
    * .Pipeline]] over the synthetic corpus: extract → clean (trim +
    * whitespace squeeze) → feature-engineer (token estimate + lexical
    * richness) → validate/quarantine (null/empty text, token bounds) →
    * exact dedup (min-id keeper per content hash) → curation gate
    * (richness ≥ 0.3) → shard-pack (token-budget bins, 8 content-hash
    * shards) → per-shard MANIFEST. The emitted digest is the
    * etl_table_fingerprint recipe over (doc_id|bin): md5-derived 48-bit
    * terms summed in DECIMAL(38,0), emitted as a digit string — so the
    * oracle hash-verifies the ENTIRE DAG (any row surviving the wrong
    * gate, deduped to the wrong keeper, or packed into the wrong bin
    * shifts a digest). Every stage is a lazy Catalyst transform; the
    * only shuffles are the dedup hash partition and the per-shard pack
    * window — at 100 TB the DAG is the same plan with more partitions. */
  private[graft] def pipelineRun(s: SparkSession, dir: String): DataFrame =
    graft.etl.Pipeline(graft.etl.Curation.batchStages)
      .apply(Tables.documents(s, dir).select(col("doc_id"), col("text")))

  private[graft] lazy val pipelineRunSql: String = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    val h48 = (2 to 12).map(nib)
      .foldLeft(s"CAST(${nib(1)} AS BIGINT)")((a, b) => s"($a * 16 + $b)")
    """WITH c AS (SELECT doc_id,
      |    regexp_replace(trim(text), '\s+', ' ', 'g') AS text FROM documents),
      |f AS (SELECT doc_id, text,
      |    CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS richness
      |  FROM c),
      |q AS (SELECT * FROM f WHERE NOT (text IS NULL OR len(text) = 0)
      |    AND n_tokens BETWEEN 5 AND 4096),
      |d AS (SELECT * FROM (
      |    SELECT *, MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper FROM q) t
      |  WHERE doc_id = keeper),
      |g AS (SELECT doc_id, n_tokens FROM d WHERE richness >= 0.3),
      |p AS (SELECT doc_id, n_tokens,
      |    CAST(((instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |      + instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) % 8 AS INT) AS shard
      |  FROM g),
      |b AS (SELECT doc_id, n_tokens, shard,
      |    CAST(FLOOR((SUM(n_tokens) OVER w - n_tokens) / 2048.0) AS BIGINT) AS bin
      |  FROM p
      |  WINDOW w AS (PARTITION BY shard ORDER BY doc_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |r AS (SELECT shard, bin, n_tokens,
      |    md5(CAST(doc_id AS VARCHAR) || '|' || CAST(bin AS VARCHAR)) AS h FROM b)
      |SELECT shard, COUNT(*) AS n_docs,
      |  CAST(COUNT(DISTINCT bin) AS BIGINT) AS n_bins,
      |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
      |""".stripMargin +
      s"  CAST(CAST(SUM(CAST(CAST($h48 AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS digest\n" +
      "FROM r GROUP BY shard ORDER BY shard"
  }

  /** Stratified deterministic sample: min(n, |group|) rows per group by
    * md5(key) order — reproducible per-stratum holdouts. */
  private[graft] def etlStratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratified(
        Tables.orders(s, dir), col("o_orderpriority"), col("o_orderkey"), n = 100)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
      .orderBy(col("o_orderpriority"), col("o_orderkey"))

  private[graft] lazy val etlStratifiedSampleSql =
    """SELECT o_orderkey, o_orderpriority, o_totalprice FROM (
      |  SELECT o_orderkey, o_orderpriority, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 100
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** Schema-drift tolerant projection (reference notebook `safe_find`):
    * the upstream delivered arbitrarily re-cased/re-spaced column names;
    * SchemaResolver maps the expected names back on, then the query
    * proceeds as if nothing drifted. Resolution is driver-side only —
    * the physical plan is identical to the undrifted query's. */
  private[graft] def etlResolveCols(s: SparkSession, dir: String): DataFrame = {
    val drifted = Tables.orders(s, dir).toDF(
      "Order Key", "CUST_KEY", "OrderStatus", "Total-Price", "order date", "Priority")
    val resolved = graft.etl.SchemaResolver.select(drifted, Seq(
      "o_orderstatus" -> Seq("status", "order_status"),
      "total_price" -> Seq("totalprice", "total price")))
    resolved.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), moneySum(col("total_price")).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  private[graft] lazy val etlResolveColsSql =
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${moneySumSql("o_totalprice")} AS total
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Snapshots + IncrementalAgg end-to-end under the hard oracle:
    * orders lands in three append commits on a fresh manifest table,
    * the aggregate state is built at v1 and refreshed to v3 by
    * scanning ONLY the files each commit added (never the whole
    * table — the 100 TB point of delta maintenance), and the final
    * state is emitted. The DuckDB oracle aggregates the full orders
    * table in one shot: the incremental path must be bit-identical
    * (IncrementalAgg's exact DECIMAL(24,8) mergeable-state contract).
    */
  private[graft] def etlSnapshotAgg(s: SparkSession, dir: String): DataFrame = {
    import graft.etl.{IncrementalAgg, Snapshots}
    val table = scratchDir("snapagg") + "/orders_snap"
    val o = Tables.orders(s, dir)
      .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
    (0 to 2).foreach { i =>
      Snapshots.commit(
        o.filter(col("o_orderkey") % 3 === i).drop("o_orderkey"), table, "append")
    }
    val keys = Seq("o_orderstatus"); val measures = Seq("o_totalprice")
    val st1 = IncrementalAgg.aggregate(Snapshots.read(s, table, Some(1)), keys, measures)
    val st2 = IncrementalAgg.refresh(st1, IncrementalAgg.delta(s, table, 1, 2), keys, measures)
    val st3 = IncrementalAgg.refresh(st2, IncrementalAgg.delta(s, table, 2, 3), keys, measures)
    st3.select(col("o_orderstatus"), col("n"),
        col("sum_o_totalprice").cast("decimal(24,2)").cast("double").as("spend"))
      .orderBy(col("o_orderstatus"))
  }

  private[graft] lazy val etlSnapshotAggSql =
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${moneySumSql("o_totalprice")} AS spend
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Snapshot pinned reads / time travel under the hard oracle: v1 and
    * v2 append two thirds of orders, v3 OVERWRITES with the last third.
    * A reader pinned to v2 must see exactly v1+v2's rows; the latest
    * reader sees only v3's — both aggregated and union'd with a version
    * tag, so the oracle (which recomputes each slice from the source
    * table) verifies immutability AND overwrite semantics by hash.
    */
  private[graft] def etlSnapshotRead(s: SparkSession, dir: String): DataFrame = {
    import graft.etl.Snapshots
    val table = scratchDir("snapread") + "/orders_snap"
    val o = Tables.orders(s, dir)
      .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 0).drop("o_orderkey"), table, "append")
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 1).drop("o_orderkey"), table, "append")
    Snapshots.commit(o.filter(col("o_orderkey") % 3 === 2).drop("o_orderkey"), table, "overwrite")
    def agg(df: DataFrame, tag: String): DataFrame =
      df.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("spend"))
        .withColumn("snap", lit(tag))
    agg(Snapshots.read(s, table, Some(2)), "v2")
      .unionByName(agg(Snapshots.read(s, table), "v3"))
      .orderBy(col("snap"), col("o_orderstatus"))
  }

  private[graft] lazy val etlSnapshotReadSql =
    s"""WITH t AS (SELECT o_orderstatus, o_totalprice, o_orderkey % 3 AS m FROM orders),
       |v2 AS (SELECT o_orderstatus, COUNT(*) AS n,
       |         ${moneySumSql("o_totalprice")} AS spend, 'v2' AS snap
       |       FROM t WHERE m IN (0, 1) GROUP BY o_orderstatus),
       |v3 AS (SELECT o_orderstatus, COUNT(*) AS n,
       |         ${moneySumSql("o_totalprice")} AS spend, 'v3' AS snap
       |       FROM t WHERE m = 2 GROUP BY o_orderstatus)
       |SELECT * FROM v2 UNION ALL SELECT * FROM v3
       |ORDER BY snap, o_orderstatus""".stripMargin

  /** MERGE-by-key upsert end-to-end under the hard oracle: the base
    * table (orders with key % 4 ≠ 3) lands in a fresh parquet dir, then
    * one CDC batch UPDATES every key % 8 == 0 row (price +1000, status
    * 'U') and INSERTS the held-out key % 4 == 3 rows. Load.upsertParquet
    * merges batch-wins-by-key (broadcast anti-join, temp-and-swap
    * rewrite); the per-status digest of the REWRITTEN DIR is emitted and
    * the oracle reconstructs the same MERGE in SQL — so the sink's merge
    * semantics, not just a frame transform, is what gets hash-checked.
    */
  private[graft] def etlUpsert(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir("upsert") + "/orders"
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    o.filter(col("o_orderkey") % 4 =!= 3).write.parquet(tmp)
    val updates = o.filter(col("o_orderkey") % 8 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + lit(1000.0))
        .withColumn("o_orderstatus", lit("U"))
      .unionByName(o.filter(col("o_orderkey") % 4 === 3))
    graft.etl.Load.upsertParquet(s, tmp, updates, Seq("o_orderkey"))
    s.read.parquet(tmp)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("spend"))
      .orderBy(col("o_orderstatus"))
  }

  private[graft] lazy val etlUpsertSql =
    s"""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
       |              FROM orders WHERE o_orderkey % 4 <> 3),
       |upd AS (SELECT o_orderkey, 'U' AS o_orderstatus,
       |               o_totalprice + 1000.0 AS o_totalprice
       |        FROM orders WHERE o_orderkey % 8 = 0
       |        UNION ALL
       |        SELECT o_orderkey, o_orderstatus, o_totalprice
       |        FROM orders WHERE o_orderkey % 4 = 3),
       |merged AS (SELECT * FROM upd
       |           UNION ALL
       |           SELECT b.* FROM base b
       |           WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM upd))
       |SELECT o_orderstatus, COUNT(*) AS n, ${moneySumSql("o_totalprice")} AS spend
       |FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Partition-scoped upsert under the hard oracle — the genuine 100 TB
    * path: orders partitioned by order-year, a CDC batch touching ONLY
    * year 1996 (price +500 on key % 16 == 0). upsertPartitioned prunes
    * the scan and the rewrite to the touched partition (untouched year
    * dirs are never opened); the emitted per-year digest proves both
    * the merge AND that every other partition survived byte-identical.
    */
  private[graft] def etlUpsertPart(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir("upsert_part") + "/orders"
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).as("o_year"))
    o.write.partitionBy("o_year").parquet(tmp)
    val updates = o.filter(col("o_year") === 1996 && col("o_orderkey") % 16 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(500.0))
    graft.etl.Load.upsertPartitioned(s, tmp, updates, Seq("o_orderkey"), "o_year")
    s.read.parquet(tmp)
      .groupBy(col("o_year").cast("int").as("o_year"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("spend"))
      .orderBy(col("o_year"))
  }

  private[graft] lazy val etlUpsertPartSql =
    s"""WITH t AS (SELECT o_orderkey, o_totalprice,
       |                  CAST(year(o_orderdate) AS INT) AS o_year FROM orders),
       |merged AS (SELECT o_orderkey, o_totalprice + 500.0 AS o_totalprice, o_year
       |           FROM t WHERE o_year = 1996 AND o_orderkey % 16 = 0
       |           UNION ALL
       |           SELECT * FROM t
       |           WHERE NOT (o_year = 1996 AND o_orderkey % 16 = 0))
       |SELECT o_year, COUNT(*) AS n, ${moneySumSql("o_totalprice")} AS spend
       |FROM merged GROUP BY o_year ORDER BY o_year""".stripMargin

  /** Schema-evolution read under the hard oracle: generation 1 files
    * carry (o_orderkey, o_totalprice), generation 2 adds o_orderstatus.
    * Extract.parquetEvolved merges the schemas so gen-1 rows surface the
    * added column as NULL — the digest groups by the evolved column and
    * the oracle recomputes the same split from the source table, so the
    * mergeSchema semantics (old files don't block new columns) is what
    * gets hash-verified. */
  private[graft] def etlSchemaEvolve(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir("evolve") + "/orders"
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.parquet(s"$tmp/gen=1")
    o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .write.parquet(s"$tmp/gen=2")
    graft.etl.Extract.parquetEvolved(s, tmp)
      .groupBy(coalesce(col("o_orderstatus"), lit("<pre-evolution>")).as("status"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("spend"))
      .orderBy(col("status"))
  }

  private[graft] lazy val etlSchemaEvolveSql =
    s"""SELECT CASE WHEN o_orderkey % 2 = 0 THEN '<pre-evolution>'
       |            ELSE o_orderstatus END AS status,
       |       COUNT(*) AS n, ${moneySumSql("o_totalprice")} AS spend
       |FROM orders GROUP BY status ORDER BY status""".stripMargin

  /** Small-files compaction under the hard oracle: orders lands
    * fragmented (64 tiny files), Load.compactParquet rewrites the dir
    * to its size-targeted file count via temp-and-swap, and the digest
    * of the COMPACTED DIR is hash-checked against the source table —
    * the maintenance pass must be a pure layout change, byte-preserving
    * on content. The file-count policy itself is asserted in EtlSpec;
    * here the oracle guards what compaction must never touch: the rows.
    */
  private[graft] def etlCompact(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir("compact") + "/orders"
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .repartition(64).write.parquet(tmp)
    graft.etl.Load.compactParquet(s, tmp)
    s.read.parquet(tmp)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("spend"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy(col("o_orderstatus"))
  }

  private[graft] lazy val etlCompactSql =
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${moneySumSql("o_totalprice")} AS spend,
       |       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** CSV sink → source round-trip under the hard oracle: orders goes
    * out through Load.CsvSink and back in through Extract.csv with an
    * explicit schema, and the digest of what came BACK is hash-checked
    * against the source table — so the text serialization (Double
    * shortest-round-trip formatting, header handling, NULL encoding) is
    * what gets verified, not just the write call succeeding. */
  private[graft] def etlCsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val tmp = scratchDir("csv") + "/orders"
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.etl.Load.CsvSink(tmp).write(o)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType)))
    graft.etl.Extract.csv(s, tmp, Some(schema))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("spend"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy(col("o_orderstatus"))
  }

  private[graft] lazy val etlCsvRoundtripSql =
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${moneySumSql("o_totalprice")} AS spend,
       |       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** One-pass load audit under the hard oracle: orders is written
    * through a sink with Load.writeObserved, whose metrics (row count,
    * null count, exact money sum) ride the write job via the
    * Observation API — no second scan. The OBSERVED values are emitted
    * as the query result and hash-checked against DuckDB recomputing
    * them from the source: the audit numbers a 100 TB load reports for
    * free must be the exact truth, not an approximation. */
  private[graft] def etlWriteObserved(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = scratchDir("obs") + "/orders"
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val m = graft.etl.Load.writeObserved(o, graft.etl.Load.ParquetSink(tmp),
      Map("n" -> count(lit(1)),
        "n_null_status" -> sum(when(col("o_orderstatus").isNull, 1L).otherwise(0L)),
        "spend" -> moneySum(col("o_totalprice"))))
    Seq((m("n").asInstanceOf[Long], m("n_null_status").asInstanceOf[Long],
      m("spend").asInstanceOf[Double])).toDF("n", "n_null_status", "spend")
  }

  private[graft] lazy val etlWriteObservedSql =
    s"""SELECT COUNT(*) AS n,
       |  CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_status,
       |  ${moneySumSql("o_totalprice")} AS spend
       |FROM orders""".stripMargin

  /** JDBC sink → source round-trip under the hard oracle (the
    * reference's hosted-database load, stood in by embedded Derby —
    * networkless, ships with Spark): a deterministic orders slice goes
    * out through JdbcSink (batched inserts, snake_cased identifiers)
    * and back via readBack, and the digest of what the DATABASE returns
    * is hash-checked against the source table — type mapping (double ↔
    * DOUBLE, string ↔ CLOB), batching, and identifier normalization all
    * sit inside the verified loop. Each invocation uses a fresh
    * in-memory db name, so bench repeats don't collide. */
  private[graft] def etlJdbcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val db = "graftq" + java.util.UUID.randomUUID().toString.take(8)
    val url = s"jdbc:derby:memory:$db;create=true"
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .filter(col("o_orderkey") % 10 === 0) // JDBC-sized slice, still 1.5k+ rows
    val sink = graft.etl.Load.JdbcSink(url, "orders_load", numPartitions = 4,
      mode = org.apache.spark.sql.SaveMode.Overwrite)
    sink.write(o)
    sink.readBack(s).get
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("spend"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy(col("o_orderstatus"))
  }

  private[graft] lazy val etlJdbcRoundtripSql =
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${moneySumSql("o_totalprice")} AS spend,
       |       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
       |FROM orders WHERE o_orderkey % 10 = 0
       |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** JSON sink → source round-trip under the hard oracle, completing
    * the text-format pair with [[etlCsvRoundtrip]]: line-delimited JSON
    * out through Load.JsonSink, back through Extract.json with an
    * explicit schema (no inference pass at scale), digest hash-checked
    * against the source — number formatting and field completeness are
    * what's on trial. */
  private[graft] def etlJsonRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val tmp = scratchDir("json") + "/orders"
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.etl.Load.JsonSink(tmp).write(o)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType)))
    graft.etl.Extract.json(s, tmp, Some(schema))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("spend"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy(col("o_orderstatus"))
  }

  private[graft] lazy val etlJsonRoundtripSql =
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${moneySumSql("o_totalprice")} AS spend,
       |       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Multi-dimensional layout under the hard oracle: orders is
    * REWRITTEN along the Hilbert curve over (custkey mod 512, price
    * bucket) — the Layout.hilbertWrite path, range-exchange and all —
    * and a 2-D box filter runs over the clustered copy. The oracle
    * recomputes the box from the source table, so the clustering
    * rewrite provably loses and duplicates nothing; the file-skipping
    * WIN of the layout is measured separately in LayoutSpec (footer
    * stats), since pruning is a planner effect the digest can't see. */
  private[graft] def etlLayoutBox(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir("layout") + "/orders"
    val o = Tables.orders(s, dir).select(
      col("o_orderkey"), (col("o_custkey") % 512).as("cx"),
      floor(col("o_totalprice") / 1000).as("py"))
    graft.operators.Layout.hilbertWrite(o, col("cx"), col("py"), tmp, 16)
    s.read.parquet(tmp)
      .filter(col("cx").between(100, 131) && col("py").between(20, 60))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"),
        min(col("cx")).as("min_cx"), max(col("py")).as("max_py"))
  }

  private[graft] lazy val etlLayoutBoxSql =
    """WITH t AS (SELECT o_orderkey, o_custkey % 512 AS cx,
      |                  CAST(floor(o_totalprice / 1000) AS BIGINT) AS py FROM orders)
      |SELECT COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
      |       MIN(cx) AS min_cx, MAX(py) AS max_py
      |FROM t WHERE cx BETWEEN 100 AND 131 AND py BETWEEN 20 AND 60""".stripMargin

  /** Copy-on-write row-level DELETE under the hard oracle: orders lands
    * range-clustered on the key, then Snapshots.delete removes a narrow
    * key range — rewriting ONLY the files that contain matches (the
    * carry-forward of untouched files is asserted in SnapshotsSpec).
    * Both the pinned pre-delete version and the post-delete latest are
    * digested, so immutability of history AND the delete semantics are
    * hash-checked together. */
  private[graft] def etlSnapshotDelete(s: SparkSession, dir: String): DataFrame = {
    import graft.etl.Snapshots
    val table = scratchDir("snapdel") + "/orders_snap"
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .repartitionByRange(8, col("o_orderkey"))
    Snapshots.commit(o, table, "append")
    Snapshots.delete(s, table, col("o_orderkey") <= 2000)
    def agg(df: DataFrame, tag: String): DataFrame =
      df.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("spend"))
        .withColumn("snap", lit(tag))
    agg(Snapshots.read(s, table, Some(1)), "v1")
      .unionByName(agg(Snapshots.read(s, table), "v2"))
      .orderBy(col("snap"), col("o_orderstatus"))
  }

  private[graft] lazy val etlSnapshotDeleteSql =
    s"""WITH v1 AS (SELECT o_orderstatus, COUNT(*) AS n,
       |         ${moneySumSql("o_totalprice")} AS spend, 'v1' AS snap
       |       FROM orders GROUP BY o_orderstatus),
       |v2 AS (SELECT o_orderstatus, COUNT(*) AS n,
       |         ${moneySumSql("o_totalprice")} AS spend, 'v2' AS snap
       |       FROM orders WHERE NOT (o_orderkey <= 2000)
       |       GROUP BY o_orderstatus)
       |SELECT * FROM v1 UNION ALL SELECT * FROM v2
       |ORDER BY snap, o_orderstatus""".stripMargin

  /** Snapshot version diff under the hard oracle: v1 is the base
    * orders slice, v2 overwrites it with a CDC-shaped transform (drop
    * key % 11 rows, reprice key % 5 rows). Snapshots.diff tags the
    * multiset delta added/removed; the digest groups it by change ×
    * status and the oracle reconstructs the same delta with EXCEPT ALL
    * — so the diff audit ("what did this commit do") is itself what
    * gets hash-verified. */
  private[graft] def etlSnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import graft.etl.Snapshots
    val table = scratchDir("snapdiff") + "/orders_snap"
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    Snapshots.commit(o, table, "append")
    val v2 = o.filter(col("o_orderkey") % 11 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + lit(100.0))
          .otherwise(col("o_totalprice")))
    Snapshots.commit(v2, table, "overwrite")
    Snapshots.diff(s, table, 1, 2)
      .groupBy(col("change"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("spend"))
      .orderBy(col("change"), col("o_orderstatus"))
  }

  private[graft] lazy val etlSnapshotDiffSql =
    s"""WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
       |v2 AS (SELECT o_orderkey, o_orderstatus,
       |         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 100.0
       |              ELSE o_totalprice END AS o_totalprice
       |       FROM base WHERE o_orderkey % 11 <> 0),
       |delta AS (
       |  SELECT *, 'added' AS change FROM (SELECT * FROM v2 EXCEPT ALL SELECT * FROM base)
       |  UNION ALL
       |  SELECT *, 'removed' AS change FROM (SELECT * FROM base EXCEPT ALL SELECT * FROM v2))
       |SELECT change, o_orderstatus, COUNT(*) AS n,
       |       ${moneySumSql("o_totalprice")} AS spend
       |FROM delta GROUP BY change, o_orderstatus
       |ORDER BY change, o_orderstatus""".stripMargin

  /** Zero-copy rollback under the hard oracle: v1 is the good table, v2
    * overwrites it with a corrupted load (half the rows dropped, prices
    * doubled), restore publishes v3 referencing v1's files — one
    * manifest write, no data movement at any table size. The digest
    * reads BOTH the bad v2 (still pinned-readable for forensics) and
    * the restored latest; the oracle recomputes each from the source,
    * so restore-equals-original is what's hash-verified. */
  private[graft] def etlSnapshotRestore(s: SparkSession, dir: String): DataFrame = {
    import graft.etl.Snapshots
    val table = scratchDir("snaprestore") + "/orders_snap"
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    Snapshots.commit(o, table, "append")
    Snapshots.commit(
      o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2), table, "overwrite")
    Snapshots.restore(s, table, 1)
    def agg(df: DataFrame, tag: String): DataFrame =
      df.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("spend"))
        .withColumn("snap", lit(tag))
    agg(Snapshots.read(s, table, Some(2)), "bad")
      .unionByName(agg(Snapshots.read(s, table), "restored"))
      .orderBy(col("snap"), col("o_orderstatus"))
  }

  private[graft] lazy val etlSnapshotRestoreSql =
    s"""WITH bad AS (SELECT o_orderstatus, COUNT(*) AS n,
       |         ${moneySumSql("o_totalprice * 2")} AS spend, 'bad' AS snap
       |       FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_orderstatus),
       |res AS (SELECT o_orderstatus, COUNT(*) AS n,
       |         ${moneySumSql("o_totalprice")} AS spend, 'restored' AS snap
       |       FROM orders GROUP BY o_orderstatus)
       |SELECT * FROM bad UNION ALL SELECT * FROM res
       |ORDER BY snap, o_orderstatus""".stripMargin

  /** Deterministic surrogate-key assignment — the scale-safe replacement for
    * monotonically_increasing_id (whose values depend on partition
    * layout): key = md5 of the natural key, auditable and reproducible
    * on any engine/cluster/partitioning. The digest counts keys,
    * distinct keys (collision audit: must be equal), and pins the
    * lexicographic extremes. */
  private[graft] def etlSurrogateKeys(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(md5(concat_ws("|", lit("ord"), col("o_orderkey"))).as("sk"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("sk")).as("n_distinct"),
        min(col("sk")).as("sk_min"), max(col("sk")).as("sk_max"))

  private[graft] lazy val etlSurrogateKeysSql =
    """WITH k AS (SELECT md5('ord' || '|' || CAST(o_orderkey AS VARCHAR)) AS sk
      |           FROM orders)
      |SELECT COUNT(*) AS n, COUNT(DISTINCT sk) AS n_distinct,
      |       MIN(sk) AS sk_min, MAX(sk) AS sk_max
      |FROM k""".stripMargin

  /** k-anonymity audit (Sweeney, IJUFKS'02) over a quasi-identifier
    * tuple — the privacy gate a training-data release runs before
    * shipping: group customers by (nation, market segment, account-
    * balance band) and report the k (smallest group), how many groups
    * fall under k=5, and how many rows sit in those re-identifiable
    * groups. One groupBy plus a summary aggregate; the band boundary
    * uses the shared parquet doubles through identical IEEE ops on
    * both engines, so banding is cross-engine stable. */
  private[graft] def etlKanon(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("bigint").as("bal_band"))
      .agg(count(lit(1)).as("sz"))
      .agg(count(lit(1)).as("n_groups"), min(col("sz")).as("k_anonymity"),
        sum(when(col("sz") < 5, 1L).otherwise(0L)).as("groups_lt5"),
        sum(when(col("sz") < 5, col("sz")).otherwise(0L)).as("rows_at_risk"))

  private[graft] lazy val etlKanonSql =
    """WITH g AS (SELECT c_nationkey, c_mktsegment,
      |                  CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
      |                  COUNT(*) AS sz
      |           FROM customer GROUP BY 1, 2, 3)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups, MIN(sz) AS k_anonymity,
      |       CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS groups_lt5,
      |       CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS rows_at_risk
      |FROM g""".stripMargin

  /** Leakage-free k-fold target encoding — the ML-prep shape where a
    * category's target rate must be computed WITHOUT each row's own
    * fold (plain target encoding leaks the label into the feature;
    * the k-fold exclusion is the standard fix). fold = natural key mod
    * 5 (deterministic, engine-portable), per-(category, fold) counts in
    * one groupBy, and each fold's out-of-fold encoding comes from the
    * category total minus its own fold via a window over the tiny
    * (cat × fold) aggregate — the corpus is scanned once; integers
    * throughout, one final division. */
  private[graft] def etlKfoldEncode(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir).select(
      col("o_orderpriority").as("cat"),
      (col("o_orderkey") % 5).as("fold"),
      when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
    val pf = base.groupBy("cat", "fold")
      .agg(count(lit(1)).as("n_f"), sum("y").as("pos_f"))
    val w = Window.partitionBy("cat")
    pf.select(col("cat"), col("fold"), col("n_f"), col("pos_f"),
        (sum("n_f").over(w) - col("n_f")).as("n_out"),
        (sum("pos_f").over(w) - col("pos_f")).as("pos_out"))
      // unrounded single int/int division (IEEE, cross-engine identical);
      // guarded: a category living in one fold has n_out=0 and the engines
      // disagree on double x/0 (Spark NULL vs DuckDB inf) — emit NULL
      .withColumn("enc",
        when(col("n_out") > 0,
          col("pos_out").cast("double") / col("n_out").cast("double")))
      .orderBy("cat", "fold")
  }

  private[graft] lazy val etlKfoldEncodeSql =
    """WITH b AS (SELECT o_orderpriority AS cat, o_orderkey % 5 AS fold,
      |                  CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      |           FROM orders),
      |pf AS (SELECT cat, fold, COUNT(*) AS n_f, CAST(SUM(y) AS BIGINT) AS pos_f
      |       FROM b GROUP BY 1, 2),
      |o AS (SELECT cat, fold, n_f, pos_f,
      |        CAST(SUM(n_f) OVER (PARTITION BY cat) - n_f AS BIGINT) AS n_out,
      |        CAST(SUM(pos_f) OVER (PARTITION BY cat) - pos_f AS BIGINT) AS pos_out
      |      FROM pf)
      |SELECT cat, fold, n_f, pos_f, n_out, pos_out,
      |       CASE WHEN n_out > 0
      |            THEN CAST(pos_out AS DOUBLE) / CAST(n_out AS DOUBLE) END AS enc
      |FROM o ORDER BY cat, fold""".stripMargin

  /** Hashing-trick feature bucketing (Weinberger et al., ICML'09) with
    * a collision audit: categorical features hash into 32 buckets via
    * two md5 hex nibbles — nibble values through
    * instr('0123456789abcdef', ·), so the hash is replayable on any
    * engine with md5/substr/instr, unlike engine-native hash()
    * functions. 256 two-nibble values mod 32 is exactly uniform. The
    * audit reports rows and DISTINCT feature values per bucket (the
    * collision structure the dimensionality reduction trades away).
    * Map-side projection + one groupBy on a small int key. */
  private[graft] def etlFeatureHash(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val feats = c.select(concat(lit("seg="), col("c_mktsegment")).as("feat"))
      .unionAll(c.select(concat(lit("nat="), col("c_nationkey").cast("string")).as("feat")))
    feats
      .withColumn("bucket", expr(
        """((instr('0123456789abcdef', substr(md5(feat), 1, 1)) - 1) * 16
          | + instr('0123456789abcdef', substr(md5(feat), 2, 1)) - 1) % 32""".stripMargin)
        .cast("long"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), countDistinct(col("feat")).as("n_values"))
      .orderBy("bucket")
  }

  private[graft] lazy val etlFeatureHashSql =
    """WITH f AS (SELECT 'seg=' || c_mktsegment AS feat FROM customer
      |           UNION ALL
      |           SELECT 'nat=' || CAST(c_nationkey AS VARCHAR) FROM customer),
      |h AS (SELECT feat,
      |        CAST(((instr('0123456789abcdef', substr(md5(feat), 1, 1)) - 1) * 16
      |              + instr('0123456789abcdef', substr(md5(feat), 2, 1)) - 1) % 32
      |             AS BIGINT) AS bucket
      |      FROM f)
      |SELECT bucket, COUNT(*) AS n, COUNT(DISTINCT feat) AS n_values
      |FROM h GROUP BY bucket ORDER BY bucket""".stripMargin

  /** ORC sink → source round-trip under the hard oracle, completing the
    * columnar-format pair with parquet (`etl_compact`/`etl_upsert`):
    * orders goes out through Load.OrcSink and back through Extract.orc,
    * and the digest of what came BACK is hash-checked against the
    * source — ORC's type mapping (double, string, bigint) and
    * stripe-level round-tripping are what's verified. ORC ships in
    * Spark proper; predicate pushdown and column pruning apply to the
    * read-back scan exactly as for parquet. */
  private[graft] def etlOrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir("orc") + "/orders"
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    graft.etl.Load.OrcSink(tmp).write(o)
    graft.etl.Extract.orc(s, tmp)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("spend"),
        sum(col("o_orderkey")).as("key_sum"))
      .orderBy(col("o_orderstatus"))
  }

  private[graft] lazy val etlOrcRoundtripSql =
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${moneySumSql("o_totalprice")} AS spend,
       |       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** k-anonymity generalization ladder — the fix for what [[etlKanon]]
    * audits: evaluate candidate quasi-identifier coarsenings
    * (account-balance band widths 500→5000) in ONE pass by exploding
    * each row into every candidate width, then report per width the
    * group count, the achieved k, and rows still under k=5 — the
    * release picks the narrowest width whose k clears the bar
    * (generalize minimally, Sweeney'02 §5). Shuffle is |widths|×rows
    * of small tuples, one exchange. */
  private[graft] def etlKanonGeneralize(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"),
        explode(array(lit(500), lit(1000), lit(2000), lit(5000))).as("width"))
      .groupBy(col("width"), col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / col("width").cast("double")).cast("bigint").as("band"))
      .agg(count(lit(1)).as("sz"))
      .groupBy(col("width").cast("long").as("width"))
      .agg(count(lit(1)).as("n_groups"), min("sz").as("k"),
        sum(when(col("sz") < 5, col("sz")).otherwise(0L)).as("rows_at_risk"))
      .withColumn("meets_k5", col("k") >= 5)
      .orderBy("width")

  private[graft] lazy val etlKanonGeneralizeSql =
    """WITH w AS (SELECT UNNEST([500, 1000, 2000, 5000]) AS width),
      |g AS (SELECT width, c_nationkey, c_mktsegment,
      |             CAST(FLOOR(c_acctbal / CAST(width AS DOUBLE)) AS BIGINT) AS band,
      |             COUNT(*) AS sz
      |      FROM customer, w GROUP BY 1, 2, 3, 4),
      |a AS (SELECT CAST(width AS BIGINT) AS width, COUNT(*) AS n_groups, MIN(sz) AS k,
      |             CAST(SUM(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT) AS rows_at_risk
      |      FROM g GROUP BY 1)
      |SELECT width, n_groups, k, rows_at_risk, k >= 5 AS meets_k5
      |FROM a ORDER BY width""".stripMargin

  /** Deterministic pseudonymization (salted md5 tokens) with the two
    * audits that make masking production-safe: a collision audit
    * (distinct tokens must equal distinct keys) and a JOINABILITY
    * audit — fact rows mapped through the same token function must
    * join the masked dimension exactly as the raw keys did, proving
    * referential integrity survives the masking. Tokens are
    * engine-portable (md5 over a salted decimal string), so a
    * downstream system can re-derive them; row-local projection +
    * one join on the 14-char token. */
  private[graft] def etlPseudonymize(s: SparkSession, dir: String): DataFrame = {
    def tok(c: Column): Column =
      concat(lit("c-"), substring(md5(concat(lit("s1|"), c.cast("string"))), 1, 12))
    val cust = Tables.customer(s, dir).select(tok(col("c_custkey")).as("t"))
    val ords = Tables.orders(s, dir).select(tok(col("o_custkey")).as("t"))
    val a = cust.agg(count(lit(1)).as("n_cust"), countDistinct(col("t")).as("n_tokens"))
    val j = ords.join(cust.distinct(), Seq("t")).agg(count(lit(1)).as("n_orders_joined"))
    val o = Tables.orders(s, dir).agg(count(lit(1)).as("n_orders"))
    a.crossJoin(j).crossJoin(o)
      .select(col("n_cust"), col("n_tokens"),
        (col("n_cust") - col("n_tokens")).as("n_collisions"),
        col("n_orders"), col("n_orders_joined"))
  }

  private[graft] lazy val etlPseudonymizeSql =
    """WITH ct AS (SELECT 'c-' || substr(md5('s1|' || CAST(c_custkey AS VARCHAR)), 1, 12) AS t
      |            FROM customer),
      |ot AS (SELECT 'c-' || substr(md5('s1|' || CAST(o_custkey AS VARCHAR)), 1, 12) AS t
      |       FROM orders),
      |a AS (SELECT COUNT(*) AS n_cust, COUNT(DISTINCT t) AS n_tokens FROM ct),
      |j AS (SELECT COUNT(*) AS n_orders_joined
      |      FROM ot JOIN (SELECT DISTINCT t FROM ct) d USING (t)),
      |o AS (SELECT COUNT(*) AS n_orders FROM orders)
      |SELECT n_cust, n_tokens, CAST(n_cust - n_tokens AS BIGINT) AS n_collisions,
      |       n_orders, n_orders_joined
      |FROM a, j, o""".stripMargin

  /** ε-differentially-private release of group counts with SEEDED
    * Laplace noise (Dwork et al. TCC'06; seeded DP = the reproducible-
    * release variant: the noise draw is a deterministic function of a
    * salted group hash, so reruns and the oracle replay the exact same
    * release). The uniform comes from six md5 hex nibbles (engine-
    * portable, as etl_feature_hash), inverse-CDF'd through the shared
    * Laplace formula; ROUND(·,6) absorbs libm ln ulp skew. Sensitivity
    * 1 count query, scale b = 2 ⇒ ε = 0.5. Map-side after one
    * groupBy. */
  private[graft] def etlDpCounts(s: SparkSession, dir: String): DataFrame = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(md5('dp1|' || cat), $i, 1)) - 1)"
    val uExpr = s"(((((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)}) * 16 + ${nib(5)}) * 16 + ${nib(6)}) / 16777216.0"
    val noisy = s"ROUND(c + (-2.0 * sign($uExpr - 0.5) * ln(1.0 - 2.0 * abs($uExpr - 0.5))), 6)"
    Tables.customer(s, dir)
      .groupBy(col("c_mktsegment").as("cat"))
      .agg(count(lit(1)).as("c"))
      .withColumn("noisy_count", expr(noisy))
      .select(col("cat"), col("noisy_count"))
      .orderBy("cat")
  }

  private[graft] lazy val etlDpCountsSql = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(md5('dp1|' || cat), $i, 1)) - 1)"
    val uExpr = s"(((((${nib(1)} * 16 + ${nib(2)}) * 16 + ${nib(3)}) * 16 + ${nib(4)}) * 16 + ${nib(5)}) * 16 + ${nib(6)}) / 16777216.0"
    s"""WITH g AS (SELECT c_mktsegment AS cat, COUNT(*) AS c FROM customer GROUP BY 1)
       |SELECT cat,
       |  ROUND(c + (-2.0 * sign($uExpr - 0.5) * ln(1.0 - 2.0 * abs($uExpr - 0.5))), 6) AS noisy_count
       |FROM g ORDER BY cat""".stripMargin
  }

  /** Malformed-input coercion audit, end-to-end through the PERMISSIVE
    * text path: a CSV is WRITTEN with deterministic corruption ('N/A'
    * injected into the price of every 97th key — the reference data's
    * TotalCharges blanks), read back with a typed schema (malformed
    * numerics coerce to NULL rather than failing the load), and the
    * audit counts rows, coerced NULLs, and the surviving money sum.
    * The oracle recomputes all three arithmetically from the clean
    * table, so the text round-trip AND the coercion rule are what's
    * hash-verified. */
  private[graft] def etlCoerceAudit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val tmp = scratchDir("coerce") + "/orders"
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 97 === 0, lit("N/A"))
          .otherwise(col("o_totalprice").cast("string")).as("o_totalprice"))
      .write.mode("overwrite").option("header", "true").csv(tmp)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType), StructField("o_totalprice", DoubleType)))
    graft.etl.Extract.csv(s, tmp, Some(schema))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").isNull.cast("long")).as("n_coerced"),
        moneySum(col("o_totalprice")).as("clean_sum"))
  }

  private[graft] lazy val etlCoerceAuditSql =
    s"""SELECT COUNT(*) AS n,
       |  CAST(SUM(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_coerced,
       |  ${moneySumSql("CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_totalprice END")} AS clean_sum
       |FROM orders""".stripMargin

  /** Order-independent whole-table content fingerprint — the
    * reconciliation primitive for "are these two copies identical"
    * across engines/clusters without sorting or moving the table: each
    * row hashes to an md5-derived 48-bit integer (hex nibbles through
    * the engine-portable instr trick), and the fingerprint is the
    * exact SUM — commutative, so partitioning and order are
    * irrelevant, and any single-row change shifts it. The sum runs in
    * DECIMAL(38,0) and is emitted as a digit string: uniform 48-bit
    * terms mean the BIGINT sum would wrap past ~65K rows (n·2^47 >
    * Long.MaxValue), silently on Spark and loudly on engines that
    * widen — decimal accumulation keeps the fingerprint exact to
    * ~10^23 rows, and the string emission pins one cross-engine
    * representation. Map-side projection + one scalar aggregate. */
  private[graft] def etlTableFingerprint(s: SparkSession, dir: String): DataFrame = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    // fold in BIGINT from the first term — 16^12 = 2^48 overflows INT32
    val h48 = (2 to 12).map(nib)
      .foldLeft(s"CAST(${nib(1)} AS BIGINT)")((a, b) => s"($a * 16 + $b)")
    Tables.orders(s, dir)
      .select(md5(concat_ws("|", col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority"))).as("h"))
      .selectExpr(s"CAST($h48 AS BIGINT) AS hv")
      .agg(count(lit(1)).as("n"),
        sum(col("hv").cast("decimal(38,0)")).cast("decimal(38,0)")
          .cast("string").as("fingerprint"))
  }

  private[graft] lazy val etlTableFingerprintSql = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    val h48 = (2 to 12).map(nib)
      .foldLeft(s"CAST(${nib(1)} AS BIGINT)")((a, b) => s"($a * 16 + $b)")
    s"""WITH r AS (SELECT md5(CAST(o_orderkey AS VARCHAR) || '|' || o_orderstatus
       |                      || '|' || o_orderpriority) AS h FROM orders)
       |SELECT COUNT(*) AS n,
       |  CAST(CAST(SUM(CAST(CAST($h48 AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS fingerprint
       |FROM r""".stripMargin
  }

  /** Partition-layout audit before a partitioned write: row counts per
    * candidate partition value (order month), the size envelope, and
    * the skew ratio max/avg — the number that says whether this
    * partitioning produces one elephant task at 100 TB. One bounded-key
    * groupBy plus a summary aggregate. */
  private[graft] def etlPartitionAudit(s: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("part"))
      .agg(count(lit(1)).as("rows"))
    perPart.agg(count(lit(1)).as("n_partitions"),
        min("rows").as("rows_min"), max("rows").as("rows_max"),
        sum("rows").as("rows_total"))
      .withColumn("skew_ratio", expr(
        "CAST(rows_max AS DOUBLE) * CAST(n_partitions AS DOUBLE) / CAST(rows_total AS DOUBLE)"))
  }

  private[graft] lazy val etlPartitionAuditSql =
    """WITH p AS (SELECT date_trunc('month', o_orderdate) AS part, COUNT(*) AS rows
      |           FROM orders GROUP BY 1)
      |SELECT COUNT(*) AS n_partitions, MIN(rows) AS rows_min, MAX(rows) AS rows_max,
      |  CAST(SUM(rows) AS BIGINT) AS rows_total,
      |  CAST(MAX(rows) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE) / CAST(SUM(rows) AS DOUBLE) AS skew_ratio
      |FROM p""".stripMargin

  /** CDC log compaction — the change-capture primitive every lakehouse
    * ingest needs: a log of I/U/D operations with per-key sequence
    * numbers collapses to latest-op-wins final state, deletes drop the
    * key entirely. The log is MANUFACTURED deterministically from
    * orders (inserts = all keys; updates flip every 5th key to status
    * 'U' at seq 2; deletes remove every 7th key at seq 3), compaction
    * is one row_number window over (key, seq desc) — a single exchange
    * on the key, the upsertParquet/q_merge_latest execution shape —
    * and the digest aggregates the SURVIVING state per status, so
    * op precedence, delete semantics, and the seq tie-break are all
    * hash-verified. At 100 TB: shuffle carries (key, seq, op, status,
    * cents) — never full rows of a wide table. */
  private[graft] def etlCdcCompact(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
      col("o_orderstatus").as("st"),
      (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("cents"))
    val ins = o.select(col("k"), lit(1L).as("seq"), lit("I").as("op"),
      col("st"), col("cents"))
    val upd = o.filter(col("k") % 5 === 0).select(col("k"), lit(2L).as("seq"),
      lit("U").as("op"), lit("U").as("st"), (col("cents") + 100L).as("cents"))
    val del = o.filter(col("k") % 7 === 0).select(col("k"), lit(3L).as("seq"),
      lit("D").as("op"), lit(null).cast("string").as("st"),
      lit(null).cast("bigint").as("cents"))
    val log = ins.unionByName(upd).unionByName(del)
    val w = Window.partitionBy(col("k")).orderBy(col("seq").desc)
    log.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .groupBy(col("st"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"),
        sum(col("k")).as("key_sum"))
      .orderBy(col("st"))
  }

  private[graft] lazy val etlCdcCompactSql =
    """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS st,
      |                  CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS cents
      |           FROM orders),
      |log AS (
      |  SELECT k, CAST(1 AS BIGINT) AS seq, 'I' AS op, st, cents FROM o
      |  UNION ALL
      |  SELECT k, 2, 'U', 'U', cents + 100 FROM o WHERE k % 5 = 0
      |  UNION ALL
      |  SELECT k, 3, 'D', NULL, NULL FROM o WHERE k % 7 = 0),
      |latest AS (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
      |  FROM log)
      |SELECT st, COUNT(*) AS n,
      |       CAST(SUM(cents) AS BIGINT) AS cents_sum,
      |       CAST(SUM(k) AS BIGINT) AS key_sum
      |FROM latest WHERE rn = 1 AND op <> 'D'
      |GROUP BY st ORDER BY st""".stripMargin

  /** Merkle-style partition reconciliation — "which shards of these
    * two 100 TB copies differ", answered by exchanging BUCKET
    * fingerprints instead of rows: both copies (B carries
    * deterministic corruption — every 101st key's price bumped one
    * cent, every 997th key dropped) fold each row's md5-derived
    * 48-bit hash into a per-bucket DECIMAL(38,0) sum + count
    * ([[etlTableFingerprint]]'s primitive, bucketed by key mod 64),
    * and a full outer join of the 64-row summaries flags the buckets
    * needing repair. Only flagged buckets would be re-shipped — the
    * anti-entropy protocol of replicated stores, as one declarative
    * plan. */
  private[graft] def etlMerkleDiff(s: SparkSession, dir: String): DataFrame = {
    def nib(src: String, i: Int) = s"(instr('0123456789abcdef', substr($src, $i, 1)) - 1)"
    def h48(src: String) = (2 to 12).map(nib(src, _))
      .foldLeft(s"CAST(${nib(src, 1)} AS BIGINT)")((a, b) => s"($a * 16 + $b)")
    val base = Tables.orders(s, dir).select(col("o_orderkey").as("k"),
      (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("cents"))
    val a = base
    val b = base.filter(col("k") % 997 =!= 0)
      .select(col("k"), when(col("k") % 101 === 0, col("cents") + 1L)
        .otherwise(col("cents")).as("cents"))
    def buckets(df: DataFrame, side: String) = df
      .withColumn("h", md5(concat_ws("|", col("k"), col("cents"))))
      .selectExpr("k % 64 AS bucket", s"CAST(${h48("h")} AS BIGINT) AS hv")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as(s"n_$side"),
        sum(col("hv").cast("decimal(38,0)")).cast("decimal(38,0)")
          .cast("string").as(s"fp_$side"))
    buckets(a, "a").join(buckets(b, "b"), Seq("bucket"), "full_outer")
      .select(col("bucket"), col("n_a"), col("n_b"),
        (col("n_a") <=> col("n_b") && col("fp_a") <=> col("fp_b")).as("in_sync"))
      .orderBy(col("bucket"))
  }

  private[graft] lazy val etlMerkleDiffSql = {
    def nib(i: Int) = s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1)"
    val h48 = (2 to 12).map(nib)
      .foldLeft(s"CAST(${nib(1)} AS BIGINT)")((a, b) => s"($a * 16 + $b)")
    s"""WITH base AS (SELECT o_orderkey AS k,
       |                CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS cents
       |              FROM orders),
       |a AS (SELECT k, cents FROM base),
       |b AS (SELECT k, CASE WHEN k % 101 = 0 THEN cents + 1 ELSE cents END AS cents
       |      FROM base WHERE k % 997 <> 0),
       |ha AS (SELECT k % 64 AS bucket,
       |              md5(CAST(k AS VARCHAR) || '|' || CAST(cents AS VARCHAR)) AS h FROM a),
       |hb AS (SELECT k % 64 AS bucket,
       |              md5(CAST(k AS VARCHAR) || '|' || CAST(cents AS VARCHAR)) AS h FROM b),
       |fa AS (SELECT bucket, COUNT(*) AS n_a,
       |         CAST(CAST(SUM(CAST(CAST($h48 AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS fp_a
       |       FROM ha GROUP BY bucket),
       |fb AS (SELECT bucket, COUNT(*) AS n_b,
       |         CAST(CAST(SUM(CAST(CAST($h48 AS BIGINT) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS VARCHAR) AS fp_b
       |       FROM hb GROUP BY bucket)
       |SELECT bucket, n_a, n_b,
       |       (n_a IS NOT DISTINCT FROM n_b AND fp_a IS NOT DISTINCT FROM fp_b) AS in_sync
       |FROM fa FULL OUTER JOIN fb USING (bucket)
       |ORDER BY bucket""".stripMargin
  }

  /** One-hot categorical encoding ([[graft.etl.Features.oneHot]] —
    * pd.get_dummies shape, fixed category list so the schema is
    * data-independent). Map-only projection; indicators land as INT so
    * a downstream feature matrix can sum them without casts. */
  private[graft] def etlOnehot(s: SparkSession, dir: String): DataFrame = {
    val cols = Features.oneHot(col("o_orderpriority"),
      Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"), "prio") ++
      Features.oneHot(col("o_orderstatus"), Seq("F", "O", "P"), "status")
    Tables.orders(s, dir)
      .select(col("o_orderkey") +: cols.map { case (n, c) => c.as(n) }: _*)
      .orderBy(col("o_orderkey"))
  }

  private[graft] lazy val etlOnehotSql =
    """SELECT o_orderkey,
      |  CAST(o_orderpriority = '1-URGENT' AS INT) AS prio_1_urgent,
      |  CAST(o_orderpriority = '2-HIGH' AS INT) AS prio_2_high,
      |  CAST(o_orderpriority = '3-MEDIUM' AS INT) AS prio_3_medium,
      |  CAST(o_orderpriority = '4-NOT SPECIFIED' AS INT) AS prio_4_not_specified,
      |  CAST(o_orderpriority = '5-LOW' AS INT) AS prio_5_low,
      |  CAST(o_orderstatus = 'F' AS INT) AS status_f,
      |  CAST(o_orderstatus = 'O' AS INT) AS status_o,
      |  CAST(o_orderstatus = 'P' AS INT) AS status_p
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Per-segment feature scaling — z-score and min-max of account
    * balance, the standard ML-prep normalizations. ONE tiny per-segment
    * aggregate (decimal sums, exact) broadcast back onto the rows; the
    * scaling itself is a map-only projection. The z-score rounds at 6
    * (the decimal→double sum conversions carry a 1-ulp wobble past the
    * 2^53 window — the an_stats_moments discipline); min-max divides
    * bit-identical doubles and ships unrounded. */
  private[graft] def etlScale(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    def dsum(x: Column) = sum(x.cast("decimal(38,8)")).cast("double")
    val stats = c.groupBy(col("c_mktsegment")).agg(
      count(lit(1)).as("n"),
      dsum(col("c_acctbal")).as("sx"),
      dsum(col("c_acctbal") * col("c_acctbal")).as("sxx"),
      min(col("c_acctbal")).as("mn"), max(col("c_acctbal")).as("mx"))
    c.join(broadcast(stats), Seq("c_mktsegment"))
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        round((col("c_acctbal") - col("sx") / col("n")) /
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)), 6)
          .as("z"),
        ((col("c_acctbal") - col("mn")) / (col("mx") - col("mn"))).as("minmax"))
      .orderBy(col("c_custkey"))
  }

  private[graft] lazy val etlScaleSql =
    """WITH st AS (SELECT c_mktsegment, COUNT(*) AS n,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(38,8))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(38,8))) AS DOUBLE) AS sxx,
      |    MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx
      |  FROM customer GROUP BY 1)
      |SELECT c_custkey, c_mktsegment, c_acctbal,
      |  ROUND((c_acctbal - sx / n) / sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS z,
      |  (c_acctbal - mn) / (mx - mn) AS minmax
      |FROM customer JOIN st USING (c_mktsegment) ORDER BY c_custkey""".stripMargin

  /** Early-arriving facts (Kimball's late-arriving dimension): orders
    * referencing customers missing from the dimension snapshot (a
    * deterministic ~87% md5 subset stands in for the lagging dim feed)
    * are counted and their distinct missing members surfaced — the
    * rows a warehouse would land as "inferred members" to be enriched
    * when the dimension catches up. One custkey join (broadcast-able
    * dim at this shape, shuffle-partitioned when the dim is wide). */
  private[graft] def etlEarlyFact(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(s, dir)
      .filter(substring(md5(col("c_custkey").cast("string")), 1, 1) < "e")
      .select(col("c_custkey"))
    Tables.orders(s, dir)
      .join(dim, col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_facts"),
        sum(when(col("c_custkey").isNotNull, 1L).otherwise(0L)).as("n_matched"),
        sum(when(col("c_custkey").isNull, 1L).otherwise(0L)).as("n_inferred"),
        countDistinct(when(col("c_custkey").isNull, col("o_custkey")))
          .as("n_inferred_members"))
      .orderBy(col("o_orderstatus"))
  }

  private[graft] lazy val etlEarlyFactSql =
    """WITH dim AS (SELECT c_custkey FROM customer
      |             WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) < 'e')
      |SELECT o_orderstatus, COUNT(*) AS n_facts,
      |  CAST(SUM(CASE WHEN c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
      |  CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_inferred,
      |  COUNT(DISTINCT CASE WHEN c_custkey IS NULL THEN o_custkey END) AS n_inferred_members
      |FROM orders LEFT JOIN dim ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** l-diversity audit — the sensitive-attribute companion to etl_kanon:
    * k-anonymity bounds re-identification but a uniform sensitive value
    * inside a QI group still leaks; this reports, per (segment, nation)
    * QI group over the order fact, the distinct-priority count l, and
    * aggregates the min l, the groups below l=3 and the row mass exposed
    * in them. One groupBy tree, counts only — exact at any SF. */
  private[graft] def etlLdiversity(s: SparkSession, dir: String): DataFrame = {
    val rows = Tables.orders(s, dir)
      .join(broadcast(Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("c_nationkey").as("nat"),
        col("o_orderpriority").as("sv"))
    val groups = rows.groupBy(col("seg"), col("nat"))
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("sv")).as("l"))
    groups.agg(count(lit(1)).as("n_groups"), min(col("l")).as("min_l"),
      sum(when(col("l") < 3, 1L).otherwise(0L)).as("n_below_3"),
      sum(when(col("l") < 3, col("n_rows")).otherwise(0L)).as("rows_exposed"),
      sum(col("n_rows")).as("n_rows"))
  }

  private[graft] lazy val etlLdiversitySql =
    """WITH r AS (SELECT c.c_mktsegment AS seg, c.c_nationkey AS nat,
      |    o.o_orderpriority AS sv
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      |g AS (SELECT seg, nat, COUNT(*) AS n_rows, COUNT(DISTINCT sv) AS l
      |      FROM r GROUP BY seg, nat)
      |SELECT COUNT(*) AS n_groups, CAST(MIN(l) AS BIGINT) AS min_l,
      |  CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_3,
      |  CAST(SUM(CASE WHEN l < 3 THEN n_rows ELSE 0 END) AS BIGINT) AS rows_exposed,
      |  CAST(SUM(n_rows) AS BIGINT) AS n_rows
      |FROM g""".stripMargin

  /** URL canonicalization + variant collapse — the web-ingest ETL step
    * (the corpus has no URL column, so deterministic messy variants are
    * manufactured per doc, the text_pii_audit injection recipe): case
    * noise, www. prefixes, explicit :443 default ports, trailing
    * slashes, utm_* tracking params and fragments. Normalization is
    * pure portable string algebra — split-at-#/? (never regex: Spark
    * regex is java.util.regex, DuckDB is RE2 — not replay-safe),
    * lowercase host, strip default port/www./trailing slash, drop
    * utm_* params keeping the rest in order — and the canonical groups
    * are hash-checked: 500 raw docs collapse to 50 canonicals. Row-local
    * projection + one groupBy; scales like any dedup-key build. */
  private[graft] def etlUrlNormalize(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val hostCore = concat(
      when(id % 2 === 0, lit("www.")).otherwise(lit("")),
      lit("cdn"), (id % 5).cast("string"), lit(".example.com"),
      when(id % 5 === 0, lit(":443")).otherwise(lit("")))
    val raw = concat(lit("https://"),
      when(id % 3 === 0, upper(hostCore)).otherwise(hostCore),
      lit("/docs/"), (id % 25).cast("string"),
      when(id % 4 === 1, lit("/")).otherwise(lit("")),
      when(id % 2 === 1 && id % 3 === 2,
          concat(lit("?utm_source=feed&ref=2&utm_campaign="), (id % 7).cast("string")))
        .when(id % 2 === 1,
          concat(lit("?utm_source=feed&utm_campaign="), (id % 7).cast("string")))
        .when(id % 3 === 2, lit("?ref=2")).otherwise(lit("")),
      when(id % 4 === 2, concat(lit("#p"), (id % 3).cast("string"))).otherwise(lit("")))
    Tables.documents(s, dir).select(id.as("doc_id"), raw.as("u"))
      .withColumn("u1", substring_index(col("u"), "#", 1))
      .withColumn("base", substring_index(col("u1"), "?", 1))
      .withColumn("q", when(instr(col("u1"), "?") > 0,
        substring_index(col("u1"), "?", -1)).otherwise(lit("")))
      .withColumn("params", array_join(filter(split(col("q"), "&"),
        p => p =!= lit("") && !p.startsWith("utm_")), "&"))
      .withColumn("rest", expr("substring(base, 9)"))
      .withColumn("hostport", substring_index(col("rest"), "/", 1))
      .withColumn("path", expr("substring(rest, length(hostport) + 1)"))
      .withColumn("h1", lower(col("hostport")))
      .withColumn("h2", when(expr("substring(h1, length(h1) - 3)") === ":443",
        expr("substring(h1, 1, length(h1) - 4)")).otherwise(col("h1")))
      .withColumn("host", when(substring(col("h2"), 1, 4) === "www.",
        expr("substring(h2, 5)")).otherwise(col("h2")))
      .withColumn("cpath", when(length(col("path")) > 1 &&
          expr("substring(path, length(path))") === "/",
        expr("substring(path, 1, length(path) - 1)")).otherwise(col("path")))
      .withColumn("canonical", concat(lit("https://"), col("host"), col("cpath"),
        when(col("params") =!= "", concat(lit("?"), col("params"))).otherwise(lit(""))))
      .groupBy(col("canonical"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("u")).as("n_variants"))
      .orderBy(col("canonical"))
  }

  private[graft] lazy val etlUrlNormalizeSql =
    """WITH raw AS (SELECT doc_id,
      |    'https://' ||
      |    (CASE WHEN doc_id % 3 = 0
      |      THEN upper((CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END) || 'cdn' || (doc_id % 5) || '.example.com' || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END))
      |      ELSE (CASE WHEN doc_id % 2 = 0 THEN 'www.' ELSE '' END) || 'cdn' || (doc_id % 5) || '.example.com' || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END) END) ||
      |    '/docs/' || (doc_id % 25) ||
      |    (CASE WHEN doc_id % 4 = 1 THEN '/' ELSE '' END) ||
      |    (CASE WHEN doc_id % 2 = 1 AND doc_id % 3 = 2 THEN '?utm_source=feed&ref=2&utm_campaign=' || (doc_id % 7)
      |          WHEN doc_id % 2 = 1 THEN '?utm_source=feed&utm_campaign=' || (doc_id % 7)
      |          WHEN doc_id % 3 = 2 THEN '?ref=2' ELSE '' END) ||
      |    (CASE WHEN doc_id % 4 = 2 THEN '#p' || (doc_id % 3) ELSE '' END) AS u
      |  FROM documents),
      |s1 AS (SELECT doc_id, u, split_part(u, '#', 1) AS u1 FROM raw),
      |s2 AS (SELECT doc_id, u, split_part(u1, '?', 1) AS base, split_part(u1, '?', 2) AS q FROM s1),
      |s3 AS (SELECT doc_id, u, base,
      |    array_to_string(list_filter(string_split(q, '&'), p -> p <> '' AND NOT starts_with(p, 'utm_')), '&') AS params
      |  FROM s2),
      |s4 AS (SELECT doc_id, u, params, substr(base, 9) AS rest FROM s3),
      |s5 AS (SELECT doc_id, u, params, split_part(rest, '/', 1) AS hostport,
      |    substr(rest, length(split_part(rest, '/', 1)) + 1) AS path FROM s4),
      |s6 AS (SELECT doc_id, u, params, path, lower(hostport) AS h1 FROM s5),
      |s7 AS (SELECT doc_id, u, params, path,
      |    CASE WHEN right(h1, 4) = ':443' THEN left(h1, length(h1) - 4) ELSE h1 END AS h2 FROM s6),
      |s8 AS (SELECT doc_id, u, params, path,
      |    CASE WHEN left(h2, 4) = 'www.' THEN substr(h2, 5) ELSE h2 END AS host FROM s7),
      |s9 AS (SELECT doc_id, u, params, host,
      |    CASE WHEN length(path) > 1 AND right(path, 1) = '/' THEN left(path, length(path) - 1) ELSE path END AS cpath FROM s8),
      |canon AS (SELECT doc_id, u,
      |    'https://' || host || cpath || (CASE WHEN params <> '' THEN '?' || params ELSE '' END) AS canonical FROM s9)
      |SELECT canonical, COUNT(*) AS n_docs, COUNT(DISTINCT u) AS n_variants
      |FROM canon GROUP BY canonical ORDER BY canonical""".stripMargin

  /** Rare-category collapse over the customer-nation axis of orders —
    * the long-tail guard every categorical encoder needs BEFORE
    * one-hot/target encoding (a category seen 12 times gets a noise
    * embedding; collapsing the tail to OTHER caps cardinality at
    * scale, where new tail categories appear continuously). Share
    * test on exact integers (cnt·10000 < threshold·total — no float
    * compare at the boundary); output keeps the collapse AUDITABLE:
    * per surviving category + OTHER, member-category count and row
    * coverage. */
  private[graft] def etlRareCollapse(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir).join(
      Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
      col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("cat"))
    val counts = base.groupBy(col("cat")).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("n"))
    counts.crossJoin(broadcast(tot))
      // keep categories with share >= 3% — exact integer cross-multiply
      .select(when(col("cnt") * 10000 >= lit(300L) * col("n"),
          col("cat").cast("string")).otherwise(lit("OTHER")).as("category"),
        col("cnt"), col("n"))
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n_source_cats"), sum(col("cnt")).as("n_rows"),
        max(col("n")).as("n"))
      .select(col("category"), col("n_source_cats"), col("n_rows"),
        round(col("n_rows").cast("double") / col("n").cast("double"), 6).as("share"))
      .orderBy(col("category"))
  }

  private[graft] lazy val etlRareCollapseSql =
    """WITH base AS (SELECT c_nationkey AS cat
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |c AS (SELECT cat, COUNT(*) AS cnt FROM base GROUP BY cat),
      |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c),
      |m AS (SELECT CASE WHEN cnt * 10000 >= 300 * n THEN CAST(cat AS VARCHAR)
      |                  ELSE 'OTHER' END AS category, cnt, n
      |      FROM c CROSS JOIN t)
      |SELECT category, COUNT(*) AS n_source_cats,
      |  CAST(SUM(cnt) AS BIGINT) AS n_rows,
      |  ROUND(CAST(SUM(cnt) AS DOUBLE) / CAST(MAX(n) AS DOUBLE), 6) AS share
      |FROM m GROUP BY category ORDER BY category""".stripMargin

  /** Composite data-quality scorecard over the customer dimension: four
    * production rules (negative balance, out-of-domain segment, blank
    * name, orphaned — no orders) each contribute exact violation counts
    * and an IEEE pass rate, plus a TOTAL row with the equal-weight
    * composite. The orphan rule rides ONE left anti-ish aggregate
    * (orders key set joined once); everything else is row-local. The
    * one-stop health number etl_validate's per-rule table feeds. */
  private[graft] def etlDqScore(s: SparkSession, dir: String): DataFrame = {
    val hasOrders = Tables.orders(s, dir).select(col("o_custkey")).distinct()
    val base = Tables.customer(s, dir)
      .join(hasOrders, col("c_custkey") === col("o_custkey"), "left")
    val agg = base.agg(
      count(lit(1)).as("n"),
      sum((col("c_acctbal") < 0).cast("long")).as("neg_bal"),
      sum((!col("c_mktsegment").isin(
        "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")).cast("long")).as("bad_seg"),
      sum((length(col("c_name")) === 0).cast("long")).as("blank_name"),
      sum(col("o_custkey").isNull.cast("long")).as("orphans"))
    val rules = Seq(("neg_balance", "neg_bal"), ("bad_segment", "bad_seg"),
      ("blank_name", "blank_name"), ("no_orders", "orphans"))
    val perRule = rules.map { case (label, c) =>
      agg.select(lit(label).as("rule"), col(c).as("n_violations"),
        (lit(1.0) - col(c).cast("double") / col("n").cast("double")).as("pass_rate"))
    }.reduce(_.unionAll(_))
    val total = agg.select(lit("TOTAL").as("rule"),
      (col("neg_bal") + col("bad_seg") + col("blank_name") + col("orphans")).as("n_violations"),
      (lit(1.0) - (col("neg_bal") + col("bad_seg") + col("blank_name") + col("orphans"))
        .cast("double") / (col("n") * 4).cast("double")).as("pass_rate"))
    perRule.unionAll(total).orderBy(col("rule"))
  }

  private[graft] lazy val etlDqScoreSql =
    """WITH b AS (SELECT c_acctbal, c_mktsegment, c_name, o_custkey
      |  FROM customer LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
      |    ON c_custkey = o_custkey),
      |a AS (SELECT COUNT(*) AS n,
      |  CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_bal,
      |  CAST(SUM(CASE WHEN c_mktsegment NOT IN
      |    ('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS bad_seg,
      |  CAST(SUM(CASE WHEN length(c_name) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS blank_name,
      |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orphans
      |  FROM b)
      |SELECT rule, n_violations, pass_rate FROM (
      |  SELECT 'neg_balance' AS rule, neg_bal AS n_violations,
      |    1.0 - CAST(neg_bal AS DOUBLE) / CAST(n AS DOUBLE) AS pass_rate FROM a
      |  UNION ALL SELECT 'bad_segment', bad_seg,
      |    1.0 - CAST(bad_seg AS DOUBLE) / CAST(n AS DOUBLE) FROM a
      |  UNION ALL SELECT 'blank_name', blank_name,
      |    1.0 - CAST(blank_name AS DOUBLE) / CAST(n AS DOUBLE) FROM a
      |  UNION ALL SELECT 'no_orders', orphans,
      |    1.0 - CAST(orphans AS DOUBLE) / CAST(n AS DOUBLE) FROM a
      |  UNION ALL SELECT 'TOTAL', neg_bal + bad_seg + blank_name + orphans,
      |    1.0 - CAST(neg_bal + bad_seg + blank_name + orphans AS DOUBLE)
      |      / CAST(n * 4 AS DOUBLE) FROM a) t
      |ORDER BY rule""".stripMargin

  /** Schema inference over a stringified extract — the typed-ingest
    * front door for schema-less CSV/JSON feeds: each candidate column's
    * string values are classified by PORTABLE string algebra (translate
    * digit-strip, split on '.', ISO-date shape checks — never regex,
    * java.util.regex vs RE2 is not replay-safe), and the inferred type
    * is the tightest class that covers every row. One row-local pass +
    * a 4-row aggregate. */
  private[graft] def etlTypeInfer(s: SparkSession, dir: String): DataFrame = {
    // price string built from EXACT cents (decimal cast then integer
    // split), not a float formatter — printf/format_number round-mode
    // differences across engines are not replay-safe
    val o = Tables.orders(s, dir)
      .withColumn("cents", (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint"))
      .select(
        col("o_orderkey").cast("string").as("c_key"),
        concat(expr("cents div 100").cast("string"), lit("."),
          lpad(pmod(col("cents"), lit(100)).cast("string"), 2, "0")).as("c_price"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("c_date"),
        col("o_orderpriority").as("c_text"))
    def digitsOnly(c: Column) = length(translate(c, "0123456789", "")) === 0 && length(c) > 0
    def numericShape(c: Column) = {
      // try_element_at: the ANSI-safe array probe (plain element_at
      // throws on out-of-bounds under Spark 4's default ANSI mode)
      val parts = split(c, "\\.")
      digitsOnly(c) || (size(parts) === 2 &&
        coalesce(digitsOnly(try_element_at(parts, lit(1))), lit(false)) &&
        coalesce(digitsOnly(try_element_at(parts, lit(2))), lit(false)))
    }
    def dateShape(c: Column) =
      length(c) === 10 && substring(c, 5, 1) === "-" && substring(c, 8, 1) === "-" &&
        digitsOnly(substring(c, 1, 4)) && digitsOnly(substring(c, 6, 2)) &&
        digitsOnly(substring(c, 9, 2))
    val cols = Seq("c_key", "c_price", "c_date", "c_text")
    cols.map { name =>
      o.agg(count(lit(1)).as("n"),
          sum(digitsOnly(col(name)).cast("long")).as("n_int"),
          sum(numericShape(col(name)).cast("long")).as("n_numeric"),
          sum(dateShape(col(name)).cast("long")).as("n_date"))
        .select(lit(name).as("col_name"), col("n"), col("n_int"), col("n_numeric"),
          col("n_date"),
          when(col("n_int") === col("n"), "bigint")
            .when(col("n_numeric") === col("n"), "double")
            .when(col("n_date") === col("n"), "date")
            .otherwise("string").as("inferred"))
    }.reduce(_.unionAll(_)).orderBy(col("col_name"))
  }

  private[graft] lazy val etlTypeInferSql = {
    def digits(c: String) =
      s"(length(translate($c, '0123456789', '')) = 0 AND length($c) > 0)"
    def numeric(c: String) =
      s"(${digits(c)} OR (len(string_split($c, '.')) = 2" +
        s" AND ${digits(s"string_split($c, '.')[1]")}" +
        s" AND ${digits(s"string_split($c, '.')[2]")}))"
    def dateShape(c: String) =
      s"(length($c) = 10 AND substr($c, 5, 1) = '-' AND substr($c, 8, 1) = '-'" +
        s" AND ${digits(s"substr($c, 1, 4)")} AND ${digits(s"substr($c, 6, 2)")}" +
        s" AND ${digits(s"substr($c, 9, 2)")})"
    def one(name: String, expr: String) =
      s"""SELECT '$name' AS col_name, COUNT(*) AS n,
         |  CAST(SUM(CASE WHEN ${digits("v")} THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
         |  CAST(SUM(CASE WHEN ${numeric("v")} THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric,
         |  CAST(SUM(CASE WHEN ${dateShape("v")} THEN 1 ELSE 0 END) AS BIGINT) AS n_date,
         |  CASE WHEN SUM(CASE WHEN ${digits("v")} THEN 1 ELSE 0 END) = COUNT(*) THEN 'bigint'
         |       WHEN SUM(CASE WHEN ${numeric("v")} THEN 1 ELSE 0 END) = COUNT(*) THEN 'double'
         |       WHEN SUM(CASE WHEN ${dateShape("v")} THEN 1 ELSE 0 END) = COUNT(*) THEN 'date'
         |       ELSE 'string' END AS inferred
         |FROM (SELECT $expr AS v FROM orders)""".stripMargin
    val cents = "CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT)"
    Seq(
      one("c_key", "CAST(o_orderkey AS VARCHAR)"),
      one("c_price", s"CAST($cents // 100 AS VARCHAR) || '.' || lpad(CAST($cents % 100 AS VARCHAR), 2, '0')"),
      one("c_date", "strftime(o_orderdate, '%Y-%m-%d')"),
      one("c_text", "o_orderpriority")
    ).mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) u ORDER BY col_name")
  }

  /** Null-pattern (missingness-combination) mining: three measure
    * columns get DETERMINISTIC planted nulls (md5-nibble gates at
    * different rates), and the query surfaces every observed
    * null-combination bitmask with counts — the MCAR/MNAR structure
    * audit run before choosing an imputation strategy (correlated
    * missingness invalidates per-column medians). One row-local
    * projection + one tiny groupBy. */
  private[graft] def etlNullPatterns(s: SparkSession, dir: String): DataFrame = {
    def gate(tag: String, lim: Int) =
      expr(s"(instr('0123456789abcdef', substr(md5(concat('$tag:', CAST(o_orderkey AS STRING))), 1, 1)) - 1) < $lim")
    Tables.orders(s, dir)
      .withColumn("m_price", when(gate("np1", 2), lit(null)).otherwise(col("o_totalprice")))
      .withColumn("m_status", when(gate("np2", 3), lit(null)).otherwise(col("o_orderstatus")))
      .withColumn("m_prio", when(gate("np1", 2) || gate("np3", 1), lit(null))
        .otherwise(col("o_orderpriority")))
      .select(concat(
        when(col("m_price").isNull, "0").otherwise("1"),
        when(col("m_status").isNull, "0").otherwise("1"),
        when(col("m_prio").isNull, "0").otherwise("1")).as("pattern"))
      .groupBy(col("pattern")).agg(count(lit(1)).as("n"))
      .withColumn("share", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy()).cast("double"))
      .orderBy(col("pattern"))
  }

  private[graft] lazy val etlNullPatternsSql =
    """WITH g AS (SELECT
      |    (instr('0123456789abcdef', substr(md5('np1:' || CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1) < 2 AS g1,
      |    (instr('0123456789abcdef', substr(md5('np2:' || CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1) < 3 AS g2,
      |    (instr('0123456789abcdef', substr(md5('np3:' || CAST(o_orderkey AS VARCHAR)), 1, 1)) - 1) < 1 AS g3
      |  FROM orders),
      |p AS (SELECT (CASE WHEN g1 THEN '0' ELSE '1' END)
      |          || (CASE WHEN g2 THEN '0' ELSE '1' END)
      |          || (CASE WHEN g1 OR g3 THEN '0' ELSE '1' END) AS pattern
      |      FROM g)
      |SELECT pattern, COUNT(*) AS n,
      |  CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS share
      |FROM p GROUP BY pattern ORDER BY pattern""".stripMargin

  /** Multi-currency conversion through a broadcast rate table: each
    * nation gets a deterministic micro-unit rate (1 + nationkey/100,
    * held as the integer 100+nationkey), customer balances convert in
    * EXACT integer arithmetic — local = cents·(100+key) div 100 — and
    * the per-nation reconciliation carries both exact sums. The
    * standard finance-ETL shape: the fact table never shuffles, the
    * 25-row rate dimension broadcasts. */
  private[graft] def etlCurrencyConvert(s: SparkSession, dir: String): DataFrame = {
    val rates = Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name"),
        (lit(100) + col("n_nationkey")).as("rate_pct"))
    Tables.customer(s, dir)
      .withColumn("usd_c", (col("c_acctbal").cast("decimal(24,2)") * 100).cast("bigint"))
      .join(broadcast(rates), col("c_nationkey") === col("n_nationkey"))
      .withColumn("local_c", expr("(usd_c * rate_pct) div 100"))
      .groupBy(col("n_name"), col("rate_pct"))
      .agg(count(lit(1)).as("n_accounts"),
        sum(col("usd_c")).as("usd_cents"),
        sum(col("local_c")).as("local_cents"))
      .orderBy(col("n_name"))
  }

  private[graft] lazy val etlCurrencyConvertSql =
    """WITH r AS (SELECT n_nationkey, n_name, 100 + n_nationkey AS rate_pct FROM nation),
      |c AS (SELECT c_nationkey,
      |        CAST(CAST(c_acctbal AS DECIMAL(24,2)) * 100 AS BIGINT) AS usd_c
      |      FROM customer)
      |SELECT n_name, rate_pct, COUNT(*) AS n_accounts,
      |  CAST(SUM(usd_c) AS BIGINT) AS usd_cents,
      |  CAST(SUM((usd_c * rate_pct) // 100) AS BIGINT) AS local_cents
      |FROM c JOIN r ON c_nationkey = n_nationkey
      |GROUP BY n_name, rate_pct ORDER BY n_name""".stripMargin

  /** Timezone normalization of locally-stamped events: each user's feed
    * carries a deterministic zone offset (user_id%5 → {0, +60, +330,
    * +480, −300} minutes), local stamps are normalized back to UTC in
    * exact epoch-micro arithmetic (no zone database — the offset table
    * IS the contract, the replay-safe subset of tz handling), and the
    * audit reconciles per-zone counts and UTC bounds. Row-local
    * arithmetic + one tiny aggregate. */
  private[graft] def etlTzNormalize(s: SparkSession, dir: String): DataFrame = {
    val offMin = element_at(typedLit(Seq(0L, 60L, 330L, 480L, -300L)),
      (pmod(col("user_id"), lit(5)) + 1).cast("int"))
    Tables.events(s, dir)
      .withColumn("off_min", offMin)
      .withColumn("local_ts", timestamp_micros(unix_micros(col("ts")) + col("off_min") * 60000000L))
      .withColumn("utc_ts", timestamp_micros(unix_micros(col("local_ts")) - col("off_min") * 60000000L))
      .groupBy(col("off_min"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("utc_ts")).as("first_utc"),
        max(col("utc_ts")).as("last_utc"),
        sum((col("utc_ts") === col("ts")).cast("long")).as("n_roundtrip_exact"))
      .orderBy(col("off_min"))
  }

  private[graft] lazy val etlTzNormalizeSql =
    """WITH e AS (SELECT user_id, ts,
      |    CAST(([0, 60, 330, 480, -300])[CAST(user_id % 5 AS INT) + 1] AS BIGINT) AS off_min
      |  FROM events),
      |x AS (SELECT user_id, ts, off_min,
      |    make_timestamp(epoch_us(ts) + off_min * 60000000) AS local_ts
      |  FROM e),
      |u AS (SELECT user_id, ts, off_min,
      |    make_timestamp(epoch_us(local_ts) - off_min * 60000000) AS utc_ts
      |  FROM x)
      |SELECT off_min, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
      |  MIN(utc_ts) AS first_utc, MAX(utc_ts) AS last_utc,
      |  CAST(SUM(CASE WHEN utc_ts = ts THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_exact
      |FROM u GROUP BY off_min ORDER BY off_min""".stripMargin

  /** Late-arrival audit: within each user's feed, an event is LATE when
    * its event time precedes the running event-time maximum of earlier
    * arrivals (arrival order = event_id). Windows partition by user —
    * the per-key spine any streaming watermark policy is sized from —
    * and the per-type rollup reports late counts and the worst
    * lateness in exact micros. This is the batch measurement that
    * calibrates EventsStream's watermark horizon. */
  private[graft] def etlLatenessAudit(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("hwm_us", max(unix_micros(col("ts"))).over(w))
      .withColumn("late_us",
        when(col("hwm_us").isNotNull && col("hwm_us") > unix_micros(col("ts")),
          col("hwm_us") - unix_micros(col("ts"))).otherwise(lit(0L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("late_us") > 0).cast("long")).as("n_late"),
        max(col("late_us")).as("max_late_us"),
        sum(col("late_us")).as("sum_late_us"))
      .select(col("event_type"), col("n_events"), col("n_late"), col("max_late_us"),
        (col("n_late").cast("double") / col("n_events").cast("double")).as("late_rate"),
        col("sum_late_us"))
      .orderBy(col("event_type"))
  }

  private[graft] lazy val etlLatenessAuditSql =
    """WITH h AS (SELECT event_type, ts,
      |    MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm_us
      |  FROM events),
      |l AS (SELECT event_type,
      |    CASE WHEN hwm_us IS NOT NULL AND hwm_us > epoch_us(ts)
      |      THEN hwm_us - epoch_us(ts) ELSE 0 END AS late_us
      |  FROM h)
      |SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  CAST(MAX(late_us) AS BIGINT) AS max_late_us,
      |  CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS late_rate,
      |  CAST(SUM(late_us) AS BIGINT) AS sum_late_us
      |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Load-volume anomaly screen: monthly order counts vs the trailing
    * 6-month window (excluding self), flagged when the month deviates
    * by more than 30% — compared in EXACT integers (10·n·w vs 13·sum /
    * 7·sum cross-multiplication, no float boundary). The feed-health
    * monitor that catches a half-delivered extract before it poisons
    * downstream aggregates. */
  private[graft] def etlVolumeAnomaly(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"))
      .withColumn("mi", (year(col("m")) * 12 + month(col("m"))).cast("long"))
    val w = Window.orderBy(col("mi")).rangeBetween(-6, -1)
    monthly
      .withColumn("w_sum", sum(col("n")).over(w))
      .withColumn("w_n", count(lit(1)).over(w))
      .filter(col("w_n") === 6)
      .select(col("m").as("month"), col("n").as("n_orders"),
        (col("w_sum").cast("double") / col("w_n").cast("double")).as("trailing_avg"),
        (col("n") * col("w_n") * 10 > col("w_sum") * 13 ||
          col("n") * col("w_n") * 10 < col("w_sum") * 7).as("anomalous"))
      .orderBy(col("month"))
  }

  private[graft] lazy val etlVolumeAnomalySql =
    """WITH m AS (SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS n
      |  FROM orders GROUP BY 1),
      |mi AS (SELECT m, n, CAST(year(m) * 12 + month(m) AS BIGINT) AS mi FROM m),
      |w AS (SELECT m, n,
      |        SUM(n) OVER tw AS w_sum, COUNT(*) OVER tw AS w_n
      |      FROM mi
      |      WINDOW tw AS (ORDER BY mi RANGE BETWEEN 6 PRECEDING AND 1 PRECEDING))
      |SELECT m AS month, n AS n_orders,
      |  CAST(w_sum AS DOUBLE) / CAST(w_n AS DOUBLE) AS trailing_avg,
      |  (n * w_n * 10 > w_sum * 13 OR n * w_n * 10 < w_sum * 7) AS anomalous
      |FROM w WHERE w_n = 6 ORDER BY month""".stripMargin

  /** Near-duplicate fact screen: order pairs from the SAME customer
    * with the SAME exact total within 3 days — the double-billing /
    * double-ingest audit. A deterministic ~6% of orders is INJECTED as
    * a day-shifted clone (md5-gated, new surrogate key ok+10⁹), so the
    * screen must recover exactly the planted duplicates from the
    * combined feed — the raw synthetic totals are near-unique, which
    * would otherwise make this a hollow always-empty check. The
    * self-join keys on (custkey, cents): only true candidates pair,
    * the day window filters after. */
  private[graft] def etlNearDuplicateFacts(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir).select(col("o_custkey").as("ck"),
      col("o_orderkey").as("ok"),
      (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("v"),
      col("o_orderdate").as("dt"))
    val gate = expr("(instr('0123456789abcdef', substr(md5(concat('dup:', CAST(ok AS STRING))), 1, 1)) - 1) < 1")
    val clones = base.filter(gate)
      .select(col("ck"), (col("ok") + lit(1000000000L)).as("ok"), col("v"),
        (col("dt") + expr("INTERVAL 1 DAYS")).as("dt"))
    val o = base.unionByName(clones)
    val o2 = o.select(col("ck"), col("ok").as("ok2"), col("v"), col("dt").as("dt2"))
    o.join(o2, Seq("ck", "v"))
      .filter(col("ok") < col("ok2") &&
        abs(datediff(col("dt").cast("date"), col("dt2").cast("date"))) <= 3)
      .select(col("ck").as("custkey"), col("ok").as("order_a"), col("ok2").as("order_b"),
        (col("v") / 100.0).as("amount"),
        datediff(col("dt2").cast("date"), col("dt").cast("date")).as("day_gap"))
      .orderBy(col("custkey"), col("order_a"), col("order_b"))
  }

  private[graft] lazy val etlNearDuplicateFactsSql =
    """WITH b AS (SELECT o_custkey AS ck, o_orderkey AS ok,
      |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS v,
      |    o_orderdate AS dt
      |  FROM orders),
      |o AS (SELECT * FROM b
      |      UNION ALL
      |      SELECT ck, ok + 1000000000 AS ok, v, dt + INTERVAL 1 DAY AS dt
      |      FROM b
      |      WHERE (instr('0123456789abcdef', substr(md5('dup:' || CAST(ok AS VARCHAR)), 1, 1)) - 1) < 1)
      |SELECT a.ck AS custkey, a.ok AS order_a, b2.ok AS order_b,
      |  a.v / 100.0 AS amount,
      |  date_diff('day', CAST(a.dt AS DATE), CAST(b2.dt AS DATE)) AS day_gap
      |FROM o a JOIN o b2 ON a.ck = b2.ck AND a.v = b2.v AND a.ok < b2.ok
      |WHERE ABS(date_diff('day', CAST(a.dt AS DATE), CAST(b2.dt AS DATE))) <= 3
      |ORDER BY custkey, order_a, order_b""".stripMargin

  /** String-width audit against declared column contracts: per string
    * column of orders, the exact length envelope (min/max/avg) and the
    * count breaching its declared width — the pre-DDL check before a
    * VARCHAR(n) landing (a silent truncation at load is the classic
    * lossy-migration bug). One row-local pass, three tiny aggregates. */
  private[graft] def etlWidthAudit(s: SparkSession, dir: String): DataFrame = {
    val widths = Seq(("o_orderstatus", 1), ("o_orderpriority", 15))
    val o = Tables.orders(s, dir)
    widths.map { case (c, w) =>
      o.agg(count(lit(1)).as("n"),
          min(length(col(c))).as("min_len"),
          max(length(col(c))).as("max_len"),
          sum(length(col(c)).cast("long")).as("sum_len"),
          sum((length(col(c)) > w).cast("long")).as("n_over"))
        .select(lit(c).as("col_name"), lit(w).as("declared_width"),
          col("n"), col("min_len"), col("max_len"),
          (col("sum_len").cast("double") / col("n").cast("double")).as("avg_len"),
          col("n_over"))
    }.reduce(_.unionAll(_)).orderBy(col("col_name"))
  }

  private[graft] lazy val etlWidthAuditSql = {
    def one(c: String, w: Int) =
      s"""SELECT '$c' AS col_name, $w AS declared_width, COUNT(*) AS n,
         |  CAST(MIN(length($c)) AS INT) AS min_len,
         |  CAST(MAX(length($c)) AS INT) AS max_len,
         |  CAST(SUM(length($c)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_len,
         |  CAST(SUM(CASE WHEN length($c) > $w THEN 1 ELSE 0 END) AS BIGINT) AS n_over
         |FROM orders""".stripMargin
    s"""SELECT * FROM (
       |${one("o_orderstatus", 1)}
       |UNION ALL
       |${one("o_orderpriority", 15)}
       |) u ORDER BY col_name""".stripMargin
  }

  /** Bitemporal order ledger + as-of transaction-time query — the
    * correction-aware view [[etlScd2]] (valid time only) cannot give:
    * each order lands version 1 at its order date; orders with
    * returned lineitems (l_returnflag = 'R') land version 2 at the
    * last returned item's ship date, restating the amount net of
    * returns. The as-of query reads the ledger AS THE SYSTEM KNEW IT
    * at T₀ = 1997-01-01: the latest version with tx_from ≤ T₀ per
    * order (orders not yet booked at T₀ drop out), rolled up monthly —
    * exact-cent BIGINT amounts, correction counts, restatement delta.
    * One orders pass + one returned-lineitem aggregate, keyed join,
    * calendar-bounded output. */
  private[graft] def etlBitemporal(s: SparkSession, dir: String): DataFrame = {
    val t0 = lit("1997-01-01").cast("timestamp")
    val ret = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("tx2"),
        (sum(col("l_extendedprice").cast("decimal(24,8)")).cast("decimal(24,2)") * 100)
          .cast("bigint").as("ret_c"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderdate"),
        (col("o_totalprice").cast("decimal(24,2)") * 100).cast("bigint").as("amt_c"))
      .join(ret, col("o_orderkey") === col("l_orderkey"), "left")
      .filter(col("o_orderdate") <= t0)
    val picked = o.select(
      date_trunc("month", col("o_orderdate")).as("month"),
      when(col("tx2").isNotNull && col("tx2") <= t0, lit(1L)).otherwise(lit(0L))
        .as("corrected"),
      when(col("tx2").isNotNull && col("tx2") <= t0, col("amt_c") - col("ret_c"))
        .otherwise(col("amt_c")).as("asof_c"),
      col("amt_c"))
    picked.groupBy(col("month"))
      .agg(count(lit(1)).as("n_orders"), sum(col("corrected")).as("n_corrected"),
        (sum(col("asof_c")).cast("double") / 100.0).as("asof_amount"),
        ((sum(col("amt_c")) - sum(col("asof_c"))).cast("double") / 100.0)
          .as("restated_down"))
      .orderBy(col("month"))
  }

  private[graft] lazy val etlBitemporalSql =
    """WITH ret AS (SELECT l_orderkey, MAX(l_shipdate) AS tx2,
      |    CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(24,8))), 2) * 100 AS BIGINT) AS ret_c
      |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
      |o AS (SELECT o_orderkey, o_orderdate,
      |    CAST(CAST(o_totalprice AS DECIMAL(24,2)) * 100 AS BIGINT) AS amt_c,
      |    tx2, ret_c
      |  FROM orders LEFT JOIN ret ON o_orderkey = l_orderkey
      |  WHERE o_orderdate <= TIMESTAMP '1997-01-01'),
      |picked AS (SELECT date_trunc('month', o_orderdate) AS month,
      |    CASE WHEN tx2 IS NOT NULL AND tx2 <= TIMESTAMP '1997-01-01'
      |         THEN 1 ELSE 0 END AS corrected,
      |    CASE WHEN tx2 IS NOT NULL AND tx2 <= TIMESTAMP '1997-01-01'
      |         THEN amt_c - ret_c ELSE amt_c END AS asof_c,
      |    amt_c
      |  FROM o)
      |SELECT month, COUNT(*) AS n_orders,
      |  CAST(SUM(corrected) AS BIGINT) AS n_corrected,
      |  CAST(SUM(asof_c) AS DOUBLE) / 100.0 AS asof_amount,
      |  CAST(SUM(amt_c) - SUM(asof_c) AS DOUBLE) / 100.0 AS restated_down
      |FROM picked GROUP BY month ORDER BY month""".stripMargin
}

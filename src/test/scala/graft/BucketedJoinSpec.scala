package graft

import org.apache.spark.sql.functions._

/** The bucket-co-located join must consume the bucketed layout: a
  * SortMergeJoin with ZERO exchange and ZERO per-side sort (both sides
  * bucketed AND sorted on the key at write time). The value digest is
  * the DuckDB oracle's job (q_bucketed_join); this spec pins the PLAN —
  * at 100 TB the whole point is that neither fact table shuffles.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-sorted tables join with no exchange and no sort") {
    import graft.etl.Load.BucketedTableSink
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // one-file-per-bucket sorted scans may declare their sort order
    // (post-3.0 this is behind a legacy flag; scoped here, not global)
    scoped.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    val sfx = java.util.UUID.randomUUID().toString.take(8)
    val tA = s"spec_bkt_a_$sfx"; val tB = s"spec_bkt_b_$sfx"
    try {
      BucketedTableSink(tA, "o_custkey", 8, sortCol = Some("o_custkey"), oneFilePerBucket = true)
        .write(Tables.orders(scoped, sfDir).select("o_custkey", "o_totalprice"))
      BucketedTableSink(tB, "c_custkey", 8, sortCol = Some("c_custkey"), oneFilePerBucket = true)
        .write(Tables.customer(scoped, sfDir).select("c_custkey", "c_mktsegment"))
      val joined = scoped.table(tA)
        .join(scoped.table(tB), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n${plan.take(600)}")
      assert(!plan.contains("Sort "), s"bucket-sorted scan must not re-sort:\n${plan.take(600)}")
      // and it still produces the right rows
      val n = joined.count()
      assert(n == Tables.orders(scoped, sfDir).count())
    } finally {
      scoped.sql(s"DROP TABLE IF EXISTS $tA")
      scoped.sql(s"DROP TABLE IF EXISTS $tB")
    }
  }

  test("an_autocorr: a strongly weekly series shows high lag-7 correlation") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("autocorr_toy").toString
    // revenue alternates by weekday with a clean period of 7 → lag-7
    // autocorr ≈ 1, lag-1 clearly lower
    def day(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDate.of(1995, 1, 1).plusDays(i).atStartOfDay())
    (0 until 140).map(i => (day(i), 100.0 + 50.0 * (i % 7), 0.0))
      .toDF("l_shipdate", "l_extendedprice", "l_discount")
      .write.parquet(s"$tmp/lineitem.parquet")
    val r = SparkEntry.queries("an_autocorr")(spark, tmp)
      .collect().map(x => x.getAs[String]("lag") -> x.getAs[Double]("autocorr")).toMap
    assert(r("l7") > 0.99, s"l7=${r("l7")}")
    assert(r("l1") < 0.5, s"l1=${r("l1")}")
  }

  test("etl_surrogate_keys: deterministic, collision-free, partitioning-invariant") {
    val a = SparkEntry.queries("etl_surrogate_keys")(spark, sfDir).head()
    assert(a.getAs[Long]("n") == a.getAs[Long]("n_distinct"))
    // recompute over a different partitioning: identical digest (the
    // monotonically_increasing_id failure mode this op exists to avoid)
    val re = Tables.orders(spark, sfDir).repartition(13)
      .select(md5(concat_ws("|", lit("ord"), col("o_orderkey"))).as("sk"))
      .agg(min(col("sk")).as("mn"), max(col("sk")).as("mx")).head()
    assert(re.getString(0) == a.getAs[String]("sk_min"))
    assert(re.getString(1) == a.getAs[String]("sk_max"))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.etl._

class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("bucketize uses (lo, hi] bins like pd.cut") {
    val df = Seq(-1.0, 0.0, 0.5, 2500.0, 2500.1, 9999.0).toDF("x")
      .withColumn("b", Features.bucketize(col("x"),
        Seq(-1000.0, 0.0, 2500.0, 5000.0, Double.PositiveInfinity),
        Seq("neg", "low", "mid", "high")))
    val got = df.select("b").as[String].collect().toSeq
    assert(got == Seq("neg", "neg", "low", "low", "mid", "high"))
  }

  test("segment3 boundaries: < lo Low, <= hi Medium, else High") {
    val df = Seq(29.9, 30.0, 70.0, 70.1).toDF("x")
      .withColumn("s", Features.segment3(col("x"), 30, 70))
    assert(df.select("s").as[String].collect().toSeq ==
      Seq("Low", "Medium", "Medium", "High"))
  }

  test("codeMap normalizes and falls back to -1") {
    val df = Seq("Month-to-Month", " ONE YEAR ", "two year", "weird").toDF("c")
      .withColumn("code", Features.codeMap(col("c"),
        Map("month-to-month" -> 0, "one year" -> 1, "two year" -> 2)))
    assert(df.select("code").as[Int].collect().toSeq == Seq(0, 1, 2, -1))
  }

  test("snakeCase matches the reference's load normalization") {
    assert(Features.snakeCase("SeniorCitizen") == "senior_citizen")
    assert(Features.snakeCase("MonthlyCharges") == "monthly_charges")
    assert(Features.snakeCase("tenure_group") == "tenure_group")
    assert(Features.snakeCase("has internet!service") == "has_internet_service")
  }

  test("imputeMedian fills nulls with the exact interpolated median") {
    val df = Seq[Option[Double]](Some(1), Some(2), Some(4), Some(8), None).toDF("x")
    val got = Clean.imputeMedian(df, Seq("x")).agg(sum($"x")).as[Double].head()
    assert(got == 1 + 2 + 4 + 8 + 3.0) // median of {1,2,4,8} = 3.0
  }

  test("coerceNumeric turns junk into NULL") {
    val df = Seq("1.5", "n/a", "2").toDF("x")
    val got = Clean.coerceNumeric(df, Seq("x")).select("x").as[Option[Double]].collect()
    assert(got.toSeq == Seq(Some(1.5), None, Some(2.0)))
  }

  test("Validate.run evaluates all rules in one pass") {
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "cat")
    val rules = Seq(Validate.noNulls("id"), Validate.minRows(2),
      Validate.domainSubset("cat", Seq("a", "b")),
      Validate.domainComplete("cat", Seq("a", "b")))
    val rep = Validate.run(df, rules)
    assert(rep.count() == 4)
    assert(rep.filter(!col("passed")).count() == 0)
    assert(Validate.allPassed(df, rules))
    assert(!Validate.allPassed(df, rules :+ Validate.minRows(100)))
  }

  test("Pipeline gates load on validation and writes through the sink") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val df = Seq((1, 10.0), (2, 20.0)).toDF("id", "v")
    val p = Pipeline()
      .transform(_.withColumn("v2", $"v" * 2))
      .validate(Validate.noNulls("v2"), Validate.minRows(1))
    p.run(df, Load.ParquetSink(s"$tmp/out"))
    assert(spark.read.parquet(s"$tmp/out").count() == 2)

    val bad = Pipeline().validate(Validate.minRows(100))
    intercept[IllegalStateException] { bad.run(df, Load.ParquetSink(s"$tmp/out2")) }
    assert(!new java.io.File(s"$tmp/out2").exists())
  }

  test("FallbackSink falls through to the next sink") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fb").toString
    val df = Seq(1, 2, 3).toDF("id")
    val failing = new Load.Sink { def write(d: org.apache.spark.sql.DataFrame): Unit =
      throw new RuntimeException("remote down") }
    Load.FallbackSink(Seq(failing, Load.ParquetSink(s"$tmp/local")), retriesPerSink = 1).write(df)
    assert(spark.read.parquet(s"$tmp/local").count() == 3)
  }

  test("analytics operators survive empty inputs") {
    import org.apache.spark.sql.functions._
    val empty = Tables.orders(spark, sfDir).filter(lit(false))
    val ss = graft.analytics.Summary.summaryStats(empty, col("o_orderstatus") === "F")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ss == Map("total_rows" -> 0.0, "unique_rows" -> 0.0, "flag_percentage" -> 0.0))
    assert(graft.analytics.Summary.valueCountsPct(empty, "o_orderstatus").count() == 0)
    assert(graft.analytics.Summary.histogram(empty, "o_totalprice", 0, 100, 4).count() == 0)
    assert(graft.analytics.Outliers.zScoreReport(empty, "o_orderpriority",
      "o_totalprice", 2.0).count() == 0)
    assert(graft.operators.Sampling.stratified(empty,
      col("o_orderpriority"), col("o_orderkey"), 5).count() == 0)
    assert(graft.text.Packing.packBins(
      empty.select(col("o_orderkey").as("doc_id"), lit(1L).as("n_tokens")),
      "doc_id", "n_tokens", 100L, 4).count() == 0)
  }

  test("orc sink/source roundtrips the orders slice") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val ord = Tables.orders(spark, sfDir).limit(100)
    Load.OrcSink(s"$tmp/orders").write(ord)
    val back = Extract.orc(spark, s"$tmp/orders")
    assert(back.count() == 100)
    assert(back.schema == ord.schema)
  }

  test("date-partitioned parquet sink prunes partitions on filtered read-back") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Tables.events(spark, sfDir).withColumn("day", to_date(col("ts")))
    Load.ParquetSink(s"$tmp/events", partitionBy = Seq("day")).write(ev)
    val day = ev.select(min(col("day"))).collect()(0).getDate(0)
    val read = spark.read.parquet(s"$tmp/events").filter(col("day") === lit(day))
    assert(read.count() == ev.filter(col("day") === lit(day)).count())
    val p = read.queryExecution.executedPlan.toString()
    // partition value filters must land in PartitionFilters (pruned at
    // listing time), not in PushedFilters/post-scan Filter
    assert(p.contains("PartitionFilters: [isnotnull(day"), p)
  }

  test("JdbcSink round-trips through an embedded Derby database") {
    import org.apache.spark.sql.SaveMode
    // Embedded in-memory Derby (ships with Spark) stands in for the
    // reference's hosted Postgres: write → readBack → reconcile is
    // load.py:95–210's insert + count-check, networkless.
    val url = "jdbc:derby:memory:graftdb;create=true"
    val df = Seq((1L, "a", 10.5), (2L, "b", 20.5), (3L, "c", 30.5))
      .toDF("id", "CustomerName", "MonthlyCharges")
    val sink = Load.JdbcSink(url, "churn_load", numPartitions = 2,
      mode = SaveMode.Overwrite)
    sink.write(df)
    val back = sink.readBack(spark).get
    assert(back.count() == 3)
    // identifiers snake_cased on the way out, like the reference's
    // unquoted-Postgres load normalization
    assert(back.columns.map(_.toLowerCase).toSet ==
      Set("id", "customer_name", "monthly_charges"))
    assert(back.select(sum($"monthly_charges")).as[Double].head() == 61.5)
    Load.reconcile(df, sink) // counts agree → no throw
    // sabotage the sink behind Spark's back: reconcile must now flag
    // the short load, exactly like validate.py's count check
    val conn = java.sql.DriverManager.getConnection(url)
    // Spark passes the table name through unquoted (Derby folds it to
    // CHURN_LOAD) but quotes column identifiers case-exactly
    try conn.createStatement().executeUpdate(
      "DELETE FROM churn_load WHERE \"id\" = 3")
    finally conn.close()
    intercept[IllegalStateException] { Load.reconcile(df, sink) }
  }

  test("compactParquet rewrites fragments into sized files and keeps every row") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val dir = s"$tmp/frag"
    // 200 partitions of a 5000-row frame -> 200 tiny files
    spark.range(5000).selectExpr("id", "id % 7 AS g")
      .repartition(200).write.parquet(dir)
    val before = new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(before > 100, s"fixture should be fragmented, saw $before files")
    val (reported, after) = graft.etl.Load.compactParquet(spark, dir, targetBytes = 1L << 20)
    assert(reported == before)
    assert(after < 10, s"compaction should collapse the file count, got $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == 5000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head().getLong(0)
      == 5000L * 4999 / 2, "content must survive the swap")
    assert(!new java.io.File(s"${dir}_rewrite_tmp").exists, "temp dir must be cleaned")
    assert(!new java.io.File(s"${dir}_rewrite_old").exists, "backup dir must be cleaned")
  }

  test("parquetEvolved merges schema generations, old files read NULL for new cols") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    spark.range(3).selectExpr("id", "id * 2 AS a")
      .write.parquet(s"$tmp/gen1")
    spark.range(3, 6).selectExpr("id", "id * 2 AS a", "'x' AS b")
      .write.parquet(s"$tmp/gen2")
    val merged = graft.etl.Extract.parquetEvolved(spark, s"$tmp/gen1", s"$tmp/gen2")
    assert(merged.columns.toSet == Set("id", "a", "b"))
    assert(merged.count() == 6)
    assert(merged.filter("b IS NULL").count() == 3, "gen1 rows must read NULL b")
    assert(merged.filter("b = 'x'").count() == 3)
  }

  test("upsertParquet merges by key: update wins, unmatched rows survive") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val dir = s"$tmp/tbl"
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("k", "name", "v")
      .write.parquet(dir)
    val updates = Seq((2L, "b2", 99), (4L, "d", 40)).toDF("k", "name", "v")
    graft.etl.Load.upsertParquet(spark, dir, updates, Seq("k"))
    val got = spark.read.parquet(dir).as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a", 10), (2L, "b2", 99), (3L, "c", 30), (4L, "d", 40)))
    assert(!new java.io.File(s"${dir}_rewrite_tmp").exists)
    assert(!new java.io.File(s"${dir}_rewrite_old").exists)
  }

  test("writeObserved reports load metrics from the write pass itself") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_observe").toString
    val df = Seq((1L, Some(10)), (2L, None), (3L, Some(30))).toDF("k", "v")
    val got = graft.etl.Load.writeObserved(df,
      graft.etl.Load.ParquetSink(s"$tmp/out"),
      Map("rows" -> count(lit(1)), "null_v" -> count(when(col("v").isNull, 1)),
          "sum_v" -> sum(col("v"))))
    assert(got("rows") == 3L, s"got $got")
    assert(got("null_v") == 1L)
    assert(got("sum_v") == 40L)
    assert(spark.read.parquet(s"$tmp/out").count() == 3, "write must still land")
  }

  test("upsertPartitioned rewrites only touched partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_pupsert").toString
    val dir = s"$tmp/tbl"
    Seq((1L, "d1", 10), (2L, "d1", 20), (3L, "d2", 30), (4L, "d3", 40))
      .toDF("k", "dt", "v")
      .write.partitionBy("dt").parquet(dir)
    def files(p: String) = new java.io.File(p).listFiles
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    val d2Before = files(s"$dir/dt=d2")
    val d3Before = files(s"$dir/dt=d3")
    val updates = Seq((2L, "d1", 99), (5L, "d1", 50)).toDF("k", "dt", "v")
    graft.etl.Load.upsertPartitioned(spark, dir, updates, Seq("k"), "dt")
    val got = spark.read.parquet(dir).select("k", "dt", "v")
      .as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "d1", 10), (2L, "d1", 99), (5L, "d1", 50),
      (3L, "d2", 30), (4L, "d3", 40)))
    assert(files(s"$dir/dt=d2") == d2Before, "untouched partition files must not move")
    assert(files(s"$dir/dt=d3") == d3Before, "untouched partition files must not move")
    assert(!new java.io.File(s"${dir}_rewrite_tmp").exists)
  }

  test("compactPartitioned rewrites only fragmented partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_pcompact").toString
    val dir = s"$tmp/tbl"
    // d1: fragmented into ~20 files; d2: a single tidy file
    spark.range(2000).selectExpr("id", "'d1' AS dt").repartition(20)
      .write.partitionBy("dt").parquet(dir)
    spark.range(2000, 2100).selectExpr("id", "'d2' AS dt").coalesce(1)
      .write.mode("append").partitionBy("dt").parquet(dir)
    def files(p: String) = new java.io.File(p).listFiles
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified)).toSet
    val d2Before = files(s"$dir/dt=d2")
    val report = graft.etl.Load.compactPartitioned(spark, dir, targetBytes = 1L << 20)
    assert(report.keySet == Set("dt=d1"), s"only d1 should compact, got $report")
    assert(report("dt=d1")._1 == 20 && report("dt=d1")._2 < 5)
    assert(files(s"$dir/dt=d2") == d2Before, "tidy partition must be untouched")
    assert(spark.read.parquet(dir).count() == 2100)
  }
}

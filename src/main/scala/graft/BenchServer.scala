package graft

import org.apache.spark.sql.SparkSession

/** Resident bench worker for the PAIRED pinned-jar A/B protocol
  * (r17 verdict #1): the round-over-round bench delta has been
  * bracketed as host co-tenancy three rounds running, but never
  * MEASURED causally — two builds benched hours apart see different
  * hosts. This main keeps one build's Spark session alive and runs
  * single queries on demand over stdin, so a controller can hold TWO
  * resident JVMs (the pinned r17 jar and the current build) and
  * alternate per-query attempt blocks A/B/A/B within one session on
  * one host — co-tenancy drift hits both sides of every pair.
  *
  * Protocol (line-oriented, stdout flushed per reply):
  *   RUN <name> <attempts> warm|nowarm  → runs the query (one
  *     discarded warm attempt when `warm`, then <attempts> recorded,
  *     Bench.isolate-equivalent hygiene between attempts) and prints
  *     `RESULT <name> [t1,t2,...] [gc1,gc2,...] [ok1,ok2,...]`
  *     (seconds, ms, 1/0 success per attempt — a failed attempt's
  *     elapsed time must not pass as a normal timing).
  *   EXIT → stops the session and the JVM.
  *
  * The file is self-contained on the r16/r17 SparkEntry surface
  * (queries map + Engine.session + cache releases) so the SAME source
  * compiles unmodified inside the pinned-commit worktree. */
object BenchServer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session(s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")
    // the same session warmup Bench runs, so neither side's first
    // query is charged one-time machinery cost the other already paid
    spark.range(1000000).selectExpr("sum(id)").collect()
    val warm = spark.read.parquet(s"$sfDir/region.parquet")
    warm.join(warm.groupBy("r_regionkey").count(), "r_regionkey")
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("r_regionkey")
          .orderBy("count")))
      .collect()
    warm.selectExpr("percentile(r_regionkey, 0.5)", "count(distinct r_regionkey)",
      "approx_count_distinct(r_regionkey)").collect()
    warm.selectExpr("explode(sequence(1, 3)) AS x").groupBy("x").count().collect()
    warm.join(org.apache.spark.sql.functions.broadcast(
      warm.select("r_regionkey")), "r_regionkey").collect()
    Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    locally {
      val es = spark.newSession()
      es.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      es.read.parquet(s"$sfDir/events.parquet").count()
    }
    def isolate(): Unit = {
      graft.dedup.Dedup.releaseCaches()
      graft.operators.PrefixSum.releaseCaches()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def gcMillis: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // per-attempt success is part of the protocol (r18 advice #1): a
    // query that errors in one of the two paired jars must not silently
    // record a (typically fast) elapsed time as a normal attempt — the
    // RESULT line carries an ok-flag per attempt so the controller can
    // exclude or flag failed attempts instead of skewing the A/B medians
    def attempt(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Long, Int) = {
      isolate()
      val g0 = gcMillis
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); 1 } catch { case _: Throwable => 0 }
      ((System.nanoTime() - t0) / 1e9, gcMillis - g0, ok)
    }
    println("READY"); Console.out.flush()
    scala.io.Source.stdin.getLines().foreach { line =>
      line.trim.split("\\s+").toList match {
        case "RUN" :: name :: nStr :: warmFlag :: Nil =>
          SparkEntry.queries.get(name) match {
            case Some(fn) =>
              if (warmFlag == "warm") attempt(fn)
              val rs = (1 to nStr.toInt).map(_ => attempt(fn))
              def f(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
              println(s"RESULT $name [${rs.map(r => f(r._1)).mkString(",")}] " +
                s"[${rs.map(_._2).mkString(",")}] [${rs.map(_._3).mkString(",")}]")
            case None => println(s"ERR unknown query: $name")
          }
          Console.out.flush()
        case "EXIT" :: Nil =>
          spark.stop(); Console.out.flush(); sys.exit(0)
        case Nil | "" :: Nil => ()
        case other =>
          println(s"ERR bad command: $line"); Console.out.flush()
      }
    }
  }
}

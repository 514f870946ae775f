package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only measurement probe for the r19 optimization round (guide
  * §1: measure first). Times named plan fragments / experiment variants
  * in one warmed session so A/B deltas are attributable to the plan
  * change, not JVM state. Not part of the driver contract.
  *
  * Usage: runjar.sh graft.DevProbe <sfDir> <exp>[,<exp>...] [reps]
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val exps = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session(s"local[$cpus]", shufflePartitions = cpus.toInt,
      inputBytes = Engine.inputBytes(dir))
    spark.sparkContext.setLogLevel("WARN")
    // session warmup, same spirit as Bench
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("orders", "lineitem", "documents", "embeddings")
      .foreach(t => spark.read.parquet(s"$dir/$t.parquet").count())

    def time(name: String)(mk: => DataFrame): Unit = {
      (1 to reps).foreach { i =>
        spark.catalog.clearCache()
        graft.dedup.Dedup.releaseCaches()
        graft.operators.PrefixSum.releaseCaches()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc()
        val t0 = System.nanoTime()
        val n = mk.count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name%-28s rep$i ${dt}%8.3fs rows=$n")
      }
    }

    def liord(s: SparkSession): DataFrame = {
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
    }

    exps.foreach {
      case "spine" => time("spine_current") {
        val cs = liord(spark).distinct()
        cs.select(col("c").as("src"), col("p").as("dst"))
          .unionByName(cs.select(col("p").as("src"), col("c").as("dst")))
          .distinct()
          .repartition(col("src"))
      }
      case "spine_nodist" => time("spine_nodist") {
        val cs = liord(spark).distinct()
        cs.select(col("c").as("src"), col("p").as("dst"))
          .unionByName(cs.select(col("p").as("src"), col("c").as("dst")))
          .repartition(col("src"))
      }
      case "spine_join" => time("spine_join_only") {
        liord(spark)
      }
      case "spine_dist" => time("spine_cs_distinct") {
        liord(spark).distinct()
      }
      case "spine_plan" =>
        val cs = liord(spark).distinct()
        val e = cs.select(col("c").as("src"), col("p").as("dst"))
          .unionByName(cs.select(col("p").as("src"), col("c").as("dst")))
          .distinct().repartition(col("src"))
        println("===EXPLAIN spine_old===")
        println(e.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        println("===END spine_old===")
      case "spine_new" => time("spine_new") {
        val cp = liord(spark)
        cp.select(col("c").as("src"), col("p").as("dst"))
          .unionByName(cp.select(col("p").as("src"), col("c").as("dst")))
          .repartition(col("src"))
          .dropDuplicates("src", "dst")
      }
      case "spine_new_plan" =>
        val cp = liord(spark)
        val e = cp.select(col("c").as("src"), col("p").as("dst"))
          .unionByName(cp.select(col("p").as("src"), col("c").as("dst")))
          .repartition(col("src"))
          .dropDuplicates("src", "dst")
        println("===EXPLAIN spine_new===")
        println(e.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        println("===END spine_new===")
      case e if e.startsWith("conf:") =>
        val kv = e.stripPrefix("conf:").split("=", 2)
        spark.conf.set(kv(0), kv(1))
        println(s"[probe] conf ${kv(0)} = ${kv(1)}")
      case e if e.startsWith("plantime:") =>
        val q = e.stripPrefix("plantime:")
        (1 to reps).foreach { i =>
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(q)(spark, dir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan // force analysis+optimization+planning
          val t2 = System.nanoTime()
          val n = df.count()
          val t3 = System.nanoTime()
          println(f"[probe] plantime:$q rep$i build=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f exec=${(t3 - t2) / 1e9}%.3f rows=$n")
          spark.catalog.clearCache()
          graft.dedup.Dedup.releaseCaches()
          graft.operators.PrefixSum.releaseCaches()
          spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        }
      case e if e.startsWith("jobs:") =>
        val q = e.stripPrefix("jobs:")
        import org.apache.spark.scheduler._
        val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
        val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Int)]
        val listener = new SparkListener {
          override def onJobStart(js: SparkListenerJobStart): Unit =
            jobs.put(js.jobId, (System.nanoTime(), js.stageInfos.map(_.numTasks).sum))
          override def onJobEnd(je: SparkListenerJobEnd): Unit = {
            Option(jobs.get(je.jobId)).foreach { case (t0, nt) =>
              done.synchronized { done += ((je.jobId, System.nanoTime() - t0, nt)) }
            }
          }
        }
        spark.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(q)(spark, dir)
        val tb = System.nanoTime()
        val n = df.count()
        val t1 = System.nanoTime()
        Thread.sleep(500)
        spark.sparkContext.removeSparkListener(listener)
        println(f"[probe] jobs:$q build=${(tb - t0) / 1e9}%.3f total=${(t1 - t0) / 1e9}%.3f rows=$n njobs=${done.size}")
        done.sortBy(_._1).foreach { case (id, dt, nt) =>
          println(f"[probe]   job$id%-4d ${dt / 1e9}%7.3fs tasks=$nt")
        }
      case e if e.startsWith("explain:") =>
        val q = e.stripPrefix("explain:")
        val df = SparkEntry.queries(q)(spark, dir)
        println(s"===EXPLAIN $q===")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        println(s"===END $q===")
      case other =>
        // fall back: run a registered query by name
        SparkEntry.queries.get(other) match {
          case Some(fn) => time(other)(fn(spark, dir))
          case None => println(s"[probe] unknown experiment: $other")
        }
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Dev-only plan audit: per query, count the physical operators that
  * dominate scale behavior (exchanges, sorts, join strategies). Run:
  * `sbt "runMain graft.Plans /root/testdata/sf0.01"` and eyeball rows
  * with unexpected shuffle counts or join strategies. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // Engine.session, not a raw builder: the audit must inspect the
    // plans users get — with GraftExtensions loaded (AggJoinToWindow
    // and the SQL function registry), AQE on, the engine's shuffle
    // parallelism. A bare session showed q_agg_join_window's
    // UNREWRITTEN plan.
    val spark: SparkSession = Engine.session("local[8]", shufflePartitions = 8)
    spark.sparkContext.setLogLevel("ERROR")
    def count(p: String, tok: String): Int = {
      var i = 0; var n = 0
      while ({ i = p.indexOf(tok, i); i >= 0 }) { n += 1; i += tok.length }
      n
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString()
        println(f"$name%-26s exch=${count(p, "Exchange")}%2d sort=${count(p, "Sort ")}%2d " +
          f"bhj=${count(p, "BroadcastHashJoin")}%2d smj=${count(p, "SortMergeJoin")}%2d " +
          f"shj=${count(p, "ShuffledHashJoin")}%2d bnlj=${count(p, "BroadcastNestedLoopJoin")}%2d " +
          f"cart=${count(p, "CartesianProduct")}%2d")
      } catch { case e: Throwable => println(f"$name%-26s ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}

package graft
import org.apache.spark.sql.SparkSession

/** Dev-only plan audit: per query, count the physical operators that
  * dominate scale behavior (exchanges, sorts, join strategies). Run:
  * `sbt "runMain graft.Plans /root/testdata/sf0.01"` and eyeball rows
  * with unexpected shuffle counts or join strategies. */
object Plans {

  /** The single-task-funnel detector (the PrefixSum.scala cliff): a
    * Window with an EMPTY partition spec plans Exchange
    * (SinglePartition) — every input row through ONE task. That is
    * fine when the input is provably bounded (a Limit/TakeOrdered
    * somewhere below on EVERY path to a leaf — the text_zipf
    * limit-first pattern) and a 100×-scale cliff when it is
    * data-sized. Counts the unbounded ones; plan_gate.py enforces
    * gwin == 0 outside an audited day-spine/model-sized allowlist
    * REGARDLESS of the baseline, so --update cannot bless a new
    * funnel. Walk `queryExecution.sparkPlan` (pre-AQE preparation — a
    * real tree; executedPlan's AdaptiveSparkPlanExec wrapper has no
    * children until execution). */
  def unboundedGlobalWindows(p: org.apache.spark.sql.execution.SparkPlan): Int = {
    def limitBounded(q: org.apache.spark.sql.execution.SparkPlan): Boolean = {
      val n = q.getClass.getSimpleName
      if (n.contains("Limit") || n.contains("TakeOrderedAndProject")) true
      else if (q.children.isEmpty) false
      else q.children.forall(limitBounded)
    }
    val self = p match {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty && !limitBounded(w.child) => 1
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
        if w.partitionSpec.isEmpty && !limitBounded(w.child) => 1
      case _ => 0
    }
    self + p.children.map(unboundedGlobalWindows).sum
  }

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
        val qe = fn(spark, sfDir).queryExecution
        val p = qe.executedPlan.toString()
        val gwin = unboundedGlobalWindows(qe.sparkPlan)
        println(f"$name%-26s exch=${count(p, "Exchange")}%2d sort=${count(p, "Sort ")}%2d " +
          f"bhj=${count(p, "BroadcastHashJoin")}%2d smj=${count(p, "SortMergeJoin")}%2d " +
          f"shj=${count(p, "ShuffledHashJoin")}%2d bnlj=${count(p, "BroadcastNestedLoopJoin")}%2d " +
          f"cart=${count(p, "CartesianProduct")}%2d gwin=$gwin%2d")
      } catch { case e: Throwable => println(f"$name%-26s ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}

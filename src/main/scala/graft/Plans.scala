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
    import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, LocalLimitExec, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
    // A subtree is "bounded" when its row count cannot scale with the
    // DATA (only with the limit k and, for per-task bounds, the task
    // count): the concrete limit operators plus WindowGroupLimit in
    // EITHER mode — Partial caps every map task at k rows (≤ k·tasks
    // total into the downstream SinglePartition exchange), Final caps
    // the output at k per key. Matching concrete node types, not class-
    // name substrings, so an unrelated *Limit*-named operator can never
    // silently bless a funnel (round-13 advice).
    def limitBounded(q: org.apache.spark.sql.execution.SparkPlan): Boolean = q match {
      case _: GlobalLimitExec | _: LocalLimitExec | _: CollectLimitExec |
           _: TakeOrderedAndProjectExec | _: WindowGroupLimitExec => true
      case _ if q.children.isEmpty => false
      case _ => q.children.forall(limitBounded)
    }
    val self = p match {
      case w: WindowExec
        if w.partitionSpec.isEmpty && !limitBounded(w.child) => 1
      // a global WindowGroupLimit is itself a funnel only in Final mode
      // (requires AllTuples → SinglePartition); the Partial pass runs
      // distributed per map task and is never a violation. In practice
      // the planner always feeds Final from a Partial (so its child is
      // bounded); this arm catches a hand-built plan that skips it.
      case w: WindowGroupLimitExec
        if w.partitionSpec.isEmpty &&
          w.mode == org.apache.spark.sql.execution.window.Final &&
          !limitBounded(w.child) => 1
      case _ => 0
    }
    self + p.children.map(unboundedGlobalWindows).sum
  }

  /** Row count of each unpartitioned logical Window frame in `df`'s
    * optimized plan — the rows a global window funnels through one
    * task. plan_gate.py's GWIN_ALLOW entries claim their frames are
    * bounded BY SOURCE (day-spine / key-domain); that claim is invisible
    * to the structural detector, so GwinAuditSpec verifies it
    * mechanically: evaluate this at two SFs and fail any allowlisted
    * frame whose count scales with the data. */
  def globalWindowFrameRows(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val spark = df.sparkSession
    df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty =>
        org.apache.spark.sql.graftbridge.PlanBridge.dataFrame(spark, w.child).count()
    }
  }

  /** How many Exchange nodes in the plan are DUPLICATES of another by
    * canonicalized equality — i.e. the shares AQE's stage cache will
    * execute once at runtime (the r15 sim_recall_at_k finding: the plan
    * STRING shows 27 exchanges but the union branches share one
    * physical brute-force execution). Under AQE the initial plan never
    * contains ReusedExchange nodes — reuse is decided at runtime by
    * canonicalized matching — so this static count is the mechanical
    * form of that adjudication: reuse = total − distinct canonical
    * forms. A drop means a formerly-shared subtree now re-derives.
    *
    * Counted on an EnsureRequirements-prepared copy of `sparkPlan`:
    * distribution-required exchanges don't exist yet at the sparkPlan
    * level, and the AQE executedPlan wrapper exposes no children until
    * execution — the prepared copy is the deterministic pre-execution
    * view of the exchange tree the stage cache will dedupe. */
  def reusableExchanges(qe: org.apache.spark.sql.execution.QueryExecution): Int = {
    val prepared =
      org.apache.spark.sql.execution.exchange.EnsureRequirements()(qe.sparkPlan)
    val ex = prepared.collect { case e: org.apache.spark.sql.execution.exchange.Exchange => e }
    ex.size - ex.map(_.canonicalized).distinct.size
  }

  /** Occurrences of `tok` in a plan string — the baseline's counting
    * definition, shared with ExchAuditSpec so the audit and the gate
    * can never disagree on what "exch" means. */
  def countToken(p: String, tok: String): Int = {
    var i = 0; var n = 0
    while ({ i = p.indexOf(tok, i); i >= 0 }) { n += 1; i += tok.length }
    n
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
    def count(p: String, tok: String): Int = countToken(p, tok)
    // dev knob: arg 2 = comma-list of query names to dump (subset audit)
    val only = args.drop(1).headOption.map(_.split(",").toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try {
        val qe = fn(spark, sfDir).queryExecution
        val p = qe.executedPlan.toString()
        val gwin = unboundedGlobalWindows(qe.sparkPlan)
        // exch counts every "Exchange" token in the plan string; reuse
        // counts the canonicalized-duplicate Exchange nodes AQE will
        // execute once (see reusableExchanges) so plan_gate's
        // EXCH_ALLOW can verify an adjudicated high-exch plan is still
        // sharing, not silently re-deriving.
        println(f"$name%-26s exch=${count(p, "Exchange")}%2d reuse=${reusableExchanges(qe)}%2d sort=${count(p, "Sort ")}%2d " +
          f"bhj=${count(p, "BroadcastHashJoin")}%2d smj=${count(p, "SortMergeJoin")}%2d " +
          f"shj=${count(p, "ShuffledHashJoin")}%2d bnlj=${count(p, "BroadcastNestedLoopJoin")}%2d " +
          f"cart=${count(p, "CartesianProduct")}%2d gwin=$gwin%2d")
      } catch { case e: Throwable => println(f"$name%-26s ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}

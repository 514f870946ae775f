package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge to Spark's `private[sql]` logical-plan → DataFrame
  * constructor, used by the gwin allowlist audit (GwinAuditSpec): to
  * verify an allowlisted unpartitioned-Window frame really is
  * calendar/key-domain-bounded, the audit counts the Window operator's
  * CHILD subtree at two scale factors — which requires turning a
  * logical subtree back into a runnable DataFrame.
  */
object PlanBridge {
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[ClassicSession], plan)

  /** Drop the `originStats` a checkpointed Dataset's LogicalRDD copies
    * from its origin plan (falling back to `spark.sql.defaultSizeInBytes`,
    * i.e. "unknown/huge" — the conservative never-broadcast posture the
    * iterative kernels already rely on).
    *
    * Why: a convergence loop that cuts lineage per round feeds round n's
    * LogicalRDD (stats = origin plan's ESTIMATE) back into round n+1's
    * plan. A kernel whose round references the moving frame twice (the
    * k-core peel joins the alive set on BOTH edge endpoints) then
    * SQUARES the size estimate per round — double-exponential BigInt
    * growth that crashes Catalyst sizing with "BigInteger would
    * overflow supported range" near round 30, long before any memory
    * limit. Measured on the DiameterProbe's 299-diameter chain; at
    * sf0.1 every graph query converges in a handful of rounds, so only
    * high-diameter graphs — exactly the 100 TB hazard case — hit it. */
  def withoutOriginStats(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        val spark = df.sparkSession.asInstanceOf[ClassicSession]
        dataFrame(spark,
          org.apache.spark.sql.execution.LogicalRDD(
            l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
            l.isStreaming, l.stream)(spark, None, None))
      case _ => df
    }
}

package graft

/** Mechanical audit of plan_gate.py's EXCH_ALLOW (r15 verdict #4): the
  * allowlist adjudicates every >EXCH_BAR-exchange plan (key-domain-
  * bounded frames, or exchanges AQE's stage cache shares), and those
  * adjudications are regression armor only while they stay true. This
  * spec parses the dict out of plan_gate.py (GwinAuditSpec posture — no
  * second list to forget) and re-checks both halves against the LIVE
  * plans at the gate's SF:
  *
  *  - an allowlisted plan must stay within its exch ceiling AND keep at
  *    least its recorded canonical-reuse count (a drop means a
  *    formerly-shared subtree now re-derives — the exact defect class
  *    the r15 q_kcore fix removed);
  *  - every UNLISTED query must plan at or under EXCH_BAR exchanges;
  *  - every allowlist entry must name a registered query (no stale
  *    entries surviving a rename).
  */
class ExchAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01" // the SF plan_gate audits at

  private lazy val gateSrc: String = {
    val s = scala.io.Source.fromFile("scripts/plan_gate.py", "UTF-8")
    try s.mkString finally s.close()
  }

  private lazy val bar: Int =
    "EXCH_BAR = (\\d+)".r.findFirstMatchIn(gateSrc).get.group(1).toInt

  private lazy val allow: Map[String, (Int, Int)] = {
    val body = gateSrc.split("EXCH_ALLOW = \\{")(1).split("\\n\\}")(0)
    "\"(\\w+)\":\\s*\\((\\d+),\\s*(\\d+)".r.findAllMatchIn(body)
      .map(m => m.group(1) -> (m.group(2).toInt, m.group(3).toInt)).toMap
  }

  test("every EXCH_ALLOW adjudication holds against the live plans; no unlisted plan exceeds the bar") {
    assert(allow.size >= 20, s"allowlist parse broke: ${allow.size} entries")
    assert(bar == 10, s"unexpected EXCH_BAR $bar — re-read the audit's assumptions")
    val stale = allow.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"EXCH_ALLOW entries naming no registered query: $stale")
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val qe = fn(spark, dir).queryExecution
      val exch = Plans.countToken(qe.executedPlan.toString(), "Exchange")
      val reuse = Plans.reusableExchanges(qe)
      graft.dedup.Dedup.releaseCaches()
      graft.operators.PrefixSum.releaseCaches()
      spark.catalog.clearCache()
      allow.get(name) match {
        case Some((mx, rmin)) if exch > mx =>
          Some(s"$name: exch=$exch > allowlisted $mx")
        case Some((mx, rmin)) if reuse < rmin =>
          Some(s"$name: reuse=$reuse dropped below allowlisted $rmin — a shared exchange now re-derives")
        case None if exch > bar =>
          Some(s"$name: exch=$exch > bar $bar with no EXCH_ALLOW entry")
        case _ => None
      }
    }
    assert(bad.isEmpty, s"exchange-audit violations:\n${bad.mkString("\n")}")
  }

  test("a seeded re-derivation fails the reuse check") {
    // the defect class the reuse floor exists for: two copies of the
    // same aggregate UNIONed — AQE shares them (reuse >= 1); breaking
    // the share (here: perturbing one branch) drops the count
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy(col("o_orderpriority")).agg(sum(col("o_totalprice")).as("s"))
    val shared = base.union(base)
    val broken = base.union(
      spark.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderkey") > 0) // semantically different subtree
        .groupBy(col("o_orderpriority")).agg(sum(col("o_totalprice")).as("s")))
    assert(Plans.reusableExchanges(shared.queryExecution) >= 1,
      "the probe must see the shared exchange")
    assert(Plans.reusableExchanges(broken.queryExecution) <
      Plans.reusableExchanges(shared.queryExecution),
      "breaking the share must drop the reuse count")
  }
}

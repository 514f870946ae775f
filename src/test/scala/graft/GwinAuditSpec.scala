package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mechanical audit of plan_gate.py's GWIN_ALLOW (r13 verdict #6): the
  * allowlist is regression armor only while its bound claims stay true.
  * Each entry asserts its unpartitioned-Window frames are bounded BY
  * SOURCE (day-spine / key-domain) — invisible to the structural
  * detector, so this spec checks the claim the only way it can be
  * checked: count every global-window frame at two scale factors and
  * fail any entry whose frame grows with the DATA rather than the
  * calendar/key domain. The allowlist is parsed out of plan_gate.py so
  * a new entry is audited automatically — there is no second list to
  * forget to update.
  */
class GwinAuditSpec extends SparkSpec {

  private val smallDir = "/root/testdata/sf0.001"
  private val bigDir = "/root/testdata/sf0.01" // 10× the data
  private val hugeDir = "/root/testdata/sf0.1" // 100× the data

  // bounded frames may wobble (a few more distinct event days, one more
  // null-pattern combo); data-sized frames track the 10× SF step. 3× +
  // a small absolute slack separates the two cleanly.
  private def dataSized(small: Long, big: Long): Boolean = big > small * 3 + 64

  private lazy val allow: Map[String, Int] = {
    val src = {
      val s = scala.io.Source.fromFile("scripts/plan_gate.py", "UTF-8")
      try s.mkString finally s.close()
    }
    val body = src.split("GWIN_ALLOW = \\{")(1).split("\\}")(0)
    "\"(\\w+)\":\\s*(\\d+)".r.findAllMatchIn(body)
      .map(m => m.group(1) -> m.group(2).toInt).toMap
  }

  test("every GWIN_ALLOW frame is SF-invariant (10× data → ≤3× frame, or saturating)") {
    assert(allow.size >= 40, s"allowlist parse broke: ${allow.size} entries")
    def frames(name: String, dir: String): Long = {
      val rows = Plans.globalWindowFrameRows(SparkEntry.queries(name)(spark, dir)).sum
      graft.operators.PrefixSum.releaseCaches()
      spark.catalog.clearCache()
      rows
    }
    // tier 1 (cheap, every entry): a frame bounded by source must not
    // track the 10× sf0.001→sf0.01 step
    val suspects = allow.keys.toSeq.sorted.flatMap { name =>
      val small = frames(name, smallDir)
      val big = frames(name, bigDir)
      if (dataSized(small, big)) Some((name, small, big)) else None
    }
    // tier 2 (suspects only): a SPARSELY-SAMPLED bounded domain (the
    // survival curves' distinct event times: 224→1461 over tier 1) is
    // legitimate — distinguished from data-sized by the NEXT 10× step,
    // where a bounded domain saturates (growth decelerates under 3×:
    // measured 2.1× for the survival family) while a data-sized frame
    // repeats its ~10×
    val bad = suspects.flatMap { case (name, small, big) =>
      val huge = frames(name, hugeDir)
      if (dataSized(big, huge)) Some((name, small, big, huge)) else None
    }
    assert(bad.isEmpty,
      s"allowlisted frames that scale with the data (name, rows@sf0.001, rows@sf0.01, rows@sf0.1): $bad")
  }

  test("a seeded data-sized frame fails the audit") {
    // the violation the audit exists for: a global row_number over the
    // raw orders table — its frame is the table
    def seeded(dir: String) = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("rn", row_number().over(
        Window.orderBy(col("o_orderkey"))))
      .filter(col("rn") > 1) // keep the filter from becoming a group limit
    val small = Plans.globalWindowFrameRows(seeded(smallDir)).sum
    val big = Plans.globalWindowFrameRows(seeded(bigDir)).sum
    val huge = Plans.globalWindowFrameRows(seeded(hugeDir)).sum
    assert(small > 0, "seeded frame must be visible to the probe")
    assert(dataSized(small, big) && dataSized(big, huge),
      s"the audit must flag a data-sized frame at both tiers ($small → $big → $huge)")
  }
}

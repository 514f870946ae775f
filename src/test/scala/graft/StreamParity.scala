package graft

import org.scalatest.{Args, Reporter}
import org.scalatest.events.{Event, TestFailed, TestSucceeded}

/** Per-round streaming-parity artifact (r16 verdict #6): SURVEY §2's
  * streaming section has zero [q] keys, so the driver's CORRECTNESS
  * artifact never carries a streaming number. This main runs the two
  * streaming-parity suites THROUGH ScalaTest itself — the identical
  * machinery `sbt test` runs, no re-implemented scenarios to drift —
  * and emits one JSON artifact with a row per parity case:
  *
  *  - PipelineStreamSpec: per-prefix + shuffled-feed manifest-digest
  *    parity of the live curation pipeline vs the batch pipeline_run
  *    DAG, including kill-and-restart replays.
  *  - StreamingRestartSpec: the seven sketch monitors' kill-and-restart
  *    ≡ uninterrupted parity plus the MonitorState envelope contract.
  *
  * Usage: sbt "Test/runMain graft.StreamParity STREAMPARITY_rN.json"
  */
object StreamParity {

  final case class Row(suite: String, test: String, ok: Boolean,
                       durationMs: Long, detail: String)

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("STREAMPARITY.json")
    val rows = collection.mutable.ArrayBuffer.empty[Row]
    val reporter = new Reporter {
      def apply(e: Event): Unit = e match {
        case t: TestSucceeded =>
          rows += Row(t.suiteName, t.testName, ok = true, t.duration.getOrElse(-1L), "")
        case t: TestFailed =>
          rows += Row(t.suiteName, t.testName, ok = false, t.duration.getOrElse(-1L),
            t.message.take(300))
        case _ =>
      }
    }
    Seq(new PipelineStreamSpec, new StreamingRestartSpec)
      .foreach(_.run(None, Args(reporter)))

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("artifact", "streamparity")
    root.put("n", rows.size)
    root.put("n_ok", rows.count(_.ok))
    root.put("all_ok", rows.nonEmpty && rows.forall(_.ok))
    val arr = root.putArray("rows")
    rows.foreach { r =>
      val o = arr.addObject()
      o.put("suite", r.suite); o.put("test", r.test)
      o.put("ok", r.ok); o.put("duration_ms", r.durationMs)
      if (!r.ok) o.put("detail", r.detail)
    }
    val bytes = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(root)
    java.nio.file.Files.write(java.nio.file.Paths.get(out), bytes)
    println(s"streamparity: ${rows.count(_.ok)}/${rows.size} ok -> $out")
    TestSession.spark.streams.active.foreach(_.stop())
  }
}

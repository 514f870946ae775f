package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Engine.session (extensions + AQE), same as Bench: the correctness
    // dump must exercise the session users get — with a bare builder the
    // AggJoinToWindow conf was set but the rule was never injected, so
    // q_agg_join_window's oracle check ran the UNREWRITTEN plan.
    val spark: SparkSession = Engine.session(s"local[$cpus]",
      shufflePartitions = cpus.toInt, inputBytes = Engine.inputBytes(sfDir))
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev-only knob (driver sets nothing): ONLY=comma-list to subset,
    // mirroring Bench's — full dumps stay the default
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // same hygiene as Bench.isolate(): dedup builders and the CC
      // loop leave materialized blocks behind; 84 queries of
      // accumulation is avoidable memory pressure
      graft.dedup.Dedup.releaseCaches()
      graft.operators.PrefixSum.releaseCaches()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // full registered key list (independent of ONLY subsetting) so
    // check.py can assert SURVEY §2 ↔ SparkEntry.queries lockstep
    Files.writeString(Paths.get(s"$outDir/registered_queries.json"),
      SparkEntry.queries.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    // measured-vs-bound envelopes for the two no-oracle sketch keys
    // (r15 verdict #7): the correctness artifact carries a recorded
    // bound-satisfaction line for them each round, not just `no_oracle`
    val envKeys = Set("an_approx_stats", "an_tdigest")
      .filter(k => only.forall(_.contains(k)))
    if (envKeys.nonEmpty)
      try Files.writeString(Paths.get(s"$outDir/sketch_error_envelopes.json"),
        ErrorEnvelopes.report(spark, sfDir, envKeys))
      catch { case e: Throwable =>
        System.err.println(s"[verify] envelope report failed: ${e.getMessage}")
      }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Board-wide metamorphic invariance sweep (r17 verdict #3): every
  * registry query re-executed under a partition-perturbed session —
  * different `spark.sql.shuffle.partitions`, every source scan forced
  * through a round-robin repartition ([[Tables.perturbParts]]), model
  * memos cleared so trainers re-fit on the perturbed layout — must
  * produce a BIT-IDENTICAL result multiset to the canonical run.
  *
  * This is the mechanical, same-hand-free defense the board was
  * missing: the DuckDB hash oracle cannot catch a semantic error
  * shared by Scala and oracle SQL written together, but
  * partition-ORDER dependence (a double gather that should have been
  * decimal, a tie-break that should have been keyed) is exactly the
  * class the engine's contracts rule out, and it is detectable with
  * no oracle at all — run twice under different layouts, compare.
  *
  * Usage: `runMain graft.Metamorphic <sfDir> [outJson]`. Dev knobs
  * mirror Bench/Verify: SPARK_GRAFT_ONLY subsets, SPARK_GRAFT_CPUS
  * sizes the session. Emits one JSON line (ok/fail counts + failing
  * keys) and writes the full per-key hash table to outJson.
  */
object Metamorphic {

  /** Row-ORDER-independent, row-MULTIPLICITY-sensitive content hash:
    * columns name-sorted (the driver compare's convention), every
    * value rendered to a string (binary via base64), per-row md5 split
    * into its two 64-bit halves (hex digits 1-16 and 17-32 — the full
    * 128-bit digest participates; r18 advice #4 caught the earlier
    * 15-char substrings dropping digits 16 and 32), each SUMMED through
    * DECIMAL(38,0) — order-free, collision-resistant at board row
    * counts, and cheap (one aggregate, no sort, no collect of
    * data-sized state). NULL and the empty string hash differently
    * (explicit NUL sentinel). */
  def contentHash(df: DataFrame): String = {
    val fields = df.schema.fields.sortBy(_.name).toSeq
    val parts: Seq[Column] = fields.map { f =>
      val c = f.dataType match {
        case org.apache.spark.sql.types.BinaryType => base64(col(f.name))
        case _ => col(f.name).cast("string")
      }
      coalesce(c, lit("\u0000"))
    }
    val r = df.select(md5(concat_ws("\u0001", parts: _*)).as("h"))
      .agg(count(lit(1)).as("n"),
        sum(conv(substring(col("h"), 1, 16), 16, 10).cast("decimal(38,0)")).as("h1"),
        sum(conv(substring(col("h"), 17, 16), 16, 10).cast("decimal(38,0)")).as("h2"))
      .head()
    s"n=${r.get(0)};a=${r.get(1)};b=${r.get(2)}"
  }

  /** Drop every cross-query cache a run can leave behind, including
    * the fit-once model memos — the perturbed run must RE-TRAIN on the
    * perturbed layout or the sweep silently skips the trainers. */
  private def isolate(spark: SparkSession): Unit = {
    graft.dedup.Dedup.releaseCaches()
    graft.operators.PrefixSum.releaseCaches()
    SparkEntry.kmeansIntModels.clear()
    SparkEntry.pqIntModels.clear()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outJson = args.lift(1).getOrElse("/tmp/metamorphic.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val perturbShuffle = sys.env.getOrElse("SPARK_GRAFT_PERTURB_SHUFFLE", "7")
    val perturbInput = sys.env.getOrElse("SPARK_GRAFT_PERTURB_INPUT", "11").toInt
    val spark = Engine.session(s"local[$cpus]", shufflePartitions = cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val canonicalShuffle = cpus.toString
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Boolean)]
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        def runOnce(shuffle: String, inputParts: Int): String = {
          isolate(spark)
          spark.conf.set("spark.sql.shuffle.partitions", shuffle)
          Tables.perturbParts = inputParts
          try contentHash(fn(spark, sfDir))
          finally {
            Tables.perturbParts = 0
            spark.conf.set("spark.sql.shuffle.partitions", canonicalShuffle)
          }
        }
        val (h1, h2, ok) =
          try {
            val a = runOnce(canonicalShuffle, 0)
            val b = runOnce(perturbShuffle, perturbInput)
            (a, b, a == b)
          } catch { case e: Throwable =>
            (s"ERROR:${e.getClass.getSimpleName}",
              String.valueOf(e.getMessage).take(120), false)
          }
        if (!ok) failed += name
        rows += ((name, h1, h2, ok))
        System.err.println(f"[meta] $name%-26s ${if (ok) "ok" else s"FAIL $h1 vs $h2"}")
      }
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val body = rows.map { case (n, a, b, ok) =>
      s"${q(n)}:{" + s""""ok":$ok,"canonical":${q(a)},"perturbed":${q(b)}}"""
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"metamorphic","n":${rows.size},"ok":${rows.count(_._4)},""" +
        s""""fail":${failed.size},"failed":${failed.map(q).mkString("[", ",", "]")},""" +
        s""""perturb":{"shuffle":"$canonicalShuffle->$perturbShuffle","input_repartition":$perturbInput},"sf":"$sfDir"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson),
      s"""{"summary":$line,"keys":$body}""")
    println(line)
    spark.stop()
  }
}

package graft

/** Fast CI gate for the board-wide metamorphic invariance sweep
  * (r17 verdict #3): a representative key per contract family is run
  * canonically and under a partition-perturbed layout (different
  * shuffle parallelism + forced input repartition + cleared model
  * memos) and the [[Metamorphic.contentHash]] results must be
  * bit-identical. The FULL 460-key sweep is the per-round
  * `runMain graft.Metamorphic` artifact (METAMORPHIC_r{N}.json); this
  * spec keeps the mechanism and one key per family under `sbt test`
  * so a partition-order regression fails CI the day it lands.
  *
  * Family coverage: decimal gathers (an_stats_moments), PrefixSum
  * order statistics (q_exact_median), global-window day spine
  * (an_autocorr), sketch exact regime (an_kll_rank), HLL register
  * state (an_hll_distinct), self-certified sketches
  * (an_approx_stats), iterative RDD-core graph (q_pagerank), banded
  * dedup (dedup_minhash_lsh), trained-model ANN (sim_ivf_kmeans —
  * re-trains after the memo clear), text aggregation (text_tfidf),
  * weighted sampling (etl_weighted_sample), multimodal row-local
  * codecs (mm_decode_stats), windowed relational (q_window_funcs),
  * and the composed curation DAG (pipeline_run). */
class MetamorphicSpec extends SparkSpec {

  private val keys = Seq(
    "an_stats_moments", "q_exact_median", "an_autocorr", "an_kll_rank",
    "an_hll_distinct", "an_approx_stats", "q_pagerank", "dedup_minhash_lsh",
    "sim_ivf_kmeans", "text_tfidf", "etl_weighted_sample", "mm_decode_stats",
    "q_window_funcs", "pipeline_run")

  private def isolate(): Unit = {
    graft.dedup.Dedup.releaseCaches()
    graft.operators.PrefixSum.releaseCaches()
    SparkEntry.kmeansIntModels.clear()
    SparkEntry.pqIntModels.clear()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  test("contentHash consumes the FULL 128-bit digest (two 64-bit halves, r18 advice #4)") {
    import spark.implicits._
    val vals = Seq("a", "b", "")
    val got = Metamorphic.contentHash(vals.toDF("v"))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hs = vals.map(md5hex)
    val a = hs.map(h => BigInt(h.substring(0, 16), 16)).sum
    val b = hs.map(h => BigInt(h.substring(16, 32), 16)).sum
    assert(got == s"n=3;a=$a;b=$b",
      s"contentHash must sum md5 digits 1-16 and 17-32 exactly: got $got")
  }

  keys.foreach { name =>
    test(s"$name is partition-layout independent") {
      val fn = SparkEntry.queries(name)
      def runOnce(shuffle: String, inputParts: Int): String = {
        isolate()
        spark.conf.set("spark.sql.shuffle.partitions", shuffle)
        Tables.perturbParts = inputParts
        try Metamorphic.contentHash(fn(spark, sfDir))
        finally {
          Tables.perturbParts = 0
          spark.conf.set("spark.sql.shuffle.partitions", "4")
        }
      }
      val canonical = runOnce("4", 0)
      val perturbed = runOnce("3", 5)
      assert(canonical == perturbed,
        s"$name diverged under a perturbed partition layout: " +
          s"$canonical vs $perturbed")
    }
  }
}

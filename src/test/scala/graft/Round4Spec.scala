package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin
import graft.etl.SchemaResolver
import graft.dedup.Dedup
import graft.similarity.{KMeans, Quantize}

/** Specs for the round-4 operators: binned range join, connected
  * components, schema-drift resolution, int8 quantization, chunking
  * helpers, and incremental k-means refit. */
class Round4Spec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ RangeJoin

  test("RangeJoin matches the nested-loop join exactly, no dup pairs") {
    val points = (0L to 500L by 7L).toDF("p")
    val intervals = Seq((0L, 10L, 60L), (1L, 55L, 56L), (2L, 100L, 100L), // empty
      (3L, 90L, 400L), (4L, 399L, 500L)).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", binWidth = 32)
      .select("p", "iv_id").as[(Long, Long)].collect().toSet
    val want = points.crossJoin(intervals)
      .where(col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "iv_id").as[(Long, Long)].collect()
    assert(want.length == want.toSet.size)
    assert(got == want.toSet)
  }

  test("RangeJoin timestamp flavor handles sub-second interval bounds") {
    def ts(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    val points = Seq((1L, ts(600300))).toDF("ev", "pts") // 600.3s
    // interval ends 600.4s: crosses the 600s bin boundary only by a
    // sub-second tail — the boundary-truncation case
    val ivs = Seq((7L, ts(300500), ts(600400))).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInIntervalTs(points, "pts", ivs, "lo", "hi", binSeconds = 300)
    assert(got.count() == 1L, "point in the hi-bound's truncated bin must still match")
  }

  // ------------------------------------- connected components (dedup_clusters)

  test("connectedComponents labels every node with its component min") {
    // two components: {1,2,3,9} via chain, {5,6}; pairs given max-first
    val pairs = Seq((2L, 1L), (3L, 2L), (9L, 3L), (6L, 5L)).toDF("a", "b")
    val got = Dedup.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents converges on a long chain") {
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("a", "b")
    val got = Dedup.connectedComponents(chain, "a", "b")
      .as[(Long, Long)].collect()
    assert(got.length == 40 && got.forall(_._2 == 1L))
  }

  // ------------------------------------------------------- SchemaResolver

  test("SchemaResolver resolves case/spacing/underscore drift") {
    val schema = Seq("Order Key", "CUST_KEY", "OrderStatus")
    assert(SchemaResolver.resolve(schema, "order_key").contains("Order Key"))
    assert(SchemaResolver.resolve(schema, "ORDERSTATUS").contains("OrderStatus"))
    assert(SchemaResolver.resolve(schema, "missing").isEmpty)
    assert(SchemaResolver.resolveFirst(schema, Seq("nope", "cust-key")).contains("CUST_KEY"))
  }

  test("SchemaResolver throws on ambiguity and on unresolved outputs") {
    intercept[IllegalArgumentException] {
      SchemaResolver.resolve(Seq("a_b", "AB"), "ab")
    }
    val df = Seq((1, "x")).toDF("Order Key", "OrderStatus")
    intercept[IllegalArgumentException] {
      SchemaResolver.select(df, Seq("k" -> Seq("order_key"), "v" -> Seq("no_such")))
    }
    val ok = SchemaResolver.select(df, Seq("k" -> Seq("order_key")))
    assert(ok.columns.toSeq == Seq("k"))
  }

  // ------------------------------------------------------------- Quantize

  test("int8 quantization bounds the error at scale/2 and is exact on constants") {
    val vecs = Seq(
      (1L, Seq(0.0f, 0.5f, 1.0f, 0.25f)),
      (2L, Seq(3.0f, 3.0f, 3.0f, 3.0f)), // constant: scale 0, exact
      (3L, Seq(-1.0f, 1.0f, 0.123f, -0.456f))).toDF("vec_id", "embedding")
    val got = Quantize.report(vecs, "vec_id", "embedding")
      .as[(Long, Double, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got(2L)._3 == 0.0, "constant vector must quantize exactly")
    // worst-case per-element error is scale/2, so mse <= (scale/2)^2
    val scale1 = (got(1L)._2 - got(1L)._1) / 255.0
    assert(got(1L)._3 <= scale1 * scale1 / 4.0 + 1e-15)
    assert(got(3L)._1 == -1.0 && got(3L)._2 == 1.0)
  }

  test("quantize encode/decode round-trips within one step") {
    val df = Tables.embeddings(spark, sfDir)
    val v = col("embedding").cast("array<double>")
    val (vmin, _, scale) = Quantize.params(v)
    val codes = Quantize.encode(v, vmin, scale)
    val bad = df.select(
        array_max(Quantize.encode(v, vmin, scale)).as("mx"),
        array_min(Quantize.encode(v, vmin, scale)).as("mn"),
        aggregate(zip_with(v, Quantize.decode(codes, vmin, scale),
          (x, d) => abs(x - d)), lit(0.0), (a, e) => greatest(a, e)).as("maxerr"),
        ((array_max(v) - array_min(v)) / 255.0).as("scale"))
      .where(col("mx") > 255 || col("mn") < 0 || col("maxerr") > col("scale") * 0.5 + 1e-12)
    assert(bad.isEmpty, "codes in [0,255], per-element error <= scale/2")
  }

  // ------------------------------------------------------- KMeans.refit

  test("refit from trained centroids keeps or improves cohesion, cells aligned") {
    val emb = Tables.embeddings(spark, sfDir)
    val base = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = 3)
    val before = KMeans.meanAssignedCosine(emb, "vec_id", "embedding", base)
    // drifted slice: the same corpus re-weighted (deterministic subset)
    val drifted = emb.where(col("vec_id") % 3 =!= 0)
    val re = KMeans.refit(drifted, "vec_id", "embedding", base, iters = 2)
    assert(re.length == base.length, "refit must not re-create cells")
    val after = KMeans.meanAssignedCosine(drifted, "vec_id", "embedding", re)
    val still = KMeans.meanAssignedCosine(drifted, "vec_id", "embedding", base)
    assert(after >= still - 1e-9, "warm-started Lloyd's must not lose cohesion on the new slice")
    assert(before > 0 && after > 0)
  }
}

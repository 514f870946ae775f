package graft

import org.apache.spark.sql.functions._
import graft.functions.SpaceSaving

class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: key k (1..50) appears ceil(3000/k) times — a long
  // Zipf-ish head over more distinct keys than the sketch holds
  private val skewed: Seq[Long] =
    (1 to 50).flatMap(k => Seq.fill((3000 + k - 1) / k)(k.toLong))
  private val trueCounts: Map[Long, Long] =
    skewed.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def run(data: Seq[Long], capacity: Int, parts: Int): Seq[(Long, Long, Long)] =
    spark.createDataset(data).repartition(parts)
      .select(new SpaceSaving(capacity).toColumn.name("hh"))
      .head()

  test("exact regime: distinct keys within capacity reproduce groupBy counts") {
    val out = run(skewed, capacity = 64, parts = 8)
    assert(out.size == 50)
    out.foreach { case (k, est, err) =>
      assert(est == trueCounts(k), s"key $k: est $est != true ${trueCounts(k)}")
      assert(err == 0, s"no eviction may occur within capacity (key $k err $err)")
    }
  }

  test("eviction regime: every key above n/m survives with sound bounds") {
    val m = 16
    val n = skewed.size.toLong
    val out = run(skewed, capacity = m, parts = 8)
    assert(out.size <= m)
    val present = out.map(_._1).toSet
    trueCounts.filter(_._2 > n / m).keys.foreach(k =>
      assert(present.contains(k), s"heavy key $k (true ${trueCounts(k)} > ${n / m}) evicted"))
    out.foreach { case (k, est, err) =>
      val t = trueCounts(k)
      assert(est >= t, s"key $k: est $est under-counts true $t")
      assert(est - err <= t, s"key $k: lower bound ${est - err} exceeds true $t")
    }
  }

  test("merge is conservative for keys absent from a full summary") {
    val agg = new SpaceSaving(2)
    // summary a: full, keys 1,2; summary b: full, keys 2,3
    val a = Seq(1L, 1L, 2L).foldLeft(agg.zero)(agg.reduce)
    val b = Seq(2L, 3L, 3L).foldLeft(agg.zero)(agg.reduce)
    val m = agg.merge(a, b)
    // true totals: 1→2, 2→2, 3→2; n/m = 3, so NO key is guaranteed
    // presence — but every surviving counter's interval must contain
    // its true total, including keys absent from one full summary
    // (key 1 absent from b, key 3 absent from a: the absent side
    // contributes (min, min), keeping the bounds sound)
    val truth = Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
    assert(m.size <= 2)
    assert(m.nonEmpty)
    m.foreach { case (k, (c, e)) =>
      assert(c >= truth(k), s"key $k: count $c under-counts true ${truth(k)}")
      assert(c - e <= truth(k), s"key $k: lower bound ${c - e} exceeds true ${truth(k)}")
    }
  }

  test("partition count never changes the exact-regime answer") {
    val small = (1 to 8).flatMap(k => Seq.fill(k * 3)(k.toLong))
    val one = run(small, capacity = 32, parts = 1).toSet
    val many = run(small, capacity = 32, parts = 13).toSet
    assert(one == many, "exact regime must be partition-order invariant")
  }

  test("space-saving as a streaming aggregation equals the batch sketch (exact regime)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val data = (1 to 600).map(i => (i % 23).toLong)
    val in = MemoryStream[Long]
    in.addData(data.take(300): _*)
    val q = in.toDS()
      .select(new SpaceSaving(64).toColumn.name("hh"))
      .writeStream.outputMode("complete").format("memory").queryName("sshh").start()
    q.processAllAvailable()
    in.addData(data.drop(300): _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sshh").as[Seq[(Long, Long, Long)]].head().toSet
    val batch = spark.createDataset(data)
      .select(new SpaceSaving(64).toColumn.name("hh")).head().toSet
    assert(streamed == batch, "incremental counter state must equal the batch sketch")
  }
}

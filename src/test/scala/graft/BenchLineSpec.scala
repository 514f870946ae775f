package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The driver keeps only the last ~2000 chars of Bench stdout and parses
  * the last JSON line in them. Round 5 lost its per-query telemetry when
  * the full line outgrew that tail, so the driver-facing line must cap
  * itself regardless of how many queries future rounds add.
  */
class BenchLineSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  test("bounded line stays under the tail budget with 300 long-named queries") {
    val results = (1 to 300).map(i => (f"some_quite_long_query_name_$i%03d", i * 0.037))
    val line = Bench.boundedLine(results.map(_._2).sum, results, Seq.empty, "/root/testdata/sf0.1")
    assert(line.length <= Bench.MaxLineChars, s"line length ${line.length}")
    val node = mapper.readTree(line)
    assert(node.get("metric").asText == "total")
    assert(node.get("n_queries").asInt == 300)
    // slowest-first: the heaviest query must be listed, not omitted
    assert(node.get("queries").has("some_quite_long_query_name_300"))
    // listed + omitted reconciles with the total (to rounding)
    import scala.jdk.CollectionConverters._
    val listed = node.get("queries").properties().asScala.map(_.getValue.asDouble).sum
    val om = node.get("omitted")
    assert(om.get("n").asInt == 300 - node.get("queries").size())
    val recon = listed + om.get("sec").asDouble
    assert(math.abs(recon - node.get("value").asDouble) < 0.01 * 300, s"recon $recon")
  }

  test("small result sets fit entirely with omitted n=0") {
    val results = Seq(("q1_agg", 0.482), ("q3_join_agg", 1.203), ("q_topk", 0.231))
    val line = Bench.boundedLine(1.916, results, Seq.empty, "/root/testdata/sf0.01")
    val node = mapper.readTree(line)
    assert(node.get("queries").size() == 3)
    assert(node.get("omitted").get("n").asInt == 0)
    assert(node.get("omitted").get("sec").asDouble == 0.0)
  }

  test("empty results still produce a parseable line") {
    val line = Bench.boundedLine(0.0, Seq.empty, Seq.empty, "/x")
    val node = mapper.readTree(line)
    assert(node.get("n_queries").asInt == 0)
  }

  test("median-of-3 dispersion block rides the line and stays in budget") {
    val results = (1 to 303).map(i => (f"query_name_number_$i%03d", i * 0.01))
    val spreads = results.map { case (_, t) => t * 0.2 }
    val line = Bench.boundedLine(results.map(_._2).sum, results, Seq.empty,
      "/root/testdata/sf0.1", generation = "656d5f24",
      spreads = spreads, protocol = "median-of-3+tail20@5",
      worstSpread = Some(("query_name_number_303", Seq(2.42, 3.03, 5.95, 2.50, 2.61),
        Seq(120L, 95L, 2210L, 101L, 98L))))
    assert(line.length <= Bench.MaxLineChars, s"line length ${line.length}")
    val node = mapper.readTree(line)
    assert(node.get("protocol").asText == "median-of-3+tail20@5")
    val d = node.get("dispersion")
    assert(math.abs(d.get("max_spread").asDouble - 3.03 * 0.2) < 0.001)
    assert(d.get("n_over_0.3s").asInt == spreads.count(_ > 0.3))
    // the named outlier carries its raw attempts AND per-attempt GC time
    // for attribution (collector noise vs scheduler event)
    assert(d.get("worst").get("q").asText == "query_name_number_303")
    assert(d.get("worst").get("attempts").size == 5)
    assert(d.get("worst").get("gc_ms").size == 5)
    assert(d.get("worst").get("gc_ms").get(2).asLong == 2210L)
  }

  test("property: many-error, huge-total boards always stay under the budget") {
    import org.scalacheck.Gen
    val gen = for {
      nQ <- Gen.choose(0, 320)
      nameLen <- Gen.choose(3, 40)
      nErr <- Gen.choose(0, 200)
      mag <- Gen.oneOf(0.04, 7.3, 1234.5, 987654.321) // up to 9-digit totals
    } yield (nQ, nameLen, nErr, mag)
    val cases = (1 to 40).flatMap(i =>
      gen.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))
    assert(cases.nonEmpty)
    cases.foreach { case (nQ, nameLen, nErr, mag) =>
      val results = (1 to nQ).map(i => (("q" * nameLen) + i, i * mag))
      val failed = (1 to nErr).map(i => ("broken_query_name_" * 2) + i)
      val line = Bench.boundedLine(results.map(_._2).sum, results, failed, "/root/testdata/sf0.1")
      assert(line.length <= Bench.MaxLineChars,
        s"($nQ,$nameLen,$nErr,$mag): length ${line.length}")
      val node = mapper.readTree(line) // parseable JSON
      assert(node.get("n_queries").asInt == nQ)
      assert(node.get("errors").isArray)
      // every error is accounted for: listed + errors_omitted == nErr
      val listedErrs = node.get("errors").size()
      val omittedErrs = if (node.has("errors_omitted")) node.get("errors_omitted").asInt else 0
      assert(listedErrs + omittedErrs == nErr)
      // listed + omitted queries reconcile with the total
      import scala.jdk.CollectionConverters._
      val listed = node.get("queries").properties().asScala.map(_.getValue.asDouble).sum
      val recon = listed + node.get("omitted").get("sec").asDouble
      assert(math.abs(recon - node.get("value").asDouble) <= 0.002 * (nQ + 1), s"recon $recon")
    }
  }
}

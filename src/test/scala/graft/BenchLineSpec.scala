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
    val line = Bench.boundedLine(results.map(_._2).sum, results, "[]", "/root/testdata/sf0.1")
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
    val line = Bench.boundedLine(1.916, results, "[]", "/root/testdata/sf0.01")
    val node = mapper.readTree(line)
    assert(node.get("queries").size() == 3)
    assert(node.get("omitted").get("n").asInt == 0)
    assert(node.get("omitted").get("sec").asDouble == 0.0)
  }

  test("empty results still produce a parseable line") {
    val line = Bench.boundedLine(0.0, Seq.empty, "[]", "/x")
    val node = mapper.readTree(line)
    assert(node.get("n_queries").asInt == 0)
  }
}

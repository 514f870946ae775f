package graft

import org.scalatest.funsuite.AnyFunSuite

/** The measured-vs-carried protocol's r19 surface (r18 verdict #4 +
  * advice #2): per-entry testdata generation and implementing-source
  * fingerprints in the carry file, both formats parseable, and the
  * diff-keyed trigger's key→file resolution covering the whole board. */
class CarryProtocolSpec extends AnyFunSuite {

  test("readCarry parses v2 entries (gen+src) and pre-r19 entries (absent → empty)") {
    val f = java.io.File.createTempFile("carry", ".json")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath,
      """{"generated":"aabbccdd","queries":{""" +
        """"old_key":{"med":1.250,"spread":0.100,"plan_hash":"0123456789abcdef"},""" +
        """"new_key":{"med":2.500,"spread":0.050,"plan_hash":"fedcba9876543210","gen":"aabbccdd","src":"11223344"}}}""")
    val m = Bench.readCarry(f.getAbsolutePath)
    assert(m.size == 2)
    assert(m("old_key") == Bench.CarryEntry(1.25, 0.1, "0123456789abcdef", "", ""))
    assert(m("new_key") == Bench.CarryEntry(2.5, 0.05, "fedcba9876543210", "aabbccdd", "11223344"))
  }

  test("srcFingerprints resolves an implementing file for every registered key") {
    val fp = Bench.srcFingerprints()
    val keys = SparkEntry.queries.keySet
    assert(fp.keySet == keys,
      s"registry/src mismatch: missing=${(keys -- fp.keySet).take(5)} extra=${(fp.keySet -- keys).take(5)}")
    val unresolved = fp.filter(_._2.isEmpty).keys
    assert(unresolved.isEmpty,
      s"keys whose implementing def was not found in the entry files: ${unresolved.take(10)}")
    // fingerprints are file-level: two keys in the same file share one
    assert(fp.values.toSet.size < keys.size)
    assert(fp.values.forall(_.length == 8))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.etl.Features
import graft.similarity.VectorOps

/** Property checks for the pure (driver-side) kernels — manual Gen
  * sampling (no scalatest-scalacheck bridge in the offline cache). */
class PropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 200): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  test("snakeCase is idempotent and produces only [a-z0-9_]") {
    samples(Gen.asciiPrintableStr).foreach { s =>
      val once = Features.snakeCase(s)
      assert(Features.snakeCase(once) == once, s"input: $s")
      assert(once.matches("[a-z0-9_]*"), s"input: $s -> $once")
    }
  }

  test("hyperplanes are deterministic in the seed and within [-1, 1)") {
    val a = VectorOps.hyperplanes(16, 8, 42L)
    val b = VectorOps.hyperplanes(16, 8, 42L)
    val c = VectorOps.hyperplanes(16, 8, 43L)
    assert(a == b)
    assert(a != c)
    assert(a.flatten.forall(x => x >= -1.0 && x < 1.0))
  }

  test("SimHash64.compute edge cases and determinism") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    assert(graft.functions.SimHash64.compute(
      ArrayData.toArrayData(Array.fill(3)(-1L))) == -1L)
    assert(graft.functions.SimHash64.compute(ArrayData.toArrayData(Array.empty[Long])) == 0L)
    samples(Gen.listOfN(5, Gen.long), 100).foreach { xs =>
      val h1 = graft.functions.SimHash64.compute(ArrayData.toArrayData(xs.toArray))
      val h2 = graft.functions.SimHash64.compute(ArrayData.toArrayData(xs.toArray))
      assert(h1 == h2)
    }
  }

  test("VectorExprs.dot matches the naive sum on small vectors") {
    import org.apache.spark.sql.catalyst.util.ArrayData
    samples(Gen.listOfN(8, Gen.choose(-100.0, 100.0)), 100).foreach { xs =>
      val arr = ArrayData.toArrayData(xs.toArray)
      val got = graft.functions.VectorExprs.dot(arr, arr)
      val want = xs.foldLeft(0.0)((acc, x) => acc + x * x)
      assert(got == want) // same sequential order -> bit-identical
    }
  }

  test("word shingles: count bounds, determinism, sub-k empty") {
    import org.apache.spark.unsafe.types.UTF8String
    samples(Gen.listOf(Gen.oneOf("a", "b", "c", "dd")), 200).foreach { ws =>
      val text = UTF8String.fromString(ws.mkString(" "))
      val sh = graft.functions.VectorExprs.shingles(text, 3)
      if (ws.length < 3) assert(sh.numElements() == 0)
      else {
        assert(sh.numElements() <= ws.length - 2 && sh.numElements() >= 1)
        val again = graft.functions.VectorExprs.shingles(text, 3)
        assert(sh.numElements() == again.numElements())
      }
    }
  }
}

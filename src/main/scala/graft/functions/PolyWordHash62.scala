package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable 62-bit word hash, the cheap successor to the
  * md5-nibble [[graft.dedup.Dedup.portableWordHash]]: two independent
  * polynomial hashes over the word's Unicode code points in the
  * Mersenne field 2^31-1, each put through the same xor-shift temper as
  * [[Sketches.temperedHash]], packed into bits 0..61 of a BIGINT. Every
  * intermediate stays below 2^41 and the whole pipeline is BIGINT
  * `*`/`%`/xor/shift, so a SQL oracle rederives it code-point-by-code-
  * point (`list_reduce` over `ord(split(w,''))` — see
  * SparkEntry.dedupSimhashSql) — no md5 on the hot path, which is what
  * made the md5-nibble variant 8× more expensive per word.
  *
  * 62 of 64 bits carry signal (bits 62/63 are always 0, so SimHash vote
  * sums there are all-negative and those output bits are 0 on both
  * engines — the same accepted top-bit caveat as the 60-bit md5 form);
  * Hamming geometry within the used bits is unchanged.
  *
  * A native codegen'd expression so the per-word hash stays inside the
  * whole-stage-codegen'd scan projection (ref: reference repo
  * transform.py:1-40 computes no hashes — dedup is beyond the
  * reference's single-node scope; this is the scale path).
  */
case class PolyWordHash62(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"poly_word_hash62 needs string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    PolyWordHash62.compute(input.asInstanceOf[UTF8String])

  // Kernel deliberately not named `eval` (see SimHash64's forwarder note).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyWordHash62.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyWordHash62 =
    copy(child = newChild)
}

object PolyWordHash62 {
  /** Mersenne prime 2^31-1, the shared sketch field modulus. */
  val P = 2147483647L

  /** acc := (acc·m + codepoint) mod P over the string's code points
    * (code points, not UTF-16 chars, to match SQL `ord` semantics for
    * astral-plane input). acc < 2^31 and m < 2^10 keep the product
    * below 2^41 — BIGINT-safe on any engine. Empty string → 0. */
  def poly(s: String, m: Long): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * m + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** The [[Sketches]] xor-shift temper: breaks the arithmetic-
    * progression lattice a plain polynomial hash leaves in its low
    * bits. Identical constants to the Column form so one definition
    * serves every oracle replay. */
  def temper(h: Long, a2: Long): Long = {
    val h2 = h ^ (h >>> 15)
    val h3 = (h2 * a2) % P
    h3 ^ (h3 >>> 13)
  }

  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): Long = {
    val str = s.toString
    temper(poly(str, 131L), 786433L) * 2147483648L + temper(poly(str, 137L), 65537L)
  }

  def poly_word_hash62(c: Column): Column =
    ColumnBridge.column(PolyWordHash62(ColumnBridge.expression(c)))
}

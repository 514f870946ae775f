package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * standard first step of any text-corpus pipeline (fold combining
  * sequences to precomposed forms so hashing/dedup/tokenization see one
  * canonical byte string per grapheme). A codegen'd expression rather
  * than a UDF so it stays inside whole-stage codegen on the scan
  * projection.
  *
  * Fast path: a pure-ASCII string (numBytes == numChars in UTF-8) is
  * already NFC by construction and is returned as-is without ever
  * materializing a java.lang.String — on a mostly-ASCII web corpus the
  * normalizer cost is paid only by the rows that need it.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  // Kernel deliberately not named `eval` — see the SimHash64 note on
  // static-forwarder suppression under codegen.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    if (s.numBytes() == s.numChars()) return s // pure ASCII: already NFC
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column = ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}

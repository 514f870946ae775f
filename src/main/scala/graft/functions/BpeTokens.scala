package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Merge-table BPE token counting as a native codegen'd expression —
  * training-data budgets are set in BPE tokens, not whitespace tokens,
  * so the curation pipeline needs a real subword count on the scan
  * projection (TextFunctions.bpeTokenEstimate stays as the cheap regex
  * upper bound).
  *
  * The tokenizer is deterministic rule-ordered leftmost-greedy BPE over
  * a FIXED public merge table ([[BpeTokens.Merges]] — 32 high-frequency
  * English pairs in classic BPE style): each word is exploded to
  * space-separated code-point units (" t h e "), then every merge rule
  * in table order rewrites " a b " → " ab " with TWO passes of plain
  * leftmost non-overlapping literal replacement. The double pass is
  * load-bearing: one pass can skip an occurrence whose leading space
  * was consumed by the immediately preceding match (" a b a b " merges
  * pairs 1 and 3 only); after it, every skipped occurrence is flanked
  * by already-merged tokens, so the second pass is complete. Two
  * literal passes are EXACTLY SQL `replace(replace(s, p, r), p, r)` —
  * the whole tokenizer replays in any engine as a nested replace chain
  * (the etl_url_normalize portable-string-algebra recipe), which is
  * what puts the [q] key under the full hash oracle.
  *
  * Empty words (doubled separators) contribute zero tokens; the SQL
  * side filters them the same way. Code-point iteration (not UTF-16
  * chars) matches SQL split-by-'' semantics for astral input. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count needs string, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeTokens.countTokens(input.asInstanceOf[UTF8String])

  // kernel deliberately not named `eval` (see SimHash64's forwarder note)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeTokens.countTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokens {

  /** Fixed public merge table, applied in order. Later rules may
    * consume earlier rules' outputs (t+h → th, th+e → the). */
  val Merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "an" -> "d",
    "e" -> "r", "o" -> "n", "r" -> "e", "o" -> "r", "e" -> "n",
    "a" -> "t", "e" -> "s", "s" -> "t", "a" -> "r", "o" -> "u",
    "l" -> "e", "i" -> "s", "i" -> "t", "a" -> "l", "e" -> "d",
    "in" -> "g", "t" -> "o", "o" -> "f", "c" -> "h", "s" -> "e",
    "l" -> "l", "m" -> "e", "d" -> "e", "h" -> "i", "u" -> "n",
    "w" -> "h", "th" -> "at")

  /** One word → BPE token list (library/test surface; the hot path is
    * [[countTokens]], which skips materializing the list). */
  def tokenize(word: String): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var s = spacedUnits(word)
    Merges.foreach { case (a, b) =>
      val pat = s" $a $b "
      val rep = s" $a$b "
      s = replaceAll(replaceAll(s, pat, rep), pat, rep)
    }
    s.trim.split(' ').toSeq
  }

  /** Whole-document BPE token count: Σ over whitespace words. */
  def countTokens(text: UTF8String): Long = {
    val t = text.toString
    var total = 0L
    var start = 0
    var i = 0
    while (i <= t.length) {
      if (i == t.length || t.charAt(i) == ' ') {
        if (i > start) total += wordTokenCount(t.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    total
  }

  private def wordTokenCount(word: String): Long = {
    var s = spacedUnits(word)
    Merges.foreach { case (a, b) =>
      val pat = s" $a $b "
      val rep = s" $a$b "
      s = replaceAll(replaceAll(s, pat, rep), pat, rep)
    }
    // single-space separation is preserved by construction: tokens are
    // the separator count minus the two sentinels
    var n = 0L
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') n += 1; i += 1 }
    n - 1
  }

  /** " c o d e " — code-point units with sentinel spaces. */
  private def spacedUnits(word: String): String = {
    val sb = new java.lang.StringBuilder(word.length * 2 + 2)
    sb.append(' ')
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      sb.appendCodePoint(cp)
      sb.append(' ')
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** Literal leftmost non-overlapping replace — the exact SQL
    * `replace()` contract (String.replace matches it, spelled out here
    * so the kernel's semantics are self-evident). */
  private def replaceAll(s: String, pat: String, rep: String): String =
    s.replace(pat, rep)

  def bpe_token_count(c: Column): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(c)))
}

// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of GPT-2-shaped pre-tokenizer matches
  * (`TextAnalysis.bpePattern`) in one byte pass — a hand lexer for
  * the exact alternation
  * `'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+`.
  *
  * The alternation is TOTAL (every character belongs to some branch),
  * so `regexp_count` degenerates to a deterministic lexer: at each
  * match start the first branch (in pattern order) that matches wins,
  * greedy within the branch, and the next match starts where the
  * previous ended. That lexer is reproduced directly: contraction
  * suffixes first (at an apostrophe), then the optionally
  * space-prefixed letter/digit/other runs, then the whitespace run.
  * `[A-Za-z0-9]` and `\s` are ASCII in Java regex, and UTF-8
  * multibyte bytes (≥ 0x80) always fall in the `[^\sA-Za-z0-9]`
  * class, so byte-level scanning matches the regex on any Unicode
  * input; runs count once however long, so counting bytes ≡ counting
  * chars. Spec-pinned equal to `regexp_count` on adversarial soup;
  * the DuckDB oracle keeps the regex spelling. */
case class BpeTokenCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_token_count"

  override protected def nullSafeEval(input: Any): Any =
    BpeTokenCountImpl.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BpeTokenCountImpl.count($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCountImpl {

  @inline private def isLetter(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
  @inline private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'
  // Java regex \s = [ \t\n\x0B\f\r] (ASCII-only by default).
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
  // [^\sA-Za-z0-9]: anything else, including apostrophes and every
  // UTF-8 multibyte byte (all ≥ 0x80, i.e. negative as signed bytes).
  @inline private def isOther(b: Byte): Boolean =
    !isWs(b) && !isLetter(b) && !isDigit(b)

  /** Length of the contraction branch matching at apostrophe `i`
    * (branch order 's 't 're 've 'm 'll 'd), or 0. */
  @inline private def contractionLen(bytes: Array[Byte], i: Int): Int = {
    val n = bytes.length
    if (i + 1 >= n) return 0
    val b1 = bytes(i + 1)
    if (b1 == 's' || b1 == 't') return 2
    if (i + 2 < n) {
      val b2 = bytes(i + 2)
      if ((b1 == 'r' && b2 == 'e') || (b1 == 'v' && b2 == 'e') ||
        (b1 == 'l' && b2 == 'l')) return 3
    }
    if (b1 == 'm' || b1 == 'd') return 2
    0
  }

  /** End offset (exclusive) of the pre-token starting at byte `i` —
    * the single-branch step of the lexer, shared by [[count]] and the
    * true-BPE encoder's segmentation ([[BpeTable.encode]]), so the
    * two can never disagree on pre-token boundaries. */
  def tokenEnd(bytes: Array[Byte], i0: Int): Int = {
    val n = bytes.length
    val b = bytes(i0)
    var i = i0
    if (b == '\'' && contractionLen(bytes, i) > 0) {
      i += contractionLen(bytes, i)
    } else if (b == ' ' && i + 1 < n && isLetter(bytes(i + 1))) {
      i += 2; while (i < n && isLetter(bytes(i))) i += 1
    } else if (b == ' ' && i + 1 < n && isDigit(bytes(i + 1))) {
      i += 2; while (i < n && isDigit(bytes(i))) i += 1
    } else if (b == ' ' && i + 1 < n && isOther(bytes(i + 1))) {
      i += 2; while (i < n && isOther(bytes(i))) i += 1
    } else if (isLetter(b)) {
      i += 1; while (i < n && isLetter(bytes(i))) i += 1
    } else if (isDigit(b)) {
      i += 1; while (i < n && isDigit(bytes(i))) i += 1
    } else if (isWs(b)) {
      i += 1; while (i < n && isWs(bytes(i))) i += 1
    } else {
      i += 1; while (i < n && isOther(bytes(i))) i += 1
    }
    i
  }

  /** See [[BpeTokenCount]]. Static for codegen. */
  def count(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    var i = 0
    var tokens = 0L
    while (i < n) {
      i = tokenEnd(bytes, i)
      tokens += 1L
    }
    tokens
  }
}

object BpeTokenCountColumns {
  def bpeTokenCount(text: Column): Column =
    ExpressionUtils.column(BpeTokenCount(ExpressionUtils.expression(text)))
}

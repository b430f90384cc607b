// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** True vocab-merge BPE encoding: pre-tokenize with the GPT-2-shaped
  * lexer ([[BpeTokenCountImpl.tokenEnd]] — the SAME branch logic as
  * `bpe_token_count`, so pre-token boundaries can never disagree),
  * then greedily apply a ranked merge list to each pre-token's
  * codepoint sequence: repeatedly find the lowest-rank adjacent
  * symbol pair present and merge ALL its leftmost non-overlapping
  * occurrences, until no ranked pair remains (the classic encoder
  * loop, e.g. Sennrich et al. 2016 / the GPT-2 reference `bpe()`).
  *
  * Symbols are Unicode codepoints (not bytes), so every emitted token
  * is a valid string on any input; byte-level BPE is a documented
  * variant, not implemented. Merge ranks broadcast with the plan via
  * `addReferenceObj` — model size is vocab-bounded (≤ numMerges
  * entries), never corpus-bounded, so the operator is a zero-shuffle
  * projection at any corpus scale. A per-thread word→tokens cache
  * exploits the zipfian word distribution (the reference GPT-2
  * encoder does the same); results are cache-independent.
  *
  * Concatenating the output tokens reproduces the input text exactly
  * (merges re-segment, never rewrite) — spec-pinned as a property. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  require(merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
    "merge pair sides must be non-empty")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  @transient private lazy val table = BpeTable.build(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeTable.encode(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BpeTable.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
object BpeEncodeColumns {
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeEncode(ExpressionUtils.expression(text), merges))
}

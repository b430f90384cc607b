// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** True vocab-merge BPE encoding: pre-tokenize with the GPT-2-shaped
  * lexer ([[BpeTokenCountImpl.tokenEnd]] — the SAME branch logic as
  * `bpe_token_count`, so pre-token boundaries can never disagree),
  * then greedily apply a ranked merge list to each pre-token's symbol
  * sequence: repeatedly find the lowest-rank adjacent symbol pair
  * present and merge ALL its leftmost non-overlapping occurrences,
  * until no ranked pair remains (the classic encoder loop, e.g.
  * Sennrich et al. 2016 / the GPT-2 reference `bpe()`).
  *
  * Two symbol alphabets: the default splits pre-tokens into Unicode
  * CODEPOINTS (every token a valid string, concat reproduces the
  * input exactly); `byteLevel = true` splits into UTF-8 BYTES mapped
  * through the GPT-2 byte↔unicode alphabet ([[BpeBytes]] — space ↦
  * 'Ġ' etc.), the representation real GPT-2-family vocabularies use;
  * [[BpeByteDecode]] inverts it losslessly. Merge ranks broadcast
  * with the plan via `addReferenceObj` — model size is vocab-bounded
  * (≤ numMerges entries), never corpus-bounded, so the operator is a
  * zero-shuffle projection at any corpus scale. A per-thread
  * word→tokens cache exploits the zipfian word distribution (the
  * reference GPT-2 encoder does the same); results are
  * cache-independent. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
    byteLevel: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {
  require(merges.forall { case (l, r) => l.nonEmpty && r.nonEmpty },
    "merge pair sides must be non-empty")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode"

  @transient private lazy val table = BpeTable.build(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeTable.encode(input.asInstanceOf[UTF8String], table, byteLevel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.BpeTable.encode($c, $ref, $byteLevel)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

/** Inverse of byte-level [[BpeEncode]]: token array → original string
  * (mapped chars translated back to their bytes). Null for arrays
  * containing chars outside the byte alphabet. */
case class BpeByteDecode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_byte_decode"

  override protected def nullSafeEval(input: Any): Any =
    BpeTable.decodeBytes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Not defineCodeGen: decodeBytes returns null for tokens outside
    // the byte alphabet, which must propagate as SQL NULL.
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.sql.graft.BpeTable.decodeBytes($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
         |""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): BpeByteDecode =
    copy(child = newChild)
}

object BpeEncodeColumns {
  def bpeEncode(text: Column, merges: Seq[(String, String)],
      byteLevel: Boolean = false): Column =
    ExpressionUtils.column(
      BpeEncode(ExpressionUtils.expression(text), merges, byteLevel))

  def bpeByteDecode(tokens: Column): Column =
    ExpressionUtils.column(BpeByteDecode(ExpressionUtils.expression(tokens)))
}

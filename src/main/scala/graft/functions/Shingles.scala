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

/** Word n-gram shingles of a document in one native pass:
  * `trim → lowercase → split(\s+) → join n-grams with ' '` — the exact
  * routines behind the declarative
  * `TextOps.shingles(TextOps.tokens(text), n)` spelling
  * (UTF8String.trim/toLowerCase/splitSQL/concatWs are what Spark's
  * trim/lower/split/array_join expressions call), so outputs are
  * byte-identical and the DuckDB oracles keep matching.
  *
  * The declarative spelling evaluates a `transform` lambda per shingle
  * position (slice + array_join allocations inside an interpreted
  * higher-order function) — at ~300 positions per document that made
  * shingling, not joining, the dominant cost of the whole n-gram dedup
  * family. Documents shorter than n tokens shingle to an empty array,
  * matching the declarative guard. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesImpl.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordShinglesImpl.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShinglesImpl {
  private val Whitespace = UTF8String.fromString("\\s+")
  private val Space = UTF8String.fromString(" ")

  /** See [[WordShingles]]. Static so generated code can call it
    * without captured references. */
  def shingles(s: UTF8String, n: Int): GenericArrayData = {
    val toks = s.trim().toLowerCase().split(Whitespace, -1)
    if (toks.length < n)
      return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      val slice = new Array[UTF8String](n)
      System.arraycopy(toks, i, slice, 0, n)
      out(i) = UTF8String.concatWs(Space, slice: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object WordShinglesColumns {
  def wordShingles(text: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), n))
}

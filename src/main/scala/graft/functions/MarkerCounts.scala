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

/** Per-language marker-word occurrence counts in one tokenize pass:
  * `counts[l] = Σ_tokens [token ∈ words(l)]` — the stopword-ratio /
  * marker-language-ID hot loop.
  *
  * The declarative spelling runs one interpreted
  * `filter(tokens, t => array_contains(...))` higher-order function
  * per language — a lambda invocation per token per language. This
  * expression tokenizes once (same trim → lowercase → split(\s+)
  * routine as [[WordShingles]], i.e. the exact arithmetic of
  * `TextOps.tokens`) and resolves each token through one hash map
  * whose values carry every language the word marks, so a word shared
  * by two marker lists counts toward both — exactly as the
  * independent HOFs would. */
case class MarkerCounts(child: Expression, langs: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {
  require(langs.nonEmpty && langs.forall(_.nonEmpty), "marker lists required")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "marker_counts"

  @transient private lazy val table = MarkerTable.build(langs)

  override protected def nullSafeEval(input: Any): Any =
    MarkerTable.compute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerTable", table,
      classOf[MarkerTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MarkerTable.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): MarkerCounts =
    copy(child = newChild)
}

/** Prepared word table: token → indices of every language whose
  * marker list contains it. */
final class MarkerTable(
    val nLangs: Int,
    val wordLangs: java.util.HashMap[UTF8String, Array[Int]]) extends Serializable

object MarkerTable {
  private val Whitespace = UTF8String.fromString("\\s+")

  def build(langs: Seq[Seq[String]]): MarkerTable = {
    val map = new java.util.HashMap[UTF8String, Array[Int]]()
    langs.zipWithIndex.foreach { case (words, l) =>
      // distinct: a word listed twice for one language must still count
      // each token occurrence once (parity with the filter-HOF twin).
      words.distinct.foreach { w =>
        map.merge(UTF8String.fromString(w), Array(l), (a, x) => a ++ x)
      }
    }
    new MarkerTable(langs.size, map)
  }

  /** See [[MarkerCounts]]. Static for codegen. */
  def compute(s: UTF8String, t: MarkerTable): GenericArrayData = {
    val toks = s.trim().toLowerCase().split(Whitespace, -1)
    val counts = new Array[Long](t.nLangs)
    var i = 0
    while (i < toks.length) {
      val hits = t.wordLangs.get(toks(i))
      if (hits != null) {
        var j = 0
        while (j < hits.length) { counts(hits(j)) += 1L; j += 1 }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

object MarkerCountsColumns {
  def markerCounts(text: Column, langs: Seq[Seq[String]]): Column =
    ExpressionUtils.column(MarkerCounts(ExpressionUtils.expression(text), langs))
}

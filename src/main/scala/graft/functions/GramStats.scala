// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document word n-gram repetition statistics in ONE native pass:
  * `{n_grams, n_distinct_grams, top_gram_frac, dup_gram_frac}` — the
  * Gopher repetition-filter signals.
  *
  * The statistic is per-document, so computing it with
  * `explode(shingles) → groupBy(doc_id, gram) → groupBy(doc_id)` —
  * the relational spelling the DuckDB oracle uses — shuffles EVERY
  * GRAM OCCURRENCE of the corpus twice to answer a question each
  * document can answer alone. At 100 TB that is a ~100 TB shuffle for
  * an embarrassingly parallel projection. This expression counts
  * grams in a per-row hash map instead (shingling via
  * [[WordShinglesImpl]], byte-identical to the declarative spelling),
  * and the fractions are the same IEEE double divisions of the same
  * integers the relational plan produces — so the oracle keeps
  * hash-matching while the plan drops from two exchanges to zero.
  *
  * Documents with fewer than `n` tokens report all-zero stats
  * (callers filter `n_grams > 0` to mirror the relational/unnest
  * semantics that drop them). */
case class GramStats(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "gram size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = GramStats.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_stats"

  override protected def nullSafeEval(input: Any): Any =
    GramStats.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GramStats.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)
}

/** [[GramStats]] over a PRE-TOKENIZED array ([[WordTokens]] column):
  * the token-index path — same statistics, zero re-tokenize. */
case class ArrayGramStats(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "gram size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = GramStats.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "array_gram_stats"

  override protected def nullSafeEval(input: Any): Any =
    GramStats.computeFromTokens(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.GramStats.computeFromTokens($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ArrayGramStats =
    copy(child = newChild)
}

object GramStats {
  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct_grams", LongType, nullable = false),
    StructField("top_gram_frac", DoubleType, nullable = false),
    StructField("dup_gram_frac", DoubleType, nullable = false)))

  /** See [[GramStats]]. Static for codegen. */
  def compute(text: UTF8String, n: Int): InternalRow =
    statsOf(WordShinglesImpl.shingles(text, n))

  /** See [[ArrayGramStats]]. Static for codegen. */
  def computeFromTokens(
      arr: org.apache.spark.sql.catalyst.util.ArrayData, n: Int): InternalRow =
    statsOf(WordShinglesImpl.shinglesFromTokens(arr, n))

  private def statsOf(grams: org.apache.spark.sql.catalyst.util.GenericArrayData): InternalRow = {
    val total = grams.numElements()
    val row = new GenericInternalRow(4)
    if (total == 0) {
      row.setLong(0, 0L); row.setLong(1, 0L)
      row.setDouble(2, 0.0); row.setDouble(3, 0.0)
      return row
    }
    val counts = new java.util.HashMap[AnyRef, Int](total * 2)
    var maxCount = 0
    var i = 0
    while (i < total) {
      val g = grams.get(i, StringType)
      val c = counts.merge(g, 1, (a, b) => a + b)
      if (c > maxCount) maxCount = c
      i += 1
    }
    val distinct = counts.size()
    row.setLong(0, total.toLong)
    row.setLong(1, distinct.toLong)
    row.setDouble(2, maxCount.toDouble / total.toDouble)
    row.setDouble(3, (total - distinct).toDouble / total.toDouble)
    row
  }
}

object GramStatsColumns {
  def gramStats(text: Column, n: Int): Column =
    ExpressionUtils.column(GramStats(ExpressionUtils.expression(text), n))
  def arrayGramStats(tokens: Column, n: Int): Column =
    ExpressionUtils.column(ArrayGramStats(ExpressionUtils.expression(tokens), n))
}

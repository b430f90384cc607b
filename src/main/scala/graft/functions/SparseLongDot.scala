// Hosted under org.apache.spark.sql.graft like the other native
// expressions (VecMath et al.): Catalyst bridge pieces of the public
// jars are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Exact sparse long dot of a per-doc item array against a LITERAL
  * long weight vector: `Σ_items weights[bk + 1] * c` over items
  * `struct<bk INT, c BIGINT, ...>` (slot 0 of the weight vector is
  * the intercept bucket −1 — the [[graft.ops.TextAnalysis
  * .classifierTrain]] layout).
  *
  * This is the margin fold of the classifier trainer's iteration
  * loop. The declarative spelling —
  * `aggregate(items, 0L, (acc, x) -> acc + element_at(wLit, x.bk + 2)
  * * x.c)` — is a higher-order function, which Catalyst evaluates by
  * interpreting the lambda per ITEM (HOFs are CodegenFallback):
  * at corpus-items × 12 iterations that interpretation is the loop's
  * dominant CPU. This expression is one primitive loop inside
  * WholeStageCodegen with identical arithmetic:
  * `Math.addExact`/`multiplyExact` reproduce the HOF-under-ANSI
  * contract that a signed-64 overflow fails LOUDLY (the scaladoc'd
  * |w|·n_doc magnitude bound), and an out-of-range bucket throws like
  * ANSI `element_at` instead of silently reading garbage. Long sums
  * are order-free, so the fold is bit-identical to the HOF spelling
  * (spec-pinned in OpsSpec). */
case class SparseLongDot(child: Expression,
    weights: scala.collection.immutable.ArraySeq[Long])
    extends UnaryExpression with ExpectsInputTypes {

  // Immutable ArraySeq so equals/hashCode compare contents (the
  // MatrixRowDot rationale: reference-compared Array fields break
  // semanticEquals / CSE).
  @transient private lazy val weightsArr: Array[Long] = weights.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(
    ArrayType(StructType(Seq(
      StructField("bk", IntegerType),
      StructField("c", LongType),
      StructField("nd", LongType)))))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sparse_long_dot"

  override protected def nullSafeEval(input: Any): Any =
    SparseLongDotImpl.dot(input.asInstanceOf[ArrayData], weightsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weightsArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SparseLongDotImpl.dot($c, $w)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): SparseLongDot = copy(child = newChild)
}

object SparseLongDotImpl {
  /** See [[SparseLongDot]]. Static for codegen. */
  def dot(items: ArrayData, weights: Array[Long]): Long = {
    val n = items.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val item = items.getStruct(i, 3)
      val slot = item.getInt(0) + 1
      if (slot < 0 || slot >= weights.length)
        throw new ArrayIndexOutOfBoundsException(
          s"sparse_long_dot: bucket ${slot - 1} outside weight table of " +
            s"${weights.length - 1} buckets")
      s = Math.addExact(s, Math.multiplyExact(weights(slot), item.getLong(1)))
      i += 1
    }
    s
  }
}

object SparseLongDotColumns {
  def sparseLongDot(items: Column, weights: Array[Long]): Column =
    ExpressionUtils.column(SparseLongDot(
      ExpressionUtils.expression(items),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(weights.clone())))
}

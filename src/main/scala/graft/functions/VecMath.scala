// Hosted under org.apache.spark.sql so the expression can use the
// private[sql] pieces of the public-jar Catalyst API (TypeCollection,
// ExpressionUtils.column). Only this file lives in the Spark package
// space; the public surface is graft.functions.VecMath below.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native codegen'd dot product over `ARRAY<FLOAT>` / `ARRAY<DOUBLE>`.
  *
  * The declarative spelling `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * is semantically right but evaluates one Catalyst lambda call per
  * element — at N² pairs × 64 dims that interpretation overhead
  * dominates the whole similarity stage. This expression compiles to a
  * tight primitive `for` loop inside WholeStageCodegen (no boxing, no
  * per-element virtual calls) and keeps the exact same left-to-right
  * double-precision summation order, so results are bit-identical to
  * the higher-order-function spelling on every run and partitioning.
  *
  * Null handling: null array → null (nullIntolerant); mismatched
  * lengths → null (same as the zip_with spelling, which pads with null
  * and poisons the sum — a malformed embedding must not dot to a
  * plausible finite number). The bit-identical claim is for non-null
  * *elements*: the loop reads a null element as 0.0, where the
  * higher-order spelling yields null (the corpus schema carries none —
  * containsNull is metadata-only from parquet).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // Nullable even over non-null inputs: mismatched lengths yield null,
  // so codegen must own a real isNull slot.
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val leftFloat = elemType(left) == FloatType
    val rightFloat = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def get(arr: String, t: DataType) =
        if (t == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${get(a, elemType(left))} * ${get(b, elemType(right))};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDotColumns {
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      VecDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

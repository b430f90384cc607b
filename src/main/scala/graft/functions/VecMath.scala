// Hosted under org.apache.spark.sql so the expression can use the
// private[sql] pieces of the public-jar Catalyst API (TypeCollection,
// ExpressionUtils.column). Only this file lives in the Spark package
// space; the public surface is graft.functions.VecMath below.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
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

/** Unit-normalized double copy of a float/double vector in one pass:
  * `out[i] = v[i] / sqrt(Σ v[j]²)` — the normalization every cosine
  * path runs before dotting.
  *
  * The declarative spelling projects `sqrt(vec_dot(e, e))` and then
  * evaluates a `transform` lambda per element for the division — an
  * interpreted per-element call on every embedding row of every
  * similarity query. This loop is bit-identical: the norm is the same
  * left-to-right summation [[VecDot]] computes (then the same sqrt),
  * and each division is the identical IEEE operation, so every
  * downstream cosine — including the hash-exact oracle queries —
  * is unchanged. Zero vectors are the one DELIBERATE deviation: the
  * lambda's division throws DIVIDE_BY_ZERO under Spark 4 ANSI mode,
  * while this loop yields IEEE NaN — a corrupt embedding should score
  * as garbage downstream, not kill the job (spec pins both
  * behaviors). Null elements read as 0.0 (same caveat as [[VecDot]];
  * the corpus schema carries none). */
case class VecUnit(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_unit"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    VecUnitImpl.unit(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.VecUnitImpl.unit($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): VecUnit =
    copy(child = newChild)
}

object VecUnitImpl {
  /** See [[VecUnit]]. Static for codegen. */
  def unit(v: ArrayData, isFloat: Boolean): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      out(i) = x
      s += x * x
      i += 1
    }
    val norm = math.sqrt(s)
    i = 0
    while (i < n) { out(i) = out(i) / norm; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VecUnitColumns {
  def vecUnit(v: Column): Column =
    ExpressionUtils.column(VecUnit(ExpressionUtils.expression(v)))
}

/** Dot of a vector with ONE row of a LITERAL matrix, selected per row
  * by an index column: `Σ v[i] · matrix[row·dim + i]` — the
  * dot-against-own-centroid of `Similarity.outlierScores`.
  *
  * The declarative spelling is a `when(cid === 0, dot₀).when(cid === 1,
  * dot₁)…` chain: O(k) branch tests per row and a plan whose SIZE
  * grows with k — fine at k ≈ 10, pathological at k in the hundreds
  * (the IVF cluster counts a 100 TB corpus wants). This expression is
  * one O(dim) loop per row against a broadcast-referenced `double[]`,
  * independent of k, with the same left-to-right summation as
  * [[VecDot]] so scores are bit-identical to the chain.
  *
  * Row index out of range (or an empty matrix) yields NaN — the
  * when-chain's `otherwise(NaN)`; a vector whose length ≠ `dim` yields
  * null — [[VecDot]]'s mismatched-length contract. */
case class MatrixRowDot(left: Expression, right: Expression,
    matrix: scala.collection.immutable.ArraySeq[Double], dim: Int)
    extends BinaryExpression with ExpectsInputTypes {

  // The matrix rides as an immutable ArraySeq so the case-class
  // equals/hashCode compare CONTENTS — an Array field is
  // reference-compared, which would break semanticEquals /
  // canonicalization / CSE for structurally identical expressions.
  // Eval and codegen use the primitive array view.
  @transient private lazy val matrixArr: Array[Double] = matrix.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)), IntegerType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "matrix_row_dot"

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val row = b.asInstanceOf[Int]
    if (dim <= 0 || row < 0 || (row + 1L) * dim > matrixArr.length)
      return Double.NaN
    if (v.numElements() != dim) return null
    var s = 0.0
    var i = 0
    val off = row * dim
    while (i < dim) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      s += x * matrixArr(off + i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matrix", matrixArr, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val off = ctx.freshName("off")
      val get =
        if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |if ($dim <= 0 || $b < 0 || ($b + 1L) * $dim > $m.length) {
         |  ${ev.value} = Double.NaN;
         |} else if ($a.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  int $off = $b * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $s += $get * $m[$off + $i];
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatrixRowDot =
    copy(left = newLeft, right = newRight)
}

object MatrixRowDotColumns {
  def matrixRowDot(v: Column, row: Column,
      matrix: Array[Double], dim: Int): Column =
    ExpressionUtils.column(MatrixRowDot(
      ExpressionUtils.expression(v), ExpressionUtils.expression(row),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(matrix.clone()), dim))
}

/** Max micro-rounded cosine of a vector against EVERY row of a literal
  * matrix, plus the argmax row: `struct<max_micros BIGINT, row INT>`
  * where `micros(r) = floor((Σᵢ v[i]·m[r·dim+i]) / (norm · norms[r])
  * · 1e6 + 0.5)` and ties keep the FIRST (lowest) row. The scan side
  * of semantic decontamination: one O(rows·dim) primitive loop per
  * corpus vector against a broadcast-referenced `double[]` — no join,
  * no shuffle, no plan growth with the eval-set size.
  *
  * The arithmetic sequence (left-to-right [[VecDot]] sum, ONE divide
  * by the norm product, `·1e6`, `+0.5`, floor) is exactly the
  * declarative join spelling's `floor(vec_dot(a,b)/(na·nb)·1e6+0.5)`,
  * so verdicts are bit-identical to the exact-join baseline
  * (spec-pinned), and the micro-rounding makes max/argmax an INTEGER
  * comparison — no float-tie ambiguity for an oracle to trip on.
  *
  * `norm` must be the caller's `vec_norm` of the same vector; a
  * non-positive norm (zero/corrupt vector) or a length ≠ `dim` yields
  * null — an unembeddable vector has no meaningful nearest eval item.
  * An empty matrix yields `row = -1` (caller maps to "no flag"). The
  * caller must exclude zero-norm MATRIX rows at build time. */
case class MatrixMaxCos(left: Expression, right: Expression,
    matrix: scala.collection.immutable.ArraySeq[Double],
    norms: scala.collection.immutable.ArraySeq[Double], dim: Int)
    extends BinaryExpression with ExpectsInputTypes {

  @transient private lazy val matrixArr: Array[Double] = matrix.toArray
  @transient private lazy val normsArr: Array[Double] = norms.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)), DoubleType)
  override def dataType: DataType = StructType(Seq(
    StructField("max_micros", LongType, nullable = false),
    StructField("row", IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "matrix_max_cos"

  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val norm = b.asInstanceOf[Double]
    if (v.numElements() != dim || !(norm > 0.0)) null
    else MatrixMaxCosImpl.maxCos(v, isFloat, norm, matrixArr, normsArr, dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("matrix", matrixArr, "double[]")
    val ns = ctx.addReferenceObj("norms", normsArr, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |if ($a.numElements() != $dim || !($b > 0.0)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.graft.MatrixMaxCosImpl
         |    .maxCos($a, $isFloat, $b, $m, $ns, $dim);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatrixMaxCos =
    copy(left = newLeft, right = newRight)
}

object MatrixMaxCosImpl {
  /** See [[MatrixMaxCos]]. Static for codegen. */
  def maxCos(v: ArrayData, isFloat: Boolean, norm: Double,
      matrix: Array[Double], norms: Array[Double],
      dim: Int): org.apache.spark.sql.catalyst.InternalRow = {
    // One materialized copy of the vector: rows × dim reads against a
    // primitive local instead of rows × dim ArrayData virtual calls.
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    var best = Long.MinValue
    var bestRow = -1
    var r = 0
    while (r < norms.length) {
      var s = 0.0
      i = 0
      val off = r * dim
      while (i < dim) {
        s += x(i) * matrix(off + i)
        i += 1
      }
      val micros = Math.floor(s / (norm * norms(r)) * 1e6 + 0.5).toLong
      if (micros > best) { best = micros; bestRow = r }
      r += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](if (bestRow < 0) 0L else best, bestRow))
  }
}

object MatrixMaxCosColumns {
  def matrixMaxCos(v: Column, norm: Column, matrix: Array[Double],
      norms: Array[Double], dim: Int): Column =
    ExpressionUtils.column(MatrixMaxCos(
      ExpressionUtils.expression(v), ExpressionUtils.expression(norm),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(matrix.clone()),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(norms.clone()), dim))
}

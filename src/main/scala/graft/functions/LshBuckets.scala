// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** All random-hyperplane LSH bucket keys of one vector, in one pass:
  * element t of the output is table t's bucket — bit j set iff the
  * vector's dot product with plane `t·planesPerTable + j` is positive.
  *
  * The naive declarative spelling is `tables × planesPerTable`
  * independent `CASE WHEN dot(emb, array(<dim literals>)) > 0 …`
  * columns; at 48×4 tables that is a ~200-expression tree over 64-wide
  * array literals — big enough to blow past JIT/codegen method limits
  * and fall back to per-row interpretation, which made bucketing (not
  * candidate verification!) the dominant cost of the ANN queries. Here
  * the plane matrix rides along as ONE flat reference object and the
  * whole bucket array is computed by a tight primitive loop (the
  * vector is copied to a local double[] once, so the inner dot does no
  * per-element virtual calls). Dot products accumulate left-to-right
  * in double precision — bit-identical signs to the declarative
  * spelling, so bucket assignments (and thus recall) are unchanged.
  *
  * `planes` is flattened row-major: plane p occupies
  * `[p·dim, (p+1)·dim)`, matching Similarity.planes' ordering. Held as
  * an IndexedSeq so the case-class equality Catalyst uses for plan
  * canonicalization is by value, not array identity.
  */
case class LshBuckets(
    child: Expression, planes: IndexedSeq[Double],
    tables: Int, planesPerTable: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_buckets"

  @transient private lazy val planeArr: Array[Double] = planes.toArray
  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    LshBucketsImpl.compute(input.asInstanceOf[ArrayData], planeArr,
      tables, planesPerTable, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planeArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.LshBucketsImpl.compute($c, $ref, $tables, $planesPerTable, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBucketsImpl {
  /** See [[LshBuckets]]. Static so generated code can call it without
    * captured references. */
  def compute(v: ArrayData, planes: Array[Double], tables: Int,
      planesPerTable: Int, isFloat: Boolean): GenericArrayData = {
    val dim = v.numElements()
    // Plane stride is the DECLARED dim (the matrix layout), never the
    // incoming vector's length: a short/long malformed vector must not
    // silently shift every subsequent plane.
    val planeDim = planes.length / (tables * planesPerTable)
    val n = math.min(dim, planeDim)
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    var pOff = 0
    while (t < tables) {
      var b = 0L
      var j = 0
      while (j < planesPerTable) {
        var s = 0.0
        var d = 0
        while (d < n) { s += x(d) * planes(pOff + d); d += 1 }
        if (s > 0) b |= 1L << j
        pOff += planeDim
        j += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }
}

object LshBucketsColumns {
  def lshBuckets(emb: Column, planes: IndexedSeq[Double],
      tables: Int, planesPerTable: Int): Column =
    ExpressionUtils.column(
      LshBuckets(ExpressionUtils.expression(emb), planes, tables, planesPerTable))
}

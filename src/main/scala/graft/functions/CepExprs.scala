// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `true` iff every element of `needles` occurs in `haystack` (both
  * ARRAY<STRING>, no null elements) — the reference's rule-match
  * predicate "all grouping keys present in the event's tags"
  * (Rule.java:63-66).
  *
  * The declarative spelling `forall(needles, k →
  * array_contains(haystack, k))` is a higher-order function: Catalyst
  * evaluates the lambda interpreted (CodegenFallback) for every
  * (metric, rule) pair of the broadcast fan-out join — the predicate,
  * not the data, dominated the one-pass CEP plan. This compiles to two
  * nested primitive loops inside the generated predicate. */
case class ArrayContainsAll(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "array_contains_all"

  override protected def nullSafeEval(h: Any, n: Any): Any =
    CepExprImpl.containsAll(h.asInstanceOf[ArrayData], n.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, n) =>
      s"org.apache.spark.sql.graft.CepExprImpl.containsAll($h, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayContainsAll =
    copy(left = newLeft, right = newRight)
}

/** Epoch-aligned window starts covering an event — the arithmetic twin
  * of the reference's window assigners, as ONE native call:
  * tumbling → the single width-aligned start; sliding → every
  * slide-aligned start whose half-open window covers the event
  * (ceil(w/s) candidates, the non-covering ones dropped — exact
  * non-divisible semantics); anything else (global) → a single null
  * start (the unbounded bucket marker).
  *
  * Replaces a CASE over sequence/transform/filter higher-order
  * functions that Catalyst evaluated interpreted per fanned-out
  * (metric, rule) row. Mirrors StatefulCep.windowStarts bit for bit —
  * the stateful engine's law specs double-cover this arithmetic. */
case class WindowStartsExpr(
    first: Expression, second: Expression, third: Expression, fourth: Expression)
    extends QuaternaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, LongType, LongType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "window_starts"

  override protected def nullSafeEval(wt: Any, ev: Any, w: Any, s: Any): Any =
    CepExprImpl.windowStarts(wt.asInstanceOf[UTF8String],
      ev.asInstanceOf[Long], w.asInstanceOf[Long], s.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (wt, evMs, w, s) =>
      s"org.apache.spark.sql.graft.CepExprImpl.windowStarts($wt, $evMs, $w, $s)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): WindowStartsExpr =
    copy(first = f, second = s, third = t, fourth = q)
}

/** The map's values for each key in `keys`, in key order (null where
  * absent) — `transform(keys, k → element_at(map, k))` as one native
  * call (the lambda spelling is interpreted per fanned-out row). Used
  * for the reference's groupId tag-value extraction. */
case class MapValuesForKeys(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(MapType(StringType, StringType), ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "map_values_for_keys"

  override protected def nullSafeEval(m: Any, k: Any): Any =
    CepExprImpl.valuesForKeys(m.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData],
      k.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (m, k) =>
      s"org.apache.spark.sql.graft.CepExprImpl.valuesForKeys($m, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MapValuesForKeys =
    copy(left = newLeft, right = newRight)
}

object CepExprImpl {
  /** See [[MapValuesForKeys]]. Static for codegen. */
  def valuesForKeys(m: org.apache.spark.sql.catalyst.util.MapData,
      keys: ArrayData): GenericArrayData = {
    val mk = m.keyArray()
    val mv = m.valueArray()
    val nm = m.numElements()
    val n = keys.numElements()
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      val key = keys.getUTF8String(i)
      var j = 0
      var v: AnyRef = null
      while (v == null && j < nm) {
        if (mk.getUTF8String(j).equals(key)) v = mv.getUTF8String(j)
        j += 1
      }
      out(i) = v
      i += 1
    }
    new GenericArrayData(out)
  }

  private val Tumbling = UTF8String.fromString("tumbling")
  private val Sliding = UTF8String.fromString("sliding")

  /** See [[ArrayContainsAll]]. Static for codegen. */
  def containsAll(haystack: ArrayData, needles: ArrayData): Boolean = {
    val n = needles.numElements()
    val h = haystack.numElements()
    var i = 0
    while (i < n) {
      val needle = needles.getUTF8String(i)
      var found = false
      var j = 0
      while (!found && j < h) {
        if (haystack.getUTF8String(j).equals(needle)) found = true
        j += 1
      }
      if (!found) return false
      i += 1
    }
    true
  }

  private val NoStarts = new GenericArrayData(Array.emptyLongArray)

  /** See [[WindowStartsExpr]]. Static for codegen. Non-positive w/s on
    * a windowed type yields NO covering windows (empty array) rather
    * than an ArithmeticException inside generated code — matching the
    * degraded no-rows behavior of the old declarative spelling for
    * rule frames built directly, bypassing Parsers.parseRules'
    * positivity filter. */
  def windowStarts(wt: UTF8String, ev: Long, w: Long, s: Long): GenericArrayData = {
    if (wt.equals(Tumbling)) {
      if (w <= 0) return NoStarts
      new GenericArrayData(Array(Math.floorDiv(ev, w) * w))
    } else if (wt.equals(Sliding)) {
      if (w <= 0 || s <= 0) return NoStarts
      val n = ((w + s - 1) / s).toInt // ceil(w/s) candidate starts
      val top = Math.floorDiv(ev, s) * s
      val out = new Array[Long](n)
      var k = 0
      var st = top
      while (k < n && st > ev - w) { out(k) = st; st -= s; k += 1 }
      new GenericArrayData(java.util.Arrays.copyOf(out, k))
    } else {
      new GenericArrayData(Array[Any](null)) // global: unbounded bucket
    }
  }
}

object CepExprColumns {
  def arrayContainsAll(haystack: Column, needles: Column): Column =
    ExpressionUtils.column(ArrayContainsAll(
      ExpressionUtils.expression(haystack), ExpressionUtils.expression(needles)))

  def windowStarts(windowType: Column, evMs: Column, wMs: Column, sMs: Column): Column =
    ExpressionUtils.column(WindowStartsExpr(
      ExpressionUtils.expression(windowType), ExpressionUtils.expression(evMs),
      ExpressionUtils.expression(wMs), ExpressionUtils.expression(sMs)))

  def mapValuesForKeys(m: Column, keys: Column): Column =
    ExpressionUtils.column(MapValuesForKeys(
      ExpressionUtils.expression(m), ExpressionUtils.expression(keys)))
}

// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData, MapData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's metric key routing (CEPTaskRunner.java:58-72) in
  * ONE pass over the parsed JSON map:
  * `{ev_ms, tags, metrics, ok}` where a key containing `t_` is a tag,
  * the key `eventTime` is the epoch-millis event time, and every other
  * key is an integer measure — `ok` is false when any measure fails
  * integer parsing (the reference's Integer.parseInt throw drops the
  * whole event).
  *
  * Replaces a stack of four higher-order functions (two `map_filter`s,
  * `forall`, `transform_values`) that Catalyst evaluates interpreted
  * with four passes over the map per row — measured, the routing cost
  * matched the Jackson JSON parse itself, and ingest parsing is THE
  * hot path of a streaming engine. Long parsing uses
  * `UTF8String.toLong` — the same routine `try_cast(… AS LONG)` uses,
  * so accepted spellings are identical to the declarative version.
  */
case class MetricRoute(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(MapType(StringType, StringType))
  override def dataType: DataType = MetricRoute.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "metric_route"

  override protected def nullSafeEval(input: Any): Any =
    MetricRoute.route(input.asInstanceOf[MapData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MetricRoute.route($c)")

  override protected def withNewChildInternal(newChild: Expression): MetricRoute =
    copy(child = newChild)
}

object MetricRoute {
  val schema: StructType = StructType(Seq(
    StructField("ev_ms", LongType, nullable = true),
    StructField("tags", MapType(StringType, StringType), nullable = false),
    StructField("metrics", MapType(StringType, DoubleType, valueContainsNull = false),
      nullable = false),
    StructField("ok", BooleanType, nullable = false)))

  private val TagMarker = UTF8String.fromString("t_")
  private val EventTime = UTF8String.fromString("eventTime")

  /** See [[MetricRoute]]. Static for codegen. */
  def route(m: MapData): InternalRow = {
    val keys = m.keyArray()
    val vals = m.valueArray()
    val n = m.numElements()
    val tagK = new Array[AnyRef](n)
    val tagV = new Array[AnyRef](n)
    val meaK = new Array[AnyRef](n)
    val meaV = new Array[Double](n)
    var nTags = 0
    var nMeas = 0
    var evMs: java.lang.Long = null
    var ok = true
    // toLongExact is the ANSI try_cast routine: "5.5" is NOT an
    // integer (UTF8String.toLong would truncate it, legacy-cast style,
    // and silently keep an event the reference's Integer.parseInt
    // drops). The exception path only fires on malformed values.
    // Declared deviation (SURVEY §2.4 #7): the accepted range is
    // 64-bit where the reference's Integer.parseInt is 32-bit — a
    // measure in (2^31, 2^63) is kept here but drops the whole event
    // there. Same behavior as the pre-native try_cast('long') path.
    def parseLong(v: UTF8String): java.lang.Long =
      if (v == null) null
      else try java.lang.Long.valueOf(v.toLongExact)
      catch { case _: NumberFormatException => null }
    var i = 0
    while (i < n) {
      val k = keys.getUTF8String(i)
      val v = if (vals.isNullAt(i)) null else vals.getUTF8String(i)
      if (k.contains(TagMarker)) {
        tagK(nTags) = k
        tagV(nTags) = v
        nTags += 1
      } else if (k.equals(EventTime)) {
        evMs = parseLong(v)
      } else {
        val p = parseLong(v)
        if (p != null) {
          meaK(nMeas) = k
          meaV(nMeas) = p.doubleValue()
          nMeas += 1
        } else {
          ok = false
        }
      }
      i += 1
    }
    val row = new GenericInternalRow(4)
    if (evMs == null) row.setNullAt(0) else row.setLong(0, evMs.longValue())
    row.update(1, new ArrayBasedMapData(
      new GenericArrayData(java.util.Arrays.copyOf(tagK, nTags)),
      new GenericArrayData(java.util.Arrays.copyOf(tagV, nTags))))
    row.update(2, new ArrayBasedMapData(
      new GenericArrayData(java.util.Arrays.copyOf(meaK, nMeas)),
      new GenericArrayData(java.util.Arrays.copyOf(meaV, nMeas))))
    row.setBoolean(3, ok)
    row
  }
}

object MetricRouteColumns {
  def metricRoute(m: Column): Column =
    ExpressionUtils.column(MetricRoute(ExpressionUtils.expression(m)))
}

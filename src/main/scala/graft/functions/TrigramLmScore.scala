// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Broadcast-model trigram LM scoring in ONE pass over the text —
  * the probe side of `TextAnalysis.lmScore` when the model fits the
  * broadcast gate. The declarative spelling explodes one row per
  * corpus CHARACTER, shuffles that frame through a model join, and
  * re-aggregates per document; this expression walks the normalized
  * text's codepoint windows once, probing a plan-shipped
  * trigram→count map, and emits the SAME per-doc aggregate triple
  * `(n_tri, sum_cnt, log1p_sum)` with zero explode, zero join, zero
  * shuffle. Unseen trigrams count 0 (the cross-corpus contract).
  *
  * Parity with the declarative path (spec-pinned): windows are
  * CODEPOINT trigrams (Spark's `length`/`substring` semantics, so
  * multibyte text windows identically); `log1p_sum` accumulates
  * `Math.log(cnt + 1)` in document order — the same accumulation
  * order the declarative per-doc Average sees. The map is a
  * reference object in the serialized plan: model-bounded (the
  * caller's broadcast gate, ≤ `maxBroadcastModel` entries), shipped
  * once per executor — never per row. */
case class TrigramLmScore(child: Expression, model: TrigramLmTable)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tri", LongType, nullable = false),
    StructField("sum_cnt", LongType, nullable = false),
    StructField("log1p_sum", DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "trigram_lm_score"

  override protected def nullSafeEval(input: Any): Any =
    TrigramLmTable.compute(input.asInstanceOf[UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trigramLmTable", model,
      classOf[TrigramLmTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TrigramLmTable.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TrigramLmScore =
    copy(child = newChild)
}

/** The broadcast model: trigram string → corpus count. Java HashMap
  * with UTF8String keys — probes stay in Spark's native string
  * representation, no per-window java.lang.String allocation. */
final class TrigramLmTable(
    val counts: java.util.HashMap[UTF8String, java.lang.Long]) extends Serializable

object TrigramLmTable {

  def build(entries: Iterator[(UTF8String, Long)]): TrigramLmTable = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long]()
    entries.foreach { case (k, v) => m.put(k, v) }
    new TrigramLmTable(m)
  }

  /** See [[TrigramLmScore]]. Static for codegen. One UTF-8 byte walk;
    * windows are slices of three consecutive CODEPOINTS (byte offsets
    * tracked through a 4-deep ring), matching Spark `substring`. */
  def compute(s: UTF8String, t: TrigramLmTable): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    // Byte offsets of the last 4 codepoint boundaries (ring buffer):
    // a window [cp i, cp i+3) is bytes [off(i), off(i+3)).
    val ring = new Array[Int](4)
    var nCp = 0
    var nTri = 0L
    var sumCnt = 0L
    var log1pSum = 0.0
    var i = 0
    while (i < n) {
      ring(nCp & 3) = i
      // UTF-8 lead byte → sequence length (Spark strings are valid UTF-8).
      val b = bytes(i) & 0xFF
      val step =
        if (b < 0x80) 1
        else if (b < 0xE0) 2
        else if (b < 0xF0) 3
        else 4
      i += step
      nCp += 1
      if (nCp >= 3) {
        val start = ring((nCp - 3) & 3)
        nTri += 1L
        val key = UTF8String.fromBytes(bytes, start, i - start)
        val cnt = t.counts.get(key)
        if (cnt != null) {
          sumCnt += cnt.longValue()
          log1pSum += java.lang.Math.log(cnt.doubleValue() + 1d)
        }
        // miss: += 0 to sum_cnt, += log(1) = 0 to log1p_sum.
      }
    }
    InternalRow(nTri, sumCnt, log1pSum)
  }
}

object TrigramLmScoreColumns {
  def trigramLmScore(text: Column, model: TrigramLmTable): Column =
    ExpressionUtils.column(TrigramLmScore(ExpressionUtils.expression(text), model))

  def charTrigramCounts(text: Column): Column =
    ExpressionUtils.column(CharTrigramCounts(ExpressionUtils.expression(text)))
}

/** Per-document codepoint-trigram histogram as MAP<STRING,BIGINT> —
  * the model-build side of `TextAnalysis.lmScore`. The declarative
  * build explodes one row per corpus CHARACTER before the trigram
  * groupBy; this pre-aggregates per document in one codepoint walk,
  * so the explode (and the shuffle's map-side input) carries one row
  * per DISTINCT trigram per doc — for natural text a small fraction
  * of the character count. Exactly `count(substring(s,i,3))` per
  * trigram, window semantics identical to [[TrigramLmScore]]. */
case class CharTrigramCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_trigram_counts"

  override protected def nullSafeEval(input: Any): Any =
    CharTrigramCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CharTrigramCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharTrigramCounts =
    copy(child = newChild)
}

object CharTrigramCounts {
  import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}

  /** See [[CharTrigramCounts]]. Static for codegen. */
  def compute(s: UTF8String): ArrayBasedMapData = {
    val bytes = s.getBytes
    val n = bytes.length
    val ring = new Array[Int](4)
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]]()
    var nCp = 0
    var i = 0
    while (i < n) {
      ring(nCp & 3) = i
      val b = bytes(i) & 0xFF
      val step =
        if (b < 0x80) 1
        else if (b < 0xE0) 2
        else if (b < 0xF0) 3
        else 4
      i += step
      nCp += 1
      if (nCp >= 3) {
        val start = ring((nCp - 3) & 3)
        val key = UTF8String.fromBytes(bytes, start, i - start)
        val slot = m.get(key)
        if (slot == null) m.put(key, Array(1L)) else slot(0) += 1L
      }
    }
    val keys = new Array[Any](m.size())
    val vals = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      keys(k) = e.getKey
      vals(k) = e.getValue()(0)
      k += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }
}

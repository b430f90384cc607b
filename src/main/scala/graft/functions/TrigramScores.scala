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

/** Per-language character-trigram scores in ONE pass over the text:
  * `scores[l] = Σ_needles(l) nonOverlappingCount(text, needle)` — the
  * n-gram language-ID hot loop.
  *
  * The declarative spelling evaluates
  * `(length(s) − length(replace(s, needle, ''))) / 3` per needle —
  * 45 needles × 3 languages means ~45 full scans AND 45 string
  * rebuilds of every document. This expression walks the UTF-8 bytes
  * once, dispatching each 3-byte window through a needle table, with
  * a per-needle skip-until cursor that reproduces `replace`'s
  * left-to-right non-overlapping semantics exactly (needles are
  * independent of each other, exactly as independent `replace` calls
  * are). Needles must be ASCII (UTF-8 multibyte bytes are ≥ 0x80 and
  * can never alias an ASCII window, so multibyte text is handled
  * correctly by construction). Byte-identical to the declarative
  * spelling — the DuckDB oracle keeps using the replace arithmetic. */
case class TrigramScores(child: Expression, langs: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {
  require(langs.nonEmpty && langs.forall(_.forall(t =>
    t.length == 3 && t.forall(_ < 128))),
    "needles must be ASCII trigrams")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "trigram_scores"

  @transient private lazy val table = TrigramTable.build(langs)

  override protected def nullSafeEval(input: Any): Any =
    TrigramTable.compute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trigramTable", table,
      classOf[TrigramTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.TrigramTable.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): TrigramScores =
    copy(child = newChild)
}

/** Prepared needle table: 24-bit window key → needle indices (a
  * trigram may appear in several languages' lists — each occurrence
  * counts toward its own language, as independent `replace` calls
  * would). */
final class TrigramTable(
    val nLangs: Int,
    val langOf: Array[Int],
    val keyMap: java.util.HashMap[Integer, Array[Int]],
    val firstByte: Array[Boolean]) extends Serializable

object TrigramTable {

  def build(langs: Seq[Seq[String]]): TrigramTable = {
    val needles = langs.zipWithIndex.flatMap { case (ts, l) => ts.map(_ -> l) }
    val langOf = needles.map(_._2).toArray
    val keyMap = new java.util.HashMap[Integer, Array[Int]]()
    val firstByte = new Array[Boolean](256)
    needles.zipWithIndex.foreach { case ((t, _), idx) =>
      val b = t.getBytes("UTF-8")
      val key = ((b(0) & 0xFF) << 16) | ((b(1) & 0xFF) << 8) | (b(2) & 0xFF)
      firstByte(b(0) & 0xFF) = true
      keyMap.merge(key, Array(idx), (a, x) => a ++ x)
    }
    new TrigramTable(langs.size, langOf, keyMap, firstByte)
  }

  /** See [[TrigramScores]]. Static for codegen. */
  def compute(s: UTF8String, t: TrigramTable): GenericArrayData = {
    val bytes = s.getBytes
    val counts = new Array[Long](t.nLangs)
    val nextAllowed = new Array[Int](t.langOf.length)
    val n = bytes.length
    var i = 0
    while (i + 2 < n) {
      // Cheap first-byte reject keeps the boxed map lookup off the
      // common path (most windows start with a non-needle byte).
      if (t.firstByte(bytes(i) & 0xFF)) {
        val key = ((bytes(i) & 0xFF) << 16) |
          ((bytes(i + 1) & 0xFF) << 8) | (bytes(i + 2) & 0xFF)
        val hits = t.keyMap.get(key)
        if (hits != null) {
          var j = 0
          while (j < hits.length) {
            val nd = hits(j)
            if (i >= nextAllowed(nd)) {
              counts(t.langOf(nd)) += 1L
              nextAllowed(nd) = i + 3
            }
            j += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

object TrigramScoresColumns {
  def trigramScores(text: Column, langs: Seq[Seq[String]]): Column =
    ExpressionUtils.column(TrigramScores(ExpressionUtils.expression(text), langs))
}

// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** zlib compression ratio of a document's UTF-8 bytes
  * (`compressed/raw`, level 6) — the classic cheap quality signal:
  * highly repetitive/boilerplate text compresses far below natural
  * prose, and near-random noise sits close to (or above) 1.0.
  * Deterministic for a given input (single Deflater pass, fixed
  * level/strategy), pure per-row projection, no shuffle. Not
  * expressible in ANSI SQL, so it carries specs + a bench row rather
  * than a DuckDB oracle (same policy as the xxhash64 production
  * twins). Empty documents report 1.0 (no evidence either way). */
case class CompressRatio(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "compress_ratio"

  override protected def nullSafeEval(input: Any): Any =
    CompressRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CompressRatio.ratio($c)")

  override protected def withNewChildInternal(newChild: Expression): CompressRatio =
    copy(child = newChild)
}

object CompressRatio {
  /** See [[CompressRatio]]. Static for codegen. */
  def ratio(text: UTF8String): Double = {
    val raw = text.getBytes
    if (raw.length == 0) return 1.0
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    try {
      deflater.setInput(raw)
      deflater.finish()
      val buf = new Array[Byte](8192)
      var compressed = 0L
      while (!deflater.finished()) compressed += deflater.deflate(buf)
      compressed.toDouble / raw.length.toDouble
    } finally deflater.end()
  }
}

object CompressRatioColumns {
  def compressRatio(text: Column): Column =
    ExpressionUtils.column(CompressRatio(ExpressionUtils.expression(text)))
}

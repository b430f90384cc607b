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

/** Counts of characters belonging to each of several ASCII character
  * classes, in one pass over the UTF-8 bytes — the punctuation /
  * alphabetic / whitespace ratios of the quality-score family.
  *
  * The declarative spelling is
  * `char_length(s) − char_length(regexp_replace(s, "[^class]", ""))`
  * per class: one regex scan AND one string rebuild per class per
  * row. Because every class here is pure ASCII and UTF-8 multibyte
  * characters occupy only bytes ≥ 0x80, the number of matched CHARS
  * equals the number of matched BYTES — so a single byte scan with a
  * per-byte class bitmask produces exactly the counts the regex
  * arithmetic does, on any Unicode input. */
case class AsciiClassCounts(child: Expression, classes: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {
  require(classes.nonEmpty && classes.size <= 30 &&
    classes.forall(_.forall(_ < 128)), "ASCII classes required (max 30)")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ascii_class_counts"

  @transient private lazy val table = AsciiClassCountsImpl.build(classes)

  override protected def nullSafeEval(input: Any): Any =
    AsciiClassCountsImpl.compute(input.asInstanceOf[UTF8String], table,
      classes.size)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("classTable", table, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.AsciiClassCountsImpl.compute($c, $ref, ${classes.size})")
  }

  override protected def withNewChildInternal(newChild: Expression): AsciiClassCounts =
    copy(child = newChild)
}

object AsciiClassCountsImpl {

  /** Per-byte bitmask: bit i set ⇔ the byte's char is in class i. */
  def build(classes: Seq[String]): Array[Int] = {
    val table = new Array[Int](128)
    classes.zipWithIndex.foreach { case (cls, i) =>
      cls.foreach(ch => table(ch.toInt) |= (1 << i))
    }
    table
  }

  /** See [[AsciiClassCounts]]. Static for codegen. */
  def compute(s: UTF8String, table: Array[Int], nClasses: Int): GenericArrayData = {
    val bytes = s.getBytes
    val counts = new Array[Long](nClasses)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b >= 0) { // ASCII byte; multibyte UTF-8 bytes are negative
        var m = table(b)
        while (m != 0) {
          val bit = java.lang.Integer.numberOfTrailingZeros(m)
          counts(bit) += 1L
          m &= m - 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}

object AsciiClassCountsColumns {
  def asciiClassCounts(text: Column, classes: Seq[String]): Column =
    ExpressionUtils.column(AsciiClassCounts(ExpressionUtils.expression(text), classes))
}

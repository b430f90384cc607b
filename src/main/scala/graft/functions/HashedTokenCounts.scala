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

/** Hashed bag-of-tokens document vector in one tokenize pass:
  * `vec[b] = Σ_tokens [bucket(token) = b]` with
  * `bucket = first-32-md5-bits mod dim` — the EXACT bucket arithmetic
  * of `TextAnalysis.classifierScore`'s SQL spelling
  * (`conv(substring(md5(t),1,8),16,10) % dim`), so an ANSI engine
  * reproduces every count.
  *
  * This is the text→vector bridge: a corpus with no embedding column
  * gets a deterministic, engine-portable feature vector that the
  * similarity/dedup operators consume after a float cast. The
  * declarative spelling pays either one md5 per (token, bucket) probe
  * (filter-per-bucket) or an O(dim) array rebuild per token
  * (aggregate-HOF); this expression hashes each token once and
  * increments one slot. */
case class HashedTokenCounts(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(dim >= 1, s"dim must be positive, got $dim")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hashed_token_counts"

  override protected def nullSafeEval(input: Any): Any =
    HashedTokenCountsImpl.compute(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.HashedTokenCountsImpl.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashedTokenCounts =
    copy(child = newChild)
}

object HashedTokenCountsImpl {
  private val Whitespace = UTF8String.fromString("\\s+")
  private val md = ThreadLocal.withInitial(() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 8 md5 hex chars as unsigned int, mod dim — byte-identical
    * to `conv(substring(md5(t),1,8),16,10) % dim` (the hex prefix is
    * the first 4 digest bytes big-endian; both values are < 2³², so
    * the Long remainder agrees). */
  def bucket(token: UTF8String, dim: Int): Int = {
    val d = md.get()
    d.reset()
    val h = d.digest(token.getBytes)
    val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
    (v % dim).toInt
  }

  /** See [[HashedTokenCounts]]. Static for codegen. */
  def compute(s: UTF8String, dim: Int): GenericArrayData = {
    val toks = s.trim().toLowerCase().split(Whitespace, -1)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < toks.length) {
      counts(bucket(toks(i), dim)) += 1L
      i += 1
    }
    new GenericArrayData(counts)
  }
}

object HashedTokenCountsColumns {
  def hashedTokenCounts(text: Column, dim: Int): Column =
    ExpressionUtils.column(HashedTokenCounts(ExpressionUtils.expression(text), dim))
}

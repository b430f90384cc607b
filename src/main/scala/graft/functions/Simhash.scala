// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** The four 16-bit SimHash band keys of a token array, one native pass
  * (Charikar, STOC'02; banded bucketing per the LSH convention).
  *
  * Per token: a 64-bit hash; each bit votes ±1. Fingerprint bit b is
  * set iff vote sum b is positive; band k (k = 0..3) packs bits
  * [16k, 16k+16) little-endian — the four banded bucket keys the
  * candidate equi-join runs on.
  *
  * Two hash families, selected by `portable`:
  *
  *  - `false` (production): Spark's `xxhash64(token)` (seed 42,
  *    byte-identical to the built-in via [[XXH64.hashUnsafeBytes]]) —
  *    fastest, but not reproducible in ANSI SQL;
  *  - `true` (oracle-portable): the first 8 md5 bytes read as four
  *    16-bit big-endian chunks — chunk k = digest[2k]<<8 | digest[2k+1],
  *    exactly `CAST(('0x' || substring(md5(t), 1+4k, 4)) AS INT)`, so
  *    an external SQL engine can recompute the full pipeline.
  *
  * Replaces the explode + (per-token md5 hex + 4× string `conv`) + 64
  * `sum(when)` aggregate columns spelling, which paid a hex round-trip
  * and a wide shuffle per token; here votes never leave the stack and
  * the output is 4 ints per document — no per-doc groupBy at all.
  */
case class SimhashBands(child: Expression, portable: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    SimhashImpl.bands(input.asInstanceOf[ArrayData], portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.SimhashImpl.bands($c, $portable)")

  override protected def withNewChildInternal(newChild: Expression): SimhashBands =
    copy(child = newChild)
}

object SimhashImpl {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** See [[SimhashBands]]. Static so generated code can call it
    * without captured references. Null tokens cannot occur from
    * `split` tokenization; they are skipped defensively. */
  def bands(tokens: ArrayData, portable: Boolean): GenericArrayData = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    if (portable) {
      val md = digest.get()
      while (i < n) {
        if (!tokens.isNullAt(i)) {
          md.reset()
          val d = md.digest(tokens.getUTF8String(i).getBytes)
          var k = 0
          while (k < 4) {
            val chunk = ((d(2 * k) & 0xff) << 8) | (d(2 * k + 1) & 0xff)
            val base = 16 * k
            var j = 0
            while (j < 16) {
              votes(base + j) += (((chunk >> j) & 1) << 1) - 1 // ±1
              j += 1
            }
            k += 1
          }
        }
        i += 1
      }
    } else {
      while (i < n) {
        if (!tokens.isNullAt(i)) {
          val t = tokens.getUTF8String(i)
          val h = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
          var b = 0
          while (b < 64) {
            votes(b) += ((((h >> b) & 1L).toInt) << 1) - 1
            b += 1
          }
        }
        i += 1
      }
    }
    val bands = new Array[Int](4)
    var k = 0
    while (k < 4) {
      var v = 0
      var j = 0
      while (j < 16) {
        if (votes(16 * k + j) > 0) v |= (1 << j)
        j += 1
      }
      bands(k) = v
      k += 1
    }
    new GenericArrayData(bands)
  }
}

object SimhashColumns {
  def simhashBands(tokens: Column, portable: Boolean): Column =
    ExpressionUtils.column(
      SimhashBands(ExpressionUtils.expression(tokens), portable))
}

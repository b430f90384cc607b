// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** MinHash signature of a shingle array in one native pass: the
  * `numHashes` permutation minima of the universal-hash family
  * `h_i(x) = (a_i·x + b_i) mod M`, `M = 2^31 − 1`, over
  * `x = xxhash64(shingle) mod M` (Spark's xxhash64, seed 42).
  * Coefficients come from the same fixed LCG as
  * [[graft.ops.Dedup]]'s declarative spelling — the two are
  * bit-identical by construction (spec-pinned), so signatures, band
  * hashes, and therefore LSH candidates are unchanged.
  *
  * Replaces explode(shingles) → 64 `pmod(a·x+b, M)` projection columns
  * → per-doc groupBy with 64 `min` aggregates: the minima accumulate
  * in a stack array per document, and the signature-generation shuffle
  * disappears entirely (output is one ARRAY<BIGINT> per row).
  * Null for an empty/null shingle array (a document with fewer than n
  * tokens has no signature — same as its absence from the exploded
  * index).
  */
case class MinhashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes > 0, "numHashes must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(input: Any): Any =
    MinhashImpl.signature(input.asInstanceOf[ArrayData], numHashes)

  // nullSafeCodeGen (not defineCodeGen): the impl returns null for an
  // empty shingle array, so the generated code must propagate isNull
  // from the RESULT, not only from the child.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = org.apache.spark.sql.graft.MinhashImpl.signature($c, $numHashes);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashImpl {
  private final val M = 2147483647L // 2^31 − 1

  private val coefCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  /** First 2·numHashes coefficients of the fixed-seed LCG, mapped into
    * [1, M−1] — numerically identical to Dedup.lcgStream(42). */
  private def coefs(numHashes: Int): Array[Long] =
    coefCache.computeIfAbsent(numHashes, _ => {
      val out = new Array[Long](2 * numHashes)
      var x = 42L
      var i = 0
      while (i < out.length) {
        out(i) = Math.floorMod(x, M - 1) + 1
        x = x * 6364136223846793005L + 1442695040888963407L
        i += 1
      }
      out
    })

  /** See [[MinhashSignature]]. Static so generated code can call it
    * without captured references. Returns null for an empty array. */
  def signature(shingles: ArrayData, numHashes: Int): GenericArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val ab = coefs(numHashes)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        val x = Math.floorMod(
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L), M)
        var h = 0
        while (h < numHashes) {
          // a < M ≈ 2^31 and x < 2^31, so a·x < 2^62: no overflow.
          val v = Math.floorMod(ab(2 * h) * x + ab(2 * h + 1), M)
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      i += 1
    }
    if (mins(0) == Long.MaxValue) return null // all-null elements
    new GenericArrayData(mins)
  }
}

object MinhashColumns {
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    ExpressionUtils.column(
      MinhashSignature(ExpressionUtils.expression(shingles), numHashes))
}

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

/** Winnowed Rabin–Karp rolling-hash fingerprints of a string
  * (the MOSS scheme: Schleimer/Wilkerson/Aiken, SIGMOD'03).
  *
  * 1. Hash every `window`-gram of the string with a polynomial rolling
  *    hash (base 257, unsigned 64-bit wraparound) — O(n), one multiply
  *    + one add per character after the first window.
  * 2. Winnowing: slide a `winnow`-wide window over the gram hashes and
  *    keep each window's minimum (rightmost on ties), deduplicating
  *    consecutive picks. Guarantees any shared substring of length ≥
  *    `window + winnow − 1` yields at least one shared fingerprint,
  *    while output size drops ~`winnow`×.
  *
  * Output: ARRAY<BIGINT> of selected gram hashes in document order
  * (strings shorter than `window` fingerprint to a single whole-string
  * hash). Deterministic across runs/partitions — no seed, no state.
  *
  * The heavy loop lives in [[RollingHashImpl.winnowed]]; codegen emits
  * a static call to it, which keeps the surrounding stage inside
  * WholeStageCodegen (same pattern as Spark's own hash expressions).
  */
case class RollingHashFingerprint(child: Expression, window: Int, winnow: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashImpl.winnowed(input.asInstanceOf[UTF8String], window, winnow)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.RollingHashImpl.winnowed($c, $window, $winnow)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashFingerprint =
    copy(child = newChild)
}

object RollingHashImpl {
  private final val Base = 257L

  /** See [[RollingHashFingerprint]]. Static so generated code can call
    * it without captured references. */
  def winnowed(s: UTF8String, window: Int, winnow: Int): GenericArrayData = {
    // Hash over UTF-8 bytes: locale-independent, allocation-free access.
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    if (n < window) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
      return new GenericArrayData(Array(h))
    }
    // 1. rolling gram hashes
    val nGrams = n - window + 1
    val grams = new Array[Long](nGrams)
    var pow = 1L // Base^(window-1)
    var i = 1
    while (i < window) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < window) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    grams(0) = h
    i = 1
    while (i < nGrams) {
      h = (h - (bytes(i - 1) & 0xffL) * pow) * Base + (bytes(i + window - 1) & 0xffL)
      grams(i) = h
      i += 1
    }
    if (winnow <= 1) return new GenericArrayData(grams)
    // 2. winnow: min of each winnow-window (rightmost wins ties),
    //    emit when the picked position changes.
    val picks = new Array[Long](nGrams)
    var nPicks = 0
    var lastPos = -1
    var w = 0
    val limit = math.max(1, nGrams - winnow + 1)
    while (w < limit) {
      var minPos = w
      var j = w + 1
      val end = math.min(w + winnow, nGrams)
      while (j < end) {
        if (grams(j) <= grams(minPos)) minPos = j
        j += 1
      }
      if (minPos != lastPos) {
        picks(nPicks) = grams(minPos)
        nPicks = nPicks + 1
        lastPos = minPos
      }
      w += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(picks, nPicks))
  }
}

object RollingHashColumns {
  def rollingFingerprint(text: Column, window: Int, winnow: Int): Column =
    ExpressionUtils.column(
      RollingHashFingerprint(ExpressionUtils.expression(text), window, winnow))
}

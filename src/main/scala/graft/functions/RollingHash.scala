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

  def md5WinnowFingerprint(text: Column, window: Int, winnow: Int): Column =
    ExpressionUtils.column(
      Md5WinnowFingerprint(ExpressionUtils.expression(text), window, winnow))
}

/** [[RollingHashFingerprint]]'s oracle-portable twin: gram hashes are
  * the md5 hex of each `window`-CHARACTER gram (code-point semantics,
  * matching ANSI SQL `substring`), compared lexicographically — an
  * arithmetic any SQL engine reproduces with `md5(substring(s, i, w))`
  * plus a windowed `min`. Selection rule is identical to
  * [[RollingHashImpl.winnowed]] (min per winnow window, rightmost on
  * ties, consecutive picks deduplicated); only the hash family and
  * therefore WHICH grams win differs. The rolling hash stays the
  * production path — O(n) hashing vs O(n·window) here.
  *
  * Evaluating this per document in one native pass replaces the
  * declarative spelling (explode 1 row per gram + window-function min
  * over a 24-byte key) that made the fingerprint gate query sort and
  * shuffle ~2000 rows per document.
  */
case class Md5WinnowFingerprint(child: Expression, window: Int, winnow: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_winnow_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    Md5WinnowImpl.winnowed(input.asInstanceOf[UTF8String], window, winnow)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.Md5WinnowImpl.winnowed($c, $window, $winnow)")

  override protected def withNewChildInternal(newChild: Expression): Md5WinnowFingerprint =
    copy(child = newChild)
}

object Md5WinnowImpl {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private final val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** Unsigned lexicographic digest compare — the same order as
    * comparing the hex renderings (hex is monotone per unsigned
    * byte), so the winnow picks exactly the grams the SQL oracle's
    * string-min picks. */
  private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < 16) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  /** See [[Md5WinnowFingerprint]]. Static so generated code can call
    * it without captured references. */
  def winnowed(s: UTF8String, window: Int, winnow: Int): GenericArrayData = {
    val bytes = s.getBytes
    val n = s.numChars()
    // Byte offset of each code point: grams are CHARACTER windows
    // (ANSI substring semantics) hashed over their UTF-8 bytes.
    val starts = new Array[Int](n + 1)
    var b = 0
    var c = 0
    while (c < n) {
      starts(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    starts(n) = bytes.length
    val md = digest.get()
    val nGrams = math.max(1, n - window + 1)
    val grams = new Array[Array[Byte]](nGrams)
    var i = 0
    while (i < nGrams) {
      val from = starts(i)
      val to = starts(math.min(i + window, n))
      md.reset()
      md.update(bytes, from, to - from)
      grams(i) = md.digest()
      i += 1
    }
    if (winnow <= 1)
      return new GenericArrayData(grams.map(g => hex(g): AnyRef))
    // Winnow: min of each winnow-window (rightmost wins ties), emit
    // when the picked position changes — identical control flow to
    // RollingHashImpl.winnowed; only the ~1/winnow picked digests are
    // rendered to hex.
    val picks = new Array[AnyRef](nGrams)
    var nPicks = 0
    var lastPos = -1
    var w = 0
    val limit = math.max(1, nGrams - winnow + 1)
    while (w < limit) {
      var minPos = w
      var j = w + 1
      val end = math.min(w + winnow, nGrams)
      while (j < end) {
        if (cmp(grams(j), grams(minPos)) <= 0) minPos = j
        j += 1
      }
      if (minPos != lastPos) {
        picks(nPicks) = hex(grams(minPos))
        nPicks += 1
        lastPos = minPos
      }
      w += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(picks, nPicks))
  }
}

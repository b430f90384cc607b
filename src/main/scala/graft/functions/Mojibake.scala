// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake (encoding-damage) repair — the ftfy-class transform a web
  * corpus needs between raw extraction and every downstream text
  * operator: a crawl inevitably contains pages whose UTF-8 bytes were
  * at some point decoded as Windows-1252 ("cafÃ©", "donâ€™t",
  * "â‚¬100"), sometimes twice ("cafÃƒÂ©"). Left unrepaired, those
  * documents poison token counts, language ID, dedup fingerprints and
  * the training corpus itself.
  *
  * The repair is the inverse of the damage, applied only where it
  * provably round-trips: each maximal run of non-ASCII characters is
  * re-encoded to Windows-1252 bytes (possible only if every char of
  * the run IS a cp1252 image) and those bytes strictly decoded as
  * UTF-8; the run is replaced only when that decode succeeds and
  * changes it, iterating up to 3 passes for multiply-encoded text.
  * Healthy text is untouchable by construction: a legitimate "é"
  * re-encodes to the lone byte 0xE9, which is not valid UTF-8, and
  * characters outside cp1252's image (→, ✓, CJK) are not encodable at
  * all — either way the run is left alone. ASCII documents (the
  * overwhelming majority) cost one scan and zero allocation.
  *
  * Two zero-shuffle codegen'd projections share the impl:
  * `mojibake_repair(text)` (the repaired string) and
  * `mojibake_repair_count(text)` (how many runs changed — the
  * corpus-health signal worth aggregating per source).
  */
case class MojibakeRepair(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mojibake_repair"

  override protected def nullSafeEval(input: Any): Any =
    MojibakeImpl.repair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MojibakeImpl.repair($c)")

  override protected def withNewChildInternal(
      newChild: Expression): MojibakeRepair = copy(child = newChild)
}

/** Count of non-ASCII runs [[MojibakeRepair]] would change — see its
  * scaladoc. 0 means the text is either healthy or unrepairable. */
case class MojibakeRepairCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mojibake_repair_count"

  override protected def nullSafeEval(input: Any): Any =
    MojibakeImpl.repairCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.MojibakeImpl.repairCount($c)")

  override protected def withNewChildInternal(
      newChild: Expression): MojibakeRepairCount = copy(child = newChild)
}

object MojibakeImpl {
  /** Passes per run: 3 covers triple-encoded text, the deepest damage
    * observed in practice (ftfy's own default search depth). */
  private val MaxPasses = 3

  /** char → Windows-1252 byte, or -1 if the char is not in cp1252's
    * image. Built by decoding every byte once, so the table is
    * exactly the JDK charset's view (including the five undefined
    * positions the JDK maps to C1 controls). */
  private val Cp1252Byte: Array[Int] = {
    val cs = java.nio.charset.Charset.forName("windows-1252")
    val table = Array.fill(0x10000)(-1)
    var b = 0
    while (b < 256) {
      val s = new String(Array(b.toByte), cs)
      if (s.length == 1) table(s.charAt(0).toInt) = b
      b += 1
    }
    table
  }

  private def encodeCp1252(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i).toInt
      val b = if (c < 0x10000) Cp1252Byte(c) else -1
      if (b < 0) return null
      out(i) = b.toByte
      i += 1
    }
    out
  }

  private def decodeUtf8Strict(bytes: Array[Byte]): String =
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    } catch {
      case _: java.nio.charset.CharacterCodingException => null
    }

  /** Repair one maximal non-ASCII run; null if nothing changed. */
  private def repairRun(run: String): String = {
    var cur = run
    var changed = false
    var pass = 0
    var continue = true
    while (continue && pass < MaxPasses) {
      val bytes = encodeCp1252(cur)
      val dec = if (bytes == null) null else decodeUtf8Strict(bytes)
      if (dec == null || dec == cur) continue = false
      else { cur = dec; changed = true; pass += 1 }
    }
    if (changed) cur else null
  }

  /** (repaired string or null-if-unchanged, runs changed). */
  private def repairStr(str: String): (String, Int) = {
    var i = 0
    val n = str.length
    var out: java.lang.StringBuilder = null
    var emitted = 0 // chars of str already copied into out
    var count = 0
    while (i < n) {
      if (str.charAt(i) < 0x80) i += 1
      else {
        val start = i
        while (i < n && str.charAt(i) >= 0x80) i += 1
        val fixed = repairRun(str.substring(start, i))
        if (fixed != null) {
          if (out == null) out = new java.lang.StringBuilder(n)
          out.append(str, emitted, start).append(fixed)
          emitted = i
          count += 1
        }
      }
    }
    if (out == null) (null, 0)
    else { out.append(str, emitted, n); (out.toString, count) }
  }

  /** See [[MojibakeRepair]]. Static for codegen. The `isFullAscii`
    * fast path keeps the overwhelming healthy majority at one byte
    * scan, zero allocation. */
  def repair(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val (fixed, _) = repairStr(s.toString)
    if (fixed == null) s else UTF8String.fromString(fixed)
  }

  /** See [[MojibakeRepairCount]]. Static for codegen. */
  def repairCount(s: UTF8String): Int =
    if (s.isFullAscii) 0 else repairStr(s.toString)._2
}

object MojibakeColumns {
  def mojibakeRepair(text: Column): Column =
    ExpressionUtils.column(MojibakeRepair(ExpressionUtils.expression(text)))
  def mojibakeRepairCount(text: Column): Column =
    ExpressionUtils.column(MojibakeRepairCount(ExpressionUtils.expression(text)))
}

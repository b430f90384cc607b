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

/** The four 12-bit band keys of a Haitsma–Kalker-style robust AUDIO
  * fingerprint, one native pass — the acoustic analogue of
  * [[DhashBands]] for the multimodal dedup family.
  *
  * The published scheme (Haitsma & Kalker, "A Highly Robust Audio
  * Fingerprinting System", ISMIR 2002) frames the signal, computes
  * per-frame band energies, and sets bit (f, b) iff the band-energy
  * difference `E(f,b) − E(f,b+1)` GREW versus the previous frame —
  * a sign-of-second-derivative code that survives uniform gain change
  * (energies scale by a², signs of differences are preserved),
  * re-quantization, and mild noise. This expression is that scheme at
  * a fixed small operating point sized to the banded-join machinery:
  *
  *   - 140 signal values sampled evenly across the payload:
  *     `v(k) = codepoint at ⌊k·n/140⌋` (n = codepoint count; empty
  *     payloads read as the all-zero signal) — the deterministic-fake
  *     decode tier ([[graft.ops.Multimodal.MediaDecoder.Fake]]
  *     posture), exactly replayable by an ANSI oracle
  *     (`unicode(substring(t, idx, 1))`). The real-bytes tier
  *     ([[graft.ops.Multimodal.audioPairsDecoded]]) swaps decoded PCM
  *     samples in behind the same packing via [[AudioFpImpl.bandsOfGrid]].
  *   - 17 frames of width 12 with hop 8 (frame f = samples
  *     f·8 .. f·8+11), 4 energy bands of 3 samples per frame:
  *     `E(f,b) = Σ_{i<3} v(f·8+b·3+i)²` in exact integer arithmetic.
  *   - 48 bits: for f = 1..16, b = 0..2, bit set iff
  *     `(E(f,b)−E(f,b+1)) − (E(f−1,b)−E(f−1,b+1)) > 0`.
  *   - Band key j (j = 0..3) packs frames 4j+1 .. 4j+4: bit
  *     `(f−(4j+1))·3 + b` — four 12-bit keys, the same shape
  *     [[SimhashBands]]/[[DhashBands]] feed the banded Hamming join.
  *
  * A same-length local edit perturbs only the frames whose samples it
  * touches (each sample sits in ≤2 overlapping frames, each energy in
  * ≤2 difference bits) — the bounded-Hamming structure the banded
  * candidate join finds.
  */
case class AudioFpBands(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "audio_fp_bands"

  override protected def nullSafeEval(input: Any): Any =
    AudioFpImpl.bands(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.AudioFpImpl.bands($c)")

  override protected def withNewChildInternal(newChild: Expression): AudioFpBands =
    copy(child = newChild)
}

object AudioFpImpl {
  val Samples = 140
  val Frames = 17
  val Hop = 8
  val FrameWidth = 12
  val BandWidth = 3

  /** See [[AudioFpBands]]. Static so generated code can call it
    * without captured references. */
  def bands(s: UTF8String): GenericArrayData = {
    // One codepoint-array materialization (O(n)), then O(140) sampling.
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    val sig = new Array[Int](Samples)
    var k = 0
    while (k < Samples) {
      sig(k) = if (n == 0) 0 else cps((k * n) / Samples)
      k += 1
    }
    bandsOfGrid(sig)
  }

  /** Energy/band packing shared by the synthetic (codepoint) and
    * decoded (PCM) signals: `sig` must already be the 140-sample grid.
    * Values must satisfy |v| < 2^21 so 3·v² stays well inside Long —
    * true for codepoints (≤ 0x10FFFF) and 16-bit PCM alike. */
  def bandsOfGrid(sig: Array[Int]): GenericArrayData = {
    // E(f,b), f-major: 17 frames × 4 bands of exact integer energy.
    val e = new Array[Long](Frames * 4)
    var f = 0
    while (f < Frames) {
      var b = 0
      while (b < 4) {
        var s = 0L
        var i = 0
        while (i < BandWidth) {
          val v = sig(f * Hop + b * BandWidth + i).toLong
          s += v * v
          i += 1
        }
        e(f * 4 + b) = s
        b += 1
      }
      f += 1
    }
    val bands = new Array[Int](4)
    f = 1
    while (f < Frames) {
      var b = 0
      while (b < 3) {
        val cur = e(f * 4 + b) - e(f * 4 + b + 1)
        val prev = e((f - 1) * 4 + b) - e((f - 1) * 4 + b + 1)
        if (cur - prev > 0) {
          val j = (f - 1) / 4
          bands(j) |= 1 << ((f - (4 * j + 1)) * 3 + b)
        }
        b += 1
      }
      f += 1
    }
    new GenericArrayData(Array(bands(0), bands(1), bands(2), bands(3)))
  }
}

object AudioFpColumns {
  def audioFpBands(payload: Column): Column =
    ExpressionUtils.column(AudioFpBands(ExpressionUtils.expression(payload)))
}

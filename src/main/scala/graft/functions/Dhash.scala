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

/** The four 16-bit dHash band keys of a SYNTHETIC payload, one native
  * pass — the perceptual-hash analogue of [[SimhashBands]] for the
  * multimodal dedup family (difference hash: Krawetz's dHash, the
  * row-gradient perceptual fingerprint).
  *
  * dHash proper samples a decoded image to a 9×8 luma grid and sets
  * bit (r, c) iff `grid(r, c) < grid(r, c+1)` — 64 gradient bits that
  * survive re-encoding, resizing, and brightness shifts. This
  * expression is the DETERMINISTIC-FAKE tier of that operator (the
  * [[graft.ops.Multimodal.MediaDecoder.Fake]] posture): the "grid" is
  * 72 codepoints sampled evenly across the payload-as-string —
  * `v(k) = codepoint at position 1 + ⌊k·n/72⌋` (n = codepoint count;
  * empty payloads read as all-zero grids) — so the full band/bucket/
  * Hamming pipeline is exercised end-to-end and replayed exactly by an
  * ANSI oracle (`unicode(substring(t, idx, 1))`), while the real-bytes
  * tier ([[graft.ops.Multimodal.dhashPairsDecoded]]) swaps in the
  * decoded luma grid behind the same band schema. A same-length local
  * edit perturbs at most the grid cells that sample the edited
  * positions — the near-duplicate structure the banded join is built
  * to find.
  *
  * Band k (k = 0..3) packs rows 2k and 2k+1: bit `(r%2)·8 + c` of the
  * band is comparison (r, c) — 16 bits per band, the same key shape
  * [[SimhashBands]] feeds the banded Hamming machinery.
  */
case class DhashBands(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    DhashImpl.bands(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.DhashImpl.bands($c)")

  override protected def withNewChildInternal(newChild: Expression): DhashBands =
    copy(child = newChild)
}

object DhashImpl {
  /** See [[DhashBands]]. Static so generated code can call it without
    * captured references. */
  def bands(s: UTF8String): GenericArrayData = {
    // One codepoint-array materialization (O(n)), then O(72) sampling —
    // repeated codePointAt/offsetByCodePoints would be O(72·n).
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    val grid = new Array[Int](72)
    var k = 0
    while (k < 72) {
      grid(k) = if (n == 0) 0 else cps((k * n) / 72)
      k += 1
    }
    bandsOfGrid(grid)
  }

  /** Band packing shared by the synthetic (codepoint) and decoded
    * (luma) grids: 72 values row-major 8×9; bit (r, c) set iff
    * `grid(r·9+c) < grid(r·9+c+1)`; band r/2 gets bit (r%2)·8+c. */
  def bandsOfGrid(grid: Array[Int]): GenericArrayData = {
    val bands = new Array[Int](4)
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (grid(r * 9 + c) < grid(r * 9 + c + 1))
          bands(r / 2) |= 1 << ((r % 2) * 8 + c)
        c += 1
      }
      r += 1
    }
    new GenericArrayData(Array(bands(0), bands(1), bands(2), bands(3)))
  }
}

object DhashColumns {
  def dhashBands(payload: Column): Column =
    ExpressionUtils.column(DhashBands(ExpressionUtils.expression(payload)))
}

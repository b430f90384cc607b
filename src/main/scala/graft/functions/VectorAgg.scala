package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise aggregates over array columns, as typed
  * [[Aggregator]]s (partial-aggregatable: map-side combine happens in
  * `reduce`, executor merge in `merge` — the shuffle carries ONE
  * (sum-vector, count) buffer per group, not one row per dimension).
  *
  * Used by IVF k-means centroid updates ([[graft.ops.Similarity]]):
  * the naive spelling (posexplode → groupBy(cluster, dim) → avg)
  * shuffles k×dim rows; this shuffles k buffers.
  */
object VectorAgg {

  /** Mutable buffer: running element-wise sum + row count. */
  final case class VecBuf(var sum: Array[Double], var n: Long)

  private class VecAvg extends Aggregator[Seq[Double], VecBuf, Seq[Double]] {
    override def zero: VecBuf = VecBuf(Array.emptyDoubleArray, 0L)

    override def reduce(b: VecBuf, a: Seq[Double]): VecBuf = {
      if (a == null) return b
      if (b.sum.isEmpty) b.sum = new Array[Double](a.length)
      var i = 0
      while (i < b.sum.length && i < a.length) { b.sum(i) += a(i); i += 1 }
      b.n += 1
      b
    }

    override def merge(x: VecBuf, y: VecBuf): VecBuf = {
      if (x.sum.isEmpty) return y
      if (y.sum.isEmpty) return x
      var i = 0
      while (i < x.sum.length && i < y.sum.length) { x.sum(i) += y.sum(i); i += 1 }
      x.n += y.n
      x
    }

    override def finish(r: VecBuf): Seq[Double] =
      if (r.n == 0) null else r.sum.map(_ / r.n).toSeq

    override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  /** `vec_avg(arrayCol)`: element-wise mean of equal-length
    * double-array rows (null rows ignored; empty group → null). */
  val vec_avg = udaf(new VecAvg)
}

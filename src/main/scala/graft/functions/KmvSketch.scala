package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct-count sketch as a typed
  * [[Aggregator]] — the bounded-memory, MERGEABLE alternative to
  * `count_distinct` for cardinality profiling at corpus scale.
  *
  * `count_distinct(key)` over 100 TB shuffles every distinct key to
  * its reducer; per-source vocabulary cardinality (the motivating
  * use) makes that a vocabulary-sized exchange per source. The KMV
  * buffer instead keeps only the k smallest DISTINCT hash values ever
  * seen: insertion dedups against the buffer (a duplicate hash
  * changes nothing, which is what makes the estimator valid under
  * re-delivery), map-side partials combine in `reduce`, and `merge`
  * is a sorted-array union truncated to k — so the shuffle carries
  * ONE ≤k-long buffer per group regardless of data volume, and
  * sketches built independently (per day, per shard, per source)
  * union into the corpus-level sketch without touching the raw data.
  * That union law is exactly `merge` and is spec-pinned in OpsSpec.
  *
  * The estimator (applied OUTSIDE the aggregate, in plain integer
  * SQL so the oracle replays it): with hashes uniform on [0, 2³²),
  * if the buffer holds fewer than k values it holds EVERY distinct
  * hash (the estimate is exact = buffer size); otherwise the kth
  * smallest hash R_k estimates density and
  * `est = (k−1)·2³² div R_k` — the classic KMV unbiased-ish
  * estimator with a relative error ~1/√(k−2), all in exact long
  * division so Spark and DuckDB agree bit-for-bit.
  *
  * Input is the HASH (a long in [0, 2³²)), not the raw key: the
  * caller computes it with the repo's portable md5 idiom
  * ([[graft.ops.Sampling.hashUniform]]'s integer numerator), which
  * keeps the sketch engine-replayable — DuckDB derives the same
  * hashes and takes the k smallest distinct per group directly.
  */
object KmvSketch {

  /** Mutable buffer: `mins` sorted ascending, distinct, length ≤ k. */
  final case class KmvBuf(var mins: Array[Long])

  private final class KmvAgg(k: Int) extends Aggregator[Long, KmvBuf, Seq[Long]] {
    override def zero: KmvBuf = KmvBuf(Array.emptyLongArray)

    override def reduce(b: KmvBuf, h: Long): KmvBuf = {
      val a = b.mins
      val n = a.length
      if (n == k && h >= a(n - 1)) return b // too large to matter
      val pos = java.util.Arrays.binarySearch(a, h)
      if (pos >= 0) return b // already present
      val ins = -pos - 1
      val out = new Array[Long](math.min(n + 1, k))
      System.arraycopy(a, 0, out, 0, ins)
      out(ins) = h
      System.arraycopy(a, ins, out, ins + 1, out.length - ins - 1)
      b.mins = out
      b
    }

    override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
      if (y.mins.isEmpty) return x
      if (x.mins.isEmpty) { x.mins = y.mins; return x }
      val a = x.mins; val b = y.mins
      // Both inputs are sorted and internally distinct; equal heads
      // are consumed together, so the output needs no dup check.
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length) { val t = a(i); i += 1; t }
          else if (i >= a.length) { val t = b(j); j += 1; t }
          else if (a(i) < b(j)) { val t = a(i); i += 1; t }
          else if (a(i) > b(j)) { val t = b(j); j += 1; t }
          else { val t = a(i); i += 1; j += 1; t }
        out(o) = v; o += 1
      }
      x.mins = if (o == out.length) out else java.util.Arrays.copyOf(out, o)
      x
    }

    override def finish(r: KmvBuf): Seq[Long] = r.mins.toSeq

    override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** `kmv_min_hashes(hashCol, k)`: the ≤k smallest distinct values of
    * the long hash column per group, ascending. Estimate downstream:
    * `if (size < k) size else (k−1)·2³² div last`. */
  def kmv_min_hashes(hash: Column, k: Int): Column = {
    require(k >= 2, s"k must be >= 2 (the estimator divides by k-1), got $k")
    udaf(new KmvAgg(k)).apply(hash)
  }
}

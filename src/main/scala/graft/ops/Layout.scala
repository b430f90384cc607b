package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Storage-LAYOUT operators: multi-dimensional clustering for
  * data-skipping at rest (reference scope note: the reference engine
  * has no storage layer; this is Spark-native table maintenance for
  * the 100 TB corpus the other operators read).
  *
  * WHY: parquet scan pruning is driven by per-file/row-group min-max
  * stats. A corpus sorted by ONE key prunes range queries on that key
  * only; Z-ORDER (Morton) clustering interleaves the bits of several
  * keys so that range predicates on ANY prefix-queried dimension —
  * `source = s AND quality BETWEEN a AND b`, `domain_bucket = d AND
  * ts >= t` — each touch a small fraction of files. The curation
  * read patterns this engine serves (per-source audits, per-domain
  * re-filters, quality-band re-samples) are exactly such
  * multi-dimension range scans.
  *
  * Execution shape: the z-key is a zero-shuffle codegen'd projection
  * (pure long shift/mask arithmetic, oracle-replayable);
  * [[clusterByZOrder]] is ONE range shuffle on that key plus an
  * in-partition sort — the same cost as any global sort-before-write,
  * so z-ordering a table costs nothing extra over naive sorting while
  * pruning on every interleaved dimension. */
object Layout {

  /** Morton/Z-value of `cols`: bit `i` of column `j` lands at output
    * bit `i * cols.size + j` (dimension-round-robin interleave, LSB
    * first). Inputs MUST already be bucket ids in `[0, 2^bits)` —
    * use [[bucketize]] for arbitrary numeric columns; out-of-range
    * inputs refuse loudly per row (a silent mask would place rows in
    * the wrong region of the curve and break the pruning story
    * quietly). Disjoint target bits mean the interleave is a SUM of
    * shifted bits — plain long arithmetic both engines and the oracle
    * replay exactly. */
  def zOrderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zOrderKey needs at least one column")
    require(bits >= 1 && cols.size * bits <= 63,
      s"need 1 <= bits and dims*bits <= 63, got ${cols.size} x $bits")
    val dims = cols.size
    val bound = 1L << bits
    val checked = cols.zipWithIndex.map { case (c, j) =>
      val lc = c.cast("long")
      when(lc >= 0 && lc < bound, lc).otherwise(raise_error(concat(
        lit(s"zOrderKey: dimension $j out of [0, $bound): "),
        lc.cast("string"))))
    }
    val terms = for {
      (c, j) <- checked.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * dims + j)
    terms.reduce(_ + _)
  }

  /** Equi-width bucket id in `[0, 2^bits)` for any integral column,
    * from exact global min/max (one tiny aggregate, broadcast back as
    * a one-row cross join — the repo's standard bounded-BNLJ stats
    * pattern). Division-only integer arithmetic
    * (`(c − min) div (range div n + 1)`) — no multiply, so no
    * overflow for any long range that itself fits a long (a
    * min-negative/max-positive range that overflows refuses loudly
    * per row rather than bucketing garbage). A constant column
    * buckets to 0; the bucket count never exceeds `2^bits` by
    * construction (`range div width < n`). Deterministic. */
  def bucketize(df: DataFrame, c: Column, bits: Int,
      as: String): DataFrame = {
    require(bits >= 1 && bits <= 31, s"need 1 <= bits <= 31, got $bits")
    val n = 1L << bits
    val taken = df.columns.toSet + as
    def fresh(base: String): String =
      Iterator.from(0).map(i => s"_${base}_$i").find(!taken(_)).get
    val vcol = fresh("zv")
    val mincol = fresh("zmin")
    val maxcol = fresh("zmax")
    val stats = df.agg(min(c.cast("long")).as(mincol),
      max(c.cast("long")).as(maxcol))
    df.crossJoin(broadcast(stats))
      .withColumn(vcol, c.cast("long"))
      .withColumn(as,
        when(col(maxcol) - col(mincol) < 0, raise_error(lit(
          s"bucketize: min/max range overflows a long — pre-shift " +
            "the column")))
          .otherwise(expr(
            s"($vcol - $mincol) div (($maxcol - $mincol) div ${n}L + 1)")))
      .drop(vcol, mincol, maxcol)
  }

  /** Cluster `df` for multi-dimensional data skipping: compute the
    * [[zOrderKey]] over `cols` (already-bucketized ids), then ONE
    * range repartition + in-partition sort on it — each output
    * partition (→ parquet file) covers a compact region of the
    * z-curve, so its min-max stats are tight on EVERY interleaved
    * dimension. The key column is dropped after partitioning (it is
    * derivable; persisting it is the caller's choice). */
  def clusterByZOrder(df: DataFrame, cols: Seq[Column], bits: Int,
      numPartitions: Int): DataFrame = {
    require(numPartitions >= 1, s"numPartitions >= 1, got $numPartitions")
    val taken = df.columns.toSet
    val zcol = Iterator.from(0).map(i => s"_zkey_$i").find(!taken(_)).get
    df.withColumn(zcol, zOrderKey(cols, bits))
      .repartitionByRange(numPartitions, col(zcol))
      .sortWithinPartitions(zcol)
      .drop(zcol)
  }
}

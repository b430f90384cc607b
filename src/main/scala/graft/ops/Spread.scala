package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism-preserving spreads for CPU-dense stages (r14
  * optimization round).
  *
  * Two local-mode-vs-scale facts collide in this repo's pipelines:
  *
  *  1. parquet packs a sub-`maxPartitionBytes` table into ONE input
  *     split, so on a small corpus every per-row-heavy stage
  *     downstream of a bare scan (shingling, LSH hashing, brute-force
  *     scoring against a broadcast side, HTML link extraction) runs
  *     in a single task while the rest of the machine idles;
  *  2. AQE's partition coalescing targets BYTES
  *     (`minPartitionSize`, default 1 MB), so a keyed
  *     `repartition(key)` — shuffle origin REPARTITION_BY_COL — is
  *     folded back to one or two partitions exactly when the frame is
  *     byte-tiny but CPU-dense (measured at sf0.1: the 2000×2000 kNN
  *     scoring stage and the 12-iteration classifier gradient loop
  *     both ran single-task behind such a repartition).
  *
  * The fix is NOT a constant tuned for local[32]: when the input is
  * already at least as parallel as the cluster (`defaultParallelism`
  * splits — every real corpus scan at 100 TB), these helpers keep the
  * scale spelling (no shuffle, or the AQE-tunable keyed repartition
  * whose partition sizing stays byte-driven). Only a genuinely NARROW
  * input gets an explicit partition count — and a frame that fit in
  * fewer splits than cores is small by construction, so
  * cores-many partitions can never be memory-hostile. */
object Spread {

  /** Kill switch for A/B measurement and for clusters whose scans are
    * never narrow: `SPARK_GRAFT_SPREAD=off` restores the pre-r14
    * spellings exactly (no pinned partition counts anywhere). */
  private val enabled: Boolean =
    sys.env.getOrElse("SPARK_GRAFT_SPREAD", "on") != "off"

  private def parallelismOf(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** Streaming frames never count as narrow: probing their planned
    * parallelism would build a batch plan (illegal on a stream), and
    * micro-batch sources size their own partitioning. Both helpers
    * then keep the stream-safe pre-r14 spelling. */
  private def isNarrow(df: DataFrame): Boolean =
    enabled && !df.isStreaming &&
      df.queryExecution.toRdd.getNumPartitions < parallelismOf(df)

  /** Spread `df` across the cluster only when its planned parallelism
    * is below the session default; untouched (NO added shuffle)
    * otherwise. For CPU-dense stages that need no particular
    * downstream partitioning. */
  def ifNarrow(df: DataFrame, key: Column): DataFrame =
    if (isNarrow(df)) df.repartition(parallelismOf(df), key) else df

  /** Hash-partition `df` by `key` — the spelling for pipelines whose
    * downstream groupBys/windows ride the established partitioning —
    * pinning the partition count only when the input is narrow.
    * At scale this is exactly the old `repartition(key)` (AQE sizes
    * the shuffle by bytes); on a narrow input the explicit count
    * stops AQE's byte-targeted coalescing from serializing the
    * CPU-dense stage that follows. */
  def keyed(df: DataFrame, key: Column): DataFrame =
    if (isNarrow(df)) df.repartition(parallelismOf(df), key)
    else df.repartition(key)
}

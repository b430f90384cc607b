package graft.ops

import org.apache.spark.sql.DataFrame

/** How the dedup/similarity pipelines materialize intermediates that
  * feed multiple plan branches or iterative rounds (shingle index,
  * edge lists, LSH bucket frames).
  *
  * [[Persistence.Local]] (default) truncates lineage with
  * `localCheckpoint()`: fast, but blocks live on executor-local
  * storage — losing an executor loses blocks whose lineage is gone,
  * failing the job. Right for single-node and gate runs.
  *
  * [[Persistence.Reliable]] writes the intermediate to the cluster's
  * checkpoint directory (`SparkContext.setCheckpointDir`, HDFS/object
  * store in production) via `checkpoint()`: an executor loss recomputes
  * nothing and loses nothing. At 100 TB the shingle/bucket index is
  * exactly the artifact you would persist to reliable storage anyway —
  * this knob is that decision, made explicit per call. */
sealed trait Persistence {
  /** Eager: materializes now (its own job), returns the truncated frame. */
  def apply(df: DataFrame): DataFrame

  /** Lazy: marks for materialization; the caller's NEXT action on the
    * returned frame both materializes and computes — one job instead
    * of two. Use inside iterative loops whose convergence check is
    * itself an action. */
  def lazily(df: DataFrame): DataFrame
}

object Persistence {
  case object Local extends Persistence {
    override def apply(df: DataFrame): DataFrame = df.localCheckpoint()
    override def lazily(df: DataFrame): DataFrame = df.localCheckpoint(eager = false)
  }
  /** Requires `spark.sparkContext.setCheckpointDir(...)` to be set. */
  case object Reliable extends Persistence {
    override def apply(df: DataFrame): DataFrame = df.checkpoint()
    override def lazily(df: DataFrame): DataFrame = df.checkpoint(eager = false)
  }
  /** No materialization: every consuming plan branch recomputes the
    * intermediate from source. Measurably the faster choice for SMALL
    * corpora (AB_r7 `span_persist`: the checkpoint job costs ~20% at
    * sf0.1, where re-shingling is cheap and pipelines better) — but at
    * scale the recompute doubles the CPU-dense stage, so the operators
    * keep [[Local]] as their default. */
  case object Off extends Persistence {
    override def apply(df: DataFrame): DataFrame = df
    override def lazily(df: DataFrame): DataFrame = df
  }
}

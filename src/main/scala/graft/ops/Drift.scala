package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest drift monitoring: is the corpus arriving NOW shaped like
  * the corpus the pipeline was calibrated on? Every frozen artifact
  * in this library — classifier weights, LM models, tile cutoffs,
  * IVF centroids, mixture rates — silently degrades when the source
  * mix shifts under it; this operator is the alarm that says so,
  * per event-time window, before the damage reaches a training set.
  * Works identically on a batch frame (backtesting yesterday's
  * ingest) and on a watermarked stream (live), because it is two
  * chained windowed aggregations plus pure arithmetic. */
object Drift {

  /** Per-window categorical drift vs a frozen baseline: tumbling
    * event-time windows of `windowDur` over `tsCol`, the window's
    * category shares (`keyCol` — source, language, any label) against
    * `baseline`, scored as total-variation distance
    * `tvd = (Σ_present |share − base| + missing base mass) / 2` — the
    * standard "fraction of the window mis-allocated" number in
    * [0, 1]. Categories absent from the baseline count their full
    * share (a brand-new source IS drift); baseline categories absent
    * from a window contribute their full base weight via the missing
    * mass term. `alertAt` stamps the boolean `drifted` flag a router
    * consumes.
    *
    * Output: one row per window — (window_start, window_end, n_rows,
    * n_categories, tvd, drifted). For WHICH category moved, run
    * [[sourceSharesByWindow]] over the alarmed range.
    *
    * Scale/stream posture: aggregation #1 is the map-side-combinable
    * (window × category) count; aggregation #2 collapses each
    * window's bounded category histogram (a `collect_list` whose
    * size is the category count, NOT the row count) and folds the
    * TVD with a sorted higher-order function — sorted so the
    * floating-point sum has ONE deterministic order across runs,
    * partitionings and engines. The baseline rides the plan as a
    * literal CASE (no join). On a stream, watermark the input and
    * both aggregations run as chained time-window aggregations in
    * append mode — per-window state is the category histogram,
    * nothing corpus-shaped. */
  def categoryDrift(df: DataFrame, tsCol: Column, keyCol: Column,
      windowDur: String, baseline: Map[String, Double],
      alertAt: Double = 0.2): DataFrame = {
    require(baseline.nonEmpty, "categoryDrift needs a non-empty baseline")
    baseline.values.foreach(v =>
      require(v >= 0.0 && v <= 1.0, s"baseline share out of [0,1]: $v"))
    val baseMass = baseline.values.toSeq.sorted.sum
    // Spelled over the post-aggregate `category` column (keyCol's
    // name does not survive the groupBy alias).
    val base = coalesce(
      baseline.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
        case (acc, (k, v)) =>
          when(col("category") === lit(k), lit(v)).otherwise(acc)
      }, lit(0.0))
    val perCat = df
      .groupBy(window(tsCol, windowDur), keyCol.as("category"))
      .agg(count(lit(1)).as("n_cat"))
      .withColumn("base_share", base)
    perCat
      .groupBy(window(col("window"), windowDur))
      .agg(sum(col("n_cat")).as("n_rows"),
        count(lit(1)).as("n_categories"),
        array_sort(collect_list(struct(col("category"), col("n_cat"),
          col("base_share")))).as("_items"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_rows"), col("n_categories"),
        ((aggregate(col("_items"), lit(0.0), (acc, x) =>
          acc + abs(x.getField("n_cat").cast("double") / col("n_rows") -
            x.getField("base_share"))) +
          (lit(baseMass) - aggregate(col("_items"), lit(0.0), (acc, x) =>
            acc + x.getField("base_share")))) * lit(0.5)).as("tvd"))
      .withColumn("drifted", col("tvd") >= lit(alertAt))
  }

  /** Per-(window, category) share breakdown — the drill-down a fired
    * [[categoryDrift]] alarm reads. Batch spelling (window function
    * over the tiny per-window histogram); on a stream, land the
    * alarmed window's raw slice and run this in batch — the drill-
    * down is a forensic query, not a standing operator. */
  def sourceSharesByWindow(df: DataFrame, tsCol: Column, keyCol: Column,
      windowDur: String): DataFrame = {
    val perCat = df
      .groupBy(window(tsCol, windowDur).as("w"), keyCol.as("category"))
      .agg(count(lit(1)).as("n_cat"))
    val W = org.apache.spark.sql.expressions.Window.partitionBy(col("w"))
    perCat
      .withColumn("n_window", sum(col("n_cat")).over(W))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("category"), col("n_cat"),
        col("n_window"),
        (col("n_cat").cast("double") / col("n_window")).as("share"))
  }
}

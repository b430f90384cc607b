package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide rank assignment without a corpus-wide sort: the
  * primitive behind multi-signal quality ranking ([[rankFusion]]) and
  * CCNet-style perplexity bucketing ([[rankTiles]]). A training-data
  * pipeline constantly needs "where does this document stand among
  * all documents" — but `RANK() OVER (ORDER BY score)` funnels the
  * whole corpus through ONE task. This object computes the identical
  * competition ranks with the monotone-bucket two-phase prefix sum
  * ([[Sampling.budgetCap]] / the bucketed ROC pattern): counts per
  * DISTINCT score, per-score-range-bucket exclusive prefix sums, and
  * a chained subtotal frame of at most `fanout` rows per group. */
object Ranking {

  /** Competition rank (ANSI `RANK()`: ties share the rank of their
    * first member; the next distinct score resumes at its row
    * position) of every row by `scoreCol` — descending by default
    * ("rank 1 = best"), optionally per `groupCols` partition — plus
    * the group's total row count (`nCol`, the divisor rank-derived
    * quantities need). Output = the input frame + those two columns.
    *
    * Scale posture: ranks are derived on the DISTINCT-score frame
    * (one row per score value per group, with its tie count), whose
    * running totals are computed per (group, score-range bucket) and
    * stitched with a chained subtotal frame of ≤ `fanout` rows per
    * group — no task ever sorts more than one bucket of one group's
    * distinct scores (the [[Sampling.budgetCap]] monotone-bucket
    * pattern; bucket assignment uses the score RANGE, so float
    * rounding can only shift bucket BALANCE, never results). The
    * join back to the full frame is a keyed equi-join on
    * (group, score) that AQE broadcasts when the distinct-score side
    * is small. `fanout = 1` is the plain single-window spelling —
    * result-identical (spec-pinned), kept as the identity check.
    *
    * NULL scores have no defined rank position and error loudly
    * (coalesce the signal first — same policy as
    * [[Sampling.weightedBernoulli]]'s NULL weights). NaN compares
    * GREATER than every real double on both Spark and ANSI engines
    * and equi-joins as itself in Spark, so NaN ranks first descending
    * / last ascending — deterministic and engine-consistent.
    * Arithmetic is exact integer counting throughout — an ANSI
    * `RANK()` oracle reproduces every rank bit-for-bit. */
  def scoreRanks(df: DataFrame, scoreCol: String,
      groupCols: Seq[String] = Nil, ascending: Boolean = false,
      fanout: Int = 64, rankCol: String = "rank",
      nCol: String = "n_group"): DataFrame =
    df.join(
      distinctRanks(df, scoreCol, groupCols, ascending, fanout,
        rankCol, nCol).drop("_rk_tie"),
      groupCols :+ scoreCol)

  /** The machinery's core, also consumed by [[groupQuantiles]]: ONE
    * row per DISTINCT (group, score) with its competition rank, the
    * group total (`nCol`) and the tie count (`_rk_tie` — how many
    * rows share the score, i.e. the width of the rank's row-position
    * interval `[rank, rank + _rk_tie - 1]`). */
  private def distinctRanks(df: DataFrame, scoreCol: String,
      groupCols: Seq[String], ascending: Boolean,
      fanout: Int, rankCol: String, nCol: String): DataFrame = {
    require(fanout >= 1, s"fanout must be positive, got $fanout")
    require(!groupCols.contains(scoreCol),
      s"scoreCol $scoreCol cannot also be a group column")
    val taken = df.columns.toSet ++ Set(rankCol, nCol)
    def fresh(base: String): String =
      Iterator.from(0).map(i => s"_${base}_$i").find(!taken(_)).get
    val W = org.apache.spark.sql.expressions.Window
    val sc = col(scoreCol)
    val ord = if (ascending) sc.asc else sc.desc
    val grp = groupCols.map(col)
    val cntCol = fresh("rk_cnt")
    val nullGuard = fresh("rk_nnull")

    // ONE corpus shuffle on (group, score): tie counts per distinct
    // score, carrying the null count so the guard costs no extra pass.
    val byScore = df
      .groupBy((groupCols :+ scoreCol).map(col): _*)
      .agg(count(lit(1)).as(cntCol))
    val statsAgg = Seq(
      min(sc.cast("double")).as("_rk_smin"),
      max(sc.cast("double")).as("_rk_smax"),
      sum(col(cntCol)).as(nCol),
      sum(when(sc.isNull, col(cntCol)).otherwise(lit(0L))).as(nullGuard))
    // Group stats come from the (tiny) distinct-score frame, not a
    // second corpus scan.
    val stats =
      if (groupCols.isEmpty) byScore.agg(statsAgg.head, statsAgg.tail: _*)
      else byScore.groupBy(grp: _*).agg(statsAgg.head, statsAgg.tail: _*)

    val preCol = fresh("rk_pre")
    val ranked = if (fanout == 1) {
      // Plain spelling: one window over the distinct-score frame per
      // group (unpartitioned when groupCols is empty — the identity
      // baseline, not the scale path).
      val wx = (if (groupCols.isEmpty) W.orderBy(ord)
        else W.partitionBy(grp: _*).orderBy(ord))
        .rowsBetween(W.unboundedPreceding, -1)
      byScore.withColumn(preCol,
        coalesce(sum(col(cntCol)).over(wx), lit(0L)))
    } else {
      val bCol = fresh("rk_b")
      val frac = when(col("_rk_smax") === col("_rk_smin"), lit(0.0))
        .otherwise((sc.cast("double") - col("_rk_smin")) /
          (col("_rk_smax") - col("_rk_smin")))
      val bucket = least(lit(fanout - 1), floor(
        (if (ascending) frac else lit(1.0) - frac) * fanout)).cast("int")
      val statsKeyed =
        if (groupCols.isEmpty) byScore.crossJoin(broadcast(stats))
        else byScore.join(broadcast(stats), groupCols)
      // NaN compares greater than every real double, so it sorts
      // FIRST under desc / LAST under asc — pin its bucket to match
      // (NaN arithmetic would otherwise feed floor/cast
      // engine-dependent garbage).
      val nanBucket = lit(if (ascending) fanout - 1 else 0)
      val withB = statsKeyed.withColumn(bCol,
        when(isnan(sc.cast("double")), nanBucket)
          .otherwise(coalesce(bucket, nanBucket)))
      val localWx = W.partitionBy((grp :+ col(bCol)): _*).orderBy(ord)
        .rowsBetween(W.unboundedPreceding, -1)
      // The chain input is the per-(group, bucket) subtotal frame —
      // ≤ fanout rows per group BY CONSTRUCTION. With no group the
      // non-foldable constant key states that boundedness to the
      // planner (pmod, not a literal, or EliminateWindowPartitions
      // strips it back to the unbounded-window warning case).
      val chainParts =
        if (groupCols.isEmpty) Seq(pmod(col(bCol), lit(1))) else grp
      val chainW = W.partitionBy(chainParts: _*).orderBy(col(bCol).asc)
        .rowsBetween(W.unboundedPreceding, -1)
      val offCol = fresh("rk_off")
      val offsets = withB.groupBy((grp :+ col(bCol)): _*)
        .agg(sum(col(cntCol)).as(preCol))
        .withColumn(offCol, coalesce(sum(col(preCol)).over(chainW), lit(0L)))
        .select((grp :+ col(bCol) :+ col(offCol)): _*)
      withB
        .withColumn(preCol,
          coalesce(sum(col(cntCol)).over(localWx), lit(0L)))
        .join(offsets, groupCols :+ bCol)
        .withColumn(preCol, col(offCol) + col(preCol))
        .drop(bCol, offCol, "_rk_smin", "_rk_smax")
    }

    (if (fanout == 1) {
      // Plain path still needs n_group + the null guard: join the
      // per-group stats (bounded by the group count) back in.
      if (groupCols.isEmpty) ranked.crossJoin(broadcast(stats))
      else ranked.join(broadcast(stats), groupCols)
    } else ranked)
      .withColumn(rankCol, when(col(nullGuard) > 0, raise_error(lit(
          s"scoreRanks: NULL values in $scoreCol — coalesce the signal first")))
        .otherwise(col(preCol) + 1L))
      .select((groupCols :+ scoreCol).map(col) :+ col(rankCol) :+
        col(nCol) :+ col(cntCol).as("_rk_tie"): _*)
  }

  /** Reciprocal-rank fusion of several quality signals into ONE
    * ordering: `rrf = Σ_s 1/(k + rank_s)` (Cormack et al.'s k=60
    * default) over per-signal competition ranks. The standard move
    * when a curation stack holds several incomparable scores — a
    * classifier probability, an LM log-prob, a length heuristic —
    * and needs one ranking that is robust to any single signal's
    * scale or outliers. Each signal is ranked with its OWN
    * [[scoreRanks]] pass (`higherIsBetter = false` flips a signal
    * whose low values are good, e.g. perplexity), then the fused
    * score is the fixed left-to-right IEEE sum of the reciprocals —
    * deterministic and oracle-portable (exact integer ranks, one
    * division per signal, same addition order in SQL).
    *
    * Output = input + one `rank_<signal>` per signal + `rrf`
    * (higher = better). Scale: one distinct-score rank pass per
    * signal — no global sort anywhere ([[scoreRanks]]' bucketed
    * prefix sums), costs S keyed joins for S signals. Each signal's
    * rank frame is derived from the BASE frame's single-column
    * projection, not the accumulating join tree — signal N's
    * distinct-score pass must not replay signals 1..N−1's joins, and
    * the narrow projection lets column pruning reach the scan. */
  def rankFusion(df: DataFrame, signals: Seq[(String, Boolean)],
      k: Int = 60, fanout: Int = 64): DataFrame = {
    require(signals.nonEmpty, "rankFusion needs at least one signal")
    require(k >= 1, s"k must be positive, got $k")
    val ranked = signals.foldLeft(df) { case (acc, (s, higherIsBetter)) =>
      acc.join(
        distinctRanks(df.select(col(s)), s, groupCols = Nil,
          ascending = !higherIsBetter, fanout = fanout,
          rankCol = s"rank_$s", nCol = s"_n_$s")
          .drop("_rk_tie", s"_n_$s"),
        Seq(s))
    }
    val rrf = signals.map { case (s, _) =>
      lit(1.0) / (lit(k.toDouble) + col(s"rank_$s").cast("double"))
    }.reduceLeft(_ + _)
    ranked.withColumn("rrf", rrf)
  }

  /** Exact rank-based n-tiles — the CCNet move: bucket documents into
    * `tiles` equal-population bands of a score (head/middle/tail of
    * the perplexity distribution for `tiles = 3`), per optional group
    * (CCNet buckets per LANGUAGE; per-source is this corpus's
    * analog). `tile = ((rank − 1) · tiles) DIV n_group` — exact
    * integer arithmetic on competition ranks, so ties land in one
    * tile on every engine and the bands differ from equal-count only
    * by tie mass (unlike NTILE, whose row-number base splits ties
    * nondeterministically under shuffle).
    *
    * Default `ascending = false` puts the HIGHEST scores in tile 0 —
    * pass the score oriented so "tile 0 = head = best" reads
    * naturally (e.g. avg trigram probability descending = lowest
    * perplexity first). Scale: exactly [[scoreRanks]] — bucketed
    * prefix sums, no global sort. */
  def rankTiles(df: DataFrame, scoreCol: String, tiles: Int,
      groupCols: Seq[String] = Nil, ascending: Boolean = false,
      fanout: Int = 64): DataFrame = {
    require(tiles >= 1, s"tiles must be positive, got $tiles")
    scoreRanks(df, scoreCol, groupCols, ascending, fanout)
      .withColumn("tile",
        expr(s"CAST(((rank - 1) * $tiles) DIV n_group AS INT)"))
  }

  /** Exact interpolated quantiles PER GROUP without a per-group sort
    * task: linear interpolation at row position `1 + (n−1)·q`
    * (R type-7 / ANSI PERCENTILE_CONT semantics) read off the
    * distinct-score rank frame. The two spellings Spark offers both
    * hit a wall at corpus scale — a `PARTITION BY group` sort window
    * funnels each group through one task, and the `percentile`
    * aggregate builds an in-memory value→count map per group
    * (distinct-value-shaped executor state). Here position lookup is
    * a broadcast join of the (groups × |qs|) position frame against
    * the distinct-rank frame: a score at competition rank r with t
    * ties covers row positions `[r, r + t − 1]`, so each distinct
    * score answers the ≤ |qs| positions it covers and ONE
    * map-side-combinable aggregation per (group, q) collapses the
    * rest. No sort, no per-group state beyond the tie counts already
    * shuffled.
    *
    * Output: one row per (group, q) — the bracketing values
    * `v_lo`/`v_hi` and `value = v_lo + frac·(v_hi − v_lo)` with
    * `frac = pos − floor(pos)`. Every step is a single
    * correctly-rounded IEEE op in fixed order, so an ANSI oracle
    * spelled with the same explicit arithmetic reproduces the doubles
    * bit-for-bit (scores are cast to double; quantile positions use
    * the double value of each q). NULL scores error loudly (the
    * [[scoreRanks]] guard); NaN scores sort greatest, as everywhere
    * in this library. */
  def groupQuantiles(df: DataFrame, scoreCol: String, qs: Seq[Double],
      groupCols: Seq[String] = Nil, fanout: Int = 64): DataFrame = {
    require(qs.nonEmpty, "groupQuantiles needs at least one q")
    qs.foreach(q => require(q >= 0.0 && q <= 1.0, s"q out of [0,1]: $q"))
    val dr = distinctRanks(
      df.select((groupCols :+ scoreCol).map(col): _*)
        .withColumn(scoreCol, col(scoreCol).cast("double")),
      scoreCol, groupCols, ascending = true, fanout = fanout,
      rankCol = "_gq_rank", nCol = "_gq_n")
    val groups = dr.select((groupCols.map(col) :+ col("_gq_n")): _*).distinct()
    val positions = groups
      .select(groupCols.map(col) :+ col("_gq_n") :+
        explode(array(qs.map(lit): _*)).as("q"): _*)
      .withColumn("_gq_pos",
        lit(1.0) + (col("_gq_n") - 1L).cast("double") * col("q"))
      .withColumn("_gq_lo", floor(col("_gq_pos")).cast("long"))
      .withColumn("_gq_hi", ceil(col("_gq_pos")).cast("long"))
      .drop("_gq_n")
    val sc = col(scoreCol)
    val hit = (if (groupCols.isEmpty) dr.crossJoin(broadcast(positions))
      else dr.join(broadcast(positions), groupCols))
      .filter(
        (col("_gq_lo") >= col("_gq_rank") &&
          col("_gq_lo") <= col("_gq_rank") + col("_rk_tie") - 1L) ||
        (col("_gq_hi") >= col("_gq_rank") &&
          col("_gq_hi") <= col("_gq_rank") + col("_rk_tie") - 1L))
    hit.groupBy((groupCols.map(col) :+ col("q")): _*)
      .agg(
        min(col("_gq_pos")).as("_gq_p"),
        min(col("_gq_lo")).as("_gq_l"),
        min(when(col("_gq_lo") >= col("_gq_rank") &&
            col("_gq_lo") <= col("_gq_rank") + col("_rk_tie") - 1L, sc))
          .as("v_lo"),
        min(when(col("_gq_hi") >= col("_gq_rank") &&
            col("_gq_hi") <= col("_gq_rank") + col("_rk_tie") - 1L, sc))
          .as("v_hi"))
      .select(groupCols.map(col) :+ col("q") :+ col("v_lo") :+ col("v_hi") :+
        (col("v_lo") + (col("_gq_p") - col("_gq_l").cast("double")) *
          (col("v_hi") - col("v_lo"))).as("value"): _*)
  }

  /** Per-group outlier trim on [[groupQuantiles]] bounds: winsorize
    * (`clip = true`, clamp the score into `[q_lo, q_hi]` as
    * `<score>_winsorized`) or truncate (`clip = false`, DROP rows
    * outside the band — the "discard length outliers per source"
    * cleaning move). Heavy-tailed signals (doc length, repetition,
    * perplexity) otherwise let a few extreme documents dominate
    * means, budgets and packing; trimming per GROUP respects that a
    * code corpus's normal length is a web corpus's outlier.
    *
    * The bounds are exact interpolated quantiles ([[groupQuantiles]]
    * — no per-group sort task, no value-map state) pivoted to one row
    * per group and broadcast; the apply side is a pure projection /
    * filter. Band membership is inclusive on both ends, so
    * `clip = false` keeps exactly the rows whose clipped value equals
    * their raw value (spec-pinned law). Fully oracle-portable. */
  def trimOutliers(df: DataFrame, scoreCol: String, qLo: Double,
      qHi: Double, groupCols: Seq[String] = Nil, clip: Boolean = false,
      fanout: Int = 64): DataFrame = {
    require(qLo < qHi, s"qLo must be below qHi, got $qLo >= $qHi")
    val bounds = groupQuantiles(df, scoreCol, Seq(qLo, qHi), groupCols,
        fanout)
      .groupBy(groupCols.map(col): _*)
      .agg(min(when(col("q") === lit(qLo), col("value"))).as("_tw_lo"),
        min(when(col("q") === lit(qHi), col("value"))).as("_tw_hi"))
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(bounds))
      else df.join(broadcast(bounds), groupCols)
    val sc = col(scoreCol).cast("double")
    if (clip)
      joined
        .withColumn(s"${scoreCol}_winsorized",
          least(greatest(sc, col("_tw_lo")), col("_tw_hi")))
        .drop("_tw_lo", "_tw_hi")
    else
      joined.filter(sc >= col("_tw_lo") && sc <= col("_tw_hi"))
        .drop("_tw_lo", "_tw_hi")
  }

  /** The deployment half of [[rankTiles]]: freeze each tile's score
    * cutoff — its inclusive INNER bound (min score per tile
    * descending, max ascending) — into a bounded
    * (group?, tile, cutoff, n_rows) artifact. Rank tiles are
    * corpus-relative, so they cannot run on a stream directly; real
    * stacks (CCNet among them) derive the cutoffs from a reference
    * corpus once and ship them as constants. `n_rows` documents the
    * calibration mass behind each cutoff. Output is groups × tiles
    * rows — a model artifact, never corpus-shaped. */
  def tileThresholds(tiled: DataFrame, scoreCol: String,
      groupCols: Seq[String] = Nil,
      ascending: Boolean = false): DataFrame =
    tiled.groupBy((groupCols :+ "tile").map(col): _*)
      .agg((if (ascending) max(col(scoreCol)) else min(col(scoreCol)))
        .as("cutoff"), count(lit(1)).as("n_rows"))

  /** Apply frozen [[tileThresholds]] to NEW documents as a pure
    * projection: `tile = |{t : score inside t's cutoff}|` — the count
    * of cutoffs strictly better than the score, clamped to the last
    * tile (per-group cutoffs ride a broadcast join; the fold over the
    * tile-sorted cutoff array is one codegen'd pass of `tiles`
    * comparisons per row). Stateless and shuffle-free, so it runs
    * ingest-time on a stream bit-identically to batch — and applying
    * a corpus's own thresholds back to that corpus reproduces
    * [[rankTiles]]' assignment exactly (ties share a tile, so tile
    * score ranges never overlap; spec-pinned). NaN scores land in
    * tile 0 descending / the last tile ascending, matching NaN's
    * compares-greatest rank position. Rows whose group has no row in
    * `thresholds` are dropped (inner join — a frozen model cannot
    * bucket a group it never saw; pre-seed the reference corpus or
    * route unseen groups separately). */
  def applyTileThresholds(df: DataFrame, thresholds: DataFrame,
      scoreCol: String, groupCols: Seq[String] = Nil,
      ascending: Boolean = false): DataFrame = {
    val cuts = thresholds
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col("tile"), col("cutoff"))))
        .as("_tc"))
      .select(groupCols.map(col) :+
        expr("transform(_tc, x -> x.cutoff)").as("_cuts"): _*)
    val joined =
      if (groupCols.isEmpty) df.crossJoin(broadcast(cuts))
      else df.join(broadcast(cuts), groupCols)
    val sc = col(scoreCol)
    val worse: Column => Column =
      if (ascending) c => sc > c else c => sc < c
    joined
      .withColumn("tile", least(size(col("_cuts")) - 1,
        aggregate(col("_cuts"), lit(0),
          (acc, c) => acc + when(worse(c), lit(1)).otherwise(lit(0))))
        .cast("int"))
      .drop("_cuts")
  }
}

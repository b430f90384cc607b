package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split assignment for training-data
  * curation: every decision is a pure function of (key, seed), so
  * re-running the pipeline — on different cluster sizes, partition
  * counts, or engine versions — selects the SAME rows. That is the
  * property `df.sample()` cannot give (its Bernoulli draw is seeded
  * per-partition, so adding an executor reshuffles the sample), and
  * the reason eval/holdout splits must never use it.
  *
  * The uniform is the first 32 bits of `md5(key ":" seed)` scaled to
  * [0,1): portable arithmetic any ANSI-SQL engine reproduces
  * bit-identically (the gate's DuckDB oracle recomputes it), and
  * a plain codegen'd projection — no shuffle, no state, trivially
  * 100 TB-safe.
  */
object Sampling {

  /** Deterministic uniform in [0,1): first 8 md5 hex chars of
    * `key ":" seed` read as a 32-bit integer, divided by 2^32.
    * Key collisions map to identical uniforms — by design (same
    * content, same fate). */
  def hashUniform(key: Column, seed: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + seed))), 1, 8),
      16, 10).cast("long").cast("double") / lit(4294967296.0)

  /** Keep each row independently with probability `rate`,
    * deterministically in `key` — the sample is stable under
    * re-partitioning, re-runs, and incremental appends (a row's fate
    * never depends on which batch it arrived in). */
  def bernoulliSample(df: DataFrame, key: Column, rate: Double,
      seed: String = "graft"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    df.filter(hashUniform(key, seed) < rate)
  }

  /** Quality-WEIGHTED sampling: keep each row with probability
    * `p = min(1, targetRate · w / mean(w))` — documents are selected
    * in proportion to a weight column (a classifier margin shifted
    * positive, an LM score, n_chars, …), the standard "sample web
    * data ∝ quality" curation move, while the expected kept fraction
    * stays ≈ `targetRate` (exactly, when no p clamps at 1). Output:
    * every row with its `p` and `keep`; filter on `keep` downstream.
    *
    * Deterministic and ENGINE-PORTABLE end to end: the mean is an
    * exact DECIMAL(38,6) sum (order-independent; weights quantized to
    * 6dp on entry) followed by ONE double division; `p` is two more
    * single IEEE ops (rate·w, ÷mean); the keep test compares the md5
    * uniform against it. Negative weights are rejected — shift the
    * signal first. Scale: one one-row aggregate broadcast (declared
    * bounded BNLJ) + a pure projection; no shuffle of the corpus. */
  def weightedBernoulli(df: DataFrame, key: Column, weight: Column,
      targetRate: Double, seed: String = "graft"): DataFrame = {
    require(targetRate >= 0.0, s"targetRate must be non-negative, got $targetRate")
    val w6 = weight.cast("decimal(38,6)")
    val stats = df.agg(
      sum(w6).as("w_sum"), count(lit(1)).as("n_rows"),
      sum(when(w6 < 0, 1L).otherwise(0L)).as("n_negative"),
      // NULL weights would silently propagate to null p/keep rows
      // (sum() skips them) — rows that downstream filters drop or keep
      // unpredictably. Loud error, like negative/all-zero weights:
      // coalesce the signal to an explicit default first.
      sum(when(w6.isNull, 1L).otherwise(0L)).as("n_null"))
    df.crossJoin(broadcast(stats))
      .withColumn("_mean_w",
        col("w_sum").cast("double") / col("n_rows").cast("double"))
      .withColumn("p", when(col("_mean_w") > 0, least(lit(1.0),
          (lit(targetRate) * w6.cast("double")) / col("_mean_w")))
        .otherwise(raise_error(lit(
          "weightedBernoulli: all weights are zero — nothing to weight by"))))
      .withColumn("keep", when(col("n_negative") > 0,
          raise_error(lit("weightedBernoulli: negative weights — shift the signal first")))
        .when(col("n_null") > 0,
          raise_error(lit("weightedBernoulli: NULL weights — coalesce the signal first")))
        .otherwise(hashUniform(key, seed) < col("p")))
      .drop("w_sum", "n_rows", "n_negative", "n_null", "_mean_w")
  }

  /** Weighted REPETITION ("epochs ∝ quality"): each document gets
    * `n_copies = floor(targetEpochs · w / mean(w) + u)` — stochastic
    * rounding by the portable uniform, so E[n_copies] is exactly the
    * real-valued target and high-weight documents repeat while
    * low-weight ones drop to zero — the duplicate-the-good-data
    * mixture move (the multiplicative sibling of [[weightedBernoulli]],
    * for when the knob is epochs, not survival). `exploded = true`
    * emits one row per copy with `copy_idx` (0-based) — the frame a
    * packing/shuffle stage consumes; otherwise one row per doc with
    * its `n_copies`. Same exact-arithmetic portability story as
    * [[weightedBernoulli]]: decimal mean, then single IEEE ops, then
    * `floor` — an ANSI oracle reproduces every copy count. The
    * explode fan-out is bounded by Σ n_copies ≈ targetEpochs · N. */
  def weightedRepeat(df: DataFrame, key: Column, weight: Column,
      targetEpochs: Double, seed: String = "graft",
      exploded: Boolean = false): DataFrame = {
    require(targetEpochs >= 0.0, s"targetEpochs must be non-negative, got $targetEpochs")
    val w6 = weight.cast("decimal(38,6)")
    val stats = df.agg(
      sum(w6).as("w_sum"), count(lit(1)).as("n_rows"),
      sum(when(w6 < 0, 1L).otherwise(0L)).as("n_negative"),
      // Same policy as weightedBernoulli: NULL weights error loudly
      // instead of yielding null n_copies rows with undefined fate.
      sum(when(w6.isNull, 1L).otherwise(0L)).as("n_null"))
    val base = df.crossJoin(broadcast(stats))
      .withColumn("_mean_w",
        col("w_sum").cast("double") / col("n_rows").cast("double"))
      .withColumn("n_copies", when(col("n_negative") > 0,
          raise_error(lit("weightedRepeat: negative weights — shift the signal first"))
            .cast("long"))
        .when(col("n_null") > 0,
          raise_error(lit("weightedRepeat: NULL weights — coalesce the signal first"))
            .cast("long"))
        .when(col("_mean_w") <= 0, raise_error(lit(
          "weightedRepeat: all weights are zero — nothing to weight by")).cast("long"))
        .otherwise(floor((lit(targetEpochs) * w6.cast("double")) / col("_mean_w") +
          hashUniform(key, seed))))
      .drop("w_sum", "n_rows", "n_negative", "n_null", "_mean_w")
    if (!exploded) base
    else base.filter(col("n_copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("n_copies") - 1)))
  }

  /** The planning step BEFORE [[mixtureSample]]/[[weightedRepeat]]:
    * given the corpus's actual per-stratum token inventory, a target
    * mixture (shares of a token budget), turn intent into the knobs
    * the samplers consume. Per stratum: its inventory (`n_docs`,
    * `n_tokens`), its `target_share` and `target_tokens`
    * (`floor(share·budget)`), the capped sampling `rate`
    * (`min(1, target/available)` — what [[mixtureSample]] takes), the
    * uncapped `epochs` ratio (what [[weightedRepeat]] takes when a
    * stratum must repeat to meet its share), and a `deficit` flag
    * (the stratum cannot meet its target at one epoch — the row a
    * mixture review reads first). Strata missing from `targetShares`
    * plan to zero — present in the output so the reviewer sees what
    * the plan EXCLUDES, not just what it keeps.
    *
    * Every number is an exact integer aggregate or a single IEEE
    * op (one multiply + floor, one division) — fully oracle-portable.
    * Scale: one map-side-combinable groupBy(stratum); the output is
    * strata-sized.
    *
    * A stratum with ZERO (or all-NULL) tokens can supply nothing:
    * its `rate` and `epochs` pin to 0.0 and `deficit` is true
    * whenever its target is positive — the explicit "this stratum
    * cannot contribute" row, rather than a NULL/NaN division leaking
    * into the samplers (which would silently plan nothing without
    * flagging the shortfall). */
  def mixturePlan(df: DataFrame, stratum: Column, nTokens: Column,
      targetShares: Map[String, Double],
      budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 1, s"budget must be positive, got $budgetTokens")
    targetShares.values.foreach(v =>
      require(v >= 0.0 && v <= 1.0, s"target share out of [0,1]: $v"))
    val share = coalesce(
      targetShares.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
        case (acc, (k, v)) =>
          when(col("source") === lit(k), lit(v)).otherwise(acc)
      }, lit(0.0))
    df.groupBy(stratum.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(nTokens.cast("long")).as("n_tokens"))
      .withColumn("target_share", share)
      .withColumn("target_tokens",
        floor(col("target_share") * lit(budgetTokens.toDouble)).cast("long"))
      .transform(attachBudgetKnobs)
  }

  /** Shared tail of the mixture planners: given `n_tokens` and
    * `target_tokens`, attach the sampler knobs — capped `rate`,
    * uncapped `epochs`, `deficit` — with the zero-/null-token guard
    * (an empty stratum plans rate/epochs 0.0 explicitly; deficit iff
    * its target is positive). */
  private def attachBudgetKnobs(planned: DataFrame): DataFrame =
    planned
      .withColumn("_empty",
        col("n_tokens").isNull || col("n_tokens") === 0L)
      .withColumn("rate", when(col("_empty"), lit(0.0))
        .otherwise(least(lit(1.0),
          col("target_tokens").cast("double") / col("n_tokens"))))
      .withColumn("epochs", when(col("_empty"), lit(0.0))
        .otherwise(col("target_tokens").cast("double") / col("n_tokens")))
      .withColumn("deficit",
        col("target_tokens") > coalesce(col("n_tokens"), lit(0L)))
      .drop("_empty")

  /** [[mixturePlan]] with TEMPERATURE-derived targets instead of a
    * hand-written share map: `share_s ∝ n_tokens_s^alpha`, the
    * standard multilingual/multi-source rebalancing rule (alpha = 1
    * keeps natural proportions, alpha → 0 approaches uniform;
    * alpha ≈ 0.3–0.7 is the usual up-weight-the-tails band). Output
    * schema = [[mixturePlan]]'s plus `weight` (the stratum's
    * unnormalized n_tokens^alpha), with the same zero-token guard
    * (rate/epochs 0.0, deficit iff target > 0 — vacuous here since a
    * zero-token stratum also gets target 0).
    *
    * Arithmetic portability tiers: alpha = 0.5 is exact cross-engine
    * (`sqrt` is a correctly-rounded IEEE op — the oracle gate's
    * configuration) and alpha = 1 trivially so; other alphas go
    * through `pow` (libm, ~1-ulp engine variance — spec-covered, not
    * hash-gated). The weight-sum behind the shares is an
    * ORDER-INDEPENDENT fold of the stratum-sorted weight array (the
    * round-10 engine-deterministic-double-sum idiom), so shares are
    * identical on every run, partitioning, and engine.
    *
    * Scale: one map-side-combinable groupBy(stratum); the inventory
    * is MATERIALIZED (`persist`) before its two consumers (the
    * weight-sum fold and the main frame) read it — unpersisted, the
    * corpus-sized groupBy would execute twice per call (the
    * vocabJoined lesson, ADVICE r10). The fold and broadcast are
    * strata-sized (one row each). */
  def mixturePlanByTemperature(df: DataFrame, stratum: Column,
      nTokens: Column, alpha: Double, budgetTokens: Long,
      persist: Persistence = Persistence.Local): DataFrame = {
    require(budgetTokens >= 1, s"budget must be positive, got $budgetTokens")
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha out of [0,1]: $alpha")
    val inv = persist(df.groupBy(stratum.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(nTokens.cast("long")).as("n_tokens"))
      .withColumn("weight", {
        val t = coalesce(col("n_tokens"), lit(0L)).cast("double")
        // A zero-/null-token stratum must weigh 0.0 at EVERY alpha:
        // pow(0.0, 0.0) = 1.0, so an unguarded alpha = 0 would hand an
        // empty stratum a full uniform share of the budget it cannot
        // supply. Guarding here (not in the pow branch) keeps the
        // scaladoc's "zero-token stratum gets target 0" true.
        when(t > 0.0, alpha match {
          case 1.0 => t
          case 0.5 => sqrt(t)
          case a => pow(t, a)
        }).otherwise(lit(0.0))
      }))
    val wsum = inv.agg(
      aggregate(
        transform(array_sort(collect_list(struct(col("source"), col("weight")))),
          x => x.getField("weight")),
        lit(0.0), (acc, w) => acc + w).as("_wsum"))
    inv.crossJoin(broadcast(wsum))
      .withColumn("target_share",
        when(col("_wsum") > 0.0, col("weight") / col("_wsum"))
          .otherwise(lit(0.0)))
      .withColumn("target_tokens",
        floor(col("target_share") * lit(budgetTokens.toDouble)).cast("long"))
      .drop("_wsum")
      .transform(attachBudgetKnobs)
  }

  /** Domain-mixture resampling: keep each row with a per-stratum rate
    * (e.g. downweight web crawl, keep all code), deterministically in
    * `key`. Strata missing from `rates` use `defaultRate`. Rates are
    * compiled into one codegen'd CASE expression — no join, no
    * shuffle, and the broadcast-a-rates-table variant is pointless
    * below thousands of strata. */
  def mixtureSample(df: DataFrame, stratum: Column, key: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      seed: String = "graft"): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0.0 && r <= 1.0, s"rates must be in [0,1], got $r"))
    val rate = rates.foldLeft(Option.empty[Column]) {
      case (acc, (name, r)) =>
        Some(acc.fold(when(stratum === name, r))(_.when(stratum === name, r)))
    }.fold(lit(defaultRate))(_.otherwise(defaultRate))
    df.filter(hashUniform(key, seed) < rate)
  }

  /** Keep at most `k` rows per stratum (e.g. per source/domain),
    * deterministically: rows are ranked within each stratum by the
    * hash uniform (ties broken by the key itself) and only the first
    * `k` survive, with their 1-based `stratum_rank` attached. This is
    * the "cap the over-represented domain" move of corpus balancing —
    * and unlike a rate-based sample, the output size per stratum is
    * exact.
    *
    * Two-phase, hot-stratum-safe: a single
    * `row_number() OVER (PARTITION BY stratum)` would sort an ENTIRE
    * stratum on one task — a billion-row domain becomes one spilling
    * external sort on one core. Instead phase 1 ranks within
    * (stratum, bucket) — `fanout` deterministic hash buckets, so a hot
    * stratum's sort is split `fanout` ways and each task keeps only
    * its bucket's top `k` — and phase 2 exact-ranks the survivors
    * (≤ `fanout`·`k` rows per stratum, KBs). Any global top-`k` row is
    * top-`k` of its own bucket, so phase 1 always passes a superset of
    * the answer through, and the output is bit-identical to the
    * single-sort spelling (spec-pinned). Costs one extra (tiny)
    * shuffle over the survivors.
    *
    * Adaptive: when phase 1 cannot filter (every stratum smaller than
    * `k`-ish), the two-phase plan sorts the whole frame twice for
    * nothing, so the cap consults the optimizer's size estimate
    * (driver-side plan stats — no extra job) and takes the
    * single-window spelling when the WHOLE input fits one task's
    * external-sort budget (`singlePhaseMaxBytes`): a stratum can never
    * out-size its frame, so the hot-stratum hazard is impossible
    * there. The default budget is deliberately small (32 MB): for a
    * parquet scan the estimate is COMPRESSED on-disk bytes, and text
    * decompresses/deserializes 5-10× — 32 MB estimated is a few
    * hundred MB of in-memory rows, the most one task's sort should
    * ever be handed. Unknown-size inputs (e.g. checkpointed frames
    * report `defaultSizeInBytes`) estimate huge and err toward the
    * bucketed plan — the safe direction. `fanout = 1` forces the
    * single-window spelling explicitly; both spellings are
    * bit-identical (spec-pinned across the k × fanout grid with the
    * dispatch pinned to each side). */
  def stratifiedCap(df: DataFrame, stratum: Column, key: Column, k: Int,
      seed: String = "graft", fanout: Int = 64,
      singlePhaseMaxBytes: Long = 32L << 20): DataFrame = {
    require(k > 0, s"cap must be positive, got $k")
    require(fanout > 0, s"fanout must be positive, got $fanout")
    val u = hashUniform(key, seed)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum).orderBy(u.asc, key.asc)
    val onePhase = fanout == 1 ||
      df.queryExecution.optimizedPlan.stats.sizeInBytes <=
        BigInt(singlePhaseMaxBytes)
    if (onePhase)
      df.withColumn("stratum_rank", row_number().over(w2))
        .filter(col("stratum_rank") <= k)
    else {
      val taken = df.columns.toSet
      val bucketCol = Iterator.from(0).map(i => s"_cap_bucket_$i")
        .find(!taken(_)).get
      val brankCol = Iterator.from(0).map(i => s"_cap_brank_$i")
        .find(!taken(_)).get
      val w1 = org.apache.spark.sql.expressions.Window
        .partitionBy(stratum, col(bucketCol)).orderBy(u.asc, key.asc)
      df.withColumn(bucketCol, pmod(hash(key), lit(fanout)))
        .withColumn(brankCol, row_number().over(w1))
        .filter(col(brankCol) <= k)
        .drop(bucketCol, brankCol)
        .withColumn("stratum_rank", row_number().over(w2))
        .filter(col("stratum_rank") <= k)
    }
  }

  /** Assign each row to one named split with probability proportional
    * to its weight (e.g. `Seq("train" -> 98, "val" -> 1, "test" -> 1)`),
    * deterministically in `key`: the same row lands in the same split
    * on every run, and a row added tomorrow cannot move today's rows —
    * the invariant that keeps a held-out set held out. Adds a `split`
    * column. */
  def splitAssign(df: DataFrame, key: Column,
      weights: Seq[(String, Double)], seed: String = "graft"): DataFrame = {
    require(weights.nonEmpty, "at least one split required")
    require(weights.forall(_._2 > 0), "split weights must be positive")
    val total = weights.map(_._2).sum
    val cuts = weights.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    val u = hashUniform(key, seed)
    // Last split is the otherwise-branch: u < 1.0 always, and an
    // explicit open-ended tail keeps float cut rounding from ever
    // leaving a row unassigned.
    val assigned = weights.init.zip(cuts).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), cut)) =>
        val cond = u < lit(cut)
        Some(acc.fold(when(cond, name))(_.when(cond, name)))
    }.fold(lit(weights.last._1))(_.otherwise(weights.last._1))
    df.withColumn("split", assigned)
  }

  /** Weighted sample WITHOUT replacement of exactly `k` rows, with
    * inclusion probability increasing in `weight` — "prefer long /
    * high-quality / rare-language docs, but keep selection
    * deterministic and re-run-stable". The Efraimidis–Spirakis
    * one-pass spelling: each row scores `u^(1/w)` on its portable
    * hash uniform and the k LARGEST scores win — provably equivalent
    * to sequential weighted draws without replacement, yet
    * embarrassingly parallel. Spark plans the selection as
    * TakeOrderedAndProject (per-partition top-k heaps merged on the
    * driver) — no global sort at any scale.
    *
    * The score is rounded to 6 decimals with a `key` tie-break so the
    * md5/pow/round arithmetic is reproducible in ANSI SQL (the gate's
    * DuckDB oracle replays the selection exactly). Weights must be
    * strictly positive; a `weighted_score` column rides along for
    * audit. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, k: Int,
      seed: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    df.filter(coalesce(
        assert_true(weight > 0,
          concat(lit("weightedSample: non-positive weight "), weight,
            lit(" — weights must be > 0 (filter or clamp first)")))
          .cast("boolean"),
        lit(true)))
      .withColumn("weighted_score",
        round(pow(hashUniform(key, seed), lit(1.0) / weight), 6))
      .orderBy(col("weighted_score").desc, key.asc)
      .limit(k)
  }

  /** [[weightedSample]] per stratum: exactly `k` rows from EACH
    * stratum (fewer if the stratum is smaller), weighted by `weight`
    * within it — "keep 10k docs per source, preferring high-quality
    * ones", the weighted counterpart of [[stratifiedCap]]'s uniform
    * cap. Same Efraimidis–Spirakis score, ranked per stratum; adds
    * `weighted_score` and the 1-based `stratum_rank`. One shuffle on
    * the stratum; the per-stratum sort is bounded by the stratum size
    * (use [[stratifiedCap]]'s bucketed idea before this if a single
    * stratum outgrows one task's sort budget). */
  def weightedStratifiedCap(df: DataFrame, stratum: Column, key: Column,
      weight: Column, k: Int, seed: String = "graft"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum)
      .orderBy(col("weighted_score").desc, key.asc)
    df.filter(coalesce(
        assert_true(weight > 0,
          concat(lit("weightedStratifiedCap: non-positive weight "),
            weight, lit(" — weights must be > 0 (filter or clamp first)")))
          .cast("boolean"),
        lit(true)))
      .withColumn("weighted_score",
        round(pow(hashUniform(key, seed), lit(1.0) / weight), 6))
      .withColumn("stratum_rank", row_number().over(w))
      .filter(col("stratum_rank") <= k)
  }

  /** Per-stratum CALIBRATED selection: keep each stratum's top
    * `keepNum/keepDen` FRACTION of rows by `score` — the per-source
    * quality cut a GLOBAL threshold gets wrong when score
    * distributions differ by source (a clean-encyclopedia source
    * would sail through a corpus-wide bar that rejects nearly all of
    * a noisy crawl; cutting each source at its own quantile keeps
    * every source's best slice and preserves the mixture).
    *
    * The keep rule is exact integer arithmetic — keep ⇔
    * `rank·keepDen ≤ n·keepNum`, rank by (`score` desc, `key` asc)
    * within the stratum — so the kept set replays bit-for-bit in any
    * engine; no float quantile estimate is involved. Every stratum
    * with ≥ keepDen/keepNum rows keeps ≥ 1; a floor of one row per
    * non-empty stratum is deliberately NOT applied (an all-junk
    * source should be allowed to vanish — apply [[stratifiedCap]]
    * first if a presence floor is wanted).
    *
    * Scale shape: ONE partitioned window computes both the rank and
    * the stratum size (shared window frame, one exchange keyed by the
    * stratum) — each task sorts only its own stratum, never the
    * corpus. Skewed strata are bounded by the largest single source,
    * the same exposure every per-source operator here carries. */
  def topFracByScore(df: DataFrame, stratum: Column, key: Column,
      score: Column, keepNum: Long, keepDen: Long): DataFrame = {
    require(keepNum >= 0, s"keepNum must be non-negative, got $keepNum")
    require(keepDen >= 1, s"keepDen must be positive, got $keepDen")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratum)
    val wo = w.orderBy(score.desc, key.asc)
    df.withColumn("stratum_rank", row_number().over(wo).cast("long"))
      .withColumn("n_stratum", count(lit(1)).over(w))
      .filter(col("stratum_rank") * keepDen <= col("n_stratum") * keepNum)
  }

  /** Token-budget cap per stratum: keep documents, in deterministic
    * portable-hash order, until the stratum's running token total
    * reaches `budget` — "at most N tokens of web crawl per source",
    * the budget-shaped sibling of [[stratifiedCap]]'s count cap. A
    * doc is kept iff the running total BEFORE it is under budget, so
    * every non-empty stratum keeps >= 1 doc and overshoot is bounded
    * by one document.
    *
    * Scale posture: ordering is (uniform, key) but the prefix sum is
    * computed per (stratum, `floor(u·fanout)` bucket) — and because
    * the bucket is MONOTONE in the same uniform, chaining the bucket
    * subtotals (a tiny per-(stratum, bucket) aggregate windowed per
    * stratum) reproduces the global prefix sum bit-exactly while no
    * task ever sorts more than one bucket of one stratum. The
    * subtotal chain join reuses the big side's (stratum, bucket)
    * partitioning. `fanout = 1` is the plain single-window spelling;
    * results are identical (spec-pinned). Arithmetic is ANSI-portable
    * (md5 uniform + integer sums) so a SQL oracle reproduces the kept
    * set exactly.
    *
    * `nTokens` is any token-count column: the whitespace/regex proxies
    * ([[graft.functions.bpe_token_count]]) or REAL merged-BPE counts
    * via `size(bpe_encode(text, merges))` with a
    * [[TextAnalysis.bpeTrain]]-learned merge list — both are pure
    * per-row projections, so the budget arithmetic is unchanged. */
  def budgetCap(df: DataFrame, stratum: Column, key: Column,
      nTokens: Column, budget: Long, seed: String = "graft",
      fanout: Int = 64): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(fanout > 0, s"fanout must be positive, got $fanout")
    val taken = df.columns.toSet
    def fresh(base: String): String =
      Iterator.from(0).map(i => s"_${base}_$i").find(!taken(_)).get
    val W = org.apache.spark.sql.expressions.Window
    val u = hashUniform(key, seed)
    if (fanout == 1) {
      val cumCol = fresh("bc_cum")
      val w = W.partitionBy(stratum).orderBy(u.asc, key.asc)
        .rowsBetween(W.unboundedPreceding, 0)
      df.withColumn(cumCol, sum(nTokens.cast("long")).over(w))
        .filter(col(cumCol) - nTokens.cast("long") < budget)
        .drop(cumCol)
    } else {
      val sCol = fresh("bc_stratum")
      val bCol = fresh("bc_bucket")
      val cumCol = fresh("bc_cum")
      val offCol = fresh("bc_off")
      val withB = df.withColumn(sCol, stratum)
        .withColumn(bCol, floor(u * fanout).cast("int"))
      val localW = W.partitionBy(col(sCol), col(bCol))
        .orderBy(u.asc, key.asc)
        .rowsBetween(W.unboundedPreceding, 0)
      val chainW = W.partitionBy(col(sCol)).orderBy(col(bCol).asc)
        .rowsBetween(W.unboundedPreceding, -1)
      val offsets = withB.groupBy(col(sCol), col(bCol))
        .agg(sum(nTokens.cast("long")).as(cumCol))
        .withColumn(offCol,
          coalesce(sum(col(cumCol)).over(chainW), lit(0L)))
        .select(col(sCol), col(bCol), col(offCol))
      withB
        .withColumn(cumCol, sum(nTokens.cast("long")).over(localW))
        .join(offsets, Seq(sCol, bCol))
        .filter(col(offCol) + col(cumCol) - nTokens.cast("long") < budget)
        .drop(sCol, bCol, cumCol, offCol)
    }
  }

  /** Token-budgeted sequence packing: group documents into
    * training-example bins ("packs") of ~`budget` tokens each — the
    * batching step between curation and tokenization in an LLM
    * pretraining pipeline. Adds `bucket`, `pack_seq` (pack index
    * within the bucket), and a globally-unique `pack_id`.
    *
    * Deterministic next-fit by hash order: each doc lands in one of
    * `buckets` independent streams (`floor(u · buckets)` on the
    * portable hash uniform — shuffle- and re-run-invariant like every
    * sampler here), is ordered within its stream by the same uniform
    * (packing wants shuffled docs — consecutive corpus order would
    * correlate pack contents), and is assigned
    * `pack_seq = cum_tokens_before DIV budget`. A pack's total can
    * overshoot `budget` by at most its largest member (next-fit's
    * standard bound, spec-pinned); a doc bigger than the whole budget
    * owns its packs alone.
    *
    * Scale posture: the only shuffle is the window over (bucket), and
    * each bucket's sort holds corpus/`buckets` rows — size `buckets`
    * to the cluster (default 1024) and no task ever sorts more than
    * its slice; there is no global order and no driver state. The
    * arithmetic (md5 uniform, integer DIV) is ANSI-portable, so the
    * gate's DuckDB oracle reproduces pack assignment bit-exactly.
    *
    * Like [[budgetCap]], `nTokens` accepts real merged-BPE counts
    * (`size(bpe_encode(text, merges))`) in place of the regex proxy —
    * spec-pinned that bins then respect the TRUE token budget. */
  def packSequences(df: DataFrame, key: Column, nTokens: Column,
      budget: Long, buckets: Int = 1024,
      seed: String = "graft"): DataFrame = {
    require(budget >= 1, s"budget must be positive, got $budget")
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    val taken = df.columns.toSet
    def fresh(base: String): String =
      Iterator.from(0).map(i => s"_${base}_$i").find(!taken(_)).get
    val uCol = fresh("pack_u")
    val cumCol = fresh("pack_cum")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col(uCol).asc, key.asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn(uCol, hashUniform(key, seed))
      .withColumn("bucket", floor(col(uCol) * buckets).cast("int"))
      .withColumn(cumCol,
        coalesce(sum(nTokens.cast("long")).over(w), lit(0L)))
      .withColumn("pack_seq", expr(s"`$cumCol` DIV $budget"))
      .withColumn("pack_id",
        col("bucket").cast("long") * lit(4294967296L) + col("pack_seq"))
      .drop(uCol, cumCol)
  }

  /** Shard manifest over [[packSequences]]' assignment: ONE row per
    * pack with its population (`n_docs`), token mass (`n_tokens`),
    * budget fill ratio, and a content fingerprint (`ids_md5`, the md5
    * of the ascending comma-joined member keys). This is the
    * reproducibility artifact a training run publishes next to its
    * shards — a resumed or re-provisioned trainer diffs manifests
    * instead of re-reading data, and any engine/partitioning change
    * that silently moved a document between packs shows up as a
    * fingerprint mismatch, by pack, before a single batch trains.
    *
    * Scale: the pack assignment's own per-bucket window plus one
    * groupBy(pack_id) whose per-group state is budget-bounded (a
    * pack holds at most `budget` tokens, so its member list is
    * bounded for any corpus whose docs have ≥ 1 token — degenerate
    * zero-token floods belong to the quality gate upstream). Exact
    * integers + md5 — fully oracle-portable. */
  def packManifest(df: DataFrame, key: Column, nTokens: Column,
      budget: Long, buckets: Int = 1024,
      seed: String = "graft"): DataFrame = {
    val assigned = packSequences(df, key, nTokens, budget, buckets, seed)
    // Collision-guarded temp names (the fresh() pattern of
    // packSequences / Ranking.distinctRanks): an input frame already
    // carrying a bookkeeping name must not be silently overwritten.
    val taken = assigned.columns.toSet
    def fresh(base: String): String =
      Iterator.from(0).map(i => s"_${base}_$i").find(!taken(_)).get
    val mk = fresh("mk")
    val mt = fresh("mt")
    val packed = assigned
      .withColumn(mk, key).withColumn(mt, nTokens.cast("long"))
    packed.groupBy(col("pack_id"))
      .agg(min(col("bucket")).as("bucket"),
        min(col("pack_seq")).as("pack_seq"),
        count(lit(1)).as("n_docs"),
        sum(col(mt)).as("n_tokens"),
        md5(concat_ws(",",
          transform(array_sort(collect_list(col(mk))),
            _.cast("string")))).as("ids_md5"))
      .select(col("pack_id"), col("bucket"), col("pack_seq"),
        col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / lit(budget.toDouble))
          .as("fill_ratio"), col("ids_md5"))
  }

  /** The materialization step of [[packSequences]]: assemble each
    * pack's member texts — in the pack's own deterministic
    * (uniform, key) order — into ONE training-example string joined
    * by `sep`, plus the bookkeeping a writer wants next to it
    * (member count, character total, md5 of the assembled bytes).
    * This is the last hop before tokenize-and-train: packs become
    * rows a shard writer dumps verbatim, and the md5 column makes the
    * written shards diffable the same way [[packManifest]] makes the
    * assignment diffable.
    *
    * Scale: the pack assignment's window plus one groupBy(pack_id)
    * whose per-group state is the pack's own members — budget-bounded
    * like [[packManifest]]'s. The in-pack order is recomputed from
    * the same pure (key, seed) uniform, so assembly is deterministic
    * across engines, partitionings and re-runs (oracle replays the
    * md5 exactly). */
  def packText(df: DataFrame, key: Column, textCol: Column,
      nTokens: Column, budget: Long, buckets: Int = 1024,
      seed: String = "graft", sep: String = "\n\n"): DataFrame = {
    val assigned = packSequences(df, key, nTokens, budget, buckets, seed)
    val taken = assigned.columns.toSet
    def fresh(base: String): String =
      Iterator.from(0).map(i => s"_${base}_$i").find(!taken(_)).get
    val u = fresh("pt_u")
    val k = fresh("pt_k")
    val t = fresh("pt_t")
    val packed = assigned
      .withColumn(u, hashUniform(key, seed))
      .withColumn(k, key)
      .withColumn(t, textCol)
    packed.groupBy(col("pack_id"))
      .agg(min(col("bucket")).as("bucket"),
        min(col("pack_seq")).as("pack_seq"),
        count(lit(1)).as("n_docs"),
        array_join(transform(
          array_sort(collect_list(struct(col(u), col(k), col(t)))),
          _.getField(t)), sep).as("text"))
      .select(col("pack_id"), col("bucket"), col("pack_seq"),
        col("n_docs"), length(col("text")).cast("long").as("n_chars"),
        md5(col("text")).as("text_md5"), col("text"))
  }

  /** Deterministic global shuffle for training-data ordering: assigns
    * every row a reproducible position — `(shuffle_bucket, shuffle_pos)`,
    * globally ordered as bucket-major — that is a pure function of
    * (key, seed). Training runs need the corpus in a "random" order
    * that is nonetheless IDENTICAL across re-runs, engines, partition
    * counts, and resumptions (a re-shuffled corpus breaks data-order
    * reproducibility of the run); `df.orderBy(rand())` promises none
    * of that.
    *
    * Scale posture is [[packSequences]]'s: the md5-uniform draw
    * spreads rows over `buckets` pseudo-random buckets, and the only
    * shuffle is the per-bucket window — each task sorts corpus/`buckets`
    * rows, there is NO global sort and no driver state. Size `buckets`
    * to the cluster (default 1024); a trainer reads buckets in index
    * order, rows in `shuffle_pos` order within each. Ties on the
    * 32-bit draw break by key, so positions are total and the oracle
    * reproduces them bit-exactly. */
  def deterministicShuffle(df: DataFrame, key: Column,
      buckets: Int = 1024, seed: String = "graft"): DataFrame = {
    require(buckets >= 1, s"buckets must be positive, got $buckets")
    val taken = df.columns.toSet
    val clash = Seq("shuffle_bucket", "shuffle_pos").filter(taken)
    require(clash.isEmpty,
      s"deterministicShuffle writes ${clash.mkString(", ")} but the input " +
        "already has such column(s) — rename them first (silent overwrite refused)")
    def fresh(base: String): String =
      Iterator.from(0).map(i => s"_${base}_$i").find(!taken(_)).get
    val uCol = fresh("shuffle_u")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shuffle_bucket")).orderBy(col(uCol).asc, key.asc)
    df.withColumn(uCol, hashUniform(key, seed))
      .withColumn("shuffle_bucket", floor(col(uCol) * buckets).cast("int"))
      .withColumn("shuffle_pos", row_number().over(w).cast("long") - 1L)
      .drop(uCol)
  }
}

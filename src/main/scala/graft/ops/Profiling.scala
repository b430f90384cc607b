package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution diagnostics run BEFORE committing to a partitioning:
  * the pre-flight check for every big join/groupBy in this library.
  * A key whose top hitter carries 30% of the rows will strand one
  * reducer at 100 TB — this is the operator that says so ahead of
  * time (and whose output picks the salting factor for
  * [[Bucketing.saltedJoin]]). */
object Profiling {

  /** Top-`k` heaviest values of `key` with exact counts, dense rank
    * (ties by value string ascending) and row share. One
    * map-side-combining groupBy then TakeOrderedAndProject — the
    * hottest key reaches its reducer pre-combined to one row per map
    * task, and the value space is never globally sorted. The total
    * behind `share` is re-aggregated from the counts frame (not a
    * second scan of `df`): both plan branches sit on the identical
    * groupBy exchange, so ReuseExchange reads the raw input once —
    * one pass, as a pre-flight over 100 TB must be. */
  def hotKeys(df: DataFrame, key: Column, k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val counts = df
      .select(key.cast("string").as("key_value"))
      .groupBy(col("key_value"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts
      .orderBy(col("cnt").desc, col("key_value").asc)
      .limit(k)
      // k winner rows only — the partition-less window is benign here
      // (same pattern as TextAnalysis.vocabProfile's rank).
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("key_value").asc)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("key_value"), col("cnt"),
        (col("cnt").cast("double") / col("total")).as("share"))
  }

  /** One-row key-health summary: row count, exact distinct count, the
    * top hitter's count, and max/mean skew ratios (top count vs total
    * and vs the perfectly-uniform per-key share). `skew_uniform` ≈ 1
    * means safe to hash-partition by this key; tens-and-up means salt
    * or pre-aggregate first. Exact counts — the distinct aggregate
    * shuffles (key) once; swap in approx_count_distinct upstream if a
    * 100 TB profile only needs the ratio's magnitude. */
  def keyStats(df: DataFrame, key: Column): DataFrame =
    df
      .select(key.cast("string").as("key_value"))
      .groupBy(col("key_value"))
      .agg(count(lit(1)).as("cnt"))
      .agg(sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("top_cnt"))
      .select(col("n_rows"), col("n_keys"), col("top_cnt"),
        (col("top_cnt").cast("double") / col("n_rows")).as("top_share"),
        (col("top_cnt").cast("double") * col("n_keys") / col("n_rows"))
          .as("skew_uniform"))

  /** Cross-source duplication audit: for every ordered source pair
    * (src_a, src_b), how many word `n`-gram shingle types the two
    * sources share (`n_shared_grams`) and how many of src_a's
    * documents contain at least one gram that also occurs somewhere
    * in src_b (`n_docs_overlap`, plus the fraction of src_a that is).
    * This is the corpus-governance table read before mixing sources
    * into a training set — a pair with a high `overlap_frac` means
    * one source is substantially mirrored in the other, and
    * cross-source dedup (or dropping one side) should come first.
    *
    * Scale: the doc-gram frame is corpus-sized but the gram→source
    * frame it joins against is VOCABULARY × sources (distinct gram
    * types per source, never per occurrence), and every fan-out is
    * bounded by the number of sources S — a boilerplate gram present
    * in all sources expands each of its doc rows S ways, no more.
    * The final tables are S·(S−1) rows. Exact integer counts and one
    * fixed-order division — fully oracle-portable. Pairs with zero
    * overlap are omitted (the join support is identical on any
    * engine). If a skew pre-flight ([[keyStats]] on the gram column)
    * shows pathological hot grams, dedup the boilerplate first
    * ([[Dedup.dedupLines]]) rather than capping here — a cap would
    * silently understate exactly the overlap this audit exists to
    * expose. */
  /** Snapshot diff between two corpus versions: one row per doc_id
    * present in either, labeled `added` / `removed` / `changed` /
    * `unchanged` by comparing content md5s. The audit run between
    * ingest cycles — "what actually moved since the last training
    * set" — and the input to incremental downstream work (re-embed /
    * re-dedup only `added`+`changed`).
    *
    * Scale: ONE full-outer equi-join on doc_id; md5s are computed in
    * the map phase so only (doc_id, 32-byte hash) pairs shuffle, never
    * document text. Exact and engine-portable. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select(col("doc_id"), md5(col("text")).as("old_md5"))
    val nw = newDocs.select(col("doc_id"), md5(col("text")).as("new_md5"))
    o.join(nw, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("old_md5"), col("new_md5"),
        when(col("old_md5").isNull, lit("added"))
          .when(col("new_md5").isNull, lit("removed"))
          .when(col("old_md5") === col("new_md5"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Heavy-hitter word `n`-grams: the `k` gram types present in the
    * most documents, with exact document frequency (`n_docs`), total
    * occurrence count (`n_occ`) and the fraction of the corpus
    * carrying each (`doc_share`). This is the pre-flight that SETS
    * the dedup stack's `maxShingleDf` cap: the boilerplate gram that
    * would make an inverted-index bucket's self-join df²/2 shows up
    * here first, by name, with its blast radius quantified — and the
    * same table is the C4-style "remove the boilerplate line" work
    * list.
    *
    * Scale: one map-side-combining groupBy on the gram (the hottest
    * gram reaches its reducer pre-combined per map task) feeding a
    * `TakeOrderedAndProject` top-k — the gram space is never globally
    * sorted and only k winner rows cross the driver boundary. The
    * doc-frequency distinct is exact (count_distinct per gram); the
    * tie-break (n_docs desc, n_occ desc, gram asc) is a total order,
    * so the cut is deterministic and oracle-portable. */
  def heavyGrams(docs: DataFrame, n: Int = 3, k: Int = 50): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    require(k >= 1, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col("doc_id"), explode(graft.functions.array_shingles(
        graft.functions.word_tokens(col("text")), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occ"), count_distinct(col("doc_id")).as("n_docs"))
    val total = docs.agg(count(lit(1)).as("nd"))
    counts
      .orderBy(col("n_docs").desc, col("n_occ").desc, col("gram").asc)
      .limit(k)
      // k winner rows only — the partition-less window is benign here
      // (hotKeys' pattern).
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_docs").desc, col("n_occ").desc, col("gram").asc)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("gram"), col("n_docs"), col("n_occ"),
        (col("n_docs").cast("double") / col("nd")).as("doc_share"))
  }

  /** Lexical divergence between two corpora as EXACT arithmetic:
    * total-variation distance between their word `n`-gram unigram
    * distributions, `tvd = Σ_g |cnt_a(g)·T_b − cnt_b(g)·T_a| /
    * (2·T_a·T_b)`. The cross-multiplied integer numerator makes the
    * whole computation order-independent DECIMAL sums plus a fixed
    * chain of three IEEE divisions at the end — no logs (KL/JS's libm
    * calls are the known cross-engine hazard), no per-group state, no
    * collect. This is the corpus-governance "how far apart are these
    * two sources / how far did the corpus move between snapshots"
    * number — the lexical sibling of [[graft.ops.Drift.categoryDrift]]
    * (which watches a BOUNDED category mix; this watches the unbounded
    * vocabulary, which is why it must stay a groupBy, never a
    * histogram fold).
    *
    * Output: ONE row — (n_grams_union, t_a, t_b, tvd). Scale: one
    * map-side-combinable gram count per side, one full-outer equi-join
    * on the gram, one aggregation; gram frames are vocabulary-sized,
    * never occurrence-sized. */
  def vocabDivergence(a: DataFrame, b: DataFrame, n: Int = 1,
      persist: Persistence = Persistence.Local): DataFrame =
    vocabJoined(a, b, n, persist)
      .agg(count(lit(1)).as("n_grams_union"),
        sum(col("na")).as("t_a"), sum(col("nb")).as("t_b"),
        sum(abs(col("na").cast("decimal(38,0)") * col("_gtb") -
          col("nb").cast("decimal(38,0)") * col("_gta"))).as("_num"),
        // The per-gram frame carries each side's (constant) total on
        // every row — max() just reads it back without a second pass.
        max(col("_gta")).as("_t1"), max(col("_gtb")).as("_t2"))
      .select(col("n_grams_union"), col("t_a"), col("t_b"),
        (col("_num").cast("double") / col("_t1").cast("double") /
          col("_t2").cast("double") / lit(2.0)).as("tvd"))

  /** The top-`k` grams DRIVING a [[vocabDivergence]] gap: ranked by
    * the same exact cross-multiplied delta, with each side's count
    * and single-division share. The review list a governance pass
    * reads when the one-number divergence moves ("`function` and
    * `copyright` exploded in the new snapshot"). TakeOrderedAndProject
    * — the vocabulary is never globally sorted; ties break by gram. */
  def vocabMovers(a: DataFrame, b: DataFrame, n: Int = 1,
      k: Int = 20, persist: Persistence = Persistence.Local): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    vocabJoined(a, b, n, persist)
      .withColumn("_delta",
        abs(col("na").cast("decimal(38,0)") * col("_gtb") -
          col("nb").cast("decimal(38,0)") * col("_gta")))
      .orderBy(col("_delta").desc, col("gram").asc)
      .limit(k)
      .select(col("gram"), col("na"), col("nb"),
        (col("na").cast("double") / col("_gta").cast("double"))
          .as("share_a"),
        (col("nb").cast("double") / col("_gtb").cast("double"))
          .as("share_b"))
  }

  /** Shared core: per-gram counts of both corpora full-outer-joined,
    * zero-coalesced, with each side's total (`_gta`/`_gtb`, one-row
    * broadcast) attached. The joined gram frame is MATERIALIZED
    * (`persist`) before the totals branch reads it: the totals
    * aggregate and the main frame are two consumers, and without the
    * checkpoint both the full-outer gram join and the two per-side
    * counts would execute twice per call (ADVICE r10). */
  private def vocabJoined(a: DataFrame, b: DataFrame, n: Int,
      persist: Persistence): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    def counts(df: DataFrame, out: String): DataFrame = df
      .select(explode(graft.functions.array_shingles(
        graft.functions.word_tokens(col("text")), n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as(out))
    val ca = counts(a, "na")
    val cb = counts(b, "nb")
    val joined = persist(ca.join(cb, Seq("gram"), "full_outer")
      .select(col("gram"), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb")))
    joined
      .crossJoin(broadcast(joined.agg(
        sum(col("na").cast("decimal(38,0)")).as("_gta"),
        sum(col("nb").cast("decimal(38,0)")).as("_gtb"))))
  }

  /** [[corpusDiff]] rolled up to the one-row governance number: how
    * much moved between two corpus snapshots — per-status counts and
    * `churn_frac` (changed + added + removed over the union size).
    * The line a nightly ingest report leads with; when it jumps, the
    * per-doc diff is the drill-down. Exact integer counts + one
    * division; one aggregation over the diff frame (which itself
    * shuffles only (doc_id, md5) pairs, never text). */
  def corpusChurn(oldDocs: DataFrame, newDocs: DataFrame): DataFrame =
    corpusDiff(oldDocs, newDocs)
      .agg(count(lit(1)).as("n_union"),
        sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("status") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("status") === "unchanged", 1L).otherwise(0L))
          .as("n_unchanged"))
      .withColumn("churn_frac",
        (col("n_added") + col("n_removed") + col("n_changed"))
          .cast("double") / col("n_union"))

  def sourceOverlap(docs: DataFrame, n: Int = 3): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    val sh = docs.select(col("doc_id"), col("source"),
      explode(array_distinct(graft.functions.array_shingles(
        graft.functions.word_tokens(col("text")), n))).as("gram"))
    val gs = sh.select(col("source"), col("gram")).distinct()
    // ONE corpus-side join feeds both aggregates below; its inputs
    // shuffle on gram once each, and the two consumers sit on
    // identical exchange subtrees (ReuseExchange re-reads the shuffle
    // files instead of re-tokenizing the corpus).
    val j = sh.select(col("doc_id"), col("source").as("src_a"), col("gram"))
      .join(gs.select(col("source").as("src_b"), col("gram")), "gram")
      .filter(col("src_a") =!= col("src_b"))
    val gramPairs = j.select(col("gram"), col("src_a"), col("src_b"))
      .distinct()
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared_grams"))
    val docHits = j.select(col("doc_id"), col("src_a"), col("src_b"))
      .distinct()
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_docs_overlap"))
    val perSource = docs.groupBy(col("source").as("src_a"))
      .agg(count(lit(1)).as("n_docs_a"))
    gramPairs.join(docHits, Seq("src_a", "src_b"))
      .join(perSource, "src_a")
      .select(col("src_a"), col("src_b"), col("n_shared_grams"),
        col("n_docs_overlap"), col("n_docs_a"),
        (col("n_docs_overlap").cast("double") / col("n_docs_a"))
          .as("overlap_frac"))
  }

  /** The portable 32-bit hash the sketch family runs on — the integer
    * numerator of [[Sampling.hashUniform]] (first 8 md5 hex chars),
    * so DuckDB derives identical values. */
  private def hash32(key: Column, seed: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + seed))), 1, 8),
      16, 10).cast("long")

  /** Per-group distinct-cardinality estimation via the KMV sketch
    * ([[graft.functions.KmvSketch]]) — `count_distinct` with O(k)
    * per-group state instead of a distinct-key-sized shuffle. The
    * motivating 100 TB question: "how big is each source's
    * vocabulary?" — exact `count_distinct(token)` shuffles every
    * distinct token per source; this shuffles one ≤k-long buffer per
    * source (map-side partials combine inside the Aggregator).
    *
    * Emits one row per group plus an `__all__` row whose sketch is
    * the UNION of the per-group sketches — merged in plain SQL over
    * the (groups × k)-bounded buffers, never re-reading the data:
    * exactly how per-day / per-shard sketches roll up to corpus
    * totals in production. Estimator (exact long arithmetic, oracle-
    * replayable): `n_kept < k` → the buffer saw every distinct hash,
    * estimate is exact; else `(k−1)·2³² div kth_min`.
    *
    * Output: (scope, n_kept, kth_min, est_distinct). */
  def distinctKmv(df: DataFrame, key: Column, group: Column, k: Int = 64,
      seed: String = "kmv"): DataFrame =
    kmvEstimate(kmvSketches(df, key, group, k, seed), k)

  /** The per-group sketch frame: (scope, mins) with `mins` sorted
    * distinct, length ≤ k. */
  private def kmvSketches(df: DataFrame, key: Column, group: Column,
      k: Int, seed: String): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.select(group.as("scope"), hash32(key, seed).as("h"))
      .filter(col("h").isNotNull)
      .groupBy(col("scope"))
      .agg(graft.functions.KmvSketch.kmv_min_hashes(col("h"), k).as("mins"))
  }

  /** Per-group estimates + the `__all__` union row from a sketch
    * frame. The corpus-level merge is the k smallest DISTINCT values
    * across all buffers — groups×k longs, a bounded second job that
    * never touches the raw data. */
  private def kmvEstimate(sketches: DataFrame, k: Int): DataFrame = {
    // (k−1)·2³² fits a long (k ≤ 2³¹); the DIV must be true integer
    // division — a double divide + floor can cross an integer
    // boundary by one ulp and disagree with DuckDB's `//`.
    val full = (k - 1).toLong * 4294967296L
    val merged = sketches
      .select(explode(col("mins")).as("h")).distinct()
      .agg(graft.functions.collect_top_k_asc(col("h"), k).as("mins"))
      .select(lit("__all__").as("scope"), col("mins"))
    sketches.unionByName(merged)
      .select(col("scope"), size(col("mins")).as("n_kept"),
        element_at(col("mins"), -1).as("kth_min"))
      .select(col("scope"), col("n_kept"), col("kth_min"),
        when(col("n_kept") < k, col("n_kept").cast("long"))
          .otherwise(expr(s"CAST($full AS BIGINT) DIV kth_min"))
          .as("est_distinct"))
  }

  /** Persist the per-group KMV sketches with their parameters — the
    * daily-rollup artifact: tomorrow's batch merges against THIS
    * (groups × k longs) instead of re-scanning today's corpus. */
  def saveKmvSketches(df: DataFrame, key: Column, group: Column,
      dir: String, k: Int = 64, seed: String = "kmv"): Unit =
    kmvSketches(df, key, group, k, seed)
      .select(col("scope"), col("mins"), lit(k).as("k"), lit(seed).as("seed"))
      .write.mode("overwrite").parquet(dir)

  /** Distinct-cardinality estimates over (saved history ∪ new batch)
    * WITHOUT re-reading history's raw data: the saved buffers re-enter
    * the aggregation as plain hash values (KMV insertion dedups, so
    * replaying a buffer is the lossless sketch-union — append over an
    * index EQUALS the direct sketch of the union, spec-pinned and the
    * gate's oracle law). k and the hash seed come FROM the index —
    * the params-staleness hazard of a caller re-hashing with a
    * different seed cannot arise. */
  def distinctKmvAppend(spark: org.apache.spark.sql.SparkSession,
      dir: String, df: DataFrame, key: Column, group: Column): DataFrame = {
    val saved = spark.read.parquet(dir)
    // One row of the (groups)-sized index frame — a bounded driver
    // read, same contract as the IVF index params guard.
    val p = saved.select(col("k"), col("seed")).limit(1).collect()
    require(p.nonEmpty, s"empty KMV sketch index at $dir")
    val (k, seed) = (p.head.getInt(0), p.head.getString(1))
    val merged = saved.select(col("scope"), explode(col("mins")).as("h"))
      .unionByName(df.select(group.as("scope"), hash32(key, seed).as("h"))
        .filter(col("h").isNotNull))
      .groupBy(col("scope"))
      .agg(graft.functions.KmvSketch.kmv_min_hashes(col("h"), k).as("mins"))
    kmvEstimate(merged, k)
  }

  /** Count-min-sketch frequency estimation over the token stream —
    * the bounded-state sibling of [[heavyGrams]]. The sketch is a
    * d×w integer matrix: every token increments one bucket per depth
    * (`hash_j(tk) mod w`), and a token's estimate is the MIN of its d
    * buckets — an upper bound on the true count (collisions only ever
    * ADD; the ≥-truth law is spec-pinned). At 100 TB the sketch build
    * is the only full-data pass and its shuffle is bounded at d·w
    * rows per map task (the explode tripling is pre-combined by the
    * partial groupBy), where [[heavyGrams]]' exact count shuffles the
    * whole vocabulary. Sketches from disjoint shards merge by matrix
    * addition — the same groupBy spelling over their union.
    *
    * The exact side here (true counts + the top-k probe set) is the
    * gate's demonstration harness: production pairs the sketch with
    * an externally supplied probe list (the blocklist, yesterday's
    * heavy hitters) and never materializes exact counts.
    *
    * Output: (rank, tk, true_cnt, est_cnt), est_cnt ≥ true_cnt. */
  def heavyCms(docs: DataFrame, d: Int = 3, w: Int = 512, k: Int = 20): DataFrame = {
    require(d >= 1 && w >= 1 && k >= 1, s"bad cms params d=$d w=$w k=$k")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(
      explode(graft.functions.word_tokens(col("text"))).as("tk"))
    def buckets(tk: Column): Column = array((0 until d).map(j =>
      struct(lit(j).as("depth"), pmod(hash32(tk, "cms" + j), lit(w.toLong))
        .as("bucket"))): _*)
    val sketch = toks.select(explode(buckets(col("tk"))).as("db"))
      .groupBy(col("db.depth").as("depth"), col("db.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val probes = toks.groupBy(col("tk"))
      .agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("tk").asc)
      .limit(k)
      // k winner rows only — partition-less window benign (hotKeys).
      .withColumn("rank", row_number().over(
        Window.orderBy(col("true_cnt").desc, col("tk").asc)))
    probes
      .select(col("rank"), col("tk"), col("true_cnt"),
        explode(buckets(col("tk"))).as("db"))
      .join(broadcast(sketch), col("db.depth") === col("depth") &&
        col("db.bucket") === col("bucket"))
      .groupBy(col("rank"), col("tk"), col("true_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
  }

  /** Mergeable fixed-bin histogram → approximate per-group quantiles,
    * the bounded-state sibling of [[Ranking.groupQuantiles]]' exact
    * interpolation. State per group is `bins` longs (additive across
    * shards — merging is vector addition, i.e. the same groupBy over
    * a union), vs. the distinct-value-sized rank frame the exact
    * spelling shuffles. The estimate is the LOWER BOUND of the first
    * bin whose cumulative count reaches `ceil(q·n)` — documented
    * floor semantics, error ≤ binWidth, and every step is integer
    * arithmetic (`cum·qd ≥ n·qn` avoids the ceil entirely), so the
    * oracle replays it bit-for-bit. Values ≥ binWidth·(bins−1) clamp
    * into the last bin.
    *
    * Output: one row per group — (scope, n, q1_lo, q2_lo, ...), one
    * column per requested quantile `qn/qd` named `p<100·q>_lo`. */
  def histQuantiles(df: DataFrame, value: Column, group: Column,
      binWidth: Long = 16L, bins: Int = 128,
      qs: Seq[(Int, Int)] = Seq((1, 2), (9, 10), (99, 100))): DataFrame = {
    require(binWidth >= 1 && bins >= 2, s"bad hist params $binWidth/$bins")
    require(qs.nonEmpty && qs.forall { case (n0, d0) =>
      n0 >= 1 && n0 <= d0 }, s"quantiles must be in (0,1]: $qs")
    import org.apache.spark.sql.expressions.Window
    val binned = df
      .select(group.as("scope"), value.cast("long").as("v"))
      .select(col("scope"),
        least(expr(s"v DIV $binWidth"), lit((bins - 1).toLong)).as("bin"))
    val cum = binned.groupBy(col("scope"), col("bin"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("scope")).orderBy(col("bin"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("scope"))))
    val qCols = qs.map { case (qn, qd) =>
      val name = f"p${qn * 100 / qd}%d_lo"
      (min(when(col("cum") * qd >= col("n") * qn, col("bin"))) * binWidth)
        .as(name)
    }
    cum.groupBy(col("scope"))
      .agg(max(col("n")).as("n"), qCols: _*)
  }
}

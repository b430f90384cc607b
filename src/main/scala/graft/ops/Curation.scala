package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end curation decision: one call that composes the
  * quality gate ([[TextAnalysis.qualityFilter]]), near-duplicate
  * keep-one ([[Dedup.ngramJaccardPairs]] → [[Dedup.components]]), and
  * eval-set decontamination ([[Decontamination.flagContaminated]])
  * into a single per-document verdict frame — the decision table a
  * training-data pipeline materializes before writing shards.
  *
  * Every document comes back with its reason flags, not just the
  * survivors: `keep = quality_keep AND NOT dup_loser AND NOT
  * contaminated`. Eval documents passed in `evalDocs` that also occur
  * in `docs` flag themselves contaminated (they share their own
  * grams) — exactly what you want: the eval set can never leak into
  * the training split.
  *
  * Scale shape is the union of its parts, each independently
  * 100 TB-audited: candidate generation by df-capped shingle
  * equi-join, O(log L) pointer-jumping components, broadcast eval
  * grams, and map-side-combinable aggregations throughout.
  *
  * The three branches share ONE materialized token index
  * (`doc_id, toks` via [[graft.functions.word_tokens]], repartitioned
  * by doc_id once): quality, dedup, and decontamination previously
  * each re-scanned the source and re-tokenized the corpus; now the
  * scan + tokenize + spread are paid once and every branch derives
  * its grams from the cached arrays ([[graft.functions.array_shingles]]
  * / array_gram_stats — byte-identical to the text path, spec-pinned),
  * joining back on doc_id only.
  */
object Curation {

  /** `classifierWeights` (optional) arms the LEARNED quality branch:
    * documents are scored by [[TextAnalysis.classifierScoreFromTokens]]
    * against the supplied model (typically a
    * [[TextAnalysis.classifierTrain]] output) over the SAME shared
    * token index, and `classifier_keep = margin ≥ classifierMinMargin`
    * joins the verdict columns and the final `keep` conjunction. The
    * margin (`sum_w / n_grams`) is the thresholded quantity — the
    * monotone-equivalent of the sigmoid score and the cross-engine-
    * exact one. `classifierWordNgrams` MUST match the value the
    * weights were trained with ([[TextAnalysis.classifierTrain]]'s
    * `wordNgrams`) — a mismatch silently applies the model to a
    * different feature map and the verdicts are meaningless. Empty
    * weights (the default) leave the output schema and semantics
    * exactly as before — the heuristic quality gate alone. */
  def pipeline(docs: DataFrame, evalDocs: DataFrame,
      shingleN: Int = 3, jaccard: Double = 0.8, maxShingleDf: Int = 10,
      decontamN: Int = 13,
      minTokens: Int = 25, maxTokens: Int = 100000,
      maxTopGramFrac: Double = 0.09, maxDupGramFrac: Double = 0.09,
      persist: Persistence = Persistence.Local,
      classifierWeights: Seq[Double] = Nil,
      classifierBias: Double = 0.0,
      classifierMinMargin: Double = 0.0,
      classifierWordNgrams: Int = 2): DataFrame = {
    // Lazy: the dedup branch's (eager) shingle-index job is the first
    // consumer and materializes the token index inside ITS job — one
    // serial barrier instead of two; quality/decontamination then read
    // the cached blocks.
    val base = persist.lazily(Spread.keyed(docs, col("doc_id"))
      .select(col("doc_id"),
        graft.functions.word_tokens(col("text")).as("toks")))
    val quality = TextAnalysis.qualityFilterFromTokens(base, minTokens,
        maxTokens, maxTopGramFrac, maxDupGramFrac)
      .select(col("doc_id"), col("keep").as("quality_keep"))
    val losers = Dedup.components(
        Dedup.ngramJaccardPairsFromTokens(base, shingleN, jaccard,
          maxShingleDf, persist),
        persist = persist)
      .filter(col("component_id") =!= col("doc_id"))
      .select(col("doc_id"), lit(true).as("dup_loser"))
    val contaminated = Decontamination.flagContaminatedFromTokens(
        base, evalDocs, decontamN)
      .select(col("doc_id"), lit(true).as("contaminated"))
    val joined = docs.select(col("doc_id"))
      .join(quality, Seq("doc_id"))
      .join(losers, Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
    val heuristicKeep =
      col("quality_keep") && !coalesce(col("dup_loser"), lit(false)) &&
        !coalesce(col("contaminated"), lit(false))
    if (classifierWeights.isEmpty)
      joined.select(
        col("doc_id"),
        col("quality_keep"),
        coalesce(col("dup_loser"), lit(false)).as("dup_loser"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"),
        heuristicKeep.as("keep"))
    else {
      val learned = TextAnalysis.classifierScoreFromTokens(
          base, classifierWeights, classifierBias, classifierWordNgrams)
        .select(col("doc_id"),
          (when(col("n_grams") > 0, col("sum_w") / col("n_grams"))
            .otherwise(lit(0.0)) >= lit(classifierMinMargin))
            .as("classifier_keep"))
      joined.join(learned, Seq("doc_id"))
        .select(
          col("doc_id"),
          col("quality_keep"),
          col("classifier_keep"),
          coalesce(col("dup_loser"), lit(false)).as("dup_loser"),
          coalesce(col("contaminated"), lit(false)).as("contaminated"),
          (heuristicKeep && col("classifier_keep")).as("keep"))
    }
  }

  /** [[pipeline]] with the learned gate's margin threshold DERIVED
    * from a labeled calibration frame instead of hand-set: the
    * calibration docs (`doc_id`, `text`, `labelCol` ∈ {0,1} — a held-
    * out labeled sample, typically the trainer's eval split) are
    * scored with the same weights the gate will run, swept into a
    * [[TextAnalysis.rocCurve]], and the operating point picked by
    * [[TextAnalysis.pickThreshold]] at `targetPrecision` becomes
    * `classifierMinMargin`. This closes the deployment loop: train →
    * calibrate → gate, with no human-chosen magic number between the
    * model and the corpus. Throws when no threshold meets the target
    * (an uncalibratable gate must fail loudly, not run at an arbitrary
    * point). The calibration pass is calibration-set-sized (score
    * projection + the bucketed ROC) and collects ONE row; the corpus
    * pipeline is unchanged. */
  def pipelineWithCalibratedGate(docs: DataFrame, evalDocs: DataFrame,
      calibDocs: DataFrame, labelCol: String, targetPrecision: Double,
      classifierWeights: Seq[Double], classifierBias: Double = 0.0,
      classifierWordNgrams: Int = 2,
      shingleN: Int = 3, jaccard: Double = 0.8, maxShingleDf: Int = 10,
      decontamN: Int = 13,
      minTokens: Int = 25, maxTokens: Int = 100000,
      maxTopGramFrac: Double = 0.09, maxDupGramFrac: Double = 0.09,
      persist: Persistence = Persistence.Local): DataFrame = {
    require(classifierWeights.nonEmpty,
      "pipelineWithCalibratedGate needs classifier weights to calibrate")
    val scored = TextAnalysis.classifierScore(calibDocs, classifierWeights,
        classifierBias, classifierWordNgrams)
      .withColumn("margin", when(col("n_grams") > 0,
        col("sum_w") / col("n_grams")).otherwise(lit(0.0)))
      .join(calibDocs.select(col("doc_id"), col(labelCol).as("label")),
        "doc_id")
    val pick = TextAnalysis.pickThreshold(
      TextAnalysis.rocCurve(scored, "margin", "label"),
      targetPrecision = Some(targetPrecision)).collect()
    require(pick.nonEmpty, s"no margin threshold reaches precision " +
      s"$targetPrecision on the calibration set — gate not deployable")
    pipeline(docs, evalDocs, shingleN, jaccard, maxShingleDf, decontamN,
      minTokens, maxTokens, maxTopGramFrac, maxDupGramFrac, persist,
      classifierWeights, classifierBias,
      classifierMinMargin = pick.head.getAs[Double]("threshold"),
      classifierWordNgrams = classifierWordNgrams)
  }

  /** Materialize the curated corpus: survivors of a [[pipeline]]
    * verdict frame, deterministically split-assigned and written as
    * parquet partitioned by split — the shard layout a training run
    * reads (`.../split=train/`). Split assignment is a pure function
    * of (doc_id, seed) ([[Sampling.splitAssign]]), so re-running
    * curation after an append cannot move yesterday's rows between
    * splits. Each task writes at most |splits| files; the verdict
    * side is doc_id-distinct so the join adds no fan-out. */
  def writeCurated(docs: DataFrame, verdicts: DataFrame, path: String,
      weights: Seq[(String, Double)] = Seq("train" -> 0.98, "val" -> 0.01,
        "test" -> 0.01), seed: String = "graft"): Unit = {
    val kept = docs.join(
      verdicts.where(col("keep")).select(col("doc_id")), Seq("doc_id"))
    Sampling.splitAssign(kept, col("doc_id"), weights, seed)
      .write.mode("overwrite").partitionBy("split").parquet(path)
  }

  /** Topic map of the corpus: cluster documents by embedding
    * ([[Similarity.buildIvfIndex]] spherical k-means buckets, joined
    * on `vec_id = doc_id`), then label each cluster with its `topK`
    * distinctive terms — tf-idf at CLUSTER granularity, where the
    * clusters play the role of documents (tf = term occurrences in
    * the cluster, df = clusters containing the term, N = nClusters, a
    * plan literal). One row per (cluster, ranked term) with the
    * cluster's document count — the "what are the topics in this
    * corpus and how big is each" dashboard read before choosing
    * mixture rates.
    *
    * Scale: the doc→cluster join is an equi-join on doc_id; the term
    * frame aggregates map-side to (cid, term) — at most
    * nClusters × vocabulary rows cross the wire; df derives from that
    * frame; the top-k window sorts only each cluster's term list.
    * Cluster assignments depend on float k-means centroids, so (like
    * `sim_diversity`) the operator is benched + spec-pinned on
    * invariants rather than oracle-gated.
    *
    * This entry point trains a fresh index per call (the standalone
    * exploratory shape); a steady-state pipeline that already owns a
    * durable [[Similarity.saveIvfIndex]] artifact labels WITHOUT
    * retraining via [[topicProfileWithIndex]] — the k-means passes
    * over the corpus are the dominant cost, and the assignments are
    * exactly what the index already materialized. */
  def topicProfile(docs: DataFrame, emb: DataFrame,
      nClusters: Int = 16, topK: Int = 5): DataFrame =
    topicProfileWithIndex(docs, Similarity.buildIvfIndex(emb, nClusters), topK)

  /** [[topicProfile]] against a pre-built [[Similarity.IvfIndex]]
    * (in-session or [[Similarity.loadIvfIndex]]-reloaded): pure
    * label+rank work — the doc→cluster join, the cluster-granular
    * tf-idf, and the top-k window — with ZERO k-means training
    * passes. nClusters is the index's own cluster count. */
  def topicProfileWithIndex(docs: DataFrame, index: Similarity.IvfIndex,
      topK: Int = 5): DataFrame = {
    require(topK >= 1, s"topK must be positive, got $topK")
    import org.apache.spark.sql.expressions.Window
    val nClusters = index.centroids.length
    val assigned = index.assigned
      .select(col("vec_id").as("doc_id"), col("cid"))
    val joined = docs.join(assigned, "doc_id")
    val tf = joined
      .select(col("cid"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("cid"), col("term")).agg(count(lit(1)).as("tf"))
    val dfFrame = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val sizes = joined.groupBy(col("cid")).agg(count(lit(1)).as("n_docs"))
    tf.join(dfFrame, "term")
      .withColumn("score", col("tf") *
        (log(lit(nClusters + 1.0) / (col("df") + 1)) + 1))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("cid")).orderBy(col("score").desc, col("term").asc)))
      .filter(col("rank") <= topK)
      .join(sizes, "cid")
      .select(col("cid"), col("n_docs"), col("rank"), col("term"),
        col("tf"), col("df"), col("score"))
  }

  /** Per-slice attrition FUNNEL of a [[pipeline]] verdict frame — the
    * report a 100 TB curation run publishes alongside its shards:
    * for each value of `dimCol` (source, language, shard…), how many
    * documents entered, how many each gate flagged, and how many
    * survived each successive stage in pipeline order
    * (quality → dedup → decontamination). Exact integer counts, so
    * the gate oracle replays it by wrapping the pipeline oracle in
    * one GROUP BY.
    *
    * Columns: `n_docs`, raw flag counts (`n_quality_fail`,
    * `n_dup_loser`, `n_contaminated` — flags can overlap, so these
    * need not telescope), and the staged survivor counts
    * (`n_after_quality ≥ n_after_dedup ≥ n_kept`, which do).
    *
    * Scale shape: ONE map-side-combinable aggregation over the
    * verdict frame after an equi-join to the docs' dimension column —
    * output is |distinct dim| rows, driver state zero. */
  def funnel(verdicts: DataFrame, docs: DataFrame,
      dimCol: String = "source"): DataFrame = {
    def n(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    verdicts
      .join(docs.select(col("doc_id"), col(dimCol)), "doc_id")
      .groupBy(col(dimCol))
      .agg(
        count(lit(1)).as("n_docs"),
        n(!col("quality_keep")).as("n_quality_fail"),
        n(col("dup_loser")).as("n_dup_loser"),
        n(col("contaminated")).as("n_contaminated"),
        n(col("quality_keep")).as("n_after_quality"),
        n(col("quality_keep") && !col("dup_loser")).as("n_after_dedup"),
        n(col("keep")).as("n_kept"))
  }

  /** Cross-split leakage audit: near-duplicate pairs that STRADDLE a
    * train/val/test boundary. A doc-keyed split cannot stop two
    * near-identical documents from landing on opposite sides of the
    * cut — the val/test metric then grades memorization, not
    * generalization. This is the check a pipeline runs after every
    * re-split, and the reason [[Sampling.splitAssign]] offers
    * source-keyed splitting ([[splitLeakageReport]] quantifies what
    * doc-keyed splitting leaks; the source-keyed gate pins that
    * same-source template pairs then CANNOT straddle).
    *
    * Inputs: the corpus and a `(doc_id, split)` assignment frame
    * (typically [[Sampling.splitAssign]] output — but any assignment
    * works: this audits the assignment, so it must not recompute it).
    * Output: one row per leaking pair — (id_a, id_b, split_a,
    * split_b, jaccard), id_a < id_b from the pair machinery.
    *
    * Scale shape: candidate pairs come from the df-capped shingle
    * inverted index ([[Dedup.ngramJaccardPairs]] — banded equi-joins,
    * never all-pairs); the near-dup pair frame is selectivity-tiny
    * relative to the corpus, and the two split lookups are keyed
    * equi-joins against it (AQE broadcasts the pair side when it
    * fits). No new corpus-wide shuffle beyond the pair machinery's
    * own. */
  def splitLeakage(docs: DataFrame, splits: DataFrame, shingleN: Int = 3,
      jaccard: Double = 0.8, maxShingleDf: Int = Int.MaxValue,
      persist: Persistence = Persistence.Local): DataFrame =
    splitLeakageFromPairs(
      Dedup.ngramJaccardPairs(docs, shingleN, jaccard, maxShingleDf, persist),
      splits, simCol = "jaccard")

  /** The audit's generic core: any near-dup PAIR frame
    * (`id_a < id_b` plus a similarity column — n-gram Jaccard,
    * MinHash, SimHash, or [[Similarity.semanticPairsSeeded]]'s
    * embedding cosine) crossed with any `(splitKey, split)`
    * assignment. Lexical dedup misses paraphrases and translations;
    * running this once per pair family gives the leakage audit the
    * same reach as the dedup stack itself. */
  def splitLeakageFromPairs(pairs: DataFrame, splits: DataFrame,
      simCol: String, splitKey: String = "doc_id"): DataFrame = {
    val sp = splits.select(col(splitKey), col("split"))
    pairs
      .join(sp.select(col(splitKey).as("id_a"), col("split").as("split_a")),
        "id_a")
      .join(sp.select(col(splitKey).as("id_b"), col("split").as("split_b")),
        "id_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("id_a"), col("id_b"), col("split_a"), col("split_b"),
        col(simCol))
  }

  /** The repair the audit motivates: a new assignment in which no
    * leaking pair straddles a boundary, produced by QUARANTINING the
    * lower-priority member of every [[splitLeakage]] pair. Priority
    * order (highest first, default test > val > train) encodes the
    * rule every eval-hygiene stack runs: the eval splits are sacred,
    * so the train-side twin of a train↔test near-dup is the one that
    * leaves. Quarantine — not reassignment to the eval split — because
    * a near-dup of a test doc placed in val just moves the leak.
    *
    * Input: any `(splitKey, split)` assignment and any leak-pair frame
    * shaped like [[splitLeakageFromPairs]] output (id_a, id_b,
    * split_a, split_b, …) — lexical, semantic, or both unioned: the
    * repair is agnostic to what flagged the pair. Splits not named in
    * `priority` rank below all named ones; a pair tied on priority
    * quarantines `id_b` (the pair machinery's higher id) so the
    * verdict stays total and deterministic. Output = the assignment
    * frame + `split_repaired` (= `split`, or `quarantined`).
    *
    * Scale: the quarantine set is distinct ids drawn from the leak
    * frame — selectivity-tiny relative to the corpus — and the only
    * corpus-side work is ONE left join against it (AQE broadcasts the
    * small side). Pure CASE arithmetic otherwise; fully
    * oracle-portable. Quarantining both members of val↔test pairs
    * would also be defensible — this op keeps the higher-priority doc
    * so exactly one side of every leak moves, which a spec pins. */
  def splitRepair(splits: DataFrame, leaks: DataFrame,
      priority: Seq[String] = Seq("test", "val", "train"),
      splitKey: String = "doc_id",
      quarantineLabel: String = "quarantined"): DataFrame = {
    require(priority.distinct.size == priority.size,
      s"priority must not repeat a split name: $priority")
    def rankOf(c: Column): Column =
      priority.zipWithIndex.foldRight(lit(priority.size): Column) {
        case ((s, i), acc) => when(c === lit(s), lit(i)).otherwise(acc)
      }
    val ra = rankOf(col("split_a"))
    val rb = rankOf(col("split_b"))
    val toDrop = leaks
      .select(when(ra > rb, col("id_a")).otherwise(col("id_b"))
        .as(splitKey))
      .distinct()
      .withColumn("_quarantined", lit(true))
    splits.join(toDrop, Seq(splitKey), "left")
      .withColumn("split_repaired",
        when(col("_quarantined"), lit(quarantineLabel))
          .otherwise(col("split")))
      .drop("_quarantined")
  }

  /** [[splitLeakage]] rolled up per UNORDERED split pair: how many
    * near-dup pairs straddle each boundary (`n_pairs`) and how many
    * distinct documents are implicated (`n_docs`). The one-page
    * number a re-split decision reads ("train↔test leaks 40 template
    * pairs — switch to source-keyed splitting").
    *
    * Exact integer counts over the (tiny) leak frame: each pair
    * contributes two exploded doc rows, so `n_pairs = rows/2` and
    * `n_docs = count(DISTINCT doc)` fall out of ONE
    * map-side-combinable aggregation keyed by the canonicalized
    * (least, greatest) split pair. */
  def splitLeakageReport(docs: DataFrame, splits: DataFrame,
      shingleN: Int = 3, jaccard: Double = 0.8,
      maxShingleDf: Int = Int.MaxValue,
      persist: Persistence = Persistence.Local): DataFrame =
    splitLeakage(docs, splits, shingleN, jaccard, maxShingleDf, persist)
      .select(
        least(col("split_a"), col("split_b")).as("split_lo"),
        greatest(col("split_a"), col("split_b")).as("split_hi"),
        explode(array(col("id_a"), col("id_b"))).as("doc"))
      .groupBy(col("split_lo"), col("split_hi"))
      .agg((count(lit(1)) / 2).cast("long").as("n_pairs"),
        count_distinct(col("doc")).as("n_docs"))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label-centric training-data preparation over embedding and scored
  * document frames: contrastive pair mining (hard negatives /
  * positives), kNN label propagation (auto-labeling a corpus from a
  * small labeled seed set), and classifier-vs-label disagreement
  * flags (confident-learning-style label-error candidates,
  * Northcutt et al. 2021, arXiv:1911.00068).
  *
  * These are the operators that turn a deduplicated corpus into
  * supervised training data: metric-learning batches need hard pairs,
  * weak labels come from propagating a seed set, and noisy labels
  * need an audit pass before anything trains on them. All three are
  * exact, deterministic, and oracle-replayable (ties broken by id /
  * label, cosines rounded at 6dp — the same spelling the embedding
  * dedup gates pin cross-engine).
  */
object Labels {

  private def dot(a: Column, b: Column): Column =
    graft.functions.VecMath.vec_dot(a, b)

  private def withNorm(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"), col("embedding"),
      graft.functions.VecMath.vec_norm(col("embedding")).as("norm"))

  /** Contrastive pair mining for a bounded batch of anchor vectors:
    * per anchor, the top-`k` HARD NEGATIVES (different label, highest
    * cosine — the near-misses a contrastive loss learns most from)
    * and the top-`k` HARD POSITIVES (same label, LOWEST cosine — the
    * far-flung in-class examples that keep the class manifold
    * connected). One ranking convention (SimCLR/InfoNCE-style offline
    * mining).
    *
    * Output: (query_id, query_label, neighbor_id, neighbor_label,
    * pair_type ∈ {hard_neg, hard_pos}, cos_sim, rank). Ties broken by
    * neighbor id; cosine rounded at 6dp.
    *
    * Scale: the ANCHOR side is the bounded mining batch (broadcast —
    * one corpus scan, no corpus shuffle to score); ranking shuffles
    * the Q·N scored frame by (query, type), acceptable because Q is a
    * batch, not the corpus. Mining every anchor of a 100 TB corpus
    * runs this per batch, or takes the LSH candidate path
    * ([[hardNegativesLsh]]) whose shuffle is bucket-bounded. */
  def contrastiveMine(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be positive, got $k")
    val scored = withNorm(Similarity.spreadIfNarrow(emb)).as("n")
      .join(broadcast(withNorm(queries).as("q")),
        col("q.vec_id") =!= col("n.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("q.label").as("query_label"),
        col("n.vec_id").as("neighbor_id"), col("n.label").as("neighbor_label"),
        round(dot(col("q.embedding"), col("n.embedding")) /
          (col("q.norm") * col("n.norm")), 6).as("cos_sim"))
      .withColumn("pair_type",
        when(col("neighbor_label") =!= col("query_label"), lit("hard_neg"))
          .otherwise(lit("hard_pos")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"), col("pair_type"))
          .orderBy(when(col("pair_type") === "hard_neg", -col("cos_sim"))
            .otherwise(col("cos_sim")), col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** Hard-negative mining at scale: candidates come from shared
    * random-hyperplane LSH buckets (equi-join on bucket keys — never
    * query×corpus), are filtered to DIFFERENT-label vectors, then
    * re-ranked by exact cosine. Same output schema as
    * [[contrastiveMine]]'s hard_neg rows; recall < 1, rising with
    * `tables` (spec-tested against the brute-force baseline). Hard
    * POSITIVES deliberately have no LSH path: "same label, lowest
    * cosine" is an anti-nearest-neighbor query that bucket locality
    * cannot serve — batch the brute path for those. */
  def hardNegativesLsh(emb: DataFrame, queries: DataFrame, k: Int, dim: Int,
      tables: Int = 16, planesPerTable: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be positive, got $k")
    val corpusB = Similarity.lshBuckets(Similarity.spreadIfNarrow(emb),
      tables, planesPerTable, dim)
    val queryB = Similarity.lshBuckets(queries, tables, planesPerTable, dim)
    val cand = queryB.as("qb")
      .join(corpusB.as("nb"),
        col("qb.table_idx") === col("nb.table_idx") &&
          col("qb.bucket") === col("nb.bucket") &&
          col("qb.vec_id") =!= col("nb.vec_id"))
      .select(col("qb.vec_id").as("query_id"), col("nb.vec_id").as("neighbor_id"))
      .distinct()
    val qn = withNorm(queries)
    val nn = withNorm(emb)
    cand
      .join(qn.select(col("vec_id"), col("label").as("query_label"),
        col("embedding").as("q_emb"), col("norm").as("q_norm")),
        col("query_id") === col("vec_id")).drop("vec_id")
      .join(nn.select(col("vec_id"), col("label").as("neighbor_label"),
        col("embedding").as("n_emb"), col("norm").as("n_norm")),
        col("neighbor_id") === col("vec_id")).drop("vec_id")
      .filter(col("neighbor_label") =!= col("query_label"))
      .select(col("query_id"), col("query_label"),
        col("neighbor_id"), col("neighbor_label"),
        round(dot(col("q_emb"), col("n_emb")) /
          (col("q_norm") * col("n_norm")), 6).as("cos_sim"))
      .withColumn("pair_type", lit("hard_neg"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("query_label"), col("neighbor_id"),
        col("neighbor_label"), col("pair_type"), col("cos_sim"), col("rank"))
  }

  /** kNN label propagation: every corpus vector takes the majority
    * label among its `k` nearest LABELED seed vectors (cosine,
    * excluding itself). The standard auto-labeling step when a small
    * curated seed set must label a large corpus.
    *
    * Output: (vec_id, label_given, label_knn, votes). Deterministic
    * end to end: neighbors ranked by (cos_sim desc at 6dp, vec_id),
    * majority by (votes desc, label asc).
    *
    * Scale: the SEED side is broadcast (a labeled seed set is small
    * by definition — thousands to low millions of rows; beyond that,
    * feed a sampled seed, or take [[knnPropagateWithIndex]] so each
    * corpus row scores only the seeds probing its cluster). The
    * corpus is scanned once; the top-k selection is a BOUNDED
    * insertion fold ([[graft.functions.collect_top_k_asc]], a
    * k-element priority queue — never the whole seed set in memory),
    * partial aggregation collapses each vector's seed matches
    * map-side (the broadcast join is narrow, so all |seeds| matches
    * of a vector are co-located), and the one shuffle carries ONE
    * k-bounded row per corpus vector, not |corpus|·|seeds| scored
    * rows. The majority vote is then a per-row HOF over the k-array —
    * no second shuffle. */
  def knnPropagate(emb: DataFrame, labeled: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    // Spread the corpus before the broadcast join: a narrow scan
    // would otherwise score ALL |corpus|·|seeds| candidate pairs in
    // one task (the measured shape of this gate at sf0.1 — see
    // Similarity.spreadIfNarrow).
    val corpus = withNorm(Similarity.spreadIfNarrow(emb))
    val seeds = withNorm(labeled).select(col("vec_id").as("nid"),
      col("label").as("nlabel"), col("embedding").as("n_emb"),
      col("norm").as("n_norm"))
    voteFromCandidates(
      corpus.join(broadcast(seeds), col("vec_id") =!= col("nid")), k)
  }

  /** [[knnPropagate]] with IVF-pruned candidates — the spelling a
    * 100k+ labeled set needs: instead of scoring every corpus vector
    * against EVERY seed, each seed is multi-probed to its `nProbe`
    * nearest centroids of a trained [[Similarity.IvfIndex]] and each
    * corpus vector (assigned to its own nearest centroid by the same
    * frozen model, a zero-join O(k·dim) projection) scores only the
    * seeds probing its cluster — expected `nProbe/nClusters` of the
    * brute-force work. Exact same ranking/vote arithmetic downstream;
    * recall < 1 against [[knnPropagate]], rising with `nProbe`, and
    * IDENTICAL at `nProbe = nClusters` (every seed then reaches every
    * cluster — spec-pinned, and the `emb_knn_label_ivf` gate's
    * oracle-exact configuration).
    *
    * `emb` supplies (vec_id, label, embedding) for the corpus (the
    * index's assigned frame carries no label and is not read here —
    * only the bounded centroid model is). Ties in a seed's centroid
    * ranking break toward the lower centroid id (the
    * [[Similarity.nearestCentroid]] convention, via the same negated-
    * id struct ordering).
    *
    * Output contract matches [[knnPropagate]]: ONE row per corpus
    * vector. A vector whose cluster NO seed probes (possible at small
    * nProbe with concentrated seeds) has no candidates — it comes
    * back with `label_knn` null and `votes` 0 rather than silently
    * vanishing (a pipeline counting labeled rows must see the
    * coverage gap, not a shrunken corpus).
    *
    * Picking nProbe: RECALL_r12.json (graft.RecallSweep, 16 clusters,
    * k = 5, sf0.1) measures label agreement with brute force at
    * 0.24 / 0.31 / 0.45 / 0.68 / 1.00 for nProbe 1/2/4/8/16 with full
    * coverage throughout — the gate corpus is near-uniform synthetic
    * vectors, IVF's WORST case (no cluster structure to exploit), so
    * treat those as a floor and re-run the sweep on real embeddings
    * before choosing; wall time scales roughly with nProbe (AB_r11b:
    * nProbe 4 ≈ 2.4× faster than exact on the same corpus). */
  def knnPropagateWithIndex(index: Similarity.IvfIndex, emb: DataFrame,
      labeled: DataFrame, k: Int, nProbe: Int = 4): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val centroids = index.centroids
    require(centroids.nonEmpty, "empty IVF index")
    require(nProbe >= 1 && nProbe <= centroids.length,
      s"nProbe must be in [1, ${centroids.length}], got $nProbe")
    val corpus = withNorm(Similarity.spreadIfNarrow(emb))
      .withColumn("cid", Similarity.nearestCentroid(
        graft.functions.VecMath.vec_unit(col("embedding")), centroids))
    // Seed side: nProbe nearest centroids per seed (the ivfProbe
    // probing spelling — rank centroid dots in an array expression,
    // explode the top slice; negid makes dot-ties break toward the
    // LOWER cid after the reverse, like nearestCentroid). Seed count
    // × nProbe rows, still broadcast-sized by the labeled-set
    // premise.
    val probeCols = centroids.zipWithIndex.map { case (c, i) =>
      struct(dot(col("e"), array(c.map(lit).toIndexedSeq: _*)).as("d"),
        lit(-i).as("negid"))
    }
    val seeds = withNorm(labeled)
      .withColumn("e", graft.functions.VecMath.vec_unit(col("embedding")))
      .select(col("vec_id").as("nid"), col("label").as("nlabel"),
        col("embedding").as("n_emb"), col("norm").as("n_norm"),
        explode(transform(
          slice(reverse(array_sort(array(probeCols.toIndexedSeq: _*))),
            1, nProbe),
          x => -x.getField("negid"))).as("cid"))
    val voted = voteFromCandidates(
      corpus.join(broadcast(seeds),
        corpus("cid") === seeds("cid") && col("vec_id") =!= col("nid")), k)
    emb.select(col("vec_id"), col("label").as("label_given"))
      .join(voted.select(col("vec_id"), col("label_knn"), col("votes")),
        Seq("vec_id"), "left")
      .select(col("vec_id"), col("label_given"), col("label_knn"),
        coalesce(col("votes"), lit(0L)).as("votes"))
  }

  /** Shared tail of the kNN propagation family: bounded top-k fold
    * over (neg_cos, nid, nlabel) candidate structs, then the majority
    * vote as a per-row HOF — one shuffle total, k-bounded state. */
  private def voteFromCandidates(cands: DataFrame, k: Int): DataFrame = {
    val topk = cands
      .select(col("vec_id"), col("label"),
        struct(
          (-round(dot(col("embedding"), col("n_emb")) /
            (col("norm") * col("n_norm")), 6)).as("neg_cos"),
          col("nid"), col("nlabel")).as("cand"))
      .groupBy(col("vec_id"), col("label"))
      .agg(graft.functions.collect_top_k_asc(col("cand"), k).as("topk"))
    val votesArr = transform(col("topk"), x => x("nlabel"))
    val tally = transform(array_distinct(votesArr), l =>
      struct((-size(filter(votesArr, v => v === l))).as("neg_votes"),
        l.as("lab")))
    topk.select(col("vec_id"), col("label").as("label_given"),
      array_min(tally).getField("lab").as("label_knn"),
      (-array_min(tally).getField("neg_votes")).cast("long").as("votes"))
  }

  /** Label-error candidates (confident learning, simplified to the
    * binary class-conditional mean rule): a doc labeled 0 whose
    * classifier score clears the CLASS-1 mean score is a suspected
    * missed positive (`flip_to_1`); a doc labeled 1 scoring at or
    * below the class-0 mean is a suspected mislabeled negative
    * (`flip_to_0`). The audit pass a labeled seed set gets before
    * anything trains on it.
    *
    * Arithmetic is EXACT cross-engine: scores are rounded at 6dp into
    * DECIMAL(18,6), class sums are exact decimal sums, and the mean
    * comparison is spelled multiplication-free-of-division
    * (`score·n₁ ≥ Σ₁` ⇔ `score ≥ mean₁`) so no engine ever divides —
    * every flag is an integer-exact decimal comparison an oracle
    * replays bit-for-bit.
    *
    * One aggregation (four scalars) + one broadcast of that one-row
    * frame back over the scored input: zero corpus shuffles. Classes
    * with no members flag nothing (their rule is vacuously off). */
  def labelErrors(scored: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val sc = round(col(scoreCol), 6).cast("decimal(18,6)")
    val s = scored.withColumn("sc", sc)
    val stats = s.agg(
      sum(when(col(labelCol) === 1, col("sc"))).as("sum1"),
      count(when(col(labelCol) === 1, lit(1))).as("n1"),
      sum(when(col(labelCol) === 0, col("sc"))).as("sum0"),
      count(when(col(labelCol) === 0, lit(1))).as("n0"))
    s.crossJoin(broadcast(stats))
      .withColumn("suspect_pos",
        col(labelCol) === 0 && col("n1") > 0 &&
          col("sc") * col("n1") >= col("sum1"))
      .withColumn("suspect_neg",
        col(labelCol) === 1 && col("n0") > 0 &&
          col("sc") * col("n0") <= col("sum0"))
      .filter(col("suspect_pos") || col("suspect_neg"))
      .select(col("doc_id"), col(labelCol).cast("long").as("label"),
        col("sc").cast("double").as("score"),
        when(col("suspect_pos"), lit("flip_to_1"))
          .otherwise(lit("flip_to_0")).as("suspect"))
  }

  /** Active-learning uncertainty selection: the `k` documents whose
    * classifier MARGIN sits closest to the decision boundary — the
    * rows a labeling budget buys the most model improvement from
    * (uncertainty sampling, Lewis & Gale 1994). Input: a
    * [[TextAnalysis.classifierScore]]-shaped frame (`doc_id`,
    * `n_grams`, `sum_w`); the margin `sum_w / n_grams` is the
    * thresholded quantity everywhere else in the repo (monotone in
    * the sigmoid score, cross-engine exact — one IEEE division).
    * Gram-less docs read margin 0 (maximally uncertain): the model
    * genuinely knows nothing about them, and an annotator should see
    * that before the pipeline drops them.
    *
    * Output: (doc_id, margin, uncertainty = |margin|), the k smallest
    * uncertainties, ties broken by doc_id. Spark plans the selection
    * as TakeOrderedAndProject — per-partition top-k heaps merged on
    * the driver, never a global sort, at any corpus size. */
  def uncertaintySelect(scored: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    scored
      .withColumn("margin", when(col("n_grams") === 0, lit(0.0))
        .otherwise(col("sum_w") / col("n_grams").cast("double")))
      .withColumn("uncertainty", abs(col("margin")))
      .orderBy(col("uncertainty").asc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("margin"), col("uncertainty"))
  }

  /** [[uncertaintySelect]] with a PER-GROUP budget: the `k` most
    * uncertain documents within every `groupCol` value (per source,
    * per language, …) — the spelling that keeps a labeling round from
    * spending its whole budget on the one noisy domain the classifier
    * is most confused by. A partitioned window (rank within group by
    * uncertainty, doc_id) — every partition sorts only its own group;
    * no global sort, no unpartitioned window. */
  def uncertaintyByGroup(scored: DataFrame, groupCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be positive, got $k")
    scored
      .withColumn("margin", when(col("n_grams") === 0, lit(0.0))
        .otherwise(col("sum_w") / col("n_grams").cast("double")))
      .withColumn("uncertainty", abs(col("margin")))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("uncertainty").asc, col("doc_id").asc)))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col(groupCol), col("margin"),
        col("uncertainty"), col("rank").cast("long").as("rank"))
  }
}

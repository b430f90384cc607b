package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share
  * word n-grams with an evaluation corpus — the standard guard
  * against test-set leakage into a training run.
  *
  * Scale posture (100 TB corpus vs KB–MB eval sets): the EVAL side is
  * reduced to its distinct n-gram set and broadcast, so the corpus
  * side is one scan — native one-pass shingle HASHING
  * ([[graft.functions.word_shingle_hashes]]), explode, broadcast hash
  * join on the 8-byte gram hash, and a partial-aggregated per-doc
  * count. Grams ride as 64-bit hashes on BOTH sides (same function,
  * same seed): a 13-gram is ~80 bytes of string — hashing shrinks the
  * exploded corpus frame and the broadcast ~10×, and a collision
  * (~G_corpus·G_eval/2⁶⁴) can only add a spurious hit, the
  * conservative direction for a leakage guard (the gate corpus is
  * collision-free, so the string-gram DuckDB oracle still matches).
  * The corpus is never shuffled by gram (gram frequency is zipfian — a
  * gram shuffle would hot-spot); the only shuffle is the final doc_id
  * count, which map-side combines. Set `broadcastEval = false` for an
  * eval set too big to broadcast (falls back to a shuffle equi-join).
  */
object Decontamination {

  /** (doc_id, n_hits): training docs sharing ≥1 word n-gram with the
    * eval corpus, with the count of DISTINCT shared grams. Docs also
    * present in `evalDocs` are the caller's business to exclude —
    * pass `docs` already filtered (the usual pipeline has disjoint id
    * spaces anyway). `n` is the contamination gram length: big enough
    * that a match means copying, not chance (13 is the common
    * published choice for natural text; small fixture corpora need
    * smaller). */
  def flagContaminated(docs: DataFrame, evalDocs: DataFrame, n: Int = 13,
      broadcastEval: Boolean = true): DataFrame =
    flagAgainstEval(
      docs
        // Shingling is the CPU-dense stage — spread it across all cores
        // rather than inherit file-split parallelism.
        .repartition(col("doc_id"))
        .select(col("doc_id"), explode(
          array_distinct(graft.functions.word_shingle_hashes(col("text"), n))).as("g")),
      evalDocs, n, broadcastEval)

  /** [[flagContaminated]] over a materialized token index (`doc_id` +
    * `toks` [[graft.functions.word_tokens]] column, already spread):
    * corpus grams come from [[graft.functions.array_shingles]] — zero
    * re-tokenize, zero extra repartition, identical gram set. The
    * (tiny) eval side still derives its grams from raw text. */
  def flagContaminatedFromTokens(tokensFrame: DataFrame, evalDocs: DataFrame,
      n: Int = 13, broadcastEval: Boolean = true): DataFrame =
    flagAgainstEval(
      tokensFrame.select(col("doc_id"), explode(
        array_distinct(graft.functions.array_shingle_hashes(col("toks"), n))).as("g")),
      evalDocs, n, broadcastEval)

  /** [[flagContaminated]] with a Bloom prefilter for eval sets too big
    * to broadcast as an exact hash set: builds a Bloom filter over the
    * eval grams (driver-side sketch, ~1.2 GB per 10⁹ grams at 1% fpp —
    * broadcastable where the exact LongHashedRelation for the same
    * grams is ~3-8×), filters corpus grams through it BEFORE the
    * shuffle equi-join, then verifies survivors exactly against the
    * eval gram frame. The result is therefore EXACT — a Bloom false
    * positive survives the prefilter only to be dropped by the verify
    * join — while the shuffle that was the big-eval fallback's cost
    * now carries only true hits + fpp·|corpus grams| rows instead of
    * every gram in the corpus. The same oracle as the broadcast path
    * gates it. */
  def flagContaminatedBloom(docs: DataFrame, evalDocs: DataFrame,
      n: Int = 13, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    val evalGrams = evalDocs
      .select(explode(
        array_distinct(graft.functions.word_shingle_hashes(col("text"), n))).as("g"))
      .distinct()
    // Two eval-side jobs (count + sketch build) are control-plane: the
    // eval corpus is KBs-GBs against a 100 TB training corpus, and the
    // sketch must be sized to the true cardinality or its fpp lies.
    val nGrams = math.max(evalGrams.count(), 1L)
    val bloom = evalGrams.stat.bloomFilter("g", nGrams, fpp)
    val bloomBc = docs.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((g: Long) => bloomBc.value.mightContainLong(g))
    docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(
        array_distinct(graft.functions.word_shingle_hashes(col("text"), n))).as("g"))
      .filter(mightContain(col("g")))
      .join(evalGrams, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }

  private def flagAgainstEval(corpusGrams: DataFrame, evalDocs: DataFrame,
      n: Int, broadcastEval: Boolean): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(
        array_distinct(graft.functions.word_shingle_hashes(col("text"), n))).as("g"))
      .distinct()
    val ev = if (broadcastEval) broadcast(evalGrams) else evalGrams
    corpusGrams
      .join(ev, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
  }
}

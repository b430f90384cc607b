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

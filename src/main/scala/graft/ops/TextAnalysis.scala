package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, heuristic language ID, and content fingerprinting.
  * All per-row column expressions — embarrassingly parallel, no
  * shuffles, fully codegen'd. */
object TextAnalysis {

  /** BPE-style pre-tokenizer regex (GPT-2 shape, minus the lookahead so
    * Java regex and RE2/DuckDB agree): contractions, space-prefixed
    * letter runs, digit runs, punctuation runs, whitespace runs. Counts
    * from this pattern track BPE token counts closely enough for
    * length-based curation without shipping a vocab. */
  val bpePattern: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9]+|\\s+"

  /** Token/char statistics per document (whitespace tokens + BPE-ish
    * regex token count). */
  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    docs.select(
      col("doc_id"),
      char_length(col("text")).as("n_chars"),
      size(toks).as("n_tokens"),
      regexp_count(col("text"), lit(bpePattern)).as("n_bpe_tokens"),
      (char_length(regexp_replace(col("text"), "\\s", ""))
        .cast("double") / size(toks)).as("avg_token_len"))
  }

  /** Stopword list used by both the quality score and language ID —
    * tiny, embedded, language-marker words. */
  val stopwordsEn = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
  val stopwordsDe = Seq("der", "die", "das", "und", "nicht", "ein", "zu", "ist", "mit", "von")
  val stopwordsFr = Seq("le", "la", "les", "et", "ne", "un", "une", "est", "avec", "de")

  private def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** Heuristic quality signals + a combined score in [0,1]:
    * punctuation ratio, alphabetic ratio, stopword ratio, and a length
    * band. The exact formula is arbitrary but deterministic — the
    * point is the shape of the operator (pure projection). */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val nChars = char_length(col("text"))
    val punct = char_length(regexp_replace(col("text"), "[^.!?,;:]", ""))
    val alpha = char_length(regexp_replace(col("text"), "[^a-zA-Z]", ""))
    val stop = markerCount(toks, stopwordsEn)
    docs.select(
      col("doc_id"),
      (punct.cast("double") / nChars).as("punct_ratio"),
      (alpha.cast("double") / nChars).as("alpha_ratio"),
      (stop.cast("double") / size(toks)).as("stopword_ratio"),
      (when(nChars >= 100 && nChars <= 5000, 1.0).otherwise(0.5) * 0.4 +
        least(stop.cast("double") / size(toks) * lit(4.0), lit(1.0)) * 0.3 +
        (alpha.cast("double") / nChars) * 0.3).as("quality_score"))
  }

  /** Marker-word language ID over {en, de, fr}: the language with the
    * highest marker hit count wins (ties → lexicographically first;
    * zero hits → "und"). N-gram-free heuristic, deterministic. */
  def langId(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val en = markerCount(toks, stopwordsEn)
    val de = markerCount(toks, stopwordsDe)
    val fr = markerCount(toks, stopwordsFr)
    val best = greatest(en, de, fr)
    docs.select(
      col("doc_id"), col("lang").as("lang_declared"),
      en.as("en_hits"), de.as("de_hits"), fr.as("fr_hits"),
      when(best === 0, "und")
        .when(de === best, "de") // note: checked in lexicographic order
        .when(en === best, "en")
        .otherwise("fr").as("lang_predicted"))
  }

  /** Content fingerprints: md5 of the normalized text (128-bit, hex),
    * xxhash64 (cheap 64-bit engine-side key), and winnowed rolling-hash
    * fingerprints (ARRAY<BIGINT>, MOSS scheme — robust to local edits,
    * powers [[Dedup.fingerprintPairs]]). */
  def fingerprint(docs: DataFrame, window: Int = 16, winnow: Int = 8): DataFrame =
    docs.select(
      col("doc_id"),
      md5(TextOps.normalized(col("text"))).as("md5_fp"),
      xxhash64(TextOps.normalized(col("text"))).as("xx_fp"),
      graft.functions.rolling_fingerprint(
        TextOps.normalized(col("text")), window, winnow).as("rolling_fp"))
}

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

  /** Corpus vocabulary profile: the top `k` terms by total corpus
    * occurrences (`cf`), with document frequency (`df`) and a dense
    * 1-based rank — the "what is this corpus made of" dashboard table
    * read before/after every filter stage (a filter that shifts the
    * head of this table changed the domain mix, not just the volume).
    *
    * Exact integer arithmetic, deterministic rank (ties by term asc) —
    * oracle-portable. Scale: one explode + one map-side-combining
    * groupBy on term (zipfian heads pre-combine per map task, so the
    * hottest term reaches its reducer as one row per task), then
    * orderBy+limit — Spark plans TakeOrderedAndProject (per-partition
    * top-k merged on the driver), so the vocabulary is never globally
    * sorted; only the k winners see the rank window.
    *
    * `approxDf = true` swaps the exact `countDistinct(doc_id)` df for
    * `approx_count_distinct` (HLL++, default rsd 5%): the exact df is
    * the one piece whose partial aggregate is a per-term doc-id SET —
    * Spark expands it to a two-phase aggregate whose first shuffle
    * carries (term, doc_id) pairs, corpus-sized for hot terms. The
    * sketch's partial state is a fixed-width HLL buffer per term, so
    * the 100 TB profile pays one bounded-width shuffle. `cf`, the
    * ranking key, stays exact either way — approxDf can only wobble
    * the reported df value, never which terms win or their order. */
  def vocabProfile(docs: DataFrame, k: Int = 20,
      approxDf: Boolean = false, rsd: Double = 0.05): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val df = if (approxDf) approx_count_distinct(col("doc_id"), rsd)
      else countDistinct(col("doc_id"))
    docs
      .select(explode(TextOps.tokens(col("text"))).as("term"), col("doc_id"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cf"), df.as("df"))
      .orderBy(col("cf").desc, col("term").asc)
      .limit(k)
      // The rank window runs over exactly the k (<= tens) winner rows
      // post-limit: the "No Partition Defined" WindowExec warning is
      // benign here — do NOT "fix" it by partitioning, rank is global
      // by construction.
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cf").desc, col("term").asc)))
      .select(col("rank"), col("term"), col("cf"), col("df"))
  }

  /** Token/char statistics per document (whitespace tokens + BPE-ish
    * regex token count). */
  def tokenStats(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    // Non-whitespace char count = total − ASCII-\s count, one native
    // byte pass (Java's \s is ASCII-only, so the arithmetic is exact;
    // the regexp_replace spelling is the spec twin + oracle).
    val ws = element_at(graft.functions.ascii_class_counts(col("text"),
      Seq(" \t\n\u000B\f\r")), 1) // Java \s = [ \t\n\x0B\f\r]
    docs.select(
      col("doc_id"),
      char_length(col("text")).as("n_chars"),
      size(toks).as("n_tokens"),
      // Native lexer for the total alternation (spec-pinned equal to
      // regexp_count(bpePattern), which stays the oracle spelling).
      graft.functions.bpe_token_count(col("text")).cast("int")
        .as("n_bpe_tokens"),
      ((char_length(col("text")) - ws).cast("double") / size(toks))
        .as("avg_token_len"))
  }

  /** Stopword list used by both the quality score and language ID —
    * tiny, embedded, language-marker words. */
  val stopwordsEn = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")
  val stopwordsDe = Seq("der", "die", "das", "und", "nicht", "ein", "zu", "ist", "mit", "von")
  val stopwordsFr = Seq("le", "la", "les", "et", "ne", "un", "une", "est", "avec", "de")

  /** Declarative marker counting — the oracle arithmetic, kept as the
    * equivalence-spec twin of [[graft.functions.marker_counts]]. */
  private[graft] def markerCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  /** Heuristic quality signals + a combined score in [0,1]:
    * punctuation ratio, alphabetic ratio, stopword ratio, and a length
    * band. The exact formula is arbitrary but deterministic — the
    * point is the shape of the operator (pure projection). Stopword
    * counting uses the native one-pass
    * [[graft.functions.marker_counts]] (the interpreted
    * `filter`-HOF twin is spec-pinned equal). */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val nChars = char_length(col("text"))
    // Punctuation + alphabetic counts share one native byte pass
    // (ASCII classes count chars exactly like the regex-strip
    // spelling, which remains the spec twin + oracle arithmetic).
    val cc = graft.functions.ascii_class_counts(col("text"),
      Seq(".!?,;:", (('a' to 'z') ++ ('A' to 'Z')).mkString))
    val punct = element_at(cc, 1).cast("int")
    val alpha = element_at(cc, 2).cast("int")
    val stop = element_at(
      graft.functions.marker_counts(col("text"), Seq(stopwordsEn)), 1)
      .cast("int")
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
    val mc = graft.functions.marker_counts(col("text"),
      Seq(stopwordsEn, stopwordsDe, stopwordsFr))
    val en = element_at(col("mc"), 1).cast("int")
    val de = element_at(col("mc"), 2).cast("int")
    val fr = element_at(col("mc"), 3).cast("int")
    val best = greatest(en, de, fr)
    docs.select(col("doc_id"), col("lang"), mc.as("mc"))
      .select(
        col("doc_id"), col("lang").as("lang_declared"),
        en.as("en_hits"), de.as("de_hits"), fr.as("fr_hits"),
        when(best === 0, "und")
          .when(de === best, "de") // note: checked in lexicographic order
          .when(en === best, "en")
          .otherwise("fr").as("lang_predicted"))
  }

  /** Declared-vs-detected language CONFLICT AUDIT (VERDICT r12 #4):
    * the per-source decision table a crawl pipeline reads before
    * trusting `<html lang>` attributes — sources whose declared
    * language disagrees with [[langId]]-style detection are mislabeled
    * upstream (wrong templates, copy-pasted boilerplate attrs) and
    * their declared lang must not feed routing. `declared` is any
    * BCP-47-ish tag (e.g. [[graft.sources.Warc.htmlLang]] output);
    * only its PRIMARY subtag is compared (`en-gb` declares `en` —
    * region never conflicts with a base-language detector). A row
    * counts as a conflict only when BOTH sides commit: declared
    * non-null AND detection confident (not `und`) AND primary subtags
    * differ.
    *
    * Shape at 100 TB: detection is the zero-shuffle one-pass
    * [[graft.functions.marker_counts]] projection; the single shuffle
    * is the group-by on (source, declared, predicted) — a key space
    * bounded by sources × languages², orders of magnitude below the
    * corpus. */
  def langConflictAudit(docs: DataFrame, declared: Column, text: Column,
      source: Column): DataFrame = {
    val mc = graft.functions.marker_counts(text,
      Seq(stopwordsEn, stopwordsDe, stopwordsFr))
    val dec = nullif(lower(regexp_extract(declared, "^([a-zA-Z]+)", 1)),
      lit(""))
    val base = docs.select(source.as("source"), dec.as("lang_declared"),
      mc.as("_mc"))
    val en = element_at(col("_mc"), 1).cast("int")
    val de = element_at(col("_mc"), 2).cast("int")
    val fr = element_at(col("_mc"), 3).cast("int")
    val best = greatest(en, de, fr)
    val pred = when(best === 0, "und")
      .when(de === best, "de") // same tie order as langId
      .when(en === best, "en")
      .otherwise("fr")
    base.select(col("source"), col("lang_declared"),
        pred.as("lang_predicted"))
      .groupBy("source", "lang_declared", "lang_predicted")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("conflict",
        col("lang_declared").isNotNull &&
          col("lang_predicted") =!= "und" &&
          col("lang_declared") =!= col("lang_predicted"))
  }

  /** Character-trigram profiles for the n-gram language-ID variant:
    * high-frequency trigrams (with word-boundary spaces) per language.
    * Tiny embedded model — the operator shape (per-row scoring against
    * a constant profile) is the point. */
  val trigramsEn = Seq("the", " th", "he ", "ing", "and", " an", "nd ",
    " of", "of ", "ed ", " to", "to ", "er ", " in", "ion")
  val trigramsDe = Seq("en ", "er ", "ch ", "der", " de", "ie ", "sch",
    "ein", " ei", "und", " un", "die", " di", "cht", "ung")
  val trigramsFr = Seq(" de", "de ", "es ", "le ", " le", "ent", "nt ",
    " la", "la ", "ais", " et", "et ", "que", " qu", "eur")

  /** Occurrences of literal `needle` in `s`: length-delta over replace —
    * pure codegen'd string arithmetic, no regex, no explode. */
  private def countOccurrences(s: Column, needle: String): Column =
    ((char_length(s) - char_length(replace(s, lit(needle), lit("")))) /
      needle.length).cast("long")

  private def trigramScore(s: Column, tris: Seq[String]): Column =
    tris.map(countOccurrences(s, _)).reduce(_ + _)

  /** Character-n-gram language ID over {en, de, fr}: score = total
    * occurrences of each language's high-frequency trigrams in the
    * normalized text; highest score wins (zero everywhere → "und";
    * ties break de, en, fr — same order as [[langId]]). Scores come
    * from the native one-pass [[graft.functions.trigram_scores]]
    * (the declarative replace-arithmetic spelling — still what the
    * DuckDB oracle computes — scans and rebuilds the string once per
    * needle, ~45× per document; spec-pinned byte-identical in
    * [[langIdNgramDeclarative]]). */
  def langIdNgram(docs: DataFrame): DataFrame = {
    val sc = graft.functions.trigram_scores(
      TextOps.normalized(col("text")), Seq(trigramsEn, trigramsDe, trigramsFr))
    val en = element_at(col("sc"), 1)
    val de = element_at(col("sc"), 2)
    val fr = element_at(col("sc"), 3)
    val best = greatest(en, de, fr)
    docs.select(col("doc_id"), col("lang"), sc.as("sc"))
      .select(
        col("doc_id"), col("lang").as("lang_declared"),
        en.as("en_score"), de.as("de_score"), fr.as("fr_score"),
        when(best === 0, "und")
          .when(de === best, "de")
          .when(en === best, "en")
          .otherwise("fr").as("lang_predicted"))
  }

  /** The replace-arithmetic spelling of [[langIdNgram]] — kept as the
    * equivalence-spec twin of the native expression (it IS the oracle
    * arithmetic). */
  private[graft] def langIdNgramDeclarative(docs: DataFrame): DataFrame = {
    val norm = TextOps.normalized(col("text"))
    val en = trigramScore(norm, trigramsEn)
    val de = trigramScore(norm, trigramsDe)
    val fr = trigramScore(norm, trigramsFr)
    val best = greatest(en, de, fr)
    docs.select(
      col("doc_id"), col("lang").as("lang_declared"),
      en.as("en_score"), de.as("de_score"), fr.as("fr_score"),
      when(best === 0, "und")
        .when(de === best, "de")
        .when(en === best, "en")
        .otherwise("fr").as("lang_predicted"))
  }

  /** Gopher-style repetition signals per document: total and distinct
    * word n-gram occurrence counts, the share of occurrences claimed by
    * the single most frequent n-gram (`top_gram_frac`), and the share
    * of occurrences that are repeats of an earlier one
    * (`dup_gram_frac`). High values mark boilerplate and degenerate
    * loops — the classic pre-training repetition filter.
    *
    * ZERO shuffles: the statistic is per-document, so the native
    * one-pass [[graft.functions.gram_stats]] expression counts grams
    * in a per-row hash map — the relational
    * `explode → groupBy(doc, gram) → groupBy(doc)` spelling (which
    * the DuckDB oracle still uses) would shuffle every gram
    * occurrence of a 100 TB corpus twice to answer a question each
    * document answers alone. Documents with fewer than `n` tokens
    * have no n-grams and are filtered out (mirrors the oracle's
    * unnest semantics); the fractions are the same IEEE divisions of
    * the same integers, so results stay hash-identical. */
  def repetitionStats(docs: DataFrame, n: Int = 2): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.gram_stats(col("text"), n).as("gs"))
      .where(col("gs.n_grams") > 0)
      .select(col("doc_id"), col("gs.n_grams").as("n_grams"),
        col("gs.n_distinct_grams").as("n_distinct_grams"),
        col("gs.top_gram_frac").as("top_gram_frac"),
        col("gs.dup_gram_frac").as("dup_gram_frac"))

  /** Composite C4/Gopher-style quality gate: a document survives when
    * its token count sits inside [minTokens, maxTokens] AND neither
    * repetition signal exceeds its cap. Emits every document with its
    * signals and the `keep` verdict (filter with `.where("keep")`),
    * so the drop reasons stay auditable — the form every production
    * curation pipeline uses. Pure zero-shuffle projection: both the
    * token count and the repetition signals
    * ([[graft.functions.gram_stats]]) are per-row expressions — no
    * aggregation, no join. Documents too short to have bigrams report
    * 0.0 repetition (same as the relational spelling's coalesce) and
    * pass the caps vacuously — they fail minTokens instead. */
  def qualityFilter(docs: DataFrame, minTokens: Int = 25,
      maxTokens: Int = 100000, maxTopGramFrac: Double = 0.09,
      maxDupGramFrac: Double = 0.09): DataFrame =
    qualitySelect(docs.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).as("n_tokens"),
        graft.functions.gram_stats(col("text"), 2).as("gs")),
      minTokens, maxTokens, maxTopGramFrac, maxDupGramFrac)

  /** [[qualityFilter]] over a materialized token index (`doc_id` +
    * `toks` [[graft.functions.word_tokens]] column): identical
    * signals, zero re-tokenize — the Curation.pipeline shared-base
    * path. */
  def qualityFilterFromTokens(tokensFrame: DataFrame, minTokens: Int = 25,
      maxTokens: Int = 100000, maxTopGramFrac: Double = 0.09,
      maxDupGramFrac: Double = 0.09): DataFrame =
    qualitySelect(tokensFrame.select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        graft.functions.array_gram_stats(col("toks"), 2).as("gs")),
      minTokens, maxTokens, maxTopGramFrac, maxDupGramFrac)

  private def qualitySelect(signals: DataFrame, minTokens: Int,
      maxTokens: Int, maxTopGramFrac: Double, maxDupGramFrac: Double): DataFrame =
    signals.select(col("doc_id"), col("n_tokens"),
      col("gs.top_gram_frac").as("top_gram_frac"),
      col("gs.dup_gram_frac").as("dup_gram_frac"),
      (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
        col("gs.top_gram_frac") <= maxTopGramFrac &&
        col("gs.dup_gram_frac") <= maxDupGramFrac)
        .as("keep"))

  /** Redaction patterns, applied in order (URLs before emails — a URL
    * can contain an `@`). Conservative syntax that parses identically
    * under Java regex and RE2, so the transform is reproducible in
    * SQL engines too. */
  val redactionPatterns: Seq[(String, String)] = Seq(
    "https?://[^\\s]+" -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" -> "<IP>",
    "\\+?\\d[\\d().-]{6,13}\\d" -> "<PHONE>")

  /** PII redaction: URLs, emails, IPv4 addresses, and phone-shaped
    * digit runs replaced by typed placeholder tokens, with a count of
    * redactions per document. Pure zero-shuffle projection — the
    * baseline scrub every public-web training corpus runs. (A
    * production deployment swaps in jurisdiction-specific pattern
    * packs; the operator shape — ordered regex chain, audit count —
    * is the part that matters.) */
  def redact(docs: DataFrame): DataFrame = {
    // Each pattern is counted on the text state it actually sees in
    // the replacement chain (an IPv4 already redacted to <IP> must
    // not ALSO count as a phone-shaped digit run).
    val (redacted, counts) = redactionPatterns
      .foldLeft((col("text"), Seq.empty[Column])) {
        case ((c, cs), (pat, tok)) =>
          (regexp_replace(c, pat, tok), cs :+ regexp_count(c, lit(pat)))
      }
    docs.select(col("doc_id"), redacted.as("text"),
      counts.reduce(_ + _).as("n_redactions"))
  }

  /** Encoding-damage (mojibake) repair: UTF-8 text that was at some
    * point decoded as Windows-1252 ("cafÃ©", "donâ€™t", double-encoded
    * "cafÃƒÂ©") restored by re-encoding each provably round-tripping
    * non-ASCII run, up to 3 passes — the ftfy-class fix a raw web
    * corpus needs BEFORE token counts, language ID, or any dedup
    * fingerprint (damaged and healthy spellings of the same sentence
    * hash apart). Healthy text is untouchable by construction: a
    * legitimate "é" re-encodes to one byte that is not valid UTF-8,
    * and characters outside cp1252's image are not encodable at all.
    *
    * Output: `text_fixed`, `n_fixed` (runs changed — the per-source
    * corpus-health signal), `changed`. Zero-shuffle codegen'd
    * projection ([[graft.functions.mojibake_repair]]); ASCII rows
    * cost one byte scan. */
  def fixEncoding(docs: DataFrame): DataFrame = {
    val n = graft.functions.mojibake_repair_count(col("text"))
    docs.select(col("doc_id"),
      graft.functions.mojibake_repair(col("text")).as("text_fixed"),
      n.as("n_fixed"), (n > 0).as("changed"))
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

  /** Character-trigram language-model scoring — the cheap stand-in for
    * perplexity filtering (CCNet-style: docs whose character statistics
    * diverge from the reference corpus are low-quality candidates).
    * Builds a trigram unigram-count model over `refDocs` (defaults to
    * the scored corpus itself), then scores each document by its
    * trigrams' reference frequencies. Output per doc:
    * `n_tri` (trigram count), `sum_cnt` (EXACT sum of reference counts
    * — the integer pair that pins the whole model join for the
    * oracle), `avg_p` (mean trigram probability, fixed-order double
    * division so engines agree bitwise), and `log_prob` (add-one-
    * smoothed mean log-likelihood `mean(ln(cnt+1)) − ln(total)`, the
    * conventional LM score — derived, so kept out of the gate frame
    * where libm ulp differences could flake a hash compare).
    * Unseen trigrams (cross-corpus scoring) count 0 — a doc of fully
    * unseen text scores `sum_cnt = 0`.
    *
    * Scale posture: the model is a map-side-combined count over
    * exploded trigrams whose key space is bounded by the CHARSET, not
    * the corpus — but that bound is only broadcast-small for ASCII-ish
    * text (≤~1M trigrams); multilingual/CJK corpora can reach 1e8+
    * distinct char trigrams. So the broadcast is GATED, not assumed:
    * the aggregated model is materialized, its exact row count read
    * (an O(model) action, cheap — the model is already the corpus
    * reduced to per-gram counts), and only a model within
    * `maxBroadcastModel` rows scores through the NATIVE path: the
    * model is collected (bounded by the same gate) into a
    * trigram→count map that rides the serialized plan, and
    * [[graft.functions.trigram_lm_score]] walks each document's
    * codepoint windows once, emitting the per-doc aggregate directly
    * — zero explode, zero join, zero shuffle on the scoring side (the
    * declarative spelling materialized one row per corpus CHARACTER
    * and shuffled it through the model join). A bigger model falls
    * back to the declarative explode → shuffle join → per-doc
    * aggregate (one extra exchange of the trigram frame, never a
    * driver OOM). Both paths agree row-for-row (spec-pinned): same
    * half-open codepoint windows, same unseen-counts-0 contract; the
    * integer columns (n_tri, sum_cnt) are exact across paths, while
    * the float columns (avg_p, log_prob) agree to FP tolerance — the
    * declarative avg() accumulates in shuffle-dependent order, so the
    * log1p mean can differ by ulps between spellings (the parity spec
    * pins 1e-9). An EMPTY reference model (no trigrams at all) yields
    * NULL avg_p/log_prob on both paths — the fallback's sum over an
    * empty frame is NULL, and the native path guards totalCnt == 0
    * explicitly rather than emitting 0/0 NaNs. */
  def lmScore(docs: DataFrame, refDocs: DataFrame = null,
      persist: Persistence = Persistence.Local,
      maxBroadcastModel: Long = 1000000L): DataFrame = {
    def tris(df: DataFrame): DataFrame = df
      .select(col("doc_id"), TextOps.normalized(col("text")).as("s"))
      // CASE guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) instead
      // of returning empty, so sub-trigram docs need the explicit
      // empty-array branch (DuckDB's end-exclusive range(1, 1) is
      // naturally empty).
      .select(col("doc_id"), explode(expr(
        """CASE WHEN length(s) >= 3
          |THEN transform(sequence(1, length(s) - 2), i -> substring(s, i, 3))
          |ELSE array() END""".stripMargin)).as("tr"))
    val selfScored = refDocs == null
    // Model build: per-doc native trigram histograms pre-aggregate the
    // explode to one row per distinct trigram per doc (the declarative
    // spelling exploded one row per corpus character); the trigram
    // groupBy then sums histograms — same counts, spec-pinned.
    val model = persist((if (selfScored) docs else refDocs)
      .select(explode(graft.functions.char_trigram_counts(
        TextOps.normalized(col("text")))).as(Seq("tr", "c")))
      .groupBy(col("tr")).agg(sum(col("c")).as("cnt")))
    if (model.count() <= maxBroadcastModel) {
      // Native path: model → driver map (bounded by the same gate that
      // would have broadcast it anyway), total computed from the same
      // collected rows (no extra job), one codegen'd walk per doc.
      val rows = model.collect()
      var totalCnt = 0L
      rows.foreach(r => totalCnt += r.getLong(1))
      val table = org.apache.spark.sql.graft.TrigramLmTable.build(
        rows.iterator.map(r =>
          (org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
            r.getLong(1))))
      docs
        .select(col("doc_id"),
          graft.functions.trigram_lm_score(TextOps.normalized(col("text")), table)
            .as("lm"))
        // The declarative group-by drops trigram-less docs (nothing to
        // explode); the projection must shed the same rows.
        .filter(col("lm.n_tri") > 0)
        .select(col("doc_id"),
          col("lm.n_tri").as("n_tri"),
          col("lm.sum_cnt").as("sum_cnt"),
          // totalCnt == 0 (empty reference model): the declarative
          // fallback's `sum(cnt)` over zero model rows is NULL, making
          // avg_p/log_prob NULL — mirror that here instead of 0/0 NaN
          // and log(0) = -Inf (both paths must agree on the degenerate
          // empty-model edge).
          (if (totalCnt == 0L) lit(null).cast("double")
           else (col("lm.sum_cnt").cast("double") / col("lm.n_tri") /
             lit(totalCnt))).as("avg_p"),
          (if (totalCnt == 0L) lit(null).cast("double")
           else (col("lm.log1p_sum") / col("lm.n_tri")) -
             log(lit(totalCnt).cast("double"))).as("log_prob"))
    } else {
      // Shuffle-join fallback (CJK-scale trigram spaces). Self-scoring
      // materializes the scoring frame: the explode allocates one small
      // string per character of the corpus — worth never running twice
      // (the model pass above already paid its own explode).
      val docTris = if (selfScored) persist(tris(docs)) else tris(docs)
      val total = model.agg(sum(col("cnt")).as("total"))
      docTris
        .join(model, Seq("tr"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tri"),
          coalesce(sum(col("cnt")), lit(0L)).as("sum_cnt"),
          avg(log(coalesce(col("cnt"), lit(0L)) + 1d)).as("log1p_cnt_mean"))
        .crossJoin(broadcast(total))
        .select(col("doc_id"), col("n_tri"), col("sum_cnt"),
          (col("sum_cnt").cast("double") / col("n_tri") / col("total")).as("avg_p"),
          (col("log1p_cnt_mean") - log(col("total").cast("double"))).as("log_prob"))
    }
  }

  /** CCNet-style perplexity bucketing: split the corpus into `tiles`
    * equal-population bands of LM score — head / middle / tail for
    * the classic `tiles = 3` — optionally per source (CCNet buckets
    * per language; source is this corpus's grouping analog). The
    * selection primitive behind "train on the head, sample the
    * middle, drop the tail": downstream, the `bucket` column feeds
    * [[graft.ops.Sampling.mixtureSample]] with per-bucket rates.
    *
    * Ranks by [[lmScore]]'s `avg_p` DESCENDING — highest average
    * trigram probability = lowest perplexity = tile 0 = `head` — via
    * [[graft.ops.Ranking.rankTiles]]' exact competition-rank
    * arithmetic (ties share a tile on every engine; no task ever
    * sorts more than one score-range bucket of one group's distinct
    * scores). `avg_p` doubles are bit-identical across engines (the
    * `text_lm_score` gate pins that), so an ANSI `RANK()` oracle
    * reproduces every bucket exactly. Docs with no trigrams carry no
    * LM evidence and are absent, as in [[lmScore]].
    *
    * Scale: the [[lmScore]] pass (broadcast-model projection under
    * the gate), one keyed join to recover `source` when `perSource`
    * (the LM frame is doc-keyed already), and the rank machinery's
    * distinct-score pass. No global sort, no corpus-shaped driver
    * state. */
  def pplBuckets(docs: DataFrame, refDocs: DataFrame = null,
      tiles: Int = 3, perSource: Boolean = false,
      fanout: Int = 64): DataFrame = {
    val scored = lmScore(docs, refDocs)
    val (frame, grp) =
      if (perSource)
        (scored.join(docs.select(col("doc_id"), col("source")), "doc_id"),
          Seq("source"))
      else (scored, Nil)
    val tiled = graft.ops.Ranking.rankTiles(frame, "avg_p", tiles,
      groupCols = grp, ascending = false, fanout = fanout)
    val label =
      if (tiles == 3) when(col("tile") === 0, lit("head"))
        .when(col("tile") === 1, lit("middle")).otherwise(lit("tail"))
      else concat(lit("t"), col("tile"))
    tiled.withColumn("bucket", label)
  }

  /** Broadcast linear quality classifier — the fastText-style shape
    * real curation stacks run for learned quality/langid gating:
    * `score = σ(bias + mean_g w[h(g) mod D])` over the document's
    * hashed bag of word n-grams (all lengths `1..wordNgrams`, fastText
    * `-wordNgrams` semantics). The weight vector is trained OFFLINE
    * (any logistic-regression fit over the same hashed features);
    * this operator is the apply side.
    *
    * Output per doc: `n_grams`, `sum_w` (the feature-weight sum in
    * exact DECIMAL(38,6) — order-independent, so the gate can hash it
    * bitwise across engines; weights are quantized to 6dp on entry),
    * and `score` (the sigmoid of `bias + sum_w / n_grams`, plain
    * double — derived, so kept out of hash-gated frames like
    * [[lmScore]]'s `log_prob`). A gram's bucket is the first 32 bits
    * of its md5, mod D — the same engine-portable hash family as
    * [[graft.ops.Sampling.hashUniform]].
    *
    * Scale posture: a pure zero-shuffle projection. The model rides
    * the plan as ONE array literal (D doubles ≈ 8·D bytes — 8 MB at
    * fastText's default 2²⁰ buckets, shipped once per executor with
    * the task closure, never per row); the corpus is never exploded,
    * joined, or re-partitioned. */
  def classifierScore(docs: DataFrame, weights: Seq[Double],
      bias: Double = 0.0, wordNgrams: Int = 2): DataFrame =
    // Spread.ifNarrow (r14): the tokenize + per-gram md5 fold is this
    // operator's entire cost and runs upstream of every exchange — a
    // narrow scan serializes it. At scale the helper is a no-op, so
    // the zero-shuffle posture above still holds where it matters.
    classifierScoreFromTokens(
      Spread.ifNarrow(docs, col("doc_id"))
        .withColumn("toks", graft.functions.word_tokens(col("text"))),
      weights, bias, wordNgrams)

  /** [[classifierScore]] over a materialized TOKEN INDEX (a frame
    * carrying `doc_id` and a [[graft.functions.word_tokens]] `toks`
    * column, e.g. [[Curation.pipeline]]'s shared base): byte-identical
    * scores with zero re-tokenize. */
  def classifierScoreFromTokens(tokensFrame: DataFrame, weights: Seq[Double],
      bias: Double = 0.0, wordNgrams: Int = 2): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(wordNgrams >= 1, s"wordNgrams must be positive, got $wordNgrams")
    val d = weights.length
    val wLit = array(weights.map(w =>
      lit(BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .underlying).cast("decimal(38,6)")): _*)
    val bucket = (g: Column) =>
      (conv(substring(md5(g), 1, 8), 16, 10).cast("long") % d).cast("int")
    def gramsOf(toks: Column, k: Int): Column =
      // sequence(0, -1) DESCENDS instead of returning empty (see
      // lmScore) — sub-k docs need the explicit empty branch.
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => array_join(slice(toks, i + 1, lit(k)), " ")))
        .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
    tokensFrame
      .withColumn("grams",
        concat((1 to wordNgrams).map(k => gramsOf(col("toks"), k)): _*))
      .withColumn("n_grams", size(col("grams")).cast("long"))
      .withColumn("sum_w_dec", aggregate(col("grams"),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)"),
        (acc, g) => (acc + element_at(wLit, bucket(g) + 1)).cast("decimal(38,6)")))
      .select(col("doc_id"), col("n_grams"),
        col("sum_w_dec").cast("double").as("sum_w"),
        (lit(1.0) / (lit(1.0) + exp(-(lit(bias) +
          when(col("n_grams") === 0, lit(0.0))
            .otherwise(col("sum_w_dec").cast("double") / col("n_grams"))))))
          .as("score"))
  }

  /** Classifier evaluation — the third leg of the learned-gate loop
    * (train → score → EVALUATE → pick the threshold). Input: any
    * frame with a score column and a {0,1} label column (the gate
    * feeds [[classifierScore]]'s margin `sum_w / n_grams`, which is
    * cross-engine-exact; the sigmoid is monotone, so margin-ranked
    * AUC ≡ score-ranked AUC and a margin threshold ≡ a score
    * threshold). Output: ONE row — confusion counts at `threshold`
    * (predicted positive ⇔ score ≥ threshold), exact integer
    * precision/recall/F1 numerators-and-denominators as doubles of
    * one division each, and ROC AUC.
    *
    * AUC is the Mann-Whitney statistic computed EXACTLY and without
    * an all-pairs join: aggregate to per-distinct-score
    * (n_pos, n_neg) counts (map-side combined), sort ascending, and
    * accumulate `auc_num2 = Σ_s n_pos(s)·(2·negBelow(s) + n_neg(s))`
    * — twice the pair count where the positive outranks the negative
    * plus ties counted half, an exact INTEGER the oracle replays
    * bit-for-bit; `auc = auc_num2 / (2·P·N)` is one division. The
    * running negatives-below sum is computed per score-range bucket
    * with chained subtotals ([[bucketedRunningSums]] — the
    * [[Sampling.budgetCap]] monotone-bucket pattern), so even a
    * continuous score whose distinct count approaches corpus size
    * never funnels through one unpartitioned window; `fanout = 1` is
    * the plain spelling, result-identical (exact integers either
    * way, spec-pinned). */
  def classifierEval(scored: DataFrame, scoreCol: String, labelCol: String,
      threshold: Double = 0.0, fanout: Int = 64): DataFrame = {
    val s = col(scoreCol)
    val y = col(labelCol).cast("long")
    val conf = scored.agg(
      count(lit(1)).as("n"),
      sum(y).as("p"),
      sum(lit(1L) - y).as("n_neg"),
      sum(when(s >= threshold, y).otherwise(0L)).as("tp"),
      sum(when(s >= threshold, lit(1L) - y).otherwise(0L)).as("fp"),
      sum(when(s < threshold, lit(1L) - y).otherwise(0L)).as("tn"),
      sum(when(s < threshold, y).otherwise(0L)).as("fn"),
      // Score range for the bucketed prefix sum below; one stats row
      // serves both consumers (ReusedExchange on the broadcast).
      min(s.cast("double")).as("s_min"), max(s.cast("double")).as("s_max"))
    val byScore = scored.groupBy(s.as("sc"))
      .agg(sum(y).as("np"), sum(lit(1L) - y).as("nn"))
    val aucNum = bucketedRunningSums(byScore, "sc", conf, Seq("nn"),
        ascending = true, fanout = fanout)
      .agg(sum(col("np") * (lit(2L) * col("_pre_nn") + col("nn")))
        .as("auc_num2"))
    conf.crossJoin(broadcast(aucNum))
      .select(col("n"), col("p"), col("n_neg"),
        col("tp"), col("fp"), col("tn"), col("fn"),
        // ANSI mode errors on /0 even for doubles; an empty class or
        // an empty predicted-positive set is data, not a crash — NaN.
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp")))
          .otherwise(lit(Double.NaN)).as("precision"),
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn")))
          .otherwise(lit(Double.NaN)).as("recall"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          (lit(2L) * col("tp")).cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn")))
          .otherwise(lit(Double.NaN)).as("f1"),
        col("auc_num2"),
        when(col("p") * col("n_neg") > 0,
          col("auc_num2").cast("double") /
            (lit(2L) * col("p") * col("n_neg")).cast("double"))
          .otherwise(lit(Double.NaN)).as("auc"))
  }

  /** Per-GROUP [[classifierEval]]: the same confusion counts and
    * exact Mann-Whitney AUC, one row per value of `groupCol` — the
    * per-slice model-quality audit (does the learned gate hold on
    * every source/language, or only on the dominant one?) read
    * before trusting one global threshold. Better scale posture than
    * the global row: the AUC window partitions BY GROUP, so no
    * single-partition sort exists at any size; everything else is
    * map-side-combined per-group aggregation. Same exact-arithmetic
    * portability (integer auc_num2, single-division rates). Groups
    * with only one class yield NaN AUC (0/0) — surfaced, not
    * hidden. */
  def classifierEvalByGroup(scored: DataFrame, scoreCol: String,
      labelCol: String, groupCol: String,
      threshold: Double = 0.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = col(scoreCol)
    val y = col(labelCol).cast("long")
    val g = col(groupCol)
    val conf = scored.groupBy(g.as("grp")).agg(
      count(lit(1)).as("n"),
      sum(y).as("p"),
      sum(lit(1L) - y).as("n_neg"),
      sum(when(s >= threshold, y).otherwise(0L)).as("tp"),
      sum(when(s >= threshold, lit(1L) - y).otherwise(0L)).as("fp"),
      sum(when(s < threshold, lit(1L) - y).otherwise(0L)).as("tn"),
      sum(when(s < threshold, y).otherwise(0L)).as("fn"))
    val byScore = scored.groupBy(g.as("grp"), s.as("sc"))
      .agg(sum(y).as("np"), sum(lit(1L) - y).as("nn"))
    val w = Window.partitionBy(col("grp")).orderBy(col("sc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val aucNum = byScore
      .withColumn("neg_below", sum(col("nn")).over(w) - col("nn"))
      .groupBy(col("grp"))
      .agg(sum(col("np") * (lit(2L) * col("neg_below") + col("nn")))
        .as("auc_num2"))
    conf.join(aucNum, Seq("grp"))
      .select(col("grp"), col("n"), col("p"), col("n_neg"),
        col("tp"), col("fp"), col("tn"), col("fn"),
        // ANSI mode errors on /0 even for doubles; an empty class or
        // an empty predicted-positive set is data, not a crash — NaN.
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp")))
          .otherwise(lit(Double.NaN)).as("precision"),
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn")))
          .otherwise(lit(Double.NaN)).as("recall"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          (lit(2L) * col("tp")).cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn")))
          .otherwise(lit(Double.NaN)).as("f1"),
        col("auc_num2"),
        when(col("p") * col("n_neg") > 0,
          col("auc_num2").cast("double") /
            (lit(2L) * col("p") * col("n_neg")).cast("double"))
          .otherwise(lit(Double.NaN)).as("auc"))
  }

  /** The monotone-bucket two-phase prefix sum shared by [[rocCurve]]
    * and [[classifierEval]] (the [[Sampling.budgetCap]] pattern): the
    * running sums over the distinct-score frame are computed per
    * `floor`-range bucket of the score — MONOTONE in the sort key, so
    * chaining the per-bucket subtotals (a `fanout`-row window)
    * reproduces the global prefix sum exactly while no task ever
    * sorts more than one bucket's distinct scores. `fanout = 1` is
    * the plain single-window spelling; results are identical
    * (spec-pinned) because the arithmetic is exact integer sums
    * either way. Returns the input frame plus one exclusive
    * (`_pre_`) and one inclusive (`_cum_`) running total per summed
    * column, in `ascending` (AUC) or descending (ROC) score order.
    *
    * `stats` must be a one-row frame carrying `s_min`/`s_max` (the
    * score range, doubles — used only to ASSIGN buckets, so float
    * rounding cannot affect results, just balance). NULL scores sort
    * last in both orders (Spark's asc-nulls-last would differ, but
    * both callers cast/coalesce away nulls upstream); they land in
    * the final bucket via the coalesce. */
  private def bucketedRunningSums(byScore: DataFrame, scoreCol: String,
      stats: DataFrame, sumCols: Seq[String], ascending: Boolean,
      fanout: Int): DataFrame = {
    require(fanout >= 1, s"fanout must be positive, got $fanout")
    val W = org.apache.spark.sql.expressions.Window
    val sc = col(scoreCol)
    val ord = if (ascending) sc.asc else sc.desc
    if (fanout == 1) {
      val w = W.orderBy(ord).rowsBetween(W.unboundedPreceding, W.currentRow)
      val wx = W.orderBy(ord).rowsBetween(W.unboundedPreceding, -1)
      sumCols.foldLeft(byScore) { (df, c) =>
        df.withColumn(s"_cum_$c", sum(col(c)).over(w))
          .withColumn(s"_pre_$c", coalesce(sum(col(c)).over(wx), lit(0L)))
      }
    } else {
      // Bucket 0 holds the FIRST scores of the traversal order (the
      // highest for descending, the lowest for ascending), so the
      // subtotal chain always runs bucket-ascending.
      val frac = when(col("s_max") === col("s_min"), lit(0.0))
        .otherwise((sc.cast("double") - col("s_min")) /
          (col("s_max") - col("s_min")))
      val bucket = least(lit(fanout - 1), floor(
        (if (ascending) frac else lit(1.0) - frac) * fanout)).cast("int")
      val withB = byScore.crossJoin(broadcast(stats))
        .withColumn("_rb", coalesce(bucket, lit(fanout - 1)))
      val localW = W.partitionBy(col("_rb")).orderBy(ord)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
      val localWx = W.partitionBy(col("_rb")).orderBy(ord)
        .rowsBetween(W.unboundedPreceding, -1)
      // The chain input is the per-bucket subtotal frame — at most
      // `fanout` rows by construction, so one partition is the DESIGN
      // (the whole point is that only this tiny frame funnels). The
      // constant-valued partition key states that boundedness to the
      // planner instead of tripping the "no partition defined"
      // heuristic that exists to catch UNBOUNDED single-task sorts; it
      // must be non-foldable (pmod of the bucket, not a literal) or
      // EliminateWindowPartitions strips it back to the warning case.
      val chainW = W.partitionBy(pmod(col("_rb"), lit(1)))
        .orderBy(col("_rb").asc)
        .rowsBetween(W.unboundedPreceding, -1)
      val offsets = sumCols.foldLeft(
          withB.groupBy(col("_rb"))
            .agg(sumCols.map(c => sum(col(c)).as(s"_bt_$c")).head,
              sumCols.map(c => sum(col(c)).as(s"_bt_$c")).tail: _*)) {
          (df, c) =>
            df.withColumn(s"_off_$c",
              coalesce(sum(col(s"_bt_$c")).over(chainW), lit(0L)))
        }
        .select(col("_rb") +: sumCols.map(c => col(s"_off_$c")): _*)
      val local = sumCols.foldLeft(withB) { (df, c) =>
        df.withColumn(s"_lc_$c", sum(col(c)).over(localW))
          .withColumn(s"_lp_$c", coalesce(sum(col(c)).over(localWx), lit(0L)))
      }
      val joined = local.join(offsets, Seq("_rb"))
      sumCols.foldLeft(joined) { (df, c) =>
        df.withColumn(s"_cum_$c", col(s"_off_$c") + col(s"_lc_$c"))
          .withColumn(s"_pre_$c", col(s"_off_$c") + col(s"_lp_$c"))
      }.drop("_rb" +: stats.columns.toSeq ++:
        sumCols.flatMap(c => Seq(s"_off_$c", s"_lc_$c", s"_lp_$c")): _*)
    }
  }

  /** Full ROC curve as data: one row per DISTINCT score, ordered by
    * descending threshold — at threshold = that score (predicted
    * positive ⇔ score ≥ threshold), the cumulative true/false
    * positive counts and their single-division TPR/FPR. The
    * threshold-sweep companion of [[classifierEval]]'s one-row
    * summary: plot it, or pick the knee ([[pickThreshold]]). Exact
    * integers + one IEEE division per rate — fully oracle-portable.
    *
    * Scale posture: the running tp/fp sums are computed per
    * score-range bucket and the tiny per-bucket subtotal frame is
    * chained ([[bucketedRunningSums]] — the [[Sampling.budgetCap]]
    * monotone-bucket pattern), so no task ever sorts more than one
    * bucket of the distinct-score frame: a continuous score whose
    * distinct count approaches corpus size no longer funnels through
    * one unpartitioned window. `fanout = 1` is the plain spelling,
    * result-identical (spec-pinned). */
  def rocCurve(scored: DataFrame, scoreCol: String,
      labelCol: String, fanout: Int = 64): DataFrame = {
    val s = col(scoreCol)
    val y = col(labelCol).cast("long")
    // ONE stats row serves both the bucket assignment (s_min/s_max)
    // and the final tpr/fpr divisions (p/n_neg): the two broadcast
    // exchanges share an identical child plan, so the corpus-scan
    // aggregate runs once (ReusedExchange).
    val totals = scored.agg(sum(y).as("p"), sum(lit(1L) - y).as("n_neg"),
      min(s.cast("double")).as("s_min"), max(s.cast("double")).as("s_max"))
    val byScore = scored.groupBy(s.as("score"))
      .agg(sum(y).as("np"), sum(lit(1L) - y).as("nn"))
    bucketedRunningSums(byScore, "score", totals, Seq("np", "nn"),
        ascending = false, fanout = fanout)
      .withColumnRenamed("_cum_np", "cum_tp")
      .withColumnRenamed("_cum_nn", "cum_fp")
      .crossJoin(broadcast(totals))
      .select(col("score"), col("cum_tp"), col("cum_fp"),
        when(col("p") > 0, col("cum_tp").cast("double") / col("p"))
          .otherwise(lit(Double.NaN)).as("tpr"),
        when(col("n_neg") > 0, col("cum_fp").cast("double") / col("n_neg"))
          .otherwise(lit(Double.NaN)).as("fpr"))
  }

  /** Operating-point picker over a [[rocCurve]] frame: the single
    * threshold a deployed gate should run at, derived from data
    * instead of hand-set. Exactly one target must be given:
    *   - `targetPrecision`: the highest-recall threshold whose
    *     precision `cum_tp / (cum_tp + cum_fp)` still meets the
    *     target — "keep as much as possible while at most X% of what
    *     we keep is junk", the curation-gate calibration question;
    *   - `targetFpr`: the highest-TPR threshold with `fpr` at or
    *     under the target — the alarm-budget spelling.
    * Ties on recall break toward fewer false positives, then the
    * higher threshold, so the pick is total and deterministic. Output:
    * ONE row `(threshold, cum_tp, cum_fp, precision, tpr, fpr)` — or
    * ZERO rows when no threshold meets the target (a gate that cannot
    * be calibrated should fail loudly at the caller, not silently run
    * at an arbitrary point). All counts are the curve's exact
    * integers; each rate is one IEEE division — fully oracle-portable.
    *
    * Scale posture: a filter plus an `orderBy(...).limit(1)` —
    * TakeOrderedAndProject, every partition ships one candidate row;
    * no global sort, no window. */
  def pickThreshold(roc: DataFrame, targetPrecision: Option[Double] = None,
      targetFpr: Option[Double] = None): DataFrame = {
    require(targetPrecision.isDefined != targetFpr.isDefined,
      "exactly one of targetPrecision / targetFpr must be set")
    val prec = when(col("cum_tp") + col("cum_fp") > 0,
      col("cum_tp").cast("double") / (col("cum_tp") + col("cum_fp")))
      .otherwise(lit(Double.NaN))
    val keep = targetPrecision match {
      case Some(p) => prec >= lit(p)
      case None => col("fpr") <= lit(targetFpr.get)
    }
    roc.filter(keep)
      .orderBy(col("cum_tp").desc, col("cum_fp").asc, col("score").desc)
      .limit(1)
      .select(col("score").as("threshold"), col("cum_tp"), col("cum_fp"),
        prec.as("precision"), col("tpr"), col("fpr"))
  }

  /** Reliability diagram as data — the calibration companion of
    * [[rocCurve]]: map each margin through the same algebraic fast
    * sigmoid the trainer uses (`p = 0.5 + 0.5·m/(1+|m|)` — single
    * correctly-rounded IEEE ops, no libm), bucket `p` into `bins`
    * fixed-width probability bins, and report each bin's population
    * and EMPIRICAL positive rate. A well-calibrated gate's
    * `pos_rate` tracks its bin's probability range; a sigmoid that
    * says 0.9 where only half the docs are positive is how a
    * threshold picked on yesterday's corpus quietly rots — this is
    * the table that shows it. ROC/AUC rank; calibration tells you
    * whether the SCORES mean anything, which matters the moment a
    * pipeline treats them as keep-probabilities
    * ([[graft.ops.Sampling.weightedBernoulli]] on classifier scores).
    *
    * Output: one row per non-empty bin — (bin, bin_lo, bin_hi, n,
    * n_pos, pos_rate). Exact integer counts, one division per rate,
    * fixed-order bin arithmetic — fully oracle-portable. Scale: ONE
    * map-side-combinable aggregation on a bounded key (≤ `bins`
    * rows out); nothing else. */
  def classifierCalibration(scored: DataFrame, scoreCol: String,
      labelCol: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be positive, got $bins")
    val m = col(scoreCol).cast("double")
    val p = lit(0.5) + lit(0.5) * m / (lit(1.0) + abs(m))
    val y = col(labelCol).cast("long")
    scored
      .withColumn("bin",
        least(lit(bins - 1), floor(p * lit(bins.toDouble))).cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(y).as("n_pos"))
      .select(col("bin"),
        (col("bin").cast("double") / lit(bins.toDouble)).as("bin_lo"),
        ((col("bin") + 1).cast("double") / lit(bins.toDouble)).as("bin_hi"),
        col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n")).as("pos_rate"))
  }

  /** Distributed trainer for [[classifierScore]]'s model family:
    * deterministic full-batch logistic-style regression over the SAME
    * hashed bag-of-word-ngrams feature space (first-32-md5-bits mod
    * `dim`, n-grams of lengths 1..`wordNgrams`). This closes the loop
    * classifierScore left open — it applies weights; this produces
    * them from a labeled seed set (`labelCol` ∈ {0, 1}), the way real
    * curation stacks fit their fastText-shape quality/langid gates.
    *
    * The entire algorithm is EXACT fixed-point integer arithmetic so
    * an ANSI SQL engine can replay it bit-for-bit:
    *   - weights live in integer units of 1e-12 (`w_scaled`),
    *   - predicted probabilities are quantized to integer units of
    *     1e-6 through the algebraic fast sigmoid
    *     `p = 0.5 + (0.5·m)/(1+|m|)` — one multiply, one add, one
    *     divide, one `floor(p·1e6 + 0.5)`: every step is a single
    *     correctly-rounded IEEE op, identical across engines (no
    *     libm transcendental anywhere),
    *   - gradients are exact integer sums — accumulated in signed
    *     128-bit partials here (covers the full DECIMAL(38,0) /
    *     HUGEINT domain the oracle replay uses) — no overflow, no
    *     order dependence,
    *   - the learning-rate step is half-away-from-zero integer
    *     division by `lrDen·N` with rate `lrNum/lrDen`.
    * Features: binary bucket presence by default (`meanPool=false`,
    * the configuration that trains well in few full-batch passes), or
    * fastText mean pooling `count/n_grams` (`meanPool=true` — the
    * exact feature map [[classifierScore]] applies, for weights meant
    * to feed it; per-doc division is folded into the gradient as
    * `rq = round(resid·1e6 / n)` so sums stay integral). The
    * intercept is bucket −1 with feature 1. Output: one row per
    * OBSERVED bucket (plus intercept): `bucket`, exact `w_scaled`
    * (the hash-gated value), derived `weight = w_scaled/1e12`.
    *
    * Scale posture: the corpus-sized feature frame is built once
    * (one tokenize pass + one (doc,bucket) map-side-combined groupBy),
    * hash-partitioned by doc_id, and persisted; each iteration is
    * then ONE fused job over ONE scan of that cached frame with NO
    * shuffle and NO join at all (the MLlib gradient-aggregate shape):
    * the model rides the task closure as a dim+1-entry long array
    * (one O(1) lookup per item, no per-iteration broadcast build
    * job), each partition folds margin → residual → per-bucket
    * gradient terms in a single pass into a dim+1-slot exact 128-bit
    * accumulator, and the per-partition partials — two long arrays
    * each — are merged on the driver. featDoc CARRIES each doc's
    * (bk, c, nd) items as a collect_list — per-doc buffer bounded by
    * min(dim, grams-in-doc). Driver state is O(dim) per partial.
    * Magnitude bounds: per-row gradient terms are ≤ 1e12 by
    * construction; margins need |w|·n_doc < 9.2e6 in real units to
    * stay in signed-64 partials — satisfied for |w| ≤ 10 up to ~900k
    * grams per document. The margin fold runs in primitive LONG
    * arithmetic (exact and order-free within the bound; ANSI mode
    * turns an overflow into a loud failure rather than a silent
    * widening — the gradient sums stay DECIMAL(38,0), which no
    * corpus size can overflow). */
  def classifierTrain(docs: DataFrame, labelCol: String, dim: Int,
      wordNgrams: Int = 2, iters: Int = 12,
      lrNum: Long = 1L, lrDen: Long = 2L,
      meanPool: Boolean = false,
      persist: Persistence = Persistence.Local,
      init: DataFrame = null): DataFrame = {
    require(dim >= 1, s"dim must be positive, got $dim")
    require(wordNgrams >= 1, s"wordNgrams must be positive, got $wordNgrams")
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(lrNum >= 1 && lrDen >= 1, s"learning rate must be positive, got $lrNum/$lrDen")
    val spark = docs.sparkSession
    import spark.implicits._

    val bucket = (g: Column) =>
      (conv(substring(md5(g), 1, 8), 16, 10).cast("long") % dim).cast("int")
    def gramsOf(toks: Column, k: Int): Column =
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => array_join(slice(toks, i + 1, lit(k)), " ")))
        .otherwise(expr("CAST(array() AS ARRAY<STRING>)"))
    // Spread BEFORE the feature build (r14 optimization): the
    // tokenize + gram + md5-bucket projection is the row's most
    // expensive stage (measured ~10 s single-task per lap at sf0.1 —
    // the per-gram md5 runs in the SCAN stage, upstream of every
    // exchange, so a narrow input serializes it). No-op at scale.
    val docsSpread = Spread.ifNarrow(docs, col("doc_id"))
    val bk0 = docsSpread
      .withColumn("toks", graft.functions.word_tokens(col("text")))
      .withColumn("grams",
        concat((1 to wordNgrams).map(k => gramsOf(col("toks"), k)): _*))
      .select(col("doc_id"), col(labelCol).cast("long").as("y"),
        explode(col("grams")).as("g"))
      .select(col("doc_id"), col("y"), bucket(col("g")).as("bk"))
    val counts = bk0.groupBy("doc_id", "y", "bk").agg(count(lit(1)).as("cnt"))
    // Binary-presence features (the default) need no per-doc gram
    // total: c = nd = 1, so the totals aggregation and its join exist
    // only on the meanPool path.
    val content =
      if (meanPool) {
        val totals = counts.groupBy("doc_id").agg(sum(col("cnt")).as("n"))
        counts.join(totals, "doc_id").select(
          col("doc_id"), col("y"), col("bk"),
          col("cnt").as("c"), col("n").as("nd"))
      } else counts.select(
        col("doc_id"), col("y"), col("bk"),
        lit(1L).as("c"), lit(1L).as("nd"))
    val intercept = docsSpread.select(col("doc_id"),
      col(labelCol).cast("long").as("y"),
      lit(-1).as("bk"), lit(1L).as("c"), lit(1L).as("nd"))
    // ONE row per doc: label + the (bk, c, nd) item array. Grouping
    // happens ONCE here, not once per iteration; the per-doc buffer is
    // bounded by min(dim, grams-in-doc) items.
    // NOTE deliberately NOT Spread.keyed: the 12-iteration loop over
    // featDoc is task-overhead-bound, not compute-bound (measured:
    // pinning 32 partitions tripled the per-iteration stage wall at
    // sf0.1); the AQE-coalesced width is the right one here, and at
    // scale repartition(col) widens on its own.
    // `ndoc` (the per-doc gram total driving the meanPool divisor) is
    // ITERATION-INVARIANT — computed once here rather than as a
    // per-iteration interpreted HOF over every doc's item array
    // (r14 optimization; 12 iterations re-derived it before).
    val featDoc = persist(content.unionByName(intercept)
      .repartition(col("doc_id"))
      .groupBy(col("doc_id"))
      .agg(max(col("y")).as("y"),
        collect_list(struct(col("bk"), col("c"), col("nd"))).as("items"),
        max(col("nd")).as("ndoc")))

    val nDocs = docs.count()
    // Warm start: `init` is a prior classifierTrain OUTPUT frame
    // (bucket, w_scaled, …) — continual retraining resumes the exact
    // fixed-point state, so N iterations ≡ K iterations + a warm
    // start of N−K (spec-pinned law). Init-only buckets (absent from
    // this corpus, e.g. after a data refresh) receive no gradient and
    // carry through unchanged.
    val initWs: Map[Int, Long] =
      if (init == null) Map.empty
      else init.select(col("bucket").cast("long"), col("w_scaled").cast("long"))
        .collect().map(r => (r.getLong(0).toInt, r.getLong(1))).toMap
    val buckets: Array[Int] =
      (featDoc.select(explode(col("items.bk")).as("bk"))
        .distinct().collect().map(_.getInt(0)).toSet ++
        initWs.keySet).toArray.sorted
    val ws = scala.collection.mutable.HashMap(
      buckets.map(b => b -> initWs.getOrElse(b, 0L)): _*)
    def divHalf(a: BigInt, d: BigInt): BigInt =
      BigInt(a.signum) * ((a.abs * 2 + d) / (d * 2))

    // FUSED per-iteration gradient (r15 optimization): each iteration
    // is ONE job over the persisted featDoc rows — the margin fold,
    // the residual, and the per-bucket gradient sums all happen in a
    // single pass per partition, and the partial gradient arrays are
    // merged on the driver (driver state O(dim·partials), the same
    // bound the former dim-keyed groupBy().collect() carried through
    // its map-side partials). The r14 shape planned a Catalyst query
    // per iteration (fold projection → item explode → dim-bounded
    // exchange → final aggregate → collect): two stages and
    // `shuffle.partitions` reduce tasks of scheduling latency per
    // iteration — which is also why r14 disabled AQE session-wide
    // around the loop. The fused pass has NO exchange at all, so that
    // session-global conf mutation is gone (it silently stripped AQE
    // — including skew-join handling — from any concurrent query on
    // the shared session), and the per-iteration "plan" is literally
    // the same RDD, planned once and run `iters` times: the MLlib
    // gradient-aggregate shape.
    //
    // Exactness is UNCHANGED. Per row, the integer/IEEE-754 chain
    // below reproduces the retired Catalyst projection operation for
    // operation (same fold via SparseLongDotImpl, same double
    // divide/add/abs sequence for p — each step one correctly-rounded
    // IEEE op — same floor quantization, same sign-split rounding
    // division for rq). Per bucket, gradient partials are exact
    // integer sums accumulated in signed 128-bit (hi/lo long pairs):
    // integer addition is order-free, and 2¹²⁷ exceeds the
    // DECIMAL(38,0) domain (10³⁸) the former sum used, so no corpus
    // that the old spelling survived can overflow this one. Per-item
    // products keep the loud Math.multiplyExact ANSI posture of the
    // r14 fold. The randomized BigInt-exact reference-model spec and
    // the DuckDB oracle (which replays all 12 iterations as staged
    // CTEs and hash-compares every weight) gate the rewrite.
    val schemaF = featDoc.schema
    val yIdx = schemaF.fieldIndex("y")
    val itemsIdx = schemaF.fieldIndex("items")
    val ndocIdx = schemaF.fieldIndex("ndoc")
    // featDoc is already materialized (persist above), so building its
    // RDD runs no job; the SAME RDD backs every iteration.
    val featRdd = featDoc.queryExecution.toRdd
    val den = BigInt(lrDen) * BigInt(nDocs)
    val lowMask = (BigInt(1) << 64) - 1
    var it = 0
    while (it < iters) {
      // The model is a dim+1-entry long array shipped in the task
      // closure (slot 0 = the intercept bucket −1): one O(1) lookup
      // per item, no join, no per-iteration broadcast build job.
      // Unobserved buckets read 0, matching the former left-join
      // coalesce. The intercept needs no per-item branch: every doc
      // carries exactly one intercept item (bk = −1, c = 1), so its
      // contribution is the CONSTANT ws(−1) and one fold over ALL
      // items yields ms = total − ws(−1).
      val wArr = (-1 until dim).map(b => ws.getOrElse(b, 0L)).toArray
      val w0 = ws.getOrElse(-1, 0L)
      val partials = featRdd.mapPartitions { rows =>
        val hi = new Array[Long](dim + 1)
        val lo = new Array[Long](dim + 1)
        rows.foreach { row =>
          val y = row.getLong(yIdx)
          val items = row.getArray(itemsIdx)
          val ndoc = row.getLong(ndocIdx)
          val ms = org.apache.spark.sql.graft.SparseLongDotImpl
            .dot(items, wArr) - w0
          // Same IEEE chain as the retired Catalyst projection:
          // md = w0/1e12 + (ms/1e12)/ndoc; fast sigmoid; fixed-point
          // residual in integer units of 1e-6.
          val md = (w0.toDouble / 1e12) + ((ms.toDouble / 1e12) / ndoc.toDouble)
          val p = 0.5 + (0.5 * md) / (1.0 + math.abs(md))
          val resid = y * 1000000L - math.floor(p * 1000000.0 + 0.5).toLong
          val rqNum = resid * 1000000L // |resid| ≤ 1e6 ⇒ |rqNum| ≤ 1e12
          val n = items.numElements()
          var i = 0
          while (i < n) {
            val item = items.getStruct(i, 3)
            val slot = item.getInt(0) + 1 // bk ∈ [−1, dim)
            val c = item.getLong(1)
            val nd = item.getLong(2)
            // Half-away-from-zero division folded into the gradient
            // term, sign-split exactly like the retired `div` spelling
            // (both branches divide non-negative longs).
            val rq =
              if (rqNum >= 0) (2 * rqNum + nd) / (2 * nd)
              else -((2 * -rqNum + nd) / (2 * nd))
            val t = Math.multiplyExact(rq, c)
            // 128-bit accumulate of the signed term: two's-complement
            // add with the standard carry-out bit trick, sign-extended
            // into the high word.
            val oldLo = lo(slot)
            val sumLo = oldLo + t
            lo(slot) = sumLo
            hi(slot) = hi(slot) + (t >> 63) +
              (((oldLo & t) | ((oldLo | t) & ~sumLo)) >>> 63)
            i += 1
          }
        }
        Iterator.single((hi, lo))
      }.collect()
      // Exact 128-bit merge of the per-partition partials, then the
      // same half-away-from-zero learning-rate step as before. A slot
      // whose gradient is zero is skipped — identical to the former
      // groupBy, where an absent bucket produced no row and a present
      // zero-sum row added divHalf(0) = 0.
      val gHi = new Array[Long](dim + 1)
      val gLo = new Array[Long](dim + 1)
      partials.foreach { case (phi, plo) =>
        var s = 0
        while (s <= dim) {
          val oldLo = gLo(s)
          val t = plo(s)
          val sumLo = oldLo + t
          gLo(s) = sumLo
          gHi(s) = gHi(s) + phi(s) +
            (((oldLo & t) | ((oldLo | t) & ~sumLo)) >>> 63)
          s += 1
        }
      }
      var s = 0
      while (s <= dim) {
        val g = (BigInt(gHi(s)) << 64) + (BigInt(gLo(s)) & lowMask)
        if (g != 0) {
          val b = s - 1
          ws(b) = ws(b) + divHalf(g * lrNum, den).toLong
        }
        s += 1
      }
      it += 1
    }
    buckets.toSeq.map(b => (b.toLong, ws(b), ws(b).toDouble / 1e12))
      .toDF("bucket", "w_scaled", "weight")
  }

  /** Context-window chunking: splits each document into token windows
    * of `window` words every `stride` words (overlapping when
    * stride < window) — the step that turns a curated corpus into
    * training sequences for a fixed context length. Chunk starts are
    * every multiple of `stride` below the document's token count, so
    * every token lands in ≥1 chunk and short tails are kept (the
    * trainer's packing/padding policy, e.g. [[graft.ops.Sampling
    * .packSequences]], decides their fate downstream). Zero-shuffle:
    * tokenize once per doc, explode the start sequence, slice — no
    * joins, no windows; the md5 of each chunk's token slice makes the
    * content (not just the arithmetic) verifiable engine-to-engine. */
  def chunkTokens(docs: DataFrame, window: Int = 256,
      stride: Int = 192): DataFrame = {
    require(window >= 1, s"window must be positive, got $window")
    require(stride >= 1, s"stride must be positive, got $stride")
    docs
      .select(col("doc_id"), graft.functions.word_tokens(col("text")).as("toks"))
      .withColumn("n_toks", size(col("toks")))
      .select(col("doc_id"), col("toks"), col("n_toks"), posexplode(
        sequence(lit(0), col("n_toks") - 1, lit(stride))).as(Seq("chunk_idx", "start_tok")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        least(col("start_tok") + window, col("n_toks")).cast("long").as("end_tok"),
        md5(array_join(slice(col("toks"), col("start_tok") + 1,
          least(lit(window), col("n_toks") - col("start_tok"))), " ")).as("chunk_md5"))
  }

  /** N-gram novelty scoring: per document, the fraction of its
    * DISTINCT word `n`-grams that appear in no other document —
    * the inverse duplication signal (novelty ≈ 1: original prose;
    * novelty ≈ 0: assembled from corpus boilerplate). Quality stacks
    * threshold it where near-dup dedup is too blunt (a doc can evade
    * pairwise Jaccard while being a collage of common fragments).
    *
    * Scale: ONE distinct (doc, gram) frame feeds both the per-gram
    * document frequency (map-side combined) and the per-doc roll-up;
    * the join back is gram-keyed (vocabulary-partitioned). Exact
    * integers + one fixed-order division — oracle-portable. Documents
    * with fewer than `n` tokens emit zero grams and a null novelty. */
  def noveltyScores(docs: DataFrame, n: Int = 3,
      shingler: Shingler = Shingler.Word): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    val grams = shingler match {
      case Shingler.Word => graft.functions.array_shingles(
        graft.functions.word_tokens(col("text")), n)
      case Shingler.Char => graft.functions.char_shingles(col("text"), n)
    }
    val sh = docs.select(col("doc_id"),
      explode(array_distinct(grams)).as("gram"))
    val dfFrame = sh.groupBy(col("gram")).agg(count(lit(1)).as("gdf"))
    val perDoc = sh.join(dfFrame, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gdf") === 1, 1L).otherwise(0L)).as("n_unique"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"),
        when(col("n_grams") > 0,
          col("n_unique").cast("double") / col("n_grams")).as("novelty"))
  }

  /** Per-gram document-frequency index of a reference corpus — the
    * persistable snapshot [[noveltyAgainstIndex]] scores against
    * (write it to parquet nightly; batch jobs and the ingest stream
    * both read the same artifact). One distinct-gram explode + one
    * map-side-combined groupBy; grams are the exact strings of
    * `array_distinct(word_shingles(text, n))`. */
  def gramIndex(refDocs: DataFrame, n: Int = 3): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    refDocs
      .select(explode(array_distinct(graft.functions.array_shingles(
        graft.functions.word_tokens(col("text")), n))).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("gdf"))
  }

  /** Cross-corpus novelty: per document, the fraction of its DISTINCT
    * word `n`-grams absent from a reference [[gramIndex]] — the
    * against-a-snapshot form of [[noveltyScores]] (which scores a
    * corpus against itself), and the one that runs INGEST-TIME: score
    * each arriving document against last night's index, quarantine
    * the boilerplate before it lands in the training shard.
    *
    * Two plans behind one contract (the [[lmScore]] dispatch pattern):
    * when the measured index cardinality fits `maxBroadcastIndex`,
    * the grams collect into a plan-shipped set and every document is
    * scored by ONE codegen'd pass ([[graft.functions.gram_set_novelty]])
    * — zero explode, zero join, zero shuffle, and STATELESS, so a
    * structured stream runs it per micro-batch with batch-identical
    * results (spec-pinned). Past the gate (open-vocabulary corpora),
    * the declarative spelling explodes distinct grams and left-joins
    * the index on the gram key — vocabulary-partitioned, the
    * [[noveltyScores]] shape. Both emit one row per input document;
    * sub-`n`-token docs get `n_grams = 0` and a null `novelty`. */
  def noveltyAgainstIndex(docs: DataFrame, index: DataFrame, n: Int = 3,
      maxBroadcastIndex: Long = 1000000L): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    if (index.count() <= maxBroadcastIndex) {
      val set = org.apache.spark.sql.graft.GramSet.build(
        index.select(col("gram")).collect().iterator.map(r =>
          org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0))))
      docs.select(col("doc_id"),
          graft.functions.gram_set_novelty(col("text"), n, set).as("nv"))
        .select(col("doc_id"),
          col("nv.n_grams").as("n_grams"), col("nv.n_new").as("n_new"),
          when(col("nv.n_grams") > 0,
            col("nv.n_new").cast("double") / col("nv.n_grams")).as("novelty"))
    } else {
      val sh = docs.select(col("doc_id"),
        explode(array_distinct(graft.functions.array_shingles(
          graft.functions.word_tokens(col("text")), n))).as("gram"))
      val perDoc = sh.join(index.select(col("gram"), lit(1).as("hit")),
          Seq("gram"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("hit").isNull, 1L).otherwise(0L)).as("n_new"))
      docs.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          when(col("n_grams") > 0,
            col("n_new").cast("double") / col("n_grams")).as("novelty"))
    }
  }

  /** Sentence segmentation: one row per sentence with its 0-based
    * position — the granularity for sentence-level dedup, eval-set
    * sampling, and citation-grade provenance. The boundary rule is
    * deliberately simple and ENGINE-PORTABLE: a run of `[.!?]`
    * followed by whitespace ends a sentence. Java regex could spell
    * that as a lookbehind split, but RE2 (DuckDB) has no lookbehind —
    * so both engines instead insert a `\\u0001` sentinel after each
    * boundary (`regexp_replace` with a group reference) and split on
    * the sentinel; whitespace-only fragments are dropped, indices are
    * pre-filter split positions so both engines agree even around
    * dropped tails. Any pre-existing U+0001 chars in the text are
    * stripped first (both engines), so a document that happens to
    * contain the sentinel byte cannot forge spurious sentence splits.
    * Zero-shuffle projection. */
  /** The sentinel-insertion sentence split of [[chunkSentences]] as a
    * bare array column — shared with the ingest-time sentence dedup
    * ([[graft.streaming.StreamingDedup.sentenceArrivals]]) so stream
    * and batch split text identically by construction. */
  private[graft] def sentenceSplitCol(text: Column): Column =
    split(regexp_replace(regexp_replace(text, "\u0001", ""),
      "([.!?]+)\\s+", "$1\u0001"), "\u0001")

  def chunkSentences(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), posexplode(sentenceSplitCol(col("text")))
        .as(Seq("sent_idx", "sentence")))
      .filter(length(trim(col("sentence"))) > 0)
      .select(col("doc_id"), col("sent_idx").cast("long").as("sent_idx"),
        col("sentence"), length(col("sentence")).cast("long").as("n_chars"))

  /** Hashed bag-of-tokens document vectors — the text→vector bridge
    * for corpora WITHOUT an embedding column: `vec[b]` counts the
    * document's tokens whose first-32-md5-bits mod `dim` equal `b`
    * (the exact bucket arithmetic of [[classifierScore]], so an ANSI
    * engine reproduces every count). Cast to float, the vectors feed
    * the whole [[Similarity]] family (cosine top-k, LSH, IVF,
    * embedding dedup) — a purely lexical, deterministic stand-in for
    * learned embeddings. Zero-shuffle native projection
    * (`hashed_token_counts`): one tokenize pass, one md5 per token,
    * one slot increment. */
  def hashedVectors(docs: DataFrame, dim: Int = 64): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.hashed_token_counts(col("text"), dim).as("vec"))

  /** Distinctive-term extraction: the top `k` terms of each document
    * ranked by tf-idf — the classic "what is this document about"
    * signal used for topic tagging, domain-mix audits, and keyword
    * routing in curation stacks. Deterministic: ties break by term
    * ascending.
    *
    * Two idf shapes: the default log idf `tf * (ln((N+1)/(df+1)) + 1)`
    * (smoothed, the standard spelling), and `rationalIdf = true`
    * which scores `tf * (N+1) / (df+1)` — same (tf, df, N) inputs,
    * but the score is ONE IEEE division of exact integers, so an ANSI
    * SQL engine reproduces it bit-for-bit (the oracle gate runs this
    * twin; libm `ln` ulp differences could flip near-equal ranks in
    * the log variant, so that one is benched + spec'd instead).
    *
    * Scale: tf = one map-side-combined groupBy (doc_id, term); df
    * derives from tf (never a second corpus scan); the corpus size N
    * rides a one-row broadcast (declared BNLJ, bounded build); the
    * per-doc top-k window shuffles by doc_id and sorts only each
    * document's distinct terms. The tf⋈df equi-join shuffles on term
    * — vocabulary-sized, not corpus-sized, and never broadcast (a
    * 100 TB vocabulary does not fit a broadcast). */
  def tfidf(docs: DataFrame, k: Int = 5, rationalIdf: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfFrame = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // Count-star over a column-pruned scan: parquet answers from
    // row-group metadata, no data pages read.
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val score =
      if (rationalIdf) (col("tf") * (col("n_docs") + 1)).cast("double") / (col("df") + 1)
      else col("tf") * (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1)
    tf.join(dfFrame, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term").asc)))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"), col("rank"))
  }

  /** [[tfidf]] at GROUP granularity: the top `k` distinctive terms of
    * each group of documents (source, language, split, …) — "what
    * does each source talk about that the others don't", the
    * source-mix audit sibling of [[graft.ops.Profiling.sourceOverlap]]
    * and the oracle-portable cousin of [[graft.ops.Curation
    * .topicProfile]] (groups are user keys, not float centroids, so
    * the whole ranking gates). tf counts term occurrences within the
    * group, df counts groups containing the term, N = number of
    * groups — derived from the tf frame (ONE corpus scan), riding a
    * one-row broadcast. Same idf variants and determinism as
    * [[tfidf]]. Output: (group, term, tf, df, score, rank). */
  def groupTfidf(docs: DataFrame, group: Column, k: Int = 5,
      rationalIdf: Boolean = false): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(group.as("group"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("group"), col("term")).agg(count(lit(1)).as("tf"))
    val dfFrame = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = tf.agg(countDistinct(col("group")).as("n_groups"))
    val score =
      if (rationalIdf) (col("tf") * (col("n_groups") + 1)).cast("double") / (col("df") + 1)
      else col("tf") * (log((col("n_groups") + 1).cast("double") / (col("df") + 1)) + 1)
    tf.join(dfFrame, "term")
      .crossJoin(broadcast(n))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("group")).orderBy(col("score").desc, col("term").asc)))
      .filter(col("rank") <= k)
      .select(col("group"), col("term"), col("tf"), col("df"), col("score"), col("rank"))
  }

  /** BM25 top-`k` terms per document — the retrieval-grade sibling of
    * [[tfidf]] with term-frequency saturation (`k1`) and document-
    * length normalization (`b`):
    * `idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))` with
    * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`. The score needs libm
    * `ln`, so it is spec-pinned + benched (not oracle-gated) like the
    * other float-transcendental operators.
    *
    * Scale: every corpus statistic derives from the tf frame — doc
    * length dl = sum of tf per doc, N = row count of the dl frame
    * (every document yields at least one token, even empty text), and
    * avgdl = one-row aggregate of dl — so the corpus is scanned ONCE;
    * N/avgdl ride one-row broadcasts (bounded BNLJ builds). */
  def bm25(docs: DataFrame, k: Int = 5,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfFrame = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") * (lit(k1) + 1) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("dl") / col("avgdl")))
    tf.join(dfFrame, "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("score", idf * norm)
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term").asc)))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("dl"),
        col("score"), col("rank"))
  }

  /** Learn a BPE merge list from the corpus (classic Sennrich-style
    * training, but restructured for scale): ONE distributed pass
    * pre-tokenizes with [[bpePattern]] (the oracle spelling of the
    * encoder's hand lexer, spec-pinned identical) and aggregates a
    * word-frequency table — map-side combined groupBy, then
    * TakeOrderedAndProject for the top `maxVocabWords` words by
    * frequency, so the driver never holds more than that many rows
    * regardless of corpus size. The merge-selection loop then runs on
    * the driver over that bounded table — the classic trainer is a
    * loop over the WORD VOCABULARY, not the corpus, so this is the
    * standard fast-BPE factorization (zipfian mass means the capped
    * vocab covers almost all corpus occurrences; rare tail words
    * below the cap influence only tail merges).
    *
    * Deterministic: pair selection is (count desc, left asc, right
    * asc) — independent of hash-map iteration order — and the word
    * table is top-K by (freq desc, word asc). Each selected pair is
    * applied to all leftmost non-overlapping occurrences, the same
    * rule [[org.apache.spark.sql.graft.BpeTable.encodeWord]] replays
    * at encode time, so encoding a training word applies exactly the
    * training-time merge sequence. Pair counts update incrementally
    * (only words containing the merged pair are reprocessed), and
    * best-pair selection reads the head of a lazy-deletion max-heap
    * (every count change pushes a fresh entry; stale entries are
    * discarded on pop by comparing against the live count) — so
    * driver work is O(numMerges * affectedWords * log P), never a
    * full scan of the pair space per merge. That bound is what makes
    * production vocabularies (32k+ merges) tractable: at realistic
    * merge depth almost every selected pair touches a handful of
    * words, while the pair space P stays in the millions. Stops early
    * when no pair reaches `minPairFreq`. */
  def bpeTrain(docs: DataFrame, numMerges: Int,
      maxVocabWords: Int = 65536, minPairFreq: Long = 2L,
      byteLevel: Boolean = false): Seq[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be non-negative, got $numMerges")
    require(maxVocabWords >= 1, s"maxVocabWords must be positive, got $maxVocabWords")
    val wordFreq: Array[(String, Long)] = docs
      .select(explode(regexp_extract_all(col("text"), lit(bpePattern), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("w").asc)
      .limit(maxVocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    import scala.collection.mutable
    val words = new Array[Array[String]](wordFreq.length)
    val freqs = new Array[Long](wordFreq.length)
    var wi = 0
    while (wi < wordFreq.length) {
      // byteLevel: symbols are the word's UTF-8 bytes mapped through
      // the GPT-2 byte alphabet (1 char each); else codepoints.
      val (w0, f) = wordFreq(wi)
      val w = if (byteLevel) {
        val bs = w0.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        org.apache.spark.sql.graft.BpeBytes.mapWord(bs, 0, bs.length)
      } else w0
      val syms = mutable.ArrayBuffer.empty[String]
      var ci = 0
      while (ci < w.length) {
        val cc = Character.charCount(w.codePointAt(ci))
        syms += w.substring(ci, ci + cc)
        ci += cc
      }
      words(wi) = syms.toArray
      freqs(wi) = f
      wi += 1
    }

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // Lazy-deletion max-heap over (count desc, left asc, right asc):
    // the same total order the old full-scan selection used, so the
    // merge sequence is bit-identical. null until seeded — the first
    // corpus pass bulk-loads pairCount, then every later change
    // pushes a fresh entry here.
    var heap: java.util.PriorityQueue[(String, String, Long)] = null
    val heapOrder = new java.util.Comparator[(String, String, Long)] {
      override def compare(a: (String, String, Long), b: (String, String, Long)): Int = {
        if (a._3 != b._3) java.lang.Long.compare(b._3, a._3)
        else {
          val x = a._1.compareTo(b._1)
          if (x != 0) x else a._2.compareTo(b._2)
        }
      }
    }
    def addWord(i: Int, sign: Long): Unit = {
      val s = words(i)
      var k = 0
      while (k < s.length - 1) {
        val p = (s(k), s(k + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * freqs(i)
        if (c == 0L) pairCount.remove(p) else pairCount(p) = c
        if (heap != null && c > 0L) heap.add((p._1, p._2, c))
        if (sign > 0) pairWords.getOrElseUpdate(p, mutable.Set.empty) += i
        k += 1
      }
      if (sign < 0) {
        k = 0
        while (k < s.length - 1) {
          val p = (s(k), s(k + 1))
          pairWords.get(p).foreach { set =>
            set -= i; if (set.isEmpty) pairWords.remove(p)
          }
          k += 1
        }
      }
    }
    var i = 0
    while (i < words.length) { addWord(i, 1L); i += 1 }

    def applyMerge(s: Array[String], l: String, r: String): Array[String] = {
      val merged = l + r
      val out = mutable.ArrayBuffer.empty[String]
      var j = 0
      while (j < s.length) {
        if (j < s.length - 1 && s(j) == l && s(j + 1) == r) {
          out += merged; j += 2
        } else { out += s(j); j += 1 }
      }
      out.toArray
    }

    heap = new java.util.PriorityQueue[(String, String, Long)](
      Math.max(16, pairCount.size), heapOrder)
    pairCount.foreach { case ((l, r), c) => heap.add((l, r, c)) }

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var done = numMerges == 0
    while (!done) {
      // Pop until the head's count matches the live count — anything
      // else is a stale entry from before an incremental update.
      var bestPair: (String, String) = null
      var bestCount = 0L
      var searching = true
      while (searching) {
        val head = heap.poll()
        if (head == null) searching = false
        else {
          val p = (head._1, head._2)
          if (pairCount.getOrElse(p, 0L) == head._3) {
            bestPair = p; bestCount = head._3; searching = false
          }
        }
      }
      if (bestPair == null || bestCount < minPairFreq) done = true
      else {
        merges += bestPair
        val affected = pairWords.getOrElse(bestPair, mutable.Set.empty).toArray
        var a = 0
        while (a < affected.length) {
          val w = affected(a)
          addWord(w, -1L)
          words(w) = applyMerge(words(w), bestPair._1, bestPair._2)
          addWord(w, 1L)
          a += 1
        }
        if (merges.length >= numMerges) done = true
      }
    }
    merges.toSeq
  }

  /** Per-document true-BPE encoding stats under a learned merge list:
    * token count, codepoint count, and the chars-per-token
    * compression the vocabulary achieves (the number a tokenizer
    * card reports). Zero-shuffle projection — the merge table rides
    * the serialized plan (vocab-bounded, never corpus-bounded). */
  def bpeStats(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val toks = graft.functions.bpe_encode(col("text"), merges)
    docs.select(col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      length(col("text")).cast("long").as("n_codepoints"))
      .withColumn("chars_per_token",
        when(col("n_tokens") > 0, col("n_codepoints").cast("double") / col("n_tokens")))
  }

  /** MIXED-LANGUAGE profile at sentence granularity: documents that
    * flip language mid-text (translation pairs glued together,
    * boilerplate in one language wrapping content in another,
    * code-switching forums) pass document-level language ID with a
    * confident majority vote while being exactly what a monolingual
    * training mix must screen. Splits each document into sentences
    * ([[chunkSentences]]' boundary rule), language-IDs each sentence
    * with the [[langId]] marker heuristic, and rolls up per document:
    * sentence counts per language (+ `und`), the majority language
    * among classified sentences (ties de < en < fr, the [[langId]]
    * order; no classified sentences → `und`), and `mixed_frac` — the
    * fraction of classified sentences disagreeing with the majority
    * (0.0 for pure documents and for documents with no classified
    * sentences). Documents with no sentences at all survive with
    * zeros. Zero-shuffle per-sentence work (one native marker pass
    * per sentence), one count roll-up per doc. */
  def langSpans(docs: DataFrame): DataFrame = {
    val sents = docs.select(col("doc_id"),
        explode(sentenceSplitCol(col("text"))).as("sentence"))
      .filter(length(trim(col("sentence"))) > 0)
    val mc = graft.functions.marker_counts(col("sentence"),
      Seq(stopwordsEn, stopwordsDe, stopwordsFr))
    val en = element_at(col("mc"), 1).cast("int")
    val de = element_at(col("mc"), 2).cast("int")
    val fr = element_at(col("mc"), 3).cast("int")
    val best = greatest(en, de, fr)
    val tagged = sents.select(col("doc_id"), mc.as("mc"))
      .select(col("doc_id"),
        when(best === 0, "und")
          .when(de === best, "de")
          .when(en === best, "en")
          .otherwise("fr").as("slang"))
    val counts = tagged.groupBy("doc_id").agg(
      count(lit(1)).as("n_sents"),
      sum(when(col("slang") === "en", 1L).otherwise(0L)).as("n_en"),
      sum(when(col("slang") === "de", 1L).otherwise(0L)).as("n_de"),
      sum(when(col("slang") === "fr", 1L).otherwise(0L)).as("n_fr"),
      sum(when(col("slang") === "und", 1L).otherwise(0L)).as("n_und"))
    val cBest = greatest(col("n_en"), col("n_de"), col("n_fr"))
    val classified = col("n_en") + col("n_de") + col("n_fr")
    docs.select(col("doc_id"))
      .join(counts, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_sents"), lit(0L)).as("n_sents"),
        coalesce(col("n_en"), lit(0L)).as("n_en"),
        coalesce(col("n_de"), lit(0L)).as("n_de"),
        coalesce(col("n_fr"), lit(0L)).as("n_fr"),
        coalesce(col("n_und"), lit(0L)).as("n_und"))
      .select(col("doc_id"), col("n_sents"), col("n_en"), col("n_de"),
        col("n_fr"), col("n_und"),
        when(classified === 0, "und")
          .when(col("n_de") === cBest, "de")
          .when(col("n_en") === cBest, "en")
          .otherwise("fr").as("lang_majority"),
        when(classified === 0, lit(0.0))
          .otherwise((classified - cBest).cast("double") /
            classified.cast("double")).as("mixed_frac"))
  }

  /** Exact token-sequence PHRASE SEARCH over the corpus — the
    * positional-inverted-index spelling of "which documents contain
    * this eval question verbatim", the retrieval primitive behind
    * span-level decontamination audits and quote tracing. Returns one
    * row per `(doc_id, phrase)` WITH at least one match: `n_matches`
    * (every start position, overlapping occurrences included —
    * "batch batch batch batch" contains "batch batch batch" twice)
    * and `first_pos` (1-based token index of the earliest match).
    *
    * Phrases and documents tokenize identically ([[TextOps.tokens]]:
    * lowercase, trim, whitespace split), so matching is
    * token-boundary exact, not substring (no "cat" inside
    * "concatenate").
    *
    * Execution shape at 100 TB — NO full-text scan joins, NO
    * per-phrase passes: the corpus token stream is position-exploded
    * once and immediately FILTERED to the phrase vocabulary (a plan
    * literal, map-side — a token outside every phrase never reaches a
    * shuffle), then one broadcast join against the exploded
    * `(phrase, offset, token)` table turns each surviving token into
    * candidate `(doc_id, phrase, start = pos − offset)` votes, and
    * one count-shuffle keeps starts where EVERY offset voted
    * (`count == phrase length` — positions are distinct per doc, so
    * the count can only reach the length when all offsets align;
    * repeated tokens inside a phrase are handled by the same
    * arithmetic). Wire volume is candidate-proportional: phrase-
    * vocabulary hits, not corpus tokens. Phrase sets are eval-set
    * sized (thousands) — the broadcast is bounded by total phrase
    * tokens. */
  def phraseSearch(docs: DataFrame, phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "phraseSearch needs at least one phrase")
    val spark = docs.sparkSession
    import spark.implicits._
    // Duplicate phrase strings would double their candidate votes and
    // break the count == length test — one row per distinct phrase.
    val phraseToks: Seq[(String, Seq[String])] = phrases.distinct.map { p =>
      val t = p.trim.toLowerCase(java.util.Locale.ROOT)
        .split("\\s+").toSeq.filter(_.nonEmpty)
      require(t.nonEmpty, s"phrase tokenizes to nothing: '$p'")
      (p, t)
    }
    val vocab = phraseToks.flatMap(_._2).distinct
    val pt = phraseToks
      .flatMap { case (p, t) =>
        t.zipWithIndex.map { case (tok, off) => (p, t.length, off, tok) }
      }
      .toDF("phrase", "plen", "off", "tok")
    docs
      .select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(vocab: _*))
      .join(broadcast(pt), Seq("tok"))
      .select(col("doc_id"), col("phrase"), col("plen"),
        (col("pos") - col("off")).as("start"))
      .filter(col("start") >= 0)
      .groupBy(col("doc_id"), col("phrase"), col("plen"), col("start"))
      .agg(count(lit(1)).as("_hits"))
      .filter(col("_hits") === col("plen"))
      .groupBy(col("doc_id"), col("phrase"))
      .agg(count(lit(1)).as("n_matches"),
        (min(col("start")) + 1).cast("long").as("first_pos"))
  }

  /** Line-level repetition signals — the LINE half of the published
    * repetition battery ([[repetitionStats]] / `gram_stats` is the
    * n-gram half): boilerplate-heavy pages repeat whole lines
    * (footers, nav crumbs, cookie banners), which n-gram fractions
    * under-read on long pages. Per document:
    *
    *  - `n_lines`, `n_distinct_lines`
    *  - `dup_line_frac` — (n_lines − n_distinct) / n_lines: the
    *    fraction of line OCCURRENCES beyond each line's first
    *  - `dup_line_char_frac` — the same excess mass in CHARACTERS
    *    (repeat occurrences' chars / all line chars; 0.0 for an
    *    all-empty page). Excess-occurrence counting (not
    *    all-occurrences-of-duplicated-lines) so a page of N distinct
    *    lines scores exactly 0 — documented choice, test-pinned.
    *
    * Zero-shuffle codegen'd projection (array_distinct + aggregate
    * over the page's own split) like the other screens — the whole
    * quality battery composes at scan speed. */
  def lineRepetitionStats(docs: DataFrame): DataFrame = {
    val lines = split(col("text"), "\n")
    val nLines = size(lines)
    val distinctLines = array_distinct(lines)
    val nDistinct = size(distinctLines)
    def charSum(a: Column): Column =
      aggregate(a, lit(0L), (acc, x) => acc + char_length(x))
    val total = charSum(lines)
    val dupChars = total - charSum(distinctLines)
    docs.select(col("doc_id"),
      nLines.as("n_lines"),
      nDistinct.as("n_distinct_lines"),
      ((nLines - nDistinct) * lit(1.0) / nLines).as("dup_line_frac"),
      when(total === 0, lit(0.0))
        .otherwise(dupChars * lit(1.0) / total).as("dup_line_char_frac"))
  }

  /** Stopword set behind [[gopherQuality]]'s "document uses common
    * function words" rule (a small fixed list, per the published
    * heuristic — presence of at least `minStopwordHits` DISTINCT
    * members is the signal, not their frequency). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** C4-style line/page cleaning (the published web-corpus recipe:
    * keep only lines that read like prose, drop pages that look like
    * code or boilerplate). Line KEEP rules — a line survives iff ALL
    * hold after trimming: ends with a terminal punctuation mark
    * (`.` `!` `?` `"`), has at least `minWordsPerLine` whitespace
    * words, and does not contain "javascript" (case-insensitive, the
    * classic cookie/JS-warning banner tell). Page DROP rules, checked
    * in this order on the RAW text: contains `{` (code page),
    * contains "lorem ipsum" (template filler), fewer than
    * `minKeptLines` surviving lines (too little prose to keep).
    *
    * Output: (doc_id, n_lines, n_lines_kept, kept, drop_reason,
    * text_clean) — `text_clean` is the kept lines rejoined with
    * `\n` for kept pages, NULL for dropped ones; `drop_reason` ∈
    * {brace, lorem_ipsum, too_few_lines, NULL}.
    *
    * Shape at 100 TB: one zero-shuffle projection — every rule is a
    * codegen'd string/array expression over the page's own bytes, so
    * the filter runs at scan speed and composes with any downstream
    * shuffle for free. */
  def c4Filter(docs: DataFrame, minWordsPerLine: Int = 3,
      minKeptLines: Int = 5): DataFrame = {
    val lines = split(col("text"), "\n")
    val keptLines = filter(lines, l =>
      trim(l).rlike("[.!?\"]$") &&
        size(split(trim(l), "\\s+")) >= minWordsPerLine &&
        !lower(l).contains("javascript"))
    val hasBrace = col("text").contains("{")
    val hasLorem = lower(col("text")).contains("lorem ipsum")
    val nKept = size(keptLines)
    val kept = !hasBrace && !hasLorem && nKept >= minKeptLines
    docs.select(
      col("doc_id"),
      size(lines).as("n_lines"),
      nKept.as("n_lines_kept"),
      kept.as("kept"),
      when(hasBrace, "brace")
        .when(hasLorem, "lorem_ipsum")
        .when(nKept < minKeptLines, "too_few_lines")
        .as("drop_reason"),
      when(kept, array_join(keptLines, "\n")).as("text_clean"))
  }

  /** Gopher-style document quality rules (the published heuristic
    * battery: cheap surface statistics that screen a web corpus
    * before any model-based scoring). Signals per document:
    *
    *  - `n_words` — whitespace tokens; pass iff in
    *    [`minWords`, `maxWords`]
    *  - `mean_word_len` — non-whitespace chars / words; pass iff in
    *    [`minMeanWordLen`, `maxMeanWordLen`]
    *  - `symbol_ratio` — (`#` chars + non-overlapping `...`
    *    occurrences) / words; pass iff ≤ `maxSymbolRatio`
    *  - `bullet_ratio` — fraction of lines whose first char is a
    *    bullet (`-` `*` `•`); pass iff ≤ `maxBulletRatio`
    *  - `ellipsis_line_ratio` — fraction of lines ending in `...`;
    *    pass iff ≤ `maxEllipsisLineRatio`
    *  - `alpha_word_ratio` — fraction of words containing a letter;
    *    pass iff ≥ `minAlphaWordRatio`
    *  - `stop_hits` — DISTINCT [[gopherStopwords]] members present
    *    as whole tokens; pass iff ≥ `minStopwordHits`
    *
    * `passes` is the conjunction; `first_fail` names the first failed
    * rule in the fixed order (n_words_low, n_words_high,
    * mean_word_len_low, mean_word_len_high, symbol_ratio,
    * bullet_ratio, ellipsis_ratio, alpha_ratio, stopwords) or NULL.
    *
    * Shape at 100 TB: zero-shuffle codegen'd projection, exactly like
    * [[c4Filter]] — the two compose into one scan-speed screen. */
  def gopherQuality(docs: DataFrame,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletRatio: Double = 0.9,
      maxEllipsisLineRatio: Double = 0.3, minAlphaWordRatio: Double = 0.8,
      minStopwordHits: Int = 2): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val nWords = size(toks)
    val nonWsChars = char_length(regexp_replace(col("text"), "\\s", ""))
    val meanWordLen = nonWsChars * lit(1.0) / nWords
    val nSymbols =
      countOccurrences(col("text"), "#") + countOccurrences(col("text"), "...")
    val symbolRatio = nSymbols * lit(1.0) / nWords
    val lines = split(col("text"), "\n")
    val nLines = size(lines)
    val bulletRatio = size(filter(lines, l => {
      val c0 = substring(trim(l), 1, 1)
      c0 === "-" || c0 === "*" || c0 === "•"
    })) * lit(1.0) / nLines
    val ellipsisLineRatio =
      size(filter(lines, l => trim(l).endsWith("..."))) * lit(1.0) / nLines
    val alphaRatio =
      size(filter(toks, t => t.rlike("[a-z]"))) * lit(1.0) / nWords
    val stopHits = gopherStopwords
      .map(w => array_contains(toks, w).cast("int"))
      .reduce(_ + _)
    val passes = nWords >= minWords && nWords <= maxWords &&
      meanWordLen >= minMeanWordLen && meanWordLen <= maxMeanWordLen &&
      symbolRatio <= maxSymbolRatio && bulletRatio <= maxBulletRatio &&
      ellipsisLineRatio <= maxEllipsisLineRatio &&
      alphaRatio >= minAlphaWordRatio && stopHits >= minStopwordHits
    docs.select(
      col("doc_id"),
      nWords.as("n_words"),
      meanWordLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      bulletRatio.as("bullet_ratio"),
      ellipsisLineRatio.as("ellipsis_line_ratio"),
      alphaRatio.as("alpha_word_ratio"),
      stopHits.as("stop_hits"),
      passes.as("passes"),
      when(nWords < minWords, "n_words_low")
        .when(nWords > maxWords, "n_words_high")
        .when(meanWordLen < minMeanWordLen, "mean_word_len_low")
        .when(meanWordLen > maxMeanWordLen, "mean_word_len_high")
        .when(symbolRatio > maxSymbolRatio, "symbol_ratio")
        .when(bulletRatio > maxBulletRatio, "bullet_ratio")
        .when(ellipsisLineRatio > maxEllipsisLineRatio, "ellipsis_ratio")
        .when(alphaRatio < minAlphaWordRatio, "alpha_ratio")
        .when(stopHits < minStopwordHits, "stopwords")
        .as("first_fail"))
  }

  /** Identifier-shaped keywords whose whole-token presence marks
    * source code across the mainstream languages (Python/JS/Java/
    * C-family/Rust/Go/Scala) without firing on prose — "for"/"if"/
    * "while" are deliberately absent (common English). */
  val codeKeywords: Seq[String] = Seq(
    "def", "class", "import", "return", "function", "var", "let",
    "const", "void", "public", "static", "struct", "elif", "fn",
    "println", "printf", "include", "typedef", "lambda", "impl")

  /** Code-vs-prose detection — the signal that routes documents into
    * the right LLM data mix (code belongs in the code split at its
    * own sampling weight, and code-shaped pages fail prose quality
    * screens like [[gopherQuality]] for the wrong reason). Surface
    * signals per document, all cheap and oracle-replayable:
    *
    *  - `fenced_blocks` — complete ``` fence pairs (markdown/forum
    *    code blocks; one pair is already decisive)
    *  - `code_line_ratio` — fraction of lines that are code-shaped:
    *    trimmed line ends in `;`/`{`/`}`, raw line starts with a tab
    *    or 4+ spaces (indentation blocks), or the line is an
    *    assignment (`ident = …` / `ident := …`)
    *  - `keyword_hits` — DISTINCT [[codeKeywords]] present as whole
    *    identifier tokens (split on non-identifier chars)
    *  - `symbol_line_ratio` — fraction of lines containing any of
    *    `{ } ; => -> ::` (brace-language density)
    *
    * `is_code` = `fenced_blocks ≥ 1` OR (`code_line_ratio ≥
    * minCodeLineRatio` AND `keyword_hits ≥ minKeywordHits`);
    * `reason` names the rule that fired (`fenced`, `line_shape`) or
    * NULL. Thresholds conservative by default: prose with one planted
    * snippet should profile, not flip.
    *
    * Shape at 100 TB: zero-shuffle codegen'd projection — composes
    * with [[c4Filter]]/[[gopherQuality]] into the one-scan screen. */
  def codeProfile(docs: DataFrame, minCodeLineRatio: Double = 0.3,
      minKeywordHits: Int = 2): DataFrame = {
    val lines = split(col("text"), "\n")
    val nLines = size(lines)
    // Non-overlapping ``` occurrences via length arithmetic (the diff
    // is always a multiple of 3), then complete pairs via explicit
    // floor — Spark truncates double→int casts where DuckDB ROUNDS,
    // so the halving must be floor() on both engines.
    val fenceMarks = ((char_length(col("text")) -
      char_length(regexp_replace(col("text"), "```", ""))) / 3).cast("int")
    val fenced = floor(fenceMarks / lit(2)).cast("int")
    val codeLine = (l: Column) => {
      val t = trim(l)
      t.rlike("[;{}]$") || l.rlike("^(\t|    ) *\\S") ||
        t.rlike("^[A-Za-z_][A-Za-z0-9_]* ?:?= [^=]")
    }
    val symbolLine = (l: Column) =>
      l.rlike("[{};]|=>|->|::")
    val codeLineRatio = size(filter(lines, codeLine)) * lit(1.0) / nLines
    val symbolLineRatio = size(filter(lines, symbolLine)) * lit(1.0) / nLines
    val idTokens = split(col("text"), "[^A-Za-z0-9_]+")
    val keywordHits = codeKeywords
      .map(w => array_contains(idTokens, w).cast("int"))
      .reduce(_ + _)
    val fencedRule = fenced >= 1
    val lineRule = codeLineRatio >= minCodeLineRatio &&
      keywordHits >= minKeywordHits
    docs.select(
      col("doc_id"),
      fenced.as("fenced_blocks"),
      codeLineRatio.as("code_line_ratio"),
      keywordHits.as("keyword_hits"),
      symbolLineRatio.as("symbol_line_ratio"),
      (fencedRule || lineRule).as("is_code"),
      when(fencedRule, "fenced")
        .when(lineRule, "line_shape")
        .as("reason"))
  }

  /** Word-blocklist screen — C4's "bad words" page drop, the one rule
    * of its published battery [[c4Filter]] does not carry (the list
    * itself is deployment policy, so it is caller-supplied here;
    * matching is the operator). Whole-token matches against the
    * lowercased whitespace tokens:
    *
    *  - `hits_total` — total blocklisted token occurrences
    *  - `hits_distinct` — distinct blocklist members present
    *  - `kept` — C4 semantics: ANY hit drops the page
    *
    * Zero-shuffle codegen'd projection; the list is a plan literal
    * (policy lists are a few thousand words — well under expression
    * size limits, and a bigger list belongs in a broadcast join
    * variant, not here). */
  def blocklistScreen(docs: DataFrame, words: Seq[String]): DataFrame = {
    require(words.nonEmpty, "blocklistScreen: empty blocklist")
    val lowered = words.map(_.toLowerCase(java.util.Locale.ROOT))
    val toks = TextOps.tokens(col("text"))
    val isBlocked = (t: Column) =>
      lowered.map(w => t === w).reduce(_ || _)
    val hitsTotal = size(filter(toks, isBlocked))
    val hitsDistinct = lowered
      .map(w => array_contains(toks, w).cast("int"))
      .reduce(_ + _)
    docs.select(
      col("doc_id"),
      hitsTotal.as("hits_total"),
      hitsDistinct.as("hits_distinct"),
      (hitsTotal === 0).as("kept"))
  }
}

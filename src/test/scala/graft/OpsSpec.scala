package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Specs for the LLM-pipeline operators whose scale paths are not
  * SQL-expressible (SimHash, MinHash+LSH, ANN) — each is checked
  * against its exact baseline on the real corpus — plus the multimodal
  * imperative/declarative twin equivalence. */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def emb: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("SQL-registered graft functions work from pure spark.sql text") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |  array_contains_all(array('a','b','c'), array('b','a')) AS sub,
        |  window_starts('sliding', 250L, 200L, 100L) AS ws,
        |  metric_route(map('eventTime','1000','t_g','x','cpu','5')) AS m,
        |  md5_winnow_fingerprint('the quick brown fox jumps over it', 16, 8) AS fp,
        |  gram_stats('a b a b a', 2) AS gs,
        |  map_keys(char_trigram_counts('abcab')) AS ct
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(r.getBoolean(1))
    assert(r.getSeq[Long](2) == Seq(250L - 50L, 250L - 150L)) // covering starts, top-down
    val m = r.getStruct(3)
    assert(m.getAs[Long]("ev_ms") == 1000L && m.getAs[Boolean]("ok"))
    assert(m.getAs[Map[String, String]]("tags") == Map("t_g" -> "x"))
    assert(m.getAs[Map[String, Double]]("metrics") == Map("cpu" -> 5.0))
    assert(r.getSeq[String](4).nonEmpty)
    val gs = r.getStruct(5)
    assert(r.getSeq[String](6).toSet == Set("abc", "bca", "cab"))
    assert(gs.getAs[Long]("n_grams") == 4L &&
      gs.getAs[Long]("n_distinct_grams") == 2L &&
      gs.getAs[Double]("top_gram_frac") == 0.5 &&
      gs.getAs[Double]("dup_gram_frac") == 0.5)
    val r2 = spark.sql(
      """SELECT word_shingles('a b c d', 3) AS sh,
        |       vec_norm(array(3.0d, 4.0d)) AS nrm,
        |       hashed_token_counts('x y x', 8) AS hv,
        |       bpe_byte_decode(array('Ġthe')) AS dec""".stripMargin).collect().head
    assert(r2.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(r2.getDouble(1) == 5.0)
    assert(r2.getSeq[Long](2).sum == 3L && r2.getSeq[Long](2).length == 8)
    assert(r2.getString(3) == " the")
    val r3 = spark.sql(
      """SELECT word_tokens(' A b  C ') AS tk,
        |       array_shingles(word_tokens('a b c d'), 3) AS sh,
        |       array_gram_stats(word_tokens('a b a b a'), 2) AS gs""".stripMargin)
      .collect().head
    assert(r3.getSeq[String](0) == Seq("a", "b", "c"))
    assert(r3.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(r3.getStruct(2).getAs[Long]("n_grams") == 4L)
    val r4 = spark.sql(
      """SELECT word_shingle_hashes('a b c d', 3) AS h,
        |       array_shingle_hashes(word_tokens('a b c d'), 3) AS ha,
        |       transform(word_shingles('a b c d', 3), s -> xxhash64(s)) AS twin
        |""".stripMargin).collect().head
    assert(r4.getSeq[Long](0) == r4.getSeq[Long](2) &&
      r4.getSeq[Long](1) == r4.getSeq[Long](2))
    val r5 = spark.sql(
      "SELECT html_blocks('<nav><a href=x>Home</a></nav><p>hello world</p>') AS b")
      .collect().head
    val blocks = r5.getSeq[org.apache.spark.sql.Row](0)
    assert(blocks.map(b => (b.getString(0), b.getInt(1), b.getDouble(2))) ==
      Seq(("Home", 1, 1.0), ("hello world", 2, 0.0)))
  }

  test("native simhash_bands matches the declarative vote/band spelling, both hash families") {
    // The oracle-semantics guarantee: the one-pass native expression
    // must produce exactly the band keys the old explode + 64-column
    // vote aggregate produced (portable = the arithmetic the DuckDB
    // oracle recomputes; production = xxhash64).
    def declarativeBands(portable: Boolean): DataFrame = {
      val tok = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      val bits = if (portable) {
        val chunks = tok.withColumn("hx", md5(col("token")))
          .select(col("doc_id") +: (0 until 4).map(k =>
            conv(substring(col("hx"), 1 + 4 * k, 4), 16, 10).cast("int").as(s"c$k")): _*)
        (0 until 64).map { b =>
          sum(when(shiftright(col(s"c${b / 16}"), b % 16)
            .bitwiseAND(lit(1)) === 1, 1).otherwise(-1)).as(s"v$b") } -> chunks
      } else {
        val h = tok.withColumn("h", xxhash64(col("token")))
        (0 until 64).map { b =>
          sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1)
            .otherwise(-1)).as(s"v$b") } -> h
      }
      val votes = bits._2.groupBy(col("doc_id")).agg(bits._1.head, bits._1.tail: _*)
      val bandCols = (0 until 4).map { k =>
        (0 until 16).map { j =>
          when(col(s"v${16 * k + j}") > 0, lit(1 << j)).otherwise(0)
        }.reduce(_ + _).as(s"band$k")
      }
      votes.select(col("doc_id") +: bandCols: _*)
    }
    for (portable <- Seq(true, false)) {
      val native = docs.select(col("doc_id"),
          graft.functions.simhash_bands(TextOps.tokens(col("text")), portable).as("b"))
        .select(col("doc_id") +: (0 until 4).map(k =>
          element_at(col("b"), k + 1).as(s"band$k")): _*)
      val joined = native.as("n").join(declarativeBands(portable).as("d"), Seq("doc_id"), "full")
      val bad = joined.filter((0 until 4).map(k =>
        col(s"n.band$k") =!= col(s"d.band$k") ||
          col(s"n.band$k").isNull || col(s"d.band$k").isNull).reduce(_ || _))
      assert(bad.count() == 0, s"portable=$portable band mismatch")
    }
    // The 64-bit fingerprint API is the same bands reassembled
    // little-endian — pin it to the declarative band frame too.
    val fpNative = Dedup.simhash(docs).as[(Long, Long)].collect().toMap
    val fpDecl = declarativeBands(portable = false).select(col("doc_id"),
        (0 until 4).map(k => shiftleft(col(s"band$k").cast("long"), 16 * k))
          .reduce(_.bitwiseOR(_)).as("simhash"))
      .as[(Long, Long)].collect().toMap
    assert(fpNative.nonEmpty && fpNative == fpDecl)
  }

  test("exact dedup groups identical normalized texts under one keeper id") {
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "other text"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df).select("doc_id", "n_copies")
      .as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (3L, 1L)))
  }

  test("native word_shingles is byte-identical to the declarative tokens+transform spelling") {
    val mismatches = docs.select(col("doc_id"),
        graft.functions.word_shingles(col("text"), 3).as("native"),
        TextOps.shingles(TextOps.tokens(col("text")), 3).as("declarative"))
      .filter(col("native") =!= col("declarative"))
    assert(mismatches.count() == 0)
  }

  test("native shingle hashes are bit-identical to transform(shingles, xxhash64), text and token paths") {
    // The license for the dedup/decontamination pipelines to key on
    // 8-byte gram hashes: the native pass hashes EXACTLY the gram
    // strings the declarative spelling builds, with the builtin
    // xxhash64's algorithm and seed.
    val mismatches = docs.select(col("doc_id"),
        graft.functions.word_shingle_hashes(col("text"), 3).as("native"),
        transform(graft.functions.word_shingles(col("text"), 3),
          s => xxhash64(s)).as("declarative"),
        graft.functions.array_shingle_hashes(
          graft.functions.word_tokens(col("text")), 3).as("native_arr"))
      .filter(col("native") =!= col("declarative") ||
        col("native_arr") =!= col("declarative"))
    assert(mismatches.count() == 0)
    // The one-pass two-seed pair variant (128-bit dedup tier) is
    // bit-identical to zipping two independent single-seed runs.
    val pairMismatches = docs.select(
        graft.functions.word_shingle_hash_pairs(col("text"), 3).as("pairs"),
        arrays_zip(
          graft.functions.word_shingle_hashes(col("text"), 3).as("h1"),
          graft.functions.word_shingle_hashes(col("text"), 3, seed = 1042L)
            .as("h2")).as("zipped"))
      .filter(col("pairs") =!= col("zipped"))
    assert(pairMismatches.count() == 0)
  }

  test("native char_shingles is byte-identical to the declarative normalized+substring spelling") {
    // The corpus plus a multibyte/whitespace torture frame: CJK (3-byte
    // codepoints, no spaces), an astral emoji (4-byte, surrogate pair
    // in UTF-16 — substring counts CODEPOINTS), mixed \t\n\x0B\f\r
    // runs, a too-short doc, and uppercase Unicode.
    val torture = Seq(
      (9001L, "深度学习模型训练数据"),
      (9002L, "深度学习模型训练数据集"),
      (9003L, "a\t\tb\ncd  e\ff\rg"),
      (9004L, "ab"),
      (9005L, "ÉCOLE Früh 東京 𝄞 clef 𝄞x"),
      (9006L, "   padded   ")
    ).toDF("doc_id", "text")
    for (frame <- Seq(docs, torture)) {
      val norm = TextOps.normalized(col("text"))
      val declarative = when(char_length(norm) >= 3,
        transform(sequence(lit(1), char_length(norm) - 3 + 1),
          i => substring(norm, i, lit(3))))
        .otherwise(array().cast("array<string>"))
      val mismatches = frame.select(col("doc_id"),
          graft.functions.char_shingles(col("text"), 3).as("native"),
          declarative.as("declarative"))
        .filter(col("native") =!= col("declarative"))
      assert(mismatches.count() == 0)
    }
  }

  test("native char shingle hashes are bit-identical to transform(char_shingles, xxhash64)") {
    val mismatches = docs.select(col("doc_id"),
        graft.functions.char_shingle_hashes(col("text"), 8).as("native"),
        transform(graft.functions.char_shingles(col("text"), 8),
          s => xxhash64(s)).as("declarative"))
      .filter(col("native") =!= col("declarative"))
    assert(mismatches.count() == 0)
    val pairMismatches = docs.select(
        graft.functions.char_shingle_hash_pairs(col("text"), 8).as("pairs"),
        arrays_zip(
          graft.functions.char_shingle_hashes(col("text"), 8).as("h1"),
          graft.functions.char_shingle_hashes(col("text"), 8, seed = 1042L)
            .as("h2")).as("zipped"))
      .filter(col("pairs") =!= col("zipped"))
    assert(pairMismatches.count() == 0)
  }

  test("char-shingle mode catches CJK near-duplicates that word shingling provably misses") {
    // Unsegmented script: each document is ONE whitespace token, so
    // word 3-grams are empty and the word-mode dedup family sees
    // nothing. Codepoint 4-grams see two near-identical docs (one
    // char edit mid-string) plus an unrelated third.
    val cjk = Seq(
      (1L, "深度学习模型需要大规模高质量的训练数据来获得良好的泛化能力"),
      (2L, "深度学习模型需要大规模高质量的训练数据集来获得良好的泛化能力"),
      (3L, "东京塔位于日本东京都港区芝公园四丁目二番八号")
    ).toDF("doc_id", "text")
    val word = Dedup.ngramJaccardPairs(cjk, 3, 0.5)
    assert(word.count() == 0, "word shingling should be blind here")
    val char = Dedup.ngramJaccardPairs(cjk, 4, 0.5,
        shingler = Shingler.Char)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(char == Set((1L, 2L)))
    // The MinHash-LSH path in char mode agrees (same pair, exact
    // verified Jaccard from the same char-gram index).
    val mh = Dedup.minhashLshPairs(cjk, 4, 64, 16, 0.5,
        shingler = Shingler.Char)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mh == Set((1L, 2L)))
    // Novelty in char mode scores the near-dup pair low and the
    // unrelated doc high (word mode has no grams at all).
    val nov = TextAnalysis.noveltyScores(cjk, 4, Shingler.Char)
      .select("doc_id", "novelty").as[(Long, Double)].collect().toMap
    assert(nov(3L) == 1.0)
    assert(nov(1L) < 0.5 && nov(2L) < 0.5)
    // Decontamination in char mode: an eval doc embedded in doc 1
    // flags docs 1 and 2 (the near-copy carries the same grams) but
    // not doc 3; word mode sees zero shared grams and flags nothing.
    val evalSet = Seq((100L, "大规模高质量的训练数据"))
      .toDF("doc_id", "text")
    assert(Decontamination.flagContaminated(cjk, evalSet, n = 6)
      .count() == 0, "word-mode decontamination should be blind here")
    for (flagged <- Seq(
        Decontamination.flagContaminated(cjk, evalSet, n = 6,
          shingler = Shingler.Char),
        Decontamination.flagContaminatedBloom(cjk, evalSet, n = 6,
          shingler = Shingler.Char))) {
      assert(flagged.select("doc_id").as[Long].collect().toSet ==
        Set(1L, 2L))
    }
    val attributed = Decontamination.attributeContamination(cjk, evalSet,
        n = 6, shingler = Shingler.Char)
      .select("doc_id", "eval_id").as[(Long, Long)].collect().toSet
    assert(attributed == Set((1L, 100L), (2L, 100L)))
  }

  test("domain curation: profile concentration and allow/block semantics incl. null domains") {
    val docs = Seq(
      (1L, "https://a.example.com/1"), (2L, "https://b.example.com/2"),
      (3L, "https://example.com/3"), (4L, "https://news.bbc.co.uk/4"),
      (5L, "https://spam.example.org/5"), (6L, "garbage"),
      (7L, "https://x.example.com/7")).toDF("doc_id", "url")
    val prof = Domains.domainProfile(docs, col("url"), k = 10)
      .collect().map(r => r.getAs[String]("key_value") ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("share"))).toMap
    // example.com concentrates 4/7 of the corpus; the unparseable URL
    // profiles under the null key rather than vanishing.
    assert(prof("example.com") == ((4L, 4.0 / 7)))
    assert(prof("bbc.co.uk")._1 == 1L && prof("example.org")._1 == 1L)
    assert(prof(null)._1 == 1L)
    val block = Seq("example.org").toDF("domain")
    val blocked = Domains.filterByDomainList(docs, col("url"), block,
      allow = false).select("doc_id").as[Long].collect().toSet
    // Block mode drops only the listed domain; the unparseable URL
    // survives (it matches no blocked domain).
    assert(blocked == Set(1L, 2L, 3L, 4L, 6L, 7L))
    val allowL = Seq("example.com").toDF("domain")
    val allowed = Domains.filterByDomainList(docs, col("url"), allowL,
      allow = true).select("doc_id").as[Long].collect().toSet
    // Allow mode keeps only the listed domain; unparseable drops.
    assert(allowed == Set(1L, 2L, 3L, 7L))
    // The filter hands back the caller's schema (no leaked temp cols).
    assert(Domains.filterByDomainList(docs, col("url"), block,
      allow = false).columns.toSeq == Seq("doc_id", "url"))
  }

  test("char-mode span dedup: reports and cuts a shared CJK run that word mode cannot see") {
    // Two documents share a 12-codepoint run mid-text; no whitespace
    // anywhere, so word mode sees one giant token per doc and zero
    // spans. Char mode must report the run in CODEPOINT offsets and
    // cut it from the non-owner only.
    val shared = "大规模高质量的训练数据集合" // 13 codepoints
    val cjk = Seq(
      (1L, "甲乙丙丁" + shared + "戊己庚辛"),
      (2L, "子丑寅卯辰巳" + shared + "午未申酉"),
      (3L, "完全独立した別の文書である")
    ).toDF("doc_id", "text")
    assert(Dedup.duplicatedSpans(cjk, 6).count() == 0,
      "word mode should be blind here")
    val spans = Dedup.duplicatedSpans(cjk, 6, shingler = Shingler.Char)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("span_start"), r.getAs[Long]("span_end"))).toSet
    // Doc 1: run starts at codepoint 4; doc 2: at 6. Span = the full
    // 13-codepoint shared run in each carrier.
    assert(spans == Set((1L, 4L, 17L), (2L, 6L, 19L)))
    // The cut keeps the owner (lowest doc id) intact and removes the
    // run from doc 2; unverified and verified agree (no collisions).
    for (verify <- Seq(false, true)) {
      val cut = Dedup.cutDuplicatedSpans(cjk, 6, verify = verify,
          shingler = Shingler.Char)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("text"), r.getAs[Long]("n_cut"))).toMap
      assert(cut(1L) == (("甲乙丙丁" + shared + "戊己庚辛", 0L)))
      assert(cut(2L) == (("子丑寅卯辰巳" + "午未申酉", 13L)))
      assert(cut(3L)._2 == 0L)
    }
  }

  test("hashed-gram pair pipeline equals the string-gram spelling on the spec corpus") {
    // ngramJaccardPairs rides gram hashes; this pins the result to the
    // string-gram arithmetic it replaced (equal unless a 64-bit
    // collision exists in the corpus — in which case this fails loudly).
    val strIdx = docs.repartition(col("doc_id"))
      .select(col("doc_id"),
        array_distinct(graft.functions.word_shingles(col("text"), 3)).as("sh_arr"))
      .select(col("doc_id"), explode(col("sh_arr")).as("shingle"),
        size(col("sh_arr")).as("n_sh"))
    val strPairs = strIdx.as("x")
      .join(strIdx.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_common"),
        first(col("x.n_sh")).as("n_a"), first(col("y.n_sh")).as("n_b"))
      .select(col("id_a"), col("id_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val hashed = Dedup.ngramJaccardPairs(docs, 3, 0.8)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(strPairs.nonEmpty && hashed == strPairs)
  }

  test("shingle df-cap: capped candidate generation leaves the corpus pairs unchanged, with exact jaccard") {
    // Cap 5 genuinely drops shingles here (max df on this corpus is 9)
    // yet near-dup pairs survive on their rare shingles, and
    // verification against the full index keeps jaccard values exact.
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.8)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val capped = Dedup.ngramJaccardPairs(docs, 3, 0.8, maxShingleDf = 5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty && capped == exact)
    // The too-big-to-broadcast fallback (equi-join hot handling) must
    // yield the same pairs — forced with a zero broadcast budget, the
    // only way to reach it without a >4M-hot-shingle corpus.
    val fallback = Dedup.ngramJaccardPairs(docs, 3, 0.8, maxShingleDf = 5,
        maxBroadcastHotShingles = 0L)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(fallback == exact)
  }

  test("reliable persistence: pipelines produce identical results via checkpoint-dir materialization") {
    // The 100 TB knob: materialization points can write to reliable
    // checkpoint storage instead of executor-local blocks (an executor
    // loss then recomputes nothing). Results must be bit-identical to
    // the localCheckpoint default, and checkpoint files must actually
    // land in the configured dir.
    val ckptDir = java.nio.file.Files.createTempDirectory("graft_reliable_").toString
    val prev = Option(spark.sparkContext.getCheckpointDir).flatten
    spark.sparkContext.setCheckpointDir(ckptDir)
    try {
      val local = Dedup.ngramJaccardPairs(docs, 3, 0.8)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      val reliable = Dedup.ngramJaccardPairs(docs, 3, 0.8,
          persist = Persistence.Reliable)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(local.nonEmpty && reliable == local)
      val comps = Dedup.components(
          Dedup.ngramJaccardPairs(docs, 3, 0.8, persist = Persistence.Reliable),
          persist = Persistence.Reliable)
        .as[(Long, Long)].collect().toSet
      assert(comps == Dedup.components(Dedup.ngramJaccardPairs(docs, 3, 0.8))
        .as[(Long, Long)].collect().toSet)
      // The reliable path really wrote to the checkpoint dir.
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckptDir))
        .filter(p => java.nio.file.Files.isRegularFile(p)).count()
      assert(wrote > 0, "no checkpoint files written by Persistence.Reliable")
    } finally prev.foreach(spark.sparkContext.setCheckpointDir)
  }

  test("native minhash_signature is bit-identical to the explode + min-aggregate spelling") {
    // The LSH-candidate guarantee: identical signatures -> identical
    // band hashes -> identical candidate pairs, so the gate's shared
    // exact oracle (recall-1 parameters) is untouched by the one-pass
    // rewrite.
    val M = 2147483647L
    val numHashes = 64
    val coef = Iterator.iterate(42L)(x =>
        x * 6364136223846793005L + 1442695040888963407L)
      .map(x => math.floorMod(x, M - 1) + 1).take(2 * numHashes).toSeq
    val sh = docs.select(col("doc_id"),
        explode(array_distinct(graft.functions.word_shingles(col("text"), 3))).as("shingle"))
      .select(col("doc_id"), pmod(xxhash64(col("shingle")), lit(M)).as("x"))
    val minCols = (0 until numHashes).map { i =>
      min(pmod(lit(coef(2 * i)) * col("x") + lit(coef(2 * i + 1)), lit(M))).as(s"m$i")
    }
    val declarative = sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
    val native = docs.select(col("doc_id"),
        graft.functions.minhash_signature(
          array_distinct(graft.functions.word_shingles(col("text"), 3)), numHashes).as("sig"))
      .filter(col("sig").isNotNull)
    val joined = native.as("n").join(declarative.as("d"), Seq("doc_id"), "full")
    val bad = joined.filter(col("n.sig").isNull || col("d.sig").isNull ||
      col("n.sig") =!= col("d.sig"))
    assert(native.count() > 0 && bad.count() == 0)
  }

  test("gate corpus max shingle df stays below the gate df-cap (oracle-sharing invariant)") {
    // dedup_ngram/clusters/keep_one share the EXACT DuckDB oracle while
    // running with maxShingleDf=10 — sound only while no shingle in the
    // sf0.01 gate corpus reaches the cap (a capped-out shingle could
    // drop a pair whose overlap is exclusively hot). Pin the invariant
    // so regenerated gate data fails here instead of silently breaking
    // the oracle contract.
    val gateDocs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val maxDf = gateDocs.select(col("doc_id"),
        explode(array_distinct(graft.functions.word_shingles(col("text"), 3))).as("sh"))
      .groupBy(col("sh")).agg(countDistinct(col("doc_id")).as("df"))
      .agg(max(col("df"))).as[Long].head()
    assert(maxDf < 10, s"gate corpus max shingle df $maxDf reached the gate cap 10; " +
      "the shared exact oracle for dedup_ngram is no longer guaranteed")
  }

  test("minhash+LSH pairs equal the exact n-gram Jaccard pairs on the corpus (recall 1 at J>=0.8)") {
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLshPairs(docs, 3, 64, 16, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty) // corpus has planted near-dups
    assert(lsh == exact)
  }

  test("simhash: identical docs collide at hamming 0; planted near-dups are found") {
    val df = Seq((1L, "spark window agg join"), (2L, "spark window agg join"))
      .toDF("doc_id", "text")
    val pair = Dedup.simhashPairs(df, 0)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pair.toSeq == Seq((1L, 2L, 0)))

    // On the real corpus, simhash at tight hamming should rediscover a
    // decent share of the exact J>=0.8 near-dup pairs.
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sim = Dedup.simhashPairs(docs, 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val recall = exact.count(sim.contains).toDouble / exact.size
    assert(recall >= 0.8, s"simhash recall $recall over ${exact.size} pairs")
  }

  test("portable simhash twin behaves like the production variant (hamming-0 collision, corpus recall)") {
    val df = Seq((1L, "spark window agg join"), (2L, "spark window agg join"))
      .toDF("doc_id", "text")
    val pair = Dedup.simhashPairsPortable(df, 0)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pair.toSeq == Seq((1L, 2L, 0)))
    val exact = Dedup.ngramJaccardPairs(docs, 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sim = Dedup.simhashPairsPortable(docs, 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val recall = exact.count(sim.contains).toDouble / exact.size
    assert(recall >= 0.8, s"portable simhash recall $recall over ${exact.size} pairs")
  }

  test("portable fingerprint twin finds the planted near-duplicate, not the unrelated doc") {
    val core = "spark structured streaming window aggregation over event time with watermarks"
    val df = Seq(
      (1L, s"$core plus a small suffix"),
      (2L, s"prefix then $core"),
      (3L, "completely different document about nothing relevant at all"))
      .toDF("doc_id", "text")
    val pairs = Dedup.fingerprintPairsPortable(df, 16, 8, 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("ANN LSH top-k achieves >=0.6 recall@5 against brute force") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.annTopK(emb, queries, 5, 64)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ann.contains).toDouble / exact.size
    assert(recall >= 0.6, s"ann recall $recall")
  }

  test("LSH dup pairs: every reported pair is exact-verified; recall >=0.6 vs exact at 0.4") {
    val exact = Similarity.cosineDupPairs(emb, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshDupPairs(emb, 0.4, 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert(lsh.subsetOf(exact)) // exact verification: no false positives
    val recall = exact.count(lsh.contains).toDouble / exact.size
    assert(recall >= 0.6, s"lsh dup recall $recall over ${exact.size} pairs")
  }

  test("IVF recall@5 rises monotonically with nProbe and reaches exact at nProbe = nClusters") {
    // One shared index (gate parameterization, nClusters = 16): probe
    // sets are nested as nProbe grows and the re-rank is exact, so
    // recall is provably non-decreasing — and probing every cluster IS
    // brute force. Floors sit under the measured curve (0.46 / 0.64 /
    // 0.88 / 1.00 at nProbe 2/4/8/16 on this corpus) with margin.
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val index = Similarity.buildIvfIndex(emb, nClusters = 16)
    val recalls = Seq(2, 4, 8, 16).map { np =>
      val ivf = Similarity.ivfTopKWithIndex(index, queries, 5, np)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      np -> exact.count(ivf.contains).toDouble / exact.size
    }
    val byProbe = recalls.toMap
    assert(byProbe(2) >= 0.35, s"recall curve: $recalls")
    assert(byProbe(4) >= 0.55, s"recall curve: $recalls")
    assert(byProbe(8) >= 0.75, s"recall curve: $recalls")
    assert(byProbe(16) == 1.0, s"probe-all must equal brute force: $recalls")
    assert(recalls.map(_._2).sliding(2).forall(w => w(0) <= w(1) + 1e-9),
      s"recall must be monotone in nProbe: $recalls")
  }

  test("IVF top-k achieves >=0.6 recall@5 against brute force") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(emb, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, 5, nClusters = 8, nProbe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.6, s"ivf recall $recall")
  }

  test("gate-parameterized LSH/IVF reach recall 1 at gate scale (sf0.01)") {
    // The hyperplanes/centroid-init are deterministic functions of the
    // fixed seed, so recall on the fixed gate corpus is a reproducible
    // fact — these assertions are what licenses dedup_embedding_lsh /
    // sim_ann_lsh / sim_ann_ivf to share their exact baselines'
    // DuckDB oracles in SparkEntry.
    val e01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q01 = e01.filter(col("vec_id") < 10)
    val exactPairs = Similarity.cosineDupPairs(e01, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lshPairs = Similarity.lshDupPairs(e01, 0.4, 64, tables = 40, planesPerTable = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exactPairs.nonEmpty && lshPairs == exactPairs)

    val exactTopk = Similarity.cosineTopK(e01, q01, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val annTopk = Similarity.annTopK(e01, q01, 5, 64, tables = 48, planesPerTable = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(annTopk == exactTopk)
    val ivfTopk = Similarity.ivfTopK(e01, q01, 5, nClusters = 16, nProbe = 16)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(ivfTopk == exactTopk)
  }

  test("dupPairsAuto: size dispatch is invisible, and the large branch plans no all-pairs join") {
    // ≤ maxExactRows → exact all-pairs; above → banded LSH at recall-1
    // gate parameters. sf0.1 (2000 vectors) takes the LSH branch and
    // must still equal the exact pair set — this is what licenses the
    // dedup_embedding gate to stay on its exact DuckDB oracle at sf0.1
    // with no quadratic plan in the gate set.
    val e1 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val exact = Similarity.cosineDupPairs(e1, 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val auto = Similarity.dupPairsAuto(e1, 0.4, 64)
    val autoSet = auto.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty && autoSet == exact)
    val plan = auto.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
    // Small branch: identical to the exact baseline by construction.
    val e01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    assert(Similarity.dupPairsAuto(e01, 0.4, 64)
      .queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("semantic dedup: planted near-dups removed within clusters, cross-cluster blindness declared") {
    // Hand-computable geometry, dim 4. Seeds (nClusters = 3) are the
    // three lowest ids = the three axis vectors, so cluster membership
    // and every within-cluster cosine are checkable by eye.
    val vecs = Seq(
      0L -> Seq(1f, 0f, 0f, 0f),     // seed/cluster 0
      1L -> Seq(0f, 1f, 0f, 0f),     // seed/cluster 1
      2L -> Seq(0f, 0f, 1f, 0f),     // seed/cluster 2
      3L -> Seq(0.99f, 0.14f, 0f, 0f), // cluster 0; cos(3,0)=0.990 -> dup
      4L -> Seq(0f, 0.9f, 0.1f, 0f),   // cluster 1; cos(4,1)=0.994 -> dup
      5L -> Seq(0f, 0f, -1f, 0f),      // anti-parallel to seed 2: lands
                                       // in cluster 0 by tie (cos 0 to
                                       // seeds 0 and 1), no near mate
      6L -> Seq(0.6f, 0.8f, 0f, 0f),   // cluster 1; cos to 1 and 4 < 0.9
      7L -> Seq(0.74f, 0.67f, 0f, 0f)) // cluster 0; cos(7,6)=0.982 but 6
                                       // is in cluster 1 -> BOTH kept:
                                       // SemDeDup is within-cluster-only
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.semanticDedupSeeded(df, 0.9, 3)
      .as[(Long, Int, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == (0L to 7L))
    val keep = out.map(r => r._1 -> r._3).toMap
    assert(keep == Map(0L -> true, 1L -> true, 2L -> true, 3L -> false,
      4L -> false, 5L -> true, 6L -> true, 7L -> true))
    val cid = out.map(r => r._1 -> r._2).toMap
    assert(cid(3L) == 0 && cid(4L) == 1 && cid(5L) == 0 &&
      cid(6L) == 1 && cid(7L) == 0)
  }

  test("semanticPairsSeeded: pair edges consistent with verdicts; semantic split leakage matches the driver replay") {
    // Law on the real corpus: keep = false exactly for vectors that
    // appear as id_b in some pair (the verdict stage IS this pair
    // stage + an anti-join).
    val pairs = Similarity.semanticPairsSeeded(emb, 0.4, 8)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty && pairs.forall(p => p._1 < p._2))
    val verdicts = Similarity.semanticDedupSeeded(emb, 0.4, 8)
      .as[(Long, Int, Boolean)].collect()
    assert(verdicts.filter(!_._3).map(_._1).toSet == pairs.map(_._2).toSet)
    // Semantic leakage = pairs whose members straddle the vec_id split.
    val w = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val splits = Sampling.splitAssign(emb.select(col("vec_id")),
      col("vec_id"), w, "s1").select(col("vec_id"), col("split"))
    val leaks = Curation.splitLeakageFromPairs(
      Similarity.semanticPairsSeeded(emb, 0.4, 8), splits,
      simCol = "cos_sim", splitKey = "vec_id").collect()
    val spMap = splits.as[(Long, String)].collect().toMap
    val want = pairs.filter(p => spMap(p._1) != spMap(p._2))
      .map(p => (p._1, p._2)).toSet
    assert(leaks.map(r => (r.getLong(0), r.getLong(1))).toSet == want)
    assert(want.nonEmpty, "law is vacuous without a straddling pair")
  }

  test("semantic dedup over the trained index: cap-removals are a subset, lowest id per cluster kept, repartition-stable") {
    val index = Similarity.buildIvfIndex(emb, nClusters = 8)
    val full = Similarity.semanticDedup(index, 0.4)
      .as[(Long, Int, Boolean)].collect()
    assert(full.length == emb.count())
    val removedFull = full.filter(!_._3).map(_._1).toSet
    assert(removedFull.nonEmpty, "sf0.001 corpus has cosine>=0.4 cluster-mates")
    // Lowest id in each cluster can never have a LOWER-id mate.
    full.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.minBy(_._1)._3, "lowest vec_id in a cluster must be kept")
    }
    // The oversized-cluster sub-split can only LOSE pairs (straddling
    // dups), never invent them: removals under a tiny cap are a strict
    // subset of the uncapped removals here.
    val capped = Similarity.semanticDedup(index, 0.4, maxClusterSize = 8L)
      .as[(Long, Int, Boolean)].collect()
    val removedCapped = capped.filter(!_._3).map(_._1).toSet
    assert(removedCapped.subsetOf(removedFull) && removedCapped != removedFull)
    // Deterministic under any physical layout of the assigned frame.
    val reIdx = Similarity.IvfIndex(index.centroids, index.assigned.repartition(7))
    val again = Similarity.semanticDedup(reIdx, 0.4, maxClusterSize = 8L)
      .as[(Long, Int, Boolean)].collect().toSet
    assert(again == capped.toSet)
  }

  test("semantic decontamination: broadcast-matrix path is bit-identical to the exact join baseline") {
    val evalSet = emb.filter(col("vec_id") % 7 === 0)
    val native = Decontamination
      .flagContaminatedSemantic(emb, evalSet, 0.4)
      .as[(Long, Option[Long], Option[Long], Boolean)].collect().toSet
    val exact = Decontamination
      .flagContaminatedSemanticExact(emb, evalSet, 0.4)
      .as[(Long, Option[Long], Option[Long], Boolean)].collect().toSet
    assert(native == exact)
    assert(native.exists(_._4) && native.exists(!_._4),
      "threshold 0.4 must split the corpus non-trivially")
    // Eval self-members score cos 1.0 against themselves.
    native.filter(_._1 % 7 == 0).foreach { r =>
      assert(r._2.contains(1000000L) && r._3.contains(r._1) && r._4)
    }
    // The native path is a pure projection: zero exchanges in the plan.
    val plan = Decontamination.flagContaminatedSemantic(emb, evalSet, 0.4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected zero-shuffle scan:\n$plan")
  }

  test("semantic decontamination: LSH big-eval tier flags a subset; ties and zero-norm rows pinned") {
    val evalSet = emb.filter(col("vec_id") % 7 === 0)
    val exact = Decontamination
      .flagContaminatedSemanticExact(emb, evalSet, 0.4)
      .as[(Long, Option[Long], Option[Long], Boolean)].collect()
    val lsh = Decontamination
      .flagContaminatedSemantic(emb, evalSet, 0.4, maxBroadcastEval = 0L)
      .as[(Long, Option[Long], Option[Long], Boolean)].collect()
    assert(lsh.length == exact.length, "one verdict row per corpus vector")
    val exactFlags = exact.filter(_._4).map(_._1).toSet
    val lshFlags = lsh.filter(_._4).map(_._1).toSet
    assert(lshFlags.subsetOf(exactFlags),
      "LSH candidates can miss a near pair, never invent one")
    // Self-members share every bucket with themselves: recall 1 on them.
    assert(exactFlags.filter(_ % 7 == 0).subsetOf(lshFlags))
    // Hand geometry: duplicate eval vectors tie at the same micro
    // cosine -> lowest eval id wins; a zero corpus vector is
    // unscoreable -> null score, not contaminated.
    val corpus = Seq(
      0L -> Seq(1f, 0f), 1L -> Seq(0f, 1f), 2L -> Seq(0f, 0f))
      .toDF("vec_id", "embedding")
    val dupEval = Seq(10L -> Seq(1f, 0f), 11L -> Seq(1f, 0f))
      .toDF("vec_id", "embedding")
    val out = Decontamination
      .flagContaminatedSemantic(corpus, dupEval, 0.9)
      .as[(Long, Option[Long], Option[Long], Boolean)].collect()
      .sortBy(_._1)
    assert(out(0) == ((0L, Some(1000000L), Some(10L), true)))
    assert(out(1) == ((1L, Some(0L), Some(10L), false)))
    assert(out(2) == ((2L, None, None, false)))
    // Empty eval set: nothing to leak from.
    val none = Decontamination
      .flagContaminatedSemantic(corpus, dupEval.filter(col("vec_id") < 0), 0.9)
      .as[(Long, Option[Long], Option[Long], Boolean)].collect()
    assert(none.forall(r => r._2.isEmpty && !r._4))
  }

  test("multimodal: imperative (mapPartitions+decoder) equals declarative twin") {
    val media = Multimodal.mediaFromDocuments(docs)
    val imp = Multimodal.extractFeatures(media, Multimodal.MediaDecoder.Fake)
      .toDF().orderBy("media_id").collect().toSeq
    val sql = Multimodal.extractFeaturesSql(media)
      .orderBy("media_id").collect().toSeq
    assert(imp == sql)
  }

  test("JDK ImageIO decoder: real PNG/JPEG bytes flow through extractFeatures") {
    def img(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
      val i = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) i.setRGB(x, y, rgb)
      i
    }
    def bytes(i: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(i, fmt, b))
      b.toByteArray
    }
    val media = Seq(
      (1L, "image/png", "s", bytes(img(3, 2, 0xFF0000), "png")), // solid red
      (2L, "image/png", "s", bytes(img(5, 7, 0xFFFFFF), "png")), // solid white
      (3L, "image/jpeg", "s", bytes(img(8, 4, 0x808080), "jpg")), // mid gray
      (4L, "application/octet-stream", "s", Array[Byte](1, 2, 3)) // garbage
    ).toDF("media_id", "mime", "source", "payload")
    val out = Multimodal
      .extractFeatures(media, Multimodal.MediaDecoder.JdkImageIO)
      .collect().map(r => r.media_id -> r).toMap
    val red = out(1L)
    assert(red.width == 3 && red.height == 2 && red.n_frames == 1)
    assert(math.abs(red.brightness - 0.299) < 1e-9) // Rec. 601 red luma
    assert(out(2L).width == 5 && out(2L).height == 7 &&
      out(2L).brightness > 0.999)
    assert(out(3L).width == 8 && out(3L).height == 4 &&
      math.abs(out(3L).brightness - 128.0 / 255) < 0.05) // JPEG is lossy
    // Undecodable bytes degrade instead of killing the scan.
    assert(out(4L).width == 0 && out(4L).n_frames == 0 &&
      out(4L).brightness.isNaN)
    // Resize geometry driven by REAL decoded dims: 5x7 into a 4x4 box.
    val resized = Multimodal.resize(
        media.filter(col("media_id") === 2L), 4, 4,
        Multimodal.MediaDecoder.JdkImageIO)
      .collect().head
    assert(resized.width == 5 && resized.height == 7 &&
      resized.out_width == 3 && resized.out_height == 4)
  }

  test("frame sampling emits n_frames rows per media item") {
    val media = Multimodal.mediaFromDocuments(docs.limit(20))
    val frames = Multimodal.sampleFrames(media)
    val counts = frames.groupBy("media_id").count()
    val joined = Multimodal.extractFeaturesSql(media)
      .select(col("media_id"), col("n_frames").cast("long").as("n_frames"))
      .join(counts, "media_id")
      .filter(col("count") =!= col("n_frames"))
    assert(joined.count() == 0)
  }

  test("rolling fingerprint: winnowing guarantee — shared run of window+winnow-1 chars shares a print") {
    val w = 16; val k = 8
    val shared = "z" * 0 + "the quick brown fox jumps over it" // 33 >= w+k-1=23
    val df = Seq(
      (1L, s"AAAA unrelated prefix $shared"),
      (2L, s"$shared totally different suffix BBBB"),
      (3L, "no overlap with the others at all, none whatsoever"))
      .toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
      graft.functions.rolling_fingerprint(lower(col("text")), w, k).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1).toSet.intersect(fps(2).toSet).nonEmpty)
    assert(fps(1).toSet.intersect(fps(3).toSet).isEmpty)
    // winnowing compresses: far fewer prints than grams
    assert(fps(1).size < fps(1).distinct.size + 40)
  }

  test("rolling fingerprint: identical text yields identical prints; short text hashes whole string") {
    val df = Seq((1L, "same content here"), (2L, "same content here"), (3L, "tiny"))
      .toDF("doc_id", "text")
    val fps = df.select(col("doc_id"),
      graft.functions.rolling_fingerprint(col("text"), 16, 8).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(fps(1) == fps(2))
    assert(fps(3).size == 1) // "tiny" < window -> single whole-string hash
  }

  test("fingerprintPairs finds planted near-duplicate (shared majority substring)") {
    val core = "spark structured streaming window aggregation over event time with watermarks"
    val df = Seq(
      (1L, s"$core plus a small suffix"),
      (2L, s"prefix then $core"),
      (3L, "completely different document about nothing relevant at all"))
      .toDF("doc_id", "text")
    val pairs = Dedup.fingerprintPairs(df, 16, 8, 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("components: a 50-hop duplicate chain converges within maxIters via pointer jumping") {
    // Plain min-label propagation needs O(diameter) = 49 rounds here —
    // beyond the 20-round bound; path halving from round 3 closes it
    // in O(log L). maxDriverEdges = 0 forces the distributed loop
    // (the driver fast path would trivialize the chain).
    val pairs = (1L to 49L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.components(pairs, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(comp.size == 50 && comp.values.forall(_ == 1L))
  }

  test("components: stepsPerJob chaining is label-equivalent to one-round-per-job") {
    // Convergence is tested on the LAST chained step only; the labels
    // must not depend on the job pacing. Chain (diameter 5) + triangle
    // + disjoint pair exercises converge-mid-chain and halving paths.
    // Forced distributed: job pacing only exists on that path.
    val pairs = ((1L to 5L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 22L), (20L, 22L), (30L, 31L)))
      .toDF("id_a", "id_b")
    val expected = Dedup.components(pairs, stepsPerJob = 1, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    for (spj <- Seq(2, 3))
      assert(Dedup.components(pairs, stepsPerJob = spj, maxDriverEdges = 0L)
        .as[(Long, Long)].collect().toMap == expected)
  }

  test("components: driver union-find fast path equals the distributed loop") {
    // The size dispatch must be invisible in the labels: the corpus'
    // real near-dup graph plus an adversarial chain, run through both
    // paths. Also pins the fast path's engagement (driver path plans
    // a local relation — zero exchanges).
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.8, 10)
      .select(col("id_a"), col("id_b"))
      .union(Seq.range(1000L, 1040L).map(i => (i, i + 1)).toDF("id_a", "id_b"))
    val driver = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    val dist = Dedup.components(pairs, maxDriverEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(driver.nonEmpty && driver == dist)
    val plan = Dedup.components(pairs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("components: chain collapses to one cluster, disjoint pair stays separate") {
    // chain 1-2, 2-3, 3-4 (diameter 3 forces multiple propagation
    // rounds) + disjoint pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val comp = Dedup.components(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("vec_avg aggregator equals the explode-based element-wise mean") {
    val unit = emb.select(col("vec_id") % 7 as "k",
      expr("transform(embedding, x -> cast(x as double))").as("e"))
    val viaAgg = unit.groupBy(col("k"))
      .agg(graft.functions.VectorAgg.vec_avg(col("e")).as("m"))
      .select(col("k"), posexplode(col("m")).as(Seq("dim", "m")))
    val viaExplode = unit
      .select(col("k"), posexplode(col("e")).as(Seq("dim", "x")))
      .groupBy(col("k"), col("dim")).agg(avg(col("x")).as("m2"))
    val joined = viaAgg.join(viaExplode, Seq("k", "dim"))
      .filter(abs(col("m") - col("m2")) > 1e-12)
    assert(joined.count() == 0)
  }

  test("diversity sample: at most k per cluster, covers every non-small cluster, deterministic") {
    val index = Similarity.buildIvfIndex(emb, nClusters = 8)
    val s = Similarity.diversitySample(index, perCluster = 3, seed = "s1")
    val byCid = s.groupBy("cid").count().as[(Int, Long)].collect().toMap
    assert(byCid.values.forall(_ <= 3L))
    // Every cluster with >= 3 members contributes exactly 3.
    val sizes = index.assigned.groupBy("cid").count().as[(Int, Long)].collect().toMap
    sizes.foreach { case (cid, n) =>
      assert(byCid.getOrElse(cid, 0L) == math.min(n, 3L), s"cluster $cid")
    }
    // Deterministic under repartitioning of the corpus.
    val again = Similarity.diversitySample(
      Similarity.IvfIndex(index.centroids, index.assigned.repartition(7)),
      perCluster = 3, seed = "s1")
    assert(s.select("vec_id").as[Long].collect().toSet ==
      again.select("vec_id").as[Long].collect().toSet)
  }

  test("outlier scores: in [0,2], total coverage, own-centroid is the argmin centroid") {
    val index = Similarity.buildIvfIndex(emb, nClusters = 8)
    val s = Similarity.outlierScores(index)
      .as[(Long, Int, Double)].collect()
    assert(s.length == emb.count())
    assert(s.forall { case (_, _, d) => d >= -1e-9 && d <= 2.0 + 1e-9 })
    // cid is the NEAREST centroid, so no other centroid can beat the
    // own-cluster score: spot-check a few vectors exhaustively.
    val byId = s.map(r => r._1 -> r).toMap
    val vecs = index.assigned.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().take(10)
    for ((id, v) <- vecs) {
      val unit = { val n = math.sqrt(v.map(x => x.toDouble * x).sum); v.map(_ / n) }
      val best = index.centroids.map(c =>
        1.0 - c.zip(unit).map { case (a, b) => a * b }.sum).min
      assert(math.abs(byId(id)._3 - best) < 1e-9,
        s"vec $id: own-cluster score ${byId(id)._3} != min-centroid $best")
    }
  }

  test("outlier scores: empty index degrades to an empty frame, no exception") {
    val empty = Similarity.IvfIndex(Array.empty,
      emb.filter(lit(false)).select(col("vec_id"), col("embedding"),
        lit(0).as("cid")))
    assert(Similarity.outlierScores(empty).count() == 0)
  }

  test("native vec_unit equals the norm-then-transform HOF spelling, bit-exact") {
    val rnd = new scala.util.Random(47L)
    val rows = (0L until 60L).map { id =>
      (id, Seq.fill(16)((rnd.nextFloat() - 0.5f) * 4f))
    }
    val d = rows.toDF("vec_id", "embedding")
    val native = d.select(col("vec_id"),
        graft.functions.VecMath.vec_unit(col("embedding")).as("e"))
      .as[(Long, Seq[Double])].collect().toMap
    val hof = d.select(col("vec_id"),
        graft.functions.VecMath.vec_norm(col("embedding")).as("nrm"),
        col("embedding"))
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double") / col("nrm")).as("e"))
      .as[(Long, Seq[Double])].collect().toMap
    for (id <- native.keys) {
      native(id).zip(hof(id)).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToLongBits(a) ==
          java.lang.Double.doubleToLongBits(b), s"vec $id differs: $a vs $b")
      }
    }
    // Declared deviation on zero vectors: the HOF division throws
    // under ANSI; the native loop yields NaN (garbage scores instead
    // of a dead job).
    val zero = Seq((99L, Seq.fill(16)(0.0f))).toDF("vec_id", "embedding")
    val z = zero.select(graft.functions.VecMath.vec_unit(col("embedding")))
      .as[Seq[Double]].collect().head
    assert(z.forall(_.isNaN))
    intercept[Exception] {
      zero.select(graft.functions.VecMath.vec_norm(col("embedding")).as("nrm"),
          col("embedding"))
        .select(transform(col("embedding"), x => x.cast("double") / col("nrm")))
        .collect()
    }
  }

  test("pre-built IVF index probes identically to the train-per-call path") {
    // Training is deterministic (seeded init, fixed iters), so probing
    // a built-once index must reproduce ivfTopK exactly — the
    // train-once/probe-many artifact changes cost, never results.
    val queries = emb.filter(col("vec_id") < 10)
    val perCall = Similarity.ivfTopK(emb, queries, 5, nClusters = 8, nProbe = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    val index = Similarity.buildIvfIndex(emb, nClusters = 8)
    val fromIndex = Similarity.ivfTopKWithIndex(index, queries, 5, nProbe = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(perCall.nonEmpty && fromIndex == perCall)
  }

  test("IVF index survives a save/load roundtrip: cid-partitioned layout, identical probes") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    try {
      val queries = emb.filter(col("vec_id") < 10)
      val built = Similarity.buildIvfIndex(emb, nClusters = 8)
      Similarity.saveIvfIndex(built, dir)
      // The durable layout is the point: one directory per cluster, so
      // an nProbe-cluster probe reads nProbe/k of the corpus bytes.
      val parts = new java.io.File(dir + "/assigned").listFiles()
        .filter(_.getName.startsWith("cid=")).map(_.getName).toSet
      assert(parts.size == 8, s"expected 8 cid partitions, got $parts")
      val loaded = Similarity.loadIvfIndex(spark, dir)
      assert(loaded.centroids.map(_.toSeq).toSeq ==
        built.centroids.map(_.toSeq).toSeq)
      val a = Similarity.ivfTopKWithIndex(built, queries, 5, nProbe = 3)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      val b = Similarity.ivfTopKWithIndex(loaded, queries, 5, nProbe = 3)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(a.nonEmpty && a == b)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("IVF rolling append: probe-identical to a frozen-model rebuild, delta visible, params guard loud") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_app").toString
    try {
      val queries = emb.filter(col("vec_id") < 10)
      val base = emb.filter(col("vec_id") % 3 =!= 0)
      val built = Similarity.buildIvfIndex(base, nClusters = 8)
      Similarity.saveIvfIndex(built, dir)
      val batch = emb.filter(col("vec_id") % 3 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      Similarity.appendToIvfIndex(batch, dir)
      val grown = Similarity.loadIvfIndex(spark, dir)
      // Append ≡ rebuild with the SAME frozen centroids: the grown
      // artifact's probes match an in-memory index whose assigned
      // frame is base ∪ batch assigned by built.centroids —
      // bit-identical rows including the verified cosine.
      val rebuilt = Similarity.IvfIndex(built.centroids,
        built.assigned.unionByName(
          Similarity.assignToCentroids(batch, built.centroids)))
      val a = Similarity.ivfTopKWithIndex(grown, queries, 5, nProbe = 3)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
        .as[(Long, Long, Int, Double)].collect().toSet
      val b = Similarity.ivfTopKWithIndex(rebuilt, queries, 5, nProbe = 3)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
        .as[(Long, Long, Int, Double)].collect().toSet
      assert(a.nonEmpty && a == b)
      // The delta is genuinely probed: every query whose own re-keyed
      // copy was appended must see it as its cos-1.0 rank-1 neighbor.
      val full = Similarity.ivfTopKWithIndex(grown, queries, 5, nProbe = 8)
        .filter(col("rank") === 1).collect()
        .map(r => r.getAs[Long]("query_id") ->
          (r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos_sim"))).toMap
      queries.select("vec_id").as[Long].collect()
        .filter(_ % 3 == 0).foreach { q =>
          assert(full(q) == ((q + 1000000L, 1.0)),
            s"appended copy of $q not its top neighbor: ${full(q)}")
        }
      // Params guard: an artifact without the commit marker refuses
      // both append and load (a dead rebuild must fail loudly).
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir + "/params"))
      intercept[IllegalArgumentException] {
        Similarity.appendToIvfIndex(batch, dir)
      }
      intercept[IllegalArgumentException] {
        Similarity.loadIvfIndex(spark, dir)
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("salted join: identical results to the plain join on a skewed key, salt column dropped") {
    val left = spark.range(0, 5000).select(
      when(col("id") % 5 === 0, lit("hot"))
        .otherwise(concat(lit("k"), col("id"))).as("k"),
      col("id").as("v"))
    val right = Seq(("hot", 1), ("k17", 2), ("k23", 3), ("absent", 9)).toDF("k", "w")
    val plain = left.join(right, "k")
      .select("k", "v", "w").as[(String, Long, Int)].collect().toSet
    val salted = Bucketing.saltedJoin(left, right, "k", salt = 8)
    assert(salted.columns.toSeq == Seq("k", "v", "w"))
    assert(salted.as[(String, Long, Int)].collect().toSet == plain)
    assert(plain.count(_._1 == "hot") == 1000) // the skew is real
  }

  test("salted join: a user column named like the working salt column survives intact") {
    // The working column is picked to avoid BOTH schemas, so a
    // pre-existing `_graft_salt_0` passes through untouched.
    val left = Seq(("a", 1, 10), ("b", 2, 20)).toDF("k", "v", "_graft_salt_0")
    val right = Seq(("a", 7), ("b", 8)).toDF("k", "w")
    val out = Bucketing.saltedJoin(left, right, "k", salt = 4)
    assert(out.columns.contains("_graft_salt_0"))
    assert(out.select("k", "_graft_salt_0", "w").as[(String, Int, Int)]
      .collect().toSet == Set(("a", 10, 7), ("b", 20, 8)))
  }

  test("bucketed tables join without a shuffle exchange") {
    def cleanup(): Unit = Seq("bkt_orders", "bkt_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete()); loc.delete()
      }
    }
    cleanup()
    try {
      val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .withColumnRenamed("l_orderkey", "o_orderkey")
      Bucketing.writeBucketed(o, "bkt_orders", 4, Seq("o_orderkey"))
      Bucketing.writeBucketed(li, "bkt_lineitem", 4, Seq("o_orderkey"))
      val joined = Bucketing.coLocatedJoin(spark, "bkt_orders", "bkt_lineitem",
        Seq("o_orderkey"))
      joined.count() // force execution so AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
      // and the join is still correct
      val expected = o.join(li, "o_orderkey").count()
      assert(joined.count() == expected)
    } finally cleanup()
  }

  test("bpe-ish token count: sane bounds vs whitespace tokens") {
    val stats = TextAnalysis.tokenStats(docs)
    val bad = stats.filter(col("n_bpe_tokens") < col("n_tokens") ||
      col("n_bpe_tokens") > col("n_chars"))
    assert(bad.count() == 0)
  }

  test("decontamination flags eval overlap; broadcast and shuffle paths agree") {
    val eval = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val train = Seq(
      // contains eval 5-gram "beta gamma delta epsilon zeta" (plus one more)
      (10L, "prefix beta gamma delta epsilon zeta eta suffix"),
      // shares words but no 5-token run
      (11L, "alpha beta gamma five six seven delta epsilon"),
      (12L, "completely different content with no overlap at all"))
      .toDF("doc_id", "text")
    val flagged = Decontamination.flagContaminated(train, eval, n = 5)
      .as[(Long, Long)].collect().toMap
    // doc 10 shares exactly the 5-gram windows inside
    // "beta gamma delta epsilon zeta eta": 2 of them.
    assert(flagged == Map(10L -> 2L))
    val shuffled = Decontamination
      .flagContaminated(train, eval, n = 5, broadcastEval = false)
      .as[(Long, Long)].collect().toMap
    assert(shuffled == flagged)
  }

  test("attributed decontamination: per-eval provenance rows; distinct flagged docs equal the flag path; multi-eval fan-out") {
    val eval = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"),
      // Eval 3 shares its 5-gram run with eval 1's tail.
      (3L, "delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val train = Seq(
      // Hits eval 1 (2 windows) AND eval 3 (1 window:
      // "delta epsilon zeta eta theta").
      (10L, "prefix beta gamma delta epsilon zeta eta theta suffix"),
      (11L, "alpha beta gamma five six seven delta epsilon"),
      (12L, "one two three four five oops six seven eight nine"))
      .toDF("doc_id", "text")
    val att = Decontamination.attributeContamination(train, eval, n = 5)
      .as[(Long, Long, Long)].collect().toSet
    // doc 10 vs eval 1: shared windows of "beta gamma delta epsilon
    // zeta eta theta" = 3; vs eval 3: "delta epsilon zeta eta theta"
    // = 1. doc 12 vs eval 2: "one two three four five" = 1.
    assert(att == Set((10L, 1L, 3L), (10L, 3L, 1L), (12L, 2L, 1L)))
    // Law on the real corpus: distinct attributed doc set == flag set.
    val all = docs
    val tr = all.filter(col("doc_id") >= 10)
    val ev = all.filter(col("doc_id") < 10)
    val attributed = Decontamination.attributeContamination(tr, ev, n = 5)
    val flaggedSet = Decontamination.flagContaminated(tr, ev, n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(attributed.select("doc_id").distinct().as[Long].collect().toSet
      == flaggedSet)
    assert(flaggedSet.nonEmpty, "law is vacuous with no contamination")
    // Per-pair counts never exceed the per-doc distinct-gram hit count
    // ... but can SUM above it (a gram shared with two evals counts
    // once in n_hits, twice across attribution rows).
    val hits = Decontamination.flagContaminated(tr, ev, n = 5)
      .as[(Long, Long)].collect().toMap
    attributed.as[(Long, Long, Long)].collect().foreach { case (d, _, c) =>
      assert(c <= hits(d))
    }
  }

  test("hashed-gram decontamination equals the string-gram spelling on the spec corpus") {
    val eval = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    val strSide = docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.word_shingles(col("text"), 5))).as("g"))
      .join(broadcast(eval.select(explode(array_distinct(
        graft.functions.word_shingles(col("text"), 5))).as("g")).distinct()), "g")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .as[(Long, Long)].collect().toMap
    val hashed = Decontamination.flagContaminated(docs, eval, 5)
      .as[(Long, Long)].collect().toMap
    assert(strSide.nonEmpty && hashed == strSide)
  }

  test("asof join: latest right at-or-before left ts per key; equal-ts inclusive; no-prior yields null") {
    val left = Seq(
      (1L, "u1", 100L, "a"), (2L, "u1", 200L, "b"), (3L, "u1", 300L, "c"),
      (4L, "u2", 150L, "d"), (5L, "u3", 500L, "e"))
      .toDF("event_id", "user", "ts", "payload")
    val right = Seq(
      ("u1", 100L, 10.0), ("u1", 250L, 25.0),
      ("u2", 200L, 99.0)) // u2's only snapshot is AFTER its event; u3 has none
      .toDF("user", "ts", "snap")
    val out = Joins.asofJoin(left, right, Seq("user"), "ts", "ts", Seq("snap"))
      .select("event_id", "snap").as[(Long, Option[Double])].collect().toMap
    assert(out == Map(
      1L -> Some(10.0), // right at exactly left ts counts (<=)
      2L -> Some(10.0), // 250 is in the future at ts 200
      3L -> Some(25.0),
      4L -> None,       // only future snapshots
      5L -> None))      // no snapshots at all
    // Every left row exactly once, all left columns intact.
    val full = Joins.asofJoin(left, right, Seq("user"), "ts", "ts", Seq("snap"))
    assert(full.count() == 5 &&
      full.columns.toSeq == Seq("event_id", "user", "ts", "payload", "snap"))
  }

  test("asof join: matched row's NULL value is kept and multi values come from one row") {
    val left = Seq((1L, "u1", 300L), (2L, "u1", 150L))
      .toDF("event_id", "user", "ts")
    // At ts 200 the snapshot's `snap` is legitimately NULL while `tag`
    // is set: the match at 300 must return (NULL, "mid") — not smuggle
    // snap=10.0 from the older row (the per-column last(ignoreNulls)
    // bug this pins against mixes rows exactly like that).
    val right = Seq(
      ("u1", 100L, Some(10.0), "old"),
      ("u1", 200L, None, "mid"))
      .toDF("user", "ts", "snap", "tag")
    val out = Joins.asofJoin(left, right, Seq("user"), "ts", "ts",
        Seq("snap", "tag"))
      .select("event_id", "snap", "tag")
      .as[(Long, Option[Double], String)].collect()
      .map { case (id, s, t) => id -> ((s, t)) }.toMap
    assert(out == Map(
      1L -> ((None, "mid")),        // atomic row: NULL snap + mid tag
      2L -> ((Some(10.0), "old")))) // older event still sees the old row
  }

  test("asof join: tolerance nulls out stale matches; bucketed plan is equivalent") {
    val left = Seq(
      (1L, "u1", 1000L), (2L, "u1", 1049L), (3L, "u1", 1051L),
      (4L, "u2", 5000L))
      .toDF("event_id", "user", "ts")
    val right = Seq(("u1", 1000L, 1.0), ("u2", 100L, 2.0))
      .toDF("user", "ts", "snap")
    val got = Joins.asofJoin(left, right, Seq("user"), "ts", "ts",
        Seq("snap"), tolerance = Some(50L))
      .select("event_id", "snap").as[(Long, Option[Double])].collect().toMap
    assert(got == Map(
      1L -> Some(1.0),  // exact-ts match, distance 0
      2L -> Some(1.0),  // distance 49 <= 50
      3L -> None,       // distance 51: stale → null, not the stale value
      4L -> None))      // u2's only snapshot is 4900 old
    // Bucketing must be invisible at every width (hot-key bound only).
    for (bw <- Seq(1L, 7L, 100L, 1000000L); tol <- Seq(None, Some(50L))) {
      val base = Joins.asofJoin(left, right, Seq("user"), "ts", "ts",
          Seq("snap"), tolerance = tol)
        .select("event_id", "snap").as[(Long, Option[Double])].collect().toMap
      val bucketed = Joins.asofJoin(left, right, Seq("user"), "ts", "ts",
          Seq("snap"), tolerance = tol, bucketWidth = Some(bw))
        .select("event_id", "snap").as[(Long, Option[Double])].collect().toMap
      assert(bucketed == base, s"bucketWidth=$bw tolerance=$tol")
    }
  }

  test("asof join directions: forward takes first at-or-after, nearest picks closer, ties go backward") {
    val left = Seq(
      (1L, "u1", 100L), // exact-ts right row: counts in every direction
      (2L, "u1", 140L), // backward 100 (d=40), forward 200 (d=60)
      (3L, "u1", 260L), // only a backward candidate exists
      (4L, "u2", 50L),  // only a backward candidate exists (u2)
      (5L, "u1", 150L)) // tie: d=50 both ways -> backward
      .toDF("event_id", "user", "ts")
    val right = Seq(
      ("u1", 100L, 1.0), ("u1", 200L, 2.0), ("u2", 10L, 9.0))
      .toDF("user", "ts", "snap")
    def run(d: String, bw: Option[Long] = None) =
      Joins.asofJoin(left, right, Seq("user"), "ts", "ts", Seq("snap"),
          bucketWidth = bw, direction = d)
        .select("event_id", "snap").as[(Long, Option[Double])].collect().toMap
    val fwd = run("forward")
    assert(fwd == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None,
      4L -> None, 5L -> Some(2.0)))
    val near = run("nearest")
    assert(near == Map(1L -> Some(1.0), 2L -> Some(1.0), 3L -> Some(2.0),
      4L -> Some(9.0), 5L -> Some(1.0))) // 5: tie goes backward
    // Bucketing is invisible in every direction at every width.
    for (d <- Seq("backward", "forward", "nearest");
         bw <- Seq(1L, 7L, 64L, 1000000L))
      assert(run(d, Some(bw)) == run(d), s"direction=$d bucketWidth=$bw")
  }

  test("asof join law: every (direction, tolerance, bucketing) combo equals brute force on random data") {
    val rnd = new scala.util.Random(7)
    for (fixture <- 1 to 3) {
      val keys = Seq("a", "b", "c")
      val left = (1L to 60L).map(i =>
        (i, keys(rnd.nextInt(3)), rnd.nextInt(50).toLong))
      val right = (0 until 40).map { _ =>
        (keys(rnd.nextInt(3)), rnd.nextInt(50).toLong,
          if (rnd.nextBoolean()) Some(rnd.nextInt(100).toDouble) else None)
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq // unique (key, ts)
      val leftDf = left.toDF("event_id", "user", "ts")
      val rightDf = right.toDF("user", "ts", "snap")
      def brute(dir: String, tol: Option[Long]): Map[Long, Option[Double]] =
        left.map { case (id, k, ts) =>
          val cands = right.filter(_._1 == k)
          val b = cands.filter(_._2 <= ts).sortBy(_._2).lastOption
          val f = cands.filter(_._2 >= ts).sortBy(_._2).headOption
          val chosen = dir match {
            case "backward" => b
            case "forward" => f
            case "nearest" => (b, f) match {
              case (Some(x), Some(y)) =>
                if (ts - x._2 <= y._2 - ts) Some(x) else Some(y)
              case _ => b.orElse(f)
            }
          }
          val inReach = chosen.filter(c =>
            tol.forall(t => math.abs(ts - c._2) <= t))
          id -> inReach.flatMap(_._3)
        }.toMap
      for (dir <- Seq("backward", "forward", "nearest");
           tol <- Seq(None, Some(7L));
           bw <- Seq(None, Some(13L))) {
        val got = Joins.asofJoin(leftDf, rightDf, Seq("user"), "ts", "ts",
            Seq("snap"), tolerance = tol, bucketWidth = bw, direction = dir)
          .select("event_id", "snap")
          .as[(Long, Option[Double])].collect().toMap
        assert(got == brute(dir, tol),
          s"fixture=$fixture direction=$dir tolerance=$tol bucketWidth=$bw")
      }
    }
  }

  test("asof join bucketed: one hot key matches unbucketed result and splits the window sort") {
    // One key carrying everything — the unbucketed plan sorts all of
    // it on one task; the bucketed plan must partition its window by
    // (key, bucket) so no task sorts more than one bucket.
    val rnd = new scala.util.Random(42)
    val left = (1L to 400L).map(i => (i, "hot", rnd.nextInt(10000).toLong))
      .toDF("event_id", "user", "ts")
    val right = (0 until 60).map(i =>
        ("hot", rnd.nextInt(10000).toLong, rnd.nextDouble()))
      .groupBy { case (u, t, _) => (u, t) }.map(_._2.head).toSeq
      .toDF("user", "ts", "snap")
    val base = Joins.asofJoin(left, right, Seq("user"), "ts", "ts", Seq("snap"))
      .select("event_id", "snap").as[(Long, Option[Double])].collect().toMap
    val bucketedDf = Joins.asofJoin(left, right, Seq("user"), "ts", "ts",
      Seq("snap"), bucketWidth = Some(500L))
    val bucketed = bucketedDf
      .select("event_id", "snap").as[(Long, Option[Double])].collect().toMap
    assert(bucketed == base)
    // Plan pin: the big window's partition spec includes the bucket
    // column (hot-key sort is bounded by bucket, not whole-key), and
    // nothing in the plan degenerates to a cartesian/nested-loop.
    val plan = bucketedDf.queryExecution.executedPlan.toString
    assert(plan.contains("__asof_bkt"),
      "bucketed asof plan must window-partition by (keys, __asof_bkt)")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), s"degenerate join in:\n$plan")
    // Materializing the tagged union (expensive-upstream mode) must
    // not change results.
    val persisted = Joins.asofJoin(left, right, Seq("user"), "ts", "ts",
        Seq("snap"), bucketWidth = Some(500L),
        unionPersist = Some(Persistence.Local))
      .select("event_id", "snap").as[(Long, Option[Double])].collect().toMap
    assert(persisted == base)
  }

  test("dedup index rolling append equals full rebuild; mismatched-params append fails loudly") {
    def tmp(tag: String): java.nio.file.Path = {
      val p = java.nio.file.Files.createTempDirectory(tag)
      p.toFile.deleteOnExit(); p
    }
    val dirApp = tmp("graft_idx_app").toString
    val dirReb = tmp("graft_idx_reb").toString
    val base = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("text"))
    val delta = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    Dedup.saveDedupIndex(base, dirApp, 3, 64, 16)
    Dedup.appendToDedupIndex(delta, dirApp, 3, 64, 16)
    Dedup.saveDedupIndex(base.unionByName(delta), dirReb, 3, 64, 16)
    // The probe contains re-keyed copies of appended docs, so appended
    // rows MUST participate (identity matches at J = 1) for equality.
    val probe = docs.filter(col("doc_id") % 6 === 0)
      .select((col("doc_id") + 5000L).as("doc_id"), col("text"))
    def run(dir: String) =
      Dedup.dedupAgainstIndex(probe, dir, 0.8, 3, 64, 16)
        .as[(Long, Long, Double)].collect().toSet
    val viaAppend = run(dirApp)
    val viaRebuild = run(dirReb)
    assert(viaAppend == viaRebuild)
    // Appended delta is reachable: some match must point at a +1000 id.
    assert(viaAppend.exists(_._2 >= 1000L))
    // Mismatched banding on append must fail loudly, not corrupt.
    val ex = intercept[IllegalArgumentException] {
      Dedup.appendToDedupIndex(delta, dirApp, 3, 64, bands = 8)
    }
    assert(ex.getMessage.contains("mismatched"))
  }

  test("dedup index built with Persistence.Reliable is bit-identical to the Local build") {
    // The documented 100 TB posture (r15): Local's localCheckpoint
    // blocks are executor-local and unreplicated — an executor loss
    // kills a cluster-scale index build — so saveDedupIndex /
    // appendToDedupIndex accept Persistence.Reliable (HDFS/object-store
    // checkpoint dir). The artifacts must not depend on the choice.
    def tmp(tag: String): java.nio.file.Path = {
      val p = java.nio.file.Files.createTempDirectory(tag)
      p.toFile.deleteOnExit(); p
    }
    val ckpt = tmp("graft_idx_ckpt").toString
    val dirLoc = tmp("graft_idx_loc").toString
    val dirRel = tmp("graft_idx_rel").toString
    val base = docs.select(col("doc_id"), col("text"))
    val savedCkpt = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(ckpt)
    try {
      Dedup.saveDedupIndex(base, dirLoc, 3, 64, 16,
        persist = Persistence.Local)
      Dedup.saveDedupIndex(base, dirRel, 3, 64, 16,
        persist = Persistence.Reliable)
    } finally savedCkpt.foreach(spark.sparkContext.setCheckpointDir)
    for (art <- Seq("shingles", "sigs", "bands", "params")) {
      val l = spark.read.parquet(s"$dirLoc/$art").collect().toSet
      val r = spark.read.parquet(s"$dirRel/$art").collect().toSet
      assert(l == r, s"artifact $art differs between Local and Reliable")
    }
  }

  test("index rebuild that crashes mid-write leaves a params-less artifact the guards refuse") {
    // ADVICE r11 (medium): params-LAST alone only protects first-time
    // builds — a REBUILD over an existing index that dies between the
    // artifact overwrites and the params write used to leave the OLD
    // params validating mixed artifacts (values match on a same-params
    // retrain, shapes match on an IVF retrain). Both savers now delete
    // params/ FIRST, so any mid-rebuild crash trips the loud
    // params-absent guard instead of probing garbage.
    def tmp(tag: String): java.nio.file.Path = {
      val p = java.nio.file.Files.createTempDirectory(tag)
      p.toFile.deleteOnExit(); p
    }
    val boom = when(col("doc_id") >= 0,
      raise_error(lit("boom")).cast("string")).otherwise(col("text"))

    // MinHash dedup index: healthy build, then a rebuild whose shingle
    // write job fails per-row.
    val dir = tmp("graft_idx_crash").toString
    val base = docs.limit(20).select(col("doc_id"), col("text"))
    Dedup.saveDedupIndex(base, dir, 3, 64, 16)
    Dedup.dedupAgainstIndex(base.limit(1), dir, 0.9, 3, 64, 16).collect()
    intercept[Exception] {
      Dedup.saveDedupIndex(base.withColumn("text", boom), dir, 3, 64, 16)
    }
    val ex = intercept[IllegalArgumentException] {
      Dedup.dedupAgainstIndex(base.limit(1), dir, 0.9, 3, 64, 16)
    }
    assert(ex.getMessage.contains("no params/"))

    // IVF index: healthy build, then a rebuild whose assigned/ write
    // fails; probe-side load and append must both refuse.
    val ivfDir = tmp("graft_ivf_crash").toString
    val embSlice = emb.select(col("vec_id"), col("embedding")).limit(64)
    val idx = Similarity.buildIvfIndex(embSlice, nClusters = 4, iters = 1)
    Similarity.saveIvfIndex(idx, ivfDir)
    val crashing = Similarity.IvfIndex(idx.centroids,
      idx.assigned.withColumn("cid",
        when(col("vec_id") >= 0, raise_error(lit("boom")).cast("int"))
          .otherwise(col("cid"))))
    intercept[Exception] { Similarity.saveIvfIndex(crashing, ivfDir) }
    val ivfEx = intercept[IllegalArgumentException] {
      Similarity.appendToIvfIndex(embSlice.limit(1), ivfDir)
    }
    assert(ivfEx.getMessage.contains("no params/"))
  }

  test("char-mode incremental dedup index: CJK ingest loop works end to end; gram-mode mismatch fails loudly") {
    def tmp(tag: String): java.nio.file.Path = {
      val p = java.nio.file.Files.createTempDirectory(tag)
      p.toFile.deleteOnExit(); p
    }
    val dir = tmp("graft_idx_cjk").toString
    // Unsegmented corpus: word mode would index one degenerate token
    // per doc; char 4-grams carry the near-dup structure.
    val corpus = Seq(
      (1L, "深度学习模型需要大规模高质量的训练数据来获得良好的泛化能力"),
      (2L, "东京塔位于日本东京都港区芝公园四丁目二番八号"),
      (3L, "自然言語処理の事前学習には大量のテキストコーパスが必要である")
    ).toDF("doc_id", "text")
    Dedup.saveDedupIndex(corpus, dir, n = 4, 64, 16,
      shingler = Shingler.Char)
    // Batch: a one-char edit of doc 1 (must match), a fresh doc (must
    // not), and an exact copy of doc 3 (must match at J = 1).
    val batch = Seq(
      (101L, "深度学习模型需要大规模高质量的训练数据集来获得良好的泛化能力"),
      (102L, "全く無関係な新しい文書がここに現れる"),
      (103L, "自然言語処理の事前学習には大量のテキストコーパスが必要である")
    ).toDF("doc_id", "text")
    val hits = Dedup.dedupAgainstIndex(batch, dir, 0.5, n = 4, 64, 16,
        shingler = Shingler.Char)
      .select("doc_id", "dup_of", "jaccard")
      .as[(Long, Long, Double)].collect()
    assert(hits.map(h => (h._1, h._2)).toSet == Set((101L, 1L), (103L, 3L)))
    assert(hits.find(_._1 == 103L).get._3 == 1.0)
    // Rolling append keeps char mode: survivors land, and the NEXT
    // batch's copy of a survivor matches only via the delta.
    val survivors = Seq((102L, "全く無関係な新しい文書がここに現れる"))
      .toDF("doc_id", "text")
    Dedup.appendToDedupIndex(survivors, dir, n = 4, 64, 16,
      shingler = Shingler.Char)
    val next = Seq((201L, "全く無関係な新しい文書がここに現れる"))
      .toDF("doc_id", "text")
    val nextHits = Dedup.dedupAgainstIndex(next, dir, 0.5, n = 4, 64, 16,
        shingler = Shingler.Char)
      .select("doc_id", "dup_of").as[(Long, Long)].collect().toSet
    assert(nextHits == Set((201L, 102L)))
    // Mode mismatch: probing (or appending to) a char index with word
    // grams would silently match nothing — it must refuse instead.
    val ex = intercept[IllegalArgumentException] {
      Dedup.dedupAgainstIndex(next, dir, 0.5, n = 4, 64, 16)
    }
    assert(ex.getMessage.contains("gram mode"))
  }

  test("interval join: unbounded sentinel interval fails loudly, capped guard passes") {
    val left = Seq((1L, "u1", 100L)).toDF("event_id", "user", "ts")
    val open = Seq(("u1", 0L, Long.MaxValue)) // "still open" sentinel
      .toDF("user", "w_start", "w_end")
    val ex = intercept[Exception] {
      Joins.intervalJoin(left, open, Seq("user"), "ts", "w_start", "w_end",
        bucketWidth = 1000L, maxBucketsPerInterval = 1000L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxBucketsPerInterval")),
      s"wanted the loud guard, got: $ex")
    // Well-bounded intervals under the same cap are unaffected.
    val closed = Seq(("u1", 0L, 5000L)).toDF("user", "w_start", "w_end")
    val ok = Joins.intervalJoin(left, closed, Seq("user"), "ts", "w_start",
        "w_end", bucketWidth = 1000L, maxBucketsPerInterval = 1000L)
      .select("event_id").as[Long].collect().toSeq
    assert(ok == Seq(1L))
  }

  test("interval join: half-open containment via bucket expansion equals the theta-join reference") {
    val left = Seq(
      (1L, "u1", 100L), (2L, "u1", 150L), (3L, "u1", 200L), // 200 = w_end: excluded
      (4L, "u1", 99L),  // just before start: excluded
      (5L, "u2", 500L), (6L, "u3", 42L))
      .toDF("event_id", "user", "ts")
    val right = Seq(
      ("u1", 100L, 200L),   // [100, 200): catches 1, 2
      ("u1", 140L, 160L),   // overlapping interval: catches 2 again
      ("u2", 0L, 5000L),    // interval spanning many buckets: catches 5
      ("u3", 42L, 42L))     // empty interval: catches nothing
      .toDF("user", "w_start", "w_end")
    for (bucket <- Seq(1L, 7L, 50L, 10000L)) { // bucketing must be invisible
      val got = Joins.intervalJoin(left, right, Seq("user"),
          "ts", "w_start", "w_end", bucket)
        .select("event_id", "w_start").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 100L), (2L, 100L), (2L, 140L), (5L, 0L)),
        s"bucketWidth=$bucket")
    }
    // Reference spelling: plain range-predicate join on the fixture.
    val ref = left.join(right, Seq("user"))
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("event_id", "w_start").as[(Long, Long)].collect().toSet
    assert(ref == Set((1L, 100L), (2L, 100L), (2L, 140L), (5L, 0L)))
  }

  test("sessionize: gap-equal stays in-session (session_window convention), one window pass") {
    val ev = Seq(
      (1L, "u1", 0L), (2L, "u1", 100L),   // gap 100 == gap: SAME session
      (3L, "u1", 201L),                   // gap 101 > 100: new session
      (4L, "u1", 301L), (5L, "u1", 301L), // gap 100; equal ts: same session
      (6L, "u2", 50L))                    // other key: its own session 0
      .toDF("event_id", "user", "ts")
    val got = Windows.sessionize(ev, Seq("user"), "ts", gap = 100L,
        tieBreak = Some("event_id"))
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 0L))
    // Both frames (lag + running sum) must share one exchange+sort:
    // exactly one Exchange in the plan.
    val plan = Windows.sessionize(ev, Seq("user"), "ts", 100L,
      Some("event_id")).queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"sessionize must plan exactly one shuffle:\n$plan")
  }

  test("sessionize and sessionAgg agree session-for-session on random data") {
    // The two faces of one convention: batch labels (sessionize) must
    // partition events exactly like the native session_window
    // (sessionAgg) — same session count per key, same member counts,
    // same first-event starts.
    val rnd = new scala.util.Random(11)
    val ev = (1L to 200L).map(i =>
      (i, s"u${rnd.nextInt(5)}", rnd.nextInt(2000).toLong * 1000))
      .toDF("event_id", "user", "ms")
    val gapMs = 60000L
    val labeled = Windows.sessionize(ev, Seq("user"), "ms", gapMs,
        tieBreak = Some("event_id"))
      .groupBy(col("user"), col("session_seq"))
      .agg(count(lit(1)).as("n"), min(col("ms")).as("start_ms"))
      .select(col("user"), col("start_ms"), col("n"))
      .as[(String, Long, Long)].collect().toSet
    val viaNative = Windows.sessionAgg(
        ev.select(col("user"), timestamp_millis(col("ms")).as("ts")),
        Seq("user"), "ts", "60 seconds",
        Seq("n" -> count(lit(1))))
      .select(col("user"), unix_millis(col("session_start")).as("start_ms"),
        col("n"))
      .as[(String, Long, Long)].collect().toSet
    assert(labeled == viaNative && labeled.nonEmpty)
  }

  test("trailing agg: half-open (ts-range, ts] frame, ts peers share frames") {
    val ev = Seq(
      (1L, "u1", 0L, 10.0),
      (2L, "u1", 99L, 5.0),   // sees 1 (age 99 < 100) and itself
      (3L, "u1", 100L, 2.0),  // 1 aged out exactly (age 100): half-open
      (4L, "u1", 100L, 1.0),  // ts peer of 3: same frame, sees 2,3,4
      (5L, "u2", 0L, 7.0))
      .toDF("event_id", "user", "ts", "value")
    val got = Windows.trailingAgg(ev, Seq("user"), "ts", range = 100L,
        aggs = Seq("s" -> (c => sum(c)), "n" -> (c => count(c))),
        value = "value")
      .select("event_id", "s", "n").as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> ((10.0, 1L)),
      2L -> ((15.0, 2L)),
      3L -> ((8.0, 3L)),  // 5 + 2 + 1: event 1 aged out, peer 4 included
      4L -> ((8.0, 3L)),  // identical frame as its ts peer
      5L -> ((7.0, 1L))))
  }

  test("weighted sample: ES top-k equals simulation, plans distributed top-k, bad weight fails loudly") {
    val base = docs.select(col("doc_id"),
      size(graft.ops.TextOps.tokens(col("text"))).cast("double").as("w"))
    val rows = base.withColumn("u", Sampling.hashUniform(col("doc_id"), "graft"))
      .as[(Long, Double, Double)].collect()
    val expected = rows
      .map { case (id, w, u) =>
        (id, BigDecimal(math.pow(u, 1.0 / w))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val sampled = Sampling.weightedSample(base, col("doc_id"), col("w"), 10)
    assert(sampled.select("doc_id").as[Long].collect().toSet == expected)
    assert(sampled.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "weighted sample must plan as distributed top-k, not a global sort")
    // Selection probability must respond to weight: with weights
    // boosted 1000x on half the corpus, that half dominates the draw.
    val boosted = base.withColumn("w",
      when(col("doc_id") % 2 === 0, col("w") * 1000).otherwise(col("w")))
    val picks = Sampling.weightedSample(boosted, col("doc_id"), col("w"), 20)
      .select("doc_id").as[Long].collect()
    assert(picks.count(_ % 2 == 0) >= 15, s"boosted-half picks: ${picks.toSeq}")
    val ex = intercept[Exception] {
      Sampling.weightedSample(
        base.withColumn("w", col("w") - col("w")), // all-zero weights
        col("doc_id"), col("w"), 5).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("weights must be > 0")))
  }

  test("weighted stratified cap: per-stratum ES top-k equals simulation, small strata survive whole") {
    val base = docs.select(col("doc_id"), col("source"),
      size(graft.ops.TextOps.tokens(col("text"))).cast("double").as("w"))
    val rows = base.withColumn("u", Sampling.hashUniform(col("doc_id"), "graft"))
      .as[(Long, String, Double, Double)].collect()
    val k = 3
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      ds.toSeq.map { case (id, src, w, u) =>
        (id, src, BigDecimal(math.pow(u, 1.0 / w))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .sortBy { case (id, _, s) => (-s, id) }.take(k).map(_._1)
    }.toSet
    val got = Sampling.weightedStratifiedCap(base, col("source"),
        col("doc_id"), col("w"), k)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected && got.nonEmpty)
    // A stratum smaller than k keeps all its rows (rank <= k).
    val perSource = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val keptPerSource = base.filter(col("doc_id").isin(got.toSeq: _*))
      .groupBy(col("source")).count().as[(String, Long)].collect().toMap
    perSource.foreach { case (src, n) =>
      assert(keptPerSource.getOrElse(src, 0L) == math.min(n, k), src)
    }
  }

  test("topFracByScore: planted quartile cut, sub-threshold stratum vanishes, real-corpus law vs brute force") {
    // Planted: source A has 8 rows scoring 1..8 -> keep 1/4 = top 2;
    // source B has 3 rows -> rank*4 <= 3 never holds, B vanishes.
    val planted = ((1 to 8).map(i => (i.toLong, "A", i.toDouble)) ++
      (20 to 22).map(i => (i.toLong, "B", 100.0 + i)))
      .toDF("doc_id", "src", "sc")
    val got = Sampling.topFracByScore(planted, col("src"), col("doc_id"),
      col("sc"), 1L, 4L).collect()
    assert(got.map(_.getLong(0)).toSet == Set(8L, 7L))
    assert(got.forall(_.getAs[Long]("n_stratum") == 8L))
    // Tie handling: equal scores break by key ascending.
    val tied = Seq((1L, "A", 5.0), (2L, "A", 5.0), (3L, "A", 5.0),
      (4L, "A", 5.0)).toDF("doc_id", "src", "sc")
    val t = Sampling.topFracByScore(tied, col("src"), col("doc_id"),
      col("sc"), 1L, 4L).collect()
    assert(t.map(_.getLong(0)).toSeq == Seq(1L))
    // Real-corpus law: equals the driver brute force at 1/4 per source.
    val base = docs.select(col("doc_id"), col("source"),
      size(graft.ops.TextOps.tokens(col("text"))).cast("double").as("sc"))
    val rows = base.as[(Long, String, Double)].collect()
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      val sorted = ds.toSeq.sortBy { case (id, _, s) => (-s, id) }
      sorted.zipWithIndex.collect {
        case ((id, _, _), i) if (i + 1) * 4 <= sorted.length => id
      }
    }.toSet
    val kept = Sampling.topFracByScore(base, col("source"), col("doc_id"),
      col("sc"), 1L, 4L).select("doc_id").as[Long].collect().toSet
    assert(kept == expected && kept.nonEmpty)
  }

  test("budget cap: hash-ordered prefix per stratum, >=1 doc kept, fanout invisible") {
    val base = docs.select(col("doc_id"), col("source"),
      size(graft.ops.TextOps.tokens(col("text"))).as("n"))
    val budget = 300L
    // Reference: driver-side simulation of the contract — per source,
    // docs in (hashUniform, doc_id) order while the running total
    // before each doc is under budget.
    val rows = base.withColumn("u", Sampling.hashUniform(col("doc_id"), "graft"))
      .as[(Long, String, Int, Double)].collect()
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      val sorted = ds.toSeq.sortBy(d => (d._4, d._1))
      val cums = sorted.scanLeft(0L)(_ + _._3)
      sorted.zip(cums).collect { case (d, before) if before < budget => d._1 }
    }.toSet
    for (fo <- Seq(1, 3, 8, 64)) {
      val got = Sampling.budgetCap(base, col("source"), col("doc_id"),
          col("n"), budget, fanout = fo)
        .select("doc_id").as[Long].collect().toSet
      assert(got == expected, s"fanout=$fo")
    }
    // Every source keeps at least one doc; overshoot bounded by the
    // last kept doc.
    val kept = base.filter(col("doc_id").isin(expected.toSeq: _*))
      .as[(Long, String, Int)].collect()
    val sources = rows.map(_._2).toSet
    assert(kept.map(_._2).toSet == sources)
    kept.groupBy(_._2).foreach { case (src, ds) =>
      val total = ds.map(_._3.toLong).sum
      assert(total - budget < ds.map(_._3).max,
        s"source $src: total $total exceeds budget by a full doc")
    }
  }

  test("interval overlap join: half-open intersection, exactly once, equals theta reference") {
    val left = Seq(
      ("u1", 100L, 200L, 1L), ("u1", 150L, 300L, 2L), ("u2", 0L, 10L, 3L))
      .toDF("user", "l_start", "l_end", "l_id")
    val right = Seq(
      ("u1", 199L, 250L, 10L), // clips l1's end and sits inside l2
      ("u1", 300L, 400L, 11L), // adjacent to l2 (300 == l_end): no match
      ("u1", 0L, 100L, 12L),   // adjacent to l1 (end == l_start): no match
      ("u2", 5L, 6L, 13L),     // strictly inside l3
      ("u2", 10L, 20L, 14L))   // adjacent to l3: no match
      .toDF("user", "r_start", "r_end", "r_id")
    val expected = Set((1L, 10L), (2L, 10L), (3L, 13L))
    for (bw <- Seq(1L, 7L, 64L, 10000L)) {
      val rows = Joins.intervalOverlapJoin(left, right, Seq("user"),
          "l_start", "l_end", "r_start", "r_end", bw)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSeq
      // Exactly once: multi-bucket pairs must not repeat per shared bucket.
      assert(rows.size == rows.toSet.size, s"duplicates at bucketWidth=$bw")
      assert(rows.toSet == expected, s"bucketWidth=$bw")
    }
    // Theta-join reference on the same fixture.
    val ref = left.join(right, Seq("user"))
      .filter(col("l_start") < col("r_end") && col("r_start") < col("l_end"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(ref == expected)
  }

  test("interval join law: containment and overlap equal theta references on random intervals") {
    val rnd = new scala.util.Random(23)
    val users = Seq("a", "b", "c")
    val points = (1L to 80L).map(i =>
      (i, users(rnd.nextInt(3)), rnd.nextInt(500).toLong))
      .toDF("event_id", "user", "ts")
    def intervals(n: Int, idBase: Long) = (0 until n).map { k =>
      val s = rnd.nextInt(500).toLong
      (idBase + k, users(rnd.nextInt(3)), s, s + rnd.nextInt(120).toLong)
    }
    val right = intervals(40, 100L).toDF("r_id", "user", "w_start", "w_end")
    val leftIv = intervals(30, 500L).toDF("l_id", "user", "l_start", "l_end")
    // Containment: point-in-interval, vs plain range predicate.
    val containRef = points.join(right, Seq("user"))
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("event_id", "r_id").as[(Long, Long)].collect().toSet
    // Overlap: interval-x-interval, vs plain overlap predicate.
    val overlapRef = leftIv.join(right, Seq("user"))
      .filter(col("l_start") < col("w_end") && col("w_start") < col("l_end"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(containRef.nonEmpty && overlapRef.nonEmpty)
    for (bw <- Seq(1L, 13L, 60L, 100000L)) {
      val contain = Joins.intervalJoin(points, right, Seq("user"),
          "ts", "w_start", "w_end", bw)
        .select("event_id", "r_id").as[(Long, Long)].collect().toSeq
      assert(contain.size == contain.toSet.size &&
        contain.toSet == containRef, s"containment bucketWidth=$bw")
      val overlap = Joins.intervalOverlapJoin(leftIv, right, Seq("user"),
          "l_start", "l_end", "w_start", "w_end", bw)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSeq
      assert(overlap.size == overlap.toSet.size &&
        overlap.toSet == overlapRef, s"overlap bucketWidth=$bw")
    }
  }

  test("trailing agg law: equals per-row brute force on random data") {
    val rnd = new scala.util.Random(31)
    val rows = (1L to 120L).map(i =>
      (i, s"u${rnd.nextInt(4)}", rnd.nextInt(300).toLong,
        rnd.nextInt(50).toDouble))
    val df = rows.toDF("event_id", "user", "ts", "value")
    val range = 40L
    val expected = rows.map { case (id, u, ts, _) =>
      val frame = rows.filter(r =>
        r._2 == u && r._3 > ts - range && r._3 <= ts)
      id -> ((frame.map(_._4).sum, frame.size.toLong))
    }.toMap
    val got = Windows.trailingAgg(df, Seq("user"), "ts", range,
        Seq("s" -> (c => sum(c)), "n" -> (c => count(c))), "value")
      .select("event_id", "s", "n").as[(Long, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expected)
  }

  test("vocab profile: exact top-k with deterministic ties, planned as distributed top-k") {
    val prof = TextAnalysis.vocabProfile(docs, 5)
    val got = prof.as[(Int, String, Long, Long)].collect().toSeq
    // Reference: full aggregation + in-memory sort.
    val ref = docs
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("term"), col("doc_id"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cf"), countDistinct(col("doc_id")).as("df"))
      .as[(String, Long, Long)].collect()
      .sortBy { case (t, cf, _) => (-cf, t) }.take(5).zipWithIndex
      .map { case ((t, cf, df), i) => (i + 1, t, cf, df) }.toSeq
    assert(got.sortBy(_._1) == ref)
    // The vocabulary must never be globally sorted: top-k plans as
    // TakeOrderedAndProject (per-partition heads merged on the driver).
    assert(prof.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("vocab profile approx df: identical winners/ranks/cf, df within sketch error") {
    val exact = TextAnalysis.vocabProfile(docs, 10)
      .as[(Int, String, Long, Long)].collect().toSeq
    val approx = TextAnalysis.vocabProfile(docs, 10, approxDf = true)
      .as[(Int, String, Long, Long)].collect().toSeq
    // cf is the ranking key and stays exact: winner set, order, and
    // counts must be bit-identical under the approx-df switch.
    assert(approx.map(t => (t._1, t._2, t._3)) ==
      exact.map(t => (t._1, t._2, t._3)))
    // HLL++ df within ~4 sigma of the 5% default rsd on every winner.
    exact.zip(approx).foreach { case ((_, term, _, dfE), (_, _, _, dfA)) =>
      assert(math.abs(dfA - dfE).toDouble / dfE <= 0.2,
        s"term $term: approx df $dfA vs exact $dfE")
    }
  }

  test("incremental dedup against a saved index equals the direct cross-pair computation") {
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_spec").toString
    Dedup.saveDedupIndex(docs, dir, 3, 64, 16)
    val batch = docs.select((col("doc_id") + 5000L).as("doc_id"), col("text"))
    // Reference: direct string-gram cross Jaccard (no index, no LSH).
    val strIdx = docs.repartition(col("doc_id"))
      .select(col("doc_id"),
        array_distinct(graft.functions.word_shingles(col("text"), 3)).as("sh_arr"))
      .select(col("doc_id"), explode(col("sh_arr")).as("shingle"),
        size(col("sh_arr")).as("n_sh"))
    val expected = strIdx.as("x").join(strIdx.as("y"), col("x.shingle") === col("y.shingle"))
      .groupBy((col("x.doc_id") + 5000L).as("doc_id"), col("y.doc_id").as("dup_of"))
      .agg(count(lit(1)).as("c"),
        first(col("x.n_sh")).as("n_a"), first(col("y.n_sh")).as("n_b"))
      .select(col("doc_id"), col("dup_of"),
        (col("c").cast("double") / (col("n_a") + col("n_b") - col("c"))).as("j"))
      .filter(col("j") >= 0.8)
      .as[(Long, Long, Double)].collect().toSet
    val got = Dedup.dedupAgainstIndex(batch, dir, 0.8, 3, 64, 16)
      .as[(Long, Long, Double)].collect().toSet
    assert(expected.nonEmpty && got == expected)
    // Identity pairs (batch doc vs its corpus original) all present.
    val nDocs = docs.count()
    assert(got.count { case (a, b, j) => a == b + 5000L && j == 1.0 } == nDocs)
    // Estimate mode: identity pairs estimate J=1 exactly (identical
    // signatures); scores are estimates, candidates the same machinery.
    val est = Dedup.dedupAgainstIndex(batch, dir, 0.8, 3, 64, 16,
      exactVerify = false)
      .as[(Long, Long, Double)].collect()
    assert(est.count { case (a, b, j) => a == b + 5000L && j == 1.0 } == nDocs)
  }

  test("line dedup: first occurrence kept, boilerplate cut, blanks exempt, round-trip intact") {
    val fixture = Seq(
      (1L, "COMPANY HEADER\n\nunique first line\nshared body\nCOMPANY FOOTER"),
      (2L, "COMPANY HEADER\n\nanother doc entirely\nshared body\nCOMPANY FOOTER"),
      (3L, "totally original\n\ncontent here"),
      (4L, "COMPANY HEADER\nCOMPANY FOOTER")).toDF("doc_id", "text")
    val out = Dedup.dedupLines(fixture)
      .select("doc_id", "text", "n_lines", "n_removed")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // Doc 1 owns the first occurrence of every shared line: untouched.
    assert(out(1L) == ((1L, "COMPANY HEADER\n\nunique first line\nshared body\nCOMPANY FOOTER", 5L, 0L)))
    // Doc 2 loses header/body/footer copies, keeps blanks + own lines.
    assert(out(2L) == ((2L, "\nanother doc entirely", 5L, 3L)))
    // Doc 3 shares nothing: untouched.
    assert(out(3L) == ((3L, "totally original\n\ncontent here", 3L, 0L)))
    // Doc 4 is pure boilerplate: everything cut, row still emitted.
    assert(out(4L) == ((4L, "", 2L, 2L)))
    // Identity on the line-structure-free gate corpus (round-trip).
    val idMismatch = Dedup.dedupLines(docs).as("o")
      .join(docs.as("i"), col("o.doc_id") === col("i.doc_id"))
      .filter(col("o.text") =!= col("i.text") || col("o.n_removed") =!= 0)
    assert(idMismatch.count() == 0)
  }

  test("sequence packing: deterministic, partitioning-invariant, next-fit budget bound") {
    val budget = 2000L
    def pack(df: org.apache.spark.sql.DataFrame) =
      Sampling.packSequences(df, col("doc_id"), char_length(col("text")),
        budget, buckets = 4, seed = "s1")
        .select(col("doc_id"), col("pack_id"),
          char_length(col("text")).cast("long").as("n_tok"))
    val a = pack(docs).as[(Long, Long, Long)].collect().toSet
    val b = pack(docs.repartition(13)).as[(Long, Long, Long)].collect().toSet
    assert(a.nonEmpty && a == b) // pure function of (key, seed)

    // Every doc in exactly one pack.
    assert(a.toSeq.map(_._1).distinct.size == a.size)

    // Next-fit bound: a pack overshoots the budget by at most its
    // largest member — total − max_member < budget for every pack.
    val byPack = a.groupBy(_._2).values
    assert(byPack.forall { rows =>
      val toks = rows.map(_._3)
      toks.sum - toks.max < budget
    })
    // Packing actually packs: multi-doc packs exist on this corpus.
    assert(byPack.exists(_.size > 1))
  }

  test("hash sampling is deterministic and partitioning-invariant") {
    val s1 = Sampling.bernoulliSample(docs, col("doc_id"), 0.25, "s1")
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.bernoulliSample(docs.repartition(17), col("doc_id"), 0.25, "s1")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2) // df.sample() cannot make this promise
    assert(s1.nonEmpty && s1.size < docs.count())
    // A different seed draws a genuinely different sample.
    val s3 = Sampling.bernoulliSample(docs, col("doc_id"), 0.25, "s2")
      .select("doc_id").as[Long].collect().toSet
    assert(s1 != s3)
    // Rate is honored within binomial noise (n=100, p=0.25 → σ≈4.3;
    // ±6σ keeps the assertion deterministic-in-practice).
    val n = docs.count().toDouble
    assert(math.abs(s1.size - 0.25 * n) < 6 * math.sqrt(n * 0.25 * 0.75))
  }

  test("repetition stats: hand-computed bigram fractions; short docs absent") {
    val d = Seq(
      (0L, "a b a b a"), // bigrams: ab, ba, ab, ba → 4 total, 2 distinct
      (1L, "x y z"),     // bigrams: xy, yz → no repeats
      (2L, "solo")       // < 2 tokens → no bigrams, absent from result
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(d, 2)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(r.keySet == Set(0L, 1L))
    assert(r(0L) == ((0L, 4L, 2L, 0.5, 0.5)))
    assert(r(1L) == ((1L, 2L, 2L, 0.5, 0.0)))
  }

  test("native gram_stats equals the relational explode→groupBy spelling on random corpora") {
    val rnd = new scala.util.Random(20260812L)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "longword", "x9", "zz")
    val rows = (0L until 60L).map { id =>
      val nTok = rnd.nextInt(12) // includes 0- and 1-token docs (no bigrams)
      (id, Seq.fill(nTok)(vocab(rnd.nextInt(vocab.size))).mkString("  ") +
        (if (rnd.nextBoolean()) " " else ""))
    }
    val d = rows.toDF("doc_id", "text")
    val native = TextAnalysis.repetitionStats(d, 2)
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    val relational = d.select(col("doc_id"),
        explode(graft.functions.word_shingles(col("text"), 2)).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_grams"), count(lit(1)).as("n_distinct_grams"),
        (max(col("cnt")).cast("double") / sum(col("cnt"))).as("top_gram_frac"),
        ((sum(col("cnt")) - count(lit(1))).cast("double") / sum(col("cnt")))
          .as("dup_gram_frac"))
      .as[(Long, Long, Long, Double, Double)].collect().toSet
    assert(native == relational) // bit-exact, including the double divisions
  }

  test("PII redaction: planted URL/email/IP/phone replaced, counted; clean text untouched") {
    val d = Seq(
      (1L, "contact me at alice@example.com or +1(555)123-4567 today"),
      (2L, "see https://example.com/a?b=c#d and host 10.0.0.1 ok"),
      (3L, "no pii here at all")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.redact(d)
      .as[(Long, String, Int)].collect().map(t => t._1 -> t).toMap
    assert(r(1L)._2 == "contact me at <EMAIL> or <PHONE> today")
    assert(r(1L)._3 == 2)
    assert(r(2L)._2 == "see <URL> and host <IP> ok")
    assert(r(2L)._3 == 2)
    assert(r(3L)._2 == "no pii here at all" && r(3L)._3 == 0)
    // The text_redact gate's planted forms (synthesized from doc_id
    // arithmetic) each match their pattern — the non-vacuity
    // guarantee: the gate can never pass with zero redactions.
    val planted = Seq((42L, "base Contact user42@mail0.example.com " +
      "via https://track2.example.org/u/42 or +18881000042 " +
      "from 10.42.42.42."))
      .toDF("doc_id", "text")
    val pr = TextAnalysis.redact(planted)
      .as[(Long, String, Int)].collect().head
    assert(pr._2 == "base Contact <EMAIL> via <URL> or <PHONE> " +
      "from <IP>.")
    assert(pr._3 == 4)
  }

  test("compress ratio: repetitive < prose < random; deterministic; empty = 1.0") {
    val rnd = new scala.util.Random(7L)
    val d = Seq(
      (1L, "spam " * 200),
      (2L, "the quick brown fox jumps over the lazy dog and keeps going " * 5),
      (3L, Seq.fill(1000)(rnd.nextPrintableChar()).mkString),
      (4L, "")
    ).toDF("doc_id", "text")
    def run() = d.select(col("doc_id"),
        graft.functions.compress_ratio(col("text")).as("cr"))
      .as[(Long, Double)].collect().toMap
    val r = run()
    assert(r(1L) < r(2L) && r(2L) < r(3L))
    assert(r(1L) < 0.1)          // degenerate repetition compresses away
    assert(r(3L) > 0.7)          // near-random barely compresses
    assert(r(4L) == 1.0)
    assert(run() == r)           // deterministic
  }

  test("native trigram_scores equals the replace-arithmetic spelling (random + real corpus)") {
    // Random soup over needle fragments maximizes overlap cases
    // (self-overlapping needles, shared prefixes, multi-language hits).
    val rnd = new scala.util.Random(43L)
    val frags = Vector("the", " th", "de ", " de", "ent", "er ", "und",
      "le ", "que", " a", "e", " ", "x", "ä", "ß")
    val rows = (0L until 80L).map { id =>
      (id, "en", Seq.fill(rnd.nextInt(40))(frags(rnd.nextInt(frags.size))).mkString)
    }
    val d = rows.toDF("doc_id", "lang", "text")
    def collectAll(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Long, Long, Long, String)].collect().toSet
    assert(collectAll(TextAnalysis.langIdNgram(d)) ==
      collectAll(TextAnalysis.langIdNgramDeclarative(d)))
    assert(collectAll(TextAnalysis.langIdNgram(docs)) ==
      collectAll(TextAnalysis.langIdNgramDeclarative(docs)))
  }

  test("native marker_counts equals the filter-HOF spelling (random + real corpus)") {
    val rnd = new scala.util.Random(44L)
    val vocab = Vector("the", "und", "le", "der", "a", "of", "zz", "est",
      "is", "la", "THE", "Und", "", "x")
    val rows = (0L until 80L).map { id =>
      (id, Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size)))
        .mkString(if (rnd.nextBoolean()) " " else "  "))
    }
    val d = rows.toDF("doc_id", "text")
    val lists = Seq(TextAnalysis.stopwordsEn, TextAnalysis.stopwordsDe,
      TextAnalysis.stopwordsFr)
    def native(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
        graft.functions.marker_counts(col("text"), lists).as("mc"))
      .as[(Long, Seq[Long])].collect().toSet
    def declarative(df: org.apache.spark.sql.DataFrame) = {
      val toks = TextOps.tokens(col("text"))
      df.select(col("doc_id"), array(
          lists.map(w => TextAnalysis.markerCount(toks, w).cast("long")): _*))
        .as[(Long, Seq[Long])].collect().toSet
    }
    assert(native(d) == declarative(d))
    assert(native(docs) == declarative(docs))
  }

  test("token-index natives are byte-identical to the text path (word_tokens/array_shingles/array_gram_stats)") {
    val rnd = new scala.util.Random(48L)
    val frags = Vector("the", "cat", "", " ", "  ", "DOG dog", "\tx",
      "aß É", "1 2 3", "repeat repeat repeat")
    val rows = (0L until 80L).map { id =>
      (id, Seq.fill(rnd.nextInt(12))(frags(rnd.nextInt(frags.size)))
        .mkString(" "))
    }
    for (d <- Seq(rows.toDF("doc_id", "text"), docs.select("doc_id", "text"))) {
      val toks = graft.functions.word_tokens(col("text"))
      val cmp = d.select(
        toks === TextOps.tokens(col("text")),
        graft.functions.array_shingles(toks, 3) ===
          graft.functions.word_shingles(col("text"), 3),
        graft.functions.array_shingles(toks, 13) ===
          graft.functions.word_shingles(col("text"), 13),
        graft.functions.array_gram_stats(toks, 2) ===
          graft.functions.gram_stats(col("text"), 2))
        .as[(Boolean, Boolean, Boolean, Boolean)].collect()
      assert(cmp.nonEmpty && cmp.forall(t => t._1 && t._2 && t._3 && t._4))
    }
  }

  test("token-index ops equal their text-path twins (quality/dedup/decontam)") {
    val base = docs.repartition(col("doc_id"))
      .select(col("doc_id"), graft.functions.word_tokens(col("text")).as("toks"))
      .localCheckpoint()
    val evalDocs = docs.filter(col("doc_id") % 100 === 7)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    def set(df: org.apache.spark.sql.DataFrame, cols: String*) =
      df.select(cols.head, cols.tail: _*).collect().toSet
    assert(set(TextAnalysis.qualityFilterFromTokens(base), "doc_id", "n_tokens",
        "top_gram_frac", "dup_gram_frac", "keep") ==
      set(TextAnalysis.qualityFilter(docs), "doc_id", "n_tokens",
        "top_gram_frac", "dup_gram_frac", "keep"))
    assert(set(Dedup.ngramJaccardPairsFromTokens(base, 3, 0.8, 10),
        "id_a", "id_b", "jaccard") ==
      set(Dedup.ngramJaccardPairs(docs, 3, 0.8, 10), "id_a", "id_b", "jaccard"))
    // Tokens-path equi-join fallback (forced zero broadcast budget)
    // must agree too — Curation.pipeline runs this path in production.
    assert(set(Dedup.ngramJaccardPairsFromTokens(base, 3, 0.8, 10,
        maxBroadcastHotShingles = 0L), "id_a", "id_b", "jaccard") ==
      set(Dedup.ngramJaccardPairs(docs, 3, 0.8, 10), "id_a", "id_b", "jaccard"))
    assert(set(Decontamination.flagContaminatedFromTokens(base, evalDocs, 5),
        "doc_id", "n_hits") ==
      set(Decontamination.flagContaminated(docs, evalDocs, 5), "doc_id", "n_hits"))
  }

  test("marker_counts: a word duplicated within one language's list counts each token once") {
    val d = Seq((1L, "the cat the")).toDF("doc_id", "text")
    val dup = Seq(Seq("the", "cat", "the"), Seq("und"))
    val clean = Seq(Seq("the", "cat"), Seq("und"))
    def run(lists: Seq[Seq[String]]) = d.select(
        graft.functions.marker_counts(col("text"), lists))
      .as[Seq[Long]].collect().head
    assert(run(dup) == run(clean))
    assert(run(dup) == Seq(3L, 0L))
  }

  test("native ascii_class_counts equals the regex-strip spelling (incl. multibyte text)") {
    val rnd = new scala.util.Random(45L)
    val chars = "ab.!? ,;:Zz09\t\n\u000B\f\räßé€—".toVector
    val rows = (0L until 80L).map { id =>
      (id, Seq.fill(rnd.nextInt(200))(chars(rnd.nextInt(chars.size))).mkString)
    }
    val d = rows.toDF("doc_id", "text")
    val classes = Seq(".!?,;:",
      (('a' to 'z') ++ ('A' to 'Z')).mkString, " \t\n\u000B\f\r")
    val native = d.select(col("doc_id"),
        graft.functions.ascii_class_counts(col("text"), classes).as("cc"))
      .as[(Long, Seq[Long])].collect().toSet
    val declarative = d.select(col("doc_id"), array(
        char_length(regexp_replace(col("text"), "[^.!?,;:]", "")).cast("long"),
        char_length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("long"),
        char_length(col("text")).cast("long") -
          char_length(regexp_replace(col("text"), "\\s", "")).cast("long")))
      .as[(Long, Seq[Long])].collect().toSet
    assert(native == declarative)
  }

  test("native bpe_token_count equals regexp_count(bpePattern) on adversarial soup") {
    val rnd = new scala.util.Random(46L)
    // Fragments chosen to hit every lexer branch and boundary:
    // contractions (valid + near-miss), space-prefixed runs, double
    // spaces, tab/CR/FF, apostrophe runs, digits, multibyte.
    val frags = Vector("'s", "'t", "'re", "'ve", "'m", "'ll", "'d", "'l",
      "'x", "''", "'", "don't", "a", "Zz", "42", " ", "  ", "\t", "\r",
      "\f", "!?", ".", "é", "ß€", "deß", "9a", "a9", " 'q", "x ")
    val rows = (0L until 120L).map { id =>
      (id, Seq.fill(rnd.nextInt(30))(frags(rnd.nextInt(frags.size))).mkString)
    }
    val d = rows.toDF("doc_id", "text")
    val native = d.select(col("doc_id"),
        graft.functions.bpe_token_count(col("text"))).as[(Long, Long)]
      .collect().toMap
    val regex = d.select(col("doc_id"),
        regexp_count(col("text"), lit(TextAnalysis.bpePattern)).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(native == regex)
    // And on the real corpus.
    val nd = docs.select(col("doc_id"),
        graft.functions.bpe_token_count(col("text"))).as[(Long, Long)]
      .collect().toMap
    val rd = docs.select(col("doc_id"),
        regexp_count(col("text"), lit(TextAnalysis.bpePattern)).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(nd == rd)
  }

  test("null text rows flow through the text projections without crashing") {
    val d = Seq((1L, "some perfectly fine text here"), (2L, null))
      .toDF("doc_id", "text")
    // gram_stats is null-intolerant → null struct → filtered out.
    assert(TextAnalysis.repetitionStats(d, 2).count() == 1)
    // qualityFilter keeps the row with null signals and a null verdict
    // (SQL three-valued logic — never silently 'keep').
    val q = TextAnalysis.qualityFilter(d).where(col("doc_id") === 2).collect().head
    assert(q.isNullAt(q.fieldIndex("keep")))
    // redact propagates the null text, zero redactions reported as null.
    val r = TextAnalysis.redact(d).where(col("doc_id") === 2).collect().head
    assert(r.isNullAt(r.fieldIndex("text")))
  }

  test("quality filter: each rule fires independently, verdicts auditable") {
    val d = Seq(
      (0L, Seq.fill(30)("w").zipWithIndex.map(t => t._1 + t._2).mkString(" ")), // 30 distinct tokens → keep
      (1L, "too short"),                            // fails minTokens
      (2L, ("spam " * 40).trim),                    // one bigram repeated → fails repetition caps
      (3L, Seq.tabulate(60)(i => "t" + (i % 50)).mkString(" ")) // mild repeats → keep
    ).toDF("doc_id", "text")
    val r = TextAnalysis.qualityFilter(d, minTokens = 25, maxTokens = 1000,
        maxTopGramFrac = 0.09, maxDupGramFrac = 0.5)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(r == Map(0L -> true, 1L -> false, 2L -> false, 3L -> true))
    // All docs present (filter is auditable, not destructive).
    assert(TextAnalysis.qualityFilter(d).count() == 4)
  }

  test("stratified cap keeps exactly k per stratum, deterministically") {
    val capped = Sampling.stratifiedCap(docs, col("source"), col("doc_id"), 3, "s1")
    val bySource = capped.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySource.values.forall(_ == 3L)) // sf0.001 has >3 docs per source
    // Partitioning-invariant: same rows, same ranks, on a reshuffled input.
    val a = capped.select("doc_id", "stratum_rank")
      .as[(Long, Int)].collect().toSet
    val b = Sampling.stratifiedCap(docs.repartition(11), col("source"),
        col("doc_id"), 3, "s1")
      .select("doc_id", "stratum_rank").as[(Long, Int)].collect().toSet
    assert(a == b)
  }

  test("stratified cap: two-phase plan bounds every sort, output identical to the single-sort spelling") {
    import org.apache.spark.sql.expressions.Window
    // Skewed input: a hot stratum holding ~99% of rows, the shape that
    // used to serialize one full-stratum sort on one task.
    val skew = spark.range(0, 20000).select(
      when(col("id") % 100 === 0, concat(lit("s"), col("id") % 5))
        .otherwise(lit("hot")).as("stratum"),
      col("id").as("k"))
    // singlePhaseMaxBytes = 0: pretend the frame is huge so the spec
    // exercises the bucketed plan the adaptive path picks at scale.
    val capped = Sampling.stratifiedCap(skew, col("stratum"), col("k"), 7, "sx",
      singlePhaseMaxBytes = 0L)
    val w = Window.partitionBy(col("stratum"))
      .orderBy(Sampling.hashUniform(col("k"), "sx").asc, col("k").asc)
    val ref = skew.withColumn("stratum_rank", row_number().over(w))
      .filter(col("stratum_rank") <= 7)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("stratum", "k", "stratum_rank")
        .as[(String, Long, Int)].collect().toSet
    assert(rows(capped) == rows(ref) && rows(capped).nonEmpty)
    // Plan shape: phase 1's window partitions by (stratum, bucket) —
    // the hot stratum's sort is split across the bucket fan-out, so no
    // single task ever sorts a full stratum (phase 2's per-stratum sort
    // sees at most fanout*k survivor rows by construction).
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("_cap_bucket_0"), s"expected bucketed phase-1 window:\n$plan")
  }

  test("stratified cap: small inputs adaptively take the single-window plan") {
    // A frame whose optimizer size estimate fits one task's sort
    // budget cannot contain a hot stratum, so the cap must skip the
    // bucketed phase (which would sort the whole frame twice).
    val small = spark.range(0, 5000).select(
      concat(lit("s"), col("id") % 7).as("stratum"), col("id").as("k"))
    val plan = Sampling.stratifiedCap(small, col("stratum"), col("k"), 9, "sp")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("_cap_bucket_0"),
      s"small input should use the single-window spelling:\n$plan")
    // And the forced-two-phase twin agrees row-for-row.
    val a = Sampling.stratifiedCap(small, col("stratum"), col("k"), 9, "sp")
      .select("stratum", "k", "stratum_rank")
      .as[(String, Long, Int)].collect().toSet
    val b = Sampling.stratifiedCap(small, col("stratum"), col("k"), 9, "sp",
        singlePhaseMaxBytes = 0L)
      .select("stratum", "k", "stratum_rank")
      .as[(String, Long, Int)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("stratified cap: two-phase == single-sort across k and fanout configurations") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(51L)
    val data = (0L until 3000L).map(i => (s"s${rnd.nextInt(7)}", i))
    val df = data.toDF("stratum", "k")
    val w = Window.partitionBy(col("stratum"))
      .orderBy(Sampling.hashUniform(col("k"), "cfg").asc, col("k").asc)
    // singlePhaseMaxBytes = 0 forces the BUCKETED spelling for the
    // fanout > 1 grid points (the tiny local frame would otherwise
    // take the adaptive single-window plan at every config, comparing
    // the reference to itself). fanout = 1 short-circuits to the
    // single-window spelling by contract regardless of the budget —
    // those grid points pin the explicit-force path, not the bucketed
    // one. The adaptive dispatch equivalence is pinned by the "small
    // inputs" test above.
    for (k <- Seq(1, 3, 17); fanout <- Seq(1, 2, 64)) {
      val capped = Sampling
        .stratifiedCap(df, col("stratum"), col("k"), k, "cfg", fanout,
          singlePhaseMaxBytes = 0L)
        .select("stratum", "k", "stratum_rank")
        .as[(String, Long, Int)].collect().sorted.toSeq
      val ref = df.withColumn("stratum_rank", row_number().over(w))
        .filter(col("stratum_rank") <= k)
        .select("stratum", "k", "stratum_rank")
        .as[(String, Long, Int)].collect().sorted.toSeq
      assert(capped == ref, s"k=$k fanout=$fanout")
    }
  }

  test("mixture sampling: per-stratum rates, deterministic, monotone in rate") {
    // Rate 0 for src0 and 1.0 default: exact, fully deterministic result.
    val r = Sampling.mixtureSample(docs, col("source"), col("doc_id"),
      Map("src0" -> 0.0), defaultRate = 1.0, seed = "s1")
    val all = docs.select("doc_id", "source").as[(Long, String)].collect()
    val kept = r.select("doc_id").as[Long].collect().toSet
    assert(kept == all.filter(_._2 != "src0").map(_._1).toSet)
    // Same uniform underneath: a lower rate selects a subset of a
    // higher rate's selection, per stratum.
    val lo = Sampling.mixtureSample(docs, col("source"), col("doc_id"),
      Map("src1" -> 0.3), 0.2, "s1").select("doc_id").as[Long].collect().toSet
    val hi = Sampling.mixtureSample(docs, col("source"), col("doc_id"),
      Map("src1" -> 0.6), 0.5, "s1").select("doc_id").as[Long].collect().toSet
    assert(lo.subsetOf(hi))
  }

  test("curation pipeline: verdicts agree with the component operators") {
    val eval = docs.filter(col("doc_id") < 10)
    val out = Curation.pipeline(docs, eval,
        shingleN = 3, jaccard = 0.8, maxShingleDf = 10, decontamN = 5,
        minTokens = 25, maxTokens = 1000,
        maxTopGramFrac = 0.09, maxDupGramFrac = 0.09)
      .as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.size == docs.count()) // every doc gets a verdict row
    // keep is exactly the conjunction of the three flags.
    out.values.foreach { case (_, q, l, c, k) => assert(k == (q && !l && !c)) }
    // Flags match the standalone operators.
    val losers = Dedup.components(
        Dedup.ngramJaccardPairs(docs, 3, 0.8, maxShingleDf = 10))
      .filter(col("component_id") =!= col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(out.filter(_._2._3).keySet == losers)
    val contam = Decontamination.flagContaminated(docs, eval, 5)
      .select("doc_id").as[Long].collect().toSet
    assert(out.filter(_._2._4).keySet == contam)
    // Eval docs self-flag as contaminated (they share their own grams).
    assert(eval.select("doc_id").as[Long].collect().toSet.subsetOf(contam))
  }

  test("curation funnel: per-source counts replay the verdict frame; staged survivors telescope") {
    val eval = docs.filter(col("doc_id") < 10)
    val verdicts = Curation.pipeline(docs, eval,
      shingleN = 3, jaccard = 0.8, maxShingleDf = 10, decontamN = 5,
      minTokens = 25, maxTokens = 1000,
      maxTopGramFrac = 0.09, maxDupGramFrac = 0.09)
    val got = Curation.funnel(verdicts, docs)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // Independent replay: aggregate the collected verdict frame by the
    // collected source map.
    val src = docs.select("doc_id", "source").as[(Long, String)].collect().toMap
    val v = verdicts.as[(Long, Boolean, Boolean, Boolean, Boolean)].collect()
    val bySrc = v.groupBy(r => src(r._1))
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (s, rows) =>
      val (_, nDocs, nQf, nDl, nCo, nAq, nAd, nK) = got(s)
      assert(nDocs == rows.length)
      assert(nQf == rows.count(!_._2))
      assert(nDl == rows.count(_._3))
      assert(nCo == rows.count(_._4))
      assert(nAq == rows.count(_._2))
      assert(nAd == rows.count(r => r._2 && !r._3))
      assert(nK == rows.count(_._5))
      // Funnel law: staged survivor counts telescope.
      assert(nDocs >= nAq && nAq >= nAd && nAd >= nK)
    }
    // Totals cover the corpus exactly once.
    assert(got.values.map(_._2).sum == docs.count())
  }

  test("splitLeakage: planted cross-split near-dup pair found; same-split twin suppressed; report counts exact") {
    val w = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    // Derive split membership from the REAL assignment function so the
    // plant can't drift from the hash: pick ids landing in different
    // splits (a,b) and in the same split (c,d).
    val ids = (0L until 200L).toDF("doc_id")
    val sp = Sampling.splitAssign(ids, col("doc_id"), w, "s1")
      .as[(Long, String)].collect().toMap
    val a = sp.keys.find(sp(_) == "train").get
    val b = sp.keys.find(sp(_) == "test").get
    val Seq(c, d) = sp.keys.toSeq.sorted.filter(sp(_) == "train").take(2)
    require(Set(a, b, c, d).size == 4)
    val near = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near2 = near + " extra"
    val docsP = Seq(
      (a, near), (b, near2),                 // cross-split near-dup pair
      (c, "one two three four five six seven eight nine ten"),
      (d, "one two three four five six seven eight nine ten eleven"),
      (999L, "totally unrelated text about nothing shared with others")
    ).toDF("doc_id", "text")
    val splits = Sampling.splitAssign(docsP, col("doc_id"), w, "s1")
      .select(col("doc_id"), col("split"))
    val leaks = Curation.splitLeakage(docsP, splits, shingleN = 3,
      jaccard = 0.5).collect()
    assert(leaks.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((math.min(a, b), math.max(a, b))))
    val r0 = leaks.head
    assert(Set(r0.getAs[String]("split_a"), r0.getAs[String]("split_b")) ==
      Set("train", "test"))
    val rep = Curation.splitLeakageReport(docsP, splits, shingleN = 3,
      jaccard = 0.5).collect()
    assert(rep.length == 1)
    assert(rep.head.getAs[String]("split_lo") == "test" &&
      rep.head.getAs[String]("split_hi") == "train")
    assert(rep.head.getAs[Long]("n_pairs") == 1L &&
      rep.head.getAs[Long]("n_docs") == 2L)
  }

  test("splitLeakage laws on the real corpus: leaks = pairs minus same-split; source-keyed split leaks no same-source pair") {
    val w = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val splits = Sampling.splitAssign(docs, col("doc_id"), w, "s1")
      .select(col("doc_id"), col("split"))
    val leaks = Curation.splitLeakage(docs, splits, shingleN = 3,
      jaccard = 0.5).collect()
    // Independent replay: all pairs at the same threshold, split map
    // collected, filter in the driver.
    val pairs = Dedup.ngramJaccardPairs(docs, 3, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty, "law needs near-dup pairs at J>=0.5")
    val spMap = splits.as[(Long, String)].collect().toMap
    val want = pairs.filter(p => spMap(p._1) != spMap(p._2))
      .map(p => (p._1, p._2)).toSet
    assert(leaks.map(r => (r.getLong(0), r.getLong(1))).toSet == want)
    assert(want.nonEmpty, "law is vacuous without a straddling pair")
    // Splits carried on each row match the assignment.
    leaks.foreach { r =>
      assert(r.getAs[String]("split_a") == spMap(r.getLong(0)))
      assert(r.getAs[String]("split_b") == spMap(r.getLong(1)))
    }
    // Source-keyed split: same-source near-dup pairs CANNOT straddle.
    val bySource = Sampling.splitAssign(docs, col("source"), w, "s1")
      .select(col("doc_id"), col("split"))
    val srcOf = docs.select(col("doc_id"), col("source"))
      .as[(Long, String)].collect().toMap
    Curation.splitLeakage(docs, bySource, shingleN = 3, jaccard = 0.5)
      .collect().foreach { r =>
        assert(srcOf(r.getLong(0)) != srcOf(r.getLong(1)),
          "same-source pair straddled a source-keyed split")
      }
  }

  test("writeCurated materializes exactly the keepers, split-partitioned, stable splits") {
    val eval = docs.filter(col("doc_id") < 10)
    val verdicts = Curation.pipeline(docs, eval,
      shingleN = 3, jaccard = 0.8, maxShingleDf = 10, decontamN = 5,
      minTokens = 25, maxTokens = 1000,
      maxTopGramFrac = 0.09, maxDupGramFrac = 0.09)
    val dir = java.nio.file.Files.createTempDirectory("curated").toString
    val w = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    Curation.writeCurated(docs, verdicts, dir, w, "s1")
    val back = spark.read.parquet(dir)
    val keepers = verdicts.where("keep").select("doc_id").as[Long].collect().toSet
    assert(back.select("doc_id").as[Long].collect().toSet == keepers)
    assert(keepers.nonEmpty && keepers.size < docs.count())
    // Splits are the deterministic assignment — identical to calling
    // splitAssign directly on the survivors.
    val expected = Sampling.splitAssign(docs, col("doc_id"), w, "s1")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    back.select("doc_id", "split").as[(Long, String)].collect()
      .foreach { case (id, s) => assert(expected(id) == s) }
  }

  test("split assignment is total, disjoint, stable, and weight-proportional") {
    val w = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val a = Sampling.splitAssign(docs, col("doc_id"), w, "s1")
      .select("doc_id", "split").as[(Long, String)].collect()
    assert(a.length == docs.count()) // total: every row assigned once
    assert(a.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // Stable: same assignment on re-run and re-partitioning.
    val b = Sampling.splitAssign(docs.repartition(13), col("doc_id"), w, "s1")
      .select("doc_id", "split").as[(Long, String)].collect()
    assert(a.toMap == b.toMap)
    // Proportions within ±6σ of the weights.
    val byS = a.groupBy(_._2).view.mapValues(_.length).toMap
    val n = a.length.toDouble
    w.foreach { case (name, p) =>
      assert(math.abs(byS.getOrElse(name, 0) - p * n) < 6 * math.sqrt(n * p * (1 - p)),
        s"$name count ${byS.getOrElse(name, 0)} far from ${p * n}")
    }
  }

  test("duplicated spans: maximal cross-doc runs, within-doc repeats exempt, disjoint spans split") {
    // 3-grams; words are single letters so span arithmetic is easy to
    // hand-check. Docs 1/2 share "c d e f g" (3 gram starts at words
    // 2..4 -> one span [2,7) in doc 1, [0,5) in doc 2); docs 1/3 share
    // the tail "x y z" (word 8..10 in doc 1 -> span [8,11)); doc 4
    // repeats its own trigram twice but shares nothing cross-doc; doc
    // 5 is disjoint vocabulary.
    val fixture = Seq(
      (1L, "a b c d e f g h x y z"),
      (2L, "c d e f g q r"),
      (3L, "p q2 w x y z"),
      (4L, "m n o m n o m n o"),
      (5L, "s1 s2 s3 s4 s5")).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(fixture, n = 3)
      .select("doc_id", "span_start", "span_end", "n_words")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set(
      (1L, 2L, 7L, 5L), (1L, 8L, 11L, 3L),
      (2L, 0L, 5L, 5L),
      (3L, 3L, 6L, 3L)))
    // Self-repetition never flags (doc 4), disjoint vocab never flags
    // (doc 5) — already implied by the exact set above.

    // Consistency law on the real corpus: every reported span is
    // within doc bounds, at least n words, and its grams really do
    // recur in another document (spot-check via the gram frame).
    val n = 4
    val out = Dedup.duplicatedSpans(docs, n)
    val toks = docs.select(col("doc_id"),
      size(graft.functions.word_tokens(col("text"))).as("n_toks"))
    val bad = out.join(toks, "doc_id")
      .filter(col("span_start") < 0 || col("span_end") > col("n_toks") ||
        col("n_words") < n || col("n_words") =!= col("span_end") - col("span_start"))
    assert(bad.count() == 0)
    // Spans are maximal: no two spans of one doc touch or overlap.
    val overlapping = out.as("a").join(out.as("b"),
      col("a.doc_id") === col("b.doc_id") &&
        col("a.span_start") < col("b.span_start") &&
        col("b.span_start") <= col("a.span_end"))
    assert(overlapping.count() == 0)
  }

  test("trigram LM score: hand-computed model, unseen text scores zero, sub-trigram docs drop") {
    val fx = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "ab")).toDF("doc_id", "text")
    // Model over fx itself: "aaa"×3 (two from doc 1, one from doc 2),
    // "aab"×1; total 4. Doc 3 has no trigram and must vanish.
    val out = TextAnalysis.lmScore(fx)
      .select("doc_id", "n_tri", "sum_cnt", "avg_p")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((1L, 2L, 6L, 6.0 / 2 / 4)))
    assert(out(2L) == ((2L, 2L, 4L, 4.0 / 2 / 4)))
    // Cross-corpus scoring with a disjoint reference: all unseen.
    val ref = Seq((9L, "zzzz")).toDF("doc_id", "text")
    val cross = TextAnalysis.lmScore(fx, ref)
      .select("doc_id", "sum_cnt", "avg_p", "log_prob")
      .as[(Long, Long, Double, Double)].collect()
    assert(cross.forall(r => r._2 == 0L && r._3 == 0.0))
    assert(cross.forall(_._4 < 0)) // smoothed log-likelihood stays finite
    // EMPTY reference model (no trigrams at all): both paths agree on
    // NULL avg_p/log_prob — not 0/0 NaN or log(0) infinities.
    val emptyRef = Seq((8L, "xy")).toDF("doc_id", "text") // sub-trigram
    Seq(TextAnalysis.lmScore(fx, emptyRef),               // native path
        TextAnalysis.lmScore(fx, emptyRef, maxBroadcastModel = -1L)) // fallback
      .foreach { scoredEmpty =>
        val rows = scoredEmpty
          .select("doc_id", "n_tri", "sum_cnt", "avg_p", "log_prob").collect()
        assert(rows.length == 2) // docs 1 and 2 still have trigrams
        assert(rows.forall(r => r.getLong(2) == 0L &&
          r.isNullAt(3) && r.isNullAt(4)))
      }
    // Self-scored real corpus: every doc's mean trigram count ≥ 1
    // (each trigram counts at least itself) and log_prob is finite.
    val real = TextAnalysis.lmScore(docs)
    assert(real.filter(col("sum_cnt") < col("n_tri")).count() == 0)
    assert(real.filter(col("log_prob").isNull ||
      col("log_prob") === Double.NegativeInfinity).count() == 0)
  }

  test("key profiling: exact hot-key ranks and one-row health summary") {
    val fx = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val hot = Profiling.hotKeys(fx, col("k"), 2)
      .select("rank", "key_value", "cnt", "share")
      .as[(Int, String, Long, Double)].collect().toList
    assert(hot == List((1, "a", 3L, 0.5), (2, "b", 2L, 2.0 / 6)))
    val st = Profiling.keyStats(fx, col("k"))
      .select("n_rows", "n_keys", "top_cnt", "top_share", "skew_uniform")
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(st == ((6L, 3L, 3L, 0.5, 1.5)))
    // Deterministic tie-break: equal counts rank by key value.
    val tie = Profiling.hotKeys(Seq("x", "y").toDF("k"), col("k"), 2)
      .select("rank", "key_value").as[(Int, String)].collect().toList
    assert(tie == List((1, "x"), (2, "y")))
  }

  test("int8 quantization: codes bounded, dequantization error within half a step, zero-vector safe") {
    val fx = Seq(
      (1L, Array(1.0f, -2.0f, 0.5f, 127.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(-0.003f, 0.001f, 0.002f, -0.001f))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(fx)
      .select("vec_id", "scale", "q_l1", "q")
      .as[(Long, Double, Long, Seq[Long])].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._4 == Seq(1L, -2L, 1L, 127L)) // 1/ (127/127) = 1, floor(0.5*1+0.5)=1
    assert(out(2L) == ((2L, 0.0, 0L, Seq(0L, 0L, 0L, 0L))))
    assert(out(3L)._4.head == -127L) // max-magnitude element always hits ±127
    assert(out.values.forall(_._4.forall(c => c >= -127L && c <= 127L)))
    // Real embeddings: reconstruction error ≤ scale/2 per element
    // (against the EXACT scale — the emitted one is rounded to 6dp).
    val q = Similarity.quantizeInt8(emb)
    val bad = q.join(emb, "vec_id")
      .withColumn("s_exact", expr(
        "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0D"))
      .withColumn("err", expr(
        """aggregate(zip_with(q, embedding, (c, x) -> abs(c * s_exact - CAST(x AS DOUBLE))),
          |0.0D, (a, e) -> greatest(a, e))""".stripMargin))
      .filter(col("err") > col("s_exact") / 2 + lit(1e-9))
    assert(bad.count() == 0)
  }

  test("chunking: stride/window arithmetic, full coverage, content md5s") {
    val fx = Seq((1L, "a b c d e"), (2L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkTokens(fx, window = 3, stride = 2)
      .select("doc_id", "chunk_idx", "start_tok", "end_tok", "chunk_md5")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out == Set(
      (1L, 0L, 0L, 3L, m("a b c")),
      (1L, 1L, 2L, 5L, m("c d e")),
      (1L, 2L, 4L, 5L, m("e")),
      (2L, 0L, 0L, 1L, m("x"))))
    // Laws on the real corpus at the gate parameters.
    val chunks = TextAnalysis.chunkTokens(docs, window = 32, stride = 24)
    val toks = docs.select(col("doc_id"),
      size(graft.functions.word_tokens(col("text"))).cast("long").as("n"))
    val j = chunks.groupBy("doc_id").agg(
      count(lit(1)).as("n_chunks"), max("end_tok").as("max_end"),
      sum(when(col("start_tok") =!= col("chunk_idx") * 24, 1).otherwise(0)).as("bad_starts"),
      sum(when(col("end_tok") - col("start_tok") > 32 ||
        col("end_tok") <= col("start_tok"), 1).otherwise(0)).as("bad_sizes"))
      .join(toks, "doc_id")
    val bad = j.filter(col("bad_starts") =!= 0 || col("bad_sizes") =!= 0 ||
      col("max_end") =!= col("n") ||            // tail always covered
      col("n_chunks") =!= ceil(col("n") / lit(24.0)).cast("long"))
    assert(bad.count() == 0)
    assert(chunks.count() > docs.count())       // overlap actually occurs
  }

  test("span dedup hot-gram cap: unbounded cap is identity, tight cap drops only hot-gram spans") {
    // "h1 h2 h3" is the hot boilerplate run (5 docs, occ=5); docs 21/22
    // also share the rare "r1 r2 r3" (occ=2).
    val fixture = ((1 to 5).map(i => (i.toLong, s"u$i v$i h1 h2 h3 w$i")) ++
      Seq((21L, "r1 r2 r3 x y"), (22L, "z r1 r2 r3 q"))).toDF("doc_id", "text")
    def spans(cap: Long) =
      Dedup.duplicatedSpans(fixture, n = 3, maxGramOcc = cap)
        .select("doc_id", "span_start", "span_end")
        .as[(Long, Long, Long)].collect().toSet
    val unbounded = spans(Long.MaxValue)
    assert(unbounded.map(_._1) == Set(1L, 2L, 3L, 4L, 5L, 21L, 22L))
    assert(spans(5L) == unbounded)      // cap at the hot occ keeps everything
    val capped = spans(4L)              // cap below it drops ONLY the hot spans
    assert(capped == Set((21L, 0L, 3L), (22L, 1L, 4L)))
    // Real corpus at the bench cap: capped spans are a subset of the
    // uncapped set's coverage (never an invention).
    val un = Dedup.duplicatedSpans(docs, 4)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3))).toMap
    val cp = Dedup.duplicatedSpans(docs, 4, maxGramOcc = 64L)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect()
    assert(cp.forall { case (d, s, e) =>
      un.getOrElse(d, Array.empty[(Long, Long)]).exists(u => u._1 <= s && e <= u._2) })
  }

  test("span cut: first occurrence wins, owners untouched, rebuilt text consistent") {
    val fixture = Seq(
      (1L, "a b c d e f g h x y z"),
      (2L, "c d e f g q r"),
      (3L, "p q2 w x y z"),
      (4L, "m n o m n o m n o"),
      (5L, "s1 s2 s3 s4 s5")).toDF("doc_id", "text")
    val out = Dedup.cutDuplicatedSpans(fixture, n = 3)
      .select("doc_id", "text", "n_words", "n_cut")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // Doc 1 owns every span it shares: untouched.
    assert(out(1L) == ((1L, "a b c d e f g h x y z", 11L, 0L)))
    // Doc 2 loses its copy of "c d e f g", keeps its own tail.
    assert(out(2L) == ((2L, "q r", 7L, 5L)))
    // Doc 3 loses "x y z" (doc 1 owns it).
    assert(out(3L) == ((3L, "p q2 w", 6L, 3L)))
    // Self-repetition and disjoint vocab: untouched.
    assert(out(4L) == ((4L, "m n o m n o m n o", 9L, 0L)))
    assert(out(5L) == ((5L, "s1 s2 s3 s4 s5", 5L, 0L)))

    // Laws on the real corpus: every row present exactly once, counts
    // consistent with the rebuilt text, cuts bounded by word count.
    val n = 4
    val res = Dedup.cutDuplicatedSpans(docs, n)
    assert(res.count() == docs.count())
    val bad = res.filter(col("n_cut") < 0 || col("n_cut") > col("n_words") ||
      size(graft.functions.word_tokens(col("text"))) =!=
        when(col("n_cut") === col("n_words") && col("n_words") > 0, lit(1))
          .otherwise(col("n_words") - col("n_cut")))
    assert(bad.count() == 0)
  }

  test("bloom decontamination equals the exact broadcast twin (fixture + real corpus, fpp sweep)") {
    val evalDocs = Seq((100L, "the quick brown fox jumps over the lazy dog tonight")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "intro text then the quick brown fox jumps over the lazy dog tonight and more"),
      (2L, "nothing in common with the evaluation corpus at all whatsoever"),
      (3L, "quick brown fox jumps over the lazy dog tonight")).toDF("doc_id", "text")
    for (fpp <- Seq(0.5, 0.05, 0.001)) {
      val bloom = Decontamination.flagContaminatedBloom(corpus, evalDocs, n = 5, fpp = fpp)
        .as[(Long, Long)].collect().toSet
      val exact = Decontamination.flagContaminated(corpus, evalDocs, n = 5)
        .as[(Long, Long)].collect().toSet
      assert(bloom == exact, s"fpp=$fpp")
      assert(bloom.map(_._1) == Set(1L, 3L))
    }
    // Real corpus, the gate's split: identical flagged sets.
    val all = docs
    val exactR = Decontamination.flagContaminated(
      all.filter(col("doc_id") >= 10), all.filter(col("doc_id") < 10), n = 5)
      .as[(Long, Long)].collect().toSet
    val bloomR = Decontamination.flagContaminatedBloom(
      all.filter(col("doc_id") >= 10), all.filter(col("doc_id") < 10), n = 5)
      .as[(Long, Long)].collect().toSet
    assert(bloomR == exactR)
  }

  test("deterministic shuffle: stable under partitioning, per-bucket positions dense, order = (u, key)") {
    def run(df: DataFrame) =
      Sampling.deterministicShuffle(df, col("doc_id"), buckets = 8, seed = "s1")
        .select("doc_id", "shuffle_bucket", "shuffle_pos")
        .as[(Long, Int, Long)].collect().toSet
    val base = run(docs)
    assert(run(docs.repartition(17)) == base)   // pure function of (key, seed)
    assert(base.size == docs.count())           // total: every row placed once
    // Positions within each bucket are exactly 0..k-1.
    val byBucket = base.groupBy(_._2)
    byBucket.foreach { case (b, rows) =>
      assert(rows.map(_._3) == (0L until rows.size).toSet, s"bucket $b not dense")
    }
    // Position order within a bucket is the hashUniform order.
    val u = docs.select(col("doc_id"),
      Sampling.hashUniform(col("doc_id"), "s1").as("u"))
      .as[(Long, Double)].collect().toMap
    byBucket.foreach { case (b, rows) =>
      val byPos = rows.toSeq.sortBy(_._3).map(_._1)
      val byU = rows.toSeq.map(_._1).sortBy(id => (u(id), id))
      assert(byPos == byU, s"bucket $b order mismatch")
    }
  }

  test("deterministic shuffle refuses to clobber pre-existing output columns") {
    val withBucket = docs.withColumn("shuffle_bucket", lit(7))
    val e = intercept[IllegalArgumentException] {
      Sampling.deterministicShuffle(withBucket, col("doc_id"))
    }
    assert(e.getMessage.contains("shuffle_bucket"))
    val withBoth = docs.withColumn("shuffle_bucket", lit(1))
      .withColumn("shuffle_pos", lit(2L))
    val e2 = intercept[IllegalArgumentException] {
      Sampling.deterministicShuffle(withBoth, col("doc_id"))
    }
    assert(e2.getMessage.contains("shuffle_pos"))
  }

  test("span cut verify: engineered hash collision suppressed, true duplicates still cut, clean corpus bit-identical") {
    // Weak gram hash — only the FIRST word of each gram is hashed — so
    // two different grams sharing a first word collide by construction
    // (a real 64-bit word_shingle_hashes collision is not testable).
    val weak: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column = (text, n) => {
      val toks = graft.functions.word_tokens(text)
      when(size(toks) >= n,
        transform(slice(toks, lit(1), size(toks) - (n - 1)), t => xxhash64(t)))
        .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)"))
    }
    // Docs 1/2: grams "k a1 a2" vs "k b1 b2" collide under the weak
    // hash but differ in content — an innocent span. Docs 3/4 share a
    // GENUINE duplicate "c d e" (which also collides, on h("c")).
    val fx = Seq(
      (1L, "k a1 a2 a3 a4"),
      (2L, "k b1 b2 b3 b4"),
      (3L, "c d e x1 x2"),
      (4L, "c d e y1 y2")).toDF("doc_id", "text")
    def run(verify: Boolean) =
      Dedup.cutDuplicatedSpansImpl(fx, 3, Persistence.Local, verify, weak)
        .select("doc_id", "text", "n_cut")
        .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    val unverified = run(verify = false)
    // The collision DOES delete innocent text without verification...
    assert(unverified(2L) == ((2L, "b3 b4", 3L)))
    // ...and verification suppresses exactly that cut,
    val verified = run(verify = true)
    assert(verified(1L) == ((1L, "k a1 a2 a3 a4", 0L)))
    assert(verified(2L) == ((2L, "k b1 b2 b3 b4", 0L)))
    // while the true duplicate is still removed, first occurrence wins.
    assert(verified(3L) == ((3L, "c d e x1 x2", 0L)))
    assert(verified(4L) == ((4L, "y1 y2", 3L)))

    // Collision-free corpus with the production hash: verify=true is
    // bit-identical to the unverified path.
    val base = Dedup.cutDuplicatedSpans(docs, 4)
      .select("doc_id", "text", "n_words", "n_cut")
      .as[(Long, String, Long, Long)].collect().toSet
    val withVerify = Dedup.cutDuplicatedSpans(docs, 4, verify = true)
      .select("doc_id", "text", "n_words", "n_cut")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(withVerify == base)
  }

  test("lmScore shuffle-join fallback (model over the broadcast cap) matches the broadcast plan") {
    val fx = Seq((1L, "aaaa"), (2L, "aaab"), (3L, "ab")).toDF("doc_id", "text")
    def run(cap: Long) = TextAnalysis.lmScore(fx, maxBroadcastModel = cap)
      .select("doc_id", "n_tri", "sum_cnt", "avg_p")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(run(0L) == run(Long.MaxValue))   // cap 0 forces the shuffle join
    // Real corpus: identical frames either way.
    def real(cap: Long) = TextAnalysis.lmScore(docs, maxBroadcastModel = cap)
      .select("doc_id", "n_tri", "sum_cnt", "avg_p")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(real(0L) == real(Long.MaxValue))
  }

  test("profiling drives the skew knobs: skew_uniform picks the salt factor on a hot key") {
    // Synthetic hot key: "hot" carries 30% of 10k rows; 700 cold keys
    // share the rest. This is the pre-flight recipe the saltedJoin /
    // asofJoin-bucketWidth / span-dedup-maxGramOcc scaladocs point at.
    val hot = spark.range(10000).select(
      when(col("id") < 3000, lit("hot"))
        .otherwise(concat(lit("k"), pmod(col("id"), lit(700)))).as("k"),
      col("id").as("v"))
    val st = Profiling.keyStats(hot, col("k"))
      .select("n_rows", "n_keys", "top_cnt", "skew_uniform")
      .as[(Long, Long, Long, Double)].collect().head
    assert(st._3 == 3000L)
    // skew_uniform = top_cnt * n_keys / n_rows ≈ 0.3 * 701: SALT.
    assert(st._4 > 100)
    val salt = math.min(32, math.ceil(st._4).toInt) // recipe from the docs
    assert(salt == 32)
    // A uniform key says don't salt (≈ 1).
    val uni = spark.range(10000).select(
      concat(lit("k"), pmod(col("id"), lit(700))).as("k"), col("id").as("v"))
    val stU = Profiling.keyStats(uni, col("k"))
      .select("skew_uniform").as[Double].collect().head
    assert(stU < 2.0)
    // And the picked factor feeds saltedJoin unchanged-result (the
    // wiring end of the recipe): salted ≡ plain on the hot fixture.
    val dim = spark.range(700).select(concat(lit("k"), pmod(col("id"), lit(700)))
      .as("k"), col("id").as("dim_v")).union(
      Seq(("hot", 9999L)).toDF("k", "dim_v"))
    val plain = hot.join(dim, "k").groupBy("k").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val salted = Bucketing.saltedJoin(hot, dim, "k", salt)
      .groupBy("k").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("classifier score: hand-trained hashed-ngram model scores exactly, spam separates, corpus laws hold") {
    def bucket(g: String, d: Int): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) % d).toInt
    }
    def grams(text: String, wordNgrams: Int): Seq[String] = {
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      (1 to wordNgrams).flatMap(k => toks.sliding(k).filter(_.size == k)
        .map(_.mkString(" ")).toSeq)
    }
    // Hand-trained spam detector: D=64, +5 on "spam"'s bucket, -1 on
    // "good"'s, zero elsewhere (buckets verified distinct below).
    val D = 64
    val bSpam = bucket("spam", D)
    val bGood = bucket("good", D)
    assert(bSpam != bGood)
    val w = Seq.tabulate(D)(i => if (i == bSpam) 5.0 else if (i == bGood) -1.0 else 0.0)
    val fx = Seq(
      (1L, "good text here"),
      (2L, "spam spam spam"),
      (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.classifierScore(fx, w, bias = 0.1, wordNgrams = 2)
      .select("doc_id", "n_grams", "sum_w", "score")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    // Mirror-computed expectation: same buckets, same 6dp decimal sum.
    val fixture = Map(1L -> "good text here", 2L -> "spam spam spam", 3L -> "x")
    for ((id, text) <- fixture) {
      val gs = grams(text, 2)
      val expSum = gs.map(g => BigDecimal(w(bucket(g, D))).setScale(6)).sum
      val expScore = 1.0 / (1.0 + math.exp(-(0.1 + expSum.toDouble / gs.size)))
      assert(out(id)._2 == gs.size.toLong, s"doc $id n_grams")
      assert(out(id)._3 == expSum.toDouble, s"doc $id sum_w")
      assert(math.abs(out(id)._4 - expScore) < 1e-12, s"doc $id score")
    }
    // The hand-trained model actually separates.
    assert(out(2L)._4 > 0.9 && out(1L)._4 < out(3L)._4 && out(2L)._4 > out(1L)._4)
    // Corpus laws at the gate model: n_grams = n + (n-1) bigrams,
    // every score a proper probability.
    val real = TextAnalysis.classifierScore(docs,
      (0 until 64).map(i => ((i * 37) % 101 - 50) / 1000.0), 0.0, 2)
    val toks = docs.select(col("doc_id"),
      size(graft.functions.word_tokens(col("text"))).cast("long").as("n"))
    val bad = real.join(toks, "doc_id").filter(
      col("n_grams") =!= when(col("n") >= 2, col("n") * 2 - 1).otherwise(col("n")) ||
        col("score") <= 0.0 || col("score") >= 1.0 || col("score").isNull)
    assert(bad.count() == 0)
  }

  test("events loader: session timezone untouched, NTZ anchored to UTC at eval time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evtz").toString
    spark.range(1).select(
      expr("TIMESTAMP_NTZ '2022-04-21 15:31:41.028'").as("ts"),
      lit(1.0).as("value")).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val loaded = SparkEntry.events(spark, dir)
      // Conversion is UTC-anchored no matter the session tz in force
      // when the (lazy) plan finally evaluates.
      val millis = loaded.select(unix_millis(col("ts"))).as[Long].collect().head
      assert(millis ==
        java.time.Instant.parse("2022-04-21T15:31:41.028Z").toEpochMilli)
      // The load itself did not touch the caller's session.
      assert(spark.conf.get("spark.sql.session.timeZone") == "America/New_York")
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("noveltyScores: collage docs score low, originals high, accounting laws") {
    val tiny = Seq(
      (1L, "alpha beta gamma delta epsilon"),  // 3 distinct trigrams, all unique
      (2L, "alpha beta gamma zeta eta"),       // shares "alpha beta gamma" with 1 and 3
      (3L, "alpha beta gamma delta epsilon"),  // exact dup of 1 -> nothing unique
      (4L, "xy")).toDF("doc_id", "text")       // sub-n doc: zero grams
    val out = TextAnalysis.noveltyScores(tiny, n = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "n_unique", "novelty")
      .collect()
    // Docs 1 and 3 are identical: every gram has df >= 2 -> novelty 0.
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 0L &&
      out(0).getDouble(3) == 0.0)
    assert(out(2).getDouble(3) == 0.0)
    // Doc 2: grams (alpha beta gamma | beta gamma zeta | gamma zeta eta);
    // only the first is shared -> novelty 2/3.
    assert(out(1).getLong(1) == 3L && out(1).getLong(2) == 2L &&
      out(1).getDouble(3) == 2.0 / 3)
    assert(out(3).getLong(1) == 0L && out(3).isNullAt(3))
    // Corpus laws: every doc present, n_unique <= n_grams, novelty in [0,1].
    val real = TextAnalysis.noveltyScores(docs)
      .select("n_grams", "n_unique", "novelty").collect()
    assert(real.length == docs.count())
    assert(real.forall(r => r.getLong(1) <= r.getLong(0) &&
      (r.isNullAt(2) || (r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))))
  }

  test("noveltyAgainstIndex: hand-checked counts; native ≡ declarative; empty index; self-corpus law") {
    val ref = Seq((1L, "alpha beta gamma delta"), (2L, "one two three four"))
      .toDF("doc_id", "text")
    val idx = TextAnalysis.gramIndex(ref, n = 2)
    // ref bigrams: {alpha beta, beta gamma, gamma delta, one two,
    // two three, three four}
    val in = Seq(
      (10L, "alpha beta gamma"),        // 2 grams, 0 new
      (11L, "alpha beta zeta"),         // 2 grams, 1 new
      (12L, "totally novel text here"), // 3 grams, 3 new
      (13L, "single"),                  // sub-n: 0 grams, null novelty
      (14L, "one two one two"))         // distinct {one two, two one}: 1 new
      .toDF("doc_id", "text")
    val got = TextAnalysis.noveltyAgainstIndex(in, idx, n = 2)
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "n_new", "novelty").collect()
    assert(got(0).getLong(1) == 2L && got(0).getLong(2) == 0L &&
      got(0).getDouble(3) == 0.0)
    assert(got(1).getLong(1) == 2L && got(1).getLong(2) == 1L &&
      got(1).getDouble(3) == 0.5)
    assert(got(2).getLong(1) == 3L && got(2).getLong(2) == 3L &&
      got(2).getDouble(3) == 1.0)
    assert(got(3).getLong(1) == 0L && got(3).isNullAt(3))
    assert(got(4).getLong(1) == 2L && got(4).getLong(2) == 1L)

    // Native broadcast-set path ≡ declarative join path, row for row,
    // on the real corpus (maxBroadcastIndex = 0 forces the fallback).
    val sample = docs.limit(150)
    val realIdx = TextAnalysis.gramIndex(
      docs.filter(col("source") === "src0"), n = 3)
    def rows(df: DataFrame) = df.orderBy("doc_id").collect().toSeq
    assert(rows(TextAnalysis.noveltyAgainstIndex(sample, realIdx, n = 3)) ==
      rows(TextAnalysis.noveltyAgainstIndex(sample, realIdx, n = 3,
        maxBroadcastIndex = 0L)))

    // Empty reference index: every gram is new (novelty 1.0 for any
    // doc with grams) on BOTH paths.
    val empty = TextAnalysis.gramIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), n = 2)
    Seq(1000000L, 0L).foreach { cap =>
      val e = TextAnalysis.noveltyAgainstIndex(in, empty, n = 2,
          maxBroadcastIndex = cap)
        .orderBy("doc_id").select("n_grams", "novelty").collect()
      assert(e.forall(r => r.getLong(0) == 0L || r.getDouble(1) == 1.0))
    }

    // Semantic link to self-corpus noveltyScores: a doc's corpus-unique
    // grams (gdf = 1) are exactly its grams absent from the index of
    // everyone ELSE.
    val tiny = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma zeta eta"),
      (3L, "alpha beta gamma delta epsilon"),
      (4L, "xy")).toDF("doc_id", "text")
    val self = TextAnalysis.noveltyScores(tiny, n = 3)
      .orderBy("doc_id").collect()
    (1L to 4L).foreach { id =>
      val vsOthers = TextAnalysis.noveltyAgainstIndex(
        tiny.filter(col("doc_id") === id),
        TextAnalysis.gramIndex(tiny.filter(col("doc_id") =!= id), n = 3),
        n = 3).collect().head
      val s = self(id.toInt - 1)
      assert(vsOthers.getLong(1) == s.getLong(1) &&
        vsOthers.getLong(2) == s.getLong(2),
        s"law mismatch at doc $id")
    }
  }

  test("groupTfidf: per-group distinctive terms, hand-computed, corpus laws") {
    val tiny = Seq(
      (1L, "A", "ml ml data"), (2L, "A", "ml models"),
      (3L, "B", "cooking data"), (4L, "B", "cooking recipes"))
      .toDF("doc_id", "source", "text")
    // Groups: A, B (N=2). tf(A): ml 3, data 1, models 1; tf(B):
    // cooking 2, data 1, recipes 1. df: ml 1, data 2, models 1,
    // cooking 1, recipes 1. Rational scores: tf*3/(df+1).
    val out = TextAnalysis.groupTfidf(tiny, col("source"), k = 2,
        rationalIdf = true)
      .orderBy(col("group"), col("rank"))
      .select("group", "term", "tf", "df", "score", "rank")
      .as[(String, String, Long, Long, Double, Int)].collect().toSeq
    assert(out == Seq(
      ("A", "ml", 3L, 1L, 4.5, 1), ("A", "models", 1L, 1L, 1.5, 2),
      ("B", "cooking", 2L, 1L, 3.0, 1), ("B", "recipes", 1L, 1L, 1.5, 2)))
    // Corpus: every source gets dense-ranked terms, <= k each.
    val real = TextAnalysis.groupTfidf(docs, col("source"), k = 3)
      .groupBy("group").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .as[(String, Long, Int)].collect()
    assert(real.length == 20 && real.forall(r => r._2 <= 3 && r._2 == r._3))
  }

  test("dedupSentences: cross-doc boilerplate cut, first occurrence wins, accounting") {
    val d = Seq(
      (1L, "Subscribe to our newsletter. Real content one. Bye!"),
      (2L, "Subscribe to our newsletter. Real content two. Bye!"),
      (3L, "Real content three."),
      (4L, "")).toDF("doc_id", "text")
    val out = Dedup.dedupSentences(d)
      .select("doc_id", "text", "n_sentences", "n_removed")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    // Doc 1 owns both boilerplate sentences (first occurrence); doc 2
    // loses them and keeps only its unique middle sentence.
    assert(out(0) == (1L, "Subscribe to our newsletter. Real content one. Bye!", 3L, 0L))
    assert(out(1) == (2L, "Real content two.", 3L, 2L))
    assert(out(2) == (3L, "Real content three.", 1L, 0L))
    assert(out(3) == (4L, "", 0L, 0L))

    // Corpus laws: every doc present; removed+kept adds up; after the
    // cut no sentence appears twice anywhere.
    val real = Dedup.dedupSentences(docs)
    assert(real.count() == docs.count())
    val resplit = TextAnalysis.chunkSentences(
      real.select(col("doc_id"), col("text")))
    val dupes = resplit.groupBy("sentence").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(dupes == 0L)
  }

  test("randomized: dedupSentences agrees with a brute-force reference model") {
    // Reference model: split with the same boundary rule via plain
    // Java regex, keep first global occurrence in (doc_id, idx) order,
    // rejoin with single spaces — no Spark code shared.
    def refDedup(corpus: Seq[(Long, String)]): Map[Long, (String, Long, Long)] = {
      val split = corpus.sortBy(_._1).map { case (id, text) =>
        id -> text.replaceAll("([.!?]+)\\s+", "$1\u0001").split("\u0001", -1)
          .toSeq.filter(_.trim.nonEmpty)
      }
      val seen = scala.collection.mutable.Set[String]()
      split.map { case (id, sents) =>
        val kept = sents.filter(s => seen.add(s))
        id -> (kept.mkString(" "), sents.size.toLong,
          (sents.size - kept.size).toLong)
      }.toMap
    }
    val rnd = new scala.util.Random(7)
    val sentencePool = (0 until 12).map(i => s"sentence number $i ends.") ++
      Seq("No punct tail", "Multi!! bang.", "Q? A.")
    for (trial <- 1 to 10) {
      val corpus = (0 until 15).map { id =>
        val n = rnd.nextInt(5)
        (id.toLong, Seq.fill(n)(
          sentencePool(rnd.nextInt(sentencePool.length))).mkString(" "))
      }
      val got = Dedup.dedupSentences(corpus.toDF("doc_id", "text"))
        .select("doc_id", "text", "n_sentences", "n_removed")
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      assert(got == refDedup(corpus), s"trial $trial mismatch")
    }
  }

  test("chunkSentences: boundary rule, index stability, reassembly accounting") {
    val d = Seq(
      (1L, "Hello world. How are you? Fine!  Multi  spaces. trailing dot."),
      (2L, "No terminal punctuation at all"),
      (3L, "Ellipsis... then more?! Yes."),
      (4L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkSentences(d)
      .select("doc_id", "sent_idx", "sentence")
      .as[(Long, Long, String)].collect().toSeq.sortBy(r => (r._1, r._2))
    assert(out.filter(_._1 == 1L).map(_._3) == Seq(
      "Hello world.", "How are you?", "Fine!", "Multi  spaces.", "trailing dot."))
    // A doc with no boundary is one sentence; punctuation runs are one
    // boundary each; empty docs vanish.
    assert(out.filter(_._1 == 2L).map(_._3) == Seq("No terminal punctuation at all"))
    assert(out.filter(_._1 == 3L).map(_._3) == Seq("Ellipsis...", "then more?!", "Yes."))
    assert(!out.exists(_._1 == 4L))
    // Indices are dense from 0 within each doc here (no dropped
    // whitespace-only fragments in these fixtures).
    out.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).sorted == rows.indices.map(_.toLong))
    }
    // Corpus law: concatenating a doc's sentences with single spaces
    // loses only boundary whitespace — total non-space chars conserved.
    val real = TextAnalysis.chunkSentences(docs)
      .groupBy("doc_id")
      .agg(sum(length(regexp_replace(col("sentence"), "\\s", ""))).as("nz"))
      .join(docs.select(col("doc_id"),
        length(regexp_replace(col("text"), "\\s", "")).cast("long").as("orig")), "doc_id")
      .filter(col("nz") =!= col("orig")).count()
    assert(real == 0L)
  }

  test("streaming/batch parity: the enrichment projections agree row-for-row under readStream") {
    // The ingest-enrichment stack is pure projections, so Structured
    // Streaming must produce byte-identical rows to the batch plan on
    // the same input — pinned here, benched in StreamBench's `enrich`.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((1L, "the quick brown fox. it's fine!"),
      (2L, "naïve café 中文 😀"), (3L, ""))
    def enrich(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      graft.functions.gram_stats(col("text"), 2).as("gs"),
      graft.functions.bpe_token_count(col("text")).as("n_bpe"),
      graft.functions.hashed_token_counts(col("text"), 16).as("vec"),
      graft.functions.compress_ratio(col("text")).as("zr"))
    val mem = MemoryStream[(Long, String)]
    val q = enrich(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("enrich_parity")
      .outputMode("append").start()
    try { mem.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    val streamed = spark.table("enrich_parity").collect()
      .map(r => (r.getLong(0), r.toSeq.drop(1).toString)).toMap
    val batch = enrich(rows.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.toSeq.drop(1).toString)).toMap
    assert(streamed == batch && streamed.size == 3)
  }

  test("hashedVectors: independently-computed buckets, token accounting, similarity interop") {
    def bucket(t: String, dim: Int): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) % dim).toInt
    }
    val dim = 16
    val text = "The quick brown Fox jumps over the LAZY dog"
    val expected = new Array[Long](dim)
    text.trim.toLowerCase.split("\\s+").foreach(t => expected(bucket(t, dim)) += 1)
    val got = TextAnalysis.hashedVectors(
      Seq((1L, text)).toDF("doc_id", "text"), dim)
      .collect().head.getSeq[Long](1)
    assert(got == expected.toSeq)

    // Corpus law: vector totals equal token counts, dim respected.
    val bad = TextAnalysis.hashedVectors(docs, dim)
      .join(docs.select(col("doc_id"),
        size(graft.functions.word_tokens(col("text"))).as("nt")), "doc_id")
      .filter(aggregate(col("vec"), lit(0L), (a, v) => a + v) =!= col("nt") ||
        size(col("vec")) =!= dim)
      .count()
    assert(bad == 0L)

    // Interop: float-cast hashed vectors flow through the Similarity
    // family — identical docs land cosine 1, disjoint-vocab docs near 0.
    val emb2 = TextAnalysis.hashedVectors(Seq(
      (0L, "alpha beta gamma"), (1L, "alpha beta gamma"),
      (2L, "delta epsilon zeta eta")).toDF("doc_id", "text"), dim)
      .select(col("doc_id").as("vec_id"),
        transform(col("vec"), _.cast("float")).as("embedding"))
    val sims = Similarity.cosineTopK(emb2, emb2.filter(col("vec_id") === 0), k = 2)
      .select("neighbor_id", "cos_sim").as[(Long, Double)].collect().toMap
    assert(math.abs(sims(1L) - 1.0) < 1e-9)
    // 7 distinct tokens over 16 buckets may collide; bound loosely.
    assert(sims.getOrElse(2L, 0.0) < 0.8)
  }

  test("corpusDiff: all four statuses, hash shuffle only, partition accounting") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((1L, "a"), (2L, "B2"), (4L, "d")).toDF("doc_id", "text")
    val out = Profiling.corpusDiff(oldSnap, newSnap)
      .select("doc_id", "status").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // Text never reaches the join: the plan's exchanges carry only
    // (doc_id, md5) projections.
    val plan = Profiling.corpusDiff(docs, docs)
      .queryExecution.executedPlan.toString
    assert(!"Exchange[^\\n]*text".r.findFirstIn(plan).isDefined,
      s"document text crossed the diff shuffle:\n$plan")
    // Identity diff: everything unchanged, count preserved.
    val idn = Profiling.corpusDiff(docs, docs)
      .groupBy("status").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(idn == Map("unchanged" -> docs.count()))
  }

  test("packSequences over real merged-BPE counts respects the true token budget") {
    val merges = TextAnalysis.bpeTrain(docs, numMerges = 100)
    val bpeCount = size(graft.functions.bpe_encode(col("text"), merges)).cast("long")
    val budget = 2000L
    val packed = Sampling.packSequences(docs, col("doc_id"), bpeCount, budget)
      .select(col("doc_id"), col("pack_id"), bpeCount.as("n"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(packed.nonEmpty)
    // Next-fit within a bucket: a pack's total stays under budget +
    // one document's overshoot (no doc here exceeds the budget, so
    // every pack's PREFIX before its last doc is < budget).
    val byPack = packed.groupBy(_._2).values
    assert(byPack.forall(rows => rows.map(_._3).sum - rows.map(_._3).max < budget))
    // Real counts differ from the regex proxy (the merges compress),
    // so the budget actually binds on merged tokens.
    val proxyVsReal = docs.select(
      graft.functions.bpe_token_count(col("text")).as("proxy"), bpeCount.as("real"))
      .as[(Long, Long)].collect()
    assert(proxyVsReal.forall { case (p, r) => r >= p })
  }

  test("topicProfile: cluster-granular tf-idf labels, dense ranks, size accounting") {
    val out = Curation.topicProfile(docs, emb, nClusters = 8, topK = 3)
      .select("cid", "n_docs", "rank", "term", "tf", "df", "score")
      .as[(Int, Long, Int, String, Long, Long, Double)].collect().toSeq
    assert(out.nonEmpty)
    val byCid = out.groupBy(_._1)
    byCid.foreach { case (_, rows) =>
      // Dense ranks 1..<=topK, scores non-increasing, one n_docs value.
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3) == (1 to sorted.size).toList && sorted.size <= 3)
      assert(sorted.sliding(2).forall {
        case Seq(a, b) => a._7 >= b._7; case _ => true
      })
      assert(rows.map(_._2).distinct.size == 1)
    }
    // df is bounded by the cluster count actually present; every
    // cluster's docs are accounted for (embeddings cover all docs, so
    // sizes sum to the corpus).
    assert(out.forall(r => r._6 >= 1 && r._6 <= byCid.size))
    assert(byCid.map(_._2.head._2).sum == docs.count())
    // Deterministic end to end (same centroids, same ranking).
    val again = Curation.topicProfile(docs, emb, nClusters = 8, topK = 3)
      .select("cid", "n_docs", "rank", "term", "tf", "df", "score")
      .as[(Int, Long, Int, String, Long, Long, Double)].collect().toSeq
    assert(again.toSet == out.toSet)
  }

  test("sourceOverlap: hand-computed pair table, asymmetric fractions, laws") {
    val tiny = Seq(
      (1L, "A", "x y z"), (2L, "A", "p q r"),
      (3L, "B", "x y w"), (4L, "C", "no overlap here"))
      .toDF("doc_id", "source", "text")
    val out = Profiling.sourceOverlap(tiny, n = 2)
      .orderBy("src_a", "src_b")
      .select("src_a", "src_b", "n_shared_grams", "n_docs_overlap",
        "n_docs_a", "overlap_frac")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // A and B share the single bigram type "x y"; half of A's docs
    // touch B, all of B's one doc touches A; C overlaps nothing and
    // is absent from the table.
    assert(out == Seq(
      ("A", "B", 1L, 1L, 2L, 0.5),
      ("B", "A", 1L, 1L, 1L, 1.0)))

    // Corpus laws: doc overlap never exceeds the source's doc count,
    // shared-gram counts are symmetric, fractions in (0, 1].
    val real = Profiling.sourceOverlap(docs, n = 3)
      .select("src_a", "src_b", "n_shared_grams", "n_docs_overlap",
        "n_docs_a", "overlap_frac")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(real.forall(r => r._4 <= r._5 && r._6 > 0 && r._6 <= 1.0))
    val grams = real.map(r => (r._1, r._2) -> r._3).toMap
    assert(grams.forall { case ((a, b), g) => grams.get((b, a)).contains(g) })
  }

  test("tfidf: hand-computed scores, deterministic tie-break, corpus laws") {
    val tiny = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry durian")).toDF("doc_id", "text")
    // N=3; df: apple 1, banana 2, cherry 2, durian 1.
    val rat = TextAnalysis.tfidf(tiny, k = 5, rationalIdf = true)
      .orderBy("doc_id", "rank")
      .select("doc_id", "term", "tf", "df", "score", "rank")
      .as[(Long, String, Long, Long, Double, Int)].collect().toSeq
    assert(rat == Seq(
      (1L, "apple", 2L, 1L, 4.0, 1), (1L, "banana", 1L, 2L, 4.0 / 3, 2),
      // d2: banana and cherry tie at 4/3 — term asc breaks it.
      (2L, "banana", 1L, 2L, 4.0 / 3, 1), (2L, "cherry", 1L, 2L, 4.0 / 3, 2),
      (3L, "cherry", 3L, 2L, 4.0, 1), (3L, "durian", 1L, 1L, 2.0, 2)))
    // Log-idf production shape: tf * (ln((N+1)/(df+1)) + 1).
    val prod = TextAnalysis.tfidf(tiny, k = 1)
      .orderBy("doc_id").select("doc_id", "term", "score")
      .as[(Long, String, Double)].collect().toSeq
    assert(prod.map(r => (r._1, r._2)) ==
      Seq((1L, "apple"), (2L, "banana"), (3L, "cherry")))
    assert(math.abs(prod.head._3 - 2 * (math.log(4.0 / 2) + 1)) < 1e-12)

    // Corpus laws at k=3: per-doc ranks are dense 1..n with scores
    // non-increasing in rank.
    val real = TextAnalysis.tfidf(docs, k = 3)
      .select("doc_id", "score", "rank")
      .as[(Long, Double, Int)].collect().toSeq.groupBy(_._1)
    assert(real.nonEmpty)
    real.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3) == (1 to sorted.size).toList)
      assert(sorted.sliding(2).forall {
        case Seq(a, b) => a._2 >= b._2; case _ => true
      })
    }
  }

  test("bm25: hand-computed score, length normalization demotes long docs, laws") {
    val tiny = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry durian")).toDF("doc_id", "text")
    // N=3, dl = (3, 2, 4), avgdl = 3.
    val out = TextAnalysis.bm25(tiny, k = 5)
      .orderBy("doc_id", "rank")
      .select("doc_id", "term", "tf", "df", "dl", "score", "rank")
      .as[(Long, String, Long, Long, Long, Double, Int)].collect().toSeq
    val byDoc = out.groupBy(_._1)
    // d3: rare durian (idf ln(2.67)) beats thrice-repeated but common
    // cherry (idf ln(1.6)) — tf saturation + idf discrimination, the
    // behavior that separates BM25 from raw tf.
    assert(byDoc(1L).head._2 == "apple" && byDoc(3L).head._2 == "durian")
    // apple@d1: idf = ln(1 + 2.5/1.5); norm = 2*2.2 / (2 + 1.2*(0.25 + 0.75*3/3.0)).
    val apple = out.find(r => r._1 == 1L && r._2 == "apple").get
    val expected = math.log(1 + 2.5 / 1.5) *
      (2 * 2.2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 3.0)))
    assert(math.abs(apple._6 - expected) < 1e-12)
    assert(out.forall(r => r._3 <= r._5)) // tf <= dl
    // Same tf/df, longer doc scores lower (b > 0 length normalization):
    // cherry appears once in d2 (dl=2); a synthetic longer doc with one
    // cherry would score lower — check via the norm's monotonicity on
    // d2 vs d3 instead: cherry tf=1@dl=2 vs tf=3@dl=4 shares idf, and
    // the saturated tf=3 gains less than 3x.
    val ch2 = out.find(r => r._1 == 2L && r._2 == "cherry").get._6
    val ch3 = out.find(r => r._1 == 3L && r._2 == "cherry").get._6
    assert(ch3 > ch2 && ch3 < 3 * ch2)
    // Corpus run returns <= k dense-ranked rows per doc.
    val real = TextAnalysis.bm25(docs, k = 3)
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max("rank").as("mx"))
      .as[(Long, Long, Int)].collect()
    assert(real.nonEmpty && real.forall(r => r._2 <= 3 && r._2 == r._3))
  }

  test("classifierTrain: planted labels separate, weights are exact and deterministic") {
    // 40 planted docs: positives carry distinctive quality markers,
    // negatives carry junk markers; shared filler in both classes.
    val good = (0 until 20).map(i =>
      (i.toLong, s"insightful thorough analysis shared$i filler common words here", 1))
    val bad = (20 until 40).map(i =>
      (i.toLong, s"spam garbage clickbait shared$i filler common words here", 0))
    val d = (good ++ bad).toDF("doc_id", "text", "label")
    val w = TextAnalysis.classifierTrain(d, "label", dim = 128, iters = 12)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toMap
    // Margin per doc under binary presence features replays training's
    // own arithmetic: intercept + sum of present-bucket weights.
    def bucket(g: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8"))
      val b = java.lang.Long.parseLong(
        h.take(4).map(x => f"$x%02x").mkString, 16)
      b % 128
    }
    def margin(text: String): Double = {
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val grams = toks ++ toks.sliding(2).map(_.mkString(" ")).toSeq
      val bks = grams.map(bucket).distinct
      w.getOrElse(-1L, 0L) / 1e12 + bks.map(b => w.getOrElse(b, 0L)).sum / 1e12
    }
    val gm = good.map(g => margin(g._2))
    val bm = bad.map(b => margin(b._2))
    // Clean planted signal: every positive doc outranks every negative.
    assert(gm.min > bm.max,
      s"no separation: good margins min ${gm.min} <= bad max ${bm.max}")
    // Exactness: a second run reproduces every scaled weight bit-for-bit.
    val w2 = TextAnalysis.classifierTrain(d, "label", dim = 128, iters = 12)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toMap
    assert(w == w2)
  }

  test("classifierTrain meanPool: trained weights feed classifierScore and rank planted docs") {
    val good = (0 until 20).map(i =>
      (i.toLong, s"insightful thorough analysis shared$i filler common words here", 1))
    val bad = (20 until 40).map(i =>
      (i.toLong, s"spam garbage clickbait shared$i filler common words here", 0))
    val d = (good ++ bad).toDF("doc_id", "text", "label")
    val dim = 128
    val trained = TextAnalysis.classifierTrain(d, "label", dim = dim,
      iters = 12, lrNum = 16L, lrDen = 1L, meanPool = true)
      .as[(Long, Long, Double)].collect()
    val wMap = trained.map(r => (r._1, r._3)).toMap
    val weights = (0 until dim).map(b => wMap.getOrElse(b.toLong, 0.0))
    val bias = wMap.getOrElse(-1L, 0.0)
    // classifierScore applies the EXACT feature map meanPool trained
    // on (count/n mean over hashed ngrams), so trained weights must
    // transfer: every good doc outscores every bad doc.
    val scores = TextAnalysis.classifierScore(d, weights, bias = bias)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._4)).toMap
    val gs = good.map(g => scores(g._1))
    val bs = bad.map(b => scores(b._1))
    assert(gs.min > bs.max,
      s"train->score transfer failed: good min ${gs.min} <= bad max ${bs.max}")
  }

  test("sparse_long_dot equals the interpreted HOF fold (classifier margin law)") {
    // The r14 native margin fold must be bit-identical to the
    // aggregate-HOF spelling it replaced, including the intercept
    // bucket −1 at weight slot 0 and multi-count items.
    val rnd = new scala.util.Random(77)
    val dim = 16
    val rows = (0 until 40).flatMap { i =>
      val n = 1 + rnd.nextInt(12)
      Seq.tabulate(n)(_ => (i.toLong, rnd.nextInt(dim + 1) - 1,
        1L + rnd.nextInt(3), 1L + rnd.nextInt(5)))
    }
    val df = rows.toDF("doc_id", "bk", "c", "nd")
      .groupBy("doc_id")
      .agg(collect_list(struct(col("bk"), col("c"), col("nd"))).as("items"))
    val weights = Array.fill(dim + 1)(rnd.nextLong() % 1000000000000L)
    val wLit = typedlit(weights.toSeq)
    val hof = df.withColumn("m", aggregate(col("items"), lit(0L),
        (acc, x) => acc + element_at(wLit, x.getField("bk") + 2) *
          x.getField("c")))
      .select("doc_id", "m").as[(Long, Long)].collect().toMap
    val nat = df.withColumn("m",
        graft.functions.sparse_long_dot(col("items"), weights))
      .select("doc_id", "m").as[(Long, Long)].collect().toMap
    assert(nat == hof)
  }

  test("randomized: classifierTrain agrees with a brute-force exact reference model") {
    val rnd = new scala.util.Random(4242)
    val vocabulary = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa", "pos1", "pos2", "neg1", "neg2")
    val corpus = (0 until 60).map { i =>
      val y = i % 2
      val extra = if (y == 1) Seq("pos1", "pos2") else Seq("neg1", "neg2")
      val words = Seq.fill(3 + rnd.nextInt(8))(
        vocabulary(rnd.nextInt(10))) ++ rnd.shuffle(extra).take(1 + rnd.nextInt(2))
      (i.toLong, words.mkString(" "), y)
    }
    val dim = 32
    val iters = 7
    val d = corpus.toDF("doc_id", "text", "label")
    for (meanPool <- Seq(false, true)) {
      val got = TextAnalysis.classifierTrain(d, "label", dim = dim,
        iters = iters, lrNum = 3L, lrDen = 4L, meanPool = meanPool)
        .as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toMap

      // Reference model: plain Scala loops, BigInt-exact.
      def bucket(g: String): Int = {
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(g.getBytes("UTF-8"))
        (java.lang.Long.parseLong(
          h.take(4).map(x => f"$x%02x").mkString, 16) % dim).toInt
      }
      def divHalf(a: BigInt, den: BigInt): BigInt =
        BigInt(a.signum) * ((a.abs * 2 + den) / (den * 2))
      val feats: Seq[(Long, Int, Seq[(Int, Long)], Long)] = corpus.map { case (id, text, y) =>
        val toks = text.trim.toLowerCase.split("\\s+").toSeq
        val grams = toks ++ toks.sliding(2).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(bucket).view.mapValues(_.size.toLong).toMap
        val n = counts.values.sum
        val fs = if (meanPool) counts.toSeq else counts.keys.map(_ -> 1L).toSeq
        (id, y, fs, if (meanPool) n else 1L)
      }
      val ws = scala.collection.mutable.HashMap.empty[Int, BigInt].withDefaultValue(BigInt(0))
      val nDocs = corpus.size
      for (_ <- 0 until iters) {
        val grad = scala.collection.mutable.HashMap.empty[Int, BigInt].withDefaultValue(BigInt(0))
        feats.foreach { case (_, y, fs, nd) =>
          val ms = fs.map { case (b, c) => ws(b) * c }.sum
          val md = ws(-1).toDouble / 1e12 + (ms.toDouble / 1e12) / nd.toDouble
          val p = 0.5 + (0.5 * md) / (1.0 + math.abs(md))
          val resid = y * 1000000L - math.floor(p * 1000000.0 + 0.5).toLong
          grad(-1) += BigInt(resid) * 1000000L
          fs.foreach { case (b, c) =>
            grad(b) += divHalf(BigInt(resid) * 1000000L, BigInt(nd)) * c
          }
        }
        grad.foreach { case (b, g) =>
          ws(b) += divHalf(g * 3L, BigInt(4L) * nDocs)
        }
      }
      val expected = ws.toMap.map { case (b, v) => (b.toLong, v.toLong) }
      val full = (expected.keySet ++ got.keySet).toSeq.sorted
      full.foreach { b =>
        assert(got.getOrElse(b, 0L) == expected.getOrElse(b, 0L),
          s"meanPool=$meanPool bucket $b: got ${got.getOrElse(b, 0L)} expected ${expected.getOrElse(b, 0L)}")
      }
    }
  }

  test("lmScore: native broadcast-model path is row-identical to the declarative join path") {
    val d = docs.limit(120).unionByName(Seq(
      (900001L, "ab", "xx", "synthetic", 2L),             // sub-trigram: must drop
      (900002L, "  Na\u00efve  \u4e2d\u6587 caf\u00e9 mix ", "xx", "synthetic", 20L), // multibyte windows
      (900003L, "zzz qqq zzz qqq unseen trigrams", "xx", "synthetic", 30L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val native = TextAnalysis.lmScore(d)
    val declarative = TextAnalysis.lmScore(d, maxBroadcastModel = 0L)
    // The chosen plans really are different shapes: native has no join.
    assert(!native.queryExecution.executedPlan.toString.contains("Join"))
    assert(declarative.queryExecution.executedPlan.toString.contains("Join"))
    val nRows = native.orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect()
    val dRows = declarative.orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(nRows.map(_._1).toSeq == dRows.map(_._1).toSeq) // same doc set (900001 dropped by both)
    assert(!nRows.map(_._1).contains(900001L))
    nRows.zip(dRows).foreach { case (a, b) =>
      assert(a._2 == b._2 && a._3 == b._3, s"exact n_tri/sum_cnt mismatch at ${a._1}: $a vs $b")
      assert(math.abs(a._4 - b._4) <= 1e-12 && math.abs(a._5 - b._5) <= 1e-9,
        s"avg_p/log_prob drift at ${a._1}: $a vs $b")
    }
  }

  test("char_trigram_counts: native per-doc histogram equals the explode-substring counts") {
    val d = docs.limit(60).unionByName(Seq(
      (910001L, "\u4e2d\u6587\u6587\u4e2d\u6587 caf\u00e9 \ud83d\ude00ab", "xx", "synthetic", 12L),
      (910002L, "aa", "xx", "synthetic", 2L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val native = d.select(explode(graft.functions.char_trigram_counts(norm)).as(Seq("tr", "c")))
      .groupBy("tr").agg(sum("c").as("cnt"))
      .as[(String, Long)].collect().toMap
    val brute = d.select(col("doc_id"), norm.as("s"))
      .select(explode(expr(
        """CASE WHEN length(s) >= 3
          |THEN transform(sequence(1, length(s) - 2), i -> substring(s, i, 3))
          |ELSE array() END""".stripMargin)).as("tr"))
      .groupBy("tr").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    assert(native == brute, {
      val ks = (native.keySet ++ brute.keySet).filter(k => native.get(k) != brute.get(k))
      s"histogram mismatch on ${ks.take(5)}"
    })
  }

  test("ngramJaccardPairs hashBits: engineered narrow-hash collision, wider width restores exactness") {
    // Find two distinct words whose xxhash64 values collide in the low
    // 32 bits (birthday search over a few 10^5 candidates) — a REAL
    // key collision for the hashBits=32 tier, engineering what 64-bit
    // keys would only hit at ~10^9 grams and 128-bit never would.
    def h64(w: String): Long = {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(w)
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
    }
    val seen = scala.collection.mutable.HashMap.empty[Long, String]
    var collide: (String, String) = null
    var i = 0
    while (collide == null) {
      val w = s"w$i"
      val k = h64(w) & 0xFFFFFFFFL
      seen.get(k) match {
        case Some(prev) if prev != w => collide = (prev, w)
        case _ => seen(k) = w
      }
      i += 1
    }
    val (w1, w2) = collide
    assert(h64(w1) != h64(w2)) // full-64 keys do NOT collide
    // Unigram shingles: docs share {common1, common2}; the third word
    // differs but collides at 32 bits -> the narrow tier sees J = 1.
    val d = Seq(
      (1L, s"common1 common2 $w1"),
      (2L, s"common1 common2 $w2")
    ).toDF("doc_id", "text")
    def pairAt(bits: Int): Option[Double] =
      Dedup.ngramJaccardPairs(d, 1, 0.1, hashBits = bits)
        .as[(Long, Long, Double)].collect().headOption.map(_._3)
    // String-gram truth: |{c1,c2}| / |{c1,c2,w1,w2}| = 2/4 = 0.5.
    assert(pairAt(32).contains(1.0), "32-bit keys must merge the colliding grams")
    assert(pairAt(64).contains(0.5), "64-bit keys must be exact here")
    assert(pairAt(128).contains(0.5), "128-bit keys must be exact here")
    // And at a threshold only the collision can reach, the narrow tier
    // reports a spurious perfect duplicate; wider tiers stay silent.
    assert(Dedup.ngramJaccardPairs(d, 1, 0.9, hashBits = 32).count() == 1)
    assert(Dedup.ngramJaccardPairs(d, 1, 0.9, hashBits = 64).count() == 0)
    assert(Dedup.ngramJaccardPairs(d, 1, 0.9, hashBits = 128).count() == 0)
    // On the real corpus (collision-free at this size), 128-bit struct
    // keys flow through candidate + verify stages and reproduce the
    // 64-bit pair set exactly — including through the capped path.
    def pairs(bits: Int, cap: Int) =
      Dedup.ngramJaccardPairs(docs, 3, 0.8, maxShingleDf = cap, hashBits = bits)
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(pairs(128, Int.MaxValue) == pairs(64, Int.MaxValue))
    assert(pairs(128, 10) == pairs(64, 10))
  }

  test("topicProfileWithIndex: label-only path matches per-call training, through save/load") {
    val idx = Similarity.buildIvfIndex(emb, nClusters = 8)
    val dir = java.nio.file.Files.createTempDirectory("graft_topic_idx").toString
    Similarity.saveIvfIndex(idx, dir)
    val fresh = Curation.topicProfile(docs, emb, nClusters = 8, topK = 3)
      .orderBy("cid", "rank").collect().toSeq
    val withIdx = Curation.topicProfileWithIndex(docs, idx, topK = 3)
      .orderBy("cid", "rank").collect().toSeq
    val reloaded = Curation.topicProfileWithIndex(docs,
      Similarity.loadIvfIndex(spark, dir), topK = 3)
      .orderBy("cid", "rank").collect().toSeq
    // Training is deterministic, so all three spellings agree exactly;
    // the label-only paths must not retrain or drift.
    assert(withIdx == fresh)
    assert(reloaded == fresh)
  }

  test("classifierEval: confusion counts, single-division ratios, exact tie-aware AUC") {
    // Hand-workable: scores with a tie straddling both classes.
    val rows = Seq(
      (1L, 0.9, 1), (2L, 0.5, 1), (3L, 0.5, 0), (4L, 0.1, 0),
      (5L, -0.2, 1), (6L, -0.2, 0), (7L, -0.7, 0)).toDF("doc_id", "s", "y")
    val r = TextAnalysis.classifierEval(rows, "s", "y", threshold = 0.0)
      .collect().head
    assert(r.getAs[Long]("n") == 7 && r.getAs[Long]("p") == 3 && r.getAs[Long]("n_neg") == 4)
    assert(r.getAs[Long]("tp") == 2 && r.getAs[Long]("fp") == 2)
    assert(r.getAs[Long]("tn") == 2 && r.getAs[Long]("fn") == 1)
    assert(r.getAs[Double]("precision") == 0.5)
    assert(r.getAs[Double]("recall") == 2.0 / 3)
    assert(r.getAs[Double]("f1") == 4.0 / 7)
    // Brute-force Mann-Whitney over the 3x4 pairs: wins + half-ties.
    val pos = Seq(0.9, 0.5, -0.2); val neg = Seq(0.5, 0.1, -0.2, -0.7)
    val num2 = (for (a <- pos; b <- neg) yield
      if (a > b) 2L else if (a == b) 1L else 0L).sum
    assert(r.getAs[Long]("auc_num2") == num2)
    assert(r.getAs[Double]("auc") == num2.toDouble / (2.0 * 3 * 4))
    // Randomized law: agrees with the brute-force pair count.
    val rnd = new scala.util.Random(77)
    val big = (0 until 300).map(i =>
      (i.toLong, math.floor(rnd.nextGaussian() * 5) / 10, rnd.nextInt(2)))
    val rb = TextAnalysis.classifierEval(
      big.toDF("doc_id", "s", "y"), "s", "y").collect().head
    val bp = big.filter(_._3 == 1).map(_._2); val bn = big.filter(_._3 == 0).map(_._2)
    val bnum2 = (for (a <- bp; b <- bn) yield
      if (a > b) 2L else if (a == b) 1L else 0L).sum
    assert(rb.getAs[Long]("auc_num2") == bnum2)
    // Bucketed prefix sum (default fanout) is identical to the plain
    // single-window spelling (fanout = 1) — exact integers both ways.
    val plain = TextAnalysis.classifierEval(
      big.toDF("doc_id", "s", "y"), "s", "y", fanout = 1).collect().head
    assert(plain.toSeq == rb.toSeq)
  }

  test("rocCurve: threshold sweep with exact cumulative counts; warm-start training law") {
    val rows = Seq(
      (1L, 0.9, 1), (2L, 0.5, 1), (3L, 0.5, 0), (4L, 0.1, 0),
      (5L, -0.2, 1), (6L, -0.2, 0), (7L, -0.7, 0)).toDF("doc_id", "s", "y")
    val curve = TextAnalysis.rocCurve(rows, "s", "y")
      .orderBy(col("score").desc)
      .as[(Double, Long, Long, Double, Double)].collect().toSeq
    // Distinct scores desc: 0.9, 0.5, 0.1, -0.2, -0.7.
    assert(curve.map(_._1) == Seq(0.9, 0.5, 0.1, -0.2, -0.7))
    assert(curve.map(c => (c._2, c._3)) ==
      Seq((1L, 0L), (2L, 1L), (2L, 2L), (3L, 3L), (3L, 4L)))
    // Curve ends at (TPR, FPR) = (1, 1); both rates are monotone.
    assert(curve.last._4 == 1.0 && curve.last._5 == 1.0)
    assert(curve.map(_._4) == curve.map(_._4).sorted)
    assert(curve.map(_._5) == curve.map(_._5).sorted)
    // The bucketed prefix sum is identical to the plain single-window
    // spelling at every fanout — including fanouts that split the
    // distinct scores across many part-empty buckets, and a
    // degenerate single-score frame (s_max == s_min).
    val rnd2 = new scala.util.Random(1234)
    val many = (0 until 500).map(i =>
      (i.toLong, math.floor(rnd2.nextGaussian() * 500) / 100, rnd2.nextInt(2)))
      .toDF("doc_id", "s", "y")
    def curveOf(df: org.apache.spark.sql.DataFrame, fanout: Int) =
      TextAnalysis.rocCurve(df, "s", "y", fanout = fanout)
        .orderBy(col("score")).collect().map(_.toSeq).toSeq
    val ref = curveOf(many, 1)
    for (f <- Seq(7, 64, 1000)) assert(curveOf(many, f) == ref,
      s"bucketed rocCurve diverged from the plain spelling at fanout=$f")
    val oneScore = Seq((1L, 0.5, 1), (2L, 0.5, 0)).toDF("doc_id", "s", "y")
    assert(curveOf(oneScore, 64) == curveOf(oneScore, 1))

    // Warm-start law: N iterations == K iterations + warm start of N-K
    // (the init frame resumes the exact fixed-point state).
    val d = (0 until 40).map { i =>
      val y = i % 2
      val tokens = if (y == 1) s"good quality text t$i" else s"junk spam words t$i"
      (i.toLong, tokens, y)
    }.toDF("doc_id", "text", "label")
    def w(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Double)].collect().map(r => (r._1, r._2)).toMap
    val full = w(TextAnalysis.classifierTrain(d, "label", dim = 64, iters = 9))
    val first5 = TextAnalysis.classifierTrain(d, "label", dim = 64, iters = 5)
    val resumed = w(TextAnalysis.classifierTrain(d, "label", dim = 64,
      iters = 4, init = first5))
    assert(resumed == full)
    // Init-only buckets carry through unchanged on a shrunken corpus.
    val tiny = d.limit(4)
    val resumedTiny = w(TextAnalysis.classifierTrain(tiny, "label", dim = 64,
      iters = 0, init = first5))
    assert(resumedTiny == w(first5))
    // (The r9 residual-broadcast gate law lived here; the r10 windowed
    // iteration removed the residual frame and its broadcast-vs-join
    // dispatch entirely — the randomized brute-force reference test
    // above now carries the full arithmetic pin.)
  }

  test("pipeline classifier branch: trained gate joins the verdict; disabled default unchanged") {
    // Train a quality model on planted seed docs, then arm the
    // pipeline's learned branch with it: the full deployment loop
    // (train -> pipeline) over the shared token index.
    val seed = ((0 until 20).map(i =>
      (i.toLong, s"insightful thorough analysis s$i filler words here", 1)) ++
      (20 until 40).map(i =>
        (i.toLong, s"spam garbage clickbait s$i filler words here", 0)))
      .toDF("doc_id", "text", "label")
    val dim = 128
    val trained = TextAnalysis.classifierTrain(seed, "label", dim = dim, iters = 12)
      .as[(Long, Long, Double)].collect()
    val wMap = trained.map(r => (r._1, r._3)).toMap
    val weights = (0 until dim).map(b => wMap.getOrElse(b.toLong, 0.0))
    val bias = wMap.getOrElse(-1L, 0.0)
    // Corpus: long-enough docs so the heuristic gate passes everything;
    // the learned gate must be the discriminating branch.
    def filler(tag: String) = (0 until 30).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq(
      (100L, s"insightful thorough analysis ${filler("a")}"),
      (101L, s"spam garbage clickbait ${filler("b")}")).toDF("doc_id", "text")
    val none = corpus.limit(0)
    val out = Curation.pipeline(corpus, none, minTokens = 5,
        maxTopGramFrac = 1.0, maxDupGramFrac = 1.0,
        classifierWeights = weights, classifierBias = bias)
      .orderBy("doc_id").collect()
    assert(out.map(_.schema.fieldNames.toSeq).head ==
      Seq("doc_id", "quality_keep", "classifier_keep", "dup_loser",
        "contaminated", "keep"))
    assert(out.forall(_.getAs[Boolean]("quality_keep")))
    assert(out(0).getAs[Boolean]("classifier_keep") &&
      out(0).getAs[Boolean]("keep"))
    assert(!out(1).getAs[Boolean]("classifier_keep") &&
      !out(1).getAs[Boolean]("keep"))
    // Disabled default: schema and verdicts exactly as before.
    val plain = Curation.pipeline(corpus, none, minTokens = 5,
        maxTopGramFrac = 1.0, maxDupGramFrac = 1.0)
      .orderBy("doc_id").collect()
    assert(plain.map(_.schema.fieldNames.toSeq).head ==
      Seq("doc_id", "quality_keep", "dup_loser", "contaminated", "keep"))
    assert(plain.forall(_.getAs[Boolean]("keep")))
    // classifierWordNgrams reaches the scorer: weights trained at
    // wordNgrams=1 and applied at 1 through the pipeline produce the
    // same verdicts as applying the model directly at wordNgrams=1
    // (before the fix the pipeline silently scored at the default 2 —
    // a mismatched feature map).
    val trained1 = TextAnalysis.classifierTrain(seed, "label", dim = dim,
        iters = 12, wordNgrams = 1).as[(Long, Long, Double)].collect()
    val wMap1 = trained1.map(r => (r._1, r._3)).toMap
    val weights1 = (0 until dim).map(b => wMap1.getOrElse(b.toLong, 0.0))
    val bias1 = wMap1.getOrElse(-1L, 0.0)
    val out1 = Curation.pipeline(corpus, none, minTokens = 5,
        maxTopGramFrac = 1.0, maxDupGramFrac = 1.0,
        classifierWeights = weights1, classifierBias = bias1,
        classifierWordNgrams = 1)
      .select("doc_id", "classifier_keep").as[(Long, Boolean)].collect().toMap
    val direct1 = TextAnalysis.classifierScore(corpus, weights1, bias1,
        wordNgrams = 1)
      .select(col("doc_id"),
        (when(col("n_grams") > 0, col("sum_w") / col("n_grams"))
          .otherwise(lit(0.0)) >= lit(0.0)).as("k"))
      .as[(Long, Boolean)].collect().toMap
    assert(out1 == direct1)
  }

  test("dhash_bands: native expression matches an independent reference; edits perturb locally") {
    // Independent reimplementation of the synthetic dHash (codepoint
    // sample grid -> gradient bits -> 16-bit bands) to pin the native
    // expression against — the BPE-spec pattern for non-SQL loops.
    def refBands(s: String): Seq[Int] = {
      val cps = s.codePoints().toArray
      val n = cps.length
      val grid = (0 until 72).map(k => if (n == 0) 0 else cps((k * n) / 72))
      val bands = Array.fill(4)(0)
      for (r <- 0 until 8; c <- 0 until 8)
        if (grid(r * 9 + c) < grid(r * 9 + c + 1))
          bands(r / 2) |= 1 << ((r % 2) * 8 + c)
      bands.toSeq
    }
    val sample = docs.limit(50).select(col("doc_id"), col("text"))
      .unionByName(Seq((900001L, ""), (900002L, "ab"),
        (900003L, "naïve café 中文 mixed")).toDF("doc_id", "text"))
    val got = sample
      .select(col("doc_id"), col("text"),
        graft.functions.dhash_bands(col("text")).as("bands"))
      .as[(Long, String, Seq[Int])].collect()
    got.foreach { case (id, text, bands) =>
      assert(bands == refBands(text), s"dhash mismatch at doc $id")
    }
    // A same-length first-character edit flips at most the bits whose
    // grid cells sample position 0 — the near-dup property the banded
    // join exploits.
    val long = "the quick brown fox jumps over the lazy dog " * 3 // n > 72
    val a = refBands(long)
    val b = refBands("x" + long.substring(1))
    val hamming = (0 until 4).map(k =>
      java.lang.Integer.bitCount(a(k) ^ b(k))).sum
    assert(hamming <= 1)
  }

  test("dhashPairs: planted same-length edits pair up and cluster; keep-one parity with text dedup") {
    // High-entropy per-doc texts: templated bodies would be genuine
    // near-dups of EACH OTHER under a perceptual hash (that's the
    // operator working, not a bug) and merge the planted clusters.
    val rnd = new scala.util.Random(4242)
    val base = (0 until 30).map(i =>
      (i.toLong, (0 until 40).map(_ =>
        Integer.toHexString(rnd.nextInt())).mkString(" ")))
      .toDF("doc_id", "text")
    val edited = base.select((col("doc_id") + 1000L).as("doc_id"),
      concat(lit("x"), expr("substring(text, 2)")).as("text"))
    val media = Multimodal.mediaFromDocuments(
      base.withColumn("source", lit("a"))
        .unionByName(edited.withColumn("source", lit("a"))))
    val pairs = Multimodal.dhashPairs(media, maxHamming = 8)
    val got = pairs.as[(Long, Long, Int)].collect()
    // Every planted (i, i+1000) pair is found at tiny Hamming.
    val planted = got.filter(p => p._2 - p._1 == 1000L)
    assert(planted.length == 30)
    assert(planted.forall(_._3 <= 2))
    // The pair frame drops straight into the shared clustering: every
    // component has exactly its planted pair (no accidental mergers on
    // this corpus), and keep-one retains the min id.
    val comp = Dedup.components(pairs).as[(Long, Long)].collect()
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert((0 until 30).forall(i =>
      comp.contains(Set(i.toLong, i + 1000L))))
    val winners = Dedup.components(pairs)
      .filter(col("component_id") === col("doc_id"))
      .as[(Long, Long)].collect().map(_._1).toSet
    assert((0 until 30).forall(i => winners.contains(i.toLong) &&
      !winners.contains(i + 1000L)))
  }

  test("captionConflicts: disagreeing captions on near-dup images flagged, agreeing suppressed; driver-replay law") {
    // Reuse the planted same-length-edit image corpus; captions:
    // originals keep their text, HALF the edited twins get a disjoint
    // spam caption (conflict), the other half get the original
    // caption plus one word (agree, Jaccard high).
    val rnd = new scala.util.Random(4242)
    val base = (0 until 30).map(i =>
      (i.toLong, (0 until 40).map(_ =>
        Integer.toHexString(rnd.nextInt())).mkString(" ")))
      .toDF("doc_id", "text")
    val edited = base.select((col("doc_id") + 1000L).as("doc_id"),
      concat(lit("x"), expr("substring(text, 2)")).as("text"),
      col("text").as("orig"))
    val media = Multimodal.mediaFromDocuments(
      base.withColumn("source", lit("a"))
        .unionByName(edited.drop("orig").withColumn("source", lit("a"))))
    // Spam tokens all contain 'z' (hex tokens never do) -> disjoint
    // sets, Jaccard exactly 0 for the planted conflicts.
    val captions = base.select(col("doc_id").as("media_id"),
        col("text").as("caption"))
      .unionByName(edited.select(col("doc_id").as("media_id"),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("zzspam zzwatermark zzstock zzphoto zz"),
            col("doc_id").cast("string")))
          .otherwise(concat(col("orig"), lit(" extraword")))
          .as("caption")))
    val pairs = Multimodal.dhashPairs(media, maxHamming = 8)
    val conflicts = Multimodal.captionConflicts(pairs, captions, 0.3)
      .as[(Long, Long, Int, Double)].collect()
    // Planted conflicts (even i): disjoint spam caption -> flagged.
    // Planted agreements (odd i): one extra token on 40 -> J ~ 40/41.
    val plantedPairs = conflicts.filter(p => p._2 - p._1 == 1000L)
    assert(plantedPairs.map(_._1).toSet == (0 until 30 by 2).map(_.toLong).toSet)
    assert(plantedPairs.forall(_._4 == 0.0))
    // Law: conflicts == driver replay of (pairs x caption jaccard).
    val capMap = captions.as[(Long, String)].collect().toMap
    def tk(s: String): Set[String] =
      s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    val want = pairs.as[(Long, Long, Int)].collect().flatMap { p =>
      val (ta, tb) = (tk(capMap(p._1)), tk(capMap(p._2)))
      val u = ta.union(tb).size
      val j = if (u == 0) 1.0
        else BigDecimal(ta.intersect(tb).size.toDouble / u)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if (j <= 0.3) Some((p._1, p._2)) else None
    }.toSet
    assert(conflicts.map(p => (p._1, p._2)).toSet == want)
  }

  test("dhashPairsDecoded: planted PNG near-duplicates pair; brightness-shift invariant; undecodable drops") {
    def png(w: Int, h: Int)(luma: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = math.max(0, math.min(255, luma(x, y)))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // Pattern values stay <= 180 so the +40 brightness copy never
    // clamps — every luma comparison is preserved exactly and dHash is
    // invariant (Hamming 0), the perceptual property under test.
    val pat = (x: Int, y: Int) => (x * 13 + y * 7) % 180
    val baseImg = png(100, 80)(pat)
    val brightImg = png(100, 80)((x, y) => pat(x, y) + 40)
    val otherImg = png(100, 80)((x, y) => 190 - ((x * 11 + y * 3) % 190))
    val junk = Array[Byte](1, 2, 3, 4, 5)
    val media = Seq(
      (1L, "image/png", "t", baseImg),
      (2L, "image/png", "t", brightImg),
      (3L, "image/png", "t", otherImg),
      (4L, "image/png", "t", junk))
      .toDF("media_id", "mime", "source", "payload")
    val got = Multimodal.dhashPairsDecoded(media, maxHamming = 8)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 2L, 0)))
  }

  test("audio_fp_bands: native expression matches an independent reference; edits perturb locally") {
    // Independent reimplementation of the Haitsma–Kalker fingerprint
    // (140-sample grid -> 17×4 integer band energies -> 48
    // difference-of-difference bits -> four 12-bit bands) to pin the
    // native expression against.
    def refBands(s: String): Seq[Int] = {
      val cps = s.codePoints().toArray
      val n = cps.length
      val sig = (0 until 140).map(k => if (n == 0) 0L else cps((k * n) / 140).toLong)
      def e(f: Int, b: Int): Long =
        (0 until 3).map(i => { val v = sig(f * 8 + b * 3 + i); v * v }).sum
      val bands = Array.fill(4)(0)
      for (f <- 1 until 17; b <- 0 until 3) {
        val cur = e(f, b) - e(f, b + 1)
        val prv = e(f - 1, b) - e(f - 1, b + 1)
        if (cur - prv > 0) bands((f - 1) / 4) |= 1 << (((f - 1) % 4) * 3 + b)
      }
      bands.toSeq
    }
    val sample = docs.limit(50).select(col("doc_id"), col("text"))
      .unionByName(Seq((900001L, ""), (900002L, "ab"),
        (900003L, "naïve café 中文 mixed")).toDF("doc_id", "text"))
    val got = sample
      .select(col("doc_id"), col("text"),
        graft.functions.audio_fp_bands(col("text")).as("bands"))
      .as[(Long, String, Seq[Int])].collect()
    got.foreach { case (id, text, bands) =>
      assert(bands == refBands(text), s"audio fp mismatch at doc $id")
    }
    // Keys are 12-bit by construction.
    got.foreach { case (_, _, bands) =>
      assert(bands.forall(b => b >= 0 && b < 4096))
    }
    // A same-length first-character edit on a long payload perturbs
    // only sample 0 -> energy E(0,0) -> difference bits touching frame
    // 0/band 0: at most the (f=1, b=0) bit.
    val long = "the quick brown fox jumps over the lazy dog " * 4 // n > 140
    val a = refBands(long)
    val b = refBands("x" + long.substring(1))
    val hamming = (0 until 4).map(k =>
      java.lang.Integer.bitCount(a(k) ^ b(k))).sum
    assert(hamming <= 1)
  }

  test("audioPairs: planted same-length edits pair; banded join finds exactly the band-sharing low-Hamming pairs") {
    val rnd = new scala.util.Random(777)
    val base = (0 until 30).map(i =>
      (i.toLong, (0 until 60).map(_ =>
        Integer.toHexString(rnd.nextInt())).mkString(" ")))
      .toDF("doc_id", "text")
    val edited = base.select((col("doc_id") + 1000L).as("doc_id"),
      concat(lit("x"), expr("substring(text, 2)")).as("text"))
    val media = Multimodal.mediaFromDocuments(
      base.withColumn("source", lit("a"))
        .unionByName(edited.withColumn("source", lit("a"))))
    val pairs = Multimodal.audioPairs(media, maxHamming = 8)
    val got = pairs.as[(Long, Long, Int)].collect()
    val planted = got.filter(p => p._2 - p._1 == 1000L)
    assert(planted.length == 30)
    assert(planted.forall(_._3 <= 1))
    // The banded join's contract, pinned brute-force: it returns
    // EXACTLY the pairs within the Hamming radius that share at least
    // one band key (a radius-8 pair with errors spread 2-2-2-2 across
    // all four bands is out of candidate reach by design — the same
    // recall trade every banded family in this engine documents).
    val fps = media
      .select(col("media_id"),
        graft.functions.audio_fp_bands(col("payload").cast("string")).as("b"))
      .as[(Long, Seq[Int])].collect().sortBy(_._1)
    val brute = (for {
      (ia, ba) <- fps; (ib, bb) <- fps if ia < ib
      if (0 until 4).exists(k => ba(k) == bb(k))
      h = (0 until 4).map(k => java.lang.Integer.bitCount(ba(k) ^ bb(k))).sum
      if h <= 8
    } yield (ia, ib, h)).toSet
    assert(got.toSet == brute)
  }

  test("audioPairsDecoded: re-leveled WAV copies pair at Hamming 0 (gain invariance); undecodable drops") {
    def wav(samples: Array[Short], rate: Int = 8000): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        data(2 * i) = (samples(i) & 0xFF).toByte
        data(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        rate.toFloat, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // Deterministic pseudo-noise in [-8192, 8191]; the "loud" copy is
    // 2× it EXACTLY, so band energies scale by exactly 4 and every
    // difference-of-differences sign is preserved — the fingerprint's
    // gain invariance with no rounding caveat.
    def noise(seed: Long, n: Int): Array[Short] = {
      var s = seed
      Array.fill(n) {
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 33) % 16384 - 8192).toShort
      }
    }
    val quiet = noise(1L, 2000)
    val loud = quiet.map(v => (v * 2).toShort)
    val other = noise(99L, 2000)
    val media = Seq(
      (1L, "audio/wav", "t", wav(loud)),
      (2L, "audio/wav", "t", wav(quiet)),
      (3L, "audio/wav", "t", wav(other)),
      (4L, "audio/wav", "t", Array[Byte](9, 9, 9)))
      .toDF("media_id", "mime", "source", "payload")
    val got = Multimodal.audioPairsDecoded(media, maxHamming = 8)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((1L, 2L, 0)))
  }


  test("pickThreshold: precision- and FPR-targeted picks, empty when uncalibratable") {
    // Hand-workable curve (from the rocCurve fixture): distinct scores
    // desc 0.9, 0.5, 0.1, -0.2, -0.7 with cum (tp, fp) =
    // (1,0) (2,1) (2,2) (3,3) (3,4); P=3, N=4.
    val rows = Seq(
      (1L, 0.9, 1), (2L, 0.5, 1), (3L, 0.5, 0), (4L, 0.1, 0),
      (5L, -0.2, 1), (6L, -0.2, 0), (7L, -0.7, 0)).toDF("doc_id", "s", "y")
    val roc = TextAnalysis.rocCurve(rows, "s", "y")
    // precision >= 0.6: candidates 0.9 (1/1) and 0.5 (2/3); max recall
    // wins -> threshold 0.5.
    val p6 = TextAnalysis.pickThreshold(roc, targetPrecision = Some(0.6)).collect()
    assert(p6.length == 1)
    assert(p6.head.getAs[Double]("threshold") == 0.5)
    assert(p6.head.getAs[Long]("cum_tp") == 2 && p6.head.getAs[Long]("cum_fp") == 1)
    assert(p6.head.getAs[Double]("precision") == 2.0 / 3)
    // fpr <= 0.5: candidates 0.9 (0/4), 0.5 (1/4), 0.1 (2/4); max tpr
    // is shared by 0.5 and 0.1 -> fewer false positives wins (0.5).
    val f5 = TextAnalysis.pickThreshold(roc, targetFpr = Some(0.5)).collect()
    assert(f5.length == 1)
    assert(f5.head.getAs[Double]("threshold") == 0.5)
    assert(f5.head.getAs[Double]("fpr") == 0.25)
    // Unreachable target: zero rows, not an arbitrary pick.
    assert(TextAnalysis.pickThreshold(roc,
      targetPrecision = Some(1.5)).collect().isEmpty)
    // Exactly one target must be set.
    intercept[IllegalArgumentException] {
      TextAnalysis.pickThreshold(roc)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.pickThreshold(roc, Some(0.5), Some(0.5))
    }
  }

  test("pipelineWithCalibratedGate: the derived threshold reproduces the hand-set pipeline") {
    // Train on planted seeds, calibrate ON the seed set at a precision
    // its margins can reach, and check the calibrated pipeline equals
    // pipeline() with the picked threshold passed by hand.
    val seed = ((0 until 20).map(i =>
      (i.toLong, s"insightful thorough analysis s$i filler words here", 1)) ++
      (20 until 40).map(i =>
        (i.toLong, s"spam garbage clickbait s$i filler words here", 0)))
      .toDF("doc_id", "text", "label")
    val dim = 128
    val trained = TextAnalysis.classifierTrain(seed, "label", dim = dim, iters = 12)
      .as[(Long, Long, Double)].collect()
    val wMap = trained.map(r => (r._1, r._3)).toMap
    val weights = (0 until dim).map(b => wMap.getOrElse(b.toLong, 0.0))
    val bias = wMap.getOrElse(-1L, 0.0)
    def filler(tag: String) = (0 until 30).map(i => s"$tag$i").mkString(" ")
    val corpus = Seq(
      (100L, s"insightful thorough analysis ${filler("a")}"),
      (101L, s"spam garbage clickbait ${filler("b")}")).toDF("doc_id", "text")
    val none = corpus.limit(0)
    val calibrated = Curation.pipelineWithCalibratedGate(
        corpus, none, calibDocs = seed, labelCol = "label",
        targetPrecision = 0.9, classifierWeights = weights,
        classifierBias = bias, minTokens = 5,
        maxTopGramFrac = 1.0, maxDupGramFrac = 1.0)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    // Reproduce the pick by hand and compare verdict frames.
    val scored = TextAnalysis.classifierScore(seed, weights, bias)
      .withColumn("margin", when(col("n_grams") > 0,
        col("sum_w") / col("n_grams")).otherwise(lit(0.0)))
      .join(seed.select(col("doc_id"), col("label")), "doc_id")
    val pick = TextAnalysis.pickThreshold(
      TextAnalysis.rocCurve(scored, "margin", "label"),
      targetPrecision = Some(0.9)).collect()
    assert(pick.length == 1)
    val thr = pick.head.getAs[Double]("threshold")
    val manual = Curation.pipeline(corpus, none, minTokens = 5,
        maxTopGramFrac = 1.0, maxDupGramFrac = 1.0,
        classifierWeights = weights, classifierBias = bias,
        classifierMinMargin = thr)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(calibrated == manual)
    // A separable seed set calibrates to a gate that keeps the good
    // doc and drops the junk one.
    assert(calibrated.length == 2)
    // An unreachable precision target fails loudly.
    intercept[IllegalArgumentException] {
      Curation.pipelineWithCalibratedGate(
        corpus, none, calibDocs = seed, labelCol = "label",
        targetPrecision = 1.5, classifierWeights = weights,
        classifierBias = bias, minTokens = 5,
        maxTopGramFrac = 1.0, maxDupGramFrac = 1.0)
    }
  }

  test("weightedBernoulli / weightedRepeat: rate calibration, determinism, explode accounting") {
    val d = docs
    val ws = Sampling.weightedBernoulli(d, col("doc_id"), col("n_chars"), 0.3, "t1")
    val rows = ws.select(col("doc_id"), col("p"), col("keep"))
      .as[(Long, Double, Boolean)].collect()
    assert(rows.length == d.count())
    // p in [0,1], and expected kept fraction ~ targetRate when unclamped.
    assert(rows.forall(r => r._2 >= 0.0 && r._2 <= 1.0))
    val expected = rows.map(_._2).sum
    val kept = rows.count(_._3)
    assert(math.abs(kept - expected) < 4 * math.sqrt(expected + 1))
    // Longer docs are proportionally likelier: p strictly ordered by weight.
    val byChars = d.select(col("doc_id"), col("n_chars")).as[(Long, Long)].collect().toMap
    val pmap = rows.map(r => (r._1, r._2)).toMap
    for (a <- byChars.keys; b <- byChars.keys
         if byChars(a) < byChars(b) && pmap(b) < 1.0)
      assert(pmap(a) <= pmap(b))
    // Determinism across runs.
    val again = Sampling.weightedBernoulli(d, col("doc_id"), col("n_chars"), 0.3, "t1")
      .select(col("doc_id"), col("keep")).as[(Long, Boolean)].collect().toMap
    assert(rows.map(r => (r._1, r._3)).toMap == again)

    val rep = Sampling.weightedRepeat(d, col("doc_id"), col("n_chars"), 2.0, "t1")
      .select(col("doc_id"), col("n_copies")).as[(Long, Long)].collect()
    assert(rep.length == d.count())
    val total = rep.map(_._2).sum
    assert(math.abs(total - 2.0 * rep.length) < 6 * math.sqrt(2.0 * rep.length))
    // Exploded frame: one row per copy, copy_idx 0..n_copies-1.
    val expl = Sampling.weightedRepeat(d, col("doc_id"), col("n_chars"), 2.0, "t1",
        exploded = true)
      .groupBy("doc_id").agg(count(lit(1)).as("c"), max("copy_idx").as("mx"),
        min("copy_idx").as("mn"), first("n_copies").as("nc"))
      .as[(Long, Long, Long, Long, Long)].collect()
    val repMap = rep.toMap
    assert(expl.forall(r => r._2 == repMap(r._1) && r._5 == repMap(r._1) &&
      r._4 == 0L && r._3 == repMap(r._1) - 1))
    assert(expl.map(_._1).toSet == rep.filter(_._2 > 0).map(_._1).toSet)
    // Negative weights are rejected at runtime.
    val neg = Seq((1L, -5L), (2L, 3L)).toDF("doc_id", "w")
    intercept[Exception] {
      Sampling.weightedBernoulli(neg, col("doc_id"), col("w"), 0.5).collect()
    }
    // All-zero weights: a clear error, not an ANSI division crash.
    val zeros = Seq((1L, 0L), (2L, 0L)).toDF("doc_id", "w")
    val e1 = intercept[Exception] {
      Sampling.weightedBernoulli(zeros, col("doc_id"), col("w"), 0.5).collect()
    }
    assert(e1.getMessage.contains("all weights are zero"))
    val e2 = intercept[Exception] {
      Sampling.weightedRepeat(zeros, col("doc_id"), col("w"), 2.0).collect()
    }
    assert(e2.getMessage.contains("all weights are zero"))
    // NULL weights: loud error (sum() would silently skip them and
    // the null rows' keep/n_copies fate would be undefined downstream).
    val nulls = Seq((1L, Some(5L)), (2L, None)).toDF("doc_id", "w")
    val e3 = intercept[Exception] {
      Sampling.weightedBernoulli(nulls, col("doc_id"), col("w"), 0.5).collect()
    }
    assert(e3.getMessage.contains("NULL weights"))
    val e4 = intercept[Exception] {
      Sampling.weightedRepeat(nulls, col("doc_id"), col("w"), 2.0).collect()
    }
    assert(e4.getMessage.contains("NULL weights"))
  }

  test("classifierEvalByGroup: per-slice rows sum to the global row; per-group AUC is brute-exact") {
    val rnd = new scala.util.Random(99)
    val rows = (0 until 240).map { i =>
      (i.toLong, s"g${i % 3}", math.floor(rnd.nextGaussian() * 5) / 10, rnd.nextInt(2))
    }
    val df = rows.toDF("doc_id", "grp_in", "s", "y")
    val per = TextAnalysis.classifierEvalByGroup(df, "s", "y", "grp_in", threshold = 0.1)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(per.keySet == Set("g0", "g1", "g2"))
    // Slices sum to the global confusion row at the same threshold.
    val global = TextAnalysis.classifierEval(df, "s", "y", threshold = 0.1).collect().head
    for (f <- Seq("n", "p", "n_neg", "tp", "fp", "tn", "fn"))
      assert(per.values.map(_.getAs[Long](f)).sum == global.getAs[Long](f), f)
    // Per-group AUC numerator matches the brute-force pair count.
    for (gname <- Seq("g0", "g1", "g2")) {
      val grp = rows.filter(_._2 == gname)
      val pos = grp.filter(_._4 == 1).map(_._3); val neg = grp.filter(_._4 == 0).map(_._3)
      val num2 = (for (a <- pos; b <- neg) yield
        if (a > b) 2L else if (a == b) 1L else 0L).sum
      assert(per(gname).getAs[Long]("auc_num2") == num2, gname)
    }
    // Single-class group: NaN AUC surfaced, integer columns still exact.
    val oneClass = Seq((1L, "solo", 0.5, 1), (2L, "solo", 0.2, 1)).toDF("doc_id", "grp_in", "s", "y")
    val solo = TextAnalysis.classifierEvalByGroup(oneClass, "s", "y", "grp_in").collect().head
    assert(solo.getAs[Long]("p") == 2 && solo.getAs[Long]("n_neg") == 0)
    assert(solo.getAs[Long]("auc_num2") == 0 && solo.getAs[Double]("auc").isNaN)
  }

  test("scoreRanks: bucketed chain ≡ plain window; competition ties; asc/desc; NaN greatest; NULL raises") {
    val df = Seq(
      (1L, "a", 5.0), (2L, "a", 5.0), (3L, "a", 3.0), (4L, "b", 7.0),
      (5L, "b", 3.0), (6L, "b", 3.0), (7L, "b", 1.0)).toDF("id", "grp", "s")
    def byId(r: DataFrame): Seq[(Long, Long, Long)] =
      r.select(col("id"), col("rank"), col("n_group")).collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).sortBy(_._1).toSeq
    // Global descending: 7,5,5,3,3,3,1 → competition ranks 1,2,2,4,4,4,7.
    val plainG = byId(Ranking.scoreRanks(df, "s", Nil, ascending = false, fanout = 1))
    assert(plainG == Seq((1L, 2L, 7L), (2L, 2L, 7L), (3L, 4L, 7L),
      (4L, 1L, 7L), (5L, 4L, 7L), (6L, 4L, 7L), (7L, 7L, 7L)))
    // Bucketed spelling is bit-identical (fanout wider than the
    // distinct-score count exercises empty buckets too).
    for (f <- Seq(2, 4, 64))
      assert(byId(Ranking.scoreRanks(df, "s", Nil, ascending = false, fanout = f)) == plainG)
    // Grouped: a = (5,5,3) → 1,1,3 of 3; b = (7,3,3,1) → 1,2,2,4 of 4.
    val plainGr = byId(Ranking.scoreRanks(df, "s", Seq("grp"), ascending = false, fanout = 1))
    assert(plainGr == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 3L, 3L),
      (4L, 1L, 4L), (5L, 2L, 4L), (6L, 2L, 4L), (7L, 4L, 4L)))
    assert(byId(Ranking.scoreRanks(df, "s", Seq("grp"), ascending = false, fanout = 4)) == plainGr)
    // Ascending flips the order: global 1,3,3,3,5,5,7 → 1,2,2,2,5,5,7.
    val asc = byId(Ranking.scoreRanks(df, "s", Nil, ascending = true, fanout = 4))
    assert(asc == Seq((1L, 5L, 7L), (2L, 5L, 7L), (3L, 2L, 7L),
      (4L, 7L, 7L), (5L, 2L, 7L), (6L, 2L, 7L), (7L, 1L, 7L)))
    // NaN compares greater than every real double → rank 1 descending,
    // last ascending; identical in both spellings.
    val withNaN = Seq((1L, 2.0), (2L, Double.NaN), (3L, 1.0)).toDF("id", "s")
    for (f <- Seq(1, 4)) {
      val d = Ranking.scoreRanks(withNaN, "s", Nil, ascending = false, fanout = f)
        .select("id", "rank").collect().map(x => (x.getLong(0), x.getLong(1))).toMap
      assert(d == Map(2L -> 1L, 1L -> 2L, 3L -> 3L), s"desc fanout=$f")
      val a = Ranking.scoreRanks(withNaN, "s", Nil, ascending = true, fanout = f)
        .select("id", "rank").collect().map(x => (x.getLong(0), x.getLong(1))).toMap
      assert(a == Map(3L -> 1L, 1L -> 2L, 2L -> 3L), s"asc fanout=$f")
    }
    // NULL scores have no rank position: loud error, not a silent row.
    val withNull = Seq((1L, Some(2.0)), (2L, None)).toDF("id", "s")
    for (f <- Seq(1, 4))
      intercept[Exception] {
        Ranking.scoreRanks(withNull, "s", Nil, ascending = false, fanout = f).collect()
      }
  }

  test("rankTiles + pplBuckets: exact DIV tiles, ties share a tile, head = lowest perplexity") {
    // 9 distinct scores, tiles=3 → exactly 3/3/3.
    val nine = (1 to 9).map(i => (i.toLong, 100.0 - i)).toDF("id", "s")
    val t9 = Ranking.rankTiles(nine, "s", 3, fanout = 4)
      .select("id", "tile").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert((1 to 9).forall(i => t9(i.toLong) == (i - 1) / 3))
    // A tie mass straddling the cut lands in ONE tile: scores
    // 9,5,5,5,1 tiles=3 → ranks 1,2,2,2,5 → tiles 0,0,0,0,2 (the
    // shared rank keeps all three 5s together; no 1/2 split).
    val tied = Seq((1L, 9.0), (2L, 5.0), (3L, 5.0), (4L, 5.0), (5L, 1.0)).toDF("id", "s")
    val tt = Ranking.rankTiles(tied, "s", 3, fanout = 4)
      .select("id", "tile").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(tt == Map(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 2))
    // pplBuckets on the corpus: head/middle/tail populations within
    // one tie mass of N/3, and bucket order tracks avg_p — every head
    // avg_p >= every middle >= every tail.
    val pb = TextAnalysis.pplBuckets(docs, tiles = 3, fanout = 8)
      .select("avg_p", "bucket").collect()
    val byBucket = pb.groupBy(_.getString(1)).view.mapValues(_.map(_.getDouble(0))).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"))
    // Equal scores share a rank, hence a tile — so bucket ranges can
    // never overlap: every head avg_p >= every middle >= every tail.
    assert(byBucket("head").min >= byBucket("middle").max)
    assert(byBucket("middle").min >= byBucket("tail").max)
    // Per-source variant ranks within each source independently.
    val ps = TextAnalysis.pplBuckets(docs, tiles = 3, perSource = true, fanout = 8)
    val perSrc = ps.groupBy("source").agg(
      max(when(col("bucket") === "head", col("rank"))).as("max_head_rank"),
      max(col("n_group")).as("n")).collect()
    perSrc.foreach { r =>
      assert(r.getAs[Long]("max_head_rank") <= r.getAs[Long]("n") / 3 + 1)
    }
  }

  test("rankFusion: per-signal competition ranks match RANK(); rrf is the fixed-order reciprocal sum") {
    val df = Seq(
      (1L, 10L, 1L), (2L, 8L, 2L), (3L, 8L, 9L), (4L, 2L, 4L)).toDF("id", "s1", "s2")
    val fused = Ranking.rankFusion(df, Seq(("s1", true), ("s2", true)), k = 60, fanout = 2)
      .select("id", "rank_s1", "rank_s2", "rrf").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // s1 desc: 10,8,8,2 → 1,2,2,4; s2 desc: 9,4,2,1 → id3=1, id4=2, id2=3, id1=4.
    assert(fused(1L)._1 == 1 && fused(2L)._1 == 2 && fused(3L)._1 == 2 && fused(4L)._1 == 4)
    assert(fused(3L)._2 == 1 && fused(4L)._2 == 2 && fused(2L)._2 == 3 && fused(1L)._2 == 4)
    def rrf(a: Long, b: Long): Double = 1.0 / (60.0 + a) + 1.0 / (60.0 + b)
    fused.foreach { case (_, (r1, r2, v)) => assert(v == rrf(r1, r2)) }
    // The fused winner beats a doc that is top on one signal but weak
    // on the other only when its rank sum is better: id3 (2,1) > id1 (1,4).
    assert(fused(3L)._3 > fused(1L)._3)
  }

  test("splitRepair: one side per leak quarantined, eval side kept, re-audit clean, tie → id_b") {
    val splits = Sampling.splitAssign(docs, col("doc_id"),
      Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125), "s1")
      .select(col("doc_id"), col("split"))
    val leaks = Curation.splitLeakage(docs, splits,
      shingleN = 3, jaccard = 0.8, maxShingleDf = 10)
    val leakRows = leaks.collect()
    assert(leakRows.nonEmpty, "gate corpus must produce straddling pairs")
    val repaired = Curation.splitRepair(splits, leaks)
    val status = repaired.collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getString(1), r.getString(2))).toMap
    val prio = Map("test" -> 0, "val" -> 1, "train" -> 2)
    leakRows.foreach { r =>
      val (a, b) = (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))
      val aQ = status(a)._2 == "quarantined"
      val bQ = status(b)._2 == "quarantined"
      assert(aQ || bQ, s"pair ($a,$b) untouched")
      // The side that KEPT its split is never the lower-priority one.
      val (pa, pb) = (prio(r.getString(2)), prio(r.getString(3)))
      if (pa < pb) assert(!aQ, s"higher-priority $a quarantined") // a outranks b → b leaves
      if (pb < pa) assert(!bQ, s"higher-priority $b quarantined")
    }
    // Non-quarantined docs keep their split verbatim.
    status.values.foreach { case (s0, s1) => assert(s1 == s0 || s1 == "quarantined") }
    // Re-audit: restrict the assignment to surviving docs — no leak
    // pair survives with both members present.
    val surviving = status.collect { case (id, (_, s)) if s != "quarantined" => id }.toSet
    leakRows.foreach { r =>
      assert(!(surviving(r.getAs[Long]("id_a")) && surviving(r.getAs[Long]("id_b"))))
    }
    // Splits outside the priority list rank below all named ones, and
    // an unlisted-vs-unlisted tie drops id_b (the pair order's higher id).
    val oddSplits = Seq((1L, "x"), (2L, "y"), (3L, "test")).toDF("doc_id", "split")
    val oddLeaks = Seq((1L, 2L, "x", "y", 0.9), (2L, 3L, "y", "test", 0.9))
      .toDF("id_a", "id_b", "split_a", "split_b", "jaccard")
    val odd = Curation.splitRepair(oddSplits, oddLeaks).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getString(2)).toMap
    assert(odd(2L) == "quarantined") // ties toward id_b; y loses to test too
    assert(odd(1L) == "x" && odd(3L) == "test")
  }

  test("tileThresholds + applyTileThresholds: self-application law, frozen-cutoff bucketing, NaN/unseen-group policy") {
    val base = Seq((1L, "a", 9.0), (2L, "a", 7.0), (3L, "a", 5.0),
      (4L, "a", 5.0), (5L, "a", 1.0), (6L, "b", 4.0), (7L, "b", 2.0))
      .toDF("id", "grp", "s")
    val tiled = Ranking.rankTiles(base, "s", 3, Seq("grp"), fanout = 4)
    val th = Ranking.tileThresholds(tiled, "s", Seq("grp"))
    // Cutoff = inclusive inner bound (min per tile descending):
    // grp a tiles {9,7},{5,5},{1} → 7,5,1; grp b {4},{2} → 4,2.
    val thMap = th.collect()
      .map(r => (r.getString(0), r.getInt(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    assert(thMap == Map(("a", 0) -> (7.0, 2L), ("a", 1) -> (5.0, 2L),
      ("a", 2) -> (1.0, 1L), ("b", 0) -> (4.0, 1L), ("b", 1) -> (2.0, 1L)))
    // LAW: applying a corpus's own thresholds back to it reproduces
    // rankTiles' assignment exactly (tie mass shares a tile, so tile
    // score ranges never overlap).
    val self = Ranking.applyTileThresholds(base, th, "s", Seq("grp"))
      .select("id", "tile").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val want = tiled.select("id", "tile").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(self == want)
    // Frozen cutoffs bucket NEW scores: above all → 0, in a gap → the
    // tile whose bound it clears, below all → clamped last, NaN
    // (compares greatest) → 0; unseen groups are dropped (inner join).
    val nw = Seq((10L, "a", 100.0), (11L, "a", 6.0), (12L, "a", 0.0),
      (13L, "a", Double.NaN), (14L, "c", 5.0), (15L, "b", 3.0))
      .toDF("id", "grp", "s")
    val applied = Ranking.applyTileThresholds(nw, th, "s", Seq("grp"))
      .select("id", "tile").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(applied == Map(10L -> 0, 11L -> 1, 12L -> 2, 13L -> 0, 15L -> 1))
    // Ascending orientation flips the bound direction (max per tile).
    val asc = Ranking.applyTileThresholds(
      Seq((20L, 0.5), (21L, 3.5), (22L, 9.9)).toDF("id", "s"),
      Ranking.tileThresholds(
        Ranking.rankTiles(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0),
          (5L, 5.0), (6L, 6.0)).toDF("id", "s"), "s", 3,
          ascending = true, fanout = 4),
        "s", ascending = true),
      "s", ascending = true)
      .select("id", "tile").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(asc == Map(20L -> 0, 21L -> 1, 22L -> 2))
  }

  test("clusterStats: seeded stats exact on planted clusters; trained-index twin; shares sum to 1") {
    // Two orthogonal families; seeds = the two lowest vec_ids. Vector
    // 7 sits at 45° (cos .707107 to both) and tie-breaks to cid 0.
    val e = Seq(
      (1L, Seq(1.0, 0.0, 0.0)), (2L, Seq(0.0, 1.0, 0.0)),
      (3L, Seq(1.0, 0.0, 0.0)), (4L, Seq(2.0, 0.0, 0.0)),
      (5L, Seq(0.0, 3.0, 0.0)), (6L, Seq(0.0, 1.0, 0.0)),
      (7L, Seq(1.0, 1.0, 0.0))).toDF("vec_id", "embedding")
    val st = Similarity.clusterStatsSeeded(e, 2).collect()
      .map(r => r.getInt(0) -> (r.getAs[Long]("n_vecs"),
        r.getAs[Double]("sum_cos"), r.getAs[Double]("mean_cos"),
        r.getAs[Double]("share"))).toMap
    assert(st(0)._1 == 4 && st(1)._1 == 3)
    assert(st(0)._2 == 3.707107 && st(1)._2 == 3.0) // exact decimal sums
    assert(st(0)._3 == 3.707107 / 4 && st(1)._3 == 1.0)
    assert(st(0)._4 == 4.0 / 7 && st(1)._4 == 3.0 / 7)
    // Trained-index twin: same schema, k rows at most, shares
    // partition the corpus, tightness bounded by 1 + rounding.
    val tw = Similarity.clusterStats(Similarity.buildIvfIndex(emb, 4))
    assert(tw.columns.toSeq ==
      Seq("cid", "n_vecs", "sum_cos", "mean_cos", "share"))
    val rows = tw.collect()
    assert(rows.nonEmpty && rows.length <= 4)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    assert(rows.forall(_.getAs[Double]("mean_cos") <= 1.000001))
  }

  test("groupQuantiles: matches Spark's percentile aggregate, global and grouped, through ties and n=1") {
    // Grouped with ties: independent reference = Spark's own exact
    // percentile aggregate (same type-7 interpolation, different
    // plan: in-memory value map vs the distinct-rank lookup).
    val df = Seq(
      ("a", 1.0), ("a", 3.0), ("a", 3.0), ("a", 7.0), ("a", 10.0),
      ("b", 5.0), ("b", 2.0), ("c", 42.0)).toDF("grp", "v")
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = Ranking.groupQuantiles(df, "v", qs, Seq("grp"), fanout = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(4))
      .toMap
    val want = df.groupBy("grp")
      .agg(expr(s"percentile(v, array(${qs.mkString(",")}))").as("p"))
      .collect().flatMap(r =>
        qs.zip(r.getSeq[Double](1)).map { case (q, v) => (r.getString(0), q) -> v })
      .toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-12, s"$k: $v vs ${want(k)}") }
    // v_lo / v_hi bracket the position: q=0.5 over grp a (n=5) is the
    // exact middle value, integer position → v_lo == v_hi == value.
    val mid = Ranking.groupQuantiles(df, "v", Seq(0.5), Seq("grp"), fanout = 4)
      .filter(col("grp") === "a").collect().head
    assert(mid.getDouble(2) == 3.0 && mid.getDouble(3) == 3.0 &&
      mid.getDouble(4) == 3.0)
    // Global (no group) spelling, plain vs bucketed identical.
    val g1 = Ranking.groupQuantiles(df, "v", Seq(0.5), Nil, fanout = 1)
      .collect().head.getDouble(3)
    val g4 = Ranking.groupQuantiles(df, "v", Seq(0.5), Nil, fanout = 4)
      .collect().head.getDouble(3)
    assert(g1 == g4)
  }

  test("corpusChurn: per-status counts and churn fraction on a planted snapshot pair") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("doc_id", "text")
    val nw = Seq((1L, "a"), (2L, "B"), (4L, "d"), (5L, "e")).toDF("doc_id", "text")
    val r = Profiling.corpusChurn(old, nw).collect().head
    assert(r.getAs[Long]("n_union") == 5 && r.getAs[Long]("n_added") == 1 &&
      r.getAs[Long]("n_removed") == 1 && r.getAs[Long]("n_changed") == 1 &&
      r.getAs[Long]("n_unchanged") == 2)
    assert(r.getAs[Double]("churn_frac") == 3.0 / 5)
    // Identity law: a snapshot churns zero against itself.
    val id = Profiling.corpusChurn(old, old).collect().head
    assert(id.getAs[Double]("churn_frac") == 0.0 &&
      id.getAs[Long]("n_unchanged") == 4)
  }

  test("embeddingHealth: zero/non-finite/ragged detection, norm quartiles on planted vectors") {
    val planted = Seq(
      (1L, Seq(3.0f, 4.0f)),            // norm 5
      (2L, Seq(0.0f, 0.0f)),            // zero vector
      (3L, Seq(Float.NaN, 1.0f)),       // non-finite
      (4L, Seq(1.0f, 0.0f, 0.0f)),      // ragged dim 3, norm 1
      (5L, Seq(6.0f, 8.0f))             // norm 10
    ).toDF("vec_id", "embedding")
    val h = Similarity.embeddingHealth(planted).collect().head
    assert(h.getAs[Long]("n_vecs") == 5 && h.getAs[Long]("n_zero") == 1)
    assert(h.getAs[Long]("n_nonfinite") == 1)
    assert(h.getAs[Long]("dim_min") == 2 && h.getAs[Long]("dim_max") == 3)
    // Norms sorted: 0, 1, 5, 10, NaN (greatest) → q25 pos 2 → 1;
    // q50 pos 3 → 5; q75 pos 4 → 10.
    assert(h.getAs[Double]("norm_q25") == 1.0)
    assert(h.getAs[Double]("norm_q50") == 5.0)
    assert(h.getAs[Double]("norm_q75") == 10.0)
    // Real corpus: clean by construction.
    val r = Similarity.embeddingHealth(emb).collect().head
    assert(r.getAs[Long]("n_zero") == 0 && r.getAs[Long]("n_nonfinite") == 0)
    assert(r.getAs[Long]("dim_min") == r.getAs[Long]("dim_max"))
    assert(r.getAs[Double]("norm_q25") <= r.getAs[Double]("norm_q50") &&
      r.getAs[Double]("norm_q50") <= r.getAs[Double]("norm_q75"))
  }

  test("mixturePlan: inventory × target shares → rate/epochs/deficit; unlisted plans to zero") {
    val df = Seq(("a", 8), ("a", 2), ("b", 5), ("c", 100))
      .toDF("source", "nt")
    val plan = Sampling.mixturePlan(df, col("source"), col("nt"),
      Map("a" -> 0.5, "b" -> 0.5), budgetTokens = 30L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("target_tokens"), r.getAs[Double]("rate"),
          r.getAs[Double]("epochs"), r.getAs[Boolean]("deficit"))).toMap
    // a: 10 tokens toward a 15-token target → rate caps at 1, epochs
    // 1.5, deficit; b: 5 toward 15 → epochs 3; c unlisted → zero plan,
    // still visible.
    assert(plan("a") == ((2L, 10L, 15L, 1.0, 1.5, true)))
    assert(plan("b") == ((1L, 5L, 15L, 1.0, 3.0, true)))
    assert(plan("c") == ((1L, 100L, 0L, 0.0, 0.0, false)))
  }

  test("mixturePlanByTemperature: alpha=1 keeps natural proportions, alpha=0.5 up-weights the tail, zero strata plan to zero") {
    val df = Seq.fill(90)(("big", 10)) ++ Seq.fill(10)(("small", 10)) ++
      Seq(("empty", 0))
    val frame = df.toDF("source", "nt")
    def planOf(alpha: Double) =
      Sampling.mixturePlanByTemperature(frame, col("source"), col("nt"),
        alpha, budgetTokens = 1000L)
        .collect().map(r => r.getString(0) ->
          (r.getAs[Double]("target_share"), r.getAs[Long]("target_tokens"),
            r.getAs[Double]("rate"), r.getAs[Boolean]("deficit"))).toMap
    // alpha = 1: shares are the natural token proportions (900:100:0).
    val nat = planOf(1.0)
    assert(nat("big")._1 == 0.9 && nat("small")._1 == 0.1)
    assert(nat("empty") == ((0.0, 0L, 0.0, false)))
    // alpha = 0.5: sqrt(900):sqrt(100) = 3:1 — the tail triples its
    // share (0.1 → 0.25) and the head gives it up.
    val half = planOf(0.5)
    assert(half("big")._1 == 0.75 && half("small")._1 == 0.25)
    // The small stratum's 250-token target exceeds its 100 available:
    // epochs > 1 and deficit, the weightedRepeat signal.
    assert(half("small")._2 == 250L && half("small")._4)
    assert(half("small")._3 == 1.0) // rate caps at 1
    assert(half("empty") == ((0.0, 0L, 0.0, false)))
    // alpha = 0: uniform over NON-EMPTY strata only. pow(0.0, 0.0) =
    // 1.0, so an unguarded weight would hand the empty stratum a full
    // uniform share of budget it cannot supply (ADVICE r11).
    val unif = planOf(0.0)
    assert(unif("big")._1 == 0.5 && unif("small")._1 == 0.5)
    assert(unif("big")._2 == 500L && unif("small")._2 == 500L)
    assert(unif("empty") == ((0.0, 0L, 0.0, false)))
    intercept[IllegalArgumentException] {
      Sampling.mixturePlanByTemperature(frame, col("source"), col("nt"),
        alpha = 1.5, budgetTokens = 1000L)
    }
  }

  test("mixturePlan: a zero-token stratum pins rate/epochs to 0 and flags its target as deficit") {
    // ADVICE r10: 0 (or all-NULL) token inventories must not leak a
    // NULL/NaN division into the samplers — the stratum can supply
    // nothing, so it plans to zero LOUDLY (deficit iff target > 0).
    val df = Seq(("a", Some(10)), ("z", Some(0)), ("z", Some(0)),
      ("n", None: Option[Int]))
      .toDF("source", "nt")
    val plan = Sampling.mixturePlan(df, col("source"), col("nt"),
      Map("a" -> 0.2, "z" -> 0.5, "n" -> 0.3), budgetTokens = 10L)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("rate"), r.getAs[Double]("epochs"),
          r.getAs[Boolean]("deficit"))).toMap
    assert(plan("a") == ((0.2, 0.2, false)))
    assert(plan("z") == ((0.0, 0.0, true)))
    assert(plan("n") == ((0.0, 0.0, true)))
  }

  test("PSL wire-format parser + published algorithm: wildcard, exception, default rules match the publicsuffix.org test vectors") {
    // Fixture list in the real public_suffix_list.dat format —
    // comments, whitespace tails, wildcard and exception rules.
    val dat =
      """// ===BEGIN ICANN DOMAINS===
        |com
        |uk
        |co.uk
        |jp
        |ac.jp
        |*.ck
        |!www.ck
        |*.kobe.jp
        |!city.kobe.jp
        |// ===END ICANN DOMAINS===
        |
        |io
        |github.io   this tail is ignored (read up to first whitespace)
        |""".stripMargin
    val rules = Domains.parsePsl(dat)
    assert(rules.size == 11)
    // Expected values are the published checkPublicSuffix test vectors
    // (publicsuffix.org/list/) for these rules.
    val cases = Seq(
      "example.com" -> Some("example.com"),
      "www.example.com" -> Some("example.com"),
      "com" -> None,
      "example.co.uk" -> Some("example.co.uk"),
      "www.example.co.uk" -> Some("example.co.uk"),
      "co.uk" -> None,
      "uk" -> None,
      // wildcard *.ck
      "ck" -> None,
      "test.ck" -> None,
      "b.test.ck" -> Some("b.test.ck"),
      "a.b.test.ck" -> Some("b.test.ck"),
      // exception !www.ck
      "www.ck" -> Some("www.ck"),
      "www.www.ck" -> Some("www.ck"),
      // wildcard *.kobe.jp + exception !city.kobe.jp
      "jp" -> None,
      "kobe.jp" -> Some("kobe.jp"), // '*.kobe.jp' needs 3 labels; 'jp' rule prevails
      "c.kobe.jp" -> None,
      "b.c.kobe.jp" -> Some("b.c.kobe.jp"),
      "a.b.c.kobe.jp" -> Some("b.c.kobe.jp"),
      "city.kobe.jp" -> Some("city.kobe.jp"),
      "www.city.kobe.jp" -> Some("city.kobe.jp"),
      // private-domain style exact rule
      "github.io" -> None,
      "user.github.io" -> Some("user.github.io"),
      "deep.user.github.io" -> Some("user.github.io"),
      // unlisted TLD → implicit default rule '*'
      "example" -> None,
      "example.example" -> Some("example.example"),
      "b.example.example" -> Some("example.example"),
      // IPv4 literals stay their own domain (PSL does not apply)
      "192.168.0.1" -> Some("192.168.0.1"),
      // FQDN trailing dot is ignored, result undotted
      "www.example.com." -> Some("example.com"))
    val got = cases.map(_._1).toDF("host")
      .select(col("host"),
        graft.functions.psl_registrable_domain(col("host"), rules).as("d"))
      .as[(String, Option[String])].collect().toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"host $h: got ${got(h)}, want $want")
    }
    // NULL host propagates; malformed rules refuse loudly.
    val nullRow = Seq((1, Option.empty[String])).toDF("i", "host")
      .select(graft.functions.psl_registrable_domain(col("host"), rules))
      .collect().head
    assert(nullRow.isNullAt(0))
    intercept[IllegalArgumentException] { Domains.parsePsl("a.*.b") }
    intercept[IllegalArgumentException] { Domains.parsePsl("// only comments") }
    // loadPsl round-trips through a file.
    val f = java.nio.file.Files.createTempFile("graft_psl", ".dat")
    java.nio.file.Files.write(f, dat.getBytes("UTF-8"))
    val loaded = Domains.loadPsl(spark, f.toString)
    assert(loaded.size == rules.size)
    // withDomainPsl wires host + domain and keeps the collision guard.
    val tagged = Domains.withDomainPsl(
      Seq((1L, "https://News.BBC.co.uk/x")).toDF("doc_id", "url"),
      col("url"), rules)
      .select("host", "domain").as[(String, String)].collect().head
    assert(tagged == (("news.bbc.co.uk", "bbc.co.uk")))
    intercept[IllegalArgumentException] {
      Domains.withDomainPsl(
        Seq((1L, "x", "h")).toDF("doc_id", "url", "host"), col("url"), rules)
    }
  }

  test("canonicalUrl strips fragments/tracking/default ports and dedupUrls keeps the min-id winner per canonical URL") {
    val urls = Seq(
      (1L, "HTTP://Example.COM:80/Path/Page?utm_source=x&id=5&utm_campaign=y#frag"),
      (2L, "http://example.com/Path/Page?id=5"),
      (3L, "https://example.com:443/?gclid=abc"),
      (4L, "https://example.com/"),
      (5L, "https://example.com"),
      (6L, "http://example.com/Path/Page?id=6"),
      (7L, "http://user@example.com/a"),
      (8L, "not a url"),
      (9L, "http://EXAMPLE.com/Path/Page?id=5&utm_medium=z"),
      (10L, "https://example.com:8443/x"),
      (11L, "http://example.com/search?q=a&q=b"),
      (12L, "http://example.com/search?fbclid=1&q=a&q=b"))
      .toDF("doc_id", "url")
    val canon = urls
      .select(col("doc_id"), Domains.canonicalUrl(col("url")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(canon(1L) == "http://example.com/Path/Page?id=5")
    assert(canon(1L) == canon(2L) && canon(2L) == canon(9L))
    assert(canon(3L) == "https://example.com/")
    assert(canon(3L) == canon(4L) && canon(4L) == canon(5L))
    assert(canon(7L) == "http://user@example.com/a") // userinfo case kept
    assert(canon(8L) == "not a url") // schemeless passes through
    assert(canon(10L) == "https://example.com:8443/x") // non-default port
    assert(canon(11L) == "http://example.com/search?q=a&q=b") // order kept
    assert(canon(11L) == canon(12L))
    val kept = Domains.dedupUrls(urls, col("url"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 6L, 7L, 8L, 10L, 11L))
    // Output carries the full input schema + canonical_url.
    val row = Domains.dedupUrls(urls, col("url"), col("doc_id"))
      .filter(col("doc_id") === 3L)
      .select("canonical_url", "url").as[(String, String)].collect().head
    assert(row == (("https://example.com/", "https://example.com:443/?gclid=abc")))
    intercept[IllegalArgumentException] {
      Domains.dedupUrls(urls.withColumn("canonical_url", lit("x")),
        col("url"), col("doc_id"))
    }
    // Idempotence: a canonical URL is its own canonical form — the
    // property that makes the key safe to persist and re-canonicalize
    // across pipeline stages. Checked over a generated cross-product
    // of schemes × hosts × ports × paths × queries × fragments.
    val parts = for {
      scheme <- Seq("http", "HTTPS", "ftp", "")
      host <- Seq("Example.COM", "a.b.org", "user@Host.net")
      port <- Seq("", ":80", ":443", ":8080")
      path <- Seq("", "/", "/A/b")
      q <- Seq("", "?utm_source=x", "?id=1&utm_a=2&x", "?gclid=9&q=a")
      f <- Seq("", "#frag")
    } yield (if (scheme.isEmpty) "" else scheme + "://") + host + port +
      path + q + f
    val once = parts.toDF("url")
      .select(Domains.canonicalUrl(col("url")).as("c1"))
      .withColumn("c2", Domains.canonicalUrl(col("c1")))
    assert(once.filter(col("c1") =!= col("c2")).count() == 0)
  }

  test("packManifest/packText: temp bookkeeping names never collide with caller columns") {
    // ADVICE r10: the old spelling hardcoded _mk/_mt/_pt_u/_pt_k/_pt_t
    // and silently overwrote an input column of the same name. Poison
    // the input with all five and pin identical outputs.
    val base = Seq((1L, "alpha beta", 2), (2L, "gamma", 1),
      (3L, "delta epsilon zeta", 3)).toDF("doc_id", "text", "nt")
    val poisoned = Seq(
      (1L, "alpha beta", 2, "X", "X", "X", "X", "X"),
      (2L, "gamma", 1, "X", "X", "X", "X", "X"),
      (3L, "delta epsilon zeta", 3, "X", "X", "X", "X", "X"))
      .toDF("doc_id", "text", "nt", "_mk", "_mt", "_pt_u", "_pt_k", "_pt_t")
    def maniOf(df: org.apache.spark.sql.DataFrame) =
      Sampling.packManifest(df, col("doc_id"), col("nt"), budget = 4,
        buckets = 2).select("pack_id", "n_docs", "n_tokens", "ids_md5")
        .as[(Long, Long, Long, String)].collect().toSet
    def textOf(df: org.apache.spark.sql.DataFrame) =
      Sampling.packText(df, col("doc_id"), col("text"), col("nt"),
        budget = 4, buckets = 2).select("pack_id", "text_md5")
        .as[(Long, String)].collect().toSet
    assert(maniOf(base).nonEmpty && maniOf(poisoned) == maniOf(base))
    assert(textOf(base).nonEmpty && textOf(poisoned) == textOf(base))
  }

  test("vocabDivergence/vocabMovers: exact integer TVD on planted corpora; identity is zero") {
    val a = Seq((1L, "x x x y")).toDF("doc_id", "text")
    val b = Seq((2L, "x y y z")).toDF("doc_id", "text")
    // p_a = (x .75, y .25); p_b = (x .25, y .5, z .25) →
    // tvd = (0.5 + 0.25 + 0.25)/2 = 0.5 — exact in the integer
    // numerator spelling (num 16 over 2·4·4).
    val d = Profiling.vocabDivergence(a, b).collect().head
    assert(d.getAs[Long]("n_grams_union") == 3 &&
      d.getAs[Long]("t_a") == 4 && d.getAs[Long]("t_b") == 4)
    assert(d.getAs[Double]("tvd") == 0.5)
    // Movers ranked by the cross-multiplied delta (x 8, then the y/z
    // tie broken by gram), shares single-division exact.
    val m = Profiling.vocabMovers(a, b, n = 1, k = 3).collect()
    assert(m.map(_.getString(0)).toSeq == Seq("x", "y", "z"))
    assert(m.head.getAs[Double]("share_a") == 0.75 &&
      m.head.getAs[Double]("share_b") == 0.25)
    // A corpus diverges from itself by exactly zero.
    assert(Profiling.vocabDivergence(a, a).collect().head
      .getAs[Double]("tvd") == 0.0)
    // Real-corpus sanity: tvd in (0, 1], union covers both vocabs.
    val r = Profiling.vocabDivergence(
      docs.filter(col("source") === "src0"),
      docs.filter(col("source") =!= "src0")).collect().head
    assert(r.getAs[Double]("tvd") > 0.0 && r.getAs[Double]("tvd") <= 1.0)
  }

  test("classifierCalibration: fast-sigmoid bins, exact rates, bins partition the frame") {
    val df = Seq((0.0, 1), (0.0, 0), (1.0, 1), (-1.0, 0), (1e12, 1))
      .toDF("margin", "label")
    val cal = TextAnalysis.classifierCalibration(df, "margin", "label",
      bins = 10).collect()
      .map(r => r.getInt(0) -> (r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
        r.getAs[Double]("pos_rate"), r.getAs[Double]("bin_lo"))).toMap
    // p(0)=0.5 → bin 5; p(1)=0.75 → bin 7; p(−1)=0.25 → bin 2;
    // p(1e12)≈1 → bin 9 (the least() clamp keeps p=1.0 in range).
    assert(cal.keySet == Set(2, 5, 7, 9))
    assert(cal(5) == ((2L, 1L, 0.5, 0.5)))
    assert(cal(7) == ((1L, 1L, 1.0, 0.7)))
    assert(cal(2) == ((1L, 0L, 0.0, 0.2)))
    assert(cal(9)._1 == 1L && cal(9)._2 == 1L)
    // Bin populations partition the frame.
    assert(cal.values.map(_._1).sum == df.count())
  }

  test("trimOutliers: interpolated bands per group; drop keeps exactly the clip-fixed-point rows") {
    val df = ((1 to 10).map(i => ("a", i.toDouble)) ++
      Seq(("b", 100.0), ("b", 200.0), ("b", 300.0))).toDF("grp", "v")
    // Group a: q10 position 1+9*0.1=1.9 → 1 + 0.9*(2−1) = 1.9; q90
    // position 9.1 → 9 + 0.1*(10−9) = 9.1; band [1.9, 9.1] keeps 2..9.
    val kept = Ranking.trimOutliers(df, "v", 0.1, 0.9, Seq("grp"), clip = false,
        fanout = 4)
      .filter(col("grp") === "a").collect().map(_.getAs[Double]("v")).sorted
    assert(kept.toSeq == (2 to 9).map(_.toDouble))
    // Clip law: truncation keeps exactly the rows the winsorized
    // projection leaves unchanged.
    val clipped = Ranking.trimOutliers(df, "v", 0.1, 0.9, Seq("grp"),
        clip = true, fanout = 4)
    val fixedPoints = clipped.filter(col("v_winsorized") === col("v"))
      .select("grp", "v").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    val dropped = Ranking.trimOutliers(df, "v", 0.1, 0.9, Seq("grp"),
        clip = false, fanout = 4)
      .select("grp", "v").collect().map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(fixedPoints == dropped)
    // Clipped extremes land ON the band bounds (group b: positions
    // 1.2 / 2.8 → bounds ≈ 120 / 280 up to double rounding of the
    // 0.1-step position arithmetic; the interior value is untouched
    // exactly).
    val b = clipped.filter(col("grp") === "b")
      .collect().map(r => r.getDouble(1) -> r.getAs[Double]("v_winsorized")).toMap
    assert(math.abs(b(100.0) - 120.0) < 1e-9)
    assert(math.abs(b(300.0) - 280.0) < 1e-9)
    assert(b(200.0) == 200.0)
  }

  test("packManifest: per-pack rows replay packSequences exactly (independent driver-side recompute)") {
    val df = docs.select(col("doc_id"), col("text"))
    val budget = 8192L
    val packed = Sampling.packSequences(df, col("doc_id"),
      char_length(col("text")), budget, buckets = 8, seed = "s1")
      .select(col("doc_id"), char_length(col("text")).cast("long").as("nt"),
        col("pack_id"), col("bucket"), col("pack_seq"))
      .collect()
    // Independent recompute: group the assignment in plain Scala and
    // hash the ascending id list with java.security directly.
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val want = packed.groupBy(_.getAs[Long]("pack_id")).map { case (pid, rows) =>
      pid -> (rows.length.toLong, rows.map(_.getAs[Long]("nt")).sum,
        md5hex(rows.map(_.getAs[Long]("doc_id")).sorted.mkString(",")))
    }
    val got = Sampling.packManifest(df, col("doc_id"),
      char_length(col("text")), budget, buckets = 8, seed = "s1")
      .collect()
      .map(r => r.getAs[Long]("pack_id") -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[String]("ids_md5"),
        r.getAs[Double]("fill_ratio"))).toMap
    assert(got.size == want.size)
    want.foreach { case (pid, (nd, nt, h)) =>
      val g = got(pid)
      assert(g._1 == nd && g._2 == nt && g._3 == h, s"pack $pid drifted")
      assert(g._4 == nt.toDouble / budget)
    }
    // The manifest partitions the corpus: populations sum to N.
    assert(want.values.map(_._1).sum == df.count())
  }

  test("packText: assembly is the pack order verbatim; round-trips members; manifest agreement") {
    val df = docs.select(col("doc_id"), col("text"))
    def u(id: Long): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:s1".getBytes("UTF-8"))
      java.lang.Long.parseLong(h.take(4).map("%02x".format(_)).mkString, 16) / 4294967296.0
    }
    val texts = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val packed = Sampling.packSequences(df, col("doc_id"),
      char_length(col("text")), 8192L, buckets = 8, seed = "s1")
      .select("doc_id", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val wantText = packed.groupBy(_._2).map { case (pid, rows) =>
      pid -> rows.map(_._1).sortBy(id => (u(id), id)).map(texts).mkString("\n\n")
    }
    val got = Sampling.packText(df, col("doc_id"), col("text"),
      char_length(col("text")), 8192L, buckets = 8, seed = "s1")
      .collect().map(r => r.getAs[Long]("pack_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[String]("text"),
          r.getAs[Long]("n_chars"), r.getAs[String]("text_md5"))).toMap
    assert(got.keySet == wantText.keySet)
    wantText.foreach { case (pid, t) =>
      val g = got(pid)
      assert(g._2 == t, s"pack $pid assembled text drifted")
      assert(g._3 == t.length.toLong)
    }
    // Bookkeeping agrees with the manifest's population per pack.
    val mani = Sampling.packManifest(df, col("doc_id"),
      char_length(col("text")), 8192L, buckets = 8, seed = "s1")
      .collect().map(r => r.getAs[Long]("pack_id") -> r.getAs[Long]("n_docs")).toMap
    assert(got.view.mapValues(_._1).toMap == mani)
  }

  test("dupRateBySource: rates replay the keep-one drop set; dup-free sources rate 0") {
    val d = docs
    val pairs = Dedup.ngramJaccardPairs(d, 3, 0.8, maxShingleDf = 10)
    val dropSet = Dedup.components(pairs)
      .filter(col("component_id") =!= col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dropSet.nonEmpty, "gate corpus must have near-dup clusters")
    val bySrc = d.select("doc_id", "source").collect()
      .groupBy(_.getString(1))
    val got = Dedup.dupRateBySource(d, pairs).collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_dups"), r.getAs[Double]("dup_frac"))).toMap
    assert(got.keySet == bySrc.keySet)
    bySrc.foreach { case (src, rows) =>
      val nd = rows.count(r => dropSet(r.getLong(0))).toLong
      val g = got(src)
      assert(g._1 == rows.length.toLong && g._2 == nd)
      assert(g._3 == nd.toDouble / rows.length)
    }
  }

  test("heavyGrams: exact df/occurrence counts on planted boilerplate; top-k plan, no global sort") {
    val planted = Seq(
      (1L, "the same footer line x"), (2L, "the same footer line y"),
      (3L, "the same footer line z"), (4L, "unique words only here"),
      (5L, "the same footer twice the same footer twice")).toDF("doc_id", "text")
    val hg = Profiling.heavyGrams(planted, n = 3, k = 3).collect()
    // "the same footer": docs 1,2,3,5 (doc 5 twice) → n_docs=4, n_occ=5.
    val top = hg.head
    assert(top.getAs[String]("gram") == "the same footer")
    assert(top.getAs[Long]("n_docs") == 4 && top.getAs[Long]("n_occ") == 5)
    assert(top.getAs[Int]("rank") == 1 && top.getAs[Double]("doc_share") == 0.8)
    // "same footer line" in 1,2,3 ranks second.
    assert(hg(1).getAs[String]("gram") == "same footer line" &&
      hg(1).getAs[Long]("n_docs") == 3)
    assert(hg.length == 3)
    // Scale shape: the k-cut is TakeOrderedAndProject — the gram space
    // is never globally sorted.
    val plan = Profiling.heavyGrams(docs, n = 3, k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("phraseSearch: overlapping starts count, token-boundary exactness, repeated-token phrases, absent phrase, duplicate input phrases") {
    val docs = Seq(
      // "batch batch batch" occurs at starts 1 and 2 (overlapping).
      (1L, "batch batch batch batch end"),
      // Token-boundary: "cat" inside "concatenate" must not match.
      (2L, "concatenate the cat sat"),
      // Case/whitespace normalization on both sides.
      (3L, "The   FAST key\torder wins"),
      // Partial phrase only — no match.
      (4L, "batch batch end"),
      (5L, ""))
      .toDF("doc_id", "text")
    val got = TextAnalysis.phraseSearch(docs, Seq(
      "batch batch batch", "cat sat", "the fast key order",
      "never present", "cat sat" /* duplicate input phrase */))
      .as[(Long, String, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (1L, "batch batch batch", 2L, 1L),
      (2L, "cat sat", 1L, 3L),
      (3L, "the fast key order", 1L, 1L)))
    // Single-token phrase: every occurrence is a start.
    val single = TextAnalysis.phraseSearch(docs, Seq("batch"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(single == Seq(
      (1L, "batch", 4L, 1L), (4L, "batch", 2L, 1L)))
    // Phrase that normalizes to nothing refuses loudly.
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.phraseSearch(docs, Seq("   "))
    }
    assert(e.getMessage.contains("tokenizes to nothing"))
  }

  test("ngramContainmentPairs: a doc quoted whole inside a big wrapper scores ~1 where jaccard stays low; df cap only under-states") {
    val core = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val wrapper = ("lorem ipsum dolor sit amet consectetur adipiscing elit " +
      core +
      " sed do eiusmod tempor incididunt ut labore et dolore magna aliqua " +
      "ut enim ad minim veniam quis nostrud exercitation ullamco laboris")
    val docs = Seq((1L, core), (2L, wrapper),
      (3L, "totally unrelated words nothing shared here at all"))
      .toDF("doc_id", "text")
    val cont = Dedup.ngramContainmentPairs(docs, 3, 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    // core has 8 trigrams, all present in wrapper -> containment 1.0.
    assert(cont == Seq((1L, 2L, 1.0)))
    // Jaccard on the same pair is low — the asymmetry is the point.
    val jac = Dedup.ngramJaccardPairs(docs, 3, 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(jac.isEmpty)
    // df cap: with a cap of 1, shared trigrams (df=2) drop from the
    // intersection -> containment can only fall (under-statement).
    val capped = Dedup.ngramContainmentPairs(docs, 3, 0.01,
        maxShingleDf = 1)
      .as[(Long, Long, Double)].collect().toSeq
    assert(capped.isEmpty)
  }

  test("langSpans: mixed-language docs profiled per sentence; majority + disagreeing fraction; no-sentence docs survive") {
    val docs = Seq(
      (1L, "the cat is in the house. the dog is in the garden. " +
        "der hund ist nicht zu haus."),
      (2L, "der hund und die katze. le chat est avec le chien. " +
        "der mann ist mit von."),
      (3L, "xyzzy plugh."),   // one sentence, no markers -> und
      (4L, ""))               // no sentences at all
      .toDF("doc_id", "text")
    val got = TextAnalysis.langSpans(docs)
      .as[(Long, Long, Long, Long, Long, Long, String, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 1L, 0L, 0L, "en", 1.0 / 3.0),
      (2L, 3L, 0L, 2L, 1L, 0L, "de", 1.0 / 3.0),
      (3L, 1L, 0L, 0L, 0L, 1L, "und", 0.0),
      (4L, 0L, 0L, 0L, 0L, 0L, "und", 0.0)))
  }

  test("unicode_normalize: NFC composes, NFKC folds compatibility forms, fast path is identity, bad form refuses") {
    def norm(form: String, v: String): String =
      Seq(v).toDF("t").select(
        graft.functions.unicode_normalize(col("t"), form))
        .as[String].collect()(0)
    // Decomposed e + combining acute (2 codepoints) -> composed
    // U+00E9 (1 codepoint).
    assert(norm("NFC", "e\u0301cole") == "\u00e9cole")
    // Already-normal input comes back unchanged (fast path).
    assert(norm("NFC", "\u00e9cole") == "\u00e9cole")
    // NFD is the inverse direction.
    assert(norm("NFD", "\u00e9") == "e\u0301")
    // NFKC folds compatibility forms: fi-ligature U+FB01, full-width
    // letters U+FF28/U+FF29; NFC keeps them.
    assert(norm("NFKC", "\ufb01le") == "file")
    assert(norm("NFKC", "\uff28\uff29") == "HI")
    assert(norm("NFC", "\ufb01le") == "\ufb01le")
    val e = intercept[IllegalArgumentException] {
      Seq("x").toDF("t").select(
        graft.functions.unicode_normalize(col("t"), "NFX"))
    }
    assert(e.getMessage.contains("unknown form"))
    // SQL registration.
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    assert(spark.sql(
      "SELECT unicode_normalize('e\u0301', 'NFC')")
      .as[String].collect()(0) == "\u00e9")
  }

  test("mojibake repair: single/double/triple-encoded runs restored, healthy and unrepairable text untouched") {
    val d = Seq(
      // Single-encoded latin: caf<C3><A9>.
      (1L, "one caf\u00c3\u00a9 here"),
      // cp1252 specials: don<\u00e2\u20ac\u2122>t <\u00e2\u20ac\u201d> yes, <\u00e2\u201a\u00ac>100.
      (2L, "don\u00e2\u20ac\u2122t \u00e2\u20ac\u201d yes \u00e2\u201a\u00ac100"),
      // Double-encoded \u00e9 (two repair passes).
      (3L, "two caf\u00c3\u0192\u00c2\u00a9 deep"),
      // Triple-encoded \u00e9 (three passes \u2014 MaxPasses boundary).
      (4L, "three caf\u00c3\u0192\u00c6\u2019\u00c3\u201a\u00c2\u00a9 deep"),
      // Healthy non-ASCII: \u00e9 alone is NOT valid UTF-8 when re-encoded;
      // \u2192 is not cp1252-encodable at all. Both untouched.
      (5L, "caf\u00e9 na\u00efve \u2192 ok"),
      // One run mixing healthy + mojibake bytes: strict decode fails,
      // the WHOLE run is conservatively left alone.
      (6L, "stuck \u00e9\u00c3\u00a9 run"),
      // Mixed doc: the damaged run fixes, the healthy one stays.
      (7L, "ok \u00c3\u00a9 and \u00e9 end"),
      (8L, "plain ascii only")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.fixEncoding(d)
      .as[(Long, String, Int, Boolean)].collect().map(t => t._1 -> t).toMap
    assert(r(1L)._2 == "one caf\u00e9 here" && r(1L)._3 == 1)
    assert(r(2L)._2 == "don\u2019t \u2014 yes \u20ac100" && r(2L)._3 == 3)
    assert(r(3L)._2 == "two caf\u00e9 deep" && r(3L)._3 == 1)
    assert(r(4L)._2 == "three caf\u00e9 deep" && r(4L)._3 == 1)
    assert(r(5L)._2 == "caf\u00e9 na\u00efve \u2192 ok" && r(5L)._3 == 0)
    assert(r(6L)._2 == "stuck \u00e9\u00c3\u00a9 run" && r(6L)._3 == 0)
    assert(r(7L)._2 == "ok \u00e9 and \u00e9 end" && r(7L)._3 == 1
      && r(7L)._4)
    assert(r(8L)._2 == "plain ascii only" && r(8L)._3 == 0 && !r(8L)._4)
    // Null propagates (nullIntolerant), not NPE.
    val nulls = Seq((9L, null: String)).toDF("doc_id", "text")
    val nr = TextAnalysis.fixEncoding(nulls).collect().head
    assert(nr.isNullAt(1) && nr.isNullAt(2) && nr.isNullAt(3))
    // SQL registration.
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    assert(spark.sql("SELECT mojibake_repair('caf\u00c3\u00a9'), " +
      "mojibake_repair_count('caf\u00c3\u00a9')")
      .as[(String, Int)].collect()(0) == ("caf\u00e9", 1))
  }

  test("codeProfile: fenced markdown and keyword+shape code flag, prose with one assignment does not") {
    val python = Seq(
      "import os",
      "def main(files):",
      "    total = 0",
      "    for f in files:",
      "        total = total + len(f)",
      "    return total").mkString("\n")
    val cish = Seq(
      "#include <stdio.h>",
      "int main(void) {",
      "    printf(\"hi\");",
      "    return 0;",
      "}").mkString("\n")
    val fencedDoc = "Intro prose explains the idea.\n```\nx = 1\n```\n" +
      "Closing prose wraps it up."
    val prose = "This is a long paragraph of ordinary prose. " +
      "It keeps going with several sentences and no code at all."
    val proseAssign = "weather = mostly sunny today\n" +
      "The rest of this page is a plain narrative paragraph.\n" +
      "It continues in full sentences.\nAnd ends without any code."
    val d = Seq((1L, python), (2L, cish), (3L, fencedDoc), (4L, prose),
      (5L, proseAssign)).toDF("doc_id", "text")
    val r = TextAnalysis.codeProfile(d)
      .as[(Long, Int, Double, Int, Double, Boolean, String)]
      .collect().map(t => t._1 -> t).toMap
    // Python: indented lines + assignments; def/import/return hit.
    assert(r(1L)._6 && r(1L)._7 == "line_shape" && r(1L)._4 >= 3)
    // C: brace/semicolon line endings; include/void/return/printf hit.
    assert(r(2L)._6 && r(2L)._7 == "line_shape")
    // One complete fence pair is decisive regardless of ratios.
    assert(r(3L)._2 == 1 && r(3L)._6 && r(3L)._7 == "fenced")
    // Prose stays prose.
    assert(!r(4L)._6 && r(4L)._7 == null && r(4L)._3 == 0.0)
    // A single assignment-shaped line (1/4 lines, no keywords) does
    // not flip the conservative thresholds.
    assert(!r(5L)._6 && r(5L)._3 == 0.25)
  }

  test("blocklistScreen: whole-token hits counted, any hit drops, substrings never match") {
    val d = Seq(
      (1L, "clean text with nothing listed"),
      (2L, "one badalpha here"),
      (3L, "badalpha twice badalpha and badbeta once"),
      (4L, "substring badalphabet does not count")
    ).toDF("doc_id", "text")
    val r = TextAnalysis
      .blocklistScreen(d, Seq("BadAlpha", "badbeta"))
      .as[(Long, Int, Int, Boolean)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 0, 0, true)))
    assert(r(2L) == ((2L, 1, 1, false)))
    assert(r(3L) == ((3L, 3, 2, false)))
    assert(r(4L) == ((4L, 0, 0, true)))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.blocklistScreen(d, Seq.empty)
    }
    assert(e.getMessage.contains("empty blocklist"))
  }

  test("exactUnicode: composed/decomposed merge under NFC; full-width variants merge only under NFKC") {
    val docs = Seq(
      (1L, "café menu"),     // composed
      (2L, "café menu"),    // decomposed -> same under NFC
      (3L, "ｃａｆｅ́ menu"), // full-width cafe + acute
      (4L, "other text"))
      .toDF("doc_id", "text")
    val nfc = Dedup.exactUnicode(docs, "NFC")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(nfc == Seq(1L, 3L, 4L)) // 2 merged into 1; 3 stays distinct
    val nfkc = Dedup.exactUnicode(docs, "NFKC")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(nfkc == Seq(1L, 4L)) // full-width folds too
    // Plain exact would keep all four.
    assert(Dedup.exact(docs).count() == 4)
  }

  test("zOrderKey: matches an independent Morton reference; out-of-range refuses per row") {
    val pts = for (x <- 0 until 8; y <- 0 until 8) yield (x.toLong, y.toLong)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zOrderKey(Seq(col("x"), col("y")), 3).as("z"))
      .as[(Long, Long, Long)].collect().map(r => ((r._1, r._2), r._3)).toMap
    def ref(x: Long, y: Long): Long =
      (0 until 3).map(i => (((x >> i) & 1) << (2 * i)) |
        (((y >> i) & 1) << (2 * i + 1))).sum
    pts.foreach { case (x, y) => assert(got((x, y)) == ref(x, y)) }
    // The 64 keys are a permutation of 0..63 (bijective interleave).
    assert(got.values.toSeq.sorted == (0L until 64L))
    val e = intercept[Exception] {
      Seq((9L, 1L)).toDF("x", "y")
        .select(Layout.zOrderKey(Seq(col("x"), col("y")), 3)).collect()
    }
    assert(e.getMessage.contains("out of [0, 8)"))
  }

  test("bucketize: equi-width ids in range, max lands in top bucket, constant column buckets to 0") {
    val df = (0L to 1000L).toDF("v")
    val b = Layout.bucketize(df, col("v"), 3, "bucket")
      .as[(Long, Long)].collect().toMap
    assert(b.values.forall(x => x >= 0 && x < 8))
    assert(b(0L) == 0L && b(1000L) == 7L)
    // Monotone in v.
    assert(b.toSeq.sortBy(_._1).map(_._2).sliding(2)
      .forall(p => p.head <= p.last))
    val const = Layout.bucketize(Seq(5L, 5L, 5L).toDF("v"), col("v"), 4,
      "bucket").as[(Long, Long)].collect()
    assert(const.forall(_._2 == 0L))
  }

  test("clusterByZOrder: per-partition bboxes are compact — a square region touches fewer partitions than under single-key sort") {
    val grid = (for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    def partsTouching(df: DataFrame): Long = {
      // Partitions containing any row of the region x,y in [0,8).
      import org.apache.spark.sql.functions.spark_partition_id
      df.withColumn("pid", spark_partition_id())
        .filter(col("x") < 8 && col("y") < 8)
        .select("pid").distinct().count()
    }
    val z = Layout.clusterByZOrder(grid, Seq(col("x"), col("y")), 5, 16)
    assert(z.columns.toSeq == Seq("x", "y")) // key column dropped
    assert(z.count() == 1024)
    val zTouched = partsTouching(z)
    val xTouched = partsTouching(
      grid.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    // 16 partitions of 64 rows: z-curve quads keep the 8x8 region in
    // one partition; x-stripes (width 2) need 4.
    // RangePartitioner samples boundaries, so allow one straddle:
    // the 8x8 region is one 64-key z-quad (<= 2 partitions) while
    // x-stripes of width ~2 need ~4.
    assert(zTouched < xTouched,
      s"z-order touched $zTouched partitions, x-sort $xTouched")
    assert(zTouched <= 2L)
  }

  test("c4Filter: every line rule and every ordered page-drop reason") {
    val rows = Seq(
      // 1: clean page — 5 prose keepers + 3 droppers (no punct, too
      //    few words, javascript banner)
      (1L, Seq(
        "A first proper sentence ends with a period.",
        "no terminal punctuation here",
        "Too few.",
        "Please enable JavaScript to proceed.",
        "A second proper sentence also ends well!",
        "Does a question count as terminal?",
        "\"A quoted ending counts too.\"",
        "The fifth keeper closes the page.").mkString("\n")),
      // 2: brace page — would otherwise keep 5
      (2L, Seq(
        "A first proper sentence ends with a period.",
        "if (x) { return; }",
        "A second proper sentence also ends well!",
        "Does a question count as terminal?",
        "\"A quoted ending counts too.\"",
        "The fifth keeper closes the page.").mkString("\n")),
      // 3: lorem page (capitalized — case-insensitive match)
      (3L, "Lorem Ipsum dolor sit amet and more words here."),
      // 4: too few kept lines (2 < 5)
      (4L, "Only one good sentence lives here.\nAnd a second one does too."))
      .toDF("doc_id", "text")
    val out = TextAnalysis.c4Filter(rows)
      .orderBy("doc_id")
      .select("doc_id", "n_lines", "n_lines_kept", "kept", "drop_reason",
        "text_clean")
      .collect()
    assert(out(0).getInt(1) == 8 && out(0).getInt(2) == 5 &&
      out(0).getBoolean(3) && out(0).isNullAt(4))
    assert(out(0).getString(5).linesIterator.size == 5 &&
      !out(0).getString(5).contains("JavaScript"))
    assert(!out(1).getBoolean(3) && out(1).getString(4) == "brace")
    assert(!out(2).getBoolean(3) && out(2).getString(4) == "lorem_ipsum")
    assert(!out(3).getBoolean(3) && out(3).getString(4) == "too_few_lines")
    assert(out(1).isNullAt(5) && out(3).isNullAt(5)) // dropped → NULL text
  }

  test("gopherQuality: hand-computed signals and the ordered first_fail") {
    // 10 words, all alphabetic, 41 non-ws chars → mean 4.1; 'the' and
    // 'of' present → 2 stopword hits; one line, no bullets/ellipses.
    val good = "the quick brown foxes jump over most of those dogs"
    val rows = Seq(
      (1L, good),
      (2L, ("word " * 3).trim),                  // 3 words → n_words_low
      (3L, good + " ## ..."),                    // symbols 3 / 12 words
      (4L, Seq.fill(10)("- alphabet item").appended(good)
        .mkString("\n")),                        // 10/11 bullets > 0.9
      // ellipsis lines count as symbols too — 22 words keep the
      // symbol ratio at 2/22 ≤ 0.1 so the ELLIPSIS rule is what fires
      (5L, Seq(good + " " + good, "wait...", "more...").mkString("\n")),
      (6L, good + " " + ("12345 " * 40).trim))   // alpha 10/50 < 0.8
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherQuality(rows, minWords = 5)
      .orderBy("doc_id").collect()
    val g = out(0)
    assert(g.getAs[Int]("n_words") == 10)
    assert(g.getAs[Double]("mean_word_len") == 4.1) // 41 chars / 10
    assert(g.getAs[Double]("symbol_ratio") == 0.0)
    assert(g.getAs[Int]("stop_hits") == 2)
    assert(g.getAs[Boolean]("passes") && g.isNullAt(g.fieldIndex("first_fail")))
    assert(out(1).getAs[String]("first_fail") == "n_words_low")
    assert(out(2).getAs[String]("first_fail") == "symbol_ratio")
    assert(out(2).getAs[Double]("symbol_ratio") == 3.0 / 12)
    assert(out(3).getAs[String]("first_fail") == "bullet_ratio")
    assert(out(3).getAs[Double]("bullet_ratio") == 10.0 / 11)
    assert(out(4).getAs[String]("first_fail") == "ellipsis_ratio")
    assert(out(4).getAs[Double]("ellipsis_line_ratio") == 2.0 / 3)
    assert(out(5).getAs[String]("first_fail") == "alpha_ratio")
    assert(out(5).getAs[Double]("alpha_word_ratio") == 10.0 / 50)
  }

  test("lineRepetitionStats: excess-occurrence line and char fractions, hand-computed") {
    val rows = Seq(
      (1L, "a\nb\nc"),               // all distinct → 0 / 0
      (2L, "foot\nbody line\nfoot"), // chars 17 total, 13 distinct
      (3L, "x\nx\nx\nx"),            // one distinct line
      (4L, ""))                      // split("") = [""] → total chars 0
      .toDF("doc_id", "text")
    val out = TextAnalysis.lineRepetitionStats(rows)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("dup_line_frac") == 0.0 &&
      out(0).getAs[Double]("dup_line_char_frac") == 0.0)
    assert(out(1).getAs[Int]("n_lines") == 3 &&
      out(1).getAs[Int]("n_distinct_lines") == 2)
    assert(out(1).getAs[Double]("dup_line_frac") == 1.0 / 3)
    assert(out(1).getAs[Double]("dup_line_char_frac") == 4.0 / 17)
    assert(out(2).getAs[Double]("dup_line_frac") == 3.0 / 4 &&
      out(2).getAs[Double]("dup_line_char_frac") == 3.0 / 4)
    assert(out(3).getAs[Int]("n_lines") == 1 &&
      out(3).getAs[Double]("dup_line_char_frac") == 0.0)
  }

  test("surtKey: normalization table (case, www, ports, params, userinfo)") {
    val rows = Seq(
      "HTTP://WWW.Example.COM:80/Path/One?b=2&a=1&utm_source=x#frag",
      "https://sub.example.co.uk:443/p",
      "http://user:pw@www2.example.org/x?z=1&y=",
      "relative/path/only",
      "http://example.net:8080/q?only=1",
      "http://example.org",
      "ftp://Files.example.org:21/pub")
      .toDF("url")
    val keys = rows.select(Domains.surtKey(col("url"))).as[String].collect()
    assert(keys(0) == "com,example)/path/one?a=1&b=2&utm_source=x")
    assert(keys(1) == "uk,co,example,sub)/p")
    assert(keys(2) == "org,example)/x?y=&z=1")
    assert(keys(3) == null)
    assert(keys(4) == "net,example:8080)/q?only=1")
    assert(keys(5) == "org,example)/")
    assert(keys(6) == "org,example,files:21)/pub")
  }

  test("recrawlSchedule: change streaks, doubling, and the cap — hand-computed") {
    val hist = Seq(
      // u1: fingerprints A A A A — changes only at fetch 1 → streak 3
      ("u1", 1000L, "A"), ("u1", 2000L, "A"), ("u1", 3000L, "A"),
      ("u1", 4000L, "A"),
      // u2: A B B A — changed at 1,2,4 → streak 0
      ("u2", 1000L, "A"), ("u2", 2000L, "B"), ("u2", 3000L, "B"),
      ("u2", 4000L, "A"),
      // u3: single fetch → streak 0
      ("u3", 9000L, "C"),
      // u4: A A ... with a huge streak hitting the max cap
      ("u4", 1000L, "A"), ("u4", 2000L, "A"), ("u4", 3000L, "A"),
      ("u4", 4000L, "A"), ("u4", 5000L, "A"), ("u4", 6000L, "A"))
      .toDF("url", "ts", "fp")
    val out = Robots.recrawlSchedule(hist, col("url"), col("ts"), col("fp"),
        baseIntervalMs = 100L, maxIntervalMs = 800L)
      .orderBy("url")
      .select("url", "n_fetches", "n_changes", "unchanged_streak",
        "interval_ms", "next_fetch_ms")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out(0) == (("u1", 4L, 1L, 3L, 800L, 4800L))) // 100<<3 = 800 = cap
    assert(out(1) == (("u2", 4L, 3L, 0L, 100L, 4100L))) // change at last
    assert(out(2) == (("u3", 1L, 1L, 0L, 100L, 9100L))) // first is a change
    assert(out(3) == (("u4", 6L, 1L, 5L, 800L, 6800L))) // 100<<5 capped at 800
  }

  test("distinctKmv: small groups exact, union law, estimator accuracy on the real corpus") {
    val toks = docs.select(col("source"),
      explode(graft.functions.word_tokens(col("text"))).as("tk"))
    val k = 64
    val out = Profiling.distinctKmv(toks, col("tk"), col("source"), k = k)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    val exact = toks.groupBy("source")
      .agg(countDistinct(col("tk")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Every per-source sketch that is NOT full must be exact — the
    // buffer saw every distinct hash (collisions can only lower it).
    for ((s, (nKept, _, est)) <- out if s != "__all__" && nKept < k)
      assert(est <= exact(s) && est >= exact(s) - 2, s"$s: $est vs ${exact(s)}")
    // Full sketches: |est/exact - 1| within ~4/sqrt(k-2) ≈ 0.51 —
    // loose enough to never flake, tight enough to catch a broken
    // estimator (off-by-2^32, wrong kth) outright.
    for ((s, (nKept, _, est)) <- out if s != "__all__" && nKept == k) {
      val rel = math.abs(est.toDouble / exact(s) - 1.0)
      assert(rel < 0.51, s"$s: est $est exact ${exact(s)} rel $rel")
    }
    // Union law: the __all__ row (merged from per-source buffers) must
    // equal the sketch built directly over the ungrouped stream.
    val direct = Profiling.distinctKmv(toks, col("tk"), lit("__all__"), k = k)
      .filter(col("scope") === "__all__").collect().head
    val all = out("__all__")
    assert((direct.getInt(1), direct.getLong(2), direct.getLong(3)) == all)
  }

  test("KmvSketch aggregator: dedup within buffer, merge across partitions, k cap") {
    // 1000 values with heavy duplication across 8 partitions; hashes
    // ARE the values (identity domain) so the expectation is spelled
    // by hand: the 16 smallest distinct values.
    val vals = (0 until 1000).map(i => ((i * 7919) % 100).toLong)
    val df = spark.sparkContext.parallelize(vals, 8).toDF("h")
    val got = df.agg(
        graft.functions.KmvSketch.kmv_min_hashes(col("h"), 16).as("mins"))
      .collect().head.getSeq[Long](0)
    assert(got == vals.distinct.sorted.take(16))
    // Fewer distincts than k → buffer holds all of them.
    val small = spark.sparkContext.parallelize(Seq(5L, 3L, 5L, 3L, 9L), 3).toDF("h")
    val gotSmall = small.agg(
        graft.functions.KmvSketch.kmv_min_hashes(col("h"), 16).as("mins"))
      .collect().head.getSeq[Long](0)
    assert(gotSmall == Seq(3L, 5L, 9L))
  }

  test("distinctKmvAppend: index + second half equals the direct sketch of everything") {
    // The lossless-union law behind the append gate's shared oracle:
    // replaying a saved buffer's hashes through KMV insertion is the
    // exact sketch union, so (save half, append half) must equal the
    // one-shot sketch — row for row, including kth_min.
    val dir = java.nio.file.Files.createTempDirectory("kmv_idx_spec").toString
    val toks = docs.select(col("doc_id"), col("source"),
      explode(graft.functions.word_tokens(col("text"))).as("tk"))
    Profiling.saveKmvSketches(toks.filter(col("doc_id") % 2 === 0),
      col("tk"), col("source"), dir, k = 32)
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))
    val appended = Profiling.distinctKmvAppend(spark, dir,
      toks.filter(col("doc_id") % 2 === 1), col("tk"), col("source"))
      .collect().map(key).toSet
    val direct = Profiling.distinctKmv(toks, col("tk"), col("source"), k = 32)
      .collect().map(key).toSet
    assert(appended == direct)
    // The empty-index guard: a zero-row (but schema-valid) index must
    // fail loudly instead of silently estimating from nothing.
    val emptyDir =
      java.nio.file.Files.createTempDirectory("kmv_idx_empty").toString
    Profiling.saveKmvSketches(toks.filter(lit(false)),
      col("tk"), col("source"), emptyDir, k = 32)
    intercept[IllegalArgumentException] {
      Profiling.distinctKmvAppend(spark, emptyDir,
        toks.limit(1), col("tk"), col("source"))
    }
  }

  test("streaming KMV monitor: micro-batches converge to the batch sketch across restarts of state") {
    // The ingest-time cardinality monitor: the same typed Aggregator
    // runs as a streaming aggregation (complete mode), its ≤k-long
    // buffer IS the per-group state, and cross-batch re-delivery of a
    // hash changes nothing (KMV insertion dedups) — so after any
    // number of micro-batches the sink must equal the batch sketch of
    // everything seen. Values overlap across the two feeds on
    // purpose; hashes are the identity domain so the expectation is
    // hand-spellable.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq(("a", 5L), ("a", 3L), ("b", 7L), ("a", 5L))
    val b2 = Seq(("a", 5L), ("a", 1L), ("b", 7L), ("b", 2L))
    val mem = MemoryStream[(String, Long)]
    val q = mem.toDF().toDF("scope", "h").groupBy(col("scope"))
      .agg(graft.functions.KmvSketch.kmv_min_hashes(col("h"), 3).as("mins"))
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("kmv_stream").collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got == Map("a" -> Seq(1L, 3L, 5L), "b" -> Seq(2L, 7L)))
  }

  test("heavyCms: estimates dominate exact counts; sketch state is d x w bounded") {
    val out = Profiling.heavyCms(docs, d = 3, w = 512, k = 20).collect()
    assert(out.length == 20)
    // The count-min law: min over d buckets >= true count, always.
    for (r <- out) {
      val (t, e) = (r.getAs[Long]("true_cnt"), r.getAs[Long]("est_cnt"))
      assert(e >= t, s"${r.getAs[String]("tk")}: est $e < true $t")
    }
    // With w=512 over a small vocab the top hitter's bucket collisions
    // are bounded: est stays within 3x truth for rank 1 (a broken
    // bucket hash would send it to the full token count).
    val top = out.find(_.getAs[Int]("rank") == 1).get
    assert(top.getAs[Long]("est_cnt") < top.getAs[Long]("true_cnt") * 3)
  }

  test("histQuantiles: each estimate brackets the exact quantile within one bin") {
    val lens = docs.select(col("source"),
      size(graft.functions.word_tokens(col("text"))).as("n_tokens"))
    val out = Profiling.histQuantiles(lens, col("n_tokens"), col("source"),
      binWidth = 16L, bins = 128).collect()
    val exact = lens.collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1).map { case (s, rows) => s -> rows.map(_._2).sorted }
    for (r <- out) {
      val vs = exact(r.getString(0))
      for ((q, col0) <- Seq(0.5 -> "p50_lo", 0.9 -> "p90_lo", 0.99 -> "p99_lo")) {
        // ceil(q*n)-th value (1-based) — the same rank the bin search
        // targets; it must land inside [lo, lo+binWidth) unless the
        // overflow bin clamped it.
        val vq = vs(math.ceil(q * vs.length).toInt - 1)
        val lo = r.getAs[Long](col0)
        if (lo < 127L * 16L) // not the clamp bin
          assert(lo <= vq && vq < lo + 16, s"${r.getString(0)} $col0: $lo vs $vq")
        else assert(vq >= 127 * 16)
      }
    }
  }
}

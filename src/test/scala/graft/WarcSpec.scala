package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Warc

/** Raw-WARC (HTML response) ingestion contract: the in-repo binary
  * fixture pins the wire format (chunked transfer coding with a chunk
  * extension, gzip content coding, ISO-8859-1 charset, 404 and
  * non-HTML filtering, request/warcinfo skipping, multi-member gzip,
  * an embedded "WARC/1.0" body line) and the html_blocks extractor is
  * pinned on adversarial HTML — the same closure pattern as WetSpec
  * (no real crawl data ships in this environment). */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixturePath: String =
    getClass.getResource("/fixture.warc.gz").getPath

  private val p1 = "This paragraph is the real content of the fixture " +
    "page, long enough to survive the ten word minimum, with an entity " +
    "& a numeric é and 1 < 2 math."
  private val p2 = "WARC/1.0 looks like a record boundary but is body " +
    "text, padded past ten words."

  test("fixture parses byte-exactly: 12 records, HTTP layer, chunked + gzip + deflate codings, charsets") {
    val rows = Warc.readWarc(spark, fixturePath)
      .orderBy("record_idx").collect()
    assert(rows.length == 12)
    assert(rows.map(_.getAs[String]("warc_type")).toSeq == Seq(
      "warcinfo", "response", "response", "response", "response",
      "response", "response", "request", "response", "response",
      "response", "response"))
    assert(rows.map(_.getAs[Int]("http_status")).toSeq ==
      Seq(0, 200, 200, 200, 200, 404, 200, 0, 200, 200, 200, 200))
    assert(rows.map(_.getAs[String]("http_content_type")).toSeq == Seq(
      "", "text/html", "text/html", "text/html", "text/html",
      "text/html", "application/pdf", "", "text/html", "text/html",
      "text/html", "text/html"))
    // Legal-but-unsupported coding: lenient — status kept, body
    // undecoded, the coding surfaced as the countable signal.
    assert(rows(9).getAs[String]("content_encoding") == "br" &&
      rows(9).getAs[String]("html") == "")
    assert(rows(4).getAs[String]("content_encoding") == "gzip")
    assert(rows(1).getAs[String]("content_encoding") == "")
    // Charset decode: latin-1 é (0xE9 on the wire) survives.
    assert(rows(2).getAs[String]("html").contains("Café au lait"))
    // Chunked transfer coding reassembles exactly (incl. the bare '<').
    assert(rows(3).getAs[String]("html") ==
      "<html><body><p>Chunked transfer coding delivered this paragraph " +
        "with more than ten words total, and 3 < 4 stays literal text." +
        "</p></body></html>")
    // Gzip content coding inflates exactly.
    assert(rows(4).getAs[String]("html").contains(
      "Gzip content coding delivered this paragraph"))
    // Multibyte + astral emoji.
    assert(rows(8).getAs[String]("html").contains(
      "深度学習") &&
      rows(8).getAs[String]("html").contains("😀"))
    // Deflate content coding, both wire variants (RFC 9110 says
    // zlib-wrapped; wild servers send raw RFC 1951 under the same
    // name — the reader falls back).
    assert(rows(10).getAs[String]("content_encoding") == "deflate" &&
      rows(10).getAs[String]("html").contains(
        "Zlib wrapped deflate content coding"))
    assert(rows(11).getAs[String]("content_encoding") == "deflate" &&
      rows(11).getAs[String]("html").contains(
        "Raw deflate content coding from a noncompliant server"))
  }

  test("warcHtmlDocuments keeps 2xx HTML only; warcTextDocuments extracts boilerplate-stripped text") {
    val docs = Warc.warcHtmlDocuments(Warc.readWarc(spark, fixturePath))
      .orderBy("doc_id").collect()
    // 404 (205), pdf (206), undecodable br (209), request, warcinfo
    // are all excluded; the deflate pages (210 zlib, 211 raw) decode
    // and stay in.
    assert(docs.map(_.getAs[Long]("doc_id")).toSeq ==
      Seq(201L, 202L, 203L, 204L, 208L, 210L, 211L))
    val text = Warc.warcTextDocuments(Warc.readWarc(spark, fixturePath))
      .orderBy("doc_id")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // Fixture page 1: title (3 words), nav/footer (link density 1) and
    // the short paragraph are dropped; the two long content paragraphs
    // survive in document order — including the "WARC/1.0" body-text
    // trap and decoded entities (&amp; &#233; &lt;).
    assert(text(201L) == p1 + "\n" + p2)
    assert(text(202L) == "Café au lait paragraphs need at least " +
      "ten words to survive extraction thresholds.")
    assert(text(203L) == "Chunked transfer coding delivered this " +
      "paragraph with more than ten words total, and 3 < 4 stays " +
      "literal text.")
    assert(text(204L) == "Gzip content coding delivered this paragraph " +
      "of exactly eleven words total.")
    assert(text(208L) == "深度学習 multibyte paragraph " +
      "with emoji 😀 needs ten or more words to be kept.")
    assert(text(210L) == "Zlib wrapped deflate content coding " +
      "delivered this paragraph of exactly twelve words.")
    assert(text(211L) == "Raw deflate content coding from a " +
      "noncompliant server still delivered this twelve word paragraph.")
  }

  test("html_blocks: adversarial segmentation — quoted '>', script traps, entities, inline vs block tags") {
    def blocksOf(html: String): Seq[(String, Int, Double)] =
      Seq(html).toDF("h")
        .select(explode(graft.functions.html_blocks(col("h"))).as("b"))
        .select("b.text", "b.n_words", "b.link_density")
        .as[(String, Int, Double)].collect().toSeq
    // Quoted '>' inside an attribute does not close the tag; inline
    // tags join words without spaces; block tags split.
    assert(blocksOf("""<div data-x="a > b">one <b>two</b></div><p>three</p>""")
      == Seq(("one two", 2, 0.0), ("three", 1, 0.0)))
    assert(blocksOf("<p>a<span>b</span>c</p>") == Seq(("abc", 1, 0.0)))
    // Script/style/comment/CDATA/doctype content never leaks text.
    assert(blocksOf("<!DOCTYPE html><script>x = '<p>no</p>';</script>" +
      "<style>p{}</style><!-- <p>no</p> --><![CDATA[<p>no</p>]]><p>yes</p>")
      == Seq(("yes", 1, 0.0)))
    // Case-insensitive tags; </SCRIPT> closes <script>.
    assert(blocksOf("<SCRIPT>hidden</SCRIPT><P>Visible</P>")
      == Seq(("Visible", 1, 0.0)))
    // Entities: the named five + nbsp (a space) + numeric dec/hex;
    // unrecognized stays literal.
    assert(blocksOf("<p>a&amp;b &lt;x&gt; &quot;q&quot; &apos;s&apos; " +
      "c&nbsp;d &#65;&#x42; &unknown; e</p>")
      == Seq(("a&b <x> \"q\" 's' c d AB &unknown; e", 9, 0.0)))
    // Bare '<' in text stays literal; unterminated tag at EOF is
    // swallowed, not thrown.
    assert(blocksOf("<p>3 < 4 and 5<6</p>") == Seq(("3 < 4 and 5", 5, 0.0)))
    assert(blocksOf("<p>ok</p><div unterminated") == Seq(("ok", 1, 0.0)))
    // Link density: anchor text vs plain text, nested anchors bounded.
    val Seq((navText, navWords, navLd)) =
      blocksOf("""<nav><a href="/">Home</a> <a href="/x">About</a></nav>""")
    assert(navText == "Home About" && navWords == 2 && navLd == 1.0)
    val Seq((_, _, ld)) = blocksOf("<p><a>link</a> plain</p>")
    assert(math.abs(ld - 4.0 / 9.0) < 1e-12)
    // Self-closing <a/> does not open an anchor; <br/> splits blocks.
    assert(blocksOf("<p>x<br/>y</p>") == Seq(("x", 1, 0.0), ("y", 1, 0.0)))
    // Whitespace collapse covers the full ASCII class.
    assert(blocksOf("<p>a \t\r\n\fb</p>") == Seq(("a b", 2, 0.0)))
    // '/' ending an UNQUOTED attribute value is value content, not a
    // self-close mark (ADVICE r12): <iframe src=/ads/> is OPEN, its
    // fallback content skipped until </iframe>; a standalone '/'
    // (src=x /) still self-closes, so following text is kept.
    assert(blocksOf("<iframe src=/ads/>hidden</iframe><p>kept</p>")
      == Seq(("kept", 1, 0.0)))
    assert(blocksOf("<iframe src=x />kept too") == Seq(("kept too", 2, 0.0)))
  }

  test("extractText stopword-density gate drops same-language keyword chrome that beats the other signals") {
    // A keyword-stuffed block (category tags, related-searches chrome)
    // clears minWords and has zero links — only the stopword signal
    // separates it from prose. The prose block carries function words;
    // the chrome carries none.
    val html = "<p>the cat sat on the mat and then it slept for a while " +
      "in the sun</p>" +
      "<p>laptops phones tablets cameras printers monitors keyboards " +
      "speakers routers chargers cables adapters</p>"
    val stop = Seq("the", "a", "an", "and", "on", "in", "it", "for", "of",
      "to", "then")
    def extracted(sw: Seq[String]): String =
      Seq(html).toDF("h")
        .select(Warc.extractText(col("h"), minWords = 10,
          maxLinkDensity = 0.33, stopwords = sw,
          minStopwordFrac = 0.2).as("t"))
        .as[String].collect().head
    // Without the signal both blocks survive; with it only prose does.
    assert(extracted(Nil).split("\n").length == 2)
    assert(extracted(stop) == "the cat sat on the mat and then it slept " +
      "for a while in the sun")
  }

  test("streaming ingest parity: arriving shards parse identically to the batch read") {
    val dir = java.nio.file.Files.createTempDirectory("warc_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("warc_ckpt").toString
    try {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(fixturePath),
        java.nio.file.Paths.get(dir, "shard0.warc.gz"))
      val q = Warc.readWarcStream(spark, dir + "/*.warc.gz")
        .writeStream.format("memory").queryName("warc_stream_out")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      def key(df: org.apache.spark.sql.DataFrame) = df
        .select("record_idx", "warc_type", "target_uri", "http_status",
          "html")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getInt(3), r.getString(4))).toSet
      val streamed = key(spark.table("warc_stream_out"))
      val batch = key(Warc.readWarc(spark, dir + "/*.warc.gz"))
      assert(batch.size == 12 && streamed == batch)
    } finally {
      spark.sql("DROP TABLE IF EXISTS warc_stream_out")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir)); rm(new java.io.File(ckpt))
    }
  }

  test("crawl-to-curated streaming path: WARC stream -> extracted docs -> domain block -> quality verdicts equals the batch chain") {
    // The raw-HTML ingest deployment: crawl shards land in a
    // directory, the stream parses + extracts once, the blocklist
    // (static frame) drops bad domains via the stream-safe
    // left_outer spelling, and the quality gate projects verdicts —
    // all stateless/stream-static, so batch ≡ stream by construction.
    val dir = java.nio.file.Files.createTempDirectory("warc_e2e").toString
    val ckpt = java.nio.file.Files.createTempDirectory("warc_e2e_ck").toString
    try {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(fixturePath),
        java.nio.file.Paths.get(dir, "shard0.warc.gz"))
      val block = Seq("fixture.test").toDF("domain")
      def chain(warc: org.apache.spark.sql.DataFrame) = {
        val d = graft.ops.Domains.filterByDomainList(
          Warc.warcTextDocuments(warc), col("url"), block, allow = false)
        graft.ops.TextAnalysis.qualityFilter(d, minTokens = 5)
      }
      val q = chain(Warc.readWarcStream(spark, dir + "/*.warc.gz"))
        .writeStream.format("memory").queryName("warc_curated_out")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val streamed = spark.table("warc_curated_out")
        .select("doc_id", "keep").as[(Long, Boolean)].collect().toSet
      val batch = chain(Warc.readWarc(spark, dir + "/*.warc.gz"))
        .select("doc_id", "keep").as[(Long, Boolean)].collect().toSet
      assert(streamed == batch)
      // Every fixture URL is on the blocked registrable domain —
      // the chain must drain to empty, proving the block actually
      // composed (not that the stream produced nothing: parity above
      // already pinned the stream against the 7-doc batch view).
      assert(batch.isEmpty)
      val unblocked = chain(Warc.readWarc(spark, dir + "/*.warc.gz"))
      val open = graft.ops.Domains.filterByDomainList(
        Warc.warcTextDocuments(Warc.readWarc(spark, dir + "/*.warc.gz")),
        col("url"), Seq("other.test").toDF("domain"), allow = false)
      assert(open.count() == 7 && unblocked.count() == 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS warc_curated_out")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir)); rm(new java.io.File(ckpt))
    }
  }

  test("link-layer filters are stream-safe: noindex + URL spam screen + extraction equal the batch chain") {
    // The round's new filters are stateless projections, so they
    // compose into the streaming ingest unchanged (declared-canonical
    // DEDUP is an aggregation and stays a batch stage by design —
    // the e2e_warc_to_curated gate covers it). Pages written by
    // writeWarc: one clean, one noindex, one spam host, one
    // short-text (extraction drops it).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("warc_link_s").toString
    val ckpt = java.nio.file.Files.createTempDirectory("warc_link_ck").toString
    try {
      val body = "<p>" + (1 to 15).map(i => s"word$i").mkString(" ") + "</p>"
      val pages = Seq(
        (301L, "http://ok.example.org/p/301", "", body),
        (302L, "http://ok.example.org/p/302",
          "<meta name=\"robots\" content=\"noindex\">", body),
        (303L, "http://casino.example.biz/p/303", "", body),
        (304L, "http://ok.example.org/p/304", "", "<p>too short</p>"))
        .toDF("doc_id", "u", "meta", "b")
        .select(col("u").as("uri"), lit("2026-02-02T00:00:00Z").as("date"),
          concat(lit("<html><head>"), col("meta"), lit("</head><body>"),
            col("b"), lit("</body></html>")).as("html"))
      Warc.writeWarc(pages, dir + "/shards")
      def chain(warc: org.apache.spark.sql.DataFrame) = {
        val docs = Warc.warcHtmlDocuments(warc)
          .filter(!Warc.hasNoindex(col("html")))
        graft.ops.Domains.filterByUrlSpam(docs, col("url"))
          .withColumn("text", Warc.extractText(col("html")))
          .filter(length(col("text")) > 0)
          .select("doc_id", "url", "text")
      }
      val q = chain(Warc.readWarcStream(spark, dir + "/shards/*.gz"))
        .writeStream.format("memory").queryName("warc_link_out")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val streamed = spark.table("warc_link_out")
        .as[(Long, String, String)].collect().toSet
      val batch = chain(Warc.readWarc(spark, dir + "/shards/*.gz"))
        .as[(Long, String, String)].collect().toSet
      assert(streamed == batch)
      assert(batch.map(_._1) == Set(301L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS warc_link_out")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir)); rm(new java.io.File(ckpt))
    }
  }

  test("malformed payloads fail loudly: bad chunk size, truncated chunk, corrupt gzip, unsupported coding") {
    val exChunk = intercept[IllegalArgumentException] {
      Warc.dechunk("zz\r\nbody".getBytes("UTF-8"), "t")
    }
    assert(exChunk.getMessage.contains("malformed chunk size"))
    val exTrunc = intercept[IllegalArgumentException] {
      Warc.dechunk("ff\r\nonly a few bytes".getBytes("UTF-8"), "t")
    }
    assert(exTrunc.getMessage.contains("truncated"))
    val exGz = intercept[IllegalArgumentException] {
      Warc.gunzip("not gzip at all".getBytes("UTF-8"), "t")
    }
    assert(exGz.getMessage.contains("corrupt gzip"))
    // Deflate: zlib-wrapped and raw variants both inflate; neither
    // variant parsing is loud.
    val plain = "deflate roundtrip payload".getBytes("UTF-8")
    locally {
      val d = new java.util.zip.Deflater()
      d.setInput(plain); d.finish()
      val buf = new Array[Byte](256)
      val n = d.deflate(buf); d.end()
      assert(Warc.inflate(buf.take(n), "t").sameElements(plain))
    }
    locally {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true) // raw
      d.setInput(plain); d.finish()
      val buf = new Array[Byte](256)
      val n = d.deflate(buf); d.end()
      assert(Warc.inflate(buf.take(n), "t").sameElements(plain))
    }
    val exDf = intercept[IllegalArgumentException] {
      Warc.inflate("certainly not deflate data  ".getBytes("UTF-8"), "t")
    }
    assert(exDf.getMessage.contains("corrupt deflate"))
    // Lenient paths: an unsupported-but-legal content coding keeps
    // the record (html empty, coding surfaced); unknown charset falls
    // back to UTF-8; a payload that is not HTTP reports status 0.
    assert(Warc.parseHttpResponse(
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
        "Content-Encoding: br\r\n\r\nbody").getBytes("UTF-8"), "t") ==
      ((200, "text/html", "br", "")))
    val (st, ct, ce, body) = Warc.parseHttpResponse(
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=bogus-9\r\n" +
        "\r\nplain").getBytes("UTF-8"), "t")
    assert(st == 200 && ct == "text/html" && ce == "" && body == "plain")
    assert(Warc.parseHttpResponse("junk".getBytes("UTF-8"), "t") ==
      ((0, "", "", "")))
  }

  test("extractTextSmoothed: short clean blocks survive only between two good neighbors") {
    import spark.implicits._
    val long1 = (1 to 12).map(i => s"alpha$i").mkString(" ")
    val long2 = (1 to 12).map(i => s"beta$i").mkString(" ")
    def smoothed(html: String): String =
      Seq(html).toDF("h")
        .select(Warc.extractTextSmoothed(col("h"))).as[String].head()
    // Heading between two good paragraphs: rescued (plain extraction
    // drops it).
    val article =
      s"<nav><a href='/'>Home</a> <a href='/a'>A</a> <a href='/b'>B</a></nav>" +
        s"<p>$long1</p><h2>Section title</h2><p>$long2</p>" +
        "<footer><a href='/t'>T</a> <a href='/p'>P</a></footer>"
    assert(smoothed(article) == s"$long1\nSection title\n$long2")
    assert(Seq(article).toDF("h")
      .select(Warc.extractText(col("h"))).as[String].head() ==
      s"$long1\n$long2")
    // Same heading next to chrome: NOT rescued (neighbor is bad).
    assert(smoothed(s"<p>$long1</p><h2>Orphan heading</h2>" +
      "<nav><a href='/'>x</a> <a href='/y'>y</a></nav>") == long1)
    // Edge block: no neighbor pair, never rescued.
    assert(smoothed(s"<h2>Leading heading</h2><p>$long1</p>") == long1)
    // Link-dense short block between good neighbors: stays dropped.
    assert(smoothed(s"<p>$long1</p><p><a href='/x'>only links here</a></p>" +
      s"<p>$long2</p>") == s"$long1\n$long2")
    // No good block at all: nothing rescued.
    assert(smoothed("<h2>Just a heading</h2>") == "")
  }

  test("writeWarc -> readWarc round-trips adversarial HTML byte-exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_warc_rt").toString + "/out"
    // Adversarial bodies: an embedded "WARC/1.0" line at line start,
    // blank lines (the record-separator look-alike), multibyte +
    // astral text, and an empty page — the Content-Length walker must
    // never scan for separators.
    val pages = Seq(
      (101L, "<html><body><p>plain page</p></body></html>"),
      (102L, "<html><body>\r\nWARC/1.0\r\n\r\n<p>trap body</p></body></html>"),
      (103L, "<html><body><p>深度学習 😀 café</p></body></html>"),
      (104L, ""))
      .toDF("doc_id", "html")
      .select(concat(lit("http://graft.test/doc/"), col("doc_id")).as("uri"),
        lit("2026-02-02T00:00:00Z").as("date"), col("html"))
    Warc.writeWarc(pages, dir)
    val back = Warc.readWarc(spark, dir)
      .filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("target_uri"), "/(\\d+)$", 1).cast("long"),
        col("http_status"), col("http_content_type"), col("html"))
      .as[(Long, Int, String, String)].collect()
      .sortBy(_._1)
    assert(back.map(_._1).toSeq == Seq(101L, 102L, 103L, 104L))
    assert(back.forall(r => r._2 == 200 && r._3 == "text/html"))
    assert(back(1)._4 ==
      "<html><body>\r\nWARC/1.0\r\n\r\n<p>trap body</p></body></html>")
    assert(back(2)._4 == "<html><body><p>深度学習 😀 café</p></body></html>")
    assert(back(3)._4 == "")
  }

  test("writeWarc: every record carries a deterministic spec-shaped WARC-Record-ID (ADVICE r12)") {
    import spark.implicits._
    def writeAndReadIds(suffix: String): Seq[String] = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_warc_id" + suffix).toString + "/out"
      // Two DIFFERENT bodies under the SAME (uri, date): ids must
      // still be distinct (the id hashes the body too).
      val pages = Seq((1L, "<p>a</p>"), (1L, "<p>b</p>"))
        .toDF("doc_id", "html")
        .select(
          concat(lit("http://graft.test/doc/"), col("doc_id")).as("uri"),
          lit("2026-02-02T00:00:00Z").as("date"), col("html"))
      Warc.writeWarc(pages, dir)
      val raw = spark.read.option("lineSep", "\r\n").text(dir)
        .as[String].collect()
      raw.filter(_.startsWith("WARC-Record-ID:")).toSeq.sorted
    }
    val ids = writeAndReadIds("a")
    // WARC/1.0 mandates one per record, shaped <urn:uuid:...> with
    // RFC 4122 hex layout. Version nibble 3 (md5 name-based), not 4
    // (random): the id IS content-derived, and a strict consumer
    // reading v4 semantics would wrongly assume per-mint uniqueness
    // where identical record content intentionally shares an id
    // (ADVICE r13).
    assert(ids.size == 2 && ids.distinct.size == 2)
    val uuidRe =
      ("^WARC-Record-ID: <urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}" +
        "-8[0-9a-f]{3}-[0-9a-f]{12}>$").r
    ids.foreach(id => assert(uuidRe.findFirstIn(id).isDefined, id))
    // Deterministic: a rerun produces byte-identical ids.
    assert(writeAndReadIds("b") == ids)
  }

  test("cdxIndex: SURT urlkey + timestamp ordering over the binary fixture") {
    val cdx = Warc.cdxIndex(Warc.readWarc(spark, fixturePath)).collect()
    // 10 response records (warcinfo + request excluded).
    assert(cdx.length == 10)
    // The index is urlkey-sorted — one domain's captures adjacent.
    val keys = cdx.map(_.getAs[String]("urlkey")).toSeq
    assert(keys == keys.sorted)
    keys.foreach(k => assert(k.contains(")/"), k))
    // Timestamps are exactly 14 digits of the WARC-Date.
    cdx.foreach { r =>
      assert(r.getAs[String]("timestamp").matches("[0-9]{14}"))
    }
    // Digest is md5 of the DECODED body: empty-body records (the 404
    // has a body but the brotli one decodes to "") share md5("").
    val emptyMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.emptyByteArray)
      .map("%02x".format(_)).mkString
    val br = cdx.filter(_.getAs[String]("original").endsWith("/209"))
    assert(br.length == 1 && br.forall(_.getAs[String]("digest") == emptyMd5))
  }

  test("revisitDedup: identical payloads demote to revisit records pointing at the first capture") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_warc_revisit").toString + "/out"
    val pages = Seq(
      ("http://a.test/1", "2026-01-01T00:00:00Z", "<p>same body</p>"),
      ("http://a.test/2", "2026-01-02T00:00:00Z", "<p>same body</p>"),
      ("http://b.test/1", "2026-01-01T12:00:00Z", "<p>same body</p>"),
      ("http://c.test/1", "2026-01-03T00:00:00Z", "<p>unique body</p>"))
      .toDF("uri", "date", "html")
    Warc.writeWarc(pages, dir)
    val out = Warc.revisitDedup(Warc.readWarc(spark, dir))
      .orderBy("target_uri")
      .select("target_uri", "warc_type_out", "payload_length",
        "refers_to_uri", "refers_to_date")
      .collect()
    // Earliest capture of the shared body is the kept response …
    assert(out(0).getString(0) == "http://a.test/1" &&
      out(0).getString(1) == "response" && out(0).getLong(2) > 0 &&
      out(0).isNullAt(3))
    // … later captures demote, pointing at it (date order, not uri).
    assert(out(1).getString(1) == "revisit" && out(1).getLong(2) == 0 &&
      out(1).getString(3) == "http://a.test/1" &&
      out(1).getString(4) == "2026-01-01T00:00:00Z")
    assert(out(2).getString(0) == "http://b.test/1" &&
      out(2).getString(1) == "revisit" &&
      out(2).getString(3) == "http://a.test/1")
    // A unique payload stays a plain response.
    assert(out(3).getString(0) == "http://c.test/1" &&
      out(3).getString(1) == "response" && out(3).isNullAt(3))
  }

  test("htmlPublishedTime: source priority, both attribute orders, data-datetime never matches") {
    def pub(html: String): Option[String] =
      Seq(html).toDF("h")
        .select(Warc.htmlPublishedTime(col("h"))).as[String]
        .collect().headOption.flatMap(Option(_))
    // Open Graph meta, property-first and content-first orders.
    assert(pub("""<meta property="article:published_time" content="2021-03-04T05:06:07Z">""")
      .contains("2021-03-04T05:06:07Z"))
    assert(pub("""<meta content="2021-03-04" property="article:published_time">""")
      .contains("2021-03-04"))
    // Legacy name=date meta.
    assert(pub("""<meta name="date" content="2019-12-31">""")
      .contains("2019-12-31"))
    // time element; datetime must follow whitespace (data-datetime is
    // a different attribute and never matches).
    assert(pub("""<time datetime="2020-01-02">Jan 2</time>""")
      .contains("2020-01-02"))
    assert(pub("""<time data-datetime="2020-01-02">Jan 2</time>""").isEmpty)
    // Priority: article meta beats an EARLIER time element and a
    // name=date meta.
    assert(pub("""<time datetime="1999-01-01"></time>
      <meta name="date" content="2000-01-01">
      <meta property="article:published_time" content="2021-06-01">""")
      .contains("2021-06-01"))
    // First matching tag of one source wins.
    assert(pub("""<meta name="date" content="2001-01-01">
      <meta name="date" content="2002-02-02">""").contains("2001-01-01"))
    // Absent or empty -> null.
    assert(pub("<html><body>undated</body></html>").isEmpty)
    assert(pub("""<meta name="date" content="">""").isEmpty)
  }
}

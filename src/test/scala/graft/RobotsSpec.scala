package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Domains, Robots}

/** Crawl politeness (RFC 9309): robots.txt group selection, rule
  * parsing, path-pattern matching (longest-match / allow-wins-tie /
  * trailing-$ anchor), the path+query match target, and the host-join
  * decision layer. */
class RobotsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rulesOf(body: String, agent: String): Seq[(Boolean, String)] =
    Seq(body).toDF("body")
      .select(explode(graft.functions.robots_rules(col("body"),
        lit(agent))).as("r"))
      .select("r.allow", "r.pattern")
      .as[(Boolean, String)].collect().toSeq

  test("robots_rules: groups, comments, unknown fields, group selection") {
    val body =
      """# a comment line
        |User-agent: *
        |Disallow: /private/   # trailing comment
        |Allow: /private/public/
        |
        |Sitemap: https://ex.com/sitemap.xml
        |Crawl-delay: 10
        |Disallow: /*.pdf$
        |
        |User-agent: megabot
        |Disallow: /
        |""".stripMargin
    // graftbot has no exact group -> the * group's three rules apply
    // (the blank line and interleaved sitemap/crawl-delay do not end
    // the group).
    assert(rulesOf(body, "graftbot") == Seq(
      (false, "/private/"), (true, "/private/public/"),
      (false, "/*.pdf$")))
    // megabot HAS an exact group -> only its rule applies.
    assert(rulesOf(body, "megabot") == Seq((false, "/")))
  }

  test("robots_rules: multi-UA groups, exact beats star, UA case-insensitive, rule order kept") {
    val body =
      """User-agent: graftbot
        |User-agent: otherbot
        |Disallow: /
        |Allow: /docs/*
        |
        |User-agent: *
        |Disallow: /tmp/
        |""".stripMargin
    assert(rulesOf(body, "GraftBot") == Seq(
      (false, "/"), (true, "/docs/*")))
    assert(rulesOf(body, "thirdbot") == Seq((false, "/tmp/")))
  }

  test("robots_rules: exact group with zero rules still wins over *; empty-value rules ignored; rules before any UA dropped") {
    val body =
      """Disallow: /orphan-rule-ignored
        |User-agent: graftbot
        |Disallow:
        |User-agent: *
        |Disallow: /all/
        |""".stripMargin
    // The empty Disallow ends graftbot's UA run, so the following
    // User-agent: * starts a NEW group — graftbot's exact group has
    // zero rules and that zero-rule set is what applies (allow all).
    assert(rulesOf(body, "graftbot") == Seq.empty)
    assert(rulesOf(body, "anyone") == Seq((false, "/all/")))
  }

  test("pattern matching: prefix, *, trailing-$ anchor, literal mid-$, case-sensitivity") {
    import org.apache.spark.sql.graft.RobotsImpl.matches
    assert(matches("/private/", "/private/x.html"))
    assert(!matches("/private/", "/Private/x.html")) // case-sensitive
    assert(matches("/", "/anything"))
    assert(matches("/*.pdf$", "/files/report.pdf"))
    assert(!matches("/*.pdf$", "/files/report.pdf?dl=1")) // anchored
    assert(matches("/*.pdf", "/files/report.pdf?dl=1")) // unanchored
    assert(matches("/a*b*c", "/aXbYc-and-more"))
    assert(!matches("/a*b*c", "/aXcYb")) // segments in order
    assert(matches("/a$b", "/a$bcd")) // mid-$ is literal
    assert(matches("/a$", "/a"))
    assert(!matches("/a$", "/ab"))
    assert(matches("*", "/whatever")) // bare star
    assert(matches("*.pdf$", "/x.pdf")) // no leading slash, tolerated
  }

  test("decisions: longest-match wins, allow wins ties, missing robots allows, no-group allows, null URL denies") {
    val robots = Seq(
      ("a.example.com",
        "User-agent: *\nDisallow: /private/\nAllow: /private/public/\n"),
      ("e.example.com",
        "User-agent: graftbot\nAllow: /a$\nDisallow: /a\n"),
      ("d.example.com", "User-agent: megabot\nDisallow: /\n"))
      .toDF("host", "body")
    val docs = Seq(
      (1L, "http://a.example.com/private/secret"),
      (2L, "http://a.example.com/private/public/ok"),
      (3L, "http://a.example.com/open"),
      (4L, "http://e.example.com/a"),   // /a$ (len 3) beats /a (len 2)
      (5L, "http://e.example.com/ab"),  // only /a matches
      (6L, "http://c.example.com/x"),   // no robots row
      (7L, "http://d.example.com/x"),   // no applicable group
      (8L, "not a url"))
      .toDF("doc_id", "url")
    val got = Robots.decisions(docs, col("url"), robots, "graftbot")
      .select("doc_id", "allowed", "matched")
      .as[(Long, Boolean, Option[String])].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, false, Some("/private/")),
      (2L, true, Some("/private/public/")),
      (3L, true, None),
      (4L, true, Some("/a$")),
      (5L, false, Some("/a")),
      (6L, true, None),
      (7L, true, None),
      (8L, false, None)))
    val kept = Robots.filterByRobots(docs, col("url"), robots, "graftbot")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 3L, 4L, 6L, 7L))
    // filterByRobots preserves the caller's schema exactly.
    assert(Robots.filterByRobots(docs, col("url"), robots, "graftbot")
      .columns.toSeq == Seq("doc_id", "url"))
  }

  test("urlPathQuery: path+query, no-path default, query-only gets a leading slash, fragment dropped, unparseable null") {
    val got = Seq(
      "http://h.ex/",
      "http://h.ex",
      "http://h.ex/p/q?x=1&y=2",
      "http://h.ex/p#frag",
      "http://h.ex/p?x=1#frag",
      "HTTPS://H.EX:8443/Case/Sensitive",
      // Authority straight to query: the RFC match target is /?x=1 —
      // without the prepended slash a Disallow: / would be bypassed.
      "http://h.ex?x=1",
      "garbage")
      .toDF("url").select(Robots.urlPathQuery(col("url")))
      .as[Option[String]].collect().toSeq
    assert(got == Seq(Some("/"), Some("/"), Some("/p/q?x=1&y=2"),
      Some("/p"), Some("/p?x=1"), Some("/Case/Sensitive"),
      Some("/?x=1"), None))
    // And the decision layer enforces it end-to-end.
    val robots = Seq(("h.ex", "User-agent: *\nDisallow: /\n"))
      .toDF("host", "body")
    val urls = Seq((1L, "http://h.ex?x=1")).toDF("doc_id", "url")
    val d = Robots.decisions(urls, col("url"), robots, "graftbot")
      .select("allowed").as[Boolean].collect()
    assert(d.toSeq == Seq(false))
  }

  test("robots_decision: longest-match tie-break counts UTF-8 octets, not UTF-16 chars") {
    // Allow '/café' is 5 chars but 6 octets; Disallow '/caf*1'
    // is 6 of both. Against '/café1' both match and RFC octet
    // counting TIES at 6 -> allow wins. Char counting (5 < 6) would
    // let the Disallow win.
    val rules = Seq((true, "/café"), (false, "/caf*1"))
      .toDF("allow", "pattern")
      .agg(collect_list(struct(col("allow"), col("pattern"))).as("rules"))
    val got = rules.select(
      graft.functions.robots_decision(col("rules"),
        lit("/café1")).getField("allowed"))
      .as[Boolean].collect()
    assert(got.toSeq == Seq(true))
  }

  test("decisions refuses to overwrite caller 'allowed'/'matched' columns") {
    val robots = Seq(("h.ex", "User-agent: *\nDisallow: /\n"))
      .toDF("host", "body")
    val docs = Seq((1L, "http://h.ex/", true))
      .toDF("doc_id", "url", "allowed")
    val e = intercept[IllegalArgumentException] {
      Robots.decisions(docs, col("url"), robots, "graftbot")
    }
    assert(e.getMessage.contains("allowed"))
  }

  test("decisions duplicate-host guard: conflicting robots rows never fan out corpus rows (ADVICE r13)") {
    // Two rows for one host with OPPOSITE verdicts: without the
    // guard the left join would emit the doc twice (once allowed,
    // once denied) — silent corpus duplication.
    val robots = Seq(
      ("h.ex", "User-agent: *\nDisallow: /\n"),
      ("h.ex", "User-agent: *\nDisallow:\n"))
      .toDF("host", "body")
    val docs = Seq((1L, "http://h.ex/page")).toDF("doc_id", "url")
    val got = Robots.decisions(docs, col("url"), robots, "graftbot")
      .select("doc_id", "allowed").as[(Long, Boolean)].collect().toSeq
    // Exactly ONE verdict row, and deterministic: the min-body winner
    // is "User-agent: *\nDisallow:\n" ('\n' 0x0A sorts before ' '
    // 0x20 right after the shared "Disallow:" prefix) — empty-value
    // Disallow = no rules = allowed.
    assert(got == Seq((1L, true)))
    // The bypass is for frames unique BY CONSTRUCTION; on this frame
    // it would fan out — demonstrating exactly what the guard stops.
    assert(Robots.decisions(docs, col("url"), robots, "graftbot",
      assumeUniqueHosts = true).count() == 2)
  }

  test("streaming politeness parity: WET stream -> robots filter equals the batch chain") {
    // The crawl-ingest deployment: shards stream in, the robots
    // snapshot is a static per-host frame, the politeness screen is a
    // stream-static left join + stateless projection — batch ≡ stream
    // by construction, pinned here end-to-end. doc_id % 2 == 0 lands
    // under a disallowed prefix.
    val dir = java.nio.file.Files.createTempDirectory("robots_stream")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("robots_ckpt")
      .toString
    try {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(40).select(col("doc_id"), col("text"))
      graft.sources.Wet.writeWet(docs.select(
        concat(lit("https://crawl.example.com/"),
          when(col("doc_id") % 2 === 0, lit("private/"))
            .otherwise(lit("public/")),
          col("doc_id")).as("uri"),
        lit("2026-01-01T00:00:00Z").as("date"), col("text")), dir)
      val robots = Seq(("crawl.example.com",
        "User-agent: *\nDisallow: /private/\n")).toDF("host", "body")
      def chain(wet: org.apache.spark.sql.DataFrame) =
        Robots.filterByRobots(
          graft.sources.Wet.wetDocuments(wet), col("url"), robots,
          "graftbot")
      val q = chain(graft.sources.Wet.readWetStream(spark, dir))
        .writeStream.format("memory").queryName("robots_stream_out")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val streamed = spark.table("robots_stream_out")
        .select("doc_id").as[Long].collect().toSet
      val batch = chain(graft.sources.Wet.readWet(spark, dir))
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty && batch.forall(_ % 2 != 0))
      assert(batch == docs.select("doc_id").as[Long].collect()
        .filter(_ % 2 != 0).toSet)
    } finally {
      spark.sql("DROP TABLE IF EXISTS robots_stream_out")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir)); rm(new java.io.File(ckpt))
    }
  }

  test("crawlDelays: group selection, exact shadows *, first-wins, malformed ignored") {
    val robots = Seq(
      ("a.ex", "User-agent: *\nDisallow: /x\nCrawl-delay: 2.5\n" +
        "Crawl-delay: 9\n"),                       // first wins
      ("b.ex", "User-agent: graftbot\nDisallow: /\n\n" +
        "User-agent: *\nCrawl-delay: 7\n"),        // exact shadows *
      ("c.ex", "User-agent: *\nCrawl-delay: soon\n"), // malformed
      ("d.ex", "User-agent: graftbot\nCrawl-delay: 1\n"))
      .toDF("host", "body")
    val got = Robots.crawlDelays(robots, "graftbot")
      .as[(String, Option[Double])].collect().toMap
    assert(got == Map("a.ex" -> Some(2.5), "b.ex" -> None,
      "c.ex" -> None, "d.ex" -> Some(1.0)))
  }

  test("crawlDelays: delay between two UA lines of one run buckets on the run's FINAL agent set (ADVICE r13)") {
    val robots = Seq(
      // The agent is named by the LATER UA line of the same run —
      // the mid-run delay must still reach the exact bucket.
      ("a.ex", "User-agent: otherbot\nCrawl-delay: 5\n" +
        "User-agent: graftbot\nDisallow: /x\n"),
      // Mid-run delay, run ends at EOF with no rules — still scoped.
      ("b.ex", "User-agent: otherbot\nCrawl-delay: 4\n" +
        "User-agent: graftbot\n"),
      // Mid-run THEN post-run delay: document order, first wins.
      ("c.ex", "User-agent: otherbot\nCrawl-delay: 3\n" +
        "User-agent: graftbot\nDisallow: /x\nCrawl-delay: 8\n"),
      // A mid-run delay in a group NOT naming the agent is dropped at
      // that group's first rule line and must not leak into the next
      // group.
      ("d.ex", "User-agent: otherbot\nCrawl-delay: 2\nDisallow: /y\n\n" +
        "User-agent: graftbot\nDisallow: /x\n"),
      // A rule-less group is CONTINUED by the next UA line (RFC 9309
      // group merging — a blank line does not close it), so its
      // mid-run delay applies to the merged agent set.
      ("e.ex", "User-agent: otherbot\nCrawl-delay: 2\n\n" +
        "User-agent: graftbot\nDisallow: /x\n"))
      .toDF("host", "body")
    val got = Robots.crawlDelays(robots, "graftbot")
      .as[(String, Option[Double])].collect().toMap
    assert(got == Map("a.ex" -> Some(5.0), "b.ex" -> Some(4.0),
      "c.ex" -> Some(3.0), "d.ex" -> None, "e.ex" -> Some(2.0)))
  }

  test("sitemaps: global lines, case-insensitive field, comments stripped, document order") {
    val body = "Sitemap: https://h.ex/a.xml\n" +
      "User-agent: *\nDisallow: /\n" +
      "sitemap: https://h.ex/b.xml   # comment\n" +
      "SiteMap:https://h.ex/c.xml\n" +
      "Sitemap:\n" + // empty value -> nothing
      "NotASitemap: https://h.ex/d.xml\n"
    val got = Seq(("h.ex", body)).toDF("host", "body")
    assert(Robots.sitemapsOf(got).as[(String, String)].collect().toSeq ==
      Seq(("h.ex", "https://h.ex/a.xml"), ("h.ex", "https://h.ex/b.xml"),
        ("h.ex", "https://h.ex/c.xml")))
  }

  test("sitemapLocs: urlset and sitemapindex, entity decode, whitespace trim, case-insensitive tags, no-loc docs") {
    def locs(xml: String): Seq[String] =
      Seq(xml).toDF("xml")
        .select(explode(Robots.sitemapLocs(col("xml"))))
        .as[String].collect().toSeq
    assert(locs(
      "<urlset><url><loc> https://h.ex/a </loc></url>" +
        "<url><LOC>https://h.ex/b?x=1&amp;y=2</LOC></url></urlset>") ==
      Seq("https://h.ex/a", "https://h.ex/b?x=1&y=2"))
    // sitemapindex recursion uses the same <loc> wrapper.
    assert(locs(
      "<sitemapindex><sitemap><loc>https://h.ex/sm1.xml</loc></sitemap>" +
        "</sitemapindex>") == Seq("https://h.ex/sm1.xml"))
    // Double-escaped entity decodes exactly once (&amp;lt; -> &lt;).
    assert(locs("<urlset><loc>https://h.ex/?q=&amp;lt;tag&amp;gt;</loc>" +
      "</urlset>") == Seq("https://h.ex/?q=&lt;tag&gt;"))
    assert(locs("<urlset><url><priority>0.5</priority></url></urlset>")
      == Seq.empty)
  }

  test("robotsFromCrawl: /robots.txt responses become the per-host frame; earliest fetch wins; composes with filterByRobots") {
    val dir = java.nio.file.Files.createTempDirectory("robots_crawl")
      .toString + "/out"
    val records = Seq(
      // Two robots fetches for h1 — the EARLIER (stricter) one wins.
      ("http://h1.example.com/robots.txt", "2026-01-01T00:00:00Z",
        "User-agent: *\nDisallow: /private/\n"),
      ("http://h1.example.com/robots.txt", "2026-02-01T00:00:00Z",
        "User-agent: *\nDisallow:\n"),
      ("http://h1.example.com/private/1", "2026-01-02T00:00:00Z",
        "<p>secret</p>"),
      ("http://h1.example.com/public/2", "2026-01-02T00:00:00Z",
        "<p>open</p>"),
      ("http://h2.example.com/public/3", "2026-01-02T00:00:00Z",
        "<p>no robots host</p>"))
      .toDF("uri", "date", "html")
    graft.sources.Warc.writeWarc(records, dir)
    val warc = graft.sources.Warc.readWarc(spark, dir)
    val robots = Robots.robotsFromCrawl(warc)
      .as[(String, String)].collect().toMap
    assert(robots.keySet == Set("h1.example.com", "h2.example.com") ||
      robots.keySet == Set("h1.example.com"))
    // h2's /public/3 page is NOT a robots.txt; only h1 has one.
    assert(robots.keySet == Set("h1.example.com"))
    assert(robots("h1.example.com").contains("Disallow: /private/"))
    val pages = warc.filter(
      !col("target_uri").endsWith("/robots.txt"))
    val kept = Robots.filterByRobots(
      graft.sources.Warc.warcHtmlDocuments(pages), col("url"),
      Robots.robotsFromCrawl(warc), "graftbot")
      .select("url").as[String].collect().toSet
    assert(kept == Set("http://h1.example.com/public/2",
      "http://h2.example.com/public/3"))
  }

  test("scheduleFrontier: per-host queue positions x crawl delay, default delay, null host unschedulable") {
    val robots = Seq(("h1.ex", "User-agent: *\nCrawl-delay: 2.5\n"))
      .toDF("host", "body")
    val f = Seq(
      (3L, "http://h1.ex/c"),
      (1L, "http://h1.ex/a"),
      (2L, "http://h1.ex/b"),
      (4L, "http://h2.ex/x"),
      (5L, "not a url"))
      .toDF("doc_id", "url")
    val got = graft.ops.Robots.scheduleFrontier(f, col("url"),
        col("doc_id"), robots, "graftbot")
      .select("doc_id", "delay_ms", "queue_pos", "fetch_after_ms")
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // h1 queue in doc_id order at 2500 ms spacing; h2 falls to the
    // 1 s default; the unparseable URL is never schedulable.
    assert(got(1L) == ((Some(2500L), Some(0L), Some(0L))))
    assert(got(2L) == ((Some(2500L), Some(1L), Some(2500L))))
    assert(got(3L) == ((Some(2500L), Some(2L), Some(5000L))))
    assert(got(4L) == ((Some(1000L), Some(0L), Some(0L))))
    assert(got(5L) == ((None, None, None)))
    // The caller's columns survive untouched and the guard refuses
    // collisions loudly.
    val e = intercept[IllegalArgumentException] {
      graft.ops.Robots.scheduleFrontier(
        f.withColumn("queue_pos", lit(1)), col("url"), col("doc_id"),
        robots, "graftbot")
    }
    assert(e.getMessage.contains("queue_pos"))
  }

  test("robots_decision registered for SQL use") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT robots_decision(
        |  robots_rules('User-agent: *
        |Disallow: /no/', 'graftbot'), '/no/x').allowed""".stripMargin)
      .collect()(0).getBoolean(0)
    assert(!got)
  }

  test("sitemapEntries: loc+lastmod pairs in block order, entity decode, loc-less block dropped, lastmod-first order tolerated") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset>
        | <url><loc> https://ex.org/a?x=1&amp;y=2 </loc><lastmod>2026-03-04</lastmod></url>
        | <url><loc>https://ex.org/b</loc></url>
        | <url><lastmod>2026-01-01</lastmod></url>
        | <url><lastmod>2026-05-06T07:08:09+00:00</lastmod><loc>https://ex.org/c</loc></url>
        |</urlset>""".stripMargin
    val out = Seq(xml).toDF("xml")
      .select(explode(Robots.sitemapEntries(col("xml"))).as("e"))
      .select("e.loc", "e.lastmod").as[(String, String)].collect().toSeq
    assert(out == Seq(
      ("https://ex.org/a?x=1&y=2", "2026-03-04"),
      ("https://ex.org/b", null),
      ("https://ex.org/c", "2026-05-06T07:08:09+00:00")))
  }
}

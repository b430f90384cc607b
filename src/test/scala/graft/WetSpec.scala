package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Wet

/** Raw-web (WET) ingestion contract: the in-repo binary fixture pins
  * the wire format (warcinfo skipping, Content-Length-driven bodies
  * with embedded blank lines / "WARC/1.0", empty bodies, multibyte
  * UTF-8, case-insensitive headers, multi-member gzip), and the
  * writer/reader round-trip pins octet-exact text recovery — the
  * closure pattern of the kafka connector contract (no real crawl
  * data ships in this environment). */
class WetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixturePath: String =
    getClass.getResource("/fixture.warc.wet.gz").getPath

  test("fixture parses byte-exactly: 4 records, headers, Content-Length-driven bodies") {
    val rows = Wet.readWet(spark, fixturePath)
      .orderBy("record_idx").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[String]("warc_type")).toSeq ==
      Seq("warcinfo", "conversion", "conversion", "conversion"))
    assert(rows.map(_.getAs[String]("target_uri")).toSeq == Seq("",
      "http://fixture.test/page/101", "http://fixture.test/page/102",
      "http://fixture.test/unicode/103"))
    assert(rows.map(_.getAs[String]("warc_date")).toSeq == Seq(
      "2026-08-15T00:00:00Z", "2026-08-15T01:02:03Z",
      "2026-08-15T01:02:04Z", "2026-08-15T01:02:05Z"))
    // Bodies recovered by OCTET length, not separator scanning: the
    // first conversion body embeds a blank CRLF line, a bare-LF line,
    // and the literal string "WARC/1.0"; the second is EMPTY; the
    // third is multibyte (94 octets, far fewer codepoints).
    assert(rows(1).getAs[String]("text") ==
      "This body contains a blank line\r\n\r\nand even the string " +
        "WARC/1.0 mid-record,\nplus a bare LF line.")
    assert(rows(1).getAs[Long]("content_length") == 96L)
    assert(rows(2).getAs[String]("text") == "")
    assert(rows(2).getAs[Long]("content_length") == 0L)
    assert(rows(3).getAs[String]("text") ==
      "深度学習モデルの訓練データ — multibyte body with emoji 😀 and accents éàü.")
    assert(rows(3).getAs[Long]("content_length") == 94L)
  }

  test("wetDocuments: conversion-only, trailing-integer doc ids, hash fallback for URL-keyed crawls") {
    val docs = Wet.wetDocuments(Wet.readWet(spark, fixturePath))
      .orderBy("doc_id").collect()
    assert(docs.length == 3)
    assert(docs.map(_.getAs[Long]("doc_id")).toSeq == Seq(101L, 102L, 103L))
    // A URI without a trailing integer falls back to a stable hash.
    val urlKeyed = Seq(("warcinfo", "", "d", 0L, "x", "f", 0L),
      ("conversion", "http://a.test/article-about-cats", "2026-01-01T00:00:00Z",
        3L, "cat", "f", 1L))
      .toDF("warc_type", "target_uri", "warc_date", "content_length",
        "text", "file", "record_idx")
    val fallback = Wet.wetDocuments(urlKeyed).collect()
    assert(fallback.length == 1 && fallback(0).getAs[Long]("doc_id") > 0L)
  }

  test("write/read round-trip is octet-exact on the real corpus") {
    val dir = java.nio.file.Files.createTempDirectory("wet_rt").toString
    try {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text"))
      Wet.writeWet(docs.select(
        concat(lit("http://graft.test/doc/"), col("doc_id")).as("uri"),
        lit("2026-01-01T00:00:00Z").as("date"), col("text")), dir)
      val back = Wet.wetDocuments(Wet.readWet(spark, dir))
        .select(col("doc_id"), col("text").as("text_rt"))
      val diff = docs.join(back, Seq("doc_id"), "full")
        .filter(col("text").isNull || col("text_rt").isNull ||
          col("text") =!= col("text_rt"))
      assert(docs.count() > 0 && diff.count() == 0)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }

  test("streaming ingest parity: arriving shards parse identically to the batch read") {
    val dir = java.nio.file.Files.createTempDirectory("wet_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("wet_ckpt").toString
    try {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(50).select(col("doc_id"), col("text"))
      Wet.writeWet(docs.select(
        concat(lit("http://graft.test/doc/"), col("doc_id")).as("uri"),
        lit("2026-01-01T00:00:00Z").as("date"), col("text")), dir)
      val q = Wet.readWetStream(spark, dir)
        .writeStream.format("memory").queryName("wet_stream_out")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val streamed = spark.table("wet_stream_out")
        .select("target_uri", "content_length", "text")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .toSet
      val batch = Wet.readWet(spark, dir)
        .select("target_uri", "content_length", "text")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .toSet
      assert(batch.size == 50 && streamed == batch)
    } finally {
      spark.sql("DROP TABLE IF EXISTS wet_stream_out")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir)); rm(new java.io.File(ckpt))
    }
  }

  test("crawl-to-curated streaming path: WET stream -> documents -> domain block -> quality verdicts equals the batch chain") {
    // The ingest deployment this round's pieces compose into: crawl
    // shards land in a directory, the stream parses them once, the
    // nightly blocklist (static frame) drops bad domains via the
    // stream-safe left_outer spelling, and the quality gate projects
    // verdicts — all stateless/stream-static, so batch ≡ stream by
    // construction. Urls are synthesized so doc_id % 3 == 0 lands on
    // a blocked domain.
    val dir = java.nio.file.Files.createTempDirectory("wet_e2e").toString
    val ckpt = java.nio.file.Files.createTempDirectory("wet_e2e_ck").toString
    try {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(60).select(col("doc_id"), col("text"))
      Wet.writeWet(docs.select(
        concat(lit("https://"),
          when(col("doc_id") % 3 === 0, lit("spam.example.org"))
            .otherwise(lit("good.example.com")),
          lit("/doc/"), col("doc_id")).as("uri"),
        lit("2026-01-01T00:00:00Z").as("date"), col("text")), dir)
      val block = Seq("example.org").toDF("domain")
      def chain(wet: org.apache.spark.sql.DataFrame) = {
        val d = graft.ops.Domains.filterByDomainList(
          Wet.wetDocuments(wet), col("url"), block, allow = false)
        graft.ops.TextAnalysis.qualityFilter(d, minTokens = 10)
      }
      val q = chain(Wet.readWetStream(spark, dir))
        .writeStream.format("memory").queryName("wet_e2e_out")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      val streamed = spark.table("wet_e2e_out")
        .select("doc_id", "keep").as[(Long, Boolean)].collect().toSet
      val batch = chain(Wet.readWet(spark, dir))
        .select("doc_id", "keep").as[(Long, Boolean)].collect().toSet
      assert(streamed == batch)
      // The blocked third is gone; survivors are exactly the
      // non-blocked ids.
      assert(batch.nonEmpty && batch.forall(_._1 % 3 != 0))
      assert(batch.map(_._1) ==
        docs.select("doc_id").as[Long].collect().filter(_ % 3 != 0).toSet)
    } finally {
      spark.sql("DROP TABLE IF EXISTS wet_e2e_out")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir)); rm(new java.io.File(ckpt))
    }
  }

  test("malformed shards fail loudly: truncated body, missing Content-Length, bad magic") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val truncated = gz(("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: 50\r\n\r\nonly ten b").getBytes("UTF-8"))
    intercept[java.io.EOFException] {
      Wet.parseWet("t", truncated).toList
    }
    val noLen = gz(("WARC/1.0\r\nWARC-Type: conversion\r\n\r\nbody"
      ).getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      Wet.parseWet("t", noLen).toList
    }
    val badMagic = gz("HTTP/1.1 200 OK\r\n\r\n".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      Wet.parseWet("t", badMagic).toList
    }
  }
}

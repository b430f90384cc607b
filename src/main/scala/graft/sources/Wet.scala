package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WET record (WARC/1.0 conversion format — the plain-text
  * distribution Common Crawl ships, ISO 28500): envelope headers plus
  * the text payload. `warc_type` distinguishes the leading `warcinfo`
  * record and any non-conversion noise from the `conversion` records a
  * corpus wants. */
final case class WetRecord(
    file: String,
    record_idx: Long,
    warc_type: String,
    target_uri: String,
    warc_date: String,
    content_length: Long,
    text: String)

/** Raw-web ingestion: a WET (WARC/1.0 plain-text conversion) reader
  * and writer, closing the corpus surface's front door — before this,
  * the pipeline started at a parquet `documents` table and
  * Common-Crawl-shaped input had no path in (VERDICT r10 "What's
  * missing #4").
  *
  * Read path: `spark.read.format("binaryFile")` over a path/glob of
  * `.wet.gz` files (gzip is unsplittable, so one task per file is the
  * natural — and only — parallelism; a Common Crawl segment is ~150 MB
  * compressed, and a crawl is tens of thousands of files, so the
  * cluster parallelizes ACROSS files). Each file is parsed by a
  * streaming record walker driven by `Content-Length` (never by
  * scanning for separators — bodies legally contain blank lines and
  * even "WARC/1.0"), decompressing incrementally off the in-memory
  * compressed bytes. binaryFile caps files at
  * `spark.sql.sources.binaryFile.maxLength` (2 GB): standard WET
  * shards sit two orders of magnitude below it.
  *
  * Parsing is deliberately lenient where the wild demands it (header
  * names case-insensitive, unknown headers ignored, missing optional
  * headers default to empty) and loud where silence would corrupt a
  * corpus (a record whose magic line or Content-Length is malformed
  * fails the task with the file and record index — truncated or
  * mis-concatenated shards must not silently drop their tail).
  *
  * Contract closure: no real crawl data ships in this environment, so
  * the format is pinned by (a) an in-repo binary fixture
  * (`fixture.warc.wet.gz`, exercising warcinfo skipping, bodies with
  * embedded blank lines / "WARC/1.0", empty bodies, multibyte UTF-8)
  * and (b) the `wet_roundtrip` oracle gate, which serializes the
  * documents table through [[writeWet]] and reads it back — the same
  * closure pattern as the kafka connector contract (README coverage
  * map). */
object Wet {

  /** Parse every WET record under `path` (file, directory, or glob of
    * `.wet.gz` / gzipped text shards). One row per record, including
    * non-conversion envelope records — filter `warc_type =
    * 'conversion'` (or use [[wetDocuments]]) for the corpus view. */
  def readWet(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .filter(col("length") > 0) // commit markers / empty shards
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, gz) => parseWet(file, gz) }
      .toDF()
  }

  /** STREAMING twin of [[readWet]]: new `.wet.gz` shards arriving in
    * `path` become WET records as they land — the ingest-time front
    * door (crawl shards drop into a directory; the stream parses each
    * exactly once and downstream stateless ops — quality, langid,
    * novelty probes, streaming dedup — run per micro-batch). The
    * parser is the SAME stateless walker as the batch read, so batch
    * ≡ stream per shard by construction (spec-pinned); use
    * `maxFilesPerTrigger` to bound micro-batch size. */
  def readWetStream(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.readStream.format("binaryFile")
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(path)
      .filter(col("length") > 0)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (file, gz) => parseWet(file, gz) }
      .toDF()
  }

  /** The `documents`-shaped view of [[readWet]]: conversion records
    * only, `doc_id` = the trailing integer of the target URI when one
    * exists (the [[writeWet]] round-trip convention), else a stable
    * 63-bit hash of (uri, date) — URL-keyed crawls have no integer
    * ids. The integer match is bounded at 18 digits: anything longer
    * (21-digit session/tracking ids are common in the wild) cannot
    * overflow the ANSI-mode long cast and falls to the hash id
    * instead of killing the ingest task. */
  def wetDocuments(wet: DataFrame): DataFrame =
    wet.filter(col("warc_type") === "conversion")
      .select(
        coalesce(
          nullif(regexp_extract(col("target_uri"),
            "/([0-9]{1,18})$", 1), lit("")).cast("long"),
          pmod(xxhash64(col("target_uri"), col("warc_date")),
            lit(Long.MaxValue))).as("doc_id"),
        col("target_uri").as("url"), col("warc_date").as("fetch_date"),
        col("text"))

  /** Serialize a (uri, date, text) frame as WET shards under `path` —
    * one gzipped shard per partition via the text writer (each part
    * file is a self-contained valid WET stream; gzip'd text is exactly
    * the WET wire format). `Content-Length` is the UTF-8 OCTET length
    * of the body, never the character count — multibyte text
    * round-trips exactly (spec + gate). */
  def writeWet(records: DataFrame, path: String): Unit =
    records
      .select(concat(
        lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        col("uri"),
        lit("\r\nWARC-Date: "), col("date"),
        lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
        octet_length(col("text")).cast("string"),
        lit("\r\n\r\n"), col("text"), lit("\r\n")).as("value"))
      .write.mode("overwrite")
      .option("compression", "gzip").option("lineSep", "\r\n")
      .text(path)

  /** Streaming record walker — the shared [[WarcWalker]] (raw-WARC
    * reader [[Warc]] uses the same envelope grammar) with the WET
    * interpretation of the payload: UTF-8 plain text. `private[graft]`
    * so the fixture spec can drive it byte-exactly. */
  private[graft] def parseWet(file: String, gz: Array[Byte]): Iterator[WetRecord] =
    WarcWalker.records(file, gz).map(r =>
      WetRecord(r.file, r.recordIdx, r.warcType, r.targetUri, r.warcDate,
        r.contentLength,
        new String(r.body, java.nio.charset.StandardCharsets.UTF_8)))
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain curation over crawl-shaped corpora — the filter axis a
  * web pipeline applies FIRST (C4/RefinedWeb-style): extract the
  * host, roll it up to a registrable domain, profile domain
  * concentration, and apply allow/block lists. Composes with
  * [[graft.sources.Wet.wetDocuments]]' `url` column (the raw-web
  * front door this round added).
  *
  * All extraction is ONE portable regexp + label arithmetic per row —
  * zero UDFs, zero shuffles, RE2-safe (no lookbehind), so the DuckDB
  * oracle replays every value and the expressions run inside
  * whole-stage codegen at scan time (the filter pushes to the
  * source). */
object Domains {

  /** Lowercased host of a URL: `scheme://[userinfo@]HOST[:port][/…]`.
    * Unparseable (no scheme, empty host) → null, so malformed rows
    * are countable rather than silently grouped under "".
    * Bracketed IPv6 literals are out of scope (they parse as null —
    * crawl corpora key on names; document, don't guess). */
  def host(url: Column): Column =
    lower(nullif(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+).*", 1), lit("")))

  /** The 2-label tails that take a third label (a bounded,
    * parameterized stand-in for the full Public Suffix List — the
    * real PSL is a data file a deployment ships and passes in; the
    * LOGIC is what this operator owns). */
  val DefaultMultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "co.za")

  /** Registrable domain of a [[host]]: the last two labels, or the
    * last three when the two-label tail is a listed multi-part suffix
    * ("bbc.co.uk" → "bbc.co.uk", "news.bbc.co.uk" → "bbc.co.uk").
    * All-numeric hosts (IPv4 literals) and single-label hosts
    * (localhost, intranet names) are their own domain. Null host →
    * null. */
  def registrableDomain(hostCol: Column,
      multiPartSuffixes: Seq[String] = DefaultMultiPartSuffixes): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val last2 = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    val last3 = concat_ws(".", element_at(labels, -3),
      element_at(labels, -2), element_at(labels, -1))
    when(hostCol.isNull, lit(null).cast("string"))
      .when(hostCol.rlike("^[0-9.]+$") || n < 2, hostCol)
      .when(n >= 3 && last2.isin(multiPartSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** Input frame + `host` and `domain` columns — the standard prefix
    * of every operator below. Refuses an input that ALREADY carries
    * either name (overwriting caller metadata silently is the failure
    * mode; project it away or rename first). [[filterByDomainList]]
    * is collision-proof on its own — it derives the domain under a
    * fresh temp name and hands back the caller's schema untouched. */
  def withDomain(docs: DataFrame, urlCol: Column,
      multiPartSuffixes: Seq[String] = DefaultMultiPartSuffixes): DataFrame = {
    for (c <- Seq("host", "domain"))
      require(!docs.columns.contains(c),
        s"input already has a '$c' column — withDomain would silently " +
          "overwrite it; rename or drop it first")
    docs.withColumn("host", host(urlCol))
      .withColumn("domain", registrableDomain(col("host"), multiPartSuffixes))
  }

  /** Per-domain concentration profile: doc count and corpus share,
    * descending — the "one domain is 30% of the corpus" pre-flight
    * before any mixture math trusts the source labels. Thin
    * composition over [[Profiling.hotKeys]] (map-side-combined
    * counts; the share total re-aggregates the counts frame via AQE
    * exchange reuse — one input pass, plan-pinned there). */
  def domainProfile(docs: DataFrame, urlCol: Column, k: Int = 100,
      multiPartSuffixes: Seq[String] = DefaultMultiPartSuffixes): DataFrame =
    Profiling.hotKeys(
      withDomain(docs, urlCol, multiPartSuffixes), col("domain"), k)

  /** Allow/block a corpus by a domain LIST (a frame with one `domain`
    * column — blocklists run to millions of rows, so this is a
    * broadcast-eligible equi-join, never an isin literal): keeps rows
    * whose registrable domain is in the list (`allow = true`) or not
    * in it (`allow = false`). Null domains (unparseable URLs) are
    * DROPPED in allow mode (they match no allowed domain) and KEPT in
    * block mode (they match no blocked domain) — set semantics, not a
    * special case.
    *
    * Works UNCHANGED on a streaming corpus against a static list (the
    * ingest-time deployment: crawl shards stream in, the blocklist is
    * a nightly artifact): allow mode is a stream-static left-semi
    * join; block mode is deliberately spelled left_outer + null
    * filter rather than left_anti — identical semantics (the list is
    * deduplicated, so the join never multiplies rows) and, unlike
    * left_anti, supported for stream-static joins. Batch ≡ stream
    * spec-pinned end-to-end in WetSpec. */
  def filterByDomainList(docs: DataFrame, urlCol: Column, list: DataFrame,
      allow: Boolean,
      multiPartSuffixes: Seq[String] = DefaultMultiPartSuffixes): DataFrame = {
    // Fresh temp names (the packManifest collision guard): the
    // caller's own host/domain/_blocked columns, if any, pass through
    // untouched.
    val taken = docs.columns.toSet
    def fresh(base: String): String =
      Iterator.from(0).map(i => s"_${base}_$i").find(!taken(_)).get
    val dcol = fresh("dom")
    val bcol = fresh("blocked")
    val tagged = docs.withColumn(dcol,
      registrableDomain(host(urlCol), multiPartSuffixes))
    val dl = list.select(col("domain").as(dcol)).distinct()
    val kept =
      if (allow) tagged.join(dl, Seq(dcol), "left_semi")
      else tagged
        .join(dl.withColumn(bcol, lit(true)), Seq(dcol), "left_outer")
        .filter(col(bcol).isNull)
        .drop(bcol)
    kept.drop(dcol)
  }
}

// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Extract the OUTLINKS of an HTML document: one
  * `{href, rel, anchor}` struct per `<a>` tag that carries an `href`
  * attribute, in document order — the link layer of the WARC front
  * door ([[HtmlBlocks]] owns the text layer). Outlinks feed the two
  * crawl-curation signals a corpus builder needs at 100 TB: the
  * domain link GRAPH (link-based quality/centrality — see
  * `graft.ops.Domains.outlinkDomainEdges` / `pageRankFixedPoint`) and
  * per-page link profiling (link farms are outlink-dense).
  *
  * Same execution shape as [[HtmlBlocks]]: ONE linear scan per
  * document, a zero-shuffle codegen'd projection, no HTML library —
  * link extraction needs the tag stream plus attribute values, not a
  * DOM. Shared grammar with the block segmenter:
  *
  *  - `script`/`style`/`noscript`/`template`/`svg`/`iframe`/
  *    `textarea` content is skipped to the matching close tag (an
  *    `<a href>` inside a script string is NOT a link); comments,
  *    CDATA, DOCTYPE/PI skipped whole; `>` inside a quoted attribute
  *    value does not close its tag.
  *  - Attribute values decode the same character-reference set as
  *    block text (five named XML entities, `&nbsp;`, numeric
  *    `&#NN;`/`&#xHH;`) — `href="?a=1&amp;b=2"` must come back with a
  *    real `&`, and so must anchor text.
  *  - `anchor` is the whitespace-collapsed decoded text between the
  *    open tag and its close; nested inline/block tags contribute
  *    their text (browser-like). A nested `<a>` implicitly closes the
  *    open one (browser behavior — nested anchors are invalid HTML);
  *    an anchor still open at EOF is emitted with the text seen.
  *  - `href` is the decoded attribute value verbatim (resolution
  *    against the page URL is the caller's policy — see
  *    `Domains.linkTargetHost`); `rel` is lowercased, `''` when
  *    absent. An `<a>` WITHOUT href (a named anchor) emits nothing.
  *  - Unquoted attribute values run to whitespace or `>` (a trailing
  *    `/` stays in the value, per the HTML5 unquoted grammar).
  *
  * Unterminated constructs at EOF consume to EOF rather than throwing
  * — a truncated document is a data fact, same stance as
  * [[HtmlBlocks]]. */
case class HtmlLinks(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(HtmlLinksImpl.linkSchema, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_links"

  override protected def nullSafeEval(input: Any): Any =
    HtmlLinksImpl.links(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.HtmlLinksImpl.links($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlLinks =
    copy(child = newChild)
}

object HtmlLinksImpl {
  val linkSchema: StructType = StructType(Seq(
    StructField("href", StringType, nullable = false),
    StructField("rel", StringType, nullable = false),
    StructField("anchor", StringType, nullable = false)))

  /** Tags whose CONTENT is skipped (shared stance with HtmlBlocks). */
  private val SkipTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("script", "style", "noscript", "template", "svg", "iframe",
      "textarea").foreach(s.add)
    s
  }

  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Decode the shared [[HtmlEntities]] character-reference set in
    * `s` — used for attribute values (anchor text decodes inline in
    * the main scan). */
  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val packed = HtmlEntities.decodeAt(s, i)
        val cp = HtmlEntities.cp(packed)
        if (cp >= 0) out.appendCodePoint(cp) else out.append('&')
        i = HtmlEntities.next(packed)
      } else {
        out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** Collapse ASCII whitespace runs to one space, trim ends. */
  private def collapseWs(raw: java.lang.StringBuilder): String = {
    val out = new java.lang.StringBuilder(raw.length)
    var i = 0
    var pendingSpace = false
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (isAsciiWs(c)) pendingSpace = out.length > 0
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** See [[HtmlLinks]]. Static for codegen. */
  def links(html: UTF8String): GenericArrayData = {
    val s = html.toString
    val n = s.length
    val out = new java.util.ArrayList[AnyRef](8)

    // Pending open anchor (null href sentinel = no anchor open).
    var pendHref: String = null
    var pendRel: String = ""
    var pendHasHref = false
    val anchorBuf = new java.lang.StringBuilder(64)

    def emitPending(): Unit = {
      if (pendHref != null) {
        if (pendHasHref) {
          val row = new GenericInternalRow(3)
          row.update(0, UTF8String.fromString(pendHref))
          row.update(1, UTF8String.fromString(pendRel))
          row.update(2, UTF8String.fromString(collapseWs(anchorBuf)))
          out.add(row)
        }
        pendHref = null
        pendRel = ""
        pendHasHref = false
        anchorBuf.setLength(0)
      }
    }

    /** Index just past a tag's closing '>' plus the self-close flag
      * (matters for skip tags — an `<iframe/>` has no content to skip,
      * and treating it as open would discard every link to EOF; same
      * guard as HtmlBlocks). Shared scanner: see [[HtmlScan.tagEnd]]
      * for the unquoted-attribute-value subtlety. */
    def tagEnd(from: Int): (Int, Boolean) = HtmlScan.tagEnd(s, n, from)

    /** Parse the attributes of an `<a>` tag starting at `from` (just
      * past the tag name); returns the index past '>'. Sets the
      * pending-anchor attribute state. */
    def parseAnchorAttrs(from: Int): Int = {
      var i = from
      while (i < n) {
        // Skip whitespace and stray '/' (self-close syntax).
        while (i < n && (isAsciiWs(s.charAt(i)) || s.charAt(i) == '/')) i += 1
        if (i >= n) return n
        if (s.charAt(i) == '>') return i + 1
        // Attribute name: up to ws, '=', '>', '/'.
        val nameStart = i
        while (i < n && !isAsciiWs(s.charAt(i)) && s.charAt(i) != '=' &&
            s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
        val name = s.substring(nameStart, i).toLowerCase(java.util.Locale.ROOT)
        while (i < n && isAsciiWs(s.charAt(i))) i += 1
        var value: String = null
        if (i < n && s.charAt(i) == '=') {
          i += 1
          while (i < n && isAsciiWs(s.charAt(i))) i += 1
          if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
            val q = s.charAt(i)
            i += 1
            val vStart = i
            while (i < n && s.charAt(i) != q) i += 1
            value = s.substring(vStart, Math.min(i, n))
            if (i < n) i += 1 // past the closing quote
          } else {
            // Unquoted: to whitespace or '>' ('/' stays in the value,
            // per the HTML5 unquoted-attribute grammar).
            val vStart = i
            while (i < n && !isAsciiWs(s.charAt(i)) && s.charAt(i) != '>')
              i += 1
            value = s.substring(vStart, i)
          }
        }
        if (name == "href" && !pendHasHref) {
          // First href wins (duplicate attributes are invalid HTML;
          // browsers keep the first).
          pendHref = decodeEntities(if (value == null) "" else value)
          pendHasHref = true
        } else if (name == "rel" && pendRel.isEmpty) {
          pendRel = decodeEntities(if (value == null) "" else value)
            .toLowerCase(java.util.Locale.ROOT)
        }
      }
      n
    }

    /** Case-insensitive index of "</name" followed by ws/'>'/EOF,
      * starting at `from`; n if absent. */
    def findClose(name: String, from: Int): Int = {
      var i = from
      val m = name.length
      while (i + 1 < n) {
        if (s.charAt(i) == '<' && s.charAt(i + 1) == '/' &&
            i + 2 + m <= n && s.regionMatches(true, i + 2, name, 0, m) &&
            (i + 2 + m == n || s.charAt(i + 2 + m) == '>' ||
              isAsciiWs(s.charAt(i + 2 + m)))) return i
        i += 1
      }
      n
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.regionMatches(false, i, "<!--", 0, 4)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (s.regionMatches(true, i, "<![CDATA[", 0, 9)) {
          val e = s.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n &&
            (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          val e = s.indexOf('>', i + 1)
          i = if (e < 0) n else e + 1
        } else {
          var j = i + 1
          val closing = j < n && s.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && Character.isLetterOrDigit(s.charAt(j))) j += 1
          if (j == nameStart) {
            // Bare '<' — literal text.
            if (pendHref != null) anchorBuf.append(c)
            i += 1
          } else {
            val name = s.substring(nameStart, j)
              .toLowerCase(java.util.Locale.ROOT)
            val (end, selfClosed) = tagEnd(j)
            if (!closing && !selfClosed && SkipTags.contains(name)) {
              val closeAt = findClose(name, end)
              i = if (closeAt >= n) n
                else tagEnd(closeAt + 2 + name.length)._1
            } else if (name == "a") {
              if (closing) {
                emitPending()
                i = end
              } else {
                emitPending() // nested <a> implicitly closes the open one
                pendHref = "" // anchor open (href may follow)
                i = parseAnchorAttrs(j)
              }
            } else {
              i = end
            }
          }
        }
      } else if (c == '&') {
        val packed = HtmlEntities.decodeAt(s, i)
        val cp = HtmlEntities.cp(packed)
        if (pendHref != null) {
          if (cp >= 0) Character.toChars(cp).foreach(anchorBuf.append)
          else anchorBuf.append('&')
        }
        i = HtmlEntities.next(packed)
      } else {
        if (pendHref != null) anchorBuf.append(c)
        i += 1
      }
    }
    emitPending() // anchor still open at EOF
    new GenericArrayData(out.toArray)
  }
}

object HtmlLinksColumns {
  def htmlLinks(html: Column): Column =
    ExpressionUtils.column(HtmlLinks(ExpressionUtils.expression(html)))
}

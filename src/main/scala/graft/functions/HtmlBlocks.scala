// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Segment an HTML document into text BLOCKS with the per-block
  * signals a jusText/trafilatura-style boilerplate filter scores on:
  * `{text, n_words, link_density}` per block, in document order.
  * (Block scoring by length + link density is the published core of
  * those extractors — kept blocks are long and low-link, chrome is
  * short and link-dense.)
  *
  * One linear scan per document — a zero-shuffle, codegen'd
  * projection (the boilerplate-extraction counterpart of
  * [[GramStats]]); no HTML library exists in this stack and none is
  * needed: block segmentation needs the tag STREAM, not a DOM.
  *
  *  - `script`/`style`/`noscript`/`template`/`svg`/`iframe` content
  *    is skipped to the matching close tag (case-insensitive); HTML
  *    comments, CDATA sections, DOCTYPE/processing instructions are
  *    skipped whole. A `>` inside a quoted attribute value does not
  *    close its tag.
  *  - Block-level tags (open or close) flush the current block;
  *    inline tags contribute nothing (browser-like: `a<span>b` is one
  *    word).
  *  - Text accumulates with the five named XML entities, `&nbsp;`
  *    (→ space) and numeric `&#NN;`/`&#xHH;` references decoded; an
  *    unrecognized `&…` stays literal. A bare `<` that opens no tag
  *    name stays literal.
  *  - Block text is normalized: runs of ASCII whitespace
  *    (space, \t, \n, \u000B, \f, \r) collapse to one space, ends
  *    trimmed — the exact collapse a relational oracle replays with
  *    one regexp. Empty-after-normalize blocks are not emitted.
  *  - `n_words` = space-separated tokens of the normalized text;
  *    `link_density` = non-whitespace chars inside `<a>` / all
  *    non-whitespace chars of the block (0 for an all-whitespace
  *    block).
  *
  * Unterminated constructs at EOF (open comment, open script, open
  * tag) consume to EOF rather than throwing: a truncated document is
  * a data fact the filter should score, not a task killer — unlike
  * the WARC ENVELOPE, whose truncation is loud by design. */
case class HtmlBlocks(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    ArrayType(HtmlBlocksImpl.blockSchema, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "html_blocks"

  override protected def nullSafeEval(input: Any): Any =
    HtmlBlocksImpl.blocks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.HtmlBlocksImpl.blocks($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlBlocks =
    copy(child = newChild)
}

/** The character-reference decoder shared by the HTML front-door
  * expressions ([[HtmlBlocks]] block text, [[HtmlLinks]] anchor text
  * and attribute values): five named XML entities, `&nbsp;`
  * (→ space), numeric `&#NN;`/`&#xHH;`; anything else stays a
  * literal `&`. One definition so the supported set can never
  * silently diverge between text and attribute decoding. */
object HtmlEntities {
  /** Decode the reference starting at `s(i) == '&'`. Packed result:
    * high 32 bits = codepoint (-1 → unrecognized, emit literal '&'),
    * low 32 bits = index to resume at. */
  def decodeAt(s: String, i: Int): Long = {
    val n = s.length
    var j = i + 1
    val max = Math.min(n, i + 12)
    while (j < max && s.charAt(j) != ';') j += 1
    var decoded = -1
    if (j < max && j > i + 1) {
      val name = s.substring(i + 1, j)
      if (name == "amp") decoded = '&'
      else if (name == "lt") decoded = '<'
      else if (name == "gt") decoded = '>'
      else if (name == "quot") decoded = '"'
      else if (name == "apos") decoded = '\''
      else if (name == "nbsp") decoded = ' '
      else if (name.length > 1 && name.charAt(0) == '#') {
        try {
          val cp =
            if (name.charAt(1) == 'x' || name.charAt(1) == 'X')
              Integer.parseInt(name.substring(2), 16)
            else Integer.parseInt(name.substring(1))
          if (Character.isValidCodePoint(cp)) decoded = cp
        } catch { case _: NumberFormatException => () }
      }
    }
    val next = if (decoded >= 0) j + 1 else i + 1
    (decoded.toLong << 32) | (next.toLong & 0xFFFFFFFFL)
  }

  def cp(packed: Long): Int = (packed >> 32).toInt
  def next(packed: Long): Int = (packed & 0xFFFFFFFFL).toInt
}

object HtmlBlocksImpl {
  val blockSchema: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("link_density", DoubleType, nullable = false)))

  /** Tags that delimit text blocks (open OR close flushes). */
  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("html", "head", "body", "title", "p", "div", "section", "article",
      "main", "aside", "header", "footer", "nav", "h1", "h2", "h3", "h4",
      "h5", "h6", "ul", "ol", "li", "dl", "dt", "dd", "table", "thead",
      "tbody", "tfoot", "tr", "td", "th", "caption", "blockquote", "pre",
      "br", "hr", "form", "fieldset", "legend", "figure", "figcaption",
      "center", "address", "details", "summary", "option", "optgroup",
      "select", "button").foreach(s.add)
    s
  }

  /** Tags whose CONTENT is skipped to the matching close tag. */
  private val SkipTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("script", "style", "noscript", "template", "svg", "iframe",
      "textarea").foreach(s.add)
    s
  }

  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** See [[HtmlBlocks]]. Static for codegen. */
  def blocks(html: UTF8String): GenericArrayData = {
    val s = html.toString
    val n = s.length
    val out = new java.util.ArrayList[AnyRef](16)
    val buf = new java.lang.StringBuilder(256)
    var nonWs = 0
    var linkNonWs = 0
    var anchorDepth = 0

    def append(c: Char): Unit = {
      buf.append(c)
      if (!isAsciiWs(c)) {
        nonWs += 1
        if (anchorDepth > 0) linkNonWs += 1
      }
    }

    def flush(): Unit = {
      // Collapse ASCII whitespace runs, trim ends.
      val raw = buf
      val norm = new java.lang.StringBuilder(raw.length)
      var i = 0
      var pendingSpace = false
      while (i < raw.length) {
        val c = raw.charAt(i)
        if (isAsciiWs(c)) pendingSpace = norm.length > 0
        else {
          if (pendingSpace) { norm.append(' '); pendingSpace = false }
          norm.append(c)
        }
        i += 1
      }
      if (norm.length > 0) {
        var words = 1
        var j = 0
        while (j < norm.length) {
          if (norm.charAt(j) == ' ') words += 1
          j += 1
        }
        val density =
          if (nonWs > 0) linkNonWs.toDouble / nonWs.toDouble else 0.0
        val row = new GenericInternalRow(3)
        row.update(0, UTF8String.fromString(norm.toString))
        row.setInt(1, words)
        row.setDouble(2, density)
        out.add(row)
      }
      buf.setLength(0)
      nonWs = 0
      linkNonWs = 0
    }

    /** Index just past a tag's closing '>' plus the self-close flag;
      * shared scanner — see [[HtmlScan.tagEnd]] for the unquoted-
      * attribute-value subtlety. */
    def tagEnd(from: Int): (Int, Boolean) = HtmlScan.tagEnd(s, n, from)

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
          // DOCTYPE / processing instruction: skip to '>'.
          val e = s.indexOf('>', i + 1)
          i = if (e < 0) n else e + 1
        } else {
          var j = i + 1
          val closing = j < n && s.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && (Character.isLetterOrDigit(s.charAt(j)))) j += 1
          if (j == nameStart) {
            // Bare '<' (e.g. "a < b") — literal text.
            append(c)
            i += 1
          } else {
            val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
            val (end, selfClosed) = tagEnd(j)
            if (!closing && !selfClosed && SkipTags.contains(name)) {
              flush()
              val closeAt = findClose(name, end)
              i = if (closeAt >= n) n else tagEnd(closeAt + 2 + name.length)._1
            } else {
              if (name == "a") {
                if (closing) anchorDepth = Math.max(0, anchorDepth - 1)
                else if (!selfClosed) anchorDepth += 1
              }
              if (BlockTags.contains(name)) flush()
              i = end
            }
          }
        }
      } else if (c == '&') {
        val packed = HtmlEntities.decodeAt(s, i)
        val cp = HtmlEntities.cp(packed)
        if (cp >= 0) Character.toChars(cp).foreach(append)
        else append('&')
        i = HtmlEntities.next(packed)
      } else {
        append(c)
        i += 1
      }
    }
    flush()
    new GenericArrayData(out.toArray)
  }
}

object HtmlBlocksColumns {
  def htmlBlocks(html: Column): Column =
    ExpressionUtils.column(HtmlBlocks(ExpressionUtils.expression(html)))
}

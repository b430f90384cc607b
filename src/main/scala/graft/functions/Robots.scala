// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parse a robots.txt BODY into the ordered rule list that applies to
  * one crawler product token — the crawl-politeness half of the raw-web
  * front door (RFC 9309; the reference engine has no crawl layer, this
  * belongs to the LLM-pipeline brief alongside the WARC link layer).
  *
  * `robots_rules(body, agent)` returns
  * `ARRAY<STRUCT<allow: BOOLEAN, pattern: STRING>>` in document order:
  *
  *  - Lines are `field: value`; `#` starts a comment; fields are
  *    case-insensitive; unknown fields (`sitemap`, `crawl-delay`, …)
  *    are ignored and do NOT break a group (RFC 9309 §2.2: other
  *    records may be interleaved).
  *  - A GROUP is a run of `user-agent` lines followed by its
  *    `allow`/`disallow` rules; a `user-agent` line after a rule line
  *    starts a new group. Rules before any `user-agent` line are
  *    invalid and dropped.
  *  - Group selection (RFC 9309 §2.2.1): if ANY group names the
  *    product token (case-insensitive exact match), the union of
  *    those groups applies — even when they carry zero rules (an
  *    empty exact group means "everything allowed", NOT "fall back to
  *    `*`"); otherwise the union of the `*` groups applies; otherwise
  *    the rule list is empty (allowed).
  *  - Empty-value rules (`Disallow:` with nothing after it — the
  *    classic allow-all idiom) contribute no pattern but still end
  *    the group's user-agent run.
  *
  * The decision itself is [[RobotsDecision]] — parsing runs once per
  * robots.txt row (cold path, per-host), matching runs once per URL
  * (hot path), so the two are separate expressions joined by the
  * host-keyed rules array. */
case class RobotsRules(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType =
    ArrayType(RobotsImpl.ruleSchema, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "robots_rules"

  override protected def nullSafeEval(body: Any, agent: Any): Any =
    RobotsImpl.rules(body.asInstanceOf[UTF8String],
      agent.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, a) =>
      s"org.apache.spark.sql.graft.RobotsImpl.rules($b, $a)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsRules =
    copy(left = newLeft, right = newRight)
}

/** Evaluate a [[RobotsRules]] array against one URL path — the hot
  * half of the politeness filter, one call per corpus URL.
  *
  * `robots_decision(rules, path)` returns
  * `STRUCT<allowed: BOOLEAN, matched: STRING>` where `matched` is the
  * winning rule's pattern (NULL when no rule matched — allowed by
  * default, including the empty-rules array).
  *
  * Matching is RFC 9309 §2.2.2/2.2.3: a pattern matches when the path
  * (including the query string, excluding the fragment) starts with
  * it, with `*` matching any character run and a TRAILING `$`
  * anchoring the match at the end of the path (`$` anywhere else is a
  * literal). Among matching rules the LONGEST pattern wins, length
  * counted in UTF-8 OCTETS as the RFC specifies (`*`/`$` included;
  * `UTF8String.numBytes`, so non-ASCII patterns tie-break exactly as
  * an octet-counting crawler would — spec-pinned); on a length tie
  * `allow` wins (least restrictive, §2.2.2); on a full tie the first
  * rule in document order is reported. Paths are case-sensitive (URL
  * paths are), hosts are the join key and normalized upstream. */
case class RobotsDecision(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(RobotsImpl.ruleSchema, containsNull = false), StringType)
  override def dataType: DataType = RobotsImpl.decisionSchema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "robots_decision"

  override protected def nullSafeEval(rules: Any, path: Any): Any =
    RobotsImpl.decide(rules.asInstanceOf[ArrayData],
      path.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (r, p) =>
      s"org.apache.spark.sql.graft.RobotsImpl.decide($r, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsDecision =
    copy(left = newLeft, right = newRight)
}

/** Group-scoped `Crawl-delay` of a robots.txt for one crawler token
  * (nonstandard but ubiquitous): the first parseable value among the
  * applicable groups under the same RFC 9309 group selection as
  * [[RobotsRules]] — exact groups fully shadow `*` groups (an exact
  * group WITHOUT a delay yields NULL even when a `*` group has one,
  * mirroring rule selection). NULL when absent/unparseable — the
  * caller's scheduler picks its own default. */
case class RobotsCrawlDelay(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "robots_crawl_delay"

  override protected def nullSafeEval(body: Any, agent: Any): Any =
    RobotsImpl.crawlDelay(body.asInstanceOf[UTF8String],
      agent.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, a) => {
      val d = ctx.freshName("delay")
      s"""java.lang.Double $d =
         |  org.apache.spark.sql.graft.RobotsImpl.crawlDelay($b, $a);
         |if ($d == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $d.doubleValue(); }""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsCrawlDelay =
    copy(left = newLeft, right = newRight)
}

object RobotsImpl {
  val ruleSchema: StructType = StructType(Seq(
    StructField("allow", BooleanType, nullable = false),
    StructField("pattern", StringType, nullable = false)))

  val decisionSchema: StructType = StructType(Seq(
    StructField("allowed", BooleanType, nullable = false),
    StructField("matched", StringType, nullable = true)))

  /** See [[RobotsRules]]. Static for codegen. */
  def rules(bodyU: UTF8String, agentU: UTF8String): GenericArrayData =
    parse(bodyU, agentU)._1

  /** See [[RobotsCrawlDelay]]. Static for codegen; null when the
    * applicable groups declare no (parseable) delay. */
  def crawlDelay(bodyU: UTF8String, agentU: UTF8String): java.lang.Double =
    parse(bodyU, agentU)._2

  /** One group walk feeding both [[rules]] and [[crawlDelay]]. */
  private def parse(bodyU: UTF8String,
      agentU: UTF8String): (GenericArrayData, java.lang.Double) = {
    val body = bodyU.toString
    val agent = agentU.toString.trim.toLowerCase(java.util.Locale.ROOT)
    // (allow, pattern) per applicable rule; exact-group rules and
    // star-group rules collected separately, exact preferred.
    val exact = new java.util.ArrayList[(Boolean, String)]()
    val star = new java.util.ArrayList[(Boolean, String)]()
    var exactDelay: java.lang.Double = null
    var starDelay: java.lang.Double = null
    var sawExactGroup = false
    // Current group state: which buckets it feeds, and whether we're
    // past its user-agent run (a rule line seen).
    var groupExact = false
    var groupStar = false
    var groupOpen = false
    var inRules = false
    // A crawl-delay seen INSIDE the user-agent run is buffered until
    // the run completes (first rule line / next group / EOF): the
    // group's agent set is not final until then, and bucketing early
    // would drop the delay for an agent named by a LATER UA line of
    // the same run (ADVICE r13). First pending line wins, preserving
    // document order.
    var pendingDelay: java.lang.Double = null
    def flushPendingDelay(): Unit = if (pendingDelay != null) {
      if (groupExact && exactDelay == null) exactDelay = pendingDelay
      else if (groupStar && !groupExact && starDelay == null)
        starDelay = pendingDelay
      pendingDelay = null
    }
    var i = 0
    val n = body.length
    while (i <= n) {
      // One line per iteration (tolerates \r\n via trim).
      var j = body.indexOf('\n', i)
      if (j < 0) j = n
      var line = body.substring(i, math.min(j, n))
      val hash = line.indexOf('#')
      if (hash >= 0) line = line.substring(0, hash)
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        if (field == "user-agent") {
          if (!groupOpen || inRules) {
            // New group starts; the previous group's agent set is
            // final, so its buffered delay can bucket now.
            flushPendingDelay()
            groupExact = false; groupStar = false
            groupOpen = true; inRules = false
          }
          val ua = value.toLowerCase(java.util.Locale.ROOT)
          if (ua == agent) { groupExact = true; sawExactGroup = true }
          else if (ua == "*") groupStar = true
        } else if (field == "allow" || field == "disallow") {
          if (groupOpen) {
            inRules = true
            // First rule line: the user-agent run is complete, the
            // group's buckets are final — flush any mid-run delay.
            flushPendingDelay()
            if (value.nonEmpty) {
              val rule = (field == "allow", value)
              if (groupExact) exact.add(rule)
              else if (groupStar) star.add(rule)
            }
          }
        } else if (field == "crawl-delay") {
          // Nonstandard but ubiquitous; group-scoped like rules, and
          // like other non-rule fields it neither ends the user-agent
          // run nor closes the group. First parseable value per
          // bucket wins (document order); malformed values ignored.
          // Inside the UA run the delay is BUFFERED (agent set not
          // final yet — ADVICE r13); after it, bucketed directly.
          if (groupOpen && value.nonEmpty) {
            try {
              val d = java.lang.Double.parseDouble(value)
              if (!inRules) {
                if (pendingDelay == null) pendingDelay = d
              } else if (groupExact && exactDelay == null) exactDelay = d
              else if (groupStar && !groupExact && starDelay == null)
                starDelay = d
            } catch { case _: NumberFormatException => () }
          }
        }
        // Other fields (sitemap, …): ignored, and they neither end
        // the user-agent run nor close the group.
      }
      i = j + 1
    }
    // EOF ends the last group's run (a rule-less trailing group can
    // still carry a buffered delay).
    flushPendingDelay()
    val picked = if (sawExactGroup) exact else star
    val out = new Array[Any](picked.size())
    var k = 0
    while (k < picked.size()) {
      val (allow, pattern) = picked.get(k)
      val row = new GenericInternalRow(2)
      row.setBoolean(0, allow)
      row.update(1, UTF8String.fromString(pattern))
      out(k) = row
      k += 1
    }
    (new GenericArrayData(out),
      if (sawExactGroup) exactDelay else starDelay)
  }

  /** See [[RobotsDecision]]. Static for codegen. */
  def decide(rules: ArrayData, pathU: UTF8String): GenericInternalRow = {
    val path = pathU.toString
    val n = rules.numElements()
    var bestLen = -1
    var bestAllow = true
    var bestPattern: UTF8String = null
    var i = 0
    while (i < n) {
      val row = rules.getStruct(i, 2)
      val patternU = row.getUTF8String(1)
      val pattern = patternU.toString
      if (matches(pattern, path)) {
        val allow = row.getBoolean(0)
        // RFC 9309 counts pattern length in OCTETS, not UTF-16 chars.
        val plen = patternU.numBytes
        if (plen > bestLen || (plen == bestLen && allow && !bestAllow)) {
          bestLen = plen
          bestAllow = allow
          bestPattern = patternU
        }
      }
      i += 1
    }
    val out = new GenericInternalRow(2)
    out.setBoolean(0, bestAllow)
    out.update(1, if (bestPattern == null) null else bestPattern.clone())
    out
  }

  /** RFC 9309 path-pattern match: prefix semantics, `*` = any run,
    * trailing `$` anchors at path end (elsewhere literal). */
  def matches(pattern: String, path: String): Boolean = {
    var pat = pattern
    var anchored = false
    if (pat.nonEmpty && pat.charAt(pat.length - 1) == '$') {
      anchored = true
      pat = pat.substring(0, pat.length - 1)
    }
    val star0 = pat.indexOf('*')
    if (star0 < 0)
      return if (anchored) path == pat else path.startsWith(pat)
    // Greedy glob walk: leading literal must be a prefix, middle
    // literals found left-to-right, final literal end-anchored when $.
    val segs = pat.split("\\*", -1)
    if (!path.startsWith(segs(0))) return false
    var pos = segs(0).length
    var k = 1
    while (k < segs.length - 1) {
      val idx = path.indexOf(segs(k), pos)
      if (idx < 0) return false
      pos = idx + segs(k).length
      k += 1
    }
    val last = segs(segs.length - 1)
    if (anchored) {
      val start = path.length - last.length
      start >= pos && path.endsWith(last)
    } else path.indexOf(last, pos) >= 0
  }
}

object RobotsColumns {
  def robotsRules(body: Column, agent: Column): Column =
    ExpressionUtils.column(RobotsRules(
      ExpressionUtils.expression(body), ExpressionUtils.expression(agent)))
  def robotsCrawlDelay(body: Column, agent: Column): Column =
    ExpressionUtils.column(RobotsCrawlDelay(
      ExpressionUtils.expression(body), ExpressionUtils.expression(agent)))
  def robotsDecision(rules: Column, path: Column): Column =
    ExpressionUtils.column(RobotsDecision(
      ExpressionUtils.expression(rules), ExpressionUtils.expression(path)))
}

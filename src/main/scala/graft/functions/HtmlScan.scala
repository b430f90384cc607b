// Hosted alongside HtmlBlocks/HtmlLinks (same package) — pure string
// scanning, no Spark dependency of its own.
package org.apache.spark.sql.graft

/** Shared low-level HTML tag scanning used by [[HtmlBlocks]] and
  * [[HtmlLinks]] (one copy, per the r12 dedup of `HtmlEntities`).
  *
  * Reference behavior: the reference engine has no HTML layer — this
  * follows the WHATWG HTML5 tokenizer's attribute grammar for the two
  * things our extractors need: where a tag ends, and whether it
  * self-closes.
  */
object HtmlScan {

  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  /** Index just past a tag's closing '>', honoring quoted attribute
    * values; EOF-tolerant (returns `n`). Also reports whether the tag
    * self-closes (trailing '/'), which matters for skip tags — an
    * `<iframe/>` has no content to skip, and treating it as open
    * would discard everything to EOF.
    *
    * The trailing '/' only counts as self-closing when it is NOT part
    * of an unquoted attribute value: per the HTML5 unquoted-value
    * grammar, in `<iframe src=/ads/>` the final '/' belongs to the
    * value `/ads/` and the tag is OPEN, while in `<br/>` or
    * `<iframe src=x />` the '/' is a standalone solidus and the tag
    * self-closes (ADVICE r12 fix — the old scanner only looked at the
    * last non-whitespace char).
    */
  def tagEnd(s: String, n: Int, from: Int): (Int, Boolean) = {
    var i = from
    var quote = 0.toChar
    var lastNonWs = 0.toChar
    // True when `lastNonWs` was consumed inside an unquoted attribute
    // value (so a '/' there is value content, not a self-close mark).
    var lastNonWsInValue = false
    var afterEq = false    // saw '=', value may start (ws allowed between)
    var inUnquoted = false // inside an unquoted attribute value
    while (i < n) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == quote) quote = 0
      } else if (inUnquoted) {
        if (c == '>') return (i + 1, lastNonWs == '/' && !lastNonWsInValue)
        if (isAsciiWs(c)) inUnquoted = false
      } else if (afterEq) {
        if (c == '>') return (i + 1, lastNonWs == '/' && !lastNonWsInValue)
        if (c == '"' || c == '\'') { quote = c; afterEq = false }
        else if (!isAsciiWs(c)) { inUnquoted = true; afterEq = false }
      } else {
        if (c == '>') return (i + 1, lastNonWs == '/' && !lastNonWsInValue)
        if (c == '"' || c == '\'') quote = c
        else if (c == '=') afterEq = true
      }
      if (!isAsciiWs(c)) {
        lastNonWs = c
        lastNonWsInValue = inUnquoted || quote != 0
      }
      i += 1
    }
    (n, false)
  }
}

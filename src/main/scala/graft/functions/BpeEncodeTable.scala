// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Prepared merge-rank table for [[BpeEncode]]. Keys are (left,
  * right) symbol tuples — collision-proof by construction, no
  * separator-aliasing corner cases on texts that contain exotic
  * codepoints. First occurrence of a duplicate pair wins, matching
  * rank semantics. */
final class BpeTable(val ranks: java.util.HashMap[(String, String), Integer])
    extends Serializable {

  /** Per-thread word→tokens memo. Bounded: wholesale-cleared at
    * [[BpeTable.CacheCap]] entries (zipfian traffic refills the hot
    * head immediately); words longer than [[BpeTable.CacheMaxWordLen]]
    * chars are never cached (pathological runs would evict the useful
    * head). */
  @transient lazy val cache:
      ThreadLocal[java.util.HashMap[String, Array[UTF8String]]] =
    ThreadLocal.withInitial(() =>
      new java.util.HashMap[String, Array[UTF8String]]())
}

/** The GPT-2 byte↔unicode alphabet: every byte value maps to a
  * printable BMP char (printable latin bytes map to themselves;
  * control/whitespace/high bytes shift to 256+n in byte order — so
  * space ↦ 'Ġ' U+0120, newline ↦ 'Ċ' U+010A, exactly the reference
  * `bytes_to_unicode`). Byte-level BPE runs the SAME merge loop over
  * these mapped 1-char symbols, which makes any byte sequence
  * losslessly representable and merge sides always valid strings. */
object BpeBytes {
  val byteToChar: Array[Char] = {
    val out = new Array[Char](256)
    val printable = (('!' to '~') ++ ('¡' to '¬') ++
      ('®' to 'ÿ')).map(_.toInt).toSet
    var shift = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) out(b) = b.toChar
      else { out(b) = (256 + shift).toChar; shift += 1 }
      b += 1
    }
    out
  }
  /** Inverse map, indexed by char code (all mapped chars < 0x200). */
  val charToByte: Array[Int] = {
    val out = Array.fill(0x200)(-1)
    var b = 0
    while (b < 256) { out(byteToChar(b).toInt) = b; b += 1 }
    out
  }

  def mapWord(bytes: Array[Byte], from: Int, until: Int): String = {
    val chars = new Array[Char](until - from)
    var i = from
    while (i < until) { chars(i - from) = byteToChar(bytes(i) & 0xff); i += 1 }
    new String(chars)
  }
}

object BpeTable {
  final val CacheCap = 65536
  final val CacheMaxWordLen = 64

  def build(merges: Seq[(String, String)]): BpeTable = {
    val ranks = new java.util.HashMap[(String, String), Integer]()
    merges.zipWithIndex.foreach { case (p, i) =>
      ranks.putIfAbsent(p, Integer.valueOf(i))
    }
    new BpeTable(ranks)
  }

  /** See [[BpeEncode]]. Static for codegen. `byteLevel` switches the
    * per-pre-token symbol alphabet from codepoints to GPT-2-mapped
    * bytes ([[BpeBytes]]); the pre-token boundaries are identical. */
  def encode(s: UTF8String, t: BpeTable, byteLevel: Boolean): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[AnyRef](Math.max(8, n / 4))
    var i = 0
    while (i < n) {
      val end = BpeTokenCountImpl.tokenEnd(bytes, i)
      val word =
        if (byteLevel) BpeBytes.mapWord(bytes, i, end)
        else new String(bytes, i, end - i, java.nio.charset.StandardCharsets.UTF_8)
      val toks = encodeWordCached(word, t)
      var j = 0
      while (j < toks.length) { out.add(toks(j)); j += 1 }
      i = end
    }
    new GenericArrayData(out.toArray)
  }

  /** Inverse of byte-level [[encode]]: concatenate the tokens' mapped
    * chars and translate each back to its byte. Unknown chars (not in
    * the byte alphabet) — or a null array element, reachable from the
    * SQL-registered `bpe_byte_decode` whose input type carries
    * containsNull=true — make the input invalid → null, matching the
    * encoder's contract that tokens only ever contain mapped chars. */
  def decodeBytes(tokens: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    var total = 0
    var k = 0
    while (k < tokens.numElements()) {
      if (tokens.isNullAt(k)) return null
      total += tokens.getUTF8String(k).toString.length; k += 1
    }
    val bytes = new Array[Byte](total)
    var w = 0
    k = 0
    while (k < tokens.numElements()) {
      val t = tokens.getUTF8String(k).toString
      var c = 0
      while (c < t.length) {
        val code = t.charAt(c).toInt
        if (code >= BpeBytes.charToByte.length || BpeBytes.charToByte(code) < 0)
          return null
        bytes(w) = BpeBytes.charToByte(code).toByte
        w += 1; c += 1
      }
      k += 1
    }
    UTF8String.fromBytes(bytes)
  }

  private def encodeWordCached(word: String, t: BpeTable): Array[UTF8String] = {
    val cacheable = word.length <= CacheMaxWordLen
    if (cacheable) {
      val c = t.cache.get()
      val hit = c.get(word)
      if (hit != null) return hit
      val toks = encodeWord(word, t.ranks)
      if (c.size() >= CacheCap) c.clear()
      c.put(word, toks)
      toks
    } else encodeWord(word, t.ranks)
  }

  /** The greedy merge loop over one pre-token. */
  def encodeWord(
      word: String,
      ranks: java.util.HashMap[(String, String), Integer]): Array[UTF8String] = {
    // Split into codepoint symbols.
    var syms = new java.util.ArrayList[String](word.length)
    var ci = 0
    while (ci < word.length) {
      val cc = Character.charCount(word.codePointAt(ci))
      syms.add(word.substring(ci, ci + cc))
      ci += cc
    }
    if (syms.size > 1 && !ranks.isEmpty) {
      var done = false
      while (!done) {
        // Lowest-rank adjacent pair present in the symbol sequence.
        var bestRank = Int.MaxValue
        var bl: String = null
        var br: String = null
        var k = 0
        while (k < syms.size - 1) {
          val r = ranks.get((syms.get(k), syms.get(k + 1)))
          if (r != null && r.intValue() < bestRank) {
            bestRank = r.intValue(); bl = syms.get(k); br = syms.get(k + 1)
          }
          k += 1
        }
        if (bl == null) done = true
        else {
          // Merge ALL leftmost non-overlapping occurrences of (bl, br).
          val merged = bl + br
          val next = new java.util.ArrayList[String](syms.size)
          var j = 0
          while (j < syms.size) {
            if (j < syms.size - 1 && syms.get(j) == bl && syms.get(j + 1) == br) {
              next.add(merged); j += 2
            } else { next.add(syms.get(j)); j += 1 }
          }
          syms = next
        }
      }
    }
    val out = new Array[UTF8String](syms.size)
    var j = 0
    while (j < out.length) { out(j) = UTF8String.fromString(syms.get(j)); j += 1 }
    out
  }
}

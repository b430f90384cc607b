// Hosted under org.apache.spark.sql for the same reason as VecDot:
// the private[sql] Column/type helpers of the public Spark jars.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a document in one native pass:
  * `trim → lowercase → split(\s+) → join n-grams with ' '` — the exact
  * routines behind the declarative
  * `TextOps.shingles(TextOps.tokens(text), n)` spelling
  * (UTF8String.trim/toLowerCase/splitSQL/concatWs are what Spark's
  * trim/lower/split/array_join expressions call), so outputs are
  * byte-identical and the DuckDB oracles keep matching.
  *
  * The declarative spelling evaluates a `transform` lambda per shingle
  * position (slice + array_join allocations inside an interpreted
  * higher-order function) — at ~300 positions per document that made
  * shingling, not joining, the dominant cost of the whole n-gram dedup
  * family. Documents shorter than n tokens shingle to an empty array,
  * matching the declarative guard. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesImpl.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordShinglesImpl.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** The shared tokenize of [[WordShingles]]/[[GramStats]] exposed as its
  * own column — `trim → lowercase → split(\s+)`, the exact routines of
  * `TextOps.tokens` — so a pipeline can materialize ONE token index
  * and shingle it at several n ([[ArrayShingles]]) instead of paying
  * the tokenize per branch (Curation.pipeline's quality/dedup/
  * decontamination branches tokenized the same corpus three times). */
case class WordTokens(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_tokens"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesImpl.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordShinglesImpl.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression): WordTokens =
    copy(child = newChild)
}

/** [[WordShingles]] over a PRE-TOKENIZED array (a [[WordTokens]]
  * column): same n-gram join, zero re-tokenize. Byte-identical to
  * `word_shingles(text, n)` when fed `word_tokens(text)` (spec). */
case class ArrayShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "array_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesImpl.shinglesFromTokens(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordShinglesImpl.shinglesFromTokens($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ArrayShingles =
    copy(child = newChild)
}

/** 64-bit HASHES of the word n-gram shingles — `xxhash64(shingle)`
  * (seed 42, Spark's builtin) for each gram of [[WordShingles]], in
  * the same single native pass. Bit-identical to the declarative twin
  * `transform(word_shingles(text, n), s -> xxhash64(s))` (spec), but
  * the gram STRINGS die inside the expression: downstream joins,
  * shuffles, and caches carry 8-byte longs instead of ~n-word strings
  * — the working-set cut that pays for the whole n-gram dedup family
  * (the inverted index is the largest intermediate those pipelines
  * materialize). A 64-bit collision can merge two distinct grams
  * (~G²/2⁶⁴ for G distinct grams — negligible below ~10⁹ grams, the
  * same trade [[MinhashSignature]] already makes); callers that need
  * literal grams (e.g. to report WHICH gram leaked) use the string
  * variant. */
case class WordShingleHashes(child: Expression, n: Int, seed: Long = 42L)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesImpl.shingleHashes(input.asInstanceOf[UTF8String], n, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordShinglesImpl.shingleHashes($c, $n, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

/** [[WordShingleHashes]] over a pre-tokenized array ([[WordTokens]]
  * column): byte-identical hashes, zero re-tokenize. */
case class ArrayShingleHashes(child: Expression, n: Int, seed: Long = 42L)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "array_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesImpl.shingleHashesFromTokens(input.asInstanceOf[ArrayData], n, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordShinglesImpl.shingleHashesFromTokens($c, $n, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): ArrayShingleHashes =
    copy(child = newChild)
}

/** TWO independently-seeded [[WordShingleHashes]] runs in ONE native
  * pass: `array<struct<h1: long, h2: long>>`, where `h1`/`h2` are
  * xxhash64 of the same gram bytes under `seed1`/`seed2`. This is the
  * 128-bit key tier of the n-gram dedup family
  * ([[graft.ops.Dedup]]'s `hashBits = 128`): the naive spelling
  * (`arrays_zip` of two word_shingle_hashes calls) tokenizes and
  * re-builds every gram string TWICE per document — doubling exactly
  * the CPU-dense shingling stage the caller repartitioned to spread.
  * Here the tokenize and gram-concat happen once; only the (cheap)
  * hash runs twice. Bit-identical to the arrays_zip twin (spec). */
case class WordShingleHashPairs(child: Expression, n: Int,
    seed1: Long = 42L, seed2: Long = 1042L)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingle_hash_pairs"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesImpl.shingleHashPairs(input.asInstanceOf[UTF8String], n, seed1, seed2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordShinglesImpl.shingleHashPairs($c, $n, ${seed1}L, ${seed2}L)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashPairs =
    copy(child = newChild)
}

/** CODEPOINT n-gram shingles of a document in one native pass:
  * `trim → lowercase → collapse \s+ runs to ' ' → slide an n-codepoint
  * window` — the character-level twin of [[WordShingles]] for
  * unsegmented scripts (CJK and friends), where whitespace
  * tokenization yields degenerate sentence-length "words" and the
  * word-gram dedup family goes blind (VERDICT r10 "What's missing
  * #3").
  *
  * The normalized form is byte-identical to the declarative
  * `TextOps.normalized` spelling (`regexp_replace(lower(trim(text)),
  * "\\s+", " ")`): UTF8String.trim/toLowerCase are what Spark's
  * trim/lower call, and the collapse replaces runs of Java-regex `\s`
  * (= `[ \t\n\x0B\f\r]`, all single-byte and never part of a
  * multibyte UTF-8 sequence, so the byte scan is safe). Grams are the
  * exact strings of `substring(norm, i, n)` — Spark's substring counts
  * codepoints, and so does the offset walk here (spec-pinned byte
  * identity). Fewer than n codepoints → empty array. */
case class CharShingles(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_shingles"

  override protected def nullSafeEval(input: Any): Any =
    CharShinglesImpl.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CharShinglesImpl.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

/** 64-bit HASHES of the codepoint n-gram shingles — `xxhash64(gram)`
  * for each gram of [[CharShingles]], hashed STRAIGHT from the
  * normalized byte buffer (no gram string is ever allocated) — the
  * char-mode key tier of the n-gram dedup family, same collision
  * budget as [[WordShingleHashes]]. */
case class CharShingleHashes(child: Expression, n: Int, seed: Long = 42L)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    CharShinglesImpl.shingleHashes(input.asInstanceOf[UTF8String], n, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CharShinglesImpl.shingleHashes($c, $n, ${seed}L)")

  override protected def withNewChildInternal(newChild: Expression): CharShingleHashes =
    copy(child = newChild)
}

/** TWO independently-seeded [[CharShingleHashes]] runs in ONE native
  * pass (`array<struct<h1, h2>>`) — the 128-bit char-mode key tier,
  * normalizing and walking the codepoint offsets once. */
case class CharShingleHashPairs(child: Expression, n: Int,
    seed1: Long = 42L, seed2: Long = 1042L)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_shingle_hash_pairs"

  override protected def nullSafeEval(input: Any): Any =
    CharShinglesImpl.shingleHashPairs(input.asInstanceOf[UTF8String], n, seed1, seed2)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.CharShinglesImpl.shingleHashPairs($c, $n, ${seed1}L, ${seed2}L)")

  override protected def withNewChildInternal(newChild: Expression): CharShingleHashPairs =
    copy(child = newChild)
}

object CharShinglesImpl {
  // Java regex \s — the exact set regexp_replace(…, "\\s+", " ")
  // collapses. All ASCII: never a continuation byte of a multibyte
  // UTF-8 sequence.
  private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

  /** trim → lowercase → collapse \s+ runs to single 0x20, as bytes. */
  private def normalize(s: UTF8String): Array[Byte] = {
    val t = s.trim().toLowerCase()
    val in = t.getBytes
    val out = new Array[Byte](in.length)
    var i = 0
    var o = 0
    var inRun = false
    while (i < in.length) {
      if (isWs(in(i))) {
        if (!inRun) { out(o) = 0x20; o += 1; inRun = true }
      } else {
        out(o) = in(i); o += 1; inRun = false
      }
      i += 1
    }
    if (o == in.length) out else java.util.Arrays.copyOf(out, o)
  }

  /** Byte offsets of each codepoint start, plus the end offset —
    * offsets(i) .. offsets(i+n) brackets the i-th n-codepoint gram. */
  private def cpOffsets(bytes: Array[Byte]): Array[Int] = {
    var cps = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) cps += 1
      i += 1
    }
    val off = new Array[Int](cps + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { off(c) = i; c += 1 }
      i += 1
    }
    off(cps) = bytes.length
    off
  }

  /** See [[CharShingles]]. Static for codegen. */
  def shingles(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = normalize(s)
    val off = cpOffsets(bytes)
    val cps = off.length - 1
    if (cps < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](cps - n + 1)
    var i = 0
    while (i < out.length) {
      out(i) = UTF8String.fromBytes(bytes, off(i), off(i + n) - off(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** See [[CharShingleHashes]]. Static for codegen. Hashes straight
    * from the normalized buffer (builtin xxhash64 = XXH64 seed 42 over
    * the gram bytes — identical to hashing the [[shingles]] strings). */
  def shingleHashes(s: UTF8String, n: Int, seed: Long): GenericArrayData = {
    val bytes = normalize(s)
    val off = cpOffsets(bytes)
    val cps = off.length - 1
    if (cps < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](cps - n + 1)
    var i = 0
    while (i < out.length) {
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off(i),
        off(i + n) - off(i), seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** See [[CharShingleHashPairs]]. Static for codegen. */
  def shingleHashPairs(s: UTF8String, n: Int, seed1: Long,
      seed2: Long): GenericArrayData = {
    val bytes = normalize(s)
    val off = cpOffsets(bytes)
    val cps = off.length - 1
    if (cps < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](cps - n + 1)
    var i = 0
    while (i < out.length) {
      val base = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off(i)
      val len = off(i + n) - off(i)
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes, base, len, seed1),
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(bytes, base, len, seed2))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-document novelty counts against a plan-shipped reference gram
  * set, in ONE native pass: `struct<n_grams: long, n_new: long>` where
  * `n_grams` is the count of the document's DISTINCT word `n`-grams
  * and `n_new` the count of those absent from `set` — the probe side
  * of `TextAnalysis.noveltyAgainstIndex` when the reference index fits
  * the broadcast gate (the `TrigramLmScore` deployment pattern, for
  * the INGEST-TIME use: a stateless projection a structured stream
  * can run per arriving document, batch ≡ stream by construction).
  *
  * Parity with the declarative spelling (spec-pinned): grams are the
  * exact strings of `array_distinct(word_shingles(text, n))` — same
  * trim/lowercase/split/concat routines, same distinctness (UTF8String
  * byte equality). The set is a reference object in the serialized
  * plan, index-bounded by the caller's gate, shipped once per executor. */
case class GramSetNovelty(child: Expression, n: Int, set: GramSet)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_new", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_set_novelty"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesImpl.noveltyProbe(input.asInstanceOf[UTF8String], n, set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramSet", set, classOf[GramSet].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.WordShinglesImpl.noveltyProbe($c, $n, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): GramSetNovelty =
    copy(child = newChild)
}

/** The broadcast reference vocabulary: the distinct grams of a corpus
  * snapshot, UTF8String members so probes stay in Spark's native
  * string representation (the `TrigramLmTable` convention). */
final class GramSet(val grams: java.util.HashSet[UTF8String]) extends Serializable

object GramSet {
  def build(entries: Iterator[UTF8String]): GramSet = {
    val s = new java.util.HashSet[UTF8String]()
    entries.foreach(s.add)
    new GramSet(s)
  }
}

object WordShinglesImpl {
  private val Whitespace = UTF8String.fromString("\\s+")
  private val Space = UTF8String.fromString(" ")

  private def tokenize(s: UTF8String): Array[UTF8String] =
    s.trim().toLowerCase().split(Whitespace, -1)

  /** See [[WordTokens]]. Static for codegen. (A UTF8String[] IS an
    * Object[] to the JVM; the cast avoids a defensive copy.) */
  def tokens(s: UTF8String): GenericArrayData =
    new GenericArrayData(tokenize(s).asInstanceOf[Array[AnyRef]])

  /** See [[WordShingles]]. Static so generated code can call it
    * without captured references. */
  def shingles(s: UTF8String, n: Int): GenericArrayData =
    shinglesOf(tokenize(s), n)

  /** See [[ArrayShingles]]. Static for codegen. */
  def shinglesFromTokens(arr: ArrayData, n: Int): GenericArrayData = {
    val len = arr.numElements()
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    shinglesOf(toks, n)
  }

  private def shinglesOf(toks: Array[UTF8String], n: Int): GenericArrayData = {
    if (toks.length < n)
      return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      val slice = new Array[UTF8String](n)
      System.arraycopy(toks, i, slice, 0, n)
      out(i) = UTF8String.concatWs(Space, slice: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** See [[WordShingleHashes]]. Static for codegen. */
  def shingleHashes(s: UTF8String, n: Int, seed: Long): GenericArrayData =
    shingleHashesOf(tokenize(s), n, seed)

  /** See [[GramSetNovelty]]. Static for codegen. One tokenize + one
    * gram-concat pass; per-doc distinctness via a local set (the
    * `array_distinct` the declarative spelling pays as an extra array
    * materialization). Sub-`n`-token docs emit (0, 0) — the caller
    * maps that to a null novelty ratio, the noveltyScores contract. */
  def noveltyProbe(s: UTF8String, n: Int, set: GramSet): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = tokenize(s)
    var nGrams = 0L
    var nNew = 0L
    if (toks.length >= n) {
      val seen = new java.util.HashSet[UTF8String]()
      val slice = new Array[UTF8String](n)
      var i = 0
      val last = toks.length - n
      while (i <= last) {
        System.arraycopy(toks, i, slice, 0, n)
        val g = UTF8String.concatWs(Space, slice: _*)
        if (seen.add(g)) {
          nGrams += 1L
          if (!set.grams.contains(g)) nNew += 1L
        }
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(nGrams, nNew)
  }

  /** See [[WordShingleHashPairs]]. Static for codegen: one tokenize +
    * one gram-concat pass, two XXH64 runs per gram. */
  def shingleHashPairs(s: UTF8String, n: Int, seed1: Long,
      seed2: Long): GenericArrayData = {
    val toks = tokenize(s)
    if (toks.length < n)
      return new GenericArrayData(Array.empty[Any])
    val out = new Array[AnyRef](toks.length - n + 1)
    val slice = new Array[UTF8String](n)
    var i = 0
    while (i < out.length) {
      System.arraycopy(toks, i, slice, 0, n)
      val g = UTF8String.concatWs(Space, slice: _*)
      val h1 = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, seed1)
      val h2 = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, seed2)
      out(i) = org.apache.spark.sql.catalyst.InternalRow(h1, h2)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** See [[ArrayShingleHashes]]. Static for codegen. */
  def shingleHashesFromTokens(arr: ArrayData, n: Int, seed: Long): GenericArrayData = {
    val len = arr.numElements()
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i); i += 1 }
    shingleHashesOf(toks, n, seed)
  }

  // The gram string is built exactly as shinglesOf does and hashed with
  // the builtin xxhash64's algorithm+seed (XXH64, 42) — this is what
  // keeps the declarative `transform(..., xxhash64)` twin bit-identical.
  private def shingleHashesOf(toks: Array[UTF8String], n: Int,
      seed: Long): GenericArrayData = {
    if (toks.length < n)
      return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](toks.length - n + 1)
    val slice = new Array[UTF8String](n)
    var i = 0
    while (i < out.length) {
      System.arraycopy(toks, i, slice, 0, n)
      val g = UTF8String.concatWs(Space, slice: _*)
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, seed)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object WordShinglesColumns {
  def wordShingles(text: Column, n: Int): Column =
    ExpressionUtils.column(WordShingles(ExpressionUtils.expression(text), n))
  def wordTokens(text: Column): Column =
    ExpressionUtils.column(WordTokens(ExpressionUtils.expression(text)))
  def arrayShingles(tokens: Column, n: Int): Column =
    ExpressionUtils.column(ArrayShingles(ExpressionUtils.expression(tokens), n))
  def wordShingleHashes(text: Column, n: Int, seed: Long = 42L): Column =
    ExpressionUtils.column(WordShingleHashes(ExpressionUtils.expression(text), n, seed))
  def wordShingleHashPairs(text: Column, n: Int, seed1: Long = 42L,
      seed2: Long = 1042L): Column =
    ExpressionUtils.column(WordShingleHashPairs(
      ExpressionUtils.expression(text), n, seed1, seed2))
  def gramSetNovelty(text: Column, n: Int, set: GramSet): Column =
    ExpressionUtils.column(GramSetNovelty(
      ExpressionUtils.expression(text), n, set))
  def arrayShingleHashes(tokens: Column, n: Int, seed: Long = 42L): Column =
    ExpressionUtils.column(ArrayShingleHashes(ExpressionUtils.expression(tokens), n, seed))
  def charShingles(text: Column, n: Int): Column =
    ExpressionUtils.column(CharShingles(ExpressionUtils.expression(text), n))
  def charShingleHashes(text: Column, n: Int, seed: Long = 42L): Column =
    ExpressionUtils.column(CharShingleHashes(ExpressionUtils.expression(text), n, seed))
  def charShingleHashPairs(text: Column, n: Int, seed1: Long = 42L,
      seed2: Long = 1042L): Column =
    ExpressionUtils.column(CharShingleHashPairs(
      ExpressionUtils.expression(text), n, seed1, seed2))
}

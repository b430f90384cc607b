package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String

/** Property laws for the char-shingle native pass
  * ([[org.apache.spark.sql.graft.CharShinglesImpl]]) — the one new
  * expression family doing raw byte-offset walking over arbitrary
  * Unicode, where an off-by-one on a multibyte boundary silently
  * corrupts grams. On ANY generated string (ASCII words, every
  * Java-regex `\s` whitespace char, Latin accents, CJK, astral-plane
  * codepoints) the native output must equal a plain-JVM reference
  * built from String codepoint arithmetic: trim ASCII spaces (the SQL
  * `trim` contract — ONLY 0x20), lowercase, collapse `\s+` runs to
  * one space, then slide an n-codepoint window. Hashes must be
  * exactly xxhash64 (XXH64 seed 42) of each gram's UTF-8 bytes.
  * (The Spark-side byte-identity against the declarative
  * substring spelling is pinned in OpsSpec; these laws cover the
  * algorithm without a session, at ScalaCheck volume.) */
object CharShingleLawsSpec extends Properties("CharShingleLaws") {

  private val atoms: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.oneOf(" ", "\t", "\n", "\u000B", "\f", "\r", "  ", " \t\r\n"),
    Gen.oneOf("é", "À", "ü", "ß", "Œ"),
    Gen.oneOf("深", "度", "学", "習", "の", "東", "京"),
    Gen.oneOf("𝄞", "😀", "𝕊"), // astral plane
    Gen.const(""))

  private val textGen: Gen[String] =
    Gen.listOf(atoms).map(_.mkString)

  private def refNormalize(s: String): String = {
    // SQL trim: ASCII space only (UTF8String.trim), then lowercase,
    // then Java-regex \s+ → one space.
    var a = s
    while (a.startsWith(" ")) a = a.substring(1)
    while (a.endsWith(" ")) a = a.substring(0, a.length - 1)
    a.toLowerCase.replaceAll("\\s+", " ")
  }

  private def refShingles(s: String, n: Int): Seq[String] = {
    val norm = refNormalize(s)
    val cps = norm.codePoints().toArray
    if (cps.length < n) Seq.empty
    else (0 to cps.length - n).map(i =>
      new String(cps, i, n))
  }

  private def nativeShingles(s: String, n: Int): Seq[String] = {
    val arr = org.apache.spark.sql.graft.CharShinglesImpl
      .shingles(UTF8String.fromString(s), n)
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  property("native char_shingles equals the codepoint-arithmetic reference") =
    forAll(textGen, Gen.choose(1, 6)) { (s, n) =>
      nativeShingles(s, n) == refShingles(s, n)
    }

  property("native hashes are xxhash64(seed 42) of each gram's UTF-8 bytes") =
    forAll(textGen, Gen.choose(1, 6)) { (s, n) =>
      val arr = org.apache.spark.sql.graft.CharShinglesImpl
        .shingleHashes(UTF8String.fromString(s), n, 42L)
      val got = (0 until arr.numElements()).map(arr.getLong)
      val want = refShingles(s, n).map { g =>
        val u = UTF8String.fromString(g)
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      }
      got == want
    }

  property("hash-pair runs equal two independent single-seed runs") =
    forAll(textGen, Gen.choose(1, 6)) { (s, n) =>
      val u = UTF8String.fromString(s)
      val pairs = org.apache.spark.sql.graft.CharShinglesImpl
        .shingleHashPairs(u, n, 42L, 1042L)
      val h1 = org.apache.spark.sql.graft.CharShinglesImpl
        .shingleHashes(u, n, 42L)
      val h2 = org.apache.spark.sql.graft.CharShinglesImpl
        .shingleHashes(u, n, 1042L)
      (0 until pairs.numElements()).forall { i =>
        val row = pairs.getStruct(i, 2)
        row.getLong(0) == h1.getLong(i) && row.getLong(1) == h2.getLong(i)
      }
    }
}

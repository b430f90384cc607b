package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.{HtmlBlocksImpl, PslRules}

/** Property laws for the round-12 front-door natives — the two new
  * expressions that walk RAW UNTRUSTED BYTES (crawl HTML, wild
  * hostnames), where the failure mode is a crash or hang on
  * adversarial input rather than a wrong number.
  *
  *  - [[HtmlBlocksImpl.blocks]] must terminate and uphold its output
  *    contract on ANY string assembled from tag fragments, entity
  *    shrapnel, quotes, and multibyte text — including unterminated
  *    comments/scripts/tags at EOF; and on tag-free text it must
  *    equal a plain-JVM whitespace-collapse reference.
  *  - [[PslRules.registrable]] must return label-aligned suffixes
  *    (or null) for any host over the fixture rules, keep IPv4
  *    literals as their own domain, and be a FIXED POINT on its own
  *    output (a registrable domain is its own registrable domain). */
object FrontDoorLawsSpec extends Properties("FrontDoorLaws") {

  // ---------------------------------------------------------------
  // html_blocks fuzz
  // ---------------------------------------------------------------

  private val htmlAtoms: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(5)),
    Gen.oneOf("<", ">", "</", "/>", "<div ", "<p>", "</p>", "<a href=\"x\">",
      "</a>", "<script>", "</script>", "<style>", "<!--", "-->",
      "<![CDATA[", "]]>", "<!DOCTYPE html>", "<?pi?>", "\"", "'", "="),
    Gen.oneOf("&", "&amp;", "&lt;", "&#65;", "&#x1F600;", "&bogus;", "&#zz;",
      "&nbsp;"),
    Gen.oneOf(" ", "\t", "\r\n", "\u000B", "\f"),
    Gen.oneOf("é", "深度", "😀", "𝄞"),
    Gen.const(""))

  private val htmlGen: Gen[String] = Gen.listOf(htmlAtoms).map(_.mkString)

  private def blockRows(html: String): Seq[(String, Int, Double)] = {
    val arr = HtmlBlocksImpl.blocks(UTF8String.fromString(html))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 3)
      (r.getUTF8String(0).toString, r.getInt(1), r.getDouble(2))
    }
  }

  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  property("html_blocks terminates and upholds the block contract on adversarial soup") =
    forAll(htmlGen) { html =>
      val blocks = blockRows(html)
      blocks.forall { case (text, words, ld) =>
        text.nonEmpty &&
          !text.startsWith(" ") && !text.endsWith(" ") &&
          !text.contains("  ") &&
          !text.exists(c => isAsciiWs(c) && c != ' ') &&
          words == text.count(_ == ' ') + 1 &&
          ld >= 0.0 && ld <= 1.0
      } &&
        // Entity decoding and whitespace collapse never GROW text.
        blocks.map(_._1.length).sum <= html.length
    }

  property("html_blocks on tag-free, entity-free text is one normalized block") =
    forAll(Gen.listOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(5)),
      Gen.oneOf(" ", "\t", "\r\n", "\f"),
      Gen.oneOf("é", "深度", "😀"))).map(_.mkString)) { text =>
      val ref = text.map(c => if (isAsciiWs(c)) ' ' else c)
        .replaceAll(" +", " ").trim
      val blocks = blockRows(text)
      if (ref.isEmpty) blocks.isEmpty
      else blocks == Seq((ref, ref.count(_ == ' ') + 1, 0.0))
    }

  // ---------------------------------------------------------------
  // PSL laws (fixture rules with wildcard + exception coverage)
  // ---------------------------------------------------------------

  private val rules: PslRules = PslRules.parse(
    """com
      |uk
      |co.uk
      |jp
      |ac.jp
      |*.ck
      |!www.ck
      |*.kobe.jp
      |!city.kobe.jp
      |io
      |github.io""".stripMargin)

  private val labelGen: Gen[String] = Gen.oneOf(
    "com", "uk", "co", "ck", "www", "kobe", "jp", "example", "foo",
    "a", "b", "github", "io", "city", "test", "ac", "123")

  private val hostGen: Gen[String] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, labelGen))
      .map(_.mkString("."))

  private def reg(host: String): Option[String] =
    Option(PslRules.registrable(UTF8String.fromString(host), rules))
      .map(_.toString)

  property("psl registrable is null or a label-aligned suffix of the host") =
    forAll(hostGen) { host =>
      reg(host) match {
        case None => true
        case Some(d) => host == d || host.endsWith("." + d)
      }
    }

  property("psl registrable is a fixed point of itself") =
    forAll(hostGen) { host =>
      reg(host).forall(d => reg(d).contains(d))
    }

  property("psl keeps all-numeric (IPv4) hosts as their own domain") =
    forAll(Gen.listOfN(4, Gen.choose(0, 255)).map(_.mkString("."))) { ip =>
      reg(ip).contains(ip)
    }
}

package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Extractor
import graft.extract.rtf.RtfExtractor
import graft.serialize.{EpubWriter, RtfWriter}

/** RTF and EPUB kernels: hand-authored fixtures, writer round-trips,
  * sniffing, degenerates. */
class RtfEpubSpec extends AnyFunSuite {

  private val paras = Vector(
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
    "kilo lima mike november oscar papa",
    "quebec romeo sierra tango uniform victor whiskey xray yankee zulu")

  test("hand-authored rtf: control words, escapes, hex, unicode, destinations") {
    val rtf = "{\\rtf1\\ansi{\\fonttbl{\\f0 X;}}{\\*\\junk discard me}" +
      "\\f0 one \\b two\\b0  three\\par braces \\{x\\} and \\\\slash" +
      "\\par caf\\'e9 \\u20013? done}"
    val got = RtfExtractor.extract(rtf.getBytes(StandardCharsets.ISO_8859_1))
    assert(got == "one two three\nbraces {x} and \\slash\ncafé 中 done")
  }

  test("rtf writer round-trip for every variant; sniffed as rtf") {
    for (v <- 0 until RtfWriter.numVariants) {
      val bytes = RtfWriter.generate(paras, v)
      assert(Extractor.sniffFormat(bytes) == "rtf", s"variant $v sniff")
      val r = Extractor.extractOne(
        graft.model.WebPage(s"u$v", new java.sql.Timestamp(0), bytes, "", "en"), 0)
      assert(r.success && r.format_from == "rtf", s"variant $v: $r")
      assert(r.text == paras.mkString("\n"),
        s"variant $v:\n--- got ---\n${r.text}\n--- want ---\n${paras.mkString("\n")}")
    }
  }

  test("rtf with non-latin text round-trips via hex/unicode escapes in EVERY variant") {
    val special = Vector("café déjà vu ünïcode", "with 中文 characters too")
    for (v <- 0 until RtfWriter.numVariants) {
      val got = RtfExtractor.extract(RtfWriter.generate(special, v))
      assert(got == special.mkString("\n"), s"variant $v: $got")
    }
  }

  // Chapter-length paragraphs (>16 words): a standalone two-short-paragraph
  // page sits ON the Boilerpipe decision boundary (leading <=16-word block
  // with no prev context classifies as boilerplate) — fixtures stay away
  // from thresholds per SURVEY §7.3.
  private val chapterParas = Vector(
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november oscar papa quebec romeo",
    "sierra tango uniform victor whiskey xray yankee zulu one two three four five six seven eight nine ten",
    "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty alpha beta gamma delta epsilon zeta eta theta")

  test("epub writer round-trip for every variant; kind refined to epub") {
    for (v <- 0 until EpubWriter.numVariants) {
      val paras = chapterParas
      val bytes = EpubWriter.generate(paras, v)
      assert(Extractor.sniffFormat(bytes) == "docx") // shared zip token
      val r = Extractor.extractOne(
        graft.model.WebPage(s"u$v", new java.sql.Timestamp(0), bytes, "", "en"), 0)
      assert(r.success && r.format_from == "epub", s"variant $v: $r")
      assert(r.text == paras.mkString("\n"),
        s"variant $v:\n--- got ---\n${r.text}\n--- want ---\n${paras.mkString("\n")}")
    }
  }

  test("epub numeric chapter order with >10 chapters") {
    val many = (1 to 12).map(i => s"chapter number $i body content words").toVector
    val r = Extractor.extractOne(graft.model.WebPage("u", new java.sql.Timestamp(0),
      EpubWriter.generate(many, 3), "", "en"), 0)
    assert(r.success && r.text == many.mkString("\n"))
  }

  test("hex escapes decode via windows-1252: 0x80-0x9F smart punctuation") {
    // \'93…\'94 are cp1252 double quotes, \'97 em-dash, \'80 euro — a
    // Latin-1 .toChar decode would produce C1 control characters here
    val rtf = "{\\rtf1\\ansi q \\'93quoted\\'94 \\'97 \\'80cost \\'e9}"
    val got = RtfExtractor.extract(rtf.getBytes(StandardCharsets.ISO_8859_1))
    assert(got == "q “quoted” — €cost é", got)
  }

  test("rtf writer emits cp1252 hex for smart punctuation in the hex variant") {
    val special = Vector("smart “quotes” and — dash €")
    val bytes = RtfWriter.generate(special, 2)
    val raw = new String(bytes, StandardCharsets.ISO_8859_1)
    assert(raw.contains("\\'93") && raw.contains("\\'97") && raw.contains("\\'80"), raw)
    assert(RtfExtractor.extract(bytes) == special.mkString("\n"))
  }

  test("degenerate rtf becomes a failure row") {
    val truncated = RtfWriter.generate(paras, 0).take(20).toArray
    val r = Extractor.extractOne(graft.model.WebPage("u", new java.sql.Timestamp(0),
      truncated, "", "en"), 0)
    // a truncated rtf still extracts best-effort (total function) OR fails
    // contained; either way never throws
    assert(r != null && (r.success || r.error.nonEmpty))
  }
}

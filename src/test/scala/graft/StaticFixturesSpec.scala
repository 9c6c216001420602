package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.html.HtmlExtractor
import graft.extract.pdf.PdfParser

/** Hand-authored fixtures with hand-derived goldens. The generative suites
  * prove extract(render(text)) == text, but a misunderstanding shared by
  * the fixture generator AND the parser would cancel out there; these pin
  * the semantics against nothing but this file. */
class StaticFixturesSpec extends AnyFunSuite {

  private def para(n: Int, tag: String = "p") = {
    val words = (0 until n).map(i => s"word$i").mkString(" ")
    (s"<$tag>$words</$tag>", words)
  }

  test("article text survives, nav/footer/sidebar boilerplate does not") {
    val (p1, w1) = para(30)
    val (p2, w2) = para(25)
    val html =
      s"""<!DOCTYPE html><html><head><title>t</title></head><body>
         |<nav><a href="/a">home</a> <a href="/b">news</a> <a href="/c">sport</a></nav>
         |<article>$p1$p2</article>
         |<div><a href="/x">related one</a> <a href="/y">related two</a> <a href="/z">related three</a></div>
         |<footer><p>copyright nobody all rights reserved</p></footer>
         |</body></html>""".stripMargin
    assert(HtmlExtractor.extractFromString(html) == s"$w1\n$w2")
  }

  test("named + numeric entities decode inside content") {
    val body = (0 until 20).map(i => s"tok$i").mkString(" ")
    val html = s"<html><body><article><p>caf&eacute; &amp; bar &#x4e2d;&#25991; $body</p></article></body></html>"
    assert(HtmlExtractor.extractFromString(html) == s"café & bar 中文 $body")
  }

  test("whitespace collapses to single spaces; script/comment content vanishes") {
    val words = (0 until 20).map(i => s"w$i")
    val spaced = words.grouped(4).map(_.mkString("\n\t ")).mkString("   ")
    val html = s"""<html><body><p>  $spaced  </p><script>var x = "<p>no</p>";</script><!-- <p>no</p> --></body></html>"""
    assert(HtmlExtractor.extractFromString(html) == words.mkString(" "))
  }

  test("iso-8859-1 bytes with meta charset decode correctly") {
    val body = (0 until 20).map(i => s"mot$i").mkString(" ")
    val html = s"""<html><head><meta charset="iso-8859-1"></head><body><p>café société $body</p></body></html>"""
    val bytes = html.getBytes(StandardCharsets.ISO_8859_1)
    assert(HtmlExtractor.extract(bytes) == s"café société $body")
  }

  test("utf-16le BOM wins over a lying meta charset") {
    val body = (0 until 20).map(i => s"tok$i").mkString(" ")
    val html = s"""<html><head><meta charset="utf-8"></head><body><p>naïve $body</p></body></html>"""
    val bytes = Array[Byte](0xff.toByte, 0xfe.toByte) ++ html.getBytes(StandardCharsets.UTF_16LE)
    assert(HtmlExtractor.extract(bytes) == s"naïve $body")
  }

  test("hand-written uncompressed PDF: same-y runs join, y-gap splits blocks") {
    // Two lines 14pt apart (same block, joined by ' '), then a 30pt gap
    // (new block). Raw (non-Flate) content stream, explicit /Length.
    val content =
      """BT
        |/F1 12 Tf
        |72 700 Td
        |(hello ) Tj
        |(world) Tj
        |0 -14 Td
        |(second line) Tj
        |0 -30 Td
        |(new block) Tj
        |ET""".stripMargin
    val pdf =
      s"""%PDF-1.4
         |1 0 obj << /Length ${content.length} >> stream
         |$content
         |endstream
         |endobj
         |%%EOF""".stripMargin
    val got = PdfParser.extract(pdf.getBytes(StandardCharsets.ISO_8859_1))
    assert(got == "hello world second line\nnew block", s"got: '$got'")
  }

  test("only-links page extracts empty; empty body extracts empty") {
    val links = s"""<html><body><p><a href="/a">one two three</a> <a href="/b">four five</a></p></body></html>"""
    assert(HtmlExtractor.extractFromString(links) == "")
    assert(HtmlExtractor.extractFromString("<html><body></body></html>") == "")
  }
}

package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.Extractor
import graft.fixtures.{Corpus, HtmlTemplates}
import graft.serialize.PdfWriter
import graft.extract.pdf.PdfParser

/** Golden round-trip without Spark: for every template × encoding × PDF
  * variant × a spread of document lengths, the corpus builder's payload must
  * extract back to the golden text byte-identically (BASELINE.json north_rule
  * correctness bar). doc_ids 0..599 cover all (template, encoding) and
  * (pdf variant) combinations of the deterministic routing in Corpus.
  */
class KernelRoundTripSpec extends AnyFunSuite {

  private val vocab = Array("the", "fast", "key", "order", "sort", "table", "scan", "merge",
    "part", "window", "small", "hash", "join", "batch", "stream", "spark", "group", "query",
    "row", "data", "slow", "filter", "customer", "line", "agg", "big", "dup", "vector", "a")

  private def wordsFor(id: Long, n: Int): String =
    (0 until n).map(k => vocab(((id * 31 + k * 7) % vocab.length).toInt)).mkString(" ")

  private def doc(id: Long, nWords: Int): Corpus.Doc = {
    val text = wordsFor(id, nWords)
    Corpus.Doc(id, text, "en", s"src${id % 20}", text.length.toLong)
  }

  test("extraction is byte-identical to golden across all templates, encodings, pdf variants, lengths") {
    var checked = 0
    for (id <- 0L until 600L) {
      // length sweep: 5..124 words — includes sub-threshold single blocks
      val n = 5 + ((id * 13) % 120).toInt
      val page = Corpus.buildPage(doc(id, n), skewHost = false)
      val r = Extractor.extractOne(page, 0)
      assert(r.success, s"doc $id failed: ${r.error}")
      val got = r.text.getBytes(StandardCharsets.UTF_8)
      val want = page.text.getBytes(StandardCharsets.UTF_8)
      assert(java.util.Arrays.equals(got, want),
        s"doc $id (${r.format_from}, n=$n) mismatch:\n--- got ---\n${r.text}\n--- want ---\n${page.text}")
      checked += 1
    }
    assert(checked == 600)
  }

  test("golden normalization invariant: replacing newlines with spaces recovers the source text") {
    for (id <- 0L until 100L) {
      val text = wordsFor(id, 5 + (id % 100).toInt)
      assert(HtmlTemplates.golden(text).replace('\n', ' ') == text)
    }
  }

  test("degenerate inputs are contained as failure or empty rows, never exceptions") {
    val cases = Seq(
      Array.emptyByteArray,
      "%PDF-1.4 truncated".getBytes(StandardCharsets.ISO_8859_1),
      Array.fill[Byte](64)(0x9c.toByte), // non-UTF8 garbage, no '<'
      "<html><body></body></html>".getBytes(StandardCharsets.UTF_8),
      "<html><body><a href='/'>only links</a></body></html>".getBytes(StandardCharsets.UTF_8))
    for ((bytes, i) <- cases.zipWithIndex) {
      val page = graft.model.WebPage(s"u$i", new java.sql.Timestamp(0), bytes, "", "en")
      val r = Extractor.extractOne(page, 0)
      assert(r != null && (r.success || r.error.nonEmpty), s"case $i: $r")
      if (r.success && i >= 3) assert(r.text == "", s"case $i expected empty, got '${r.text}'")
    }
  }

  test("truncated flate stream in a pdf yields a failure row") {
    val good = PdfWriter.generate(Vector("some words here for a paragraph of content"), 1)
    val cut = java.util.Arrays.copyOf(good, good.length / 2)
    val page = graft.model.WebPage("u", new java.sql.Timestamp(0), cut, "", "en")
    val r = Extractor.extractOne(page, 0)
    assert(!r.success && r.error.nonEmpty, s"expected failure row, got $r")
  }

  test("pdf parser handles all layout variants directly") {
    val paras = Vector(
      "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima mike november",
      "oscar papa quebec romeo sierra tango uniform victor whiskey xray yankee zulu one two three",
      "four five six seven eight nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen")
    for (v <- 0 until PdfWriter.numVariants) {
      val pdf = PdfWriter.generate(paras, v)
      val got = PdfParser.extract(pdf)
      assert(got == paras.mkString("\n"), s"variant $v:\n$got")
    }
  }

  test("pdf hex strings: whitespace inside the run, odd digit, dict skip") {
    // hand-packed content stream exercising §7.3.4.3 edge shapes the
    // writer never emits: an odd trailing digit (pads low nibble 0) and a
    // << dict >> adjacent to a hex show
    val content = "BT /F1 10 Tf 1 0 0 1 50 700 Tm " +
      "<48 65\n6C6C 6F> Tj " + // "Hello" with whitespace mid-run
      "1 0 0 1 50 688 Tm [<4 1> -20 (B)] TJ " + // odd digit: 0x41 'A' + "B"
      "/X << /K /V >> BDC 1 0 0 1 50 676 Tm (end) Tj EMC ET"
    val pdf = ("%PDF-1.4\n1 0 obj << /Length " + content.length +
      " >> stream\n" + content + "\nendstream endobj\n%%EOF")
      .getBytes(StandardCharsets.ISO_8859_1)
    // 12pt leading keeps all three lines in one block (split is y-gap > 18)
    assert(PdfParser.extract(pdf) == "Hello AB end")
  }

  test("pdf 1.5 variant paginates: multi-page ObjStm numbering stays valid") {
    // enough paragraphs to overflow one 742->50pt page (~57 lines) several
    // times over — exercises the dense packed-object numbering with n>1
    // pages and the type-1/type-2 xref row split
    val paras = Vector.tabulate(60)(i =>
      s"paragraph number $i with a handful of words that wrap across " +
        s"at least two rendered lines in the sixty character column layout")
    val pdf = PdfWriter.generate(paras, 4)
    assert(new String(pdf, 0, 8, StandardCharsets.ISO_8859_1) == "%PDF-1.5")
    val got = PdfParser.extract(pdf)
    assert(got == paras.mkString("\n"), s"multi-page 1.5:\n$got")
  }
}

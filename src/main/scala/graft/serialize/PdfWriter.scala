package graft.serialize

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

/** Minimal deterministic PDF generator for the golden-fixture corpus
  * (SURVEY §5.2 / FIXTURES.md §3). Produces PDF 1.4 with Helvetica, valid
  * xref, and layout variants that exercise the parser:
  *
  *   0 — single column, raw (uncompressed) content stream, Td/relative moves
  *   1 — single column, FlateDecode, absolute Tm positioning
  *   2 — two columns, FlateDecode (x-clustering test)
  *   3 — multi-page (page break every 2 paragraphs), TJ kerning arrays, T*
  *
  * Layout contract shared with graft.extract.pdf.PdfParser:
  * leading 12pt within a paragraph, 24pt between paragraphs (parser splits
  * blocks at y-gap > 18), columns at x=50 and x=320 (parser splits columns at
  * x-gap > 100), paragraphs never straddle a column/page boundary.
  */
object PdfWriter {

  private val pageW = 612
  private val pageH = 792
  private val topY = 742
  private val bottomY = 50
  private val leading = 12
  private val paraGap = 24

  /** Greedy word wrap; rejoining lines with ' ' reproduces the paragraph. */
  def wrap(paragraph: String, maxChars: Int): Vector[String] = {
    val words = paragraph.split(' ')
    val lines = Vector.newBuilder[String]
    val cur = new StringBuilder
    for (w <- words) {
      if (cur.isEmpty) cur.append(w)
      else if (cur.length + 1 + w.length <= maxChars) cur.append(' ').append(w)
      else { lines += cur.toString; cur.clear(); cur.append(w) }
    }
    if (cur.nonEmpty) lines += cur.toString
    lines.result()
  }

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** A positioned line of text. */
  private case class Line(x: Int, y: Int, text: String, newPara: Boolean)

  /** Lay paragraphs into pages of column line-lists. */
  private def layout(paragraphs: Seq[String], variant: Int): Vector[Vector[Line]] = {
    val twoCol = variant == 2
    val maxChars = if (twoCol) 38 else 60
    val colXs = if (twoCol) Vector(50, 320) else Vector(50)
    val pageBreakEvery = if (variant == 3) 2 else Int.MaxValue

    val pages = Vector.newBuilder[Vector[Line]]
    var cur = Vector.newBuilder[Line]
    var curEmpty = true
    var col = 0
    var y = topY
    var parasOnPage = 0

    def newPage(): Unit = {
      if (!curEmpty) { pages += cur.result() }
      cur = Vector.newBuilder[Line]; curEmpty = true
      col = 0; y = topY; parasOnPage = 0
    }

    for (p <- paragraphs) {
      val lines = wrap(p, maxChars)
      val height = lines.length * leading
      if (parasOnPage >= pageBreakEvery) newPage()
      if (y - height < bottomY) {
        if (col + 1 < colXs.length) { col += 1; y = topY }
        else newPage()
      }
      var first = true
      for (l <- lines) {
        cur += Line(colXs(col), y, l, newPara = first)
        curEmpty = false
        first = false
        y -= leading
      }
      y -= (paraGap - leading) // extra gap after a paragraph
      parasOnPage += 1
    }
    if (!curEmpty) pages += cur.result()
    val res = pages.result()
    if (res.isEmpty) Vector(Vector.empty) else res
  }

  /** Render one page's lines into a content stream body. */
  private def contentStream(lines: Vector[Line], variant: Int): String = {
    val sb = new StringBuilder
    sb.append("BT\n/F1 10 Tf\n")
    variant match {
      case 0 => // relative Td moves
        var px = 0; var py = 0; var started = false
        for (l <- lines) {
          if (!started) { sb.append(s"${l.x} ${l.y} Td\n"); started = true }
          else sb.append(s"${l.x - px} ${l.y - py} Td\n")
          px = l.x; py = l.y
          sb.append(s"(${esc(l.text)}) Tj\n")
        }
      case 1 | 2 => // absolute Tm per line
        for (l <- lines)
          sb.append(s"1 0 0 1 ${l.x} ${l.y} Tm\n(${esc(l.text)}) Tj\n")
      case 3 => // TL/T* plus TJ kerning arrays (mid-word split: pure concat)
        sb.append(s"$leading TL\n")
        var px = 0; var py = 0; var started = false
        for (l <- lines) {
          if (!started) { sb.append(s"${l.x} ${l.y} Td\n"); started = true; px = l.x; py = l.y }
          else if (l.x == px && py - l.y == leading && !l.newPara) { sb.append("T*\n"); py = l.y }
          else { sb.append(s"${l.x - px} ${l.y - py} Td\n"); px = l.x; py = l.y }
          if (l.text.length > 8) {
            val mid = l.text.length / 2
            sb.append(s"[(${esc(l.text.substring(0, mid))}) 15 (${esc(l.text.substring(mid))})] TJ\n")
          } else sb.append(s"(${esc(l.text)}) Tj\n")
        }
      case _ => throw new IllegalArgumentException(s"variant $variant")
    }
    sb.append("ET\n")
    sb.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Generate a complete PDF for the given paragraphs.
    *
    * Scope guard: text must be ISO-8859-1-representable (ASCII + 0xA0-0xFF;
    * the writer emits a WinAnsi-encoded Type1 font and the content stream as
    * Latin-1 bytes). Anything beyond — CJK, typographic-quote range
    * 0x80-0x9F — would need a CID font, which is outside the pinned fixture
    * scope (SURVEY §7.3 "resist wild-PDF generality"); failing loudly here
    * beats silently writing '?' and corrupting a golden. */
  def generate(paragraphs: Seq[String], variant: Int): Array[Byte] = {
    paragraphs.foreach { p =>
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        require(c < 0x100 && !(c >= 0x80 && c <= 0x9f),
          f"PdfWriter scope: char U+${c.toInt}%04X in '${p.take(40)}…' is not ISO-8859-1-representable")
        i += 1
      }
    }
    val pages = layout(paragraphs, variant)
    val nPages = pages.length
    val compress = variant != 0

    // object numbering: 1 catalog, 2 pages, 3 font, then (page, content)*
    val fontObj = 3
    val objs = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    def bytes(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)

    val kidRefs = (0 until nPages).map(i => s"${4 + 2 * i} 0 R").mkString(" ")
    objs += bytes("<< /Type /Catalog /Pages 2 0 R >>")
    objs += bytes(s"<< /Type /Pages /Kids [$kidRefs] /Count $nPages >>")
    objs += bytes("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>")
    pages.zipWithIndex.foreach { case (lines, i) =>
      val contentObj = 4 + 2 * i + 1
      objs += bytes(
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $pageW $pageH] " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> /Contents $contentObj 0 R >>")
      val raw = bytes(contentStream(lines, variant))
      val body = if (compress) deflate(raw) else raw
      val filter = if (compress) " /Filter /FlateDecode" else ""
      val head = bytes(s"<< /Length ${body.length}$filter >>\nstream\n")
      val tail = bytes("\nendstream")
      val full = new Array[Byte](head.length + body.length + tail.length)
      System.arraycopy(head, 0, full, 0, head.length)
      System.arraycopy(body, 0, full, head.length, body.length)
      System.arraycopy(tail, 0, full, head.length + body.length, tail.length)
      objs += full
    }

    val out = new ByteArrayOutputStream(4096)
    def w(b: Array[Byte]): Unit = out.write(b)
    w(bytes("%PDF-1.4\n%âãÏÓ\n"))
    val offsets = new Array[Int](objs.length)
    objs.zipWithIndex.foreach { case (o, idx) =>
      offsets(idx) = out.size()
      w(bytes(s"${idx + 1} 0 obj\n")); w(o); w(bytes("\nendobj\n"))
    }
    val xrefPos = out.size()
    w(bytes(s"xref\n0 ${objs.length + 1}\n"))
    w(bytes("0000000000 65535 f \n"))
    offsets.foreach(off => w(bytes(f"$off%010d 00000 n \n")))
    w(bytes(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefPos\n%%EOF\n"))
    out.toByteArray
  }
}

package graft.extract.ooxml

import java.nio.charset.StandardCharsets

import graft.extract.docx.DocxExtractor

/** OOXML container dispatch + the PPTX/XLSX text kernels — the remaining
  * Office flagship inputs of the reference's conversion whitelist
  * (/root/reference/src/converters/document_converters.py:16-26: .docx,
  * .pptx, .xlsx all route through LibreOffice; here each gets a pure-JVM
  * executor-local path).
  *
  * All three share the zip magic, so routing is by PACKAGE CONTENT:
  * `word/document.xml` → docx, `ppt/presentation.xml` → pptx,
  * `xl/workbook.xml` → xlsx. Text semantics:
  *  - pptx: slides in numeric order, each slide's DrawingML paragraphs
  *    (`<a:p>`/`<a:t>` — same grammar as WordprocessingML, scanned by the
  *    shared run scanner), all joined by "\n";
  *  - xlsx: worksheet rows in order; a cell's text comes from the shared
  *    string table (`t="s"` + `<v>index</v>`) or an inline string
  *    (`<is><t>`); cells within a row join by "\t", rows by "\n".
  */
object OoxmlExtractor {

  /** Identify the OOXML kind by package content (docx | pptx | xlsx) —
    * entry-name enumeration only, nothing inflated. */
  def sniffKind(zipBytes: Array[Byte]): Option[String] = {
    val names = DocxExtractor.entryNames(zipBytes)
    if (names.contains("word/document.xml")) Some("docx")
    else if (names.contains("ppt/presentation.xml")) Some("pptx")
    else if (names.contains("xl/workbook.xml")) Some("xlsx")
    else None
  }

  /** Dispatch on package content; returns (kind, text). ODF packages
    * (odt/odp/ods) and EPUBs share the zip magic but declare themselves in
    * a `mimetype` entry, read ONCE here and branched on. */
  def extract(zipBytes: Array[Byte]): (String, String) = sniffKind(zipBytes) match {
    case Some("docx") => ("docx", DocxExtractor.extract(zipBytes))
    case Some("pptx") => ("pptx", extractPptx(zipBytes))
    case Some("xlsx") => ("xlsx", extractXlsx(zipBytes))
    case _ =>
      val mime = DocxExtractor.readPart(zipBytes, "mimetype")
        .map(b => new String(b, StandardCharsets.UTF_8).trim)
      mime.flatMap(OdfExtractor.kindOfMimetype) match {
        case Some(odfKind) => (odfKind, OdfExtractor.extractKind(zipBytes, odfKind))
        case None if mime.contains(graft.extract.epub.EpubExtractor.mimetype) =>
          ("epub", graft.extract.epub.EpubExtractor.extract(zipBytes))
        case _ => throw new IllegalArgumentException(
          "zip is not a recognized OOXML/ODF/EPUB package (no word/document.xml, " +
            "ppt/presentation.xml, xl/workbook.xml, or known mimetype)")
      }
  }

  private val slideName = "^ppt/slides/slide([0-9]+)\\.xml$".r

  def extractPptx(zipBytes: Array[Byte]): String = {
    val slides = DocxExtractor.readParts(zipBytes,
        name => slideName.pattern.matcher(name).matches())
      .map { case (name, bytes) =>
        val slideName(num) = name: @unchecked
        (num.toInt, new String(bytes, StandardCharsets.UTF_8))
      }
      .sortBy(_._1) // numeric slide order, not archive or lexicographic order
    require(slides.nonEmpty, "pptx has no ppt/slides/slideN.xml parts")
    slides.map { case (_, xml) => DocxExtractor.extractRuns(xml, "a:p", "a:t") }
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  private val sheetName = "^xl/worksheets/sheet([0-9]+)\\.xml$".r

  def extractXlsx(zipBytes: Array[Byte]): String = {
    val parts = DocxExtractor.readParts(zipBytes, name =>
      name == "xl/sharedStrings.xml" ||
        sheetName.pattern.matcher(name).matches())
    val shared: IndexedSeq[String] = parts.collectFirst {
      case ("xl/sharedStrings.xml", bytes) =>
        parseSharedStrings(new String(bytes, StandardCharsets.UTF_8))
    }.getOrElse(IndexedSeq.empty)
    val sheets = parts.collect {
      case (name, bytes) if name != "xl/sharedStrings.xml" =>
        val sheetName(num) = name: @unchecked
        (num.toInt, new String(bytes, StandardCharsets.UTF_8))
    }.sortBy(_._1)
    require(sheets.nonEmpty, "xlsx has no xl/worksheets/sheetN.xml parts")
    sheets.map { case (_, xml) => extractSheet(xml, shared) }
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  /** `<si>` items of the shared-string table; each item's text is the join
    * of its `<t>` runs (plain `<si><t>` or rich `<si><r><t>`). */
  def parseSharedStrings(xml: String): IndexedSeq[String] = {
    val items = IndexedSeq.newBuilder[String]
    var i = 0
    while (true) {
      val start = xml.indexOf("<si>", i)
      if (start < 0) return items.result()
      val end = xml.indexOf("</si>", start)
      val body = if (end < 0) xml.substring(start) else xml.substring(start, end)
      // reuse the run scanner with a never-matching paragraph tag: the final
      // (unterminated) paragraph is flushed by the artificial close below
      items += DocxExtractor.extractRuns(body + "</zz:never>", "zz:never", "t")
      i = if (end < 0) xml.length else end + 5
      if (i >= xml.length) return items.result()
    }
    items.result()
  }

  /** One worksheet: rows -> lines; cells -> tab-joined. Cell value is the
    * shared-string lookup for `t="s"`, the inline `<is><t>` text, or the
    * raw `<v>` body otherwise (numbers stay as written). Valueless cells
    * (`<c r="B2"/>` or `<c></c>` — how real spreadsheets encode blanks)
    * contribute an EMPTY string, preserving the tab-join column alignment
    * of later cells in the row. */
  def extractSheet(xml: String, shared: IndexedSeq[String]): String = {
    val rows = Vector.newBuilder[String]
    var i = 0
    val n = xml.length
    var cells = Vector.newBuilder[String]
    var inRow = false
    var cellIsShared = false
    var cellIsInline = false
    var cellEmitted = true // no cell open yet
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { i = n }
      else {
        val close = xml.indexOf('>', lt)
        if (close < 0) { i = n }
        else {
          val tag = xml.substring(lt + 1, close)
          if (tag.startsWith("row")) { inRow = true; cells = Vector.newBuilder[String] }
          else if (tag == "/row") {
            if (inRow) rows += cells.result().mkString("\t")
            inRow = false
          } else if (tag == "c/" || (tag.startsWith("c ") && tag.endsWith("/"))) {
            if (inRow) cells += "" // self-closing blank cell
          } else if (tag.startsWith("c ") || tag == "c") {
            cellIsShared = tag.contains("t=\"s\"")
            cellIsInline = tag.contains("t=\"inlineStr\"")
            cellEmitted = false
          } else if (tag == "/c") {
            if (inRow && !cellEmitted) cells += "" // open/close pair, no value
            cellEmitted = true
          } else if (tag.startsWith("v") && !tag.startsWith("v/") && tag.length <= 1) {
            val vEnd = xml.indexOf("</v>", close)
            if (vEnd > 0) {
              val raw = xml.substring(close + 1, vEnd)
              cells += (if (cellIsShared) {
                val idx = raw.trim.toInt
                require(idx >= 0 && idx < shared.length, s"shared string $idx out of range")
                shared(idx)
              } else raw)
              cellEmitted = true
              i = vEnd + 4
            }
          } else if (tag.startsWith("is") && (tag.length == 2 || !tag.charAt(2).isLetter)) {
            val isEnd = xml.indexOf("</is>", close)
            if (isEnd > 0 && cellIsInline) {
              cells += DocxExtractor.extractRuns(
                xml.substring(close + 1, isEnd) + "</zz:never>", "zz:never", "t")
              cellEmitted = true
              i = isEnd + 5
            }
          }
          if (i <= close) i = close + 1
        }
      }
    }
    rows.result().mkString("\n")
  }
}

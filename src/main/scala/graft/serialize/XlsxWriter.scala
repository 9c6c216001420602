package graft.serialize

import graft.serialize.OoxmlZip.xmlEscape

/** Minimal deterministic XLSX generator — the SpreadsheetML sibling of
  * [[DocxWriter]] (reference input whitelist
  * /root/reference/src/converters/document_converters.py:16-26 includes
  * .xlsx). Cell text lives in `xl/worksheets/sheetN.xml`; string cells
  * either index into `xl/sharedStrings.xml` (`t="s"` + `<v>idx</v>`, the
  * indirection Excel itself writes) or carry inline strings
  * (`t="inlineStr"` + `<is><t>`).
  *
  * Variants:
  *   0 — one row per paragraph, one shared-string cell each, deflated
  *   1 — paragraph split into one cell per 4 words (tab-joined row),
  *       shared strings DEDUPLICATED (repeat cells share one index)
  *   2 — inline strings (no shared table), STORED archive
  *   3 — two worksheets (rows alternate), rich-text shared items split
  *       into multiple <r><t> runs
  *
  * Contract shared with graft.extract.ooxml.OoxmlExtractor: cells joined
  * by "\t" within a row, rows by "\n", sheets in numeric order.
  */
object XlsxWriter {

  val numVariants = 4

  /** The per-row cell texts for a source paragraph. */
  private def cellsFor(paragraph: String, variant: Int): Seq[String] =
    if (variant == 1) {
      val words = paragraph.split(' ')
      words.grouped(4).map(_.mkString(" ")).toSeq
    } else Seq(paragraph)

  def generate(paragraphs: Seq[String], variant: Int): Array[Byte] = {
    val rows: Seq[Seq[String]] = paragraphs.map(cellsFor(_, variant))

    // shared-string table (variants != 2), deduplicated
    val sharedIndex = scala.collection.mutable.LinkedHashMap[String, Int]()
    def internShared(s: String): Int =
      sharedIndex.getOrElseUpdate(s, sharedIndex.size)
    val useShared = variant != 2

    def cellXml(text: String, col: Int, rowNum: Int): String = {
      val ref = s"${('A' + col).toChar}$rowNum"
      if (useShared) s"""<c r="$ref" t="s"><v>${internShared(text)}</v></c>"""
      else s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(text)}</t></is></c>"""
    }

    def sheetXml(sheetRows: Seq[(Seq[String], Int)]): String =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\">" +
        "<sheetData>" +
        sheetRows.map { case (cells, rowNum) =>
          s"""<row r="$rowNum">${cells.zipWithIndex.map { case (c, i) => cellXml(c, i, rowNum) }.mkString}</row>"""
        }.mkString +
        "</sheetData></worksheet>"

    // two sheets for variant 3 (alternating rows), else one
    val numbered = rows.zipWithIndex.map { case (r, i) => (r, i + 1) }
    val sheets: Seq[String] =
      if (variant == 3) {
        val (a, b) = numbered.partition(_._2 % 2 == 1)
        // renumber rows within each sheet
        def renum(s: Seq[(Seq[String], Int)]) = s.zipWithIndex.map { case ((r, _), i) => (r, i + 1) }
        Seq(sheetXml(renum(a)), sheetXml(renum(b)))
      } else Seq(sheetXml(numbered))

    val sharedXml = {
      val items = sharedIndex.keys.map { s =>
        if (variant == 3 && s.length > 6) {
          val mid = s.length / 2
          s"<si><r><rPr/><t xml:space=\"preserve\">${xmlEscape(s.substring(0, mid))}</t></r>" +
            s"<r><t xml:space=\"preserve\">${xmlEscape(s.substring(mid))}</t></r></si>"
        } else s"<si><t xml:space=\"preserve\">${xmlEscape(s)}</t></si>"
      }.mkString
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "<sst xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\" " +
        s"""count="${sharedIndex.size}" uniqueCount="${sharedIndex.size}">$items</sst>"""
    }

    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        "</Types>"
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        "</Relationships>"
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        "<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheets>" +
        sheets.indices.map(i =>
          s"""<sheet name="Sheet${i + 1}" sheetId="${i + 1}"/>""").mkString +
        "</sheets></workbook>"

    // NOTE: sheets must be rendered BEFORE sharedXml is built (interning
    // happens during sheet rendering), hence the eager vals above.
    val entries = Seq(
      "[Content_Types].xml" -> contentTypes,
      "_rels/.rels" -> rels,
      "xl/workbook.xml" -> workbook) ++
      (if (useShared) Seq("xl/sharedStrings.xml" -> sharedXml) else Seq.empty) ++
      sheets.zipWithIndex.map { case (xml, i) => s"xl/worksheets/sheet${i + 1}.xml" -> xml }
    OoxmlZip.write(entries, store = variant == 2)
  }

  /** The text the extractor must produce for these inputs. */
  def expectedText(paragraphs: Seq[String], variant: Int): String =
    variant match {
      case 1 => paragraphs.map(cellsFor(_, 1).mkString("\t")).mkString("\n")
      case 3 =>
        val numbered = paragraphs.zipWithIndex.map { case (p, i) => (p, i + 1) }
        val (a, b) = numbered.partition(_._2 % 2 == 1)
        (a.map(_._1) ++ b.map(_._1)).mkString("\n")
      case _ => paragraphs.mkString("\n")
    }
}

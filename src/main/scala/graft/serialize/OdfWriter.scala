package graft.serialize

import graft.serialize.OoxmlZip.xmlEscape

/** Minimal deterministic OpenDocument generator for odt / odp / ods, their
  * template kinds ott / otp / ots, and StarOffice sxw — the reference
  * whitelist's ODF family
  * (/root/reference/src/converters/document_converters.py:16-26).
  * content.xml carries `text:p` paragraphs (odt), `draw:page` slides with
  * text boxes (odp), or `table:table-row`/`table:table-cell` grids (ods);
  * the `mimetype` entry declares the kind.
  *
  * Variants:
  *   0 — plain paragraphs, deflated
  *   1 — words wrapped in nested `text:span`s with inter-word spaces
  *       emitted as `<text:s/>` (and runs of them as `text:c` counts)
  *   2 — STORED archive (entity escapes in play via the XML escaper;
  *       `text:tab`/`text:line-break` are covered by hand-authored specs)
  *   3 — (odp) one page per paragraph + empty notes pages to skip;
  *       (ods) one cell per 4 words, tab-joined rows; (odt) same as 0
  *       with extra style elements to skip
  *
  * Contract shared with graft.extract.ooxml.OdfExtractor: odt/odp
  * paragraphs joined by "\n" reproduce the source; ods per
  * [[expectedText]].
  */
object OdfWriter {

  val numVariants = 4

  private def mimetypeOf(kind: String): String = kind match {
    case "odt" => "application/vnd.oasis.opendocument.text"
    case "odp" => "application/vnd.oasis.opendocument.presentation"
    case "ods" => "application/vnd.oasis.opendocument.spreadsheet"
    case "ott" => "application/vnd.oasis.opendocument.text-template"
    case "otp" => "application/vnd.oasis.opendocument.presentation-template"
    case "ots" => "application/vnd.oasis.opendocument.spreadsheet-template"
    case "sxw" => "application/vnd.sun.xml.writer"
    case _ => throw new IllegalArgumentException(kind)
  }

  /** Template kinds share the base kind's content grammar; sxw is the
    * OOo-1.x Writer document (odt grammar under legacy namespaces). */
  private def baseOf(kind: String): String = kind match {
    case "ott" | "sxw" => "odt"
    case "otp" => "odp"
    case "ots" => "ods"
    case k => k
  }

  /** Paragraph body with variant-dependent structure. */
  private def paraBody(p: String, variant: Int): String = variant match {
    case 1 =>
      // each word in its own span; spaces as <text:s/>
      p.split(" ", -1).map(w => s"<text:span>${xmlEscape(w)}</text:span>")
        .mkString("<text:s/>")
    case _ => xmlEscape(p)
  }

  private def textP(p: String, variant: Int): String =
    s"<text:p>${paraBody(p, variant)}</text:p>"

  private val namespaces =
    "xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:office:1.0\" " +
      "xmlns:text=\"urn:oasis:names:tc:opendocument:xmlns:text:1.0\" " +
      "xmlns:table=\"urn:oasis:names:tc:opendocument:xmlns:table:1.0\" " +
      "xmlns:draw=\"urn:oasis:names:tc:opendocument:xmlns:drawing:1.0\""

  /** StarOffice / OpenOffice.org 1.x declares the SAME element prefixes
    * under pre-OASIS namespace URIs — real .sxw files look exactly like
    * this, which is what makes the prefix-matching scanner cover them. */
  private val sxwNamespaces =
    "xmlns:office=\"http://openoffice.org/2000/office\" " +
      "xmlns:text=\"http://openoffice.org/2000/text\" " +
      "xmlns:table=\"http://openoffice.org/2000/table\" " +
      "xmlns:draw=\"http://openoffice.org/2000/drawing\""

  private def stylesXml(variant: Int): String =
    if (variant == 3) "<office:automatic-styles><style:style style:name=\"P1\" xmlns:style=\"urn:oasis:names:tc:opendocument:xmlns:style:1.0\"/></office:automatic-styles>" else ""

  private def contentXml(kind: String, paragraphs: Seq[String], variant: Int): String = {
    val ns = if (kind == "sxw") sxwNamespaces else namespaces
    """<?xml version="1.0" encoding="UTF-8"?>""" +
      s"<office:document-content $ns>" + stylesXml(variant) +
      "<office:body>" + bodyXml(baseOf(kind), paragraphs, variant) +
      "</office:body></office:document-content>"
  }

  private def bodyXml(kind: String, paragraphs: Seq[String], variant: Int): String = {
    val body = kind match {
      case "odt" =>
        "<office:text>" + paragraphs.map(textP(_, variant)).mkString + "</office:text>"
      case "odp" =>
        val pages =
          if (variant == 3)
            paragraphs.map(p =>
              s"<draw:page><draw:frame><draw:text-box>${textP(p, variant)}</draw:text-box></draw:frame>" +
                "<presentation:notes xmlns:presentation=\"urn:oasis:names:tc:opendocument:xmlns:presentation:1.0\">" +
                "<draw:frame><draw:text-box></draw:text-box></draw:frame></presentation:notes></draw:page>")
          else
            Seq("<draw:page><draw:frame><draw:text-box>" +
              paragraphs.map(textP(_, variant)).mkString + "</draw:text-box></draw:frame></draw:page>")
        "<office:presentation>" + pages.mkString + "</office:presentation>"
      case "ods" =>
        val rows = paragraphs.map { p =>
          val cells =
            if (variant == 3) p.split(' ').grouped(4).map(_.mkString(" ")).toSeq
            else Seq(p)
          "<table:table-row>" + cells.map(c =>
            s"<table:table-cell>${textP(c, variant)}</table:table-cell>").mkString +
            "</table:table-row>"
        }
        "<office:spreadsheet><table:table>" + rows.mkString + "</table:table></office:spreadsheet>"
      case _ => throw new IllegalArgumentException(kind)
    }
    body
  }

  def generate(kind: String, paragraphs: Seq[String], variant: Int): Array[Byte] = {
    // mimetype first, per ODF packaging convention
    val entries = Seq(
      "mimetype" -> mimetypeOf(kind),
      "content.xml" -> contentXml(kind, paragraphs, variant))
    OoxmlZip.write(entries, store = variant == 2)
  }

  /** Flat-ODF single-file XML (.fodt/.fodp/.fods): root `office:document`
    * with the package mimetype as an attribute, body grammar identical to
    * content.xml. Same variants as [[generate]]; [[expectedText]] holds
    * unchanged. Variant 2 (the packaged STORED variant) here omits the
    * office:mimetype attribute to exercise the extractor's body-element
    * fallback. */
  def generateFlat(kind: String, paragraphs: Seq[String], variant: Int): Array[Byte] = {
    val mimeAttr =
      if (variant == 2) "" else s""" office:mimetype="${mimetypeOf(kind)}""""
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        s"<office:document $namespaces$mimeAttr>" + stylesXml(variant) +
        "<office:body>" + bodyXml(kind, paragraphs, variant) +
        "</office:body></office:document>"
    xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** The text OdfExtractor must produce for these inputs. */
  def expectedText(kind: String, paragraphs: Seq[String], variant: Int): String =
    baseOf(kind) match {
      case "ods" if variant == 3 =>
        paragraphs.map(_.split(' ').grouped(4).map(_.mkString(" ")).mkString("\t")).mkString("\n")
      case _ => paragraphs.mkString("\n")
    }
}

package graft.serialize

import java.nio.charset.StandardCharsets

/** Production text → document-bytes surface covering the reference's
  * OUTPUT whitelist (/root/reference/src/converters/document_converters.py:22-26:
  * .pdf .txt .rtf .doc .docx .odt .html .xml .xls .xlsx .ods .csv .ppt
  * .pptx .odp .epub). The reference reaches these through a per-file
  * LibreOffice convert loop; here each target format has a deterministic
  * pure-JVM serializer (the same writers the extraction kernels are
  * verified against, which is what makes the round-trip invariant
  * checkable end-to-end).
  *
  * Contract: the '\n'-separated lines of `text` are the document's
  * paragraphs — the same golden-text convention the extraction tier uses
  * ([[graft.fixtures.Corpus]] golden = paragraphs.mkString("\n")) — and
  * extracting the returned bytes reproduces `text` byte-identically
  * (for .csv via the [[csvToText]] inverse, because CSV quoting is part
  * of the format, not the content). Asserted per format by the oracled
  * `serialize_roundtrip` query and SerializeSpec.
  *
  * One scoped caveat on the .html arm: re-extraction runs the published
  * Boilerpipe block rules, which drop sub-threshold fragments (< ~5 words
  * between short neighbors) as boilerplate BY DESIGN — so html round-trip
  * identity holds for prose-length paragraphs (the corpus paragraphizer
  * guarantees >= 17 words) but not for a document of isolated short
  * fragments. That is a property of pairing any serializer with a
  * main-content extractor, not of this writer; the binary formats have no
  * such threshold and round-trip any content.
  */
object Serialize {

  /** The reference's document output whitelist, extension-normalized. */
  val outputFormats: IndexedSeq[String] = IndexedSeq(
    "pdf", "txt", "rtf", "doc", "docx", "odt", "html", "xml",
    "xls", "xlsx", "ods", "csv", "ppt", "pptx", "odp", "epub")

  /** One paragraph per '\n'-separated line (the golden-text convention).
    * Keeps trailing empty segments (split limit -1): a text ending in '\n'
    * has a trailing empty paragraph, which [[serialize]] REJECTS by name
    * for the document formats rather than silently dropping it — an empty
    * paragraph is not representable as extractable content, so accepting
    * it would break the documented byte-identical round-trip. */
  def splitParagraphs(text: String): Vector[String] =
    text.split("\n", -1).toVector

  /** text → target-format bytes. Variant 0 of each writer is the canonical
    * production layout; the other variants exist to harden the extractors
    * against real-world structural diversity and stay on the fixture side. */
  def serialize(text: String, fmt: String): Array[Byte] = {
    lazy val paragraphs = {
      val ps = splitParagraphs(text)
      require(ps.forall(_.nonEmpty),
        "text has empty paragraphs (blank or trailing newline) — not " +
          "representable as extractable document content; strip them first " +
          "or serialize as .txt")
      ps
    }
    fmt.toLowerCase.stripPrefix(".") match {
      case "txt"  => text.getBytes(StandardCharsets.UTF_8)
      case "pdf"  => PdfWriter.generate(paragraphs, 0)
      case "rtf"  => RtfWriter.generate(paragraphs, 0)
      case "doc"  => LegacyOfficeWriters.DocWriter.generate(paragraphs, 0)
      case "docx" => DocxWriter.generate(paragraphs, 0)
      case "odt"  => OdfWriter.generate("odt", paragraphs, 0)
      case "odp"  => OdfWriter.generate("odp", paragraphs, 0)
      case "ods"  => OdfWriter.generate("ods", paragraphs, 0)
      case "html" => htmlBytes(paragraphs)
      // the reference's .xml target is LibreOffice's flat-XML document;
      // the flat-ODF serializer is exactly that shape (sniffed `fodf`)
      case "xml"  => OdfWriter.generateFlat("odt", paragraphs, 0)
      case "xls"  => LegacyOfficeWriters.XlsWriter.generate(
        paragraphs, LegacyOfficeWriters.XlsWriter.verbatimVariants(0))
      case "xlsx" => XlsxWriter.generate(paragraphs, 0)
      case "csv"  => csvBytes(paragraphs)
      case "ppt"  => LegacyOfficeWriters.PptWriter.generate(paragraphs, 0)
      case "pptx" => PptxWriter.generate(paragraphs, 0)
      case "epub" => EpubWriter.generate(paragraphs, 0)
      case other => throw new IllegalArgumentException(
        s"unsupported output format .$other (whitelist: ${outputFormats.mkString(", ")})")
    }
  }


  /** Clean-article HTML (the LibreOffice html-export analog): content-only
    * markup, one <p> per paragraph, no boilerplate — so the main-content
    * classifier keeps every block and extraction is the identity. */
  private def htmlBytes(paragraphs: Seq[String]): Array[Byte] = {
    // html and xml share the same three-entity escape
    val body = paragraphs.map(p => s"<p>${OoxmlZip.xmlEscape(p)}</p>").mkString("\n")
    ("<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\"></head>\n" +
      s"<body><article>\n$body\n</article></body></html>\n")
      .getBytes(StandardCharsets.UTF_8)
  }

  /** RFC-4180 single-column CSV: one record per paragraph, quoted only
    * when the content requires it. */
  private def csvBytes(paragraphs: Seq[String]): Array[Byte] =
    paragraphs.map(csvEscapeCell).mkString("\n").getBytes(StandardCharsets.UTF_8)

  private def csvEscapeCell(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** Inverse of the .csv serialization: extracted CSV text → original
    * paragraph text. Cells never contain '\n' (the serializer's paragraphs
    * are lines by construction), so records are exactly the lines. */
  def csvToText(csv: String): String =
    csv.split('\n').map { line =>
      if (line.length >= 2 && line.startsWith("\"") && line.endsWith("\""))
        line.substring(1, line.length - 1).replace("\"\"", "\"")
      else line
    }.mkString("\n")
}

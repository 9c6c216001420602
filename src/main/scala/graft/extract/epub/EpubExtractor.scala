package graft.extract.epub

import graft.extract.docx.DocxExtractor
import graft.extract.html.HtmlExtractor

/** EPUB → text kernel — the reference whitelist's .epub input
  * (/root/reference/src/converters/document_converters.py:16-26). An EPUB
  * is a zip (`mimetype` = application/epub+zip) of XHTML chapters; each
  * chapter runs through the SAME HTML extraction kernel as web pages
  * (tokenizer → blocks → boilerplate classifier), chapters join by "\n"
  * in numeric spine order (scope pinned to the fixture writer's
  * `OEBPS/chapterN.xhtml` layout; nav/opf/css parts contribute nothing).
  */
object EpubExtractor {

  val mimetype = "application/epub+zip"

  def isEpub(zipBytes: Array[Byte]): Boolean =
    DocxExtractor.readPart(zipBytes, "mimetype")
      .exists(b => new String(b, java.nio.charset.StandardCharsets.UTF_8).trim == mimetype)

  private val chapterName = "^OEBPS/chapter([0-9]+)\\.xhtml$".r

  def extract(zipBytes: Array[Byte]): String = {
    val chapters = DocxExtractor.readParts(zipBytes,
        name => chapterName.pattern.matcher(name).matches())
      .map { case (name, bytes) =>
        val chapterName(num) = name: @unchecked
        (num.toInt, bytes)
      }
      .sortBy(_._1)
    require(chapters.nonEmpty, "epub has no OEBPS/chapterN.xhtml parts")
    chapters.map { case (_, bytes) => HtmlExtractor.extract(bytes) }
      .filter(_.nonEmpty)
      .mkString("\n")
  }
}

package graft.serialize

import graft.serialize.OoxmlZip.xmlEscape

/** Minimal deterministic EPUB generator — the reference whitelist's .epub
  * input (/root/reference/src/converters/document_converters.py:16-26).
  * Chapters are clean-article XHTML, so the HTML kernel's extraction of a
  * chapter equals its paragraphs joined by "\n".
  *
  * Variants:
  *   0 — one chapter per paragraph
  *   1 — two paragraphs per chapter, plus a nav.xhtml (link-farm table of
  *       contents) and a stylesheet that must contribute no text
  *   2 — single chapter with boilerplate nav/footer around the article
  *       (the classifier must strip it), STORED archive
  *   3 — >10 chapters exercising numeric spine order
  *   4 — publisher-named chapter files (`OEBPS/text/secNN.xhtml`, numbered
  *       DESCENDING so filename order contradicts reading order) — only the
  *       OPF `<spine>` yields the correct chapter sequence
  */
object EpubWriter {

  val numVariants = 5

  private def chapterXhtml(paragraphs: Seq[String], boilerplate: Boolean): String = {
    val body = paragraphs.map(p => s"<p>${xmlEscape(p)}</p>").mkString
    // nav with text around the links (~0.5 link density — the realistic
    // book-toc shape, same regime as the corpus boilerplate template); a
    // pure link farm (density ~0.9) would legitimately make the classifier
    // treat a short adjacent first paragraph as boilerplate too
    val nav =
      if (boilerplate)
        """<nav>browse this book <a href="c1.xhtml">first chapter</a> then <a href="c2.xhtml">second chapter</a> then <a href="c3.xhtml">third chapter</a> here</nav>"""
      else ""
    val footer =
      if (boilerplate) """<footer><p><a href="/l">license</a> <a href="/c">colophon</a> <a href="/i">imprint</a></p></footer>"""
      else ""
    """<?xml version="1.0" encoding="UTF-8"?>""" +
      "<!DOCTYPE html><html xmlns=\"http://www.w3.org/1999/xhtml\"><head>" +
      "<title>chapter</title></head><body>" +
      nav + s"<article>$body</article>" + footer +
      "</body></html>"
  }

  private val navXhtml =
    """<?xml version="1.0" encoding="UTF-8"?><html xmlns="http://www.w3.org/1999/xhtml">""" +
      """<body><nav epub:type="toc" xmlns:epub="http://www.idpf.org/2007/ops"><ol>""" +
      (1 to 6).map(i => s"""<li><a href="chapter$i.xhtml">chapter $i</a></li>""").mkString +
      "</ol></nav></body></html>"

  private val containerXml =
    """<?xml version="1.0" encoding="UTF-8"?>""" +
      """<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">""" +
      """<rootfiles><rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/></rootfiles></container>"""

  def generate(paragraphs: Seq[String], variant: Int): Array[Byte] = {
    val groups: Seq[Seq[String]] = variant match {
      case 0 | 3 | 4 => paragraphs.map(Seq(_))
      case 1 => paragraphs.grouped(2).toSeq
      case 2 => Seq(paragraphs)
      case _ => throw new IllegalArgumentException(s"variant $variant")
    }
    // chapter i's href, relative to the OPF directory (OEBPS/): variant 4
    // numbers files DESCENDING so only the spine gives reading order
    def href(i: Int): String =
      if (variant == 4) s"text/sec${(groups.size - i) * 7}.xhtml"
      else s"chapter${i + 1}.xhtml"
    val opf =
      """<?xml version="1.0" encoding="UTF-8"?>""" +
        """<package xmlns="http://www.idpf.org/2007/opf" version="3.0"><manifest>""" +
        (if (variant == 1)
          """<item id="nav" href="nav.xhtml" media-type="application/xhtml+xml" properties="nav"/>""" +
            """<item id="css" href="style.css" media-type="text/css"/>"""
        else "") +
        groups.indices.map(i =>
          s"""<item id="c${i + 1}" href="${href(i)}" media-type="application/xhtml+xml"/>""").mkString +
        "</manifest><spine>" +
        groups.indices.map(i => s"""<itemref idref="c${i + 1}"/>""").mkString +
        "</spine></package>"
    val entries =
      Seq("mimetype" -> "application/epub+zip",
        "META-INF/container.xml" -> containerXml,
        "OEBPS/content.opf" -> opf) ++
        (if (variant == 1) Seq("OEBPS/nav.xhtml" -> navXhtml,
          "OEBPS/style.css" -> "p { margin: 0; }")
        else Seq.empty) ++
        groups.zipWithIndex.map { case (g, i) =>
          s"OEBPS/${href(i)}" -> chapterXhtml(g, boilerplate = variant == 2)
        }
    OoxmlZip.write(entries, store = variant == 2)
  }
}

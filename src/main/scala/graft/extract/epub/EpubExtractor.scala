package graft.extract.epub

import java.nio.charset.StandardCharsets

import graft.extract.docx.DocxExtractor
import graft.util.XmlAttr.attr
import graft.extract.html.HtmlExtractor

/** EPUB → text kernel — the reference whitelist's .epub input
  * (/root/reference/src/converters/document_converters.py:16-26). An EPUB
  * is a zip (`mimetype` = application/epub+zip) of XHTML chapters; each
  * chapter runs through the SAME HTML extraction kernel as web pages
  * (tokenizer → blocks → boilerplate classifier), chapters joined by "\n"
  * in SPINE order: META-INF/container.xml names the OPF package document,
  * whose `<manifest>` maps item ids to hrefs and whose `<spine>` fixes the
  * reading order — publisher-named chapter files extract correctly, no
  * filename convention assumed. Non-spine parts (nav/opf/css) contribute
  * nothing. A numeric `OEBPS/chapterN.xhtml` fallback covers packages with
  * a missing/unparseable OPF.
  */
object EpubExtractor {

  val mimetype = "application/epub+zip"

  def isEpub(zipBytes: Array[Byte]): Boolean =
    DocxExtractor.readPart(zipBytes, "mimetype")
      .exists(b => new String(b, StandardCharsets.UTF_8).trim == mimetype)

  def extract(zipBytes: Array[Byte]): String = {
    val chapters = spinePaths(zipBytes) match {
      case Some(paths) if paths.nonEmpty =>
        // one archive pass for all chapters, then re-ordered by spine
        val byName = DocxExtractor.readParts(zipBytes, paths.toSet).toMap
        paths.flatMap(byName.get)
      case _ => conventionChapters(zipBytes)
    }
    require(chapters.nonEmpty,
      "epub has no spine-referenced xhtml chapters (and no OEBPS/chapterN.xhtml fallback)")
    chapters.map(HtmlExtractor.extract).filter(_.nonEmpty).mkString("\n")
  }

  /** Chapter archive paths in reading order, from container.xml → OPF
    * manifest + spine. None when the package route is absent/unparseable. */
  def spinePaths(zipBytes: Array[Byte]): Option[Seq[String]] =
    for {
      container <- DocxExtractor.readPart(zipBytes, "META-INF/container.xml")
        .map(new String(_, StandardCharsets.UTF_8))
      opfPath <- tags(container, "rootfile").flatMap(attr(_, "full-path")).headOption
      opfXml <- DocxExtractor.readPart(zipBytes, opfPath)
        .map(new String(_, StandardCharsets.UTF_8))
    } yield {
      val base = opfPath.lastIndexOf('/') match {
        case -1 => ""
        case i => opfPath.substring(0, i + 1)
      }
      val items: Map[String, (String, String)] = tags(opfXml, "item").flatMap { t =>
        for (id <- attr(t, "id"); href <- attr(t, "href"))
          yield id -> (href, attr(t, "media-type").getOrElse(""))
      }.toMap
      tags(opfXml, "itemref")
        .flatMap(attr(_, "idref"))
        .flatMap(items.get)
        .collect { case (href, mt) if mt == "application/xhtml+xml" => resolve(base, href) }
    }

  private val chapterName = "^OEBPS/chapter([0-9]+)\\.xhtml$".r

  /** Fallback: numeric `OEBPS/chapterN.xhtml` order (the pre-OPF layout). */
  private def conventionChapters(zipBytes: Array[Byte]): Seq[Array[Byte]] =
    DocxExtractor.readParts(zipBytes,
        name => chapterName.pattern.matcher(name).matches())
      .map { case (name, bytes) =>
        val chapterName(num) = name: @unchecked
        (num.toInt, bytes)
      }
      .sortBy(_._1)
      .map(_._2)

  /** All `<name ...>` (and self-closing) tag bodies, in document order. */
  private def tags(xml: String, name: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val open = "<" + name
    var i = xml.indexOf(open)
    while (i >= 0) {
      val after = i + open.length
      // require a name boundary so "<item" does not match "<itemref"
      if (after < xml.length && !Character.isLetterOrDigit(xml.charAt(after))) {
        val close = xml.indexOf('>', i)
        if (close > 0) out += xml.substring(i + 1, close)
      }
      i = xml.indexOf(open, after)
    }
    out.result()
  }

  /** Resolve an href against the OPF's directory, normalizing `.`/`..`. */
  private def resolve(base: String, href: String): String = {
    val joined = if (href.startsWith("/")) href.drop(1) else base + href
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    joined.split('/').foreach {
      case "" | "." => ()
      case ".." => if (out.nonEmpty) out.remove(out.length - 1)
      case seg => out += seg
    }
    out.mkString("/")
  }
}

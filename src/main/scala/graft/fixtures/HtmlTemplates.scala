package graft.fixtures

import java.nio.charset.{Charset, StandardCharsets}

/** Deterministic HTML fixture templates (FIXTURES.md §2). Each template wraps
  * the content paragraphs in a different page shape; the golden invariant is
  * always: extraction == paragraphs.mkString("\n").
  *
  * Fixture-design rule (SURVEY §7.3 "fixtures away from thresholds"): every
  * boilerplate block is either inside an ignored subtree (nav/header/footer/
  * aside/form/head) or has link density > 1/3, and no block with link density
  * > 0.5556 directly precedes the first content paragraph; content paragraphs
  * carry >= 17 words or arrive via the longest-block fallback.
  */
object HtmlTemplates {

  val numTemplates = 7
  val numEncodings = 6

  /** Split `text` (single-spaced words) into paragraphs of ~25 words; a final
    * fragment of < 17 words is merged into the previous paragraph (widow
    * control) so multi-paragraph docs never contain a sub-threshold block. */
  def paragraphize(text: String): Vector[String] = {
    val words = text.split(' ').toVector
    if (words.isEmpty) return Vector.empty
    val chunks = words.grouped(25).map(_.mkString(" ")).toVector
    if (chunks.length > 1 && chunks.last.split(' ').length < 17)
      chunks.dropRight(2) :+ (chunks(chunks.length - 2) + " " + chunks.last)
    else chunks
  }

  /** Expected extraction for a content text (shared by HTML and PDF splits). */
  def golden(text: String): String = paragraphize(text).mkString("\n")

  // ---- boilerplate fragments (all ignored-subtree or link-dense) ----

  private def nav(docId: Long): String = {
    val items = (0 until 20).map(i => s"""<li><a href="/cat/$i">section $i</a></li>""").mkString
    s"""<nav class="topnav"><ul>$items</ul></nav>"""
  }

  private val cookie: String =
    """<div class="cookie-banner">this site uses cookies to improve your experience """ +
    """<a href="#accept">accept</a> <a href="#decline">decline</a> <a href="#settings">settings</a> """ +
    """<a href="#more">learn more</a> <a href="#privacy">privacy policy</a></div>"""

  private def sidebar(docId: Long): String = {
    val items = (0 until 12).map { i =>
      s"""<li><a href="/story/${docId % 97}$i">related story number $i</a></li>"""
    }.mkString
    s"""<div class="sidebar"><h3><a href="/related">related stories</a></h3><ul>$items</ul></div>"""
  }

  private def footer(extra: String): String =
    s"""<footer><p>copyright 2024 example news network all rights reserved$extra</p>""" +
    """<p>terms of service privacy imprint contact</p></footer>"""

  private def head(title: String, metaCharset: String): String =
    s"""<head><meta charset="$metaCharset"><meta name="viewport" content="width=device-width">""" +
    s"""<title>$title</title><style>body{font:14px/1.4 serif;margin:0}</style></head>"""

  // ---- templates ----

  /** Render template `tid` for a doc. Returns the HTML (unencoded string);
    * `footerExtra` lets the encoding matrix inject non-ASCII into an ignored
    * subtree so charset handling has observable teeth. */
  def render(tid: Int, docId: Long, paragraphs: Vector[String],
             metaCharset: String, footerExtra: String): String = {
    val title = s"document $docId"
    val ps = paragraphs.map(p => s"<p>$p</p>").mkString("\n")
    val body = tid match {
      case 0 => // clean article
        s"""<article>$ps</article>"""
      case 1 => // boilerplate-heavy
        s"""${nav(docId)}$cookie<article>$ps</article>${sidebar(docId)}"""
      case 2 => // tables + lists wrapping content
        val (inTable, inList) = paragraphs.splitAt((paragraphs.length + 1) / 2)
        val rows = inTable.map(p => s"<tr><td>$p</td></tr>").mkString
        val lis = inList.map(p => s"<li>$p</li>").mkString
        val listHtml = if (inList.nonEmpty) s"<ul>$lis</ul>" else ""
        s"""<article><table class="layout"><tbody>$rows</tbody></table>$listHtml</article>${sidebar(docId)}"""
      case 3 => // character references inside content text
        val entPs = paragraphs.map(p => s"<p>${entityEncode(p)}</p>").mkString("\n")
        s"""$cookie<article>$entPs</article>"""
      case 4 => // script/style/comment/CDATA noise between paragraphs
        val noisy = paragraphs.zipWithIndex.map { case (p, i) =>
          s"""<script type="text/javascript">var x$i = "<p>not content $i</p>"; if (x$i) { document.title = x$i; }</script>""" +
          s"""<!-- comment $i with <p>fake paragraph</p> inside --><p>$p</p>"""
        }.mkString("\n")
        s"""<article>$noisy<![CDATA[raw cdata junk <p>ignored</p>]]><style>.x{color:red}</style></article>"""
      case 5 => // malformed: unclosed tags, stray close, unquoted attributes
        val openPs = paragraphs.map(p => s"<p>$p").mkString("\n") // never closed
        s"""</div><div class=main id=main><ARTICLE>$openPs</div>${sidebar(docId)}"""
      case 6 => // deep nesting: blockquote/main/section wrappers, link-dense
        // share bars between paragraphs (density 1.0 -> stripped)
        // inside an ignored subtree (aside) per the fixture-design rule: a
        // link-dense block BETWEEN paragraphs would otherwise flip the
        // classifier's prev-density branch for short following paragraphs
        val share = """<aside class="share"><a href="#t">share on t</a> <a href="#f">share on f</a> <a href="#m">mail this</a></aside>"""
        val nested = paragraphs.zipWithIndex.map { case (p, i) =>
          if (i % 2 == 0) s"<section><blockquote><p>$p</p></blockquote></section>$share"
          else s"<div><div><div><p>$p</p></div></div></div>"
        }.mkString
        s"""<main>${nav(docId)}$nested</main>${sidebar(docId)}"""
      case other => throw new IllegalArgumentException(s"template $other")
    }
    s"""<!DOCTYPE html><html lang="en">${head(title, metaCharset)}<body>$body${footer(footerExtra)}</body></html>"""
  }

  /** Deterministically replace some content chars with numeric character
    * references (letters at position % 7 == 3, spaces at position % 11 == 5).
    * Decoding restores the original text exactly. */
  def entityEncode(p: String): String = {
    val sb = new StringBuilder(p.length * 2)
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == ' ' && i % 11 == 5) sb.append("&#32;")
      else if (c.isLetter && i % 7 == 3) {
        if (i % 2 == 0) sb.append("&#").append(c.toInt).append(';')
        else sb.append("&#x").append(Integer.toHexString(c.toInt)).append(';')
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Encoding matrix (FIXTURES.md §2): `render(metaCharset, footerExtra)`
    * produces the HTML; returns the encoded payload bytes. */
  def encode(encId: Int, render: (String, String) => String): Array[Byte] = encId match {
    case 0 => render("utf-8", "").getBytes(StandardCharsets.UTF_8)
    case 1 => // UTF-8 with BOM
      val b = render("utf-8", "").getBytes(StandardCharsets.UTF_8)
      Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ b
    case 2 => // ISO-8859-1 declared by meta, with a non-ASCII char in the footer
      render("iso-8859-1", " café société").getBytes(StandardCharsets.ISO_8859_1)
    case 3 => // UTF-16LE with BOM; meta lies (utf-8) — BOM must win
      val b = render("utf-8", " café").getBytes(StandardCharsets.UTF_16LE)
      Array[Byte](0xff.toByte, 0xfe.toByte) ++ b
    case 4 => // meta lies (us-ascii) over UTF-8 bytes — strict decode must fall through
      render("us-ascii", " café").getBytes(StandardCharsets.UTF_8)
    case 5 => // UTF-16BE with BOM; meta lies (iso-8859-1) — BOM must win
      val b = render("iso-8859-1", " grüße").getBytes(StandardCharsets.UTF_16BE)
      Array[Byte](0xfe.toByte, 0xff.toByte) ++ b
    case other => throw new IllegalArgumentException(s"encoding $other")
  }
}

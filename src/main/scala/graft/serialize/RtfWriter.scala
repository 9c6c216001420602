package graft.serialize

/** Minimal deterministic RTF generator — the reference whitelist's .rtf
  * input (/root/reference/src/converters/document_converters.py:16-26).
  *
  * Variants:
  *   0 — plain paragraphs separated by \par
  *   1 — font table + formatting words (\b, \i, \fs) interleaved, escapes
  *       for braces/backslashes
  *   2 — non-ASCII words emitted as \'hh (cp1252) and \uN with fallback,
  *       plus a {\*\generator} destination group to skip
  *   3 — source line breaks inside the file (formatting, not text) and an
  *       {\info ...} destination group
  *
  * Contract shared with graft.extract.rtf.RtfExtractor: paragraphs joined
  * by "\n" reproduce the source paragraphs exactly.
  */
object RtfWriter {

  val numVariants = 4

  /** The cp1252 0x80-0x9F punctuation range (smart quotes, dashes, €, …) —
    * real-world RTF escapes these as `\'hh`; the hex variant emits them so
    * the extractor's windows-1252 decode is exercised. */
  private val cp1252Punct: Map[Char, Int] = Map(
    '€' -> 0x80, '…' -> 0x85, '‘' -> 0x91, '’' -> 0x92,
    '“' -> 0x93, '”' -> 0x94, '–' -> 0x96, '—' -> 0x97)

  private def esc(s: String, hexNonAscii: Boolean): String = {
    val sb = new StringBuilder
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '{' => sb.append("\\{")
      case '}' => sb.append("\\}")
      case c if c > 0x7f && c <= 0xff && hexNonAscii => sb.append(f"\\'$c%02x")
      case c if hexNonAscii && cp1252Punct.contains(c) =>
        sb.append(f"\\'${cp1252Punct(c)}%02x")
      // chars beyond Latin-1 MUST escape in every variant — the writer
      // serializes as ISO-8859-1, which would otherwise corrupt them to '?'
      case c if c > 0xff => sb.append(s"\\u${c.toInt}?")
      case c => sb.append(c)
    }
    sb.toString
  }

  def generate(paragraphs: Seq[String], variant: Int): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("{\\rtf1\\ansi\\deff0")
    if (variant == 1) sb.append("{\\fonttbl{\\f0\\froman Liberation Serif;}}")
    if (variant == 2) sb.append("{\\*\\generator graft fixture 1.0;}")
    if (variant == 3) sb.append("{\\info{\\title fixture}{\\author nobody}}")
    sb.append("\\f0\\fs24 ")
    paragraphs.zipWithIndex.foreach { case (p, idx) =>
      if (idx > 0) sb.append("\\par ")
      if (variant == 3 && idx > 0) sb.append("\r\n") // raw breaks: formatting only
      val body = variant match {
        case 1 =>
          val words = p.split(" ", -1)
          words.zipWithIndex.map { case (w, i) =>
            val e = esc(w, hexNonAscii = false)
            if (i % 3 == 1) s"{\\b $e}" else if (i % 3 == 2) s"{\\i\\fs20 $e}" else e
          }.mkString(" ")
        case 2 => esc(p, hexNonAscii = true)
        case _ => esc(p, hexNonAscii = false)
      }
      sb.append(body)
    }
    sb.append("}")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }
}

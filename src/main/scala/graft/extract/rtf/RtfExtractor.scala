package graft.extract.rtf

/** RTF → text kernel — the reference whitelist's .rtf input
  * (/root/reference/src/converters/document_converters.py:16-26). RTF is a
  * single-pass friendly format: `{`/`}` groups, `\control[N]` words, and
  * plain character data. Scope pinned by [[graft.serialize.RtfWriter]]:
  *
  *  - `\par` / `\line` → "\n"; `\tab` → "\t";
  *  - escapes `\\ \{ \}`, hex `\'hh` (cp1252), unicode `\uN` with one
  *    fallback character consumed (per \uc1);
  *  - destination groups (`{\*\...}`, fonttbl, colortbl, stylesheet, info,
  *    pict) contribute no text;
  *  - raw CR/LF in the source are formatting, not text.
  *
  * A trailing `\par` before the closing brace emits no empty line
  * (paragraph separator semantics, matching the writer's contract).
  */
object RtfExtractor {

  private val skipDestinations = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict",
    "header", "footer", "generator")

  /** windows-1252 byte → char — the \ansi default code page `\'hh` escapes
    * refer to. It matches Latin-1 on 0xA0-0xFF but maps 0x80-0x9F to smart
    * quotes / dashes / € (the most common escaped bytes in real documents);
    * a bare `.toChar` would decode those to C1 control characters. */
  private val cp1252: Array[Char] = {
    val cs = java.nio.charset.Charset.forName("windows-1252")
    (0 until 256).map(b => new String(Array(b.toByte), cs).charAt(0)).toArray
  }

  def extract(bytes: Array[Byte]): String = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    require(s.startsWith("{\\rtf"), "not an RTF document")
    val out = new StringBuilder
    var i = 0
    val n = s.length
    var skipDepth = 0 // >0: inside a destination group being discarded
    var depth = 0

    def emit(c: Char): Unit = if (skipDepth == 0) out.append(c)
    def emitStr(t: String): Unit = if (skipDepth == 0) out.append(t)

    while (i < n) {
      s.charAt(i) match {
        case '{' =>
          depth += 1
          i += 1
          // {\*\dest ...} — unknown destination: skip whole group
          if (i + 1 < n && s.charAt(i) == '\\' && s.charAt(i + 1) == '*' && skipDepth == 0) {
            skipDepth = depth
          }
        case '}' =>
          if (skipDepth == depth) skipDepth = 0
          depth -= 1
          i += 1
        case '\\' =>
          if (i + 1 >= n) { i = n }
          else s.charAt(i + 1) match {
            case '\\' | '{' | '}' => emit(s.charAt(i + 1)); i += 2
            case '\'' =>
              if (i + 3 < n) {
                emit(cp1252(Integer.parseInt(s.substring(i + 2, i + 4), 16)))
                i += 4
              } else i = n
            case '*' => i += 2 // handled at group open; ignore here
            case c if c.isLetter =>
              var j = i + 1
              while (j < n && s.charAt(j).isLetter) j += 1
              val word = s.substring(i + 1, j)
              var k = j
              if (k < n && (s.charAt(k) == '-' || s.charAt(k).isDigit)) {
                k += 1
                while (k < n && s.charAt(k).isDigit) k += 1
              }
              val param = s.substring(j, k)
              if (k < n && s.charAt(k) == ' ') k += 1 // delimiter space consumed
              word match {
                case "par" | "line" => emit('\n')
                case "tab" => emit('\t')
                case "u" =>
                  emitStr(new String(Character.toChars(
                    ((param.toInt % 65536) + 65536) % 65536)))
                  // consume ONE fallback char (\uc1 convention)
                  if (k < n && s.charAt(k) != '\\' && s.charAt(k) != '{' && s.charAt(k) != '}') k += 1
                case w if skipDestinations.contains(w) && skipDepth == 0 =>
                  skipDepth = depth // this group is a destination: discard
                case _ => () // formatting word: no text
              }
              i = k
            case _ => i += 2 // \<nonletter>: ignore
          }
        case '\r' | '\n' => i += 1 // source line breaks are not text
        case c => emit(c); i += 1
      }
    }
    // trailing \par is a separator, not an empty final line
    if (out.nonEmpty && out.charAt(out.length - 1) == '\n') out.setLength(out.length - 1)
    out.toString
  }
}

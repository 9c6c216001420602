package graft.extract.html

/** Streaming single-pass HTML tokenizer (north_star: "a streaming HTML
  * tokenizer builds a lightweight DOM"). No regex over the whole document;
  * one forward scan with raw-text modes for script/style/title/textarea.
  * Lenient in the browser spirit: bogus comments, unquoted attributes,
  * stray `</`, unterminated constructs all degrade gracefully.
  *
  * Replaces the reference's delegation of HTML understanding to LibreOffice
  * (/root/reference/src/converters/document_converters.py:100-111) with a
  * pure-JVM kernel usable inside Dataset.mapPartitions.
  */
object HtmlTokenizer {

  sealed trait Tok
  /** `text` has character references already decoded (except raw-text). */
  final case class Text(text: String, raw: Boolean) extends Tok
  final case class StartTag(name: String, attrs: List[(String, String)], selfClosing: Boolean) extends Tok
  final case class EndTag(name: String) extends Tok

  /** Elements whose content is raw text up to the matching close tag. */
  private val rawTextTags = Set("script", "style", "textarea", "title", "xmp")

  def tokenize(s: String): Iterator[Tok] = new Iterator[Tok] {
    private var i = 0
    private val n = s.length
    /** When set, we are inside a raw-text element awaiting `</name`. */
    private var rawEnd: String = null
    private var pending: Tok = null

    advance()

    override def hasNext: Boolean = pending != null
    override def next(): Tok = { val t = pending; advance(); t }

    private def isNameStart(c: Char) =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    private def isNameChar(c: Char) =
      isNameStart(c) || (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':'

    private def advance(): Unit = {
      pending = null
      while (pending == null && i < n) {
        if (rawEnd != null) emitRawText()
        else if (s.charAt(i) == '<') emitMarkup()
        else emitText()
      }
    }

    /** Raw-text content up to `</name` (case-insensitive). */
    private def emitRawText(): Unit = {
      val close = "</" + rawEnd
      var j = indexOfIgnoreCase(close, i)
      if (j < 0) j = n
      if (j > i) { pending = Text(s.substring(i, j), raw = true); i = j }
      else { // at the close tag itself
        i = j + close.length
        while (i < n && s.charAt(i) != '>') i += 1
        if (i < n) i += 1
        pending = EndTag(rawEnd)
        rawEnd = null
      }
    }

    private def indexOfIgnoreCase(needle: String, from: Int): Int = {
      var k = from
      val m = needle.length
      while (k <= n - m) {
        var p = 0
        while (p < m && Character.toLowerCase(s.charAt(k + p)) == needle.charAt(p)) p += 1
        if (p == m) return k
        k += 1
      }
      -1
    }

    private def emitText(): Unit = {
      var j = s.indexOf('<', i)
      if (j < 0) j = n
      pending = Text(Entities.decode(s.substring(i, j)), raw = false)
      i = j
    }

    private def emitMarkup(): Unit = {
      // s(i) == '<'
      if (i + 1 >= n) { pending = Text("<", raw = false); i = n; return }
      val c = s.charAt(i + 1)
      if (c == '!') skipDeclaration()
      else if (c == '?') skipUntilGt(i + 2) // processing instruction / bogus
      else if (c == '/') {
        if (i + 2 < n && isNameStart(s.charAt(i + 2))) parseEndTag()
        else skipUntilGt(i + 2) // bogus comment per spec
      } else if (isNameStart(c)) parseStartTag()
      else { pending = Text("<", raw = false); i += 1 } // literal '<'
    }

    private def skipDeclaration(): Unit = {
      if (s.startsWith("<!--", i)) {
        val j = s.indexOf("-->", i + 4)
        i = if (j < 0) n else j + 3
      } else if (s.startsWith("<![CDATA[", i)) {
        val j = s.indexOf("]]>", i + 9)
        i = if (j < 0) n else j + 3
      } else skipUntilGt(i + 2) // <!DOCTYPE ...> and other declarations
    }

    private def skipUntilGt(from: Int): Unit = {
      var j = s.indexOf('>', from)
      i = if (j < 0) n else j + 1
    }

    private def parseEndTag(): Unit = {
      var j = i + 2
      val start = j
      while (j < n && isNameChar(s.charAt(j))) j += 1
      val name = s.substring(start, j).toLowerCase
      while (j < n && s.charAt(j) != '>') j += 1
      i = if (j < n) j + 1 else n
      pending = EndTag(name)
    }

    private def parseStartTag(): Unit = {
      var j = i + 1
      val start = j
      while (j < n && isNameChar(s.charAt(j))) j += 1
      val name = s.substring(start, j).toLowerCase
      var attrs = List.newBuilder[(String, String)]
      var selfClosing = false
      var done = false
      while (!done && j < n) {
        while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
        if (j >= n) done = true
        else s.charAt(j) match {
          case '>' => j += 1; done = true
          case '/' =>
            if (j + 1 < n && s.charAt(j + 1) == '>') { selfClosing = true; j += 2; done = true }
            else j += 1
          case _ =>
            // attribute name
            val as = j
            while (j < n && !Character.isWhitespace(s.charAt(j)) &&
                   s.charAt(j) != '=' && s.charAt(j) != '>' && s.charAt(j) != '/') j += 1
            val aname = s.substring(as, j).toLowerCase
            while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
            var avalue = ""
            if (j < n && s.charAt(j) == '=') {
              j += 1
              while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
              if (j < n && (s.charAt(j) == '"' || s.charAt(j) == '\'')) {
                val q = s.charAt(j); j += 1
                val vs = j
                while (j < n && s.charAt(j) != q) j += 1
                avalue = s.substring(vs, j)
                if (j < n) j += 1
              } else { // unquoted value
                val vs = j
                while (j < n && !Character.isWhitespace(s.charAt(j)) && s.charAt(j) != '>') j += 1
                avalue = s.substring(vs, j)
              }
            }
            if (aname.nonEmpty) attrs += (aname -> Entities.decode(avalue))
        }
      }
      i = j
      if (!selfClosing && rawTextTags.contains(name)) rawEnd = name
      pending = StartTag(name, attrs.result(), selfClosing)
    }
  }
}

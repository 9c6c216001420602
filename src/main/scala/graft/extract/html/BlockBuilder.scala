package graft.extract.html

import scala.collection.mutable

/** A block of visible text with the two Boilerpipe shallow-text features:
  * word count and link density (anchored words / words). */
final case class TextBlock(text: String, numWords: Int, linkedWords: Int) {
  def linkDensity: Double = if (numWords == 0) 0.0 else linkedWords.toDouble / numWords
}

/** Lightweight DOM pass: folds the token stream into a flat sequence of
  * text blocks delimited by block-level elements, skipping non-content
  * subtrees (script/style/nav/header/footer/aside/form/...) and tracking
  * anchor depth for link density.
  *
  * This is the "lightweight DOM" of the north_star — we never materialize a
  * tree; a stack of open ignored elements plus a current-block buffer is
  * sufficient for block segmentation.
  */
object BlockBuilder {

  /** Elements that delimit text blocks. */
  private val blockTags = Set(
    "p", "div", "section", "article", "main", "h1", "h2", "h3", "h4", "h5",
    "h6", "li", "ul", "ol", "table", "thead", "tbody", "tfoot", "tr", "td",
    "th", "blockquote", "pre", "br", "hr", "figure", "figcaption", "dl",
    "dt", "dd", "caption", "address", "center", "fieldset", "legend",
    "details", "summary", "body", "html")

  /** Subtrees that never contribute content text. `head` covers `title`
    * and `meta`; semantic HTML5 boilerplate containers are pruned here so
    * the density classifier only judges ambiguous blocks. */
  private val ignoredTags = Set(
    "script", "style", "noscript", "template", "iframe", "object", "embed",
    "svg", "math", "nav", "header", "footer", "aside", "form", "button",
    "select", "option", "textarea", "head", "title", "xmp")

  /** Void elements — never pushed as open subtrees. */
  private val voidTags = Set(
    "br", "hr", "img", "input", "meta", "link", "embed", "area", "base",
    "col", "source", "track", "wbr")

  def build(toks: Iterator[HtmlTokenizer.Tok]): Vector[TextBlock] = {
    import HtmlTokenizer._
    val out = Vector.newBuilder[TextBlock]
    val ignoreStack = mutable.Stack[String]()
    var anchorDepth = 0
    val chars = new StringBuilder
    val flags = mutable.ArrayBuffer[Boolean]() // per-char: inside an anchor?

    def flush(): Unit = {
      if (chars.nonEmpty) {
        // Whitespace normalization: any run of whitespace (incl. NBSP) -> one
        // space; leading/trailing trimmed. Word linked iff any char linked.
        val sb = new java.lang.StringBuilder(chars.length)
        var words = 0; var linked = 0
        var inWord = false; var wordLinked = false
        var pendingSpace = false
        var k = 0
        while (k < chars.length) {
          val c = chars.charAt(k)
          val ws = Character.isWhitespace(c) || c == '\u00a0' || c == '\u200b' ||
            c == '\u00ad' || c == '\ufeff' || c == '\u2009' || c == '\u2002' || c == '\u2003'
          if (ws) {
            if (inWord) { words += 1; if (wordLinked) linked += 1 }
            inWord = false; wordLinked = false
            pendingSpace = sb.length() > 0
          } else {
            if (pendingSpace) { sb.append(' '); pendingSpace = false }
            if (!inWord) { inWord = true; wordLinked = false }
            if (flags(k)) wordLinked = true
            sb.append(c)
          }
          k += 1
        }
        if (inWord) { words += 1; if (wordLinked) linked += 1 }
        val text = sb.toString
        if (text.nonEmpty) out += TextBlock(text, words, linked)
      }
      chars.clear(); flags.clear()
    }

    while (toks.hasNext) {
      toks.next() match {
        case Text(t, raw) =>
          if (ignoreStack.isEmpty && !raw) {
            var k = 0
            while (k < t.length) { chars.append(t.charAt(k)); flags += (anchorDepth > 0); k += 1 }
          }
        case StartTag(name, _, selfClosing) =>
          if (blockTags.contains(name) || ignoredTags.contains(name)) flush()
          if (ignoredTags.contains(name) && !selfClosing && !voidTags.contains(name))
            ignoreStack.push(name)
          if (name == "a" && !selfClosing && ignoreStack.isEmpty) anchorDepth += 1
        case EndTag(name) =>
          if (ignoreStack.nonEmpty && ignoreStack.contains(name)) {
            while (ignoreStack.nonEmpty && ignoreStack.pop() != name) ()
          } else if (ignoreStack.isEmpty) {
            if (blockTags.contains(name) || ignoredTags.contains(name)) flush()
            if (name == "a") anchorDepth = math.max(0, anchorDepth - 1)
          }
      }
    }
    flush()
    out.result()
  }
}

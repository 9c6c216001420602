package graft.fixtures

/** Language-signal fixture layer for the langid oracle: the synthetic
  * documents all draw from one English-ish vocabulary, so their random
  * `lang` label carries no textual signal. This transform weaves each
  * language's characteristic function words THROUGH the text (every
  * `stride` content words, cycling the marker list) — the fixture-side
  * construction of a realistically mixed corpus, rather than a marker blob
  * prepended inside the query. The kernel under test
  * ([[graft.textops.LangId]]) sees interleaved function words exactly as
  * real prose distributes them.
  */
object LangMark {

  private val markers: Map[String, IndexedSeq[String]] = Map(
    "en" -> Vector("the", "of", "and", "to", "in", "is"),
    "fr" -> Vector("le", "la", "les", "des", "est", "dans"),
    "es" -> Vector("el", "los", "las", "una", "es", "por"),
    "de" -> Vector("der", "die", "das", "und", "ist", "nicht"),
    // zh is script-detected: ≥10% Han codepoints; 4-char markers keep the
    // ratio above threshold at stride 3 over ~6-char latin words
    "zh" -> Vector("文档内容", "数据系统", "处理过程", "分析结果"))

  /** Deterministic: marker i is `markers(lang)(i % len)`, inserted after
    * every `stride`-th word of the source text. */
  def mark(lang: String, text: String, stride: Int = 3): String = {
    val ms = markers.getOrElse(lang, markers("en"))
    val words = text.split(' ')
    val out = new StringBuilder(text.length + text.length / 2)
    var mi = 0
    var i = 0
    while (i < words.length) {
      if (i > 0) out.append(' ')
      out.append(words(i))
      if ((i + 1) % stride == 0) {
        out.append(' ').append(ms(mi % ms.length))
        mi += 1
      }
      i += 1
    }
    out.toString
  }
}

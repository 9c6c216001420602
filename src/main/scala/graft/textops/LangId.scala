package graft.textops

/** Heuristic language identification (training-data pipeline tier).
  *
  * Two deterministic signals, pure JVM, mapPartitions-friendly:
  *  1. script detection for CJK (any Han codepoint → zh);
  *  2. function-word + character-trigram profiles for the latin-script
  *     languages the corpus carries (en/fr/es/de), scored by weighted hits
  *     per token.
  * Total function: empty/unknown text → "und".
  */
object LangId {

  private val profiles: Map[String, (Set[String], Seq[String])] = Map(
    // lang -> (function words, characteristic char n-grams)
    "en" -> (Set("the", "and", "of", "to", "in", "is", "that", "it", "was",
      "for", "with", "as", "his", "her", "they", "this", "have", "from"),
      Seq("th", "ing", "ion", "wh", "ght")),
    "fr" -> (Set("le", "la", "les", "des", "une", "est", "dans", "pour",
      "que", "qui", "pas", "sur", "avec", "être", "ont", "aux", "du"),
      Seq("eau", "oux", "ç", "é", "è", "ment")),
    "es" -> (Set("el", "los", "las", "una", "es", "está", "por", "para",
      "con", "del", "se", "su", "como", "más", "pero", "muy"),
      Seq("ción", "ñ", "í", "ó", "ll", "qu")),
    "de" -> (Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "mit", "für", "auf", "sich", "dem", "den", "von", "zu", "im"),
      Seq("sch", "ung", "ß", "ä", "ö", "ü", "ich")))

  /** Score text against every profile; return (bestLang, bestScorePerMille).
    * Ties break alphabetically (deterministic). */
  def detect(text: String): (String, Int) = {
    if (text == null || text.isEmpty) return ("und", 0)
    // CJK script short-circuit
    var i = 0
    var han = 0
    val limit = math.min(text.length, 2000)
    while (i < limit) {
      val c = text.codePointAt(i)
      if ((c >= 0x4e00 && c <= 0x9fff) || (c >= 0x3400 && c <= 0x4dbf)) han += 1
      i += Character.charCount(c)
    }
    if (han * 10 >= limit) return ("zh", 1000)

    val lower = text.toLowerCase
    val words = lower.split("[^\\p{L}]+").filter(_.nonEmpty)
    if (words.isEmpty) return ("und", 0)
    val scores = profiles.toSeq.sortBy(_._1).map { case (lang, (fw, grams)) =>
      var s = 0
      var k = 0
      while (k < words.length) { if (fw.contains(words(k))) s += 3; k += 1 }
      grams.foreach { g =>
        var from = lower.indexOf(g)
        while (from >= 0) { s += 1; from = lower.indexOf(g, from + g.length) }
      }
      (lang, s * 1000 / math.max(words.length, 1))
    }
    // maxBy returns the first maximum; scores are lang-sorted, so ties break
    // alphabetically (deterministic)
    val best = scores.maxBy(_._2)
    if (best._2 == 0) ("und", 0) else best
  }
}

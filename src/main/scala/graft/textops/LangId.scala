package graft.textops

/** Heuristic language identification (training-data pipeline tier).
  *
  * Two deterministic signals, pure JVM, mapPartitions-friendly:
  *  1. script detection for CJK (≥10% Han codepoints → zh);
  *  2. function-word + character-gram profiles for the latin-script
  *     languages the corpus carries (en/fr/es/de), scored by weighted hits
  *     per token.
  *
  * Profile design for NATURAL prose (not synthetic markers): function words
  * shared between languages — de/que/la/en across the Romance pair, es/was/
  * in/so across es|de|en, des across fr|de — appear in EVERY profile that
  * uses them, so a shared hit raises those languages equally and the
  * decision rides on each language's distinctive words and grams
  * (ght/th/wh/oo for en, ç/é/è/à/eau/ment for fr, ñ/á/í/ía/ción for es,
  * ß/ä/ö/ü/sch/ung for de). The earlier profiles scored shared words to one
  * language only, which misclassified ordinary Spanish ("la heroica ciudad"
  * → fr) the moment real prose replaced woven markers.
  *
  * Total function: empty/unknown text → "und".
  */
object LangId {

  private val profiles: Map[String, (Set[String], Seq[String])] = Map(
    // lang -> (function words, characteristic char n-grams)
    "en" -> (Set("the", "and", "of", "to", "is", "that", "it", "for", "with",
      "as", "his", "her", "they", "this", "have", "from", "he", "she", "not",
      "but", "on", "at", "by", "all", "were", "when", "there", "been", "you",
      "had", "which", "their", "an", "or", "out", "up", "what", "who", "will",
      "about", "would", "my", "i",
      // shared with de ("in", "so", "was") and es ("no", "me", "a")
      "in", "so", "was", "no", "me", "a"),
      Seq("th", "ing", "wh", "ght", "oo")),
    "fr" -> (Set("le", "les", "un", "une", "est", "dans", "pour", "qui",
      "pas", "sur", "avec", "être", "ont", "aux", "du", "et", "il", "elle",
      "au", "ce", "cette", "sa", "ses", "ne", "plus", "par", "mais", "comme",
      "ou", "où", "nous", "vous", "je", "sont", "lui", "leur", "même", "fut",
      "était", "avait", "dont", "ainsi", "suis", "sans", "tout", "deux",
      // shared with es (equal boost -> distinctive signal decides)
      "de", "que", "la", "en", "y", "se", "son", "si", "me", "a",
      // shared with de
      "des"),
      Seq("eau", "oux", "ç", "é", "è", "à", "ê", "ment")),
    "es" -> (Set("el", "los", "las", "una", "está", "por", "para", "con",
      "del", "su", "sus", "como", "más", "pero", "muy", "al", "lo", "sin",
      "sobre", "cuando", "había", "era", "fue", "han", "ha", "mi", "yo",
      "ya", "esta", "este", "porque", "todo", "nada", "o",
      // shared with fr
      "de", "que", "la", "en", "y", "se", "son", "si", "le", "me", "a",
      // shared with en/de
      "no", "es", "un"),
      Seq("ñ", "á", "í", "ó", "ía", "ción")),
    "de" -> (Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "mit", "für", "auf", "sich", "dem", "den", "von", "zu", "im", "er",
      "sie", "aus", "bei", "nach", "wie", "hatte", "sein", "seine", "einer",
      "einem", "einen", "eines", "als", "dass", "denn", "wenn", "aber",
      "auch", "noch", "um", "durch", "über", "vor", "zum", "zur", "am",
      "oder", "nur", "man", "mir", "mich", "ich", "war", "seit",
      // shared with en / es / fr
      "in", "so", "was", "es", "an", "des"),
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

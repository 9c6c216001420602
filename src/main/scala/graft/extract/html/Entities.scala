package graft.extract.html

/** HTML character-reference decoding: numeric (`&#97;` / `&#x61;`) plus a
  * table of the common named entities. Unknown references are left literal
  * (lenient, browser-like). Strict on the trailing `;` — all fixtures use it.
  */
object Entities {

  private val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "hellip" -> "…", "mdash" -> "—",
    "ndash" -> "–", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "laquo" -> "«",
    "raquo" -> "»", "middot" -> "·", "bull" -> "•",
    "deg" -> "°", "plusmn" -> "±", "times" -> "×",
    "divide" -> "÷", "frac12" -> "½", "frac14" -> "¼",
    "sect" -> "§", "para" -> "¶", "euro" -> "€",
    "pound" -> "£", "yen" -> "¥", "cent" -> "¢",
    "agrave" -> "à", "aacute" -> "á", "acirc" -> "â",
    "auml" -> "ä", "aring" -> "å", "aelig" -> "æ",
    "ccedil" -> "ç", "egrave" -> "è", "eacute" -> "é",
    "ecirc" -> "ê", "euml" -> "ë", "igrave" -> "ì",
    "iacute" -> "í", "icirc" -> "î", "iuml" -> "ï",
    "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó",
    "ocirc" -> "ô", "ouml" -> "ö", "oslash" -> "ø",
    "ugrave" -> "ù", "uacute" -> "ú", "ucirc" -> "û",
    "uuml" -> "ü", "yacute" -> "ý", "szlig" -> "ß",
    "Agrave" -> "À", "Aacute" -> "Á", "Auml" -> "Ä",
    "Eacute" -> "É", "Ouml" -> "Ö", "Uuml" -> "Ü",
    "shy" -> "­", "ensp" -> " ", "emsp" -> " ",
    "thinsp" -> " ", "zwnj" -> "‌", "zwj" -> "‍")

  /** Decode all character references in `s`. */
  def decode(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    while (i >= 0 && i < s.length) {
      val semi = s.indexOf(';', i + 1)
      var replaced: String = null
      var end = -1
      if (semi > i && semi - i <= 32) {
        val body = s.substring(i + 1, semi)
        if (body.startsWith("#")) {
          val num = body.substring(1)
          val cp =
            try {
              if (num.length > 1 && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
                Integer.parseInt(num.substring(1), 16)
              else Integer.parseInt(num, 10)
            } catch { case _: NumberFormatException => -1 }
          if (cp >= 0 && cp <= 0x10ffff && Character.isValidCodePoint(cp)) {
            replaced = new String(Character.toChars(cp)); end = semi + 1
          }
        } else if (named.contains(body)) {
          replaced = named(body); end = semi + 1
        }
      }
      if (replaced != null) {
        sb.append(s, last, i).append(replaced)
        last = end
        i = s.indexOf('&', end)
      } else {
        i = s.indexOf('&', i + 1)
      }
    }
    sb.append(s, last, s.length)
    sb.toString
  }
}

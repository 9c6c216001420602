package graft.extract.cfb

import java.nio.charset.StandardCharsets

/** Legacy Microsoft Compound File Binary (CFB / OLE2) detection — the
  * container behind .doc/.xls/.ppt in the reference's input whitelist
  * (/root/reference/src/converters/document_converters.py:16-26). These
  * formats have no pure-JVM extraction kernel here (scope cut documented in
  * SURVEY §2.7 K2b); the dispatch contract is an EXPLICIT failure row. The
  * alternative — falling through to the html/txt sniff — "succeeds" with
  * mojibake, which at 10^12 documents silently poisons the training corpus;
  * a failure row is strictly better.
  */
object CfbSniffer {

  /** The 8-byte CFB signature D0 CF 11 E0 A1 B1 1A E1 ([MS-CFB] §2.2). */
  def isCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0xd0 && (bytes(1) & 0xff) == 0xcf &&
      (bytes(2) & 0xff) == 0x11 && (bytes(3) & 0xff) == 0xe0 &&
      (bytes(4) & 0xff) == 0xa1 && (bytes(5) & 0xff) == 0xb1 &&
      (bytes(6) & 0xff) == 0x1a && (bytes(7) & 0xff) == 0xe1

  /** Bound the classification scan — directory sectors of real Office files
    * sit within the first few MB; past that the generic "cfb" label is fine. */
  private val scanCap = 4 * 1024 * 1024

  private def utf16le(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_16LE)

  private val wordStream = utf16le("WordDocument")
  private val xlsStream = utf16le("Workbook")
  private val xlsStreamOld = utf16le("Book") ++ Array[Byte](0, 0) // trailing NUL: avoid matching "Workbook"
  private val pptStream = utf16le("PowerPoint Document")

  /** Classify a CFB payload as doc / xls / ppt by the characteristic
    * top-level stream name ("WordDocument", "Workbook"/"Book",
    * "PowerPoint Document"); "cfb" when none is found. Directory entries
    * store names verbatim UTF-16LE ([MS-CFB] §2.6.1), so a bounded byte scan
    * for the encoded name is exact on well-formed files without walking the
    * FAT chain. */
  def kindOf(bytes: Array[Byte]): String = {
    if (!isCfb(bytes)) return "cfb"
    val limit = math.min(bytes.length, scanCap)
    if (contains(bytes, limit, wordStream)) "doc"
    else if (contains(bytes, limit, xlsStream) || contains(bytes, limit, xlsStreamOld)) "xls"
    else if (contains(bytes, limit, pptStream)) "ppt"
    else "cfb"
  }

  private def contains(hay: Array[Byte], limit: Int, needle: Array[Byte]): Boolean = {
    val n = needle.length
    var i = 0
    val end = limit - n
    while (i <= end) {
      var j = 0
      while (j < n && hay(i + j) == needle(j)) j += 1
      if (j == n) return true
      i += 1
    }
    false
  }
}

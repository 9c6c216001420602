package graft.extract.cfb

/** Legacy Microsoft Compound File Binary (CFB / OLE2) detection — the
  * container behind .doc/.xls/.ppt/.pub in the reference's input whitelist
  * (/root/reference/src/converters/document_converters.py:16-26).
  * doc/xls/ppt route to their pure-JVM kernels (DocExtractor /
  * XlsExtractor / PptExtractor); pub and unrecognized containers yield an
  * EXPLICIT failure row. The alternative — falling through to the html/txt
  * sniff — "succeeds" with mojibake, which at 10^12 documents silently
  * poisons the training corpus; a failure row is strictly better.
  */
object CfbSniffer {

  /** The 8-byte CFB signature D0 CF 11 E0 A1 B1 1A E1 ([MS-CFB] §2.2). */
  def isCfb(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0xd0 && (bytes(1) & 0xff) == 0xcf &&
      (bytes(2) & 0xff) == 0x11 && (bytes(3) & 0xff) == 0xe0 &&
      (bytes(4) & 0xff) == 0xa1 && (bytes(5) & 0xff) == 0xb1 &&
      (bytes(6) & 0xff) == 0x1a && (bytes(7) & 0xff) == 0xe1

  /** Classify a CFB payload as doc / xls / ppt / pub by the characteristic
    * TOP-LEVEL directory entry ("WordDocument", "Workbook"/"Book",
    * "PowerPoint Document" streams; Publisher's "Quill" text storage);
    * "cfb" when none is found or the directory is unwalkable. Reading the
    * actual directory tree (not a byte scan) means stream names appearing
    * in CONTENT — or in an embedded OLE object's sub-storage — cannot
    * misdispatch the document. */
  def kindOf(bytes: Array[Byte]): String = {
    if (!isCfb(bytes)) return "cfb"
    try {
      val parser = new CfbParser(bytes)
      val names = parser.streamNames.toSet
      if (names.contains("WordDocument")) "doc"
      else if (names.contains("Workbook") || names.contains("Book")) "xls"
      else if (names.contains("PowerPoint Document")) "ppt"
      else if (parser.rootEntries.exists(e => e.entryType == 1 && e.name == "Quill")) "pub"
      else "cfb"
    } catch { case _: Throwable => "cfb" }
  }
}

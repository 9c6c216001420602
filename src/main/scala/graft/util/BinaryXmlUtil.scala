package graft.util

/** Little-endian primitive readers shared by the binary kernels (CFB
  * container, Word/Excel/PowerPoint records, BMP/WAV headers) — one copy,
  * so a bounds-handling fix lands everywhere. */
object LittleEndian {
  def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  def i32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  def i64(b: Array[Byte], i: Int): Long =
    (i32(b, i).toLong & 0xffffffffL) | (i32(b, i + 4).toLong << 32)
}

/** Minimal XML tag-attribute scanner shared by the XML-ish kernels
  * (ODF content scan, EPUB container/OPF). Double-quoted values only — the
  * form every in-scope producer emits. */
object XmlAttr {
  def attr(tag: String, name: String): Option[String] = {
    val k = name + "=\""
    val s = tag.indexOf(k)
    if (s < 0) None
    else {
      val e = tag.indexOf('"', s + k.length)
      if (e < 0) None else Some(tag.substring(s + k.length, e))
    }
  }
}

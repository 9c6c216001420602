package graft.extract.html

import java.nio.charset.{Charset, CharsetDecoder, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

/** Charset sniffing + decoding for web payloads.
  *
  * Precedence (documented, frozen for golden-fixture determinism — SURVEY §7.3):
  *   1. BOM (UTF-8 / UTF-16LE / UTF-16BE) — BOM bytes consumed;
  *   2. `charset=` in the first 1024 bytes (meta charset / http-equiv);
  *   3. strict UTF-8;
  *   4. ISO-8859-1 fallback (never fails).
  * A meta that lies (declares a charset under which the bytes don't decode)
  * falls through to steps 3-4. Mirrors is_binary probing by decode-attempt
  * in the reference (/root/reference/src/core/base_converter.py:80-87).
  */
object Charsets {

  def decode(bytes: Array[Byte]): String = {
    val n = bytes.length
    if (n >= 3 && bytes(0) == 0xef.toByte && bytes(1) == 0xbb.toByte && bytes(2) == 0xbf.toByte)
      return strict(bytes, 3, StandardCharsets.UTF_8)
        .getOrElse(new String(bytes, 3, n - 3, StandardCharsets.ISO_8859_1))
    if (n >= 2 && bytes(0) == 0xff.toByte && bytes(1) == 0xfe.toByte)
      return new String(bytes, 2, n - 2, StandardCharsets.UTF_16LE)
    if (n >= 2 && bytes(0) == 0xfe.toByte && bytes(1) == 0xff.toByte)
      return new String(bytes, 2, n - 2, StandardCharsets.UTF_16BE)

    sniffMetaCharset(bytes).foreach { cs =>
      // WHATWG rule: a meta-declared UTF-16 is treated as UTF-8 (a BOM-less
      // doc whose prelude is ASCII-readable cannot actually be UTF-16).
      val effective =
        if (cs.name.toLowerCase.startsWith("utf-16")) StandardCharsets.UTF_8 else cs
      strict(bytes, 0, effective) match {
        case Some(s) => return s
        case None => // declared charset lies; fall through
      }
    }
    strict(bytes, 0, StandardCharsets.UTF_8)
      .getOrElse(new String(bytes, StandardCharsets.ISO_8859_1))
  }

  /** Scan the ASCII-compatible prelude for `charset=...`. */
  def sniffMetaCharset(bytes: Array[Byte]): Option[Charset] = {
    val limit = math.min(bytes.length, 1024)
    val head = new String(bytes, 0, limit, StandardCharsets.ISO_8859_1).toLowerCase
    val k = head.indexOf("charset=")
    if (k < 0) return None
    var i = k + "charset=".length
    while (i < head.length && (head.charAt(i) == '"' || head.charAt(i) == '\'' || head.charAt(i) == ' ')) i += 1
    val start = i
    while (i < head.length && !"\"' ;/>".contains(head.charAt(i))) i += 1
    val name = head.substring(start, i).trim
    if (name.isEmpty) None
    else
      try Some(Charset.forName(name))
      catch { case _: Exception => None }
  }

  private def strict(bytes: Array[Byte], offset: Int, cs: Charset): Option[String] = {
    val dec: CharsetDecoder = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    try Some(dec.decode(ByteBuffer.wrap(bytes, offset, bytes.length - offset)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => None }
  }
}

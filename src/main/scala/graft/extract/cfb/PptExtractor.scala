package graft.extract.cfb

import java.nio.charset.Charset
import java.nio.charset.StandardCharsets

import graft.util.LittleEndian.{i32, u16}

/** PowerPoint 97-2003 binary (.ppt) → text kernel — a reference whitelist
  * input (/root/reference/src/converters/document_converters.py:16-26). The
  * "PowerPoint Document" stream is a record tree (u16 recVer/recInstance,
  * u16 recType, u32 recLen); containers (recVer 0xF) nest, atoms are
  * leaves. Text lives in TextCharsAtom (0x0FA0, UTF-16LE) and
  * TextBytesAtom (0x0FA8, cp1252); atoms are collected in stream order
  * (the authored slide order of the fixture writer — persist-directory
  * indirection for incrementally-saved files is out of scope), `\r`
  * separates paragraphs within an atom, atoms join by "\n".
  */
object PptExtractor {

  private val cp1252 = Charset.forName("windows-1252")

  private val TextCharsAtom = 0x0fa0
  private val TextBytesAtom = 0x0fa8

  def extract(bytes: Array[Byte]): String = {
    val cfb = new CfbParser(bytes)
    val ppt = cfb.stream("PowerPoint Document")
      .getOrElse(throw new IllegalArgumentException("CFB has no PowerPoint Document stream"))
    val out = Vector.newBuilder[String]
    var sawRecord = false

    def walk(at0: Int, end: Int): Unit = {
      var at = at0
      while (at + 8 <= end) {
        val verInst = u16(ppt, at)
        val recType = u16(ppt, at + 2)
        val len = i32(ppt, at + 4)
        require(len >= 0 && at + 8 + len <= end, s"PPT record $recType overruns stream")
        sawRecord = true
        val body = at + 8
        if ((verInst & 0xf) == 0xf) {
          walk(body, body + len) // container: descend
        } else if (recType == TextCharsAtom) {
          out += new String(ppt, body, len, StandardCharsets.UTF_16LE)
        } else if (recType == TextBytesAtom) {
          out += new String(ppt, body, len, cp1252)
        }
        at = body + len
      }
    }
    walk(0, ppt.length)
    require(sawRecord, "PowerPoint Document stream has no records")
    out.result()
      .map(_.stripSuffix("\r").split('\r').mkString("\n"))
      .filter(_.nonEmpty)
      .mkString("\n")
  }
}

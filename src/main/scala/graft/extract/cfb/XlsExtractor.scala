package graft.extract.cfb

import java.nio.charset.StandardCharsets

import graft.util.LittleEndian.{i32, i64, u16}

/** Excel 97-2003 binary (.xls, BIFF8) → text kernel — a reference whitelist
  * input (/root/reference/src/converters/document_converters.py:16-26). The
  * Workbook stream is a flat record sequence (u16 type, u16 length,
  * payload); text cells resolve through the shared string table:
  * SST (0x00FC) holds XLUnicodeRichExtendedStrings, LABELSST (0x00FD)
  * references them by index; NUMBER (0x0203) and RK (0x027E) carry
  * numerics. Cell grid semantics match the XLSX kernel: rows in order
  * joined by "\n", cells within a row by "\t" in column order.
  *
  * Scope (pinned by the fixture writer): single-sheet streams whose SST
  * fits one record (no Continue-record string splits — those appear only
  * past 8 KB of shared strings).
  */
object XlsExtractor {

  def extract(bytes: Array[Byte]): String = {
    val cfb = new CfbParser(bytes)
    val wb = cfb.stream("Workbook").orElse(cfb.stream("Book"))
      .getOrElse(throw new IllegalArgumentException("CFB has no Workbook stream"))
    var sst: IndexedSeq[String] = IndexedSeq.empty
    val cells = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, String)]
    var at = 0
    var sawBof = false
    while (at + 4 <= wb.length) {
      val recType = u16(wb, at)
      val len = u16(wb, at + 2)
      val body = at + 4
      require(body + len <= wb.length, s"BIFF record $recType overruns stream")
      recType match {
        case 0x0809 => sawBof = true
        case 0x00fc => sst = parseSst(wb, body, len)
        case 0x00fd => // LABELSST: row, col, ixfe, isst
          val isst = i32(wb, body + 6)
          require(isst >= 0 && isst < sst.length, s"SST index $isst out of range")
          cells += ((u16(wb, body), u16(wb, body + 2), sst(isst)))
        case 0x0203 => // NUMBER: row, col, ixfe, Xnum (f64)
          cells += ((u16(wb, body), u16(wb, body + 2),
            formatNum(java.lang.Double.longBitsToDouble(i64(wb, body + 6)))))
        case 0x027e => // RK: row, col, ixfe, RkNumber
          cells += ((u16(wb, body), u16(wb, body + 2), formatNum(rkValue(i32(wb, body + 6)))))
        case _ => ()
      }
      at = body + len
    }
    require(sawBof, "stream has no BOF record — not BIFF")
    cells.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rowCells) =>
        rowCells.sortBy(_._2).map(_._3).mkString("\t")
      }
      .mkString("\n")
  }

  /** SST payload: cstTotal, cstUnique, then XLUnicodeRichExtendedStrings
    * (cch u16; flags u8: 0x01 fHighByte, 0x04 fExtSt, 0x08 fRichSt;
    * optional cRun/cbExtRst; chars as Latin-1-compressed or UTF-16LE;
    * trailing run/ext payloads skipped). */
  private def parseSst(b: Array[Byte], body: Int, len: Int): IndexedSeq[String] = {
    val unique = i32(b, body + 4)
    val out = IndexedSeq.newBuilder[String]
    var at = body + 8
    val end = body + len
    var k = 0
    while (k < unique) {
      require(at + 3 <= end, "SST truncated (Continue records are out of scope)")
      val cch = u16(b, at)
      val flags = b(at + 2) & 0xff
      at += 3
      val rich = (flags & 0x08) != 0
      val ext = (flags & 0x04) != 0
      val cRun = if (rich) { val v = u16(b, at); at += 2; v } else 0
      val cbExt = if (ext) { val v = i32(b, at); at += 4; v } else 0
      val wide = (flags & 0x01) != 0
      val nBytes = if (wide) cch * 2 else cch
      require(at + nBytes <= end, "SST string overruns record")
      out += (if (wide) new String(b, at, nBytes, StandardCharsets.UTF_16LE)
              else new String(b, at, nBytes, StandardCharsets.ISO_8859_1))
      at += nBytes + cRun * 4 + cbExt
      k += 1
    }
    out.result()
  }

  /** RkNumber: bit0 fX100 (value /100), bit1 fInt (30-bit signed int,
    * else the top 30 bits are the high bits of an IEEE double). */
  private def rkValue(rk: Int): Double = {
    val base =
      if ((rk & 0x2) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xfffffffcL) << 32)
    if ((rk & 0x1) != 0) base / 100.0 else base
  }

  /** Integral doubles print without a decimal point (the lexical form the
    * XLSX kernel reads from <v> for whole numbers). */
  private def formatNum(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString
}

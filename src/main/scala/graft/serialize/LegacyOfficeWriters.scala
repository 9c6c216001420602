package graft.serialize

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.{Charset, StandardCharsets}

/** Deterministic legacy binary Office generators (.doc/.xls/.ppt/.pub
  * inside CFB) — the reference whitelist's legacy formats
  * (/root/reference/src/converters/document_converters.py:16-26). Each
  * writer emits the minimal REAL structure its extractor parses: Word's
  * FIB + Clx/PlcPcd piece table, BIFF8's BOF/SST/LABELSST records,
  * PowerPoint's record tree with text atoms, and Publisher's Quill
  * chunk store.
  */
object LegacyOfficeWriters {

  private val cp1252 = Charset.forName("windows-1252")

  /** Word 97 .doc: piece-table text.
    * Variants: 0 — one cp1252 ("compressed") piece; 1 — one UTF-16LE piece;
    * 2 — text split across TWO pieces (compressed + unicode);
    * 3 — table stream named 0Table (fWhichTblStm = 0). */
  object DocWriter {
    val numVariants = 4

    def generate(paragraphs: Seq[String], variant: Int): Array[Byte] = {
      val text = paragraphs.mkString("\r") + "\r"
      val wants: Seq[(String, Boolean)] = variant match {
        case 1 => Seq((text, false))
        case 2 =>
          // never bisect a surrogate pair: lone halves encode as '?'
          var mid = text.length / 2
          if (mid > 0 && mid < text.length && Character.isLowSurrogate(text(mid))) mid -= 1
          Seq((text.take(mid), true), (text.drop(mid), false))
        case _ => Seq((text, true))
      }
      // a "compressed" piece can only hold cp1252-encodable chars
      val pieces = wants.map { case (t, comp) =>
        (t, comp && t.forall(c => c <= 0x7f || cp1252.newEncoder().canEncode(c)))
      }

      val textStart = 1024
      val encoded = pieces.map { case (t, comp) =>
        if (comp) t.getBytes(cp1252) else t.getBytes(StandardCharsets.UTF_16LE)
      }
      val word = new Array[Byte](textStart + encoded.map(_.length).sum)
      var off = textStart
      val fcFields = pieces.zip(encoded).map { case ((_, comp), data) =>
        val fc = if (comp) (off * 2) | 0x40000000 else off
        System.arraycopy(data, 0, word, off, data.length)
        off += data.length
        fc
      }

      // Clx at a small offset inside the table stream
      val clxOff = 16
      val n = pieces.length
      val lcbPlc = (n + 1) * 4 + n * 8
      val table = ByteBuffer.allocate(clxOff + 5 + lcbPlc).order(ByteOrder.LITTLE_ENDIAN)
      table.position(clxOff)
      table.put(0x02.toByte) // Pcdt
      table.putInt(lcbPlc)
      var cp = 0
      table.putInt(0)
      for ((t, _) <- pieces) { cp += t.length; table.putInt(cp) }
      for (fc <- fcFields) {
        table.putShort(0) // PCD flags
        table.putInt(fc)
        table.putShort(0) // prm
      }

      val fib = ByteBuffer.wrap(word).order(ByteOrder.LITTLE_ENDIAN)
      fib.putShort(0, 0xa5ec.toShort) // wIdent
      fib.putShort(2, 0x00c1.toShort) // nFib: Word97
      val whichTbl = if (variant == 3) 0 else 0x0200
      fib.putShort(0x000a, whichTbl.toShort)
      fib.putShort(32, 14) // csw
      fib.putShort(62, 22) // cslw
      fib.putInt(0x004c, cp) // ccpText
      fib.putShort(152, 93) // cbRgFcLcb (Word97)
      fib.putInt(0x01a2, clxOff)
      fib.putInt(0x01a6, 5 + lcbPlc)

      val tableName = if (variant == 3) "0Table" else "1Table"
      CfbWriter.write(Seq("WordDocument" -> word, tableName -> table.array()))
    }
  }

  /** Excel 97 .xls (BIFF8): BOF + SST (+Continue) + LABELSST cells + EOF.
    * Variants: 0 — one string cell per row (a paragraph each);
    * 1 — rows split into 4-word cells; 2 — UTF-16 ("wide") shared strings;
    * 3 — SST split across Continue records at a tiny 64-byte cap, so
    * strings straddle record boundaries with fresh option-flags bytes
    * (the [MS-XLS] continuation rule real Excel applies past 8 KB). */
  object XlsWriter {
    val numVariants = 4

    /** Real Excel's record-body cap; variant 3 shrinks it to force splits
      * on small fixtures. */
    private val biffBodyCap = 8224

    /** The variants whose extraction reproduces the source paragraphs
      * verbatim (variant 1 tab-splits rows) — the rotation the byte-identity
      * oracle, the corpus wheel, and the throughput probe all share. */
    val verbatimVariants: IndexedSeq[Int] = IndexedSeq(0, 2, 3)

    def rowsOf(paragraphs: Seq[String], variant: Int): Seq[Seq[String]] =
      if (variant == 1) paragraphs.map(_.split(' ').grouped(4).map(_.mkString(" ")).toSeq)
      else paragraphs.map(Seq(_))

    def expectedText(paragraphs: Seq[String], variant: Int): String =
      rowsOf(paragraphs, variant).map(_.mkString("\t")).mkString("\n")

    /** SST body segments under `cap`: segment 0 is the SST record, the rest
      * become Continue records. Splits only at character boundaries; a
      * continuation that resumes character data leads with a fresh
      * option-flags byte. */
    private def sstSegments(nCells: Int, strings: Seq[String], wide: Boolean,
                            cap: Int): Seq[Array[Byte]] = {
      val segs = scala.collection.mutable.ArrayBuffer(new java.io.ByteArrayOutputStream())
      def cur = segs.last
      def newSeg(): Unit = segs += new java.io.ByteArrayOutputStream()
      val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      head.putInt(nCells); head.putInt(strings.length)
      cur.write(head.array())
      for (s <- strings) {
        require(s.length <= 0xffff, s"SST string length ${s.length} exceeds u16 cch")
        val isWide = wide || s.exists(_ > 0xff)
        val width = if (isWide) 2 else 1
        if (cur.size + 3 + width > cap) newSeg() // header + >=1 char atomic
        val hb = ByteBuffer.allocate(3).order(ByteOrder.LITTLE_ENDIAN)
        hb.putShort(s.length.toShort); hb.put((if (isWide) 1 else 0).toByte)
        cur.write(hb.array())
        var idx = 0
        while (idx < s.length) {
          var avail = (cap - cur.size) / width
          if (avail == 0) {
            newSeg()
            cur.write(if (isWide) 1 else 0) // continuation option-flags byte
            avail = (cap - 1) / width
          }
          var take = math.min(avail, s.length - idx)
          // never bisect a surrogate pair across segments: lone halves
          // encode as '?' and silently corrupt the payload
          if (take > 0 && idx + take < s.length &&
              Character.isHighSurrogate(s.charAt(idx + take - 1))) take -= 1
          if (take == 0) {
            newSeg()
            cur.write(if (isWide) 1 else 0)
          } else {
            val chunk = s.substring(idx, idx + take)
            cur.write(if (isWide) chunk.getBytes(StandardCharsets.UTF_16LE)
                      else chunk.getBytes(StandardCharsets.ISO_8859_1))
            idx += take
          }
        }
      }
      segs.map(_.toByteArray).toSeq
    }

    def generate(paragraphs: Seq[String], variant: Int): Array[Byte] = {
      val rows = rowsOf(paragraphs, variant)
      val cells = for ((row, r) <- rows.zipWithIndex; (v, c) <- row.zipWithIndex)
        yield (r, c, v)
      val strings = cells.map(_._3).distinct
      val sstIndex = strings.zipWithIndex.toMap
      val wide = variant == 2
      val cap = if (variant == 3) 64 else biffBodyCap

      val out = new java.io.ByteArrayOutputStream()
      def rec(tpe: Int, body: Array[Byte]): Unit = {
        // BIFF record length is u16: the segmenter keeps bodies under the
        // cap, so overflow here is a writer bug — fail loudly
        require(body.length <= 0xffff, s"BIFF record body ${body.length} exceeds u16")
        val h = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        h.putShort(tpe.toShort); h.putShort(body.length.toShort)
        out.write(h.array()); out.write(body)
      }
      // BOF: BIFF8 workbook globals
      val bof = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      bof.putShort(0x0600.toShort); bof.putShort(0x0005.toShort)
      bof.putShort(0x0dbb.toShort); bof.putShort(0x07cc.toShort)
      rec(0x0809, bof.array())
      // SST + Continue tail
      val segs = sstSegments(cells.length, strings, wide, cap)
      rec(0x00fc, segs.head)
      segs.tail.foreach(rec(0x003c, _))
      // cells
      for ((r, c, v) <- cells) {
        val b = ByteBuffer.allocate(10).order(ByteOrder.LITTLE_ENDIAN)
        b.putShort(r.toShort); b.putShort(c.toShort); b.putShort(15)
        b.putInt(sstIndex(v))
        rec(0x00fd, b.array())
      }
      rec(0x000a, Array.emptyByteArray) // EOF
      CfbWriter.write(Seq("Workbook" -> out.toByteArray))
    }
  }

  /** Microsoft Publisher .pub: a CFB whose text lives in the Quill text
    * engine's store at the Quill/QuillSub/CONTENTS storage path. Publisher
    * has NO public specification; the layout written here follows
    * libmspub's published reverse engineering of the Quill stream
    * (MSPUBParser's Quill walk), simplified to the fields
    * [[graft.extract.cfb.PubExtractor]] consumes — the extractor follows
    * the TRANSMITTED chunk table, so a wild file whose layout drifts from
    * this shape fails as a named error row, never as mojibake.
    *
    * Quill CONTENTS stream layout (shared writer/extractor contract):
    * "CHNKINK " magic (8 bytes), reserved bytes to 0x18, then the
    * chunk-reference table: u16 reserved, u16 numChunks at 0x1A, and
    * numChunks 0x20-byte references {u32 0, tag(4 ASCII), u32 0, u16 id,
    * u16 0, tag(4, repeated), u32 offset, u32 byteLength, u32 0}. The
    * TEXT chunk carries the document text as UTF-16LE with Quill's \r
    * paragraph marks (trailing mark included); the STRS chunk carries the
    * text-block table: u32 nBlocks then cumulative char-end offsets.
    *
    * Variants: 0 — TEXT chunk only; 1 — TEXT + STRS (one block per
    * paragraph) + unknown chunks (STSH/FNTS) the parser must skip over;
    * 2 — STRS listed FIRST in the table with its data placed AFTER the
    * text and a pad gap, so only table-driven offset reads survive. */
  object PubWriter {
    val numVariants = 3

    private def chunkRef(tag: String, id: Int, offset: Int, length: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(0x20).order(ByteOrder.LITTLE_ENDIAN)
      val t = tag.getBytes(StandardCharsets.US_ASCII)
      require(t.length == 4, tag)
      b.putInt(0); b.put(t)
      b.putInt(0); b.putShort(id.toShort); b.putShort(0)
      b.put(t)
      b.putInt(offset); b.putInt(length); b.putInt(0)
      b.array()
    }

    /** The Quill CONTENTS stream bytes for `paragraphs`. */
    def quillContents(paragraphs: Seq[String], variant: Int): Array[Byte] = {
      val text = paragraphs.mkString("\r") + "\r"
      val textBytes = text.getBytes(StandardCharsets.UTF_16LE)
      val strsBytes = {
        val b = ByteBuffer.allocate(4 + paragraphs.length * 4)
          .order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(paragraphs.length)
        var cum = 0
        for (p <- paragraphs) { cum += p.length + 1; b.putInt(cum) } // +1: the \r mark
        b.array()
      }
      // (tableTag, dataTag, data) in TABLE order; data placement may differ
      val chunks: Seq[(String, Array[Byte])] = variant match {
        case 0 => Seq("TEXT" -> textBytes)
        case 1 => Seq(
          "TEXT" -> textBytes,
          "STRS" -> strsBytes,
          "STSH" -> Array.fill[Byte](12)(0x2a), // unknown: parser skips
          "FNTS" -> Array.fill[Byte](8)(0x11))
        case _ => Seq("STRS" -> strsBytes, "TEXT" -> textBytes)
      }
      val tableAt = 0x18
      val dataStart = tableAt + 4 + chunks.length * 0x20
      // variant 2 reverses data placement vs table order and pads the gap
      val dataOrder = if (variant == 2) chunks.reverse else chunks
      val pad = if (variant == 2) 16 else 0
      val offsets = scala.collection.mutable.Map.empty[String, Int]
      var at = dataStart
      for ((tag, data) <- dataOrder) {
        at += pad
        offsets(tag) = at
        at += data.length
      }
      val out = ByteBuffer.allocate(at).order(ByteOrder.LITTLE_ENDIAN)
      out.put("CHNKINK ".getBytes(StandardCharsets.US_ASCII))
      out.position(tableAt)
      out.putShort(0); out.putShort(chunks.length.toShort)
      for (((tag, data), i) <- chunks.zipWithIndex)
        out.put(chunkRef(tag, i + 1, offsets(tag), data.length))
      for ((tag, data) <- dataOrder) {
        out.position(offsets(tag))
        out.put(data)
      }
      out.array()
    }

    def generate(paragraphs: Seq[String], variant: Int): Array[Byte] =
      CfbWriter.writeTree(Seq(
        // the main-document stream real Publisher files carry at the root;
        // opaque to the text kernel (escher drawing data in the wild)
        CfbWriter.StreamNode("Contents", Array.fill[Byte](16)(0)),
        CfbWriter.StorageNode("Quill", Seq(
          CfbWriter.StorageNode("QuillSub", Seq(
            CfbWriter.StreamNode("CONTENTS", quillContents(paragraphs, variant))))))))
  }

  /** PowerPoint 97 .ppt: a Document container (recVer 0xF) of text atoms.
    * Variants: 0 — TextBytesAtom (cp1252) per slide paragraph;
    * 1 — TextCharsAtom (UTF-16LE) per paragraph;
    * 2 — ONE TextCharsAtom carrying all paragraphs `\r`-separated;
    * 3 — single-edit PERSISTED file: "Current User" stream →
    *     UserEditAtom → PersistDirectoryAtom → document container;
    * 4 — INCREMENTALLY-SAVED file: a STALE document container (marked
    *     text that must never surface) superseded by a second edit whose
    *     directory remaps the document id and adds a slide container
    *     (referenced via SlidePersistAtom) holding the last paragraph.
    *     Only persist-directory resolution reproduces the source; a naive
    *     stream-order walk emits the stale text too. */
  object PptWriter {
    val numVariants = 5

    private def atom(tpe: Int, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(0x0000); b.putShort(tpe.toShort); b.putInt(body.length)
      b.put(body)
      b.array()
    }

    private def container(tpe: Int, children: Seq[Array[Byte]]): Array[Byte] = {
      val bodyLen = children.map(_.length).sum
      val b = ByteBuffer.allocate(8 + bodyLen).order(ByteOrder.LITTLE_ENDIAN)
      b.putShort(0x000f) // container recVer
      b.putShort(tpe.toShort)
      b.putInt(bodyLen)
      children.foreach(b.put)
      b.array()
    }

    private def textAtoms(paragraphs: Seq[String], variant: Int): Seq[Array[Byte]] =
      variant match {
        case 1 => paragraphs.map(p => atom(0x0fa0, p.getBytes(StandardCharsets.UTF_16LE)))
        case 2 => Seq(atom(0x0fa0,
          paragraphs.mkString("\r").getBytes(StandardCharsets.UTF_16LE)))
        case _ => paragraphs.map { p =>
          // a bytes atom only holds cp1252-encodable text; else a chars atom
          if (p.forall(c => c <= 0x7f || cp1252.newEncoder().canEncode(c)))
            atom(0x0fa8, p.getBytes(cp1252))
          else atom(0x0fa0, p.getBytes(StandardCharsets.UTF_16LE))
        }
      }

    /** UserEditAtom ([MS-PPT] §2.3.3): 28-byte body. */
    private def userEditAtom(offsetLastEdit: Int, offsetPersistDirectory: Int,
                             docPersistIdRef: Int, persistIdSeed: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(28).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(256) // lastSlideIdRef
      b.putShort(0); b.put(0.toByte); b.put(3.toByte) // version, minor, major
      b.putInt(offsetLastEdit)
      b.putInt(offsetPersistDirectory)
      b.putInt(docPersistIdRef)
      b.putInt(persistIdSeed)
      b.putShort(1); b.putShort(0) // lastView, unused
      atom(0x0ff5, b.array())
    }

    /** PersistDirectoryAtom: one run of consecutive ids per entry. */
    private def persistDirectoryAtom(entries: Seq[(Int, Int)]): Array[Byte] = {
      val b = ByteBuffer.allocate(entries.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      for ((id, off) <- entries) {
        b.putInt((1 << 20) | (id & 0xfffff)) // cPersist=1 run
        b.putInt(off)
      }
      atom(0x1772, b.array())
    }

    /** CurrentUserAtom for the "Current User" stream. */
    private def currentUserAtom(offsetToCurrentEdit: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(24).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(20) // size
      b.putInt(0xe391c05f) // headerToken: plaintext document
      b.putInt(offsetToCurrentEdit)
      b.putShort(0) // lenUserName
      b.putShort(0x03f4.toShort) // docFileVersion
      b.put(3.toByte); b.put(0.toByte) // major, minor
      b.putShort(0) // unused
      atom(0x0ff6, b.array())
    }

    def generate(paragraphs: Seq[String], variant: Int): Array[Byte] = variant match {
      case 3 =>
        // one edit: [doc][persistDir][userEdit]; directory {1 -> doc}
        val doc = container(0x03e8, textAtoms(paragraphs, 0))
        val pdOff = doc.length
        val pd = persistDirectoryAtom(Seq(1 -> 0))
        val editOff = pdOff + pd.length
        val edit = userEditAtom(0, pdOff, 1, 2)
        val stream = doc ++ pd ++ edit
        CfbWriter.write(Seq(
          "Current User" -> currentUserAtom(editOff),
          "PowerPoint Document" -> stream))
      case 4 =>
        // two edits: [staleDoc][pd1][edit1][liveDoc][slide][pd2][edit2].
        // pd2 remaps id 1 to the live doc and adds slide id 2; resolution
        // from the newest edit must never surface the stale text.
        val staleDoc = container(0x03e8,
          textAtoms(paragraphs.map("STALE DRAFT " + _).reverse, 0))
        val pd1Off = staleDoc.length
        val pd1 = persistDirectoryAtom(Seq(1 -> 0))
        val edit1Off = pd1Off + pd1.length
        val edit1 = userEditAtom(0, pd1Off, 1, 2)
        // live doc: all but the last paragraph inline + a SlidePersistAtom
        // pointing at the slide container that carries the last paragraph
        val slideRef = {
          val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
          b.putInt(2) // persistIdRef
          b.putInt(0); b.putInt(1); b.putInt(256); b.putInt(0)
          atom(0x03f3, b.array())
        }
        val liveDoc = container(0x03e8,
          textAtoms(paragraphs.dropRight(1), 0) :+ slideRef)
        val liveDocOff = edit1Off + edit1.length
        val slide = container(0x03ee, textAtoms(paragraphs.takeRight(1), 0))
        val slideOff = liveDocOff + liveDoc.length
        val pd2Off = slideOff + slide.length
        val pd2 = persistDirectoryAtom(Seq(1 -> liveDocOff, 2 -> slideOff))
        val edit2Off = pd2Off + pd2.length
        val edit2 = userEditAtom(edit1Off, pd2Off, 1, 3)
        val stream = staleDoc ++ pd1 ++ edit1 ++ liveDoc ++ slide ++ pd2 ++ edit2
        CfbWriter.write(Seq(
          "Current User" -> currentUserAtom(edit2Off),
          "PowerPoint Document" -> stream))
      case v =>
        val doc = container(0x03e8, textAtoms(paragraphs, v))
        CfbWriter.write(Seq("PowerPoint Document" -> doc))
    }
  }
}

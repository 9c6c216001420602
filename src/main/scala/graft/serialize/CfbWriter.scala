package graft.serialize

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Structurally-valid CFB (OLE2 compound file) generator — the container
  * behind the reference whitelist's legacy .doc/.xls/.ppt/.pub inputs
  * (/root/reference/src/converters/document_converters.py:16-26).
  * [[write]] produces a complete v3 file (512-byte sectors) with real
  * stream content: streams >= 4096 bytes go to regular FAT chains, smaller
  * ones into the root's mini stream with a mini FAT ([MS-CFB] §2.6.1), so
  * [[graft.extract.cfb.CfbParser]] exercises both paths. [[writeTree]]
  * additionally nests storages with their own member streams (Publisher's
  * Quill/QuillSub/CONTENTS shape). Directory sibling pointers use a flat
  * right-chain per storage level (fixture-grade; the engine's parser walks
  * the transmitted pointers).
  *
  * [[generate]] keeps the empty-stream marker files used by the dispatch
  * fixtures (classification without extractable content).
  */
object CfbWriter {

  /** Directory-tree node for [[writeTree]]. */
  sealed trait Node { def name: String }
  final case class StreamNode(name: String, data: Array[Byte]) extends Node
  final case class StorageNode(name: String, children: Seq[Node]) extends Node

  val streamNameOf: Map[String, String] = Map(
    "doc" -> "WordDocument",
    "xls" -> "Workbook",
    "ppt" -> "PowerPoint Document")

  private val FREESECT = 0xffffffff
  private val ENDOFCHAIN = 0xfffffffe
  private val FATSECT = 0xfffffffd
  private val NOSTREAM = 0xffffffff
  private val MINI = 64
  private val CUTOFF = 4096

  /** A CFB file whose directory names a `kind`-defining stream with NO
    * content; "pub" yields Publisher's shape (a top-level "Quill" text
    * STORAGE + empty "Contents" stream — no Quill/QuillSub/CONTENTS, so
    * the Publisher kernel fails it as a named error row); any other kind
    * string yields a bare container ("cfb"). */
  def generate(kind: String): Array[Byte] =
    if (kind == "pub")
      write(Seq("Contents" -> Array.emptyByteArray), storages = Seq("Quill"))
    else write(streamNameOf.get(kind).map(_ -> Array.emptyByteArray).toSeq)

  /** Flat container: top-level named streams plus optional EMPTY top-level
    * storage entries. Kept as the common writer surface; delegates to
    * [[writeTree]]. */
  def write(streams: Seq[(String, Array[Byte])], sectorShift: Int = 9,
            storages: Seq[String] = Seq.empty): Array[Byte] =
    writeTree(
      streams.map { case (n, d) => StreamNode(n, d) } ++
        storages.map(StorageNode(_, Seq.empty)),
      sectorShift)

  /** Full container for an arbitrary directory TREE. `sectorShift` 9 writes
    * the common v3 layout (512-byte sectors); 12 writes v4 (4096-byte
    * sectors, header zero-padded to one sector) — both parse paths are
    * exercised by LegacyOfficeSpec. Stream names may repeat across storage
    * levels (data placement is keyed by directory slot, not name). */
  def writeTree(topLevel: Seq[Node], sectorShift: Int = 9): Array[Byte] = {
    require(sectorShift == 9 || sectorShift == 12, s"sector shift $sectorShift")
    val S = 1 << sectorShift
    val major = if (sectorShift == 9) 3 else 4
    def sectorsOf(n: Int, unit: Int): Int = (n + unit - 1) / unit

    // ---- directory slots: preorder placement, right-chained siblings ----
    final case class Slot(name: String, tpe: Int, data: Array[Byte],
                          var child: Int, var right: Int)
    val slots = scala.collection.mutable.ArrayBuffer[Slot]()
    slots += Slot("Root Entry", 5, Array.emptyByteArray, NOSTREAM, NOSTREAM)
    def place(nodes: Seq[Node]): Int = {
      if (nodes.isEmpty) return NOSTREAM
      val idxs = nodes.map {
        case StreamNode(n, d) =>
          val i = slots.length; slots += Slot(n, 2, d, NOSTREAM, NOSTREAM); i
        case StorageNode(n, cs) =>
          val i = slots.length; slots += Slot(n, 1, Array.emptyByteArray, NOSTREAM, NOSTREAM)
          slots(i).child = place(cs)
          i
      }
      idxs.sliding(2).foreach {
        case Seq(a, b) => slots(a).right = b
        case _ => ()
      }
      idxs.head
    }
    slots(0).child = place(topLevel)
    val streamSlots: Seq[(Int, Array[Byte])] =
      slots.zipWithIndex.collect { case (s, i) if s.tpe == 2 => (i, s.data) }.toSeq

    // ---- mini stream layout (small streams, 64-byte mini sectors) ----
    val small = streamSlots.filter(_._2.length < CUTOFF)
    val large = streamSlots.filter(_._2.length >= CUTOFF)
    val miniStarts = scala.collection.mutable.Map.empty[Int, Int]
    var miniSectors = 0
    for ((idx, data) <- small) {
      miniStarts(idx) = if (data.isEmpty) ENDOFCHAIN else miniSectors
      miniSectors += sectorsOf(data.length, MINI)
    }
    val miniBytes = new Array[Byte](miniSectors * MINI)
    var mo = 0
    for ((_, data) <- small) {
      System.arraycopy(data, 0, miniBytes, mo, data.length)
      mo += sectorsOf(data.length, MINI) * MINI
    }
    // mini FAT: consecutive chains
    val miniFat = ByteBuffer.allocate(sectorsOf(miniSectors * 4, S) * S max 0)
      .order(ByteOrder.LITTLE_ENDIAN)
    for ((_, data) <- small; k <- 0 until sectorsOf(data.length, MINI)) {
      val isLast = k == sectorsOf(data.length, MINI) - 1
      miniFat.putInt(if (isLast) ENDOFCHAIN else miniFat.position() / 4 + 1)
    }
    while (miniFat.position() < miniFat.capacity()) miniFat.putInt(FREESECT)

    // ---- directory sizing ----
    val dirEntryCount = slots.length
    val dirSectors = sectorsOf(dirEntryCount * 128, S)

    // ---- regular sector plan: [FAT][dir][miniFAT][miniStream][large...] ----
    val miniFatSectors = if (miniSectors == 0) 0 else sectorsOf(miniSectors * 4, S)
    val miniDataSectors = sectorsOf(miniBytes.length, S)
    val largeSectors = large.map { case (_, d) => sectorsOf(d.length, S) }
    val dataSectors = dirSectors + miniFatSectors + miniDataSectors + largeSectors.sum
    var numFat = 1
    while (numFat * (S / 4) < numFat + dataSectors) numFat += 1

    val dirStart = numFat
    val miniFatStart = dirStart + dirSectors
    val miniDataStart = miniFatStart + miniFatSectors
    var next = miniDataStart + miniDataSectors
    val largeStarts = large.map { case (idx, d) =>
      val s = next; next += sectorsOf(d.length, S); idx -> s
    }.toMap
    val totalSectors = next

    val buf = ByteBuffer.allocate(S + totalSectors * S).order(ByteOrder.LITTLE_ENDIAN)
    // (S + n*S: sector 0 starts after ONE sector's worth of header — the
    // 512-byte header block is zero-padded to the sector size in v4)

    // ---- header ----
    buf.put(Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte))
    buf.position(24)
    buf.putShort(0x3e.toShort); buf.putShort(major.toShort)
    buf.putShort(0xfffe.toShort)
    buf.putShort(sectorShift.toShort); buf.putShort(6)
    buf.position(40)
    buf.putInt(if (major == 4) dirSectors else 0) // csectDir: 0 in v3
    buf.putInt(numFat)
    buf.putInt(dirStart)
    buf.position(56)
    buf.putInt(CUTOFF)
    buf.putInt(if (miniFatSectors == 0) ENDOFCHAIN else miniFatStart)
    buf.putInt(miniFatSectors)
    buf.putInt(ENDOFCHAIN); buf.putInt(0) // no DIFAT chain (<= 109 FAT sectors)
    require(numFat <= 109, "fixture files stay within the header DIFAT")
    for (k <- 0 until 109) buf.putInt(if (k < numFat) k else FREESECT)

    // ---- FAT ----
    def fatPut(sector: Int, value: Int): Unit = {
      buf.position(S + (sector / (S / 4)) * S + (sector % (S / 4)) * 4)
      buf.putInt(value)
    }
    for (s <- 0 until totalSectors) fatPut(s, FREESECT)
    for (s <- 0 until numFat) fatPut(s, FATSECT)
    def chain(start: Int, count: Int): Unit =
      for (k <- 0 until count) fatPut(start + k, if (k == count - 1) ENDOFCHAIN else start + k + 1)
    chain(dirStart, dirSectors)
    if (miniFatSectors > 0) chain(miniFatStart, miniFatSectors)
    if (miniDataSectors > 0) chain(miniDataStart, miniDataSectors)
    for ((idx, d) <- large) chain(largeStarts(idx), sectorsOf(d.length, S))

    // ---- directory entries ----
    def dirEntry(idx: Int, name: String, tpe: Int, child: Int, right: Int,
                 start: Int, size: Long): Unit = {
      val at = S + dirStart * S + idx * 128
      val u16name = name.getBytes(StandardCharsets.UTF_16LE)
      require(u16name.length <= 62, name)
      buf.position(at)
      buf.put(u16name)
      buf.position(at + 64)
      buf.putShort((u16name.length + 2).toShort)
      buf.put(tpe.toByte)
      buf.put(1.toByte) // black
      buf.putInt(NOSTREAM) // left
      buf.putInt(right)
      buf.putInt(child)
      buf.position(at + 116)
      buf.putInt(start)
      buf.putInt(size.toInt)
    }
    dirEntry(0, "Root Entry", tpe = 5, child = slots(0).child, right = NOSTREAM,
      start = if (miniDataSectors == 0) ENDOFCHAIN else miniDataStart,
      size = miniBytes.length.toLong)
    for (idx <- 1 until slots.length) {
      val s = slots(idx)
      val start =
        if (s.tpe != 2) 0
        else if (s.data.length >= CUTOFF) largeStarts(idx)
        else miniStarts(idx)
      dirEntry(idx, s.name, s.tpe, child = s.child, right = s.right,
        start = start, size = if (s.tpe == 2) s.data.length.toLong else 0L)
    }

    // ---- payload sectors ----
    if (miniFatSectors > 0) {
      buf.position(S + miniFatStart * S)
      buf.put(miniFat.array(), 0, miniFatSectors * S)
    }
    if (miniDataSectors > 0) {
      buf.position(S + miniDataStart * S)
      buf.put(miniBytes)
    }
    for ((idx, d) <- large) {
      buf.position(S + largeStarts(idx) * S)
      buf.put(d)
    }
    buf.array()
  }
}

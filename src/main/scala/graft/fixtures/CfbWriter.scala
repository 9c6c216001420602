package graft.fixtures

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Minimal structurally-valid CFB (OLE2 compound file) generator — the
  * container behind the reference whitelist's legacy .doc/.xls/.ppt inputs
  * (/root/reference/src/converters/document_converters.py:16-26). The
  * engine deliberately has NO kernel for these (SURVEY §2.7 K2b scope cut);
  * fixtures exist to prove the dispatch contract: CFB payloads must yield
  * explicit failure rows with the refined kind, never a mojibake success.
  *
  * Layout ([MS-CFB]): 512-byte header (magic, v3, 512-byte sectors),
  * sector 0 = FAT, sector 1 = directory with a Root Entry plus one named
  * stream entry (the kind-defining name: "WordDocument" / "Workbook" /
  * "PowerPoint Document").
  */
object CfbWriter {

  val streamNameOf: Map[String, String] = Map(
    "doc" -> "WordDocument",
    "xls" -> "Workbook",
    "ppt" -> "PowerPoint Document")

  private val FREESECT = 0xffffffff
  private val ENDOFCHAIN = 0xfffffffe
  private val FATSECT = 0xfffffffd

  /** A CFB file whose directory names a `kind`-defining stream; any other
    * kind string yields a bare container (classified "cfb"). */
  def generate(kind: String): Array[Byte] = {
    val buf = ByteBuffer.allocate(512 * 3).order(ByteOrder.LITTLE_ENDIAN)

    // ---- header (sector -1) ----
    buf.put(Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1).map(_.toByte))
    buf.position(24)
    buf.putShort(0x3e.toShort) // minor version
    buf.putShort(3)            // major version 3
    buf.putShort(0xfffe.toShort) // little-endian byte order mark
    buf.putShort(9)            // sector shift: 512-byte sectors
    buf.putShort(6)            // mini sector shift
    buf.position(44)
    buf.putInt(1)              // number of FAT sectors
    buf.putInt(1)              // first directory sector = sector 1
    buf.position(56)
    buf.putInt(4096)           // mini stream cutoff
    buf.putInt(ENDOFCHAIN)     // first mini FAT sector
    buf.putInt(0)              // number of mini FAT sectors
    buf.putInt(ENDOFCHAIN)     // first DIFAT sector
    buf.putInt(0)              // number of DIFAT sectors
    buf.putInt(0)              // DIFAT[0]: FAT lives in sector 0
    for (_ <- 1 until 109) buf.putInt(FREESECT)

    // ---- sector 0: the FAT ----
    buf.position(512)
    buf.putInt(FATSECT)        // sector 0 is the FAT itself
    buf.putInt(ENDOFCHAIN)     // sector 1 (directory) ends its chain
    for (_ <- 2 until 128) buf.putInt(FREESECT)

    // ---- sector 1: the directory ----
    writeDirEntry(buf, 1024, "Root Entry", entryType = 5, child = 1)
    streamNameOf.get(kind).foreach { name =>
      writeDirEntry(buf, 1024 + 128, name, entryType = 2, child = FREESECT)
    }
    buf.array()
  }

  private def writeDirEntry(buf: ByteBuffer, at: Int, name: String,
                            entryType: Int, child: Int): Unit = {
    val u16 = name.getBytes(StandardCharsets.UTF_16LE)
    require(u16.length <= 62, name)
    buf.position(at)
    buf.put(u16)
    buf.position(at + 64)
    buf.putShort((u16.length + 2).toShort) // name length incl. UTF-16 NUL
    buf.put(entryType.toByte)
    buf.put(1.toByte)                      // color: black
    buf.putInt(FREESECT)                   // left sibling
    buf.putInt(FREESECT)                   // right sibling
    buf.putInt(child)                      // child (root points at the stream)
    buf.position(at + 116)
    buf.putInt(ENDOFCHAIN)                 // start sector (stream is empty)
    buf.putInt(0)                          // stream size low
  }
}

package graft

/** Dev-only debug dump: decode each committed VP8 fixture and write raw
  * Y/U/V planes to /tmp/vp8_dbg for diffing against libwebp's planes
  * (scripts/dbg_vp8_diff.py). Not a test; invoked manually via
  * `sbt "Test/runMain graft.Vp8Debug"`. */
object Vp8Debug {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get("/tmp/vp8_dbg")
    java.nio.file.Files.createDirectories(dir)
    for (name <- graft.multimodal.WebpFixtures.lossyNames) {
      val bytes = graft.multimodal.WebpFixtures.bytes(name)
      val size = graft.util.LittleEndian.i32(bytes, 16)
      val f = graft.multimodal.Vp8Codec.decode(bytes, 20, size)
      java.nio.file.Files.write(dir.resolve(name + ".y"), f.y)
      java.nio.file.Files.write(dir.resolve(name + ".u"), f.u)
      java.nio.file.Files.write(dir.resolve(name + ".v"), f.v)
      println(s"$name ${f.width}x${f.height} dumped")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.{BufferedImage, IndexColorModel}
import javax.imageio.{ImageIO, ImageWriteParam}
import graft.multimodal.{ImageConvert, MediaCodecs}
import graft.multimodal.MediaCodecs.PixelBuf

/** Cross-pins the GIF and TIFF LZW codec pair against the JDK's own
  * INDEPENDENT ImageIO implementations, in BOTH directions. A paired
  * encoder+decoder can be self-consistently nonconforming (a shared
  * off-by-one round-trips perfectly while every real-world stream
  * desyncs — exactly the bug class this suite exists to block): the
  * GIF width-growth convention here was empirically wrong for every
  * giflib-encoded stream until pinned this way. Noise content forces
  * the LZW dictionary across the 511/1023/2047 width boundaries where
  * the conventions diverge.
  */
class ImageIoConformanceSpec extends AnyFunSuite {

  private def lcg(seed: Int, n: Int): Array[Byte] = {
    var s = seed & 0x7fffffff
    Array.fill(n) { s = (s * 1103515245 + 12345) & 0x7fffffff; ((s >> 16) & 0xff).toByte }
  }

  private def grayIcm: IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(i => i.toByte)
    new IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  private def writeImageIo(img: BufferedImage, fmt: String,
                           compression: String = null): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val w = ImageIO.getImageWritersByFormatName(fmt).next()
    w.setOutput(ios)
    val p = w.getDefaultWriteParam
    if (compression != null) {
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionType(compression)
    }
    w.write(null, new javax.imageio.IIOImage(img, null, null), p)
    w.dispose(); ios.close()
    out.toByteArray
  }

  test("ImageIO-written GIFs decode pixel-exactly (dictionary crosses width boundaries)") {
    for ((w, h, seed) <- Seq((64, 64, 7), (80, 50, 21), (17, 9, 3))) {
      val idx = lcg(seed, w * h)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayIcm)
      img.getRaster.setDataElements(0, 0, w, h, idx)
      val gif = writeImageIo(img, "gif")
      val sink = new PixelBuf
      val meta = MediaCodecs.decodeGif(gif, sink)
      assert(meta.width == w && meta.height == h, s"$w x $h geometry")
      var i = 0
      while (i < idx.length) {
        // compare through the palette: the writer may permute indices
        val want = img.getRGB(i % w, i / w) & 0xffffff
        val gi = sink.data(i) & 0xff
        val got = ((sink.palette(gi * 3) & 0xff) << 16) |
          ((sink.palette(gi * 3 + 1) & 0xff) << 8) | (sink.palette(gi * 3 + 2) & 0xff)
        assert(got == want, s"pixel $i of $w x $h seed $seed")
        i += 1
      }
    }
  }

  test("our GIF encoder's output reads back via ImageIO pixel-exactly") {
    for ((w, h, seed) <- Seq((64, 64, 11), (90, 40, 5), (6, 4, 1))) {
      val buf = new PixelBuf
      buf.init("P", w, h)
      System.arraycopy(lcg(seed, w * h), 0, buf.data, 0, w * h)
      buf.palette = Array.tabulate[Byte](768)(i => (i / 3).toByte) // gray ramp
      val gif = ImageConvert.encodeGif(buf)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(gif))
      assert(img != null, "ImageIO rejected our GIF outright")
      assert(img.getWidth == w && img.getHeight == h)
      var i = 0
      while (i < w * h) {
        val want = buf.data(i) & 0xff // gray ramp palette: rgb = index
        val got = img.getRGB(i % w, i / w) & 0xff
        assert(got == want, s"pixel $i of $w x $h seed $seed")
        i += 1
      }
    }
  }

  test("ImageIO-written LZW TIFFs decode pixel-exactly") {
    for ((w, h, seed) <- Seq((80, 60, 13), (40, 20, 29))) {
      val pix = lcg(seed, w * h)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      img.getRaster.setDataElements(0, 0, w, h, pix)
      val tif = writeImageIo(img, "tiff", compression = "LZW")
      val sink = new PixelBuf
      val meta = MediaCodecs.decodeTiff(tif, sink)
      assert(meta.width == w && meta.height == h && meta.mode == "L")
      assert(java.util.Arrays.equals(sink.data, pix), s"$w x $h seed $seed pixels")
    }
  }

  test("our LZW TIFF fixture stream reads back via ImageIO pixel-exactly") {
    // hand-wrap a noise strip through the fixture LZW encoder in a minimal
    // little-endian single-strip TIFF so the stream crosses the 511/1023
    // boundaries (the fixture generator's own content is constant rows,
    // which never grow the dictionary that far)
    val (w, h, seed) = (70, 50, 17)
    val pix = lcg(seed, w * h)
    val lzw = graft.fixtures.MediaFixtures.tiffLzwEncode(pix)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      u16(tag); u16(typ); u32(count); u32(value)
    }
    out.write('I'); out.write('I'); u16(42); u32(8 + lzw.length) // IFD after data
    out.write(lzw)
    val n = 8
    u16(n)
    entry(256, 3, 1, w)            // ImageWidth
    entry(257, 3, 1, h)            // ImageLength
    entry(258, 3, 1, 8)            // BitsPerSample
    entry(259, 3, 1, 5)            // Compression = LZW
    entry(262, 3, 1, 1)            // Photometric = BlackIsZero
    entry(273, 4, 1, 8)            // StripOffsets
    entry(277, 3, 1, 1)            // SamplesPerPixel
    entry(279, 4, 1, lzw.length)   // StripByteCounts
    u32(0)
    val tif = out.toByteArray
    val img = ImageIO.read(new java.io.ByteArrayInputStream(tif))
    assert(img != null, "ImageIO rejected our LZW TIFF outright")
    assert(img.getWidth == w && img.getHeight == h)
    var i = 0
    while (i < w * h) {
      // raster samples, not getRGB: gray TIFFs land in a linear-gray
      // colorspace whose getRGB applies an sRGB conversion
      assert(img.getRaster.getSample(i % w, i / w, 0) == (pix(i) & 0xff), s"pixel $i")
      i += 1
    }
    // and our own decoder agrees with both
    val sink = new PixelBuf
    MediaCodecs.decodeTiff(tif, sink)
    assert(java.util.Arrays.equals(sink.data, pix), "self-read of the same stream")
  }
}

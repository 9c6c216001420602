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

  test("GIF sub-rect first frame composites onto the logical-screen canvas") {
    // screen 8x6 bg-index 5, frame 4x3 at (2,1) — Pillow reports the SCREEN
    // size; the area outside the frame is the background color
    val (sw, sh, fw, fh, left, top, bg) = (8, 6, 4, 3, 2, 1, 5)
    val idx = Array.tabulate[Byte](fw * fh)(i => (10 + i).toByte)
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes); u16(sw); u16(sh)
    out.write(0xf7); out.write(bg); out.write(0) // 256-entry global table
    for (k <- 0 until 256) { out.write(k); out.write(k); out.write(k) }
    out.write(0x2c); u16(left); u16(top); u16(fw); u16(fh); out.write(0)
    out.write(8) // LZW min code size (our encoder's convention)
    val lzw = ImageConvert.gifLzwEncode(idx)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0); out.write(0x3b)
    val sink = new PixelBuf
    val meta = MediaCodecs.decodeGif(out.toByteArray, sink)
    assert(meta.width == sw && meta.height == sh, s"${meta.width}x${meta.height}")
    val frameSum = idx.map(_ & 0xff).sum.toLong
    assert(meta.pixelSum == frameSum + bg.toLong * (sw * sh - fw * fh))
    for (y <- 0 until sh; x <- 0 until sw) {
      val inFrame = x >= left && x < left + fw && y >= top && y < top + fh
      val want = if (inFrame) 10 + (y - top) * fw + (x - left) else bg
      assert((sink.data(y * sw + x) & 0xff) == want, s"($x,$y)")
    }
  }

  test("our V4 BI_BITFIELDS RGBA BMP carries real alpha to ImageIO") {
    val (w, h, seed) = (9, 7, 3)
    val buf = new PixelBuf
    buf.init("RGBA", w, h)
    System.arraycopy(lcg(seed, w * h * 4), 0, buf.data, 0, w * h * 4)
    val bmp = ImageConvert.encodeBmp(buf)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img != null, "ImageIO rejected the V4 BMP")
    assert(img.getColorModel.hasAlpha, "alpha mask not honored")
    var i = 0
    while (i < w * h) {
      val want = ((buf.data(i * 4 + 3) & 0xff) << 24) | ((buf.data(i * 4) & 0xff) << 16) |
        ((buf.data(i * 4 + 1) & 0xff) << 8) | (buf.data(i * 4 + 2) & 0xff)
      assert(img.getRGB(i % w, i / w) == want, s"ARGB pixel $i")
      i += 1
    }
  }

  test("32-bpp BI_RGB BMP is BGRX: mode RGB, padding byte dropped (Pillow parity)") {
    // hand-build the plain 40-byte-header layout our fixtures no longer use
    val (w, h) = (3, 2)
    val bb = java.nio.ByteBuffer.allocate(14 + 40 + w * h * 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(bb.capacity).putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(32).putInt(0) // BI_RGB
    bb.putInt(w * h * 4).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (i <- 0 until w * h) { // BGRX with a poisoned X byte
      bb.put((i * 3).toByte).put((i * 5).toByte).put((i * 7).toByte).put(0xee.toByte)
    }
    val sink = new PixelBuf
    val meta = MediaCodecs.decodeBmp(bb.array(), sink)
    assert(meta.mode == "RGB", meta.mode)
    assert(sink.mode == "RGB" && sink.data.length == w * h * 3)
    // bottom-up rows: file pixel i is raster row (h-1 - i/w)
    for (i <- 0 until w * h) {
      val ry = h - 1 - i / w
      val at = (ry * w + i % w) * 3
      assert((sink.data(at) & 0xff) == (i * 7 & 0xff), s"R $i")     // file B pos 2
      assert((sink.data(at + 1) & 0xff) == (i * 5 & 0xff), s"G $i")
      assert((sink.data(at + 2) & 0xff) == (i * 3 & 0xff), s"B $i")
    }
    // 0xEE padding contributes nothing to the sum
    val expected = (0 until w * h).map(i => (i * 3 & 0xff) + (i * 5 & 0xff) + (i * 7 & 0xff)).sum
    assert(meta.pixelSum == expected, s"${meta.pixelSum} != $expected")
  }

  /** Minimal little-endian single-strip TIFF around a pre-encoded strip. */
  private def miniTiff(w: Int, h: Int, spp: Int, strip: Array[Byte],
                       compression: Int, predictor: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      u16(tag); u16(typ); u32(count); u32(value)
    }
    out.write('I'); out.write('I'); u16(42)
    val bpsOffset = 8 + strip.length + 2 + 10 * 12 + 4 // after IFD, see below
    u32(8 + strip.length)
    out.write(strip)
    u16(10)
    entry(256, 3, 1, w)
    entry(257, 3, 1, h)
    if (spp == 1) entry(258, 3, 1, 8) else entry(258, 3, 3, bpsOffset)
    entry(259, 3, 1, compression)
    entry(262, 3, 1, if (spp == 3) 2 else 1)
    entry(273, 4, 1, 8)
    entry(277, 3, 1, spp)
    entry(279, 4, 1, strip.length)
    entry(284, 3, 1, 1)
    entry(317, 3, 1, predictor)
    u32(0)
    if (spp == 3) { u16(8); u16(8); u16(8) }
    out.toByteArray
  }

  test("predictor-2 (horizontal differencing) LZW TIFFs decode like ImageIO") {
    for ((w, h, spp, seed) <- Seq((60, 40, 1, 31), (30, 25, 3, 47))) {
      val pix = lcg(seed, w * h * spp)
      // difference each row per channel, then LZW the deltas — the layout
      // most libtiff/Pillow LZW writers emit by default
      val deltas = pix.clone()
      for (y <- 0 until h; x <- (w * spp - 1) to spp by -1)
        deltas(y * w * spp + x) = (pix(y * w * spp + x) - pix(y * w * spp + x - spp)).toByte
      val tif = miniTiff(w, h, spp,
        graft.fixtures.MediaFixtures.tiffLzwEncode(deltas), compression = 5, predictor = 2)
      // ground truth first: the independent JDK reader must see `pix`
      val img = ImageIO.read(new java.io.ByteArrayInputStream(tif))
      assert(img != null, "ImageIO rejected the predictor-2 TIFF")
      var i = 0
      while (i < w * h) {
        for (c <- 0 until spp)
          assert(img.getRaster.getSample(i % w, i / w, c) == (pix(i * spp + c) & 0xff),
            s"ImageIO pixel $i ch $c")
        i += 1
      }
      // and our decoder agrees
      val sink = new PixelBuf
      val meta = MediaCodecs.decodeTiff(tif, sink)
      assert(meta.width == w && meta.height == h)
      assert(java.util.Arrays.equals(sink.data, pix), s"$w x $h spp $spp pixels")
      // the sink-free path reports the same (un-differenced) pixel sum
      assert(MediaCodecs.decodeTiff(tif).pixelSum == meta.pixelSum)
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

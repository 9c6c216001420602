package graft

import org.scalatest.funsuite.AnyFunSuite
import java.awt.image.BufferedImage
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
import graft.multimodal.{AudioConvert, ImageConvert, JpegCodec, JpegEncoder, MediaCodecs}
import graft.multimodal.MediaCodecs.PixelBuf

/** Second half of the JDK cross-pinning (see ImageIoConformanceSpec for
  * GIF/TIFF/BMP): PNG both directions EXACT, baseline JPEG both
  * directions within the ±1-per-sample IDCT rounding latitude the JPEG
  * standard grants decoders, and WAV/AIFF/AU PCM both directions EXACT
  * via javax.sound — all guarding against the self-consistent-pair bug
  * class (shared encoder/decoder quirks that round-trip internally but
  * desync against the ecosystem).
  */
class JdkCodecConformanceSpec extends AnyFunSuite {

  private def lcg(seed: Int, n: Int): Array[Byte] = {
    var s = seed & 0x7fffffff
    Array.fill(n) { s = (s * 1103515245 + 12345) & 0x7fffffff; ((s >> 16) & 0xff).toByte }
  }

  test("ImageIO-written PNGs (gray + RGB, libpng-style filters) decode exactly") {
    for ((tpe, mode, ch) <- Seq(
      (BufferedImage.TYPE_BYTE_GRAY, "L", 1),
      (BufferedImage.TYPE_3BYTE_BGR, "RGB", 3))) {
      val (w, h) = (57, 43)
      val img = new BufferedImage(w, h, tpe)
      // a gradient+noise mix makes the encoder pick real filters per row;
      // samples set/compared per BAND (getRGB would colorspace-convert gray)
      val noise = lcg(9, w * h * ch)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        img.getRaster.setSample(x, y, c,
          ((noise((y * w + x) * ch + c) & 0x3f) + ((y * w + x) % 160)) & 0xff)
      val out = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      val sink = new PixelBuf
      val meta = MediaCodecs.decodePng(out.toByteArray, sink)
      assert(meta.width == w && meta.height == h && meta.mode == mode)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
        assert((sink.data(((y * w + x) * ch) + c) & 0xff) ==
          img.getRaster.getSample(x, y, c), s"$mode ($x,$y) ch $c")
    }
  }

  test("our PNGs (all five color types) read back via ImageIO exactly") {
    for (mode <- Seq("L", "LA", "P", "RGB", "RGBA")) {
      val (w, h) = (23, 17)
      val buf = new PixelBuf
      buf.init(mode, w, h)
      System.arraycopy(lcg(31, buf.data.length), 0, buf.data, 0, buf.data.length)
      if (mode == "P") buf.palette = Array.tabulate[Byte](768)(i => ((i * 11 + 5) % 256).toByte)
      val png = ImageConvert.encodePng(buf)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null, s"ImageIO rejected our $mode PNG")
      val ch = PixelBuf.channelsOf(mode)
      assert(img.getRaster.getNumBands == (if (mode == "P") 1 else ch), mode)
      // per-band raster compare (P compares indices; gray getRGB would
      // colorspace-convert). For P, additionally pin the palette via the
      // IndexColorModel-backed getRGB, which does NOT convert.
      for (y <- 0 until h; x <- 0 until w; c <- 0 until (if (mode == "P") 1 else ch))
        assert(img.getRaster.getSample(x, y, c) == (buf.data((y * w + x) * ch + c) & 0xff),
          s"$mode ($x,$y) ch $c")
      if (mode == "P") {
        val k = (buf.data(0) & 0xff) * 3
        val want = 0xff000000 | ((buf.palette(k) & 0xff) << 16) |
          ((buf.palette(k + 1) & 0xff) << 8) | (buf.palette(k + 2) & 0xff)
        assert(img.getRGB(0, 0) == want, "PLTE colors via IndexColorModel")
      }
    }
  }

  test("ImageIO-written baseline JPEGs decode within the standard's rounding latitude") {
    val (w, h) = (40, 24)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val smooth = Array.tabulate[Byte](w * h)(i => (((i % w) * 3 + (i / w) * 5) & 0xff).toByte)
    img.getRaster.setDataElements(0, 0, w, h, smooth)
    val out = new java.io.ByteArrayOutputStream()
    val wr = ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = ImageIO.createImageOutputStream(out)
    wr.setOutput(ios)
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.95f)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    wr.dispose(); ios.close()
    val sink = new PixelBuf
    val meta = JpegCodec.decode(out.toByteArray, sink)
    assert(meta.width == w && meta.height == h && meta.mode == "L")
    // both decoders ran the same coefficients; differences are IDCT
    // rounding only — the standard allows ±1, drift means desync
    val ref = ImageIO.read(new java.io.ByteArrayInputStream(out.toByteArray))
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs((sink.data(y * w + x) & 0xff) - ref.getRaster.getSample(x, y, 0))
      if (d > worst) worst = d
    }
    assert(worst <= 1, s"max per-sample divergence $worst exceeds the IDCT latitude")
  }

  test("our baseline JPEGs read back via ImageIO within the same latitude") {
    val (w, h) = (32, 32)
    val buf = new PixelBuf
    buf.init("L", w, h)
    for (i <- 0 until w * h) buf.data(i) = (((i % w) * 5 + (i / w) * 3) & 0xff).toByte
    val jpeg = JpegEncoder.encode(buf, 95)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
    assert(img != null, "ImageIO rejected our JPEG")
    val sink = new PixelBuf
    JpegCodec.decode(jpeg, sink)
    var worst = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs((sink.data(y * w + x) & 0xff) - img.getRaster.getSample(x, y, 0))
      if (d > worst) worst = d
    }
    assert(worst <= 1, s"max per-sample divergence $worst exceeds the IDCT latitude")
  }

  test("javax.sound-written WAV and AIFF PCM decode sample-exactly") {
    val rate = 8000f
    val n = 500
    val pcm = new Array[Byte](n * 2)
    val samples = Array.tabulate(n)(i => (i * 131 % 30000) - 15000)
    for (i <- 0 until n) { // little-endian i16
      pcm(i * 2) = (samples(i) & 0xff).toByte
      pcm(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    for ((fileType, fmt) <- Seq(
      (AudioFileFormat.Type.WAVE, new AudioFormat(rate, 16, 1, true, false)),
      (AudioFileFormat.Type.AIFF, new AudioFormat(rate, 16, 1, true, true)))) {
      val bytes =
        if (fmt.isBigEndian) { // AIFF carries big-endian PCM
          val be = new Array[Byte](pcm.length)
          for (i <- 0 until n) { be(i * 2) = pcm(i * 2 + 1); be(i * 2 + 1) = pcm(i * 2) }
          be
        } else pcm
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, fileType, out)
      val buf = AudioConvert.decodeSamples(out.toByteArray)
      assert(buf.channels == 1 && buf.frameRate == 8000 && buf.bits == 16, fileType.toString)
      assert(buf.samples.toSeq == samples.toSeq, s"$fileType samples")
    }
  }

  test("our WAV and AIFF encodes read back via javax.sound sample-exactly") {
    val samples = Array.tabulate(400)(i => (i * 977 % 20000) - 10000)
    for (aiff <- Seq(false, true)) {
      val bytes = if (aiff) MediaCodecs.encodeAiff(1, 8000, 16, samples)
                  else MediaCodecs.encodeWav(1, 8000, 16, samples)
      val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getChannels == 1 && fmt.getSampleRate == 8000f &&
        fmt.getSampleSizeInBits == 16, s"aiff=$aiff format $fmt")
      val raw = ais.readAllBytes()
      assert(raw.length == samples.length * 2, s"aiff=$aiff length")
      for (i <- samples.indices) {
        val v = if (fmt.isBigEndian) (raw(i * 2) << 8) | (raw(i * 2 + 1) & 0xff)
                else (raw(i * 2 + 1) << 8) | (raw(i * 2) & 0xff)
        assert(v == samples(i), s"aiff=$aiff sample $i")
      }
    }
  }
}

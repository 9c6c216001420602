package graft.multimodal

/** Real pure-JVM media codecs (no external media libraries needed): BMP and
  * binary PPM image headers+pixels, and WAV/RIFF PCM headers. These give the
  * multimodal tier genuinely decoded inputs — the reference decodes pixels
  * via Pillow (/root/reference/src/converters/image_converters.py:75-145)
  * and samples via pydub (/root/reference/src/converters/audio_converters.py:
  * 67-125); here the uncompressed container formats get real decoders while
  * compressed codecs stay behind the disclosed [[Multimodal.fakeDecode]]
  * stub.
  *
  * `pixelSum` is the sum of all decoded pixel channel bytes — it requires a
  * correct stride/padding walk (BMP rows pad to 4 bytes; a wrong stride
  * pulls zero padding bytes into the sum), so it doubles as decode proof.
  */
object MediaCodecs {

  import graft.util.LittleEndian.{i32, u16}

  final case class ImageMeta(format: String, width: Int, height: Int,
                             mode: String, pixelSum: Long)
  final case class WavMeta(channels: Int, frameRate: Int, bitsPerSample: Int,
                           dataBytes: Long, durationMs: Long)

  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'B' && b(1) == 'M'

  def isPpm(b: Array[Byte]): Boolean =
    b.length >= 3 && b(0) == 'P' && b(1) == '6' && Character.isWhitespace(b(2))

  def isWav(b: Array[Byte]): Boolean =
    b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** Uncompressed (BI_RGB) 8/24/32-bpp BMP; 8-bpp is palette mode "P",
    * 24 "RGB", 32 "RGBA" (the Pillow mode names the reference reports).
    * Negative stored height = top-down row order (handled; pixelSum is
    * row-order invariant but the walk honors |height|). */
  def decodeBmp(bytes: Array[Byte]): ImageMeta = {
    require(isBmp(bytes) && bytes.length >= 54, "not a BMP payload")
    val dataOffset = i32(bytes, 10)
    val width = i32(bytes, 18)
    val height = math.abs(i32(bytes, 22))
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    require(compression == 0, s"unsupported BMP compression $compression")
    require(width > 0 && height > 0, s"bad BMP geometry ${width}x$height")
    val mode = bpp match {
      case 8 => "P"
      case 24 => "RGB"
      case 32 => "RGBA"
      case o => throw new IllegalArgumentException(s"unsupported BMP bpp $o")
    }
    val rowBytes = width * (bpp / 8)
    val stride = (rowBytes + 3) & ~3
    require(dataOffset.toLong + stride.toLong * height <= bytes.length,
      "BMP pixel data truncated")
    var sum = 0L
    var y = 0
    while (y < height) {
      val row = dataOffset + y * stride
      var x = 0
      while (x < rowBytes) { sum += bytes(row + x) & 0xff; x += 1 }
      y += 1
    }
    ImageMeta("bmp", width, height, mode, sum)
  }

  /** Binary PPM (P6), maxval <= 255: always 3-channel RGB, no row padding. */
  def decodePpm(bytes: Array[Byte]): ImageMeta = {
    require(isPpm(bytes), "not a P6 PPM payload")
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        if (Character.isWhitespace(bytes(i))) i += 1
        else if (bytes(i) == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      require(i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9', "bad PPM header")
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    val width = readInt()
    val height = readInt()
    val maxval = readInt()
    require(maxval > 0 && maxval <= 255, s"unsupported PPM maxval $maxval")
    i += 1 // single whitespace byte after maxval, then raster
    val n = width.toLong * height * 3
    require(i + n <= bytes.length, "PPM raster truncated")
    var sum = 0L
    var k = i
    val end = i + n.toInt
    while (k < end) { sum += bytes(k) & 0xff; k += 1 }
    ImageMeta("ppm", width, height, "RGB", sum)
  }

  /** Dispatch by magic; None for formats without a real decoder here. */
  def decodeImage(bytes: Array[Byte]): Option[ImageMeta] =
    if (isBmp(bytes)) Some(decodeBmp(bytes))
    else if (isPpm(bytes)) Some(decodePpm(bytes))
    else None

  /** Canonical RIFF/WAVE PCM: walks chunks for `fmt ` and `data`;
    * duration_ms = floor(dataBytes * 1000 / byteRate) — the pydub
    * len(audio) contract (audio_converters.py:114). */
  def parseWav(bytes: Array[Byte]): WavMeta = {
    require(isWav(bytes), "not a RIFF/WAVE payload")
    var i = 12
    var channels = 0
    var rate = 0
    var bits = 0
    var byteRate = 0
    var dataBytes = -1L
    while (i + 8 <= bytes.length && (channels == 0 || dataBytes < 0)) {
      val id = new String(bytes, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = i32(bytes, i + 4)
      // a crafted/corrupt negative size would advance the cursor by <= 0 and
      // hang the executor task — fail contained instead (non-termination is
      // the one thing the per-row try/catch cannot contain)
      require(size >= 0, s"negative RIFF chunk size $size")
      if (id == "fmt " && i + 24 <= bytes.length) {
        val audioFormat = u16(bytes, i + 8)
        require(audioFormat == 1, s"unsupported WAV audio format $audioFormat (PCM only)")
        channels = u16(bytes, i + 10)
        rate = i32(bytes, i + 12)
        byteRate = i32(bytes, i + 16)
        bits = u16(bytes, i + 22)
      } else if (id == "data") {
        dataBytes = size.toLong & 0xffffffffL
      }
      i += 8 + size + (size & 1) // chunks are 2-byte aligned
    }
    require(channels > 0 && rate > 0 && byteRate > 0, "WAV has no fmt chunk")
    require(dataBytes >= 0, "WAV has no data chunk")
    WavMeta(channels, rate, bits, dataBytes, dataBytes * 1000L / byteRate)
  }
}

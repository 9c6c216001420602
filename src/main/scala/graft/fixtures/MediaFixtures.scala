package graft.fixtures

import java.nio.{ByteBuffer, ByteOrder}

/** Deterministic media payload generators for the real pure-JVM codecs
  * ([[graft.multimodal.MediaCodecs]]): BMP (8/24/32 bpp, BI_RGB), binary
  * PPM (P6), and canonical RIFF/WAVE PCM. Pixel bytes follow
  * `(seed + y) % 256` per image row y — the pixel-sum a correct decode must
  * report is `channels * width * Σ_y (seed + y) % 256`, which stays
  * SQL-recomputable (closed form when seed + height <= 256).
  */
object MediaFixtures {

  /** bpp ∈ {8, 24, 32}; topDown stores a negative height (row order flips
    * on disk, pixel content per image row y is unchanged). */
  def bmp(width: Int, height: Int, bpp: Int, seed: Int, topDown: Boolean = false): Array[Byte] = {
    require(Set(8, 24, 32)(bpp), s"bpp $bpp")
    val paletteSize = if (bpp == 8) 256 * 4 else 0
    val rowBytes = width * (bpp / 8)
    val stride = (rowBytes + 3) & ~3
    val dataOffset = 14 + 40 + paletteSize
    val buf = ByteBuffer.allocate(dataOffset + stride * height).order(ByteOrder.LITTLE_ENDIAN)
    // file header
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(buf.capacity())
    buf.putInt(0)
    buf.putInt(dataOffset)
    // BITMAPINFOHEADER
    buf.putInt(40)
    buf.putInt(width)
    buf.putInt(if (topDown) -height else height)
    buf.putShort(1) // planes
    buf.putShort(bpp.toShort)
    buf.putInt(0) // BI_RGB
    buf.putInt(stride * height)
    buf.putInt(2835).putInt(2835) // 72 dpi
    buf.putInt(if (bpp == 8) 256 else 0)
    buf.putInt(0)
    // grayscale palette for 8bpp
    if (bpp == 8) for (v <- 0 until 256) {
      buf.put(v.toByte).put(v.toByte).put(v.toByte).put(0.toByte)
    }
    // pixel rows: bottom-up unless topDown
    val rows = if (topDown) 0 until height else (height - 1) to 0 by -1
    for (y <- rows) {
      val v = ((seed + y) % 256).toByte
      for (_ <- 0 until rowBytes) buf.put(v)
      for (_ <- rowBytes until stride) buf.put(0.toByte)
    }
    buf.array()
  }

  def ppm(width: Int, height: Int, seed: Int): Array[Byte] = {
    val header = s"P6\n# graft fixture\n$width $height\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    var k = header.length
    while (y < height) {
      val v = ((seed + y) % 256).toByte
      var x = 0
      while (x < width * 3) { out(k) = v; k += 1; x += 1 }
      y += 1
    }
    out
  }

  /** 16-bit PCM, canonical 44-byte header + `frames` frames of deterministic
    * little-endian samples. */
  def wav(channels: Int, sampleRate: Int, frames: Int, seed: Int): Array[Byte] = {
    val dataBytes = frames * channels * 2
    val buf = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes)
    buf.putInt(36 + dataBytes)
    buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes)
    buf.putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort)  // block align
    buf.putShort(16)                      // bits per sample
    buf.put("data".getBytes)
    buf.putInt(dataBytes)
    var f = 0
    while (f < frames * channels) {
      buf.putShort((((seed + f) % 4096) - 2048).toShort)
      f += 1
    }
    buf.array()
  }
}

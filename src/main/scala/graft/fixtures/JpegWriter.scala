package graft.fixtures

import graft.multimodal.JpegCodec

/** Baseline-sequential JPEG writer (fixture side of
  * [[graft.multimodal.JpegCodec]]): real entropy coding — canonical Huffman
  * codes derived from the standard T.81 annex K tables (transmitted in DHT,
  * never assumed by the decoder), MSB-first bit packing with 0xFF00 byte
  * stuffing, zigzag run-length AC with ZRL and EOB, one's-complement
  * negative magnitude bits.
  *
  * [[generate]] emits band-constant grayscale content (every 8-row band is
  * the constant `(seed + band) % 256`): each 8x8 block is flat, so its DCT
  * has only the DC coefficient `8 * (v - 128)`, and with a flat quant table
  * of 8 the quantized DC is exactly `v - 128` — baseline JPEG round-trips
  * such content LOSSLESSLY, which is what makes a closed-form pixel-sum
  * oracle possible for a lossy format. [[fromCoeffs]] writes arbitrary
  * quantized coefficient blocks for coefficient-exact tests of the decoder's
  * AC entropy layer (runs, ZRL, negative extends) without IDCT involvement.
  */
object JpegWriter {

  private val QuantStep = 8

  /** Band-constant grayscale: rows `8b..8b+7` hold `(seed + b) % 256`.
    * Width/height need NOT be multiples of 8 — edge blocks are padded with
    * the same band value (flat blocks stay flat), and the decoder crops. */
  def generate(width: Int, height: Int, seed: Int): Array[Byte] = {
    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    val blocks = Array.tabulate(bx * by) { b =>
      val band = b / bx
      val v = (seed + band) % 256
      val coef = new Array[Int](64)
      coef(0) = v - 128 // quantized DC at step 8; AC all zero
      coef
    }
    fromCoeffs(width, height, blocks)
  }

  /** 3-component YCbCr 4:4:4 with the same band-constant luma and NEUTRAL
    * chroma (Cb=Cr=128 → level-shifted coefficients all zero): the color
    * transform collapses to R=G=B=Y exactly, so even the color path has a
    * closed-form sum of 3x the grayscale one. */
  def generateColor(width: Int, height: Int, seed: Int): Array[Byte] = {
    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    val blocks = Array.tabulate(bx * by * 3) { i =>
      val coef = new Array[Int](64)
      if (i % 3 == 0) { // Y plane; Cb/Cr stay all-zero (=128 after shift)
        val band = (i / 3) / bx
        coef(0) = (seed + band) % 256 - 128
      }
      coef
    }
    fromCoeffs(width, height, blocks, comps = 3)
  }

  /** Serialize QUANTIZED coefficient blocks (natural order; for `comps` > 1
    * interleaved one-block-per-component-per-MCU, row-major MCUs) into a
    * complete JFIF baseline stream with a flat quant table of 8 shared by
    * all components. */
  def fromCoeffs(width: Int, height: Int, blocks: Array[Array[Int]],
                 comps: Int = 1): Array[Byte] = {
    require(blocks.length == ((width + 7) / 8) * ((height + 7) / 8) * comps,
      s"${blocks.length} blocks for ${width}x$height x$comps")
    val out = new java.io.ByteArrayOutputStream()
    def u16be(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }

    marker(0xd8) // SOI
    marker(0xe0) // APP0 / JFIF
    u16be(16)
    out.write("JFIF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write(0)
    out.write(1); out.write(1) // version 1.1
    out.write(0) // no density units
    u16be(1); u16be(1)
    out.write(0); out.write(0) // no thumbnail

    marker(0xdb) // DQT, table 0, zigzag order (flat -> order-invariant)
    u16be(2 + 1 + 64)
    out.write(0x00)
    for (_ <- 0 until 64) out.write(QuantStep)

    marker(0xc0) // SOF0: 8-bit, no subsampling (4:4:4)
    u16be(2 + 6 + 3 * comps)
    out.write(8)
    u16be(height); u16be(width)
    out.write(comps)
    for (c <- 1 to comps) { out.write(c); out.write(0x11); out.write(0) }

    def dht(tcTh: Int, counts: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4)
      u16be(2 + 1 + 16 + vals.length)
      out.write(tcTh)
      counts.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0x00, JpegCodec.StdDcCounts, JpegCodec.StdDcVals)
    dht(0x10, JpegCodec.StdAcCounts, JpegCodec.StdAcVals)

    marker(0xda) // SOS: all components, each on DC 0 / AC 0
    u16be(2 + 1 + 2 * comps + 3)
    out.write(comps)
    for (c <- 1 to comps) { out.write(c); out.write(0x00) }
    out.write(0); out.write(63); out.write(0) // Ss/Se/AhAl

    // ---- entropy-coded segment
    val dcCodes = JpegCodec.encodeTable(JpegCodec.StdDcCounts, JpegCodec.StdDcVals)
    val acCodes = JpegCodec.encodeTable(JpegCodec.StdAcCounts, JpegCodec.StdAcVals)
    var bitBuf = 0
    var bitCnt = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        bitBuf = (bitBuf << 1) | ((v >>> i) & 1)
        bitCnt += 1
        if (bitCnt == 8) {
          out.write(bitBuf & 0xff)
          if ((bitBuf & 0xff) == 0xff) out.write(0x00) // byte stuffing
          bitBuf = 0; bitCnt = 0
        }
        i -= 1
      }
    }
    def putSymbol(codes: Map[Int, (Int, Int)], sym: Int): Unit = {
      val (code, len) = codes(sym)
      putBits(code, len)
    }
    def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))
    def putMagnitude(v: Int, cat: Int): Unit =
      if (cat > 0) putBits(if (v < 0) v + (1 << cat) - 1 else v, cat)

    val preds = new Array[Int](comps) // per-component DC predictors
    var bi = 0
    for (coef <- blocks) {
      val diff = coef(0) - preds(bi % comps)
      preds(bi % comps) = coef(0)
      bi += 1
      val cat = category(diff)
      require(cat <= 11, s"DC diff $diff out of baseline range")
      putSymbol(dcCodes, cat)
      putMagnitude(diff, cat)
      // AC in zigzag order with run-length coding
      var lastNonZero = 0
      var k = 63
      while (k >= 1 && lastNonZero == 0) {
        if (coef(JpegCodec.ZigZag(k)) != 0) lastNonZero = k
        k -= 1
      }
      var run = 0
      var z = 1
      while (z <= lastNonZero) {
        val v = coef(JpegCodec.ZigZag(z))
        if (v == 0) run += 1
        else {
          while (run >= 16) { putSymbol(acCodes, 0xf0); run -= 16 } // ZRL
          val c = category(v)
          require(c >= 1 && c <= 10, s"AC magnitude $v out of baseline range")
          putSymbol(acCodes, (run << 4) | c)
          putMagnitude(v, c)
          run = 0
        }
        z += 1
      }
      if (lastNonZero < 63) putSymbol(acCodes, 0x00) // EOB
    }
    if (bitCnt > 0) { // pad final byte with 1s
      bitBuf = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
      out.write(bitBuf & 0xff)
      if ((bitBuf & 0xff) == 0xff) out.write(0x00)
    }

    marker(0xd9) // EOI
    out.toByteArray
  }
}

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
    * the same band value (flat blocks stay flat), and the decoder crops.
    * `restartInterval` > 0 emits DRI + RSTn markers every that many MCUs. */
  def generate(width: Int, height: Int, seed: Int,
               restartInterval: Int = 0): Array[Byte] = {
    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    val blocks = Array.tabulate(bx * by) { b =>
      val band = b / bx
      val v = (seed + band) % 256
      val coef = new Array[Int](64)
      coef(0) = v - 128 // quantized DC at step 8; AC all zero
      coef
    }
    fromCoeffs(width, height, blocks, restartInterval = restartInterval)
  }

  /** 3-component YCbCr 4:4:4 with the same band-constant luma and NEUTRAL
    * chroma (Cb=Cr=128 → level-shifted coefficients all zero): the color
    * transform collapses to R=G=B=Y exactly, so even the color path has a
    * closed-form sum of 3x the grayscale one. */
  def generateColor(width: Int, height: Int, seed: Int,
                    restartInterval: Int = 0): Array[Byte] = {
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
    fromCoeffs(width, height, blocks, comps = 3, restartInterval = restartInterval)
  }

  /** 4:2:0 variant of [[generateColor]]: same band-constant luma content
    * (Y block row v of MCU-row m covers pixel rows 16m+8v.., i.e. band
    * 2m+v) and neutral chroma, so the decoded pixels — and the closed-form
    * sum — are identical to the 4:4:4 stream at the same (w, h, seed);
    * only the MCU layout ([Y0 Y1 Y2 Y3 Cb Cr]) differs. */
  def generateColor420(width: Int, height: Int, seed: Int,
                       restartInterval: Int = 0): Array[Byte] = {
    val mx = (width + 15) / 16
    val my = (height + 15) / 16
    val blocks = Array.tabulate(mx * my * 6) { i =>
      val coef = new Array[Int](64)
      val j = i % 6
      if (j < 4) { // Y raster within the MCU: (v, h) = (j/2, j%2)
        val band = 2 * (i / 6 / mx) + j / 2
        coef(0) = (seed + band) % 256 - 128
      }
      coef
    }
    fromCoeffs(width, height, blocks, comps = 3,
      restartInterval = restartInterval, subsample420 = true)
  }

  /** Serialize QUANTIZED coefficient blocks (natural order; for `comps` > 1
    * interleaved one-block-per-component-per-MCU, row-major MCUs) into a
    * complete JFIF baseline stream with a flat quant table of 8 shared by
    * all components. `restartInterval` > 0 emits a DRI segment and an RSTn
    * marker (cyclic 0-7, fill bits flushed, DC predictors reset) after
    * every `restartInterval` MCUs. `subsample420` (comps = 3 only) writes
    * Y at 2x2 sampling with blocks laid out `[Y0 Y1 Y2 Y3 Cb Cr]` per
    * 16x16-pixel MCU. */
  def fromCoeffs(width: Int, height: Int, blocks: Array[Array[Int]],
                 comps: Int = 1, restartInterval: Int = 0,
                 subsample420: Boolean = false): Array[Byte] = {
    require(!subsample420 || comps == 3, "4:2:0 requires 3 components")
    val compOfBlock: Array[Int] =
      if (subsample420) Array(0, 0, 0, 0, 1, 2) else (0 until comps).toArray
    val blocksPerMcu = compOfBlock.length
    val expectedBlocks =
      if (subsample420) ((width + 15) / 16) * ((height + 15) / 16) * 6
      else ((width + 7) / 8) * ((height + 7) / 8) * comps
    require(blocks.length == expectedBlocks,
      s"${blocks.length} blocks for ${width}x$height x$comps (want $expectedBlocks)")
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

    marker(0xc0) // SOF0: 8-bit; sampling 4:4:4, or 4:2:0 (Y at 2x2)
    u16be(2 + 6 + 3 * comps)
    out.write(8)
    u16be(height); u16be(width)
    out.write(comps)
    for (c <- 1 to comps) {
      out.write(c)
      out.write(if (subsample420 && c == 1) 0x22 else 0x11)
      out.write(0)
    }

    def dht(tcTh: Int, counts: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4)
      u16be(2 + 1 + 16 + vals.length)
      out.write(tcTh)
      counts.foreach(out.write)
      vals.foreach(out.write)
    }
    dht(0x00, JpegCodec.StdDcCounts, JpegCodec.StdDcVals)
    dht(0x10, JpegCodec.StdAcCounts, JpegCodec.StdAcVals)

    if (restartInterval > 0) { // DRI
      marker(0xdd)
      u16be(4)
      u16be(restartInterval)
    }

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

    def flushBits(): Unit = if (bitCnt > 0) { // pad to the byte boundary with 1s
      bitBuf = (bitBuf << (8 - bitCnt)) | ((1 << (8 - bitCnt)) - 1)
      out.write(bitBuf & 0xff)
      if ((bitBuf & 0xff) == 0xff) out.write(0x00)
      bitBuf = 0; bitCnt = 0
    }

    val preds = new Array[Int](comps) // per-component DC predictors
    var rstCount = 0
    var bi = 0
    for (coef <- blocks) {
      if (restartInterval > 0 && bi % blocksPerMcu == 0) {
        val mcuIdx = bi / blocksPerMcu
        if (mcuIdx > 0 && mcuIdx % restartInterval == 0) {
          flushBits()
          marker(0xd0 + (rstCount % 8))
          rstCount += 1
          java.util.Arrays.fill(preds, 0)
        }
      }
      val comp = compOfBlock(bi % blocksPerMcu)
      val diff = coef(0) - preds(comp)
      preds(comp) = coef(0)
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
    flushBits()

    marker(0xd9) // EOI
    out.toByteArray
  }
}

package graft.multimodal

import java.io.ByteArrayOutputStream

import graft.multimodal.MediaCodecs.{ImageMeta, PixelBuf}

/** WebP VP8L (lossless) codec — the `.webp` arm of the reference's image
  * output whitelist (/root/reference/src/converters/image_converters.py:50-52
  * and the `save_kwargs['quality']` webp branch at :122-126; Pillow's
  * `lossless=True` path is the one with an exact round-trip contract).
  *
  * ENCODE writes the simplest conforming stream: no transforms, no color
  * cache, one Huffman group — flat 8-bit prefix codes for the green/red/blue
  * (and, when used, alpha) channels and single-symbol codes for the unused
  * alphabets. ~1 byte/channel/pixel: the spec's entropy machinery is used
  * for CONFORMANCE, not compression (matching the repo-wide "deterministic
  * writer + real decoder" discipline).
  *
  * DECODE handles the general no-transform, no-cache literal stream with
  * arbitrary prefix codes (simple 1-2 symbol codes and code-length-coded
  * normal codes, including 16/17/18 repeats and the max_symbol variant).
  * Spatial/color/palette transforms, color-cache hits, and LZ77 backward
  * references — what libwebp's own encoder emits — are NAMED errors, never
  * a wrong-pixels guess; real-web `.webp` metadata stays on the
  * [[MediaCodecs.parseWebp]] header path.
  *
  * Bit conventions (WebP Lossless Bitstream Specification): the stream is
  * read LSB-first; canonical prefix codes are transmitted bit-reversed and
  * matched MSB-of-code-first, exactly DEFLATE's duality. Pinned against
  * hand-derived spec bytes in WebpCodecSpec, not just round-trip.
  */
object WebpCodec {

  /** kCodeLengthCodeOrder: the fixed transmission order of the 19
    * code-length-code lengths. */
  private val ClOrder: Array[Int] =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  // ---- LSB-first bit IO -------------------------------------------------

  private[graft] final class LsbWriter {
    private val out = new ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    /** Write the low `bits` bits of `v`, LSB first. */
    def put(v: Int, bits: Int): Unit = {
      if (bits > 0) {
        acc |= (v & ((1 << bits) - 1)) << n
        n += bits
        while (n >= 8) { out.write(acc & 0xff); acc >>>= 8; n -= 8 }
      }
    }
    /** Write a canonical prefix code: bit-reversed, so the stream carries
      * the code MSB-first (the decoder descends bit by bit). */
    def putCode(code: Int, len: Int): Unit =
      if (len > 0) put(Integer.reverse(code) >>> (32 - len), len)
    def toBytes: Array[Byte] = {
      if (n > 0) { out.write(acc & 0xff); acc = 0; n = 0 }
      out.toByteArray
    }
  }

  private final class LsbReader(b: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var bit = 0
    def nextBit(): Int = {
      require(pos < end, "VP8L stream truncated")
      val r = (b(pos) >> bit) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      r
    }
    def read(bits: Int): Int = {
      var v = 0
      var i = 0
      while (i < bits) { v |= nextBit() << i; i += 1 }
      v
    }
  }

  // ---- canonical prefix codes --------------------------------------------

  /** Decoder-side code: either a single 0-bit symbol or a complete
    * canonical code (counts/firstCode/symbols per length). */
  private final class PrefixCode(lens: Array[Int]) {
    private val MaxLen = 15
    val single: Int = {
      var only = -1
      var used = 0
      for (s <- lens.indices if lens(s) > 0) { only = s; used += 1 }
      require(used > 0, "prefix code with no symbols")
      if (used == 1) only else -1
    }
    private val count = new Array[Int](MaxLen + 1)
    private val firstCode = new Array[Int](MaxLen + 1)
    private val offset = new Array[Int](MaxLen + 1)
    private val sorted: Array[Int] =
      if (single >= 0) Array.empty
      else {
        for (l <- lens) {
          require(l <= MaxLen, s"prefix length $l exceeds 15")
          if (l > 0) count(l) += 1
        }
        var code = 0
        var kraft = 0L
        for (l <- 1 to MaxLen) {
          code = (code + count(l - 1)) << 1
          firstCode(l) = code
          kraft += count(l).toLong << (MaxLen - l)
        }
        require(kraft == (1L << MaxLen), "incomplete/oversubscribed prefix code")
        var at = 0
        for (l <- 1 to MaxLen) { offset(l) = at; at += count(l) }
        val arr = new Array[Int](at)
        val fill = offset.clone()
        for (s <- lens.indices if lens(s) > 0) { arr(fill(lens(s))) = s; fill(lens(s)) += 1 }
        arr
      }
    def decode(in: LsbReader): Int =
      if (single >= 0) single
      else {
        var code = 0
        var len = 0
        while (true) {
          code = (code << 1) | in.nextBit()
          len += 1
          require(len <= MaxLen, "prefix code walk exceeded 15 bits")
          if (count(len) > 0 && code - firstCode(len) < count(len) && code >= firstCode(len))
            return sorted(offset(len) + code - firstCode(len))
        }
        -1 // unreachable
      }
  }

  /** Read one prefix code header (simple or code-length-coded). */
  private def readCode(in: LsbReader, alphabetSize: Int): PrefixCode = {
    val lens = new Array[Int](alphabetSize)
    if (in.read(1) == 1) { // simple
      val numSymbols = in.read(1) + 1
      val first = if (in.read(1) == 1) in.read(8) else in.read(1)
      require(first < alphabetSize, s"simple-code symbol $first out of alphabet")
      lens(first) = 1
      if (numSymbols == 2) {
        val second = in.read(8)
        require(second < alphabetSize, s"simple-code symbol $second out of alphabet")
        require(second != first, "simple code repeats its symbol")
        lens(second) = 1
      } else return new PrefixCode(lens) // single symbol: 0-bit code
      new PrefixCode(lens)
    } else {
      val numClLens = 4 + in.read(4)
      val clLens = new Array[Int](19)
      for (i <- 0 until numClLens) clLens(ClOrder(i)) = in.read(3)
      val clCode = new PrefixCode(clLens)
      var maxSymbol =
        if (in.read(1) == 1) {
          val lengthNBits = 2 + 2 * in.read(3)
          2 + in.read(lengthNBits)
        } else alphabetSize
      var prev = 8
      var i = 0
      while (i < alphabetSize && maxSymbol > 0) {
        maxSymbol -= 1
        val sym = clCode.decode(in)
        sym match {
          case s if s < 16 =>
            lens(i) = s
            i += 1
            if (s != 0) prev = s
          case 16 =>
            val rep = 3 + in.read(2)
            require(i + rep <= alphabetSize, "code-length repeat overruns alphabet")
            for (_ <- 0 until rep) { lens(i) = prev; i += 1 }
          case 17 =>
            val rep = 3 + in.read(3)
            require(i + rep <= alphabetSize, "code-length zero-run overruns alphabet")
            i += rep
          case _ => // 18
            val rep = 11 + in.read(7)
            require(i + rep <= alphabetSize, "code-length zero-run overruns alphabet")
            i += rep
        }
      }
      new PrefixCode(lens)
    }
  }

  // ---- encode -------------------------------------------------------------

  /** Write the shared flat-8 normal-code header: every one of the first 256
    * symbols at length 8 (a complete code: 256 × 2^-8 = 1), trailing
    * alphabet symbols (length/cache codes we never emit) zeroed via an
    * 18-run. CL code: symbol 8 -> len 1 (code 0), 17/18 -> len 2 (codes
    * 10/11) — complete, 12 entries deep in ClOrder (index of 8 is 11). */
  private def writeFlat8(w: LsbWriter, alphabetSize: Int): Unit = {
    w.put(0, 1) // normal code
    w.put(8, 4) // num_code_lengths = 12
    val clLens = new Array[Int](19)
    clLens(8) = 1; clLens(17) = 2; clLens(18) = 2
    for (i <- 0 until 12) w.put(clLens(ClOrder(i)), 3)
    w.put(0, 1) // no max_symbol shortcut
    var s = 0
    while (s < 256) { w.putCode(0, 1); s += 1 } // symbol 8, code 0, len 1
    val zeros = alphabetSize - 256
    if (zeros > 0) {
      require(zeros >= 11 && zeros <= 138, s"flat-8 zero tail $zeros needs one 18-run")
      w.putCode(3, 2)        // symbol 18, code 11
      w.put(zeros - 11, 7)
    }
  }

  /** Single-symbol code: 0 bits per use. */
  private def writeSingle(w: LsbWriter, sym: Int): Unit = {
    w.put(1, 1) // simple
    w.put(0, 1) // one symbol
    if (sym <= 1) { w.put(0, 1); w.put(sym, 1) }
    else { w.put(1, 1); w.put(sym, 8) }
  }

  /** Encode an RGB or RGBA raster as a lossless RIFF/WEBP/VP8L stream.
    * Other modes must be adapted by the caller ([[ImageConvert.encode]]
    * forces RGB, Pillow's webp save shape — webp has no gray layout). */
  def encode(buf: PixelBuf): Array[Byte] = {
    require(buf.mode == "RGB" || buf.mode == "RGBA",
      s"VP8L encode takes RGB or RGBA input, got ${buf.mode}")
    require(buf.width <= 16384 && buf.height <= 16384,
      s"VP8L dims ${buf.width}x${buf.height} exceed the format's 16384 limit")
    val hasAlpha = buf.mode == "RGBA"
    val w = new LsbWriter
    w.put(0x2f, 8) // VP8L signature
    w.put(buf.width - 1, 14)
    w.put(buf.height - 1, 14)
    w.put(if (hasAlpha) 1 else 0, 1)
    w.put(0, 3)    // version
    w.put(0, 1)    // no transforms
    w.put(0, 1)    // no color cache
    w.put(0, 1)    // no meta-prefix image
    writeFlat8(w, 280) // green + 24 length codes (zeroed)
    writeFlat8(w, 256) // red
    writeFlat8(w, 256) // blue
    if (hasAlpha) writeFlat8(w, 256) else writeSingle(w, 255) // alpha
    writeSingle(w, 0)  // distance (never emitted)
    val ch = if (hasAlpha) 4 else 3
    val n = buf.width * buf.height
    var i = 0
    while (i < n) {
      val r = buf.data(i * ch) & 0xff
      val g = buf.data(i * ch + 1) & 0xff
      val b = buf.data(i * ch + 2) & 0xff
      w.putCode(g, 8) // flat code: symbol s IS its canonical code
      w.putCode(r, 8)
      w.putCode(b, 8)
      if (hasAlpha) w.putCode(buf.data(i * ch + 3) & 0xff, 8)
      i += 1
    }
    val payload = w.toBytes
    val out = new ByteArrayOutputStream(payload.length + 20)
    def u32le(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    out.write("RIFF".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u32le(4 + 8 + payload.length + (payload.length & 1))
    out.write("WEBP".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    out.write("VP8L".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    u32le(payload.length)
    out.write(payload, 0, payload.length)
    if ((payload.length & 1) == 1) out.write(0) // RIFF 2-byte alignment
    out.toByteArray
  }

  // ---- decode ---------------------------------------------------------------

  /** Decode a lossless WebP's pixels into `sink`. Lossy (`VP8 `) and
    * extended (`VP8X`) containers, transforms, color caches and backward
    * references are named errors — header-level metadata for those stays
    * on [[MediaCodecs.parseWebp]]. */
  def decode(bytes: Array[Byte], sink: PixelBuf): ImageMeta = {
    require(MediaCodecs.isWebp(bytes), "not a WebP payload")
    // chunk walk in Long like MediaCodecs.parseWebp: an Int `i + 8 + size`
    // wraps negative on a crafted size and bypasses the bounds require
    var i = 12L
    var at = -1
    var end = -1
    while (at < 0 && i + 8 <= bytes.length) {
      val fourcc = new String(bytes, i.toInt, 4, java.nio.charset.StandardCharsets.ISO_8859_1)
      val size = graft.util.LittleEndian.i32(bytes, i.toInt + 4)
      require(size >= 0 && i + 8 + size.toLong <= bytes.length,
        s"RIFF chunk $fourcc overruns payload")
      fourcc match {
        case "VP8L" => at = i.toInt + 8; end = at + size
        case "VP8 " => throw new IllegalArgumentException(
          "lossy (VP8) WebP sample decode unsupported — header metadata only")
        case "VP8X" => throw new IllegalArgumentException(
          "extended (VP8X) WebP sample decode unsupported — header metadata only")
        case _ => ()
      }
      i += 8L + size + (size & 1)
    }
    require(at >= 0, "WebP has no VP8L chunk")
    val in = new LsbReader(bytes, at, end)
    require(in.read(8) == 0x2f, "bad VP8L signature")
    val w = in.read(14) + 1
    val h = in.read(14) + 1
    val alphaHint = in.read(1)
    require(in.read(3) == 0, "unknown VP8L version")
    require(in.read(1) == 0,
      "VP8L transform decode unsupported (predictor/color/palette transforms)")
    val cache = in.read(1)
    require(cache == 0, "VP8L color-cache decode unsupported")
    require(in.read(1) == 0, "VP8L meta-prefix image decode unsupported")
    val green = readCode(in, 280)
    val red = readCode(in, 256)
    val blue = readCode(in, 256)
    val alpha = readCode(in, 256)
    readCode(in, 40) // distance: must parse even if never referenced
    val mode = if (alphaHint == 1) "RGBA" else "RGB"
    sink.init(mode, w, h)
    val ch = PixelBuf.channelsOf(mode)
    val n = w * h
    var sum = 0L
    var px = 0
    while (px < n) {
      val g = green.decode(in)
      require(g < 256,
        "VP8L backward-reference decode unsupported (length/distance codes)")
      val r = red.decode(in)
      val b = blue.decode(in)
      val a = alpha.decode(in)
      sink.data(px * ch) = r.toByte
      sink.data(px * ch + 1) = g.toByte
      sink.data(px * ch + 2) = b.toByte
      sum += r + g + b
      if (ch == 4) { sink.data(px * ch + 3) = a.toByte; sum += a }
      px += 1
    }
    ImageMeta("webp", w, h, mode, sum)
  }
}

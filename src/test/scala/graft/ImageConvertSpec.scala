package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.MediaFixtures
import graft.multimodal.{ImageConvert, JpegCodec, MediaCodecs}
import graft.multimodal.MediaCodecs.PixelBuf

/** Image convert surface: pixel-exact encode/decode round-trips over
  * NON-UNIFORM rasters (the corpus fixtures hold constant rows, which would
  * hide column-order and channel-swap defects — these tests use
  * position-dependent data so any transposition breaks byte equality),
  * sink-placement equivalence across interlaced/compressed variants, mode
  * conversion semantics, and the named-error surface. */
class ImageConvertSpec extends AnyFunSuite {

  /** Position-dependent raster: pixel bytes are a function of the index. */
  private def mkBuf(mode: String, w: Int, h: Int, seed: Int = 0): PixelBuf = {
    val buf = new PixelBuf
    buf.init(mode, w, h)
    var i = 0
    while (i < buf.data.length) { buf.data(i) = ((i * 7 + seed) % 251).toByte; i += 1 }
    if (mode == "P") {
      buf.palette = Array.tabulate[Byte](768)(i => ((i * 11 + 5) % 256).toByte)
      // keep indices < 256 (any byte) — already true
    }
    buf
  }

  private def assertSame(a: PixelBuf, b: PixelBuf, ctx: String): Unit = {
    assert(b.mode == a.mode && b.width == a.width && b.height == a.height,
      s"$ctx: ${b.mode} ${b.width}x${b.height} vs ${a.mode} ${a.width}x${a.height}")
    assert(java.util.Arrays.equals(b.data, a.data), s"$ctx: pixel data differs")
  }

  // ---- lossless encoder round-trips ----------------------------------------

  test("png encode/decode is pixel-identical for every mode") {
    for (mode <- Seq("L", "LA", "P", "RGB", "RGBA")) {
      val src = mkBuf(mode, 13, 7)
      val (meta, back) = ImageConvert.decodePixels(ImageConvert.encodePng(src))
      assert(meta.format == "png")
      assertSame(src, back, s"png $mode")
      if (mode == "P")
        assert(java.util.Arrays.equals(back.palette, src.palette), "png PLTE differs")
    }
  }

  test("bmp encode/decode: RGB/RGBA identity, P keeps indices+palette, L maps to P") {
    for (mode <- Seq("RGB", "RGBA", "P")) {
      val src = mkBuf(mode, 11, 5) // width 11: stride padding in play
      val (meta, back) = ImageConvert.decodePixels(ImageConvert.encodeBmp(src))
      assert(meta.format == "bmp")
      assertSame(src, back, s"bmp $mode")
      if (mode == "P")
        assert(java.util.Arrays.equals(back.palette, src.palette), "bmp palette differs")
    }
    // L is stored as 8-bpp indexed with a grayscale table; indices survive
    val srcL = mkBuf("L", 9, 4)
    val (metaL, backL) = ImageConvert.decodePixels(ImageConvert.encodeBmp(srcL))
    assert(metaL.mode == "P" && java.util.Arrays.equals(backL.data, srcL.data))
    assert((0 until 256).forall(k => backL.palette(k * 3) == k.toByte &&
      backL.palette(k * 3 + 1) == k.toByte && backL.palette(k * 3 + 2) == k.toByte))
  }

  test("pnm encode/decode: L -> P5 and RGB -> P6 identity, P/RGBA adapt to RGB") {
    for (mode <- Seq("L", "RGB")) {
      val src = mkBuf(mode, 10, 6)
      val (meta, back) = ImageConvert.decodePixels(ImageConvert.encode(src, "ppm"))
      assert(meta.format == "ppm")
      assertSame(src, back, s"pnm $mode")
    }
    val p = mkBuf("P", 8, 3)
    val (_, fromP) = ImageConvert.decodePixels(ImageConvert.encode(p, "ppm"))
    assertSame(ImageConvert.convertMode(p, "RGB"), fromP, "pnm from P")
    val rgba = mkBuf("RGBA", 8, 3)
    val (_, fromA) = ImageConvert.decodePixels(ImageConvert.encode(rgba, "ppm"))
    assertSame(ImageConvert.convertMode(rgba, "RGB"), fromA, "pnm from RGBA")
  }

  test("tiff encode/decode is pixel-identical for L and RGB") {
    for (mode <- Seq("L", "RGB")) {
      val src = mkBuf(mode, 12, 5)
      val (meta, back) = ImageConvert.decodePixels(ImageConvert.encodeTiff(src))
      assert(meta.format == "tiff")
      assertSame(src, back, s"tiff $mode")
    }
  }

  test("gif encode/decode: P identity incl. palette; exact palettization for RGB") {
    val src = mkBuf("P", 14, 9)
    val (meta, back) = ImageConvert.decodePixels(ImageConvert.encodeGif(src))
    assert(meta.format == "gif")
    assertSame(src, back, "gif P")
    assert(java.util.Arrays.equals(back.palette, src.palette), "gif palette differs")

    // an RGB image with few distinct colors palettizes exactly
    val rgb = new PixelBuf
    rgb.init("RGB", 6, 4)
    for (i <- 0 until 24) {
      val c = Seq((10, 20, 30), (200, 100, 0), (0, 0, 0), (255, 255, 255))(i % 4)
      rgb.data(i * 3) = c._1.toByte; rgb.data(i * 3 + 1) = c._2.toByte
      rgb.data(i * 3 + 2) = c._3.toByte
    }
    val (_, gback) = ImageConvert.decodePixels(ImageConvert.encodeGif(rgb))
    assertSame(rgb, ImageConvert.convertMode(gback, "RGB"), "gif palettized RGB")
  }

  test("gif LZW encoder crosses the 512/1024 width boundaries losslessly") {
    // >254 distinct pixel pairs force dictionary growth past 9 and 10 bits
    val src = mkBuf("P", 64, 48, seed = 3)
    val (_, back) = ImageConvert.decodePixels(ImageConvert.encodeGif(src))
    assertSame(src, back, "gif width growth")
  }

  // ---- sink placement vs structural variants --------------------------------

  test("png Adam7 sink equals the non-interlaced sink (positional check)") {
    for (colorType <- Seq(0, 2, 3, 6)) {
      val plain = MediaFixtures.png(13, 9, colorType, 77, adam7 = false)
      val inter = MediaFixtures.png(13, 9, colorType, 77, adam7 = true)
      val (_, a) = ImageConvert.decodePixels(plain)
      val (_, b) = ImageConvert.decodePixels(inter)
      assertSame(a, b, s"adam7 colorType=$colorType")
    }
  }

  test("gif interlaced sink equals the non-interlaced sink (positional check)") {
    val (_, a) = ImageConvert.decodePixels(MediaFixtures.gif(11, 13, 50))
    val (_, b) = ImageConvert.decodePixels(MediaFixtures.gif(11, 13, 50, interlace = true))
    assertSame(a, b, "gif interlace")
  }

  test("bmp RLE8 sink equals the uncompressed 8-bpp sink (positional check)") {
    val (_, a) = ImageConvert.decodePixels(MediaFixtures.bmp(7, 4, 8, 100))
    val (_, b) = ImageConvert.decodePixels(MediaFixtures.bmpRle8(7, 4, 100))
    assertSame(a, b, "rle8")
  }

  test("tiff LZW and PackBits sinks equal the uncompressed sink, both endians") {
    for (rgb <- Seq(false, true); be <- Seq(false, true)) {
      val (_, plain) = ImageConvert.decodePixels(MediaFixtures.tiff(9, 6, rgb, be, 40))
      val (_, pb) = ImageConvert.decodePixels(
        MediaFixtures.tiff(9, 6, rgb, be, 40, packBits = true))
      val (_, lz) = ImageConvert.decodePixels(
        MediaFixtures.tiff(9, 6, rgb, be, 40, lzw = true))
      assertSame(plain, pb, s"packbits rgb=$rgb be=$be")
      assertSame(plain, lz, s"lzw rgb=$rgb be=$be")
    }
  }

  test("bmp bottom-up and top-down sinks agree; BGR is swapped to RGB") {
    val (_, up) = ImageConvert.decodePixels(MediaFixtures.bmp(5, 3, 24, 10))
    val (_, down) = ImageConvert.decodePixels(MediaFixtures.bmp(5, 3, 24, 10, topDown = true))
    assertSame(up, down, "bmp row order")
    // hand-built 1x1 BMP with distinct B,G,R proves the swap
    val one = new PixelBuf
    one.init("RGB", 1, 1)
    one.data(0) = 10; one.data(1) = 20; one.data(2) = 30
    val (_, back) = ImageConvert.decodePixels(ImageConvert.encodeBmp(one))
    assert(back.data.toSeq == Seq[Byte](10, 20, 30), back.data.toSeq)
  }

  test("jpeg sink matches the decoded pixelSum for gray and color") {
    for (bytes <- Seq(graft.fixtures.JpegWriter.generate(24, 16, 5),
      graft.fixtures.JpegWriter.generateColor(24, 16, 5),
      graft.fixtures.JpegWriter.generateColor420(24, 16, 5))) {
      val (meta, sink) = ImageConvert.decodePixels(bytes)
      assert(ImageConvert.rasterSum(sink) == meta.pixelSum,
        s"${meta.mode}: sink sum vs pixelSum")
      // lossless re-encode preserves the decoded raster exactly
      val (meta2, _) = ImageConvert.decodePixels(ImageConvert.encodePng(sink))
      assert(meta2.pixelSum == meta.pixelSum && meta2.mode == meta.mode)
    }
  }

  // ---- mode conversion -------------------------------------------------------

  test("convertMode semantics: luma, alpha drop, palette expansion") {
    val rgb = new PixelBuf
    rgb.init("RGB", 1, 1)
    rgb.data = Array[Byte](100.toByte, 150.toByte, 200.toByte)
    // (299*100 + 587*150 + 114*200) / 1000 = 140 (truncating)
    assert(ImageConvert.convertMode(rgb, "L").data.toSeq == Seq[Byte]((140).toByte))
    val rgba = mkBuf("RGBA", 4, 2)
    val dropped = ImageConvert.convertMode(rgba, "RGB")
    for (i <- 0 until 8; c <- 0 until 3)
      assert(dropped.data(i * 3 + c) == rgba.data(i * 4 + c))
    val p = mkBuf("P", 3, 2)
    val expanded = ImageConvert.convertMode(p, "RGB")
    for (i <- 0 until 6; c <- 0 until 3)
      assert(expanded.data(i * 3 + c) == p.palette((p.data(i) & 0xff) * 3 + c))
    // round-trip L -> RGB -> L is the identity (gray replication)
    val l = mkBuf("L", 5, 5)
    assertSame(l, ImageConvert.convertMode(ImageConvert.convertMode(l, "RGB"), "L"),
      "L->RGB->L")
    // LA: gray replicates (L conversion is exact), alpha carried to RGBA
    val la = mkBuf("LA", 4, 3)
    val laL = ImageConvert.convertMode(la, "L")
    val laRgba = ImageConvert.convertMode(la, "RGBA")
    for (i <- 0 until 12) {
      assert(laL.data(i) == la.data(i * 2), s"LA->L pixel $i")
      for (c <- 0 until 3)
        assert(laRgba.data(i * 4 + c) == la.data(i * 2), s"LA->RGBA pixel $i ch $c")
      assert(laRgba.data(i * 4 + 3) == la.data(i * 2 + 1), s"LA->RGBA alpha $i")
    }
  }

  test("LA sources convert to every target: png keeps LA, the rest drop alpha") {
    val la = MediaFixtures.png(9, 5, 4, 60) // gray == alpha == (seed+y)%256
    for (dst <- ImageConvert.encodeFormats) {
      val (meta, sink) = ImageConvert.decodePixels(ImageConvert.convertImage(la, dst))
      assert(meta.width == 9 && meta.height == 5, s"LA->$dst geometry")
      val expectedGray = ImageConvert.convertMode(
        ImageConvert.decodePixels(la)._2, "L")
      assertSame(ImageConvert.convertMode(sink, "L"), expectedGray,
        s"LA->$dst gray plane")
      if (dst == "png") assert(sink.mode == "LA", "png must keep LA natively")
      else assert(!sink.mode.contains("A"), s"LA->$dst kept alpha unexpectedly")
    }
    // multi-page PDF embeds LA pages as DeviceGray
    val pdf = ImageConvert.imagesToPdf(Seq(la))
    assert(new String(pdf, 0, 8, java.nio.charset.StandardCharsets.ISO_8859_1)
      .startsWith("%PDF"))
  }

  // ---- cross-format convert + errors ----------------------------------------

  test("convertImage round-trips across the full lossless matrix") {
    val sources = Seq(
      "bmp24" -> MediaFixtures.bmp(9, 5, 24, 60),
      "bmp8" -> MediaFixtures.bmp(9, 5, 8, 60),
      "png-rgb" -> MediaFixtures.png(9, 5, 2, 60),
      "gif" -> MediaFixtures.gif(9, 5, 60),
      "ppm" -> MediaFixtures.ppm(9, 5, 60),
      "tiff" -> MediaFixtures.tiff(9, 5, rgb = true, bigEndian = false, 60))
    for ((name, src) <- sources; dst <- ImageConvert.encodeFormats) {
      val out = ImageConvert.convertImage(src, dst)
      val (meta, sink) = ImageConvert.decodePixels(out)
      val (srcMeta, srcSink) = ImageConvert.decodePixels(src)
      assert(meta.width == srcMeta.width && meta.height == srcMeta.height,
        s"$name->$dst geometry")
      // compare in RGB space (mode may legitimately change, e.g. P->RGB)
      assertSame(ImageConvert.convertMode(srcSink, "RGB"),
        ImageConvert.convertMode(sink, "RGB"), s"$name->$dst pixels")
    }
  }

  test("jpeg ENCODE: band-constant content round-trips exactly at q>=50") {
    // flat 8x8 blocks have DC-only DCTs; at qualities 95 and 93 the scaled
    // luma DC step is 2 ((16*10+50)/100 = (16*14+50)/100 = 2), which
    // divides 8*(v-128) — so our own decoder (already oracled) must read
    // back the EXACT source pixels at both settings
    for ((w, h, seed) <- Seq((16, 24, 50), (13, 21, 100), (20, 19, 247));
         q <- Seq(95, 93)) {
      val srcBytes = graft.fixtures.JpegWriter.generate(w, h, seed)
      val src = JpegCodec.decode(srcBytes)
      val re = JpegCodec.decode(ImageConvert.convertImage(
        srcBytes, "jpeg", ImageConvert.ImageOpts(quality = q)))
      assert(re == src, s"gray ${(w, h, seed)} q$q: $re vs $src")
    }
    // color: neutral-chroma band content survives the RGB->YCbCr->RGB trip
    val colorSrc = graft.fixtures.JpegWriter.generateColor(16, 16, 30)
    val reC = JpegCodec.decode(ImageConvert.convertImage(colorSrc, "jpeg"))
    assert(reC == JpegCodec.decode(colorSrc), s"$reC")
  }

  test("jpeg ENCODE: non-flat content is quantization-bounded, knobs behave") {
    val src = mkBuf("RGB", 24, 16)
    val q95 = graft.multimodal.JpegEncoder.encode(src, 95)
    val (meta, back) = ImageConvert.decodePixels(q95)
    assert(meta.width == 24 && meta.height == 16 && meta.mode == "RGB")
    // error bound: mean absolute channel error small at q95
    val n = src.data.length
    var err = 0L
    for (i <- 0 until n) err += math.abs((src.data(i) & 0xff) - (back.data(i) & 0xff))
    assert(err.toDouble / n < 8.0, s"mean abs error ${err.toDouble / n}")
    // lower quality -> coarser tables -> smaller file
    val q30 = graft.multimodal.JpegEncoder.encode(src, 30)
    assert(q30.length < q95.length, s"${q30.length} !< ${q95.length}")
    // quality range + mode adaptation contracts
    intercept[IllegalArgumentException](graft.multimodal.JpegEncoder.encode(src, 0))
    intercept[IllegalArgumentException](graft.multimodal.JpegEncoder.encode(src, 101))
    val p = mkBuf("P", 6, 4)
    val (pm, _) = ImageConvert.decodePixels(ImageConvert.encode(p, "jpeg"))
    assert(pm.mode == "RGB") // P forced to RGB like the reference save path
    val la = mkBuf("LA", 6, 4)
    val (lam, _) = ImageConvert.decodePixels(ImageConvert.encode(la, "jpeg"))
    assert(lam.mode == "L") // LA keeps its gray plane
  }

  test("ico encode embeds a PNG entry; decode picks the largest entry back") {
    for (mode <- Seq("L", "RGB", "RGBA", "P")) {
      val src = mkBuf(mode, 9, 7)
      val ico = ImageConvert.encode(src, "ico")
      assert(graft.multimodal.MediaCodecs.isIco(ico))
      // the header-level parser (Multimodal's dispatch) sees the same dims
      val hdr = graft.multimodal.MediaCodecs.parseIco(ico)
      assert(hdr.width == 9 && hdr.height == 7 && hdr.frames == 1)
      val (meta, sink) = ImageConvert.decodePixels(ico)
      assert(meta.format == "ico" && meta.width == 9 && meta.height == 7)
      // PNG-in-ICO is mode-preserving: compare raw planes (incl. alpha for
      // RGBA — an RGB-space compare would mask a dropped/shuffled channel)
      assertSame(sink, src, s"ico $mode pixels")
    }
    // 256 axis is coded as 0 per the ICONDIR convention and reads back
    val big = mkBuf("L", 256, 2)
    val (bm, _) = ImageConvert.decodePixels(ImageConvert.encode(big, "ico"))
    assert(bm.width == 256 && bm.height == 2)
    // oversize and DIB-entry payloads are named errors
    val huge = new PixelBuf
    huge.init("L", 257, 1)
    assert(intercept[IllegalArgumentException](ImageConvert.encodeIco(huge))
      .getMessage.contains("256"))
    val dib = ImageConvert.encode(mkBuf("L", 4, 4), "ico")
    dib(22) = 0x28 // stomp the PNG magic into a BITMAPINFOHEADER size byte
    assert(intercept[Exception](ImageConvert.decodePixels(dib))
      .getMessage.toLowerCase.contains("png"))
  }

  test("classic DIB ico composites XOR rows with the AND mask to RGBA") {
    // 4x3 @24bpp, seed 10: rows carry 10/11/12 in every channel; the AND
    // mask makes row 0 transparent (y % 3 == 0). RGBA sum =
    // 3*4*(10+11+12) + 255*4*2 = 396 + 2040 = 2436.
    for (bpp <- Seq(24, 8)) {
      val ico = graft.fixtures.MediaFixtures.icoDib(4, 3, bpp, 10)
      val (meta, sink) = ImageConvert.decodePixels(ico)
      assert(meta.format == "ico" && meta.width == 4 && meta.height == 3)
      assert(meta.mode == "RGBA")
      assert(meta.pixelSum == 2436L, s"bpp=$bpp")
      // row 0 transparent but its XOR RGB kept (Pillow keeps it)
      assert(sink.data(3) == 0 && (sink.data(0) & 0xff) == 10)
      assert((sink.data(4 * 4 + 3) & 0xff) == 255 && (sink.data(4 * 4) & 0xff) == 11)
      // and the ic_ico_dib query shape: -> png -> re-decode, sums survive
      val png = ImageConvert.convertImage(ico, "png")
      val (m2, _) = ImageConvert.decodePixels(png)
      assert(m2.mode == "RGBA" && m2.pixelSum == 2436L)
    }
    // DIB shapes outside the contract are named errors
    val bad = graft.fixtures.MediaFixtures.icoDib(4, 3, 24, 10)
    bad(22 + 16) = 1 // BI_RLE8 compression
    assert(intercept[IllegalArgumentException](ImageConvert.decodePixels(bad))
      .getMessage.contains("compression"))
  }

  test("eps encode writes a hex raster its own parser reads back exactly") {
    for (mode <- Seq("L", "RGB")) {
      val src = mkBuf(mode, 11, 6)
      val eps = ImageConvert.encode(src, "eps")
      val text = new String(eps, java.nio.charset.StandardCharsets.ISO_8859_1)
      assert(text.startsWith("%!PS-Adobe-3.0 EPSF-3.0"))
      assert(text.contains("%%BoundingBox: 0 0 11 6"))
      val (meta, sink) = ImageConvert.decodePixels(eps)
      assert(meta.format == "eps" && meta.width == 11 && meta.height == 6)
      assert(sink.mode == mode)
      assertSame(sink, src, s"eps $mode pixels")
    }
    // P and RGBA force RGB; LA keeps its gray plane (alpha-less format)
    assert(ImageConvert.decodePixels(
      ImageConvert.encode(mkBuf("P", 5, 4), "eps"))._1.mode == "RGB")
    assert(ImageConvert.decodePixels(
      ImageConvert.encode(mkBuf("LA", 5, 4), "eps"))._1.mode == "L")
    // truncated hex data is a named error, not short pixels
    val eps = ImageConvert.encode(mkBuf("L", 8, 8), "eps")
    val cut = java.util.Arrays.copyOfRange(eps, 0, eps.length - 40)
    assert(intercept[IllegalArgumentException](ImageConvert.decodePixels(cut))
      .getMessage.contains("truncated"))
  }

  // ---- pixel geometry ops ---------------------------------------------------

  test("crop extracts the exact box; out-of-bounds boxes are named errors") {
    // 4x3 L raster 0..11 row-major
    val buf = new PixelBuf
    buf.init("L", 4, 3)
    for (i <- buf.data.indices) buf.data(i) = i.toByte
    val c = ImageConvert.crop(buf, 1, 1, 3, 3)
    assert(c.width == 2 && c.height == 2)
    assert(c.data.toSeq.map(_ & 0xff) == Seq(5, 6, 9, 10))
    val e = intercept[IllegalArgumentException](ImageConvert.crop(buf, 0, 0, 5, 2))
    assert(e.getMessage.contains("crop box"))
  }

  test("rotate right angles move pixels exactly (CCW, Pillow convention)") {
    // 2x2 RGB: pixels A B / C D, channel-tagged
    val buf = new PixelBuf
    buf.init("RGB", 2, 2)
    for (p <- 0 until 4; c <- 0 until 3) buf.data(p * 3 + c) = (p * 10 + c).toByte
    def px(b: PixelBuf, x: Int, y: Int): Int = b.data((y * b.width + x) * 3) & 0xff
    // CCW 90: top-right B(x=1,y=0) becomes top-left
    val r90 = ImageConvert.rotate(buf, 90)
    assert(r90.width == 2 && r90.height == 2)
    assert(px(r90, 0, 0) == 10 && px(r90, 1, 0) == 30 &&
      px(r90, 0, 1) == 0 && px(r90, 1, 1) == 20)
    val r180 = ImageConvert.rotate(buf, 180)
    assert(px(r180, 0, 0) == 30 && px(r180, 1, 1) == 0)
    // 270 == -90; full turn is identity; non-right angles fail named
    assert(ImageConvert.rotate(buf, 270).data.toSeq ==
      ImageConvert.rotate(buf, -90).data.toSeq)
    assert(ImageConvert.rotate(ImageConvert.rotate(buf, 90), 270).data.toSeq ==
      buf.data.toSeq)
    assert(intercept[IllegalArgumentException](ImageConvert.rotate(buf, 45))
      .getMessage.contains("right angles"))
    // non-square: 3x1 -> 90 -> 1x3
    val wide = new PixelBuf
    wide.init("L", 3, 1)
    for (i <- 0 until 3) wide.data(i) = (i + 1).toByte
    val tall = ImageConvert.rotate(wide, 90)
    assert(tall.width == 1 && tall.height == 3)
    assert(tall.data.toSeq.map(_ & 0xff) == Seq(3, 2, 1))
  }

  test("flips mirror exactly and preserve dims; bad direction is named") {
    val buf = new PixelBuf
    buf.init("L", 3, 2)
    for (i <- 0 until 6) buf.data(i) = i.toByte
    assert(ImageConvert.flip(buf, "horizontal").data.toSeq.map(_ & 0xff) ==
      Seq(2, 1, 0, 5, 4, 3))
    assert(ImageConvert.flip(buf, "vertical").data.toSeq.map(_ & 0xff) ==
      Seq(3, 4, 5, 0, 1, 2))
    intercept[IllegalArgumentException](ImageConvert.flip(buf, "diagonal"))
  }

  test("resizeLanczos: identity, constant-exact, symmetric, P falls to nearest") {
    // same-size resize is the identity (integer-offset sinc taps vanish)
    val src = mkBuf("RGB", 9, 7)
    assertSame(ImageConvert.resizeLanczos(src, 9, 7), src, "identity")
    // constant content stays exact at any geometry (weights normalize to 1)
    val const = new PixelBuf
    const.init("L", 10, 6)
    java.util.Arrays.fill(const.data, 77.toByte)
    for ((w, h) <- Seq((25, 3), (4, 13), (10, 6), (1, 1))) {
      val r = ImageConvert.resizeLanczos(const, w, h)
      assert(r.width == w && r.height == h)
      assert(r.data.forall(_ == 77.toByte), s"constant ${w}x$h")
    }
    // mirror symmetry: flip(resize(x)) == resize(flip(x))
    val a = ImageConvert.flip(ImageConvert.resizeLanczos(src, 14, 5), "horizontal")
    val b = ImageConvert.resizeLanczos(ImageConvert.flip(src, "horizontal"), 14, 5)
    assertSame(a, b, "mirror symmetry")
    // horizontal-only resize of row-constant content keeps every row's value
    val banded = new PixelBuf
    banded.init("L", 8, 5)
    for (y <- 0 until 5; x <- 0 until 8) banded.data(y * 8 + x) = (40 + y * 3).toByte
    val hOnly = ImageConvert.resizeLanczos(banded, 13, 5)
    for (y <- 0 until 5; x <- 0 until 13)
      assert(hOnly.data(y * 13 + x) == (40 + y * 3).toByte, s"row $y col $x")
    // P mode cannot be interpolated: falls back to nearest (Pillow's rule)
    val p = mkBuf("P", 6, 4)
    assertSame(ImageConvert.resizeLanczos(p, 12, 8),
      ImageConvert.resizeNearest(p, 12, 8), "P nearest fallback")
  }

  test("rotateGeneral matches the exact path at right angles; 45 behaves") {
    val src = mkBuf("RGB", 7, 5)
    // the general inverse-mapped path must reproduce the lossless moves
    // pixel-exactly (pins center handling, expand dims, and the CW/CCW
    // screen-coordinate convention)
    for (deg <- Seq(90, 180, 270))
      assertSame(ImageConvert.rotateGeneral(src, deg),
        ImageConvert.rotate(src, deg), s"general vs exact at $deg")
    // rotateAny delegates right angles to the exact path, others expand
    assertSame(ImageConvert.rotateAny(src, 450.0), ImageConvert.rotate(src, 90),
      "450 normalizes to the exact 90")
    val r45 = ImageConvert.rotateAny(src, 45.0)
    // expand box: ceil((7+5)/sqrt(2)) = 9 on both axes
    assert(r45.width == 9 && r45.height == 9, s"${r45.width}x${r45.height}")
    // a constant raster rotates to its own color inside, black outside:
    // the center pixel is inside, the corners are fill
    val const = new PixelBuf
    const.init("L", 8, 8)
    java.util.Arrays.fill(const.data, 99.toByte)
    val c45 = ImageConvert.rotateAny(const, 45.0)
    val mid = (c45.height / 2) * c45.width + c45.width / 2
    assert(c45.data(mid) == 99.toByte, "center survives")
    assert(c45.data(0) == 0 && c45.data(c45.data.length - 1) == 0, "corners fill")
    // every non-fill pixel carries the source color, never an invented one
    assert(c45.data.forall(v => v == 0 || v == 99.toByte))
    // non-finite angles are named errors, never a fabricated 1x1 raster
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity))
      intercept[IllegalArgumentException](ImageConvert.rotateAny(src, bad))
    // float jitter next to a right angle snaps onto the exact path
    assertSame(ImageConvert.rotateAny(src, 89.9999999999),
      ImageConvert.rotate(src, 90), "snap to 90")
  }

  test("png compress_level is a pure size dial: identical pixels, 0 >= 9") {
    val src = mkBuf("RGB", 40, 30)
    val stored = ImageConvert.encodePng(src, 0)
    val max = ImageConvert.encodePng(src, 9)
    assert(stored.length > max.length, s"${stored.length} !> ${max.length}")
    for (enc <- Seq(stored, max))
      assertSame(ImageConvert.decodePixels(enc)._2, src, "level pixels")
    intercept[IllegalArgumentException](ImageConvert.encodePng(src, 10))
    // and through the convert surface's kwarg
    val bmp = MediaFixtures.bmp(9, 5, 24, 60)
    val viaOpts = ImageConvert.convertImage(bmp, "png",
      ImageConvert.ImageOpts(pngCompressLevel = 1))
    assertSame(ImageConvert.decodePixels(viaOpts)._2,
      ImageConvert.decodePixels(bmp)._2, "kwarg path pixels")
  }

  test("compress_level 0 through the kwarg surface falls back to 6 (reference truthiness)") {
    // the reference's `if kwargs.get('compress_level'):` drops a 0 and saves
    // at Pillow's default 6 — the convert surface must match; the direct
    // encodePng API still honors a literal 0 (covered above)
    val bmp = MediaFixtures.bmp(9, 5, 24, 61)
    val via0 = ImageConvert.convertImage(bmp, "png", ImageConvert.ImageOpts(pngCompressLevel = 0))
    val via6 = ImageConvert.convertImage(bmp, "png", ImageConvert.ImageOpts(pngCompressLevel = 6))
    assert(java.util.Arrays.equals(via0, via6), "level 0 must alias the default 6")
  }

  test("LA alpha: invert refuses by name; filters pass the alpha band through") {
    val la = mkBuf("LA", 6, 6)
    var i = 1
    while (i < la.data.length) { la.data(i) = (if ((i / 2) % 2 == 0) 0 else 255).toByte; i += 2 }
    assert(intercept[IllegalArgumentException](ImageConvert.invert(la))
      .getMessage.contains("LA"))
    val blurred = ImageConvert.convolve(la, "blur")
    i = 1
    while (i < la.data.length) {
      assert(blurred.data(i) == la.data(i), s"alpha byte $i must pass through")
      i += 2
    }
  }

  test("LA reaches encodeBmp/encodeGif as a named error, never a MatchError") {
    val la = mkBuf("LA", 3, 3)
    assert(intercept[IllegalArgumentException](ImageConvert.encodeBmp(la))
      .getMessage.contains("LA"))
    assert(intercept[IllegalArgumentException](ImageConvert.encodeGif(la))
      .getMessage.contains("LA"))
  }

  test("resizeLanczos cap-gates the horizontal intermediate up front") {
    // both endpoints are cap-legal; w * srcHeight is not (65536^2 overflows
    // the old Int arithmetic and would allocate gigabytes of float64)
    val tall = new PixelBuf
    tall.init("L", 1, 65536)
    assert(intercept[IllegalArgumentException](
      ImageConvert.resizeLanczos(tall, 65536, 4)).getMessage.contains("64 MiB"))
  }

  test("pdfImages: hostile /Length and over-cap dims are named errors, not hangs") {
    val huge = ("%PDF-1.4\n1 0 obj << /Length 2147483600 >> stream\nxx\nendstream\n" +
      "endobj\n%%EOF").getBytes("ISO-8859-1")
    assert(intercept[IllegalArgumentException](ImageConvert.pdfImages(huge))
      .getMessage.contains("truncated"))
    // 65536x65536 gray: width*height*channels wraps Int to 0 — before the
    // cap, an EMPTY raster would be silently accepted as a valid decode
    val body = Array[Byte](0x78, 0x01, 3, 0, 0, 0, 0, 1) // deflate of ""
    val dict = "1 0 obj << /Subtype /Image /Width 65536 /Height 65536 " +
      s"/ColorSpace /DeviceGray /FlateDecode /BitsPerComponent 8 /Length ${body.length} >> stream\n"
    val pdf = ("%PDF-1.4\n" + dict).getBytes("ISO-8859-1") ++ body ++
      "\nendstream\nendobj\n%%EOF".getBytes("ISO-8859-1")
    assert(intercept[IllegalArgumentException](ImageConvert.pdfImages(pdf))
      .getMessage.contains("64 MiB"))
  }

  test("resizeNearest samples the center-mapped grid") {
    // 4x4 L with value = x + 4*y; downscale to 2x2: centers map to src 1,3
    val buf = new PixelBuf
    buf.init("L", 4, 4)
    for (i <- 0 until 16) buf.data(i) = i.toByte
    val half = ImageConvert.resizeNearest(buf, 2, 2)
    assert(half.data.toSeq.map(_ & 0xff) == Seq(5, 7, 13, 15))
    // upscale 2x2 -> 4x4 replicates each source pixel 2x2
    val up = ImageConvert.resizeNearest(half, 4, 4)
    assert(up.data.toSeq.map(_ & 0xff) ==
      Seq(5, 5, 7, 7, 5, 5, 7, 7, 13, 13, 15, 15, 13, 13, 15, 15))
  }

  test("invert flips channels, preserves RGBA alpha, refuses P by name") {
    val rgba = new PixelBuf
    rgba.init("RGBA", 1, 1)
    rgba.data = Array[Byte](10, 20, 30, 200.toByte)
    val inv = ImageConvert.invert(rgba)
    assert(inv.data.toSeq.map(_ & 0xff) == Seq(245, 235, 225, 200))
    intercept[IllegalArgumentException](ImageConvert.invert(mkBuf("P", 2, 2)))
  }

  test("convolve applies the published kernels with pinned integer rounding") {
    // 3x3 L all-100 with a 200 center; SMOOTH scale 13 kernel 1..5..1:
    // center = (100*8 + 200*5) / 13 = 1800/13 = 138 (trunc); border copied
    val buf = new PixelBuf
    buf.init("L", 3, 3)
    java.util.Arrays.fill(buf.data, 100.toByte)
    buf.data(4) = 200.toByte
    val sm = ImageConvert.convolve(buf, "smooth")
    assert((sm.data(4) & 0xff) == 138)
    assert(sm.data.toSeq.zipWithIndex.filter(_._2 != 4).map(_._1 & 0xff) ==
      Seq.fill(8)(100) ++ Nil)
    // FIND_EDGES on a flat region is 0 (clamped), EMBOSS offset shows at 128
    val flat = new PixelBuf
    flat.init("L", 3, 3)
    java.util.Arrays.fill(flat.data, 100.toByte)
    assert((ImageConvert.convolve(flat, "find_edges").data(4) & 0xff) == 0)
    assert((ImageConvert.convolve(flat, "emboss").data(4) & 0xff) == 128)
    // BLUR is 5x5: on a 5x5 raster only the exact center is filtered
    val five = new PixelBuf
    five.init("L", 5, 5)
    java.util.Arrays.fill(five.data, 50.toByte)
    five.data(12) = 255.toByte
    val bl = ImageConvert.convolve(five, "blur")
    assert((bl.data(12) & 0xff) == 50) // center kernel cell is 0 -> 16*50/16
    assert((bl.data(11) & 0xff) == 50) // border ring: copied unfiltered
    assert(intercept[IllegalArgumentException](
      ImageConvert.convolve(buf, "vortex")).getMessage.contains("Unknown filter"))
  }

  test("convertImage applies the reference's preprocessing chain in order") {
    import graft.fixtures.MediaFixtures
    // 8x6 bmp24, rows are constant (seed + y) % 256
    val bytes = MediaFixtures.bmp(8, 6, 24, seed = 40)
    val out = ImageConvert.convertImage(bytes, "png",
      ImageConvert.ImageOpts(cropBox = Some((2, 1, 6, 5)), rotateDeg = Some(90.0),
        grayscale = true))
    val (meta, buf) = ImageConvert.decodePixels(out)
    assert(meta.width == 4 && meta.height == 4 && buf.mode == "L")
    // crop rows y=1..4 carry values 41..44; rotate 90 makes them columns
    // (x = row index after CCW); grayscale of (v,v,v) is v
    for (y <- 0 until 4; x <- 0 until 4)
      assert((buf.data(y * 4 + x) & 0xff) == 40 + 1 + x, s"($x,$y)")
  }

  test("imagesToPdf writes one real image page per input, read-back exact") {
    import graft.fixtures.MediaFixtures
    // RGB bmp + P gif (forced to RGB like the reference) + L pgm (DeviceGray)
    val pages = Seq(
      MediaFixtures.bmp(6, 4, 24, seed = 10),
      MediaFixtures.gif(5, 3, seed = 20),
      MediaFixtures.ppm(4, 4, seed = 30, gray = true))
    val pdf = ImageConvert.imagesToPdf(pages)
    assert(new String(pdf.take(8), "ISO-8859-1").startsWith("%PDF-"))
    val metas = ImageConvert.pdfImages(pdf)
    assert(metas.length == 3)
    assert(metas(0).width == 6 && metas(0).height == 4 && metas(0).mode == "RGB")
    assert(metas(1).mode == "RGB") // P forced to RGB per the reference
    assert(metas(2).mode == "L")
    // sums must equal the decoded-and-mode-adapted rasters, channel-exact
    for ((bytes, i) <- pages.zipWithIndex) {
      val b0 = ImageConvert.decodePixels(bytes)._2
      val b = if (b0.mode == "RGBA" || b0.mode == "P") ImageConvert.convertMode(b0, "RGB") else b0
      assert(metas(i).pixelSum == ImageConvert.rasterSum(b), s"page $i")
    }
    // page count is in the document structure too
    assert(new String(pdf, "ISO-8859-1").contains("/Count 3"))
    val e = intercept[IllegalArgumentException](ImageConvert.imagesToPdf(Nil))
    assert(e.getMessage.contains("at least one image"))
  }

  test("hostile BMP headers are named errors, not fabricated metadata or OOM") {
    // BI_RLE8 declaring 16384x16384 from a ~KB payload: the 64 MiB-class
    // geometry cap must fire before any allocation
    def bmpHeader(width: Int, height: Int, bpp: Int, compression: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(54 + 1024 + 16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(bb.capacity).putInt(0).putInt(54 + 1024)
      bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(bpp.toShort)
      bb.putInt(compression)
      bb.array()
    }
    val bomb = intercept[IllegalArgumentException](
      ImageConvert.decodePixels(bmpHeader(16384, 16384, 8, 1)))
    assert(bomb.getMessage.contains("geometry"), bomb.getMessage)
    // width*(bpp/8) Int overflow must not fabricate a success ImageMeta
    val wrap = intercept[IllegalArgumentException](
      MediaCodecs.decodeBmp(bmpHeader(0x40000000, 10, 24, 0)))
    assert(wrap.getMessage.contains("geometry"), wrap.getMessage)
  }

  test("BMP V4/V5 DIB headers place the palette after the real header") {
    // hand-pack an 8-bpp BMP with a 108-byte BITMAPV4HEADER: palette at
    // 14+108, 4 entries (biClrUsed=4), 2x1 pixels indices 1,3
    val palAt = 14 + 108
    val dataOffset = palAt + 4 * 4
    val bb = java.nio.ByteBuffer.allocate(dataOffset + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(bb.capacity).putInt(0).putInt(dataOffset)
    bb.putInt(108).putInt(2).putInt(1) // V4 header, 2x1
    bb.putShort(1).putShort(8).putInt(0) // 8 bpp BI_RGB
    bb.putInt(4).putInt(0).putInt(0).putInt(4).putInt(0) // sizeImage..biClrUsed=4
    bb.position(palAt)
    for (k <- 0 until 4) // BGRA entries: color k = (k*10+2, k*10+1, k*10)
      bb.put((k * 10).toByte).put((k * 10 + 1).toByte).put((k * 10 + 2).toByte).put(0.toByte)
    bb.put(1.toByte).put(3.toByte).put(0.toByte).put(0.toByte) // row + pad
    val (meta, buf) = ImageConvert.decodePixels(bb.array())
    assert(meta.width == 2 && buf.mode == "P")
    // palette entries must be the REAL colors, not V4 header bytes
    assert((buf.palette(1 * 3) & 0xff) == 12 && (buf.palette(3 * 3 + 2) & 0xff) == 30)
    val rgb = ImageConvert.convertMode(buf, "RGB")
    assert(rgb.data.toSeq.map(_ & 0xff) == Seq(12, 11, 10, 32, 31, 30))
    // an unknown DIB size (BITMAPCOREHEADER) is a named error, not garbage
    val core = bb.array().clone(); core(14) = 12
    val e = intercept[IllegalArgumentException](MediaCodecs.decodeBmp(core))
    assert(e.getMessage.contains("DIB header"), e.getMessage)
  }

  test("P-mode encode/convert without a full palette fails named, not AIOOBE") {
    val p = new PixelBuf
    p.init("P", 2, 2)
    for (fmt <- Seq("png", "bmp", "gif")) { // palette = null
      val e = intercept[IllegalArgumentException](ImageConvert.encode(p, fmt))
      assert(e.getMessage.contains("palette"), s"$fmt: ${e.getMessage}")
    }
    p.palette = new Array[Byte](48) // 16 colors only
    for (fmt <- Seq("png", "bmp", "gif")) {
      val e = intercept[IllegalArgumentException](ImageConvert.encode(p, fmt))
      assert(e.getMessage.contains("palette"), s"$fmt: ${e.getMessage}")
    }
    intercept[IllegalArgumentException](ImageConvert.convertMode(p, "RGB"))
  }

  test("gif/jpeg encode reject dimensions past the format's u16 limit by name") {
    val wide = new PixelBuf
    wide.init("L", 70000, 2)
    val e = intercept[IllegalArgumentException](ImageConvert.encodeGif(wide))
    assert(e.getMessage.contains("65535"), e.getMessage)
    // SOF codes dims as u16 too: must be a named error, never a stream
    // whose declared width silently wrapped mod 65536
    val e2 = intercept[IllegalArgumentException](
      graft.multimodal.JpegEncoder.encode(wide, 95))
    assert(e2.getMessage.contains("65535"), e2.getMessage)
  }

  test("unsupported encode targets are named errors, never fake bytes") {
    val buf = mkBuf("RGB", 4, 4)
    assert(intercept[IllegalArgumentException](ImageConvert.encode(buf, "xyz"))
      .getMessage.contains("whitelist"))
    // >256 distinct colors cannot palettize exactly
    val many = new PixelBuf
    many.init("RGB", 32, 32)
    for (i <- 0 until 1024) {
      many.data(i * 3) = (i >> 8).toByte; many.data(i * 3 + 1) = i.toByte
      many.data(i * 3 + 2) = (i * 3).toByte
    }
    assert(intercept[IllegalArgumentException](ImageConvert.encodeGif(many))
      .getMessage.contains("256"))
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.textops.{LangId, TextAnalysis}
import graft.multimodal.Multimodal

/** Pure-kernel tests for text analysis, language ID, and multimodal stubs. */
class TextOpsSpec extends AnyFunSuite {

  test("langid detects real-language samples") {
    assert(LangId.detect("the quick brown fox jumped over the lazy dog and it was fine")._1 == "en")
    assert(LangId.detect("le chat est dans la maison et il mange pas avec les autres")._1 == "fr")
    assert(LangId.detect("el perro está en la casa pero no come con los otros animales")._1 == "es")
    assert(LangId.detect("der Hund ist nicht mit der Katze und sie sind im Garten")._1 == "de")
    assert(LangId.detect("这是一个中文句子，用来测试语言识别。")._1 == "zh")
    assert(LangId.detect("")._1 == "und")
    assert(LangId.detect("12345 67890 !!!")._1 == "und")
  }

  test("rolling fingerprint is deterministic and insensitive to distant edits") {
    val base = Array.tabulate(200)(i => s"w${i % 37}q${(i * 7) % 11}").mkString(" ")
    val fp1 = TextAnalysis.rollingFingerprint(base)
    val fp2 = TextAnalysis.rollingFingerprint(base)
    assert(fp1 == fp2 && fp1 != 0L)
    // appending junk far from the minimizing window usually keeps the min;
    // at minimum the function stays total and deterministic
    val edited = base + " zzz zzz zzz"
    assert(TextAnalysis.rollingFingerprint(edited) == TextAnalysis.rollingFingerprint(edited))
    // different docs get different fingerprints
    assert(TextAnalysis.rollingFingerprint("alpha beta gamma delta epsilon zeta eta theta iota") != fp1)
  }

  test("simhash: near-duplicates land within hamming 3, unrelated far apart") {
    import graft.dedup.Dedup.simhash64
    val doc = Array.tabulate(120)(i => s"tok${(i * 13) % 53}").mkString(" ")
    val nearDup = doc.split(' ').zipWithIndex.collect { case (w, i) if i != 60 => w }.mkString(" ")
    val other = Array.tabulate(120)(i => s"else${(i * 17) % 47}").mkString(" ")
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(simhash64(doc), simhash64(doc)) == 0)
    assert(hamming(simhash64(doc), simhash64(nearDup)) <= 3)
    assert(hamming(simhash64(doc), simhash64(other)) > 10)
  }

  test("minhash signature estimates jaccard within 0.15") {
    import graft.dedup.Dedup.{minhashSignature, minhashPerms}
    val a = (0 until 200).map(i => s"sh$i").toSet
    val b = (50 until 250).map(i => s"sh$i").toSet // true jaccard = 150/250 = 0.6
    val sa = minhashSignature(a)
    val sb = minhashSignature(b)
    val est = (0 until minhashPerms).count(i => sa(i) == sb(i)).toDouble / minhashPerms
    assert(math.abs(est - 0.6) < 0.15, s"estimate $est")
  }

  test("media sniffing by magic bytes") {
    assert(Multimodal.sniffMedia(Array(0x89.toByte, 'P', 'N', 'G')) == "image/png")
    assert(Multimodal.sniffMedia(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte)) == "image/jpeg")
    assert(Multimodal.sniffMedia("GIF89a".getBytes) == "image/gif")
    assert(Multimodal.sniffMedia("RIFFxxxxWAVE".getBytes) == "audio/wav")
    assert(Multimodal.sniffMedia("RIFFxxxxAVI ".getBytes) == "video/x-msvideo")
    assert(Multimodal.sniffMedia("RIFFxxxxACON".getBytes) == "audio/riff")
    assert(Multimodal.sniffMedia("BMxxxx".getBytes) == "image/bmp")
    assert(Multimodal.sniffMedia("P6\n2 2\n255\n".getBytes) == "image/x-portable-pixmap")
    assert(Multimodal.sniffMedia("%PDF-1.4".getBytes) == "application/pdf")
    assert(Multimodal.sniffMedia("<!DOCTYPE html>".getBytes) == "text/html")
    assert(Multimodal.sniffMedia(Array[Byte](0, 1, 2, 3)) == "application/octet-stream")
  }

  test("webp header parse: VP8 / VP8L / VP8X still and animated") {
    import graft.fixtures.MediaFixtures
    import graft.multimodal.MediaCodecs
    val lossy = MediaCodecs.parseWebp(MediaFixtures.webp(320, 240, variant = 0))
    assert((lossy.width, lossy.height, lossy.frames, lossy.variant) ==
      ((320, 240, 1, "vp8")))
    val lossless = MediaCodecs.parseWebp(MediaFixtures.webp(1, 1, variant = 1))
    assert((lossless.width, lossless.height, lossless.variant) == ((1, 1, "vp8l")))
    // VP8X canvas dims are authoritative over the 1x1 VP8 fragment inside
    val still = MediaCodecs.parseWebp(MediaFixtures.webp(500, 300, variant = 2))
    assert((still.width, still.height, still.frames, still.variant) ==
      ((500, 300, 1, "vp8x")))
    val anim = MediaCodecs.parseWebp(MediaFixtures.webp(64, 64, variant = 2, frames = 5))
    assert((anim.width, anim.height, anim.frames) == ((64, 64, 5)))
    // a WEBP wrapper with no bitstream chunk must fail NAMED, not succeed
    val hollow = ("RIFF" + "\u0004\u0000\u0000\u0000" + "WEBPJUNK").getBytes("ISO-8859-1")
    val e = intercept[IllegalArgumentException](MediaCodecs.parseWebp(hollow))
    assert(e.getMessage.contains("VP8"))
  }

  test("ico directory parse: largest entry wins, 0-coded axis means 256") {
    import graft.fixtures.MediaFixtures
    import graft.multimodal.MediaCodecs
    val multi = MediaCodecs.parseIco(MediaFixtures.ico(48, 48, count = 3))
    assert((multi.width, multi.height, multi.frames) == ((48, 48, 3)))
    val max = MediaCodecs.parseIco(MediaFixtures.ico(256, 256, count = 1))
    assert((max.width, max.height) == ((256, 256)))
    // truncated directory must fail contained, not read past the payload
    val trunc = MediaFixtures.ico(32, 32, count = 2).take(20)
    intercept[IllegalArgumentException](MediaCodecs.parseIco(trunc))
  }

  test("heif/avif parse: pitm/ipma resolution, thumbnail cannot shadow canvas") {
    import graft.fixtures.MediaFixtures
    import graft.multimodal.MediaCodecs
    val plain = MediaCodecs.parseHeif(MediaFixtures.heif(1280, 960))
    assert(plain.width == 1280 && plain.height == 960 &&
      plain.brand == "heic" && plain.items == 1)
    // thumbnail item present AND its ispe listed FIRST in ipco: a first-
    // or largest-ispe shortcut would report 160x120
    val shadow = MediaCodecs.parseHeif(MediaFixtures.heif(
      4032, 3024, thumb = Some((160, 120)), thumbFirst = true))
    assert(shadow.width == 4032 && shadow.height == 3024 && shadow.items == 2)
    val avif = MediaCodecs.parseHeif(MediaFixtures.heif(640, 480, brand = "avif"))
    assert(avif.brand == "avif" && avif.width == 640)
    // sniff: still-image brands claim before the generic movie arm
    assert(Multimodal.sniffMedia(MediaFixtures.heif(8, 8)) == "image/heif")
    assert(Multimodal.sniffMedia(MediaFixtures.heif(8, 8, brand = "avif")) == "image/avif")
    // hand-packed vector: ftyp(heic) + meta{pitm->1, iprp{ipco[ispe 2x3],
    // ipma 1->[1]}} — byte layout pinned independently of the fixture
    val v = Array[Int](
      0, 0, 0, 16, 'f', 't', 'y', 'p', 'h', 'e', 'i', 'c', 0, 0, 0, 0,
      0, 0, 0, 82, 'm', 'e', 't', 'a', 0, 0, 0, 0,
      0, 0, 0, 14, 'p', 'i', 't', 'm', 0, 0, 0, 0, 0, 1,
      0, 0, 0, 56, 'i', 'p', 'r', 'p',
      0, 0, 0, 28, 'i', 'p', 'c', 'o',
      0, 0, 0, 20, 'i', 's', 'p', 'e', 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 0, 3,
      0, 0, 0, 20, 'i', 'p', 'm', 'a', 0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 1, 1
    ).map(_.toByte)
    val hand = MediaCodecs.parseHeif(v)
    assert(hand.width == 2 && hand.height == 3)
    // meta children in the OTHER legal order (pitm after iprp): same result
    val late = MediaCodecs.parseHeif(MediaFixtures.heif(
      800, 600, thumb = Some((20, 15)), thumbFirst = true, pitmLast = true))
    assert(late.width == 800 && late.height == 600)
    // a lying ipma entry_count must fail named, never read sibling bytes
    val lying = MediaFixtures.heif(10, 10).clone()
    val ipmaAt = new String(lying, "ISO-8859-1").indexOf("ipma")
    lying(ipmaAt + 11) = 9 // entry_count low byte: 1 -> 9
    val e0 = intercept[IllegalArgumentException](MediaCodecs.parseHeif(lying))
    assert(e0.getMessage.contains("ipma truncated"), e0.getMessage)
    // a primary item whose associations carry no ispe is a named error
    val noIspe = MediaFixtures.heif(10, 10).clone()
    // corrupt the pitm item id to 9 (no ipma entry): falls to the
    // no-association arm and must fail because pitm IS present
    val pitmAt = new String(noIspe, "ISO-8859-1").indexOf("pitm")
    noIspe(pitmAt + 9) = 9
    val e = intercept[IllegalArgumentException](MediaCodecs.parseHeif(noIspe))
    assert(e.getMessage.contains("no ispe association"), e.getMessage)
  }

  test("whitelist header sweep: psd/icns/pcx/jp2/tga/eps/xbm/xpm/svg(z)") {
    import graft.fixtures.MediaFixtures
    import graft.multimodal.MediaCodecs
    def dims(b: Array[Byte]) = MediaCodecs.imageHeader(b).map(m =>
      (m.mime, m.width, m.height))
    assert(dims(MediaFixtures.psd(640, 480)) ==
      Some(("image/vnd.adobe.photoshop", 640, 480)))
    assert(dims(MediaFixtures.icns(Seq(16, 512))) == Some(("image/icns", 512, 512)))
    assert(dims(MediaFixtures.pcx(320, 200)) == Some(("image/x-pcx", 320, 200)))
    assert(dims(MediaFixtures.jp2(800, 600)) == Some(("image/jp2", 800, 600)))
    assert(dims(MediaFixtures.tga(100, 75)) == Some(("image/x-tga", 100, 75)))
    assert(dims(MediaFixtures.eps(612, 792)) ==
      Some(("application/postscript", 612, 792)))
    assert(dims(MediaFixtures.xbm(24, 16)) == Some(("image/x-xbitmap", 24, 16)))
    assert(dims(MediaFixtures.xpm(48, 32)) == Some(("image/x-xpixmap", 48, 32)))
    assert(dims(MediaFixtures.svg(300, 150)) == Some(("image/svg+xml", 300, 150)))
    assert(dims(MediaFixtures.svg(300, 150, gzipped = true)) ==
      Some(("image/svg+xml", 300, 150)))
    // hostile: a TGA-shaped header WITHOUT the 2.0 footer is unclaimable
    // (v1 TGA has no magic at all — extension routing territory)
    assert(dims(MediaFixtures.tga(10, 10).dropRight(26)) == None)
    // icns entry overrunning its container fails named, not AIOOBE
    val bad = MediaFixtures.icns(Seq(64)).clone()
    bad(12 + 3) = 127 // entry length low... huge
    intercept[IllegalArgumentException](MediaCodecs.imageHeader(bad))
    // corrupt gzip svgz: named/None, never a crash
    val gz = MediaFixtures.svg(10, 10, gzipped = true).clone()
    gz(gz.length - 5) = 0x55
    assert(dims(gz).isEmpty || dims(gz).nonEmpty) // must not throw unnamed
    // an HTML page with an INLINE svg icon is a document, not an image —
    // the probe requires <svg as the root element
    val htmlWithIcon = ("<!DOCTYPE html>\n<html><body>" +
      "<svg width=\"24\" height=\"24\"><path d=\"M0 0\"/></svg>" +
      "</body></html>").getBytes("UTF-8")
    assert(dims(htmlWithIcon) == None)
    // stroke-width / data-width must never match as the width attribute
    val strokey = ("<svg stroke-width=\"2\" data-width=\"5\" width=\"300\" " +
      "height=\"150\"></svg>").getBytes("UTF-8")
    assert(dims(strokey) == Some(("image/svg+xml", 300, 150)))
    // a C config header full of #defines (no _bits[] array) is NOT an XBM
    val config = ("#define screen_width 640\n#define screen_height 480\n" +
      "#define retries 3\n").getBytes("UTF-8")
    assert(dims(config) == None)
  }

  test("unclaimed payloads yield MARKED stub rows, never fabricated dims") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val opaque = Array.tabulate(24)(i => (0x80 | (i * 7)).toByte)
    val rows = Multimodal.decodeFeatures(
      Seq(Multimodal.MediaRow(1L, "", opaque)).toDS()).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.error == Multimodal.StubDecodeError)
    assert(r.width == 0 && r.height == 0 && r.n_frames == 0 && r.feature.isEmpty)
    assert(r.media_type == "application/octet-stream")
  }

  test("decodeFeatures: webm video dims and audio-header durations are real") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import graft.fixtures.MediaFixtures
    val rows = Multimodal.decodeFeatures(Seq(
      Multimodal.MediaRow(1L, "", MediaFixtures.webm(2, 48000, 1500,
        video = Some((1280, 720)))),
      Multimodal.MediaRow(2L, "", MediaFixtures.au(1, 1, 8000, 4000, 0)),
      // claimed-but-corrupt: ADTS chain truncated mid-frame → ERROR row
      // (named), never a stub row and never fabricated metadata
      Multimodal.MediaRow(3L, "", {
        val a = MediaFixtures.adtsAac(3, 2, 3); java.util.Arrays.copyOf(a, a.length - 5)
      })).toDS()).collect().sortBy(_.doc_id)
    assert(rows(0).media_type == "video/webm" && rows(0).error == "")
    assert(rows(0).width == 1280 && rows(0).height == 720)
    assert(rows(0).feature.toSeq == Seq(1.5f))
    assert(rows(1).media_type == "audio/basic" && rows(1).error == "")
    assert(rows(1).feature.toSeq == Seq(0.5f)) // 4000 frames @ 8 kHz
    assert(rows(2).error.nonEmpty && rows(2).error != Multimodal.StubDecodeError)
  }

  test("avi mjpeg: real frame-by-frame sample decode with closed-form sums") {
    import graft.fixtures.MediaFixtures
    import graft.multimodal.MediaCodecs
    val (w, h, frames, seed) = (17, 13, 3, 40)
    val bytes = MediaFixtures.aviMjpeg(w, h, frames, seed, 40000) // 25 fps
    assert(Multimodal.sniffMedia(bytes) == "video/x-msvideo")
    val m = MediaCodecs.parseAvi(bytes)
    assert((m.width, m.height, m.frames) == ((w, h, frames)))
    assert(m.durationMs == 120L)
    // per-frame closed form: w*(h*(seed+f) + 4q(q-1) + rq), q=h/8, r=h%8
    val (q, r) = (h / 8, h % 8)
    val expected = (0 until frames)
      .map(f => w.toLong * (h * (seed + f) + 4 * q * (q - 1) + r * q)).sum
    assert(m.pixelSum == expected)
    // odd-length JPEG frames exercise the 2-byte chunk alignment: a width
    // that makes the entropy stream length flip parity across frames
    val odd = MediaCodecs.parseAvi(MediaFixtures.aviMjpeg(11, 9, 5, 7, 33000))
    assert(odd.frames == 5 && odd.durationMs == 165L)
  }

  test("avi parse fails NAMED on canvas mismatch, decode bomb, and overrun") {
    import graft.fixtures.MediaFixtures
    import graft.multimodal.MediaCodecs
    val bytes = MediaFixtures.aviMjpeg(17, 13, 2, 40, 40000)
    // avih body starts at 32 (RIFF 12 + LIST hdr 8 + 'hdrl' 4 + chunk hdr 8);
    // dwWidth/dwHeight sit at body+32/+36
    def patched(pairs: (Int, Int)*): Array[Byte] = {
      val b = bytes.clone()
      for ((off, v) <- pairs)
        java.nio.ByteBuffer.wrap(b, off, 4)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v)
      b
    }
    val mismatch = intercept[IllegalArgumentException](
      MediaCodecs.parseAvi(patched(64 -> 18)))
    assert(mismatch.getMessage.contains("!= canvas"))
    val bomb = intercept[IllegalArgumentException](
      MediaCodecs.parseAvi(patched(64 -> 5000, 68 -> 5000)))
    assert(bomb.getMessage.contains("16M-pixel cap"))
    val overrun = intercept[IllegalArgumentException](
      MediaCodecs.parseAvi(java.util.Arrays.copyOf(bytes, bytes.length - 6)))
    assert(overrun.getMessage.contains("overruns"))
  }

  test("non-MJPEG avi stays on the marked stub row, never an error row") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import graft.fixtures.MediaFixtures
    import graft.multimodal.MediaCodecs
    // rewrite both MJPG fourccs (strh handler + strf biCompression) to XVID:
    // an inter-frame codec this engine has no sample decoder for
    val xvid = MediaFixtures.aviMjpeg(17, 13, 2, 40, 40000)
    var found = 0
    for (i <- 0 until xvid.length - 4
         if xvid(i) == 'M' && xvid(i + 1) == 'J' && xvid(i + 2) == 'P' && xvid(i + 3) == 'G') {
      "XVID".getBytes.copyToArray(xvid, i)
      found += 1
    }
    assert(found == 2, s"expected 2 MJPG fourccs, found $found")
    assert(!MediaCodecs.isMjpegAvi(xvid))
    val e = intercept[IllegalArgumentException](MediaCodecs.parseAvi(xvid))
    assert(e.getMessage.contains("not MJPEG"), e.getMessage)
    // dispatcher contract: the payload sniffs as AVI but is UNCLAIMED, so
    // the row is a marked stub — distinguishable in the data, never an
    // error row and never fabricated dims
    val rows = Multimodal.decodeFeatures(
      Seq(Multimodal.MediaRow(1L, "", xvid)).toDS()).collect()
    assert(rows.head.media_type == "video/x-msvideo")
    assert(rows.head.error == Multimodal.StubDecodeError)
    assert(rows.head.width == 0 && rows.head.n_frames == 0)
    // truncated/corrupt containers also stay unclaimed by the probe
    assert(!MediaCodecs.isMjpegAvi(java.util.Arrays.copyOf(xvid, 40)))
  }

  test("decodeFeatures/decodeVideos: avi frames measured from pixels") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import graft.fixtures.MediaFixtures
    // flat frames (h=8: one band = seed+f everywhere) make the mean exact:
    // mean = (seed + (F-1)/2) / 255 for F odd
    val clip = MediaFixtures.aviMjpeg(16, 8, 3, 100, 40000)
    val feats = Multimodal.decodeFeatures(
      Seq(Multimodal.MediaRow(1L, "", clip)).toDS()).collect()
    assert(feats.head.media_type == "video/x-msvideo" && feats.head.error == "")
    assert(feats.head.width == 16 && feats.head.height == 8 && feats.head.n_frames == 3)
    assert(feats.head.feature.toSeq == Seq(0.12f, 101f / 255f))
    val vids = Multimodal.decodeVideos(Seq(
      Multimodal.MediaRow(1L, "", clip),
      Multimodal.MediaRow(2L, "", "not a clip".getBytes)).toDS())
      .collect().sortBy(_.doc_id)
    assert(vids(0).frames == 3 && vids(0).pixel_sum == 16L * 8 * (3 * 100 + 3))
    assert(vids(1).error.nonEmpty && vids(1).pixel_sum == 0L)
  }

  test("containment: parse errors contain, VM errors propagate") {
    import graft.util.Containment
    assert(Containment.contained[String](e => "contained:" + e.getMessage) {
      throw new IllegalArgumentException("bad payload")
    } == "contained:bad payload")
    intercept[OutOfMemoryError] {
      Containment.contained[String](_ => "should not contain") {
        throw new OutOfMemoryError("injected")
      }
    }
    intercept[StackOverflowError] {
      Containment.contained[String](_ => "should not contain") {
        throw new StackOverflowError()
      }
    }
  }

  test("wav with zero bits-per-sample fails NAMED at the parser") {
    import graft.fixtures.MediaFixtures
    import graft.multimodal.MediaCodecs
    val wav = MediaFixtures.wav(1, 8000, 10, 0)
    wav(34) = 0 // bitsPerSample u16le -> 0
    wav(35) = 0
    val e = intercept[IllegalArgumentException](MediaCodecs.parseWav(wav))
    assert(e.getMessage.contains("bits-per-sample"))
  }
}

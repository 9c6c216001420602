package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fixtures.MediaFixtures
import graft.multimodal.{AudioConvert, MediaCodecs}
import graft.multimodal.AudioConvert.AudioBuf

/** The audio convert surface: hand-packed known-vector decodes (pinning the
  * encoder/decoder pairs to bytes neither wrote), cross-container sample
  * exactness, the integer-exact effects algebra, and the named-error
  * contract for lossy targets and hostile headers. */
class AudioConvertSpec extends AnyFunSuite {

  // ---- hand-packed known vectors ------------------------------------------

  test("hand-packed AIFF vector decodes exactly (incl. 80-bit 44100 rate)") {
    // FORM/AIFF, COMM: 1 ch, 3 frames, 16-bit, rate 44100 = 0x400E AC44...,
    // SSND offset 0: samples +1, -2, +300 big-endian
    val bytes = Array[Int](
      'F', 'O', 'R', 'M', 0, 0, 0, 0x34, 'A', 'I', 'F', 'F',
      'C', 'O', 'M', 'M', 0, 0, 0, 18,
      0, 1, // channels
      0, 0, 0, 3, // frames
      0, 16, // bits
      0x40, 0x0E, 0xAC, 0x44, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, // 44100
      'S', 'S', 'N', 'D', 0, 0, 0, 14,
      0, 0, 0, 0, 0, 0, 0, 0, // offset, block size
      0x00, 0x01, 0xFF, 0xFE, 0x01, 0x2C).map(_.toByte)
    val (meta, samples) = MediaCodecs.aiffSamples(bytes)
    assert(meta.channels == 1 && meta.frameRate == 44100 && meta.bitsPerSample == 16)
    assert(meta.durationMs == 3 * 1000L / 44100)
    assert(samples.toSeq == Seq(1, -2, 300))
  }

  test("hand-packed AIFF 8-bit samples are signed (unlike WAV's bias)") {
    // 1 ch, 2 frames, 8-bit, rate 8000 = 0x400B FA00...: samples -1, +5
    val bytes = Array[Int](
      'F', 'O', 'R', 'M', 0, 0, 0, 0x30, 'A', 'I', 'F', 'F',
      'C', 'O', 'M', 'M', 0, 0, 0, 18,
      0, 1, 0, 0, 0, 2, 0, 8,
      0x40, 0x0B, 0xFA, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, // 8000
      'S', 'S', 'N', 'D', 0, 0, 0, 10,
      0, 0, 0, 0, 0, 0, 0, 0,
      0xFF, 0x05).map(_.toByte)
    val (meta, samples) = MediaCodecs.aiffSamples(bytes)
    assert(meta.frameRate == 8000 && meta.bitsPerSample == 8)
    assert(samples.toSeq == Seq(-1, 5))
  }

  test("aiff fixture decodes to the same sample series as the wav fixture") {
    for (bits <- Seq(8, 16); channels <- Seq(1, 2)) {
      val w = AudioConvert.decodeSamples(MediaFixtures.wav(channels, 16000, 50, 30, bits))
      val a = AudioConvert.decodeSamples(MediaFixtures.aiff(channels, 16000, 50, 30, bits))
      assert(w.samples.toSeq == a.samples.toSeq, s"bits=$bits ch=$channels")
      assert(w.frameRate == a.frameRate && w.channels == a.channels && w.bits == a.bits)
    }
  }

  // ---- encoder/decoder roundtrips ------------------------------------------

  test("encodeWav/encodeAiff roundtrip sample-exactly at both depths") {
    val samples = Array.tabulate(120)(i => ((i * 37 + 11) % 4096) - 2048)
    val small = samples.map(s => Math.floorDiv(s, 16)) // 8-bit range
    for ((bits, src) <- Seq((16, samples), (8, small)); channels <- Seq(1, 2)) {
      val buf = AudioBuf(channels, 22050, bits, src)
      // the lossless targets; ogg is lossy by nature and has its own
      // SNR-bounded roundtrip in VorbisEncoderSpec
      for (fmt <- AudioConvert.encodeFormats.filterNot(_ == "ogg")) {
        val rt = AudioConvert.decodeSamples(AudioConvert.encode(buf, fmt))
        assert(rt.samples.toSeq == src.toSeq, s"$fmt bits=$bits ch=$channels")
        assert(rt.frameRate == 22050 && rt.channels == channels && rt.bits == bits)
      }
    }
  }

  test("cross-container convert preserves samples bit-exactly") {
    val wav = MediaFixtures.wav(2, 44100, 200, 77)
    val viaAiff = AudioConvert.convert(wav, "aiff")
    val back = AudioConvert.convert(viaAiff.output, "wav")
    assert(AudioConvert.decodeSamples(back.output).samples.toSeq ==
      AudioConvert.decodeSamples(wav).samples.toSeq)
    // canonical sizes: wav = 44 + data, aiff = 54 + data
    assert(viaAiff.newSize == 54 + 200 * 2 * 2)
    assert(back.newSize == 44 + 200 * 2 * 2)
  }

  // ---- effects algebra ------------------------------------------------------

  test("gainDb doubles/halves at ±20log10(2) dB and clamps at the rails") {
    val db2x = 20.0 * math.log10(2.0)
    val buf = AudioBuf(1, 8000, 16, Array(100, -250, 32000, -32768))
    val up = AudioConvert.gainDb(buf, db2x)
    assert(up.samples.toSeq == Seq(200, -500, 32767, -32768)) // clamped rails
    val down = AudioConvert.gainDb(buf, -db2x)
    assert(down.samples.toSeq == Seq(50, -125, 16000, -16384))
    // audioop fbound FLOORS toward minus infinity (pydub's gain path):
    // 0.57x of 3 is 1.71 -> 1 (round would say 2); of -3 is -1.71 -> -2
    val db057 = 20.0 * math.log10(0.57)
    val fl = AudioConvert.gainDb(AudioBuf(1, 8000, 16, Array(3, -3)), db057)
    assert(fl.samples.toSeq == Seq(1, -2), fl.samples.toSeq.toString)
  }

  test("fades are truncating-division linear ramps; oversize window fades all") {
    val buf = AudioBuf(1, 1000, 16, Array(1000, 1000, 1000, -999))
    // 2ms at 1000 Hz = 2 frames
    val in = AudioConvert.fadeIn(buf, 2)
    assert(in.samples.toSeq == Seq(0, 500, 1000, -999))
    val out = AudioConvert.fadeOut(buf, 2)
    // f=2: 1000*(3-2)/2 = 500; f=3: -999*0/2 = 0
    assert(out.samples.toSeq == Seq(1000, 1000, 500, 0))
    // negative samples truncate toward zero — the semantics of both JVM /
    // and DuckDB's integer // (NOT Python's floor //)
    val neg = AudioConvert.fadeIn(AudioBuf(1, 1000, 16, Array(-7, -7, -7)), 3)
    assert(neg.samples.toSeq == Seq(0, -7 / 3, -14 / 3))
    assert(neg.samples(2) == -4) // trunc, where floor would give -5
    val all = AudioConvert.fadeOut(buf, 1000) // 1000ms >> 4 frames
    assert(all.samples.toSeq == Seq(1000 * 3 / 4, 1000 * 2 / 4, 1000 / 4, 0))
  }

  test("fades scale frames, not flat samples (stereo stays channel-aligned)") {
    val buf = AudioBuf(2, 1000, 16, Array(100, 200, 100, 200, 100, 200, 100, 200))
    val in = AudioConvert.fadeIn(buf, 2) // k = 2 frames
    assert(in.samples.toSeq == Seq(0, 0, 50, 100, 100, 200, 100, 200))
  }

  test("speedup keeps every k-th frame; slice windows by ms with clamping") {
    val buf = AudioBuf(2, 1000, 16, Array.tabulate(20)(identity)) // 10 frames
    val sped = AudioConvert.speedup(buf, 3)
    // frames 0, 3, 6, 9 -> samples (0,1),(6,7),(12,13),(18,19)
    assert(sped.samples.toSeq == Seq(0, 1, 6, 7, 12, 13, 18, 19))
    val cut = AudioConvert.slice(buf, 2, 5) // frames [2, 5)
    assert(cut.samples.toSeq == Seq(4, 5, 6, 7, 8, 9))
    assert(AudioConvert.slice(buf, 50, 100).samples.isEmpty) // past the end
    assert(AudioConvert.slice(buf, 0, Long.MaxValue / 2).frames == 10)
    // negative ms are offsets from the clip end (Python slice semantics):
    // clip is 10 ms at 1000 Hz, so [-4:] = frames [6, 10)
    val tail4 = AudioConvert.slice(buf, -4, Long.MaxValue / 2)
    assert(tail4.samples.toSeq == Seq(12, 13, 14, 15, 16, 17, 18, 19))
    // [:-8] = frames [0, 2); and an over-long negative start clamps to 0
    assert(AudioConvert.slice(buf, 0, -8).samples.toSeq == Seq(0, 1, 2, 3))
    assert(AudioConvert.slice(buf, -999, Long.MaxValue / 2).frames == 10)
  }

  test("durationMs rounds like pydub len(), not truncating") {
    // 44099 frames at 44100 Hz: 999.977 ms -> pydub len() == 1000, not 999
    val buf = AudioBuf(1, 44100, 16, new Array[Int](44099))
    assert(buf.durationMs == 1000L)
    // and a dividing case stays exact
    assert(AudioBuf(1, 8000, 16, new Array[Int](160)).durationMs == 20L)
  }

  test("convert applies the reference's kwarg order and reports accounting") {
    val wav = MediaFixtures.wav(1, 8000, 400, 10)
    val r = AudioConvert.convert(wav, "aiff", fadeOutMs = 5, startMs = 2, endMs = 25)
    // slice AFTER fade: frames [16, 200), fade window was the last 40 of 400
    assert(r.frameRate == 8000 && r.channels == 1 && r.sampleWidth == 2)
    assert(r.durationMs == (200 - 16) * 1000L / 8000)
    assert(r.originalSize == wav.length && r.newSize == 54 + (200 - 16) * 2)
    val dec = AudioConvert.decodeSamples(r.output)
    assert(dec.frames == 200 - 16)
    // untouched mid-clip sample: s_f = 10 + f - 2048 at f = 100
    assert(dec.samples(100 - 16) == 10 + 100 - 2048)
  }

  test("mergeAudio concatenates segments sample-exactly across containers") {
    val a = MediaFixtures.wav(1, 8000, 50, 10)
    val b = MediaFixtures.aiff(1, 8000, 30, 99)
    val r = AudioConvert.mergeAudio(Seq(a, b), "wav")
    val dec = AudioConvert.decodeSamples(r.output)
    assert(dec.frames == 80 && r.durationMs == 80 * 1000L / 8000)
    assert(dec.samples.take(50).toSeq ==
      AudioConvert.decodeSamples(a).samples.toSeq)
    assert(dec.samples.drop(50).toSeq ==
      AudioConvert.decodeSamples(b).samples.toSeq)
    // mismatched rates are a named error, never silent resampling
    val e = intercept[IllegalArgumentException](
      AudioConvert.mergeAudio(Seq(a, MediaFixtures.wav(1, 16000, 10, 0)), "wav"))
    assert(e.getMessage.contains("resampling"), e.getMessage)
    intercept[IllegalArgumentException](AudioConvert.mergeAudio(Nil, "wav"))
  }

  // ---- named errors ---------------------------------------------------------

  test("lossy/unknown audio targets and non-audio inputs are named errors") {
    val wav = MediaFixtures.wav(1, 8000, 10, 0)
    for (fmt <- Seq("mp3", "m4a", "opus", "wma", "aac"))
      assert(intercept[IllegalArgumentException](
        AudioConvert.convert(wav, fmt)).getMessage.contains("codec"), fmt)
    assert(intercept[IllegalArgumentException](
      AudioConvert.convert(wav, "xyz")).getMessage.contains("unsupported output"))
    assert(intercept[IllegalArgumentException](
      AudioConvert.decodeSamples("not audio".getBytes)).getMessage
      .contains("unsupported audio input"))
  }

  test("oversized PCM payloads fail the 16M-sample cap by name, not OOM") {
    // a real 8-bit mono WAV one sample past the cap (~16 MiB payload): the
    // decode would allocate a 64 MiB+ Int array — the cap must fire first,
    // named, so the row contains instead of killing the task
    val big = MediaCodecs.encodeWav(1, 8000, 8,
      new Array[Int]((1 << 24) + 1))
    val e = intercept[IllegalArgumentException](AudioConvert.decodeSamples(big))
    assert(e.getMessage.contains("16M-sample decode cap"), e.getMessage)
    // metadata-only parse of the same payload stays fine (no allocation)
    assert(MediaCodecs.parseWav(big).dataBytes == (1L << 24) + 1)
  }

  test("hostile FLAC STREAMINFO fails the sample cap by name before allocating") {
    // a ~100-byte payload claiming 8 channels x 2^26 frames would demand a
    // 2 GiB Array[Int] BEFORE any frame sync-check can reject it — patch a
    // real stream's packed rate/ch/bps/total field (STREAMINFO bytes 10-17,
    // absolute 18-25: rate 20 bits, ch-1 3, bps-1 5, total 36)
    val good = graft.multimodal.FlacCodec.encode(
      AudioConvert.AudioBuf(1, 8000, 16, Array.tabulate(64)(i => i - 32)), 5, Seq.empty)
    val evil = good.clone()
    val rate = 8000; val ch = 8; val bps = 16; val total = 1L << 26
    evil(18) = (rate >> 12).toByte
    evil(19) = ((rate >> 4) & 0xff).toByte
    evil(20) = (((rate & 0xf) << 4) | ((ch - 1) << 1) | ((bps - 1) >> 4)).toByte
    evil(21) = ((((bps - 1) & 0xf) << 4) | ((total >> 32) & 0xf)).toInt.toByte
    evil(22) = ((total >> 24) & 0xff).toByte
    evil(23) = ((total >> 16) & 0xff).toByte
    evil(24) = ((total >> 8) & 0xff).toByte
    evil(25) = (total & 0xff).toByte
    val meta = MediaCodecs.parseFlac(evil)
    assert(meta.channels == 8 && meta.totalSamples == total, "patch landed")
    val e = intercept[IllegalArgumentException](AudioConvert.decodeSamples(evil))
    assert(e.getMessage.contains("16M-sample"), e.getMessage)
  }

  test("mergeAudio re-establishes the sample cap across the fold") {
    // three segments, each individually under the decode cap, whose
    // concatenation is over it — must be a named error, not an OOM
    val seg = MediaCodecs.encodeWav(1, 8000, 8, new Array[Int](1 << 23))
    val e = intercept[IllegalArgumentException](
      AudioConvert.mergeAudio(Seq(seg, seg, seg), "wav"))
    assert(e.getMessage.contains("16M-sample"), e.getMessage)
  }

  test("non-finite gain is a named error, not silence or full scale") {
    val buf = AudioConvert.AudioBuf(1, 8000, 16, Array(100, -100, 3000))
    for (db <- Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity))
      assert(intercept[IllegalArgumentException](AudioConvert.gainDb(buf, db))
        .getMessage.contains("non-finite"), db.toString)
  }

  test("hostile AIFF headers fail named, never hang or fabricate") {
    val good = MediaFixtures.aiff(1, 8000, 10, 0)
    // negative chunk size would stall the walk
    val neg = good.clone(); neg(16) = 0xff.toByte
    intercept[IllegalArgumentException](MediaCodecs.parseAiff(neg))
    // SSND truncated vs COMM frame count
    val short = java.util.Arrays.copyOf(good, good.length - 4)
    // keep the SSND size field consistent with the truncated payload
    val e = intercept[IllegalArgumentException](MediaCodecs.parseAiff(short))
    assert(e.getMessage.nonEmpty)
    // non-integer sample rate (mantissa with a fraction bit set)
    val frac = good.clone(); frac(37) = 0x01 // low mantissa byte of the rate
    val e2 = intercept[IllegalArgumentException](MediaCodecs.parseAiff(frac))
    assert(e2.getMessage.contains("sample rate"))
  }

  // ---- the audio whitelist sweep ------------------------------------------

  test("µ-law expansion matches the published G.711 vectors") {
    // CCITT table endpoints and zeros
    assert(MediaCodecs.ulawToPcm(0x00) == -32124)
    assert(MediaCodecs.ulawToPcm(0x80) == 32124)
    assert(MediaCodecs.ulawToPcm(0xff) == 0)
    assert(MediaCodecs.ulawToPcm(0x7f) == 0)
    // one interior vector per sign: 0xEF (exp 1, mant 0) = +132
    assert(MediaCodecs.ulawToPcm(0xef) == 132)
    assert(MediaCodecs.ulawToPcm(0x6f) == -132)
  }

  test("au decodes all three encodings sample-exactly") {
    // PCM16 BE carries the wav fixture series
    val (m16, s16) = MediaCodecs.auSamples(MediaFixtures.au(3, 2, 16000, 50, 7))
    assert(m16.channels == 2 && m16.rate == 16000 && m16.durationMs == 50 * 1000L / 16000)
    assert(s16.toSeq == (0 until 100).map(f => (7 + f) % 4096 - 2048))
    // PCM8 is SIGNED per the au spec
    val (_, s8) = MediaCodecs.auSamples(MediaFixtures.au(2, 1, 8000, 30, 200))
    assert(s8.toSeq == (0 until 30).map(f => (200 + f) % 256 - 128))
    // µ-law constant byte expands through the G.711 table
    val (_, su) = MediaCodecs.auSamples(MediaFixtures.au(1, 1, 8000, 10, 0, ulawByte = 0xef))
    assert(su.toSeq == Seq.fill(10)(132))
    // au → wav convert crosses containers losslessly (µ-law widens to 16-bit)
    val r = AudioConvert.convert(MediaFixtures.au(3, 1, 8000, 40, 3), "wav")
    val back = AudioConvert.decodeSamples(r.output)
    assert(back.samples.toSeq == (0 until 40).map(f => (3 + f) % 4096 - 2048))
  }

  test("caf decodes both endiannesses and converts to wav sample-exactly") {
    for (little <- Seq(true, false)) {
      val bytes = MediaFixtures.caf(2, 22050, 60, 11, little)
      val (m, s) = MediaCodecs.cafSamples(bytes)
      assert(m.channels == 2 && m.rate == 22050 && m.littleEndian == little)
      assert(s.toSeq == (0 until 120).map(f => (11 + f) % 4096 - 2048))
      val r = AudioConvert.convert(bytes, "wav")
      assert(AudioConvert.decodeSamples(r.output).samples.toSeq == s.toSeq)
    }
  }

  test("ac3 frame size matches the published A/52 table") {
    // 384 kbps @ 48 kHz = 1536 bytes/frame; 32 kbps @ 44.1 kHz = 138/140
    val f48 = MediaFixtures.ac3(0, 28, 2, 0, nFrames = 1) // code 28 = 384 kbps
    assert(f48.length == 1536)
    val m = MediaCodecs.parseAc3(f48)
    assert(m.rate == 48000 && m.channels == 2 &&
      m.durationMs == 1536L * 1000 / 48000)
    assert(MediaFixtures.ac3(1, 0, 2, 0, 1).length == 138)
    assert(MediaFixtures.ac3(1, 1, 2, 0, 1).length == 140)
  }

  test("the audio header sweep parses every whitelist container") {
    def hm(b: Array[Byte]) = MediaCodecs.audioHeader(b).get
    val au = hm(MediaFixtures.au(1, 1, 8000, 800, 0))
    assert(au == MediaCodecs.AudioHeaderMeta("audio/basic", 1, 8000, 100))
    val caf = hm(MediaFixtures.caf(2, 44100, 441, 0, little = true))
    assert(caf == MediaCodecs.AudioHeaderMeta("audio/x-caf", 2, 44100, 10))
    val tta = hm(MediaFixtures.tta(2, 44100, 44100))
    assert(tta == MediaCodecs.AudioHeaderMeta("audio/x-tta", 2, 44100, 1000))
    val ape = hm(MediaFixtures.ape(2, 48000, 1024, 3, 352))
    assert(ape == MediaCodecs.AudioHeaderMeta("audio/x-ape", 2, 48000,
      (2 * 1024 + 352) * 1000L / 48000))
    val wv = hm(MediaFixtures.wavpack(mono = true, rateIdx = 9, totalSamples = 44100))
    assert(wv == MediaCodecs.AudioHeaderMeta("audio/x-wavpack", 1, 44100, 1000))
    val aac = hm(MediaFixtures.adtsAac(freqIdx = 3, chanCfg = 2, nFrames = 5))
    assert(aac == MediaCodecs.AudioHeaderMeta("audio/aac", 2, 48000,
      5 * 1024L * 1000 / 48000))
    val eac3 = hm(MediaFixtures.eac3(0, 3, 256, 7, 1, nFrames = 4))
    assert(eac3 == MediaCodecs.AudioHeaderMeta("audio/eac3", 6, 48000,
      4 * 6 * 256L * 1000 / 48000))
    val dts = hm(MediaFixtures.dts(13, 9, 7, 512, nFrames = 3))
    assert(dts == MediaCodecs.AudioHeaderMeta("audio/vnd.dts", 5, 48000,
      3 * 256L * 1000 / 48000))
    val thd = hm(MediaFixtures.truehd(rateNibble = 0, nAu = 120))
    assert(thd == MediaCodecs.AudioHeaderMeta("audio/truehd", 0, 48000, 100))
    val mlp = hm(MediaFixtures.truehd(rateNibble = 8, nAu = 120, mlp = true))
    assert(mlp == MediaCodecs.AudioHeaderMeta("audio/mlp", 0, 44100,
      120 * 40L * 1000 / 44100))
    val wma = hm(MediaFixtures.asfWma(2, 44100, 2500, 3000))
    assert(wma == MediaCodecs.AudioHeaderMeta("audio/x-ms-wma", 2, 44100, 2500))
    val webm = hm(MediaFixtures.webm(2, 48000, 1234))
    assert(webm == MediaCodecs.AudioHeaderMeta("audio/webm", 2, 48000, 1234))
    val mkvVid = hm(MediaFixtures.webm(2, 48000, 500,
      docType = "matroska", video = Some((640, 360))))
    assert(mkvVid == MediaCodecs.AudioHeaderMeta("video/x-matroska", 2, 48000, 500))
    val opus = hm(MediaFixtures.oggOpus(2, preSkip = 312, granule = 312 + 9600))
    assert(opus == MediaCodecs.AudioHeaderMeta("audio/opus", 2, 48000, 200))
    // Ogg VORBIS duration from the final granule — the existing fixture
    // writes granule 0 everywhere, so duration reads 0 (stream length
    // absent), channels/rate from the identification header
    val ogg = hm(MediaFixtures.oggVorbis(2, 44100, 128000, Seq("title" -> "t")))
    assert(ogg == MediaCodecs.AudioHeaderMeta("audio/ogg", 2, 44100, 0))
  }

  test("hostile audio headers fail named; unclaimables stay unclaimed") {
    // truncated ADTS frame chain
    val aac = MediaFixtures.adtsAac(3, 2, 3)
    intercept[IllegalArgumentException](
      MediaCodecs.parseAdts(java.util.Arrays.copyOf(aac, aac.length - 5)))
    // AC-3 frame overrunning the payload
    val ac3 = MediaFixtures.ac3(0, 28, 2, 0, 2)
    intercept[IllegalArgumentException](
      MediaCodecs.parseAc3(java.util.Arrays.copyOf(ac3, ac3.length - 2)))
    // EBML element lying about its size (TimecodeScale: 3-byte id 2A D7 B1,
    // then the 1-byte size varint)
    val mk = MediaFixtures.webm(2, 48000, 100).clone()
    val at = mk.indices.find(i => (mk(i) & 0xff) == 0x2a &&
      (mk(i + 1) & 0xff) == 0xd7 && (mk(i + 2) & 0xff) == 0xb1).get
    mk(at + 3) = 0xf0.toByte // claims 112 body bytes > enclosure
    intercept[IllegalArgumentException](MediaCodecs.parseMatroska(mk))
    // ASF with NO audio stream reports the video mime, zeroed audio params
    val asf = MediaFixtures.asfWma(2, 44100, 1000, 0)
    // blank out the audio-media GUID in the stream properties object
    val spAt = 30 + 104 + 24
    for (k <- 0 until 16) asf(spAt + k) = 0
    val m = MediaCodecs.parseAsf(asf)
    assert(m.mime == "video/x-ms-asf" && m.channels == 0 && m.durationMs == 1000)
    // WavPack with unknown total samples is a NAMED error, never duration 0
    val wv = MediaFixtures.wavpack(mono = false, rateIdx = 10, totalSamples = -1)
    val e = intercept[IllegalArgumentException](MediaCodecs.parseWavpack(wv))
    assert(e.getMessage.contains("unknown"), e.getMessage)
    // headerless .raw PCM has no magic: nothing claims it — including a
    // payload whose first samples happen to spell the 12-bit ADTS sync
    // (0xFF 0xF1 …): the structural gate (frame chaining) must reject it
    assert(MediaCodecs.audioHeader(Array.fill[Byte](64)(0x11)) == None)
    val rawish = Array.fill[Byte](64)(0x55)
    rawish(0) = 0xff.toByte; rawish(1) = 0xf1.toByte
    assert(!MediaCodecs.isAdts(rawish))
    assert(MediaCodecs.audioHeader(rawish) == None)
    // a 0x0B77-opening payload with garbage frame codes is likewise unclaimed
    val ac3ish = Array.fill[Byte](64)(0x3f)
    ac3ish(0) = 0x0b; ac3ish(1) = 0x77
    assert(!MediaCodecs.isAc3Sync(ac3ish))
    // hostile APE geometry (u32 fields near 2^32) fails named, never a
    // negative duration from Long overflow
    val ape = MediaFixtures.ape(2, 48000, 1024, 3, 352).clone()
    for (k <- 0 until 12) ape(52 + 4 + k) = 0xff.toByte // bpf/ffb/totalFrames
    val e2 = intercept[IllegalArgumentException](MediaCodecs.parseApe(ape))
    assert(e2.getMessage.contains("implausible"), e2.getMessage)
  }

  test("mpeg audio (.mp3): frame walk, ID3 wrappers, both versions") {
    import graft.fixtures.MediaFixtures
    import graft.multimodal.MediaCodecs
    // MPEG-1 Layer III stereo, 128 kbps (idx 9) @ 44.1 kHz, 3 frames
    val v1 = MediaFixtures.mp3Frames(mpeg2 = false, 9, 0, mono = false, 3)
    val m1 = MediaCodecs.audioHeader(v1).get
    assert(m1.mime == "audio/mpeg" && m1.channels == 2 && m1.rate == 44100)
    assert(m1.durationMs == 3L * 1152 * 1000 / 44100) // 78 ms
    // MPEG-2 mono (576 samples/frame, halved rate), ID3v2-prefixed and
    // ID3v1-terminated: both wrappers skipped, duration unchanged
    val v2 = MediaFixtures.mp3Frames(mpeg2 = true, 5, 1, mono = true, 4,
      id3 = Seq("TIT2" -> "t"), id3v1 = true)
    val m2 = MediaCodecs.parseMpegAudio(v2)
    assert(m2.channels == 1 && m2.rate == 24000)
    assert(m2.durationMs == 4L * 576 * 1000 / 24000) // 96 ms
    // VBR: bitrate index changes per frame; duration still frames x spf
    val a = MediaFixtures.mp3Frames(mpeg2 = false, 9, 0, mono = false, 1)
    val b = MediaFixtures.mp3Frames(mpeg2 = false, 14, 0, mono = false, 2)
    val vbr = MediaCodecs.parseMpegAudio(a ++ b)
    assert(vbr.durationMs == 3L * 1152 * 1000 / 44100)
  }

  test("mpeg audio hostile shapes: weak syncs unclaimed, corruption named") {
    import graft.fixtures.MediaFixtures
    import graft.multimodal.MediaCodecs
    val good = MediaFixtures.mp3Frames(mpeg2 = false, 9, 0, mono = false, 3)
    // free-format (bitrate index 0) has no derivable frame length: unclaimed
    val free = good.clone(); free(2) = (free(2) & 0x0f).toByte
    assert(!MediaCodecs.isMpegAudio(free))
    // reserved version bits: unclaimed
    val resVer = good.clone(); resVer(1) = (resVer(1) & ~0x18 | 0x08).toByte
    assert(!MediaCodecs.isMpegAudio(resVer))
    // a lone sync word that neither fills the payload nor chains: unclaimed
    assert(!MediaCodecs.isMpegAudio(good.take(50) ++ Array.fill[Byte](60)(0)))
    // truncation mid-frame is NAMED once claimed (first frame still chains)
    val cut = intercept[IllegalArgumentException](
      MediaCodecs.parseMpegAudio(java.util.Arrays.copyOf(good, good.length - 10)))
    assert(cut.getMessage.contains("MPEG audio"), cut.getMessage)
    // a mid-stream sample-rate change is NAMED, never a wrong duration
    val other = MediaFixtures.mp3Frames(mpeg2 = false, 9, 1, mono = false, 2)
    val mixed = intercept[IllegalArgumentException](
      MediaCodecs.parseMpegAudio(good ++ other))
    assert(mixed.getMessage.contains("sample rate changed"), mixed.getMessage)
    // an mp3 payload reaches decodeFeatures as REAL metadata, not a stub row
    val spark = SparkTestSession.spark
    import spark.implicits._
    val rows = graft.multimodal.Multimodal.decodeFeatures(
      Seq(graft.multimodal.Multimodal.MediaRow(1L, "", good)).toDS()).collect()
    assert(rows.head.media_type == "audio/mpeg" && rows.head.error == "")
  }

  test("matroska: child order, streamed clusters, and granule semantics") {
    // Audio element BEFORE TrackType inside the TrackEntry (Matroska does
    // not mandate child order): the pre-scan must still classify the track
    val base = MediaFixtures.webm(2, 48000, 700)
    def el(id: Array[Int], body: Array[Byte]): Array[Byte] =
      id.map(_.toByte).toArray ++ Array((0x80 | body.length).toByte) ++ body
    val audioFirst = el(Array(0xae),
      el(Array(0xe1),
        el(Array(0xb5), Array(0x47, 0x3b, 0x80, 0x00).map(_.toByte)) ++ // f32 48000
          el(Array(0x9f), Array(2.toByte))) ++
        el(Array(0x83), Array(2.toByte))) // TrackType LAST
    // swap the fixture's Tracks body for the reordered entry
    val tracksAt = base.indices.find(i => (base(i) & 0xff) == 0x16 &&
      (base(i + 1) & 0xff) == 0x54 && (base(i + 2) & 0xff) == 0xae &&
      (base(i + 3) & 0xff) == 0x6b).get
    val reordered = base.take(tracksAt) ++
      Array(0x16, 0x54, 0xae, 0x6b).map(_.toByte) ++
      Array((0x80 | audioFirst.length).toByte) ++ audioFirst
    // fix the unknown-size Segment wrapper: it already runs to end — fine
    val m = MediaCodecs.parseMatroska(reordered)
    assert(m.audioChannels == 2 && m.audioRate == 48000, m.toString)
    // a streamed unknown-size Cluster after the metadata parses fine
    val withCluster = base ++ Array(0x1f, 0x43, 0xb6, 0x75).map(_.toByte) ++
      Array(0xff.toByte) ++ Array.fill[Byte](10)(0)
    val mc = MediaCodecs.parseMatroska(withCluster)
    assert(mc.audioChannels == 2 && mc.durationMs == 700)
    // Ogg: the LAST granule wins, not the maximum (chained streams)
    val opus = MediaFixtures.oggOpus(1, preSkip = 0, granule = 4800)
    val early = MediaFixtures.oggOpus(1, preSkip = 0, granule = 96000)
    // splice: early pages (big granule) then the real tail (small granule)
    val chained = early ++ opus
    assert(MediaCodecs.lastOggGranule(chained) == 4800)
  }
}

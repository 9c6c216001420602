package graft.multimodal

/** Production audio CONVERT surface — the reference's audio direction
  * (/root/reference/src/converters/audio_converters.py:50-127: pydub load →
  * effects → `audio.export(format, bitrate)`). Pure-JVM PCM end to end:
  * decode RIFF/WAVE (little-endian) or FORM/AIFF (big-endian) — both appear
  * in the reference's audio input AND output whitelists (`:40-47`) — apply
  * the effects the reference exposes as kwargs, encode back to wav/aiff.
  *
  * The effects algebra is INTEGER-EXACT by construction (fades scale by
  * TRUNCATING integer division — the semantics of both JVM `/` and SQL
  * integer division, incl. DuckDB's `//` — and speed/slice are pure index
  * arithmetic), so a SQL oracle reproduces every output sample; the one
  * inherently floating effect (dB gain, `audio + dB` in pydub) floors
  * toward minus infinity and clamps to the sample depth — the exact
  * contract of CPython's audioop fbound ("Round towards minus infinity"),
  * which pydub's gain rides on.
  *
  * FLAC is the one losslessly-achievable entropy target and encodes for
  * real via [[FlacCodec]] (fixed predictors + Rice coding). mp3 INPUT
  * decodes for real via [[Mp3Codec]] (full Layer III — Huffman,
  * requantize, stereo, IMDCT, polyphase synthesis), and ogg-vorbis
  * rides BOTH directions — [[VorbisCodec]] decodes (in-stream
  * codebooks, floor 1, residue 0/1/2, coupling, IMDCT) and
  * [[VorbisEncoder]] encodes (fitted floor 1 + lattice residue over
  * the same shared tables) — so mp3 and ogg payloads ride the whole
  * convert/merge/effects surface like they do in pydub.
  * The remaining lossy ENCODE targets (mp3/aac/m4a/opus/wma) and
  * aac/m4a decode need the DSP codecs the reference delegates to
  * ffmpeg via pydub — asking for one is a named error, never fake bytes
  * (same contract as [[ImageConvert]]'s webp-lossy arm).
  */
object AudioConvert {

  /** Formats [[convert]] can WRITE. */
  val encodeFormats: IndexedSeq[String] = IndexedSeq("wav", "aiff", "flac", "ogg")

  /** Decoded interleaved PCM: `samples(f * channels + c)`, values already
    * sign-corrected to the depth's range ([-32768,32767] or [-128,127]). */
  final case class AudioBuf(channels: Int, frameRate: Int, bits: Int,
                            samples: Array[Int]) {
    def frames: Int = samples.length / channels
    /** pydub `len(audio)` ROUNDS the millisecond duration (`__len__` is
      * `round(1000 * frames / rate)`) — truncation would under-report by
      * 1 ms for most non-dividing rates. Integer half-up form so the SQL
      * oracles reproduce it exactly; pydub's Python-3 round is half-EVEN,
      * which differs only at exact .5 ms boundaries (disclosed). */
    def durationMs: Long = (frames * 2000L + frameRate) / (2L * frameRate)
  }

  /** wav/aiff/au/caf bytes → samples, dispatched by magic (never by
    * extension). au µ-law expands to the 16-bit range; au PCM8 and CAF i8
    * are signed (bits=8 keeps the [-128,127] contract). */
  def decodeSamples(bytes: Array[Byte]): AudioBuf =
    if (MediaCodecs.isWav(bytes)) {
      val (m, s) = MediaCodecs.wavSamples(bytes)
      AudioBuf(m.channels, m.frameRate, m.bitsPerSample, s)
    } else if (MediaCodecs.isAiff(bytes)) {
      val (m, s) = MediaCodecs.aiffSamples(bytes)
      AudioBuf(m.channels, m.frameRate, m.bitsPerSample, s)
    } else if (MediaCodecs.isAu(bytes)) {
      val (m, s) = MediaCodecs.auSamples(bytes)
      AudioBuf(m.channels, m.rate, if (m.encoding == 2) 8 else 16, s)
    } else if (MediaCodecs.isCaf(bytes)) {
      val (m, s) = MediaCodecs.cafSamples(bytes)
      AudioBuf(m.channels, m.rate, m.bits, s)
    } else if (MediaCodecs.isFlac(bytes)) {
      FlacCodec.decodeSamples(bytes)
    } else if (Mp3Codec.isMp3(bytes)) {
      Mp3Codec.decodeSamples(bytes)
    } else if (VorbisCodec.isOggVorbis(bytes)) {
      VorbisCodec.decodeSamples(bytes)
    } else throw new IllegalArgumentException(
      "unsupported audio input (wav/aiff/au/caf PCM, flac, mp3, ogg-vorbis)")

  /** samples → target-format bytes. `flacLevel` is the reference's flac
    * `compression_level` export kwarg (audio_converters.py:97-99); the
    * other targets ignore it like pydub does. */
  def encode(buf: AudioBuf, fmt: String, flacLevel: Int = 5): Array[Byte] =
    fmt.toLowerCase.stripPrefix(".") match {
      case "wav" =>
        MediaCodecs.encodeWav(buf.channels, buf.frameRate, buf.bits, buf.samples)
      case "aiff" | "aif" =>
        MediaCodecs.encodeAiff(buf.channels, buf.frameRate, buf.bits, buf.samples)
      case "flac" => FlacCodec.encode(buf, flacLevel)
      case "ogg" | "oga" => VorbisEncoder.encode(buf)
      case f @ ("mp3" | "aac" | "m4a" | "opus" | "wma") =>
        throw new IllegalArgumentException(
          s"$f encode needs a lossy/DSP codec (the reference delegates " +
            "to ffmpeg inside pydub) — offered targets: wav, aiff, flac, ogg")
      case o => throw new IllegalArgumentException(s"unsupported output format $o")
    }

  private def clamp(v: Long, bits: Int): Int = {
    val lo = if (bits == 8) -128L else -32768L
    val hi = if (bits == 8) 127L else 32767L
    math.max(lo, math.min(hi, v)).toInt
  }

  /** pydub `audio + dB` (audio_converters.py:71-72): amplitude factor
    * 10^(db/20), FLOORED toward minus infinity and clamped to the depth —
    * audioop.mul's fbound semantics (pydub's apply_gain delegates there),
    * so e.g. 3 × 0.57 = 1.71 → 1, and -3 × 0.57 = -1.71 → -2. */
  def gainDb(buf: AudioBuf, db: Double): AudioBuf = {
    // NaN would silently zero every sample (Math.round(NaN) == 0) and
    // ±Infinity would pin full scale — fabricated-looking output from a
    // hostile kwarg must be a named error instead
    require(!db.isNaN && !db.isInfinity, s"non-finite volume gain $db dB")
    if (db == 0.0) buf
    else {
      val factor = math.pow(10.0, db / 20.0)
      buf.copy(samples =
        buf.samples.map(s => clamp(math.floor(s * factor).toLong, buf.bits)))
    }
  }

  /** Linear-amplitude ramp 0→1 over the first `ms` (the fade_in analog,
    * `:74-75`): frame `f < k` scales by `f/k`, truncating. A window longer
    * than the clip fades the whole clip. */
  def fadeIn(buf: AudioBuf, ms: Int): AudioBuf = {
    val k = math.min(ms.toLong * buf.frameRate / 1000, buf.frames.toLong).toInt
    if (k <= 0) buf
    else {
      val out = buf.samples.clone()
      var f = 0
      while (f < k) {
        var c = 0
        while (c < buf.channels) {
          val i = f * buf.channels + c
          out(i) = (out(i).toLong * f / k).toInt
          c += 1
        }
        f += 1
      }
      buf.copy(samples = out)
    }
  }

  /** Linear-amplitude ramp 1→0 over the last `ms` (the fade_out analog,
    * `:77-78`): frame `f >= n-k` scales by `(n-1-f)/k` truncating,
    * reaching exact silence on the final frame. */
  def fadeOut(buf: AudioBuf, ms: Int): AudioBuf = {
    val n = buf.frames
    val k = math.min(ms.toLong * buf.frameRate / 1000, n.toLong).toInt
    if (k <= 0) buf
    else {
      val out = buf.samples.clone()
      var f = n - k
      while (f < n) {
        var c = 0
        while (c < buf.channels) {
          val i = f * buf.channels + c
          out(i) = (out(i).toLong * (n - 1 - f) / k).toInt
          c += 1
        }
        f += 1
      }
      buf.copy(samples = out)
    }
  }

  /** Keep every `factor`-th frame — the deterministic analog of pydub's
    * `speedup(playback_speed)` (`:80-82`), restricted to integer factors so
    * output length and samples stay index arithmetic. */
  def speedup(buf: AudioBuf, factor: Int): AudioBuf = {
    require(factor >= 1, s"speed factor must be >= 1, got $factor")
    if (factor == 1) buf
    else {
      val m = (buf.frames + factor - 1) / factor
      val out = new Array[Int](m * buf.channels)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < buf.channels) {
          out(j * buf.channels + c) = buf.samples(j * factor * buf.channels + c)
          c += 1
        }
        j += 1
      }
      buf.copy(samples = out)
    }
  }

  /** ms → frame index, clamped to [0, cap] with Long-overflow saturation
    * (a hostile endMs must clamp to the clip end, not wrap negative). */
  private def msToFrame(ms: Long, rate: Int, cap: Int): Int =
    if (ms <= 0) 0
    else if (ms > Long.MaxValue / rate) cap
    else math.min(cap.toLong, ms * rate / 1000).toInt

  /** `audio[start:end]` (`:84-87`): frame window
    * [startMs*rate/1000, min(frames, endMs*rate/1000)), empty if inverted.
    * NEGATIVE milliseconds are offsets from the clip end (Python slice
    * semantics over pydub's rounded millisecond length): `[-5000:]` is the
    * last five seconds, not a start-of-clip no-op. */
  def slice(buf: AudioBuf, startMs: Long, endMs: Long): AudioBuf = {
    def fromEnd(ms: Long): Long =
      if (ms >= 0) ms else math.max(0L, buf.durationMs + ms)
    val a = msToFrame(fromEnd(startMs), buf.frameRate, buf.frames)
    val b = msToFrame(fromEnd(endMs), buf.frameRate, buf.frames)
    if (a == 0 && b == buf.frames) buf
    else if (b <= a) buf.copy(samples = Array.empty[Int])
    else buf.copy(samples =
      java.util.Arrays.copyOfRange(buf.samples, a * buf.channels, b * buf.channels))
  }

  /** Sample-level merge — the reference's `merge_audio` fold
    * (`combined += audio`, audio_converters.py:183-192): decoded segments
    * concatenate in order and export once. pydub silently resamples
    * mismatched segments through ffmpeg; a deterministic engine requires
    * identical (channels, rate, bits) and fails named otherwise. */
  def mergeAudio(segments: Seq[Array[Byte]], targetFmt: String): AudioResult = {
    require(segments.nonEmpty, "merge_audio needs at least one segment")
    val bufs = segments.map(decodeSamples)
    val head = bufs.head
    for (b <- bufs.tail)
      require(b.channels == head.channels && b.frameRate == head.frameRate &&
        b.bits == head.bits,
        s"segment params ${b.channels}ch/${b.frameRate}Hz/${b.bits}bit differ " +
          s"from ${head.channels}ch/${head.frameRate}Hz/${head.bits}bit — " +
          "resampling needs a rate converter (pydub delegates to ffmpeg)")
    // re-establish the 16M-sample cap ACROSS the fold: each segment passes
    // its own decode cap, but the concatenation is a fresh allocation that
    // must fail named, not as an OutOfMemoryError (or an Int-overflowing
    // builder) once enough at-cap segments stack up
    val totalSamples = bufs.iterator.map(_.samples.length.toLong).sum
    require(totalSamples <= (1L << 24),
      s"merged audio of $totalSamples samples exceeds the 16M-sample cap")
    val merged = head.copy(samples = bufs.toArray.flatMap(_.samples))
    val out = encode(merged, targetFmt)
    AudioResult(out, targetFmt.toLowerCase.stripPrefix("."), merged.channels,
      merged.frameRate, merged.bits / 8, merged.durationMs,
      segments.map(_.length.toLong).sum, out.length.toLong)
  }

  /** The reference result dict's accounting fields
    * (audio_converters.py:105-120): duration/channels/sample_width/
    * frame_rate describe the CONVERTED audio; sizes are byte counts. */
  final case class AudioResult(output: Array[Byte], formatTo: String,
                               channels: Int, frameRate: Int, sampleWidth: Int,
                               durationMs: Long, originalSize: Long, newSize: Long)

  /** audio bytes → effects → target-format bytes, in the reference's kwarg
    * order (volume → fade_in → fade_out → speed → start/end slice,
    * audio_converters.py:70-87). */
  def convert(bytes: Array[Byte], targetFmt: String, gainDbArg: Double = 0.0,
              fadeInMs: Int = 0, fadeOutMs: Int = 0, startMs: Long = 0L,
              endMs: Long = Long.MaxValue, speed: Int = 1,
              compressionLevel: Int = 5): AudioResult = {
    var buf = decodeSamples(bytes)
    buf = gainDb(buf, gainDbArg)
    if (fadeInMs > 0) buf = fadeIn(buf, fadeInMs)
    if (fadeOutMs > 0) buf = fadeOut(buf, fadeOutMs)
    if (speed != 1) buf = speedup(buf, speed)
    if (startMs != 0L || endMs != Long.MaxValue) buf = slice(buf, startMs, endMs)
    val out = encode(buf, targetFmt, compressionLevel)
    AudioResult(out, targetFmt.toLowerCase.stripPrefix("."), buf.channels,
      buf.frameRate, buf.bits / 8, buf.durationMs, bytes.length.toLong,
      out.length.toLong)
  }
}

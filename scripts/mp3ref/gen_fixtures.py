#!/usr/bin/env python3
"""Generate the committed mp3 conformance fixtures + manifest.

Each fixture is built by encoder.py, decoded by decoder.py (the reference
implementation Mp3Codec.scala mirrors bit-exactly), and pinned in
src/main/resources/mp3/manifest.tsv as:

  name  sr  ch  samples  md5(int16le interleaved)  sum  maxabs  snr_db  desc

For audio-mode fixtures snr_db is the decode-vs-source SNR (transform+
quantization validation end to end); spectrum-mode fixtures carry '-'.
The real third-party stream (lame_silence, Apache-2.0 gsutil test data,
LAME MPEG-2 LSF mono) validates framing/reservoir/side-info against an
encoder that is not ours; it decodes to digital silence by construction.
"""
import hashlib
import math
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import decoder as dec
import encoder as enc
from encoder import GranuleSpec, build_frame

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "..", "..", "src", "main", "resources", "mp3")
LAME = "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"


def lcg_ints(seed, n, lo, hi):
    out = []
    state = seed & 0x7FFFFFFF
    for _ in range(n):
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        out.append(lo + state % (hi - lo + 1))
    return out


def tones(n, sr, freqs, amps, phases=None):
    phases = phases or [0.0] * len(freqs)
    return [sum(a * math.sin(2 * math.pi * f * i / sr + p)
                for f, a, p in zip(freqs, amps, phases))
            for i in range(n)]


def snr_vs_source(src, decoded, search=(900, 1300)):
    best = -1e9
    n = min(len(src), len(decoded))
    for d in range(*search):
        ref = src[:n - d]
        tst = decoded[d:n]
        es = sum(r * r for r in ref)
        en = sum((r - t) * (r - t) for r, t in zip(ref, tst))
        s = 10 * math.log10(es / en) if en > 0 else 999.0
        if s > best:
            best = s
    return best


def pin(name, data, desc, src_pcm=None):
    path = os.path.join(OUT, name + ".mp3")
    with open(path, "wb") as f:
        f.write(data)
    sr, nch, chans = dec.decode(data)
    pcm = dec.to_int16(chans)
    raw = b"".join(v.to_bytes(2, "little", signed=True) for v in pcm)
    md5 = hashlib.md5(raw).hexdigest()
    snr = "-"
    if src_pcm is not None:
        snr = "%.1f" % min(snr_vs_source(ch_src, ch_dec)
                           for ch_src, ch_dec in zip(src_pcm, chans))
    row = (name, str(sr), str(nch), str(len(chans[0])), md5,
           str(sum(pcm)), str(max(abs(v) for v in pcm)), str(snr), desc)
    print("  ".join(row))
    return row


def spectrum_frames(sr, mode, mode_ext, make_gr, nframes):
    frames = []
    ngr = 1 if sr in (22050, 24000, 16000) else 2
    nch = 1 if mode == 3 else 2
    for f in range(nframes):
        gr_specs = [[make_gr(f, gr, ch) for ch in range(nch)]
                    for gr in range(ngr)]
        frames.append(build_frame(sr, 160 if ngr == 1 else 320, mode,
                                  mode_ext, gr_specs))
    return b"".join(frames)


def main():
    os.makedirs(OUT, exist_ok=True)
    rows = []

    # --- audio-mode fixtures (end-to-end SNR validated) ---
    n1 = 3 * 1152
    src = [tones(n1, 44100, [441, 1323, 3087], [0.32, 0.22, 0.12])]
    data = enc.encode_audio(src, 44100, mode=3, global_gain=170)
    rows.append(pin("m1_mono_tones", data,
                    "MPEG-1 44.1k mono, long blocks, multi-tone", src))

    src = [tones(n1, 48000, [480, 2400], [0.35, 0.18]),
           tones(n1, 48000, [960, 3360], [0.30, 0.15], [0.7, 1.9])]
    data = enc.encode_audio(src, 48000, mode=0, global_gain=170)
    rows.append(pin("m1_stereo_lr", data,
                    "MPEG-1 48k stereo (LR), distinct tones per channel", src))

    base = tones(n1, 44100, [551.25, 1653.75], [0.30, 0.15])
    side = tones(n1, 44100, [826.875], [0.06], [0.4])
    src = [[b + s for b, s in zip(base, side)],
           [b - s for b, s in zip(base, side)]]
    data = enc.encode_audio(src, 44100, mode=1, mode_ext=2, global_gain=170)
    rows.append(pin("m1_ms_stereo", data,
                    "MPEG-1 44.1k joint stereo (MS), correlated channels", src))

    sf = [0, 0, 1, 1, 2, 2, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 1, 1, 0]
    src = [tones(n1, 32000, [400, 1600], [0.33, 0.2])]
    data = enc.encode_audio(src, 32000, mode=3, global_gain=172, sf_long=sf)
    rows.append(pin("m1_scalefacs", data,
                    "MPEG-1 32k mono with nonzero long scalefactors", src))

    n2 = 4 * 576
    src = [tones(n2, 22050, [330.75, 992.25], [0.35, 0.18])]
    data = enc.encode_audio(src, 22050, mode=3, global_gain=170,
                            sf_long=[0, 1, 1, 0, 2, 0, 1, 0, 1, 0, 0,
                                     1, 0, 1, 0, 0, 1, 0, 0, 0, 0])
    rows.append(pin("m2_lsf_mono", data,
                    "MPEG-2 LSF 22.05k mono, long blocks, LSF scalefactors", src))

    m = tones(n2, 24000, [375, 1125], [0.3, 0.15])
    s = tones(n2, 24000, [750], [0.05], [0.2])
    src = [[a + b for a, b in zip(m, s)], [a - b for a, b in zip(m, s)]]
    data = enc.encode_audio(src, 24000, mode=1, mode_ext=2, global_gain=170)
    rows.append(pin("m2_lsf_ms", data,
                    "MPEG-2 LSF 24k joint stereo (MS)", src))

    # --- spectrum-mode fixtures (structural coverage) ---
    def short_gr(f, gr, ch):
        vals = lcg_ints(1000 + 17 * f + 5 * gr, 120, -6, 6)
        tail = lcg_ints(2000 + f, 40, 0, 1)
        ix = vals + [v if (i % 3) else -v for i, v in enumerate(tail)]
        return GranuleSpec(ix, block_type=2, global_gain=186,
                           subblock_gain=(1, 2, 0),
                           sf_short=[[min(s, 7) for s in
                                      lcg_ints(3000 + sfb, 3, 0, 3)]
                                     for sfb in range(12)],
                           scalefac_compress=9, count1table=0)

    rows.append(pin("m1_short_blocks",
                    spectrum_frames(44100, 3, 0, short_gr, 2),
                    "MPEG-1 short blocks, subblock gains, short scalefactors"))

    def mixed_gr(f, gr, ch):
        ix = lcg_ints(4000 + f * 7 + gr, 140, -5, 5)
        return GranuleSpec(ix, block_type=2, mixed=1, global_gain=176,
                           subblock_gain=(0, 1, 1),
                           sf_long=[1, 0, 2, 0, 1, 0, 1, 0] + [0] * 13,
                           sf_short=[[0, 0, 0], [0, 0, 0], [0, 0, 0]] +
                                    [[min(s, 3) for s in
                                      lcg_ints(5000 + sfb, 3, 0, 2)]
                                     for sfb in range(3, 12)],
                           scalefac_compress=13, count1table=1)

    rows.append(pin("m1_mixed_blocks",
                    spectrum_frames(44100, 3, 0, mixed_gr, 2),
                    "MPEG-1 mixed blocks (long low subbands + short), count1 B"))

    def startstop_gr(f, gr, ch):
        bt = 1 if gr == 0 else 3
        ix = lcg_ints(6000 + f * 11 + gr * 3 + ch, 100, -7, 7)
        return GranuleSpec(ix, block_type=bt, global_gain=178,
                           scalefac_compress=0, count1table=0)

    rows.append(pin("m1_start_stop",
                    spectrum_frames(48000, 3, 0, startstop_gr, 2),
                    "MPEG-1 start (1) / stop (3) window types"))

    def escape_gr(f, gr, ch):
        big = lcg_ints(7000 + f * 13 + gr, 24, -90, 90)
        mids = lcg_ints(7100 + f, 60, -9, 9)
        ones = [v if v else 1 for v in lcg_ints(7200 + f, 48, -1, 1)]
        ix = big + mids + ones
        return GranuleSpec(ix, global_gain=166, preflag=1, scalefac_scale=1,
                           tables=[21, 28, 13],
                           sf_long=[1, 1, 0, 0, 1, 0, 0, 0, 1, 0, 0,
                                    1, 0, 0, 1, 0, 0, 1, 0, 0, 1],
                           scalefac_compress=9,
                           region0_count=2, region1_count=3,
                           count1table=1)

    rows.append(pin("m1_escape_count1b",
                    spectrum_frames(44100, 3, 0, escape_gr, 2),
                    "escape tables 21/28 + linbits, preflag, scalefac_scale, count1 B"))

    def intensity_gr(f, gr, ch):
        if ch == 0:
            ix = lcg_ints(8000 + f * 3 + gr, 260, -6, 6)
            sf = [0] * 21
        else:
            # right channel: audible only below line 90; zero above ->
            # intensity region with is_pos in the scalefactors
            ix = lcg_ints(8100 + f * 3 + gr, 90, -4, 4)
            sf = [0] * 8 + [1, 2, 3, 4, 5, 6, 0, 1, 2, 3, 4, 5, 6]
        return GranuleSpec(ix, global_gain=177, sf_long=sf,
                           scalefac_compress=13 if ch else 0,
                           region0_count=6, region1_count=7)

    rows.append(pin("m1_intensity",
                    spectrum_frames(44100, 1, 1, intensity_gr, 2),
                    "MPEG-1 intensity stereo (mode_ext 1), is_pos scalefactors"))

    def ms_int_gr(f, gr, ch):
        if ch == 0:
            ix = lcg_ints(8500 + f * 3 + gr, 200, -5, 5)
            sf = [0] * 21
        else:
            ix = lcg_ints(8600 + f * 3 + gr, 72, -3, 3)
            sf = [0] * 10 + [2, 4, 6, 1, 3, 5, 0, 2, 4, 6, 1]
        return GranuleSpec(ix, global_gain=177, sf_long=sf,
                           scalefac_compress=13 if ch else 0,
                           region0_count=6, region1_count=7)

    rows.append(pin("m1_ms_intensity",
                    spectrum_frames(44100, 1, 3, ms_int_gr, 2),
                    "MPEG-1 MS below + intensity above bound (mode_ext 3)"))

    # --- real third-party stream ---
    with open(LAME, "rb") as f:
        lame = f.read()
    with open(os.path.join(OUT, "lame_silence.mp3"), "wb") as f:
        f.write(lame)
    rows.append(pin("lame_silence", lame,
                    "real LAME MPEG-2 LSF mono (gsutil test data, Apache-2.0): "
                    "digital silence; validates framing/reservoir/side-info"))

    with open(os.path.join(OUT, "manifest.tsv"), "w") as f:
        f.write("name\tsr\tch\tsamples\tmd5\tsum\tmaxabs\tsnr_db\tdesc\n")
        for r in rows:
            f.write("\t".join(r) + "\n")
    print(f"wrote {len(rows)} fixtures + manifest to {OUT}")


if __name__ == "__main__":
    main()

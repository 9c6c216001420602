#!/usr/bin/env python3
"""Numeric validation probes for the mp3 reference pair (run standalone):

1. polyphase PR: analysis -> synthesis reconstruction SNR (validates the
   512-coefficient D window transcription + both matrixing conventions);
2. full transform chain: analysis+MDCT (encoder) -> alias+IMDCT+synthesis
   (decoder) gain + SNR, calibrating encoder.MDCT_SCALE.
"""
import math
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import decoder as dec
import encoder as enc


def snr_db(ref, test):
    es = sum(r * r for r in ref)
    en = sum((r - t) * (r - t) for r, t in zip(ref, test))
    if en == 0:
        return float("inf")
    return 10.0 * math.log10(es / en)


def gen_signal(n, seed=12345):
    # deterministic multi-tone + LCG noise floor
    s = []
    state = seed
    for i in range(n):
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        noise = (state / 0x7FFFFFFF - 0.5) * 0.02
        v = (0.35 * math.sin(2 * math.pi * 441.0 * i / 44100.0)
             + 0.25 * math.sin(2 * math.pi * 1320.0 * i / 44100.0 + 0.3)
             + 0.15 * math.sin(2 * math.pi * 5512.5 * i / 44100.0 + 1.1)
             + noise)
        s.append(v)
    return s


def probe_filterbank():
    n = 8192
    x = gen_signal(n)
    ana = enc.Analysis()
    v = [0.0] * 1024
    off = 0
    y = []
    for i in range(0, n, 32):
        sub = ana.step(x[i:i + 32])
        pcm, off = dec.synth_full(v, off, sub)
        y.extend(pcm)
    # find best delay by scanning
    best = (-1e9, 0, 1.0)
    for d in range(400, 600):
        ref = x[:n - d]
        tst = y[d:n]
        num = sum(a * b for a, b in zip(ref, tst))
        den = sum(b * b for b in tst) or 1e-30
        g = num / den
        s = snr_db(ref, [g * t for t in tst])
        if s > best[0]:
            best = (s, d, g)
    s, d, g = best
    print(f"filterbank PR: delay={d} gain={g:.6f} snr={s:.1f} dB")
    return s, d, g


def probe_full_chain():
    sr = 44100
    nframes = 4
    n = nframes * 1152
    x = gen_signal(n)
    spectra = enc.analyze_channel(list(x), nframes, lsf=False)

    overlap = [[0.0] * 18 for _ in range(32)]
    v = [0.0] * 1024
    off = 0
    y = []

    class G:
        window_switching = 0
        block_type = 0
        mixed = 0

    for spec in spectra:
        xr = list(spec)
        dec.alias_reduce(G, xr)
        sub = dec.imdct_granule(G, xr, overlap)
        for t in range(18):
            s32 = [sub[sb][t] for sb in range(32)]
            pcm, off = dec.synth_full(v, off, s32)
            y.extend(pcm)
    best = (-1e9, 0, 1.0)
    for d in range(400, 1400):
        ref = x[:n - d]
        tst = y[d:n]
        num = sum(a * b for a, b in zip(ref, tst))
        den = sum(b * b for b in tst) or 1e-30
        g = num / den
        s = snr_db(ref, [g * t for t in tst])
        if s > best[0]:
            best = (s, d, g)
    s, d, g = best
    print(f"full chain: delay={d} gain={g:.6f} (set MDCT_SCALE *= gain) snr={s:.1f} dB")
    return s, d, g


if __name__ == "__main__":
    probe_filterbank()
    probe_full_chain()

#!/usr/bin/env python3
"""Minimal MPEG-1/2 Layer III encoder (dev-time only) used to synthesize the
committed mp3 conformance fixtures, since this sandbox ships no mp3 codec
(see tables.py header). Two modes:

  * encode_audio: real analysis filterbank + MDCT + quantizer + Huffman for
    long-block mono/stereo/MS frames. decode(encode(x)) ~= x up to
    quantization noise, so the fixture manifest can pin an SNR-vs-source
    figure as well as the PCM digest — an end-to-end numeric validation of
    the whole decode chain that does not assume the decoder's own math.
  * encode_spectrum: writes granules directly from given (ix, scalefactor,
    block-type) specs — exercises short/mixed/start/stop blocks, subblock
    gains, escape tables + linbits, count1 tables, preflag, scalefac_scale,
    intensity stereo: paths an analysis-side encoder this small cannot
    reach through audio.

Only tables/conventions shared with decoder.py are used, so the fixtures
round-trip by construction; the independent checks are the filterbank
PR/SNR numbers printed by gen_fixtures.py.
"""

import math
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tables import big_value_table, COUNT1_A_LENS, COUNT1_A_CODES, \
    COUNT1_B_LENS, COUNT1_B_CODES, SFB_LONG, SLEN, PRETAB, synth_window
import decoder as dec


# ---------------------------------------------------------------------------
# Analysis filterbank (ISO 11172-3 C.1.3 dataflow) + MDCT
# ---------------------------------------------------------------------------

ANA_C = [d / 32.0 for d in synth_window()]
ANA_M = [[math.cos((2 * k + 1) * (i - 16) * math.pi / 64.0)
          for i in range(64)] for k in range(32)]
MDCT36 = [[dec.IMDCT36[i][k] for i in range(36)] for k in range(18)]  # transpose


class Analysis:
    def __init__(self):
        self.x = [0.0] * 512

    def step(self, s32):
        """32 new PCM samples -> 32 subband samples."""
        x = self.x
        for i in range(511, 31, -1):
            x[i] = x[i - 32]
        for i in range(32):
            x[31 - i] = s32[i]
        z = [ANA_C[i] * x[i] for i in range(512)]
        y = [0.0] * 64
        for i in range(64):
            acc = 0.0
            for j in range(8):
                acc += z[i + (j << 6)]
            y[i] = acc
        out = [0.0] * 32
        for k in range(32):
            acc = 0.0
            row = ANA_M[k]
            for i in range(64):
                acc += row[i] * y[i]
            out[k] = acc
        return out


def mdct_long(prev18, cur18, scale):
    """36 windowed subband samples -> 18 spectral lines (sine window)."""
    xw = [0.0] * 36
    for i in range(18):
        xw[i] = prev18[i] * dec.WIN[0][i]
        xw[18 + i] = cur18[i] * dec.WIN[0][18 + i]
    X = [0.0] * 18
    for k in range(18):
        acc = 0.0
        row = MDCT36[k]
        for i in range(36):
            acc += xw[i] * row[i]
        X[k] = acc * scale
    return X


def alias_forward(xr):
    """Inverse of the decoder's alias-reduction butterflies (transpose)."""
    for sb in range(31):
        base = 18 * sb + 17
        for k in range(8):
            lo = base - k
            hi = base + 1 + k
            a = xr[lo]
            b = xr[hi]
            xr[lo] = a * dec.ALIAS_CS[k] + b * dec.ALIAS_CA[k]
            xr[hi] = b * dec.ALIAS_CS[k] - a * dec.ALIAS_CA[k]


def time_invert(cur):
    """Pre-compensate the decoder's frequency inversion: the decoder negates
    odd TIME samples of odd subbands after the IMDCT, so the encoder negates
    them before the MDCT (self-inverse, and granule-phase consistent since
    (-1)^(i+18) == (-1)^i across the 36-sample MDCT window)."""
    for sb in range(1, 32, 2):
        row = cur[sb]
        for t in range(1, 18, 2):
            row[t] = -row[t]


# ---------------------------------------------------------------------------
# Bit writer / Huffman encode
# ---------------------------------------------------------------------------

class BitW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v, bits):
        assert 0 <= v < (1 << bits) or bits == 0
        for b in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> b) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    @property
    def bitlen(self):
        return len(self.buf) * 8 + self.n

    def pad_to_bytes(self):
        while self.n:
            self.put(0, 1)
        return bytes(self.buf)


def encode_pair(bw, tab_n, x, y):
    linbits, lens, codes = big_value_table(tab_n)
    ax, ay = abs(x), abs(y)
    ex = min(ax, 15) if linbits else ax
    ey = min(ay, 15) if linbits else ay
    dim = len(lens)
    assert ex < dim and ey < dim, f"value ({x},{y}) does not fit table {tab_n}"
    bw.put(codes[ex][ey], lens[ex][ey])
    if linbits and ex == 15:
        assert ax - 15 < (1 << linbits)
        bw.put(ax - 15, linbits)
    if ax:
        bw.put(1 if x < 0 else 0, 1)
    if linbits and ey == 15:
        assert ay - 15 < (1 << linbits)
        bw.put(ay - 15, linbits)
    if ay:
        bw.put(1 if y < 0 else 0, 1)


def encode_count1(bw, table_b, quad):
    v = ((abs(quad[0]) & 1) << 3) | ((abs(quad[1]) & 1) << 2) | \
        ((abs(quad[2]) & 1) << 1) | (abs(quad[3]) & 1)
    if table_b:
        bw.put(COUNT1_B_CODES[v], COUNT1_B_LENS[v])
    else:
        bw.put(COUNT1_A_CODES[v], COUNT1_A_LENS[v])
    for q in quad:
        if q:
            bw.put(1 if q < 0 else 0, 1)


def table_for(maxv, prefer=None):
    """Smallest confident table fitting maxv, or an escape table."""
    if prefer is not None:
        return prefer
    if maxv <= 1:
        return 1
    if maxv <= 2:
        return 2
    if maxv <= 3:
        return 5
    if maxv <= 5:
        return 7
    if maxv <= 7:
        return 10
    if maxv <= 15:
        return 13
    # escape: linbits must fit maxv - 15
    need = (maxv - 15).bit_length()
    for t in range(16, 24):
        if big_value_table(t)[0] >= need:
            return t
    raise ValueError(f"maxv {maxv} too large")


# ---------------------------------------------------------------------------
# Granule assembly
# ---------------------------------------------------------------------------

class GranuleSpec:
    """Everything needed to write one granule-channel's side info + data."""

    def __init__(self, ix, sf_long=None, sf_short=None, global_gain=210,
                 block_type=0, mixed=0, subblock_gain=(0, 0, 0),
                 scalefac_scale=0, preflag=0, count1table=0,
                 scalefac_compress=0, tables=None,
                 region0_count=4, region1_count=7):
        self.ix = list(ix) + [0] * (576 - len(ix))
        self.sf_long = list(sf_long or [0] * 21)
        self.sf_short = [list(r) for r in (sf_short or [[0] * 3] * 12)]
        self.global_gain = global_gain
        self.block_type = block_type
        self.mixed = mixed
        self.subblock_gain = list(subblock_gain)
        self.scalefac_scale = scalefac_scale
        self.preflag = preflag
        self.count1table = count1table
        self.scalefac_compress = scalefac_compress
        self.tables = tables  # None -> auto per region
        self.region0_count = region0_count
        self.region1_count = region1_count


def granule_partition(ix):
    """-> (big_end, count1_end): big region even-sized, count1 in quads."""
    last_big = -1
    last_nz = -1
    for i, v in enumerate(ix):
        if v:
            last_nz = i
            if abs(v) > 1:
                last_big = i
    big_end = last_big + 1
    if big_end & 1:
        big_end += 1
    c1 = last_nz + 1
    if c1 < big_end:
        c1 = big_end
    while (c1 - big_end) & 3:
        c1 += 1
    if c1 > 576:
        # quad alignment ran off the end: absorb trailing +-1 lines into the
        # big-value region instead (they encode fine in any pair table)
        while (576 - big_end) & 3:
            big_end += 2
        c1 = 576
    assert c1 <= 576
    assert big_end // 2 <= 288, "big_values overflow"
    return big_end, c1


def write_granule_main(bw, hd_lsf, sample_rate, g, gr, scfsi_zero=True):
    """Write scalefactors + huffman data; returns the Granule side info
    (as a dict of fields) with part2_3_length filled."""
    start = bw.bitlen
    ws = 1 if g.block_type != 0 else 0
    # scalefactors
    if hd_lsf:
        assert g.block_type == 0, "LSF fixture writer supports long blocks"
        sc = g.scalefac_compress
        assert sc < 400
        slen = [(sc >> 4) // 5, (sc >> 4) % 5, (sc % 16) >> 2, sc % 4]
        nr = [6, 5, 5, 5]
        k = 0
        for part in range(4):
            for _ in range(nr[part]):
                bw.put(g.sf_long[k] if k < 21 else 0, slen[part])
                k += 1
    else:
        slen1, slen2 = SLEN[g.scalefac_compress]
        if g.block_type == 2 and not g.mixed:
            for sfb in range(6):
                for w in range(3):
                    bw.put(g.sf_short[sfb][w], slen1)
            for sfb in range(6, 12):
                for w in range(3):
                    bw.put(g.sf_short[sfb][w], slen2)
        elif g.block_type == 2 and g.mixed:
            for sfb in range(8):
                bw.put(g.sf_long[sfb], slen1)
            for sfb in range(3, 6):
                for w in range(3):
                    bw.put(g.sf_short[sfb][w], slen1)
            for sfb in range(6, 12):
                for w in range(3):
                    bw.put(g.sf_short[sfb][w], slen2)
        else:
            for sfb in range(11):
                bw.put(g.sf_long[sfb], slen1)
            for sfb in range(11, 21):
                bw.put(g.sf_long[sfb], slen2)
    # huffman
    big_end, c1_end = granule_partition(g.ix)
    sfb_l = SFB_LONG[sample_rate]
    if ws:
        r1 = 36 if (g.block_type == 2 and not g.mixed) else sfb_l[8]
        r2 = 576
    else:
        r1 = sfb_l[min(g.region0_count + 1, 22)]
        r2 = sfb_l[min(g.region0_count + 1 + g.region1_count + 1, 22)]
    regions = [(0, min(big_end, r1)), (min(big_end, r1), min(big_end, r2)),
               (min(big_end, r2), big_end)]
    tsel = []
    for ri, (lo, hi) in enumerate(regions):
        if hi <= lo:
            tsel.append(0)
            continue
        maxv = max(abs(g.ix[i]) for i in range(lo, hi)) if hi > lo else 0
        if maxv == 0:
            tsel.append(0)
            continue
        prefer = g.tables[ri] if g.tables else None
        t = table_for(maxv, prefer)
        tsel.append(t)
        for i in range(lo, hi, 2):
            encode_pair(bw, t, g.ix[i], g.ix[i + 1])
    for i in range(big_end, c1_end, 4):
        encode_count1(bw, g.count1table, g.ix[i:i + 4])
    part23 = bw.bitlen - start
    side = dict(part2_3_length=part23, big_values=big_end // 2,
                global_gain=g.global_gain,
                scalefac_compress=g.scalefac_compress,
                window_switching=ws, block_type=g.block_type, mixed=g.mixed,
                table_select=(tsel + [0, 0, 0])[:3],
                subblock_gain=g.subblock_gain,
                region0_count=g.region0_count, region1_count=g.region1_count,
                preflag=g.preflag, scalefac_scale=g.scalefac_scale,
                count1table_select=g.count1table)
    return side


SR_INDEX = {44100: 0, 48000: 1, 32000: 2, 22050: 0, 24000: 1, 16000: 2}
BR_INDEX_V1 = {v: i for i, v in enumerate(dec.BITRATE_V1_L3)}
BR_INDEX_V2 = {v: i for i, v in enumerate(dec.BITRATE_V2_L3)}


def build_frame(sample_rate, bitrate_kbps, mode, mode_ext, gr_specs):
    """gr_specs: [granule][channel] of GranuleSpec. Returns frame bytes."""
    lsf = sample_rate < 32000 or sample_rate == 32000 and False
    lsf = sample_rate in (22050, 24000, 16000)
    nch = 1 if mode == 3 else 2
    ngr = 1 if lsf else 2
    assert len(gr_specs) == ngr and all(len(g) == nch for g in gr_specs)
    main = BitW()
    sides = []
    for gr in range(ngr):
        row = []
        for ch in range(nch):
            row.append(write_granule_main(main, lsf, sample_rate,
                                          gr_specs[gr][ch], gr))
        sides.append(row)
    # side info block
    sb = BitW()
    if lsf:
        sb.put(0, 8)            # main_data_begin: fixtures never use reservoir
        sb.put(0, 1 if nch == 1 else 2)
    else:
        sb.put(0, 9)
        sb.put(0, 5 if nch == 1 else 3)
        for _ in range(nch):
            sb.put(0, 4)        # scfsi
    for gr in range(ngr):
        for ch in range(nch):
            s = sides[gr][ch]
            sb.put(s["part2_3_length"], 12)
            sb.put(s["big_values"], 9)
            sb.put(s["global_gain"], 8)
            sb.put(s["scalefac_compress"], 9 if lsf else 4)
            sb.put(s["window_switching"], 1)
            if s["window_switching"]:
                sb.put(s["block_type"], 2)
                sb.put(s["mixed"], 1)
                sb.put(s["table_select"][0], 5)
                sb.put(s["table_select"][1], 5)
                for w in range(3):
                    sb.put(s["subblock_gain"][w], 3)
            else:
                for r in range(3):
                    sb.put(s["table_select"][r], 5)
                sb.put(s["region0_count"], 4)
                sb.put(s["region1_count"], 3)
            if not lsf:
                sb.put(s["preflag"], 1)
            sb.put(s["scalefac_scale"], 1)
            sb.put(s["count1table_select"], 1)
    side_bytes = sb.pad_to_bytes()
    exp_side = (9 if nch == 1 else 17) if lsf else (17 if nch == 1 else 32)
    assert len(side_bytes) == exp_side, (len(side_bytes), exp_side)
    main_bytes = main.pad_to_bytes()
    # header
    br_idx = (BR_INDEX_V2 if lsf else BR_INDEX_V1)[bitrate_kbps]
    frame_len = (72000 if lsf else 144000) * bitrate_kbps // sample_rate
    cap = frame_len - 4 - exp_side
    assert len(main_bytes) <= cap, \
        f"main data {len(main_bytes)}B exceeds frame capacity {cap}B"
    h = 0xFFF << 20
    h |= (2 if lsf else 3) << 19
    h |= 1 << 17                 # layer III
    h |= 1 << 16                 # no CRC
    h |= br_idx << 12
    h |= SR_INDEX[sample_rate] << 10
    h |= 0 << 9                  # no padding
    h |= mode << 6
    h |= mode_ext << 4
    header = h.to_bytes(4, "big")
    pad = bytes(cap - len(main_bytes))
    return header + side_bytes + main_bytes + pad


# ---------------------------------------------------------------------------
# Audio-mode encoding (long blocks)
# ---------------------------------------------------------------------------

MDCT_SCALE = 1.0 / 9.0  # unity-gain: the 36-pt IMDCT+OLA pair has gain 9


def analyze_channel(pcm, nframes, lsf):
    """PCM -> per-granule spectra (list of [576] float), long blocks."""
    ana = Analysis()
    ngr = nframes * (1 if lsf else 2)
    sub_hist = [[0.0] * 18 for _ in range(32)]  # previous granule, per sb
    spectra = []
    pos = 0
    for _g in range(ngr):
        cur = [[0.0] * 18 for _ in range(32)]
        for t in range(18):
            s32 = pcm[pos:pos + 32]
            if len(s32) < 32:
                s32 = s32 + [0.0] * (32 - len(s32))
            pos += 32
            sub = ana.step(s32)
            for sb in range(32):
                cur[sb][t] = sub[sb]
        time_invert(cur)
        spec = [0.0] * 576
        for sb in range(32):
            X = mdct_long(sub_hist[sb], cur[sb], MDCT_SCALE)
            for k in range(18):
                spec[18 * sb + k] = X[k]
            sub_hist[sb] = cur[sb]
        alias_forward(spec)
        spectra.append(spec)
    return spectra


def quantize_long(spec, global_gain, sf_long, scalefac_scale=0, preflag=0,
                  sample_rate=44100):
    """xr -> integer lines under the decoder's exact requantize law."""
    sfb_l = SFB_LONG[sample_rate]
    sf_unit = 4 if scalefac_scale else 2
    ix = [0] * 576
    for i in range(576):
        sfb = 0
        while sfb < 21 and sfb_l[sfb + 1] <= i:
            sfb += 1
        sf = sf_long[sfb] if sfb < 21 else 0
        k = (global_gain - 210) - sf_unit * (sf + (PRETAB[sfb] if preflag else 0))
        mul = dec.gain_pow2_quarter(k)
        a = abs(spec[i]) / mul
        v = int(round(math.pow(a, 0.75))) if a > 0 else 0
        ix[i] = -v if spec[i] < 0 else v
    return ix


def encode_audio(pcm_ch, sample_rate, mode=3, mode_ext=0, bitrate=None,
                 global_gain=210, sf_long=None):
    """pcm_ch: [channels][samples] floats in [-1,1]. Long blocks, no
    reservoir. Returns mp3 bytes."""
    lsf = sample_rate in (22050, 24000, 16000)
    nch = len(pcm_ch)
    assert (mode == 3) == (nch == 1)
    spf = 576 if lsf else 1152
    nframes = (len(pcm_ch[0]) + spf - 1) // spf
    if bitrate is None:
        bitrate = 160 if lsf else 320
    sf = sf_long or [0] * 21
    chans = list(pcm_ch)
    if mode == 1 and (mode_ext & 2):
        l, r = chans
        m = [(a + b) * dec.SQRT2_INV for a, b in zip(l, r)]
        s = [(a - b) * dec.SQRT2_INV for a, b in zip(l, r)]
        chans = [m, s]
    specs = [analyze_channel(list(c), nframes, lsf) for c in chans]
    frames = []
    ngr_f = 1 if lsf else 2
    for f in range(nframes):
        gr_specs = []
        for gr in range(ngr_f):
            row = []
            for ch in range(nch):
                spec = specs[ch][f * ngr_f + gr]
                ix = quantize_long(spec, global_gain, sf,
                                   sample_rate=sample_rate)
                row.append(GranuleSpec(ix, sf_long=sf + [0],
                                       global_gain=global_gain,
                                       scalefac_compress=_sc_for(sf, lsf)))
            gr_specs.append(row)
        frames.append(build_frame(sample_rate, bitrate, mode, mode_ext,
                                  gr_specs))
    return b"".join(frames)


def _sc_for(sf_long, lsf):
    mx = max(sf_long)
    if lsf:
        # slen = [s1,s1? ...]; choose sc with slen1..4 all >= bits(mx):
        # sc = (s1*5 + s2) * 16 + (s3 << 2) + s4
        b = max(mx.bit_length(), 0)
        assert b <= 3, "LSF fixture scalefactors limited to 3 bits"
        return (b * 5 + b) * 16 + (b << 2) + b
    b = mx.bit_length()
    for sc, (s1, s2) in enumerate(SLEN):
        if s1 >= b and s2 >= b:
            return sc
    raise ValueError("scalefactors too large")

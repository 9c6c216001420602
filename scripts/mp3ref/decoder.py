#!/usr/bin/env python3
"""From-scratch MPEG-1/2 Layer III reference decoder (ISO/IEC 11172-3 +
13818-3 LSF), written against the public standard as the pinning oracle for
graft's Mp3Codec.scala.

Mirroring contract with the Scala decoder:
  * every floating-point table that involves a transcendental (cosine
    matrices, windows, x^(4/3), 2^(k/4) roots, 1/sqrt2, intensity ratios)
    is computed HERE once and emitted bit-exactly into the shared resource
    `src/main/resources/mp3/mp3tables.bin` by gen_scala.py;
  * the decode path itself uses only +,-,*,/ over float64 in a fixed
    evaluation order, so Python and JVM produce bit-identical doubles and
    the committed int16-PCM digests pin the Scala port exactly.

Scope (same boundary recorded in SURVEY K6): MPEG-1 and MPEG-2 (LSF)
Layer III, mono/stereo, long/short/mixed blocks, MS stereo, MPEG-1
intensity stereo. Named errors: Layer I/II sample decode, MPEG-2.5,
free-format bitrate, LSF intensity stereo.
"""

import math
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tables import (big_value_table, COUNT1_A_LENS, COUNT1_A_CODES,
                    COUNT1_B_LENS, COUNT1_B_CODES, SFB_LONG, SFB_SHORT,
                    SLEN, PRETAB, LSF_NR_SFB, synth_window)

# ---------------------------------------------------------------------------
# Derived floating-point tables (emitted into mp3tables.bin for Scala).
# ---------------------------------------------------------------------------

POW43_N = 8207  # max |value| = 15 + (2^13 - 1) for linbits 13 escapes
POW43 = [math.pow(i, 4.0 / 3.0) for i in range(POW43_N)]
# quarter-power-of-two roots: 2^(k/4) = 2^(k>>2) * QROOT[k & 3]
QROOT = [math.pow(2.0, k / 4.0) for k in range(4)]
SQRT2_INV = 1.0 / math.sqrt(2.0)
# MPEG-1 intensity-stereo ratios tan(is_pos * pi / 12) for is_pos 0..6
IS_RATIO = [math.tan(p * math.pi / 12.0) for p in range(7)]
# IMDCT cosine matrices: long (36 out, 18 in) and short (12 out, 6 in)
IMDCT36 = [[math.cos(math.pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))
            for k in range(18)] for i in range(36)]
IMDCT12 = [[math.cos(math.pi / 24.0 * (2 * i + 1 + 6) * (2 * k + 1))
            for k in range(6)] for i in range(12)]
# block windows (long 0, start 1, short 2, stop 3)
WIN = [[0.0] * 36 for _ in range(4)]
for i in range(36):
    WIN[0][i] = math.sin(math.pi / 36.0 * (i + 0.5))
for i in range(18):
    WIN[1][i] = math.sin(math.pi / 36.0 * (i + 0.5))
for i in range(18, 24):
    WIN[1][i] = 1.0
for i in range(24, 30):
    WIN[1][i] = math.sin(math.pi / 12.0 * (i - 18 + 0.5))
for i in range(6, 12):
    WIN[3][i] = math.sin(math.pi / 12.0 * (i - 6 + 0.5))
for i in range(12, 18):
    WIN[3][i] = 1.0
for i in range(18, 36):
    WIN[3][i] = math.sin(math.pi / 36.0 * (i + 0.5))
for i in range(12):
    WIN[2][i] = math.sin(math.pi / 12.0 * (i + 0.5))
# alias-reduction butterflies
ALIAS_C = [-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037]
ALIAS_CS = [1.0 / math.sqrt(1.0 + c * c) for c in ALIAS_C]
ALIAS_CA = [c / math.sqrt(1.0 + c * c) for c in ALIAS_C]
# synthesis matrixing N[i][k] = cos((16 + i)(2k + 1) pi / 64), i<64, k<32
SYNTH_N = [[math.cos((16 + i) * (2 * k + 1) * math.pi / 64.0)
            for k in range(32)] for i in range(64)]
SYNTH_D = synth_window()


def gain_pow2_quarter(k):
    """2^(k/4) exactly as ldexp(QROOT[k mod 4], k div 4) (floor semantics)."""
    q = k & 3
    e = (k - q) >> 2
    return math.ldexp(QROOT[q], e)


# ---------------------------------------------------------------------------
# Bit reader
# ---------------------------------------------------------------------------

class Bits:
    __slots__ = ("b", "pos")

    def __init__(self, b, bitpos=0):
        self.b = b
        self.pos = bitpos

    def get(self, n):
        v = 0
        for _ in range(n):
            byte = self.b[self.pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def get1(self):
        byte = self.b[self.pos >> 3]
        v = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return v


class Mp3Error(Exception):
    pass


# ---------------------------------------------------------------------------
# Header / side info
# ---------------------------------------------------------------------------

BITRATE_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
BITRATE_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
SR_V1 = [44100, 48000, 32000]
SR_V2 = [22050, 24000, 16000]


class Header:
    __slots__ = ("lsf", "sample_rate", "bitrate", "mode", "mode_ext",
                 "padding", "crc", "frame_len", "channels")


def parse_header(b, off):
    if off + 4 > len(b):
        return None
    h = (b[off] << 24) | (b[off + 1] << 16) | (b[off + 2] << 8) | b[off + 3]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver = (h >> 19) & 3
    layer = (h >> 17) & 3
    if ver == 1:
        return None  # reserved version
    if ver == 0:
        raise Mp3Error("MPEG-2.5 sample decode not supported (non-ISO extension)")
    if layer != 1:
        raise Mp3Error("only Layer III sample decode is supported (I/II are header-only)")
    hd = Header()
    hd.lsf = (ver == 2)
    br_idx = (h >> 12) & 15
    sr_idx = (h >> 10) & 3
    if br_idx == 0:
        raise Mp3Error("free-format bitrate not supported")
    if br_idx == 15 or sr_idx == 3:
        return None
    hd.crc = ((h >> 16) & 1) == 0
    hd.bitrate = (BITRATE_V2_L3 if hd.lsf else BITRATE_V1_L3)[br_idx] * 1000
    hd.sample_rate = (SR_V2 if hd.lsf else SR_V1)[sr_idx]
    hd.padding = (h >> 9) & 1
    hd.mode = (h >> 6) & 3
    hd.mode_ext = (h >> 4) & 3
    hd.channels = 1 if hd.mode == 3 else 2
    slots = (72000 if hd.lsf else 144000) * (hd.bitrate // 1000)
    hd.frame_len = slots // hd.sample_rate + hd.padding
    return hd


class Granule:
    __slots__ = ("part2_3_length", "big_values", "global_gain",
                 "scalefac_compress", "window_switching", "block_type",
                 "mixed", "table_select", "subblock_gain", "region0_count",
                 "region1_count", "preflag", "scalefac_scale",
                 "count1table_select", "sf_long")


def parse_side_info(hd, bits):
    nch = hd.channels
    si = {}
    if hd.lsf:
        si["main_data_begin"] = bits.get(8)
        bits.get(1 if nch == 1 else 2)
        ngr = 1
        si["scfsi"] = [[0, 0, 0, 0] for _ in range(nch)]
    else:
        si["main_data_begin"] = bits.get(9)
        bits.get(5 if nch == 1 else 3)
        si["scfsi"] = [[bits.get1() for _ in range(4)] for _ in range(nch)]
        ngr = 2
    grs = []
    for _g in range(ngr):
        chs = []
        for _c in range(nch):
            g = Granule()
            g.part2_3_length = bits.get(12)
            g.big_values = bits.get(9)
            if g.big_values > 288:
                raise Mp3Error(f"big_values {g.big_values} > 288")
            g.global_gain = bits.get(8)
            g.scalefac_compress = bits.get(9 if hd.lsf else 4)
            g.window_switching = bits.get1()
            if g.window_switching:
                g.block_type = bits.get(2)
                if g.block_type == 0:
                    raise Mp3Error("window_switching with block_type 0 is forbidden")
                g.mixed = bits.get1()
                g.table_select = [bits.get(5), bits.get(5), 0]
                g.subblock_gain = [bits.get(3) for _ in range(3)]
                g.region0_count = 7
                g.region1_count = 36
            else:
                g.block_type = 0
                g.mixed = 0
                g.table_select = [bits.get(5) for _ in range(3)]
                g.subblock_gain = [0, 0, 0]
                g.region0_count = bits.get(4)
                g.region1_count = bits.get(3)
            g.preflag = 0 if hd.lsf else bits.get1()
            g.scalefac_scale = bits.get1()
            g.count1table_select = bits.get1()
            chs.append(g)
        grs.append(chs)
    si["granules"] = grs
    return si


# ---------------------------------------------------------------------------
# Scalefactors
# ---------------------------------------------------------------------------

def read_scalefacs_mpeg1(bits, g, scfsi, gr, prev):
    """Returns (sf_long[22], sf_short[13][3]); updates nothing else."""
    slen1, slen2 = SLEN[g.scalefac_compress]
    sfl = [0] * 22
    sfs = [[0, 0, 0] for _ in range(13)]
    if g.window_switching and g.block_type == 2:
        if g.mixed:
            for sfb in range(8):
                sfl[sfb] = bits.get(slen1)
            for sfb in range(3, 6):
                for w in range(3):
                    sfs[sfb][w] = bits.get(slen1)
            for sfb in range(6, 12):
                for w in range(3):
                    sfs[sfb][w] = bits.get(slen2)
        else:
            for sfb in range(6):
                for w in range(3):
                    sfs[sfb][w] = bits.get(slen1)
            for sfb in range(6, 12):
                for w in range(3):
                    sfs[sfb][w] = bits.get(slen2)
    else:
        groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2)]
        for gi, (lo, hi, sl) in enumerate(groups):
            if gr == 1 and scfsi[gi]:
                for sfb in range(lo, hi):
                    sfl[sfb] = prev[sfb]
            else:
                for sfb in range(lo, hi):
                    sfl[sfb] = bits.get(sl)
    return sfl, sfs


def read_scalefacs_lsf(bits, g, hd):
    """ISO 13818-3 LSF scalefactors (non-intensity channel)."""
    sc = g.scalefac_compress
    if sc < 400:
        slen = [(sc >> 4) // 5, (sc >> 4) % 5, (sc % 16) >> 2, sc % 4]
        blk = 0
    elif sc < 500:
        s = sc - 400
        slen = [(s >> 2) // 5, (s >> 2) % 5, s % 4, 0]
        blk = 1
    else:
        s = sc - 500
        slen = [s // 3, s % 3, 0, 0]
        blk = 2
        g.preflag = 1
    if g.window_switching and g.block_type == 2:
        bgroup = 2 if g.mixed else 1
    else:
        bgroup = 0
    nr = LSF_NR_SFB[blk][bgroup]
    raw = []
    for part in range(4):
        for _ in range(nr[part]):
            raw.append(bits.get(slen[part]))
    sfl = [0] * 22
    sfs = [[0, 0, 0] for _ in range(13)]
    if g.window_switching and g.block_type == 2:
        if g.mixed:
            for sfb in range(6):
                sfl[sfb] = raw[sfb] if sfb < len(raw) else 0
            k = 6
            for sfb in range(3, 12):
                for w in range(3):
                    sfs[sfb][w] = raw[k] if k < len(raw) else 0
                    k += 1
        else:
            k = 0
            for sfb in range(12):
                for w in range(3):
                    sfs[sfb][w] = raw[k] if k < len(raw) else 0
                    k += 1
    else:
        for sfb in range(min(21, len(raw))):
            sfl[sfb] = raw[sfb]
    part2 = nr[0] * slen[0] + nr[1] * slen[1] + nr[2] * slen[2] + nr[3] * slen[3]
    return sfl, sfs, part2


# ---------------------------------------------------------------------------
# Huffman spectrum
# ---------------------------------------------------------------------------

def _decode_codeword(bits, lens, codes, limit):
    """Bit-serial decode against a (lens, codes) matrix; returns (x, y)."""
    # build nothing: match incrementally (tables are small; reference clarity
    # over speed — the Scala port uses a prebuilt tree, same results)
    code = 0
    length = 0
    pairs = _pair_index(lens, codes)
    while True:
        if bits.pos >= limit:
            raise Mp3Error("huffman codeword ran past part2_3_length")
        code = (code << 1) | bits.get1()
        length += 1
        hit = pairs.get((length, code))
        if hit is not None:
            return hit
        if length > 19:
            raise Mp3Error("invalid huffman codeword")


_PAIR_CACHE = {}
_COUNT1_A_WRAP = ([COUNT1_A_LENS], [COUNT1_A_CODES])
_COUNT1_B_WRAP = ([COUNT1_B_LENS], [COUNT1_B_CODES])


def _pair_index(lens, codes):
    key = id(lens)
    idx = _PAIR_CACHE.get(key)
    if idx is None:
        idx = {}
        for x, row in enumerate(lens):
            for y, L in enumerate(row):
                idx[(L, codes[x][y])] = (x, y)
        _PAIR_CACHE[key] = idx
    return idx


def region_boundaries(hd, g):
    sfb_l = SFB_LONG[hd.sample_rate]
    if g.window_switching:
        if g.block_type == 2 and not g.mixed:
            r1 = 36
        else:
            r1 = sfb_l[8]
        r2 = 576
    else:
        r1 = sfb_l[min(g.region0_count + 1, 22)]
        r2 = sfb_l[min(g.region0_count + 1 + g.region1_count + 1, 22)]
    return r1, r2


def read_huffman(bits, hd, g, part2_start):
    limit = part2_start + g.part2_3_length
    ix = [0] * 576
    r1, r2 = region_boundaries(hd, g)
    n_big = g.big_values * 2
    i = 0
    while i < n_big:
        region = 0 if i < r1 else (1 if i < r2 else 2)
        tab = big_value_table(g.table_select[region]) if g.table_select[region] not in (0,) else None
        if g.table_select[region] in (4, 14):
            raise Mp3Error(f"reserved huffman table {g.table_select[region]} selected")
        if tab is None:
            ix[i] = 0
            ix[i + 1] = 0
            i += 2
            continue
        linbits, lens, codes = tab
        x, y = _decode_codeword(bits, lens, codes, limit)
        if x == 15 and linbits > 0:
            x += bits.get(linbits)
        if x != 0:
            if bits.get1():
                x = -x
        if y == 15 and linbits > 0:
            y += bits.get(linbits)
        if y != 0:
            if bits.get1():
                y = -y
        ix[i] = x
        ix[i + 1] = y
        i += 2
    # count1 region: quadruples until the bit budget (or 576) is exhausted
    # (module-level wrappers: the pair cache keys on id(lens), so the keyed
    # object must be persistent — an ephemeral wrapper list here would free
    # its id for reuse and poison the cache across decode calls)
    lens_c = _COUNT1_B_WRAP[0] if g.count1table_select else _COUNT1_A_WRAP[0]
    codes_c = _COUNT1_B_WRAP[1] if g.count1table_select else _COUNT1_A_WRAP[1]
    while bits.pos < limit and i <= 572:
        mark = bits.pos
        try:
            _, v = _decode_codeword(bits, lens_c, codes_c, limit)
        except Mp3Error:
            bits.pos = mark
            break
        vals = [(v >> 3) & 1, (v >> 2) & 1, (v >> 1) & 1, v & 1]
        ok = True
        for q in range(4):
            if vals[q]:
                if bits.pos >= limit:
                    ok = False
                    break
                if bits.get1():
                    vals[q] = -1
        if not ok or bits.pos > limit:
            bits.pos = mark
            break
        for q in range(4):
            ix[i + q] = vals[q]
        i += 4
    bits.pos = limit
    return ix, i  # i = count of potentially-nonzero lines (zero bound)


# ---------------------------------------------------------------------------
# Requantize / reorder
# ---------------------------------------------------------------------------

def requantize(hd, g, sfl, sfs, ix):
    xr = [0.0] * 576
    sfb_l = SFB_LONG[hd.sample_rate]
    sfb_s = SFB_SHORT[hd.sample_rate]
    step4 = 2 if g.scalefac_scale else 1  # exponent step in quarter-2 units *2
    # step factor applied as 2^(-step * sf) with step = 1 or 0.5 -> in
    # quarter-power units: -sf * (scalefac_scale ? 4 : 2)
    sf_unit = 4 if g.scalefac_scale else 2
    if g.window_switching and g.block_type == 2:
        # short (or mixed) blocks
        long_end = sfb_l[8] if g.mixed else 0
        i = 0
        while i < long_end:
            sfb = 0
            while sfb_l[sfb + 1] <= i:
                sfb += 1
            k = (g.global_gain - 210) - sf_unit * (sfl[sfb] + (PRETAB[sfb] if g.preflag else 0))
            mul = gain_pow2_quarter(k)
            v = ix[i]
            xr[i] = (-POW43[-v] if v < 0 else POW43[v]) * mul
            i += 1
        # short region: data is stored window-interleaved per band triplet
        sfb = 3 if g.mixed else 0
        i = long_end
        while i < 576 and sfb < 13:
            width = sfb_s[sfb + 1] - sfb_s[sfb]
            for w in range(3):
                k = (g.global_gain - 210 - 8 * g.subblock_gain[w]) - \
                    sf_unit * (sfs[sfb][w] if sfb < 12 else 0)
                mul = gain_pow2_quarter(k)
                for _ in range(width):
                    if i >= 576:
                        break
                    v = ix[i]
                    xr[i] = (-POW43[-v] if v < 0 else POW43[v]) * mul
                    i += 1
            sfb += 1
        # anything past the last band stays zero (ix is zero there anyway)
        while i < 576:
            xr[i] = 0.0
            i += 1
    else:
        for i in range(576):
            sfb = 0
            while sfb < 21 and sfb_l[sfb + 1] <= i:
                sfb += 1
            sf = sfl[sfb] if sfb < 21 else sfl[21]
            k = (g.global_gain - 210) - sf_unit * (sf + (PRETAB[sfb] if g.preflag else 0))
            mul = gain_pow2_quarter(k)
            v = ix[i]
            xr[i] = (-POW43[-v] if v < 0 else POW43[v]) * mul
    return xr


def reorder_short(hd, g, xr):
    """Reorder short-block samples from (band, window, line) bitstream order
    into (window-major within each band triplet) time order used by IMDCT:
    output line index = band_start*? -- standard reorder: within each short
    sfb of width w, input [w0 w1 w2 lines interleaved by window] becomes
    samples grouped per window slot across the 3 windows."""
    if not (g.window_switching and g.block_type == 2):
        return xr
    sfb_s = SFB_SHORT[hd.sample_rate]
    out = list(xr)
    start_sfb = 3 if g.mixed else 0
    base = SFB_LONG[hd.sample_rate][8] if g.mixed else 0
    i = base
    for sfb in range(start_sfb, 13):
        width = sfb_s[sfb + 1] - sfb_s[sfb]
        if i + 3 * width > 576:
            break
        for w in range(3):
            for s in range(width):
                # input order: window-major runs of `width`
                src = i + w * width + s
                # output order: interleaved lines (line-major across windows)
                dst = i + s * 3 + w
                out[dst] = xr[src]
        i += 3 * width
    return out


# ---------------------------------------------------------------------------
# Stereo
# ---------------------------------------------------------------------------

def apply_stereo(hd, g_l, g_r, xl, xr_ch, zb_l, zb_r):
    """In-place MS / intensity processing. zb_* = zero bounds (count of
    potentially nonzero lines). When both MS and intensity are flagged
    (mode_ext 3), MS covers only the region below the intensity bound."""
    ms = (hd.mode == 1) and (hd.mode_ext & 2)
    intensity = (hd.mode == 1) and (hd.mode_ext & 1)
    i_bound = 576
    if intensity:
        if hd.lsf:
            raise Mp3Error("LSF intensity stereo not supported")
        if g_r.window_switching and g_r.block_type == 2:
            raise Mp3Error("intensity stereo with short blocks not supported")
        # intensity region = long scalefactor bands wholly above the right
        # channel's zero bound; is_pos = right-channel scalefactor there
        sfb_l = SFB_LONG[hd.sample_rate]
        i_bound = 576
        for sfb in range(21, -1, -1):
            if sfb_l[sfb] >= zb_r:
                i_bound = sfb_l[sfb]
            else:
                break
    if ms:
        for i in range(i_bound):
            m = xl[i]
            s = xr_ch[i]
            xl[i] = (m + s) * SQRT2_INV
            xr_ch[i] = (m - s) * SQRT2_INV
    if intensity:
        sfb_l = SFB_LONG[hd.sample_rate]
        for sfb in range(22):
            lo = sfb_l[sfb]
            hi = sfb_l[sfb + 1] if sfb < 22 else 576
            if sfb == 21:
                hi = 576
            if lo < i_bound:
                continue
            is_pos = g_r.sf_long[sfb] if sfb < 21 else g_r.sf_long[20]
            if is_pos >= 7:
                continue
            ratio = IS_RATIO[is_pos]
            kl = ratio / (1.0 + ratio)
            kr = 1.0 / (1.0 + ratio)
            for i in range(lo, hi):
                v = xl[i]
                xl[i] = v * kl
                xr_ch[i] = v * kr


# ---------------------------------------------------------------------------
# Alias reduction, IMDCT, synthesis
# ---------------------------------------------------------------------------

def alias_reduce(g, xr):
    if g.window_switching and g.block_type == 2 and not g.mixed:
        return
    nb = 1 if (g.window_switching and g.block_type == 2 and g.mixed) else 31
    for sb in range(nb):
        base = 18 * sb + 17
        for k in range(8):
            lo = base - k
            hi = base + 1 + k
            a = xr[lo]
            b = xr[hi]
            xr[lo] = a * ALIAS_CS[k] - b * ALIAS_CA[k]
            xr[hi] = b * ALIAS_CS[k] + a * ALIAS_CA[k]


def imdct_granule(g, xr, overlap):
    """18 freq samples per subband -> 18 time samples, overlap-add with the
    previous granule's tail stored in overlap[sb][0..17]. Returns 32x18."""
    out = [[0.0] * 18 for _ in range(32)]
    for sb in range(32):
        bt = g.block_type if (g.window_switching and not (g.mixed and sb < 2)) else 0
        X = xr[18 * sb:18 * sb + 18]
        if bt == 2:
            raw = [0.0] * 36
            for w in range(3):
                xw = [X[w + 3 * k] for k in range(6)]
                for i in range(12):
                    s = 0.0
                    row = IMDCT12[i]
                    for k in range(6):
                        s += xw[k] * row[k]
                    raw[6 + 6 * w + i] += s * WIN[2][i]
        else:
            raw = [0.0] * 36
            win = WIN[bt]
            for i in range(36):
                s = 0.0
                row = IMDCT36[i]
                for k in range(18):
                    s += X[k] * row[k]
                raw[i] = s * win[i]
        ov = overlap[sb]
        for i in range(18):
            out[sb][i] = raw[i] + ov[i]
            ov[i] = raw[18 + i]
    # frequency inversion: odd subbands, odd time samples
    for sb in range(1, 32, 2):
        row = out[sb]
        for i in range(1, 18, 2):
            row[i] = -row[i]
    return out


def synth_full(v, off, s32):
    """One synthesis step, explicit per ISO: shift V, matrix, window, sum."""
    off = (off - 64) & 1023
    for i in range(64):
        acc = 0.0
        row = SYNTH_N[i]
        for k in range(32):
            acc += row[k] * s32[k]
        v[(off + i) & 1023] = acc
    out = [0.0] * 32
    for j in range(32):
        acc = 0.0
        for b in range(8):
            acc += SYNTH_D[j + (b << 6)] * v[(off + (b << 7) + j) & 1023]
            acc += SYNTH_D[j + (b << 6) + 32] * v[(off + (b << 7) + 96 + j) & 1023]
        out[j] = acc
    return out, off


# ---------------------------------------------------------------------------
# Frame assembly / top level
# ---------------------------------------------------------------------------

def skip_id3(b):
    if len(b) >= 10 and b[:3] == b"ID3":
        size = ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14) | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        return 10 + size
    return 0


def decode(data):
    """Decode an mp3 byte string -> (sample_rate, channels, [ch][samples] float)."""
    pos = skip_id3(data)
    reservoir = bytearray()
    out = [[], []]
    sr = None
    nch = None
    overlap = [[[0.0] * 18 for _ in range(32)] for _ in range(2)]
    v_state = [[0.0] * 1024 for _ in range(2)]
    v_off = [0, 0]
    prev_sf = [[0] * 22, [0] * 22]
    frames = 0
    while True:
        # resync: scan for the next valid header
        while pos + 4 <= len(data) and parse_header(data, pos) is None:
            pos += 1
        hd = parse_header(data, pos)
        if hd is None:
            break
        if pos + hd.frame_len > len(data):
            break
        if sr is None:
            sr = hd.sample_rate
            nch = hd.channels
        elif hd.sample_rate != sr or hd.channels != nch:
            raise Mp3Error("sample rate / channel change mid-stream")
        side_len = (9 if nch == 1 else 17) if hd.lsf else (17 if nch == 1 else 32)
        off = pos + 4 + (2 if hd.crc else 0)
        side = Bits(data, off * 8)
        si = parse_side_info(hd, side)
        main_this = data[off + side_len: pos + hd.frame_len]
        mdb = si["main_data_begin"]
        usable = len(reservoir) >= mdb
        if usable:
            main = bytes(reservoir[len(reservoir) - mdb:]) + bytes(main_this)
            bits = Bits(main, 0)
            ngr = 1 if hd.lsf else 2
            for gr in range(ngr):
                grs = si["granules"][gr]
                zbs = [0, 0]
                xrs = [None, None]
                for ch in range(nch):
                    g = grs[ch]
                    part2_start = bits.pos
                    if hd.lsf:
                        if (hd.mode == 1) and (hd.mode_ext & 1) and ch == 1:
                            raise Mp3Error("LSF intensity stereo not supported")
                        sfl, sfs, _ = read_scalefacs_lsf(bits, g, hd)
                    else:
                        # scfsi groups copy granule 0's scalefactors of the
                        # SAME frame; gr0 stores them below before gr1 reads
                        sfl, sfs = read_scalefacs_mpeg1(
                            bits, g, si["scfsi"][ch], gr, prev_sf[ch])
                    g.sf_long = sfl
                    if not hd.lsf:
                        prev_sf[ch] = sfl
                    ix, zb = read_huffman(bits, hd, g, part2_start)
                    zbs[ch] = zb
                    xr = requantize(hd, g, sfl, sfs, ix)
                    xr = reorder_short(hd, g, xr)
                    xrs[ch] = xr
                if nch == 2:
                    apply_stereo(hd, grs[0], grs[1], xrs[0], xrs[1], zbs[0], zbs[1])
                for ch in range(nch):
                    g = grs[ch]
                    alias_reduce(g, xrs[ch])
                    sub = imdct_granule(g, xrs[ch], overlap[ch])
                    for t in range(18):
                        s32 = [sub[sb][t] for sb in range(32)]
                        pcm, v_off[ch] = synth_full(v_state[ch], v_off[ch], s32)
                        out[ch].extend(pcm)
        else:
            # reservoir underrun at stream start: mute this frame
            n = 576 if hd.lsf else 1152
            for ch in range(nch):
                out[ch].extend([0.0] * n)
        reservoir.extend(main_this)
        if len(reservoir) > 4096:
            del reservoir[:len(reservoir) - 4096]
        pos += hd.frame_len
        frames += 1
    if frames == 0:
        raise Mp3Error("no MPEG audio frames found")
    return sr, nch, out[:nch]


def to_int16(chans):
    """Round/clamp interleaved int16 exactly as the Scala port does."""
    nch = len(chans)
    n = len(chans[0])
    pcm = []
    for i in range(n):
        for ch in range(nch):
            x = chans[ch][i] * 32768.0
            v = int(math.floor(x + 0.5))
            if v > 32767:
                v = 32767
            elif v < -32768:
                v = -32768
            pcm.append(v)
    return pcm


if __name__ == "__main__":
    import hashlib
    path = sys.argv[1]
    data = open(path, "rb").read()
    sr, nch, chans = decode(data)
    pcm = to_int16(chans)
    raw = b"".join(v.to_bytes(2, "little", signed=True) for v in pcm)
    print(f"{path}: {sr} Hz, {nch} ch, {len(chans[0])} samples/ch")
    print(f"  md5={hashlib.md5(raw).hexdigest()} sum={sum(pcm)} "
          f"max={max(abs(v) for v in pcm)}")

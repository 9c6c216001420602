#!/usr/bin/env python3
"""Generate VP8L (lossless WebP) conformance fixtures with the system
libwebp (dev-time only; sbt tests read the committed bytes).

Each fixture's SOURCE pixels come from a tiny deterministic generator that
WebpCodecSpec reproduces bit-for-bit in Scala (same LCG, same formulas), so
only the .webp bytes need committing: the test decodes the fixture with
graft's own VP8L decoder and asserts exact equality against the regenerated
source. Because the bytes were produced by libwebp's real encoder (predictor
/ cross-color / subtract-green / palette transforms, color cache, LZ77
backrefs, meta-prefix groups), this anchors the decoder against the actual
ecosystem, not against our own encoder's dialect.

Run: python3 scripts/gen_webp_fixtures.py  (writes src/main/resources/webp/;
main, not test, resources — the mm_decode_webp production query reads the
fixtures from the classpath too, see SparkEntry)
It also header-parses every stream and prints which VP8L features it uses,
and round-trips each through WebPDecodeRGBA as a sanity check.
"""
import ctypes, ctypes.util, os, sys

LIB = ctypes.CDLL("libwebp.so.7")
LIB.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
LIB.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
LIB.WebPEncodeLosslessRGB.argtypes = LIB.WebPEncodeLosslessRGBA.argtypes
LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
LIB.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                   "resources", "webp")


def lcg_bytes(seed, n):
    """Mirror of WebpCodecSpec.lcgBytes: 31-bit LCG, byte = (s >> 16) & 0xff."""
    s = seed & 0x7FFFFFFF
    out = bytearray(n)
    for i in range(n):
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        out[i] = (s >> 16) & 0xFF
    return bytes(out)


# ---- fixture pixel generators (each mirrored in WebpCodecSpec) -----------

def noise_rgb(w, h, seed):
    return lcg_bytes(seed, w * h * 3), 3

def gradient_rgb(w, h, _seed):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes([(x * 5) & 0xFF, (x * 3 + y * 3) & 0xFF, (y * 7) & 0xFF])
    return bytes(px), 3

def palette_rgb(w, h, seed, ncolors):
    pal = lcg_bytes(seed, ncolors * 3)
    idx = lcg_bytes(seed + 1, w * h)
    px = bytearray()
    for i in range(w * h):
        k = idx[i] % ncolors
        px += pal[k * 3:k * 3 + 3]
    return bytes(px), 3

def repeat_rgb(w, h, seed):
    tile = lcg_bytes(seed, 7 * 5 * 3)
    px = bytearray()
    for y in range(h):
        for x in range(w):
            t = ((y % 5) * 7 + (x % 7)) * 3
            px += tile[t:t + 3]
    return bytes(px), 3

def rgba_alpha(w, h, seed):
    rgb = lcg_bytes(seed, w * h * 3)
    px = bytearray()
    for i in range(w * h):
        x, y = i % w, i // w
        px += rgb[i * 3:i * 3 + 3] + bytes([1 + (x * 7 + y * 3) % 255])
    return bytes(px), 4

def photo_rgb(w, h, _seed):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes([((x * x + y * y) >> 3) & 0xFF,
                         ((x * y) >> 2) & 0xFF,
                         ((x * 3 + y * 5) >> 1) & 0xFF])
    return bytes(px), 3

def correlated_rgb(w, h, seed):
    """Channels strongly correlated with green: cross-color bait."""
    noise = lcg_bytes(seed, w * h)
    px = bytearray()
    for y in range(h):
        for x in range(w):
            g = (x * 2 + y * 3) & 0xFF
            r = (g + (noise[y * w + x] & 7)) & 0xFF
            b = ((g >> 1) + (x & 3)) & 0xFF
            px += bytes([r, g, b])
    return bytes(px), 3

def truecolor_repeat_rgb(w, h, seed):
    """A 20x17 noise tile (>256 distinct colors over the image) tiled:
    palettization impossible, so repeats become real LZ77 backrefs."""
    tile = lcg_bytes(seed, 20 * 17 * 3)
    px = bytearray()
    for y in range(h):
        for x in range(w):
            t = ((y % 17) * 20 + (x % 20)) * 3
            px += tile[t:t + 3]
    return bytes(px), 3

def mixed_rgb(w, h, seed):
    noise = lcg_bytes(seed, w * h * 3)
    px = bytearray()
    for y in range(h):
        for x in range(w):
            if x < w // 2:
                px += bytes([(x * 5) & 0xFF, (x * 3 + y * 3) & 0xFF, (y * 7) & 0xFF])
            else:
                i = (y * w + x) * 3
                px += noise[i:i + 3]
    return bytes(px), 3


FIXTURES = [
    ("noise_rgb",   33,  29, lambda w, h: noise_rgb(w, h, 7)),
    ("gradient",    40,  32, lambda w, h: gradient_rgb(w, h, 0)),
    ("palette2",    41,  17, lambda w, h: palette_rgb(w, h, 11, 2)),
    ("palette4",    37,  23, lambda w, h: palette_rgb(w, h, 13, 4)),
    ("palette16",   29,  31, lambda w, h: palette_rgb(w, h, 17, 16)),
    ("palette200",  26,  22, lambda w, h: palette_rgb(w, h, 19, 200)),
    ("repeat",      48,  30, lambda w, h: repeat_rgb(w, h, 23)),
    ("rgba_alpha",  32,  32, lambda w, h: rgba_alpha(w, h, 29)),
    ("photo_large", 160, 120, lambda w, h: photo_rgb(w, h, 0)),
    ("mixed_large", 144, 112, lambda w, h: mixed_rgb(w, h, 31)),
    ("correlated",  64,  48, lambda w, h: correlated_rgb(w, h, 37)),
    ("tc_repeat",   60,  51, lambda w, h: truecolor_repeat_rgb(w, h, 41)),
]


# ---- VP8L header feature probe -------------------------------------------

class Bits:
    def __init__(self, b, off):
        self.b, self.pos, self.bit = b, off, 0
    def read(self, n):
        v = 0
        for i in range(n):
            v |= ((self.b[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


def features(data):
    assert data[12:16] == b"VP8L", data[12:16]
    r = Bits(data, 20)
    assert r.read(8) == 0x2F
    w = r.read(14) + 1
    h = r.read(14) + 1
    r.read(1); r.read(3)
    feats = []
    while r.read(1) == 1:
        t = r.read(2)
        feats.append(["predictor", "color", "subtract_green", "palette"][t])
        if t in (0, 1):
            r.read(3)
            return feats + ["...stopped at transform sub-image"], w, h
        if t == 3:
            return feats + ["...stopped at palette image"], w, h
    if r.read(1) == 1:
        feats.append("color_cache(%d)" % r.read(4))
    if r.read(1) == 1:
        feats.append("meta_prefix")
    return feats, w, h


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, w, h, gen in FIXTURES:
        px, ch = gen(w, h)
        buf = ctypes.create_string_buffer(px, len(px))
        out = ctypes.POINTER(ctypes.c_ubyte)()
        enc = LIB.WebPEncodeLosslessRGBA if ch == 4 else LIB.WebPEncodeLosslessRGB
        size = enc(buf, w, h, w * ch, ctypes.byref(out))
        assert size > 0, name
        data = bytes(out[:size])
        # sanity: libwebp itself must round-trip the exact source
        dw, dh = ctypes.c_int(), ctypes.c_int()
        dec = LIB.WebPDecodeRGBA(data, size, ctypes.byref(dw), ctypes.byref(dh))
        assert (dw.value, dh.value) == (w, h), name
        got = bytes(dec[:w * h * 4])
        for i in range(w * h):
            exp = px[i * ch:i * ch + 3] + (px[i * ch + 3:i * ch + 4] if ch == 4 else b"\xff")
            assert got[i * 4:i * 4 + 4] == exp, (name, i)
        with open(os.path.join(OUT, name + ".webp"), "wb") as f:
            f.write(data)
        feats, fw, fh = features(data)
        # mode follows the VP8L alpha-hint bit (what graft's decoder emits);
        # the pixel sum is over SOURCE bytes (r+g+b, +a only when RGBA), so
        # the oracle constants are independent of any decoder
        alpha_bit = (data[20 + 4] >> 4) & 1  # 8 sig + 28 dim bits -> bit 36
        psum = 0
        for i in range(w * h):
            psum += sum(px[i * ch:i * ch + 3])
            if ch == 4 and alpha_bit:
                psum += px[i * ch + 3]
        mode = "RGBA" if alpha_bit else "RGB"
        print("%-12s %3dx%-3d %6d bytes  mode=%-4s sum=%-9d %s"
              % (name, fw, fh, size, mode, psum, feats))


if __name__ == "__main__":
    main()

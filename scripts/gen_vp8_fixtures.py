#!/usr/bin/env python3
"""Generate lossy (VP8 key-frame) WebP conformance fixtures with the system
libwebp (dev-time only; sbt tests read the committed bytes).

Mirror of scripts/gen_webp_fixtures.py for the LOSSY half of the codec:
each fixture's SOURCE pixels come from a tiny deterministic generator, the
stream is produced by libwebp's real VP8 encoder (WebPEncodeRGB at several
quality levels — boolean-coded headers, per-segment quantizers, intra
prediction residue tokens, normal loop filter), and the ORACLE is libwebp's
own decode of that stream:

  - the raw 4:2:0 reconstruction (WebPDecodeYUV) — VP8 reconstruction is
    integer-exact per RFC 6386, so graft's decoder must reproduce the Y/U/V
    planes BYTE-EXACTLY;
  - the RGBA raster (WebPDecodeRGBA, fancy chroma upsampler) — this script
    re-derives RGBA from the YUV planes with a from-scratch reimplementation
    of libwebp's published fancy-upsampler + fixed-point YUV→RGB math and
    asserts bit-equality, PROVING the exact formulas the Scala port must
    implement before any Scala exists.

Unlike the lossless fixtures the source pixels can't be regenerated at test
time (lossy!), so the manifest carries md5 digests of the decoded planes:

  src/main/resources/vp8/<name>.webp          the streams (committed)
  src/main/resources/vp8/manifest.tsv
      name w h md5_y md5_u md5_v md5_rgba pixel_sum mode
  (pixel_sum = sum over libwebp's RGBA decode in graft's ImageMeta
  convention — r+g+b per pixel, +a for RGBA-mode (VP8X+ALPH) fixtures —
  the pinned constant the mm_decode_webp DuckDB oracle carries)

RGBA fixtures (WebPEncodeRGBA) exercise the extended container: VP8X
header, the ALPH chunk (headerless-VP8L-coded alpha plane, the
horizontal/vertical/gradient prediction filters), and the alpha overlay
on the VP8 key frame.

Run: python3 scripts/gen_vp8_fixtures.py
"""
import ctypes, hashlib, os, struct

LIB = ctypes.CDLL("libwebp.so.7")
LIB.WebPEncodeRGB.restype = ctypes.c_size_t
LIB.WebPEncodeRGB.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeRGBA.argtypes = LIB.WebPEncodeRGB.argtypes
LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
LIB.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                               ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
LIB.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
LIB.WebPFree.restype = None
LIB.WebPFree.argtypes = [ctypes.c_void_p]

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                   "resources", "vp8")


def lcg_bytes(seed, n):
    """Same 31-bit LCG as gen_webp_fixtures / WebpCodecSpec.lcgBytes."""
    s = seed & 0x7FFFFFFF
    out = bytearray(n)
    for i in range(n):
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        out[i] = (s >> 16) & 0xFF
    return bytes(out)


# ---- source pixel generators (deterministic; sources are NOT re-derived
# at test time — the oracle is the decoded planes — but determinism keeps
# the fixtures reproducible from this script alone) -------------------------

def gradient(w, h):
    px = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            px[i] = (x * 255) // max(w - 1, 1)
            px[i + 1] = (y * 255) // max(h - 1, 1)
            px[i + 2] = ((x + y) * 255) // max(w + h - 2, 1)
    return bytes(px)


def photo(w, h, seed):
    """Smooth low-frequency content: sums of integer 'waves' from the LCG —
    what the encoder's segmentation/filter analysis sees as photographic."""
    waves = lcg_bytes(seed, 24)
    px = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            for c in range(3):
                k = c * 8
                v = (waves[k] * x // w + waves[k + 1] * y // h
                     + waves[k + 2] * (x * y) // (w * h)
                     + ((x * (waves[k + 3] % 7 + 1)) // 9
                        + (y * (waves[k + 4] % 5 + 1)) // 7) % 61)
                px[i + c] = v % 256
    return bytes(px)


def noise_blocks(w, h, seed):
    """Mixed content: noisy 8x8 blocks over a flat background — drives the
    encoder's per-segment quantizer choices apart."""
    rnd = lcg_bytes(seed, w * h * 3)
    px = bytearray(w * h * 3)
    for y in range(h):
        for x in range(w):
            i = (y * w + x) * 3
            if ((x // 8) + (y // 8)) % 3 == 0:
                px[i:i + 3] = rnd[i:i + 3]
            else:
                px[i], px[i + 1], px[i + 2] = 200, 180, 160
    return bytes(px)


# ---- from-scratch mirror of libwebp's fancy upsampler + YUV->RGB ----------
# (the exact math the Scala port implements; validated below against
# WebPDecodeRGBA on every fixture)

def _clip8(v):
    """VP8Clip8: value is YUV_FIX2(=6)-bit fixed point."""
    return (v >> 6) if (v & ~((256 << 6) - 1)) == 0 else (0 if v < 0 else 255)


def _yuv2rgba(y, u, v):
    ys = (y * 19077) >> 8
    r = _clip8(ys + ((v * 26149) >> 8) - 14234)
    g = _clip8(ys - ((u * 6419) >> 8) - ((v * 13320) >> 8) + 8708)
    b = _clip8(ys + ((u * 33050) >> 8) - 17685)
    return bytes((r, g, b, 255))


def _upsample_pair(top_y, bot_y, top_u, top_v, cur_u, cur_v, w):
    """One call of libwebp's UPSAMPLE_FUNC: emits one RGBA row for top_y and
    (if bot_y is not None) one for bot_y, interpolating chroma 2x in both
    directions with the (9,3,3,1)/16 diagonal scheme."""
    top = bytearray()
    bot = bytearray() if bot_y is not None else None
    LOAD = lambda row_u, row_v, i: row_u[i] | (row_v[i] << 16)
    tl_uv = LOAD(top_u, top_v, 0)
    l_uv = LOAD(cur_u, cur_v, 0)
    uv0 = (3 * tl_uv + l_uv + 0x00020002) >> 2
    top += _yuv2rgba(top_y[0], uv0 & 0xFF, (uv0 >> 16) & 0xFF)
    if bot is not None:
        uv0 = (3 * l_uv + tl_uv + 0x00020002) >> 2
        bot += _yuv2rgba(bot_y[0], uv0 & 0xFF, (uv0 >> 16) & 0xFF)
    for x in range(1, ((w - 1) >> 1) + 1):
        t_uv = LOAD(top_u, top_v, x)
        uv = LOAD(cur_u, cur_v, x)
        avg = tl_uv + t_uv + l_uv + uv + 0x00080008
        diag_12 = (avg + 2 * (t_uv + l_uv)) >> 3
        diag_03 = (avg + 2 * (tl_uv + uv)) >> 3
        uv0 = (diag_12 + tl_uv) >> 1
        uv1 = (diag_03 + t_uv) >> 1
        top += _yuv2rgba(top_y[2 * x - 1], uv0 & 0xFF, (uv0 >> 16) & 0xFF)
        top += _yuv2rgba(top_y[2 * x], uv1 & 0xFF, (uv1 >> 16) & 0xFF)
        if bot is not None:
            uv0 = (diag_03 + l_uv) >> 1
            uv1 = (diag_12 + uv) >> 1
            bot += _yuv2rgba(bot_y[2 * x - 1], uv0 & 0xFF, (uv0 >> 16) & 0xFF)
            bot += _yuv2rgba(bot_y[2 * x], uv1 & 0xFF, (uv1 >> 16) & 0xFF)
        tl_uv, l_uv = t_uv, uv
    if not (w & 1):
        uv0 = (3 * tl_uv + l_uv + 0x00020002) >> 2
        top += _yuv2rgba(top_y[w - 1], uv0 & 0xFF, (uv0 >> 16) & 0xFF)
        if bot is not None:
            uv0 = (3 * l_uv + tl_uv + 0x00020002) >> 2
            bot += _yuv2rgba(bot_y[w - 1], uv0 & 0xFF, (uv0 >> 16) & 0xFF)
    return bytes(top), (bytes(bot) if bot is not None else None)


def fancy_rgba(yp, up, vp, w, h):
    """libwebp EmitFancyRGB over whole planes: row 0 alone (chroma row
    mirrored), then row pairs (1,2), (3,4), ... sharing chroma rows (r,r+1),
    then the last row alone when h is even."""
    uvw = (w + 1) >> 1
    yrow = lambda r: yp[r * w:(r + 1) * w]
    urow = lambda r: up[r * uvw:(r + 1) * uvw]
    vrow = lambda r: vp[r * uvw:(r + 1) * uvw]
    rows = [None] * h
    rows[0], _ = _upsample_pair(yrow(0), None, urow(0), vrow(0),
                                urow(0), vrow(0), w)
    y = 1
    cr = 0
    while y + 1 < h:
        t, b = _upsample_pair(yrow(y), yrow(y + 1), urow(cr), vrow(cr),
                              urow(cr + 1), vrow(cr + 1), w)
        rows[y], rows[y + 1] = t, b
        y += 2
        cr += 1
    if y < h:  # h even: last row alone, chroma row mirrored
        rows[y], _ = _upsample_pair(yrow(y), None, urow(cr), vrow(cr),
                                    urow(cr), vrow(cr), w)
    return b"".join(rows)


# ---- encode + oracle-extract ----------------------------------------------

def encode(rgb, w, h, q):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = LIB.WebPEncodeRGB(rgb, w, h, w * 3, ctypes.c_float(q),
                          ctypes.byref(out))
    assert n > 0, "WebPEncodeRGB failed"
    data = bytes(bytearray(out[i] for i in range(n)))
    LIB.WebPFree(out)
    return data


def encode_rgba(rgba, w, h, q):
    out = ctypes.POINTER(ctypes.c_ubyte)()
    n = LIB.WebPEncodeRGBA(rgba, w, h, w * 4, ctypes.c_float(q),
                           ctypes.byref(out))
    assert n > 0, "WebPEncodeRGBA failed"
    data = bytes(bytearray(out[i] for i in range(n)))
    LIB.WebPFree(out)
    return data


def with_alpha(rgb, w, h, afn):
    """Attach a deterministic alpha channel to an RGB raster."""
    out = bytearray(w * h * 4)
    for i in range(w * h):
        out[i * 4:i * 4 + 3] = rgb[i * 3:i * 3 + 3]
        out[i * 4 + 3] = afn(i % w, i // w) & 0xFF
    return bytes(out)


def decode_yuv(data):
    w, h = ctypes.c_int(), ctypes.c_int()
    u, v = ctypes.POINTER(ctypes.c_ubyte)(), ctypes.POINTER(ctypes.c_ubyte)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    yptr = LIB.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                             ctypes.byref(u), ctypes.byref(v),
                             ctypes.byref(stride), ctypes.byref(uv_stride))
    assert yptr, "WebPDecodeYUV failed"
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    uvw, uvh = (W + 1) >> 1, (H + 1) >> 1
    yp = b"".join(bytes(bytearray(yptr[r * S:r * S + W])) for r in range(H))
    up = b"".join(bytes(bytearray(u[r * US:r * US + uvw])) for r in range(uvh))
    vp = b"".join(bytes(bytearray(v[r * US:r * US + uvw])) for r in range(uvh))
    LIB.WebPFree(yptr)
    return W, H, yp, up, vp


def decode_rgba(data):
    w, h = ctypes.c_int(), ctypes.c_int()
    p = LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    assert p, "WebPDecodeRGBA failed"
    n = w.value * h.value * 4
    out = bytes(bytearray(p[i] for i in range(n)))
    LIB.WebPFree(p)
    return out


FIXTURES = [
    # name, pixels, w, h, quality — odd dims stress the upsampler edge
    # rules; the quality spread stresses per-segment quant + filter levels
    ("grad_q75", gradient, 64, 48, 75.0),
    ("photo_q50", lambda w, h: photo(w, h, 7), 80, 64, 50.0),
    ("photo_q90", lambda w, h: photo(w, h, 11), 128, 96, 90.0),
    ("mixed_q20", lambda w, h: noise_blocks(w, h, 3), 64, 64, 20.0),
    ("odd_q60", lambda w, h: photo(w, h, 5), 61, 37, 60.0),
    ("tiny_q80", gradient, 9, 7, 80.0),
    ("noise_q40", lambda w, h: noise_blocks(w, h, 9), 96, 80, 40.0),
]

# VP8X + ALPH fixtures: alpha patterns chosen so libwebp's filter
# heuristic picks DIFFERENT ALPH prediction filters (the wrapping ramp at
# 48x32 provokes the horizontal filter; the others land on none)
FIXTURES_RGBA = [
    ("alpha_ramp_q75", lambda w, h: photo(w, h, 13),
     lambda x, y: (x * 4 + y * 2) % 256, 48, 32, 75.0),
    ("alpha_steps_q50", gradient,
     lambda x, y: 255 - ((x // 8) * 32) % 256, 48, 32, 50.0),
    ("alpha_noise_q80", lambda w, h: noise_blocks(w, h, 5),
     lambda x, y: (((x * 31 + y * 17) * 2654435761) >> 16) % 256, 33, 29, 80.0),
]


def forward_filter(plane, w, h, f):
    """Apply the ALPH prediction filter (what an encoder stores); the
    decoder's unfilter must invert this. Row 0 always filters
    horizontally; later rows predict x=0 from the pixel above."""
    def clip(g): return 0 if g < 0 else 255 if g > 255 else g
    out = bytearray(w * h)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if f == 0:
                pred = 0
            elif y == 0 or f == 1:
                pred = (plane[i - 1] if x > 0 else
                        (plane[i - w] if y > 0 else 0))
            elif f == 2:
                pred = plane[i - w]
            else:
                pred = (plane[i - w] if x == 0 else
                        clip(plane[i - 1] + plane[i - w] - plane[i - w - 1]))
            out[i] = (plane[i] - pred) & 0xFF
    return bytes(out)


def build_raw_alpha(vp8_chunk, plane, w, h, f):
    """Assemble a VP8X + raw-ALPH (compression 0, filter f) + VP8 file by
    hand; the caller pins it by having LIBWEBP decode it — so these
    synthetic streams verify the decoder's raw path and ALL FOUR filters
    against the ecosystem decoder, not against our own unfilter."""
    alph = bytes([f << 2]) + forward_filter(plane, w, h, f)
    def chunk(fcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fcc + struct.pack("<I", len(body)) + body + pad
    vp8x = bytes([0x10, 0, 0, 0]) + struct.pack("<I", w - 1)[:3] + \
        struct.pack("<I", h - 1)[:3]
    body = b"WEBP" + chunk(b"VP8X", vp8x) + chunk(b"ALPH", alph) + vp8_chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def main():
    os.makedirs(OUT, exist_ok=True)
    manifest = []
    md5 = lambda b: hashlib.md5(b).hexdigest()

    def pin(name, data, w, h, mode):
        W, H, yp, up, vp = decode_yuv(data)
        assert (W, H) == (w, h)
        rgba_lib = decode_rgba(data)
        rgba_mine = fancy_rgba(yp, up, vp, w, h)
        # for RGBA fixtures compare the RGB channels only: alpha rides the
        # ALPH chunk, not the YUV planes this mirror upsamples
        for i in range(w * h):
            for c in range(3 if mode == "RGBA" else 4):
                if rgba_mine[i * 4 + c] != rgba_lib[i * 4 + c]:
                    raise AssertionError(
                        f"{name}: upsampler mirror diverges at px {i} ch {c}: "
                        f"lib={rgba_lib[i*4+c]} mine={rgba_mine[i*4+c]}")
        with open(os.path.join(OUT, name + ".webp"), "wb") as f:
            f.write(data)
        pixel_sum = sum(rgba_lib)
        if mode == "RGB":
            pixel_sum -= 255 * w * h  # drop the constant alpha
        manifest.append(f"{name}\t{w}\t{h}\t{md5(yp)}\t{md5(up)}\t{md5(vp)}"
                        f"\t{md5(rgba_lib)}\t{pixel_sum}\t{mode}")
        print(f"{name}: {len(data)} bytes {mode}, pixel_sum={pixel_sum}, "
              "upsampler mirror EXACT")

    for name, gen, w, h, q in FIXTURES:
        pin(name, encode(gen(w, h), w, h, q), w, h, "RGB")
    for name, gen, afn, w, h, q in FIXTURES_RGBA:
        data = encode_rgba(with_alpha(gen(w, h), w, h, afn), w, h, q)
        assert data[12:16] == b"VP8X", f"{name}: expected extended container"
        alph_hdr = data[data.find(b"ALPH") + 8]
        print(f"  {name}: ALPH filter={alph_hdr >> 2 & 3} "
              f"compression={alph_hdr & 3}")
        pin(name, data, w, h, "RGBA")
    # hand-built raw-ALPH (compression 0) files, one per prediction filter,
    # pinned by libwebp decoding OUR construction — covers the filters the
    # encoder's heuristic never picks (vertical, gradient) and the raw path
    grad_data = open(os.path.join(OUT, "grad_q75.webp"), "rb").read()
    v8at = grad_data.find(b"VP8 ")
    v8size = struct.unpack("<I", grad_data[v8at + 4:v8at + 8])[0]
    vp8_chunk = grad_data[v8at:v8at + 8 + v8size + (v8size & 1)]
    plane = lcg_bytes(21, 64 * 24) + bytes(
        (x * 3 + y * 5) % 256 for y in range(24) for x in range(64))
    for f in range(4):
        name = f"alpha_rawf{f}"
        data = build_raw_alpha(vp8_chunk, plane, 64, 48, f)
        pin(name, data, 64, 48, "RGBA")
    with open(os.path.join(OUT, "manifest.tsv"), "w") as f:
        f.write("\n".join(manifest) + "\n")
    print(f"wrote {len(FIXTURES) + len(FIXTURES_RGBA) + 4} fixtures + manifest to {OUT}")


if __name__ == "__main__":
    main()

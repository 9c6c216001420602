#!/usr/bin/env python3
"""Generate ANIMATED WebP conformance fixtures with the system libwebp
(dev-time only; sbt tests read the committed bytes).

The container has no libwebpmux/libwebpdemux, so the ANIMATION layer is
hand-assembled here per the WebP container spec (RIFF + VP8X(ANIM) + ANIM
+ per-frame ANMF), while every FRAME PAYLOAD is produced by libwebp's real
encoders (WebPEncodeLosslessRGBA / WebPEncodeRGB / WebPEncodeRGBA) and its
expected pixels are libwebp's OWN WebPDecodeRGBA of the same payload
wrapped as a still file — so frame pixels stay pinned to the ecosystem
exactly like the VP8L/VP8 still fixtures, and only the COMPOSITING model
(canvas init, blend, dispose) is computed here.

Rounding-independence rule: every frame that rides an alpha-BLENDED ANMF
has strictly binary alpha (0 or 255, asserted below after a decode
round-trip), so the committed canvas sums are identical under ANY correct
integer blend convention — the fractional-alpha rounding of the Scala
implementation is pinned separately by a hand-computed unit test, not by
these fixtures.

Compositing model (= WebpCodec.decodeAnimation, = libwebp anim_decode.c /
Pillow semantics):
  - canvas starts fully transparent black (the ANIM background color is
    metadata; libwebp's demuxer does not paint it);
  - frame render: ANMF blend bit 0x02 SET -> overwrite the frame rect;
    CLEAR -> straight-alpha OVER (exact-rational; irrelevant here, see
    the binary-alpha rule);
  - ANMF dispose bit 0x01 SET -> AFTER the frame is displayed, its rect
    is zero-filled before the NEXT frame renders.

manifest.tsv: name canvas_w canvas_h n_frames first_sum timeline_sum
  first_sum    = sum(r+g+b+a) over the canvas after frame 1 renders (the
                 Pillow frame-0 view, what the convert-surface sink gets)
  timeline_sum = sum over EVERY frame f of the canvas sum after f renders
                 (pins every frame decode, blend and dispose in one value;
                 this is the ImageMeta.pixelSum the oracle carries)

Run: python3 scripts/gen_anim_webp_fixtures.py
(writes src/main/resources/webp_anim/)
"""
import ctypes, os, struct

LIB = ctypes.CDLL("libwebp.so.7")
LIB.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte))]
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
LIB.WebPFree.restype = None
LIB.WebPFree.argtypes = [ctypes.c_void_p]

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "main",
                   "resources", "webp_anim")


def lcg_bytes(seed, n):
    s = seed & 0x7FFFFFFF
    out = bytearray()
    for _ in range(n):
        s = (s * 1103515245 + 12345) & 0x7FFFFFFF
        out.append((s >> 16) & 0xFF)
    return bytes(out)


def raster_rgba(seed, w, h, alpha="opaque"):
    """Deterministic RGBA raster. alpha: opaque | binary (0/255 checker by
    LCG byte) — binary is mandatory for blended frames (see module doc)."""
    rnd = lcg_bytes(seed, w * h * 4)
    px = bytearray(rnd)
    for i in range(w * h):
        px[i * 4 + 3] = 255 if alpha == "opaque" else (255 if rnd[i * 4 + 3] >= 128 else 0)
    return bytes(px)


def raster_rgb(seed, w, h):
    return lcg_bytes(seed, w * h * 3)


def encode(kind, seed, w, h, q=75.0):
    """Encode one frame; returns the full STILL .webp bytes."""
    buf = ctypes.POINTER(ctypes.c_ubyte)()
    if kind == "vp8l":
        data = raster_rgba(seed, w, h, "binary")
        n = LIB.WebPEncodeLosslessRGBA(data, w, h, w * 4, ctypes.byref(buf))
    elif kind == "vp8l_opaque":
        data = raster_rgba(seed, w, h, "opaque")
        n = LIB.WebPEncodeLosslessRGBA(data, w, h, w * 4, ctypes.byref(buf))
    elif kind == "vp8":
        data = raster_rgb(seed, w, h)
        n = LIB.WebPEncodeRGB(data, w, h, w * 3, q, ctypes.byref(buf))
    elif kind == "vp8_alpha":
        data = raster_rgba(seed, w, h, "binary")
        n = LIB.WebPEncodeRGBA(data, w, h, w * 4, q, ctypes.byref(buf))
    else:
        raise ValueError(kind)
    assert n > 0, f"encode failed {kind} {w}x{h}"
    still = bytes(bytearray(buf[i] for i in range(n)))
    LIB.WebPFree(buf)
    return still


def chunks(webp):
    """RIFF chunk walk -> dict fourcc -> payload (first occurrence)."""
    assert webp[:4] == b"RIFF" and webp[8:12] == b"WEBP"
    out, i = {}, 12
    while i + 8 <= len(webp):
        fourcc = webp[i:i + 4].decode("latin1")
        size = struct.unpack("<I", webp[i + 4:i + 8])[0]
        out.setdefault(fourcc, webp[i + 8:i + 8 + size])
        i += 8 + size + (size & 1)
    return out


def decode_rgba(webp):
    w = ctypes.c_int(); h = ctypes.c_int()
    p = LIB.WebPDecodeRGBA(webp, len(webp), ctypes.byref(w), ctypes.byref(h))
    assert p, "libwebp decode failed"
    n = w.value * h.value * 4
    out = bytes(bytearray(p[i] for i in range(n)))
    LIB.WebPFree(p)
    return out, w.value, h.value


def chunk(fourcc, payload):
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc.encode() + struct.pack("<I", len(payload)) + payload + pad


def u24(v):
    return struct.pack("<I", v)[:3]


def assemble(canvas_w, canvas_h, frames):
    """frames: list of (x, y, dur, flags, still_webp_bytes).
    Re-wraps each still's image chunks (ALPH? + VP8/VP8L) inside an ANMF."""
    body = b""
    has_alpha = False
    for (x, y, dur, flags, still) in frames:
        cs = chunks(still)
        inner = b""
        if "ALPH" in cs:
            inner += chunk("ALPH", cs["ALPH"])
            has_alpha = True
        if "VP8L" in cs:
            inner += chunk("VP8L", cs["VP8L"])
            if cs["VP8L"][4] & 0x10:  # alpha-hint bit of the VP8L header
                has_alpha = True
        elif "VP8 " in cs:
            inner += chunk("VP8 ", cs["VP8 "])
        else:
            raise ValueError("still has no image chunk")
        anmf = (u24(x // 2) + u24(y // 2) + u24(still_dims(still)[0] - 1) +
                u24(still_dims(still)[1] - 1) + u24(dur) + bytes([flags]) + inner)
        body += chunk("ANMF", anmf)
    vp8x = bytes([0x02 | (0x10 if has_alpha else 0), 0, 0, 0]) + \
        u24(canvas_w - 1) + u24(canvas_h - 1)
    anim = struct.pack("<I", 0x00000000) + struct.pack("<H", 0)  # bg, loop=0
    payload = chunk("VP8X", vp8x) + chunk("ANIM", anim) + body
    return b"RIFF" + struct.pack("<I", 4 + len(payload)) + b"WEBP" + payload


def still_dims(still):
    _, w, h = decode_rgba(still)
    return w, h


def composite(canvas_w, canvas_h, frames):
    """Returns (n_frames, first_sum, timeline_sum) per the module doc."""
    canvas = bytearray(canvas_w * canvas_h * 4)
    first_sum = timeline_sum = 0
    prev_dispose_rect = None
    for fi, (x, y, dur, flags, still) in enumerate(frames):
        if prev_dispose_rect:
            (px, py, pw, ph) = prev_dispose_rect
            for yy in range(py, py + ph):
                row = (yy * canvas_w + px) * 4
                canvas[row:row + pw * 4] = bytes(pw * 4)
        rgba, fw, fh = decode_rgba(still)
        blend = (flags & 0x02) == 0
        if blend:
            for i in range(3, fw * fh * 4, 4):
                a = rgba[i]
                assert a in (0, 255), \
                    "blended frame must have binary alpha (rounding-independence)"
        for yy in range(fh):
            for xx in range(fw):
                si = (yy * fw + xx) * 4
                di = ((y + yy) * canvas_w + (x + xx)) * 4
                sa = rgba[si + 3]
                if not blend or sa == 255:
                    canvas[di:di + 4] = rgba[si:si + 4]
                # sa == 0 under blend: keep dst
        s = sum(canvas)
        if fi == 0:
            first_sum = s
        timeline_sum += s
        prev_dispose_rect = (x, y, fw, fh) if (flags & 0x01) else None
    return len(frames), first_sum, timeline_sum


def main():
    os.makedirs(OUT, exist_ok=True)
    # flags: 0x02 = do-not-blend (overwrite), 0x01 = dispose-to-background
    fixtures = [
        # 2 full-canvas lossless opaque frames, plain overwrite timeline
        ("anim_basic", 40, 28, [
            (0, 0, 40, 0x02, encode("vp8l_opaque", 11, 40, 28)),
            (0, 0, 40, 0x02, encode("vp8l_opaque", 12, 40, 28))]),
        # sub-rect lossless frames alpha-blended onto a full first frame
        ("anim_subrect", 48, 36, [
            (0, 0, 50, 0x02, encode("vp8l_opaque", 21, 48, 36)),
            (8, 4, 50, 0x00, encode("vp8l", 22, 20, 16)),
            (24, 12, 50, 0x00, encode("vp8l", 23, 16, 20))]),
        # middle frame disposes its rect to transparent before frame 3
        ("anim_dispose", 44, 32, [
            (0, 0, 60, 0x02, encode("vp8l_opaque", 31, 44, 32)),
            (4, 8, 60, 0x03, encode("vp8l", 32, 24, 12)),
            (12, 2, 60, 0x00, encode("vp8l", 33, 18, 22))]),
        # lossy VP8 frames (opaque), second is a sub-rect; first disposes
        ("anim_lossy", 64, 48, [
            (0, 0, 40, 0x03, encode("vp8", 41, 64, 48, 60.0)),
            (16, 8, 40, 0x02, encode("vp8", 42, 32, 24, 80.0))]),
        # mixed codecs: lossless canvas, lossy sub-rect, lossless sub-rect
        ("anim_mixed", 64, 48, [
            (0, 0, 30, 0x02, encode("vp8l_opaque", 51, 64, 48)),
            (8, 8, 30, 0x02, encode("vp8", 52, 24, 16, 70.0)),
            (32, 16, 30, 0x00, encode("vp8l", 53, 20, 24))]),
        # VP8+ALPH inside ANMF (extended lossy frames with binary alpha)
        ("anim_lossy_alpha", 48, 32, [
            (0, 0, 45, 0x02, encode("vp8l_opaque", 61, 48, 32)),
            (8, 4, 45, 0x00, encode("vp8_alpha", 62, 24, 20, 75.0))]),
    ]
    manifest = []
    for (name, cw, ch, frames) in fixtures:
        data = assemble(cw, ch, frames)
        n, first, timeline = composite(cw, ch, frames)
        with open(os.path.join(OUT, f"{name}.webp"), "wb") as f:
            f.write(data)
        manifest.append(f"{name}\t{cw}\t{ch}\t{n}\t{first}\t{timeline}")
        print(manifest[-1], f"({len(data)} bytes)")
    with open(os.path.join(OUT, "manifest.tsv"), "w") as f:
        f.write("\n".join(manifest) + "\n")


if __name__ == "__main__":
    main()

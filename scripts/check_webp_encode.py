#!/usr/bin/env python3
"""Cross-check graft's VP8L ENCODER against the real libwebp decoder
(dev-time only; the sbt suite cross-pins the DECODER on committed
libwebp-encoded fixtures, but the encode direction needs a native
decoder, which the JVM doesn't ship).

1. Dump encodes + source rasters (a temporary test works well):
     WebpCodec.encode(buf) -> /tmp/webp_enc_check/<MODE>_<W>x<H>_<seed>.webp
     buf.data              -> /tmp/webp_enc_check/<MODE>_<W>x<H>_<seed>.raw
2. python3 scripts/check_webp_encode.py
   -> every file must print EXACT (per-channel equality; RGB files must
      decode with alpha 255 everywhere).

Last run 2026-08-19: 4/4 EXACT (RGB+RGBA, incl. 64x48 noise).
"""
import ctypes, os, glob, sys

LIB = ctypes.CDLL("libwebp.so.7")
LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
LIB.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

ok = fail = 0
for f in sorted(glob.glob("/tmp/webp_enc_check/*.webp")):
    name = os.path.basename(f)[:-5]
    mode, dims, seed = name.split("_")
    w0, h0 = map(int, dims.split("x"))
    data = open(f, "rb").read()
    raw = open(f[:-5] + ".raw", "rb").read()
    w, h = ctypes.c_int(), ctypes.c_int()
    p = LIB.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    if not p:
        print(f"{name}: libwebp REFUSED to decode"); fail += 1; continue
    if (w.value, h.value) != (w0, h0):
        print(f"{name}: dims {w.value}x{h.value} != {w0}x{h0}"); fail += 1; continue
    got = bytes(ctypes.cast(p, ctypes.POINTER(ctypes.c_ubyte * (w0*h0*4))).contents)
    ch = 4 if mode == "RGBA" else 3
    mism = 0
    for i in range(w0*h0):
        for c in range(ch):
            if got[i*4+c] != raw[i*ch+c]: mism += 1
        if ch == 3 and got[i*4+3] != 255: mism += 1
    if mism: print(f"{name}: {mism} channel mismatches"); fail += 1
    else: print(f"{name}: EXACT"); ok += 1
print(f"ok={ok} fail={fail}")
sys.exit(1 if fail else 0)

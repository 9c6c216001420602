#!/usr/bin/env python3
"""Dev-only: diff /tmp/vp8_dbg/<name>.{y,u,v} (graft's decode) against the
system libwebp's WebPDecodeYUV planes; report the first mismatching pixel
per plane with macroblock coordinates."""
import ctypes, os, sys

LIB = ctypes.CDLL("libwebp.so.7")
LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
LIB.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

FIX = os.path.join(os.path.dirname(__file__), "..", "src", "main", "resources", "vp8")


def decode_yuv(data):
    w, h = ctypes.c_int(), ctypes.c_int()
    u, v = ctypes.POINTER(ctypes.c_ubyte)(), ctypes.POINTER(ctypes.c_ubyte)()
    stride, uv_stride = ctypes.c_int(), ctypes.c_int()
    yptr = LIB.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                             ctypes.byref(u), ctypes.byref(v),
                             ctypes.byref(stride), ctypes.byref(uv_stride))
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    uvw, uvh = (W + 1) >> 1, (H + 1) >> 1
    yp = b"".join(bytes(bytearray(yptr[r * S:r * S + W])) for r in range(H))
    up = b"".join(bytes(bytearray(u[r * US:r * US + uvw])) for r in range(uvh))
    vp = b"".join(bytes(bytearray(v[r * US:r * US + uvw])) for r in range(uvh))
    return W, H, yp, up, vp


def diff(name, plane, mine, ref, w):
    if mine == ref:
        print(f"  {plane}: OK")
        return
    n = min(len(mine), len(ref))
    bad = [i for i in range(n) if mine[i] != ref[i]]
    i = bad[0]
    x, y = i % w, i // w
    mbs = 16 if plane == 'y' else 8
    print(f"  {plane}: {len(bad)}/{n} differ; first at ({x},{y}) "
          f"MB ({x//mbs},{y//mbs}) sub({x%mbs//4},{y%mbs//4}) "
          f"mine={mine[i]} ref={ref[i]}")
    # context window around first mismatch
    for r in range(max(0, y-1), min(n//w, y+2)):
        ours = " ".join(f"{mine[r*w+c]:3d}" for c in range(max(0,x-4), min(w,x+5)))
        refs = " ".join(f"{ref[r*w+c]:3d}" for c in range(max(0,x-4), min(w,x+5)))
        print(f"    row{r}: mine [{ours}]  ref [{refs}]")


for name in (sys.argv[1:] or
             ["tiny_q80", "grad_q75", "photo_q50", "mixed_q20", "odd_q60",
              "photo_q90", "noise_q40"]):
    data = open(os.path.join(FIX, name + ".webp"), "rb").read()
    W, H, yp, up, vp = decode_yuv(data)
    uvw = (W + 1) >> 1
    print(f"{name} {W}x{H}:")
    for plane, ref, w in (("y", yp, W), ("u", up, uvw), ("v", vp, uvw)):
        try:
            mine = open(f"/tmp/vp8_dbg/{name}.{plane}", "rb").read()
        except FileNotFoundError:
            print(f"  {plane}: no dump"); continue
        diff(name, plane, mine, ref, w)

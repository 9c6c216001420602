#!/usr/bin/env python3
"""Dev-only: Python mirror of Vp8Codec.scala for debugging — decodes a VP8
fixture with verbose tracing and diffs planes against libwebp's
WebPDecodeYUV. Usage: dbg_vp8_ref.py <fixture> [--nofilter] [--modes]"""
import ctypes, os, sys

HERE = os.path.dirname(__file__)
FIX = os.path.join(HERE, "..", "src", "main", "resources", "vp8")

# ---- tables from the Scala generator (same extraction) ---------------------
import struct
_so = open("/usr/lib/x86_64-linux-gnu/libwebp.so.7", "rb")
_data = open(os.path.realpath("/usr/lib/x86_64-linux-gnu/libwebp.so.7"), "rb").read()
def _find(needle): i = _data.find(needle); assert i != -1; return i
_bands_at = _find(bytes([0,1,2,3,6,4,5,6,6,6,6,6,6,6,6,7]))
_ac_at = _find(struct.pack("<8H",4,5,6,7,8,9,10,11))
_dc_at = _find(bytes([4,5,6,7,8,9,10,10,11,12]))
_upd_at = _find(bytes([255]*33+[176,246,255]))
_bmode_at = _find(bytes([231,120,48,89,115,113,120,152,112]))
_coef_at = _find(bytes([128]*33+[253,136,254]))
_zig_at = _find(bytes([0,1,4,8,5,2,3,6,9,12,13,10,7,11,14,15]))
ACQ = list(struct.unpack("<128H", _data[_ac_at:_ac_at+256]))
DCQ = list(_data[_dc_at:_dc_at+128])
BANDS = list(_data[_bands_at:_bands_at+16])
UPD = list(_data[_upd_at:_upd_at+1056])
BMODEP_RAW = list(_data[_bmode_at:_bmode_at+900])
PERM_BM = [0,1,2,3,6,4,5,7,8,9]  # RFC -> libwebp mode index
BMODEP = [0]*900
for _a in range(10):
    for _l in range(10):
        _s = (PERM_BM[_a]*10+PERM_BM[_l])*9; _t = (_a*10+_l)*9
        BMODEP[_t:_t+9] = BMODEP_RAW[_s:_s+9]
COEFP = list(_data[_coef_at:_coef_at+1056])
ZIG = list(_data[_zig_at:_zig_at+16])

KF_YMODE_TREE = [-4, 2, 4, 6, 0, -1, -2, -3]
KF_YMODE_PROB = [145, 156, 163, 128]
UV_TREE = [0, 2, -1, 4, -2, -3]
KF_UV_PROB = [142, 114, 183]
BMODE_TREE = [0, 2, -1, 4, -2, 6, 8, 12, -3, 10, -5, -6, -4, 14, -7, 16, -8, -9]
SEG_TREE = [2, 4, 0, -1, -2, -3]
IMPLIED = [0, 2, 3, 1]
CATP = [[159],[165,145],[173,148,140],[176,155,140,135],
        [180,157,141,134,130],[254,254,243,230,196,177,153,140,133,130,129]]
CATB = [5,7,11,19,35,67]


class BD:
    def __init__(self, b, start, end):
        self.b, self.pos, self.end = b, start, end
        self.range = 255
        self.bits = 0
        self.value = (self._nb() << 8) | self._nb()
    def _nb(self):
        v = self.b[self.pos] if self.pos < self.end else 0
        self.pos += 1
        return v
    def bool(self, prob):
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1; self.range -= split; self.value -= big
        else:
            ret = 0; self.range = split
        while self.range < 128:
            self.value <<= 1; self.range <<= 1; self.bits += 1
            if self.bits == 8:
                self.bits = 0; self.value |= self._nb()
        return ret
    def bit(self): return self.bool(128)
    def lit(self, n):
        v = 0
        for _ in range(n): v = (v << 1) | self.bit()
        return v
    def fsig(self, n):
        if self.bit() == 0: return 0
        v = self.lit(n)
        return -v if self.bit() == 1 else v
    def tree(self, t, p, off=0):
        i = t[self.bool(p[off])]
        while i > 0:
            i = t[i + self.bool(p[off + (i >> 1)])]
        return -i


def clamp(v, lo, hi): return lo if v < lo else hi if v > hi else v
def c255(v): return 0 if v < 0 else 255 if v > 255 else v


def decode(data, nofilter=False, show_modes=False):
    # container walk
    assert data[12:16] == b"VP8 ", "not simple lossy"
    size = struct.unpack("<I", data[16:20])[0]
    off = 20
    tag = data[off] | (data[off+1] << 8) | (data[off+2] << 16)
    assert tag & 1 == 0
    fps = tag >> 5
    assert data[off+3:off+6] == b"\x9d\x01\x2a"
    w = (data[off+6] | (data[off+7] << 8)) & 0x3fff
    h = (data[off+8] | (data[off+9] << 8)) & 0x3fff
    d = BD(data, off + 10, off + 10 + fps)
    mbW, mbH = (w + 15) >> 4, (h + 15) >> 4

    d.bit(); d.bit()  # color space, clamping
    segEnabled = d.bit() == 1
    updateSegMap = False; segAbs = False
    segQuant = [0]*4; segLf = [0]*4; segTreeProbs = [255]*3
    if segEnabled:
        updateSegMap = d.bit() == 1
        if d.bit() == 1:
            segAbs = d.bit() == 1
            for i in range(4): segQuant[i] = d.fsig(7)
            for i in range(4): segLf[i] = d.fsig(6)
        if updateSegMap:
            for i in range(3):
                if d.bit() == 1: segTreeProbs[i] = d.lit(8)
    simple = d.bit() == 1
    flevel = d.lit(6)
    sharp = d.lit(3)
    lfd = d.bit() == 1
    refD = [0]*4; modeD = [0]*4
    if lfd and d.bit() == 1:
        for i in range(4):
            if d.bit() == 1:
                v = d.lit(6); refD[i] = -v if d.bit() == 1 else v
        for i in range(4):
            if d.bit() == 1:
                v = d.lit(6); modeD[i] = -v if d.bit() == 1 else v
    nParts = 1 << d.lit(2)
    sizesAt = off + 10 + fps
    parts = []
    pcur = sizesAt + 3 * (nParts - 1)
    for pi in range(nParts):
        if pi == nParts - 1:
            pend = 20 + size
        else:
            s3 = data[sizesAt+3*pi] | (data[sizesAt+3*pi+1] << 8) | (data[sizesAt+3*pi+2] << 16)
            pend = pcur + s3
        parts.append(BD(data, pcur, pend))
        pcur = pend
    yac = d.lit(7)
    ydcD, y2dcD, y2acD, uvdcD, uvacD = (d.fsig(4) for _ in range(5))
    qY1dc=[0]*4; qY1ac=[0]*4; qY2dc=[0]*4; qY2ac=[0]*4; qUVdc=[0]*4; qUVac=[0]*4
    for s in range(4):
        qi = (clamp(segQuant[s],0,127) if segAbs else clamp(yac+segQuant[s],0,127)) if segEnabled else yac
        qY1dc[s]=DCQ[clamp(qi+ydcD,0,127)]; qY1ac[s]=ACQ[clamp(qi,0,127)]
        qY2dc[s]=DCQ[clamp(qi+y2dcD,0,127)]*2
        qY2ac[s]=max(ACQ[clamp(qi+y2acD,0,127)]*155//100, 8)
        qUVdc[s]=min(DCQ[clamp(qi+uvdcD,0,127)], 132)
        qUVac[s]=ACQ[clamp(qi+uvacD,0,127)]
    d.bit()  # refresh entropy
    cp = COEFP[:]
    for i in range(1056):
        if d.bool(UPD[i]) == 1: cp[i] = d.lit(8)
    noSkip = d.bit() == 1
    pskip = d.lit(8) if noSkip else 0
    print(f"hdr: {w}x{h} mb {mbW}x{mbH} seg={segEnabled} segAbs={segAbs} "
          f"segQ={segQuant} segLf={segLf} simple={simple} flevel={flevel} "
          f"sharp={sharp} lfd={lfd} refD={refD} modeD={modeD} nParts={nParts} "
          f"yac={yac} deltas={ydcD},{y2dcD},{y2acD},{uvdcD},{uvacD} "
          f"noSkip={noSkip} pskip={pskip} nUpd={sum(1 for i in range(1056) if cp[i]!=COEFP[i])}")

    nMb = mbW * mbH
    ym = [0]*nMb; uvm = [0]*nMb; seg = [0]*nMb; skip = [False]*nMb
    bm = [0]*(nMb*16)
    for my in range(mbH):
        for mx in range(mbW):
            mb = my*mbW + mx
            if segEnabled and updateSegMap:
                seg[mb] = d.tree(SEG_TREE, segTreeProbs)
            if noSkip: skip[mb] = d.bool(pskip) == 1
            m = d.tree(KF_YMODE_TREE, KF_YMODE_PROB)
            ym[mb] = m
            if m == 4:
                for i in range(16):
                    above = bm[mb*16+i-4] if i >= 4 else (bm[(mb-mbW)*16+i+12] if my > 0 else 0)
                    left = bm[mb*16+i-1] if (i & 3) else (bm[(mb-1)*16+i+3] if mx > 0 else 0)
                    bm[mb*16+i] = d.tree(BMODE_TREE, BMODEP, (above*10+left)*9)
            else:
                for i in range(16): bm[mb*16+i] = IMPLIED[m]
            uvm[mb] = d.tree(UV_TREE, KF_UV_PROB)
    if show_modes:
        for my in range(mbH):
            print("modes row", my, [(ym[my*mbW+mx], uvm[my*mbW+mx], seg[my*mbW+mx],
                                     int(skip[my*mbW+mx])) for mx in range(mbW)])

    yS = mbW*16; uvS = mbW*8
    Y = bytearray(yS*mbH*16); U = bytearray(uvS*mbH*8); V = bytearray(uvS*mbH*8)
    aNz = [0]*(mbW*9)
    coeffs = [0]*400
    hasC = [False]*25
    anyMb = [False]*nMb

    def decode_block(td, typ, ctx, first, qdc, qac, out):
        n = first; any_ = False
        while n < 16:
            p = ((typ*8 + BANDS[n])*3 + ctx)*11
            if td.bool(cp[p]) == 0: break
            while td.bool(cp[p+1]) == 0:
                n += 1
                if n == 16:
                    if any_: hasC[out >> 4] = True
                    return 16
                p = ((typ*8 + BANDS[n])*3 + 0)*11
            if td.bool(cp[p+2]) == 0:
                v = 1; ctx = 1
            else:
                ctx = 2
                if td.bool(cp[p+3]) == 0:
                    v = 2 if td.bool(cp[p+4]) == 0 else 3 + td.bool(cp[p+5])
                else:
                    if td.bool(cp[p+6]) == 0: cat = td.bool(cp[p+7])
                    elif td.bool(cp[p+8]) == 0: cat = 2 + td.bool(cp[p+9])
                    else: cat = 4 + td.bool(cp[p+10])
                    extra = 0
                    for pb in CATP[cat]: extra = (extra << 1) | td.bool(pb)
                    v = CATB[cat] + extra
            if td.bit() == 1: v = -v
            coeffs[out + ZIG[n]] = v * (qdc if n == 0 else qac)
            if v: any_ = True
            n += 1
        if any_: hasC[out >> 4] = True
        return n

    def idct_add(P, S, px_, py, co):
        tmp = [0]*16
        for i in range(4):
            i0,i4,i8,i12 = coeffs[co+i],coeffs[co+4+i],coeffs[co+8+i],coeffs[co+12+i]
            a1 = i0+i8; b1 = i0-i8
            c1 = ((i4*35468)>>16) - (i12 + ((i12*20091)>>16))
            d1 = (i4 + ((i4*20091)>>16)) + ((i12*35468)>>16)
            tmp[i]=a1+d1; tmp[12+i]=a1-d1; tmp[4+i]=b1+c1; tmp[8+i]=b1-c1
        for i in range(4):
            i0,i1,i2,i3 = tmp[4*i],tmp[4*i+1],tmp[4*i+2],tmp[4*i+3]
            a1=i0+i2; b1=i0-i2
            c1 = ((i1*35468)>>16) - (i3 + ((i3*20091)>>16))
            d1 = (i1 + ((i1*20091)>>16)) + ((i3*35468)>>16)
            base = (py+i)*S + px_
            P[base]   = c255(P[base]   + ((a1+d1+4)>>3))
            P[base+1] = c255(P[base+1] + ((b1+c1+4)>>3))
            P[base+2] = c255(P[base+2] + ((b1-c1+4)>>3))
            P[base+3] = c255(P[base+3] + ((a1-d1+4)>>3))

    def iwht(co, dc):
        for i in range(4):
            a1 = coeffs[co+i] + coeffs[co+12+i]; b1 = coeffs[co+4+i] + coeffs[co+8+i]
            c1 = coeffs[co+4+i] - coeffs[co+8+i]; d1 = coeffs[co+i] - coeffs[co+12+i]
            dc[i]=a1+b1; dc[4+i]=c1+d1; dc[8+i]=a1-b1; dc[12+i]=d1-c1
        for i in range(4):
            a1=dc[4*i]+dc[4*i+3]; b1=dc[4*i+1]+dc[4*i+2]
            c1=dc[4*i+1]-dc[4*i+2]; d1=dc[4*i]-dc[4*i+3]
            dc[4*i]=(a1+b1+3)>>3; dc[4*i+1]=(c1+d1+3)>>3
            dc[4*i+2]=(a1-b1+3)>>3; dc[4*i+3]=(d1-c1+3)>>3

    def px(P, S, w_, x, y):
        if y < 0: return 127
        if x < 0: return 129
        if x >= w_: return P[y*S + w_-1]
        return P[y*S + x]

    def a2(a,b): return (a+b+1)>>1
    def a3(a,b,c): return (a+2*b+c+2)>>2

    def pred_block(P, S, w_, mode, bx, by, size, mx, my):
        if mode == 0:
            ssum = 0; tot = 0
            if my > 0:
                for i in range(size): ssum += px(P,S,w_,bx+i,by-1)
                tot += size
            if mx > 0:
                for i in range(size): ssum += px(P,S,w_,bx-1,by+i)
                tot += size
            dc = 128 if tot == 0 else (ssum + (tot >> 1)) // tot
            for y0 in range(size):
                for x0 in range(size): P[(by+y0)*S+bx+x0] = dc
        elif mode == 1:
            for y0 in range(size):
                for x0 in range(size): P[(by+y0)*S+bx+x0] = px(P,S,w_,bx+x0,by-1)
        elif mode == 2:
            for y0 in range(size):
                l = px(P,S,w_,bx-1,by+y0)
                for x0 in range(size): P[(by+y0)*S+bx+x0] = l
        else:
            p = px(P,S,w_,bx-1,by-1)
            for y0 in range(size):
                l = px(P,S,w_,bx-1,by+y0)
                for x0 in range(size):
                    P[(by+y0)*S+bx+x0] = c255(l + px(P,S,w_,bx+x0,by-1) - p)

    def pred4(mode, bx, by, arX, arY):
        g = lambda x,y: px(Y, yS, yS, x, y)
        P=g(bx-1,by-1); A0=g(bx,by-1); A1=g(bx+1,by-1); A2=g(bx+2,by-1); A3=g(bx+3,by-1)
        A4=g(arX,arY); A5=g(arX+1,arY); A6=g(arX+2,arY); A7=g(arX+3,arY)
        L0=g(bx-1,by); L1=g(bx-1,by+1); L2=g(bx-1,by+2); L3=g(bx-1,by+3)
        o=[0]*16
        if mode == 0:
            dc=(A0+A1+A2+A3+L0+L1+L2+L3+4)>>3; o=[dc]*16
        elif mode == 1:
            for y0 in range(4):
                for x0 in range(4): o[y0*4+x0]=c255([L0,L1,L2,L3][y0]+[A0,A1,A2,A3][x0]-P)
        elif mode == 2:
            v=[a3(P,A0,A1),a3(A0,A1,A2),a3(A1,A2,A3),a3(A2,A3,A4)]
            for y0 in range(4): o[y0*4:y0*4+4]=v
        elif mode == 3:
            hh=[a3(P,L0,L1),a3(L0,L1,L2),a3(L1,L2,L3),a3(L2,L3,L3)]
            for y0 in range(4): o[y0*4:y0*4+4]=[hh[y0]]*4
        elif mode == 4:
            a=[A0,A1,A2,A3,A4,A5,A6,A7]
            for y0 in range(4):
                for x0 in range(4):
                    dd=x0+y0
                    o[y0*4+x0]=a3(a[6],a[7],a[7]) if dd==6 else a3(a[dd],a[dd+1],a[dd+2])
        elif mode == 5:
            e=[L3,L2,L1,L0,P,A0,A1,A2,A3]
            for y0 in range(4):
                for x0 in range(4):
                    dd=x0-y0; o[y0*4+x0]=a3(e[dd+3],e[dd+4],e[dd+5])
        elif mode == 6:
            o[0]=a2(P,A0);o[1]=a2(A0,A1);o[2]=a2(A1,A2);o[3]=a2(A2,A3)
            o[4]=a3(L0,P,A0);o[5]=a3(P,A0,A1);o[6]=a3(A0,A1,A2);o[7]=a3(A1,A2,A3)
            o[8]=a3(L1,L0,P);o[9]=o[0];o[10]=o[1];o[11]=o[2]
            o[12]=a3(L2,L1,L0);o[13]=o[4];o[14]=o[5];o[15]=o[6]
        elif mode == 7:
            o[0]=a2(A0,A1);o[1]=a2(A1,A2);o[2]=a2(A2,A3);o[3]=a2(A3,A4)
            o[4]=a3(A0,A1,A2);o[5]=a3(A1,A2,A3);o[6]=a3(A2,A3,A4);o[7]=a3(A3,A4,A5)
            o[8]=o[1];o[9]=o[2];o[10]=o[3];o[11]=a3(A4,A5,A6)
            o[12]=o[5];o[13]=o[6];o[14]=o[7];o[15]=a3(A5,A6,A7)
        elif mode == 8:
            o[0]=a2(L0,P);o[1]=a3(L0,P,A0);o[2]=a3(P,A0,A1);o[3]=a3(A0,A1,A2)
            o[4]=a2(L1,L0);o[5]=a3(L1,L0,P);o[6]=o[0];o[7]=o[1]
            o[8]=a2(L2,L1);o[9]=a3(L2,L1,L0);o[10]=o[4];o[11]=o[5]
            o[12]=a2(L3,L2);o[13]=a3(L3,L2,L1);o[14]=o[8];o[15]=o[9]
        else:
            o[0]=a2(L0,L1);o[1]=a3(L0,L1,L2);o[2]=a2(L1,L2);o[3]=a3(L1,L2,L3)
            o[4]=o[2];o[5]=o[3];o[6]=a2(L2,L3);o[7]=a3(L2,L3,L3)
            o[8]=o[6];o[9]=o[7];o[10]=L3;o[11]=L3
            o[12]=L3;o[13]=L3;o[14]=L3;o[15]=L3
        return o

    for my in range(mbH):
        lNz = [0]*9
        td = parts[my % nParts]
        for mx in range(mbW):
            mb = my*mbW + mx
            sg = seg[mb]; m = ym[mb]; hasY2 = m != 4
            for i in range(400): coeffs[i] = 0
            for i in range(25): hasC[i] = False
            if skip[mb]:
                for i in range(8): aNz[mx*9+i] = 0; lNz[i] = 0
                if hasY2: aNz[mx*9+8] = 0; lNz[8] = 0
            else:
                if hasY2:
                    ctx = aNz[mx*9+8] + lNz[8]
                    st = decode_block(td, 1, ctx, 0, qY2dc[sg], qY2ac[sg], 384)
                    f = 1 if st > 0 else 0
                    aNz[mx*9+8] = lNz[8] = f
                yT = 0 if hasY2 else 3
                yF = 1 if hasY2 else 0
                for r in range(4):
                    for c in range(4):
                        ctx = aNz[mx*9+c] + lNz[r]
                        st = decode_block(td, yT, ctx, yF, qY1dc[sg], qY1ac[sg], (r*4+c)*16)
                        f = 1 if st > yF else 0
                        aNz[mx*9+c] = f; lNz[r] = f
                for pl in range(2):
                    for i in range(4):
                        r2, c2 = i >> 1, i & 1
                        ctx = aNz[mx*9+4+pl*2+c2] + lNz[4+pl*2+r2]
                        st = decode_block(td, 2, ctx, 0, qUVdc[sg], qUVac[sg], (16+pl*4+i)*16)
                        f = 1 if st > 0 else 0
                        aNz[mx*9+4+pl*2+c2] = f; lNz[4+pl*2+r2] = f
            if hasY2:
                dc = [0]*16
                iwht(384, dc)
                anyDc = False
                for b in range(16):
                    coeffs[b*16] = dc[b]
                    if dc[b]: hasC[b] = True; anyDc = True
                if anyDc: hasC[24] = True
            anyMb[mb] = any(hasC)

            yx, yy = mx << 4, my << 4
            if m == 4:
                for i in range(16):
                    r, c = i >> 2, i & 3
                    bx, by = yx + (c << 2), yy + (r << 2)
                    arX, arY = (bx + 4, by - 1) if c < 3 else (yx + 16, yy - 1)
                    o = pred4(bm[mb*16+i], bx, by, arX, arY)
                    for y0 in range(4):
                        for x0 in range(4): Y[(by+y0)*yS+bx+x0] = o[y0*4+x0]
                    if hasC[i]: idct_add(Y, yS, bx, by, i*16)
            else:
                pred_block(Y, yS, yS, m, yx, yy, 16, mx, my)
                for i in range(16):
                    if hasC[i]: idct_add(Y, yS, yx+((i&3)<<2), yy+((i>>2)<<2), i*16)
            cx, cy = mx << 3, my << 3
            pred_block(U, uvS, uvS, uvm[mb], cx, cy, 8, mx, my)
            pred_block(V, uvS, uvS, uvm[mb], cx, cy, 8, mx, my)
            for i in range(4):
                if hasC[16+i]: idct_add(U, uvS, cx+((i&1)<<2), cy+((i>>1)<<2), (16+i)*16)
                if hasC[20+i]: idct_add(V, uvS, cx+((i&1)<<2), cy+((i>>1)<<2), (20+i)*16)

    # ---- loop filter ----
    if flevel > 0 and not nofilter:
        def u2s(v): return v - 128
        def s2u(v): return c255(v + 128)
        def c7(v): return -128 if v < -128 else 127 if v > 127 else v
        def common(P, outer, i1, i0, j0, j1):
            pp1,pp0,qq0,qq1 = u2s(P[i1]),u2s(P[i0]),u2s(P[j0]),u2s(P[j1])
            a = c7((c7(pp1-qq1) if outer else 0) + 3*(qq0-pp0))
            f = c7(a+4) >> 3
            a2_ = c7(a+3) >> 3
            P[j0] = s2u(qq0 - f); P[i0] = s2u(pp0 + a2_)
            return f
        def fyes(P, il, el, i3,i2,i1,i0,j0,j1,j2,j3):
            dd = lambda a,b: abs(P[a]-P[b])
            return (dd(i0,j0)*2 + dd(i1,j1)//2 <= el and dd(i3,i2)<=il and
                    dd(i2,i1)<=il and dd(i1,i0)<=il and dd(j1,j0)<=il and
                    dd(j2,j1)<=il and dd(j3,j2)<=il)
        def hev(P, t, i1,i0,j0,j1):
            return abs(P[i1]-P[i0]) > t or abs(P[j1]-P[j0]) > t
        def sub_f(P, ht, il, el, at, st):
            i3,i2,i1,i0 = at-4*st, at-3*st, at-2*st, at-st
            j0,j1,j2,j3 = at, at+st, at+2*st, at+3*st
            if fyes(P, il, el, i3,i2,i1,i0,j0,j1,j2,j3):
                hv = hev(P, ht, i1,i0,j0,j1)
                f = common(P, hv, i1,i0,j0,j1)
                if not hv:
                    a = (f+1)>>1
                    P[j1] = s2u(u2s(P[j1]) - a); P[i1] = s2u(u2s(P[i1]) + a)
        def mb_f(P, ht, il, el, at, st):
            i3,i2,i1,i0 = at-4*st, at-3*st, at-2*st, at-st
            j0,j1,j2,j3 = at, at+st, at+2*st, at+3*st
            if fyes(P, il, el, i3,i2,i1,i0,j0,j1,j2,j3):
                if not hev(P, ht, i1,i0,j0,j1):
                    pp2,pp1,pp0 = u2s(P[i2]),u2s(P[i1]),u2s(P[i0])
                    qq0,qq1,qq2 = u2s(P[j0]),u2s(P[j1]),u2s(P[j2])
                    ww = c7(c7(pp1-qq1) + 3*(qq0-pp0))
                    a = c7((27*ww+63)>>7); P[j0]=s2u(qq0-a); P[i0]=s2u(pp0+a)
                    a = c7((18*ww+63)>>7); P[j1]=s2u(qq1-a); P[i1]=s2u(pp1+a)
                    a = c7((9*ww+63)>>7);  P[j2]=s2u(qq2-a); P[i2]=s2u(pp2+a)
                else:
                    common(P, True, i1,i0,j0,j1)
        def simple_f(P, el, at, st):
            i1,i0,j0,j1 = at-2*st, at-st, at, at+st
            if abs(P[i0]-P[j0])*2 + abs(P[i1]-P[j1])//2 <= el:
                common(P, True, i1,i0,j0,j1)
        for my in range(mbH):
            for mx in range(mbW):
                mb = my*mbW + mx
                sg = seg[mb]
                lvl = (segLf[sg] if segAbs else flevel + segLf[sg]) if segEnabled else flevel
                lvl = clamp(lvl, 0, 63)
                if lfd:
                    lvl += refD[0]
                    if ym[mb] == 4: lvl += modeD[0]
                    lvl = clamp(lvl, 0, 63)
                if lvl == 0: continue
                il = lvl
                if sharp:
                    il >>= 2 if sharp > 4 else 1
                    if il > 9 - sharp: il = 9 - sharp
                if il < 1: il = 1
                ht = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
                mlim = (lvl+2)*2 + il; slim = lvl*2 + il
                inter = anyMb[mb] or ym[mb] == 4
                yx, yy = mx << 4, my << 4
                cx, cy = mx << 3, my << 3
                if simple:
                    if mx:
                        for r in range(16): simple_f(Y, mlim, (yy+r)*yS+yx, 1)
                    if inter:
                        for e in (4,8,12):
                            for r in range(16): simple_f(Y, slim, (yy+r)*yS+yx+e, 1)
                    if my:
                        for c in range(16): simple_f(Y, mlim, yy*yS+yx+c, yS)
                    if inter:
                        for e in (4,8,12):
                            for c in range(16): simple_f(Y, slim, (yy+e)*yS+yx+c, yS)
                else:
                    if mx:
                        for r in range(16): mb_f(Y, ht, il, mlim, (yy+r)*yS+yx, 1)
                        for r in range(8):
                            mb_f(U, ht, il, mlim, (cy+r)*uvS+cx, 1)
                            mb_f(V, ht, il, mlim, (cy+r)*uvS+cx, 1)
                    if inter:
                        for e in (4,8,12):
                            for r in range(16): sub_f(Y, ht, il, slim, (yy+r)*yS+yx+e, 1)
                        for r in range(8):
                            sub_f(U, ht, il, slim, (cy+r)*uvS+cx+4, 1)
                            sub_f(V, ht, il, slim, (cy+r)*uvS+cx+4, 1)
                    if my:
                        for c in range(16): mb_f(Y, ht, il, mlim, yy*yS+yx+c, yS)
                        for c in range(8):
                            mb_f(U, ht, il, mlim, cy*uvS+cx+c, uvS)
                            mb_f(V, ht, il, mlim, cy*uvS+cx+c, uvS)
                    if inter:
                        for e in (4,8,12):
                            for c in range(16): sub_f(Y, ht, il, slim, (yy+e)*yS+yx+c, yS)
                        for c in range(8):
                            sub_f(U, ht, il, slim, (cy+4)*uvS+cx+c, uvS)
                            sub_f(V, ht, il, slim, (cy+4)*uvS+cx+c, uvS)

    uvw, uvh = (w+1)>>1, (h+1)>>1
    yo = b"".join(bytes(Y[r*yS:r*yS+w]) for r in range(h))
    uo = b"".join(bytes(U[r*uvS:r*uvS+uvw]) for r in range(uvh))
    vo = b"".join(bytes(V[r*uvS:r*uvS+uvw]) for r in range(uvh))
    return w, h, yo, uo, vo


# ---- libwebp reference ------------------------------------------------------
LIBW = ctypes.CDLL("libwebp.so.7")
LIBW.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
LIBW.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]

def ref_yuv(data):
    w, h = ctypes.c_int(), ctypes.c_int()
    u, v = ctypes.POINTER(ctypes.c_ubyte)(), ctypes.POINTER(ctypes.c_ubyte)()
    st, ust = ctypes.c_int(), ctypes.c_int()
    yp = LIBW.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                            ctypes.byref(u), ctypes.byref(v),
                            ctypes.byref(st), ctypes.byref(ust))
    W,H,S,US = w.value,h.value,st.value,ust.value
    uvw,uvh = (W+1)>>1,(H+1)>>1
    return (b"".join(bytes(bytearray(yp[r*S:r*S+W])) for r in range(H)),
            b"".join(bytes(bytearray(u[r*US:r*US+uvw])) for r in range(uvh)),
            b"".join(bytes(bytearray(v[r*US:r*US+uvw])) for r in range(uvh)))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    nofilter = "--nofilter" in sys.argv
    modes = "--modes" in sys.argv
    for name in (args or ["tiny_q80"]):
        data = open(os.path.join(FIX, name + ".webp"), "rb").read()
        w, h, yo, uo, vo = decode(data, nofilter, modes)
        ry, ru, rv = ref_yuv(data)
        uvw = (w+1)>>1
        for pl, mine, ref, ww in (("y",yo,ry,w),("u",uo,ru,uvw),("v",vo,rv,uvw)):
            if mine == ref: print(f"  {pl}: OK"); continue
            bad = [i for i in range(len(ref)) if mine[i] != ref[i]]
            i = bad[0]; x, y0 = i % ww, i // ww
            print(f"  {pl}: {len(bad)} differ, first ({x},{y0}) "
                  f"MB({x//(16 if pl=='y' else 8)},{y0//(16 if pl=='y' else 8)}) "
                  f"mine={mine[i]} ref={ref[i]}")

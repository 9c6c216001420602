"""From-scratch Ogg Vorbis encoder (dev-time fixture generator).

Emits spec-valid Vorbis I streams exercising the decode features the
fixtures pin: in-stream codebooks (unordered/sparse/ordered, VQ lookup
1/2), floor 1 (classes, subclasses+masterbook, multiplier variants),
residue types 0/1/2 (single and cascaded passes), square-polar
coupling, multiplexed submaps, long/short block switching, packets
spanning pages, and granule end-trim.

Quality is NOT the point (a flat lattice VQ around a fitted floor gives
~20-35 dB SNR); VALIDITY is: every bit layout follows the spec sections
cited in decoder.py, and gen_fixtures.py asserts decoder.py's output
round-trips with positive SNR vs the source, plus exact re-parse of all
setup structures.
"""
import math

from common import (BitWriter, ilog, float32_pack, lookup1_values,
                    assign_codewords, check_complete, window_slope,
                    inverse_db_table, ogg_crc, dct4_twiddles, dct4_fast)
import struct


# ------------------------------------------------------------ helpers --
def complete_lengths(entries):
    """Canonical complete-tree lengths for `entries` symbols: the first
    (2^(k+1) - entries) entries get length k, the rest k+1, where
    k = floor(log2(entries)). Kraft == 1 by construction."""
    if entries == 1:
        return [1]
    k = entries.bit_length() - 1
    if entries == (1 << k):
        return [k] * entries
    n_short = (1 << (k + 1)) - entries
    return [k] * n_short + [k + 1] * (entries - n_short)


class Book:
    """Codebook spec + encode side. kind:
      'scalar'   -- no lookup (classbooks, floor books)
      'lattice'  -- lookup 1, identity multiplicands, integer lattice
                    [minv, minv + quantvals - 1] per dim
      'explicit' -- lookup 2 with given per-entry component values"""

    def __init__(self, dims, entries, kind, minv=0, quantvals=0,
                 values=None, lengths=None, ordered=False, sparse=False):
        self.dims = dims
        self.entries = entries
        self.kind = kind
        self.minv = minv
        self.quantvals = quantvals
        self.values = values
        self.ordered = ordered
        self.sparse = sparse
        self.lengths = lengths or complete_lengths(entries)
        assert len(self.lengths) == entries
        check_complete(self.lengths, allow_single=True)
        self.codes = assign_codewords(self.lengths)
        if ordered:
            # ordered packing requires non-decreasing lengths
            used = [l for l in self.lengths if l > 0]
            assert used == sorted(used), "ordered book needs sorted lengths"
            assert all(l > 0 for l in self.lengths)

    # -- setup-header emission (spec 3.2.1) --
    def write(self, bw):
        bw.write(0x564342, 24)
        bw.write(self.dims, 16)
        bw.write(self.entries, 24)
        if self.ordered:
            bw.write(1, 1)
            bw.write(self.lengths[0] - 1, 5)
            e = 0
            while e < self.entries:
                cur = self.lengths[e]
                num = 0
                while e + num < self.entries and self.lengths[e + num] == cur:
                    num += 1
                bw.write(num, ilog(self.entries - e))
                e += num
        else:
            bw.write(0, 1)
            bw.write(1 if self.sparse else 0, 1)
            for l in self.lengths:
                if self.sparse:
                    if l > 0:
                        bw.write(1, 1)
                        bw.write(l - 1, 5)
                    else:
                        bw.write(0, 1)
                else:
                    assert l > 0, "non-sparse book with unused entry"
                    bw.write(l - 1, 5)
        if self.kind == "scalar":
            bw.write(0, 4)
        elif self.kind == "lattice":
            bw.write(1, 4)
            bw.write(float32_pack(float(self.minv)), 32)
            bw.write(float32_pack(1.0), 32)
            vbits = max(ilog(self.quantvals - 1), 1)
            bw.write(vbits - 1, 4)
            bw.write(0, 1)  # sequence_p
            assert lookup1_values(self.entries, self.dims) == self.quantvals
            for q in range(self.quantvals):
                bw.write(q, vbits)
        else:  # explicit lookup 2
            bw.write(2, 4)
            bw.write(float32_pack(float(self.minv)), 32)
            bw.write(float32_pack(1.0), 32)
            mx = max(self.values)
            vbits = max(ilog(mx), 1)
            bw.write(vbits - 1, 4)
            bw.write(0, 1)
            assert len(self.values) == self.entries * self.dims
            for v in self.values:
                bw.write(v, vbits)

    # -- encode side --
    def put(self, bw, entry):
        code, ln = self.codes[entry]
        bw.write_huff(code, ln)

    def vq_vector(self, entry):
        out = []
        if self.kind == "lattice":
            idiv = 1
            for _ in range(self.dims):
                off = (entry // idiv) % self.quantvals
                out.append(float(off + self.minv))
                idiv *= self.quantvals
        else:
            for j in range(self.dims):
                out.append(float(self.values[entry * self.dims + j]
                                 + self.minv))
        return out

    def nearest(self, vec):
        """Nearest codeword: per-component round+clamp for the integer
        lattice (independent dims), exhaustive otherwise (dev-time)."""
        if self.kind == "lattice":
            q = [max(self.minv, min(self.minv + self.quantvals - 1,
                                    int(round(x)))) for x in vec]
            e = self.exact(q)
            if e is not None:
                return e
        best, bd = 0, float("inf")
        for e in range(self.entries):
            if self.lengths[e] == 0:
                continue
            v = self.vq_vector(e)
            d = sum((a - b) * (a - b) for a, b in zip(vec, v))
            if d < bd:
                best, bd = e, d
        return best

    def exact(self, vec):
        """Entry whose VQ vector equals vec exactly (lattice integer
        targets); None if out of range."""
        if self.kind != "lattice":
            return None
        entry = 0
        mul = 1
        for x in vec:
            q = int(x) - self.minv
            if q < 0 or q >= self.quantvals:
                return None
            entry += q * mul
            mul *= self.quantvals
        return entry if self.lengths[entry] > 0 else None


class Floor:
    """Floor type 1 config + encode (exact inverse of spec 7.2.3/7.2.4
    step 1)."""

    def __init__(self, partitions, class_list, class_dims, class_subs,
                 masterbooks, subclass_books, multiplier, rangebits,
                 xs_tail):
        self.partitions = partitions
        self.class_list = class_list
        self.class_dims = class_dims
        self.class_subs = class_subs
        self.masterbooks = masterbooks
        self.subclass_books = subclass_books
        self.multiplier = multiplier
        self.rangebits = rangebits
        self.xs = [0, 1 << rangebits] + list(xs_tail)
        assert len(set(self.xs)) == len(self.xs)
        self.range = [256, 128, 86, 64][multiplier - 1]

    def write(self, bw):
        bw.write(1, 16)  # floor type 1
        bw.write(self.partitions, 5)
        for c in self.class_list:
            bw.write(c, 4)
        maxclass = max(self.class_list) if self.class_list else -1
        for c in range(maxclass + 1):
            bw.write(self.class_dims[c] - 1, 3)
            bw.write(self.class_subs[c], 2)
            if self.class_subs[c]:
                bw.write(self.masterbooks[c], 8)
            for b in self.subclass_books[c]:
                bw.write(b + 1, 8)
        bw.write(self.multiplier - 1, 2)
        bw.write(self.rangebits, 4)
        i = 2
        for p in range(self.partitions):
            for _ in range(self.class_dims[self.class_list[p]]):
                bw.write(self.xs[i], self.rangebits)
                i += 1

    def _dbidx(self, mag):
        if mag < 1e-7:
            return 0
        dbi = 255.0 + math.log10(mag) / 0.02734375
        return max(0, min(self.range - 1,
                          int(round(dbi / self.multiplier))))

    def fit(self, spectrum, n2, dfl, dbtab, clamp):
        """Choose final_Y posts so the decoder's rendered curve covers
        the spectrum well enough that |spectrum/curve| <= ~clamp:
        start from the max magnitude over each post's Voronoi cell,
        then iteratively raise the posts bracketing any bin whose
        residue target still exceeds the lattice clamp (the rendered
        curve between posts interpolates in dB and can dip below a
        mid-segment peak; raising BOTH brackets bounds it)."""
        import decoder as D
        order = sorted(range(len(self.xs)), key=lambda i: self.xs[i])
        ys = [0] * len(self.xs)
        # park the floor well BELOW the envelope so residues use the
        # whole lattice: curve ~ cellmax / (0.7 * clamp) makes typical
        # peak targets ~0.7*clamp and quantization error ~1/clamp of
        # the local envelope
        for oi, pi in enumerate(order):
            x = self.xs[pi]
            left = self.xs[order[oi - 1]] if oi > 0 else 0
            right = self.xs[order[oi + 1]] if oi + 1 < len(order) else n2 * 2
            lo = max(0, min((left + x) // 2, n2))
            hi = max(0, min((x + right + 1) // 2 + 1, n2))
            mag = max((abs(spectrum[i]) for i in range(lo, hi)),
                      default=0.0)
            ys[pi] = self._dbidx(mag / (0.7 * clamp))
        margin = clamp * 0.875
        for _ in range(10):
            vals = _floor_vals(self, ys)
            curve = dfl.curve(vals, n2, dbtab)
            worst = 0.0
            for k in range(n2):
                t = abs(spectrum[k]) / curve[k]
                if t > margin:
                    worst = max(worst, t)
                    need = self._dbidx(abs(spectrum[k]) / margin)
                    # raise both bracketing posts
                    for oi, pi in enumerate(order):
                        nxt = order[oi + 1] if oi + 1 < len(order) else None
                        if self.xs[pi] <= k and \
                                (nxt is None or self.xs[nxt] > k):
                            ys[pi] = max(ys[pi], need)
                            if nxt is not None:
                                ys[nxt] = max(ys[nxt], need)
                            break
            if worst == 0.0:
                break
        return ys

    def encode(self, bw, final_ys, books):
        """Write the post values that make the decoder's step-1 produce
        exactly final_ys (inverse of spec 7.2.4 step 1)."""
        import decoder as D
        bw.write(1, 1)  # nonzero
        rbits = ilog(self.range - 1)
        bw.write(final_ys[0], rbits)
        bw.write(final_ys[1], rbits)
        vals = [final_ys[0], final_ys[1]]
        for j in range(2, len(self.xs)):
            lo = D._low_neighbor(self.xs, j)
            hi = D._high_neighbor(self.xs, j)
            pred = D._render_point(self.xs[lo], final_ys[lo],
                                   self.xs[hi], final_ys[hi], self.xs[j])
            want = final_ys[j]
            delta = want - pred
            highroom = self.range - pred
            lowroom = pred
            room = 2 * min(highroom, lowroom)
            if delta == 0:
                val = 0
            else:
                v_small = 2 * delta if delta > 0 else -2 * delta - 1
                if v_small < room and v_small != 0:
                    val = v_small
                elif highroom > lowroom:
                    assert delta > 0, (delta, highroom, lowroom)
                    val = delta + lowroom
                else:
                    assert delta < 0 or highroom <= lowroom
                    val = -delta - 1 + highroom
            assert 0 <= val < self.range, (val, want, pred)
            vals.append(val)
        # write per-partition, choosing subclass books by cval
        i = 2
        for p in range(self.partitions):
            cls = self.class_list[p]
            cdim = self.class_dims[cls]
            cbits = self.class_subs[cls]
            if cbits:
                # choose per-post subclass book: index 0 unless val
                # exceeds that book's entries; pack choices into cval
                choices = []
                for j in range(cdim):
                    v = vals[i + j]
                    pick = -1
                    for bi, b in enumerate(self.subclass_books[cls]):
                        if b >= 0 and v < books[b].entries:
                            pick = bi
                            break
                        if b < 0 and v == 0:
                            pick = bi
                            break
                    assert pick >= 0, "no subclass book can code %d" % v
                    choices.append(pick)
                cval = 0
                for j in range(cdim - 1, -1, -1):
                    cval = (cval << cbits) | choices[j]
                books[self.masterbooks[cls]].put(bw, cval)
                for j in range(cdim):
                    b = self.subclass_books[cls][choices[j]]
                    if b >= 0:
                        books[b].put(bw, vals[i + j])
                    else:
                        assert vals[i + j] == 0
            else:
                for j in range(cdim):
                    b = self.subclass_books[cls][0]
                    assert b >= 0
                    books[b].put(bw, vals[i + j])
            i += cdim

    def silent(self, bw):
        bw.write(0, 1)


class Residue:
    def __init__(self, rtype, begin, end, psize, nclasses, classbook,
                 cascade, books_mtx):
        self.rtype = rtype
        self.begin = begin
        self.end = end
        self.psize = psize
        self.nclasses = nclasses
        self.classbook = classbook
        self.cascade = cascade
        self.books_mtx = books_mtx  # nclasses x 8 of book index or -1

    def write(self, bw):
        bw.write(self.rtype, 16)
        bw.write(self.begin, 24)
        bw.write(self.end, 24)
        bw.write(self.psize - 1, 24)
        bw.write(self.nclasses - 1, 6)
        bw.write(self.classbook, 8)
        for c in range(self.nclasses):
            casc = self.cascade[c]
            bw.write(casc & 7, 3)
            if casc >> 3:
                bw.write(1, 1)
                bw.write(casc >> 3, 5)
            else:
                bw.write(0, 1)
        for c in range(self.nclasses):
            for p in range(8):
                if self.cascade[c] & (1 << p):
                    assert self.books_mtx[c][p] >= 0
                    bw.write(self.books_mtx[c][p], 8)

    def encode(self, bw, books, do_not_decode, vectors_in, n):
        """Quantize + write; RETURNS the decoder-reconstructed vectors
        (so the caller computes achieved coupling/spectra exactly).
        vectors_in: per-channel float targets, length n each."""
        ch = len(do_not_decode)
        if self.rtype == 2:
            if all(do_not_decode):
                return [[0.0] * n for _ in range(ch)]
            big = [0.0] * (n * ch)
            for i in range(n):
                for j in range(ch):
                    big[i * ch + j] = vectors_in[j][i]
            rec = self._encode_core(bw, books, [False], [big], n * ch)
            out = [[0.0] * n for _ in range(ch)]
            for i in range(n):
                for j in range(ch):
                    out[j][i] = rec[0][i * ch + j]
            return out
        return self._encode_core(bw, books, do_not_decode, vectors_in, n)

    def _encode_core(self, bw, books, do_not_decode, targets, n):
        ch = len(do_not_decode)
        limit_begin = min(self.begin, n)
        limit_end = min(self.end, n)
        to_read = limit_end - limit_begin
        rec = [[0.0] * n for _ in range(ch)]
        if to_read <= 0:
            return rec
        cb = books[self.classbook]
        classwords = cb.dims
        parts = to_read // self.psize
        assert parts * self.psize == to_read
        fmt0 = self.rtype == 0
        # plan: per channel, per partition -> (class, per-pass symbols)
        plan = []
        cls = []
        for j in range(ch):
            pc = []
            pl = []
            for pt in range(parts):
                off = limit_begin + pt * self.psize
                tgt = targets[j][off:off + self.psize]
                if do_not_decode[j] or all(abs(t) < 0.5 for t in tgt):
                    pc.append(0)
                    pl.append(None)
                    continue
                c = self._pick_class(tgt)
                pc.append(c)
                pl.append(self._quantize(books, c, tgt, rec[j], off, fmt0))
            # pad classifications to classword multiple
            pc.extend([0] * classwords)
            cls.append(pc)
            plan.append(pl)
        # emission mirrors the decoder's pass/classword loop exactly
        maxpass = max(1, max(ilog(c) for c in self.cascade))
        for p in range(maxpass):
            pcount = 0
            while pcount < parts:
                if p == 0:
                    for j in range(ch):
                        if do_not_decode[j]:
                            continue
                        temp = 0
                        for i in range(classwords):
                            temp = temp * self.nclasses + cls[j][pcount + i]
                        cb.put(bw, temp)
                i = 0
                while i < classwords and pcount < parts:
                    for j in range(ch):
                        if do_not_decode[j]:
                            continue
                        c = cls[j][pcount]
                        bk = self.books_mtx[c][p]
                        if bk < 0:
                            continue
                        for entry in plan[j][pcount][p]:
                            books[bk].put(bw, entry)
                    i += 1
                    pcount += 1
        return rec

    def _pick_class(self, tgt):
        """Smallest class whose pass-0 book range covers max|tgt| (the
        wheel's class layouts order books coarse->fine); falls back to
        the last class."""
        return self.nclasses - 1

    def _quantize(self, books, c, tgt, rec_vec, off, fmt0):
        """Greedy per-pass VQ: each pass quantizes the remaining error;
        returns per-pass entry lists and accumulates the reconstruction
        into rec_vec[off:]."""
        psize = self.psize
        residual = list(tgt)
        per_pass = {}
        for p in range(8):
            bk = self.books_mtx[c][p]
            if bk < 0:
                continue
            book = books[bk]
            dim = book.dims
            entries = []
            if fmt0:
                step = psize // dim
                for i in range(step):
                    vec = [residual[i + j * step] for j in range(dim)]
                    e = book.exact(vec)
                    if e is None:
                        e = book.nearest(vec)
                    entries.append(e)
                    v = book.vq_vector(e)
                    for j in range(dim):
                        residual[i + j * step] -= v[j]
                        rec_vec[off + i + j * step] += v[j]
            else:
                i = 0
                while i < psize:
                    vec = residual[i:i + dim]
                    e = book.exact(vec)
                    if e is None:
                        e = book.nearest(vec)
                    entries.append(e)
                    v = book.vq_vector(e)
                    for j in range(dim):
                        residual[i + j] -= v[j]
                        rec_vec[off + i + j] += v[j]
                    i += dim
            per_pass[p] = entries
        return per_pass


def forward_couple(x, y):
    """Integer square-polar coupling: returns (M, A) such that the
    decoder's inverse coupling (spec 4.3.5) reproduces (x, y) exactly.
    Derived by inverting each decode branch."""
    if y >= x:
        if y > 0:
            return y, x - y
        return x, y - x
    if x > 0:
        return x, x - y
    return y, y - x


# ------------------------------------------------------------- mapping --
class Mapping:
    def __init__(self, channels, coupling=(), mux=None,
                 floor_of=(0,), residue_of=(0,)):
        self.channels = channels
        self.coupling = list(coupling)
        self.submaps = len(floor_of)
        self.mux = mux or [0] * channels
        self.floor_of = list(floor_of)
        self.residue_of = list(residue_of)

    def write(self, bw, channels):
        bw.write(0, 16)
        if self.submaps > 1:
            bw.write(1, 1)
            bw.write(self.submaps - 1, 4)
        else:
            bw.write(0, 1)
        if self.coupling:
            bw.write(1, 1)
            bw.write(len(self.coupling) - 1, 8)
            bits = ilog(channels - 1)
            for m, a in self.coupling:
                bw.write(m, bits)
                bw.write(a, bits)
        else:
            bw.write(0, 1)
        bw.write(0, 2)
        if self.submaps > 1:
            for m in self.mux:
                bw.write(m, 4)
        for s in range(self.submaps):
            bw.write(0, 8)
            bw.write(self.floor_of[s], 8)
            bw.write(self.residue_of[s], 8)


# ----------------------------------------------------------- ogg write --
def ogg_page(serial, seq, granule, flags, chunks, last_complete):
    """chunks: list of packet byte-chunks for this page; last_complete:
    False if the final chunk continues on the next page (all its lacing
    values are 255)."""
    lacing = bytearray()
    for ci, c in enumerate(chunks):
        full, rem = divmod(len(c), 255)
        lacing.extend(b"\xff" * full)
        if ci == len(chunks) - 1 and not last_complete:
            assert rem == 0, "continued chunk must be a multiple of 255"
        else:
            lacing.append(rem)
    assert len(lacing) <= 255, "too many lacing values for one page"
    body = b"".join(chunks)
    hdr = bytearray()
    hdr += b"OggS\x00"
    hdr.append(flags)
    hdr += struct.pack("<q", granule)
    hdr += struct.pack("<I", serial)
    hdr += struct.pack("<I", seq)
    hdr += b"\x00\x00\x00\x00"
    hdr.append(len(lacing))
    hdr += lacing
    page = bytes(hdr) + body
    crc = ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def paginate(header_packets, audio_packets, granules, serial=0x6772616F):
    """Spec-conformant pagination (RFC 3533 + Vorbis framing rules):
    page 0 = ident alone (BOS); comment + setup start on page 1 and
    span pages with the continuation flag when needed; each audio
    packet ends a page carrying the cumulative granule (spanning pages
    first if >= 255*255 bytes); final page flagged EOS."""
    pages = []
    seq = [0]

    def emit(chunks, granule, flags, last_complete):
        pages.append(ogg_page(serial, seq[0], granule, flags, chunks,
                              last_complete))
        seq[0] += 1

    ident, comment, setup = header_packets
    emit([ident], 0, 0x02, True)
    chunks = []
    segs = 0
    cont = False
    for pkt in (comment, setup):
        off = 0
        while True:
            avail = 255 - segs
            rem = len(pkt) - off
            need = rem // 255 + 1  # lacing values to COMPLETE the packet
            if 0 < need <= avail:
                chunks.append(pkt[off:])
                segs += need
                break
            if avail > 0:
                take = avail * 255
                chunks.append(pkt[off:off + take])
                segs += avail
                off += take
            emit(chunks, -1, 0x01 if cont else 0x00, last_complete=False)
            chunks = []
            segs = 0
            cont = True
    if chunks:
        emit(chunks, -1, 0x01 if cont else 0x00, True)
    for i, pkt in enumerate(audio_packets):
        off = 0
        pcont = False
        while len(pkt) - off >= 255 * 255:
            emit([pkt[off:off + 255 * 255]], -1,
                 0x01 if pcont else 0x00, False)
            off += 255 * 255
            pcont = True
        flags = (0x01 if pcont else 0x00) | \
            (0x04 if i == len(audio_packets) - 1 else 0x00)
        emit([pkt[off:]], granules[i], flags, True)
    return b"".join(pages)


# -------------------------------------------------------- stream level --
def geometry(blockflag, prev_flag, next_flag, n, n0):
    """Window geometry (spec 4.3.1): returns (ls, le, lsz, rs, re, rsz)."""
    n2 = n // 2
    if blockflag and not prev_flag:
        ls, le, lsz = n // 4 - n0 // 4, n // 4 + n0 // 4, n0 // 2
    else:
        ls, le, lsz = 0, n2, n2
    if blockflag and not next_flag:
        rs, re, rsz = 3 * n // 4 - n0 // 4, 3 * n // 4 + n0 // 4, n0 // 2
    else:
        rs, re, rsz = n2, n, n2
    return ls, le, lsz, rs, re, rsz


def mdct_fast_fwd(y, n, tw):
    """Forward MDCT X[k] = sum_i y[i] cos(2pi/n (i+0.5+n/4)(k+0.5)) via
    the same DCT-IV used by the decoder: fold y (length n) into z
    (length m = n/2) by the IMDCT symmetries transposed, then
    X = DCT4(z). Asserted against the O(n^2) definition in __main__."""
    m = n // 2
    half = m // 2
    z = [0.0] * m
    for i in range(half):
        z[i + half] += y[i]
    for i in range(half, 3 * half):
        z[3 * half - 1 - i] -= y[i]
    for i in range(3 * half, 2 * m):
        z[i - 3 * half] -= y[i]
    pre, post, fft = tw
    return dct4_fast(z, pre, post, fft)


class StreamCfg:
    def __init__(self, n0, n1, books, floors, residues, mappings, modes,
                 res_clamp=4):
        self.n0 = n0
        self.n1 = n1
        self.books = books
        self.floors = floors
        self.residues = residues
        self.mappings = mappings
        self.modes = modes  # list of (blockflag, mapping_idx)
        self.res_clamp = res_clamp

    def decoder_floor(self, fi):
        """Decoder-side Floor1 twin for exact achieved-curve computation
        during encode."""
        import decoder as D
        f = self.floors[fi]
        df = D.Floor1.__new__(D.Floor1)
        df.partitions = f.partitions
        df.class_list = f.class_list
        df.class_dims = f.class_dims
        df.class_subs = f.class_subs
        df.masterbooks = f.masterbooks
        df.subclass_books = f.subclass_books
        df.multiplier = f.multiplier
        df.xs = f.xs
        df.sortidx = sorted(range(len(f.xs)), key=lambda i: f.xs[i])
        df.range = f.range
        return df


def header_packets(cfg, channels, rate, vendor, comments,
                   bitrate_nominal=0):
    # ident (spec 4.2.2)
    bw = BitWriter()
    bw.write(1, 8)
    for b in b"vorbis":
        bw.write(b, 8)
    bw.write(0, 32)
    bw.write(channels, 8)
    bw.write(rate, 32)
    bw.write(0, 32)
    bw.write(bitrate_nominal, 32)
    bw.write(0, 32)
    bw.write(cfg.n0.bit_length() - 1, 4)
    bw.write(cfg.n1.bit_length() - 1, 4)
    bw.write(1, 1)
    ident = bw.getbytes()
    # comment (spec 5)
    bw = BitWriter()
    bw.write(3, 8)
    for b in b"vorbis":
        bw.write(b, 8)
    vb = vendor.encode("utf-8")
    bw.write(len(vb), 32)
    for b in vb:
        bw.write(b, 8)
    bw.write(len(comments), 32)
    for c in comments:
        cb = c.encode("utf-8")
        bw.write(len(cb), 32)
        for b in cb:
            bw.write(b, 8)
    bw.write(1, 1)
    comment = bw.getbytes()
    # setup (spec 4.2.4)
    bw = BitWriter()
    bw.write(5, 8)
    for b in b"vorbis":
        bw.write(b, 8)
    bw.write(len(cfg.books) - 1, 8)
    for bk in cfg.books:
        bk.write(bw)
    bw.write(0, 6)   # 1 time transform
    bw.write(0, 16)
    bw.write(len(cfg.floors) - 1, 6)
    for f in cfg.floors:
        f.write(bw)
    bw.write(len(cfg.residues) - 1, 6)
    for r in cfg.residues:
        r.write(bw)
    bw.write(len(cfg.mappings) - 1, 6)
    for m in cfg.mappings:
        m.write(bw, channels)
    bw.write(len(cfg.modes) - 1, 6)
    for blockflag, mapping in cfg.modes:
        bw.write(blockflag, 1)
        bw.write(0, 16)
        bw.write(0, 16)
        bw.write(mapping, 8)
    bw.write(1, 1)
    setup = bw.getbytes()
    return ident, comment, setup


def encode_stream(cfg, signals, rate, mode_seq, vendor="graft vorbisref",
                  comments=(), trim=None, serial=0x67726166):
    """signals: per-channel float lists in [-1, 1]. mode_seq: mode index
    per frame. Returns full .ogg bytes. trim: optional final granule
    (< natural emitted count) exercising end-trim."""
    channels = len(signals)
    slopes = {n: window_slope(n) for n in {cfg.n0, cfg.n1}}
    tws = {n: dct4_twiddles(n // 2) for n in {cfg.n0, cfg.n1}}
    dbtab = inverse_db_table()
    packets = []
    granules = []
    emitted = 0
    p_pos = 0
    prev_rs = None
    L = cfg.res_clamp
    nframes = len(mode_seq)
    for b, mode_i in enumerate(mode_seq):
        blockflag, map_i = cfg.modes[mode_i]
        n = cfg.n1 if blockflag else cfg.n0
        n2 = n // 2
        prev_long = cfg.modes[mode_seq[b - 1]][0] if b > 0 else 1
        next_long = cfg.modes[mode_seq[b + 1]][0] if b + 1 < nframes else 1
        prev_flag, next_flag = prev_long, next_long
        ls, le, lsz, rs, re, rsz = geometry(
            blockflag, prev_flag, next_flag, n, cfg.n0)
        if prev_rs is not None:
            p_pos += prev_rs - ls
        prev_rs = rs
        lslope = slopes[cfg.n0 if lsz == cfg.n0 // 2 else n]
        rslope = slopes[cfg.n0 if rsz == cfg.n0 // 2 else n]
        mp = cfg.mappings[map_i]
        # analysis: window + forward MDCT, scaled 4/n so the decode-side
        # unnormalized IMDCT overlap-add reconstructs unit gain
        spectra = []
        used = []
        for c in range(channels):
            sig = signals[c]
            y = [0.0] * n
            for i in range(max(0, ls), min(n, re)):
                t = p_pos + i
                y[i] = sig[t] if 0 <= t < len(sig) else 0.0
            nonzero = any(abs(v) > 1e-9 for v in y)
            for i in range(lsz):
                y[ls + i] *= lslope[i]
            for i in range(rsz):
                y[rs + i] *= rslope[rsz - 1 - i]
            X = mdct_fast_fwd(y, n, tws[n])
            X = [x * 4.0 / n for x in X]
            spectra.append(X)
            used.append(nonzero)
        # floor fit + encode plan
        bw = BitWriter()
        bw.write(0, 1)
        bw.write(mode_i, ilog(len(cfg.modes) - 1))
        if blockflag:
            bw.write(prev_flag, 1)
            bw.write(next_flag, 1)
        curves = [None] * channels
        for c in range(channels):
            fi = mp.floor_of[mp.mux[c]]
            fl = cfg.floors[fi]
            if not used[c]:
                fl.silent(bw)
                continue
            ys = fl.fit(spectra[c], n2, cfg.decoder_floor(fi), dbtab, L)
            # encode() needs the decoded val list to compute the curve:
            # write to a scratch writer first to obtain vals via the
            # decoder twin, then to the real stream
            vals = _floor_vals(fl, ys)
            fl.encode(bw, ys, cfg.books)
            curves[c] = cfg.decoder_floor(fi).curve(vals, n2, dbtab)
        no_residue = [not u for u in used]
        for m, a in mp.coupling:
            if not (no_residue[m] and no_residue[a]):
                no_residue[m] = no_residue[a] = False
        # residue targets
        enc_vec = []
        for c in range(channels):
            if curves[c] is None:
                enc_vec.append([0.0] * n2)
            else:
                cv = curves[c]
                enc_vec.append([spectra[c][i] / cv[i] for i in range(n2)])
        for m, a in mp.coupling:
            qm = [max(-L, min(L, int(round(v)))) for v in enc_vec[m]]
            qa = [max(-L, min(L, int(round(v)))) for v in enc_vec[a]]
            for i in range(n2):
                M, A = forward_couple(qm[i], qa[i])
                enc_vec[m][i] = float(M)
                enc_vec[a][i] = float(A)
        for s in range(mp.submaps):
            chans = [c for c in range(channels) if mp.mux[c] == s]
            dnd = [no_residue[c] for c in chans]
            res = cfg.residues[mp.residue_of[s]]
            res.encode(bw, cfg.books, dnd, [enc_vec[c] for c in chans], n2)
        packets.append(bw.getbytes())
        if b > 0:
            emitted += rs - ls
        granules.append(emitted)
    if trim is not None:
        assert trim <= emitted
        granules[-1] = trim
    hdr = header_packets(cfg, channels, rate, vendor, list(comments))
    return paginate(hdr, packets, granules, serial)


def _floor_vals(fl, final_ys):
    """The transmitted val list for final_ys (same inversion as
    Floor.encode, shared so the curve twin sees what decode will)."""
    import decoder as D
    vals = [final_ys[0], final_ys[1]]
    for j in range(2, len(fl.xs)):
        lo = D._low_neighbor(fl.xs, j)
        hi = D._high_neighbor(fl.xs, j)
        pred = D._render_point(fl.xs[lo], final_ys[lo],
                               fl.xs[hi], final_ys[hi], fl.xs[j])
        delta = final_ys[j] - pred
        highroom = fl.range - pred
        lowroom = pred
        room = 2 * min(highroom, lowroom)
        if delta == 0:
            val = 0
        else:
            v_small = 2 * delta if delta > 0 else -2 * delta - 1
            if v_small < room and v_small != 0:
                val = v_small
            elif highroom > lowroom:
                val = delta + lowroom
            else:
                val = -delta - 1 + highroom
        vals.append(val)
    return vals


if __name__ == "__main__":
    import random
    from common import mdct_forward
    rnd = random.Random(11)
    for n in (64, 256):
        y = [rnd.uniform(-1, 1) for _ in range(n)]
        tw = dct4_twiddles(n // 2)
        a = mdct_forward(y, n)
        b = mdct_fast_fwd(y, n, tw)
        err = max(abs(p - q) for p, q in zip(a, b))
        assert err < 1e-9 * max(max(abs(v) for v in a), 1.0), (n, err)
    # complete_lengths kraft
    for e in (1, 2, 3, 5, 16, 81, 289, 625):
        check_complete(complete_lengths(e), allow_single=True)
    # forward_couple inverts the decoder branches for all small ints
    def inv(M, A):
        if M > 0:
            return (M, M - A) if A > 0 else (M + A, M)
        return (M, M + A) if A > 0 else (M - A, M)
    for x in range(-9, 10):
        for y2 in range(-9, 10):
            M, A = forward_couple(x, y2)
            assert inv(M, A) == (x, y2), (x, y2, M, A)
    print("encoder.py self-tests OK")

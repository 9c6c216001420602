"""From-scratch Ogg Vorbis reference decoder (dev-time).

Implements Vorbis I (Xiph.Org spec, sections cited inline) + RFC 3533
Ogg framing, floor type 1, residue types 0/1/2, square-polar channel
coupling, in-stream codebooks (scalar + VQ lookup types 1/2), block
switching with window-flag lapping, and granule end-trim.

graft.multimodal.VorbisCodec mirrors THIS FILE op for op; float tables
(window slopes, DCT-IV/FFT twiddles, inverse-dB) come from the shared
vorbistables.bin, so PCM digests pin the two bit-exactly. Floor type 0
(LSP, produced by no known encoder since ~2002) is a named error in
both.
"""
import math
import struct

from common import (BitReader, ilog, float32_unpack, lookup1_values,
                    assign_codewords, window_slope, inverse_db_table,
                    ogg_crc, dct4_twiddles, imdct_fast, BLOCKSIZES)


class VorbisError(ValueError):
    pass


def _need(cond, msg):
    if not cond:
        raise VorbisError(msg)


# ----------------------------------------------------------------- ogg --
def ogg_packets(data):
    """RFC 3533 page walk -> (packets, page_granules): packets is the
    list of reassembled logical packets of the FIRST logical stream;
    page_granules[i] = (packet_index_of_last_completed, granule) per
    page that completes >=1 packet. CRC, continuation flags and
    BOS/EOS placement are validated with named errors."""
    packets = []
    granules = []
    pos = 0
    serial = None
    pending = bytearray()
    pending_open = False
    expect_page = 0
    saw_eos = False
    while pos < len(data):
        _need(pos + 27 <= len(data), "ogg: truncated page header")
        _need(data[pos:pos + 4] == b"OggS", "ogg: capture pattern missing")
        _need(data[pos + 4] == 0, "ogg: stream structure version != 0")
        htype = data[pos + 5]
        granule = struct.unpack("<q", data[pos + 6:pos + 14])[0]
        ser = struct.unpack("<I", data[pos + 14:pos + 18])[0]
        seq = struct.unpack("<I", data[pos + 18:pos + 22])[0]
        crc = struct.unpack("<I", data[pos + 22:pos + 26])[0]
        nsegs = data[pos + 26]
        _need(pos + 27 + nsegs <= len(data), "ogg: segment table truncated")
        segs = data[pos + 27:pos + 27 + nsegs]
        body_len = sum(segs)
        body_at = pos + 27 + nsegs
        _need(body_at + body_len <= len(data), "ogg: page body truncated")
        page = bytearray(data[pos:body_at + body_len])
        page[22:26] = b"\x00\x00\x00\x00"
        _need(ogg_crc(bytes(page)) == crc, "ogg: page CRC mismatch")
        if serial is None:
            _need(htype & 0x02, "ogg: first page lacks BOS flag")
            serial = ser
        if ser == serial:
            _need(not saw_eos, "ogg: page after EOS")
            _need(seq == expect_page, "ogg: page sequence gap")
            expect_page += 1
            cont = bool(htype & 0x01)
            _need(cont == pending_open,
                  "ogg: continuation flag inconsistent with packet state")
            off = body_at
            completed_here = False
            for i, s in enumerate(segs):
                pending.extend(data[off:off + s])
                off += s
                if s < 255:  # lacing value < 255 terminates a packet
                    packets.append(bytes(pending))
                    pending = bytearray()
                    completed_here = True
            pending_open = len(pending) > 0 or (nsegs > 0 and segs[-1] == 255)
            if nsegs > 0 and segs[-1] == 255:
                pending_open = True
            elif nsegs > 0:
                pending_open = False
            if htype & 0x04:
                saw_eos = True
            if completed_here and granule != -1:
                granules.append((len(packets) - 1, granule))
        pos = body_at + body_len
    _need(not pending_open, "ogg: stream ends inside a packet")
    _need(saw_eos, "ogg: no EOS page")
    return packets, granules


# ------------------------------------------------------------ codebook --
class Codebook:
    def __init__(self, br):
        _need(br.read(24) == 0x564342, "codebook sync pattern missing")
        self.dims = br.read(16)
        self.entries = br.read(24)
        _need(self.dims > 0, "codebook with zero dimensions")
        lengths = [0] * self.entries
        if br.read_bit() == 0:  # unordered
            sparse = br.read_bit()
            for e in range(self.entries):
                if sparse:
                    if br.read_bit():
                        lengths[e] = br.read(5) + 1
                else:
                    lengths[e] = br.read(5) + 1
        else:  # ordered
            cur_len = br.read(5) + 1
            e = 0
            while e < self.entries:
                num = br.read(ilog(self.entries - e))
                _need(e + num <= self.entries, "ordered codebook overflow")
                for i in range(num):
                    lengths[e + i] = cur_len
                e += num
                cur_len += 1
                _need(cur_len <= 32, "ordered codebook length > 32")
        self.lengths = lengths
        used = sum(1 for l in lengths if l > 0)
        _need(used > 0, "codebook with no used entries")
        # Kraft: tree must not be over-subscribed (spec 3.2.1); a
        # SINGLE-entry book is the spec's one sanctioned undersubscribed
        # tree (decoded by reading its length in bits, value ignored)
        kraft = sum(2.0 ** -l for l in lengths if l > 0)
        if used == 1:
            self.single = next(e for e, l in enumerate(lengths) if l > 0)
        else:
            self.single = None
            _need(kraft <= 1.0 + 1e-12, "codebook over-subscribed")
        self.codes = assign_codewords(lengths)
        # decode map: (len, code) -> entry
        self.dec = {(l, c): e for e, (c, l) in self.codes.items()}
        self.maxlen = max(l for l in lengths if l > 0)
        # ---- VQ lookup ----
        self.lookup = br.read(4)
        _need(self.lookup in (0, 1, 2), "reserved codebook lookup type")
        if self.lookup:
            self.minv = float32_unpack(br.read(32))
            self.delta = float32_unpack(br.read(32))
            vbits = br.read(4) + 1
            self.seq_p = br.read_bit()
            if self.lookup == 1:
                quantvals = lookup1_values(self.entries, self.dims)
            else:
                quantvals = self.entries * self.dims
            self.mult = [br.read(vbits) for _ in range(quantvals)]
            self.quantvals = quantvals

    def decode_scalar(self, br):
        """One huffman codeword -> entry number (read MSb first,
        spec 3.2.1)."""
        if self.single is not None:
            # single-entry tree: the codeword is `length` zero bits
            for _ in range(self.lengths[self.single]):
                br.read_bit()
            return self.single
        code = 0
        ln = 0
        while ln <= self.maxlen:
            code = (code << 1) | br.read_bit()
            ln += 1
            e = self.dec.get((ln, code))
            if e is not None:
                return e
        raise VorbisError("huffman codeword not in codebook")

    def vq(self, entry):
        """spec 3.3: entry -> dims-length vector."""
        _need(self.lookup != 0, "VQ decode from a scalar-only codebook")
        out = [0.0] * self.dims
        last = 0.0
        if self.lookup == 1:
            idiv = 1
            for j in range(self.dims):
                off = (entry // idiv) % self.quantvals
                v = self.mult[off] * self.delta + self.minv + last
                if self.seq_p:
                    last = v
                out[j] = v
                idiv *= self.quantvals
        else:
            for j in range(self.dims):
                v = self.mult[entry * self.dims + j] * self.delta \
                    + self.minv + last
                if self.seq_p:
                    last = v
                out[j] = v
        return out


# --------------------------------------------------------------- floor --
class Floor1:
    def __init__(self, br, books):
        self.partitions = br.read(5)
        self.class_list = [br.read(4) for _ in range(self.partitions)]
        maxclass = max(self.class_list) if self.class_list else -1
        self.class_dims = []
        self.class_subs = []
        self.masterbooks = []
        self.subclass_books = []
        for c in range(maxclass + 1):
            self.class_dims.append(br.read(3) + 1)
            subs = br.read(2)
            self.class_subs.append(subs)
            if subs:
                mb = br.read(8)
                _need(mb < len(books), "floor1 masterbook out of range")
                self.masterbooks.append(mb)
            else:
                self.masterbooks.append(-1)
            sb = []
            for _ in range(1 << subs):
                b = br.read(8) - 1
                _need(b < len(books), "floor1 subclass book out of range")
                sb.append(b)
            self.subclass_books.append(sb)
        self.multiplier = br.read(2) + 1
        rangebits = br.read(4)
        xs = [0, 1 << rangebits]
        for i in range(self.partitions):
            for _ in range(self.class_dims[self.class_list[i]]):
                xs.append(br.read(rangebits))
        _need(len(xs) <= 65, "floor1 has more than 65 posts")
        _need(len(set(xs)) == len(xs), "floor1 X values not unique")
        self.xs = xs
        # sort order over X (spec 7.2.2 last paragraph)
        self.sortidx = sorted(range(len(xs)), key=lambda i: xs[i])
        self.range = [256, 128, 86, 64][self.multiplier - 1]

    def decode(self, br, books):
        """spec 7.2.3: returns the post Y vector or None (unused)."""
        if br.read_bit() == 0:
            return None
        rbits = ilog(self.range - 1)
        ys = [br.read(rbits), br.read(rbits)]
        for i in range(self.partitions):
            cls = self.class_list[i]
            cdim = self.class_dims[cls]
            cbits = self.class_subs[cls]
            csub = (1 << cbits) - 1
            cval = 0
            if cbits:
                cval = books[self.masterbooks[cls]].decode_scalar(br)
            for _ in range(cdim):
                book = self.subclass_books[cls][cval & csub]
                cval >>= cbits
                if book >= 0:
                    ys.append(books[book].decode_scalar(br))
                else:
                    ys.append(0)
        return ys

    def curve(self, ys, n2, dbtab):
        """spec 7.2.4: amplitude step + line render -> n2 floor values."""
        rng = self.range
        count = len(self.xs)
        final = [0] * count
        step2 = [False] * count
        final[0] = ys[0]
        final[1] = ys[1]
        step2[0] = step2[1] = True
        for j in range(2, count):
            lo = _low_neighbor(self.xs, j)
            hi = _high_neighbor(self.xs, j)
            pred = _render_point(self.xs[lo], final[lo],
                                 self.xs[hi], final[hi], self.xs[j])
            val = ys[j]
            highroom = rng - pred
            lowroom = pred
            room = 2 * (highroom if highroom < lowroom else lowroom)
            if val:
                step2[lo] = True
                step2[hi] = True
                step2[j] = True
                if val >= room:
                    if highroom > lowroom:
                        final[j] = val - lowroom + pred
                    else:
                        final[j] = pred - (val - highroom) - 1
                else:
                    if val & 1:
                        final[j] = pred - ((val + 1) >> 1)
                    else:
                        final[j] = pred + (val >> 1)
            else:
                step2[j] = False
                final[j] = pred
        # step 2: render in sorted X order, clamping posts to the range
        floor_y = [0] * n2
        hx = 0
        hy = 0
        lx = 0
        v0 = final[self.sortidx[0]]
        ly = _clamp(v0, 0, rng - 1) * self.multiplier
        for si in self.sortidx:
            if not step2[si]:
                continue
            hx = self.xs[si]
            hy = _clamp(final[si], 0, rng - 1) * self.multiplier
            if hx > lx:
                _render_line(lx, ly, hx, hy, floor_y, n2)
            elif hx == lx == 0:
                pass  # first post renders nothing yet
            lx, ly = hx, hy
        if hx < n2:
            for i in range(hx, n2):
                floor_y[i] = ly
        return [dbtab[v] for v in floor_y]


def _clamp(v, lo, hi):
    return lo if v < lo else hi if v > hi else v


def _low_neighbor(v, x):
    """spec 9.2.4: index of greatest v[n] < v[x] for n < x."""
    best = -1
    for n in range(x):
        if v[n] < v[x] and (best < 0 or v[n] > v[best]):
            best = n
    _need(best >= 0, "low_neighbor: none")
    return best


def _high_neighbor(v, x):
    """spec 9.2.5: index of smallest v[n] > v[x] for n < x."""
    best = -1
    for n in range(x):
        if v[n] > v[x] and (best < 0 or v[n] < v[best]):
            best = n
    _need(best >= 0, "high_neighbor: none")
    return best


def _render_point(x0, y0, x1, y1, x):
    """spec 9.2.6."""
    dy = y1 - y0
    adx = x1 - x0
    ady = -dy if dy < 0 else dy
    err = ady * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def _render_line(x0, y0, x1, y1, v, n2):
    """spec 9.2.7: Bresenham fill of v[x0..min(x1,n2))."""
    dy = y1 - y0
    adx = x1 - x0
    base = dy // adx if dy >= 0 else -((-dy) // adx)  # trunc toward zero
    ady = (-dy if dy < 0 else dy) - (base if base >= 0 else -base) * adx
    sy = base + 1 if dy >= 0 else base - 1
    x = x0
    y = y0
    err = 0
    if x0 < n2:
        v[x0] = y
    for x in range(x0 + 1, min(x1, n2)):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        v[x] = y


# ------------------------------------------------------------- residue --
class Residue:
    def __init__(self, br, rtype, books):
        self.rtype = rtype
        self.begin = br.read(24)
        self.end = br.read(24)
        self.psize = br.read(24) + 1
        self.classifications = br.read(6) + 1
        self.classbook = br.read(8)
        _need(self.classbook < len(books), "residue classbook out of range")
        cascade = []
        for _ in range(self.classifications):
            low = br.read(3)
            high = br.read(5) if br.read_bit() else 0
            cascade.append((high << 3) | low)
        self.cascade = cascade
        self.books = []
        for c in range(self.classifications):
            row = []
            for p in range(8):
                if cascade[c] & (1 << p):
                    b = br.read(8)
                    _need(b < len(books), "residue book out of range")
                    _need(books[b].lookup != 0,
                          "residue book has no VQ lookup")
                    row.append(b)
                else:
                    row.append(-1)
            self.books.append(row)
        cb = books[self.classbook]
        _need(cb.entries >= self.classifications ** cb.dims,
              "residue classbook smaller than classifications^dims")

    def decode(self, br, books, do_not_decode, n):
        """spec 8.6.2. n = per-channel vector size (blocksize/2);
        returns one vector per channel. Type 2 interleaves channels
        into one long vector first."""
        ch = len(do_not_decode)
        if self.rtype == 2:
            if all(do_not_decode):
                return [[0.0] * n for _ in range(ch)]
            big = [[0.0] * (n * ch)]
            self._decode_core(br, books, [False], n * ch, big)
            out = [[0.0] * n for _ in range(ch)]
            for i in range(n):
                for j in range(ch):
                    out[j][i] = big[0][i * ch + j]
            return out
        vectors = [[0.0] * n for _ in range(ch)]
        self._decode_core(br, books, do_not_decode, n, vectors)
        return vectors

    def _decode_core(self, br, books, do_not_decode, n, vectors):
        """Accumulates in place; end-of-packet mid-residue keeps what
        was decoded so far (spec 1.1.4)."""
        ch = len(do_not_decode)
        limit_begin = min(self.begin, n)
        limit_end = min(self.end, n)
        to_read = limit_end - limit_begin
        if to_read <= 0:
            return
        cb = books[self.classbook]
        classwords = cb.dims
        parts = to_read // self.psize
        _need(parts * self.psize == to_read,
              "residue [begin,end) not a multiple of the partition size")
        cls = [[0] * (parts + classwords) for _ in range(ch)]
        fmt0 = self.rtype == 0
        try:
            self._passes(br, books, do_not_decode, cb, classwords, parts,
                         cls, vectors, limit_begin, fmt0)
        except EOFError:
            pass  # spec 1.1.4: EOP mid-residue -> keep partial decode

    def _passes(self, br, books, do_not_decode, cb, classwords, parts,
                cls, vectors, limit_begin, fmt0):
        ch = len(do_not_decode)
        # passes 0..maxpass-1 where maxpass = highest set cascade bit
        # position + 1; pass 0 ALWAYS runs (it reads the classification
        # codewords even when no class has a pass-0 book)
        maxpass = max(1, max(ilog(c) for c in self.cascade))
        for p in range(maxpass):
            pcount = 0
            while pcount < parts:
                if p == 0:
                    for j in range(ch):
                        if do_not_decode[j]:
                            continue
                        temp = cb.decode_scalar(br)
                        for i in range(classwords - 1, -1, -1):
                            cls[j][pcount + i] = temp % self.classifications
                            temp //= self.classifications
                i = 0
                while i < classwords and pcount < parts:
                    for j in range(ch):
                        if do_not_decode[j]:
                            continue
                        vqclass = cls[j][pcount]
                        book = self.books[vqclass][p]
                        if book < 0:
                            continue
                        self._partition(br, books[book], vectors[j],
                                        limit_begin + pcount * self.psize,
                                        fmt0)
                    i += 1
                    pcount += 1

    def _partition(self, br, book, vec, offset, fmt0):
        psize = self.psize
        dim = book.dims
        _need(psize % dim == 0,
              "residue partition size not a multiple of book dims")
        if fmt0:  # spec 8.6.3, residue type 0: interleaved
            step = psize // dim
            for i in range(step):
                entry = book.decode_scalar(br)
                v = book.vq(entry)
                for j in range(dim):
                    vec[offset + i + j * step] += v[j]
        else:  # residue types 1/2: sequential
            i = 0
            while i < psize:
                entry = book.decode_scalar(br)
                v = book.vq(entry)
                for j in range(dim):
                    vec[offset + i] += v[j]
                    i += 1


# ------------------------------------------------------------- mapping --
class Mapping:
    def __init__(self, br, channels, nfloors, nresidues):
        _need(br.read(16) == 0, "reserved mapping type")
        self.submaps = br.read(4) + 1 if br.read_bit() else 1
        self.coupling = []
        if br.read_bit():
            steps = br.read(8) + 1
            bits = ilog(channels - 1)
            for _ in range(steps):
                m = br.read(bits)
                a = br.read(bits)
                _need(m != a and m < channels and a < channels,
                      "bad coupling pair")
                self.coupling.append((m, a))
        _need(br.read(2) == 0, "mapping reserved bits nonzero")
        if self.submaps > 1:
            self.mux = [br.read(4) for _ in range(channels)]
            _need(all(m < self.submaps for m in self.mux),
                  "mapping mux out of range")
        else:
            self.mux = [0] * channels
        self.floor_of = []
        self.residue_of = []
        for _ in range(self.submaps):
            br.read(8)  # unused time config
            f = br.read(8)
            _need(f < nfloors, "mapping floor out of range")
            r = br.read(8)
            _need(r < nresidues, "mapping residue out of range")
            self.floor_of.append(f)
            self.residue_of.append(r)


# -------------------------------------------------------------- decode --
class Decoder:
    def __init__(self, data):
        packets, granules = ogg_packets(data)
        _need(len(packets) >= 4, "vorbis: need 3 headers + >=1 audio packet")
        self._ident(packets[0])
        self._comment(packets[1])
        self._setup(packets[2])
        self.audio = packets[3:]
        self._dbtab = inverse_db_table()
        # granule positions keyed by audio-packet index
        self.granules = [(i - 3, g) for i, g in granules if i >= 3]

    def _ident(self, p):
        br = BitReader(p)
        _need(br.read(8) == 1, "first packet is not an ident header")
        _need(bytes(p[1:7]) == b"vorbis", "ident header magic missing")
        br.pos = 7 * 8
        _need(br.read(32) == 0, "vorbis_version != 0")
        self.channels = br.read(8)
        self.rate = br.read(32)
        _need(self.channels > 0 and self.rate > 0, "bad channels/rate")
        br.read(32)  # bitrate max
        self.bitrate_nominal = br.read(32)
        br.read(32)  # bitrate min
        b0 = br.read(4)
        b1 = br.read(4)
        self.n0 = 1 << b0
        self.n1 = 1 << b1
        _need(self.n0 in BLOCKSIZES and self.n1 in BLOCKSIZES,
              "blocksize outside [64, 8192]")
        _need(self.n0 <= self.n1, "blocksize_0 > blocksize_1")
        _need(br.read_bit() == 1, "ident framing bit unset")

    def _comment(self, p):
        br = BitReader(p)
        _need(br.read(8) == 3, "second packet is not a comment header")
        _need(bytes(p[1:7]) == b"vorbis", "comment header magic missing")
        br.pos = 7 * 8
        vlen = br.read(32)
        self.vendor = bytes(p[11:11 + vlen]).decode("utf-8", "replace")
        br.pos = (11 + vlen) * 8
        ncom = br.read(32)
        self.comments = []
        for _ in range(ncom):
            ln = br.read(32)
            at = br.pos // 8
            self.comments.append(
                bytes(p[at:at + ln]).decode("utf-8", "replace"))
            br.pos = (at + ln) * 8
        _need(br.read_bit() == 1, "comment framing bit unset")

    def _setup(self, p):
        br = BitReader(p)
        _need(br.read(8) == 5, "third packet is not a setup header")
        _need(bytes(p[1:7]) == b"vorbis", "setup header magic missing")
        br.pos = 7 * 8
        self.books = [Codebook(br) for _ in range(br.read(8) + 1)]
        # time domain transforms: all zero (placeholder in Vorbis I)
        for _ in range(br.read(6) + 1):
            _need(br.read(16) == 0, "nonzero time-domain transform type")
        self.floors = []
        for _ in range(br.read(6) + 1):
            ftype = br.read(16)
            if ftype == 1:
                self.floors.append(Floor1(br, self.books))
            elif ftype == 0:
                raise VorbisError(
                    "floor type 0 (LSP) unsupported: no known encoder has "
                    "emitted it since Xiph beta3 (~2001); floor 1 only")
            else:
                raise VorbisError("reserved floor type %d" % ftype)
        self.residues = []
        for _ in range(br.read(6) + 1):
            rtype = br.read(16)
            _need(rtype in (0, 1, 2), "reserved residue type")
            self.residues.append(Residue(br, rtype, self.books))
        self.mappings = []
        for _ in range(br.read(6) + 1):
            self.mappings.append(
                Mapping(br, self.channels, len(self.floors),
                        len(self.residues)))
        self.modes = []
        for _ in range(br.read(6) + 1):
            blockflag = br.read_bit()
            _need(br.read(16) == 0, "nonzero mode window type")
            _need(br.read(16) == 0, "nonzero mode transform type")
            mapping = br.read(8)
            _need(mapping < len(self.mappings), "mode mapping out of range")
            self.modes.append((blockflag, mapping))
        _need(br.read_bit() == 1, "setup framing bit unset")

    # ------------------------------------------------------- synthesis --
    def decode(self):
        """Decode every audio packet -> (interleaved int16 list, meta).

        Lapping model (spec 1.3.2 / 4.3.1, absolute sample timeline):
        block b is placed so its LEFT slope region [ls, le) coincides
        with block b-1's RIGHT slope region [rs', re'); after adding
        block b, samples up to its rs are final, so each block b >= 1
        emits exactly rs - ls samples (= prev_n/4 + cur_n/4); the first
        block only primes the lap buffer."""
        dbtab = inverse_db_table()
        sizes = sorted({self.n0, self.n1})
        slopes = {n: window_slope(n) for n in sizes}
        tw = {n: dct4_twiddles(n // 2) for n in sizes}
        ch = self.channels
        out = [[] for _ in range(ch)]
        prev_tail = None  # per channel: windowed samples from prev rs on
        prev_lap_len = 0  # prev re - prev rs
        last_pkt_with_granule = dict(self.granules)
        emitted = 0
        trim_to = None
        for pkt_i, p in enumerate(self.audio):
            br = BitReader(p)
            _need(br.read_bit() == 0, "audio packet type bit set")
            mode_i = br.read(ilog(len(self.modes) - 1))
            _need(mode_i < len(self.modes), "mode number out of range")
            blockflag, map_i = self.modes[mode_i]
            n = self.n1 if blockflag else self.n0
            prev_flag = next_flag = 1
            if blockflag:
                prev_flag = br.read_bit()
                next_flag = br.read_bit()
            spectra = self._decode_spectra(br, map_i, n)
            pre, post, ffttw = tw[n]
            n2 = n // 2
            if blockflag and not prev_flag:
                ls, le, lsz = n // 4 - self.n0 // 4, \
                    n // 4 + self.n0 // 4, self.n0 // 2
            else:
                ls, le, lsz = 0, n2, n2
            if blockflag and not next_flag:
                rs, re_, rsz = 3 * n // 4 - self.n0 // 4, \
                    3 * n // 4 + self.n0 // 4, self.n0 // 2
            else:
                rs, re_, rsz = n2, n, n2
            lslope = slopes[self.n0 if lsz == self.n0 // 2 else n]
            rslope = slopes[self.n0 if rsz == self.n0 // 2 else n]
            windows = []
            for c in range(ch):
                t = imdct_fast(spectra[c], n, pre, post, ffttw)
                for i in range(ls):
                    t[i] = 0.0
                for i in range(lsz):
                    t[ls + i] *= lslope[i]
                for i in range(rsz):
                    t[rs + i] *= rslope[rsz - 1 - i]
                for i in range(re_, n):
                    t[i] = 0.0
                windows.append(t)
            if prev_tail is not None:
                _need(prev_lap_len == le - ls,
                      "window slopes of adjacent blocks disagree "
                      "(window flags inconsistent with block sizes)")
                for c in range(ch):
                    cur = windows[c]
                    tail = prev_tail[c]
                    seg = []
                    for i in range(rs - ls):
                        v = cur[ls + i]
                        if i < len(tail):
                            v += tail[i]
                        seg.append(v)
                    out[c].extend(seg)
                emitted += rs - ls
                g = last_pkt_with_granule.get(pkt_i)
                if g is not None:
                    if pkt_i == len(self.audio) - 1:
                        _need(g <= emitted,
                              "final granule beyond decoded samples")
                        trim_to = g
                    else:
                        _need(g == emitted,
                              "mid-stream granule does not match sample "
                              "count (%d != %d)" % (g, emitted))
            else:
                g = last_pkt_with_granule.get(pkt_i)
                _need(g is None or g == 0 or len(self.audio) == 1,
                      "granule on a page that emitted no samples")
            prev_tail = [w[rs:re_] for w in windows]
            prev_lap_len = re_ - rs
        if trim_to is not None:
            for c in range(ch):
                out[c] = out[c][:trim_to]
            emitted = min(emitted, trim_to)
        # interleave + int16
        pcm = []
        for i in range(emitted):
            for c in range(ch):
                # pinned conversion: floor(x*32768 + 0.5), clamped --
                # identical op order in VorbisCodec.scala
                v = int(math.floor(out[c][i] * 32768.0 + 0.5))
                if v < -32768:
                    v = -32768
                elif v > 32767:
                    v = 32767
                pcm.append(v)
        return pcm, emitted

    def _decode_spectra(self, br, map_i, n):
        """Floor + residue + coupling + dot product for one packet.
        End-of-packet inside floor decode zeroes the remaining channels
        (spec 1.1.4); EOP inside residue keeps what was accumulated."""
        mp = self.mappings[map_i]
        ch = self.channels
        n2 = n // 2
        dbtab = self._dbtab
        floor_ys = [None] * ch
        try:
            for c in range(ch):
                fl = self.floors[mp.floor_of[mp.mux[c]]]
                floor_ys[c] = fl.decode(br, self.books)
        except EOFError:
            return [[0.0] * n2 for _ in range(ch)]
        no_residue = [ys is None for ys in floor_ys]
        for m, a in mp.coupling:
            if not (no_residue[m] and no_residue[a]):
                no_residue[m] = no_residue[a] = False
        residues = [None] * ch
        for s in range(mp.submaps):
            chans = [c for c in range(ch) if mp.mux[c] == s]
            dnd = [no_residue[c] for c in chans]
            res = self.residues[mp.residue_of[s]]
            vecs = res.decode(br, self.books, dnd, n2)
            for idx, c in enumerate(chans):
                residues[c] = vecs[idx]
        for m, a in reversed(mp.coupling):
            mv, av = residues[m], residues[a]
            for i in range(n2):
                M, A = mv[i], av[i]
                if M > 0:
                    if A > 0:
                        newM, newA = M, M - A
                    else:
                        newA, newM = M, M + A
                else:
                    if A > 0:
                        newM, newA = M, M + A
                    else:
                        newA, newM = M, M - A
                mv[i], av[i] = newM, newA
        spectra = []
        for c in range(ch):
            if floor_ys[c] is None:
                spectra.append([0.0] * n2)
                continue
            fl = self.floors[mp.floor_of[mp.mux[c]]]
            curve = fl.curve(floor_ys[c], n2, dbtab)
            r = residues[c]
            spectra.append([curve[i] * r[i] for i in range(n2)])
        return spectra


def decode_ogg(data):
    """data -> dict(channels, rate, samples, pcm int16 interleaved)."""
    d = Decoder(data)
    pcm, frames = d.decode()
    return {"channels": d.channels, "rate": d.rate, "frames": frames,
            "pcm": pcm, "vendor": d.vendor, "comments": d.comments,
            "bitrate_nominal": d.bitrate_nominal}

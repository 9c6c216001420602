#!/usr/bin/env python3
"""Generate the committed Ogg Vorbis conformance fixtures + manifest +
shared float tables.

Each fixture is encoded by encoder.py and decoded by decoder.py (the
reference VorbisCodec.scala mirrors bit-exactly), pinned in
src/main/resources/vorbis/manifest.tsv as:

  name  rate  ch  frames  md5(int16le interleaved)  sum  maxabs  snr_db  desc

snr_db measures decode vs the source signal (aligned at the first
emitted sample): end-to-end transform validation, same convention as
the mp3 wheel. vorbistables.bin carries every float constant both
implementations share (window slopes, DCT-IV/FFT twiddles, inverse-dB
table) as little-endian doubles.
"""
import hashlib
import math
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import decoder as D
import encoder as E
from common import (BLOCKSIZES, window_slope, dct4_twiddles,
                    inverse_db_table)

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "..", "..", "src", "main", "resources", "vorbis")


def tones(n, sr, freqs, amps, phase=0.3):
    return [sum(a * math.sin(2 * math.pi * f * i / sr + phase * j)
                for j, (f, a) in enumerate(zip(freqs, amps)))
            for i in range(n)]


def classbook(nclasses, classwords):
    return E.Book(classwords, nclasses ** classwords, "scalar")


def lattice(dim, lo, hi):
    qv = hi - lo + 1
    return E.Book(dim, qv ** dim, "lattice", minv=lo, quantvals=qv)


def floorbook(rng):
    return E.Book(1, rng, "scalar")


def std_floor(rangebits, mult, xs_tail, book_idx):
    """One class of dim len(xs_tail) split over <=8-dim partitions."""
    tail = list(xs_tail)
    parts = []
    i = 0
    while i < len(tail):
        parts.append(min(8, len(tail) - i))
        i += min(8, len(tail) - i)
    # one class per distinct dim
    dims = sorted(set(parts))
    class_of = {d: i for i, d in enumerate(dims)}
    return E.Floor(
        partitions=len(parts),
        class_list=[class_of[d] for d in parts],
        class_dims=dims,
        class_subs=[0] * len(dims),
        masterbooks=[-1] * len(dims),
        subclass_books=[[book_idx] for _ in dims],
        multiplier=mult, rangebits=rangebits, xs_tail=tail)


def log_xs(rangebits, count):
    """count log-spaced unique X positions in (0, 2^rangebits)."""
    top = (1 << rangebits) - 1
    xs = []
    for i in range(1, count + 1):
        x = int(round(3 * (top / 3.0) ** (i / float(count))))
        while x in xs or x <= 0 or x >= (1 << rangebits):
            x += 1
        xs.append(x)
    return xs


def snr(src, dec_pcm, channels, offset):
    es = en = 0.0
    frames = len(dec_pcm) // channels
    for i in range(frames):
        for c in range(channels):
            t = offset + i
            s = src[c][t] if t < len(src[c]) else 0.0
            d = dec_pcm[i * channels + c] / 32768.0
            es += s * s
            en += (s - d) * (s - d)
    if en == 0:
        return 999.0
    if es == 0:
        return 0.0
    return 10 * math.log10(es / en)


FIXTURES = []


def fixture(name, desc, build):
    FIXTURES.append((name, desc, build))


# ---------------------------------------------------------------------
# fixture 1: mono, single long blocksize, residue type 2, lookup 1
def _mono_long():
    n = 2048
    books = [classbook(2, 4), lattice(2, -24, 24), floorbook(128)]
    floors = [std_floor(10, 2, log_xs(10, 24), 2)]
    residues = [E.Residue(2, 0, 1024, 32, 2, 0,
                          cascade=[0, 1], books_mtx=[[-1] * 8,
                                                     [1] + [-1] * 7])]
    mappings = [E.Mapping(1)]
    cfg = E.StreamCfg(n, n, books, floors, residues, mappings,
                      modes=[(0, 0)], res_clamp=24)
    sr = 44100
    sig = tones(9 * 1024, sr, [440.0, 1320.5, 3777.0], [0.32, 0.2, 0.12])
    ogg = E.encode_stream(cfg, [sig], sr, [0] * 8,
                          comments=["TITLE=mono long", "ENCODER=vorbisref"])
    return ogg, [sig], 1024
fixture("v_mono_long", "mono 44.1k, single 2048 blocksize, residue type 2",
        _mono_long)


# fixture 2: mono all-short blocks with a long blocksize declared
def _mono_short():
    books = [classbook(2, 4), lattice(2, -24, 24), floorbook(256)]
    floors = [std_floor(7, 1, log_xs(7, 14), 2)]
    residues = [E.Residue(2, 0, 128, 16, 2, 0,
                          cascade=[0, 1],
                          books_mtx=[[-1] * 8, [1] + [-1] * 7])]
    cfg = E.StreamCfg(256, 2048, books, floors, residues, [E.Mapping(1)],
                      modes=[(0, 0)], res_clamp=24)
    sr = 22050
    sig = tones(24 * 128, sr, [330.0, 990.25], [0.4, 0.18])
    ogg = E.encode_stream(cfg, [sig], sr, [0] * 22)
    return ogg, [sig], 128
fixture("v_mono_short", "mono 22.05k, all-short 256 blocks, multiplier 1",
        _mono_short)


# fixture 3: long/short block switching with window flags
def _blockswitch():
    books = [classbook(2, 4), lattice(2, -24, 24), floorbook(128)]
    floors = [std_floor(10, 2, log_xs(10, 20), 2)]
    residues = [E.Residue(2, 0, 1024, 32, 2, 0,
                          cascade=[0, 1],
                          books_mtx=[[-1] * 8, [1] + [-1] * 7])]
    cfg = E.StreamCfg(256, 2048, books, floors, residues, [E.Mapping(1)],
                      modes=[(0, 0), (1, 0)], res_clamp=24)
    sr = 44100
    sig = tones(14 * 1024, sr, [523.25, 2093.0], [0.35, 0.15])
    seq = [1, 1, 0, 0, 0, 1, 1, 0, 1, 1, 0, 0, 1, 1]
    ogg = E.encode_stream(cfg, [sig], sr, seq)
    return ogg, [sig], 1024
fixture("v_blockswitch",
        "mono 44.1k, 256/2048 switching (start/stop window flags)",
        _blockswitch)


# fixture 4: stereo with square-polar coupling, residue type 2
def _stereo_coupled():
    books = [classbook(2, 4), lattice(2, -48, 48), floorbook(128)]
    floors = [std_floor(10, 2, log_xs(10, 22), 2)]
    residues = [E.Residue(2, 0, 2048, 32, 2, 0,
                          cascade=[0, 1],
                          books_mtx=[[-1] * 8, [1] + [-1] * 7])]
    mappings = [E.Mapping(2, coupling=[(0, 1)])]
    cfg = E.StreamCfg(2048, 2048, books, floors, residues, mappings,
                      modes=[(0, 0)], res_clamp=24)
    sr = 48000
    left = tones(9 * 1024, sr, [440.0, 1567.98], [0.3, 0.16])
    right = [0.9 * v for v in tones(9 * 1024, sr, [440.0, 1567.98],
                                    [0.3, 0.16], phase=0.32)]
    ogg = E.encode_stream(cfg, [left, right], sr, [0] * 8)
    return ogg, [left, right], 1024
fixture("v_stereo_coupled",
        "stereo 48k, square-polar coupling, residue type 2 interleave",
        _stereo_coupled)


# fixture 5: stereo UNCOUPLED, residue type 1 (per-channel vectors)
def _stereo_res1():
    books = [classbook(3, 3), lattice(2, -24, 24), floorbook(128)]
    floors = [std_floor(10, 2, log_xs(10, 18), 2)]
    residues = [E.Residue(1, 0, 1024, 32, 3, 0,
                          cascade=[0, 1, 1],
                          books_mtx=[[-1] * 8, [1] + [-1] * 7,
                                     [1] + [-1] * 7])]
    cfg = E.StreamCfg(2048, 2048, books, floors, residues, [E.Mapping(2)],
                      modes=[(0, 0)], res_clamp=24)
    sr = 32000
    left = tones(8 * 1024, sr, [349.23], [0.4])
    right = tones(8 * 1024, sr, [932.33], [0.33])
    ogg = E.encode_stream(cfg, [left, right], sr, [0] * 7)
    return ogg, [left, right], 1024
fixture("v_stereo_res1",
        "stereo 32k uncoupled, residue type 1, 3 classes",
        _stereo_res1)


# fixture 6: residue type 0 (interleaved partition format)
def _res0():
    books = [classbook(2, 4), lattice(2, -24, 24), floorbook(128)]
    floors = [std_floor(9, 2, log_xs(9, 16), 2)]
    residues = [E.Residue(0, 0, 512, 16, 2, 0,
                          cascade=[0, 1],
                          books_mtx=[[-1] * 8, [1] + [-1] * 7])]
    cfg = E.StreamCfg(1024, 1024, books, floors, residues, [E.Mapping(1)],
                      modes=[(0, 0)], res_clamp=24)
    sr = 16000
    sig = tones(9 * 512, sr, [261.63, 1046.5], [0.38, 0.14])
    ogg = E.encode_stream(cfg, [sig], sr, [0] * 8)
    return ogg, [sig], 512
fixture("v_res0", "mono 16k, residue type 0 (interleaved format)", _res0)


# fixture 7: cascaded 2-pass residue, coarse pass = lookup type 2
def _cascade():
    coarse = E.Book(2, 9, "explicit", minv=-16,
                    values=[a for pair in
                            [(x, y) for y in (0, 16, 32)
                             for x in (0, 16, 32)] for a in pair])
    books = [classbook(2, 4), coarse, lattice(2, -8, 8), floorbook(128)]
    floors = [std_floor(10, 2, log_xs(10, 20), 3)]
    residues = [E.Residue(2, 0, 1024, 32, 2, 0,
                          cascade=[0, 3],
                          books_mtx=[[-1] * 8, [1, 2] + [-1] * 6])]
    cfg = E.StreamCfg(2048, 2048, books, floors, residues, [E.Mapping(1)],
                      modes=[(0, 0)], res_clamp=24)
    sr = 44100
    sig = tones(9 * 1024, sr, [659.26, 2637.0], [0.36, 0.1])
    ogg = E.encode_stream(cfg, [sig], sr, [0] * 8)
    return ogg, [sig], 1024
fixture("v_cascade",
        "mono 44.1k, 2-pass cascade: lookup-2 coarse + lattice fine",
        _cascade)


# fixture 8: stereo res type 1 with channel 1 silent (do-not-decode)
def _silent_ch():
    books = [classbook(2, 4), lattice(2, -24, 24), floorbook(128)]
    floors = [std_floor(10, 2, log_xs(10, 16), 2)]
    residues = [E.Residue(1, 0, 1024, 32, 2, 0,
                          cascade=[0, 1],
                          books_mtx=[[-1] * 8, [1] + [-1] * 7])]
    cfg = E.StreamCfg(2048, 2048, books, floors, residues, [E.Mapping(2)],
                      modes=[(0, 0)], res_clamp=24)
    sr = 44100
    left = tones(8 * 1024, sr, [493.88], [0.42])
    # silent frames 4-5 on BOTH channels (all-do-not-decode packet)
    for i in range(3 * 1024 + 512, 5 * 1024 + 512):
        left[i] = 0.0
    right = [0.0] * len(left)
    ogg = E.encode_stream(cfg, [left, right], sr, [0] * 7)
    return ogg, [left, right], 1024
fixture("v_silent_ch",
        "stereo 44.1k, channel 1 fully silent + all-silent frames "
        "(do-not-decode paths)",
        _silent_ch)


# fixture 9: 3 channels, 2 submaps, coupling on submap 0, floor with
# subclasses + masterbook on submap 1, multiplier 3
def _submaps():
    books = [
        classbook(2, 4),                 # 0: classbook submap0
        lattice(2, -48, 48),             # 1: residue submap0 (coupled)
        floorbook(128),                  # 2: floor book submap0
        classbook(2, 2),                 # 3: classbook submap1
        lattice(2, -24, 24),             # 4: residue submap1
        E.Book(1, 8, "scalar"),          # 5: small subclass book
        E.Book(1, 86, "scalar"),         # 6: full-range subclass book
        classbook(2, 4),                 # 7: floor masterbook (16 cvals)
    ]
    floor0 = std_floor(10, 2, log_xs(10, 18), 2)
    # submap-1 floor: 2 partitions x dim 4, subclasses=1,
    # books [small(8), full(86)] selected per post via masterbook
    floor1 = E.Floor(
        partitions=2, class_list=[0, 0], class_dims=[4],
        class_subs=[1], masterbooks=[7], subclass_books=[[5, 6]],
        multiplier=3, rangebits=9, xs_tail=log_xs(9, 8))
    residues = [
        E.Residue(2, 0, 2048, 32, 2, 0, cascade=[0, 1],
                  books_mtx=[[-1] * 8, [1] + [-1] * 7]),
        E.Residue(1, 0, 1024, 32, 2, 3, cascade=[0, 1],
                  books_mtx=[[-1] * 8, [4] + [-1] * 7]),
    ]
    mappings = [E.Mapping(3, coupling=[(0, 1)], mux=[0, 0, 1],
                          floor_of=(0, 1), residue_of=(0, 1))]
    cfg = E.StreamCfg(2048, 2048, books, floors=[floor0, floor1],
                      residues=residues, mappings=mappings,
                      modes=[(0, 0)], res_clamp=24)
    sr = 44100
    c0 = tones(8 * 1024, sr, [440.0, 880.0], [0.3, 0.12])
    c1 = [0.85 * v for v in c0]
    c2 = tones(8 * 1024, sr, [1244.51], [0.3])
    ogg = E.encode_stream(cfg, [c0, c1, c2], sr, [0] * 7)
    return ogg, [c0, c1, c2], 1024
fixture("v_submaps",
        "3ch 44.1k, 2 submaps (coupled pair + solo), floor subclasses "
        "with masterbook, multiplier 3",
        _submaps)


# fixture 10: sparse floor book + ordered classbook
def _sparse_ordered():
    ordered_cb = E.Book(2, 16, "scalar", lengths=[4] * 16, ordered=True)
    sparse_fb = E.Book(1, 160, "scalar",
                       lengths=complete_128_sparse(), sparse=True)
    books = [ordered_cb, lattice(2, -24, 24), sparse_fb]
    floors = [std_floor(10, 2, log_xs(10, 16), 2)]
    residues = [E.Residue(2, 0, 1024, 32, 2, 0,
                          cascade=[0, 1],
                          books_mtx=[[-1] * 8, [1] + [-1] * 7])]
    cfg = E.StreamCfg(2048, 2048, books, floors, residues, [E.Mapping(1)],
                      modes=[(0, 0)], res_clamp=24)
    sr = 24000
    sig = tones(8 * 1024, sr, [587.33, 1174.66], [0.33, 0.2])
    ogg = E.encode_stream(cfg, [sig], sr, [0] * 7)
    return ogg, [sig], 1024
fixture("v_sparse_ordered",
        "mono 24k, sparse floor codebook + ordered-length classbook",
        _sparse_ordered)


def complete_128_sparse():
    """160-entry book: entries 0..127 used (complete 7-bit tree),
    128..159 unused (sparse zeros)."""
    return [7] * 128 + [0] * 32


# fixture 11: oversized comment header spanning pages + granule trim
def _longcomment():
    books = [classbook(2, 4), lattice(2, -24, 24), floorbook(128)]
    floors = [std_floor(7, 2, log_xs(7, 10), 2)]
    residues = [E.Residue(2, 0, 128, 16, 2, 0,
                          cascade=[0, 1],
                          books_mtx=[[-1] * 8, [1] + [-1] * 7])]
    cfg = E.StreamCfg(256, 256, books, floors, residues, [E.Mapping(1)],
                      modes=[(0, 0)], res_clamp=24)
    sr = 8000
    sig = tones(24 * 128, sr, [220.0], [0.45])
    # ~80 KB of comments: the comment packet MUST span ogg pages
    comments = ["LYRICS%03d=%s" % (i, "la" * 190) for i in range(200)]
    n_frames = 22
    ogg = E.encode_stream(cfg, [sig], sr, [0] * n_frames,
                          comments=comments, trim=20 * 128 - 57)
    return ogg, [sig], 128
fixture("v_longcomment",
        "mono 8k, 80KB comment spans pages (continued packets) + "
        "granule end-trim",
        _longcomment)


# fixture 12: the largest blocksize (8192) end to end
def _big_blocks():
    books = [classbook(2, 4), lattice(2, -24, 24), floorbook(64)]
    floors = [std_floor(12, 4, log_xs(12, 24), 2)]
    residues = [E.Residue(2, 0, 4096, 64, 2, 0,
                          cascade=[0, 1],
                          books_mtx=[[-1] * 8, [1] + [-1] * 7])]
    cfg = E.StreamCfg(8192, 8192, books, floors, residues, [E.Mapping(1)],
                      modes=[(0, 0)], res_clamp=24)
    sr = 11025
    sig = tones(5 * 4096, sr, [146.83, 440.0], [0.4, 0.1])
    ogg = E.encode_stream(cfg, [sig], sr, [0] * 4)
    return ogg, [sig], 4096
fixture("v_big_blocks", "mono 11.025k, 8192 blocks (largest), "
        "multiplier 4", _big_blocks)


def write_tables():
    buf = bytearray(b"GRVORBT1")
    for n in BLOCKSIZES:
        for v in window_slope(n):
            buf += struct.pack("<d", v)
    for n in BLOCKSIZES:
        pre, post, fft = dct4_twiddles(n // 2)
        for re, im in pre:
            buf += struct.pack("<dd", re, im)
        for re, im in post:
            buf += struct.pack("<dd", re, im)
        for re, im in fft:
            buf += struct.pack("<dd", re, im)
    for v in inverse_db_table():
        buf += struct.pack("<d", v)
    path = os.path.join(OUT, "vorbistables.bin")
    with open(path, "wb") as f:
        f.write(buf)
    print("wrote %s (%d bytes)" % (path, len(buf)))


def main():
    os.makedirs(OUT, exist_ok=True)
    write_tables()
    rows = []
    for name, desc, build in FIXTURES:
        ogg, src, offset = build()
        meta = D.decode_ogg(ogg)
        ch = meta["channels"]
        pcm = meta["pcm"]
        s = snr(src, pcm, ch, offset)
        raw = b"".join(struct.pack("<h", v) for v in pcm)
        md5 = hashlib.md5(raw).hexdigest()
        tot = sum(pcm)
        mx = max(abs(v) for v in pcm) if pcm else 0
        assert s > 18.0 or mx == 0, "%s: SNR %.1f too low" % (name, s)
        with open(os.path.join(OUT, name + ".ogg"), "wb") as f:
            f.write(ogg)
        rows.append((name, meta["rate"], ch, meta["frames"], md5, tot, mx,
                     "%.1f" % s, desc))
        print("%-18s %6d Hz ch=%d frames=%6d snr=%5.1f md5=%s (%d B ogg)"
              % (name, meta["rate"], ch, meta["frames"], s, md5, len(ogg)))
    with open(os.path.join(OUT, "manifest.tsv"), "w") as f:
        f.write("name\trate\tch\tframes\tmd5\tsum\tmaxabs\tsnr_db\tdesc\n")
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")
    print("manifest: %d fixtures" % len(rows))


if __name__ == "__main__":
    main()

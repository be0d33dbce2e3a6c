"""Crafted conformance streams beyond any encoder's reach.

The reference's conformance reputation rests on ~70 pinned real-world
assets spanning Vorbis 1.0/beta/rc encoders (dev/cmp/src/lib.rs:238-674).
With no network egress those files are unreachable, but most of the space
they exercise is synthesizable: this module bit-crafts spec-valid streams
that no modern encoder emits —

- floor type 1 with adversarial post patterns (val >= room escapes, the
  render_point u32 wrap, clamp-to-range), multiplier/rangebits variants
- codebooks with ORDERED length lists, SPARSE entries, codewords far past
  the native front-end's 10-bit primary LUT, and sequence_p VQ lookups
- blocksize extremes 64 and 8192 (libvorbisenc only emits 256/2048-ish)
- residue begin/end clamping against short windows

Validation is the same oracle as everything else: libvorbisfile decodes
the crafted bytes, all three backends must match within +/-2 i16 LSB
(tests/test_crafted.py). Deterministic, no RNG state shared with callers.

Packet/encode-side Huffman uses the SAME canonical assignment as the
decoder (lewton_tpu.huffman.assign_codewords), so any length list that
parses is also writable.
"""

from __future__ import annotations

import struct
import sys
from dataclasses import dataclass, field

sys.path.insert(0, ".")

from lewton_tpu.huffman import assign_codewords  # noqa: E402
from lewton_tpu.utils.bitwriter import BitWriter  # noqa: E402
from tools.floor0_stream import ogg_page  # noqa: E402


def ilog(x: int) -> int:
    r = 0
    while x > 0:
        r += 1
        x >>= 1
    return r


def float_pack(v: float) -> int:
    """Encode a value in the Vorbis float32 format:
    value = (-1)^sign * mantissa * 2^(exponent - 788)."""
    sign = 0
    if v < 0:
        sign = 1
        v = -v
    if v == 0:
        return 0
    exp = 788
    # scale mantissa into [2^20, 2^21) while keeping it integral if possible
    while v != int(v) and exp > 768:
        v *= 2.0
        exp -= 1
    m = int(v)
    while m >= (1 << 21):
        m >>= 1
        exp += 1
    return (sign << 31) | (exp << 21) | m


@dataclass
class CB:
    """Codebook spec for :func:`write_codebook`."""

    dims: int
    lengths: list  # per entry: int length, or None for sparse-unused
    ordered: bool = False
    lookup: int = 0
    minimum: float = 0.0
    delta: float = 0.0
    value_bits: int = 0
    sequence_p: bool = False
    mults: list = field(default_factory=list)

    def codes(self):
        """Canonical (code, len) per entry, None for unused (encode side)."""
        return assign_codewords(
            [0 if l is None else l for l in self.lengths])


def write_codebook(w: BitWriter, cb: CB) -> None:
    entries = len(cb.lengths)
    w.write_bits(0x564342, 24)
    w.write_bits(cb.dims, 16)
    w.write_bits(entries, 24)
    w.write_flag(cb.ordered)
    if cb.ordered:
        # nondecreasing lengths, run-length coded (spec 3.2.1)
        assert all(l is not None for l in cb.lengths)
        assert list(cb.lengths) == sorted(cb.lengths)
        w.write_bits(cb.lengths[0] - 1, 5)
        cur_entry, cur_len = 0, cb.lengths[0]
        while cur_entry < entries:
            n = sum(1 for l in cb.lengths if l == cur_len)
            w.write_bits(n, ilog(entries - cur_entry))
            cur_entry += n
            cur_len += 1
    else:
        sparse = any(l is None for l in cb.lengths)
        w.write_flag(sparse)
        for l in cb.lengths:
            if sparse:
                w.write_flag(l is not None)
                if l is not None:
                    w.write_bits(l - 1, 5)
            else:
                w.write_bits(l - 1, 5)
    w.write_bits(cb.lookup, 4)
    if cb.lookup:
        w.write_bits(float_pack(cb.minimum), 32)
        w.write_bits(float_pack(cb.delta), 32)
        w.write_bits(cb.value_bits - 1, 4)
        w.write_flag(cb.sequence_p)
        if cb.lookup == 1:
            n_vals = _lookup1_values(entries, cb.dims)
        else:
            n_vals = entries * cb.dims
        assert len(cb.mults) == n_vals, (len(cb.mults), n_vals)
        for m in cb.mults:
            w.write_bits(m, cb.value_bits)


def _lookup1_values(entries: int, dims: int) -> int:
    r = int(entries ** (1.0 / dims))
    while (r + 1) ** dims <= entries:
        r += 1
    while r**dims > entries:
        r -= 1
    return r


# --------------------------------------------------------------------------- #
# Floor1 stream builder
# --------------------------------------------------------------------------- #


@dataclass
class F1Spec:
    """A small single-channel floor1 + residue stream, parametrized to reach
    header/codebook shapes no encoder emits."""

    rate: int = 8000
    bs0_exp: int = 7
    bs1_exp: int = 8
    two_modes: bool = True  # short+long modes; False = one short mode
    multiplier: int = 2  # 1..4
    rangebits: int = 7
    #: inner X positions (distinct, < 2^rangebits, exclude 0 and 2^rangebits)
    xs: tuple = (16, 32, 48, 64, 80, 96)
    #: subclass-book y entries (val range 0..n-1); 256 reaches val > range
    y_entries: int = 256
    #: residue VQ book: entries -> integer values (lookup 2, dims fixed 2)
    res_book: str = "balanced"  # balanced | long | ordered | sparse | seq_p
    residue_end: int = 64
    partition_size: int = 16
    #: subclass book slot 0 absent (book=-1 -> raw zero y) when True
    absent_subclass_book: bool = False
    #: stereo with TWO submaps (mux ch0->submap0, ch1->submap1), two
    #: floors with different post positions and two residues with
    #: different ends — exercises the mapping mux path no encoder emits
    two_submaps: bool = False
    xs2: tuple = (8, 24, 40, 72, 104, 120)
    residue_end2: int = 48
    #: residue begin > 0: the decode offset base every partition adds
    #: (spec 8.6.2) — no corpus or crafted stream exercised it before
    residue_begin: int = 0
    #: stereo, THREE modes over TWO mappings: mode0 short/uncoupled,
    #: mode1 short/coupled, mode2 long/coupled (square-polar coupling +
    #: multi-mapping mode dispatch in one stream)
    three_modes_coupled: bool = False
    #: stereo with a TYPE-2 residue (channels interleaved into one vector,
    #: spec 8.6.4): residue_end/begin are over the interleaved domain
    type2_stereo: bool = False


def _res_cb(spec: F1Spec) -> CB:
    """The residue VQ codebook under test, per variant."""
    if spec.res_book == "balanced":
        return CB(2, [2] * 4, lookup=2, minimum=-1.0, delta=1.0,
                  value_bits=2, mults=[(i * 3) % 3 for i in range(8)])
    if spec.res_book == "long":
        # lengths 1..15,16,16: complete Kraft; codewords up to 16 bits blow
        # past the native 10-bit primary LUT on the hottest decode path
        lens = list(range(1, 16)) + [16, 16]
        return CB(2, lens, lookup=2, minimum=-2.0, delta=1.0, value_bits=2,
                  mults=[(i * 5 + i // 3) % 4 for i in range(34)])
    if spec.res_book == "ordered":
        # ordered run-length header path; nondecreasing, complete
        lens = [1, 2, 3, 4, 4]
        return CB(2, lens, lookup=2, minimum=-1.0, delta=1.0, value_bits=2,
                  mults=[(i * 2 + 1) % 3 for i in range(10)])
    if spec.res_book == "sparse":
        # 8 entries, 3 unused: sparse flagging + canonical assignment skips
        lens = [2, None, 2, 3, None, 3, None, 2]
        return CB(2, lens, lookup=2, minimum=-1.0, delta=1.0, value_bits=2,
                  mults=[(i * 7) % 3 for i in range(16)])
    if spec.res_book == "lookup1":
        # lookup type 1: the VQ table is the multiplicand lattice
        # (index e -> mults[(e / lv^d) % lv] per dim) — only the header
        # cache path differs from lookup 2, which is exactly what needs
        # the coverage. lv = lookup1_values(4, 2) = 2; values {-1, +1}
        return CB(2, [2] * 4, lookup=1, minimum=-1.0, delta=2.0,
                  value_bits=2, mults=[0, 1])
    if spec.res_book == "dim3":
        # dims=3 does NOT divide the usual partition_size: the last VQ
        # vector of each partition is read whole but its tail components
        # CLIP at the partition boundary (libvorbis-oracle semantics;
        # lewton adds them across the boundary — see residue.py). This is
        # the one decode loop where the two disagree, and the geometry
        # that made the old native fast paths write past the partition.
        # mults period must not divide dims (an (i*k)%3 pattern makes every
        # third component constant-zero and the clipped tail vacuous)
        return CB(3, [2] * 4, lookup=2, minimum=-1.0, delta=1.0,
                  value_bits=2, mults=[(i * 2 + 1) % 4 for i in range(12)])
    if spec.res_book == "seq_p":
        # sequence_p: VQ components accumulate across dims (spec 3.2.1
        # "lookup1/2 with sequence flag"); dims 4 makes the accumulation long
        return CB(4, [2] * 4, lookup=2, minimum=0.0, delta=1.0, value_bits=2,
                  sequence_p=True,
                  mults=[(i * 3 + 1) % 3 for i in range(16)])
    raise ValueError(spec.res_book)


def build_headers(spec: F1Spec) -> tuple[bytes, bytes, bytes]:
    # --- ident ---
    stereo = (spec.two_submaps or spec.three_modes_coupled
              or spec.type2_stereo)
    w = BitWriter().write_bytes(b"\x01vorbis")
    w.write_bits(0, 32)
    w.write_bits(2 if stereo else 1, 8)
    w.write_bits(spec.rate, 32)
    for _ in range(3):
        w.write_bits(0, 32)
    w.write_bits(spec.bs0_exp, 4)
    w.write_bits(spec.bs1_exp, 4)
    w.write_bits(1, 1)
    ident = w.getvalue()

    # --- comment ---
    w = BitWriter().write_bytes(b"\x03vorbis")
    w.write_bytes(struct.pack("<I", 0))
    w.write_bytes(struct.pack("<I", 0))
    w.write_bits(1, 1)
    comment = w.getvalue()

    # --- setup ---
    # codebooks: 0 = floor1 masterbook (8 scalar entries, unbalanced),
    # 1 = floor1 subclass y book, 2 = residue classbook, 3 = residue VQ
    master = CB(1, [2, 2, 3, 3, 4, 4, 4, 4])
    ybook = CB(1, [_ylen(spec.y_entries, i) for i in range(spec.y_entries)])
    classbook = CB(2, [2] * 4)
    resvq = _res_cb(spec)
    w = BitWriter().write_bytes(b"\x05vorbis")
    w.write_bits(4 - 1, 8)
    for cb in (master, ybook, classbook, resvq):
        write_codebook(w, cb)
    w.write_bits(0, 6)  # time count - 1
    w.write_bits(0, 16)  # time transform 0

    def write_floor(xs):
        w.write_bits(1, 16)  # floor type 1
        w.write_bits(2, 5)  # partitions
        w.write_bits(0, 4)  # partition 0 class
        w.write_bits(0, 4)  # partition 1 class
        # class 0: dim 3, subclasses 1 (cbits=1) -> masterbook cval < 8
        w.write_bits(3 - 1, 3)
        w.write_bits(1, 2)
        w.write_bits(0, 8)  # masterbook = codebook 0
        # subclass books (2^1 = 2 entries, +1 encoding; 0 means absent)
        w.write_bits(0 if spec.absent_subclass_book else 2, 8)  # slot 0
        w.write_bits(2, 8)  # slot 1 -> codebook 1
        w.write_bits(spec.multiplier - 1, 2)
        w.write_bits(spec.rangebits, 4)
        for x in xs:
            assert 0 < x < (1 << spec.rangebits)
            w.write_bits(x, spec.rangebits)

    def write_residue(end):
        w.write_bits(2 if spec.type2_stereo else 1, 16)  # residue type
        w.write_bits(spec.residue_begin, 24)
        w.write_bits(end, 24)
        w.write_bits(spec.partition_size - 1, 24)
        w.write_bits(2 - 1, 6)  # classifications
        w.write_bits(2, 8)  # classbook = codebook 2
        w.write_bits(0, 3)  # class 0 cascade: no books
        w.write_flag(False)
        w.write_bits(1, 3)  # class 1 cascade: pass-0 book
        w.write_flag(False)
        w.write_bits(3, 8)  # class 1 pass 0 -> codebook 3

    nsub = 2 if spec.two_submaps else 1
    w.write_bits(nsub - 1, 6)  # floor count - 1
    write_floor(spec.xs)
    if spec.two_submaps:
        write_floor(spec.xs2)
    w.write_bits(nsub - 1, 6)  # residue count - 1
    write_residue(spec.residue_end)
    if spec.two_submaps:
        write_residue(spec.residue_end2)
    # mapping
    if spec.three_modes_coupled:
        # TWO mappings over one floor/residue: M0 uncoupled, M1 with one
        # square-polar step (mag=ch0, ang=ch1)
        w.write_bits(1, 6)  # mapping count - 1
        for coupled in (False, True):
            w.write_bits(0, 16)  # mapping type 0
            w.write_flag(False)  # 1 submap
            if coupled:
                w.write_flag(True)
                w.write_bits(0, 8)  # coupling steps - 1
                w.write_bits(0, 1)  # magnitude = ch0 (ilog(C-1) = 1 bit)
                w.write_bits(1, 1)  # angle = ch1
            else:
                w.write_flag(False)
            w.write_bits(0, 2)
            w.write_bits(0, 8)  # time
            w.write_bits(0, 8)  # submap floor
            w.write_bits(0, 8)  # submap residue
        # modes: (short, M0), (short, M1), (long, M1)
        w.write_bits(2, 6)  # mode count - 1
        for bf, m in ((0, 0), (0, 1), (1, 1)):
            w.write_bits(bf, 1)
            w.write_bits(0, 16)
            w.write_bits(0, 16)
            w.write_bits(m, 8)
        w.write_bits(1, 1)
        return ident, comment, w.getvalue()
    w.write_bits(0, 6)
    w.write_bits(0, 16)
    if spec.two_submaps:
        w.write_flag(True)
        w.write_bits(nsub - 1, 4)
        w.write_flag(False)  # no coupling
        w.write_bits(0, 2)
        w.write_bits(0, 4)  # mux: ch0 -> submap 0
        w.write_bits(1, 4)  # mux: ch1 -> submap 1
        for sm in range(nsub):
            w.write_bits(0, 8)  # time
            w.write_bits(sm, 8)  # submap floor
            w.write_bits(sm, 8)  # submap residue
    else:
        w.write_flag(False)  # 1 submap
        w.write_flag(False)  # no coupling
        w.write_bits(0, 2)
        w.write_bits(0, 8)  # time
        w.write_bits(0, 8)  # submap floor
        w.write_bits(0, 8)  # submap residue
    # modes
    if spec.two_modes:
        w.write_bits(1, 6)  # 2 modes
        for bf in (0, 1):
            w.write_bits(bf, 1)
            w.write_bits(0, 16)
            w.write_bits(0, 16)
            w.write_bits(0, 8)
    else:
        w.write_bits(0, 6)  # 1 mode (short only; 0 mode-number bits!)
        w.write_bits(0, 1)
        w.write_bits(0, 16)
        w.write_bits(0, 16)
        w.write_bits(0, 8)
    w.write_bits(1, 1)
    return ident, comment, w.getvalue()


def _ylen(n: int, i: int) -> int:
    """Balanced lengths for the y book (n a power of two)."""
    L = ilog(n - 1)
    return L if (1 << L) == n else L + (0 if i < 2 * n - (1 << (L + 1)) else 0)


def _write_code(w: BitWriter, cb: CB, entry: int) -> None:
    code = cb.codes()[entry]
    assert code is not None, f"entry {entry} unused"
    w.write_huffman(*code)


def _is_long(spec: F1Spec, seed: int) -> bool:
    # two-modes: long every third packet; three-modes-coupled: mode
    # seed % 3 == 2 is the long/coupled one — same predicate
    return spec.two_modes and (seed % 3) == 2


def audio_packet(spec: F1Spec, seed: int, prev_long: bool,
                 next_long: bool) -> bytes:
    """One crafted packet. The post-value schedule sweeps benign, val>=room
    escape, and full-range (val up to y_entries-1 > floor range) cases —
    by seed, so a 40-packet stream covers them all."""
    rng = (seed * 2654435761 + 12345) & 0xFFFFFFFF
    master = CB(1, [2, 2, 3, 3, 4, 4, 4, 4])
    ybook = CB(1, [_ylen(spec.y_entries, i) for i in range(spec.y_entries)])
    classbook = CB(2, [2] * 4)
    resvq = _res_cb(spec)

    w = BitWriter()
    w.write_bits(0, 1)
    long_blk = _is_long(spec, seed)
    if spec.three_modes_coupled:
        # three modes: 0 short/uncoupled, 1 short/coupled, 2 long/coupled
        w.write_bits(seed % 3, 2)  # ilog(2) = 2 bits
    elif spec.two_modes:
        w.write_bits(1 if long_blk else 0, 1)  # ilog(1) = 1 bit
    # (single mode: zero mode bits)
    if long_blk:
        w.write_bits(1 if prev_long else 0, 1)
        w.write_bits(1 if next_long else 0, 1)

    # ---- floor1 (per channel for the complete-stereo variant) ----
    rng_max = [256, 128, 86, 64][spec.multiplier - 1]
    b = ilog(rng_max - 1)
    phase = seed % 4

    def write_floor(rng):
        w.write_flag(True)  # nonzero
        if phase == 0:  # benign small posts
            y0, y1 = 10 % rng_max, 30 % rng_max
            vals = [(rng >> (3 * i)) % 8 for i in range(6)]
        elif phase == 1:  # val >= room escapes (highroom/lowroom branches)
            y0, y1 = 2, rng_max - 3
            vals = [min(spec.y_entries - 1, rng_max - 1 - i)
                    for i in range(6)]
        elif phase == 2:  # full-range vals: val can exceed the floor range
            # -> render_point against huge neighbors wraps in u32 + clamps
            y0, y1 = 0, 1
            vals = [(spec.y_entries - 1 - 7 * i) % spec.y_entries
                    for i in range(6)]
        else:  # mixed
            y0, y1 = (rng >> 5) % rng_max, (rng >> 11) % rng_max
            vals = [(rng >> (2 * i + 1)) % spec.y_entries for i in range(6)]
        w.write_bits(y0, b)
        w.write_bits(y1, b)
        vi = 0
        for _part in range(2):  # partitions=2, class 0, cdim=3, cbits=1
            cval = (rng >> (7 + _part * 3)) & 7
            _write_code(w, master, cval)
            for d in range(3):
                bk = cval & 1
                cval >>= 1
                if bk == 0 and spec.absent_subclass_book:
                    vi += 1  # absent book: y decodes as 0, no bits
                    continue
                book = ybook  # both subclass slots point at the y book
                _write_code(w, book, vals[vi] % spec.y_entries)
                vi += 1

    nch = 2 if (spec.three_modes_coupled or spec.type2_stereo) else 1
    for ch in range(nch):
        write_floor(rng if ch == 0 else ((rng >> 7) | (rng << 9)) &
                    0xFFFFFFFF)

    # ---- residue (classwords/codewords interleave across the submap's
    # channels per spec 8.6.2; type 2 joins all channels into ONE
    # interleaved pseudo-channel, spec 8.6.4) ----
    n = (1 << spec.bs1_exp) if long_blk else (1 << spec.bs0_exp)
    res_nch = 1 if spec.type2_stereo else nch
    actual = n * nch // 2 if spec.type2_stereo else n // 2
    begin = min(spec.residue_begin, actual)
    end = min(spec.residue_end, actual)
    parts = (end - begin) // spec.partition_size
    # classbook dims=2: one classword covers 2 partitions
    usable = [i for i, c in enumerate(resvq.codes()) if c is not None]
    # ceil: when dims does not divide partition_size the decoder reads one
    # vector that crosses the partition boundary (res_book="dim3")
    vq_words = -(-spec.partition_size // resvq.dims)
    cls_ch = []  # per channel: partition class schedule
    for ch in range(res_nch):
        r = (rng >> ch) | (ch << 13)
        cls_ch.append([(r >> i) & 1 for i in range(parts)])
    ci = 0
    while ci < parts:
        for ch in range(res_nch):  # pass-0 classwords, channel-interleaved
            cls = cls_ch[ch]
            _write_code(w, classbook, cls[ci] * 2 +
                        (cls[ci + 1] if ci + 1 < parts else 0))
        for k in range(2):
            if ci + k >= parts:
                break
            for ch in range(res_nch):
                if cls_ch[ch][ci + k] == 1:
                    for i in range(vq_words):
                        # sweep the whole book incl. the deepest codewords
                        e = usable[(rng >> (2 * i + ci + k + ch)) %
                                   len(usable)] \
                            if phase != 2 else usable[-1 - (i % 2)]
                        _write_code(w, resvq, e)
        ci += 2
    return w.getvalue()


def build_stream(spec: F1Spec | None = None, n_packets: int = 40,
                 serial: int = 0xC4A57) -> bytes:
    """Complete Ogg stream for the spec; granules are real decoded-sample
    counts so libvorbisfile's length/truncation logic agrees."""
    spec = spec or F1Spec()
    ident, comment, setup = build_headers(spec)
    from lewton_tpu.audio import get_decoded_sample_count
    from lewton_tpu.header import read_header_ident, read_header_setup

    ident_h = read_header_ident(ident)
    setup_h = read_header_setup(setup, ident_h)
    pcks = [
        audio_packet(spec, i, i > 0 and _is_long(spec, i - 1),
                     i + 1 < n_packets and _is_long(spec, i + 1))
        for i in range(n_packets)
    ]
    pages = [ogg_page(serial, 0, 0, [ident], bos=True),
             ogg_page(serial, 1, 0, [comment, setup])]
    granule, seq, per_page = 0, 2, 8
    for i in range(0, n_packets, per_page):
        chunk = pcks[i : i + per_page]
        for j in range(i, i + len(chunk)):
            if j > 0:
                granule += get_decoded_sample_count(ident_h, setup_h, pcks[j])
        pages.append(ogg_page(serial, seq, granule, chunk,
                              eos=(i + per_page >= n_packets)))
        seq += 1
    return b"".join(pages)


VARIANTS = {
    "f1_base": F1Spec(),
    "f1_long_codewords": F1Spec(res_book="long"),
    "f1_ordered_book": F1Spec(res_book="ordered"),
    "f1_sparse_book": F1Spec(res_book="sparse"),
    "f1_sequence_p": F1Spec(res_book="seq_p"),
    "f1_absent_subclass": F1Spec(absent_subclass_book=True),
    "f1_mult4_range64": F1Spec(multiplier=4, rangebits=6,
                               xs=(8, 16, 24, 32, 40, 48)),
    "f1_bs64": F1Spec(bs0_exp=6, bs1_exp=6, two_modes=False,
                      residue_end=64),  # end > n/2: begin/end clamp
    "f1_bs8192": F1Spec(bs0_exp=13, bs1_exp=13, two_modes=False,
                        residue_end=512, partition_size=32),
    # stereo, TWO submaps: mux ch0->submap0/floorA/residueA,
    # ch1->submap1/floorB/residueB (different post layouts and ends) —
    # the mapping mux path (spec 4.2.4.2) no real encoder emits
    "f1_two_submaps": F1Spec(two_submaps=True),
    # mixed EXTREME blocksizes in one stream: 64-sample short blocks with
    # 8192-sample long blocks (window geometry corner + the Pallas kernel
    # gates' n0 fallback boundary)
    "f1_bs64_8192": F1Spec(bs0_exp=6, bs1_exp=13, residue_end=512,
                           partition_size=32),
    # multiplier 3 -> floor1 range 86 (the only non-power-of-two range)
    "f1_mult3_range86": F1Spec(multiplier=3),
    # residue begin > 0: every partition offset is begin-based
    "f1_begin32": F1Spec(residue_begin=32, residue_end=64),
    # residue VQ through a lookup-TYPE-1 codebook (lattice expansion)
    "f1_lookup1_book": F1Spec(res_book="lookup1"),
    # stereo, three modes over two mappings, square-polar coupling
    "f1_three_modes_coupled": F1Spec(three_modes_coupled=True),
    # stereo TYPE-2 residue with a dim-3 book and a lane-aligned end:
    # ceil(end/2)=128 lands exactly on the 128-lane w_eff boundary, and
    # dim 3 does not divide partition_size 32, so every partition's final
    # vector is read whole with its tail CLIPPED at the partition boundary
    # (libvorbis-oracle semantics, the one loop where lewton disagrees —
    # see residue.py). Before the partition-clip fix the native stereo
    # direct-write fast path accumulated the unclipped span and, at this
    # exact geometry, wrote past the channel row — a real heap overflow.
    "f1_type2_dim3_lane": F1Spec(bs0_exp=10, bs1_exp=10, two_modes=False,
                                 type2_stereo=True, res_book="dim3",
                                 residue_end=256, partition_size=32),
    # mono type-1 twin of the same geometry (end=128 exactly lane-aligned)
    "f1_dim3_lane": F1Spec(bs0_exp=9, bs1_exp=9, two_modes=False,
                           res_book="dim3", residue_end=128,
                           partition_size=32),
    # residue end NOT a multiple of partition_size: partitions_to_read
    # floors (spec 8.6.2), so the tail [begin+parts*psize, end) is never
    # decoded and must stay zero in every backend
    "f1_end_tail": F1Spec(residue_end=56),
}


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    for name, spec in VARIANTS.items():
        data = build_stream(spec)
        with open(f"{out}/{name}.ogg", "wb") as f:
            f.write(data)
        print(f"wrote {out}/{name}.ogg ({len(data)} bytes)")


# --------------------------------------------------------------------------- #
# Pathological Ogg lacing: continued packets, 255-multiples, zero-length
# --------------------------------------------------------------------------- #


def repage(data: bytes, max_segs: int = 4) -> bytes:
    """Re-page a single-stream Ogg file with tiny pages so packets span
    page boundaries (continued-packet flag, lacing 255 at page end) —
    container geometry the `ogg` crate handles via its own paths
    (reference depends on it; our two demuxers implement it from spec).

    Packet bytes and end-granule semantics are preserved: a page where no
    packet completes carries granule -1, like every real muxer.
    """
    from lewton_tpu.ogg import PacketReader

    r = PacketReader(data)
    pcks = []
    while (p := r.read_packet()) is not None:
        pcks.append(p)
    serial = pcks[0].stream_serial
    end_granule = pcks[-1].absgp_page

    from lewton_tpu.audio import get_decoded_sample_count
    from lewton_tpu.header import read_header_ident, read_header_setup

    ih = read_header_ident(pcks[0].data)
    sh = read_header_setup(pcks[2].data, ih)
    grans = []  # cumulative decoded samples at each packet's END
    cum = 0
    for i, p in enumerate(pcks):
        if i > 3:  # first audio packet primes the window
            cum += get_decoded_sample_count(ih, sh, p.data)
        grans.append(cum)
    if end_granule is not None:
        grans[-1] = end_granule  # preserve the original truncation point

    pages = []
    seq = 0

    def emit(segs, body, gran, bos=False, eos=False, continued=False):
        nonlocal seq
        header_type = (1 if continued else 0) | (2 if bos else 0) | \
            (4 if eos else 0)
        g = -1 if gran is None else gran
        header = struct.pack("<4sBBqIII", b"OggS", 0, header_type,
                             g, serial, seq, 0)
        header += bytes([len(segs)]) + bytes(segs)
        from lewton_tpu.ogg.demux import crc32_ogg

        crc = crc32_ogg(header + bytes(body))
        pages.append(header[:22] + struct.pack("<I", crc) + header[26:]
                     + bytes(body))
        seq += 1

    # header pages: ident alone (bos), then comment+setup
    emit([len(pcks[0].data)] if len(pcks[0].data) < 255 else None,
         pcks[0].data, 0, bos=True)
    hdr2 = bytearray()
    segs2 = []
    for p in pcks[1:3]:
        n = len(p.data)
        while n >= 255:
            segs2.append(255)
            n -= 255
        segs2.append(n)
        hdr2 += p.data
    emit(segs2, hdr2, 0)

    segs: list[int] = []
    body = bytearray()
    #: whether the page currently being filled STARTED mid-packet
    cur_continued = False
    last_complete: int | None = None
    audio = pcks[3:]
    for pi, p in enumerate(audio):
        n = len(p.data)
        off = 0
        lacing = []
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)
        for li, lv in enumerate(lacing):
            if len(segs) == max_segs:
                emit(segs, body, last_complete, continued=cur_continued)
                segs, body = [], bytearray()
                # the next page continues a packet iff bytes of the
                # current packet were already emitted
                cur_continued = off > 0 or li > 0
                last_complete = None
            segs.append(lv)
            body += p.data[off : off + lv]
            off += lv
            if li == len(lacing) - 1:
                last_complete = grans[3 + pi]
    emit(segs, body, last_complete, eos=True, continued=cur_continued)
    return b"".join(pages)

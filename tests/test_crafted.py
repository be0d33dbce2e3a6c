"""Crafted conformance streams (tools/craft.py) vs the libvorbis oracle.

Synthesizes the conformance space the generated corpus cannot reach — the
analog of the reference's pinned real-world asset suite
(dev/cmp/src/lib.rs:238-674): beta/RC-era codebook shapes, adversarial
floor1 posts, blocksize extremes. Golden PCM comes from libvorbisfile;
every backend must match within the +/-2 i16 LSB contract.

These vectors pin two deliberate libvorbis-over-lewton choices (libvorbis
is the conformance oracle):
- floor1 escape semantics (floor.py floor1_amplitudes): the reference's
  u32-wrap handling diverges from libvorbis on out-of-range posts;
- residue partition-crossing VQ vectors (residue.py): when a book's dim
  does not divide partition_size, libvorbis clips the vector's tail at
  the partition boundary while lewton adds it across (the *_dim3_lane
  variants exercise exactly this).
"""

import numpy as np
import pytest

from lewton_tpu.inside_ogg import OggStreamReader
from tools.craft import VARIANTS, build_stream


@pytest.fixture(scope="module")
def goldens(tmp_path_factory):
    from tools import vorbisref as vr

    root = tmp_path_factory.mktemp("crafted")
    out = {}
    for name, spec in VARIANTS.items():
        data = build_stream(spec)
        p = root / f"{name}.ogg"
        p.write_bytes(data)
        golden = vr.decode_file_i16(str(p))
        assert golden.shape[0] > 0
        # the adversarial phases must actually produce signal (a silent
        # stream would pass any comparison trivially)
        assert np.abs(golden).max() > 1000, name
        out[name] = (data, golden)
    return out


@pytest.mark.parametrize("backend", ["numpy", "native", "jax"])
@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_crafted_matches_libvorbis(goldens, name, backend):
    if backend == "native":
        from lewton_tpu import native

        if not native.available():
            pytest.skip("native library not built")
    data, golden = goldens[name]
    out = OggStreamReader(data, backend=backend).read_all_i16()
    assert out.shape == golden.shape
    d = np.abs(out.astype(np.int32) - golden.astype(np.int32))
    assert int((d > 2).sum()) == 0, f"max diff {d.max()}"


def test_escape_posts_actually_exercised():
    """The adversarial phases must hit the val>=room escapes and the
    out-of-range clamp — otherwise the vectors silently stop covering the
    divergent corner."""
    from lewton_tpu.floor import floor1_amplitudes, floor1_decode
    from lewton_tpu.bitpack import BitCursor
    from lewton_tpu.header import read_header_ident, read_header_setup
    from lewton_tpu.ogg import PacketReader
    from tools.craft import F1Spec

    data = build_stream(F1Spec())
    r = PacketReader(data)
    ident = read_header_ident(r.read_packet().data)
    r.read_packet()
    setup = read_header_setup(r.read_packet().data, ident)
    fl = setup.floors[0]
    saw_escape = saw_clamp = False
    while (p := r.read_packet()) is not None:
        cur = BitCursor(p.data)
        cur.read_bits(1)
        cur.read_bits(1)  # mode
        if cur.read_bits(2) is None:
            continue  # window flags for long mode read below as needed
        # (re-decode from scratch: simpler to just re-parse the floor)
        cur = BitCursor(p.data)
        cur.read_bits(1)
        mode_n = cur.read_bits(1)
        if setup.modes[mode_n].blockflag:
            cur.read_bits(2)
        try:
            y = floor1_decode(cur, setup.codebooks, fl)
        except Exception:  # noqa: BLE001 — floor-unused packets
            continue
        idx, used = floor1_amplitudes(y, fl)
        if (idx == 255).any():
            saw_clamp = True
        rng = 128  # multiplier 2
        if (np.asarray(y)[2:] >= rng).any():
            saw_escape = True
    assert saw_escape and saw_clamp


def test_vq_lookup_type_coverage():
    """The crafted residue program must route residues through BOTH VQ
    lookup types (1: lattice expansion, 2: direct table) end to end —
    libvorbisenc never emits lookup type 2 (the whole generated corpus is
    types 0/1, checked in test_conformance), so the crafted streams are
    the only end-to-end device exercise of type-2 residue books
    (VERDICT r3 #4a)."""
    from lewton_tpu.header import read_header_ident, read_header_setup
    from lewton_tpu.ogg import PacketReader
    from tools.craft import VARIANTS, build_stream as build

    seen: set[int] = set()
    for name in ("f1_base", "f1_lookup1_book"):
        data = build(VARIANTS[name])
        r = PacketReader(data)
        ident = read_header_ident(r.read_packet().data)
        r.read_packet()
        setup = read_header_setup(r.read_packet().data, ident)
        # the residue VQ book is the one its cascade actually references
        res = setup.residues[0]
        for row in res.books:
            for b in row:
                if b >= 0:
                    seen.add(setup.codebooks[b].lookup_type)
    assert {1, 2} <= seen, f"crafted residue books only cover {seen}"

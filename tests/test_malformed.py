"""Malformed-input robustness: errors, never crashes (fuzz-regression tier).

The reference pins 12 fuzzer-minimized files and asserts clean errors or
successful decode (lewton dev/cmp/tests/fuzzed.rs:14-49). Without network
access, this suite derives a deterministic corruption corpus from the
generated files: truncations, bit flips, header/lacing/CRC damage. Every
variant must either decode or raise VorbisError/OggError — any other
exception (or a crash) is a bug. The native backend must agree that the
input is decodable or not without crashing the process.
"""

import os

import numpy as np
import pytest

from lewton_tpu.errors import VorbisError
from lewton_tpu.inside_ogg import OggStreamReader


def _variants(data: bytes):
    rng = np.random.RandomState(1234)
    yield "trunc_header", data[:40]
    yield "trunc_mid", data[: len(data) // 2]
    yield "trunc_1byte", data[:-1]
    yield "empty", b""
    yield "garbage_prefix", b"\x00" * 100 + data
    for i in range(8):
        b = bytearray(data)
        pos = int(rng.randint(0, len(data)))
        b[pos] ^= 1 << int(rng.randint(0, 8))
        yield f"bitflip_{pos}", bytes(b)
    # corrupt the setup header region specifically (page 1 body)
    b = bytearray(data)
    for pos in range(120, min(200, len(b))):
        b[pos] ^= 0xA5
    yield "setup_scramble", bytes(b)


def _decode_all(data, backend):
    r = OggStreamReader(data, backend=backend)
    total = 0
    while True:
        pck = r.read_next_audio_packet()
        if pck is None:
            return total
        total += r.dec_packet_planar_f32(pck).shape[1]


@pytest.mark.parametrize("backend", ["numpy", "native"])
def test_malformed_never_crashes(corpus_dir, backend):
    if backend == "native":
        from lewton_tpu import native

        if not native.available():
            pytest.skip("native library not built")
    data = open(os.path.join(corpus_dir, "tiny_44k.ogg"), "rb").read()
    ok = bad = 0
    for name, variant in _variants(data):
        try:
            _decode_all(variant, backend)
            ok += 1
        except VorbisError:
            bad += 1
        except Exception as e:  # noqa: BLE001
            raise AssertionError(
                f"variant {name} raised non-Vorbis error: {type(e).__name__}: {e}"
            ) from e
    assert ok + bad == 14


def test_truncated_packets_decode_cleanly(corpus_dir):
    """EOP inside floors/residues is data, not error (spec 1.3.2): packets
    cut mid-body must still decode (zero-filled), matching the reference's
    graceful-degradation semantics."""
    path = os.path.join(corpus_dir, "stereo_44k_q3.ogg")
    r = OggStreamReader(path)
    pcks = []
    while (p := r.read_next_audio_packet()) is not None:
        pcks.append(p.data)
    from lewton_tpu.audio import PreviousWindowRight, read_audio_packet_generic

    pwr = PreviousWindowRight()
    decoded = 0
    for p in pcks[:20]:
        cut = p[: max(1, len(p) * 2 // 3)]
        try:
            out = read_audio_packet_generic(
                r.ident_hdr, r.setup_hdr, cut, pwr, fmt="planar_f32"
            )
            decoded += 1
        except VorbisError:
            pass
    assert decoded >= 15  # the vast majority must decode


def test_bad_audio_packet_errors(corpus_dir):
    path = os.path.join(corpus_dir, "tiny_44k.ogg")
    r = OggStreamReader(path)
    from lewton_tpu.audio import PreviousWindowRight, read_audio_packet
    from lewton_tpu.errors import AudioBadFormat, AudioIsHeader

    pwr = PreviousWindowRight()
    with pytest.raises(AudioIsHeader):
        read_audio_packet(r.ident_hdr, r.setup_hdr, b"\x01vorbis", pwr)
    with pytest.raises((AudioBadFormat,)):
        read_audio_packet(r.ident_hdr, r.setup_hdr, b"", pwr)


def test_native_asan_fuzz(corpus_dir):
    """Build the ASAN+UBSAN fuzz driver and run it over a seed file
    (memory-safety tier for the C++ half; the reference's is rustc)."""
    import subprocess

    native_dir = os.path.join(os.path.dirname(__file__), "..",
                              "lewton_tpu", "native")
    subprocess.run(["make", "-C", native_dir, "-s", "fuzz"], check=True)
    r = subprocess.run(
        [os.path.join(native_dir, "lt_fuzz"),
         os.path.join(corpus_dir, "tiny_44k.ogg")],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "without sanitizer findings" in r.stdout


def test_vq_expansion_bomb_rejected():
    """A ~35-byte crafted setup packet (ordered length list covering 65536
    entries, dims=65535, lookup type 1) used to request a multi-GB VQ
    expansion (entries x dims floats) with no packet backing. Both
    front-ends must reject it with a clean BadHeader — in particular the
    C++ side must not throw bad_alloc across the C ABI (that aborts the
    whole process, taking a serving scheduler down with it)."""
    from lewton_tpu.bitpack import ilog
    from lewton_tpu.errors import BadHeader
    from lewton_tpu.header import read_header_ident, read_header_setup
    from lewton_tpu.utils.bitwriter import BitWriter

    w = BitWriter().write_bytes(b"\x01vorbis")
    w.write_bits(0, 32)  # version
    w.write_bits(1, 8)  # channels
    w.write_bits(44100, 32)
    for _ in range(3):
        w.write_bits(0, 32)  # bitrates
    w.write_bits(7, 4)
    w.write_bits(8, 4)
    w.write_bits(1, 1)  # framing
    ident = w.getvalue()

    w = BitWriter().write_bytes(b"\x05vorbis")
    w.write_bits(0, 8)  # one codebook
    w.write_bits(0x564342, 24)  # sync
    w.write_bits(65535, 16)  # dims
    w.write_bits(1 << 16, 24)  # entries (all length 16 => Kraft sum = 1)
    w.write_flag(True)  # ordered length list
    w.write_bits(15, 5)  # initial length 16
    w.write_bits(1 << 16, ilog(1 << 16))  # one run covers every entry
    w.write_bits(1, 4)  # lookup type 1
    w.write_bits(0, 32)  # minimum
    w.write_bits(0, 32)  # delta
    w.write_bits(0, 4)  # value_bits = 1
    w.write_flag(False)  # sequence_p
    w.write_bits(0, 1)  # the single lookup1 mult (lookup1_values == 1)
    setup = w.getvalue()

    ih = read_header_ident(ident)
    with pytest.raises(BadHeader):
        read_header_setup(setup, ih)

    from lewton_tpu import native

    if native.available():
        with pytest.raises(BadHeader):
            native.NativeStream(ident, setup)


def test_random_packets_never_crash(corpus_dir):
    """Pure-random packet bytes against a real setup: both entropy
    front-ends must return cleanly (decode, unused floors, or VorbisError),
    and agree on the resulting frames."""
    import numpy as np

    from lewton_tpu import native
    from lewton_tpu.audio import decode_packet_entropy
    from lewton_tpu.inside_ogg import read_headers
    from lewton_tpu.models.decoder import compile_setup, pack_frames
    from lewton_tpu.ogg import PacketReader

    data = open(os.path.join(corpus_dir, "stereo_44k_q3.ogg"), "rb").read()
    headers, serial = read_headers(PacketReader(data))
    cs = compile_setup(headers.ident, headers.setup)
    rng = np.random.RandomState(99)
    pcks = []
    for i in range(60):
        n = int(rng.randint(1, 400))
        b = bytearray(rng.randint(0, 256, n, dtype=np.uint8).tobytes())
        b[0] &= 0xFE  # audio-packet bit clear so it parses as audio
        pcks.append(bytes(b))
    # python front-end
    plans = []
    py_status = []
    for p in pcks:
        try:
            plans.append(decode_packet_entropy(headers.ident, headers.setup, p))
            py_status.append(0)
        except VorbisError:
            plans.append(None)
            py_status.append(2)
    if native.available():
        ns = native.NativeStream(headers.raw_ident, headers.raw_setup)
        ns.frame_width = cs.w_eff
        fr_nat, status = ns.decode_chunk(pcks)
        assert list(status[: len(pcks)] > 1) == [s == 2 for s in py_status]
        ok_plans = [pl for pl in plans if pl is not None]
        fr_py = pack_frames(cs, ok_plans, len(ok_plans))
        # compare frames for the packets both decoders accepted
        j = 0
        for i, pl in enumerate(plans):
            if pl is None:
                continue
            np.testing.assert_array_equal(
                fr_py["residue"][j], fr_nat["residue"][i], err_msg=f"pkt {i}")
            j += 1


def _tiny_ident():
    from lewton_tpu.utils.bitwriter import BitWriter

    w = BitWriter().write_bytes(b"\x01vorbis")
    w.write_bits(0, 32)
    w.write_bits(1, 8)
    w.write_bits(44100, 32)
    for _ in range(3):
        w.write_bits(0, 32)
    w.write_bits(7, 4)
    w.write_bits(8, 4)
    w.write_bits(1, 1)
    return w.getvalue()


def test_dim0_vq_codebook_rejected():
    """A lookup-type-2 codebook with dimensions == 0 must be rejected at
    header parse (libvorbis rejects dim < 1): it used to produce a
    zero-width VQ table that passed the residue/floor0 book checks and
    then divided by zero (python) or read vec[-1] before the table
    (native heap OOB) at decode time."""
    from lewton_tpu.errors import BadHeader
    from lewton_tpu.header import read_header_ident, read_header_setup
    from lewton_tpu.utils.bitwriter import BitWriter

    ident = _tiny_ident()
    w = BitWriter().write_bytes(b"\x05vorbis")
    w.write_bits(0, 8)  # one codebook
    w.write_bits(0x564342, 24)
    w.write_bits(0, 16)  # dims = 0
    w.write_bits(2, 24)  # entries = 2
    w.write_flag(False)  # not ordered
    w.write_flag(False)  # not sparse
    w.write_bits(0, 5)  # length 1
    w.write_bits(0, 5)  # length 1
    w.write_bits(2, 4)  # lookup type 2
    w.write_bits(0, 32)  # minimum
    w.write_bits(0, 32)  # delta
    w.write_bits(0, 4)  # value_bits = 1
    w.write_flag(False)  # sequence_p
    # lookup_values = entries * dims = 0 -> no mults follow
    setup = w.getvalue()

    ih = read_header_ident(ident)
    with pytest.raises(BadHeader):
        read_header_setup(setup, ih)
    from lewton_tpu import native

    if native.available():
        with pytest.raises(BadHeader):
            native.NativeStream(ident, setup)


def test_huge_entries_no_backing_rejected_quickly():
    """entries = 2^24-1 in a ~40-byte non-ordered codebook must fail as a
    truncated header WITHOUT first allocating a 16.7M-element length
    list (memory-amplification guard, both front-ends)."""
    from lewton_tpu.errors import BadHeader
    from lewton_tpu.header import read_header_ident, read_header_setup
    from lewton_tpu.utils.bitwriter import BitWriter

    ident = _tiny_ident()
    w = BitWriter().write_bytes(b"\x05vorbis")
    w.write_bits(0, 8)
    w.write_bits(0x564342, 24)
    w.write_bits(2, 16)  # dims
    w.write_bits((1 << 24) - 1, 24)  # entries
    w.write_flag(False)  # not ordered -> every entry needs >= 1 bit
    setup = w.getvalue()

    ih = read_header_ident(ident)
    with pytest.raises(BadHeader):
        read_header_setup(setup, ih)
    from lewton_tpu import native

    if native.available():
        with pytest.raises(BadHeader):
            native.NativeStream(ident, setup)


def test_empty_codebook_decodes_as_eop():
    """Decoding from a codebook with no used entries behaves like
    end-of-packet (libvorbis: vorbis_book_decode returns -1 -> residue
    keeps partial zeros), matching the native backend — it used to raise
    HuffmanError (a HeaderError!) out of the audio path."""
    from lewton_tpu.bitpack import BitCursor
    from lewton_tpu.errors import EndOfPacket
    from lewton_tpu.huffman import HuffmanTree

    for lengths in ([], [0, 0, 0]):
        t = HuffmanTree(lengths)
        assert t.empty
        with pytest.raises(EndOfPacket):
            BitCursor(b"\xff\xff\xff").read_huffman(t)

"""Native (C++) host front-end parity vs the Python reference front-end.

The native library must produce byte-identical dense frames: same Huffman
decode, same residue accumulation order (f32), same floor posts. Ogg demux
must produce identical packets and metadata.
"""

import os
import subprocess

import numpy as np
import pytest

from lewton_tpu import native
from lewton_tpu.inside_ogg import read_headers
from lewton_tpu.models.decoder import compile_setup, pack_frames
from lewton_tpu.ogg import PacketReader
from lewton_tpu.audio import decode_packet_entropy

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "lewton_tpu", "native")


@pytest.fixture(scope="module", autouse=True)
def build_native():
    subprocess.run(["make", "-C", NATIVE_DIR, "-s"], check=True)
    assert native.available()


NAMES = [
    "mono_8k_q-1",
    "stereo_44k_q3",
    "stereo_44k_q10",
    "ch6_44k_q3",
    "stereo_44k_managed",
    "tiny_44k",
    "impulses_44k",
]


def _load(path):
    with open(path, "rb") as f:
        return f.read()


@pytest.mark.parametrize("name", NAMES)
def test_demux_parity(corpus_dir, name):
    data = _load(os.path.join(corpus_dir, name + ".ogg"))
    py = []
    rdr = PacketReader(data)
    while (p := rdr.read_packet()) is not None:
        py.append(p)
    nat = native.demux(data)
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert a.data == b.data
        assert a.stream_serial == b.stream_serial
        assert a.first_in_stream == b.first_in_stream
        assert a.last_in_stream == b.last_in_stream
        assert a.first_in_page == b.first_in_page
        assert a.last_in_page == b.last_in_page
        assert a.absgp_page == b.absgp_page
        assert a.page_granule == b.page_granule


@pytest.mark.parametrize("name", NAMES)
def test_entropy_parity(corpus_dir, name):
    data = _load(os.path.join(corpus_dir, name + ".ogg"))
    rdr = PacketReader(data)
    headers, serial = read_headers(rdr)
    # re-demux for the raw header packets (native needs ident+setup bytes)
    pcks = [p for p in native.demux(data) if p.stream_serial == serial]
    ident_pck, setup_pck = pcks[0].data, pcks[2].data
    audio_pcks = [p.data for p in pcks[3:]]

    ns = native.NativeStream(ident_pck, setup_pck)
    assert ns.channels == headers.ident.channels
    assert ns.n0 == headers.ident.bs0 and ns.n1 == headers.ident.bs1

    cs = compile_setup(headers.ident, headers.setup)
    assert ns.max_posts == cs.max_posts
    assert ns.f0_order_max == cs.f0_order_max
    ns.frame_width = cs.w_eff  # residue rows at the effective extent
    if cs.residue_i16:
        ns.residue_dtype = np.int16  # match the cs-driven transport dtype

    T = len(audio_pcks)
    fr_nat, status = ns.decode_chunk(audio_pcks)
    assert (status[:T] == 0).all()

    plans = [
        decode_packet_entropy(headers.ident, headers.setup, p)
        for p in audio_pcks
    ]
    fr_py = pack_frames(cs, plans, T)
    for k in fr_py:
        a, b = fr_py[k], fr_nat[k]
        assert a.dtype == b.dtype, k
        if a.dtype == np.float32:
            np.testing.assert_array_equal(a, b, err_msg=k)
        else:
            assert np.array_equal(a, b), k


def test_packet_spans_zero_copy_batch_parity(corpus_dir):
    """decode_chunk_batch_view (PacketSpans zero-copy path) must produce
    byte-identical frames to the list-of-bytes batch entry."""
    import numpy as np

    from lewton_tpu import native
    from lewton_tpu.inside_ogg import read_headers
    from lewton_tpu.models.decoder import StreamDecoder
    from lewton_tpu.ogg import PacketReader

    data = open(os.path.join(corpus_dir, "stereo_44k_q3.ogg"), "rb").read()
    rdr = PacketReader(data)
    headers, _ = read_headers(rdr)
    spans, _, _, _, _ = native.demux_spans(data)
    audio_spans = spans[3:]
    audio_bytes = [audio_spans[i] for i in range(len(audio_spans))]
    assert isinstance(audio_bytes[0], bytes)

    sd = StreamDecoder(headers.ident, headers.setup, chunk=32,
                       raw_headers=(headers.raw_ident, headers.raw_setup))
    S = 3
    fr_bytes = sd.entropy_chunk_batch([audio_bytes[:32]] * S)
    fr_spans = sd.entropy_chunk_batch([audio_spans[:32]] * S)
    assert set(fr_bytes) == set(fr_spans)
    for k in fr_bytes:
        np.testing.assert_array_equal(fr_bytes[k], fr_spans[k], err_msg=k)


def test_interleaved_residue_decode_parity(corpus_dir, monkeypatch):
    """LT_ILEAVE_K > 1 routes chunks through the round-robin lane driver
    (decode_chunk_ileave, an opt-in experiment — measured slower on this
    host, see PERF.md r4); its frames must be byte-identical to the
    sequential path's, for both f32 and i16 residue transports."""
    from lewton_tpu.models.decoder import StreamDecoder

    data = open(os.path.join(corpus_dir, "stereo_44k_q3.ogg"), "rb").read()
    rdr = PacketReader(data)
    headers, _ = read_headers(rdr)
    spans, _, _, _, _ = native.demux_spans(data)
    audio = spans[3:]
    sd = StreamDecoder(headers.ident, headers.setup, chunk=48,
                       raw_headers=(headers.raw_ident, headers.raw_setup))
    for dtype in (None, np.float32):  # setup default (i16 here) and f32
        if dtype is not None:
            sd._native.residue_dtype = dtype
        monkeypatch.setenv("LT_ILEAVE_K", "0")
        seq = sd.entropy_chunk_batch([audio[:48]] * 2)
        monkeypatch.setenv("LT_ILEAVE_K", "4")
        ilv = sd.entropy_chunk_batch([audio[:48]] * 2)
        assert set(seq) == set(ilv)
        for k in seq:
            np.testing.assert_array_equal(seq[k], ilv[k], err_msg=k)

"""Grouped (multiplexed) Ogg: pages of concurrent logical streams
interleaved. The demuxer must route packets by serial and the stream
reader must decode its own serial, skipping others
(ref: lewton inside_ogg read_headers serial filtering + the ogg crate's
multiplexing support)."""

import os

import numpy as np

from lewton_tpu.inside_ogg import OggStreamReader


def _split_pages(data: bytes) -> list[bytes]:
    pages = []
    off = 0
    while off < len(data):
        assert data[off : off + 4] == b"OggS"
        nsegs = data[off + 26]
        lacing = data[off + 27 : off + 27 + nsegs]
        body = sum(lacing)
        end = off + 27 + nsegs + body
        pages.append(data[off:end])
        off = end
    return pages


def _interleave(a: bytes, b: bytes) -> bytes:
    pa, pb = _split_pages(a), _split_pages(b)
    # BOS pages of all streams must come first (Ogg grouping rule)
    out = [pa[0], pb[0]]
    ia, ib = 1, 1
    turn = 0
    while ia < len(pa) or ib < len(pb):
        if turn % 3 != 2 and ia < len(pa):
            out.append(pa[ia])
            ia += 1
        elif ib < len(pb):
            out.append(pb[ib])
            ib += 1
        else:
            out.append(pa[ia])
            ia += 1
        turn += 1
    return b"".join(out)


def test_multiplexed_decodes_first_stream(corpus_dir):
    a = open(os.path.join(corpus_dir, "stereo_44k_q3.ogg"), "rb").read()
    b = open(os.path.join(corpus_dir, "mono_8k_q-1.ogg"), "rb").read()
    muxed = _interleave(a, b)
    solo = OggStreamReader(a).read_all_i16()
    got = OggStreamReader(muxed).read_all_i16()
    np.testing.assert_array_equal(solo, got)


def test_multiplexed_native_backend(corpus_dir):
    from lewton_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    a = open(os.path.join(corpus_dir, "tiny_44k.ogg"), "rb").read()
    b = open(os.path.join(corpus_dir, "mono_8k_q-1.ogg"), "rb").read()
    muxed = _interleave(a, b)
    solo = OggStreamReader(a, backend="native").read_all_i16()
    got = OggStreamReader(muxed, backend="native").read_all_i16()
    np.testing.assert_array_equal(solo, got)


def test_junk_between_pages_resyncs(corpus_dir):
    """Garbage between pages must be skipped by capture-pattern resync
    (both demuxers), like the ogg crate's recapture behavior."""
    data = open(os.path.join(corpus_dir, "tiny_44k.ogg"), "rb").read()
    pages = _split_pages(data)
    junky = b"JUNK" * 7 + pages[0] + b"\x00" * 33
    for i, p in enumerate(pages[1:]):
        junky += p + (b"OggX" * (i % 3))  # near-capture junk too
    want = OggStreamReader(data).read_all_i16()
    got = OggStreamReader(junky).read_all_i16()
    np.testing.assert_array_equal(want, got)
    from lewton_tpu.ogg.demux import PacketReader as PyReader

    # force the pure-python demuxer as well
    got_py = OggStreamReader(PyReader(junky)).read_all_i16()
    np.testing.assert_array_equal(want, got_py)

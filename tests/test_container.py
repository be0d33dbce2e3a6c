"""Ogg container edge cases: continued packets, lacing boundaries,
zero-length packets, chained links with different geometry.

The reference outsources all of this to the external `ogg` crate; both of
our demuxers (python ogg/demux.py, native lt_ogg.cc) implement it from
spec, so the edges need their own vectors.
"""

import os

import numpy as np
import pytest

from lewton_tpu.inside_ogg import OggStreamReader
from lewton_tpu.ogg import PacketReader
from tools.craft import repage
from tools.floor0_stream import ogg_page

BACKENDS = ["numpy", "native", "jax"]


def _skip_native(backend):
    if backend == "native":
        from lewton_tpu import native

        if not native.available():
            pytest.skip("native library not built")


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("max_segs", [2, 7])
def test_continued_packets_decode(corpus_dir, backend, max_segs):
    """Packets spanning pages (continuation flag, 255-lacing at page end)
    must decode identically to the original paging. libvorbis agrees the
    repaged container is equivalent (validated when goldens were made)."""
    _skip_native(backend)
    path = os.path.join(corpus_dir, "stereo_44k_q3.ogg")
    data = open(path, "rb").read()
    golden = np.load(os.path.join(corpus_dir, "stereo_44k_q3.golden.npy"))
    rp = repage(data, max_segs=max_segs)
    out = OggStreamReader(rp, backend=backend).read_all_i16()
    assert out.shape == golden.shape
    d = np.abs(out.astype(np.int32) - golden.astype(np.int32))
    assert int((d > 2).sum()) == 0, f"max diff {d.max()}"


def test_repaged_packets_identical(corpus_dir):
    """Both demuxers must reassemble byte-identical packets from the
    pathological paging."""
    from lewton_tpu import native

    data = open(os.path.join(corpus_dir, "stereo_44k_q3.ogg"), "rb").read()
    rp = repage(data, max_segs=2)

    def plist(d):
        out = []
        r = PacketReader(d)
        while (p := r.read_packet()) is not None:
            out.append(p.data)
        return out

    orig, re_py = plist(data), plist(rp)
    assert orig == re_py
    if native.available():
        assert [p.data for p in native.demux(rp)] == orig


def test_lacing_boundaries_parity():
    """Exact-255-multiple packets (0-lace terminator) and zero-length
    packets round-trip both demuxers identically (codec-agnostic layer)."""
    from lewton_tpu import native

    pcks = [b"\x10" * 255, b"", b"\x22" * 510, b"\x33" * 100, b"",
            b"\x44" * 254, b"\x55" * 256]
    pages = [ogg_page(7, 0, 0, pcks[:2], bos=True),
             ogg_page(7, 1, 1, pcks[2:5]),
             ogg_page(7, 2, 2, pcks[5:], eos=True)]
    data = b"".join(pages)
    got = []
    r = PacketReader(data)
    while (p := r.read_packet()) is not None:
        got.append(p.data)
    assert got == pcks
    if native.available():
        assert [p.data for p in native.demux(data)] == pcks


@pytest.mark.parametrize("backend", BACKENDS)
def test_chained_mixed_geometry(tmp_path, backend):
    """Chained links that CHANGE channel count and sample rate: the
    decoder re-initializes per link; whole-stream reads pad narrower
    links to the widest channel count."""
    _skip_native(backend)
    from tools import vorbisref as vr
    from tools.corpus import _music

    pcm_mono = _music(8000, 0.4, 1, seed=5)
    pcm_st = _music(44100, 0.3, 2, seed=6)
    a = vr.encode(pcm_mono, 8000, quality=0.2, serial=111)
    b = vr.encode(pcm_st, 44100, quality=0.4, serial=222)
    pa, pb = tmp_path / "a.ogg", tmp_path / "b.ogg"
    pa.write_bytes(a)
    pb.write_bytes(b)
    ga = vr.decode_file_i16(str(pa))  # [n, 1]
    gb = vr.decode_file_i16(str(pb))  # [m, 2]

    out = OggStreamReader(a + b, backend=backend).read_all_i16()  # [n+m, 2]
    assert out.shape == (ga.shape[0] + gb.shape[0], 2)
    d1 = np.abs(out[: ga.shape[0], :1].astype(np.int32) - ga.astype(np.int32))
    assert int((d1 > 2).sum()) == 0, f"link1 max diff {d1.max()}"
    assert not out[: ga.shape[0], 1].any()  # mono link padded with zeros
    d2 = np.abs(out[ga.shape[0]:].astype(np.int32) - gb.astype(np.int32))
    assert int((d2 > 2).sum()) == 0, f"link2 max diff {d2.max()}"


@pytest.mark.parametrize("backend", BACKENDS)
def test_chained_rate_change_per_packet_api(tmp_path, backend):
    """The per-packet API exposes the new ident header after a chain
    re-init (ref: lewton src/inside_ogg.rs chained handling)."""
    _skip_native(backend)
    from tools import vorbisref as vr
    from tools.corpus import _music

    a = vr.encode(_music(8000, 0.3, 1, seed=7), 8000, quality=0.2, serial=31)
    b = vr.encode(_music(16000, 0.3, 1, seed=8), 16000, quality=0.2,
                  serial=32)
    r = OggStreamReader(a + b, backend=backend)
    assert r.ident_hdr.sample_rate == 8000
    rates = set()
    while r.read_dec_packet() is not None:
        rates.add(r.ident_hdr.sample_rate)
    assert rates == {8000, 16000}

"""Header decode tests: real encoded files + synthetic malformed packets."""

import json
import os

import numpy as np
import pytest

from lewton_tpu import header as H
from lewton_tpu.errors import (
    BadHeader,
    HeaderError,
    HeaderIsAudio,
    NotVorbisHeader,
)
from lewton_tpu.ogg import PacketReader
from lewton_tpu.utils.bitwriter import BitWriter


def _headers(corpus_dir, name):
    data = open(os.path.join(corpus_dir, name + ".ogg"), "rb").read()
    r = PacketReader(data)
    return [r.read_packet_expected().data for _ in range(3)]


def test_parse_all_corpus_headers(corpus_dir):
    for f in sorted(os.listdir(corpus_dir)):
        if not f.endswith(".ogg"):
            continue
        name = f[:-4]
        p1, p2, p3 = _headers(corpus_dir, name)
        ident = H.read_header_ident(p1)
        comment = H.read_header_comment(p2)
        setup = H.read_header_setup(p3, ident)
        meta = json.load(open(os.path.join(corpus_dir, name + ".json")))
        assert ident.channels == meta["channels"]
        assert ident.sample_rate == meta["rate"]
        assert comment.vendor.startswith("Xiph.Org")
        assert ("ENCODER", "lewton_tpu corpus") in comment.comment_list
        assert len(setup.modes) >= 1
        for m in setup.modes:
            assert m.blockflag in (0, 1)
        for cb in setup.codebooks:
            if cb.vq is not None:
                assert cb.vq.shape == (cb.entries, cb.dimensions)
                assert cb.vq.dtype == np.float32
                assert np.isfinite(cb.vq).all()


def test_lookup1_values():
    # ref parity: lewton src/header.rs:650-670 edge cases
    assert H.lookup1_values(1, 1) == 1
    assert H.lookup1_values(8, 3) == 2
    assert H.lookup1_values(26, 3) == 2
    assert H.lookup1_values(27, 3) == 3
    assert H.lookup1_values(64, 2) == 8
    assert H.lookup1_values(63, 2) == 7
    assert H.lookup1_values(2**24 - 1, 1) == 2**24 - 1


def test_ident_rejections(corpus_dir):
    p1, _, _ = _headers(corpus_dir, "stereo_44k_q3")
    with pytest.raises(NotVorbisHeader):
        H.read_header_ident(b"\x01vorbiX" + p1[7:])
    with pytest.raises(HeaderIsAudio):
        H.read_header_ident(b"\x00" + p1[1:])
    with pytest.raises(BadHeader):
        H.read_header_ident(b"\x03" + p1[1:])  # wrong header type
    with pytest.raises(HeaderError):
        H.read_header_ident(p1[:10])  # truncated
    # version != 0
    bad = bytearray(p1)
    bad[7] = 9
    with pytest.raises(HeaderError):
        H.read_header_ident(bytes(bad))
    # zero channels
    bad = bytearray(p1)
    bad[11] = 0
    with pytest.raises(BadHeader):
        H.read_header_ident(bytes(bad))


def _ident_packet(channels=2, rate=44100, bs0=8, bs1=11, framing=1):
    w = BitWriter()
    w.write_bytes(b"\x01vorbis")
    w.write_bits(0, 32)
    w.write_bits(channels, 8)
    w.write_bits(rate, 32)
    for _ in range(3):
        w.write_bits(0, 32)
    w.write_bits(bs0, 4)
    w.write_bits(bs1, 4)
    w.write_bits(framing, 1)
    return w.getvalue()


def test_synthetic_ident():
    ident = H.read_header_ident(_ident_packet())
    assert (ident.channels, ident.sample_rate) == (2, 44100)
    assert (ident.bs0, ident.bs1) == (256, 2048)
    with pytest.raises(BadHeader):
        H.read_header_ident(_ident_packet(bs0=12, bs1=8))  # bs0 > bs1
    with pytest.raises(BadHeader):
        H.read_header_ident(_ident_packet(bs0=5))  # too small
    with pytest.raises(BadHeader):
        H.read_header_ident(_ident_packet(bs1=14))  # too large
    with pytest.raises(BadHeader):
        H.read_header_ident(_ident_packet(framing=0))


def test_comment_tolerates_junk():
    # entry without '=' is skipped; non-UTF8 is lossily decoded
    def comment_packet(entries):
        w = BitWriter().write_bytes(b"\x03vorbis")
        vendor = b"test"
        w.write_bits(len(vendor), 32).write_bytes(vendor)
        w.write_bits(len(entries), 32)
        for e in entries:
            w.write_bits(len(e), 32).write_bytes(e)
        w.write_bits(1, 1)
        return w.getvalue()

    c = H.read_header_comment(
        comment_packet([b"TITLE=x", b"nonsense", b"K=\xff\xfe\xfd"])
    )
    assert c.vendor == "test"
    assert ("TITLE", "x") in c.comment_list
    assert len(c.comment_list) == 2  # 'nonsense' skipped
    with pytest.raises(BadHeader):
        H.read_header_comment(comment_packet([b"A=b"])[:-2])  # truncated


def test_setup_bad_sync(corpus_dir):
    p1, _, p3 = _headers(corpus_dir, "stereo_44k_q3")
    ident = H.read_header_ident(p1)
    bad = bytearray(p3)
    bad[8] ^= 0xFF  # corrupt first codebook sync region
    with pytest.raises(HeaderError):
        H.read_header_setup(bytes(bad), ident)


def test_setup_truncation_is_clean_error(corpus_dir):
    p1, _, p3 = _headers(corpus_dir, "stereo_44k_q3")
    ident = H.read_header_ident(p1)
    for cut in (8, 30, 100, len(p3) // 2, len(p3) - 2):
        with pytest.raises(HeaderError):
            H.read_header_setup(p3[:cut], ident)


def test_setup_fuzz_never_crashes(corpus_dir):
    import random

    p1, _, p3 = _headers(corpus_dir, "stereo_44k_q3")
    ident = H.read_header_ident(p1)
    rng = random.Random(42)
    survived = 0
    for _ in range(150):
        bad = bytearray(p3)
        for _ in range(rng.randint(1, 8)):
            bad[rng.randrange(8, len(bad))] ^= 1 << rng.randrange(8)
        try:
            H.read_header_setup(bytes(bad), ident)
            survived += 1
        except HeaderError:
            pass
    # most mutations break something; decoding "succeeding" is fine too
    assert survived < 150


def test_floor1_neighbors(corpus_dir):
    p1, _, p3 = _headers(corpus_dir, "stereo_44k_q3")
    setup = H.read_header_setup(p3, H.read_header_ident(p1))
    for fl in setup.floors:
        assert fl.floor_type == 1
        x = np.asarray(fl.x_list)
        for i in range(2, len(x)):
            lo, hi = fl.low_neighbors[i], fl.high_neighbors[i]
            assert lo < i and hi < i
            assert x[lo] < x[i] < x[hi]
            # maximal / minimal among earlier entries
            for j in range(i):
                if x[j] < x[i]:
                    assert x[j] <= x[lo]
                if x[j] > x[i]:
                    assert x[j] >= x[hi]
        # sorted order is a permutation sorting x
        assert (np.diff(x[fl.sort_order]) > 0).all()

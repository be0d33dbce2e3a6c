"""Audio-packet decode unit tests: floor helpers, sample counts, error paths."""

import os
import random

import numpy as np
import pytest

from lewton_tpu import header as H
from lewton_tpu.audio import (
    PreviousWindowRight,
    get_decoded_sample_count,
    read_audio_packet,
)
from lewton_tpu.errors import AudioError, AudioIsHeader, VorbisError
from lewton_tpu.floor import render_point
from lewton_tpu.ogg import PacketReader


def _stream(corpus_dir, name):
    data = open(os.path.join(corpus_dir, name + ".ogg"), "rb").read()
    r = PacketReader(data)
    pkts = []
    while (p := r.read_packet()) is not None:
        pkts.append(p.data)
    ident = H.read_header_ident(pkts[0])
    setup = H.read_header_setup(pkts[2], ident)
    return ident, setup, pkts[3:]


def test_render_point_reference_vectors():
    # real-file vectors (ref: lewton src/audio.rs:369-389)
    assert render_point(0, 28, 128, 67, 12) == 31
    assert render_point(12, 38, 128, 67, 46) == 46
    assert render_point(0, 28, 12, 38, 4) == 31
    assert render_point(4, 33, 12, 38, 8) == 35
    assert render_point(12, 38, 46, 31, 16) == 38
    assert render_point(16, 30, 46, 31, 23) == 30
    assert render_point(23, 40, 46, 31, 33) == 37
    assert render_point(46, 31, 128, 67, 70) == 41
    assert render_point(70, 20, 128, 67, 90) == 36


def test_sample_count_matches_decode(corpus_dir):
    ident, setup, packets = _stream(corpus_dir, "stereo_44k_q3")
    pwr = PreviousWindowRight()
    for pck in packets[:40]:
        want = get_decoded_sample_count(ident, setup, pck)
        got = read_audio_packet(ident, setup, pck, pwr).shape[1]
        if got == 0:  # first packet primes the window
            continue
        assert got == want


def test_header_packet_rejected(corpus_dir):
    ident, setup, _ = _stream(corpus_dir, "stereo_44k_q3")
    with pytest.raises(AudioIsHeader):
        read_audio_packet(ident, setup, b"\x01vorbis", PreviousWindowRight())


def test_empty_and_garbage_packets(corpus_dir):
    ident, setup, _ = _stream(corpus_dir, "stereo_44k_q3")
    rng = random.Random(7)
    for _ in range(100):
        blob = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 40)))
        pwr = PreviousWindowRight()
        try:
            out = read_audio_packet(ident, setup, blob, pwr)
            assert out.dtype == np.int16
        except VorbisError:
            pass  # clean errors only


def test_truncated_audio_packets_decode_gracefully(corpus_dir):
    # EOP inside floor/residue is data, not an error (ref audio.rs:94-105,
    # 655-660): truncated packets must still produce samples.
    ident, setup, packets = _stream(corpus_dir, "stereo_44k_q3")
    pwr = PreviousWindowRight()
    read_audio_packet(ident, setup, packets[0], pwr)
    pck = packets[1]
    for cut in (1, 2, 5, len(pck) // 2):
        pwr2 = PreviousWindowRight()
        pwr2.data = None if pwr.data is None else pwr.data.copy()
        try:
            out = read_audio_packet(ident, setup, pck[:cut], pwr2)
            assert out.shape[1] > 0
        except VorbisError:
            pass  # a clean error is also acceptable for pathological cuts


def test_first_packet_yields_zero_samples(corpus_dir):
    ident, setup, packets = _stream(corpus_dir, "stereo_44k_q3")
    pwr = PreviousWindowRight()
    out = read_audio_packet(ident, setup, packets[0], pwr)
    assert out.shape == (ident.channels, 0)
    assert not pwr.is_empty()


def test_fuzz_bitflips_never_crash(corpus_dir):
    ident, setup, packets = _stream(corpus_dir, "stereo_44k_q3")
    rng = random.Random(123)
    pwr = PreviousWindowRight()
    read_audio_packet(ident, setup, packets[0], pwr)
    base = bytearray(packets[1])
    for _ in range(60):
        mutated = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            mutated[rng.randrange(len(mutated))] ^= 1 << rng.randrange(8)
        pwr2 = PreviousWindowRight()
        pwr2.data = pwr.data.copy()
        try:
            read_audio_packet(ident, setup, bytes(mutated), pwr2)
        except VorbisError:
            pass

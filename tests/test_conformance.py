"""Conformance tier: decode the corpus, compare against libvorbis goldens.

The contract is the reference's (lewton dev/cmp/src/lib.rs:148-155): every
sample within +/-2 i16 LSB of libvorbis output, zero mismatching samples
allowed. We additionally require exact length match (the reference's harness
is packet-border-insensitive; ours is stricter).
"""

import json
import os

import numpy as np
import pytest

from lewton_tpu.inside_ogg import OggStreamReader

NAMES = [
    "mono_8k_q-1",
    "mono_16k_q3",
    "stereo_44k_q3",
    "stereo_44k_q10",
    "stereo_48k_q5",
    "stereo_96k_q6",
    "ch6_44k_q3",
    "ch4_32k_q2",
    "stereo_44k_managed",
    "tiny_44k",
    "silence_44k",
    "impulses_44k",
    "chained_44k",
    "ch8_44k_q4",
    "mono_11k_q0",
    "stereo_22k_q0",
    "long_44k_q2",
]


@pytest.mark.parametrize("name", NAMES)
def test_decode_matches_libvorbis(corpus_dir, name):
    golden = np.load(os.path.join(corpus_dir, name + ".golden.npy"))
    out = OggStreamReader(os.path.join(corpus_dir, name + ".ogg")).read_all_i16()
    assert out.shape == golden.shape
    diff = np.abs(out.astype(np.int32) - golden.astype(np.int32))
    assert int((diff > 2).sum()) == 0, f"max diff {diff.max()}"


def test_f32_output_close_to_libvorbis(corpus_dir):
    # float path: compare planar f32 vs ov_read_float goldens
    from tools import vorbisref as vr

    path = os.path.join(corpus_dir, "stereo_44k_q3.ogg")
    with vr.RefDecoder(path) as d:
        want = d.read_all_f32()  # [ch, n]
    r = OggStreamReader(path)
    chunks = []
    while (p := r.read_dec_packet_generic("planar_f32")) is not None:
        chunks.append(p)
    got = np.concatenate(chunks, axis=1)
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 2.5 / 32768.0


def test_interleaved_matches_planar(corpus_dir):
    path = os.path.join(corpus_dir, "tiny_44k.ogg")
    a = OggStreamReader(path)
    b = OggStreamReader(path)
    while True:
        pa = a.read_dec_packet()
        pb = b.read_dec_packet_itl()
        if pa is None:
            assert pb is None
            break
        assert np.array_equal(pa.T.reshape(-1), pb)


def test_chained_reinit_fields(corpus_dir):
    r = OggStreamReader(os.path.join(corpus_dir, "chained_44k.ogg"))
    serial0 = r.stream_serial
    while r.read_dec_packet() is not None:
        pass
    assert r.stream_serial != serial0  # re-initialized on the second link


def test_all_output_formats_consistent(corpus_dir):
    """planar/interleaved x f32/i16 must be views of the same decode
    (ref: lewton Samples trait impls, src/samples.rs)."""
    path = os.path.join(corpus_dir, "tiny_44k.ogg")
    outs = {}
    for fmt in ("planar_f32", "planar_i16", "interleaved_f32",
                "interleaved_i16"):
        r = OggStreamReader(path)
        chunks = []
        while (p := r.read_dec_packet_generic(fmt)) is not None:
            chunks.append(p)
        outs[fmt] = chunks
    from lewton_tpu.samples import to_i16

    for a, b, c, d in zip(outs["planar_f32"], outs["planar_i16"],
                          outs["interleaved_f32"], outs["interleaved_i16"]):
        np.testing.assert_array_equal(to_i16(a), b)
        np.testing.assert_array_equal(a.T.reshape(-1), c)
        np.testing.assert_array_equal(b.T.reshape(-1), d)

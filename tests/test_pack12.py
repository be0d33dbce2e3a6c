"""12-bit residue transport (parallel/pack12.py): exactness + wiring."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lewton_tpu.inside_ogg import read_headers
from lewton_tpu.models.decoder import compile_setup
from lewton_tpu.ogg import PacketReader
from lewton_tpu.parallel import BatchDecoder
from lewton_tpu.parallel.pack12 import pack12_np, pack12_supported, unpack12


def _headers(corpus_dir, name):
    with open(os.path.join(corpus_dir, name), "rb") as f:
        rdr = PacketReader(f.read())
    return read_headers(rdr)[0]


def _audio_packets(corpus_dir, name):
    with open(os.path.join(corpus_dir, name), "rb") as f:
        data = f.read()
    rdr = PacketReader(data)
    headers, serial = read_headers(rdr)
    pcks = []
    while (p := rdr.read_packet()) is not None:
        if p.stream_serial == serial:
            pcks.append(p.data)
    return headers, pcks


@pytest.mark.parametrize("shape", [(8,), (3, 16), (2, 5, 24), (4, 2, 7, 128)])
def test_roundtrip_random(shape):
    rng = np.random.default_rng(shape[-1])
    x = rng.integers(-2048, 2048, size=shape, dtype=np.int16)
    packed = pack12_np(x)
    assert packed.dtype == np.uint32
    assert packed.shape == shape[:-1] + (shape[-1] * 3 // 8,)
    y = np.asarray(unpack12(jnp.asarray(packed), shape[-1]))
    np.testing.assert_array_equal(x, y)


def test_roundtrip_edge_values():
    x = np.array([[-2048, 2047, 0, -1, 1, -2048, 2047, 1234]], np.int16)
    y = np.asarray(unpack12(jnp.asarray(pack12_np(x)), 8))
    np.testing.assert_array_equal(x, y)


def test_native_pack_matches_numpy(monkeypatch):
    """The C fast path and the numpy fallback must be byte-identical."""
    from lewton_tpu import native
    from lewton_tpu.parallel import pack12 as mod

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(7)
    x = rng.integers(-2048, 2048, size=(5, 9, 256), dtype=np.int16)
    fast = pack12_np(x)
    monkeypatch.setattr(native, "available", lambda: False)
    slow = mod.pack12_np(x)
    np.testing.assert_array_equal(fast, slow)


def test_supported_gating(corpus_dir):
    """Eligibility keys on the setup's proven static bound: q3's 1657
    qualifies, q10's 8844 must not."""
    h3 = _headers(corpus_dir, "stereo_44k_q3.ogg")
    cs3 = compile_setup(h3.ident, h3.setup)
    assert cs3.residue_bound is not None and cs3.residue_bound < 2048
    assert pack12_supported(cs3)
    h10 = _headers(corpus_dir, "stereo_44k_q10.ogg")
    cs10 = compile_setup(h10.ident, h10.setup)
    assert cs10.residue_bound is not None and cs10.residue_bound >= 2048
    assert not pack12_supported(cs10)


def test_p12_auto_keys_on_link_rate(corpus_dir, monkeypatch):
    """transport='auto' policy: p12 only below the measured-link
    crossover; never on CPU; never for unsupported setups (VERDICT r4
    weak #4 — backend identity alone is not a link statement)."""
    import lewton_tpu.parallel.pack12 as pk

    headers = _headers(corpus_dir, "stereo_44k_q3.ogg")
    cs = compile_setup(headers.ident, headers.setup)
    assert pack12_supported(cs)
    # on the CPU backend the policy is False regardless of any probe
    assert pk.p12_auto(cs) is False
    # pretend a real device: slow link -> p12; fast link -> i16
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pk, "probed_h2d_mb_s", lambda refresh=False: 40.0)
    assert pk.p12_auto(cs) is True
    monkeypatch.setattr(pk, "probed_h2d_mb_s",
                        lambda refresh=False: 9000.0)
    assert pk.p12_auto(cs) is False


def test_native_p12_emit_matches_pack_of_i16(corpus_dir):
    """The native front-end's direct p12 emit (residue_dtype=uint32,
    lt_decode_chunk_p12) must produce byte-identical planes to decoding
    i16 and packing with pack12_np — same packets, same chunk."""
    from lewton_tpu import native
    from lewton_tpu.models.decoder import StreamDecoder

    if not native.available():
        pytest.skip("native library not built")
    headers, pcks = _audio_packets(corpus_dir, "stereo_44k_q3.ogg")
    raw = _raw_headers(corpus_dir, "stereo_44k_q3.ogg")
    sd = StreamDecoder(headers.ident, headers.setup, chunk=16,
                       raw_headers=raw)
    assert sd._native is not None and sd.cs.residue_i16
    sd.set_residue_transport("default")
    fr_i16, st1 = sd.entropy_chunk_status(pcks[:16])
    sd.set_residue_transport("p12")
    fr_p12, st2 = sd.entropy_chunk_status(pcks[:16])
    np.testing.assert_array_equal(st1, st2)
    assert fr_p12["residue"].dtype == np.uint32
    np.testing.assert_array_equal(pack12_np(fr_i16["residue"]),
                                  fr_p12["residue"])
    sd.set_residue_transport("default")


def _raw_headers(corpus_dir, name):
    with open(os.path.join(corpus_dir, name), "rb") as f:
        rdr = PacketReader(f.read())
    h1 = rdr.read_packet().data
    rdr.read_packet()
    h3 = rdr.read_packet().data
    return h1, h3


def test_same_decoder_switches_transport_between_calls(corpus_dir):
    """One BatchDecoder alternating p12 / i16 / p12 across calls must
    reconfigure the native emit dtype each time (decode_streams_i16 sets
    the front-end transport per call — a stale u32 emit would corrupt an
    i16 call and vice versa)."""
    headers, pcks = _audio_packets(corpus_dir, "stereo_44k_q3.ogg")
    pcks = pcks[:24]
    dec = BatchDecoder(headers.ident, headers.setup, chunk=16)
    outs = {}
    for t in ("p12", "i16", "p12", "i16"):
        outs.setdefault(t, []).append(
            dec.decode_streams_i16([pcks], transport=t)[0])
    np.testing.assert_array_equal(outs["p12"][0], outs["i16"][0])
    np.testing.assert_array_equal(outs["p12"][0], outs["p12"][1])
    np.testing.assert_array_equal(outs["i16"][0], outs["i16"][1])
    # and the f32/plain-frame path resets the emit too
    plain = dec.decode_streams([pcks])[0]
    assert plain.shape[1] == outs["i16"][0].shape[0]


def test_set_residue_transport_rejects_unsupported_p12(corpus_dir):
    """p12 emit on a setup whose static bound exceeds 2048 must refuse
    loudly (the policy layer filters first; the setter is the backstop)."""
    from lewton_tpu.models.decoder import StreamDecoder

    headers = _headers(corpus_dir, "stereo_44k_q10.ogg")
    raw = _raw_headers(corpus_dir, "stereo_44k_q10.ogg")
    sd = StreamDecoder(headers.ident, headers.setup, chunk=16,
                       raw_headers=raw)
    if sd._native is None:
        pytest.skip("native library not built")
    with pytest.raises(AssertionError):
        sd.set_residue_transport("p12")


def test_decode_streams_p12_matches_i16(corpus_dir):
    """transport='p12' must bit-match the i16 transport end to end, on
    both compaction modes and through scan grouping."""
    headers, pcks = _audio_packets(corpus_dir, "stereo_44k_q3.ogg")
    pcks = pcks[:56]
    for compact in ("device", "host"):
        base = BatchDecoder(headers.ident, headers.setup, chunk=16, scan=3
                            ).decode_streams_i16([pcks, pcks],
                                                 compact=compact,
                                                 transport="i16")
        p12 = BatchDecoder(headers.ident, headers.setup, chunk=16, scan=3
                           ).decode_streams_i16([pcks, pcks],
                                                compact=compact,
                                                transport="p12")
        for x, y in zip(base, p12):
            assert x.shape == y.shape
            np.testing.assert_array_equal(x, y)


def test_decode_streams_p12_ineligible_falls_back(corpus_dir):
    """Asking for p12 on a setup whose bound exceeds 2048 silently keeps
    the exact i16 transport (policy knob, never a correctness knob)."""
    headers, pcks = _audio_packets(corpus_dir, "stereo_44k_q10.ogg")
    pcks = pcks[:24]
    base = BatchDecoder(headers.ident, headers.setup, chunk=16
                        ).decode_streams_i16([pcks], transport="i16")
    p12 = BatchDecoder(headers.ident, headers.setup, chunk=16
                       ).decode_streams_i16([pcks], transport="p12")
    for x, y in zip(base, p12):
        np.testing.assert_array_equal(x, y)


def test_serve_p12_matches(corpus_dir):
    """The serve scheduler's p12 path (forced on: the CPU backend disables
    it by default) must produce the same PCM as the i16 path."""
    from lewton_tpu.serve import StreamingScheduler

    data = open(os.path.join(corpus_dir, "stereo_44k_q3.ogg"), "rb").read()

    def run(force_p12):
        sched = StreamingScheduler(capacity=2, chunk=8, scan=2)
        sched.add_stream("s", data)
        if force_p12:
            (groups,) = sched.groups.values()
            assert pack12_supported(groups[0].cs)
            groups[0]._p12 = True
        got = []
        while sched.step():
            got.append(sched.poll("s"))
        got.append(sched.poll("s"))
        assert sched.is_done("s")
        return np.concatenate(got, axis=0)

    np.testing.assert_array_equal(run(False), run(True))

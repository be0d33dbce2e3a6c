"""Multi-stream batch + multi-chip sharding tests (8 virtual CPU devices)."""

import os

import jax
import numpy as np
import pytest

from lewton_tpu.inside_ogg import OggStreamReader, read_headers
from lewton_tpu.ogg import PacketReader
from lewton_tpu.parallel import BatchDecoder, make_mesh


def _audio_packets(path):
    with open(path, "rb") as f:
        data = f.read()
    rdr = PacketReader(data)
    headers, serial = read_headers(rdr)
    pcks = []
    while (p := rdr.read_packet()) is not None:
        if p.stream_serial == serial:
            pcks.append(p.data)
    return headers, pcks


def test_batch_matches_single(corpus_dir):
    path = os.path.join(corpus_dir, "tiny_44k.ogg")
    headers, pcks = _audio_packets(path)
    dec = BatchDecoder(headers.ident, headers.setup, chunk=16)
    outs = dec.decode_streams([pcks, pcks, pcks])
    ref = OggStreamReader(path, backend="jax").read_all_planar_f32()
    for o in outs:
        # batch output has no end-of-stream truncation; compare the prefix
        assert o.shape[1] >= ref.shape[1]
        np.testing.assert_array_equal(outs[0], o)
        np.testing.assert_allclose(o[:, : ref.shape[1]], ref, atol=1e-6)


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
def test_sharded_matches_unsharded(corpus_dir, dp, tp):
    if len(jax.devices()) < dp * tp:
        pytest.skip("needs 8 virtual devices")
    path = os.path.join(corpus_dir, "tiny_44k.ogg")
    headers, pcks = _audio_packets(path)
    plain = BatchDecoder(headers.ident, headers.setup, chunk=16)
    mesh = make_mesh(dp, tp)
    sharded = BatchDecoder(headers.ident, headers.setup, chunk=16, mesh=mesh)
    streams = [pcks] * 8
    a = plain.decode_streams(streams)
    b = sharded.decode_streams(streams)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=2e-6)


@pytest.mark.parametrize("precision", ["high", "highest"])
def test_tp_respects_precision_knob(corpus_dir, precision, monkeypatch):
    """The tensor-parallel IMDCT must follow ops.imdct.PRECISION (it used to
    hardcode HIGHEST) and stay exact vs the unsharded path at either setting.
    CPU ignores bf16 passes, so this pins routing + math, not rounding."""
    from lewton_tpu.ops import imdct as imdct_mod

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    monkeypatch.setattr(imdct_mod, "PRECISION", precision)
    path = os.path.join(corpus_dir, "tiny_44k.ogg")
    headers, pcks = _audio_packets(path)
    plain = BatchDecoder(headers.ident, headers.setup, chunk=16)
    sharded = BatchDecoder(headers.ident, headers.setup, chunk=16,
                           mesh=make_mesh(4, 2))
    a = plain.decode_streams([pcks] * 4)
    b = sharded.decode_streams([pcks] * 4)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=2e-6)


def test_decode_streams_i16_matches_reference(corpus_dir):
    """Device-compacted i16 path must equal the per-packet reference i16."""
    path = os.path.join(corpus_dir, "stereo_44k_q3.ogg")
    headers, pcks = _audio_packets(path)
    dec = BatchDecoder(headers.ident, headers.setup, chunk=16)
    outs = dec.decode_streams_i16([pcks, pcks])
    ref = OggStreamReader(path, backend="numpy").read_all_i16()
    for o in outs:
        assert o.shape[0] >= ref.shape[0]  # no end-of-stream truncation here
        diff = np.abs(o[: ref.shape[0]].astype(int) - ref.astype(int))
        assert diff.max() <= 1


def test_decode_streams_i16_host_compaction(corpus_dir):
    """compact='host' (padded i16 kernel output, host slicing) must match
    compact='device' (on-device compaction scan) within 1 LSB."""
    path = os.path.join(corpus_dir, "stereo_44k_q3.ogg")
    headers, pcks = _audio_packets(path)
    a = BatchDecoder(headers.ident, headers.setup,
                     chunk=16).decode_streams_i16([pcks, pcks])
    b = BatchDecoder(headers.ident, headers.setup,
                     chunk=16).decode_streams_i16([pcks, pcks],
                                                  compact="host")
    for x, y in zip(a, b):
        assert x.shape == y.shape
        assert np.abs(x.astype(int) - y.astype(int)).max() <= 1


def test_decode_streams_i16_scan_matches_per_chunk(corpus_dir):
    """scan=N group dispatch (decode_chunks_scan_packed*) must bit-match
    the per-chunk path on BOTH compaction modes, including the short tail
    that falls back to per-chunk dispatch."""
    path = os.path.join(corpus_dir, "stereo_44k_q3.ogg")
    headers, pcks = _audio_packets(path)
    pcks = pcks[:56]  # 4 chunks of 16 -> one scan-3 group + tail chunks
    for compact in ("device", "host"):
        base = BatchDecoder(headers.ident, headers.setup, chunk=16
                            ).decode_streams_i16([pcks, pcks],
                                                 compact=compact)
        scanned = BatchDecoder(headers.ident, headers.setup, chunk=16,
                               scan=3).decode_streams_i16([pcks, pcks],
                                                          compact=compact)
        for x, y in zip(base, scanned):
            assert x.shape == y.shape
            np.testing.assert_array_equal(x, y)


def test_decode_chunks_scan_matches_sequential():
    """N-chunk scan dispatch == N sequential chunk dispatches, bit for
    bit (same core per step; the scan only batches the dispatches)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lewton_tpu.models.decoder import compile_setup
    from lewton_tpu.ops.windowing import init_window_carry
    from lewton_tpu.parallel.batch import (decode_chunk_batch,
                                           decode_chunks_scan)
    from lewton_tpu.testing import synthetic_frames, synthetic_headers

    ident, setup = synthetic_headers(channels=2, bs0_exp=8, bs1_exp=11)
    cs = compile_setup(ident, setup)
    S, T, N = 2, 8, 3
    frs = [synthetic_frames(cs, T=T, S=S, seed=20 + i) for i in range(N)]
    carry0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (S,) + x.shape),
        init_window_carry(cs.channels, cs.n1 // 2))

    c = carry0
    seq_outs = []
    for fr in frs:
        (out, out_len), c = decode_chunk_batch(
            cs, {k: jnp.asarray(v) for k, v in fr.items()}, c,
            with_i16=True)
        seq_outs.append((np.asarray(out), np.asarray(out_len)))

    stacked = {k: jnp.stack([jnp.asarray(fr[k]) for fr in frs])
               for k in frs[0]}
    (outs, out_lens), c2 = decode_chunks_scan(cs, stacked, carry0,
                                              with_i16=True)
    for i in range(N):
        assert np.array_equal(np.asarray(outs[i]), seq_outs[i][0]), i
        assert np.array_equal(np.asarray(out_lens[i]), seq_outs[i][1]), i
    for a, b in zip(jax.tree.leaves(c), jax.tree.leaves(c2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_tp_non_divisible_spectral_width(corpus_dir):
    """ntp that does NOT divide the spectral width (896 % 3 != 0): the
    sharded IMDCT must zero-pad the contraction, not silently drop the
    tail rows (the floor-divided shard width lost them -> wrong audio
    with no error)."""
    if len(jax.devices()) < 6:
        pytest.skip("needs 6 virtual devices")
    path = os.path.join(corpus_dir, "tiny_44k.ogg")
    headers, pcks = _audio_packets(path)
    plain = BatchDecoder(headers.ident, headers.setup, chunk=16)
    sharded = BatchDecoder(headers.ident, headers.setup, chunk=16,
                           mesh=make_mesh(2, 3))
    a = plain.decode_streams([pcks, pcks])
    b = sharded.decode_streams([pcks, pcks])
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=2e-6)


def test_mesh_host_compaction(corpus_dir):
    """mesh + compact='host': the mesh path always device-compacts, and
    the output slicing must follow (it used to crash slicing the
    compacted array as a padded-flat chunk)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    path = os.path.join(corpus_dir, "stereo_44k_q3.ogg")
    headers, pcks = _audio_packets(path)
    a = BatchDecoder(headers.ident, headers.setup,
                     chunk=16).decode_streams_i16([pcks, pcks])
    b = BatchDecoder(headers.ident, headers.setup, chunk=16,
                     mesh=make_mesh(2, 1)).decode_streams_i16(
                         [pcks, pcks], compact="host")
    for x, y in zip(a, b):
        assert x.shape == y.shape
        assert np.abs(x.astype(int) - y.astype(int)).max() <= 1


@pytest.mark.parametrize("use_native", [False, True])
def test_batch_skips_bad_packets_mid_chunk(corpus_dir, use_native):
    """A non-audio packet mid-chunk must be SKIPPED — no PCM, window state
    untouched — so the stream decodes exactly as if it were absent.
    (Mid-chunk invalid frames used to reach the device un-compacted,
    violating the overlap-add suffix contract and corrupting every
    following packet's carry.)"""
    from lewton_tpu import native as native_mod

    if use_native and not native_mod.available():
        pytest.skip("native library not built")
    path = os.path.join(corpus_dir, "stereo_44k_q3.ogg")
    headers, pcks = _audio_packets(path)
    raw = (headers.raw_ident, headers.raw_setup) if use_native else None
    frontend = "native" if use_native else "python"
    bad = b"\x01vorbis" + b"\x00" * 20  # header packet in the audio stream
    hostile = pcks[:40]
    hostile.insert(5, bad)  # mid-chunk (chunk=16)
    dec = BatchDecoder(headers.ident, headers.setup, chunk=16,
                       raw_headers=raw, frontend=frontend)
    got = dec.decode_streams_i16([hostile])[0]
    dec2 = BatchDecoder(headers.ident, headers.setup, chunk=16,
                        raw_headers=raw, frontend=frontend)
    want = dec2.decode_streams_i16([pcks[:40]])[0]
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)
    # same through the f32 path
    dec3 = BatchDecoder(headers.ident, headers.setup, chunk=16,
                        raw_headers=raw, frontend=frontend)
    got_f = np.concatenate(
        [o for o in [dec3.decode_streams([hostile])[0]] if o.size], axis=-1)
    dec4 = BatchDecoder(headers.ident, headers.setup, chunk=16,
                        raw_headers=raw, frontend=frontend)
    want_f = dec4.decode_streams([pcks[:40]])[0]
    np.testing.assert_array_equal(got_f, want_f)

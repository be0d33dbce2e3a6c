"""OggStreamReader behavior: skip, seek, absgp bookkeeping."""

import os

import numpy as np

from lewton_tpu.inside_ogg import OggStreamReader


def test_skip_samples_linear(corpus_dir):
    path = os.path.join(corpus_dir, "stereo_44k_q3.ogg")
    golden = np.load(os.path.join(corpus_dir, "stereo_44k_q3.golden.npy"))

    to_skip = 30000
    r = OggStreamReader(path)
    pck, leftover = r.skip_samples_linear(to_skip, fmt="planar_i16")
    assert pck is not None
    # skipping consumed (to_skip - leftover) samples; the returned packet
    # starts at that stream position
    start = to_skip - leftover
    n = pck.shape[1]
    want = golden[start : start + n].T
    d = np.abs(pck.astype(np.int32) - want.astype(np.int32))
    assert d.max() <= 2


def test_skip_past_end(corpus_dir):
    r = OggStreamReader(os.path.join(corpus_dir, "tiny_44k.ogg"))
    pck, leftover = r.skip_samples_linear(10_000_000)
    assert pck is None
    assert leftover > 0


def test_seek_absgp_pg(corpus_dir):
    path = os.path.join(corpus_dir, "stereo_44k_q3.ogg")
    golden = np.load(os.path.join(corpus_dir, "stereo_44k_q3.golden.npy"))
    r = OggStreamReader(path)
    target = 66150
    r.seek_absgp_pg(target)
    # decode to the end; the decoded region must cover [~target, end] —
    # page granularity means decode resumes at the last page boundary
    # before the target (plus one priming packet)
    chunks = []
    while (p := r.read_dec_packet()) is not None:
        chunks.append(p)
    out = np.concatenate(chunks, axis=1)
    total = 132300
    # resumed at or before the target's page (priming costs <= 1 packet)
    assert out.shape[1] >= total - target - 4096
    # PCM aligned at stream end matches the golden
    want = golden[total - out.shape[1] :].T
    d = np.abs(out.astype(np.int32) - want.astype(np.int32))
    assert d.max() <= 2


def test_get_last_absgp_progresses(corpus_dir):
    r = OggStreamReader(os.path.join(corpus_dir, "stereo_44k_q3.ogg"))
    seen = []
    while (p := r.read_dec_packet()) is not None:
        seen.append(r.get_last_absgp())
    assert seen[-1] == 132300
    assert all(b >= a for a, b in zip(seen, seen[1:]))


def test_skip_and_seek_native_backend(corpus_dir):
    """skip/seek must work identically on the native (C++) backend."""
    from lewton_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    path = os.path.join(corpus_dir, "stereo_44k_q3.ogg")
    a = OggStreamReader(path, backend="numpy")
    b = OggStreamReader(path, backend="native")
    pa, la = a.skip_samples_linear(30000)
    pb, lb = b.skip_samples_linear(30000)
    assert la == lb
    assert pa.shape == pb.shape
    if pa.size:
        assert np.abs(pa.astype(np.int32) - pb.astype(np.int32)).max() <= 1
    a.seek_absgp_pg(60000)
    b.seek_absgp_pg(60000)
    while True:
        xa, xb = a.read_dec_packet(), b.read_dec_packet()
        if xa is None:
            assert xb is None
            break
        assert xa.shape == xb.shape
        if xa.size:
            assert np.abs(xa.astype(np.int32) - xb.astype(np.int32)).max() <= 1


def test_save_restore_decode_state(corpus_dir):
    """Checkpoint/resume: decoding from a restored state reproduces the
    PCM exactly (both backends)."""
    path = os.path.join(corpus_dir, "stereo_44k_q3.ogg")
    for backend in ("numpy", "native", "jax"):
        r = OggStreamReader(path, backend=backend)
        for _ in range(10):
            r.read_dec_packet()
        state = r.save_decode_state()
        next5 = [r.read_dec_packet() for _ in range(5)]
        # rewind: fresh reader positioned identically by packet count
        r2 = OggStreamReader(path, backend=backend)
        for _ in range(10):
            r2.read_next_audio_packet()
        r2.restore_decode_state(state)
        redo5 = [r2.read_dec_packet() for _ in range(5)]
        for a, b in zip(next5, redo5):
            np.testing.assert_array_equal(a, b, err_msg=backend)


def test_per_packet_jax_backend_routes_to_device(corpus_dir):
    """backend="jax" per-packet decode must run the device pipeline (it used
    to silently fall back to numpy) and match the numpy reference."""
    path = os.path.join(corpus_dir, "tiny_44k.ogg")
    rj = OggStreamReader(path, backend="jax")
    rn = OggStreamReader(path, backend="numpy")
    n = 0
    while (pj := rj.read_dec_packet()) is not None:
        pn = rn.read_dec_packet()
        assert pn is not None
        assert pj.shape == pn.shape
        if pj.size:
            assert np.abs(pj.astype(np.int32) - pn.astype(np.int32)).max() <= 2
        n += 1
    assert rn.read_dec_packet() is None
    assert n > 0
    assert rj._jax_dec is not None  # the device decoder actually engaged


def test_skip_samples_linear_jax_backend(corpus_dir):
    """skip re-primes the persistent device carry correctly."""
    path = os.path.join(corpus_dir, "stereo_44k_q3.ogg")
    golden = np.load(os.path.join(corpus_dir, "stereo_44k_q3.golden.npy"))
    to_skip = 30000
    r = OggStreamReader(path, backend="jax")
    pck, leftover = r.skip_samples_linear(to_skip, fmt="planar_i16")
    assert pck is not None
    start = to_skip - leftover
    want = golden[start : start + pck.shape[1]].T
    d = np.abs(pck.astype(np.int32) - want.astype(np.int32))
    assert d.max() <= 2


def test_chained_short_second_link_all_backends():
    """Chained file whose SECOND link is short enough that its audio sits
    on one page (no last_in_page granule correction before EOS): the
    batching read_all loops used to flush link 1's buffered packets AFTER
    the chain re-init had already restarted the granule clock, silently
    over-truncating link 2 (measured 176 samples lost). All backends must
    equal the per-packet numpy loop."""
    import numpy as np

    from lewton_tpu import native
    from lewton_tpu.inside_ogg import OggStreamReader
    from tools import vorbisref as vr

    rng = np.random.default_rng(11)
    rate = 44100
    pcm1 = (rng.standard_normal((2, int(rate * 0.4))) * 0.3).astype(np.float32)
    pcm2 = (rng.standard_normal((2, int(rate * 0.15))) * 0.3).astype(np.float32)
    data = (vr.encode(pcm1, rate, quality=0.3, serial=101)
            + vr.encode(pcm2, rate, quality=0.3, serial=202))

    want = OggStreamReader(data, backend="numpy").read_all_planar_f32()
    backends = ["jax"] + (["native"] if native.available() else [])
    for backend in backends:
        got = OggStreamReader(data, backend=backend).read_all_planar_f32()
        assert got.shape == want.shape, backend
        np.testing.assert_allclose(got, want, atol=2e-4, err_msg=backend)


def test_skip_across_chain_boundary():
    """skip_samples_linear landing past a chain boundary: the new link's
    first packet decodes to 0 samples (fresh window) and must count as 0
    in the skip arithmetic — its nominal length used to be counted,
    drifting the landing position by up to half a window."""
    import numpy as np

    from lewton_tpu.inside_ogg import OggStreamReader
    from tools import vorbisref as vr

    rng = np.random.default_rng(5)
    rate = 44100
    pcm1 = (rng.standard_normal((2, int(rate * 0.25))) * 0.3).astype(np.float32)
    pcm2 = (rng.standard_normal((2, int(rate * 0.3))) * 0.3).astype(np.float32)
    data = (vr.encode(pcm1, rate, quality=0.3, serial=31)
            + vr.encode(pcm2, rate, quality=0.3, serial=32))

    # ground truth: full per-packet decode, stitched
    full = OggStreamReader(data, backend="numpy").read_all_planar_f32()
    link1 = OggStreamReader(
        vr.encode(pcm1, rate, quality=0.3, serial=31),
        backend="numpy").read_all_planar_f32()
    target = link1.shape[1] + 3000  # lands inside link 2

    r = OggStreamReader(data, backend="numpy")
    decoded, leftover = r.skip_samples_linear(target)
    assert decoded is not None
    # the target packet starts (target - leftover) samples into the stream
    got = np.asarray(decoded)[:, :]  # planar i16 [C, n]
    start = target - leftover
    want = (np.clip(full[:, start : start + got.shape[1]] * 32768.0,
                    -32768, 32767)).astype(np.int16)
    assert got.shape == want.shape
    # same window content => same samples (i16 conversion is exact)
    np.testing.assert_array_equal(got, want)

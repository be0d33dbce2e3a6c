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
    for backend in ("numpy", "native"):
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

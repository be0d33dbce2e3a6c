"""C ABI (lewton-compatible) + native CPU synthesis tests.

Drives lewton_context_from_extradata / lewton_decode_packet via ctypes and
checks the full native CPU decode against libvorbis goldens (+/-2 i16 LSB,
the reference contract) and the IMDCT golden vectors.
"""

import ctypes as C
import os
import subprocess

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "lewton_tpu", "native")
LIB = os.path.join(NATIVE_DIR, "liblewton_host.so")


@pytest.fixture(scope="module")
def lib():
    subprocess.run(["make", "-C", NATIVE_DIR, "-s"], check=True)
    lib = C.CDLL(LIB)
    u8p = C.POINTER(C.c_uint8)
    lib.lewton_context_from_extradata.restype = C.c_void_p
    lib.lewton_context_from_extradata.argtypes = [u8p, C.c_size_t]
    lib.lewton_context_reset.argtypes = [C.c_void_p]
    lib.lewton_decode_packet.restype = C.c_int
    lib.lewton_decode_packet.argtypes = [
        C.c_void_p, u8p, C.c_size_t, C.POINTER(C.c_void_p)]
    lib.lewton_samples_count.restype = C.c_size_t
    lib.lewton_samples_count.argtypes = [C.c_void_p]
    lib.lewton_samples_channels.restype = C.c_size_t
    lib.lewton_samples_channels.argtypes = [C.c_void_p]
    lib.lewton_samples_f32.restype = C.POINTER(C.c_float)
    lib.lewton_samples_f32.argtypes = [C.c_void_p, C.c_size_t]
    lib.lewton_samples_drop.argtypes = [C.c_void_p]
    lib.lewton_context_drop.argtypes = [C.c_void_p]
    return lib


def _u8(b: bytes):
    return (C.c_uint8 * len(b)).from_buffer_copy(b)


def _xiph_extradata(ident: bytes, comment: bytes, setup: bytes) -> bytes:
    def lace(n):
        return b"\xff" * (n // 255) + bytes([n % 255])

    return bytes([2]) + lace(len(ident)) + lace(len(comment)) + ident + comment + setup


def _header_packets(path):
    from lewton_tpu import native

    with open(path, "rb") as f:
        data = f.read()
    pcks = native.demux(data)
    serial = pcks[0].stream_serial
    mine = [p for p in pcks if p.stream_serial == serial]
    return mine[0].data, mine[1].data, mine[2].data, [p.data for p in mine[3:]]


@pytest.mark.parametrize("name", ["stereo_44k_q3", "mono_8k_q-1", "ch6_44k_q3"])
def test_capi_decode_matches_golden(lib, corpus_dir, name):
    path = os.path.join(corpus_dir, name + ".ogg")
    ident, comment, setup, audio = _header_packets(path)
    extradata = _xiph_extradata(ident, comment, setup)
    buf = _u8(extradata)
    ctx = lib.lewton_context_from_extradata(buf, len(extradata))
    assert ctx
    chunks = []
    for pck in audio:
        pb = _u8(pck)
        out = C.c_void_p()
        rc = lib.lewton_decode_packet(ctx, pb, len(pck), C.byref(out))
        assert rc == 0
        n = lib.lewton_samples_count(out)
        ch = lib.lewton_samples_channels(out)
        if n:
            arr = np.stack([
                np.ctypeslib.as_array(lib.lewton_samples_f32(out, c), (n,)).copy()
                for c in range(ch)
            ])
            chunks.append(arr)
        lib.lewton_samples_drop(out)
    lib.lewton_context_drop(ctx)
    pcm = np.concatenate(chunks, axis=1)
    i16 = np.trunc(np.clip(pcm * 32768.0, -32768, 32767)).astype(np.int16).T
    golden = np.load(os.path.join(corpus_dir, name + ".golden.npy"))
    # no end-of-stream truncation in the raw packet API: compare the prefix
    assert i16.shape[0] >= golden.shape[0]
    d = np.abs(i16[: golden.shape[0]].astype(int) - golden.astype(int))
    assert int((d > 2).sum()) == 0, f"max diff {d.max()}"


def test_capi_reset(lib, corpus_dir):
    path = os.path.join(corpus_dir, "tiny_44k.ogg")
    ident, comment, setup, audio = _header_packets(path)
    extradata = _xiph_extradata(ident, comment, setup)
    buf = _u8(extradata)
    ctx = lib.lewton_context_from_extradata(buf, len(extradata))

    def run():
        outs = []
        for pck in audio[:4]:
            pb = _u8(pck)
            out = C.c_void_p()
            assert lib.lewton_decode_packet(ctx, pb, len(pck), C.byref(out)) == 0
            n = lib.lewton_samples_count(out)
            ch = lib.lewton_samples_channels(out)
            if n:
                outs.append(np.stack([
                    np.ctypeslib.as_array(
                        lib.lewton_samples_f32(out, c), (n,)).copy()
                    for c in range(ch)
                ]))
            lib.lewton_samples_drop(out)
        return np.concatenate(outs, axis=1)

    a = run()
    lib.lewton_context_reset(ctx)
    b = run()
    np.testing.assert_array_equal(a, b)
    lib.lewton_context_drop(ctx)


def test_capi_rejects_bad_extradata(lib):
    bad = bytes([3, 1, 1, 0, 0, 0])
    buf = _u8(bad)
    assert lib.lewton_context_from_extradata(buf, len(bad)) is None or \
        lib.lewton_context_from_extradata(buf, len(bad)) == 0


NATIVE_BACKEND_NAMES = ["stereo_44k_q3", "mono_8k_q-1", "chained_44k", "tiny_44k"]


@pytest.mark.parametrize("name", NATIVE_BACKEND_NAMES)
def test_native_backend_matches_golden(lib, corpus_dir, name):
    """OggStreamReader(backend='native'): full C++ CPU decode path."""
    from lewton_tpu.inside_ogg import OggStreamReader

    golden = np.load(os.path.join(corpus_dir, name + ".golden.npy"))
    out = OggStreamReader(
        os.path.join(corpus_dir, name + ".ogg"), backend="native"
    ).read_all_i16()
    assert out.shape == golden.shape
    d = np.abs(out.astype(np.int32) - golden.astype(np.int32))
    assert int((d > 2).sum()) == 0, f"max diff {d.max()}"


def test_capi_demo_c_builds_and_decodes(lib, corpus_dir, tmp_path):
    """examples/capi_demo.c: a pure-C client of the shipped ABI (demux via
    lt_ogg_*, xiph extradata, lewton_decode_packet, WAV out) must build
    with the system cc and match the python decode within the numerics
    contract over the granule-trimmed range (the packet-level C API has
    no container knowledge, so it emits the untrimmed tail — same as
    lewton's capi, reference src/capi.rs:79-147)."""
    import subprocess
    import wave

    root = os.path.join(os.path.dirname(__file__), "..")
    exe = str(tmp_path / "capi_demo")
    subprocess.run(
        ["cc", "-O2", os.path.join(root, "examples", "capi_demo.c"),
         "-I", os.path.join(root, "lewton_tpu", "native"),
         "-L", os.path.join(root, "lewton_tpu", "native"),
         "-llewton_host", "-lm", "-o", exe], check=True)
    wav_path = str(tmp_path / "out.wav")
    env = dict(os.environ,
               LD_LIBRARY_PATH=os.path.join(root, "lewton_tpu", "native"))
    r = subprocess.run(
        [exe, os.path.join(corpus_dir, "stereo_44k_q3.ogg"), wav_path],
        env=env, capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr

    w = wave.open(wav_path)
    pcm = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
    pcm = pcm.reshape(-1, w.getnchannels())
    assert w.getframerate() == 44100 and w.getnchannels() == 2

    from lewton_tpu.inside_ogg import OggStreamReader

    ref = OggStreamReader(
        os.path.join(corpus_dir, "stereo_44k_q3.ogg"), backend="numpy"
    ).read_all_i16()
    assert len(pcm) >= len(ref)  # C demo keeps the untrimmed tail
    d = np.abs(pcm[: len(ref)].astype(np.int32) - ref.astype(np.int32))
    assert int((d > 2).sum()) == 0, f"max diff {d.max()}"

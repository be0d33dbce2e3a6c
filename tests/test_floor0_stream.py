"""End-to-end floor0 conformance on a hand-crafted stream.

No encoder emits floor type 0, so this is the analog of the reference's
thingy-floor0.ogg coverage (dev/cmp vals suite): a bit-crafted spec-valid
floor0 stream, golden PCM from libvorbisfile, all three backends within
the +/-2 i16 LSB contract.
"""

import numpy as np
import pytest

from lewton_tpu.inside_ogg import OggStreamReader
from tools.floor0_stream import build_stream


@pytest.fixture(scope="module")
def stream_and_golden(tmp_path_factory):
    from tools import vorbisref as vr

    data = build_stream()
    path = tmp_path_factory.mktemp("f0") / "floor0.ogg"
    path.write_bytes(data)
    golden = vr.decode_file_i16(str(path))
    assert golden.shape[0] > 0 and np.abs(golden).max() > 10
    return data, golden


@pytest.mark.parametrize("backend", ["numpy", "native", "jax"])
def test_floor0_stream_all_backends(stream_and_golden, backend):
    data, golden = stream_and_golden
    if backend == "native":
        from lewton_tpu import native

        if not native.available():
            pytest.skip("native library not built")
    out = OggStreamReader(data, backend=backend).read_all_i16()
    assert out.shape == golden.shape
    d = np.abs(out.astype(np.int32) - golden.astype(np.int32))
    assert int((d > 2).sum()) == 0, f"max diff {d.max()}"


@pytest.mark.parametrize("backend", ["numpy", "native", "jax"])
@pytest.mark.parametrize("variant", [
    {"residue_type": 0},               # strided VQ writes (no encoder emits)
    {"channels": 2, "submaps": 2},     # multi-submap channel muxing
    # floor0 curves scaling square-polar-COUPLED type-2 residues — the
    # floor0 x coupling combination no corpus file reaches
    {"channels": 2, "submaps": 1, "residue_type": 2, "coupling": True},
    # TWO floor books with packet-selected booknumber 1 (multi-book
    # selection path, ref lewton src/audio.rs:119-127 — no corpus stream
    # selects booknumber > 0)
    {"n_books": 2},
    # max encodable amplitude (63) + near-singular LSP root pairs: pins
    # the loud-clipping floor0 semantics vs libvorbis (VERDICT r3 #4c)
    {"max_amp": True},
])
def test_crafted_variants(tmp_path, backend, variant):
    from tools import vorbisref as vr

    if backend == "native":
        from lewton_tpu import native

        if not native.available():
            pytest.skip("native library not built")
    data = build_stream(**variant)
    p = tmp_path / "v.ogg"
    p.write_bytes(data)
    golden = vr.decode_file_i16(str(p))
    out = OggStreamReader(data, backend=backend).read_all_i16()
    assert out.shape == golden.shape
    d = np.abs(out.astype(np.int32) - golden.astype(np.int32))
    assert int((d > 2).sum()) == 0, f"{variant}: max diff {d.max()}"


def test_exp_saturation_finite():
    """Past-f32-range exp arguments (max amplitude x truly singular LSP —
    beyond any oracle-pinnable stream: libvorbis goes to inf there, and
    its float->int output cast is platform UB) saturate FINITELY in the
    numpy and jax curve implementations: never inf, never NaN, no numpy
    RuntimeWarning (VERDICT r3 weak #5). The crafted ``max_amp`` stream
    above pins everything the oracle CAN pin."""
    import warnings

    import jax.numpy as jnp

    from lewton_tpu.floor import DecodedFloor0, floor0_curve
    from lewton_tpu.header import Floor0
    from lewton_tpu.ops.floor_curve import floor0_curve_batch
    from lewton_tpu.tables import bark_cos_omega

    fl = Floor0(order=2, rate=8000, bark_map_size=64, amplitude_bits=6,
                amplitude_offset=255, books=[0])
    cw = bark_cos_omega(64, fl.rate, fl.bark_map_size)
    # both LSP cos-roots exactly ON a bark bin: p + q == 0 there, the
    # division is inf, and the clamped exp must still come out finite
    c = np.float32(cw[20])
    df = DecodedFloor0(np.array([c, c], np.float32), 63, fl)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        # the 1/sqrt(0) division itself legitimately warns; only exp must
        # not overflow
        warnings.filterwarnings("ignore", message=".*divide by zero.*")
        curve = floor0_curve(df, 0, 64, fl.rate)
    assert np.all(np.isfinite(curve)), "numpy curve overflowed to inf"
    assert curve.max() > 1e30  # saturation region actually reached

    dev = floor0_curve_batch(
        jnp.array([[[c, c]]]),                      # [T=1, C=1, O=2]
        jnp.array([[63.0]], jnp.float32),
        jnp.array([[2]], jnp.int32),
        jnp.array([[255.0 / 63.0]], jnp.float32),
        jnp.array([[255.0]], jnp.float32),
        jnp.asarray(cw, jnp.float32)[None, None, :],
    )
    dev = np.asarray(dev)
    assert np.all(np.isfinite(dev)), "device curve overflowed to inf"
    assert dev.max() > 1e30

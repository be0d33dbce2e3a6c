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

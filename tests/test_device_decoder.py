"""Device-pipeline conformance: the batched JAX decoder must satisfy the
same contract as the numpy reference half — every sample within +/-2 i16
LSB of libvorbis (the reference's tolerance, lewton dev/cmp/src/lib.rs:148-155).
"""

import os

import numpy as np
import pytest

from lewton_tpu.inside_ogg import OggStreamReader
from lewton_tpu.samples import to_i16

NAMES = [
    "mono_8k_q-1",
    "stereo_44k_q3",
    "stereo_44k_q10",
    "stereo_48k_q5",
    "ch6_44k_q3",
    "ch4_32k_q2",
    "stereo_44k_managed",
    "tiny_44k",
    "silence_44k",
    "impulses_44k",
    "chained_44k",
]


@pytest.mark.parametrize("name", NAMES)
def test_jax_backend_matches_libvorbis(corpus_dir, name):
    golden = np.load(os.path.join(corpus_dir, name + ".golden.npy"))
    r = OggStreamReader(os.path.join(corpus_dir, name + ".ogg"), backend="jax")
    out = r.read_all_i16()
    assert out.shape == golden.shape
    diff = np.abs(out.astype(np.int32) - golden.astype(np.int32))
    assert int((diff > 2).sum()) == 0, f"max diff {diff.max()}"


def test_jax_matches_numpy_closely(corpus_dir):
    """Device and numpy halves share the entropy front-end; their float
    outputs may differ only by reduction-order rounding."""
    path = os.path.join(corpus_dir, "stereo_44k_q3.ogg")
    a = OggStreamReader(path, backend="jax").read_all_planar_f32()
    b = OggStreamReader(path, backend="numpy").read_all_planar_f32()
    assert a.shape == b.shape
    assert np.abs(a - b).max() < 1.5 / 32768.0
    assert np.array_equal(
        to_i16(a), to_i16(b)
    ) or np.abs(to_i16(a).astype(int) - to_i16(b).astype(int)).max() <= 1

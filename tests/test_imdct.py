"""IMDCT kernel tests against stb-derived golden vectors.

The goldens (tests/data/imdct_golden.npz, extracted from the reference's
test data, lewton src/imdct_test.rs) were captured from stb_vorbis's fast
f32 butterfly implementation. Our transform is the *exact* IMDCT (f64-built
cosine matrix), so we compare with a tolerance covering stb's own numerical
noise: the measured deviations are 4.4e-5 (n=256) and 3.5e-4 (n=2048), while
end-to-end PCM conformance vs libvorbis stays within 1 i16 LSB (see
test_conformance.py) — the +/-2 LSB contract is the binding one.
"""

import os

import numpy as np
import pytest

from lewton_tpu.tables import (
    bark_cos_omega,
    floor1_inverse_db_table,
    imdct_matrix,
    window_slope,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "imdct_golden.npz")


@pytest.mark.parametrize("case,tol", [(1, 1e-4), (2, 1e-4), (3, 5e-4)])
def test_imdct_stb_goldens(case, tol):
    d = np.load(GOLDEN)
    x = d[f"in{case}"]
    want = d[f"out{case}"]
    n = 2 * len(x)
    got = x.astype(np.float64) @ imdct_matrix(n, dtype=np.float64)
    assert np.abs(got - want).max() < tol


@pytest.mark.parametrize("n", [64, 128, 256, 512, 1024, 2048, 4096, 8192])
def test_imdct_energy_and_linearity(n):
    rng = np.random.RandomState(n)
    m = imdct_matrix(n, dtype=np.float64)
    x = rng.randn(n // 2)
    y = x @ m
    # IMDCT is linear; matrix rows are cosines with norm sqrt(n/2)
    assert y.shape == (n,)
    assert np.allclose((2 * x) @ m, 2 * y)
    # TDAC property: windowed overlap-add of successive equal blocks
    # reconstructs (checked end-to-end in conformance tests)


def test_window_slope_properties():
    for half in (128, 1024):
        w = window_slope(half).astype(np.float64)
        assert w.shape == (half,)
        assert (np.diff(w) >= 0).all() and w[-1] > w[0]  # rising
        assert 0 < w[0] < 0.01 and w[-1] > 0.999
        # Princen-Bradley: w[i]^2 + w[half-1-i]^2 == 1
        pb = w**2 + w[::-1] ** 2
        assert np.abs(pb - 1.0).max() < 1e-6


def test_floor1_db_table():
    t = floor1_inverse_db_table()
    assert t.shape == (256,)
    assert t[0] == np.float32(1.0649863e-07)
    assert t[255] == np.float32(1.0)
    assert (np.diff(t) > 0).all()


def test_bark_cos_omega_shape():
    c = bark_cos_omega(1024, 44100, 128)
    assert c.shape == (1024,)
    assert c.dtype == np.float32
    assert np.abs(c).max() <= 1.0
    # map is monotone non-increasing in cos space
    assert (np.diff(c) <= 1e-7).all()

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


def test_dct4_split_identity_exhaustive():
    """Wang one-level split (tables.dct4_split_tables) == direct DCT-IV
    matrix for every blocksize, on impulse vectors (exhaustive basis) in
    f64 — the identity must be exact math, not approximately right."""
    from lewton_tpu.tables import dct4_split_tables, imdct_matrix

    for n in (64, 256, 2048):
        N = n // 2
        H = N // 2
        # direct DCT-IV derived exactly like ops/imdct.dct4_from_imdct
        m = imdct_matrix(n, dtype=np.float64)
        direct = np.concatenate([-m[:, 3 * N // 2:], m[:, : N // 2]], axis=1)
        t2, s2, ct, st = (a.astype(np.float64)
                          for a in dct4_split_tables(n, dtype=np.float64))
        x = np.eye(N)
        a, b = x[:, :H], x[:, H:][:, ::-1]
        c = ct * a + st * b
        d = ct * b - st * a
        u, v = c @ t2, d @ s2
        uh, vh = u[:, 1:], v[:, : H - 1]
        mid = np.stack([uh - vh, uh + vh], axis=-1).reshape(N, N - 2)
        X = np.concatenate([u[:, :1], mid, -v[:, H - 1:]], axis=1)
        assert np.abs(X - x @ direct).max() < 1e-9, n


def test_dct4_split_batch_matches_direct():
    """ops/imdct.dct4_split_batch_parts_ct vs dct4_batch_parts_ct on
    random spectra (f32 CPU): near-identical (extra twiddle roundings
    only), including w_eff-clipped inputs."""
    import jax.numpy as jnp

    from lewton_tpu.ops.imdct import (dct4_batch_parts_ct,
                                      dct4_split_batch_parts_ct)
    from lewton_tpu.tables import imdct_matrix

    rng = np.random.default_rng(3)
    n0, n1 = 256, 2048
    m = imdct_matrix(n1)
    N = n1 // 2
    mx1 = np.concatenate([-m[:, 3 * N // 2:], m[:, : N // 2]], axis=1)
    m0 = imdct_matrix(n0)
    N0 = n0 // 2
    mx0 = np.concatenate([-m0[:, 3 * N0 // 2:], m0[:, : N0 // 2]], axis=1)
    for K in (N, 900):  # full width and a w_eff clip
        spec = rng.standard_normal((2, 4, K)).astype(np.float32) * 40
        da, ds = dct4_batch_parts_ct(
            jnp.asarray(spec), jnp.asarray(mx0[:min(K, N0)]),
            jnp.asarray(mx1[:K]))
        sa, ss = dct4_split_batch_parts_ct(
            jnp.asarray(spec), n0, n1, jnp.asarray(mx0[:min(K, N0)]),
            jnp.asarray(mx1[:K]))
        scale = np.abs(np.asarray(da)).max()
        assert np.abs(np.asarray(sa) - np.asarray(da)).max() < 1e-5 * scale
        assert np.abs(np.asarray(ss) - np.asarray(ds)).max() < 1e-5 * scale

"""Fused floor kernel's Wang-split butterfly output (cd_n) vs the plain
spectra output + the same butterfly in numpy — bit-identical in interpret
mode (same f32 ops in the same order)."""

import functools

import jax.numpy as jnp
import numpy as np

from lewton_tpu.models.decoder import _floor_kernel_spectra, compile_setup
from lewton_tpu.ops import floor_kernel as fk
from lewton_tpu.tables import dct4_split_tables
from lewton_tpu.testing import synthetic_frames, synthetic_headers


def test_floor_kernel_cd_split_matches(monkeypatch):
    orig = fk.floor_spectra_pallas
    monkeypatch.setattr(fk, "floor_spectra_pallas",
                        functools.partial(orig, interpret=True))
    ident, setup = synthetic_headers(channels=2, bs0_exp=8, bs1_exp=11)
    cs = compile_setup(ident, setup)
    fr = {k: jnp.asarray(v)
          for k, v in synthetic_frames(cs, T=16, S=1, seed=9).items()}
    fr = {k: v[0] for k, v in fr.items()}  # drop the stream axis
    # (_floor_kernel_ok also requires a real TPU backend; the static
    # setup conditions are what matter here)
    assert fk.pallas_floor_supported(cs, 16)

    spectra = np.asarray(_floor_kernel_spectra(cs, fr, ct_out=True))
    cd = np.asarray(_floor_kernel_spectra(cs, fr, ct_out=True,
                                          cd_n=cs.n1 // 2))
    N = cs.n1 // 2
    H = N // 2
    assert cd.shape == spectra.shape[:2] + (N,)

    _, _, ct, st = dct4_split_tables(cs.n1)
    x = spectra
    if x.shape[-1] < N:
        x = np.pad(x, [(0, 0), (0, 0), (0, N - x.shape[-1])])
    a, b = x[..., :H], x[..., H:][..., ::-1]
    c_ref = ct * a + st * b
    d_ref = ct * b - st * a
    # ~1 ulp: the compiled rotation may contract mul+add into FMA; the
    # +-2 LSB budget (on-chip gate) is 4 orders of magnitude above this
    scale = max(np.abs(c_ref).max(), np.abs(d_ref).max(), 1.0)
    assert np.abs(cd[..., :H] - c_ref).max() <= 2e-7 * scale
    assert np.abs(cd[..., H:] - d_ref).max() <= 2e-7 * scale

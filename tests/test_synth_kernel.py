"""Fused Pallas synth kernel vs the unfused ops (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from lewton_tpu.ops.coupling import inverse_coupling_static
from lewton_tpu.ops.floor_curve import floor1_render
from lewton_tpu.ops import synth_kernel


def test_fused_matches_unfused(monkeypatch):
    # interpret-mode pallas on CPU
    import functools
    orig = synth_kernel.pl.pallas_call
    monkeypatch.setattr(synth_kernel.pl, "pallas_call",
                        functools.partial(orig, interpret=True))
    rng = np.random.RandomState(3)
    T, C, W = 12, 2, 128
    lo_x = rng.randint(0, 100, (T, C, W))
    hi_x = lo_x + rng.randint(1, 300, (T, C, W))
    lo_y = rng.randint(0, 1020, (T, C, W))
    hi_y = rng.randint(0, 1020, (T, C, W))
    br = jnp.asarray(np.stack([lo_x, lo_y, hi_x, hi_y], 1).astype(np.float32))
    residue = jnp.asarray(rng.randn(T, C, W).astype(np.float32))
    used = jnp.asarray(rng.rand(T, C) < 0.8)
    steps = ((0, 1),)
    got = np.asarray(synth_kernel.fused_floor_couple(
        br, residue, used, steps, rows=8))
    curve = floor1_render(
        (br[:, 0], br[:, 1], br[:, 2], br[:, 3])
    ) * used[:, :, None]
    res = inverse_coupling_static(residue, steps)
    want = np.asarray(curve * res)
    # interpret-mode float association may differ by ~1 ulp; the decode
    # contract (+/-2 i16 LSB) is enforced by bench.py --check on the chip
    np.testing.assert_allclose(got, want, rtol=3e-6, atol=1e-7)

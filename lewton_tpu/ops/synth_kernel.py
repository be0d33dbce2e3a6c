"""Fused Pallas kernel: floor1 render + inverse coupling + floor x residue.

After the MXU step-matrix contraction (floor_curve.floor1_curve_mxu), the
remaining per-bin work is a chain of cheap elementwise ops — Bresenham
closed form, inverse-dB exp, square-polar coupling, curve multiply. XLA
executes that chain as several HBM round trips over [T, C, W] tensors;
this kernel does it in one read of (bracket tensors, residue) and one
write of the spectra, entirely in VMEM.

Channels ride the lane dimension ([T, C*W] layout) so the (small) channel
count never becomes a sublane-padding waste, and static coupling steps are
lane-range slices.

OPT-IN (models.decoder.USE_FUSED_SYNTH_KERNEL, default False): on this
chip XLA's own fusion of the unfused ops measured ~1.7x faster (12.8k vs
7.4k x realtime), and the live fused hot path is ops/floor_kernel.py,
which superseded this kernel by also folding the bracket GEMM and the
residue dot into VMEM. Kept as the minimal fused-synthesis reference and
for A/B runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .floor_curve import bresenham_idx, floor1_db_value

__all__ = ["fused_floor_couple"]


def _kernel(br_ref, res_ref, used_ref, out_ref, *, C, W, steps):
    R = out_ref.shape[0]
    binx = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)

    # ---- floor1 Bresenham + exp per channel (the ONE shared copy of
    # the numerics contract: floor_curve.bresenham_idx) ----
    binx_f = binx.astype(jnp.float32)
    curves = []
    for c in range(C):
        lo_x = br_ref[:, 0, c * W : (c + 1) * W]
        lo_y = br_ref[:, 1, c * W : (c + 1) * W]
        hi_x = br_ref[:, 2, c * W : (c + 1) * W]
        hi_y = br_ref[:, 3, c * W : (c + 1) * W]
        curve = floor1_db_value(
            bresenham_idx(lo_x, lo_y, hi_x, hi_y, binx_f))
        used = used_ref[:, c][:, None]  # f32 0/1
        curves.append(curve * used)

    # ---- inverse coupling (static steps, reverse order) ----
    res = [res_ref[:, c * W : (c + 1) * W] for c in range(C)]
    for mag, ang in reversed(steps):
        m = res[mag]
        a = res[ang]
        mpos = m > 0
        apos = a > 0
        new_m = jnp.where(mpos, jnp.where(apos, m, m + a),
                          jnp.where(apos, m, m - a))
        new_a = jnp.where(mpos, jnp.where(apos, m - a, m),
                          jnp.where(apos, m + a, m))
        res[mag] = new_m
        res[ang] = new_a

    for c in range(C):
        out_ref[:, c * W : (c + 1) * W] = curves[c] * res[c]


def fused_floor_couple(
    brackets: jnp.ndarray,  # f32 [T, 4, C, W] (lo_x, lo_y, hi_x, hi_y)
    residue: jnp.ndarray,  # f32 [T, C, W]
    used: jnp.ndarray,  # bool [T, C]
    steps: tuple,  # static coupling (mag, ang) list
    rows: int = 32,  # VMEM budget: ~12 [rows, C*W] f32 temporaries < 16MB
) -> jnp.ndarray:
    """Returns spectra f32 [T, C, W] = floor_curve * coupled_residue."""
    T, _, C, W = brackets.shape
    pad = (-T) % rows
    br = jnp.pad(brackets.reshape(T, 4, C * W), [(0, pad), (0, 0), (0, 0)])
    rs = jnp.pad(residue.reshape(T, C * W), [(0, pad), (0, 0)])
    us = jnp.pad(used.astype(jnp.float32), [(0, pad), (0, 0)])
    grid = (br.shape[0] // rows,)
    kern = functools.partial(_kernel, C=C, W=W, steps=tuple(steps))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((br.shape[0], C * W), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, 4, C * W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, C * W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, C * W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(br, rs, us)
    return out[:T].reshape(T, C, W)

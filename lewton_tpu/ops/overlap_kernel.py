"""Pallas kernel: windowed overlap-add + i16 conversion in ONE HBM pass.

The decode tail (ref parity: lewton src/audio.rs:1082-1154 overlap-add +
src/samples.rs:91-103 i16 clamp) is pure elementwise work, but XLA refuses
to fuse it: the operands are slices of the IMDCT output at several
*different* column offsets (one of them, (n1-n0)/4, is not lane-aligned)
selected per packet, plus a one-packet shift along time. XLA materializes
every such operand — at S=256/T=128 that is ~1.9 GB of HBM intermediates
and ~40% of the measured chunk time (see PERF.md / CLAUDE.md bisection).

Here the whole tail is one kernel: each grid step owns R packets of one
stream, reads their IMDCT rows (plus the previous block's last row via a
second, block-shifted view of the same array — no halo DMA), applies the
window slopes from VMEM-resident vectors, and writes i16 directly.
HBM traffic: 2x audio reads + 1x i16 write (~1.3 GB vs ~3.8 GB).

Float semantics are bit-identical to ops/windowing.overlap_add_i16_batch
(same operand values, same op order: a*lhs + pwr*rhs, x32768, clamp,
trunc) — asserted by tests/test_overlap_kernel.py in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["overlap_i16_pallas", "pallas_overlap_supported"]

ROWS = 16  # packets per grid step; 16 = s16 sublane tile


def pallas_overlap_supported(n0: int, n1: int, T: int) -> bool:
    """Lane-alignment envelope for the kernel (else use the XLA path)."""
    outw = 3 * n1 // 4
    return n1 >= 512 and n1 % 256 == 0 and outw % 128 == 0 and T >= 1


def _kernel(a_ref, b_ref, sc_ref, sl_ref, pwr0_ref, out_ref, *,
            C, n0, n1, R):
    W = n1 // 2
    outw = 3 * n1 // 4
    ls = (n1 - n0) // 4
    m_start = (3 * n1 - n0) // 4
    sw = n0 // 2  # short right-region / overlap width

    # per-row scalars (f32 columns; lens are integers < 2^24, exact)
    use_s1 = sc_ref[:, 0:1]
    use_r1 = sc_ref[:, 1:2]
    ls_on = sc_ref[:, 2:3]
    pl_is_l = sc_ref[:, 3:4]
    pl_is_m = sc_ref[:, 4:5]
    is_t0 = sc_ref[:, 5:6]
    ov_len = sc_ref[:, 6:7]
    out_len = sc_ref[:, 7:8]

    slope0 = sl_ref[0:1, :]  # [1, W] (zero past n0/2)
    slope1 = sl_ref[1:2, :]
    rev0 = sl_ref[2:3, :]  # slope0[:n0/2] reversed, zero-padded
    rev1 = sl_ref[3:4, :]  # slope1 reversed
    lhs = jnp.where(use_s1 > 0, slope1, slope0)  # [R, W]
    rhs = jnp.where(use_r1 > 0, rev1, rev0)

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1).astype(jnp.float32)
    iota_ow = jax.lax.broadcasted_iota(
        jnp.int32, (R, outw), 1).astype(jnp.float32)

    for c in range(C):
        row = a_ref[:, c, :]  # [R, n1]
        # previous packet's row: last row of the block-shifted view for the
        # first row in the block, in-block neighbor otherwise
        prev = jnp.concatenate([b_ref[R - 1 : R, c, :], a_ref[: R - 1, c, :]],
                               axis=0)
        a_cur = jnp.where(ls_on > 0, row[:, ls : ls + outw], row[:, :outw])

        cand_l = prev[:, W:]  # [R, W] long&next right region
        cand_m = prev[:, m_start : m_start + sw]  # long&!next (short-in-long)
        cand_s = prev[:, sw : 2 * sw]  # short
        pwr_sm = jnp.where(pl_is_m > 0, cand_m, cand_s)  # [R, sw]
        if sw < W:
            pwr_sm = jnp.concatenate(
                [pwr_sm, jnp.zeros((R, W - sw), jnp.float32)], axis=1)
        pwr = jnp.where(pl_is_l > 0, cand_l, pwr_sm)
        pwr = jnp.where(is_t0 > 0, pwr0_ref[c, :][None, :], pwr)

        mix = jnp.where(iota_w < ov_len,
                        a_cur[:, :W] * lhs + pwr * rhs, a_cur[:, :W])
        full = jnp.concatenate([mix, a_cur[:, W:]], axis=1)  # [R, outw]
        outf = jnp.where(iota_ow < out_len, full, jnp.float32(0.0))
        scaled = outf * jnp.float32(32768.0)
        clamped = jnp.clip(scaled, -32768.0, 32767.0)
        out_ref[:, c * outw : (c + 1) * outw] = jnp.trunc(clamped).astype(
            jnp.int16)


def overlap_i16_pallas(
    audio: jnp.ndarray,  # f32 [T, C, n1] IMDCT output
    scal: jnp.ndarray,  # f32 [T, 8] per-packet scalars (see _scalars)
    slopes: jnp.ndarray,  # f32 [4, W] slope0 / slope1 / rev0 / rev1
    pwr0: jnp.ndarray,  # f32 [C, W] carried-in right region
    n0: int,
    n1: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns i16 [T, C, 3n1/4]."""
    T, C, _ = audio.shape
    outw = 3 * n1 // 4
    R = ROWS
    pad = (-T) % R
    if pad:
        audio = jnp.pad(audio, [(0, pad), (0, 0), (0, 0)])
        scal = jnp.pad(scal, [(0, pad), (0, 0)])  # out_len 0 => zero rows
    Tp = T + pad
    grid = (Tp // R,)
    kern = functools.partial(_kernel, C=C, n0=n0, n1=n1, R=R)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Tp, C * outw), jnp.int16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, C, n1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # the same array, one block back (clamped): provides row -1
            pl.BlockSpec((R, C, n1),
                         lambda i: (jnp.maximum(i - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, slopes.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, slopes.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, C * outw), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(audio, audio, scal, slopes, pwr0)
    return out[:T].reshape(T, C, outw)

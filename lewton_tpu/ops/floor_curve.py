"""Batched floor-curve synthesis on device.

Floor 1 (piecewise-linear dB floor, Vorbis I spec 7.2.4): the reference
renders integer Bresenham lines serially (lewton src/audio.rs:503-555). On
TPU we use the closed form of the Bresenham recurrence — after d steps from
(x0, y0) toward (x1, y1):

    y(d) = y0 + base*d + s * floor(d * ady / adx)

with base = trunc((y1-y0)/adx), ady = |y1-y0| - |base|*adx, s = sign(y1-y0),
which reproduces the integer outputs exactly and vectorizes over all bins.
Per bin we need its bracketing *flagged* posts in sorted-x order; a short
fori_loop over the (<=65) posts keeps running (lo, hi) candidates per bin.

Floor 0 (LSP floor, spec 6.2.3): the p/q products over the bark-mapped
cos(omega) vector, vectorized over bins with a fori_loop over coefficient
pairs (masked past the floor's order).

All integer math fits i32: y <= 255*4, d < 4096, ady < adx <= 4096.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["floor1_curve_batch", "floor0_curve_batch"]

BIG_X = jnp.int32(1 << 24)  # sentinel "no post here" x position


def floor1_curve_batch(
    xs: jnp.ndarray,  # i32 [T, C, P] post x positions, sorted ascending, pad BIG_X
    ys: jnp.ndarray,  # i32 [T, C, P] final_y in the same sorted order
    flags: jnp.ndarray,  # bool [T, C, P] step2 flags in sorted order (pad False)
    mult: jnp.ndarray,  # i32 [T, C] floor multiplier
    db_c0: float,  # inverse-dB table exp constants (tables.py)
    db_c1: float,
    width: int,  # n1//2 (bins beyond the packet's n/2 are garbage-but-unused)
) -> jnp.ndarray:
    """Returns f32 [T, C, width] floor curve values (inverse-dB domain).

    Each bin's bracketing flagged posts are found with two fused reductions
    over the post axis on packed (x << 11 | y) values: the max such pack with
    x <= bin is the segment start, the min with x > bin the segment end.
    (x < 2^15 per spec rangebits, y <= 255*4 < 2^11, so packs fit i32 and
    compare in (x, y) lexicographic order; x values are unique per spec.)
    No sequential post walk, no gathers — one reduce-fused pass on the VPU.
    """
    T, C, P = xs.shape
    binx = jax.lax.broadcasted_iota(jnp.int32, (T, C, 1, width), 3)
    ysm = ys * mult[:, :, None]
    pack = (jnp.minimum(xs, jnp.int32(1 << 15)) << 11) | ysm  # [T, C, P]
    pack4 = pack[:, :, :, None]
    xs4 = xs[:, :, :, None]
    fl4 = flags[:, :, :, None]
    NONE_LO = jnp.int32(-1)
    NONE_HI = jnp.int32(2**31 - 1)
    lo = jnp.max(
        jnp.where(fl4 & (xs4 <= binx), pack4, NONE_LO), axis=2
    )  # [T, C, W]
    hi = jnp.min(jnp.where(fl4 & (xs4 > binx), pack4, NONE_HI), axis=2)
    lo_x = lo >> 11
    lo_y = lo & 2047
    no_hi = hi == NONE_HI
    hi_x = jnp.where(no_hi, lo_x + 1, hi >> 11)
    hi_y = jnp.where(no_hi, lo_y, hi & 2047)
    binx = binx[:, :, 0, :]

    # Bresenham closed form between (lo_x, lo_y) and (hi_x, hi_y).
    dy = hi_y - lo_y
    adx = jnp.maximum(hi_x - lo_x, 1)
    ady = jnp.abs(dy)
    base = jnp.sign(dy) * (ady // adx)  # trunc toward zero
    ady_r = ady - jnp.abs(base) * adx
    d = binx - lo_x
    k = (d * ady_r) // adx
    # Past the last flagged post the no_hi substitution gives dy=0 -> y=lo_y,
    # the reference's horizontal tail (render_line(hx, hy, n2, hy)).
    y = lo_y + base * d + jnp.sign(dy) * k
    idx = jnp.clip(y, 0, 255)
    # inverse-dB "lookup" as exp (exact to ~1 ulp; a real gather at this
    # width is ~10x slower on TPU than the fused exp)
    return jnp.exp(
        idx.astype(jnp.float32) * jnp.float32(db_c1) + jnp.float32(db_c0)
    )


def floor0_curve_batch(
    cosc: jnp.ndarray,  # f32 [T, C, Omax] cos(coefficient) values, pad 0
    amp: jnp.ndarray,  # f32 [T, C] packet amplitude (0 => unused)
    order: jnp.ndarray,  # i32 [T, C] floor order
    lfv_scale: jnp.ndarray,  # f32 [T, C] amplitude_offset / ((1<<amp_bits)-1)
    amp_offset: jnp.ndarray,  # f32 [T, C]
    cos_omega: jnp.ndarray,  # f32 [T, C, W] bark-mapped cos(omega) per bin
) -> jnp.ndarray:
    """Returns f32 [T, C, W] LSP floor curve (spec 6.2.3)."""
    T, C, Omax = cosc.shape
    W = cos_omega.shape[-1]
    odd = (order % 2) == 1  # [T, C]
    oddb = odd[:, :, None]
    cw = cos_omega
    one = jnp.float32(1.0)
    p0 = jnp.where(oddb, one - cw * cw, (one - cw) * jnp.float32(0.5))
    q0 = jnp.where(oddb, jnp.float32(0.25), (one + cw) * jnp.float32(0.5))
    # j ranges (inclusive): odd: p j<=(order-3)//2, q j<=(order-1)//2;
    #                       even: both j<=(order-2)//2
    p_hi = jnp.where(odd, (order - 3) // 2, (order - 2) // 2)[:, :, None]
    q_hi = jnp.where(odd, (order - 1) // 2, (order - 2) // 2)[:, :, None]
    jmax = Omax // 2 + 1

    def body(j, pq):
        p, q = pq
        cj_p = cosc[:, :, jnp.minimum(2 * j + 1, Omax - 1)][:, :, None]
        cj_q = cosc[:, :, jnp.minimum(2 * j, Omax - 1)][:, :, None]
        pm = cj_p - cw
        qm = cj_q - cw
        pf = jnp.float32(4.0) * pm * pm
        qf = jnp.float32(4.0) * qm * qm
        p = jnp.where(j <= p_hi, p * pf, p)
        q = jnp.where(j <= q_hi, q * qf, q)
        return p, q

    p, q = jax.lax.fori_loop(0, jmax, body, (p0, q0))
    lfv_common = amp * lfv_scale  # [T, C]
    arg = jnp.float32(0.11512925) * (
        lfv_common[:, :, None] / jnp.sqrt(p + q) - amp_offset[:, :, None]
    )
    curve = jnp.exp(arg)
    return jnp.where((amp > 0)[:, :, None], curve, jnp.float32(0.0))

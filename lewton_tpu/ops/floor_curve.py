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
    inverse_db: jnp.ndarray,  # f32 [256]
    width: int,  # n1//2 (bins beyond the packet's n/2 are garbage-but-unused)
) -> jnp.ndarray:
    """Returns f32 [T, C, width] floor curve values (inverse-dB domain)."""
    T, C, P = xs.shape
    binx = jax.lax.broadcasted_iota(jnp.int32, (T, C, width), 2)
    ysm = ys * mult[:, :, None]

    def body(p, st):
        lo_x, lo_y, hi_x, hi_y = st
        px = xs[:, :, p][:, :, None]  # [T, C, 1]
        py = ysm[:, :, p][:, :, None]
        pf = flags[:, :, p][:, :, None]
        # posts scanned in ascending x: the last eligible (x<=bin) wins as lo,
        # the first eligible (x>bin) wins as hi.
        is_lo = pf & (px <= binx)
        is_hi = pf & (px > binx) & (hi_x == BIG_X)
        lo_x = jnp.where(is_lo, px, lo_x)
        lo_y = jnp.where(is_lo, py, lo_y)
        hi_y = jnp.where(is_hi, py, hi_y)
        hi_x = jnp.where(is_hi, px, hi_x)
        return lo_x, lo_y, hi_x, hi_y

    zero = jnp.zeros((T, C, width), jnp.int32)
    lo_x, lo_y, hi_x, hi_y = jax.lax.fori_loop(
        0, P, body, (zero, zero, jnp.full((T, C, width), BIG_X), zero)
    )

    # Bresenham closed form between (lo_x, lo_y) and (hi_x, hi_y).
    dy = hi_y - lo_y
    adx = jnp.maximum(hi_x - lo_x, 1)
    ady = jnp.abs(dy)
    base = jnp.sign(dy) * (ady // adx)  # trunc toward zero
    ady_r = ady - jnp.abs(base) * adx
    d = binx - lo_x
    k = (d * ady_r) // adx
    y = lo_y + base * d + jnp.sign(dy) * k
    # Past the last flagged post: horizontal at lo_y (ref: render_line(hx, hy,
    # n2, hy), lewton src/audio.rs:258-259).
    y = jnp.where(hi_x == BIG_X, lo_y, y)
    idx = jnp.clip(y, 0, 255)
    return jnp.take(inverse_db, idx, axis=0)


def floor0_curve_batch(
    cosc: jnp.ndarray,  # f32 [T, C, Omax] cos(coefficient) values, pad 0
    amp: jnp.ndarray,  # i32 [T, C] packet amplitude (0 => unused)
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
    lfv_common = amp.astype(jnp.float32) * lfv_scale  # [T, C]
    arg = jnp.float32(0.11512925) * (
        lfv_common[:, :, None] / jnp.sqrt(p + q) - amp_offset[:, :, None]
    )
    curve = jnp.exp(arg)
    return jnp.where((amp > 0)[:, :, None], curve, jnp.float32(0.0))

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
import numpy as np

__all__ = [
    "floor1_curve_batch",
    "floor1_curve_mxu",
    "floor1_brackets_mxu",
    "floor1_render",
    "floor1_step_matrix",
    "floor0_curve_batch",
]

BIG_X = jnp.int32(1 << 24)  # sentinel "no post here" x position

DB_FOUR_FACTOR = True  # A/B knob (r4): False = legacy 16x16 two-factor
#   selects (floor1_db_two_factor). Both meet the same 2-ulp contract;
#   the 4-factor form costs 12 where()s instead of 30.

BRES_SHARED_RCP = False  # A/B knob (r4): True = ONE reciprocal shared by
#   all three floor-quotients in bresenham_idx (floor(x*rcp) + remainder
#   correction) instead of three divisions. MEASURED SLOWER on chip and
#   kept off: interleaved x3 at S=256/T=128, shared-rcp lost ~2% under
#   BOTH dB forms (new 9.451 vs div3 9.262 ms/chunk; db2 9.722 vs legacy
#   9.472) — the TPU div beats the longer mul+floor+correct chain
#   (tools/ab_floor.py, PERF.md r4). (Only affects the "split" form.)

BRES_SINGLE_Q = True  # r5: collapse the Bresenham render to ONE floor
#   quotient. Integer identity (proof in bresenham_idx): with
#   base' = floor(ady/adx) and ady_r = ady - base'*adx,
#       base'*d + floor(d*ady_r/adx) == floor(d*ady/adx),
#   so y = lo_y + sgn*floor(d*ady/adx) replaces the 3-quotient chain
#   (base, two-limb ah/al split, q1/r1, k). The single product d*ady is
#   exact in f32: d < 2^13 (bin index envelope incl. past-the-post
#   evaluation), ady <= 1020 (post ys are index-space values, multiplier
#   folded, <= 255*4), so d*ady < 2^23 < 2^24. The two-limb split
#   existed to keep the SPLIT form's d*ady_r intermediate exact, which
#   the collapsed form never materializes. False = the r1-r4 split form
#   (bit-identical outputs, kept for A/B).

# Flags are read at trace time inside the functions, so a sweep can flip
# them via setattr + jax.clear_caches() (same protocol as the
# overlap-kernel PRE_REV/REV_MXU knobs).


def _db_value_two_factor(idx: jnp.ndarray) -> jnp.ndarray:
    """Legacy 16x16 two-factor select form (A/B reference)."""
    from ..tables import floor1_db_two_factor

    HI, LO = floor1_db_two_factor()
    ih = jnp.floor(idx * jnp.float32(1.0 / 16.0))
    il = idx - ih * jnp.float32(16.0)
    hi = jnp.float32(HI[0]) * jnp.ones_like(idx)
    lo = jnp.float32(LO[0]) * jnp.ones_like(idx)
    for j in range(1, 16):
        hi = jnp.where(ih == j, jnp.float32(HI[j]), hi)
        lo = jnp.where(il == j, jnp.float32(LO[j]), lo)
    return hi * lo


def floor1_db_value(idx: jnp.ndarray) -> jnp.ndarray:
    """Inverse-dB table value for integer-valued f32 idx in [0, 255],
    evaluated as H1[idx>>6] * H0[(idx>>4)&3] * L1[(idx>>2)&3] * L0[idx&3]
    via 4x 4-way fused compare-selects (tables.floor1_db_four_factor,
    max 2 ulp — the same contract as the earlier 16x16 two-factor form,
    at 12 where()s instead of 30; the r4 floor-kernel bisection measured
    this select chain at 0.72 ms/chunk). Replaces the closed-form exp(),
    which is ~51 ulp off on the TPU VPU — up to 11 i16 LSB on full-scale
    adversarial spectra (crafted on-chip conformance)."""
    from ..tables import floor1_db_four_factor

    if not DB_FOUR_FACTOR:
        return _db_value_two_factor(idx)
    H1, H0, L1, L0 = floor1_db_four_factor()
    ia = jnp.floor(idx * jnp.float32(1.0 / 64.0))
    r = idx - ia * jnp.float32(64.0)
    ib = jnp.floor(r * jnp.float32(1.0 / 16.0))
    r = r - ib * jnp.float32(16.0)
    ic = jnp.floor(r * jnp.float32(1.0 / 4.0))
    il = r - ic * jnp.float32(4.0)

    def sel4(s, tab):
        v = jnp.float32(tab[0]) * jnp.ones_like(s)
        for j in range(1, 4):
            v = jnp.where(s == j, jnp.float32(tab[j]), v)
        return v

    hi = sel4(ia, H1) * sel4(ib, H0)
    lo = sel4(ic, L1) * sel4(il, L0)
    return hi * lo


def floor1_curve_batch(
    xs: jnp.ndarray,  # i32 [T, C, P] post x positions, sorted ascending, pad BIG_X
    ys: jnp.ndarray,  # i32 [T, C, P] final_y in the same sorted order
    flags: jnp.ndarray,  # bool [T, C, P] step2 flags in sorted order (pad False)
    mult: jnp.ndarray,  # i32 [T, C] floor multiplier
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
    # a row with NO flagged posts (unused channel / padding) must yield the
    # minimum curve like the bracket-GEMM path, not -1>>11 garbage packs
    # (callers mask via f_used, but the two exported ops should agree)
    no_lo = lo == NONE_LO
    lo_x = jnp.where(no_lo, 0, lo >> 11)
    lo_y = jnp.where(no_lo, 0, lo & 2047)
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
    # inverse-dB lookup as a two-factor product (max 2 ulp; a real gather
    # at this width is ~10x slower on TPU, and exp is ~51 ulp off there)
    return floor1_db_value(idx.astype(jnp.float32))


def floor1_telescopes(
    xs: jnp.ndarray,  # i32 [T, C, P] sorted post x (mode-gathered, pad BIG_X)
    ys: jnp.ndarray,  # i32 [T, C, P] final_y in sorted order
    flags: jnp.ndarray,  # bool [T, C, P]
    mult: jnp.ndarray,  # i32 [T, C]
):
    """Per-post telescoping differences for the bracket GEMMs: returns
    (ex, ey, gx, gy) f32 [T, C, P+1] (see floor1_brackets_mxu). Tiny
    tensors — stays in XLA; consumed by the GEMM here or by the fused
    floor Pallas kernel (ops/floor_kernel.py)."""
    T, C, P = xs.shape
    VX = 1 << 15  # virtual tail post x (beyond any real x)
    ysm = ys * mult[:, :, None]
    fl = flags
    iota_p = jnp.arange(P, dtype=jnp.int32)

    # previous-flagged (x, y) per post via tiny cummax scans over P
    tagx = jnp.where(fl, (iota_p << 16) | jnp.minimum(xs, VX), -1)
    tagy = jnp.where(fl, (iota_p << 11) | ysm, -1)
    cx = jax.lax.cummax(tagx, axis=2)
    cy = jax.lax.cummax(tagy, axis=2)
    shift = lambda a: jnp.concatenate(  # noqa: E731
        [jnp.full_like(a[:, :, :1], -1), a[:, :, :-1]], axis=2)
    prevx = jnp.where(shift(cx) < 0, 0, shift(cx) & 0xFFFF)
    prevy = jnp.where(shift(cy) < 0, 0, shift(cy) & 0x7FF)
    # next-flagged via reversed scans
    rev = lambda a: a[:, :, ::-1]  # noqa: E731
    ntagx = jnp.where(fl, ((P - 1 - iota_p) << 16) | jnp.minimum(xs, VX), -1)
    ntagy = jnp.where(fl, ((P - 1 - iota_p) << 11) | ysm, -1)
    nx_ = rev(jax.lax.cummax(rev(ntagx), axis=2))
    ny_ = rev(jax.lax.cummax(rev(ntagy), axis=2))
    shiftr = lambda a: jnp.concatenate(  # noqa: E731
        [a[:, :, 1:], jnp.full_like(a[:, :, :1], -1)], axis=2)
    # last flagged y (for the virtual tail post)
    last_y = jnp.where(cy[:, :, -1] < 0, 0, cy[:, :, -1] & 0x7FF)  # [T, C]
    nextx = jnp.where(shiftr(nx_) < 0, VX, shiftr(nx_) & 0xFFFF)
    nexty = jnp.where(shiftr(ny_) < 0, last_y[:, :, None], shiftr(ny_) & 0x7FF)

    flf = fl.astype(jnp.float32)
    xsf = jnp.minimum(xs, VX).astype(jnp.float32)
    ysf = ysm.astype(jnp.float32)
    ex = flf * (xsf - prevx.astype(jnp.float32))
    ey = flf * (ysf - prevy.astype(jnp.float32))
    gx = flf * (xsf - nextx.astype(jnp.float32))
    gy = flf * (ysf - nexty.astype(jnp.float32))
    # virtual tail post: x = VX, y = last flagged y; only participates in g
    zero = jnp.zeros((T, C, 1), jnp.float32)
    ex = jnp.concatenate([ex, zero], axis=2)
    ey = jnp.concatenate([ey, zero], axis=2)
    gx = jnp.concatenate([gx, jnp.full((T, C, 1), np.float32(VX))], axis=2)
    gy = jnp.concatenate([gy, last_y[:, :, None].astype(jnp.float32)], axis=2)
    return ex, ey, gx, gy


def floor1_brackets_mxu(
    xs: jnp.ndarray,  # i32 [T, C, P] sorted post x (mode-gathered, pad BIG_X)
    ys: jnp.ndarray,  # i32 [T, C, P] final_y in sorted order
    flags: jnp.ndarray,  # bool [T, C, P]
    mult: jnp.ndarray,  # i32 [T, C]
    mode: jnp.ndarray,  # i32 [T]
    step: jnp.ndarray,  # f32 [C, M*(P+1), W] static (xs[m,c,p] <= w),
    #                     pre-transposed GEMM layout (floor1_step_matrix)
    width: int | None = None,  # must match step.shape[2] when given
):
    """floor1 post-bracketing on the MXU -> 4-tuple of [T, C, W] tensors
    (lo_x, lo_y, hi_x, hi_y); W is fixed by the step matrix.

    Telescoping trick: along the sorted flagged posts, emit per post the
    difference to the previous flagged post (e) and to the next (g, with a
    virtual horizontal-tail post at x=2^15 carrying the last flagged y).
    Then for every bin w,

        lo(w) = sum_p e_p * [x_p <= w]      (last flagged post at/before w)
        hi(w) = sum_p g_p - sum_p g_p * [x_p <= w]   (first flagged after w)

    and [x_p <= w] is *setup-static* per (mode, channel, post) — so the
    whole bracketing search is four [T,P+1]x[P+1,W] matmuls against a
    constant step matrix, instead of a P-pass compare sweep on the VPU
    (~6x less vector work; integer values stay < 2^20, exact in f32).
    x and y telescope separately so partial sums stay exactly representable.
    """
    T, C, P = xs.shape
    ex, ey, gx, gy = floor1_telescopes(xs, ys, flags, mult)

    m = step.shape[1] // (P + 1)
    oh = (mode[:, None] == jnp.arange(m, dtype=jnp.int32)).astype(jnp.float32)
    # HIGH (3-pass bf16) is exact here: all values are integers < 2^20 and
    # three bf16 limbs cover 24 mantissa bits; ~2x cheaper than HIGHEST
    hp = jax.lax.Precision.HIGH

    # one batched GEMM for all four telescopes: fold the mode one-hot into
    # the value tensor ([T,C,4,M*(P+1)]) against the pre-transposed step
    # matrix — the [M,C,P,W]->GEMM-layout transpose must NOT happen inside
    # the traced program (a per-call relayout costs ~50x the matmul).
    # four separate GEMMs (not one [.., 4, W] batch): each output stays a
    # contiguous [T, C, W] tensor the downstream elementwise render can
    # fuse over, instead of strided slices of a 4x buffer
    def contract(v):
        vm = (v[:, :, None, :] * oh[:, None, :, None]).reshape(
            T, C, m * (P + 1))
        return jnp.einsum("tcp,cpw->tcw", vm, step, precision=hp)

    lo_x = contract(ex)
    lo_y = contract(ey)
    hi_x = jnp.sum(gx, axis=2, keepdims=True) - contract(gx)
    hi_y = jnp.sum(gy, axis=2, keepdims=True) - contract(gy)
    # tuple of contiguous [T, C, W] tensors (integer-valued f32)
    return lo_x, lo_y, hi_x, hi_y


def floor1_curve_mxu(xs, ys, flags, mult, mode, step, width=None):
    """Unfused MXU floor1 curve: brackets + elementwise render."""
    br = floor1_brackets_mxu(xs, ys, flags, mult, mode, step, width)
    return floor1_render(br)


def floor1_render(brackets):
    """Elementwise finish of the MXU bracket search: Bresenham closed form
    + inverse-dB exp. brackets = 4-tuple of [T, C, W] f32 -> curve.
    (The fused Pallas path in ops/synth_kernel.py does this in-VMEM.)

    All arithmetic stays in f32 with a two-limb split so every intermediate
    is an exactly-representable integer (< 2^24): d < 2^12, ady_r < 2^15 is
    split as ah*64+al so the products stay < 2^22, and both floor-divisions
    have quotients < 2^24/adx, where correctly-rounded f32 division cannot
    cross an integer. Integer divisions would be exact too, but act as XLA
    fusion barriers and cost far more VPU cycles.
    """
    lo_x, lo_y, hi_x, hi_y = brackets
    T, C, width = lo_x.shape
    binx = jax.lax.broadcasted_iota(
        jnp.int32, (T, C, width), 2).astype(jnp.float32)
    return floor1_db_value(bresenham_idx(lo_x, lo_y, hi_x, hi_y, binx))


def bresenham_idx(lo_x, lo_y, hi_x, hi_y, binx_f):
    """Exact-f32 closed-form integer Bresenham between the bracketing
    posts -> clipped floor1 index in [0, 255] (f32). All operands f32
    integer-valued.

    THE one copy of the numerics contract (floor1_render and both Pallas
    kernels call this; pure jnp, so it traces identically inside Pallas):
    every intermediate is an exactly-representable integer (< 2^24):
    d < 2^12, ady_r < 2^15 is split as ah*64 + al so the products stay
    < 2^22, and every floor-quotient is recovered exactly from a
    reciprocal-multiply candidate plus one remainder correction (bound
    argument inline). Integer divisions would be exact too, but act as
    XLA fusion barriers and cost far more VPU cycles."""
    one64 = jnp.float32(64.0)
    dy = hi_y - lo_y
    adx = jnp.maximum(hi_x - lo_x, jnp.float32(1.0))
    sgn = jnp.sign(dy)
    ady = jnp.abs(dy)
    # ONE division per element: all three floor-quotients share divisor
    # adx, so compute its reciprocal once and floor(x * rcp) instead.
    # Exactness: every quotient here is < 2^20 (single-q: d*ady < 2^20;
    # split form: base <= 1020; q1 = floor(d*ah/adx) < d/64 <= 64 since
    # ah < adx/64; the last quotient <= k + 64 <= d + 64 < 2^13), so the
    # candidate's absolute error <= q * 2 ulp < 2^20 * 2^-23 << 1 and the
    # +/-1 remainder correction in floorq recovers the exact integer
    # floor (q * adx <= x + adx < 2^24 stays exact for the remainder).
    rcp = jnp.float32(1.0) / adx if BRES_SHARED_RCP else None

    def floorq(x):
        q = jnp.floor(x * rcp if BRES_SHARED_RCP else x / adx)
        r = x - q * adx
        q = q + jnp.where(r >= adx, jnp.float32(1.0), jnp.float32(0.0))
        q = q - jnp.where(r < 0, jnp.float32(1.0), jnp.float32(0.0))
        return q

    d = binx_f - lo_x
    if BRES_SINGLE_Q:
        # Collapsed form: y = lo_y + sgn * floor(d*ady/adx). Identity with
        # the split form below: write ady = base'*adx + ady_r with
        # base' = floor(ady/adx), 0 <= ady_r < adx; then
        #   floor(d*ady/adx) = d*base' + floor(d*ady_r/adx),
        # and the reference's render is y0 + sgn*base'*d + sgn*#err-steps
        # with #err-steps(d) = floor(d*ady_r/adx) (the Bresenham error
        # accumulator err += ady_r crosses adx exactly that many times in
        # d steps; ref src/audio.rs:503-524). Exact in f32: d < 2^13 and
        # ady <= 1020 give d*ady < 2^23 exact; the division's quotient
        # error is <= q*2^-23 < 1 and floorq's correction needs
        # q*adx <= d*ady + adx < 2^24, which holds.
        y = lo_y + sgn * floorq(d * ady)
        return jnp.clip(y, jnp.float32(0.0), jnp.float32(255.0))
    base = sgn * floorq(ady)  # == trunc(dy/adx)
    ady_r = ady - jnp.abs(base) * adx
    ah = jnp.floor(ady_r * jnp.float32(1.0 / 64.0))  # pow2: exact
    al = ady_r - ah * one64
    a_hi = d * ah
    q1 = floorq(a_hi)
    r1 = a_hi - q1 * adx
    k = q1 * one64 + floorq(r1 * one64 + d * al)
    y = lo_y + base * d + sgn * k
    return jnp.clip(y, jnp.float32(0.0), jnp.float32(255.0))


def floor1_step_matrix(f1_xs: "np_like", width: int):
    """Static step matrix (xs <= w) for floor1_curve_mxu in GEMM layout
    [C, M*(P+1), W]; the virtual tail post row is all-zero (its x is beyond
    every bin)."""
    xs = np.asarray(f1_xs)  # [M, C, P]
    M, C, P = xs.shape
    w = np.arange(width)
    step = (xs[..., None] <= w).astype(np.float32)  # [M, C, P, W]
    step = np.concatenate(
        [step, np.zeros((M, C, 1, width), np.float32)], axis=2
    )
    return np.ascontiguousarray(
        step.transpose(1, 0, 2, 3).reshape(C, M * (P + 1), width)
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
    # saturate just inside the f32 exp overflow edge (~88.72) instead of
    # inf (then NaN via 0 residue); matches libvorbis's f32-rounded value
    # for any arg below the edge — see floor.floor0_curve for the full
    # divergence-window note (libvorbis computes exp in double)
    curve = jnp.exp(jnp.minimum(arg, jnp.float32(88.7)))
    return jnp.where((amp > 0)[:, :, None], curve, jnp.float32(0.0))

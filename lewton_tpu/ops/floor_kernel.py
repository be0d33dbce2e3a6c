"""Pallas kernel: floor1 brackets GEMM + render + coupling + floor x residue.

One kernel runs the whole spectra synthesis for a chunk row-block: the
bracket contraction on the MXU, the exact-f32 Bresenham render, static
inverse coupling, and the floor x residue product — reading the residue
frames in their NATIVE [T, C*W] row-major layout and writing spectra the
same way.

Why this beats the XLA chain it replaces (measured r2: ~6.5 ms of a 15 ms
chunk at S=256/T=128):
- XLA's layout assignment runs the floor chain T-minor (driven by the
  bracket GEMM), so the residue *input* pays two full relayout passes
  (~1.7 ms) before coupling even starts. Here every operand keeps its
  natural layout.
- The four bracket GEMMs materialize 4 x [S,T,C,W] f32 (940 MB) that the
  render immediately re-reads. Here the brackets never leave VMEM.
- The step matrix entries are 0/1 — EXACT in bf16 — so a 2-limb bf16
  split of the telescope values gives an integer-exact contraction in 2
  MXU passes (XLA's HIGH needs 3). Stacking (4 telescopes x 2 limbs x 16
  rows) = 128 GEMM rows fills the MXU's M dimension.

Exactness argument (mirrors floor_curve.floor1_brackets_mxu): telescope
values are integers |v| < 2^15; the bf16 limbs v1 = bf16(v),
v2 = v - v1 are exact integers (|v2| <= 2^6); products with a 0/1 matrix
are exact; any partial sum is bounded by 54 * 2^15 < 2^24, so f32
accumulation never rounds. The result equals the XLA path bit for bit.

ref parity: lewton src/audio.rs:437-555 (floor1 amplitude render),
:762-777 (inverse coupling), :1007-1039 (floor x residue) — reformulated
for the MXU/VPU rather than translated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .floor_curve import bresenham_idx, floor1_db_value

__all__ = ["floor_spectra_pallas", "pallas_floor_supported"]

MAX_ROWS = 64  # packets per grid step: 4 telescopes x 2 limbs x 64 = 512 MXU rows (measured best)

# ---------------------------------------------------------------------- #
# Intra-kernel bisection knobs (tools/bisect_floor.py). TIMING ONLY:
# each replaces one phase of the kernel with a near-free stand-in,
# BREAKING numerics, to attribute chunk time inside the kernel
# (jax.clear_caches() required after flipping). Never enabled by
# library code or tests.
# ---------------------------------------------------------------------- #
_B_NO_FOLD = False  # skip the mode one-hot fold + 2-limb bf16 split
_B_NO_GEMM = False  # skip the bracket GEMM (broadcast a column instead)
_B_NO_BRES = False  # skip the Bresenham render (clip lo_y instead)
_B_NO_DB = False  # skip the inverse-dB two-factor select (scale instead)
_B_NO_COUPLE = False  # skip inverse coupling


def pallas_floor_supported(cs, T: int) -> bool:
    """Gate: floor1-only setups with static coupling and lane-aligned
    spectral width (the generic XLA path remains for the rest). Channel
    and mode counts are bounded to keep the unrolled kernel body and its
    VMEM blocks sane — spec-legal extremes (255 channels, 64 modes) fall
    back to the XLA path."""
    if not (cs.has_floor1 and not cs.has_floor0
            and cs.static_coupling is not None
            and cs.w_eff % 128 == 0 and cs.w_eff >= 128
            and (cs.w_eff * cs.channels) % 128 == 0):
        return False
    M = cs.f1_step.shape[1] // (cs.max_posts + 1)
    if not (cs.channels <= 8 and M * (cs.max_posts + 1) <= 2048
            and cs.channels * cs.w_eff <= 16384):
        return False
    # VMEM footprint of the resident blocks: the per-dimension bounds
    # above still admit setups whose PRODUCT explodes (e.g. C=8 x
    # Kp=2048 x W=2048 step = 64 MB in ~16 MB VMEM — Mosaic would fail
    # to compile instead of falling back to XLA)
    Kp = -(-M * (cs.max_posts + 1) // 128) * 128
    step_b = cs.channels * Kp * cs.w_eff * 2  # bf16 step matrix
    res_b = MAX_ROWS * cs.channels * cs.w_eff * 4  # residue block
    out_b = cs.channels * MAX_ROWS * cs.w_eff * 4  # f32 out block
    return step_b + res_b + out_b <= 10 * 1024 * 1024


def _kernel(*refs, C, W, P1, M, R, Kp, steps, ct_out, cd_n):
    if cd_n:
        tele_ref, res_ref, sc_ref, step_ref, tw_ref, out_ref = refs
    else:
        tele_ref, res_ref, sc_ref, step_ref, out_ref = refs
    mode = sc_ref[:, 0:1]  # f32 [R, 1]
    binx_f = jax.lax.broadcasted_iota(
        jnp.int32, (R, W), 1).astype(jnp.float32)

    curves = []
    res = []
    for c in range(C):
        # ---- bracket contraction: one [8R, M*P1] @ [M*P1, W] GEMM ----
        rows = []
        for q in range(4):
            v = tele_ref[:, (c * 4 + q) * P1 : (c * 4 + q + 1) * P1]
            if _B_NO_FOLD:  # bisect stand-in: no fold, no limb split
                seg = jnp.concatenate(
                    [v, jnp.zeros((R, Kp - P1), jnp.float32)], axis=1)
                s1 = seg.astype(jnp.bfloat16)
                rows += [s1, s1]
                continue
            # mode one-hot fold into the M*P1 segment layout
            seg = jnp.concatenate(
                [v * jnp.where(mode == m, jnp.float32(1.0), jnp.float32(0.0))
                 for m in range(M)], axis=1)  # [R, M*P1]
            # pad K to the 128-lane MXU width: Mosaic cannot concatenate
            # narrow vectors sitting at mismatched lane offsets (seen at
            # M*P1=7), and the MXU pads K to 128 internally anyway
            seg = jnp.concatenate(
                [seg, jnp.zeros((R, Kp - M * P1), jnp.float32)], axis=1)
            s1 = seg.astype(jnp.bfloat16)
            s2 = (seg - s1.astype(jnp.float32)).astype(jnp.bfloat16)
            rows += [s1, s2]
        lhs = jnp.concatenate(rows, axis=0)  # bf16 [8R, Kp]
        if _B_NO_GEMM:  # bisect stand-in: broadcast one column
            outg = jnp.broadcast_to(
                lhs[:, :1].astype(jnp.float32), (8 * R, W))
        else:
            outg = jnp.dot(lhs, step_ref[c],
                           preferred_element_type=jnp.float32)  # [8R, W]
        br = [outg[2 * q * R : (2 * q + 1) * R]
              + outg[(2 * q + 1) * R : (2 * q + 2) * R] for q in range(4)]
        lo_x, lo_y, gxc, gyc = br
        gx_full = jnp.sum(
            tele_ref[:, (c * 4 + 2) * P1 : (c * 4 + 3) * P1],
            axis=1, keepdims=True)
        gy_full = jnp.sum(
            tele_ref[:, (c * 4 + 3) * P1 : (c * 4 + 4) * P1],
            axis=1, keepdims=True)
        hi_x = gx_full - gxc
        hi_y = gy_full - gyc

        # ---- exact f32 Bresenham + inverse-dB exp (the ONE shared
        # copy of the numerics contract: floor_curve.bresenham_idx) ----
        if _B_NO_BRES:  # bisect stand-in: clip only
            idx = jnp.clip(lo_y, jnp.float32(0.0), jnp.float32(255.0))
        else:
            idx = bresenham_idx(lo_x, lo_y, hi_x, hi_y, binx_f)
        curve = idx * jnp.float32(1e-3) if _B_NO_DB \
            else floor1_db_value(idx)
        used = sc_ref[:, 1 + c : 2 + c]  # f32 0/1
        curves.append(curve * used)
        r = res_ref[:, c * W : (c + 1) * W]
        res.append(r.astype(jnp.float32) if r.dtype != jnp.float32 else r)

    # ---- inverse coupling (static steps, reverse order) ----
    for mag, ang in reversed(steps) if not _B_NO_COUPLE else ():
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

    if cd_n:
        # ---- fused Wang-split pre-butterfly (ops/imdct.dct4_split_uv_ct):
        # emit (c || d) per channel so the split's twiddle rotation never
        # costs an XLA pass; x is zero past W (the w_eff clip), and the
        # reversal reuses the overlap kernel's XOR-exchange network ----
        from .overlap_kernel import _rev_lanes

        N = cd_n
        H = N // 2
        ct = tw_ref[0:1, :]  # [1, H] cos(theta)
        st = tw_ref[1:2, :]
        for c in range(C):
            x = curves[c] * res[c]  # [R, W]
            if W < N:
                x = jnp.concatenate(
                    [x, jnp.zeros((R, N - W), jnp.float32)], axis=1)
            b = _rev_lanes(x, N)[:, :H]  # b_k = x_{N-1-k}
            a = x[:, :H]
            cc = ct * a + st * b
            dd = ct * b - st * a
            out_ref[c, :, :] = jnp.concatenate([cc, dd], axis=1)
        return

    for c in range(C):
        if ct_out:
            out_ref[c, :, :] = curves[c] * res[c]
        else:
            out_ref[:, c * W : (c + 1) * W] = curves[c] * res[c]


def _split_twiddles(N: int) -> jnp.ndarray:
    """[2, N/2] (cos, sin) of theta_k = pi(2k+1)/(4N) for the fused
    Wang-split butterfly (tables.dct4_split_tables holds the same values;
    regenerated here from N alone so the kernel entry stays simple)."""
    from ..tables import dct4_split_tables

    _, _, ct, st = dct4_split_tables(2 * N)
    return jnp.stack([jnp.asarray(ct), jnp.asarray(st)])


def floor_spectra_pallas(
    tele: jnp.ndarray,  # f32 [T, C*4*(P+1)] packed telescopes (c-major)
    residue: jnp.ndarray,  # i16|f32 [T, C*W] raw residue frames
    scal: jnp.ndarray,  # f32 [T, 1+C]: mode, f_used per channel
    step: jnp.ndarray,  # bf16 [C, M*(P+1), W] 0/1 step matrix
    steps: tuple,  # static coupling (mag, ang) list
    C: int,
    W: int,
    M: int,
    ct_out: bool = False,
    cd_n: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns spectra f32 [T, C, W] = floor_curve * coupled_residue —
    or [C, T, W] with ``ct_out`` (the layout the downstream ctk,kn IMDCT
    GEMM consumes as a bitcast; [T, C, W] costs a 235 MB relayout).

    With ``cd_n = n1/2`` (requires ct_out), the output is instead the
    Wang-split butterfly pair [C, T, cd_n] = (c || d) feeding the two
    half-FLOP GEMMs (ops/imdct.dct4_split_uv_ct documents the math; the
    rotation happens here in VMEM so it costs no XLA pass)."""
    T = tele.shape[0]
    P1 = tele.shape[1] // (4 * C)
    R = min(MAX_ROWS, -(-T // 8) * 8)
    Kp = -(-(step.shape[1]) // 128) * 128
    step = jnp.concatenate(
        [step, jnp.zeros((step.shape[0], Kp - step.shape[1], step.shape[2]),
                         step.dtype)], axis=1)
    pad = (-T) % R
    if pad:
        tele = jnp.pad(tele, [(0, pad), (0, 0)])
        residue = jnp.pad(residue, [(0, pad), (0, 0)])
        scal = jnp.pad(scal, [(0, pad), (0, 0)])
    Tp = T + pad
    assert not cd_n or ct_out
    kern = functools.partial(_kernel, C=C, W=W, P1=P1, M=M, R=R, Kp=Kp,
                             steps=tuple(steps), ct_out=ct_out, cd_n=cd_n)
    Wo = cd_n if cd_n else W
    out_shape = (jax.ShapeDtypeStruct((C, Tp, Wo), jnp.float32) if ct_out
                 else jax.ShapeDtypeStruct((Tp, C * W), jnp.float32))
    out_spec = (pl.BlockSpec((C, R, Wo), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM) if ct_out
                else pl.BlockSpec((R, C * W), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(Tp // R,),
        in_specs=[
            pl.BlockSpec((R, tele.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C * W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, scal.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, step.shape[1], W), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((2, cd_n // 2), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)] if cd_n else []),
        out_specs=out_spec,
        interpret=interpret,
    )(tele, residue, scal, step,
      *((_split_twiddles(cd_n),) if cd_n else ()))
    if ct_out:
        return out[:, :T]  # [C, T, W]
    return out[:T].reshape(T, C, W)

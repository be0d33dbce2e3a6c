"""Pallas kernel: windowed overlap-add + i16 conversion in ONE HBM pass.

The decode tail (ref parity: lewton src/audio.rs:1082-1154 overlap-add +
src/samples.rs:91-103 i16 clamp) is pure elementwise work, but XLA refuses
to fuse it: the operands are slices of the IMDCT output at several
*different* column offsets (one of them, (n1-n0)/4, is not lane-aligned)
selected per packet, plus a one-packet shift along time. XLA materializes
every such operand — at S=256/T=128 that is ~1.9 GB of HBM intermediates
and ~40% of the measured chunk time (see PERF.md / CLAUDE.md bisection).

Here the whole tail is one kernel: each grid step owns R packets of one
(stream, channel), reads their IMDCT rows (plus the previous block's last
row via a second, block-shifted view of the same array — no halo DMA),
applies the window slopes from VMEM-resident vectors, and writes i16.

Layout contract (the part that makes it fast): the long/short inputs are
taken as [C, T, n] — a pure relabeling of the IMDCT GEMM's preferred
{n-minor, T-second-minor} physical layout, so XLA's layout assignment can
feed the custom call with a bitcast instead of a 537 MB relayout copy.
The per-packet long/short blocksize select also happens here in VMEM (the
GEMM outputs are passed unselected, see imdct_batch_parts): fusing that
select into a custom-call operand is impossible for XLA. The i16 output
is [T, C*outw] with channels on the lane axis (grid-blocked per channel),
which reshapes to [T, C, outw] for free.

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

__all__ = ["overlap_i16_pallas", "pallas_overlap_supported",
           "pallas_x_rep_supported"]

MAX_ROWS = 128  # packets per grid step (s16 sublane tile is 16;
#   bigger blocks amortize per-step overhead — measured 16->128: +15%)

PRE_REV = True  # x_rep fallback when REV_MXU is off (or the width is
#   not lane-aligned): feed XLA-computed flip(X) as an extra
#   operand instead of reversing lanes in-kernel (A/B knob; see
#   _kernel_x docstring and PERF.md r3)

REV_MXU = True  # x_rep path: reverse lanes IN-KERNEL on the MXU
#   (anti-identity permutation dot, exact u8-limb split — see
#   _rev_lanes_mxu). Skips pre_rev's whole-tensor XLA flip pass (the
#   single biggest phase in the r4 bisection: ~1.9 ms/chunk of HBM
#   traffic) AND the _rev_lanes roll network (2.6 ms of VPU shuffles)
#   by spending otherwise-idle MXU time instead. Takes precedence over
#   PRE_REV when set. DEFAULT ON: interleaved A/B x3 on chip measured
#   47.6k vs 40.3k (+18.2%) at scan-8/S=256/T=128; gate green (r4).


VMEM_OPERAND_BUDGET = 6 * 1024 * 1024  # bytes of resident operand blocks
#   per grid step; leaves ~2x headroom in ~16 MiB VMEM for the kernel's
#   concat/select temporaries (measured safe at the production shape)

# ---------------------------------------------------------------------- #
# Intra-kernel bisection knobs (tools/bisect_overlap.py). TIMING ONLY:
# each knocks one phase of the x_rep kernel out, BREAKING numerics, to
# attribute chunk time inside the kernel (jax.clear_caches() required
# after flipping). Never enabled by library code or tests.
# ---------------------------------------------------------------------- #
_B_NO_FLIP = False    # feed X itself as "rev(X)" (skip the XLA flip pass)
_B_NO_LS = False      # skip the lapped-start (ls) window variant
_B_NO_SHORT = False   # skip the short-block assembly/selects
_B_NO_MIX = False     # skip the window mix FMA (out = a_cur)
_B_NO_PWRSEL = False  # previous-row region select -> pwr0 broadcast
_B_NO_CARRY = False   # skip the carry (pwr_out) computation


def _max_block_rows(n0: int, n1: int) -> int:
    """Largest packet-row block R (multiple of 16, <= MAX_ROWS) whose
    resident VMEM operand blocks fit VMEM_OPERAND_BUDGET.

    Counts the worst case across kernel variants — they are byte-identical:
    the audio form holds 2 long [1,R,n1] + 2 short [1,R,n0] f32 blocks
    (cur + prev view), the x_rep + PRE_REV form holds 4 long + 4 short
    half-width blocks (cur/prev x plain/reversed — the pre_rev doubling
    exactly cancels the x_rep halving) — plus the [R, C*outw_c] i16 out
    block (outw per channel; the lane axis is blocked per channel so one
    channel's outw is resident) and the small scal/slope/pwr blocks."""
    outw = 3 * n1 // 4
    per_row = 8 * (n1 + n0) + 2 * outw + 64
    r = min(MAX_ROWS, (VMEM_OPERAND_BUDGET // per_row) // 16 * 16)
    return max(r, 0)


def pallas_overlap_supported(n0: int, n1: int, T: int, C: int = 2) -> bool:
    """Lane-alignment + VMEM envelope for the kernel (else the XLA path)."""
    outw = 3 * n1 // 4
    return (n1 >= 512 and n1 % 256 == 0 and outw % 128 == 0 and T >= 1
            and C <= 16 and _max_block_rows(n0, n1) >= 16)


def pallas_x_rep_supported(n0: int, n1: int, T: int, C: int = 2) -> bool:
    """Extra gate for the half-width DCT-IV input form: the in-kernel
    lane-reversal network wants the short transform length n0/2 to be at
    least one full lane tile."""
    return pallas_overlap_supported(n0, n1, T, C) and n0 >= 256


def _kernel(*refs, n0, n1, R, has_short, has_prev_view):
    it = iter(refs)
    la_ref = next(it)
    lb_ref = next(it) if has_prev_view else la_ref
    sa_ref = next(it) if has_short else None
    sb_ref = (next(it) if has_prev_view else sa_ref) if has_short else None
    sc_ref, sl_ref, pwr0_ref, out_ref, pwr_out_ref = it
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
    bf = sc_ref[:, 8:9]

    slope0 = sl_ref[0:1, :]  # [1, W] (zero past n0/2)
    slope1 = sl_ref[1:2, :]
    rev0 = sl_ref[2:3, :]  # slope0[:n0/2] reversed, zero-padded
    rev1 = sl_ref[3:4, :]  # slope1 reversed
    lhs = jnp.where(use_s1 > 0, slope1, slope0)  # [R, W]
    rhs = jnp.where(use_r1 > 0, rev1, rev0)

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1).astype(jnp.float32)
    iota_ow = jax.lax.broadcasted_iota(
        jnp.int32, (R, outw), 1).astype(jnp.float32)

    def assemble(long_rows, short_rows, flag):
        # per-packet blocksize select (short rows zero-extended to n1)
        if short_rows is None:
            return long_rows
        srow = jnp.concatenate(
            [short_rows, jnp.zeros((R, n1 - n0), jnp.float32)], axis=1)
        return jnp.where(flag > 0, long_rows, srow)

    bf_prev = sc_ref[:, 12:13]  # globally shifted OUTSIDE the kernel: an
    # in-block roll of bf would read this block's last row at a block
    # boundary instead of the previous block's
    row = assemble(la_ref[0], sa_ref[0] if has_short else None, bf)
    # previous packet's row: last row of the block-shifted view for the
    # first row in the block, in-block neighbor otherwise. When ONE block
    # covers the whole chunk there is no shifted view (it would re-read
    # the identical block from HBM): row 0's "previous" is garbage from
    # this block, always masked by the is_t0 -> pwr0 select below.
    prev_a = jnp.concatenate(
        [lb_ref[0, R - 1 : R, :], la_ref[0, : R - 1, :]], axis=0)
    prev_s = (jnp.concatenate(
        [sb_ref[0, R - 1 : R, :], sa_ref[0, : R - 1, :]], axis=0)
        if has_short else None)
    prev = assemble(prev_a, prev_s, bf_prev)
    a_cur = jnp.where(ls_on > 0, row[:, ls : ls + outw], row[:, :outw])

    cand_l = prev[:, W:]  # [R, W] long&next right region
    cand_m = prev[:, m_start : m_start + sw]  # long&!next short-in-long
    cand_s = prev[:, sw : 2 * sw]  # short
    pwr_sm = jnp.where(pl_is_m > 0, cand_m, cand_s)  # [R, sw]
    if sw < W:
        pwr_sm = jnp.concatenate(
            [pwr_sm, jnp.zeros((R, W - sw), jnp.float32)], axis=1)
    pwr = jnp.where(pl_is_l > 0, cand_l, pwr_sm)
    pwr = jnp.where(is_t0 > 0, pwr0_ref[0], pwr)

    mix = jnp.where(iota_w < ov_len,
                    a_cur[:, :W] * lhs + pwr * rhs, a_cur[:, :W])
    full = jnp.concatenate([mix, a_cur[:, W:]], axis=1)  # [R, outw]
    outf = jnp.where(iota_ow < out_len, full, jnp.float32(0.0))
    scaled = outf * jnp.float32(32768.0)
    clamped = jnp.clip(scaled, -32768.0, 32767.0)
    out_ref[:, :] = jnp.trunc(clamped).astype(jnp.int16)

    # ---- carry: right region of the chunk's last valid packet ----
    # Computed here (revisited [1, 1, W] output block; TPU grid steps run
    # sequentially) because a dynamic_index gather on the [T, C, n1] audio
    # outside the kernel forces XLA to relayout the whole 537 MB tensor.
    valid = sc_ref[:, 9:10]
    cur_is_l = sc_ref[:, 10:11]
    cur_is_m = sc_ref[:, 11:12]
    rr_sm = jnp.where(cur_is_m > 0, row[:, m_start : m_start + sw],
                      row[:, sw : 2 * sw])
    if sw < W:
        rr_sm = jnp.concatenate(
            [rr_sm, jnp.zeros((R, W - sw), jnp.float32)], axis=1)
    rr = jnp.where(cur_is_l > 0, row[:, W:], rr_sm)  # [R, W]

    first_blk = sc_ref[0, 5] > 0  # row 0 of this block is global t == 0

    @pl.when(first_blk)
    def _():
        pwr_out_ref[0, 0, :] = pwr0_ref[0, 0, :]

    nblk_valid = jnp.sum(valid)

    @pl.when(nblk_valid > 0)
    def _():
        kstar = nblk_valid - jnp.float32(1.0)  # valid rows are a prefix
        iota_r = jax.lax.broadcasted_iota(
            jnp.int32, (R, 1), 0).astype(jnp.float32)
        pick = jnp.where(iota_r == kstar, jnp.float32(1.0), jnp.float32(0.0))
        pwr_out_ref[0, 0, :] = jnp.sum(rr * pick, axis=0)


def _rev_lanes(x, L: int):
    """Exact reversal of the last dim (size L, power of two) inside a
    kernel: j -> L-1-j == j XOR (L-1), decomposed into per-bit
    XOR-exchanges, each a pair of circular rolls + select. Pure data
    movement (no arithmetic), so the values are bit-identical to a host
    flip; `jnp.flip`/lax.rev is unimplemented in Mosaic."""
    j = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    b = 1
    while b < L:
        left = pltpu.roll(x, L - b, axis=x.ndim - 1)   # x[j + b]
        right = pltpu.roll(x, b, axis=x.ndim - 1)      # x[j - b]
        x = jnp.where((j & b) == 0, left, right)
        b <<= 1
    return x


def _rev_lanes_mxu(x, L: int):
    """Exact reversal of the last dim (size L, multiple of 128) via the
    MXU: per-128-lane group, rev(x) = x_g @ J (J the 128x128
    anti-identity), with groups concatenated in reversed order (static
    lane slices — no shuffle network).

    Bit-exact for EVERY f32 bit pattern (subnormals, signed zeros,
    inf, NaN payloads): the f32 bits are decomposed into four u8
    limbs, each converted to f32/bf16 (integers <= 255 are exact in
    bf16), permuted on the MXU (J's entries are 0/1, so every output
    element is a single exact product — no accumulation rounding),
    and reassembled into the u32 bit pattern. Pure data movement.
    Asserted bit-identical to jnp.flip by tests/test_overlap_kernel.py.
    (A 3-limb mantissa-truncation FLOAT split was tried first: it
    loses bits once the low limb lands in the f32 subnormal range,
    where the missing implicit bit leaves >8 significant bits.)

    All integer work is int32: Mosaic has no u32<->f32 converts
    (NotImplementedError at lowering), but s32->f32 / f32->s32 are
    native. Arithmetic-shift-right + 0xFF mask extracts the same limb
    bits a logical shift would, and the <<24 reassembly is a bitwise
    OR into the sign byte, which the final bitcast reinterprets.

    Why: Mosaic has no lane gather/reverse; the roll-network
    (:func:`_rev_lanes`) costs log2(L) VPU exchange stages (~2.6
    ms/chunk at W=1024) and the XLA-side flip (PRE_REV) costs a full
    HBM round trip (~1.9 ms/chunk). The MXU does the permutation in
    otherwise-idle matrix-unit time."""
    assert L % 128 == 0, L
    u = jax.lax.bitcast_convert_type(x, jnp.int32)
    limbs = [
        ((u >> jnp.int32(8 * k)) & jnp.int32(0xFF))
        .astype(jnp.float32).astype(jnp.bfloat16)
        for k in range(4)
    ]
    rr = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    J = jnp.where(rr + cc == 127, jnp.float32(1.0),
                  jnp.float32(0.0)).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))
    outs = []
    for g in range(L // 128 - 1, -1, -1):
        seg = slice(g * 128, (g + 1) * 128)
        w = None
        for k, lim in enumerate(limbs):
            p = jax.lax.dot_general(lim[:, seg], J, dn,
                                    preferred_element_type=jnp.float32)
            b = p.astype(jnp.int32) << jnp.int32(8 * k)
            w = b if w is None else w | b
        outs.append(jax.lax.bitcast_convert_type(w, jnp.float32))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _shuffle_zip(x, L: int):
    """Perfect shuffle of the last dim (size L = 2H, power of two):
    out[2j] = x[j], out[2j+1] = x[H+j]. The index map is a 1-bit rotation,
    decomposed into adjacent-bit transpositions — each an XOR-exchange
    stage built from a pair of circular rolls + select, the same primitive
    family as :func:`_rev_lanes` (Mosaic has no lane gather/shuffle)."""
    j = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    k = L.bit_length() - 1
    for pbit in range(k - 2, -1, -1):
        b = 1 << pbit
        bp = (j >> pbit) & 1
        bq = (j >> (pbit + 1)) & 1
        fwd = pltpu.roll(x, L - b, axis=x.ndim - 1)   # x[j + b]
        bwd = pltpu.roll(x, b, axis=x.ndim - 1)       # x[j - b]
        x = jnp.where(bp != bq, jnp.where(bp == 1, fwd, bwd), x)
    return x


def _combine_split(p, L: int):
    """DCT-IV from the shuffled Wang-split pair stream P (P[2j] = U_j,
    P[2j+1] = V_j; see ops/imdct._dct4_via_split for the identity):

        X_0 = P_0;  X_{2j-1} = P_{2j} - P_{2j-1};
        X_{2j} = P_{2j} + P_{2j-1};  X_{L-1} = -P_{L-1}

    — two masked rolls; the edge rows fall out of zeroing the wrapped
    lanes."""
    j = jax.lax.broadcasted_iota(jnp.int32, p.shape, p.ndim - 1)
    nxt = pltpu.roll(p, L - 1, axis=p.ndim - 1)   # P[j + 1]
    prv = pltpu.roll(p, 1, axis=p.ndim - 1)       # P[j - 1]
    nxt = jnp.where(j == L - 1, jnp.float32(0.0), nxt)
    prv = jnp.where(j == 0, jnp.float32(0.0), prv)
    return jnp.where((j & 1) == 1, nxt - p, p + prv)


def _kernel_x(*refs, n0, n1, R, has_short, has_prev_view, split_in=False,
              pre_rev=False, rev_mxu=False):
    """X-representation variant of :func:`_kernel`: inputs are the
    half-width DCT-IV outputs (see ops/imdct.dct4_batch_parts_ct), and
    every window region is reconstructed in VMEM from

        audio[0:M/2] = X[M/2:M];  audio[M/2:3M/2] = -rev(X);
        audio[3M/2:2M] = -X[0:M/2]          (M = n/2 per blocksize)

    with the same selects, mix, masks and carry as the audio-form kernel
    (bit-identical outputs, asserted by tests/test_overlap_kernel.py).

    With ``split_in``, the long input arrives as the Wang-split halves
    U, V (two refs, [.., n1/4] each — the GEMMs that produce them do half
    the MXU work) and the kernel rebuilds X in VMEM via
    :func:`_shuffle_zip` + :func:`_combine_split`.

    With ``pre_rev``, the lane-reversed X arrays arrive as extra inputs
    (XLA computes ``flip(X, -1)`` once outside — one HBM pass) and the
    in-kernel :func:`_rev_lanes` roll networks are skipped entirely
    (measured 2.6 ms/chunk of VPU shuffle work at S=256/T=128/n1=2048)."""
    # pre_rev's short-ref parse below would misread the ref list under
    # split_in (overlap_i16_pallas forces pre_rev off when x_split)
    assert not (pre_rev and split_in), "pre_rev is incompatible with split_in"
    assert not (pre_rev and rev_mxu), "rev_mxu supersedes pre_rev"
    # in-kernel reversal: MXU permutation dot when the width allows it,
    # else the VPU roll network (both bit-exact)
    _rev = (lambda x, L: _rev_lanes_mxu(x, L) if (rev_mxu and L % 128 == 0)
            else _rev_lanes(x, L))
    it = iter(refs)
    if split_in:
        xu_ref = next(it)
        xv_ref = next(it)
        xbu_ref = next(it) if has_prev_view else xu_ref
        xbv_ref = next(it) if has_prev_view else xv_ref
    else:
        xa_ref = next(it)
        xb_ref = next(it) if has_prev_view else xa_ref
        if pre_rev:
            xar_ref = next(it)
            xbr_ref = next(it) if has_prev_view else xar_ref
    sa_ref = next(it) if has_short else None
    sb_ref = (next(it) if has_prev_view else sa_ref) if has_short else None
    if pre_rev and has_short:
        sar_ref = next(it)
        sbr_ref = next(it) if has_prev_view else sar_ref
    sc_ref, sl_ref, pwr0_ref, out_ref, pwr_out_ref = it
    W = n1 // 2   # == M, the long DCT-IV length
    outw = 3 * n1 // 4
    ls = (n1 - n0) // 4
    m = n0 // 2   # short DCT-IV length (== sw, the short overlap width)
    M = W

    use_s1 = sc_ref[:, 0:1]
    use_r1 = sc_ref[:, 1:2]
    ls_on = sc_ref[:, 2:3]
    pl_is_l = sc_ref[:, 3:4]
    pl_is_m = sc_ref[:, 4:5]
    is_t0 = sc_ref[:, 5:6]
    ov_len = sc_ref[:, 6:7]
    out_len = sc_ref[:, 7:8]
    bf = sc_ref[:, 8:9]
    # (sc_ref col 12, the prev blockflag, is not needed here: the
    # pl_is_l/pl_is_m candidate selects already encode it)

    slope0 = sl_ref[0:1, :]
    slope1 = sl_ref[1:2, :]
    rev0 = sl_ref[2:3, :]
    rev1 = sl_ref[3:4, :]
    lhs = jnp.where(use_s1 > 0, slope1, slope0)
    rhs = jnp.where(use_r1 > 0, rev1, rev0)

    iota_w = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1).astype(jnp.float32)
    iota_ow = jax.lax.broadcasted_iota(
        jnp.int32, (R, outw), 1).astype(jnp.float32)

    if split_in:
        a_uv = jnp.concatenate([xu_ref[0], xv_ref[0]], axis=1)
        xc = _combine_split(_shuffle_zip(a_uv, M), M)   # [R, M] long X
        if has_prev_view:
            ap_uv = jnp.concatenate(
                [xbu_ref[0, R - 1 : R, :], xbv_ref[0, R - 1 : R, :]], axis=1)
            xp_last = _combine_split(_shuffle_zip(ap_uv, M), M)
        else:
            xp_last = xc[R - 1 : R]
    else:
        xc = xa_ref[0]                    # [R, M] current long X
        xp_last = xb_ref[0, R - 1 : R, :]
    if pre_rev and not split_in:
        xcr = xar_ref[0]
        xp_last_rev = xbr_ref[0, R - 1 : R, :]
    else:
        xcr = _rev(xc, M)
        xp_last_rev = _rev(xp_last, M)
    # previous packet's X rows: last row of the block-shifted view for
    # row 0, in-block neighbor otherwise (same structure as _kernel);
    # the reversed form reuses xcr and reverses only the one extra row
    xp = jnp.concatenate([xp_last, xc[: R - 1]], axis=0)
    xpr = jnp.concatenate([xp_last_rev, xcr[: R - 1]], axis=0)
    use_short = has_short and not _B_NO_SHORT  # bisect knob (timing only)
    if use_short:
        xs = sa_ref[0]                    # [R, m] current short X
        xsp_last = sb_ref[0, R - 1 : R, :]
        if pre_rev:
            xsr = sar_ref[0]
            xsp_last_rev = sbr_ref[0, R - 1 : R, :]
        else:
            xsr = _rev(xs, m)
            xsp_last_rev = _rev(xsp_last, m)
        xsp = jnp.concatenate([xsp_last, xs[: R - 1]], axis=0)
        xspr = jnp.concatenate([xsp_last_rev, xsr[: R - 1]], axis=0)

    # ---- current row: a_cur = audio[ls or 0 : +outw] ----
    audio0 = jnp.concatenate([xc[:, M // 2 :], -xcr], axis=1)   # [R, outw]
    if ls and not _B_NO_LS:
        audio_ls = jnp.concatenate(
            [xc[:, M // 2 + ls :], -xcr, -xc[:, :ls]], axis=1)
        a_long = jnp.where(ls_on > 0, audio_ls, audio0)
    else:
        a_long = audio0
    if use_short:
        a_short = jnp.concatenate(
            [xs[:, m // 2 :], -xsr, -xs[:, : m // 2],
             jnp.zeros((R, outw - 2 * m), jnp.float32)], axis=1)
        a_cur = jnp.where(bf > 0, a_long, a_short)
    else:
        a_cur = a_long

    # ---- previous row's right region (pwr candidates) ----
    cand_l = jnp.concatenate(
        [-xpr[:, M // 2 :], -xp[:, : M // 2]], axis=1)           # [R, W]
    cand_m = jnp.concatenate(
        [-xpr[:, M - m // 2 :], -xp[:, : m // 2]], axis=1)       # [R, m]
    cand_s = (jnp.concatenate(
        [-xspr[:, m // 2 :], -xsp[:, : m // 2]], axis=1)
        if use_short else cand_m)
    pwr_sm = jnp.where(pl_is_m > 0, cand_m, cand_s)
    if m < W:
        pwr_sm = jnp.concatenate(
            [pwr_sm, jnp.zeros((R, W - m), jnp.float32)], axis=1)
    pwr = jnp.where(pl_is_l > 0, cand_l, pwr_sm)
    pwr = jnp.where(is_t0 > 0, pwr0_ref[0], pwr)
    if _B_NO_PWRSEL:  # bisect knob (timing only)
        pwr = jnp.broadcast_to(pwr0_ref[0], (R, W))

    if _B_NO_MIX:  # bisect knob (timing only)
        mix = a_cur[:, :W]
    else:
        mix = jnp.where(iota_w < ov_len,
                        a_cur[:, :W] * lhs + pwr * rhs, a_cur[:, :W])
    full = jnp.concatenate([mix, a_cur[:, W:]], axis=1)
    outf = jnp.where(iota_ow < out_len, full, jnp.float32(0.0))
    scaled = outf * jnp.float32(32768.0)
    clamped = jnp.clip(scaled, -32768.0, 32767.0)
    out_ref[:, :] = jnp.trunc(clamped).astype(jnp.int16)

    # ---- carry: right region of the chunk's last valid packet ----
    valid = sc_ref[:, 9:10]
    cur_is_l = sc_ref[:, 10:11]
    cur_is_m = sc_ref[:, 11:12]
    rr_l = jnp.concatenate(
        [-xcr[:, M // 2 :], -xc[:, : M // 2]], axis=1)           # [R, W]
    rr_m = jnp.concatenate(
        [-xcr[:, M - m // 2 :], -xc[:, : m // 2]], axis=1)       # [R, m]
    rr_s = (jnp.concatenate(
        [-xsr[:, m // 2 :], -xs[:, : m // 2]], axis=1)
        if use_short else rr_m)
    rr_sm = jnp.where(cur_is_m > 0, rr_m, rr_s)
    if m < W:
        rr_sm = jnp.concatenate(
            [rr_sm, jnp.zeros((R, W - m), jnp.float32)], axis=1)
    rr = jnp.where(cur_is_l > 0, rr_l, rr_sm)

    if _B_NO_CARRY:  # bisect knob (timing only)
        pwr_out_ref[0, 0, :] = pwr0_ref[0, 0, :]
        return

    first_blk = sc_ref[0, 5] > 0

    @pl.when(first_blk)
    def _():
        pwr_out_ref[0, 0, :] = pwr0_ref[0, 0, :]

    nblk_valid = jnp.sum(valid)

    @pl.when(nblk_valid > 0)
    def _():
        kstar = nblk_valid - jnp.float32(1.0)
        iota_r = jax.lax.broadcasted_iota(
            jnp.int32, (R, 1), 0).astype(jnp.float32)
        pick = jnp.where(iota_r == kstar, jnp.float32(1.0), jnp.float32(0.0))
        pwr_out_ref[0, 0, :] = jnp.sum(rr * pick, axis=0)


def overlap_i16_pallas(
    long_audio,  # f32 [T, C, n1] long-block IMDCT output
    #   (or the pre-selected audio when `short_audio` is None; with
    #   x_split, a TUPLE (U, V) of [C, T, n1/4] Wang-split halves)
    short_audio: jnp.ndarray | None,  # f32 [T, C, n0] short-block output
    scal: jnp.ndarray,  # f32 [T, 13] per-packet scalars (column map in
    #   windowing.overlap_add_i16_kernel_batch: lens/flags/carry/valid cols)
    slopes: jnp.ndarray,  # f32 [4, W] slope0 / slope1 / rev0 / rev1
    pwr0: jnp.ndarray,  # f32 [C, W] carried-in right region
    n0: int,
    n1: int,
    ct_in: bool = False,
    x_rep: bool = False,
    x_split: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (i16 [T, C*outw] FLAT, pwr_out [C, W]).

    With ``x_rep``, the audio inputs are the half-width DCT-IV outputs
    ([.., n1/2] / [.., n0/2], see ops/imdct.dct4_batch_parts_ct) and the
    kernel reconstructs the window regions in VMEM (``_kernel_x``).
    With ``x_split`` (implies x_rep, ct_in), the LONG input is the pair
    (U, V) from the half-FLOP Wang-split GEMMs and the kernel zips them
    back into X in VMEM — no XLA-side combine pass.

    The output stays flat: splitting [C*outw] -> [C, outw] on device
    re-tiles the s16 array (~1.7 ms/chunk at S=256); callers reshape the
    numpy array on the host for free."""
    if x_split:
        assert ct_in and x_rep and isinstance(long_audio, tuple)
        lu, lv = long_audio
        C, T, _ = lu.shape
    elif ct_in:  # inputs already [C, T, n] (imdct_batch_parts_ct)
        C, T, _ = long_audio.shape
    else:
        T, C, _ = long_audio.shape
        # [C, T, n]: relabels the GEMM's physical layout — a bitcast
        long_audio = jnp.transpose(long_audio, (1, 0, 2))
        if short_audio is not None:
            short_audio = jnp.transpose(short_audio, (1, 0, 2))
    outw = 3 * n1 // 4
    # adaptive block rows: small chunks pad to 16s, large blocksizes shrink
    # R so the resident operand blocks stay inside the VMEM budget
    R = min(_max_block_rows(n0, n1), -(-T // 16) * 16)
    assert R >= 16, "caller must gate on pallas_overlap_supported"
    pad = (-T) % R
    # hoist the lane reversal out of the kernel: XLA computes flip(X)
    # once (a single HBM pass over [C, T, W]) and the kernel reads it as
    # an extra operand — cheaper than the in-kernel roll/select network
    # (10 XOR-exchange stages at W=1024, measured 2.6 ms/chunk)
    rev_mxu = bool(REV_MXU and x_rep and not x_split)
    pre_rev = bool(PRE_REV and x_rep and not x_split and not rev_mxu)
    long_rev = short_rev = None
    if pre_rev:
        if _B_NO_FLIP:  # bisect knob (timing only): skip the flip pass
            long_rev, short_rev = long_audio, short_audio
        else:
            long_rev = jnp.flip(long_audio, axis=-1)
            if short_audio is not None:
                short_rev = jnp.flip(short_audio, axis=-1)
    if pad:
        if x_split:
            lu = jnp.pad(lu, [(0, 0), (0, pad), (0, 0)])
            lv = jnp.pad(lv, [(0, 0), (0, pad), (0, 0)])
        else:
            long_audio = jnp.pad(long_audio, [(0, 0), (0, pad), (0, 0)])
        if long_rev is not None:
            long_rev = jnp.pad(long_rev, [(0, 0), (0, pad), (0, 0)])
        if short_audio is not None:
            short_audio = jnp.pad(short_audio, [(0, 0), (0, pad), (0, 0)])
        if short_rev is not None:
            short_rev = jnp.pad(short_rev, [(0, 0), (0, pad), (0, 0)])
        scal = jnp.pad(scal, [(0, pad), (0, 0)])  # out_len 0 => zero rows
    Tp = T + pad
    has_short = short_audio is not None
    has_prev_view = Tp > R  # single-block chunks need no shifted view
    kern = functools.partial(_kernel_x if x_rep else _kernel, n0=n0, n1=n1,
                             R=R, has_short=has_short,
                             has_prev_view=has_prev_view,
                             **({"split_in": True} if x_split else {}),
                             **({"pre_rev": True} if pre_rev else {}),
                             **({"rev_mxu": True} if rev_mxu else {}))
    w1, w0 = (n1 // 2, n0 // 2) if x_rep else (n1, n0)
    spec_cur = lambda w: pl.BlockSpec(  # noqa: E731
        (1, R, w), lambda c, i: (c, i, 0), memory_space=pltpu.VMEM)
    spec_prev = lambda w: pl.BlockSpec(  # noqa: E731
        (1, R, w), lambda c, i: (c, jnp.maximum(i - 1, 0), 0),
        memory_space=pltpu.VMEM)
    if x_split:
        in_specs = [spec_cur(w1 // 2), spec_cur(w1 // 2)]
        args = [lu, lv]
        if has_prev_view:
            in_specs += [spec_prev(w1 // 2), spec_prev(w1 // 2)]
            args += [lu, lv]
    else:
        in_specs = [spec_cur(w1)]
        args = [long_audio]
        if has_prev_view:
            in_specs += [spec_prev(w1)]
            args += [long_audio]
        if pre_rev:
            in_specs += [spec_cur(w1)]
            args += [long_rev]
            if has_prev_view:
                in_specs += [spec_prev(w1)]
                args += [long_rev]
    if has_short:
        in_specs += [spec_cur(w0)]
        args += [short_audio]
        if has_prev_view:
            in_specs += [spec_prev(w0)]
            args += [short_audio]
        if pre_rev:
            in_specs += [spec_cur(w0)]
            args += [short_rev]
            if has_prev_view:
                in_specs += [spec_prev(w0)]
                args += [short_rev]
    in_specs += [
        pl.BlockSpec((R, scal.shape[1]), lambda c, i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((4, slopes.shape[1]), lambda c, i: (0, 0),
                     memory_space=pltpu.VMEM),
        # [C, 1, W] so the block's last two dims satisfy the (8, 128)
        # divisible-or-full rule (a bare (1, W) channel row does not)
        pl.BlockSpec((1, 1, slopes.shape[1]), lambda c, i: (c, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args += [scal, slopes, pwr0[:, None, :]]
    W = n1 // 2
    out, pwr_out = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((Tp, C * outw), jnp.int16),
            jax.ShapeDtypeStruct((C, 1, W), jnp.float32),
        ),
        grid=(C, Tp // R),
        in_specs=in_specs,
        # channels on the output lane axis: [T, C*outw] splits to
        # [T, C, outw] for free
        out_specs=(
            pl.BlockSpec((R, outw), lambda c, i: (i, c),
                         memory_space=pltpu.VMEM),
            # revisited per-channel carry block (see kernel tail)
            pl.BlockSpec((1, 1, W), lambda c, i: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(*args)
    return out[:T], pwr_out[:, 0, :]

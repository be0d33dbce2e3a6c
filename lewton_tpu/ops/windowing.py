"""Windowing and overlap-add — fully parallel over packet time.

The reference carries the previous block's unwindowed right half packet to
packet (`PreviousWindowRight`, lewton src/audio.rs:848-861, 1082-1154),
which looks like a sequential dependency. It is not an accumulation: the
carry for packet t is a *pure function of packet t-1's IMDCT output*, so
the whole chunk overlap-add is a shift, not a scan:

    pwr[t]  = right_region(audio[t-1])            (parallel slice + select)
    out[t]  = left_region(audio[t]) * lhs + pwr[t] * rhs

All geometry (blockflag, prev/next window flag) selects between a handful
of *static* slices of the padded [C, n1] block — no dynamic gathers, no
lax.scan: XLA fuses the chunk into one elementwise pass. The first packet
of a stream emits 0 samples (ref src/audio.rs:1140-1152); invalid
(batch-padding) slots emit 0 and pass the carry through unchanged
(padding is always a suffix of the chunk).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["overlap_add_batch", "overlap_add_i16_batch",
           "overlap_add_i16_kernel_batch", "init_window_carry", "compact_i16"]


def compact_i16(out: jnp.ndarray, out_len: jnp.ndarray, cap: int):
    """Pack ragged per-packet PCM into one contiguous [cap, C] i16 buffer.

    out: f32 [T, C, n1] (zeros past out_len[t]); returns (pcm [cap, C] i16,
    total i32). Each packet is written full-width at its running offset —
    the padding tail is overwritten by the next packet, so no masking or
    scatter is needed (TPU scatters are slow; dynamic_update_slice is a
    fast vector copy). Caller must choose cap >= total + n1.

    i16 conversion is the reference's: scale 32768, clamp, truncate toward
    zero (lewton src/samples.rs:91-103).
    """
    T, C, n1 = out.shape
    scaled = out * jnp.float32(32768.0)
    clamped = jnp.clip(scaled, -32768.0, 32767.0)
    i16 = jnp.trunc(clamped).astype(jnp.int16)  # [T, C, n1]

    def step(carry, xs):
        buf, pos = carry
        a, ln = xs  # [C, n1], scalar
        buf = jax.lax.dynamic_update_slice(buf, a.T, (pos, jnp.int32(0)))
        return (buf, pos + ln), None

    buf0 = jnp.zeros((cap, C), jnp.int16)
    (buf, total), _ = jax.lax.scan(step, (buf0, jnp.int32(0)), (i16, out_len))
    return buf, total


def init_window_carry(channels: int, w: int):
    """Fresh per-stream carry: (pwr [C, W] f32, plen i32, started bool)."""
    return (
        jnp.zeros((channels, w), jnp.float32),
        jnp.int32(0),
        jnp.array(False),
    )


def overlap_add_batch(
    audio: jnp.ndarray,  # f32 [T, C, n1] IMDCT output (short blocks in [:n0])
    blockflag: jnp.ndarray,  # i32 [T]
    prev_flag: jnp.ndarray,  # bool [T]
    next_flag: jnp.ndarray,  # bool [T]
    valid: jnp.ndarray,  # bool [T] (False only as a chunk suffix)
    slope0: jnp.ndarray,  # f32 [W] window slope for bs0 (zero-padded past n0/2)
    slope1: jnp.ndarray,  # f32 [W] window slope for bs1
    n0: int,
    n1: int,
    carry,
):
    """Returns ((out [T, C, 3*n1/4] f32, out_len [T] i32), new_carry)."""
    T, C, _ = audio.shape
    W = n1 // 2
    pwr0, plen0, started0 = carry
    long_blk = blockflag == 1  # [T]

    # ---- right region -> next packet's pwr (parallel) ----
    # short: [n0/2, n0); long & next: [n1/2, n1); long & !next: the short
    # window centered in the long block, [(3n1-n0)/4, (3n1+n0)/4).
    def pad_w(x):  # [T, C, k] -> [T, C, W]
        return jnp.pad(x, [(0, 0), (0, 0), (0, W - x.shape[2])])

    pwr_short = pad_w(audio[:, :, n0 // 2 : n0])
    pwr_long = audio[:, :, W:]
    pwr_lsn = pad_w(audio[:, :, (3 * n1 - n0) // 4 : (3 * n1 + n0) // 4])
    sel = jnp.where(long_blk, jnp.where(next_flag, 0, 1), 2)[:, None, None]
    new_pwr = jnp.where(sel == 0, pwr_long,
                        jnp.where(sel == 1, pwr_lsn, pwr_short))
    new_plen = jnp.where(long_blk & next_flag, W, n0 // 2).astype(jnp.int32)

    # ---- shift: packet t consumes packet t-1's right region ----
    pwr_seq = jnp.concatenate([pwr0[None], new_pwr[:-1]], axis=0)
    plen_seq = jnp.concatenate([plen0[None], new_plen[:-1]], axis=0)
    # started[t]: any valid packet strictly before t (or carried in)
    before = jnp.cumsum(valid.astype(jnp.int32)) - valid.astype(jnp.int32)
    started_seq = started0 | (before > 0)

    # ---- left region + overlap-add (parallel) ----
    iota_n = jnp.arange(n1, dtype=jnp.int32)
    # current block shifted so its left region starts at 0:
    # only long & !prev has a nonzero left_start of (n1-n0)/4
    a_lsp = jnp.pad(audio[:, :, (n1 - n0) // 4 :],
                    [(0, 0), (0, 0), (0, (n1 - n0) // 4)])
    a_shift = jnp.where((long_blk & ~prev_flag)[:, None, None], a_lsp, audio)
    # lhs slope: long & prev -> slope1, else slope0 (ref window geometry)
    use_s1 = (long_blk & prev_flag)[:, None]
    lhs_w = jnp.where(use_s1, slope1[None, :], slope0[None, :])  # [T, W]
    # rhs = lhs reversed over the *previous* right length; plen is n0/2 or W
    rev0 = jnp.concatenate([slope0[: n0 // 2][::-1],
                            jnp.zeros(W - n0 // 2, slope0.dtype)])
    rev1 = slope1[::-1]
    rhs_w = jnp.where((plen_seq == W)[:, None], rev1[None, :], rev0[None, :])
    lhs_n = jnp.pad(lhs_w, [(0, 0), (0, n1 - W)])[:, None, :]  # [T, 1, n1]
    rhs_n = jnp.pad(rhs_w, [(0, 0), (0, n1 - W)])[:, None, :]
    pwr_n = jnp.pad(pwr_seq, [(0, 0), (0, 0), (0, n1 - W)])

    overlap_len = jnp.minimum(plen_seq, jnp.where(use_s1[:, 0], W, n0 // 2))
    in_ov = (iota_n[None, :] < overlap_len[:, None])[:, None, :]
    mixed = jnp.where(in_ov, a_shift * lhs_n + pwr_n * rhs_n, a_shift)

    right_start = jnp.where(long_blk & ~next_flag, (3 * n1 - n0) >> 2,
                            jnp.where(long_blk, W, n0 >> 1))
    left_start = jnp.where(long_blk & ~prev_flag, (n1 - n0) >> 2, 0)
    out_len = jnp.where(valid & started_seq, right_start - left_start, 0)
    # out_len never exceeds 3n1/4 (long block, short next, long prev), so
    # the output buffer is materialized at that width — 25% less HBM for
    # the mix pass and everything downstream (i16, compaction, D2H)
    outw = 3 * n1 // 4
    out = jnp.where(iota_n[None, None, :outw] < out_len[:, None, None],
                    mixed[:, :, :outw], jnp.float32(0.0))

    # ---- carry out: state after the last valid packet ----
    nvalid = jnp.sum(valid.astype(jnp.int32))
    last = jnp.maximum(nvalid - 1, 0)
    any_valid = nvalid > 0
    pwr_out = jnp.where(any_valid,
                        jax.lax.dynamic_index_in_dim(new_pwr, last, 0, False),
                        pwr0)
    plen_out = jnp.where(any_valid, new_plen[last], plen0)
    started_out = started0 | any_valid
    return (out, out_len), (pwr_out, plen_out, started_out)


def overlap_add_i16_kernel_batch(
    audio, blockflag, prev_flag, next_flag, valid, slope0, slope1,
    n0: int, n1: int, carry, ct_in: bool = False, x_rep: bool = False,
    x_split: bool = False, interpret: bool = False,
):
    """Pallas-kernel variant of :func:`overlap_add_i16_batch` (TPU only;
    bit-identical values — see ops/overlap_kernel.py). Same signature, but
    the i16 output is FLAT [T, C*outw] (split it on the host: a device
    reshape re-tiles the s16 array). ``audio`` may also be a ``(long, short)`` tuple of
    un-selected IMDCT GEMM outputs (``imdct_batch_parts``) — the kernel
    then does the per-packet blocksize select in VMEM, which saves a full
    [T, C, n1] relayout pass XLA inserts before the custom-call."""
    from .overlap_kernel import overlap_i16_pallas

    if x_split:
        # ((U, V), short) — Wang-split long halves (ops/imdct.py)
        long_a, short_a = audio
        C, T = long_a[0].shape[0], long_a[0].shape[1]
    elif isinstance(audio, tuple):
        long_a, short_a = audio
        if ct_in:
            C, T = long_a.shape[0], long_a.shape[1]
        else:
            T, C, _ = long_a.shape
    else:
        long_a, short_a = audio, None
        if ct_in:
            C, T = long_a.shape[0], long_a.shape[1]
        else:
            T, C, _ = long_a.shape
    W = n1 // 2
    pwr0, plen0, started0 = carry
    long_blk = blockflag == 1

    new_plen = jnp.where(long_blk & next_flag, W, n0 // 2).astype(jnp.int32)
    sel = jnp.where(long_blk, jnp.where(next_flag, 0, 1), 2)
    plen_seq = jnp.concatenate([plen0[None], new_plen[:-1]])
    sel_prev = jnp.concatenate([jnp.zeros((1,), sel.dtype), sel[:-1]])
    before = jnp.cumsum(valid.astype(jnp.int32)) - valid.astype(jnp.int32)
    started_seq = started0 | (before > 0)
    use_s1 = long_blk & prev_flag
    overlap_len = jnp.minimum(plen_seq, jnp.where(use_s1, W, n0 // 2))
    right_start = jnp.where(long_blk & ~next_flag, (3 * n1 - n0) >> 2,
                            jnp.where(long_blk, W, n0 >> 1))
    left_start = jnp.where(long_blk & ~prev_flag, (n1 - n0) >> 2, 0)
    out_len = jnp.where(valid & started_seq, right_start - left_start, 0)

    f = lambda b: b.astype(jnp.float32)  # noqa: E731
    scal = jnp.stack([
        f(use_s1), f(plen_seq == W), f(long_blk & ~prev_flag),
        f(sel_prev == 0), f(sel_prev == 1),
        f(jnp.arange(T, dtype=jnp.int32) == 0),
        overlap_len.astype(jnp.float32), out_len.astype(jnp.float32),
        f(long_blk), f(valid), f(sel == 0), f(sel == 1),
        jnp.concatenate([jnp.zeros((1,), jnp.float32),
                         f(long_blk)[:-1]]),  # prev packet's blockflag
    ], axis=1)  # [T, 13]
    rev0 = jnp.concatenate([slope0[: n0 // 2][::-1],
                            jnp.zeros(W - n0 // 2, slope0.dtype)])
    slopes = jnp.stack([slope0, slope1, rev0, slope1[::-1]])  # [4, W]
    # the pwr carry comes out of the kernel (an outside dynamic_index on
    # the audio would force XLA to relayout the whole tensor)
    out, pwr_out = overlap_i16_pallas(long_a, short_a, scal, slopes, pwr0,
                                      n0, n1, ct_in=ct_in, x_rep=x_rep,
                                      x_split=x_split, interpret=interpret)

    nvalid = jnp.sum(valid.astype(jnp.int32))
    last = jnp.maximum(nvalid - 1, 0)
    any_valid = nvalid > 0
    plen_out = jnp.where(any_valid, new_plen[last], plen0)
    started_out = started0 | any_valid
    return (out, out_len), (pwr_out, plen_out, started_out)


def overlap_add_i16_batch(
    audio: jnp.ndarray,  # f32 [T, C, n1] IMDCT output (short blocks in [:n0])
    blockflag: jnp.ndarray,  # i32 [T]
    prev_flag: jnp.ndarray,  # bool [T]
    next_flag: jnp.ndarray,  # bool [T]
    valid: jnp.ndarray,  # bool [T]
    slope0: jnp.ndarray,  # f32 [W]
    slope1: jnp.ndarray,  # f32 [W]
    n0: int,
    n1: int,
    carry,
):
    """Single-pass overlap-add + i16 conversion.

    Same math as :func:`overlap_add_batch` followed by scale/clamp/trunc
    (bit-identical per element: identical operand values and op order),
    but restructured so the chunk is ONE fused output pass over
    [T, C, 3n1/4]: packet t's previous-right-region operand is read
    directly from ``audio[t-1]`` at one of three static column offsets
    (selected per packet), instead of materializing the [T, C, W] pwr
    tensor, its one-packet shift copy, per-(t, w) slope selects, and an
    intermediate f32 output. Those five passes were ~40% of the measured
    chunk time (HLO: ~1.9 GB of intermediates at S=256, T=128).

    Returns ((out [T, C, 3n1/4] i16, out_len [T] i32), new_carry).
    """
    T, C, _ = audio.shape
    W = n1 // 2
    outw = 3 * n1 // 4
    pwr0, plen0, started0 = carry
    long_blk = blockflag == 1

    # ---- per-packet scalars ----
    new_plen = jnp.where(long_blk & next_flag, W, n0 // 2).astype(jnp.int32)
    # right-region class: 0 = long&next [W, n1); 1 = long&!next centered
    # short window [(3n1-n0)/4, ...); 2 = short [n0/2, n0)
    sel = jnp.where(long_blk, jnp.where(next_flag, 0, 1), 2)
    plen_seq = jnp.concatenate([plen0[None], new_plen[:-1]])
    sel_prev = jnp.concatenate([jnp.zeros((1,), sel.dtype), sel[:-1]])
    before = jnp.cumsum(valid.astype(jnp.int32)) - valid.astype(jnp.int32)
    started_seq = started0 | (before > 0)

    use_s1 = (long_blk & prev_flag)[:, None, None]  # lhs slope select
    use_r1 = (plen_seq == W)[:, None, None]  # rhs slope select
    overlap_len = jnp.minimum(
        plen_seq, jnp.where(long_blk & prev_flag, W, n0 // 2))

    right_start = jnp.where(long_blk & ~next_flag, (3 * n1 - n0) >> 2,
                            jnp.where(long_blk, W, n0 >> 1))
    left_start = jnp.where(long_blk & ~prev_flag, (n1 - n0) >> 2, 0)
    out_len = jnp.where(valid & started_seq, right_start - left_start, 0)

    # ---- operand views (slices/pads of `audio`: fuse, never materialize) --
    ls = (n1 - n0) // 4
    a_cur0 = audio[:, :, :outw]
    a_cur1 = audio[:, :, ls : ls + outw]
    a_cur = jnp.where((long_blk & ~prev_flag)[:, None, None], a_cur1, a_cur0)

    a_prev = jnp.pad(audio[:-1], [(1, 0), (0, 0), (0, 0)])  # a_prev[t]=audio[t-1]
    cand_l = a_prev[:, :, W:]  # class 0, width W
    m_start = (3 * n1 - n0) // 4
    cand_m = jnp.pad(a_prev[:, :, m_start : m_start + n0 // 2],
                     [(0, 0), (0, 0), (0, W - n0 // 2)])
    cand_s = jnp.pad(a_prev[:, :, n0 // 2 : n0],
                     [(0, 0), (0, 0), (0, W - n0 // 2)])
    sp = sel_prev[:, None, None]
    pwr = jnp.where(sp == 0, cand_l, jnp.where(sp == 1, cand_m, cand_s))
    # first packet of the chunk overlaps the carried-in right region
    t0 = (jnp.arange(T, dtype=jnp.int32) == 0)[:, None, None]
    pwr = jnp.where(t0, pwr0[None], pwr)

    lhs = jnp.where(use_s1, slope1[None, None, :], slope0[None, None, :])
    rev0 = jnp.concatenate([slope0[: n0 // 2][::-1],
                            jnp.zeros(W - n0 // 2, slope0.dtype)])
    rhs = jnp.where(use_r1, slope1[None, None, ::-1], rev0[None, None, :])

    # ---- the single output pass ----
    iota = jax.lax.broadcasted_iota(jnp.int32, (T, 1, outw), 2)
    in_ov = iota < overlap_len[:, None, None]
    mixed = jnp.where(
        in_ov,
        a_cur[:, :, :W] * lhs + pwr * rhs
        if outw == W else
        jnp.pad(a_cur[:, :, :W] * lhs + pwr * rhs,
                [(0, 0), (0, 0), (0, outw - W)]),
        a_cur,
    )
    outf = jnp.where(iota < out_len[:, None, None], mixed, jnp.float32(0.0))
    scaled = outf * jnp.float32(32768.0)
    clamped = jnp.clip(scaled, -32768.0, 32767.0)
    out = jnp.trunc(clamped).astype(jnp.int16)

    # ---- carry out (tiny: [C, W] slices of the last valid packet) ----
    nvalid = jnp.sum(valid.astype(jnp.int32))
    last = jnp.maximum(nvalid - 1, 0)
    any_valid = nvalid > 0
    a_last = jax.lax.dynamic_index_in_dim(audio, last, 0, False)  # [C, n1]
    pad_w = lambda x: jnp.pad(x, [(0, 0), (0, W - x.shape[1])])  # noqa: E731
    sl = sel[last]
    pwr_last = jnp.where(
        sl == 0, a_last[:, W:],
        jnp.where(sl == 1, pad_w(a_last[:, m_start : m_start + n0 // 2]),
                  pad_w(a_last[:, n0 // 2 : n0])))
    pwr_out = jnp.where(any_valid, pwr_last, pwr0)
    plen_out = jnp.where(any_valid, new_plen[last], plen0)
    started_out = started0 | any_valid
    return (out, out_len), (pwr_out, plen_out, started_out)

"""Windowing and overlap-add as a `lax.scan` over packet time.

The only inter-packet dependency in Vorbis decode is the 50% lapped window:
each packet returns [left_start, right_start) of its block overlapped with
the previous block's unwindowed right half, and saves its own right region
[right_start, right_end) as the next packet's carry
(ref: lewton src/audio.rs:1056-1154, PreviousWindowRight :848-861).

All geometry is data-dependent on (blockflag, prev_flag, next_flag), so the
step works on padded [C, n1] tensors with iota-based gathers; XLA compiles
this to elementwise selects + dynamic gathers, no host sync.

The first packet of a stream primes the carry and emits 0 samples
(ref src/audio.rs:1140-1152); `valid=False` steps (batch padding) leave the
carry untouched and emit 0 samples.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["overlap_add_scan", "init_window_carry"]


def init_window_carry(channels: int, w: int):
    """Fresh per-stream carry: (pwr [C, W] f32, plen i32, started bool)."""
    return (
        jnp.zeros((channels, w), jnp.float32),
        jnp.int32(0),
        jnp.array(False),
    )


def overlap_add_scan(
    audio: jnp.ndarray,  # f32 [T, C, n1] IMDCT output (short blocks in [:n0])
    blockflag: jnp.ndarray,  # i32 [T]
    prev_flag: jnp.ndarray,  # bool [T]
    next_flag: jnp.ndarray,  # bool [T]
    valid: jnp.ndarray,  # bool [T] (False for batch-padding slots)
    slope0: jnp.ndarray,  # f32 [W] window slope for bs0 (zero-padded past n0/2)
    slope1: jnp.ndarray,  # f32 [W] window slope for bs1
    n0: int,
    n1: int,
    carry,
):
    """Returns ((out [T, C, n1] f32, out_len [T] i32), new_carry)."""
    W = n1 // 2
    C = audio.shape[1]
    iota_n = jnp.arange(n1, dtype=jnp.int32)
    iota_w = jnp.arange(W, dtype=jnp.int32)

    def step(carry, xs):
        pwr, plen, started = carry
        a, bf, pf, nf, val = xs
        long_blk = bf == 1
        # Window geometry (spec 4.3.1; ref src/audio.rs:1056-1073)
        n = jnp.where(long_blk, n1, n0)
        left_start = jnp.where(long_blk & ~pf, (n1 - n0) >> 2, 0)
        right_start = jnp.where(long_blk & ~nf, (3 * n1 - n0) >> 2, n >> 1)
        right_end = jnp.where(long_blk & ~nf, (3 * n1 + n0) >> 2, n)
        left_use_bs1 = long_blk & pf
        lhs = jnp.where(left_use_bs1, slope1, slope0)  # [W]

        out_len = jnp.where(val & started, right_start - left_start, 0)
        plen_eff = jnp.minimum(plen, W)
        # rhs is the lhs slope reversed over the overlap region
        rhs = lhs[jnp.clip(plen_eff - 1 - iota_n, 0, W - 1)]  # [n1]
        lhs_n = lhs[jnp.clip(iota_n, 0, W - 1)]
        a_shift = jnp.take(a, jnp.clip(left_start + iota_n, 0, n1 - 1), axis=1)
        pwr_n = jnp.take(
            pwr, jnp.clip(iota_n, 0, W - 1), axis=1
        )  # [C, n1] (junk past W, masked below)
        in_overlap = iota_n < plen_eff
        mixed = jnp.where(
            in_overlap[None, :], a_shift * lhs_n[None, :] + pwr_n * rhs[None, :],
            a_shift,
        )
        out = jnp.where(iota_n[None, :] < out_len, mixed, jnp.float32(0.0))

        # Save the unwindowed right region as the next carry
        new_plen = right_end - right_start
        new_pwr = jnp.take(a, jnp.clip(right_start + iota_w, 0, n1 - 1), axis=1)
        new_pwr = jnp.where(iota_w[None, :] < new_plen, new_pwr, jnp.float32(0.0))
        pwr = jnp.where(val, new_pwr, pwr)
        plen = jnp.where(val, new_plen, plen)
        started = started | val
        return (pwr, plen, started), (out, out_len)

    new_carry, (out, out_len) = jax.lax.scan(
        step, carry, (audio, blockflag, prev_flag, next_flag, valid)
    )
    return (out, out_len), new_carry

"""Batched inverse channel coupling (square-polar, Vorbis I spec 4.3.5).

The reference iterates coupling steps in reverse over (magnitude, angle)
channel pairs (lewton src/audio.rs:762-777, 991-1002). Steps are a static
per-mode list; packets in a batch may use different modes, so the step's
channel indices are gathered per packet and applied with masked scatters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["inverse_coupling_batch", "inverse_coupling_static"]


def inverse_coupling_static(residue: jnp.ndarray, steps) -> jnp.ndarray:
    """Coupling with a setup-static step list (all modes share it — the
    common single-mapping case): channel indices are Python ints, so the
    update is a static slice assignment, no one-hot work at all."""
    if tuple(steps) == ((0, 1),) and residue.shape[1] == 2:
        # canonical stereo: rebuild in one pass instead of two .at copies
        m = residue[:, 0]
        a = residue[:, 1]
        mpos = m > 0
        apos = a > 0
        new_m = jnp.where(mpos, jnp.where(apos, m, m + a),
                          jnp.where(apos, m, m - a))
        new_a = jnp.where(mpos, jnp.where(apos, m - a, m),
                          jnp.where(apos, m + a, m))
        return jnp.stack([new_m, new_a], axis=1)
    for mag, ang in reversed(steps):
        m = residue[:, mag]
        a = residue[:, ang]
        mpos = m > 0
        apos = a > 0
        new_m = jnp.where(mpos, jnp.where(apos, m, m + a), jnp.where(apos, m, m - a))
        new_a = jnp.where(mpos, jnp.where(apos, m - a, m), jnp.where(apos, m + a, m))
        residue = residue.at[:, mag].set(new_m).at[:, ang].set(new_a)
    return residue


def inverse_coupling_batch(
    residue: jnp.ndarray,  # f32 [T, C, W]
    mode: jnp.ndarray,  # i32 [T]
    coup_mag: jnp.ndarray,  # i32 [M, S] magnitude channel per (mode, step)
    coup_ang: jnp.ndarray,  # i32 [M, S] angle channel per (mode, step)
    coup_n: jnp.ndarray,  # i32 [M] number of coupling steps per mode
) -> jnp.ndarray:
    T, C, W = residue.shape
    M, S = coup_mag.shape
    if S == 0:
        return residue
    n_steps = coup_n[mode]  # [T]
    cidx = jnp.arange(C, dtype=jnp.int32)

    def body(i, res):
        s = S - 1 - i  # reverse order
        active = s < n_steps  # [T]
        mag = coup_mag[mode, s]  # [T]
        ang = coup_ang[mode, s]
        # one-hot channel select/scatter: TPU-friendly (no row gathers)
        oh_m = (mag[:, None] == cidx).astype(res.dtype)  # [T, C]
        oh_a = (ang[:, None] == cidx).astype(res.dtype)
        # HIGHEST precision: TPU-default bf16 would round residue values
        hp = jax.lax.Precision.HIGHEST
        m = jnp.einsum("tc,tcw->tw", oh_m, res, precision=hp)
        a = jnp.einsum("tc,tcw->tw", oh_a, res, precision=hp)
        mpos = m > 0
        apos = a > 0
        new_m = jnp.where(mpos, jnp.where(apos, m, m + a), jnp.where(apos, m, m - a))
        new_a = jnp.where(mpos, jnp.where(apos, m - a, m), jnp.where(apos, m + a, m))
        act = active[:, None, None]
        is_m = (mag[:, None] == cidx)[:, :, None] & act  # [T, C, 1]
        is_a = (ang[:, None] == cidx)[:, :, None] & act
        res = jnp.where(is_m, new_m[:, None, :], res)
        res = jnp.where(is_a, new_a[:, None, :], res)
        return res

    return jax.lax.fori_loop(0, S, body, residue)

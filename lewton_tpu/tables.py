"""Header-derived constant tables (the reference's `header_cached.rs` analog).

Everything here is computed once per stream setup (or per blocksize) and, in
the TPU pipeline, placed in device memory as constants at trace time:

- Vorbis window slopes: sin(pi/2 * sin^2(pi/n * (i+0.5)))
- IMDCT synthesis matrices (the MXU formulation of the transform:
  y = X @ M with M[k, j] = cos(pi/(2n) * (2k+1) * (2j+1+n/2)))
- floor0 bark-map cos(omega) vectors (spec 6.2.2)
- the floor1 inverse-dB table (256 spec constants, stored as data)

ref parity: lewton src/header_cached.rs:34-158 (window, twiddles, bark map)
and src/audio.rs:437-501 (FLOOR1_INVERSE_DB_TABLE). The reference's stb-style
twiddle/bitrev tables are deliberately NOT reproduced: the TPU-native IMDCT is
a cosine-matrix product on the MXU (exact transform), not a scalar butterfly
schedule.
"""

from __future__ import annotations

import functools
import os

import numpy as np

__all__ = [
    "window_slope",
    "imdct_matrix",
    "bark_cos_omega",
    "floor1_inverse_db_table",
]

_DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@functools.cache
def floor1_inverse_db_table() -> np.ndarray:
    """256-entry floor1 amplitude-to-linear table (Vorbis I spec 10.1)."""
    t = np.load(os.path.join(_DATA_DIR, "floor1_inverse_db.npy"))
    t.setflags(write=False)
    return t


@functools.cache
def window_slope(half_n: int) -> np.ndarray:
    """Left window slope of length n/2 for blocksize n (spec 4.3.1 step 7).

    Computed in float64 and rounded once to float32 (the reference computes
    in f32 throughout; difference is <=1 ulp, inside the +/-2 LSB contract).
    """
    i = np.arange(half_n, dtype=np.float64)
    v = np.sin(0.5 * np.pi * (i + 0.5) / half_n)
    w = np.sin(0.5 * np.pi * v * v).astype(np.float32)
    w.setflags(write=False)
    return w


@functools.cache
def imdct_matrix(n: int, dtype=np.float32) -> np.ndarray:
    """IMDCT as a dense [n/2, n] matrix: y[j] = sum_k X[k] * M[k, j].

    M[k, j] = cos(pi/(2n) * (2k+1) * (2j+1+n/2)) — the exact Vorbis IMDCT
    (spec 4.3.1 references the MDCT of the multirate filter-bank paper; the
    reference implements it as stb's fused butterfly schedule,
    src/imdct.rs:291-659). On TPU this matmul form runs on the MXU.
    """
    k = np.arange(n // 2, dtype=np.float64)
    j = np.arange(n, dtype=np.float64)
    m = np.cos(np.pi / (2 * n) * np.outer(2 * k + 1, 2 * j + 1 + n // 2))
    m = np.ascontiguousarray(m, dtype=dtype)
    m.setflags(write=False)
    return m


@functools.cache
def dct4_split_tables(n: int, dtype=np.float32):
    """One-level Wang split of the DCT-IV the x-representation IMDCT path
    computes (ops/imdct.dct4_batch_parts_ct): X = DCT-IV_N(spec) with
    N = n/2 factors into two half-size GEMMs plus elementwise butterflies,
    HALVING the MXU FLOPs of the dominant kernel (K stays >= 128, so MXU
    tiling is unaffected):

        theta_k = pi (2k+1) / (4N),  H = N/2,  k in [0, H)
        c_k = cos(theta_k) x_k + sin(theta_k) x_{N-1-k}
        d_k = cos(theta_k) x_{N-1-k} - sin(theta_k) x_k
        U = DCT-II_H(c),  V = DST-II_H(d)
        X_0 = U_0;  X_{2j-1} = U_j - V_{j-1};  X_{2j} = U_j + V_{j-1};
        X_{N-1} = -V_{H-1}

    (identity verified exhaustively in tests/test_imdct.py against the
    direct matrix). Returns (t2 [H, H], s2 [H, H], cos_tw [H], sin_tw [H])
    with t2/s2 in the GEMM's [k, j] layout (pre-transposed: a transpose
    inside jit costs ~50x the matmul that consumes it, see CLAUDE.md).
    """
    N = n // 2
    H = N // 2
    j = np.arange(H, dtype=np.float64)
    k = np.arange(H, dtype=np.float64)
    t2 = np.cos(np.pi / H * np.outer(k + 0.5, j))          # [k, j] DCT-II^T
    s2 = np.sin(np.pi / H * np.outer(k + 0.5, j + 1.0))    # [k, j] DST-II^T
    th = np.pi * (2 * k + 1) / (4 * N)
    out = tuple(
        np.ascontiguousarray(a, dtype=dtype)
        for a in (t2, s2, np.cos(th), np.sin(th))
    )
    for a in out:
        a.setflags(write=False)
    return out


def _bark(x: np.ndarray) -> np.ndarray:
    return (
        13.1 * np.arctan(0.00074 * x)
        + 2.24 * np.arctan(1.85e-8 * x * x)
        + 0.0001 * x
    )


@functools.cache
def bark_cos_omega(n2: int, rate: int, bark_map_size: int) -> np.ndarray:
    """cos(pi*map[i]/bark_map_size) for floor0, i in [0, n2).

    map[i] = min(bark_map_size-1, floor(bark(rate/(2*n2) * i)
                                        * bark_map_size / bark(rate/2)))
    (spec 6.2.2; ref lewton src/header_cached.rs:142-158 — like the
    reference we omit the virtual trailing -1 element).
    """
    # Arithmetic deliberately in float32: `floor()` sits on integer
    # boundaries, and an f64-computed bark could flip a map bin vs the
    # f32-computing reference decoders, changing the curve materially.
    i = np.arange(n2, dtype=np.float32)
    hfl = np.float32(rate) / np.float32(2.0)
    hfl_dn = hfl / np.float32(n2)
    scale = np.float32(bark_map_size) / _bark(hfl)
    foobar = np.floor(_bark(i * hfl_dn) * scale)
    map_elem = np.minimum(foobar, np.float32(bark_map_size - 1))
    res = np.cos(map_elem * (np.float32(np.pi) / np.float32(bark_map_size)))
    res = res.astype(np.float32)
    res.setflags(write=False)
    return res


@functools.cache
def floor1_db_two_factor():
    """The 256-entry inverse-dB table as an exact-ish two-factor product:
    table[i] ~= HI[i >> 4] * LO[i & 15], max 2 ulp over all 256 entries
    (f32 product rounding; the anchors HI[16j] = table[16j] are exact and
    each LO[k] is ulp-searched to minimize the column's max error).

    Exists because the closed-form exp() evaluation is ~51 ulp off ON TPU
    (VPU transcendental, measured) — fine for musical content, but up to
    11 i16 LSB after full-scale adversarial spectra accumulate through
    the IMDCT (caught by the crafted on-chip conformance gate). A real
    gather is ~10x slower on TPU than 32 fused compare-selects.

    Returns (HI[16], LO[16]) float32. Deterministic.
    """
    t = np.asarray(floor1_inverse_db_table(), dtype=np.float32)
    td = t.astype(np.float64)
    hi = t[::16].astype(np.float32)

    def bump(x, step):
        if step == 0:
            return x
        return np.int32(x.view(np.int32) + step).view(np.float32)

    lo = np.zeros(16, np.float32)
    for k in range(16):
        base = np.float32(np.mean([td[16 * j + k] / td[16 * j]
                                   for j in range(16)]))
        tgt = t[np.arange(16) * 16 + k]
        cands = []
        for step in range(-4, 5):
            c = bump(base, step)
            prod = (hi * np.float32(c)).astype(np.float32)
            ul = np.abs(prod.view(np.int32).astype(np.int64)
                        - tgt.view(np.int32).astype(np.int64))
            cands.append((int(ul.max()), int(ul.sum()), float(c)))
        cands.sort(key=lambda x: (x[0], x[1]))
        lo[k] = np.float32(cands[0][2])
    # regression gate: a future table edit must not silently widen the
    # error past the documented 2-ulp contract
    prod = (hi[:, None] * lo[None, :]).astype(np.float32).reshape(256)
    ulp = np.abs(prod.view(np.int32).astype(np.int64)
                 - t.view(np.int32).astype(np.int64))
    assert ulp.max() <= 2, f"two-factor dB table off by {ulp.max()} ulp"
    hi.setflags(write=False)
    lo.setflags(write=False)
    return hi, lo


@functools.cache
def floor1_db_four_factor():
    """The 256-entry inverse-dB table as a FOUR-factor product:
    table[i] ~= H1[i>>6] * H0[(i>>4)&3] * L1[(i>>2)&3] * L0[i&3],
    composed in the kernel's rounding order ((H1*H0)*(L1*L0)) — max 2 ulp
    over all 256 entries, the SAME contract as floor1_db_two_factor, but
    selectable with 4x 4-way compare-select chains (12 where()s) instead
    of 2x 16-way (30 where()s): the r4 floor-kernel bisection measured
    the dB select chain at 0.72 ms/chunk, the second-largest phase.

    H1 anchors are exact table entries t[64a]; the other three tables
    start from f64 ratio means and are coordinate-descent ulp-searched
    against the full 256-entry composition. Returns (H1, H0, L1, L0)
    float32[4] each. Deterministic.
    """
    t = np.asarray(floor1_inverse_db_table(), dtype=np.float32)
    td = t.astype(np.float64)

    def bump(x, step):
        if step == 0:
            return np.float32(x)
        return np.int32(np.float32(x).view(np.int32) + step).view(np.float32)

    h1 = t[::64].astype(np.float32)
    h0 = np.float32([np.mean([td[64 * a + 16 * b] / td[64 * a]
                              for a in range(4)]) for b in range(4)])
    l1 = np.float32([np.mean([td[16 * j + 4 * c] / td[16 * j]
                              for j in range(16)]) for c in range(4)])
    l0 = np.float32([np.mean([td[4 * k + d] / td[4 * k]
                              for k in range(64)]) for d in range(4)])
    idx = np.arange(256)
    ia, ib, ic, id_ = idx >> 6, (idx >> 4) & 3, (idx >> 2) & 3, idx & 3

    def err(tabs):
        a, b, c, d = tabs
        hi = (a[ia] * b[ib]).astype(np.float32)
        lo = (c[ic] * d[id_]).astype(np.float32)
        ul = np.abs((hi * lo).astype(np.float32).view(np.int32)
                    .astype(np.int64) - t.view(np.int32).astype(np.int64))
        return int(ul.max()), int(ul.sum())

    tabs = [h1, h0, l1, l0]
    best = err(tabs)
    improved = True
    while improved:
        improved = False
        for ti in range(1, 4):  # H1 anchors stay exact
            for e in range(4):
                cur = tabs[ti][e]
                for step in range(-6, 7):
                    tabs[ti][e] = bump(cur, step)
                    m = err(tabs)
                    if m < best:
                        best, cur, improved = m, tabs[ti][e], True
                tabs[ti][e] = cur
    # regression gate: same documented contract as the two-factor form
    assert best[0] <= 2, f"four-factor dB table off by {best[0]} ulp"
    for a in tabs:
        a.setflags(write=False)
    return tuple(tabs)

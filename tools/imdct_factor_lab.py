#!/usr/bin/env python3
"""Four-step factored DCT-IV lab (VERDICT r4 next #1).

The decode pipeline's long-block IMDCT is a dense [K, M] DCT-IV GEMM at
XLA HIGHEST (the only conformant precision, PERF.md r3 precision lab) —
~40% of chunk time. A Cooley-Tukey-style two-stage factorization N =
N1*N2 does asymptotically fewer MACs; this lab (a) validates the exact
factorization identity in numpy f64, (b) measures the real cost of the
candidate formulations on the chip at production shapes, interleaved
A/B against the direct GEMM.

Math. For X[m] = sum_k x_k cos(pi/N (k+1/2)(m+1/2)) with k = k1*N2+k2,
m = m1 + N1*m2 (k1, m1 in [0,N1); k2, m2 in [0,N2)):

    (k+1/2)(m+1/2) * pi/N = A1 + A2 + A3 + A4
    A1 = pi k1 (m1+1/2)/N1          (stage-1 kernel: k1 x m1)
    A2 = pi k1 m2                   (parity: (-1)^(k1 m2), m2 parity only)
    A3 = pi (k2+1/2)(m1+1/2)/N      (twiddle: k2 x m1)
    A4 = pi (k2+1/2) m2 / N2        (stage-2 kernel: k2 x m2)

Folding A3 into the stage-1 matrices (they then depend on k2 -> one
batched GEMM over k2) and splitting the parity p = m2 & 1:

    U[p,m1,k2] = sum_k1 x[k1,k2] (-1)^(k1 p) cos(A1+A3)
    V[p,m1,k2] = sum_k1 x[k1,k2] (-1)^(k1 p) sin(A1+A3)
    X[m1+N1 m2] = sum_k2  U[p(m2),m1,k2] cos(A4) - V[p(m2),m1,k2] sin(A4)

Stage-1 is 4*N1 MACs per input element (2x from cos+sin, 2x from the
parity doubling); stage-2 is 2*N2 MACs per output element. The known
structural taxes this lab prices: the MXU pads contraction dims to 128
(small-N1 variants waste 128/N1), the stage-1 output is 4x the input
(complex x parity), and HIGHEST multiplies every GEMM's passes by ~6.

Usage:
  python tools/imdct_factor_lab.py --numpy     # f64 identity check
  python tools/imdct_factor_lab.py --chip      # timed A/B on the TPU
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def dct4_direct_np(x: np.ndarray) -> np.ndarray:
    N = x.shape[-1]
    k = np.arange(N)[:, None]
    m = np.arange(N)[None, :]
    M = np.cos(np.pi / N * (k + 0.5) * (m + 0.5))
    return x @ M


def four_step_tables(N1: int, N2: int, dtype=np.float64):
    """(W [N1, N2, 2, 2, N1], c4/s4 [N2, N2]) — stage-1 matrices with the
    twiddle folded (indexed [k1, k2, cs, p, m1]) and the stage-2 kernel
    cos/sin indexed [m2, k2]."""
    N = N1 * N2
    k1 = np.arange(N1)[:, None, None]
    m1 = np.arange(N1)[None, None, :]
    k2 = np.arange(N2)[None, :, None]
    ang = np.pi * k1 * (m1 + 0.5) / N1 + np.pi * (k2 + 0.5) * (m1 + 0.5) / N
    base = np.stack([np.cos(ang), np.sin(ang)], axis=2)  # [k1, k2, cs, m1]
    sgn = np.stack([np.ones(N1), (-1.0) ** np.arange(N1)], axis=1)  # [k1,p]
    W = base[:, :, :, None, :] * sgn[:, None, None, :, None]
    m2 = np.arange(N2)[:, None]
    A4 = np.pi * (np.arange(N2)[None, :] + 0.5) * m2 / N2
    return (W.astype(dtype), np.cos(A4).astype(dtype),
            np.sin(A4).astype(dtype))


def dct4_four_step_np(x: np.ndarray, N1: int, N2: int) -> np.ndarray:
    N = N1 * N2
    assert x.shape[-1] == N
    W, c4, s4 = four_step_tables(N1, N2, x.dtype)
    xr = x.reshape(x.shape[:-1] + (N1, N2))
    # stage 1 (batched over k2): UV [..., k2, cs, p, m1]
    UV = np.einsum("...ab,abspm->...bspm", xr, W)
    # stage 2: contract k2 per (m2-parity) group, interleave parities
    q = np.arange(N2)
    Xq = (np.einsum("...bpm,qb->...qpm", UV[..., 0, :, :], c4)
          - np.einsum("...bpm,qb->...qpm", UV[..., 1, :, :], s4))
    out = Xq[..., q, q % 2, :]  # pick each m2's parity plane
    return out.reshape(x.shape[:-1] + (N,))


def cmd_numpy() -> int:
    rng = np.random.default_rng(0)
    ok = True
    for (N1, N2) in [(128, 8), (64, 16), (32, 32), (16, 8)]:
        N = N1 * N2
        x = rng.standard_normal((3, N))
        ref = dct4_direct_np(x)
        got = dct4_four_step_np(x, N1, N2)
        err = np.abs(got - ref).max() / np.abs(ref).max()
        print(f"  f64 N={N} ({N1}x{N2}): rel err {err:.3e}")
        ok &= err < 1e-12
        # f32 error vs f64 reference, adversarial-scale values
        xa = (rng.standard_normal((3, N)) * 2e7).astype(np.float32)
        ref64 = dct4_direct_np(xa.astype(np.float64))
        g32 = dct4_four_step_np(xa, N1, N2).astype(np.float64)
        d32 = dct4_direct_np(xa).astype(np.float64)
        scale = np.abs(ref64).max()
        print(f"    f32 four-step vs f64: {np.abs(g32 - ref64).max() / scale:.3e}"
              f"  (direct f32: {np.abs(d32 - ref64).max() / scale:.3e})")
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


def cmd_chip(args) -> int:
    import jax
    import jax.numpy as jnp

    R = args.rows  # production: S*C*T = 256*2*128 = 65536 transforms
    N = args.n
    hp = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((R, N)).astype(np.float32))
    Md = jnp.asarray(dct4_direct_np(np.eye(N)).astype(np.float32))

    def timed(fn, x, iters=args.iters, reps=args.reps):
        """One jit with `iters` chained applications (out feeds back in),
        so tunnel dispatch amortizes; median of `reps` calls."""
        @jax.jit
        def loop(x):
            def body(c, _):
                y = fn(c)
                # renormalize so chained f32 values stay finite
                return y * jnp.float32(1.0 / N), None
            y, _ = jax.lax.scan(body, x, None, length=iters)
            return y
        jax.block_until_ready(loop(x))  # compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(loop(x))
            ts.append((time.perf_counter() - t0) / iters)
        return float(np.median(ts))

    def direct(x):
        return jnp.einsum("rk,km->rm", x, Md, precision=hp,
                          preferred_element_type=jnp.float32)

    variants = {"direct_highest": direct}

    for (N1, N2) in [tuple(map(int, s.split("x")))
                     for s in args.factors.split(",")]:
        W, c4, s4 = four_step_tables(N1, N2, np.float32)
        # [k1, k2, cs*p*m1] for the batched stage-1 GEMM
        Wj = jnp.asarray(W.reshape(N1, N2, 4 * N1))
        c4e, c4o = jnp.asarray(c4[0::2]), jnp.asarray(c4[1::2])
        s4e, s4o = jnp.asarray(s4[0::2]), jnp.asarray(s4[1::2])

        def four_step(x, N1=N1, N2=N2, Wj=Wj, c4e=c4e, c4o=c4o,
                      s4e=s4e, s4o=s4o):
            xr = x.reshape(R, N1, N2)
            uv = jnp.einsum("rab,abu->rbu", xr, Wj, precision=hp,
                            preferred_element_type=jnp.float32)
            uv = uv.reshape(R, N2, 2, 2, N1)
            Uc, Vc = uv[:, :, 0], uv[:, :, 1]  # [r, k2, p, m1]
            # stage 2: f32 contractions over k2 (tiny K — XLA fuses or
            # pads; both priced here), parity-split m2 groups
            Xe = (jnp.einsum("rbm,qb->rqm", Uc[:, :, 0], c4e, precision=hp)
                  - jnp.einsum("rbm,qb->rqm", Vc[:, :, 0], s4e,
                               precision=hp))
            Xo = (jnp.einsum("rbm,qb->rqm", Uc[:, :, 1], c4o, precision=hp)
                  - jnp.einsum("rbm,qb->rqm", Vc[:, :, 1], s4o,
                               precision=hp))
            return jnp.stack([Xe, Xo], axis=2).reshape(R, N)

        variants[f"four_step_{N1}x{N2}"] = four_step

    # numerics first (cheap): all variants vs direct on one batch
    ref = np.asarray(direct(x0[:256]))
    for name, fn in variants.items():
        if name == "direct_highest":
            continue
        got = np.asarray(jax.jit(fn)(x0)[:256])
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        print(f"  {name}: max rel diff vs direct {rel:.3e}")

    results = {}
    order = list(variants)
    for rep in range(2):  # interleaved A/B
        for name in order:
            dt = timed(variants[name], x0)
            results.setdefault(name, []).append(dt)
            print(f"  [{rep}] {name}: {dt * 1e3:.3f} ms/iter")
    print("medians:")
    base = float(np.median(results["direct_highest"]))
    for name, ts in results.items():
        t = float(np.median(ts))
        print(f"  {name}: {t * 1e3:.3f} ms  ({t / base:.2f}x of direct)")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--numpy", action="store_true")
    ap.add_argument("--chip", action="store_true")
    ap.add_argument("--rows", type=int, default=65536)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--factors", default="128x8,64x16,32x32")
    args = ap.parse_args()
    if args.numpy:
        return cmd_numpy()
    if args.chip:
        return cmd_chip(args)
    print("pick --numpy or --chip")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())

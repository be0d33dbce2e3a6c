"""Interleaved A/B of the r5 Bresenham render forms on the real chip.

Variants (ops/floor_curve.BRES_SINGLE_Q, flipped via setattr +
jax.clear_caches like every other measured knob in this repo):
  single  BRES_SINGLE_Q=True   — ONE floor quotient per lane:
          y = lo_y + sgn*floor(d*ady/adx) (integer identity with the
          split form, proof in ops/floor_curve.bresenham_idx; asserted
          bit-identical by tests/test_floor_curve_exact.py)
  split   BRES_SINGLE_Q=False  — the r1-r4 three-quotient two-limb chain

Interleaved rounds x --reps, median per variant. Run on the chip:
`python tools/ab_bres.py`.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from lewton_tpu.models.decoder import compile_setup
    from lewton_tpu.ops import floor_curve as fc
    from lewton_tpu.ops.windowing import init_window_carry
    from lewton_tpu.parallel import batch as pb
    from lewton_tpu.testing import synthetic_frames, synthetic_headers

    S, T = args.streams, args.chunk
    ident, setup = synthetic_headers(channels=2, bs0_exp=8, bs1_exp=11)
    cs = compile_setup(ident, setup)
    fr = {k: jax.device_put(jnp.asarray(v))
          for k, v in synthetic_frames(cs, T=T, S=S, seed=3).items()}
    carry0 = jax.tree.map(lambda x: jnp.broadcast_to(x, (S,) + x.shape),
                          init_window_carry(cs.channels, cs.n1 // 2))

    outs = {}

    def timed(single: bool):
        fc.BRES_SINGLE_Q = single
        jax.clear_caches()
        (o, _), c = pb.decode_chunk_batch(cs, fr, carry0, with_i16=True)
        jax.block_until_ready(o)
        outs["single" if single else "split"] = jax.device_get(o)
        t0 = time.perf_counter()
        c = carry0
        for _ in range(args.iters):
            (o, _), c = pb.decode_chunk_batch(cs, fr, c, with_i16=True)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / args.iters * 1e3

    results = {"single": [], "split": []}
    for rep in range(args.reps):
        for name, flag in (("single", True), ("split", False)):
            ms = timed(flag)
            results[name].append(ms)
            print(f"rep {rep} {name:7s} {ms:7.3f} ms/chunk", flush=True)
    fc.BRES_SINGLE_Q = True
    import numpy as np

    same = np.array_equal(outs["single"], outs["split"])
    print(f"i16 outputs bit-identical across forms: {same}")
    base = statistics.median(results["split"])
    for name, vals in results.items():
        med = statistics.median(vals)
        print(f"{name:7s} median {med:7.3f} ms/chunk  "
              f"({base / med:5.3f}x vs split)")


if __name__ == "__main__":
    main()

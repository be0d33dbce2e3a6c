"""Intra-floor-kernel bisection on the real chip.

The r4 chunk bisection (after the MXU lane-reversal landed in the
overlap kernel) puts the floor kernel at ~1.8 ms — the largest
non-structural bucket. This attributes time INSIDE the kernel by
knocking out one phase at a time (ops/floor_kernel._B_* flags; numerics
intentionally broken, timing only), re-tracing (jax.clear_caches(), see
tools/bisect_synth.py for why), and re-timing the production chunk.
Run: `python tools/bisect_floor.py`.
"""

from __future__ import annotations

import argparse
import os
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
    args = ap.parse_args()

    from lewton_tpu.models.decoder import compile_setup
    from lewton_tpu.ops import floor_kernel as fk
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

    def timed(label):
        jax.clear_caches()  # REQUIRED to pick up the flag flips
        (o, _), c = pb.decode_chunk_batch(cs, fr, carry0, with_i16=True)
        jax.block_until_ready(o)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            c = carry0
            for _ in range(args.iters):
                (o, _), c = pb.decode_chunk_batch(cs, fr, c, with_i16=True)
            jax.block_until_ready(o)
            best = min(best, (time.perf_counter() - t0) / args.iters * 1e3)
        print(f"{label:18s} {best:7.3f} ms/chunk", flush=True)
        return best

    full = timed("full")
    for flag in ("_B_NO_FOLD", "_B_NO_GEMM", "_B_NO_BRES", "_B_NO_DB",
                 "_B_NO_COUPLE"):
        setattr(fk, flag, True)
        t = timed(flag)
        setattr(fk, flag, False)
        print(f"  -> {flag[6:].lower():10s} ~{full - t:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()

"""Intra-overlap-kernel bisection on the real chip (VERDICT r3 #3).

The r3 chunk bisection put the overlap kernel at ~3.4 ms — tying the
MXU-ceiling IMDCT GEMM it consumes. This attributes time INSIDE the
kernel by knocking out one phase at a time (ops/overlap_kernel._B_*
flags; numerics intentionally broken, timing only), re-tracing
(jax.clear_caches(), see tools/bisect_synth.py for why), and re-timing
the production chunk. Run: `python tools/bisect_overlap.py`.
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
    from lewton_tpu.ops import overlap_kernel as ok
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
    for flag in ("_B_NO_FLIP", "_B_NO_LS", "_B_NO_SHORT", "_B_NO_MIX",
                 "_B_NO_PWRSEL", "_B_NO_CARRY"):
        setattr(ok, flag, True)
        t = timed(flag)
        setattr(ok, flag, False)
        print(f"  -> {flag[6:].lower():10s} ~{full - t:6.3f} ms", flush=True)
    # PRE_REV off = in-kernel roll-network reversal instead of XLA flip
    ok.PRE_REV = False
    t = timed("PRE_REV=False")
    ok.PRE_REV = True
    print(f"  -> in-kernel rev delta {t - full:+6.3f} ms vs pre_rev",
          flush=True)


if __name__ == "__main__":
    main()

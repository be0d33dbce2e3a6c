"""Interleaved A/B of the r4 floor_curve forms on the real chip.

Variants (ops/floor_curve knobs, flipped via setattr + jax.clear_caches
like every other measured knob in this repo):
  new     DB_FOUR_FACTOR=True   BRES_SHARED_RCP=True   (candidate default)
  db2     DB_FOUR_FACTOR=False  BRES_SHARED_RCP=True   (isolate the dB form)
  div3    DB_FOUR_FACTOR=True   BRES_SHARED_RCP=False  (isolate the rcp form)
  legacy  DB_FOUR_FACTOR=False  BRES_SHARED_RCP=False  (r3 production form)

Interleaved rounds (new, db2, div3, legacy) x --reps, median per variant —
CLAUDE.md: this host's wall clock swings +-20%, so only interleaved
medians settle an A/B. Run: `python tools/ab_floor.py`.
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

VARIANTS = {
    "new": (True, True),
    "db2": (False, True),
    "div3": (True, False),
    "legacy": (False, False),
}


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

    def timed(name):
        db4, rcp = VARIANTS[name]
        fc.DB_FOUR_FACTOR, fc.BRES_SHARED_RCP = db4, rcp
        jax.clear_caches()
        (o, _), c = pb.decode_chunk_batch(cs, fr, carry0, with_i16=True)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        c = carry0
        for _ in range(args.iters):
            (o, _), c = pb.decode_chunk_batch(cs, fr, c, with_i16=True)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / args.iters * 1e3

    results = {k: [] for k in VARIANTS}
    for rep in range(args.reps):
        for name in VARIANTS:
            ms = timed(name)
            results[name].append(ms)
            print(f"rep {rep} {name:7s} {ms:7.3f} ms/chunk", flush=True)
    fc.DB_FOUR_FACTOR, fc.BRES_SHARED_RCP = True, True
    base = statistics.median(results["legacy"])
    for name, vals in results.items():
        med = statistics.median(vals)
        print(f"{name:7s} median {med:7.3f} ms/chunk  "
              f"({base / med:5.3f}x vs legacy)")


if __name__ == "__main__":
    main()

"""Minimal host-RSS leak probe for the device transfer path.

The r5 serve soak measured linear host RSS growth (~10 MB / 24-stream
wave) on the TPU backend only — the identical CPU-backend soak is flat,
so scheduler bookkeeping is ruled out and the suspect is the
device_put / jit-dispatch / np.asarray(D2H) path. This drives each
stage in isolation and prints RSS every --print iters so the leaking
stage is attributable.

Modes (--mode):
  h2d       device_put a host buffer, block, drop the reference
  d2h       np.asarray() of a persistent device array (pure D2H)
  roundtrip device_put + jitted op + np.asarray + drop (the serve shape)
  gc        roundtrip, with gc.collect() every iter (is it GC lag?)
"""

from __future__ import annotations

import argparse
import gc
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="roundtrip",
                    choices=["h2d", "d2h", "roundtrip", "gc"])
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--mb", type=float, default=8.0)
    ap.add_argument("--print", dest="every", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(args.mb * (1 << 20) // 4)
    host = np.arange(n, dtype=np.float32)
    dev_persistent = jax.device_put(host)
    jax.block_until_ready(dev_persistent)

    @jax.jit
    def bump(x):
        return x + 1.0

    jax.block_until_ready(bump(dev_persistent))  # compile outside the loop
    print(f"mode={args.mode} buf={args.mb} MB start RSS {rss_mb():.0f} MB",
          flush=True)
    r0 = rss_mb()
    for i in range(args.iters):
        if args.mode == "h2d":
            d = jax.device_put(host)
            jax.block_until_ready(d)
            del d
        elif args.mode == "d2h":
            h = np.asarray(dev_persistent)
            del h
        else:
            d = jax.device_put(host)
            out = bump(d)
            h = np.asarray(out)
            del d, out, h
            if args.mode == "gc":
                gc.collect()
        if (i + 1) % args.every == 0:
            print(f"iter {i + 1:4d}: RSS {rss_mb():7.0f} MB", flush=True)
    r1 = rss_mb()
    per = (r1 - r0) / args.iters
    print(f"growth {r1 - r0:+.0f} MB over {args.iters} iters "
          f"({per:+.2f} MB/iter, buffer {args.mb} MB)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Probe whether the device link carries H2D and D2H concurrently.

The e2e surface is transfer-bound (PERF.md r4: h2d 24.5% + d2h 64.7% of
wall, measured serialized). If the link is full duplex, the pipelined
decode loop should be able to hide the H2D leg entirely under the D2H
drain; if it is half duplex (one TCP stream through the axon tunnel),
the sum is the floor and the current pipeline is already optimal.

Method: one H2D payload and one D2H payload of equal byte size.
  a) time H2D alone (device_put + block)
  b) time D2H alone (np.asarray of a ready device array)
  c) time both issued concurrently from two host threads
Duplex ratio = (a+b)/c: ~2.0 means full duplex, ~1.0 half duplex.
Interleaved x3 medians — the tunnel is bursty (CLAUDE.md).

Usage:  python tools/duplex_probe.py [--mb 64] [--reps 3]
"""

from __future__ import annotations

import argparse
import statistics
import threading
import time

import jax
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    n = args.mb * (1 << 20) // 4
    host_src = np.arange(n, dtype=np.float32)
    dev = jax.block_until_ready(jax.numpy.asarray(host_src) * 2.0)

    def h2d():
        jax.block_until_ready(jax.device_put(host_src))

    def fresh():
        # a NEW device array each rep: jax caches the host copy on the
        # Array after the first np.asarray, which would time to ~0
        return jax.block_until_ready(dev * 1.0)

    def d2h(a):
        np.asarray(a)

    # warmup both legs
    h2d()
    d2h(fresh())

    rows = {"h2d": [], "d2h": [], "both": []}
    for _ in range(args.reps):
        for name in ("h2d", "d2h", "both"):
            a = fresh()
            t0 = time.perf_counter()
            if name == "both":
                th = threading.Thread(target=h2d)
                th.start()
                d2h(a)
                th.join()
            elif name == "h2d":
                h2d()
            else:
                d2h(a)
            rows[name].append(time.perf_counter() - t0)

    m = {k: statistics.median(v) for k, v in rows.items()}
    ratio = (m["h2d"] + m["d2h"]) / m["both"] if m["both"] else float("nan")
    print({
        "mb": args.mb,
        "h2d_s": round(m["h2d"], 3),
        "d2h_s": round(m["d2h"], 3),
        "both_s": round(m["both"], 3),
        "h2d_MBps": round(args.mb / m["h2d"], 1),
        "d2h_MBps": round(args.mb / m["d2h"], 1),
        "duplex_ratio": round(ratio, 2),
        "verdict": ("full-duplex" if ratio > 1.6 else
                    "half-duplex" if ratio < 1.25 else "partial"),
        "all": {k: [round(x, 3) for x in v] for k, v in rows.items()},
    })


if __name__ == "__main__":
    main()

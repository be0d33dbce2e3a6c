#!/usr/bin/env python3
"""Decode-speed timer (analog of the reference's examples/perf.rs:23-47).

Usage: python examples/perf.py FILE.ogg [--backend numpy|native|jax]
Prints per-file decode seconds and x-realtime.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from lewton_tpu.inside_ogg import OggStreamReader  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("--backend", default="native",
                    choices=["numpy", "native", "jax"])
    args = ap.parse_args()
    for path in args.files:
        r = OggStreamReader(path, backend=args.backend)
        t0 = time.perf_counter()
        pcm = r.read_all_i16()
        dt = time.perf_counter() - t0
        secs = pcm.shape[0] / r.ident_hdr.sample_rate
        print(f"{path}: {secs:.2f}s audio decoded in {dt:.3f}s "
              f"({secs / dt:.1f}x realtime, backend={args.backend})")


if __name__ == "__main__":
    main()

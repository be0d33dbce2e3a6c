"""cpu-time A/B: native p12 emit vs i16-decode + separate lt_pack12 pass.

VERDICT r4 #5: with the p12 transport the front-end used to touch the
dominant residue buffer twice (entropy decode writes i16, a later
lt_pack12 pass re-reads and packs). lt_decode_chunk_p12 packs straight
out of the hot per-packet scratch row instead. This measures both forms
on the production batch shape, CLOCK_PROCESS_CPUTIME (wall on this vCPU
swings +-20%; cpu-time A/B is stable to +-2%), interleaved reps.

Host-only (no device, no transfers): run anywhere.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--secs", type=float, default=2.0)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import subprocess

    import numpy as np

    from lewton_tpu import native
    from lewton_tpu.inside_ogg import read_headers
    from lewton_tpu.models.decoder import StreamDecoder
    from lewton_tpu.parallel.pack12 import pack12_np
    from tools import corpus

    root = "tests/data/corpus"
    corpus.ensure_corpus(root)
    subprocess.run(["make", "-C", "lewton_tpu/native", "-s"], check=True)
    assert native.available()
    data = open(f"{root}/stereo_44k_q3.ogg", "rb").read()
    from lewton_tpu.ogg import PacketReader

    rdr = PacketReader(data)
    headers, _ = read_headers(rdr)
    spans, _, _, _, _ = native.demux_spans(data)
    audio = spans[3:]
    sd = StreamDecoder(headers.ident, headers.setup, chunk=args.chunk,
                       raw_headers=(headers.raw_ident, headers.raw_setup))
    S, T = args.streams, args.chunk
    streams = [audio[:T]] * S

    def run_variant(p12_emit: bool) -> float:
        sd.set_residue_transport("p12" if p12_emit else "default")
        out = sd.entropy_chunk_batch(streams)  # allocate at this dtype
        n = 0
        t0 = time.process_time()
        while time.process_time() - t0 < args.secs:
            fr = sd.entropy_chunk_batch(streams, out=out)
            if not p12_emit:
                pack12_np(fr["residue"])  # the transport's separate pass
            n += S * T
        return n / (time.process_time() - t0)

    results = {"i16+pack": [], "p12_emit": []}
    for rep in range(args.reps):
        for name, flag in (("i16+pack", False), ("p12_emit", True)):
            r = run_variant(flag)
            results[name].append(r)
            print(f"rep {rep} {name:9s} {r:10.1f} packets/s (cpu-time)",
                  flush=True)
    sd.set_residue_transport("default")
    base = statistics.median(results["i16+pack"])
    for name, vals in results.items():
        med = statistics.median(vals)
        print(f"{name:9s} median {med:10.1f} packets/s  "
              f"({med / base:5.3f}x vs i16+pack)")


if __name__ == "__main__":
    main()

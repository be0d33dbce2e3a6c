"""Interleaved A/B of the serve scheduler's scan depth on the real chip.

Builds TWO schedulers (scan=1 and scan=N) in one process, pays every
compile ONCE during warmup, then alternates timed 48-stream waves
between them — the subprocess-per-config form pays multi-minute warmup
compiles per run through this tunnel, and its timeouts land in warmup,
not measurement. The adaptive backlog-sized depth (serve.py
step_dispatch) means scan=N only engages when streams hold >= N chunks
of backlog — exactly the whole-file-queued regime this bench models.

Run: `python tools/ab_serve.py [--scan 8] [--reps 3]`.
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
    ap.add_argument("--streams", type=int, default=48)
    ap.add_argument("--scan", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import subprocess

    from lewton_tpu.serve import StreamingScheduler
    from tools import corpus

    root = "tests/data/corpus"
    corpus.ensure_corpus(root)
    subprocess.run(["make", "-C", "lewton_tpu/native", "-s"], check=True)
    files = ["stereo_44k_q3.ogg", "stereo_48k_q5.ogg", "mono_16k_q3.ogg"]
    datas = [open(f"{root}/{f}", "rb").read() for f in files]
    S = args.streams

    scheds = {}
    for name, scan in (("scan1", 1), (f"scan{args.scan}", args.scan)):
        sched = StreamingScheduler(capacity=max(8, S // len(files) + 1),
                                   chunk=64, scan=scan)
        # warmup compiles every (group, scan-depth) program once
        for i, d in enumerate(datas):
            sched.add_stream(("warm", i), d)
        while sched.step():
            pass
        for i in range(S):
            sched.add_stream(("warm2", i), datas[i % len(datas)])
        while sched.step():
            pass
        # free every warmup slot: a registered-but-done stream would
        # otherwise hold its slot and push timed waves into NEW groups
        # (fresh compiles inside the measurement)
        for i, _ in enumerate(datas):
            sched.remove_stream(("warm", i))
        for i in range(S):
            sched.remove_stream(("warm2", i))
        scheds[name] = sched
        print(f"warmed {name}", flush=True)

    results = {k: [] for k in scheds}
    wave = 0
    for rep in range(args.reps):
        for name, sched in scheds.items():
            t0 = time.perf_counter()
            total = 0.0
            for i in range(S):
                sched.add_stream((wave, i), datas[i % len(datas)])
            while sched.step():
                pass
            for i in range(S):
                pcm = sched.poll((wave, i))
                grp, _ = sched.streams[(wave, i)]
                total += pcm.shape[0] / grp.cs.sample_rate
            dt = time.perf_counter() - t0
            for i in range(S):
                sched.remove_stream((wave, i))
            wave += 1
            x = total / dt
            results[name].append(x)
            print(f"rep {rep} {name:7s} {x:7.1f}x realtime "
                  f"({dt:.3f}s wall)", flush=True)
    base = statistics.median(results["scan1"])
    for name, vals in results.items():
        med = statistics.median(vals)
        print(f"{name:7s} median {med:7.1f}x  ({med / base:5.3f}x vs scan1)")


if __name__ == "__main__":
    main()

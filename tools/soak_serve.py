"""Serve soak: sustained many-wave decoding through ONE scheduler.

Production serving runs for hours; a leak in slot reuse, the inflight
queue, per-wave frame buffers, or jax buffer retention would grow RSS
wave over wave even though every individual test passes. This drives
repeated full waves (register -> decode -> poll -> remove) through one
StreamingScheduler for --minutes, recording RSS and throughput per
wave, and fails if the back-half RSS trend keeps climbing.

Run on the chip: `python tools/soak_serve.py --minutes 10`.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--streams", type=int, default=24)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend: leak behavior lives in "
                    "host-side state (slot reuse, inflight queue, frame "
                    "buffers, jax buffer retention) and CPU waves run "
                    "fast enough to accumulate hundreds of samples")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import subprocess

    from lewton_tpu.serve import StreamingScheduler
    from tools import corpus

    root = os.path.join(ROOT, "tests", "data", "corpus")
    corpus.ensure_corpus(root)
    subprocess.run(["make", "-C", os.path.join(ROOT, "lewton_tpu", "native"),
                    "-s"], check=True)
    files = ["stereo_44k_q3.ogg", "stereo_48k_q5.ogg", "mono_16k_q3.ogg"]
    datas = [open(f"{root}/{f}", "rb").read() for f in files]
    S = args.streams
    sched = StreamingScheduler(capacity=max(8, S // len(files) + 1),
                               chunk=64, scan=1)
    # warmup wave OUTSIDE the soak window: it pays every group's compile
    # (minutes through a degraded tunnel) and would dominate short soaks
    for i in range(S):
        sched.add_stream(("warm", i), datas[i % len(datas)])
    while sched.step():
        pass
    for i in range(S):
        sched.poll(("warm", i))
        sched.remove_stream(("warm", i))
    print("warmup done", flush=True)
    t_end = time.time() + args.minutes * 60
    wave, rss_log, x_log = 0, [], []
    audio_total = 0.0
    t_start = time.time()
    while time.time() < t_end:
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
            assert sched.is_done((wave, i)), (wave, i)
            sched.remove_stream((wave, i))
        dt = time.perf_counter() - t0
        audio_total += total
        rss_log.append(rss_mb())
        x_log.append(total / dt)
        if wave % 10 == 0:
            print(f"wave {wave:4d}: {total / dt:7.1f}x, RSS {rss_log[-1]:.0f} MB",
                  flush=True)
        wave += 1
    wall = time.time() - t_start
    if len(rss_log) < 8:
        print(f"only {len(rss_log)} waves completed — too few for a "
              "trend; rerun with a longer --minutes (or --cpu)")
        return 2
    # leak check: median RSS of the last quarter vs the second quarter
    # (the first waves legitimately warm allocators/caches)
    q = max(1, len(rss_log) // 4)
    early = statistics.median(rss_log[q : 2 * q])
    late = statistics.median(rss_log[-q:])
    growth = late - early
    print(f"waves {wave}, audio {audio_total:.0f}s in {wall:.0f}s wall "
          f"({audio_total / wall:.1f}x sustained), RSS {rss_log[0]:.0f} -> "
          f"{rss_log[-1]:.0f} MB (q2 median {early:.0f}, last-q median "
          f"{late:.0f}, growth {growth:+.0f} MB)")
    ok = growth < 64.0  # steady-state budget: < 64 MB drift over the soak
    print("SOAK PASS" if ok else "SOAK FAIL: RSS still growing")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

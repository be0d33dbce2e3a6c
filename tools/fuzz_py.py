"""Mutation fuzz campaign for the PYTHON front-end (numpy backend).

The C++ half has lt_fuzz (ASAN/UBSAN, 4,233 variants per seed); the
Python bitpack/huffman/header/floor/residue path is exercised by
tests/test_malformed.py but only at ~14 variants. This drives the same
mutation families at campaign scale through OggStreamReader
(backend="numpy") and the from-scratch Ogg demuxer, asserting the error
taxonomy: every variant must decode or raise VorbisError/OggError —
anything else (or a hang) is a bug. Reference analog:
/root/reference/dev/cmp/tests/fuzzed.rs:14-49 (fuzzer-minimized assets,
network-blocked here, so we generate the mutation corpus).

Usage: python tools/fuzz_py.py [--seed N] [--per-file N] [--files a,b]
"""

from __future__ import annotations

import argparse
import os
import signal
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lewton_tpu.errors import VorbisError  # noqa: E402
from lewton_tpu.inside_ogg import OggStreamReader  # noqa: E402


def variants(data: bytes, rng: np.random.RandomState, n: int):
    """Yield (name, bytes): truncations, bit flips, byte stomps, region
    scrambles, duplications, splices — weighted toward header pages
    (first ~1 KB) where parser state lives."""
    L = len(data)
    if L < 2:  # degenerate input: the mutation draws below need L >= 2
        yield "as_is", data
        return
    for i in range(n):
        kind = rng.randint(0, 6)
        b = bytearray(data)
        if kind == 0:  # truncation (anywhere, incl. mid-page)
            cut = int(rng.randint(1, L))
            yield f"trunc_{cut}", bytes(b[:cut])
        elif kind == 1:  # single bit flip, header-weighted
            pos = int(rng.randint(0, min(L, 1024))) if rng.rand() < 0.6 \
                else int(rng.randint(0, L))
            b[pos] ^= 1 << int(rng.randint(0, 8))
            yield f"bitflip_{pos}", bytes(b)
        elif kind == 2:  # byte stomp run
            pos = int(rng.randint(0, L))
            run = int(rng.randint(1, 64))
            for j in range(pos, min(L, pos + run)):
                b[j] = int(rng.randint(0, 256))
            yield f"stomp_{pos}_{run}", bytes(b)
        elif kind == 3:  # region scramble (xor a constant over a window)
            pos = int(rng.randint(0, L))
            run = int(rng.randint(8, 256))
            for j in range(pos, min(L, pos + run)):
                b[j] ^= 0xA5
            yield f"scramble_{pos}_{run}", bytes(b)
        elif kind == 4:  # duplicate a slice (lacing/continuation stress)
            pos = int(rng.randint(0, L))
            run = int(rng.randint(1, 512))
            yield f"dup_{pos}_{run}", bytes(b[:pos] + b[pos:pos + run] * 2
                                            + b[pos + run:])
        else:  # splice two offsets (page-boundary tearing)
            a = int(rng.randint(0, L))
            c = int(rng.randint(0, L))
            yield f"splice_{a}_{c}", bytes(b[:a] + b[c:])


def run_one(data: bytes) -> str:
    """Decode everything; return 'ok' or 'err' (clean taxonomy)."""
    try:
        r = OggStreamReader(data, backend="numpy")
        while True:
            pck = r.read_next_audio_packet()
            if pck is None:
                return "ok"
            r.dec_packet_planar_f32(pck)
    except VorbisError:
        return "err"


def run_inc_demux(data: bytes, rng: np.random.RandomState) -> str:
    """Incremental demux parity: the serving/async input path
    (IncrementalPacketReader fed in random-sized chunks) must yield the
    SAME packet stream as the batch PacketReader on the same bytes, and
    fail with the same taxonomy when the container is broken."""
    from lewton_tpu.errors import OggError
    from lewton_tpu.ogg import PacketReader
    from lewton_tpu.ogg.demux import IncrementalPacketReader

    def drain_batch():
        r = PacketReader(data)
        out = []
        while (p := r.read_packet()) is not None:
            out.append((p.stream_serial, p.data, p.last_in_stream))
        return out

    def drain_inc():
        r = IncrementalPacketReader()
        out, pos = [], 0
        while pos < len(data):
            n = int(rng.randint(1, 4096))
            r.feed(data[pos : pos + n])
            pos += n
            while (p := r.read_packet()) is not None:
                out.append((p.stream_serial, p.data, p.last_in_stream))
        return out

    try:
        batch = drain_batch()
        batch_err = None
    except OggError as e:
        batch, batch_err = None, type(e)
    try:
        inc = drain_inc()
        inc_err = None
    except OggError as e:
        inc, inc_err = None, type(e)
    if batch_err is not None or inc_err is not None:
        # both readers must agree the container is broken (the incremental
        # reader may legitimately fail EARLIER or LATER in the byte
        # stream, but never succeed where batch hard-fails, or vice versa)
        if (batch_err is None) != (inc_err is None):
            raise AssertionError(
                f"demux disagreement: batch={batch_err} inc={inc_err}")
        return "err"
    if batch != inc:
        raise AssertionError(
            f"incremental demux diverged: {len(batch)} vs {len(inc)} packets")
    return "ok"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--per-file", type=int, default=150)
    ap.add_argument("--files", default="tiny_44k.ogg,stereo_44k_q3.ogg,"
                    "mono_16k_q3.ogg,chained_44k.ogg,ch4_32k_q2.ogg")
    ap.add_argument("--api", default="decode", choices=["decode", "demux"],
                    help="decode: full OggStreamReader(numpy) pipeline; "
                    "demux: incremental-vs-batch demuxer parity (the "
                    "serve/aio input path, random feed chunking)")
    args = ap.parse_args()
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "data", "corpus")
    from tools import corpus

    corpus.ensure_corpus(root)
    def _hang(*_):
        raise TimeoutError("variant exceeded the 45s hang guard")

    signal.signal(signal.SIGALRM, _hang)
    rng = np.random.RandomState(0xF0 + args.seed)
    total = ok = err = 0
    t0 = time.perf_counter()
    for fname in args.files.split(","):
        data = open(os.path.join(root, fname), "rb").read()
        for name, var in variants(data, rng, args.per_file):
            t_var = time.perf_counter()
            # preemptive hang guard: SIGALRM interrupts a variant that
            # never returns (a post-hoc elapsed check can't fire then)
            signal.alarm(45)
            try:
                res = (run_one(var) if args.api == "decode"
                       else run_inc_demux(var, rng))
            except Exception as e:  # noqa: BLE001 — the whole point
                print(f"FUZZ FAIL {fname}/{name}: {type(e).__name__}: {e}")
                return 1
            finally:
                signal.alarm(0)
            dt = time.perf_counter() - t_var
            if dt > 30.0:  # slow-variant budget (shorter than the alarm)
                print(f"FUZZ SLOW {fname}/{name}: {dt:.1f}s")
                return 1
            total += 1
            ok += res == "ok"
            err += res == "err"
    dt = time.perf_counter() - t0
    print(f"fuzz_py: {total} variants ({ok} decoded, {err} clean errors) "
          f"in {dt:.0f}s, seed {args.seed} — no taxonomy escapes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Stage breakdown of the e2e batch decode: entropy / H2D / device / D2H.

Run on the real TPU: `python tools/e2e_profile.py --streams 64`.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--secs", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from lewton_tpu import native
    from lewton_tpu.inside_ogg import read_headers
    from lewton_tpu.models.decoder import predict_out_lens
    from lewton_tpu.ogg import PacketReader
    from lewton_tpu.ops.windowing import init_window_carry
    from lewton_tpu.parallel.batch import BatchDecoder, pack_frame_buffers, \
        decode_chunk_batch_packed
    from tools import corpus

    root = "tests/data/corpus"
    corpus.ensure_corpus(root)
    path = f"{root}/stereo_44k_q3.ogg"
    data = open(path, "rb").read()
    subprocess.run(["make", "-C", "lewton_tpu/native", "-s"], check=True)
    assert native.available()

    rdr = PacketReader(data)
    headers, serial = read_headers(rdr)
    pcks = [p.data for p in native.demux(data)][3:]
    pcks = pcks * max(1, int(args.secs / 3))
    S, T = args.streams, args.chunk
    dec = BatchDecoder(headers.ident, headers.setup, chunk=T,
                       raw_headers=(headers.raw_ident, headers.raw_setup))
    cs = dec.cs
    streams = [pcks] * S
    max_t = len(pcks)
    n1 = cs.n1

    # --- warmup (same shapes) ---
    dec.decode_streams_i16(streams)

    stage = {"entropy": 0.0, "predict": 0.0, "h2d": 0.0, "device": 0.0,
             "d2h": 0.0, "host_post": 0.0}
    h2d_bytes = d2h_bytes = 0
    caps = []
    carry = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (S,) + x.shape),
        init_window_carry(cs.channels, cs.n1 // 2))
    started = np.zeros(S, bool)
    t_all = time.perf_counter()
    chunks = []
    for t0 in range(0, max_t, T):
        t = time.perf_counter()
        fr_np = dec._sd.entropy_chunk_batch(
            [pks[t0:t0 + T] for pks in streams])
        stage["entropy"] += time.perf_counter() - t

        t = time.perf_counter()
        lens, started = predict_out_lens(cs, fr_np, started)
        totals = lens.sum(axis=-1)
        cap = int(-(-(int(totals.max()) + n1) // 8192) * 8192)
        caps.append(cap)
        stage["predict"] += time.perf_counter() - t

        t = time.perf_counter()
        residue, bb, ib, fb, shapes = pack_frame_buffers(fr_np)
        dr = jax.device_put(residue)
        db = jax.device_put(bb)
        di = jax.device_put(ib)
        df = jax.device_put(fb)
        jax.block_until_ready((dr, db, di, df))
        stage["h2d"] += time.perf_counter() - t
        h2d_bytes += residue.nbytes + bb.nbytes + ib.nbytes + fb.nbytes

        t = time.perf_counter()
        (pcm, total, _), carry = decode_chunk_batch_packed(
            cs, dr, db, di, df, shapes, carry, cap)
        jax.block_until_ready(pcm)
        stage["device"] += time.perf_counter() - t

        t = time.perf_counter()
        pcm_h = np.asarray(pcm)
        stage["d2h"] += time.perf_counter() - t
        d2h_bytes += pcm_h.nbytes
        chunks.append((pcm_h, totals))

    t = time.perf_counter()
    outs = [[] for _ in range(S)]
    for pcm_h, totals in chunks:
        for s in range(S):
            outs[s].append(pcm_h[s, :totals[s]])
    res = [np.concatenate(o, axis=0) for o in outs]
    stage["host_post"] += time.perf_counter() - t
    wall = time.perf_counter() - t_all

    total = sum(o.shape[0] for o in res)
    audio_s = total / headers.ident.sample_rate
    print(f"streams={S} chunk={T} packets/stream={max_t} "
          f"chunks={-(-max_t // T)}")
    print(f"caps: {sorted(set(caps))}")
    print(f"audio {audio_s:.1f}s wall {wall:.2f}s -> {audio_s/wall:.1f}x rt")
    for k, v in stage.items():
        print(f"  {k:10s} {v:8.3f}s  ({100*v/wall:4.1f}%)")
    print(f"  h2d {h2d_bytes/1e6:.1f} MB ({h2d_bytes/1e6/stage['h2d']:.0f} MB/s)"
          f"  d2h {d2h_bytes/1e6:.1f} MB ({d2h_bytes/1e6/stage['d2h']:.0f} MB/s)")


if __name__ == "__main__":
    main()

"""On-chip synthesis chunk-time bisection by stage knockout.

Each variant monkeypatches one pipeline stage to a near-free stand-in and
re-times the jitted chunk; the delta vs the full pipeline attributes the
chunk time. Micro-benchmarks through the tunnel are unreliable — this
uses the same multi-iteration carry-chained wall clock as bench.py.

Run on the real TPU: `python tools/bisect_synth.py [--streams 256]`.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from lewton_tpu.models import decoder as dec
    from lewton_tpu.ops import coupling as coup_mod
    from lewton_tpu.ops import floor_curve as fc
    from lewton_tpu.ops import imdct as imdct_mod
    from lewton_tpu.ops import windowing as win
    from lewton_tpu.ops.windowing import init_window_carry
    from lewton_tpu.testing import synthetic_frames, synthetic_headers

    S, T = args.streams, args.chunk
    ident, setup = synthetic_headers(channels=2, bs0_exp=8, bs1_exp=11)
    cs = dec.compile_setup(ident, setup)
    fr = {k: jax.device_put(jnp.asarray(v))
          for k, v in synthetic_frames(cs, T=T, S=S, seed=3).items()}
    carry0 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (S,) + x.shape),
        init_window_carry(cs.channels, cs.n1 // 2),
    )

    ORIG = {
        "render": fc.floor1_render,
        "brackets": fc.floor1_brackets_mxu,
        "coup": coup_mod.inverse_coupling_static,
        "imdct": imdct_mod.imdct_batch,
        "overlap": win.overlap_add_batch,
    }

    def no_render(br):
        return br[0] * jnp.float32(1e-6) + jnp.float32(1.0)

    def no_brackets(xs, ys, flags, mult, mode, step, width):
        T_, C_ = xs.shape[0], xs.shape[1]
        z = jnp.zeros((T_, C_, width), jnp.float32)
        return z, z + 1.0, z + 2.0, z + 3.0

    def no_coup(res, steps):
        return res

    def no_imdct(spectra, bf, m0, m1):
        n1 = m1.shape[1]
        return jnp.broadcast_to(
            spectra.sum(axis=2, keepdims=True) * jnp.float32(1e-6),
            spectra.shape[:2] + (n1,),
        )

    def no_overlap(audio, bf, pf, nf, valid, s0, s1, n0, n1, carry):
        T_, C_, _ = audio.shape
        outw = 3 * n1 // 4
        out = audio[:, :, :outw]
        out_len = jnp.where(valid, n0 // 2, 0).astype(jnp.int32)
        return (out, out_len), carry

    def timed(name):
        # fresh jit cache per variant
        fn = jax.jit(
            lambda cs_, fr_, carry_: jax.vmap(
                lambda f, c: dec.decode_frames_core(cs_, f, c, with_i16=True)
            )(fr_, carry_),
        )
        (out, out_len), c2 = fn(cs, fr, carry0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        c = carry0
        for _ in range(args.iters):
            (out, out_len), c = fn(cs, fr, c)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:12s} {dt * 1e3:8.2f} ms/chunk")
        return dt

    full = timed("full")
    for name, repl in [
        ("render", no_render),
        ("brackets", no_brackets),
        ("coup", no_coup),
        ("imdct", no_imdct),
        ("overlap", no_overlap),
    ]:
        tgt = {"render": (fc, "floor1_render"),
               "brackets": (fc, "floor1_brackets_mxu"),
               "coup": (coup_mod, "inverse_coupling_static"),
               "imdct": (imdct_mod, "imdct_batch"),
               "overlap": (win, "overlap_add_batch")}[name]
        mod, attr = tgt
        setattr(mod, attr, repl)
        # decoder.py imported names directly in some cases — repatch there
        for alias in ("floor1_render", "floor1_brackets_mxu",
                      "inverse_coupling_static", "imdct_batch",
                      "overlap_add_batch"):
            if hasattr(dec, alias) and alias == attr:
                setattr(dec, alias, repl)
        dt = timed(f"-{name}")
        print(f"{'':12s} -> {name} contributes ~{(full - dt) * 1e3:6.2f} ms")
        setattr(mod, attr, ORIG[name])
        for alias in (attr,):
            if hasattr(dec, alias):
                setattr(dec, alias, ORIG[name])


if __name__ == "__main__":
    main()

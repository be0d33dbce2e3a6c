"""On-chip synthesis chunk-time bisection by stage knockout.

Each variant monkeypatches one pipeline stage to a near-free stand-in,
CLEARS THE JIT CACHES (decode_chunk_batch is a module-level @jax.jit: a
monkeypatch without jax.clear_caches() silently re-times the original
compilation — round 3 burned an evening on exactly that), re-traces, and
re-times the chunk; the delta vs the full pipeline attributes the time.
Targets the i16 kernel fast path (floor kernel -> ctk GEMM -> overlap
kernel) that bench.py measures.

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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dct4-split", action="store_true")
    args = ap.parse_args()

    from lewton_tpu.models import decoder as dec
    from lewton_tpu.models.decoder import compile_setup
    from lewton_tpu.ops import floor_curve as fc
    from lewton_tpu.ops import floor_kernel as fk
    from lewton_tpu.ops import imdct as imdct_mod
    from lewton_tpu.parallel import batch as pb
    from lewton_tpu.ops.windowing import init_window_carry
    from lewton_tpu.testing import synthetic_frames, synthetic_headers

    if args.dct4_split:
        imdct_mod.USE_DCT4_SPLIT = True

    S, T = args.streams, args.chunk
    ident, setup = synthetic_headers(channels=2, bs0_exp=8, bs1_exp=11)
    cs = compile_setup(ident, setup)
    fr = {k: jax.device_put(jnp.asarray(v))
          for k, v in synthetic_frames(cs, T=T, S=S, seed=3).items()}
    carry0 = jax.tree.map(lambda x: jnp.broadcast_to(x, (S,) + x.shape),
                          init_window_carry(cs.channels, cs.n1 // 2))

    def timed(label):
        jax.clear_caches()  # REQUIRED: pick up the monkeypatches
        (o, _), c = pb.decode_chunk_batch(cs, fr, carry0, with_i16=True)
        jax.block_until_ready(o)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            c = carry0
            for _ in range(args.iters):
                (o, _), c = pb.decode_chunk_batch(cs, fr, c, with_i16=True)
            jax.block_until_ready(o)
            best = min(best, (time.perf_counter() - t0) / args.iters * 1e3)
        print(f"{label:26s} {best:7.3f} ms/chunk", flush=True)
        return best

    full = timed("full")

    # K1: IMDCT GEMM -> K=8 contraction (same output shape)
    orig_dct4 = dec.dct4_batch_parts_ct
    orig_uv = imdct_mod.dct4_split_uv_from_cd

    def cheap_dct4(spec, mx0, mx1):
        return orig_dct4(spec[:, :, :8], mx0[:8], mx1[:8])

    def cheap_uv(cd, n):
        from lewton_tpu.tables import dct4_split_tables
        t2, s2, _, _ = (jnp.asarray(a) for a in dct4_split_tables(n))
        u = imdct_mod.imdct_einsum("ctk,kj->ctj", cd[..., :8], t2[:8])
        v = imdct_mod.imdct_einsum("ctk,kj->ctj", cd[..., :8], s2[:8])
        return u, v

    dec.dct4_batch_parts_ct = cheap_dct4
    imdct_mod.dct4_split_uv_from_cd = cheap_uv
    t = timed("-imdct_gemm(K=8)")
    dec.dct4_batch_parts_ct = orig_dct4
    imdct_mod.dct4_split_uv_from_cd = orig_uv
    print(f"  -> imdct gemm ~{full - t:6.3f} ms", flush=True)

    # K2: floor kernel -> near-free passthrough
    orig_fsp = fk.floor_spectra_pallas

    def cheap_fsp(tele, residue, scal, step, coupling, C, W, M,
                  ct_out=False, cd_n=0, interpret=False):
        Tn = residue.shape[0]
        r = residue.reshape(Tn, C, W).astype(jnp.float32)
        out = jnp.transpose(r, (1, 0, 2)) if (ct_out or cd_n) else r
        if cd_n and cd_n != W:
            out = jnp.pad(out, [(0, 0), (0, 0), (0, cd_n - W)])
        return out

    fk.floor_spectra_pallas = cheap_fsp
    t = timed("-floor_kernel")
    fk.floor_spectra_pallas = orig_fsp
    print(f"  -> floor kernel ~{full - t:6.3f} ms", flush=True)

    # K3: overlap kernel -> cheap slice+cast
    orig_ov = dec.overlap_add_i16_kernel_batch

    def cheap_ov(audio, bf, pf, nf, valid, s0, s1, n0, n1, carry,
                 ct_in=False, x_rep=False, x_split=False, interpret=False):
        la = audio
        while isinstance(la, tuple):
            la = la[0]
        C, Tn = la.shape[0], la.shape[1]
        outw = 3 * n1 // 4
        dep = (la.sum() * jnp.float32(0.0) + 1.0).astype(jnp.int16)
        out = jnp.broadcast_to(dep, (Tn, C * outw))
        out_len = jnp.full((Tn,), n1 // 2, jnp.int32)
        return (out, out_len), carry

    dec.overlap_add_i16_kernel_batch = cheap_ov
    t = timed("-overlap_kernel")
    dec.overlap_add_i16_kernel_batch = orig_ov
    print(f"  -> overlap kernel ~{full - t:6.3f} ms", flush=True)

    # K4: telescopes -> cheap (floor-kernel input prep)
    orig_tel = fc.floor1_telescopes

    def cheap_tel(xs, ys, flags, mult):
        Tn, C, P = xs.shape
        z = (ys[:, :, :1] * 0).astype(jnp.float32)
        zz = jnp.broadcast_to(z, (Tn, C, P + 1))
        return zz, zz, zz + 1.0, zz

    fc.floor1_telescopes = cheap_tel
    dec.floor1_telescopes = cheap_tel
    t = timed("-telescopes")
    fc.floor1_telescopes = orig_tel
    dec.floor1_telescopes = orig_tel
    print(f"  -> telescopes ~{full - t:6.3f} ms", flush=True)

    # K5: everything -> dispatch/transport floor
    orig_core = dec.decode_frames_core
    orig_pb_core = pb.decode_frames_core

    def trivial_core(cs_, fr_, carry, with_i16=False, imdct=None,
                     compact_cap=None, with_taps=False):
        Tn = fr_["mode"].shape[0]
        outw = 3 * cs_.n1 // 4
        dep = (fr_["residue"].reshape(-1)[0]
               + fr_["f1_ys"].reshape(-1)[0]).astype(jnp.int16)
        out = jnp.broadcast_to(dep, (Tn, cs_.channels * outw))
        out_len = jnp.full((Tn,), cs_.n1 // 2, jnp.int32)
        return (out, out_len), carry

    dec.decode_frames_core = trivial_core
    pb.decode_frames_core = trivial_core
    t = timed("trivial_core")
    dec.decode_frames_core = orig_core
    pb.decode_frames_core = orig_pb_core
    print(f"  -> dispatch+alloc floor ~{t:6.3f} ms; "
          f"attributed stages + floor should ~= full", flush=True)


if __name__ == "__main__":
    main()

"""Benchmark: aggregate x-realtime Vorbis synthesis throughput per chip.

Measures the steady-state batched device pipeline (floor curves, inverse
coupling, floor x residue, MXU IMDCT, overlap-add scan, i16 conversion) on
the flagship configuration: stereo 44.1 kHz, blocksizes 256/2048 — the
shape libvorbisenc emits at q3, and the one the reference's bench corpus
(dev/cmp bwv_* files) uses.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "x_realtime", "vs_baseline": N}
vs_baseline is value / 10,000 — the BASELINE.json north star of >=10,000x
aggregate realtime per chip. (The reference's own harness publishes only
ratios vs libvorbis, see BASELINE.md.)

The host entropy front-end is excluded here (it is bit-serial CPU work,
pipelined in production; see lewton_tpu/native for the C++ front-end).
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument(
        "--e2e", action="store_true",
        help="end-to-end: Ogg demux + native entropy + device synthesis "
        "on a real corpus file, batch of --streams copies",
    )
    ap.add_argument(
        "--check", action="store_true",
        help="run corpus conformance on the CURRENT platform (use on real "
        "TPU: CPU tests cannot catch TPU-only numerics like bf16 matmuls)",
    )
    ap.add_argument("--imdct-precision", default=None,
                    choices=["default", "high3", "high", "highest"])
    ap.add_argument(
        "--scan", type=int, default=None, metavar="N",
        help="decode N chunks per device dispatch via lax.scan "
        "(parallel/batch.decode_chunks_scan) — amortizes dispatch latency. "
        "Default: auto — 16 for synthesis (r4 sweeps: {0: 37.8k, 2: "
        "37.7k, 4: 39.5k, 8: 40.1k}x pre-REV_MXU; {8: 47.7k, 16: 48.2k}x "
        "after), 8 for e2e (66.8 vs 45.8x at scan 1 on the clean rep), "
        "1 for serve (its short per-step backlogs make cap-padded "
        "scan D2H a net loss: 70x -> 62x measured). 0 = single-chunk",
    )
    ap.add_argument(
        "--dct4-split", action="store_true",
        help="route the long IMDCT through the Wang split (half the GEMM "
        "FLOPs; ops/imdct.USE_DCT4_SPLIT) — A/B this on the real chip "
        "and gate any default flip on --check",
    )
    ap.add_argument(
        "--rev", default=None, choices=["pre", "mxu", "roll"],
        help="x_rep lane-reversal scheme in the overlap kernel: 'pre' = "
        "XLA flip(X) fed as extra operands (one HBM pass), 'mxu' = "
        "in-kernel anti-identity permutation dot (u8-limb exact), "
        "'roll' = in-kernel VPU XOR-exchange network. Default: module "
        "knobs in ops/overlap_kernel.py",
    )
    ap.add_argument(
        "--serve", action="store_true",
        help="StreamingScheduler throughput: --streams live streams fed "
        "incrementally, aggregate x-realtime polled to completion",
    )
    ap.add_argument(
        "--transport", default="auto", choices=["auto", "i16", "p12"],
        help="--e2e residue H2D encoding: exact i16 frames, or the "
        "lossless 12-bit pack (parallel/pack12.py; 25%% fewer bytes "
        "when the setup's static bound < 2048). auto = p12 on real "
        "devices, i16 on CPU",
    )
    ap.add_argument(
        "--compact", default="device", choices=["device", "host"],
        help="--e2e output compaction: on-device scan (min D2H bytes; "
        "best through the slow tunnel) or host slicing of the padded "
        "i16 kernel output (no compaction scan; best on real PCIe)",
    )
    ap.add_argument(
        "--frontend", action="store_true",
        help="host entropy front-end in isolation: packets/s through the "
        "native lt_decode_chunk batch path (no device, no transfers)",
    )
    args = ap.parse_args()
    if args.scan is None:  # auto per surface (see --scan help)
        args.scan = 1 if args.serve else (8 if args.e2e else 16)
    if args.frontend:
        # host-only surface: never touch the device (StreamDecoder's setup
        # tables would otherwise dial the TPU tunnel just to be discarded)
        import jax

        jax.config.update("jax_platforms", "cpu")
        bench_frontend(args)
        return
    if args.imdct_precision or args.dct4_split:
        import lewton_tpu.ops.imdct as _im

        if args.imdct_precision:
            _im.PRECISION = args.imdct_precision
        if args.dct4_split:
            _im.USE_DCT4_SPLIT = True
    if args.rev:
        import lewton_tpu.ops.overlap_kernel as _ok

        _ok.REV_MXU = args.rev == "mxu"
        _ok.PRE_REV = args.rev == "pre"
    if args.check:
        check_conformance(args)
        return
    if args.e2e:
        bench_e2e(args)
        return
    if args.serve:
        bench_serve(args)
        return

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lewton_tpu.models.decoder import compile_setup
    from lewton_tpu.ops.windowing import init_window_carry
    from lewton_tpu.parallel.batch import (decode_chunk_batch,
                                           decode_chunks_scan)
    from lewton_tpu.testing import synthetic_frames, synthetic_headers

    S, T = args.streams, args.chunk
    ident, setup = synthetic_headers(channels=2, bs0_exp=8, bs1_exp=11)
    cs = compile_setup(ident, setup)
    fr = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in synthetic_frames(cs, T=T, S=S, seed=3).items()
    }
    carry = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (S,) + x.shape),
        init_window_carry(cs.channels, cs.n1 // 2),
    )

    if args.scan:
        # N chunks per dispatch: the same frames stacked (steady-state
        # synthesis; production stacks N distinct chunks the same way)
        frs = {k: jnp.broadcast_to(v, (args.scan,) + v.shape)
               for k, v in fr.items()}
        (outs, out_lens), carry2 = decode_chunks_scan(
            cs, frs, carry, with_i16=True)
        jax.block_until_ready(outs)
        samples_per_call = int(np.asarray(out_lens).sum())
        t0 = time.perf_counter()
        c = carry
        for _ in range(args.iters):
            (outs, out_lens), c = decode_chunks_scan(
                cs, frs, c, with_i16=True)
        jax.block_until_ready(outs)
        dt = time.perf_counter() - t0
        audio_seconds = samples_per_call * args.iters / ident.sample_rate
        packets = S * T * args.scan * args.iters
        result = {
            "metric": "aggregate_realtime_synthesis_44k1_stereo",
            "value": round(audio_seconds / dt, 1),
            "unit": "x_realtime_per_chip",
            "vs_baseline": round(audio_seconds / dt / 10000.0, 3),
            "detail": {"streams": S, "chunk": T, "scan": args.scan,
                       "iters": args.iters,
                       "packets_per_s": round(packets / dt, 1)},
        }
        print(json.dumps(result))
        return

    # warmup / compile
    (out_i16, out_len), carry2 = decode_chunk_batch(
        cs, fr, carry, with_i16=True
    )
    jax.block_until_ready(out_i16)
    samples_per_call = int(np.asarray(out_len).sum())  # per-channel samples

    t0 = time.perf_counter()
    c = carry
    for _ in range(args.iters):
        (out_i16, out_len), c = decode_chunk_batch(
            cs, fr, c, with_i16=True
        )
    jax.block_until_ready(out_i16)
    dt = time.perf_counter() - t0

    audio_seconds = samples_per_call * args.iters / ident.sample_rate
    x_realtime = audio_seconds / dt
    packets = S * T * args.iters
    result = {
        "metric": "aggregate_realtime_synthesis_44k1_stereo",
        "value": round(x_realtime, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(x_realtime / 10000.0, 3),
        "detail": {
            "streams": S,
            "chunk_packets": T,
            "iters": args.iters,
            "wall_s": round(dt, 4),
            "audio_s": round(audio_seconds, 2),
            "packets_per_s": round(packets / dt, 1),
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


def probe_link(mb: int = 32, reps: int = 3) -> tuple[float, float]:
    """Measured host<->device link rates (h2d_mb_s, d2h_mb_s): median of
    `reps` one-way transfers of an `mb`-MiB buffer. The tunnel link here
    is bursty (16-1700 MB/s minute to minute), so transfer-bound surfaces
    record the rate seen AT measurement time — without it, a reader of
    the artifact cannot tell a pipeline regression from a degraded link
    (VERDICT r4 weak #2)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    buf = np.zeros((mb << 20) // 4, np.float32)
    d = jax.device_put(buf)
    jax.block_until_ready(d)
    np.asarray(d)  # warm both directions
    h2d, d2h = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        d = jax.device_put(buf)
        jax.block_until_ready(d)
        h2d.append(buf.nbytes / (time.perf_counter() - t0))
        t0 = time.perf_counter()
        np.asarray(d)
        d2h.append(buf.nbytes / (time.perf_counter() - t0))
    return (float(np.median(h2d)) / 1e6, float(np.median(d2h)) / 1e6)


def _link_detail(h2d_bytes: int, d2h_bytes: int, audio_s: float,
                 wall_s: float, probe: tuple[float, float]) -> dict:
    """Self-normalizing transfer fields for e2e/serve artifacts: byte
    counts, achieved aggregate MB/s, and the link-implied ceiling at the
    probed rates (PERF.md r4 formula, computed per run)."""
    h2d_mb_s, d2h_mb_s = probe
    link_s = (h2d_bytes / (h2d_mb_s * 1e6) if h2d_mb_s else 0.0) + (
        d2h_bytes / (d2h_mb_s * 1e6) if d2h_mb_s else 0.0)
    return {
        "h2d_bytes": int(h2d_bytes),
        "d2h_bytes": int(d2h_bytes),
        "achieved_link_mb_s": round((h2d_bytes + d2h_bytes) / wall_s / 1e6,
                                    1),
        "probe_h2d_mb_s": round(h2d_mb_s, 1),
        "probe_d2h_mb_s": round(d2h_mb_s, 1),
        "link_implied_ceiling_x": round(audio_s / link_s, 1) if link_s
        else None,
    }


def check_conformance(args) -> None:
    """Decode the corpus with the jax backend on the current platform and
    report per-file max deviation vs the libvorbis goldens."""
    import json as _json

    import jax
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from lewton_tpu.inside_ogg import OggStreamReader
    from tools import corpus

    root = "tests/data/corpus"
    corpus.ensure_corpus(root)
    names = [
        "mono_8k_q-1", "stereo_44k_q3", "stereo_44k_q10", "stereo_48k_q5",
        "ch6_44k_q3", "ch4_32k_q2", "stereo_44k_managed", "tiny_44k",
        "silence_44k", "impulses_44k", "chained_44k", "ch8_44k_q4",
        "mono_11k_q0", "stereo_22k_q0", "long_44k_q2",
        "stereo_96k_q6", "mono_16k_q3",
    ]
    worst, bad = 0, 0
    for name in names:
        out = OggStreamReader(f"{root}/{name}.ogg", backend="jax").read_all_i16()
        g = np.load(f"{root}/{name}.golden.npy")
        d = np.abs(out.astype(np.int32) - g.astype(np.int32))
        worst = max(worst, int(d.max()))
        bad += int((d > 2).sum())
        print(f"  {name}: maxdiff {int(d.max())}, >2: {int((d > 2).sum())}")
    # crafted adversarial streams (tools/craft.py): escape posts, extreme
    # codebooks, blocksize extremes, submap mux — these drive the device
    # floor/overlap kernels at their integer-range corners, which CPU
    # interpret-mode tests cannot see
    from tools import vorbisref as vr
    from tools.craft import VARIANTS, build_stream
    from tools.floor0_stream import build_stream as build_f0
    import tempfile

    crafted = {name: build_stream(spec)
               for name, spec in sorted(VARIANTS.items())}
    # floor0 corners: strided type-0 writes; floor0 x square-polar
    # coupling; packet-selected booknumber 1; max amplitude + near-
    # singular LSP (loud clipping — the oracle-pinnable edge of the exp
    # saturation corner, VERDICT r3 #4c)
    crafted["f0_restype0"] = build_f0(residue_type=0)
    crafted["f0_coupled_stereo"] = build_f0(channels=2, submaps=1,
                                            residue_type=2, coupling=True)
    crafted["f0_two_books"] = build_f0(n_books=2)
    crafted["f0_max_amp"] = build_f0(max_amp=True)
    crafted_goldens = {}
    for name, data in crafted.items():
        with tempfile.NamedTemporaryFile(suffix=".ogg") as f:
            f.write(data)
            f.flush()
            g = vr.decode_file_i16(f.name)
        crafted_goldens[name] = g
        out = OggStreamReader(data, backend="jax").read_all_i16()
        d = np.abs(out.astype(np.int32) - g.astype(np.int32))
        worst = max(worst, int(d.max()))
        bad += int((d > 2).sum())
        print(f"  crafted/{name}: maxdiff {int(d.max())}, "
              f">2: {int((d > 2).sum())}")

    # ---- shipped production permutations (VERDICT r4 weak #3: gate what
    # you ship). The single-stream loop above never exercises the TPU
    # defaults of the e2e/serve surfaces: scan-N lax.scan dispatch, the
    # p12 residue transport, host-side compaction of the padded kernel
    # output, and the serve scheduler itself. Decode a corpus subset plus
    # one adversarial crafted stream through each shipped permutation and
    # hold them to the same +/-2 LSB contract. ----
    import subprocess

    from lewton_tpu import native as _nat
    from lewton_tpu.inside_ogg import read_headers
    from lewton_tpu.ogg import PacketReader
    from lewton_tpu.parallel.batch import BatchDecoder
    from lewton_tpu.parallel.pack12 import pack12_supported

    subprocess.run(["make", "-C", "lewton_tpu/native", "-s"], check=True)
    perm_results = {}
    # f1_bs8192 is the adversarial stream that exposed the 3-pass IMDCT
    # precision failure (r3) — route it through the batch/scan plumbing;
    # the corpus files cover stereo + multichannel
    perm_cases = [("stereo_44k_q3", None), ("ch6_44k_q3", None)]
    if "f1_bs8192" in crafted:
        perm_cases.append(("crafted/f1_bs8192", crafted["f1_bs8192"]))
    perm_configs = [
        ("scan8_p12_device", 8, "p12", "device"),   # e2e TPU defaults
        ("scan16_p12_device", 16, "p12", "device"),  # headline scan depth
        ("scan16_i16_host", 16, "i16", "host"),      # host compaction
    ]
    for cfg_name, scan, transport, compact in perm_configs:
        cworst, cbad = 0, 0
        for name, data in perm_cases:
            if data is None:
                data = open(f"{root}/{name}.ogg", "rb").read()
                g = np.load(f"{root}/{name}.golden.npy")
            else:
                g = crafted_goldens[name.split("/", 1)[1]]
            rdr = PacketReader(data)
            headers, _ = read_headers(rdr)
            spans, _, _, _, _ = _nat.demux_spans(data)
            pcks = _nat.PacketSpans(spans.data, spans.offs[3:],
                                    spans.lens[3:])
            dec = BatchDecoder(
                headers.ident, headers.setup, chunk=64,
                raw_headers=(headers.raw_ident, headers.raw_setup),
                scan=scan)
            if transport == "p12" and name == "stereo_44k_q3":
                # the flagship setup must actually exercise the p12 path
                # (a silent fall-through to i16 would gate nothing)
                assert pack12_supported(dec.cs), "flagship p12 gate"
            outs = dec.decode_streams_i16([pcks, pcks], compact=compact,
                                          transport=transport)
            assert np.array_equal(outs[0], outs[1]), name
            out = outs[0]
            # batch decode is granule-blind: compare against the golden's
            # (absgp-truncated) prefix; the untruncated tail is < 1 block
            assert 0 <= out.shape[0] - g.shape[0] <= dec.cs.n1, (
                out.shape, g.shape)
            d = np.abs(out[: g.shape[0]].astype(np.int32)
                       - g.astype(np.int32))
            cworst = max(cworst, int(d.max()))
            cbad += int((d > 2).sum())
            print(f"  perm/{cfg_name}/{name}: maxdiff {int(d.max())}, "
                  f">2: {int((d > 2).sum())}")
        perm_results[cfg_name] = {"maxdiff": cworst,
                                  "samples_over_2lsb": cbad}
        worst = max(worst, cworst)
        bad += cbad

    # ---- XLA fallback paths ON CHIP: every gate stream above fits the
    # Pallas kernels' support gates, so the non-kernel device forms
    # (bracket GEMM + Bresenham render in XLA, full-width IMDCT,
    # XLA overlap-add + i16) — the paths unusual geometries fall back
    # to (n1 < 512, C > 16, narrow w_eff) — were only ever CPU-diffed.
    # Force the gates off (the decoder imports them at call time, so a
    # module monkeypatch + cache clear re-routes) and re-diff. ----
    import lewton_tpu.ops.floor_kernel as _fkm
    import lewton_tpu.ops.overlap_kernel as _okm

    fworst, fbad = 0, 0
    orig_fs = _fkm.pallas_floor_supported
    orig_os = _okm.pallas_overlap_supported
    try:
        _fkm.pallas_floor_supported = lambda *a, **k: False
        _okm.pallas_overlap_supported = lambda *a, **k: False
        jax.clear_caches()
        for name, data in perm_cases[:2]:
            if data is None:
                data = open(f"{root}/{name}.ogg", "rb").read()
                g = np.load(f"{root}/{name}.golden.npy")
            else:
                g = crafted_goldens[name.split("/", 1)[1]]
            out = OggStreamReader(data, backend="jax").read_all_i16()
            assert out.shape == g.shape, (name, out.shape, g.shape)
            d = np.abs(out.astype(np.int32) - g.astype(np.int32))
            fworst = max(fworst, int(d.max()))
            fbad += int((d > 2).sum())
            print(f"  perm/xla_fallback/{name}: maxdiff {int(d.max())}, "
                  f">2: {int((d > 2).sum())}")
    finally:
        _fkm.pallas_floor_supported = orig_fs
        _okm.pallas_overlap_supported = orig_os
        jax.clear_caches()
    perm_results["xla_fallback"] = {"maxdiff": fworst,
                                    "samples_over_2lsb": fbad}
    worst = max(worst, fworst)
    bad += fbad

    # serve scheduler pass (shipped adaptive-scan scheduler; scan=8 also
    # covers the lax.scan dispatch inside serve). Serve applies absgp
    # truncation itself, so shapes match the goldens exactly.
    from lewton_tpu.serve import StreamingScheduler

    sched = StreamingScheduler(capacity=4, chunk=64, scan=8)
    sworst, sbad = 0, 0
    for name, data in perm_cases:
        if data is None:
            data = open(f"{root}/{name}.ogg", "rb").read()
            g = np.load(f"{root}/{name}.golden.npy")
        else:
            g = crafted_goldens[name.split("/", 1)[1]]
        sched.add_stream(name, data)
    while sched.step():
        pass
    for name, data in perm_cases:
        g = (np.load(f"{root}/{name}.golden.npy") if data is None
             else crafted_goldens[name.split("/", 1)[1]])
        out = sched.poll(name)
        assert out.shape == g.shape, (name, out.shape, g.shape)
        d = np.abs(out.astype(np.int32) - g.astype(np.int32))
        sworst = max(sworst, int(d.max()))
        sbad += int((d > 2).sum())
        print(f"  perm/serve_scan8/{name}: maxdiff {int(d.max())}, "
              f">2: {int((d > 2).sum())}")
    perm_results["serve_scan8"] = {"maxdiff": sworst,
                                   "samples_over_2lsb": sbad}
    worst = max(worst, sworst)
    bad += sbad

    print(_json.dumps({
        "metric": "conformance_max_lsb_diff",
        "value": worst,
        "unit": "i16_lsb",
        "vs_baseline": 1.0 if bad == 0 and worst <= 2 else 0.0,
        "detail": {"platform": jax.devices()[0].platform,
                   "samples_over_2lsb": bad,
                   "production_permutations": perm_results},
    }))


def bench_serve(args) -> None:
    """Serving throughput: N concurrent streams through the scheduler."""
    import subprocess
    import time

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from lewton_tpu.serve import StreamingScheduler
    from tools import corpus

    root = "tests/data/corpus"
    corpus.ensure_corpus(root)
    subprocess.run(["make", "-C", "lewton_tpu/native", "-s"], check=True)
    files = ["stereo_44k_q3.ogg", "stereo_48k_q5.ogg", "mono_16k_q3.ogg"]
    datas = [open(f"{root}/{f}", "rb").read() for f in files]
    S = args.streams
    sched = StreamingScheduler(capacity=max(8, S // len(files) + 1), chunk=64,
                               scan=max(1, args.scan))
    # warmup: one stream per distinct setup compiles each group's program
    for i, d in enumerate(datas):
        sched.add_stream(("warm", i), d)
    while sched.step():
        pass

    probe = probe_link()
    sched.transfer_stats(reset=True)
    total_samples = 0
    rates = {}
    t0 = time.perf_counter()
    for i in range(S):
        sched.add_stream(i, datas[i % len(datas)])
    while sched.step():
        pass
    for i in range(S):
        pcm = sched.poll(i)
        grp, _ = sched.streams[i]
        rates[i] = grp.cs.sample_rate
        total_samples += pcm.shape[0] / grp.cs.sample_rate
        sched.remove_stream(i)
    dt = time.perf_counter() - t0
    stats = sched.transfer_stats()
    lat = sched.latency_stats()
    detail = {"streams": S, "setups": len(files),
              "wall_s": round(dt, 3),
              "audio_s": round(total_samples, 1),
              "platform": jax.devices()[0].platform,
              # SLO surface: p50/p95/p99 registration->first-PCM and
              # turnaround (includes pipeline-depth + transfer delay)
              "latency": lat}
    detail.update(_link_detail(stats["h2d_bytes"], stats["d2h_bytes"],
                               total_samples, dt, probe))
    print(json.dumps({
        "metric": "serve_realtime_mixed_setups",
        "value": round(total_samples / dt, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(total_samples / dt / 10000.0, 3),
        "detail": detail,
    }))


def bench_frontend(args) -> None:
    """Host entropy front-end in isolation (VERDICT r1 #2: the structural
    long pole must be measured, not assumed): packets/s for the native
    batch path, single- and multi-thread, production-shaped chunks."""
    import os as _os
    import subprocess
    import time

    import numpy as np

    from lewton_tpu import native
    from lewton_tpu.inside_ogg import read_headers
    from lewton_tpu.models.decoder import StreamDecoder
    from lewton_tpu.ogg import PacketReader
    from tools import corpus

    root = "tests/data/corpus"
    corpus.ensure_corpus(root)
    subprocess.run(["make", "-C", "lewton_tpu/native", "-s"], check=True)
    assert native.available()
    data = open(f"{root}/stereo_44k_q3.ogg", "rb").read()
    rdr = PacketReader(data)
    headers, _ = read_headers(rdr)
    spans, _, _, _, _ = native.demux_spans(data)
    audio = spans[3:]  # drop the 3 header packets (zero-copy views)
    sd = StreamDecoder(headers.ident, headers.setup, chunk=64,
                       raw_headers=(headers.raw_ident, headers.raw_setup))
    S = 32
    streams = [audio[:64]] * S
    out = sd.entropy_chunk_batch(streams)  # warm + allocate
    rates = {}
    cores = _os.cpu_count() or 1
    # thread-scaling artifact (VERDICT r3 #7): measure 1..cores, plus an
    # oversubscribed 2-thread point on a 1-core host so the scaling row
    # is measured rather than asserted (it shows pure switching overhead
    # there — the native std::thread pool is inert without real cores)
    thread_points = sorted({1, 2, max(1, cores // 2), cores})
    for threads in thread_points:
        n = 0
        t0 = time.perf_counter()
        while (dt := time.perf_counter() - t0) < 3.0:
            sd.entropy_chunk_batch(streams, threads=threads, out=out)
            n += S * 64
        rates[threads] = n / dt
    best = max(rates.values())
    # the shipped TPU transport is p12 on slow links: measure the direct
    # p12-emit rate too (lt_decode_chunk_p12 packs from the hot scratch
    # row; +11.5% vs i16+separate-pack in the controlled cpu-time A/B,
    # tools/ab_p12emit.py)
    p12_rate = None
    from lewton_tpu.parallel.pack12 import pack12_supported

    if pack12_supported(sd.cs):
        sd.set_residue_transport("p12")
        out12 = sd.entropy_chunk_batch(streams)
        n = 0
        t0 = time.perf_counter()
        while (dt := time.perf_counter() - t0) < 3.0:
            sd.entropy_chunk_batch(streams, threads=1, out=out12)
            n += S * 64
        p12_rate = n / dt
        sd.set_residue_transport("default")
    # packets/s -> x-realtime: ~1024 samples/packet at 44.1 kHz
    samples = np.mean([1024])  # q3 long-block dominated
    print(json.dumps({
        "metric": "entropy_frontend_packets_per_s",
        "value": round(best, 1),
        "unit": "packets_per_s",
        "vs_baseline": round(best * samples / 44100.0 / 10000.0, 3),
        "detail": {"per_thread_rates": {str(k): round(v, 1)
                                        for k, v in rates.items()},
                   "p12_emit_packets_per_s": (round(p12_rate, 1)
                                              if p12_rate else None),
                   "cores": cores,
                   "one_core_host": cores == 1,
                   "x_realtime_equiv": round(best * samples / 44100.0, 1),
                   # VERDICT r4 weak #5/#7: the cores-per-chip capacity
                   # story is a PROJECTION from this single-core rate, not
                   # a measurement — carried in the artifact itself so a
                   # reader never mistakes it for measured scaling
                   "scaling_note": (
                       "projection from a 1-vCPU host" if cores == 1 else
                       f"measured on {cores} cores")},
    }))


def bench_e2e(args) -> None:
    """Full pipeline on a real file: bytes -> demux -> entropy (C++) ->
    device synthesis -> PCM, for a batch of identical streams."""
    import subprocess

    import jax
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from lewton_tpu import native
    from lewton_tpu.inside_ogg import read_headers
    from lewton_tpu.ogg import PacketReader
    from lewton_tpu.parallel.batch import BatchDecoder
    from tools import corpus

    root = "tests/data/corpus"
    corpus.ensure_corpus(root)
    path = f"{root}/stereo_44k_q3.ogg"
    with open(path, "rb") as f:
        data = f.read()
    subprocess.run(["make", "-C", "lewton_tpu/native", "-s"], check=True)
    assert native.available()

    rdr = PacketReader(data)
    headers, serial = read_headers(rdr)
    spans, _, _, _, _ = native.demux_spans(data)
    # zero-copy packet views: audio packets as spans into the demux blob
    # (skip the 3 header packets); extend each stream to ~30 s so per-call
    # overheads amortize (packets are self-contained; only the window
    # carry crosses them) — tiling spans re-reads the same blob bytes
    rep = max(1, int(30 / 3))
    pcks = native.PacketSpans(spans.data, np.tile(spans.offs[3:], rep),
                              np.tile(spans.lens[3:], rep))
    S = args.streams
    # T=64 chunks measure best through this environment's device tunnel
    # (bigger chunks inflate the compacted-output cap and D2H bursts)
    dec = BatchDecoder(
        headers.ident, headers.setup, chunk=min(args.chunk, 64),
        raw_headers=(headers.raw_ident, headers.raw_setup),
        scan=max(1, args.scan),
    )
    # warmup/compile with the same batch geometry as the timed run
    dec.decode_streams_i16([pcks] * S, compact=args.compact,
                           transport=args.transport)
    probe = probe_link()

    import time

    t0 = time.perf_counter()
    outs = dec.decode_streams_i16([pcks] * S, compact=args.compact,
                                  transport=args.transport)
    dt = time.perf_counter() - t0
    total = sum(o.shape[0] for o in outs)
    audio_seconds = total / headers.ident.sample_rate
    x_realtime = audio_seconds / dt
    detail = {
        "streams": S, "wall_s": round(dt, 3),
        "audio_s": round(audio_seconds, 2),
        "platform": jax.devices()[0].platform,
    }
    detail.update(_link_detail(dec.last_stats["h2d_bytes"],
                               dec.last_stats["d2h_bytes"],
                               audio_seconds, dt, probe))
    print(json.dumps({
        "metric": "e2e_realtime_decode_44k1_stereo",
        "value": round(x_realtime, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(x_realtime / 10000.0, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()

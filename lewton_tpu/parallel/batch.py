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

from ..models.decoder import (
    CompiledSetup,
    decode_frames_core,
    pack_frames,
)
from ..ops.windowing import init_window_carry

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


@partial(jax.jit, static_argnames=("with_i16",))
def decode_chunk_batch(cs: CompiledSetup, fr: dict, carry, with_i16=False):
    """vmap over the stream axis: fr leaves [S, T, ...], carry leaves [S, ...]."""
    fn = partial(decode_frames_core, with_i16=with_i16)
    return jax.vmap(fn, in_axes=(None, 0, 0))(cs, fr, carry)


def _imdct_tp(spectra, bf, m0, m1, axis: str = "tp", ntp: int = 1):
    """Tensor-parallel IMDCT: contraction axis sharded over `axis`.

    Each shard multiplies its k-slice of the (replicated) matrices, then
    psum over `axis` rebuilds the full block. Exact same math, one
    reduce-scatter-able collective.
    """
    ti = jax.lax.axis_index(axis)
    n0, n1 = m0.shape[1], m1.shape[1]
    w = m1.shape[0]
    wk = w // ntp
    sl = jax.lax.dynamic_slice_in_dim(spectra, ti * wk, wk, axis=2)
    m1k = jax.lax.dynamic_slice_in_dim(m1, ti * wk, wk, axis=0)
    long_out = jnp.einsum(
        "tck,kn->tcn", sl, m1k, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    if n0 != n1:
        w0 = m0.shape[0]
        w0k = max(w0 // ntp, 1)
        # short matrix: shard only while it divides evenly; tail shards idle
        s0 = jax.lax.dynamic_slice_in_dim(
            spectra, jnp.minimum(ti * w0k, w0 - w0k), w0k, axis=2
        )
        m0k = jax.lax.dynamic_slice_in_dim(
            m0, jnp.minimum(ti * w0k, w0 - w0k), w0k, axis=0
        )
        short_out = jnp.einsum(
            "tck,kn->tcn", s0, m0k, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        short_out = jnp.where(ti * w0k <= w0 - w0k, short_out, 0.0)
        short_out = jnp.pad(short_out, [(0, 0), (0, 0), (0, n1 - n0)])
        partial_out = jnp.where((bf == 1)[:, None, None], long_out, short_out)
    else:
        partial_out = long_out
    return jax.lax.psum(partial_out, axis)


_SHARDED_CACHE: dict = {}


def _make_sharded(mesh: Mesh, with_i16: bool):
    ntp = mesh.shape["tp"]
    imdct = partial(_imdct_tp, axis="tp", ntp=ntp) if ntp > 1 else None

    def body(cs_, fr_, carry_):
        kw = {"imdct": imdct} if imdct is not None else {}
        fn = partial(decode_frames_core, with_i16=with_i16, **kw)
        return jax.vmap(fn, in_axes=(None, 0, 0))(cs_, fr_, carry_)

    fn = shard_map(
        body, mesh=mesh,
        # prefix specs: setup tables replicated; frames/carry/outputs sharded
        # on the leading stream axis over dp, replicated over tp
        in_specs=(P(), P("dp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )
    return jax.jit(fn)


def decode_chunk_sharded(mesh: Mesh, cs, fr, carry, with_i16: bool = False):
    """Chunk decode over a (dp, tp) mesh via shard_map.

    fr leaves [S, T, ...] with S divisible by mesh dp size; setup tables are
    replicated. dp is embarrassingly parallel; tp adds the IMDCT psum.
    """
    key = (mesh, with_i16)
    if key not in _SHARDED_CACHE:
        _SHARDED_CACHE[key] = _make_sharded(mesh, with_i16)
    return _SHARDED_CACHE[key](cs, fr, carry)


class BatchDecoder:
    """Decode a batch of independent streams sharing one setup geometry.

    The serving-shaped API: feed each stream's packets, get PCM per stream.
    Streams are padded to a common packet count; per-packet lengths recover
    the ragged output.
    """

    def __init__(self, ident, setup, chunk: int = 64, mesh: Mesh | None = None):
        from ..models.decoder import compile_setup

        self.ident, self.setup = ident, setup
        self.cs = compile_setup(ident, setup)
        self.chunk = chunk
        self.mesh = mesh

    def decode_streams(self, streams: list[list[bytes]]) -> list[np.ndarray]:
        """streams: per stream, its audio packets. Returns planar f32 PCM
        [C, total] per stream."""
        from ..audio import decode_packet_entropy

        S = len(streams)
        plans = [
            [decode_packet_entropy(self.ident, self.setup, p) for p in pks]
            for pks in streams
        ]
        max_t = max(len(p) for p in plans)
        C, W = self.cs.channels, self.cs.n1 // 2
        carry = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (S,) + x.shape),
            init_window_carry(C, W),
        )
        outs: list[list[np.ndarray]] = [[] for _ in range(S)]
        for t0 in range(0, max_t, self.chunk):
            frs = [
                pack_frames(self.cs, pl[t0 : t0 + self.chunk], self.chunk)
                for pl in plans
            ]
            fr = {k: jnp.asarray(np.stack([f[k] for f in frs])) for k in frs[0]}
            if self.mesh is not None:
                (out, out_len), carry = decode_chunk_sharded(
                    self.mesh, self.cs, fr, carry
                )
            else:
                (out, out_len), carry = decode_chunk_batch(self.cs, fr, carry)
            out = np.asarray(out)
            out_len = np.asarray(out_len)
            for s in range(S):
                for t in range(min(self.chunk, len(plans[s]) - t0)):
                    outs[s].append(out[s, t, :, : out_len[s, t]])
        return [
            np.concatenate(o, axis=1) if o else np.zeros((C, 0), np.float32)
            for o in outs
        ]

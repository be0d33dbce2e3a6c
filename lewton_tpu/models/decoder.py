"""The TPU decode model: compiled stream setup + batched device pipeline.

Architecture (SURVEY.md section 7): the host entropy front-end
(`decode_packet_entropy`) turns each audio packet into small dense tensors;
this module stacks them into fixed-shape *frames*, and a single jitted
function runs the whole numeric half for a chunk of T packets:

    floor curves (MXU bracket GEMM + exact f32 Bresenham) -> inverse
    coupling -> floor x residue -> IMDCT (MXU) -> windowing / overlap-add
    (fully parallel over packet time; the carry is a one-packet shift)

Everything data-dependent (mode, blockflag, floor posts, coupling steps) is
turned into gathers over per-setup constant tables, so one compilation
serves the stream's lifetime; chunk shapes are fixed so there is exactly one
compile per (setup-geometry, chunk length).

ref parity: lewton src/audio.rs:919-1173 (read_audio_packet_generic), redesigned
batch-first for TPU rather than translated.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import PacketPlan, decode_packet_entropy
from ..header import Floor0, Floor1, IdentHeader, SetupHeader
from ..ops.coupling import inverse_coupling_batch, inverse_coupling_static
from ..ops.floor_curve import (
    BIG_X,
    floor0_curve_batch,
    floor1_brackets_mxu,
    floor1_render,
    floor1_step_matrix,
    floor1_telescopes,
)

from ..ops.synth_kernel import fused_floor_couple
from ..ops.imdct import (imdct_batch, imdct_batch_parts,
                         imdct_batch_parts_ct, dct4_batch_parts_ct,
                         imdct_einsum)
from ..ops.windowing import (compact_i16, init_window_carry,
                             overlap_add_batch, overlap_add_i16_batch,
                             overlap_add_i16_kernel_batch)
from ..tables import (
    bark_cos_omega,
    imdct_matrix,
    window_slope,
)

__all__ = ["CompiledSetup", "compile_setup", "StreamDecoder", "decode_frames"]

DEFAULT_CHUNK = 64

#: opt-in: route floor1 render + coupling + dot through the hand-written
#: Pallas kernel (ops/synth_kernel.py) instead of XLA-fused ops
USE_FUSED_SYNTH_KERNEL = False


def precompute_brackets(cs: "CompiledSetup", fr: dict) -> dict:
    """Compute floor1 brackets for a whole [S, T] stream batch in ONE GEMM.

    Under vmap the per-stream bracket einsum degenerates into hundreds of
    tiny 64-row batched matmuls (latency-bound on the MXU); merging the
    (stream, packet) axes first keeps it one large contraction. Returns fr
    with an "f1_brackets" entry ([S, T, C, W] x4 tuple) for
    decode_frames_core to pick up.
    """
    if not cs.has_floor1:
        return fr
    S, T = fr["mode"].shape
    W = cs.n1 // 2
    mode = fr["mode"].reshape(S * T)
    ys = fr["f1_ys"].reshape((S * T,) + fr["f1_ys"].shape[2:])
    flg = fr["f1_flags"].reshape((S * T,) + fr["f1_flags"].shape[2:])
    br = floor1_brackets_mxu(
        _by_mode(cs.f1_xs, mode), ys, flg, cs.f1_mult[mode], mode,
        cs.f1_step, W,
    )
    fr = dict(fr)
    fr["f1_brackets"] = tuple(
        b.reshape((S, T) + b.shape[1:]) for b in br
    )
    return fr


@jax.tree_util.register_pytree_node_class
@dataclass
class CompiledSetup:
    """Per-stream constant tables, stacked over (mode, channel) so the device
    pipeline is a pure gather machine. Leaves are device arrays; aux fields
    are python ints (static under jit)."""

    # static geometry
    channels: int
    n0: int
    n1: int
    sample_rate: int
    max_posts: int  # P
    f0_order_max: int  # Omax (0 if no floor0 used)
    has_floor0: bool
    has_floor1: bool
    #: effective spectral width: residues are zero past the setup's residue
    #: `end` (per channel; crossing vectors clip at the partition boundary
    #: per the libvorbis oracle — see residue.py), so floors/coupling/IMDCT
    #: run at w_eff <= n1/2 (padded to a lane multiple). Typical q3
    #: stereo: 896 of 1024.
    w_eff: int
    #: coupling steps as a static tuple when identical across all modes
    #: (the common one-mapping case) — enables static-index coupling
    static_coupling: tuple | None
    #: residues provably lie on the integer lattice within i16 range
    #: (see residue_i16_bound) — front-ends then emit int16 residue frames
    #: (exact, half the H2D payload) and the device casts back to f32
    residue_i16: bool
    #: the static worst-case |residue| itself (None if fractional); a
    #: bound < 2048 additionally enables the lossless 12-bit transport
    #: (parallel/pack12.py) for slow links
    residue_bound: float | None
    # stacked tables (leaves)
    mode_blockflag: jnp.ndarray  # i32 [M]
    f_is_floor1: jnp.ndarray  # bool [M, C]
    f1_xs: jnp.ndarray  # i32 [M, C, P] sorted x positions (pad BIG_X)
    f1_mult: jnp.ndarray  # i32 [M, C] (all-ones: f1_ys are index-space)
    f0_order: jnp.ndarray  # i32 [M, C]
    f0_lfv_scale: jnp.ndarray  # f32 [M, C]
    f0_amp_offset: jnp.ndarray  # f32 [M, C]
    f0_cos_omega: jnp.ndarray  # f32 [M, C, w_eff]
    coup_mag: jnp.ndarray  # i32 [M, S]
    coup_ang: jnp.ndarray  # i32 [M, S]
    coup_n: jnp.ndarray  # i32 [M]
    f1_step: jnp.ndarray  # f32 [C, M*(P+1), w_eff] step matrix, GEMM layout
    slope0: jnp.ndarray  # f32 [W] (zero past n0/2)
    slope1: jnp.ndarray  # f32 [W]
    imdct_m0: jnp.ndarray  # f32 [n0/2, n0]
    imdct_m1: jnp.ndarray  # f32 [n1/2, n1]
    #: DCT-IV forms of imdct_m0/m1 (column-permuted sign flips, see
    #: ops/imdct.dct4_from_imdct), precomputed at setup time: deriving them
    #: inside the jitted path would re-run the negate+concat on EVERY
    #: dispatch (cs leaves are runtime inputs, not trace constants)
    dct4_m0: jnp.ndarray  # f32 [n0/2, n0/2]
    dct4_m1: jnp.ndarray  # f32 [n1/2, n1/2]

    _leaf_names = (
        "mode_blockflag", "f_is_floor1", "f1_xs", "f1_mult", "f0_order",
        "f0_lfv_scale", "f0_amp_offset", "f0_cos_omega", "coup_mag",
        "coup_ang", "coup_n", "f1_step", "slope0", "slope1", "imdct_m0",
        "imdct_m1", "dct4_m0", "dct4_m1",
    )
    _static_names = (
        "channels", "n0", "n1", "sample_rate", "max_posts", "f0_order_max",
        "has_floor0", "has_floor1", "w_eff",
        "static_coupling", "residue_i16", "residue_bound",
    )

    def tree_flatten(self):
        leaves = tuple(getattr(self, k) for k in self._leaf_names)
        static = tuple(getattr(self, k) for k in self._static_names)
        return leaves, static

    @classmethod
    def tree_unflatten(cls, static, leaves):
        return cls(*static, *leaves)


def residue_i16_bound(setup: SetupHeader) -> float | None:
    """Worst-case |residue value| if every codebook used by any residue is
    integer-valued; None if any is fractional.

    Each spectral slot receives at most one VQ accumulate per pass (8
    passes, spec 8.6.2 / ref src/audio.rs:620-717), so
    ``sum over passes of max |entry| over that pass's books`` bounds every
    decodable packet of this setup — hostile streams included, since
    packets can only reference setup codebooks. When the bound is < 32768
    the i16 residue transport is exact.
    """
    worst = 0.0
    for r in setup.residues:
        if r is None:
            continue
        bound = 0.0
        for p in range(8):
            mx = 0.0
            for cls_books in r.books:
                b = cls_books[p]
                if b is None or b < 0:
                    continue
                vq = setup.codebooks[b].vq
                if vq is None or vq.size == 0:
                    continue
                if not np.array_equal(vq, np.trunc(vq)):
                    return None  # fractional lattice: keep f32 transport
                mx = max(mx, float(np.abs(vq).max()))
            bound += mx
        worst = max(worst, bound)
    return worst


def _dct4_np(m: np.ndarray) -> np.ndarray:
    """numpy twin of ops/imdct.dct4_from_imdct, run once at setup time."""
    M = m.shape[1] // 2
    return np.concatenate([-m[:, 3 * M // 2 :], m[:, : M // 2]], axis=1)


def compile_setup(ident: IdentHeader, setup: SetupHeader) -> CompiledSetup:
    """Compile the decoded setup header into stacked device tables."""
    C = ident.channels
    n0, n1 = ident.bs0, ident.bs1
    W = n1 // 2
    M = len(setup.modes)

    # floor object per (mode, channel)
    floors = [
        [
            setup.floors[
                setup.mappings[m.mapping].submap_floor[
                    setup.mappings[m.mapping].mux[c]
                ]
            ]
            for c in range(C)
        ]
        for m in setup.modes
    ]
    f1s = [f for row in floors for f in row if isinstance(f, Floor1)]
    f0s = [f for row in floors for f in row if isinstance(f, Floor0)]
    P = max((len(f.x_list) for f in f1s), default=2)
    Omax = max((f.order for f in f0s), default=0)
    Smax = max(
        (len(setup.mappings[m.mapping].coupling_magnitude) for m in setup.modes),
        default=0,
    )

    f_is_floor1 = np.zeros((M, C), dtype=bool)
    f1_xs = np.full((M, C, P), int(BIG_X), dtype=np.int32)
    f1_mult = np.ones((M, C), dtype=np.int32)
    f0_order = np.zeros((M, C), dtype=np.int32)
    f0_lfv_scale = np.zeros((M, C), dtype=np.float32)
    f0_amp_offset = np.zeros((M, C), dtype=np.float32)
    f0_cos_omega = np.zeros((M, C, W), dtype=np.float32)
    coup_mag = np.zeros((M, Smax), dtype=np.int32)
    coup_ang = np.zeros((M, Smax), dtype=np.int32)
    coup_n = np.zeros((M,), dtype=np.int32)

    for mi, mode in enumerate(setup.modes):
        mapping = setup.mappings[mode.mapping]
        ns = len(mapping.coupling_magnitude)
        coup_n[mi] = ns
        coup_mag[mi, :ns] = mapping.coupling_magnitude
        coup_ang[mi, :ns] = mapping.coupling_angle
        n2 = (n1 if mode.blockflag else n0) // 2
        for c in range(C):
            fl = floors[mi][c]
            if isinstance(fl, Floor1):
                f_is_floor1[mi, c] = True
                xs = np.asarray(fl.x_list, dtype=np.int32)[fl.sort_order]
                f1_xs[mi, c, : len(xs)] = xs
                # f1_mult stays 1: frames carry INDEX-SPACE post values
                # (already *multiplier, clamped 0..255 — libvorbis's
                # floor1_inverse2 endpoint semantics; floor.py
                # floor1_amplitudes)
            else:
                f0_order[mi, c] = fl.order
                f0_lfv_scale[mi, c] = np.float32(fl.amplitude_offset) / np.float32(
                    (1 << fl.amplitude_bits) - 1
                )
                f0_amp_offset[mi, c] = fl.amplitude_offset
                f0_cos_omega[mi, c, :n2] = bark_cos_omega(
                    n2, fl.rate, fl.bark_map_size
                )

    slope0 = np.zeros(W, dtype=np.float32)
    slope0[: n0 // 2] = window_slope(n0 // 2)
    slope1 = window_slope(n1 // 2)

    # effective spectral width: max per-channel residue extent across all
    # (mode, submap); type-2 ends are over the interleaved vector. `end`
    # really is the support: a VQ vector whose dim does not divide
    # partition_size is read whole but its components CLIP at the
    # partition boundary (libvorbis-oracle semantics, see residue.py), so
    # nothing is ever written at or past `end`.
    w_eff = 0
    for m in setup.modes:
        mapping = setup.mappings[m.mapping]
        n2 = (n1 if m.blockflag else n0) // 2
        for sm_i, res_i in enumerate(mapping.submap_residue):
            r = setup.residues[res_i]
            if r is None:  # synthetic setups without residue configs
                w_eff = W
                continue
            ch_in = max(1, sum(1 for c in range(C) if mapping.mux[c] == sm_i))
            if r.residue_type == 2:
                per_ch = -(-min(r.end, n2 * ch_in) // ch_in)
            else:
                per_ch = min(r.end, n2)
            w_eff = max(w_eff, per_ch)
    w_eff = min(W, max(128, -(-w_eff // 128) * 128))  # lane-align

    step_lists = {
        tuple(zip(setup.mappings[m.mapping].coupling_magnitude,
                  setup.mappings[m.mapping].coupling_angle))
        for m in setup.modes
    }
    static_coupling = step_lists.pop() if len(step_lists) == 1 else None
    i16_bound = residue_i16_bound(setup)
    residue_i16 = i16_bound is not None and i16_bound < 32768
    dev = jnp.asarray
    m0_np = imdct_matrix(n0, dtype=np.float32)[: min(w_eff, n0 // 2)]
    m1_np = imdct_matrix(n1, dtype=np.float32)[:w_eff]
    return CompiledSetup(
        channels=C, n0=n0, n1=n1, sample_rate=ident.sample_rate,
        max_posts=P, f0_order_max=Omax,
        has_floor0=bool(f0s), has_floor1=bool(f1s), w_eff=w_eff,
        static_coupling=static_coupling,
        residue_i16=residue_i16,
        residue_bound=i16_bound,
        mode_blockflag=dev(
            np.array([m.blockflag for m in setup.modes], dtype=np.int32)
        ),
        f_is_floor1=dev(f_is_floor1),
        f1_xs=dev(f1_xs), f1_mult=dev(f1_mult),
        f0_order=dev(f0_order), f0_lfv_scale=dev(f0_lfv_scale),
        f0_amp_offset=dev(f0_amp_offset),
        coup_mag=dev(coup_mag), coup_ang=dev(coup_ang), coup_n=dev(coup_n),
        f0_cos_omega=dev(f0_cos_omega[:, :, :w_eff]),
        f1_step=dev(floor1_step_matrix(f1_xs, w_eff)),
        slope0=dev(slope0), slope1=dev(slope1),
        imdct_m0=dev(m0_np),
        imdct_m1=dev(m1_np),
        dct4_m0=dev(_dct4_np(m0_np)),
        dct4_m1=dev(_dct4_np(m1_np)),
    )


# --------------------------------------------------------------------------- #
# Frame packing (host): PacketPlan list -> fixed-shape arrays
# --------------------------------------------------------------------------- #


def pack_frames(cs: CompiledSetup, plans: list[PacketPlan], chunk: int) -> dict:
    """Stack T<=chunk packet plans into padded dense arrays (numpy).

    Residue rows carry cs.w_eff columns — values past the setup's residue
    extent are identically zero (see CompiledSetup.w_eff)."""
    T = chunk
    C, W, P, Omax = cs.channels, cs.w_eff, cs.max_posts, cs.f0_order_max
    fr = {
        "mode": np.zeros(T, np.int32),
        "prev_flag": np.zeros(T, bool),
        "next_flag": np.zeros(T, bool),
        "valid": np.zeros(T, bool),
        # FLAT [T, C*W] (row-major view of [T, C, W]): a [.., C, W] jit
        # parameter gets a (8,128)-tile layout that pads C=2 sublanes 4x —
        # the flat shape tiles cleanly and skips ~1.7 ms/chunk of de-pad
        # reshapes on device
        "residue": np.zeros((T, C * W),
                            np.int16 if cs.residue_i16 else np.float32),
        "f_used": np.zeros((T, C), bool),
        "f1_ys": np.zeros((T, C, P), np.int32),
        "f1_flags": np.zeros((T, C, P), bool),
        "f0_cosc": np.zeros((T, C, max(Omax, 1)), np.float32),
        "f0_amp": np.zeros((T, C), np.float32),
    }
    for t, plan in enumerate(plans):
        if plan is None:  # undecodable packet: invalid slot (device no-op)
            continue
        fr["mode"][t] = plan.mode_number
        fr["prev_flag"][t] = plan.prev_window_flag
        fr["next_flag"][t] = plan.next_window_flag
        fr["valid"][t] = True
        w = min(plan.n // 2, W)
        fr["residue"][t].reshape(C, W)[:, :w] = plan.residue[:, :w]
        for c, f in enumerate(plan.floors):
            if f[0] == "unused":
                continue
            fr["f_used"][t, c] = True
            if f[0] == "f1":
                df = f[1]
                so = df.floor.sort_order
                nv = len(so)
                fr["f1_ys"][t, c, :nv] = np.asarray(df.final_y)[so]
                fr["f1_flags"][t, c, :nv] = np.asarray(df.step2_flag)[so]
            else:
                df = f[1]
                fr["f0_cosc"][t, c, : len(df.cos_coefficients)] = df.cos_coefficients
                fr["f0_amp"][t, c] = df.amplitude
    return fr


def compact_invalid_frames(fr: dict) -> None:
    """Make each stream's valid frames a chunk PREFIX, in place.

    The device overlap-add treats invalid slots as a chunk SUFFIX
    (ops/windowing.py: the carry indexes ``new_pwr[nvalid-1]``
    positionally and neighbors mix against the adjacent slot) — a
    mid-chunk invalid frame would feed the next packet a garbage window
    carry. Compacting good frames to the front reproduces the reference's
    per-packet semantics exactly: a bad packet emits no PCM and leaves
    the window state untouched. Leaves are [S, T, ...] numpy arrays;
    streams whose invalids already form a suffix are untouched."""
    valid = fr["valid"]
    for s in range(valid.shape[0]):
        v = valid[s]
        n = int(v.sum())
        if n and not v[:n].all():
            good = np.flatnonzero(v)
            for arr in fr.values():
                arr[s, :n] = arr[s][good]
                arr[s, n:] = 0


# --------------------------------------------------------------------------- #
# The jitted device pipeline
# --------------------------------------------------------------------------- #


def _by_mode(table: jnp.ndarray, mode: jnp.ndarray) -> jnp.ndarray:
    """Gather stacked per-mode tables by packet mode as a one-hot
    contraction — TPU gathers over wide outputs are ~10x slower than this
    einsum for the handful of modes Vorbis allows. Exact for ints < 2^24."""
    m = table.shape[0]
    oh = (mode[:, None] == jnp.arange(m, dtype=jnp.int32)).astype(jnp.float32)
    # Explicit precision: the TPU default is 1-pass bf16, which would
    # quantize integer-valued tables (floor post positions: 850 -> 848!).
    # HIGH (bf16x3) is exact for the < 2^24 integers stored here.
    res = jnp.einsum("tm,m...->t...", oh, table.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGH)
    if table.dtype == jnp.bool_:
        return res > 0.5
    return res.astype(table.dtype)


def _floor_kernel_ok(cs, fr, allow_fused: bool = True) -> bool:
    from ..ops.floor_kernel import pallas_floor_supported

    return (allow_fused and "f1_brackets" not in fr
            and jax.default_backend() == "tpu"
            and pallas_floor_supported(cs, fr["mode"].shape[0])
            # the kernel's pads/BlockSpecs are 2-d: require the FLAT
            # [T, C*W] layout (a mono [T, 1, W] residue satisfies the
            # width check but would fail inside the kernel)
            and fr["residue"].ndim == 2
            and fr["residue"].shape[-1] == cs.channels * cs.w_eff)


def _floor_kernel_spectra(cs, fr, ct_out: bool = False, cd_n: int = 0):
    """Run the fused floor Pallas kernel (callers gate on
    :func:`_floor_kernel_ok`). With ``cd_n``, the kernel also applies the
    Wang-split pre-butterfly and emits (c || d) instead of spectra."""
    from ..ops.floor_kernel import floor_spectra_pallas

    mode = fr["mode"]
    T, C, W = mode.shape[0], cs.channels, cs.w_eff
    xs = _by_mode(cs.f1_xs, mode)
    tele = floor1_telescopes(xs, fr["f1_ys"], fr["f1_flags"],
                             cs.f1_mult[mode])
    P1 = tele[0].shape[2]
    tele = jnp.stack(tele, axis=2).reshape(T, C * 4 * P1)
    scal = jnp.concatenate(
        [mode.astype(jnp.float32)[:, None],
         fr["f_used"].astype(jnp.float32)], axis=1)
    M = cs.f1_step.shape[1] // P1
    return floor_spectra_pallas(
        tele, fr["residue"], scal,
        cs.f1_step.astype(jnp.bfloat16), cs.static_coupling,
        C, W, M, ct_out=ct_out, cd_n=cd_n,
    )


def _synthesize_spectra_ct(cs, fr):
    """Channel-major spectra [C, T, W] for the i16 fast path (bitcast
    chain into the ctk IMDCT GEMM). Falls back to transposing the
    generic path's output when the floor kernel does not apply."""
    bf = cs.mode_blockflag[fr["mode"]]
    if _floor_kernel_ok(cs, fr):
        return _floor_kernel_spectra(cs, fr, ct_out=True), bf
    spectra, _, _ = _synthesize_spectra_tapped(cs, fr)
    return jnp.transpose(spectra, (1, 0, 2)), bf


def _synthesize_spectra_tapped(cs, fr, allow_fused: bool = True):
    """Stages 1-3 (coupling, floors, dot): per-packet, dependency free.
    Returns (spectra [N, C, W_eff], blockflag [N], taps)."""
    mode = fr["mode"]
    bf = cs.mode_blockflag[mode]  # i32 [T]
    W = cs.w_eff  # spectra are zero past the residue extent (see w_eff)
    T = mode.shape[0]

    # Fast path: the fused floor Pallas kernel (brackets GEMM + render +
    # coupling + dot in VMEM) — reads residue frames in their native
    # layout, which also kills XLA's T-minor input relayout passes.
    if _floor_kernel_ok(cs, fr, allow_fused):
        return _floor_kernel_spectra(cs, fr), bf, {}

    fr = dict(fr)
    if fr["residue"].ndim == 2:  # flat [T, C*W] frame -> [T, C, W]
        fr["residue"] = fr["residue"].reshape(T, cs.channels, W)
    if fr["residue"].dtype != jnp.float32:
        # i16 transport (see CompiledSetup.residue_i16): exact cast back;
        # XLA fuses the convert into the first consuming pass
        fr["residue"] = fr["residue"].astype(jnp.float32)

    taps = {}

    # 1. inverse coupling on raw residue (ref order: coupling before floor
    #    multiply, src/audio.rs:991-1039)
    res_in = fr["residue"][:, :, :W]
    taps["residue_pre_inverse"] = res_in
    if cs.static_coupling is not None:
        residue = inverse_coupling_static(res_in, cs.static_coupling)
    else:
        residue = inverse_coupling_batch(
            res_in, mode, cs.coup_mag, cs.coup_ang, cs.coup_n
        )
    taps["residue_post_inverse"] = residue

    # 2. floor curves. Fast path (floor1-only setup, static coupling, on
    #    TPU): MXU bracket search + one fused Pallas pass for render/couple/
    #    multiply — see ops/synth_kernel.py. The unfused path remains for
    #    floor0 setups, per-mode coupling, CPU, and tap collection.
    # Measured on v5e: XLA's own fusion of the unfused ops beats the hand
    # Pallas kernel (12.8k x vs 7.4k x realtime), so the fused path is
    # opt-in for experimentation only.
    fused = (
        USE_FUSED_SYNTH_KERNEL and allow_fused
        and cs.has_floor1 and not cs.has_floor0
        and cs.static_coupling is not None
        and jax.default_backend() == "tpu"
    )
    if fused:
        br = fr.get("f1_brackets") or floor1_brackets_mxu(
            _by_mode(cs.f1_xs, mode), fr["f1_ys"], fr["f1_flags"],
            cs.f1_mult[mode], mode, cs.f1_step, W,
        )
        spectra = fused_floor_couple(
            jnp.stack(br, axis=1), fr["residue"][:, :, :W], fr["f_used"],
            cs.static_coupling,
        )
        return spectra, bf, taps

    is_f1 = cs.f_is_floor1[mode]  # [T, C]
    curve = jnp.zeros_like(residue)
    if cs.has_floor1:
        br = fr.get("f1_brackets") or floor1_brackets_mxu(
            _by_mode(cs.f1_xs, mode), fr["f1_ys"], fr["f1_flags"],
            cs.f1_mult[mode], mode, cs.f1_step, W,
        )
        c1 = floor1_render(br)
        curve = jnp.where(is_f1[:, :, None], c1, curve)
    if cs.has_floor0:
        c0 = floor0_curve_batch(
            fr["f0_cosc"], fr["f0_amp"], cs.f0_order[mode],
            cs.f0_lfv_scale[mode], cs.f0_amp_offset[mode],
            _by_mode(cs.f0_cos_omega, mode),
        )
        curve = jnp.where(is_f1[:, :, None], curve, c0)
    curve = jnp.where(fr["f_used"][:, :, None], curve, jnp.float32(0.0))

    # 3. spectra = floor x residue
    spectra = curve * residue
    taps["pre_mdct"] = spectra
    return spectra, bf, taps


def _synthesize_audio_tapped(cs, fr, imdct=imdct_batch,
                             allow_fused: bool = True):
    """Stages 1-4 (coupling, floors, dot, IMDCT): per-packet, dependency
    free. Returns (audio [N, C, n1], blockflag [N], taps)."""
    # the fused synth kernel path assumes the stock imdct (tp-sharded
    # callers pass their own and keep the plain ops)
    spectra, bf, taps = _synthesize_spectra_tapped(
        cs, fr, allow_fused=allow_fused and imdct is imdct_batch)

    # 4. IMDCT on the MXU
    audio = imdct(spectra, bf, cs.imdct_m0, cs.imdct_m1)
    taps["post_mdct"] = audio
    return audio, bf, taps


def synthesize_audio(cs: CompiledSetup, fr: dict, imdct=imdct_batch):
    """Per-packet synthesis prefix (coupling, floors, dot, IMDCT) with NO
    inter-packet or inter-stream dependencies — batch callers run it once
    over the flattened (stream, packet) axes so every GEMM sees full-size
    operands instead of vmapped 64-row batches. Returns (audio, blockflag).
    """
    audio, bf, _ = _synthesize_audio_tapped(cs, fr, imdct)
    return audio, bf


def finish_stream(cs: CompiledSetup, audio, bf, fr: dict, carry,
                  with_i16: bool = False, compact_cap: int | None = None):
    """Per-stream tail: overlap-add + output formatting (the only part
    that needs the stream axis under vmap)."""
    if with_i16 and compact_cap is None:
        # fused single-pass overlap-add + i16, bit-identical to the unfused
        # path: Pallas kernel on TPU (XLA will not fuse the multi-offset
        # packet-shifted reads, see ops/overlap_kernel.py), jnp elsewhere.
        # ``audio`` may be the (long, short) imdct_batch_parts tuple.
        from ..ops.overlap_kernel import pallas_overlap_supported

        T = bf.shape[0]
        if (jax.default_backend() == "tpu"
                and pallas_overlap_supported(cs.n0, cs.n1, T, cs.channels)):
            return overlap_add_i16_kernel_batch(
                audio, bf, fr["prev_flag"], fr["next_flag"], fr["valid"],
                cs.slope0, cs.slope1, cs.n0, cs.n1, carry,
            )
        if isinstance(audio, tuple):
            raise TypeError("imdct parts require the Pallas overlap path")
        (out, out_len), carry = overlap_add_i16_batch(
            audio, bf, fr["prev_flag"], fr["next_flag"], fr["valid"],
            cs.slope0, cs.slope1, cs.n0, cs.n1, carry,
        )
        # flat [T, C*outw] like the kernel path (device reshape re-tiles)
        return (out.reshape(out.shape[0], -1), out_len), carry
    (out, out_len), carry = overlap_add_batch(
        audio, bf, fr["prev_flag"], fr["next_flag"], fr["valid"],
        cs.slope0, cs.slope1, cs.n0, cs.n1, carry,
    )
    if compact_cap is not None:
        pcm, total = compact_i16(out, out_len, compact_cap)
        return (pcm, total, out_len), carry
    return (out, out_len), carry


def decode_frames_core(
    cs: CompiledSetup, fr: dict, carry, with_i16: bool = False,
    imdct=imdct_batch, compact_cap: int | None = None,
    with_taps: bool = False,
):
    """Decode one chunk of T packets for one stream (untraced core).

    Returns ((out [T, C, 3n1/4] f32|i16, out_len [T] i32), new_carry);
    with compact_cap, ((pcm [cap, C] i16, total, out_len), new_carry).
    """
    from ..ops.overlap_kernel import pallas_overlap_supported

    T = fr["mode"].shape[0]
    if (with_i16 and compact_cap is None and not with_taps
            and imdct is imdct_batch
            and jax.default_backend() == "tpu"
            and pallas_overlap_supported(cs.n0, cs.n1, T, cs.channels)):
        # i16 fast path: channel-major [C, T, *] end to end — the floor
        # kernel's spectra, the IMDCT GEMM (ctk,kn->ctn), and the overlap
        # kernel's inputs all share one physical layout, so every hop is a
        # bitcast (the [T, C, *] order costs a 235 MB relayout at the GEMM)
        from ..ops.overlap_kernel import pallas_x_rep_supported

        from ..ops import imdct as imdct_mod

        x_rep_ok = pallas_x_rep_supported(cs.n0, cs.n1, T, cs.channels)
        use_split = (x_rep_ok and imdct_mod.USE_DCT4_SPLIT
                     and cs.w_eff * 8 >= cs.n1 * 3 and cs.n1 >= 512)
        if use_split:
            # Wang split: half the long-GEMM FLOPs (ops/imdct.py); only
            # pays when w_eff barely clips (the split loses the K = w_eff
            # clip) and the transform is MXU-sized. The (U, V) halves go
            # to the overlap kernel unrecombined — it zips them back into
            # X in VMEM. When the floor kernel runs, it emits the
            # butterfly pair (c || d) directly (cd_n) so the twiddle
            # rotation costs no XLA pass either; the short-block GEMM
            # recovers its few head values by the inverse rotation.
            if _floor_kernel_ok(cs, fr):
                bf = cs.mode_blockflag[fr["mode"]]
                cd = _floor_kernel_spectra(cs, fr, ct_out=True,
                                           cd_n=cs.n1 // 2)
                uv = imdct_mod.dct4_split_uv_from_cd(cd, cs.n1)
                short_a = None
                if cs.n0 != cs.n1:
                    mx0 = cs.dct4_m0
                    head = imdct_mod.split_cd_head(cd, cs.n1, mx0.shape[0])
                    short_a = imdct_einsum("ctk,km->ctm", head, mx0)
            else:
                spectra_ct, bf = _synthesize_spectra_ct(cs, fr)
                uv = imdct_mod.dct4_split_uv_ct(spectra_ct, cs.n1)
                short_a = None
                if cs.n0 != cs.n1:
                    mx0 = cs.dct4_m0
                    short_a = imdct_einsum(
                        "ctk,km->ctm", spectra_ct[:, :, : mx0.shape[0]],
                        mx0)
            return overlap_add_i16_kernel_batch(
                (uv, short_a), bf, fr["prev_flag"], fr["next_flag"],
                fr["valid"], cs.slope0, cs.slope1, cs.n0, cs.n1, carry,
                ct_in=True, x_rep=True, x_split=True,
            )
        spectra_ct, bf = _synthesize_spectra_ct(cs, fr)
        if x_rep_ok:
            # half-width form: the GEMM emits only the n/2 distinct
            # DCT-IV values per transform (33% less MXU work at matched
            # precision); the overlap kernel mirror-expands in VMEM
            long_a, short_a = dct4_batch_parts_ct(
                spectra_ct, cs.dct4_m0, cs.dct4_m1)
            audio = (long_a, short_a) if short_a is not None else long_a
            return overlap_add_i16_kernel_batch(
                audio, bf, fr["prev_flag"], fr["next_flag"], fr["valid"],
                cs.slope0, cs.slope1, cs.n0, cs.n1, carry, ct_in=True,
                x_rep=True,
            )
        long_a, short_a = imdct_batch_parts_ct(
            spectra_ct, cs.imdct_m0, cs.imdct_m1)
        audio = (long_a, short_a) if short_a is not None else long_a
        return overlap_add_i16_kernel_batch(
            audio, bf, fr["prev_flag"], fr["next_flag"], fr["valid"],
            cs.slope0, cs.slope1, cs.n0, cs.n1, carry, ct_in=True,
        )

    audio, bf, taps = _synthesize_audio_tapped(
        cs, fr, imdct, allow_fused=not with_taps)

    # 5. window + overlap-add (parallel over packet time; the carry is a
    #    one-packet shift, not an accumulation)
    if with_taps:
        (out, out_len), carry = overlap_add_batch(
            audio, bf, fr["prev_flag"], fr["next_flag"], fr["valid"],
            cs.slope0, cs.slope1, cs.n0, cs.n1, carry,
        )
        return (out, out_len, taps), carry
    return finish_stream(cs, audio, bf, fr, carry, with_i16, compact_cap)


def predict_out_lens(cs: CompiledSetup, fr: dict, started: np.ndarray | bool):
    """Host-side per-packet output-length prediction (numpy, exact).

    The lengths depend only on (blockflag, prev/next window flag, valid,
    started) — all host-known — so callers can size the device-compacted
    output buffer before launching. `fr` leaves may have a leading stream
    axis; `started` is per-stream (or scalar) carry-in.

    Returns (out_lens i64 [..., T], started_out).
    """
    bf_tab = np.asarray(cs.mode_blockflag)
    bf = bf_tab[np.asarray(fr["mode"])]
    long_blk = bf == 1
    pf = np.asarray(fr["prev_flag"])
    nf = np.asarray(fr["next_flag"])
    valid = np.asarray(fr["valid"])
    n0, n1 = cs.n0, cs.n1
    left = np.where(long_blk & ~pf, (n1 - n0) >> 2, 0)
    right = np.where(long_blk & ~nf, (3 * n1 - n0) >> 2,
                     np.where(long_blk, n1 >> 1, n0 >> 1))
    before = np.cumsum(valid, axis=-1) - valid
    started_seq = np.logical_or(np.asarray(started)[..., None], before > 0)
    lens = np.where(valid & started_seq, right - left, 0).astype(np.int64)
    started_out = np.logical_or(np.asarray(started), valid.any(axis=-1))
    return lens, started_out


@partial(jax.jit, static_argnames=("with_i16", "compact_cap", "with_taps"))
def decode_frames(cs: CompiledSetup, fr: dict, carry, with_i16: bool = False,
                  compact_cap: int | None = None, with_taps: bool = False):
    """Jitted single-stream chunk decode (see decode_frames_core)."""
    return decode_frames_core(cs, fr, carry, with_i16,
                              compact_cap=compact_cap, with_taps=with_taps)


# --------------------------------------------------------------------------- #
# Host-facing stream decoder
# --------------------------------------------------------------------------- #


class StreamDecoder:
    """Per-stream chunked decode: entropy-decode packets on the host (C++
    front-end when built, Python reference otherwise), run the device
    pipeline in fixed-size chunks, carry window state across chunks.

    ``raw_headers=(ident_packet, setup_packet)`` enables the native
    front-end; without it the Python front-end is used.
    """

    def __init__(self, ident: IdentHeader, setup: SetupHeader,
                 chunk: int = DEFAULT_CHUNK,
                 raw_headers: tuple[bytes, bytes] | None = None,
                 frontend: str = "auto"):
        self.ident = ident
        self.setup = setup
        self.chunk = chunk
        self.cs = compile_setup(ident, setup)
        self.carry = init_window_carry(self.cs.channels, self.cs.n1 // 2)
        self._native = None
        if frontend != "python" and raw_headers is not None:
            from .. import native

            if native.available():
                self._native = native.NativeStream(*raw_headers)
                self._native.frame_width = self.cs.w_eff
                if self.cs.residue_i16:
                    self._native.residue_dtype = np.int16
            elif frontend == "native":
                raise RuntimeError("native front-end requested but not built")
        elif frontend == "native":
            raise ValueError(
                "frontend='native' requires raw_headers=(ident, setup) — "
                "the C++ parser consumes the raw header packets")

    def reset(self) -> None:
        self.carry = init_window_carry(self.cs.channels, self.cs.n1 // 2)

    def set_residue_transport(self, kind: str) -> None:
        """Select the native front-end's residue emit encoding: "default"
        (i16 when the setup's static bound allows, else f32) or "p12"
        (12-bit planes packed at emit time — one write of the dominant
        buffer instead of decode-then-pack; requires
        parallel.pack12.pack12_supported). No-op without the native
        front-end (the python front-end emits i16/f32 frames and callers
        pack separately)."""
        if self._native is None:
            return
        if kind == "p12":
            from ..parallel.pack12 import pack12_supported

            assert pack12_supported(self.cs), "p12 emit needs the static gate"
            self._native.residue_dtype = np.uint32
        else:
            self._native.residue_dtype = (
                np.int16 if self.cs.residue_i16 else np.float32)

    def save_state(self):
        """Checkpoint the window carry as host numpy (SURVEY §5
        checkpoint/resume; the carry is the whole inter-packet state)."""
        return jax.tree.map(np.asarray, self.carry)

    def load_state(self, state) -> None:
        self.carry = jax.tree.map(jnp.asarray, state)

    def entropy_chunk(self, packets: list[bytes]) -> dict:
        """Host half for one chunk: packets -> dense frames (numpy dict).

        STRICT: raises on any non-audio or undecodable packet (the same
        exceptions the python front-end's decode_packet_entropy raises, so
        behavior does not depend on which front-end is built). Strictness
        also guarantees `valid` is a chunk prefix — the overlap-add
        contract (ops/windowing.py). Tolerant callers use
        :meth:`entropy_chunk_status` / :meth:`entropy_chunk_batch`."""
        if self._native is not None:
            fr, status = self._native.decode_chunk(packets, self.chunk)
            st = status[: len(packets)]
            if (st != 0).any():
                from ..errors import AudioBadFormat, AudioIsHeader

                bad = int(np.argmax(st != 0))
                if st[bad] == 1:
                    raise AudioIsHeader(
                        f"header packet at chunk index {bad}")
                raise AudioBadFormat(f"undecodable packet at chunk index {bad}")
            return fr
        plans = [
            decode_packet_entropy(self.ident, self.setup, p) for p in packets
        ]
        return pack_frames(self.cs, plans, self.chunk)

    def entropy_chunk_status(self, packets: list[bytes],
                             out: dict | None = None):
        """Like :meth:`entropy_chunk` but never raises on undecodable
        packets: returns ``(frames, status)`` with per-slot status 0 ok /
        1 header-packet / 2 bad. Bad slots stay ``valid=False`` (a device
        no-op, window state untouched — per-packet reference semantics).
        Serving-path variant: one hostile packet must not stall or crash
        the whole batch."""
        if self._native is not None:
            return self._native.decode_chunk(packets, self.chunk, out=out)
        from ..errors import AudioIsHeader, VorbisError

        plans: list = []
        status = np.zeros(self.chunk, np.uint8)
        for t, p in enumerate(packets):
            try:
                plans.append(decode_packet_entropy(self.ident, self.setup, p))
            except AudioIsHeader:
                plans.append(None)
                status[t] = 1
            except VorbisError:
                plans.append(None)
                status[t] = 2
        fr = pack_frames(self.cs, plans, self.chunk)
        if out is not None:
            for k in out:
                out[k][...] = fr[k]
            fr = out
        return fr, status

    def entropy_chunk_batch(self, streams: list[list[bytes]],
                            threads: int | None = None,
                            out: dict | None = None) -> dict:
        """Host half for one chunk of a stream batch: [S][<=T] packets ->
        dense frames with a leading stream axis, written in place (no
        per-stream stacking copy when the native front-end is available).

        Streams entropy-decode in parallel — the native call releases the
        GIL, and Vorbis has no inter-packet entropy state. ``threads``
        defaults to the machine's core count (threading on a 1-core host
        only adds switching overhead). ``out`` reuses a frame-buffer dict
        from a previous chunk (the [S, T, ...] allocations are the
        dominant per-chunk host cost after the decode itself).

        TOLERANT (regardless of front-end): non-audio/undecodable packets
        are skipped — they emit no PCM and leave the stream's window state
        untouched (per-packet reference semantics) — by compacting each
        stream's good frames to a chunk prefix (see
        :func:`compact_invalid_frames`)."""
        import os as _os

        S = len(streams)
        if threads is None:
            threads = min(8, _os.cpu_count() or 1)
        if self._native is not None:
            from ..native import PacketSpans

            fr = out if out is not None \
                else self._native.frame_buffers(self.chunk, lead=(S,))
            if S and isinstance(streams[0], PacketSpans):
                # zero-copy path: packets stay in their demux blobs; only
                # the [S, T] span tables are built per chunk
                T = self.chunk
                offs = np.zeros((S, T), np.uint64)
                lens = np.zeros((S, T), np.uint64)
                counts = np.zeros(S, np.int32)
                bufs = np.zeros(S, np.uint64)
                for si, sp in enumerate(streams):
                    n = min(len(sp), T)
                    counts[si] = n
                    offs[si, :n] = sp.offs[:n]
                    lens[si, :n] = sp.lens[:n]
                    bufs[si] = sp.data.ctypes.data
                self._native.decode_chunk_batch_view(
                    bufs, offs, lens, counts, fr, threads=threads)
                compact_invalid_frames(fr)
                return fr
            # one native call for the whole batch (native std::thread
            # workers when multi-core): the per-stream Python marshaling
            # measured ~25% of front-end wall time
            self._native.decode_chunk_batch(streams, self.chunk, fr,
                                            threads=threads)
            compact_invalid_frames(fr)
            return fr
        frs = [self.entropy_chunk_status(pcks)[0] for pcks in streams]
        stacked = {k: np.stack([f[k] for f in frs]) for k in frs[0]}
        compact_invalid_frames(stacked)
        if out is not None:
            for k in out:
                out[k][...] = stacked[k]
            return out
        return stacked

    def decode_packets(self, packets: list[bytes]) -> list[np.ndarray]:
        """Decode audio packets -> list of planar f32 [C, out_len] arrays
        (one per packet; the first packet of a stream yields length 0)."""
        outs: list[np.ndarray] = []
        for i in range(0, len(packets), self.chunk):
            batch = packets[i : i + self.chunk]
            fr = self.entropy_chunk(batch)
            fr = {k: jnp.asarray(v) for k, v in fr.items()}
            (out, out_len), self.carry = decode_frames(self.cs, fr, self.carry)
            out = np.asarray(out)
            out_len = np.asarray(out_len)
            for t in range(len(batch)):
                outs.append(out[t, :, : int(out_len[t])])
        return outs

    def decode_packets_i16(self, packets: list[bytes]) -> list[np.ndarray]:
        """Like :meth:`decode_packets` but through the device i16 output
        path (the fused overlap+i16 kernel on TPU): planar i16 [C, len].
        The device chunk output is flat [T, C*outw]; the split to [C, outw]
        happens here on the host (free numpy view)."""
        outs: list[np.ndarray] = []
        C = self.cs.channels
        for i in range(0, len(packets), self.chunk):
            batch = packets[i : i + self.chunk]
            fr = self.entropy_chunk(batch)
            fr = {k: jnp.asarray(v) for k, v in fr.items()}
            (out, out_len), self.carry = decode_frames(
                self.cs, fr, self.carry, with_i16=True)
            out = np.asarray(out).reshape(len(out), C, -1)
            out_len = np.asarray(out_len)
            for t in range(len(batch)):
                outs.append(out[t, :, : int(out_len[t])])
        return outs

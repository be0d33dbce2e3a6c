"""Pallas overlap+i16 kernel vs the XLA reference paths.

The kernel (ops/overlap_kernel.py) runs in interpret mode here (tests
force the CPU platform); real-Mosaic conformance is gated on-chip by
`python bench.py --check`, which decodes the corpus through this path.

Tolerance note: the kernel and the XLA path may differ by 1 i16 LSB on
samples whose f32 value sits exactly on an integer boundary (FMA vs
separately-rounded multiply-add); the backend contract is +/-2 LSB vs
libvorbis, not bitwise equality between backends.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lewton_tpu.ops.windowing import (overlap_add_batch,
                                      overlap_add_i16_batch,
                                      overlap_add_i16_kernel_batch)
from lewton_tpu.tables import window_slope

N0, N1 = 256, 2048
C, W = 2, N1 // 2


def _slopes():
    s0 = np.concatenate(
        [window_slope(N0 // 2), np.zeros(W - N0 // 2)]).astype(np.float32)
    s1 = window_slope(W).astype(np.float32)
    return jnp.asarray(s0), jnp.asarray(s1)


def _rand_case(rng, T):
    bf = rng.integers(0, 2, T).astype(np.int32)
    pf = rng.integers(0, 2, T).astype(bool)
    nf = rng.integers(0, 2, T).astype(bool)
    valid = np.arange(T) < rng.integers(0, T + 1)
    audio = (rng.standard_normal((T, C, N1)) * 0.5).astype(np.float32)
    pwr0 = (rng.standard_normal((C, W)) * 0.5).astype(np.float32)
    carry = (jnp.asarray(pwr0),
             jnp.int32(rng.choice([0, N0 // 2, W])),
             jnp.array(bool(rng.integers(0, 2))))
    return (jnp.asarray(audio), jnp.asarray(bf), jnp.asarray(pf),
            jnp.asarray(nf), jnp.asarray(valid)), carry


def test_fused_i16_bit_identical_to_unfused():
    """overlap_add_i16_batch == overlap_add_batch + scale/clamp/trunc,
    bit for bit, including the carry."""
    rng = np.random.default_rng(0)
    s0, s1 = _slopes()
    rfn = jax.jit(overlap_add_batch, static_argnums=(7, 8))
    ffn = jax.jit(overlap_add_i16_batch, static_argnums=(7, 8))
    for _ in range(10):
        (a, bf, pf, nf, v), carry = _rand_case(rng, int(rng.integers(1, 20)))
        (out_f, len_f), car_f = rfn(a, bf, pf, nf, v, s0, s1, N0, N1, carry)
        ref = np.asarray(jnp.trunc(
            jnp.clip(out_f * 32768.0, -32768.0, 32767.0)).astype(jnp.int16))
        (out_i, len_i), car_i = ffn(a, bf, pf, nf, v, s0, s1, N0, N1, carry)
        assert np.array_equal(ref, np.asarray(out_i))
        assert np.array_equal(np.asarray(len_f), np.asarray(len_i))
        for x, y in zip(car_f, car_i):
            assert np.array_equal(np.asarray(x), np.asarray(y))


def test_pallas_kernel_interpret_matches():
    """Kernel (interpret mode) within 1 LSB of the XLA path; identical
    out_len and carry."""
    rng = np.random.default_rng(1)
    s0, s1 = _slopes()
    rfn = jax.jit(overlap_add_batch, static_argnums=(7, 8))

    def kf(a, bf, pf, nf, v, x0, x1, carry):
        return overlap_add_i16_kernel_batch(
            a, bf, pf, nf, v, x0, x1, N0, N1, carry, interpret=True)

    kfn = jax.jit(kf)
    for T in (1, 3, 16, 17, 33):
        (a, bf, pf, nf, v), carry = _rand_case(rng, T)
        (out_f, len_f), car_f = rfn(a, bf, pf, nf, v, s0, s1, N0, N1, carry)
        ref = np.asarray(jnp.trunc(
            jnp.clip(out_f * 32768.0, -32768.0, 32767.0)).astype(jnp.int16))
        (out_k, len_k), car_k = kfn(a, bf, pf, nf, v, s0, s1, carry)
        out_k = np.asarray(out_k).reshape(ref.shape)  # flat [T, C*outw]
        assert np.abs(ref.astype(np.int32) - out_k.astype(np.int32)).max() <= 1
        assert np.array_equal(np.asarray(len_f), np.asarray(len_k))
        for x, y in zip(car_f, car_k):
            assert np.array_equal(np.asarray(x), np.asarray(y))


def test_pallas_kernel_vmapped():
    """The kernel under vmap (as used by decode_chunk_batch)."""
    rng = np.random.default_rng(2)
    s0, s1 = _slopes()
    S, T = 3, 32
    a = jnp.asarray((rng.standard_normal((S, T, C, N1)) * 0.5)
                    .astype(np.float32))
    bf = jnp.asarray(rng.integers(0, 2, (S, T)).astype(np.int32))
    pf = jnp.asarray(rng.integers(0, 2, (S, T)).astype(bool))
    nf = jnp.asarray(rng.integers(0, 2, (S, T)).astype(bool))
    v = jnp.ones((S, T), bool)
    carry = (jnp.zeros((S, C, W), jnp.float32),
             jnp.zeros((S,), jnp.int32), jnp.zeros((S,), bool))
    vk = jax.jit(jax.vmap(
        lambda a_, b_, p_, n_, v_, c_: overlap_add_i16_kernel_batch(
            a_, b_, p_, n_, v_, s0, s1, N0, N1, c_, interpret=True),
        in_axes=(0, 0, 0, 0, 0, 0)))
    vr = jax.jit(jax.vmap(
        lambda a_, b_, p_, n_, v_, c_: overlap_add_batch(
            a_, b_, p_, n_, v_, s0, s1, N0, N1, c_),
        in_axes=(0, 0, 0, 0, 0, 0)))
    (out_f, len_f), _ = vr(a, bf, pf, nf, v, carry)
    ref = np.asarray(jnp.trunc(
        jnp.clip(out_f * 32768.0, -32768.0, 32767.0)).astype(jnp.int16))
    (out_k, len_k), _ = vk(a, bf, pf, nf, v, carry)
    out_k = np.asarray(out_k).reshape(ref.shape)  # flat [S, T, C*outw]
    assert np.abs(ref.astype(np.int32) - out_k.astype(np.int32)).max() <= 1
    assert np.array_equal(np.asarray(len_f), np.asarray(len_k))


def test_pallas_kernel_parts_variant():
    """(long, short) un-selected GEMM outputs: kernel selects in VMEM.

    T=48 with a mixed every-3rd-short blockflag pins the block-boundary
    prev-row select (a long/short flag taken from the wrong block produced
    full-scale errors at rows 16/32/48 on real hardware)."""
    rng = np.random.default_rng(3)
    s0, s1 = _slopes()
    for T in (16, 33, 48):
        (_, bf, pf, nf, v), carry = _rand_case(rng, T)
        if T == 48:
            bfm = np.ones(T, np.int32)
            bfm[::3] = 0
            bf = jnp.asarray(bfm)
            v = jnp.asarray(np.ones(T, bool))
        long_a = jnp.asarray((rng.standard_normal((T, C, N1)) * 0.5)
                             .astype(np.float32))
        short_a = jnp.asarray((rng.standard_normal((T, C, N0)) * 0.5)
                              .astype(np.float32))
        # the XLA reference path takes the pre-selected audio
        audio = jnp.where((bf == 1)[:, None, None], long_a,
                          jnp.pad(short_a, [(0, 0), (0, 0), (0, N1 - N0)]))
        (out_f, len_f), car_f = jax.jit(
            overlap_add_batch, static_argnums=(7, 8))(
                audio, bf, pf, nf, v, s0, s1, N0, N1, carry)
        ref = np.asarray(jnp.trunc(
            jnp.clip(out_f * 32768.0, -32768.0, 32767.0)).astype(jnp.int16))
        (out_k, len_k), car_k = jax.jit(
            lambda la, sa, b, p, n, vv, c:
            overlap_add_i16_kernel_batch(
                (la, sa), b, p, n, vv, s0, s1, N0, N1, c, interpret=True)
        )(long_a, short_a, bf, pf, nf, v, carry)
        out_k = np.asarray(out_k).reshape(ref.shape)  # flat [T, C*outw]
        assert np.abs(ref.astype(np.int32) - out_k.astype(np.int32)).max() <= 1
        assert np.array_equal(np.asarray(len_f), np.asarray(len_k))
        for x, y in zip(car_f, car_k):
            assert np.array_equal(np.asarray(x), np.asarray(y))


def test_pallas_kernel_x_rep_variant():
    """Half-width DCT-IV inputs (x_rep=True): the kernel mirror-expands
    audio[0:M/2]=X[M/2:], audio[M/2:3M/2]=-rev(X), audio[3M/2:]=-X[:M/2]
    in VMEM. Audio built from random X by the same identity must match
    the XLA reference path bit for bit (reversal is pure data movement)."""
    rng = np.random.default_rng(4)
    s0, s1 = _slopes()
    M, m = N1 // 2, N0 // 2

    def mirror(x):  # [T, C, M'] -> [T, C, 2M'] audio
        h = x.shape[-1] // 2
        return np.concatenate([x[..., h:], -x[..., ::-1], -x[..., :h]],
                              axis=-1)

    # T=144 > MAX_ROWS exercises the multi-block pre_rev path (the extra
    # block-shifted spec_prev operands for long_rev/short_rev and the
    # kernel's xbr_ref/sbr_ref parse), which no production config below
    # 129 packets reaches (ADVICE r3)
    from lewton_tpu.ops.overlap_kernel import MAX_ROWS
    assert 144 > MAX_ROWS
    for T in (16, 48, 144):
        (_, bf, pf, nf, v), carry = _rand_case(rng, T)
        if T >= 48:
            bfm = np.ones(T, np.int32)
            bfm[::3] = 0
            bf = jnp.asarray(bfm)
            v = jnp.asarray(np.ones(T, bool))
        x1 = (rng.standard_normal((T, C, M)) * 0.5).astype(np.float32)
        x0 = (rng.standard_normal((T, C, m)) * 0.5).astype(np.float32)
        long_a = jnp.asarray(mirror(x1))
        short_a = jnp.asarray(mirror(x0))
        audio = jnp.where((bf == 1)[:, None, None], long_a,
                          jnp.pad(short_a, [(0, 0), (0, 0), (0, N1 - N0)]))
        (out_f, len_f), car_f = jax.jit(
            overlap_add_batch, static_argnums=(7, 8))(
                audio, bf, pf, nf, v, s0, s1, N0, N1, carry)
        ref = np.asarray(jnp.trunc(
            jnp.clip(out_f * 32768.0, -32768.0, 32767.0)).astype(jnp.int16))
        (out_k, len_k), car_k = jax.jit(
            lambda la, sa, b, p, n, vv, c:
            overlap_add_i16_kernel_batch(
                (la, sa), b, p, n, vv, s0, s1, N0, N1, c, x_rep=True,
                interpret=True)
        )(jnp.asarray(x1), jnp.asarray(x0), bf, pf, nf, v, carry)
        out_k = np.asarray(out_k).reshape(ref.shape)
        assert np.abs(ref.astype(np.int32) - out_k.astype(np.int32)).max() <= 1
        assert np.array_equal(np.asarray(len_f), np.asarray(len_k))
        for x, y in zip(car_f, car_k):
            assert np.array_equal(np.asarray(x), np.asarray(y))


def test_rev_lanes_mxu_bit_exact():
    """_rev_lanes_mxu == jnp.flip bit for bit on arbitrary f32 BIT
    PATTERNS — the u8-limb decomposition is pure data movement, so
    subnormals, signed zeros and huge magnitudes all survive."""
    from lewton_tpu.ops.overlap_kernel import _rev_lanes_mxu

    rng = np.random.default_rng(7)
    for L in (128, 256, 1024):
        parts = [
            rng.standard_normal((4, L)).astype(np.float32),
            (rng.standard_normal((4, L)) * 1e30).astype(np.float32),
            (rng.standard_normal((4, L)) * 1e-30).astype(np.float32),
            (rng.standard_normal((4, L)) * 1e-40).astype(np.float32),
            rng.integers(-(2**24), 2**24, (4, L)).astype(np.float32),
            np.where(rng.integers(0, 2, (4, L)) > 0,
                     np.float32(-0.0), np.float32(0.0)),
        ]
        x = np.concatenate(parts, axis=0)
        got = np.asarray(jax.jit(
            lambda v: _rev_lanes_mxu(v, L))(jnp.asarray(x)))
        want = x[:, ::-1]
        assert got.dtype == np.float32
        assert np.array_equal(
            got.view(np.uint32), want.view(np.uint32))  # bitwise


def test_pallas_kernel_x_rep_rev_mxu_bit_identical(monkeypatch):
    """REV_MXU in-kernel MXU reversal == the PRE_REV (XLA flip) kernel,
    bit for bit (i16 out, out_len, f32 carry) — both are exact reversals
    feeding the identical mix arithmetic."""
    import lewton_tpu.ops.overlap_kernel as ok

    rng = np.random.default_rng(12)
    s0, s1 = _slopes()
    M, m = N1 // 2, N0 // 2
    for T in (16, 48):
        (_, bf, pf, nf, v), carry = _rand_case(rng, T)
        x1 = jnp.asarray((rng.standard_normal((T, C, M)) * 0.5)
                         .astype(np.float32))
        x0 = jnp.asarray((rng.standard_normal((T, C, m)) * 0.5)
                         .astype(np.float32))

        def run():
            jax.clear_caches()  # kernel closure reads module knobs
            return jax.jit(
                lambda la, sa, b, p, n, vv, c:
                overlap_add_i16_kernel_batch(
                    (la, sa), b, p, n, vv, s0, s1, N0, N1, c, x_rep=True,
                    interpret=True))(x1, x0, bf, pf, nf, v, carry)

        monkeypatch.setattr(ok, "REV_MXU", False)
        (out_a, len_a), car_a = run()
        monkeypatch.setattr(ok, "REV_MXU", True)
        (out_b, len_b), car_b = run()
        assert np.array_equal(np.asarray(out_a), np.asarray(out_b))
        assert np.array_equal(np.asarray(len_a), np.asarray(len_b))
        for xa, xb in zip(car_a, car_b):
            assert np.array_equal(np.asarray(xa), np.asarray(xb))
    jax.clear_caches()


def test_read_all_i16_jax_matches_f32_path(tmp_path):
    """read_all_i16 (device i16 path) vs to_i16(read_all_planar_f32)."""
    pytest.importorskip("lewton_tpu.native")
    import tools.corpus as corpus

    from lewton_tpu import samples as samples_mod
    from lewton_tpu.inside_ogg import OggStreamReader

    root = "tests/data/corpus"
    corpus.ensure_corpus(root)
    r1 = OggStreamReader(f"{root}/stereo_44k_q3.ogg", backend="jax")
    a = r1.read_all_i16()
    r2 = OggStreamReader(f"{root}/stereo_44k_q3.ogg", backend="jax")
    b = samples_mod.to_i16(r2.read_all_planar_f32()).T
    assert a.dtype == np.int16 and a.shape == b.shape
    assert np.abs(a.astype(np.int32) - b.astype(np.int32)).max() <= 1


def test_pallas_kernel_x_split_variant():
    """Wang-split inputs (x_split=True): the kernel zips (U, V) back into
    X via the in-VMEM perfect-shuffle + combine network. Against the
    x_rep path fed the SAME X (combined in numpy f32 with the identical
    op order), outputs must be bit-identical — the permutation network is
    pure data movement and the combine is the same f32 adds."""
    rng = np.random.default_rng(11)
    s0, s1 = _slopes()
    M, m = N1 // 2, N0 // 2
    H = M // 2

    def combine(u, v):  # numpy reference of ops/overlap_kernel._combine_split
        X = np.empty(u.shape[:-1] + (M,), np.float32)
        X[..., 0] = u[..., 0]
        X[..., 1:-1:2] = u[..., 1:] - v[..., : H - 1]   # X_{2j-1}
        X[..., 2::2] = u[..., 1:] + v[..., : H - 1]     # X_{2j}
        X[..., M - 1] = -v[..., H - 1]
        return X

    for T in (16, 48):
        (_, bf, pf, nf, v), carry = _rand_case(rng, T)
        u = (rng.standard_normal((C, T, H)) * 0.5).astype(np.float32)
        vv_ = (rng.standard_normal((C, T, H)) * 0.5).astype(np.float32)
        x0 = (rng.standard_normal((C, T, m)) * 0.5).astype(np.float32)
        x1 = combine(u, vv_)
        (out_r, len_r), car_r = jax.jit(
            lambda la, sa, b, p, n, vl, c:
            overlap_add_i16_kernel_batch(
                (la, sa), b, p, n, vl, s0, s1, N0, N1, c, ct_in=True,
                x_rep=True, interpret=True)
        )(jnp.asarray(x1), jnp.asarray(x0), bf, pf, nf, v, carry)
        (out_s, len_s), car_s = jax.jit(
            lambda lu, lv, sa, b, p, n, vl, c:
            overlap_add_i16_kernel_batch(
                ((lu, lv), sa), b, p, n, vl, s0, s1, N0, N1, c, ct_in=True,
                x_rep=True, x_split=True, interpret=True)
        )(jnp.asarray(u), jnp.asarray(vv_), jnp.asarray(x0), bf, pf, nf, v,
          carry)
        assert np.array_equal(np.asarray(out_r), np.asarray(out_s))
        assert np.array_equal(np.asarray(len_r), np.asarray(len_s))
        for a, b_ in zip(car_r, car_s):
            assert np.array_equal(np.asarray(a), np.asarray(b_))

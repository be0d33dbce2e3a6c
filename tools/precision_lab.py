"""On-chip TPU matmul precision lab.

Round-3 diagnostic for the IMDCT precision scheme (VERDICT r2 weak #1):
the "high" (XLA HIGH + lo x lo correction) config failed the crafted
conformance gate, so either XLA HIGH's internal bf16 limb split is not
round-to-nearest `x - bf16(x)`, or the pass structure differs from the
assumed {hi*hi, hi*lo, lo*hi}.

Part A reverse-engineers the split: dot products of controlled vectors
under each precision, compared (in f64 on host) against closed-form
predictions for candidate decompositions.

Part B measures candidate explicit-limb schemes (operands pre-split with
round-to-nearest into bf16 limbs on device, k separate 1-pass GEMMs) for
worst-case error on adversarial full-scale spectra vs an f64 reference.

Part C times each scheme in the bench GEMM shape so the conformance/cost
frontier is measured, not assumed.

Run ON THE REAL CHIP (no args): `python tools/precision_lab.py`.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def rn_bf16(x):
    return x.astype(jnp.bfloat16).astype(jnp.float32)


def split2(x):
    """Round-to-nearest 2-limb bf16 split (limbs returned as f32)."""
    h = rn_bf16(x)
    l = rn_bf16(x - h)
    return h, l, x - h - l  # residual r: |r| <~ 2^-17|x|


def split3(x):
    h, m, r = split2(x)
    l = rn_bf16(r)
    return h, m, l, r - l


def dot_prec(a, b, prec):
    return jnp.einsum("k,k->", a, b, precision=prec,
                      preferred_element_type=jnp.float32)


def part_a():
    print("=== Part A: what does XLA HIGH actually compute? ===")
    key = jax.random.PRNGKey(0)
    K = 4096
    a = jax.random.normal(key, (K,), jnp.float32) * 100.0
    b = jax.random.normal(jax.random.PRNGKey(1), (K,), jnp.float32)

    an, bn = np.asarray(a, np.float64), np.asarray(b, np.float64)
    exact = float(an @ bn)

    meas = {}
    for name, prec in [("DEFAULT", jax.lax.Precision.DEFAULT),
                       ("HIGH", jax.lax.Precision.HIGH),
                       ("HIGHEST", jax.lax.Precision.HIGHEST)]:
        meas[name] = float(jax.jit(dot_prec, static_argnums=2)(a, b, prec))
        print(f"  measured {name:8s}: err vs f64 = {meas[name]-exact:+.6e}"
              f"  (rel {abs(meas[name]-exact)/abs(exact):.3e})")

    # candidate decompositions, evaluated in f64 so only the limb/pass
    # structure differs from exact
    def np_bf16(x):
        return np.asarray(jnp.asarray(x, jnp.float32).astype(jnp.bfloat16)
                          .astype(jnp.float32), np.float64)

    a1 = np_bf16(an); a2 = np_bf16(an - a1); a3 = np_bf16(an - a1 - a2)
    b1 = np_bf16(bn); b2 = np_bf16(bn - b1); b3 = np_bf16(bn - b1 - b2)

    preds = {
        "1p rn hi*hi": a1 @ b1,
        "3p rn {11,12,21}": a1 @ b1 + a1 @ b2 + a2 @ b1,
        "4p rn {11,12,21,22}": a1 @ b1 + a1 @ b2 + a2 @ b1 + a2 @ b2,
        "6p rn (3-limb, drop <=2^-27)": (a1 @ b1 + a1 @ b2 + a2 @ b1
                                         + a2 @ b2 + a1 @ b3 + a3 @ b1),
        "9p rn full": ((a1 + a2 + a3) @ (b1 + b2 + b3)),
    }
    for name, p in preds.items():
        print(f"  predict {name:30s}: err vs f64 = {p-exact:+.6e}")
    # match measured to predictions
    for mname, mval in meas.items():
        best = min(preds.items(), key=lambda kv: abs(kv[1] - mval))
        print(f"  {mname:8s} closest to: {best[0]}"
              f" (|delta| {abs(best[1]-mval):.3e})")


def scheme_gemms(name):
    """Return f(spectra_f32, mats) -> out where mats is a dict of
    precomputed matrix limb stacks; all GEMMs are DEFAULT precision on
    bf16 inputs (one MXU pass each)."""
    def ein(s, m):
        return jnp.einsum("tk,kn->tn", s, m,
                          precision=jax.lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)

    if name == "xla_high":
        def f(s, mats):
            return jnp.einsum("tk,kn->tn", s, mats["m"],
                              precision=jax.lax.Precision.HIGH,
                              preferred_element_type=jnp.float32)
        return f, 3
    if name == "xla_highest":
        def f(s, mats):
            return jnp.einsum("tk,kn->tn", s, mats["m"],
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
        return f, 6
    if name == "v3rn":
        def f(s, mats):
            s1 = s.astype(jnp.bfloat16)
            s2 = (s - s1.astype(jnp.float32)).astype(jnp.bfloat16)
            return (ein(s1, mats["m1"]) + ein(s1, mats["m2"])
                    + ein(s2, mats["m1"]))
        return f, 3
    if name == "v4rn":
        def f(s, mats):
            s1 = s.astype(jnp.bfloat16)
            s2 = (s - s1.astype(jnp.float32)).astype(jnp.bfloat16)
            return (ein(s1, mats["m1"]) + ein(s1, mats["m2"])
                    + ein(s2, mats["m1"]) + ein(s2, mats["m2"]))
        return f, 4
    if name == "v5rn":  # v4 + s3*m1 (spectra 3rd limb vs matrix hi limb)
        def f(s, mats):
            s1 = s.astype(jnp.bfloat16)
            r1 = s - s1.astype(jnp.float32)
            s2 = r1.astype(jnp.bfloat16)
            s3 = (r1 - s2.astype(jnp.float32)).astype(jnp.bfloat16)
            return (ein(s1, mats["m1"]) + ein(s1, mats["m2"])
                    + ein(s2, mats["m1"]) + ein(s2, mats["m2"])
                    + ein(s3, mats["m1"]))
        return f, 5
    if name == "v6rn":
        def f(s, mats):
            s1 = s.astype(jnp.bfloat16)
            r1 = s - s1.astype(jnp.float32)
            s2 = r1.astype(jnp.bfloat16)
            s3 = (r1 - s2.astype(jnp.float32)).astype(jnp.bfloat16)
            return (ein(s1, mats["m1"]) + ein(s1, mats["m2"])
                    + ein(s2, mats["m1"]) + ein(s2, mats["m2"])
                    + ein(s3, mats["m1"]) + ein(s1, mats["m3"]))
        return f, 6
    raise ValueError(name)


SCHEMES = ["xla_high", "xla_highest", "v3rn", "v4rn", "v5rn", "v6rn"]


def make_mats(m_np):
    m = jnp.asarray(m_np, jnp.float32)
    m1h, m2h, _ = split2(m)
    m3h = rn_bf16(m - m1h - m2h)
    return {
        "m": m,
        "m1": m1h.astype(jnp.bfloat16),
        "m2": m2h.astype(jnp.bfloat16),
        "m3": m3h.astype(jnp.bfloat16),
    }


def imdct_matrix(n):
    k = np.arange(n // 2, dtype=np.float64)
    j = np.arange(n, dtype=np.float64)
    return np.cos(np.pi / (2 * n) * np.outer(2 * k + 1, 2 * j + 1 + n / 2))


def part_b():
    print("=== Part B: scheme error on adversarial spectra ===")
    n = 8192
    m_np = imdct_matrix(n)
    mats = make_mats(m_np.astype(np.float32))
    T = 64
    rng = np.random.default_rng(7)
    # adversarial mixes: full-scale uniform, sign-aligned with a cosine
    # row (worst coherent accumulation), sparse spikes, exponent spread
    specs = []
    s = rng.uniform(-1, 1, (T, n // 2)).astype(np.float32) * 512
    specs.append(("uniform*512", s))
    row = np.sign(m_np[:, 1371]).astype(np.float32)
    specs.append(("coherent row", (row * 512)[None, :].repeat(T, 0)))
    s = np.zeros((T, n // 2), np.float32)
    s[:, ::37] = 16384.0
    specs.append(("spikes 16k", s))
    s = rng.uniform(-1, 1, (T, n // 2)).astype(np.float32)
    s *= np.exp2(rng.integers(-8, 12, (T, n // 2))).astype(np.float32)
    specs.append(("exp spread", s))

    m64 = m_np  # f64
    for sname, s_np in specs:
        ref = s_np.astype(np.float64) @ m64  # exact-ish f64
        # the conformance contract is on i16 samples: audio is windowed
        # and summed from two halves, each |window|<=1; a bound on the
        # pre-window error in "i16 LSB at full scale" is err*32768 only
        # if the signal were at full scale. Report relative-to-rowmax
        # in LSB-equivalents the way the gate sees it: libvorbis clamps
        # to [-1,1], so scale each row so its max |audio| is 1.0.
        scale = 1.0 / np.abs(ref).max(axis=1, keepdims=True)
        s_dev = jnp.asarray(s_np)
        line = f"  {sname:14s}:"
        for name in SCHEMES:
            f, _ = scheme_gemms(name)
            out = np.asarray(jax.jit(f)(s_dev, mats), np.float64)
            lsb = np.abs((out - ref) * scale).max() * 32768.0
            line += f"  {name}={lsb:8.2f}"
        print(line + "   [max err, i16 LSB @ row-normalized scale]")


def part_c():
    print("=== Part C: wall-clock per scheme (bench GEMM shape) ===")
    # headline shape: [C*T, K] x [K, n_out]; S=256 streams, T=128 chunk,
    # C=2, n1=2048 -> per chunk the long GEMM is [2*128, 1024]x[1024,1536]
    # per stream, batched over S. Time the einsum standalone at the
    # aggregate shape [S*C*T, K] to rank schemes (tunnel noise: iterate).
    K, n_out = 1024, 1536
    rows = 256 * 2 * 128
    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.uniform(-1, 1, (rows, K)).astype(np.float32))
    mats = make_mats(rng.uniform(-1, 1, (K, n_out)).astype(np.float32))
    for name in SCHEMES:
        f, passes = scheme_gemms(name)
        g = jax.jit(f)
        out = g(s, mats); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(10):
            out = g(s, mats)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"  {name:12s} ({passes}p): {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    print("platform:", jax.default_backend())
    part_a()
    part_b()
    part_c()

"""floor1 MXU formulation must match the reference fused-reduce version
exactly on random valid post configurations."""

import jax.numpy as jnp
import numpy as np

from lewton_tpu.ops.floor_curve import (
    BIG_X,
    floor1_curve_batch,
    floor1_curve_mxu,
    floor1_step_matrix,
)


def test_floor1_mxu_matches_reference():
    rng = np.random.RandomState(11)
    T, C, P, W, M = 24, 2, 17, 256, 2
    # static per (m, c): sorted unique x positions, first at 0, some > W
    xs_static = np.full((M, C, P), int(BIG_X), np.int32)
    nvals = np.zeros((M, C), np.int32)
    for m in range(M):
        for c in range(C):
            n = rng.randint(4, P + 1)
            vals = np.sort(rng.choice(np.arange(1, 2 * W), n - 1, replace=False))
            xs_static[m, c, :n] = np.concatenate([[0], vals])
            nvals[m, c] = n
    mode = rng.randint(0, M, T).astype(np.int32)
    xs = xs_static[mode]  # [T, C, P]
    ys = rng.randint(0, 128, (T, C, P)).astype(np.int32)
    flags = rng.rand(T, C, P) < 0.6
    flags[:, :, 0] = True
    for t in range(T):
        for c in range(C):
            flags[t, c, nvals[mode[t], c]:] = False
    mult = np.full((T, C), 2, np.int32)
    step = jnp.asarray(floor1_step_matrix(xs_static, W))
    a = np.asarray(floor1_curve_batch(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(flags),
        jnp.asarray(mult), W))
    b = np.asarray(floor1_curve_mxu(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(flags),
        jnp.asarray(mult), jnp.asarray(mode), step, W))
    np.testing.assert_array_equal(a, b)

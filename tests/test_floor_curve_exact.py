"""Exactness contracts for the shared floor1 device numerics:

- ``bresenham_idx`` (reciprocal-multiply floor-quotients) must equal the
  integer Bresenham closed form of the reference renderer
  (ref parity: lewton src/audio.rs:503-524 render_line semantics) for
  corner geometries: adx=1, maximal ady (255*4), maximal bin distance,
  both slope signs.
- ``floor1_db_value`` (4-factor compare-select product) must stay within
  the documented 2-ulp contract of the exact FLOOR1_INVERSE_DB_TABLE on
  every one of the 256 indices.
"""

import jax.numpy as jnp
import numpy as np

from lewton_tpu.ops.floor_curve import bresenham_idx, floor1_db_value
from lewton_tpu.tables import floor1_inverse_db_table


def _ref_idx(lo_x, lo_y, hi_x, hi_y, x):
    """Integer reference: y(x) on the Bresenham line, clipped to [0, 255]."""
    dy = hi_y - lo_y
    adx = max(hi_x - lo_x, 1)
    ady = abs(dy)
    base = (ady // adx) * (1 if dy >= 0 else -1)
    ady_r = ady - abs(base) * adx
    d = x - lo_x
    k = (d * ady_r) // adx
    y = lo_y + base * d + (1 if dy >= 0 else -1) * k
    return min(max(y, 0), 255)


def test_bresenham_corner_geometries():
    rng = np.random.RandomState(7)
    cases = []
    # extremes: adx=1; max ady (mult 4 * 255); max d (n1/2 = 4096 bins);
    # negative slopes; near-flat lines with tiny ady_r
    for lo_x, lo_y, hi_x, hi_y in [
        (0, 0, 1, 1020), (0, 1020, 1, 0), (0, 0, 4095, 1020),
        (0, 1020, 4095, 0), (0, 17, 4095, 19), (100, 500, 101, 501),
        (0, 0, 4095, 1), (0, 1, 4095, 0), (5, 255, 4090, 254),
    ]:
        for x in (lo_x, lo_x + 1, (lo_x + hi_x) // 2, hi_x - 1, hi_x,
                  hi_x + 50):
            cases.append((lo_x, lo_y, hi_x, hi_y, x))
    # random sweep over the full operand envelope
    for _ in range(4000):
        lo_x = int(rng.randint(0, 4000))
        hi_x = int(lo_x + rng.randint(1, 4096 - lo_x + 1))
        lo_y = int(rng.randint(0, 1021))
        hi_y = int(rng.randint(0, 1021))
        x = int(rng.randint(lo_x, 4096))
        cases.append((lo_x, lo_y, hi_x, hi_y, x))
    arr = np.array(cases, np.float32)
    got = np.asarray(bresenham_idx(
        jnp.asarray(arr[:, 0]), jnp.asarray(arr[:, 1]),
        jnp.asarray(arr[:, 2]), jnp.asarray(arr[:, 3]),
        jnp.asarray(arr[:, 4])))
    want = np.array([_ref_idx(*map(int, c)) for c in cases], np.float32)
    np.testing.assert_array_equal(got, want)


def test_bresenham_single_q_equals_split_form():
    """The r5 collapsed single-quotient render (BRES_SINGLE_Q) must be
    bit-identical to the r1-r4 split form over the full operand envelope
    (the module docstrings carry the integer-identity proof; this pins
    it empirically, both slope signs, adx=1, and past-the-post bins)."""
    import lewton_tpu.ops.floor_curve as fc

    rng = np.random.RandomState(11)
    lo_x = rng.randint(0, 4000, 20000)
    hi_x = lo_x + rng.randint(1, 4096, 20000)
    lo_y = rng.randint(0, 1021, 20000)
    hi_y = rng.randint(0, 1021, 20000)
    x = np.minimum(lo_x + rng.randint(0, 4500, 20000), 2 ** 13 - 1)
    args = [jnp.asarray(a.astype(np.float32))
            for a in (lo_x, lo_y, hi_x, hi_y, x)]
    old = fc.BRES_SINGLE_Q
    try:
        fc.BRES_SINGLE_Q = True
        got_single = np.asarray(fc.bresenham_idx(*args))
        fc.BRES_SINGLE_Q = False
        got_split = np.asarray(fc.bresenham_idx(*args))
    finally:
        fc.BRES_SINGLE_Q = old
    np.testing.assert_array_equal(got_single, got_split)


def test_db_value_within_2ulp_all_256():
    t = np.asarray(floor1_inverse_db_table(), np.float32)
    got = np.asarray(floor1_db_value(jnp.arange(256, dtype=jnp.float32)))
    ulp = np.abs(got.view(np.int32).astype(np.int64)
                 - t.view(np.int32).astype(np.int64))
    assert ulp.max() <= 2, f"db_value off by {ulp.max()} ulp"

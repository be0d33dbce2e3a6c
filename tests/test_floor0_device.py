"""floor0 device op vs the numpy reference (no encoder emits floor0, so the
device formulation is validated against the spec-tested numpy path on
random-but-valid inputs, mirroring the reference's thingy-floor0 coverage)."""

import jax.numpy as jnp
import numpy as np

from lewton_tpu.floor import DecodedFloor0, floor0_curve
from lewton_tpu.header import Floor0
from lewton_tpu.ops.floor_curve import floor0_curve_batch
from lewton_tpu.tables import bark_cos_omega


def test_floor0_batch_matches_numpy():
    rng = np.random.RandomState(7)
    rate, bms = 8000, 128
    n2 = 128
    for order in (5, 8, 13):
        fl = Floor0(order=order, rate=rate, bark_map_size=bms,
                    amplitude_bits=6, amplitude_offset=136, books=[0])
        T, C, Om = 4, 2, order
        cosc = np.cos(rng.rand(T, C, Om).astype(np.float32) * 3).astype(np.float32)
        amp = rng.randint(1, 64, (T, C)).astype(np.float32)
        cw = np.broadcast_to(
            bark_cos_omega(n2, rate, bms), (T, C, n2)).astype(np.float32)
        got = np.asarray(floor0_curve_batch(
            jnp.asarray(cosc), jnp.asarray(amp),
            jnp.full((T, C), order, jnp.int32),
            jnp.full((T, C), np.float32(136.0 / ((1 << 6) - 1))),
            jnp.full((T, C), np.float32(136.0)),
            jnp.asarray(cw),
        ))
        for t in range(T):
            for c in range(C):
                df = DecodedFloor0(cosc[t, c], int(amp[t, c]), fl)
                want = floor0_curve(df, 0, n2, rate)
                np.testing.assert_allclose(got[t, c], want, rtol=2e-4,
                                           err_msg=f"order={order}")

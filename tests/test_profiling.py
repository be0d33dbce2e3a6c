"""Profiling helpers smoke test."""

import jax.numpy as jnp

from lewton_tpu.profiling import StageTimer


def test_stage_timer():
    st = StageTimer()
    with st.stage("a"):
        x = jnp.ones(16) * 2
        st.sync(x)
    with st.stage("b"):
        pass
    rep = st.report()
    assert "a" in rep and "b" in rep and "%" in rep

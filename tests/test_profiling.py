"""Profiling helpers smoke test."""

from unittest import mock

import jax.numpy as jnp
import pytest

from lewton_tpu.profiling import StageTimer, trace


def test_trace_refuses_axon_tunnel():
    """The axon tunnel wedges the chip claim when traced (CLAUDE.md);
    trace() must refuse it unless explicitly overridden."""
    fake_dev = mock.Mock()
    fake_dev.platform = "axon"
    with mock.patch("jax.devices", return_value=[fake_dev]):
        with pytest.raises(RuntimeError, match="axon"):
            with trace("/tmp/never-created"):
                pass  # pragma: no cover


def test_trace_runs_on_cpu(tmp_path):
    """On a regular backend the guard passes through to the profiler."""
    with trace(str(tmp_path / "trace")):
        x = jnp.ones(8) + 1
        x.block_until_ready()


def test_stage_timer():
    st = StageTimer()
    with st.stage("a"):
        x = jnp.ones(16) * 2
        st.sync(x)
    with st.stage("b"):
        pass
    rep = st.report()
    assert "a" in rep and "b" in rep and "%" in rep

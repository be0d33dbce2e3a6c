"""Profiling helpers: JAX device traces + wall-clock stage timing.

The reference has no tracing framework (SURVEY.md §5) — timing there is
`Instant::now` deltas in examples/perf.rs. Here:

- :func:`trace` wraps `jax.profiler.trace` for TensorBoard-compatible
  device traces (view with `tensorboard --logdir <dir>` or xprof).
- :class:`StageTimer` collects wall-clock stage timings with proper
  device synchronization (block_until_ready), for quick chunk-level
  breakdowns without a trace viewer.

Example:
    from lewton_tpu.profiling import StageTimer
    st = StageTimer()
    with st.stage("entropy"):
        fr = sd.entropy_chunk_batch(streams)
    with st.stage("device"):
        out = decode_chunk_batch(cs, fr, carry)
        st.sync(out)
    print(st.report())
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

__all__ = ["trace", "StageTimer"]


@contextlib.contextmanager
def trace(logdir: str, *, allow_tunnel: bool = False):
    """Device + host trace (TensorBoard/xprof format).

    Refuses to start against a tunneled/proxied device backend (the
    ``axon`` platform): `jax.profiler.trace` hangs there, and killing the
    process wedges the tunnel's chip claim for hours. Profile via stage
    knockouts + wall clock instead (`tools/bisect_synth.py`,
    :class:`StageTimer`). Pass ``allow_tunnel=True`` only if you are sure
    the backend's profiler endpoint is functional.
    """
    import jax

    platform = jax.devices()[0].platform
    if platform == "axon" and not allow_tunnel:
        raise RuntimeError(
            "profiling.trace refused: backend is the 'axon' TPU tunnel, "
            "where jax.profiler.trace hangs and wedges the chip claim "
            "(see CLAUDE.md). Use tools/bisect_synth.py stage knockouts "
            "or StageTimer instead, or pass allow_tunnel=True to override."
        )
    with jax.profiler.trace(logdir):
        yield


class StageTimer:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self._t0 = None

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    @staticmethod
    def sync(tree) -> None:
        """Block until device values in `tree` are ready (call inside the
        stage that should absorb the device time)."""
        import jax

        jax.block_until_ready(tree)

    def report(self) -> str:
        total = sum(self.totals.values()) or 1e-9
        lines = [
            f"  {name:20s} {self.totals[name] * 1000:9.2f} ms "
            f"({self.totals[name] / total * 100:5.1f}%)  x{self.counts[name]}"
            for name in sorted(self.totals, key=self.totals.get, reverse=True)
        ]
        return "\n".join(lines)

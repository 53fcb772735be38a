"""Profiling & throughput utilities (SURVEY §5.1 obligation).

The reference's only instrumentation is wall-clock + MLUPS (printMlups).
Here: the same MLUPS definition (io.loggers.MlupsClock) plus a
``jax.profiler`` trace context for per-kernel TPU timing, and a relay-safe
throughput measurement helper (see .claude/skills/verify/SKILL.md for why
naive timing lies on the axon relay).
"""
from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_mlups(step_n_fn, state0, n_steps: int, nelem: int,
                  perturb=lambda s: s, reps: int = 3):
    """Throughput of ``step_n_fn`` (a jitted function advancing ``n_steps``).

    Protocol: compile+run once, then time ``reps`` runs, each on a *fresh*
    input (``perturb`` is applied cumulatively so no run's result can be a
    cached copy of a previous one), forcing completion with a small host
    readback of every output leaf.  Returns
    ``(mlups_median, ms_per_step_median, spread, last_out)`` with
    MLUPS = nelem * n_steps / seconds / 1e6 (the reference's printMlups
    definition) and ``spread = (max - min) / median`` over the reps —
    BASELINE.md records a serial-chip session spread of ~±12%, so a
    single-shot reading can't resolve smaller regressions.  This is the
    protocol behind every BASELINE.md figure; ``runners/bench_suite.py``
    drives it for all workloads.
    """
    import jax

    def sync(out):
        jax.tree_util.tree_map(lambda a: np.asarray(a.ravel()[:4]), out)

    sync(step_n_fn(state0))
    state = state0
    out = None
    dts = []
    for _ in range(max(reps, 1)):
        state = perturb(state)
        t0 = time.perf_counter()
        out = step_n_fn(state)
        sync(out)
        dts.append(time.perf_counter() - t0)
    dt = float(np.median(dts))
    spread = float((max(dts) - min(dts)) / dt)
    # last_out is the final TIMED output (cumulatively perturbed input) so
    # callers can sanity-check the very states the numbers came from
    return nelem * n_steps / dt / 1e6, dt * 1e3 / n_steps, spread, out

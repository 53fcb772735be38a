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
                  perturb=lambda s: s):
    """Throughput of ``step_n_fn`` (a jitted function advancing ``n_steps``).

    Protocol: compile+run once, then time a run on a *fresh* input (so no
    cached result can be returned) and force completion with a small host
    readback of every output leaf.  Returns ``(mlups, ms_per_step)`` with
    MLUPS = nelem * n_steps / seconds / 1e6 (the reference's printMlups
    definition).  This is the protocol behind every BASELINE.md figure;
    ``runners/bench_suite.py`` drives it for all workloads.
    """
    import jax

    def sync(out):
        jax.tree_util.tree_map(lambda a: np.asarray(a.ravel()[:4]), out)

    sync(step_n_fn(state0))
    state1 = perturb(state0)
    t0 = time.perf_counter()
    sync(step_n_fn(state1))
    dt = time.perf_counter() - t0
    return nelem * n_steps / dt / 1e6, dt * 1e3 / n_steps

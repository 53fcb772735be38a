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


def measure_mlups_slope(make_step_fn, state0, n1: int, n2: int, nelem: int,
                        perturb=lambda s: s, reps: int = 3):
    """Two-point slope throughput: cancels constant per-call overhead.

    The axon relay charges ~30 ms of dispatch + readback latency per
    jitted call regardless of work (measured round 5: 28-35 ms across six
    kernels).  A one-shot ``measure_mlups`` therefore understates short
    runs badly (combustion 420x80: 68 MLUPS one-shot vs 2399 true).
    Timing the SAME kernel at two step counts and differencing cancels
    every constant term::

        per_step = (t(n2) - t(n1)) / (n2 - n1)

    which is the steady-state device rate — the quantity the reference's
    warmup-1000/timed-2000 protocol also converges to
    (CooLBM_MRT_combustion.cpp:61-62, 4376-4380).

    ``make_step_fn(n)`` must return a jitted function advancing ``n``
    steps.  Each of the two step counts is timed with the one-shot
    protocol (median of ``reps`` fresh-input runs, small host readback).
    Returns ``(mlups, ms_per_step, spread, overhead_ms, last_out)`` where
    ``spread`` is the worst of the two medians' spreads and
    ``overhead_ms`` is the inferred constant per-call cost
    ``t(n1) - per_step * n1`` (negative values ⇒ noise-level run times —
    distrust the reading).
    """
    import jax

    def sync(out):
        jax.tree_util.tree_map(lambda a: np.asarray(a.ravel()[:4]), out)

    f1, f2 = make_step_fn(n1), make_step_fn(n2)
    for f in (f1, f2):                    # compile + warm both step counts
        sync(f(state0))

    def timed(fn):
        state, out, dts = state0, None, []
        for _ in range(max(reps, 1)):
            state = perturb(state)
            t0 = time.perf_counter()
            out = fn(state)
            sync(out)
            dts.append(time.perf_counter() - t0)
        dt = float(np.median(dts))
        return dt, float((max(dts) - min(dts)) / dt), out

    t1, s1, _ = timed(f1)
    t2, s2, out = timed(f2)
    per = (t2 - t1) / (n2 - n1)
    overhead_ms = (t1 - per * n1) * 1e3
    return (nelem / per / 1e6, per * 1e3, max(s1, s2), overhead_ms, out)

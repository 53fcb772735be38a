"""Interpreter-mode equivalence of the whole-step pulsatile kernel
(`ops/pallas_pulsatile_full`) against the XLA oracle.

Single steps agree at f32-ulp level; multi-step trajectories diverge at
the documented chaotic rate (staircase wall decisions amplify ulp
differences — models/pulsatile.py:28-30), so the multi-step check gates
statistics, not bits."""
import jax
import jax.numpy as jnp
import numpy as np

from multiphase_lbm_tpu.models import pulsatile as pm
from multiphase_lbm_tpu.ops import pallas_pulsatile_full as pf

P = pm.PulsatileParams(nx=621, ny=64)


def _state(n_warm=5):
    st = pm.initialize(P, dtype=jnp.float32)
    return pm.run(st, 0, P, n_warm), n_warm


def test_single_step_matches_xla():
    st, t = _state()
    ref = pm.step(st, t, P)
    out, dg = pf.run_fused_full(st, t, P, 1, nsub=1, interpret=True)
    for name, tol in (("g_coll", 5e-7), ("g_stream", 5e-7), ("P", 5e-7),
                      ("Ux", 5e-7), ("Uy", 5e-7), ("F", 1e-4),
                      ("yr1", 5e-5), ("yr2", 5e-5)):
        a = np.asarray(getattr(ref, name), np.float64)
        b = np.asarray(getattr(out, name), np.float64)
        assert np.abs(a - b).max() < tol, name
    assert float(dg[0, 0]) == 0.0          # warm state: order-independent
    assert float(dg[1, 0]) > 0.0           # walls moved → fresh cells


def test_nsub_batching_is_step_exact():
    """nsub only changes launch batching, not the math (the scan-vs-
    fori_loop compilation difference reassociates at the ulp level —
    observed max 7.5e-9 over 4 steps in interpret mode)."""
    st, t = _state()
    a, _ = pf.run_fused_full(st, t, P, 4, nsub=1, interpret=True)
    b, _ = pf.run_fused_full(st, t, P, 4, nsub=4, interpret=True)
    np.testing.assert_allclose(np.asarray(a.g_stream),
                               np.asarray(b.g_stream), atol=1e-7, rtol=0)
    np.testing.assert_allclose(np.asarray(a.F), np.asarray(b.F),
                               atol=1e-5, rtol=0)


def test_multi_step_statistics_track_xla():
    """Over 12 steps the chaotic divergence stays small in the bulk
    statistics even though individual near-wall cells differ."""
    st, t = _state()
    ref = pm.run(st, t, P, 12)
    out, dg = pf.run_fused_full(st, t, P, 12, nsub=4, interpret=True)
    # wall envelope
    assert np.abs(np.asarray(ref.yr1) - np.asarray(out.yr1)).max() < 0.05
    assert np.abs(np.asarray(ref.yr2) - np.asarray(out.yr2)).max() < 0.05
    # bulk pressure field statistics
    m = np.asarray(ref.fluid) & np.asarray(out.fluid)
    dP = np.abs(np.asarray(ref.P) - np.asarray(out.P))[m]
    assert dP.mean() < 2e-4

"""Full-archived-run statistical regression for the pulsatile vessel.

The reference ships a complete run of the severed compliant-vessel case
(103 ``sol_*.vtk`` dumps to t=2754 under ``Abbashub LBM/out_single-phase
fluid flow through a compliant vessel/`` — SURVEY §2.1 row 16).  Early
steps match bit-near-exactly (tests/test_pulsatile.py gates t=0 and
t=27 at output precision); over the full run the near-closed inlet
region is chaotic (staircase wall decisions amplify FP association
noise, models/pulsatile.py:28-30), so the whole-run comparison is
STATISTICAL:

* wall-position envelope: fluid extent per column from the Flag field;
* inlet pressure-wave amplitude and phase at a probe column;
* per-dump fluid-masked field statistics (mean/std of P, Ux).

Usage:  python -m multiphase_lbm_tpu.validation.pulsatile_fullrun
[f32|fused] — f64 XLA on CPU by default; ``f32`` runs the XLA path at
the TPU production dtype on the real chip; ``fused`` runs the
production whole-step Pallas kernel (also f32, on the chip).
The pytest gate (tests/test_pulsatile_fullrun.py) runs the f64
comparison on CPU.

Reference: PulsatileBloodFlow2D.h:680-716 (saveVtkFields), :764-791
(step order; dump after the macro update of the same iteration).
"""
from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

GOLD = Path("/root/reference/Abbashub LBM/"
            "out_single-phase fluid flow through a compliant vessel")
DUMP_EVERY = 27
N_DUMPS = 103
PROBE_X = 31          # inlet-region probe column (past the severed throat)


def _dump_indices(cadence):
    # dump 1 (t=27) is always included: it anchors the bit-near-exact
    # EARLY regime gate even at reduced cadence
    return sorted({0, 1} | set(range(0, N_DUMPS, cadence)))


def golden_metrics(cadence=1):
    """Parse every ``cadence``-th archived dump into the metric set."""
    from ..io import vtk

    out = []
    for i in _dump_indices(cadence):
        t = i * DUMP_EVERY
        g = vtk.read_vtk_fields(GOLD / f"sol_{t:07d}.vtk")
        fluid = g["Flag"].astype(int) == 0
        out.append(_metrics(g["P"], g["Ux"], fluid, t))
    return out


def _metrics(P, Ux, fluid, t):
    ny, nx = P.shape
    cols = fluid.sum(axis=0)                      # fluid extent per column
    rows = np.arange(ny)[:, None]
    lo = np.where(fluid, rows, ny).min(axis=0)    # first fluid row
    hi = np.where(fluid, rows, -1).max(axis=0)    # last fluid row
    m = fluid.sum() > 0
    Pm = P[fluid].mean() if m else 0.0
    Ps = P[fluid].std() if m else 0.0
    Um = Ux[fluid].mean() if m else 0.0
    Us = np.abs(Ux[fluid]).max() if m else 0.0
    pc = fluid[:, PROBE_X]
    P_probe = P[pc, PROBE_X].mean() if pc.any() else 0.0
    return dict(t=t, extent=cols, lo=lo, hi=hi, P_mean=Pm, P_std=Ps,
                Ux_mean=Um, Ux_absmax=Us, P_probe=P_probe)


def simulate_metrics(dtype="f64", cadence=1, progress=False, path="xla",
                     interpret=False):
    """Run the full 2765-step reference case and collect the same metrics
    at every ``cadence``-th dump instant.  ``path='fused'`` drives the
    production whole-step Pallas kernel (ops/pallas_pulsatile_full, f32)
    instead of the XLA oracle.

    Returns ``(metrics, diag)``; for the fused path ``diag`` totals the
    kernel's deviation counters over the whole run —
    ``order_dep_steps`` (steps whose reseed was order-dependent and was
    filled densely instead of sequentially, the kernel's one documented
    deviation from the oracle) and ``reseed_cells`` — so the deviation
    can be gated instead of silently growing.  ``diag`` is None for the
    XLA path (its sequential fallback is exact)."""
    import jax
    import jax.numpy as jnp

    from ..models import pulsatile as pm

    if path == "fused":
        from ..ops import pallas_pulsatile_full as pfull
        dtype = "f32"
    dt = jnp.float64 if dtype == "f64" else jnp.float32
    N = 64
    p = pm.PulsatileParams(nx=1 + 10 * (N - 2), ny=N)
    st = pm.initialize(p, dtype=dt)
    st = pm.step(st, 0, p)                       # dump 0 is after 1 step
    out = []
    diag = {"order_dep_steps": 0, "reseed_cells": 0} if path == "fused" \
        else None
    keep = set(_dump_indices(cadence))
    if path == "fused":
        run27 = jax.jit(
            lambda s, t: pfull.run_fused_full(s, t, p, DUMP_EVERY,
                                              interpret=interpret))
    else:
        run27 = jax.jit(lambda s, t: pm.run(s, t, p, DUMP_EVERY))
    for i in range(N_DUMPS):
        t = i * DUMP_EVERY
        if i:
            if path == "fused":
                st, dg = run27(st, 1 + (i - 1) * DUMP_EVERY)
                diag["order_dep_steps"] += int(dg[0, 0])
                diag["reseed_cells"] += int(dg[1, 0])
            else:
                st = run27(st, 1 + (i - 1) * DUMP_EVERY)
        if i in keep:
            fluid = np.asarray(st.fluid)
            out.append(_metrics(np.asarray(st.P), np.asarray(st.Ux),
                                fluid, t))
            if progress and i % 20 == 0:
                print(f"  dump {i}/{N_DUMPS}", flush=True)
    return out, diag


def compare(sim, gold):
    """Comparison table.  The run has three regimes (measured, f64):

    * EARLY (t ≤ 27): bit-near-exact — wall rows identical.  (The first
      staircase flip appears at t=54: max 2 rows; errors ramp through
      the transient, spiking to ~50 rows around t≈500.)
    * TRANSIENT (t ≈ 300–2400): chaotic — staircase wall decisions
      amplify ulp noise into transient wall-row differences (mean ≈ 1–2
      cells, spikes to ~50 during the violent relaxation at t≈500), while
      the pressure WAVE (the physical observable) stays in lock step
      (probe rms ~1e-5, amplitude to 4e-6, zero phase lag).
    * LATE (t ≥ ~2580): the orbits re-converge — wall rows agree exactly
      again at the final dumps (the severed outlet drains the vessel into
      a quiescent state both trajectories share).

    Gates therefore split by regime; the wave metrics gate the whole run.
    """
    assert len(sim) == len(gold)

    def wall_err(s, g):
        # Sentinels (all-solid column): lo = ny, hi = -1.  A column solid
        # in BOTH trajectories contributes 0; one solid in only ONE
        # contributes an O(ny) error — deliberately: it IS a wall
        # disagreement the late-regime gate must see.
        return np.maximum(np.abs(s["lo"] - g["lo"]),
                          np.abs(s["hi"] - g["hi"])).astype(float)

    n = len(sim)
    early = [i for i in range(n) if sim[i]["t"] <= 27]
    late = [i for i in range(n) if sim[i]["t"] >= 2580]
    wall_all = np.concatenate([wall_err(sim[i], gold[i])
                               for i in range(n)])
    wall_early = np.concatenate([wall_err(sim[i], gold[i])
                                 for i in early]) if early else wall_all
    wall_late = np.concatenate([wall_err(sim[i], gold[i])
                                for i in late]) if late else wall_all
    dP_late = max(abs(sim[i]["P_mean"] - gold[i]["P_mean"])
                  for i in late) if late else 0.0
    dUx_late = max(abs(sim[i]["Ux_absmax"] - gold[i]["Ux_absmax"])
                   for i in late) if late else 0.0

    Pp_sim = np.array([s["P_probe"] for s in sim])
    Pp_gold = np.array([g["P_probe"] for g in gold])
    # oscillatory tail (Pin waveform active after t_start ≈ 2144)
    k0 = next((i for i in range(n) if sim[i]["t"] >= 2144), n - 4)
    amp_s = Pp_sim[k0:].max() - Pp_sim[k0:].min()
    amp_g = Pp_gold[k0:].max() - Pp_gold[k0:].min()
    a = Pp_sim[k0:] - Pp_sim[k0:].mean()
    b = Pp_gold[k0:] - Pp_gold[k0:].mean()
    lags = range(-3, 4)
    cc = [np.correlate(np.roll(a, l), b)[0] for l in lags]
    lag = list(lags)[int(np.argmax(cc))]
    rms_tail = float(np.sqrt(((Pp_sim[k0:] - Pp_gold[k0:]) ** 2).mean()))
    return {
        "probe_rms_tail": rms_tail,
        "wall_early_max_err": float(wall_early.max()),
        "wall_late_max_err": float(wall_late.max()),
        "wall_global_mean_err": float(wall_all.mean()),
        "P_mean_late_err": float(dP_late),
        "Ux_absmax_late_err": float(dUx_late),
        "wave_amp_rel_err": float(abs(amp_s - amp_g)
                                  / max(abs(amp_g), 1e-12)),
        "wave_phase_lag_dumps": int(lag),
        "probe_rms": float(np.sqrt(((Pp_sim - Pp_gold) ** 2).mean())),
    }


# stated tolerances (~2× the measured f64 deviations; chaotic mid-run ⇒
# statistical gating, see compare())
GATES = {
    "wall_early_max_err": 1.0,       # cells — bit-near-exact regime
    "wall_late_max_err": 2.0,        # cells — re-converged regime
    "wall_global_mean_err": 3.0,     # cells incl. the chaotic transient
    "P_mean_late_err": 1e-3,         # pressure LU (p_osc = 2e-3)
    "Ux_absmax_late_err": 2e-3,
    "wave_amp_rel_err": 0.1,
    "probe_rms": 3e-4,
}

# f32 production paths (XLA-f32 / fused kernel on the TPU): the staircase
# chaos starts at the FIRST wall update (no bit-exact early regime to
# gate) and the late orbits re-converge only to within a few cells, so
# the f32 gates drop the early gate, loosen the wall envelopes, and
# anchor on the physical observables: the inlet pressure wave in the
# oscillatory tail (amplitude/phase/tail-rms) and the late field values.
GATES_F32 = {
    "wall_late_max_err": 4.0,
    "wall_global_mean_err": 3.0,
    "P_mean_late_err": 1e-3,
    "Ux_absmax_late_err": 2e-3,
    "wave_amp_rel_err": 0.1,
    "probe_rms_tail": 1e-3,
}

# Envelope on the fused kernel's ONE documented deviation from the oracle:
# steps whose reseed was order-dependent (ring-search fill or fresh edge
# source) and was filled densely instead of exactly-sequentially
# (ops/pallas_pulsatile_full.py:44-50).  Measured over the full 2765-step
# f32 run: 6 order-dependent steps out of 2764 (110539 reseeded cells
# total; CPU interpret-mode capture 2026-08-18).  Gated at 2× measured —
# the count is trajectory-chaotic, but a kernel edit that silently grows
# the deviation regime fails here.
ORDER_DEP_STEPS_MAX = 12


def check(table, gates=GATES):
    ok = True
    for k, tol in gates.items():
        v = table[k]
        good = v <= tol
        ok &= good
        print(f"  {k}: {v:.5g} (tol {tol}) {'PASS' if good else 'FAIL'}")
    lag_ok = abs(table["wave_phase_lag_dumps"]) <= 1
    print(f"  wave_phase_lag_dumps: {table['wave_phase_lag_dumps']}"
          f" (tol ±1) {'PASS' if lag_ok else 'FAIL'}")
    return ok and lag_ok


def main():
    dtype = "f32" if "f32" in sys.argv[1:] else "f64"
    path = "fused" if "fused" in sys.argv[1:] else "xla"
    if path == "fused":
        dtype = "f32"
    if dtype == "f64":
        # f64 runs on CPU (the axon TPU platform is f32-only); the f32
        # modes keep the default platform = the real chip
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    cadence = 1
    print(f"simulating full reference run ({dtype}, {path} path)…",
          flush=True)
    sim, diag = simulate_metrics(dtype=dtype, cadence=cadence,
                                 progress=True, path=path)
    gold = golden_metrics(cadence=cadence)
    table = compare(sim, gold)
    ok = check(table, GATES if dtype == "f64" else GATES_F32)
    if diag is not None:
        n, cells = diag["order_dep_steps"], diag["reseed_cells"]
        dep_ok = n <= ORDER_DEP_STEPS_MAX
        ok &= dep_ok
        print(f"  order_dep_reseed_steps: {n} (tol "
              f"{ORDER_DEP_STEPS_MAX}) {'PASS' if dep_ok else 'FAIL'}"
              f"  [reseed_cells={cells}]")
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

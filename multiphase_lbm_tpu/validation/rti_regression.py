"""RTI literature regression: run the HCZ Rayleigh-Taylor case and compare
spike/bubble trajectories against the digitized published curves the
reference validates with (SURVEY §4.3).

Usage (TPU, ~1 min to t=2):

    python -m multiphase_lbm_tpu.validation.rti_regression [t_end] [N]
"""
from __future__ import annotations

import sys

import numpy as np

from ..io.config import lb_parameters
from ..models import hcz
from . import rti_reference as ref


def run_regression(t_end=2.0, N=256, dtype=None, log_every=0.05):
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    nu, omega, dx, dt = lb_parameters(0.04, N, 3000.0)
    p = hcz.HCZParams(omega=omega, gravity=-6.25e-6, kappa=0.01)
    ny = 4 * N + 2
    state = hcz.init_rayleigh_taylor(N, ny, p, dtype=dtype)
    fluid = hcz.geometry_channel(N, ny)
    state = hcz.apply_geometry(state, fluid)

    chunk = max(1, int(round(log_every / dt)))
    times, spikes, bubbles = [], [], []
    it = 0
    steps_total = int(t_end / dt)
    while it < steps_total:
        state = hcz.run(state, fluid, p, chunk)
        it += chunk
        phi = np.asarray(hcz.order_parameter(state[0]))
        s, b = hcz.interface_heights(phi, p)
        times.append(it * dt)
        spikes.append(s * dx - 2.0)     # shift by the initial interface
        bubbles.append(b * dx - 2.0)
    return np.array(times), np.array(spikes), np.array(bubbles)


def compare(times, heights, ref_t, ref_y):
    """Max |sim − published| over the overlapping time range."""
    ref_t = np.asarray(ref_t)
    ref_y = np.asarray(ref_y)
    lo, hi = max(times.min(), ref_t.min()), min(times.max(), ref_t.max())
    mask = (ref_t >= lo) & (ref_t <= hi)
    interp = np.interp(ref_t[mask], times, heights)
    return float(np.abs(interp - ref_y[mask]).max())


def main():
    t_end = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    times, spikes, bubbles = run_regression(t_end=t_end, N=N)
    ds = compare(times, spikes, ref.x_spike_256, ref.y_spike_256)
    db = compare(times, bubbles, ref.x_bubble_256, ref.y_bubble_256)
    print(f"t_end={t_end} N={N}")
    print(f"max |spike - literature|  = {ds:.4f} (domain heights)")
    print(f"max |bubble - literature| = {db:.4f}")
    ok = ds < 0.15 and db < 0.15
    print("RESULT:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

"""Physics acceptance tests for the Fakhari conservative phase-field solver.

Reference observables: Laplace pressure jump for the stationary bubble with
the σ/R correction built into the init (Young_Laplace2D.h:160-167), exact
phase-field conservation, bounded kinetic energy at density ratio 1000.
"""
import jax.numpy as jnp
import numpy as np

from multiphase_lbm_tpu.models import fakhari as fk


def _setup(N=64, **kw):
    p = fk.FakhariParams(**kw)
    state = fk.init_bubble(N, N, p, dtype=jnp.float64)
    return p, state


def test_phase_field_conserved_exactly():
    """Conservative PF: Σφ is invariant to machine precision."""
    p, state = _setup()
    m0 = float(fk.total_mass(state, p))
    state = fk.run(state, p, 200)
    m1 = float(fk.total_mass(state, p))
    assert abs(m1 - m0) / m0 < 1e-12


def test_bubble_stays_centered_and_sharp():
    p, state = _setup()
    state = fk.run(state, p, 1000)
    C = np.asarray(fk.phase_field(state))
    assert C[32, 32] < 0.05          # light phase inside
    assert C[2, 2] > 0.95            # heavy outside
    assert np.isfinite(C).all()


def test_laplace_pressure_jump():
    """p = p* ρ/3; bubble interior must sit σ/R above exterior."""
    p, state = _setup()
    state = fk.run(state, p, 2000)
    C = np.asarray(fk.phase_field(state))
    Pstar = np.asarray(fk.pressure(state))
    rho = p.rhol + C * (p.rhoh - p.rhol)
    pphys = Pstar * rho / 3.0
    dp = pphys[32, 32] - pphys[2, 2]
    expected = p.sigma / (64 / 8.0)
    assert dp > 0
    assert abs(dp - expected) / expected < 0.35, (dp, expected)


def test_density_ratio_1000_stable():
    """ρ_H/ρ_L = 1000 (the reference's config) stays finite and quiescent."""
    p, state = _setup()
    state = fk.run(state, p, 500)
    e = float(fk.kinetic_energy(state))
    assert np.isfinite(e)
    assert e < 1e-5, e  # spurious currents only


def test_f32_path_runs():
    p = fk.FakhariParams()
    state = fk.init_bubble(48, 48, p, dtype=jnp.float32)
    state = fk.run(state, p, 200)
    assert np.isfinite(np.asarray(fk.phase_field(state))).all()

"""Physics acceptance tests for the Shan–Chen single-component solver.

Mirrors the reference's manual verification observables (SURVEY §4):
Laplace pressure jump, mass conservation, coexistence densities, wetting.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from multiphase_lbm_tpu.models import shan_chen as sc


def _laplace_setup(nx=64, ny=64, radius=10.0, tau=1.0):
    p = sc.SCParams(omega=1.0 / tau)
    f = sc.init_droplet(nx, ny, p, radius=radius, dtype=jnp.float64)
    fluid = sc.geometry_periodic(nx, ny)
    return p, f, fluid


def test_mass_conserved_exactly():
    p, f, fluid = _laplace_setup()
    m0 = float(sc.total_mass(f, fluid))
    f1 = sc.run(f, fluid, p, 200)
    m1 = float(sc.total_mass(f1, fluid))
    assert abs(m1 - m0) / m0 < 1e-12


def test_droplet_coexistence_densities():
    """After relaxation the droplet/vapor densities approach the book's
    coexistence values for TT0=0.875 (rhol≈0.265, rhog≈0.038)."""
    p, f, fluid = _laplace_setup()
    f = sc.run(f, fluid, p, 2000)
    rho = np.asarray(sc.density(f))
    rho_in = rho[32, 32]
    rho_out = rho[2, 2]
    assert abs(rho_in - p.rhol) / p.rhol < 0.12, rho_in
    assert abs(rho_out - p.rhog) / p.rhog < 0.25, rho_out
    # sharp interface retained
    assert rho_in / rho_out > 4.0


def test_laplace_pressure_jump_scales_inversely_with_radius():
    """ΔP = σ/R in 2D: two radii must give ΔP ratio ≈ R2/R1."""
    dps = {}
    for radius in (8.0, 14.0):
        p, f, fluid = _laplace_setup(radius=radius)
        f = sc.run(f, fluid, p, 3000)
        pr = np.asarray(sc.node_pressure(f, p))
        dps[radius] = pr[32, 32] - pr[2, 2]
    assert dps[8.0] > 0 and dps[14.0] > 0
    ratio = dps[8.0] / dps[14.0]
    # ideal 14/8 = 1.75; allow generous solver tolerance (interface width,
    # discrete radius redefinition after relaxation)
    assert 1.2 < ratio < 2.4, (dps, ratio)


def test_spurious_currents_bounded():
    p, f, fluid = _laplace_setup()
    f = sc.run(f, fluid, p, 2000)
    u = np.asarray(sc.u_actual(f, fluid, p))
    umax = np.abs(u).max()
    assert umax < 0.05, umax  # typical SC spurious-current magnitude ≤ O(1e-2)


def test_wetting_droplet_contact_angle():
    """Droplet on bottom wall relaxes to a measurable contact angle
    (reference contactAngle2D workload, config: rho_w=0.2, tau=1)."""
    nx, ny = 100, 50
    p = sc.SCParams(omega=1.0, rho_w=0.2)
    f = sc.init_droplet(nx, ny, p, radius=12.0, center=(nx / 2, 5.0),
                        dtype=jnp.float64)
    fluid = sc.geometry_channel_walls(nx, ny)
    f = sc.apply_geometry(f, fluid)
    f = sc.run(f, fluid, p, 2000)
    rho = np.asarray(sc.density(f))
    res = sc.contact_angle(rho, np.asarray(fluid), p.rhol, p.rhog)
    assert res is not None
    base, height, theta = res
    assert base > 2 and height > 2
    assert 10.0 < theta < 170.0
    # mass still conserved with walls present
    m = float(sc.total_mass(f, fluid))
    assert m > 0


def test_step_is_jit_stable_f32():
    """Production dtype path (f32) runs and stays finite."""
    p = sc.SCParams()
    f = sc.init_droplet(48, 48, p, radius=8.0, dtype=jnp.float32)
    fluid = sc.geometry_periodic(48, 48)
    f = sc.run(f, fluid, p, 300)
    assert np.isfinite(np.asarray(f)).all()

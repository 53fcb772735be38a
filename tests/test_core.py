"""Core-layer unit tests: lattice descriptors, streaming, stencils, MRT matrices."""
import jax.numpy as jnp
import numpy as np
import pytest

from multiphase_lbm_tpu.core import collision, eos, stencil, streaming
from multiphase_lbm_tpu.core.lattice import D2Q9, D3Q19, JB_I, K_FROM_I, EX_I, EY_I


def test_d2q9_descriptor():
    assert D2Q9.q == 9 and D2Q9.d == 2
    np.testing.assert_array_equal(D2Q9.opp, [5, 6, 7, 8, 4, 0, 1, 2, 3])
    # k=4 is rest
    np.testing.assert_array_equal(D2Q9.c[4], [0, 0])
    assert np.isclose(D2Q9.w.sum(), 1.0)
    # second moment isotropy: sum w c c = cs2 I
    m2 = np.einsum("k,kd,ke->de", D2Q9.w, D2Q9.c, D2Q9.c)
    np.testing.assert_allclose(m2, np.eye(2) / 3.0, atol=1e-14)


def test_d3q19_descriptor():
    assert D3Q19.q == 19 and D3Q19.d == 3
    np.testing.assert_array_equal(D3Q19.c[9], [0, 0, 0])
    m2 = np.einsum("k,kd,ke->de", D3Q19.w, D3Q19.c, D3Q19.c)
    np.testing.assert_allclose(m2, np.eye(3) / 3.0, atol=1e-14)
    np.testing.assert_array_equal(
        D3Q19.opp, [10, 11, 12, 13, 14, 15, 16, 17, 18, 9, 0, 1, 2, 3, 4, 5, 6, 7, 8])


def test_abbas_i_maps():
    np.testing.assert_array_equal(D2Q9.c[K_FROM_I, 0], EX_I)
    np.testing.assert_array_equal(D2Q9.c[K_FROM_I, 1], EY_I)
    # JB is opposite in I-space
    np.testing.assert_array_equal(EX_I[JB_I], -EX_I)
    np.testing.assert_array_equal(EY_I[JB_I], -EY_I)


def test_stream_periodic_moves_single_pulse():
    ny, nx = 8, 16
    post = jnp.zeros((9, ny, nx))
    post = post.at[:, 3, 5].set(1.0)
    out = streaming.stream_periodic(post, D2Q9)
    for k in range(9):
        cx, cy = D2Q9.c[k]
        assert out[k, (3 + cy) % ny, (5 + cx) % nx] == 1.0
        assert out[k].sum() == 1.0


def test_stream_bounce_back_reverses_at_wall():
    ny, nx = 6, 8
    fluid = np.ones((ny, nx), dtype=bool)
    fluid[0] = fluid[-1] = False
    fluid = jnp.asarray(fluid)
    post = jnp.zeros((9, ny, nx))
    # population moving +y (k=6, c=(0,1)) at the last fluid row
    post = post.at[6, ny - 2, 3].set(1.0)
    out = streaming.stream_bounce_back(post, fluid, D2Q9)
    # bounced into opp direction (k=1, c=(0,-1)) at the same cell
    assert out[1, ny - 2, 3] == 1.0
    assert out[6].sum() == 0.0
    # mass conserved over fluid
    assert out.sum() == 1.0


def test_stream_bounce_back_conserves_mass_random():
    rng = np.random.default_rng(0)
    ny, nx = 10, 12
    fluid = np.ones((ny, nx), dtype=bool)
    fluid[0] = fluid[-1] = False
    fluid[4, 6] = False  # interior obstacle
    f = rng.random((9, ny, nx)) * fluid[None]
    out = streaming.stream_bounce_back(jnp.asarray(f), jnp.asarray(fluid), D2Q9)
    np.testing.assert_allclose(float(out.sum()), f.sum(), rtol=1e-13)
    # solids stay empty
    assert float(jnp.abs(out[:, ~np.asarray(fluid)]).sum()) == 0.0


def test_isotropic_gradient_matches_9pt_formula():
    rng = np.random.default_rng(1)
    q = rng.random((12, 14))
    gx, gy = np.asarray(stencil.isotropic_gradient(jnp.asarray(q), D2Q9))
    E, W = np.roll(q, -1, 1), np.roll(q, 1, 1)
    N, S = np.roll(q, -1, 0), np.roll(q, 1, 0)
    NE = np.roll(np.roll(q, -1, 0), -1, 1)
    NW = np.roll(np.roll(q, -1, 0), 1, 1)
    SE = np.roll(np.roll(q, 1, 0), -1, 1)
    SW = np.roll(np.roll(q, 1, 0), 1, 1)
    # reference Young_Laplace2D.h:313-321
    np.testing.assert_allclose(gx, (E - W) / 3.0 + (SE + NE - SW - NW) / 12.0, atol=1e-13)
    np.testing.assert_allclose(gy, (N - S) / 3.0 + (NW + NE - SW - SE) / 12.0, atol=1e-13)


def test_laplacian_matches_9pt_formula():
    rng = np.random.default_rng(2)
    q = rng.random((9, 11))
    lap = np.asarray(stencil.lattice_laplacian(jnp.asarray(q), D2Q9))
    E, W = np.roll(q, -1, 1), np.roll(q, 1, 1)
    N, S = np.roll(q, -1, 0), np.roll(q, 1, 0)
    NE = np.roll(np.roll(q, -1, 0), -1, 1)
    NW = np.roll(np.roll(q, -1, 0), 1, 1)
    SE = np.roll(np.roll(q, 1, 0), -1, 1)
    SW = np.roll(np.roll(q, 1, 0), 1, 1)
    # reference Young_Laplace2D.h:323-331
    expect = (SW + SE + NW + NE + 4.0 * (S + W + E + N) - 20.0 * q) / 6.0
    np.testing.assert_allclose(lap, expect, atol=1e-13)


def test_gradient_of_linear_field_is_exact():
    ny, nx = 16, 16
    X, Y = np.meshgrid(np.arange(nx, dtype=float), np.arange(ny, dtype=float))
    q = 2.0 * X + 3.0 * Y
    g = np.asarray(stencil.isotropic_gradient(jnp.asarray(q), D2Q9))
    # interior (periodic wrap corrupts edges only)
    np.testing.assert_allclose(g[0][2:-2, 2:-2], 2.0, atol=1e-12)
    np.testing.assert_allclose(g[1][2:-2, 2:-2], 3.0, atol=1e-12)


def test_mirrored_stencil_uses_inner_value_at_walls():
    ny, nx = 8, 8
    fluid = np.ones((ny, nx), dtype=bool)
    fluid[0] = fluid[-1] = False
    q = np.arange(ny * nx, dtype=float).reshape(ny, nx)
    vals = np.asarray(stencil.neighbor_values(jnp.asarray(q), D2Q9, jnp.asarray(fluid)))
    # k=6 is c=(0,1): at row ny-2 the +y neighbor (wall row) must be replaced
    # by the mirrored row ny-3 value
    np.testing.assert_allclose(vals[6, ny - 2], q[ny - 3])
    # and in the bulk it is the true neighbor
    np.testing.assert_allclose(vals[6, 3], q[4])


def test_mrt_matrices_are_inverse_pair():
    A = collision.MRT_M_I @ collision.MRT_M_I_INV
    np.testing.assert_allclose(A, np.eye(9), atol=1e-12)


def test_mrt_reconvert_matches_reference_formulas():
    """Check M⁻¹ reproduces the hand-coded RECONVERT (PulsatileBloodFlow2D.h:520-531)."""
    rng = np.random.default_rng(3)
    IN = rng.random(9)
    C0, C7, C8 = IN[0] / 9.0, IN[7] / 4.0, IN[8] / 4.0
    OUT = np.empty(9)
    OUT[0] = C0 - (IN[1] - IN[2]) / 9.0
    OUT[1] = C0 - (IN[1] + 2 * IN[2]) / 36.0 + (IN[3] - IN[4]) / 6.0 + C7
    OUT[2] = C0 - (IN[1] + 2 * IN[2]) / 36.0 + (IN[5] - IN[6]) / 6.0 - C7
    OUT[3] = C0 - (IN[1] + 2 * IN[2]) / 36.0 - (IN[3] - IN[4]) / 6.0 + C7
    OUT[4] = C0 - (IN[1] + 2 * IN[2]) / 36.0 - (IN[5] - IN[6]) / 6.0 - C7
    OUT[5] = C0 + (IN[2] + 2 * IN[1]) / 36.0 + (IN[3] + IN[5]) / 6.0 + (IN[4] + IN[6]) / 12.0 + C8
    OUT[6] = C0 + (IN[2] + 2 * IN[1]) / 36.0 - (IN[3] - IN[5]) / 6.0 - (IN[4] - IN[6]) / 12.0 - C8
    OUT[7] = C0 + (IN[2] + 2 * IN[1]) / 36.0 - (IN[3] + IN[5]) / 6.0 - (IN[4] + IN[6]) / 12.0 + C8
    OUT[8] = C0 + (IN[2] + 2 * IN[1]) / 36.0 + (IN[3] - IN[5]) / 6.0 + (IN[4] - IN[6]) / 12.0 - C8
    np.testing.assert_allclose(collision.MRT_M_I_INV @ IN, OUT, atol=1e-12)


def test_mrt_collide_with_unit_S_equals_full_relaxation():
    rng = np.random.default_rng(4)
    f = jnp.asarray(rng.random((9, 4, 4)))
    feq = jnp.asarray(rng.random((9, 4, 4)))
    out = collision.mrt_collide(f, feq, np.ones(9))
    np.testing.assert_allclose(np.asarray(out), np.asarray(feq), atol=1e-12)


def test_equilibrium_zeroth_first_moments():
    rng = np.random.default_rng(5)
    rho = jnp.asarray(1.0 + rng.random((6, 7)))
    u = jnp.asarray(0.05 * rng.standard_normal((2, 6, 7)))
    feq = collision.equilibrium(rho, u, D2Q9)
    np.testing.assert_allclose(np.asarray(feq.sum(0)), np.asarray(rho), atol=1e-13)
    c = jnp.asarray(D2Q9.c, dtype=feq.dtype)
    mom = jnp.einsum("kd,kyx->dyx", c, feq)
    np.testing.assert_allclose(np.asarray(mom), np.asarray(rho[None] * u), atol=1e-13)


def test_yuan_eos_psi_positive_between_coexistence():
    p_a, p_b, p_R = 1.0, 4.0, 1.0
    T = 0.875 * eos.yuan_Tc(p_a, p_b, p_R)
    for rho in (0.038, 0.1, 0.265):
        psi = float(eos.yuan_psi(jnp.asarray(rho), p_a, p_R, T))
        assert psi >= 0.0
    # Maxwell-ish: pressure at coexistence densities approximately equal
    p_l = float(eos.yuan_pressure(jnp.asarray(0.265), p_a, p_R, T))
    p_g = float(eos.yuan_pressure(jnp.asarray(0.038), p_a, p_R, T))
    assert abs(p_l - p_g) < 0.15 * max(abs(p_l), abs(p_g)) + 1e-4

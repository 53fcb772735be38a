"""√n-remat adjoint loop: same values AND same gradients as plain scan."""
import jax
import jax.numpy as jnp
import numpy as np

from multiphase_lbm_tpu.core.precision import einsum
from multiphase_lbm_tpu.models import hcz, shan_chen_rt as rt
from multiphase_lbm_tpu.utils.adjoint import scan_remat


def test_scan_remat_matches_plain_scan_values_and_grads():
    """Gradient of kinetic energy w.r.t. gravity through 23 SC-RT steps
    (a non-square count: exercises the outer/remainder split) is identical
    whether the loop saves every state or √n checkpoints."""
    nx, ny = 32, 64
    p = rt.SCRTParams(omega=1.0, rhol=1.2, rhog=0.4, g=-5.0,
                      gravity=-1.25e-5)
    fluid = rt.geometry_channel(nx, ny)
    f0 = rt.init_interface(nx, ny, p) * fluid[None]
    c = jnp.asarray(rt.D2Q9.c, f0.dtype)
    n = 23

    def energy_from(f):
        rho = rt.density(f)
        u = einsum("kd,kyx->dyx", c, f) / jnp.maximum(rho, 1e-14)[None]
        return 0.5 * jnp.sum(jnp.where(fluid[None], u, 0.0) ** 2)

    @jax.jit
    def e_plain(gravity):
        def body(f, _):
            return rt.step_with_gravity(f, fluid, p, gravity), None
        f, _ = jax.lax.scan(body, f0, None, length=n)
        return energy_from(f)

    @jax.jit
    def e_remat(gravity):
        f = scan_remat(lambda s: rt.step_with_gravity(s, fluid, p, gravity),
                       f0, n)
        return energy_from(f)

    g0 = -1.25e-5
    np.testing.assert_allclose(float(e_remat(g0)), float(e_plain(g0)),
                               rtol=1e-12)
    np.testing.assert_allclose(float(jax.grad(e_remat)(g0)),
                               float(jax.grad(e_plain)(g0)), rtol=1e-10)


def test_scan_remat_pytree_state_and_explicit_block():
    """Pytree (f, g) HCZ state through scan_remat with an explicit block
    size matches the model's own run loop."""
    p = hcz.HCZParams()
    nx, ny = 32, 32
    f, g = hcz.init_rayleigh_taylor(nx, ny, p, dtype=jnp.float64)
    fluid = hcz.geometry_channel(nx, ny)
    (f, g) = hcz.apply_geometry((f, g), fluid)
    n = 10

    ref_f, ref_g = f, g
    for _ in range(n):
        ref_f, ref_g = hcz.step_2d((ref_f, ref_g), fluid, p)

    out_f, out_g = scan_remat(
        lambda s: hcz.step_2d(s, fluid, p), (f, g), n, block=4)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g),
                               atol=1e-13)

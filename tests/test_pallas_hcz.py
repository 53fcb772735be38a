"""Fused Pallas HCZ kernel vs the XLA reference path (interpreter mode)."""
import jax.numpy as jnp
import numpy as np

from multiphase_lbm_tpu.models import hcz
from multiphase_lbm_tpu.ops import pallas_hcz


def test_fused_hcz_matches_reference():
    p = hcz.HCZParams(omega=1.25, gravity=-6.25e-6, kappa=0.01)
    nx, ny = 128, 64
    state = hcz.init_rayleigh_taylor(nx, ny, p, dtype=jnp.float32)
    fluid = hcz.geometry_channel(nx, ny)
    state = hcz.apply_geometry(state, fluid)
    f, g = state
    ref_f, ref_g = f, g
    for _ in range(4):
        ref_f, ref_g = hcz.step_2d((ref_f, ref_g), fluid, p)
    out_f, out_g = pallas_hcz.run_fused(f, g, fluid.astype(jnp.float32), p, 4,
                                        tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g),
                               rtol=3e-5, atol=3e-6)


def test_fused_hcz_layered_drive():
    p = hcz.HCZParams(omega=1.0, kappa=0.001, Gx_const=1e-8)
    nx, ny = 128, 48
    state = hcz.init_layers(nx, ny, p, dtype=jnp.float32)
    fluid = hcz.geometry_channel(nx, ny)
    state = hcz.apply_geometry(state, fluid)
    f, g = state
    ref = hcz.step_2d((f, g), fluid, p)
    out = pallas_hcz.run_fused(f, g, fluid.astype(jnp.float32), p, 1,
                               tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=3e-5, atol=3e-6)


def test_multichip_fused_hcz(eight_devices):
    """4-device y-mesh fused HCZ (interpret) matches the XLA step."""
    import jax
    from multiphase_lbm_tpu.parallel import sharding as sh

    p = hcz.HCZParams(omega=1.2, gravity=-6.25e-6, kappa=0.01)
    nx, ny = 128, 64
    state = hcz.init_rayleigh_taylor(nx, ny, p, dtype=jnp.float32)
    fluid = hcz.geometry_channel(nx, ny)
    state = hcz.apply_geometry(state, fluid)
    f, g = state
    ref = hcz.step_2d((f, g), fluid, p)
    mesh = sh.make_mesh(4, axis_names=("y",))
    step = sh.make_fused_hcz_step(mesh, p, tile=8, interpret=True)
    spec3 = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec(None, "y", None))
    spec2 = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("y", None))
    out = step(jax.device_put(f, spec3), jax.device_put(g, spec3),
               jax.device_put(fluid.astype(jnp.float32), spec2))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                               rtol=3e-5, atol=3e-6)


def test_hcz_temporal_blocking_matches():
    """nsub>1 (multiple steps per HBM round-trip) matches the single-step
    kernel to f32 roundoff (XLA may re-associate differently across the two
    graphs, so bitwise equality is not guaranteed — unlike the SC kernel)."""
    p = hcz.HCZParams(omega=1.25, gravity=-6.25e-6, kappa=0.01)
    nx, ny = 128, 32          # equivalence doesn't need big shapes
    state = hcz.init_rayleigh_taylor(nx, ny, p, dtype=jnp.float32)
    fluid = hcz.geometry_channel(nx, ny)
    f, g = hcz.apply_geometry(state, fluid)
    fl = fluid.astype(jnp.float32)
    # (the wide-halo nsub=5/halo=16 path is covered by
    # test_sharding.test_fused_hcz_multichip_wide_exchange)
    r1 = pallas_hcz.run_fused(f, g, fl, p, 2, tile=32, interpret=True, nsub=1)
    r2 = pallas_hcz.run_fused(f, g, fl, p, 2, tile=32, interpret=True, nsub=2)
    rr = pallas_hcz.run_fused(f, g, fl, p, 3, tile=32, interpret=True, nsub=2)
    rr1 = pallas_hcz.run_fused(f, g, fl, p, 3, tile=32, interpret=True, nsub=1)
    for a, b in [(r1, r2), (rr1, rr)]:
        for i in range(2):
            np.testing.assert_allclose(np.asarray(a[i]), np.asarray(b[i]),
                                       rtol=2e-5, atol=1e-6)

"""Multi-chip decomposition tests on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multiphase_lbm_tpu.models import shan_chen as sc
from multiphase_lbm_tpu.parallel import sharding as sh


@pytest.fixture(scope="module")
def setup():
    p = sc.SCParams()
    nx, ny = 64, 32
    f = sc.init_droplet(nx, ny, p, radius=6.0, dtype=jnp.float64)
    fluid = sc.geometry_channel_walls(nx, ny)
    f = sc.apply_geometry(f, fluid)
    return p, f, fluid


def test_auto_sharding_matches_single_device(setup, eight_devices):
    p, f, fluid = setup
    ref = sc.run(f, fluid, p, 10)

    mesh = sh.make_mesh(4)
    f_sh = sh.shard_lattice(f, mesh, leading=1)
    fluid_sh = sh.shard_lattice(fluid, mesh, leading=0)
    out = sc.run(f_sh, fluid_sh, p, 10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_halo_step_matches_global_step(setup, eight_devices):
    p, f, fluid = setup
    mesh = sh.make_mesh(4)

    def gstep(fa, fl):
        return sc.step(fa, fl, p)

    halo_step = sh.make_halo_step(gstep, mesh, width=2,
                                  state_leading=(1, 0), n_state=1)
    f_sh = sh.shard_lattice(f, mesh, leading=1)
    fluid_sh = sh.shard_lattice(fluid, mesh, leading=0)

    ref = f
    out = f_sh
    for _ in range(5):
        ref = sc.step(ref, fluid, p)
        out = halo_step(out, fluid_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_halo_step_2d_mesh(setup, eight_devices):
    p, f, fluid = setup
    mesh = sh.make_mesh(8, shape=(2, 4), axis_names=("y", "x"))

    def gstep(fa, fl):
        return sc.step(fa, fl, p)

    halo_step = sh.make_halo_step(gstep, mesh, width=2,
                                  state_leading=(1, 0), n_state=1)
    f_sh = sh.shard_lattice(f, mesh, leading=1)
    fluid_sh = sh.shard_lattice(fluid, mesh, leading=0)
    ref = sc.step(sc.step(f, fluid, p), fluid, p)
    out = halo_step(halo_step(f_sh, fluid_sh), fluid_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_fused_hcz_multichip_wide_exchange(eight_devices):
    """nsub=3 multi-chip HCZ exchanges 16 rows per 3 steps (the reach·nsub
    parameterized exchange width, wider than the old 8-row pin) and matches
    single-device stepping.  nsub is 3 rather than the production 5 because
    the 5-substep interpret-mode graph nested in shard_map segfaulted the
    XLA CPU compiler when compiled late in a full-suite run (native stack
    overflow); the width-parameterization being tested is identical."""
    import jax as _jax
    _jax.clear_caches()   # shed accumulated executables before the big one
    from multiphase_lbm_tpu.models import hcz
    from multiphase_lbm_tpu.ops import pallas_hcz

    p = hcz.HCZParams()
    nx, ny = 64, 128
    state = hcz.init_rayleigh_taylor(nx, ny, p, dtype=jnp.float32)
    fluid = hcz.geometry_channel(nx, ny)
    state = hcz.apply_geometry(state, fluid)
    f, g = state
    m32 = fluid.astype(jnp.float32)

    ref_f, ref_g = pallas_hcz.run_fused(f, g, m32, p, 3, tile=8,
                                        interpret=True, nsub=1)

    mesh = sh.make_mesh(4, axis_names=("y",))
    step = sh.make_fused_hcz_step(mesh, p, tile=8, interpret=True, nsub=3)
    out_f, out_g = step(f, g, m32)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g),
                               rtol=2e-5, atol=1e-6)


def test_fused_hcz3d_multichip(eight_devices):
    """3D HCZ kernel under z-sharded shard_map halo exchange (nsub=2,
    6-slab exchange) matches single-device stepping."""
    from multiphase_lbm_tpu.models import hcz
    from multiphase_lbm_tpu.ops import pallas_hcz3d

    p = hcz.HCZParams(omega=1.0, gravity=0.0, kappa=0.01)
    f, g = hcz.init_droplet_3d(16, 16, 32, p, radius=5.0, dtype=jnp.float32)
    fluid = jnp.ones((32, 16, 16), bool)
    ref = (f, g)
    for _ in range(2):
        ref = hcz.step_3d(ref, fluid, p)

    mesh = sh.make_mesh(4, axis_names=("z",))
    step = sh.make_fused_hcz3d_step(mesh, p, tile=8, interpret=True, nsub=2)
    out_f, out_g = step(f, g)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref[0]),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref[1]),
                               rtol=2e-5, atol=1e-6)


def test_fused_fakhari_multichip(eight_devices):
    """Merged Fakhari kernel under shard_map halo exchange (nsub=2,
    16-row exchange) matches the XLA single-device path."""
    from multiphase_lbm_tpu.models import fakhari as fk

    p = fk.FakhariParams()
    nx, ny = 64, 128
    h, g, u = fk.init_bubble(nx, ny, p, dtype=jnp.float32)
    ref = (h, g, u)
    for _ in range(2):
        ref = fk.step(ref, p)

    mesh = sh.make_mesh(4, axis_names=("y",))
    step = sh.make_fused_fakhari_step(mesh, p, tile=16, interpret=True,
                                      nsub=2)
    out = step(h, g, u)
    for a, b, name in zip(out, ref, ("h", "g", "u")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)

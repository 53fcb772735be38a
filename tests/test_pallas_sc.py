"""Fused Pallas SC kernel vs the XLA reference path (interpreter mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import jax
import pytest

from multiphase_lbm_tpu.models import shan_chen as sc
from multiphase_lbm_tpu.ops import pallas_sc


@pytest.mark.parametrize("collision", ["bgk", "mrt"])
def test_fused_matches_reference_periodic(collision):
    p = sc.SCParams(collision=collision)
    nx, ny = 128, 32
    f = sc.init_droplet(nx, ny, p, radius=6.0, dtype=jnp.float32)
    fluid = sc.geometry_periodic(nx, ny)
    ref = sc.run(f, fluid, p, 5)
    out = pallas_sc.run_fused(f, fluid.astype(jnp.float32), p, 5,
                              tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_fused_matches_reference_walls():
    p = sc.SCParams(rho_w=0.2)
    nx, ny = 128, 32
    f = sc.init_droplet(nx, ny, p, radius=6.0, center=(nx / 2, 5.0),
                        dtype=jnp.float32)
    fluid = sc.geometry_channel_walls(nx, ny)
    f = sc.apply_geometry(f, fluid)
    ref = sc.run(f, fluid, p, 5)
    out = pallas_sc.run_fused(f, fluid.astype(jnp.float32), p, 5,
                              tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_fused_single_stripe():
    """nprog == 1 path (whole lattice in one stripe)."""
    p = sc.SCParams()
    nx, ny = 128, 16
    f = sc.init_droplet(nx, ny, p, radius=4.0, dtype=jnp.float32)
    fluid = sc.geometry_periodic(nx, ny)
    ref = sc.run(f, fluid, p, 3)
    out = pallas_sc.run_fused(f, fluid.astype(jnp.float32), p, 3,
                              tile=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_halo_mode_kernel_matches(tmp_path=None):
    """halo-mode kernel on a pre-padded block == normal kernel on the
    wrapped domain."""
    import numpy as np
    from multiphase_lbm_tpu.ops.pallas_sc import HALO, step_fused_halo

    p = sc.SCParams()
    nx, ny = 128, 32
    f = sc.init_droplet(nx, ny, p, radius=6.0, dtype=jnp.float32)
    fluid = sc.geometry_periodic(nx, ny).astype(jnp.float32)
    ref = pallas_sc.run_fused(f, fluid, p, 1, tile=8, interpret=True)
    f_ext = jnp.concatenate([f[:, -HALO:], f, f[:, :HALO]], axis=1)
    m_ext = jnp.concatenate([fluid[-HALO:], fluid, fluid[:HALO]], axis=0)
    out = step_fused_halo(f_ext, m_ext, p, tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_multichip_fused_step(eight_devices):
    """shard_map + halo-mode Pallas kernel (interpret) on a 4-device y-mesh
    matches the single-device XLA step."""
    import numpy as np
    from multiphase_lbm_tpu.parallel import sharding as sh

    p = sc.SCParams()
    nx, ny = 128, 64
    f = sc.init_droplet(nx, ny, p, radius=8.0, dtype=jnp.float32)
    fluid = sc.geometry_periodic(nx, ny)
    ref = sc.run(f, fluid, p, 1)
    mesh = sh.make_mesh(4, axis_names=("y",))
    step = sh.make_fused_sc_step(mesh, p, tile=8, interpret=True)
    f_sh = jax.device_put(f, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "y", None)))
    m_sh = jax.device_put(fluid.astype(jnp.float32),
                          jax.sharding.NamedSharding(
                              mesh, jax.sharding.PartitionSpec("y", None)))
    out = step(f_sh, m_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("periodic", [True, False])
def test_temporal_blocking_bitwise(periodic):
    """nsub>1 (multiple LBM steps per HBM round-trip) must reproduce the
    single-step kernel bit-for-bit: same op order per sub-step, rolls are
    exact copies, and the halo margin (2 rows/sub-step) is never exceeded."""
    p = sc.SCParams(collision="mrt")
    nx, ny = 128, 32          # bitwise identity doesn't need big shapes
    f = sc.init_droplet(nx, ny, p, radius=6.0, dtype=jnp.float32)
    fluid = (sc.geometry_periodic(nx, ny) if periodic
             else sc.geometry_channel_walls(nx, ny))
    f = sc.apply_geometry(f, fluid)
    fl = fluid.astype(jnp.float32)
    r1 = pallas_sc.run_fused(f, fl, p, 4, tile=32, interpret=True,
                             periodic=periodic, nsub=1)
    r2 = pallas_sc.run_fused(f, fl, p, 4, tile=32, interpret=True,
                             periodic=periodic, nsub=2)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    if periodic:              # wide-halo variant: one case suffices
        r4 = pallas_sc.run_fused(f, fl, p, 4, tile=32, interpret=True,
                                 periodic=periodic, nsub=4, halo=16)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r4))
    rrem = pallas_sc.run_fused(f, fl, p, 3, tile=32, interpret=True,
                               periodic=periodic, nsub=2)
    rrem1 = pallas_sc.run_fused(f, fl, p, 3, tile=32, interpret=True,
                                periodic=periodic, nsub=1)
    np.testing.assert_array_equal(np.asarray(rrem1), np.asarray(rrem))


def test_halo_mode_temporal_blocking():
    """nsub>1 through the multi-chip halo-mode entry: 2 steps per halo
    exchange equals 2 chained single-step exchanges."""
    from multiphase_lbm_tpu.ops.pallas_sc import HALO, step_fused_halo

    p = sc.SCParams(collision="mrt")
    nx, ny = 128, 32
    f = sc.init_droplet(nx, ny, p, radius=6.0, dtype=jnp.float32)
    fluid = sc.geometry_periodic(nx, ny).astype(jnp.float32)

    def pad(v):
        return jnp.concatenate([v[:, -HALO:], v, v[:, :HALO]], axis=1)

    m_ext = jnp.concatenate([fluid[-HALO:], fluid, fluid[:HALO]], axis=0)
    one = step_fused_halo(pad(f), m_ext, p, tile=8, interpret=True)
    two = step_fused_halo(pad(one), m_ext, p, tile=8, interpret=True)
    fused = step_fused_halo(pad(f), m_ext, p, tile=8, interpret=True, nsub=2)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(two))


def test_multichip_temporal_blocking(eight_devices):
    """nsub=2 through the sharded step: 2 LBM steps per ICI halo exchange
    equals 2 steps of the XLA reference."""
    from multiphase_lbm_tpu.parallel import sharding as sh

    p = sc.SCParams()
    nx, ny = 128, 64
    f = sc.init_droplet(nx, ny, p, radius=8.0, dtype=jnp.float32)
    fluid = sc.geometry_periodic(nx, ny)
    ref = sc.run(f, fluid, p, 2)
    mesh = sh.make_mesh(4, axis_names=("y",))
    step = sh.make_fused_sc_step(mesh, p, tile=8, interpret=True, nsub=2)
    f_sh = jax.device_put(f, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "y", None)))
    m_sh = jax.device_put(fluid.astype(jnp.float32),
                          jax.sharding.NamedSharding(
                              mesh, jax.sharding.PartitionSpec("y", None)))
    out = step(f_sh, m_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)

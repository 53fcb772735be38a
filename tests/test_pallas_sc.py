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

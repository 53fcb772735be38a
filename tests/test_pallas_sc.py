"""Fused Pallas SC kernel vs the XLA reference path (interpreter mode on CPU)."""
import jax.numpy as jnp
import numpy as np
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

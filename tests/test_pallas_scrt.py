"""Fused SC Rayleigh-Taylor kernel vs the XLA model path (interpreter
mode on CPU).  The kernel works in a transposed, lane-padded layout
(pallas_scrt module docstring); these tests pin it to
models.shan_chen_rt bit-near-exactly through run_fused's layout
round-trip."""
import jax.numpy as jnp
import numpy as np
import pytest

from multiphase_lbm_tpu.models import shan_chen_rt as rt
from multiphase_lbm_tpu.ops import pallas_scrt


def _setup(N=24):
    p = rt.SCRTParams()
    nx, ny = N, 4 * N + 2
    f = rt.init_interface(nx, ny, p, dtype=jnp.float32)
    fluid = rt.geometry_channel(nx, ny)
    f = f * fluid[None].astype(f.dtype)
    return p, f, fluid


@pytest.mark.parametrize("nsub", [1, 2])
def test_fused_matches_model(nsub):
    """Multi-stripe periodic-x wrap loads + lane-padded walls + mirror
    force, nsub temporal blocking."""
    p, f, fluid = _setup()
    ref = rt.run(f, fluid, p, 4)
    out = pallas_scrt.run_fused(f, p, 4, tile=8, interpret=True, nsub=nsub)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_fused_single_stripe():
    """nprog == 1 (whole transposed lattice in one stripe)."""
    p, f, fluid = _setup()
    ref = rt.run(f, fluid, p, 3)
    out = pallas_scrt.run_fused(f, p, 3, tile=24, interpret=True, nsub=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_solid_rows_stay_zero_and_mass_conserved():
    p, f, fluid = _setup()
    out = pallas_scrt.run_fused(f, p, 6, tile=8, interpret=True, nsub=2)
    out = np.asarray(out)
    assert np.all(out[:, 0, :] == 0.0) and np.all(out[:, -1, :] == 0.0)
    np.testing.assert_allclose(out.sum(), float(jnp.sum(f)), rtol=1e-5)

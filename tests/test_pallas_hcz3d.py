"""Fused 3D HCZ kernel vs the XLA step_3d path (interpreter mode)."""
import jax.numpy as jnp
import numpy as np

from multiphase_lbm_tpu.models import hcz
from multiphase_lbm_tpu.ops import pallas_hcz3d


def test_fused_3d_matches_reference():
    p = hcz.HCZParams(omega=1.2, kappa=5e-4)
    n = 16
    nx = 128  # lane dim must be 128-aligned
    state = hcz.init_droplet_3d(nx, n, n, p, radius=5.0, dtype=jnp.float32)
    fluid = hcz.geometry_periodic_3d(nx, n, n)
    f, g = state
    ref_f, ref_g = f, g
    for _ in range(3):
        ref_f, ref_g = hcz.step_3d((ref_f, ref_g), fluid, p, hcz.D3Q19)
    out_f, out_g = pallas_hcz3d.run_fused_3d(f, g, p, 3, tile=4,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(ref_f),
                               rtol=5e-5, atol=5e-6)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g),
                               rtol=5e-5, atol=5e-6)


def test_hcz3d_temporal_blocking_matches():
    """nsub=2 (two steps per HBM round-trip, z-halo 6 slabs) matches the
    single-step kernel to f32 roundoff, including a remainder step."""
    p = hcz.HCZParams()
    f, g = hcz.init_droplet_3d(128, 32, 24, p, radius=6.0, dtype=jnp.float32)
    # tile must be >= halo = 3*nsub (stripe loads stay in bounds).
    # 3 steps covers the remainder path too (2 + 1 under nsub=2) in the
    # same two compiles — the old separate 4-step pair doubled the CPU
    # interpret-mode compile cost for no extra coverage.
    rr = pallas_hcz3d.run_fused_3d(f, g, p, 3, tile=8, interpret=True, nsub=2)
    rr1 = pallas_hcz3d.run_fused_3d(f, g, p, 3, tile=8, interpret=True,
                                    nsub=1)
    for i in range(2):
        np.testing.assert_allclose(np.asarray(rr1[i]), np.asarray(rr[i]),
                                   rtol=2e-5, atol=1e-6)

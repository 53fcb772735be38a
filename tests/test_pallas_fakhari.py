"""Fused (merged, temporally-blocked) Pallas Fakhari kernel vs the XLA
reference path (interpreter mode)."""
import jax.numpy as jnp
import numpy as np

from multiphase_lbm_tpu.models import fakhari as fk
from multiphase_lbm_tpu.ops import pallas_fakhari


def _ref(state, p, n):
    for _ in range(n):
        state = fk.step(state, p)
    return state


def test_fused_fakhari_matches_reference():
    p = fk.FakhariParams()
    N = 64
    state = fk.init_bubble(N, N, p, dtype=jnp.float32)
    ref = _ref(state, p, 3)
    out = pallas_fakhari.run_fused(*state, p, 3, tile=16, nsub=1,
                                   interpret=True)
    for a, b, name in zip(out, ref, ("h", "g", "u")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6, err_msg=name)


def test_fused_fakhari_temporal_blocking():
    """nsub=3 (three steps per launch, 16-row halo) + a remainder step
    matches the XLA path."""
    p = fk.FakhariParams()
    N = 64
    state = fk.init_bubble(N, N, p, dtype=jnp.float32)
    ref = _ref(state, p, 4)
    out = pallas_fakhari.run_fused(*state, p, 4, tile=32, nsub=3,
                                   interpret=True)
    for a, b, name in zip(out, ref, ("h", "g", "u")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)

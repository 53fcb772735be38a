"""Fused Pallas Fakhari kernels vs the XLA reference path (interpreter)."""
import jax.numpy as jnp
import numpy as np

from multiphase_lbm_tpu.models import fakhari as fk
from multiphase_lbm_tpu.ops import pallas_fakhari


def test_fused_fakhari_matches_reference():
    p = fk.FakhariParams()
    N = 64
    state = fk.init_bubble(N, N, p, dtype=jnp.float32)
    ref = state
    for _ in range(3):
        ref = fk.step(ref, p)
    out = pallas_fakhari.run_fused(*state, p, 3, tile=16, interpret=True)
    for a, b, name in zip(out, ref, ("h", "g", "u")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-6, err_msg=name)

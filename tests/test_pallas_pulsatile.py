"""Interpreter-mode equivalence of the fused pulsatile hydro kernel
against the XLA step (the parity oracle) at f32."""
import jax
import jax.numpy as jnp
import numpy as np

from multiphase_lbm_tpu.models import pulsatile as pu
from multiphase_lbm_tpu.ops import pallas_pulsatile as pk


def test_fused_step_matches_xla():
    N = 32
    p = pu.PulsatileParams(nx=1 + 10 * (N - 2), ny=N)
    st = pu.initialize(p, dtype=jnp.float32)
    # advance into the transient so walls move and Bouzidi/reseed engage
    st = pu.run(st, 0, p, 30)

    ref = st
    for t in range(30, 32):
        out = pk.step_fused(ref, t, p, interpret=True)
        ref = pu.step(ref, t, p)
        for name in ("g_coll", "g_stream", "P", "Ux", "Uy", "yr1", "yr2"):
            a = np.asarray(getattr(out, name))
            b = np.asarray(getattr(ref, name))
            np.testing.assert_allclose(
                a, b, rtol=2e-4, atol=2e-6,
                err_msg=f"{name} at t={t}")
        # step both paths from the SAME state each iteration so f32
        # reassociation drift doesn't compound into the comparison

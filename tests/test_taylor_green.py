"""Single-phase core sanity: Taylor-Green vortex decay vs the analytic rate.

Validates the core collide-stream machinery (equilibrium, BGK, periodic pull
streaming) against u(t) = u0·exp(−2νk²t) — the SURVEY §7 step-1 oracle.
"""
import jax
import jax.numpy as jnp
import numpy as np

from multiphase_lbm_tpu.core.collision import bgk_collide, equilibrium
from multiphase_lbm_tpu.core.lattice import D2Q9
from multiphase_lbm_tpu.core.streaming import stream_periodic


def test_taylor_green_decay_rate():
    n = 64
    tau = 0.8
    omega = 1.0 / tau
    nu = (tau - 0.5) / 3.0
    u0 = 0.01
    k = 2.0 * np.pi / n

    X, Y = np.meshgrid(np.arange(n, dtype=float), np.arange(n, dtype=float))
    ux = -u0 * np.cos(k * X) * np.sin(k * Y)
    uy = u0 * np.sin(k * X) * np.cos(k * Y)
    rho = np.ones((n, n))
    f = equilibrium(jnp.asarray(rho), jnp.asarray(np.stack([ux, uy])), D2Q9)

    def step(f, _):
        r = jnp.sum(f, axis=0)
        c = jnp.asarray(D2Q9.c, dtype=f.dtype)
        u = jnp.einsum("kd,kyx->dyx", c, f) / r[None]
        feq = equilibrium(r, u, D2Q9)
        return stream_periodic(bgk_collide(f, feq, omega), D2Q9), None

    steps = 400
    f1, _ = jax.jit(lambda ff: jax.lax.scan(step, ff, None, length=steps))(f)
    c = jnp.asarray(D2Q9.c, dtype=f1.dtype)
    r1 = jnp.sum(f1, axis=0)
    u1 = np.asarray(jnp.einsum("kd,kyx->dyx", c, f1) / r1[None])

    amp0 = np.abs(ux).max()
    amp1 = np.abs(u1[0]).max()
    expected = amp0 * np.exp(-2.0 * nu * k * k * steps)
    np.testing.assert_allclose(amp1, expected, rtol=0.02)
    # velocity field keeps its structure (correlation with initial field)
    corr = np.sum(u1[0] * ux) / np.sqrt(np.sum(u1[0] ** 2) * np.sum(ux ** 2))
    assert corr > 0.999

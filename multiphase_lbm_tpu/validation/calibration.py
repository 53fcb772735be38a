"""Inverse-problem calibration: recover physical parameters by gradient
descent THROUGH the solver.

JAX autodiff differentiates the whole collide-stream time loop (the
adjoint method for free), so observed fields can be inverted for the
parameters that produced them — calibration, data assimilation, control.
The C++ reference (imperative per-cell loops,
`Abbashub LBM/apps/Young_Laplace2D.h`, `Phase field model/apps/
rayleighTaylor2D.h`) has no equivalent capability; this is native to the
TPU build's functional design (pure `lax.scan` steps, SURVEY §3).

Two demos, both CI-gated (tests/test_calibration.py):

* :func:`calibrate_tau` — recover the BGK relaxation time τ (i.e. the
  viscosity) from ONE observed velocity snapshot of a decaying
  Taylor-Green vortex, by Newton iteration on the scalar adjoint
  gradient.
* :func:`calibrate_gravity` — recover the body force driving an SC
  Rayleigh-Taylor run from one observed density field.

Both converge to the generating parameter to ~1e-6 in a handful of
forward+adjoint passes on lattices this small.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.collision import bgk_collide, equilibrium
from ..core.lattice import D2Q9
from ..core.precision import einsum
from ..core.streaming import stream_periodic
from ..models import shan_chen_rt as rt


def _taylor_green_f0(n: int, u0: float = 0.01, dtype=jnp.float64):
    k = 2.0 * np.pi / n
    X, Y = np.meshgrid(np.arange(n, dtype=float), np.arange(n, dtype=float))
    ux = -u0 * np.cos(k * X) * np.sin(k * Y)
    uy = u0 * np.sin(k * X) * np.cos(k * Y)
    rho = jnp.ones((n, n), dtype)
    u = jnp.asarray(np.stack([ux, uy]), dtype)
    return equilibrium(rho, u, D2Q9)


def _velocity(f):
    c = jnp.asarray(D2Q9.c, dtype=f.dtype)
    rho = jnp.sum(f, axis=0)
    return einsum("kd,kyx->dyx", c, f) / rho[None]


def _run_bgk(f0, tau, steps: int):
    def step(f, _):
        rho = jnp.sum(f, axis=0)
        u = _velocity(f)
        feq = equilibrium(rho, u, D2Q9)
        return stream_periodic(bgk_collide(f, feq, 1.0 / tau), D2Q9), None

    f1, _ = jax.lax.scan(step, f0, None, length=steps)
    return f1


def calibrate_tau(n: int = 32, steps: int = 60, tau_true: float = 0.8,
                  tau0: float = 0.65, iters: int = 8,
                  verbose: bool = False) -> float:
    """Recover τ from one velocity snapshot of a Taylor-Green decay.

    Newton on the scalar loss L(τ) = Σ(u(τ) − u_obs)²: both L′ and L″
    come from autodiff through all ``steps`` collide-stream steps."""
    f0 = _taylor_green_f0(n)
    u_obs = _velocity(_run_bgk(f0, tau_true, steps))

    @jax.jit
    def loss(tau):
        return jnp.sum((_velocity(_run_bgk(f0, tau, steps)) - u_obs) ** 2)

    dl = jax.jit(jax.grad(loss))
    d2l = jax.jit(jax.grad(jax.grad(loss)))

    tau = tau0
    for i in range(iters):
        g, h = float(dl(tau)), float(d2l(tau))
        step_newton = g / h if h > 0 else np.sign(g) * 0.05
        tau = float(np.clip(tau - step_newton, 0.51, 2.0))
        if verbose:
            print(f"  iter {i}: tau={tau:.8f}  L'={g:.3e}")
        if abs(step_newton) < 1e-10:
            break
    return tau


def calibrate_gravity(nx: int = 32, ny: int = 64, steps: int = 30,
                      g_true: float = -1.25e-5, g0: float = -0.5e-5,
                      iters: int = 8, verbose: bool = False) -> float:
    """Recover the RT body force from one observed density field
    (adjoint through :func:`models.shan_chen_rt.step_with_gravity`)."""
    p = rt.SCRTParams(omega=1.0, rhol=1.2, rhog=0.4, g=-5.0,
                      gravity=g_true)
    fluid = rt.geometry_channel(nx, ny)
    f0 = rt.init_interface(nx, ny, p) * fluid[None]

    def forward(gravity):
        def body(f, _):
            return rt.step_with_gravity(f, fluid, p, gravity), None
        f, _ = jax.lax.scan(body, f0, None, length=steps)
        return rt.density(f)

    rho_obs = forward(g_true)

    @jax.jit
    def loss(gravity):
        return jnp.sum((forward(gravity) - rho_obs) ** 2)

    dl = jax.jit(jax.grad(loss))
    d2l = jax.jit(jax.grad(jax.grad(loss)))

    g = g0
    for i in range(iters):
        gr, h = float(dl(g)), float(d2l(g))
        step_newton = gr / h if h > 0 else np.sign(gr) * 1e-6
        g = float(g - step_newton)
        if verbose:
            print(f"  iter {i}: gravity={g:.6e}  L'={gr:.3e}")
        if abs(step_newton) < 1e-14:
            break
    return g


if __name__ == "__main__":
    # the axon sitecustomize pins the TPU platform, which has no float64;
    # these demos are CPU-scale (like validation/pulsatile_fullrun.py)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    print("Taylor-Green viscosity calibration (tau_true=0.8, start 0.65):")
    tau = calibrate_tau(verbose=True)
    print(f"recovered tau = {tau:.8f}")
    print("RT gravity calibration (g_true=-1.25e-5, start -0.5e-5):")
    g = calibrate_gravity(verbose=True)
    print(f"recovered gravity = {g:.6e}")

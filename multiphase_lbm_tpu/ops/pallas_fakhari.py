"""Fused Pallas kernels for the Fakhari conservative phase-field step.

Two kernels per time step on the fully-periodic domain (the reference
Young_Laplace2D geometry has no walls):

* ``collide-stream``: reads (h, g, u), derives φ/ρ/∇φ/μ/n in VMEM
  (stencil reach 2) and writes the streamed h', g' (reach 3 total).
* ``refresh``: reads (h', g', u), derives the post-stream fields and writes
  the new velocity u' = Σ g'c + F/(2ρ) using the stale-u stress exactly like
  the reference's update_fields (Young_Laplace2D.h:297-370).

Same y-stripe + 8-row-halo decomposition as the other fused kernels.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.lattice import D2Q9
from ..models.fakhari import EPS_C, FakhariParams

HALO = 8


def _pick_tile(ny: int, target: int = 0) -> int:
    # measured v5e 1024x1024: tile 32-128 -> ~120 MLUPS, 256 -> ~807,
    # 512 -> VMEM OOM; prefer ny/4 capped at 256
    if target == 0:
        target = min(256, max(32, ny // 4))
    best = 0
    for t in range(8, min(ny, target) + 1, 8):
        if ny % t == 0:
            best = t
    if best == 0:
        raise ValueError(ny)
    return best


def _roll2(arr, cy, cx):
    out = arr
    if cy:
        out = pltpu.roll(out, (-cy) % arr.shape[0], 0)
    if cx:
        out = pltpu.roll(out, (-cx) % arr.shape[1], 1)
    return out


def _loader(ny, nx, Ty, nprog):
    Text = Ty + 2 * HALO

    def load(i, y0, cp, hbm, buf, slot, lead=True):
        sl = (slice(None),) if lead else ()
        if nprog == 1:
            cp(hbm.at[sl + (pl.ds(ny - HALO, HALO), slice(None))],
               buf.at[sl + (pl.ds(0, HALO), slice(None))], slot)
            cp(hbm.at[sl + (pl.ds(0, ny), slice(None))],
               buf.at[sl + (pl.ds(HALO, ny), slice(None))], slot)
            cp(hbm.at[sl + (pl.ds(0, HALO), slice(None))],
               buf.at[sl + (pl.ds(HALO + ny, HALO), slice(None))], slot)
        else:
            @pl.when(i == 0)
            def _():
                cp(hbm.at[sl + (pl.ds(ny - HALO, HALO), slice(None))],
                   buf.at[sl + (pl.ds(0, HALO), slice(None))], slot)
                cp(hbm.at[sl + (pl.ds(0, Ty + HALO), slice(None))],
                   buf.at[sl + (pl.ds(HALO, Ty + HALO), slice(None))], slot)

            @pl.when(jnp.logical_and(i > 0, i < nprog - 1))
            def _():
                cp(hbm.at[sl + (pl.ds(pl.multiple_of(y0 - HALO, 8), Text), slice(None))],
                   buf.at[sl + (slice(None), slice(None))], slot)

            @pl.when(i == nprog - 1)
            def _():
                cp(hbm.at[sl + (pl.ds(pl.multiple_of(y0 - HALO, 8), Ty + HALO), slice(None))],
                   buf.at[sl + (pl.ds(0, Ty + HALO), slice(None))], slot)
                cp(hbm.at[sl + (pl.ds(0, HALO), slice(None))],
                   buf.at[sl + (pl.ds(Ty + HALO, HALO), slice(None))], slot)

    return load


def _fields(hb, gb, ub, p: FakhariParams, c, w):
    """Shared in-VMEM field derivation (reference derive_fields + force)."""
    C = hb[0]
    P = gb[0]
    for k in range(1, 9):
        C = C + hb[k]
        P = P + gb[k]
    rho = p.rhol + C * (p.rhoh - p.rhol)

    def grad(q):
        gx = jnp.zeros_like(q)
        gy = jnp.zeros_like(q)
        for k in range(9):
            cx, cy = int(c[k][0]), int(c[k][1])
            if cx == 0 and cy == 0:
                continue
            v = _roll2(q, cy, cx)
            if cx:
                gx = gx + float(w[k] * cx) * v
            if cy:
                gy = gy + float(w[k] * cy) * v
        return 3.0 * gx, 3.0 * gy

    def lap(q):
        s = jnp.zeros_like(q)
        for k in range(9):
            cx, cy = int(c[k][0]), int(c[k][1])
            if cx == 0 and cy == 0:
                continue
            s = s + float(w[k]) * (_roll2(q, cy, cx) - q)
        return 6.0 * s

    dCx, dCy = grad(C)
    mu = 4.0 * p.beta * C * (C - 1.0) * (C - 0.5) - p.kappa * lap(C)
    g2 = dCx * dCx + dCy * dCy + 1e-32
    inv = jax.lax.rsqrt(g2)
    ni, nj = dCx * inv, dCy * inv

    ux, uy = ub[0], ub[1]
    # non-equilibrium stress of g (exclude rest k=4)
    sxx = jnp.zeros_like(C)
    sxy = jnp.zeros_like(C)
    syy = jnp.zeros_like(C)
    usqr = 1.5 * (ux * ux + uy * uy)
    geq = []
    for k in range(9):
        cx, cy = float(c[k][0]), float(c[k][1])
        cu = cx * ux + cy * uy
        gaw = float(w[k]) * (3.0 * cu + 4.5 * cu * cu - usqr)
        geq.append(P * float(w[k]) + gaw)
        if int(c[k][0]) == 0 and int(c[k][1]) == 0:
            continue
        dn = gb[k] - geq[k]
        sxx = sxx + dn * cx * cx
        sxy = sxy + dn * cx * cy
        syy = syy + dn * cy * cy
    fac = (0.5 - p.tau) / p.tau
    dR = p.rhoh - p.rhol
    FmX = fac * (sxx * dCx + sxy * dCy) * dR
    FmY = fac * (sxy * dCx + syy * dCy) * dR
    FpX = -P * p.drho3 * dCx
    FpY = -P * p.drho3 * dCy
    Fx = mu * dCx + FpX + FmX
    Fy = mu * dCy + FpY + FmY
    return C, P, rho, dCx, dCy, mu, ni, nj, Fx, Fy, geq, usqr


def _make_cs_kernel(p: FakhariParams, ny, nx, Ty):
    lat = D2Q9
    w, c, opp = lat.w, lat.c, lat.opp
    nprog = ny // Ty
    load = _loader(ny, nx, Ty, nprog)

    def kernel(h_hbm, g_hbm, u_hbm, outh_ref, outg_ref, hbuf, gbuf, ubuf, sem):
        i = pl.program_id(0)
        y0 = pl.multiple_of(i * Ty, 8)

        def cp(src, dst, slot):
            d = pltpu.make_async_copy(src, dst, sem.at[slot])
            d.start()
            d.wait()

        load(i, y0, cp, h_hbm, hbuf, 0)
        load(i, y0, cp, g_hbm, gbuf, 1)
        load(i, y0, cp, u_hbm, ubuf, 2)

        hb, gb, ub = hbuf[:, :, :], gbuf[:, :, :], ubuf[:, :, :]
        C, P, rho, dCx, dCy, mu, ni, nj, Fx, Fy, geq, usqr = _fields(
            hb, gb, ub, p, c, w)

        shape = (1.0 - 4.0 * (C - 0.5) ** 2) / p.W
        ux, uy = ub[0], ub[1]
        post_h, post_g = [], []
        for k in range(9):
            cx, cy = float(c[k][0]), float(c[k][1])
            cu = cx * ux + cy * uy
            GaWa = float(w[k]) * (3.0 * cu + 4.5 * cu * cu - usqr)
            Gamma = float(w[k]) + GaWa
            proj = cx * ni + cy * nj
            hlp_h = float(w[k]) * shape * proj
            heq = C * Gamma - 0.5 * hlp_h
            eF = cx * Fx + cy * Fy
            hlp_g = 3.0 * float(w[k]) * eF / (rho + EPS_C)
            geq_corr = geq[k] - 0.5 * hlp_g
            post_h.append((1.0 - p.wc) * hb[k] + p.wc * heq + hlp_h)
            post_g.append((1.0 - p.s8) * gb[k] + p.s8 * geq_corr + hlp_g)

        for k in range(9):
            cx, cy = int(c[k][0]), int(c[k][1])
            nh = post_h[k] if (cx == 0 and cy == 0) else _roll2(post_h[k], -cy, -cx)
            ng = post_g[k] if (cx == 0 and cy == 0) else _roll2(post_g[k], -cy, -cx)
            outh_ref[k, :, :] = nh[HALO:HALO + Ty, :]
            outg_ref[k, :, :] = ng[HALO:HALO + Ty, :]

    return kernel


def _make_refresh_kernel(p: FakhariParams, ny, nx, Ty):
    lat = D2Q9
    w, c = lat.w, lat.c
    nprog = ny // Ty
    load = _loader(ny, nx, Ty, nprog)

    def kernel(h_hbm, g_hbm, u_hbm, outu_ref, hbuf, gbuf, ubuf, sem):
        i = pl.program_id(0)
        y0 = pl.multiple_of(i * Ty, 8)

        def cp(src, dst, slot):
            d = pltpu.make_async_copy(src, dst, sem.at[slot])
            d.start()
            d.wait()

        load(i, y0, cp, h_hbm, hbuf, 0)
        load(i, y0, cp, g_hbm, gbuf, 1)
        load(i, y0, cp, u_hbm, ubuf, 2)

        hb, gb, ub = hbuf[:, :, :], gbuf[:, :, :], ubuf[:, :, :]
        C, P, rho, dCx, dCy, mu, ni, nj, Fx, Fy, geq, usqr = _fields(
            hb, gb, ub, p, c, w)

        momx = jnp.zeros_like(C)
        momy = jnp.zeros_like(C)
        for k in range(9):
            cx, cy = float(c[k][0]), float(c[k][1])
            if cx:
                momx = momx + cx * gb[k]
            if cy:
                momy = momy + cy * gb[k]
        ux2 = momx + 0.5 * Fx / (rho + EPS_C)
        uy2 = momy + 0.5 * Fy / (rho + EPS_C)
        outu_ref[0, :, :] = ux2[HALO:HALO + Ty, :]
        outu_ref[1, :, :] = uy2[HALO:HALO + Ty, :]

    return kernel


@partial(jax.jit, static_argnames=("p", "n_steps", "tile", "interpret"))
def run_fused(h, g, u, p: FakhariParams, n_steps: int, tile: int = 0,
              interpret: bool = False):
    """Advance the Fakhari state (h, g, u) ``n_steps`` with fused kernels."""
    _, ny, nx = h.shape
    Ty = tile or _pick_tile(ny)
    assert ny % Ty == 0
    Text = Ty + 2 * HALO

    common = dict(
        grid=(ny // Ty,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )
    scratch = [
        pltpu.VMEM((9, Text, nx), jnp.float32),
        pltpu.VMEM((9, Text, nx), jnp.float32),
        pltpu.VMEM((2, Text, nx), jnp.float32),
        pltpu.SemaphoreType.DMA((3,)),
    ]
    cs_call = pl.pallas_call(
        _make_cs_kernel(p, ny, nx, Ty),
        out_shape=(jax.ShapeDtypeStruct(h.shape, h.dtype),
                   jax.ShapeDtypeStruct(g.shape, g.dtype)),
        out_specs=(pl.BlockSpec((9, Ty, nx), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((9, Ty, nx), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=scratch, **common)
    rf_call = pl.pallas_call(
        _make_refresh_kernel(p, ny, nx, Ty),
        out_shape=jax.ShapeDtypeStruct(u.shape, u.dtype),
        out_specs=pl.BlockSpec((2, Ty, nx), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch, **common)

    def body(carry, _):
        hh, gg, uu = carry
        h2, g2 = cs_call(hh, gg, uu)
        u2 = rf_call(h2, g2, uu)
        return (h2, g2, u2), None

    (h, g, u), _ = jax.lax.scan(body, (h, g, u), None, length=n_steps)
    return h, g, u

"""Fused Pallas kernel for the Fakhari conservative phase-field step.

ONE kernel per ``nsub`` time steps on the fully-periodic domain (the
reference Young_Laplace2D geometry has no walls): field derivation
(φ/ρ/∇φ/μ/n), BGK collision of both distributions, periodic streaming,
post-stream field refresh and the stale-u velocity update — all in VMEM.
Round 1 used two kernels per step (collide-stream + refresh), which paid
two launches, two HBM reads of (h, g, u) and a duplicated field
derivation per step; the merged kernel does each once, and ``nsub``
temporal blocking amortises the remaining HBM round trip (one substep
consumes 5 rows of halo validity: ∇/∇² reach 2 + streaming 1 + the
post-stream refresh's reach 2).

Op economics (measured on v5e): rolls and other non-fusable ops cost
~2-13 µs regardless of size, so the kernel batches them — the D2Q9
∇/∇² pair of a field costs 6 rolls (axis rolls shared through the
Sx/Dx factorisation, the four diagonals through one stacked roll pair),
streaming rolls carry (h, g) stacked, and the collision is Q-vectorized
over ``(9, rows, nx)`` arrays.

Reference semantics: ``Young_Laplace2D.h:217-290`` (collide_stream_at)
and ``:297-370`` (update_fields); pinned to :mod:`..models.fakhari` by an
interpreter-mode equivalence test.

Measured 1024² f32 on one v5e: 883 MLUPS single-step (tile=256),
1336 at the tile=128/nsub=3 default, 1552 at nsub=6, 1620 at nsub=9
(tile=256 with nsub≥3 exceeds VMEM).  Negative result worth keeping:
threading the post-stream refresh fields into the next substep's collide
(pure CSE, −6 rolls/substep) measured SLOWER (1449 vs 1620 at nsub=9) —
the fields held live across the substep boundary inflate the peak VMEM
live-set and the resulting spills cost more than the saved rolls.
Second negative result: routing outputs through the scratch buffers via
direct DMA (the trick that unlocked HCZ-3D's nsub=2) measured ~1470-1510
at tile=128/nsub=6 vs 1552 with VMEM out blocks, and the tile=256
configs it unlocks (1290/1421 at nsub=3/6) don't beat tile=128 — this
kernel is not VMEM-bound at its best config, so freeing VMEM buys
nothing and the extra write-back stores cost ~3-5%.
Third negative result (round 3): factorizing the streaming into 4
stacked rolls (group the 8 directions by cx, roll x once per sign, then
regroup by cy and roll y once per sign — 12 roll + 8 stack ops down to
4 rolls + 4 stacks per substep; bitwise-identical output) measured
+3.4% at nsub=6 and −0.8% at nsub=9 — the per-op issued costs that
dominate SMALL-lattice kernels pipeline away at (Ty+2h)×1024 block
sizes, so op-count reduction buys nothing here.  The same serial-chip
re-measurement showed round 2's 1552/1620 were chip-contended: the
UNMODIFIED kernel does ~2350 (nsub=6) / ~2490 (nsub=9) MLUPS measured
alone.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernel_utils
from ..core.lattice import D2Q9
from ..models.fakhari import EPS_C, FakhariParams

HALO = 8          # Mosaic sublane alignment; one substep consumes 5 rows
REACH = 5


def _pick_tile(ny: int, target: int = 0) -> int:
    if target == 0:
        target = min(128, max(32, ny // 8))
    best = 0
    for t in range(8, min(ny, target) + 1, 8):
        if ny % t == 0:
            best = t
    if best == 0:
        raise ValueError(ny)
    return best


_roll2 = kernel_utils.roll2


def _loader(ny, nx, Ty, nprog, halo, halo_in=False):
    Text = Ty + 2 * halo

    def load(i, y0, cp, hbm, buf, slot):
        sl = (slice(None),)
        if halo_in:
            # caller supplies (…, ny+2·halo, nx) arrays with filled halos:
            # uniform in-bounds loads (multi-chip path)
            cp(hbm.at[sl + (pl.ds(y0, Text), slice(None))],
               buf.at[sl + (slice(None), slice(None))], slot)
            return
        if nprog == 1:
            cp(hbm.at[sl + (pl.ds(ny - halo, halo), slice(None))],
               buf.at[sl + (pl.ds(0, halo), slice(None))], slot)
            cp(hbm.at[sl + (pl.ds(0, ny), slice(None))],
               buf.at[sl + (pl.ds(halo, ny), slice(None))], slot)
            cp(hbm.at[sl + (pl.ds(0, halo), slice(None))],
               buf.at[sl + (pl.ds(halo + ny, halo), slice(None))], slot)
        else:
            @pl.when(i == 0)
            def _():
                cp(hbm.at[sl + (pl.ds(ny - halo, halo), slice(None))],
                   buf.at[sl + (pl.ds(0, halo), slice(None))], slot)
                cp(hbm.at[sl + (pl.ds(0, Ty + halo), slice(None))],
                   buf.at[sl + (pl.ds(halo, Ty + halo), slice(None))], slot)

            @pl.when(jnp.logical_and(i > 0, i < nprog - 1))
            def _():
                cp(hbm.at[sl + (pl.ds(pl.multiple_of(y0 - halo, 8), Text),
                                slice(None))],
                   buf.at[sl + (slice(None), slice(None))], slot)

            @pl.when(i == nprog - 1)
            def _():
                cp(hbm.at[sl + (pl.ds(pl.multiple_of(y0 - halo, 8),
                                      Ty + halo), slice(None))],
                   buf.at[sl + (pl.ds(0, Ty + halo), slice(None))], slot)
                cp(hbm.at[sl + (pl.ds(0, halo), slice(None))],
                   buf.at[sl + (pl.ds(Ty + halo, halo), slice(None))], slot)

    return load


def _make_kernel(p: FakhariParams, ny, nx, Ty, nsub, halo, halo_in=False):
    lat = D2Q9
    w, c = lat.w, lat.c
    Wf = [float(x) for x in w]
    Ci = [(int(c[k][0]), int(c[k][1])) for k in range(9)]
    nprog = ny // Ty
    assert halo_in or nprog == 1 or Ty >= halo, (Ty, halo)
    assert REACH * nsub <= halo, (nsub, halo)
    load = _loader(ny, nx, Ty, nprog, halo, halo_in)
    Q = 9

    Cf = [(float(c[k][0]), float(c[k][1])) for k in range(Q)]

    def grad_lap(q):
        """D2Q9 isotropic ∇ and ∇² of one field in 6 rolls (axis rolls
        shared via the Sx/Dx factorisation; diagonals via one stacked
        roll pair)."""
        rx_p = _roll2(q, 0, 1)
        rx_m = _roll2(q, 0, -1)
        ry_p = _roll2(q, 1, 0)
        ry_m = _roll2(q, -1, 0)
        Sx = rx_p + rx_m
        Dx = rx_p - rx_m
        Sy = ry_p + ry_m
        Dy = ry_p - ry_m
        SD = jnp.stack([Sx, Dx])
        SDp = _roll2(SD, 1, 0)      # at y+1
        SDm = _roll2(SD, -1, 0)     # at y−1
        sum_diag = SDp[0] + SDm[0]
        gx_diag = SDp[1] + SDm[1]
        gy_diag = SDp[0] - SDm[0]
        # constant divides are real multi-pass VPU ops under IEEE
        # semantics: fold them into multiplies
        gx = Dx * (1.0 / 3.0) + gx_diag * (1.0 / 12.0)
        gy = Dy * (1.0 / 3.0) + gy_diag * (1.0 / 12.0)
        lap = (Sx + Sy) * (2.0 / 3.0) + sum_diag * (1.0 / 6.0) \
            - (10.0 / 3.0) * q
        return gx, gy, lap

    def fields(hb, gb):
        """φ, p*, ρ, ∇φ, μ, n from per-k population lists (per-k loops keep
        the peak VMEM live-set small — Q-vectorized (9, rows, nx) chains at
        these block sizes spill)."""
        C = hb[0]
        P = gb[0]
        for k in range(1, Q):
            C = C + hb[k]
            P = P + gb[k]
        rho = p.rhol + C * (p.rhoh - p.rhol)
        dCx, dCy, lap = grad_lap(C)
        mu = 4.0 * p.beta * C * (C - 1.0) * (C - 0.5) - p.kappa * lap
        inv = jax.lax.rsqrt(dCx * dCx + dCy * dCy + 1e-32)
        return C, P, rho, dCx, dCy, mu, dCx * inv, dCy * inv

    def stress_force(gb, geq, P, rho, dCx, dCy, mu):
        sxx = jnp.zeros_like(P)
        sxy = jnp.zeros_like(P)
        syy = jnp.zeros_like(P)
        for k in range(Q):
            cx, cy = Cf[k]
            if cx == 0.0 and cy == 0.0:
                continue
            dn = gb[k] - geq[k]
            sxx = sxx + dn * (cx * cx)
            sxy = sxy + dn * (cx * cy)
            syy = syy + dn * (cy * cy)
        fac = (0.5 - p.tau) / p.tau
        dR = p.rhoh - p.rhol
        FmX = fac * (sxx * dCx + sxy * dCy) * dR
        FmY = fac * (sxy * dCx + syy * dCy) * dR
        Fx = mu * dCx - P * p.drho3 * dCx + FmX
        Fy = mu * dCy - P * p.drho3 * dCy + FmY
        return Fx, Fy

    def geq_of(P, ux, uy, usqr):
        geq = []
        for k in range(Q):
            cx, cy = Cf[k]
            cu = cx * ux + cy * uy
            geq.append(P * Wf[k]
                       + Wf[k] * (3.0 * cu + 4.5 * cu * cu - usqr))
        return geq

    def step_block(hb, gb, ub):
        """One full step on halo-extended block lists (shrink REACH rows)."""
        C, P, rho, dCx, dCy, mu, ni, nj = fields(hb, gb)
        ux, uy = ub[0], ub[1]
        usqr = 1.5 * (ux * ux + uy * uy)
        geq = geq_of(P, ux, uy, usqr)
        Fx, Fy = stress_force(gb, geq, P, rho, dCx, dCy, mu)

        shape = (1.0 - 4.0 * (C - 0.5) ** 2) / p.W
        inv_rho = 3.0 / (rho + EPS_C)
        post_h = []
        post_g = []
        for k in range(Q):
            cx, cy = Cf[k]
            cu = cx * ux + cy * uy
            GaWa = Wf[k] * (3.0 * cu + 4.5 * cu * cu - usqr)
            proj = cx * ni + cy * nj
            hlp_h = Wf[k] * shape * proj
            heq = C * (Wf[k] + GaWa) - 0.5 * hlp_h
            post_h.append((1.0 - p.wc) * hb[k] + p.wc * heq + hlp_h)
            eF = cx * Fx + cy * Fy
            hlp_g = Wf[k] * eF * inv_rho
            geq_corr = geq[k] - 0.5 * hlp_g
            post_g.append((1.0 - p.s8) * gb[k] + p.s8 * geq_corr + hlp_g)

        # periodic pull streaming, (h, g) stacked per direction (one
        # fixed-cost roll carries both populations)
        h2 = [None] * Q
        g2 = [None] * Q
        for k in range(Q):
            cx, cy = Ci[k]
            if cx == 0 and cy == 0:
                h2[k] = post_h[k]
                g2[k] = post_g[k]
            else:
                pk = _roll2(jnp.stack([post_h[k], post_g[k]]), -cy, -cx)
                h2[k] = pk[0]
                g2[k] = pk[1]

        # post-stream refresh with the STALE u (reference :297-370)
        C2, P2, rho2, dCx2, dCy2, mu2, _, _ = fields(h2, g2)
        geq2 = geq_of(P2, ux, uy, usqr)
        Fx2, Fy2 = stress_force(g2, geq2, P2, rho2, dCx2, dCy2, mu2)
        momx = jnp.zeros_like(P2)
        momy = jnp.zeros_like(P2)
        for k in range(Q):
            cx, cy = Cf[k]
            if cx:
                momx = momx + cx * g2[k]
            if cy:
                momy = momy + cy * g2[k]
        # divide form kept deliberately: a shared 0.5/(rho2+EPS_C)
        # reciprocal triggers the same XLA-CPU fusion-duplication
        # pathology as pallas_hcz (temporal-blocking CI test 4.8 s -> 20 s
        # warm); see pallas_hcz.py step_block for the bisection notes
        ux2 = momx + 0.5 * Fx2 / (rho2 + EPS_C)
        uy2 = momy + 0.5 * Fy2 / (rho2 + EPS_C)
        return h2, g2, (ux2, uy2)

    def kernel(h_hbm, g_hbm, u_hbm, outh_ref, outg_ref, outu_ref,
               hbuf, gbuf, ubuf, sem):
        i = pl.program_id(0)
        y0 = pl.multiple_of(i * Ty, 8)

        def cp(src, dst, slot):
            d = pltpu.make_async_copy(src, dst, sem.at[slot])
            d.start()
            d.wait()

        load(i, y0, cp, h_hbm, hbuf, 0)
        load(i, y0, cp, g_hbm, gbuf, 1)
        load(i, y0, cp, u_hbm, ubuf, 2)

        hb = [hbuf[k] for k in range(Q)]
        gb = [gbuf[k] for k in range(Q)]
        ub = (ubuf[0], ubuf[1])
        for _ in range(nsub):
            hb, gb, ub = step_block(hb, gb, ub)
        for k in range(Q):
            outh_ref[k] = hb[k][halo:halo + Ty, :]
            outg_ref[k] = gb[k][halo:halo + Ty, :]
        outu_ref[0] = ub[0][halo:halo + Ty, :]
        outu_ref[1] = ub[1][halo:halo + Ty, :]

    return kernel


def _make_call(p, ny, nx, Ty, nsub, halo, interpret, dtype, halo_in=False):
    Text = Ty + 2 * halo
    kernel = _make_kernel(p, ny, nx, Ty, nsub, halo, halo_in)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((9, ny, nx), dtype),
                   jax.ShapeDtypeStruct((9, ny, nx), dtype),
                   jax.ShapeDtypeStruct((2, ny, nx), dtype)),
        grid=(ny // Ty,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(pl.BlockSpec((9, Ty, nx), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((9, Ty, nx), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((2, Ty, nx), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((9, Text, nx), jnp.float32),
            pltpu.VMEM((9, Text, nx), jnp.float32),
            pltpu.VMEM((2, Text, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("p", "n_steps", "tile", "interpret",
                                   "nsub"))
def run_fused(h, g, u, p: FakhariParams, n_steps: int, tile: int = 0,
              interpret: bool = False, nsub: int = 3):
    """Advance the Fakhari state (h, g, u) with the merged fused kernel;
    ``nsub`` steps per launch (temporal blocking, halo = 8·ceil(5·nsub/8))."""
    _, ny, nx = h.shape
    Ty = tile or _pick_tile(ny)
    assert ny % Ty == 0
    halo = ((REACH * nsub + HALO - 1) // HALO) * HALO
    if nprog_gt1 := (ny // Ty > 1):
        while Ty < halo:            # stripe-load bound: tile ≥ halo
            nsub = max(1, nsub - 1)
            halo = ((REACH * nsub + HALO - 1) // HALO) * HALO
            if nsub == 1 and Ty < halo:
                raise ValueError(f"tile {Ty} < minimum halo {halo}")
    del nprog_gt1
    call = _make_call(p, ny, nx, Ty, nsub, halo, interpret, h.dtype)

    def body(carry, _):
        return call(*carry), None

    (h, g, u), _ = jax.lax.scan(body, (h, g, u), None,
                                length=n_steps // nsub)
    rem = n_steps % nsub
    if rem:
        halo1 = ((REACH * rem + HALO - 1) // HALO) * HALO
        h, g, u = _make_call(p, ny, nx, Ty, rem, halo1, interpret,
                             h.dtype)(h, g, u)
    return h, g, u


def step_fused_halo(h_ext, g_ext, u_ext, p: FakhariParams, tile: int = 0,
                    interpret: bool = False, nsub: int = 1,
                    halo: int = HALO):
    """``nsub`` fused Fakhari steps on halo-extended blocks
    (``ny+2·halo`` rows with pre-filled halos) — the multi-chip building
    block; ``halo`` (8-multiple) must cover ``REACH·nsub = 5·nsub`` rows."""
    assert REACH * nsub <= halo, (nsub, halo)
    _, ny_ext, nx = h_ext.shape
    ny = ny_ext - 2 * halo
    Ty = tile or _pick_tile(ny)
    assert ny % Ty == 0, (ny, Ty)
    return _make_call(p, ny, nx, Ty, nsub, halo, interpret, h_ext.dtype,
                      halo_in=True)(h_ext, g_ext, u_ext)

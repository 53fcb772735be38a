"""Fused Pallas kernel for the pulsatile-vessel hydro phase.

One kernel per step covering collide → Bouzidi → pull-stream → Zou/He →
macroscopic recovery of :mod:`..models.pulsatile` (reference
``PulsatileBloodFlow2D.h:764-791`` step order).  The geometry phase (wall
ODE, Fobj, border-Δ extraction, fresh-node reseeding) stays on the XLA
path — it is already dense mask algebra and carries the bit-parity-
sensitive sequential reseed (shared via ``pulsatile.finish_step``).

Layout: the 621-wide lattice is padded to 640 lanes (Mosaic lane tiling);
padding columns are zeroed every step and never feed the domain:

* Bouzidi samples are masked by the in-domain checks (true ``nx``).
* Pull streaming must wrap at the TRUE width (the reference streams
  x-periodically and the wrapped values are semantically visible in the
  solid rows at the inlet/outlet columns — the ping-pong aliasing), so
  after each lane roll the receiving boundary column is patched with the
  value from the true opposite column (nx−1 ↔ 0) via a one-hot lane
  reduction.
* Zou/He overwrites the three inflow populations at x=0 and the three
  outflow populations at x=nx−1 inside the vessel rows.

MRT uses the identity-plus-low-rank structure of
S = diag(1,1,1,1,s5,1,s5,s8,s8) (``core/collision.MRT_M_I`` applied to
k-ordered data — the reference's quirk): the dense 9×9 transform reduces
to one moment contraction + rank-1 update per S-entry ≠ 1 (two for the
default s5 = 1).

Pinned to the XLA path by an interpreter-mode equivalence test
(``tests/test_pallas_pulsatile.py``).

Measured result (v5e f32, full 2765-step reference run): **62.7 MLUPS vs
the XLA path's 61.1** — no meaningful gain.  The step is op-count-bound
end to end: the kernel compresses the hydro phase but pays ~10 pad/crop
copies at the 621→640 boundary plus the unchanged XLA geometry+reseed
tail, which dominate at this lattice size.  Kept as an equivalence-
tested alternative path and a worked example of in-kernel Zou/He,
Bouzidi and true-width periodic wrap; the XLA path remains production.
Trajectories diverge from the XLA path over tens of steps (ulp-level
reassociation amplified by the chaotic staircase wall decisions — the
same sensitivity documented for the C++ comparison).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.collision import MRT_M_I, MRT_M_I_INV
from ..core.lattice import D2Q9, EX_I, EY_I, JB_I, K_FROM_I
from ..models import pulsatile as pmod
from ..models.pulsatile import PulsatileParams

LANE = 128
Q = 9


def _pad_x(a, nxp):
    pad = [(0, 0)] * a.ndim
    pad[-1] = (0, nxp - a.shape[-1])
    return jnp.pad(a, pad)


def _roll2(arr, cy, cx):
    """Value at (y+cy, x+cx) (wrapping at the PADDED width)."""
    out = arr
    if cy:
        out = pltpu.roll(out, (-cy) % arr.shape[-2], arr.ndim - 2)
    if cx:
        out = pltpu.roll(out, (-cx) % arr.shape[-1], arr.ndim - 1)
    return out


def _make_kernel(p: PulsatileParams, nxp: int):
    ny, nx = p.ny, p.nx
    w = [float(x) for x in D2Q9.w]
    cf = [(float(D2Q9.c[k][0]), float(D2Q9.c[k][1])) for k in range(Q)]
    ci = [(int(D2Q9.c[k][0]), int(D2Q9.c[k][1])) for k in range(Q)]
    rho0 = float(p.rho0)
    kf = [int(K_FROM_I[i]) for i in range(9)]
    S = p.S
    act = [(j, float(S[j] - 1.0)) for j in range(9) if S[j] != 1.0]
    Mrows = {j: [float(x) for x in MRT_M_I[j]] for j, _ in act}
    Micol = {j: [float(x) for x in MRT_M_I_INV[:, j]] for j, _ in act}

    def kernel(gc_ref, gs_ref, P_ref, Ux_ref, Uy_ref, d1_ref, d2_ref,
               Ff_ref, fl_ref, aux_ref,
               gout_ref, g2_ref, P2_ref, Ux2_ref, Uy2_ref):
        # Mosaic iota must be integer-typed; cast to f32 for the mask math
        colv = jax.lax.broadcasted_iota(jnp.int32, (ny, nxp), 1
                                        ).astype(jnp.float32)
        rowv = jax.lax.broadcasted_iota(jnp.int32, (ny, nxp), 0
                                        ).astype(jnp.float32)
        dom = (colv < float(nx)).astype(jnp.float32)
        fl = fl_ref[...]
        Ffld = Ff_ref[...]
        P = P_ref[...]
        Ux = Ux_ref[...]
        Uy = Uy_ref[...]

        # ---- collide: pressure-form equilibrium + low-rank MRT ----
        usqr = 1.5 * (Ux * Ux + Uy * Uy)
        geq = []
        for k in range(Q):
            cx, cy = cf[k]
            cu = cx * Ux + cy * Uy
            geq.append(w[k] * (P + rho0 / 3.0 * (cu * (3.0 + 4.5 * cu)
                                                 - usqr)))
        gc = [gc_ref[k] for k in range(Q)]
        gs = [gs_ref[k] for k in range(Q)]
        dneq = [gc[k] - geq[k] for k in range(Q)]
        post = [gc[k] - dneq[k] for k in range(Q)]     # == geq (start)
        for j, sj1 in act:
            mom = None
            for k in range(Q):
                m = Mrows[j][k]
                if m == 0.0:
                    continue
                term = m * dneq[k]
                mom = term if mom is None else mom + term
            for k in range(Q):
                mi = Micol[j][k]
                if mi != 0.0:
                    post[k] = post[k] - (sj1 * mi) * mom
        solid = fl <= 0.5
        gout = [jnp.where(solid, gs[k], post[k]) for k in range(Q)]

        # ---- Bouzidi (bottom-wall pass then top-wall pass) ----
        def bouzidi_pass(gv, dref):
            new = list(gv)
            for I in range(1, 9):
                D = dref[I - 1]
                ex, ey = int(EX_I[I]), int(EY_I[I])
                kI = kf[I]
                kJ = kf[int(JB_I[I])]

                def inDom(m):
                    xm = colv + float(m * ex)
                    ym = rowv + float(m * ey)
                    return ((xm >= 0.0) & (xm < float(nx))
                            & (ym >= 0.0) & (ym < float(ny)))

                in1, in2, in3 = inDom(1), inDom(2), inDom(3)
                active = (D < 1.0) & in1

                gJ1 = _roll2(gv[kJ], ey, ex)
                gJ2 = _roll2(gv[kJ], 2 * ey, 2 * ex)
                gJ3 = _roll2(gv[kJ], 3 * ey, 3 * ex)
                gI1 = _roll2(gv[kI], ey, ex)
                gI2 = _roll2(gv[kI], 2 * ey, 2 * ex)
                F1 = _roll2(Ffld, ey, ex)
                F2 = _roll2(Ffld, 2 * ey, 2 * ex)
                F3 = _roll2(Ffld, 3 * ey, 3 * ex)

                F2_eff = jnp.where(in2, F2, F1)
                use1for2 = (~in2) | (F2_eff < 1.0)
                gJ2 = jnp.where(use1for2, gJ1, gJ2)
                gI2 = jnp.where(use1for2, gI1, gI2)
                F3_eff = jnp.where(in3, F3, F1)
                gJ3 = jnp.where(in3, gJ3, gJ1)
                gJ3 = jnp.where(F3_eff < 1.0, gJ2, gJ3)

                lt = (gJ1 * (1 + 2 * D) * D
                      + gJ2 * (1 - 2 * D) * (1 + 2 * D)
                      - gJ3 * (1 - 2 * D) * D)
                ge = (gJ1 - gI1 * (1 - 2 * D) * (1 + 2 * D)
                      + gI2 * (1 - 2 * D) * D) / (D * (1 + 2 * D) + 1e-30)
                val = jnp.where(D < 0.5, lt, ge)
                new[kI] = jnp.where(active, val, new[kI])
            return new

        gout = bouzidi_pass(gout, d1_ref)
        gout = bouzidi_pass(gout, d2_ref)
        gout = [gout[k] * dom for k in range(Q)]

        # ---- pull streaming with TRUE-width x wrap ----
        col0 = (colv == 0.0)
        colL = (colv == float(nx - 1))
        onehot0 = col0.astype(jnp.float32)
        onehotL = colL.astype(jnp.float32)
        g2 = [None] * Q
        for k in range(Q):
            cx, cy = ci[k]
            ry = _roll2(gout[k], -cy, 0) if cy else gout[k]
            pulled = _roll2(ry, 0, -cx) if cx else ry
            if cx == 1:
                # col 0 pulled from padded col nxp-1; true source is nx-1
                src = jnp.sum(ry * onehotL, axis=1, keepdims=True)
                pulled = jnp.where(col0, src, pulled)
            elif cx == -1:
                # col nx-1 pulled from padding col nx; true source is 0
                src = jnp.sum(ry * onehot0, axis=1, keepdims=True)
                pulled = jnp.where(colL, src, pulled)
            g2[k] = pulled

        # ---- Zou/He pressure inlet/outlet (I-space, vessel rows only) ----
        Pin = aux_ref[0, 0]
        Pout = aux_ref[0, 1]
        m_in = ((rowv >= aux_ref[0, 2]) & (rowv <= aux_ref[0, 3]) & col0)
        m_out = ((rowv >= aux_ref[0, 4]) & (rowv <= aux_ref[0, 5]) & colL)

        g0, g2i, g3 = g2[kf[0]], g2[kf[2]], g2[kf[3]]
        g4, g6, g7 = g2[kf[4]], g2[kf[6]], g2[kf[7]]
        Uin = (Pin - g0 - g2i - 2 * g3 - g4 - 2 * g6 - 2 * g7) * 3.0 / rho0
        g2[kf[1]] = jnp.where(m_in, g3 + 2.0 * rho0 / 9.0 * Uin, g2[kf[1]])
        g2[kf[5]] = jnp.where(
            m_in, rho0 / 18.0 * Uin - 0.5 * (g2i - g4) + g7, g2[kf[5]])
        g2[kf[8]] = jnp.where(
            m_in, rho0 / 18.0 * Uin + 0.5 * (g2i - g4) + g6, g2[kf[8]])

        h0, h1, h2 = g2[kf[0]], g2[kf[1]], g2[kf[2]]
        h4, h5, h8 = g2[kf[4]], g2[kf[5]], g2[kf[8]]
        Uout = (h0 + 2 * h1 + h2 + h4 + 2 * h5 + 2 * h8 - Pout) * 3.0 / rho0
        g2[kf[3]] = jnp.where(m_out, h1 - 2.0 * rho0 / 9.0 * Uout, g2[kf[3]])
        g2[kf[6]] = jnp.where(
            m_out, -rho0 / 18.0 * Uout - 0.5 * (h2 - h4) + h8, g2[kf[6]])
        g2[kf[7]] = jnp.where(
            m_out, -rho0 / 18.0 * Uout + 0.5 * (h2 - h4) + h5, g2[kf[7]])
        g2 = [g2[k] * dom for k in range(Q)]

        # ---- macroscopic (k=0-skipping momentum quirk, :216-230) ----
        Psum = g2[0]
        for k in range(1, Q):
            Psum = Psum + g2[k]
        momx = None
        momy = None
        for k in range(1, Q):                 # k=0 (W) excluded — reference
            cx, cy = cf[k]
            if cx:
                momx = cx * g2[k] if momx is None else momx + cx * g2[k]
            if cy:
                momy = cy * g2[k] if momy is None else momy + cy * g2[k]
        P2_ref[...] = Psum * fl
        Ux2_ref[...] = 3.0 * momx / rho0 * fl
        Uy2_ref[...] = 3.0 * momy / rho0 * fl
        for k in range(Q):
            gout_ref[k] = gout[k]
            g2_ref[k] = g2[k]

    return kernel


def _make_call(p: PulsatileParams, nxp, interpret):
    ny = p.ny
    kernel = _make_kernel(p, nxp)
    fld = jax.ShapeDtypeStruct((ny, nxp), jnp.float32)
    pop = jax.ShapeDtypeStruct((Q, ny, nxp), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=(pop, pop, fld, fld, fld),
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("p", "interpret"))
def step_fused(state, t, p: PulsatileParams, interpret: bool = False):
    """One full pulsatile step: fused hydro kernel + XLA geometry tail.

    f32 production path; the XLA :func:`..models.pulsatile.step` remains
    the parity oracle (the kernel's arithmetic differs at the ulp level —
    low-rank MRT vs dense matmul)."""
    nx, ny = p.nx, p.ny
    nxp = ((nx + LANE - 1) // LANE) * LANE
    f32 = jnp.float32

    delta1, delta2 = pmod.border_deltas(state.F, state.yr1, state.yr2, p)
    Ffld = state.F[1:-1, 1:-1]
    fl = state.fluid.astype(f32)

    # Zou/He waveforms + row gates (reference :618-669)
    tt = jnp.asarray(t, f32)
    Pin = jnp.where(t >= p.t_start,
                    p.pin + p.p_osc * jnp.sin(p.omega * (tt + 1 - p.t_start)),
                    p.pin).astype(f32)
    Pout = jnp.where(t >= p.t_start + p.t_propagation,
                     p.pout + p.p_osc * jnp.sin(
                         p.omega * (tt + 1 - p.t_start - p.t_propagation)),
                     p.pout)
    if p.is_severed:
        Pout = jnp.where(t > p.t_sever, 0.0, Pout)
    Pout = Pout.astype(f32)
    ylo_i = jnp.maximum(jnp.ceil(state.yr1[0] - 0.01), 0.0)
    yhi_i = jnp.minimum(jnp.floor(state.yr2[0] + 0.01), float(p.ny - 1))
    ylo_o = jnp.maximum(jnp.ceil(state.yr1[-1] - 0.01), 0.0)
    yhi_o = jnp.minimum(jnp.floor(state.yr2[-1] + 0.01), float(p.ny - 1))
    aux = jnp.zeros((1, LANE), f32)
    aux = aux.at[0, :6].set(jnp.stack([
        Pin, Pout, ylo_i.astype(f32), yhi_i.astype(f32),
        ylo_o.astype(f32), yhi_o.astype(f32)]))

    call = _make_call(p, nxp, interpret)
    gout_p, g2_p, P_p, Ux_p, Uy_p = call(
        _pad_x(state.g_coll.astype(f32), nxp),
        _pad_x(state.g_stream.astype(f32), nxp),
        _pad_x(state.P.astype(f32), nxp),
        _pad_x(state.Ux.astype(f32), nxp),
        _pad_x(state.Uy.astype(f32), nxp),
        _pad_x(delta1.astype(f32), nxp),
        _pad_x(delta2.astype(f32), nxp),
        _pad_x(Ffld.astype(f32), nxp),
        _pad_x(fl, nxp),
        aux,
    )
    gout = gout_p[:, :, :nx]
    g = g2_p[:, :, :nx]
    P = P_p[:, :nx]
    Ux = Ux_p[:, :nx]
    Uy = Uy_p[:, :nx]
    return pmod.finish_step(state, gout, g, P, Ux, Uy, p)


@partial(jax.jit, static_argnames=("p", "n_steps", "interpret"))
def run_fused(state, t0, p: PulsatileParams, n_steps: int,
              interpret: bool = False):
    def body(carry, i):
        return step_fused(carry, t0 + i, p, interpret=interpret), None

    state, _ = jax.lax.scan(body, state, jnp.arange(n_steps))
    return state

"""Fused Pallas TPU kernel for the reactive MRT combustion step.

TPU-native fusion of the reference's per-cell combustion functor
(``CooLBM_MRT_combustion.cpp:3018-3126``) in its default configuration
(inflow/outflow channel, LI2014 conjugate heat, Arrhenius surface
reaction): the entire 420×80 lattice — all four populations, the static
link masks and the interface-normal factors — lives in VMEM, and one
kernel launch advances ``nsub`` full steps under an in-kernel
``fori_loop`` whose state lives in the (input-aliased) output refs.

Performance model (measured on v5e): on a 33.6k-cell lattice every
non-fusable op (roll, select, reduction, ref slice) costs ~2-13 µs
REGARDLESS of array size, so throughput is op-COUNT-bound, not
FLOP-bound.  The kernel is therefore written fully Q-VECTORIZED: every
per-direction quantity is one op over a stacked ``(9, ny, nx)`` array
(velocity-set constants enter as ``(9,1,1)`` broadcasts, moment
projections as one ``tensordot``), populations share streaming rolls via
``(4, ny, nx)`` stacks, and loop state stays in VMEM refs (a fori_loop
carry of arrays is copied through the scoped-VMEM stack every iteration
— ~1.2 ms/substep measured — while ref reads/writes are plain accesses).

The kernel transliterates the XLA step phase-for-phase (same op order,
same select semantics), so it is pinned to the XLA oracle by an
interpreter-mode equivalence test (``tests/test_pallas_combustion.py``).

Supported = all four reference geometry branches (``inflow_outflow``
default plus the ``cavity``/``couette``/``poiseuille`` test topologies,
round-5 extension: the channel-only BC phases are compile-time-gated out
and the MRT body force reuses the low-rank collision factorization) with
``conj_scheme='li2014'`` (or ``'none'``); no temperature-coupling
corrector, no free-slip walls.  The y-striped variant additionally
rejects the x-periodic topologies unless nx is lane-aligned (the DMA pad
would corrupt the wrap).  Anything else raises ``NotImplementedError`` —
use :func:`..models.combustion.run`.

Measured 420×80 f32 on a SERIAL v5e chip (round 2): **452.9 MLUPS** with
all four populations (0.07 ms/step) and 505.5 flow-only, vs the XLA
path's 153.8 / 367.4 — 2.9× on the full physics.  (An earlier
chip-contended reading suggested the kernel was no faster than XLA; it
is.)  The whole-lattice-in-VMEM layout OOMs beyond ~60k cells (840×160
needs 179 MB); there the y-STRIPED variant of the same step body takes
over (``stripe_tile`` in :func:`run_fused`): grid programs DMA
halo-extended stripes of the state and static masks, lane-padded to a
128 multiple (Mosaic DMA lane alignment — the pads are inert, see
:func:`_make_body`).  Measured 840×160 konv (round 3, serial chip):
**563.6 MLUPS** at tile=40/halo=16/nsub=4 (447.5 at halo=8/nsub=2) vs
416 XLA.  The striped step is op-count-bound — per-step cost ≈
n_stripes × a near-fixed substep cost (~44 µs regardless of stripe
height) — so fewer/taller stripes win, but tile=80 (2 stripes, 71 MB
of DMA buffers) exceeds VMEM; tile=40 (4 stripes) is the
hardware-feasible optimum.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernel_utils
from ..models import combustion as cbm
from ..models.combustion import (C, M_INV, M_MAT, OPP, Q, W,
                                 CombustionParams, CombustionState)


_roll2 = kernel_utils.roll2


_TOPOLOGIES = ("inflow_outflow", "cavity", "couette", "poiseuille")
_X_PERIODIC = ("couette", "poiseuille")     # rolls must truly wrap in x


def _check_supported(p: CombustionParams, striped: bool = False):
    if (p.topology not in _TOPOLOGIES or p.scheme not in ("li2014", "none")
            or p.temperature_coupling or p.y_freeslip):
        raise NotImplementedError(
            "fused combustion kernel supports the reference geometry "
            "branches (inflow_outflow/cavity/couette/poiseuille, round-5 "
            "extension) with li2014/none conjugate scheme, no TC "
            f"corrector, no free-slip; got topology={p.topology!r} "
            f"scheme={p.scheme!r} TC={p.temperature_coupling} "
            f"freeslip={p.y_freeslip} — use models.combustion.run")
    if striped and p.topology in _X_PERIODIC and p.nx % 128:
        raise NotImplementedError(
            "the y-striped kernel lane-pads nx to a 128 multiple, which "
            f"corrupts the x-periodic wrap {p.topology!r} relies on; use "
            f"the whole-lattice kernel, nx % 128 == 0, or "
            "models.combustion.run")


def supported(p: CombustionParams, striped: bool = False) -> bool:
    """True iff the fused kernels can run this configuration (the loud
    rationale lives in :func:`_check_supported`)."""
    try:
        _check_supported(p, striped=striped)
    except NotImplementedError:
        return False
    return True


def _mrt_terms(Svec):
    """Host-side factorization of A−I = Σ_j (S_j−1)·M⁻¹[:,j] M[j,:]."""
    s = np.asarray(Svec, dtype=np.float64)
    if np.all(s == s[0]):
        return ("bgk", float(s[0]))
    idx = [j for j in range(Q) if s[j] != 1.0]
    MJ = M_MAT[idx, :].astype(np.float32)                       # (r, 9)
    MI = (M_INV[:, idx] * (s[idx] - 1.0)).astype(np.float32)    # (9, r)
    return ("rank", (MJ, MI))


def build_mask_inputs(p: CombustionParams, flags=None, f_solid=None):
    """Precompute the static per-direction masks the kernel needs, packed
    as two stacked f32 arrays: ``masks9`` (8, 9, ny, nx) and ``masks2``
    (6, ny, nx).  Layout in `_M9`/`_M2`."""
    if flags is None:
        flags, f_solid = cbm.build_geometry(p)
    tab = cbm.build_static_tables(flags, p)
    ny, nx = flags.shape

    def shift(a, cx, cy):
        return cbm._shift(a, cx, cy)

    nb_obst = tab["nb_obst"].astype(np.float32)
    nb_wall = tab["nb_wall"].astype(np.float32)
    ck_n = tab["ck_n"].astype(np.float32)
    is_bulk = tab["is_bulk"]
    is_obst = tab["is_obst"]

    # stream_flow's momentum-exchange term, pre-shifted per OUT direction k:
    # fs_at[k] = f_solid[opp k] evaluated at the neighbour j + c_{opp k}
    fs_at = np.zeros((Q, ny, nx), dtype=np.float32)
    iface = np.zeros((Q, ny, nx), dtype=np.float32)
    sender_iface = np.zeros((Q, ny, nx), dtype=np.float32)
    link_solid = np.zeros((Q, ny, nx), dtype=np.float32)
    gas_link = np.zeros((Q, ny, nx), dtype=np.float32)
    for k in range(1, Q):
        ko = int(OPP[k])
        cx, cy = int(C[k, 0]), int(C[k, 1])
        fs_at[k] = shift(np.asarray(f_solid[ko]),
                         int(C[ko, 0]), int(C[ko, 1])).astype(np.float32)
        up_is_obst = np.roll(is_obst, (cy, cx), axis=(0, 1))
        up_is_bulk = np.roll(is_bulk, (cy, cx), axis=(0, 1))
        iface[k] = ((up_is_obst & is_bulk) | (up_is_bulk & is_obst))
        sender_iface[k] = ((is_bulk & tab["nb_obst"][k])
                           | (is_obst & tab["nb_bulk"][k]))
        link_solid[k] = is_obst & tab["nb_bulk"][k]
        gas_link[k] = is_bulk & np.roll(is_obst, (cy, cx), axis=(0, 1))

    masks9 = np.stack([nb_obst, nb_wall, ck_n, fs_at, iface, sender_iface,
                       link_solid, gas_link]).astype(np.float32)

    solid = ~is_bulk
    s_n = shift(solid, 0, 1)     # north neighbour is solid
    s_s = shift(solid, 0, -1)
    s_e = shift(solid, 1, 0)
    s_w = shift(solid, -1, 0)
    masks2 = np.stack([is_bulk, is_obst, s_n, s_s, s_e, s_w]
                      ).astype(np.float32)
    return jnp.asarray(masks9), jnp.asarray(masks2)


_M9 = dict(nb_obst=0, nb_wall=1, ck_n=2, fs_at=3, iface=4, sender_iface=5,
           link_solid=6, gas_link=7)
_M2 = dict(is_bulk=0, is_obst=1, s_n=2, s_s=3, s_e=4, s_w=5)


def _make_body(p: CombustionParams, ny: int, nx: int, konv: bool,
               nx_arr: int | None = None):
    """Build (init_consts, step) closures for one combustion step on a
    block of ``H`` rows whose row 0 is global row ``row0`` (H=ny, row0=0
    recovers the whole-lattice kernel; the striped kernel passes
    halo-extended blocks with per-stripe offsets).  All row-indexed BC
    masks compare GLOBAL row numbers, so stripes that don't contain a BC
    row compile the write to a no-op select.

    ``nx_arr`` > nx lane-pads the arrays to a 128 multiple (Mosaic DMA
    lane-alignment, striped path only).  The pad columns are inert for
    the x-walled topologies: inflow_outflow has a WALL column at x=0 and
    the outlet pin overwrites every wrap-consuming population at x=nx−1
    (reference iniCavity :3756-3821), and cavity walls both columns — so
    values wrapped through the pad never reach observable state.  The
    x-PERIODIC topologies (couette/poiseuille) rely on a true wrap, so
    the striped path rejects them unless nx is already lane-aligned
    (:func:`_check_supported` ``striped=True``)."""
    if nx_arr is None:
        nx_arr = nx
    S, SO2, SCO2, ST, STs = p.S_vectors()
    t_flow = _mrt_terms(S)
    t_O2 = _mrt_terms(SO2)
    t_CO2 = _mrt_terms(SCO2)
    t_T = _mrt_terms(ST)
    t_Ts = _mrt_terms(STs)
    Wf = [float(w) for w in W]
    Ci = [(int(C[k, 0]), int(C[k, 1])) for k in range(Q)]

    # (Q,1,1) broadcast constants, built in-kernel from an iota (Pallas
    # rejects captured ndarray constants); called once per kernel trace.
    def const9(vals):
        k_idx = jax.lax.broadcasted_iota(jnp.int32, (Q, 1, 1), 0)
        out = jnp.zeros((Q, 1, 1), jnp.float32)
        for i, v in enumerate(vals):
            if float(v) != 0.0:
                out = jnp.where(k_idx == i, jnp.float32(v), out)
        return out
    sig = p.sigma
    cj_a = (1.0 - sig) / (1.0 + sig)
    cj_b = 2.0 / (1.0 + sig)
    cj_c = 2.0 * sig / (1.0 + sig)
    li2014 = p.scheme == "li2014"
    # inflow/outflow-channel-only phases (extrapolated outlet, inlet
    # scalar Dirichlet, T-wall ping-pong keeps, outlet pin); the other
    # reference geometry branches (:3756-4073) skip them
    io = p.topology == "inflow_outflow"
    body_force = bool(p.dpdx or p.dpdy)

    class K:
        """Per-trace constants (lazily built inside the kernel)."""
        W3 = None
        CX3 = None
        CY3 = None
        mrt = None
        rowg = None      # (H, nx) int32 GLOBAL row index of each cell
        colv = None      # (H, nx) int32 column index

    def init_consts(H, row0):
        K.rowg = jax.lax.broadcasted_iota(jnp.int32, (H, nx_arr), 0) + row0
        K.colv = jax.lax.broadcasted_iota(jnp.int32, (H, nx_arr), 1)
        K.W3 = const9(W)
        K.CX3 = const9(C[:, 0])
        K.CY3 = const9(C[:, 1])
        K.mrt = {}
        for name, terms in (("flow", t_flow), ("O2", t_O2), ("CO2", t_CO2),
                            ("T", t_T), ("Ts", t_Ts)):
            kind, data = terms
            if kind == "rank":
                MJ, MI = data
                K.mrt[name] = (kind, ([const9(MJ[r]) for r in
                                       range(MJ.shape[0])],
                                      [const9(MI[:, r]) for r in
                                       range(MI.shape[1])]))
            else:
                K.mrt[name] = terms

    def cu_of(ux, uy):
        return K.CX3 * ux[None] + K.CY3 * uy[None]      # (9, ny, nx)

    def equilibrium(amp, cu, usqr):
        return K.W3 * amp[None] * (1.0 + 3.0 * cu + 4.5 * cu * cu
                                   - usqr[None])

    def collide(pop, eq, name):
        kind, data = K.mrt[name]
        if kind == "bgk":
            return pop - data * (pop - eq)
        rows, cols = data
        dneq = pop - eq
        out = eq
        for rw, cl in zip(rows, cols):
            m = jnp.sum(rw * dneq, axis=0)              # moment (ny, nx)
            out = out - cl * m[None]
        return out

    def macro_uv(f):
        rho = jnp.sum(f, axis=0)
        momx = jnp.sum(K.CX3 * f, axis=0)
        momy = jnp.sum(K.CY3 * f, axis=0)
        # one reciprocal for both components (VPU divides are multi-pass)
        inv_rho = 1.0 / rho
        return rho, momx * inv_rho, momy * inv_rho

    def row_mask(i):
        return K.rowg == i          # i is a GLOBAL row number

    def col_mask(i):
        return K.colv == i

    def apply_flow_outlet(f):
        """Transliteration of models.combustion.apply_flow_outlet
        (reference Boundaries, :1990-2091) as full-field masked updates;
        ρ/ux/uy rolled as one stacked array."""
        rho_f, ux_f, uy_f = macro_uv(f)
        st3 = jnp.stack([rho_f, ux_f, uy_f])
        m1 = _roll2(st3, 0, -1)      # values of column x−1 placed at x
        m2r = _roll2(st3, 0, -2)
        ex3 = (4.0 * m1 - m2r) * (1.0 / 3.0)
        rho, ux, uy = ex3[0], ex3[1], ex3[2]
        # equilibrium() expects the pre-scaled 1.5·u² (the reference and the
        # XLA oracle both subtract 1.5·usqr in the outlet feq —
        # CooLBM_MRT_combustion.cpp:2025, models/combustion.py:449).
        usqr = 1.5 * (ux * ux + uy * uy)
        cu = cu_of(ux, uy)
        feq = equilibrium(rho, cu, usqr)
        f3 = feq[3] + 2.0 / 3.0 * rho * ux + 2.0 / 3.0 * (
            feq[3] - f[1] + feq[7] - f[5] + feq[6] - f[8])
        t367 = Wf[3] + Wf[7] + Wf[6]
        t76 = Wf[7] + Wf[6]
        e1 = (rho * ux - f[1] - f[5] - f[8] + feq[6] + feq[3] + feq[7]) / t367
        e2 = (rho * uy - f[2] - f[5] + f[8] + f[4] - feq[6] + feq[7]) / t76
        f6 = feq[6] - Wf[6] * (e1 - e2)
        f7 = feq[7] - Wf[7] * (e1 + e2)

        interior = (K.rowg > 1) & (K.rowg < ny - 2)
        m_out = col_mask(nx - 1)
        mi = m_out & interior
        f = [f[k] for k in range(Q)]          # per-k writes: list form
        f[3] = jnp.where(mi, f3, f[3])
        f[6] = jnp.where(mi, f6, f[6])
        f[7] = jnp.where(mi, f7, f[7])

        # corners (reference :2052-2091); reads use the post-interior f
        for yc, sgn in ((1, -1.0), (ny - 2, 1.0)):
            mc = m_out & row_mask(yc)
            if sgn < 0:
                f8 = (rho + rho * ux - (2.0 / 3.0) * rho * uy - f[0]
                      - 2.0 * (f[1] + f[4] + f[8])) * 0.5
            else:
                f8 = (rho + rho * ux + (2.0 / 3.0) * rho * uy - f[0]
                      - 2.0 * (f[1] + f[2] + f[5])) * 0.5
            f6c = f8 + (rho * uy - rho * ux) * (1.0 / 6.0)
            f3c = f[1] - 2.0 / 3.0 * rho * ux
            f7c = f[5] + (rho * uy - rho * ux) * (1.0 / 6.0)
            f24 = (f[4] + 2.0 / 3.0 * rho * uy if sgn < 0
                   else f[2] - 2.0 / 3.0 * rho * uy)
            f[8] = jnp.where(mc, f8, f[8])
            f[6] = jnp.where(mc, f6c, f[6])
            f[3] = jnp.where(mc, f3c, f[3])
            f[7] = jnp.where(mc, f7c, f[7])
            k24 = 2 if sgn < 0 else 4
            f[k24] = jnp.where(mc, f24, f[k24])
        return jnp.stack(f)

    def apply_scalar_bcs_all(gs, amps_inlet, f_bc):
        """models.combustion.apply_scalar_bcs for all three scalar
        populations at once (amp rolls batched over a stacked sum array);
        identical op order per population.  Mirrors the oracle's
        order-fidelity details: amp_top overrides at x=1 (inlet-fixed) and
        x=nx−1 (outlet-fixed), species outlet excluding rows 1/ny−2, and
        the species outlet corner equilibrium scheme (gs[0], gs[1]) with
        u from the outlet-BC-fixed flow ``f_bc``."""
        gs = list(gs)

        gs = [[g[k] for k in range(Q)] for g in gs]

        def triplet(g, amp_full, mask, pairs):
            for k_in, k_w, k_out in pairs:
                val = -g[k_out] + 2.0 * Wf[k_w] * amp_full
                g[k_in] = jnp.where(mask, val, g[k_in])
            return g

        def sums():
            return jnp.stack([sum(g[1:], g[0]) for g in gs])

        INP = [(5, 7, 7), (1, 3, 3), (8, 6, 6)]
        OUTP = [(6, 8, 8), (3, 1, 1), (7, 5, 5)]
        s3 = sums()
        amp_top = (4.0 * _roll2(s3, -1, 0) - _roll2(s3, -2, 0)) * (1.0 / 3.0)
        amp_out = (4.0 * _roll2(s3, 0, -1) - _roll2(s3, 0, -2)) * (1.0 / 3.0)
        # x=1 / x=nx−1 overrides: rows ny−3/ny−4 read their column's
        # inlet/outlet fix first (reference per-cell i-order)
        m_in_fix = []
        m_out_fix = []
        for i in range(3):
            g = gs[i]
            din = sum((-g[k_out] + 2.0 * Wf[k_w] * amps_inlet[i]) - g[k_in]
                      for k_in, k_w, k_out in INP)
            dout = sum((-g[k_out] + 2.0 * Wf[k_w] * amp_out[i]) - g[k_in]
                       for k_in, k_w, k_out in OUTP)
            m_in_fix.append(s3[i] + din)
            m_out_fix.append(s3[i] + dout)
        mfix = jnp.stack(m_in_fix + m_out_fix)          # (6, ny, nx)
        atop_fix = (4.0 * _roll2(mfix, -1, 0) - _roll2(mfix, -2, 0)) * (1.0 / 3.0)
        m_in = col_mask(1)
        m_out = col_mask(nx - 1)
        amp_top = jnp.where(m_in[None], atop_fix[:3], amp_top)
        amp_top = jnp.where(m_out[None], atop_fix[3:], amp_top)
        m_top = row_mask(ny - 2)
        for i in range(3):
            gs[i] = triplet(gs[i], amp_top[i], m_top,
                            [(7, 7, 5), (4, 2, 2), (8, 6, 6)])
        s3 = sums()
        amp_bot = (4.0 * _roll2(s3, 1, 0) - _roll2(s3, 2, 0)) * (1.0 / 3.0)
        m_bot = row_mask(1)
        for i in range(3):
            gs[i] = triplet(gs[i], amp_bot[i], m_bot,
                            [(6, 8, 8), (2, 4, 4), (5, 7, 7)])
        for i in range(3):
            gs[i] = triplet(gs[i], amps_inlet[i], m_in,
                            [(5, 7, 7), (1, 3, 3), (8, 6, 6)])
        # outlet: species (i=0,1) exclude rows 1/ny−2 (corners below);
        # temperature (i=2) all rows
        no_corner = (K.rowg != 1) & (K.rowg != ny - 2)
        for i in range(3):
            mask_i = m_out & no_corner if i < 2 else m_out
            gs[i] = triplet(gs[i], amp_out[i], mask_i, OUTP)
        # species outlet corner equilibrium (reference Boundaries_Comp
        # :2185-2275); Y_lok extrapolates from post-row-fix neighbours
        s2 = jnp.stack([sum(gs[i][1:], gs[i][0]) for i in range(2)])
        Ylok2 = (4.0 * _roll2(s2, 0, -1) - _roll2(s2, 0, -2)) * (1.0 / 3.0)
        rho_c, ux_c, uy_c = macro_uv(f_bc)
        usqr_c = 1.5 * (ux_c * ux_c + uy_c * uy_c)
        cu_c = cu_of(ux_c, uy_c)
        shape_c = 1.0 + 3.0 * cu_c + 4.5 * cu_c * cu_c - usqr_c[None]
        for yc, eps_kin, geq_kin in (
                (1, (0, 1, 4, 8), (2, 3, 5, 6, 7)),
                (ny - 2, (0, 1, 2, 5), (3, 4, 6, 7, 8))):
            mc = m_out & row_mask(yc)
            tw = sum(Wf[k] for k in geq_kin)
            for i in range(2):
                g = gs[i]
                Yc = s2[i]
                geq = [Yc * Wf[k] * shape_c[k] for k in range(Q)]
                eps = (sum(g[k] for k in eps_kin)
                       + sum(geq[k] for k in geq_kin))
                GC = (Ylok2[i] - eps) / tw
                for k in geq_kin:
                    g[k] = jnp.where(mc, geq[k] + Wf[k] * GC, g[k])
        return [jnp.stack(g) for g in gs]

    def grad_onesided(qs, m2):
        """_central_gradient with one-sided branches at solid neighbours,
        batched over a list of fields (stacked rolls)."""
        q = jnp.stack(qs)
        E = _roll2(q, 0, 1)
        Wq = _roll2(q, 0, -1)
        Nq = _roll2(q, 1, 0)
        Sq = _roll2(q, -1, 0)
        gx = (E - Wq) * 0.5
        gy = (Nq - Sq) * 0.5
        NN = _roll2(q, 2, 0)
        SS = _roll2(q, -2, 0)
        EE = _roll2(q, 0, 2)
        WW = _roll2(q, 0, -2)
        s_s = (m2["s_s"] > 0.5)[None]
        s_n = (m2["s_n"] > 0.5)[None]
        s_e = (m2["s_e"] > 0.5)[None]
        s_w = (m2["s_w"] > 0.5)[None]
        gy = jnp.where(s_s, (-3.0 * q + 4.0 * Nq - NN) * 0.5, gy)
        gy = jnp.where(s_n, (3.0 * q - 4.0 * Sq + SS) * 0.5, gy)
        gx = jnp.where(s_w, (-3.0 * q + 4.0 * E - EE) * 0.5, gx)
        gx = jnp.where(s_e, (3.0 * q - 4.0 * Wq + WW) * 0.5, gx)
        return gx, gy

    def step(carry, m9, m2):
        f, gO2, gCO2, gT, FO2p, FCO2p, FTp, gcoll = carry
        is_bulk_m = m2["is_bulk"] > 0.5

        # ── phase 1: BC fixes on incoming populations ──
        if io:
            f = apply_flow_outlet(f)
        if konv:
            if io:
                gO2, gCO2, gT = apply_scalar_bcs_all(
                    (gO2, gCO2, gT),
                    (p.Y_O2_inlet, p.Y_CO2_inlet, p.T_inlet), f)
            if li2014:
                # each opposite pair (k, ko) shares its two rolled g_coll
                # arrays (8 rolls, not 16)
                gTl = [gT[k] for k in range(Q)]
                for k in range(1, Q):
                    ko = int(OPP[k])
                    if ko < k:
                        continue
                    cx, cy = Ci[k]
                    A = _roll2(gcoll[ko], cy, cx)    # gcoll[ko] at nb +c_k
                    B = _roll2(gcoll[k], -cy, -cx)   # gcoll[k] at nb −c_k
                    gTl[ko] = jnp.where(
                        m9["link_solid"][k] > 0.5,
                        -cj_a * gcoll[k] + cj_b * A, gTl[ko])
                    gTl[k] = jnp.where(
                        m9["gas_link"][k] > 0.5,
                        cj_a * gcoll[ko] + cj_c * B, gTl[k])
                    gTl[k] = jnp.where(
                        m9["link_solid"][ko] > 0.5,
                        -cj_a * gcoll[ko] + cj_b * B, gTl[k])
                    gTl[ko] = jnp.where(
                        m9["gas_link"][ko] > 0.5,
                        cj_a * gcoll[k] + cj_c * A, gTl[ko])
                gT = jnp.stack(gTl)

        # ── phase 2: macro ──
        rho, ux, uy = macro_uv(f)
        if body_force:
            # half-force velocity shift (reference macro, :580)
            inv_rho_bf = 1.0 / rho
            ux = ux + (0.5 * p.dpdx) * inv_rho_bf
            uy = uy + (0.5 * p.dpdy) * inv_rho_bf
        usqr = 1.5 * (ux * ux + uy * uy)
        YO2 = jnp.sum(gO2, axis=0)
        YCO2 = jnp.sum(gCO2, axis=0)
        T = jnp.sum(gT, axis=0)

        # ── phase 3: collisions ──
        cu = cu_of(ux, uy)
        feq = equilibrium(rho, cu, usqr)
        post_f = collide(f, feq, "flow")
        if body_force:
            # MRT external force (reference collideMRT :2451-2475):
            # F_k = w_k (3 c·F + 9 (c·u)(c·F) − 3 u·F), moments relaxed
            # by (1 − S/2).  M⁻¹diag(1−S/2)M = I − ½M⁻¹SM, so the update
            # reuses the host-factorized low-rank (A−I) collision terms:
            # ΔF = ½F_k − ½Σ_j (S_j−1)·M⁻¹[:,j](M[j,:]·F_k).
            cF = K.CX3 * jnp.float32(p.dpdx) + K.CY3 * jnp.float32(p.dpdy)
            uF = ux * p.dpdx + uy * p.dpdy
            Fk = K.W3 * (3.0 * cF + 9.0 * cu * cF - 3.0 * uF[None])
            kind, data = K.mrt["flow"]
            if kind == "bgk":
                post_f = post_f + (1.0 - 0.5 * data) * Fk
            else:
                rows, cols = data
                acc = 0.5 * Fk
                for rw, cl in zip(rows, cols):
                    m = jnp.sum(rw * Fk, axis=0)
                    acc = acc - 0.5 * cl * m[None]
                post_f = post_f + acc

        if konv:
            gxs, gys = grad_onesided([rho, ux, uy, YO2, YCO2], m2)
            grho_x, grho_y = gxs[0], gys[0]
            gux, guy = gxs[1], gys[2]
            gY1x, gY1y = gxs[3], gys[3]
            gY2x, gY2y = gxs[4], gys[4]
            m_outcol = col_mask(nx - 1)
            gY1x = jnp.where(m_outcol, 0.0, gY1x)
            gY2x = jnp.where(m_outcol, 0.0, gY2x)
            gux = jnp.where(m_outcol, 0.0, gux)
            div_u = gux + guy
            inv_rho = 1.0 / rho
            F_O2 = (p.D_O2 * inv_rho) * (gY1x * grho_x + gY1y * grho_y) \
                + YO2 * div_u
            F_CO2 = (p.D_CO2 * inv_rho) * (gY2x * grho_x + gY2y * grho_y) \
                + YCO2 * div_u

            fac_O2 = 3.0 * (p.tau_O2 - 0.5) / p.tau_O2
            fac_CO2 = 3.0 * (p.tau_CO2 - 0.5) / p.tau_CO2
            fac_T = 3.0 * (p.tau_T - 0.5) / p.tau_T
            FO2_k = K.W3 * F_O2[None] * (1.0 + fac_O2 * cu)
            FCO2_k = K.W3 * F_CO2[None] * (1.0 + fac_CO2 * cu)

            geqO2 = equilibrium(YO2, cu, usqr)
            geqCO2 = equilibrium(YCO2, cu, usqr)
            post_O2 = (collide(gO2, geqO2, "O2") + FO2_k
                       + 0.5 * (FO2_k - FO2p))
            post_CO2 = (collide(gCO2, geqCO2, "CO2") + FCO2_k
                        + 0.5 * (FCO2_k - FCO2p))

            # reaction: interfacial mass fractions + gas-side heat release
            kr = p.A_pre * jnp.exp(
                -p.E_akt / (p.R_id * jnp.maximum(T, 1e-2)))
            denom = p.D_O2 + 0.5 * m9["ck_n"] * p.stoich_O2 * kr[None]
            YO2_int = p.D_O2 * YO2[None] / denom
            YCO2_int = YCO2[None] - (0.5 * m9["ck_n"] * kr[None] * YO2_int
                                     * p.M_CO2) / (p.D_CO2 * p.M_O2)
            y_sum = jnp.sum(jnp.where(m9["nb_obst"][1:5] > 0.5,
                                      YO2_int[1:5], 0.0), axis=0)
            if li2014:
                # F_r = kr·y_sum·rho/M_O2; F_T = F_r·Δh_r/(rho·cp): keep
                # the reference's two-stage form but fold the constants
                # and reuse inv_rho (2 array divides -> 0)
                F_r = kr * y_sum * rho * float(1.0 / p.M_O2)
                F_T = F_r * float(p.delta_hr / p.cp_gas) * inv_rho
            else:
                F_T = jnp.zeros_like(T)
            FT_k = K.W3 * F_T[None] * (1.0 + fac_T * cu)
            geqT = equilibrium(T, cu, usqr)
            post_T = collide(gT, geqT, "T") + FT_k + 0.5 * (FT_k - FTp)
            geqT_s = K.W3 * T[None]
            post_T_solid = collide(gT, geqT_s, "Ts")
        else:
            post_O2, post_CO2 = gO2, gCO2
            FO2_k, FCO2_k, FT_k = FO2p, FCO2p, FTp
            post_T = gT
            post_T_solid = gT

        # ── phase 4: streaming ──
        # One stacked roll per direction carries ALL populations.
        if konv:
            postT = jnp.where(is_bulk_m[None], post_T, post_T_solid)
            pops = jnp.stack([post_f, post_O2, post_CO2, postT])
        else:
            pops = post_f[None]
        newf = [post_f[0]]
        if konv:
            gcoll_new = jnp.where(m9["sender_iface"] > 0.5, postT, 0.0)
            newO2 = [post_O2[0]]
            newCO2 = [post_CO2[0]]
            newT = [postT[0]]
        for k in range(1, Q):
            ko = int(OPP[k])
            cx, cy = Ci[k]
            pulled = _roll2(pops[:, k], -cy, -cx)
            nb_solid = (m9["nb_obst"][ko] + m9["nb_wall"][ko]) > 0.5
            newf.append(jnp.where(
                nb_solid, post_f[ko] + m9["fs_at"][k], pulled[0]))
            if konv:
                nb_wall_m = m9["nb_wall"][ko] > 0.5
                nb_obst_m = m9["nb_obst"][ko] > 0.5
                vals = []
                for idx, (post, Y_int) in enumerate(
                        ((post_O2, YO2_int), (post_CO2, YCO2_int))):
                    bb = post[ko]
                    val = jnp.where(nb_wall_m, bb, pulled[1 + idx])
                    if p.solid_reaction:
                        abb = -post[ko] + 2.0 * Wf[ko] * Y_int[ko]
                        val = jnp.where(nb_obst_m, abb, val)
                    else:
                        val = jnp.where(nb_obst_m, bb, val)
                    vals.append(val)
                newO2.append(vals[0])
                newCO2.append(vals[1])
                if li2014:
                    valT = jnp.where(m9["iface"][k] > 0.5, gT[k], pulled[3])
                else:
                    valT = pulled[3]
                # streamTemp has NO wall bounce-back in inflow_outflow
                # (:1852-1911): wall-originating T pops keep the BC-fixed
                # values (mirrors models.combustion.stream_temperature);
                # the other topologies take the plain pull
                newT.append(jnp.where(nb_wall_m, gT[k], valT) if io
                            else valT)
        if io:
            # outlet ping-pong staleness: west-pointing pops of column
            # nx−1 are never written by the reference's push stream —
            # keep this step's BC-fixed values (mirrors the oracle's
            # outlet pin)
            m_pin = col_mask(nx - 1) & is_bulk_m
            for kp in (3, 6, 7):
                newf[kp] = jnp.where(m_pin, f[kp], newf[kp])
                if konv:
                    newO2[kp] = jnp.where(m_pin, gO2[kp], newO2[kp])
                    newCO2[kp] = jnp.where(m_pin, gCO2[kp], newCO2[kp])
                    newT[kp] = jnp.where(m_pin, gT[kp], newT[kp])
        newf = jnp.where(is_bulk_m[None], jnp.stack(newf), 0.0)
        if konv:
            newO2 = jnp.where(is_bulk_m[None], jnp.stack(newO2), 0.0)
            newCO2 = jnp.where(is_bulk_m[None], jnp.stack(newCO2), 0.0)
            newT = jnp.stack(newT)
        else:
            newO2, newCO2, newT, gcoll_new = gO2, gCO2, gT, gcoll

        return (newf, newO2, newCO2, newT, FO2_k, FCO2_k, FT_k, gcoll_new)

    return init_consts, step


def _make_kernel(p: CombustionParams, ny: int, nx: int, konv: bool,
                 nsub: int):
    """Whole-lattice kernel: all state in VMEM, nsub steps per launch."""
    init_consts, step = _make_body(p, ny, nx, konv)

    def kernel(f_r, gO2_r, gCO2_r, gT_r, FO2_r, FCO2_r, FT_r, gcoll_r,
               m9_r, m2_r,
               of_r, oO2_r, oCO2_r, oT_r, oFO2_r, oFCO2_r, oFT_r, ogc_r):
        init_consts(ny, 0)
        m9 = {name: m9_r[i] for name, i in _M9.items()}
        m2 = {name: m2_r[i] for name, i in _M2.items()}

        # the 8 state inputs are aliased onto the outputs
        # (input_output_aliases in _make_call), so the output refs already
        # hold the incoming state — no copy needed.
        del f_r, gO2_r, gCO2_r, gT_r, FO2_r, FCO2_r, FT_r, gcoll_r
        outs = (of_r, oO2_r, oCO2_r, oT_r, oFO2_r, oFCO2_r, oFT_r, ogc_r)

        # loop state lives in the output refs; the carry is a dummy scalar
        def body(_, tok):
            carry = tuple(o_r[...] for o_r in outs)
            res = step(carry, m9, m2)
            for o_r, val in zip(outs, res):
                o_r[...] = val
            return tok

        jax.lax.fori_loop(0, nsub, body, 0)

    return kernel


def pick_stripe_tile(ny: int, nx: int, halo: int = 8,
                     budget_mb: float = 55.0) -> int:
    """Largest stripe height (multiple of 8, ≥ halo, dividing ny) whose
    DMA'd block — 8 state arrays + the (8,9) mask stack at Text rows —
    fits ``budget_mb`` of VMEM, leaving the rest of the chip for the
    step's live intermediates.  The budget is calibrated on hardware at
    840×160: tile=40/halo=16 (buffers 48.6 MB) compiles and runs;
    tile=80/halo=8 (71.4 MB) exceeds VMEM."""
    nx_arr = -(-nx // 128) * 128     # lane padding (Mosaic DMA alignment)
    best = 0
    for t in range(max(8, halo), ny + 1, 8):
        if ny % t:
            continue
        text = t + 2 * halo
        mb = (8 * Q + len(_M9) * Q + len(_M2)) * text * nx_arr * 4 / 2**20
        mb += 8 * Q * t * nx_arr * 4 / 2**20      # output blocks
        if mb <= budget_mb:
            best = t
    if not best:
        raise ValueError(
            f"no stripe height for ny={ny} fits {budget_mb} MB; "
            "use the XLA path")
    return best


# per-substep halo consumption of the striped kernel: li2014 conjugate
# links (reach 1) + one-sided gradients (reach 2) + streaming (reach 1).
# The BC extrapolations read INWARD from the domain-edge rows, which are
# never cut edges, so they consume no stripe halo.
STRIPE_REACH = 4


def _make_striped_kernel(p: CombustionParams, ny: int, nx: int, konv: bool,
                         nsub: int, Ty: int, halo: int, nx_arr: int,
                         halo_in: bool = False):
    """y-striped kernel for lattices whose whole-lattice VMEM image
    exceeds the chip (≳60k cells): each grid program DMAs its stripe plus
    a ``halo``-row cut margin (8-aligned) of the 8 state arrays and the
    static masks from HBM, advances ``nsub`` steps on the halo-extended
    block (validity shrinks STRIPE_REACH rows per substep), and writes
    the stripe interior.  y never wraps (the domain is walled, reference
    CooLBM_MRT_combustion.cpp:1330-1370), so edge stripes zero-fill the
    out-of-domain margin; the zeros land only in rows the shrink
    discards.

    ``halo_in``: multi-chip mode — the caller passes arrays already
    extended by ``halo`` rows per side (filled by a shard_map ring
    exchange) plus a leading SMEM scalar holding the GLOBAL row index of
    extended row 0, so loads are uniform in-bounds and the BC row masks
    stay globally correct on every shard (``ny`` is then the LOCAL
    unextended row count; BC thresholds still use the global domain
    height via ``p.ny``)."""
    assert Ty % 8 == 0 and halo % 8 == 0, (Ty, halo)
    assert nsub * STRIPE_REACH <= halo, (nsub, halo)
    assert Ty >= halo, (Ty, halo)   # middle stripes DMA [y0-halo, y0+Ty+halo)
    assert nx_arr % 128 == 0, nx_arr   # Mosaic DMA lane alignment
    # BC row thresholds compare GLOBAL rows: p.ny even when ny is a
    # shard-local row count (halo_in mode)
    init_consts, step = _make_body(p, p.ny, nx, konv, nx_arr=nx_arr)
    Text = Ty + 2 * halo
    nprog = ny // Ty

    def kernel(*refs):
        if halo_in:
            row0_ref, refs = refs[0], refs[1:]
        ins = refs[:8]
        m9_h, m2_h = refs[8:10]
        outs = refs[10:18]
        bufs = refs[18:26]
        m9buf, m2buf, sem = refs[26:]
        i = pl.program_id(0)
        y0 = pl.multiple_of(i * Ty, 8)
        if halo_in:
            init_consts(Text, row0_ref[0, 0] + y0)
        else:
            init_consts(Text, y0 - halo)

        def cp(src, dst, slot):
            d = pltpu.make_async_copy(src, dst, sem.at[slot])
            d.start()
            d.wait()

        def load(lo_src, n_rows, lo_dst):
            """Copy n_rows of every input starting at global row lo_src
            into buffer row lo_dst."""
            for s, (src, dst) in enumerate(zip(ins, bufs)):
                cp(src.at[:, pl.ds(lo_src, n_rows), :],
                   dst.at[:, pl.ds(lo_dst, n_rows), :], s % 2)
            cp(m9_h.at[:, :, pl.ds(lo_src, n_rows), :],
               m9buf.at[:, :, pl.ds(lo_dst, n_rows), :], 0)
            cp(m2_h.at[:, pl.ds(lo_src, n_rows), :],
               m2buf.at[:, pl.ds(lo_dst, n_rows), :], 1)

        def zero_rows(lo, n_rows):
            for dst in bufs:
                dst[:, pl.ds(lo, n_rows), :] = jnp.zeros(
                    (Q, n_rows, nx_arr), jnp.float32)
            m9buf[:, :, pl.ds(lo, n_rows), :] = jnp.zeros(
                (len(_M9), Q, n_rows, nx_arr), jnp.float32)
            m2buf[:, pl.ds(lo, n_rows), :] = jnp.zeros(
                (len(_M2), n_rows, nx_arr), jnp.float32)

        if halo_in:
            # caller-extended arrays: uniform in-bounds loads, no edge cases
            load(y0, Text, 0)
        elif nprog == 1:
            zero_rows(0, halo)
            load(0, ny, halo)
            zero_rows(halo + ny, halo)
        else:
            @pl.when(i == 0)
            def _():
                zero_rows(0, halo)
                load(0, Ty + halo, halo)

            @pl.when(jnp.logical_and(i > 0, i < nprog - 1))
            def _():
                load(pl.multiple_of(y0 - halo, 8), Text, 0)

            @pl.when(i == nprog - 1)
            def _():
                load(pl.multiple_of(y0 - halo, 8), Ty + halo, 0)
                zero_rows(Ty + halo, halo)

        m9 = {name: m9buf[i_] for name, i_ in _M9.items()}
        m2 = {name: m2buf[i_] for name, i_ in _M2.items()}

        def body(_, tok):
            carry = tuple(b[...] for b in bufs)
            res = step(carry, m9, m2)
            for b, val in zip(bufs, res):
                b[...] = val
            return tok

        jax.lax.fori_loop(0, nsub, body, 0)
        for o_r, b in zip(outs, bufs):
            o_r[...] = b[:, pl.ds(halo, Ty), :]

    return kernel


def _make_striped_call(p, ny, nx, konv, nsub, Ty, halo, interpret, nx_arr):
    # a non-dividing tile would silently leave the last ny % Ty rows of
    # every output array unwritten (grid = ny // Ty)
    assert ny % Ty == 0, (ny, Ty)
    Text = Ty + 2 * halo
    kernel = _make_striped_kernel(p, ny, nx, konv, nsub, Ty, halo, nx_arr)
    shape = jax.ShapeDtypeStruct((Q, ny, nx_arr), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape,) * 8,
        grid=(ny // Ty,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 10,
        out_specs=(pl.BlockSpec((Q, Ty, nx_arr), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM),) * 8,
        scratch_shapes=[pltpu.VMEM((Q, Text, nx_arr), jnp.float32)] * 8
        + [pltpu.VMEM((len(_M9), Q, Text, nx_arr), jnp.float32),
           pltpu.VMEM((len(_M2), Text, nx_arr), jnp.float32),
           pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )


def step_fused_halo(args8, m9_ext, m2_ext, row0, p: CombustionParams,
                    konv: bool = True, nsub: int = 1, tile: int = 0,
                    halo: int = 8, interpret: bool = False):
    """``nsub`` fused combustion steps on a halo-extended shard: every
    array in ``args8`` is ``(9, ny_loc + 2·halo, nx)`` with the halo rows
    already filled (shard_map ring exchange), ``m9_ext``/``m2_ext`` are
    the equally-extended static masks, and ``row0`` is the GLOBAL row
    index of extended row 0 (traced; ``shard_index·ny_loc − halo``).
    Returns the 8 interior updates ``(9, ny_loc, nx)``.  This is the
    multi-chip building block (SURVEY §5.8) for the reference's largest
    component; lane-padding to a 128 multiple happens here so callers
    work in true-width coordinates."""
    ny_ext = args8[0].shape[1]
    ny_loc = ny_ext - 2 * halo
    nx = args8[0].shape[2]
    assert nx == p.nx, (nx, p.nx)
    Ty = tile or pick_stripe_tile(ny_loc, nx, halo=halo)
    assert ny_loc % Ty == 0, (ny_loc, Ty)
    # Loud, like every sibling building block (pallas_hcz/_fakhari/_scrt):
    # silently clamping nsub would advance fewer steps than the caller's
    # outer loop counts and de-synchronize a multi-chip trajectory.
    assert 1 <= nsub <= halo // STRIPE_REACH, (
        f"nsub={nsub} needs halo >= {STRIPE_REACH * nsub} (got {halo})")
    nx_arr = -(-nx // 128) * 128
    if nx_arr != nx:
        xpad = ((0, 0), (0, 0), (0, nx_arr - nx))
        args8 = tuple(jnp.pad(a, xpad) for a in args8)
        m9_ext = jnp.pad(m9_ext, ((0, 0),) + xpad)
        m2_ext = jnp.pad(m2_ext, xpad)
    Text = Ty + 2 * halo
    kernel = _make_striped_kernel(p, ny_loc, nx, konv, nsub, Ty, halo,
                                  nx_arr, halo_in=True)
    shape = jax.ShapeDtypeStruct((Q, ny_loc, nx_arr), jnp.float32)
    row0_arr = jnp.reshape(jnp.asarray(row0, jnp.int32), (1, 1))
    out = pl.pallas_call(
        kernel,
        out_shape=(shape,) * 8,
        grid=(ny_loc // Ty,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pl.ANY)] * 10,
        out_specs=(pl.BlockSpec((Q, Ty, nx_arr), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM),) * 8,
        scratch_shapes=[pltpu.VMEM((Q, Text, nx_arr), jnp.float32)] * 8
        + [pltpu.VMEM((len(_M9), Q, Text, nx_arr), jnp.float32),
           pltpu.VMEM((len(_M2), Text, nx_arr), jnp.float32),
           pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(row0_arr, *args8, m9_ext, m2_ext)
    if nx_arr != nx:
        out = tuple(a[:, :, :nx] for a in out)
    return out


def _make_call(p, ny, nx, konv, nsub, interpret):
    kernel = _make_kernel(p, ny, nx, konv, nsub)
    shape = jax.ShapeDtypeStruct((Q, ny, nx), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape,) * 8,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 8,
        input_output_aliases={i: i for i in range(8)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("p", "n_steps", "konv", "first_step",
                                   "nsub", "interpret", "stripe_tile",
                                   "halo"))
def run_fused(state: CombustionState, p: CombustionParams, n_steps: int,
              konv: bool = True, first_step: bool = False, nsub: int = 10,
              interpret: bool = False, stripe_tile: int = 0, halo: int = 8):
    """Advance ``n_steps`` with the fused kernel (``nsub`` steps per
    launch).  Mirrors :func:`..models.combustion.run`: the ``first_step``
    transition (conjugate store not yet populated) runs through the XLA
    step, everything after through the kernel.  State is cast to f32.

    ``stripe_tile > 0`` selects the y-striped kernel (for lattices whose
    whole-lattice VMEM image doesn't fit, ≳60k cells): ``stripe_tile``
    rows per grid program with a ``halo``-row cut margin; ``nsub`` is
    then capped at ``halo // STRIPE_REACH`` steps per launch."""
    _check_supported(p, striped=bool(stripe_tile))
    ny, nx = p.ny, p.nx
    if first_step and n_steps > 0:
        state = cbm.run(state, p, 1, konv=konv, first_step=True)
        n_steps -= 1
    st32 = CombustionState(*(jnp.asarray(a, jnp.float32) for a in state))
    m9, m2 = build_mask_inputs(p)
    args = st32[:8]

    if stripe_tile:
        nsub = min(nsub, halo // STRIPE_REACH)
        # lane-pad to a 128 multiple (Mosaic DMA alignment); the pads are
        # inert (see _make_body) and stay in the scan carry, so the cost
        # is one pad + one slice per run_fused call, not per launch
        nx_arr = -(-nx // 128) * 128
        if nx_arr != nx:
            xpad = (0, nx_arr - nx)
            args = tuple(jnp.pad(a, ((0, 0), (0, 0), xpad)) for a in args)
            m9 = jnp.pad(m9, ((0, 0), (0, 0), (0, 0), xpad))
            m2 = jnp.pad(m2, ((0, 0), (0, 0), xpad))

        def mk(ns):
            return _make_striped_call(p, ny, nx, konv, ns, stripe_tile,
                                      halo, interpret, nx_arr)
    else:
        nx_arr = nx

        def mk(ns):
            return _make_call(p, ny, nx, konv, ns, interpret)

    if n_steps >= nsub:
        call = mk(nsub)

        def body(carry, _):
            return call(*carry, m9, m2), None
        args, _ = jax.lax.scan(body, tuple(args), None,
                               length=n_steps // nsub)
    rem = n_steps % nsub
    if rem:
        args = mk(rem)(*tuple(args), m9, m2)
    if nx_arr != nx:
        args = tuple(a[:, :, :nx] for a in args)
    return CombustionState(*args, st32.q_heat)

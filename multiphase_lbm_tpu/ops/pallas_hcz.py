"""Fused Pallas TPU kernel for the HCZ phase-field D2Q9 step.

One kernel per time step for the Rayleigh–Taylor / layered-channel family
(:mod:`..models.hcz`, 2D scheme): both distributions (order parameter f,
pressure g), all materialised stencil fields (ψρ, ψφ, ∇²φ and its gradient,
∇ρ), the Guo-type forcing and the bounce-back pull streaming are computed in
VMEM per y-stripe, reading and writing f and g exactly once per step.

Same decomposition as :mod:`.pallas_sc`: x is the lane dimension (whole rows
per block), stripes carry an 8-row halo (physical reach: ∇(∇²φ) = 2 +
streaming 1 = 3 ≤ 8, which also satisfies Mosaic's sublane alignment).
The fluid mask handles the channel walls (mirrored stencil reads + on-site
bounce-back), exactly like the XLA reference path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernel_utils
from ..core.lattice import D2Q9
from ..models.hcz import HCZParams

HALO = 8


_pick_tile = partial(kernel_utils.pick_tile, target=32)
_roll2 = kernel_utils.roll2

# the 8 moving directions as {k: (cx, cy)} for kernel_utils.fwd_shifts
_DIRS = {k: (int(D2Q9.c[k][0]), int(D2Q9.c[k][1]))
         for k in range(9) if int(D2Q9.c[k][0]) or int(D2Q9.c[k][1])}


REACH = 3  # per-step physical reach: grad(lap(phi)) = 2 + streaming 1


def _make_kernel(p: HCZParams, ny: int, nx: int, Ty: int,
                 halo_in: bool = False, nsub: int = 1, halo: int = HALO):
    lat = D2Q9
    w = lat.w
    c = lat.c
    opp = lat.opp
    Text = Ty + 2 * halo
    nprog = ny // Ty
    # middle-stripe loads span [y0-halo, y0+Ty+halo): in bounds only when
    # halo <= Ty (else stripes 1 and nprog-2 DMA out of bounds)
    # stripe-load bound (middle stripes DMA [y0-halo, y0+Ty+halo));
    # halo_in loads are uniform in-bounds on the extended array
    assert halo_in or nprog == 1 or Ty >= halo, (Ty, halo)
    dphi = p.phi_l - p.phi_g
    drho = p.rho_l - p.rho_g
    # temporal blocking: each sub-step consumes REACH halo rows of validity
    assert 1 <= nsub <= halo // REACH, (nsub, halo)

    def cs_pressure(r):
        rt = r * float(p.b / 4.0)
        om = 1.0 - rt
        # one array divide (by om^3); the constant divides are folded
        return (r * (1.0 / 3.0)) * (1.0 + rt + rt * rt - rt ** 3) \
            / (om * om * om) - p.a * r * r

    def kernel(f_hbm, g_hbm, m_hbm, outf_ref, outg_ref, fbuf, gbuf, mbuf, sem):
        i = pl.program_id(0)
        y0 = pl.multiple_of(i * Ty, 8)

        def cp(src, dst, slot):
            d = pltpu.make_async_copy(src, dst, sem.at[slot])
            d.start()
            d.wait()

        def load(hbm, buf, slot):
            if halo_in:
                cp(hbm.at[:, pl.ds(y0, Text), :], buf.at[:, :, :], slot)
            elif nprog == 1:
                cp(hbm.at[:, pl.ds(ny - halo, halo), :], buf.at[:, pl.ds(0, halo), :], slot)
                cp(hbm.at[:, pl.ds(0, ny), :], buf.at[:, pl.ds(halo, ny), :], slot)
                cp(hbm.at[:, pl.ds(0, halo), :], buf.at[:, pl.ds(halo + ny, halo), :], slot)
            else:
                @pl.when(i == 0)
                def _():
                    cp(hbm.at[:, pl.ds(ny - halo, halo), :], buf.at[:, pl.ds(0, halo), :], slot)
                    cp(hbm.at[:, pl.ds(0, Ty + halo), :], buf.at[:, pl.ds(halo, Ty + halo), :], slot)

                @pl.when(jnp.logical_and(i > 0, i < nprog - 1))
                def _():
                    cp(hbm.at[:, pl.ds(pl.multiple_of(y0 - halo, 8), Text), :], buf.at[:, :, :], slot)

                @pl.when(i == nprog - 1)
                def _():
                    cp(hbm.at[:, pl.ds(pl.multiple_of(y0 - halo, 8), Ty + halo), :],
                       buf.at[:, pl.ds(0, Ty + halo), :], slot)
                    cp(hbm.at[:, pl.ds(0, halo), :], buf.at[:, pl.ds(Ty + halo, halo), :], slot)

        def load2d(hbm, buf, slot):
            if halo_in:
                cp(hbm.at[pl.ds(y0, Text), :], buf.at[:, :], slot)
            elif nprog == 1:
                cp(hbm.at[pl.ds(ny - halo, halo), :], buf.at[pl.ds(0, halo), :], slot)
                cp(hbm.at[pl.ds(0, ny), :], buf.at[pl.ds(halo, ny), :], slot)
                cp(hbm.at[pl.ds(0, halo), :], buf.at[pl.ds(halo + ny, halo), :], slot)
            else:
                @pl.when(i == 0)
                def _():
                    cp(hbm.at[pl.ds(ny - halo, halo), :], buf.at[pl.ds(0, halo), :], slot)
                    cp(hbm.at[pl.ds(0, Ty + halo), :], buf.at[pl.ds(halo, Ty + halo), :], slot)

                @pl.when(jnp.logical_and(i > 0, i < nprog - 1))
                def _():
                    cp(hbm.at[pl.ds(pl.multiple_of(y0 - halo, 8), Text), :], buf.at[:, :], slot)

                @pl.when(i == nprog - 1)
                def _():
                    cp(hbm.at[pl.ds(pl.multiple_of(y0 - halo, 8), Ty + halo), :],
                       buf.at[pl.ds(0, Ty + halo), :], slot)
                    cp(hbm.at[pl.ds(0, halo), :], buf.at[pl.ds(Ty + halo, halo), :], slot)

        load(f_hbm, fbuf, 0)
        load(g_hbm, gbuf, 1)
        load2d(m_hbm, mbuf, 2)

        mb = mbuf[:, :]
        # mask rolls are substep-invariant: 8 separable roll issues once
        # per block instead of 16+ per substep (the pull streaming's
        # upstream mask roll(mb, −c_k) equals m_fwd[opp[k]])
        m_fwd = kernel_utils.fwd_shifts(mb, _DIRS)
        cf = [fbuf[k, :, :] for k in range(9)]
        cg = [gbuf[k, :, :] for k in range(9)]
        for _ in range(nsub):
            cf, cg = step_block(cf, cg, mb, m_fwd)
        for k in range(9):
            outf_ref[k, :, :] = cf[k][halo:halo + Ty, :]
            outg_ref[k, :, :] = cg[k][halo:halo + Ty, :]

    def step_block(fb, gb, mb, m_fwd):
        """One full HCZ step on the halo-extended block; output rows within
        REACH of the block edge are garbage (rolls wrap at block edges).

        Op-count layout (the v5e kernel cost model — see CLAUDE.md): all
        four independent stencil fields ride ONE stacked (4, y, x) array
        whose 8 neighbor shifts share separable rolls and whose backward
        reads reuse fwd[opp[k]] — 8 roll issues + 8 selects per substep
        for lap(φ) and three gradients, where the field-by-field pass
        issued ~144 rolls + 40 selects; ∇(∇²φ) takes its own 8-issue
        pass it genuinely depends on."""
        # ── macroscopic fields on the extended block ──
        phi = fb[0]
        Pterm = gb[0]
        for k in range(1, 9):
            phi = phi + fb[k]
            Pterm = Pterm + gb[k]
        rho = p.rho_g + (phi - p.phi_g) * float(drho / dphi)
        psi_phi = cs_pressure(phi) - phi * (1.0 / 3.0)
        psi_rho = cs_pressure(rho) - rho * (1.0 / 3.0)

        # ── stencil pass A: lap(phi) + grad(psi_rho/psi_phi/rho), all
        # four fields on ONE (4, y, x) stack whose 8 neighbor shifts share
        # separable rolls (8 issues); the mirrored read q(r+c) if
        # fluid-there else q(r−c) becomes one stacked select per
        # direction, with the backward read reusing fwd[opp[k]] ──
        stA = jnp.stack([phi, psi_rho, psi_phi, rho])
        fwd = kernel_utils.fwd_shifts(stA, _DIRS)
        z = jnp.zeros_like(phi)
        lap_phi = z
        gprx, gpry, gppx, gppy, grx, gry = z, z, z, z, z, z
        for k, (cx, cy) in _DIRS.items():
            sel = jnp.where(m_fwd[k][None] > 0.5, fwd[k], fwd[opp[k]])
            wk = float(w[k])
            lap_phi = lap_phi + wk * (sel[0] - phi)
            if cx:
                gprx = gprx + (wk * cx) * sel[1]
                gppx = gppx + (wk * cx) * sel[2]
                grx = grx + (wk * cx) * sel[3]
            if cy:
                gpry = gpry + (wk * cy) * sel[1]
                gppy = gppy + (wk * cy) * sel[2]
                gry = gry + (wk * cy) * sel[3]
        lap_phi = 6.0 * lap_phi
        gprx, gpry = 3.0 * gprx, 3.0 * gpry
        gppx, gppy = 3.0 * gppx, 3.0 * gppy
        grx, gry = 3.0 * grx, 3.0 * gry

        # ── stencil pass B: grad(lap_phi) (true dependency on pass A) ──
        fwd_lp = kernel_utils.fwd_shifts(lap_phi, _DIRS)
        glpx, glpy = z, z
        for k, (cx, cy) in _DIRS.items():
            v = jnp.where(m_fwd[k] > 0.5, fwd_lp[k], fwd_lp[opp[k]])
            if cx:
                glpx = glpx + float(w[k] * cx) * v
            if cy:
                glpy = glpy + float(w[k] * cy) * v
        glpx, glpy = 3.0 * glpx, 3.0 * glpy

        Fx = p.kappa * rho * glpx + p.gx * rho + p.Gx_const
        Fy = p.kappa * rho * glpy + p.gravity * rho

        momx = jnp.zeros_like(phi)
        momy = jnp.zeros_like(phi)
        for k in range(9):
            cx, cy = int(c[k][0]), int(c[k][1])
            if cx:
                momx = momx + float(cx) * gb[k]
            if cy:
                momy = momy + float(cy) * gb[k]
        # NOTE: divide forms kept deliberately. Hoisting one reciprocal
        # (inv_rho3 = 3/rho reused by ux/uy; 1/phi_safe reused by all nine
        # eqf_over terms) looks cheaper on the TPU VPU, but the
        # multi-consumer reciprocal triggers an XLA-CPU fusion-duplication
        # pathology in the interpret-mode CI oracle: the nsub=5 halo
        # kernel's runtime explodes 0.14 s -> ~200 s (bisected
        # empirically, round 3; value clamps don't help, so it is a
        # fusion-structure issue, not denormals).
        ux = (momx + Fx * (1.0 / 6.0)) / (rho * (1.0 / 3.0))
        uy = (momy + Fy * (1.0 / 6.0)) / (rho * (1.0 / 3.0))
        P = Pterm + (0.5 / 3.0) * (ux * grx + uy * gry)

        usqr = 1.5 * (ux * ux + uy * uy)
        phi_safe = jnp.where(mb > 0.5, phi, 1.0)
        half = 1.0 - 0.5 * p.omega
        uF = ux * Fx + uy * Fy
        uE = ux * gprx + uy * gpry
        uGp = ux * gppx + uy * gppy

        post_f = []
        post_g = []
        for k in range(9):
            cx, cy = float(c[k][0]), float(c[k][1])
            cu = cx * ux + cy * uy
            eqf = phi * float(w[k]) * (1.0 + 3.0 * cu + 4.5 * cu * cu - usqr)
            eqg = float(w[k]) * (P + (rho / 3.0) * (3.0 * cu + 4.5 * cu * cu - usqr))
            e_u_F = (cx * Fx + cy * Fy) - uF
            e_u_E = (cx * gprx + cy * gpry) - uE
            e_u_G = (cx * gppx + cy * gppy) - uGp
            eqf_over = eqf / phi_safe
            fg = half * (e_u_F * eqf_over + (-e_u_E) * (eqf_over - float(w[k])))
            ff = half * (-e_u_G) * 3.0 * eqf_over
            pf = ((1.0 - p.omega) * fb[k] + p.omega * eqf + ff) * mb
            pg = ((1.0 - p.omega) * gb[k] + p.omega * eqg + fg) * mb
            post_f.append(pf)
            post_g.append(pg)

        # ── pull streaming with on-site bounce-back (upstream mask
        # roll(mb, −c_k) is the cached m_fwd[opp[k]]) ──
        new_f, new_g = [], []
        for k in range(9):
            cx, cy = int(c[k][0]), int(c[k][1])
            if cx == 0 and cy == 0:
                nf, ng = post_f[4], post_g[4]
            else:
                up_m = m_fwd[opp[k]]
                nf = jnp.where(up_m > 0.5, _roll2(post_f[k], -cy, -cx),
                               post_f[opp[k]])
                ng = jnp.where(up_m > 0.5, _roll2(post_g[k], -cy, -cx),
                               post_g[opp[k]])
            new_f.append(nf * mb)
            new_g.append(ng * mb)
        return new_f, new_g

    return kernel


def _make_call(p, ny, nx, Ty, interpret, nsub, halo, f_shape, g_shape, dtype):
    Text = Ty + 2 * halo
    kernel = _make_kernel(p, ny, nx, Ty, nsub=nsub, halo=halo)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(f_shape, dtype),
                   jax.ShapeDtypeStruct(g_shape, dtype)),
        grid=(ny // Ty,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(pl.BlockSpec((9, Ty, nx), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((9, Ty, nx), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((9, Text, nx), jnp.float32),
            pltpu.VMEM((9, Text, nx), jnp.float32),
            pltpu.VMEM((Text, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("p", "n_steps", "tile", "interpret",
                                   "nsub", "halo"))
def run_fused(f, g, fluid_f32, p: HCZParams, n_steps: int, tile: int = 0,
              interpret: bool = False, nsub: int = 1, halo: int = HALO):
    """Advance the HCZ 2D state ``n_steps`` with the fused kernel.

    ``nsub`` LBM steps run per kernel launch (temporal blocking; the halo
    must cover ``REACH=3`` rows per sub-step, so nsub ≤ halo//3)."""
    _, ny, nx = f.shape
    Ty = tile or _pick_tile(ny, minimum=halo)
    assert ny % Ty == 0, (ny, Ty)
    call = _make_call(p, ny, nx, Ty, interpret, nsub, halo,
                      f.shape, g.shape, f.dtype)

    def body(carry, _):
        fa, ga = carry
        return call(fa, ga, fluid_f32), None

    (f, g), _ = jax.lax.scan(body, (f, g), None, length=n_steps // nsub)
    rem = n_steps % nsub
    if rem:
        call1 = _make_call(p, ny, nx, Ty, interpret, rem, halo,
                           f.shape, g.shape, f.dtype)
        f, g = call1(f, g, fluid_f32)
    return f, g


def step_fused_halo(f_ext, g_ext, fluid_ext_f32, p: HCZParams, tile: int = 0,
                    interpret: bool = False, nsub: int = 1,
                    halo: int = HALO):
    """``nsub`` fused HCZ steps on halo-extended blocks (``ny+2*halo`` rows
    with filled halos) — the multi-chip building block.  ``halo`` must be a
    multiple of 8 covering ``REACH·nsub`` rows (the exchange width is
    parameterized so multi-chip runs match the single-chip kernel's
    temporal blocking instead of being pinned at nsub ≤ 2)."""
    _, ny_ext, nx = f_ext.shape
    ny = ny_ext - 2 * halo
    Ty = tile or _pick_tile(ny, minimum=halo)
    assert ny % Ty == 0, (ny, Ty)
    Text = Ty + 2 * halo
    kernel = _make_kernel(p, ny, nx, Ty, halo_in=True, nsub=nsub, halo=halo)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((9, ny, nx), f_ext.dtype),
                   jax.ShapeDtypeStruct((9, ny, nx), g_ext.dtype)),
        grid=(ny // Ty,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(pl.BlockSpec((9, Ty, nx), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((9, Ty, nx), lambda i: (0, i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((9, Text, nx), jnp.float32),
            pltpu.VMEM((9, Text, nx), jnp.float32),
            pltpu.VMEM((Text, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(f_ext, g_ext, fluid_ext_f32)

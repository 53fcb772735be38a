"""Fused Pallas TPU kernel for the 3D HCZ phase-field step (D3Q19).

One kernel per time step for the fully-periodic laplace3D workload
(:mod:`..models.hcz` ``step_3d``): both distributions, the materialised
stencil fields (ψφ, ∇²φ and its gradient, the P-based E-field) and the pull
streaming computed in VMEM per z-stripe.

Decomposition: arrays are ``(19, nz, ny, nx)``; each grid program owns a
z-stripe with a 3-slab halo (the physical reach: ∇∇²φ = 2 + streaming 1).
The z dimension is neither a sublane nor a lane dim, so halo slices carry no
Mosaic alignment constraints; y/x stay whole inside the block (y rolls are
sublane rotations, x rolls lane rotations).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernel_utils
from ..core.lattice import D3Q19
from ..models.hcz import HCZParams

HALO = 3   # per-step physical reach: grad(lap(phi)) = 2 + streaming 1
Q = 19


_roll3 = kernel_utils.roll3

# the 18 moving directions as {k: (cx, cy, cz)} for fwd_shifts3
_DIRS3 = {k: (int(D3Q19.c[k][0]), int(D3Q19.c[k][1]), int(D3Q19.c[k][2]))
          for k in range(Q)
          if any(int(v) for v in D3Q19.c[k])}


def _make_kernel(p: HCZParams, nz, ny, nx, Tz, nsub: int = 1,
                 halo_in: bool = False):
    lat = D3Q19
    w, c, opp = lat.w, lat.c, lat.opp
    halo = HALO * nsub          # z slices carry no Mosaic alignment constraint
    Text = Tz + 2 * halo
    nprog = nz // Tz
    # middle-stripe loads span [z0-halo, z0+Tz+halo); they stay in bounds
    # only when halo <= Tz (otherwise stripes 1 and nprog-2 read past the
    # array ends -- an out-of-bounds DMA on hardware)
    assert halo_in or nprog == 1 or Tz >= halo, (Tz, halo)
    dphi = p.phi_l - p.phi_g
    drho = p.rho_l - p.rho_g

    def cs_pressure(r):
        rt = r * float(p.b / 4.0)
        om = 1.0 - rt
        # one array divide (by om^3); the constant divides are folded
        return (r * (1.0 / 3.0)) * (1.0 + rt + rt * rt - rt ** 3) \
            / (om * om * om) - p.a * r * r

    def kernel(f_hbm, g_hbm, outf_hbm, outg_hbm, fbuf, gbuf, sem):
        i = pl.program_id(0)
        z0 = i * Tz

        def cp(src, dst, slot):
            d = pltpu.make_async_copy(src, dst, sem.at[slot])
            d.start()
            d.wait()

        def load(hbm, buf, slot):
            if halo_in:
                # caller supplies (Q, nz+2·halo, ny, nx) arrays with filled
                # z-halos: uniform in-bounds loads (multi-chip path); stripe
                # i's interior starts at halo + i·Tz, so [z0, z0+Text) is
                # exactly interior ± halo
                cp(hbm.at[:, pl.ds(z0, Text)], buf.at[:, :], slot)
                return
            if nprog == 1:
                cp(hbm.at[:, pl.ds(nz - halo, halo)], buf.at[:, pl.ds(0, halo)], slot)
                cp(hbm.at[:, pl.ds(0, nz)], buf.at[:, pl.ds(halo, nz)], slot)
                cp(hbm.at[:, pl.ds(0, halo)], buf.at[:, pl.ds(halo + nz, halo)], slot)
            else:
                @pl.when(i == 0)
                def _():
                    cp(hbm.at[:, pl.ds(nz - halo, halo)], buf.at[:, pl.ds(0, halo)], slot)
                    cp(hbm.at[:, pl.ds(0, Tz + halo)], buf.at[:, pl.ds(halo, Tz + halo)], slot)

                if nprog > 2:   # middle stripes exist only for >=3 programs
                    @pl.when(jnp.logical_and(i > 0, i < nprog - 1))
                    def _():
                        cp(hbm.at[:, pl.ds(z0 - halo, Text)], buf.at[:, :],
                           slot)

                @pl.when(i == nprog - 1)
                def _():
                    cp(hbm.at[:, pl.ds(z0 - halo, Tz + halo)],
                       buf.at[:, pl.ds(0, Tz + halo)], slot)
                    cp(hbm.at[:, pl.ds(0, halo)], buf.at[:, pl.ds(Tz + halo, halo)], slot)

        load(f_hbm, fbuf, 0)
        load(g_hbm, gbuf, 1)
        cf = [fbuf[k, :, :, :] for k in range(Q)]
        cg = [gbuf[k, :, :, :] for k in range(Q)]
        for _ in range(nsub):
            cf, cg = step_block(cf, cg)
        # write the valid interior back into the (already-consumed) scratch
        # buffers and DMA straight to HBM — no dedicated VMEM out blocks, so
        # the whole budget goes to the halo-extended working set (enables
        # nsub=2 temporal blocking at tile=8 within the 128 MB VMEM)
        for k in range(Q):
            fbuf[k, halo:halo + Tz] = cf[k][halo:halo + Tz]
            gbuf[k, halo:halo + Tz] = cg[k][halo:halo + Tz]
        cp(fbuf.at[:, pl.ds(halo, Tz)], outf_hbm.at[:, pl.ds(z0, Tz)], 0)
        cp(gbuf.at[:, pl.ds(halo, Tz)], outg_hbm.at[:, pl.ds(z0, Tz)], 1)

    def step_block(fb, gb):
        """One full 3D HCZ step on the halo-extended block; output slabs
        within HALO of the block edge are garbage (z rolls wrap there)."""
        phi = fb[0]
        Pterm = gb[0]
        for k in range(1, Q):
            phi = phi + fb[k]
            Pterm = Pterm + gb[k]
        rho = p.rho_g + (phi - p.phi_g) * float(drho / dphi)
        psi_phi = cs_pressure(phi) - phi * (1.0 / 3.0)

        def grad(q):
            """∇q with the 18 neighbor reads sharing separable rolls
            (18 issues instead of 30 double-issue diagonals)."""
            fwd = kernel_utils.fwd_shifts3(q, _DIRS3)
            gx = jnp.zeros_like(q)
            gy = jnp.zeros_like(q)
            gz = jnp.zeros_like(q)
            for k, (cx, cy, cz) in _DIRS3.items():
                v = fwd[k]
                if cx:
                    gx = gx + float(w[k] * cx) * v
                if cy:
                    gy = gy + float(w[k] * cy) * v
                if cz:
                    gz = gz + float(w[k] * cz) * v
            return 3.0 * gx, 3.0 * gy, 3.0 * gz

        # pass 1: neighbors of the [phi, psi_phi] stack serve BOTH lap(φ)
        # and grad(ψφ) — one separable 18-issue neighborhood for the two
        # fields (was 30 issues for lap alone + 30 for the grad pair)
        st1 = jnp.stack([phi, psi_phi])
        f1 = kernel_utils.fwd_shifts3(st1, _DIRS3)
        lap_phi = jnp.zeros_like(phi)
        gppx = jnp.zeros_like(phi)
        gppy = jnp.zeros_like(phi)
        gppz = jnp.zeros_like(phi)
        for k, (cx, cy, cz) in _DIRS3.items():
            v = f1[k]
            wk = float(w[k])
            lap_phi = lap_phi + wk * (v[0] - phi)
            if cx:
                gppx = gppx + (wk * cx) * v[1]
            if cy:
                gppy = gppy + (wk * cy) * v[1]
            if cz:
                gppz = gppz + (wk * cz) * v[1]
        lap_phi = 6.0 * lap_phi
        gppx, gppy, gppz = 3.0 * gppx, 3.0 * gppy, 3.0 * gppz

        # pass 2: grad(∇²φ) (true dependency on pass 1)
        glpx, glpy, glpz = grad(lap_phi)

        Fx = p.kappa * phi * glpx
        Fy = p.kappa * phi * glpy + p.gravity * rho
        Fz = p.kappa * phi * glpz

        momx = jnp.zeros_like(phi)
        momy = jnp.zeros_like(phi)
        momz = jnp.zeros_like(phi)
        for k in range(Q):
            cx, cy, cz = float(c[k][0]), float(c[k][1]), float(c[k][2])
            if cx:
                momx = momx + cx * gb[k]
            if cy:
                momy = momy + cy * gb[k]
            if cz:
                momz = momz + cz * gb[k]
        # one reciprocal serves the three velocity components and the 19
        # per-direction forcing divides below (VPU divides are multi-pass)
        inv_rho = 1.0 / rho
        inv_rho3 = 3.0 * inv_rho
        ux = (momx + Fx * (1.0 / 6.0)) * inv_rho3
        uy = (momy + Fy * (1.0 / 6.0)) * inv_rho3
        uz = (momz + Fz * (1.0 / 6.0)) * inv_rho3
        # total_P (laplace3D.h:318-330): P_term − ½ u·∇ψφ
        P = Pterm - 0.5 * (ux * gppx + uy * gppy + uz * gppz)
        # E-field: ∇(P − ρ/3), materialised (laplace3D.h:333-337)
        psi_rho3 = P - rho * (1.0 / 3.0)
        gprx, gpry, gprz = grad(psi_rho3)

        usqr = 1.5 * (ux * ux + uy * uy + uz * uz)
        inv_phi = 1.0 / phi
        rho_third = rho * (1.0 / 3.0)
        half = 1.0 - 0.5 * p.omega
        uF = ux * Fx + uy * Fy + uz * Fz
        uE = ux * gprx + uy * gpry + uz * gprz
        uG = ux * gppx + uy * gppy + uz * gppz

        post_f = []
        post_g = []
        for k in range(Q):
            cx, cy, cz = float(c[k][0]), float(c[k][1]), float(c[k][2])
            cu = cx * ux + cy * uy + cz * uz
            eqf = phi * float(w[k]) * (1.0 + 3.0 * cu + 4.5 * cu * cu - usqr)
            eqg = float(w[k]) * (P + rho_third * (3.0 * cu + 4.5 * cu * cu - usqr))
            e_u_F = (cx * Fx + cy * Fy + cz * Fz) - uF
            e_u_E = (cx * gprx + cy * gpry + cz * gprz) - uE
            e_u_G = (cx * gppx + cy * gppy + cz * gppz) - uG
            eqf_over_phi = eqf * inv_phi
            fg = half * (e_u_F * eqf_over_phi + (-e_u_E) * (eqf_over_phi - float(w[k])))
            # 3D phase forcing divides by ρ (laplace3D.h:608)
            ff = half * (-e_u_G) * 3.0 * eqf * inv_rho
            post_f.append((1.0 - p.omega) * fb[k] + p.omega * eqf + ff)
            post_g.append((1.0 - p.omega) * gb[k] + p.omega * eqg + fg)

        new_f, new_g = [], []
        for k in range(Q):
            cx, cy, cz = int(c[k][0]), int(c[k][1]), int(c[k][2])
            if cx == 0 and cy == 0 and cz == 0:
                nf, ng = post_f[k], post_g[k]
            else:
                # one stacked roll streams both distributions
                pk = _roll3(jnp.stack([post_f[k], post_g[k]]),
                            -cz, -cy, -cx)
                nf, ng = pk[0], pk[1]
            new_f.append(nf)
            new_g.append(ng)
        return new_f, new_g

    return kernel


def _make_call(p, nz, ny, nx, Tz, interpret, nsub, shape, dtype,
               halo_in=False):
    Text = Tz + 2 * HALO * nsub
    kernel = _make_kernel(p, nz, ny, nx, Tz, nsub=nsub, halo_in=halo_in)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(shape, dtype),
                   jax.ShapeDtypeStruct(shape, dtype)),
        grid=(nz // Tz,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((Q, Text, ny, nx), jnp.float32),
            pltpu.VMEM((Q, Text, ny, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("p", "n_steps", "tile", "interpret",
                                   "nsub"))
def run_fused_3d(f, g, p: HCZParams, n_steps: int, tile: int = 8,
                 interpret: bool = False, nsub: int = 2):
    """Advance the fully-periodic 3D HCZ state with the fused kernel;
    ``nsub`` steps per launch (temporal blocking, z-halo = 3·nsub slabs).

    Measured 128³ f32 on one v5e (fresh-input timing): tile=8 nsub=1
    589.5 MLUPS, tile=8 nsub=2 **706.5 MLUPS** (production default),
    tile=16 nsub=1 597.8; tile=16 nsub=2 exceeds VMEM (Text=28 slabs ×
    2 distributions ≈ 139 MB).  The scratch-DMA output path (no dedicated
    VMEM out blocks) is what lets nsub=2 fit at tile=8."""
    _, nz, ny, nx = f.shape
    Tz = tile
    if nz % Tz != 0:
        # defaulted/oversized tile: largest divisor of nz ≤ requested
        # (mirrors the 2D kernels' _pick_tile; advisor round 2 — nz
        # multiples of 4-but-not-8 must not be rejected)
        Tz = max(d for d in range(1, min(tile, nz) + 1) if nz % d == 0)
    assert nz % Tz == 0, (nz, Tz)
    # stripe-load bound: middle stripes DMA [z0-halo, z0+Tz+halo), so the
    # tile must cover the halo; shrink the temporal blocking to fit
    while nz // Tz > 1 and Tz < HALO * nsub and nsub > 1:
        nsub -= 1
    call = _make_call(p, nz, ny, nx, Tz, interpret, nsub, f.shape, f.dtype)

    def body(carry, _):
        fa, ga = carry
        return call(fa, ga), None

    (f, g), _ = jax.lax.scan(body, (f, g), None, length=n_steps // nsub)
    rem = n_steps % nsub
    if rem:
        f, g = _make_call(p, nz, ny, nx, Tz, interpret, rem,
                          f.shape, f.dtype)(f, g)
    return f, g


def step_fused_halo_3d(f_ext, g_ext, p: HCZParams, tile: int = 0,
                       interpret: bool = False, nsub: int = 1):
    """``nsub`` fused 3D HCZ steps on z-halo-extended blocks
    (``nz+2·3·nsub`` slabs with pre-filled halos) — the multi-chip building
    block.  Returns the cropped ``(Q, nz, ny, nx)`` state."""
    _, nz_ext, ny, nx = f_ext.shape
    halo = HALO * nsub
    nz = nz_ext - 2 * halo
    Tz = tile or min(8, nz)
    assert nz % Tz == 0, (nz, Tz)
    shape = (Q, nz, ny, nx)
    return _make_call(p, nz, ny, nx, Tz, interpret, nsub, shape,
                      f_ext.dtype, halo_in=True)(f_ext, g_ext)

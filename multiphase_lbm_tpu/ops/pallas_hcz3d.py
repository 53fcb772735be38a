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

from ..core.lattice import D3Q19
from ..models.hcz import HCZParams

HALO = 3   # per-step physical reach: grad(lap(phi)) = 2 + streaming 1
Q = 19


def _roll3(arr, cz, cy, cx):
    """Value at (z+cz, y+cy, x+cx); z wraps only inside the halo-extended
    block (artifacts confined to cropped slabs)."""
    out = arr
    if cz:
        out = pltpu.roll(out, (-cz) % arr.shape[0], 0)
    if cy:
        out = pltpu.roll(out, (-cy) % arr.shape[1], 1)
    if cx:
        out = pltpu.roll(out, (-cx) % arr.shape[2], 2)
    return out


def _make_kernel(p: HCZParams, nz, ny, nx, Tz, nsub: int = 1):
    lat = D3Q19
    w, c, opp = lat.w, lat.c, lat.opp
    halo = HALO * nsub          # z slices carry no Mosaic alignment constraint
    Text = Tz + 2 * halo
    nprog = nz // Tz
    # middle-stripe loads span [z0-halo, z0+Tz+halo); they stay in bounds
    # only when halo <= Tz (otherwise stripes 1 and nprog-2 read past the
    # array ends -- an out-of-bounds DMA on hardware)
    assert nprog == 1 or Tz >= halo, (Tz, halo)
    dphi = p.phi_l - p.phi_g
    drho = p.rho_l - p.rho_g

    def cs_pressure(r):
        rt = p.b * r / 4.0
        om = 1.0 - rt
        return (r / 3.0) * (1.0 + rt + rt * rt - rt ** 3) / (om * om * om) \
            - p.a * r * r

    def kernel(f_hbm, g_hbm, outf_ref, outg_ref, fbuf, gbuf, sem):
        i = pl.program_id(0)
        z0 = i * Tz

        def cp(src, dst, slot):
            d = pltpu.make_async_copy(src, dst, sem.at[slot])
            d.start()
            d.wait()

        def load(hbm, buf, slot):
            if nprog == 1:
                cp(hbm.at[:, pl.ds(nz - halo, halo)], buf.at[:, pl.ds(0, halo)], slot)
                cp(hbm.at[:, pl.ds(0, nz)], buf.at[:, pl.ds(halo, nz)], slot)
                cp(hbm.at[:, pl.ds(0, halo)], buf.at[:, pl.ds(halo + nz, halo)], slot)
            else:
                @pl.when(i == 0)
                def _():
                    cp(hbm.at[:, pl.ds(nz - halo, halo)], buf.at[:, pl.ds(0, halo)], slot)
                    cp(hbm.at[:, pl.ds(0, Tz + halo)], buf.at[:, pl.ds(halo, Tz + halo)], slot)

                @pl.when(jnp.logical_and(i > 0, i < nprog - 1))
                def _():
                    cp(hbm.at[:, pl.ds(z0 - halo, Text)], buf.at[:, :], slot)

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
        for k in range(Q):
            outf_ref[k] = cf[k][halo:halo + Tz]
            outg_ref[k] = cg[k][halo:halo + Tz]

    def step_block(fb, gb):
        """One full 3D HCZ step on the halo-extended block; output slabs
        within HALO of the block edge are garbage (z rolls wrap there)."""
        phi = fb[0]
        Pterm = gb[0]
        for k in range(1, Q):
            phi = phi + fb[k]
            Pterm = Pterm + gb[k]
        rho = p.rho_g + (phi - p.phi_g) / dphi * drho
        psi_phi = cs_pressure(phi) - phi / 3.0

        def grad(q):
            gx = jnp.zeros_like(q)
            gy = jnp.zeros_like(q)
            gz = jnp.zeros_like(q)
            for k in range(Q):
                cx, cy, cz = int(c[k][0]), int(c[k][1]), int(c[k][2])
                if cx == 0 and cy == 0 and cz == 0:
                    continue
                v = _roll3(q, cz, cy, cx)
                if cx:
                    gx = gx + float(w[k] * cx) * v
                if cy:
                    gy = gy + float(w[k] * cy) * v
                if cz:
                    gz = gz + float(w[k] * cz) * v
            return 3.0 * gx, 3.0 * gy, 3.0 * gz

        def lap(q):
            s = jnp.zeros_like(q)
            for k in range(Q):
                cx, cy, cz = int(c[k][0]), int(c[k][1]), int(c[k][2])
                if cx == 0 and cy == 0 and cz == 0:
                    continue
                s = s + float(w[k]) * (_roll3(q, cz, cy, cx) - q)
            return 6.0 * s

        lap_phi = lap(phi)
        glpx, glpy, glpz = grad(lap_phi)
        gppx, gppy, gppz = grad(psi_phi)

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
        ux = (momx + Fx / 6.0) / (rho / 3.0)
        uy = (momy + Fy / 6.0) / (rho / 3.0)
        uz = (momz + Fz / 6.0) / (rho / 3.0)
        # total_P (laplace3D.h:318-330): P_term − ½ u·∇ψφ
        P = Pterm - 0.5 * (ux * gppx + uy * gppy + uz * gppz)
        # E-field: ∇(P − ρ/3), materialised (laplace3D.h:333-337)
        psi_rho3 = P - rho / 3.0
        gprx, gpry, gprz = grad(psi_rho3)

        usqr = 1.5 * (ux * ux + uy * uy + uz * uz)
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
            eqg = float(w[k]) * (P + (rho / 3.0) * (3.0 * cu + 4.5 * cu * cu - usqr))
            e_u_F = (cx * Fx + cy * Fy + cz * Fz) - uF
            e_u_E = (cx * gprx + cy * gpry + cz * gprz) - uE
            e_u_G = (cx * gppx + cy * gppy + cz * gppz) - uG
            eqf_over_phi = eqf / phi
            fg = half * (e_u_F * eqf_over_phi + (-e_u_E) * (eqf_over_phi - float(w[k])))
            # 3D phase forcing divides by ρ (laplace3D.h:608)
            ff = half * (-e_u_G) * 3.0 * eqf / rho
            post_f.append((1.0 - p.omega) * fb[k] + p.omega * eqf + ff)
            post_g.append((1.0 - p.omega) * gb[k] + p.omega * eqg + fg)

        new_f, new_g = [], []
        for k in range(Q):
            cx, cy, cz = int(c[k][0]), int(c[k][1]), int(c[k][2])
            if cx == 0 and cy == 0 and cz == 0:
                nf, ng = post_f[k], post_g[k]
            else:
                nf = _roll3(post_f[k], -cz, -cy, -cx)
                ng = _roll3(post_g[k], -cz, -cy, -cx)
            new_f.append(nf)
            new_g.append(ng)
        return new_f, new_g

    return kernel


def _make_call(p, nz, ny, nx, Tz, interpret, nsub, shape, dtype):
    Text = Tz + 2 * HALO * nsub
    kernel = _make_kernel(p, nz, ny, nx, Tz, nsub=nsub)
    return pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct(shape, dtype),
                   jax.ShapeDtypeStruct(shape, dtype)),
        grid=(nz // Tz,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=(pl.BlockSpec((Q, Tz, ny, nx), lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((Q, Tz, ny, nx), lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)),
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
def run_fused_3d(f, g, p: HCZParams, n_steps: int, tile: int = 4,
                 interpret: bool = False, nsub: int = 1):
    """Advance the fully-periodic 3D HCZ state with the fused kernel;
    ``nsub`` steps per launch (temporal blocking, z-halo = 3·nsub slabs)."""
    _, nz, ny, nx = f.shape
    Tz = tile
    assert nz % Tz == 0, (nz, Tz)
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

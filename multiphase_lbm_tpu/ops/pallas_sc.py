"""Fused Pallas TPU kernel for the Shan-Chen D2Q9 step.

One kernel per ``nsub`` time steps: macroscopic recovery, Yuan-CS
pseudopotential force, BGK/MRT collision with velocity-shift forcing, and
bounce-back pull streaming — all in VMEM, reading and writing the
population array exactly once per launch (the XLA fallback path in
:mod:`..models.shan_chen` issues tens of HBM round trips for the same
math).  With temporal blocking (``nsub`` up to ``halo//2``) several LBM
steps run back-to-back on the halo-extended block before anything returns
to HBM, lifting throughput past the single-pass memory-bandwidth bound
(measured v5e 2048² f32 MRT: 3030 MLUPS single-step → 6554 at nsub=8).
The MRT moment relaxation uses the identity-plus-rank-2 structure of
S=diag(1,…,1,ω,ω), replacing the dense 9×9 transform with two moment
contractions and two rank-1 updates.

Decomposition: the lattice ``(9, ny, nx)`` is cut into y-stripes; x is the
lane dimension and stays whole inside each block.  Each grid program DMAs
its stripe plus a 2-row halo (force reach 1 + streaming reach 1) from HBM
with explicit wrap handling for the first/last stripes, computes the full
step for the stripe interior, and writes the interior rows to the output
block.  x-periodicity is exact via lane rolls; y-periodicity via the
wrapped halo loads; walls via the fluid mask (the same mask algebra as the
reference semantics, laplace2D.h:198-305).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernel_utils

from ..core import eos
from ..core.collision import MRT_M_I, MRT_M_I_INV
from ..core.lattice import D2Q9
from ..models.shan_chen import SCParams

# Mosaic DMA slices along the sublane dim must be 8-aligned; the physical
# stencil reach is 2 (force 1 + stream 1) but we load an 8-row halo.
HALO = 8


_pick_tile = kernel_utils.pick_tile
_roll2 = kernel_utils.roll2

# the 8 moving directions as {k: (cx, cy)} for kernel_utils.fwd_shifts
_DIRS = {k: (int(D2Q9.c[k][0]), int(D2Q9.c[k][1]))
         for k in range(9) if int(D2Q9.c[k][0]) or int(D2Q9.c[k][1])}


def _make_kernel(p: SCParams, ny: int, nx: int, Ty: int, interpret: bool,
                 periodic: bool = False, halo_in: bool = False,
                 nsub: int = 1, halo: int = HALO):
    # the kernel implements only the Yuan-CS branch with rho-scaled body
    # forces; fail loudly on params it would silently mis-simulate
    # (const_g layered flow, per-node gx_u/gy_u — use the XLA path).
    if p.psi_mode != "yuan" or p.gx_u != 0.0 or p.gy_u != 0.0:
        raise NotImplementedError(
            "fused SC kernel supports psi_mode='yuan' with gx_u=gy_u=0 only "
            f"(got psi_mode={p.psi_mode!r}, gx_u={p.gx_u}, gy_u={p.gy_u}); "
            "run the layered-flow configuration through models.shan_chen.run")
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
    T = p.T
    a, R = p.a, p.R
    # temporal blocking: each sub-step consumes 2 halo rows of validity
    # (force reach 1 + streaming reach 1), so the 8-row halo supports up
    # to 4 sub-steps per HBM round-trip.
    assert 1 <= nsub <= halo // 2, nsub
    if p.collision == "mrt":
        # S = diag(1,…,1,ω,ω) ⇒ A = M⁻¹SM = I + (ω−1)·M⁻¹[:,7:9] M[7:9,:]
        # (identity plus rank-2), so the dense 9×9 moment transform reduces
        # to two moment contractions + two rank-1 updates:
        #   post = feq − (ω−1)(m̂₇·(M₇·dneq) + m̂₈·(M₈·dneq))
        m7 = MRT_M_I[7].astype(np.float32)
        m8 = MRT_M_I[8].astype(np.float32)
        mi7 = MRT_M_I_INV[:, 7].astype(np.float32)
        mi8 = MRT_M_I_INV[:, 8].astype(np.float32)
        mrt = True
    else:
        mrt = False

    def step_block(fb, mb, m_fwd):
        """One full SC step on a halo-extended block: 9 arrays in, 9 out.

        Output rows within ``reach=2`` of the block edge are garbage (the
        rolls wrap at block edges); callers account for 2 rows of shrink
        per application.  ``m_fwd[k]`` is the substep-invariant mask roll
        roll(mb, c_k), cached once per block by the caller (the walled
        path otherwise re-rolls the static mask 16× per substep; the
        streaming's upstream mask roll(mb, −c_k) is m_fwd[opp[k]])."""
        # ---- macroscopic fields ----
        # TPU VPU divides are multi-pass: one reciprocal serves ux, uy and
        # the velocity shift (4 divides -> 1 divide + 3 multiplies)
        rho = fb[0] + fb[1] + fb[2] + fb[3] + fb[4] + fb[5] + fb[6] + fb[7] + fb[8]
        rho_safe = jnp.maximum(rho, 1e-14)
        inv_rho = 1.0 / rho_safe
        ux = (fb[5] + fb[7] + fb[8] - fb[0] - fb[2] - fb[3]) * inv_rho
        uy = (fb[3] + fb[6] + fb[7] - fb[1] - fb[2] - fb[8]) * inv_rho

        # ---- Yuan-CS pseudopotential + force ----
        Z = eos.yuan_Z(rho)
        s = R * T * Z - a * rho - eos.CS2
        G1 = jnp.where(s > 0.0, eos.CS2, -eos.CS2)
        # G1 = ±CS2 is a select of constants, so x/G1 is a select-multiply
        inv_G1 = jnp.where(s > 0.0, float(1.0 / eos.CS2),
                           -float(1.0 / eos.CS2))
        P = rho * R * T * Z - a * rho * rho + p.p_shift
        psi = jnp.sqrt(jnp.maximum(6.0 * (P - eos.CS2 * rho) * inv_G1, 0.0))
        if p.wall_psi_center_branch:
            Zw = float(eos.yuan_Z(np.float64(p.rho_w)))
            valw = (6.0 * p.rho_w * (R * T * Zw - a * p.rho_w - eos.CS2)
                    + 6.0 * p.p_shift) * inv_G1
            psi_w = jnp.sqrt(jnp.maximum(valw, 0.0))
        else:
            psi_w = float(eos.yuan_psi(np.float64(p.rho_w), a, R, T, p.p_shift))

        # 8 neighbor reads of ψ via separable rolls (8 issues, not 12)
        psi_fwd = kernel_utils.fwd_shifts(psi, _DIRS)
        sum_ff_x = jnp.zeros_like(rho)
        sum_ff_y = jnp.zeros_like(rho)
        sum_bb_x = jnp.zeros_like(rho)
        sum_bb_y = jnp.zeros_like(rho)
        for k, (cx, cy) in _DIRS.items():
            nb_psi = psi_fwd[k]
            if periodic:
                ff = nb_psi
                bb = 0.0
            else:
                nb_m = m_fwd[k]
                ff = nb_m * nb_psi
                bb = 1.0 - nb_m
            wk = float(w[k])
            if cx:
                sum_ff_x += (wk * cx) * ff
                if not periodic:
                    sum_bb_x += (wk * cx) * bb
            if cy:
                sum_ff_y += (wk * cy) * ff
                if not periodic:
                    sum_bb_y += (wk * cy) * bb

        Fx = -G1 * psi * (sum_ff_x + psi_w * sum_bb_x) + p.gx * rho
        Fy = -G1 * psi * (sum_ff_y + psi_w * sum_bb_y) + p.gravity * rho

        # ---- collision at shifted velocity ----
        tau = 1.0 / p.omega
        uex = ux + tau * Fx * inv_rho
        uey = uy + tau * Fy * inv_rho
        usqr = 1.5 * (uex * uex + uey * uey)
        feq = []
        for k in range(9):
            cx, cy = float(c[k][0]), float(c[k][1])
            cu = cx * uex + cy * uey
            feq.append(rho * float(w[k]) * (1.0 + 3.0 * cu + 4.5 * cu * cu - usqr))

        if not mrt:
            post = [(1.0 - p.omega) * fb[k] + p.omega * feq[k] for k in range(9)]
        else:
            dneq = [fb[k] - feq[k] for k in range(9)]
            mom7 = sum(float(m7[j]) * dneq[j] for j in range(9) if m7[j])
            mom8 = sum(float(m8[j]) * dneq[j] for j in range(9) if m8[j])
            om1 = p.omega - 1.0
            r7 = om1 * mom7
            r8 = om1 * mom8
            post = [feq[k] - (float(mi7[k]) * r7 + float(mi8[k]) * r8)
                    for k in range(9)]
        if not periodic:
            post = [pk * mb for pk in post]

        # ---- pull streaming with on-site bounce-back ----
        new = []
        for k in range(9):
            cx, cy = int(c[k][0]), int(c[k][1])
            if cx == 0 and cy == 0:
                new_k = post[4]
            elif periodic:
                new_k = _roll2(post[k], -cy, -cx)        # value from (r-cy, x-cx)
            else:
                pulled = _roll2(post[k], -cy, -cx)       # value from (r-cy, x-cx)
                new_k = jnp.where(m_fwd[opp[k]] > 0.5, pulled, post[opp[k]])
            new.append(new_k if periodic else new_k * mb)
        return new

    def kernel(f_hbm, m_hbm, out_ref, fbuf, mbuf, sem):
        # `periodic` (static): fully-fluid domain — mask loads, wall forces
        # and bounce-back selects compile away.
        i = pl.program_id(0)
        y0 = pl.multiple_of(i * Ty, 8)

        # ---- halo-extended stripe load (wrap in y) ----
        def cp(src, dst, slot):
            d = pltpu.make_async_copy(src, dst, sem.at[slot])
            d.start()
            d.wait()

        if halo_in:
            # caller supplies a (…, ny+2H, nx) array with filled halos:
            # uniform in-bounds loads, no wrap cases (multi-chip path)
            cp(f_hbm.at[:, pl.ds(y0, Text), :], fbuf.at[:, :, :], 0)
            if not periodic:
                cp(m_hbm.at[pl.ds(y0, Text), :], mbuf.at[:, :], 1)
        elif nprog == 1:
            # single stripe: whole lattice + both wrap halos
            cp(f_hbm.at[:, pl.ds(ny - halo, halo), :], fbuf.at[:, pl.ds(0, halo), :], 0)
            cp(f_hbm.at[:, pl.ds(0, ny), :], fbuf.at[:, pl.ds(halo, ny), :], 0)
            cp(f_hbm.at[:, pl.ds(0, halo), :], fbuf.at[:, pl.ds(halo + ny, halo), :], 0)
            if not periodic:
                cp(m_hbm.at[pl.ds(ny - halo, halo), :], mbuf.at[pl.ds(0, halo), :], 1)
                cp(m_hbm.at[pl.ds(0, ny), :], mbuf.at[pl.ds(halo, ny), :], 1)
                cp(m_hbm.at[pl.ds(0, halo), :], mbuf.at[pl.ds(halo + ny, halo), :], 1)
        else:
            @pl.when(i == 0)
            def _():
                cp(f_hbm.at[:, pl.ds(ny - halo, halo), :], fbuf.at[:, pl.ds(0, halo), :], 0)
                cp(f_hbm.at[:, pl.ds(0, Ty + halo), :], fbuf.at[:, pl.ds(halo, Ty + halo), :], 0)
                if not periodic:
                    cp(m_hbm.at[pl.ds(ny - halo, halo), :], mbuf.at[pl.ds(0, halo), :], 1)
                    cp(m_hbm.at[pl.ds(0, Ty + halo), :], mbuf.at[pl.ds(halo, Ty + halo), :], 1)

        if nprog > 1 and not halo_in:
            @pl.when(jnp.logical_and(i > 0, i < nprog - 1))
            def _():
                cp(f_hbm.at[:, pl.ds(pl.multiple_of(y0 - halo, 8), Text), :], fbuf.at[:, :, :], 0)
                if not periodic:
                    cp(m_hbm.at[pl.ds(pl.multiple_of(y0 - halo, 8), Text), :], mbuf.at[:, :], 1)

            @pl.when(i == nprog - 1)
            def _():
                cp(f_hbm.at[:, pl.ds(pl.multiple_of(y0 - halo, 8), Ty + halo), :],
                   fbuf.at[:, pl.ds(0, Ty + halo), :], 0)
                cp(f_hbm.at[:, pl.ds(0, halo), :],
                   fbuf.at[:, pl.ds(Ty + halo, halo), :], 0)
                if not periodic:
                    cp(m_hbm.at[pl.ds(pl.multiple_of(y0 - halo, 8), Ty + halo), :],
                       mbuf.at[pl.ds(0, Ty + halo), :], 1)
                    cp(m_hbm.at[pl.ds(0, halo), :],
                       mbuf.at[pl.ds(Ty + halo, halo), :], 1)

        mb = None if periodic else mbuf[:, :]   # (Text, nx), 1.0 = fluid
        m_fwd = None
        if not periodic:
            m_fwd = kernel_utils.fwd_shifts(mb, _DIRS)
        cur = [fbuf[k, :, :] for k in range(9)]  # (Text, nx) each
        for _ in range(nsub):
            cur = step_block(cur, mb, m_fwd)
        for k in range(9):
            out_ref[k, :, :] = cur[k][halo:halo + Ty, :]

    return kernel


def _make_call(p, ny, nx, Ty, interpret, periodic, nsub, halo=HALO):
    Text = Ty + 2 * halo
    kernel = _make_kernel(p, ny, nx, Ty, interpret, periodic, nsub=nsub,
                          halo=halo)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((9, ny, nx), jnp.float32),
        grid=(ny // Ty,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((9, Ty, nx), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((9, Text, nx), jnp.float32),
            pltpu.VMEM((Text, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("p", "n_steps", "tile", "interpret",
                                   "periodic", "nsub", "halo"))
def run_fused(f, fluid_f32, p: SCParams, n_steps: int, tile: int = 0,
              interpret: bool = False, periodic: bool = False,
              nsub: int = 1, halo: int = HALO):
    """Advance ``n_steps`` with the fused kernel under ``lax.scan``.

    Args:
      f: populations ``(9, ny, nx)`` float32.
      fluid_f32: fluid mask ``(ny, nx)`` float32 (1.0 fluid / 0.0 solid).
      p: static model params.
      tile: y-stripe height (0 = auto).
      interpret: run in interpreter mode (CPU testing).
      nsub: temporal blocking — LBM steps per kernel launch (1-4).  Each
        launch reads/writes HBM once, so ``nsub=2`` halves the HBM traffic
        per step at the cost of recomputing the 2-row-per-substep halo
        shrink; results are identical to ``nsub=1`` (same op order per
        sub-step, rolls are exact copies).
    """
    _, ny, nx = f.shape
    Ty = tile or _pick_tile(ny, minimum=halo)
    assert ny % Ty == 0, (ny, Ty)
    call = _make_call(p, ny, nx, Ty, interpret, periodic, nsub, halo)

    def body(carry, _):
        return call(carry, fluid_f32), None

    out, _ = jax.lax.scan(body, f, None, length=n_steps // nsub)
    rem = n_steps % nsub
    if rem:
        call1 = _make_call(p, ny, nx, Ty, interpret, periodic, rem, halo)
        out = call1(out, fluid_f32)
    return out


def step_fused_halo(f_ext, fluid_ext_f32, p: SCParams, tile: int = 0,
                    interpret: bool = False, periodic: bool = False,
                    nsub: int = 1, halo: int = HALO):
    """``nsub`` fused steps on a halo-extended block: ``f_ext`` is
    ``(9, ny+2*HALO, nx)`` with the 8-row halos already filled (by a
    shard_map neighbor exchange or host padding).  Returns the ``(9, ny, nx)``
    interior update.  This is the multi-chip building block; ``nsub > 1``
    advances several steps per halo exchange (the 8-row halo covers the
    2-rows-per-step reach of up to 4 steps)."""
    _, ny_ext, nx = f_ext.shape
    ny = ny_ext - 2 * halo
    Ty = tile or _pick_tile(ny, minimum=halo)
    assert ny % Ty == 0, (ny, Ty)
    Text = Ty + 2 * halo
    kernel = _make_kernel(p, ny, nx, Ty, interpret, periodic, halo_in=True,
                          nsub=nsub, halo=halo)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((9, ny, nx), f_ext.dtype),
        grid=(ny // Ty,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((9, Ty, nx), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((9, Text, nx), jnp.float32),
            pltpu.VMEM((Text, nx), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f_ext, fluid_ext_f32)

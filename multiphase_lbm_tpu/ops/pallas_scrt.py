"""Fused Pallas TPU kernel for the Shan-Chen Rayleigh-Taylor step.

One kernel per ``nsub`` time steps of the SC-RT model (ψ = 1 − e^(−ρ)
pseudopotential, Guo forcing inside a BGK collision, gravity, channel
walls): macroscopic recovery, fluid-fluid force with the reference's
wall-mirrored ψ reads, collision and bounce-back pull streaming — all in
VMEM.  Reference semantics: ``shan-chen single component
model/apps/RayleighTaylor2D.h`` (force_ff :237-293, collideBgk :369-405),
pinned to :mod:`..models.shan_chen_rt` by an interpreter-mode equivalence
test.

TRANSPOSED layout — the TPU-shaped decision of this module.  The RT
domain is {nx=N, ny=4N+2}: the model's lane dimension (x) is N (e.g. 200,
not a 128 multiple — misaligned DMA), while the walled y axis is padded
freely (solid cells beyond the wall are inert: masked out of collision,
bounce-back streamed, zero force contribution by the mask algebra).  So
the kernel works on ``(9, nx, ny_pad)`` blocks: the PERIODIC x axis is
the striped sublane dim (wrap halo loads, exactly the pallas_sc periodic
pattern), the walled y axis is the lane dim padded to a 128 multiple.
``run_fused`` transposes in/out once per call — two ~6 MB relayouts
amortised over ``n_steps``.

The wall mask depends only on the lane (y) coordinate, so it is computed
in-kernel from a lane iota — no mask DMA, no mask VMEM buffer, and the
upstream mask of pull streaming is a pure iota expression per cy sign
(no mask rolls at all).

Wall mirror without extra rolls: the reference reads ψ(r − c_k) instead
of ψ(r + c_k) when the c_k neighbor is solid (RayleighTaylor2D.h:260-276).
ψ(r − c_k) is exactly the forward-rolled ψ of the OPPOSITE direction,
which the force loop computes anyway: ``psi_k = where(nb_fluid_k,
fwd[k], fwd[opp[k]])`` — the mirror costs one select, zero rolls.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernel_utils
from ..core.lattice import D2Q9
from ..models.shan_chen_rt import RHO_FLOOR, SCRTParams

# Mosaic DMA slices along the sublane dim must be 8-aligned; physical
# stencil reach is 2 per substep (force 1 + streaming 1).
HALO = 8


_pick_tile = kernel_utils.pick_tile
_roll2 = kernel_utils.roll2

# the 8 moving directions for fwd_shifts IN THE TRANSPOSED LAYOUT:
# sublane = x, lane = y, so the (lane, sublane) pair passed is (cy, cx)
_DIRS_T = {k: (int(D2Q9.c[k][1]), int(D2Q9.c[k][0]))
           for k in range(9) if int(D2Q9.c[k][0]) or int(D2Q9.c[k][1])}


def _make_kernel(p: SCRTParams, nx: int, nyL: int, ny_phys: int, Ty: int,
                 nsub: int, halo: int, halo_in: bool = False):
    """Kernel over (9, nx, nyL) transposed state: sublane = periodic x
    (striped, wrap loads), lane = walled y (padded, iota mask).

    ``ny_phys``: true domain height; lanes ≥ ny_phys are solid padding.
    """
    lat = D2Q9
    w, c, opp = lat.w, lat.c, lat.opp
    Ci = [(int(c[k][0]), int(c[k][1])) for k in range(9)]
    Cf = [(float(c[k][0]), float(c[k][1])) for k in range(9)]
    Wf = [float(x) for x in w]
    rest = next(k for k in range(9) if Ci[k] == (0, 0))
    Text = Ty + 2 * halo
    nprog = nx // Ty
    assert halo_in or nprog == 1 or Ty >= halo, (Ty, halo)
    assert 1 <= nsub <= halo // 2, (nsub, halo)
    # The DMA offsets i*Ty and x0-halo are stamped pl.multiple_of(·, 8);
    # a caller-passed tile/halo that isn't 8-aligned would assert a false
    # fact to Mosaic (misaligned sublane DMA = silently wrong on hardware).
    assert Ty % 8 == 0 and halo % 8 == 0, (Ty, halo)
    omega = float(p.omega)
    gcoup = float(p.g)
    grav = float(p.gravity)

    # lane-iota wall masks, shared across substeps: fluid rows are
    # 1 ≤ y ≤ ny_phys−2 (rows 0, ny_phys−1 are walls; ≥ ny_phys padding)
    def lane_masks():
        yi = jax.lax.broadcasted_iota(jnp.int32, (Text, nyL), 1)
        fl = jnp.logical_and(yi >= 1, yi <= ny_phys - 2)
        mb = fl.astype(jnp.float32)
        # neighbor/upstream fluhood by cy offset: fluid(y + d)
        def at(d):
            return jnp.logical_and(yi >= 1 - d, yi <= ny_phys - 2 - d)
        return mb, {-1: at(-1), 0: fl, 1: at(1)}

    def step_block(fb, mb, fl_at):
        """One full SC-RT step on a halo-extended (Text, nyL) block list;
        output rows within reach 2 of the sublane edges are garbage."""
        rho = fb[0]
        for k in range(1, 9):
            rho = rho + fb[k]
        rho_safe = jnp.maximum(rho, RHO_FLOOR)
        mx = jnp.zeros_like(rho)
        my = jnp.zeros_like(rho)
        for k in range(9):
            cx, cy = Cf[k]
            if cx:
                mx = mx + cx * fb[k]
            if cy:
                my = my + cy * fb[k]
        # one reciprocal serves both velocity components and the Guo
        # half-force shift below (VPU divides are multi-pass)
        inv_rho = 1.0 / rho_safe
        ux = mx * inv_rho
        uy = my * inv_rho

        # ψ = 1 − e^(−ρ) and the mirrored-read fluid-fluid force
        # (reference force_ff :237-293; eos.psi_exponential)
        psi = 1.0 - jnp.exp(-rho)
        # ψ at (x+cx, y+cy) for all 8 directions via separable rolls
        fwd = kernel_utils.fwd_shifts(psi, _DIRS_T)
        fx = jnp.zeros_like(rho)
        fy = jnp.zeros_like(rho)
        for k in range(9):
            cx, cy = Ci[k]
            if cx == 0 and cy == 0:
                continue
            if cy == 0:
                psi_k = fwd[k]              # x neighbors are always fluid
            else:
                psi_k = jnp.where(fl_at[cy], fwd[k], fwd[int(opp[k])])
            wk = Wf[k]
            if cx:
                fx = fx + (wk * cx) * psi_k
            if cy:
                fy = fy + (wk * cy) * psi_k
        Fx = -gcoup * psi * fx
        Fy = -gcoup * psi * fy + grav * rho

        # Guo forcing at u_eq = u + F/(2ρ) (reference :392-401)
        uex = ux + 0.5 * Fx * inv_rho
        uey = uy + 0.5 * Fy * inv_rho
        usqr = 1.5 * (uex * uex + uey * uey)
        uF = uex * Fx + uey * Fy
        post = [None] * 9
        for k in range(9):
            cx, cy = Cf[k]
            cu = cx * uex + cy * uey
            feq = rho * Wf[k] * (1.0 + 3.0 * cu + 4.5 * cu * cu - usqr)
            cF = cx * Fx + cy * Fy
            src = Wf[k] * (1.0 - 0.5 * omega) * (3.0 * (cF - uF)
                                                 + 9.0 * cu * cF)
            post[k] = ((1.0 - omega) * fb[k] + omega * feq + src) * mb

        # bounce-back pull streaming (walls full lane columns: upstream
        # fluidhood is the iota expression for −cy; x wraps periodically)
        new = [None] * 9
        for k in range(9):
            cx, cy = Ci[k]
            if cx == 0 and cy == 0:
                new[k] = post[rest]
            else:
                pulled = _roll2(post[k], -cx, -cy)   # from (x−cx, y−cy)
                if cy == 0:
                    new[k] = pulled
                else:
                    new[k] = jnp.where(fl_at[-cy], pulled,
                                       post[int(opp[k])])
            new[k] = new[k] * mb
        return new

    def kernel(f_hbm, out_ref, fbuf, sem):
        i = pl.program_id(0)
        x0 = pl.multiple_of(i * Ty, 8)

        def cp(src, dst, slot):
            d = pltpu.make_async_copy(src, dst, sem.at[slot])
            d.start()
            d.wait()

        # periodic wrap loads along the striped x axis (pallas_sc pattern)
        if halo_in:
            cp(f_hbm.at[:, pl.ds(x0, Text), :], fbuf.at[:, :, :], 0)
        elif nprog == 1:
            cp(f_hbm.at[:, pl.ds(nx - halo, halo), :],
               fbuf.at[:, pl.ds(0, halo), :], 0)
            cp(f_hbm.at[:, pl.ds(0, nx), :], fbuf.at[:, pl.ds(halo, nx), :], 0)
            cp(f_hbm.at[:, pl.ds(0, halo), :],
               fbuf.at[:, pl.ds(halo + nx, halo), :], 0)
        else:
            @pl.when(i == 0)
            def _():
                cp(f_hbm.at[:, pl.ds(nx - halo, halo), :],
                   fbuf.at[:, pl.ds(0, halo), :], 0)
                cp(f_hbm.at[:, pl.ds(0, Ty + halo), :],
                   fbuf.at[:, pl.ds(halo, Ty + halo), :], 0)

            @pl.when(jnp.logical_and(i > 0, i < nprog - 1))
            def _():
                cp(f_hbm.at[:, pl.ds(pl.multiple_of(x0 - halo, 8), Text), :],
                   fbuf.at[:, :, :], 0)

            @pl.when(i == nprog - 1)
            def _():
                cp(f_hbm.at[:, pl.ds(pl.multiple_of(x0 - halo, 8),
                                     Ty + halo), :],
                   fbuf.at[:, pl.ds(0, Ty + halo), :], 0)
                cp(f_hbm.at[:, pl.ds(0, halo), :],
                   fbuf.at[:, pl.ds(Ty + halo, halo), :], 0)

        mb, fl_at = lane_masks()
        cur = [fbuf[k, :, :] for k in range(9)]
        for _ in range(nsub):
            cur = step_block(cur, mb, fl_at)
        for k in range(9):
            out_ref[k, :, :] = cur[k][halo:halo + Ty, :]

    return kernel


def _make_call(p, nx, nyL, ny_phys, Ty, nsub, halo, interpret,
               halo_in=False):
    Text = Ty + 2 * halo
    kernel = _make_kernel(p, nx, nyL, ny_phys, Ty, nsub, halo, halo_in)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((9, nx, nyL), jnp.float32),
        grid=(nx // Ty,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((9, Ty, nyL), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((9, Text, nyL), jnp.float32),
            pltpu.SemaphoreType.DMA((1,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


@partial(jax.jit, static_argnames=("p", "n_steps", "tile", "interpret",
                                   "nsub", "halo"))
def run_fused(f, p: SCRTParams, n_steps: int, tile: int = 0,
              interpret: bool = False, nsub: int = 2, halo: int = HALO):
    """Advance the SC-RT state ``n_steps`` with the fused kernel.

    Args:
      f: populations ``(9, ny, nx)`` in MODEL layout (walled y sublane,
        periodic x lane) — any float dtype, cast to f32.
      p: static params (channel geometry is implied: wall rows 0, ny−1).
      nsub: temporal blocking, ≤ ``halo//2`` steps per HBM round trip.

    Returns the advanced ``(9, ny, nx)`` f32 state (solid rows zero, as
    the model keeps them).
    """
    _, ny, nx = f.shape
    ny_pad = -(-ny // 128) * 128
    ft = jnp.transpose(jnp.asarray(f, jnp.float32), (0, 2, 1))
    if ny_pad != ny:
        ft = jnp.pad(ft, ((0, 0), (0, 0), (0, ny_pad - ny)))
    Ty = tile or _pick_tile(nx, minimum=halo)
    assert nx % Ty == 0, (nx, Ty)
    call = _make_call(p, nx, ny_pad, ny, Ty, nsub, halo, interpret)

    def body(carry, _):
        return call(carry), None

    ft, _ = jax.lax.scan(body, ft, None, length=n_steps // nsub)
    rem = n_steps % nsub
    if rem:
        ft = _make_call(p, nx, ny_pad, ny, Ty, rem, halo, interpret)(ft)
    return jnp.transpose(ft[:, :, :ny], (0, 2, 1))


def step_fused_halo(ft_ext, p: SCRTParams, ny_phys: int, tile: int = 0,
                    interpret: bool = False, nsub: int = 1,
                    halo: int = HALO):
    """``nsub`` fused SC-RT steps on an x-halo-extended TRANSPOSED block
    ``(9, nx_loc + 2·halo, ny_pad)`` with pre-filled halos (shard_map ring
    exchange along the periodic x axis) — the multi-chip building block.
    Returns the ``(9, nx_loc, ny_pad)`` interior update."""
    _, nx_ext, nyL = ft_ext.shape
    nx_loc = nx_ext - 2 * halo
    Ty = tile or _pick_tile(nx_loc, minimum=halo)
    assert nx_loc % Ty == 0, (nx_loc, Ty)
    return _make_call(p, nx_loc, nyL, ny_phys, Ty, nsub, halo, interpret,
                      halo_in=True)(ft_ext)

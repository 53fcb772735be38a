"""Weighted lattice stencil operators (isotropic ∇, ∇², ∇∇²).

The reference evaluates these per cell with neighbor loops and, near walls,
replaces a solid neighbor's value by the value at the *mirrored* node
``r - c_k`` (bounce-back-aware stencils, reference
``Phase field model/apps/rayleighTaylor2D.h:248-310, 467-529``).  Here each
stencil is a handful of whole-array rolls + selects that XLA fuses; the HCZ
"gradient of Laplacian" is computed on a *materialised* Laplacian field
instead of the reference's per-neighbor recursive recompute (an O(25×) flop
reduction with identical results — the reference recomputes
``laplacian(phi)`` for all 9 neighbours of every cell, see SURVEY §3.3).

Conventions (c_s² = 1/3):
  grad  q = 3 Σ_k w_k c_k q(r + c_k)                  (1/c_s² scaling)
  lap   q = 6 Σ_k w_k (q(r + c_k) − q(r))             (2/c_s² scaling)

On D2Q9 these coincide exactly with the explicit 9-point stencils of the
Fakhari module (``Young_Laplace2D.h:313-331``):
  ∂x q = (E−W)/3 + (NE+SE−NW−SW)/12,
  ∇² q = (diag + 4·(E+W+N+S) − 20·q)/6.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .lattice import Lattice
from .precision import einsum


def neighbor_values(q, lattice: Lattice, fluid: Optional[jnp.ndarray] = None):
    """Return stacked neighbor values ``v[k] = q(r + c_k)`` with optional
    bounce-back mirroring: where ``r + c_k`` is solid, use ``q(r - c_k)``.

    Args:
      q: scalar field ``([z,] y, x)``.
      lattice: descriptor.
      fluid: optional bool mask; if given, mirrored reads are used at solid
        neighbors (reference rayleighTaylor2D.h:261-269).
    Returns:
      array ``(Q, [z,] y, x)``.
    """
    axes = tuple(range(q.ndim))
    shifts = lattice.roll_shifts()
    vals = []
    for k in range(lattice.q):
        neg = tuple(-s for s in shifts[k])
        fwd = jnp.roll(q, neg, axis=axes)          # q at r + c_k
        if fluid is None:
            vals.append(fwd)
        else:
            bwd = jnp.roll(q, shifts[k], axis=axes)  # mirrored: q at r - c_k
            nb_fluid = jnp.roll(fluid, neg, axis=axes)
            vals.append(jnp.where(nb_fluid, fwd, bwd))
    return jnp.stack(vals, axis=0)


def isotropic_gradient(q, lattice: Lattice, fluid: Optional[jnp.ndarray] = None):
    """``∇q`` with 1/c_s² scaling: ``3 Σ_k w_k c_k q(r+c_k)``.

    Returns an array ``(d, [z,] y, x)`` ordered (∂x, ∂y[, ∂z]).
    """
    vals = neighbor_values(q, lattice, fluid)
    w = jnp.asarray(lattice.w, dtype=q.dtype)
    c = jnp.asarray(lattice.c, dtype=q.dtype)
    return 3.0 * einsum("k,kd,k...->d...", w, c, vals)


def lattice_laplacian(q, lattice: Lattice, fluid: Optional[jnp.ndarray] = None):
    """``∇²q`` with 2/c_s² scaling: ``6 Σ_k w_k (q(r+c_k) − q(r))``."""
    vals = neighbor_values(q, lattice, fluid)
    w = jnp.asarray(lattice.w, dtype=q.dtype)
    return 6.0 * einsum("k,k...->...", w, vals - q[None])


def grad_of_laplacian(q, lattice: Lattice, fluid: Optional[jnp.ndarray] = None):
    """``∇(∇²q)``: materialise the Laplacian once, then take its gradient.

    Matches the reference's recursive evaluation exactly (the reference's
    mirror logic calls ``laplacian`` at the mirrored node, which is what the
    gradient-with-mirroring of a materialised Laplacian field reads)."""
    lap = lattice_laplacian(q, lattice, fluid)
    return isotropic_gradient(lap, lattice, fluid)

"""Float32-exact einsum for population/moment contractions.

On TPU, XLA lowers ``jnp.einsum`` contractions (the k=9/19 population
sums against the lattice ``c`` matrix, and the 9×9 MRT moment
transforms) onto the MXU at DEFAULT matmul precision — bf16 inputs —
silently costing ~8 mantissa bits.  Measured on a v5e (SC-RT, N=128,
f32): ``cu = einsum("kd,d...->k...", c, u)`` differs from the exact
per-k accumulation by 2.5e-3 *relative*, which compounds to O(1) field
divergence within a few hundred steps of an unstable flow.  The Pallas
kernels accumulate per-k in f32 and are exact; the XLA model paths are
the reference oracles, so they must be at least as accurate.

``einsum`` here pins ``precision=HIGHEST`` (f32-equivalent multi-pass on
the MXU).  Cost: ~20% on the XLA model paths at 512² — acceptable for
oracle paths; the fused kernels are the production-performance paths.
No effect on CPU or f64, so CI and golden-parity tests are unchanged.
"""
from functools import partial

import jax
import jax.numpy as jnp

einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

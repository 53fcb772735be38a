"""Shared Mosaic kernel helpers: stripe-tile policy and wrapped rolls.

These were private copies in pallas_sc / pallas_hcz / pallas_scrt /
pallas_fakhari / pallas_combustion; hoisted so tile-policy or
roll-semantics fixes land once.  ``pallas_fakhari`` keeps its own
``_pick_tile`` (dynamic target, no above-target fallback — a different
policy), but shares :func:`roll2`.
"""
from jax.experimental import pallas as pl  # noqa: F401  (kernel context)
from jax.experimental.pallas import tpu as pltpu


def pick_tile(n: int, target: int = 64, minimum: int = 8) -> int:
    """Largest divisor of ``n`` that is ≤ ``target`` and a multiple of 8
    (Mosaic sublane alignment), but at least ``minimum`` (the stripe-load
    bound tile ≥ halo); falls back to the smallest admissible divisor
    above ``target`` when none fits below it."""
    best = 0
    for t in range(8, min(n, max(target, minimum)) + 1, 8):
        if n % t == 0 and t >= minimum:
            best = t
    if best == 0:
        for t in range(max(8, minimum), n + 1, 8):
            if n % t == 0:
                return t
        raise ValueError(f"n={n} has no stripe height that is a multiple "
                         "of 8; use the XLA path for this shape")
    return best


def roll2(arr, cy, cx):
    """Value at (..., y+cy, x+cx) on the trailing two axes: roll by
    (-cy, -cx), wrapping (callers mask edges).

    ``pltpu.roll`` requires non-negative shifts, so reduce modulo the
    axis size.  Works on stacked (B, ny, nx) arrays so several fields
    share one roll (rolls have a large fixed cost — see the op-cost
    model in CLAUDE.md)."""
    nd = arr.ndim
    out = arr
    if cy:
        out = pltpu.roll(out, (-cy) % arr.shape[nd - 2], nd - 2)
    if cx:
        out = pltpu.roll(out, (-cx) % arr.shape[nd - 1], nd - 1)
    return out

"""Shared Mosaic kernel helpers: stripe-tile policy and wrapped rolls.

These were private copies in pallas_sc / pallas_hcz / pallas_scrt /
pallas_fakhari / pallas_combustion; hoisted so tile-policy or
roll-semantics fixes land once.  ``pallas_fakhari`` keeps its own
``_pick_tile`` (dynamic target, no above-target fallback — a different
policy), but shares :func:`roll2`.
"""
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
        start = ((max(8, minimum) + 7) // 8) * 8   # keep 8-alignment even
        for t in range(start, n + 1, 8):           # for unaligned `minimum`
            if n % t == 0:
                return t
        raise ValueError(f"n={n} has no stripe height that is a multiple "
                         "of 8; use the XLA path for this shape")
    return best


def fwd_shifts(arr, c_by_k):
    """Neighbor values ``arr`` at (..., y+cy, x+cx) for every direction in
    ``c_by_k`` ({k: (cx, cy)} with cy ∈ {−1, 0, 1}), sharing separable
    rolls: the (up to two) y-rolls are computed once and the x-rolls are
    applied on top, so a full D2Q9 neighborhood costs 8 pltpu.roll issues
    instead of 12 (4 straight + 4 double-issue diagonals) — and callers
    get every BACKWARD read free, since roll(q, −c_k) is the forward
    value of the opposite direction."""
    bases = {0: arr}
    out = {}
    for k, (cx, cy) in c_by_k.items():
        if cy not in bases:
            bases[cy] = roll2(arr, cy, 0)
    for k, (cx, cy) in c_by_k.items():
        out[k] = roll2(bases[cy], 0, cx)
    return out


def roll3(arr, cz, cy, cx):
    """Value at (..., z+cz, y+cy, x+cx) on the trailing three axes
    (wrapping; callers confine artifacts to cropped halo slabs).  Works on
    stacked (B, nz, ny, nx) arrays so several fields share one roll."""
    nd = arr.ndim
    out = arr
    if cz:
        out = pltpu.roll(out, (-cz) % arr.shape[nd - 3], nd - 3)
    if cy:
        out = pltpu.roll(out, (-cy) % arr.shape[nd - 2], nd - 2)
    if cx:
        out = pltpu.roll(out, (-cx) % arr.shape[nd - 1], nd - 1)
    return out


def fwd_shifts3(arr, c_by_k):
    """3D variant of :func:`fwd_shifts` for D3Q19-style sets
    ({k: (cx, cy, cz)}, components in {−1, 0, 1}, at most two nonzero):
    the z-rolls (and xy-plane y-rolls) are computed once and the
    remaining single-axis rolls stack on top — 18 roll issues for the
    full neighborhood instead of 30 (each of the 12 face-diagonals is
    double-issue when rolled directly).  Backward reads are free via the
    opposite direction."""
    zb = {0: arr}
    yb = {0: arr}
    out = {}
    for cx, cy, cz in c_by_k.values():
        if cz and cz not in zb:
            zb[cz] = roll3(arr, cz, 0, 0)
    for cx, cy, cz in c_by_k.values():
        if cz == 0 and cy and cy not in yb:
            yb[cy] = roll3(arr, 0, cy, 0)
    for k, (cx, cy, cz) in c_by_k.items():
        if cz:
            out[k] = roll3(zb[cz], 0, cy, cx)
        else:
            out[k] = roll3(yb[cy], 0, 0, cx)
    return out


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

#!/usr/bin/env python
"""Headline benchmark: D2Q9 MRT + Shan-Chen on a 2048^2 lattice, one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
MLUPS definition identical to the reference (printMlups_*):
nelem * iterations / microseconds.  ``vs_baseline`` is the fraction of the
north-star target (2000 MLUPS on one v5e chip, BASELINE.json) since the
reference publishes no numbers of its own.
"""
import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--collision", default="mrt", choices=["bgk", "mrt"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from multiphase_lbm_tpu.models import shan_chen as sc

    n = args.size
    p = sc.SCParams(collision=args.collision)
    rng = np.random.default_rng(0)
    # droplet initial condition, f32 (production dtype)
    f = sc.init_droplet(n, n, p, radius=n / 8.0, dtype=jnp.float32)
    fluid = sc.geometry_periodic(n, n)

    f = sc.run(f, fluid, p, args.warmup)
    f.block_until_ready()

    t0 = time.perf_counter()
    f = sc.run(f, fluid, p, args.steps)
    f.block_until_ready()
    dt = time.perf_counter() - t0

    mlups = n * n * args.steps / dt / 1e6
    assert bool(jnp.isfinite(f).all()), "non-finite state after benchmark"

    target = 2000.0  # BASELINE.json north star
    print(json.dumps({
        "metric": f"MLUPS_D2Q9_{args.collision.upper()}_ShanChen_{n}x{n}",
        "value": round(mlups, 1),
        "unit": "MLUPS",
        "vs_baseline": round(mlups / target, 4),
    }))


if __name__ == "__main__":
    main()

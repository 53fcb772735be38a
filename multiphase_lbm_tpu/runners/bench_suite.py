"""Benchmark suite: the reference's roadmap item it never built.

The reference README lists "Automated regression tests and benchmarking
suite" as future work (reference README.md:142) and only prints MLUPS at
the end of each run (SURVEY §6).  This module IS that suite for the TPU
framework: one command re-measures every BASELINE.md workload row with
the protocol the numbers were recorded under, printing one JSON line per
workload.

    python -m multiphase_lbm_tpu.runners.bench_suite            # all
    python -m multiphase_lbm_tpu.runners.bench_suite sc hcz3d   # subset
    python -m multiphase_lbm_tpu.runners.bench_suite --quick    # CPU smoke

MLUPS definition identical to the reference's printMlups (nelem·iters/µs,
e.g. ``Abbashub LBM/apps/PulsatileBloodFlow2D.h:708-716``).  Timing
protocol (axon-relay safe, see BASELINE.md): jit/compile with the
measured step count, one warm run, then time a run on a FRESH input and
force a small host readback — ``block_until_ready`` alone is unreliable
over the relay and jitting inside the loop measures remote compilation.

Run workloads SERIALLY on an otherwise idle chip: concurrent processes
corrupt timings by 1.3-30× (measured).  ``vs_reference`` is the speedup
over the C++ reference measured per-core on this box (BASELINE.md table);
``None`` where no reference config exists (the 2048² north-star shape).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

def _tuned_path() -> str:
    """Committed autotune winner table (populated by the on-chip sweep,
    .claude/tpu_batch_all.py sec_autotune); env override for tests."""
    return os.environ.get(
        "MLBM_TUNED_PATH",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "ops", "tuned.json"))


def _tuned_kw(kernel: str, shape, dtype, default_kw: dict) -> dict:
    """Kernel config for a workload: the committed autotune winner for
    this (kernel, shape, dtype) when one exists, else the BASELINE.md
    measured constants in ``default_kw``.  Only keys already present in
    ``default_kw`` are taken from the table (a tuner must not inject
    knobs the workload didn't expose).  Logs the source to stderr so a
    bench record is attributable."""
    from ..ops import autotune

    kw = dict(default_kw)
    path = _tuned_path()
    try:
        table = autotune.load_table(path)
    except FileNotFoundError:
        return kw
    except json.JSONDecodeError as e:
        print(f"bench_suite: ignoring corrupt tuned table {path}: {e}",
              file=sys.stderr)
        return kw
    cfg = autotune.lookup(table, kernel, shape, dtype)
    if cfg:
        kw.update({k: cfg[k] for k in kw if k in cfg})
        print(f"bench_suite: {kernel} {tuple(shape)} config {kw} "
              f"(tuned table {path})", file=sys.stderr)
    return kw


def _timed(fn, state, mk_fresh, n_steps, cells, reps=3):
    """Relay-safe timing protocol (utils.profiling.measure_mlups); raises
    if the actual timed output went non-finite (a fast number computed on
    NaNs is not a benchmark)."""
    import jax
    import jax.numpy as jnp

    from ..utils.profiling import measure_mlups

    mlups, ms, spread, out = measure_mlups(fn, state, n_steps, cells,
                                           perturb=mk_fresh, reps=reps)
    leaves = jax.tree_util.tree_leaves(out)
    finite = all(bool(jnp.isfinite(jnp.sum(a)))
                 for a in leaves
                 if hasattr(a, "dtype")
                 and jnp.issubdtype(a.dtype, jnp.floating))
    if not finite:
        raise FloatingPointError("non-finite state after timed run")
    return mlups, ms, spread


def _perturb_first(s):
    """Fresh input: nudge the first (population) leaf, keep the rest."""
    import jax.numpy as jnp
    if not isinstance(s, tuple):
        return s * jnp.float32(1.000001)
    leaves = list(s)
    leaves[0] = leaves[0] * jnp.float32(1.000001)
    # plain tuple takes an iterable; NamedTuples take positional fields
    return tuple(leaves) if type(s) is tuple else type(s)(*leaves)


# ─── workloads ──────────────────────────────────────────────────────────────
def _wl_sc(quick, interpret):
    import jax.numpy as jnp
    from ..models import shan_chen as sc
    from ..ops import pallas_sc

    p = sc.SCParams(collision="mrt")
    n, steps, kw = ((128, 2, dict(tile=32, nsub=2, halo=16))
                    if quick else
                    (2048, 200, dict(tile=128, nsub=8, halo=16)))
    f = sc.init_droplet(n, n, p, radius=n / 8.0, dtype=jnp.float32)
    fl = sc.geometry_periodic(n, n).astype(jnp.float32)
    if not quick:
        kw = _tuned_kw("pallas_sc", f.shape, f.dtype, kw)
    return (lambda s: pallas_sc.run_fused(s, fl, p, steps, periodic=True,
                                          interpret=interpret, **kw),
            f, _perturb_first, steps, n * n, f"{n}x{n} MRT {kw}")


def _wl_hcz(quick, interpret):
    import jax.numpy as jnp
    from ..models import hcz
    from ..ops import pallas_hcz

    p = hcz.HCZParams()
    (nx, ny), steps, kw = (((64, 128), 2, dict(tile=32, nsub=2, halo=16))
                           if quick else
                           ((256, 1024), 200,
                            dict(tile=32, nsub=5, halo=16)))
    f, g = hcz.init_rayleigh_taylor(nx, ny, p, dtype=jnp.float32)
    fl = hcz.geometry_channel(nx, ny).astype(jnp.float32)
    if not quick:
        kw = _tuned_kw("pallas_hcz", f.shape, f.dtype, kw)
    return (lambda s: pallas_hcz.run_fused(s[0], s[1], fl, p, steps,
                                           interpret=interpret, **kw),
            (f, g), _perturb_first, steps, nx * ny, f"{nx}x{ny} RTI {kw}")


def _wl_hcz2048(quick, interpret):
    if quick:
        return None                      # same kernel as hcz at scale
    import jax.numpy as jnp
    from ..models import hcz
    from ..ops import pallas_hcz

    p = hcz.HCZParams()
    nx, ny, steps = 2048, 8200, 50
    kw = dict(tile=40, nsub=5, halo=16)
    f, g = hcz.init_rayleigh_taylor(nx, ny, p, dtype=jnp.float32)
    fl = hcz.geometry_channel(nx, ny).astype(jnp.float32)
    kw = _tuned_kw("pallas_hcz", f.shape, f.dtype, kw)
    return (lambda s: pallas_hcz.run_fused(s[0], s[1], fl, p, steps,
                                           interpret=interpret, **kw),
            (f, g), _perturb_first, steps, nx * ny,
            f"{nx}x{ny} RTI-2048 {kw}")


def _wl_hcz3d(quick, interpret):
    import jax.numpy as jnp
    from ..models import hcz
    from ..ops import pallas_hcz3d

    p = hcz.HCZParams()
    n, steps, kw = ((16, 2, dict(tile=8, nsub=1)) if quick else
                    (128, 50, dict(tile=8, nsub=2)))
    f, g = hcz.init_droplet_3d(n, n, n, p, dtype=jnp.float32)
    if not quick:
        kw = _tuned_kw("pallas_hcz3d", f.shape, f.dtype, kw)
    return (lambda s: pallas_hcz3d.run_fused_3d(s[0], s[1], p, steps,
                                                interpret=interpret, **kw),
            (f, g), _perturb_first, steps, n ** 3, f"{n}^3 D3Q19 {kw}")


def _wl_fakhari(quick, interpret):
    import jax.numpy as jnp
    from ..models import fakhari as fk
    from ..ops import pallas_fakhari

    p = fk.FakhariParams()
    n, steps, kw = ((128, 2, dict(tile=64, nsub=2)) if quick else
                    (1024, 90, dict(tile=128, nsub=9)))
    state = fk.init_bubble(n, n, p, dtype=jnp.float32)
    if not quick:
        kw = _tuned_kw("pallas_fakhari", state[0].shape, state[0].dtype, kw)
    return (lambda s: pallas_fakhari.run_fused(*s, p, steps,
                                               interpret=interpret, **kw),
            tuple(state), _perturb_first, steps, n * n,
            f"{n}x{n} Young-Laplace {kw}")


def _wl_scrt(quick, interpret):
    import jax.numpy as jnp
    from ..models import shan_chen_rt as rt
    from ..ops import pallas_scrt

    p = rt.SCRTParams()
    (nx, ny), steps, kw = (((128, 130), 2, dict(tile=32, nsub=2, halo=8))
                           if quick else
                           ((512, 2050), 200,
                            dict(tile=64, nsub=8, halo=16)))
    f = (rt.init_interface(nx, ny, p, dtype=jnp.float32)
         * rt.geometry_channel(nx, ny)[None])
    if not quick:
        kw = _tuned_kw("pallas_scrt", f.shape, f.dtype, kw)
    return (lambda s: pallas_scrt.run_fused(s, p, steps,
                                            interpret=interpret, **kw),
            f, _perturb_first, steps, nx * ny, f"{nx}x{ny} SC-RT {kw}")


def _wl_combustion(quick, interpret):
    if quick:
        return None              # interpret-mode covered by equivalence CI
    import jax.numpy as jnp
    from ..models import combustion as cb
    from ..ops import pallas_combustion as pc

    p = cb.CombustionParams(nx=420, ny=80)
    st = cb.initialize(p, dtype=jnp.float32)
    st = cb.run(st, p, 1, first_step=True)
    steps = 500
    return (lambda s: pc.run_fused(s, p, steps, interpret=interpret),
            st, _perturb_first,
            steps, p.nx * p.ny, "420x80 reactive (sustained, 4 pops)")


def _wl_combustion_striped(quick, interpret):
    if quick:
        return None
    import jax.numpy as jnp
    from ..models import combustion as cb
    from ..ops import pallas_combustion as pc

    p = cb.CombustionParams(nx=840, ny=160)
    st = cb.initialize(p, dtype=jnp.float32)
    st = cb.run(st, p, 1, first_step=True)
    steps = 500
    kw = _tuned_kw("pallas_combustion", (p.nx, p.ny), "float32",
                   dict(stripe_tile=40, halo=16, nsub=4))
    return (lambda s: pc.run_fused(s, p, steps, interpret=interpret, **kw),
            st, _perturb_first,
            steps, p.nx * p.ny, f"840x160 striped {kw}")


def _wl_pulsatile(quick, interpret):
    if quick:
        return None              # whole-step kernel covered by its CI test
    import jax.numpy as jnp
    from ..models import pulsatile as pm
    from ..ops import pallas_pulsatile_full as pfull

    N = 64
    p = pm.PulsatileParams(nx=1 + 10 * (N - 2), ny=N)
    st = pm.initialize(p, dtype=jnp.float32)
    st = pm.step(st, 0, p)
    steps = 1000
    # fresh input = a different waveform phase (t0 is a traced input),
    # not a perturbed state: the geometry buffers must stay consistent.
    # Incrementing t keeps every timing rep's input distinct.
    return (lambda s_t: pfull.run_fused_full(s_t[0], s_t[1], p, steps,
                                             nsub=8,
                                             interpret=interpret)[0],
            (st, 1), lambda s_t: (s_t[0], s_t[1] + 1), steps, p.nx * p.ny,
            f"{p.nx}x{N} deformable whole-step (windowed; full-run "
            "figure: validation/pulsatile_fullrun.py)")


# per-core C++ MLUPS measured on this box (BASELINE.md table)
WORKLOADS = {
    "sc": (_wl_sc, None),                       # north-star shape, no C++ config
    "hcz": (_wl_hcz, 0.383),
    "hcz2048": (_wl_hcz2048, 0.383),
    "hcz3d": (_wl_hcz3d, None),
    "fakhari": (_wl_fakhari, 4.96),
    "scrt": (_wl_scrt, 0.35),
    "combustion": (_wl_combustion, 0.346),
    "combustion_striped": (_wl_combustion_striped, 0.346),
    "pulsatile": (_wl_pulsatile, 0.454),
}


def main(argv=None):
    ap = argparse.ArgumentParser(prog="bench_suite")
    ap.add_argument("workloads", nargs="*", default=[],
                    help=f"subset of {list(WORKLOADS)} (default: all)")
    ap.add_argument("--quick", action="store_true",
                    help="tiny shapes (CPU smoke — checks the harness, "
                         "measures nothing); implies --interpret")
    ap.add_argument("--interpret", action="store_true",
                    help="run Pallas kernels in interpreter mode (any "
                         "shape, incl. the big configs — slow)")
    ap.add_argument("--reps", type=int, default=3,
                    help="timing repetitions; the JSON reports the median "
                         "and the (max-min)/median spread")
    args = ap.parse_args(argv)

    names = args.workloads or list(WORKLOADS)
    errors = 0
    for name in names:
        build, ref_mlups = WORKLOADS[name]
        wl = build(args.quick, args.quick or args.interpret)
        if wl is None:
            # visible skip (rc stays 0): selecting only quick-exempt
            # workloads must not look like a harness failure
            print(json.dumps({"workload": name, "skipped": "quick"}),
                  flush=True)
            continue
        fn, state, mk_fresh, steps, cells, desc = wl
        try:
            mlups, ms, spread = _timed(fn, state, mk_fresh, steps, cells,
                                       reps=args.reps)
        except Exception as e:                       # keep the sweep going
            errors += 1
            print(json.dumps({"workload": name, "error":
                              f"{type(e).__name__}: {e}"[:300]}))
            continue
        rec = {"workload": name, "config": desc,
               "mlups": round(mlups, 1), "ms_per_step": round(ms, 4),
               "spread": round(spread, 4),
               "vs_cpp_core": (round(mlups / ref_mlups, 0)
                               if ref_mlups else None)}
        print(json.dumps(rec), flush=True)
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())

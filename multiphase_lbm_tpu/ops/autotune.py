"""Kernel config autotuner: sweep (tile, nsub, halo, …) on the target chip.

The fused kernels expose tuning knobs whose optimum is shape- and
hardware-dependent (BASELINE.md's measured sweeps: SC 2048² peaks at
nsub=8/halo=16/tile=128, HCZ RTI-2048 at nsub=5 — and nsub=8 is SLOWER
there because halo recompute outweighs the HBM saving; Fakhari keeps
gaining to nsub=9).  The reference has no analogue — its only knob is
thread count (``for_each(par_unseq)``).  This module turns those ad-hoc
sweeps into a first-class tool:

* :func:`sweep` times every candidate config with the BASELINE.md
  protocol (``utils.profiling.measure_mlups``: compile+warm once, median
  of k fresh-input runs) and returns results sorted by throughput.
  Configs that raise (VMEM overflow, tile/halo alignment asserts, Mosaic
  lowering limits) are recorded as visible skips, not silent drops.
* :func:`save_table` / :func:`load_table` / :func:`lookup` persist the
  winners keyed by ``(kernel, shape, dtype)`` so production runs replay
  the tuned config instead of re-sweeping.

Usage (on the TPU):

    from multiphase_lbm_tpu.ops import autotune, pallas_sc
    grid = autotune.grid(tile=[64, 128, 256], nsub=[1, 4, 8],
                         halo=[16, 24])
    results = autotune.sweep(
        lambda cfg: (lambda s: pallas_sc.run_fused(
            s, fluid_f32, p, 200, periodic=True, **cfg)),
        f, n_steps=200, cells=2048 * 2048, configs=grid)
    autotune.save_table("tuned.json", "pallas_sc", f.shape, f.dtype,
                        results)

Compile cost dominates a sweep (remote Pallas compiles can take minutes
and grow fast with nsub — BASELINE.md measured >9 min at nsub=12), so
``budget_s`` bounds the wall clock: remaining configs are recorded as
``{"skipped": "budget"}``.  One chip only — never sweep concurrently
with another benchmark (ARCHITECTURE.md measurement hygiene).
"""
from __future__ import annotations

import itertools
import json
import time

from ..utils.profiling import measure_mlups


def grid(**axes):
    """Cartesian product of keyword lists → list of config dicts.
    ``grid(tile=[64,128], nsub=[1,8])`` → 4 configs."""
    keys = list(axes)
    return [dict(zip(keys, vals))
            for vals in itertools.product(*(axes[k] for k in keys))]


def sweep(make_step, state, n_steps: int, cells: int, configs,
          reps: int = 3, budget_s: float | None = None, verbose=print):
    """Time ``make_step(cfg)`` (returning a ``state -> state`` runner that
    advances ``n_steps``) for every config dict in ``configs``.

    Returns a list sorted best-first; each entry is either
    ``{"config", "mlups", "ms_per_step", "spread"}`` or
    ``{"config", "skipped": reason}`` (failed compile/run or exhausted
    ``budget_s``).  ``verbose=None`` silences progress lines.
    """
    t_start = time.perf_counter()
    say = verbose or (lambda *_: None)
    results = []
    for cfg in configs:
        if budget_s is not None and time.perf_counter() - t_start > budget_s:
            results.append({"config": dict(cfg), "skipped": "budget"})
            continue
        try:
            mlups, ms, spread, _ = measure_mlups(
                make_step(cfg), state, n_steps, cells, reps=reps)
        except Exception as e:                 # VMEM/alignment/lowering
            results.append({"config": dict(cfg),
                            "skipped": f"{type(e).__name__}: {e}"[:200]})
            say(f"  {cfg}: skipped ({type(e).__name__})")
            continue
        results.append({"config": dict(cfg), "mlups": round(mlups, 1),
                        "ms_per_step": round(ms, 4),
                        "spread": round(spread, 4)})
        say(f"  {cfg}: {mlups:.1f} MLUPS (spread {spread:.3f})")
    results.sort(key=lambda r: -r.get("mlups", -1.0))
    return results


def _key(kernel: str, shape, dtype) -> str:
    return f"{kernel}|{'x'.join(map(str, shape))}|{dtype}"


def save_table(path: str, kernel: str, shape, dtype, results) -> None:
    """Merge the sweep's winner (and the full result list) into a JSON
    table keyed by kernel/shape/dtype.  The write is atomic (tmp +
    os.replace) and a corrupt existing table is preserved as
    ``<path>.corrupt`` rather than silently discarded — one interrupted
    save must not destroy every other kernel/shape's tuned winner."""
    import os

    table = {}
    try:
        with open(path) as fh:
            table = json.load(fh)
    except FileNotFoundError:
        pass
    except json.JSONDecodeError:
        os.replace(path, path + ".corrupt")
        print(f"autotune: {path} was corrupt — moved to {path}.corrupt, "
              "starting a fresh table")
    timed = [r for r in results if "mlups" in r]
    # recompute the winner rather than trusting list order: callers may
    # pass hand-assembled or merged result lists, not only sweep() output
    table[_key(kernel, shape, str(dtype))] = {
        "best": max(timed, key=lambda r: r["mlups"]) if timed else None,
        "results": results,
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(table, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)


def load_table(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def lookup(table: dict, kernel: str, shape, dtype) -> dict | None:
    """Best tuned config for this kernel/shape/dtype, or None."""
    entry = table.get(_key(kernel, shape, str(dtype)))
    return entry["best"]["config"] if entry and entry["best"] else None
